"""Property-based conformance: random graphs → engine == oracle.

hypothesis generates adversarial small graphs (self-loops, dangling
vertices, isolated vertices, duplicate edges); the engine must match the
transliterated numpy oracles exactly-ish on every one of them.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ppagerank_ray.algos.components import (
    connected_components,
    numpy_cc_oracle,
    numpy_lp_oracle,
    label_propagation,
)
from ppagerank_ray.algos.pagerank import numpy_power_oracle, power_iteration
from ppagerank_ray.algos.triangles import numpy_triangle_oracle, triangle_count
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    m = draw(st.integers(min_value=0, max_value=120))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            min_size=m,
            max_size=m,
        )
    )
    return n, edges


def _edge_ds(n, edges):
    if edges:
        key = sorted({a * n + b for a, b in edges})
        src = np.array([k // n for k in key], dtype=np.int64)
        dst = np.array([k % n for k in key], dtype=np.int64)
    else:
        src = np.empty(0, np.int64)
        dst = np.empty(0, np.int64)
    od = np.bincount(src, minlength=n).astype(np.float64)
    w = 1.0 / od[src] if len(src) else np.empty(0, np.float64)
    return (
        rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst, "weight": w})),
        src,
        dst,
    )


_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(g=graphs())
@_SETTINGS
def test_pagerank_property(g):
    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    eng = VertexEngine(n, 3)
    eng.load_directed(ds)
    info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-9))
    x = eng.to_array("x")
    eng.shutdown()
    xo, deltas = numpy_power_oracle(src, dst, n, tol=1e-9)
    assert info["iteration"] == len(deltas)
    assert np.abs(x - xo).max() < 1e-12


@given(g=graphs())
@_SETTINGS
def test_components_and_lp_property(g):
    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    und = build_undirected(ds)
    ut = und.to_pandas()
    if "src" in ut.columns:
        us, ud = ut["src"].to_numpy(), ut["dst"].to_numpy()
    else:  # empty dataset loses its schema through to_pandas
        us = ud = np.empty(0, np.int64)
    eng = VertexEngine(n, 2)
    eng.load_undirected(und)
    connected_components(eng)
    labels = eng.to_array("label", integer=True)
    assert np.array_equal(labels, numpy_cc_oracle(us, ud, n))
    label_propagation(eng, num_rounds=3)
    lp = eng.to_array("label", integer=True)
    eng.shutdown()
    assert np.array_equal(lp, numpy_lp_oracle(us, ud, n, rounds=3))


@given(g=graphs())
@_SETTINGS
def test_triangles_property(g):
    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    assert triangle_count(ds, n) == numpy_triangle_oracle(src, dst)


@given(
    st.lists(
        st.text(min_size=0, max_size=60),  # arbitrary unicode incl. multibyte
        min_size=0,
        max_size=30,
    )
)
@settings(max_examples=60, deadline=None)
def test_batch_shingle_sets_matches_scalar(texts):
    from ppagerank_ray.functions.dedup import batch_shingle_sets, shingle_hashes

    vals, offs = batch_shingle_sets(texts)
    assert len(offs) == len(texts) + 1
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(
            vals[offs[i] : offs[i + 1]], shingle_hashes(t), err_msg=f"doc {i}"
        )


@given(
    st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20)
)
@settings(max_examples=40, deadline=None)
def test_simhash_batch_matches_scalar(texts):
    from ppagerank_ray.functions.dedup import _simhash_values, simhash64

    got = _simhash_values(texts)
    for i, t in enumerate(texts):
        assert int(got[i]) == simhash64(t), f"doc {i}"


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=100,
    ),
    st.integers(1, 31),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_hash_join_matches_pandas_merge(pairs, nkeys):
    """hash_join == pandas inner merge on random int tables (dupes, missing
    keys, skew); dtype preserved."""
    import pandas as pd

    from ppagerank_ray.ops.joins import hash_join

    left = pa.Table.from_pydict(
        {
            "k": np.array([a % nkeys for a, _ in pairs], np.int64),
            "lv": np.array([b for _, b in pairs], np.int64),
        }
    )
    right = pa.Table.from_pydict(
        {
            "rk": np.arange(0, nkeys, 2, dtype=np.int64),
            "rv": np.arange(0, nkeys, 2, dtype=np.int64) * 10,
        }
    )
    got = hash_join(
        rd.from_arrow(left), rd.from_arrow(right), "k", "rk", n_buckets=5
    ).to_pandas()
    exp = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk", how="inner")
        .drop(columns=["rk"])
    )
    if len(exp) == 0:
        # empty joins may come back column-less (zero blocks) — callers guard
        assert len(got) == 0
        return
    got = got.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    assert got[["k", "lv", "rv"]].equals(exp[["k", "lv", "rv"]])
    assert got["k"].dtype == np.int64


def _py_scc_min_labels(src, dst, n) -> np.ndarray:
    reach = np.eye(n, dtype=bool)
    reach[src, dst] = True
    for k in range(n):  # boolean transitive closure (n ≤ 40)
        reach |= reach[:, k : k + 1] & reach[k : k + 1, :]
    mutual = reach & reach.T
    return np.array([np.flatnonzero(mutual[v]).min() for v in range(n)], np.int64)


def _py_kcore(us, ud, n) -> np.ndarray:
    adj = [set() for _ in range(n)]
    for a, b in zip(us.tolist(), ud.tolist()):
        if a != b:
            adj[a].add(b)
    deg = np.array([len(a) for a in adj], np.int64)
    core = deg.copy()
    alive = np.ones(n, bool)
    for k in range(0, int(deg.max(initial=0)) + 1):
        while True:
            peel = np.flatnonzero(alive & (deg <= k))
            if len(peel) == 0:
                break
            for v in peel.tolist():
                alive[v] = False
                core[v] = k
                for u in adj[v]:
                    if alive[u]:
                        deg[u] -= 1
    return core


def _py_bfs(us, ud, n, seed=0) -> np.ndarray:
    from collections import deque

    adj = [[] for _ in range(n)]
    for a, b in zip(us.tolist(), ud.tolist()):
        adj[a].append(b)
    dist = np.full(n, -1, np.int64)
    dist[seed] = 0
    q = deque([seed])
    while q:
        v = q.popleft()
        for u in adj[v]:
            if dist[u] < 0:
                dist[u] = v_d = dist[v] + 1
                q.append(u)
    return dist


@given(g=graphs())
@_SETTINGS
def test_scc_property(g):
    from ppagerank_ray.algos.scc import canonical_labels, strongly_connected_components

    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    labels, _ = strongly_connected_components(ds, n, 2)
    assert np.array_equal(canonical_labels(labels), _py_scc_min_labels(src, dst, n))


@given(g=graphs())
@_SETTINGS
def test_kcore_bfs_property(g):
    from ppagerank_ray.algos.kcore import kcore_decomposition
    from ppagerank_ray.algos.structure import bfs_distances

    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    und = build_undirected(ds)
    ut = und.to_pandas()
    if "src" in ut.columns:
        us, ud = ut["src"].to_numpy(), ut["dst"].to_numpy()
    else:
        us = ud = np.empty(0, np.int64)
    eng = VertexEngine(n, 2)
    eng.load_undirected(und, presorted=True)
    kcore_decomposition(eng)
    cores = eng.to_array("core", integer=True)
    assert np.array_equal(cores, _py_kcore(us, ud, n))
    info = bfs_distances(eng, [0])
    dist = eng.to_array("dist", integer=True)
    eng.shutdown()
    dist = np.where(dist >= info["sentinel"], -1, dist)
    assert np.array_equal(dist, _py_bfs(us, ud, n))


@given(g=graphs())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
def test_greedy_family_properties(g):
    """MIS independence+maximality, matching symmetry+maximality,
    coloring properness — one engine per random adversarial graph."""
    from ppagerank_ray.algos.coloring import greedy_coloring
    from ppagerank_ray.algos.matching import maximal_matching
    from ppagerank_ray.algos.mis import maximal_independent_set

    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    und = [(a, b) for a, b in zip(src, dst) if a != b]
    a = np.array([min(x, y) for x, y in und], np.int64)
    b = np.array([max(x, y) for x, y in und], np.int64)

    eng = VertexEngine(n, 2)
    eng.load_undirected(build_undirected(ds))
    maximal_independent_set(eng)
    st_mis = eng.to_array("mis_status", integer=True)
    maximal_matching(eng)
    partner = eng.to_array("partner", integer=True)
    greedy_coloring(eng)
    col = eng.to_array("color", integer=True)
    eng.shutdown()

    in_mis = st_mis == 1
    assert (st_mis != 0).all()
    if len(a):
        assert not (in_mis[a] & in_mis[b]).any()
    covered = np.zeros(n, bool)
    if len(a):
        np.logical_or.at(covered, a, in_mis[b])
        np.logical_or.at(covered, b, in_mis[a])
    assert (in_mis | covered).all()

    matched = np.flatnonzero(partner >= 0)
    if len(matched):
        assert (partner[partner[matched]] == matched).all()
        assert (partner[matched] != matched).all()
    if len(a):
        unm = partner < 0
        assert not (unm[a] & unm[b]).any()

    assert (col >= 0).all()
    if len(a):
        assert not (col[a] == col[b]).any()


from ppagerank_ray.algos.pprpush import numpy_ppr_push_oracle, ppr_push
from ppagerank_ray.algos.richclub import numpy_rich_club_oracle, rich_club


@given(g=graphs())
@_SETTINGS
def test_rich_club_property(g):
    n, edges = g
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    ds, src, dst = _edge_ds(n, edges)
    got = rich_club(ds, n)
    ks, n_rich, e_rich = numpy_rich_club_oracle(src, dst)
    assert got["k"].to_numpy().tolist() == ks.tolist()
    assert got["n_rich"].to_numpy().tolist() == n_rich.tolist()
    assert got["e_rich"].to_numpy().tolist() == e_rich.tolist()


@given(g=graphs())
@_SETTINGS
def test_ppr_push_property(g):
    n, edges = g
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    ds, src, dst = _edge_ds(n, edges)
    got = ppr_push(ds, n, rounds=4, n_buckets=4)
    ids, p, r = numpy_ppr_push_oracle(src, dst, rounds=4)
    assert got["id"].to_numpy().tolist() == ids.tolist()
    assert got["p_mass"].to_numpy().tolist() == p.tolist()
    assert got["r_mass"].to_numpy().tolist() == r.tolist()
