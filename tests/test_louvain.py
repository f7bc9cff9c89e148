"""Modularity-gain label propagation (algos/louvain.py): exact
sequential replay of the identical integer rule, partition invariance,
clique merging, and modularity improvement vs networkx."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.anf import splitmix64
from ppagerank_ray.algos.louvain import louvain_communities
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected

nx = pytest.importorskip("networkx")


def _run(src, dst, n, P, rounds=8, volumes="auto"):
    eng = VertexEngine(n, P)
    eng.load_undirected(
        build_undirected(
            rd.from_arrow(
                pa.Table.from_pydict(
                    {
                        "src": np.asarray(src, np.int64),
                        "dst": np.asarray(dst, np.int64),
                    }
                )
            )
        )
    )
    info = louvain_communities(eng, rounds=rounds, volumes=volumes)
    comm = eng.to_array("lv_comm", integer=True)
    eng.shutdown()
    return comm, info


def _ref(src, dst, n, rounds, seed=19):
    """Sequential replay of the engine's exact integer rule."""
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    deg = np.array([len(s) for s in adj], np.int64)
    twom = int(deg.sum())
    comm = np.arange(n, dtype=np.int64)
    ids = np.arange(n, dtype=np.uint64)
    par = (
        splitmix64(ids * np.uint64(0x100000001B3) + np.uint64(seed))
        & np.uint64(1)
    ).astype(int)
    for rnd in range(rounds):
        vol = np.zeros(n, np.int64)
        np.add.at(vol, comm, deg)
        new = comm.copy()
        for v in range(n):
            if par[v] != (rnd & 1):
                continue
            e: dict = {}
            for u in adj[v]:
                e[comm[u]] = e.get(comm[u], 0) + 1
            e.setdefault(comm[v], 0)
            best_c, best_s = None, None
            for c in sorted(e):
                s = 2 * twom * e[c] - 2 * deg[v] * (
                    vol[c] - deg[v] * (c == comm[v])
                )
                if best_s is None or s > best_s:
                    best_c, best_s = c, s
            new[v] = best_c
        comm = new
    return comm


def test_louvain_two_cliques_with_bridge():
    src = [0, 0, 1, 4, 4, 5, 2]
    dst = [1, 2, 2, 5, 6, 6, 4]
    comm, _ = _run(src, dst, 7, P=2)
    assert comm[0] == comm[1] == comm[2]
    assert comm[4] == comm[5] == comm[6]
    assert comm[0] != comm[4]
    assert comm[3] == 3  # isolated vertex keeps its singleton


@pytest.mark.parametrize("P", [1, 4])
def test_louvain_matches_sequential_replay(P):
    rng = np.random.default_rng(53)
    n = 150
    src = rng.integers(0, n, 420)
    dst = rng.integers(0, n, 420)
    comm, _ = _run(src, dst, n, P)
    assert (comm == _ref(src, dst, n, 8)).all()


@pytest.mark.parametrize("P", [1, 4])
def test_louvain_engine_volumes_match_broadcast(P):
    """The vertex-aligned volume path (sharded scatter-reduce + distinct-
    candidate gather, no driver community table) must move bit-identically
    to the broadcast path — and both must match the sequential replay."""
    rng = np.random.default_rng(61)
    n = 150
    src = rng.integers(0, n, 420)
    dst = rng.integers(0, n, 420)
    cb, ib = _run(src, dst, n, P, volumes="broadcast")
    ce, ie = _run(src, dst, n, P, volumes="engine")
    assert ib["volumes"] == "broadcast" and ie["volumes"] == "engine"
    assert ib["moved_total"] == ie["moved_total"]
    assert ib["two_m"] == ie["two_m"]
    assert (cb == ce).all()
    assert (ce == _ref(src, dst, n, 8)).all()


def test_louvain_improves_modularity_on_planted_partition():
    # four planted blocks with dense intra / sparse inter edges
    rng = np.random.default_rng(59)
    n, k = 120, 4
    blocks = np.repeat(np.arange(k), n // k)
    src, dst = [], []
    for _ in range(900):
        a = int(rng.integers(0, n))
        if rng.random() < 0.9:
            choices = np.flatnonzero(blocks == blocks[a])
        else:
            choices = np.arange(n)
        b = int(rng.choice(choices))
        if a != b:
            src.append(a)
            dst.append(b)
    comm, _ = _run(src, dst, n, P=2)
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src, dst))
    parts: dict = {}
    for v, c in enumerate(comm):
        parts.setdefault(int(c), set()).add(v)
    q = nx.community.modularity(g, parts.values())
    singletons = nx.community.modularity(g, [{v} for v in range(n)])
    assert q > 0.3 > singletons
    # communities should largely respect the planted blocks
    from collections import Counter

    purity = sum(
        Counter(blocks[list(m)]).most_common(1)[0][1] for m in parts.values()
    ) / n
    assert purity > 0.8
