"""BFS hop distance, degree assortativity, transitivity — exact-match
tests vs networkx (SURVEY.md §2.9 engine-only algorithm family)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.structure import (
    bfs_distances,
    degree_assortativity,
    wedge_count,
)
from ppagerank_ray.algos.triangles import triangle_count
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_graph, build_undirected
from ppagerank_ray.sources.pages import synth_pages

nx = pytest.importorskip("networkx")


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _engine(src, dst, n, P) -> VertexEngine:
    engine = VertexEngine(n, P)
    engine.load_undirected(build_undirected(_edges_ds(src, dst)))
    return engine


def _nx_graph(src, dst, n):
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst) if a != b)
    return g


def _nx_bfs(g, seeds, n) -> np.ndarray:
    dist = np.full(n, -1, np.int64)
    for v, d in nx.multi_source_dijkstra_path_length(g, seeds, weight=None).items():
        dist[v] = int(d)
    return dist


def test_bfs_hand_graph():
    # path 0-1-2-3, isolated 4: dist from 0 = [0,1,2,3,-1]
    eng = _engine([0, 1, 2], [1, 2, 3], 5, 2)
    info = bfs_distances(eng, [0])
    dist = eng.to_array("dist", integer=True)
    eng.shutdown()
    dist = np.where(dist >= info["sentinel"], -1, dist)
    assert dist.tolist() == [0, 1, 2, 3, -1]
    assert info["rounds"] == 4  # 3 promoting rounds + 1 fixpoint check


def test_bfs_multi_seed():
    # two seeds at the ends of a path meet in the middle
    n = 9
    eng = _engine(np.arange(n - 1), np.arange(1, n), n, 3)
    info = bfs_distances(eng, [0, n - 1])
    dist = eng.to_array("dist", integer=True)
    eng.shutdown()
    expect = np.minimum(np.arange(n), np.arange(n)[::-1])
    np.testing.assert_array_equal(dist, expect)
    assert info["rounds"] <= 6


@pytest.mark.parametrize("P", [1, 2, 4])
def test_bfs_random_matches_networkx(P):
    rng = np.random.default_rng(11 + P)
    n, m = 300, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    eng = _engine(src, dst, n, P)
    info = bfs_distances(eng, [0])
    dist = eng.to_array("dist", integer=True)
    eng.shutdown()
    dist = np.where(dist >= info["sentinel"], -1, dist)
    np.testing.assert_array_equal(dist, _nx_bfs(_nx_graph(src, dst, n), [0], n))


@pytest.mark.parametrize("P", [1, 2, 4])
def test_assortativity_random_matches_networkx(P):
    rng = np.random.default_rng(23 + P)
    n, m = 250, 800
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    eng = _engine(src, dst, n, P)
    r = degree_assortativity(eng)
    eng.shutdown()
    g = _nx_graph(src, dst, n)
    assert abs(r - nx.degree_assortativity_coefficient(g)) < 1e-10


def test_assortativity_star_is_perfectly_disassortative():
    # star K1,5: every edge joins deg 5 to deg 1 → r = -1
    eng = _engine([0] * 5, [1, 2, 3, 4, 5], 6, 2)
    r = degree_assortativity(eng)
    eng.shutdown()
    assert abs(r - (-1.0)) < 1e-12


def test_assortativity_regular_graph_nan():
    # cycle: zero degree variance → undefined
    n = 6
    eng = _engine(np.arange(n), (np.arange(n) + 1) % n, n, 2)
    r = degree_assortativity(eng)
    eng.shutdown()
    assert np.isnan(r)


@pytest.mark.parametrize("P", [1, 3])
def test_transitivity_matches_networkx(P):
    rng = np.random.default_rng(5 + P)
    n, m = 120, 500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    eng = _engine(src, dst, n, P)
    wedges = wedge_count(eng)
    eng.shutdown()
    tri = triangle_count(_edges_ds(src, dst), n)
    g = _nx_graph(src, dst, n)
    assert wedges == sum(d * (d - 1) // 2 for _, d in g.degree())
    t = 3.0 * tri / wedges
    assert abs(t - nx.transitivity(g)) < 1e-12


def _pv_counts(src, dst, n, force_join=False) -> np.ndarray:
    import ppagerank_ray.algos.triangles as T

    saved = (T.BROADCAST_MAX_EDGE_KEYS, T.BROADCAST_MAX_VERTEX_DEGREES)
    try:
        if force_join:
            T.BROADCAST_MAX_EDGE_KEYS = 0
            T.BROADCAST_MAX_VERTEX_DEGREES = 0
        tb = T.triangle_counts_per_vertex(_edges_ds(src, dst), n).to_pandas()
    finally:
        T.BROADCAST_MAX_EDGE_KEYS, T.BROADCAST_MAX_VERTEX_DEGREES = saved
    out = np.zeros(n, np.int64)
    out[tb["id"].to_numpy()] = tb["n_tri"].to_numpy()
    return out


@pytest.mark.parametrize("force_join", [False, True])
def test_triangle_counts_per_vertex_matches_networkx(force_join):
    rng = np.random.default_rng(41 + force_join)
    n, m = 120, 600
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = _nx_graph(src, dst, n)
    expect = np.array([nx.triangles(g, v) for v in range(n)], np.int64)
    np.testing.assert_array_equal(_pv_counts(src, dst, n, force_join), expect)
    # consistency with the global count: Σ per-vertex = 3·triangles
    tri = triangle_count(_edges_ds(src, dst), n)
    assert expect.sum() == 3 * tri


def test_structure_sf_tiny_matches_networkx(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    g = _nx_graph(src, dst, gt.n_vertices)
    engine = VertexEngine(gt.n_vertices, 4)
    engine.load_undirected(build_undirected(gt.edges))
    info = bfs_distances(engine, [0])
    dist = engine.to_array("dist", integer=True)
    dist = np.where(dist >= info["sentinel"], -1, dist)
    r = degree_assortativity(engine)
    engine.shutdown()
    np.testing.assert_array_equal(dist, _nx_bfs(g, [0], gt.n_vertices))
    assert abs(r - nx.degree_assortativity_coefficient(g)) < 1e-10


def _bc_engine(src, dst, n, P):
    """Engine with BOTH loads over the same symmetrized table (BFS rounds
    use the undirected structures, Brandes' SpMVs the directed load)."""
    from ppagerank_ray.graph.build import build_undirected

    und = build_undirected(_edges_ds(src, dst)).materialize()
    engine = VertexEngine(n, P)
    engine.load_undirected(und, presorted=True)
    engine.load_directed(und)
    return engine


def test_betweenness_exact_matches_networkx():
    """Full-source Brandes over the engine == networkx betweenness
    (normalized=False halves undirected pair counts, as we do)."""
    from ppagerank_ray.algos.betweenness import betweenness_table

    rng = np.random.default_rng(23)
    n = 40
    src = rng.integers(0, n, 150)
    dst = rng.integers(0, n, 150)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    for P in (1, 4):
        eng = _bc_engine(src, dst, n, P)
        tbl, info = betweenness_table(eng)
        eng.shutdown()
        got = np.asarray(tbl["bc"])
        exp_map = nx.betweenness_centrality(
            _nx_graph(src, dst, n), normalized=False
        )
        exp = np.array([exp_map[i] for i in range(n)])
        np.testing.assert_allclose(got, np.round(exp, 6), atol=1e-6)


def test_betweenness_seed_accumulation_is_linear():
    """Disjoint seed halves accumulate to the full-source raw vector
    (the property that makes the sampled estimator unbiased)."""
    from ppagerank_ray.algos.betweenness import betweenness

    rng = np.random.default_rng(29)
    n = 30
    src = rng.integers(0, n, 120)
    dst = rng.integers(0, n, 120)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    eng = _bc_engine(src, dst, n, 2)
    betweenness(eng, seeds=None, out="bc_all")
    full = eng.to_array("bc_all")
    betweenness(eng, seeds=range(0, n, 2), out="bc_even")
    even = eng.to_array("bc_even")
    betweenness(eng, seeds=range(1, n, 2), out="bc_odd")
    odd = eng.to_array("bc_odd")
    eng.shutdown()
    np.testing.assert_allclose(even + odd, full, atol=1e-9)


def test_harmonic_centrality_matches_networkx():
    """Full-seed harmonic centrality == networkx.harmonic_centrality."""
    from ppagerank_ray.algos.structure import harmonic_centrality

    rng = np.random.default_rng(31)
    n = 35
    src = rng.integers(0, n, 120)
    dst = rng.integers(0, n, 120)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    eng = _engine(src, dst, n, 2)
    harmonic_centrality(eng)
    got = eng.to_array("harm")
    eng.shutdown()
    exp_map = nx.harmonic_centrality(_nx_graph(src, dst, n))
    exp = np.array([exp_map[i] for i in range(n)])
    np.testing.assert_allclose(got, exp, atol=1e-9)


def test_closeness_accumulators_match_bfs():
    """Full-seed closeness integer accumulators == per-pair BFS truth:
    clo_sum(v) = Σ_u d(u,v) over reachable u≠v, clo_cnt(v) = #reachable,
    and cnt/sum is networkx incremental closeness (reciprocal mean
    distance, here unnormalized by component size)."""
    from ppagerank_ray.algos.structure import harmonic_centrality

    rng = np.random.default_rng(47)
    n = 32
    src = rng.integers(0, n, 100)
    dst = rng.integers(0, n, 100)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    eng = _engine(src, dst, n, 2)
    harmonic_centrality(eng, closeness_out="clo")
    csum = eng.to_array("clo_sum", integer=True)
    ccnt = eng.to_array("clo_cnt", integer=True)
    eng.shutdown()
    g = _nx_graph(src, dst, n)
    exp_sum = np.zeros(n, np.int64)
    exp_cnt = np.zeros(n, np.int64)
    for u in range(n):
        for v, d in nx.single_source_shortest_path_length(g, u).items():
            if d > 0:
                exp_sum[v] += d
                exp_cnt[v] += 1
    np.testing.assert_array_equal(csum, exp_sum)
    np.testing.assert_array_equal(ccnt, exp_cnt)


def test_pseudo_diameter_path_and_star():
    from ppagerank_ray.algos.structure import pseudo_diameter

    # path 0-1-2-3-4: double sweep finds the true diameter 4 from any seed
    eng = _engine([0, 1, 2, 3], [1, 2, 3, 4], 5, 2)
    info = pseudo_diameter(eng, seed=2)
    eng.shutdown()
    assert info["value"] == 4
    # star: diameter 2, found exactly
    eng = _engine([0, 0, 0, 0], [1, 2, 3, 4], 5, 2)
    info = pseudo_diameter(eng, seed=0)
    eng.shutdown()
    assert info["value"] == 2


@pytest.mark.parametrize("P", [1, 4])
def test_pseudo_diameter_bounds_and_invariance(P):
    from ppagerank_ray.algos.structure import pseudo_diameter

    rng = np.random.default_rng(47)
    n = 120
    src = rng.integers(0, n, 260)
    dst = rng.integers(0, n, 260)
    eng = _engine(src, dst, n, P)
    info = pseudo_diameter(eng, seed=0)
    eng.shutdown()
    g = _nx_graph(src, dst, n)
    comp = nx.node_connected_component(g, 0)
    true_diam = max(
        nx.eccentricity(g.subgraph(comp)).values()
    )
    ecc0 = nx.eccentricity(g.subgraph(comp), v=0)
    # lower-bounded by the seed's eccentricity, upper-bounded by the
    # true diameter of the seed's component
    assert ecc0 <= info["value"] <= true_diam
    # deterministic across partitions
    eng = _engine(src, dst, n, 2)
    info2 = pseudo_diameter(eng, seed=0)
    eng.shutdown()
    assert info2 == info


def test_edge_support_and_truss_matches_bruteforce():
    from ppagerank_ray.algos.truss import edge_support_and_truss

    rng = np.random.default_rng(61)
    n = 60
    src = rng.integers(0, n, 240).tolist()
    dst = rng.integers(0, n, 240).tolist()
    adj = [set() for _ in range(n)]
    E = set()
    for a, b in zip(src, dst):
        if a != b:
            a2, b2 = min(a, b), max(a, b)
            adj[a2].add(b2)
            adj[b2].add(a2)
            E.add((a2, b2))
    exp_sup = {
        e: len(adj[e[0]] & adj[e[1]])
        for e in E
        if len(adj[e[0]] & adj[e[1]]) > 0
    }
    cur = set(E)
    while True:
        def s(e):
            a, b = e
            return len(
                {
                    c
                    for c in adj[a] & adj[b]
                    if (min(a, c), max(a, c)) in cur
                    and (min(b, c), max(b, c)) in cur
                }
            )
        drop = {e for e in cur if s(e) < 2}
        if not drop:
            break
        cur -= drop

    sup_ds, surv_ds, rounds = edge_support_and_truss(
        _edges_ds(src, dst), n, k=4
    )
    sup = sup_ds.to_pandas()
    got_sup = {(r.a, r.b): r.support for r in sup.itertuples()}
    assert got_sup == exp_sup
    surv = surv_ds.to_pandas()
    assert set(zip(surv["a"], surv["b"])) == cur
    assert rounds >= 1


def test_truss_triangle_and_empty():
    from ppagerank_ray.algos.truss import edge_support_and_truss

    # a single triangle is itself a 3-truss but not a 4-truss... with
    # k=4 every edge needs 2 triangles; one triangle has support 1 ⇒ all peeled
    sup_ds, surv_ds, _ = edge_support_and_truss(
        _edges_ds([0, 1, 2], [1, 2, 0]), 3, k=4
    )
    assert surv_ds.count() == 0
    assert sorted(sup_ds.to_pandas()["support"].tolist()) == [1, 1, 1]
    # two triangles sharing an edge: the shared edge has support 2 but
    # the outer edges only 1 ⇒ peeling still empties the 4-truss
    sup_ds, surv_ds, _ = edge_support_and_truss(
        _edges_ds([0, 1, 2, 0, 3, 1], [1, 2, 0, 3, 1, 0]), 4, k=4
    )
    assert surv_ds.count() == 0
    # K4 is exactly the smallest 4-truss (every edge in 2 triangles)
    src = [i for i in range(4) for j in range(i + 1, 4)]
    dst = [j for i in range(4) for j in range(i + 1, 4)]
    sup_ds, surv_ds, _ = edge_support_and_truss(_edges_ds(src, dst), 4, k=4)
    assert surv_ds.count() == 6


def test_attribute_assortativity_matches_networkx():
    from ppagerank_ray.algos.structure import attribute_assortativity

    rng = np.random.default_rng(67)
    n = 80
    labels = rng.integers(0, 3, n)
    # homophilous edges: mostly within-label
    src, dst = [], []
    for _ in range(400):
        a = int(rng.integers(0, n))
        pool = np.flatnonzero(labels == labels[a]) if rng.random() < 0.8 \
            else np.arange(n)
        b = int(rng.choice(pool))
        src.append(a)
        dst.append(b)
    ds = _edges_ds(src, dst)
    mix, intra, r = attribute_assortativity(
        ds, labels.astype(np.int64), 3
    )
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from(zip(src, dst))
    # networkx counts each distinct directed edge once — dedup ours too
    es = sorted(set(zip(src, dst)))
    ds2 = _edges_ds([a for a, _ in es], [b for _, b in es])
    mix2, intra2, r2 = attribute_assortativity(
        ds2, labels.astype(np.int64), 3
    )
    for v, lab in enumerate(labels):
        g.nodes[v]["lab"] = int(lab)
    expect = nx.attribute_assortativity_coefficient(g, "lab")
    assert abs(r2 - expect) < 1e-6
    assert intra2 == sum(1 for a, b in es if labels[a] == labels[b])
    assert mix2.sum() == len(es)
    # unlabeled vertices (-1) are excluded
    labels3 = labels.astype(np.int64).copy()
    labels3[:10] = -1
    mix3, intra3, _ = attribute_assortativity(ds2, labels3, 3)
    assert mix3.sum() == sum(
        1 for a, b in es if labels3[a] >= 0 and labels3[b] >= 0
    )


def test_truss_rejects_k_below_3():
    """k < 3 would silently drop support-0 edges from the survivor set
    (the 2-truss is the whole graph); the operator must refuse."""
    from ppagerank_ray.algos.truss import edge_support_and_truss

    ds = rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.array([0], np.int64), "dst": np.array([1], np.int64)}
        )
    )
    with pytest.raises(ValueError, match="k >= 3"):
        edge_support_and_truss(ds, 2, k=2)
