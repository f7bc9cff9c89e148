"""Connected components / label propagation / triangles — exact-match tests
vs networkx and numpy oracles (SURVEY.md §2.9 engine-only algorithms)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.components import (
    connected_components,
    label_propagation,
    numpy_cc_oracle,
    numpy_lp_oracle,
)
from ppagerank_ray.algos.triangles import numpy_triangle_oracle, triangle_count
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_graph, build_undirected
from ppagerank_ray.sources.pages import synth_pages


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _und_arrays(und_ds):
    t = und_ds.to_pandas()
    return t["src"].to_numpy(), t["dst"].to_numpy()


def test_two_components_exact():
    # cluster {0,1,2}, cluster {3,4}, isolated 5
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 0, 4])
    n = 6
    und = build_undirected(_edges_ds(src, dst))
    engine = VertexEngine(n, 2)
    engine.load_undirected(und)
    connected_components(engine)
    labels = engine.to_array("label", integer=True)
    engine.shutdown()
    assert labels.tolist() == [0, 0, 0, 3, 3, 5]


def test_components_match_networkx(sf_tiny):
    nx = pytest.importorskip("networkx")
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    g = nx.Graph()
    g.add_nodes_from(range(gt.n_vertices))
    g.add_edges_from(zip(et["src"], et["dst"]))
    expected = np.empty(gt.n_vertices, dtype=np.int64)
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            expected[v] = m
    # presorted=True (build_undirected's output is globally sorted
    # distinct) must load identically to the engine-side re-sort path
    for presorted in (True, False):
        engine = VertexEngine(gt.n_vertices, 4)
        engine.load_undirected(build_undirected(gt.edges), presorted=presorted)
        connected_components(engine)
        labels = engine.to_array("label", integer=True)
        engine.shutdown()
        assert np.array_equal(labels, expected)


@pytest.mark.parametrize("P", [1, 3])
def test_label_propagation_matches_oracle(sf_tiny, P):
    gt = build_graph(synth_pages(sf_tiny))
    und = build_undirected(gt.edges)
    us, ud = _und_arrays(und)
    engine = VertexEngine(gt.n_vertices, P)
    engine.load_undirected(und)
    label_propagation(engine, num_rounds=4)
    labels = engine.to_array("label", integer=True)
    engine.shutdown()
    expected = numpy_lp_oracle(us, ud, gt.n_vertices, rounds=4)
    assert np.array_equal(labels, expected)


def test_cc_oracle_agreement(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    und = build_undirected(gt.edges)
    us, ud = _und_arrays(und)
    engine = VertexEngine(gt.n_vertices, 3)
    engine.load_undirected(und)
    connected_components(engine)
    labels = engine.to_array("label", integer=True)
    engine.shutdown()
    assert np.array_equal(labels, numpy_cc_oracle(us, ud, gt.n_vertices))


def test_triangle_known_counts():
    # K4 (4 triangles) ∪ disjoint K3 (1 triangle) + a dangling path edge
    k4 = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    k3 = [(4, 5), (5, 6), (6, 4)]
    path = [(6, 7)]
    src, dst = zip(*(k4 + k3 + path))
    assert (
        triangle_count(_edges_ds(np.array(src), np.array(dst)), 8) == 5
    )


def test_triangles_match_oracle(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    expected = numpy_triangle_oracle(src, dst)
    assert triangle_count(gt.edges, gt.n_vertices) == expected
    assert expected > 0  # fixture actually has triangles


def test_triangles_large_graph_paths(sf_tiny, monkeypatch):
    """Force BOTH >threshold fallbacks (joined degree orientation + tagged
    union edge matching) and compare against the broadcast-path answer."""
    import ppagerank_ray.algos.triangles as tri

    gt = build_graph(synth_pages(sf_tiny))
    expected = triangle_count(gt.edges, gt.n_vertices)
    monkeypatch.setattr(tri, "BROADCAST_MAX_VERTEX_DEGREES", 1)
    monkeypatch.setattr(tri, "BROADCAST_MAX_EDGE_KEYS", 1)
    assert tri.triangle_count(gt.edges, gt.n_vertices) == expected
    assert expected > 0


def test_hits_matches_numpy_oracle(sf_tiny):
    from ppagerank_ray.algos.hits import build_hits_engines, hits, numpy_hits_oracle

    gt = build_graph(synth_pages(sf_tiny))
    t = gt.edges.to_pandas()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    for iters in (1, 7):
        fwd, rev = build_hits_engines(gt.edges, gt.n_vertices, num_partitions=3)
        hits(fwd, rev, tol=0.0, maxiter=iters)
        a, h = fwd.to_array("a"), rev.to_array("h")
        fwd.shutdown(); rev.shutdown()
        a_ref, h_ref = numpy_hits_oracle(src, dst, gt.n_vertices, iters)
        np.testing.assert_allclose(a, a_ref, atol=1e-12)
        np.testing.assert_allclose(h, h_ref, atol=1e-12)


def test_salsa_matches_numpy_oracle(sf_tiny):
    from ppagerank_ray.algos.hits import (
        build_salsa_engines, numpy_salsa_oracle, salsa,
    )

    gt = build_graph(synth_pages(sf_tiny))
    t = gt.edges.to_pandas()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    for iters in (1, 6):
        fwd, rev = build_salsa_engines(gt.edges, gt.n_vertices, num_partitions=3)
        salsa(fwd, rev, iters=iters)
        a, h = fwd.to_array("a"), rev.to_array("h")
        fwd.shutdown(); rev.shutdown()
        a_ref, h_ref = numpy_salsa_oracle(src, dst, gt.n_vertices, iters)
        np.testing.assert_allclose(a, a_ref, atol=1e-12)
        np.testing.assert_allclose(h, h_ref, atol=1e-12)
        # both half-steps are stochastic: authority mass is conserved
        assert abs(a.sum() - 1.0) < 1e-9


def test_salsa_star_authorities():
    from ppagerank_ray.algos.hits import build_salsa_engines, salsa

    # star: 0 -> {1..4} plus 3 -> 0: leaves are pure authorities
    src = np.array([0, 0, 0, 0, 3])
    dst = np.array([1, 2, 3, 4, 0])
    fwd, rev = build_salsa_engines(_edges_ds(src, dst), 5, num_partitions=2)
    salsa(fwd, rev, iters=30)
    a, h = fwd.to_array("a"), rev.to_array("h")
    fwd.shutdown(); rev.shutdown()
    # SALSA stationary authority weight is proportional to in-degree
    # within each component of the authority graph
    assert np.argmax(h) == 0
    assert a[1] > 0 and abs(a[1] - a[2]) < 1e-9
    assert abs(a.sum() - 1.0) < 1e-9


def test_hits_converges():
    from ppagerank_ray.algos.hits import build_hits_engines, hits

    # star: 0 -> {1..4}; node 0 is the hub, 1..4 are authorities
    src = np.array([0, 0, 0, 0, 3])
    dst = np.array([1, 2, 3, 4, 0])
    fwd, rev = build_hits_engines(_edges_ds(src, dst), 5, num_partitions=2)
    info = hits(fwd, rev, tol=1e-10)
    a, h = fwd.to_array("a"), rev.to_array("h")
    fwd.shutdown(); rev.shutdown()
    assert info["converged"]
    assert np.argmax(h) == 0  # the star center is the best hub
    assert a[0] < max(a[1:])  # leaves out-rank it as authorities


def test_katz_matches_numpy_oracle(sf_tiny):
    from ppagerank_ray.algos.katz import katz, numpy_katz_oracle
    from ppagerank_ray.engine.vertex_engine import VertexEngine
    from ppagerank_ray.graph.build import build_graph
    from ppagerank_ray.sources.pages import synth_pages

    gt = build_graph(synth_pages(sf_tiny))
    e = gt.edges.to_pandas()
    src, dst = e["src"].to_numpy(), e["dst"].to_numpy()
    for iters, alpha in [(1, 0.05), (5, 0.05), (12, 0.01)]:
        eng = VertexEngine(gt.n_vertices, num_partitions=3)
        eng.load_directed(
            gt.edges.select_columns(["src", "dst"]), presorted=gt.edges_sorted
        )
        katz(eng, alpha=alpha, beta=1.0, iters=iters)
        x = eng.to_array("x")
        eng.shutdown()
        ref = numpy_katz_oracle(src, dst, gt.n_vertices, alpha, 1.0, iters)
        np.testing.assert_allclose(x, ref, rtol=1e-12, atol=1e-14)


def test_eigenvector_centrality_matches_numpy(sf_tiny):
    """Fixed-iteration normalize2(A^T x) power steps vs a direct numpy
    replication (<1e-12)."""
    from ppagerank_ray.algos.hits import eigenvector_centrality
    from ppagerank_ray.engine.vertex_engine import VertexEngine

    gt = build_graph(synth_pages(sf_tiny))
    t = gt.edges.to_pandas()
    src, dst = t["src"].to_numpy(), t["dst"].to_numpy()
    n = gt.n_vertices
    eng = VertexEngine(n, 3)
    eng.load_directed(gt.edges.select_columns(["src", "dst"]))
    got = eigenvector_centrality(eng, iters=9)
    eng.shutdown()

    x = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(9):
        y = np.zeros(n)
        np.add.at(y, dst, x[src])
        nrm = np.sqrt((y * y).sum())
        x = y / nrm if nrm > 0 else y
    np.testing.assert_allclose(got, x, atol=1e-12)
