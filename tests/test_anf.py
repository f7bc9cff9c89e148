"""HyperANF approximate neighborhood function — determinism across
partitionings (max-merge is associative/commutative/idempotent) and
relative-error bounds vs exact component sizes."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.anf import ball_estimates, hll_estimate, hyperanf, splitmix64
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_graph, build_undirected
from ppagerank_ray.sources.pages import synth_pages


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _run(src, dst, n, P, n_words=4):
    eng = VertexEngine(n, P)
    eng.load_undirected(build_undirected(_edges_ds(src, dst)))
    info = hyperanf(eng, n_words=n_words)
    est = ball_estimates(eng, n_words=n_words)
    eng.shutdown()
    return est, info


def _exact_component_sizes(src, dst, n) -> np.ndarray:
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst) if a != b)
    out = np.empty(n, np.float64)
    for comp in nx.connected_components(g):
        for v in comp:
            out[v] = len(comp)
    return out


def test_hll_estimator_calibration():
    # estimator sanity on raw sketches: insert n distinct hashes, m=32
    rng = np.random.default_rng(0)
    m = 32
    for n in (10, 100, 1000):
        h = splitmix64(rng.integers(0, 2**63, n).astype(np.uint64))
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        h2 = splitmix64(h)
        low = (h2 & (~h2 + np.uint64(1))).astype(np.float64)
        rho = np.frexp(np.maximum(low, 1.0))[1].astype(np.uint8)
        regs = np.zeros((1, m), np.uint8)
        np.maximum.at(regs[0], idx, rho)
        est = hll_estimate(regs)[0]
        assert abs(est - n) / n < 0.45  # ~2.5σ at m=32

def test_hyperanf_deterministic_across_partitions():
    rng = np.random.default_rng(5)
    n, m = 400, 1000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    e1, i1 = _run(src, dst, n, 1)
    e4, i4 = _run(src, dst, n, 4)
    np.testing.assert_array_equal(e1, e4)  # bit-identical sketches
    assert i1["rounds"] == i4["rounds"]
    np.testing.assert_allclose(
        i1["neighborhood_function"], i4["neighborhood_function"]
    )


def test_hyperanf_estimates_component_sizes():
    # path(200) ∪ clique(60) ∪ isolated vertices
    src, dst = [], []
    src += list(range(199)); dst += list(range(1, 200))
    for a in range(200, 260):
        for b in range(a + 1, 260):
            src.append(a); dst.append(b)
    n = 270
    est, info = _run(np.array(src), np.array(dst), n, 3, n_words=8)
    exact = _exact_component_sizes(np.array(src), np.array(dst), n)
    # propagation runs to within saturation of the 199-hop path diameter
    # (zero-change IS a fixpoint: a far vertex whose hash wins no register
    # stops contributing early, so rounds can undershoot diameter slightly)
    assert info["rounds"] >= 150
    # isolated vertices & singletons: linear counting is near-exact
    np.testing.assert_allclose(est[260:], 1.0, rtol=0.05)
    # big components within HLL error (m=64 → σ≈13%; allow ~3σ)
    assert abs(est[0] - 200) / 200 < 0.4
    assert abs(est[210] - 60) / 60 < 0.4
    # neighborhood function is monotone nondecreasing
    nf = np.array(info["neighborhood_function"])
    assert (np.diff(nf) >= -1e-6).all()


def test_hyperanf_sf_tiny(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    eng = VertexEngine(gt.n_vertices, 4)
    eng.load_undirected(build_undirected(gt.edges), presorted=True)
    info = hyperanf(eng, n_words=4)
    est = ball_estimates(eng, n_words=4)
    eng.shutdown()
    et = gt.edges.to_pandas()
    exact = _exact_component_sizes(
        et["src"].to_numpy(), et["dst"].to_numpy(), gt.n_vertices
    )
    # relative error of the MEAN estimate per true-size group within ~2σ
    for size in np.unique(exact):
        sel = exact == size
        mean_est = est[sel].mean()
        assert abs(mean_est - size) / size < 0.35, (size, mean_est)


def test_neighborhood_function_effective_diameter_path():
    """On a path graph the neighborhood function must keep growing for
    ~diameter rounds: the 90% effective diameter estimated from nf lands
    in the right decade (HLL m=32 → wide tolerance, but a path of length
    60 must NOT look like a clique or an edgeless graph)."""
    n = 60
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    _, info = _run(src, dst, n, 2)
    nf = np.asarray(info["neighborhood_function"], np.float64)
    assert info["rounds"] >= n // 2  # balls keep growing ~diameter rounds
    target = 0.9 * nf[-1]
    t = int(np.argmax(nf >= target))
    eff = (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
    # true 90% eff. diameter of P_60 ≈ 48; allow generous sketch error
    assert 20 <= eff <= 59, eff
