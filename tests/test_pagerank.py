"""PageRank conformance: engine vs the transliterated numpy oracle
(SURVEY.md §5 item 2 — allclose 1e-6 required; we assert far tighter)."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data as rd

from ppagerank_ray.algos.pagerank import (
    arnoldi,
    inner_outer,
    numpy_power_oracle,
    power_iteration,
)
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_graph
from ppagerank_ray.sources.pages import synth_pages


def _edges_ds(src, dst, n):
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    w = np.zeros(len(src))
    nz = outdeg[src] > 0
    w[nz] = 1.0 / outdeg[src][nz]
    return rd.from_arrow(
        pa.Table.from_pydict(
            {
                "src": np.asarray(src, np.int64),
                "dst": np.asarray(dst, np.int64),
                "weight": w,
            }
        )
    )


def _run_engine(src, dst, n, cfg, P=3, v=None):
    engine = VertexEngine(n, P)
    engine.load_directed(_edges_ds(src, dst, n))
    info = power_iteration(engine, cfg, v=v)
    x = engine.to_array("x")
    engine.shutdown()
    return x, info


def test_line5_one_step_by_hand():
    """5-node path 0→1→2→3→4; one power step from uniform, hand-computed
    against the exact update order of ppagerank.cc:299-330."""
    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 4])
    n, alpha = 5, 0.85
    cfg = PageRankConfig(alpha=alpha, tol=0.0, maxiter=1)
    x, _ = _run_engine(src, dst, n, cfg)
    # y = α·P'x: each of nodes 1..4 receives 0.2; ω = 1 − 4·0.17
    y = np.array([0.0, 0.17, 0.17, 0.17, 0.17])
    omega = 1.0 - y.sum()
    expected = y + omega / n
    np.testing.assert_allclose(x, expected, atol=1e-15)


def test_dangling_star_mass_conservation():
    """Star: leaves 1..4 → center 0; center dangling. Exercises the implicit
    d'x = e'x − e'P'x trick (ppagerank.cc:694-715) via the ω shift."""
    src = np.array([1, 2, 3, 4])
    dst = np.array([0, 0, 0, 0])
    n = 5
    cfg = PageRankConfig(alpha=0.85, tol=1e-12)
    x, info = _run_engine(src, dst, n, cfg)
    xo, deltas = numpy_power_oracle(src, dst, n, tol=1e-12)
    assert info["iteration"] == len(deltas)
    np.testing.assert_allclose(x, xo, atol=1e-14)
    assert abs(x.sum() - 1.0) < 1e-12  # ‖x‖₁ == 1 every iteration invariant


@pytest.mark.parametrize("P", [1, 2, 4])
def test_power_matches_oracle_across_partitions(sf_tiny, P):
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    cfg = PageRankConfig(alpha=0.85, tol=1e-8)
    engine = VertexEngine(gt.n_vertices, P)
    engine.load_directed(gt.edges)
    info = power_iteration(engine, cfg)
    x = engine.to_array("x")
    engine.shutdown()
    xo, deltas = numpy_power_oracle(src, dst, gt.n_vertices, tol=1e-8)
    assert info["iteration"] == len(deltas)
    assert np.allclose(x, xo, atol=1e-6)  # the north-rule gate
    assert np.abs(x - xo).max() < 1e-12  # and much tighter in practice
    np.testing.assert_allclose(
        info["residual_l1"], deltas[-1], rtol=1e-6
    )


def test_personalization_vector(sf_tiny):
    """-pvec semantics (ppagerank.cc:91-104, 311-315): x⁰ = v, shift ω·v."""
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    n = gt.n_vertices
    v = (np.arange(n) % 10 + 1).astype(np.float64)
    v /= v.sum()
    cfg = PageRankConfig(alpha=0.85, tol=1e-8)
    x, info = _run_engine(src, dst, n, cfg, P=3, v=v)
    xo, deltas = numpy_power_oracle(src, dst, n, tol=1e-8, v=v)
    assert info["iteration"] == len(deltas)
    assert np.abs(x - xo).max() < 1e-12


def test_inner_outer_converges_to_power_fixpoint(sf_tiny):
    """inout is a different iteration path to the same fixpoint
    (ppagerank.cc:341-501): compare at tight tolerance."""
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    n = gt.n_vertices
    engine = VertexEngine(n, 3)
    engine.load_directed(gt.edges)
    info = inner_outer(engine, PageRankConfig(alpha=0.85, tol=1e-10))
    x = engine.to_array("x")
    engine.shutdown()
    assert info["converged"]
    xo, _ = numpy_power_oracle(src, dst, n, tol=1e-12)
    assert np.abs(x - xo).max() < 1e-8


def test_arnoldi_converges_to_power_fixpoint(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    n = gt.n_vertices
    engine = VertexEngine(n, 3)
    engine.load_directed(gt.edges)
    info = arnoldi(engine, PageRankConfig(alpha=0.85, tol=1e-10, maxiter=50))
    x = engine.to_array("x")
    engine.shutdown()
    assert info["converged"]
    xo, _ = numpy_power_oracle(src, dst, n, tol=1e-13)
    xo /= xo.sum()
    assert np.abs(x - xo).max() < 1e-8


def test_arnoldi_breakdown_on_tiny_graph():
    """Krylov dimension < k=8: the basis exhausts; the guard shrinks the
    factorization instead of dividing by ~0 (ADVICE round 1)."""
    src = np.array([0, 1, 2])
    dst = np.array([1, 2, 0])
    n = 3
    engine = VertexEngine(n, 2)
    engine.load_directed(_edges_ds(src, dst, n))
    info = arnoldi(engine, PageRankConfig(alpha=0.85, tol=1e-10, maxiter=50))
    x = engine.to_array("x")
    engine.shutdown()
    assert np.all(np.isfinite(x))
    x_ref, _ = numpy_power_oracle(src, dst, n, tol=1e-14)
    np.testing.assert_allclose(x, x_ref, atol=1e-8)


def test_engine_top1():
    src = np.array([0, 1, 2, 3])
    dst = np.array([2, 2, 3, 2])
    n = 5
    engine = VertexEngine(n, 3)
    engine.load_directed(_edges_ds(src, dst, n))
    power_iteration(engine, PageRankConfig(tol=1e-10))
    x = engine.to_array("x")
    val, vid = engine.top1("x")
    engine.shutdown()
    assert vid == int(np.argmax(x)) and val == x[np.argmax(x)]
