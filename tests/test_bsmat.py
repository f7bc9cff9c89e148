"""BSMAT source/sink parity (reference petsc_util.cc:190-762 semantics)."""

import gzip

import numpy as np
import pytest

from ppagerank_ray.algos.pagerank import numpy_power_oracle, power_iteration
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import normalize_edge_weights
from ppagerank_ray.sources.bsmat import (
    load_matrix,
    read_bsmat,
    write_bsmat,
)


def _random_matrix(m=200, n=200, nnz=1500, seed=7):
    rng = np.random.default_rng(seed)
    key = np.unique(rng.integers(0, m * n, size=nnz))
    src, dst = (key // n).astype(np.int64), (key % n).astype(np.int64)
    vals = rng.uniform(0.5, 2.0, size=len(src))
    return src, dst, vals, m, n


def test_roundtrip_plain_and_gzip(tmp_path):
    src, dst, vals, m, n = _random_matrix()
    for compress, name in [(False, "g.bsmat"), (True, "g.bsmat.gz")]:
        path = str(tmp_path / name)
        write_bsmat(path, src, dst, vals, m, n, compress=compress)
        ds, rm, rn, rnnz = read_bsmat(path)
        assert (rm, rn, rnnz) == (m, n, len(src))
        t = ds.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
        np.testing.assert_array_equal(t["src"], src)
        np.testing.assert_array_equal(t["dst"], dst)
        np.testing.assert_array_equal(t["weight"], vals)


def test_bounds_validation(tmp_path):
    src = np.array([0, 5], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    path = str(tmp_path / "bad.bsmat")
    write_bsmat(path, src, dst, np.ones(2), m=3, n=3)  # row 5 out of range
    with pytest.raises(Exception, match="row=5 is out of range"):
        read_bsmat(path, validate_degs=False)


def test_degs_mismatch_detected(tmp_path):
    src, dst, vals, m, n = _random_matrix(50, 50, 200)
    path = str(tmp_path / "g.bsmat")
    write_bsmat(path, src, dst, vals, m, n)
    degs = np.fromfile(path + ".degs", dtype="<i4").copy()
    degs[3] += 1
    degs.tofile(path + ".degs")
    with pytest.raises(Exception, match="degree file mismatch at row 3"):
        read_bsmat(path)


def test_pagerank_on_weighted_bsmat(tmp_path):
    """Weighted rows: normalization divides by the row VALUE sum
    (MatNormalizeForPageRank), then power iteration matches an oracle run
    on the same normalized weights."""
    src, dst, vals, m, n = _random_matrix(120, 120, 900)
    path = str(tmp_path / "g.bsmat")
    write_bsmat(path, src, dst, vals, m, n)
    ds, rm, rn, _ = read_bsmat(path)
    norm = normalize_edge_weights(ds, rm).materialize()
    eng = VertexEngine(rm, 3)
    eng.load_directed(norm)
    info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-10))
    x = eng.to_array("x")
    eng.shutdown()
    # oracle with explicit normalized weights
    row_sums = np.zeros(rm)
    np.add.at(row_sums, src, vals)
    w = vals / row_sums[src]
    xo = np.full(rm, 1.0 / rm)
    for _ in range(info["iteration"]):
        y = np.bincount(dst, weights=xo[src] * w, minlength=rm).astype(np.float64)
        y *= 0.85
        y += (1.0 - y.sum()) / rm
        xo = y
    assert np.abs(x - xo).max() < 1e-12


def test_load_matrix_dispatch(tmp_path):
    src, dst, vals, m, n = _random_matrix(30, 30, 100)
    path = str(tmp_path / "g.bsmat")
    write_bsmat(path, src, dst, vals, m, n)
    ds, rm, rn, nnz = load_matrix(path)
    assert (rm, rn, nnz) == (m, n, len(src))
    with pytest.raises(ValueError, match="unknown matrix format"):
        load_matrix(str(tmp_path / "g.xyz"))
