"""Maximal matching (algos/matching.py): symmetry, edge-validity,
maximality, partition invariance, hand cases. The matching itself is
pinned by the deterministic key permutation; the driver-harness SQL
oracle replays it value-for-value."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.matching import maximal_matching
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _run(src, dst, n, P, seed=13):
    eng = VertexEngine(n, P)
    eng.load_undirected(build_undirected(_edges_ds(src, dst)))
    info = maximal_matching(eng, seed=seed)
    partner = eng.to_array("partner", integer=True)
    eng.shutdown()
    return partner, info


def _check_properties(src, dst, n, partner):
    a = np.asarray(src, np.int64)
    b = np.asarray(dst, np.int64)
    m = a != b
    a, b = np.minimum(a[m], b[m]), np.maximum(a[m], b[m])
    eset = set(zip(a.tolist(), b.tolist()))
    matched = np.flatnonzero(partner >= 0)
    # symmetry, no self-pairs, pairs are real edges
    assert (partner[partner[matched]] == matched).all()
    assert (partner[matched] != matched).all()
    for v in matched:
        u = int(partner[v])
        assert (min(u, v), max(u, v)) in eset
    # maximality: no edge with both endpoints unmatched
    unm = partner < 0
    assert not (unm[a] & unm[b]).any()


def test_matching_single_edge():
    partner, info = _run([0], [1], 3, P=2)
    assert partner.tolist() == [1, 0, -1]
    assert info["n_matched"] == 2


def test_matching_triangle_leaves_one_unmatched():
    partner, _ = _run([0, 1, 2], [1, 2, 0], 3, P=2)
    assert int((partner >= 0).sum()) == 2
    _check_properties([0, 1, 2], [1, 2, 0], 3, partner)


def test_matching_star_matches_exactly_one_leaf():
    n = 6
    src = [0] * (n - 1)
    dst = list(range(1, n))
    partner, _ = _run(src, dst, n, P=3)
    assert int((partner >= 0).sum()) == 2
    assert partner[0] >= 1  # the center is always matched
    _check_properties(src, dst, n, partner)


@pytest.mark.parametrize("P", [1, 4])
def test_matching_random_graph_properties(P):
    rng = np.random.default_rng(23)
    n = 200
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    partner, _ = _run(src, dst, n, P)
    _check_properties(src, dst, n, partner)


def test_matching_partition_invariance():
    rng = np.random.default_rng(29)
    n = 150
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    p1, _ = _run(src, dst, n, P=1)
    p4, _ = _run(src, dst, n, P=4)
    assert (p1 == p4).all()
