"""Maximal independent set (algos/mis.py): independence, maximality,
partition-count invariance, hand example, no-edge / clique extremes.

The MIS itself is pinned by the deterministic priority permutation —
there is no single "correct" MIS to diff against networkx, so the tests
assert the defining properties exactly plus determinism across engine
partition counts (the driver-harness SQL oracle replays the identical
priority hash and round rule for value-level conformance)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.mis import maximal_independent_set
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _run(src, dst, n, P, seed=7):
    eng = VertexEngine(n, P)
    eng.load_undirected(build_undirected(_edges_ds(src, dst)))
    info = maximal_independent_set(eng, seed=seed)
    st = eng.to_array("mis_status", integer=True)
    eng.shutdown()
    assert (st != 0).all(), "fixpoint must leave no active vertices"
    return st, info


def _check_properties(src, dst, n, st):
    in_mis = st == 1
    a = np.asarray(src, np.int64)
    b = np.asarray(dst, np.int64)
    m = a != b
    a, b = a[m], b[m]
    # independence: no undirected edge inside the MIS
    assert not (in_mis[a] & in_mis[b]).any()
    # maximality: every non-member has a member neighbor
    has = np.zeros(n, dtype=bool)
    np.logical_or.at(has, a, in_mis[b])
    np.logical_or.at(has, b, in_mis[a])
    assert (in_mis | has).all()


def test_mis_hand_path():
    # path 0-1-2-3-4 plus isolated 5: the isolated vertex always joins
    src, dst, n = [0, 1, 2, 3], [1, 2, 3, 4], 6
    st, info = _run(src, dst, n, P=2)
    _check_properties(src, dst, n, st)
    assert st[5] == 1
    assert info["n_mis"] == int((st == 1).sum())


def test_mis_clique_has_exactly_one_member():
    n = 8
    src = [i for i in range(n) for j in range(i + 1, n)]
    dst = [j for i in range(n) for j in range(i + 1, n)]
    st, info = _run(src, dst, n, P=3)
    assert int((st == 1).sum()) == 1
    assert info["rounds"] <= 2  # one join + removal round, one fixpoint pass


def test_mis_no_edges_everyone_joins():
    st, _ = _run([], [], 7, P=2)
    assert (st == 1).all()


@pytest.mark.parametrize("P", [1, 4])
def test_mis_random_graph_properties(P):
    rng = np.random.default_rng(11)
    n = 200
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    st, _ = _run(src, dst, n, P)
    _check_properties(src, dst, n, st)


def test_mis_partition_invariance_and_seed_sensitivity():
    rng = np.random.default_rng(5)
    n = 150
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    st1, _ = _run(src, dst, n, P=1)
    st4, _ = _run(src, dst, n, P=4)
    assert (st1 == st4).all()
    # a different seed reorders priorities and (generically) the MIS
    st_alt, _ = _run(src, dst, n, P=2, seed=1234)
    _check_properties(src, dst, n, st_alt)
