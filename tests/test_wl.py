"""Weisfeiler-Leman color refinement (algos/wl.py): the induced vertex
partition must equal sequential 1-WL refinement exactly (colors are
hashes, so classes — not values — are the semantics), plus partition
invariance and structural hand cases."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.wl import wl_refinement
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected


def _run(src, dst, n, P, rounds=3):
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
    wl_refinement(eng, rounds=rounds)
    col = eng.to_array("wl", integer=True)
    eng.shutdown()
    return col


def _ref_wl(src, dst, n, rounds):
    """Sequential 1-WL over distinct undirected neighbors (the engine's
    domain: distinct edges, self-loops dropped)."""
    adj = [set() for _ in range(n)]
    for a, b in zip(src, dst):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    col = [0] * n
    for _ in range(rounds):
        sig = [
            (col[v], tuple(sorted(col[u] for u in adj[v]))) for v in range(n)
        ]
        m: dict = {}
        col = [m.setdefault(s, len(m)) for s in sig]
    return col


def _same_partition(a, b):
    fwd: dict = {}
    bwd: dict = {}
    for x, y in zip(a, b):
        assert fwd.setdefault(x, y) == y
        assert bwd.setdefault(y, x) == x


def test_wl_path_graph_symmetry():
    col = _run([0, 1, 2, 3], [1, 2, 3, 4], 5, P=2, rounds=2)
    # ends alike, their neighbors alike, center distinct
    assert col[0] == col[4] and col[1] == col[3]
    assert len({col[0], col[1], col[2]}) == 3


def test_wl_regular_graph_single_class():
    # 6-cycle: every vertex is WL-equivalent forever
    src = [0, 1, 2, 3, 4, 5]
    dst = [1, 2, 3, 4, 5, 0]
    col = _run(src, dst, 6, P=3, rounds=4)
    assert len(set(col.tolist())) == 1


@pytest.mark.parametrize("P", [1, 4])
def test_wl_matches_sequential_refinement(P):
    rng = np.random.default_rng(41)
    n = 120
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    col = _run(src, dst, n, P)
    ref = _ref_wl(src, dst, n, 3)
    _same_partition(col.tolist(), ref)


def test_wl_partition_invariance():
    rng = np.random.default_rng(43)
    n = 150
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    assert (_run(src, dst, n, 1) == _run(src, dst, n, 4)).all()
