"""Jones-Plassmann greedy coloring (algos/coloring.py): properness,
greedy bound (color(v) ≤ deg(v)), partition invariance, hand cases, and
equality with the sequential greedy coloring in priority order (the
defining semantics — JP computes exactly that)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.anf import splitmix64
from ppagerank_ray.algos.coloring import greedy_coloring
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _run(src, dst, n, P, seed=17):
    eng = VertexEngine(n, P)
    eng.load_undirected(build_undirected(_edges_ds(src, dst)))
    info = greedy_coloring(eng, seed=seed)
    col = eng.to_array("color", integer=True)
    eng.shutdown()
    assert (col >= 0).all()
    return col, info


def _adj(src, dst, n):
    adj = [set() for _ in range(n)]
    for a, b in zip(np.asarray(src), np.asarray(dst)):
        if a != b:
            adj[int(a)].add(int(b))
            adj[int(b)].add(int(a))
    return adj


def _sequential_greedy(src, dst, n, seed):
    """Greedy coloring in priority order — the value JP must reproduce."""
    ids = np.arange(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = splitmix64(ids * np.uint64(0x100000001B3) + np.uint64(seed))
    p = h.view(np.int64).copy()
    p[p == np.iinfo(np.int64).max] -= 1
    adj = _adj(src, dst, n)
    col = np.full(n, -1, np.int64)
    for v in np.argsort(p):
        used = {int(col[u]) for u in adj[v] if col[u] >= 0}
        c = 0
        while c in used:
            c += 1
        col[v] = c
    return col


def _check_proper(src, dst, n, col):
    a = np.asarray(src, np.int64)
    b = np.asarray(dst, np.int64)
    m = a != b
    assert not (col[a[m]] == col[b[m]]).any()


def test_coloring_path_uses_two_colors():
    src, dst = [0, 1, 2, 3], [1, 2, 3, 4]
    col, _ = _run(src, dst, 5, P=2)
    _check_proper(src, dst, 5, col)
    assert col.max() <= 1


def test_coloring_clique_uses_n_colors():
    n = 6
    src = [i for i in range(n) for j in range(i + 1, n)]
    dst = [j for i in range(n) for j in range(i + 1, n)]
    col, info = _run(src, dst, n, P=3)
    assert sorted(col.tolist()) == list(range(n))
    assert info["n_colors"] == n


@pytest.mark.parametrize("P", [1, 4])
def test_coloring_random_matches_sequential_greedy(P):
    rng = np.random.default_rng(31)
    n = 200
    src = rng.integers(0, n, 600)
    dst = rng.integers(0, n, 600)
    col, _ = _run(src, dst, n, P)
    _check_proper(src, dst, n, col)
    expect = _sequential_greedy(src, dst, n, seed=17)
    assert (col == expect).all()
    deg = np.array([len(s) for s in _adj(src, dst, n)], np.int64)
    assert (col <= deg).all()


def test_coloring_partition_invariance():
    rng = np.random.default_rng(37)
    n = 150
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, n, 500)
    c1, _ = _run(src, dst, n, P=1)
    c4, _ = _run(src, dst, n, P=4)
    assert (c1 == c4).all()
