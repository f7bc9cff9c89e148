"""Rich-club (k, n_rich, e_rich) — exact-match tests vs a brute-force
numpy oracle and networkx's rich_club_coefficient (round-5 addition to
the SURVEY.md §2.9 engine-only structure family)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.richclub import numpy_rich_club_oracle, rich_club


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _check(src, dst, n):
    got = rich_club(_edges_ds(src, dst), n)
    ks, n_rich, e_rich = numpy_rich_club_oracle(
        np.asarray(src, np.int64), np.asarray(dst, np.int64)
    )
    assert got["k"].to_numpy().tolist() == ks.tolist()
    assert got["n_rich"].to_numpy().tolist() == n_rich.tolist()
    assert got["e_rich"].to_numpy().tolist() == e_rich.tolist()
    return got


def test_hand_graph():
    # star (hub 0, leaves 1-4) + triangle 5-6-7 + dup/reciprocal/self edges
    src = [0, 0, 0, 0, 5, 6, 7, 7, 1, 0, 3]
    dst = [1, 2, 3, 4, 6, 7, 5, 5, 0, 1, 3]
    got = _check(src, dst, 8)
    # degrees: 0→4, leaves→1, triangle→2; thresholds {1, 2, 4}
    rows = {
        k: (a, b)
        for k, a, b in zip(
            got["k"].to_pylist(), got["n_rich"].to_pylist(), got["e_rich"].to_pylist()
        )
    }
    assert rows == {1: (4, 3), 2: (1, 0), 4: (0, 0)}


def test_random_vs_numpy_and_networkx():
    rng = np.random.default_rng(7)
    n = 120
    src = rng.integers(0, n, 900)
    dst = rng.integers(0, n, 900)
    got = _check(src, dst, n)
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_edges_from(
        (int(a), int(b)) for a, b in zip(src, dst) if a != b
    )
    phi = nx.rich_club_coefficient(g, normalized=False)
    for k, nr, er in zip(
        got["k"].to_pylist(), got["n_rich"].to_pylist(), got["e_rich"].to_pylist()
    ):
        if k in phi and nr > 1:
            assert phi[k] == pytest.approx(2.0 * er / (nr * (nr - 1)))


def test_forced_join_path(monkeypatch):
    import ppagerank_ray.algos.richclub as rc

    rng = np.random.default_rng(11)
    n = 60
    src = rng.integers(0, n, 300)
    dst = rng.integers(0, n, 300)
    broadcast = rich_club(_edges_ds(src, dst), n)
    monkeypatch.setattr(rc, "BROADCAST_MAX_VERTEX_DEGREES", -1)
    joined = rich_club(_edges_ds(src, dst), n)
    assert broadcast.to_pydict() == joined.to_pydict()
