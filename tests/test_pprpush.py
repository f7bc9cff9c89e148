"""Local PPR integer push — exact-match vs the single-machine replay of
the identical synchronous schedule, mass conservation, and the
broadcast-vs-hash-join scatter path equivalence (round-5 addition)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.pprpush import (
    SCALE,
    numpy_ppr_push_oracle,
    numpy_sweep_oracle,
    ppr_push,
    sweep_cut,
)


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _check(src, dst, n, rounds=10):
    got = ppr_push(_edges_ds(src, dst), n, rounds=rounds)
    ids, p, r = numpy_ppr_push_oracle(
        np.asarray(src, np.int64), np.asarray(dst, np.int64), rounds=rounds
    )
    assert got["id"].to_numpy().tolist() == ids.tolist()
    assert got["p_mass"].to_numpy().tolist() == p.tolist()
    assert got["r_mass"].to_numpy().tolist() == r.tolist()
    # floor-division remainders stay at the pusher: exact conservation
    assert got["p_mass"].to_numpy().sum() + got["r_mass"].to_numpy().sum() == SCALE
    return got


def test_star_plus_triangle():
    src = [0, 0, 0, 0, 5, 6, 7, 1, 0]
    dst = [1, 2, 3, 4, 6, 7, 5, 0, 1]
    got = _check(src, dst, 8)
    # seed is the hub (max degree); mass stays inside its component
    assert 0 in got["id"].to_pylist()
    assert set(got["id"].to_pylist()) <= {0, 1, 2, 3, 4}


def test_random_graph_matches_replay():
    rng = np.random.default_rng(3)
    n = 200
    src = rng.integers(0, n, 1200)
    dst = rng.integers(0, n, 1200)
    _check(src, dst, n)


def test_locality_on_two_components():
    # two cliques joined nowhere: pushes never cross components
    import itertools

    c1 = list(itertools.combinations(range(6), 2))
    c2 = list(itertools.combinations(range(10, 14), 2))
    src = [a for a, _ in c1 + c2]
    dst = [b for _, b in c1 + c2]
    got = _check(src, dst, 14)
    assert set(got["id"].to_pylist()) <= set(range(6))


def test_sweep_cut_matches_bruteforce():
    rng = np.random.default_rng(9)
    n = 150
    src = rng.integers(0, n, 800)
    dst = rng.integers(0, n, 800)
    ds = _edges_ds(src, dst)
    ppr = ppr_push(ds, n, rounds=6)
    got = sweep_cut(ds, ppr)
    sweep, cuts, vols = numpy_sweep_oracle(
        np.asarray(src, np.int64), np.asarray(dst, np.int64), ppr
    )
    assert got["id"].to_numpy().tolist() == sweep.tolist()
    assert got["cut_edges"].to_numpy().tolist() == cuts.tolist()
    assert got["vol"].to_numpy().tolist() == vols.tolist()
    # conductance consistent with the integer columns
    cond = got["conductance"].to_numpy()
    denom = np.minimum(vols, 2 * len(np.unique(
        np.minimum(src, dst)[src != dst] * (1 << 32)
        + np.maximum(src, dst)[src != dst])) - vols)
    ok = denom > 0
    assert np.allclose(cond[ok], cuts[ok] / denom[ok])


def test_sweep_cut_finds_planted_cluster():
    # two dense cliques bridged by one edge: the min-conductance prefix
    # is exactly the seed's clique
    import itertools

    c1 = list(itertools.combinations(range(8), 2))
    c2 = list(itertools.combinations(range(8, 14), 2))
    src = [a for a, _ in c1 + c2] + [0]
    dst = [b for _, b in c1 + c2] + [8]
    ds = _edges_ds(src, dst)
    ppr = ppr_push(ds, 14, rounds=8)
    got = sweep_cut(ds, ppr)
    cond = got["conductance"].to_numpy()
    best_t = int(got["t"].to_numpy()[np.argmin(cond)])
    best_set = set(got["id"].to_numpy()[:best_t].tolist())
    assert best_set == set(range(8))


def test_forced_join_paths(monkeypatch):
    import ppagerank_ray.algos.pprpush as pp

    rng = np.random.default_rng(5)
    n = 80
    src = rng.integers(0, n, 400)
    dst = rng.integers(0, n, 400)
    base = ppr_push(_edges_ds(src, dst), n, rounds=4, n_buckets=4)
    monkeypatch.setattr(pp, "PUSH_BROADCAST_MAX_ACTIVE", 0)
    joined_scatter = ppr_push(_edges_ds(src, dst), n, rounds=4, n_buckets=4)
    assert base.to_pydict() == joined_scatter.to_pydict()
    monkeypatch.setattr(pp, "BROADCAST_MAX_VERTEX_DEGREES", -1)
    joined_deg = ppr_push(_edges_ds(src, dst), n, rounds=4, n_buckets=4)
    assert base.to_pydict() == joined_deg.to_pydict()


def test_multi_seed_matches_replay():
    rng = np.random.default_rng(21)
    n = 100
    src = rng.integers(0, n, 500)
    dst = rng.integers(0, n, 500)
    seeds = [3, 41, 77]
    got = ppr_push(_edges_ds(src, dst), n, rounds=5, seed=seeds)
    ids, p, r = numpy_ppr_push_oracle(
        np.asarray(src, np.int64), np.asarray(dst, np.int64),
        rounds=5, seed=seeds,
    )
    assert got["id"].to_numpy().tolist() == ids.tolist()
    assert got["p_mass"].to_numpy().tolist() == p.tolist()
    assert got["r_mass"].to_numpy().tolist() == r.tolist()
    assert got["p_mass"].to_numpy().sum() + got["r_mass"].to_numpy().sum() == SCALE


def test_duplicate_seeds_rejected():
    src = [0, 1]
    dst = [1, 2]
    with pytest.raises(ValueError):
        ppr_push(_edges_ds(src, dst), 3, seed=[1, 1])
