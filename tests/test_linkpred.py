"""Link-prediction scores (common neighbors / Adamic-Adar / Jaccard) —
exact-match tests vs a brute-force adjacency-set oracle, across the
sampling knob, the hub valve, and both degree-attach paths (broadcast
bincount vs distributed hash joins)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from ppagerank_ray.algos import triangles as tri
from ppagerank_ray.algos.linkpred import (
    AA_SCALE,
    link_prediction,
    numpy_linkpred_oracle,
)


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _rand_graph(seed, V=60, E=400):
    rng = np.random.default_rng(seed)
    return rng.integers(0, V, E), rng.integers(0, V, E), V


def _as_dict(df):
    return {
        (int(r.u), int(r.v)): (int(r.common_neighbors), int(r.aa_e9), float(r.jaccard))
        for r in df.itertuples()
    }


def test_linkpred_matches_bruteforce(ray_session):
    src, dst, V = _rand_graph(3)
    out = link_prediction(_edges_ds(src, dst), V, n_groups=16).to_pandas()
    exp = numpy_linkpred_oracle(src, dst)
    assert _as_dict(out) == exp
    # derived float column is exactly the integer divided once
    assert (out["adamic_adar"] == out["aa_e9"] / AA_SCALE).all()
    # u < v everywhere; every scored pair really has >= 1 common neighbor
    assert (out["u"] < out["v"]).all()
    assert (out["common_neighbors"] >= 1).all()


def test_linkpred_sampling_is_subset(ray_session):
    src, dst, V = _rand_graph(5)
    full = _as_dict(link_prediction(_edges_ds(src, dst), V, n_groups=16).to_pandas())
    samp = _as_dict(
        link_prediction(_edges_ds(src, dst), V, sample_mod=4, n_groups=16).to_pandas()
    )
    assert set(samp) < set(full)
    assert samp == {k: full[k] for k in samp}  # same scores, fewer pairs
    assert samp == numpy_linkpred_oracle(src, dst, sample_mod=4)


def test_linkpred_hub_valve(ray_session):
    # star + a triangle: valve skips the hub center, keeps the rest
    src = np.array([0, 0, 0, 0, 0, 1, 2, 1], np.int64)
    dst = np.array([1, 2, 3, 4, 5, 2, 6, 6], np.int64)
    full = _as_dict(link_prediction(_edges_ds(src, dst), 7, n_groups=4).to_pandas())
    valved = _as_dict(
        link_prediction(
            _edges_ds(src, dst), 7, max_center_degree=3, n_groups=4
        ).to_pandas()
    )
    # hub 0 has degree 5 > 3: wedges centered at 0 vanish; centers 1,2 stay
    assert set(valved) < set(full)
    for (u, v), (cn, aa, _j) in valved.items():
        assert cn <= full[(u, v)][0]
        assert aa <= full[(u, v)][1]
    # pair (0,6): common neighbors {1,2}, both centers deg 3 — unaffected
    assert valved[(0, 6)] == full[(0, 6)]


def test_linkpred_join_path_equals_broadcast(ray_session):
    src, dst, V = _rand_graph(11, V=40, E=200)
    ds = _edges_ds(src, dst)
    a = _as_dict(link_prediction(ds, V, n_groups=8).to_pandas())
    saved = tri.BROADCAST_MAX_VERTEX_DEGREES
    try:
        tri.BROADCAST_MAX_VERTEX_DEGREES = 0  # force distributed joins
        b = _as_dict(link_prediction(ds, V, n_groups=8).to_pandas())
    finally:
        tri.BROADCAST_MAX_VERTEX_DEGREES = saved
    assert a == b
