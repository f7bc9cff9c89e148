"""Deterministic weighted sampling — the final step of a curation pass.

Given per-row acceptance weights in [0, 1] (e.g. the curation mixing
weight = centrality × quality), keep each row iff
splitmix64(id·K + seed) / 2^64 < weight. A pure function of (id, seed),
so the sample is identical under any partitioning, batch size or
execution order (the same order-invariance contract as
graph.build.sample_edges), reproducible bit-for-bit in SQL, and fully
streaming — no shuffle, no driver state. At 100 TB this is the only
sampling shape that composes with resume: re-running a failed shard
reproduces exactly the same kept set.

The uint64→float64 conversion and the single IEEE comparison are
identical operations on the numpy and DuckDB sides, so a 6dp-rounded
weight column yields a hash-stable sample.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

_K = np.uint64(0x100000001B3)
_TWO64 = float(1 << 64)


def weighted_sample_mask(
    ids: np.ndarray, weights: np.ndarray, seed: int = 0
) -> np.ndarray:
    """int64 0/1 mask: keep iff splitmix64(id·K + seed)/2^64 < weight."""
    from ppagerank_ray.algos.anf import splitmix64

    with np.errstate(over="ignore"):
        h = splitmix64(ids.astype(np.uint64) * _K + np.uint64(seed))
    return (h.astype(np.float64) / _TWO64 < weights).astype(np.int64)


def weighted_bernoulli(
    ds: rd.Dataset, id_col: str, weight_col: str, seed: int = 0
) -> rd.Dataset:
    """Filter a Dataset to the deterministic weighted sample."""

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        m = weighted_sample_mask(
            t[id_col].to_numpy(), t[weight_col].to_numpy(), seed
        )
        return t.filter(pa.array(m.astype(bool)))

    return ds.map_batches(keep, batch_format="pyarrow")
