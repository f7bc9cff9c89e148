"""Exact integer-quantized k-means (Lloyd) over the embeddings table.

Classic distributed Lloyd iterations with every source of float
nondeterminism removed, so the result is bit-identical under any
partitioning / execution order AND replayable verbatim in SQL:

* vectors quantize once to int64 at 1e-6 resolution — floor(x·1e6 + 0.5)
  with the multiply done in float64 (float32→float64 is exact, and the
  IEEE product+floor is the same everywhere);
* distances are exact integer Σ(x−c)² (int64 — 64 dims × (2.2e6)² ≈
  3e14 ≪ 2^63);
* assignment ties break to the smallest centroid index (np.argmin's
  first-occurrence == SQL ORDER BY d2, c);
* centroid update is the FLOOR of the integer mean (floor toward −inf
  on both sides; empty clusters keep their previous centroid);
* init = deterministic farthest-first traversal (Gonzalez, TCS 1985):
  seed 0 is the smallest vec_id; each next seed maximizes the exact
  integer min-distance to the chosen set, ties to the smallest vec_id.
  One streaming pass per seed — each batch emits its best candidate
  (max min-d2) WITH the winning quantized vector; a distributed
  sort+limit(1) over the ≤ #batches candidate rows picks the global
  best, so neither the corpus nor the candidate set reaches the driver.

Scale shape: one streaming assign+partial-sums pass per iteration —
each batch emits a (k × d)-row partial (cluster, dim, sum, count),
combined driver-side (k·d ints, constant size); centroids broadcast
once per iteration via ray.put. The corpus itself never shuffles and
never reaches the driver — the standard Lloyd-on-MapReduce shape.
(At > 9e15 total quantized mass per cluster the SQL oracle's
float64-division floor would lose exactness; the engine's
np.floor_divide stays exact — the oracle comparison only runs at
fixture scale.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

KMEANS_K = 8
KMEANS_ITERS = 5
KMEANS_SCALE = 1_000_000.0


def _quantize(X: np.ndarray) -> np.ndarray:
    return np.floor(X.astype(np.float64) * KMEANS_SCALE + 0.5).astype(np.int64)


def _assign(Xq: np.ndarray, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n,) argmin cluster + (n,) exact integer squared distance."""
    # ||x−c||² expanded: x·x − 2 x·c + c·c — all int64-exact
    xx = np.einsum("nd,nd->n", Xq, Xq)
    cc = np.einsum("kd,kd->k", C, C)
    xc = Xq @ C.T
    d2 = xx[:, None] - 2 * xc + cc[None, :]
    a = np.argmin(d2, axis=1)  # first occurrence == smallest cluster id
    return a, d2[np.arange(len(a)), a]


def kmeans_exact(
    emb: rd.Dataset, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> rd.Dataset:
    """(vec_id, cluster, d2) Dataset, vec_id-sorted, after `iters` Lloyd
    updates + one final assignment against the updated centroids. The
    assignment is returned as a STREAMING Dataset — materialization is
    the caller's choice; nothing corpus-sized touches the driver."""
    import ray

    from ppagerank_ray.functions.similarity import _unpack_batch

    sdf = emb.sort("vec_id").limit(1).to_pandas()
    C = _quantize(np.stack(sdf["embedding"].to_numpy()))
    d = C.shape[1]
    while C.shape[0] < k:
        sref = ray.put(C)

        def candidate(t: pa.Table) -> pa.Table:
            S = ray.get(sref)
            ids, X = _unpack_batch(t)
            Xq = _quantize(X)
            _, d2 = _assign(Xq, S)  # min squared distance to chosen set
            i = int(np.lexsort((ids, -d2))[0])  # max d2, tie → min id
            return pa.Table.from_pydict(
                {
                    "vec_id": ids[i : i + 1].astype(np.int64),
                    "d2": d2[i : i + 1],
                    "vec": pa.array([Xq[i].tolist()], pa.list_(pa.int64())),
                }
            )

        # global best (max d2, ties → min vec_id) via a distributed
        # sort+limit over the ≤ #batches candidate rows — the reduce
        # never pulls the candidate set to the driver
        best = (
            emb.map_batches(candidate, batch_format="pyarrow", batch_size=4096)
            .sort(["d2", "vec_id"], descending=[True, False])
            .limit(1)
            .take(1)
        )[0]
        C = np.vstack([C, np.asarray(best["vec"], np.int64)])

    for _ in range(iters):
        cref = ray.put(C)

        def partials(t: pa.Table) -> pa.Table:
            Cb = ray.get(cref)
            _, X = _unpack_batch(t)
            Xq = _quantize(X)
            a, _ = _assign(Xq, Cb)
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, Xq)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            return pa.Table.from_pydict(
                {
                    "cluster": np.repeat(np.arange(k, dtype=np.int64), d),
                    "dim": np.tile(np.arange(d, dtype=np.int64), k),
                    "s": sums.reshape(-1),
                    "n": np.repeat(cnt, d),
                }
            )

        pt = pa.concat_tables(
            [
                b
                for b in ray.get(
                    emb.map_batches(
                        partials, batch_format="pyarrow", batch_size=4096
                    ).to_arrow_refs()
                )
                if b.num_rows
            ]
        )
        sums = np.zeros((k, d), np.int64)
        cnts = np.zeros(k, np.int64)
        cl = pt["cluster"].to_numpy()
        dm = pt["dim"].to_numpy()
        np.add.at(sums, (cl, dm), pt["s"].to_numpy())
        first_dim = dm == 0
        np.add.at(cnts, cl[first_dim], pt["n"].to_numpy()[first_dim])
        nz = cnts > 0
        C = C.copy()
        C[nz] = np.floor_divide(sums[nz], cnts[nz, None])

    cref = ray.put(C)

    def final_assign(t: pa.Table) -> pa.Table:
        Cb = ray.get(cref)
        ids, X = _unpack_batch(t)
        a, d2 = _assign(_quantize(X), Cb)
        return pa.Table.from_pydict(
            {"vec_id": ids.astype(np.int64), "cluster": a.astype(np.int64),
             "d2": d2}
        )

    out = emb.map_batches(final_assign, batch_format="pyarrow", batch_size=4096)
    return out.sort("vec_id")
