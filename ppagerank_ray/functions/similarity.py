"""Similarity search over the embeddings table (list<float> column).

* brute-force cosine top-k: per-batch float64 matmul against a broadcast
  query matrix, partial top-k per batch (combiner), final top-k per query —
  the baseline ANN per the build brief.
* LSH-bucketed ANN: seeded random-hyperplane signatures; candidates share a
  bucket in ≥1 table; exact cosine re-rank. Approximate by design →
  validated by a recall test in pytest, not a SQL oracle.
* near-dup pairs: all pairs with cosine ≥ τ (brute force per batch against
  the broadcast matrix; at 100 TB this becomes the LSH variant).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_SEED = 42


def _embedding_matrix(emb: rd.Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(vec_ids, float64 matrix). Driver-side materialization — used for the
    broadcast side only (queries / near-dup reference set)."""
    t = pa.concat_tables([b for b in ray.get(emb.to_arrow_refs()) if b.num_rows])
    ids = t["vec_id"].to_numpy()
    M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], M[order]


def _cosine(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    An = A / np.linalg.norm(A, axis=1, keepdims=True)
    Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
    return An @ Bn.T


def knn_bruteforce(
    emb: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
) -> pa.Table:
    """Exact top-k by cosine for each query id (self excluded).
    Returns (query_id, rank, neighbor_id, cos) with rank 1..k ordered by
    (cos desc, neighbor_id asc)."""
    qids, Q = _query_matrix(emb, query_ids)
    q_ref = ray.put((qids, Q))

    def partial_topk(t: pa.Table) -> pa.Table:
        qids_, Q_ = ray.get(q_ref)
        ids = t["vec_id"].to_numpy()
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        S = _cosine(Q_, M)  # |q| × batch
        rows = {"query_id": [], "neighbor_id": [], "cos": []}
        for qi, qid in enumerate(qids_):
            s = S[qi]
            mask = ids != qid
            cand_idx = np.flatnonzero(mask)
            take = min(k, len(cand_idx))
            if take == 0:
                continue
            top = cand_idx[np.argpartition(-s[cand_idx], take - 1)[:take]]
            rows["query_id"].extend([qid] * take)
            rows["neighbor_id"].extend(ids[top].tolist())
            rows["cos"].extend(s[top].tolist())
        return pa.Table.from_pydict(
            {
                "query_id": np.asarray(rows["query_id"], np.int64),
                "neighbor_id": np.asarray(rows["neighbor_id"], np.int64),
                "cos": np.asarray(rows["cos"], np.float64),
            }
        )

    partials = emb.map_batches(partial_topk, batch_format="pyarrow", batch_size=4096)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "rank", "neighbor_id", "cos"]]

    out = (
        partials.groupby("query_id")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    out["cos"] = out["cos"].round(6)
    return pa.Table.from_pandas(out, preserve_index=False)


def _query_matrix(emb: rd.Dataset, query_ids: list[int]):
    want = set(int(q) for q in query_ids)
    want_ref = ray.put(want)

    def pick(t: pa.Table) -> pa.Table:
        w = ray.get(want_ref)
        ids = t["vec_id"].to_numpy()
        keep = np.array([int(i) in w for i in ids], dtype=bool)
        return t.filter(pa.array(keep))

    qt = emb.map_batches(pick, batch_format="pyarrow").to_pandas()
    qt = qt.sort_values("vec_id")
    return qt["vec_id"].to_numpy(), np.array(qt["embedding"].tolist(), dtype=np.float64)


def near_dup_embeddings(emb: rd.Dataset, threshold: float = 0.4) -> pa.Table:
    """All pairs (a < b) with cosine ≥ τ. The full set is broadcast once
    (ray.put) and each batch computes its stripe of the similarity matrix —
    O(N·B) per batch, no shuffle."""
    ids_all, M_all = _embedding_matrix(emb)
    ref = ray.put((ids_all, M_all))

    def stripe(t: pa.Table) -> pa.Table:
        ids_a, M_a = ray.get(ref)
        ids = t["vec_id"].to_numpy()
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        S = _cosine(M, M_a)  # batch × all
        bi, aj = np.nonzero(S >= threshold)
        keep = ids[bi] < ids_a[aj]  # a < b, self excluded
        return pa.Table.from_pydict(
            {
                "id_a": ids[bi][keep],
                "id_b": ids_a[aj][keep],
                "cos": np.round(S[bi, aj][keep], 6),
            }
        )

    out = (
        emb.map_batches(stripe, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


class HyperplaneLSH:
    """Actor-pool stage: seeded random hyperplanes built once per actor;
    emits (table, bucket, vec_id) rows for bucketed ANN."""

    def __init__(self, dim: int = 64, n_tables: int = 8, n_bits: int = 4):
        rng = np.random.default_rng(_SEED)
        self.planes = rng.standard_normal((n_tables, n_bits, dim))
        self.n_tables = n_tables

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy()
        M = np.array(t["embedding"].to_pylist(), dtype=np.float64)
        rows_t, rows_b, rows_id = [], [], []
        for ti in range(self.n_tables):
            bits = (M @ self.planes[ti].T) > 0  # batch × n_bits
            bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
            rows_t.append(np.full(len(ids), ti, dtype=np.int64))
            rows_b.append(bucket.astype(np.int64))
            rows_id.append(ids)
        return pa.Table.from_pydict(
            {
                "table": np.concatenate(rows_t),
                "bucket": np.concatenate(rows_b),
                "vec_id": np.concatenate(rows_id),
            }
        )


def ann_lsh(
    emb: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 4,
    concurrency: int = 2,
) -> pa.Table:
    """Approximate top-k: candidates = vectors sharing ≥1 LSH bucket with the
    query, re-ranked by exact cosine. Same output schema as knn_bruteforce."""
    dim = len(emb.take(1)[0]["embedding"])
    lsh = HyperplaneLSH(dim, n_tables, n_bits)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    concurrency = max(1, min(concurrency, cpus - 1))  # never starve downstream
    buckets = emb.map_batches(
        HyperplaneLSH,
        fn_constructor_args=(dim, n_tables, n_bits),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=concurrency,
    ).to_pandas()
    qids, Q = _query_matrix(emb, query_ids)
    q_buckets = {}
    for qi, qid in enumerate(qids):
        for ti in range(n_tables):
            bits = (Q[qi] @ lsh.planes[ti].T) > 0
            q_buckets[(ti, int(bits @ (1 << np.arange(n_bits, dtype=np.int64))))] = None
    # candidates per query: vectors sharing any bucket
    ids_all, M_all = _embedding_matrix(emb)
    pos = {int(v): i for i, v in enumerate(ids_all)}
    rows = []
    for qi, qid in enumerate(qids):
        cand = set()
        for ti in range(n_tables):
            bits = (Q[qi] @ lsh.planes[ti].T) > 0
            b = int(bits @ (1 << np.arange(n_bits, dtype=np.int64)))
            grp = buckets[(buckets["table"] == ti) & (buckets["bucket"] == b)]
            cand.update(int(v) for v in grp["vec_id"])
        cand.discard(int(qid))
        if not cand:
            continue
        cidx = np.array([pos[c] for c in sorted(cand)])
        s = _cosine(Q[qi : qi + 1], M_all[cidx])[0]
        order = np.lexsort((ids_all[cidx], -s))[:k]
        for r, oi in enumerate(order, start=1):
            rows.append((int(qid), r, int(ids_all[cidx][oi]), round(float(s[oi]), 6)))
    return pa.Table.from_pydict(
        {
            "query_id": np.array([r[0] for r in rows], np.int64),
            "rank": np.array([r[1] for r in rows], np.int64),
            "neighbor_id": np.array([r[2] for r in rows], np.int64),
            "cos": np.array([r[3] for r in rows], np.float64),
        }
    )
