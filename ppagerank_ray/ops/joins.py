"""Partitioned hash join — the both-sides-large path for url→id mapping.

Ray Data 2.49 has no Dataset.join; the portable pattern (ray_guide 'Joins
and lookups') is an explicit bucketed hash join: add `bucket = hash(key) % B`
to both sides, shuffle each by bucket once, and merge matching buckets with
vectorized pandas inside map_groups. B is the join parallelism knob; skewed
hot keys can be salted into sub-buckets by raising B.

Used by graph.build when the vertex table exceeds the broadcast threshold
(BROADCAST_MAX_VERTICES) — at 10^12 documents the url→id map cannot live in
one object, so both joins of SURVEY.md §2.4 (src_url, then dst_url) run as
bucketed shuffles over the same bucket count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def fnv1a64(col) -> np.ndarray:
    """Vectorized FNV-1a over each string's utf-8 bytes (python hash() is
    salted and unusable across processes). One numpy pass per byte POSITION
    (loop length = longest string), all rows advanced in lockstep, reading
    straight from the Arrow offsets/data buffers — no per-string Python.
    uint64 arithmetic wraps mod 2^64 exactly like the scalar FNV."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.cast(pa.large_utf8())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    n = len(arr)
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    if n == 0:
        return h
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = off[1:] - off[:-1]
    base = off[:-1]
    prime = np.uint64(0x100000001B3)
    for j in range(int(lens.max()) if n else 0):
        act = np.flatnonzero(lens > j)
        b = data[base[act] + j].astype(np.uint64)
        h[act] = (h[act] ^ b) * prime
    return h


def _bucket_of(col, n_buckets: int) -> np.ndarray:
    """Deterministic bucket: vectorized FNV-1a for strings, plain modulo for
    integers."""
    if pa.types.is_integer(col.type):
        return (col.to_numpy() % n_buckets).astype(np.int64)
    return (fnv1a64(col) % np.uint64(n_buckets)).astype(np.int64)


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_key: str,
    right_key: str,
    n_buckets: int = 64,
    how: str = "inner",
    impl: str = "arrow",
) -> rd.Dataset:
    """Join two Datasets on string keys via B-bucket co-shuffle.

    Output columns = left columns + right columns minus right_key (pandas
    merge semantics). One groupby shuffle over the union of both sides.

    impl="arrow" (default) merges each bucket with pyarrow.Table.join —
    zero-copy from the object store, no string boxing; overlapping
    non-key columns get the same ("", "_r") suffixes pandas used.
    impl="pandas" keeps the original pandas merge as a tested fallback."""

    def tag(side: int, key: str):
        def fn(t: pa.Table) -> pa.Table:
            b = _bucket_of(t[key], n_buckets)
            return t.append_column("__bucket", pa.array(b)).append_column(
                "__side", pa.array(np.full(t.num_rows, side, dtype=np.int8))
            )

        return fn

    lt = left.map_batches(tag(0, left_key), batch_format="pyarrow")
    rt = right.map_batches(tag(1, right_key), batch_format="pyarrow")
    # union of heterogeneous schemas: pad each side with the other's columns
    # (typed nulls, so the union schema is consistent)
    lschema, rschema = left.schema().base_schema, right.schema().base_schema
    lcols = list(lschema.names)
    rcols = list(rschema.names)
    types = {
        **{n: lschema.field(n).type for n in lcols},
        **{n: rschema.field(n).type for n in rcols},
    }

    # pad + reorder to ONE canonical column order: Dataset.union requires
    # identical schemas incl. column order (mismatch silently misaligns
    # blocks downstream)
    order = lcols + [c for c in rcols if c not in lcols] + ["__bucket", "__side"]

    def canon(missing: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            for c in missing:
                t = t.append_column(c, pa.nulls(t.num_rows, type=types[c]))
            return t.select(order)

        return fn

    lt = lt.map_batches(canon([c for c in rcols if c not in lcols]), batch_format="pyarrow")
    rt = rt.map_batches(canon([c for c in lcols if c not in rcols]), batch_format="pyarrow")

    if impl == "arrow":
        import pyarrow.compute as pc

        join_type = {"inner": "inner", "left": "left outer"}[how]

        def merge_bucket_arrow(g: pa.Table) -> pa.Table:
            side = g["__side"]
            lf = g.filter(pc.equal(side, 0)).select(lcols)
            rf = g.filter(pc.equal(side, 1)).select(rcols)
            # Table.join drops the right key when names differ and keeps
            # one coalesced key when they match — exactly the pandas-merge
            # output contract documented above
            return lf.join(
                rf,
                keys=left_key,
                right_keys=right_key,
                join_type=join_type,
                left_suffix="",
                right_suffix="_r",
            )

        return lt.union(rt).groupby("__bucket").map_groups(
            merge_bucket_arrow, batch_format="pyarrow"
        )

    # pandas fallback. Each side's rows carry NULLs in the OTHER side's
    # columns, which makes pandas upcast sliced int columns to float64;
    # cast back to each column's ORIGINAL integer dtype so (a) join keys
    # compare as ints and (b) the output schema matches the inputs —
    # without this a chained hash_join re-buckets float keys and loses
    # rows. (Int values must survive a float64 round-trip, i.e.
    # |v| ≤ 2^53 — use string keys for raw 64-bit hashes.)
    int_cols = {
        c: types[c].to_pandas_dtype() for c in types if pa.types.is_integer(types[c])
    }

    def _restore(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        df = df[cols]
        casts = {
            c: int_cols[c]
            for c in cols
            if c in int_cols and df[c].dtype != int_cols[c]
        }
        return df.astype(casts) if casts else df

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = _restore(g[g["__side"] == 0], lcols)
        rf = _restore(g[g["__side"] == 1], rcols)
        out = lf.merge(
            rf, left_on=left_key, right_on=right_key, how=how, suffixes=("", "_r")
        )
        if right_key != left_key and right_key in out.columns:
            out = out.drop(columns=[right_key])
        return out

    return lt.union(rt).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pandas"
    )


def map_links_via_hash_join(
    links: rd.Dataset, vertices: rd.Dataset, n_buckets: int = 64
) -> rd.Dataset:
    """(src_url, dst_url) → (src, dst) via two bucketed joins against the
    (id, url) vertex table — the >BROADCAST_MAX_VERTICES path."""
    v = vertices.map_batches(
        lambda t: t.rename_columns(["id", "url"]), batch_format="pyarrow"
    )
    j1 = hash_join(links, v, "src_url", "url", n_buckets)
    j1 = j1.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["id"].cast(pa.int64()).combine_chunks(), t["dst_url"].combine_chunks()],
            names=["src", "dst_url"],
        ),
        batch_format="pyarrow",
    )
    j2 = hash_join(j1, v, "dst_url", "url", n_buckets)
    return j2.map_batches(
        lambda t: pa.Table.from_arrays(
            [
                t["src"].cast(pa.int64()).combine_chunks(),
                t["id"].cast(pa.int64()).combine_chunks(),
            ],
            names=["src", "dst"],
        ),
        batch_format="pyarrow",
    )
