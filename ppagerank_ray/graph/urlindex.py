"""Zero-object url→id lookup over the sorted vertex-url array.

Vertex ids ARE sort ranks (graph/build.sort_assign_ids), so url→id is a
binary search, not a hash join. This module packs the sorted url array
into a fixed-width numpy byte matrix (dtype ``S<width>``) once on the
driver; every lookup is then one vectorized ``np.searchsorted`` + one
vectorized equality verify — pure C, zero Python objects, zero per-task
state.

Why not a hash table: the round-4 6M-page scale run measured the
per-actor ``pd.Index`` over 6M urls at 469 s for a ~15 s stage — eight
actors simultaneously boxing 6M Python strings each drove the kernel
into sustained THP compaction (khugepaged/kcompactd ≈ 500 s CPU), with
worker time >98% system. ``pc.index_in`` is no better: it re-hashes the
whole O(V) value set on every call. The packed matrix has neither
problem: it is built once, ``ray.put`` once, and ``ray.get`` maps the
SAME plasma buffer into every worker on the node (numpy arrays are
zero-copy out of the object store) — per-worker setup cost is an mmap.

Correctness contract:
  * UTF-8 byte order == code-point order, and both Arrow's string sort
    (which assigned the ids) and numpy's S-dtype compare are plain
    byte-lexicographic, so searchsorted positions are exact. ``build``
    verifies the packed matrix is non-decreasing anyway and raises
    ``UrlIndexUnavailable`` if not.
  * Padding is NUL bytes and numpy S-compare ignores trailing NULs, so
    equality is exact string equality — UNLESS a url itself contains a
    NUL byte. ``build`` rejects those (UrlIndexUnavailable → callers
    fall back to the hash path); query batches mask NUL-bearing rows
    into the miss lane instead (a NUL-bearing url cannot be in the
    index, so miss is the correct verdict).
  * Query strings longer than the packed width are forced to miss
    (truncation could alias a width-length entry); they cannot be in
    the index either.

The reference never needs any of this (its inputs are pre-numbered,
petsc_util.cc:560-608); this is the engine's analogue of BSMAT's
row/col decode bounds check, at crawl scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

# Broadcasting the packed matrix costs width×V bytes of plasma; beyond
# this the hash-join id path is the right tool (same rationale as
# BROADCAST_MAX_VERTICES, but width-aware).
PACKED_MAX_BYTES = 8_000_000_000


class UrlIndexUnavailable(Exception):
    """The packed-matrix contract doesn't hold (NUL bytes, non-sorted
    input, oversized broadcast); callers fall back to a hash path."""


def _flat_view(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths, flat utf8 bytes) of a string/large_string array,
    zero-copy out of the Arrow buffers."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type):
        odt = np.int32
    elif pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        arr = arr.cast(pa.large_string())
        odt = np.int64
    if arr.null_count:
        raise UrlIndexUnavailable("null url")
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    dbuf = arr.buffers()[2]
    data = (
        np.frombuffer(dbuf, dtype=np.uint8)
        if dbuf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return np.diff(offs), data[offs[0] : offs[-1]] if len(arr) else data[:0]


def pack_fixed_width(
    arr: pa.Array, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Arrow strings → (S<width> array, too_long row mask). Rows longer
    than `width` pack as empty (callers must treat them via the mask).
    One fancy-index scatter — no Python-object round trip."""
    lengths, flat = _flat_view(arr)
    n = len(lengths)
    too_long = lengths > width
    if too_long.any():
        keep_len = np.where(too_long, 0, lengths)
    else:
        keep_len = lengths
    out = np.zeros((n, width), dtype=np.uint8)
    total = int(keep_len.sum())
    if total:
        if too_long.any():
            starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
            src_pos = (
                np.repeat(starts, keep_len)
                + _intra_offsets(keep_len)
            )
            src = flat[src_pos]
        else:
            src = flat
        rows = np.repeat(np.arange(n, dtype=np.int64), keep_len)
        cols = _intra_offsets(keep_len)
        out[rows, cols] = src
    return out.reshape(n * width).view(f"S{width}"), too_long


def _intra_offsets(lengths: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated — per-row byte positions."""
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(lengths)
    out = np.ones(total, dtype=np.int64)
    out[0] = 0
    nz = lengths > 0
    first_of_row = np.concatenate([[0], ends[:-1]])[nz]
    out[first_of_row[1:]] = -(lengths[nz][:-1] - 1)
    return np.cumsum(out)


@dataclass
class SortedUrlIndex:
    """Driver-side handle: `packed` is the broadcast payload (put it in
    the object store ONCE); lookups go through `lookup_positions`."""

    packed: np.ndarray  # (n,) dtype S<width>, sorted ascending
    width: int

    @classmethod
    def build(cls, urls: pa.Array | pa.ChunkedArray) -> "SortedUrlIndex":
        lengths, flat = _flat_view(urls)
        if (flat == 0).any():
            raise UrlIndexUnavailable("url contains NUL byte")
        width = int(lengths.max()) if len(lengths) else 1
        if width * len(lengths) > PACKED_MAX_BYTES:
            raise UrlIndexUnavailable(
                f"packed index {width}×{len(lengths)} exceeds "
                f"PACKED_MAX_BYTES ({PACKED_MAX_BYTES})"
            )
        packed, too_long = pack_fixed_width(
            urls if not isinstance(urls, pa.ChunkedArray)
            else urls.combine_chunks(),
            width,
        )
        assert not too_long.any()
        if len(packed) > 1 and not bool(np.all(packed[1:] >= packed[:-1])):
            raise UrlIndexUnavailable("url array is not byte-sorted")
        return cls(packed=packed, width=width)


def lookup_positions(
    packed: np.ndarray, width: int, batch: pa.Array | pa.ChunkedArray
) -> np.ndarray:
    """Positions of each batch string in the sorted packed array, -1 on
    miss. Vectorized searchsorted + equality verify; NUL-bearing and
    over-width query rows are forced to miss (they cannot be present)."""
    n = len(packed)
    q, too_long = pack_fixed_width(
        batch if not isinstance(batch, pa.ChunkedArray)
        else batch.combine_chunks(),
        width,
    )
    if n == 0:
        return np.full(len(q), -1, dtype=np.int64)
    pos = np.searchsorted(packed, q)
    cand = np.minimum(pos, n - 1)
    hit = (packed[cand] == q) & (pos < n) & ~too_long
    # NUL-bearing query rows could false-match via NUL padding; they are
    # never in the index (build rejects NULs) so force them to miss.
    lengths, flat = _flat_view(
        batch if not isinstance(batch, pa.ChunkedArray)
        else batch.combine_chunks()
    )
    if (flat == 0).any():
        ends = np.cumsum(lengths)
        zc = np.concatenate([[0], np.cumsum(flat == 0, dtype=np.int64)])
        has_nul = (zc[ends] - zc[ends - lengths]) > 0
        hit &= ~has_nul
    return np.where(hit, cand, np.int64(-1))
