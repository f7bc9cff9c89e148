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


# Rows per packing chunk are sized so the int64 destination scratch
# stays ~16 MB. Monolithic packing at crawl scale (6M urls) allocated
# multi-GB np.repeat/cumsum temporaries whose FIRST-touch page faults
# run ~1000× slower than warm pages under this kernel (measured:
# np.repeat of 0.98 GB fresh = 190 s vs the same-size warm scatter =
# 0.95 s); chunking + one reused scratch buffer pays the cold cost once
# on ~16 MB instead of every call on gigabytes, and writes `out`
# strictly sequentially.
_PACK_SCRATCH_ELEMS = 2_000_000


def pack_fixed_width(
    arr: pa.Array, width: int
) -> tuple[np.ndarray, np.ndarray]:
    """Arrow strings → (S<width> array, too_long row mask). Rows longer
    than `width` pack as empty (callers must treat them via the mask).
    Chunked segmented-cumsum scatter — no Python-object round trip, no
    unbounded temporaries."""
    lengths, flat = _flat_view(arr)
    n = len(lengths)
    too_long = lengths > width
    any_long = bool(too_long.any())
    keep_len = np.where(too_long, 0, lengths) if any_long else lengths
    out = np.zeros(n * max(width, 1), dtype=np.uint8)
    packed = out.view(f"S{max(width, 1)}")[:n]
    if n == 0 or int(keep_len.max(initial=0)) == 0:
        return packed, too_long
    src_starts = np.empty(n + 1, dtype=np.int64)
    src_starts[0] = 0
    np.cumsum(lengths, out=src_starts[1:])
    chunk_rows = max(4096, _PACK_SCRATCH_ELEMS // max(width, 1))
    scratch = np.empty(
        min(n, chunk_rows) * width, dtype=np.int64
    )  # reused across chunks
    for lo in range(0, n, chunk_rows):
        hi = min(lo + chunk_rows, n)
        kl = keep_len[lo:hi]
        total = int(kl.sum())
        if total == 0:
            continue
        dest = _dest_offsets_into(
            kl, np.int64(lo) * width, width, scratch[:total]
        )
        if any_long:
            src = flat[
                _src_positions(kl, lengths[lo:hi], src_starts[lo:hi])
            ]
        else:
            src = flat[src_starts[lo] : src_starts[lo] + total]
        out[dest] = src
    return packed, too_long


def _dest_offsets_into(
    kl: np.ndarray, base: np.int64, width: int, scratch: np.ndarray
) -> np.ndarray:
    """Destination byte offsets for a chunk: row r's kept bytes land at
    [base + r*width, …). One segmented cumsum into `scratch` (len ==
    kl.sum()); consecutive positions within a row differ by 1, row
    boundaries jump to the next row's slot."""
    nz = np.flatnonzero(kl)
    d = nz.astype(np.int64) * width + base  # dest start per nonzero row
    ln = kl[nz].astype(np.int64)
    scratch.fill(1)
    first = np.empty(len(nz), dtype=np.int64)
    first[0] = 0
    np.cumsum(ln[:-1], out=first[1:])
    scratch[first[0]] = d[0]
    if len(nz) > 1:
        scratch[first[1:]] = d[1:] - d[:-1] - ln[:-1] + 1
    return np.cumsum(scratch, out=scratch)


def _src_positions(
    kl: np.ndarray, lengths: np.ndarray, starts: np.ndarray
) -> np.ndarray:
    """Source byte positions in `flat` for a chunk where some rows are
    dropped (too long ⇒ kl == 0): gather of each kept row's
    [starts, starts+kl) range. Same segmented-cumsum shape as
    `_dest_offsets_into`; chunk-bounded."""
    nz = np.flatnonzero(kl)
    s = starts[nz]
    ln = kl[nz].astype(np.int64)
    total = int(ln.sum())
    pos = np.ones(total, dtype=np.int64)
    first = np.empty(len(nz), dtype=np.int64)
    first[0] = 0
    np.cumsum(ln[:-1], out=first[1:])
    pos[first[0]] = s[0]
    if len(nz) > 1:
        pos[first[1:]] = s[1:] - s[:-1] - ln[:-1] + 1
    return np.cumsum(pos, out=pos)


@dataclass
class SortedUrlIndex:
    """Driver-side handle: `packed` is the broadcast payload (put it in
    the object store ONCE); lookups go through `lookup_positions`."""

    packed: np.ndarray  # (n,) dtype S<width>, sorted ascending
    width: int

    @classmethod
    def build(cls, urls: pa.Array | pa.ChunkedArray) -> "SortedUrlIndex":
        lengths, flat = _flat_view(urls)
        # min()==0 ⇔ a NUL byte exists; np.min scans without the
        # flat-sized bool temporary (flat == 0) would allocate.
        if flat.size and int(flat.min()) == 0:
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
