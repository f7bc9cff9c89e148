"""Packed sorted-url index: exactness vs a Python dict oracle."""

import numpy as np
import pyarrow as pa
import pytest

from ppagerank_ray.graph.urlindex import (
    SortedUrlIndex,
    UrlIndexUnavailable,
    lookup_positions,
    pack_fixed_width,
)


def _mk(urls):
    return SortedUrlIndex.build(pa.array(urls, pa.string()))


def test_exact_positions_and_misses():
    urls = sorted(["http://a.test/", "http://b.test/x", "zz://ext"])
    ix = _mk(urls)
    q = pa.array(
        ["http://b.test/x", "nope", "zz://ext", "http://a.test/", ""],
        pa.string(),
    )
    pos = lookup_positions(ix.packed, ix.width, q)
    oracle = {u: i for i, u in enumerate(urls)}
    assert pos.tolist() == [oracle.get(s, -1) for s in q.to_pylist()]


def test_over_width_query_forced_miss():
    ix = _mk(["ab", "cd"])
    assert ix.width == 2
    # "ab" + suffix truncates to "ab" at width 2 — must NOT match
    pos = lookup_positions(ix.packed, ix.width, pa.array(["abX", "ab"]))
    assert pos.tolist() == [-1, 0]


def test_nul_query_cannot_false_match_padding():
    ix = _mk(["ab", "abc"])  # "ab" packs as b"ab\x00"
    pos = lookup_positions(
        ix.packed, ix.width, pa.array(["ab\x00", "ab", "\x00\x00\x00"])
    )
    assert pos.tolist() == [-1, 0, -1]


def test_build_rejects_nul_and_unsorted():
    with pytest.raises(UrlIndexUnavailable):
        _mk(["a\x00b"])
    with pytest.raises(UrlIndexUnavailable):
        _mk(["b", "a"])


def test_empty_index_and_empty_batch():
    ix = _mk([])
    assert lookup_positions(ix.packed, ix.width, pa.array(["x"])).tolist() == [-1]
    ix2 = _mk(["a"])
    assert len(lookup_positions(ix2.packed, ix2.width, pa.array([], pa.string()))) == 0


def test_large_string_and_chunked_inputs():
    urls = sorted(f"u{i:04d}" for i in range(100))
    ix = SortedUrlIndex.build(pa.array(urls, pa.large_string()))
    q = pa.chunked_array([pa.array(urls[:50]), pa.array(["zz", *urls[50:]])])
    pos = lookup_positions(ix.packed, ix.width, q)
    expect = list(range(50)) + [-1] + list(range(50, 100))
    assert pos.tolist() == expect


def test_pack_fixed_width_empty_rows_and_offsets():
    arr = pa.array(["", "abc", "", "de", ""])
    packed, too_long = pack_fixed_width(arr, 3)
    assert packed.tolist() == [b"", b"abc", b"", b"de", b""]
    assert not too_long.any()
    # sliced array exercises non-zero arr.offset
    packed2, _ = pack_fixed_width(arr.slice(1, 3), 3)
    assert packed2.tolist() == [b"abc", b"", b"de"]


def test_randomized_vs_dict_oracle():
    rng = np.random.RandomState(7)
    pool = [
        "".join(chr(rng.randint(33, 127)) for _ in range(rng.randint(1, 40)))
        for _ in range(500)
    ]
    urls = sorted(set(pool[:300]))
    ix = _mk(urls)
    oracle = {u: i for i, u in enumerate(urls)}
    q = [pool[rng.randint(len(pool))] for _ in range(1000)]
    pos = lookup_positions(ix.packed, ix.width, pa.array(q))
    assert pos.tolist() == [oracle.get(s, -1) for s in q]
