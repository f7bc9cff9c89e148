"""Link/text extraction stage tests (SURVEY.md §5 strategy items 1 & 3)."""

import numpy as np
import pyarrow as pa

from ppagerank_ray.sources.pages import (
    hrefs_for_page,
    n_documents,
    page_url,
    synth_pages,
)
from ppagerank_ray.stages.extract import (
    extract_links,
    extract_links_batch,
    text_invariant_stats,
)


def test_text_invariant_byte_identical(sf_tiny):
    pages = synth_pages(sf_tiny)
    n, bad = text_invariant_stats(pages)
    assert n == n_documents(sf_tiny)
    assert bad == 0


def test_links_match_formula_with_duplicates(sf_tiny):
    nd = n_documents(sf_tiny)
    links = extract_links(synth_pages(sf_tiny)).to_pandas()
    got = list(zip(links["src_url"], links["dst_url"]))
    expected = []
    for i in range(nd):
        for u in hrefs_for_page(i, nd):
            expected.append((page_url(i), u))
    assert sorted(got) == sorted(expected)
    # duplicates must exist pre-dedup (i % 13 == 0 pages with outdeg > 0)
    assert len(expected) > len(set(expected))


def test_extract_links_batch_unit():
    t = pa.Table.from_pydict(
        {
            "url": ["u1"],
            "html": [b'<p>x</p><a href="a">l</a><a href="b">l</a><a href="a">l</a>'],
        }
    )
    out = extract_links_batch(t)
    assert out["src_url"].to_pylist() == ["u1", "u1", "u1"]
    assert out["dst_url"].to_pylist() == ["a", "b", "a"]


def test_replicate_scales_pages(sf_tiny):
    nd = n_documents(sf_tiny)
    pages = synth_pages(sf_tiny, replicate=2)
    assert pages.count() == 2 * nd
    n, bad = text_invariant_stats(synth_pages(sf_tiny, replicate=2))
    assert (n, bad) == (2 * nd, 0)
