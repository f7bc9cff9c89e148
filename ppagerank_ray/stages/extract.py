"""Link + text extraction from raw page html — stateless Arrow batch stages.

This is the engine's analogue of the reference's BVGraph streaming decoder
(bvgraph_matrix.cc:74-371: compressed bit stream → per-row successor lists):
raw crawl bytes in, adjacency arcs out. Unlike the reference's inherently
sequential decoder (reference-window state, SURVEY.md §2.1 ST3), html pages
are independent, so extraction is an embarrassingly parallel map_batches.

Per-row invariant (BASELINE.json input_hint): the text extracted from `html`
must be byte-identical to the `text` column for every url —
`text_invariant_stats` verifies it over the whole Dataset without
materializing anything on the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

# Compiled once per worker process at import time (cheap state; an actor pool
# would be overkill for a pair of regexes — see SURVEY.md §7.2).
HREF_RE = re.compile(rb'<a href="([^"]+)"')
TEXT_RE = re.compile(rb"<p>(.*?)</p>", re.S)

LINKS_SCHEMA = pa.schema([("src_url", pa.string()), ("dst_url", pa.string())])


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """(url, html) batch → exploded (src_url, dst_url) rows, duplicates kept
    (dedup is a separate, global stage: SURVEY.md §2.7)."""
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    src: list[str] = []
    dst: list[str] = []
    findall = HREF_RE.findall
    for u, h in zip(urls, htmls):
        for m in findall(h):
            src.append(u)
            dst.append(m.decode("utf-8"))
    return pa.Table.from_arrays(
        [pa.array(src, type=pa.string()), pa.array(dst, type=pa.string())],
        schema=LINKS_SCHEMA,
    )


def extract_links(pages: rd.Dataset) -> rd.Dataset:
    return pages.select_columns(["url", "html"]).map_batches(
        extract_links_batch, batch_format="pyarrow", batch_size=4096
    )


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """(url, html) → (url, extracted_text)."""
    htmls = batch["html"].to_pylist()
    texts: list[str] = []
    search = TEXT_RE.search
    for h in htmls:
        m = search(h)
        texts.append(m.group(1).decode("utf-8") if m else "")
    return pa.Table.from_arrays(
        [batch["url"], pa.array(texts, type=pa.string())],
        names=["url", "extracted_text"],
    )


def _invariant_batch(batch: pa.Table) -> pa.Table:
    htmls = batch["html"].to_pylist()
    texts = batch["text"].to_pylist()
    search = TEXT_RE.search
    bad = 0
    for h, t in zip(htmls, texts):
        m = search(h)
        if m is None or m.group(1) != t.encode("utf-8"):
            bad += 1
    return pa.Table.from_pydict(
        {
            "n_pages": np.array([len(htmls)], dtype=np.int64),
            "n_mismatch": np.array([bad], dtype=np.int64),
        }
    )


def text_invariant_stats(pages: rd.Dataset) -> tuple[int, int]:
    """(n_pages, n_mismatch) — partial counts per batch, summed by Ray Data."""
    partials = pages.select_columns(["url", "html", "text"]).map_batches(
        _invariant_batch, batch_format="pyarrow", batch_size=4096
    )
    agg = partials.sum(["n_pages", "n_mismatch"])
    return int(agg["sum(n_pages)"]), int(agg["sum(n_mismatch)"])
