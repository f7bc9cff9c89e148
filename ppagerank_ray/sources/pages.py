"""Deterministic Common-Crawl-style pages table (url, warc_ts, html, text, lang).

This is the engine's primary input per BASELINE.json `input_hint`. Since no
external data is allowed, pages are synthesized deterministically from the
driver-provided `documents` table: page i carries document (i mod n_docs)'s
text/lang, and its html embeds <a href> links defined by a pure integer
formula over the page id, so the resulting link graph is independently
reproducible in SQL (see __ray_entry__.oracle_sql) and at any replication
factor.

Link formula (per page id i, n = number of pages):
  * outdeg(i)       = i % 7                      -> ids with i%7==0 are dangling
  * internal dsts   = (i*31 + 7*k + 1) % n       for k in 0..outdeg(i)-1
  * external link   = ext(i % 5)                 iff i % 23 == 0
  * duplicate href  = first internal dst repeated iff i % 13 == 0 and outdeg>0
    (exercises the dedup path; the reference's input formats are pre-deduped,
     our extractor must collapse duplicates: SURVEY.md §2.7)

Urls are zero-padded so lexicographic url order == numeric id order, and
external urls ('https://zz-...') sort after all page urls — the sort-based
url→id assignment (FIXTURES.md §2) therefore gives page i vertex id i and
external e vertex id n_pages+e, which keeps the SQL oracles exact.

The reference's analogue of this module is its binary graph loaders
(BSMAT petsc_util.cc:190-762, BVGraph petsc_util.cc:770-1063): pre-numbered
adjacency in, matrix out. Our engine starts one step earlier, from raw pages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

PAGE_URL_FMT = "https://pages.example/p/{:08d}"
EXT_URL_FMT = "https://zz-external.example/x/{:04d}"
N_EXTERNAL = 5
WARC_TS_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00 UTC in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def page_url(i: int) -> str:
    return PAGE_URL_FMT.format(i)


def ext_url(e: int) -> str:
    return EXT_URL_FMT.format(e)


def internal_dsts(i: int, n_pages: int) -> list[int]:
    outdeg = i % 7
    return [(i * 31 + 7 * k + 1) % n_pages for k in range(outdeg)]


def hrefs_for_page(i: int, n_pages: int) -> list[str]:
    """All hrefs embedded in page i's html, duplicates included."""
    dsts = internal_dsts(i, n_pages)
    urls = [page_url(d) for d in dsts]
    if i % 13 == 0 and urls:
        urls.append(urls[0])
    if i % 23 == 0:
        urls.append(ext_url(i % N_EXTERNAL))
    return urls


def _render_html(i: int, text: str, n_pages: int) -> bytes:
    links = "".join(f'<a href="{u}">l</a>\n' for u in hrefs_for_page(i, n_pages))
    return (
        f"<html><head><title>p{i}</title></head><body><p>{text}</p>\n"
        f"{links}</body></html>"
    ).encode("utf-8")


def n_documents(sf_dir: str) -> int:
    return pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows


def _synth_shard(
    sf_dir: str, n_docs: int, n_pages: int, lo: int, hi: int
) -> pa.Table:
    """Render pages with ids in [lo, hi). Reads the tiny seed corpus itself
    (KB-scale parquet) — content is a pure function of the page id, so the
    shard layout never affects the data."""
    seed = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    ).sort_by("doc_id")
    texts = seed["text"].to_pylist()
    langs = seed["lang"].to_pylist()
    count = hi - lo
    urls: list[str] = []
    ts = np.empty(count, dtype=np.int64)
    htmls: list[bytes] = []
    out_texts: list[str] = []
    out_langs: list[str] = []
    for pos, i in enumerate(range(lo, hi)):
        d = i % n_docs
        urls.append(page_url(i))
        ts[pos] = WARC_TS_BASE_US + i * 1_000_000
        htmls.append(_render_html(i, texts[d], n_pages))
        out_texts.append(texts[d])
        out_langs.append(langs[d])
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(ts, type=pa.timestamp("us")),
            pa.array(htmls, type=pa.binary()),
            pa.array(out_texts, type=pa.string()),
            pa.array(out_langs, type=pa.string()),
        ],
        schema=PAGES_SCHEMA,
    )


def synth_pages(
    sf_dir: str,
    replicate: int = 1,
    override_parallelism: int | None = None,
) -> rd.Dataset:
    """Pages Dataset for one scale-factor dir; `replicate` scales the graph
    (page count = n_docs * replicate) for bench runs without external data.

    Rendering runs as plain Ray tasks over contiguous page-id ranges →
    from_arrow_refs. A map_batches over the KB-scale seed corpus is NOT used:
    the streaming executor bundles tiny seed blocks into 1-2 render tasks
    regardless of CPUs (measured via ds.stats()), serializing the stage. At
    real crawl scale the pages ARE the input and read_parquet shards them."""
    import ray

    n_docs = n_documents(sf_dir)
    n_pages = n_docs * replicate
    if override_parallelism is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        override_parallelism = max(16, cpus * 4)
    shards = min(n_pages, override_parallelism)
    bounds = [n_pages * i // shards for i in range(shards + 1)]
    fn = ray.remote(_synth_shard)
    refs = [
        fn.remote(sf_dir, n_docs, n_pages, bounds[i], bounds[i + 1])
        for i in range(shards)
        if bounds[i + 1] > bounds[i]
    ]
    return rd.from_arrow_refs(refs)
