"""PII detection + redaction over a text column — the scrubbing stage a
training-data pipeline runs before anything leaves the corpus (C4 /
MassiveText-style preprocessing; no reference analogue — the LLM-data-ops
family next to dedup/quality in SURVEY §2).

Three pattern classes (email, IPv4, NANP-style phone) are counted and then
replaced by placeholder tokens. All matching runs through Arrow's RE2
kernels (`pyarrow.compute.count_substring_regex` /
`replace_substring_regex`) — vectorized C++ over the whole batch, zero
Python per row, and the SAME regex engine DuckDB's `regexp_*` functions
use, so the driver-harness SQL oracle replays the kernels exactly.

Semantics (mirrored verbatim in the oracle):
* counts are per-pattern matches against the ORIGINAL text, independent
  of each other;
* redaction applies the replacements SEQUENTIALLY email → IP → phone
  (an email's digits can no longer be claimed by a later pattern);
* `redacted_fp` = md5 hex of the redacted text (same fingerprint idiom
  as textstats.fingerprint_batch) — equality against the original
  fingerprint is the "document was clean" indicator, and the hash keeps
  the scrubbed text itself out of the result exchange (only 32-byte
  digests shuffle, never documents — the exact-dedup scale rule).

Streaming map_batches, bounded per-doc work; 100 TB-safe by the same
argument as the other per-document text stages.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# RE2-compatible (Arrow and DuckDB both run RE2 — keep these free of
# lookarounds/backrefs, which RE2 rejects)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

# (output count column, pattern, placeholder) in REPLACEMENT order
PII_PATTERNS = [
    ("n_emails", EMAIL_RE, "<EMAIL>"),
    ("n_ips", IPV4_RE, "<IP>"),
    ("n_phones", PHONE_RE, "<PHONE>"),
]


def redact_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    texts = t[text_col]
    cols: dict = {"doc_id": t["doc_id"]}
    for name, pattern, _ in PII_PATTERNS:
        cols[name] = pc.cast(
            pc.count_substring_regex(texts, pattern), pa.int64()
        )
    red = texts
    for _, pattern, token in PII_PATTERNS:
        red = pc.replace_substring_regex(red, pattern=pattern, replacement=token)
    fps = [
        hashlib.md5(x.encode("utf-8")).hexdigest() for x in red.to_pylist()
    ]
    cols["redacted_fp"] = pa.array(fps, type=pa.string())
    return pa.Table.from_pydict(cols)


def pii_redaction(docs: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(doc_id, n_emails, n_ips, n_phones, redacted_fp) per document."""
    return docs.map_batches(
        lambda t: redact_batch(t, text_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
