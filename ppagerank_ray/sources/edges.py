"""Direct synthetic edge-table source for benchmarking the iteration engine.

Generates the SAME link-formula graph as sources/pages.py (so semantics are
identical to the extracted graph) but as a distributed `(src, dst, weight)`
Dataset straight from the integer formula — no html round-trip. Used by
bench.py to measure PageRank edges/sec at sizes where rendering 10M html
pages would only measure the generator. weight = 1/outdeg is computed
analytically from the formula (outdeg(i) = i%7 + (1 if i%23==0 else 0)),
matching MatNormalizeForPageRank semantics exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ppagerank_ray.sources.pages import N_EXTERNAL


def n_vertices_for(n_pages: int) -> int:
    return n_pages + N_EXTERNAL


def _edges_batch(batch: dict, n_pages: int) -> pa.Table:
    ids = batch["id"].astype(np.int64)
    outdeg_int = ids % 7
    has_ext = (ids % 23 == 0).astype(np.int64)
    outdeg = outdeg_int + has_ext
    total = int(outdeg.sum())
    src = np.repeat(ids, outdeg)
    w = np.repeat(np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0), outdeg)
    # internal dsts: for k in range(i % 7): (i*31 + 7k + 1) % n
    dst = np.empty(total, dtype=np.int64)
    pos = np.concatenate([[0], np.cumsum(outdeg)])
    # vectorized: build per-k layers
    offsets = np.zeros(len(ids), dtype=np.int64)
    for k in range(7):
        sel = outdeg_int > k
        if not sel.any():
            break
        idx = pos[:-1][sel] + offsets[sel]
        dst[idx] = (ids[sel] * 31 + 7 * k + 1) % n_pages
        offsets[sel] += 1
    ext_sel = has_ext.astype(bool)
    idx = pos[:-1][ext_sel] + offsets[ext_sel]
    dst[idx] = n_pages + (ids[ext_sel] % N_EXTERNAL)
    # dedup within row not needed: internal offsets 7k+1 are distinct mod n
    # for k<7 unless n_pages < 44; callers use n_pages ≫ 44.
    return pa.Table.from_pydict({"src": src, "dst": dst, "weight": w})


def synth_edges(n_pages: int, parallelism: int = 64) -> rd.Dataset:
    assert n_pages >= 44, "formula collisions below 44 pages"
    ds = rd.range(n_pages, override_num_blocks=parallelism)
    return ds.map_batches(
        _edges_batch,
        batch_format="numpy",
        batch_size=262144,
        fn_kwargs={"n_pages": n_pages},
    )
