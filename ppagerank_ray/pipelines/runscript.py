"""Script mode: run many algorithm configs against ONE loaded graph.

Reference: -script reads option lines from stdin and re-runs ComputePageRank
per line against the already-loaded, already-normalized matrix, amortizing
load cost across experiments (ppagerank_main.cc:118-119, 368-404, 430-462;
the options-DB swap dance at :413-467 becomes plain per-spec dicts here).
Unknown algorithms are tolerated without aborting the batch, matching
ppagerank_main.cc:449-452 / PPAGERANK_ERR_ALG_UNKNOWN (ppagerank.h:28).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ppagerank_ray.algos.pagerank import arnoldi, inner_outer, power_iteration
from ppagerank_ray.config import PageRankConfig

ALGORITHMS = {
    "power": power_iteration,
    "inout": inner_outer,
    "arnoldi": arnoldi,
}


def run_script(sf_dir: str, specs: list[dict]) -> pa.Table:
    """Each spec: {"alg": ..., "alpha": ..., "tol": ..., ...}. Returns one
    summary row per run; scores stay in the engine (fetch separately if
    needed — the reference prints residuals only, SURVEY K1)."""
    from ppagerank_ray.engine.vertex_engine import VertexEngine
    from ppagerank_ray.graph.build import build_graph
    from ppagerank_ray.sources.pages import synth_pages

    gt = build_graph(synth_pages(sf_dir))
    engine = VertexEngine(gt.n_vertices, num_partitions=4)
    engine.load_directed(gt.edges)

    rows = {"run": [], "alg": [], "alpha": [], "iterations": [],
            "converged": [], "top_id": [], "top_score": []}
    try:
        for i, spec in enumerate(specs):
            alg = spec.get("alg", "power")
            fn = ALGORITHMS.get(alg)
            if fn is None:  # tolerate unknown alg, keep going
                rows["run"].append(i)
                rows["alg"].append(alg)
                rows["alpha"].append(float(spec.get("alpha", 0.85)))
                rows["iterations"].append(-1)
                rows["converged"].append(False)
                rows["top_id"].append(-1)
                rows["top_score"].append(0.0)
                continue
            cfg = PageRankConfig(
                alpha=float(spec.get("alpha", 0.85)),
                tol=float(spec.get("tol", 1e-7)),
                maxiter=int(spec.get("maxiter", 10000)),
            )
            info = fn(engine, cfg)
            # per-run summary incl. the top-ranked vertex: distributed
            # per-partition argmax, O(P) on the driver (reference prints
            # residuals only — SURVEY K1; the top row is the natural
            # user-facing summary for a sink-less script run)
            top_score, top_id = engine.top1("x", decimals=6)
            rows["run"].append(i)
            rows["alg"].append(alg)
            rows["alpha"].append(cfg.alpha)
            rows["iterations"].append(int(info["iteration"]))
            rows["converged"].append(bool(info["converged"]))
            rows["top_id"].append(top_id)
            rows["top_score"].append(round(top_score, 6))
    finally:
        engine.shutdown()
    return pa.Table.from_pydict(
        {
            "run": pa.array(rows["run"], pa.int64()),
            "alg": pa.array(rows["alg"], pa.string()),
            "alpha": pa.array(rows["alpha"], pa.float64()),
            "iterations": pa.array(rows["iterations"], pa.int64()),
            "converged": pa.array(rows["converged"], pa.bool_()),
            "top_id": pa.array(rows["top_id"], pa.int64()),
            "top_score": pa.array(rows["top_score"], pa.float64()),
        }
    )
