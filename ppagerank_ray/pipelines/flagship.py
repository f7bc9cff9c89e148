"""Flagship end-to-end pipeline: pages → link graph → PageRank scores.

Mirrors the reference lifecycle (SURVEY.md §3.1) re-expressed Ray-Data-first:
read pages → extract links (stateless map_batches) → vertex table (sort-based
ids) → deduped weighted edge table (groupby/join) → partitioned actor engine
→ power iteration → (id, score) Dataset. Unlike the reference — which
discards the computed vector (SURVEY.md K1) — results are real Datasets and
can be written as partitioned Parquet.
"""

from __future__ import annotations

import ray.data as rd

from ppagerank_ray.algos.pagerank import power_iteration
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import GraphTables, build_graph
from ppagerank_ray.sources.pages import synth_pages


def build_graph_for_sf(sf_dir: str, replicate: int = 1) -> GraphTables:
    return build_graph(synth_pages(sf_dir, replicate=replicate))


def run_flagship(
    sf_dir: str,
    replicate: int = 1,
    cfg: PageRankConfig | None = None,
    num_partitions: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
) -> tuple[rd.Dataset, dict]:
    """Returns ((id, score) Dataset — materialized, engine shut down), info."""
    cfg = cfg or PageRankConfig()
    gt = build_graph_for_sf(sf_dir, replicate)
    engine = VertexEngine(gt.n_vertices, num_partitions)
    engine.load_directed(gt.edges, presorted=gt.edges_sorted)
    info = power_iteration(
        engine,
        cfg,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
    )
    info["n_vertices"] = gt.n_vertices
    info["n_edges"] = gt.n_edges
    scores = engine.result_dataset("x", "score").materialize()
    engine.shutdown()
    return scores, info
