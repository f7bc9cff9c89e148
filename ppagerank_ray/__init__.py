"""ppagerank_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch reimplementation of the *capabilities* of dgleich/ppagerank
(reference at /root/reference, PETSc+MPI) on Ray Data: web pages in Parquet →
link extraction (map_batches over Arrow) → url→id-mapped edge table →
iterative graph algorithms (PageRank power / inner-outer / Arnoldi, connected
components, label propagation, triangle counting) over a partitioned
actor-pool vertex engine, plus training-data operators (dedup, similarity
search, text analysis) over document/embedding tables.

Never calls ray.init()/ray.shutdown() — sessions are owned by the caller
(bench.py, CLI, pytest fixture, or the verification driver).
"""

from ppagerank_ray.config import PageRankConfig


def tune_data_context(min_block: int = 256 * 1024, max_block: int = 2 * 1024 * 1024):
    """Size Ray Data blocks for MB-scale pipelines. Ray's defaults
    (target_min_block_size=1MiB bundling, 128MiB blocks) are tuned for
    >100GB inputs; at the 10-500MB scale they bundle whole stages into 1-4
    tasks and serialize the pipeline (measured: a pure map stage ran 2 tasks
    regardless of CPUs). Call once per session after ray.init. At true
    100TB scale the defaults are correct — don't call this there."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.target_min_block_size = min_block
    ctx.target_max_block_size = max_block
    return ctx


__all__ = ["PageRankConfig", "tune_data_context"]
__version__ = "0.1.0"
