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

__all__ = ["PageRankConfig"]
__version__ = "0.1.0"
