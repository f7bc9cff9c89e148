"""Katz centrality over the vertex engine — engine-only breadth beyond the
reference's PageRank-family solvers (like HITS/components/triangles; the
reference has no Katz, cf. ppagerank.cc's alg dispatch at 278-297).

x_t = β·1 + α·Aᵀ x_{t-1},  x_0 = β·1, over the UNWEIGHTED deduped
adjacency (not the PageRank row-stochastic scaling): after k rounds
x_k(v) = β·Σ_{j≤k} α^j · #paths(length j → v), the k-truncated Katz
series. It converges for α < 1/λmax; a FIXED iteration count keeps the
result well-defined for any α and lets the DuckDB oracle unroll the same
recurrence exactly (the repo's standard oracle pattern for iterative
algorithms).

Physical shape: identical to one PageRank power step minus the dangling
redistribution — one engine SpMV round (scale=α) plus a scalar shift per
iteration; no extra shuffles, no driver-side vectors.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def katz(
    engine: VertexEngine,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 12,
) -> dict:
    """Engine must be loaded with UNWEIGHTED directed edges. Leaves the
    scores in vector "x"."""
    engine.set_vector_uniform("x", beta)
    for _ in range(iters):
        refs = engine.slice_refs("x")
        engine.spmv(refs, "y", scale=alpha)  # y = α·Aᵀx
        ray.get([w.vec_shift.remote("y", beta) for w in engine.workers])
        ray.get([w.vec_copy.remote("y", "x") for w in engine.workers])
    return {"algorithm": "katz", "iterations": iters, "alpha": alpha,
            "beta": beta}


def numpy_katz_oracle(
    src: np.ndarray, dst: np.ndarray, n: int,
    alpha: float = 0.05, beta: float = 1.0, iters: int = 12,
) -> np.ndarray:
    x = np.full(n, beta, dtype=np.float64)
    for _ in range(iters):
        y = np.zeros(n, dtype=np.float64)
        if len(src):
            np.add.at(y, dst, x[src])
        x = beta + alpha * y
    return x
