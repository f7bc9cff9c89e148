"""HITS (hubs & authorities) over the vertex engine — engine-only breadth
beyond the reference's PageRank-family solvers (like components/triangles),
demonstrating the substrate's generality: the same partitioned SpMV drives
the alternating a = Aᵀh / h = A·a updates.

Physical shape: TWO engines over the SAME vbounds — one loaded with the
forward (src, dst) edges (its SpMV computes y[dst] = Σ x[src], i.e. Aᵀx),
one with the reversed edges (its SpMV computes A·x). Because the vertex
partitioning is identical, each engine gathers the other's published slice
refs directly — no driver-side vector ever materializes. Edges are loaded
UNWEIGHTED (HITS uses the 0/1 adjacency, not the PageRank row-stochastic
scaling). Per iteration: 2 SpMV rounds + 2 L2 normalizations (scalar
reductions), matching Kleinberg's normalized power iteration.
"""

from __future__ import annotations

import numpy as np
import ray
import ray.data as rd

from ppagerank_ray.engine.vertex_engine import VertexEngine


def _reverse_edges(edges: rd.Dataset) -> rd.Dataset:
    import pyarrow as pa

    def swap(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"src": t["dst"], "dst": t["src"]})

    return edges.select_columns(["src", "dst"]).map_batches(
        swap, batch_format="pyarrow", batch_size=262144
    )


def build_hits_engines(
    edges: rd.Dataset, n_vertices: int, num_partitions: int = 0,
    n_threads: int = 1,
) -> tuple[VertexEngine, VertexEngine]:
    """(forward, reverse) engines with IDENTICAL vbounds; unweighted."""
    fwd = VertexEngine(n_vertices, num_partitions, n_threads=n_threads)
    rev = VertexEngine(n_vertices, fwd.P, n_threads=n_threads)
    unweighted = edges.select_columns(["src", "dst"]).materialize()
    fwd.load_directed(unweighted)
    rev.load_directed(_reverse_edges(unweighted))
    return fwd, rev


def _l2_normalize(engine: VertexEngine, name: str) -> float:
    n2 = float(
        np.sum(ray.get([w.vec_norm2sq.remote(name) for w in engine.workers]))
    )
    nrm = float(np.sqrt(n2))
    if nrm > 0:
        ray.get([w.vec_scale.remote(name, 1.0 / nrm) for w in engine.workers])
    return nrm


def hits(
    fwd: VertexEngine,
    rev: VertexEngine,
    tol: float = 1e-8,
    maxiter: int = 100,
) -> dict:
    """Alternating normalized updates until the authority vector's L1
    change < tol (or maxiter). Leaves `a` in fwd.vecs and `h` in rev.vecs;
    read with fwd.to_array("a") / rev.to_array("h")."""
    assert fwd.V == rev.V and fwd.P == rev.P, "engines must share partitioning"
    rev.set_vector_uniform("h", 1.0)
    _l2_normalize(rev, "h")
    fwd.set_vector_uniform("a", 0.0)
    delta = float("inf")
    track = tol > 0.0  # fixed-iteration runs skip the dead delta rounds
    it = 0
    for it in range(1, maxiter + 1):
        if track:
            ray.get([w.vec_copy.remote("a", "a_prev") for w in fwd.workers])
        # a = normalize2(Aᵀ h): forward engine consumes the reverse
        # engine's h slices (same vbounds ⇒ refs line up)
        fwd.spmv(rev.slice_refs("h"), out="a")
        _l2_normalize(fwd, "a")
        # h = normalize2(A a)
        rev.spmv(fwd.slice_refs("a"), out="h")
        _l2_normalize(rev, "h")
        if track:
            delta = float(
                np.sum(
                    ray.get(
                        [w.vec_diff_norm1.remote("a", "a_prev") for w in fwd.workers]
                    )
                )
            )
            if delta < tol:
                break
    return {"algorithm": "hits", "iteration": it, "delta_l1": delta,
            "converged": delta < tol}


def numpy_hits_oracle(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """Transliterated fixed-iteration oracle (same update order)."""
    h = np.ones(n) / np.sqrt(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.bincount(dst, weights=h[src], minlength=n)
        na = np.linalg.norm(a)
        if na > 0:
            a /= na
        h = np.bincount(src, weights=a[dst], minlength=n)
        nh = np.linalg.norm(h)
        if nh > 0:
            h /= nh
    return a, h


def eigenvector_centrality(engine: VertexEngine, iters: int = 25) -> np.ndarray:
    """Right-eigenvector centrality of A^T (the authority half of HITS
    without the hub alternation): x_t = normalize2(A^T x_{t-1}), x_0
    uniform. `engine` must hold the UNWEIGHTED adjacency
    (load_directed over (src, dst) only) — the engine SpMV
    y[dst] += x[src] IS the A^T multiply. Fixed `iters` for the SQL
    oracle unroll."""
    W = engine.workers
    ray.get([
        w.vec_set_scalar.remote("ev", 1.0 / float(np.sqrt(engine.V)))
        for w in W
    ])
    for _ in range(iters):
        engine.spmv(engine.slice_refs("ev"), out="ev_y")
        ray.get([w.vec_copy.remote("ev_y", "ev") for w in W])
        _l2_normalize(engine, "ev")
    return engine.to_array("ev")
