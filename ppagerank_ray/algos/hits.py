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


def build_salsa_engines(
    edges: rd.Dataset, n_vertices: int, num_partitions: int = 0,
    n_threads: int = 1,
) -> tuple[VertexEngine, VertexEngine]:
    """(forward, reverse) engines for SALSA, IDENTICAL vbounds, each
    loaded ROW-STOCHASTIC in its own orientation: fwd holds
    (src, dst, 1/outdeg(src)) — its SpMV is the hub→authority half-step —
    and rev holds the reversed edges (dst, src, 1/indeg(dst)) — the
    authority→hub half-step (row sums of the reversed graph ARE in-degrees
    of the original)."""
    from ppagerank_ray.graph.build import attach_weights

    fwd = VertexEngine(n_vertices, num_partitions, n_threads=n_threads)
    rev = VertexEngine(n_vertices, fwd.P, n_threads=n_threads)
    base = edges.select_columns(["src", "dst"]).materialize()
    fwd.load_directed(attach_weights(base, n_vertices))
    rev.load_directed(attach_weights(_reverse_edges(base), n_vertices))
    return fwd, rev


def salsa(fwd: VertexEngine, rev: VertexEngine, iters: int = 12) -> dict:
    """SALSA (Lempel & Moran 2000, public definition): the authority
    random walk takes one step BACK along an in-link chosen uniformly
    (1/indeg) then one step FORWARD along an out-link chosen uniformly
    (1/outdeg); hubs are the intermediate state. Both half-steps are
    mass-preserving row-stochastic SpMVs, so no per-iteration
    normalization is needed (Σa stays 1 up to float error) and a fixed
    `iters` unrolls exactly in SQL. a0 is uniform over authorities
    (vertices with indeg > 0), detected distributedly: the forward
    row-stochastic SpMV of the ones vector lands mass exactly on indeg>0
    vertices. Leaves `a` in fwd.vecs, `h` in rev.vecs."""
    assert fwd.V == rev.V and fwd.P == rev.P, "engines must share partitioning"
    fwd.set_vector_uniform("ones", 1.0)
    fwd.spmv(fwd.slice_refs("ones"), out="s")
    n_a = float(
        np.sum(
            ray.get([w.vec_indicator_pos.remote("a", "s") for w in fwd.workers])
        )
    )
    if n_a > 0:
        ray.get([w.vec_scale.remote("a", 1.0 / n_a) for w in fwd.workers])
    rev.set_vector_uniform("h", 0.0)
    for _ in range(iters):
        # h(u) = Σ_{(u,v)∈E} a(v)/indeg(v): reverse engine consumes the
        # forward engine's a slices (same vbounds ⇒ refs line up)
        rev.spmv(fwd.slice_refs("a"), out="h")
        # a(w) = Σ_{(u,w)∈E} h(u)/outdeg(u)
        fwd.spmv(rev.slice_refs("h"), out="a")
    return {
        "algorithm": "salsa",
        "iteration": iters,
        "n_authorities": int(n_a),
    }


def numpy_salsa_oracle(
    src: np.ndarray, dst: np.ndarray, n: int, iters: int
) -> tuple[np.ndarray, np.ndarray]:
    """Transliterated fixed-iteration oracle (same update order)."""
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    indeg = np.bincount(dst, minlength=n).astype(np.float64)
    wf = np.where(outdeg > 0, 1.0 / np.where(outdeg == 0, 1.0, outdeg), 0.0)
    wr = np.where(indeg > 0, 1.0 / np.where(indeg == 0, 1.0, indeg), 0.0)
    a = (indeg > 0).astype(np.float64)
    if a.sum() > 0:
        a /= a.sum()
    h = np.zeros(n)
    for _ in range(iters):
        h = np.bincount(src, weights=a[dst] * wr[dst], minlength=n)
        a = np.bincount(dst, weights=h[src] * wf[src], minlength=n)
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
