"""Strongly connected components via forward-backward coloring.

Orzan's coloring algorithm (S. Orzan, "On distributed verification and
verified distribution", PhD thesis, VU Amsterdam 2004; also Hong et al.,
"On fast parallel detection of strongly connected components", PPoPP
2013 — the standard BSP SCC family): repeat over the unassigned residual
subgraph

  1. color(v) := v; propagate MAX color along edge direction to fixpoint
     — color(v) becomes the max-id residual ancestor of v.
  2. every root c (color(c) = c) starts a backward sweep along REVERSED
     edges restricted to color-c vertices; a reached v satisfies v →* c
     and c →* v, i.e. v ∈ SCC(c). All roots sweep in the same rounds.
  3. assign scc := color for reached vertices; they leave the residual
     subgraph. Every phase retires at least one whole SCC per root.

Engine-only algorithm (the reference has no component analytics —
SURVEY.md §2.9 family): both directions are loaded as grouped-by-dst CSR
(forward = the edge list, backward = the reversed edge list) in two
worker pools sharing the SAME deterministic vertex bounds (vb = V·i/P),
so per-partition vector slices ferry between pools as plain object refs.
Forward rounds reuse the max mirror of cc_partials; backward rounds
reuse lp_partials' (local·mult + value) keying with mult = V+2 (value 0
= "not yet reaching its root", value c+1 = "reaches root c"), so the
combiner-before-shuffle skew pattern applies unchanged. Exact integer
arithmetic; validated against networkx.strongly_connected_components in
tests and a recursive-CTE reachability SQL oracle in the driver harness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.engine.vertex_engine import VertexEngine


def reverse_edges(edges: rd.Dataset) -> rd.Dataset:
    """(src, dst) → (src=dst, dst=src), streaming."""

    def rev(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"src": t["dst"], "dst": t["src"]})

    return edges.select_columns(["src", "dst"]).map_batches(
        rev, batch_format="pyarrow", batch_size=262144
    )


def _round(eng_part, eng_red, partial_kind: str, reduce_kind: str, mult: int = 0):
    """One BSP round: partials on eng_part's CSR over a vector gathered
    from eng_red's workers (their vertex bounds are identical), reduce on
    eng_red. Returns total changed."""
    P = eng_red.P
    if partial_kind == "fwd":
        refs = [w.get_islice.remote("color") for w in eng_red.workers]
        gargs = eng_part._gather_args(refs, eng_part.u_spans)
        partial_mat = [
            w.max_partials.options(num_returns=P).remote(r, base)
            for w, (r, base) in zip(eng_part.workers, gargs)
        ]
    else:  # backward: lp-keyed (local·mult + enc) over the reversed CSR
        refs = [w.scc_bwd_encode.remote() for w in eng_red.workers]
        gargs = eng_part._gather_args(refs, eng_part.u_spans)
        partial_mat = [
            w.lp_partials.options(num_returns=P).remote(r, base, mult)
            for w, (r, base) in zip(eng_part.workers, gargs)
        ]
    if P == 1:
        partial_mat = [[m] for m in partial_mat]
    if reduce_kind == "fwd":
        red = [
            eng_red.workers[q].scc_fwd_reduce.options(num_returns=2).remote(
                [partial_mat[p][q] for p in range(P)]
            )
            for q in range(P)
        ]
    else:
        red = [
            eng_red.workers[q].scc_bwd_reduce.options(num_returns=2).remote(
                [partial_mat[p][q] for p in range(P)], mult
            )
            for q in range(P)
        ]
    return int(np.sum(ray.get([r[0] for r in red])))


def strongly_connected_components(
    edges: rd.Dataset,
    n_vertices: int,
    num_partitions: int = 0,
    max_phases: int = 10_000,
    keep_engine: bool = False,
) -> tuple[np.ndarray, dict] | tuple[VertexEngine, dict]:
    """Exact SCC labels (label = the phase root's id, a member of the
    component; canonicalize to min-member with canonical_labels). Returns
    (per-vertex labels, info) — or, with keep_engine=True, (forward
    engine, info) with labels left in ivec 'scc' so callers can write the
    result partitioned without an O(V) driver array (caller shuts the
    engine down)."""
    eng_f = VertexEngine(n_vertices, num_partitions)
    eng_b = VertexEngine(n_vertices, eng_f.P)
    eng_f.load_undirected(edges.select_columns(["src", "dst"]))
    eng_b.load_undirected(reverse_edges(edges))
    assert eng_f.vb == eng_b.vb
    mult = n_vertices + 2  # enc values span 0..V, local ids span 0..size-1
    ray.get([w.scc_init.remote() for w in eng_f.workers])
    phases = fwd_rounds = bwd_rounds = 0
    assigned = 0
    for phases in range(1, max_phases + 1):
        active = int(
            np.sum(ray.get([w.scc_phase_reset.remote() for w in eng_f.workers]))
        )
        if active == 0:
            phases -= 1
            break
        while _round(eng_f, eng_f, "fwd", "fwd"):
            fwd_rounds += 1
        fwd_rounds += 1  # the fixpoint-confirming round
        ray.get([w.scc_root_reset.remote() for w in eng_f.workers])
        while _round(eng_b, eng_f, "bwd", "bwd", mult):
            bwd_rounds += 1
        bwd_rounds += 1
        assigned += int(
            np.sum(ray.get([w.scc_assign.remote() for w in eng_f.workers]))
        )
    assert assigned == n_vertices
    info = {
        "algorithm": "scc",
        "phases": phases,
        "fwd_rounds": fwd_rounds,
        "bwd_rounds": bwd_rounds,
    }
    eng_b.shutdown()
    if keep_engine:
        return eng_f, info
    labels = eng_f.to_array("scc", integer=True)
    eng_f.shutdown()
    return labels, info


def canonical_labels(labels: np.ndarray) -> np.ndarray:
    """Root-id labels → min-member-id labels (the SQL-oracle convention).
    O(V) vectorized relabel on the answer-sized array."""
    order = np.argsort(labels, kind="stable")
    s = labels[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(s)) + 1])
    ids_sorted = np.arange(len(labels), dtype=np.int64)[order]
    min_member = np.minimum.reduceat(ids_sorted, starts)
    out = np.empty(len(labels), np.int64)
    out[order] = np.repeat(min_member, np.diff(np.concatenate([starts, [len(s)]])))
    return out
