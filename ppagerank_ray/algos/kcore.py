"""k-core decomposition via synchronous h-index iteration.

core(v) is the largest k such that v belongs to a subgraph where every
vertex has degree ≥ k. Computed as the fixpoint of

    core⁰(v) = undirected degree(v)
    coreᵗ(v) = H({coreᵗ⁻¹(u) : u ~ v})

where H is the h-index of the neighbor multiset (max h such that ≥ h
neighbors have value ≥ h). The iteration is monotonically non-increasing
and converges to the core numbers in finitely many rounds (Lü, Zhou,
Zhang & Stanley, "The H-index of a network node and its relation to
degree and coreness", Nature Communications 7:10168, 2016) — unlike
serial peeling, every round is a bulk-synchronous neighborhood
aggregate, which is exactly the engine's partial-shuffle shape.

Engine-only algorithm (no reference implementation — the SURVEY §2.9
family next to connected components / label propagation): partials are
(dst, value) histograms — summable across workers, so the combiner-
before-shuffle pattern the north rule requires for skew applies
unchanged (reuses lp_partials' keying). Exact integer arithmetic;
validated against networkx.core_number in tests and an unrolled SQL
oracle in the driver harness.

Requires engine.load_undirected(...) first (distinct undirected
neighbor sets, self-loops dropped — matching networkx's core_number
domain).
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def kcore_decomposition(engine: VertexEngine, max_rounds: int = 10_000) -> dict:
    """Exact fixpoint; leaves per-vertex core numbers in ivec 'core'
    (engine.to_array('core', integer=True) collects them)."""
    # init: core = undirected degree (one summable-count partial round)
    partial_mat = [
        w.kcore_deg_partials.options(num_returns=engine.P).remote()
        for w in engine.workers
    ]
    if engine.P == 1:
        partial_mat = [[m] for m in partial_mat]
    ray.get(
        [
            engine.workers[q].kcore_init_reduce.remote(
                [partial_mat[p][q] for p in range(engine.P)]
            )
            for q in range(engine.P)
        ]
    )
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        core_refs = [w.get_islice.remote("core") for w in engine.workers]
        gargs = engine._gather_args(core_refs, engine.u_spans)
        # histogram partials reuse lp_partials' (dst·V + value, count) keying
        partial_mat = [
            w.lp_partials.options(num_returns=engine.P).remote(
                refs, base, engine.V
            )
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            partial_mat = [[m] for m in partial_mat]
        red = [
            engine.workers[q].kcore_reduce.options(num_returns=2).remote(
                [partial_mat[p][q] for p in range(engine.P)], engine.V
            )
            for q in range(engine.P)
        ]
        changed = int(np.sum(ray.get([r[0] for r in red])))
        if changed == 0:
            break
    return {"algorithm": "kcore", "rounds": rounds}
