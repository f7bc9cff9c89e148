"""Maximal matching via deterministic local-max handshake.

Each vertex gets a static unique 62-bit key — pseudo-random high bits
(top 22 bits of splitmix64(id·K + seed)) over the id in the low 40 bits
— so key comparisons are a fixed pseudo-random total order with the arg
recoverable from the min (the engine's min-over-neighbors combiner
doubles as an argmin). A round is two bulk-synchronous min-exchanges:

    A) m1(v) = min key over UNMATCHED neighbors; candidate
       c(v) = id bits of m1(v);
    B) every unmatched u proposes along its single edge u → c(u);
       the receiver v pairs with c(v) iff its min proposer key equals
       m1(v) — proposer keys are a subset of unmatched-neighbor keys,
       so min-equality ⟺ the overall argmin itself proposed back.

Pairing is mutual by construction (if m2(v)=m1(v) picks u=c(v), then
c(u)=v and m2(u)=key(v)=m1(u) symmetrically), each round matches at
least the pair containing the globally-minimum eligible key, and the
expected round count is O(log n) (local-max / mirror matching — Preis,
STACS 1999; Birn et al., Euro-Par 2013). Terminates when no unmatched
vertex has an unmatched neighbor, i.e. the matching is maximal.

Engine-only algorithm (SURVEY §2.9 family). Exchange A reuses
cc_partials verbatim; exchange B is the same sparse per-destination
(dst, min) emission with a per-edge candidate mask
(match_proposal_partials) — both are the combiner-before-shuffle shape
the north rule requires. Validated by matching-property tests
(symmetry, edge-validity, maximality, P-invariance) and an unrolled
DuckDB oracle replaying the identical key packing and handshake rule.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def maximal_matching(
    engine: VertexEngine, seed: int = 13, max_rounds: int = 10_000
) -> dict:
    """Exact fixpoint; leaves per-vertex partner ids in ivec 'partner'
    (-1 = unmatched; otherwise the mutual partner's vertex id)."""
    ray.get([w.match_init.remote(seed) for w in engine.workers])
    rounds, n_matched = 0, 0
    for rounds in range(1, max_rounds + 1):
        # exchange A: candidates from the unmatched-neighbor min
        ray.get([w.match_labels.remote() for w in engine.workers])
        mlab_refs = [w.get_islice.remote("mlab") for w in engine.workers]
        gargs = engine._gather_args(mlab_refs, engine.u_spans)
        pm = [
            w.cc_partials.options(num_returns=engine.P).remote(refs, base)
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            pm = [[m] for m in pm]
        eligible = int(
            np.sum(
                ray.get(
                    [
                        engine.workers[q].match_cand_reduce.remote(
                            [pm[p][q] for p in range(engine.P)]
                        )
                        for q in range(engine.P)
                    ]
                )
            )
        )
        if eligible == 0:
            break
        # exchange B: proposals along candidate edges, mutual-min accept
        cand_refs = [w.get_islice.remote("cand") for w in engine.workers]
        cargs = engine._gather_args(cand_refs, engine.u_spans)
        pm = [
            w.match_proposal_partials.options(num_returns=engine.P).remote(
                mrefs, crefs, base
            )
            for w, (mrefs, base), (crefs, _) in zip(
                engine.workers, gargs, cargs
            )
        ]
        if engine.P == 1:
            pm = [[m] for m in pm]
        n_matched += int(
            np.sum(
                ray.get(
                    [
                        engine.workers[q].match_accept_reduce.remote(
                            [pm[p][q] for p in range(engine.P)]
                        )
                        for q in range(engine.P)
                    ]
                )
            )
        )
    return {"algorithm": "matching", "rounds": rounds, "n_matched": n_matched}
