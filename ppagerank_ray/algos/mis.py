"""Maximal independent set via deterministic parallel greedy (Luby-style).

Each vertex gets a static, globally-unique priority — the int64 view of
splitmix64(id·K + seed), a bijection of the id space, so there are no
ties by construction. Rounds are bulk-synchronous:

    phase 1 (join):   an ACTIVE vertex whose priority is smaller than
                      every active undirected neighbor's joins the MIS
                      (an active vertex with no active neighbor joins);
    phase 2 (remove): active vertices adjacent to any MIS member are
                      removed.

With static priorities the fixpoint is unique — it equals the greedy
sequential MIS taken in priority order (the "lexicographically first"
MIS of the hash permutation) — and the round count is O(log n) with
high probability (Blelloch, Fineman & Shun, "Greedy sequential maximal
independent set and matching are parallel on average", SPAA 2012; Luby,
SICOMP 1986). Engine-only algorithm (no reference implementation — the
SURVEY §2.9 family next to connected components / label propagation).

Both phases reuse the engine's min-over-incoming-neighbors partials
(cc_partials): workers advertise priority (phase 1) or a 0 MIS flag
(phase 2) and emit sparse per-destination-partition (dst, min) partials
— the combiner-before-shuffle shape the north rule requires, so hub
vertices never concentrate rows. Requires engine.load_undirected(...).
Validated by independence/maximality/determinism property tests and an
unrolled DuckDB oracle replaying the identical priority hash and round
rule in the driver harness.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def _min_pass(engine: VertexEngine, phase: int) -> list:
    """One min-over-neighbors exchange of the phase's advertised labels;
    returns the per-destination partial matrix (P lists of P refs)."""
    ray.get([w.mis_labels.remote(phase) for w in engine.workers])
    lab_refs = [w.get_islice.remote("mislab") for w in engine.workers]
    gargs = engine._gather_args(lab_refs, engine.u_spans)
    pm = [
        w.cc_partials.options(num_returns=engine.P).remote(refs, base)
        for w, (refs, base) in zip(engine.workers, gargs)
    ]
    if engine.P == 1:
        pm = [[m] for m in pm]
    return pm


def maximal_independent_set(
    engine: VertexEngine, seed: int = 7, max_rounds: int = 10_000
) -> dict:
    """Exact fixpoint; leaves per-vertex status in ivec 'mis_status'
    (0 never remains: 1 = in MIS, 2 = dominated by a MIS neighbor).
    engine.to_array('mis_status', integer=True) collects it."""
    ray.get([w.mis_init.remote(seed) for w in engine.workers])
    rounds, n_mis = 0, 0
    for rounds in range(1, max_rounds + 1):
        pm = _min_pass(engine, phase=1)
        n_mis += int(
            np.sum(
                ray.get(
                    [
                        engine.workers[q].mis_join_reduce.remote(
                            [pm[p][q] for p in range(engine.P)]
                        )
                        for q in range(engine.P)
                    ]
                )
            )
        )
        pm = _min_pass(engine, phase=2)
        res = ray.get(
            [
                engine.workers[q].mis_remove_reduce.remote(
                    [pm[p][q] for p in range(engine.P)]
                )
                for q in range(engine.P)
            ]
        )
        if sum(r[1] for r in res) == 0:
            break
    return {"algorithm": "mis", "rounds": rounds, "n_mis": n_mis}
