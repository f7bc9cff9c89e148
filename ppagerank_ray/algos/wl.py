"""Weisfeiler-Leman (1-WL / color refinement) vertex labels.

Iterates new(v) = hash(old(v), sorted multiset of neighbor colors) —
the classic graph-isomorphism refinement (Weisfeiler & Leman 1968;
Shervashidze et al., "Weisfeiler-Lehman graph kernels", JMLR 2011) used
as structural vertex features and graph fingerprints. After t rounds two
vertices share a color only if their t-hop neighborhoods are
WL-indistinguishable (up to the 2^-64 hash-collision caveat — and a
collision merges colors IDENTICALLY in the engine and the SQL oracle,
so conformance is unaffected).

Canonical hashing without a global color dictionary: the neighbor
multiset folds as an order-canonical polynomial over the SORTED
(label, count) pairs — Σ splitmix64(label·K3 + count)·COEF^(m−1−i)
mod 2^64 — so no distributed relabeling pass is needed and colors stay
int64 end-to-end. Exchange = wl_partials: per-worker pre-counted
(dst, label, count) triples (counts summable — the combiner shape),
volume O(Σ distinct neighbor labels) ≤ O(E).

Engine-only algorithm (SURVEY §2.9 family). Validated against a
networkx-based sequential refinement (partition equality per round) and
replayed bit-for-bit in the driver harness's unrolled DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def wl_refinement(engine: VertexEngine, rounds: int = 3) -> dict:
    """Fixed-round refinement; leaves colors in ivec 'wl'
    (engine.to_array('wl', integer=True))."""
    ray.get([w.wl_init.remote() for w in engine.workers])
    changed = 0
    for _ in range(rounds):
        lab_refs = [w.get_islice.remote("wl") for w in engine.workers]
        gargs = engine._gather_args(lab_refs, engine.u_spans)
        pm = [
            w.wl_partials.options(num_returns=engine.P).remote(refs, base)
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            pm = [[m] for m in pm]
        changed = int(
            np.sum(
                ray.get(
                    [
                        engine.workers[q].wl_reduce.remote(
                            [pm[p][q] for p in range(engine.P)]
                        )
                        for q in range(engine.P)
                    ]
                )
            )
        )
    return {"algorithm": "wl", "rounds": rounds, "last_round_changed": changed}
