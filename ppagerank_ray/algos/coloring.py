"""Greedy graph coloring via Jones-Plassmann rounds.

Static unique priorities (the MIS hash permutation with its own seed)
order the vertices; each round, every uncolored vertex that beats the
minimum priority among its UNCOLORED neighbors — an independent set by
the strict unique comparison — colors itself with the mex (smallest
non-negative integer absent) of its already-colored neighbors' colors.
The result equals the sequential greedy coloring in priority order, so
it is deterministic, partition-invariant, and uses at most Δ+1 colors;
expected round count is O(log n / log log n) for random priorities
(Jones & Plassmann, SIAM J. Sci. Comput. 14(3), 1993).

Engine-only algorithm (SURVEY §2.9 family). Selection reuses the
cc_partials min-over-neighbors combiner; neighbor color sets travel as
lp_partials (dst·(V+1)+color, count) histograms — only distinct
(vertex, color) keys shuffle, the combiner-before-shuffle shape the
north rule requires. Validated by properness/bound/P-invariance tests
and an unrolled DuckDB oracle replaying the identical priority hash,
selection rule, and mex.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def greedy_coloring(
    engine: VertexEngine, seed: int = 17, max_rounds: int = 10_000
) -> dict:
    """Exact fixpoint; leaves per-vertex colors (0-based, -1 never
    survives) in ivec 'color'."""
    ray.get([w.color_init.remote(seed) for w in engine.workers])
    modulus = engine.V + 1
    rounds, n_colors = 0, 0
    for rounds in range(1, max_rounds + 1):
        # phase 1: select the uncolored local priority minima
        ray.get([w.color_labels.remote(1) for w in engine.workers])
        lab_refs = [w.get_islice.remote("mislab") for w in engine.workers]
        gargs = engine._gather_args(lab_refs, engine.u_spans)
        pm = [
            w.cc_partials.options(num_returns=engine.P).remote(refs, base)
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            pm = [[m] for m in pm]
        ray.get(
            [
                engine.workers[q].color_select_reduce.remote(
                    [pm[p][q] for p in range(engine.P)]
                )
                for q in range(engine.P)
            ]
        )
        # phase 2: selected take the mex of colored-neighbor colors
        ray.get([w.color_labels.remote(2, engine.V) for w in engine.workers])
        lab_refs = [w.get_islice.remote("mislab") for w in engine.workers]
        gargs = engine._gather_args(lab_refs, engine.u_spans)
        pm = [
            w.lp_partials.options(num_returns=engine.P).remote(
                refs, base, modulus
            )
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            pm = [[m] for m in pm]
        res = ray.get(
            [
                engine.workers[q].color_assign_reduce.remote(
                    [pm[p][q] for p in range(engine.P)], modulus
                )
                for q in range(engine.P)
            ]
        )
        if sum(r[1] for r in res) == 0:
            break
    n_colors = (
        int(
            max(
                ray.get(
                    [w.ivec_max_lt.remote("color", engine.V) for w in engine.workers]
                )
            )
        )
        + 1
    )
    return {"algorithm": "coloring", "rounds": rounds, "n_colors": n_colors}
