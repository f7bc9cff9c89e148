"""Community detection via modularity-gain label propagation — the
synchronous, deterministic phase-1 of Louvain (Blondel, Guillaume,
Lambiotte & Lefebvre, J. Stat. Mech. 2008; the bulk-synchronous variant
follows distributed Louvain practice, e.g. Ghosh et al., IPDPS 2018).

Every round, each vertex in the ACTIVE half (a deterministic splitmix64
parity stagger alternating per round — the standard oscillation guard
for synchronous moves) adopts the community c among its neighbor
communities (or stays) maximizing the EXACT integer score

    2·(2m)·e_{v,c} − 2·deg(v)·(vol(c) − deg(v)·[c == comm(v)])

which orders candidates identically to the modularity gain
ΔQ = e_{v,c}/m − deg(v)·vol(c∖v)/(2m²) — cross-multiplied into int64 so
there are no float comparisons anywhere; ties break to the smallest
community id. Communities are labeled by vertex ids (< V), so the
e_{v,c} histograms reuse lp_partials' packed keys unchanged, and the
result is deterministic under any partitioning — replayed row-for-row
by the driver harness's unrolled DuckDB oracle.

Fixed round count (oracle-comparable), one histogram exchange + one
(community, volume) aggregate per round. Community volumes are merged
on the driver and re-broadcast each round — an O(#communities) driver
structure, gated at BROADCAST_MAX_VERTICES like the host-code
dictionary (beyond the gate the volume table must become a vertex-
aligned engine vector; raise rather than silently eat driver memory).

Engine-only algorithm (SURVEY §2.9 family). Conformance: exact
sequential-replay reference + P-invariance + modularity-improvement
tests vs networkx in tests/test_louvain.py.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine

BROADCAST_MAX_COMMUNITIES = 50_000_000

LOUVAIN_SEED = 19


def louvain_communities(
    engine: VertexEngine, rounds: int = 8, seed: int = LOUVAIN_SEED
) -> dict:
    """Fixed-round sync modularity-gain LP; leaves community labels in
    ivec 'lv_comm'. Requires engine.load_undirected(...)."""
    # degrees via the kcore init round (leaves them in ivec 'core')
    pm = [
        w.kcore_deg_partials.options(num_returns=engine.P).remote()
        for w in engine.workers
    ]
    if engine.P == 1:
        pm = [[m] for m in pm]
    ray.get(
        [
            engine.workers[q].kcore_init_reduce.remote(
                [pm[p][q] for p in range(engine.P)]
            )
            for q in range(engine.P)
        ]
    )
    ray.get([w.louvain_init.remote("core") for w in engine.workers])
    vol0 = ray.get([w.louvain_vol_partials.remote() for w in engine.workers])
    twom = int(sum(int(v.sum()) for _, v in vol0))
    moved_total = 0
    for rnd in range(rounds):
        # (community, volume) table: driver merge + broadcast
        parts = ray.get(
            [w.louvain_vol_partials.remote() for w in engine.workers]
        )
        cs = np.concatenate([c for c, _ in parts])
        vs = np.concatenate([v for _, v in parts])
        order = np.argsort(cs, kind="stable")
        cs, vs = cs[order], vs[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1])
        cs = cs[starts]
        vs = np.add.reduceat(vs, starts)
        if len(cs) > BROADCAST_MAX_COMMUNITIES:
            raise ValueError(
                f"{len(cs)} communities exceed BROADCAST_MAX_COMMUNITIES; "
                "the volume table needs the vertex-aligned engine path"
            )
        vol_ref = ray.put((cs, vs))
        comm_refs = [w.get_islice.remote("lv_comm") for w in engine.workers]
        gargs = engine._gather_args(comm_refs, engine.u_spans)
        pm = [
            w.lp_partials.options(num_returns=engine.P).remote(
                refs, base, engine.V
            )
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            pm = [[m] for m in pm]
        moved_total += int(
            np.sum(
                ray.get(
                    [
                        engine.workers[q].louvain_reduce.remote(
                            [pm[p][q] for p in range(engine.P)],
                            vol_ref,
                            rnd,
                            twom,
                            seed,
                        )
                        for q in range(engine.P)
                    ]
                )
            )
        )
    return {
        "algorithm": "louvain_lp",
        "rounds": rounds,
        "moved_total": moved_total,
        "two_m": twom,
    }
