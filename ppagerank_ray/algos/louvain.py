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
(community, volume) aggregate per round. Two equivalent volume paths:

* broadcast (small-graph fast path, ≤ BROADCAST_MAX_COMMUNITIES):
  volumes merged on the driver and re-broadcast each round — one
  object, O(#communities) driver memory;
* engine (`volumes="engine"`, auto above the gate): volumes live as a
  vertex-aligned ivec 'lv_vol' on the OWNER of each community id
  (communities are vertex ids). Per round: sharded (comm, Σdeg)
  scatter-reduce to owners, then a request/response gather of just the
  DISTINCT candidate communities each worker actually scores. Driver
  state is O(P) refs; nothing community-sized leaves the workers.

Both paths score identical integer gains, so moves are bit-identical
(equivalence-tested in tests/test_louvain.py).

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
    engine: VertexEngine,
    rounds: int = 8,
    seed: int = LOUVAIN_SEED,
    volumes: str = "auto",
) -> dict:
    """Fixed-round sync modularity-gain LP; leaves community labels in
    ivec 'lv_comm'. Requires engine.load_undirected(...).

    volumes: "broadcast" | "engine" | "auto" (engine path above
    BROADCAST_MAX_COMMUNITIES — #communities ≤ V, so gating on V is
    sufficient)."""
    if volumes not in ("auto", "broadcast", "engine"):
        raise ValueError(f"unknown volumes mode {volumes!r}")
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
    use_engine = volumes == "engine" or (
        volumes == "auto" and engine.V > BROADCAST_MAX_COMMUNITIES
    )
    twom = int(
        sum(ray.get([w.louvain_deg_total.remote() for w in engine.workers]))
    )
    P = engine.P
    W = engine.workers
    moved_total = 0
    for rnd in range(rounds):
        if use_engine:
            # (1) owners rebuild their lv_vol slice (sharded scatter-reduce)
            vparts = [
                w.louvain_vol_sharded.options(num_returns=P).remote() for w in W
            ]
            if P == 1:
                vparts = [[m] for m in vparts]
            ray.get(
                [
                    W[q].louvain_vol_reduce.remote([vparts[p][q] for p in range(P)])
                    for q in range(P)
                ]
            )
        else:
            # (community, volume) table: driver merge + broadcast
            parts = ray.get([w.louvain_vol_partials.remote() for w in W])
            cs = np.concatenate([c for c, _ in parts])
            vs = np.concatenate([v for _, v in parts])
            order = np.argsort(cs, kind="stable")
            cs, vs = cs[order], vs[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1])
            cs = cs[starts]
            vs = np.add.reduceat(vs, starts)
            vol_ref = ray.put((cs, vs))
        comm_refs = [w.get_islice.remote("lv_comm") for w in W]
        gargs = engine._gather_args(comm_refs, engine.u_spans)
        pm = [
            w.lp_partials.options(num_returns=P).remote(refs, base, engine.V)
            for w, (refs, base) in zip(W, gargs)
        ]
        if P == 1:
            pm = [[m] for m in pm]
        if use_engine:
            # (2) candidate merge + per-owner distinct-community requests
            reqs = [
                W[q].louvain_candidates.options(num_returns=P).remote(
                    [pm[p][q] for p in range(P)]
                )
                for q in range(P)
            ]
            if P == 1:
                reqs = [[r] for r in reqs]
            # (3) owners answer volumes for the requested ids
            resp = [
                W[o].louvain_vol_lookup.options(num_returns=P).remote(
                    [reqs[q][o] for q in range(P)]
                )
                for o in range(P)
            ]
            if P == 1:
                resp = [[r] for r in resp]
            # (4) apply the staggered moves
            moved_total += int(
                np.sum(
                    ray.get(
                        [
                            W[q].louvain_move_gathered.remote(
                                [resp[o][q] for o in range(P)], rnd, twom, seed
                            )
                            for q in range(P)
                        ]
                    )
                )
            )
        else:
            moved_total += int(
                np.sum(
                    ray.get(
                        [
                            W[q].louvain_reduce.remote(
                                [pm[p][q] for p in range(P)],
                                vol_ref,
                                rnd,
                                twom,
                                seed,
                            )
                            for q in range(P)
                        ]
                    )
                )
            )
    return {
        "algorithm": "louvain_lp",
        "rounds": rounds,
        "moved_total": moved_total,
        "two_m": twom,
        "volumes": "engine" if use_engine else "broadcast",
    }
