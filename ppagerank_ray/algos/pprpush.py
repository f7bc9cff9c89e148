"""Local personalized PageRank by batch-synchronous integer push.

Andersen-Chung-Lang ("Local graph partitioning using PageRank vectors",
FOCS 2006) approximate-PPR push, re-expressed for Ray Data: instead of
the paper's sequential one-vertex-at-a-time queue, EVERY vertex whose
residual clears the threshold pushes simultaneously each round, for a
FIXED number of rounds — deterministic, order-free, and therefore
bit-replayable by the DuckDB oracle (the same unroll trick as the
betweenness sigma/delta oracle). All mass is int64 "pico-units"
(SCALE = 10^12) and every division is floor division with the remainder
kept at the pushing vertex, so total mass is conserved exactly:

    active(v)   iff  r(v) >= deg(v) * EPS
    gain  = r * ALPHA_NUM // ALPHA_DEN        → p(v) += gain
    rest  = r - gain
    stay  = rest // 2                          (lazy half)
    out   = rest - stay
    share = out // deg(v)                      → each neighbor += share
    r(v)  = rest - share * deg(v)              (stay + flooring leak)

Locality is the scale story: ACL bounds the support of p at
O(1/(eps*alpha)) vertices regardless of graph size, so the state table
stays small while the graph streams. Per round: one sparse state
groupby and one scatter of the active shares — broadcast of the sorted
active arrays against the materialized adjacency under
PUSH_BROADCAST_MAX_ACTIVE, a partitioned hash join above it. The
reference has no local-clustering mode; this extends its PageRank
family (ppagerank.cc ComputePageRank) with the standard local variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.algos.triangles import (
    BROADCAST_MAX_VERTEX_DEGREES,
    canonical_pairs,
)

SCALE = 10**12  # seed mass in pico-units
ALPHA_NUM, ALPHA_DEN = 15, 100  # teleport alpha = 0.15
EPS = 10**6  # active iff r >= deg * EPS  (r/deg >= 1e-6 of total mass)
ROUNDS = 10
PUSH_BROADCAST_MAX_ACTIVE = 50_000_000


def _both_dirs(t: pa.Table) -> pa.Table:
    a = t["a"].to_numpy()
    b = t["b"].to_numpy()
    return pa.Table.from_pydict(
        {
            "src": np.concatenate([a, b]),
            "dst": np.concatenate([b, a]),
        }
    )


def _sum_state(ds: rd.Dataset) -> rd.Dataset:
    agg = ds.groupby("id").sum(["p", "r"])
    return agg.map_batches(
        lambda t: t.rename_columns(["id", "p", "r"]), batch_format="pyarrow"
    )


def ppr_push(
    edges: rd.Dataset,
    n_vertices: int,
    rounds: int = ROUNDS,
    seed: int | list[int] | None = None,
    n_buckets: int = 64,
) -> pa.Table:
    """(src,dst) edge Dataset → (id, p_mass, r_mass) int64 pico-unit PPR
    estimate and residual after `rounds` synchronous pushes from `seed`
    (default: the max-undirected-degree vertex, ties to the smaller id;
    a LIST of seeds runs topic-sensitive PPR from the set — SCALE is
    floor-split across seeds with the remainder to the first, so the
    teleport distribution is exact integers) over the undirected simple
    graph. Invariant: sum(p) + sum(r) == SCALE exactly."""
    pairs = canonical_pairs(edges)
    from ppagerank_ray.graph.build import shuffle_blocks

    adj = (
        pairs.map_batches(_both_dirs, batch_format="pyarrow")
        .repartition(shuffle_blocks())
        .materialize()
    )

    broadcast = n_vertices <= BROADCAST_MAX_VERTEX_DEGREES
    if broadcast:
        deg = np.zeros(n_vertices, dtype=np.int64)
        for t in ray.get(pairs.to_arrow_refs()):
            if t.num_rows:
                deg += np.bincount(t["a"].to_numpy(), minlength=n_vertices)
                deg += np.bincount(t["b"].to_numpy(), minlength=n_vertices)
        deg_ref = ray.put(deg)
        deg_tbl = None
        if seed is None:
            seed = int(np.argmax(deg))  # first max == smallest id
    else:
        deg_ref = None
        deg_tbl = (
            adj.map_batches(
                lambda t: pa.Table.from_pydict({"id": t["src"].to_numpy()}),
                batch_format="pyarrow",
            )
            .repartition(shuffle_blocks())
            .groupby("id")
            .count()
            .map_batches(
                lambda t: t.rename_columns(["id", "deg"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if seed is None:
            top = deg_tbl.sort(["deg", "id"], descending=[True, False]).take(1)
            seed = int(top[0]["id"])

    seeds = np.array(
        seed if isinstance(seed, (list, tuple, np.ndarray)) else [seed],
        np.int64,
    )
    if len(np.unique(seeds)) != len(seeds):
        raise ValueError("duplicate seeds")
    share0 = SCALE // len(seeds)
    r0 = np.full(len(seeds), share0, np.int64)
    r0[0] += SCALE - share0 * len(seeds)  # remainder → first seed
    state = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "id": seeds,
                "p": np.zeros(len(seeds), np.int64),
                "r": r0,
            }
        )
    )

    def with_deg(st: rd.Dataset) -> rd.Dataset:
        if broadcast:

            def attach(t: pa.Table) -> pa.Table:
                dg = ray.get(deg_ref)
                return t.append_column(
                    "deg", pa.array(dg[t["id"].to_numpy()], pa.int64())
                )

            return st.map_batches(attach, batch_format="pyarrow")
        from ppagerank_ray.ops.joins import hash_join

        return hash_join(st, deg_tbl, "id", "id", n_buckets)

    def push_cols(t: pa.Table):
        """(id,p,r,deg) → (act, gain, rest, share) numpy columns."""
        r = t["r"].to_numpy()
        dg = t["deg"].to_numpy()
        act = r >= dg * EPS
        gain = np.where(act, r * ALPHA_NUM // ALPHA_DEN, 0)
        rest = r - gain
        out = rest - rest // 2
        share = np.where(act, out // np.maximum(dg, 1), 0)
        return act, gain, rest, share

    def self_rows(t: pa.Table) -> pa.Table:
        act, gain, rest, share = push_cols(t)
        p = t["p"].to_numpy() + gain
        dg = t["deg"].to_numpy()
        r = np.where(act, rest - share * dg, t["r"].to_numpy())
        return pa.Table.from_pydict(
            {"id": t["id"].to_numpy(), "p": p.astype(np.int64),
             "r": r.astype(np.int64)}
        )

    def share_rows(t: pa.Table) -> pa.Table:
        act, _, _, share = push_cols(t)
        keep = act & (share > 0)
        return pa.Table.from_pydict(
            {
                "id": t["id"].to_numpy()[keep],
                "share": share[keep].astype(np.int64),
            }
        )

    for _ in range(rounds):
        std = with_deg(state).materialize()
        selfs = std.map_batches(self_rows, batch_format="pyarrow")
        pushes = std.map_batches(
            share_rows, batch_format="pyarrow"
        ).materialize()
        n_active = pushes.count()
        if n_active == 0:
            state = _sum_state(selfs).materialize()
            break
        if n_active <= PUSH_BROADCAST_MAX_ACTIVE:
            pt = pa.concat_tables(
                [b for b in ray.get(pushes.to_arrow_refs()) if b.num_rows]
            )
            ids = pt["id"].to_numpy()
            order = np.argsort(ids)
            push_ref = ray.put(
                (ids[order], pt["share"].to_numpy()[order])
            )

            def scatter(t: pa.Table) -> pa.Table:
                aids, ashare = ray.get(push_ref)
                s = t["src"].to_numpy()
                idx = np.searchsorted(aids, s)
                idx = np.minimum(idx, len(aids) - 1)
                hit = aids[idx] == s
                return pa.Table.from_pydict(
                    {
                        "id": t["dst"].to_numpy()[hit],
                        "p": np.zeros(int(hit.sum()), np.int64),
                        "r": ashare[idx[hit]],
                    }
                )

            scat = adj.map_batches(
                scatter, batch_format="pyarrow", batch_size=262144
            )
        else:
            from ppagerank_ray.ops.joins import hash_join

            j = hash_join(adj, pushes, "src", "id", n_buckets)

            def to_contrib(t: pa.Table) -> pa.Table:
                return pa.Table.from_pydict(
                    {
                        "id": t["dst"].to_numpy(),
                        "p": np.zeros(t.num_rows, np.int64),
                        "r": t["share"].to_numpy(),
                    }
                )

            scat = j.map_batches(to_contrib, batch_format="pyarrow")
        state = _sum_state(selfs.union(scat)).materialize()

    out = pa.concat_tables(
        [b for b in ray.get(state.to_arrow_refs()) if b.num_rows]
    )
    keep = (out["p"].to_numpy() > 0) | (out["r"].to_numpy() > 0)
    out = out.filter(pa.array(keep))
    order = np.argsort(out["id"].to_numpy())
    return pa.Table.from_pydict(
        {
            "id": out["id"].to_numpy()[order],
            "p_mass": out["p"].to_numpy()[order],
            "r_mass": out["r"].to_numpy()[order],
        }
    )


def sweep_cut(edges: rd.Dataset, ppr: pa.Table) -> pa.Table:
    """ACL sweep over a ppr_push result: order the support by p/deg
    descending (ties to the smaller id), then for every prefix size t
    emit exact integers cut(t) = #undirected simple edges with exactly
    one endpoint in the prefix and vol(t) = Σ degree over the prefix,
    plus conductance(t) = cut / min(vol, 2|E|-vol) as float64. The
    minimum-conductance prefix is the ACL local cluster.

    Scale shape: every driver-side structure is support-bounded
    (O(1/(eps*alpha)) vertices — ppr_push's locality guarantee), never
    O(V): support degrees come from a distributed histogram keyed by
    support index, and tasks resolve ranks by searchsorted against the
    broadcast sorted support ids. The edge scan reduces each canonical
    pair to (rank_min, rank_max) and histograms them per batch, so
    cut(t) for ALL t comes from two ≤support-sized cumulative sums —
    one pass over the edges, no per-t work."""
    pairs = canonical_pairs(edges).materialize()
    total_pairs = pairs.count()

    ids = ppr["id"].to_numpy()
    p = ppr["p_mass"].to_numpy()
    support = len(ids)
    sup_sorted = np.sort(ids)
    sup_ref = ray.put(sup_sorted)

    def deg_partial(t: pa.Table) -> pa.Table:
        s = ray.get(sup_ref)
        both = np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()])
        idx = np.minimum(np.searchsorted(s, both), len(s) - 1)
        hit = s[idx] == both
        u, c = np.unique(idx[hit], return_counts=True)
        return pa.Table.from_pydict(
            {"si": u.astype(np.int64), "n": c.astype(np.int64)}
        )

    dt = (
        pairs.map_batches(deg_partial, batch_format="pyarrow", batch_size=262144)
        .groupby("si")
        .sum("n")
    )
    deg_sup = np.zeros(support, np.int64)
    for b in ray.get(dt.to_arrow_refs()):
        if b.num_rows:
            deg_sup[b["si"].to_numpy()] = b["sum(n)"].to_numpy()
    degv = deg_sup[np.searchsorted(sup_sorted, ids)]

    score = p / np.maximum(degv, 1)
    order = np.lexsort((ids, -score))
    sweep_ids = ids[order]
    sweep_deg = degv[order]
    perm = np.argsort(sweep_ids)
    rank_ref = ray.put((sweep_ids[perm], perm.astype(np.int64)))

    def _ranks(rk_pair, v):
        sid, rnk = rk_pair
        idx = np.minimum(np.searchsorted(sid, v), len(sid) - 1)
        hit = sid[idx] == v
        out = np.full(len(v), len(sid), np.int64)
        out[hit] = rnk[idx[hit]]
        return out

    def rank_hist(t: pa.Table) -> pa.Table:
        rk_pair = ray.get(rank_ref)
        ra = _ranks(rk_pair, t["a"].to_numpy())
        rb = _ranks(rk_pair, t["b"].to_numpy())
        rmin = np.minimum(ra, rb)
        rmax = np.maximum(ra, rb)
        keep = rmin < support  # at least one endpoint in the support
        out = []
        for tag, arr in (("lo", rmin[keep]), ("hi", rmax[keep])):
            u, c = np.unique(arr, return_counts=True)
            out.append(
                pa.Table.from_pydict(
                    {
                        "tag": pa.array([tag] * len(u), pa.string()),
                        "rk": u.astype(np.int64),
                        "n": c.astype(np.int64),
                    }
                )
            )
        return pa.concat_tables(out)

    hist = (
        pairs.map_batches(rank_hist, batch_format="pyarrow", batch_size=262144)
        .groupby(["tag", "rk"])
        .sum("n")
    )
    ht = pa.concat_tables(
        [b for b in ray.get(hist.to_arrow_refs()) if b.num_rows]
    )
    lo = np.zeros(support + 1, np.int64)
    hi = np.zeros(support + 1, np.int64)
    if ht.num_rows:
        tags = ht["tag"].to_numpy(zero_copy_only=False)
        rks = ht["rk"].to_numpy()
        ns = ht["sum(n)"].to_numpy().astype(np.int64)
        sel = tags == "lo"
        np.add.at(lo, np.minimum(rks[sel], support), ns[sel])
        np.add.at(hi, np.minimum(rks[~sel], support), ns[~sel])

    # cut(t) = #pairs with rmin < t  −  #pairs with rmax < t
    cum_lo = np.cumsum(lo)[:support]  # index t-1 == "< t"
    cum_hi = np.cumsum(hi)[:support]
    cut = cum_lo - cum_hi
    vol = np.cumsum(sweep_deg)
    denom = np.minimum(vol, 2 * total_pairs - vol)
    with np.errstate(divide="ignore", invalid="ignore"):
        cond = np.where(denom > 0, cut / np.maximum(denom, 1), np.inf)
    return pa.Table.from_pydict(
        {
            "t": np.arange(1, support + 1, dtype=np.int64),
            "id": sweep_ids,
            "cut_edges": cut,
            "vol": vol,
            "conductance": cond.astype(np.float64),
        }
    )


def numpy_sweep_oracle(src: np.ndarray, dst: np.ndarray, ppr: pa.Table):
    """Brute-force per-prefix recount for tests."""
    keep = src != dst
    a = np.minimum(src[keep], dst[keep]).astype(np.int64)
    b = np.maximum(src[keep], dst[keep]).astype(np.int64)
    ab = np.unique(a * (1 << 32) + b)
    a, b = ab >> 32, ab & ((1 << 32) - 1)
    n = int(max(a.max(), b.max())) + 1
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    ids = ppr["id"].to_numpy()
    p = ppr["p_mass"].to_numpy()
    order = np.lexsort((ids, -(p / np.maximum(deg[ids], 1))))
    sweep = ids[order]
    cuts, vols = [], []
    inset = np.zeros(n, bool)
    for v in sweep:
        inset[v] = True
        cuts.append(int((inset[a] != inset[b]).sum()))
        vols.append(int(deg[inset].sum()))
    return sweep, np.array(cuts, np.int64), np.array(vols, np.int64)


def numpy_ppr_push_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    rounds: int = ROUNDS,
    seed: int | None = None,
):
    """Single-machine replay of the identical synchronous schedule."""
    keep = src != dst
    a = np.minimum(src[keep], dst[keep]).astype(np.int64)
    b = np.maximum(src[keep], dst[keep]).astype(np.int64)
    ab = np.unique(a * (1 << 32) + b)
    a, b = ab >> 32, ab & ((1 << 32) - 1)
    n = int(max(a.max(), b.max())) + 1 if len(a) else 0
    deg = np.bincount(a, minlength=n) + np.bincount(b, minlength=n)
    if seed is None:
        seed = int(np.argmax(deg))
    seeds = list(seed) if isinstance(seed, (list, tuple, np.ndarray)) else [seed]
    share0 = SCALE // len(seeds)
    p = {}
    r = {int(s): share0 for s in seeds}
    r[int(seeds[0])] += SCALE - share0 * len(seeds)
    nbrs: dict[int, list[int]] = {}
    for x, y in zip(a.tolist(), b.tolist()):
        nbrs.setdefault(x, []).append(y)
        nbrs.setdefault(y, []).append(x)
    for _ in range(rounds):
        act = [v for v, rv in r.items() if rv >= deg[v] * EPS]
        if not act:
            break
        new_r = dict(r)
        for v in act:
            rv = r[v]
            gain = rv * ALPHA_NUM // ALPHA_DEN
            rest = rv - gain
            out = rest - rest // 2
            share = out // deg[v]
            p[v] = p.get(v, 0) + gain
            new_r[v] = new_r[v] - rv + (rest - share * deg[v])
            if share:
                for u in nbrs[v]:
                    new_r[u] = new_r.get(u, 0) + share
        r = {v: x for v, x in new_r.items() if x != 0 or v in p}
    ids = sorted(set(p) | set(r))
    return (
        np.array(ids, np.int64),
        np.array([p.get(i, 0) for i in ids], np.int64),
        np.array([r.get(i, 0) for i in ids], np.int64),
    )
