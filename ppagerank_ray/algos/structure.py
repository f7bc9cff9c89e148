"""Structural link-graph analytics over the undirected edge Dataset:
BFS hop distance, degree assortativity, global transitivity.

Engine-only algorithms (no reference implementation — the SURVEY §2.9
family next to connected components / k-core): each is a bulk-synchronous
neighborhood aggregate expressed through the engine's combiner-before-
shuffle partials, so the skew handling the north rule requires applies
unchanged.

* BFS hop distance: min-plus fixpoint dist(v) ← min(dist(v),
  1 + min over undirected neighbors u of dist(u)), init 0 at the seeds,
  sentinel elsewhere. Converges in eccentricity(seeds)+1 rounds; exact
  integer arithmetic; the per-round shuffle reuses cc_partials verbatim
  (per-destination-partition min of the gathered vector).
* Degree assortativity: Pearson correlation of (deg(u), deg(v)) over the
  double-direction distinct undirected edge list — the standard
  Newman r (M. E. J. Newman, "Assortative mixing in networks", PRL 89,
  208701, 2002). One degree-build round plus ONE moment-partial round;
  the driver sees only 6 floats per partition.

Requires engine.load_undirected(build_undirected(edges)) first.
Validated against networkx (shortest_path_length /
degree_assortativity_coefficient) in tests and DuckDB SQL oracles in the
driver harness.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.engine.vertex_engine import VertexEngine


def undirected_degrees(engine: VertexEngine, name: str = "deg") -> None:
    """ivec[name] := distinct-neighbor undirected degree, via one
    summable-count partial round (kcore's init kernel)."""
    partial_mat = [
        w.kcore_deg_partials.options(num_returns=engine.P).remote()
        for w in engine.workers
    ]
    if engine.P == 1:
        partial_mat = [[m] for m in partial_mat]
    ray.get(
        [
            engine.workers[q].kcore_init_reduce.remote(
                [partial_mat[p][q] for p in range(engine.P)], name
            )
            for q in range(engine.P)
        ]
    )


def bfs_distances(
    engine: VertexEngine, seeds, max_rounds: int = 10_000
) -> dict:
    """Exact hop distances from `seeds` (iterable of vertex ids) in ivec
    'dist'; unreachable vertices hold the sentinel engine.V (callers map
    it to -1 for presentation). engine.to_array('dist', integer=True)
    collects the result."""
    seeds = np.asarray(list(seeds), np.int64)
    sentinel = int(engine.V)
    ray.get([w.bfs_init.remote(seeds, sentinel) for w in engine.workers])
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        dist_refs = [w.get_islice.remote("dist") for w in engine.workers]
        gargs = engine._gather_args(dist_refs, engine.u_spans)
        partial_mat = [
            w.cc_partials.options(num_returns=engine.P).remote(refs, base)
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
        if engine.P == 1:
            partial_mat = [[m] for m in partial_mat]
        red = [
            engine.workers[q].bfs_reduce.options(num_returns=2).remote(
                [partial_mat[p][q] for p in range(engine.P)]
            )
            for q in range(engine.P)
        ]
        changed = int(np.sum(ray.get([r[0] for r in red])))
        if changed == 0:
            break
    return {"algorithm": "bfs", "rounds": rounds, "sentinel": sentinel}


def degree_assortativity(engine: VertexEngine) -> float:
    """Newman degree assortativity r over the loaded undirected graph;
    NaN when undefined (no edges, or zero degree variance)."""
    undirected_degrees(engine, "deg")
    deg_refs = [w.get_islice.remote("deg") for w in engine.workers]
    gargs = engine._gather_args(deg_refs, engine.u_spans)
    partial_mat = [
        w.degree_moment_partials.options(num_returns=engine.P).remote(refs, base)
        for w, (refs, base) in zip(engine.workers, gargs)
    ]
    if engine.P == 1:
        partial_mat = [[m] for m in partial_mat]
    sums = ray.get(
        [
            engine.workers[q].assort_reduce.remote(
                [partial_mat[p][q] for p in range(engine.P)]
            )
            for q in range(engine.P)
        ]
    )
    m, sx, sx2, sy, sy2, sxy = (float(sum(t[i] for t in sums)) for i in range(6))
    if m == 0.0:
        return float("nan")
    cov = sxy / m - (sx / m) * (sy / m)
    vx = sx2 / m - (sx / m) ** 2
    vy = sy2 / m - (sy / m) ** 2
    if vx <= 0.0 or vy <= 0.0:
        return float("nan")
    return cov / math.sqrt(vx * vy)


def wedge_count(engine: VertexEngine) -> int:
    """Number of connected triples Σ_v C(deg(v), 2) — the transitivity
    denominator. One degree-build round; the sum folds per partition."""
    undirected_degrees(engine, "deg")
    parts = ray.get([w.wedge_sum.remote() for w in engine.workers])
    return int(sum(parts))


def harmonic_centrality(
    engine: VertexEngine, seeds=None, out: str = "harm", lcm_num: int = 0,
    closeness_out: str | None = None,
):
    """Harmonic centrality H(v) = Σ_{u≠v} 1/d(u, v) over the loaded
    undirected graph — one BFS fixpoint per seed, then a fused
    1/dist accumulation worker-side (vec_add_inv_ivec); unreachable and
    self distances contribute 0. seeds=None sweeps every vertex (exact,
    matches networkx.harmonic_centrality); a sample is the standard
    unbiased estimator scaled by V/|S| (linear in seeds like
    betweenness).

    closeness_out: also accumulate the sampled-closeness integer state
    from the SAME distance waves at zero extra BFS cost — ivecs
    `{closeness_out}_sum` (Σ finite positive dist) and
    `{closeness_out}_cnt` (count of reached seeds); closeness(v) is then
    cnt/sum (reciprocal mean distance to reached seeds)."""
    W = engine.workers
    V = engine.V
    if seeds is None:
        seeds = range(V)
    seeds = [int(s) for s in seeds]
    ray.get([w.vec_set_scalar.remote(out, 0.0) for w in W])
    rounds = 0
    # round-4 multi-source waves: k seeds share every min-plus exchange
    wave = 8
    for w0 in range(0, len(seeds), wave):
        batch = seeds[w0 : w0 + wave]
        rounds += engine.ms_bfs(batch)["rounds"]
        ray.get([w.ms_harmonic_accum.remote(out, V) for w in W])
        if lcm_num:
            ray.get(
                [
                    w.ms_harmonic_accum_num.remote(out + "_num", V, lcm_num)
                    for w in W
                ]
            )
        if closeness_out:
            ray.get(
                [
                    w.ms_closeness_accum.remote(
                        closeness_out + "_sum", closeness_out + "_cnt", V
                    )
                    for w in W
                ]
            )
        ray.get([w.ms_free.remote() for w in W])
    return {
        "algorithm": "harmonic",
        "n_seeds": len(seeds),
        "bfs_rounds_total": rounds,
    }


def pseudo_diameter(engine: VertexEngine, seed: int = 0) -> dict:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib, "Fast
    computation of empirically tight bounds for the diameter of massive
    graphs", JEA 13, 2009): BFS from `seed`, re-root at the farthest
    reachable vertex (ties → smallest id — deterministic), BFS again;
    the second eccentricity is the bound (exact on trees, empirically
    tight on web graphs). Two BFS fixpoints + one distributed argmax —
    no new exchange shapes. Requires engine.load_undirected."""
    import ray

    info1 = bfs_distances(engine, [seed])
    sentinel = info1["sentinel"]
    per = ray.get(
        [w.ivec_argmax_lt.remote("dist", sentinel) for w in engine.workers]
    )
    best_d, best_id = -1, -1
    for d, vid in per:
        if d > best_d or (d == best_d and vid != -1 and
                          (best_id == -1 or vid < best_id)):
            best_d, best_id = d, vid
    if best_id < 0:  # no vertices at all
        return {"algorithm": "pseudo_diameter", "value": -1, "endpoint": -1}
    bfs_distances(engine, [best_id])
    diam = max(
        ray.get(
            [w.ivec_max_lt.remote("dist", sentinel) for w in engine.workers]
        )
    )
    return {
        "algorithm": "pseudo_diameter",
        "value": int(diam),
        "endpoint": int(best_id),
        "first_sweep_ecc": int(best_d),
    }


def attribute_assortativity(
    edges: rd.Dataset, attr_codes: np.ndarray, n_codes: int
) -> tuple[np.ndarray, int, float]:
    """Newman's categorical assortativity coefficient (Newman, "Mixing
    patterns in networks", PRE 67, 2003) over DIRECTED edges whose both
    endpoints carry a code ≥ 0 (−1 = unlabeled, e.g. external urls —
    those edges are excluded, matching networkx's
    attribute_assortativity_coefficient on the labeled subgraph).

    attr_codes is a vertex-aligned int array broadcast once (ray.put —
    an O(V) small-dtype array, the same budget class as the degree
    broadcast in triangles); each batch bincounts its (src_code,
    dst_code) cells, so only k×k-integer partials shuffle. Returns
    (k×k mixing-count matrix, intra-class edge count, r) with r derived
    from exact integer sums by one fixed float expression — replayed
    verbatim in the SQL oracle."""
    import ray

    ref = ray.put(np.ascontiguousarray(attr_codes))
    k = int(n_codes)

    def partial(t: pa.Table) -> pa.Table:
        codes = ray.get(ref)
        s = codes[t["src"].to_numpy()]
        d = codes[t["dst"].to_numpy()]
        m = (s >= 0) & (d >= 0)
        cnt = np.bincount(
            s[m].astype(np.int64) * k + d[m], minlength=k * k
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {"cell": np.arange(k * k, dtype=np.int64), "n": cnt}
        )

    from ray.data.aggregate import Sum

    agg = (
        edges.select_columns(["src", "dst"])
        .map_batches(partial, batch_format="pyarrow", batch_size=262144)
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
    )
    mix = np.zeros(k * k, np.int64)
    for t in ray.get(agg.to_arrow_refs()):
        if t.num_rows:
            mix[t["cell"].to_numpy()] += t["n"].to_numpy()
    mix = mix.reshape(k, k)
    total = int(mix.sum())
    trace = int(np.trace(mix))
    if total == 0:
        return mix, 0, 0.0
    rows = mix.sum(axis=1)
    cols = mix.sum(axis=0)
    s_ab = int((rows * cols).sum())  # exact int64
    t_f = float(total)
    sum_ab = float(s_ab) / (t_f * t_f)
    r = (float(trace) / t_f - sum_ab) / (1.0 - sum_ab)
    return mix, trace, float(np.floor(r * 1e6 + 0.5) / 1e6)
