"""Link-prediction scores over the edge Dataset — pure Ray Data composition.

Classic neighborhood-overlap predictors (Liben-Nowell & Kleinberg 2003;
Adamic & Adar 2003) for every candidate vertex pair sharing at least one
common neighbor in the undirected graph:

  common_neighbors(u,v) = |Γ(u) ∩ Γ(v)|
  adamic_adar(u,v)      = Σ_{w ∈ Γ(u)∩Γ(v)} 1 / ln(deg(w))
  jaccard(u,v)          = |Γ(u) ∩ Γ(v)| / |Γ(u) ∪ Γ(v)|

No reference analogue (the reference computes only global PageRank-family
scores); this is the standard link-graph curation primitive (suggesting
missing links / scoring edge plausibility).

Pipeline shape:
1. canonical undirected pairs (triangles.canonical_pairs — one exchange);
2. adjacency stream (center, nbr) both directions, groupby(center % 1024)
   — the SECOND exchange. Inside each group one vectorized diagonal pass
   (triangles-style offset-g wedges over (center, nbr)-sorted rows) emits
   every neighbor pair per center; deg(center) is the center's run length,
   so the Adamic-Adar weight needs NO degree join;
3. per-group partial aggregation (structured-void np.unique) so the THIRD
   exchange — groupby((u,v)).sum — moves one row per distinct pair per
   group, not one per wedge;
4. degrees for Jaccard attach via a dense bincount broadcast below the
   vertex gate, or two partitioned hash joins above it (the triangles
   orientation pattern).

Scale notes (wedges are inherently O(Σ deg²) — unlike triangle counting,
EVERY common neighbor must be enumerated, so degree-ordering cannot bound
the per-center work):
- `sample_mod` keeps only pairs with hash(u,v) % sample_mod == 0, applied
  at wedge-emit time BEFORE any shuffle — the standard way to bound the
  pair table at web scale (compute per center stays O(deg²) but is a
  sequential vectorized scan; the exchanges shrink by the sample factor).
- `max_center_degree` is a hub valve: centers with more distinct
  neighbors are skipped (their wedge fan-out is deg² — one 10^7-degree
  hub alone would emit 10^14 pairs). Skips are counted and logged;
  scores become lower bounds for pairs whose only common neighbors are
  such hubs — which is exactly the Adamic-Adar intuition (a shared
  mega-hub carries ≈ 1/ln(10^7) ≈ 0.06 signal).

Determinism: the Adamic-Adar sum is accumulated as EXACT int64 terms
round(1e9 / ln(deg)) so partition/visit order cannot perturb the float
(same order-invariance trick as the harmonic-centrality oracle); the
float column is derived from the integer by one division, bit-identical
on the SQL side.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.algos import triangles as _tri
from ppagerank_ray.algos.triangles import canonical_pairs

logger = logging.getLogger(__name__)

AA_SCALE = 1_000_000_000.0  # Adamic-Adar integer-term scale (1e9)
_HASH_M = 2147483647  # pair-sampling hash modulus (2^31 - 1)
_HASH_K = 1000003


def _pair_hash(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Deterministic pair hash, overflow-safe in int64 (u % M < 2^31,
    × 1000003 < 2^51) and expressible verbatim in ANSI SQL."""
    return ((u % _HASH_M) * _HASH_K + v) % _HASH_M


def _group_scores(
    c: np.ndarray,
    b: np.ndarray,
    sample_mod: int,
    max_center_degree: int | None,
) -> pa.Table:
    """One vectorized pass over a block of (center, nbr) adjacency rows:
    diagonal wedge generation + hash sampling + partial aggregation.
    Returns (u, v, cn, aa_int) partials."""
    order = np.lexsort((b, c))
    c, b = c[order], b[order]
    # center run lengths == center degrees (adjacency rows are distinct)
    seg = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
    lens = np.diff(np.r_[seg, len(c)])
    deg_row = np.repeat(lens, lens)
    if max_center_degree is not None:
        keep = deg_row <= max_center_degree
        n_skipped = len(lens) - int(
            (lens <= max_center_degree).sum()
        )
        if n_skipped:
            logger.warning(
                "link_prediction: skipped %d hub centers (> %d neighbors)",
                n_skipped,
                max_center_degree,
            )
        c, b, deg_row = c[keep], b[keep], deg_row[keep]
    # integer Adamic-Adar term per row's center (deg >= 2 only emits wedges)
    term_row = np.zeros(len(c), np.int64)
    m2 = deg_row >= 2
    term_row[m2] = np.floor(AA_SCALE / np.log(deg_row[m2]) + 0.5).astype(np.int64)

    us, vs, ts = [], [], []
    g = 1
    while g < len(c):
        same = c[:-g] == c[g:]
        idx = np.flatnonzero(same)
        if len(idx) == 0:
            break
        u, v = b[idx], b[idx + g]  # nbr-sorted ⇒ u < v
        if sample_mod > 1:
            m = _pair_hash(u, v) % sample_mod == 0
            u, v, t = u[m], v[m], term_row[idx][m]
        else:
            t = term_row[idx]
        us.append(u)
        vs.append(v)
        ts.append(t)
        g += 1
    if not us or sum(len(x) for x in us) == 0:
        e = np.empty(0, np.int64)
        return pa.Table.from_pydict({"u": e, "v": e, "cn": e, "aa_int": e})
    u = np.concatenate(us)
    v = np.concatenate(vs)
    t = np.concatenate(ts)
    # partial-aggregate (u,v) within the group so the pair shuffle moves
    # one row per distinct pair, not one per wedge
    rows = np.ascontiguousarray(
        np.column_stack([u.astype(np.uint64), v.astype(np.uint64)])
    )
    void = rows.view([("", rows.dtype)] * 2).ravel()
    o2 = np.argsort(void, kind="stable")
    void_s, t_s = void[o2], t[o2]
    starts = np.flatnonzero(np.r_[True, void_s[1:] != void_s[:-1]])
    uniq = void_s[starts].view(np.uint64).reshape(-1, 2)
    cn = np.diff(np.r_[starts, len(void_s)]).astype(np.int64)
    aa = np.add.reduceat(t_s, starts)
    return pa.Table.from_pydict(
        {
            "u": uniq[:, 0].astype(np.int64),
            "v": uniq[:, 1].astype(np.int64),
            "cn": cn,
            "aa_int": aa,
        }
    )


def link_prediction(
    edges: rd.Dataset,
    n_vertices: int,
    sample_mod: int = 1,
    max_center_degree: int | None = None,
    n_groups: int = 1024,
) -> rd.Dataset:
    """Score all (sampled) vertex pairs with ≥1 common neighbor. Returns a
    Dataset of (u, v, common_neighbors, aa_e9, adamic_adar, jaccard) with
    u < v; aa_e9 is the exact integer Σ round(1e9/ln(deg(w)))."""
    from ray.data.aggregate import Sum

    from ppagerank_ray.graph.build import shuffle_blocks

    pairs = canonical_pairs(edges).materialize()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        c = np.concatenate([a, b])
        return pa.Table.from_pydict(
            {"c": c, "b": np.concatenate([b, a]), "g": c % n_groups}
        )

    adj = pairs.map_batches(both_dirs, batch_format="pyarrow", batch_size=262144)

    def scores_of_group(group) -> pa.Table:
        return _group_scores(
            np.asarray(group["c"]),
            np.asarray(group["b"]),
            sample_mod,
            max_center_degree,
        )

    per_pair = (
        adj.groupby("g")
        .map_groups(scores_of_group, batch_format="numpy")
        .groupby(["u", "v"])
        .aggregate(Sum("cn", alias_name="common_neighbors"), Sum("aa_int", alias_name="aa_e9"))
    )

    # same vertex gate as triangles (read at call time so tests can force
    # the distributed-join path by patching the triangles module)
    if n_vertices <= _tri.BROADCAST_MAX_VERTEX_DEGREES:
        deg = np.zeros(n_vertices, dtype=np.int64)
        for t in ray.get(pairs.to_arrow_refs()):
            if t.num_rows:
                deg += np.bincount(t["a"].to_numpy(), minlength=n_vertices)
                deg += np.bincount(t["b"].to_numpy(), minlength=n_vertices)
        deg_ref = ray.put(deg)

        def attach(t: pa.Table) -> pa.Table:
            dg = ray.get(deg_ref)
            return _finalize(t, dg[t["u"].to_numpy()], dg[t["v"].to_numpy()])

        return per_pair.map_batches(attach, batch_format="pyarrow", batch_size=262144)

    # large-graph path: distributed degree table + two partitioned joins
    from ppagerank_ray.ops.joins import hash_join

    ends = pairs.map_batches(
        lambda t: pa.Table.from_pydict(
            {"id": np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()])}
        ),
        batch_format="pyarrow",
    )
    deg_tbl = (
        ends.repartition(shuffle_blocks())
        .groupby("id")
        .count()
        .map_batches(lambda t: t.rename_columns(["id", "deg"]), batch_format="pyarrow")
    ).materialize()
    j1 = hash_join(per_pair, deg_tbl, "u", "id").map_batches(
        lambda t: t.rename_columns(
            ["u", "v", "common_neighbors", "aa_e9", "du"]
        ),
        batch_format="pyarrow",
    )
    j2 = hash_join(j1, deg_tbl, "v", "id")
    return j2.map_batches(
        lambda t: _finalize(
            t.select(["u", "v", "common_neighbors", "aa_e9"]),
            t["du"].to_numpy(),
            t["deg"].to_numpy(),
        ),
        batch_format="pyarrow",
        batch_size=262144,
    )


def _finalize(t: pa.Table, du: np.ndarray, dv: np.ndarray) -> pa.Table:
    cn = t["common_neighbors"].to_numpy()
    aa_int = t["aa_e9"].to_numpy()
    return pa.Table.from_pydict(
        {
            "u": t["u"],
            "v": t["v"],
            "common_neighbors": cn,
            "aa_e9": aa_int,
            "adamic_adar": aa_int / AA_SCALE,
            "jaccard": np.floor(
                cn / (du + dv - cn) * 1_000_000.0 + 0.5
            )
            / 1_000_000.0,
        }
    )


def numpy_linkpred_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    sample_mod: int = 1,
) -> dict[tuple[int, int], tuple[int, int, float]]:
    """Brute-force oracle for tests: dict (u,v) -> (cn, aa_e9, jaccard)."""
    import math

    pairs = {
        (min(s, d), max(s, d))
        for s, d in zip(src.tolist(), dst.tolist())
        if s != d
    }
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out: dict[tuple[int, int], tuple[int, int, float]] = {}
    ids = sorted(adj)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            common = adj[u] & adj[v]
            if not common:
                continue
            if sample_mod > 1 and ((u % _HASH_M) * _HASH_K + v) % _HASH_M % sample_mod:
                continue
            aa = sum(
                int(math.floor(AA_SCALE / math.log(len(adj[w])) + 0.5))
                for w in common
            )
            jac = math.floor(
                len(common) / (len(adj[u]) + len(adj[v]) - len(common)) * 1e6 + 0.5
            ) / 1e6
            out[(u, v)] = (len(common), aa, jac)
    return out
