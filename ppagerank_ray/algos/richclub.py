"""Rich-club structure over the undirected simple graph.

Engine-only extension of the reference's degree-statistics family
(the reference tracks per-processor nonzero/degree distributions when
loading — `petsc_util.cc:463-480` nz counts, `petsc_util.cc:176-266`
.degs handling; this module reports how tightly the high-degree "club"
is wired). For every degree threshold k present in the graph it emits the
two exact integers behind the classic rich-club coefficient
phi(k) = 2*E_k / (N_k*(N_k-1)) (Zhou & Mondragon, "The rich-club
phenomenon in the Internet topology", 2004):

    n_rich = #vertices with undirected degree > k
    e_rich = #undirected simple edges with BOTH endpoints of degree > k

phi itself is a ratio of these and is left to the caller so the result
stays integer-exact and hash-stable across partitionings.

Shape: one canonical-pair dedup (reused from triangles), one degree
attach — broadcast bincount under BROADCAST_MAX_VERTEX_DEGREES, two
partitioned hash joins above, the same dual path as triangle
orientation — then everything reduces to two histograms of at most
max-degree rows each: the vertex-degree histogram and the
pair-min-degree histogram (an edge is internal to club k iff
min(deg(a), deg(b)) > k). Suffix sums over those tiny tables happen
driver-side. No O(V) or O(E) state leaves the cluster on the large
path.
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


def _uniq_partial(col: str, out: str):
    """Per-batch np.unique combiner: (col ...) → (out, n) partial counts,
    so the shuffle that follows moves histogram rows, not data rows."""

    def fn(t: pa.Table) -> pa.Table:
        u, c = np.unique(t[col].to_numpy(), return_counts=True)
        return pa.Table.from_pydict(
            {out: u.astype(np.int64), "n": c.astype(np.int64)}
        )

    return fn


def _collect_hist(ds: rd.Dataset, key: str) -> tuple[np.ndarray, np.ndarray]:
    """groupby(key).sum(n) → (sorted keys, counts) on the driver.
    Output is histogram-sized (≤ max degree distinct rows)."""
    agg = ds.groupby(key).sum("n")
    t = pa.concat_tables(
        [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    )
    if t.num_rows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    k = t[key].to_numpy()
    n = t["sum(n)"].to_numpy().astype(np.int64)
    order = np.argsort(k)
    return k[order].astype(np.int64), n[order]


def _min_deg_hist_broadcast(
    pairs: rd.Dataset, n_vertices: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Small-graph path: dense degree vector built from per-block bincount
    partials (O(V) ints on the driver, gated) and broadcast ONCE."""
    deg = np.zeros(n_vertices, dtype=np.int64)
    for t in ray.get(pairs.to_arrow_refs()):
        if t.num_rows:
            deg += np.bincount(t["a"].to_numpy(), minlength=n_vertices)
            deg += np.bincount(t["b"].to_numpy(), minlength=n_vertices)
    deg_ref = ray.put(deg)

    def mindeg(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        m = np.minimum(dg[t["a"].to_numpy()], dg[t["b"].to_numpy()])
        u, c = np.unique(m, return_counts=True)
        return pa.Table.from_pydict(
            {"m": u.astype(np.int64), "n": c.astype(np.int64)}
        )

    em = pairs.map_batches(mindeg, batch_format="pyarrow", batch_size=262144)
    mk, mn = _collect_hist(em, "m")
    pos = deg[deg > 0]
    dk, dn = np.unique(pos, return_counts=True)
    return dk.astype(np.int64), dn.astype(np.int64), mk, mn


def _min_deg_hist_joined(
    pairs: rd.Dataset,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Large-graph path: distributed (id, deg) table attached to the pairs
    by two partitioned hash joins — no dense O(V) array anywhere."""
    from ppagerank_ray.graph.build import shuffle_blocks
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
        .map_batches(
            lambda t: t.rename_columns(["id", "deg"]), batch_format="pyarrow"
        )
    ).materialize()

    dh = deg_tbl.map_batches(
        _uniq_partial("deg", "d"), batch_format="pyarrow", batch_size=262144
    )
    dk, dn = _collect_hist(dh, "d")

    j1 = hash_join(pairs, deg_tbl, "a", "id").map_batches(
        lambda t: t.rename_columns(["a", "b", "da"]), batch_format="pyarrow"
    )
    j2 = hash_join(j1, deg_tbl, "b", "id")

    def mindeg(t: pa.Table) -> pa.Table:
        m = np.minimum(t["da"].to_numpy(), t["deg"].to_numpy())
        u, c = np.unique(m, return_counts=True)
        return pa.Table.from_pydict(
            {"m": u.astype(np.int64), "n": c.astype(np.int64)}
        )

    em = j2.map_batches(mindeg, batch_format="pyarrow", batch_size=262144)
    mk, mn = _collect_hist(em, "m")
    return dk, dn, mk, mn


def rich_club(edges: rd.Dataset, n_vertices: int) -> pa.Table:
    """(src,dst) edge Dataset → (k, n_rich, e_rich) per distinct degree k.

    Thresholds are exactly the distinct undirected degrees present in
    the simple graph (self-loops and duplicate/reciprocal edges collapse
    first); the largest k therefore always reports n_rich = e_rich = 0.
    """
    pairs = canonical_pairs(edges)
    if n_vertices <= BROADCAST_MAX_VERTEX_DEGREES:
        dk, dn, mk, mn = _min_deg_hist_broadcast(pairs, n_vertices)
    else:
        dk, dn, mk, mn = _min_deg_hist_joined(pairs)

    # n_rich(k) = #vertices with deg > k: suffix sums over the degree
    # histogram, evaluated at each threshold via searchsorted.
    dcum = np.concatenate([np.cumsum(dn[::-1])[::-1], [0]])
    n_rich = dcum[np.searchsorted(dk, dk, side="right")]
    # e_rich(k) = #pairs with min-degree > k over the min-degree histogram.
    mcum = np.concatenate([np.cumsum(mn[::-1])[::-1], [0]])
    e_rich = mcum[np.searchsorted(mk, dk, side="right")]

    return pa.Table.from_pydict(
        {
            "k": dk,
            "n_rich": n_rich.astype(np.int64),
            "e_rich": e_rich.astype(np.int64),
        }
    )


def numpy_rich_club_oracle(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Brute-force single-machine oracle for tests."""
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    ab = np.unique(a.astype(np.int64) * (1 << 32) + b.astype(np.int64))
    a, b = ab >> 32, ab & ((1 << 32) - 1)
    ids, deg = np.unique(np.concatenate([a, b]), return_counts=True)
    lut = dict(zip(ids.tolist(), deg.tolist()))
    da = np.array([lut[x] for x in a.tolist()], np.int64)
    db = np.array([lut[x] for x in b.tolist()], np.int64)
    m = np.minimum(da, db)
    ks = np.unique(deg)
    n_rich = np.array([(deg > k).sum() for k in ks], np.int64)
    e_rich = np.array([(m > k).sum() for k in ks], np.int64)
    return ks.astype(np.int64), n_rich, e_rich
