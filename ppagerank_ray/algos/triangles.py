"""Triangle counting over the edge Dataset — pure Ray Data composition.

Engine-only algorithm (SURVEY.md §2.9): count unordered vertex triples that
are mutually adjacent in the undirected graph (direction and edge weights
ignored; self-loops and duplicate edges collapse first).

Algorithm (standard degree-ordered wedge counting):
1. canonical undirected pairs (a < b), distinct — one sort + adjacent dedup;
2. total degree per vertex — below BROADCAST_MAX_VERTEX_DEGREES a dense
   per-block bincount merged on the driver and broadcast once (ray.put);
   above it a distributed (id, deg) table attached to the pairs by TWO
   partitioned hash joins — no O(V) driver array anywhere on the large
   path (round-1 verdict item 6);
3. orient every pair from lower (degree, id) rank to higher — bounds every
   oriented out-degree by O(sqrt(E)), the same hub-taming job the
   reference's balance-weighted redistribution does for rows
   (petsc_util.cc:1093-1263), so wedge generation never explodes on a hub.
   The oriented stream carries deg(b) as a COLUMN so downstream stages
   never index a dense degree array;
4. wedges per center, generated diagonally (offset-g pairs (p, p+g) within
   center runs — fully vectorized, no per-center Python; the loop count is
   the max oriented out-degree, O(sqrt E));
5. triangles = wedges that are themselves oriented edges. Below
   BROADCAST_MAX_EDGE_KEYS the match is a broadcast semi-join (sorted key
   array + np.searchsorted per wedge group — no shuffle, wedges never
   materialize); above it, a tagged-union groupby(["a","b"]) hash shuffle
   (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

BROADCAST_MAX_EDGE_KEYS = 50_000_000
BROADCAST_MAX_VERTEX_DEGREES = 50_000_000


def canonical_pairs(edges: rd.Dataset) -> rd.Dataset:
    """(src,dst) → distinct (a,b) with a < b, self-loops dropped."""
    from ppagerank_ray.graph.build import shuffle_blocks, sorted_dedup

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.Table.from_pydict(
            {"src": np.minimum(s, d), "dst": np.maximum(s, d)}
        )

    deduped = sorted_dedup(
        edges.select_columns(["src", "dst"])
        .map_batches(canon, batch_format="pyarrow", batch_size=262144)
        .repartition(shuffle_blocks())
        .sort(["src", "dst"])
    )
    return deduped.map_batches(
        lambda t: t.rename_columns(["a", "b"]), batch_format="pyarrow"
    )


def _wedge_pairs(a: np.ndarray, b: np.ndarray, db: np.ndarray):
    """All rank-ordered out-neighbor pairs per center, diagonally vectorized:
    sort rows by (center, deg(nbr), nbr); for offset g, rows p and p+g form
    a wedge iff they share a center. Python loop length = max out-degree.
    deg(nbr) arrives as a column — no dense degree array. Returns
    (x, y, center) per wedge."""
    order = np.lexsort((b, db, a))
    a, b = a[order], b[order]
    out_x, out_y, out_c = [], [], []
    g = 1
    while g < len(a):
        same = a[:-g] == a[g:]
        idx = np.flatnonzero(same)
        if len(idx) == 0:
            break
        out_x.append(b[idx])
        out_y.append(b[idx + g])
        out_c.append(a[idx])
        g += 1
    if not out_x:
        e = np.empty(0, np.int64)
        return e, e, e
    return np.concatenate(out_x), np.concatenate(out_y), np.concatenate(out_c)


def _with_group(ds: rd.Dataset, n_groups: int) -> rd.Dataset:
    return ds.map_batches(
        lambda t: t.append_column("g", pa.array(t["a"].to_numpy() % n_groups)),
        batch_format="pyarrow",
    )


def _orient_broadcast(pairs: rd.Dataset, n_vertices: int) -> rd.Dataset:
    """(a,b) → oriented (a,b,db): degree via per-block bincount partials
    merged on the driver (O(V) ints) and broadcast ONCE — the small-graph
    path."""
    deg = np.zeros(n_vertices, dtype=np.int64)
    for t in ray.get(pairs.to_arrow_refs()):
        if t.num_rows:
            deg += np.bincount(t["a"].to_numpy(), minlength=n_vertices)
            deg += np.bincount(t["b"].to_numpy(), minlength=n_vertices)
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pa.Table:
        dg = ray.get(deg_ref)
        a = t["a"].to_numpy()
        b = t["b"].to_numpy()
        return _orient_cols(a, b, dg[a], dg[b])

    return pairs.map_batches(orient, batch_format="pyarrow", batch_size=262144)


def _orient_cols(a, b, da, db) -> pa.Table:
    a_first = (da < db) | ((da == db) & (a < b))
    return pa.Table.from_pydict(
        {
            "a": np.where(a_first, a, b),
            "b": np.where(a_first, b, a),
            "db": np.where(a_first, db, da).astype(np.int64),
        }
    )


def _orient_joined(pairs: rd.Dataset) -> rd.Dataset:
    """(a,b) → oriented (a,b,db) via a distributed degree table + two
    partitioned hash joins — the >BROADCAST_MAX_VERTEX_DEGREES path; no
    dense O(V) array touches the driver or the tasks."""
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
    j1 = hash_join(pairs, deg_tbl, "a", "id").map_batches(
        lambda t: t.rename_columns(["a", "b", "da"]), batch_format="pyarrow"
    )
    j2 = hash_join(j1, deg_tbl, "b", "id")

    def orient(t: pa.Table) -> pa.Table:
        return _orient_cols(
            t["a"].to_numpy(),
            t["b"].to_numpy(),
            t["da"].to_numpy(),
            t["deg"].to_numpy(),
        )

    return j2.map_batches(orient, batch_format="pyarrow", batch_size=262144)


def triangle_count(edges: rd.Dataset, n_vertices: int) -> int:
    from ppagerank_ray.graph.build import shuffle_blocks

    pairs = canonical_pairs(edges).materialize()
    if n_vertices <= BROADCAST_MAX_VERTEX_DEGREES:
        oriented = _orient_broadcast(pairs, n_vertices).materialize()
    else:
        oriented = _orient_joined(pairs).materialize()
    n_edges = oriented.count()
    V = np.int64(n_vertices)
    n_groups = 1024

    if n_edges == 0:
        return 0
    if n_edges <= BROADCAST_MAX_EDGE_KEYS:
        # broadcast semi-join: wedge (x,y) is a triangle iff key x·V+y is an
        # oriented edge key (orientation makes the direction unique)
        keys = np.sort(
            np.concatenate(
                [
                    t["a"].to_numpy() * V + t["b"].to_numpy()
                    for t in ray.get(oriented.to_arrow_refs())
                    if t.num_rows
                ]
            )
        )
        keys_ref = ray.put(keys)

        def count_in_group(group) -> pa.Table:
            ks = ray.get(keys_ref)
            x, y, _c = _wedge_pairs(
                np.asarray(group["a"]),
                np.asarray(group["b"]),
                np.asarray(group["db"]),
            )
            if len(x) == 0:
                matches = 0
            else:
                wk = x * V + y
                pos = np.searchsorted(ks, wk)
                pos[pos >= len(ks)] = len(ks) - 1
                matches = int((ks[pos] == wk).sum())
            return pa.Table.from_pydict(
                {"tri": np.array([matches], dtype=np.int64)}
            )

        # no repartition before the groupby: `oriented` is materialized
        # across shuffle_blocks()-many blocks already and the sort-based
        # groupby is itself the exchange
        grouped = (
            _with_group(oriented, n_groups)
            .groupby("g")
            .map_groups(count_in_group, batch_format="numpy")
        )
        return int(grouped.sum("tri"))

    # large-graph fallback: tagged union + hash shuffle match
    def wedge_rows(group) -> pa.Table:
        x, y, _c = _wedge_pairs(
            np.asarray(group["a"]),
            np.asarray(group["b"]),
            np.asarray(group["db"]),
        )
        return pa.Table.from_pydict(
            {
                "a": x,
                "b": y,
                "w": np.ones(len(x), np.int64),
                "e": np.zeros(len(x), np.int64),
            }
        )

    wedge_ds = (
        _with_group(oriented, n_groups)
        .groupby("g")
        .map_groups(wedge_rows, batch_format="numpy")
    )

    def tag_edges(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.Table.from_pydict(
            {
                "a": t["a"].to_numpy().astype(np.int64),
                "b": t["b"].to_numpy().astype(np.int64),
                "w": np.zeros(n, np.int64),
                "e": np.ones(n, np.int64),
            }
        )

    from ray.data.aggregate import Max, Sum

    tagged = wedge_ds.union(oriented.map_batches(tag_edges, batch_format="pyarrow"))
    per_pair = (
        tagged.groupby(["a", "b"])
        .aggregate(Sum("w", alias_name="w_sum"), Max("e", alias_name="has_e"))
    )

    def contrib(t: pa.Table) -> pa.Table:
        c = t["w_sum"].to_numpy() * t["has_e"].to_numpy()
        return pa.Table.from_pydict({"tri": np.array([c.sum()], dtype=np.int64)})

    return int(per_pair.map_batches(contrib, batch_format="pyarrow").sum("tri"))


def triangle_counts_per_vertex(edges: rd.Dataset, n_vertices: int) -> rd.Dataset:
    """Per-vertex triangle participation counts (id, n_tri), only ids
    with n_tri > 0 — the local-clustering-coefficient numerator.

    Same degree-ordered wedge machinery as triangle_count, but every
    matched wedge (x, y, center) credits ALL THREE members. Below
    BROADCAST_MAX_EDGE_KEYS the edge-key match is the broadcast
    semi-join and each group emits sparse (id, n) partials; above it the
    wedges (with their center column) hash-join against the oriented
    edge keys — both ends with ONE aggregate shuffle of the sparse
    per-vertex partials."""
    pairs = canonical_pairs(edges).materialize()
    if n_vertices <= BROADCAST_MAX_VERTEX_DEGREES:
        oriented = _orient_broadcast(pairs, n_vertices).materialize()
    else:
        oriented = _orient_joined(pairs).materialize()
    n_edges = oriented.count()
    V = np.int64(n_vertices)
    n_groups = 1024
    empty = rd.from_arrow(
        pa.Table.from_pydict(
            {"id": np.empty(0, np.int64), "n_tri": np.empty(0, np.int64)}
        )
    )
    if n_edges == 0:
        return empty

    def vertex_partial(ids_concat: np.ndarray) -> pa.Table:
        uk, c = np.unique(ids_concat, return_counts=True)
        return pa.Table.from_pydict({"id": uk, "n": c.astype(np.int64)})

    if n_edges <= BROADCAST_MAX_EDGE_KEYS:
        keys = np.sort(
            np.concatenate(
                [
                    t["a"].to_numpy() * V + t["b"].to_numpy()
                    for t in ray.get(oriented.to_arrow_refs())
                    if t.num_rows
                ]
            )
        )
        keys_ref = ray.put(keys)

        def counts_in_group(group) -> pa.Table:
            ks = ray.get(keys_ref)
            x, y, c = _wedge_pairs(
                np.asarray(group["a"]),
                np.asarray(group["b"]),
                np.asarray(group["db"]),
            )
            if len(x) == 0:
                return vertex_partial(np.empty(0, np.int64))
            wk = x * V + y
            pos = np.searchsorted(ks, wk)
            pos[pos >= len(ks)] = len(ks) - 1
            m = ks[pos] == wk
            return vertex_partial(np.concatenate([x[m], y[m], c[m]]))

        partials = (
            _with_group(oriented, n_groups)
            .groupby("g")
            .map_groups(counts_in_group, batch_format="numpy")
        )
    else:
        from ppagerank_ray.ops.joins import hash_join

        def wedge_key_rows(group) -> pa.Table:
            x, y, c = _wedge_pairs(
                np.asarray(group["a"]),
                np.asarray(group["b"]),
                np.asarray(group["db"]),
            )
            return pa.Table.from_pydict({"k": x * V + y, "x": x, "y": y, "c": c})

        wedges = (
            _with_group(oriented, n_groups)
            .groupby("g")
            .map_groups(wedge_key_rows, batch_format="numpy")
        )
        edge_keys = oriented.map_batches(
            lambda t: pa.Table.from_pydict(
                {"k": t["a"].to_numpy() * V + t["b"].to_numpy()}
            ),
            batch_format="pyarrow",
        )
        matched = hash_join(wedges, edge_keys, "k", "k")
        partials = matched.map_batches(
            lambda t: vertex_partial(
                np.concatenate(
                    [t["x"].to_numpy(), t["y"].to_numpy(), t["c"].to_numpy()]
                )
            ),
            batch_format="pyarrow",
        )
    out = partials.groupby("id").sum("n")
    return out.map_batches(
        lambda t: pa.Table.from_pydict(
            {"id": t["id"], "n_tri": t["sum(n)"]}
        ),
        batch_format="pyarrow",
    )


def numpy_triangle_oracle(src: np.ndarray, dst: np.ndarray) -> int:
    """Brute-force oracle for tests: count via adjacency sets."""
    pairs = {(min(s, d), max(s, d)) for s, d in zip(src.tolist(), dst.tolist()) if s != d}
    adj: dict[int, set] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in pairs:
        count += len(adj[a] & adj[b])
    return count // 3
