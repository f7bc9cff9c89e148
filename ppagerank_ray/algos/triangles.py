"""Triangle counting over the edge Dataset — pure Ray Data composition.

Engine-only algorithm (SURVEY.md §2.9): count unordered vertex triples that
are mutually adjacent in the undirected graph (direction and edge weights
ignored; self-loops and duplicate edges collapse first).

Algorithm (standard degree-ordered wedge counting):
1. canonical undirected pairs (a < b), distinct — groupby shuffle;
2. total degree per vertex — groupby count, broadcast (ray.put once);
3. orient every pair from lower (degree, id) rank to higher — this bounds
   every oriented out-degree by O(sqrt(E)), the same hub-taming job the
   reference's balance-weighted redistribution does for rows
   (petsc_util.cc:1093-1263), so wedge generation never explodes on a hub;
4. wedges: per center, all rank-ordered out-neighbor pairs
   (groupby.map_groups, numpy inside);
5. triangles = wedges that are themselves oriented edges — counted with a
   tagged union + groupby(["a","b"]) instead of a join, so the match is one
   hash shuffle (SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


def canonical_pairs(edges: rd.Dataset) -> rd.Dataset:
    """(src,dst) → distinct (a,b) with a < b, self-loops dropped."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.Table.from_pydict(
            {"a": np.minimum(s, d), "b": np.maximum(s, d)}
        )

    from ppagerank_ray.graph.build import shuffle_blocks

    return (
        edges.select_columns(["src", "dst"])
        .map_batches(canon, batch_format="pyarrow", batch_size=262144)
        .repartition(shuffle_blocks())
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
    )


def triangle_count(edges: rd.Dataset, n_vertices: int) -> int:
    pairs = canonical_pairs(edges).materialize()

    # degree = #distinct undirected neighbors; small table → broadcast
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
        # rank(v) = (deg[v], v); orient low → high
        a_first = (dg[a] < dg[b]) | ((dg[a] == dg[b]) & (a < b))
        lo = np.where(a_first, a, b)
        hi = np.where(a_first, b, a)
        return pa.Table.from_pydict({"a": lo, "b": hi})

    oriented = pairs.map_batches(orient, batch_format="pyarrow", batch_size=262144)

    def wedges(group) -> pa.Table:
        dg = ray.get(deg_ref)
        bs = group["b"]
        if len(bs) < 2:
            return pa.Table.from_pydict(
                {
                    "a": np.empty(0, np.int64),
                    "b": np.empty(0, np.int64),
                    "w": np.empty(0, np.int64),
                    "e": np.empty(0, np.int64),
                }
            )
        order = np.lexsort((bs, dg[bs]))  # rank order among out-neighbors
        bs = bs[order]
        n = len(bs)
        # all index pairs i < j, vectorized
        ii, jj = np.triu_indices(n, k=1)
        return pa.Table.from_pydict(
            {
                "a": bs[ii].astype(np.int64),
                "b": bs[jj].astype(np.int64),
                "w": np.ones(len(ii), np.int64),
                "e": np.zeros(len(ii), np.int64),
            }
        )

    wedge_ds = oriented.groupby("a").map_groups(wedges, batch_format="numpy")

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

    tagged = wedge_ds.union(
        oriented.map_batches(tag_edges, batch_format="pyarrow")
    )
    from ray.data.aggregate import Max, Sum

    from ppagerank_ray.graph.build import shuffle_blocks as _sb

    per_pair = tagged.repartition(_sb()).groupby(["a", "b"]).aggregate(
        Sum("w", alias_name="w_sum"), Max("e", alias_name="has_e")
    )

    def contrib(t: pa.Table) -> pa.Table:
        c = t["w_sum"].to_numpy() * t["has_e"].to_numpy()
        return pa.Table.from_pydict({"tri": np.array([c.sum()], dtype=np.int64)})

    total = per_pair.map_batches(contrib, batch_format="pyarrow").sum("tri")
    return int(total)


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
