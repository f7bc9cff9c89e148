"""Per-edge triangle support + fixed-k truss membership.

support(a,b) = number of triangles through the undirected edge (a,b)
(= common neighbors of a and b) — the classic edge-embeddedness /
tie-strength signal. The k-truss (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis") is the maximal subgraph where
every edge has support ≥ k−2 inside the subgraph; membership is the
fixpoint of bulk-synchronous peeling — each round drops every edge
below the bar and recounts (the standard parallel truss shape, e.g.
L. Wang & Torres-Jimenez style peeling / HPEC Graph Challenge k-truss).

Scale shape: support reuses the triangle machinery end-to-end — degree
ordering bounds oriented out-degrees by O(√E), wedges generate
diagonally inside center groups, the match against the oriented edge
set is the gated broadcast semi-join (hash join above
BROADCAST_MAX_EDGE_KEYS), and every matched triangle emits THREE
canonical edge-key credits collapsed by per-group np.unique combiners
before the one aggregate shuffle. Peeling repeats that pipeline on the
surviving pairs — rounds × the support cost, the honest bulk-peeling
trade (a few rounds in practice; each round is fully streaming).

Engine-only algorithm (SURVEY §2.9 family). Validated against a brute
force common-neighbor/peeling reference; the driver harness replays
the peeling unroll in DuckDB (`edges` columns support / in_truss4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.algos.triangles import (
    BROADCAST_MAX_EDGE_KEYS,
    BROADCAST_MAX_VERTEX_DEGREES,
    _orient_broadcast,
    _orient_joined,
    _wedge_pairs,
    _with_group,
    canonical_pairs,
)

TRUSS_K = 4  # the fixed k whose membership the edges query publishes


def _support_of_pairs(pairs: rd.Dataset, n_vertices: int) -> rd.Dataset:
    """(a, b, support) for canonical pairs with support > 0 — every
    matched wedge (x, y, center) credits its three canonical edges."""
    if n_vertices <= BROADCAST_MAX_VERTEX_DEGREES:
        oriented = _orient_broadcast(pairs, n_vertices).materialize()
    else:
        oriented = _orient_joined(pairs).materialize()
    n_edges = oriented.count()
    V = np.int64(n_vertices)
    empty = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "a": np.empty(0, np.int64),
                "b": np.empty(0, np.int64),
                "support": np.empty(0, np.int64),
            }
        )
    )
    if n_edges == 0:
        return empty

    def tri_edge_keys(x, y, c) -> np.ndarray:
        """Canonical (min·V + max) keys of the 3 edges of each triangle."""
        e1 = np.minimum(x, c) * V + np.maximum(x, c)
        e2 = np.minimum(y, c) * V + np.maximum(y, c)
        e3 = np.minimum(x, y) * V + np.maximum(x, y)
        return np.concatenate([e1, e2, e3])

    def key_partial(keys: np.ndarray) -> pa.Table:
        uk, n = np.unique(keys, return_counts=True)
        return pa.Table.from_pydict({"k": uk, "n": n.astype(np.int64)})

    n_groups = 1024
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

        def support_in_group(group) -> pa.Table:
            ks = ray.get(keys_ref)
            x, y, c = _wedge_pairs(
                np.asarray(group["a"]),
                np.asarray(group["b"]),
                np.asarray(group["db"]),
            )
            if len(x) == 0:
                return key_partial(np.empty(0, np.int64))
            wk = x * V + y
            pos = np.searchsorted(ks, wk)
            pos[pos >= len(ks)] = len(ks) - 1
            m = ks[pos] == wk
            return key_partial(tri_edge_keys(x[m], y[m], c[m]))

        partials = (
            _with_group(oriented, n_groups)
            .groupby("g")
            .map_groups(support_in_group, batch_format="numpy")
        )
    else:
        from ppagerank_ray.ops.joins import hash_join

        def wedge_key_rows(group) -> pa.Table:
            x, y, c = _wedge_pairs(
                np.asarray(group["a"]),
                np.asarray(group["b"]),
                np.asarray(group["db"]),
            )
            return pa.Table.from_pydict(
                {"k": x * V + y, "x": x, "y": y, "c": c}
            )

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
            lambda t: key_partial(
                tri_edge_keys(
                    t["x"].to_numpy(), t["y"].to_numpy(), t["c"].to_numpy()
                )
            ),
            batch_format="pyarrow",
        )

    summed = partials.groupby("k").sum("n")
    return summed.map_batches(
        lambda t: pa.Table.from_pydict(
            {
                "a": t["k"].to_numpy() // V,
                "b": t["k"].to_numpy() % V,
                "support": t["sum(n)"].to_numpy().astype(np.int64),
            }
        ),
        batch_format="pyarrow",
    )


def edge_support_and_truss(
    edges: rd.Dataset,
    n_vertices: int,
    k: int = TRUSS_K,
    max_rounds: int = 100,
) -> tuple[rd.Dataset, rd.Dataset, int]:
    """→ (full-graph support Dataset, surviving k-truss pair Dataset,
    rounds) — everything stays a Dataset; the driver only ever sees
    round counts. Support rows cover only pairs with support > 0;
    absent pairs have support 0 (peeled immediately for k > 2). k < 3
    is rejected: at bar = 0 the survivor set is rebuilt from the
    support table, which omits support-0 edges, so the answer would be
    wrong (the 2-truss is just the whole graph — no peeling needed)."""
    if k < 3:
        raise ValueError(f"k-truss requires k >= 3 (got k={k})")
    pairs = canonical_pairs(edges).materialize()
    support0 = _support_of_pairs(pairs, n_vertices).materialize()
    bar = k - 2
    cur = support0
    rounds = 0
    n_prev = pairs.count()
    surv = pairs
    for rounds in range(1, max_rounds + 1):
        surv = (
            cur.filter(expr=f"support >= {bar}")
            .select_columns(["a", "b"])
            .materialize()
        )
        n_now = surv.count()
        if n_now == n_prev or n_now == 0:
            break
        n_prev = n_now
        cur = _support_of_pairs(surv, n_vertices).materialize()
    return support0, surv, rounds
