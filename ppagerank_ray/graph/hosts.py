"""Host-level aggregation of the link graph.

Classic web-graph operation (the WebGraph framework's "host graph"):
collapse page vertices to their registered host (the authority component
of the url) and aggregate page edges into weighted host→host edges.
Engine-only breadth — the reference operates on pre-numbered matrices and
has no url semantics beyond loading (SURVEY.md §2.2/§2.4 families).

Scale shape mirrors graph.build's url→id mapping:

* V ≤ BROADCAST_MAX_VERTICES — the per-vertex host DICTIONARY (int32
  codes + one small name table) is built once, `ray.put` once, and every
  edge batch does two `np.take`s + a local (src_code·H + dst_code)
  pre-aggregate before ONE global int-key groupby. Hosts are ~3 orders
  smaller than pages, so the combiner collapses batches hard before the
  shuffle.
* above the gate — two bucketed hash joins (ops/joins.hash_join, int
  keys) attach src/dst hosts, then the same pre-aggregated groupby; no
  driver-side O(V) state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ppagerank_ray.graph.build import (
    BROADCAST_MAX_VERTICES,
    GraphTables,
    _vertex_url_array,
    shuffle_blocks,
)

_HOST_RE = r"^[a-z][a-z0-9+.\-]*://(?P<host>[^/]+)"


def host_of_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized url → host (authority) extraction; '' when the url has
    no scheme://host prefix (matching DuckDB regexp_extract's no-match).
    Both sides run the same RE2 pattern (pyarrow and DuckDB)."""
    ex = pc.extract_regex(urls, _HOST_RE)
    host = pc.struct_field(ex, ["host"])
    return pc.fill_null(host, "").combine_chunks() if isinstance(
        host, pa.ChunkedArray
    ) else pc.fill_null(host, "")


def vertex_hosts(vertices: rd.Dataset) -> rd.Dataset:
    """(id, url) → (id, host), streaming."""
    return vertices.map_batches(
        lambda t: pa.Table.from_pydict(
            {"id": t["id"], "host": host_of_urls(t["url"])}
        ),
        batch_format="pyarrow",
        batch_size=262144,
    )


def _host_codes(gt: GraphTables) -> tuple[np.ndarray, pa.Array]:
    """Dense per-vertex host codes + host name table (broadcast path)."""
    urls = _vertex_url_array(gt.vertices, gt.n_vertices)
    dic = host_of_urls(urls).dictionary_encode()
    return dic.indices.to_numpy().astype(np.int64), dic.dictionary


def host_edges(gt: GraphTables) -> pa.Table:
    """Weighted host graph (src_host, dst_host, n_edges), sorted. Output
    is host-pair-sized (≪ E); the edge stream is never materialized."""
    if gt.n_vertices <= BROADCAST_MAX_VERTICES:
        codes, names = _host_codes(gt)
        H = np.int64(len(names))
        code_ref = ray.put(codes)

        def to_host_keys(t: pa.Table) -> pa.Table:
            c = ray.get(code_ref)
            key = c[t["src"].to_numpy()] * H + c[t["dst"].to_numpy()]
            uk, cnt = np.unique(key, return_counts=True)
            return pa.Table.from_pydict({"key": uk, "n": cnt.astype(np.int64)})

        agg = (
            gt.edges.select_columns(["src", "dst"])
            .map_batches(to_host_keys, batch_format="pyarrow", batch_size=262144)
            .groupby("key")
            .sum("n")
        )
        tb = pa.concat_tables(
            [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
        )
        key = tb["key"].to_numpy()
        out = pa.Table.from_pydict(
            {
                "src_host": pc.take(names, pa.array(key // H)),
                "dst_host": pc.take(names, pa.array(key % H)),
                "n_edges": tb["sum(n)"],
            }
        )
    else:
        from ppagerank_ray.ops.joins import hash_join

        hosts = vertex_hosts(gt.vertices)
        j1 = hash_join(
            gt.edges.select_columns(["src", "dst"]), hosts, "src", "id"
        ).map_batches(
            lambda t: t.rename_columns(["src", "dst", "src_host"]),
            batch_format="pyarrow",
        )
        j2 = hash_join(j1, hosts, "dst", "id").map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "src_host": t["src_host"],
                    "dst_host": t["host"],
                    "n": np.ones(t.num_rows, np.int64),
                }
            ),
            batch_format="pyarrow",
        )
        agg = (
            j2.repartition(shuffle_blocks())
            .groupby(["src_host", "dst_host"])
            .sum("n")
        )
        tb = pa.concat_tables(
            [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
        )
        out = pa.Table.from_pydict(
            {
                "src_host": tb["src_host"],
                "dst_host": tb["dst_host"],
                "n_edges": tb["sum(n)"],
            }
        )
    idx = pc.sort_indices(
        out, sort_keys=[("src_host", "ascending"), ("dst_host", "ascending")]
    )
    return out.take(idx)


def mass_by_host(gt: GraphTables, scores: np.ndarray) -> pa.Table:
    """Σ per-vertex score per host, sorted by host — host-sized output.
    `scores` is an id-ordered per-vertex vector (what engine.to_array
    returns at query scale; the partitioned-result path feeds the same
    aggregate through hash_join + groupby above the broadcast gate)."""
    codes, names = _host_codes(gt)
    mass = np.bincount(codes, weights=scores, minlength=len(names))
    order = pc.sort_indices(names)
    return pa.Table.from_pydict(
        {
            "host": pc.take(names, order),
            "score": np.round(mass[order.to_numpy()], 6),
        }
    )


def host_pagerank(
    gt: GraphTables,
    alpha: float = 0.85,
    iters: int = 20,
    num_partitions: int = 4,
) -> pa.Table:
    """Weighted PageRank ON the host graph: collapse pages to hosts
    (host_edges, weight = n page links), row-normalize by WEIGHTED
    out-degree (normalize_edge_weights — the A2 weighted branch,
    ppagerank.cc:234-268), and power-iterate on the vertex engine. Output
    (host, score), fixed `iters` for oracle comparison.

    Partitioning assumption: hosts are ~3 orders of magnitude fewer than
    pages, and `host_edges` already returns a host-pair-sized driver
    table, so the host-id dictionary (sorted distinct hosts) is built
    driver-side under the same BROADCAST_MAX_VERTICES gate the rest of
    the host path uses; the engine then runs fully distributed."""
    from ppagerank_ray.algos.pagerank import power_iteration
    from ppagerank_ray.config import PageRankConfig
    from ppagerank_ray.engine.vertex_engine import VertexEngine
    from ppagerank_ray.graph.build import normalize_edge_weights

    he = host_edges(gt)  # (src_host, dst_host, n_edges), host-pair-sized
    _, names = _host_codes(gt)  # ALL hosts, incl. edge-less ones
    if len(names) > BROADCAST_MAX_VERTICES:  # not assert: survives python -O
        raise ValueError(
            f"host dictionary ({len(names)}) over BROADCAST_MAX_VERTICES "
            f"({BROADCAST_MAX_VERTICES}); rebuild with the distributed "
            "host-code path (host_edges hash-join branch)"
        )
    order = pc.sort_indices(names)
    hosts_sorted = pc.take(names, order)
    H = len(hosts_sorted)
    hid_src = pc.index_in(he["src_host"], hosts_sorted).to_numpy().astype(np.int64)
    hid_dst = pc.index_in(he["dst_host"], hosts_sorted).to_numpy().astype(np.int64)
    edges = rd.from_arrow(
        pa.Table.from_pydict(
            {
                "src": hid_src,
                "dst": hid_dst,
                "weight": he["n_edges"].to_numpy().astype(np.float64),
            }
        )
    )
    eng = VertexEngine(H, num_partitions=min(num_partitions, max(1, H)))
    eng.load_directed(normalize_edge_weights(edges, H))
    power_iteration(eng, PageRankConfig(alpha=alpha, tol=0.0, maxiter=iters))
    x = eng.to_array("x")
    eng.shutdown()
    return pa.Table.from_pydict(
        {"host": hosts_sorted, "score": np.round(x, 6)}
    )
