"""Graph construction: urls → vertex ids → weighted edge table.

The reference gets integer vertex ids for free (BSMAT/BVGraph inputs are
pre-numbered, petsc_util.cc:560-608 / 1004-1031); our ids are *derived* from
urls, and must be reproducible run-to-run and across cluster sizes
(SURVEY.md §7.4 item 4), so assignment is sort-based: id = rank of url in the
globally sorted distinct-url order.

Normalization semantics follow MatNormalizeForPageRank
(/root/reference/ppagerank.cc:169-274, non-transposed branch): every edge of
src u gets weight 1/outdeg(u); rows with outdeg 0 (dangling) simply have no
edges — the dangling indicator is implicit, matching the reference's
implicit d'x trick (ppagerank.cc:694-715).

Scale notes: the url→id map and the outdegree table are broadcast
(ray.put once, pyarrow `index_in` per batch — no shuffle) below
`BROADCAST_MAX_VERTICES`; above it the same mapping runs as a partitioned
hash join (ops/joins.py). Everything else is groupby/sort — Ray Data's
shuffle provides the transport that MPI_Scatterv provides in the reference
(petsc_util.cc:615-628).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ppagerank_ray.stages.extract import extract_links

BROADCAST_MAX_VERTICES = 50_000_000  # beyond this, use the partitioned hash join


@dataclass
class GraphTables:
    vertices: rd.Dataset  # (id: int64, url: string), id dense 0..V-1 in url sort order
    edges: rd.Dataset  # (src: int64, dst: int64, weight: float64), deduped
    n_vertices: int
    n_edges: int


@ray.remote
def _block_nrows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _attach_ids(t: pa.Table, offset: int) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + t.num_rows, dtype=np.int64))
    return pa.Table.from_arrays([ids, t["url"]], names=["id", "url"])


def sort_assign_ids(urls: rd.Dataset) -> rd.Dataset:
    """Distinct-url Dataset → (id, url) with id = global url sort rank.

    Ray Data has no zipWithIndex; this is the standard two-pass construction:
    global sort, per-block row counts (parallel, metadata-sized on the
    driver), prefix-sum offsets, then a parallel per-block id attach. Only
    O(#blocks) ints ever reach the driver.
    """
    sorted_urls = urls.sort("url")
    refs = sorted_urls.to_arrow_refs()
    counts = ray.get([_block_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out_refs = [
        _attach_ids.remote(r, int(off))
        for r, off, c in zip(refs, offsets, counts)
        if c > 0
    ]
    return rd.from_arrow_refs(out_refs)


def _distinct(ds: rd.Dataset, col: str) -> rd.Dataset:
    # groupby(col).count() is Ray Data's scalable distinct (hash shuffle);
    # ds.unique() would collect values to the driver.
    return ds.groupby(col).count().select_columns([col])


def build_vertices(pages: rd.Dataset, links: rd.Dataset) -> rd.Dataset:
    """Vertex table = distinct(page urls ∪ link target urls), sort-ranked."""
    page_urls = pages.select_columns(["url"])
    dst_urls = links.select_columns(["dst_url"]).map_batches(
        lambda t: t.rename_columns(["url"]), batch_format="pyarrow"
    )
    return sort_assign_ids(_distinct(page_urls.union(dst_urls), "url"))


def _vertex_url_array(vertices: rd.Dataset, n_vertices: int) -> pa.Array:
    """Materialize url-by-id (broadcast side). Blocks from sort_assign_ids
    arrive in id order; re-sort defensively by id."""
    tbl = pa.concat_tables(
        [t for t in ray.get(vertices.to_arrow_refs()) if t.num_rows]
    ).combine_chunks()
    tbl = tbl.sort_by("id")
    assert tbl.num_rows == n_vertices
    return tbl["url"].combine_chunks()


def map_links_to_ids(
    links: rd.Dataset, vertices: rd.Dataset, n_vertices: int
) -> rd.Dataset:
    """(src_url, dst_url) → (src, dst) int64 via broadcast lookup.

    `pc.index_in` against the id-ordered url array is a vectorized hash
    lookup; position == vertex id by construction. The reference never needs
    this join (pre-numbered input); it is the engine's analogue of BSMAT's
    row/col decode (petsc_util.cc:560-575) including its bounds check —
    a url that misses the vertex table would surface as a null here.
    """
    if n_vertices > BROADCAST_MAX_VERTICES:
        raise NotImplementedError(
            "partitioned hash-join id mapping: see ops/joins.py (wire-up TODO)"
        )
    url_ref = ray.put(_vertex_url_array(vertices, n_vertices))

    def lookup(t: pa.Table) -> pa.Table:
        value_set = ray.get(url_ref)
        src = pc.index_in(t["src_url"], value_set=value_set).cast(pa.int64())
        dst = pc.index_in(t["dst_url"], value_set=value_set).cast(pa.int64())
        if src.null_count or dst.null_count:
            raise ValueError("link endpoint missing from vertex table")
        return pa.Table.from_arrays([src, dst], names=["src", "dst"])

    return links.map_batches(lookup, batch_format="pyarrow", batch_size=65536)


def dedup_edges(edge_ids: rd.Dataset) -> rd.Dataset:
    """Collapse duplicate (src, dst) pairs — local pre-dedup per batch, then
    the global groupby shuffle on the already-shrunk stream."""
    local = edge_ids.map_batches(
        lambda t: t.group_by(["src", "dst"]).aggregate([]),
        batch_format="pyarrow",
        batch_size=262144,
    )
    return local.groupby(["src", "dst"]).count().select_columns(["src", "dst"])


def attach_weights(edges: rd.Dataset, n_vertices: int) -> rd.Dataset:
    """weight = 1/outdeg(src) — MatNormalizeForPageRank semantics
    (ppagerank.cc:252-268: scale each row by 1/rowsum; unweighted graph ⇒
    rowsum == outdegree; dangling rows stay zero / absent)."""
    outdeg_tbl = edges.groupby("src").count()
    if n_vertices > BROADCAST_MAX_VERTICES:
        raise NotImplementedError("partitioned weight join: see ops/joins.py")
    parts = [t for t in ray.get(outdeg_tbl.to_arrow_refs()) if t.num_rows]
    outdeg = np.zeros(n_vertices, dtype=np.float64)
    for t in parts:
        outdeg[t["src"].to_numpy()] = t["count()"].to_numpy()
    inv = np.zeros(n_vertices, dtype=np.float64)
    nz = outdeg > 0
    inv[nz] = 1.0 / outdeg[nz]
    inv_ref = ray.put(inv)

    def attach(t: pa.Table) -> pa.Table:
        w = ray.get(inv_ref)[t["src"].to_numpy()]
        return t.append_column("weight", pa.array(w, type=pa.float64()))

    return edges.map_batches(attach, batch_format="pyarrow", batch_size=262144)


def build_graph(pages: rd.Dataset) -> GraphTables:
    """pages → GraphTables. Full lifecycle per SURVEY.md §3 engine mapping."""
    links = extract_links(pages)
    vertices = build_vertices(pages, links).materialize()
    n_vertices = vertices.count()
    edge_ids = map_links_to_ids(links, vertices, n_vertices)
    edges = dedup_edges(edge_ids)
    edges = attach_weights(edges, n_vertices).materialize()
    return GraphTables(
        vertices=vertices,
        edges=edges,
        n_vertices=n_vertices,
        n_edges=edges.count(),
    )


def build_undirected(edges: rd.Dataset) -> rd.Dataset:
    """Directed (src,dst[,weight]) → distinct undirected pairs, both
    directions emitted, self-loops dropped. Input to components / label
    propagation / triangles (SURVEY.md §2.9 engine-only algorithms)."""

    def canon(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        lo = np.minimum(s, d)
        hi = np.maximum(s, d)
        return pa.Table.from_pydict({"src": lo, "dst": hi})

    pairs = (
        edges.select_columns(["src", "dst"])
        .map_batches(canon, batch_format="pyarrow", batch_size=262144)
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy()
        d = t["dst"].to_numpy()
        return pa.Table.from_pydict(
            {
                "src": np.concatenate([s, d]),
                "dst": np.concatenate([d, s]),
            }
        )

    return pairs.map_batches(both_dirs, batch_format="pyarrow", batch_size=262144)
