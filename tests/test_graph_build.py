"""Graph construction tests: sort-based ids, dedup, normalization weights."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from ppagerank_ray.graph.build import build_graph, build_undirected
from ppagerank_ray.sources.pages import (
    N_EXTERNAL,
    ext_url,
    hrefs_for_page,
    internal_dsts,
    n_documents,
    page_url,
    synth_pages,
)


@pytest.fixture(scope="module")
def graph_tiny(sf_tiny):
    return build_graph(synth_pages(sf_tiny)), n_documents(sf_tiny)


def _expected_edge_ids(nd: int) -> set[tuple[int, int]]:
    """Vertex id == page id; external e → nd + e (url sort order)."""
    out = set()
    for i in range(nd):
        for d in internal_dsts(i, nd):
            out.add((i, d))
        if i % 23 == 0:
            out.add((i, nd + (i % N_EXTERNAL)))
    return out


def test_vertex_ids_are_url_sort_ranks(graph_tiny):
    gt, nd = graph_tiny
    vt = gt.vertices.to_pandas().sort_values("id")
    assert gt.n_vertices == nd + N_EXTERNAL
    assert list(vt["id"]) == list(range(gt.n_vertices))
    # ids follow url sort order: page i ↔ id i, external e ↔ nd + e
    assert vt["url"].iloc[0] == page_url(0)
    assert vt["url"].iloc[nd - 1] == page_url(nd - 1)
    assert vt["url"].iloc[nd] == ext_url(0)
    assert list(vt["url"]) == sorted(vt["url"])


def test_edges_deduped_and_match_formula(graph_tiny):
    gt, nd = graph_tiny
    et = gt.edges.to_pandas()
    got = set(zip(et["src"], et["dst"]))
    assert got == _expected_edge_ids(nd)
    assert len(et) == len(got)  # dedup collapsed repeated hrefs


def test_weights_are_inverse_outdegree(graph_tiny):
    gt, _ = graph_tiny
    et = gt.edges.to_pandas()
    outdeg = et.groupby("src").size()
    for s, grp in et.groupby("src"):
        np.testing.assert_allclose(grp["weight"], 1.0 / outdeg[s], rtol=0, atol=0)
    # row-stochastic check: ‖P‖∞ == 1 (ppagerank.cc:113-117 sanity stat)
    row_sums = et.groupby("src")["weight"].sum()
    np.testing.assert_allclose(row_sums, 1.0, atol=1e-12)


def test_build_undirected(graph_tiny):
    gt, _ = graph_tiny
    et = gt.edges.to_pandas()
    directed = set(zip(et["src"], et["dst"]))
    expected = set()
    for s, d in directed:
        if s != d:
            expected.add((s, d))
            expected.add((d, s))
    ut = build_undirected(gt.edges).to_pandas()
    got = list(zip(ut["src"], ut["dst"]))
    assert set(got) == expected
    assert len(got) == len(expected)  # no duplicate undirected rows


def test_fast_build_equals_generic(sf_tiny):
    from ppagerank_ray.graph.build import build_graph_fast, build_graph_generic

    g1 = build_graph_generic(synth_pages(sf_tiny))
    g2 = build_graph_fast(synth_pages(sf_tiny))
    assert (g1.n_vertices, g1.n_edges) == (g2.n_vertices, g2.n_edges)
    v1 = g1.vertices.to_pandas().sort_values("id").reset_index(drop=True)
    v2 = g2.vertices.to_pandas().sort_values("id").reset_index(drop=True)
    assert v1.equals(v2)
    e1 = g1.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    e2 = g2.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert (e1[["src", "dst"]].values == e2[["src", "dst"]].values).all()
    np.testing.assert_array_equal(e1["weight"], e2["weight"])
    # fast path output is globally (src,dst)-sorted across blocks
    assert g2.edges_sorted
    raw = g2.edges.to_pandas()
    assert (raw[["src", "dst"]].values == e2[["src", "dst"]].values).all()


def test_hash_join_matches_broadcast_mapping(sf_tiny):
    """Force the >BROADCAST_MAX_VERTICES path and compare to broadcast."""
    from ppagerank_ray.ops.joins import map_links_via_hash_join
    from ppagerank_ray.stages.extract import extract_links

    pages = synth_pages(sf_tiny)
    gt = build_graph(pages)
    links = extract_links(synth_pages(sf_tiny))
    got = map_links_via_hash_join(links, gt.vertices, n_buckets=7).to_pandas()
    got_pairs = sorted(zip(got["src"], got["dst"]))
    et = gt.edges.to_pandas()
    # hash-join output keeps duplicates; compare the deduped sets
    assert sorted(set(got_pairs)) == sorted(zip(et["src"], et["dst"]))


def test_normalize_edge_weights_join_path_matches_broadcast(monkeypatch):
    import ray.data as rd
    import ppagerank_ray.graph.build as gb

    rng = np.random.default_rng(1)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    w = rng.uniform(0.1, 2.0, 300)
    ds = rd.from_arrow(
        pa.Table.from_pydict({"src": src, "dst": dst, "weight": w})
    )
    dense = (
        gb.normalize_edge_weights(ds, 40)
        .to_pandas()
        .sort_values(["src", "dst", "weight"])
        .reset_index(drop=True)
    )
    monkeypatch.setattr(gb, "BROADCAST_MAX_VERTICES", 1)
    joined = (
        gb.normalize_edge_weights(ds, 40)
        .to_pandas()
        .sort_values(["src", "dst", "weight"])
        .reset_index(drop=True)
    )
    assert (dense[["src", "dst"]].values == joined[["src", "dst"]].values).all()
    np.testing.assert_allclose(dense["weight"], joined["weight"], rtol=1e-12)
    # row sums are 1 for rows with entries
    sums = dense.groupby("src")["weight"].sum()
    np.testing.assert_allclose(sums, 1.0, rtol=1e-12)


def test_fast_build_external_guard_falls_back(sf_tiny, monkeypatch):
    import ppagerank_ray.graph.build as gb

    monkeypatch.setattr(gb, "EXT_MAX_URLS", 0)
    with pytest.raises(gb.FastPathUnavailable):
        gb.build_graph_fast(synth_pages(sf_tiny))
    gt = gb.build_graph(synth_pages(sf_tiny))  # falls back to generic
    assert gt.n_edges > 0 and not gt.edges_sorted


def test_fast_build_vertex_gate_falls_back(sf_tiny, monkeypatch):
    """Round-2 verdict item 1: above BROADCAST_MAX_VERTICES the fast path
    must refuse (it builds O(V) driver arrays) and build_graph must fall
    back to the generic hash-join path with identical GraphTables."""
    import ppagerank_ray.graph.build as gb

    base = gb.build_graph(synth_pages(sf_tiny))
    monkeypatch.setattr(gb, "BROADCAST_MAX_VERTICES", 3)
    with pytest.raises(gb.FastPathUnavailable):
        gb.build_graph_fast(synth_pages(sf_tiny))
    gt = gb.build_graph(synth_pages(sf_tiny))  # falls back to generic
    assert not gt.edges_sorted
    assert (gt.n_vertices, gt.n_edges) == (base.n_vertices, base.n_edges)
    v1 = base.vertices.to_pandas().sort_values("id").reset_index(drop=True)
    v2 = gt.vertices.to_pandas().sort_values("id").reset_index(drop=True)
    assert v1.equals(v2)
    e1 = base.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    e2 = gt.edges.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert (e1[["src", "dst"]].values == e2[["src", "dst"]].values).all()
    np.testing.assert_allclose(e1["weight"], e2["weight"], rtol=1e-12)


def test_sample_edges_deterministic_and_calibrated():
    """Bernoulli edge sample: invariant to partitioning, fraction within
    binomial tolerance, pure function of the edge key."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ppagerank_ray.graph.build import sample_edges

    rng = np.random.default_rng(41)
    n = 5000
    src = rng.integers(0, 1000, n).astype(np.int64)
    dst = rng.integers(0, 1000, n).astype(np.int64)
    t = pa.Table.from_pydict({"src": src, "dst": dst})
    a = (
        sample_edges(rd.from_arrow(t), 0.3, seed=2)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    b = (
        sample_edges(rd.from_arrow(t).repartition(7), 0.3, seed=2)
        .to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    )
    assert a.equals(b)
    frac = len(a) / n
    assert abs(frac - 0.3) < 0.03  # ~4.6 sigma of Binomial(5000, 0.3)
    c = sample_edges(rd.from_arrow(t), 0.3, seed=3).to_pandas()
    assert not a.equals(
        c.sort_values(["src", "dst"]).reset_index(drop=True)
    )  # seed changes the sample


def test_sample_edges_filter_equals_in_sample_flag(sf_tiny):
    """graph/build.sample_edges' filtered subset must equal the rows the
    edges query flags with in_sample=1 (the round-4 registry
    consolidation replaced the sampled_edges query with that flag)."""
    import __ray_entry__ as entry
    from ppagerank_ray.graph.build import sample_edges

    flagged = entry._q_edges(sf_tiny).to_pandas()
    filtered = sample_edges(
        entry._graph(sf_tiny).edges,
        entry.SAMPLE_FRACTION,
        seed=entry.SAMPLE_SEED,
    ).to_pandas()
    keep = (
        flagged[flagged["in_sample"] == 1][["src", "dst"]]
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    filt = filtered.sort_values(["src", "dst"]).reset_index(drop=True)
    assert keep.equals(filt)
    assert 0 < len(filt) < len(flagged)


def test_fast_path_lookup_modes_identical(sf_tiny, monkeypatch):
    """The size-gated url-lookup modes (index_in vs packed searchsorted)
    must produce identical graphs — forcing the packed mode at fixture
    scale keeps the >2M-url path covered."""
    import ppagerank_ray.graph.build as B
    from ppagerank_ray.sources.pages import synth_pages

    g_hash = B.build_graph_fast(synth_pages(sf_tiny))
    e_hash = g_hash.edges.to_pandas().sort_values(["src", "dst"]).reset_index(
        drop=True
    )
    monkeypatch.setattr(B, "URL_LOOKUP_HASH_MAX", 0)
    g_packed = B.build_graph_fast(synth_pages(sf_tiny))
    e_packed = (
        g_packed.edges.to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    assert g_hash.n_vertices == g_packed.n_vertices
    assert e_hash.equals(e_packed)
