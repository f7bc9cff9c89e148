"""Host-level link-graph aggregation (graph/hosts.py): extraction edge
cases, broadcast vs hash-join path equivalence, mass aggregation."""

import numpy as np
import pyarrow as pa

import ppagerank_ray.graph.hosts as H
from ppagerank_ray.graph.build import build_graph
from ppagerank_ray.sources.pages import synth_pages


def test_host_of_urls_cases():
    urls = pa.array(
        [
            "https://a.example/x",
            "http://b.example",
            "https://a.example/deep/path?q=1",
            "ftp://files.example/f",
            "no-scheme-url",
            "",
        ]
    )
    assert H.host_of_urls(urls).to_pylist() == [
        "a.example",
        "b.example",
        "a.example",
        "files.example",
        "",
        "",
    ]


def test_host_edges_paths_agree(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    fast = H.host_edges(gt)
    saved = H.BROADCAST_MAX_VERTICES
    try:
        H.BROADCAST_MAX_VERTICES = 0  # force the bucketed hash-join path
        slow = H.host_edges(gt)
    finally:
        H.BROADCAST_MAX_VERTICES = saved
    assert fast.equals(slow)
    assert int(pa.compute.sum(fast["n_edges"]).as_py()) == gt.n_edges
    hosts = set(fast["src_host"].to_pylist()) | set(fast["dst_host"].to_pylist())
    assert "pages.example" in hosts


def test_mass_by_host_partitions_total(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    rng = np.random.default_rng(3)
    scores = rng.random(gt.n_vertices)
    m = H.mass_by_host(gt, scores)
    assert abs(float(pa.compute.sum(m["score"]).as_py()) - scores.sum()) < 1e-4
    # hosts sorted, distinct
    hs = m["host"].to_pylist()
    assert hs == sorted(hs) and len(set(hs)) == len(hs)


def test_host_pagerank_matches_numpy(sf_tiny):
    """Weighted PageRank on the host graph vs an independent numpy oracle
    (weights = page-link counts, row-normalized by weighted out-degree,
    per-iteration (1-sum)/n dangling+teleport shift)."""
    gt = build_graph(synth_pages(sf_tiny))
    out = H.host_pagerank(gt, alpha=0.85, iters=20)
    hosts = out["host"].to_pylist()
    x = np.asarray(out["score"])
    assert abs(x.sum() - 1.0) < 1e-4  # 6-dp rounded probability vector

    he = H.host_edges(gt)
    hid = {h: i for i, h in enumerate(hosts)}
    s = np.array([hid[h] for h in he["src_host"].to_pylist()])
    d = np.array([hid[h] for h in he["dst_host"].to_pylist()])
    w = he["n_edges"].to_numpy().astype(np.float64)
    n = len(hosts)
    wsum = np.bincount(s, weights=w, minlength=n)
    p = w / wsum[s]
    x0 = np.full(n, 1.0 / n)
    for _ in range(20):
        ax = 0.85 * np.bincount(d, weights=p * x0[s], minlength=n)
        x0 = ax + (1.0 - ax.sum()) / n
    assert np.abs(x - np.round(x0, 6)).max() <= 1e-6
