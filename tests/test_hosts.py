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
