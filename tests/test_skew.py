"""Skew handling (FIXTURES.md §3 zipf_hub): a hub owning ~20-30% of all
edges must (a) be split across several edge partitions by the balanced
partitioner, and (b) produce scores identical to the oracle — splitting must
preserve exact sums within float64 tolerance (SURVEY.md §7.4 item 5)."""

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.algos.pagerank import numpy_power_oracle, power_iteration
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine


def _zipf_hub_graph(n=2000, seed=42):
    """Zipf-ish outdegrees with vertex 0 a huge hub (~25% of edges)."""
    rng = np.random.default_rng(seed)
    outdeg = np.clip((1.0 / np.arange(1, n + 1)) * 40, 1, None).astype(np.int64)
    outdeg[0] = int(outdeg.sum() * 0.35)  # hub
    src = np.repeat(np.arange(n, dtype=np.int64), outdeg)
    dst = rng.integers(0, n, size=len(src)).astype(np.int64)
    # dedup (src,dst)
    key = src * n + dst
    uniq = np.unique(key)
    src, dst = uniq // n, uniq % n
    od = np.bincount(src, minlength=n).astype(np.float64)
    w = 1.0 / od[src]
    return src, dst, w, n


def test_hub_edges_split_across_partitions():
    src, dst, w, n = _zipf_hub_graph()
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst, "weight": w}))
    P = 4
    eng = VertexEngine(n, P)
    eng.load_directed(ds)
    stats = eng.partition_stats()
    counts = [s["directed_edges"] for s in stats]
    # balanced by construction: equal edge counts (±1 rounding)
    assert max(counts) - min(counts) <= 1
    # the hub's edges span more than one partition (its span includes src 0
    # in at least the first worker, and worker 0 holds ONLY part of them)
    hub_edges = int((src == 0).sum())
    assert hub_edges > counts[0] * 0.5  # hub alone overflows one partition's share
    spans = [s["src_span"] for s in stats]
    holders = [sp for sp in spans if sp[0] <= 0 < sp[1] or sp[0] == 0]
    assert spans[0][0] == 0  # worker 0 starts at the hub

    info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-10))
    x = eng.to_array("x")
    eng.shutdown()
    xo, deltas = numpy_power_oracle(src, dst, n, tol=1e-10)
    assert info["iteration"] == len(deltas)
    assert np.abs(x - xo).max() < 1e-12  # split hub sums are exact


def test_hub_results_match_across_partition_counts():
    src, dst, w, n = _zipf_hub_graph()
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst, "weight": w}))
    results = []
    for P in (1, 5):
        eng = VertexEngine(n, P)
        eng.load_directed(ds)
        power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-10))
        results.append(eng.to_array("x"))
        eng.shutdown()
    assert np.allclose(results[0], results[1], atol=1e-12)


def test_redistribute_wrows_balances_rows():
    """-matload_redistribute_wrows/_wnnz analogue (petsc_util.cc:1122-1128):
    with wrows=1, wnnz=0 the partitioner equalizes ROW spans, not edge
    counts — a graph whose edges all live in the first n/10 rows lands
    entirely in worker 0 at P=4 (its row quarter owns every edge), and the
    scores still match the numpy oracle exactly."""
    n = 1200
    rng = np.random.default_rng(3)
    src = rng.integers(0, n // 10, 4000).astype(np.int64)
    dst = rng.integers(0, n, 4000).astype(np.int64)
    key = src * n + dst
    uniq = np.unique(key)
    src, dst = uniq // n, uniq % n
    od = np.bincount(src, minlength=n).astype(np.float64)
    w = 1.0 / od[src]
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst, "weight": w}))

    eng = VertexEngine(n, 4, wrows=1, wnnz=0)
    eng.load_directed(ds)
    counts = [s["directed_edges"] for s in eng.partition_stats()]
    assert counts[0] == len(src) and sum(counts[1:]) == 0
    info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-10))
    x = eng.to_array("x")
    eng.shutdown()
    xo, _ = numpy_power_oracle(src, dst, n, tol=1e-10)
    assert np.abs(x - xo).max() < 1e-12


def test_redistribute_reference_default_results_match():
    """The reference's default weighting (wrows=1, wnnz=1) on the zipf-hub
    graph: scores identical to the numpy oracle and to the engine's own
    edge-count default — redistribution must never change answers."""
    src, dst, w, n = _zipf_hub_graph()
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst, "weight": w}))
    eng = VertexEngine(n, 4, wrows=1, wnnz=1)
    eng.load_directed(ds)
    counts = [s["directed_edges"] for s in eng.partition_stats()]
    assert sum(counts) == len(src) and all(c > 0 for c in counts)
    info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-10))
    x = eng.to_array("x")
    eng.shutdown()
    xo, deltas = numpy_power_oracle(src, dst, n, tol=1e-10)
    assert info["iteration"] == len(deltas)
    assert np.abs(x - xo).max() < 1e-12
