"""Checkpoint/resume: interrupted run + resume == uninterrupted run
(north-rule requirement; SURVEY.md §4 'Checkpoint / resume')."""

import json
import os

import numpy as np
import pytest

from ppagerank_ray.algos.pagerank import power_iteration
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_graph
from ppagerank_ray.sources.pages import synth_pages


@pytest.fixture(scope="module")
def graph(sf_tiny):
    return build_graph(synth_pages(sf_tiny))


def _fresh_engine(gt, P=3):
    e = VertexEngine(gt.n_vertices, P)
    e.load_directed(gt.edges)
    return e

def test_resume_reproduces_uninterrupted_run(graph, tmp_path):
    gt = graph
    cfg = PageRankConfig(alpha=0.85, tol=1e-8)
    # uninterrupted reference run
    e1 = _fresh_engine(gt)
    info1 = power_iteration(e1, cfg)
    x1 = e1.to_array("x")
    e1.shutdown()

    # interrupted: stop after 5 iterations (maxiter cap simulates the kill)
    ckpt = str(tmp_path / "ckpt")
    cfg5 = PageRankConfig(alpha=0.85, tol=1e-8, maxiter=5)
    e2 = _fresh_engine(gt)
    power_iteration(e2, cfg5, checkpoint_dir=ckpt, checkpoint_every=1)
    e2.shutdown()
    manifest = VertexEngine.read_manifest(ckpt)
    assert manifest["iteration"] == 5
    assert manifest["algorithm"] == "power"
    assert not manifest["converged"]

    # resume in a brand-new engine (simulates restart after failure)
    e3 = _fresh_engine(gt)
    info3 = power_iteration(e3, cfg, checkpoint_dir=ckpt, checkpoint_every=1)
    x3 = e3.to_array("x")
    e3.shutdown()

    assert info3["iteration"] == info1["iteration"]
    np.testing.assert_allclose(x3, x1, atol=1e-15)
    # manifest carries lineage + per-iteration metrics
    manifest = VertexEngine.read_manifest(ckpt)
    assert manifest["converged"]
    hist = manifest["history"]
    assert hist[-1]["residual_l1"] < 1e-8
    assert all("edges_per_sec" in h for h in hist)
    # round-3: SpMV shuffle volume + partition skew in the manifest
    # (SURVEY §4 observability — exact per iteration, pattern-invariant)
    assert manifest["shuffle"]["bytes_per_iteration_total"] > 0
    assert (
        manifest["shuffle"]["bytes_per_worker_max"]
        >= manifest["shuffle"]["bytes_per_worker_min"]
    )
    assert manifest["partition_edges_max"] >= manifest["partition_edges_min"] > 0
    # per-partition slice files exist for the final iteration
    it_dir = os.path.join(ckpt, f"iter_{manifest['iteration']:06d}")
    assert len(os.listdir(it_dir)) == manifest["num_partitions"]


def test_resume_of_converged_run_is_noop(graph, tmp_path):
    gt = graph
    ckpt = str(tmp_path / "ckpt2")
    cfg = PageRankConfig(alpha=0.85, tol=1e-6)
    e1 = _fresh_engine(gt)
    power_iteration(e1, cfg, checkpoint_dir=ckpt, checkpoint_every=2)
    e1.shutdown()
    e2 = _fresh_engine(gt)
    info = power_iteration(e2, cfg, checkpoint_dir=ckpt, checkpoint_every=2)
    e2.shutdown()
    assert info["converged"]


def test_resume_rejects_different_graph(graph, tmp_path):
    """Manifest carries an input fingerprint; resuming against a different
    edge set must fail loudly instead of silently mixing state."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    gt = graph
    ckpt = str(tmp_path / "ckpt3")
    e1 = _fresh_engine(gt)
    power_iteration(e1, PageRankConfig(maxiter=3, tol=1e-8),
                    checkpoint_dir=ckpt, checkpoint_every=1)
    e1.shutdown()
    # different graph, same vertex count
    other = rd.from_arrow(pa.Table.from_pydict({
        "src": np.arange(gt.n_vertices - 1, dtype=np.int64),
        "dst": np.arange(1, gt.n_vertices, dtype=np.int64),
        "weight": np.ones(gt.n_vertices - 1),
    }))
    e2 = VertexEngine(gt.n_vertices, 3)
    e2.load_directed(other)
    with pytest.raises(ValueError, match="different graph"):
        power_iteration(e2, PageRankConfig(tol=1e-8),
                        checkpoint_dir=ckpt, checkpoint_every=1)
    e2.shutdown()


def test_partitioned_output_resumes(graph, tmp_path):
    """Resumable sink: one dir per partition + _SUCCESS; rerun skips
    completed partitions and only rewrites missing ones."""
    import os

    import duckdb

    gt = graph
    out = str(tmp_path / "scores_out")
    e = _fresh_engine(gt, P=4)
    power_iteration(e, PageRankConfig(tol=1e-7))
    r1 = e.write_result_partitioned(out, "x", "score")
    assert r1 == {"written": 4, "skipped": 0}
    n, total = duckdb.sql(
        f"select count(*), sum(score) from '{out}/part_*/data.parquet'"
    ).fetchone()
    assert n == gt.n_vertices and abs(total - 1.0) < 1e-9
    # simulate a partially-failed run: one partition incomplete
    import shutil

    shutil.rmtree(os.path.join(out, "part_00002"))
    r2 = e.write_result_partitioned(out, "x", "score")
    assert r2 == {"written": 1, "skipped": 3}
    n2, _ = duckdb.sql(
        f"select count(*), sum(score) from '{out}/part_*/data.parquet'"
    ).fetchone()
    assert n2 == gt.n_vertices
    e.shutdown()


def test_resume_rejects_different_alpha(graph, tmp_path):
    gt = graph
    ckpt = str(tmp_path / "ckpt_alpha")
    e1 = _fresh_engine(gt)
    power_iteration(e1, PageRankConfig(alpha=0.85, maxiter=3, tol=1e-8),
                    checkpoint_dir=ckpt, checkpoint_every=1)
    e1.shutdown()
    e2 = _fresh_engine(gt)
    with pytest.raises(ValueError, match="alpha"):
        power_iteration(e2, PageRankConfig(alpha=0.9, tol=1e-8),
                        checkpoint_dir=ckpt, checkpoint_every=1)
    e2.shutdown()


def test_resume_rejects_same_shape_different_content(graph, tmp_path):
    """Same vertex AND edge counts, different edges: the content signature
    must still reject the resume (ADVICE round 1)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    gt = graph
    ckpt = str(tmp_path / "ckpt_content")
    e1 = _fresh_engine(gt)
    power_iteration(e1, PageRankConfig(maxiter=3, tol=1e-8),
                    checkpoint_dir=ckpt, checkpoint_every=1)
    e1.shutdown()
    et = gt.edges.to_pandas()
    # permute dst cyclically among edges: same counts, different content
    src = et["src"].to_numpy()
    dst = np.roll(et["dst"].to_numpy(), 1)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pad = gt.n_edges - len(src)  # keep the edge count identical
    src = np.concatenate([src, np.zeros(pad, np.int64)])
    dst = np.concatenate([dst, np.arange(1, pad + 1, dtype=np.int64)])
    other = rd.from_arrow(pa.Table.from_pydict(
        {"src": src, "dst": dst, "weight": np.ones(len(src))}
    ))
    e2 = VertexEngine(gt.n_vertices, 3)
    e2.load_directed(other)
    assert e2.n_edges == gt.n_edges  # shape-identical on counts
    with pytest.raises(ValueError, match="different graph"):
        power_iteration(e2, PageRankConfig(tol=1e-8),
                        checkpoint_dir=ckpt, checkpoint_every=1)
    e2.shutdown()
