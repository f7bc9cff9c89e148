"""Strongly connected components (Orzan forward-backward coloring) —
exact-match tests vs networkx.strongly_connected_components."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.scc import canonical_labels, strongly_connected_components
from ppagerank_ray.graph.build import build_graph
from ppagerank_ray.sources.pages import synth_pages

nx = pytest.importorskip("networkx")


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _scc(src, dst, n, P) -> np.ndarray:
    labels, info = strongly_connected_components(_edges_ds(src, dst), n, P)
    assert info["phases"] >= 1
    return canonical_labels(labels)


def _nx_scc(src, dst, n) -> np.ndarray:
    g = nx.DiGraph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst))
    out = np.empty(n, np.int64)
    for comp in nx.strongly_connected_components(g):
        out[list(comp)] = min(comp)
    return out


def test_scc_hand_graph():
    # cycle {0,1,2}, chain into cycle {3,4}, isolated 5
    src = [0, 1, 2, 2, 3, 4]
    dst = [1, 2, 0, 3, 4, 3]
    labels = _scc(src, dst, 6, 2)
    assert labels.tolist() == [0, 0, 0, 3, 3, 5]


def test_scc_path_all_singletons():
    n = 12
    labels = _scc(np.arange(n - 1), np.arange(1, n), n, 3)
    np.testing.assert_array_equal(labels, np.arange(n))


def test_scc_reverse_path_all_singletons():
    # forces the one-root-per-phase worst-ish case (max id colors all)
    n = 12
    labels = _scc(np.arange(1, n), np.arange(n - 1), n, 3)
    np.testing.assert_array_equal(labels, np.arange(n))


def test_scc_big_cycle_one_component():
    n = 50
    labels = _scc(np.arange(n), (np.arange(n) + 1) % n, n, 4)
    np.testing.assert_array_equal(labels, np.zeros(n, np.int64))


@pytest.mark.parametrize("P", [1, 2, 4])
def test_scc_random_matches_networkx(P):
    rng = np.random.default_rng(17 + P)
    n, m = 200, 500  # sparse → rich SCC structure
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    np.testing.assert_array_equal(
        _scc(src, dst, n, P), _nx_scc(src, dst, n)
    )


def test_scc_random_dense_matches_networkx():
    rng = np.random.default_rng(99)
    n, m = 150, 1200  # denser → giant SCC
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    np.testing.assert_array_equal(_scc(src, dst, n, 3), _nx_scc(src, dst, n))


def test_scc_sf_tiny_matches_networkx(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    np.testing.assert_array_equal(
        _scc(src, dst, gt.n_vertices, 4), _nx_scc(src, dst, gt.n_vertices)
    )
