"""k-core decomposition — exact-match tests vs networkx.core_number
(h-index iteration, SURVEY.md §2.9 engine-only algorithm family)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ppagerank_ray.algos.kcore import kcore_decomposition
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_graph, build_undirected
from ppagerank_ray.sources.pages import synth_pages


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.Table.from_pydict(
            {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64)}
        )
    )


def _engine_cores(src, dst, n, P) -> np.ndarray:
    engine = VertexEngine(n, P)
    engine.load_undirected(build_undirected(_edges_ds(src, dst)))
    info = kcore_decomposition(engine)
    assert info["rounds"] >= 1
    cores = engine.to_array("core", integer=True)
    engine.shutdown()
    return cores


def _nx_cores(src, dst, n) -> np.ndarray:
    nx = pytest.importorskip("networkx")
    g = nx.Graph()
    g.add_nodes_from(range(n))
    g.add_edges_from((int(a), int(b)) for a, b in zip(src, dst) if a != b)
    cn = nx.core_number(g)
    return np.array([cn[v] for v in range(n)], dtype=np.int64)


def test_kcore_hand_graph():
    # triangle {0,1,2} (2-core) + pendant 3 on 0 (1-core) + isolated 4
    src = np.array([0, 1, 2, 0])
    dst = np.array([1, 2, 0, 3])
    cores = _engine_cores(src, dst, 5, 2)
    assert cores.tolist() == [2, 2, 2, 1, 0]


def test_kcore_clique_with_tail():
    # K5 (4-core) chained to a path 5-6-7 (1-core)
    src, dst = [], []
    for a in range(5):
        for b in range(a + 1, 5):
            src.append(a)
            dst.append(b)
    src += [4, 5, 6]
    dst += [5, 6, 7]
    cores = _engine_cores(np.array(src), np.array(dst), 8, 3)
    assert cores.tolist() == [4, 4, 4, 4, 4, 1, 1, 1]


@pytest.mark.parametrize("P", [1, 2, 4])
def test_kcore_random_matches_networkx(P):
    rng = np.random.default_rng(7 + P)
    n = 300
    m = 1200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    cores = _engine_cores(src, dst, n, P)
    np.testing.assert_array_equal(cores, _nx_cores(src, dst, n))


def test_kcore_sf_tiny_matches_networkx(sf_tiny):
    gt = build_graph(synth_pages(sf_tiny))
    et = gt.edges.to_pandas()
    src, dst = et["src"].to_numpy(), et["dst"].to_numpy()
    engine = VertexEngine(gt.n_vertices, 4)
    engine.load_undirected(build_undirected(gt.edges))
    kcore_decomposition(engine)
    cores = engine.to_array("core", integer=True)
    engine.shutdown()
    np.testing.assert_array_equal(cores, _nx_cores(src, dst, gt.n_vertices))
