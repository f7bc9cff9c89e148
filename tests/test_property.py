"""Property-based conformance: random graphs → engine == oracle.

hypothesis generates adversarial small graphs (self-loops, dangling
vertices, isolated vertices, duplicate edges); the engine must match the
transliterated numpy oracles exactly-ish on every one of them.
"""

import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ppagerank_ray.algos.components import (
    connected_components,
    numpy_cc_oracle,
    numpy_lp_oracle,
    label_propagation,
)
from ppagerank_ray.algos.pagerank import numpy_power_oracle, power_iteration
from ppagerank_ray.algos.triangles import numpy_triangle_oracle, triangle_count
from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine
from ppagerank_ray.graph.build import build_undirected


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    m = draw(st.integers(min_value=0, max_value=120))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            min_size=m,
            max_size=m,
        )
    )
    return n, edges


def _edge_ds(n, edges):
    if edges:
        key = sorted({a * n + b for a, b in edges})
        src = np.array([k // n for k in key], dtype=np.int64)
        dst = np.array([k % n for k in key], dtype=np.int64)
    else:
        src = np.empty(0, np.int64)
        dst = np.empty(0, np.int64)
    od = np.bincount(src, minlength=n).astype(np.float64)
    w = 1.0 / od[src] if len(src) else np.empty(0, np.float64)
    return (
        rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst, "weight": w})),
        src,
        dst,
    )


_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(g=graphs())
@_SETTINGS
def test_pagerank_property(g):
    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    eng = VertexEngine(n, 3)
    eng.load_directed(ds)
    info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-9))
    x = eng.to_array("x")
    eng.shutdown()
    xo, deltas = numpy_power_oracle(src, dst, n, tol=1e-9)
    assert info["iteration"] == len(deltas)
    assert np.abs(x - xo).max() < 1e-12


@given(g=graphs())
@_SETTINGS
def test_components_and_lp_property(g):
    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    und = build_undirected(ds)
    ut = und.to_pandas()
    if "src" in ut.columns:
        us, ud = ut["src"].to_numpy(), ut["dst"].to_numpy()
    else:  # empty dataset loses its schema through to_pandas
        us = ud = np.empty(0, np.int64)
    eng = VertexEngine(n, 2)
    eng.load_undirected(und)
    connected_components(eng)
    labels = eng.to_array("label", integer=True)
    assert np.array_equal(labels, numpy_cc_oracle(us, ud, n))
    label_propagation(eng, num_rounds=3)
    lp = eng.to_array("label", integer=True)
    eng.shutdown()
    assert np.array_equal(lp, numpy_lp_oracle(us, ud, n, rounds=3))


@given(g=graphs())
@_SETTINGS
def test_triangles_property(g):
    n, edges = g
    ds, src, dst = _edge_ds(n, edges)
    assert triangle_count(ds, n) == numpy_triangle_oracle(src, dst)
