"""Connected components & label propagation over the undirected edge Dataset.

Engine-only algorithms required by the north rule (no reference
implementation — SURVEY.md §2.9 'Engine-only algorithms'): semantics are the
standard definitions, validated against networkx in tests.

* Connected components: synchronous min-label propagation to fixpoint —
  label(v) ← min(label(v), min over undirected neighbors u of label(u)),
  init label(v) = v. Converges to component = min vertex id in the
  component in ≤ diameter rounds; exactness is integer, no tolerance.
* Label propagation: synchronous neighbor-mode — label'(v) = the most
  frequent label among v's undirected neighbors (distinct-edge multiset,
  self-loops excluded), ties broken by the smallest label, isolated
  vertices keep their label. Deterministic by construction; run either a
  fixed number of rounds (oracle-comparable) or to fixpoint.

Both reuse the engine's partial-aggregate shuffle: workers emit sparse
per-destination-partition partials (min / (label,count) pairs) — the same
combiner-before-shuffle pattern the north rule requires for skew.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def _label_round(engine: VertexEngine, kind: str) -> int:
    """One synchronous round; returns number of labels changed."""
    label_refs = [w.get_islice.remote("label") for w in engine.workers]
    gargs = engine._gather_args(label_refs, engine.u_spans)
    if kind == "cc":
        partial_mat = [
            w.cc_partials.options(num_returns=engine.P).remote(refs, base)
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
    else:
        partial_mat = [
            w.lp_partials.options(num_returns=engine.P).remote(refs, base, engine.V)
            for w, (refs, base) in zip(engine.workers, gargs)
        ]
    if engine.P == 1:
        partial_mat = [[m] for m in partial_mat]
    if kind == "cc":
        red = [
            engine.workers[q].cc_reduce.options(num_returns=2).remote(
                [partial_mat[p][q] for p in range(engine.P)]
            )
            for q in range(engine.P)
        ]
    else:
        red = [
            engine.workers[q].lp_reduce.options(num_returns=2).remote(
                [partial_mat[p][q] for p in range(engine.P)], engine.V
            )
            for q in range(engine.P)
        ]
    return int(np.sum(ray.get([r[0] for r in red])))


def connected_components(engine: VertexEngine, max_rounds: int = 10_000) -> dict:
    """Requires engine.load_undirected(...) first. Exact fixpoint."""
    ray.get([w.ivec_init_ids.remote("label") for w in engine.workers])
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        changed = _label_round(engine, "cc")
        if changed == 0:
            break
    return {"algorithm": "cc", "rounds": rounds}


def label_propagation(
    engine: VertexEngine, num_rounds: int = 0, max_rounds: int = 100
) -> dict:
    """num_rounds > 0: exactly that many synchronous rounds (deterministic,
    SQL-oracle-comparable). num_rounds == 0: run until fixpoint or
    max_rounds (mode ties can oscillate; the cap is standard practice)."""
    ray.get([w.ivec_init_ids.remote("label") for w in engine.workers])
    if num_rounds > 0:
        for _ in range(num_rounds):
            _label_round(engine, "lp")
        return {"algorithm": "lp", "rounds": num_rounds}
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        changed = _label_round(engine, "lp")
        if changed == 0:
            break
    return {"algorithm": "lp", "rounds": rounds}


# ---------------------------------------------------------------------------
# NumPy oracles for tests
# ---------------------------------------------------------------------------


def numpy_cc_oracle(und_src: np.ndarray, und_dst: np.ndarray, n: int) -> np.ndarray:
    labels = np.arange(n, dtype=np.int64)
    while True:
        incoming = labels.copy()
        if len(und_src):
            np.minimum.at(incoming, und_dst, labels[und_src])
        new = np.minimum(labels, incoming)
        if np.array_equal(new, labels):
            return labels
        labels = new


def numpy_lp_oracle(
    und_src: np.ndarray, und_dst: np.ndarray, n: int, rounds: int
) -> np.ndarray:
    labels = np.arange(n, dtype=np.int64)
    for _ in range(rounds):
        new = labels.copy()
        if len(und_src):
            keys = und_dst.astype(np.int64) * n + labels[und_src]
            uk, uc = np.unique(keys, return_counts=True)
            dsts, labs = uk // n, uk % n
            sel = np.lexsort((labs, -uc, dsts))
            d_s, l_s = dsts[sel], labs[sel]
            first = np.concatenate([[0], np.flatnonzero(np.diff(d_s)) + 1])
            new[d_s[first]] = l_s[first]
        labels = new
    return labels
