"""Approximate neighborhood function via HyperLogLog max-merge
(HyperANF: P. Boldi, M. Rosa, S. Vigna, "HyperANF: approximating the
neighbourhood function of very large graphs on a budget", WWW 2011 —
the WebGraph-family diameter/ball-size algorithm; HLL estimator per
Flajolet et al. 2007 with the linear-counting small-range correction).

Each vertex holds an m-register HLL sketch of its ball B(v, t); round t
max-merges every neighbor's sketch:

    regs⁰(v) = HLL{v}
    regsᵗ(v) = byte-wise max(regsᵗ⁻¹(v), regsᵗ⁻¹(u) ∀ u ~ v)

At the fixpoint (≤ diameter + 1 rounds) sketch(v) estimates the size of
v's connected component. Max-merge is associative/commutative/idempotent
so results are IDENTICAL under any partitioning — tested at P ∈ {1,4}.

Engine mapping: registers pack 8 per int64 into `n_words` engine ivecs
("hll0"…), so every round reuses the cc_partials shuffle shape with a
byte-wise max kernel (view the gathered int64 slice as (n,8) uint8,
np.maximum.reduceat along axis 0) — the partial/combiner skew pattern
applies unchanged, with per-round cost n_words × a CC round. All hashes
are splitmix64 — deterministic across runs and partition counts.

Engine-only algorithm (SURVEY §2.9 family; the brief's "novel sketch"
custom-operator class). Approximate by construction → rows-only driver
query; pytest pins exact determinism across P and relative error vs
exact component sizes.
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.engine.vertex_engine import VertexEngine


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Rows of m uint8 registers → cardinality estimates (HLL with
    linear-counting small-range correction)."""
    m = regs.shape[1]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    e = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lin = m * np.log(m / np.maximum(zeros, 1).astype(np.float64))
    return np.where(small, lin, e)


def hyperanf(
    engine: VertexEngine,
    n_words: int = 4,
    seed: int = 0x5EED,
    max_rounds: int = 10_000,
) -> dict:
    """Runs to the sketch fixpoint; leaves the packed registers in ivecs
    'hll0'..'hll{n_words-1}'. Returns info incl. per-round global ball
    mass (Σ_v N̂(v,t) — the neighborhood function, whose deltas give the
    distance distribution). Requires engine.load_undirected(...) first.
    m = 8·n_words registers/vertex → rel. std ≈ 1.04/√m (~18% at m=32);
    raise n_words for tighter estimates, cost is linear in it."""
    names = [f"hll{w}" for w in range(n_words)]
    ray.get(
        [w.hll_init.remote(n_words, seed) for w in engine.workers]
    )
    nf: list[float] = [float(np.sum(ray.get(
        [w.hll_sum_estimates.remote(names) for w in engine.workers]
    )))]
    rounds = 0
    for rounds in range(1, max_rounds + 1):
        changed = 0
        for name in names:
            refs = [w.get_islice.remote(name) for w in engine.workers]
            gargs = engine._gather_args(refs, engine.u_spans)
            partial_mat = [
                w.hll_partials.options(num_returns=engine.P).remote(r, base)
                for w, (r, base) in zip(engine.workers, gargs)
            ]
            if engine.P == 1:
                partial_mat = [[m] for m in partial_mat]
            red = [
                engine.workers[q].hll_reduce.options(num_returns=2).remote(
                    [partial_mat[p][q] for p in range(engine.P)], name
                )
                for q in range(engine.P)
            ]
            changed += int(np.sum(ray.get([r[0] for r in red])))
        nf.append(float(np.sum(ray.get(
            [w.hll_sum_estimates.remote(names) for w in engine.workers]
        ))))
        if changed == 0:
            break
    return {
        "algorithm": "hyperanf",
        "rounds": rounds,
        "m": 8 * n_words,
        "neighborhood_function": nf,
    }


def ball_estimates(engine: VertexEngine, n_words: int = 4) -> np.ndarray:
    """Per-vertex cardinality estimates from the current hll ivecs
    (component-size estimates at the fixpoint), id-ordered."""
    words = [
        engine.to_array(f"hll{w}", integer=True) for w in range(n_words)
    ]
    regs = np.concatenate(
        [w.view(np.uint8).reshape(-1, 8) for w in words], axis=1
    )
    return hll_estimate(regs)
