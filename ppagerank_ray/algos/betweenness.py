"""Betweenness centrality (Brandes 2001) over the vertex engine —
level-synchronized, expressed entirely in engine primitives.

For each source s (all vertices = exact; a sample = the standard unbiased
estimator, scaled by V/|S|):

1. hop distances from s — the existing BFS fixpoint (`bfs_distances`,
   undirected rounds);
2. shortest-path counts σ by ascending level: σ_L = SpMV(σ·[dist = L−1])
   masked to [dist = L] — the symmetrized DIRECTED edge load makes the
   engine's SpMV the undirected adjacency multiply;
3. dependencies δ by descending level:
   δ_L += σ · SpMV([dist = L+1]·(1+δ)/σ) masked to [dist = L]
   (Brandes' accumulation, one SpMV per level).

Every per-level op is a fused masked-BLAS worker method (vec_mask_eq /
vec_add_masked / vec_ratio_masked / vec_mul_add_masked) — no driver-side
vectors; the driver holds only scalars (level bounds, per-seed δ[s]).
Cost: O(levels) SpMV rounds per source — the textbook parallel Brandes
schedule. σ counts are float64 (exact below 2^53 paths, documented).

No reference analogue (engine-only breadth like HITS/Katz/kcore).
"""

from __future__ import annotations

import numpy as np
import ray

from ppagerank_ray.algos.structure import bfs_distances
from ppagerank_ray.engine.vertex_engine import VertexEngine


WAVE = 8  # seeds per multi-source wave (k rows per exchange)


def betweenness(
    engine: VertexEngine,
    seeds=None,
    out: str = "bc",
    wave: int = WAVE,
) -> dict:
    """Accumulate Brandes dependencies into vec `out`. seeds=None uses
    every vertex (exact betweenness; undirected pair counts appear twice —
    divide by 2 for the textbook value, which `betweenness_table` does).
    Requires BOTH load_undirected (BFS rounds) and load_directed over the
    SAME symmetrized edge table (SpMV).

    Seeds are processed `wave` at a time (round-4 multi-source batching):
    dist/σ/δ are (k, ·) matrices worker-side, so each level's masked SpMV
    and each BFS min-plus exchange serves ALL k seeds in one driver
    round-trip — cutting the per-seed barrier chain ~k× for the sampled
    estimator. Per-seed arithmetic is unchanged (rows are independent);
    only the bc accumulation order differs (wave sums), within float
    associativity of the sequential version."""
    W = engine.workers
    V = engine.V
    if seeds is None:
        seeds = range(V)
    seeds = [int(s) for s in seeds]

    def wall(fn, *args):
        ray.get([getattr(w, fn).remote(*args) for w in W])

    wall("vec_set_scalar", out, 0.0)
    total_rounds = 0
    for w0 in range(0, len(seeds), wave):
        batch = np.asarray(seeds[w0 : w0 + wave], np.int64)
        info = engine.ms_bfs(batch)
        total_rounds += info["rounds"]
        lmax = int(np.max(ray.get([w.ms_row_max_lt.remote(V) for w in W])))
        # σ by ascending level (rows whose own eccentricity is below the
        # wave lmax just mask to zero at the deeper levels)
        wall("ms_set_scalar", "sig", 0.0)
        wall("ms_set_entries", "sig", batch, 1.0)
        for level in range(1, lmax + 1):
            wall("ms_mask_eq", "tmp", "sig", level - 1)
            engine.ms_spmv("tmp", "y")
            wall("ms_add_masked", "sig", "y", level)
        # δ by descending level
        wall("ms_set_scalar", "del", 0.0)
        for level in range(lmax - 1, -1, -1):
            wall("ms_ratio_masked", "tmp", 1.0, "del", "sig", level + 1)
            engine.ms_spmv("tmp", "y")
            wall("ms_mul_add_masked", "del", "y", "sig", level)
        # bc += Σ_j δ_j, excluding each source's own dependency
        wall("ms_collapse_add", "del", out, batch)
        wall("ms_free")
    return {
        "algorithm": "betweenness",
        "n_seeds": len(seeds),
        "bfs_rounds_total": total_rounds,
        "wave": wave,
    }


def betweenness_table(engine: VertexEngine, seeds=None):
    """(id, bc) pyarrow table: textbook undirected betweenness (pairwise
    dependencies halved); sampled seeds scale by V/|S| (unbiased).

    Rounding is floor(x·1e6 + 0.5)/1e6 — the binary-domain half-up that
    the harmonic oracle established — NOT np.round: dependency values
    are frequently dyadic rationals (σ ratios of 1s and 2s) that land
    exactly on decimal ties where numpy's half-even and DuckDB's round()
    disagree; the floor form is the same IEEE multiply-add-floor on both
    engines (mirrored in __ray_entry__._betweenness_sql)."""
    import pyarrow as pa

    info = betweenness(engine, seeds=seeds)
    x = engine.to_array("bc")
    scale = 0.5 * (
        engine.V / info["n_seeds"] if info["n_seeds"] < engine.V else 1.0
    )
    return pa.Table.from_pydict(
        {
            "id": np.arange(engine.V, dtype=np.int64),
            "bc": np.floor(x * scale * 1e6 + 0.5) / 1e6,
        }
    ), info
