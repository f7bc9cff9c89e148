"""Run configuration — the engine's analogue of the reference PageRankContext.

Reference: /root/reference/ppagerank.h:30-52 (PageRankContext struct) and
/root/reference/ppagerank.cc:49-147 (option parsing + defaults).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class PageRankConfig:
    """Defaults mirror the reference CLI defaults.

    alpha:   teleport coefficient  (-alpha, ppagerank.cc:68-69, default 0.85)
    tol:     L1 residual stop      (-tol,   ppagerank.cc:88-89, default 1e-7)
    maxiter: iteration cap         (-maxiter, ppagerank.cc:85-86, default 10000)
    alg:     power | inout | arnoldi (-alg, ppagerank.cc:130-142)
    inout_*: inner-outer params    (ppagerank.cc:347-355: beta=alpha/2, eta=1e-2,
             max inner iterations 1000)
    arnoldi_k: basis size          (ppagerank.cc:509, hardcoded 8)
    """

    alpha: float = 0.85
    tol: float = 1e-7
    maxiter: int = 10000
    alg: str = "power"
    inout_beta: float | None = None  # None -> alpha / 2
    inout_eta: float = 1e-2
    inout_max_inner: int = 1000
    arnoldi_k: int = 8

    def beta(self) -> float:
        return self.alpha / 2.0 if self.inout_beta is None else self.inout_beta


@dataclass
class EngineConfig:
    """Physical execution knobs for the partitioned vertex engine.

    num_partitions: number of vertex/edge partitions == actor-pool size.
        The reference's analogue is the MPI communicator size
        (petsc_util.cc:329-344 block-row partitioning).
    checkpoint_dir / checkpoint_every: per-iteration durable state
        (the reference has none — SURVEY.md §4 'Checkpoint / resume').
    """

    num_partitions: int = 0  # 0 -> derived from ray.cluster_resources() CPUs
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0  # 0 -> no checkpoints
    metrics: dict = field(default_factory=dict)


def safe_concurrency(want: int) -> int:
    """Clamp an actor-pool size below the session CPU count: a pool as
    large as the CPU budget starves co-resident Ray Data shuffle tasks
    (measured deadlock — see DESIGN.md). Single source for every
    map_batches actor-pool stage."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4))
    return max(1, min(want, cpus - 1))
