"""PageRank over the vertex engine — power / inner-outer / Arnoldi.

Semantics are pinned line-by-line to the reference so per-vertex scores agree
to allclose 1e-6 at the same L1 residual:

* power:   ComputePageRank_AlgPower   /root/reference/ppagerank.cc:278-337
* inout:   ComputePageRank_AlgInOut   /root/reference/ppagerank.cc:341-501
* arnoldi: ComputePageRank_AlgArnoldi /root/reference/ppagerank.cc:505-677
* operators: PageRankMult (ppagerank.cc:692-718: y = αP'x + (α·d'x +
  (1−α)·e'x)·v with implicit d'x = e'x − e'P'x) and PageRankDanglingMult
  (ppagerank.cc:738-778: y = P'x + (d'x)·v).

The matrix is already row-stochastic-or-zero (weight = 1/outdeg attached in
graph/build.py ≡ MatNormalizeForPageRank); dangling mass is reinjected
implicitly through the ω = 1 − ‖αP'x‖₁ shift (ppagerank.cc:308-315) — never
via an explicit dangling vector, matching how the reference is actually run
(d = NULL at ppagerank_main.cc:408).

`pagerank()` is resumable: with a checkpoint_dir every `checkpoint_every`-th
iteration persists per-partition x slices + a manifest; a rerun picks up
mid-stream (engine-only capability, SURVEY.md §4).
"""

from __future__ import annotations

import time

import numpy as np

from ppagerank_ray.config import PageRankConfig
from ppagerank_ray.engine.vertex_engine import VertexEngine


def _init_x(engine: VertexEngine, v: np.ndarray | None):
    """x⁰ = v (or uniform 1/N): ppagerank.cc:291-295."""
    if v is None:
        engine.set_vector_uniform("x", 1.0 / engine.V)
    else:
        engine.set_vector_from_array("v", v)
        engine.set_vector_from_array("x", v)


def power_iteration(
    engine: VertexEngine,
    cfg: PageRankConfig,
    v: np.ndarray | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = True,
    verbose: bool = False,
) -> dict:
    """Exact update order of ppagerank.cc:299-330:
    y = P'x ; y *= α ; ω = 1 − ‖y‖₁ ; y += ω·v ; δ = ‖y − x‖₁ ; x ← y."""
    use_pvec = v is not None
    start_iter = 0
    names = ["x", "v"] if use_pvec else ["x"]
    if checkpoint_dir and resume:
        manifest = VertexEngine.read_manifest(checkpoint_dir)
        if manifest is not None and manifest.get("algorithm") == "power":
            fp = manifest.get("input_fingerprint")
            if fp is not None and fp != engine.input_fingerprint():
                raise ValueError(
                    "checkpoint was written for a different graph "
                    f"(manifest fingerprint {fp} != loaded graph); "
                    "pass resume=False or a fresh checkpoint_dir"
                )
            # the solver CONFIG must match too — resuming α=0.9 state into
            # an α=0.85 run silently converges to the wrong fixpoint
            if manifest.get("alpha") is not None and manifest["alpha"] != cfg.alpha:
                raise ValueError(
                    f"checkpoint alpha {manifest['alpha']} != requested "
                    f"{cfg.alpha}; pass resume=False or a fresh checkpoint_dir"
                )
            if manifest.get("names") is not None and manifest["names"] != names:
                raise ValueError(
                    "checkpoint personalization-vector usage differs from "
                    "this run; pass resume=False or a fresh checkpoint_dir"
                )
            engine.restore_checkpoint(checkpoint_dir, manifest)
            start_iter = manifest["iteration"]
            # a checkpoint converged at a LOOSER tol must keep iterating
            if manifest.get("converged") and manifest.get("tol", cfg.tol) <= cfg.tol:
                return manifest
    if start_iter == 0:
        _init_x(engine, v)
        engine.history = []

    x_refs = engine.slice_refs("x")
    delta = float("inf")
    converged = False
    it = start_iter
    import ray

    for it in range(start_iter + 1, cfg.maxiter + 1):
        t0 = time.perf_counter()
        # Round 1: SpMV partials; each worker also returns its contribution
        # mass, so ω = 1 − ‖α·P'x‖₁ forms without a reduce barrier
        # (ppagerank.cc:302-310; y ≥ 0 ⇒ sum == 1-norm).
        partial_mat, totals = engine.spmv_partial_refs(x_refs)
        omega = 1.0 - cfg.alpha * float(np.sum(ray.get(totals)))
        # Round 2: fused reduce + scale + shift + δ + x←y per partition.
        upd = [
            engine.workers[q]
            .power_reduce_update.options(num_returns=2)
            .remote(
                [partial_mat[p][q] for p in range(engine.P)],
                cfg.alpha,
                omega,
                use_pvec,
                engine.V,
            )
            for q in range(engine.P)
        ]
        delta = float(np.sum(ray_get_first(upd)))
        x_refs = [u[1] for u in upd]
        dt = time.perf_counter() - t0
        engine.history.append(
            {
                "iteration": it,
                "residual_l1": delta,
                "sec": dt,
                "edges_per_sec": engine.n_edges / dt if dt > 0 else 0.0,
            }
        )
        if verbose:
            print(f"{it:4d}  {delta:10.3e}")  # ppagerank.cc:322 format
        converged = delta < cfg.tol
        if checkpoint_dir and checkpoint_every and (
            it % checkpoint_every == 0 or converged or it == cfg.maxiter
        ):
            engine.write_checkpoint(
                checkpoint_dir,
                it,
                names,
                {
                    "algorithm": "power",
                    "alpha": cfg.alpha,
                    "tol": cfg.tol,
                    "residual_l1": delta,
                    "converged": converged,
                    "input_fingerprint": engine.input_fingerprint(),
                },
            )
        if converged:
            break
    return {
        "algorithm": "power",
        "iteration": it,
        "residual_l1": delta,
        "converged": converged,
        "history": engine.history,
    }


def ray_get_first(pairs):
    """ray.get the first element of each (a, b) num_returns=2 pair."""
    import ray

    return ray.get([p[0] for p in pairs])


def _dangling_mult(engine: VertexEngine, x: str, y: str, use_pvec: bool, vname: str = "v"):
    """PageRankDanglingMult (ppagerank.cc:738-778), implicit-d branch:
    y = P'x + (e'x − e'P'x)·v. Returns nothing; mutates vec[y]."""
    import ray

    etx = float(np.sum(ray.get([w.vec_sum.remote(x) for w in engine.workers])))
    etPtx = engine.spmv(engine.slice_refs(x), out=y, scale=1.0)
    dtx = etx - etPtx
    if use_pvec:
        ray.get([w.vec_axpy.remote(y, dtx, vname) for w in engine.workers])
    else:
        ray.get([w.vec_shift.remote(y, dtx / engine.V) for w in engine.workers])


def pagerank_mult(engine: VertexEngine, cfg: PageRankConfig, x: str, y: str, use_pvec: bool):
    """PageRankMult (ppagerank.cc:692-718): y = αP'x + (α·d'x + (1−α)·e'x)·v."""
    import ray

    etx = float(np.sum(ray.get([w.vec_sum.remote(x) for w in engine.workers])))
    etPtx = engine.spmv(engine.slice_refs(x), out=y, scale=1.0)
    ray.get([w.vec_scale.remote(y, cfg.alpha) for w in engine.workers])
    dtx = etx - etPtx
    shift = cfg.alpha * dtx + (1.0 - cfg.alpha) * etx
    if use_pvec:
        ray.get([w.vec_axpy.remote(y, shift, "v") for w in engine.workers])
    else:
        ray.get([w.vec_shift.remote(y, shift / engine.V) for w in engine.workers])


def inner_outer(
    engine: VertexEngine,
    cfg: PageRankConfig,
    v: np.ndarray | None = None,
    verbose: bool = False,
) -> dict:
    """ComputePageRank_AlgInOut (ppagerank.cc:341-501), faithful scalar
    schedule including the in-place norm trickery and the fall-back to plain
    power iterations once the inner Richardson solve converges in one step."""
    import ray

    use_pvec = v is not None
    beta = cfg.beta()
    eta = cfg.inout_eta
    _init_x(engine, v)
    W = engine.workers

    def wall(fn, *args):
        ray.get([getattr(w, fn).remote(*args) for w in W])

    def norm1(name) -> float:
        return float(np.sum(ray.get([w.vec_norm1.remote(name) for w in W])))

    # y = DanglingMult(x)  (ppagerank.cc:380)
    _dangling_mult(engine, "x", "y", use_pvec)
    inner_iteration = True
    delta = float("inf")
    it = 0
    for it in range(1, cfg.maxiter + 1):
        if not inner_iteration:
            # plain power step (ppagerank.cc:385-409)
            sum_y = engine.spmv(engine.slice_refs("x"), out="y", scale=cfg.alpha)
            omega = 1.0 - sum_y
            upd = [
                w.power_update.options(num_returns=2).remote(omega, use_pvec, engine.V)
                for w in W
            ]
            delta = float(np.sum(ray_get_first(upd)))
        else:
            # f = (α−β)·y + (1−α)·v (ppagerank.cc:412-420); f is "inner_rhs"
            wall("vec_copy", "y", "f")
            wall("vec_scale", "f", cfg.alpha - beta)
            if use_pvec:
                wall("vec_axpy", "f", 1.0 - cfg.alpha, "v")
            else:
                wall("vec_shift", "f", (1.0 - cfg.alpha) / engine.V)
            inner_iter = 0
            for inner_iter in range(cfg.inout_max_inner):
                # x = β·y + f (ppagerank.cc:425)
                wall("vec_waxpy", "x", beta, "y", "f")
                # y = P'x + (d'x)v (ppagerank.cc:428)
                _dangling_mult(engine, "x", "y", use_pvec)
                # δ = ‖f + β·y − x‖₁ via in-place x mangling (ppagerank.cc:431-435)
                wall("vec_aypx_scaled", "x", beta, "y")  # x ← β·y − x
                wall("vec_axpy", "x", 1.0, "f")  # x ← x + f
                delta = norm1("x")
                if delta < eta:
                    if inner_iter == 0:
                        inner_iteration = False
                    break
            # undo the mangling: x ← β·y − (x − f)  (ppagerank.cc:447-451)
            wall("vec_axpy", "x", -1.0, "f")
            wall("vec_aypx_scaled", "x", beta, "y")
            # true residual δ = ‖x − α·y − (1−α)·v‖₁ (ppagerank.cc:456-465), f reused
            wall("vec_waxpy", "f", -cfg.alpha, "y", "x")
            if use_pvec:
                wall("vec_axpy", "f", -(1.0 - cfg.alpha), "v")
            else:
                wall("vec_shift", "f", -(1.0 - cfg.alpha) / engine.V)
            delta = norm1("f")
            if not inner_iteration:
                # x = α·y + (1−α)·v (ppagerank.cc:468-478)
                wall("vec_copy", "y", "x")
                wall("vec_scale", "x", cfg.alpha)
                if use_pvec:
                    wall("vec_axpy", "x", 1.0 - cfg.alpha, "v")
                else:
                    wall("vec_shift", "x", (1.0 - cfg.alpha) / engine.V)
        if verbose:
            print(f"{it:4d}  {delta:10.3e} {int(inner_iteration)}")
        if delta < cfg.tol:
            break
    return {"algorithm": "inout", "iteration": it, "residual_l1": delta,
            "converged": delta < cfg.tol}


def arnoldi(
    engine: VertexEngine,
    cfg: PageRankConfig,
    v: np.ndarray | None = None,
    verbose: bool = False,
) -> dict:
    """ComputePageRank_AlgArnoldi (ppagerank.cc:505-677): restarted Arnoldi
    factorization of the full PageRank operator, new iterate = V·(right
    singular vector of smallest σ of H − [I;0]). H/SVD work is driver-local
    numpy (the reference uses replicated LAPACK gesvd, ppagerank.cc:596-643);
    all O(V) work stays in the workers.

    The reference leaves the final x at arbitrary scale/sign (output is
    discarded, SURVEY K1); we normalize to a probability vector at the end
    so results are comparable with power iteration."""
    import ray

    use_pvec = v is not None
    k = cfg.arnoldi_k
    W = engine.workers
    _init_x(engine, v)

    def wall(fn, *args):
        ray.get([getattr(w, fn).remote(*args) for w in W])

    def scal(fn, *args) -> float:
        return float(np.sum(ray.get([getattr(w, fn).remote(*args) for w in W])))

    delta = float("inf")
    it = 0
    for it in range(1, cfg.maxiter + 1):
        H = np.zeros((k + 1, k), dtype=np.float64)
        basis = [f"V{j}" for j in range(k)]
        wall("vec_copy", "x", "V0")
        nrm = np.sqrt(scal("vec_norm2sq", "V0"))
        wall("vec_scale", "V0", 1.0 / nrm)
        pagerank_mult(engine, cfg, "V0", "w", use_pvec)
        alpha_h = scal("vec_dot", "V0", "w")
        H[0, 0] = alpha_h
        wall("vec_waxpy", "g", -alpha_h, "V0", "w")
        kk = k  # effective basis size (shrinks on Krylov breakdown)
        for j in range(k - 1):
            wall("vec_copy", "g", basis[j + 1])
            beta_h = np.sqrt(scal("vec_norm2sq", basis[j + 1]))
            if beta_h < 1e-13 * max(1.0, np.abs(H).max()):
                # Krylov space exhausted (effective dimension < k, e.g.
                # tiny graphs): keep the j+1 vectors built so far instead
                # of dividing by ~0 and filling the basis with inf/NaN
                H[j + 1, j] = beta_h
                kk = j + 1
                break
            wall("vec_scale", basis[j + 1], 1.0 / beta_h)
            H[j + 1, j] = beta_h
            pagerank_mult(engine, cfg, basis[j + 1], "w", use_pvec)
            # full re-orthogonalization against V0..V(j+1) (ppagerank.cc:573-589)
            dots = [
                float(np.sum(ray.get([w_.vec_dot.remote(basis[i], "w") for w_ in W])))
                for i in range(j + 2)
            ]
            H[: j + 2, j + 1] = dots
            wall("vec_copy", "w", "g")
            wall("vec_maxpy", "g", [-d for d in dots], basis[: j + 2])
        if kk == k:
            H[k, k - 1] = np.sqrt(scal("vec_norm2sq", "g"))
        Hk = H[: kk + 1, :kk]
        Hk[np.arange(kk), np.arange(kk)] -= 1.0  # (A−I) shift, ppagerank.cc:591-594
        _, _, vt = np.linalg.svd(Hk, full_matrices=True)
        vmin = vt[-1]  # right singular vector of the smallest σ
        wall("vec_set_scalar", "x", 0.0)
        wall("vec_maxpy", "x", [float(c) for c in vmin], basis[:kk])
        # convergence: ‖Mx − x‖₁ / ‖x‖₁ (ppagerank.cc:649-657)
        pagerank_mult(engine, cfg, "x", "w", use_pvec)
        wall("vec_axpy", "w", -1.0, "x")
        delta = scal("vec_norm1", "w") / max(scal("vec_norm1", "x"), 1e-300)
        if verbose:
            print(f"{it:4d}  {delta:10.3e}")
        if delta < cfg.tol:
            break
    # normalize to a probability vector (sign + L1) for downstream use;
    # guard the ~0-sum pathological case by falling back to the L1 norm
    s = scal("vec_sum", "x")
    n1 = scal("vec_norm1", "x")
    wall("vec_scale", "x", 1.0 / (s if abs(s) > 1e-12 * max(n1, 1e-300) else n1))
    return {"algorithm": "arnoldi", "iteration": it, "residual_l1": delta,
            "converged": delta < cfg.tol}


# ---------------------------------------------------------------------------
# NumPy oracle — the conformance reference for tests (SURVEY.md §5):
# a literal transliteration of ppagerank.cc:278-337 over a COO edge list.
# ---------------------------------------------------------------------------


def numpy_power_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    n_vertices: int,
    alpha: float = 0.85,
    tol: float = 1e-7,
    maxiter: int = 10000,
    v: np.ndarray | None = None,
):
    outdeg = np.bincount(src, minlength=n_vertices).astype(np.float64)
    w = np.zeros_like(outdeg)
    nz = outdeg > 0
    w[nz] = 1.0 / outdeg[nz]
    ew = w[src]
    x = np.full(n_vertices, 1.0 / n_vertices) if v is None else v.astype(np.float64).copy()
    deltas = []
    for _ in range(maxiter):
        y = np.bincount(dst, weights=x[src] * ew, minlength=n_vertices).astype(
            np.float64
        )
        y *= alpha
        omega = 1.0 - y.sum()
        y += omega / n_vertices if v is None else omega * v
        delta = np.abs(y - x).sum()
        deltas.append(delta)
        x = y
        if delta < tol:
            break
    return x, deltas
