"""Partitioned vertex engine: the distributed matrix/vector substrate.

This is the Ray analogue of the reference's core physical layer —
block-row-partitioned MPIAIJ matrix + row-aligned MPI vectors
(petsc_util.cc:329-344 partitioning, 739-748 assembly; VecCreateForMatMult
petsc_util.cc:95-112) — re-designed for Ray's object store instead of MPI
collectives:

* **Vertex partitions**: the id space [0, V) is split into P contiguous
  ranges (`vbounds`); worker p owns the dense slices of every named vector
  (rank x/y, personalization v, labels) for its range. This mirrors the
  reference's `rowners[]` ownership.
* **Edge partitions**: edges are globally sorted by (src, dst) and split
  into P ranges of *equal edge count* — the engine's built-in version of the
  reference's opt-in `-matload_redistribute` balanced repartition
  (petsc_util.cc:1093-1263). A high-out-degree hub's edges simply span
  several workers (explicit hub splitting, SURVEY.md §4 'Skew'); each worker
  gathers the small halo of x-slices covering its src span.
* **SpMV** (MatMultTranspose of ppagerank.cc:302-305): each worker computes
  dense per-destination-partition partial sums from its edge block
  (np.bincount over dst — the partial-aggregate combiner), publishes them as
  P object refs (`num_returns=P`), and destination owners reduce their
  column of refs. This replaces PETSc's VecScatter (petsc_util.cc:1553-1612)
  with an object-store all-to-all of P×P dense partials — O(P·V) bytes per
  iteration instead of O(E).
* **Global scalars** (VecNorm/VecSum/VecDot Allreduce, ppagerank.cc:309,321)
  are per-worker partials summed on the driver in fixed worker order
  (deterministic for a given P).
* **Checkpoint/resume**: per-iteration per-partition vector slices + a JSON
  manifest (the reference keeps all state in RAM and cannot resume —
  SURVEY.md §4 'Checkpoint / resume' is an engine-only requirement).

Iterative algorithms drive this engine from plain Python loops; Ray Data is
used up to the materialized edge table and again for result tables, exactly
the boundary SURVEY.md §2.3 (ST1/ST2) prescribes.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd


@ray.remote
def _nrows(t: pa.Table) -> int:
    return t.num_rows


# multi-source wave row-chunk: bounds the k×E_local temporaries inside
# msbfs_partials / ms_spmv_partials to _MS_CHUNK×E_local
_MS_CHUNK = 8


def _fetch_slices(slices) -> pa.Table | None:
    """slices: list of (ObjectRef[pa.Table], lo, hi) → concatenated rows.
    All refs resolved in ONE ray.get (sequential gets serialize on RPC)."""
    if not slices:
        return None
    tables = ray.get([ref for ref, _, _ in slices])
    parts = [
        t.slice(lo, hi - lo)
        for t, (_, lo, hi) in zip(tables, slices)
        if hi > lo
    ]
    if not parts:
        return None
    return pa.concat_tables(parts).combine_chunks()


class _VertexWorker:
    """One vertex partition + one balanced edge partition. All hot methods
    are pure numpy over preassembled arrays (setup once, per SURVEY ST1)."""

    def __init__(self, wid: int, vbounds: list[int], n_threads: int = 1):
        from concurrent.futures import ThreadPoolExecutor

        self.n_threads = max(1, int(n_threads))
        self.pool = (
            ThreadPoolExecutor(self.n_threads) if self.n_threads > 1 else None
        )
        self.wid = wid
        self.vb = np.asarray(vbounds, dtype=np.int64)
        self.P = len(vbounds) - 1
        self.vlo = int(self.vb[wid])
        self.vhi = int(self.vb[wid + 1])
        self.size = self.vhi - self.vlo
        self.vecs: dict[str, np.ndarray] = {}  # float64 slices
        self.ivecs: dict[str, np.ndarray] = {}  # int64 slices (labels)
        # directed edge block (sorted by dst within the block)
        self.d_src = self.d_dst = self.d_w = None
        self.d_qb = None  # dst-partition boundaries in the dst-sorted arrays
        self.d_runs = None  # per q: (run starts, unique local dst)
        self.d_span = (0, 0)  # [min_src, max_src+1) of this edge block
        # undirected edge block (sorted by dst) + per-q run structure
        self.u_src = self.u_dst = None
        self.u_qb = None
        self.u_runs = None  # per q: (run_start_idx ndarray, uniq_local_dst ndarray)
        self.u_span = (0, 0)
        # multi-source wave state (round 4): (k, size) matrices
        self.msi: dict[str, np.ndarray] = {}
        self.msv: dict[str, np.ndarray] = {}
        self.ms_k = 0
        # persistent work buffers (round 4): the iteration hot path's
        # large temporaries (x_full gather, contrib, reduce acc, x copy)
        # exceed glibc's 32MB mmap-threshold cap at crawl scale, so
        # fresh-allocating them re-mmaps and cold-faults hundreds of MB
        # per actor PER ITERATION (measured ~1000× slower than warm
        # pages on this kernel); named reuse pays the fault cost once
        self._sbuf: dict[str, np.ndarray] = {}
        self._rel_cache: dict[str, tuple[int, np.ndarray]] = {}

    def _scratch(self, key: str, n: int, dtype=np.float64) -> np.ndarray:
        buf = self._sbuf.get(key)
        if buf is None or buf.dtype != dtype or len(buf) < n:
            buf = np.empty(max(n, 1), dtype=dtype)
            self._sbuf[key] = buf
        return buf[:n]

    def _rel(self, which: str, base: int) -> np.ndarray:
        """src − base for the directed ('d') / undirected ('u') edge
        block — base is fixed per worker after load, so this is computed
        once, not per iteration (a fresh E_local-sized subtract)."""
        ent = self._rel_cache.get(which)
        if ent is None or ent[0] != base:
            src = self.d_src if which == "d" else self.u_src
            ent = (base, src - base)
            self._rel_cache[which] = ent
        return ent[1]

    # ---------- loading ----------

    def load_directed(self, slices) -> tuple[int, int, int]:
        self._rel_cache.pop("d", None)
        t = _fetch_slices(slices)
        if t is None:
            self.d_src = np.empty(0, np.int64)
            self.d_dst = np.empty(0, np.int64)
            self.d_w = np.empty(0, np.float64)
            self.d_qb = np.zeros(self.P + 1, np.int64)
            self.d_runs = [None] * self.P
            self.d_span = (self.vlo, self.vlo)
            return 0, self.vlo, self.vlo
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        w = (
            t["weight"].to_numpy().astype(np.float64)
            if "weight" in t.column_names
            else np.ones(len(src), np.float64)
        )
        # ONE stable single-key sort to dst-major order. The engine
        # guarantees every worker slice arrives src-ascending (either the
        # caller declared the dataset presorted or load_directed global-
        # sorted it by (src, dst) first), so a stable argsort(dst)
        # resolves dst ties by input position — which IS src order —
        # reproducing the old (src,dst)-lexsort + stable dst re-sort at
        # ~a quarter of the sort+gather cost (one indirect key pass, one
        # gather set instead of two of each).
        order = np.argsort(dst, kind="stable")
        self.d_src = np.ascontiguousarray(src[order])
        self.d_dst = np.ascontiguousarray(dst[order])
        self.d_w = np.ascontiguousarray(w[order])
        src = self.d_src
        self.d_qb = np.searchsorted(self.d_dst, self.vb)
        # per-destination-partition run structure → sparse partial emission
        runs = []
        for q in range(self.P):
            a, b = int(self.d_qb[q]), int(self.d_qb[q + 1])
            if b == a:
                runs.append(None)
                continue
            seg = self.d_dst[a:b]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(seg)) + 1])
            uniq_local = (seg[starts] - self.vb[q]).astype(np.int64)
            runs.append((starts.astype(np.int64), uniq_local))
        self.d_runs = runs
        self.d_span = (int(src.min()), int(src.max()) + 1)
        return len(src), self.d_span[0], self.d_span[1]

    def load_undirected(self, slices) -> tuple[int, int, int]:
        self._rel_cache.pop("u", None)
        t = _fetch_slices(slices)
        if t is None:
            self.u_src = np.empty(0, np.int64)
            self.u_dst = np.empty(0, np.int64)
            self.u_qb = np.zeros(self.P + 1, np.int64)
            self.u_runs = [None] * self.P
            self.u_span = (self.vlo, self.vlo)
            return 0, self.vlo, self.vlo
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        order = np.argsort(dst, kind="stable")
        self.u_src = np.ascontiguousarray(src[order])
        self.u_dst = np.ascontiguousarray(dst[order])
        self.u_qb = np.searchsorted(self.u_dst, self.vb)
        runs = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a:
                runs.append(None)
                continue
            seg = self.u_dst[a:b]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(seg)) + 1])
            uniq_local = seg[starts] - self.vb[q]
            runs.append((starts.astype(np.int64), uniq_local.astype(np.int64)))
        self.u_runs = runs
        self.u_span = (int(src.min()), int(src.max()) + 1)
        return len(src), self.u_span[0], self.u_span[1]

    # ---------- dense vector ops (SURVEY M3: Vec BLAS vocabulary) ----------

    def vec_set_scalar(self, name: str, value: float):
        self.vecs[name] = np.full(self.size, value, dtype=np.float64)

    def vec_set_array(self, name: str, arr: np.ndarray):
        assert len(arr) == self.size
        self.vecs[name] = np.asarray(arr, dtype=np.float64).copy()

    def vec_copy(self, src: str, dst: str):
        self.vecs[dst] = self.vecs[src].copy()

    def vec_scale(self, name: str, a: float):
        self.vecs[name] *= a

    def vec_shift(self, name: str, a: float):
        self.vecs[name] += a

    def vec_axpy(self, y: str, a: float, x: str):
        self.vecs[y] += a * self.vecs[x]

    def vec_aypx(self, y: str, a: float, x: str):
        self.vecs[y] = a * self.vecs[y] + self.vecs[x]

    def vec_waxpy(self, w: str, a: float, x: str, y: str):
        self.vecs[w] = a * self.vecs[x] + self.vecs[y]

    def vec_aypx_scaled(self, y: str, a: float, x: str):
        """y ← a·x − y  (VecAXPBY(y, a, −1, x), ppagerank.cc:433)."""
        self.vecs[y] = a * self.vecs[x] - self.vecs[y]

    def vec_maxpy(self, y: str, coeffs: list[float], xs: list[str]):
        acc = self.vecs[y]
        for a, x in zip(coeffs, xs):
            acc += a * self.vecs[x]

    def vec_sum(self, name: str) -> float:
        return float(self.vecs[name].sum())

    def vec_norm1(self, name: str) -> float:
        return float(np.abs(self.vecs[name]).sum())

    def vec_norm2sq(self, name: str) -> float:
        v = self.vecs[name]
        return float(v @ v)

    def vec_dot(self, a: str, b: str) -> float:
        return float(self.vecs[a] @ self.vecs[b])

    def vec_diff_norm1(self, a: str, b: str) -> float:
        return float(np.abs(self.vecs[a] - self.vecs[b]).sum())

    def vec_indicator_pos(self, out: str, x: str) -> float:
        """out = 1.0 where x > 0 else 0.0; returns the local count — the
        distributed VecIndicator analogue (SURVEY M2) for support-restricted
        inits (e.g. SALSA's uniform-over-authorities a0)."""
        v = (self.vecs[x] > 0).astype(np.float64)
        self.vecs[out] = v
        return float(v.sum())

    def get_slice(self, name: str) -> np.ndarray:
        return self.vecs[name]

    def ivec_init_ids(self, name: str):
        self.ivecs[name] = np.arange(self.vlo, self.vhi, dtype=np.int64)

    def get_islice(self, name: str) -> np.ndarray:
        return self.ivecs[name]

    def ivec_replace_ge(self, name: str, threshold: int, value: int):
        """ivec[name][i] := value where ≥ threshold (e.g. BFS sentinel →
        -1 before a partitioned result write)."""
        v = self.ivecs[name]
        v[v >= threshold] = value

    # ---------- level-masked BLAS (Brandes betweenness, round 3) ----------

    def vec_mask_eq(self, out: str, x: str, ivec: str, value: int):
        """out = x · [ivec == value]."""
        m = self.ivecs[ivec] == value
        self.vecs[out] = np.where(m, self.vecs[x], 0.0)

    def vec_add_masked(self, y: str, x: str, ivec: str, value: int):
        """y += x · [ivec == value]."""
        m = self.ivecs[ivec] == value
        self.vecs[y][m] += self.vecs[x][m]

    def vec_ratio_masked(self, out: str, shift: float, num: str, den: str,
                         ivec: str, value: int):
        """out = [ivec == value] · (shift + num) / den (0 where den == 0)."""
        m = (self.ivecs[ivec] == value) & (self.vecs[den] != 0)
        o = np.zeros(self.size, dtype=np.float64)
        o[m] = (shift + self.vecs[num][m]) / self.vecs[den][m]
        self.vecs[out] = o

    def vec_mul_add_masked(self, y: str, a: str, b: str, ivec: str,
                           value: int):
        """y += a · b · [ivec == value]."""
        m = self.ivecs[ivec] == value
        self.vecs[y][m] += self.vecs[a][m] * self.vecs[b][m]

    def vec_add_inv_ivec(self, y: str, ivec: str, sentinel: int):
        """y += 1/ivec where 0 < ivec < sentinel (harmonic centrality's
        per-seed accumulation; self distance 0 and unreachable add 0)."""
        d = self.ivecs[ivec]
        m = (d > 0) & (d < sentinel)
        self.vecs[y][m] += 1.0 / d[m]

    def vec_set_entry(self, name: str, vid: int, value: float):
        if self.vlo <= vid < self.vhi:
            self.vecs[name][vid - self.vlo] = value

    def vec_get_entry(self, name: str, vid: int) -> float:
        if self.vlo <= vid < self.vhi:
            return float(self.vecs[name][vid - self.vlo])
        return 0.0

    def ivec_max_lt(self, name: str, bound: int) -> int:
        """max of ivec entries strictly below `bound` (-1 if none)."""
        v = self.ivecs[name]
        v = v[v < bound]
        return int(v.max()) if len(v) else -1

    def ivec_argmax_lt(self, name: str, bound: int) -> tuple[int, int]:
        """(max value strictly below bound, smallest GLOBAL id achieving
        it) — (-1, -1) if none. The distributed argmax for the
        double-sweep re-root (ties → smallest id, deterministic)."""
        v = self.ivecs[name]
        m = v < bound
        if not m.any():
            return -1, -1
        mx = int(v[m].max())
        ids = np.flatnonzero(v == mx)
        return mx, int(ids.min()) + self.vlo

    # ---------- SpMV: y_partial[q] = sum over local edges of x[src]*w ----------

    def _gather(
        self,
        parts: list,
        base_lo: int,
        span: tuple[int, int],
        key: str = "g",
    ) -> np.ndarray:
        """Concatenate owner slices into a persistent per-key buffer;
        refs resolved in one batched ray.get."""
        ref_idx = [i for i, p in enumerate(parts) if isinstance(p, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([parts[i] for i in ref_idx])
            parts = list(parts)
            for i, g in zip(ref_idx, got):
                parts[i] = g
        if len(parts) == 1:
            return parts[0], base_lo
        full = self._scratch(
            "gather:" + key, sum(len(p) for p in parts), parts[0].dtype
        )
        np.concatenate(parts, out=full)
        return full, base_lo

    def spmv_partials(self, x_parts: list, base_lo: int):
        """Returns P items: dense float64 partial-contribution arrays (or
        None where this worker has no edges into partition q). Caller uses
        .options(num_returns=P) so destination owners pull only their own
        column — the object store is the VecScatter."""
        if len(self.d_src) == 0:
            return tuple([None] * self.P + [0.0])
        x_full, base = self._gather(x_parts, base_lo, self.d_span, key="d")
        contrib = self._parallel_contrib(x_full, base)

        def one_q(q: int):
            a, b = int(self.d_qb[q]), int(self.d_qb[q + 1])
            if b == a:
                return None
            starts, uniq_local = self.d_runs[q]
            sums = np.add.reduceat(contrib[a:b], starts)
            size_q = int(self.vb[q + 1] - self.vb[q])
            if len(uniq_local) * 2 >= size_q:
                dense = self._scratch(f"spmv_dense:{q}", size_q)
                dense.fill(0.0)
                dense[uniq_local] = sums
                return dense
            return (uniq_local, sums)  # sparse: O(nnz) not O(V/P)

        if self.pool is not None:
            out = list(self.pool.map(one_q, range(self.P)))
        else:
            out = [one_q(q) for q in range(self.P)]
        # final extra return: this worker's total contribution mass, so the
        # driver can form ω right after the SpMV round (one fewer barrier)
        total = float(contrib.sum())
        out.append(total)
        return tuple(out)

    def _parallel_contrib(self, x_full: np.ndarray, base: int) -> np.ndarray:
        """contrib = x[src]·w, chunked across the thread pool (numpy ufuncs
        release the GIL — intra-actor parallelism like the reference's
        hybrid MPI+threads deployments). Gather indices are precomputed
        (`_rel`) and gather/multiply land in a persistent buffer —
        zero fresh E_local-sized allocations per iteration."""
        n = len(self.d_src)
        rel = self._rel("d", base)
        contrib = self._scratch("contrib", n)
        if self.pool is None or n < 1 << 18:
            np.take(x_full, rel, out=contrib)
            contrib *= self.d_w
            return contrib
        chunks = np.linspace(0, n, self.n_threads + 1).astype(np.int64)

        def work(i):
            a, b = int(chunks[i]), int(chunks[i + 1])
            np.take(x_full, rel[a:b], out=contrib[a:b])
            np.multiply(contrib[a:b], self.d_w[a:b], out=contrib[a:b])

        list(self.pool.map(work, range(self.n_threads)))
        return contrib

    def reduce_partials(self, name: str, refs: list, scale: float = 1.0) -> float:
        """vec[name] = scale * Σ partials (fixed order ⇒ deterministic for a
        given P). Returns the local sum (for ω / e'P'x scalars). The
        accumulator is a persistent per-name buffer (every vec op either
        mutates its own name in place or rebinds, so the alias is safe)."""
        acc = self._scratch("reduce:" + name, self.size)
        acc.fill(0.0)
        ref_idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([refs[i] for i in ref_idx])
            refs = list(refs)
            for i, g in zip(ref_idx, got):
                refs[i] = g
        for arr in refs:
            if arr is None:
                continue
            if isinstance(arr, tuple):  # sparse (unique local indices, sums)
                acc[arr[0]] += arr[1]  # indices unique per partial ⇒ safe
            else:
                acc += arr
        if scale != 1.0:
            acc *= scale
        self.vecs[name] = acc
        return float(acc.sum())

    def power_reduce_update(
        self, refs: list, alpha: float, omega: float, use_pvec: bool, n_vertices: int
    ):
        """Fused reduce + ppagerank.cc:308-330 update: y = α·Σpartials;
        y += ω·v; δ_local = ‖y−x‖₁; x ← y. Returns (delta, new_x_slice)."""
        self.reduce_partials("y", refs, alpha)
        return self.power_update(omega, use_pvec, n_vertices)

    # ---------- fused power-iteration update (hot path) ----------

    def power_update(self, omega: float, use_pvec: bool, n_vertices: int):
        """ppagerank.cc:308-330: y += ω·v ; δ_local = ‖y−x‖₁ ; x ← y.
        Returns (delta_local, new_x_slice) — callers use num_returns=2 so the
        x slice stays in the object store for the next gather."""
        y = self.vecs["y"]
        tmp = self._scratch("power:tmp", self.size)
        if use_pvec:
            np.multiply(self.vecs["v"], omega, out=tmp)
            y += tmp
        else:
            y += omega / n_vertices
        np.subtract(y, self.vecs["x"], out=tmp)
        np.abs(tmp, out=tmp)
        delta = float(tmp.sum())
        xb = self._scratch("power:x", self.size)
        np.copyto(xb, y)
        self.vecs["x"] = xb
        return delta, xb

    # ---------- connected components (min-label propagation) ----------

    def cc_partials(self, label_parts: list, base_lo: int):
        """Per destination partition: (uniq_local_dst, min incoming label)."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        lab_full, base = self._gather(label_parts, base_lo, self.u_span, key="u")
        vals = self._scratch("uvals", len(self.u_src), lab_full.dtype)
        np.take(lab_full, self._rel("u", base), out=vals)
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            mins = np.minimum.reduceat(vals[a:b], starts)
            out.append((uniq_local, mins))
        return out[0] if self.P == 1 else tuple(out)

    def _merge_min_partials(self, refs: list):
        """Merge per-partition (local_idx, min) pairs from every source
        worker into one (uniq_local_idx, mins) pair — (None, None) when no
        partial carried an entry for this partition."""
        idx_all, val_all = [], []
        ref_idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([refs[i] for i in ref_idx])
            refs = list(refs)
            for i, g in zip(ref_idx, got):
                refs[i] = g
        for pair in refs:
            if pair is not None:
                idx_all.append(pair[0])
                val_all.append(pair[1])
        if not idx_all:
            return None, None
        idx = np.concatenate(idx_all)
        val = np.concatenate(val_all)
        order = np.argsort(idx, kind="stable")
        idx_s, val_s = idx[order], val[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
        uniq = idx_s[starts]
        mins = np.minimum.reduceat(val_s, starts)
        return uniq, mins

    def cc_reduce(self, refs: list):
        """labels = min(labels, incoming mins). Returns (n_changed, slice)."""
        labels = self.ivecs["label"]
        uniq, mins = self._merge_min_partials(refs)
        if uniq is None:
            return 0, labels
        new = labels.copy()
        new[uniq] = np.minimum(new[uniq], mins)  # uniq is unique ⇒ fancy-min
        changed = int((new < labels).sum())
        self.ivecs["label"] = new
        return changed, new

    # ---------- maximal independent set (deterministic parallel greedy) ----------

    def mis_init(self, seed: int):
        """status 0 = active, 1 = in MIS, 2 = removed. Priority = the
        int64 view of splitmix64(id·K + seed): id → id·K + seed is a
        bijection mod 2^64 (K odd) and the splitmix64 finalizer is a
        permutation, so priorities are globally UNIQUE — no ties ever.
        The single value equal to the INT64_MAX min-identity sentinel is
        clamped to INT64_MAX−1 (mirrored bit-for-bit in the SQL oracle).
        Residual tie: the clamp can collide with a vertex genuinely
        hashing to INT64_MAX−1 (probability ~2^-63 per pair of adjacent
        vertices); two tied neighbors would then never join and the
        round loop hits max_rounds and raises rather than returning a
        wrong set. Accepted: the SQL oracle replays the identical clamp,
        so conformance is unaffected, and changing the encoding would
        break every recorded oracle."""
        from ppagerank_ray.algos.anf import splitmix64

        ids = np.arange(self.vlo, self.vhi, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(ids * np.uint64(0x100000001B3) + np.uint64(seed))
        p = h.view(np.int64).copy()
        imax = np.iinfo(np.int64).max
        p[p == imax] = imax - 1
        self.ivecs["mis_p"] = p
        self.ivecs["mis_status"] = np.zeros(self.size, dtype=np.int64)

    def mis_labels(self, phase: int):
        """Advertised labels for the next min-over-neighbors pass.
        Phase 1: active vertices advertise their priority; phase 2: MIS
        members advertise 0. Everyone else the INT64_MAX min-identity."""
        st = self.ivecs["mis_status"]
        imax = np.iinfo(np.int64).max
        if phase == 1:
            self.ivecs["mislab"] = np.where(st == 0, self.ivecs["mis_p"], imax)
        else:
            self.ivecs["mislab"] = np.where(st == 1, np.int64(0), imax)

    def mis_join_reduce(self, refs: list) -> int:
        """An active vertex whose priority beats the min over its ACTIVE
        neighbors joins the MIS (no active neighbor ⇒ joins). Two adjacent
        active vertices can never both join (one priority is smaller)."""
        st = self.ivecs["mis_status"]
        nbr_min = np.full(self.size, np.iinfo(np.int64).max, dtype=np.int64)
        uniq, mins = self._merge_min_partials(refs)
        if uniq is not None:
            nbr_min[uniq] = mins
        joins = (st == 0) & (self.ivecs["mis_p"] < nbr_min)
        st[joins] = 1
        return int(joins.sum())

    # ---------- modularity-gain label propagation (one-level Louvain) ----------
    # Sync rounds with a deterministic alternating stagger: active
    # vertices adopt the neighbor community maximizing the EXACT integer
    # modularity-gain score 2·(2m)·e_{v,c} − 2·deg(v)·(vol(c) − deg(v)·
    # [c == comm(v)]), ties → smallest community id. Communities are
    # vertex ids (< V), so the e_{v,c} histograms reuse lp_partials'
    # packed keys unchanged.
    #
    # Known limitation (accepted): the stagger separates only OPPOSITE-
    # parity vertices; two adjacent SAME-parity vertices still move
    # simultaneously within a round, so pairwise label oscillation and
    # modularity-decreasing swaps remain possible inside a parity class
    # on adversarial graphs (fixed round count bounds the damage; the
    # planted-partition quality test guards the common case). The rule
    # is deterministic and replayed verbatim by the SQL oracle, so any
    # change (e.g. staggering on parity(splitmix64(id)) XOR round) would
    # invalidate every recorded oracle — quality tweaks belong behind a
    # new seed/mode, not a silent semantic change.

    def louvain_init(self, deg_name: str = "core"):
        """comm = own id; per-vertex degree copied from `deg_name` (the
        kcore init round leaves undirected degrees there)."""
        self.ivecs["lv_comm"] = np.arange(self.vlo, self.vhi, dtype=np.int64)
        self.ivecs["lv_deg"] = self.ivecs[deg_name].copy()

    def louvain_vol_partials(self):
        """(community, Σ deg over local members) sparse pairs."""
        comm = self.ivecs["lv_comm"]
        deg = self.ivecs["lv_deg"]
        order = np.argsort(comm, kind="stable")
        cs, ds = comm[order], deg[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1])
        return cs[starts], np.add.reduceat(ds, starts)

    def _louvain_merge_candidates(self, refs: list):
        """Merge lp_partials histograms + own-community zero-edge rows into
        candidate rows (local vertex, community, edge count) sorted by
        (vertex, community)."""
        keys_all, cnt_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                keys_all.append(pair[0])
                cnt_all.append(pair[1])
        comm = self.ivecs["lv_comm"]
        V = np.int64(self.vb[-1])
        if keys_all:
            keys = np.concatenate(keys_all)
            cnts = np.concatenate(cnt_all)
            order = np.argsort(keys, kind="stable")
            keys, cnts = keys[order], cnts[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(keys)) + 1])
            keys = keys[starts]
            cnts = np.add.reduceat(cnts, starts)
            hv = (keys // V).astype(np.int64)  # local vertex index
            hc = (keys % V).astype(np.int64)  # neighbor community
        else:
            hv = np.empty(0, np.int64)
            hc = np.empty(0, np.int64)
            cnts = np.empty(0, np.int64)
        # add each vertex's own community as a zero-edge candidate (it
        # may be absent from the histogram) — dedup against real rows by
        # keeping the histogram row when both exist
        own_v = np.arange(self.size, dtype=np.int64)
        own_k = own_v * V + comm
        have = np.zeros(0, np.int64)
        if len(hv):
            have = hv * V + hc
        miss = ~np.isin(own_k, have)
        av = np.concatenate([hv, own_v[miss]])
        ac = np.concatenate([hc, comm[miss]])
        ae = np.concatenate([cnts, np.zeros(int(miss.sum()), np.int64)])
        order = np.lexsort((ac, av))
        return av[order], ac[order], ae[order]

    def louvain_reduce(
        self, refs: list, vol_ref, rnd: int, twom: int, seed: int
    ) -> int:
        """One staggered move round (broadcast-volume path). refs =
        lp_partials histograms of the current communities; vol_ref =
        broadcast (sorted comms, vols). Returns number of local vertices
        that changed community."""
        av, ac, ae = self._louvain_merge_candidates(refs)
        # vol_ref arrives auto-dereferenced (bare ObjectRef task arg)
        vols_c, vols_v = vol_ref
        if len(vols_c):
            pos = np.searchsorted(vols_c, ac)
            pos[pos >= len(vols_c)] = len(vols_c) - 1
            vol = np.where(vols_c[pos] == ac, vols_v[pos], 0).astype(np.int64)
        else:
            vol = np.zeros(len(ac), np.int64)
        return self._louvain_move(av, ac, ae, vol, rnd, twom, seed)

    def _louvain_move(self, av, ac, ae, vol, rnd: int, twom: int, seed: int) -> int:
        """Score candidates with exact integer modularity gain and apply
        the parity-staggered moves."""
        from ppagerank_ray.algos.anf import splitmix64

        comm = self.ivecs["lv_comm"]
        deg = self.ivecs["lv_deg"]
        own_v = np.arange(self.size, dtype=np.int64)
        dv = deg[av]
        own_mask = ac == comm[av]
        score = (
            2 * np.int64(twom) * ae
            - 2 * dv * (vol - dv * own_mask.astype(np.int64))
        )
        # per-vertex argmax (ties → smallest community id)
        vstarts = np.concatenate([[0], np.flatnonzero(np.diff(av)) + 1])
        vlen = np.diff(np.concatenate([vstarts, [len(av)]]))
        smax = np.maximum.reduceat(score, vstarts)
        is_max = score == np.repeat(smax, vlen)
        cmin = np.where(is_max, ac, np.iinfo(np.int64).max)
        best = np.minimum.reduceat(cmin, vstarts)
        # staggered update: active iff parity(splitmix64(id·K+seed)) == rnd%2
        ids_u = (own_v + self.vlo).astype(np.uint64)
        with np.errstate(over="ignore"):
            par = (
                splitmix64(ids_u * np.uint64(0x100000001B3) + np.uint64(seed))
                & np.uint64(1)
            ).astype(np.int64)
        active = par == (rnd & 1)
        new = comm.copy()
        touched = av[vstarts]
        new[touched] = np.where(
            active[touched], best, comm[touched]
        )
        moved = int((new != comm).sum())
        self.ivecs["lv_comm"] = new
        return moved

    # ---- vertex-aligned community volumes (beyond-broadcast path) ----
    # Communities are labeled by vertex ids, so the volume vector is
    # vertex-aligned: vol(c) lives on the OWNER of vertex c. Per round:
    # (1) owners rebuild their lv_vol slice from sharded (comm, Σdeg)
    # partials, (2) each worker merges its candidate histograms and asks
    # each owner for the volumes of its distinct candidate communities,
    # (3) owners answer from the dense slice, (4) the move applies.
    # Driver state is O(P) object refs — no community table ever leaves
    # the workers.

    def louvain_deg_total(self) -> int:
        """Σ local degrees — the O(1)-per-worker 2m contribution."""
        return int(self.ivecs["lv_deg"].sum())

    def louvain_vol_sharded(self):
        """(community, Σ deg over local members) pairs PARTITIONED BY the
        community id's owner rank (vbounds)."""
        comm = self.ivecs["lv_comm"]
        deg = self.ivecs["lv_deg"]
        order = np.argsort(comm, kind="stable")
        cs, ds = comm[order], deg[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(cs)) + 1]) if len(
            cs
        ) else np.empty(0, np.int64)
        if len(cs):
            cs = cs[starts]
            vs = np.add.reduceat(ds, starts)
        else:
            vs = np.empty(0, np.int64)
        qb = np.searchsorted(cs, self.vb)
        out = [
            None if qb[q + 1] == qb[q] else (cs[qb[q] : qb[q + 1]], vs[qb[q] : qb[q + 1]])
            for q in range(self.P)
        ]
        return out[0] if self.P == 1 else tuple(out)

    def louvain_vol_reduce(self, refs: list):
        """lv_vol[c − vlo] := Σ sharded partials — the dense owned slice
        of the community-volume vector."""
        vol = np.zeros(self.size, np.int64)
        idx_all, val_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                idx_all.append(pair[0] - self.vlo)
                val_all.append(pair[1])
        if idx_all:
            idx = np.concatenate(idx_all)
            val = np.concatenate(val_all)
            order = np.argsort(idx, kind="stable")
            idx_s, val_s = idx[order], val[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
            vol[idx_s[starts]] = np.add.reduceat(val_s, starts)
        self.ivecs["lv_vol"] = vol

    def louvain_candidates(self, refs: list):
        """Merge this round's histograms, stash the candidate rows, and
        return per-owner sorted DISTINCT candidate community ids (the
        volume-gather requests)."""
        av, ac, ae = self._louvain_merge_candidates(refs)
        self._lv_cand = (av, ac, ae)
        uc = np.unique(ac)
        qb = np.searchsorted(uc, self.vb)
        out = [
            None if qb[q + 1] == qb[q] else uc[qb[q] : qb[q + 1]]
            for q in range(self.P)
        ]
        return out[0] if self.P == 1 else tuple(out)

    def louvain_vol_lookup(self, req_refs: list):
        """Owner side of the volume gather: vols for each requester's
        community ids, answered from the owned lv_vol slice."""
        vol = self.ivecs["lv_vol"]
        out = [
            None if r is None else vol[r - self.vlo]
            for r in self._resolve_refs(req_refs)
        ]
        return out[0] if self.P == 1 else tuple(out)

    def louvain_move_gathered(
        self, resp_refs: list, rnd: int, twom: int, seed: int
    ) -> int:
        """Apply the move round using gathered volumes. resp_refs[q] =
        vols owner q returned for this worker's louvain_candidates
        requests (positionally aligned with the sorted distinct ids)."""
        av, ac, ae = self._lv_cand
        self._lv_cand = None
        uc = np.unique(ac)
        qb = np.searchsorted(uc, self.vb)
        vols_u = np.zeros(len(uc), np.int64)
        resp = self._resolve_refs(resp_refs)
        for q in range(self.P):
            if qb[q + 1] > qb[q] and resp[q] is not None:
                vols_u[qb[q] : qb[q + 1]] = resp[q]
        vol = vols_u[np.searchsorted(uc, ac)] if len(uc) else np.zeros(0, np.int64)
        return self._louvain_move(av, ac, ae, vol, rnd, twom, seed)

    # Round: new(v) = splitmix64(old(v)·K2 + H(v)) where H(v) is an
    # order-canonical polynomial hash of the SORTED neighbor (label,
    # count) multiset — Σ x_i · COEF^(m−1−i) mod 2^64 with
    # x_i = splitmix64(label_i·K3 + count_i). Everything is uint64
    # wrap-around arithmetic, replayed verbatim in the SQL oracle; a
    # hash collision merges colors identically on both sides, so oracle
    # parity survives even the 2^-64 case.

    WL_COEF = np.uint64(0x100000001B3)
    WL_K2 = np.uint64(0x9E3779B97F4A7C15)
    WL_K3 = np.uint64(0xC2B2AE3D27D4EB4F)

    def wl_init(self):
        self.ivecs["wl"] = np.ones(self.size, dtype=np.int64)

    def wl_partials(self, label_parts: list, base_lo: int):
        """Per destination partition: sorted (local_dst, label, count)
        triples — the neighbor label multiset, pre-counted per worker
        (counts are summable across workers: a combiner aggregate)."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        lab_full, base = self._gather(label_parts, base_lo, self.u_span, key="u")
        vals = self._scratch("uvals", len(self.u_src), lab_full.dtype)
        np.take(lab_full, self._rel("u", base), out=vals)
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a:
                out.append(None)
                continue
            dstl = self.u_dst[a:b] - self.vb[q]
            v = vals[a:b]
            order = np.lexsort((v, dstl))
            dstl, v = dstl[order], v[order]
            brk = np.flatnonzero((dstl[1:] != dstl[:-1]) | (v[1:] != v[:-1]))
            starts = np.concatenate([[0], brk + 1])
            cnts = np.diff(np.concatenate([starts, [len(dstl)]]))
            out.append((dstl[starts], v[starts], cnts.astype(np.int64)))
        return out[0] if self.P == 1 else tuple(out)

    def wl_reduce(self, refs: list) -> int:
        """Merge (dst, label, count) triples across source workers, fold
        each vertex's sorted multiset into the polynomial hash, rehash
        with the old color. Returns number of changed colors."""
        idx_all, val_all, cnt_all = [], [], []
        ref_idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([refs[i] for i in ref_idx])
            refs = list(refs)
            for i, g in zip(ref_idx, got):
                refs[i] = g
        for tri in refs:
            if tri is not None:
                idx_all.append(tri[0])
                val_all.append(tri[1])
                cnt_all.append(tri[2])
        old = self.ivecs["wl"].view(np.uint64)
        h_nbr = np.zeros(self.size, dtype=np.uint64)
        if idx_all:
            idx = np.concatenate(idx_all)
            val = np.concatenate(val_all)
            cnt = np.concatenate(cnt_all)
            order = np.lexsort((val, idx))
            idx, val, cnt = idx[order], val[order], cnt[order]
            # same (dst, label) may arrive from several workers — sum
            brk = np.flatnonzero((idx[1:] != idx[:-1]) | (val[1:] != val[:-1]))
            starts = np.concatenate([[0], brk + 1])
            seglen = np.diff(np.concatenate([starts, [len(idx)]]))
            cnt = np.add.reduceat(cnt, starts)
            idx, val = idx[starts], val[starts]
            # per-vertex segments over the merged sorted distinct labels
            vbrk = np.flatnonzero(idx[1:] != idx[:-1])
            vstarts = np.concatenate([[0], vbrk + 1])
            vlen = np.diff(np.concatenate([vstarts, [len(idx)]]))
            from ppagerank_ray.algos.anf import splitmix64

            with np.errstate(over="ignore"):
                x = splitmix64(
                    val.view(np.uint64) * self.WL_K3 + cnt.astype(np.uint64)
                )
                rel = np.arange(len(idx)) - np.repeat(vstarts, vlen)
                expo = np.repeat(vlen, vlen) - 1 - rel
                maxd = int(vlen.max())
                pows = np.empty(maxd, dtype=np.uint64)
                pows[0] = 1
                for j in range(1, maxd):
                    pows[j] = pows[j - 1] * self.WL_COEF
                contrib = x * pows[expo]
                sums = np.add.reduceat(contrib, vstarts)
            h_nbr[idx[vstarts]] = sums
        from ppagerank_ray.algos.anf import splitmix64

        with np.errstate(over="ignore"):
            new = splitmix64(old * self.WL_K2 + h_nbr).view(np.int64)
        changed = int((new != self.ivecs["wl"]).sum())
        self.ivecs["wl"] = new.copy()
        return changed

    # ---------- greedy graph coloring (Jones-Plassmann) ----------
    # Uncolored local-priority-minima color themselves each round with the
    # mex of their already-colored neighbors' colors. Selection reuses the
    # MIS-style min exchange; neighbor color sets arrive as lp_partials
    # histograms keyed (local_dst·(V+1) + color) with sentinel V marking
    # uncolored senders.

    def color_init(self, seed: int):
        from ppagerank_ray.algos.anf import splitmix64

        ids = np.arange(self.vlo, self.vhi, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(ids * np.uint64(0x100000001B3) + np.uint64(seed))
        p = h.view(np.int64).copy()
        imax = np.iinfo(np.int64).max
        p[p == imax] = imax - 1
        self.ivecs["color_p"] = p
        self.ivecs["color"] = np.full(self.size, -1, dtype=np.int64)

    def color_labels(self, phase: int, n_vertices: int = 0):
        """Phase 1: uncolored advertise their priority (MAX otherwise);
        phase 2: colored advertise their color, uncolored the sentinel
        n_vertices (colors are < V, so the sentinel never collides)."""
        col = self.ivecs["color"]
        if phase == 1:
            self.ivecs["mislab"] = np.where(
                col < 0, self.ivecs["color_p"], np.iinfo(np.int64).max
            )
        else:
            self.ivecs["mislab"] = np.where(col >= 0, col, np.int64(n_vertices))

    def color_select_reduce(self, refs: list) -> int:
        """Uncolored vertices beating the min over their UNCOLORED
        neighbors are selected to color this round (independent set
        among the uncolored by the strict unique-priority comparison)."""
        imax = np.iinfo(np.int64).max
        nbr_min = np.full(self.size, imax, dtype=np.int64)
        uniq, mins = self._merge_min_partials(refs)
        if uniq is not None:
            nbr_min[uniq] = mins
        sel = (self.ivecs["color"] < 0) & (self.ivecs["color_p"] < nbr_min)
        self.ivecs["csel"] = sel.astype(np.int64)
        return int(sel.sum())

    def color_assign_reduce(self, refs: list, modulus: int) -> tuple[int, int]:
        """Selected vertices take the mex of their colored neighbors'
        colors, decoded from the merged lp-style histogram keys
        (key = local_dst·modulus + color; color == modulus−1 is the
        uncolored sentinel). Returns (n_assigned, n_still_uncolored)."""
        keys_all = []
        ref_idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([refs[i] for i in ref_idx])
            refs = list(refs)
            for i, g in zip(ref_idx, got):
                refs[i] = g
        for pair in refs:
            if pair is not None:
                keys_all.append(pair[0])
        col = self.ivecs["color"]
        sel = self.ivecs["csel"] == 1
        mex = np.zeros(self.size, dtype=np.int64)
        if keys_all:
            keys = np.unique(np.concatenate(keys_all))
            dst_l = keys // modulus
            c = keys % modulus
            keep = c < (modulus - 1)  # drop the uncolored sentinel
            dst_l, c = dst_l[keep], c[keep]
            if len(dst_l):
                starts = np.concatenate(
                    [[0], np.flatnonzero(np.diff(dst_l)) + 1]
                )
                lens = np.diff(np.concatenate([starts, [len(dst_l)]]))
                rel = np.arange(len(dst_l)) - np.repeat(starts, lens)
                # first position whose color ≠ its rank == the mex;
                # all-match ⇒ mex = run length
                miss = np.where(c != rel, rel, np.iinfo(np.int64).max)
                first = np.minimum.reduceat(miss, starts)
                seg_mex = np.where(
                    first == np.iinfo(np.int64).max, lens, first
                )
                mex[dst_l[starts]] = seg_mex
        col[sel] = mex[sel]
        return int(sel.sum()), int((col < 0).sum())

    # ---------- maximal matching (deterministic local-max handshake) ----------
    # key(v) = (top MATCH_P_BITS of splitmix64(v·K + seed)) << MATCH_ID_BITS | v
    # — unique (id in the low bits), always positive (62 bits), pseudo-random
    # high-order comparison. A round is two min-exchanges: A) m1(v) = min key
    # over UNMATCHED neighbors ⇒ candidate c(v) = id bits of m1; B) each
    # unmatched u "proposes" along the single edge u→c(u); the receiver's
    # min proposer key m2(v) equals m1(v) iff c(v) proposed back (proposer
    # keys are a subset of neighbor keys, so min equality ⟺ membership of
    # the overall argmin) — v pairs with c(v) exactly then, symmetrically.

    MATCH_ID_BITS = 40
    MATCH_P_BITS = 22

    def match_init(self, seed: int):
        from ppagerank_ray.algos.anf import splitmix64

        if int(self.vb[-1]) >= (1 << self.MATCH_ID_BITS):
            # explicit raise, not assert — python -O must not silently
            # allow id bits to collide with the priority bits (the
            # round-3 ADVICE gate-hardening class)
            raise ValueError(
                f"{int(self.vb[-1])} vertices exceed the {self.MATCH_ID_BITS}"
                "-bit id field of the matching key packing"
            )
        ids = np.arange(self.vlo, self.vhi, dtype=np.uint64)
        with np.errstate(over="ignore"):
            h = splitmix64(ids * np.uint64(0x100000001B3) + np.uint64(seed))
        key = ((h >> np.uint64(64 - self.MATCH_P_BITS)) << np.uint64(
            self.MATCH_ID_BITS
        )) | ids
        self.ivecs["match_key"] = key.astype(np.int64)
        self.ivecs["partner"] = np.full(self.size, -1, dtype=np.int64)

    def match_labels(self):
        """Unmatched vertices advertise their key; matched the min-identity."""
        unm = self.ivecs["partner"] < 0
        self.ivecs["mlab"] = np.where(
            unm, self.ivecs["match_key"], np.iinfo(np.int64).max
        )

    def match_cand_reduce(self, refs: list) -> int:
        """m1 = min unmatched-neighbor key; candidate = its id bits.
        Returns how many local vertices can still propose."""
        imax = np.iinfo(np.int64).max
        m1 = np.full(self.size, imax, dtype=np.int64)
        uniq, mins = self._merge_min_partials(refs)
        if uniq is not None:
            m1[uniq] = mins
        self.ivecs["m1"] = m1
        eligible = (self.ivecs["partner"] < 0) & (m1 < imax)
        cand = np.full(self.size, -1, dtype=np.int64)
        cand[eligible] = m1[eligible] & ((1 << self.MATCH_ID_BITS) - 1)
        self.ivecs["cand"] = cand
        return int(eligible.sum())

    def match_proposal_partials(self, mlab_parts: list, cand_parts: list,
                                base_lo: int):
        """Per destination partition: min key over PROPOSING edges only —
        an edge u→v carries key(u) iff v is u's candidate. Same sparse
        (uniq_local_dst, min) emission as cc_partials with the extra
        per-edge candidate mask."""
        imax = np.iinfo(np.int64).max
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        # distinct scratch keys — _gather reuses one buffer per key, so a
        # second key="u" gather would overwrite the first's storage
        mlab_full, base = self._gather(mlab_parts, base_lo, self.u_span, key="u")
        cand_full, _ = self._gather(cand_parts, base_lo, self.u_span, key="ucand")
        rel = self._rel("u", base)
        vals = np.where(
            cand_full[rel] == self.u_dst, mlab_full[rel], imax
        )
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            mins = np.minimum.reduceat(vals[a:b], starts)
            out.append((uniq_local, mins))
        return out[0] if self.P == 1 else tuple(out)

    def match_accept_reduce(self, refs: list) -> int:
        """Pair v with its candidate iff the candidate proposed back
        (min proposer key == m1). Returns newly matched count."""
        imax = np.iinfo(np.int64).max
        m2 = np.full(self.size, imax, dtype=np.int64)
        uniq, mins = self._merge_min_partials(refs)
        if uniq is not None:
            m2[uniq] = mins
        partner = self.ivecs["partner"]
        m1 = self.ivecs["m1"]
        hit = (partner < 0) & (m1 < imax) & (m2 == m1)
        partner[hit] = self.ivecs["cand"][hit]
        return int(hit.sum())

    def mis_remove_reduce(self, refs: list) -> tuple[int, int]:
        """Active vertices with a MIS neighbor (phase-2 min == 0) become
        removed. Returns (n_removed, n_still_active)."""
        st = self.ivecs["mis_status"]
        uniq, mins = self._merge_min_partials(refs)
        rm = np.zeros(self.size, dtype=bool)
        if uniq is not None:
            hit = uniq[mins == 0]
            rm[hit] = True
        rm &= st == 0
        st[rm] = 2
        return int(rm.sum()), int((st == 0).sum())

    # ---------- label propagation (synchronous neighbor-mode) ----------

    def lp_partials(self, label_parts: list, base_lo: int, n_vertices: int):
        """Per destination partition: (key = local_dst * V + label, count).
        Counts are summable across workers — a partial/combiner aggregate."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        lab_full, base = self._gather(label_parts, base_lo, self.u_span, key="u")
        vals = self._scratch("uvals", len(self.u_src), lab_full.dtype)
        np.take(lab_full, self._rel("u", base), out=vals)
        out = []
        V = np.int64(n_vertices)
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a:
                out.append(None)
                continue
            keys = (self.u_dst[a:b] - self.vb[q]) * V + vals[a:b]
            uk, cnt = np.unique(keys, return_counts=True)
            out.append((uk, cnt.astype(np.int64)))
        return out[0] if self.P == 1 else tuple(out)

    def lp_reduce(self, refs: list, n_vertices: int):
        """Pick per-vertex mode label, ties → smallest label; vertices with
        no neighbors keep their label. Returns (n_changed, slice)."""
        labels = self.ivecs["label"]
        keys_all, cnt_all = [], []
        ref_idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([refs[i] for i in ref_idx])
            refs = list(refs)
            for i, g in zip(ref_idx, got):
                refs[i] = g
        for pair in refs:
            if pair is not None:
                keys_all.append(pair[0])
                cnt_all.append(pair[1])
        if not keys_all:
            return 0, labels
        keys = np.concatenate(keys_all)
        cnts = np.concatenate(cnt_all)
        order = np.argsort(keys, kind="stable")
        k_s, c_s = keys[order], cnts[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(k_s)) + 1])
        uk = k_s[starts]
        uc = np.add.reduceat(c_s, starts)
        V = np.int64(n_vertices)
        dsts = uk // V
        labs = uk % V
        # order by (dst asc, count desc, label asc); first row per dst wins
        sel = np.lexsort((labs, -uc, dsts))
        dsts_s, labs_s = dsts[sel], labs[sel]
        first = np.concatenate([[0], np.flatnonzero(np.diff(dsts_s)) + 1])
        new = labels.copy()
        new[dsts_s[first]] = labs_s[first]
        changed = int((new != labels).sum())
        self.ivecs["label"] = new
        return changed, new

    # ---------- k-core decomposition (h-index iteration) ----------

    @staticmethod
    def _resolve_refs(refs: list) -> list:
        """Materialize any ObjectRefs among the cross-worker partials."""
        ref_idx = [i for i, r in enumerate(refs) if isinstance(r, ray.ObjectRef)]
        if ref_idx:
            got = ray.get([refs[i] for i in ref_idx])
            refs = list(refs)
            for i, g in zip(ref_idx, got):
                refs[i] = g
        return refs

    def kcore_deg_partials(self):
        """Per destination partition: (uniq_local_dst, count) — summable
        undirected-degree partials (the h-index iteration's init). Run
        lengths fall out of the preloaded u_runs structure."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            lens = np.diff(np.concatenate([starts, [b - a]]))
            out.append((uniq_local, lens.astype(np.int64)))
        return out[0] if self.P == 1 else tuple(out)

    def kcore_init_reduce(self, refs: list, name: str = "core"):
        """ivec[name] := summed undirected degree of owned vertices."""
        core = np.zeros(self.size, np.int64)
        idx_all, val_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                idx_all.append(pair[0])
                val_all.append(pair[1])
        if idx_all:
            idx = np.concatenate(idx_all)
            val = np.concatenate(val_all)
            order = np.argsort(idx, kind="stable")
            idx_s, val_s = idx[order], val[order]
            starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
            core[idx_s[starts]] = np.add.reduceat(val_s, starts)
        self.ivecs[name] = core

    def kcore_reduce(self, refs: list, n_vertices: int):
        """core(v) ← min(core(v), h-index of the incoming (value, count)
        histogram), h = max over values v of min(v, #neighbors with
        value ≥ v). Partials arrive lp_partials-keyed (local_dst·V +
        value, count) and are summable across workers. Returns
        (n_changed, slice)."""
        core = self.ivecs["core"]
        keys_all, cnt_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                keys_all.append(pair[0])
                cnt_all.append(pair[1])
        if not keys_all:
            return 0, core
        keys = np.concatenate(keys_all)
        cnts = np.concatenate(cnt_all)
        order = np.argsort(keys, kind="stable")
        k_s, c_s = keys[order], cnts[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(k_s)) + 1])
        uk = k_s[starts]
        uc = np.add.reduceat(c_s, starts)
        V = np.int64(n_vertices)
        dsts = uk // V
        vals = uk % V  # ascending within each dst segment
        seg_first = np.concatenate([[0], np.flatnonzero(np.diff(dsts)) + 1])
        seg_len = np.diff(np.concatenate([seg_first, [len(uk)]]))
        cum = np.cumsum(uc)
        seg_last = np.concatenate([seg_first[1:], [len(uk)]]) - 1
        # suffix count within segment: #neighbors with value ≥ vals[j]
        suffix = np.repeat(cum[seg_last], seg_len) - (cum - uc)
        h = np.maximum.reduceat(np.minimum(vals, suffix), seg_first)
        uniq_dst = dsts[seg_first]
        new = core.copy()
        new[uniq_dst] = np.minimum(new[uniq_dst], h)
        changed = int((new < core).sum())
        self.ivecs["core"] = new
        return changed, new

    # ---------- BFS hop distance (min-plus; partials via cc_partials) ----------

    def bfs_init(self, seeds: np.ndarray, sentinel: int):
        """dist := 0 at owned seeds, sentinel (≥ any reachable hop count)
        elsewhere. sentinel+1 still exceeds sentinel-capped mins, so the
        plain min-plus update below never promotes an unreached vertex."""
        dist = np.full(self.size, sentinel, np.int64)
        seeds = np.asarray(seeds, np.int64)
        local = seeds[(seeds >= self.vlo) & (seeds < self.vhi)] - self.vlo
        dist[local] = 0
        self.ivecs["dist"] = dist

    def bfs_reduce(self, refs: list):
        """dist(v) ← min(dist(v), 1 + min incoming dist). Partials are
        cc_partials' (uniq_local_dst, min) pairs over the gathered dist
        vector. Returns (n_changed, slice)."""
        dist = self.ivecs["dist"]
        idx_all, val_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                idx_all.append(pair[0])
                val_all.append(pair[1])
        if not idx_all:
            return 0, dist
        idx = np.concatenate(idx_all)
        val = np.concatenate(val_all)
        order = np.argsort(idx, kind="stable")
        idx_s, val_s = idx[order], val[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
        uniq = idx_s[starts]
        mins = np.minimum.reduceat(val_s, starts) + 1
        new = dist.copy()
        new[uniq] = np.minimum(new[uniq], mins)
        changed = int((new < dist).sum())
        self.ivecs["dist"] = new
        return changed, new

    # ---------- multi-source wave (k seeds per exchange, round 4) ----------
    # Brandes/harmonic over 32 sampled seeds used to run one seed at a
    # time — 32 × O(diameter) levels × ~4 driver barriers per level. A
    # wave batches k seeds into (k, size) matrices so every min-plus /
    # masked-SpMV exchange moves k rows at once: k× fewer driver
    # round-trips for k× larger (still O(k·V/P)-bounded) messages. Row
    # chunking bounds the k×E_local temporaries.

    def ms_init(self, seeds: np.ndarray, sentinel: int):
        k = len(seeds)
        d = np.full((k, self.size), sentinel, dtype=np.int64)
        loc = (seeds >= self.vlo) & (seeds < self.vhi)
        d[np.flatnonzero(loc), seeds[loc] - self.vlo] = 0
        self.msi = {"dist": d}
        self.msv = {}
        self.ms_k = k

    def ms_free(self):
        self.msi, self.msv = {}, {}
        self.ms_k = 0

    def ms_get_islice(self, name: str) -> np.ndarray:
        return self.msi[name]

    def ms_get_slice(self, name: str) -> np.ndarray:
        return self.msv[name]

    def _gather2(self, parts: list, base_lo: int):
        """_gather for (k, ·) matrices: owner slices concat along axis 1."""
        parts = _VertexWorker._resolve_refs(parts)
        full = np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return full, base_lo

    def msbfs_partials(self, dist_parts: list, base_lo: int):
        """cc_partials with a seed dimension: per destination partition q,
        (uniq_local_dst, k×|uniq| min incoming dist) over the undirected
        block."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        dist_full, base = self._gather2(dist_parts, base_lo)
        k = dist_full.shape[0]
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            idx = self.u_src[a:b] - base
            mins = np.empty((k, len(starts)), np.int64)
            for r0 in range(0, k, _MS_CHUNK):
                r1 = min(k, r0 + _MS_CHUNK)
                mins[r0:r1] = np.minimum.reduceat(
                    dist_full[r0:r1][:, idx], starts, axis=1
                )
            out.append((uniq_local, mins))
        return out[0] if self.P == 1 else tuple(out)

    def msbfs_reduce(self, refs: list) -> int:
        d = self.msi["dist"]
        changed = 0
        for pair in _VertexWorker._resolve_refs(refs):
            if pair is None:
                continue
            uniq, mins = pair
            cand = mins + 1
            cur = d[:, uniq]
            m = cand < cur
            if m.any():
                changed += int(m.sum())
                d[:, uniq] = np.where(m, cand, cur)
        return changed

    def ms_spmv_partials(self, x_parts: list, base_lo: int):
        """spmv_partials with a seed dimension over the directed block:
        per q, (uniq_local_dst, k×|uniq| partial sums), row-chunked."""
        if len(self.d_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        x_full, base = self._gather2(x_parts, base_lo)
        k = x_full.shape[0]
        out = []
        for q in range(self.P):
            a, b = int(self.d_qb[q]), int(self.d_qb[q + 1])
            if b == a:
                out.append(None)
                continue
            starts, uniq_local = self.d_runs[q]
            idx = self.d_src[a:b] - base
            wq = self.d_w[a:b]
            sums = np.empty((k, len(starts)), np.float64)
            for r0 in range(0, k, _MS_CHUNK):
                r1 = min(k, r0 + _MS_CHUNK)
                sums[r0:r1] = np.add.reduceat(
                    x_full[r0:r1][:, idx] * wq, starts, axis=1
                )
            out.append((uniq_local, sums))
        return out[0] if self.P == 1 else tuple(out)

    def ms_reduce(self, name: str, refs: list):
        acc = np.zeros((self.ms_k, self.size), np.float64)
        for pair in _VertexWorker._resolve_refs(refs):
            if pair is None:
                continue
            acc[:, pair[0]] += pair[1]  # indices unique per partial ⇒ safe
        self.msv[name] = acc

    # row-wise masked BLAS against msi["dist"] (Brandes per-seed levels)

    def ms_set_scalar(self, name: str, value: float):
        self.msv[name] = np.full((self.ms_k, self.size), value, np.float64)

    def ms_set_entries(self, name: str, seeds: np.ndarray, value: float):
        arr = self.msv[name]
        loc = (seeds >= self.vlo) & (seeds < self.vhi)
        arr[np.flatnonzero(loc), seeds[loc] - self.vlo] = value

    def ms_mask_eq(self, out: str, x: str, value: int):
        self.msv[out] = np.where(
            self.msi["dist"] == value, self.msv[x], 0.0
        )

    def ms_add_masked(self, y: str, x: str, value: int):
        m = self.msi["dist"] == value
        self.msv[y][m] += self.msv[x][m]

    def ms_ratio_masked(self, out: str, shift: float, num: str, den: str,
                        value: int):
        m = (self.msi["dist"] == value) & (self.msv[den] != 0)
        o = np.zeros((self.ms_k, self.size), np.float64)
        o[m] = (shift + self.msv[num][m]) / self.msv[den][m]
        self.msv[out] = o

    def ms_mul_add_masked(self, y: str, a: str, b: str, value: int):
        m = self.msi["dist"] == value
        self.msv[y][m] += self.msv[a][m] * self.msv[b][m]

    def ms_row_max_lt(self, bound: int) -> np.ndarray:
        """Per-seed max dist strictly below bound (-1 where none)."""
        if self.size == 0:
            return np.full(self.ms_k, -1, np.int64)
        d = np.where(self.msi["dist"] < bound, self.msi["dist"], -1)
        return d.max(axis=1)

    def ms_collapse_add(self, ms_name: str, out: str,
                        subtract_sources: np.ndarray | None = None):
        """vecs[out] += Σ_j msv[ms_name][j]; each owned source's own row
        entry is excluded first (Brandes drops δ_s(s))."""
        col = self.msv[ms_name].sum(axis=0)
        if subtract_sources is not None:
            loc = (subtract_sources >= self.vlo) & (subtract_sources < self.vhi)
            rows = np.flatnonzero(loc)
            cols = subtract_sources[loc] - self.vlo
            np.subtract.at(col, cols, self.msv[ms_name][rows, cols])
        self.vecs[out] = self.vecs.get(out, np.zeros(self.size)) + col

    def ms_harmonic_accum(self, out: str, sentinel: int):
        """vecs[out] += Σ_j 1/dist_j where 0 < dist < sentinel."""
        d = self.msi["dist"]
        inv = np.zeros(d.shape, np.float64)
        m = (d > 0) & (d < sentinel)
        inv[m] = 1.0 / d[m]
        self.vecs[out] = self.vecs.get(out, np.zeros(self.size)) + inv.sum(
            axis=0
        )

    def ms_harmonic_accum_num(self, out: str, sentinel: int, lcm: int):
        """ivecs[out] += Σ_j lcm/dist_j (exact integer numerator of the
        harmonic sum over a common denominator — integer addition is
        associative, so the total is wave- and order-invariant and can be
        reproduced bit-exactly by a SQL SUM; the float estimate is then
        ONE deterministic multiply, not a float accumulation)."""
        d = self.msi["dist"]
        m = (d > 0) & (d < sentinel)
        num = np.zeros(d.shape, np.int64)
        num[m] = lcm // d[m]
        self.ivecs[out] = self.ivecs.get(
            out, np.zeros(self.size, np.int64)
        ) + num.sum(axis=0)

    def ms_closeness_accum(self, sum_out: str, cnt_out: str, sentinel: int):
        """ivecs[sum_out] += Σ_j dist_j and ivecs[cnt_out] += Σ_j 1 over
        seeds with 0 < dist < sentinel — exact integer accumulators for
        sampled closeness (integer sums are associative ⇒ wave- and
        order-invariant, reproducible bit-exactly by a SQL SUM; the float
        k/Σd estimate is then ONE deterministic IEEE division)."""
        d = self.msi["dist"]
        m = (d > 0) & (d < sentinel)
        s = np.where(m, d, 0).sum(axis=0, dtype=np.int64)
        c = m.sum(axis=0, dtype=np.int64)
        z = lambda: np.zeros(self.size, np.int64)
        self.ivecs[sum_out] = self.ivecs.get(sum_out, z()) + s
        self.ivecs[cnt_out] = self.ivecs.get(cnt_out, z()) + c

    # ---------- degree assortativity (edge-moment partials) ----------

    def degree_moment_partials(self, deg_parts: list, base_lo: int):
        """Per destination partition: (uniq_local_dst, Σ deg[src],
        Σ deg[src]², edge count) over undirected edges — summable
        moments, float64 so web-scale deg² sums cannot overflow."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        deg_full, base = self._gather(deg_parts, base_lo, self.u_span)
        vals = deg_full[self.u_src - base].astype(np.float64)
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            seg = vals[a:b]
            s1 = np.add.reduceat(seg, starts)
            s2 = np.add.reduceat(seg * seg, starts)
            cnt = np.diff(np.concatenate([starts, [b - a]]))
            out.append((uniq_local, s1, s2, cnt.astype(np.int64)))
        return out[0] if self.P == 1 else tuple(out)

    def assort_reduce(self, refs: list):
        """Fold incoming per-dst moment partials against the locally-owned
        dst degrees: returns the 6 global-summable Pearson terms
        (m, Σdx, Σdx², Σdy, Σdy², Σdx·dy) for this partition."""
        deg = self.ivecs["deg"].astype(np.float64)
        m = sx = sx2 = sy = sy2 = sxy = 0.0
        for part in self._resolve_refs(refs):
            if part is None:
                continue
            uniq, s1, s2, cnt = part
            dv = deg[uniq]
            cf = cnt.astype(np.float64)
            m += float(cf.sum())
            sx += float(s1.sum())
            sx2 += float(s2.sum())
            sy += float(dv @ cf)
            sy2 += float((dv * dv) @ cf)
            sxy += float(dv @ s1)
        return m, sx, sx2, sy, sy2, sxy

    def wedge_sum(self) -> int:
        """Σ over owned vertices of C(deg, 2) — transitivity denominator."""
        deg = self.ivecs["deg"]
        return int((deg * (deg - 1) // 2).sum())

    # ---------- HyperANF (HLL registers packed 8-per-int64) ----------

    def hll_init(self, n_words: int, seed: int):
        """Insert each owned vertex into its own m-register sketch:
        register index from splitmix64(id), value ρ = trailing-zero count
        of a second hash + 1 (any fixed bit-position statistic works for
        HLL; trailing zeros vectorize via the isolate-lowest-bit trick)."""
        from ppagerank_ray.algos.anf import splitmix64

        m = n_words * 8
        ids = np.arange(self.vlo, self.vhi, dtype=np.uint64)
        h = splitmix64(ids + np.uint64(seed))
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        h2 = splitmix64(h)
        low = (h2 & (~h2 + np.uint64(1))).astype(np.float64)  # 2^tz exactly
        rho = np.where(
            h2 == 0, 64, np.frexp(np.maximum(low, 1.0))[1]
        ).astype(np.uint8)  # tz + 1, capped far below uint8 range
        regs = np.zeros((self.size, m), np.uint8)
        regs[np.arange(self.size), idx] = rho
        for w in range(n_words):
            self.ivecs[f"hll{w}"] = (
                np.ascontiguousarray(regs[:, 8 * w : 8 * w + 8])
                .view(np.int64)
                .ravel()
            )

    def hll_partials(self, val_parts: list, base_lo: int):
        """cc_partials with a BYTE-wise max: the gathered int64 word packs
        8 uint8 registers; per destination partition take the per-byte max
        over each dst run (np.maximum.reduceat over the (n,8) uint8 view)."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        val_full, base = self._gather(val_parts, base_lo, self.u_span)
        vals = np.ascontiguousarray(val_full[self.u_src - base])
        bytes2d = vals.view(np.uint8).reshape(-1, 8)
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            mx = np.maximum.reduceat(bytes2d[a:b], starts, axis=0)
            out.append(
                (uniq_local, np.ascontiguousarray(mx).view(np.int64).ravel())
            )
        return out[0] if self.P == 1 else tuple(out)

    def hll_reduce(self, refs: list, name: str):
        """regs ← byte-max(regs, incoming). Returns (n_changed, slice)."""
        own = self.ivecs[name]
        idx_all, val_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                idx_all.append(pair[0])
                val_all.append(pair[1])
        if not idx_all:
            return 0, own
        idx = np.concatenate(idx_all)
        val = np.concatenate(val_all)
        order = np.argsort(idx, kind="stable")
        idx_s = idx[order]
        val2d = np.ascontiguousarray(val[order]).view(np.uint8).reshape(-1, 8)
        starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
        uniq = idx_s[starts]
        mx = np.maximum.reduceat(val2d, starts, axis=0)
        new = own.copy()
        nb = new.view(np.uint8).reshape(-1, 8)
        nb[uniq] = np.maximum(nb[uniq], mx)
        changed = int((new != own).sum())
        self.ivecs[name] = new
        return changed, new

    def hll_sum_estimates(self, names: list) -> float:
        """Σ over owned vertices of the sketch cardinality estimate —
        one point of the neighborhood function."""
        from ppagerank_ray.algos.anf import hll_estimate

        regs = np.concatenate(
            [
                self.ivecs[n].view(np.uint8).reshape(-1, 8)
                for n in names
            ],
            axis=1,
        )
        return float(hll_estimate(regs).sum()) if self.size else 0.0

    # ---------- SCC (Orzan forward-backward coloring) ----------

    def max_partials(self, val_parts: list, base_lo: int):
        """cc_partials' mirror: per destination partition
        (uniq_local_dst, MAX incoming value) over the loaded u_* CSR."""
        if len(self.u_src) == 0:
            return None if self.P == 1 else tuple([None] * self.P)
        val_full, base = self._gather(val_parts, base_lo, self.u_span)
        vals = val_full[self.u_src - base]
        out = []
        for q in range(self.P):
            a, b = int(self.u_qb[q]), int(self.u_qb[q + 1])
            if b == a or self.u_runs[q] is None:
                out.append(None)
                continue
            starts, uniq_local = self.u_runs[q]
            out.append((uniq_local, np.maximum.reduceat(vals[a:b], starts)))
        return out[0] if self.P == 1 else tuple(out)

    def scc_init(self):
        self.ivecs["scc"] = np.full(self.size, -1, np.int64)

    def scc_phase_reset(self) -> int:
        """color := own id on active (unassigned) vertices, -1 elsewhere
        (-1 never wins a max against a real id). Returns #active."""
        active = self.ivecs["scc"] < 0
        color = np.where(active, np.arange(self.vlo, self.vhi, dtype=np.int64), -1)
        self.ivecs["color"] = color
        return int(active.sum())

    def scc_fwd_reduce(self, refs: list):
        """color ← max(color, incoming max) on ACTIVE vertices only
        (assigned vertices are removed from the residual subgraph).
        Returns (n_changed, slice)."""
        color = self.ivecs["color"]
        idx_all, val_all = [], []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                idx_all.append(pair[0])
                val_all.append(pair[1])
        if not idx_all:
            return 0, color
        idx = np.concatenate(idx_all)
        val = np.concatenate(val_all)
        order = np.argsort(idx, kind="stable")
        idx_s, val_s = idx[order], val[order]
        starts = np.concatenate([[0], np.flatnonzero(np.diff(idx_s)) + 1])
        uniq = idx_s[starts]
        maxs = np.maximum.reduceat(val_s, starts)
        new = color.copy()
        upd = np.maximum(new[uniq], maxs)
        active_u = self.ivecs["scc"][uniq] < 0
        new[uniq] = np.where(active_u, upd, new[uniq])
        changed = int((new > color).sum())
        self.ivecs["color"] = new
        return changed, new

    def scc_root_reset(self):
        """r := 1 at phase roots (active vertices whose color is their own
        id — the maximal ancestor of their residual subgraph)."""
        ids = np.arange(self.vlo, self.vhi, dtype=np.int64)
        self.ivecs["r"] = (
            (self.ivecs["scc"] < 0) & (self.ivecs["color"] == ids)
        ).astype(np.int64)

    def scc_bwd_encode(self) -> np.ndarray:
        """Per-vertex code for the backward gather: color+1 where the
        vertex already reaches its root (r=1), else 0."""
        return np.where(self.ivecs["r"] == 1, self.ivecs["color"] + 1, 0)

    def scc_bwd_reduce(self, refs: list, mult: int):
        """r(v) ← 1 when some out-neighbor d has r(d)=1 and color(d) ==
        color(v). Partials are lp_partials keys local_v·mult + enc(d)
        computed on the REVERSED-edge engine (counts unused). Returns
        (n_changed, slice)."""
        keys_all = []
        for pair in self._resolve_refs(refs):
            if pair is not None:
                keys_all.append(pair[0])
        r = self.ivecs["r"]
        if not keys_all:
            return 0, r
        keys = np.unique(np.concatenate(keys_all))
        cand = np.flatnonzero((self.ivecs["scc"] < 0) & (r == 0))
        if len(cand) == 0:
            return 0, r
        want = cand * np.int64(mult) + self.ivecs["color"][cand] + 1
        pos = np.searchsorted(keys, want)
        pos_c = np.minimum(pos, len(keys) - 1)
        hit = (pos < len(keys)) & (keys[pos_c] == want)
        new = r.copy()
        new[cand[hit]] = 1
        changed = int(hit.sum())
        self.ivecs["r"] = new
        return changed, new

    def scc_assign(self) -> int:
        """scc := color where the backward sweep proved mutual
        reachability with the root. Returns #assigned this phase."""
        take = (self.ivecs["scc"] < 0) & (self.ivecs["r"] == 1)
        self.ivecs["scc"][take] = self.ivecs["color"][take]
        return int(take.sum())

    # ---------- results / checkpoint ----------

    def partition_stats(self) -> dict:
        """Per-partition skew observability (SURVEY A7: min/max local
        rows/nnz per rank, reported as metrics)."""
        return {
            "wid": self.wid,
            "vertices": self.size,
            "directed_edges": int(len(self.d_src) if self.d_src is not None else 0),
            "undirected_edges": int(len(self.u_src) if self.u_src is not None else 0),
            "src_span": [int(self.d_span[0]), int(self.d_span[1])],
        }

    def shuffle_profile(self) -> list[int]:
        """BYTES this worker ships to each destination partition per SpMV
        round (unique dsts × (8B key + 8B value)). The sparsity pattern is
        fixed after load, so this is exact for EVERY iteration — the
        manifest records it once instead of re-measuring per round."""
        out = []
        for q in range(self.P):
            r = self.d_runs[q] if self.d_runs is not None else None
            out.append(0 if r is None else int(len(r[1]) * 16))
        return out

    def edge_signature(self) -> list[int]:
        """Content checksum of this partition's edge block: (count, src span,
        dst span, order-invariant 64-bit mix of (src, dst, weight-bits)).
        Two different graphs with identical vertex/edge COUNTS still get
        different signatures (ADVICE round 1: the count-only fingerprint
        let a resume silently mix state across same-shaped graphs)."""
        if self.d_src is None or len(self.d_src) == 0:
            return [0, 0, 0, 0, 0]
        s = self.d_src.astype(np.uint64)
        d = self.d_dst.astype(np.uint64)
        wbits = self.d_w.view(np.uint64)
        mix = (
            (s * np.uint64(0x9E3779B97F4A7C15) ^ d * np.uint64(0xC2B2AE3D27D4EB4F))
            + wbits
        ).sum()
        return [
            int(len(s)),
            int(self.d_span[0]),
            int(self.d_span[1]),
            int(self.d_dst[0]),
            int(mix & np.uint64(0xFFFFFFFFFFFFFFFF)),
        ]

    def vec_top1(self, name: str, decimals: int | None = None) -> tuple[float, int]:
        """(max value, global id of first max) of the local slice; optional
        pre-rounding so ties resolve identically to a rounding SQL oracle."""
        v = self.vecs[name]
        if self.size == 0:
            return float("-inf"), -1
        if decimals is not None:
            v = np.round(v, decimals)
        i = int(np.argmax(v))  # first max → lowest id on ties
        return float(v[i]), int(self.vlo + i)

    def result_table(self, name: str, colname: str, integer: bool = False) -> pa.Table:
        ids = np.arange(self.vlo, self.vhi, dtype=np.int64)
        vals = self.ivecs[name] if integer else self.vecs[name]
        return pa.Table.from_pydict({"id": ids, colname: vals})

    def write_result_partition(
        self, out_dir: str, name: str, colname: str, integer: bool = False
    ) -> str:
        """Resumable sink: one directory per vertex partition, written
        atomically (tmp + rename) with a _SUCCESS marker; a rerun skips
        partitions whose marker exists (ray_guide 'Sources & sinks')."""
        part_dir = os.path.join(out_dir, f"part_{self.wid:05d}")
        marker = os.path.join(part_dir, "_SUCCESS")
        if os.path.exists(marker):
            return "skipped"
        os.makedirs(part_dir, exist_ok=True)
        tmp = os.path.join(part_dir, "data.parquet.tmp")
        pq.write_table(self.result_table(name, colname, integer), tmp)
        os.replace(tmp, os.path.join(part_dir, "data.parquet"))
        with open(marker, "w") as f:
            f.write("")
        return "written"

    def write_checkpoint(self, directory: str, names: list[str]) -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"part_{self.wid:05d}.parquet")
        cols = {"id": np.arange(self.vlo, self.vhi, dtype=np.int64)}
        for n in names:
            cols[n] = self.vecs[n] if n in self.vecs else self.ivecs[n]
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pydict(cols), tmp)
        os.replace(tmp, path)
        return path

    def read_checkpoint(self, directory: str, names: list[str], integer: set | None = None):
        path = os.path.join(directory, f"part_{self.wid:05d}.parquet")
        t = pq.read_table(path)
        for n in names:
            arr = t[n].to_numpy()
            if integer and n in integer:
                self.ivecs[n] = arr.astype(np.int64)
            else:
                self.vecs[n] = arr.astype(np.float64)
        return True


# Workers are bursty (short numpy kernels between idle waits) and coexist
# with Ray Data stages (sort/groupby) in the same CPU pool; reserving a full
# CPU per worker deadlocks the Dataset stages when P == cluster CPUs. On the
# single-node sandbox we run them unreserved (num_cpus=0) and let the OS
# schedule the bursts; a real multi-node deployment would pin num_cpus=1 via
# PPR_WORKER_NUM_CPUS and keep P below the per-node CPU count.
_WORKER_CPUS = float(os.environ.get("PPR_WORKER_NUM_CPUS", "0"))
VertexWorker = ray.remote(num_cpus=_WORKER_CPUS)(_VertexWorker)


@ray.remote
def _block_src_meta(t: pa.Table) -> tuple[int, int, int]:
    """(n_rows, first_src, last_src) of a globally-src-sorted block."""
    n = t.num_rows
    if n == 0:
        return 0, -1, -1
    s = t["src"]
    return n, int(s[0].as_py()), int(s[n - 1].as_py())


@ray.remote
def _weighted_split_points(
    t: pa.Table, g0: int, wrows: int, wnnz: int, targets: list[int]
) -> list[int]:
    """Local edge indices where the cumulative balance weight
    G(k) = wnnz*(g0+k) + wrows*src[k] first reaches each target (G is
    monotone because the stream is globally src-sorted)."""
    src = t["src"].to_numpy().astype(np.int64)
    g = wnnz * (g0 + np.arange(len(src), dtype=np.int64)) + wrows * src
    return [int(np.searchsorted(g, tg, side="left")) for tg in targets]


def _plan_balanced_slices(
    sorted_ds: rd.Dataset, P: int, n_vertices: int = 0,
    wrows: int = 0, wnnz: int = 1,
):
    """Split a sorted edge Dataset into P contiguous ranges balancing
    wrows*rows + wnnz*edges — the reference's -matload_redistribute with
    its -matload_redistribute_wrows/_wnnz knobs (petsc_util.cc:1122-1128).
    The engine default (wrows=0, wnnz=1: pure edge count) is right when
    SpMV flops dominate; wrows>0 spreads the per-row vector work of very
    sparse/empty rows (the reference defaults to wrows=wnnz=1). Unlike the
    reference, boundaries may split a row's edges mid-run (hub splitting,
    SURVEY.md §4 'Skew'); partial-aggregate combiners keep sums exact.
    Returns (per-worker slice lists, total_edges). Only block refs, row
    counts and boundary src values touch the driver."""
    refs = sorted_ds.to_arrow_refs()
    if wrows:
        metas = ray.get([_block_src_meta.remote(r) for r in refs])
        counts = [m[0] for m in metas]
    else:
        counts = ray.get([_nrows.remote(r) for r in refs])
    total = int(sum(counts))
    if wrows and total:
        bstarts = np.concatenate([[0], np.cumsum(counts)])
        nz = [(bi, m) for bi, m in enumerate(metas) if m[0]]
        # G at each non-empty block's first edge — monotone across blocks
        g_first = np.array(
            [wnnz * int(bstarts[bi]) + wrows * m[1] for bi, m in nz],
            dtype=np.int64,
        )
        total_balance = wnnz * total + wrows * int(n_vertices)
        targets = [total_balance * w // P for w in range(1, P)]
        inner = [0] * (P - 1)
        per_block: dict[int, list[tuple[int, int]]] = {}
        for ti, tg in enumerate(targets):
            j = int(np.searchsorted(g_first, tg, side="right")) - 1
            if j < 0:
                inner[ti] = 0  # before the first edge
            else:
                per_block.setdefault(nz[j][0], []).append((ti, tg))
        futs = {
            bi: _weighted_split_points.remote(
                refs[bi], int(bstarts[bi]), wrows, wnnz,
                [tg for _, tg in lst],
            )
            for bi, lst in per_block.items()
        }
        for bi, lst in per_block.items():
            for (ti, _), k in zip(lst, ray.get(futs[bi])):
                # k may equal the block's row count: boundary at block end
                inner[ti] = int(bstarts[bi]) + k
        bounds = [0] + sorted(inner) + [total]
    else:
        bounds = [total * i // P for i in range(P + 1)]
    starts = np.concatenate([[0], np.cumsum(counts)])
    plans: list[list] = [[] for _ in range(P)]
    for bi, (ref, c) in enumerate(zip(refs, counts)):
        if c == 0:
            continue
        g0, g1 = int(starts[bi]), int(starts[bi + 1])
        for w in range(P):
            lo = max(g0, bounds[w])
            hi = min(g1, bounds[w + 1])
            if hi > lo:
                plans[w].append((ref, lo - g0, hi - g0))
    return plans, total


class VertexEngine:
    """Driver-side handle over the worker pool; owns iteration loops."""

    def __init__(self, n_vertices: int, num_partitions: int = 0, n_threads: int = 1,
                 wrows: int = 0, wnnz: int = 1):
        """num_partitions plays the role of cluster nodes (all-to-all width);
        n_threads is per-worker intra-node parallelism. On a real multi-node
        cluster P = #nodes and n_threads = cores/node; on this single-node
        sandbox the product is capped by the session CPU count.

        wrows/wnnz weight the edge-partition balance (reference
        -matload_redistribute_wrows/_wnnz, petsc_util.cc:1122-1128):
        partitions equalize wrows*rows + wnnz*edges. Default (0, 1) is pure
        edge count — right when SpMV flops dominate; the reference defaults
        to (1, 1), which spreads per-row vector work of sparse rows."""
        if num_partitions <= 0:
            num_partitions = max(2, int(ray.cluster_resources().get("CPU", 4)))
        self.P = int(min(num_partitions, max(1, n_vertices)))
        self.V = int(n_vertices)
        self.vb = [self.V * i // self.P for i in range(self.P + 1)]
        self.wrows, self.wnnz = int(wrows), int(wnnz)
        self.workers = [
            VertexWorker.remote(w, self.vb, n_threads) for w in range(self.P)
        ]
        self.d_spans: list[tuple[int, int]] | None = None
        self.u_spans: list[tuple[int, int]] | None = None
        self.n_edges = 0
        self.n_und_edges = 0
        self.history: list[dict] = []
        self._fingerprint: dict | None = None

    # ---------- loading ----------

    def load_directed(self, edges: rd.Dataset, presorted: bool = False):
        """edges: (src, dst[, weight]) — globally sorted here; balanced
        split; per-worker assembly (setup once, reused every iteration).
        presorted=True skips the global sort when the input is already
        src-major ordered across blocks (e.g. formula-generated edge
        tables). Either way every worker slice arrives src-ascending, so
        workers dst-sort locally with ONE stable single-key argsort and
        contribution order stays deterministic."""
        if presorted:
            sorted_ds = edges
        else:
            from ppagerank_ray.graph.build import shuffle_blocks

            sorted_ds = edges.repartition(shuffle_blocks()).sort(["src", "dst"])
        plans, total = _plan_balanced_slices(
            sorted_ds, self.P, self.V, self.wrows, self.wnnz
        )
        out = ray.get(
            [w.load_directed.remote(p) for w, p in zip(self.workers, plans)]
        )
        self.n_edges = total
        self.d_spans = [(lo, hi) for _, lo, hi in out]
        self._fingerprint = None  # edge content changed
        self._shuffle_profile = None
        return total

    def load_undirected(self, und_edges: rd.Dataset, presorted: bool = False):
        """presorted=True skips the global sort (build_undirected's output
        is already globally (src,dst)-sorted and distinct); workers still
        dst-sort their slice locally either way."""
        if presorted:
            sorted_ds = und_edges
        else:
            from ppagerank_ray.graph.build import shuffle_blocks

            sorted_ds = und_edges.repartition(shuffle_blocks()).sort(["src", "dst"])
        plans, total = _plan_balanced_slices(sorted_ds, self.P)
        out = ray.get(
            [w.load_undirected.remote(p) for w, p in zip(self.workers, plans)]
        )
        self.n_und_edges = total
        self.u_spans = [(lo, hi) for _, lo, hi in out]
        return total

    # ---------- helpers ----------

    def _owners_for_span(self, span: tuple[int, int]) -> tuple[int, int]:
        """Vertex partitions [j0, j1] covering id span [lo, hi)."""
        lo, hi = span
        if hi <= lo:
            return 0, 0
        j0 = int(np.searchsorted(self.vb, lo, side="right") - 1)
        j1 = int(np.searchsorted(self.vb, hi - 1, side="right") - 1)
        return j0, j1

    def _gather_args(self, slice_refs: list, spans) -> list[tuple[list, int]]:
        """For each worker: (refs of owner slices covering its src span,
        base id of the first owner) — the halo exchange plan."""
        args = []
        for w in range(self.P):
            j0, j1 = self._owners_for_span(spans[w])
            args.append((slice_refs[j0 : j1 + 1], int(self.vb[j0])))
        return args

    def _sum(self, futures) -> float:
        return float(np.sum(ray.get(futures)))

    def set_vector_uniform(self, name: str, value: float):
        ray.get([w.vec_set_scalar.remote(name, value) for w in self.workers])

    def set_vector_from_array(self, name: str, full: np.ndarray):
        ray.get(
            [
                w.vec_set_array.remote(name, full[self.vb[i] : self.vb[i + 1]])
                for i, w in enumerate(self.workers)
            ]
        )

    def slice_refs(self, name: str) -> list:
        return [w.get_slice.remote(name) for w in self.workers]

    def write_result_partitioned(
        self, out_dir: str, name: str, colname: str, integer: bool = False
    ) -> dict:
        """Write (id, colname) as one sub-directory per vertex partition;
        reruns skip partitions that already have a _SUCCESS marker. Returns
        {written: n, skipped: n}."""
        outcomes = ray.get(
            [
                w.write_result_partition.remote(out_dir, name, colname, integer)
                for w in self.workers
            ]
        )
        return {
            "written": outcomes.count("written"),
            "skipped": outcomes.count("skipped"),
        }

    def result_dataset(self, name: str, colname: str, integer: bool = False) -> rd.Dataset:
        refs = [
            w.result_table.remote(name, colname, integer) for w in self.workers
        ]
        return rd.from_arrow_refs(refs)

    def to_array(self, name: str, integer: bool = False) -> np.ndarray:
        """Driver-side materialization — tests and tiny graphs only."""
        getter = "get_islice" if integer else "get_slice"
        return np.concatenate(
            ray.get([getattr(w, getter).remote(name) for w in self.workers])
        )

    def shutdown(self):
        for w in self.workers:
            ray.kill(w)
        self.workers = []

    # ---------- one distributed SpMV round: vec[out] = scale * (Aᵀ · vec[x]) ----------

    def spmv(self, x_refs: list, out: str, scale: float = 1.0) -> float:
        """Returns Σ out (the e'P'x scalar, folded into the same pass like
        ppagerank.cc:707). x_refs are the published slice refs of the source
        vector."""
        partial_mat, totals = self.spmv_partial_refs(x_refs)
        reduce_futs = [
            self.workers[q].reduce_partials.remote(
                out, [partial_mat[p][q] for p in range(self.P)], scale
            )
            for q in range(self.P)
        ]
        return self._sum(reduce_futs)

    def spmv_partial_refs(self, x_refs: list):
        """Launch the SpMV round; returns (P×P partial refs, P total refs)."""
        gargs = self._gather_args(x_refs, self.d_spans)
        outs = [
            w.spmv_partials.options(num_returns=self.P + 1).remote(refs, base)
            for w, (refs, base) in zip(self.workers, gargs)
        ]
        partial_mat = [o[: self.P] for o in outs]
        totals = [o[self.P] for o in outs]
        return partial_mat, totals

    # ---------- multi-source wave rounds (round 4) ----------

    def ms_bfs(self, seeds, max_rounds: int = 10_000) -> dict:
        """k-source BFS over the undirected block: dist is a (k, ·) matrix
        and each min-plus exchange advances ALL k frontiers — k× fewer
        driver barriers than k single-seed bfs_distances calls."""
        seeds = np.asarray(list(seeds), np.int64)
        ray.get([w.ms_init.remote(seeds, int(self.V)) for w in self.workers])
        rounds = 0
        for rounds in range(1, max_rounds + 1):
            refs = [w.ms_get_islice.remote("dist") for w in self.workers]
            gargs = self._gather_args(refs, self.u_spans)
            pm = [
                w.msbfs_partials.options(num_returns=self.P).remote(r, b)
                for w, (r, b) in zip(self.workers, gargs)
            ]
            if self.P == 1:
                pm = [[m] for m in pm]
            changed = int(np.sum(ray.get([
                self.workers[q].msbfs_reduce.remote(
                    [pm[p][q] for p in range(self.P)]
                )
                for q in range(self.P)
            ])))
            if changed == 0:
                break
        return {"rounds": rounds, "sentinel": int(self.V), "k": len(seeds)}

    def ms_spmv(self, name: str, out: str):
        """One k-row SpMV round over the directed block:
        msv[out] = Aᵀ · msv[name] (per seed row)."""
        refs = [w.ms_get_slice.remote(name) for w in self.workers]
        gargs = self._gather_args(refs, self.d_spans)
        pm = [
            w.ms_spmv_partials.options(num_returns=self.P).remote(r, b)
            for w, (r, b) in zip(self.workers, gargs)
        ]
        if self.P == 1:
            pm = [[m] for m in pm]
        ray.get([
            self.workers[q].ms_reduce.remote(
                out, [pm[p][q] for p in range(self.P)]
            )
            for q in range(self.P)
        ])

    # ---------- checkpointing ----------

    def partition_stats(self) -> list[dict]:
        return ray.get([w.partition_stats.remote() for w in self.workers])

    def input_fingerprint(self) -> dict:
        """Content fingerprint of the loaded graph, recorded in the manifest
        so resume detects a different input: counts + per-partition edge
        signatures (span + order-invariant checksum of (src,dst,weight)).
        Computed once per engine (cached — the edge arrays are immutable
        after load)."""
        if getattr(self, "_fingerprint", None) is None:
            sigs = ray.get([w.edge_signature.remote() for w in self.workers])
            self._fingerprint = {
                "n_vertices": self.V,
                "n_edges": self.n_edges,
                "partition_signatures": sigs,
            }
        return self._fingerprint

    def shuffle_profile(self) -> dict:
        """Per-iteration all-to-all volume (SURVEY §4 observability row):
        exact bytes each SpMV round moves, total and per-worker skew.
        Constant across iterations for a loaded graph — computed once."""
        if getattr(self, "_shuffle_profile", None) is None:
            mats = ray.get([w.shuffle_profile.remote() for w in self.workers])
            per_worker = [int(sum(row)) for row in mats]
            self._shuffle_profile = {
                "bytes_per_iteration_total": int(sum(per_worker)),
                "bytes_per_worker_max": max(per_worker, default=0),
                "bytes_per_worker_min": min(per_worker, default=0),
            }
        return self._shuffle_profile

    def top1(self, name: str, decimals: int | None = None) -> tuple[float, int]:
        """Global (max value, id), ties → lowest id; O(P) driver work."""
        parts = ray.get([w.vec_top1.remote(name, decimals) for w in self.workers])
        best = max(parts, key=lambda vi: (vi[0], -vi[1]))
        return float(best[0]), int(best[1])

    def write_checkpoint(
        self, ckpt_dir: str, iteration: int, names: list[str], meta: dict
    ):
        it_dir = os.path.join(ckpt_dir, f"iter_{iteration:06d}")
        ray.get([w.write_checkpoint.remote(it_dir, names) for w in self.workers])
        # per-iteration observability (round-2 verdict item 8): history rows
        # carry sec + edges_per_sec per iteration; shuffle volume and
        # partition skew are sparsity-pattern properties, exact for every
        # iteration, recorded once here so BENCH quotes the manifest
        # instead of scraping logs
        part_stats = self.partition_stats()
        edge_counts = [s["directed_edges"] for s in part_stats]
        manifest = {
            "iteration": iteration,
            "n_vertices": self.V,
            "n_edges": self.n_edges,
            "num_partitions": self.P,
            "vbounds": list(map(int, self.vb)),
            "names": names,
            "history": self.history,
            "shuffle": self.shuffle_profile() if self.n_edges else {},
            "partition_edges_max": max(edge_counts, default=0),
            "partition_edges_min": min(edge_counts, default=0),
            **meta,
        }
        tmp = os.path.join(ckpt_dir, "manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, os.path.join(ckpt_dir, "manifest.json"))

    @staticmethod
    def read_manifest(ckpt_dir: str) -> dict | None:
        path = os.path.join(ckpt_dir, "manifest.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore_checkpoint(self, ckpt_dir: str, manifest: dict):
        it_dir = os.path.join(ckpt_dir, f"iter_{manifest['iteration']:06d}")
        names = manifest["names"]
        ray.get(
            [w.read_checkpoint.remote(it_dir, names, None) for w in self.workers]
        )
        self.history = list(manifest.get("history", []))
