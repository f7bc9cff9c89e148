"""Benchmark harness — one JSON line per run; --scaling runs two CPU levels.

All single-shot phases run best-of-2 (round-2 verdict item 3: co-tenant
bursts made whole-bench wall time swing ±25% round-to-round; min-of-n per
phase estimates machine capability like the p20 iteration metric does).

Phases (headline value = total seconds across phases):
  e2e_pipeline  pages → extract → graph build → PageRank to 1e-6 over a
                replicated corpus (PPR_BENCH_REPLICATE × documents) — the
                full extraction + shuffle + iteration stack
  pagerank      power iteration to 1e-6 L1 on a large formula-generated
                edge table (PPR_BENCH_PAGES vertices) — the BASELINE.json
                primary metric. Reported two ways: wall seconds (min of 3
                runs) and edges/sec from the 20th-percentile per-iteration
                time (sandbox co-tenants cause sporadic 10-20× stalls of
                single iterations; p20 estimates machine capability)
  components    min-label propagation to fixpoint on the e2e graph
  minhash_text  MinHash band signatures over the replicated page texts —
                a pure compute-bound map stage (stateless tasks)
  knn           brute-force cosine top-10 for 5 queries over embeddings

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default
32), PPR_BENCH_PAGES (default 4_000_000), PPR_BENCH_REPLICATE (default 120).

--scaling: re-runs this script in fresh processes at 8 and 32 CPUs on the
same input and reports per-phase throughput ratios + efficiencies — the
sandbox evidence protocol for the north rule's two-cluster-size criterion.
Interpretation notes live in BASELINE.md (single-node SpMV is memory-
bandwidth-bound; the compute-bound phases are the multi-node proxy).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


class _ContentionSampler:
    """Background thread separating whole-box CPU from OUR process tree
    every `interval` seconds for the duration of the bench. Co-tenant
    busy-cores = box busy jiffies − our-tree jiffies per interval. The
    timeline percentiles go into the JSON so every BENCH_r*.json carries
    its own contention context — this box's co-tenant bursts stall
    identical work 2-10x for minutes at a time (BASELINE.md 'noise'),
    and endpoint-only sampling misses them."""

    def __init__(self, interval: float = 2.0) -> None:
        import threading

        self.interval = interval
        self.samples: list[tuple[float, float]] = []  # (wall ts, cores)
        self.root = os.getpid()
        self.hz = os.sysconf("SC_CLK_TCK") or 100
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    @staticmethod
    def _box_busy() -> int:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        return sum(vals) - vals[3] - vals[4]  # minus idle+iowait

    def _tree_busy(self) -> dict[int, int]:
        """pid → utime+stime for this pid and all descendants (the ray
        session — raylet/workers — is rooted at us because ray.init runs
        in-process)."""
        stats: dict[int, tuple[int, int]] = {}  # pid -> (ppid, jiffies)
        for name in os.listdir("/proc"):
            if not name.isdigit():
                continue
            try:
                with open(f"/proc/{name}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
                stats[int(name)] = (int(parts[1]), int(parts[11]) + int(parts[12]))
            except OSError:
                continue
        member = {self.root}
        changed = True
        while changed:  # transitively collect descendants
            changed = False
            for pid, (ppid, _) in stats.items():
                if pid not in member and ppid in member:
                    member.add(pid)
                    changed = True
        return {pid: stats[pid][1] for pid in member if pid in stats}

    def _run(self) -> None:
        ncpu = os.cpu_count() or 1
        b0, t0 = self._box_busy(), self._tree_busy()
        while not self._stop.wait(self.interval):
            b1, t1 = self._box_busy(), self._tree_busy()
            # per-pid deltas: new pids count fully, dead pids drop (their
            # final partial slice briefly misattributes to co-tenants)
            tree = sum(j - t0.get(pid, 0) for pid, j in t1.items())
            cores = ((b1 - b0) - tree) / self.hz / self.interval
            self.samples.append(
                (time.time(), round(min(max(cores, 0.0), ncpu), 2))
            )
            b0, t0 = b1, t1

    def start(self) -> None:
        self._thread.start()

    def window_p50(self, t0: float, t1: float) -> float:
        """Co-tenant p50 within [t0, t1] — lets best_of treat an attempt
        that ran under a measured burst as tainted even when the burst
        lasted long enough to flatten the spread heuristic."""
        vals = sorted(c for ts, c in self.samples if t0 <= ts <= t1)
        return vals[len(vals) // 2] if vals else 0.0

    def summary(self, marks: list | None = None) -> dict:
        self._stop.set()
        self._thread.join(timeout=5)
        s = sorted(c for _, c in self.samples)
        if not s:
            return {"samples": 0}
        out = {
            "samples": len(s),
            "co_tenant_cores_p50": s[len(s) // 2],
            "co_tenant_cores_p90": s[int(len(s) * 0.9)],
            "co_tenant_cores_max": s[-1],
            "loadavg_end": [round(v, 1) for v in os.getloadavg()],
        }
        if marks:
            spans = marks + [(time.time(), "_end")]
            per = {}
            for (t0, name), (t1, _) in zip(spans, spans[1:]):
                vals = sorted(c for ts, c in self.samples if t0 <= ts < t1)
                if vals:
                    per[name] = vals[len(vals) // 2]
            out["phase_co_tenant_p50"] = per
        return out


def _quiet_gate(
    threshold: float = 2.0,
    probe_sec: float = 16.0,
    retry_sleep: float = 45.0,
    max_wait: float = 420.0,
) -> dict:
    """Round-4 ADVICE: use the contention sampler as a GATE, not just
    telemetry. Probe co-tenant cores for ~probe_sec; if p50 > threshold
    sleep and re-probe until max_wait is spent, then proceed anyway with
    the decision recorded — the JSON always says whether its numbers were
    captured in a verified-quiet window. Override with PPR_BENCH_NO_GATE=1
    (e.g. for intentionally-loaded scaling studies)."""
    if os.environ.get("PPR_BENCH_NO_GATE"):
        return {"enabled": False}
    t_start = time.time()
    probes = []
    while True:
        s = _ContentionSampler(interval=2.0)
        s.start()
        time.sleep(probe_sec)
        s._stop.set()
        s._thread.join(timeout=5)
        vals = sorted(c for _, c in s.samples)
        p50 = vals[len(vals) // 2] if vals else 0.0
        probes.append(p50)
        if p50 <= threshold:
            return {
                "enabled": True,
                "quiet": True,
                "threshold": threshold,
                "probe_p50s": probes,
                "waited_sec": round(time.time() - t_start, 1),
            }
        if time.time() - t_start + retry_sleep + probe_sec > max_wait:
            return {
                "enabled": True,
                "quiet": False,  # proceeding under measured load
                "threshold": threshold,
                "probe_p50s": probes,
                "waited_sec": round(time.time() - t_start, 1),
            }
        time.sleep(retry_sleep)


def run_bench() -> dict:
    import ray

    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench_pages = int(os.environ.get("PPR_BENCH_PAGES", "4000000"))
    replicate = int(os.environ.get("PPR_BENCH_REPLICATE", "120"))

    gate = _quiet_gate()
    contention = _ContentionSampler()
    contention.start()
    phase_marks: list = []

    def mark(name: str) -> None:
        phase_marks.append((time.time(), name))

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ppagerank_ray import tune_data_context

    tune_data_context()

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ppagerank_ray.algos.components import connected_components
    from ppagerank_ray.algos.pagerank import power_iteration
    from ppagerank_ray.config import PageRankConfig
    from ppagerank_ray.engine.vertex_engine import VertexEngine
    from ppagerank_ray.functions.dedup import minhash_bands_batch, near_dup_pairs
    from ppagerank_ray.functions.similarity import knn_bruteforce
    from ppagerank_ray.graph.build import build_graph, build_undirected
    from ppagerank_ray.sources.edges import n_vertices_for, synth_edges
    from ppagerank_ray.sources.pages import synth_pages

    queries: dict[str, float] = {}
    extra: dict = {}

    max_attempts = int(os.environ.get("PPR_BENCH_ATTEMPTS", "4"))

    def best_of(fn, n: int = 2):
        """Adaptive min-of-n phase timing: co-tenant bursts on this box
        stall identical work 2-10× for MINUTES at a time (BASELINE.md
        'noise'), so two back-to-back attempts can both land inside one
        burst. Run n attempts; keep retrying up to PPR_BENCH_ATTEMPTS
        while EITHER the spread says a burst was present (max/min > 1.4)
        OR every attempt so far ran under measured co-tenancy (window
        p50 > 2 cores — a long burst flattens the spread, so the spread
        heuristic alone accepted 2-4× inflated phases; round-4 session-2
        forensics). The min estimates machine capability, same spirit as
        the p20 per-iteration metric and --scaling's interleaved best-of."""
        times, out = [], None
        any_clean = False
        while True:
            w0 = time.time()
            t0 = time.perf_counter()
            r = fn()
            dt = time.perf_counter() - t0
            if not times or dt < min(times):
                out = r
            times.append(dt)
            if contention.window_p50(w0, time.time()) <= 2.0:
                any_clean = True
            if len(times) >= max_attempts or (
                len(times) >= n
                and any_clean
                and max(times) / min(times) <= 1.4
            ):
                return min(times), out

    # warm: OS page cache + Ray worker process pool (first Dataset execution
    # forks ~num_cpus python workers; that is session setup, not pipeline)
    rd.read_parquet(f"{sf_dir}/documents.parquet").count()
    rd.read_parquet(f"{sf_dir}/embeddings.parquet").count()
    synth_pages(sf_dir, replicate=2).count()

    # hybrid layout: P actors = "nodes" for the all-to-all; threads fill cores
    P = min(8, num_cpus)
    T = max(1, num_cpus // P)

    # --- e2e pipeline ---
    mark("e2e_pipeline")

    def run_e2e():
        gt = build_graph(synth_pages(sf_dir, replicate=replicate))
        eng = VertexEngine(gt.n_vertices, num_partitions=P, n_threads=T)
        eng.load_directed(gt.edges, presorted=gt.edges_sorted)
        info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-6))
        eng.shutdown()
        return gt, info

    queries["e2e_pipeline"], (gt, info) = best_of(run_e2e)
    extra["e2e_pages"] = gt.n_vertices
    extra["e2e_edges"] = gt.n_edges
    extra["e2e_pr_iterations"] = info["iteration"]
    extra["e2e_pages_per_sec"] = round(gt.n_vertices / queries["e2e_pipeline"])

    # --- pagerank on the large formula graph (primary metric) ---
    mark("pagerank")
    nv = n_vertices_for(bench_pages)
    edges = synth_edges(bench_pages, parallelism=num_cpus * 4)

    # best-of-2 like the other phases (the load was the round-2 verdict's
    # headline noise exhibit: 6.9 s quiet vs 16 s under a co-tenant burst,
    # identical code); the last-loaded engine is kept for the runs
    best_load = None
    eng = None
    for _ in range(2):
        if eng is not None:
            eng.shutdown()
        eng = VertexEngine(nv, num_partitions=P, n_threads=T)
        t0 = time.perf_counter()
        n_edges = eng.load_directed(edges, presorted=True)
        dt = time.perf_counter() - t0
        best_load = dt if best_load is None else min(best_load, dt)
    extra["pagerank_load_sec"] = round(best_load, 3)
    power_iteration(eng, PageRankConfig(alpha=0.85, tol=0.0, maxiter=3))  # warm
    runs, iter_secs = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-6))
        runs.append(time.perf_counter() - t0)
        iter_secs.extend(h["sec"] for h in eng.history)
    eng.shutdown()
    iter_secs.sort()
    p20 = iter_secs[max(0, len(iter_secs) // 5 - 1)]
    queries["pagerank"] = min(runs)
    extra["pagerank_runs_sec"] = [round(r, 3) for r in runs]
    extra["pagerank_edges"] = n_edges
    extra["pagerank_iterations"] = info["iteration"]
    extra["pagerank_sec_per_iter_p20"] = round(p20, 4)
    extra["pagerank_iters_per_sec"] = round(1.0 / p20, 3)
    extra["edges_per_sec"] = round(n_edges / p20)

    # --- components to fixpoint on the e2e graph ---
    mark("components")

    def run_cc():
        eng = VertexEngine(gt.n_vertices, num_partitions=P, n_threads=T)
        eng.load_undirected(build_undirected(gt.edges), presorted=True)
        cc = connected_components(eng)
        eng.shutdown()
        return cc

    queries["components"], cc = best_of(run_cc)
    extra["components_rounds"] = cc["rounds"]

    # --- triangle count on the e2e graph ---
    mark("triangle_count")
    from ppagerank_ray.algos.triangles import triangle_count

    queries["triangle_count"], extra["triangles"] = best_of(
        lambda: triangle_count(gt.edges, gt.n_vertices)
    )

    # --- minhash signatures: compute-bound stateless map over page texts ---
    mark("minhash_text")
    docs_rep = (
        synth_pages(sf_dir, replicate=max(1, replicate // 2))
        .select_columns(["text"])
        .map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "doc_id": np.arange(t.num_rows, dtype=np.int64),
                    "text": t["text"],
                }
            ),
            batch_format="pyarrow",
        )
        .repartition(num_cpus * 3)
        .materialize()
    )
    n_sig_docs = docs_rep.count()
    best = None
    for _ in range(2):  # best-of-2: co-tenant bursts last minutes
        t0 = time.perf_counter()
        docs_rep.map_batches(
            minhash_bands_batch, batch_format="pyarrow", batch_size=2048
        ).count()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    queries["minhash_text"] = best
    extra["minhash_docs"] = n_sig_docs
    extra["minhash_docs_per_sec"] = round(n_sig_docs / best)

    # --- dedup + knn on the raw sf tables ---
    mark("minhash_dedup")
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet")
    queries["minhash_dedup"], pairs = best_of(
        lambda: near_dup_pairs(docs, threshold=0.7)
    )
    extra["near_dup_pairs"] = pairs.num_rows

    mark("knn")
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet")
    queries["knn"], _ = best_of(
        lambda: knn_bruteforce(emb, [0, 1, 2, 3, 4], k=10)
    )

    ray.shutdown()
    extra["quiet_gate"] = gate
    extra["contention"] = contention.summary(phase_marks)
    return {
        "metric": "link-graph pipeline seconds (e2e + PageRank-to-1e-6 + components + triangles + minhash + dedup + knn)",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        **extra,
    }


def run_scaling_phase(phase: str, ncpus: int) -> dict:
    """Child mode: ONE phase at ONE core count in THIS process. The parent
    pins the whole process tree with `taskset -c 0..N-1` — essential
    because the engine's vertex workers run as num_cpus=0 actors, which
    `ray.init(num_cpus=N)` does NOT constrain (Ray's logical CPU budget
    only gates resource-requesting tasks). Without OS-level pinning a
    "2-CPU" engine run silently uses every core on the box — round 1's
    SpMV scaling table had exactly this flaw."""
    import ray

    ray.init(address="local", num_cpus=ncpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ppagerank_ray import tune_data_context

    tune_data_context()
    out: dict = {"phase": phase, "cpus": ncpus,
                 "pinned_cores": len(os.sched_getaffinity(0))}
    if phase == "spmv":
        from ppagerank_ray.algos.pagerank import power_iteration
        from ppagerank_ray.config import PageRankConfig
        from ppagerank_ray.engine.vertex_engine import VertexEngine
        from ppagerank_ray.sources.edges import n_vertices_for, synth_edges

        pages = int(os.environ.get("PPR_SCALE_PAGES", "4000000"))
        # P fixed across levels: identical partitioning/all-to-all topology,
        # so the ratio isolates core-count scaling of the kernels
        P = int(os.environ.get("PPR_SCALE_P", "8"))
        nv = n_vertices_for(pages)
        edges = synth_edges(pages, parallelism=max(ncpus * 4, 16))
        eng = VertexEngine(nv, num_partitions=P, n_threads=1)
        n_edges = eng.load_directed(edges, presorted=True)
        power_iteration(eng, PageRankConfig(tol=0.0, maxiter=3))  # warm
        iter_secs = []
        for _ in range(3):
            power_iteration(eng, PageRankConfig(tol=1e-6))
            iter_secs.extend(h["sec"] for h in eng.history)
        eng.shutdown()
        iter_secs.sort()
        p20 = iter_secs[max(0, len(iter_secs) // 5 - 1)]
        out.update(n_edges=n_edges, p20_sec=round(p20, 4),
                   throughput=round(n_edges / p20))
    elif phase == "bvgraph":
        # parallel .offsets range decode A/B (round-3): same encoded file,
        # decode fan-out at N vs 4N pinned cores. The file is generated
        # deterministically once and cached in /tmp.
        import numpy as np

        from ppagerank_ray.sources import bvgraph as bvg

        nodes = int(os.environ.get("PPR_BVG_NODES", "200000"))
        base = f"/tmp/ppr_bvg_scale_{nodes}"
        if not os.path.exists(base + ".graph"):
            rng = np.random.default_rng(42)

            def gen():
                for x in range(nodes):
                    d = int(rng.integers(0, 25))
                    if d == 0:
                        yield np.empty(0, np.int64)
                        continue
                    # locality-biased targets → realistic window references
                    yield np.unique((x + rng.integers(1, 1000, size=d)) % nodes)

            bvg.encode_bvgraph(gen(), base)
        best = None
        n_arcs = 0
        for _ in range(3):
            t0 = time.perf_counter()
            ds, _, _, n_arcs = bvg.read_bvgraph(base, parallelism=ncpus)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out.update(arcs=n_arcs, sec=round(best, 3),
                   throughput=round(n_arcs / best))
    elif phase == "bvgenc":
        # parallel range ENCODE A/B (round 3): same edge set, encode
        # fan-out at N vs 4N pinned cores through the Ray-task range
        # writer (write_bvgraph_from_edges parallelism=ncpus).
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ppagerank_ray.sources import bvgraph as bvg

        nodes = int(os.environ.get("PPR_BVG_NODES", "800000"))
        rng = np.random.default_rng(42)
        n_edges = nodes * 12
        src = rng.integers(0, nodes, n_edges)
        dst = (src + rng.integers(1, 1000, n_edges)) % nodes
        edges = rd.from_arrow(
            pa.table({"src": src, "dst": dst})
        ).repartition(max(ncpus * 2, 8)).materialize()
        best = None
        info = {}
        for _ in range(3):
            t0 = time.perf_counter()
            info = bvg.write_bvgraph_from_edges(
                edges, nodes, f"/tmp/ppr_bvgenc_{ncpus}",
                parallelism=ncpus,
            )
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out.update(arcs=info["arcs"], sec=round(best, 3),
                   throughput=round(info["arcs"] / best))
    else:  # minhash: compute-bound stateless Ray Data map
        import numpy as np
        import pyarrow as pa

        from ppagerank_ray.functions.dedup import minhash_bands_batch
        from ppagerank_ray.sources.pages import synth_pages

        rep = int(os.environ.get("PPR_SCALE_REP", "40"))
        sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
        docs = (
            synth_pages(sf_dir, replicate=rep)
            .select_columns(["text"])
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"doc_id": np.arange(t.num_rows, dtype=np.int64),
                     "text": t["text"]}),
                batch_format="pyarrow")
            .repartition(max(ncpus * 3, 8))
            .materialize()
        )
        n = docs.count()
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            docs.map_batches(minhash_bands_batch, batch_format="pyarrow",
                             batch_size=2048).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out.update(docs=n, sec=round(best, 3), throughput=round(n / best))
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """North-rule evidence protocol (sandbox analogue of two cluster
    sizes): the same job at N and 4N CORES, pinned with taskset (see
    run_scaling_phase for why ray.init alone cannot constrain the engine),
    in fresh processes. Co-tenants on this box burst for minutes at a time
    (load avg ~10 on 32 cores), so lo/hi runs are INTERLEAVED over several
    rounds and each level reports its best observed throughput — the
    machine-capability estimator, same spirit as the p20 iteration time.
    Efficiency = (tput_hi / tput_lo) / (hi / lo)."""
    lo = int(os.environ.get("PPR_SCALE_LO", "2"))
    hi = int(os.environ.get("PPR_SCALE_HI", "8"))
    rounds = int(os.environ.get("PPR_SCALE_ROUNDS", "2"))
    phases = os.environ.get("PPR_SCALE_PHASES", "minhash,spmv").split(",")
    here = os.path.dirname(os.path.abspath(__file__))
    # round 5: the scaling run gets the same quiet gate + per-attempt
    # contention tag as run_bench — best-of already rejects burst-slowed
    # attempts by throughput, but the tag makes each kept number carry
    # its own evidence (and the gate avoids starting inside a burst)
    gate = _quiet_gate()
    sampler = _ContentionSampler()
    sampler.start()
    best: dict = {(p, n): None for p in phases for n in (lo, hi)}
    for _ in range(rounds):
        for ncpu in (lo, hi):
            for phase in phases:
                cmd = [
                    "taskset", "-c", f"0-{ncpu - 1}",
                    sys.executable, os.path.join(here, "bench.py"),
                    "--scaling-phase", phase, str(ncpu),
                ]
                t0 = time.time()
                res = subprocess.run(cmd, capture_output=True, text=True)
                if res.returncode != 0:
                    raise RuntimeError(res.stderr[-2000:])
                r = json.loads(res.stdout.strip().splitlines()[-1])
                r["co_tenant_p50"] = sampler.window_p50(t0, time.time())
                b = best[(phase, ncpu)]
                if b is None or r["throughput"] > b["throughput"]:
                    best[(phase, ncpu)] = r
    cpu_ratio = hi / lo
    report: dict = {
        "metric": "scaling efficiency (pinned cores, interleaved best-of)",
        "protocol": (
            f"taskset -c 0..N-1, fresh process per run, {rounds} interleaved "
            "rounds, best throughput per level; ray.init(num_cpus=N) matches "
            "the pinned core count"
        ),
        "cpus": [lo, hi],
        "phases": {},
    }
    for p in phases:
        blo, bhi = best[(p, lo)], best[(p, hi)]
        eff = round((bhi["throughput"] / blo["throughput"]) / cpu_ratio, 3)
        report["phases"][p] = {
            "throughput_lo": blo["throughput"],
            "throughput_hi": bhi["throughput"],
            "unit": {"spmv": "edges/sec (p20 iter)",
                     "bvgraph": "arcs/sec (decode)",
                     "bvgenc": "arcs/sec (encode)"}.get(p, "docs/sec"),
            "efficiency": eff,
            "co_tenant_p50_kept": [
                blo.get("co_tenant_p50"), bhi.get("co_tenant_p50")
            ],
        }
    report["quiet_gate"] = gate
    report["contention"] = sampler.summary()
    # headline = the WORST phase (ADVICE r2: max() let one well-scaling
    # phase mask a poorly-scaling one; min() is the honest aggregate)
    report["scaling_efficiency"] = min(
        v["efficiency"] for v in report["phases"].values()
    )
    return report


if __name__ == "__main__":
    if "--scaling-phase" in sys.argv:
        i = sys.argv.index("--scaling-phase")
        print(json.dumps(run_scaling_phase(sys.argv[i + 1], int(sys.argv[i + 2]))))
    elif "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
