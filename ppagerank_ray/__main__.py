"""CLI driver — the engine's analogue of the reference's ppagerank_main.cc.

Reference CLI surface (ppagerank_main.cc:78-152): -m <matrix> [-mhint ...]
[-alpha] [-alg power|inout|arnoldi] [-tol] [-maxiter] [-pvec file]
[-trans] [-script]. Ours swaps the matrix file for a pages Parquet source
(directory containing documents.parquet, per BASELINE.json input_hint) and —
unlike the reference, which never writes results (SURVEY.md K1) — always
writes partitioned Parquet output plus a JSON run summary.

Examples:
  python -m ppagerank_ray --sf /root/testdata/sf0.001 --alg power \
      --alpha 0.85 --tol 1e-7 --out /tmp/scores
  python -m ppagerank_ray --sf ... --algo components --out /tmp/comp
  echo '{"alg":"power","alpha":0.95}' | python -m ppagerank_ray --sf ... \
      --script --out /tmp/runs        # script mode: one JSON spec per line

Run under `ray job submit -- python -m ppagerank_ray ...` on a cluster; in
the sandbox it initializes a local session itself (guarded).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_spec_line(line: str) -> dict:
    """One -script line → run-spec dict. Accepts BOTH this engine's JSON
    lines and the reference's CLI-option-line syntax
    (`-alpha 0.95 -alg arnoldi`, ppagerank_main.cc:368-404 /
    util/command_line.hpp:39-132), so the reference's own test_script runs
    verbatim."""
    import shlex

    if line.startswith("{"):
        return json.loads(line)
    toks = shlex.split(line)
    spec: dict = {}

    def is_value(tok: str) -> bool:
        # a token is an option VALUE unless it looks like a flag; negative
        # numbers ('-0.5', '-1e-3') start with '-' but are values (ADVICE r2)
        if not tok.startswith("-"):
            return True
        return len(tok) > 1 and (tok[1].isdigit() or tok[1] == ".")

    i = 0
    while i < len(toks):
        tok = toks[i]
        if tok.startswith("-") and not is_value(tok):
            key = tok.lstrip("-")
            if i + 1 < len(toks) and is_value(toks[i + 1]):
                spec[key] = toks[i + 1]
                i += 2
            else:
                spec[key] = True  # bare flag (e.g. -trans)
                i += 1
        else:
            i += 1
    return spec


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="ppagerank_ray")
    g_in = ap.add_mutually_exclusive_group(required=True)
    g_in.add_argument("--sf", help="pages input dir with documents.parquet")
    g_in.add_argument("--matrix", help="BSMAT (+.degs), BVGraph basename "
                      "(.graph/.properties pair) or parquet edge table "
                      "(-m in the reference); weights row-normalized")
    ap.add_argument("--mhint", default=None,
                    choices=[None, "bsmat", "bvgraph", "parquet"],
                    help="format hint (-mhint in the reference)")
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "components", "labelprop", "triangles",
                             "kcore", "bfs", "scc", "hosts", "walks",
                             "mis", "matching", "coloring", "wl", "louvain",
                             "pprsweep"])
    ap.add_argument("--seed", type=int, default=0,
                    help="BFS source vertex id (--algo bfs) / walk PRNG "
                    "seed (--algo walks)")
    ap.add_argument("--walk-length", type=int, default=8)
    ap.add_argument("--walks-per-vertex", type=int, default=1)
    ap.add_argument("--p", type=float, default=1.0,
                    help="node2vec return parameter (p=q=1 → uniform walks)")
    ap.add_argument("--q", type=float, default=1.0,
                    help="node2vec in-out parameter")
    ap.add_argument("--alg", default="power", choices=["power", "inout", "arnoldi"],
                    help="PageRank algorithm (-alg in the reference)")
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-7)
    ap.add_argument("--maxiter", type=int, default=10000)
    ap.add_argument("--pvec", default=None,
                    help="parquet file of (id, value) personalization vector")
    ap.add_argument("--trans", action="store_true",
                    help="treat the loaded matrix as transposed storage "
                    "(file holds M = A^T): normalize M's COLUMNS and iterate "
                    "y = M*x (reference -trans, ppagerank.cc:177-231). "
                    "Requires --matrix.")
    ap.add_argument("--replicate", type=int, default=1)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--wrows", type=int, default=0,
                    help="row weight in the edge-partition balance "
                    "(reference -matload_redistribute_wrows; its default "
                    "is 1, ours 0 = pure edge count)")
    ap.add_argument("--wnnz", type=int, default=1,
                    help="nonzero weight in the edge-partition balance "
                    "(reference -matload_redistribute_wnnz)")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--lp-rounds", type=int, default=0,
                    help="label propagation rounds (0 = to fixpoint)")
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=0)
    ap.add_argument("--out", required=True, help="output parquet directory")
    ap.add_argument("--script", action="store_true",
                    help="read one JSON run-spec per stdin line (reference -script)")
    ap.add_argument("--num-cpus", type=int, default=0)
    args = ap.parse_args(argv)
    if args.trans and not args.matrix:
        # -trans is a property of the stored matrix file
        # (ppagerank_main.cc:121-122); a pages build has no storage
        # orientation to transpose
        print(json.dumps({"error": "--trans requires --matrix (it declares "
                          "the FILE's storage orientation)"}), file=sys.stderr)
        return 2

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus or None,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ppagerank_ray import tune_data_context

    tune_data_context()

    import numpy as np

    from ppagerank_ray.algos.components import connected_components, label_propagation
    from ppagerank_ray.algos.pagerank import arnoldi, inner_outer, power_iteration
    from ppagerank_ray.algos.triangles import triangle_count
    from ppagerank_ray.config import PageRankConfig
    from ppagerank_ray.engine.vertex_engine import VertexEngine
    from ppagerank_ray.graph.build import build_graph, build_undirected
    from ppagerank_ray.sources.pages import synth_pages

    t0 = time.time()
    if args.matrix:
        from ppagerank_ray.graph.build import load_normalized_matrix

        gt = load_normalized_matrix(
            args.matrix, hint=args.mhint, trans=args.trans
        )
    else:
        gt = build_graph(synth_pages(args.sf, replicate=args.replicate))
    summary: dict = {
        "n_vertices": gt.n_vertices,
        "n_edges": gt.n_edges,
        "build_sec": round(time.time() - t0, 3),
    }

    def load_pvec(path: str) -> np.ndarray:
        """-pvec semantics (ppagerank.cc:74-78, 91-104) + the sum-to-1 check
        the reference left as a TODO (ppagerank.cc:106)."""
        import pyarrow.parquet as pq

        t = pq.read_table(path)
        v = np.zeros(gt.n_vertices, dtype=np.float64)
        v[t["id"].to_numpy()] = t["value"].to_numpy()
        if not np.isclose(v.sum(), 1.0, atol=1e-9):
            raise ValueError(f"personalization vector sums to {v.sum()}, not 1")
        return v

    algos = {"power": power_iteration, "inout": inner_outer, "arnoldi": arnoldi}

    if args.algo == "pagerank":
        eng = VertexEngine(gt.n_vertices, args.partitions, n_threads=args.threads,
                           wrows=args.wrows, wnnz=args.wnnz)
        eng.load_directed(gt.edges, presorted=gt.edges_sorted)
        v = load_pvec(args.pvec) if args.pvec else None
        if args.script:
            runs = []
            for i, line in enumerate(sys.stdin):
                line = line.strip()
                if not line:
                    continue
                spec = parse_spec_line(line)
                fn = algos.get(spec.get("alg", "power"))
                if fn is None:  # tolerate unknown alg (ppagerank_main.cc:449-452)
                    runs.append({"run": i, "error": "unknown alg"})
                    continue
                cfg = PageRankConfig(
                    alpha=float(spec.get("alpha", args.alpha)),
                    tol=float(spec.get("tol", args.tol)),
                    maxiter=int(spec.get("maxiter", args.maxiter)),
                )
                info = fn(eng, cfg, v=v) if fn is power_iteration else fn(eng, cfg, v=v)
                runs.append({"run": i, "alg": spec.get("alg", "power"),
                             "iterations": info["iteration"],
                             "residual_l1": info["residual_l1"]})
                eng.result_dataset("x", "score").write_parquet(
                    f"{args.out}/run_{i:03d}"
                )
            summary["runs"] = runs
        else:
            fn = algos[args.alg]
            cfg = PageRankConfig(alpha=args.alpha, tol=args.tol, maxiter=args.maxiter)
            if fn is power_iteration:
                info = fn(eng, cfg, v=v, checkpoint_dir=args.checkpoint_dir,
                          checkpoint_every=args.checkpoint_every)
            else:
                info = fn(eng, cfg, v=v)
            summary.update({k: info[k] for k in ("iteration", "residual_l1", "converged")})
            summary["output"] = eng.write_result_partitioned(args.out, "x", "score")
        eng.shutdown()
    elif args.algo in ("components", "labelprop", "kcore", "bfs",
                       "mis", "matching", "coloring", "wl", "louvain"):
        eng = VertexEngine(gt.n_vertices, args.partitions, n_threads=args.threads,
                           wrows=args.wrows, wnnz=args.wnnz)
        eng.load_undirected(build_undirected(gt.edges), presorted=True)
        if args.algo == "components":
            info = connected_components(eng)
            vec, colname = "label", "component"
        elif args.algo == "labelprop":
            info = label_propagation(eng, num_rounds=args.lp_rounds)
            vec, colname = "label", "label"
        elif args.algo == "kcore":
            from ppagerank_ray.algos.kcore import kcore_decomposition

            info = kcore_decomposition(eng)
            vec, colname = "core", "core"
        elif args.algo == "mis":
            from ppagerank_ray.algos.mis import maximal_independent_set

            info = maximal_independent_set(eng, seed=args.seed or 7)
            vec, colname = "mis_status", "mis_status"
        elif args.algo == "matching":
            from ppagerank_ray.algos.matching import maximal_matching

            info = maximal_matching(eng, seed=args.seed or 13)
            vec, colname = "partner", "match_with"
        elif args.algo == "coloring":
            from ppagerank_ray.algos.coloring import greedy_coloring

            info = greedy_coloring(eng, seed=args.seed or 17)
            vec, colname = "color", "color"
        elif args.algo == "wl":
            from ppagerank_ray.algos.wl import wl_refinement

            info = wl_refinement(eng, rounds=args.lp_rounds or 3)
            vec, colname = "wl", "wl_color"
        elif args.algo == "louvain":
            from ppagerank_ray.algos.louvain import louvain_communities

            info = louvain_communities(eng, rounds=args.lp_rounds or 8)
            vec, colname = "lv_comm", "community"
        else:  # bfs
            from ppagerank_ray.algos.structure import bfs_distances

            info = bfs_distances(eng, [args.seed])
            # unreachable sentinel → -1 in the written result
            import ray as _ray

            _ray.get(
                [
                    w.ivec_replace_ge.remote("dist", info["sentinel"], -1)
                    for w in eng.workers
                ]
            )
            vec, colname = "dist", "dist"
        summary["rounds"] = info["rounds"]
        summary["output"] = eng.write_result_partitioned(
            args.out, vec, colname, integer=True
        )
        eng.shutdown()
    elif args.algo == "scc":
        from ppagerank_ray.algos.scc import strongly_connected_components

        eng, info = strongly_connected_components(
            gt.edges, gt.n_vertices, args.partitions, keep_engine=True
        )
        summary["phases"] = info["phases"]
        # labels are phase-root member ids (a valid SCC labeling); the
        # min-member canonical form is a driver-side relabel offered by
        # algos.scc.canonical_labels for answer-scale consumers
        summary["output"] = eng.write_result_partitioned(
            args.out, "scc", "scc", integer=True
        )
        eng.shutdown()
    elif args.algo == "walks":
        from ppagerank_ray.functions.walks import node2vec_walks, random_walks

        if args.p == 1.0 and args.q == 1.0:
            corpus = random_walks(
                gt.edges, gt.n_vertices, length=args.walk_length,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed,
            )
        else:
            corpus = node2vec_walks(
                gt.edges, gt.n_vertices, length=args.walk_length,
                p=args.p, q=args.q,
                walks_per_vertex=args.walks_per_vertex, seed=args.seed,
            )
        corpus.write_parquet(args.out)
        summary["n_corpus_rows"] = corpus.count()
        summary["n_walks"] = gt.n_vertices * args.walks_per_vertex
    elif args.algo == "pprsweep":
        import os

        import numpy as _np
        import pyarrow.parquet as pq

        from ppagerank_ray.algos.pprpush import ppr_push, sweep_cut

        pp = ppr_push(gt.edges, gt.n_vertices, seed=args.seed or None)
        sw = sweep_cut(gt.edges, pp)
        summary["support"] = pp.num_rows
        cond = sw["conductance"].to_numpy()
        if len(cond):
            i = int(_np.argmin(cond))
            summary["best_t"] = int(sw["t"][i].as_py())
            summary["best_conductance"] = float(cond[i])
        os.makedirs(args.out, exist_ok=True)
        pq.write_table(sw, f"{args.out}/ppr_sweep.parquet")
    elif args.algo == "hosts":
        import os

        import pyarrow.parquet as pq

        from ppagerank_ray.graph.hosts import host_edges

        he = host_edges(gt)
        summary["n_host_edges"] = he.num_rows
        os.makedirs(args.out, exist_ok=True)
        pq.write_table(he, f"{args.out}/host_edges.parquet")
    else:  # triangles
        summary["n_triangles"] = triangle_count(gt.edges, gt.n_vertices)
        import pyarrow as pa
        import pyarrow.parquet as pq

        import os

        os.makedirs(args.out, exist_ok=True)
        pq.write_table(
            pa.Table.from_pydict({"n_triangles": [summary["n_triangles"]]}),
            f"{args.out}/triangles.parquet",
        )

    summary["total_sec"] = round(time.time() - t0, 3)
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
