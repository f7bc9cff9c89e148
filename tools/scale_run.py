"""Round-4 scale-up evidence run (VERDICT item 7): the headline pipelines
at ~10× the per-round bench scale, proving the scale gates fire and the
driver's memory stays flat. Each phase prints its own JSON line AS IT
COMPLETES (so a timeout loses nothing), with the engine manifests'
per-iteration SpMV shuffle bytes and driver RSS.

Phases (PHASES env, comma list; default all):
  e2e        build_graph → engine → PageRank at replicate=1200
             (6M pages vs the bench's 600k) + components on the graph
  pagerank   formula graph at 40M pages / ~122M edges (bench: 4M/12.2M)
  minhash    MinHash → LSH candidates → verified near-dup pairs over the
             documents table replicated 10× (clones carry a distinct
             suffix token, so clone-groups are near- not exact-dups)
  betweenness  32-seed multi-source Brandes at `pages` scale — evidences
             the (k,·) wave matrices' memory shape beyond sf0.1
  greedy / truss / signatures / linkpred — see phase bodies

Every run starts with bench.py's quiet gate (PPR_BENCH_NO_GATE=1 skips)
and keeps bench.py's co-tenant sampler running: each emitted JSON line
carries `co_tenant_p50` for ITS OWN wall-clock window plus the shared
gate decision, so scale rows are born quiet-tagged (round-4 VERDICT
item 7 — earlier BASELINE 10× tables mixed burst-inflated rows with
quiet reruns and needed forensics to tell them apart).

Usage: PHASES=e2e python tools/scale_run.py [replicate] [pages] [doc_copies]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def _salt(s: str, uid: int) -> str:
    """Splice a hashed (doc, position)-unique hex token every 8 chars:
    shared 5-grams with the unsalted text drop to ~½ of the original
    DISTINCT-gram set while each insertion adds grams unique to this doc
    AND position — Jaccard vs base or vs any sibling replica < 0.1 even on
    highly templated text. Two earlier attempts failed instructively: a
    constant per-doc token adds too few DISTINCT grams (templated docs
    have few distinct original grams, sibling J stayed ~0.7), and readable
    `u{uid}p{i}` tokens share digit-tail grams between sibling uids (J
    ~0.8); hashing decorrelates the token text."""
    return "".join(
        f"{s[i : i + 8]} {((uid * 1000003 + i) * 2654435761) % 4294967296:08x} "
        for i in range(0, len(s), 8)
    )


def rss_gib() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return round(int(line.split()[1]) / 1048576, 2)
    return -1.0


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 40_000_000
    doc_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    phases = set(
        os.environ.get("PHASES", "e2e,pagerank,minhash").split(",")
    )

    from bench import _ContentionSampler, _quiet_gate

    gate = _quiet_gate()
    sampler = _ContentionSampler(interval=2.0)
    sampler.start()
    t_phase = time.time()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    # deliberately NOT tune_data_context(): its 2MiB blocks are for the
    # MB-scale bench inputs; at 6M pages (~10GB of text) they shatter the
    # pipeline into thousands of tiny tasks that each rebuild the
    # broadcast url hash set — Ray's 128MiB defaults are the scale
    # setting (the function's own docstring says so)
    from ppagerank_ray.algos.components import connected_components
    from ppagerank_ray.algos.pagerank import power_iteration
    from ppagerank_ray.config import PageRankConfig
    from ppagerank_ray.engine.vertex_engine import VertexEngine
    from ppagerank_ray.functions.dedup import near_dup_pairs
    from ppagerank_ray.graph.build import build_graph, build_undirected
    from ppagerank_ray.sources.edges import n_vertices_for, synth_edges
    from ppagerank_ray.sources.pages import synth_pages

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    ncpu = int(ray.cluster_resources()["CPU"])
    P = min(8, ncpu)
    T = max(1, ncpu // P)

    def emit(rec: dict) -> None:
        nonlocal t_phase
        rec["rss_gib"] = rss_gib()
        rec["co_tenant_p50"] = sampler.window_p50(t_phase, time.time())
        rec["gate"] = gate
        t_phase = time.time()
        print(json.dumps(rec), flush=True)

    if "e2e" in phases:
        rec: dict = {"phase": "e2e", "replicate": replicate}
        t0 = time.time()
        gt = build_graph(synth_pages(sf_dir, replicate=replicate))
        rec["build_sec"] = round(time.time() - t0, 1)
        rec["vertices"] = gt.n_vertices
        rec["edges"] = gt.n_edges
        eng = VertexEngine(gt.n_vertices, num_partitions=P, n_threads=T)
        t0 = time.time()
        eng.load_directed(gt.edges, presorted=gt.edges_sorted)
        rec["load_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        info = power_iteration(eng, PageRankConfig(alpha=0.85, tol=1e-6))
        rec["pagerank_sec"] = round(time.time() - t0, 1)
        rec["iterations"] = info["iteration"]
        rec["shuffle"] = eng.shuffle_profile()
        eng.shutdown()
        emit(rec)

        rec = {"phase": "components", "replicate": replicate}
        und = build_undirected(gt.edges)
        ceng = VertexEngine(gt.n_vertices, num_partitions=P, n_threads=T)
        t0 = time.time()
        ceng.load_undirected(und, presorted=True)
        rec["load_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        cc = connected_components(ceng)
        rec["fixpoint_sec"] = round(time.time() - t0, 1)
        rec["rounds"] = cc["rounds"]
        ceng.shutdown()
        del gt
        emit(rec)

    if "pagerank" in phases:
        rec = {"phase": "pagerank", "pages": pages}
        nv = n_vertices_for(pages)
        edges = synth_edges(pages, parallelism=ncpu * 4)
        eng = VertexEngine(nv, num_partitions=P, n_threads=T)
        t0 = time.time()
        n_edges = eng.load_directed(edges, presorted=True)
        rec["load_sec"] = round(time.time() - t0, 1)
        rec["edges"] = n_edges
        power_iteration(eng, PageRankConfig(alpha=0.85, tol=0.0, maxiter=2))
        t0 = time.time()
        power_iteration(eng, PageRankConfig(alpha=0.85, tol=0.0, maxiter=5))
        rec["iter5_sec"] = round(time.time() - t0, 1)
        iter_secs = sorted(h["sec"] for h in eng.history)
        p20 = iter_secs[max(0, len(iter_secs) // 5 - 1)]
        rec["sec_per_iter_p20"] = round(p20, 3)
        rec["edges_per_sec"] = round(n_edges / p20)
        rec["shuffle"] = eng.shuffle_profile()
        eng.shutdown()
        emit(rec)

    if "greedy" in phases:
        # round-4 greedy trio (MIS / local-max matching / Jones-Plassmann
        # coloring) on the formula graph at `pages` scale: the evidence
        # is the ROUND COUNT staying O(log n) while per-round cost stays
        # one (or two) sparse min-exchanges
        from ppagerank_ray.algos.coloring import greedy_coloring
        from ppagerank_ray.algos.matching import maximal_matching
        from ppagerank_ray.algos.mis import maximal_independent_set
        from ppagerank_ray.algos.wl import wl_refinement
        from ppagerank_ray.algos.louvain import louvain_communities

        nv = n_vertices_for(pages)
        und = build_undirected(synth_edges(pages, parallelism=ncpu * 4))
        geng = VertexEngine(nv, num_partitions=P, n_threads=T)
        t0 = time.time()
        n_und = geng.load_undirected(und, presorted=True)
        load_sec = round(time.time() - t0, 1)
        from functools import partial

        # louvain: the vertex-aligned volume path (round-5) — driver RSS
        # must stay O(P) vs round-4's 1.88 GiB broadcast-table merge
        for name, fn in (
            ("mis", maximal_independent_set),
            ("matching", maximal_matching),
            ("coloring", greedy_coloring),
            ("wl", wl_refinement),
            ("louvain", partial(louvain_communities, volumes="engine")),
        ):
            rec = {"phase": f"greedy_{name}", "pages": pages,
                   "und_edges": n_und, "load_sec": load_sec}
            t0 = time.time()
            info = fn(geng)
            rec["sec"] = round(time.time() - t0, 1)
            rec.update({k: v for k, v in info.items() if k != "algorithm"})
            emit(rec)
        geng.shutdown()

    if "betweenness" in phases:
        # 32-seed multi-source Brandes on the formula graph at `pages`
        # scale (round-4 VERDICT item 5): the evidence is the (k,·) wave
        # matrices keeping worker memory flat and the per-level masked
        # SpMV exchanges staying balanced — recorded via shuffle_profile
        # + driver RSS like the greedy quintet
        from ppagerank_ray.algos.betweenness import betweenness

        nv = n_vertices_for(pages)
        rec = {"phase": "betweenness", "pages": pages, "seeds": 32}
        und = build_undirected(
            synth_edges(pages, parallelism=ncpu * 4)
        ).materialize()  # consumed twice (BFS + SpMV loads)
        beng = VertexEngine(nv, num_partitions=P, n_threads=T)
        t0 = time.time()
        rec["und_edges"] = beng.load_undirected(und, presorted=True)
        beng.load_directed(und)
        rec["load_sec"] = round(time.time() - t0, 1)
        seeds = [(s * 2654435761) % nv for s in range(32)]
        t0 = time.time()
        info = betweenness(beng, seeds=seeds)
        rec["sec"] = round(time.time() - t0, 1)
        rec["bfs_rounds_total"] = info["bfs_rounds_total"]
        rec["wave"] = info["wave"]
        rec["shuffle"] = beng.shuffle_profile()
        beng.shutdown()
        emit(rec)

    if "pprpush" in phases:
        # round-5 local-PPR push + ACL sweep at `pages` scale: the
        # evidence is LOCALITY — support (nonzero p/r vertices) bounded
        # by O(1/(eps*alpha)) and flat driver RSS while the graph is
        # 10-100× the bench scale; the sweep's driver state is
        # support-sized, never O(V)
        from ppagerank_ray.algos.pprpush import SCALE, ppr_push, sweep_cut

        nv = n_vertices_for(pages)
        rec = {"phase": "pprpush", "pages": pages}
        pedges = synth_edges(pages, parallelism=ncpu * 4).materialize()
        t0 = time.time()
        pp = ppr_push(pedges, nv)
        rec["push_sec"] = round(time.time() - t0, 1)
        rec["support"] = pp.num_rows
        rec["support_frac"] = round(pp.num_rows / nv, 8)
        rec["mass_conserved"] = bool(
            int(pp["p_mass"].to_numpy().sum() + pp["r_mass"].to_numpy().sum())
            == SCALE
        )
        t0 = time.time()
        sw = sweep_cut(pedges, pp)
        rec["sweep_sec"] = round(time.time() - t0, 1)
        c = sw["conductance"].to_numpy()
        if len(c):
            i = int(np.argmin(c))
            rec["best_t"] = int(sw["t"][i].as_py())
            rec["best_conductance"] = round(float(c[i]), 6)
        emit(rec)

    if "truss" in phases:
        # per-edge support + 4-truss peeling at `pages` scale — the
        # evidence is peeling converging in a few rounds with the wedge
        # machinery's gates doing the work each round
        from ppagerank_ray.algos.truss import edge_support_and_truss

        nv = n_vertices_for(pages)
        rec = {"phase": "truss", "pages": pages}
        t0 = time.time()
        sup_ds, surv_ds, rounds = edge_support_and_truss(
            synth_edges(pages, parallelism=ncpu * 4), nv, k=4
        )
        rec["sec"] = round(time.time() - t0, 1)
        rec["rounds"] = rounds
        rec["support_edges"] = sup_ds.count()
        rec["truss_edges"] = surv_ds.count()
        emit(rec)

    if "signatures" in phases:
        # 10× the bench's minhash_text phase: band signatures over
        # replicate//2 × the synthetic page corpus (bench: 300k texts at
        # replicate=120 — pass replicate=12000 for 3M)
        from ppagerank_ray.functions.dedup import minhash_bands_batch

        rec = {"phase": "signatures", "replicate": replicate}
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
            .materialize()
        )
        rec["docs"] = docs_rep.count()
        t0 = time.time()
        docs_rep.map_batches(
            minhash_bands_batch, batch_format="pyarrow", batch_size=2048
        ).count()
        rec["signatures_sec"] = round(time.time() - t0, 1)
        rec["docs_per_sec"] = round(rec["docs"] / rec["signatures_sec"])
        emit(rec)

    if "linkpred" in phases:
        # link prediction on the formula graph at `pages` scale. Wedge
        # work is O(Σ deg²), so the two web-scale controls are exercised
        # for real: hash-sampling (LP_SAMPLE_MOD, default 64 — pair table
        # shrinks 64×, surviving scores exact) and the hub valve
        # (LP_MAX_CENTER_DEG, default 4096 — formula graphs have bounded
        # degree, so at defaults the valve must NOT fire).
        rec = {"phase": "linkpred", "pages": pages}
        from ppagerank_ray.algos.linkpred import link_prediction

        smod = int(os.environ.get("LP_SAMPLE_MOD", "64"))
        vmax = int(os.environ.get("LP_MAX_CENTER_DEG", "4096"))
        rec["sample_mod"], rec["max_center_degree"] = smod, vmax
        nv = n_vertices_for(pages)
        edges = synth_edges(pages, parallelism=ncpu * 4)
        t0 = time.time()
        lp = link_prediction(
            edges, nv, sample_mod=smod, max_center_degree=vmax
        ).materialize()
        rec["linkpred_sec"] = round(time.time() - t0, 1)
        rec["pairs"] = lp.count()
        top = lp.sort("aa_e9", descending=True).limit(3).to_pandas()
        rec["top_aa_e9"] = [int(x) for x in top["aa_e9"]]
        emit(rec)

    if "minhash" in phases:
        # 10× corpus with a REALISTIC duplication structure: replica 0 is
        # the base text; for doc_id % 5 == 0 replica 1 is a near-dup clone
        # (tiny suffix, J≈1); every other replica gets a doc-unique salt
        # token spliced every 8 chars, which destroys 5-gram similarity to
        # the base AND to sibling replicas (shared surviving grams ≲0.25 of
        # the union — well under τ=0.7). Expected true pairs = n_docs/5.
        #
        # SCALE_DUP_MODE=all keeps the old adversarial corpus (EVERY doc a
        # member of a 10-clone group): verification is then inherently
        # O(copies² · corpus · shingles/doc) ≈ 500GB of tagged-sort traffic
        # — measured 25 min for 3/64 blocks before we killed it; that mode
        # documents the quadratic wall, it is not a throughput benchmark.
        dup_mode = os.environ.get("SCALE_DUP_MODE", "sparse")
        rec = {"phase": "minhash", "doc_copies": doc_copies, "dup_mode": dup_mode}
        docs = rd.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        n_docs = docs.count()

        def clone(t: pa.Table) -> pa.Table:
            ids, texts = [], []
            base_ids = t["doc_id"].to_numpy()
            base_txt = t["text"].to_pylist()
            for k in range(doc_copies):
                new_ids = base_ids + np.int64(k * n_docs * 10)
                ids.append(new_ids)
                if dup_mode == "all" or k == 0:
                    texts.extend(s + f" clonetoken{k}" for s in base_txt)
                elif k == 1:
                    texts.extend(
                        s + " clonetoken" if d % 5 == 0
                        else _salt(s, int(nid))
                        for s, d, nid in zip(base_txt, base_ids, new_ids)
                    )
                else:
                    texts.extend(
                        _salt(s, int(nid))
                        for s, nid in zip(base_txt, new_ids)
                    )
            return pa.Table.from_pydict(
                {
                    "doc_id": np.concatenate(ids),
                    "text": pa.array(texts, pa.string()),
                }
            )

        big_docs = docs.map_batches(
            clone, batch_format="pyarrow", batch_size=1024
        ).materialize()
        rec["docs"] = big_docs.count()
        from ppagerank_ray.functions.dedup import (
            lsh_candidate_pairs, verify_jaccard,
        )

        t0 = time.time()
        cand = lsh_candidate_pairs(big_docs).materialize()
        rec["candidates"] = cand.count()
        rec["lsh_candidates_sec"] = round(time.time() - t0, 1)
        t0 = time.time()
        pairs = verify_jaccard(big_docs, cand, threshold=0.7)
        rec["verify_sec"] = round(time.time() - t0, 1)
        rec["pairs"] = pairs.num_rows
        emit(rec)

    ray.shutdown()


if __name__ == "__main__":
    main()
