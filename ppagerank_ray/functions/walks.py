"""DeepWalk-style distributed random-walk corpus sampling.

Training-data operator for graph embeddings (DeepWalk, node2vec p=q=1):
`walks_per_vertex` fixed-length truncated random walks from every vertex
over the directed edge table, emitted as a (walk_id, step, vertex) corpus
Dataset. No reference analogue (the reference computes spectral scores,
ppagerank.cc; walk sampling is the embedding-era counterpart).

Scale shape — the vertex engine's all-to-all, not a per-step join:

* **Adjacency shards** (actor pool, state built ONCE): shard p holds a
  hash-partitioned CSR of the srcs with `hash(src) % P == p`, fed by ONE
  bucketing pass over the edge blocks (`_bucket_block`, num_returns=P) —
  every edge is read once total, not once per shard. No driver-side O(E)
  or O(V) state.
* **Walk shards** (actor pool): shard q owns walk_ids ≡ q (mod Q), holding
  (pos, alive) arrays plus its slice of the growing corpus. Per step, each
  walk shard scatters (local_idx, pos) requests split by target adjacency
  shard (`num_returns=P` object refs — the engine's scatter pattern,
  SURVEY.md §4), each adjacency shard answers every walk shard in one
  vectorized lookup, and walk shards append the step to their corpus.
  Driver traffic is O(P·Q) refs per step; positions never leave workers.
* Walks hitting a dangling vertex (no out-edges) terminate — truncated
  walks, standard for DeepWalk corpora.

Determinism: the step choice is `splitmix64(walk_id·K1 + step·K2 + seed)
mod outdeg(pos)` over the dst-sorted neighbor list — independent of P, Q,
batch boundaries and scheduling (tested: exact numpy replay oracle, and
P/Q-invariance).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ppagerank_ray.algos.anf import splitmix64

_K1 = np.uint64(0x100000001B3)  # FNV prime; distinct per-walk stream
_K2 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio step stride


def step_choices(
    walk_ids: np.ndarray, step: int, seed: int, degs: np.ndarray
) -> np.ndarray:
    """Deterministic neighbor index per walk: splitmix64 counter mod deg.
    degs must be > 0 (dangling walks are filtered before choosing)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        h = splitmix64(
            walk_ids.astype(np.uint64) * _K1
            + np.uint64(step) * _K2
            + np.uint64(seed)
        )
        return (h % degs.astype(np.uint64)).astype(np.int64)


@ray.remote
def _bucket_block(t: pa.Table, P: int) -> list:
    """ONE pass over an edge block → P hash-bucket sub-tables (src % P),
    so adjacency construction reads every edge once total instead of once
    per shard."""
    if t.num_rows == 0:
        return [t] * P
    s = t["src"].to_numpy().astype(np.int64)
    order = np.argsort(s % P, kind="stable")
    sorted_mod = (s % P)[order]
    bounds = np.searchsorted(sorted_mod, np.arange(P + 1))
    tt = t.take(pa.array(order))
    return [tt.slice(bounds[p], bounds[p + 1] - bounds[p]) for p in range(P)]


class _AdjShard:
    """CSR over the srcs hashed to this shard (hash = src % P, stable)."""

    def __init__(self, pid: int, P: int, bucket_refs) -> None:
        self.pid, self.P = pid, P
        srcs, dsts = [], []
        for t in ray.get(list(bucket_refs)):
            if t.num_rows == 0:
                continue
            srcs.append(t["src"].to_numpy().astype(np.int64))
            dsts.append(t["dst"].to_numpy().astype(np.int64))
        if srcs:
            s = np.concatenate(srcs)
            d = np.concatenate(dsts)
            order = np.lexsort((d, s))  # (src, dst) sort: deterministic lists
            s, d = s[order], d[order]
            self.uniq, counts = np.unique(s, return_counts=True)
            self.indptr = np.concatenate([[0], np.cumsum(counts)])
            self.indices = d
        else:
            self.uniq = np.empty(0, np.int64)
            self.indptr = np.zeros(1, np.int64)
            self.indices = np.empty(0, np.int64)

    def ready(self) -> int:
        return len(self.uniq)

    def sample(self, step: int, seed: int, *requests):
        """requests: one (walk_ids, positions) pair-array per walk shard;
        returns (per walk shard) the next position, -1 where dangling."""
        out = []
        for req in requests:
            wid, pos = req
            nxt = np.full(len(pos), -1, dtype=np.int64)
            if len(pos) and len(self.uniq):
                row = np.searchsorted(self.uniq, pos)
                row_ok = (row < len(self.uniq)) & (
                    self.uniq[np.minimum(row, len(self.uniq) - 1)] == pos
                )
                if row_ok.any():
                    r = row[row_ok]
                    deg = self.indptr[r + 1] - self.indptr[r]
                    idx = step_choices(wid[row_ok], step, seed, deg)
                    nxt[row_ok] = self.indices[self.indptr[r] + idx]
            out.append(nxt)
        return out if len(out) > 1 else out[0]


class _WalkShard:
    """Owns walk_ids ≡ qid (mod Q): positions + the growing corpus."""

    def __init__(self, qid: int, Q: int, P: int, n_vertices: int,
                 walks_per_vertex: int) -> None:
        self.qid, self.Q, self.P = qid, Q, P
        total = n_vertices * walks_per_vertex
        self.wid = np.arange(qid, total, Q, dtype=np.int64)
        self.pos = self.wid % n_vertices  # walk r*V+v starts at v
        self.alive = np.ones(len(self.wid), bool)
        self.corpus_w = [self.wid.copy()]
        self.corpus_s = [np.zeros(len(self.wid), np.int64)]
        self.corpus_v = [self.pos.copy()]

    def scatter(self):
        """Split live walks by target adjacency shard → P request pairs."""
        live = np.flatnonzero(self.alive)
        tgt = self.pos[live] % self.P
        order = np.argsort(tgt, kind="stable")
        live = live[order]
        bounds = np.searchsorted(tgt[order], np.arange(self.P + 1))
        self._live_by_tgt = [
            live[bounds[p]: bounds[p + 1]] for p in range(self.P)
        ]
        reqs = [
            (self.wid[ix], self.pos[ix]) for ix in self._live_by_tgt
        ]
        return reqs if self.P > 1 else reqs[0]

    def advance(self, step: int, *answers) -> int:
        """Apply per-adjacency-shard next positions; record step rows."""
        for ix, nxt in zip(self._live_by_tgt, answers):
            if len(ix) == 0:
                continue
            dead = nxt < 0
            self.alive[ix[dead]] = False
            ok = ix[~dead]
            self.pos[ok] = nxt[~dead]
            self.corpus_w.append(self.wid[ok])
            self.corpus_s.append(np.full(len(ok), step, np.int64))
            self.corpus_v.append(self.pos[ok])
        return int(self.alive.sum())

    def corpus(self) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "walk_id": np.concatenate(self.corpus_w),
                "step": np.concatenate(self.corpus_s),
                "vertex": np.concatenate(self.corpus_v),
            }
        )


AdjShard = ray.remote(num_cpus=0)(_AdjShard)
WalkShard = ray.remote(num_cpus=0)(_WalkShard)


def random_walks(
    edges: rd.Dataset,
    n_vertices: int,
    length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 0,
    num_shards: int = 4,
) -> rd.Dataset:
    """Sample `walks_per_vertex` truncated random walks of ≤ `length`
    steps from every vertex. Returns a (walk_id, step, vertex) Dataset;
    step 0 is the start vertex, walks stop early at dangling vertices.
    Deterministic for fixed seed — invariant to num_shards."""
    P = Q = max(1, int(num_shards))
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    if P == 1:
        adj = [AdjShard.remote(0, 1, refs)]
    else:
        bucket_mat = [
            _bucket_block.options(num_returns=P).remote(r, P) for r in refs
        ]
        adj = [
            AdjShard.remote(p, P, [row[p] for row in bucket_mat])
            for p in range(P)
        ]
    ray.get([a.ready.remote() for a in adj])
    walks = [
        WalkShard.remote(q, Q, P, n_vertices, walks_per_vertex)
        for q in range(Q)
    ]
    for step in range(1, length + 1):
        req_mat = [
            w.scatter.options(num_returns=P).remote() for w in walks
        ]
        if P == 1:
            req_mat = [[r] for r in req_mat]
        ans_mat = [
            adj[p].sample.options(num_returns=Q).remote(
                step, seed, *[req_mat[q][p] for q in range(Q)]
            )
            for p in range(P)
        ]
        if Q == 1:
            ans_mat = [[a] for a in ans_mat]
        alive = ray.get(
            [
                w.advance.remote(step, *[ans_mat[p][q] for p in range(P)])
                for q, w in enumerate(walks)
            ]
        )
        if sum(alive) == 0:
            break
    tables = ray.get([w.corpus.remote() for w in walks])
    out = rd.from_arrow(tables)
    for w in walks + adj:
        ray.kill(w)
    return out


def numpy_walk_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    n_vertices: int,
    length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 0,
) -> "pa.Table":
    """Independent sequential replay of the exact sampling rule (for
    tests): same splitmix64 counter, same dst-sorted neighbor lists."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    uniq, counts = np.unique(s, return_counts=True)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    total = n_vertices * walks_per_vertex
    rows_w, rows_s, rows_v = [], [], []
    for wid in range(total):
        pos = wid % n_vertices
        rows_w.append(wid), rows_s.append(0), rows_v.append(pos)
        for step in range(1, length + 1):
            r = np.searchsorted(uniq, pos)
            if r >= len(uniq) or uniq[r] != pos:
                break  # dangling
            deg = indptr[r + 1] - indptr[r]
            idx = int(
                step_choices(
                    np.array([wid], np.int64), step, seed,
                    np.array([deg], np.int64),
                )[0]
            )
            pos = int(d[indptr[r] + idx])
            rows_w.append(wid), rows_s.append(step), rows_v.append(pos)
    return pa.Table.from_pydict(
        {
            "walk_id": np.array(rows_w, np.int64),
            "step": np.array(rows_s, np.int64),
            "vertex": np.array(rows_v, np.int64),
        }
    )


def skipgram_pairs(
    corpus: rd.Dataset, window: int = 2, n_buckets: int = 32
) -> rd.Dataset:
    """(center, context) co-occurrence counts from a walk corpus — the
    skip-gram training input DeepWalk feeds word2vec. Directed pairs
    within `window` FORWARD steps on the same walk (context after center;
    symmetrize downstream if needed).

    Scale shape: one bucketed hash self-join on walk_id (walks are short,
    so the join fans out ≤ window rows per corpus row) followed by a
    pre-aggregated (pair-key combiner) groupby — corpus rows shuffle
    once, pair counts shuffle vocabulary²-bounded partials."""
    from ray.data.aggregate import Sum

    from ppagerank_ray.ops.joins import hash_join

    left = corpus.map_batches(
        lambda t: pa.Table.from_pydict(
            {"walk_id": t["walk_id"], "s1": t["step"], "v1": t["vertex"]}
        ),
        batch_format="pyarrow",
    )
    right = corpus.map_batches(
        lambda t: pa.Table.from_pydict(
            {"walk_id": t["walk_id"], "s2": t["step"], "v2": t["vertex"]}
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(left, right, "walk_id", "walk_id", n_buckets=n_buckets)

    def pair_partials(t: pa.Table) -> pa.Table:
        s1 = t["s1"].to_numpy()
        s2 = t["s2"].to_numpy()
        keep = (s2 > s1) & (s2 - s1 <= window)
        if not keep.any():
            return pa.Table.from_pydict(
                {"center": pa.array([], type=pa.int64()),
                 "context": pa.array([], type=pa.int64()),
                 "n": pa.array([], type=pa.int64())}
            )
        c = t["v1"].to_numpy()[keep].astype(np.int64)
        x = t["v2"].to_numpy()[keep].astype(np.int64)
        # structured-dtype unique like _N2VAdjShard.pairs: no c*hi+x key
        # packing, so no int64 wrap/collision at vertex counts above ~3e9
        pairs = np.empty(len(c), dtype=[("c", "<i8"), ("x", "<i8")])
        pairs["c"] = c
        pairs["x"] = x
        uk, cnt = np.unique(pairs, return_counts=True)
        return pa.Table.from_pydict(
            {"center": uk["c"], "context": uk["x"],
             "n": cnt.astype(np.int64)}
        )

    return (
        joined.map_batches(pair_partials, batch_format="pyarrow")
        .groupby(["center", "context"])
        .aggregate(Sum("n", alias_name="n"))
    )


# ---------- node2vec biased walks (second-order, rejection-sampled) ----------

_K3 = np.uint64(0xD6E8FEB86659FD93)  # attempt stride (distinct stream)
_K4 = np.uint64(0xA24BAED4963EE407)  # accept-uniform stream salt


def _counter_hash(walk_ids, step, attempt, seed, salt=np.uint64(0)):
    with np.errstate(over="ignore"):
        return splitmix64(
            walk_ids.astype(np.uint64) * _K1
            + np.uint64(step) * _K2
            + np.uint64(attempt) * _K3
            + np.uint64(seed)
            + salt
        )


def biased_step_choices(walk_ids, step, attempt, seed, degs):
    """Proposal index for (step, attempt). attempt=0 reproduces
    step_choices exactly (K3·0 = 0), so p=q=1 node2vec — which accepts
    every first proposal — emits bit-identical corpora to random_walks."""
    h = _counter_hash(walk_ids, step, attempt, seed)
    with np.errstate(over="ignore"):
        return (h % degs.astype(np.uint64)).astype(np.int64)


def accept_uniforms(walk_ids, step, attempt, seed) -> np.ndarray:
    """Deterministic U[0,1) per (walk, step, attempt) for the rejection
    test."""
    h = _counter_hash(walk_ids, step, attempt, seed, salt=_K4)
    return h.astype(np.float64) / float(1 << 64)


class _N2VAdjShard(_AdjShard):
    """Adjacency shard + pair-membership index (structured-dtype binary
    search — safe at any V, no key-packing overflow)."""

    def __init__(self, pid: int, P: int, bucket_refs) -> None:
        super().__init__(pid, P, bucket_refs)
        n = len(self.indices)
        pairs = np.empty(n, dtype=[("s", "<i8"), ("d", "<i8")])
        # CSR back to per-edge src: run-length expand uniq by row degree
        degs = np.diff(self.indptr)
        pairs["s"] = np.repeat(self.uniq, degs)
        pairs["d"] = self.indices
        self.pairs = pairs  # (src,dst)-lexsorted by construction

    def propose(self, step: int, seed: int, attempt: int, *requests):
        """Per walk shard: (wid, pos) → proposed next vertex (-1 dangling)."""
        out = []
        for wid, pos in requests:
            nxt = np.full(len(pos), -1, dtype=np.int64)
            if len(pos) and len(self.uniq):
                row = np.searchsorted(self.uniq, pos)
                row_ok = (row < len(self.uniq)) & (
                    self.uniq[np.minimum(row, len(self.uniq) - 1)] == pos
                )
                if row_ok.any():
                    r = row[row_ok]
                    deg = self.indptr[r + 1] - self.indptr[r]
                    idx = biased_step_choices(
                        wid[row_ok], step, attempt, seed, deg
                    )
                    nxt[row_ok] = self.indices[self.indptr[r] + idx]
            out.append(nxt)
        return out if len(out) > 1 else out[0]

    def member(self, *requests):
        """Per walk shard: (u, x) pair arrays → bool 'x ∈ N_out(u)'."""
        out = []
        for u, x in requests:
            if len(u) == 0 or len(self.pairs) == 0:
                out.append(np.zeros(len(u), bool))
                continue
            q = np.empty(len(u), dtype=self.pairs.dtype)
            q["s"], q["d"] = u, x
            i = np.searchsorted(self.pairs, q)
            i_c = np.minimum(i, len(self.pairs) - 1)
            out.append((i < len(self.pairs)) & (self.pairs[i_c] == q))
        return out if len(out) > 1 else out[0]


class _N2VWalkShard(_WalkShard):
    """Walk shard with second-order state (prev vertex) and the
    rejection-sampling bookkeeping for one step."""

    def __init__(self, qid, Q, P, n_vertices, walks_per_vertex,
                 p: float, q: float) -> None:
        super().__init__(qid, Q, P, n_vertices, walks_per_vertex)
        self.prev = np.full(len(self.wid), -1, dtype=np.int64)
        self.inv_p, self.inv_q = 1.0 / p, 1.0 / q
        self.wmax = max(self.inv_p, 1.0, self.inv_q)

    def begin_step(self):
        self._pending = np.flatnonzero(self.alive)
        self._proposal = np.full(len(self.wid), -1, dtype=np.int64)

    def scatter_pending_by_pos(self):
        """(wid, pos) requests for the still-rejected walks, by shard(pos)."""
        pend = self._pending
        tgt = self.pos[pend] % self.P
        order = np.argsort(tgt, kind="stable")
        pend = pend[order]
        bounds = np.searchsorted(tgt[order], np.arange(self.P + 1))
        self._pend_by_tgt = [
            pend[bounds[p]: bounds[p + 1]] for p in range(self.P)
        ]
        reqs = [(self.wid[ix], self.pos[ix]) for ix in self._pend_by_tgt]
        return reqs if self.P > 1 else reqs[0]

    def take_proposals(self, *answers):
        """Store proposals; dangling walks die immediately. Then emit the
        membership queries (prev, proposal) routed by shard(prev).
        First-step walks (prev == -1) skip membership (uniform step)."""
        for ix, nxt in zip(self._pend_by_tgt, answers):
            if len(ix) == 0:
                continue
            dead = nxt < 0
            self.alive[ix[dead]] = False
            self._proposal[ix[~dead]] = nxt[~dead]
        self._pending = self._pending[self.alive[self._pending]]
        pend = self._pending
        tgt = np.where(self.prev[pend] >= 0, self.prev[pend] % self.P, 0)
        order = np.argsort(tgt, kind="stable")
        self._memq_by_tgt = []
        pend = pend[order]
        bounds = np.searchsorted(tgt[order], np.arange(self.P + 1))
        self._memq_by_tgt = [
            pend[bounds[p]: bounds[p + 1]] for p in range(self.P)
        ]
        reqs = [
            (self.prev[ix], self._proposal[ix]) for ix in self._memq_by_tgt
        ]
        return reqs if self.P > 1 else reqs[0]

    def resolve(self, step: int, seed: int, attempt: int,
                force: bool, *member_answers) -> int:
        """Accept/reject; returns number of walks still pending.
        force=True (the max_attempts backstop) accepts every pending
        proposal — deterministic, negligible bias at sane p/q."""
        for ix, mem in zip(self._memq_by_tgt, member_answers):
            if len(ix) == 0:
                continue
            x = self._proposal[ix]
            u = self.prev[ix]
            w = np.where(
                x == u, self.inv_p, np.where(mem, 1.0, self.inv_q)
            )
            w = np.where(u < 0, self.wmax, w)  # first step: uniform
            if force:
                acc = np.ones(len(ix), bool)
            else:
                acc = accept_uniforms(self.wid[ix], step, attempt, seed) < (
                    w / self.wmax
                )
            ok = ix[acc]
            self.prev[ok] = self.pos[ok]
            self.pos[ok] = x[acc]
            self.corpus_w.append(self.wid[ok])
            self.corpus_s.append(np.full(len(ok), step, np.int64))
            self.corpus_v.append(self.pos[ok])
            keep = np.zeros(len(self.alive), bool)
            keep[self._pending] = True
            keep[ok] = False
            self._pending = np.flatnonzero(keep & self.alive)
        return len(self._pending)


N2VAdjShard = ray.remote(num_cpus=0)(_N2VAdjShard)
N2VWalkShard = ray.remote(num_cpus=0)(_N2VWalkShard)


def node2vec_walks(
    edges: rd.Dataset,
    n_vertices: int,
    length: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_vertex: int = 1,
    seed: int = 0,
    num_shards: int = 4,
    max_attempts: int = 64,
) -> rd.Dataset:
    """node2vec second-order biased walks (Grover & Leskovec 2016) via
    DETERMINISTIC rejection sampling (the KnightKing strategy): propose a
    uniform out-neighbor of cur, accept with probability w/wmax where w =
    1/p if proposal == prev, 1 if proposal ∈ N_out(prev), else 1/q — no
    per-(prev,cur) alias tables, so state stays O(E) total. Membership
    queries route to the shard owning prev (structured-dtype binary
    search over the (src,dst)-sorted pair index). All proposal/accept
    randomness is splitmix64 counters ⇒ shard-count invariant, replayable
    (numpy oracle below), and p=q=1 emits BIT-IDENTICAL corpora to
    random_walks. After max_attempts rejections a walk accepts its last
    proposal (deterministic, negligible bias at sane p/q — documented)."""
    P = Q = max(1, int(num_shards))
    refs = edges.select_columns(["src", "dst"]).to_arrow_refs()
    if P == 1:
        adj = [N2VAdjShard.remote(0, 1, refs)]
    else:
        bucket_mat = [
            _bucket_block.options(num_returns=P).remote(r, P) for r in refs
        ]
        adj = [
            N2VAdjShard.remote(p_, P, [row[p_] for row in bucket_mat])
            for p_ in range(P)
        ]
    ray.get([a.ready.remote() for a in adj])
    walks = [
        N2VWalkShard.remote(q_, Q, P, n_vertices, walks_per_vertex, p, q)
        for q_ in range(Q)
    ]
    for step in range(1, length + 1):
        ray.get([w.begin_step.remote() for w in walks])
        for attempt in range(max_attempts):
            force = attempt == max_attempts - 1
            req_mat = [
                w.scatter_pending_by_pos.options(num_returns=P).remote()
                for w in walks
            ]
            if P == 1:
                req_mat = [[r] for r in req_mat]
            prop_mat = [
                adj[p_].propose.options(num_returns=Q).remote(
                    step, seed, attempt, *[req_mat[q_][p_] for q_ in range(Q)]
                )
                for p_ in range(P)
            ]
            if Q == 1:
                prop_mat = [[a] for a in prop_mat]
            memq_mat = [
                w.take_proposals.options(num_returns=P).remote(
                    *[prop_mat[p_][q_] for p_ in range(P)]
                )
                for q_, w in enumerate(walks)
            ]
            if P == 1:
                memq_mat = [[m] for m in memq_mat]
            mem_mat = [
                adj[p_].member.options(num_returns=Q).remote(
                    *[memq_mat[q_][p_] for q_ in range(Q)]
                )
                for p_ in range(P)
            ]
            if Q == 1:
                mem_mat = [[m] for m in mem_mat]
            pending = ray.get(
                [
                    w.resolve.remote(
                        step, seed, attempt, force,
                        *[mem_mat[p_][q_] for p_ in range(P)],
                    )
                    for q_, w in enumerate(walks)
                ]
            )
            if sum(pending) == 0:
                break
    tables = ray.get([w.corpus.remote() for w in walks])
    out = rd.from_arrow(tables)
    for w in walks + adj:
        ray.kill(w)
    return out


def numpy_node2vec_oracle(
    src: np.ndarray,
    dst: np.ndarray,
    n_vertices: int,
    length: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_vertex: int = 1,
    seed: int = 0,
    max_attempts: int = 64,
) -> "pa.Table":
    """Independent sequential replay of the node2vec rejection sampler
    (for tests): same counters, same neighbor order, same force-accept
    backstop."""
    order = np.lexsort((dst, src))
    s, d = src[order], dst[order]
    uniq, counts = np.unique(s, return_counts=True)
    indptr = np.concatenate([[0], np.cumsum(counts)])
    pairset = set(zip(s.tolist(), d.tolist()))
    inv_p, inv_q = 1.0 / p, 1.0 / q
    wmax = max(inv_p, 1.0, inv_q)
    total = n_vertices * walks_per_vertex
    rows_w, rows_s, rows_v = [], [], []
    for wid in range(total):
        prev, pos = -1, wid % n_vertices
        rows_w.append(wid), rows_s.append(0), rows_v.append(pos)
        for step in range(1, length + 1):
            r = np.searchsorted(uniq, pos)
            if r >= len(uniq) or uniq[r] != pos:
                break  # dangling
            deg = int(indptr[r + 1] - indptr[r])
            wid_a = np.array([wid], np.int64)
            accepted = None
            for attempt in range(max_attempts):
                idx = int(
                    biased_step_choices(
                        wid_a, step, attempt, seed, np.array([deg], np.int64)
                    )[0]
                )
                x = int(d[indptr[r] + idx])
                if prev < 0:
                    w = wmax
                elif x == prev:
                    w = inv_p
                elif (prev, x) in pairset:
                    w = 1.0
                else:
                    w = inv_q
                if (
                    attempt == max_attempts - 1
                    or accept_uniforms(wid_a, step, attempt, seed)[0]
                    < w / wmax
                ):
                    accepted = x
                    break
            prev, pos = pos, accepted
            rows_w.append(wid), rows_s.append(step), rows_v.append(pos)
    return pa.Table.from_pydict(
        {
            "walk_id": np.array(rows_w, np.int64),
            "step": np.array(rows_s, np.int64),
            "vertex": np.array(rows_v, np.int64),
        }
    )
