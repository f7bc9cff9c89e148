"""Deduplication operators: exact, MinHash+LSH, SimHash, exact n-gram Jaccard.

Training-data-pipeline operators over the documents table. The reference's
input formats are pre-deduped (SURVEY.md §2.7), so these are engine-only;
they follow the standard sketch constructions and are fully deterministic
(fixed permutation seeds — no per-run randomness).

Scale shape (ray_guide 'Aggregation at scale'):
  * exact dedup — content-hash per batch (vectorizable), then ONE
    groupby(hash) shuffle of the hashed keys, never of the texts.
  * MinHash — a *stateful actor pool* (`MinHasher`): the 64 permutation
    coefficients are built once per actor in __init__ (SURVEY §7.2),
    signatures stream out as (band, band_hash, doc_id) rows; candidate
    generation is one groupby on the band keys; verification computes exact
    Jaccard only for candidates.
  * the candidate-pair set and its verification corpus are assumed small
    relative to the input (near-dup fraction ≪ 1); verification broadcasts
    only the involved docs' shingle sets. A 100 TB run would replace the
    broadcast with a repartition join of candidates against shingles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Count, Min

SHINGLE_K = 5
NUM_PERM = 64
LSH_BANDS = 16
LSH_ROWS = 4  # NUM_PERM == LSH_BANDS * LSH_ROWS
_MERSENNE = np.uint64((1 << 61) - 1)
_SEED = 42
_MAX_BUCKET = 500  # cap pairs per LSH bucket; larger buckets are logged+capped
_NGROUPS = 1024  # coarse shuffle groups for vectorized bucket processing


def shingle_hashes(text: str) -> np.ndarray:
    """Distinct char-5-gram hashes: base-257 polynomial over utf-8 bytes
    (deterministic, fits in 41 bits — no modular reduction needed)."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < SHINGLE_K:
        return np.empty(0, dtype=np.uint64)
    h = b[: len(b) - SHINGLE_K + 1].copy()
    for i in range(1, SHINGLE_K):
        h = h * np.uint64(257) + b[i : len(b) - SHINGLE_K + 1 + i]
    return np.unique(h)


def _perm_coeffs(rng_seed: int = _SEED) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(rng_seed)
    a = rng.integers(1, (1 << 61) - 1, size=NUM_PERM, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=NUM_PERM, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """64-perm signature: min over shingles of (a·h + b) mod (2^61−1).
    uint64 multiplication wraps mod 2^64 — that is itself a fixed
    deterministic hash family, which is all MinHash needs."""
    if len(sh) == 0:
        return np.full(NUM_PERM, _MERSENNE, dtype=np.uint64)
    vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
    return vals.min(axis=1)


class MinHasher:
    """Actor-pool stage: permutations built once per actor (__init__),
    batches → exploded (band, band_hash, doc_id) rows."""

    def __init__(self):
        self.a, self.b = _perm_coeffs()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        texts = t["text"].to_pylist()
        n = len(ids)
        band_col = np.empty(n * LSH_BANDS, dtype=np.int64)
        hash_col = np.empty(n * LSH_BANDS, dtype=np.uint64)
        id_col = np.empty(n * LSH_BANDS, dtype=np.int64)
        for i, text in enumerate(texts):
            sig = minhash_signature(shingle_hashes(text), self.a, self.b)
            bands = sig.reshape(LSH_BANDS, LSH_ROWS)
            # fold each band's rows into one 64-bit key
            bh = np.zeros(LSH_BANDS, dtype=np.uint64)
            for r in range(LSH_ROWS):
                bh = bh * np.uint64(1_000_003) + bands[:, r]
            s = slice(i * LSH_BANDS, (i + 1) * LSH_BANDS)
            band_col[s] = np.arange(LSH_BANDS)
            hash_col[s] = bh
            id_col[s] = ids[i]
        gkey = (
            (hash_col ^ (band_col.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)))
            % np.uint64(_NGROUPS)
        ).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "band": band_col,
                "band_hash": hash_col.astype(np.int64),  # reinterpret, stable
                "doc_id": id_col,
                "g": gkey,
            }
        )


_PERMS_CACHE = None


def minhash_bands_batch(t: pa.Table) -> pa.Table:
    """Stateless variant of MinHasher for task-pool stages: permutation
    coefficients cached per worker process (module global) instead of per
    actor. Identical output."""
    global _PERMS_CACHE
    if _PERMS_CACHE is None:
        _PERMS_CACHE = _perm_coeffs()
    hasher = MinHasher.__new__(MinHasher)
    hasher.a, hasher.b = _PERMS_CACHE
    return hasher(t)


def lsh_candidate_pairs(
    docs: rd.Dataset, concurrency: int = 2, use_actors: bool = False
) -> rd.Dataset:
    """Distinct candidate pairs (id_a < id_b) that share ≥1 LSH band.

    Buckets are shuffled by a COARSE group key (hash of the bucket key mod
    {_NGROUPS}) rather than one group per bucket: one python call then
    processes thousands of buckets with a single lexsort + run-length scan
    (a per-bucket map_groups costs a Python call per bucket — measured 25s
    vs <1s on 5k docs). Buckets never straddle groups because the group key
    is a pure function of the bucket key."""
    import ray

    if use_actors:
        # actor-pool variant: permutations in __init__ (the SURVEY §7.2
        # pattern); pays ~1s/actor startup per invocation
        cpus = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(1, min(concurrency, cpus - 1))  # don't starve shuffle
        bands = docs.select_columns(["doc_id", "text"]).map_batches(
            MinHasher, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
        )
    else:
        # default: stateless tasks on the warm worker pool; permutations
        # cached per process (same output, no actor spin-up)
        bands = docs.select_columns(["doc_id", "text"]).map_batches(
            minhash_bands_batch, batch_format="pyarrow", batch_size=4096
        )

    def pairs(group) -> pa.Table:
        b = np.asarray(group["band"])
        h = np.asarray(group["band_hash"])
        d = np.asarray(group["doc_id"])
        order = np.lexsort((d, h, b))
        b, h, d = b[order], h[order], d[order]
        run_break = (np.diff(b) != 0) | (np.diff(h) != 0)
        starts = np.concatenate([[0], np.flatnonzero(run_break) + 1, [len(b)]])
        lens = np.diff(starts)
        out_a, out_b = [], []
        for ri in np.flatnonzero(lens >= 2):
            a0, a1 = int(starts[ri]), int(starts[ri + 1])
            ids = d[a0:a1]
            if len(ids) > _MAX_BUCKET:  # no silent caps
                print(f"lsh bucket capped: {len(ids)} -> {_MAX_BUCKET}")
                ids = ids[:_MAX_BUCKET]
            ii, jj = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ii])
            out_b.append(ids[jj])
        if not out_a:
            return pa.Table.from_pydict(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64)}
            )
        return pa.Table.from_pydict(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    from ppagerank_ray.graph.build import shuffle_blocks

    cand = bands.repartition(shuffle_blocks()).groupby("g").map_groups(
        pairs, batch_format="numpy"
    )
    return (
        cand.repartition(shuffle_blocks())
        .groupby(["id_a", "id_b"])
        .count()
        .select_columns(["id_a", "id_b"])
    )


def verify_jaccard(
    docs: rd.Dataset, cand: rd.Dataset, threshold: float
) -> pa.Table:
    """Exact char-5-gram Jaccard for candidate pairs; keeps jaccard ≥ τ.
    Returns (id_a, id_b, jaccard) sorted. Candidate set is assumed
    driver-small (near-dup fraction ≪ 1)."""
    pairs = cand.to_pandas()
    if len(pairs) == 0:
        return pa.Table.from_pydict(
            {
                "id_a": np.empty(0, np.int64),
                "id_b": np.empty(0, np.int64),
                "jaccard": np.empty(0, np.float64),
            }
        )
    involved = set(pairs["id_a"]) | set(pairs["id_b"])
    involved_ref = ray.put(involved)

    def shingles_of_involved(t: pa.Table) -> pa.Table:
        want = ray.get(involved_ref)
        ids = t["doc_id"].to_numpy()
        keep = [i for i, d in enumerate(ids) if int(d) in want]
        out_ids, out_sh = [], []
        texts = t["text"].to_pylist()
        for i in keep:
            out_ids.append(int(ids[i]))
            out_sh.append(shingle_hashes(texts[i]).astype(np.int64))
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "sh": pa.array(out_sh, type=pa.list_(pa.int64())),
            }
        )

    sh_tbl = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(shingles_of_involved, batch_format="pyarrow")
        .to_pandas()
    )
    sh_map = {int(r.doc_id): set(r.sh) for r in sh_tbl.itertuples()}
    out_a, out_b, out_j = [], [], []
    for r in pairs.itertuples():
        a, b = sh_map[int(r.id_a)], sh_map[int(r.id_b)]
        if not a and not b:
            continue
        inter = len(a & b)
        jac = inter / (len(a) + len(b) - inter)
        if jac >= threshold:
            out_a.append(int(r.id_a))
            out_b.append(int(r.id_b))
            out_j.append(round(jac, 6))
    order = np.lexsort((out_b, out_a)) if out_a else np.empty(0, np.int64)
    return pa.Table.from_pydict(
        {
            "id_a": np.asarray(out_a, np.int64)[order],
            "id_b": np.asarray(out_b, np.int64)[order],
            "jaccard": np.asarray(out_j, np.float64)[order],
        }
    )


def near_dup_pairs(docs: rd.Dataset, threshold: float = 0.7) -> pa.Table:
    """MinHash-LSH candidates + exact Jaccard verification ≥ τ."""
    return verify_jaccard(docs, lsh_candidate_pairs(docs), threshold)


def _sb_blocks():
    from ppagerank_ray.graph.build import shuffle_blocks

    return shuffle_blocks()


def exact_dedup(docs: rd.Dataset) -> rd.Dataset:
    """Per distinct text: (keep_id = min doc_id, n_copies). Texts never
    shuffle — only their md5 keys do."""
    import hashlib

    def add_hash(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.Table.from_pydict(
            {"doc_id": t["doc_id"], "h": pa.array(hs, type=pa.string())}
        )

    hashed = docs.select_columns(["doc_id", "text"]).map_batches(
        add_hash, batch_format="pyarrow", batch_size=8192
    )
    return (
        hashed.repartition(_sb_blocks())
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_copies"))
        .select_columns(["keep_id", "n_copies"])
    )


# ---------------------------------------------------------------------------
# SimHash (64-bit, token-level)
# ---------------------------------------------------------------------------


def _token_hash64(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit token hashes (FNV-1a, vector-friendly)."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, tok in enumerate(tokens):
        h = np.uint64(0xCBF29CE484222325)
        for c in tok.encode("utf-8"):
            h = np.uint64((int(h) ^ c) * 0x100000001B3 & 0xFFFFFFFFFFFFFFFF)
        out[i] = h
    return out


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    hs = _token_hash64(toks)
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    counts = bits.sum(axis=0)
    sig = (counts * 2 > len(toks)).astype(np.uint64)
    return int((sig << np.arange(64, dtype=np.uint64)).sum())


def simhash_batch(t: pa.Table) -> pa.Table:
    sigs = np.array(
        [simhash64(x) for x in t["text"].to_pylist()], dtype=np.uint64
    ).astype(np.int64)
    return pa.Table.from_pydict({"doc_id": t["doc_id"], "simhash": sigs})


def simhashes(docs: rd.Dataset) -> rd.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow", batch_size=4096
    )
