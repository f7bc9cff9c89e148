"""Random-walk corpus sampling (functions/walks.py): exact sequential
replay oracle, shard-count invariance, dangling termination."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ppagerank_ray.functions.walks import numpy_walk_oracle, random_walks


def _rand_graph(n=80, e=400, seed=5):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e).astype(np.int64)
    dst = rng.integers(0, n, e).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    key = src * n + dst
    uniq = np.unique(key)
    return uniq // n, uniq % n


def _canon(t) -> pd.DataFrame:
    df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
    return (
        df.sort_values(["walk_id", "step"]).reset_index(drop=True)
        [["walk_id", "step", "vertex"]]
    )


def test_walks_match_numpy_replay():
    n = 80
    src, dst = _rand_graph(n)
    keep = src < 60  # vertices 60..79 have no out-edges → truncated walks
    src, dst = src[keep], dst[keep]
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))
    out = random_walks(ds, n, length=6, walks_per_vertex=2, seed=11,
                       num_shards=4)
    exp = numpy_walk_oracle(src, dst, n, length=6, walks_per_vertex=2,
                            seed=11)
    got = _canon(out)
    assert len(got) == len(_canon(exp))
    pd.testing.assert_frame_equal(got, _canon(exp))
    # dangling starts emit exactly their step-0 row
    w_dangling = got[got.walk_id == 61]
    assert list(w_dangling.step) == [0] and list(w_dangling.vertex) == [61]


def test_walks_shard_invariance():
    n = 50
    src, dst = _rand_graph(n, 300, seed=7)
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))
    a = _canon(random_walks(ds, n, length=5, seed=3, num_shards=1))
    b = _canon(random_walks(ds, n, length=5, seed=3, num_shards=5))
    pd.testing.assert_frame_equal(a, b)


def test_skipgram_pairs_vs_python():
    """skipgram_pairs vs pairs counted directly from the replay-oracle
    corpus (forward window, same walk)."""
    from collections import Counter

    from ppagerank_ray.functions.walks import skipgram_pairs

    n = 40
    src, dst = _rand_graph(n, 200, seed=9)
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))
    corpus = random_walks(ds, n, length=5, seed=2, num_shards=3)
    got = (
        skipgram_pairs(corpus, window=2)
        .to_pandas()
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )

    exp_tbl = numpy_walk_oracle(src, dst, n, length=5, seed=2).to_pandas()
    exp = Counter()
    for _, grp in exp_tbl.groupby("walk_id"):
        steps = grp.sort_values("step")[["step", "vertex"]].to_numpy()
        for i in range(len(steps)):
            for j in range(i + 1, len(steps)):
                if steps[j, 0] - steps[i, 0] <= 2:
                    exp[(steps[i, 1], steps[j, 1])] += 1
    exp_df = (
        pd.DataFrame(
            [(c, x, v) for (c, x), v in exp.items()],
            columns=["center", "context", "n"],
        )
        .sort_values(["center", "context"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp_df, check_dtype=False)


def test_node2vec_p1q1_equals_uniform_walks():
    """With p=q=1 every proposal is accepted on attempt 0 and the counter
    streams coincide, so node2vec emits a BIT-IDENTICAL corpus to
    random_walks."""
    from ppagerank_ray.functions.walks import node2vec_walks

    n = 60
    src, dst = _rand_graph(n, 350, seed=11)
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))
    uni = _canon(random_walks(ds, n, length=5, seed=4, num_shards=4))
    n2v = _canon(
        node2vec_walks(ds, n, length=5, p=1.0, q=1.0, seed=4, num_shards=4)
    )
    pd.testing.assert_frame_equal(uni, n2v)


def test_node2vec_matches_replay_and_shards():
    from ppagerank_ray.functions.walks import (
        node2vec_walks,
        numpy_node2vec_oracle,
    )

    n = 50
    src, dst = _rand_graph(n, 300, seed=13)
    # symmetrize so returns and triangles exist (all three weight classes)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    key = s2 * n + d2
    uniq = np.unique(key)
    src, dst = uniq // n, uniq % n
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))
    got = _canon(
        node2vec_walks(ds, n, length=5, p=0.5, q=2.0, seed=7, num_shards=4)
    )
    exp = _canon(
        numpy_node2vec_oracle(src, dst, n, length=5, p=0.5, q=2.0, seed=7)
    )
    pd.testing.assert_frame_equal(got, exp)
    one = _canon(
        node2vec_walks(ds, n, length=5, p=0.5, q=2.0, seed=7, num_shards=1)
    )
    pd.testing.assert_frame_equal(got, one)


def test_node2vec_nondyadic_pq_matches_replay():
    """Round-4 VERDICT item 8: the determinism claim must not be
    dyadic-only. With p=0.3, q=1.7 the weight ratios w/wmax are
    NON-terminating binary fractions, so this pins the float-comparison
    contract (u < w/wmax evaluated identically: one float64 divide and
    compare on both sides) — the sharded sampler must still replay the
    numpy oracle bit-for-bit, at 4 shards and 1 shard."""
    from ppagerank_ray.functions.walks import (
        node2vec_walks,
        numpy_node2vec_oracle,
    )

    n = 50
    src, dst = _rand_graph(n, 300, seed=17)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    uniq = np.unique(s2 * n + d2)
    src, dst = uniq // n, uniq % n
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))
    got = _canon(
        node2vec_walks(ds, n, length=6, p=0.3, q=1.7, seed=19, num_shards=4)
    )
    exp = _canon(
        numpy_node2vec_oracle(src, dst, n, length=6, p=0.3, q=1.7, seed=19)
    )
    pd.testing.assert_frame_equal(got, exp)
    one = _canon(
        node2vec_walks(ds, n, length=6, p=0.3, q=1.7, seed=19, num_shards=1)
    )
    pd.testing.assert_frame_equal(got, one)


def test_node2vec_bias_direction():
    """Small p favors immediate returns; large p suppresses them —
    measured on a symmetrized graph over many walks."""
    from ppagerank_ray.functions.walks import node2vec_walks

    n = 40
    src, dst = _rand_graph(n, 240, seed=17)
    s2 = np.concatenate([src, dst])
    d2 = np.concatenate([dst, src])
    key = s2 * n + d2
    uniq = np.unique(key)
    src, dst = uniq // n, uniq % n
    ds = rd.from_arrow(pa.Table.from_pydict({"src": src, "dst": dst}))

    def return_rate(p, q):
        t = node2vec_walks(
            ds, n, length=8, p=p, q=q, walks_per_vertex=6, seed=1,
            num_shards=3,
        ).to_pandas().sort_values(["walk_id", "step"])
        by_walk = t.groupby("walk_id")["vertex"].apply(list)
        ret = tot = 0
        for seq in by_walk:
            for i in range(2, len(seq)):
                tot += 1
                ret += seq[i] == seq[i - 2]
        return ret / max(tot, 1)

    low_p = return_rate(0.25, 1.0)   # returns boosted 4x
    high_p = return_rate(4.0, 1.0)   # returns damped 4x
    assert low_p > high_p * 1.5, (low_p, high_p)
