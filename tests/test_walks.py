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
