"""Microbench for the round-4 event-window kernel rewrite.

Compares the OLD shape (groupby(user_id).map_groups → one pandas Python
call per user) against the NEW shape (one hash exchange + one segmented
numpy pass per partition) on a synthetic events table with many users —
the regime the round-3 verdict flagged (per-group call overhead dominates
at web-scale user counts).

Usage: python tools/bench_windows.py [n_users] [events_per_user]
Prints one JSON line with both times per operator and the speedups.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")


def synth_events(n_users: int, per_user: int) -> pa.Table:
    rng = np.random.default_rng(7)
    n = n_users * per_user
    uid = np.repeat(np.arange(n_users, dtype=np.int64), per_user)
    base = np.int64(1_700_000_000_000_000)
    ts = base + rng.integers(0, 86_400_000_000, n).astype(np.int64)
    return pa.Table.from_pydict(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": uid,
            "value": rng.random(n).round(3),
            "event_type": np.where(rng.random(n) < 0.3, "click", "view"),
        }
    )


def old_sessionize(events, gap_sec=1800):
    """The round-3 shape: one Python call per user group."""
    from ppagerank_ray.graph.build import shuffle_blocks

    def sessions_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(ts) > gap_sec * 1_000_000
        sess = np.concatenate([[0], np.cumsum(gaps)]).astype(np.int64)
        out = (
            g.assign(session_idx=sess)
            .groupby("session_idx", as_index=False)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "size"),
                total_value=("value", "sum"),
            )
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        out["total_value"] = out["total_value"].round(6)
        return out[
            ["user_id", "session_idx", "session_start", "session_end",
             "n_events", "total_value"]
        ]

    return (
        events.select_columns(["event_id", "ts", "user_id", "value"])
        .repartition(shuffle_blocks())
        .groupby("user_id")
        .map_groups(sessions_of_user, batch_format="pandas")
    )


def main() -> None:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    per_user = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from ppagerank_ray.functions.windows import sessionize, sliding_window_counts

    tab = synth_events(n_users, per_user)
    ds = rd.from_arrow(tab).materialize()

    out: dict = {"n_users": n_users, "n_events": tab.num_rows}

    t0 = time.time()
    n_new = sessionize(ds).count()
    out["sessionize_new_sec"] = round(time.time() - t0, 2)

    t0 = time.time()
    n_old = old_sessionize(ds).count()
    out["sessionize_old_sec"] = round(time.time() - t0, 2)
    assert n_new == n_old, (n_new, n_old)
    out["sessionize_speedup"] = round(
        out["sessionize_old_sec"] / out["sessionize_new_sec"], 1
    )

    t0 = time.time()
    sliding_window_counts(ds).count()
    out["sliding_new_sec"] = round(time.time() - t0, 2)

    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
