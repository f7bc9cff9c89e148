"""Windowed / sessionized event aggregates over the events table.

The reference has no streaming/window layer (its inputs are static
matrices); these are engine-only training-data-pipeline operators per the
build brief ("windowed aggregate, a streaming window" custom-operator
class), expressed as Ray Data compositions:

* tumbling windows — `floor_temporal` + groupby aggregate (see
  __ray_entry__._q_events_windowed);
* sessionization (gaps-and-islands) — ONE hash shuffle
  (`groupby(user_id)`), then per-group vectorized numpy: sort by
  (ts, event_id), split where the gap exceeds the timeout. The standard
  partitioning assumption: one user's events fit one group (holds at any
  realistic per-user event count; a pathological user would be salted by
  (user_id, day)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SESSION_GAP_SEC = 1800  # 30 min


def sessionize(events: rd.Dataset, gap_sec: int = SESSION_GAP_SEC) -> rd.Dataset:
    """Per-user sessions: maximal event runs with inter-event gap ≤ gap_sec.
    Returns (user_id, session_idx, session_start, session_end, n_events,
    total_value); session_idx is 0-based in time order per user."""
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


def asof_join_events(
    events: rd.Dataset, left_type: str = "click", right_type: str = "view",
    how: str = "left",
) -> rd.Dataset:
    """Per-user backward AS-OF join — an operator Ray Data lacks natively
    (build brief's custom-operator class): every `left_type` event is
    matched to the LATEST `right_type` event of the same user with
    right.ts <= left.ts (inclusive, like DuckDB's ASOF LEFT JOIN).

    Composition: ONE user_id hash shuffle, then a vectorized searchsorted
    per group — same partitioning assumption as sessionize (one user's
    events fit one group; a pathological user would be salted by day).
    Output (event_id, user_id, ts, view_ts); how="left" keeps unmatched
    lefts with NULL view_ts, how="inner" drops them. The matched TIMESTAMP
    (not event id) is emitted so equal-ts ties are deterministic."""
    from ppagerank_ray.graph.build import shuffle_blocks

    def asof_of_user(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["event_type"] == left_type].sort_values(["ts", "event_id"])
        if left.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype=np.int64),
                 "user_id": pd.Series([], dtype=np.int64),
                 "ts": pd.Series([], dtype="datetime64[us]"),
                 "view_ts": pd.Series([], dtype="datetime64[us]")}
            )
        right = g[g["event_type"] == right_type].sort_values(["ts", "event_id"])
        lts = left["ts"].to_numpy().astype("datetime64[us]")
        rts = right["ts"].to_numpy().astype("datetime64[us]")
        idx = np.searchsorted(rts, lts, side="right") - 1
        view_ts = np.full(len(lts), np.datetime64("NaT", "us"))
        ok = idx >= 0
        if ok.any():
            view_ts[ok] = rts[idx[ok]]
        out = pd.DataFrame(
            {"event_id": left["event_id"].to_numpy(),
             "user_id": left["user_id"].to_numpy(),
             "ts": lts,
             "view_ts": view_ts}
        )
        return out[ok] if how == "inner" else out

    return (
        events.select_columns(["event_id", "ts", "user_id", "event_type"])
        .repartition(shuffle_blocks())
        .groupby("user_id")
        .map_groups(asof_of_user, batch_format="pandas")
    )


def assign_sessions(
    events: rd.Dataset, gap_sec: int = SESSION_GAP_SEC
) -> rd.Dataset:
    """Range join: each event matched to its containing session interval
    (the brief's range-join operator class). Sessions and membership are
    co-derived per user — one user_id shuffle, then a vectorized
    gaps-and-islands pass assigns every event its interval; equivalent to
    joining events against [session_start, session_end] ranges (the SQL
    oracle does exactly that BETWEEN join). Output
    (event_id, user_id, session_idx)."""
    from ppagerank_ray.graph.build import shuffle_blocks

    def assign_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        gaps = np.diff(ts) > gap_sec * 1_000_000
        sess = np.concatenate([[0], np.cumsum(gaps)]).astype(np.int64)
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": g["user_id"].to_numpy(),
             "session_idx": sess}
        )

    return (
        events.select_columns(["event_id", "ts", "user_id"])
        .repartition(shuffle_blocks())
        .groupby("user_id")
        .map_groups(assign_of_user, batch_format="pandas")
    )


def sliding_window_counts(
    events: rd.Dataset, window_sec: int = 300
) -> rd.Dataset:
    """Sliding (range) windowed aggregate — the brief's streaming-window
    operator class: for every event, the count and value-sum of the SAME
    user's events in the trailing interval [ts − window_sec, ts]
    (inclusive both ends, matching SQL RANGE BETWEEN ... PRECEDING AND
    CURRENT ROW). One user_id shuffle, two vectorized searchsorteds per
    group; equal timestamps all share the window of their last peer, like
    SQL RANGE semantics."""
    from ppagerank_ray.graph.build import shuffle_blocks

    def windows_of_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        val = g["value"].to_numpy().astype(np.float64)
        lo = np.searchsorted(ts, ts - window_sec * 1_000_000, side="left")
        hi = np.searchsorted(ts, ts, side="right")  # RANGE: include peers
        csum = np.concatenate([[0.0], np.cumsum(val)])
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(),
             "user_id": g["user_id"].to_numpy(),
             "n_window": (hi - lo).astype(np.int64),
             "value_window": np.round(csum[hi] - csum[lo], 6)}
        )

    return (
        events.select_columns(["event_id", "ts", "user_id", "value"])
        .repartition(shuffle_blocks())
        .groupby("user_id")
        .map_groups(windows_of_user, batch_format="pandas")
    )
