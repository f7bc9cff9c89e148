"""Windowed / sessionized event aggregates over the events table.

The reference has no streaming/window layer (its inputs are static
matrices); these are engine-only training-data-pipeline operators per the
build brief ("windowed aggregate, a streaming window" custom-operator
class), expressed as Ray Data compositions:

* tumbling windows — `floor_temporal` + groupby aggregate (see
  __ray_entry__._q_events_windowed);
* sessionization / as-of / range-join / sliding window — ONE hash
  exchange on a salted partition key (`hash(user_id) % P`), then ONE
  vectorized numpy pass per partition: sort the partition by
  (user_id, ts, event_id) and segment it at `np.diff(user_id)`
  boundaries. No per-user Python call anywhere — at web scale
  (10^8-10^9 users) a per-group function call would dominate the
  kernel, so all four operators run O(partitions) Python calls total.

The standard partitioning assumption: one user's events fit one
partition (holds at any realistic per-user event count; a pathological
user would be salted by (user_id, day) and its sessions merged in a
second pass).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

SESSION_GAP_SEC = 1800  # 30 min

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _partition_by_user(events: rd.Dataset, columns: list[str]) -> rd.Dataset:
    """ONE hash exchange: tag each row with part = mix(user_id) % P and
    groupby the part key, so every user's rows land in exactly one
    partition and each partition is processed by ONE kernel call."""
    from ppagerank_ray.graph.build import shuffle_blocks

    nparts = shuffle_blocks()

    def add_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy().astype(np.uint64)
        part = ((uid * _MIX) >> np.uint64(33)) % np.uint64(nparts)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    return (
        events.select_columns(columns)
        .map_batches(add_part, batch_format="pyarrow", batch_size=262144)
        .groupby("part")
    )


def _sorted_segments(t: pa.Table, extra: list[str]):
    """Sort a partition by (user_id, ts, event_id) and return the sorted
    column arrays + the per-user segment-start indices."""
    uid = t["user_id"].to_numpy()
    ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    eid = t["event_id"].to_numpy()
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid = uid[order], ts[order], eid[order]
    starts = np.concatenate([[0], np.flatnonzero(np.diff(uid) != 0) + 1])
    cols = [t[c].to_numpy()[order] for c in extra]
    return uid, ts, eid, starts, cols


def _session_labels(uid: np.ndarray, ts: np.ndarray, gap_us: int):
    """Global 0-based session ids over a (user_id, ts)-sorted partition
    plus each row's within-user session ordinal — one segmented pass."""
    if len(uid) == 0:
        z = np.zeros(0, np.int64)
        return z, z, np.zeros(0, np.bool_)
    new_user = np.diff(uid) != 0
    brk = new_user | (np.diff(ts) > gap_us)
    sess = np.concatenate([[0], np.cumsum(brk)]).astype(np.int64)
    # within-user ordinal: subtract the user's first global session id
    seg_first = np.concatenate([[True], new_user])
    base = np.where(seg_first, sess, 0)
    np.maximum.accumulate(base, out=base)
    return sess, sess - base, np.concatenate([[True], brk])


def sessionize(events: rd.Dataset, gap_sec: int = SESSION_GAP_SEC) -> rd.Dataset:
    """Per-user sessions: maximal event runs with inter-event gap ≤ gap_sec.
    Returns (user_id, session_idx, session_start, session_end, n_events,
    total_value); session_idx is 0-based in time order per user."""
    gap_us = gap_sec * 1_000_000

    def sessions_of_part(t: pa.Table) -> pa.Table:
        uid, ts, _eid, _ustarts, (val,) = _sorted_segments(t, ["value"])
        _sess, sess_idx, sess_first = _session_labels(uid, ts, gap_us)
        s = np.flatnonzero(sess_first)  # session start rows
        if len(s) == 0:
            return pa.Table.from_pydict(
                {"user_id": pa.array([], pa.int64()),
                 "session_idx": pa.array([], pa.int64()),
                 "session_start": pa.array([], pa.timestamp("us")),
                 "session_end": pa.array([], pa.timestamp("us")),
                 "n_events": pa.array([], pa.int64()),
                 "total_value": pa.array([], pa.float64())}
            )
        e = np.concatenate([s[1:], [len(uid)]]) - 1  # session end rows
        return pa.Table.from_pydict(
            {"user_id": uid[s],
             "session_idx": sess_idx[s],
             "session_start": ts[s].astype("datetime64[us]"),
             "session_end": ts[e].astype("datetime64[us]"),
             "n_events": (e - s + 1).astype(np.int64),
             "total_value": np.round(
                 np.add.reduceat(val.astype(np.float64), s), 6)}
        )

    return _partition_by_user(
        events, ["event_id", "ts", "user_id", "value"]
    ).map_groups(sessions_of_part, batch_format="pyarrow")


def asof_join_events(
    events: rd.Dataset, left_type: str = "click", right_type: str = "view",
    how: str = "left",
) -> rd.Dataset:
    """Per-user backward AS-OF join — an operator Ray Data lacks natively
    (build brief's custom-operator class): every `left_type` event is
    matched to the LATEST `right_type` event of the same user with
    right.ts <= left.ts (inclusive, like DuckDB's ASOF LEFT JOIN).

    Kernel: over the (user_id, ts)-sorted partition, rights sort BEFORE
    lefts on equal ts (inclusive match), then one
    `np.maximum.accumulate` carries the last right row index forward;
    a carry that predates the row's user segment start is NULL. Output
    (event_id, user_id, ts, view_ts); how="left" keeps unmatched lefts
    with NULL view_ts, how="inner" drops them. The matched TIMESTAMP
    (not event id) is emitted so equal-ts ties are deterministic."""

    def asof_of_part(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy()
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy()
        etype = t["event_type"].to_numpy(zero_copy_only=False)
        is_left = etype == left_type
        is_right = etype == right_type
        keep = is_left | is_right
        uid, ts, eid = uid[keep], ts[keep], eid[keep]
        is_left = is_left[keep]
        # rights before lefts on ts ties → inclusive (right.ts <= left.ts)
        order = np.lexsort((eid, is_left, ts, uid))
        uid, ts, eid, is_left = (
            uid[order], ts[order], eid[order], is_left[order]
        )
        n = len(uid)
        idx = np.arange(n, dtype=np.int64)
        carry = np.where(~is_left, idx, np.int64(-1))
        np.maximum.accumulate(carry, out=carry)
        # segment start of each row's user
        new_user = np.concatenate([[True], np.diff(uid) != 0])
        seg_start = np.where(new_user, idx, np.int64(0))
        np.maximum.accumulate(seg_start, out=seg_start)
        matched = carry >= seg_start
        li = np.flatnonzero(is_left)
        view_ts = np.full(len(li), np.datetime64("NaT", "us"))
        ok = matched[li]
        view_ts[ok] = ts[carry[li[ok]]].astype("datetime64[us]")
        if how == "inner":
            li, view_ts = li[ok], view_ts[ok]
        return pa.Table.from_pydict(
            {"event_id": eid[li],
             "user_id": uid[li],
             "ts": ts[li].astype("datetime64[us]"),
             "view_ts": pa.array(view_ts, pa.timestamp("us"))}
        )

    return _partition_by_user(
        events, ["event_id", "ts", "user_id", "event_type"]
    ).map_groups(asof_of_part, batch_format="pyarrow")


def assign_sessions(
    events: rd.Dataset, gap_sec: int = SESSION_GAP_SEC
) -> rd.Dataset:
    """Range join: each event matched to its containing session interval
    (the brief's range-join operator class). Sessions and membership are
    co-derived per user — one hash exchange, then a segmented
    gaps-and-islands pass assigns every event its interval; equivalent to
    joining events against [session_start, session_end] ranges (the SQL
    oracle does exactly that BETWEEN join). Output
    (event_id, user_id, session_idx)."""
    gap_us = gap_sec * 1_000_000

    def assign_of_part(t: pa.Table) -> pa.Table:
        uid, ts, eid, _ustarts, _ = _sorted_segments(t, [])
        _sess, sess_idx, _first = _session_labels(uid, ts, gap_us)
        return pa.Table.from_pydict(
            {"event_id": eid, "user_id": uid, "session_idx": sess_idx}
        )

    return _partition_by_user(
        events, ["event_id", "ts", "user_id"]
    ).map_groups(assign_of_part, batch_format="pyarrow")


def sliding_window_counts(
    events: rd.Dataset, window_sec: int = 300
) -> rd.Dataset:
    """Sliding (range) windowed aggregate — the brief's streaming-window
    operator class: for every event, the count and value-sum of the SAME
    user's events in the trailing interval [ts − window_sec, ts]
    (inclusive both ends, matching SQL RANGE BETWEEN ... PRECEDING AND
    CURRENT ROW). Kernel: the partition's (user_id, ts)-sorted rows are
    re-keyed onto one strictly user-separated int64 axis
    (rank·span + (ts − ts_min), span > ts range + window), so BOTH
    window-edge lookups are single global `np.searchsorted` calls over
    the whole partition — no per-user loop. Equal timestamps all share
    the window of their last peer, like SQL RANGE semantics."""
    win_us = window_sec * 1_000_000

    def windows_of_part(t: pa.Table) -> pa.Table:
        uid, ts, eid, starts, (val,) = _sorted_segments(t, ["value"])
        n = len(uid)
        if n == 0:
            return pa.Table.from_pydict(
                {"event_id": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "n_window": pa.array([], pa.int64()),
                 "value_window": pa.array([], pa.float64())}
            )
        # dense per-user rank on the sorted axis
        seg_first = np.zeros(n, np.int64)
        seg_first[starts] = 1
        rank = np.cumsum(seg_first) - 1
        tmin, tmax = int(ts.min()), int(ts.max())
        span = (tmax - tmin) + win_us + 2
        if (len(starts)) * span >= np.iinfo(np.int64).max:
            raise OverflowError(
                "sliding-window composite key would overflow int64; "
                "re-shard with more partitions or a shorter window"
            )
        key = rank * np.int64(span) + (ts - tmin)
        lo = np.searchsorted(key, key - win_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        csum = np.concatenate([[0.0], np.cumsum(val.astype(np.float64))])
        return pa.Table.from_pydict(
            {"event_id": eid,
             "user_id": uid,
             "n_window": (hi - lo).astype(np.int64),
             "value_window": np.round(csum[hi] - csum[lo], 6)}
        )

    return _partition_by_user(
        events, ["event_id", "ts", "user_id", "value"]
    ).map_groups(windows_of_part, batch_format="pyarrow")
