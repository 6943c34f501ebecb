"""Event-stream operators Ray Data lacks natively, built from
map_batches + one keyed shuffle each (the custom-operator recipe:
composition over raw actors).

- ``sliding_window_counts`` — trailing W-hour windowed count/sum per
  event type: per-batch hourly partials (combiner), each partial
  EXPLODES to the W window buckets it contributes to, then ONE
  groupby-sum. Partitioning assumption: (event_type, hour bucket) keys
  distribute well — time-bucketed keys are naturally balanced, and the
  explode factor is the window width, not the data size.
- ``asof_join_latest`` — for each left-type event, the LATEST
  right-type event of the same user at ts' ≤ ts (the classic as-of
  join). One groupby(user) shuffle; inside each group a vectorized
  sorted-merge (searchsorted), no per-row Python. Partitioning
  assumption: no single user holds an unbounded share of the stream
  (true for web logs; a hot user would need salting by time range).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

US_PER_HOUR = 3_600_000_000


def _hour_bucket(ts_col) -> np.ndarray:
    epoch_us = ts_col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return epoch_us // US_PER_HOUR


def sliding_window_counts(events_ds, window_hours: int = 4):
    """→ Dataset (event_type, hour_bucket, n, sum_value_q4): count and
    quantized value-sum of events in the TRAILING window
    (hour_bucket − W + 1 .. hour_bucket], emitted for every bucket the
    window of some event covers."""
    from ray.data.aggregate import Sum

    w = int(window_hours)

    def partials(b: pa.Table) -> pa.Table:
        hour = _hour_bucket(b["ts"])
        t = pa.table({
            "event_type": b["event_type"],
            "hour": pa.array(hour, pa.int64()),
            "value": b["value"],
        })
        g = t.group_by(["event_type", "hour"]).aggregate(
            [("value", "sum"), ("value", "count")]
        )
        # explode each hourly partial into the W trailing buckets it
        # feeds (combiner first → explode factor applies to the small
        # hourly table, not the raw events)
        n = g.num_rows
        reps = np.full(n, w)
        off = np.tile(np.arange(w), n)
        return pa.table({
            "event_type": pc.take(
                g["event_type"], pa.array(np.repeat(np.arange(n), reps))
            ),
            "hour_bucket": pa.array(
                np.repeat(g["hour"].to_numpy(zero_copy_only=False), reps)
                + off, pa.int64()),
            "n_part": pa.array(
                np.repeat(g["value_count"].to_numpy(zero_copy_only=False),
                          reps), pa.int64()),
            "sum_part": pa.array(
                np.repeat(g["value_sum"].to_numpy(zero_copy_only=False),
                          reps), pa.float64()),
        })

    out = (
        events_ds.map_batches(partials, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Sum("n_part", alias_name="n"),
                   Sum("sum_part", alias_name="sum_value"))
    )

    def quantize(b: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": b["event_type"],
            "hour_bucket": b["hour_bucket"],
            "n": b["n"].cast(pa.int64()),
            "sum_value_q4": pa.array(
                np.round(b["sum_value"].to_numpy(zero_copy_only=False)
                         * 10_000).astype(np.int64), pa.int64()),
        })

    return out.map_batches(quantize, batch_format="pyarrow")


def asof_join_latest(events_ds, left_type: str = "click",
                     right_type: str = "view"):
    """→ Dataset (event_id, user_id, matched_event_id, lag_us): each
    ``left_type`` event joined to the latest ``right_type`` event of
    the same user with ts' ≤ ts (ties broken toward the highest
    event_id — fully deterministic). Lefts with no prior right are
    dropped (inner as-of)."""
    keep = pa.array([left_type, right_type])
    ds = events_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["event_type"], value_set=keep))
                   .select(["event_id", "ts", "user_id", "event_type"]),
        batch_format="pyarrow",
    )

    def match_group(g: pa.Table) -> pa.Table:
        is_left = pc.equal(g["event_type"], left_type).to_numpy(
            zero_copy_only=False)
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        l_idx = np.flatnonzero(is_left)
        r_idx = np.flatnonzero(~is_left)
        if l_idx.size == 0 or r_idx.size == 0:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "user_id": pa.array([], pa.int64()),
                "matched_event_id": pa.array([], pa.int64()),
                "lag_us": pa.array([], pa.int64()),
            })
        # rights sorted by (ts, event_id): searchsorted(right) - 1 is
        # the latest right with ts' <= ts, highest event_id on ties
        order = np.lexsort((eid[r_idx], ts[r_idx]))
        r_ts, r_eid = ts[r_idx][order], eid[r_idx][order]
        pos = np.searchsorted(r_ts, ts[l_idx], side="right") - 1
        ok = pos >= 0
        li, pi = l_idx[ok], pos[ok]
        return pa.table({
            "event_id": pa.array(eid[li], pa.int64()),
            "user_id": pa.array(uid[li], pa.int64()),
            "matched_event_id": pa.array(r_eid[pi], pa.int64()),
            "lag_us": pa.array(ts[li] - r_ts[pi], pa.int64()),
        })

    return ds.groupby("user_id").map_groups(match_group,
                                            batch_format="pyarrow")


def sessionize(events_ds, gap_us: int = 1_800_000_000):
    """→ Dataset (event_id, user_id, session_id, session_seq): classic
    gap-based sessionization. Per user (events ordered by ts then
    event_id), a new session starts when the gap from the previous
    event exceeds ``gap_us`` (default 30 min). ``session_id`` is the
    first event's event_id (globally unique without coordination);
    ``session_seq`` is the 1-based position within the session.

    ONE keyed shuffle (groupby user); per-group work is fully
    vectorized (lexsort + maximum.accumulate). Hot users concentrate
    in one task — same caveat as the as-of join; salt by coarse time
    range if a single user exceeds a task's memory."""
    ds = events_ds.map_batches(
        lambda b: b.select(["event_id", "ts", "user_id"]),
        batch_format="pyarrow",
    )

    def assign(g: pa.Table) -> pa.Table:
        ts = g["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts, eid, uid = ts[order], eid[order], uid[order]
        n = len(ts)
        starts = np.ones(n, dtype=bool)
        if n > 1:
            starts[1:] = (ts[1:] - ts[:-1]) > gap_us
        idx = np.arange(n, dtype=np.int64)
        start_pos = np.maximum.accumulate(np.where(starts, idx, 0))
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid, pa.int64()),
            "session_id": pa.array(eid[start_pos], pa.int64()),
            "session_seq": pa.array(idx - start_pos + 1, pa.int64()),
        })

    return ds.groupby("user_id").map_groups(assign, batch_format="pyarrow")
