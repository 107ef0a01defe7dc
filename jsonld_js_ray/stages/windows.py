"""Windowed aggregates over the ``events`` stream table.

The reference has no event-time semantics (SURVEY.md §2.4 streaming row);
these are engine-only operators for stream-shaped inputs, built per the
Ray model: treat events as an ordered partitioned log, windows as
``groupby`` over derived window keys with PARTIAL per-batch aggregation
first (combiner) so the shuffle moves one row per (key, window) per
batch, not per event.

- tumbling_window:  fixed-size buckets (oracle-checked; monetary sums
  carried as exact integer cents to dodge float-order nondeterminism)
- sliding_window:   overlapping buckets via window-id explode
- session_window:   gap-based sessions per key (needs the key's full
  ordered history → groupby(key).map_groups with in-group sort)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tumbling_partial(batch: pa.Table, width_s: int) -> pa.Table:
    """Per-batch combiner: (user_id, window_start) partial aggregates."""
    ts_us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    user = batch["user_id"].to_numpy(zero_copy_only=False)
    value = batch["value"].to_numpy(zero_copy_only=False)
    window = (ts_us // (width_s * 1_000_000)).astype(np.int64)
    cents = np.floor(value * 100 + 0.5).astype(np.int64)

    keys = np.stack([user, window], axis=1)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    n = len(uniq)
    mins = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    maxs = np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
    np.minimum.at(mins, inv, cents)     # O(n_rows), not O(rows x keys)
    np.maximum.at(maxs, inv, cents)
    return pa.table({
        "user_id": pa.array(uniq[:, 0]),
        "window_id": pa.array(uniq[:, 1]),
        "n_events": pa.array(np.bincount(inv, minlength=n).astype("int64")),
        "sum_cents": pa.array(np.bincount(inv, weights=cents,
                                          minlength=n).astype("int64")),
        "min_cents": pa.array(mins),
        "max_cents": pa.array(maxs),
    })


def tumbling_window(events, width_s: int = 3600):
    """events Dataset → per (user_id, window) exact aggregates.

    Two-phase: vectorized per-batch partials → small groupby reduce."""
    import functools

    from ray.data.aggregate import Max, Min, Sum

    partial = events.map_batches(
        functools.partial(_tumbling_partial, width_s=width_s),
        batch_format="pyarrow", batch_size=65536)
    return partial.groupby(["user_id", "window_id"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_cents", alias_name="sum_cents"),
        Min("min_cents", alias_name="min_cents"),
        Max("max_cents", alias_name="max_cents"),
    )


TUMBLING_WINDOW_SQL = """
SELECT user_id,
       CAST(floor(epoch(ts) / 3600) AS BIGINT) AS window_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_cents,
       CAST(min(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS min_cents,
       CAST(max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_cents
FROM events
GROUP BY user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT)
"""


def sliding_window(events, width_s: int = 3600, slide_s: int = 1800):
    """Overlapping windows: each event explodes into the
    ``width_s/slide_s`` windows that contain it, then tumbling reduce."""
    import functools

    from ray.data.aggregate import Count

    n_overlap = width_s // slide_s

    def explode(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        user = batch["user_id"].to_numpy(zero_copy_only=False)
        base = ts_us // (slide_s * 1_000_000)
        users = np.repeat(user, n_overlap)
        offs = np.tile(np.arange(n_overlap, dtype=np.int64), len(base))
        starts = np.repeat(base, n_overlap) - offs
        return pa.table({
            "user_id": pa.array(users),
            "window_id": pa.array(starts.astype("int64")),
        })

    exploded = events.map_batches(explode, batch_format="pyarrow",
                                  batch_size=65536)
    return exploded.groupby(["user_id", "window_id"]).aggregate(
        Count(alias_name="n_events"))


def session_window(events, gap_s: int = 1800):
    """Gap-based sessions per user: groupby(user) → in-group ts sort →
    split where the inter-event gap exceeds ``gap_s``."""
    import pandas as pd

    gap_us = gap_s * 1_000_000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        ts = g["ts"].astype("int64").to_numpy()
        breaks = np.nonzero(np.diff(ts) > gap_us)[0]
        starts = np.concatenate([[0], breaks + 1])
        ends = np.concatenate([breaks, [len(ts) - 1]])
        return pd.DataFrame({
            "user_id": g["user_id"].iloc[0],
            "session_idx": np.arange(len(starts), dtype="int64"),
            "n_events": (ends - starts + 1).astype("int64"),
            "start_us": ts[starts],
            "end_us": ts[ends],
        })

    return events.groupby("user_id").map_groups(
        sessions, batch_format="pandas")


SLIDING_WINDOW_SQL = """
WITH ids AS (
  SELECT user_id,
         CAST(floor(epoch(ts) / 1800) AS BIGINT) AS base
  FROM events
),
exploded AS (
  SELECT user_id, base - off AS window_id
  FROM ids, (SELECT unnest([0, 1]) AS off)
)
SELECT user_id, window_id, CAST(count(*) AS BIGINT) AS n_events
FROM exploded GROUP BY user_id, window_id
"""

SESSION_WINDOW_SQL = """
WITH ordered AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
  FROM events
),
marked AS (
  SELECT user_id, ts_us,
         CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
              THEN 1 ELSE 0 END AS is_start
  FROM ordered
),
sessions AS (
  SELECT user_id, ts_us,
         CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
              ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_idx
  FROM marked
)
SELECT user_id, session_idx,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(ts_us) AS BIGINT) AS start_us,
       CAST(max(ts_us) AS BIGINT) AS end_us
FROM sessions GROUP BY user_id, session_idx
"""


WINDOW_TOP_WIDTH_S = 21600         # 6-hour windows
WINDOW_TOP_N = 3
_WT_SHARDS = 64


def window_top_events(events, width_s: int = WINDOW_TOP_WIDTH_S,
                      n: int = WINDOW_TOP_N):
    """events → (window_id, rank, event_type, n_events): the top-``n``
    event types per tumbling window (rank 1 = most frequent; ties by
    type asc — the windowed-rank combo of the tumbling aggregate and
    the row_number window). Per-batch (window, type) partials, a
    coarse window-hash shard, then vectorized per-window ranking
    (lexsort + run positions) inside each shard."""
    from .sketches import _hash64

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        window = (ts_us // (width_s * 1_000_000)).astype(np.int64)
        uet, ecodes = np.unique(et, return_inverse=True)
        comb = window * np.int64(len(uet) if len(uet) else 1) + ecodes
        uniq, first, codes = np.unique(comb, return_index=True,
                                       return_inverse=True)
        w = window[first]
        return pa.table({
            "window_id": pa.array(w),
            "event_type": pa.array(et[first], pa.string()),
            "n": pa.array(np.bincount(codes, minlength=len(uniq))
                          .astype(np.int64)),
            "bucket": pa.array((_hash64(w) % np.uint64(_WT_SHARDS))
                               .astype(np.int32)),
        })

    def per_shard(g, _n=n) -> pa.Table:
        from .groupkit import int_group_sums, pair_run_starts, \
            run_positions

        w = g["window_id"].to_numpy(np.int64)
        et = np.asarray(g["event_type"].to_numpy(object), dtype=str)
        c = g["n"].to_numpy(np.int64)
        order = np.lexsort((et, w))
        w, et, c = w[order], et[order], c[order]
        starts = pair_run_starts(w, et)
        codes = np.repeat(np.arange(len(starts)),
                          np.diff(np.append(starts, len(w))))
        sums = int_group_sums(codes, c, len(starts))
        gw, gt = w[starts], et[starts]
        order2 = np.lexsort((gt, -sums, gw))
        gw, gt, sums = gw[order2], gt[order2], sums[order2]
        rank = run_positions(gw) + 1
        keep = rank <= _n
        return pa.table({
            "window_id": pa.array(gw[keep]),
            "rank": pa.array(rank[keep].astype(np.int64)),
            "event_type": pa.array(gt[keep], pa.string()),
            "n_events": pa.array(sums[keep]),
        })

    return events.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("bucket").map_groups(per_shard,
                                      batch_format="pandas")


WINDOW_TOP_EVENTS_SQL = f"""
SELECT window_id, CAST(rank AS BIGINT) AS rank, event_type, n_events
FROM (SELECT window_id, event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             row_number() OVER (PARTITION BY window_id
                                ORDER BY count(*) DESC, event_type)
                 AS rank
      FROM (SELECT CAST(floor(epoch(ts) / {WINDOW_TOP_WIDTH_S})
                        AS BIGINT) AS window_id, event_type
            FROM events)
      GROUP BY window_id, event_type)
WHERE rank <= {WINDOW_TOP_N}
"""
