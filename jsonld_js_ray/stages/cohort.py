"""Cohort-retention matrix over the ``events`` stream.

The classic product-analytics operator (no reference counterpart —
SURVEY.md §2.4 streaming row's engine-only family, like
stages/windows.py): assign every user to the cohort of their FIRST
active day, then count, for each (cohort_day, day_offset), how many of
that cohort's users were active ``offset`` days later. The output is
the retention triangle a training-data curation dashboard reads
("of the users first seen on day D, how many came back on D+k").

Shape (one read, one shuffle): per-batch partials reduce each batch to
its DISTINCT (user, day) pairs — the shuffled volume is bounded by
distinct user-days per batch, not events — keyed by a user-hash
bucket so every user's full day set lands in ONE group. The in-bucket
kernel derives each user's cohort (min day) and offsets vectorized
(run-length kernels from groupkit), then pre-reduces to per-bucket
(cohort, offset) partial counts; the final groupby sums ≤
|days|²/2 × buckets tiny rows. Distinct-user counts are exact because
a user never spans buckets. No driver-side state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import strip_meta as _strip_meta

DAY_S = 86400
COHORT_BUCKETS = 64


def cohort_retention(sf_dir: str):
    """events → (cohort_day, day_offset, n_users): distinct users of
    cohort ``cohort_day`` (epoch days of their first event) active
    ``day_offset`` days after it. Hash-exact vs COHORT_RETENTION_SQL."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .groupkit import run_lengths, run_starts

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = batch["ts"].cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        user = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        day = (ts_us // (DAY_S * 1_000_000)).astype(np.int64)
        uniq = np.unique(np.stack([user, day], axis=1), axis=0)
        u = uniq[:, 0]
        return pa.table({
            "user_id": pa.array(u),
            "day": pa.array(uniq[:, 1]),
            "bucket": pa.array(
                (u % COHORT_BUCKETS).astype(np.int32)),
        })

    def per_bucket(g) -> pa.Table:
        user = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        # batch partials can repeat a (user, day) pair across batches
        uniq = np.unique(np.stack([user, day], axis=1), axis=0)
        u, d = uniq[:, 0], uniq[:, 1]
        # rows are sorted by (user, day) ⇒ each run's first day is the
        # user's cohort; offsets are day − cohort per row
        starts = run_starts(u)
        lens = run_lengths(u, starts)
        cohort = np.repeat(d[starts], lens)
        offset = d - cohort
        cell, counts = np.unique(
            np.stack([cohort, offset], axis=1), axis=0,
            return_counts=True)
        return pa.table({
            "cohort_day": pa.array(cell[:, 0]),
            "day_offset": pa.array(cell[:, 1]),
            "n": pa.array(counts.astype(np.int64)),
        })

    partials = events.map_batches(partial, batch_format="pyarrow",
                                  batch_size=65536) \
        .groupby("bucket").map_groups(per_bucket,
                                      batch_format="pandas")
    return partials.groupby(["cohort_day", "day_offset"]).aggregate(
        Sum("n", alias_name="n_users"))


COHORT_RETENTION_SQL = f"""
WITH ud AS (SELECT DISTINCT user_id,
                   CAST(floor(epoch(ts) / {DAY_S}) AS BIGINT) AS day
            FROM events),
first AS (SELECT user_id, min(day) AS cohort_day
          FROM ud GROUP BY user_id)
SELECT f.cohort_day,
       ud.day - f.cohort_day AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN first f ON ud.user_id = f.user_id
GROUP BY f.cohort_day, ud.day - f.cohort_day
"""
