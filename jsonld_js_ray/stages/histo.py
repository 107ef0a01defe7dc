"""Float value histograms over the ``events`` stream table.

The repo's other histogram (text.corpus_token_quantiles) buckets exact
integers; this one buckets a FLOAT column into fixed-width bins:
bin = floor(value / width). Both sides (numpy and DuckDB) evaluate the
same two IEEE-754 double ops (divide, floor) on the same input, so the
bin ids are bit-identical and the contract hash-exact — no epsilon.

Shape: per-batch partial bincount (the shuffle moves one row per
distinct bin per batch, bounded by the value range, not the corpus),
then a tiny groupby sum. NULL values are dropped, mirroring SQL
aggregate semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HISTO_WIDTH = 10.0


def value_histogram(events, width: float = HISTO_WIDTH):
    """events → (bin, n_events): fixed-width histogram of ``value``;
    bin = floor(value / width), NULLs dropped."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch["value"].to_numpy(zero_copy_only=False)
        vals = vals[~np.isnan(vals)]
        bins = np.floor(vals / width).astype(np.int64)
        uniq, counts = np.unique(bins, return_counts=True)
        return pa.table({
            "bin": pa.array(uniq, pa.int64()),
            "n": pa.array(counts.astype(np.int64)),
        })

    out = events.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536) \
        .groupby("bin").aggregate(Sum("n", alias_name="n_events"))

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({
            "bin": batch["bin"],
            "n_events": batch["n_events"].cast(pa.int64()),
        })

    return out.map_batches(final, batch_format="pyarrow")


VALUE_HISTOGRAM_SQL = f"""
SELECT CAST(floor(value / {HISTO_WIDTH}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE value IS NOT NULL AND NOT isnan(value)
GROUP BY 1
"""


# --- range-partitioner boundaries (the TeraSort primitive) ---
# The scale-path prerequisite of any distributed SORT/range shuffle:
# sample the key column deterministically, take exact quantiles of
# the SAMPLE, and use them as range-partition boundaries. The sample
# is the md5-of-key unit-interval rule shared with split/sample
# (stages/text) so the oracle mirrors it exactly; the sample size —
# rate · corpus — is the only thing that ever co-locates, which is
# the entire point of sampling-based partitioning at 100 TB.

RB_RATE = 0.05
RB_QUANTILES = (0.25, 0.5, 0.75)


def range_partition_bounds(sf_dir: str, rate: float = RB_RATE,
                           quantiles=RB_QUANTILES):
    """orders → (pct, bound): quantile_disc boundaries of
    o_totalprice over the deterministic md5(o_orderkey) sample."""
    import hashlib

    import ray.data as rd

    from .groupkit import quantile_disc_pos
    from ..rayutil import strip_meta as _strip_meta

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def sampled(batch: pa.Table) -> pa.Table:
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        # per-row md5 is the repo's deterministic-sampling CONTRACT
        # (split_assign/sample_docs use the same loop) — the cost is
        # bounded by the read, and only rate·corpus rows survive it
        u = np.array([
            int(hashlib.md5(str(k).encode()).hexdigest()[:8], 16)
            for k in keys], np.float64) / float(1 << 32)
        t = batch.filter(pa.array(u < rate))
        return pa.table({
            "v": t["o_totalprice"],
            "g": pa.array(np.zeros(len(t), np.int32)),
        })

    def bounds(g) -> pa.Table:
        vals = np.sort(g["v"].to_numpy().astype(np.float64))
        n = len(vals)
        out_p, out_b = [], []
        for p in quantiles:
            pos = int(quantile_disc_pos(p, n))
            out_p.append(int(p * 100))
            out_b.append(vals[pos - 1])
        return pa.table({
            "pct": pa.array(out_p, pa.int64()),
            "bound": pa.array(out_b, pa.float64()),
        })

    return orders.map_batches(sampled, batch_format="pyarrow") \
        .groupby("g").map_groups(bounds, batch_format="pandas")


_RB_MD5_UNIT = ("(CAST(concat('0x', substr(md5(CAST(o_orderkey AS "
                "VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0)")

RANGE_BOUNDS_SQL = f"""
WITH s AS (SELECT o_totalprice AS v FROM orders
           WHERE {_RB_MD5_UNIT} < {RB_RATE})
SELECT CAST(25 AS BIGINT) AS pct, quantile_disc(v, 0.25) AS bound
FROM s
UNION ALL
SELECT 50, quantile_disc(v, 0.5) FROM s
UNION ALL
SELECT 75, quantile_disc(v, 0.75) FROM s
"""


# --- global total-order sort (the full TeraSort composition) ---
# range_partition_bounds above computes the PRIMITIVE (sampled
# boundaries); this runs the whole operator: sample → range-partition
# → in-partition sort → exact global ranks. The all-to-all moves each
# row ONCE to its key-range partition (vs a comparison-sort shuffle's
# log passes); only two tiny things ever reach the driver — the
# per-block boundary sample (≤ SORT_SAMPLE_PER_BLOCK rows per block,
# bounded by block count, independent of corpus size) and the P
# partition counts whose prefix sum turns local sort positions into
# global ranks. Boundary quality affects only partition BALANCE,
# never correctness: equal keys always land in one partition, so the
# (key, id) tie-break is resolved entirely in-partition.

SORT_PARTITIONS = 32
SORT_SAMPLE_PER_BLOCK = 64


def _sort_cents(batch: pa.Table):
    """(event_id, cents) for non-NULL values — the shared key kernel
    of every pass (sample, count, rank)."""
    vals = batch["value"].to_numpy(zero_copy_only=False)
    ids = batch["event_id"].to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    keep = ~np.isnan(vals)
    cents = np.floor(vals[keep] * 100 + 0.5).astype(np.int64)
    return ids[keep], cents


def global_sort_events(sf_dir: str, parts: int = SORT_PARTITIONS):
    """events → (event_id, cents, rank): the exact global total order
    of all non-NULL values by (cents, event_id) — row_number() over
    the whole table, computed distributed."""
    import ray
    import ray.data as rd

    from ..rayutil import strip_meta as _strip_meta

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "value"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    # pass 1 — per-block evenly-spaced key sample (TeraSort-style
    # fixed count per block, NOT a rate: the driver sees
    # n_blocks × SORT_SAMPLE_PER_BLOCK values at any corpus size)
    def sample_rows(batch: pa.Table) -> pa.Table:
        _, cents = _sort_cents(batch)
        cents = np.sort(cents)
        k = min(SORT_SAMPLE_PER_BLOCK, len(cents))
        idx = (np.linspace(0, len(cents) - 1, num=k).astype(np.int64)
               if k else np.zeros(0, np.int64))
        return pa.table({"v": pa.array(cents[idx])})

    sample = np.sort(np.concatenate([
        b["v"].to_numpy(zero_copy_only=False)
        for b in events.map_batches(
            sample_rows, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")] or [np.zeros(0, np.int64)]))
    if len(sample):
        pos = (np.arange(1, parts) * len(sample)) // parts
        bounds = np.unique(sample[pos])
    else:
        bounds = np.zeros(0, np.int64)
    bounds_ref = ray.put(bounds)

    def pid_of(cents: np.ndarray) -> np.ndarray:
        b = ray.get(bounds_ref)
        return np.searchsorted(b, cents, side="right").astype(np.int32)

    # pass 2 — per-partition row counts (partial per batch; the
    # groupby reduces to ≤ parts rows, whose prefix sum is the rank
    # offset vector)
    from ray.data.aggregate import Sum

    def count_rows(batch: pa.Table) -> pa.Table:
        _, cents = _sort_cents(batch)
        pid = pid_of(cents)
        uniq, counts = np.unique(pid, return_counts=True)
        return pa.table({
            "pid": pa.array(uniq.astype(np.int32)),
            "n": pa.array(counts.astype(np.int64)),
        })

    counts = events.map_batches(count_rows, batch_format="pyarrow") \
        .groupby("pid").aggregate(Sum("n", alias_name="n")) \
        .to_pandas()
    offsets = np.zeros(len(bounds) + 2, np.int64)
    for pid, n in zip(counts["pid"], counts["n"]):
        offsets[int(pid) + 1] = int(n)
    offsets = np.cumsum(offsets)
    offsets_ref = ray.put(offsets)

    # pass 3 — route each row once, sort within its key range, add
    # the partition's rank offset (global order needs no merge step)
    def route(batch: pa.Table) -> pa.Table:
        ids, cents = _sort_cents(batch)
        return pa.table({
            "event_id": pa.array(ids),
            "cents": pa.array(cents),
            "pid": pa.array(pid_of(cents)),
        })

    def rank_in_partition(g) -> pa.Table:
        ids = g["event_id"].to_numpy(np.int64)
        cents = g["cents"].to_numpy(np.int64)
        pid = int(g["pid"].iloc[0])
        order = np.lexsort((ids, cents))
        base = ray.get(offsets_ref)[pid]
        return pa.table({
            "event_id": pa.array(ids[order]),
            "cents": pa.array(cents[order]),
            "rank": pa.array(base + 1
                             + np.arange(len(ids), dtype=np.int64)),
        })

    return events.map_batches(route, batch_format="pyarrow") \
        .groupby("pid").map_groups(rank_in_partition,
                                   batch_format="pandas")


GLOBAL_SORT_SQL = """
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
       CAST(row_number() OVER (
            ORDER BY CAST(floor(value * 100 + 0.5) AS BIGINT),
                     event_id) AS BIGINT) AS rank
FROM events
WHERE value IS NOT NULL AND NOT isnan(value)
"""


# --- skyline (Pareto frontier) over (value, payload k) ---
# The dominance-query operator class (no SQL aggregate computes it;
# the mirror is a NOT EXISTS anti-self-join): an event survives iff
# no other event is >= in BOTH dimensions and > in at least one.
# Distribution exploits skyline algebra: skyline(A ∪ B) =
# skyline(skyline(A) ∪ skyline(B)), so each batch reduces to its
# LOCAL frontier (expected O(log² n) points on independent dims) and
# one final pass merges the tiny locals — the corpus is never
# shuffled, only frontiers move.

def _frontier_2d(ids, x, y):
    """Vectorized 2-D maxima kernel (shared by both skyline passes;
    module-level so the property tests can drive it directly): sort
    desc (x, y); a point is dominated iff the best y among STRICTLY
    larger x is >= its y, or a same-x point has strictly larger y."""
    from .groupkit import run_lengths, run_starts

    # ascending lexsort REVERSED — int64 negation would wrap at
    # INT64_MIN and missort extreme keys
    order = np.lexsort((y, x))[::-1]
    ids, x, y = ids[order], x[order], y[order]
    starts = run_starts(x)               # runs of equal x, y desc
    lens = run_lengths(x, starts)
    run_max_y = y[starts]
    # best y among strictly-larger x = exclusive cummax over runs
    prev_best = np.full(len(starts), np.iinfo(np.int64).min,
                        np.int64)
    if len(starts) > 1:
        prev_best[1:] = np.maximum.accumulate(run_max_y)[:-1]
    dom_strict = y <= np.repeat(prev_best, lens)
    dom_same_x = y < np.repeat(run_max_y, lens)
    keep = ~(dom_strict | dom_same_x)
    return ids[keep], x[keep], y[keep]


def skyline_events(sf_dir: str):
    """events → (event_id, x, y): the maxima frontier where
    x = exact value cents and y = the JSON payload field k (rows
    missing either dimension drop; duplicate coordinate points all
    survive — equal points don't strictly dominate each other)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..rayutil import strip_meta as _strip_meta

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "value", "props"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    frontier = _frontier_2d

    from .props import _extract_value_k

    def local_frontier(batch: pa.Table) -> pa.Table:
        # the shared guarded pair-extraction kernel (props.py) —
        # identical row filter and cast-wrap guard as the
        # correlation operator, one RE2 pass
        t, x, y = _extract_value_k(batch)
        ids = t["event_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        fi, fx, fy = frontier(ids, x, y)
        return pa.table({
            "event_id": pa.array(fi),
            "x": pa.array(fx),
            "y": pa.array(fy),
            "g": pa.array(np.zeros(len(fi), np.int32)),
        })

    def merge_frontiers(g) -> pa.Table:
        fi, fx, fy = frontier(g["event_id"].to_numpy(np.int64),
                              g["x"].to_numpy(np.int64),
                              g["y"].to_numpy(np.int64))
        return pa.table({
            "event_id": pa.array(fi),
            "x": pa.array(fx),
            "y": pa.array(fy),
        })

    return events.map_batches(local_frontier, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("g").map_groups(merge_frontiers,
                                 batch_format="pandas")


SKYLINE_SQL = """
WITH pts AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
         CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1)
              AS BIGINT) AS y
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
    AND regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> '')
SELECT p.event_id, p.x, p.y
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.x >= p.x AND q.y >= p.y
    AND (q.x > p.x OR q.y > p.y))
"""
