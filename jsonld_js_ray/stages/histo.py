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
WHERE value IS NOT NULL
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
