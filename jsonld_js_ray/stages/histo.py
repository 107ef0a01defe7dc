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
