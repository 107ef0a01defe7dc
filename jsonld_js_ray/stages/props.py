"""Semi-structured payload extraction over ``events.props``.

The events stream carries a JSON payload column (``props``) that the
relational operators ignore; real pipelines constantly hoist typed
fields out of exactly this kind of column. This stage extracts the
integer ``k`` field VECTORIZED (one RE2 ``pc.extract_regex`` pass per
batch — never ``json.loads`` per row) and aggregates it per event
type; the oracle mirrors the same RE2 pattern via DuckDB's
``regexp_extract``, the repo's RE2-both-sides contract
(cf. stages/text.scrub_pii).

Shape: per-batch partials over the tiny event-type key (the shuffle
moves ≤ |types| rows per batch), one groupby to finish. Rows whose
payload lacks a parseable ``k`` are dropped on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..rayutil import strip_meta as _strip_meta

# RE2 pattern shared verbatim with the SQL mirror (named group for
# Arrow's extract_regex; DuckDB takes the group by index)
_K_PATTERN = r'"k":\s*(?P<k>-?\d+)'
_K_PATTERN_SQL = r'"k":\s*(-?\d+)'

# any |value| beyond this would wrap when floor(v*100+0.5) casts to
# int64 (DuckDB raises on the same cast — the engine must too, not
# silently wrap)
_CENTS_CAST_LIMIT = 9.2e16


def _extract_value_k(batch: pa.Table):
    """The shared (value, k) pair-extraction kernel: ONE RE2 pass,
    rows dropped when k is unparseable or value is NULL/NaN (the
    SQL-mirror filter on both consumers), exact cents and int64 k
    with a LOUD cast-wrap guard. Returns (filtered_table, x, y)."""
    ext = pc.extract_regex(batch["props"], pattern=_K_PATTERN)
    ks = pc.struct_field(ext, "k")
    vals = batch["value"].to_numpy(zero_copy_only=False)
    valid = pc.is_valid(ks).to_numpy(zero_copy_only=False) \
        & ~np.isnan(vals)
    mask = pa.array(valid)
    y = pc.cast(ks.filter(mask), pa.int64()) \
        .to_numpy(zero_copy_only=False)
    fv = vals[valid]
    if len(fv) and np.abs(fv).max() > _CENTS_CAST_LIMIT:
        raise OverflowError(
            "value exceeds the exact-cents int64 cast range "
            "(DuckDB raises on the same cast; refusing to wrap)")
    t = batch.filter(mask)
    x = np.floor(fv * 100 + 0.5).astype(np.int64)
    return t, x, y


def props_extract(sf_dir: str):
    """events → (event_type, n, sum_k, min_k, max_k): exact integer
    aggregates of the JSON payload field ``k`` per event type."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min, Sum

    from .groupkit import int_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        ext = pc.extract_regex(batch["props"], pattern=_K_PATTERN)
        ks = pc.struct_field(ext, "k")
        valid = pc.is_valid(ks)
        t = batch.filter(valid)
        k = pc.cast(ks.filter(valid), pa.int64()) \
            .to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, codes = np.unique(et, return_inverse=True)
        n = len(uniq)
        mins = np.full(n, np.iinfo(np.int64).max, np.int64)
        maxs = np.full(n, np.iinfo(np.int64).min, np.int64)
        np.minimum.at(mins, codes, k)
        np.maximum.at(maxs, codes, k)
        return pa.table({
            "event_type": pa.array(uniq.astype(str), pa.string()),
            "n": pa.array(np.bincount(codes, minlength=n)
                          .astype(np.int64)),
            "sum_k": pa.array(int_group_sums(codes, k, n)),
            "min_k": pa.array(mins),
            "max_k": pa.array(maxs),
        })

    return events.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_k", alias_name="sum_k"),
            Min("min_k", alias_name="min_k"),
            Max("max_k", alias_name="max_k"))


PROPS_EXTRACT_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       CAST(min(k) AS BIGINT) AS min_k,
       CAST(max(k) AS BIGINT) AS max_k
FROM (SELECT event_type,
             CAST(regexp_extract(props, '{_K_PATTERN_SQL}', 1)
                  AS BIGINT) AS k
      FROM events
      WHERE regexp_extract(props, '{_K_PATTERN_SQL}', 1) <> '')
GROUP BY event_type
"""


def value_k_correlation(sf_dir: str):
    """events → (event_type, n, s_x, s_y, s_xy, s_x2, s_y2): the
    exact integer cross-moments between the monetary value (cents,
    x) and the JSON payload field k (y) per event type — Pearson r,
    covariance, and both variances are pure arithmetic on these
    seven integers, left to the reader (float moment sums are
    order-nondeterministic and could never be oracle-hashed; integer
    sums are exact at any parallelism). Rows lacking a parseable k
    or a non-NULL value drop on both sides.

    Shape: one read, per-batch partials over the tiny type key —
    the same cell-moments pattern as ab_metrics, extended to
    cross-moments. Product sums carry the ab-style loud int64
    headroom guard."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .ab import _SQ_BATCH_BOUND
    from .groupkit import int_group_sums

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value", "props"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        t, x, y = _extract_value_k(batch)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        # guard BEFORE multiplying: both factors in [-2^31, 2^31]
        # means every product fits int64 exactly — a post-hoc check
        # on the products would be evaded by per-element wrap (e.g.
        # y = 2^32 gives y*y == 0 mod 2^64). RANGE test, not abs():
        # np.abs(INT64_MIN) wraps negative and would slip through.
        lim = np.int64(1) << np.int64(31)
        if len(x) and (x.max() > lim or x.min() < -lim
                       or y.max() > lim or y.min() < -lim):
            raise OverflowError(
                "value_k_correlation: input magnitude exceeds 2^31; "
                "products would overflow int64 — rescale the inputs")
        xx, xy, yy = x * x, x * y, y * y
        # the bound check sums |products| in float64 (cannot wrap;
        # exactness is irrelevant for an order-of-magnitude guard —
        # a uint64 sum would itself wrap on signed products)
        for arr in (xx, xy, yy):
            if np.abs(arr).astype(np.float64).sum() \
                    > float(_SQ_BATCH_BOUND):
                raise OverflowError(
                    "value_k_correlation: moment sum exceeds the "
                    "int64 headroom bound; rescale the inputs")
        uniq, codes = np.unique(et, return_inverse=True)
        n = len(uniq)
        return pa.table({
            "event_type": pa.array(uniq.astype(str), pa.string()),
            "n": pa.array(np.bincount(codes, minlength=n)
                          .astype(np.int64)),
            "s_x": pa.array(int_group_sums(codes, x, n)),
            "s_y": pa.array(int_group_sums(codes, y, n)),
            "s_xy": pa.array(int_group_sums(codes, xy, n)),
            "s_x2": pa.array(int_group_sums(codes, xx, n)),
            "s_y2": pa.array(int_group_sums(codes, yy, n)),
        })

    return events.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("s_x", alias_name="s_x"),
            Sum("s_y", alias_name="s_y"),
            Sum("s_xy", alias_name="s_xy"),
            Sum("s_x2", alias_name="s_x2"),
            Sum("s_y2", alias_name="s_y2"))


VALUE_K_CORRELATION_SQL = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(x) AS BIGINT) AS s_x,
       CAST(sum(y) AS BIGINT) AS s_y,
       CAST(sum(x * y) AS BIGINT) AS s_xy,
       CAST(sum(x * x) AS BIGINT) AS s_x2,
       CAST(sum(y * y) AS BIGINT) AS s_y2
FROM (SELECT event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS x,
             CAST(regexp_extract(props, '{_K_PATTERN_SQL}', 1)
                  AS BIGINT) AS y
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND regexp_extract(props, '{_K_PATTERN_SQL}', 1) <> '')
GROUP BY event_type
"""
