"""A/B experiment analysis over the ``events`` stream.

The downstream of split_assign: users are deterministically bucketed
into variants by the repo's md5-prefix rule (on the STRINGIFIED
user_id — the same contract split/sample/stratified use, mirrored
verbatim in SQL), and each (variant, event_type) cell reports the
exact integer moments an experiment readout needs: event count, Σ
cents, and Σ cents² — mean and variance are one division away for the
reader, while the stored sums stay order-free integers so the oracle
hash-compare is exact (a float variance would be
order-nondeterministic).

Shape: ONE read, per-batch partials over the tiny (variant, type)
key — the shuffle moves ≤ 2·|types| rows per batch. Assignment is a
pure row function, so no user-keyed shuffle is needed at any corpus
size. Σ cents² carries a loud overflow guard (int64 headroom checked
per batch against the running bound, not silently wrapped).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import strip_meta as _strip_meta

AB_THRESHOLD = 0.5           # md5 unit < T → variant 'A', else 'B'

# cents² sums: guard far below int64; a single batch's Σ cents² must
# stay under this so the final Sum cannot wrap even across 2^20 blocks
_SQ_BATCH_BOUND = (1 << 62) // (1 << 20)


def ab_metrics(sf_dir: str, threshold: float = AB_THRESHOLD):
    """events → (variant, event_type, n_events, sum_cents,
    sum_sq_cents): exact integer experiment moments per cell; NULL
    values count as 0 cents (SQL coalesce semantics)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .groupkit import int_group_sums
    from .text import _md5_unit_interval

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "value"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        from .props import _CENTS_CAST_LIMIT
        from .rollup import _dec, _enc

        users = batch["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # the repo's deterministic-assignment contract: per-row md5
        # of the stringified key (shared with split/sample oracles)
        u = _md5_unit_interval([str(x) for x in users])
        variant = np.where(u < threshold, "A", "B")
        vals = batch["value"].to_numpy(zero_copy_only=False)
        finite = ~np.isnan(vals)
        # guard the float→int64 cents cast itself (DuckDB raises on
        # the same cast — the engine must fail loudly, never wrap)
        if finite.any() and np.abs(vals[finite]).max() > _CENTS_CAST_LIMIT:
            raise OverflowError(
                "ab_metrics: value exceeds the exact-cents int64 cast "
                "range (DuckDB raises on the same cast)")
        cents = np.floor(vals * 100 + 0.5)
        cents = np.where(np.isnan(cents), 0, cents).astype(np.int64)
        # per-element bound BEFORE squaring: cents² of anything past
        # 2^31 wraps int64 silently, evading the batch-sum check below
        if len(cents) and np.abs(cents).max() > (1 << 31):
            raise OverflowError(
                "ab_metrics: |cents| exceeds 2^31; cents^2 would wrap "
                "int64 — rescale the value column")
        sq = cents * cents
        if sq.sum(dtype=np.uint64) > np.uint64(_SQ_BATCH_BOUND):
            raise OverflowError(
                "ab_metrics: batch sum of cents^2 exceeds the int64 "
                "headroom bound; rescale the value column")
        # NULL-safe type key (rollup._enc): a NULL event_type groups
        # as SQL NULL, never as the literal string 'None'; the fused
        # key stays ENCODED through the groupby (Ray groupby/sort on a
        # NULL key is undefined) and is decoded after the aggregate
        key = np.char.add(np.char.add(variant, "\x1f"),
                          _enc(batch["event_type"]))
        uniq, codes = np.unique(key, return_inverse=True)
        n = len(uniq)
        return pa.table({
            "k": pa.array(uniq, pa.string()),
            "n": pa.array(np.bincount(codes, minlength=n)
                          .astype(np.int64)),
            "cents": pa.array(int_group_sums(codes, cents, n)),
            "sq": pa.array(int_group_sums(codes, sq, n)),
        })

    def decode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .rollup import _dec
        # _enc escapes \x1f inside values, so the key always splits
        # into exactly 2 parts; max_splits=1 is belt-and-braces only
        parts = pc.split_pattern(batch["k"], pattern="\x1f",
                                 max_splits=1)
        return pa.table({
            "variant": pc.list_element(parts, 0),
            "event_type": _dec(pc.list_element(parts, 1)),
            "n_events": batch["n_events"].cast(pa.int64()),
            "sum_cents": batch["sum_cents"].cast(pa.int64()),
            "sum_sq_cents": batch["sum_sq_cents"].cast(pa.int64()),
        })

    return events.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("k").aggregate(
            Sum("n", alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
            Sum("sq", alias_name="sum_sq_cents")) \
        .map_batches(decode, batch_format="pyarrow")


_AB_MD5_UNIT_SQL = (
    "(CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) "
    "AS BIGINT) / 4294967296.0)")

AB_METRICS_SQL = f"""
SELECT CASE WHEN {_AB_MD5_UNIT_SQL} < {AB_THRESHOLD}
            THEN 'A' ELSE 'B' END AS variant,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0))
            AS BIGINT) AS sum_cents,
       CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0)
                * coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0))
            AS BIGINT) AS sum_sq_cents
FROM events
GROUP BY 1, 2
"""
