"""ROLLUP aggregation over the ``events`` stream (grouping-set class).

The OLAP operator family Ray Data has no primitive for: one pass that
reports the same aggregates at every prefix of the grouping key list —
(event_type, day), (event_type), and the grand total — what SQL spells
``GROUP BY ROLLUP(event_type, day)``. A reporting/feature pipeline
needs these subtotals together (daily per-type counts AND per-type
totals AND the corpus total) and computing them as three independent
scans would read the input three times.

Shape: ONE read + one per-batch partial aggregation at the FINEST
level (the shuffle moves one row per distinct (type, day) per batch —
bounded by the key-combination count, not the corpus), one small
groupby to finish the finest level, then the coarser levels are
re-aggregated FROM the finest level's already-tiny output (the classic
rollup cascade: each level feeds the next, never the raw input). The
grand total is a scalar aggregate. Monetary sums use exact integer
cents (float sums are order-nondeterministic and cannot be
oracle-hashed); NULL values contribute 0 cents but still count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..rayutil import strip_meta as _strip_meta

_SEP = "\x1f"
_ESC = "\x1e"


def _cents(vals: np.ndarray) -> np.ndarray:
    out = np.floor(vals * 100 + 0.5)
    return np.where(np.isnan(out), 0, out).astype(np.int64)


def _enc(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """NULL-safe, SEPARATOR-safe key encoding: 'v' + escaped value, or
    bare 'n' for NULL — collision-free by the prefix, so a genuine NULL
    group (SQL groups NULLs together) round-trips exactly and can never
    collide with a value that stringifies to 'None'. Values are escaped
    (\\x1e → \\x1e0, \\x1f → \\x1e1) so an encoded field NEVER contains
    the fused-key separator: decoding a multi-field key by splitting on
    \\x1f is exact even when a raw value contains \\x1f. (In the
    encoded text \\x1e is always followed by exactly one code char, so
    the two decode replaces cannot misfire.) EVERY keyed partial
    aggregate in this module must use this one encoder (and ``_dec``)
    so the convention can't silently diverge between operators."""
    vals = col.to_numpy(zero_copy_only=False)
    isnull = pc.is_null(
        col.combine_chunks() if isinstance(col, pa.ChunkedArray)
        else col).to_numpy(zero_copy_only=False)
    filled = np.where(isnull, "", vals).astype(str)
    filled = np.char.replace(filled, _ESC, _ESC + "0")
    filled = np.char.replace(filled, _SEP, _ESC + "1")
    return np.where(isnull, "n", np.char.add("v", filled))


def _dec(enc: pa.Array) -> pa.Array:
    """Inverse of _enc: strip the 'v' prefix, unescape, 'n' → NULL."""
    vals = pc.utf8_slice_codeunits(enc, 1)
    vals = pc.replace_substring(vals, pattern=_ESC + "1",
                                replacement=_SEP)
    vals = pc.replace_substring(vals, pattern=_ESC + "0",
                                replacement=_ESC)
    return pc.if_else(pc.equal(enc, "n"),
                      pa.scalar(None, pa.string()), vals)


def _finest_level(sf_dir: str):
    """events → the decoded finest grouping level (event_type, day,
    n_events, total_cents): ONE read, per-batch keyed partials over
    the fused NULL-safe (type, day) key (the shuffle moves one row per
    distinct combination per batch), one groupby to finish. Both
    grouping-set operators (rollup_events, cube_events) derive every
    coarser level from THIS output, so the keyed-partial contract
    lives in exactly one place."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        day = _enc(pc.strftime(batch["ts"], format="%Y-%m-%d"))
        et = _enc(batch["event_type"])
        cents = _cents(batch["value"].to_numpy(zero_copy_only=False))
        key = np.char.add(np.char.add(et, _SEP), day)
        uniq, codes = np.unique(key, return_inverse=True)
        from .groupkit import int_group_sums
        n = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        c = int_group_sums(codes, cents, len(uniq))
        return pa.table({
            "k": pa.array(uniq, pa.string()),
            "n": pa.array(n),
            "cents": pa.array(c),
        })

    def fine_rows(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["k"], pattern=_SEP)
        return pa.table({
            "event_type": _dec(pc.list_element(parts, 0)),
            "day": _dec(pc.list_element(parts, 1)),
            "n_events": batch["n"].cast(pa.int64()),
            "total_cents": batch["cents"].cast(pa.int64()),
        })

    return events.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536) \
        .groupby("k").aggregate(Sum("n", alias_name="n"),
                                Sum("cents", alias_name="cents")) \
        .map_batches(fine_rows, batch_format="pyarrow")


def rollup_events(sf_dir: str):
    """events → (event_type, day, n_events, total_cents) at all three
    rollup levels; the subtotal rows carry NULL in the rolled-up
    columns (SQL ROLLUP convention)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .entity_merge import _pin

    # pinned: level 0 feeds both the output union and the level-1
    # re-aggregation — unpinned, the events read would run twice
    level0 = _pin(_finest_level(sf_dir))

    # rollup cascade: level 1 re-aggregates level 0's output (tiny),
    # never the raw events
    def strip_day(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch["event_type"],
            "n": batch["n_events"],
            "cents": batch["total_cents"],
        })

    by_type = level0.map_batches(strip_day, batch_format="pyarrow") \
        .groupby("event_type") \
        .aggregate(Sum("n", alias_name="n"),
                   Sum("cents", alias_name="cents"))

    def type_rows(batch: pa.Table) -> pa.Table:
        k = len(batch)
        return pa.table({
            "event_type": batch["event_type"],
            "day": pa.array([None] * k, pa.string()),
            "n_events": batch["n"].cast(pa.int64()),
            "total_cents": batch["cents"].cast(pa.int64()),
        })

    level1 = by_type.map_batches(type_rows, batch_format="pyarrow")
    level1 = level1.materialize()

    # grand total: a scalar aggregate over the (already tiny) level-1
    # rows — the only driver-side values are two int64 scalars
    tot = level1.aggregate(Sum("n_events", alias_name="n"),
                           Sum("total_cents", alias_name="cents"))
    level2 = rd.from_arrow(pa.table({
        "event_type": pa.array([None], pa.string()),
        "day": pa.array([None], pa.string()),
        "n_events": pa.array([int(tot["n"])], pa.int64()),
        "total_cents": pa.array([int(tot["cents"])], pa.int64()),
    }))

    return level0.union(level1).union(level2)


def cube_events(sf_dir: str):
    """events → (event_type, day, n_events, total_cents) at ALL FOUR
    ``GROUP BY CUBE(event_type, day)`` grouping sets — the rollup's
    (type, day)/(type)/() levels plus the cross-cut (day) level a
    ROLLUP cannot produce. Subtotal rows carry NULL in the collapsed
    columns (SQL convention, via the module's shared NULL-safe
    encoder).

    Same cascade discipline as rollup_events — every coarser level
    re-aggregates the finest level's already-tiny output, never the
    raw events — but the finest level feeds THREE consumers here, so
    it is lineage-pinned once (from_arrow_refs; a bare ``union`` of
    derived datasets would re-run the raw read per consumer, see
    entity_merge._pin) and the cube costs one corpus pass total."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .entity_merge import _pin

    level0 = _pin(_finest_level(sf_dir))

    def collapse(keep: str):
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                keep: batch[keep],
                "n": batch["n_events"],
                "cents": batch["total_cents"],
            })
        return fn

    def subtotal_rows(keep: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = len(batch)
            null = pa.array([None] * k, pa.string())
            return pa.table({
                "event_type": batch[keep] if keep == "event_type"
                else null,
                "day": batch[keep] if keep == "day" else null,
                "n_events": batch["n"].cast(pa.int64()),
                "total_cents": batch["cents"].cast(pa.int64()),
            })
        return fn

    levels = [level0]
    for keep in ("event_type", "day"):
        levels.append(
            level0.map_batches(collapse(keep), batch_format="pyarrow")
            .groupby(keep)
            .aggregate(Sum("n", alias_name="n"),
                       Sum("cents", alias_name="cents"))
            .map_batches(subtotal_rows(keep), batch_format="pyarrow"))

    tot = level0.aggregate(Sum("n_events", alias_name="n"),
                           Sum("total_cents", alias_name="cents"))
    levels.append(rd.from_arrow(pa.table({
        "event_type": pa.array([None], pa.string()),
        "day": pa.array([None], pa.string()),
        "n_events": pa.array([int(tot["n"])], pa.int64()),
        "total_cents": pa.array([int(tot["cents"])], pa.int64()),
    })))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


CUBE_EVENTS_SQL = """
SELECT event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0))
            AS BIGINT) AS total_cents
FROM events
GROUP BY CUBE(event_type, day)
"""


ROLLUP_EVENTS_SQL = """
SELECT event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(coalesce(CAST(floor(value * 100 + 0.5) AS BIGINT), 0))
            AS BIGINT) AS total_cents
FROM events
GROUP BY ROLLUP(event_type, day)
"""


# --- TPC-H-Q1-shaped pricing summary over lineitem ---
# The canonical read-prune + partial-aggregate benchmark query: filter
# at the parquet read (shipdate cutoff -> row groups never leave
# storage), per-batch partials over the 6-value (returnflag,
# linestatus) key, one tiny groupby to finish. Money/quantity sums use
# the repo's exact-cents contract: each row's disc_price and charge
# are the same IEEE-754 double products in numpy and DuckDB, floored
# to integer cents BEFORE summing, so group sums are order-free and
# hash-exact (a float SUM would be order-nondeterministic).

Q1_CUTOFF = "1998-09-02"


def pricing_summary(sf_dir: str, cutoff: str = Q1_CUTOFF):
    """lineitem → one row per (l_returnflag, l_linestatus) with exact
    integer-cent sums of quantity, base price, discounted price and
    charge, plus the row count, over rows shipped on/before
    ``cutoff``."""
    import pyarrow.dataset as pads
    import ray.data as rd
    from ray.data.aggregate import Sum

    cut = np.datetime64(cutoff)
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax"],
        filter=pads.field("l_shipdate")
        <= pads.scalar(cut.astype("datetime64[us]")),
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        rf = _enc(batch["l_returnflag"])
        ls = _enc(batch["l_linestatus"])
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False)
        price = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        tax = batch["l_tax"].to_numpy(zero_copy_only=False)
        disc_price = price * (1 - disc)
        qty_c = _cents(qty)
        base_c = _cents(price)
        disc_c = _cents(disc_price)
        charge_c = _cents(disc_price * (1 + tax))
        key = np.char.add(np.char.add(rf, _SEP), ls)
        uniq, codes = np.unique(key, return_inverse=True)
        from .groupkit import int_group_sums
        k = len(uniq)
        return pa.table({
            "k": pa.array(uniq, pa.string()),
            "sum_qty_c": pa.array(int_group_sums(codes, qty_c, k)),
            "sum_base_c": pa.array(int_group_sums(codes, base_c, k)),
            "sum_disc_c": pa.array(int_group_sums(codes, disc_c, k)),
            "sum_charge_c": pa.array(
                int_group_sums(codes, charge_c, k)),
            "n_items": pa.array(
                np.bincount(codes, minlength=k).astype(np.int64)),
        })

    agg = li.map_batches(partial, batch_format="pyarrow",
                         batch_size=65536) \
        .groupby("k").aggregate(
            Sum("sum_qty_c", alias_name="sum_qty_c"),
            Sum("sum_base_c", alias_name="sum_base_c"),
            Sum("sum_disc_c", alias_name="sum_disc_c"),
            Sum("sum_charge_c", alias_name="sum_charge_c"),
            Sum("n_items", alias_name="n_items"))

    def final(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["k"], pattern=_SEP)
        return pa.table({
            "l_returnflag": _dec(pc.list_element(parts, 0)),
            "l_linestatus": _dec(pc.list_element(parts, 1)),
            "sum_qty_c": batch["sum_qty_c"].cast(pa.int64()),
            "sum_base_c": batch["sum_base_c"].cast(pa.int64()),
            "sum_disc_c": batch["sum_disc_c"].cast(pa.int64()),
            "sum_charge_c": batch["sum_charge_c"].cast(pa.int64()),
            "n_items": batch["n_items"].cast(pa.int64()),
        })

    return agg.map_batches(final, batch_format="pyarrow")


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_qty_c,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_base_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100
                           + 0.5) AS BIGINT)) AS BIGINT)
           AS sum_disc_c,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                           * (1 + l_tax) * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_charge_c,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""
