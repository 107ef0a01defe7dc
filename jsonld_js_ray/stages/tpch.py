"""Star-schema joins over the full TPC-H-ish dimension chain.

These two operators close input-table coverage (region, nation,
supplier, part — the dimensions nothing else reads) with the two
canonical distributed star-join plans:

- local_supplier_revenue (the TPC-H Q5 shape): revenue per nation
  where the ordering customer and the line's supplier share a nation,
  inside one region and one order-date year. The tiny dimensions
  (region⋈nation, supplier) BROADCAST once; the two fact⋈fact hops
  (orders⋈customer on custkey, then order-side⋈lineitem on orderkey)
  are explicit partitioned hash joins with per-batch partials — the
  plan a 100 TB engine runs when both join inputs are large.
- brand_revenue (the Q9-flavoured part rollup): lineitem ⋈ part on
  partkey via dimension broadcast, revenue per brand. part is the
  classic mid-size dimension: broadcast here (the star-schema
  default); the bucketed alternative is exercised by the orderkey
  joins above.

Money follows the repo's exact-cents contract (floor to integer cents
per row BEFORE summing, so group sums are order-free and hash-exact).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import strip_meta as _strip_meta
from .joins import rev_cents_sql_expr, revenue_cents

Q5_REGION = "ASIA"
Q5_YEAR_LO = "1996-01-01"
Q5_YEAR_HI = "1997-01-01"
Q5_BUCKETS = 32
# fact-side map task bundling: Ray schedules one map task per input
# block unless batch_size asks for more rows, and the parquet read
# splits even a 10 MB toy table into 64 blocks — ~500 sub-20ms tasks
# across the star join made scheduling 6x the remote wall (SCALE.md).
# 64k keyed int rows ≈ 2 MB per task keeps toy scale at a handful of
# tasks while leaving real-scale parallelism untouched (large inputs
# have >=64k-row blocks already, so bundling is a no-op there). The
# sort barriers shrink the same way: their partition count follows
# the upstream block count.
Q5_FACT_BATCH = 65536


def _read(sf_dir: str, table: str, columns, filter=None):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/{table}.parquet", columns=columns, filter=filter,
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)


def local_supplier_revenue(sf_dir: str, region: str = Q5_REGION):
    """region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem ⋈ supplier →
    (nation, n_items, rev_cents) for lineitems whose customer and
    supplier sit in the same ``region`` nation, orders placed in the
    Q5 year window (pruned at the parquet read)."""
    import pandas as pd
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .groupkit import int_group_sums, sorted_lookup
    from .sketches import _hash64

    # dimension chain on the driver: region ⋈ nation (30 rows total)
    from ..rayutil import read_small_pandas

    nation = read_small_pandas(sf_dir, "nation",
                               ["n_nationkey", "n_name", "n_regionkey"])
    reg = read_small_pandas(sf_dir, "region",
                            ["r_regionkey", "r_name"])
    rk = int(reg[reg["r_name"] == region]["r_regionkey"].iloc[0])
    nat = nation[nation["n_regionkey"] == rk]
    nat_keys = np.sort(nat["n_nationkey"].to_numpy(np.int64))
    name_of = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))
    nat_ref = ray.put(nat_keys)

    supplier = read_small_pandas(sf_dir, "supplier",
                                 ["s_suppkey", "s_nationkey"])
    supp_nat = np.full(int(supplier["s_suppkey"].max()) + 1, -1,
                       np.int64)
    supp_nat[supplier["s_suppkey"].to_numpy(np.int64)] = \
        supplier["s_nationkey"].to_numpy(np.int64)
    supp_ref = ray.put(supp_nat)

    def kb(keys: np.ndarray) -> np.ndarray:
        return (_hash64(keys) % np.uint64(Q5_BUCKETS)).astype(np.int32)

    # fact hop 1: orders ⋈ customer on custkey (both large → bucketed)
    def cust_rows(batch: pa.Table) -> pa.Table:
        keys = ray.get(nat_ref)
        ck = batch["c_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        cn = batch["c_nationkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = np.isin(cn, keys)        # region filter pushed to the row
        ck, cn = ck[m], cn[m]
        return pa.table({
            "key": pa.array(ck),
            "nat": pa.array(cn),
            "okey": pa.array(np.zeros(len(ck), np.int64)),
            "side": pa.array(np.zeros(len(ck), np.int8)),
            "bucket": pa.array(kb(ck)),
        })

    def order_rows(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "key": pa.array(ck),
            "nat": pa.array(np.full(len(ck), -1, np.int64)),
            "okey": pa.array(ok),
            "side": pa.array(np.ones(len(ck), np.int8)),
            "bucket": pa.array(kb(ck)),
        })

    lo = np.datetime64(Q5_YEAR_LO).astype("datetime64[us]")
    hi = np.datetime64(Q5_YEAR_HI).astype("datetime64[us]")
    hop1 = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey"]) \
        .map_batches(cust_rows, batch_format="pyarrow",
                     batch_size=Q5_FACT_BATCH) \
        .union(_read(
            sf_dir, "orders", ["o_orderkey", "o_custkey"],
            filter=(pads.field("o_orderdate") >= pads.scalar(lo))
            & (pads.field("o_orderdate") < pads.scalar(hi)))
            .map_batches(order_rows, batch_format="pyarrow",
                         batch_size=Q5_FACT_BATCH))

    def join_custkey(g: pd.DataFrame) -> pa.Table:
        is_o = (g["side"] == 1).to_numpy()
        ck = g["key"].to_numpy(np.int64)[~is_o]
        cn = g["nat"].to_numpy(np.int64)[~is_o]
        order = np.argsort(ck, kind="stable")
        ck, cn = ck[order], cn[order]
        ok_ck = g["key"].to_numpy(np.int64)[is_o]
        okey = g["okey"].to_numpy(np.int64)[is_o]
        hit, idx = sorted_lookup(ck, ok_ck)
        out_ok = okey[hit]
        return pa.table({
            "key": pa.array(out_ok),          # orderkey now the key
            "nat": pa.array(cn[idx[hit]]),
            "rev": pa.array(np.zeros(len(out_ok), np.int64)),
            "n": pa.array(np.zeros(len(out_ok), np.int64)),
            "side": pa.array(np.zeros(len(out_ok), np.int8)),
            "bucket": pa.array(kb(out_ok)),
        })

    order_nat = hop1.groupby("bucket").map_groups(
        join_custkey, batch_format="pandas")

    # fact hop 2: lineitem partials (orderkey, supplier-nation) join
    # the order-side rows on orderkey; supplier nation attaches via
    # the broadcast dimension array (one gather per batch)
    def li_partials(batch: pa.Table) -> pa.Table:
        sn = ray.get(supp_ref)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = revenue_cents(price, disc)
        # bounds-guarded dimension gather: an out-of-range or negative
        # suppkey DROPS (INNER semantics, mirroring the SQL join) —
        # a bare sn[sk] would wrap negatives onto the wrong supplier
        ok_rng = (sk >= 0) & (sk < len(sn))
        nat = np.full(len(sk), -1, np.int64)
        nat[ok_rng] = sn[sk[ok_rng]]
        keep = nat >= 0
        ok, cents, nat = ok[keep], cents[keep], nat[keep]
        # partial per (orderkey, supplier nation): nation domain tiny
        uniq, first, codes = np.unique(
            ok * np.int64(64) + nat, return_index=True,
            return_inverse=True)
        n = len(uniq)
        return pa.table({
            "key": pa.array(ok[first]),
            "nat": pa.array(nat[first]),
            "rev": pa.array(int_group_sums(codes, cents, n)),
            "n": pa.array(np.bincount(codes, minlength=n)
                          .astype(np.int64)),
            "side": pa.array(np.ones(n, np.int8)),
            "bucket": pa.array(kb(ok[first])),
        })

    hop2 = order_nat.union(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice",
               "l_discount"])
        .map_batches(li_partials, batch_format="pyarrow",
                     batch_size=Q5_FACT_BATCH))

    def join_orderkey(g: pd.DataFrame) -> pa.Table:
        is_l = (g["side"] == 1).to_numpy()
        ok = g["key"].to_numpy(np.int64)[~is_l]
        cn = g["nat"].to_numpy(np.int64)[~is_l]
        order = np.argsort(ok, kind="stable")
        ok, cn = ok[order], cn[order]
        lk = g["key"].to_numpy(np.int64)[is_l]
        ln = g["nat"].to_numpy(np.int64)[is_l]
        lr = g["rev"].to_numpy(np.int64)[is_l]
        lcnt = g["n"].to_numpy(np.int64)[is_l]
        if not len(ok):
            local = np.zeros(len(lk), bool)
        else:
            hit, idx = sorted_lookup(ok, lk)
            # the Q5 predicate: customer nation == supplier nation
            local = hit & (ln == cn[idx])
        nat = ln[local]
        uniq, codes = np.unique(nat, return_inverse=True)
        n = len(uniq)
        return pa.table({
            "natkey": pa.array(uniq),
            "n": pa.array(int_group_sums(codes, lcnt[local], n)),
            "rev": pa.array(int_group_sums(codes, lr[local], n)),
        })

    partials = hop2.groupby("bucket").map_groups(
        join_orderkey, batch_format="pandas")

    def name_rows(batch: pa.Table) -> pa.Table:
        nk = batch["natkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "nation": pa.array([name_of[int(k)] for k in nk],
                               pa.string()),
            "n": batch["n"],
            "rev": batch["rev"],
        })

    return partials.map_batches(name_rows, batch_format="pyarrow") \
        .groupby("nation").aggregate(
            Sum("n", alias_name="n_items"),
            Sum("rev", alias_name="rev_cents"))


LOCAL_SUPPLIER_REVENUE_SQL = f"""
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT)
           AS rev_cents
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
               AND s.s_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{Q5_REGION}'
  AND o.o_orderdate >= TIMESTAMP '{Q5_YEAR_LO} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{Q5_YEAR_HI} 00:00:00'
GROUP BY n.n_name
"""


def brand_revenue(sf_dir: str):
    """lineitem ⋈ part (dimension broadcast on partkey) →
    (brand, n_items, rev_cents)."""
    import ray
    from ray.data.aggregate import Sum

    from .groupkit import int_group_sums

    from ..rayutil import read_small_pandas

    part = read_small_pandas(sf_dir, "part", ["p_partkey", "p_brand"])
    brands, bcodes = np.unique(part["p_brand"].to_numpy(object),
                               return_inverse=True)
    brand_code = np.full(int(part["p_partkey"].max()) + 1, -1,
                         np.int64)
    brand_code[part["p_partkey"].to_numpy(np.int64)] = bcodes
    ref = ray.put(brand_code)

    def partial(batch: pa.Table) -> pa.Table:
        bc = ray.get(ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = revenue_cents(price, disc)
        # bounds-guarded gather (see li_partials): negatives would
        # wrap onto the LAST part's brand, out-of-range would raise
        ok_rng = (pk >= 0) & (pk < len(bc))
        codes = np.full(len(pk), -1, np.int64)
        codes[ok_rng] = bc[pk[ok_rng]]
        m = codes >= 0                # INNER semantics: unknown parts drop
        codes, cents = codes[m], cents[m]
        uniq = np.unique(codes)
        remap = np.searchsorted(uniq, codes)
        n = len(uniq)
        return pa.table({
            "brand": pa.array(brands[uniq].astype(str), pa.string()),
            "n": pa.array(np.bincount(remap, minlength=n)
                          .astype(np.int64)),
            "rev": pa.array(int_group_sums(remap, cents, n)),
        })

    return _read(sf_dir, "lineitem",
                 ["l_partkey", "l_extendedprice", "l_discount"]) \
        .map_batches(partial, batch_format="pyarrow",
                     batch_size=65536) \
        .groupby("brand").aggregate(
            Sum("n", alias_name="n_items"),
            Sum("rev", alias_name="rev_cents"))


BRAND_REVENUE_SQL = f"""
SELECT p.p_brand AS brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT)
           AS rev_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY p.p_brand
"""
