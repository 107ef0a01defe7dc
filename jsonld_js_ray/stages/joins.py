"""Join patterns (guide-idiomatic; SURVEY.md §2.4 joins/lookups row).

- broadcast_join: small side (dimension table) via ray.put once +
  per-batch vectorized lookup — no shuffle. Used for customer→orders.
- bucketed_hash_join: both sides large → add bucket = splitmix64(key) % B
  to each side, groupby bucket on the union, join per bucket in pandas.
  The explicit partitioned hash join from the Ray guide (portable across
  Ray versions without Dataset.join).

Monetary aggregates use exact integer cents (float sums are
order-nondeterministic and cannot be oracle-hashed).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa


from ..rayutil import strip_meta as _strip_meta


def broadcast_join_orders_customers(sf_dir: str):
    """orders ⋈ customer (broadcast) → orders + total cents per market
    segment. One small groupby after a shuffle-free lookup."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from ..rayutil import read_small_pandas

    customers = read_small_pandas(sf_dir, "customer",
                                  ["c_custkey", "c_mktsegment"])
    seg_of = dict(zip(customers["c_custkey"].astype(int),
                      customers["c_mktsegment"]))
    ref = ray.put(seg_of)

    def attach_segment(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import ray as _ray
        seg = _ray.get(ref)
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        # INNER-join semantics (matches BROADCAST_JOIN_SQL): orders with
        # no customer row are dropped, not bucketed as UNKNOWN.
        # Vectorized: one hashed map pass + one numpy cents op.
        segments = pd.Series(keys).map(seg)
        mask = segments.notna().to_numpy()
        cents = np.floor(price[mask] * 100 + 0.5).astype(np.int64)
        return pa.table({
            "segment": pa.array(segments[mask], pa.string()),
            "cents": pa.array(cents, pa.int64()),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice"]
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)
    joined = orders.map_batches(attach_segment, batch_format="pyarrow",
                                batch_size=65536)
    return joined.groupby("segment").aggregate(
        Count(alias_name="n_orders"),
        Sum("cents", alias_name="total_cents"))


BROADCAST_JOIN_SQL = """
SELECT c.c_mktsegment AS segment,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""

NUM_BUCKETS = 16


def revenue_cents(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    """The repo's ONE revenue-money kernel: floor to integer cents per
    row BEFORE any summing (group sums stay order-free and
    hash-exact). Mirrored by rev_cents_sql_expr — change BOTH or the
    oracle parity silently breaks."""
    return np.floor(price * (1.0 - disc) * 100 + 0.5).astype(np.int64)


def rev_cents_sql_expr(alias: str) -> str:
    """The SQL mirror of revenue_cents for a lineitem aliased
    ``alias``."""
    return (f"CAST(floor({alias}.l_extendedprice * "
            f"(1.0 - {alias}.l_discount) * 100 + 0.5) AS BIGINT)")


def _bucketize(key_col: str):
    """map_batches fn: append a splitmix64(key) % NUM_BUCKETS bucket
    column — the shared partitioner of every explicit hash join here.
    Vectorized over the whole column; the bucket id only co-locates
    rows, so any deterministic mix works."""
    from .sketches import _hash64

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        buckets = (_hash64(keys.astype(np.int64))
                   % np.uint64(NUM_BUCKETS)).astype(np.int32)
        return batch.append_column("bucket", pa.array(buckets))
    return fn


def bucketed_hash_join_lineitem_orders(sf_dir: str):
    """lineitem ⋈ orders on orderkey (both sides 'large') → revenue cents
    per order priority.

    Explicit partitioned hash join: tag each side, bucket by
    splitmix64(orderkey) % B, union, groupby(bucket), pandas join per
    bucket,
    then a tiny final aggregate. Per-bucket PARTIAL aggregation keeps the
    final groupby at |priorities| × B rows."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def li_prep(batch: pa.Table) -> pa.Table:
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        rev_cents = revenue_cents(price, disc)
        return pa.table({
            "key": batch["l_orderkey"],
            "rev_cents": pa.array(rev_cents),
            "priority": pa.array([None] * batch.num_rows, pa.string()),
            "side": pa.array(["L"] * batch.num_rows, pa.string()),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def o_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["o_orderkey"],
            "rev_cents": pa.array([0] * batch.num_rows, pa.int64()),
            "priority": batch["o_orderpriority"],
            "side": pa.array(["O"] * batch.num_rows, pa.string()),
        })

    both = lineitem.map_batches(li_prep, batch_format="pyarrow") \
        .union(orders.map_batches(o_prep, batch_format="pyarrow")) \
        .map_batches(_bucketize("key"), batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["side"] == "L"]
        right = g[g["side"] == "O"][["key", "priority"]]
        merged = left.merge(right, on="key", suffixes=("", "_o"))
        if merged.empty:
            return pd.DataFrame({
                "priority": pd.Series(dtype="object"),
                "n_items": pd.Series(dtype="int64"),
                "rev_cents": pd.Series(dtype="int64")})
        agg = merged.groupby("priority_o").agg(
            n_items=("key", "size"),
            rev_cents=("rev_cents", "sum")).reset_index()
        return agg.rename(columns={"priority_o": "priority"})

    partials = both.groupby("bucket").map_groups(
        join_bucket, batch_format="pandas")
    return partials.groupby("priority").aggregate(
        Sum("n_items", alias_name="n_items"),
        Sum("rev_cents", alias_name="rev_cents"))


BUCKETED_JOIN_SQL = f"""
SELECT o.o_orderpriority AS priority,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT) AS rev_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


ANTI_PRICE_FLOOR = 400000.0


def anti_join_customers_without_orders(sf_dir: str):
    """customer ▷ σ(orders) (ANTI join on custkey): customers with NO
    order above ANTI_PRICE_FLOOR, as (c_custkey, segment) rows. (The
    unfiltered variant is vacuous on this generator — every customer
    has at least one order — so the probe side is the high-value order
    subset, pruned AT THE READ via a parquet row filter.)

    Same explicit partitioned-hash shape as the bucketed inner join —
    tag sides, bucket by splitmix64(custkey), one groupby — but the
    probe side ships only per-batch DISTINCT custkeys (the partial
    dedup cuts the shuffled orders volume to |distinct keys per batch|)
    and the in-bucket kernel is one vectorized ``np.isin`` set
    difference, no pandas merge."""
    import pyarrow.dataset as pads
    import ray.data as rd

    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def c_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "segment": batch["c_mktsegment"],
            "side": pa.array(["C"] * batch.num_rows, pa.string()),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pads.field("o_totalprice") > ANTI_PRICE_FLOOR,
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def o_prep(batch: pa.Table) -> pa.Table:
        keys = np.unique(
            batch["o_custkey"].to_numpy(zero_copy_only=False))
        return pa.table({
            "key": pa.array(keys.astype(np.int64)),
            "segment": pa.array([None] * len(keys), pa.string()),
            "side": pa.array(["O"] * len(keys), pa.string()),
        })

    both = customers.map_batches(c_prep, batch_format="pyarrow") \
        .union(orders.map_batches(o_prep, batch_format="pyarrow")) \
        .map_batches(_bucketize("key"), batch_format="pyarrow")

    def anti_bucket(g) -> pa.Table:
        side = g["side"].to_numpy()
        keys = g["key"].to_numpy().astype(np.int64)
        is_c = side == "C"
        c_keys = keys[is_c]
        keep = ~np.isin(c_keys, keys[~is_c])
        return pa.table({
            "c_custkey": pa.array(c_keys[keep], pa.int64()),
            "segment": pa.array(g["segment"].to_numpy()[is_c][keep],
                                pa.string()),
        })

    return both.groupby("bucket").map_groups(
        anti_bucket, batch_format="pandas")


ANTI_JOIN_SQL = f"""
SELECT c.c_custkey, c.c_mktsegment AS segment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {ANTI_PRICE_FLOOR})
"""


def left_join_customer_order_stats(sf_dir: str):
    """customer ⟕ σ(orders) (LEFT OUTER join on custkey): every
    customer row survives, with the count and max cents of their
    high-value orders — 0/0 when none match (the NULL-preserving
    branch an inner join drops; integer 0 instead of NULL so the
    result stays hash-comparable).

    Same explicit partitioned-hash shape as the anti join; the probe
    side ships per-batch PARTIAL (custkey, count, max) aggregates, so
    the shuffled volume is distinct-keys-per-batch, and the in-bucket
    kernel re-reduces partials then left-merges — both sides
    vectorized."""
    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd

    customers = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def c_prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "key": batch["c_custkey"].cast(pa.int64()),
            "segment": batch["c_mktsegment"],
            "cnt": pa.array([0] * batch.num_rows, pa.int64()),
            "maxc": pa.array([0] * batch.num_rows, pa.int64()),
            "side": pa.array(["C"] * batch.num_rows, pa.string()),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"],
        filter=pads.field("o_totalprice") > ANTI_PRICE_FLOOR,
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def o_prep(batch: pa.Table) -> pa.Table:
        keys = batch["o_custkey"].to_numpy(zero_copy_only=False)
        price = batch["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        uniq, codes = np.unique(keys, return_inverse=True)
        maxc = np.zeros(len(uniq), np.int64)
        np.maximum.at(maxc, codes, cents)
        return pa.table({
            "key": pa.array(uniq.astype(np.int64)),
            "segment": pa.array([None] * len(uniq), pa.string()),
            "cnt": pa.array(
                np.bincount(codes, minlength=len(uniq)).astype(np.int64)),
            "maxc": pa.array(maxc),
            "side": pa.array(["O"] * len(uniq), pa.string()),
        })

    both = customers.map_batches(c_prep, batch_format="pyarrow") \
        .union(orders.map_batches(o_prep, batch_format="pyarrow")) \
        .map_batches(_bucketize("key"), batch_format="pyarrow")

    def left_bucket(g: pd.DataFrame) -> pa.Table:
        is_c = (g["side"] == "C").to_numpy()
        c = g[is_c]
        o = g[~is_c]
        # re-reduce the probe partials, then LEFT merge
        agg = o.groupby("key").agg(cnt=("cnt", "sum"),
                                   maxc=("maxc", "max"))
        m = c[["key", "segment"]].merge(agg, on="key", how="left")
        return pa.table({
            "c_custkey": pa.array(m["key"].to_numpy(np.int64)),
            "segment": pa.array(m["segment"], pa.string()),
            "n_big": pa.array(
                m["cnt"].fillna(0).to_numpy(np.int64)),
            "max_cents": pa.array(
                m["maxc"].fillna(0).to_numpy(np.int64)),
        })

    return both.groupby("bucket").map_groups(
        left_bucket, batch_format="pandas")


LEFT_JOIN_SQL = f"""
SELECT c.c_custkey,
       c.c_mktsegment AS segment,
       CAST(coalesce(o.n_big, 0) AS BIGINT) AS n_big,
       CAST(coalesce(o.max_cents, 0) AS BIGINT) AS max_cents
FROM customer c LEFT JOIN (
  SELECT o_custkey,
         count(*) AS n_big,
         max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             AS max_cents
  FROM orders WHERE o_totalprice > {ANTI_PRICE_FLOOR}
  GROUP BY o_custkey) o
ON o.o_custkey = c.c_custkey
"""


# --- Bloom-filter semi-join (the scale-path join pruning pattern) ---
# At 100 TB the build side of a semi-join is too big to broadcast as a
# raw key set, but a Bloom filter over its keys is a few MB regardless
# of cardinality: build it distributed (per-batch bitmaps, OR-reduced
# — the driver touches n_blocks × M/8 bytes, bounded by block count,
# never keys), broadcast ONCE via ray.put, and prefilter the probe
# side BEFORE the shuffle so only probable matches (true matches +
# the ~(1-e^{-kn/m})^k false-positive sliver) pay the exchange. A
# final in-bucket exact membership check removes the false positives,
# so the result is hash-exact vs the EXISTS oracle — the Bloom stage
# only cuts shuffled volume, never changes semantics.

BLOOM_M_BITS = 1 << 20          # 128 KiB bitmap (power of two)
BLOOM_K = 4                     # hash probes per key
BLOOM_PRIORITY = "1-URGENT"


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """(BLOOM_K, n) bit positions via double hashing h1 + i·h2 —
    the standard Kirsch–Mitzenmacher construction; h2 forced odd so
    the probe stride never degenerates."""
    from .sketches import _hash64

    ku = keys.astype(np.int64).astype(np.uint64)
    h1 = _hash64(ku)
    h2 = _hash64(ku ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(BLOOM_K, dtype=np.uint64)[:, None]
    return ((h1[None, :] + i * h2[None, :])
            % np.uint64(BLOOM_M_BITS)).astype(np.uint64)


def _bloom_test(words: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: AND of the K bit tests."""
    if not len(keys):
        return np.zeros(0, bool)
    pos = _bloom_positions(keys)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return (bits == 1).all(axis=0)


def bloom_semi_join_lineitem_urgent(sf_dir: str):
    """lineitem ⋉ σ(orders.priority = URGENT) (SEMI join on orderkey)
    → per-returnflag item count + revenue cents of lineitems whose
    order is urgent.

    Phase 1 (build): urgent orderkeys → per-batch Bloom bitmaps →
    OR-reduce → ray.put once. Phase 2 (probe): lineitem batches are
    Bloom-prefiltered, then pre-aggregated to (okey, flag) partials
    and bucket-shuffled WITH the distinct build keys; the in-bucket
    ``np.isin`` semi filter discards Bloom false positives exactly.
    Final groupby over ≤ |flags| × buckets partial rows."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .entity_merge import _pin
    from .groupkit import int_group_sums

    # lineage-pinned: the build side feeds TWO consumers (the bitmap
    # pass and the union's exact-verify rows) — without the pin the
    # filtered orders scan would execute twice (entity_merge._pin)
    urgent = _pin(rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=pads.field("o_orderpriority") == BLOOM_PRIORITY,
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True))

    def batch_bitmap(batch: pa.Table) -> pa.Table:
        words = np.zeros(BLOOM_M_BITS // 64, np.uint64)
        keys = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        pos = _bloom_positions(np.unique(keys)).ravel()
        np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"words": pa.array([words.tobytes()],
                                           pa.large_binary())})

    # driver-side OR over one fixed-size bitmap PER BLOCK (bounded by
    # block count, independent of key cardinality)
    words = np.zeros(BLOOM_M_BITS // 64, np.uint64)
    for b in urgent.map_batches(
            batch_bitmap, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for buf in b["words"]:
            words |= np.frombuffer(buf.as_py(), np.uint64)
    bloom_ref = ray.put(words)

    def build_rows(batch: pa.Table) -> pa.Table:
        keys = np.unique(
            batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        n = len(keys)
        return pa.table({
            "key": pa.array(keys),
            "flag": pa.array([""] * n, pa.string()),
            "n": pa.array(np.zeros(n, np.int64)),
            "cents": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def probe_partials(batch: pa.Table) -> pa.Table:
        w = ray.get(bloom_ref)
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _bloom_test(w, keys)            # the volume cut
        t = batch.filter(pa.array(m))
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = revenue_cents(price, disc)
        flag = t["l_returnflag"].to_numpy(zero_copy_only=False)
        # integer-fused (okey, flag) group key: factorize the tiny
        # flag domain, combine — no per-row string building
        _, fcodes = np.unique(flag, return_inverse=True)
        nf = int(fcodes.max()) + 1 if len(fcodes) else 1
        uniq, first, codes = np.unique(
            ok * nf + fcodes, return_index=True, return_inverse=True)
        return pa.table({
            "key": pa.array(ok[first]),
            "flag": pa.array(flag[first], pa.string()),
            "n": pa.array(np.bincount(codes, minlength=len(uniq))
                          .astype(np.int64)),
            "cents": pa.array(int_group_sums(codes, cents, len(uniq))),
            "side": pa.array(np.ones(len(uniq), np.int8)),
        })

    probe = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True) \
        .map_batches(probe_partials, batch_format="pyarrow")

    both = urgent.map_batches(build_rows, batch_format="pyarrow") \
        .union(probe) \
        .map_batches(_bucketize("key"), batch_format="pyarrow")

    def semi_bucket(g) -> pa.Table:
        side = g["side"].to_numpy()
        keys = g["key"].to_numpy(np.int64)
        is_p = side == 1
        # exact verify: drop the Bloom false positives
        hit = np.isin(keys[is_p], keys[~is_p])
        flag = g["flag"].to_numpy()[is_p][hit]
        n = g["n"].to_numpy(np.int64)[is_p][hit]
        cents = g["cents"].to_numpy(np.int64)[is_p][hit]
        uniq, codes = np.unique(flag, return_inverse=True)
        return pa.table({
            "returnflag": pa.array(uniq.astype(str), pa.string()),
            "n": pa.array(int_group_sums(codes, n, len(uniq))),
            "cents": pa.array(int_group_sums(codes, cents, len(uniq))),
        })

    return both.groupby("bucket").map_groups(
        semi_bucket, batch_format="pandas") \
        .groupby("returnflag").aggregate(
            Sum("n", alias_name="n_items"),
            Sum("cents", alias_name="rev_cents"))


BLOOM_SEMI_JOIN_SQL = f"""
SELECT l.l_returnflag AS returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT)
           AS rev_cents
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '{BLOOM_PRIORITY}')
GROUP BY l.l_returnflag
"""


def topk_docs_by_tokens(sf_dir: str, k: int = 20):
    """Top-k documents by token count (ties broken by doc_id).

    Per-batch PARTIAL top-k (each batch keeps only its local best k), so
    the final global ``sort().limit(k)`` runs over ≤ k·n_blocks rows —
    a tiny exchange — instead of an all-to-all over the whole corpus."""
    import ray.data as rd

    from .text import text_stats_batch

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"]
                           ).map_batches(_strip_meta,
                                         batch_format="pyarrow",
                                         zero_copy_batch=True)
    stats = docs.map_batches(text_stats_batch, batch_format="pyarrow",
                             batch_size=8192) \
        .select_columns(["doc_id", "n_tokens"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        nt = batch["n_tokens"].to_numpy(zero_copy_only=False).astype(
            "int64")
        did = batch["doc_id"].to_numpy(zero_copy_only=False).astype(
            "int64")
        # lexsort: primary -n_tokens (desc), secondary doc_id (asc)
        order = np.lexsort((did, -nt))[:k]
        return pa.table({
            "doc_id": pa.array(did[order]),
            "n_tokens": pa.array(nt[order]),
            "neg_tokens": pa.array(-nt[order]),
        })

    return stats.map_batches(partial_topk, batch_format="pyarrow") \
        .sort(["neg_tokens", "doc_id"]) \
        .limit(k) \
        .select_columns(["doc_id", "n_tokens"])


TOPK_DOCS_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT)
           AS n_tokens
FROM documents
ORDER BY n_tokens DESC, doc_id
LIMIT 20
"""


# --- as-of / range joins (time-series operators Ray Data lacks;
# composition: coarse user-hash shard shuffle + vectorized pandas
# kernels per shard — SURVEY.md §2.4 custom-operator row) ---

ASOF_SHARDS = 64


def _split_events(sf_dir: str, left_type: str, right_type: str):
    """events → tagged (side P/C) rows bucketed by user hash: ONE read,
    one uniform shuffle key; the fine per-user structure is handled
    vectorized inside each shard."""
    import ray.data as rd

    events = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"]
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        mask = pc.is_in(batch["event_type"],
                        value_set=pa.array([left_type, right_type]))
        t = batch.filter(mask)
        side = pc.if_else(pc.equal(t["event_type"], left_type),
                          pa.scalar("P"), pa.scalar("C"))
        users = t["user_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": t["event_id"],
            "ts": t["ts"],
            "user_id": t["user_id"],
            "side": side,
            "bucket": pa.array((users % ASOF_SHARDS).astype("int32")),
        })

    return events.map_batches(prep, batch_format="pyarrow")


def asof_join_clicks_before_purchases(sf_dir: str):
    """For each 'purchase' event: the same user's most recent 'click'
    at-or-before it (INNER as-of, backward direction). Per shard, a
    single sorted ``pd.merge_asof(by=user_id)`` resolves every user's
    searches vectorized. Output emits only the matched TIMESTAMP (not
    row identity), so equal-ts ties are deterministic."""
    import pandas as pd

    both = _split_events(sf_dir, "purchase", "click")

    def per_bucket(g: pd.DataFrame):
        p = g[g["side"] == "P"][["event_id", "user_id", "ts"]]
        c = g[g["side"] == "C"][["user_id", "ts"]].copy()
        if p.empty or c.empty:
            # derive the empty schema from the INPUT dtypes — a
            # hardcoded timestamp unit would mix block schemas when the
            # source parquet stores a different unit (e.g. ns)
            m = p.iloc[0:0].copy()
            m["last_click_ts"] = m["ts"]
        else:
            c["last_click_ts"] = c["ts"]
            m = pd.merge_asof(
                p.sort_values("ts"), c.sort_values("ts"),
                on="ts", by="user_id", direction="backward")
            m = m.dropna(subset=["last_click_ts"])   # inner as-of
        return pa.table({
            "event_id": pa.array(m["event_id"].astype("int64")),
            "user_id": pa.array(m["user_id"].astype("int64")),
            "ts": pa.array(m["ts"]),
            "last_click_ts": pa.array(m["last_click_ts"]),
        })

    return both.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pandas")


ASOF_JOIN_SQL = """
SELECT CAST(a.event_id AS BIGINT) AS event_id,
       CAST(a.user_id AS BIGINT) AS user_id,
       a.ts AS ts, b.ts AS last_click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id AND a.ts >= b.ts
"""


def range_join_clicks_within_hour(sf_dir: str):
    """For each 'purchase': how many of the user's 'click' events fall
    in the hour ending at the purchase (a bounded interval/range join).
    Per shard: pandas inner merge on user (pairs bounded by per-user
    activity), vectorized interval filter, count, zero-fill."""
    import numpy as np
    import pandas as pd

    both = _split_events(sf_dir, "purchase", "click")

    def per_bucket(g: pd.DataFrame):
        p = g[g["side"] == "P"][["event_id", "user_id", "ts"]]
        c = g[g["side"] == "C"][["user_id", "ts"]].rename(
            columns={"ts": "click_ts"})
        if p.empty:
            return pa.table({
                "event_id": pa.array([], pa.int64()),
                "n_recent_clicks": pa.array([], pa.int64()),
            })
        m = p.merge(c, on="user_id", how="left")
        lo = m["ts"] - pd.Timedelta(hours=1)
        inside = (m["click_ts"] > lo) & (m["click_ts"] <= m["ts"])
        counts = inside.groupby(m["event_id"]).sum()
        out = p[["event_id"]].drop_duplicates().copy()
        out["n_recent_clicks"] = out["event_id"].map(counts).fillna(0)
        return pa.table({
            "event_id": pa.array(out["event_id"].astype("int64")),
            "n_recent_clicks": pa.array(
                out["n_recent_clicks"].astype("int64")),
        })

    return both.groupby("bucket").map_groups(per_bucket,
                                             batch_format="pandas")


RANGE_JOIN_SQL = """
SELECT CAST(a.event_id AS BIGINT) AS event_id,
       CAST(count(b.user_id) AS BIGINT) AS n_recent_clicks
FROM (SELECT * FROM events WHERE event_type = 'purchase') a
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
  ON a.user_id = b.user_id
 AND b.ts > a.ts - INTERVAL 1 HOUR AND b.ts <= a.ts
GROUP BY a.event_id
"""


def full_outer_join_clicks_purchases(sf_dir: str):
    """per-user click counts ⟗ per-user purchase counts (FULL OUTER
    join on user_id): users appear if they have EITHER side, with 0
    for the missing one — the outer-join class the left join's
    NULL-preserving branch doesn't cover (both sides optional).

    Same partitioned-hash shape as the left join, but ONE read of the
    events file covers both sides (the types interleave row-group-wise,
    so two filtered scans would each read everything — the
    _split_events one-read idiom): each batch ships per-(user, side)
    PARTIAL counts (shuffled volume = distinct users per batch), the
    in-bucket kernel re-reduces both sides with exact int64
    accumulation and takes the key UNION — no driver-side state, no
    row ever leaves its hash bucket."""
    import pandas as pd
    import pyarrow.compute as pc
    import ray.data as rd

    from .groupkit import int_group_sums, run_lengths, run_starts

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def prep(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(
            batch["event_type"],
            value_set=pa.array(["click", "purchase"])))
        keys = t["user_id"].to_numpy(zero_copy_only=False)
        is_c = pc.equal(t["event_type"], "click") \
            .to_numpy(zero_copy_only=False)
        out_key, out_cnt, out_side = [], [], []
        for tag, m in (("C", is_c), ("P", ~is_c)):
            uniq, counts = np.unique(keys[m], return_counts=True)
            out_key.append(uniq.astype(np.int64))
            out_cnt.append(counts.astype(np.int64))
            out_side.extend([tag] * len(uniq))
        return pa.table({
            "key": pa.array(np.concatenate(out_key)),
            "cnt": pa.array(np.concatenate(out_cnt)),
            "side": pa.array(out_side, pa.string()),
        })

    both = ds.map_batches(prep, batch_format="pyarrow") \
        .map_batches(_bucketize("key"), batch_format="pyarrow")

    def outer_bucket(g: pd.DataFrame) -> pa.Table:
        key = g["key"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        is_c = (g["side"] == "C").to_numpy()
        order = np.argsort(key, kind="stable")
        k, c, ic = key[order], cnt[order], is_c[order]
        starts = run_starts(k)
        codes = np.repeat(np.arange(len(starts)),
                          run_lengths(k, starts))
        n = len(starts)
        return pa.table({
            "user_id": pa.array(k[starts]),
            "n_clicks": pa.array(int_group_sums(codes[ic], c[ic], n)),
            "n_purchases": pa.array(
                int_group_sums(codes[~ic], c[~ic], n)),
        })

    return both.groupby("bucket").map_groups(
        outer_bucket, batch_format="pandas")


FULL_OUTER_JOIN_SQL = """
SELECT coalesce(c.user_id, p.user_id) AS user_id,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n_clicks,
       CAST(coalesce(p.n, 0) AS BIGINT) AS n_purchases
FROM (SELECT user_id, count(*) AS n FROM events
      WHERE event_type = 'click' GROUP BY user_id) c
FULL OUTER JOIN
     (SELECT user_id, count(*) AS n FROM events
      WHERE event_type = 'purchase' GROUP BY user_id) p
ON c.user_id = p.user_id
"""


# --- TPC-H-Q3-shaped 3-table join (broadcast + bucketed + top-k) ---
# The composition showcase: a small filtered dimension BROADCAST
# (segment customers — ray.put once, np.isin per batch), two
# read-pruned fact scans (order-date and ship-date filters pushed to
# the parquet reads), one bucketed hash join on the shared orderkey
# with per-batch partial revenue aggregation on the lineitem side,
# and a partial-top-k global sort (the topk_docs pattern: each bucket
# keeps its best k, the final sort sees ≤ k·buckets rows). Revenue is
# exact integer cents per the repo contract.

Q3_SEGMENT = "BUILDING"
Q3_CUTOFF = "1998-06-01"
Q3_TOPK = 10
Q3_BUCKETS = 64


def shipping_priority(sf_dir: str, segment: str = Q3_SEGMENT,
                      cutoff: str = Q3_CUTOFF, k: int = Q3_TOPK):
    """customer ⋈ orders ⋈ lineitem → the ``k`` highest-revenue
    orders from ``segment`` customers placed before ``cutoff`` with
    lineitems still shipping after it (revenue = Σ exact cents of
    extendedprice·(1−discount); ties by orderkey)."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from .groupkit import (
        int_group_sums,
        run_starts,
        sorted_lookup,
    )

    cut = np.datetime64(cutoff).astype("datetime64[us]")

    from ..rayutil import read_small_pandas

    cust = read_small_pandas(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"],
        filter=pads.field("c_mktsegment") == segment)
    keys_ref = ray.put(np.sort(cust["c_custkey"].to_numpy(np.int64)))

    def order_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keys = ray.get(keys_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
        m = np.isin(ck, keys)
        t = batch.filter(pa.array(m))
        from .sketches import _hash64
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "okey": pa.array(ok),
            "odate": pc.strftime(t["o_orderdate"],
                                 format="%Y-%m-%d"),
            "rev": pa.array(np.zeros(len(ok), np.int64)),
            "side": pa.array(np.zeros(len(ok), np.int8)),
            "bucket": pa.array((_hash64(ok) % np.uint64(Q3_BUCKETS))
                               .astype(np.int32)),
        })

    def lineitem_partials(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(
            zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = revenue_cents(price, disc)
        from .sketches import _hash64
        uniq, codes = np.unique(ok, return_inverse=True)
        rev = int_group_sums(codes, cents, len(uniq))
        n = len(uniq)
        return pa.table({
            "okey": pa.array(uniq),
            "odate": pa.array([""] * n, pa.string()),
            "rev": pa.array(rev),
            "side": pa.array(np.ones(n, np.int8)),
            "bucket": pa.array((_hash64(uniq) % np.uint64(Q3_BUCKETS))
                               .astype(np.int32)),
        })

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") < pads.scalar(cut),
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True) \
        .map_batches(order_rows, batch_format="pyarrow")

    items = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > pads.scalar(cut),
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True) \
        .map_batches(lineitem_partials, batch_format="pyarrow")

    def join_topk_in_bucket(g, _k=k) -> pa.Table:
        is_l = (g["side"] == 1).to_numpy()
        lk = g["okey"].to_numpy()[is_l].astype(np.int64)
        lr = g["rev"].to_numpy()[is_l].astype(np.int64)
        order = np.argsort(lk, kind="stable")
        lk, lr = lk[order], lr[order]
        starts = run_starts(lk)
        codes = np.repeat(np.arange(len(starts)),
                          np.diff(np.append(starts, len(lk))))
        rev = int_group_sums(codes, lr, len(starts))
        ukeys = lk[starts]
        ok = g["okey"].to_numpy()[~is_l].astype(np.int64)
        od = g["odate"].to_numpy()[~is_l]
        hit, idx = sorted_lookup(ukeys, ok)
        ok, od = ok[hit], od[hit]
        r = rev[idx[hit]]
        top = np.lexsort((ok, -r))[:_k]
        return pa.table({
            "o_orderkey": pa.array(ok[top]),
            "o_orderdate": pa.array(od[top], pa.string()),
            "revenue_c": pa.array(r[top]),
        })

    return orders.union(items).groupby("bucket").map_groups(
        join_topk_in_bucket, batch_format="pandas") \
        .sort(["revenue_c", "o_orderkey"],
              descending=[True, False]).limit(k)


SHIPPING_PRIORITY_SQL = f"""
SELECT CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT)
           AS revenue_c
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{Q3_CUTOFF} 00:00:00'
  AND l.l_shipdate > TIMESTAMP '{Q3_CUTOFF} 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue_c DESC, o_orderkey
LIMIT {Q3_TOPK}
"""


# --- salted hot-key join (the skew-handling join variant) ---
# A plain partitioned hash join sends ALL rows of one join key to one
# bucket — a single hot key (one viral order, one bot user) can make
# one task as large as the rest of the job. The salted variant splits
# every probe key's rows across SALT_R sub-buckets (salt = a
# secondary hash of the ROW, not the key) and replicates each build
# row into all R sub-buckets, so a hot key's probe volume spreads
# evenly at the cost of R× the (small) build side — the standard
# skew-join trade. Semantics are identical to the unsalted join
# (every probe row still meets its build row exactly once), so the
# oracle is the plain INNER-join SQL.

SALT_R = 8


def salted_skew_join_lineitem_orders(sf_dir: str):
    """lineitem ⋈ orders on orderkey with SALTED buckets → item count
    + revenue cents per order STATUS. Probe rows salt by
    splitmix64(linenumber-fused row key); build rows replicate R×."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .groupkit import int_group_sums, sorted_lookup
    from .sketches import _hash64

    def li_prep(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        ln = batch["l_linenumber"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = batch["l_discount"].to_numpy(zero_copy_only=False)
        cents = revenue_cents(price, disc)
        # salt from the ROW identity (orderkey, linenumber) — NOT the
        # join key — so a hot key's rows spread across R sub-buckets
        salt = (_hash64(ok * np.int64(8) + ln)
                % np.uint64(SALT_R)).astype(np.int64)
        kb = (_hash64(ok) % np.uint64(NUM_BUCKETS)).astype(np.int64)
        return pa.table({
            "key": pa.array(ok),
            "cents": pa.array(cents),
            "status": pa.array([""] * len(ok), pa.string()),
            "side": pa.array(np.ones(len(ok), np.int8)),
            "bucket": pa.array((kb * SALT_R + salt).astype(np.int32)),
        })

    def o_prep(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        status = batch["o_orderstatus"].to_numpy(zero_copy_only=False)
        kb = (_hash64(ok) % np.uint64(NUM_BUCKETS)).astype(np.int64)
        n = len(ok)
        # replicate each build row into all R sub-buckets
        rep_ok = np.repeat(ok, SALT_R)
        rep_st = np.repeat(status, SALT_R)
        rep_b = (np.repeat(kb, SALT_R) * SALT_R
                 + np.tile(np.arange(SALT_R, dtype=np.int64), n))
        return pa.table({
            "key": pa.array(rep_ok),
            "cents": pa.array(np.zeros(n * SALT_R, np.int64)),
            "status": pa.array(rep_st, pa.string()),
            "side": pa.array(np.zeros(n * SALT_R, np.int8)),
            "bucket": pa.array(rep_b.astype(np.int32)),
        })

    lineitem = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice",
                 "l_discount"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True) \
        .map_batches(li_prep, batch_format="pyarrow")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True) \
        .map_batches(o_prep, batch_format="pyarrow")

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        is_l = (g["side"] == 1).to_numpy()
        lk = g["key"].to_numpy(np.int64)[is_l]
        lc = g["cents"].to_numpy(np.int64)[is_l]
        ok = g["key"].to_numpy(np.int64)[~is_l]
        st = g["status"].to_numpy()[~is_l]
        order = np.argsort(ok, kind="stable")
        ok, st = ok[order], st[order]
        hit, idx = sorted_lookup(ok, lk)
        sts = st[idx[hit]]
        cents = lc[hit]
        uniq, codes = np.unique(sts, return_inverse=True)
        n = len(uniq)
        return pa.table({
            "status": pa.array(uniq.astype(str), pa.string()),
            "n": pa.array(np.bincount(codes, minlength=n)
                          .astype(np.int64)),
            "cents": pa.array(int_group_sums(codes, cents, n)),
        })

    return lineitem.union(orders).groupby("bucket").map_groups(
        join_bucket, batch_format="pandas") \
        .groupby("status").aggregate(
            Sum("n", alias_name="n_items"),
            Sum("cents", alias_name="rev_cents"))


SALTED_JOIN_SQL = f"""
SELECT o.o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT)
           AS rev_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
"""


# --- adaptive join (size-based plan selection) ---
# The optimizer decision every engine makes per join: if the build
# side (after filter pushdown) fits a broadcast budget, ship it once
# via ray.put and join shuffle-free; otherwise fall back to the
# partitioned hash join. The count that drives the choice runs over
# the column-pruned, filter-pushed build read — cheap at any corpus
# size — and BOTH plans produce identical results (the pytest forces
# the bucketed path and asserts equality), so the plan choice is
# invisible to the caller and the oracle.

ADAPTIVE_PRIORITY = "2-HIGH"
ADAPTIVE_BROADCAST_MAX = 5_000_000     # build keys; ~80 MB of int64+tag


def adaptive_join_lineitem_high(sf_dir: str,
                                broadcast_max: int =
                                ADAPTIVE_BROADCAST_MAX):
    """lineitem ⋈ σ(orders.priority = HIGH) on orderkey → item count
    + revenue cents per order status, with the join strategy chosen
    by the measured build-side size."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .entity_merge import _pin
    from .groupkit import int_group_sums, sorted_lookup

    build = _pin(rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"],
        filter=pads.field("o_orderpriority") == ADAPTIVE_PRIORITY,
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True))
    n_build = build.count()

    probe = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(_strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)

    def status_partial(ok, cents, keys, st):
        """Shared inner-join + per-status partial kernel (both plans)."""
        hit, idx = sorted_lookup(keys, ok)
        sts = st[idx[hit]]
        cents = cents[hit]
        uniq, codes = np.unique(sts, return_inverse=True)
        n = len(uniq)
        return pa.table({
            "status": pa.array(uniq.astype(str), pa.string()),
            "n": pa.array(np.bincount(codes, minlength=n)
                          .astype(np.int64)),
            "cents": pa.array(int_group_sums(codes, cents, n)),
        })

    if n_build <= broadcast_max:
        # broadcast plan: sorted key + status arrays, shipped once
        bdf = build.to_pandas()
        keys = bdf["o_orderkey"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        ref = ray.put((keys[order],
                       bdf["o_orderstatus"].to_numpy(object)[order]))

        def bc_partial(batch: pa.Table) -> pa.Table:
            keys, st = ray.get(ref)
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cents = revenue_cents(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                batch["l_discount"].to_numpy(zero_copy_only=False))
            return status_partial(ok, cents, keys, st)

        partials = probe.map_batches(bc_partial,
                                     batch_format="pyarrow",
                                     batch_size=65536)
    else:
        # partitioned plan: tag sides, bucket on orderkey, join in
        # bucket — the large-build fallback
        def b_prep(batch: pa.Table) -> pa.Table:
            ok = batch["o_orderkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "key": pa.array(ok),
                "cents": pa.array(np.zeros(len(ok), np.int64)),
                "status": batch["o_orderstatus"],
                "side": pa.array(np.zeros(len(ok), np.int8)),
            })

        def p_prep(batch: pa.Table) -> pa.Table:
            ok = batch["l_orderkey"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            cents = revenue_cents(
                batch["l_extendedprice"].to_numpy(zero_copy_only=False),
                batch["l_discount"].to_numpy(zero_copy_only=False))
            return pa.table({
                "key": pa.array(ok),
                "cents": pa.array(cents),
                "status": pa.array([""] * len(ok), pa.string()),
                "side": pa.array(np.ones(len(ok), np.int8)),
            })

        both = build.map_batches(b_prep, batch_format="pyarrow") \
            .union(probe.map_batches(p_prep, batch_format="pyarrow")) \
            .map_batches(_bucketize("key"), batch_format="pyarrow")

        def join_bucket(g) -> pa.Table:
            is_p = (g["side"] == 1).to_numpy()
            bk = g["key"].to_numpy(np.int64)[~is_p]
            st = g["status"].to_numpy()[~is_p]
            order = np.argsort(bk, kind="stable")
            return status_partial(
                g["key"].to_numpy(np.int64)[is_p],
                g["cents"].to_numpy(np.int64)[is_p],
                bk[order], st[order])

        partials = both.groupby("bucket").map_groups(
            join_bucket, batch_format="pandas")

    return partials.groupby("status").aggregate(
        Sum("n", alias_name="n_items"),
        Sum("cents", alias_name="rev_cents"))


ADAPTIVE_JOIN_SQL = f"""
SELECT o.o_orderstatus AS status,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum({rev_cents_sql_expr('l')}) AS BIGINT)
           AS rev_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '{ADAPTIVE_PRIORITY}'
GROUP BY o.o_orderstatus
"""


def user_set_ops(sf_dir: str):
    """(user_id, relation): the INTERSECT / EXCEPT set-operator class
    over the distinct click-users and purchase-users — 'both' (the
    intersection), 'click_only', 'purchase_only' (the two set
    differences). A thin labeling pass over the FULL OUTER join's
    per-user counts (one read, one user-hash exchange — the set ops
    fall out of the outer join's key union for free)."""
    import pyarrow.compute as pc

    counts = full_outer_join_clicks_purchases(sf_dir)

    def label(batch: pa.Table) -> pa.Table:
        c = batch["n_clicks"].to_numpy(zero_copy_only=False)
        p = batch["n_purchases"].to_numpy(zero_copy_only=False)
        rel = np.where(c > 0,
                       np.where(p > 0, "both", "click_only"),
                       "purchase_only")
        return pa.table({
            "user_id": batch["user_id"],
            "relation": pa.array(rel, pa.string()),
        })

    return counts.map_batches(label, batch_format="pyarrow")


USER_SET_OPS_SQL = """
WITH c AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = 'click'),
p AS (SELECT DISTINCT user_id FROM events
      WHERE event_type = 'purchase')
SELECT CAST(user_id AS BIGINT) AS user_id, 'both' AS relation
FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
UNION ALL
SELECT CAST(user_id AS BIGINT), 'click_only'
FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)
UNION ALL
SELECT CAST(user_id AS BIGINT), 'purchase_only'
FROM (SELECT user_id FROM p EXCEPT SELECT user_id FROM c)
"""
