"""Integer PageRank over the knowledge graph — fixed-iteration link
analysis on the IRI→IRI edges of the quad table (rdf:type, hasTurn,
mentions, … — conversations, turns, entities and classes all become
nodes; literals are excluded).

Floating-point PageRank cannot be oracle-hashed (summation order), so
the contract is an INTEGER damped update whose every operation is
order-independent:

    deg(u)  = out-degree over DISTINCT edges
    s_0(v)  = PR_SCALE
    s_t+1(v) = PR_BASE + (85 · Σ_{u→v} (s_t(u) // deg(u))) // 100

(integer floor division; Σ of integers is order-free; dangling-node
mass is dropped, the standard simplification). PR_ITERS = 3 rounds.

Shape per iteration — the canonical bucketed-join pair, nothing
driver-side:

  A. edges ⋈ state on src (hash buckets): each bucket emits per-dst
     PARTIAL contribution sums.
  B. partials ∪ state on node (hash buckets): per-node total + the
     damped update; the state (node, deg, score) comes back out keyed
     for the next round.

The edge list is deduplicated once up front (per-batch np.unique, then
one (src, dst) groupby), and deg is attached to the state ONCE — the
static deg rides along instead of being re-joined every round.
Iterations are FIXED-COUNT (no convergence probe), so the plan is a
straight-line 6-shuffle pipeline, not a driver loop with lineage
growth (cf. stages/entity_merge.py for the convergence-probe variant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .entity_merge import _hashed_strings, _pin
from .groupkit import int_group_sums as _int_group_sums

PR_SCALE = 10 ** 9
PR_BASE = 15 * PR_SCALE // 100
PR_ITERS = 3
PR_BUCKETS = 64
PR_STATE_BLOCKS = 16       # constant state block count across rounds


def _bucket_of(keys: np.ndarray) -> pa.Array:
    """Bucket id per string key (shared siphash kernel,
    entity_merge._hashed_strings)."""
    h = _hashed_strings(list(keys))
    return pa.array((h % np.uint64(PR_BUCKETS)).astype(np.int32))


def _distinct_edges(quads):
    """quad table → globally distinct (src, dst) IRI→IRI edges.

    Global dedup via an edge-hash bucket groupby + in-bucket
    drop_duplicates — an int-key shuffle instead of Ray's sort-based
    multi-string-key groupby (~3× faster on IRI-sized strings)."""
    def edge_rows(batch: pa.Table) -> pa.Table:
        import pandas as pd

        t = batch.filter(pc.equal(batch["obj_kind"], "iri"))
        df = pd.DataFrame({
            "src": t["subj"].to_numpy(zero_copy_only=False),
            "dst": t["obj_value"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()           # per-batch partial dedup
        h = (pd.util.hash_array(df["src"].to_numpy(object))
             * np.uint64(1000003)
             ^ pd.util.hash_array(df["dst"].to_numpy(object)))
        return pa.table({
            "src": pa.array(df["src"], pa.string()),
            "dst": pa.array(df["dst"], pa.string()),
            "bucket": pa.array((h % PR_BUCKETS).astype(np.int32)),
        })

    def dedup_in_bucket(g) -> pa.Table:
        df = g[["src", "dst"]].drop_duplicates()
        return pa.table({
            "src": pa.array(df["src"], pa.string()),
            "dst": pa.array(df["dst"], pa.string()),
        })

    return quads.map_batches(edge_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(dedup_in_bucket,
                                      batch_format="pandas")


def _initial_state(edges):
    """(node, deg, score=PR_SCALE) for every node (src ∪ dst). One
    bucketed pass merges the three row kinds (src occurrence, dst
    occurrence, per-src degree) into the deduped state."""
    def node_sides(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        node = np.concatenate([src, dst])
        deg = np.concatenate([np.ones(len(src), dtype=np.int64),
                              np.zeros(len(dst), dtype=np.int64)])
        return pa.table({
            "node": pa.array(node, pa.string()),
            "deg": pa.array(deg),
            "bucket": _bucket_of(node),
        })

    def state_in_bucket(g) -> pa.Table:
        nodes = g["node"].to_numpy()
        deg = g["deg"].to_numpy().astype(np.int64)
        uniq, codes = np.unique(nodes, return_inverse=True)
        total = _int_group_sums(codes, deg, len(uniq))
        return pa.table({
            "node": pa.array(uniq, pa.string()),
            "deg": pa.array(total),
            "score": pa.array(np.full(len(uniq), PR_SCALE, np.int64)),
        })

    return edges.map_batches(node_sides, batch_format="pyarrow") \
        .groupby("bucket").map_groups(state_in_bucket,
                                      batch_format="pandas")


def _tagged_edges(edges):
    """Round-invariant E-side rows (key=src, dst, sc=0, bucket) — built
    and pinned ONCE before the loop; every round re-unions the same
    executed blocks instead of re-hashing every src IRI."""
    def e_rows(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key": batch["src"],
            "dst": batch["dst"],
            "sc": pa.array(np.zeros(len(src), np.int64)),
            "bucket": _bucket_of(src),
        })

    return edges.map_batches(e_rows, batch_format="pyarrow")


def _one_iteration(tagged_e, state):
    """state (node, deg, score) → next state. Two bucketed shuffles.
    Sides share one schema and are told apart by sentinels: E rows have
    a non-null dst; S rows carry dst=NULL (shuffle 1) / partials carry
    deg=-1 (shuffle 2) — no per-row side strings in the exchanges."""
    def s_rows(batch: pa.Table) -> pa.Table:
        deg = batch["deg"].to_numpy(zero_copy_only=False)
        score = batch["score"].to_numpy(zero_copy_only=False)
        keep = deg > 0                      # sinks contribute nothing
        node = batch["node"].to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "key": pa.array(node, pa.string()),
            "dst": pa.array([None] * len(node), pa.string()),
            "sc": pa.array(score[keep] // deg[keep], pa.int64()),
            "bucket": _bucket_of(node),
        })

    def contrib_in_bucket(g) -> pa.Table:
        is_e = g["dst"].notna()
        e = g[is_e][["key", "dst"]]
        s = g[~is_e][["key", "sc"]]
        merged = e.merge(s, on="key")
        if not len(merged):
            return pa.table({"node": pa.array([], pa.string()),
                             "part": pa.array([], pa.int64())})
        dst = merged["dst"].to_numpy()
        sc = merged["sc"].to_numpy().astype(np.int64)
        uniq, codes = np.unique(dst, return_inverse=True)
        part = _int_group_sums(codes, sc, len(uniq))
        return pa.table({"node": pa.array(uniq, pa.string()),
                         "part": pa.array(part)})

    contribs = tagged_e \
        .union(state.map_batches(s_rows, batch_format="pyarrow")) \
        .groupby("bucket").map_groups(contrib_in_bucket,
                                      batch_format="pandas")

    def p_rows(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch["node"],
            "part": batch["part"],
            "deg": pa.array(np.full(len(node), -1, np.int64)),
            "bucket": _bucket_of(node),
        })

    def st_rows(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch["node"],
            "part": pa.array(np.zeros(len(node), np.int64)),
            "deg": batch["deg"],
            "bucket": _bucket_of(node),
        })

    def update_in_bucket(g) -> pa.Table:
        nodes = g["node"].to_numpy()
        part = g["part"].to_numpy().astype(np.int64)
        deg = g["deg"].to_numpy().astype(np.int64)
        uniq, codes = np.unique(nodes, return_inverse=True)
        insum = _int_group_sums(codes, part, len(uniq))
        # deg row is -1 on partials; max recovers the state's deg
        dmax = np.full(len(uniq), -1, np.int64)
        np.maximum.at(dmax, codes, deg)
        # nodes present only via partials (never in state) cannot
        # happen: every dst is a node — but guard anyway
        keep = dmax >= 0
        score = PR_BASE + (85 * insum[keep]) // 100
        return pa.table({
            "node": pa.array(uniq[keep], pa.string()),
            "deg": pa.array(dmax[keep]),
            "score": pa.array(score, pa.int64()),
        })

    # repartition to a CONSTANT block count: union concatenates block
    # lists and groupby partitions by input blocks, so without this the
    # state's block count (and per-round task count) grows every round
    return contribs.map_batches(p_rows, batch_format="pyarrow") \
        .union(state.map_batches(st_rows, batch_format="pyarrow")) \
        .groupby("bucket").map_groups(update_in_bucket,
                                      batch_format="pandas") \
        .repartition(PR_STATE_BLOCKS)


def pagerank_quads(quads):
    """quad table → (node, pagerank): PR_ITERS rounds of the integer
    damped update over the distinct IRI→IRI edge graph.

    The tagged edge rows are consumed once per round and ``state``
    feeds its own next round, so both get a HARD LINEAGE CUT
    (entity_merge._pin) — without it every round re-executes the whole
    upstream quad build and the plan compounds (measured 134 s → 10.8 s
    at sf0.01 with pins + constant-block repartition, then 7.4 s with
    the edge tagging hoisted out of the loop)."""
    edges = _pin(_distinct_edges(quads))
    tagged_e = _pin(_tagged_edges(edges))
    state = _pin(_initial_state(edges))
    for _ in range(PR_ITERS):
        state = _pin(_one_iteration(tagged_e, state))

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"],
                         "pagerank": batch["score"]})

    return state.map_batches(final, batch_format="pyarrow")


def _pagerank_oracle_sql(quads_sql: str) -> str:
    """Chained-CTE mirror: s0 → (i1, s1) → … → (i_T, s_T)."""
    ctes = [f"""
WITH q AS ({quads_sql}),
e AS (SELECT DISTINCT subj AS src, obj_value AS dst
      FROM q WHERE obj_kind = 'iri'),
d AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY src),
n AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
s0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS score FROM n)"""]
    for t in range(1, PR_ITERS + 1):
        ctes.append(f"""
i{t} AS (SELECT e.dst AS node, sum(s{t - 1}.score // d.deg) AS insum
      FROM e JOIN d USING (src)
             JOIN s{t - 1} ON s{t - 1}.node = e.src
      GROUP BY e.dst),
s{t} AS (SELECT n.node,
             CAST({PR_BASE} + (85 * coalesce(i{t}.insum, 0)) // 100
                  AS BIGINT) AS score
      FROM n LEFT JOIN i{t} USING (node))""")
    return (",".join(ctes)
            + f"\nSELECT node, score AS pagerank FROM s{PR_ITERS}")
