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
from .groupkit import pair_bucket_ids as _pair_bucket_ids

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
        return pa.table({
            "src": pa.array(df["src"], pa.string()),
            "dst": pa.array(df["dst"], pa.string()),
            "bucket": pa.array(_pair_bucket_ids(
                df["src"].to_numpy(object), df["dst"].to_numpy(object),
                PR_BUCKETS)),
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


# --- triangle counting (degree-oriented wedge join) ---
# Classic scalable triangle count (Cohen's MapReduce formulation /
# node-iterator++): orient every undirected edge from its lower-rank
# endpoint to its higher-rank endpoint, rank = (degree, node) — the
# out-degree of any node is then O(sqrt(2m)), so per-center wedge
# generation is bounded even on power-law graphs.  Each triangle is
# counted EXACTLY once: at its lowest-rank vertex.  Five bucketed
# shuffles (edge-pair dedup; node-keyed degree attach; pair-keyed
# orient; wedge generation; wedge-close join) plus the n_nodes count
# pass; nothing driver-side but three scalars.

TRI_BUCKETS = 64


def _undirected_edges(quads):
    """quad table → globally distinct undirected IRI–IRI edges
    (u < v by string order, self-loops dropped)."""
    def edge_rows(batch: pa.Table) -> pa.Table:
        import pandas as pd

        t = batch.filter(pc.equal(batch["obj_kind"], "iri"))
        # fixed-width unicode arrays: C-vectorized comparisons (object
        # arrays would fall back to per-row Python __lt__)
        s = np.asarray(t["subj"].to_pylist(), dtype=str)
        o = np.asarray(t["obj_value"].to_pylist(), dtype=str)
        keep = s != o
        s, o = s[keep], o[keep]
        lo = s < o
        u = np.where(lo, s, o)
        v = np.where(lo, o, s)
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        return pa.table({
            "u": pa.array(df["u"], pa.string()),
            "v": pa.array(df["v"], pa.string()),
            "bucket": pa.array(_pair_bucket_ids(
                df["u"].to_numpy(object), df["v"].to_numpy(object),
                TRI_BUCKETS)),
        })

    def dedup_in_bucket(g) -> pa.Table:
        df = g[["u", "v"]].drop_duplicates()
        return pa.table({
            "u": pa.array(df["u"], pa.string()),
            "v": pa.array(df["v"], pa.string()),
        })

    return quads.map_batches(edge_rows, batch_format="pyarrow") \
        .groupby("bucket").map_groups(dedup_in_bucket,
                                      batch_format="pandas")


def _tri_degrees(und):
    """undirected edges → (node, deg). Per-batch partial counts bound
    the shuffle at distinct-nodes-per-block rows."""
    def partial(batch: pa.Table) -> pa.Table:
        node = np.concatenate([
            batch["u"].to_numpy(zero_copy_only=False),
            batch["v"].to_numpy(zero_copy_only=False)])
        uniq, counts = np.unique(node, return_counts=True)
        return pa.table({
            "node": pa.array(uniq, pa.string()),
            "cnt": pa.array(counts.astype(np.int64)),
            "bucket": _bucket_of(uniq),
        })

    def total_in_bucket(g) -> pa.Table:
        nodes = g["node"].to_numpy()
        cnt = g["cnt"].to_numpy().astype(np.int64)
        uniq, codes = np.unique(nodes, return_inverse=True)
        return pa.table({
            "node": pa.array(uniq, pa.string()),
            "deg": pa.array(_int_group_sums(codes, cnt, len(uniq))),
        })

    return und.map_batches(partial, batch_format="pyarrow") \
        .groupby("bucket").map_groups(total_in_bucket,
                                      batch_format="pandas")


def _oriented_edges(und):
    """(u, v) → (a, b, db, bucket): each edge directed from its lower
    (deg, node) rank endpoint; db = deg(b) rides along so wedge
    generation can rank neighbors without another join.

    NO separate degree join: shuffle 1 routes BOTH endpoint-keyed
    copies of every edge to node buckets, where deg(n) is simply the
    number of rows keyed by n (every incident edge contributes exactly
    one); shuffle 2 reunites the two half-annotated copies of each
    edge by canonical pair and orients it. The emitted ``bucket``
    column is already the wedge key (hash of a)."""
    def both_ends(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        key = np.concatenate([u, v])
        other = np.concatenate([v, u])
        end = np.concatenate([np.zeros(len(u), np.int8),
                              np.ones(len(v), np.int8)])
        return pa.table({
            "key": pa.array(key, pa.string()),
            "other": pa.array(other, pa.string()),
            "end": pa.array(end),
            "bucket": _bucket_of(key),
        })

    def attach_deg(g) -> pa.Table:
        keys = g["key"].to_numpy()
        other = g["other"].to_numpy()
        end = g["end"].to_numpy()
        uniq, codes, counts = np.unique(keys, return_inverse=True,
                                        return_counts=True)
        d = counts[codes].astype(np.int64)
        # recover the canonical (u, v): end 0 rows are keyed by u
        is_u = end == 0
        u = np.where(is_u, keys, other)
        v = np.where(is_u, other, keys)
        return pa.table({
            "u": pa.array(u, pa.string()),
            "v": pa.array(v, pa.string()),
            "d": pa.array(d),
            "end": pa.array(end),
            "bucket": pa.array(_pair_bucket_ids(u, v, TRI_BUCKETS)),
        })

    halves = und.map_batches(both_ends, batch_format="pyarrow") \
        .groupby("bucket").map_groups(attach_deg, batch_format="pandas")

    def orient_in_bucket(g) -> pa.Table:
        if not len(g):
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "db": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32())})
        u = np.asarray(g["u"].to_numpy(object), dtype=str)
        v = np.asarray(g["v"].to_numpy(object), dtype=str)
        d = g["d"].to_numpy(np.int64)
        end = g["end"].to_numpy(np.int8)
        # exactly two rows per distinct edge (one per end): sort by
        # (u, v, end) and read them off pairwise
        order = np.lexsort((end, v, u))
        u, v, d = u[order], v[order], d[order]
        du, dv = d[0::2], d[1::2]
        u, v = u[0::2], v[0::2]
        u_low = (du < dv) | ((du == dv) & (u < v))
        a = np.where(u_low, u, v)
        b = np.where(u_low, v, u)
        return pa.table({
            "a": pa.array(a, pa.string()),
            "b": pa.array(b, pa.string()),
            "db": pa.array(np.where(u_low, dv, du).astype(np.int64)),
            "bucket": _bucket_of(a),
        })

    return halves.groupby("bucket").map_groups(orient_in_bucket,
                                               batch_format="pandas")


def _wedges(directed):
    """directed (a, b, db, bucket=hash(a)) → candidate wedges (x, y)
    with rank(x) < rank(y): all ordered out-neighbor pairs per center,
    vectorized via groupkit.run_pair_indices (out-degree is
    O(sqrt(2m)) under the degree orientation, bounding per-center
    work). The bucket column already carries the center key."""
    from .groupkit import run_pair_indices

    def wedges_in_bucket(g) -> pa.Table:
        a = g["a"].to_numpy()
        b = np.asarray(g["b"].to_numpy(object), dtype=str)
        db = g["db"].to_numpy(np.int64)
        order = np.lexsort((b, db, a))
        a_s, b_s = a[order], b[order]
        i_idx, j_idx = run_pair_indices(a_s)
        return pa.table({
            "x": pa.array(b_s[i_idx], pa.string()),
            "y": pa.array(b_s[j_idx], pa.string()),
        })

    return directed.groupby("bucket").map_groups(wedges_in_bucket,
                                                 batch_format="pandas")


def triangle_stats(quads):
    """quad table → 1-row pyarrow.Table (n_nodes, n_edges,
    n_triangles) over the undirected distinct IRI–IRI graph.

    Wedges close against the oriented edge set in a final bucketed
    hash join keyed by the fused (x, y) pair hash; only per-bucket
    match counts (scalars) leave the workers."""
    und = _pin(_undirected_edges(quads))
    directed = _pin(_oriented_edges(und))

    def pair_bucket(x, y) -> pa.Array:
        return pa.array(_pair_bucket_ids(x, y, TRI_BUCKETS))

    def wedge_rows(batch: pa.Table) -> pa.Table:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        return pa.table({
            "x": batch["x"], "y": batch["y"],
            "is_edge": pa.array(np.zeros(len(x), np.int8)),
            "bucket": pair_bucket(x, y),
        })

    def edge_rows(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "x": batch["a"], "y": batch["b"],
            "is_edge": pa.array(np.ones(len(a), np.int8)),
            "bucket": pair_bucket(a, b),
        })

    def close_in_bucket(g) -> pa.Table:
        e = g[g["is_edge"] == 1][["x", "y"]]
        w = g[g["is_edge"] == 0][["x", "y"]]
        n = len(w.merge(e, on=["x", "y"])) if len(e) and len(w) else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    closed = _wedges(directed).map_batches(wedge_rows,
                                           batch_format="pyarrow") \
        .union(directed.map_batches(edge_rows, batch_format="pyarrow")) \
        .groupby("bucket").map_groups(close_in_bucket,
                                      batch_format="pandas")

    n_tri = closed.sum("n") or 0
    return pa.table({
        "n_nodes": pa.array([_tri_degrees(und).count()], pa.int64()),
        "n_edges": pa.array([und.count()], pa.int64()),
        "n_triangles": pa.array([int(n_tri)], pa.int64()),
    })


def _triangle_oracle_sql(quads_sql: str) -> str:
    """3-way self-join oracle over the canonical u < v < w edges."""
    return f"""
WITH q AS ({quads_sql}),
e AS (SELECT DISTINCT least(subj, obj_value) AS u,
                      greatest(subj, obj_value) AS v
      FROM q WHERE obj_kind = 'iri' AND subj <> obj_value)
SELECT
  (SELECT count(*) FROM (SELECT u AS n FROM e UNION SELECT v FROM e))
      AS n_nodes,
  (SELECT count(*) FROM e) AS n_edges,
  (SELECT count(*)
   FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
             JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
"""


# --- connected components (R-round min-label propagation) ---
# The bounded-round sibling of PageRank: label(v) starts as v's own
# IRI and each round becomes min(label(v), min over neighbors' labels)
# — after R rounds every node carries the smallest IRI within R hops,
# which equals its component id once R reaches the component diameter.
# The R-round result is DETERMINISTIC whether or not propagation has
# converged, so the oracle is an exact chained-CTE mirror (no
# convergence probe, no driver state — cf. stages/entity_merge.py for
# the probe-based variant over the mention-similarity graph).

LP_ITERS = 4


def _sym_tagged(und):
    """Undirected edges → both directed copies, keyed for the
    contribution exchange (round-invariant; pinned once)."""
    def rows(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        key = np.concatenate([u, v])
        dst = np.concatenate([v, u])
        return pa.table({
            "key": pa.array(key, pa.string()),
            "dst": pa.array(dst, pa.string()),
            "lab": pa.array([None] * len(key), pa.string()),
            "bucket": _bucket_of(key),
        })

    return und.map_batches(rows, batch_format="pyarrow")


def _lp_initial(und):
    """(node, lab=node) for every edge endpoint."""
    def ends(batch: pa.Table) -> pa.Table:
        node = np.unique(np.concatenate([
            batch["u"].to_numpy(zero_copy_only=False),
            batch["v"].to_numpy(zero_copy_only=False)]))
        return pa.table({
            "node": pa.array(node, pa.string()),
            "lab": pa.array(node, pa.string()),
            "bucket": _bucket_of(node),
        })

    def dedup(g) -> pa.Table:
        nodes = np.unique(g["node"].to_numpy())
        return pa.table({"node": pa.array(nodes, pa.string()),
                         "lab": pa.array(nodes, pa.string())})

    return und.map_batches(ends, batch_format="pyarrow") \
        .groupby("bucket").map_groups(dedup, batch_format="pandas")


def _min_per_run(nodes: np.ndarray, labs: np.ndarray):
    """(unique node, min lab) via one lexsort + run starts."""
    from .groupkit import run_starts

    order = np.lexsort((labs, nodes))
    ns, ls = nodes[order], labs[order]
    starts = run_starts(ns)
    return ns[starts], ls[starts]


def _lp_round(sym, state):
    """One propagation round: two bucketed exchanges (neighbor-min
    partials keyed by receiver, then per-node min with the own
    label)."""
    def s_rows(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key": batch["node"],
            "dst": pa.array([None] * len(node), pa.string()),
            "lab": batch["lab"],
            "bucket": _bucket_of(node),
        })

    def contrib(g) -> pa.Table:
        is_e = g["dst"].notna()
        e = g[is_e][["key", "dst"]]
        s = g[~is_e][["key", "lab"]]
        m = e.merge(s, on="key")
        if not len(m):
            return pa.table({"node": pa.array([], pa.string()),
                             "lab": pa.array([], pa.string())})
        nodes, labs = _min_per_run(m["dst"].to_numpy(),
                                   m["lab"].to_numpy())
        return pa.table({"node": pa.array(nodes, pa.string()),
                         "lab": pa.array(labs, pa.string())})

    partials = sym.union(state.map_batches(s_rows,
                                           batch_format="pyarrow")) \
        .groupby("bucket").map_groups(contrib, batch_format="pandas")

    def keyed(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": batch["node"],
            "lab": batch["lab"],
            "bucket": _bucket_of(node),
        })

    def take_min(g) -> pa.Table:
        nodes, labs = _min_per_run(g["node"].to_numpy(),
                                   g["lab"].to_numpy())
        return pa.table({"node": pa.array(nodes, pa.string()),
                         "lab": pa.array(labs, pa.string())})

    # own labels ride along, so isolated-from-partials nodes survive
    # and new lab = min(own, neighbor mins)
    return partials.map_batches(keyed, batch_format="pyarrow") \
        .union(state.map_batches(keyed, batch_format="pyarrow")) \
        .groupby("bucket").map_groups(take_min, batch_format="pandas") \
        .repartition(PR_STATE_BLOCKS)


def components_quads(quads):
    """quad table → (node, component): component = min IRI within
    LP_ITERS hops over the undirected distinct IRI–IRI graph (equals
    the connected-component id wherever the component diameter is
    ≤ LP_ITERS). Same pin/constant-block discipline as pagerank."""
    und = _pin(_undirected_edges(quads))
    sym = _pin(_sym_tagged(und))
    state = _pin(_lp_initial(und))
    for _ in range(LP_ITERS):
        state = _pin(_lp_round(sym, state))

    def final(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch["node"],
                         "component": batch["lab"]})

    return state.map_batches(final, batch_format="pyarrow")


def _components_oracle_sql(quads_sql: str) -> str:
    """Chained-CTE mirror of LP_ITERS min-label rounds."""
    ctes = [f"""
WITH q AS ({quads_sql}),
e0 AS (SELECT DISTINCT least(subj, obj_value) AS u,
                       greatest(subj, obj_value) AS v
       FROM q WHERE obj_kind = 'iri' AND subj <> obj_value),
ed AS (SELECT u AS a, v AS b FROM e0 UNION ALL SELECT v, u FROM e0),
n AS (SELECT DISTINCT a AS node FROM ed),
s0 AS (SELECT node, node AS lab FROM n)"""]
    for t in range(1, LP_ITERS + 1):
        ctes.append(f"""
i{t} AS (SELECT ed.b AS node, min(s{t - 1}.lab) AS ml
      FROM ed JOIN s{t - 1} ON s{t - 1}.node = ed.a
      GROUP BY ed.b),
s{t} AS (SELECT s{t - 1}.node,
             least(s{t - 1}.lab, coalesce(i{t}.ml, s{t - 1}.lab))
                 AS lab
      FROM s{t - 1} LEFT JOIN i{t} USING (node))""")
    return (",".join(ctes)
            + f"\nSELECT node, lab AS component FROM s{LP_ITERS}")


# --- degree histogram (graph-shape diagnostic) ---

def degree_histogram(quads):
    """quad table → (deg, n_nodes): the undirected degree distribution
    of the IRI–IRI graph. Distinct degree VALUES are bounded by the
    max degree (not the corpus), so the final groupby is tiny; the
    node-degree table itself pre-reduces per batch."""
    deg = _tri_degrees(_undirected_edges(quads))

    def partial(batch: pa.Table) -> pa.Table:
        d = batch["deg"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(d, return_counts=True)
        return pa.table({
            "deg": pa.array(uniq.astype(np.int64)),
            "n": pa.array(counts.astype(np.int64)),
        })

    def total(g) -> pa.Table:
        return pa.table({
            "deg": pa.array([int(g["deg"].iloc[0])], pa.int64()),
            "n_nodes": pa.array([int(g["n"].sum())], pa.int64()),
        })

    return deg.map_batches(partial, batch_format="pyarrow") \
        .groupby("deg").map_groups(total, batch_format="pandas")


def _degree_hist_oracle_sql(quads_sql: str) -> str:
    return f"""
WITH q AS ({quads_sql}),
e AS (SELECT DISTINCT least(subj, obj_value) AS u,
                      greatest(subj, obj_value) AS v
      FROM q WHERE obj_kind = 'iri' AND subj <> obj_value),
d AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
      GROUP BY node)
SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes FROM d GROUP BY deg
"""
