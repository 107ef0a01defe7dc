"""Corpus-wide top-k bigram collocations — global adjacent-token-pair
counts with a deterministic total order (count desc, then words asc).

Shape (one hash shuffle, partial-aggregated, bounded final sort):

1. ``_bigram_counts_batch``: docs → (w1, w2, cnt) PARTIAL counts per
   batch, fully vectorized (one flatten, one np.unique over pair
   codes) — the combiner runs before any data moves, so the shuffle
   carries distinct-bigrams-per-batch rows, not one row per token.
2. bigram-hash bucket groupby: all partials of a bigram co-locate, so
   one in-bucket run-sum gives the exact global count; each bucket then
   emits only its local top-k (an exact superset of the bucket's
   contribution to the global top-k).
3. ``sort + limit`` over the BUCKETS × k surviving rows — a bounded
   input by construction, never the corpus vocabulary.

Tokenization is the repo-wide contract ('\\S+' runs of lower(text));
adjacency is within-document only. Ties at the k boundary are broken
by (w1, w2) ascending on both sides, so the selected set is exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .text import _flat_tokens, _token_lists

TOP_BIGRAMS_K = 50
BIGRAM_BUCKETS = 256


def _empty_counts() -> pa.Table:
    return pa.table({
        "w1": pa.array([], pa.string()),
        "w2": pa.array([], pa.string()),
        "cnt": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int32()),
    })


def _bigram_counts_batch(batch: pa.Table) -> pa.Table:
    flat, parents = _flat_tokens(_token_lists(batch["text"]))
    if len(flat) < 2:
        return _empty_counts()
    same = parents[1:] == parents[:-1]
    w1, w2 = flat[:-1][same], flat[1:][same]
    if not len(w1):
        return _empty_counts()
    uniq, codes = np.unique(np.concatenate([w1, w2]),
                            return_inverse=True)
    v = np.int64(len(uniq))
    pair = codes[:len(w1)].astype(np.int64) * v + codes[len(w1):]
    up, cnt = np.unique(pair, return_counts=True)
    uw1, uw2 = uniq[up // v], uniq[up % v]
    from .groupkit import pair_bucket_ids

    return pa.table({
        "w1": pa.array(uw1, pa.string()),
        "w2": pa.array(uw2, pa.string()),
        "cnt": pa.array(cnt.astype(np.int64)),
        "bucket": pa.array(pair_bucket_ids(uw1, uw2, BIGRAM_BUCKETS)),
    })


def _topk_in_bucket(k: int):
    """In-bucket kernel factory: exact totals (all partials of a
    bigram land in one bucket), then the bucket's local top-k — one
    lexsort, no per-pair Python. The cap uses the CALLER's k so any
    k is correct, not just the module default."""
    def fn(g) -> pa.Table:
        w1 = g["w1"].to_numpy()
        w2 = g["w2"].to_numpy()
        cnt = g["cnt"].to_numpy().astype(np.int64)
        order = np.lexsort((w2, w1))
        w1, w2, cnt = w1[order], w2[order], cnt[order]
        new = np.concatenate(
            [[True], (w1[1:] != w1[:-1]) | (w2[1:] != w2[:-1])])
        starts = np.flatnonzero(new)
        total = np.add.reduceat(cnt, starts)
        rw1, rw2 = w1[starts], w2[starts]
        top = np.lexsort((rw2, rw1, -total))[:k]
        return pa.table({
            "w1": pa.array(rw1[top], pa.string()),
            "w2": pa.array(rw2[top], pa.string()),
            "cnt": pa.array(total[top], pa.int64()),
        })
    return fn


def top_bigrams(docs, k: int = TOP_BIGRAMS_K):
    """documents → the k globally most frequent within-doc bigrams,
    (w1, w2, cnt), ordered by cnt desc then (w1, w2) asc."""
    parts = docs.map_batches(
        _bigram_counts_batch, batch_format="pyarrow", batch_size=4096)
    cands = parts.groupby("bucket").map_groups(
        _topk_in_bucket(k), batch_format="pandas")
    return cands.sort(["cnt", "w1", "w2"],
                      descending=[True, False, False]).limit(k)


TOP_BIGRAMS_SQL = rf"""
WITH l AS (
  SELECT regexp_extract_all(lower(coalesce(text, '')), '\S+') AS toks
  FROM documents
), b AS (
  SELECT unnest(list_slice(toks, 1, len(toks) - 1)) AS w1,
         unnest(list_slice(toks, 2, len(toks))) AS w2
  FROM l WHERE len(toks) >= 2
)
SELECT w1, w2, CAST(count(*) AS BIGINT) AS cnt
FROM b GROUP BY w1, w2
ORDER BY cnt DESC, w1, w2 LIMIT {TOP_BIGRAMS_K}
"""


# --- n-gram-overlap decontamination (shuffle semi-join variant) ---
# The GPT-3/PaLM-style check: a training doc is contaminated if it
# shares at least one token N-gram with any benchmark document.
# Complements stages/text.decontaminate (substring probes broadcast to
# every worker): here NOTHING is collected on the driver — benchmark
# grams and candidate grams meet in a gram-hash bucket shuffle and
# close with an in-bucket semi-join, so the probe set may be
# arbitrarily large. Benchmark membership reuses the deterministic
# id-rule of the substring variant (doc_id % BENCH_MOD == 0, id-capped).

DECON_N = 5                 # real pipelines use 13; the synthetic docs
                            # are ~60 tokens, so 5 keeps overlap real
DECON_GRAM_BUCKETS = 128
DECON_DOC_BUCKETS = 64


def _decon_bench_mask(ids: np.ndarray) -> np.ndarray:
    from .text import BENCH_ID_CAP, BENCH_MOD

    return (ids % BENCH_MOD == 0) & (ids < BENCH_ID_CAP)


def _empty_gram_rows() -> pa.Table:
    return pa.table({
        "gram": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "bench": pa.array([], pa.bool_()),
        "bucket": pa.array([], pa.int32()),
    })


def _window_spans(batch: pa.Table, n: int):
    """Shared preamble for the token-window operators: (doc_id, text)
    → (ids, flat token array, per-window doc index ``gp``, window
    count ``m``, within-one-doc mask ``same``), or None when no doc
    yields a window. ONE definition so the doc-boundary invariant
    (``parents`` non-decreasing ⇒ equal endpoints mean the whole
    window belongs to one doc) cannot drift between the string and
    hash paths."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, parents = _flat_tokens(_token_lists(batch["text"]))
    m = len(flat) - n + 1
    if m <= 0:
        return None
    same = parents[:m] == parents[n - 1:]
    gp = parents[:m][same]
    if not len(gp):
        return None
    return ids, flat, gp, m, same


def _distinct_doc_grams(batch: pa.Table, n: int):
    """(doc_id, text) → DISTINCT (gram, doc_id) pairs for token
    n-grams, fully vectorized (n-1 concat passes over the flattened
    token array). The whole doc lives in one row, so per-batch dedup
    is global dedup. Returns (grams, ids, hashes) numpy arrays."""
    import pandas as pd

    spans = _window_spans(batch, n)
    if spans is None:
        return None
    ids, flat, gp, m, same = spans
    uflat = np.asarray(flat, dtype=str)
    gram = uflat[:m][same]
    for j in range(1, n):
        gram = np.char.add(np.char.add(gram, " "), uflat[j:m + j][same])
    df = pd.DataFrame({"gram": gram,
                       "doc_id": ids[gp]}).drop_duplicates()
    grams = df["gram"].to_numpy(object)
    return grams, df["doc_id"].to_numpy(), pd.util.hash_array(grams)


def _doc_gram_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → one row per DISTINCT (doc, N-gram)."""
    out = _distinct_doc_grams(batch, DECON_N)
    if out is None:
        return _empty_gram_rows()
    grams, ids, h = out
    return pa.table({
        "gram": pa.array(grams, pa.string()),
        "doc_id": pa.array(ids, pa.int64()),
        "bench": pa.array(_decon_bench_mask(ids)),
        "bucket": pa.array((h % DECON_GRAM_BUCKETS).astype(np.int32)),
    })


def _gram_hits_in_bucket(g) -> pa.Table:
    """Per-bucket semi-join: candidate (doc, gram) rows that match any
    benchmark gram → per-doc partial shared-gram counts."""
    probe = g[g["bench"]][["gram"]].drop_duplicates()
    cand = g[~g["bench"]]
    if not len(probe) or not len(cand):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    m = cand.merge(probe, on="gram")
    uniq, counts = np.unique(m["doc_id"].to_numpy(np.int64),
                             return_counts=True)
    return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                     "n": pa.array(counts.astype(np.int64))})


def decontaminate_ngram(docs):
    """documents → (doc_id, is_benchmark, n_shared_grams, contaminated)
    with n_shared_grams = count of distinct token N-grams the doc
    shares with the benchmark gram set (0 for benchmark members)."""
    from .sketches import _hash64

    grams = docs.map_batches(_doc_gram_rows, batch_format="pyarrow",
                             batch_size=4096)
    hits = grams.groupby("bucket").map_groups(
        _gram_hits_in_bucket, batch_format="pandas")

    def _doc_keyed(batch: pa.Table, zero: bool) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n = np.zeros(len(ids), np.int64) if zero \
            else batch["n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "bucket": pa.array(
                (_hash64(ids.view(np.uint64))
                 % np.uint64(DECON_DOC_BUCKETS)).astype(np.int32)),
        })

    import functools

    zero_rows = docs.select_columns(["doc_id"]).map_batches(
        functools.partial(_doc_keyed, zero=True),
        batch_format="pyarrow")
    hit_rows = hits.map_batches(
        functools.partial(_doc_keyed, zero=False),
        batch_format="pyarrow")

    def finish(g) -> pa.Table:
        from .groupkit import int_group_sums

        ids = g["doc_id"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        uniq, codes = np.unique(ids, return_inverse=True)
        tot = int_group_sums(codes, n, len(uniq))
        bench = _decon_bench_mask(uniq)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "is_benchmark": pa.array(bench),
            "n_shared_grams": pa.array(tot),
            "contaminated": pa.array(~bench & (tot > 0)),
        })

    return zero_rows.union(hit_rows).groupby("bucket").map_groups(
        finish, batch_format="pandas")


def _decon_bench_sql(col: str = "doc_id") -> str:
    from .text import BENCH_ID_CAP, BENCH_MOD

    return f"({col} % {BENCH_MOD} = 0 AND {col} < {BENCH_ID_CAP})"


def _gram_list_sql(n: int) -> str:
    """DuckDB expression: token n-gram strings of a ``toks`` array."""
    slices = ",\n              ".join(
        f"list_slice(toks, {j + 1}, len(toks) - {n - 1 - j})"
        for j in range(n))
    concat = " || ' ' || ".join(f"x[{j + 1}]" for j in range(n))
    return (f"CASE WHEN len(toks) >= {n} THEN list_transform(\n"
            f"     list_zip({slices}),\n"
            f"     x -> {concat})\n"
            f"     ELSE CAST([] AS VARCHAR[]) END")


def _decon_gram_list_sql() -> str:
    return _gram_list_sql(DECON_N)


def decontaminate_ngram_sql() -> str:
    bench = _decon_bench_sql("doc_id")
    bench_g = _decon_bench_sql("g.doc_id")
    bench_d = _decon_bench_sql("d.doc_id")
    return rf"""
WITH l AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct({_decon_gram_list_sql()})) AS gram
  FROM l
), probe AS (
  SELECT DISTINCT gram FROM g WHERE {_decon_bench_sql("doc_id")}
), hits AS (
  SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n
  FROM g JOIN probe USING (gram)
  WHERE NOT {bench_g}
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       {bench_d} AS is_benchmark,
       coalesce(h.n, 0) AS n_shared_grams,
       (NOT {bench_d} AND coalesce(h.n, 0) > 0) AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
"""


# --- exact-substring dedup (shared K-token window, Lee et al. 2022) ---
# "Deduplicating Training Data Makes Language Models Better": a doc is
# a substring-duplicate if it shares one EXACT window of SUB_K
# consecutive tokens with an earlier (lower-id) doc. Unlike the
# MinHash/SimHash families there is no banding/recall step — candidate
# generation is exhaustive over windows. Window IDENTITY rides on a
# 64-bit chained token hash (round 5; previously the window strings
# themselves), so the direct SQL oracle is exact up to a 2^-64
# per-distinct-window-pair collision — the same negligible-collision
# contract as the gram-hash Jaccard verify in stages/dedup.py. When
# triaging an oracle divergence here, hash collision IS a (vanishingly
# unlikely) candidate cause.
#
# Shape (two hash shuffles, nothing driver-side):
#   1. docs → DISTINCT (window_hash, doc) rows, bucketed by the hash;
#      in-bucket: per window, first_doc = min(doc); each row collapses
#      to a per-doc PARTIAL min of first_doc.
#   2. partials ∪ per-doc identity rows (fmin = own id), bucketed by
#      hash(doc); in-bucket min ⇒ first_doc per doc; is_dup =
#      first_doc < doc_id.
# Window strings never materialize at all — both stages move only
# (int, int) rows.

SUB_K = 16                  # window width in tokens (real pipelines
                            # use ~50 BPE tokens; the synthetic docs
                            # are ~60 words, so 16 keeps overlap real)
SUB_GRAM_BUCKETS = 128
SUB_DOC_BUCKETS = 64


def _distinct_doc_window_hashes(batch: pa.Table, n: int):
    """(doc_id, text) → DISTINCT (window_hash, doc_id) pairs for
    n-token windows WITHOUT materializing the window strings: each
    token hashes once (siphash), windows chain-combine the token
    hashes with n vectorized splitmix passes. The substring-dedup
    consumer only needs window IDENTITY, so shipping 8-byte hashes
    instead of ~100-byte window strings cuts the exchange ~12× and
    replaces the n-1 np.char.add string-building passes. Two windows
    colliding in 64 bits could link two unrelated docs (2^-64 per
    distinct-window pair — the same negligible-collision contract as
    the gram-hash Jaccard verify in stages/dedup.py)."""
    import pandas as pd

    from .sketches import _hash64

    spans = _window_spans(batch, n)
    if spans is None:
        return None
    ids, flat, gp, m, same = spans
    th = pd.util.hash_array(np.asarray(flat, dtype=object))
    h = np.full(m, np.uint64(0x5B5D_5EED), np.uint64)
    for j in range(n):
        h = _hash64(h ^ th[j:m + j])
    uniq = np.unique(np.stack(
        [ids[gp], h[same].view(np.int64)], axis=1), axis=0)
    return uniq[:, 0], uniq[:, 1].view(np.uint64)


def _sub_window_rows(batch: pa.Table) -> pa.Table:
    out = _distinct_doc_window_hashes(batch, SUB_K)
    if out is None:
        return pa.table({
            "gram_h": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "bucket": pa.array([], pa.int32()),
        })
    ids, h = out
    return pa.table({
        "gram_h": pa.array(h.view(np.int64), pa.int64()),
        "doc_id": pa.array(ids, pa.int64()),
        "bucket": pa.array((h % SUB_GRAM_BUCKETS).astype(np.int32)),
    })


def _sub_fmin_in_bucket(g) -> pa.Table:
    """Per window: first_doc = min(doc); per doc: partial min of the
    first_docs of its windows (only when strictly smaller than the doc
    itself — equal contributes nothing)."""
    from .groupkit import run_starts

    grams = g["gram_h"].to_numpy().astype(np.int64)
    ids = g["doc_id"].to_numpy().astype(np.int64)
    order = np.lexsort((ids, grams))
    grams, ids = grams[order], ids[order]
    starts = run_starts(grams)
    lengths = np.diff(np.append(starts, len(grams)))
    # windows are sorted by (gram, doc): the run head IS the min doc
    fd = np.repeat(ids[starts], lengths)
    smaller = fd < ids
    if not smaller.any():
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "fmin": pa.array([], pa.int64())})
    doc, fdoc = ids[smaller], fd[smaller]
    uniq, codes = np.unique(doc, return_inverse=True)
    fmin = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(fmin, codes, fdoc)
    return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                     "fmin": pa.array(fmin, pa.int64())})


def dedup_substring(docs):
    """documents → (doc_id, first_doc, is_dup): first_doc = the
    smallest doc id sharing an exact SUB_K-token window (own id when
    none); is_dup = first_doc < doc_id."""
    from .sketches import _hash64

    partials = docs.map_batches(
        _sub_window_rows, batch_format="pyarrow", batch_size=4096) \
        .groupby("bucket").map_groups(_sub_fmin_in_bucket,
                                      batch_format="pandas")

    def _doc_keyed(batch: pa.Table, own: bool) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        fmin = ids if own \
            else batch["fmin"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "fmin": pa.array(fmin, pa.int64()),
            "bucket": pa.array(
                (_hash64(ids.view(np.uint64))
                 % np.uint64(SUB_DOC_BUCKETS)).astype(np.int32)),
        })

    import functools

    own_rows = docs.select_columns(["doc_id"]).map_batches(
        functools.partial(_doc_keyed, own=True), batch_format="pyarrow")
    par_rows = partials.map_batches(
        functools.partial(_doc_keyed, own=False),
        batch_format="pyarrow")

    def finish(g) -> pa.Table:
        ids = g["doc_id"].to_numpy(np.int64)
        fm = g["fmin"].to_numpy(np.int64)
        uniq, codes = np.unique(ids, return_inverse=True)
        first = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, codes, fm)
        return pa.table({
            "doc_id": pa.array(uniq, pa.int64()),
            "first_doc": pa.array(first, pa.int64()),
            "is_dup": pa.array(first < uniq),
        })

    return own_rows.union(par_rows).groupby("bucket").map_groups(
        finish, batch_format="pandas")


def dedup_substring_sql() -> str:
    return rf"""
WITH l AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS toks
  FROM documents
), w AS (
  SELECT doc_id,
         unnest(list_distinct({_gram_list_sql(SUB_K)})) AS win
  FROM l
), m AS (
  SELECT win, min(doc_id) AS fd FROM w GROUP BY win
), s AS (
  SELECT w.doc_id, min(m.fd) AS fmin
  FROM w JOIN m USING (win) GROUP BY w.doc_id
)
SELECT d.doc_id,
       CAST(least(coalesce(s.fmin, d.doc_id), d.doc_id) AS BIGINT)
           AS first_doc,
       (coalesce(s.fmin, d.doc_id) < d.doc_id) AS is_dup
FROM documents d LEFT JOIN s USING (doc_id)
"""
