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
    import pandas as pd

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
    h = (pd.util.hash_array(uw1.astype(object)) * np.uint64(1000003)
         ^ pd.util.hash_array(uw2.astype(object)))
    return pa.table({
        "w1": pa.array(uw1, pa.string()),
        "w2": pa.array(uw2, pa.string()),
        "cnt": pa.array(cnt.astype(np.int64)),
        "bucket": pa.array((h % BIGRAM_BUCKETS).astype(np.int32)),
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
