"""Sequence packing — concatenate all documents in ``doc_id`` order and
chop the global token stream into fixed ``SEQ_LEN``-token windows (the
classic LLM-pretraining pack: no padding, documents cross sequence
boundaries).

The hard part at scale is the GLOBAL EXCLUSIVE PREFIX SUM of per-doc
token counts (each doc must know where its tokens start in the
corpus-wide stream) without a global sort or a corpus-sized driver
structure. Shape (a textbook two-phase distributed scan):

1. ``_bucket_offsets``: docs are ranged into ``doc_id // BUCKET_DOCS``
   buckets (monotone in doc_id, ≤ BUCKET_DOCS docs each). One
   map_batches pass emits per-batch (bucket, token-count) partials; a
   small groupby sums them; the driver cumsums the per-bucket totals
   into exclusive bucket base offsets. Driver state = one int per
   NON-EMPTY bucket (n_docs / BUCKET_DOCS entries — metadata-, not
   corpus-sized; a deeper hierarchy would shrink it further if ever
   needed), broadcast once via ``ray.put``.
2. ``bucket`` groupby → per-bucket kernel: sort the ≤ BUCKET_DOCS docs
   by doc_id, local exclusive cumsum + bucket base = each doc's global
   offset, then emit its sequence PIECES fully vectorized (same
   repeat/cumsum gather as text.chunk_docs_batch): piece of doc d in
   sequence s covers global tokens [max(s·L, off_d),
   min((s+1)·L, off_d + nt_d)).
3. ``shard = seq_id % PACK_SHARDS`` groupby: pieces of one sequence
   (possibly from different docs AND different buckets) co-locate; one
   lexsort (seq, pos) + run arithmetic + Arrow binary_join reassembles
   every sequence — no per-sequence Python.

Tokenization is the repo-wide contract ('\\S+' runs of lower(text),
stages/text._token_lists ≡ regexp_extract_all in SQL); the oracle
mirrors the pack with one window-function prefix sum + parallel unnest.
The final (and only incomplete) sequence is kept with its true
n_tokens < SEQ_LEN.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .groupkit import run_lengths, run_starts
from .text import _flat_tokens, _token_lists

SEQ_LEN = 128
PACK_BUCKET_DOCS = 4096     # doc_id-range width of one scan bucket
PACK_SHARDS = 64            # seq_id shards for the reassembly shuffle


def _bucket_token_sums(batch: pa.Table) -> pa.Table:
    """Per-batch (bucket, token-count) partials — the map side of the
    phase-1 scan. Token counting never materializes the token lists."""
    texts = pc.fill_null(batch["text"], "")
    nt = pc.count_substring_regex(texts, pattern=r"\S+") \
        .cast(pa.int64()).to_numpy(zero_copy_only=False)
    b = batch["doc_id"].to_numpy(zero_copy_only=False) // PACK_BUCKET_DOCS
    ub, inv = np.unique(b, return_inverse=True)
    sums = np.bincount(inv, weights=nt).astype(np.int64)
    return pa.table({"bucket": pa.array(ub.astype(np.int64)),
                     "nt": pa.array(sums)})


def _bucket_offsets(docs) -> dict[int, int]:
    """Exclusive global token offset of each non-empty bucket. The
    driver-side frame is bucket-count-sized (n_docs / PACK_BUCKET_DOCS
    rows), never corpus-sized."""
    from ray.data.aggregate import Sum

    agg = docs.map_batches(
        _bucket_token_sums, batch_format="pyarrow", batch_size=8192,
    ).groupby("bucket").aggregate(Sum("nt", alias_name="nt"))
    h = agg.to_pandas()
    if h.empty:        # zero-row corpus: the aggregate has no columns
        return {}
    h = h.sort_values("bucket")
    off = np.concatenate([[0], np.cumsum(h["nt"].to_numpy(np.int64))])
    return dict(zip(h["bucket"].astype(int), off[:-1].astype(int)))


def _empty_pieces() -> pa.Table:
    return pa.table({
        "seq_id": pa.array([], pa.int64()),
        "pos": pa.array([], pa.int64()),
        "n_piece": pa.array([], pa.int64()),
        "piece": pa.array([], pa.large_string()),
        "shard": pa.array([], pa.int64()),
    })


def pack_sequences(docs):
    """documents → (seq_id, n_tokens, seq_text): the corpus token
    stream in doc_id order packed into SEQ_LEN-token sequences."""
    import ray

    off_ref = ray.put(_bucket_offsets(docs))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "bucket", pa.array(ids // PACK_BUCKET_DOCS, pa.int64()))

    def bucket_pieces(g) -> pa.Table:
        import ray as _ray

        base = int(_ray.get(off_ref)[int(g["bucket"].iloc[0])])
        g = g.sort_values("doc_id")
        n = len(g)
        flat, parents = _flat_tokens(
            _token_lists(pa.array(g["text"], pa.large_string())))
        nt = np.bincount(parents, minlength=n).astype(np.int64)
        doc_start = np.concatenate([[0], np.cumsum(nt)])
        off = base + doc_start[:-1]               # global offset per doc
        first_seq = off // SEQ_LEN
        last_seq = (off + np.maximum(nt, 1) - 1) // SEQ_LEN
        n_pieces = np.where(nt > 0, last_seq - first_seq + 1, 0)
        total = int(n_pieces.sum())
        if total == 0:
            return _empty_pieces()
        p_doc = np.repeat(np.arange(n), n_pieces)
        firstp = np.concatenate([[0], np.cumsum(n_pieces)])[:-1]
        seq = first_seq[p_doc] + (np.arange(total)
                                  - np.repeat(firstp, n_pieces))
        gs = np.maximum(seq * SEQ_LEN, off[p_doc])
        ge = np.minimum((seq + 1) * SEQ_LEN, off[p_doc] + nt[p_doc])
        plen = ge - gs
        offs = np.concatenate([[0], np.cumsum(plen)]).astype(np.int64)
        tok_idx = (np.repeat(doc_start[:-1][p_doc] + (gs - off[p_doc]),
                             plen)
                   + np.arange(offs[-1]) - np.repeat(offs[:-1], plen))
        taken = pc.take(pa.array(flat, pa.large_string()),
                        pa.array(tok_idx))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), taken)
        return pa.table({
            "seq_id": pa.array(seq.astype(np.int64)),
            "pos": pa.array((gs - seq * SEQ_LEN).astype(np.int64)),
            "n_piece": pa.array(plen.astype(np.int64)),
            "piece": pc.binary_join(
                lists, pa.scalar(" ", pa.large_string())),
            "shard": pa.array((seq % PACK_SHARDS).astype(np.int64)),
        })

    def assemble(g) -> pa.Table:
        seqs = g["seq_id"].to_numpy().astype(np.int64)
        if not len(seqs):
            return pa.table({
                "seq_id": pa.array([], pa.int64()),
                "n_tokens": pa.array([], pa.int64()),
                "seq_text": pa.array([], pa.large_string()),
            })
        pos = g["pos"].to_numpy().astype(np.int64)
        npiece = g["n_piece"].to_numpy().astype(np.int64)
        pieces = g["piece"].to_numpy()
        order = np.lexsort((pos, seqs))
        seqs, npiece, pieces = seqs[order], npiece[order], pieces[order]
        starts = run_starts(seqs)
        lens = run_lengths(seqs, starts)
        offs = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()),
            pa.array(pieces, pa.large_string()))
        return pa.table({
            "seq_id": pa.array(seqs[starts], pa.int64()),
            "n_tokens": pa.array(
                np.add.reduceat(npiece, starts).astype(np.int64)),
            "seq_text": pc.binary_join(
                lists, pa.scalar(" ", pa.large_string())),
        })

    pieces = docs.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True,
    ).groupby("bucket").map_groups(bucket_pieces, batch_format="pandas")
    return pieces.groupby("shard").map_groups(
        assemble, batch_format="pandas")


PACK_SEQUENCES_SQL = rf"""
WITH l AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '\S+') AS toks
  FROM documents
), o AS (
  SELECT doc_id, toks, len(toks) AS nt,
         CAST(coalesce(sum(len(toks)) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS off
  FROM l
), e AS (
  SELECT off + unnest(generate_series(1, nt)) - 1 AS gp,
         unnest(toks) AS tok
  FROM o WHERE nt > 0
)
SELECT CAST(gp // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(tok, ' ' ORDER BY gp) AS seq_text
FROM e GROUP BY 1
"""
