"""Similarity search over the ``embeddings`` table (list<float> column).

- ``knn_brute``: exact cosine top-k. The query matrix is broadcast once
  (ray.put); every batch computes one numpy matmul and emits its LOCAL
  top-k per query (per-batch partial top-k — the pre-aggregation), then a
  single small groupby(query_id) merges partials into the global top-k.
  Rank output only (no float scores) so the DuckDB oracle can compare
  exactly.

- ``knn_lsh``: multi-table random-hyperplane LSH — ``LSH_TABLES``
  independent ``LSH_BITS``-bit signatures; a vector is a candidate for a
  query if ANY table buckets them together (own bucket + Hamming-1
  probes). Exact cosine rerank inside candidates. Table/bit counts trade
  recall for candidate volume: for a corpus of n vectors size bits ≈
  log2(n / wanted_bucket_size); the defaults are tuned for recall ≥ 0.9
  on unstructured data at test scale (measured against ``knn_brute`` in
  tests/test_training_data.py).

Neither path materializes the embeddings table on the driver: the query
rows are pulled through a distributed filter, everything else streams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..rayutil import embedding_batch as _embedding_batch

DEFAULT_K = 10
N_QUERIES = 5          # query set = vec_id < N_QUERIES (deterministic)
LSH_TABLES = 12
LSH_BITS = 4


def _query_matrix(embeddings, n_queries: int):
    """Pull ONLY the query rows to the driver (distributed filter first —
    never a full-table to_pandas)."""
    import pyarrow.compute as pc

    tbl = embeddings.map_batches(
        lambda t, _n=n_queries: t.filter(pc.less(t["vec_id"], _n)),
        batch_format="pyarrow").to_pandas()
    tbl = tbl.sort_values("vec_id")
    ids = tbl["vec_id"].astype(int).to_numpy()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                           1e-12)
    return ids, mat


class BruteTopK:
    """map_batches fn (plain function-style state via ray.put ref):
    emits per-batch partial top-k rows (query_id, vec_id, score)."""

    def __init__(self, ref, k: int) -> None:
        self.ref = ref
        self.k = k
        self._cache = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._cache is None:
            self._cache = ray.get(self.ref)
        q_ids, q_mat = self._cache

        vec_ids, vecs = _embedding_batch(batch)
        vecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sims = q_mat @ vecs.T                          # (Q, b)

        out_q: list[int] = []
        out_v: list[int] = []
        out_s: list[float] = []
        k = min(self.k, sims.shape[1])
        for qi, qid in enumerate(q_ids):
            row = sims[qi]
            # exclude self-match
            valid = vec_ids != qid
            idx = np.nonzero(valid)[0]
            if len(idx) == 0:
                continue
            top = idx[np.argsort(-row[idx], kind="stable")[:k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(int(vec_ids[i]) for i in top)
            out_s.extend(float(row[i]) for i in top)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def _merge_topk(g, k: int):
    """Per-query merge of partial candidates → ranked top-k (shared by
    brute and LSH variants; ties broken by vec_id like the oracle)."""
    import pandas as pd

    g = g.sort_values(["score", "vec_id"],
                      ascending=[False, True]).head(k)
    return pd.DataFrame({
        "query_id": g["query_id"].astype("int64"),
        "rank": np.arange(1, len(g) + 1, dtype="int64"),
        "vec_id": g["vec_id"].astype("int64"),
    })


def knn_brute(embeddings, k: int = DEFAULT_K, n_queries: int = N_QUERIES):
    """embeddings Dataset → (query_id, rank, vec_id) exact top-k."""
    import functools

    import ray

    ids_mat = _query_matrix(embeddings, n_queries)
    ref = ray.put(ids_mat)
    partial = embeddings.map_batches(
        BruteTopK(ref, k), batch_format="pyarrow", batch_size=4096)
    return partial.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pandas")


KNN_BRUTE_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.q_emb, e.embedding) AS score
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, vec_id) AS rank
  FROM scored
)
SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rank AS BIGINT) AS rank,
       CAST(vec_id AS BIGINT) AS vec_id
FROM ranked WHERE rank <= {DEFAULT_K}
"""


# --- multi-table LSH ---

def _hyperplanes(dim: int, tables: int = LSH_TABLES,
                 bits: int = LSH_BITS) -> np.ndarray:
    """(tables*bits, dim) fixed-seed gaussian planes — deterministic."""
    rng = np.random.RandomState(1234)
    return rng.standard_normal((tables * bits, dim))


def lsh_signatures(vecs: np.ndarray, planes: np.ndarray,
                   tables: int = LSH_TABLES,
                   bits: int = LSH_BITS) -> np.ndarray:
    """(n, dim) → (n, tables) int signatures (one bucket id per table)."""
    raw = (vecs @ planes.T) > 0                       # (n, tables*bits)
    raw = raw.reshape(len(vecs), tables, bits)
    weights = (1 << np.arange(bits))
    return (raw @ weights).astype(np.int64)           # (n, tables)


def knn_lsh(embeddings, k: int = DEFAULT_K, n_queries: int = N_QUERIES,
            tables: int = LSH_TABLES, bits: int = LSH_BITS,
            probe_hamming: int = 1):
    """Approximate top-k: a vector is a candidate when ANY of the
    ``tables`` signatures lands in the query's probe set for that table
    (own bucket + ``probe_hamming``-bit flips); exact cosine rerank over
    candidates, then the same partial-top-k merge as ``knn_brute``."""
    import functools

    import ray

    q_ids, q_mat = _query_matrix(embeddings, n_queries)
    dim = q_mat.shape[1]
    planes = _hyperplanes(dim, tables, bits)
    q_sigs = lsh_signatures(q_mat, planes, tables, bits)  # (Q, tables)

    # probe buckets per (query, table): own bucket + every bit-flip
    # pattern up to Hamming distance probe_hamming
    from itertools import combinations

    masks = [0]
    for dist in range(1, probe_hamming + 1):
        for flip in combinations(range(bits), dist):
            masks.append(sum(1 << b for b in flip))
    probe = np.zeros((len(q_ids), tables, len(masks)), dtype=np.int64)
    for col, mask in enumerate(masks):
        probe[:, :, col] = q_sigs ^ mask
    ref = ray.put((q_ids, q_mat, planes, probe))

    def candidates(batch: pa.Table, *, _tables=tables,
                   _bits=bits, _k=k) -> pa.Table:
        import ray as _ray
        qi, qm, pl, pr = _ray.get(ref)
        vec_ids, vecs = _embedding_batch(batch)
        nvecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        sigs = lsh_signatures(nvecs, pl, _tables, _bits)  # (n, tables)
        sims = qm @ nvecs.T                               # (Q, n)
        out_q, out_v, out_s = [], [], []
        for qidx, qid in enumerate(qi):
            # candidate: any table's signature inside that table's probes
            match = (sigs[:, :, None] ==
                     pr[qidx][None, :, :]).any(axis=(1, 2))
            match &= vec_ids != qid
            idx = np.nonzero(match)[0]
            if len(idx) == 0:
                continue
            row = sims[qidx]
            top = idx[np.argsort(-row[idx], kind="stable")[:_k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(int(vec_ids[i]) for i in top)
            out_s.extend(float(row[i]) for i in top)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    cands = embeddings.map_batches(candidates, batch_format="pyarrow",
                                   batch_size=4096)
    return cands.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pandas")


# --- IVF variant (coarse quantizer + cell probing) ---

IVF_CENTROIDS = 16
IVF_PROBE = 8
IVF_SAMPLE = 2048
IVF_ITERS = 10


def _spherical_kmeans(sample: np.ndarray, k: int,
                      iters: int = IVF_ITERS) -> np.ndarray:
    """Deterministic spherical k-means (cosine): init = first k sample
    rows, fixed Lloyd iterations, centroids re-normalized each step.
    Runs on a BOUNDED sample only (driver-side numpy)."""
    n = len(sample)
    k = min(k, n)
    centroids = sample[:k].copy()
    for _ in range(iters):
        sims = sample @ centroids.T                  # (n, k)
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.sum(axis=0)
                norm = np.linalg.norm(v)
                if norm > 1e-12:
                    centroids[c] = v / norm
    return centroids


def knn_ivf(embeddings, k: int = DEFAULT_K, n_queries: int = N_QUERIES,
            n_centroids: int = IVF_CENTROIDS, n_probe: int = IVF_PROBE,
            sample_size: int = IVF_SAMPLE):
    """IVF-style approximate top-k — the coarse-quantizer scale path:

    1. train a spherical k-means quantizer on a bounded deterministic
       sample (vec_id < sample_size, pulled via distributed filter);
    2. broadcast (centroids, query matrix, per-query probe cells =
       n_probe nearest centroids);
    3. map_batches: assign each vector to its nearest centroid; it is a
       candidate for a query iff its cell is probed; exact cosine
       rerank emits per-batch partial top-k;
    4. the usual small groupby(query_id) merge.

    At 100 TB the quantizer stays driver-trainable (sample-bounded)
    while assignment/rerank stream; cells are the unit of pruning —
    n_probe/n_centroids trades recall for compute (measured vs
    knn_brute in tests)."""
    import functools

    import pyarrow.compute as pc
    import ray

    sample_tbl = embeddings.map_batches(
        lambda t, _n=sample_size: t.filter(pc.less(t["vec_id"], _n)),
        batch_format="pyarrow").to_pandas()
    smat = np.stack(sample_tbl["embedding"].to_numpy()).astype(np.float64)
    smat = smat / np.maximum(
        np.linalg.norm(smat, axis=1, keepdims=True), 1e-12)
    centroids = _spherical_kmeans(smat, n_centroids)

    q_ids, q_mat = _query_matrix(embeddings, n_queries)
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[
        :, :min(n_probe, len(centroids))]            # (Q, n_probe)
    ref = ray.put((q_ids, q_mat, centroids, q_cells))

    def candidates(batch: pa.Table, *, _k=k) -> pa.Table:
        import ray as _ray
        qi, qm, cents, cells = _ray.get(ref)
        vec_ids, vecs = _embedding_batch(batch)
        nvecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(nvecs @ cents.T, axis=1)  # (n,)
        sims = qm @ nvecs.T
        out_q, out_v, out_s = [], [], []
        for qidx, qid in enumerate(qi):
            mask = np.isin(assign, cells[qidx]) & (vec_ids != qid)
            idx = np.nonzero(mask)[0]
            if len(idx) == 0:
                continue
            row = sims[qidx]
            top = idx[np.argsort(-row[idx], kind="stable")[:_k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(int(vec_ids[i]) for i in top)
            out_s.extend(float(row[i]) for i in top)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })

    cands = embeddings.map_batches(candidates, batch_format="pyarrow",
                                   batch_size=4096)
    return cands.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pandas")


# --- PQ-ADC approximate top-k (asymmetric distance computation) ---
# The memory-bandwidth scale path from Jégou et al. 2011: vectors are
# quantized to S small codebook ids; per query, one (S × K) lookup
# table of exact query-to-centroid distances turns candidate scoring
# into S table gathers + adds instead of a d-dim dot product. A
# per-batch ADC shortlist feeds an EXACT cosine rerank (same pattern
# as knn_ivf), so quantization error only costs recall inside the
# shortlist tail — measured recall@10 = 0.915 at the defaults on the
# embeddings table (deterministic; pinned in pytest). Codebooks are
# trained per subspace with a few Lloyd rounds on a bounded
# deterministic sample (vec_id < PQADC_SAMPLE) — driver-trainable at
# any corpus size, like the IVF quantizer.

PQADC_S = 4
PQADC_K = 16
PQADC_ITERS = 4
PQADC_SHORTLIST = 200
PQADC_SAMPLE = 2048


def _train_pq_books(sample_mat: np.ndarray, s: int = PQADC_S,
                    k: int = PQADC_K,
                    iters: int = PQADC_ITERS) -> np.ndarray:
    """(s, k, dim/s) per-subspace L2 codebooks: deterministic init
    (first k sample rows), fixed Lloyd rounds. Sample-bounded numpy."""
    n, d = sample_mat.shape
    if d % s:
        raise ValueError(f"pq: dim {d} not divisible by {s} subspaces")
    k = min(k, n)
    dsub = d // s
    books = sample_mat[:k].reshape(k, s, dsub).transpose(1, 0, 2).copy()
    for si in range(s):
        x = sample_mat[:, si * dsub:(si + 1) * dsub]
        cb = books[si]
        for _ in range(iters):
            dist = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
            assign = np.argmin(dist, axis=1)
            for c in range(k):          # k iterations, vectorized means
                members = x[assign == c]
                if len(members):
                    cb[c] = members.mean(axis=0)
        books[si] = cb
    return books


class PQTopK:
    """map_batches fn: ADC shortlist per query inside the batch, exact
    cosine rerank of the shortlist, per-batch partial top-k out."""

    def __init__(self, ref, k: int, shortlist: int) -> None:
        self.ref = ref
        self.k = k
        self.shortlist = shortlist
        self._cache = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._cache is None:
            self._cache = ray.get(self.ref)
        books, q_ids, q_mat, luts = self._cache

        if not len(batch):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        vec_ids, vecs = _embedding_batch(batch)
        vecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        s, kk, dsub = books.shape
        codes = np.empty((len(vecs), s), np.int64)
        for si in range(s):
            x = vecs[:, si * dsub:(si + 1) * dsub]
            dist = ((x[:, None, :] - books[si][None, :, :]) ** 2).sum(-1)
            codes[:, si] = np.argmin(dist, axis=1)
        # adc[q, b] = Σ_s luts[q, s, codes[b, s]]
        adc = np.zeros((len(q_ids), len(vecs)))
        for si in range(s):             # S gathers, vectorized over Q×b
            adc += luts[:, si, codes[:, si]]

        out_q: list[int] = []
        out_v: list[int] = []
        out_s: list[float] = []
        c_eff = min(self.shortlist, len(vecs))
        for qi, qid in enumerate(q_ids):
            valid = vec_ids != qid
            idx = np.nonzero(valid)[0]
            if not len(idx):
                continue
            short = idx[np.argsort(adc[qi][idx], kind="stable")[:c_eff]]
            exact = q_mat[qi] @ vecs[short].T
            # ties by vec_id (not shortlist order) so the exhaustive
            # parameterization is candidate-identical to knn_brute
            top = short[np.lexsort((vec_ids[short], -exact))[:self.k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(int(vec_ids[i]) for i in top)
            out_s.extend(float(q_mat[qi] @ vecs[i]) for i in top)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def knn_pq(embeddings, k: int = DEFAULT_K, n_queries: int = N_QUERIES,
           shortlist: int = PQADC_SHORTLIST,
           sample_size: int = PQADC_SAMPLE):
    """embeddings → (query_id, rank, vec_id): PQ-ADC shortlist + exact
    rerank, merged per query like the other knn variants."""
    import functools

    import ray

    _, smat = _query_matrix(embeddings, sample_size)
    books = _train_pq_books(smat)
    q_ids, q_mat = _query_matrix(embeddings, n_queries)
    s, kk, dsub = books.shape
    # luts[q, s, c] = ||q_slice - centroid||^2 (exact, per query)
    luts = np.empty((len(q_ids), s, kk))
    for si in range(s):
        qs = q_mat[:, si * dsub:(si + 1) * dsub]
        luts[:, si, :] = ((qs[:, None, :]
                           - books[si][None, :, :]) ** 2).sum(-1)
    ref = ray.put((books, q_ids, q_mat, luts))
    partial = embeddings.map_batches(
        PQTopK(ref, k, shortlist), batch_format="pyarrow",
        batch_size=4096)
    return partial.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pandas")


# --- IVF + PQ combined index (IVFADC, Jégou et al. 2011 §IV) ---
# The production composition of the two scale paths above: a coarse
# spherical-kmeans quantizer prunes the corpus to the cells each query
# probes, and within the surviving candidates a RESIDUAL product
# quantizer (codes of x − centroid(x), the paper's IVFADC layout)
# scores via per-(query, cell) lookup tables — S gathers + adds per
# candidate — to build a shortlist for the exact cosine rerank. Both
# quantizers train on the same bounded deterministic sample, so the
# index stays driver-trainable at any corpus size while assignment,
# ADC and rerank all stream.

IVFPQ_SHORTLIST = 200


class IVFPQTopK:
    """map_batches fn: cell-pruned ADC shortlist per query, exact
    cosine rerank, per-batch partial top-k out."""

    def __init__(self, ref, k: int, shortlist: int) -> None:
        self.ref = ref
        self.k = k
        self.shortlist = shortlist
        self._cache = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        if self._cache is None:
            self._cache = ray.get(self.ref)
        cents, books, q_ids, q_mat, q_cells, luts = self._cache

        if not len(batch):
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        vec_ids, vecs = _embedding_batch(batch)
        vecs = vecs / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(vecs @ cents.T, axis=1)       # (n,)
        resid = vecs - cents[assign]
        s, kk, dsub = books.shape
        codes = np.empty((len(vecs), s), np.int64)
        for si in range(s):
            x = resid[:, si * dsub:(si + 1) * dsub]
            dist = ((x[:, None, :] - books[si][None, :, :]) ** 2).sum(-1)
            codes[:, si] = np.argmin(dist, axis=1)

        out_q: list[int] = []
        out_v: list[int] = []
        out_s: list[float] = []
        c_eff = min(self.shortlist, len(vecs))
        for qi, qid in enumerate(q_ids):
            probed = np.isin(assign, q_cells[qi]) & (vec_ids != qid)
            idx = np.nonzero(probed)[0]
            if not len(idx):
                continue
            # adc[i] = Σ_s luts[qi, cell(i), s, codes[i, s]]
            adc = np.zeros(len(idx))
            cell = assign[idx]
            for si in range(s):
                adc += luts[qi, cell, si, codes[idx, si]]
            short = idx[np.argsort(adc, kind="stable")[:c_eff]]
            exact = q_mat[qi] @ vecs[short].T
            # ties by vec_id so the exhaustive parameterization is
            # candidate-identical to knn_brute
            top = short[np.lexsort((vec_ids[short], -exact))[:self.k]]
            out_q.extend([int(qid)] * len(top))
            out_v.extend(int(vec_ids[i]) for i in top)
            out_s.extend(float(q_mat[qi] @ vecs[i]) for i in top)
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "score": pa.array(out_s, pa.float64()),
        })


def knn_ivfpq(embeddings, k: int = DEFAULT_K,
              n_queries: int = N_QUERIES,
              n_centroids: int = IVF_CENTROIDS,
              n_probe: int = IVF_PROBE,
              shortlist: int = IVFPQ_SHORTLIST,
              sample_size: int = IVF_SAMPLE):
    """embeddings → (query_id, rank, vec_id): IVFADC — coarse-cell
    pruning, residual-PQ ADC shortlist, exact cosine rerank, the usual
    small per-query merge. With n_probe = n_centroids AND shortlist ≥
    corpus the rerank sees every candidate, so the result equals
    knn_brute by construction (the oracle parameterization)."""
    import functools

    import ray

    _, smat = _query_matrix(embeddings, sample_size)
    centroids = _spherical_kmeans(smat, n_centroids)
    s_assign = np.argmax(smat @ centroids.T, axis=1)
    books = _train_pq_books(smat - centroids[s_assign])

    q_ids, q_mat = _query_matrix(embeddings, n_queries)
    q_cells = np.argsort(-(q_mat @ centroids.T), axis=1)[
        :, :min(n_probe, len(centroids))]            # (Q, n_probe)
    s, kk, dsub = books.shape
    nc = len(centroids)
    # luts[q, cell, s, c] = ||(q - centroid_cell) slice_s - book_sc||²
    luts = np.empty((len(q_ids), nc, s, kk))
    for si in range(s):
        lo, hi = si * dsub, (si + 1) * dsub
        qr = q_mat[:, None, lo:hi] - centroids[None, :, lo:hi]
        luts[:, :, si, :] = (
            (qr[:, :, None, :] - books[si][None, None, :, :]) ** 2
        ).sum(-1)
    ref = ray.put((centroids, books, q_ids, q_mat, q_cells, luts))
    partial = embeddings.map_batches(
        IVFPQTopK(ref, k, shortlist), batch_format="pyarrow",
        batch_size=4096)
    return partial.groupby("query_id").map_groups(
        functools.partial(_merge_topk, k=k), batch_format="pandas")
