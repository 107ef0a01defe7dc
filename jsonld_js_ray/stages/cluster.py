"""Embedding clustering + semantic dedup (SemDeDup-style).

Three operators over the embeddings table (vec_id, embedding):

- ``kmeans_assign``: nearest-centroid (cosine) cluster id per vector
  under a FIXED deterministic centroid set (the k lowest-vec_id
  vectors) — the oracle-able assignment twin (cross-join argmax in
  SQL, ties to the smaller centroid id on both sides).
- ``kmeans_fit``: full-corpus distributed Lloyd iterations — broadcast
  centroids via ray.put, per-batch partial (cluster, sum, count)
  combiners, one tiny groupby(cluster) tree-reduce per round; the
  driver only ever holds k × dim floats. Pinned against an in-memory
  numpy reference in pytest (float centroid sums are not
  SQL-hashable).
- ``semdedup``: within each cluster, drop every vector that has an
  EARLIER (smaller vec_id) cluster-mate with cosine >= threshold —
  the SemDeDup pruning rule (Abbas et al. 2023, arXiv:2303.09540).

Scale contract: semdedup materializes ONE CLUSTER per task and does
exact in-cluster pairwise cosine, which is the SemDeDup design itself
— k must grow with the corpus so n/k stays bounded (~10^4 vectors per
cluster); the operator warns when a cluster exceeds the documented
cap. Assignment and Lloyd partials stream with no such assumption.

Threshold note: 0.44 sits >= 1e-4 away from every in-cluster pair
cosine in all test corpora (measured), so the float comparison agrees
between numpy f64 and DuckDB list_cosine_similarity. The assignment
argmax has the same property: the minimum best-vs-second-best centroid
score gap is 4.7e-5 (sf0.1) / 1.2e-4 (sf0.01) / 1.2e-4 (sf0.001) —
orders of magnitude above f32 accumulation noise (~1e-6), so numpy and
DuckDB rank identically; the parity test asserts the margin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KM_K = 8
KM_ITERS = 4
SEMDEDUP_T = 0.44
SEMDEDUP_CLUSTER_CAP = 100_000


def _norm_rows(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True),
                          1e-12)


def _batch_matrix(batch: pa.Table):
    from ..rayutil import embedding_batch as _embedding_batch
    if not len(batch):
        return np.zeros(0, np.int64), np.zeros((0, 0))
    return _embedding_batch(batch)


def _lowest_k_matrix(embeddings, k: int, who: str) -> np.ndarray:
    """Raw (rows, dim) matrix of the k lowest-vec_id vectors — the
    shared deterministic-init extraction. Returns (0, 0) for an empty
    corpus; raises when the corpus is non-empty but no vector has
    vec_id < k. May return FEWER than k rows (callers that need
    exactly k, like PQ's reshape, must check)."""
    tbl = embeddings.map_batches(
        lambda t, _k=k: t.filter(pc.less(t["vec_id"], _k)),
        batch_format="pyarrow").to_pandas()
    if tbl.empty or "vec_id" not in tbl.columns:
        if embeddings.count() > 0:
            raise ValueError(
                f"{who}: corpus has no vectors with vec_id < {k}; "
                f"pass explicit centroids/codebooks")
        return np.zeros((0, 0))
    order = np.argsort(tbl["vec_id"].to_numpy())
    return np.stack(tbl["embedding"].to_numpy()[order]) \
        .astype(np.float64)


def fixed_centroids(embeddings, k: int = KM_K) -> np.ndarray:
    """The k lowest-vec_id vectors (normalized) — a deterministic,
    SQL-mirrorable init (fewer than k rows is fine: the SQL mirror's
    ``vec_id < k`` filter shrinks identically). Returns a (0, 0) array
    for an empty corpus; raises if the corpus is non-empty but no
    vector has vec_id < k (assignment would be undefined)."""
    mat = _lowest_k_matrix(embeddings, k, "fixed_centroids")
    return mat if mat.size == 0 else _norm_rows(mat)


def _assign_kernel(ref, carry_embedding: bool):
    """Shared centroid-assignment map_batches fn — THE tiebreak
    contract lives here once: np.argmax takes the FIRST max, matching
    the SQL mirror's ORDER BY score DESC, cid ASC."""
    def assign(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cents = _ray.get(ref)
        ids, vecs = _batch_matrix(batch)
        cols: dict = {"vec_id": pa.array(ids, pa.int64())}
        if carry_embedding:
            cols["embedding"] = batch["embedding"]
        if not len(ids):
            cols["cluster"] = pa.array([], pa.int64())
            if carry_embedding:
                cols["embedding"] = pa.array([], pa.list_(pa.float32()))
            return pa.table(cols)
        sims = _norm_rows(vecs) @ cents.T
        cols["cluster"] = pa.array(
            np.argmax(sims, axis=1).astype(np.int64))
        return pa.table(cols)

    return assign


def _empty_or_centroids(embeddings, centroids, empty_schema: pa.Table):
    """Resolve centroids; on an EMPTY corpus return (None, empty
    typed dataset) so callers can short-circuit without crashing."""
    import ray.data as rd

    if centroids is None:
        centroids = fixed_centroids(embeddings)
    centroids = np.asarray(centroids, dtype=np.float64)
    if centroids.size == 0:
        return None, rd.from_arrow(empty_schema)
    return centroids, None


def kmeans_assign(embeddings, centroids: np.ndarray | None = None):
    """embeddings → (vec_id, cluster): cosine argmax over the centroid
    set (tiebreak documented on _assign_kernel)."""
    import ray

    centroids, empty = _empty_or_centroids(
        embeddings, centroids,
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "cluster": pa.array([], pa.int64())}))
    if empty is not None:
        return empty
    ref = ray.put(centroids)
    return embeddings.map_batches(_assign_kernel(ref, False),
                                  batch_format="pyarrow",
                                  batch_size=2048)


def kmeans_fit(embeddings, k: int = KM_K,
               iters: int = KM_ITERS) -> np.ndarray:
    """Full-corpus spherical Lloyd: returns the (k, dim) trained
    centroids. Each round is one streaming pass (per-batch partial
    sums) plus a k-row reduce; the centroid matrix is re-broadcast
    per round via ray.put."""
    import ray

    centroids = fixed_centroids(embeddings, k)
    if centroids.size == 0:          # empty corpus
        return centroids
    dim = centroids.shape[1]

    for _ in range(iters):
        ref = ray.put(centroids)

        def partials(batch: pa.Table, _ref=ref, _k=k,
                     _dim=dim) -> pa.Table:
            import ray as _ray

            cents = _ray.get(_ref)
            ids, vecs = _batch_matrix(batch)
            if not len(ids):
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "psum": pa.array([], pa.list_(pa.float64())),
                    "cnt": pa.array([], pa.int64())})
            vn = _norm_rows(vecs)
            assign = np.argmax(vn @ cents.T, axis=1)
            sums = np.zeros((_k, _dim))
            np.add.at(sums, assign, vn)        # vectorized scatter-add
            cnts = np.bincount(assign, minlength=_k)
            nz = np.flatnonzero(cnts)
            return pa.table({
                "cluster": pa.array(nz.astype(np.int64)),
                "psum": pa.array(list(sums[nz]),
                                 pa.list_(pa.float64())),
                "cnt": pa.array(cnts[nz].astype(np.int64))})

        def reduce_cluster(g) -> pa.Table:
            cid = int(g["cluster"].iloc[0])
            total = np.sum(np.stack(g["psum"].to_numpy()), axis=0)
            return pa.table({
                "cluster": pa.array([cid], pa.int64()),
                "psum": pa.array([total], pa.list_(pa.float64())),
                "cnt": pa.array([int(g["cnt"].sum())], pa.int64())})

        rows = embeddings.map_batches(partials, batch_format="pyarrow",
                                      batch_size=2048) \
            .groupby("cluster").map_groups(reduce_cluster,
                                           batch_format="pandas") \
            .to_pandas()          # k rows — bounded by construction
        nxt = centroids.copy()
        for _, r in rows.iterrows():
            v = np.asarray(r["psum"], dtype=np.float64)
            nrm = np.linalg.norm(v)
            if nrm > 1e-12:
                nxt[int(r["cluster"])] = v / nrm
        centroids = nxt
    return centroids


def semdedup(embeddings, threshold: float = SEMDEDUP_T,
             centroids: np.ndarray | None = None):
    """embeddings → (vec_id, cluster, keep): keep=False iff some
    smaller-vec_id vector in the SAME cluster has cosine >= threshold
    (exact in-cluster pairwise; approximation lives entirely in the
    clustering, as in SemDeDup)."""
    import warnings

    import ray

    centroids, empty = _empty_or_centroids(
        embeddings, centroids,
        pa.table({"vec_id": pa.array([], pa.int64()),
                  "cluster": pa.array([], pa.int64()),
                  "keep": pa.array([], pa.bool_())}))
    if empty is not None:
        return empty
    ref = ray.put(centroids)

    def dedup_in_cluster(g, _t=threshold) -> pa.Table:
        if len(g) > SEMDEDUP_CLUSTER_CAP:
            warnings.warn(
                f"semdedup: cluster of {len(g)} exceeds the "
                f"{SEMDEDUP_CLUSTER_CAP} pairwise cap — raise k so "
                f"n/k stays bounded", stacklevel=2)
        ids = g["vec_id"].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        mat = _norm_rows(np.stack(
            [np.asarray(v, np.float64)
             for v in g["embedding"].to_numpy()[order]]))
        sims = mat @ mat.T
        # strict upper triangle: earlier (smaller vec_id) rows only
        dup = np.triu(sims >= _t, k=1).any(axis=0)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(
                np.full(len(ids), int(g["cluster"].iloc[0]), np.int64)),
            "keep": pa.array(~dup),
        })

    return embeddings.map_batches(_assign_kernel(ref, True),
                                  batch_format="pyarrow",
                                  batch_size=2048) \
        .groupby("cluster").map_groups(dedup_in_cluster,
                                       batch_format="pandas")


def _assign_cte(k: int = KM_K) -> str:
    return f"""
c AS (SELECT vec_id AS cid, embedding AS cemb
      FROM embeddings WHERE vec_id < {k}),
scored AS (
  SELECT e.vec_id, e.embedding, c.cid,
         list_cosine_similarity(e.embedding, c.cemb) AS s
  FROM embeddings e CROSS JOIN c),
a AS (
  SELECT vec_id, embedding, cid AS cluster FROM (
    SELECT vec_id, embedding, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cid) AS rk
    FROM scored)
  WHERE rk = 1)"""


KMEANS_ASSIGN_SQL = f"""
WITH {_assign_cte()}
SELECT vec_id, CAST(cluster AS BIGINT) AS cluster FROM a
"""

SEMDEDUP_SQL = f"""
WITH {_assign_cte()},
dropped AS (
  SELECT a1.vec_id
  FROM a a1 JOIN a a2
    ON a2.cluster = a1.cluster AND a2.vec_id < a1.vec_id
   AND list_cosine_similarity(a1.embedding, a2.embedding)
       >= {SEMDEDUP_T}
  GROUP BY a1.vec_id)
SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
       (d.vec_id IS NULL) AS keep
FROM a LEFT JOIN dropped d ON d.vec_id = a.vec_id
"""


# --- product quantization (PQ) encoding ---
# Jégou et al. 2011 (IEEE TPAMI, "Product quantization for nearest
# neighbor search"): split each vector into PQ_S subspaces and encode
# each slice as the id of its nearest codebook entry — the compressed
# representation behind IVF-PQ indexes. The deterministic codebook
# (slices of the PQ_K lowest-vec_id vectors) keeps the operator
# oracle-exact; a trained variant simply passes kmeans_fit centroids
# per subspace. Assignment is per-batch einsum + argmin — no shuffle,
# streams at any corpus size. Distances are compared in f64 on both
# sides (the SQL casts slices to DOUBLE[]): measured min argmin margin
# is 2.1e-5 in squared distance, far above f64 noise but NOT above f32
# noise, which is why the cast matters.

PQ_S = 4
PQ_K = 8


def pq_codebooks(embeddings, s: int = PQ_S,
                 k: int = PQ_K) -> np.ndarray:
    """(s, k, dim/s) codebook tensor from the k lowest-vec_id vectors
    (raw, unnormalized — PQ is an L2 quantizer). Unlike the kmeans
    init, the reshape needs EXACTLY k rows."""
    mat = _lowest_k_matrix(embeddings, k, "pq_codebooks")
    if mat.size == 0:
        return np.zeros((s, 0, 0))
    if len(mat) != k:
        raise ValueError(
            f"pq_codebooks: need exactly {k} vectors with vec_id < "
            f"{k}, found {len(mat)}; pass explicit codebooks")
    dim = mat.shape[1]
    if dim % s:
        raise ValueError(f"pq: dim {dim} not divisible by {s} subspaces")
    return mat.reshape(k, s, dim // s).transpose(1, 0, 2).copy()


def pq_encode(embeddings, codebooks: np.ndarray | None = None):
    """embeddings → (vec_id, c0..c{S-1}): per-subspace nearest-codebook
    ids (argmin L2, ties to the smaller id — np.argmin first-max)."""
    import ray
    import ray.data as rd

    if codebooks is None:
        codebooks = pq_codebooks(embeddings)
    codebooks = np.asarray(codebooks, dtype=np.float64)
    s = codebooks.shape[0]
    empty_cols = {"vec_id": pa.array([], pa.int64()),
                  **{f"c{i}": pa.array([], pa.int64())
                     for i in range(s)}}
    if codebooks.size == 0:
        return rd.from_arrow(pa.table(empty_cols))
    ref = ray.put(codebooks)

    def encode(batch: pa.Table, _s=s) -> pa.Table:
        import ray as _ray

        books = _ray.get(ref)
        ids, vecs = _batch_matrix(batch)
        if not len(ids):
            return pa.table(empty_cols)
        dsub = books.shape[2]
        x = vecs.reshape(len(ids), _s, dsub)
        cols = {"vec_id": pa.array(ids, pa.int64())}
        for i in range(_s):
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; the x term is
            # constant per row, so argmin needs only the last two
            d = (-2.0 * x[:, i, :] @ books[i].T
                 + (books[i] ** 2).sum(axis=1))
            cols[f"c{i}"] = pa.array(
                np.argmin(d, axis=1).astype(np.int64))
        return pa.table(cols)

    return embeddings.map_batches(encode, batch_format="pyarrow",
                                  batch_size=2048)


def _pq_sql(s: int = PQ_S, k: int = PQ_K, dim: int = 64) -> str:
    dsub = dim // s
    code_ctes, joins, outs = [], [], []
    for i in range(s):
        lo, hi = i * dsub + 1, (i + 1) * dsub
        sl = f"CAST(list_slice({{t}}.embedding, {lo}, {hi}) AS DOUBLE[])"
        code_ctes.append(f"""
code{i} AS (
  SELECT vec_id, cid AS c{i} FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_distance({sl.format(t='e')},
                                      {sl.format(t='c')}), c.cid)
               AS rk
    FROM embeddings e CROSS JOIN cb c)
  WHERE rk = 1)""")
        joins.append(f"JOIN code{i} USING (vec_id)")
        outs.append(f"CAST(c{i} AS BIGINT) AS c{i}")
    return (f"WITH cb AS (SELECT vec_id AS cid, embedding "
            f"FROM embeddings WHERE vec_id < {k}),"
            + ",".join(code_ctes)
            + f"\nSELECT vec_id, {', '.join(outs)}\n"
            f"FROM embeddings {' '.join(joins)}")


PQ_ENCODE_SQL = _pq_sql()


def embed_quantize(sf_dir: str):
    """embeddings → (vec_id, dim, q): symmetric int8 quantization of
    every embedding coordinate — q = floor(x·127/max_abs + 0.5) with
    one corpus-wide max_abs scale — the compression pass an
    embedding-export pipeline runs before serving. Long format (one
    row per coordinate) keeps the contract hash-comparable.

    Exactness: max() is order-free (unlike sums), and the quantizer
    is three IEEE-754 double ops evaluated identically by numpy and
    DuckDB, so the mirror is hash-exact with no epsilon. Two passes:
    a scalar max-abs reduce (per-batch partials → driver float), then
    one streaming quantize pass."""
    import ray.data as rd

    from ..rayutil import strip_meta as _strip_meta

    def _read():
        return rd.read_parquet(
            f"{sf_dir}/embeddings.parquet",
            columns=["vec_id", "embedding"],
        ).map_batches(_strip_meta, batch_format="pyarrow",
                      zero_copy_batch=True)

    def batch_max(batch: pa.Table) -> pa.Table:
        _, vecs = _batch_matrix(batch)
        return pa.table({"m": pa.array([float(np.abs(vecs).max())
                                        if vecs.size else 0.0])})

    ma = max((float(b["m"][i].as_py())
              for b in _read().map_batches(
                  batch_max, batch_format="pyarrow").iter_batches(
                  batch_format="pyarrow")
              for i in range(b.num_rows)), default=0.0)
    if ma == 0.0:
        ma = 1.0                     # degenerate all-zero corpus

    def quantize(batch: pa.Table) -> pa.Table:
        ids, vecs = _batch_matrix(batch)
        n, d = vecs.shape
        q = np.floor(vecs * 127.0 / ma + 0.5).astype(np.int64)
        return pa.table({
            "vec_id": pa.array(np.repeat(ids, d)),
            "dim": pa.array(np.tile(np.arange(1, d + 1,
                                              dtype=np.int64), n)),
            "q": pa.array(q.ravel()),
        })

    return _read().map_batches(quantize, batch_format="pyarrow",
                               batch_size=4096)


EMBED_QUANTIZE_SQL = """
WITH ma AS (SELECT CASE WHEN m0 IS NULL OR m0 = 0 THEN 1.0
                   ELSE m0 END AS m FROM (
    SELECT max(abs(CAST(v AS DOUBLE))) AS m0 FROM (
        SELECT unnest(embedding) AS v FROM embeddings)))
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(generate_subscripts(e.embedding, 1) AS BIGINT) AS dim,
       CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 127.0
                  / ma.m + 0.5) AS BIGINT) AS q
FROM embeddings e CROSS JOIN ma
"""
