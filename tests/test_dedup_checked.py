"""Round-4 task 5: exact SQL oracles + in-run exactness certificates
for the RAW dedup_minhash / dedup_ngram / dedup_simhash rows
(knn_lsh-checked pattern — q_knn_lsh_checked precedent)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _oracle_df(sql, sf=SF):
    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf}/documents.parquet'")
    try:
        return con.sql(sql).df()
    finally:
        con.close()


def _cmp(mine: pd.DataFrame, orc: pd.DataFrame):
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_simhash64_matches_sql_hash():
    """Engine simhash64 == the SQL recomputation for hand texts —
    the bit-exactness that makes SIMHASH_DEDUP_SQL an oracle."""
    import duckdb

    from jsonld_js_ray.stages.dedup import simhash64

    texts = ["hello world hello", "MiXeD Case  double  space",
             "single", ""]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT * FROM (VALUES " +
            ",".join(f"({i}, '{t}')" for i, t in enumerate(texts)) +
            ") t(doc_id, text)")
    sql = r"""
    WITH tok AS (
      SELECT doc_id, t AS tok, CAST(count(*) AS BIGINT) AS w
      FROM documents,
           unnest(regexp_extract_all(lower(coalesce(text, '')),
                                     '\S+')) AS u(t)
      GROUP BY 1, 2),
    th AS (SELECT doc_id,
                  CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT)
                      AS h, w FROM tok),
    votes AS (SELECT doc_id, b,
                     sum(CASE WHEN (h >> b) & 1 = 1 THEN w ELSE -w END)
                         AS v
              FROM th, unnest(generate_series(0, 63)) AS g(b)
              GROUP BY 1, 2),
    sig AS (SELECT doc_id,
                   sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b
                            ELSE CAST(0 AS UBIGINT) END) AS sh
            FROM votes GROUP BY 1)
    SELECT d.doc_id, coalesce(s.sh, 0) AS sh
    FROM documents d LEFT JOIN sig s USING (doc_id) ORDER BY doc_id
    """
    for row in con.sql(sql).fetchall():
        assert simhash64(texts[int(row[0])]) == int(row[1])


@pytest.mark.parametrize("key", ["dedup_minhash", "dedup_ngram",
                                 "dedup_simhash"])
def test_checked_raw_dedup_matches_exact_sql(ray_session, key):
    """The checked wrappers pass their own in-run certificate AND
    match the exact ground-truth SQL at sf0.001."""
    import __ray_entry__ as E

    mine = E.queries()[key](SF).to_pandas()
    orc = _oracle_df(E.oracle_sql()[key])
    _cmp(mine, orc)
    # the raw corpus genuinely contains near-dup clusters — the oracle
    # is not vacuously comparing an identity labeling
    assert (~mine["keep"]).sum() > 0


def test_certificate_raises_on_divergence():
    """_assert_labels_match fails LOUDLY when the engine labeling
    diverges from the referee (the under-recall failure mode)."""
    from jsonld_js_ray.pipelines.training_data import \
        _assert_labels_match

    got = pd.DataFrame({"doc_id": [0, 1, 2],
                        "cluster_id": [0, 1, 2],
                        "keep": [True, True, True]})
    exp = pd.DataFrame({"doc_id": [0, 1, 2],
                        "cluster_id": [0, 0, 2],
                        "keep": [True, False, True]})
    with pytest.raises(RuntimeError, match="pre-check failed"):
        _assert_labels_match(got, exp, "dedup_minhash")


def test_simhash_referee_pairs(ray_session, tmp_path):
    """The chunked all-pairs Hamming referee finds exactly the planted
    near-identical pair and clusters it."""
    import pyarrow.parquet as pq

    from jsonld_js_ray.pipelines.training_data import \
        q_dedup_simhash_checked

    base = " ".join(f"tok{i}" for i in range(200))
    near = base + " extra"
    far = " ".join(f"zzz{i} yyy{i}" for i in range(100))
    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([base, near, far], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = q_dedup_simhash_checked(str(tmp_path)).to_pandas() \
        .set_index("doc_id")
    assert out.loc[1, "cluster_id"] == 0 and not out.loc[1, "keep"]
    assert out.loc[2, "cluster_id"] == 2 and out.loc[2, "keep"]
