"""Relational/stream operator tests: left outer join, running totals,
value histogram, text normalization (semantics + DuckDB oracle parity
at sf0.001; the driver re-checks parity at sf0.01)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _parity(E, q, sf_dir, views):
    import duckdb
    import pandas as pd

    mine = E.queries()[q](sf_dir).to_pandas()
    con = duckdb.connect()
    for t in views:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
    orc = con.sql(E.oracle_sql()[q]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    return a


def test_join_left_oracle_parity_sf(ray_session, sf_dir):
    import duckdb

    import __ray_entry__ as E

    a = _parity(E, "join_left", sf_dir, ("customer", "orders"))
    # every customer survives (LEFT semantics) ...
    con = duckdb.connect()
    n_cust = con.sql(f"SELECT count(*) FROM "
                     f"'{sf_dir}/customer.parquet'").fetchone()[0]
    assert len(a) == n_cust
    # ... and the NULL-preserving branch is genuinely exercised
    assert (a["n_big"] == 0).any() and (a["n_big"] > 0).any()
    assert ((a["n_big"] == 0) == (a["max_cents"] == 0)).all()


def test_user_running_totals_oracle_parity_sf(ray_session, sf_dir):
    import duckdb

    import __ray_entry__ as E

    a = _parity(E, "user_running_totals", sf_dir, ("events",))
    n_events = duckdb.sql(f"SELECT count(*) FROM "
                          f"'{sf_dir}/events.parquet'").fetchone()[0]
    assert len(a) == n_events            # one output row per event
    # the last running value per user equals the user's exact total
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])
    cents = np.floor(np.nan_to_num(ev["value"].to_numpy()) * 100
                     + 0.5).astype(np.int64)
    want = pd.Series(cents).groupby(ev["user_id"]).sum()
    got = a.loc[a.groupby("user_id")["seq"].idxmax()] \
        .set_index("user_id")["cum_cents"]
    assert got.sort_index().equals(want.sort_index())


def test_value_histogram_semantics(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.histo import value_histogram

    tbl = pa.table({"value": pa.array(
        [0.0, 9.999, 10.0, 25.0, -0.5, -10.0, None], pa.float64())})
    out = value_histogram(rd.from_arrow(tbl), width=10.0).to_pandas()
    got = dict(zip(out["bin"], out["n_events"]))
    # floor semantics: [0,10) -> 0, [10,20) -> 1, negatives floor DOWN
    assert got == {0: 2, 1: 1, 2: 1, -1: 2}


def test_value_histogram_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "value_histogram", sf_dir, ("events",))
    assert len(a) > 1 and (a["n_events"] > 0).all()


def test_normalize_text_semantics():
    from jsonld_js_ray.stages.text import normalize_text_batch

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "  Hello,   WORLD!! 42  ",
            "a-b_c.d",
            "!!!",
            None,
        ], pa.string()),
    })
    out = normalize_text_batch(tbl).to_pydict()
    assert out["norm_text"] == ["hello world 42", "a b c d", "", ""]
    assert out["n_chars_norm"] == [14, 7, 0, 0]


def test_normalize_text_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "normalize_text", sf_dir, ("documents",))
    assert len(a) == 500 and (a["n_chars_norm"] > 0).any()


def test_dedup_substring_semantics(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.ngrams import SUB_K, dedup_substring

    window = " ".join(f"w{i}" for i in range(SUB_K))
    docs = [
        f"prefix one {window} suffix one",          # 0: first owner
        "completely different text " * SUB_K,       # 1: clean
        f"other lead-in {window} other tail",       # 2: dup of 0
        window,                                     # 3: dup of 0 (exact)
        f"{window[:-1]}X trailing",                 # 4: near-miss, clean
        "short doc",                                # 5: < K tokens
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    })
    out = dedup_substring(rd.from_arrow(tbl)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out["is_dup"].tolist() == [False, False, True, True,
                                      False, False]
    assert out["first_doc"].tolist() == [0, 1, 0, 0, 4, 5]


def test_dedup_substring_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "dedup_substring", sf_dir, ("documents",))
    assert len(a) == 500
    # the raw corpus's near-dups share exact windows -> real signal
    assert a["is_dup"].any()
    assert (a.loc[~a["is_dup"], "first_doc"]
            == a.loc[~a["is_dup"], "doc_id"]).all()


def test_kcore_onion_semantics(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.graph import KCORE_K, kcore_quads

    assert KCORE_K == 5
    # K6 clique: degree 5 everywhere -> survives every round (layer 0)
    clique = [chr(ord("A") + i) for i in range(6)]
    edges = [(a, b) for i, a in enumerate(clique)
             for b in clique[i + 1:]]
    edges.append(("A", "P"))            # pendant: peels round 1
    edges += [("X", "Y"), ("Y", "Z")]   # path: peels round 1
    # star: leaves peel round 1, the hub loses all edges -> round 2
    edges += [(f"q{i}", "hub") for i in range(5)]
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges], pa.string()),
        "obj_kind": pa.array(["iri"] * len(edges), pa.string()),
        "obj_value": pa.array([e[1] for e in edges], pa.string()),
    })
    out = kcore_quads(rd.from_arrow(tbl)).to_pandas() \
        .set_index("node")["peeled_round"]
    assert set(out[clique]) == {0}
    assert out["P"] == 1 and set(out[["X", "Y", "Z"]]) == {1}
    assert set(out[[f"q{i}" for i in range(5)]]) == {1}
    assert out["hub"] == 2
    assert len(out) == len(clique) + 10


def test_kcore_oracle_parity_sf(ray_session, sf_dir):
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["kg_kcore"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(E.oracle_sql()["kg_kcore"]).df()
    import pandas as pd

    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # the KG's star shape cascades: turns, then convs/entities, then
    # the class hub — at least three distinct onion layers
    assert a["peeled_round"].nunique() >= 3


def test_knn_ivfpq_recall_and_exhaustive_equality(ray_session, sf_dir):
    """Default IVFADC (cell pruning + residual-PQ shortlist) keeps
    recall@10 high vs brute; probing every cell with an exhaustive
    shortlist is candidate-identical to knn_brute (the construction
    behind the oracle registration)."""
    import ray.data as rd

    from jsonld_js_ray.stages.similarity import (
        IVF_CENTROIDS, knn_brute, knn_ivfpq,
    )

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    brute = knn_brute(emb).to_pandas()
    approx = knn_ivfpq(emb).to_pandas()
    hits = approx.merge(brute, on=["query_id", "vec_id"])
    assert len(hits) / len(brute) >= 0.8

    exhaustive = knn_ivfpq(emb, n_probe=IVF_CENTROIDS,
                           shortlist=10 ** 9).to_pandas()
    cols = ["query_id", "rank", "vec_id"]
    a = exhaustive[cols].sort_values(cols).reset_index(drop=True)
    b = brute[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_lm_bigram_score_semantics(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.tfidf import lm_bigram_score

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b a b", "a b c", "x"], pa.string()),
    })
    out = lm_bigram_score(rd.from_arrow(tbl)).to_pandas() \
        .set_index("doc_id").sort_index()
    # n2: (a,b)=3 (b,a)=1 (b,c)=1; n1: a=3 b=2
    # contribs: (a,b) 10^6*3//3=10^6, (b,a)=(b,c)=500000
    assert out.loc[0, "wsum"] == 2_500_000 and out.loc[0, "n_pairs"] == 3
    assert out.loc[0, "lm2_score"] == 833_333
    assert out.loc[1, "wsum"] == 1_500_000 and out.loc[1, "n_pairs"] == 2
    assert out.loc[1, "lm2_score"] == 750_000
    assert 2 not in out.index          # single-token doc: no pairs


def test_lm_bigram_score_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "lm_bigram_score", sf_dir, ("documents",))
    assert len(a) == 500
    assert (a["lm2_score"] <= 10 ** 6).all() and (a["lm2_score"] > 0).all()
