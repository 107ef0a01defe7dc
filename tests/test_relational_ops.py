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


def test_reach_bfs_semantics(ray_session):
    """Path seed—a—b—c—d at hops=3: exact min-hop distances 0..3,
    d unreached (absent); a second seed shortcuts c to dist 1."""
    import ray.data as rd

    from jsonld_js_ray.stages.graph import REACH_SEED_PRED, reach_quads

    edges = [("seed", "a"), ("a", "b"), ("b", "c"), ("c", "d"),
             ("d", "e")]
    subj = [e[0] for e in edges]
    obj = [e[1] for e in edges]
    pred = ["p"] * len(edges)
    # the mention quad marks "seed" as an entity seed (and is itself
    # an edge turn0—seed)
    subj.append("turn0")
    obj.append("seed")
    pred.append(REACH_SEED_PRED)
    tbl = pa.table({
        "subj": pa.array(subj, pa.string()),
        "pred": pa.array(pred, pa.string()),
        "obj_kind": pa.array(["iri"] * len(subj), pa.string()),
        "obj_value": pa.array(obj, pa.string()),
    })
    out = reach_quads(rd.from_arrow(tbl), hops=3).to_pandas() \
        .set_index("node")["dist"]
    assert out.to_dict() == {"seed": 0, "turn0": 1, "a": 1, "b": 2,
                             "c": 3}
    # second seed at the far end pulls d/e into range
    tbl2 = pa.table({
        "subj": pa.array(subj + ["turn1"], pa.string()),
        "pred": pa.array(pred + [REACH_SEED_PRED], pa.string()),
        "obj_kind": pa.array(["iri"] * (len(subj) + 1), pa.string()),
        "obj_value": pa.array(obj + ["e"], pa.string()),
    })
    out2 = reach_quads(rd.from_arrow(tbl2), hops=3).to_pandas() \
        .set_index("node")["dist"]
    assert out2["e"] == 0 and out2["d"] == 1 and out2["c"] == 2
    assert out2["turn1"] == 1 and out2["b"] == 2


def test_reach_oracle_parity_sf(ray_session, sf_dir):
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    mine = E.queries()["kg_reach"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(E.oracle_sql()["kg_reach"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # entity seeds at 0, every turn at 1, convs at 2, class hub at 3
    assert set(a["dist"].unique()) == {0, 1, 2, 3}


def test_common_neighbors_semantics(ray_session):
    """Star a,b,c around hub h (+ edge a—b): five wedge pairs, each
    with one shared neighbor; a degree cap of 2 excludes h as a
    center, leaving only the pairs through a and b."""
    import ray.data as rd

    from jsonld_js_ray.stages.graph import common_neighbors

    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b")]
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges], pa.string()),
        "obj_kind": pa.array(["iri"] * len(edges), pa.string()),
        "obj_value": pa.array([e[1] for e in edges], pa.string()),
    })
    out = common_neighbors(rd.from_arrow(tbl)).to_pandas()
    got = {(r.u, r.v): r.common for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("a", "c"): 1, ("b", "c"): 1,
                   ("a", "h"): 1, ("b", "h"): 1}
    capped = common_neighbors(rd.from_arrow(tbl), max_deg=2) \
        .to_pandas()
    got2 = {(r.u, r.v): r.common for r in capped.itertuples()}
    assert got2 == {("a", "h"): 1, ("b", "h"): 1}


def test_common_neighbors_oracle_parity_sf(ray_session, sf_dir):
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    mine = E.queries()["kg_common_neighbors"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(E.oracle_sql()["kg_common_neighbors"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # turns sharing a conversation are the dominant wedge pairs
    assert (a["common"] > 1).any()


def test_full_outer_join_semantics(ray_session, tmp_path):
    """Crafted events where the outer branches matter: click-only and
    purchase-only users survive with a 0 on the missing side; users
    with neither are absent; engine matches DuckDB FULL OUTER JOIN on
    the same file."""
    import datetime as dt

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonld_js_ray.stages.joins import (
        full_outer_join_clicks_purchases,
    )

    rows = [  # (user, type)
        (1, "click"), (1, "click"), (1, "purchase"),   # both sides
        (2, "click"),                                  # click-only
        (3, "purchase"), (3, "purchase"),              # purchase-only
        (4, "view"),                                   # neither
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * len(rows),
                       pa.timestamp("us")),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "event_type": pa.array([e for _, e in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = full_outer_join_clicks_purchases(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.index.tolist() == [1, 2, 3]
    assert out["n_clicks"].tolist() == [2, 1, 0]
    assert out["n_purchases"].tolist() == [1, 0, 2]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    orc = con.sql(E.oracle_sql()["join_full_outer"]).df() \
        .set_index("user_id").sort_index()
    pd.testing.assert_frame_equal(out, orc.astype(out.dtypes.to_dict()))


def test_property_table_semantics(ray_session):
    """Pivot picks MIN value under duplicate assertions and leaves
    NULL for absent predicates; subjects with no selected predicate
    are absent entirely."""
    import ray.data as rd

    from jsonld_js_ray.stages.pivot import property_table

    V = "https://w3id.org/conv#"
    rows = [  # (subj, pred, val)
        ("t1", f"{V}role", "user"),
        ("t1", f"{V}role", "assistant"),      # dup: min -> assistant
        ("t1", f"{V}position", "3"),
        ("t2", f"{V}tool", "search"),          # others NULL
        ("c1", f"{V}turnCount", "9"),          # not selected -> absent
    ]
    tbl = pa.table({
        "subj": pa.array([r[0] for r in rows], pa.string()),
        "pred": pa.array([r[1] for r in rows], pa.string()),
        "obj_kind": pa.array(["literal"] * len(rows), pa.string()),
        "obj_value": pa.array([r[2] for r in rows], pa.string()),
    })
    out = property_table(rd.from_arrow(tbl)).to_pandas() \
        .set_index("node").sort_index()
    assert out.index.tolist() == ["t1", "t2"]
    assert out.loc["t1", "role"] == "assistant"
    assert out.loc["t1", "position"] == "3"
    assert out.loc["t1", "tool"] is None and out.loc["t1", "part_of"] is None
    assert out.loc["t2", "tool"] == "search"
    assert out.loc["t2", "role"] is None


def test_property_table_and_full_outer_parity_sf(ray_session, sf_dir):
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    for q in ("kg_property_table", "join_full_outer"):
        mine = E.queries()[q](sf_dir).to_pandas()
        con = duckdb.connect()
        con.sql(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
        orc = con.sql(E.oracle_sql()[q]).df()
        cols = sorted(mine.columns)
        a = mine[cols].sort_values(cols).reset_index(drop=True)
        b = orc[cols].sort_values(cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
        assert len(a) > 0


def test_resource_allocation_semantics(ray_session):
    """Star a,b,c around hub h (+ edge a—b): every wedge weight is
    floor(10^6 / deg(center)); deg(h)=3, deg(a)=deg(b)=2. Pairs via
    center h — (a,b), (a,c), (b,c) — score 333333; (a,h) via center b
    and (b,h) via center a score 500000."""
    import ray.data as rd

    from jsonld_js_ray.stages.graph import resource_allocation

    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("a", "b")]
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges], pa.string()),
        "obj_kind": pa.array(["iri"] * len(edges), pa.string()),
        "obj_value": pa.array([e[1] for e in edges], pa.string()),
    })
    out = resource_allocation(rd.from_arrow(tbl)).to_pandas()
    got = {(r.u, r.v): r.ra_score for r in out.itertuples()}
    assert got == {("a", "b"): 333333, ("a", "c"): 333333,
                   ("b", "c"): 333333, ("a", "h"): 500000,
                   ("b", "h"): 500000}


def test_robust_outliers_semantics(ray_session, tmp_path):
    """User 1: nine values at 10 (MAD 0) and one at 100 → only the 100
    is flagged (|v-med| > 0). User 2: spread values where MAD > 0
    gates the flag at 3×MAD exactly (strict >)."""
    import datetime as dt

    import pyarrow.parquet as pq

    from jsonld_js_ray.stages.rank import robust_outliers

    vals1 = [10.0] * 9 + [100.0]
    # user 2: sorted [1..7, 100]; med = 4 (pos ceil(.5*8)=4), devs
    # sorted [0,1,1,2,2,3,3,96] → MAD = 2; flag |v-4| > 6 → only 100
    vals2 = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    vals = vals1 + vals2
    users = [1] * len(vals1) + [2] * len(vals2)
    tbl = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * len(vals),
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * len(vals), pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * len(vals), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = robust_outliers(str(tmp_path)).to_pandas() \
        .sort_values("event_id")
    assert out["value"].tolist() == [100.0, 100.0]
    assert out["user_id"].tolist() == [1, 2]


def test_rollup_levels_consistent(ray_session, sf_dir):
    """The three rollup levels agree internally: finest rows sum to
    each type subtotal, subtotals sum to the grand total."""
    import __ray_entry__ as E

    df = E.queries()["rollup_events"](sf_dir).to_pandas()
    fine = df[df["day"].notna()]
    types = df[df["day"].isna() & df["event_type"].notna()]
    grand = df[df["event_type"].isna()]
    assert len(grand) == 1
    assert grand["n_events"].iloc[0] == fine["n_events"].sum()
    assert grand["total_cents"].iloc[0] == fine["total_cents"].sum()
    by_t = fine.groupby("event_type")[["n_events", "total_cents"]] \
        .sum()
    for t, row in types.set_index("event_type").iterrows():
        assert row["n_events"] == by_t.loc[t, "n_events"]
        assert row["total_cents"] == by_t.loc[t, "total_cents"]


def test_new_relational_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    for q in ("robust_outliers", "rollup_events",
              "kg_resource_allocation"):
        a = _parity(E, q, sf_dir, ("events",))
        assert len(a) > 0


def test_lm_backoff_semantics(ray_session):
    """Train split = even doc_ids. Doc 0 (train): pair (a,b) seen
    twice, (b,a) once -> all pairs seen, pure conditional probs.
    Doc 1 (held-out): pair (a,b) seen in train -> main branch;
    pair (b,z) unseen -> backoff to alpha * ctf(z)/totA = 0 (z not in
    train); pair (z,q) unseen, q unseen -> 0."""
    import ray.data as rd

    from jsonld_js_ray.stages.tfidf import LM_SCALE, lm_backoff_score

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a b a b a", "a b z q"], pa.string()),
    })
    out = lm_backoff_score(rd.from_arrow(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    # train counts (doc 0 only): pairs (a,b)x2 (b,a)x2; n1(a)=2 n1(b)=2
    # doc 0: pairs (a,b) tf2=2 contrib=SCALE*2//2=SCALE;
    #        (b,a) tf2=2 contrib=SCALE -> mean = SCALE
    assert out.loc[0, "lmbo_score"] == LM_SCALE
    # doc 1: (a,b) seen contrib=SCALE; (b,z) unseen, ctfA(z)=0 -> 0;
    #        (z,q) unseen, ctfA(q)=0 -> 0 -> mean = SCALE // 3
    assert out.loc[1, "n_pairs"] == 3
    assert out.loc[1, "lmbo_score"] == LM_SCALE // 3
    # backoff to a SEEN unigram: doc 3 pairs (b,c): c unseen as pair
    # second... craft: train doc 2 = "c c c" (ctfA(c)=3), doc 3 = "b c"
    docs2 = pa.table({
        "doc_id": pa.array([2, 3], pa.int64()),
        "text": pa.array(["c c c", "b c"], pa.string()),
    })
    out2 = lm_backoff_score(rd.from_arrow(docs2)).to_pandas() \
        .set_index("doc_id").sort_index()
    # doc 3: pair (b,c) unseen in train (train has only (c,c));
    # backoff = (2*SCALE*ctfA(c)) // (5*totA) = (2*SCALE*3)//(5*3)
    assert out2.loc[3, "lmbo_score"] == (2 * LM_SCALE * 3) // (5 * 3)


def test_lm_backoff_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "lm_backoff_score", sf_dir, ("documents",))
    assert len(a) == 500
    # held-out (odd) docs hit unseen bigrams: their mean score must
    # fall below the train split's (backoff contributions are tiny)
    even = a[a["doc_id"] % 2 == 0]["lmbo_score"].mean()
    odd = a[a["doc_id"] % 2 == 1]["lmbo_score"].mean()
    assert odd < even


def test_rollup_null_event_type(ray_session, tmp_path):
    """A NULL event_type groups as its own finest-level key (not the
    string 'None'), exactly as DuckDB ROLLUP groups NULLs; the output
    multiset matches the oracle on the same file."""
    import datetime as dt

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonld_js_ray.stages.rollup import rollup_events

    tbl = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * 2
                       + [dt.datetime(2026, 1, 2)] * 2,
                       pa.timestamp("us")),
        "user_id": pa.array([1, 2, 1, 2], pa.int64()),
        "event_type": pa.array(["click", None, "click", None],
                               pa.string()),
        "value": pa.array([1.0, 2.0, 3.0, None], pa.float64()),
        "props": pa.array([""] * 4, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    mine = rollup_events(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{tmp_path}/events.parquet'")
    orc = con.sql(E.oracle_sql()["rollup_events"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    # NULL-typed events form real finest-level groups (day non-null)
    assert ((a["event_type"].isna()) & (a["day"].notna())).sum() == 2


def test_ntile_semantics(ray_session, tmp_path):
    """NTILE(4) sizing: n=6 -> tile sizes 2,2,1,1; n=3 (< tiles) ->
    each row its own tile; ties broken by event_id."""
    import datetime as dt

    import pyarrow.parquet as pq

    from jsonld_js_ray.stages.rank import user_value_ntiles

    vals1 = [5.0, 1.0, 3.0, 3.0, 2.0, 4.0]      # user 1, n=6
    vals2 = [9.0, 7.0, 8.0]                      # user 2, n=3
    vals = vals1 + vals2
    users = [1] * 6 + [2] * 3
    tbl = pa.table({
        "event_id": pa.array(range(len(vals)), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * len(vals),
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * len(vals), pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * len(vals), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = user_value_ntiles(str(tmp_path)).to_pandas() \
        .set_index("event_id")["tile"]
    # user 1 sorted by (value, event_id): e1(1) e4(2) e2(3) e3(3)
    # e5(4) e0(5) -> tiles 1,1,2,2,3,4
    assert out[[1, 4, 2, 3, 5, 0]].tolist() == [1, 1, 2, 2, 3, 4]
    # user 2 sorted: e7(7) e8(8) e6(9) -> tiles 1,2,3
    assert out[[7, 8, 6]].tolist() == [1, 2, 3]


def test_ntile_and_pricing_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "user_value_ntiles", sf_dir, ("events",))
    assert set(a["tile"].unique()) == {1, 2, 3, 4}
    b = _parity(E, "pricing_summary", sf_dir, ("lineitem",))
    assert len(b) == 6 and (b["sum_charge_c"] >= b["sum_disc_c"]).all()
    assert (b["sum_base_c"] >= b["sum_disc_c"]).all()


def test_entity_lift_semantics(ray_session):
    """Hand-built (conv, entity) relation: N=4 convs; pair (a, b)
    co-mentioned once with c(a)=c(b)=2 → lift exactly 10^6
    (independence); pair (x, y) co-occurring both times either
    appears (c=2 each, n12=2) → lift 2×10^6; never-co-mentioned
    pairs are absent."""
    import ray.data as rd

    from jsonld_js_ray.pipelines.kg import LIFT_SCALE, _lift_over_ce

    rows = [  # (conv, entity)
        ("c1", "a"),
        ("c2", "a"), ("c2", "b"),
        ("c3", "b"),
        ("c1", "x"), ("c1", "y"),     # x,y always together
        ("c4", "x"), ("c4", "y"),
    ]
    ce = rd.from_arrow(pa.table({
        "conv": pa.array([r[0] for r in rows], pa.string()),
        "entity": pa.array([r[1] for r in rows], pa.string()),
    }))
    out = _lift_over_ce(ce).to_pandas()
    got = {(r.e1, r.e2): (r.n_both, r.lift) for r in out.itertuples()}
    assert got[("a", "b")] == (1, LIFT_SCALE)
    assert got[("x", "y")] == (2, 2 * LIFT_SCALE)
    # co-mentions in c1: (a,x), (a,y) — present with below-1 lift is
    # impossible here (c(a)=2, c(x)=2, N=4, n12=1 -> exactly 10^6)
    assert got[("a", "x")] == (1, LIFT_SCALE)
    assert ("a", "b") in got and ("b", "x") not in got
    assert len(got) == 4


def test_entity_lift_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "kg_entity_lift", sf_dir, ("events",))
    # 5 mention surfaces -> up to C(5,2)=10 pairs, all present at sf
    assert len(a) == 10
    assert (a["e1"] < a["e2"]).all()
    assert (a["lift"] > 0).all() and (a["n_both"] > 0).all()


def test_shipping_priority_semantics_and_parity(ray_session, sf_dir):
    """Q3 shape: result is exactly the oracle's top-10 by revenue;
    revenue descending; all three filters (segment, order date, ship
    date) are live — relaxing any would change membership."""
    import duckdb

    import __ray_entry__ as E

    a = _parity(E, "shipping_priority", sf_dir,
                ("customer", "orders", "lineitem"))
    assert len(a) == 10
    r = a.sort_values(["revenue_c", "o_orderkey"],
                      ascending=[False, True])["revenue_c"].tolist()
    assert r == sorted(r, reverse=True) and r[0] > 0
    # every result order belongs to a segment customer (filter live)
    con = duckdb.connect()
    seg = con.sql(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet' o "
        f"JOIN '{sf_dir}/customer.parquet' c "
        f"ON o.o_custkey = c.c_custkey "
        f"WHERE c.c_mktsegment <> 'BUILDING' AND o.o_orderkey IN "
        f"({','.join(str(x) for x in a['o_orderkey'])})").fetchone()[0]
    assert seg == 0


def test_communities_lpa_semantics(ray_session):
    """Two stars (hubs a, b with leaves a0..a3 / b0..b3) joined by
    the bridge a—b. Synchronous LPA oscillates on stars, so the exact
    3-round labels are pinned by the DuckDB oracle parity test; here
    we assert the structural invariant that holds regardless of the
    oscillation phase: all leaves of one star receive the SAME label
    each round (they share the one neighbor), so they agree at the
    end."""
    import ray.data as rd

    from jsonld_js_ray.stages.graph import communities_quads

    edges = [("a", f"a{i}") for i in range(4)]
    edges += [("b", f"b{i}") for i in range(4)]
    edges.append(("a", "b"))
    tbl = pa.table({
        "subj": pa.array([e[0] for e in edges], pa.string()),
        "obj_kind": pa.array(["iri"] * len(edges), pa.string()),
        "obj_value": pa.array([e[1] for e in edges], pa.string()),
    })
    out = communities_quads(rd.from_arrow(tbl)).to_pandas() \
        .set_index("node")["community"]
    leavesA = [out[f"a{i}"] for i in range(4)]
    leavesB = [out[f"b{i}"] for i in range(4)]
    assert len(set(leavesA)) == 1 and len(set(leavesB)) == 1
    import pytest

    with pytest.raises(ValueError):
        communities_quads(rd.from_arrow(tbl), iters=0)


def test_communities_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "kg_communities", sf_dir, ("events",))
    assert len(a) > 0
    # the rdf:type class hubs pull nodes into a handful of
    # class-anchored communities — more than one, far fewer than nodes
    assert 1 < a["community"].nunique() < len(a)


def test_user_deltas_semantics_and_parity(ray_session, sf_dir, tmp_path):
    """LAG semantics: first event per user NULL, others the exact
    consecutive difference in (ts, event_id) order; sf parity vs
    DuckDB lag()."""
    import datetime as dt

    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonld_js_ray.stages.rank import user_value_deltas

    tbl = pa.table({
        "event_id": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1, h) for h in
                        (1, 2, 3, 1)], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["view"] * 4, pa.string()),
        "value": pa.array([10.0, 7.5, 12.25, 3.0], pa.float64()),
        "props": pa.array([""] * 4, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = user_value_deltas(str(tmp_path)).to_pandas() \
        .set_index("event_id").sort_index()["delta"]
    assert out.isna().tolist() == [True, False, False, True]
    assert out[1] == -2.5 and out[2] == 4.75
    a = _parity(E, "user_value_deltas", sf_dir, ("events",))
    assert len(a) > 0 and a["delta"].isna().any()


def test_paths_and_transitions_semantics(ray_session, tmp_path):
    """Crafted two-user stream: paths join in exact (ts, event_id)
    order; transitions never cross users; counts sum."""
    import datetime as dt

    import pyarrow.parquet as pq

    from jsonld_js_ray.stages.rank import (
        event_transitions,
        user_event_paths,
    )

    rows = [  # (user, type, hour)
        (1, "signup", 1), (1, "view", 2), (1, "click", 3),
        (1, "view", 4),
        (2, "view", 1), (2, "click", 2),
    ]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1, h) for _, _, h
                        in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, t, _ in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([""] * len(rows), pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    paths = user_event_paths(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert paths.loc[1, "path"] == "signup,view,click,view"
    assert paths.loc[2, "path"] == "view,click"
    assert paths["n_events"].tolist() == [4, 2]
    tr = event_transitions(str(tmp_path)).to_pandas()
    got = {(r.prev_type, r.next_type): r.n for r in tr.itertuples()}
    # user 1: signup->view, view->click, click->view; user 2:
    # view->click — NO view->view bridge between users
    assert got == {("signup", "view"): 1, ("view", "click"): 2,
                   ("click", "view"): 1}


def test_paths_and_transitions_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    import duckdb

    a = _parity(E, "user_event_paths", sf_dir, ("events",))
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"'{sf_dir}/events.parquet'").fetchone()[0]
    assert len(a) == n_users and (a["n_events"] > 0).all()
    b = _parity(E, "event_transitions", sf_dir, ("events",))
    assert b["n"].sum() == a["n_events"].sum() - len(a)


def test_quantiles_cont_semantics_and_parity(ray_session, sf_dir,
                                             tmp_path):
    """Interpolation: user with values [1, 2, 10]: c50 = 2 (exact
    point), c90 = 2*(1-0.8) + 10*0.8 = 8.4; single-value user: both
    quantiles = the value. sf parity vs DuckDB quantile_cont."""
    import datetime as dt

    import pyarrow.parquet as pq

    import __ray_entry__ as E
    from jsonld_js_ray.stages.rank import user_value_quantiles_cont

    vals = [1.0, 2.0, 10.0, 7.0]
    users = [1, 1, 1, 2]
    tbl = pa.table({
        "event_id": pa.array(range(4), pa.int64()),
        "ts": pa.array([dt.datetime(2026, 1, 1)] * 4,
                       pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(["view"] * 4, pa.string()),
        "value": pa.array(vals, pa.float64()),
        "props": pa.array([""] * 4, pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = user_value_quantiles_cont(str(tmp_path)).to_pandas() \
        .set_index("user_id").sort_index()
    assert out.loc[1, "c50"] == 2.0
    assert out.loc[1, "c90"] == 2.0 * (1 - 0.8) + 10.0 * 0.8
    assert out.loc[2, "c50"] == 7.0 and out.loc[2, "c90"] == 7.0
    a = _parity(E, "user_quantiles_cont", sf_dir, ("events",))
    assert len(a) > 0 and (a["c90"] >= a["c50"]).all()


def test_funnel_windowed_semantics(ray_session):
    """The window bites: user 1 completes signup->view->click inside
    7 days but purchases on day 10 -> stage 3 (unwindowed would be 4);
    user 2 completes everything in hours -> 4; the window anchors at
    the FIRST signup."""
    import datetime as dt

    import ray.data as rd

    from jsonld_js_ray.stages.funnel import funnel_stages_windowed

    base = dt.datetime(2026, 1, 1)
    rows = [  # (user, type, day-offset)
        (1, "signup", 0.0), (1, "view", 1.0), (1, "click", 2.0),
        (1, "purchase", 10.0),
        (2, "signup", 0.0), (2, "view", 0.1), (2, "click", 0.2),
        (2, "purchase", 0.3),
    ]
    tbl = pa.table({
        "ts": pa.array([base + dt.timedelta(days=d)
                        for _, _, d in rows], pa.timestamp("us")),
        "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
        "event_type": pa.array([t for _, t, _ in rows], pa.string()),
    })
    out = funnel_stages_windowed(rd.from_arrow(tbl)).to_pandas() \
        .set_index("user_id")["funnel_stage"]
    assert out[1] == 3 and out[2] == 4


def test_funnel_windowed_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "funnel_windowed", sf_dir, ("events",))
    b = _parity(E, "funnel_stages", sf_dir, ("events",))
    m = a.set_index("user_id")["funnel_stage"]
    u = b.set_index("user_id")["funnel_stage"]
    # the window can only reduce depth, and it genuinely does for some
    assert (m <= u.loc[m.index]).all() and (m < u.loc[m.index]).any()


def test_pagerank_weighted_semantics(ray_session):
    """Weight-split messages: hub h links to a (w=3) and b (w=1); a
    receives 3x b's mass from h; with w==1 everywhere the weighted
    kernel is bit-identical to the unweighted one on the same graph."""
    import ray.data as rd

    from jsonld_js_ray.stages.graph import (
        PR_BASE,
        PR_SCALE,
        pagerank_quads,
        pagerank_weighted,
    )

    edges = pa.table({
        "src": pa.array(["h", "h"], pa.string()),
        "dst": pa.array(["a", "b"], pa.string()),
        "w": pa.array([3, 1], pa.int64()),
    })
    out = pagerank_weighted(rd.from_arrow(edges)).to_pandas() \
        .set_index("node")["pagerank"]
    # closed form: h has no in-edges so its score is PR_BASE from
    # round 1 on; in rounds 2..T a/b receive (h_score·w)//4 with
    # h_score = PR_BASE — the FINAL scores are exactly:
    want_a = PR_BASE + (85 * ((PR_BASE * 3) // 4)) // 100
    want_b = PR_BASE + (85 * (PR_BASE // 4)) // 100
    assert out["h"] == PR_BASE
    assert out["a"] == want_a and out["b"] == want_b
    assert out["a"] > out["b"]
    # w==1 equivalence on a small directed graph
    tbl = pa.table({
        "subj": pa.array(["x", "y", "z"], pa.string()),
        "pred": pa.array(["p"] * 3, pa.string()),
        "obj_kind": pa.array(["iri"] * 3, pa.string()),
        "obj_value": pa.array(["y", "z", "x"], pa.string()),
    })
    unw = pagerank_quads(rd.from_arrow(tbl)).to_pandas() \
        .set_index("node")["pagerank"].sort_index()
    ew = pa.table({
        "src": pa.array(["x", "y", "z"], pa.string()),
        "dst": pa.array(["y", "z", "x"], pa.string()),
        "w": pa.array([1, 1, 1], pa.int64()),
    })
    wgt = pagerank_weighted(rd.from_arrow(ew)).to_pandas() \
        .set_index("node")["pagerank"].sort_index()
    assert (unw == wgt).all()


def test_pagerank_weighted_oracle_parity_sf(ray_session, sf_dir):
    import __ray_entry__ as E

    a = _parity(E, "kg_pagerank_weighted", sf_dir, ("events",))
    # bipartite conv <-> entity graph: convs + the 5 entities
    assert len(a) > 5 and a["pagerank"].nunique() > 1


def test_cms_one_sided_bound(ray_session, sf_dir):
    """Count-Min guarantee, asserted exactly (the sketch is
    deterministic given data + seeds): est >= exact for every probe,
    and the overestimate stays within the e/W * N bound."""
    import numpy as np

    import __ray_entry__ as E
    from jsonld_js_ray.pipelines.training_data import _docs
    from jsonld_js_ray.stages.sketches import CMS_W, exact_top_tokens

    import duckdb

    est = E.queries()["cms_token_counts"](sf_dir).to_pandas() \
        .set_index("token")["est_count"]
    cand, exact = exact_top_tokens(_docs(sf_dir), 20)
    assert list(est.index) == cand
    n_total = duckdb.sql(
        rf"SELECT sum(len(regexp_extract_all(lower(coalesce(text, "
        rf"'')), '\S+'))) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    bound = int(np.e / CMS_W * float(n_total)) + 1
    for t in cand:
        assert est[t] >= exact[t]
        assert est[t] - exact[t] <= bound
    # the sketch is TIGHT on this corpus for at least some tokens
    assert (est.to_numpy() == np.array([exact[t] for t in cand])).any()


def test_range_bounds_semantics_and_parity(ray_session, sf_dir):
    """Boundaries are quantiles of the DETERMINISTIC sample (md5 rule
    shared with split/sample), monotone, and hash-exact vs DuckDB."""
    a = _parity(__import__("__ray_entry__"), "range_partition_bounds",
                sf_dir, ("orders",))
    a = a.sort_values("pct")
    assert a["pct"].tolist() == [25, 50, 75]
    assert a["bound"].is_monotonic_increasing
