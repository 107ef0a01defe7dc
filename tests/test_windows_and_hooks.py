"""Tests: windowed aggregates, expansionMap hook, link, load_document."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import jsonld_js_ray as jl
from jsonld_js_ray.api import load_document
from jsonld_js_ray.core.errors import JsonLdError


def _events_table():
    base = 1_700_000_000_000_000  # µs
    rows = [
        # user 1: two events in one hour, one in the next
        (1, base + 10 * 60_000_000, 10.00),
        (1, base + 20 * 60_000_000, 5.50),
        (1, base + 70 * 60_000_000, 1.25),
        # user 2: single event; session gap test: far-later second event
        (2, base, 99.99),
        (2, base + 10_000 * 60_000_000, 0.01),
    ]
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })


def test_tumbling_window(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.windows import tumbling_window

    out = tumbling_window(rd.from_arrow(_events_table())).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("window_id")
    assert list(u1["n_events"]) == [2, 1]
    assert list(u1["sum_cents"]) == [1550, 125]
    assert list(u1["min_cents"]) == [550, 125]
    assert list(u1["max_cents"]) == [1000, 125]


def test_sliding_window_covers_each_event_twice(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.windows import sliding_window

    out = sliding_window(rd.from_arrow(_events_table()),
                         width_s=3600, slide_s=1800).to_pandas()
    assert out["n_events"].sum() == 2 * 5


def test_session_window_gap_split(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.windows import session_window

    out = session_window(rd.from_arrow(_events_table()),
                         gap_s=1800).to_pandas()
    by_user = out.groupby("user_id").size().to_dict()
    assert by_user[1] == 2          # 10,20 | 70 min → two sessions
    assert by_user[2] == 2          # huge gap → two sessions
    u1 = out[out["user_id"] == 1].sort_values("session_idx")
    assert list(u1["n_events"]) == [2, 1]


def test_expansion_map_hook_surfaces():
    seen = []

    def hook(info):
        seen.append(info)
        if "unmappedProperty" in info:
            return "http://hook.example/" + info["unmappedProperty"]
        return None

    out = jl.expand(
        {"@context": {"ex": "http://e/"}, "@id": "http://e/s",
         "oops": "v", "ex:p": None},
        {"expansionMap": hook})
    assert "http://hook.example/oops" in out[0]
    # every firing is one of the reference's info shapes
    site_keys = ("unmappedProperty", "unmappedValue", "prependedIri",
                 "relativeIri")
    assert all(any(k in i for k in site_keys) for i in seen)
    assert any("unmappedProperty" in i for i in seen)
    assert any("unmappedValue" in i for i in seen)
    # default behavior unchanged without hook
    out2 = jl.expand({"@context": {"ex": "http://e/"}, "@id": "http://e/s",
                      "oops": "v", "ex:kept": "w"})
    assert list(out2[0].keys()) == ["@id", "http://e/kept"]


def test_link_shares_nodes_in_memory():
    doc = {
        "@context": {"ex": "http://e/", "knows": {"@id": "http://e/knows",
                                                  "@type": "@id"}},
        "@graph": [
            {"@id": "http://e/a", "knows": "http://e/b"},
            {"@id": "http://e/b", "ex:name": "B"},
        ],
    }
    linked = jl.link(doc, {"ex": "http://e/"})
    graph = linked.get("@graph", [linked])
    nodes = {n.get("@id"): n for n in graph if isinstance(n, dict)}
    a = nodes["ex:a"]
    embedded_b = a["ex:knows"]
    # @embed:@link embeds the full node under the reference
    assert embedded_b["@id"] == "ex:b" and embedded_b["ex:name"] == "B"


def test_load_document_surface():
    docs = {"http://x.example/d": {"@context": {}, "@id": "http://x/1"}}
    rec = load_document("http://x.example/d", {"documents": docs})
    assert rec["document"]["@id"] == "http://x/1"

    def loader(url):
        return {"document": {"loaded": url}}

    rec2 = load_document("http://y.example/", {"documentLoader": loader})
    assert rec2["document"] == {"loaded": "http://y.example/"}
    assert rec2["documentUrl"] == "http://y.example/"

    # reference contract: a dict return is ALWAYS a record — one
    # without 'document' is malformed, never silently a raw doc
    def bad_loader(url):
        return {"loaded": url}

    with pytest.raises(JsonLdError) as e:
        load_document("http://y.example/", {"documentLoader": bad_loader})
    assert e.value.code == "loading document failed"

    with pytest.raises(JsonLdError) as e:
        load_document("http://nope.example/")
    assert e.value.code == "loading document failed"


def test_window_tumbling_matches_oracle_sf(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from jsonld_js_ray.stages.windows import (
        TUMBLING_WINDOW_SQL, tumbling_window,
    )

    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["ts", "user_id", "value"])
    mine = tumbling_window(events).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(TUMBLING_WINDOW_SQL).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_compaction_map_hook():
    import jsonld_js_ray as jl

    seen = []

    def hook(info):
        seen.append(info["unmappedValue"])
        return {"rescued": True}

    # a null compaction result arises from e.g. None items post-framing;
    # simulate via skipExpansion with a None element in the array
    out = jl.compact([None, {"@id": "http://e/s"}], {"ex": "http://e/"},
                     {"skipExpansion": True, "compactionMap": hook})
    assert {"rescued": True} in out["@graph"]
    assert seen == [None]


# --- expansionMap call-site parity (reference tests/misc.js:482-1008) ---

def _expand_collecting(doc, collect_key):
    import jsonld_js_ray as jl

    seen = []

    def hook(info):
        if collect_key in info:
            seen.append(info[collect_key])

    out = jl.expand(doc, {"expansionMap": hook})
    return out, seen


def test_expansion_map_unmapped_property_flat_and_nested():
    doc = {"@context": {"definedTerm": "https://example.com#definedTerm"},
           "definedTerm": "is defined", "testUndefined": "is undefined"}
    _, seen = _expand_collecting(doc, "unmappedProperty")
    assert "testUndefined" in seen

    nested = {"@context": {"definedTerm": "https://example.com#d"},
              "definedTerm": {"testUndefined": "is undefined"}}
    _, seen = _expand_collecting(nested, "unmappedProperty")
    assert "testUndefined" in seen


def test_expansion_map_relative_iri_sites():
    # @id term (misc.js:529) + nested (misc.js:550)
    doc = {"@context": {"definedTerm": "https://example.com#d"},
           "@id": "relativeiri", "definedTerm": "is defined"}
    _, seen = _expand_collecting(doc, "relativeIri")
    assert "relativeiri" in seen

    nested = {"@context": {"definedTerm": "https://example.com#d"},
              "@id": "urn:absoluteIri",
              "definedTerm": {"@id": "relativeiri"}}
    _, seen = _expand_collecting(nested, "relativeIri")
    assert "relativeiri" in seen

    # @type term (misc.js:595)
    tdoc = {"@context": {"definedTerm": "https://example.com#d"},
            "@id": "urn:x", "@type": "relativeiri"}
    _, seen = _expand_collecting(tdoc, "relativeIri")
    assert "relativeiri" in seen
    # typeExpansion flag is set on the @type path
    import jsonld_js_ray as jl

    flags = []
    jl.expand(tdoc, {"expansionMap": lambda info: flags.append(
        info.get("typeExpansion")) if "relativeIri" in info else None})
    assert True in flags


def test_expansion_map_prepended_iri_vocab_and_base():
    import jsonld_js_ray as jl

    vdoc = {"@context": {"@vocab": "http://v/"},
            "@id": "urn:x", "@type": "t", "http://v/p": "v"}
    infos = []
    jl.expand(vdoc, {"expansionMap": lambda info: infos.append(
        info["prependedIri"]) if "prependedIri" in info else None})
    vocab_hits = [i for i in infos if i["type"] == "@vocab"]
    assert any(i["value"] == "t" and i["result"] == "http://v/t"
               and i["typeExpansion"] for i in vocab_hits)

    bdoc = {"@context": {"@base": "http://b/"}, "@id": "x",
            "http://e/p": "v"}
    infos = []
    jl.expand(bdoc, {"expansionMap": lambda info: infos.append(
        info["prependedIri"]) if "prependedIri" in info else None})
    base_hits = [i for i in infos if i["type"] == "@base"]
    assert any(i["value"] == "x" and i["result"] == "http://b/x"
               for i in base_hits)


def test_expansion_map_array_element_drop_site():
    """Only-@language objects expand to null; inside an array the hook
    fires with parent/index and can resurrect the element."""
    import jsonld_js_ray as jl

    doc = {"@context": {"p": "http://e/p"},
           "p": [{"@language": "en"}, "kept"]}
    infos = []

    def hook(info):
        infos.append(info)

    jl.expand(doc, {"expansionMap": hook})
    arr_sites = [i for i in infos if "index" in i and "parent" in i]
    assert arr_sites, infos

    # resurrect: a returned mapping replaces the dropped element
    def rescue(info):
        if "index" in info:
            return {"@value": "rescued"}

    out = jl.expand(doc, {"expansionMap": rescue})
    vals = out[0]["http://e/p"]
    assert {"@value": "rescued"} in vals


def test_expansion_map_null_value_site():
    import jsonld_js_ray as jl

    doc = {"@context": {"p": "http://e/p"}, "@id": "urn:s", "p": None}
    infos = []
    jl.expand(doc, {"expansionMap": lambda i: infos.append(i)})
    assert any(i.get("expandedProperty") == "http://e/p"
               and i.get("key") == "p" for i in infos)


def test_expansion_map_info_carries_ctx_and_options():
    import jsonld_js_ray as jl

    doc = {"@context": {"d": "https://example.com#d"},
           "d": "x", "und": "y"}
    infos = []
    jl.expand(doc, {"expansionMap": lambda i: infos.append(i)})
    site = [i for i in infos if i.get("unmappedProperty") == "und"][0]
    assert "activeCtx" in site and "options" in site
    assert "parent" in site and "expandedParent" in site


def test_window_distinct_users_exact_matches_oracle(ray_session, sf_dir):
    import duckdb
    import ray.data as rd

    from jsonld_js_ray.stages.sketches import (
        WINDOW_DISTINCT_USERS_SQL, exact_distinct_users_per_window,
    )

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])
    mine = exact_distinct_users_per_window(ev).to_pandas() \
        .sort_values("window_id").reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(WINDOW_DISTINCT_USERS_SQL).df() \
        .sort_values("window_id").reset_index(drop=True)
    assert mine.equals(orc.astype(mine.dtypes.to_dict()))


def test_hll_error_bound_large_cardinality(ray_session):
    """HLL at p=12 has std error ≈ 1.6%; assert < 5% relative error for
    a 50k-distinct window and exactness-by-linear-counting for tiny
    windows (plus determinism)."""
    import ray.data as rd

    from jsonld_js_ray.stages.sketches import (
        hll_distinct_users_per_window,
    )

    n_big = 50_000
    ts_big = pa.array([1_700_000_000_000_000] * n_big,
                      pa.timestamp("us"))
    users_big = pa.array(range(n_big), pa.int64())
    # second window: 5 distinct users, repeated
    ts_small = pa.array([1_700_010_000_000_000] * 50, pa.timestamp("us"))
    users_small = pa.array([i % 5 for i in range(50)], pa.int64())
    tbl = pa.table({
        "ts": pa.concat_arrays([ts_big, ts_small]),
        "user_id": pa.concat_arrays([users_big, users_small]),
    })
    out = hll_distinct_users_per_window(
        rd.from_arrow(tbl)).to_pandas().set_index("window_id")
    big_win = 1_700_000_000 // 3600
    small_win = 1_700_010_000 // 3600
    est = out.loc[big_win, "n_users_hll"]
    assert abs(est - n_big) / n_big < 0.05, est
    assert out.loc[small_win, "n_users_hll"] == 5
    out2 = hll_distinct_users_per_window(
        rd.from_arrow(tbl)).to_pandas().set_index("window_id")
    assert out.equals(out2)


def test_rank_operators_match_oracle(ray_session, sf_dir):
    import duckdb

    from jsonld_js_ray.stages.rank import (
        TOP_EVENTS_SQL, USER_QUANTILES_SQL, top_events_per_user,
        user_value_quantiles,
    )

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    for fn, sql in ((user_value_quantiles, USER_QUANTILES_SQL),
                    (top_events_per_user, TOP_EVENTS_SQL)):
        mine = fn(sf_dir).to_pandas()
        orc = con.sql(sql).df()
        cols = sorted(mine.columns)
        a = mine[cols].sort_values(cols).reset_index(drop=True)
        b = orc[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b.astype(a.dtypes.to_dict())), fn.__name__


def test_quantiles_ignore_nulls(ray_session, tmp_path):
    import pandas as pd
    import pyarrow.parquet as pq

    df = pd.DataFrame({
        "event_id": range(6),
        "user_id": [1, 1, 1, 2, 2, 3],
        "ts": pd.to_datetime(["2026-01-01"] * 6),
        "event_type": ["click"] * 6,
        "value": [1.0, None, 3.0, 5.0, 7.0, None],
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   d / "events.parquet")
    from jsonld_js_ray.stages.rank import user_value_quantiles

    out = user_value_quantiles(str(d)).to_pandas().set_index("user_id")
    # user 1: values [1,3] (NULL ignored) → p50 = 1.0 (ceil(.5*2)=1)
    assert out.loc[1, "p50"] == 1.0 and out.loc[1, "p95"] == 3.0
    assert out.loc[2, "p50"] == 5.0
    # user 3: all NULL → row present with NULL quantiles
    assert 3 in out.index and pd.isna(out.loc[3, "p50"])


def test_hll_pre_epoch_window_assignment(ray_session):
    """Pre-epoch fractional-second timestamps must floor to the
    previous window, matching floor(epoch/3600)."""
    import ray.data as rd

    from jsonld_js_ray.stages.sketches import (
        exact_distinct_users_per_window,
    )

    tbl = pa.table({
        "ts": pa.array([-500_000], pa.timestamp("us")),  # 1969-12-31
        "user_id": pa.array([1], pa.int64()),
    })
    out = exact_distinct_users_per_window(
        rd.from_arrow(tbl)).to_pandas()
    assert list(out["window_id"]) == [-1]
