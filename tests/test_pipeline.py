"""End-to-end Ray pipeline tests at sf0.001 + synthetic transcripts.

Includes the north-star per-row invariant: per-turn text equality under
stable turn ordering (BASELINE.json input_hint), verified by joining the
emitted conv:text quads back to the derived transcript rows on the turn
IRI.
"""

from __future__ import annotations

import json

import pyarrow as pa
import pytest

from jsonld_js_ray.stages.assemble import (
    CONV_ID_NS, CONV_VOCAB, assemble_conversation, turn_iri,
)
from jsonld_js_ray.stages.to_rdf_stage import ToRdfActor


@pytest.fixture(scope="module")
def quads_df(ray_session, sf_dir):
    from jsonld_js_ray.pipelines.kg import build_quads

    return build_quads(sf_dir, concurrency=2).to_pandas()


@pytest.fixture(scope="module")
def transcripts_df(ray_session, sf_dir):
    from jsonld_js_ray.sources.transcripts import read_transcripts

    return read_transcripts(sf_dir).to_pandas()


def test_quads_match_duckdb_oracle(quads_df, sf_dir):
    import duckdb

    from jsonld_js_ray.pipelines.oracle import KG_QUADS_ORACLE_SQL

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    oracle = con.sql(KG_QUADS_ORACLE_SQL).df()
    cols = sorted(quads_df.columns)
    assert sorted(oracle.columns) == cols
    a = quads_df[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_per_turn_text_equality_under_stable_ordering(
        quads_df, transcripts_df):
    """North-star invariant: every turn's text survives the doc-assembly →
    expansion → toRDF path byte-for-byte, addressable by its stable
    (conv_id, turn_idx) ordering."""
    text_quads = quads_df[quads_df["pred"] == CONV_VOCAB + "text"]
    emitted = dict(zip(text_quads["subj"], text_quads["obj_value"]))
    assert len(transcripts_df) == len(text_quads)
    for row in transcripts_df.itertuples():
        iri = turn_iri(row.conv_id, row.turn_idx)
        assert emitted[iri] == row.text
    # stable ordering: position literals equal turn_idx parsed from IRI
    pos = quads_df[quads_df["pred"] == CONV_VOCAB + "position"]
    for subj, val in zip(pos["subj"], pos["obj_value"]):
        assert subj.rsplit("/t/", 1)[1] == val


def test_turn_ordering_is_dense_and_sorted(transcripts_df):
    for _, g in transcripts_df.groupby("conv_id"):
        idx = sorted(g["turn_idx"])
        assert idx == list(range(len(idx)))
        # ts non-decreasing along turn order
        ordered = g.sort_values("turn_idx")["ts"].tolist()
        assert ordered == sorted(ordered)


def test_resume_skips_completed_shards(ray_session, sf_dir, tmp_path):
    from jsonld_js_ray.pipelines.kg import run_kg_pipeline
    from jsonld_js_ray.state.checkpoint import read_manifest

    out = str(tmp_path / "kg-out")
    m1 = run_kg_pipeline(sf_dir, out, concurrency=2)
    assert m1["shards_skipped"] == 0 and m1["quads"] > 0
    manifest = read_manifest(out)
    assert len(manifest) == m1["shards_total"]
    assert all(rec["quads"] > 0 and rec["input_fingerprint"]
               for rec in manifest)
    m2 = run_kg_pipeline(sf_dir, out, concurrency=2)
    assert m2["shards_skipped"] == m2["shards_total"]
    assert m2["quads"] == 0


def test_bnode_labels_conv_scoped_and_canonical():
    """Docs with blank nodes get URDNA2015 labels namespaced per conv —
    globally unique, deterministic, order-insensitive."""
    actor = ToRdfActor()
    doc = {"@context": {"ex": "http://e/"},
           "@id": "http://e/s",
           "ex:p": [{"ex:name": "A"}, {"ex:name": "B"}]}
    q1 = actor.doc_to_quads(doc, "conv-1")
    q2 = actor.doc_to_quads(doc, "conv-2")
    labels1 = {t[1] for q in q1 for t in q if t[0] == "BlankNode"}
    labels2 = {t[1] for q in q2 for t in q if t[0] == "BlankNode"}
    assert labels1 and labels2 and not (labels1 & labels2)
    assert all("-c14n" in l for l in labels1 | labels2)
    # canonical: same labels regardless of sibling order in the input
    doc_rev = dict(doc)
    doc_rev["ex:p"] = list(reversed(doc["ex:p"]))
    assert sorted(actor.doc_to_quads(doc_rev, "conv-1")) == sorted(q1)


def test_assemble_conversation_doc_shape():
    doc = assemble_conversation("c1", [
        {"turn_idx": 0, "role": "user", "text": "hi", "tool": None,
         "ts": "2024-01-01T00:00:00.000000"},
        {"turn_idx": 1, "role": "assistant", "text": "hello", "tool": "x",
         "ts": "2024-01-01T00:01:00.000000"},
    ], {1: ["https://w3id.org/conv/entity/hello"]})
    assert doc["@id"] == CONV_ID_NS + "c1"
    assert doc["turnCount"] == 2
    assert "tool" not in doc["hasTurn"][0]
    assert doc["hasTurn"][1]["tool"] == "x"
    assert doc["hasTurn"][1]["mentions"] == [
        "https://w3id.org/conv/entity/hello"]
    # assembled doc is valid JSON-LD that round-trips through expansion
    import jsonld_js_ray as jl
    expanded = jl.expand(json.loads(json.dumps(doc)))
    assert expanded[0]["@type"] == [CONV_VOCAB + "Conversation"]


def test_mentions_and_entity_canonicalization(ray_session):
    import ray.data as rd

    from jsonld_js_ray.stages.entity_merge import (
        build_canonical_mapping, canonicalize_entities, jaccard,
    )
    from jsonld_js_ray.stages.linker import detect_mentions

    tbl = pa.table({
        "conv_id": pa.array(["c1", "c1", "c2"], pa.string()),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "text": pa.array(["Click the click button", "errors happened",
                          "error in clicks"], pa.large_string()),
    })
    mentions = detect_mentions(rd.from_arrow(tbl), concurrency=1)
    out = canonicalize_entities(mentions).to_pandas()
    by_surface = dict(zip(out["surface"], out["canonical"]))
    # near-dup merge: plural folds onto singular (3-gram jaccard >= 0.6)
    assert jaccard("click", "clicks") >= 0.6
    assert by_surface["clicks"] == "click"
    assert by_surface["errors"] == "error"
    assert by_surface["click"] == "click"
    # counts survived the salted two-phase aggregation
    assert int(out[out["surface"] == "click"]["n_mentions"].iloc[0]) == 2
    # mapping is idempotent + deterministic
    m = build_canonical_mapping(sorted(by_surface))
    assert m == {s: by_surface[s] for s in m}


def test_mention_quads_match_oracle(ray_session, sf_dir):
    import duckdb

    from jsonld_js_ray.pipelines.kg import build_quads_with_mentions
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )

    mine = build_quads_with_mentions(sf_dir, concurrency=2).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    oracle = con.sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = oracle[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_synthetic_transcripts_deterministic():
    from jsonld_js_ray.sources.transcripts import synthesize_transcripts

    t1 = synthesize_transcripts(n_convs=5, seed=3)
    t2 = synthesize_transcripts(n_convs=5, seed=3)
    assert t1.equals(t2)
    assert t1.schema.field("turn_idx").type == pa.int32()


def test_roundtrip_quads_equal_flagship(ray_session, sf_dir):
    from jsonld_js_ray.pipelines.kg import build_quads, roundtrip_quads

    cols = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
            "obj_lang", "graph", "conv_id"]
    a = build_quads(sf_dir).to_pandas()[cols].sort_values(cols) \
        .reset_index(drop=True)
    b = roundtrip_quads(sf_dir).to_pandas()[cols].sort_values(cols) \
        .reset_index(drop=True)
    assert a.equals(b)


def test_nquads_io_roundtrip(ray_session, sf_dir, tmp_path):
    from jsonld_js_ray.pipelines.kg import build_quads
    from jsonld_js_ray.sources.nquads_io import read_nquads, write_nquads

    out = str(tmp_path / "nq")
    res = write_nquads(build_quads(sf_dir), out)   # eager; returns manifest
    assert res["rows"].sum() == 8030
    back = read_nquads(out).to_pandas()
    assert len(back) == 8030
    orig = build_quads(sf_dir).to_pandas()
    cols = ["subj", "pred", "obj_kind", "obj_value", "graph"]
    a = orig[cols].sort_values(cols).reset_index(drop=True)
    b = back[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_salted_aggregation_correct_under_hot_key(ray_session):
    """Skew test (SURVEY.md §7.4.5): one surface form covering ~90% of a
    large mention stream must aggregate exactly through the salted
    two-phase path (no reducer sees the hot key's full stream)."""
    import pyarrow as pa
    import ray.data as rd

    from jsonld_js_ray.stages.entity_merge import surface_stats

    n_hot, n_cold = 90_000, 10_000
    tbl = pa.table({
        "conv_id": pa.array([f"c{i % 997}" for i in range(n_hot + n_cold)],
                            pa.string()),
        "surface": pa.array(["hotkey"] * n_hot
                            + [f"cold{i % 50}" for i in range(n_cold)],
                            pa.string()),
    })
    out = surface_stats(rd.from_arrow(tbl), num_salts=16).to_pandas()
    by_surface = dict(zip(out["surface"], out["n_mentions"]))
    assert by_surface["hotkey"] == n_hot
    assert sum(by_surface.values()) == n_hot + n_cold
    assert len(by_surface) == 51


def test_canonical_mapping_flows_into_mention_iris(ray_session, sf_dir):
    """End-to-end entity canonicalization: the min-hash mapping broadcast
    into the fused assemble stage rewrites mention IRIs."""
    from jsonld_js_ray.pipelines.kg import build_quads_with_mentions
    from jsonld_js_ray.stages.assemble import CONV_VOCAB, ENTITY_NS

    mapping = {"click": "CANON", "error": "CANON"}
    quads = build_quads_with_mentions(
        sf_dir, canonical_mapping=mapping).to_pandas()
    mentions = quads[quads["pred"] == CONV_VOCAB + "mentions"]
    objs = set(mentions["obj_value"])
    assert ENTITY_NS + "CANON" in objs
    assert ENTITY_NS + "click" not in objs
    assert ENTITY_NS + "error" not in objs


def test_full_pipeline_with_entity_canonicalization(
        ray_session, sf_dir, tmp_path):
    """North-star end-to-end: min-hash entity mapping (phase 1, itself
    checkpointed) → mention-linked canonical quads → sharded sink →
    resume skips everything."""
    import json
    import os

    from jsonld_js_ray.pipelines.kg import run_full_kg_pipeline
    from jsonld_js_ray.stages.assemble import CONV_VOCAB

    out = str(tmp_path / "full")
    m1 = run_full_kg_pipeline(sf_dir, out)
    assert m1["quads"] > 8030          # flagship + mention triples
    assert m1["entities"] >= m1["canonical_entities"] > 0
    assert os.path.exists(os.path.join(out, "_entity_mapping.json"))
    with open(os.path.join(out, "_entity_mapping.json")) as f:
        rec = json.load(f)
    assert rec["mapping"]
    # all mention IRIs in the output use canonical surfaces
    import pyarrow.parquet as pq
    import glob as _glob
    files = _glob.glob(os.path.join(out, "shard=*", "*.parquet"))
    assert files
    tbl = pq.read_table(files[0])
    df = tbl.to_pandas()
    mentions = df[df["pred"] == CONV_VOCAB + "mentions"]["obj_value"]
    canon = set(rec["mapping"].values())
    for iri in mentions:
        assert iri.rsplit("/", 1)[1] in canon

    m2 = run_full_kg_pipeline(sf_dir, out)
    assert m2["shards_skipped"] == m2["shards_total"]
    assert m2["quads"] == 0


def test_giant_conversation_chunking_same_triple_set():
    """SURVEY §7.4.6: chunked assembly of an over-cap conversation emits
    exactly the unchunked triple set (conv metadata once)."""
    import json

    from jsonld_js_ray.stages.assemble import assembled_doc_rows
    from jsonld_js_ray.stages.to_rdf_stage import ToRdfActor

    turns = [{"turn_idx": i, "role": "user", "text": f"t{i}",
              "tool": None, "ts": "2024-01-01T00:00:00.000000"}
             for i in range(25)]
    actor = ToRdfActor()

    def quads_for(rows_tbl):
        out = set()
        for dj in rows_tbl["doc_json"].to_pylist():
            out |= set(actor.doc_to_quads(json.loads(dj), "c1"))
        return out

    whole = assembled_doc_rows("c1", turns, max_turns_per_doc=10_000)
    chunked = assembled_doc_rows("c1", turns, max_turns_per_doc=7)
    assert whole.num_rows == 1 and chunked.num_rows == 4
    assert quads_for(whole) == quads_for(chunked)
    # turnCount appears exactly once and carries the TOTAL
    docs = [json.loads(d) for d in chunked["doc_json"].to_pylist()]
    counts = [d.get("turnCount") for d in docs if "turnCount" in d]
    assert counts == [25]


def test_list_variant_flagship_bnode_chains(ray_session, sf_dir):
    """Bnode-heavy variant: turns as an rdf:List (@list container) —
    exercises cons-chain generation + URDNA2015 + conv namespacing on
    real corpus data, cross-checked against the reference per document."""
    import json
    import os
    import shutil
    import subprocess

    import pytest as _pytest

    from jsonld_js_ray.core import canonize as cz
    from jsonld_js_ray.pipelines.kg import assemble_docs
    from jsonld_js_ray.stages.to_rdf_stage import ToRdfActor

    doc_rows = assemble_docs(sf_dir).to_pandas().head(5)
    actor = ToRdfActor(namespace_bnodes=False)

    list_docs = []
    for doc_json in doc_rows["doc_json"]:
        doc = json.loads(doc_json)
        doc["@context"]["turnList"] = {"@id": "https://w3id.org/conv#turnList",
                                       "@container": "@list"}
        doc["turnList"] = [t["@id"] for t in doc["hasTurn"]]
        list_docs.append(doc)

    engine_sets = []
    for conv_id, doc in zip(doc_rows["conv_id"], list_docs):
        quads = actor.doc_to_quads(json.loads(json.dumps(doc)), conv_id)
        n_bnodes = len({t[1] for q in quads for t in q
                        if t and t[0] == "BlankNode"})
        assert n_bnodes == len(doc["turnList"])   # one cons cell per item
        engine_sets.append(set(cz.canonize(quads).split("\n")))

    if shutil.which("node") is None or \
            not os.path.isdir("/root/reference/lib"):
        _pytest.skip("reference oracle unavailable")
    harness = os.path.join(os.path.dirname(__file__), "refharness")
    lines = "\n".join(json.dumps({"op": "toRdf", "input": d})
                      for d in list_docs)
    proc = subprocess.run(
        ["node", os.path.join(harness, "ref_run.js")], input=lines,
        capture_output=True, text=True, timeout=300,
        env={**os.environ,
             "NODE_PATH": os.path.join(harness, "node_modules")})
    assert proc.returncode == 0, proc.stderr

    def term(t):
        if t["termType"] == "Literal":
            return ("Literal", t["value"], t["datatype"]["value"],
                    t.get("language") or None)
        return (t["termType"], t.get("value", ""))

    for i, line in enumerate(proc.stdout.strip().split("\n")):
        rec = json.loads(line)
        assert rec["ok"], rec
        ref_quads = [(term(q["subject"]), term(q["predicate"]),
                      term(q["object"]), term(q["graph"]))
                     for q in rec["result"]]
        assert set(cz.canonize(ref_quads).split("\n")) == engine_sets[i]


def test_distributed_merge_matches_oracle(ray_session, sf_dir):
    import duckdb

    import __ray_entry__ as E

    mine = E.queries()["kg_merged_node_props"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(E.oracle_sql()["kg_merged_node_props"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_label_propagation_chain_cluster(ray_session):
    """Chain A—B—C where A,C are NOT direct near-dups: distributed
    min-label propagation must still fold the whole chain onto A
    (needs >1 round — exercises the convergence loop)."""
    import ray.data as rd

    from jsonld_js_ray.stages.entity_merge import (
        build_canonical_mapping, canonicalize_entities, jaccard,
    )

    # sliding 10-char windows shifted by 1: consecutive Jaccard 0.78,
    # chain-end Jaccard 0.45 — a true multi-hop chain
    chain = ["abcdefghij", "bcdefghijk", "cdefghijkl", "defghijklm"]
    surfs = chain * 2 + ["gamma"] * 4 + ["zzzyyyxxx"] * 2
    m = rd.from_arrow(pa.table({
        "surface": pa.array(surfs, pa.string()),
        "conv_id": pa.array([f"c{i}" for i in range(len(surfs))],
                            pa.string()),
    }))
    out = canonicalize_entities(m, threshold=0.6).to_pandas()
    by = dict(zip(out["surface"], out["canonical"]))
    for s in chain:
        assert by[s] == "abcdefghij", by
    assert by["gamma"] == "gamma"
    assert by["zzzyyyxxx"] == "zzzyyyxxx"
    # the distributed path agrees with the driver-side broadcast helper
    mapping = build_canonical_mapping(sorted(set(surfs)), 0.6)
    assert mapping == by
    # chain ends really are not direct near-dups (propagation mattered)
    assert jaccard(chain[0], chain[-1]) < 0.6
    assert jaccard(chain[0], chain[1]) >= 0.6


def test_entities_canonical_planted_oracle(ray_session, sf_dir):
    """Construction-based oracle: planted surface||'s' variants merge
    onto their base; everything else is identity."""
    import duckdb

    from jsonld_js_ray.sources.transcripts import read_transcripts
    from jsonld_js_ray.stages.entity_merge import (
        _entities_canonical_planted_sql, canonicalize_entities_planted,
    )
    from jsonld_js_ray.stages.linker import detect_mentions

    mine = canonicalize_entities_planted(
        detect_mentions(read_transcripts(sf_dir))).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(_entities_canonical_planted_sql()).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_conv_entity_mentions_matches_oracle(ray_session, sf_dir):
    """2-hop BGP join (?conv hasTurn ?turn . ?turn mentions ?entity)
    over the quad stream equals the SQL self-join oracle."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as E

    mine = E.queries()["kg_conv_entity_mentions"](sf_dir).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_dir}/events.parquet'")
    orc = con.sql(E.oracle_sql()["kg_conv_entity_mentions"]).df()
    cols = sorted(mine.columns)
    a = mine[cols].sort_values(cols).reset_index(drop=True)
    b = orc[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))
    assert len(a) > 0
