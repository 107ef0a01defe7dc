"""Newline-delimited JSON-LD connector: write→read round trip,
identity derivation, and the single-line guard."""

import json
import os
import shutil

import pyarrow as pa
import pytest

from jsonld_js_ray.sources.jsonld_lines import (
    _conv_id_of,
    build_quads_from_jsonld_lines,
    docs_to_lines,
    read_docs_jsonld_lines,
    write_docs_jsonld_lines,
)
from jsonld_js_ray.stages.assemble import CONV_ID_NS

SF_DIR = "/root/testdata/sf0.001"
OUT = "/tmp/test_jsonld_lines"


@pytest.fixture(scope="module")
def roundtrip(ray_session):
    from jsonld_js_ray.pipelines.kg import assemble_docs

    shutil.rmtree(OUT, ignore_errors=True)
    docs = assemble_docs(SF_DIR).materialize()
    manifest = write_docs_jsonld_lines(docs, OUT)
    return docs, manifest


def test_write_manifest_counts(roundtrip):
    docs, manifest = roundtrip
    assert manifest["docs"].sum() == docs.count()
    for p in manifest["path"]:
        assert os.path.exists(p) and p.endswith(".jsonl")
    # no stray tmp files left behind
    assert not [f for f in os.listdir(OUT) if f.endswith(".tmp")]


def test_lines_are_plain_jsonld(roundtrip):
    _, manifest = roundtrip
    with open(manifest["path"].iloc[0], encoding="utf-8") as f:
        line = f.readline().rstrip("\n")
    doc = json.loads(line)
    # a PLAIN document — context + node, no envelope keys
    assert "@context" in doc and doc["@id"].startswith(CONV_ID_NS)


def test_read_recovers_documents_exactly(roundtrip):
    docs, _ = roundtrip
    back = read_docs_jsonld_lines(OUT).to_pandas()
    orig = docs.to_pandas()
    assert sorted(back["conv_id"]) == sorted(orig["conv_id"])
    by_id = dict(zip(back["conv_id"], back["doc_json"]))
    for cid, dj in zip(orig["conv_id"], orig["doc_json"]):
        assert json.loads(by_id[cid]) == json.loads(dj)


def test_quads_match_parquet_path(roundtrip, ray_session):
    from jsonld_js_ray.pipelines.kg import build_quads

    via_jsonl = build_quads_from_jsonld_lines(OUT).to_pandas()
    via_parquet = build_quads(SF_DIR).to_pandas()
    cols = sorted(via_jsonl.columns)
    assert cols == sorted(via_parquet.columns)
    a = via_jsonl[cols].sort_values(cols).reset_index(drop=True)
    b = via_parquet[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_foreign_doc_fallback_id():
    doc = {"@context": {"name": "http://schema.org/name"},
           "@id": "http://other.example/x", "name": "a"}
    line = json.dumps(doc)
    cid = _conv_id_of(doc, line)
    assert cid.startswith("doc-") and len(cid) == 20
    # deterministic
    assert cid == _conv_id_of(doc, line)


def test_multiline_doc_json_guard():
    # a foreign doc_json value with a literal newline must still land
    # on one physical line
    raw = "{\n  \"@id\": \"http://e/x\"\n}"
    out = docs_to_lines(pa.table({"doc_json": pa.array([raw])}))
    line = out["line"][0].as_py()
    assert "\n" not in line and json.loads(line) == json.loads(raw)
