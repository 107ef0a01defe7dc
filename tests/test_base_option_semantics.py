"""Base-option semantics: key-PRESENCE decides, not truthiness.

Reference behavior (cross-checked against /root/reference via
tests/refharness on 2026-08-19, 36-cell matrix, 0 diffs):

- expand (lib/jsonld.js:319-321): the documentUrl becomes the base ONLY
  when the caller set no ``base`` at all; an explicit null/'' base keeps
  relative IRIs relative (null via url.js:63-66 prependBase short-
  circuit, '' via RFC 3986 resolution against an empty base).
- compact/flatten/frame/toRDF/normalize/createNodeMap default
  ``base = input if isinstance(input, str) else ''`` (_setDefaults legs,
  lib/jsonld.js:142,382,432,570,677,733) — so their INNER expand never
  consults the documentUrl.
- compact with compactToRelative=False DELETES options.base — even an
  explicit null — before expansion (lib/jsonld.js:158-160), so the
  inner expand re-defaults to the documentUrl for URL input.
- merge sets NO base default (lib/jsonld.js:780-785): each per-doc
  expand sees the caller's options verbatim.
"""
import pytest

from jsonld_js_ray import api

DOC = {"@id": "rel", "http://ex.org/p": {"@id": "rel2"},
       "http://ex.org/q": "v"}
URL = "https://host.test/dir/doc.jsonld"
DOCS = {URL: DOC}
CTX = {"ex": "http://ex.org/"}

ABS = "https://host.test/dir/rel"
ABS2 = "https://host.test/dir/rel2"


def _opts(extra=None):
    o = {"documents": DOCS}
    o.update(extra or {})
    return o


@pytest.mark.parametrize("base_extra,want_id", [
    ({}, ABS),                                 # absent -> documentUrl
    ({"base": None}, "rel"),                   # null -> stays relative
    ({"base": ""}, "rel"),                     # '' -> stays relative
    ({"base": "http://b.test/a/x"}, "http://b.test/a/rel"),
])
def test_expand_url_base_matrix(base_extra, want_id):
    out = api.expand(URL, _opts(base_extra))
    assert out[0]["@id"] == want_id


def test_expand_object_base_absent_is_empty_not_docurl():
    out = api.expand(DOC, _opts())
    assert out[0]["@id"] == "rel"


@pytest.mark.parametrize("base_extra,n_quads", [
    ({}, 2),              # absent -> documentUrl absolutizes both
    ({"base": None}, 0),  # null -> relative IRIs drop at RDF conversion
    ({"base": ""}, 0),
])
def test_to_rdf_url_base_matrix(base_extra, n_quads):
    nq = api.to_rdf(URL, _opts({**base_extra,
                                "format": "application/n-quads"}))
    assert len([ln for ln in nq.split("\n") if ln]) == n_quads


def test_compact_url_default_base_relativizes():
    # absent base -> input URL is the base -> expand absolutizes, then
    # compactToRelative relativizes straight back to 'rel'
    out = api.compact(URL, CTX, _opts())
    assert out["@id"] == "rel"
    # and flatten follows the same _setDefaults leg
    flat = api.flatten(URL, CTX, _opts())
    assert flat["@graph"][0]["@id"] == "rel"


def test_compact_no_relative_deletes_base_even_null():
    # ref deletes options.base -> inner expand uses the documentUrl
    for extra in ({}, {"base": None}):
        out = api.compact(URL, CTX, _opts({
            **extra, "compactToRelative": False}))
        assert out["@id"] == ABS
        assert out["ex:p"]["@id"] == ABS2


@pytest.mark.parametrize("lex,want", [
    ("9007199254740993", "9007199254740993"),   # 2^53+1: JS parseInt
    ("9007199254740992", 9007199254740992),     # 2^53: exact in float64
    ("1000000000000000000000", "1000000000000000000000"),  # toFixed
    ("123", 123),                               # goes exponential >=1e21
    ("-0", "-0"), ("+5", "+5"),                 # lexical-form mismatches
])
def test_from_rdf_native_integer_double_precision_gate(lex, want):
    # reference fromRdf.js:318-321 roundtrips through a FLOAT64
    # (parseInt + toFixed(0)); integers that don't survive that trip
    # stay strings (reference-verified 2026-08-19 on all six forms)
    nq = (f'<http://e/s> <http://e/p> "{lex}"'
          '^^<http://www.w3.org/2001/XMLSchema#integer> .')
    out = api.from_rdf(nq, {"useNativeTypes": True,
                            "format": "application/n-quads"})
    assert out[0]["http://e/p"][0]["@value"] == want


def test_produce_generalized_rdf_keeps_bnode_predicates():
    # reference-verified 2026-08-19: produceGeneralizedRdf=true keeps
    # the blank-node predicate quad (toRdf.js drops it otherwise).
    # Pinned here rather than in the W3C-shaped manifest because
    # generalized RDF is not serializable N-Quads — the manifest's
    # canonize-compare (like the reference's test-common) cannot
    # parse a bnode-predicate line.
    doc = {"@id": "http://e/s", "_:bp": {"@id": "http://e/o"}}
    quads = api.to_rdf(doc, {"produceGeneralizedRdf": True})
    assert [(q[0][1], q[1][0], q[1][1], q[2][1]) for q in quads] == \
        [("http://e/s", "BlankNode", "_:b0", "http://e/o")]
    assert api.to_rdf(doc) == []


def test_canonize_input_format_key_presence():
    # ref lib/jsonld.js:577-585: an explicit inputFormat — even null —
    # selects the N-Quads branch, and any non-N-Quads value throws
    # jsonld.CanonizeError (reference-verified 2026-08-19)
    with pytest.raises(api.JsonLdError) as ei:
        api.canonize({"@id": "http://e/x", "http://e/p": "v"},
                     {"inputFormat": None})
    assert "Unknown canonicalization input format" in str(ei.value)
    # absent inputFormat converts JSON-LD to RDF first
    out = api.canonize({"@id": "http://e/x", "http://e/p": "v"})
    assert out == '<http://e/x> <http://e/p> "v" .\n'


def _merged_ids(merged):
    nodes = merged["@graph"] if isinstance(merged, dict) else merged
    return {n.get("@id") for n in nodes}


def test_merge_per_doc_documenturl_base():
    # no caller base -> each URL doc expands against its own documentUrl
    assert ABS in _merged_ids(api.merge([URL], None, _opts()))
    # explicit null base -> relative ids survive into the merge
    assert "rel" in _merged_ids(
        api.merge([URL], None, _opts({"base": None})))
