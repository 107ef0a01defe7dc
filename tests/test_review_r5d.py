"""Fourth-sitting findings: crashes/divergences surfaced by the
round-5 chains and dual probes, each reference-verified before
pinning."""
import json

from jsonld_js_ray import api

import pytest


@pytest.mark.parametrize("v,lex", [
    (9007199254740993, "9007199254740992"),   # 2^53+1 rounds in float64
    (9007199254740992, "9007199254740992"),
    (123, "123"),
    (10**20, "100000000000000000000"),        # exact in float64
    (10**20 + 1, "100000000000000000000"),    # rounds to the same
    (-9007199254740995, "-9007199254740996"),
])
def test_to_rdf_integer_float64_lexical_parity(v, lex):
    # toRdf.js:245 serializes the integer branch with toFixed(0) on a
    # float64 (a JS engine can't hold 2^53+1 — JSON.parse rounds it),
    # so Python bigints must round identically (reference-verified
    # 2026-08-19 on all six values)
    nq = api.to_rdf({"@id": "http://e/s", "http://e/p": v},
                    {"format": "application/n-quads"})
    assert f'"{lex}"' in nq


@pytest.mark.parametrize("lex,want", [
    ("0x10", 0.0),        # Number('0x10')=16 finite -> parseFloat = 0
    ("0b101", 0.0),
    ("0o17", 0.0),
    (" 0x10 ", 0.0),      # Number() trims whitespace first
    ("1e310", "1e310"),   # overflow -> isFinite fails -> string
    ("-1e310", "-1e310"),
    ("1e3", 1000.0),
    ("1.", 1.0),
    ("5abc", "5abc"),     # Number('5abc') is NaN -> string
    ("1_0", "1_0"),       # JS Number rejects numeric separators
    ("0x-2f", "0x-2f"),   # ES radix grammar: bare digits only — no
    ("0x2_f", "0x2_f"),   # sign/underscore (Python int(s,16) takes
    ("0x", "0x"),         # both); empty body is NaN too
])
def test_from_rdf_native_double_js_numeric_gate(lex, want):
    # isNumeric (types.js:64) is !isNaN(parseFloat(v)) && isFinite(v):
    # parseFloat takes the longest numeric PREFIX while isFinite
    # coerces the WHOLE string through Number() — so radix-prefixed
    # forms convert to parseFloat's 0, overflow forms stay strings
    # (reference-verified 2026-08-19 on all ten forms + 12 more)
    q = [(("NamedNode", "http://e/s"), ("NamedNode", "http://e/p"),
          ("Literal", lex, "http://www.w3.org/2001/XMLSchema#double",
           None), ("DefaultGraph", ""))]
    out = api.from_rdf(q, {"useNativeTypes": True})
    assert out[0]["http://e/p"][0]["@value"] == want


@pytest.mark.parametrize("v,want", [
    (9007199254740993, "9007199254740992"),   # float64 rounds 2^53+1
    (10**21, "1e+21"),                        # ES exponent threshold
    (10**21 + 1, "1e+21"),
    (-9007199254740995, "-9007199254740996"),
    (10**25, "1e+25"),
    (123, "123"),
])
def test_jcs_bigint_es_number_parity(v, want):
    # RFC 8785 numbers are ES Number::toString — float64 by
    # definition; a Python bigint must round through it (reference-
    # verified 2026-08-19 on all six values via JSON.stringify)
    from jsonld_js_ray.core.jcs import canonicalize
    assert canonicalize(v) == want


@pytest.mark.parametrize("v,lex", [
    (5e-324, "4.940656458412465E-324"),          # smallest denormal
    (2.2250738585072014e-308, "2.225073858507201E-308"),
    (1.7976931348623157e308, "1.797693134862316E308"),
    (-0.0, "0.0E0"),                             # (-0).toExponential
    (0.1 + 0.2, "3.0E-1"),
    (1 / 3, "3.333333333333333E-1"),
    (123456789.123456789, "1.234567891234568E8"),
    (1e-7, "1.0E-7"),
    (9.99999999999999e22, "9.999999999999991E22"),
])
def test_to_rdf_double_canonical_edges(v, lex):
    # toRdf.js:242 toExponential(15) canonical form, reference-verified
    # 2026-08-19 on all nine edge doubles (denormal, DBL_MIN/MAX, -0,
    # repeating fractions, 17-digit rounding)
    nq = api.to_rdf(
        {"@id": "http://e/s",
         "http://e/p": {"@value": v,
                        "@type": "http://www.w3.org/2001/XMLSchema#double"}},
        {"format": "application/n-quads"})
    assert f'"{lex}"' in nq


def test_imported_keyword_entry_is_keyword_redefinition():
    # fork merge order (context.js:174-352): the @base..@propagate
    # handlers run BEFORE the @import merge, so an imported keyword
    # entry is never applied — it falls through to the term loop,
    # which rejects keywords (reference-verified 2026-08-19). A ctx's
    # OWN keyword entry masks the imported one and works normally.
    U = "https://ctx.test/"
    docs = {U + "a": {"@context": {"@base": "http://b/",
                                   "t": "http://e/t"}},
            U + "c": {"@context": {"@import": U + "a"}},
            U + "c2": {"@context": {"@import": U + "a",
                                    "@base": "http://mine/"}}}
    with pytest.raises(api.JsonLdError) as ei:
        api.expand({"@context": U + "c", "t": "v"}, {"documents": docs})
    assert ei.value.code == "keyword redefinition"
    out = api.expand({"@context": U + "c2", "t": "v"},
                     {"documents": docs})
    assert out == [{"http://e/t": [{"@value": "v"}]}]


def test_falsy_protected_is_cyclic_context_error():
    # fork defined-map quirk (context.js:367 + 446-455): '@protected'
    # is seeded with the ctx VALUE; a falsy value reads as an
    # in-progress definition -> cyclic IRI mapping (truthy values,
    # including non-boolean strings, pass) — reference-verified
    with pytest.raises(api.JsonLdError) as ei:
        api.expand({"@context": {"@protected": False,
                                 "t": "http://e/t"}, "t": "v"})
    assert ei.value.code == "cyclic IRI mapping"
    out = api.expand({"@context": {"@protected": True,
                                   "t": "http://e/t"}, "t": "v"})
    assert out == [{"http://e/t": [{"@value": "v"}]}]


def test_propagate_honored_from_first_context_element_only():
    # context.js:72-77 extracts @propagate from resolved[0].document
    # — the FIRST atomic context after the resolver flattens arrays
    # and dereferences URLs; a later element's @propagate is
    # validated but IGNORED (reference-verified on a 5-case matrix)
    nested = {"x": {"x": "v"}}
    # second-element @propagate ignored -> nested keeps the scoped map
    out = api.expand({"@context": [{"@vocab": "http://e/"},
                                   {"@propagate": False,
                                    "x": "http://scoped/x"}], **nested})
    assert out == [{"http://scoped/x":
                    [{"http://scoped/x": [{"@value": "v"}]}]}]
    # first-element @propagate applies -> nested reverts
    out = api.expand({"@context": [{"@propagate": False,
                                    "@vocab": "http://scoped/"},
                                   {"y": "http://e/y"}], **nested})
    assert out == [{"http://scoped/x": [{}]}]
    # ...including through a URL first element
    docs = {"https://p.test/a": {"@context": {
        "@propagate": False, "@vocab": "http://scoped/"}}}
    out = api.expand({"@context": ["https://p.test/a",
                                   {"z": "http://e/z"}], **nested},
                     {"documents": docs})
    assert out == [{"http://scoped/x": [{}]}]


def test_null_over_protected_terms_in_one_context_array():
    # the protected check runs on the ACCUMULATED context
    # (context.js:95 reassigns activeCtx = rval per element), so
    # [{'@protected': true, ...}, null] raises within ONE call
    # (reference-verified; the old code only checked the ENTRY ctx)
    doc = {"@context": [{"@protected": True, "t": "http://e/t"}, None],
           "t": "v"}
    with pytest.raises(api.JsonLdError) as ei:
        api.expand(json.loads(json.dumps(doc)))
    assert ei.value.code == "invalid context nullification"
    # unknown protectedMode values are rejected
    with pytest.raises(api.JsonLdError) as ei:
        api.expand(json.loads(json.dumps(doc)), {"protectedMode": "x"})
    assert ei.value.code == "invalid protected mode"


def test_null_over_protected_warn_mode_drops_mappings():
    # protectedMode 'warn': the fork MEANS to carry protected term
    # definitions into the fresh context but assigns object props on
    # a Map (context.js:127 `mappings[term] =`), so only the
    # protected FLAGS survive — the nulled term expands to nothing
    # and a later redefinition succeeds (reference-verified)
    import warnings as _w
    base = [{"@protected": True, "t": "http://e/t"}, None]
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        out = api.expand({"@context": base, "t": "v"},
                         {"protectedMode": "warn"})
        assert out == []
        out = api.expand(
            {"@context": base + [{"t": "http://e/t2"}], "t": "v"},
            {"protectedMode": "warn"})
        assert out == [{"http://e/t2": [{"@value": "v"}]}]


def test_scoped_context_validated_eagerly():
    # context.js:380-413: every term-scoped context is processed
    # against a CLONE at definition time and any failure wraps as
    # 'invalid scoped context' — even when the term is never used
    # (reference-verified 2026-08-19 on both the used and unused
    # forms). Replaces the engine's earlier lazy-on-use model.
    bad = {"@context": {"@vocab": "http://e/",
                        "s": {"@id": "http://e/s",
                              "@context": {"@protected": False}}}}
    for doc in ({**bad, "s": {"x": "v"}}, {**bad, "other": "v"}):
        with pytest.raises(api.JsonLdError) as ei:
            api.expand(json.loads(json.dumps(doc)))
        assert ei.value.code == "invalid scoped context"
    ok = api.expand({"@context": {"@vocab": "http://e/",
                                  "s": {"@id": "http://e/s",
                                        "@context": {"x": "http://e/x2"}}},
                     "s": {"x": "v"}})
    assert ok == [{"http://e/s": [{"http://e/x2": [{"@value": "v"}]}]}]


def test_remote_context_resolution_is_order_independent():
    # The fork's SHARED _resolvedContextCache is order-dependent:
    # resolving https://ctx.test/a through one consuming document
    # poisons its reuse by the next (observed 2026-08-19: 'rval.clone
    # is not a function' in one order, a bogus 'invalid term
    # definition' in the other — reference bug, triaged in
    # BASELINE.md). The engine must give the same result in BOTH
    # orders; each api call gets a fresh resolver by default.
    U = "https://ctx.test/"
    docs = {
        U + "a": {"@context": {"t": "http://e/t"}},
        U + "b": {"@context": [U + "a", {"u": "http://e/u"}]},
        U + "c": {"@context": {"@import": U + "a", "v": "http://e/v"}},
    }
    chain_doc = {"@context": U + "b", "t": "1", "u": "2"}
    import_doc = {"@context": U + "c", "v": "3", "t": "4"}
    want_chain = [{"http://e/t": [{"@value": "1"}],
                   "http://e/u": [{"@value": "2"}]}]
    want_import = [{"http://e/t": [{"@value": "4"}],
                    "http://e/v": [{"@value": "3"}]}]
    for first, second in ((chain_doc, import_doc),
                          (import_doc, chain_doc)):
        a = api.expand(json.loads(json.dumps(first)), {"documents": docs})
        b = api.expand(json.loads(json.dumps(second)),
                       {"documents": docs})
        got = {json.dumps(a), json.dumps(b)}
        assert got == {json.dumps(want_chain), json.dumps(want_import)}


CTX = {"t1": {"@id": "http://e/p1", "@container": ["@index", "@set"]}}
GRAPH_ITEM = {"@id": "_:b1",
              "@graph": [{"http://e/t2": [{"@value": "x"}]}]}
NODE_ITEM = {"@id": "_:b1", "http://e/raw": [{"@value": "y"}]}


def _compact(items):
    doc = [{"@id": "_:b2", "http://e/p1": items}]
    return json.loads(json.dumps(api.compact(doc, CTX, {})))


def test_graph_item_then_node_item_in_index_container():
    # fuzz seed 10321550 (chain-7 compact range) crashed here with
    # TypeError: the graph item lands in nestResult[prop] as an ARRAY
    # (compact.js:515-541 non-@graph-container wrap), and the node
    # item's index-map _addValue then writes a string-keyed property
    # onto that JS array — which JSON.stringify silently drops. The
    # reference output therefore contains ONLY the wrapped graph item
    # (reference-verified 2026-08-19).
    out = _compact([GRAPH_ITEM, NODE_ITEM])
    assert out == {
        "@context": CTX,
        "@id": "_:b2",
        "t1": [{"@graph": {"http://e/t2": "x"}, "@id": "_:b1"}],
    }


def test_node_item_then_graph_item_in_index_container():
    # reverse order: the index map dict exists first, then the wrapped
    # graph is appended beside it (util.js addValue array wrap)
    out = _compact([NODE_ITEM, GRAPH_ITEM])
    assert out["t1"] == [
        {"@none": [{"@id": "_:b1", "http://e/raw": "y"}]},
        {"@graph": {"http://e/t2": "x"}, "@id": "_:b1"},
    ]


def test_two_graph_items_in_index_container():
    out = _compact([
        {"@graph": [{"http://e/t2": [{"@value": "x"}]}]},
        {"@graph": [{"http://e/t3": [{"@value": "z"}]}], "@index": "k"},
    ])
    assert out["t1"] == [
        {"@graph": {"http://e/t2": "x"}},
        {"@graph": {"http://e/t3": "z"}, "@index": "k"},
    ]
