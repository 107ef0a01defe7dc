"""Document-loader semantics vs the reference node loader
(lib/documentLoaders/node.js:34-189, RequestQueue.js:6-38,
util.js:88-146) — driven through in-memory fake transports."""

from __future__ import annotations

import threading

import pytest

from jsonld_js_ray.core.errors import JsonLdError
from jsonld_js_ray.sources.doc_loader import (
    LINK_HEADER_CONTEXT, RequestQueue, build_headers,
    node_document_loader, parse_link_header,
)


def _transport(routes):
    def t(url, headers):
        assert headers["Accept"] == \
            "application/ld+json, application/json"
        if url not in routes:
            raise ConnectionError("no route")
        return routes[url]
    return t


def test_build_headers_rejects_accept_and_sets_default():
    h = build_headers({"X-Extra": "1"})
    assert h["Accept"] == "application/ld+json, application/json"
    assert h["X-Extra"] == "1"
    with pytest.raises(ValueError):
        build_headers({"accept": "text/html"})


def test_parse_link_header_rel_keying_and_dup_detection():
    parsed = parse_link_header(
        '<ctx.jsonld>; rel="http://www.w3.org/ns/json-ld#context"; '
        'type="application/ld+json", <alt.jsonld>; rel="alternate"; '
        'type="application/ld+json"')
    ctx = parsed[LINK_HEADER_CONTEXT]
    assert ctx["target"] == "ctx.jsonld"
    assert parsed["alternate"]["target"] == "alt.jsonld"
    dup = parse_link_header(
        '<a>; rel="x", <b>; rel="x"')
    assert [e["target"] for e in dup["x"]] == ["a", "b"]


def test_loader_basic_and_scheme_checks():
    loader = node_document_loader(_transport({
        "https://e/doc": (200, {"content-type": "application/ld+json"},
                          {"@id": "https://e/1"}),
    }))
    doc = loader("https://e/doc")
    assert doc["document"]["@id"] == "https://e/1"
    assert doc["contextUrl"] is None

    with pytest.raises(JsonLdError) as e:
        loader("ftp://e/doc")
    assert e.value.code == "loading document failed"

    secure_loader = node_document_loader(_transport({}), secure=True)
    with pytest.raises(JsonLdError):
        secure_loader("http://insecure/doc")


def test_loader_http_error_and_transport_failure():
    loader = node_document_loader(_transport({
        "https://e/404": (404, {}, None),
    }))
    with pytest.raises(JsonLdError) as e:
        loader("https://e/404")
    assert e.value.code == "loading document failed"
    assert e.value.details["httpStatusCode"] == 404
    with pytest.raises(JsonLdError) as e2:
        loader("https://e/no-route")
    assert e2.value.name == "jsonld.LoadDocumentError"


def test_loader_link_header_context_discovery():
    link = f'<https://e/ctx.jsonld>; rel="{LINK_HEADER_CONTEXT}"'
    loader = node_document_loader(_transport({
        "https://e/data.json": (
            200, {"content-type": "application/json", "link": link},
            {"name": "x"}),
        "https://e/data.jsonld": (
            200, {"content-type": "application/ld+json", "link": link},
            {"name": "x"}),
    }))
    doc = loader("https://e/data.json")
    assert doc["contextUrl"] == "https://e/ctx.jsonld"
    # content-type application/ld+json → Link ignored (reference :97)
    doc2 = loader("https://e/data.jsonld")
    assert doc2["contextUrl"] is None

    multi = (f'<https://e/a.jsonld>; rel="{LINK_HEADER_CONTEXT}", '
             f'<https://e/b.jsonld>; rel="{LINK_HEADER_CONTEXT}"')
    loader3 = node_document_loader(_transport({
        "https://e/m.json": (
            200, {"content-type": "application/json", "link": multi},
            {}),
    }))
    with pytest.raises(JsonLdError) as e:
        loader3("https://e/m.json")
    assert e.value.code == "multiple context link headers"


def test_loader_alternate_link_is_redirect():
    link = '<alt.jsonld>; rel="alternate"; type="application/ld+json"'
    loader = node_document_loader(_transport({
        "https://e/page.html": (
            200, {"content-type": "text/html", "link": link}, "<html>"),
        "https://e/alt.jsonld": (
            200, {"content-type": "application/ld+json"},
            {"@id": "https://e/alt"}),
    }))
    doc = loader("https://e/page.html")
    # relative alternate target resolves against the request URL
    assert doc["documentUrl"] == "https://e/alt.jsonld"
    assert doc["document"]["@id"] == "https://e/alt"


def test_loader_redirects_loops_and_max():
    routes = {
        "https://e/a": (302, {"location": "https://e/b"}, None),
        "https://e/b": (301, {"location": "https://e/c"}, None),
        "https://e/c": (200, {"content-type": "application/ld+json"},
                        {"ok": True}),
        "https://e/loop1": (302, {"location": "https://e/loop2"}, None),
        "https://e/loop2": (302, {"location": "https://e/loop1"}, None),
    }
    loader = node_document_loader(_transport(routes))
    doc = loader("https://e/a")
    assert doc["documentUrl"] == "https://e/c" and doc["document"]["ok"]

    with pytest.raises(JsonLdError) as e:
        loader("https://e/loop1")
    assert e.value.name == "jsonld.InfiniteRedirectDetected"
    assert e.value.code == "recursive context inclusion"

    capped = node_document_loader(_transport(routes), max_redirects=1)
    with pytest.raises(JsonLdError) as e2:
        capped("https://e/a")
    assert e2.value.name == "jsonld.TooManyRedirects"


def test_request_queue_coalesces_concurrent_loads():
    calls = []
    gate = threading.Event()

    def slow_loader(url):
        calls.append(url)
        gate.wait(timeout=5)
        return {"documentUrl": url}

    q = RequestQueue()
    wrapped = q.wrap_loader(slow_loader)
    results = {}

    def run(idx):
        results[idx] = wrapped("https://e/same")

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    import time

    time.sleep(0.2)
    gate.set()
    for t in threads:
        t.join()
    assert len(calls) == 1                  # one fetch, four callers
    assert all(results[i]["documentUrl"] == "https://e/same"
               for i in range(4))
    # after completion the URL is re-fetchable
    gate.set()
    wrapped("https://e/same")
    assert len(calls) == 2


def test_loader_plugs_into_expand():
    import jsonld_js_ray as jl

    ctx_doc = {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}
    loader = node_document_loader(_transport({
        "https://e/ctx.jsonld": (
            200, {"content-type": "application/ld+json"}, ctx_doc),
    }))
    out = jl.expand({"@context": "https://e/ctx.jsonld",
                     "@id": "https://e/s", "name": "Alice"},
                    {"documentLoader": lambda url: loader(url)})
    assert out[0]["http://xmlns.com/foaf/0.1/name"][0]["@value"] == "Alice"


def test_loader_duplicate_alternate_headers_no_crash():
    """Duplicate rel=alternate links parse to a list; like the reference
    (.type on an array is undefined) no alternate-redirect happens."""
    link = ('<a.jsonld>; rel="alternate"; type="application/ld+json", '
            '<b.jsonld>; rel="alternate"; type="application/ld+json"')
    loader = node_document_loader(_transport({
        "https://e/p.html": (200, {"content-type": "text/html",
                                   "link": link}, "<html>"),
    }))
    doc = loader("https://e/p.html")
    assert doc["documentUrl"] == "https://e/p.html"


def test_loader_empty_body_becomes_none():
    loader = node_document_loader(_transport({
        "https://e/empty": (200, {"content-type": "text/plain"}, ""),
    }))
    assert loader("https://e/empty")["document"] is None


def test_context_url_reaches_expansion():
    """A Link-discovered context must be APPENDED to the doc's @context
    during resolution (reference ContextResolver.js:200-205), and
    string bodies must be JSON-parsed."""
    import json

    import jsonld_js_ray as jl

    linked_ctx = {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}
    link = f'<https://e/ctx.jsonld>; rel="{LINK_HEADER_CONTEXT}"'
    loader = node_document_loader(_transport({
        # remote context doc served as application/json WITH a Link
        # header pointing at the real context — body is a JSON STRING
        "https://e/data.json": (
            200, {"content-type": "application/json", "link": link},
            json.dumps({})),
        "https://e/ctx.jsonld": (
            200, {"content-type": "application/ld+json"},
            json.dumps(linked_ctx)),
    }))
    out = jl.expand({"@context": "https://e/data.json",
                     "@id": "https://e/s", "name": "Alice"},
                    {"documentLoader": lambda url: loader(url)})
    assert out[0]["http://xmlns.com/foaf/0.1/name"][0]["@value"] == "Alice"


def test_document_loader_registry_and_default():
    """lib/jsonld.js:965-997 — documentLoaders registry +
    useDocumentLoader wiring the process default."""
    import jsonld_js_ray as jl
    from jsonld_js_ray import api

    with pytest.raises(JsonLdError) as e:
        jl.use_document_loader("xhr")
    assert e.value.name == "jsonld.UnknownDocumentLoader"

    # 'node' without a transport: clear error (no network in engine)
    with pytest.raises(JsonLdError):
        jl.use_document_loader("node")

    routes = {
        "https://e/ctx.json": (
            200, {"content-type": "application/ld+json"},
            {"@context": {"name": "http://xmlns.com/foaf/0.1/name"}}),
    }
    try:
        jl.use_document_loader("node", transport=_transport(routes))
        out = jl.expand({"@context": "https://e/ctx.json",
                         "@id": "https://e/s", "name": "Bo"})
        assert out[0]["http://xmlns.com/foaf/0.1/name"][0]["@value"] == "Bo"
        # custom registered loader type
        jl.document_loaders["memory"] = lambda docs: (
            lambda url: {"document": docs[url], "documentUrl": url,
                         "contextUrl": None})
        jl.use_document_loader(
            "memory",
            {"https://m/d": {"@context": {},
                             "@id": "https://m/1"}})
        rec = api.load_document("https://m/d")
        assert rec["document"]["@id"] == "https://m/1"
    finally:
        api._default_document_loader = None
        jl.document_loaders.pop("memory", None)
