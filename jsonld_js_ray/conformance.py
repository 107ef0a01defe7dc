"""W3C-style conformance manifest runner.

The reference drives its conformance testing through manifest files
(``mf:Manifest`` documents with a ``sequence`` of typed test entries)
walked by ``tests/test-common.js`` — ``addManifest``
(test-common.js:324-389), ``addTest`` (test-common.js:398-...), the
``TEST_TYPES`` dispatch table (test-common.js:28-255) and the
compare helpers (test-common.js:747-830). This module reimplements
that mechanism in Python so the OFFICIAL suites (json-ld-api, framing,
rdf-canon — all public W3C artifacts) run against this engine whenever
their files are present on disk, and the reference's own bundled
custom manifest (``tests/manifest.jsonld``) runs always.

The sandbox has no network, so suite files are resolved from local
directories only: point ``run_manifest`` at a manifest file and mount
any IRI prefixes its tests dereference (the standard offline technique
for these suites — the official runners do the same via a local
server; cf. the reference's ``tests/remote-context-server.js``).

Skip classes are carried over from the reference verbatim (the
``skip.specVersion`` / ``skip.idRegex`` / ``skip.processingMode``
entries of TEST_TYPES) so pass/skip counts are comparable: skipped
classes are HTML extraction (no HTML parser by design), the
1.0-errata ``specVersion: json-ld-1.0`` rows, the rdfDirection
``compound-literal`` rows, and the same FIXME id lists the reference
skips (test-common.js:28-255).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

from .core.errors import JsonLdError

# --- the reference's skip lists (test-common.js:28-255), verbatim ---

_HTML_RE = [r"html-manifest#t[cefr]\d+$", r"html-manifest#tex01$",
            r"expand-manifest#thc0[1-5]$",
            r"remote-doc-manifest#t0013$"]

SKIP_ID_REGEX: dict[str, list[str]] = {
    "jld:CompactTest": [r"html-manifest#tc00[1-4]$"],
    "jld:ExpandTest": [r"expand-manifest#tc037$",
                       r"expand-manifest#tc038$",
                       r"expand-manifest#ter54$", *_HTML_RE],
    "jld:FlattenTest": [r"html-manifest#tf00[1-4]$"],
    "jld:FrameTest": [],
    "jld:FromRDFTest": [r"fromRdf-manifest#tdi11$",
                        r"fromRdf-manifest#tdi12$"],
    "jld:NormalizeTest": [],
    "jld:ToRDFTest": [r"toRdf-manifest#tc037$", r"toRdf-manifest#tc038$",
                      r"toRdf-manifest#ter54$", r"toRdf-manifest#tli12$",
                      r"toRdf-manifest#tli14$", r"toRdf-manifest#twf05$",
                      r"html-manifest#tr0\d+$",
                      r"toRdf-manifest#te075$", r"toRdf-manifest#te111$",
                      r"toRdf-manifest#te112$", r"toRdf-manifest#tdi11$",
                      r"toRdf-manifest#tdi12$"],
    "rdfn:Urgna2012EvalTest": [],
    "rdfn:Urdna2015EvalTest": [],
}

# behavior changed for a 1.1 processor (JSON-LD 1.0 errata) — the
# reference skips every test pinned to specVersion json-ld-1.0
SKIP_SPEC_VERSIONS = {"json-ld-1.0"}

_TEST_FNS = ("jld:CompactTest", "jld:ExpandTest", "jld:FlattenTest",
             "jld:FrameTest", "jld:FromRDFTest", "jld:NormalizeTest",
             "jld:ToRDFTest", "rdfn:Urgna2012EvalTest",
             "rdfn:Urdna2015EvalTest")


class OfflineLoader:
    """documentLoader resolving IRIs from local directories: each
    mount maps an IRI prefix to a directory (the offline stand-in for
    the suites' HTTP server; cf. tests/remote-context-server.js)."""

    def __init__(self, mounts: dict[str, str]) -> None:
        self.mounts = dict(mounts)

    def __call__(self, url: str, options: dict | None = None) -> dict:
        for prefix, root in self.mounts.items():
            if url.startswith(prefix):
                rel = url[len(prefix):].split("#", 1)[0]
                path = os.path.join(root, rel)
                if os.path.exists(path):
                    with open(path, encoding="utf-8") as f:
                        return {"contextUrl": None,
                                "document": json.load(f),
                                "documentUrl": url}
        raise JsonLdError(
            f"Dereferencing a URL did not result in a valid JSON-LD "
            f"object: {url}", "jsonld.InvalidUrl",
            code="loading document failed")


def _values(node: dict, key: str) -> list:
    v = node.get(key)
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _types(node: dict) -> list:
    return _values(node, "@type") + _values(node, "type")


def _read_json(dirname: str, name: str) -> Any:
    with open(os.path.join(dirname, name), encoding="utf-8") as f:
        return json.load(f)


def _read_text(dirname: str, name: str) -> str:
    with open(os.path.join(dirname, name), encoding="utf-8") as f:
        return f.read()


def run_manifest(manifest_path: str, base_iri: str | None = None,
                 extra_mounts: dict[str, str] | None = None,
                 skip_ids: list[str] | None = None,
                 report: dict | None = None) -> dict:
    """Walk one manifest file (recursing into sub-manifests via
    ``sequence`` / ``entries`` / ``include``) and run every typed test
    through the engine's public API. Returns a report dict:
    {"pass": n, "fail": n, "skip": n, "failures": [...],
    "skips": [...], "suites": [titles...]}."""
    import jsonld_js_ray as jl

    if report is None:
        report = {"pass": 0, "fail": 0, "skip": 0,
                  "failures": [], "skips": [], "suites": []}
    dirname = os.path.dirname(os.path.abspath(manifest_path))
    manifest = _read_json(dirname, os.path.basename(manifest_path))
    base = base_iri or manifest.get("baseIri") or (
        "file://" + dirname + "/")
    report["suites"].append(manifest.get("name")
                            or manifest.get("label") or manifest_path)

    mounts = {base: dirname + os.sep}
    if extra_mounts:
        mounts.update(extra_mounts)
    loader = OfflineLoader(mounts)

    entries = _values(manifest, "entries") + _values(manifest,
                                                     "sequence")
    entries += [inc + ".jsonld" for inc in _values(manifest, "include")]
    man_name = os.path.basename(manifest_path).replace(".jsonld", "")

    for entry in entries:
        if isinstance(entry, str):
            if not entry.endswith((".jsonld", ".json")):
                continue        # .js imports: runner-specific, skipped
            sub = os.path.join(dirname, entry)
            sub_doc = _read_json(dirname, entry)
            if "mf:Manifest" in _types(sub_doc) or (
                    "sequence" in sub_doc or "entries" in sub_doc):
                run_manifest(sub, base_iri=base_iri,
                             extra_mounts=extra_mounts,
                             skip_ids=skip_ids, report=report)
                continue
            entry = sub_doc
        if "mf:Manifest" in _types(entry):
            # inline sub-manifest (rare)
            continue
        _run_test(jl, entry, base, man_name, dirname, loader, report,
                  skip_ids or [])
    return report


def _skip_reason(test: dict, test_id: str, ttype: str) -> str | None:
    if test.get("skip"):
        return "manifest skip flag"
    for pat in SKIP_ID_REGEX.get(ttype, []):
        if re.search(pat, test_id):
            return f"reference skip list ({pat})"
    opts = test.get("option") or {}
    for sv in _values(opts, "specVersion"):
        if sv in SKIP_SPEC_VERSIONS:
            return f"specVersion {sv} (1.0-errata class)"
    return None


def _run_test(jl, test: dict, base: str, man_name: str, dirname: str,
              loader: Callable, report: dict,
              skip_ids: list[str]) -> None:
    ttypes = _types(test)
    ttype = next((t for t in ttypes if t in _TEST_FNS), None)
    test_id = base + man_name + (test.get("@id") or test.get("id")
                                 or "")
    name = f"{test_id} {test.get('purpose') or test.get('name') or ''}"
    if ttype is None:
        report["skip"] += 1
        report["skips"].append((name, "unknown test type"))
        return
    for pat in skip_ids:
        if re.search(pat, test_id):
            report["skip"] += 1
            report["skips"].append((name, f"caller skip ({pat})"))
            return
    reason = _skip_reason(test, test_id, ttype)
    if reason is not None:
        report["skip"] += 1
        report["skips"].append((name, reason))
        return

    # options: copy test.option minus the loader-protocol keys
    # (createTestOptions, test-common.js:713-737)
    options: dict = {"documentLoader": loader}
    for k, v in (test.get("option") or {}).items():
        if k not in ("contentType", "httpLink", "httpStatus",
                     "redirectTo"):
            options[k] = v
    if isinstance(options.get("expandContext"), str):
        # test-common.js:487-490 absolutizes it against the manifest
        # base and lets the loader fetch it; offline we read the file
        options["expandContext"] = _read_json(
            dirname, options["expandContext"].split("/")[-1])
    input_name = test.get("input") or test.get("action")
    input_url = base + input_name
    if "base" not in options:
        options["base"] = input_url

    err = None
    result = None
    try:
        if ttype == "jld:ExpandTest":
            result = jl.expand(input_url, options)
        elif ttype == "jld:CompactTest":
            ctx = _read_json(dirname, test["context"])
            result = jl.compact(input_url, ctx, options)
        elif ttype == "jld:FlattenTest":
            ctx = (_read_json(dirname, test["context"])
                   if test.get("context") else None)
            result = jl.flatten(input_url, ctx, options)
        elif ttype == "jld:FrameTest":
            frm = _read_json(dirname, test["frame"])
            result = jl.frame(input_url, frm, options)
        elif ttype == "jld:FromRDFTest":
            nq = _read_text(dirname, input_name)
            result = jl.from_rdf(nq, {
                **options, "format": "application/n-quads"})
        elif ttype == "jld:ToRDFTest":
            result = jl.to_rdf(input_url, {
                **options, "format": "application/n-quads"})
        elif ttype == "jld:NormalizeTest":
            result = jl.canonize(input_url, {
                **options, "format": "application/n-quads"})
        elif ttype in ("rdfn:Urgna2012EvalTest",
                       "rdfn:Urdna2015EvalTest"):
            nq = _read_text(dirname, input_name)
            algo = ("URGNA2012" if ttype == "rdfn:Urgna2012EvalTest"
                    else "URDNA2015")
            result = jl.canonize(nq, {
                **options, "algorithm": algo,
                "inputFormat": "application/n-quads",
                "format": "application/n-quads"})
    except Exception as e:          # noqa: BLE001 — compared below
        err = e

    try:
        if "jld:NegativeEvaluationTest" in ttypes:
            expect = test.get("expectErrorCode") or test.get("expect")
            got = getattr(err, "code", None) if err is not None \
                else None
            assert err is not None, "no error raised"
            assert got == expect, f"error code {got!r} != {expect!r}"
        elif ("jld:PositiveEvaluationTest" in ttypes
              or ttype.startswith("rdfn:")):
            if err is not None:
                raise err
            expect_name = (test.get("expect") or test.get("result"))
            if ttype in ("jld:ToRDFTest",):
                # canonize both N-Quads docs, then compare — the
                # reference's compareCanonizedExpectedNQuads
                # (test-common.js:776-795)
                expect = _read_text(dirname, expect_name)
                canon_opts = {"algorithm": "URDNA2015",
                              "inputFormat": "application/n-quads",
                              "format": "application/n-quads"}
                got_c = jl.canonize(result, canon_opts)
                exp_c = jl.canonize(expect, canon_opts)
                assert got_c == exp_c, "canonized N-Quads differ"
            elif ttype in ("jld:NormalizeTest", "rdfn:Urgna2012EvalTest",
                           "rdfn:Urdna2015EvalTest"):
                expect = _read_text(dirname, expect_name)
                assert result == expect, "N-Quads differ"
            else:
                expect = _read_json(dirname, expect_name)
                assert result == expect, (
                    f"JSON differs:\n got {json.dumps(result)[:400]}\n"
                    f" exp {json.dumps(expect)[:400]}")
        elif "jld:PositiveSyntaxTest" in ttypes:
            if err is not None:
                raise err
        else:
            raise AssertionError(f"unknown evaluation type {ttypes}")
        report["pass"] += 1
    except Exception as e:          # noqa: BLE001 — recorded
        report["fail"] += 1
        report["failures"].append((name, repr(e)[:300]))
