"""W3C-style conformance manifest runner.

The reference drives its conformance testing through manifest files
(``mf:Manifest`` documents with a ``sequence`` of typed test entries)
walked by ``tests/test-common.js`` — ``addManifest``
(test-common.js:324-389), ``addTest`` (test-common.js:398-640), the
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

Skip classes are LITERAL copies of the reference's TEST_TYPES skip
entries (``skip.specVersion`` and ``skip.idRegex``,
test-common.js:28-255): HTML extraction (no HTML parser by design),
the 1.0-errata ``specVersion: json-ld-1.0`` rows on exactly the test
types that declare them, the rdfDirection ``compound-literal`` rows,
and the same FIXME id lists. The reference's generic
``skip.processingMode`` mechanism is implemented too
(test-common.js:506-522), though no current TEST_TYPES entry declares
one — SKIP_PROCESSING_MODES stays empty until the reference adds one.

Per-test robustness: a malformed entry, a missing fixture file or an
unreadable sub-manifest is recorded in the report (fail or skip with
reason) instead of aborting the walk — the reference's runner likewise
converts missing files into reported outcomes.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Callable

from .core.errors import JsonLdError

# --- the reference's skip lists (test-common.js:28-255), literal ----

SKIP_ID_REGEX: dict[str, list[str]] = {
    "jld:CompactTest": [
        r"html-manifest#tc001$", r"html-manifest#tc002$",
        r"html-manifest#tc003$", r"html-manifest#tc004$",
    ],
    "jld:ExpandTest": [
        r"expand-manifest#tc037$", r"expand-manifest#tc038$",
        r"expand-manifest#ter54$",
        r"html-manifest#te001$", r"html-manifest#te002$",
        r"html-manifest#te003$", r"html-manifest#te004$",
        r"html-manifest#te005$", r"html-manifest#te006$",
        r"html-manifest#te007$", r"html-manifest#te010$",
        r"html-manifest#te011$", r"html-manifest#te012$",
        r"html-manifest#te013$", r"html-manifest#te014$",
        r"html-manifest#te015$", r"html-manifest#te016$",
        r"html-manifest#te017$", r"html-manifest#te018$",
        r"html-manifest#te019$", r"html-manifest#te020$",
        r"html-manifest#te021$", r"html-manifest#te022$",
        r"html-manifest#tex01$",
        r"expand-manifest#thc01$", r"expand-manifest#thc02$",
        r"expand-manifest#thc03$", r"expand-manifest#thc04$",
        r"expand-manifest#thc05$",
        r"remote-doc-manifest#t0013$",
    ],
    "jld:FlattenTest": [
        r"html-manifest#tf001$", r"html-manifest#tf002$",
        r"html-manifest#tf003$", r"html-manifest#tf004$",
    ],
    "jld:FrameTest": [],
    "jld:FromRDFTest": [
        r"fromRdf-manifest#tdi11$", r"fromRdf-manifest#tdi12$",
    ],
    "jld:NormalizeTest": [],
    "jld:ToRDFTest": [
        r"toRdf-manifest#tc037$", r"toRdf-manifest#tc038$",
        r"toRdf-manifest#ter54$", r"toRdf-manifest#tli12$",
        r"toRdf-manifest#tli14$",
        r"toRdf-manifest#twf05$",
        r"html-manifest#tr001$", r"html-manifest#tr002$",
        r"html-manifest#tr003$", r"html-manifest#tr004$",
        r"html-manifest#tr005$", r"html-manifest#tr006$",
        r"html-manifest#tr007$", r"html-manifest#tr010$",
        r"html-manifest#tr011$", r"html-manifest#tr012$",
        r"html-manifest#tr013$", r"html-manifest#tr014$",
        r"html-manifest#tr015$", r"html-manifest#tr016$",
        r"html-manifest#tr017$", r"html-manifest#tr018$",
        r"html-manifest#tr019$", r"html-manifest#tr020$",
        r"html-manifest#tr021$", r"html-manifest#tr022$",
        r"toRdf-manifest#te075$", r"toRdf-manifest#te111$",
        r"toRdf-manifest#te112$",
        r"toRdf-manifest#tdi11$", r"toRdf-manifest#tdi12$",
    ],
    "rdfn:Urgna2012EvalTest": [],
    "rdfn:Urdna2015EvalTest": [],
}

# 1.0-errata rows are skipped ONLY on the test types whose TEST_TYPES
# entry declares skip.specVersion (test-common.js: Compact/Expand/
# Flatten/Frame/FromRDF/ToRDF — NormalizeTest and the rdfn: types
# declare none and run such rows)
SKIP_SPEC_VERSIONS: dict[str, set] = {
    t: {"json-ld-1.0"} for t in (
        "jld:CompactTest", "jld:ExpandTest", "jld:FlattenTest",
        "jld:FrameTest", "jld:FromRDFTest", "jld:ToRDFTest")
}

# generic mechanism mirrored from test-common.js:506-522; currently no
# reference TEST_TYPES entry declares a processingMode skip
SKIP_PROCESSING_MODES: dict[str, set] = {}

_TEST_FNS = ("jld:CompactTest", "jld:ExpandTest", "jld:FlattenTest",
             "jld:FrameTest", "jld:FromRDFTest", "jld:NormalizeTest",
             "jld:ToRDFTest", "rdfn:Urgna2012EvalTest",
             "rdfn:Urdna2015EvalTest")


class ConformanceFailure(AssertionError):
    """Comparison failure — explicit raise, never a bare assert (bare
    asserts vanish under ``python -O``, which would turn the whole
    gate into a no-op)."""


def _check(cond: bool, msg: str) -> None:
    if not cond:
        raise ConformanceFailure(msg)


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
    ``sequence`` / ``entries`` / ``include``, file-referenced or
    inline) and run every typed test through the engine's public API.
    Returns a report dict: {"pass": n, "fail": n, "skip": n,
    "failures": [...], "skips": [...], "suites": [titles...]}."""
    if report is None:
        report = {"pass": 0, "fail": 0, "skip": 0,
                  "failures": [], "skips": [], "suites": []}
    dirname = os.path.dirname(os.path.abspath(manifest_path))
    try:
        manifest = _read_json(dirname, os.path.basename(manifest_path))
    except (OSError, ValueError) as e:
        report["skip"] += 1
        report["skips"].append((manifest_path,
                                f"unreadable manifest: {e!r}"))
        return report
    if not isinstance(manifest, dict):
        # a JSON array/scalar root is not a manifest — record, don't
        # abort the walk (the module's record-instead-of-abort contract)
        report["skip"] += 1
        report["skips"].append((manifest_path,
                                "manifest root is not a JSON object"))
        return report
    _walk_manifest(manifest, manifest_path, dirname, base_iri,
                   extra_mounts, skip_ids or [], report)
    return report


def _walk_manifest(manifest: dict, manifest_path: str, dirname: str,
                   base_iri: str | None,
                   extra_mounts: dict[str, str] | None,
                   skip_ids: list[str], report: dict) -> None:
    import jsonld_js_ray as jl

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
            try:
                sub_doc = _read_json(dirname, entry)
            except (OSError, ValueError) as e:
                report["skip"] += 1
                report["skips"].append((sub,
                                        f"unreadable entry: {e!r}"))
                continue
            if not isinstance(sub_doc, dict):
                report["skip"] += 1
                report["skips"].append(
                    (sub, "entry root is not a JSON object"))
                continue
            if "mf:Manifest" in _types(sub_doc) or (
                    "sequence" in sub_doc or "entries" in sub_doc):
                run_manifest(sub, base_iri=base_iri,
                             extra_mounts=extra_mounts,
                             skip_ids=skip_ids, report=report)
                continue
            entry = sub_doc
        if not isinstance(entry, dict):
            report["skip"] += 1
            report["skips"].append((str(entry)[:80],
                                    "non-object manifest entry"))
            continue
        if "mf:Manifest" in _types(entry) or (
                "input" not in entry and "action" not in entry and
                ("sequence" in entry or "entries" in entry)):
            # inline sub-manifest: walk it in place (same directory)
            _walk_manifest(entry, manifest_path, dirname, base_iri,
                           extra_mounts, skip_ids, report)
            continue
        try:
            _run_test(jl, entry, base, man_name, dirname, loader,
                      report, skip_ids)
        except Exception as e:      # noqa: BLE001 — walk must survive
            report["fail"] += 1
            report["failures"].append(
                (str(entry.get("@id") or entry.get("id")
                     or entry)[:120], f"runner error: {e!r}"[:300]))


def _skip_reason(test: dict, test_id: str, ttype: str) -> str | None:
    if test.get("skip"):
        return "manifest skip flag"
    for pat in SKIP_ID_REGEX.get(ttype, []):
        if re.search(pat, test_id):
            return f"reference skip list ({pat})"
    opts = test.get("option")
    opts = opts if isinstance(opts, dict) else {}
    for sv in _values(opts, "specVersion"):
        if sv in SKIP_SPEC_VERSIONS.get(ttype, ()):
            return f"specVersion {sv} (1.0-errata class)"
    for pm in _values(opts, "processingMode"):
        if pm in SKIP_PROCESSING_MODES.get(ttype, ()):
            return f"processingMode {pm}"
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
    input_name = test.get("input") or test.get("action")
    if not isinstance(input_name, str):
        report["fail"] += 1
        report["failures"].append((name, "test entry has no "
                                   "input/action"))
        return

    # options: copy test.option minus the loader-protocol keys
    # (createTestOptions, test-common.js:713-737)
    options: dict = {"documentLoader": loader}
    raw_opts = test.get("option")
    raw_opts = raw_opts if isinstance(raw_opts, dict) else {}
    for k, v in raw_opts.items():
        if k not in ("contentType", "httpLink", "httpStatus",
                     "redirectTo"):
            options[k] = v
    if isinstance(options.get("expandContext"), str):
        # test-common.js:501-504 absolutizes it against the manifest
        # base and lets the loader fetch it; offline we resolve the
        # RELATIVE PATH against the manifest directory (directory
        # components preserved — basename-only would read the wrong
        # same-named file)
        options["expandContext"] = _read_json(
            dirname, os.path.normpath(options["expandContext"]))
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
            _check(err is not None, "no error raised")
            _check(got == expect, f"error code {got!r} != {expect!r}")
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
                _check(got_c == exp_c, "canonized N-Quads differ")
            elif ttype in ("jld:NormalizeTest",
                           "rdfn:Urgna2012EvalTest",
                           "rdfn:Urdna2015EvalTest"):
                expect = _read_text(dirname, expect_name)
                _check(result == expect, "N-Quads differ")
            else:
                expect = _read_json(dirname, expect_name)
                _check(result == expect, (
                    f"JSON differs:\n got {json.dumps(result)[:400]}\n"
                    f" exp {json.dumps(expect)[:400]}"))
        elif "jld:PositiveSyntaxTest" in ttypes:
            # 'no checks' (test-common.js:564-566): the reference
            # passes PositiveSyntaxTest rows even when the call threw
            pass
        else:
            raise ConformanceFailure(
                f"unknown evaluation type {ttypes}")
        report["pass"] += 1
    except Exception as e:          # noqa: BLE001 — recorded
        report["fail"] += 1
        report["failures"].append((name, repr(e)[:300]))
