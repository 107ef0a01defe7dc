"""Round-4 task 2: the W3C conformance-manifest runner.

The reference's conformance mechanism is a manifest walker
(tests/test-common.js:324-389 + the TEST_TYPES dispatch at 28-255);
jsonld_js_ray.conformance reimplements it. Three layers here:

1. the reference's own bundled manifest (/root/reference/tests/
   manifest.jsonld) must pass — its remote-context tests run over the
   OfflineLoader mount exactly as the reference runs them over its
   local express server (tests/remote-context-server.js); the one
   live-network test (t0006 follows a w3id.org redirect to the real
   internet) is skipped with a recorded reason.
2. a committed fixture suite IN THE OFFICIAL MANIFEST FORMAT exercises
   every dispatch type (expand/compact/flatten/frame/toRdf/fromRdf/
   normalize, negative error codes, option handling, mounted remote
   contexts, specVersion skip classes).
3. when the official W3C checkouts are present (no network in this
   sandbox, so this is gated on $GRAFT_W3C_SUITES_DIR), the same
   runner walks json-ld-api / json-ld-framing / rdf-canon and reports
   per-suite pass/skip counts. Divergences are triaged in BASELINE.md.
"""

from __future__ import annotations

import os

import pytest

from jsonld_js_ray.conformance import run_manifest

REF_TESTS = "/root/reference/tests"


def test_reference_bundled_manifest():
    rep = run_manifest(
        f"{REF_TESTS}/manifest.jsonld",
        extra_mounts={"http://localhost:8000/": f"{REF_TESTS}/contexts/"},
        skip_ids=[r"manifest#t0006$"],   # live w3id.org redirect
    )
    assert rep["fail"] == 0, rep["failures"]
    assert rep["pass"] == 7
    assert rep["skip"] == 1


def test_w3c_shaped_fixture_suite():
    here = os.path.join(os.path.dirname(__file__), "w3c_shaped")
    rep = run_manifest(
        os.path.join(here, "manifest.jsonld"),
        extra_mounts={"https://mounted.test/":
                      os.path.join(here, "mounted") + os.sep})
    assert rep["fail"] == 0, rep["failures"]
    # 11 evaluated (incl. one negative, one mounted-remote, one
    # expandContext), 1 skipped by the 1.0-errata class
    assert rep["pass"] == 11
    assert rep["skip"] == 1
    assert any("specVersion json-ld-1.0" in r for _, r in rep["skips"])


OFFICIAL = os.environ.get("GRAFT_W3C_SUITES_DIR")


@pytest.mark.skipif(
    not OFFICIAL, reason="official W3C suite checkouts not present "
    "(no network in this sandbox); set GRAFT_W3C_SUITES_DIR to run")
@pytest.mark.parametrize("suite,manifest", [
    ("json-ld-api", "tests/manifest.jsonld"),
    ("json-ld-framing", "tests/frame-manifest.jsonld"),
    ("rdf-canon", "tests/manifest-urdna2015.jsonld"),
])
def test_official_suites(suite, manifest):
    path = os.path.join(OFFICIAL, suite, manifest)
    if not os.path.exists(path):
        pytest.skip(f"{path} not present")
    rep = run_manifest(path)
    total = rep["pass"] + rep["fail"] + rep["skip"]
    print(f"{suite}: {rep['pass']}/{total} pass, {rep['skip']} skip")
    assert rep["fail"] == 0, rep["failures"][:10]
