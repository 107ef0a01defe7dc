"""Out-of-band differential EXPAND fuzz under an API-options matrix
the main campaign never varied:

  seed % 8 == 0  ->  {expandContext: <generated context>}
  seed % 8 == 1  ->  {base: 'http://optbase.example/dir/doc'}
  seed % 8 == 2  ->  both
  seed % 8 == 3  ->  {base: ''}   (explicit empty base, a 1.1 corner)
  seed % 8 == 4  ->  URL input, base absent  (documentUrl default)
  seed % 8 == 5  ->  URL input, base null    (key-presence corner)
  seed % 8 == 6  ->  URL input, base ''      (key-presence corner)
  seed % 8 == 7  ->  URL input, base set     (caller base wins)

expandContext drives the merge-an-external-context-first path
(jsonld.js expand: options.expandContext processed before the doc's
own @context); base drives relative-IRI resolution against an
API-supplied base instead of the document location. Legs 4-7 feed the
doc through the document loader (a URL string + preloaded documents
map) — the axis that exposed the key-presence base bug (jsonld.js:
319-321 checks `'base' in options`, NOT truthiness; fixed in api.py,
pinned in tests/test_base_option_semantics.py).

Usage: python tools/fuzz_expandopts_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs: see BASELINE.md round-5 section.
"""
import json
import os
import random
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_fuzz_parity import (HARNESS_DIR, _gen_context,  # noqa: E402
                              _gen_doc)

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
n_total = 0
n_div = 0
n_nocode = 0
n_refcrash = 0


DOC_URL = "https://fuzz.test/dir/doc.jsonld"


def _opts_for(s: int) -> dict:
    which = s % 8
    opts: dict = {}
    if which in (0, 2):
        opts["expandContext"] = _gen_context(random.Random(s * 43 + 17))
    if which in (1, 2, 7):
        opts["base"] = "http://optbase.example/dir/doc"
    if which in (3, 6):
        opts["base"] = ""
    if which == 5:
        opts["base"] = None
    return opts


def _url_input(s: int) -> bool:
    return s % 8 >= 4


def _ref_raw_crash(ref) -> bool:
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    optses = [_opts_for(s) for s in seeds]
    reqs = [{"op": "expand", "input": DOC_URL if _url_input(s) else d,
             "options": o,
             **({"documents": {DOC_URL: d}} if _url_input(s) else {})}
            for s, d, o in zip(seeds, docs, optses)]
    lines = "\n".join(json.dumps(r) for r in reqs)
    proc = subprocess.run(
        ["node", os.path.join(HARNESS_DIR, "ref_run.js")],
        input=lines, capture_output=True, text=True,
        timeout=max(600, int(2.4 * chunk)),
        env={**os.environ,
             "NODE_PATH": os.path.join(HARNESS_DIR, "node_modules")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = [json.loads(x) for x in proc.stdout.strip().split("\n")]
    for (s, doc, opts), ref in zip(zip(seeds, docs, optses), results):
        n_total += 1
        try:
            eng_opts = json.loads(json.dumps(opts))
            if _url_input(s):
                eng_opts["documents"] = {
                    DOC_URL: json.loads(json.dumps(doc))}
                mine = api.expand(DOC_URL, eng_opts)
            else:
                mine = api.expand(json.loads(json.dumps(doc)),
                                  eng_opts)
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV expandopts engine-ok-ref-error", s,
                      ref.get("code"), ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV expandopts value", s, opts.keys())
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV expandopts engine-error-ref-ok", s, e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV expandopts code", s, e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_refcrash} ref-raw-crash / "
          f"{n_nocode} both-errored-no-code skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_refcrash} "
      f"ref-raw-crash / {n_nocode} both-errored-no-code skips")
sys.exit(1 if n_div else 0)
