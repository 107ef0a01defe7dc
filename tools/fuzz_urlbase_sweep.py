"""Out-of-band differential fuzz for URL-STRING input × the base
option matrix, across the ops whose _setDefaults carries a base leg
(lib/jsonld.js:142,382,677): compact, flatten, toRdf. The companion
expand axis lives in tools/fuzz_expandopts_sweep.py (legs 4-7).

Per seed:
  op       = seed % 3          (0 compact, 1 flatten, 2 toRdf)
  base leg = (seed // 3) % 4   (0 absent — input URL is the default
                                base; 1 null; 2 ''; 3 a caller base)

The doc is served through the document loader (preloaded documents
map), so the sweep exercises the reference's key-presence base
semantics end-to-end: an absent base must fall back to the INPUT URL
via each op's _setDefaults (never the documentUrl for these ops),
while an explicit null/'' keeps relative IRIs relative. This is the
axis family that exposed the truthiness-vs-key-presence base bug
(fixed in api.py, matrix-pinned in tests/test_base_option_semantics.py).

compact/flatten compare deep-equality; toRdf compares canonized quad
sets (null-quad ref rows skipped, the known fork list-tail quirk).

Usage: python tools/fuzz_urlbase_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs: see BASELINE.md round-5 fourth sitting.
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
                              _gen_doc, _ref_quads_to_tuples)

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core import canonize as canonize_mod  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
n_total = 0
n_div = 0
n_nocode = 0
n_refcrash = 0
n_nullq = 0

DOC_URL = "https://fuzz.test/dir/doc.jsonld"
OPS = ("compact", "flatten", "toRdf")


def _opts_for(s: int) -> dict:
    leg = (s // 3) % 4
    if leg == 1:
        return {"base": None}
    if leg == 2:
        return {"base": ""}
    if leg == 3:
        return {"base": "http://optbase.example/dir/doc"}
    return {}


def _ref_raw_crash(ref) -> bool:
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))


for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    ctxs = [_gen_context(random.Random(s * 31 + 7)) for s in seeds]
    reqs = []
    for s, d, c in zip(seeds, docs, ctxs):
        op = OPS[s % 3]
        req = {"op": op, "input": DOC_URL, "options": _opts_for(s),
               "documents": {DOC_URL: d}}
        if op in ("compact", "flatten"):
            req["ctx"] = c
        reqs.append(req)
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
    for s, doc, ctx, ref in zip(seeds, docs, ctxs, results):
        n_total += 1
        op = OPS[s % 3]
        opts = _opts_for(s)
        opts["documents"] = {DOC_URL: json.loads(json.dumps(doc))}
        try:
            if op == "compact":
                mine = api.compact(DOC_URL, json.loads(json.dumps(ctx)),
                                   opts)
            elif op == "flatten":
                mine = api.flatten(DOC_URL, json.loads(json.dumps(ctx)),
                                   opts)
            else:
                mine = api.to_rdf(DOC_URL, opts)
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV", op, "engine-ok-ref-error", s,
                      ref.get("code"), ref["error"][:120])
            elif op == "toRdf":
                if any(t is None for q in ref["result"]
                       for t in (q["subject"], q["predicate"],
                                 q["object"], q["graph"])):
                    n_nullq += 1
                else:
                    rq = _ref_quads_to_tuples(ref["result"])
                    if canonize_mod.canonize(mine) != \
                            canonize_mod.canonize(rq):
                        n_div += 1
                        print("DIV toRdf quads", s, _opts_for(s))
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV", op, "value", s, _opts_for(s))
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV", op, "engine-error-ref-ok", s, e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV", op, "code", s, e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_nullq} null-quad / "
          f"{n_refcrash} ref-raw-crash / {n_nocode} "
          f"both-errored-no-code skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_nullq} null-quad "
      f"/ {n_refcrash} ref-raw-crash / {n_nocode} both-errored-no-code "
      f"skips")
sys.exit(1 if n_div else 0)
