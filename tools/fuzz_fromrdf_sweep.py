"""Out-of-band differential FROMRDF fuzz vs the reference: for each
seed, serialize the generated doc to quads with the ENGINE's toRdf
(whose parity is separately pinned by the million-doc
tools/fuzz_sweep.py campaign), then feed the IDENTICAL quad set to
both fromRDF implementations (lib/fromRdf.js:33-262 via the harness's
term-array codec) and compare the expanded outputs deep-equal.

Options vary by seed to cover the decode matrix:
  useNativeTypes = seed % 2 == 1   (xsd integer/double/boolean -> JS natives)
  useRdfType     = seed % 4 >= 2   (rdf:type kept as a property, not @type)

Usage: python tools/fuzz_fromrdf_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs (2026-08-19, round-5 second sitting): seeds
3100000..3160500 — 60,500 docs, 0 divergences (1,060/60,500
toRdf-error + 12 null-quad op skips across the ranges).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_fuzz_parity import HARNESS_DIR, _gen_doc  # noqa: E402

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
n_total = 0
n_div = 0
n_nocode = 0
n_tordf_skip = 0  # engine toRdf raised: no quad set to compare
n_nullq = 0       # known reference quirk: null-object quad for a
                  # relative-IRI list tail (same skip class as
                  # tools/fuzz_sweep.py) — no well-formed quad set


def _term_array(t):
    # engine tuple -> the harness's term-array codec (ref_run.js mk()):
    # [termType, value] or ["Literal", value, datatype, language]
    if t[0] == "Literal":
        return [t[0], t[1], t[2], t[3]]
    return [t[0], t[1]]


for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    reqs = []
    cases = []  # (seed, quads, options) rows with a live quad set
    for s in seeds:
        n_total += 1
        doc = _gen_doc(s)
        try:
            quads = api.to_rdf(doc)
        except JsonLdError:
            n_tordf_skip += 1
            continue
        if any(t is None for q in quads for t in q):
            n_nullq += 1
            continue
        opts = {"useNativeTypes": s % 2 == 1, "useRdfType": s % 4 >= 2}
        cases.append((s, quads, opts))
        reqs.append({"op": "fromRdf",
                     "input": [[_term_array(t) for t in q] for q in quads],
                     "options": opts})
    if not reqs:
        print(f"chunk {base}..{seeds[-1]}: all toRdf-skipped", flush=True)
        continue
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
    for (s, quads, opts), ref in zip(cases, results):
        try:
            mine = api.from_rdf(quads, dict(opts))
            if not ref["ok"]:
                n_div += 1
                print("DIV fromrdf engine-ok-ref-error", s,
                      ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV fromrdf value", s)
        except JsonLdError as e:
            if ref["ok"]:
                n_div += 1
                print("DIV fromrdf engine-error-ref-ok", s, e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV fromrdf code", s, e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_tordf_skip} toRdf-error / "
          f"{n_nullq} null-quad / {n_nocode} both-errored-no-code "
          f"skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_tordf_skip} "
      f"toRdf-error / {n_nullq} null-quad / {n_nocode} "
      f"both-errored-no-code skips")
sys.exit(1 if n_div else 0)
