"""Out-of-band differential FLATTEN fuzz vs the reference: for each
seed, flatten the generated doc — under an independently generated
context for odd seeds, context-free (pure node-map flatten) for even
seeds — and compare deep-equality (or error-code parity) with the
reference's flatten (lib/jsonld.js:369-405, lib/flatten.js:24-38).

Usage: python tools/fuzz_flatten_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs (2026-08-19, round-5 second sitting): seeds
3000000..3060500 — 60,500 docs clean at fixed HEADs (plus the two
finding passes). The axis found TWO engine bugs on its first pass:
seeds 3001834/3002138/3003576/3007668/3011192/3015714 exposed the
visible "@id": "undefined" string on bare-@list graph content (fixed
in core/nodemap.py — JS-undefined @id modeled as an absent key), and
seed 3031914 exposed deep-equality dedup where util.js compareValues
uses === per component (fixed in core/util.py). Both ranges re-ran
clean at the fixed HEADs; regressions in
tests/test_sweep_findings_r5b.py.
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


def _ref_raw_crash(ref) -> bool:
    # the fork crashes with a RAW JS TypeError (no JsonLdError code) on
    # some shapes (e.g. `iri.startsWith is not a function` in its
    # compactIri on non-string ids, reachable through flatten's compact
    # step) — a known reference bug class, not an engine divergence
    # (same rule as tools/fuzz_sweep.py / fuzz_compact_sweep.py)
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    # odd seeds get a compaction context (exercises the graph=True
    # compact path); even seeds flatten context-free
    ctxs = [(_gen_context(random.Random(s * 37 + 11)) if s % 2 else None)
            for s in seeds]
    reqs = [{"op": "flatten", "input": d, "ctx": c}
            for d, c in zip(docs, ctxs)]
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
    for i, (doc, ctx) in enumerate(zip(docs, ctxs)):
        n_total += 1
        ref = results[i]
        try:
            mine = api.flatten(json.loads(json.dumps(doc)),
                               json.loads(json.dumps(ctx)))
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV flatten engine-ok-ref-error", seeds[i],
                      ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV flatten value", seeds[i])
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV flatten engine-error-ref-ok", seeds[i],
                      e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV flatten code", seeds[i], e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_refcrash} ref-raw-crash / "
          f"{n_nocode} both-errored-no-code skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_refcrash} "
      f"ref-raw-crash / {n_nocode} both-errored-no-code skips")
sys.exit(1 if n_div else 0)
