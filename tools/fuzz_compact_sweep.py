"""Out-of-band differential COMPACT fuzz vs the reference: for each
seed, expand the generated doc and compact the expansion under an
independently generated context; compare deep-equality (or error-code
parity) with the reference's compact.

Usage: python tools/fuzz_compact_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs (2026-08-19, round 5): seeds 2000000..2040000 —
40,000 docs, 0 divergences, 35 ref-raw-crash skips (the fork's
compactIri calls .startsWith on non-string ids and dies with a raw
JS TypeError — same known-bug skip class as tools/fuzz_sweep.py), 0
both-errored-no-code — on top of the earlier rounds' ad-hoc compact
sweeps (3,800 docs r1, 1,200 r2 noted in BASELINE.md). That first
range ran default options; the tool has since gained a per-seed
option matrix (compactArrays x graph), so later ranges also cover
the singleton-preserving and @graph-wrapping paths. Option-matrix
ranges recorded 2026-08-19 (round-5 second sitting): seeds
2040000..2081000 — 41,000 docs, 0 divergences.
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
    # compactIri on non-string ids) — a known reference bug class, not
    # an engine divergence (same rule as tools/fuzz_sweep.py)
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    ctxs = [_gen_context(random.Random(s * 31 + 7)) for s in seeds]
    # option matrix (defaults: compactArrays=True, graph=False) —
    # exercises the singleton-preserving and @graph-wrapping paths
    optses = [{"compactArrays": s % 3 != 0, "graph": s % 5 == 0}
              for s in seeds]
    reqs = [{"op": "compact", "input": d, "ctx": c, "options": o}
            for d, c, o in zip(docs, ctxs, optses)]
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
            mine = api.compact(json.loads(json.dumps(doc)),
                               json.loads(json.dumps(ctx)),
                               dict(optses[i]))
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV compact engine-ok-ref-error", seeds[i],
                      ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV compact value", seeds[i])
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV compact engine-error-ref-ok", seeds[i],
                      e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV compact code", seeds[i], e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_refcrash} ref-raw-crash / "
          f"{n_nocode} both-errored-no-code skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_refcrash} "
      f"ref-raw-crash / {n_nocode} both-errored-no-code skips")
sys.exit(1 if n_div else 0)
