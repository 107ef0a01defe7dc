"""Out-of-band differential EXPAND fuzz under processingMode
json-ld-1.0: the generated corpus leans on 1.1 features (@container
maps, scoped contexts, @protected, @direction...), so 1.0 mode drives
the MODE-GATING branches — most docs must fail on BOTH sides with the
SAME JsonLdError code, and docs that stay valid must expand equal.

Usage: python tools/fuzz_mode10_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs (2026-08-19, round-5 second sitting): seeds
3400000..3420500 — 20,500 docs, 0 divergences, 0 skips of any class
(every doc compared; most error identically on both sides, the rest
expand equal).
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
OPTS = {"processingMode": "json-ld-1.0"}
n_total = 0
n_div = 0
n_nocode = 0
n_refcrash = 0


def _ref_raw_crash(ref) -> bool:
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    reqs = [{"op": "expand", "input": d, "options": dict(OPTS)}
            for d in docs]
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
    for i, doc in enumerate(docs):
        n_total += 1
        ref = results[i]
        try:
            mine = api.expand(json.loads(json.dumps(doc)), dict(OPTS))
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV mode10 engine-ok-ref-error", seeds[i],
                      ref.get("code"), ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV mode10 value", seeds[i])
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV mode10 engine-error-ref-ok", seeds[i], e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV mode10 code", seeds[i], e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_refcrash} ref-raw-crash / "
          f"{n_nocode} both-errored-no-code skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_refcrash} "
      f"ref-raw-crash / {n_nocode} both-errored-no-code skips")
sys.exit(1 if n_div else 0)
