"""Out-of-band differential FRAME fuzz vs the reference: for each
seed, frame the generated doc with an independently generated frame
(random @embed mode including @link) and compare the DECYCLED outputs
deep-equal — @embed:'@link' creates shared/cyclic structures that
cannot round-trip plain JSON, so both sides apply the same
deterministic decycle (an ancestor back-reference on the current path
becomes {'@cycle': its @id}); the harness op ``frameDecycled`` mirrors
the transform in JS (tests/test_frame_link_parity.py pins the
committed 120-case corpus; this tool sweeps fresh ranges).

Skip classes (counted, never parity):
  - reference native stack overflow on cyclic data graphs ('Maximum
    call stack size exceeded' — the fork's compact recurses forever
    over linked results; this engine terminates)
  - the fork's raw-JS-TypeError crash class (same rule as
    tools/fuzz_sweep.py)

Usage: python tools/fuzz_frame_sweep.py <seed_lo> <seed_hi> [chunk]

Recorded runs (2026-08-19, round-5 second sitting): seeds
3200000..3260500 — 60,500 docs clean at fixed HEADs (plus the
finding pass). The axis found TWO engine bugs on its first pass:
seed 3201777 crashed cleanup_null on an index-map entry keyed "@id"
(fixed — JS String() link-key coercion in core/frame.py) and, with
seeds 3200865 etc. (12 total), exposed the compact re-entrancy guard
acting as an identity cache / closing cycles one node early (fixed —
per-element frame stack in core/compact.py, one re-entrant
recompaction like the reference, short-circuit at depth 2 where the
reference natively overflows). Ranges re-ran clean at the fixed
HEADs; regressions in tests/test_sweep_findings_r5b.py.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_frame_link_parity import _gen_frame, decycle  # noqa: E402
from test_fuzz_parity import HARNESS_DIR, _gen_doc  # noqa: E402

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
n_total = 0
n_div = 0
n_nocode = 0
n_refcrash = 0
n_stack = 0


def _ref_raw_crash(ref) -> bool:
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    frames = [_gen_frame(s * 41 + 13) for s in seeds]
    reqs = [{"op": "frameDecycled", "input": d, "frame": f}
            for d, f in zip(docs, frames)]
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
    for i, (doc, frame) in enumerate(zip(docs, frames)):
        n_total += 1
        ref = results[i]
        if not ref["ok"] and "call stack" in str(ref.get("error", "")):
            n_stack += 1
            continue
        try:
            mine = decycle(api.frame(json.loads(json.dumps(doc)),
                                     json.loads(json.dumps(frame))),
                           set())
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV frame engine-ok-ref-error", seeds[i],
                      ref["error"][:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV frame value", seeds[i])
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV frame engine-error-ref-ok", seeds[i], e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV frame code", seeds[i], e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
        except RecursionError:
            if ref["ok"]:
                n_div += 1
                print("DIV frame engine-recursion-ref-ok", seeds[i])
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_stack} ref-stack-overflow / "
          f"{n_refcrash} ref-raw-crash / {n_nocode} no-code skips",
          flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_stack} "
      f"ref-stack-overflow / {n_refcrash} ref-raw-crash / "
      f"{n_nocode} no-code skips")
sys.exit(1 if n_div else 0)
