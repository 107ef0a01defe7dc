"""Out-of-band differential fuzz over REMOTE CONTEXT RESOLUTION: a
per-seed graph of context documents served through the preloaded
document loader, consumed by an expand over a URL-context document.

Shapes per seed (seed-scoped URL namespace — the fork's SHARED
_resolvedContextCache is order-dependent across documents reusing a
URL, a triaged reference bug; unique URLs keep each seed clean):
  seed % 5 == 0  context chain: doc -> ctxB whose @context is
                 [ctxA-url, inline]
  seed % 5 == 1  @import of a remote context + local overrides
  seed % 5 == 2  term-SCOPED remote context (term's @context is a URL)
  seed % 5 == 3  array of two distinct remote context URLs
  seed % 5 == 4  doc itself fetched by URL, carrying a remote context
                 (documentUrl base interplay)

The inline context bodies come from the shared fuzz generator, so
term shapes (containers, coercions, protected, scoped) vary per seed.

Usage: python tools/fuzz_remotectx_sweep.py <seed_lo> <seed_hi> [chunk]

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

from test_fuzz_parity import HARNESS_DIR, _gen_context, _gen_doc  # noqa: E402

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
n_total = n_div = n_nocode = n_refcrash = 0


def _case_for(s: int):
    rng = random.Random(s * 53 + 11)
    u = f"https://ctx{s}.test/"
    ctx_a = _gen_context(rng)
    ctx_b = _gen_context(rng)
    # salt every context's CONTENT per seed: the fork's shared
    # _resolvedContextCache is content-keyed and its @import path
    # MUTATES cached entries (setProcessed of the merged ctx), so two
    # seeds generating identical context values poison each other
    # inside one harness process — the same triaged reference bug the
    # order-independence pin covers, which unique content sidesteps
    for c in (ctx_a, ctx_b):
        if isinstance(c, dict):
            c[f"uniq{s}"] = f"http://uniq.test/{s}"
    doc = _gen_doc(s)
    if isinstance(doc, dict):
        doc.pop("@context", None)
    shape = s % 5
    docs = {u + "a": {"@context": ctx_a}}
    if shape == 0:
        docs[u + "b"] = {"@context": [u + "a", ctx_b]}
        input_ = {"@context": u + "b", **(doc if isinstance(doc, dict)
                                          else {"http://e/p": doc})}
    elif shape == 1:
        if not isinstance(ctx_a, dict):
            ctx_a = {"t": "http://e/t"}
            docs[u + "a"] = {"@context": ctx_a}
        imp = {"@import": u + "a"}
        if isinstance(ctx_b, dict):
            imp.update({k: v for k, v in ctx_b.items()
                        if not k.startswith("@")})
        docs[u + "c"] = {"@context": imp}
        input_ = {"@context": u + "c", **(doc if isinstance(doc, dict)
                                          else {"http://e/p": doc})}
    elif shape == 2:
        input_ = {"@context": {"s": {"@id": "http://e/s",
                                     "@context": u + "a"}},
                  "s": doc if isinstance(doc, dict) else {"x": doc}}
    elif shape == 3:
        docs[u + "b"] = {"@context": ctx_b}
        input_ = {"@context": [u + "a", u + "b"],
                  **(doc if isinstance(doc, dict)
                     else {"http://e/p": doc})}
    else:
        body = {"@context": u + "a",
                **(doc if isinstance(doc, dict)
                   else {"http://e/p": doc})}
        docs[u + "doc"] = body
        input_ = u + "doc"
    return input_, docs


def _ref_raw_crash(ref) -> bool:
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in str(ref.get("error", ""))
                 or "Cannot read" in str(ref.get("error", ""))
                 or "of undefined" in str(ref.get("error", ""))))


for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    cases = [_case_for(s) for s in seeds]
    reqs = [{"op": "expand", "input": inp, "documents": docs,
             "options": {}}
            for inp, docs in cases]
    proc = subprocess.run(
        ["node", os.path.join(HARNESS_DIR, "ref_run.js")],
        input="\n".join(json.dumps(r) for r in reqs),
        capture_output=True, text=True,
        timeout=max(600, int(2.4 * chunk)),
        env={**os.environ,
             "NODE_PATH": os.path.join(HARNESS_DIR, "node_modules")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = [json.loads(x) for x in proc.stdout.strip().split("\n")]
    for s, (inp, docs), ref in zip(seeds, cases, results):
        n_total += 1
        try:
            mine = api.expand(json.loads(json.dumps(inp)),
                              {"documents": json.loads(json.dumps(docs))})
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif not ref["ok"]:
                n_div += 1
                print("DIV remotectx engine-ok-ref-error", s,
                      ref.get("code"), str(ref.get("error"))[:120])
            elif json.loads(json.dumps(mine)) != ref["result"]:
                n_div += 1
                print("DIV remotectx value", s)
        except JsonLdError as e:
            if _ref_raw_crash(ref):
                n_refcrash += 1
            elif ref["ok"]:
                n_div += 1
                print("DIV remotectx engine-error-ref-ok", s, e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV remotectx code", s, e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs, "
          f"{n_div} divergences, {n_refcrash} ref-raw-crash / "
          f"{n_nocode} no-code skips", flush=True)
print(f"DONE {n_total} docs, {n_div} divergences, {n_refcrash} "
      f"ref-raw-crash / {n_nocode} no-code skips")
sys.exit(1 if n_div else 0)
