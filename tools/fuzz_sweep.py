"""Out-of-band differential fuzz over FRESH seed ranges (not the
committed test's 1000..1250): expand + toRdf parity vs the reference,
in chunks so node memory stays bounded.
Usage: python tools/fuzz_sweep.py <seed_lo> <seed_hi> [chunk]

Skips are counted per OP (each doc runs two ops, expand and toRdf),
so the reported compared-op count reconciles exactly with the
skip totals.

Recorded runs (2026-08-18/19): eighteen fresh-seed ranges covering
seeds 50000..1102200 — 1,050,000 docs / 2,100,000 ops total (a
million-document differential campaign; range seventeen ran 100k
docs clean at the set-semantics-fixed HEAD; range eighteen 50k docs
clean, 16 null-quad op skips, in the round-5 second sitting). Seed 864917 in range sixteen surfaced the ONE
finding of the whole campaign — not an engine bug but a comparison-
semantics gap: the reference fork emits a DUPLICATE value-quad
through its broken @type-container+@list path, and canonizing the
in-memory multiset (instead of the set rdf-canonize sees after its
deduping N-Quads parse) perturbed the labels. Fixed by treating the
canonicalization input as a set (core/canonize.relabel_dataset, per
RDF 1.1 Concepts §4; regression-pinned in tests/test_review_r5.py);
the range re-runs clean at the fixed HEAD. All other counts: 0
divergences (188 null-quad op skips total, the known reference
list-tail quirk; 0 ref-raw-crash, 0 ref-no-code). The last nine
ranges (332200..1052200, 720k docs / 1.44M ops) ran at round-5 HEADs.
All on top of the committed 250-doc test corpus and the earlier
cumulative 10k-doc round-3 sweep.
"""
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from test_fuzz_parity import (HARNESS_DIR, _gen_doc,  # noqa: E402
                              _ref_quads_to_tuples)

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core import canonize as canonize_mod  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
n_total = 0
n_div = 0
n_nullq = 0
n_refcrash = 0
# ref errored WITHOUT a JsonLdError code (and not the raw-crash
# pattern) while the engine also errored: both sides failed but the
# codes are not comparable — counted as a skip, never as parity
n_ref_nocode = 0


def _ref_raw_crash(ref) -> bool:
    # the fork crashes with a RAW JS TypeError (no JsonLdError code) on
    # @container:@type maps with non-string type keys etc. — a known
    # reference bug, not an engine divergence (round-2 notes)
    return (not ref["ok"] and not ref.get("code")
            and ("is not a function" in ref.get("error", "")
                 or "Cannot read" in ref.get("error", "")
                 or "of undefined" in ref.get("error", "")))
for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    docs = [_gen_doc(s) for s in seeds]
    reqs = []
    for doc in docs:
        reqs.append({"op": "expand", "input": doc})
        reqs.append({"op": "toRdf", "input": doc})
    lines = "\n".join(json.dumps(r) for r in reqs)
    proc = subprocess.run(
        ["node", os.path.join(HARNESS_DIR, "ref_run.js")],
        input=lines, capture_output=True, text=True,
        # the committed test budgets 600 s for 500 requests; scale the
        # cap with the chunk's 2*chunk requests instead of fixing it
        timeout=max(600, int(2.4 * chunk)),
        env={**os.environ,
             "NODE_PATH": os.path.join(HARNESS_DIR, "node_modules")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = [json.loads(x) for x in proc.stdout.strip().split("\n")]
    for i, doc in enumerate(docs):
        n_total += 1
        ref_e, ref_r = results[2 * i], results[2 * i + 1]
        try:
            mine = api.expand(json.loads(json.dumps(doc)))
            if _ref_raw_crash(ref_e):
                n_refcrash += 1
            elif not ref_e["ok"]:
                n_div += 1
                print("DIV expand engine-ok-ref-error", seeds[i],
                      ref_e["error"][:120])
            elif json.loads(json.dumps(mine)) != ref_e["result"]:
                n_div += 1
                print("DIV expand value", seeds[i])
        except JsonLdError as e:
            if _ref_raw_crash(ref_e):
                # ref raw-crashed, engine raised a JsonLdError: the
                # doc was never really compared — count the skip
                n_refcrash += 1
            elif ref_e["ok"]:
                n_div += 1
                print("DIV expand engine-error-ref-ok", seeds[i], e.code)
            elif ref_e.get("code") and e.code != ref_e["code"]:
                n_div += 1
                print("DIV expand code", seeds[i], e.code, ref_e["code"])
            elif not ref_e.get("code"):
                n_ref_nocode += 1
        try:
            mine_q = api.to_rdf(json.loads(json.dumps(doc)))
            if _ref_raw_crash(ref_r):
                n_refcrash += 1
            elif not ref_r["ok"]:
                n_div += 1
                print("DIV tordf engine-ok-ref-error", seeds[i],
                      ref_r["error"][:120])
            elif any(t is None for q in ref_r["result"]
                     for t in (q["subject"], q["predicate"],
                               q["object"], q["graph"])):
                # known reference quirk: null-object quad for a
                # relative-IRI list tail — unserializable on the ref
                # side, dropped at serialization on ours; not a
                # divergence (see memory / round-2 notes)
                n_nullq += 1
            else:
                rq = _ref_quads_to_tuples(ref_r["result"])
                if canonize_mod.canonize(mine_q) != \
                        canonize_mod.canonize(rq):
                    n_div += 1
                    print("DIV tordf quads", seeds[i])
        except JsonLdError as e:
            if _ref_raw_crash(ref_r):
                n_refcrash += 1
            elif ref_r["ok"]:
                n_div += 1
                print("DIV tordf engine-error-ref-ok", seeds[i], e.code)
            elif ref_r.get("code") and e.code != ref_r["code"]:
                n_div += 1
                print("DIV tordf code", seeds[i], e.code, ref_r["code"])
            elif not ref_r.get("code"):
                n_ref_nocode += 1
    n_ops = 2 * n_total
    n_skip = n_nullq + n_refcrash + n_ref_nocode
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} docs "
          f"({n_ops} ops, {n_ops - n_skip} compared), "
          f"{n_div} divergences, {n_nullq} null-quad / "
          f"{n_refcrash} ref-raw-crash / {n_ref_nocode} ref-no-code "
          f"op skips", flush=True)
n_ops = 2 * n_total
n_skip = n_nullq + n_refcrash + n_ref_nocode
print(f"DONE {n_total} docs ({n_ops} ops, {n_ops - n_skip} compared), "
      f"{n_div} divergences, {n_nullq} null-quad / {n_refcrash} "
      f"ref-raw-crash / {n_ref_nocode} ref-no-code op skips")
sys.exit(1 if n_div else 0)
