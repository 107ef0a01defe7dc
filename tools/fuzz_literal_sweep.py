"""Out-of-band differential fuzz over LITERAL LEXICAL FORMS: random
(often non-canonical) literal strings × datatypes through fromRdf
under the useNativeTypes × useRdfType matrix.

The doc-level fromRdf sweep builds its quads with the engine's own
toRdf, so literal lexicals there are always canonical; this axis is
what found-class bugs like the float64 isNumeric gate (types.js:64
semantics: radix prefixes convert via parseFloat, overflow forms stay
strings) actually need — adversarial lexicals the serializer would
never emit.

Per seed: 4 quads with generated lexicals over a datatype drawn from
{xsd:integer, xsd:double, xsd:boolean, xsd:string, rdf:JSON (valid
JSON only — both sides raise identically on invalid), i18n-datatype,
a custom IRI}; options cycle useNativeTypes × useRdfType ×
rdfDirection.

Compare: Python-== deep equality (JS has ONE number type, so 1000
and 1000.0 are the same value; json.dumps textual compare would
false-positive).

Usage: python tools/fuzz_literal_sweep.py <seed_lo> <seed_hi> [chunk]

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

from test_fuzz_parity import HARNESS_DIR  # noqa: E402

from jsonld_js_ray import api  # noqa: E402
from jsonld_js_ray.core.errors import JsonLdError  # noqa: E402

XSD = "http://www.w3.org/2001/XMLSchema#"
I18N = "https://www.w3.org/ns/i18n#"
DTYPES = [XSD + "integer", XSD + "double", XSD + "boolean",
          XSD + "string", XSD + "decimal",
          "http://www.w3.org/1999/02/22-rdf-syntax-ns#JSON",
          I18N + "en_ltr", I18N + "_rtl", "http://ex.test/custom"]

PIECES = ["0", "1", "5", "9007199254740993", "007", "-0", "+", "-",
          ".", "e", "E", "x", "b", "o", "10", "3.14", "1e3", "1e310",
          "Infinity", "NaN", "true", "false", " ", "abc", "_", "A",
          "\t", "0x", "2f"]


def _lex(rng: random.Random) -> str:
    n = rng.randint(1, 5)
    return "".join(rng.choice(PIECES) for _ in range(n))


def _quads_for(s: int):
    rng = random.Random(s * 77 + 5)
    quads = []
    for k in range(4):
        dt = rng.choice(DTYPES)
        if dt.endswith("JSON"):
            lex = json.dumps(rng.choice(
                [1, [True, None], {"a": rng.random()}, "s"]))
        else:
            lex = _lex(rng)
        quads.append(
            (("NamedNode", f"http://e/s{k % 2}"),
             ("NamedNode", f"http://e/p{k}"),
             ("Literal", lex, dt, None),
             ("DefaultGraph", "")))
    return quads


def _opts_for(s: int) -> dict:
    return {"useNativeTypes": bool(s & 1),
            "useRdfType": bool(s & 2),
            **({"rdfDirection": "i18n-datatype"} if s % 3 == 0 else {})}


def _f64(x):
    """Normalize numeric leaves through float64 on BOTH sides: JS has
    one number type, and its shortest-repr JSON of a >2^53 double
    (e.g. 90071992547409940) reads back in Python as an exact int
    that != the engine's float64 under ==; float() restores the
    original double bit-for-bit on both sides."""
    if isinstance(x, bool):
        return x
    if isinstance(x, (int, float)):
        return float(x)
    if isinstance(x, list):
        return [_f64(v) for v in x]
    if isinstance(x, dict):
        return {k: _f64(v) for k, v in x.items()}
    return x


lo, hi = int(sys.argv[1]), int(sys.argv[2])
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
n_total = n_div = n_nocode = 0

for base in range(lo, hi, chunk):
    seeds = range(base, min(base + chunk, hi))
    payload = []
    for s in seeds:
        quads = _quads_for(s)
        payload.append({"op": "fromRdf",
                        "input": [[list(t) for t in q] for q in quads],
                        "options": _opts_for(s)})
    proc = subprocess.run(
        ["node", os.path.join(HARNESS_DIR, "ref_run.js")],
        input="\n".join(json.dumps(r) for r in payload),
        capture_output=True, text=True, timeout=max(600, int(2.4 * chunk)),
        env={**os.environ,
             "NODE_PATH": os.path.join(HARNESS_DIR, "node_modules")},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = [json.loads(x) for x in proc.stdout.strip().split("\n")]
    for s, ref in zip(seeds, results):
        n_total += 1
        quads = _quads_for(s)
        try:
            mine = api.from_rdf(quads, _opts_for(s))
            if not ref["ok"]:
                n_div += 1
                print("DIV literal engine-ok-ref-error", s,
                      ref.get("code"), str(ref.get("error"))[:120])
            elif _f64(json.loads(json.dumps(mine))) != \
                    _f64(ref["result"]):
                n_div += 1
                print("DIV literal value", s)
                print("  mine:", json.dumps(mine, default=str)[:240])
                print("  ref :", json.dumps(ref["result"])[:240])
        except JsonLdError as e:
            if ref["ok"]:
                n_div += 1
                print("DIV literal engine-error-ref-ok", s, e.code)
            elif ref.get("code") and e.code != ref["code"]:
                n_div += 1
                print("DIV literal code", s, e.code, ref["code"])
            elif not ref.get("code"):
                n_nocode += 1
    print(f"chunk {base}..{seeds[-1]}: cumulative {n_total} quadsets, "
          f"{n_div} divergences, {n_nocode} no-code skips", flush=True)
print(f"DONE {n_total} quadsets, {n_div} divergences, "
      f"{n_nocode} no-code skips")
sys.exit(1 if n_div else 0)
