"""RFC 8785 (JCS) JSON canonicalization.

The reference delegates @json-literal serialization to the `canonicalize`
npm package (/root/reference/package.json:33, lib/toRdf.js:9,232).  This is
a from-scratch implementation of the same spec: object members sorted by
UTF-16 code units, minimal string escapes, ECMAScript Number::toString
serialization for numbers.
"""

from __future__ import annotations

import math
from typing import Any

_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _escape_string(s: str) -> str:
    out = ['"']
    for ch in s:
        if ch in _ESCAPES:
            out.append(_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def es_number_to_string(v: float | int) -> str:
    """ECMAScript Number::toString(10) for finite numbers (RFC 8785 §3.2.2.3).

    Matches JS formatting: integral values < 1e21 print without '.', shortest
    round-trip decimal otherwise, exponent form without leading zeros.
    """
    if isinstance(v, int) and not isinstance(v, bool):
        # an ES Number IS a float64 — a Python bigint (2^53+1) must
        # round through it first, like JSON.parse already did on the
        # JS side (reference-verified: {"big":9007199254740993}
        # canonicalizes to ...992)
        if abs(v) < 10**21 and int(float(v)) == v:
            return str(v)
        v = float(v)
        if v.is_integer() and abs(v) < 1e21:
            return str(int(v))
    if v != v or math.isinf(v):
        raise ValueError("NaN/Infinity not allowed in JCS")
    if v == 0:
        return "0"
    if float(v).is_integer() and abs(v) < 1e21:
        return str(int(v))
    # Python repr gives the shortest round-trip digits, like ES, but
    # switches to exponent form at 1e-5 where ES stays decimal: ES uses
    # decimal notation for 1e-6 <= |x| < 1e21 (Number::toString step 8),
    # exponent notation outside.
    s = repr(float(v))
    if "e" not in s:
        return s
    mant, exp = s.split("e")
    expi = int(exp)
    neg = mant.startswith("-")
    digits = mant.lstrip("-").replace(".", "").rstrip("0") or "0"
    if -7 < expi < 21:
        # expand to plain decimal (repr only uses e-notation for
        # |exp| >= 5ish, so expi < 0 here in practice)
        if expi < 0:
            zeros = -expi - 1
            s = "0." + "0" * zeros + digits
        else:
            s = digits + "0" * (expi - len(digits) + 1)
        return ("-" + s) if neg else s
    if mant.endswith(".0"):
        mant = mant[:-2]
    return f"{mant}e+{expi}" if expi >= 0 else f"{mant}e-{-expi}"


def canonicalize(value: Any) -> str:
    """Serialize a JSON value per RFC 8785."""
    if value is None:
        return "null"
    if value is True:
        return "true"
    if value is False:
        return "false"
    if isinstance(value, str):
        return _escape_string(value)
    if isinstance(value, (int, float)):
        if isinstance(value, float) and (value != value or math.isinf(value)):
            return "null"   # JSON.stringify(NaN/Infinity) — npm canonicalize
        return es_number_to_string(value)
    if isinstance(value, list):
        return "[" + ",".join(canonicalize(v) for v in value) + "]"
    if isinstance(value, dict):
        # sort keys by UTF-16 code units
        def key16(k: str) -> tuple[int, ...]:
            return tuple(
                x
                for ch in k
                for x in (
                    (ord(ch),) if ord(ch) < 0x10000 else (
                        0xD800 + ((ord(ch) - 0x10000) >> 10),
                        0xDC00 + ((ord(ch) - 0x10000) & 0x3FF),
                    )
                )
            )

        items = sorted(value.items(), key=lambda kv: key16(kv[0]))
        return "{" + ",".join(
            _escape_string(k) + ":" + canonicalize(v) for k, v in items
        ) + "}"
    raise TypeError(f"cannot canonicalize value of type {type(value)!r}")
