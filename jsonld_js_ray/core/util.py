"""Shared helpers: blank-node identifier issuer, value add/compare, clones.

Reimplements (from public JSON-LD 1.1 API / RDF canonicalization specs) the
helpers the reference uses from /root/reference/lib/util.js — notably
``IdentifierIssuer`` which the fork removed (util.js:9,26 commented out) yet
still uses at toRdf.js:50, nodeMap.js:28, frame.js:43.
"""

from __future__ import annotations

from typing import Any

from . import types as _t


class IdentifierIssuer:
    """Deterministic identifier issuer: first-seen ordering, ``prefix0..n``.

    Mirrors rdf-canonize's IdentifierIssuer semantics (used via
    util.js / toRdf.js:50): issues `_:b0`, `_:b1`, ... in the order
    identifiers are first requested.
    """

    __slots__ = ("prefix", "counter", "existing", "order")

    def __init__(self, prefix: str = "_:b") -> None:
        self.prefix = prefix
        self.counter = 0
        self.existing: dict[str, str] = {}
        self.order: list[str] = []

    def get_id(self, old: str | None = None) -> str:
        if old is not None and old in self.existing:
            return self.existing[old]
        identifier = f"{self.prefix}{self.counter}"
        self.counter += 1
        if old is not None:
            self.existing[old] = identifier
            self.order.append(old)
        return identifier

    def has_id(self, old: str) -> bool:
        return old in self.existing

    def get_old_ids(self) -> list[str]:
        return list(self.order)

    def clone(self) -> "IdentifierIssuer":
        dup = IdentifierIssuer(self.prefix)
        dup.counter = self.counter
        dup.existing = dict(self.existing)
        dup.order = list(self.order)
        return dup


def as_array(v: Any) -> list:
    """Wrap non-list values into a list (util.js:75-77)."""
    return v if isinstance(v, list) else [v]


def deep_clone(v: Any) -> Any:
    """Deep-copy a JSON tree (util.js clone); dicts/lists/scalars only."""
    if isinstance(v, dict):
        return {k: deep_clone(x) for k, x in v.items()}
    if isinstance(v, list):
        return [deep_clone(x) for x in v]
    return v


_MISSING = object()


def _js_strict_eq(a: Any, b: Any) -> bool:
    """JS ``===`` on JSON values: dicts/lists compare by IDENTITY,
    primitives by value with type discrimination (true !== 1;
    undefined !== null is handled by the _MISSING defaults at the
    call sites)."""
    if isinstance(a, (dict, list)) or isinstance(b, (dict, list)):
        return a is b
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    return a == b


def compare_values(v1: Any, v2: Any) -> bool:
    """JSON-LD value equality (util.js:385-409).

    True iff: both are identical primitives; both @value objects with
    STRICTLY equal @value/@type/@language/@index; or both objects with
    strictly equal @id. Each component compares with JS ``===``
    semantics — a non-scalar component (an @json @value, or the fork's
    broken array-valued @type) matches only by object identity, so two
    structurally equal but distinct such value objects are NOT
    duplicates (flatten fuzz seed 3031914: the reference keeps both
    copies where a deep comparison would merge them).
    """
    if v1 is v2:
        return True
    if (
        _t.is_scalar(v1)
        and _t.is_scalar(v2)
        and v1 == v2
        and isinstance(v1, bool) == isinstance(v2, bool)
    ):
        return True
    if _t.is_value(v1) and _t.is_value(v2):
        return all(
            _js_strict_eq(v1.get(k, _MISSING), v2.get(k, _MISSING))
            for k in ("@value", "@type", "@language", "@index")
        )
    if (
        isinstance(v1, dict)
        and "@id" in v1
        and isinstance(v2, dict)
        and "@id" in v2
    ):
        return _js_strict_eq(v1["@id"], v2["@id"])
    return False


def has_value(subject: dict, prop: str, value: Any) -> bool:
    """True if subject[prop] contains value per compare_values
    (util.js:227-247)."""
    if prop not in subject:
        return False
    val = subject[prop]
    is_list = _t.is_list(val)
    if is_list or isinstance(val, list):
        items = val["@list"] if is_list else val
        # fast path: subject references dedup on @id alone (hot in
        # node-map construction)
        if isinstance(value, dict) and len(value) == 1 and "@id" in value:
            vid = value["@id"]
            return any(isinstance(it, dict) and it.get("@id") == vid
                       and "@id" in it for it in items)
        return any(compare_values(value, item) for item in items)
    if not isinstance(value, list):
        return compare_values(value, val)
    return False


def add_value(
    subject: dict,
    prop: str,
    value: Any,
    property_is_array: bool = False,
    value_is_array: bool = False,
    allow_duplicate: bool = True,
    prepend_value: bool = False,
) -> None:
    """Add a value to a subject property (util.js:249-306)."""
    if value_is_array:
        subject[prop] = value
        return
    if isinstance(value, list):
        if len(value) == 0 and property_is_array and prop not in subject:
            subject[prop] = []
        if prepend_value:
            value = value + as_array(subject.get(prop, []))
            subject[prop] = []
        for v in value:
            add_value(
                subject, prop, v,
                property_is_array=property_is_array,
                allow_duplicate=allow_duplicate,
            )
        return
    if prop in subject:
        has_dup = not allow_duplicate and has_value(subject, prop, value)
        if not isinstance(subject[prop], list) and (not has_dup or property_is_array):
            subject[prop] = [subject[prop]]
        if not has_dup:
            if prepend_value:
                subject[prop].insert(0, value)
            else:
                subject[prop].append(value)
    else:
        subject[prop] = [value] if property_is_array else value


def get_values(subject: dict, prop: str) -> list:
    return as_array(subject.get(prop, []))


def remove_property(subject: dict, prop: str) -> None:
    subject.pop(prop, None)


def remove_value(subject: dict, prop: str, value: Any,
                 property_is_array: bool = False) -> None:
    """Remove a value from subject[prop] (util.js:330-356)."""
    values = [v for v in get_values(subject, prop) if not compare_values(v, value)]
    if len(values) == 0:
        remove_property(subject, prop)
    elif len(values) == 1 and not property_is_array:
        subject[prop] = values[0]
    else:
        subject[prop] = values


def compare_shortest_least(a: str, b: str) -> int:
    """Sort key comparator: shortest first, then lexicographically least
    (util.js:419-430)."""
    if len(a) < len(b):
        return -1
    if len(b) < len(a):
        return 1
    if a == b:
        return 0
    return -1 if a < b else 1


def relabel_blank_nodes(entry: Any, issuer: IdentifierIssuer | None = None) -> Any:
    """Relabel every blank node in a JSON tree via the issuer
    (util.js:365-369,440-464). Mutates and returns entry."""
    issuer = issuer or IdentifierIssuer()

    def _label(node: Any) -> Any:
        if isinstance(node, list):
            return [_label(e) for e in node]
        if isinstance(node, dict):
            if "@id" in node and isinstance(node["@id"], str) and \
                    node["@id"].startswith("_:"):
                node["@id"] = issuer.get_id(node["@id"])
            for k in node:
                if k != "@id":
                    node[k] = _label(node[k])
        return node

    return _label(entry)


def freeze(v: Any) -> Any:
    """Hashable deep-frozen form of a JSON value (for dedup/cache keys)."""
    if isinstance(v, dict):
        return tuple(sorted((k, freeze(x)) for k, x in v.items()))
    if isinstance(v, list):
        return tuple(freeze(x) for x in v)
    return v


__all__ = [
    "IdentifierIssuer", "as_array", "deep_clone", "compare_values",
    "has_value", "add_value", "get_values", "remove_property", "remove_value",
    "compare_shortest_least", "relabel_blank_nodes", "freeze",
]
