"""API factory + WebIDL ``JsonLdProcessor`` façade.

Mirrors the reference's isolated-instance semantics
(/root/reference/lib/jsonld.js:1051-1060 — ``factory()`` returns a new
jsonld API whose registries/caches are separate from the default
instance) and the WebIDL processor interface
(/root/reference/lib/JsonLdProcessor.js:29-49 — promise-style
``expand``/``compact``/``flatten`` with arity TypeErrors and the
``[object JsonLdProcessor]`` string tag).

The engine's only process-global mutable state is the RDF parser
registry (core caches live on each ActiveContext), so instance isolation
= a per-instance parser registry threaded through ``options``.
"""

from __future__ import annotations

from typing import Any

from . import api as _api
from .core import nquads as _nq


class JsonLdInstance:
    """An isolated jsonld API instance (reference ``factory()``)."""

    def __init__(self) -> None:
        self._rdf_parsers: dict[str, Any] = {
            "application/n-quads": _nq.parse,
            "application/nquads": _nq.parse,
        }

    # --- instance registry (lib/jsonld.js:1000-1011) ---

    def register_rdf_parser(self, content_type: str, parser: Any) -> None:
        self._rdf_parsers[content_type] = parser

    registerRDFParser = register_rdf_parser

    def unregister_rdf_parser(self, content_type: str) -> None:
        self._rdf_parsers.pop(content_type, None)

    unregisterRDFParser = unregister_rdf_parser

    def _opts(self, options: dict | None) -> dict:
        return {**(options or {}), "rdfParsers": self._rdf_parsers}

    # --- API surface (delegates; registries scoped to this instance) ---

    def expand(self, input_: Any, options: dict | None = None):
        return _api.expand(input_, self._opts(options))

    def compact(self, input_: Any, ctx: Any, options: dict | None = None):
        return _api.compact(input_, ctx, self._opts(options))

    def flatten(self, input_: Any, ctx: Any = None,
                options: dict | None = None):
        return _api.flatten(input_, ctx, self._opts(options))

    def frame(self, input_: Any, frame: Any, options: dict | None = None):
        return _api.frame(input_, frame, self._opts(options))

    def link(self, input_: Any, ctx: Any = None,
             options: dict | None = None):
        return _api.link(input_, ctx, self._opts(options))

    def normalize(self, input_: Any, options: dict | None = None):
        return _api.canonize(input_, self._opts(options))

    canonize = normalize

    def to_rdf(self, input_: Any, options: dict | None = None):
        return _api.to_rdf(input_, self._opts(options))

    toRDF = to_rdf

    def from_rdf(self, dataset: Any, options: dict | None = None):
        return _api.from_rdf(dataset, self._opts(options))

    fromRDF = from_rdf

    def merge(self, docs: list, ctx: Any = None,
              options: dict | None = None):
        return _api.merge(docs, ctx, self._opts(options))

    def create_node_map(self, input_: Any, options: dict | None = None):
        return _api.create_node_map(input_, self._opts(options))

    createNodeMap = create_node_map

    def process_context(self, active_ctx: Any, local_ctx: Any,
                        options: dict | None = None):
        return _api.process_context(active_ctx, local_ctx,
                                    self._opts(options))

    processContext = process_context


def factory() -> JsonLdInstance:
    """A new isolated jsonld API instance (separate parser registry)."""
    return JsonLdInstance()


class JsonLdProcessor:
    """WebIDL JsonLdProcessor interface
    (https://www.w3.org/TR/json-ld11-api/#the-jsonldprocessor-interface;
    reference lib/JsonLdProcessor.js:29-49). Methods raise ``TypeError``
    on missing required arguments, like the reference's promise
    rejections."""

    _MISSING = object()

    @classmethod
    def expand(cls, input_: Any = _MISSING, options: dict | None = None):
        if input_ is cls._MISSING:
            raise TypeError("Could not expand, too few arguments.")
        return _api.expand(input_, options)

    @classmethod
    def compact(cls, input_: Any = _MISSING, ctx: Any = _MISSING,
                options: dict | None = None):
        if input_ is cls._MISSING or ctx is cls._MISSING:
            raise TypeError("Could not compact, too few arguments.")
        return _api.compact(input_, ctx, options)

    @classmethod
    def flatten(cls, input_: Any = _MISSING, ctx: Any = None,
                options: dict | None = None):
        if input_ is cls._MISSING:
            raise TypeError("Could not flatten, too few arguments.")
        return _api.flatten(input_, ctx, options)

    def __str__(self) -> str:        # reference toString()
        return "[object JsonLdProcessor]"

    toString = __str__
