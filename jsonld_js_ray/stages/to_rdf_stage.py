"""ExpandToRdf actor stage: JSON-LD docs → Arrow quad batches.

THE flagship per-document map (SURVEY.md §2.1 toRDF row): a callable
class for ``map_batches(..., concurrency=N)`` — an actor pool whose
per-worker state is the processed-context cache (the reference's
resolved-context LRU, lib/jsonld.js:86-89, lives per actor here).

Per document: expand → node map → quads (lib/toRdf.js semantics) →
URDNA2015 canonical blank-node labels → conv-scoped label namespace
(`_:{fp}-c14nN`, following the reference's per-doc `_:b{i}-` relabel
precedent in merge, lib/jsonld.js:805-807) so labels are globally unique
across the cluster while staying deterministic per conversation.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any

import pyarrow as pa

from ..core import canonize as _canonize
from ..core import context as _ctx
from ..core import expand as _expand
from ..core import to_rdf as _to_rdf

QUAD_SCHEMA = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj_kind", pa.string()),       # 'iri' | 'bnode' | 'literal'
    ("obj_value", pa.large_string()),
    ("obj_datatype", pa.string()),   # None unless literal
    ("obj_lang", pa.string()),       # None unless rdf:langString
    ("graph", pa.string()),          # '@default' or graph IRI / bnode
    ("conv_id", pa.string()),
])


_WORKER_SINGLETON: "ToRdfActor | None" = None


def to_rdf_task_fn(batch: pa.Table, canonicalize: bool = True,
                   skip_errors: bool = False) -> pa.Table:
    """Task-pool variant of the ToRdf stage: a per-WORKER-PROCESS
    singleton holds the context caches (Ray reuses worker processes, so
    state stays warm across tasks like an actor, but scheduling remains
    elastic — no pool ramp-up, no CPU reservation starving the shuffle).

    Measured on sf0.1/32cpus: tasks 4.4s vs autoscaling actor pool
    9-13s. Actor mode (``build_quads(compute='actors')``) remains for
    genuinely expensive per-worker state (real linker models)."""
    return _worker_actor(canonicalize, skip_errors)(batch)


def _worker_actor(canonicalize: bool, skip_errors: bool) -> "ToRdfActor":
    global _WORKER_SINGLETON
    if _WORKER_SINGLETON is None or \
            _WORKER_SINGLETON.canonicalize != canonicalize or \
            _WORKER_SINGLETON.skip_errors != skip_errors:
        _WORKER_SINGLETON = ToRdfActor(canonicalize=canonicalize,
                                       skip_errors=skip_errors)
    return _WORKER_SINGLETON


def rows_from_parsed_task_fn(conv_ids: list, docs: list,
                             canonicalize: bool = True,
                             skip_errors: bool = False) -> pa.Table:
    """Task-pool ToRdf over ALREADY-PARSED documents (the fused
    line-connector path: the reader derives conv_id from the parsed
    line and hands the object straight in, so each document's JSON
    parses exactly once end-to-end)."""
    return _worker_actor(canonicalize, skip_errors).rows_from_docs(
        conv_ids, docs, parsed=True)


def conv_fingerprint(conv_id: str) -> str:
    return hashlib.sha1(conv_id.encode("utf-8")).hexdigest()[:10]


def _namespace_label(label: str, fp: str) -> str:
    return f"_:{fp}-{label[2:]}"


class ToRdfActor:
    """(conv_id, doc_json) batches → quad-table batches."""

    def __init__(self, canonicalize: bool = True,
                 namespace_bnodes: bool = True,
                 rdf_direction: str | None = None,
                 skip_errors: bool = False) -> None:
        self.canonicalize = canonicalize
        self.namespace_bnodes = namespace_bnodes
        # poison-pill quarantine: with skip_errors=True a document that
        # fails (malformed JSON-LD, canonicalization complexity limit)
        # is logged and skipped instead of failing the whole shard —
        # the 100 TB posture; correctness-gated queries keep the
        # default raise
        self.skip_errors = skip_errors
        self.errors = 0
        # per-actor caches, warm across batches
        self.resolver = _ctx.ContextResolver(cache={})
        self.options: dict[str, Any] = {
            "base": "",
            "processingMode": "json-ld-1.1",
            "contextResolver": self.resolver,
            "rdfDirection": rdf_direction,
        }
        self._initial_ctx = _ctx.ActiveContext(self.options)

    def doc_to_quads(self, doc: Any, conv_id: str) -> list[tuple]:
        active_ctx = self._initial_ctx
        expanded = _expand.expand(active_ctx, doc, None, self.options)
        if isinstance(expanded, dict) and len(expanded) == 1 and \
                "@graph" in expanded:
            expanded = expanded["@graph"]
        if expanded is None:
            expanded = []
        if not isinstance(expanded, list):
            expanded = [expanded]
        quads = _to_rdf.to_rdf(expanded, self.options)
        if self.canonicalize:
            quads = _canonize.relabel_dataset(quads)
        if self.namespace_bnodes:
            fp = conv_fingerprint(conv_id)
            quads = [
                tuple(
                    ("BlankNode", _namespace_label(t[1], fp))
                    if (t is not None and t[0] == "BlankNode") else t
                    for t in q
                )
                for q in quads
            ]
        return quads

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.rows_from_docs(batch["conv_id"].to_pylist(),
                                   batch["doc_json"].to_pylist(),
                                   parsed=False)

    def rows_from_docs(self, conv_ids: list, docs: list,
                       parsed: bool) -> pa.Table:
        """(conv_id, doc) pairs → quad-table batch. ``parsed=False``
        takes JSON strings (the standard column contract);
        ``parsed=True`` takes already-loaded objects (fused line
        reader — no second json.loads)."""
        subj: list[str] = []
        pred: list[str] = []
        obj_kind: list[str] = []
        obj_value: list[str] = []
        obj_datatype: list[str | None] = []
        obj_lang: list[str | None] = []
        graph: list[str] = []
        out_conv: list[str] = []

        for conv_id, doc_json in zip(conv_ids, docs):
            try:
                doc = doc_json if parsed else json.loads(doc_json)
                quads = self.doc_to_quads(doc, conv_id)
            except Exception as e:
                if not self.skip_errors:
                    raise
                import warnings
                self.errors += 1
                warnings.warn(
                    f"skipping poisoned conversation {conv_id!r}: "
                    f"{type(e).__name__}: {str(e)[:200]}")
                continue
            for q in quads:
                s, p, o, g = q
                if o is None:
                    # relative IRI inside a @list — invalid RDF, dropped
                    # at the columnar boundary (reference keeps a null
                    # placeholder in its in-memory quad array)
                    continue
                subj.append(s[1])
                pred.append(p[1])
                if o[0] == "Literal":
                    obj_kind.append("literal")
                    obj_value.append(o[1])
                    obj_datatype.append(o[2])
                    obj_lang.append(o[3])
                else:
                    obj_kind.append("bnode" if o[0] == "BlankNode"
                                    else "iri")
                    obj_value.append(o[1])
                    obj_datatype.append(None)
                    obj_lang.append(None)
                graph.append("@default" if g[0] == "DefaultGraph" else g[1])
                out_conv.append(conv_id)

        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj_kind": pa.array(obj_kind, pa.string()),
            "obj_value": pa.array(obj_value, pa.large_string()),
            "obj_datatype": pa.array(obj_datatype, pa.string()),
            "obj_lang": pa.array(obj_lang, pa.string()),
            "graph": pa.array(graph, pa.string()),
            "conv_id": pa.array(out_conv, pa.string()),
        })
