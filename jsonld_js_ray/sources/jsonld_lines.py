"""Newline-delimited JSON-LD document source/sink.

The reference's native input is a parsed JSON-LD document
(``lib/jsonld.js`` expand/toRDF take a JSON object or a URL); at
corpus scale the standard on-disk container for that is
newline-delimited JSON — one complete document per line, sharded
files. This connector writes a (conv_id, doc_json) document Dataset
to ``.jsonl`` shards whose lines are PLAIN JSON-LD documents (no
envelope — the files are directly consumable by the reference or any
other processor) and reads such shards back into the document Dataset
that feeds the engine's ToRdf stage, so a user with a directory of
JSON-LD lines runs the flagship pipeline unchanged.

Document identity on read: the engine's conversation documents carry
their id as the node ``@id`` under ``CONV_ID_NS``
(stages/assemble.py:41); the reader re-derives ``conv_id`` by
stripping that prefix — for THOSE documents identity (and therefore
blank-node namespacing, to_rdf_stage.conv_fingerprint) round-trips
exactly. A FOREIGN document (no ``CONV_ID_NS`` ``@id``) gets a
deterministic sha1 fingerprint of its line instead: a user-assigned
conv_id that is not encoded in the ``@id`` does NOT survive the
round trip (the on-disk format is the plain document, by design),
and byte-identical foreign lines share one identity. Callers who
need a foreign identity preserved must encode it in the document.
"""

from __future__ import annotations

import hashlib
import json

import pyarrow as pa

from ..stages.assemble import CONV_ID_NS


def docs_to_lines(batch: pa.Table) -> pa.Table:
    """(conv_id, doc_json, ...) rows → one raw JSON-LD line per doc.

    ``doc_json`` comes from ``json.dumps`` (assemble stage), which
    escapes embedded newlines — every document is one physical line
    by construction; the guard keeps a foreign multi-line value from
    silently corrupting the shard. The newline scan is a vectorized
    Arrow kernel; only the (normally zero) offending rows pay a
    Python re-dump."""
    import pyarrow.compute as pc

    col = batch["doc_json"]
    bad = pc.or_(pc.match_substring(col, "\n"),
                 pc.match_substring(col, "\r"))
    if not pc.any(bad).as_py():
        return pa.table({"line": col.cast(pa.large_string())})
    bad_np = bad.to_numpy(zero_copy_only=False)
    lines = col.to_pylist()
    for i in range(len(lines)):
        if bad_np[i]:
            lines[i] = json.dumps(json.loads(lines[i]),
                                  separators=(",", ":"))
    return pa.table({"line": pa.array(lines, pa.large_string())})


def write_docs_jsonld_lines(docs_ds, out_dir: str):
    """Document Dataset → directory of ``part-*.jsonl`` files via the
    shared tmp+rename shard writer (sources/lineio.py); manifest
    (path, docs) returned as a pandas DataFrame."""
    from .lineio import write_line_shards

    lines = docs_ds.map_batches(docs_to_lines, batch_format="pyarrow",
                                batch_size=4096)
    return write_line_shards(lines, out_dir, "jsonl", "docs", 4096)


def _conv_id_of(doc, line: str) -> str:
    # a top-level JSON-LD document may be an array (or, degenerately,
    # a scalar) — those have no @id and take the fingerprint fallback
    node_id = doc.get("@id") if isinstance(doc, dict) else None
    if isinstance(node_id, str) and node_id.startswith(CONV_ID_NS):
        return node_id[len(CONV_ID_NS):]
    return "doc-" + hashlib.sha1(line.encode("utf-8")).hexdigest()[:16]


def read_docs_jsonld_lines(paths, file_extensions=("jsonl", "ndjson",
                                                   "json")):
    """Files of raw JSON-LD lines → (conv_id, doc_json) Dataset (the
    ToRdf stage's input schema). By default the conventional
    newline-JSON extensions are read and everything else — in
    particular an orphaned ``.tmp`` shard from a crashed write task —
    is skipped; pass ``file_extensions=None`` to ingest arbitrary
    file names (only safe for inputs this engine did not write)."""
    import ray.data as rd

    def to_rows(batch: pa.Table) -> pa.Table:
        ids, docs = [], []
        for line in batch["text"].to_pylist():
            if line is None or not line.strip():
                continue
            doc = json.loads(line)
            ids.append(_conv_id_of(doc, line))
            docs.append(line)
        return pa.table({
            "conv_id": pa.array(ids, pa.string()),
            "doc_json": pa.array(docs, pa.large_string()),
        })

    return rd.read_text(
        paths,
        file_extensions=(list(file_extensions)
                         if file_extensions is not None else None),
    ).map_batches(to_rows, batch_format="pyarrow", batch_size=4096)


def build_quads_from_jsonld_lines(paths, batch_size: int = 256,
                                  canonicalize: bool = True,
                                  skip_errors: bool = False):
    """JSON-LD line shards → canonical quad Dataset — the flagship
    toRDF pipeline over the reference's native document format
    instead of the events parquet."""
    import functools

    from ..stages.to_rdf_stage import to_rdf_task_fn

    fn = functools.partial(to_rdf_task_fn, canonicalize=canonicalize,
                           skip_errors=skip_errors)
    return read_docs_jsonld_lines(paths).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)
