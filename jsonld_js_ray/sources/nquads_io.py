"""N-Quads text source/sink for quad Datasets.

Mirrors the reference's (removed) NQuads surface (lib/NQuads.js:7) as Ray
Data stages: a regex batch parser over ``read_text`` lines and a
vectorized serializer writing partitioned ``.nq`` shards.
"""

from __future__ import annotations

import pyarrow as pa

from ..core import nquads as _nq

_QUAD_COLUMNS = ["subj", "pred", "obj_kind", "obj_value", "obj_datatype",
                 "obj_lang", "graph"]


def rows_to_terms(batch: pa.Table) -> list[tuple]:
    """Quad-table rows → engine term tuples."""
    cols = {c: batch[c].to_pylist() for c in _QUAD_COLUMNS}
    quads = []
    for i in range(batch.num_rows):
        subj = cols["subj"][i]
        s = ("BlankNode", subj) if subj.startswith("_:") \
            else ("NamedNode", subj)
        p = ("NamedNode", cols["pred"][i])
        kind = cols["obj_kind"][i]
        if kind == "literal":
            o = ("Literal", cols["obj_value"][i],
                 cols["obj_datatype"][i], cols["obj_lang"][i])
        elif kind == "bnode":
            o = ("BlankNode", cols["obj_value"][i])
        else:
            o = ("NamedNode", cols["obj_value"][i])
        gname = cols["graph"][i]
        if gname == "@default":
            g = ("DefaultGraph", "")
        elif gname.startswith("_:"):
            g = ("BlankNode", gname)
        else:
            g = ("NamedNode", gname)
        quads.append((s, p, o, g))
    return quads


def terms_to_rows(quads: list[tuple],
                  conv_id: str | None = None) -> pa.Table:
    """Engine term tuples → quad-table rows (inverse of rows_to_terms)."""
    data: dict[str, list] = {c: [] for c in _QUAD_COLUMNS}
    for s, p, o, g in quads:
        data["subj"].append(s[1])
        data["pred"].append(p[1])
        if o[0] == "Literal":
            data["obj_kind"].append("literal")
            data["obj_value"].append(o[1])
            data["obj_datatype"].append(o[2])
            data["obj_lang"].append(o[3])
        else:
            data["obj_kind"].append("bnode" if o[0] == "BlankNode"
                                    else "iri")
            data["obj_value"].append(o[1])
            data["obj_datatype"].append(None)
            data["obj_lang"].append(None)
        data["graph"].append("@default" if g[0] == "DefaultGraph" else g[1])
    tbl = pa.table({
        "subj": pa.array(data["subj"], pa.string()),
        "pred": pa.array(data["pred"], pa.string()),
        "obj_kind": pa.array(data["obj_kind"], pa.string()),
        "obj_value": pa.array(data["obj_value"], pa.large_string()),
        "obj_datatype": pa.array(data["obj_datatype"], pa.string()),
        "obj_lang": pa.array(data["obj_lang"], pa.string()),
        "graph": pa.array(data["graph"], pa.string()),
    })
    if conv_id is not None:
        tbl = tbl.append_column("conv_id",
                                pa.array([conv_id] * tbl.num_rows,
                                         pa.string()))
    return tbl


def serialize_batch(batch: pa.Table) -> pa.Table:
    """Quad rows → one N-Quads line per row (vectorized downstream write
    via write_text-style sink)."""
    lines = [_nq.serialize_quad(q).rstrip("\n")
             for q in rows_to_terms(batch)]
    return pa.table({"line": pa.array(lines, pa.large_string())})


def parse_batch(batch: pa.Table) -> pa.Table:
    """read_text lines → quad rows (comments / blank lines dropped)."""
    text = "\n".join(t for t in batch["text"].to_pylist() if t is not None)
    quads = _nq.parse(text)
    return terms_to_rows(quads)


def write_nquads(quads_ds, out_dir: str):
    """Quad Dataset → directory of .nq part files via the shared
    tmp+rename shard writer (sources/lineio.py); manifest (path,
    rows) returned as a pandas DataFrame."""
    from .lineio import write_line_shards

    lines = quads_ds.map_batches(serialize_batch, batch_format="pyarrow",
                                 batch_size=65536)
    return write_line_shards(lines, out_dir, "nq", "rows", 65536)


def read_nquads(paths,
                file_extensions=("nq", "nquads",
                                 "nt")) -> "ray.data.Dataset":  # noqa: F821
    """N-Quads files → quad Dataset. By default the conventional
    N-Quads/N-Triples extensions are read and everything else — in
    particular an orphaned ``.tmp`` shard from a crashed write task —
    is skipped; pass ``file_extensions=None`` to ingest arbitrary
    file names (only safe for inputs this engine did not write)."""
    import ray.data as rd

    text = rd.read_text(
        paths,
        file_extensions=(list(file_extensions)
                         if file_extensions is not None else None))

    def to_rows(batch: pa.Table) -> pa.Table:
        return parse_batch(batch)

    return text.map_batches(to_rows, batch_format="pyarrow",
                            batch_size=65536)
