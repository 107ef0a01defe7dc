"""Shared sharded line-file sink for text-based sources (N-Quads,
newline-delimited JSON-LD).

One writer so crash-safety fixes apply to every line sink: each part
is written to a ``.tmp`` file and atomically renamed, so a killed or
retried task never leaves a half-written file under the FINAL
extension — and the paired readers must restrict themselves to that
extension (``file_extensions=[ext]``) so an orphaned ``.tmp`` from a
crashed task is never ingested.
"""

from __future__ import annotations

import os

import pyarrow as pa


def write_line_shards(lines_ds, out_dir: str, ext: str,
                      count_col: str, batch_size: int):
    """Dataset with a ``line`` column → ``part-*.{ext}`` files in
    ``out_dir``. Executes eagerly (the write is a side effect) and
    returns the manifest (path, {count_col}) as a pandas DataFrame."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import uuid

        name = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.{ext}")
        tmp = name + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(batch["line"].to_pylist()) + "\n")
        os.rename(tmp, name)
        return pa.table({"path": pa.array([name], pa.string()),
                         count_col: pa.array([batch.num_rows],
                                             pa.int64())})

    return lines_ds.map_batches(write_block, batch_format="pyarrow",
                                batch_size=batch_size).to_pandas()
