"""Shared sharded line-file sink for text-based sources (N-Quads,
newline-delimited JSON-LD).

One writer so crash-safety fixes apply to every line sink. Two
guarantees, matching the parquet quad sink's discipline
(pipelines/kg.py _write_shard):

1. **No torn shards**: each part is written to a ``.tmp`` file and
   atomically renamed; the paired readers filter to the final
   extension, so a killed task's orphan is never ingested.
2. **No duplicate shards on retry**: lines are routed to a
   DETERMINISTIC shard by content hash and each shard writes ONE
   deterministically-named file (``part-{shard:05d}.{ext}``) via
   ``os.replace`` — a task retried after its rename already succeeded
   rewrites the same file with the same content instead of emitting a
   second uuid-named copy (the failure mode of name-by-uuid sinks: a
   worker dies between rename and task-success ack, Ray re-executes,
   and a glob-based reader ingests both copies).

The shard route is one extra exchange of the line stream — the price
of resumable, retry-idempotent output the north rule asks for.
Within a shard, lines are sorted before writing so the file content
is a pure function of the input DATASET (not of block arrival
order); byte-identical duplicate lines are preserved (count
semantics), only ordering is normalized.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def write_line_shards(lines_ds, out_dir: str, ext: str,
                      count_col: str, batch_size: int,
                      shards: int = 64):
    """Dataset with a ``line`` column → ``part-{shard:05d}.{ext}``
    files in ``out_dir``. Executes eagerly (the write is a side
    effect) and returns the manifest (path, {count_col}) as a pandas
    DataFrame."""
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        vals = batch["line"].to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals.astype(object))
        return batch.append_column(
            "shard", pa.array((h % np.uint64(shards)).astype(np.int32)))

    def write_shard(g: pd.DataFrame) -> pa.Table:
        sid = int(g["shard"].iloc[0])
        lines = sorted(g["line"].tolist())
        name = os.path.join(out_dir, f"part-{sid:05d}.{ext}")
        tmp = name + f".{os.getpid()}.tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, name)
        return pa.table({"path": pa.array([name], pa.string()),
                         count_col: pa.array([len(lines)], pa.int64())})

    return lines_ds.map_batches(add_shard, batch_format="pyarrow",
                                batch_size=batch_size) \
        .groupby("shard").map_groups(write_shard,
                                     batch_format="pandas") \
        .to_pandas()
