"""Shared sharded line-file sink for text-based sources (N-Quads,
newline-delimited JSON-LD).

One writer so crash-safety fixes apply to every line sink. Two
guarantees, with NO extra exchange (a Ray ``Datasink`` write fuses
onto the upstream map stage):

1. **No torn shards**: each part is written to a ``.tmp`` file and
   atomically renamed; the paired readers filter to the final
   extension, so a killed task's orphan is never ingested.
2. **No duplicate shards on retry or re-run**: parts are named by the
   write task's deterministic ``ctx.task_idx`` (stable across Ray
   retries of the same input bundle, unlike a uuid) and installed
   with ``os.replace`` — a task retried after its rename already
   succeeded rewrites the same file instead of emitting a second
   differently-named copy a glob-based reader would double-ingest —
   and ``on_write_start`` clears prior ``part-*.{ext}`` files so a
   re-run into the same directory (different task count → different
   name set) can never leave stale parts from the previous run
   behind. One write owns a directory at a time.

Within a run, retries are idempotent. ACROSS runs, the part layout
(which lines land in which file) follows Ray's block partitioning —
same dataset written at different parallelism yields a different
file split with identical total content, like write_parquet. A
caller needing a bit-reproducible shard LAYOUT must repartition
deterministically upstream.
"""

from __future__ import annotations

import os

import pyarrow as pa
from ray.data import Datasink
from ray.data.datasource.datasink import WriteResult


class _LineShardDatasink(Datasink):
    """Writes the ``line`` column of each incoming block to
    ``part-{task_idx}-{block_idx}.{ext}``; collects a (path, count)
    manifest on the driver in ``on_write_complete``."""

    def __init__(self, out_dir: str, ext: str, count_col: str) -> None:
        self.out_dir = out_dir
        self.ext = ext
        self.count_col = count_col
        self.manifest_rows: list[tuple[str, int]] = []

    def on_write_start(self) -> None:
        import glob

        os.makedirs(self.out_dir, exist_ok=True)
        # a previous run with more write tasks left part files this
        # run's name set won't overwrite — clear them so glob readers
        # see exactly this write's output
        # ...and orphaned .tmp files from tasks killed mid-write in a
        # prior run: readers already skip them by extension, but they
        # would otherwise accumulate forever in a reused directory
        for stale in glob.glob(
                os.path.join(self.out_dir, f"part-*.{self.ext}")) \
                + glob.glob(os.path.join(
                    self.out_dir, f"part-*.{self.ext}.*.tmp")):
            os.remove(stale)

    def write(self, blocks, ctx) -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        for i, block in enumerate(blocks):
            if isinstance(block, pa.Table):
                lines = block["line"].to_pylist()
            else:                      # pandas
                lines = block["line"].tolist()
            if not lines:
                continue
            name = os.path.join(
                self.out_dir,
                f"part-{ctx.task_idx:06d}-{i:04d}.{self.ext}")
            tmp = f"{name}.{os.getpid()}.tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                f.write("\n".join(lines) + "\n")
            os.replace(tmp, name)
            out.append((name, len(lines)))
        return out

    def on_write_complete(
            self, write_result: "WriteResult") -> None:
        for rows in write_result.write_returns:
            self.manifest_rows.extend(rows)


def write_line_shards(lines_ds, out_dir: str, ext: str,
                      count_col: str, batch_size: int):
    """Dataset with a ``line`` column → ``part-*.{ext}`` files in
    ``out_dir``. Executes eagerly (the write is a side effect) and
    returns the manifest (path, {count_col}) as a pandas DataFrame.
    ``batch_size`` is unused by the datasink path (blocks stream
    through as-is); kept for call-site compatibility."""
    import pandas as pd

    sink = _LineShardDatasink(out_dir, ext, count_col)
    lines_ds.write_datasink(sink)
    rows = sorted(sink.manifest_rows)
    return pd.DataFrame({
        "path": [r[0] for r in rows],
        count_col: [r[1] for r in rows],
    })
