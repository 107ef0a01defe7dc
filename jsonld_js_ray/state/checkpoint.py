"""Resumable partitioned output with per-shard lineage records.

Layout (north rule: "partitioned Parquet n-quad tables with per-partition
lineage records and resumable checkpoints"):

    out_dir/
      shard=00042/part-*.parquet     (atomic: written to .tmp-*, renamed)
      _manifest/shard-00042.json     ({shard_id, inputs, input_fingerprint,
                                       rows, quads, wall_ms, written_at_ok})

A shard is the resume unit — one input file (or file group) of the source
table. A rerun consults the manifest: shards whose input fingerprint
matches are SKIPPED entirely (no read, no shuffle, no write). At 100 TB
the source is many thousands of Parquet files, so shard granularity is
fine-grained; a single-file toy input degenerates to one shard.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from dataclasses import asdict, dataclass


@dataclass
class ShardRecord:
    shard_id: int
    inputs: list[str]
    input_fingerprint: str
    rows: int
    quads: int
    wall_ms: int
    conv_min: str | None = None
    conv_max: str | None = None


def fingerprint_inputs(paths: list[str]) -> str:
    """Cheap, deterministic input identity: path + size + mtime digest."""
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}|{st.st_size}|{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def shard_manifest_path(out_dir: str, shard_id: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"shard-{shard_id:05d}.json")


def shard_data_dir(out_dir: str, shard_id: int) -> str:
    return os.path.join(out_dir, f"shard={shard_id:05d}")


def is_shard_done(out_dir: str, shard_id: int, fingerprint: str) -> bool:
    path = shard_manifest_path(out_dir, shard_id)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            rec = json.load(f)
        return rec.get("input_fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


def write_shard_atomic(out_dir: str, shard_id: int, write_fn,
                       record: ShardRecord) -> ShardRecord:
    """Run ``write_fn(tmp_dir)`` then atomically rename into place and
    commit the lineage record. ``write_fn`` must write all shard output
    files into the given temp directory."""
    final_dir = shard_data_dir(out_dir, shard_id)
    # dot-prefixed temp name: invisible to shard=* globs and pyarrow/ray
    # dataset discovery even if a hard kill leaves it behind
    tmp_dir = os.path.join(
        out_dir, f".tmp-shard-{shard_id:05d}-{os.getpid()}-"
                 f"{int(time.time() * 1000)}")
    # clean leftovers from crashed writers of this shard
    for stale in os.listdir(out_dir):
        if stale.startswith(f".tmp-shard-{shard_id:05d}-"):
            shutil.rmtree(os.path.join(out_dir, stale),
                          ignore_errors=True)
    os.makedirs(tmp_dir, exist_ok=True)
    try:
        write_fn(tmp_dir)
        if os.path.isdir(final_dir):
            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
    except BaseException:
        shutil.rmtree(tmp_dir, ignore_errors=True)
        raise
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    mpath = shard_manifest_path(out_dir, shard_id)
    tmp_mpath = mpath + ".tmp"
    with open(tmp_mpath, "w") as f:
        json.dump(asdict(record), f, indent=1)
    os.rename(tmp_mpath, mpath)
    return record


def read_manifest(out_dir: str) -> list[dict]:
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def reconcile_shards(out_dir: str, n_shards: int) -> list[int]:
    """Remove shard outputs + manifests whose shard_id is no longer in
    the input set (inputs deleted/renamed between runs) so consumers of
    ``out_dir`` never read stale quads. Returns removed shard ids."""
    import warnings

    removed = []
    mdir = manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return removed
    for name in os.listdir(mdir):
        if not name.startswith("shard-") or not name.endswith(".json"):
            continue
        shard_id = int(name[len("shard-"):-len(".json")])
        if shard_id >= n_shards:
            shutil.rmtree(shard_data_dir(out_dir, shard_id),
                          ignore_errors=True)
            os.remove(os.path.join(mdir, name))
            removed.append(shard_id)
            warnings.warn(
                f"removed orphaned shard {shard_id} (input no longer "
                f"present)")
    return removed
