"""Vectorized run (sorted-group) index arithmetic shared by the
order-statistics stages (stages/rank.py, stages/tfidf.py).

A "run" is a maximal block of equal values in an already-sorted key
array; per-group rank/top-k reduces to these three primitives plus one
lexsort — no per-group Python.
"""

from __future__ import annotations

import numpy as np


def run_starts(sorted_ids: np.ndarray) -> np.ndarray:
    """Start index of each run of equal values in a sorted array."""
    if not len(sorted_ids):
        return np.zeros(0, dtype=np.int64)
    return np.flatnonzero(
        np.concatenate([[True], sorted_ids[1:] != sorted_ids[:-1]]))


def run_lengths(sorted_ids: np.ndarray,
                starts: np.ndarray | None = None) -> np.ndarray:
    """Length of each run (aligned with run_starts)."""
    if starts is None:
        starts = run_starts(sorted_ids)
    return np.diff(np.append(starts, len(sorted_ids))).astype(np.int64)


def run_positions(sorted_ids: np.ndarray,
                  starts: np.ndarray | None = None) -> np.ndarray:
    """0-based position of every element within its run."""
    if starts is None:
        starts = run_starts(sorted_ids)
    lengths = run_lengths(sorted_ids, starts)
    return np.arange(len(sorted_ids)) - np.repeat(starts, lengths)
