"""Mention detection + entity-link scoring.

North-star stage: "each turn's text is run through batched mention
detection and entity-link scoring (actor-pool map_batches holding the
linker model and a cached @context/term-definition resolver)".

The "model" is deterministic and self-contained (no external data): a
compiled token pattern + a scoring function; real deployments would load
an NER/EL model in ``__init__`` — the Ray-side shape (actor pool, state
loaded once, batched scoring) is identical.

Mention rule (SQL-mirrorable, see MENTIONS_SQL): alphabetic tokens of
length >= 3, lowercased. Deliberately tiny surface-form cardinality on the
events-derived corpus → the designated skew source (SURVEY.md §7.4.5).
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..sources.transcripts import TRANSCRIPTS_SQL
from .assemble import ENTITY_NS

MENTION_PATTERN = r"[A-Za-z]{3,}"

MENTIONS_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_SQL})
SELECT conv_id, turn_idx,
       lower(unnest(regexp_extract_all(text, '{MENTION_PATTERN}')))
           AS surface
FROM transcripts
"""


def link_score(surface: str) -> float:
    """Deterministic entity-link confidence in [0, 1]."""
    return round(min(1.0, 0.5 + len(surface) / 20.0), 3)


class MentionDetector:
    """Actor: transcript batches → mention rows.

    (conv_id, turn_idx, text) → (conv_id, turn_idx, surface, score,
    entity_iri). Regex compiled once per actor.
    """

    def __init__(self) -> None:
        self.pattern = re.compile(MENTION_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        conv_ids = batch["conv_id"].to_pylist()
        turn_idxs = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()

        out_conv: list[str] = []
        out_turn: list[int] = []
        out_surface: list[str] = []
        findall = self.pattern.findall
        for conv_id, turn_idx, text in zip(conv_ids, turn_idxs, texts):
            for token in findall(text or ""):
                out_conv.append(conv_id)
                out_turn.append(turn_idx)
                out_surface.append(token.lower())
        return pa.table({
            "conv_id": pa.array(out_conv, pa.string()),
            "turn_idx": pa.array(out_turn, pa.int32()),
            "surface": pa.array(out_surface, pa.string()),
            "score": pa.array([link_score(s) for s in out_surface],
                              pa.float64()),
            "entity_iri": pa.array([ENTITY_NS + s for s in out_surface],
                                   pa.string()),
        })


def detect_mentions(transcripts, concurrency=None):
    """transcripts Dataset → mention Dataset (actor-pool map_batches)."""
    return transcripts.map_batches(
        MentionDetector, batch_format="pyarrow", batch_size=4096,
        concurrency=concurrency if concurrency else (1, 8))
