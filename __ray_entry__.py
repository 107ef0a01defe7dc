"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported; nothing
here (or in jsonld_js_ray) calls ray.init()/ray.shutdown().

- ``entry()``        — flagship KG pipeline on sf0.001, returns the quad
                       Dataset.
- ``queries()``      — one callable per implemented operator/pipeline
                       (SURVEY.md §2); each takes ``sf_dir``.
- ``oracle_sql()``   — DuckDB-equivalent SQL per query (same column
                       names/value forms; the driver hash-compares).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: events→transcripts→JSON-LD docs→expand→toRDF→URDNA2015
    canonical quads, on /root/testdata/sf0.001."""
    from jsonld_js_ray.pipelines.kg import build_quads

    return build_quads("/root/testdata/sf0.001")


def _q_transcripts(sf_dir: str):
    from jsonld_js_ray.sources.transcripts import read_transcripts

    return read_transcripts(sf_dir)


def _q_kg_quads(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import build_quads

    return build_quads(sf_dir)


def _q_kg_quads_with_mentions(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import build_quads_with_mentions

    return build_quads_with_mentions(sf_dir)


def _q_kg_quad_stats(sf_dir: str):
    import pandas as pd

    from jsonld_js_ray.pipelines.kg import build_quads

    def per_pred(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pred": [g["pred"].iloc[0]],
            "n": [len(g)],
            "n_subj": [g["subj"].nunique()],
        })

    return build_quads(sf_dir).groupby("pred").map_groups(
        per_pred, batch_format="pandas")


def _q_kg_mentions(sf_dir: str):
    from jsonld_js_ray.sources.transcripts import read_transcripts
    from jsonld_js_ray.stages.linker import detect_mentions

    return detect_mentions(read_transcripts(sf_dir)).select_columns(
        ["conv_id", "turn_idx", "surface"])


def _q_kg_entities(sf_dir: str):
    from jsonld_js_ray.sources.transcripts import read_transcripts
    from jsonld_js_ray.stages.entity_merge import surface_stats
    from jsonld_js_ray.stages.linker import detect_mentions

    return surface_stats(detect_mentions(read_transcripts(sf_dir)))


def _q_kg_entities_canonical(sf_dir: str):
    from jsonld_js_ray.sources.transcripts import read_transcripts
    from jsonld_js_ray.stages.entity_merge import canonicalize_entities
    from jsonld_js_ray.stages.linker import detect_mentions

    return canonicalize_entities(detect_mentions(read_transcripts(sf_dir)))


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "transcripts": _q_transcripts,
        "kg_quads": _q_kg_quads,
        "kg_quads_with_mentions": _q_kg_quads_with_mentions,
        "kg_quad_stats": _q_kg_quad_stats,
        "kg_mentions": _q_kg_mentions,
        "kg_entities": _q_kg_entities,
        "kg_entities_canonical": _q_kg_entities_canonical,
    }


def oracle_sql() -> dict[str, str]:
    from jsonld_js_ray.pipelines.oracle import (
        ENTITIES_ORACLE_SQL,
        KG_QUADS_ORACLE_SQL,
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
        TRANSCRIPTS_ORACLE_SQL,
        TRIPLE_STATS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.linker import MENTIONS_SQL

    return {
        "transcripts": TRANSCRIPTS_ORACLE_SQL,
        "kg_quads": KG_QUADS_ORACLE_SQL,
        "kg_quads_with_mentions": KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
        "kg_quad_stats": TRIPLE_STATS_ORACLE_SQL,
        "kg_mentions": MENTIONS_SQL,
        "kg_entities": ENTITIES_ORACLE_SQL,
        # kg_entities_canonical: min-hash LSH merge — not SQL-expressible;
        # driver records the weaker rows-only check.
    }
