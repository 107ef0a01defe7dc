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


# --- shared graph artifacts (VERDICT r3 #6) -------------------------
# The driver/bench call each queries() key separately; every
# graph-analytics wrapper used to rebuild the same with-mentions quad
# table (2-6 s at sf0.1) and the triangle family additionally
# re-derived the same undirected/oriented edge tables. One PINNED copy
# per (Ray job, sf_dir) now serves them all. Keyed by the Ray job id
# so a fresh ray.init can never touch dead object refs; results are
# byte-identical (the cache only skips recomputation of a
# deterministic artifact).
_GRAPH_ARTIFACTS: dict = {}


def _shared_graph_artifacts(sf_dir: str, edges: bool = True):
    import ray

    from jsonld_js_ray.pipelines.kg import build_quads_with_mentions
    from jsonld_js_ray.stages.graph import (_oriented_edges, _pin,
                                            _undirected_edges)

    key = (ray.get_runtime_context().get_job_id(), sf_dir)
    ent = _GRAPH_ARTIFACTS.get(key)
    if ent is None:
        _GRAPH_ARTIFACTS.clear()        # one session+sf held at a time
        ent = {}
        _GRAPH_ARTIFACTS[key] = ent
    if "quads" not in ent:              # entry may hold only "ce"
        ent["quads"] = _pin(build_quads_with_mentions(sf_dir))
    if edges and "und" not in ent:
        ent["und"] = _pin(_undirected_edges(ent["quads"]))
        ent["directed"] = _pin(_oriented_edges(ent["und"]))
    return ent["quads"], ent.get("und"), ent.get("directed")


def _shared_conv_entity_mentions(sf_dir: str):
    """Pinned (conv, entity, n_mentions) table — deterministic, reused
    by kg_pagerank_weighted (and anything else edge-weighted over the
    conv↔entity bipartite graph). Same job-id-keyed cache discipline
    as the quad artifacts."""
    import ray

    from jsonld_js_ray.pipelines.kg import conv_entity_mentions
    from jsonld_js_ray.stages.graph import _pin

    key = (ray.get_runtime_context().get_job_id(), sf_dir)
    ent = _GRAPH_ARTIFACTS.get(key)
    if ent is None:
        ent = {}
        _GRAPH_ARTIFACTS.clear()
        _GRAPH_ARTIFACTS[key] = ent
    if "ce" not in ent:
        ent["ce"] = _pin(conv_entity_mentions(sf_dir))
    return ent["ce"]


def _shared_quads(sf_dir: str):
    return _shared_graph_artifacts(sf_dir, edges=False)[0]


def _shared_node_degrees(sf_dir: str):
    """Pinned (node, deg) table over the shared undirected edges —
    reused by kg_jaccard_neighbors (degree attach) and
    kg_degree_hist. Same job-id-keyed cache as the other artifacts."""
    import ray

    from jsonld_js_ray.stages.graph import _pin, _tri_degrees

    _shared_graph_artifacts(sf_dir)     # ensures "und" exists
    key = (ray.get_runtime_context().get_job_id(), sf_dir)
    ent = _GRAPH_ARTIFACTS[key]
    if "deg" not in ent:
        ent["deg"] = _pin(_tri_degrees(ent["und"]))
    return ent["deg"]


def _q_kg_quads(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import build_quads

    return build_quads(sf_dir)


# scratch dirs mkdtemp'd by the connector queries below, in creation
# order. Callers that fully consume the returned (lazy) datasets may
# rmtree exactly these (bench.py does) — deleting by /tmp glob could
# hit a CONCURRENT process's live scratch, and would miss dirs when
# TMPDIR points elsewhere (tempfile.mkdtemp honors TMPDIR).
SCRATCH_DIRS: list[str] = []


def _q_kg_quads_jsonl(sf_dir: str):
    """Flagship toRDF over the reference's NATIVE document format:
    assemble the per-conversation JSON-LD documents, write them as
    newline-delimited JSON-LD shards (plain documents, no envelope),
    read the shards back, and run the same ToRdf stage — output is
    byte-identical to kg_quads, so it carries the same oracle."""
    import tempfile

    from jsonld_js_ray.pipelines.kg import assemble_docs
    from jsonld_js_ray.sources.jsonld_lines import (
        build_quads_from_jsonld_lines,
        write_docs_jsonld_lines,
    )

    # unique dir per invocation: a fixed path keyed on sf_dir would
    # let a second call rmtree shards a previous call's still-lazy
    # read plan references (tiny at oracle scale, so no cleanup)
    out = tempfile.mkdtemp(prefix="jsonld_lines_")
    SCRATCH_DIRS.append(out)
    write_docs_jsonld_lines(assemble_docs(sf_dir), out)
    return build_quads_from_jsonld_lines(out)


def _q_kg_quads_nq_file(sf_dir: str):
    """Quad table → sharded .nq files → parsed back: puts the N-Quads
    file codec (sources/nquads_io.py) on the oracle gate. conv_id
    does not survive the wire format (N-Quads has no such column), so
    the oracle is the kg_quads SQL minus that column."""
    import tempfile

    from jsonld_js_ray.pipelines.kg import build_quads
    from jsonld_js_ray.sources.nquads_io import read_nquads, write_nquads

    out = tempfile.mkdtemp(prefix="nq_file_")
    SCRATCH_DIRS.append(out)
    # conv_id rides along unserialized (the codec writes only the
    # seven wire columns) — no drop pass needed
    write_nquads(build_quads(sf_dir), out)
    return read_nquads(out)


def _q_kg_quads_with_mentions(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import build_quads_with_mentions

    return build_quads_with_mentions(sf_dir)


def _q_kg_quad_stats(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import build_quads, quad_stats

    return quad_stats(build_quads(sf_dir))


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


def _q_kg_entities_canonical_planted(sf_dir: str):
    from jsonld_js_ray.sources.transcripts import read_transcripts
    from jsonld_js_ray.stages.entity_merge import (
        canonicalize_entities_planted,
    )
    from jsonld_js_ray.stages.linker import detect_mentions

    return canonicalize_entities_planted(
        detect_mentions(read_transcripts(sf_dir)))


def _q_kg_conv_entity_mentions(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import conv_entity_mentions

    return conv_entity_mentions(sf_dir)


def _q_kg_pagerank(sf_dir: str):
    from jsonld_js_ray.stages.graph import pagerank_quads

    return pagerank_quads(_shared_quads(sf_dir))


def _q_kg_pagerank_weighted(sf_dir: str):
    import pyarrow as pa

    from jsonld_js_ray.stages.graph import pagerank_weighted

    ce = _shared_conv_entity_mentions(sf_dir)

    def both_dirs(batch: pa.Table) -> pa.Table:
        w = batch["n_mentions"].cast(pa.int64())
        fwd = pa.table({"src": batch["conv"],
                        "dst": batch["entity"], "w": w})
        rev = pa.table({"src": batch["entity"],
                        "dst": batch["conv"], "w": w})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    edges = ce.map_batches(both_dirs, batch_format="pyarrow")
    return pagerank_weighted(edges)


def _pagerank_weighted_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        CONV_ENTITY_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import (
        _pagerank_weighted_oracle_sql,
    )

    return _pagerank_weighted_oracle_sql(
        CONV_ENTITY_MENTIONS_ORACLE_SQL)


def _q_kg_quads_roundtrip(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import roundtrip_quads

    return roundtrip_quads(sf_dir)


def _q_kg_compact_roundtrip(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import compact_roundtrip_turn_counts

    return compact_roundtrip_turn_counts(sf_dir)


def _q_kg_flatten_counts(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import flatten_doc_node_counts

    return flatten_doc_node_counts(sf_dir)


def _q_kg_merged_node_props(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import distributed_merge_node_props

    return distributed_merge_node_props(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from jsonld_js_ray.pipelines import training_data as td

    return {
        # KG construction (flagship)
        "transcripts": _q_transcripts,
        "kg_quads": _q_kg_quads,
        "kg_quads_jsonl": _q_kg_quads_jsonl,
        "kg_quads_nq_file": _q_kg_quads_nq_file,
        "kg_quads_with_mentions": _q_kg_quads_with_mentions,
        "kg_quad_stats": _q_kg_quad_stats,
        "kg_mentions": _q_kg_mentions,
        "kg_entities": _q_kg_entities,
        "kg_entities_canonical": _q_kg_entities_canonical,
        "kg_entities_canonical_planted": _q_kg_entities_canonical_planted,
        "kg_conv_entity_mentions": _q_kg_conv_entity_mentions,
        "kg_pagerank": _q_kg_pagerank,
        "kg_pagerank_weighted": _q_kg_pagerank_weighted,
        "kg_triangles": _q_kg_triangles,
        "kg_components": _q_kg_components,
        "kg_communities": _q_kg_communities,
        "kg_kcore": _q_kg_kcore,
        "kg_reach": _q_kg_reach,
        "kg_common_neighbors": _q_kg_common_neighbors,
        "kg_property_table": _q_kg_property_table,
        "kg_property_unpivot": _q_kg_property_unpivot,
        "kg_degree_hist": _q_kg_degree_hist,
        "kg_clustering": _q_kg_clustering,
        "kg_truss_support": _q_kg_truss_support,
        "kg_jaccard_neighbors": _q_kg_jaccard_neighbors,
        "kg_assortativity": _q_kg_assortativity,
        "kg_neighbor_sample": _q_kg_neighbor_sample,
        "kg_random_walks": _q_kg_random_walks,
        "kg_quads_roundtrip": _q_kg_quads_roundtrip,
        "kg_compact_roundtrip": _q_kg_compact_roundtrip,
        "kg_flatten_counts": _q_kg_flatten_counts,
        "kg_merged_node_props": _q_kg_merged_node_props,
        # training-data ops
        "dedup_exact": td.q_dedup_exact,
        "dedup_minhash": td.q_dedup_minhash_checked,
        "dedup_simhash": td.q_dedup_simhash_checked,
        "dedup_embedding": td.q_dedup_embedding,
        "dedup_ngram": td.q_dedup_ngram_checked,
        # planted-duplicate corpora (construction-based oracles for the
        # otherwise non-SQL-expressible LSH/sketch variants)
        "dedup_minhash_planted": td.q_dedup_minhash_planted,
        "dedup_embedding_planted": td.q_dedup_embedding_planted,
        "dedup_ngram_planted": td.q_dedup_ngram_planted,
        "dedup_simhash_planted": td.q_dedup_simhash_planted,
        "fingerprint_classes_planted": td.q_fingerprint_classes_planted,
        "knn_brute": td.q_knn_brute,
        "knn_lsh": td.q_knn_lsh_checked,
        "knn_ivf": td.q_knn_ivf_exhaustive,
        "knn_pq": td.q_knn_pq_exhaustive,
        "knn_ivfpq": td.q_knn_ivfpq_exhaustive,
        "text_stats": td.q_text_stats,
        "token_counts": td.q_token_counts,
        "split_assign": td.q_split_assign,
        "sample_docs": td.q_sample_docs,
        "lang_id": td.q_lang_id,
        "quality": td.q_quality,
        "normalize_text": td.q_normalize_text,
        "scrub_pii": td.q_scrub_pii,
        "curation_filter": td.q_curation_filter,
        "decontaminate": td.q_decontaminate,
        "decontaminate_ngram": td.q_decontaminate_ngram,
        "dedup_substring": td.q_dedup_substring,
        "kmeans_assign": td.q_kmeans_assign,
        "semdedup": td.q_semdedup,
        "pq_encode": td.q_pq_encode,
        "stratified_sample": td.q_stratified_sample,
        "mix_sources": td.q_mix_sources,
        "tfidf_topk": td.q_tfidf_topk,
        "inverted_index": td.q_inverted_index,
        "repetition": td.q_repetition,
        "corpus_token_quantiles": td.q_corpus_token_quantiles,
        "chunk_docs": td.q_chunk_docs,
        "pack_sequences": td.q_pack_sequences,
        "top_bigrams": td.q_top_bigrams,
        "length_outlier_filter": td.q_length_outlier_filter,
        "lm_unigram_score": td.q_lm_unigram_score,
        "lm_bigram_score": td.q_lm_bigram_score,
        "lm_backoff_score": td.q_lm_backoff_score,
        "fingerprint": td.q_fingerprint,
        "cms_token_counts": td.q_cms_token_counts,
        "multimodal_features": td.q_multimodal_features,
        "multimodal_audio": td.q_multimodal_audio,
        # joins / sort-limit (relational operator classes)
        "join_broadcast": _q_join_broadcast,
        "join_bucketed": _q_join_bucketed,
        "join_bloom_semi": _q_join_bloom_semi,
        "join_salted": _q_join_salted,
        "join_adaptive": _q_join_adaptive,
        "user_set_ops": _q_user_set_ops,
        "user_favorite_event": _q_user_favorite_event,
        "event_type_pivot": _q_event_type_pivot,
        "kmv_sketch_users": _q_kmv_sketch_users,
        "join_anti": _q_join_anti,
        "join_left": _q_join_left,
        "join_full_outer": _q_join_full_outer,
        "shipping_priority": _q_shipping_priority,
        "local_supplier_revenue": _q_local_supplier_revenue,
        "brand_revenue": _q_brand_revenue,
        "join_asof": _q_join_asof,
        "join_range": _q_join_range,
        "topk_docs": _q_topk_docs,
        "user_quantiles": _q_user_quantiles,
        "user_quantiles_cont": _q_user_quantiles_cont,
        "top_events_per_user": _q_top_events_per_user,
        "user_running_totals": _q_user_running_totals,
        "value_histogram": _q_value_histogram,
        "range_partition_bounds": _q_range_partition_bounds,
        "global_sort": _q_global_sort,
        "skyline_events": _q_skyline_events,
        "robust_outliers": _q_robust_outliers,
        "rollup_events": _q_rollup_events,
        "cube_events": _q_cube_events,
        "cohort_retention": _q_cohort_retention,
        "user_value_ntiles": _q_user_value_ntiles,
        "user_value_deltas": _q_user_value_deltas,
        "debounce_events": _q_debounce_events,
        "props_extract": _q_props_extract,
        "value_k_correlation": _q_value_k_correlation,
        "ab_metrics": _q_ab_metrics,
        "user_event_paths": _q_user_event_paths,
        "event_transitions": _q_event_transitions,
        "pricing_summary": _q_pricing_summary,
        "kg_resource_allocation": _q_kg_resource_allocation,
        "kg_entity_lift": _q_kg_entity_lift,
        "funnel_stages": _q_funnel_stages,
        "funnel_windowed": _q_funnel_windowed,
        # streaming-shaped windowed aggregates (engine-only operators)
        "window_tumbling": _q_window_tumbling,
        "window_distinct_users": _q_window_distinct_users,
        "window_distinct_users_hll": _q_window_distinct_users_hll,
        "window_sliding": _q_window_sliding,
        "window_session": _q_window_session,
        "window_top_events": _q_window_top_events,
        "embed_quantize": _q_embed_quantize,
    }


def _q_join_broadcast(sf_dir: str):
    from jsonld_js_ray.stages.joins import broadcast_join_orders_customers

    return broadcast_join_orders_customers(sf_dir)


def _q_join_bucketed(sf_dir: str):
    from jsonld_js_ray.stages.joins import bucketed_hash_join_lineitem_orders

    return bucketed_hash_join_lineitem_orders(sf_dir)


def _q_join_anti(sf_dir: str):
    from jsonld_js_ray.stages.joins import (
        anti_join_customers_without_orders,
    )

    return anti_join_customers_without_orders(sf_dir)


def _q_join_asof(sf_dir: str):
    from jsonld_js_ray.stages.joins import asof_join_clicks_before_purchases

    return asof_join_clicks_before_purchases(sf_dir)


def _q_join_range(sf_dir: str):
    from jsonld_js_ray.stages.joins import range_join_clicks_within_hour

    return range_join_clicks_within_hour(sf_dir)


def _q_join_left(sf_dir: str):
    from jsonld_js_ray.stages.joins import left_join_customer_order_stats

    return left_join_customer_order_stats(sf_dir)


def _q_user_running_totals(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_running_totals

    return user_running_totals(sf_dir)


def _q_value_histogram(sf_dir: str):
    from jsonld_js_ray.stages.histo import value_histogram

    return value_histogram(_events(sf_dir, ["value"]))


def _q_range_partition_bounds(sf_dir: str):
    from jsonld_js_ray.stages.histo import range_partition_bounds

    return range_partition_bounds(sf_dir)


def _q_global_sort(sf_dir: str):
    from jsonld_js_ray.stages.histo import global_sort_events

    return global_sort_events(sf_dir)


def _q_skyline_events(sf_dir: str):
    from jsonld_js_ray.stages.histo import skyline_events

    return skyline_events(sf_dir)


def _q_robust_outliers(sf_dir: str):
    from jsonld_js_ray.stages.rank import robust_outliers

    return robust_outliers(sf_dir)


def _q_rollup_events(sf_dir: str):
    from jsonld_js_ray.stages.rollup import rollup_events

    return rollup_events(sf_dir)


def _q_cube_events(sf_dir: str):
    from jsonld_js_ray.stages.rollup import cube_events

    return cube_events(sf_dir)


def _q_cohort_retention(sf_dir: str):
    from jsonld_js_ray.stages.cohort import cohort_retention

    return cohort_retention(sf_dir)


def _q_join_bloom_semi(sf_dir: str):
    from jsonld_js_ray.stages.joins import (
        bloom_semi_join_lineitem_urgent,
    )

    return bloom_semi_join_lineitem_urgent(sf_dir)


def _q_join_salted(sf_dir: str):
    from jsonld_js_ray.stages.joins import (
        salted_skew_join_lineitem_orders,
    )

    return salted_skew_join_lineitem_orders(sf_dir)


def _q_join_adaptive(sf_dir: str):
    from jsonld_js_ray.stages.joins import adaptive_join_lineitem_high

    return adaptive_join_lineitem_high(sf_dir)


def _q_kg_assortativity(sf_dir: str):
    from jsonld_js_ray.stages.graph import assortativity_moments_quads

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return assortativity_moments_quads(quads, und=und)


def _assortativity_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _assortativity_oracle_sql

    return _assortativity_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_neighbor_sample(sf_dir: str):
    from jsonld_js_ray.stages.graph import neighbor_sample_quads

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return neighbor_sample_quads(quads, und=und)


def _neighbor_sample_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _neighbor_sample_oracle_sql

    return _neighbor_sample_oracle_sql(
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_random_walks(sf_dir: str):
    from jsonld_js_ray.stages.graph import random_walks_quads

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return random_walks_quads(quads, und=und)


def _random_walks_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _random_walks_oracle_sql

    return _random_walks_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_debounce_events(sf_dir: str):
    from jsonld_js_ray.stages.rank import debounce_events

    return debounce_events(sf_dir)


def _q_props_extract(sf_dir: str):
    from jsonld_js_ray.stages.props import props_extract

    return props_extract(sf_dir)


def _q_ab_metrics(sf_dir: str):
    from jsonld_js_ray.stages.ab import ab_metrics

    return ab_metrics(sf_dir)


def _q_value_k_correlation(sf_dir: str):
    from jsonld_js_ray.stages.props import value_k_correlation

    return value_k_correlation(sf_dir)


def _q_kg_clustering(sf_dir: str):
    from jsonld_js_ray.stages.graph import clustering_quads

    quads, und, directed = _shared_graph_artifacts(sf_dir)
    return clustering_quads(quads, und=und, directed=directed,
                            deg=_shared_node_degrees(sf_dir))


def _clustering_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _clustering_oracle_sql

    return _clustering_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_truss_support(sf_dir: str):
    from jsonld_js_ray.stages.graph import truss_support_quads

    quads, und, directed = _shared_graph_artifacts(sf_dir)
    return truss_support_quads(quads, und=und, directed=directed)


def _truss_support_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _truss_support_oracle_sql

    return _truss_support_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_jaccard_neighbors(sf_dir: str):
    from jsonld_js_ray.stages.graph import jaccard_neighbors

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return jaccard_neighbors(quads, und=und,
                             deg=_shared_node_degrees(sf_dir))


def _jaccard_neighbors_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import (
        _jaccard_neighbors_oracle_sql,
    )

    return _jaccard_neighbors_oracle_sql(
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_user_quantiles_cont(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_value_quantiles_cont

    return user_value_quantiles_cont(sf_dir)


def _q_user_event_paths(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_event_paths

    return user_event_paths(sf_dir)


def _q_event_transitions(sf_dir: str):
    from jsonld_js_ray.stages.rank import event_transitions

    return event_transitions(sf_dir)


def _q_user_value_deltas(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_value_deltas

    return user_value_deltas(sf_dir)


def _q_user_value_ntiles(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_value_ntiles

    return user_value_ntiles(sf_dir)


def _q_pricing_summary(sf_dir: str):
    from jsonld_js_ray.stages.rollup import pricing_summary

    return pricing_summary(sf_dir)


def _q_kg_entity_lift(sf_dir: str):
    from jsonld_js_ray.pipelines.kg import entity_lift

    return entity_lift(sf_dir, ce=_shared_conv_entity_mentions(sf_dir))


def _entity_lift_oracle() -> str:
    from jsonld_js_ray.pipelines.kg import LIFT_SCALE
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL as QSQL,
    )
    from jsonld_js_ray.stages.assemble import CONV_VOCAB

    return f"""
WITH q AS ({QSQL}),
h AS (SELECT subj AS conv, obj_value AS turn FROM q
      WHERE pred = '{CONV_VOCAB}hasTurn'),
m AS (SELECT subj AS turn, obj_value AS entity FROM q
      WHERE pred = '{CONV_VOCAB}mentions'),
ce AS (SELECT DISTINCT h.conv, m.entity
       FROM h JOIN m ON h.turn = m.turn),
n1 AS (SELECT entity, CAST(count(*) AS BIGINT) AS c
       FROM ce GROUP BY entity),
nn AS (SELECT CAST(count(DISTINCT conv) AS BIGINT) AS n FROM ce),
p AS (SELECT a.entity AS e1, b.entity AS e2,
             CAST(count(*) AS BIGINT) AS n12
      FROM ce a JOIN ce b ON a.conv = b.conv AND a.entity < b.entity
      GROUP BY a.entity, b.entity)
SELECT p.e1, p.e2, p.n12 AS n_both,
       CAST((nn.n * p.n12 * {LIFT_SCALE}) // (x.c * y.c) AS BIGINT)
           AS lift
FROM p JOIN n1 x ON x.entity = p.e1
       JOIN n1 y ON y.entity = p.e2
       CROSS JOIN nn
"""


def _q_kg_resource_allocation(sf_dir: str):
    from jsonld_js_ray.stages.graph import resource_allocation

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return resource_allocation(quads, und=und)


def _resource_allocation_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import (
        _resource_allocation_oracle_sql,
    )

    return _resource_allocation_oracle_sql(
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_user_quantiles(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_value_quantiles

    return user_value_quantiles(sf_dir)


def _q_top_events_per_user(sf_dir: str):
    from jsonld_js_ray.stages.rank import top_events_per_user

    return top_events_per_user(sf_dir)


def _q_topk_docs(sf_dir: str):
    from jsonld_js_ray.stages.joins import topk_docs_by_tokens

    return topk_docs_by_tokens(sf_dir)


def _events(sf_dir: str, columns):
    import ray.data as rd

    from jsonld_js_ray.rayutil import strip_meta

    return rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=columns
    ).map_batches(strip_meta, batch_format="pyarrow",
                  zero_copy_batch=True)


def _q_funnel_windowed(sf_dir: str):
    from jsonld_js_ray.stages.funnel import funnel_stages_windowed

    return funnel_stages_windowed(
        _events(sf_dir, ["ts", "user_id", "event_type"]))


def _q_funnel_stages(sf_dir: str):
    from jsonld_js_ray.stages.funnel import funnel_stages

    return funnel_stages(_events(sf_dir, ["ts", "user_id",
                                          "event_type"]))


def _q_window_tumbling(sf_dir: str):
    from jsonld_js_ray.stages.windows import tumbling_window

    return tumbling_window(_events(sf_dir, ["ts", "user_id", "value"]))


def _q_window_distinct_users(sf_dir: str):
    from jsonld_js_ray.stages.sketches import (
        exact_distinct_users_per_window,
    )

    return exact_distinct_users_per_window(
        _events(sf_dir, ["ts", "user_id"]))


def _q_window_distinct_users_hll(sf_dir: str):
    from jsonld_js_ray.stages.sketches import (
        hll_distinct_users_per_window,
    )

    return hll_distinct_users_per_window(
        _events(sf_dir, ["ts", "user_id"]))


def _q_window_sliding(sf_dir: str):
    from jsonld_js_ray.stages.windows import sliding_window

    return sliding_window(_events(sf_dir, ["ts", "user_id"]))


def _q_window_session(sf_dir: str):
    from jsonld_js_ray.stages.windows import session_window

    return session_window(_events(sf_dir, ["ts", "user_id"]))


def _q_window_top_events(sf_dir: str):
    from jsonld_js_ray.stages.windows import window_top_events

    return window_top_events(
        _events(sf_dir, ["ts", "event_type"]))


def _q_embed_quantize(sf_dir: str):
    from jsonld_js_ray.stages.cluster import embed_quantize

    return embed_quantize(sf_dir)


def _pagerank_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _pagerank_oracle_sql

    return _pagerank_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_triangles(sf_dir: str):
    import ray.data as rd

    from jsonld_js_ray.stages.graph import triangle_stats

    # every queries() entry returns a Dataset (registry contract)
    quads, und, directed = _shared_graph_artifacts(sf_dir)
    return rd.from_arrow(
        triangle_stats(quads, und=und, directed=directed,
                       deg=_shared_node_degrees(sf_dir)))


def _q_kg_components(sf_dir: str):
    from jsonld_js_ray.stages.graph import components_quads

    return components_quads(_shared_quads(sf_dir))


def _q_kg_communities(sf_dir: str):
    from jsonld_js_ray.stages.graph import communities_quads

    return communities_quads(_shared_quads(sf_dir))


def _communities_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _communities_oracle_sql

    return _communities_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_kcore(sf_dir: str):
    from jsonld_js_ray.stages.graph import kcore_quads

    return kcore_quads(_shared_quads(sf_dir))


def _q_kg_reach(sf_dir: str):
    from jsonld_js_ray.stages.graph import reach_quads

    return reach_quads(_shared_quads(sf_dir))


def _q_kg_property_table(sf_dir: str):
    from jsonld_js_ray.stages.pivot import property_table

    return property_table(_shared_quads(sf_dir))


def _property_table_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.pivot import property_table_sql

    return property_table_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_property_unpivot(sf_dir: str):
    from jsonld_js_ray.stages.pivot import property_unpivot

    return property_unpivot(_shared_quads(sf_dir))


def _property_unpivot_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.pivot import property_unpivot_sql

    return property_unpivot_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_user_set_ops(sf_dir: str):
    from jsonld_js_ray.stages.joins import user_set_ops

    return user_set_ops(sf_dir)


def _q_user_favorite_event(sf_dir: str):
    from jsonld_js_ray.stages.rank import user_favorite_event

    return user_favorite_event(sf_dir)


def _q_event_type_pivot(sf_dir: str):
    from jsonld_js_ray.stages.pivot import event_type_pivot

    return event_type_pivot(sf_dir)


def _event_type_pivot_oracle() -> str:
    from jsonld_js_ray.stages.pivot import event_type_pivot_sql

    return event_type_pivot_sql()


def _q_kmv_sketch_users(sf_dir: str):
    from jsonld_js_ray.stages.sketches import kmv_sketch_users

    return kmv_sketch_users(sf_dir)


def _kmv_oracle() -> str:
    from jsonld_js_ray.stages.sketches import kmv_sketch_sql

    return kmv_sketch_sql()


def _q_shipping_priority(sf_dir: str):
    from jsonld_js_ray.stages.joins import shipping_priority

    return shipping_priority(sf_dir)


def _q_local_supplier_revenue(sf_dir: str):
    from jsonld_js_ray.stages.tpch import local_supplier_revenue

    return local_supplier_revenue(sf_dir)


def _q_brand_revenue(sf_dir: str):
    from jsonld_js_ray.stages.tpch import brand_revenue

    return brand_revenue(sf_dir)


def _q_join_full_outer(sf_dir: str):
    from jsonld_js_ray.stages.joins import full_outer_join_clicks_purchases

    return full_outer_join_clicks_purchases(sf_dir)


def _q_kg_common_neighbors(sf_dir: str):
    from jsonld_js_ray.stages.graph import common_neighbors

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return common_neighbors(quads, und=und)


def _common_neighbors_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _common_neighbors_oracle_sql

    return _common_neighbors_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _reach_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _reach_oracle_sql

    return _reach_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _kcore_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _kcore_oracle_sql

    return _kcore_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _components_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _components_oracle_sql

    return _components_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _q_kg_degree_hist(sf_dir: str):
    from jsonld_js_ray.stages.graph import degree_histogram

    quads, und, _ = _shared_graph_artifacts(sf_dir)
    return degree_histogram(quads, und=und,
                            deg=_shared_node_degrees(sf_dir))


def _funnel_oracle() -> str:
    from jsonld_js_ray.stages.funnel import FUNNEL_SQL

    return FUNNEL_SQL


def _degree_hist_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _degree_hist_oracle_sql

    return _degree_hist_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def _decon_ngram_oracle() -> str:
    from jsonld_js_ray.stages.ngrams import decontaminate_ngram_sql

    return decontaminate_ngram_sql()


def _dedup_substring_oracle() -> str:
    from jsonld_js_ray.stages.ngrams import dedup_substring_sql

    return dedup_substring_sql()


def _triangles_oracle() -> str:
    from jsonld_js_ray.pipelines.oracle import (
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.graph import _triangle_oracle_sql

    return _triangle_oracle_sql(KG_QUADS_WITH_MENTIONS_ORACLE_SQL)


def oracle_sql() -> dict[str, str]:
    from jsonld_js_ray.pipelines.oracle import (
        CONV_ENTITY_MENTIONS_ORACLE_SQL,
        ENTITIES_ORACLE_SQL,
        KG_QUADS_ORACLE_SQL,
        KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
        TRANSCRIPTS_ORACLE_SQL,
        TRIPLE_STATS_ORACLE_SQL,
    )
    from jsonld_js_ray.stages.dedup import (
        DEDUP_EXACT_SQL,
        DEDUP_MINHASH_EXACT_SQL,
        DEDUP_NGRAM_EXACT_SQL,
        DEDUP_PLANTED_SQL,
        SIMHASH_DEDUP_SQL,
        EMBEDDING_PLANTED_SQL,
        FINGERPRINT_CLASSES_PLANTED_SQL,
        SIMHASH_PLANTED_SQL,
    )
    from jsonld_js_ray.stages.linker import MENTIONS_SQL
    from jsonld_js_ray.stages.cluster import (
        EMBED_QUANTIZE_SQL,
        KMEANS_ASSIGN_SQL,
        PQ_ENCODE_SQL,
        SEMDEDUP_SQL,
    )
    from jsonld_js_ray.stages.ngrams import TOP_BIGRAMS_SQL
    from jsonld_js_ray.stages.pack import PACK_SEQUENCES_SQL
    from jsonld_js_ray.stages.similarity import KNN_BRUTE_SQL
    from jsonld_js_ray.stages.text import (
        CHUNK_DOCS_SQL,
        CORPUS_TOKEN_QUANTILES_SQL,
        DECONTAMINATE_SQL,
        LANG_ID_SQL,
        LENGTH_OUTLIER_FILTER_SQL,
        NORMALIZE_TEXT_SQL,
        REPETITION_SQL,
        STRATIFIED_SAMPLE_SQL,
        MIX_SOURCES_SQL,
        QUALITY_SQL,
        SAMPLE_DOCS_SQL,
        SCRUB_PII_SQL,
        SPLIT_ASSIGN_SQL,
        TEXT_STATS_SQL,
        TOKEN_COUNTS_SQL,
        curation_filter_sql,
    )
    from jsonld_js_ray.stages.histo import (
        GLOBAL_SORT_SQL,
        RANGE_BOUNDS_SQL,
        SKYLINE_SQL,
        VALUE_HISTOGRAM_SQL,
    )
    from jsonld_js_ray.stages.cohort import COHORT_RETENTION_SQL
    from jsonld_js_ray.stages.ab import AB_METRICS_SQL
    from jsonld_js_ray.stages.props import (
        PROPS_EXTRACT_SQL,
        VALUE_K_CORRELATION_SQL,
    )
    from jsonld_js_ray.stages.tpch import (
        BRAND_REVENUE_SQL,
        LOCAL_SUPPLIER_REVENUE_SQL,
    )
    from jsonld_js_ray.stages.joins import (
        ADAPTIVE_JOIN_SQL,
        ANTI_JOIN_SQL,
        ASOF_JOIN_SQL,
        BLOOM_SEMI_JOIN_SQL,
        BROADCAST_JOIN_SQL,
        BUCKETED_JOIN_SQL,
        SALTED_JOIN_SQL,
        USER_SET_OPS_SQL,
        FULL_OUTER_JOIN_SQL,
        LEFT_JOIN_SQL,
        SHIPPING_PRIORITY_SQL,
        RANGE_JOIN_SQL,
        TOPK_DOCS_SQL,
    )
    from jsonld_js_ray.stages.dedup import EMBEDDING_DEDUP_SQL
    from jsonld_js_ray.stages.tfidf import (
        INVERTED_INDEX_SQL,
        LM_BACKOFF_SCORE_SQL,
        LM_BIGRAM_SCORE_SQL,
        LM_UNIGRAM_SCORE_SQL,
        TFIDF_TOPK_SQL,
    )
    from jsonld_js_ray.stages.rank import (
        DEBOUNCE_SQL,
        EVENT_TRANSITIONS_SQL,
        USER_FAVORITE_SQL,
        ROBUST_OUTLIERS_SQL,
        USER_QUANTILES_CONT_SQL,
        USER_DELTAS_SQL,
        USER_PATHS_SQL,
        USER_NTILES_SQL,
        RUNNING_TOTALS_SQL,
        TOP_EVENTS_SQL,
        USER_QUANTILES_SQL,
    )
    from jsonld_js_ray.stages.rollup import (
        CUBE_EVENTS_SQL,
        PRICING_SUMMARY_SQL,
        ROLLUP_EVENTS_SQL,
    )
    from jsonld_js_ray.stages.funnel import FUNNEL_WINDOWED_SQL
    from jsonld_js_ray.stages.sketches import WINDOW_DISTINCT_USERS_SQL
    from jsonld_js_ray.stages.windows import (
        SESSION_WINDOW_SQL,
        SLIDING_WINDOW_SQL,
        TUMBLING_WINDOW_SQL,
        WINDOW_TOP_EVENTS_SQL,
    )

    from jsonld_js_ray.stages.entity_merge import (
        _entities_canonical_planted_sql,
        _entities_canonical_sql,
    )

    return {
        "transcripts": TRANSCRIPTS_ORACLE_SQL,
        # construction-based: real vocab has pairwise Jaccard 0 →
        # identity mapping; planted variant has known clusters
        "kg_entities_canonical": _entities_canonical_sql(),
        "kg_entities_canonical_planted": _entities_canonical_planted_sql(),
        "kg_quads": KG_QUADS_ORACLE_SQL,
        # the jsonl round trip re-emits the kg_quads table exactly —
        # same documents, same ToRdf stage, identity preserved by the
        # connector (sources/jsonld_lines.py)
        "kg_quads_jsonl": KG_QUADS_ORACLE_SQL,
        # file round trip drops conv_id (not part of the N-Quads wire
        # format); everything else must parse back byte-exact
        "kg_quads_nq_file": (
            "SELECT subj, pred, obj_kind, obj_value, obj_datatype, "
            "obj_lang, graph FROM (" + KG_QUADS_ORACLE_SQL + ")"),
        "kg_quads_with_mentions": KG_QUADS_WITH_MENTIONS_ORACLE_SQL,
        "kg_quad_stats": TRIPLE_STATS_ORACLE_SQL,
        "kg_mentions": MENTIONS_SQL,
        "kg_entities": ENTITIES_ORACLE_SQL,
        # 2-hop SPARQL-style BGP join over the quad table
        "kg_conv_entity_mentions": CONV_ENTITY_MENTIONS_ORACLE_SQL,
        # integer damped PageRank over the quad graph (3 fixed rounds;
        # every op order-independent so the hash compare is exact)
        "kg_pagerank": _pagerank_oracle(),
        # mention-weighted bipartite PageRank (weight-split messages)
        "kg_pagerank_weighted": _pagerank_weighted_oracle(),
        # degree-oriented wedge-join triangle count vs 3-way self-join
        "kg_triangles": _triangles_oracle(),
        # R-round min-label propagation vs chained-CTE mirror
        "kg_components": _components_oracle(),
        # R-round synchronous k-core peeling vs chained-CTE mirror
        "kg_kcore": _kcore_oracle(),
        # synchronous mode-label LPA vs row_number()-argmax CTE mirror
        "kg_communities": _communities_oracle(),
        "kg_reach": _reach_oracle(),
        "kg_common_neighbors": _common_neighbors_oracle(),
        # quad pivot -> wide node property table (KG entity export)
        "kg_property_table": _property_table_oracle(),
        # UNPIVOT/melt back to long triples (the pivot inverse)
        "kg_property_unpivot": _property_unpivot_oracle(),
        # undirected degree distribution (deg values bounded)
        "kg_degree_hist": _degree_hist_oracle(),
        # per-node local clustering coefficient as exact integer
        # numerator/denominator (triangle corners vs 3-way join)
        "kg_clustering": _clustering_oracle(),
        # per-edge triangle support (the k-truss base quantity)
        "kg_truss_support": _truss_support_oracle(),
        # neighborhood Jaccard as exact integer common/union counts
        "kg_jaccard_neighbors": _jaccard_neighbors_oracle(),
        # degree-assortativity moments (m, Σdu·dv, Σdu+dv, Σdu²+dv²)
        "kg_assortativity": _assortativity_oracle(),
        # GraphSAGE-style deterministic 2-hop neighbor sample
        # (md5-rank top-k per node, row_number mirror)
        "kg_neighbor_sample": _neighbor_sample_oracle(),
        # DeepWalk-style deterministic walk corpus (step-salted md5
        # argmin successors, chained-join mirror)
        "kg_random_walks": _random_walks_oracle(),
        # lossless distributed fromRDF∘toRDF round-trip → same quad table
        "kg_quads_roundtrip": KG_QUADS_ORACLE_SQL,
        "kg_compact_roundtrip": (
            "WITH transcripts AS (" + TRANSCRIPTS_ORACLE_SQL + ") "
            "SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns "
            "FROM transcripts GROUP BY conv_id"),
        "kg_merged_node_props": (
            "WITH transcripts AS (" + TRANSCRIPTS_ORACLE_SQL + "), "
            "t AS (SELECT *, 'https://w3id.org/conv/id/' || conv_id "
            "      || '/t/' || CAST(turn_idx AS VARCHAR) AS t_iri, "
            "      'https://w3id.org/conv/id/' || conv_id AS c_iri "
            "      FROM transcripts) "
            "SELECT t_iri AS subj, "
            "       CAST(6 + CASE WHEN tool IS NULL THEN 0 ELSE 1 END "
            "            + CASE WHEN text IS NULL THEN -1 ELSE 0 END "
            "            + CASE WHEN ts IS NULL THEN -1 ELSE 0 END "
            "            AS BIGINT) AS n_props, "
            "       CAST(6 + CASE WHEN tool IS NULL THEN 0 ELSE 1 END "
            "            + CASE WHEN text IS NULL THEN -1 ELSE 0 END "
            "            + CASE WHEN ts IS NULL THEN -1 ELSE 0 END "
            "            AS BIGINT) AS n_values "
            "FROM t "
            "UNION ALL "
            "SELECT c_iri, CAST(3 AS BIGINT), "
            "       CAST(2 + count(*) AS BIGINT) "
            "FROM t GROUP BY c_iri"),
        "kg_flatten_counts": (
            "WITH transcripts AS (" + TRANSCRIPTS_ORACLE_SQL + ") "
            "SELECT conv_id, CAST(count(*) + 1 AS BIGINT) AS n_nodes "
            "FROM transcripts GROUP BY conv_id"),
        "dedup_exact": DEDUP_EXACT_SQL,
        # RAW dedup rows: exact ground-truth SQL (word/char Jaccard
        # closure; simhash recomputed bit-exactly in SQL via the
        # md5-derived token hash), valid under the in-run exactness
        # certificates of the *_checked wrappers (knn_lsh pattern)
        "dedup_minhash": DEDUP_MINHASH_EXACT_SQL,
        "dedup_ngram": DEDUP_NGRAM_EXACT_SQL,
        "dedup_simhash": SIMHASH_DEDUP_SQL,
        "dedup_minhash_planted": DEDUP_PLANTED_SQL,
        "dedup_embedding_planted": EMBEDDING_PLANTED_SQL,
        "dedup_ngram_planted": DEDUP_PLANTED_SQL,
        "dedup_simhash_planted": SIMHASH_PLANTED_SQL,
        "fingerprint_classes_planted": FINGERPRINT_CLASSES_PLANTED_SQL,
        "knn_brute": KNN_BRUTE_SQL,
        # knn_lsh is approximate BY DESIGN; the exact top-k SQL is a
        # valid oracle only in the recall-1.0 regime its defaults are
        # sized for, so q_knn_lsh_checked verifies that precondition
        # in-run and raises if it breaks (plus a recall floor asserted
        # in tests/test_training_data.py)
        "knn_lsh": KNN_BRUTE_SQL,
        # knn_ivf query probes every centroid list (exhaustive) →
        # equals brute by construction; the approximate scale path is
        # recall-pinned in pytest
        "knn_ivf": KNN_BRUTE_SQL,
        # knn_pq with shortlist >= corpus reranks every candidate
        # exactly → equals brute by construction; the production
        # ADC-shortlist recall is pinned in pytest
        "knn_pq": KNN_BRUTE_SQL,
        # knn_ivfpq (IVFADC) probing every cell with shortlist >=
        # corpus → equals brute by construction; production recall
        # pinned in pytest
        "knn_ivfpq": KNN_BRUTE_SQL,
        "text_stats": TEXT_STATS_SQL,
        # quality is exact integer ppm arithmetic over the text_stats
        # counters (floor division mirrored on both sides)
        "quality": QUALITY_SQL,
        "token_counts": TOKEN_COUNTS_SQL,
        "split_assign": SPLIT_ASSIGN_SQL,
        "sample_docs": SAMPLE_DOCS_SQL,
        "lang_id": LANG_ID_SQL,
        # PII scrub + curation keep/drop: RE2 regex semantics on both
        # sides, fixed pattern order, integer counters
        "scrub_pii": SCRUB_PII_SQL,
        "curation_filter": curation_filter_sql(),
        # benchmark-overlap decontamination: deterministic probe set
        # (doc_id % mod) + substring containment, exact on both sides
        "decontaminate": DECONTAMINATE_SQL,
        # gram-hash semi-join (nothing broadcast): distinct shared
        # token 5-grams vs the id-rule benchmark set
        "decontaminate_ngram": _decon_ngram_oracle(),
        # exact K-token-window dedup (Lee et al. 2022): pure set
        # arithmetic over window strings — direct oracle on the raw
        # corpus, unlike the probabilistic dedup families
        "dedup_substring": _dedup_substring_oracle(),
        # fixed-centroid cosine argmax (cross-join row_number in SQL)
        "kmeans_assign": KMEANS_ASSIGN_SQL,
        # SemDeDup rule: drop if an earlier cluster-mate has cos >= T
        "semdedup": SEMDEDUP_SQL,
        # per-subspace nearest codebook id, distances compared in f64
        "pq_encode": PQ_ENCODE_SQL,
        # per-(lang, source) deterministic K-representative sample:
        # md5 hash order mirrored by row_number() in SQL
        "stratified_sample": STRATIFIED_SAMPLE_SQL,
        # per-source mixture resampling with epoch indices: integer
        # ppt weights + md5-prefix32 decisions, range/unnest in SQL
        "mix_sources": MIX_SOURCES_SQL,
        # corpus-wide document frequency + per-doc top terms by tf/df
        # (integer cross-ratio ordering — no floats in the contract)
        "tfidf_topk": TFIDF_TOPK_SQL,
        # token -> exact df + capped ascending posting list
        "inverted_index": INVERTED_INDEX_SQL,
        # within-doc duplicate bigram/trigram fraction (integer ppm)
        "repetition": REPETITION_SQL,
        # corpus-wide exact token-count quantiles via value histogram
        "corpus_token_quantiles": CORPUS_TOKEN_QUANTILES_SQL,
        # overlapping token-window chunking (1->N flat_map class)
        "chunk_docs": CHUNK_DOCS_SQL,
        # doc_id-order sequence packing (distributed prefix-sum scan)
        "pack_sequences": PACK_SEQUENCES_SQL,
        # global top-k bigram collocations (partial counts -> hash
        # buckets -> bounded final sort; ties broken by words asc)
        "top_bigrams": TOP_BIGRAMS_SQL,
        # self-calibrating length filter: corpus [p25, p99] band from
        # the exact quantile scan, then one streaming filter pass
        "length_outlier_filter": LENGTH_OUTLIER_FILTER_SQL,
        # unigram-LM quality proxy: tf-weighted mean corpus token
        # frequency per doc, integer-scaled (CCNet-style LM signal)
        "lm_unigram_score": LM_UNIGRAM_SCORE_SQL,
        # bigram-LM quality proxy: mean scaled conditional pair
        # probability, integer floor arithmetic mirrored in SQL; one
        # prefix-hash shuffle computes n1, n2 and the join in place
        "lm_bigram_score": LM_BIGRAM_SCORE_SQL,
        # held-out stupid-backoff LM (trained on even doc_ids only)
        "lm_backoff_score": LM_BACKOFF_SCORE_SQL,
        "window_tumbling": TUMBLING_WINDOW_SQL,
        "window_distinct_users": WINDOW_DISTINCT_USERS_SQL,
        "window_sliding": SLIDING_WINDOW_SQL,
        "window_session": SESSION_WINDOW_SQL,
        # windowed rank: top-n event types per tumbling window
        "window_top_events": WINDOW_TOP_EVENTS_SQL,
        # symmetric int8 embedding quantization (3 IEEE doubles both
        # sides; max-abs scale is order-free → hash-exact)
        "embed_quantize": EMBED_QUANTIZE_SQL,
        "dedup_embedding": EMBEDDING_DEDUP_SQL,
        "join_broadcast": BROADCAST_JOIN_SQL,
        "join_bucketed": BUCKETED_JOIN_SQL,
        # partitioned hash ANTI join (NOT EXISTS / set difference)
        "join_anti": ANTI_JOIN_SQL,
        # partitioned hash LEFT OUTER join (NULL-preserving branch)
        "join_left": LEFT_JOIN_SQL,
        # partitioned hash FULL OUTER join (both sides optional)
        "join_full_outer": FULL_OUTER_JOIN_SQL,
        # 3-table broadcast+bucketed join with partial top-k (Q3 shape)
        "shipping_priority": SHIPPING_PRIORITY_SQL,
        # 6-table star join (Q5 shape): broadcast dims + two bucketed
        # fact hops + same-nation predicate
        "local_supplier_revenue": LOCAL_SUPPLIER_REVENUE_SQL,
        # lineitem ⋈ part dimension broadcast (brand rollup)
        "brand_revenue": BRAND_REVENUE_SQL,
        "join_asof": ASOF_JOIN_SQL,
        "join_range": RANGE_JOIN_SQL,
        "topk_docs": TOPK_DOCS_SQL,
        "user_quantiles": USER_QUANTILES_SQL,
        # interpolated (continuous) quantiles — bit-exact lerp mirror
        "user_quantiles_cont": USER_QUANTILES_CONT_SQL,
        "top_events_per_user": TOP_EVENTS_SQL,
        # per-user cumulative window (ROWS UNBOUNDED PRECEDING)
        "user_running_totals": RUNNING_TOTALS_SQL,
        # fixed-width float histogram (bit-identical IEEE bin ids)
        "value_histogram": VALUE_HISTOGRAM_SQL,
        # sampled range-partition boundaries (the TeraSort primitive)
        "range_partition_bounds": RANGE_BOUNDS_SQL,
        # full TeraSort: range-partitioned global total order with
        # exact row_number ranks (sample → route once → local sort)
        "global_sort": GLOBAL_SORT_SQL,
        # 2-D skyline / Pareto maxima (dominance anti-self-join
        # mirror; distributed via the skyline-of-skylines algebra)
        "skyline_events": SKYLINE_SQL,
        # per-user median/MAD anomaly flag (quantile_disc + IEEE ops)
        "robust_outliers": ROBUST_OUTLIERS_SQL,
        # GROUP BY ROLLUP cascade (all grouping-set prefixes, one read)
        "rollup_events": ROLLUP_EVENTS_SQL,
        # GROUP BY CUBE (all four grouping sets, pinned finest level)
        "cube_events": CUBE_EVENTS_SQL,
        # cohort-retention matrix (first-day cohorts × day offsets)
        "cohort_retention": COHORT_RETENTION_SQL,
        # Bloom-prefiltered partitioned SEMI join (exact post-verify)
        "join_bloom_semi": BLOOM_SEMI_JOIN_SQL,
        # salted hot-key join (row-salt probe, R-replicated build —
        # identical semantics to the unsalted inner join)
        "join_salted": SALTED_JOIN_SQL,
        # size-adaptive join (broadcast vs partitioned picked from the
        # measured build side; both plans oracle-identical)
        "join_adaptive": ADAPTIVE_JOIN_SQL,
        # INTERSECT / EXCEPT set operators over distinct user sets
        "user_set_ops": USER_SET_OPS_SQL,
        # grouped MODE (argmax count, min-type ties) per user
        "user_favorite_event": USER_FAVORITE_SQL,
        # relational PIVOT / FILTER-clause counts per user × type
        "event_type_pivot": _event_type_pivot_oracle(),
        # KMV bottom-k distinct sketch — the md5 contract makes the
        # sketch itself SQL-mirrorable (ORDER BY md5 LIMIT K)
        "kmv_sketch_users": _kmv_oracle(),
        # per-(user, type) burst debounce (LAG gap filter, 5-min gap)
        "debounce_events": DEBOUNCE_SQL,
        # JSON payload field extraction (RE2 both sides) + aggregates
        "props_extract": PROPS_EXTRACT_SQL,
        # exact integer cross-moments (Pearson r is reader-side)
        "value_k_correlation": VALUE_K_CORRELATION_SQL,
        # A/B experiment readout: md5-assigned variants, exact integer
        # moments (Σ cents, Σ cents²) per (variant, type) cell
        "ab_metrics": AB_METRICS_SQL,
        # NTILE window (per-user quartile bucketing, deterministic ties)
        "user_value_ntiles": USER_NTILES_SQL,
        # LAG window (consecutive per-user value deltas, NULL first row)
        "user_value_deltas": USER_DELTAS_SQL,
        # ordered string_agg (per-user session path export)
        "user_event_paths": USER_PATHS_SQL,
        # Markov transition counts over per-user ordered streams
        "event_transitions": EVENT_TRANSITIONS_SQL,
        # TPC-H-Q1-shaped read-prune + partial aggregate (exact cents)
        "pricing_summary": PRICING_SUMMARY_SQL,
        # degree-weighted link prediction (exact fixed-point Σ 1/deg)
        "kg_resource_allocation": _resource_allocation_oracle(),
        # conversation-level co-mention lift (statistical link proposal)
        "kg_entity_lift": _entity_lift_oracle(),
        # canonical lowercase/alnum-collapsed text (RE2 both sides)
        "normalize_text": NORMALIZE_TEXT_SQL,
        # strict-after chained stage mins (sequential pattern match)
        "funnel_stages": _funnel_oracle(),
        # conversion-window funnel (chain bounded by start + 7 days)
        "funnel_windowed": FUNNEL_WINDOWED_SQL,
        # No oracle (not SQL-expressible → driver rows-only check):
        #   window_distinct_users_hll (approximate sketch — its error
        #     bound is pinned vs the exact oracled twin in pytest),
        #   cms_token_counts (Count-Min sketch — one-sided bound
        #     est >= exact and est-exact <= eN/W asserted exactly vs
        #     the exact top-k twin in pytest),
        #   fingerprint (engine-specific winnowing hex; its equality
        #     classes ARE oracled via fingerprint_classes_planted),
        #   multimodal_features / multimodal_audio (real BMP/WAV
        #     container decode — not SQL-expressible; codecs are
        #     cross-checked against stdlib wave + golden BMP bytes
        #     in pytest)
    }
