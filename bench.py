"""Benchmark harness (driver contract).

Default: run the headline pipelines on $GRAFT_SF_DIR (default sf0.1) with
ray.init(num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line.

--scaling: run the headline pipeline in fresh subprocesses at TWO
cpu pairs on the same replicated input — the criterion pair
$GRAFT_SCALING_LO→$GRAFT_SCALING_HI (default 4→16, the linear region)
and a second $GRAFT_SCALING_LO2→$GRAFT_SCALING_HI2 (default 8→32,
which crosses the single-box memory-bandwidth ceiling) — and report
throughputs plus scaling efficiency = T(LO)/T(HI)/(HI/LO) per pair;
the sandbox stand-in for the N vs 4N cluster-size rule; see
BASELINE.md.

Headline timing: after a warm-up pass (Ray worker processes + package
import + operator compilation — startup, not throughput), kg_quads is
timed $GRAFT_HEADLINE_REPS times (default 3) and the MEDIAN is reported
(box variance is +/-20-40%; all runs are included as kg_quads_runs).
Scaling subprocesses use 1 rep (the 100+ s runs amortize constants).
"""

from __future__ import annotations

import json
from typing import Any
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _warm_cache(sf_dir: str) -> None:
    for name in ("events", "documents", "embeddings"):
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            with open(path, "rb") as f:
                while f.read(1 << 24):
                    pass


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from jsonld_js_ray.pipelines.kg import build_quads, build_quads_with_mentions
    from jsonld_js_ray.sources.transcripts import read_transcripts
    from jsonld_js_ray.stages.entity_merge import surface_stats
    from jsonld_js_ray.stages.linker import detect_mentions

    _warm_cache(SF_DIR)
    # Warm-up before timing (startup is not throughput): a trivial job
    # spawns the worker processes, then one tiny REAL pipeline run pays
    # the per-worker package import and the operator-compilation cost.
    import ray.data as rd
    rd.range(10_000).map_batches(lambda b: b).count()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        build_quads(warm_dir).count()

    queries: dict[str, float] = {}
    extras: dict[str, Any] = {}

    # headline: flagship transcripts → canonical RDF quads.
    # Median of GRAFT_HEADLINE_REPS runs (box variance is +/-20-40% at
    # sf0.1 where the job is ~1.5 s; the scaling path uses 1 rep).
    reps = max(1, int(os.environ.get("GRAFT_HEADLINE_REPS", "3")))
    runs: list[float] = []
    for _ in range(reps):
        t0 = time.perf_counter()
        n_quads = build_quads(SF_DIR).count()
        runs.append(time.perf_counter() - t0)
    headline = sorted(runs)[len(runs) // 2]
    queries["kg_quads"] = round(headline, 3)
    if reps > 1:
        extras["kg_quads_runs"] = [round(r, 3) for r in runs]

    if os.environ.get("GRAFT_HEADLINE_ONLY"):
        ray.shutdown()
        return {
            "metric": "kg_quads pipeline wall time",
            "value": round(headline, 3), "unit": "sec",
            "queries": queries, "sf": SF_DIR, "num_cpus": NUM_CPUS,
            "quads": n_quads,
            "triples_per_sec": round(n_quads / headline, 1),
            **extras,
        }

    t0 = time.perf_counter()
    n_turns = read_transcripts(SF_DIR).count()
    queries["transcripts"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    build_quads_with_mentions(SF_DIR).count()
    queries["kg_quads_with_mentions"] = round(time.perf_counter() - t0, 3)

    # flagship pipeline over the reference's native document format:
    # assemble → write sharded JSON-LD lines → read back → ToRdf
    import shutil as _sh

    import __ray_entry__ as _entry0
    t0 = time.perf_counter()
    _entry0.queries()["kg_quads_jsonl"](SF_DIR).count()
    queries["kg_quads_jsonl"] = round(time.perf_counter() - t0, 3)
    # the connector queries mkdtemp per invocation (no fixed path to
    # race on) and record their paths in SCRATCH_DIRS; the count above
    # fully consumed the lazy read, so exactly THOSE dirs are reclaimed
    # here (a /tmp glob could delete a concurrent process's live
    # scratch, and would miss dirs when TMPDIR is not /tmp)
    for d in _entry0.SCRATCH_DIRS:
        _sh.rmtree(d, ignore_errors=True)
    _entry0.SCRATCH_DIRS.clear()

    t0 = time.perf_counter()
    surface_stats(detect_mentions(read_transcripts(SF_DIR))).count()
    queries["kg_entities"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.entity_merge import canonicalize_entities
    t0 = time.perf_counter()
    canonicalize_entities(detect_mentions(read_transcripts(SF_DIR))).count()
    queries["kg_entities_canonical"] = round(time.perf_counter() - t0, 3)

    # full north-star run incl. entity canonicalization + sharded sink
    import shutil as _shutil

    from jsonld_js_ray.pipelines.kg import run_full_kg_pipeline
    out_dir = "/tmp/bench_kg_full"
    _shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    full_metrics = run_full_kg_pipeline(SF_DIR, out_dir)
    queries["kg_full_write"] = round(time.perf_counter() - t0, 3)
    extras["kg_full_quads"] = full_metrics["quads"]

    # KG analytics over the quad stream. The with-mentions quad table
    # and the triangle family's oriented-edge tables are PINNED ONCE
    # and shared across the whole family (VERDICT r3 #6) — the
    # one-time artifact build is timed separately below, so per-query
    # walls measure the operator, not a repeated input derivation.
    # gc.collect() drops refs to the earlier full-write datasets so
    # the wedge family doesn't inherit a hot object store (r3 #8).
    import gc

    gc.collect()
    import __ray_entry__ as _entry

    t0 = time.perf_counter()
    quads_m, und_m, directed_m = _entry._shared_graph_artifacts(SF_DIR)
    extras["kg_graph_artifacts_build"] = round(
        time.perf_counter() - t0, 3)

    # the (node, deg) artifact feeds triangles/clustering/jaccard/
    # degree_hist — build it once OUTSIDE any query's timed region so
    # per-query walls stay order-independent
    t0 = time.perf_counter()
    deg_m = _entry._shared_node_degrees(SF_DIR)
    extras["kg_deg_artifact_build"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.pipelines.kg import conv_entity_mentions
    from jsonld_js_ray.stages.graph import pagerank_quads

    t0 = time.perf_counter()
    pagerank_quads(quads_m).count()
    queries["kg_pagerank"] = round(time.perf_counter() - t0, 3)

    # the (conv, entity, n_mentions) artifact is shared by
    # pagerank_weighted and entity_lift — like the quad/edge tables,
    # its one-time build is timed separately so per-query walls
    # measure the operator, not the shared input derivation
    t0 = time.perf_counter()
    _entry._shared_conv_entity_mentions(SF_DIR)
    extras["kg_ce_artifact_build"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _entry.queries()["kg_pagerank_weighted"](SF_DIR).count()
    queries["kg_pagerank_weighted"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    conv_entity_mentions(SF_DIR).count()
    queries["kg_conv_entity_mentions"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import (
        components_quads,
        degree_histogram,
        triangle_stats,
    )
    t0 = time.perf_counter()
    triangle_stats(quads_m, und=und_m, directed=directed_m, deg=deg_m)
    queries["kg_triangles"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    components_quads(quads_m).count()
    queries["kg_components"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import communities_quads
    t0 = time.perf_counter()
    communities_quads(quads_m).count()
    queries["kg_communities"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    degree_histogram(quads_m, und=und_m, deg=deg_m).count()
    queries["kg_degree_hist"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import kcore_quads
    t0 = time.perf_counter()
    kcore_quads(quads_m).count()
    queries["kg_kcore"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import common_neighbors, reach_quads
    t0 = time.perf_counter()
    reach_quads(quads_m).count()
    queries["kg_reach"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    common_neighbors(quads_m, und=und_m).count()
    queries["kg_common_neighbors"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.pivot import property_table
    t0 = time.perf_counter()
    property_table(quads_m).count()
    queries["kg_property_table"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.joins import full_outer_join_clicks_purchases
    t0 = time.perf_counter()
    full_outer_join_clicks_purchases(SF_DIR).count()
    queries["join_full_outer"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import resource_allocation
    t0 = time.perf_counter()
    resource_allocation(quads_m, und=und_m).count()
    queries["kg_resource_allocation"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.joins import shipping_priority
    t0 = time.perf_counter()
    shipping_priority(SF_DIR).count()
    queries["shipping_priority"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.pipelines.kg import entity_lift
    t0 = time.perf_counter()
    entity_lift(SF_DIR,
                ce=_entry._shared_conv_entity_mentions(SF_DIR)).count()
    queries["kg_entity_lift"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.histo import range_partition_bounds
    t0 = time.perf_counter()
    range_partition_bounds(SF_DIR).count()
    queries["range_partition_bounds"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rank import robust_outliers
    t0 = time.perf_counter()
    robust_outliers(SF_DIR).count()
    queries["robust_outliers"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rollup import pricing_summary, rollup_events
    t0 = time.perf_counter()
    rollup_events(SF_DIR).count()
    queries["rollup_events"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pricing_summary(SF_DIR).count()
    queries["pricing_summary"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rank import user_value_deltas, user_value_ntiles
    t0 = time.perf_counter()
    user_value_ntiles(SF_DIR).count()
    queries["user_value_ntiles"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    user_value_deltas(SF_DIR).count()
    queries["user_value_deltas"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rank import user_value_quantiles_cont
    t0 = time.perf_counter()
    user_value_quantiles_cont(SF_DIR).count()
    queries["user_quantiles_cont"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rank import event_transitions, user_event_paths
    t0 = time.perf_counter()
    user_event_paths(SF_DIR).count()
    queries["user_event_paths"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    event_transitions(SF_DIR).count()
    queries["event_transitions"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.cohort import cohort_retention
    t0 = time.perf_counter()
    cohort_retention(SF_DIR).count()
    queries["cohort_retention"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.joins import bloom_semi_join_lineitem_urgent
    t0 = time.perf_counter()
    bloom_semi_join_lineitem_urgent(SF_DIR).count()
    queries["join_bloom_semi"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rollup import cube_events
    t0 = time.perf_counter()
    cube_events(SF_DIR).count()
    queries["cube_events"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import clustering_quads
    t0 = time.perf_counter()
    clustering_quads(quads_m, und=und_m, directed=directed_m,
                     deg=deg_m).count()
    queries["kg_clustering"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.histo import global_sort_events
    t0 = time.perf_counter()
    global_sort_events(SF_DIR).count()
    queries["global_sort"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import (
        jaccard_neighbors,
        truss_support_quads,
    )
    t0 = time.perf_counter()
    truss_support_quads(quads_m, und=und_m, directed=directed_m).count()
    queries["kg_truss_support"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    jaccard_neighbors(quads_m, und=und_m, deg=deg_m).count()
    queries["kg_jaccard_neighbors"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.joins import salted_skew_join_lineitem_orders
    t0 = time.perf_counter()
    salted_skew_join_lineitem_orders(SF_DIR).count()
    queries["join_salted"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rank import debounce_events
    t0 = time.perf_counter()
    debounce_events(SF_DIR).count()
    queries["debounce_events"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.props import props_extract
    t0 = time.perf_counter()
    props_extract(SF_DIR).count()
    queries["props_extract"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.ab import ab_metrics
    t0 = time.perf_counter()
    ab_metrics(SF_DIR).count()
    queries["ab_metrics"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.joins import adaptive_join_lineitem_high
    t0 = time.perf_counter()
    adaptive_join_lineitem_high(SF_DIR).count()
    queries["join_adaptive"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import assortativity_moments_quads
    t0 = time.perf_counter()
    assortativity_moments_quads(quads_m, und=und_m).count()
    queries["kg_assortativity"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import neighbor_sample_quads
    t0 = time.perf_counter()
    neighbor_sample_quads(quads_m, und=und_m).count()
    queries["kg_neighbor_sample"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.graph import random_walks_quads
    t0 = time.perf_counter()
    random_walks_quads(quads_m, und=und_m).count()
    queries["kg_random_walks"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.pivot import property_unpivot
    t0 = time.perf_counter()
    property_unpivot(quads_m).count()
    queries["kg_property_unpivot"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.joins import user_set_ops
    t0 = time.perf_counter()
    user_set_ops(SF_DIR).count()
    queries["user_set_ops"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.rank import user_favorite_event
    t0 = time.perf_counter()
    user_favorite_event(SF_DIR).count()
    queries["user_favorite_event"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.sketches import kmv_sketch_users
    t0 = time.perf_counter()
    kmv_sketch_users(SF_DIR).count()
    queries["kmv_sketch_users"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.pivot import event_type_pivot
    t0 = time.perf_counter()
    event_type_pivot(SF_DIR).count()
    queries["event_type_pivot"] = round(time.perf_counter() - t0, 3)

    import __ray_entry__ as _e
    from jsonld_js_ray.stages.windows import window_top_events
    t0 = time.perf_counter()
    window_top_events(_e._events(SF_DIR, ["ts", "event_type"])).count()
    queries["window_top_events"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.cluster import embed_quantize
    t0 = time.perf_counter()
    embed_quantize(SF_DIR).count()
    queries["embed_quantize"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.props import value_k_correlation
    t0 = time.perf_counter()
    value_k_correlation(SF_DIR).count()
    queries["value_k_correlation"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.histo import skyline_events
    t0 = time.perf_counter()
    skyline_events(SF_DIR).count()
    queries["skyline_events"] = round(time.perf_counter() - t0, 3)

    from jsonld_js_ray.stages.tpch import (
        brand_revenue,
        local_supplier_revenue,
    )
    # drop dataset refs from the preceding ~40 queries before the
    # broadcast-heavy TPC-H joins: measured 1.5× in-bench vs solo on
    # local_supplier_revenue when it inherits a hot object store
    gc.collect()
    t0 = time.perf_counter()
    local_supplier_revenue(SF_DIR).count()
    queries["local_supplier_revenue"] = round(
        time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    brand_revenue(SF_DIR).count()
    queries["brand_revenue"] = round(time.perf_counter() - t0, 3)

    # time the same input pipeline the oracled query uses
    import __ray_entry__ as _entry
    t0 = time.perf_counter()
    _entry.queries()["funnel_stages"](SF_DIR).count()
    queries["funnel_stages"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _entry.queries()["funnel_windowed"](SF_DIR).count()
    queries["funnel_windowed"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    _entry.queries()["cms_token_counts"](SF_DIR)
    queries["cms_token_counts"] = round(time.perf_counter() - t0, 3)

    # optional training-data ops (present from later milestones)
    try:
        from jsonld_js_ray.pipelines.training_data import bench_queries
        for name, fn in bench_queries().items():
            gc.collect()        # object-store hygiene between queries
            t0 = time.perf_counter()
            fn(SF_DIR)
            queries[name] = round(time.perf_counter() - t0, 3)
    except ImportError:
        pass

    extras["quads"] = n_quads
    extras["turns"] = n_turns
    extras["triples_per_sec"] = round(n_quads / headline, 1)
    extras["turns_per_sec"] = round(n_turns / headline, 1)

    ray.shutdown()
    return {
        "metric": "kg_quads pipeline wall time (events->transcripts->"
                  "JSON-LD->expand->toRDF->URDNA2015 quads)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        **extras,
    }


SCALING_COPIES = int(os.environ.get("GRAFT_SCALING_COPIES", "32"))
SCALING_LO = int(os.environ.get("GRAFT_SCALING_LO", "4"))
SCALING_HI = int(os.environ.get("GRAFT_SCALING_HI", "16"))
SCALING_LO2 = int(os.environ.get("GRAFT_SCALING_LO2", "8"))
SCALING_HI2 = int(os.environ.get("GRAFT_SCALING_HI2", "32"))


def _build_scaling_input() -> str:
    """Replicate the sf0.1 events table SCALING_COPIES× (conv ids
    shifted per copy, identical rows otherwise) into /tmp.

    The scaling criterion compares the SAME job on the SAME input at two
    parallelism levels; sf0.1 alone finishes in ~3 s, so constant
    scheduling overhead (~1.5 s) floors the ratio. Replication restores
    enough work to measure compute/shuffle scaling rather than the
    constant term — a sandbox stand-in for the 100 TB regime where per-
    run constants are negligible. Deterministic: derived only from the
    provided input."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src_path = os.path.join(SF_DIR, "events.parquet")
    st = os.stat(src_path)
    src_key = (f"{os.path.basename(os.path.normpath(SF_DIR))}-"
               f"{st.st_size}-{int(st.st_mtime)}")
    out_dir = f"/tmp/graft_scaling_input_{src_key}_x{SCALING_COPIES}"
    events_dir = os.path.join(out_dir, "events")
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(events_dir, exist_ok=True)
    src = pq.read_table(src_path)
    n = src.num_rows
    for copy in range(SCALING_COPIES):
        shifted = src.set_column(
            src.schema.get_field_index("user_id"), "user_id",
            pa.compute.add(src["user_id"], copy * 10_000_000))
        shifted = shifted.set_column(
            src.schema.get_field_index("event_id"), "event_id",
            pa.compute.add(src["event_id"], copy * 100_000_000))
        pq.write_table(shifted,
                       os.path.join(events_dir, f"copy-{copy:02d}.parquet"))
    with open(marker, "w") as f:
        f.write(str(n * SCALING_COPIES))
    return out_dir


def run_scaling() -> dict:
    scaled_dir = _build_scaling_input()

    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SF_DIR=scaled_dir, GRAFT_HEADLINE_ONLY="1",
                   GRAFT_HEADLINE_REPS="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True, check=True, timeout=3600,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def pair(lo_n: int, hi_n: int) -> dict:
        lo, hi = run(lo_n), run(hi_n)
        t_lo, t_hi = lo["value"], hi["value"]
        return {
            "num_cpus_lo": lo_n, "num_cpus_hi": hi_n,
            "sec_lo": t_lo, "sec_hi": t_hi,
            "triples_per_sec_lo": lo.get("triples_per_sec"),
            "triples_per_sec_hi": hi.get("triples_per_sec"),
            "scaling_efficiency": round((t_lo / t_hi) / (hi_n / lo_n),
                                        3),
        }

    # primary criterion pair (N vs 4N in the linear region) plus a
    # second 8→32 datapoint so the record carries the full curve: on
    # ONE box the 16→32 half of the upper pair runs into the
    # single-node memory-bandwidth ceiling (measured r2: 16→32 gains
    # only ~1.13×), which a real multi-node cluster does not share —
    # every node brings its own memory channels
    primary = pair(SCALING_LO, SCALING_HI)
    second = pair(SCALING_LO2, SCALING_HI2)
    return {
        "metric": "scaling efficiency kg_quads",
        "sf": SF_DIR,
        **primary,
        "pairs": [primary, second],
        "bandwidth_note": (
            "4->16 is the linear region the cluster-size criterion "
            "measures; the 8->32 pair crosses the single-box memory-"
            "bandwidth ceiling above ~16 cpus (16->32 gains ~1.13x on "
            "this node), which multi-node clusters do not share"),
        "scaling_efficiency": primary["scaling_efficiency"],
        "value": primary["scaling_efficiency"],
        "unit": "efficiency",
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
