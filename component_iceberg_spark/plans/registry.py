"""Central operator/query registry.

Each entry in SURVEY.md §2 registers here exactly once: a name, a Spark
callable ``(spark, sf_dir) -> DataFrame``, and (when SQL-expressible) the
equivalent ANSI SQL the DuckDB oracle runs over the same Parquet fixtures.
The driver's correctness gate and the local pytest harness consume the
same registry, so "tests green" locally means the gate passes.

Determinism rules every query follows (so order-insensitive value-hash
comparison against DuckDB is exact):

- Alias every computed column identically in Spark and SQL.
- Never rely on row order; when an op is inherently ordered (top-k,
  ranks), break ties with a unique key so the *set* is deterministic.
- Floating aggregates that sum many doubles are rounded (2-6 dp) on BOTH
  sides: Spark and DuckDB may sum in different orders, differing in ulps;
  rounding absorbs that while still validating the math.
- Integer / string / timestamp results are compared exactly.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class EngineQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, EngineQuery] = {}

_QUERY_MODULES = (
    "component_iceberg_spark.plans.queries_text",
    "component_iceberg_spark.plans.queries_similarity",
    "component_iceberg_spark.plans.queries_multimodal",
    "component_iceberg_spark.plans.queries_streaming",
    "component_iceberg_spark.plans.queries_functions",
    "component_iceberg_spark.plans.queries_mutation",
    "component_iceberg_spark.plans.queries_extended",
    "component_iceberg_spark.plans.queries_scan",
    "component_iceberg_spark.plans.queries_relational",
    "component_iceberg_spark.plans.queries_tpch",
    "component_iceberg_spark.plans.queries_sketch",
    "component_iceberg_spark.plans.queries_analytics",
)

# The external gate checks the first ~50 entries of queries() each round.
#
# ROTATION SCHEDULE (so every query is re-checked within ~3 rounds, and a
# regression anywhere is externally caught, not just by local pytest).
# Rotated for r8 (VERDICT r7 "Next round" #1): sentinels lead
# unconditionally; tier 2 is the 7 never-gated late-r7 newborns plus any
# query whose code/oracle changes this round; tier 2b re-earns rows for
# the two late-r7 refactors; the backlog then runs strictly oldest gate
# row first (r1 -> r2 -> r3 -> r4), so the ~50 window takes the 9+2 head
# plus the whole r1 tier and most of the r2 tier. Fresh r6/r7 greens sit
# at the tail and rotate back as their rows age.
#   1. PINNED SENTINELS -- eight flagships, one per family, EVERY round.
#   2. Queries with NO gate row ever, plus queries whose implementation
#      or oracle CHANGED this round -- they (re)earn a green row first.
#   3. Remaining slots: registered queries ordered by the age of their
#      last gate row, OLDEST FIRST.
# Names here that don't exist are ignored (safe across refactors).
_GATE_PRIORITY = (
    # --- 1. PINNED SENTINELS (every round, always first): TPC-H agg,
    #     TPC-H join, streaming, semantic dedup, LSH dedup, multimodal,
    #     sessionize, ANN.
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "dedup_minhash_lsh",
    "stream_window_counts",
    "dedup_semantic",
    "mm_feature_extract",
    "ext_sessionize",
    "sim_ann_ivf",
    # --- 2. NEVER-GATED: the 7 late-r7 newborns that postdate the r7
    #     window (all locally exact — assure.py / judge drive). New r8
    #     queries insert here as they register, and any query whose code
    #     or oracle changes in r8 moves up here to re-earn its row.
    "pipeline_token_budget",
    "stream_rocksdb_state",
    "snap_upsert_evolve",
    "sim_mmr_diversify",
    "pipeline_pack_sequences",
    "pipeline_temperature_mix",
    "text_winnow_fingerprint",
    # new-in-r8 queries (never gated → ahead of the backlog)
    "pipeline_token_budget_scalable",
    "ext_profile_columns_approx",
    "pipeline_pack_sequences_sharded",
    "ext_spatial_grid_join_salted",
    "ext_window_crossover",
    "ext_rollup_rank",
    "pipeline_split_leakage_safe",
    # r8 changed-code re-earns: winnow pos-wrap (above), histogram oracle
    # NULL-bin guard, bounded persist-cache refactor (containment, BPE
    # encode, LSH-pairs consumers)
    "ext_histogram",
    "dedup_containment",
    "text_bpe_encode",
    "dedup_clusters",
    "ext_profile_columns",
    # --- 2b. re-earning rows: refactored late-r7 onto the shared
    #     quality_score helper OUTSIDE the r7 window (plans unchanged,
    #     locally re-driven green).
    "text_quality",
    "pipeline_curation",
    # --- backlog: last gate row r1 (9 names, oldest-first tier)
    "ext_agg_approx",
    "ext_agg_salted",
    "ext_range_join",
    "join_outer",
    "q12_priority_shipmode",
    "q13_customer_distribution",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q6_forecast_revenue",
    # --- backlog: last gate row r2 (31 names, oldest-first tier)
    "dedup_exact",
    "dedup_last_wins",
    "dedup_ngram_jaccard",
    "ext_global_rank",
    "ext_grouped_pandas",
    "ext_string_agg",
    "ext_window_distribution",
    "func_conditional",
    "func_datetime",
    "func_json",
    "func_string",
    "incremental_load_flag",
    "mm_dedup_content",
    "mm_frame_sample",
    "mm_ingest_hash",
    "snap_append_current",
    "snap_append_timetravel",
    "snap_catalog_meta",
    "snap_compact",
    "text_fingerprint",
    "text_langid",
    "text_span_dedup",
    "text_tokens",
    "text_top_ngrams",
    "snap_delete_where",
    "snap_partitioned_scan",
    "snap_replace",
    "snap_schema_evolution",
    "snap_snapshots_list",
    "snap_stats_pruned_scan",
    "snap_update_where",
    # --- backlog: last gate row r3 (37 names, oldest-first tier)
    "dedup_simhash",
    "ext_contamination_screen",
    "ext_nested_ops",
    "ext_percentile_exact",
    "ext_sample_deterministic",
    "ext_sample_group_cap",
    "ext_sample_stratified",
    "mm_audio_segments",
    "mm_frame_features",
    "mm_frame_hash",
    "mm_probe_audio",
    "mm_probe_video",
    "q10_returned_items",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_part_supplier_cnt",
    "q19_discounted_revenue",
    "q20_excess_suppliers",
    "q21_waiting_supplier",
    "q22_dormant_customers",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "sim_ann_ivf_kmeans",
    "sink_orc",
    "snap_delete_mor",
    "snap_hidden_partition",
    "snap_incremental_read",
    "snap_partition_evolution",
    "snap_rollback",
    "snap_tag_read",
    "text_lm_score",
    "text_normalize",
    "text_pack_offsets",
    "text_redact_pii",
    "text_repetition",
    # --- backlog: last gate row r4 (41 names, oldest-first tier)
    "cast_coerce",
    "ext_agg_cube",
    "ext_agg_groupby",
    "ext_agg_rollup",
    "ext_asof_join",
    "ext_cardinality_hll",
    "ext_embedding_mean_pool",
    "ext_overlap_theta",
    "ext_pivot",
    "ext_quantile_kll",
    "ext_setop_except",
    "ext_setop_intersect",
    "ext_topk",
    "ext_unpivot",
    "ext_window_analytic",
    "ext_window_rank",
    "insert_union",
    "join_anti",
    "join_semi",
    "meta_describe",
    "order_preserve",
    "q11_important_parts",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "scan_custom_sql",
    "scan_filter_pushdown",
    "scan_full",
    "scan_limit",
    "scan_projection",
    "sink_csv",
    "sink_parquet",
    "sink_parquet_partitioned",
    "source_csv_all_varchar",
    "source_csv_typed",
    "source_json",
    "stream_session_window",
    "stream_stateful_totals",
    "text_bm25_topk",
    "text_chunk_windows",
    "text_quality_classifier",
    "upsert_by_key",
    # --- backlog: last gate row r6 (49 names, oldest-first tier)
    "pipeline_pretrain_prep",
    "sim_ann_hyperplane",
    "sim_topk_bruteforce",
    "sim_neardup_embedding",
    "sim_quantized_topk",
    "snap_upsert",
    "stream_dedup_watermark",
    "stream_stream_join",
    "stream_upsert_snaptable",
    "ext_timeseries_features",
    "ext_integrity_check",
    "func_bitwise",
    "ext_pagerank",
    "snap_expire_branches",
    "text_tfidf_topterms",
    "ext_anomaly_zscore",
    "ext_session_paths",
    "func_stats",
    "ext_window_time_range",
    "ext_event_transitions",
    "ext_hierarchy_flatten",
    "ext_entity_merge",
    "ext_funnel",
    "ext_cohort_retention",
    "ext_gap_fill",
    "ext_fuzzy_join",
    "text_collocations",
    "pipeline_quality_buckets",
    "snap_wap_publish",
    "snap_incremental_agg",
    "snap_changelog_cdc",
    "text_hybrid_topk",
    "snap_compact_manifests",
    "dedup_incremental_minhash",
    "pipeline_domain_mix",
    "ext_split_train_test",
    "sim_ann_pq",
    "snap_cluster_rewrite",
    "ext_heavy_hitters",
    "ext_percentile_scalable",
    "sim_ann_pq_kmeans",
    "stream_incremental_dedup",
    "sim_ann_pq_stored",
    "ext_agg_grouping_sets",
    "ext_join_salted",
    "ext_join_bucketed",
    "snap_expire",
    # --- backlog: last gate row r7 (42 names, oldest-first tier)
    "snap_merge_multi",
    "snap_orphan_cleanup",
    "ext_interval_join",
    "ext_graph_triangles",
    "ext_corr_matrix",
    "ext_pca_project",
    "snap_zorder_rewrite",
    "ext_shard_shuffle",
    "ext_dbscan_grid",
    "stream_anomaly_alerts",
    "snap_scd2_apply",
    "text_url_canonicalize",
    "mm_train_record",
    "sim_knn_graph_clusters",
    "ext_sample_weighted",
    "func_array",
    "snap_append_ordered",
    "text_rerank_topk",
    "stream_topk_trending",
    "ext_histogram_equidepth",
    "sim_ann_ivf_stored",
    "mm_neardup_features",
    "text_bpe_pair_stats",
    "text_bpe_merges",
    "snap_checked_append",
    "ext_abtest_lift",
    "stream_late_data_drop",
    "ext_ndcg_eval",
    "func_map",
    "ext_spatial_grid_join",
    "snap_dpp_join",
    "snap_files_meta",
    "stream_replay_idempotent",
    "ext_window_yoy",
    "snap_timetravel_asof",
    "ext_skyline",
    "ext_regression_ols",
    "stream_state_eviction",
    "ext_dq_expectations",
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = EngineQuery(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or ""), tags=tags
        )
        return fn

    return deco


def load_all() -> dict[str, EngineQuery]:
    """Import every query module (idempotent) and return the registry,
    ordered with the current gate-priority names first."""
    for mod in _QUERY_MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Allow partial builds: a not-yet-written module just contributes
            # nothing. Anything else (typo inside a module) must surface.
            if e.name != mod:
                raise
    ordered = {n: REGISTRY[n] for n in _GATE_PRIORITY if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
