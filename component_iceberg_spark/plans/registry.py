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
)

# The external gate checks the first ~50 entries of queries() each round.
#
# ROTATION SCHEDULE (so every query is re-checked within ~3 rounds, and a
# regression anywhere is externally caught, not just by local pytest):
#   1. Queries that have NEVER had a gate row, plus queries whose
#      implementation or oracle CHANGED this round — they must (re)earn
#      a green row first.
#   2. PINNED SENTINELS — a fixed set of high-value queries (flagship,
#      one per family: streaming, dedup, ANN, multimodal, mutation) kept
#      in the window EVERY round, so a regression in a core path never
#      waits for the rotation to come back around.
#   3. The remaining slots take registered queries ordered by the age of
#      their last gate row, OLDEST FIRST (r4 fills with the 38 queries
#      last checked in round 1; round 5 takes the round-2 cohort, etc.).
# Names here that don't exist are ignored (safe across refactors).
_GATE_PRIORITY = (
    # --- 1. never gate-checked (registered after the r3 window was spent,
    #     plus the three r4 additions)
    "q2_min_cost_supplier",
    "q11_important_parts",
    "ext_cardinality_hll",
    "ext_quantile_kll",
    "ext_overlap_theta",
    "text_chunk_windows",
    "text_quality_classifier",
    "ext_embedding_mean_pool",
    "pipeline_pretrain_prep",
    "text_bm25_topk",
    # --- 1. changed this round: new exact oracles (were no_oracle) and
    #     the upsert tie-break encoding change
    "stream_session_window",
    "stream_stateful_totals",
    "upsert_by_key",
    # --- 2. pinned sentinels (keep this set stable round over round)
    "q1_pricing_summary",
    "q5_local_supplier_volume",
    "stream_window_counts",
    "dedup_minhash_lsh",
    "dedup_semantic",
    "mm_feature_extract",
    "ext_sessionize",
    "sim_ann_ivf",
    # --- 3. oldest-first backlog: last checked in round 1
    "scan_full",
    "scan_projection",
    "scan_limit",
    "scan_filter_pushdown",
    "scan_custom_sql",
    "source_csv_typed",
    "source_csv_all_varchar",
    "sink_csv",
    "sink_parquet",
    "order_preserve",
    "meta_describe",
    "cast_coerce",
    "insert_union",
    "sink_parquet_partitioned",
    "source_json",
    "q3_shipping_priority",
    "join_anti",
    "join_semi",
    "ext_window_rank",
    "ext_window_analytic",
    "ext_topk",
    "ext_setop_intersect",
    "ext_setop_except",
    "ext_agg_rollup",
    "ext_agg_groupby",
    "ext_pivot",
    "ext_asof_join",
    "ext_agg_cube",
    "ext_unpivot",
    "join_outer",
    "ext_range_join",
    "ext_agg_approx",
    "ext_agg_salted",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q13_customer_distribution",
    "q6_forecast_revenue",
    "q12_priority_shipmode",
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
