#!/usr/bin/env python3
"""Headline benchmark: runs the engine's representative queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced through full execution with the noop sink (count()
would let Catalyst short-circuit column work). Timings are wall-clock per
query on a warm session; `value` is the total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from component_iceberg_spark.plans import load_all  # noqa: E402
from component_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of the registry: scan, agg, joins, windows,
# mutation, dedup (exact + LSH), text, similarity, streaming ingest.
HEADLINE = (
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "scan_projection",
    "ext_window_rank",
    "ext_sessionize",
    "ext_agg_rollup",
    "upsert_by_key",
    "dedup_last_wins",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "sim_topk_bruteforce",
    "sim_ann_ivf",
    "sim_ann_hyperplane",
    "stream_window_counts",
    "sink_parquet",
    "ext_asof_join",
    "ext_range_join",
    "ext_global_rank",
    "func_json",
    "snap_compact",
    # round-2 additions: cluster formation, frame fan-out, sampling
    "dedup_clusters",
    "mm_frame_features",
    "ext_sample_stratified",
    # round-2 late additions: TPC-H depth, span dedup, semantic dedup
    "q21_waiting_supplier",
    "text_span_dedup",
    "dedup_semantic",
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    registry = load_all()
    spark = get_spark("bench")
    # warm the JVM/codegen paths so timings measure the plans, not startup
    force(registry["scan_full"].fn(spark, SF_DIR))

    # best-of-2: first run pays one-off codegen/JIT per query; the second
    # measures the plan. Reported value = steady-state throughput.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            force(registry[name].fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    try:
        sf = float(os.path.basename(SF_DIR.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
