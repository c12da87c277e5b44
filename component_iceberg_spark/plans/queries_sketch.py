"""Sketch-based approximate analytics (DataSketches family, JVM-native).

These are the bounded-memory scale paths next to their exact twins:

- ``ext_cardinality_hll``   ↔ exact COUNT(DISTINCT) per group
- ``ext_quantile_kll``      ↔ ``ext_percentile_exact`` (which buffers
  whole groups — its docstring documents the memory cliff)
- ``ext_overlap_theta``     ↔ exact INTERSECT counting

Approximation is inherent and the estimates are implementation-defined
(DataSketches-versioned), so there is no DuckDB hash-match twin — these
register rows-only for the driver gate, and correctness is enforced by
error-bound tests against exact twins plus a mergeability identity test
in tests/test_approx.py (union-of-shard-sketches == single-pass sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import sketch as SK
from component_iceberg_spark.plans.registry import register


@register("ext_cardinality_hll", oracle=None, tags=("ext", "sketch", "approx"))
def ext_cardinality_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HLL (lg_k=12 → 4 KB sketch,
    ~1.6% RSE). Map-side partial sketches merge in the reduce: the
    shuffle carries KB per group instead of every distinct (group, user)
    pair — the COUNT(DISTINCT) that still works when one group holds
    10¹⁰ distinct keys. Error bound asserted vs the exact twin in
    tests/test_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    return SK.hll_distinct(ev, ["event_type"], "user_id")


@register("ext_quantile_kll", oracle=None, tags=("ext", "sketch", "approx"))
def ext_quantile_kll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of order totals per order status from a KLL floats
    sketch (k=200 → ~1.65% rank error, KB-sized state per group). The
    scale path beside ext_percentile_exact: no per-group buffering, one
    pass, mergeable partials. Rank-error bound asserted vs exact
    percentile_approx(…, 1e6) in tests/test_approx.py."""
    o = load_table(spark, sf_dir, "orders")
    return SK.kll_quantiles(o, ["o_orderstatus"], "o_totalprice")


@register("ext_overlap_theta", oracle=None, tags=("ext", "sketch", "approx"))
def ext_overlap_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|viewers|, |purchasers|, |both|, |either| of the events stream from
    two theta sketches and their set algebra — distinct-set overlap
    without joining the key sets (the audience-overlap / contamination
    primitive at 100 TB: two KB sketches replace a distinct-distinct
    join). Estimates bounded vs exact set counts in
    tests/test_approx.py."""
    ev = load_table(spark, sf_dir, "events")
    return SK.theta_overlap(ev, "user_id", "event_type", "view", "purchase")


@register(
    "ext_heavy_hitters",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM tok)
    SELECT token, count(*) AS n_occurrences
    FROM tok, tot
    GROUP BY token, tot.n
    HAVING count(*) >= tot.n // 33 + 1
    """,
    tags=("ext", "sketch"),
)
def ext_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """φ-heavy hitters over the corpus token stream (φ = 1/33): Misra-
    Gries bounded-memory candidate generation (≤ 32 summary rows per
    Arrow batch shuffle, regardless of vocabulary size) + exact
    verification of the candidates (operators/sketch.heavy_hitters_exact).
    Unlike the estimate-valued sketches above, the MG approximation
    affects COST, never the answer — the completeness guarantee makes the
    output exactly {token: count ≥ ⌊n/33⌋+1}, so this op carries a full
    hash-match oracle."""
    from pyspark.sql import functions as F

    from component_iceberg_spark.operators import text as X

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(X.tokens(F.col("text"))).alias("token"))
    return SK.heavy_hitters_exact(tok, "token", k=32).select(
        F.col("item").alias("token"), "n_occurrences"
    )
