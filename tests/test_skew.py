"""Skew-mitigation evidence (ROADMAP item 6 / VERDICT r1 #10): under a
Zipf-hot key, the salted paths must (a) produce exactly the direct
results and (b) demonstrably spread the hot key across reducers instead
of funneling it to one."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from component_iceberg_spark.operators.skew import (
    salted_agg,
    salted_broadcast_join,
)

SALT_BUCKETS = 16


@pytest.fixture()
def skewed(spark):
    """200k rows, ~90% under ONE key — the hot-key shape AQE's
    partition-splitting alone cannot fix (one key = one hash bucket)."""
    return (
        spark.range(200_000)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 1000).cast("string")))
            .alias("k"),
            (F.col("id") % 97).cast("double").alias("v"),
        )
    )


def test_salted_agg_equals_direct(spark, skewed):
    direct = (
        skewed.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
    )
    salted = salted_agg(
        skewed,
        ["k"],
        {
            "n": F.count(F.lit(1)),
            "sum_v": F.sum("v"),
            "min_v": F.min("v"),
            "max_v": F.max("v"),
        },
        salt_buckets=SALT_BUCKETS,
    )
    # integer-valued doubles here, so even the sums compare exactly
    d = {r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
         for r in direct.collect()}
    s = {r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
         for r in salted.collect()}
    assert d == s
    assert d["hot"][0] == 180_000


def test_salt_spreads_hot_key_across_reducers(spark, skewed):
    """The mechanism itself: phase 1 must split the hot key over all salt
    buckets, and those (key, salt) groups must land on >1 shuffle
    partition — versus the direct groupBy, where every hot row hashes to
    exactly one reducer."""
    salted = skewed.withColumn(
        "_salt", (F.rand(seed=42) * SALT_BUCKETS).cast("int")
    )
    phase1 = (
        salted.groupBy("k", "_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("k") == "hot")
    )
    rows = phase1.collect()
    # hot key occupies every salt bucket, partials sum to the true count
    assert len(rows) == SALT_BUCKETS
    assert sum(r["n"] for r in rows) == 180_000
    # and no bucket holds a pathological share (seeded rand is uniform)
    assert max(r["n"] for r in rows) < 180_000 * 2 / SALT_BUCKETS

    # physical spread: hash-partitioned on (k, _salt), the hot key's rows
    # occupy many shuffle partitions; partitioned on k alone, exactly one
    spread = (
        salted.repartition(32, "k", "_salt")
        .filter(F.col("k") == "hot")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    funnel = (
        skewed.repartition(32, "k")
        .filter(F.col("k") == "hot")
        .select(F.spark_partition_id().alias("pid"))
        .distinct()
        .count()
    )
    assert funnel == 1, "direct shuffle funnels the hot key to one reducer"
    assert spread >= SALT_BUCKETS // 2, f"salt spread only {spread} partitions"


def test_salted_broadcast_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold_1", "C1"), ("cold_2", "C2")],
        schema="k string, label string",
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = (
        salted_broadcast_join(skewed, dim, "k", salt_buckets=SALT_BUCKETS)
        .groupBy("k", "label")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_aqe_skew_join_splits_hot_partition(spark, skewed):
    """Beyond salting: AQE's runtime skew-join handling must split the
    hot key's oversized shuffle partition when a skewed fact sort-merge-
    joins a dim. Thresholds are lowered so the 180k-row hot partition
    counts as skewed at test scale; the executed adaptive plan must show
    a skewed AQEShuffleRead — and results must equal the plain join."""
    # independent dim (one row per key): both SMJ inputs are then plain
    # ENSURE_REQUIREMENTS shuffles — the pattern OptimizeSkewedJoin
    # handles (a dim derived from the fact via distinct() puts an
    # aggregate on that side and the rule skips the join)
    dim = (
        spark.createDataFrame([("hot",)], "k string")
        .union(
            spark.range(1000).select(
                F.concat(F.lit("cold_"), F.col("id").cast("string")).alias("k")
            )
        )
        .withColumn("label", F.concat(F.lit("L_"), F.col("k")))
    )
    conf = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ path
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        joined = skewed.join(dim, "k")
        # execute the join's OWN plan (count() would finalize a different
        # query execution) → AQE finalizes this one
        n = len(joined.collect())
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    assert n == 200_000
    assert "SortMergeJoin" in plan
    assert "skewed" in plan.lower(), "AQE did not mark the hot partition skewed"


def test_grid_join_hot_cell_salting(spark):
    """Hot-cell-salted grid join on a crafted dense-cell fixture: one
    downtown cell holds 300 points (way past the threshold), the rest is
    sparse. The salted variant must (a) return EXACTLY the plain grid
    join's pairs, and (b) spread the hot cell's B rows over all 8 salt
    lanes while cold cells stay on lane 0."""
    import random

    from component_iceberg_spark.plans.queries_analytics import (
        _grid_distance_pairs,
    )

    rnd = random.Random(3)
    d = 50.0
    # hot cell: 300 points packed into cell (10, 10) = [500,550)x[500,550)
    rows = [
        (i, 500.0 + rnd.random() * 49.9, 500.0 + rnd.random() * 49.9)
        for i in range(300)
    ]
    # sparse ring: lone points in far-apart cells
    rows += [
        (1000 + i, 5000.0 + 200.0 * i, 5000.0 + 200.0 * i) for i in range(20)
    ]
    pts = spark.createDataFrame(rows, schema="id long, x double, y double")
    plain = {
        (r.pa, r.pb, r.dist)
        for r in _grid_distance_pairs(pts, d).collect()
    }
    salted = {
        (r.pa, r.pb, r.dist)
        for r in _grid_distance_pairs(
            pts, d, hot_threshold=4, salt_buckets=8
        ).collect()
    }
    assert salted == plain
    assert len(plain) >= 300 * 299 / 2 * 0.3  # the dense cell really joins

    # lane fan-out must show up in the PHYSICAL PLAN of the salted form
    # (replaying the id%8 rule on the fixture would pass even if the
    # query never salted): the salted plan carries one EXTRA Generate
    # (the salt-sequence explode on top of the 3x3 neighborhood explode)
    # and the pmod salting expression; the plain plan has neither
    salted_df = _grid_distance_pairs(pts, d, hot_threshold=4, salt_buckets=8)
    plain_df = _grid_distance_pairs(pts, d)
    import re

    from tests.conftest import plan_formatted

    p_salt, p_plain = plan_formatted(salted_df), plan_formatted(plain_df)
    # count physical nodes via the detail-section headers "(n) Generate"
    # (the tree section spells nodes as "+- Generate (n)")
    n_gen = lambda p: len(re.findall(r"\n\(\d+\) Generate", p))  # noqa: E731
    assert n_gen(p_salt) == n_gen(p_plain) + 1, (n_gen(p_salt), n_gen(p_plain))
    assert "pmod" in p_salt and "pmod" not in p_plain
    assert "BroadcastHashJoin" in p_salt  # hot-cell metadata broadcast


def test_grid_join_coarse_cell_pair_equality(spark):
    """The `cell` parameter decouples candidate-grid size from verify
    distance d (the verify-heavy bench regime). Contract: for any
    cell >= d the verified pair set is IDENTICAL to the cell == d
    default — the coarser grid only admits more candidates, and the d²
    predicate disposes of them. Boundary pairs at exactly distance d
    included via crafted points; cell < d must be rejected (the 3x3
    neighborhood would miss true pairs)."""
    import random

    import pytest

    from component_iceberg_spark.plans.queries_analytics import (
        _grid_distance_pairs,
    )

    rnd = random.Random(7)
    d = 25.0
    # a dense pocket spanning what a coarse 100-cell sees as ONE cell
    # but a d-cell sees as 4x4 cells, plus an exact-distance-d pair
    # laid across a coarse-cell border
    rows = [
        (i, rnd.random() * 100.0, rnd.random() * 100.0) for i in range(150)
    ]
    rows += [(900, 95.0, 50.0), (901, 120.0, 50.0)]  # dist exactly 25.0
    pts = spark.createDataFrame(rows, schema="id long, x double, y double")

    base = {
        (r.pa, r.pb, r.dist) for r in _grid_distance_pairs(pts, d).collect()
    }
    assert (900, 901, 25.0) in base  # the boundary pair is a true pair
    for cell in (100.0, 400.0):
        coarse = {
            (r.pa, r.pb, r.dist)
            for r in _grid_distance_pairs(pts, d, cell=cell).collect()
        }
        assert coarse == base, f"cell={cell} changed the verified pair set"
    # salting composes with the coarse grid too
    coarse_salted = {
        (r.pa, r.pb, r.dist)
        for r in _grid_distance_pairs(
            pts, d, hot_threshold=10, salt_buckets=8, cell=100.0
        ).collect()
    }
    assert coarse_salted == base
    # ValueError, not assert: the guard is correctness-critical and must
    # survive `python -O` (r11 advice closure)
    with pytest.raises(ValueError, match="cell"):
        _grid_distance_pairs(pts, d, cell=10.0)
