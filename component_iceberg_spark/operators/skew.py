"""Skew mitigation: salted two-phase aggregation and salted broadcast-side
join expansion.

AQE's skew handling splits oversized *partitions*; salting goes further —
it splits a single hot *key* across reducers. Used when one key holds an
outsized share of rows (the Zipf reality of event types, languages, or
null-ish keys in 100 TB corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: phase 1 groups on (key, salt) so a hot key's
    rows spread over ``salt_buckets`` reducers; phase 2 combines the
    partials per key. Only decomposable aggregates belong here (sum,
    count, min, max — avg as sum/count).

    ``aggs`` maps output name → phase-1 aggregate expression; phase 2
    recombines by name with the matching combiner (sum for sum/count,
    min/max for min/max), declared via the expression's alias prefix.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    combiners = []
    for name in aggs:
        if name.startswith("min_"):
            combiners.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            combiners.append(F.max(name).alias(name))
        else:  # sums and counts combine by summation
            combiners.append(F.sum(name).alias(name))
    return phase1.groupBy(*keys).agg(*combiners)


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's key, explode the small
    side ``salt_buckets``× (one copy per salt), equi-join on (key, salt).
    Small side stays broadcastable (buckets × |small|); the hot key's rows
    land on ``salt_buckets`` reducers instead of one."""
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return (
        salted_big.join(F.broadcast(exploded_small), [key, "_salt"])
        .drop("_salt")
    )
