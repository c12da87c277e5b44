"""Distributed exact rank selection — scalable exact percentiles.

The problem with ``groupBy().agg(percentile(...))`` at 100 TB: Spark's
exact percentile buffers each group's values to sort them, so one huge
group concentrates on one reducer and dies (``ext_percentile_exact``'s
documented memory cliff; its registered mitigation so far was the
KLL sketch — approximate). This module computes the SAME exact
interpolated percentiles with bounded per-task state:

1. per-(group, column) (n, min, max) — one hash aggregate;
2. histogram: each value maps to one of B value-range buckets — a
   (group, column, bucket) count aggregate, B bounded (default 256);
3. rank → bucket lookup: for each needed order statistic (two per
   requested percentile: floor/ceil neighbors for interpolation), find
   its bucket from the cumulative histogram — |groups| × B rows of
   METADATA, never row data;
4. selection: only values in NEEDED buckets (≈ n_g/B per group per
   percentile) are re-scanned and sorted; the sort partition is a
   single bucket, not a group.

Peak per-task state drops from O(n_g) to O(n_g / B); B is the knob.
ALL requested value columns ride through the machinery together (long
format: one scan emits (group, column-id, value) rows), so the data
passes stay at three regardless of how many columns are requested.
Caveat (documented, inherent to value-bucketing): a massively repeated
single value keeps its whole tie-class in one bucket — the sort of that
bucket is cheap (all keys equal) but its row count is not reduced; a
second histogram level inside the bucket would bound that too if needed.

Exactness: bucket boundaries are float arithmetic but only PARTITION the
data — selection is by exact rank within the exactly-counted cumulative
histogram, so the chosen order statistics are exact regardless of float
rounding at the edges. The interpolation ``v_lo + frac · (v_hi − v_lo)``
mirrors Spark's ``percentile()`` / DuckDB's ``quantile_cont`` (linear
method, rank = p·(n−1) zero-indexed); results are rounded on both sides
of the oracle comparison to absorb engine summation-order ulps.
NULL and NaN values are excluded (stated contract): percentile() ignores
NULLs, and a NaN would poison the group's max → NaN histogram width →
NULL bucket keys, silently dropping the whole group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percentiles_exact_scalable(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, list[float]]],
    n_buckets: int = 256,
) -> DataFrame:
    """Exact interpolated percentiles for SEVERAL value columns per
    ``group_col`` in one shared three-pass plan. ``specs`` is
    ``[(value_col, [probs…]), …]``; the result has one row per group and
    a ``<value_col>_p<nn>`` column per requested probability (unrounded
    doubles — callers round for display/oracle comparison)."""
    from pyspark import StorageLevel

    # long format: ONE scan yields (g, c, v) for every requested column
    structs = [
        F.struct(F.lit(ci).alias("c"), F.col(col).cast("double").alias("v"))
        for ci, (col, _probs) in enumerate(specs)
    ]
    rows = (
        df.select(F.col(group_col).alias("g"), F.explode(F.array(*structs)).alias("e"))
        .select("g", F.col("e.c").alias("c"), F.col("e.v").alias("v"))
        .filter(F.col("v").isNotNull() & ~F.isnan(F.col("v")))
    )
    # stats and need are |groups|·|columns|-sized and referenced by
    # several branches below; without persistence every branch re-derives
    # them from the base table and the physical plan re-scans the fact
    # table ~40× (measured: 84 parquet scans before this was bounded).
    # Persisted and materialized in dependency order, the runtime is the
    # designed three data passes: stats, histogram, selection.
    stats = rows.groupBy("g", "c").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # ranks needed per (group, column): for each p, the 1-indexed
    # floor/ceil order statistics around r = p·(n−1), plus the
    # interpolation fraction
    per_c = []
    for ci, (_col, probs) in enumerate(specs):
        for p in probs:
            r = F.lit(p) * (F.col("n") - 1).cast("double")
            lo = (F.floor(r) + 1).cast("long")
            per_c.append(
                F.when(
                    F.col("c") == ci,
                    F.array(
                        F.struct(
                            F.lit(float(p)).alias("p"),
                            lo.alias("lo_rank"),
                            F.least(lo + 1, F.col("n")).alias("hi_rank"),
                            (r - F.floor(r)).alias("frac"),
                        )
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<p:double,lo_rank:bigint,"
                    "hi_rank:bigint,frac:double>>"
                ))
            )
    wanted = (
        stats.select(
            "g", "c", F.explode(F.flatten(F.array(*per_c))).alias("w")
        )
        .select(
            "g",
            "c",
            F.col("w.p").alias("p"),
            F.col("w.lo_rank").alias("lo_rank"),
            F.col("w.hi_rank").alias("hi_rank"),
            F.col("w.frac").alias("frac"),
        )
    )
    ranks = (
        wanted.select("g", "c", F.col("lo_rank").alias("rank"))
        .unionByName(wanted.select("g", "c", F.col("hi_rank").alias("rank")))
        .distinct()
    )

    # histogram: bucket index by value range; max maps to the last bucket
    b = rows.join(stats.select("g", "c", "mn", "mx"), ["g", "c"])
    width = F.col("mx") - F.col("mn")
    bucket = F.when(width == 0, F.lit(0)).otherwise(
        F.least(
            F.floor((F.col("v") - F.col("mn")) / width * n_buckets).cast("int"),
            F.lit(n_buckets - 1),
        )
    )
    bucketed = b.select("g", "c", "v", bucket.alias("bk"))
    counts = bucketed.groupBy("g", "c", "bk").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy("g", "c")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.withColumn(
        "cum_before", F.coalesce(F.sum("cnt").over(wcum), F.lit(0))
    )

    # rank → (bucket, offset): metadata-sized range join
    need = (
        ranks.alias("r")
        .join(
            cum.alias("h"),
            (F.col("r.g") == F.col("h.g"))
            & (F.col("r.c") == F.col("h.c"))
            & (F.col("r.rank") > F.col("h.cum_before"))
            & (F.col("r.rank") <= F.col("h.cum_before") + F.col("h.cnt")),
        )
        .select(
            F.col("r.g").alias("g"),
            F.col("r.c").alias("c"),
            F.col("r.rank").alias("rank"),
            F.col("h.bk").alias("bk"),
            (F.col("r.rank") - F.col("h.cum_before")).alias("off"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # selection: sort ONLY the needed buckets; the window partition is a
    # (group, column, bucket) slice ≈ n_g/B rows, never the whole group
    sel = bucketed.join(
        F.broadcast(need.select("g", "c", "bk").distinct()),
        ["g", "c", "bk"],
        "left_semi",
    )
    wv = Window.partitionBy("g", "c", "bk").orderBy("v")
    ordered = sel.withColumn("rn", F.row_number().over(wv))
    order_stats = ordered.alias("o").join(
        F.broadcast(need).alias("nd"),
        (F.col("o.g") == F.col("nd.g"))
        & (F.col("o.c") == F.col("nd.c"))
        & (F.col("o.bk") == F.col("nd.bk"))
        & (F.col("o.rn") == F.col("nd.off")),
    ).select(
        F.col("o.g").alias("g"),
        F.col("o.c").alias("c"),
        F.col("nd.rank").alias("rank"),
        F.col("o.v").alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # order_stats is read twice below (lo and hi sides) — unpersisted,
    # each side re-runs the whole selection chain including the scan

    # Materialize the three metadata caches in dependency order NOW:
    # lazy persists would let the final plan's parallel branches race to
    # compute (and duplicate) the shared subtrees before any cache is
    # populated. Three small actions; the data passes run exactly once.
    stats.count()
    need.count()
    order_stats.count()
    # the returned plan reads only `wanted` (from cached stats) and
    # order_stats; need's cache has served its purpose
    need.unpersist()

    lo_v = order_stats.select(
        "g", "c", F.col("rank").alias("lo_rank"), F.col("v").alias("v_lo")
    )
    hi_v = order_stats.select(
        "g", "c", F.col("rank").alias("hi_rank"), F.col("v").alias("v_hi")
    )
    interp = (
        wanted.join(lo_v, ["g", "c", "lo_rank"])
        .join(hi_v, ["g", "c", "hi_rank"])
        .select(
            "g",
            "c",
            "p",
            (
                F.col("v_lo")
                + F.col("frac") * (F.col("v_hi") - F.col("v_lo"))
            ).alias("val"),
        )
    )
    agg_cols = [
        F.max(
            F.when(
                (F.col("c") == ci) & (F.col("p") == p), F.col("val")
            )
        ).alias(f"{col}_p{int(round(p * 100))}")
        for ci, (col, probs) in enumerate(specs)
        for p in probs
    ]
    return interp.groupBy("g").agg(*agg_cols).withColumnRenamed("g", group_col)


def budget_prefix_by_score(
    df: DataFrame,
    group_col: str,
    score_col: str,
    weight_col: str,
    id_col: str,
    budget: int,
    cache_key: tuple,
    n_buckets: int = 256,
) -> DataFrame:
    """Greedy budget-prefix selection WITHOUT a per-group full sort: keep,
    per group, the prefix of rows (ordered ``score`` desc, ``id`` asc)
    whose running ``weight`` cumsum stays ≤ ``budget``; return the
    surviving rows.

    The naive form (``pipeline_token_budget``'s window) sorts an ENTIRE
    group in one task — at 100 TB a CommonCrawl-sized source is a
    single-task multi-TB sort. This is the histogram-prefix variant (the
    ``percentiles_exact_scalable`` pattern applied to a budgeted prefix):

    1. per-group (min, max) of the score — one metadata aggregate;
    2. each row maps to one of B descending score buckets; a
       (group, bucket) aggregate counts rows and sums weights;
    3. the cumulative bucket histogram (|groups|·B METADATA rows) walks
       down from the best bucket: buckets whose running total fits the
       budget are kept WHOLESALE (no row ever sorted), and exactly ONE
       "crossing" bucket per group straddles the budget line;
    4. only crossing-bucket rows (≈ n_g/B) are sorted — the window
       partition is one bucket, never the group — with the cumsum seeded
       by the kept-bucket prefix total.

    Correctness relies on bucket ranges partitioning the score axis:
    equal scores share a bucket, so (bucket ASC, score desc, id) is the
    global greedy order, and because weights are positive the kept set
    is a contiguous prefix — rows below the crossing bucket can never
    re-enter. NULL scores sort LAST in the greedy order (both Spark's
    ``desc`` and DuckDB's default are NULLS LAST on DESC), so the bucket
    expression routes them EXPLICITLY to the worst bucket in every
    branch and the desc-nulls-last within-bucket sort keeps them behind
    every real score. Exactness: bucket boundaries are float arithmetic
    but only PARTITION the data; all running totals are exact integer
    sums.

    ``bucketed`` feeds THREE consumers (the bucket histogram + both kept
    joins); it is persisted and eagerly materialized so the input
    lineage (scan + scoring projections) runs in exactly TWO corpus
    passes — the stats aggregate and the bucketing build — instead of
    once per consumer. ``cache_key`` is REQUIRED: retention is bounded
    via plans/cache.session_cached (reused on repeat calls, evicted on
    session turnover) — a keyless plain persist would stack one cached
    relation per call, the exact leak the cache module exists to bound.

    Caveat (shared with the percentile machinery): a group whose scores
    are all equal collapses to one bucket and that bucket's sort is the
    whole group — the tie-class ceiling, cheap to sort (all keys equal
    up to the id tiebreak) but not row-reduced.

    PRECONDITION — ``weight_col`` must be non-negative: the whole-bucket
    admission step is only equivalent to the greedy window when the
    running cumsum is monotone. A negative weight would let a later row
    re-open the budget and the result would silently stop being a
    prefix, so the projection raises on the first negative weight it
    scans (a codegen'd CASE, no extra pass — ADVICE r8). Engine callers
    satisfy it structurally (token counts are counts)."""
    neg_msg = (
        f"budget_prefix_by_score: negative value in weight column "
        f"{weight_col} — the histogram-prefix selection requires "
        f"non-negative weights (cumsum monotonicity)"
    )
    wt_guarded = F.when(
        F.col(weight_col) < 0,
        F.raise_error(F.lit(neg_msg)).cast("bigint"),
    ).otherwise(F.col(weight_col).cast("bigint"))
    base = df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("i"),
        F.col(score_col).cast("double").alias("s"),
        wt_guarded.alias("wt"),
    )
    stats = base.groupBy("g").agg(F.min("s").alias("mn"), F.max("s").alias("mx"))
    width = F.col("mx") - F.col("mn")
    # bucket 0 = BEST scores (descending layout so cum walks bucket ASC);
    # NULL scores route EXPLICITLY to the worst bucket in every branch —
    # F.least skips nulls (it returns the smallest NON-null argument), so
    # an implicit fall-through would misplace them, and the width==0
    # branch doesn't inspect s at all. Within the worst bucket the
    # desc-nulls-last sort keeps NULLs behind every real score, matching
    # the greedy window's global NULLS-LAST order.
    bk = (
        F.when(F.col("s").isNull(), F.lit(n_buckets - 1))
        .when(width == 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("mx") - F.col("s")) / width * n_buckets
                ).cast("int"),
                F.lit(n_buckets - 1),
            )
        )
    )

    def _build() -> DataFrame:
        return base.join(F.broadcast(stats), "g").select(
            "g", "i", "s", "wt", bk.alias("bk")
        )

    from component_iceberg_spark.plans.cache import session_cached

    bucketed = session_cached(base.sparkSession, cache_key, _build)
    # materialize NOW: lazy persists would let the three consumer
    # branches race to compute (and duplicate) the lineage before any
    # cache is populated — same lesson as percentiles_exact_scalable
    bucketed.count()
    counts = bucketed.groupBy("g", "bk").agg(
        F.sum("wt").alias("tok"), F.count(F.lit(1)).alias("n")
    )
    wcum = (
        Window.partitionBy("g")
        .orderBy("bk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = counts.select(
        "g",
        "bk",
        "tok",
        "n",
        F.coalesce(F.sum("tok").over(wcum), F.lit(0)).alias("cum_before"),
    )
    whole = cum.filter(F.col("cum_before") + F.col("tok") <= budget)
    crossing = cum.filter(
        (F.col("cum_before") <= budget)
        & (F.col("cum_before") + F.col("tok") > budget)
    )
    kept_whole = bucketed.join(
        F.broadcast(whole.select("g", "bk")), ["g", "bk"], "left_semi"
    )
    # crossing-bucket rows only: the sort partition is ONE bucket
    wc = (
        Window.partitionBy("g")
        .orderBy(F.col("s").desc(), "i")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_cross = (
        bucketed.join(
            F.broadcast(crossing.select("g", "bk", "cum_before")), ["g", "bk"]
        )
        .withColumn("cum", F.col("cum_before") + F.sum("wt").over(wc))
        .filter(F.col("cum") <= budget)
        .select("g", "bk", "i", "s", "wt")
    )
    return (
        kept_whole.unionByName(kept_cross)
        .select(
            F.col("g").alias(group_col),
            F.col("i").alias(id_col),
            F.col("s").alias(score_col),
            F.col("wt").alias(weight_col),
        )
    )


def percentile_exact_scalable(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: list[float],
    n_buckets: int = 256,
) -> DataFrame:
    """Single-column convenience wrapper over
    :func:`percentiles_exact_scalable`: columns come back as ``p<nn>``."""
    out = percentiles_exact_scalable(df, group_col, [(value_col, probs)], n_buckets)
    for p in probs:
        pp = int(round(p * 100))
        out = out.withColumnRenamed(f"{value_col}_p{pp}", f"p{pp}")
    return out
