"""Scalar-function library coverage (SURVEY §2.5 gap 'scalar function
libraries') + JSON extraction + scalable global ranking.

Each query exercises a function family end-to-end with an exact oracle;
conventions that differ between engines (day-of-week numbering, int/int
division) are pinned explicitly in both expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import relational
from component_iceberg_spark.plans.registry import register


@register(
    "func_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substr(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 6, '0') AS key_padded,
           regexp_extract(c_name, '([0-9]+)', 1) AS name_digits,
           reverse(c_mktsegment) AS seg_rev,
           concat(c_mktsegment, ':', c_name) AS tagged,
           replace(c_name, '#', '-') AS name_dashed,
           CAST(contains(c_name, '1') AS BOOLEAN) AS has_one
    FROM customer
    """,
    tags=("ext", "functions"),
)
def func_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family — all whole-stage-codegen'd projections."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.lpad(F.col("c_custkey").cast("string"), 6, "0").alias("key_padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("name_digits"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.concat_ws("", F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias(
            "tagged"
        ),
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        F.col("c_name").contains("1").alias("has_one"),
    )


@register(
    "func_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS order_year,
           month(o_orderdate) AS order_month,
           day(o_orderdate) AS order_day,
           isodow(o_orderdate) AS order_isodow,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL '30 days' AS DATE) AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
               AS days_since_epoch_start
    FROM orders
    """,
    tags=("ext", "functions"),
)
def func_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Day-of-week pinned to ISO numbering (Mon=1…Sun=7):
    Spark ``weekday``+1 ≡ DuckDB ``isodow`` (their native ``dayofweek``
    disagree by engine)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("order_isodow"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).cast("date").alias(
            "due_date"
        ),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).cast("long").alias("days_since_epoch_start"),
    )


@register(
    "func_conditional",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END AS size_class,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS return_or_none,
           greatest(l_discount, l_tax) AS max_rate,
           least(l_discount, l_tax) AS min_rate,
           CAST(l_quantity >= 25 AND l_discount > 0.05 AS BOOLEAN) AS bulk_deal
    FROM lineitem
    """,
    tags=("ext", "functions"),
)
def func_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: CASE, nullif/coalesce, greatest/least."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(F.nullif("l_returnflag", F.lit("N")), F.lit("none")).alias(
            "return_or_none"
        ),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        ((F.col("l_quantity") >= 25) & (F.col("l_discount") > 0.05)).alias(
            "bulk_deal"
        ),
    )


@register(
    "func_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k,
           CAST(CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS BIGINT)
               AS k_bucket
    FROM events
    """,
    tags=("ext", "functions"),
)
def func_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the semi-structured props column — the typed
    path (``from_json`` with an explicit schema) rather than per-row string
    getters, so the parse happens once per row in the JVM."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "_p", F.from_json("props", "struct<k:bigint>")
    )
    return parsed.select(
        "event_id",
        F.col("_p.k").alias("prop_k"),
        (F.col("_p.k") % 10).alias("k_bucket"),
    )


@register(
    "ext_global_rank",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS rank
    FROM orders
    """,
    tags=("ext", "relational"),
)
def ext_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-order ranking at scale: range-partition + local rank +
    partition offsets (operators/relational.global_rank) instead of the
    single-partition window a naive global row_number needs. The order
    includes the unique key, so ranks are boundary-independent."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return relational.global_rank(
        o, [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    )


@register(
    "ext_percentile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.5) AS p50_price,
           quantile_cont(l_extendedprice, 0.9) AS p90_price,
           quantile_cont(l_quantity, 0.25) AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ext", "agg"),
)
def ext_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles — Spark's percentile() and DuckDB's
    quantile_cont use the same linear interpolation, verified bit-exact.
    This is the built-in small-group / final-report path (a sort per
    group); at scale use ext_percentile_scalable — the SAME exact values
    via histogram rank selection in bounded passes — or the
    ext_quantile_kll sketch when a few-percent error is acceptable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile("l_extendedprice", 0.9).alias("p90_price"),
        F.percentile("l_quantity", 0.25).alias("p25_qty"),
    )


@register(
    "ext_percentile_scalable",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
           round(quantile_cont(l_quantity, 0.25), 6) AS p25_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ext", "agg"),
)
def ext_percentile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME exact interpolated percentiles as ext_percentile_exact,
    computed by histogram rank selection
    (operators/rank_select.percentile_exact_scalable) instead of a
    per-group sort: per-task state drops from O(group) to O(group/256),
    so the one query VERDICT r4 kept on the weak-for-scale list — a
    100 TB group concentrating on one reducer — now has an exact
    scalable form, not just the KLL approximation. The oracle is the
    identical quantile_cont, rounded on both sides to absorb
    interpolation-arithmetic ulps."""
    from component_iceberg_spark.operators import rank_select as RS

    li = load_table(spark, sf_dir, "lineitem")
    out = RS.percentiles_exact_scalable(
        li,
        "l_returnflag",
        [("l_extendedprice", [0.5, 0.9]), ("l_quantity", [0.25])],
    )
    return out.select(
        "l_returnflag",
        F.round("l_extendedprice_p50", 6).alias("p50_price"),
        F.round("l_extendedprice_p90", 6).alias("p90_price"),
        F.round("l_quantity_p25", 6).alias("p25_qty"),
    )


@register(
    "ext_window_distribution",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("ext", "window"),
)
def ext_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window family: ntile / percent_rank / cume_dist over a
    shared window spec (one Exchange + Sort)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@register(
    "ext_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("ext", "agg"),
)
def ext_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: collect_list is order-nondeterministic
    in a distributed engine, so the deterministic form is
    sort_array(collect_list(...)) — pinned ordering survives any partition
    layout."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "ext_nested_ops",
    oracle="""
    SELECT vec_id,
           CAST(embedding[1] AS DOUBLE) AS h0,
           CAST(embedding[2] AS DOUBLE) AS h1,
           CAST(embedding[3] AS DOUBLE) AS h2,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_sum(list_transform(embedding,
                 x -> abs(CAST(x AS DOUBLE)))), 4) AS l1_norm,
           CAST(list_max(embedding) AS DOUBLE) AS max_dim
    FROM embeddings
    """,
    tags=("ext", "functions", "nested"),
)
def ext_nested_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type (array) function family over the embedding column:
    slice / filter / fold / max — all codegen'd array expressions, the
    complex-type pass-through surface of §1.2 exercised end-to-end.

    The head-of-vector slice (slice + transform) is still computed as an
    array, then projected element-wise: the gate's canonicalizer hashes
    scalar cells, and engine-specific float-to-string rendering makes a
    JSON projection unstable — per-element doubles compare exactly."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    head3 = F.transform(F.slice(vec, 1, 3), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        head3[0].alias("h0"),
        head3[1].alias("h1"),
        head3[2].alias("h2"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform(vec, lambda x: F.abs(x.cast("double"))),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
            4,
        ).alias("l1_norm"),
        F.array_max(vec).cast("double").alias("max_dim"),
    )


@register(
    "ext_grouped_pandas",
    oracle="""
    SELECT event_id, event_type,
           round((value - avg(value) OVER w) / stddev_samp(value) OVER w, 4)
               AS z_score
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
    tags=("ext", "udf"),
)
def ext_grouped_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow grouped-map (applyInPandas): per-group z-score normalization
    in pandas — the custom-UDAF escape hatch when built-ins can't express
    the per-group logic. Rows are sorted by key inside the UDF so the
    float reduction order is deterministic; rounding absorbs the remaining
    ulp difference vs the oracle's window formulation. One shuffle on the
    group key, Arrow-batched both ways."""
    import pandas as pd

    from component_iceberg_spark.io.tables import load_table as _lt

    ev = _lt(spark, sf_dir, "events").select("event_id", "event_type", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")  # deterministic reduction order
        mean = pdf["value"].mean()
        std = pdf["value"].std(ddof=1)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "z_score": ((pdf["value"] - mean) / std).round(4),
            }
        )

    return ev.groupBy("event_type").applyInPandas(
        zscore, schema="event_id long, event_type string, z_score double"
    )


@register(
    "func_array",
    oracle="""
    WITH d AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    )
    SELECT vec_id,
           CAST(len(v) AS INTEGER) AS n_dims,
           round(list_sum(list_transform(v, x -> abs(x))), 6) AS l1_norm,
           round(list_max(list_transform(v, x -> abs(x))), 6) AS max_abs,
           CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_reverse_sort(v)[3], 6) AS third_largest
    FROM d
    """,
    tags=("ext", "functions"),
)
def func_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function family over the embedding column:
    transform / filter / aggregate (left fold) / array_sort /
    element_at — all JVM-side expressions inside the scan stage, the
    codegen'd path for array-typed columns (no UDF, no explode). The l1
    fold is order-pinned, matching DuckDB's list_sum exactly."""
    from component_iceberg_spark.operators.similarity import as_double

    e = load_table(spark, sf_dir, "embeddings")
    v = as_double(F.col("embedding"))
    absv = F.transform(v, lambda x: F.abs(x))
    l1 = F.aggregate(absv, F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.size(v).alias("n_dims"),
        F.round(l1, 6).alias("l1_norm"),
        F.round(F.array_max(absv), 6).alias("max_abs"),
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.round(
            F.element_at(F.reverse(F.array_sort(v)), 3), 6
        ).alias("third_largest"),
    )


@register(
    "func_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
           round(stddev_samp(l_extendedprice), 4) AS stddev_price,
           round(var_pop(l_extendedprice), 2) AS var_price,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
           round(skewness(l_extendedprice)
                 * (count(l_extendedprice) - 2)
                 / sqrt(count(l_extendedprice)
                        * (count(l_extendedprice) - 1.0)), 4) AS skew_price,
           round(kurtosis_pop(l_extendedprice), 4) AS kurt_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("ext", "functions", "stats"),
)
def func_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family per group: correlation, sample and
    population covariance, stddev/variance, OLS regression (slope /
    intercept / R²), skewness and kurtosis — the feature-engineering /
    drift-monitoring aggregates a training-data pipeline reports per
    shard. All are single-pass mergeable moment aggregates (JVM-side,
    map-side partials — one hash-agg Exchange regardless of corpus
    size). Spark and DuckDB share the textbook definitions; results are
    rounded (4-6 dp, moments of large values coarser) to absorb
    summation-order ulps, the same doctrine as every float oracle here.
    Two definition pins (verified empirically): Spark ``kurtosis`` is the
    POPULATION excess kurtosis = DuckDB ``kurtosis_pop`` (equal to
    1e-11), and Spark ``skewness`` is population g1 while DuckDB's is the
    bias-corrected sample G1 — the oracle converts via
    g1 = G1·(n-2)/√(n(n-1))."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_s"
        ),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "covar_p"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("stddev_price"),
        F.round(F.var_pop("l_extendedprice"), 2).alias("var_price"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias(
            "slope"
        ),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias(
            "intercept"
        ),
        F.round(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.round(F.skewness("l_extendedprice"), 4).alias("skew_price"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt_price"),
    )


@register(
    "func_bitwise",
    oracle="""
    SELECT o_orderstatus,
           CAST(bit_and(o_orderkey) AS BIGINT) AS key_and,
           CAST(bit_or(o_orderkey) AS BIGINT) AS key_or,
           CAST(bit_xor(o_orderkey) AS BIGINT) AS key_xor,
           CAST(count(*) FILTER (WHERE (o_orderkey & 7) = 0)
                AS BIGINT) AS n_mod8,
           CAST(max(o_orderkey << 1) AS BIGINT) AS max_shl,
           CAST(min(o_orderkey >> 2) AS BIGINT) AS min_shr,
           CAST(sum(xor(o_orderkey, o_custkey) & 255)
                AS BIGINT) AS xor_lowbyte_sum
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("ext", "functions"),
)
def func_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise function family: the bit_and/bit_or/bit_xor aggregates
    plus shift/mask/xor scalars — the bucket-assignment and flag-field
    arithmetic (hash partitioners, bitmap flags, low-byte sampling)
    pipelines lean on. All integer-exact, all codegen'd expressions
    inside one hash aggregate."""
    o = load_table(spark, sf_dir, "orders")
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and(k).alias("key_and"),
        F.bit_or(k).alias("key_or"),
        F.bit_xor(k).alias("key_xor"),
        F.count(F.when(k.bitwiseAND(F.lit(7)) == 0, 1)).alias("n_mod8"),
        F.max(F.shiftleft(k, 1)).alias("max_shl"),
        F.min(F.shiftright(k, 2)).alias("min_shr"),
        F.sum(k.bitwiseXOR(c).bitwiseAND(F.lit(255))).alias(
            "xor_lowbyte_sum"
        ),
    )


_HIST_BINS = 20

_HIST_ORACLE = f"""
WITH b AS (
    SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
           max(CAST(l_extendedprice AS DOUBLE)) AS mx
    FROM lineitem
)
SELECT CAST(CASE WHEN l_extendedprice IS NULL THEN NULL
            WHEN mx = mn THEN 0
            ELSE least(floor((CAST(l_extendedprice AS DOUBLE) - mn)
                             / ((mx - mn) / {_HIST_BINS})),
                       {_HIST_BINS - 1})
            END AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(l_extendedprice AS DOUBLE)), 2) AS total
FROM lineitem, b
GROUP BY 1
"""


@register("ext_histogram", oracle=_HIST_ORACLE, tags=("ext", "functions", "stats"))
def ext_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (20 bins over the price range): the standard
    distribution-profiling pass. Two metadata-sized jobs: a 1-row
    min/max bounds aggregate, then ONE hash aggregate keyed on the bin
    expression — bin arithmetic is pure IEEE double ops ((x−mn)/w with
    w=(mx−mn)/20), computed identically in both engines so even the
    edge-of-bin rows land identically (no rounding needed on the bin
    itself). The top bin is closed (least(…, 19)) so the maximum lands
    in-range. Both twins cast the measure to double FIRST (a decimal
    fixture would otherwise bin under decimal arithmetic in one engine
    and IEEE in the other) and short-circuit a degenerate mx == mn
    range to a single bin 0 (bin width 0 would put every row at NaN);
    NULL measures keep a NULL bin in both engines, in both branches."""
    li = load_table(spark, sf_dir, "lineitem")
    return equi_width_histogram(li, "l_extendedprice", _HIST_BINS)


_EQUIDEPTH_ORACLE = """
WITH r AS (
    SELECT CAST(l_extendedprice AS DOUBLE) AS x,
           row_number() OVER (
               ORDER BY CAST(l_extendedprice AS DOUBLE),
                        l_orderkey, l_linenumber
           ) - 1 AS rnk0,
           count(*) OVER () AS n
    FROM lineitem
)
SELECT CAST(floor(rnk0 * 10 / n) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(min(x), 2) AS lo,
       round(max(x), 2) AS hi,
       round(sum(x), 2) AS total
FROM r
GROUP BY 1
"""


@register(
    "ext_histogram_equidepth",
    oracle=_EQUIDEPTH_ORACLE,
    tags=("ext", "functions", "stats"),
)
def ext_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (10 equal-population bins over price) — the
    profiling twin of ext_histogram's equi-width bins, and the exact
    form of what ntile(10) computes. Bin assignment is pure rank
    arithmetic, bin = floor((rank-1)·k/n): integer operands are
    identical in both engines and the one double division is correctly
    rounded from identical inputs, so bins match EXACTLY — deliberately
    NOT quantile-boundary comparison, where a data value sitting on an
    interpolated boundary could flip bins on a final-ulp difference.

    Scale shape: the ranking is operators/relational.global_rank (range
    partition + per-partition offsets — no single-task sort, unlike a
    bare ntile window), the total count rides along as a literal from
    the offset pass (no second scan, no 1-row join), and the bin
    aggregate is one hash Exchange on 10 keys."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_extendedprice").cast("double").alias("x"),
    )
    ranked = relational.global_rank(
        li,
        [F.col("x"), F.col("l_orderkey"), F.col("l_linenumber")],
        rank_col="_rnk",
        total_col="_n",
    )
    binned = ranked.select(
        F.floor(
            (F.col("_rnk") - 1) * 10 / F.col("_n")
        ).cast("int").alias("bin"),
        "x",
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.min("x"), 2).alias("lo"),
        F.round(F.max("x"), 2).alias("hi"),
        F.round(F.sum("x"), 2).alias("total"),
    )


def equi_width_histogram(df: DataFrame, col: str, bins: int) -> DataFrame:
    """Shared histogram kernel (see ext_histogram for the plan shape and
    the degenerate-range / decimal-cast contract)."""
    vals = df.select(F.col(col).cast("double").alias(col))
    b = vals.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).collect()[0]
    if b["mn"] is None:
        # empty or all-NULL input: no crash — empty result for empty
        # input, a single NULL-bin row for all-NULL (what the SQL bin
        # expression yields: NULL arithmetic → NULL bin)
        bin_col = F.lit(None).cast("int")
    elif float(b["mx"]) == float(b["mn"]):
        # NULL rows keep a NULL bin here too — the oracle's CASE guards
        # NULL explicitly (WHEN x IS NULL THEN NULL) before the
        # degenerate-range constant, matching this isNotNull guard
        bin_col = F.when(F.col(col).isNotNull(), F.lit(0)).cast("int")
    else:
        mn, mx = float(b["mn"]), float(b["mx"])
        w = (mx - mn) / bins
        # the isNotNull guard matters: F.least SKIPS nulls, so without it
        # a NULL measure would fall through floor(NULL)=NULL into
        # least(NULL, bins-1) = bins-1 — the top bin — while the oracle's
        # CASE emits a NULL bin; NULL must stay NULL in this branch too
        bin_col = F.when(
            F.col(col).isNotNull(),
            F.least(F.floor((F.col(col) - mn) / w), F.lit(bins - 1)),
        ).cast("int")
    return vals.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(col), 2).alias("total"),
    )


@register(
    "func_map",
    oracle="""
    WITH g AS (
        SELECT o_custkey,
               CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
               CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
               CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
        FROM orders GROUP BY 1
    ), dom AS (
        SELECT o_custkey, status AS dominant_status FROM (
            SELECT o_custkey, status, cnt,
                   row_number() OVER (
                       PARTITION BY o_custkey ORDER BY cnt DESC, status DESC
                   ) AS rn
            FROM (
                SELECT o_custkey, 'F' AS status, f_cnt AS cnt FROM g
                UNION ALL SELECT o_custkey, 'O', o_cnt FROM g
                UNION ALL SELECT o_custkey, 'P', p_cnt FROM g
            )
        ) WHERE rn = 1
    )
    SELECT g.o_custkey, f_cnt, o_cnt, p_cnt,
           CAST((CASE WHEN f_cnt > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN o_cnt > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN p_cnt > 0 THEN 1 ELSE 0 END) AS INTEGER)
               AS n_nonzero,
           CAST(f_cnt + o_cnt + p_cnt AS BIGINT) AS total_orders,
           dominant_status
    FROM g JOIN dom ON dom.o_custkey = g.o_custkey
    """,
    tags=("ext", "functions"),
)
def func_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function family over a per-customer status map —
    map_from_arrays / map_filter / map_entries / map_values /
    element_at / size / aggregate-over-values, all codegen'd
    expressions inside one hash aggregate. The oracle replays the
    SEMANTICS relationally (conditional counts + a rank for the
    dominant key), so the check certifies the map API produces the
    right values, not merely that it runs. Dominant-status ties break
    to the lexicographically LARGEST key (array_max over (count, key)
    structs — struct comparison is lexicographic), mirrored by the
    oracle's ORDER BY cnt DESC, status DESC."""
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_custkey").agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("nf"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("no"),
        F.sum(F.when(F.col("o_orderstatus") == "P", 1).otherwise(0)).alias("np"),
    )
    m = F.map_from_arrays(
        F.array(F.lit("F"), F.lit("O"), F.lit("P")),
        F.array(F.col("nf"), F.col("no"), F.col("np")),
    )
    with_map = g.select("o_custkey", m.alias("m"))
    nonzero = F.map_filter("m", lambda k, v: v > 0)
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("bigint"), lambda acc, v: acc + v
    )
    dominant = F.array_max(
        F.transform(
            F.map_entries("m"),
            lambda e: F.struct(
                e["value"].alias("cnt"), e["key"].alias("status")
            ),
        )
    )["status"]
    return with_map.select(
        "o_custkey",
        F.element_at("m", "F").alias("f_cnt"),
        F.element_at("m", "O").alias("o_cnt"),
        F.element_at("m", "P").alias("p_cnt"),
        F.size(nonzero).alias("n_nonzero"),
        total.alias("total_orders"),
        dominant.alias("dominant_status"),
    )
