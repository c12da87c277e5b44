"""Relational queries (SURVEY §2.5): aggregation, joins, windows, top-k,
set ops, rollup, sessionization — TPC-H-shaped over the fixtures.

Float policy (see registry docstring): multi-row double sums/avgs are
rounded identically on both sides; comparisons/min/max/counts are exact.
Ranking always tiebreaks on a unique key and ranks on the *rounded*
measure so both engines pick the same top-k set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import relational
from component_iceberg_spark.plans.registry import register
from component_iceberg_spark.session import local_relation


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1 pricing summary (ext_agg_groupby over lineitem)
# ---------------------------------------------------------------------------

Q1_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 2) AS avg_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", oracle=Q1_ORACLE, tags=("relational", "flagship"))
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: filter → hash aggregate (8 measures). Map-side partial
    aggregation means the shuffle carries ≤ (partitions × 4 groups) rows
    regardless of input size — the canonical 100 TB-safe aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-shaped: join fact to dims, aggregate, top-k
# ---------------------------------------------------------------------------

Q3_ORACLE = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=Q3_ORACLE, tags=("relational",))
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: no broadcast hints — customer and orders both grow
    with the data, so a hard-coded broadcast is an executor-OOM at 100×.
    The plan is left declarative: Catalyst picks sort-merge for the
    fact⋈fact joins and AQE (enabled in session.py) converts a side to
    broadcast at runtime only when its *filtered* size is genuinely under
    the threshold. Aggregate, then TakeOrderedAndProject top-10 (bounded
    heap, no global sort)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp_ntz")
    )
    joined = li.join(
        o.join(c, o.o_custkey == c.c_custkey),
        li.l_orderkey == F.col("o_orderkey"),
    )
    agg = (
        joined.groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
    )
    return relational.topk(agg, [F.col("revenue").desc(), F.col("l_orderkey")], 10)


# ---------------------------------------------------------------------------
# Q5-shaped: snowflake join through region → nation → customer/supplier
# ---------------------------------------------------------------------------

Q5_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("q5_local_supplier_volume", oracle=Q5_ORACLE, tags=("relational",))
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: only the *bounded* dimensions carry broadcast hints
    (region: 5 rows, nation: 25 rows). Supplier, orders and customer all
    grow linearly with the data — supplier is ~1% of lineitem, a multi-GB
    broadcast at 100 TB — so those joins are left to Catalyst entirely:
    sort-merge at scale, with AQE demoting to broadcast at runtime only
    when the filtered side is actually small (which it is at bench SF, so
    nothing is lost locally). Catalyst folds the region filter through
    nation before the fact join, so the supplier side is pre-pruned to
    ASIA nations."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.groupBy("n_name").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        )
    )


# ---------------------------------------------------------------------------
# Join family: anti / semi (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
    tags=("relational", "join"),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left_anti join (broadcast when the probe side is
    small; sort-merge otherwise — Catalyst's call). Filtered to 'P' status
    so the result is non-degenerate at every fixture SF."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    """,
    tags=("relational", "join"),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left_semi join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Windows / top-k / set ops / rollup
# ---------------------------------------------------------------------------


@register(
    "ext_window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS INTEGER) AS rk
        FROM orders
    ) WHERE rk <= 3
    """,
    tags=("relational", "window"),
)
def ext_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price: ranking window, one shuffle on
    the group key; ties broken by the unique order key."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    return relational.topk_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], 3
    )


@register(
    "ext_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("relational", "window"),
)
def ext_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window family: lag/lead + running sum sharing one window
    spec → single Exchange + Sort in the physical plan."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
            2,
        ).alias("running_spend"),
    )


@register(
    "ext_window_yoy",
    oracle="""
    WITH m AS (
        SELECT o_orderpriority AS prio,
               CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY 1, 2
    ), c AS (
        SELECT *, CAST(round(revenue * 100) AS BIGINT) AS rev_c FROM m
    ), w AS (
        SELECT prio, month, revenue,
               CAST(floor(
                   CAST(sum(rev_c) OVER (
                       PARTITION BY prio ORDER BY month
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   ) AS DOUBLE)
                   / (count(*) OVER (
                       PARTITION BY prio ORDER BY month
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   )) + 0.5
               ) AS BIGINT) / 100.0 AS ma3,
               lag(revenue, 12) OVER (
                   PARTITION BY prio ORDER BY month
               ) AS prev12,
               CAST(rank() OVER (
                   PARTITION BY prio, year(month) ORDER BY revenue DESC
               ) AS INTEGER) AS yr_rank
        FROM c
    )
    SELECT prio, month, revenue, ma3,
           round(revenue - prev12, 2) AS yoy_delta,
           yr_rank
    FROM w
    WHERE prev12 IS NOT NULL
    """,
    tags=("relational", "window"),
)
def ext_window_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS-style deep window stack (q47 shape): monthly revenue per
    order priority, then three window families over ONE month-sorted
    layout — a centered 3-month moving average (frame semantics at the
    partition edges included), a 12-rows-back lag giving year-over-year
    delta, and an in-year revenue rank. Catalyst reuses a single
    Exchange on ``prio`` for the two month-ordered specs; the per-year
    rank re-sorts WITHIN the same partitions (no second shuffle — the
    year spec's partition keys are a superset of ``prio``). The input to
    every window is the already-rounded monthly aggregate, so floats are
    bit-identical cross-engine before any frame arithmetic — but the
    moving average itself cannot use engine ``round``: a 3-month mean
    can land on a TRUE decimal half-boundary (x.255), where Spark
    rounds the shortest decimal repr (HALF_UP → .26) and DuckDB rounds
    the binary double (just under half → .25). So ma3 is computed in
    integer-cent space and rounded via ``floor(sum_c/n + 0.5)/100`` —
    every step a single IEEE op with identical semantics in both
    engines, making the boundary case exact instead of tolerant (same
    lesson as the r7 BLAS-kernel rounding contract). TPC-H months are
    dense per priority, so lag(12) is the true same-month-last-year.
    At 100 TB the shape holds: the windowed relation is months ×
    priorities — metadata-sized relative to the fact scan feeding the
    monthly aggregate, which is the canonical map-side-combine groupBy."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            F.col("o_orderpriority").alias("prio"),
            F.date_trunc("month", F.col("o_orderdate"))
            .cast("date")
            .alias("month"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .withColumn("rev_c", F.round(F.col("revenue") * 100).cast("long"))
    )
    w_month = Window.partitionBy("prio").orderBy("month")
    w_year = Window.partitionBy("prio", F.year("month")).orderBy(
        F.col("revenue").desc()
    )
    return (
        m.select(
            "prio",
            "month",
            "revenue",
            (
                F.floor(
                    F.sum("rev_c").over(w_month.rowsBetween(-1, 1)).cast("double")
                    / F.count(F.lit(1)).over(w_month.rowsBetween(-1, 1))
                    + 0.5
                )
                / 100.0
            ).alias("ma3"),
            F.lag("revenue", 12).over(w_month).alias("prev12"),
            F.rank().over(w_year).alias("yr_rank"),
        )
        .filter(F.col("prev12").isNotNull())
        .select(
            "prio",
            "month",
            "revenue",
            "ma3",
            F.round(F.col("revenue") - F.col("prev12"), 2).alias("yoy_delta"),
            "yr_rank",
        )
    )


@register(
    "ext_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    tags=("relational",),
)
def ext_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price — TakeOrderedAndProject (no global sort)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return relational.topk(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 10)


@register(
    "ext_setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("relational", "setop"),
)
def ext_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (customers active in both halves of the date range)."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    early = o.filter(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.intersect(late)


@register(
    "ext_setop_except",
    oracle="""
    SELECT o_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
    tags=("relational", "setop"),
)
def ext_setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (customers who churned after the cutover). ``subtract`` is
    SQL EXCEPT's set semantics; ``exceptAll`` would be bag semantics."""
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp_ntz")
    early = o.filter(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.subtract(late)


@register(
    "ext_agg_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "agg"),
)
def ext_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — partial aggregation applies per grouping set,
    so the shuffle is still group-bounded."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )


@register(
    "ext_agg_groupby",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(value) AS min_value,
           max(value) AS max_value,
           round(sum(value), 3) AS sum_value,
           round(avg(value), 4) AS avg_value
    FROM events
    GROUP BY event_type
    """,
    tags=("relational", "agg"),
)
def ext_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregation with exact distinct — Catalyst plans count(distinct)
    as a two-phase expand+aggregate; min/max are exact doubles."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.round(F.sum("value"), 3).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
    )


@register(
    "ext_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
           CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS low
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("relational", "agg"),
)
def ext_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy + pivot with an explicit value list (no extra pass
    to discover values — required at scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", ["1-URGENT", "5-LOW"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderstatus",
            F.coalesce(F.col("1-URGENT"), F.lit(0)).cast("long").alias("urgent"),
            F.coalesce(F.col("5-LOW"), F.lit(0)).cast("long").alias("low"),
        )
    )


@register(
    "ext_sessionize",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM g
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end
    FROM s
    GROUP BY user_id, session_id
    """,
    tags=("relational", "window"),
)
def ext_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag + running-sum
    windows sharing one partitioning → a single shuffle on user_id. The
    streaming twin lives in streaming/ (session_window + state)."""
    ev = load_table(spark, sf_dir, "events")
    return relational.sessionize(ev, "user_id", "ts", "event_id")


@register(
    "ext_asof_join",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts, v.ts AS last_view_ts
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN
         (SELECT user_id, ts FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND v.ts <= p.ts
    """,
    tags=("relational", "join"),
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (attribution shape): each purchase matched to the user's
    latest view at-or-before it. Union + ordered-window implementation —
    one shuffle + one sort, no per-key pandas (operators/asof.py); the
    oracle uses DuckDB's native ASOF JOIN, so two independent as-of
    implementations must agree."""
    from component_iceberg_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("last_view_ts")
    )
    return asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="last_view_ts",
        value_col="last_view_ts",
    )


@register(
    "ext_agg_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    tags=("relational", "agg"),
)
def ext_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 4 combinations) — same partial-agg shuffle
    bound as rollup, one expand node."""
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )


@register(
    "ext_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    """,
    tags=("relational",),
)
def ext_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via stack — a single Generate node, no joins,
    no shuffle; the standard melt for metric tables."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        " AS (metric, val)",
    )


@register(
    "join_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
      ON c_custkey = o_custkey
    """,
    tags=("relational", "join"),
)
def join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (null-extending both sides). Outer joins can't
    broadcast the null-producing side, so Catalyst plans sort-merge — the
    correct choice at scale too."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "full_outer").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "ext_range_join",
    oracle="""
    SELECT b.bin_label,
           count(*) AS n_items,
           round(sum(l_extendedprice), 2) AS revenue
    FROM lineitem l
    JOIN (VALUES ('low', 0.0, 10.0), ('mid', 10.0, 30.0), ('high', 30.0, 60.0))
         AS b(bin_label, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.bin_label
    """,
    tags=("relational", "join"),
)
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join against interval bins. A naive theta-join is
    O(rows × bins) nested-loop; here each row computes its candidate
    bucket(s) and equi-joins on bucket id — shuffle-free with the bins
    broadcast, linear in rows. Bins that straddle bucket boundaries get
    one candidate row per overlapped bucket, then the exact range filter
    keeps the true matches (candidate/verify again)."""
    li = load_table(spark, sf_dir, "lineitem")
    bins = local_relation(
        spark,
        [("low", 0.0, 10.0), ("mid", 10.0, 30.0), ("high", 30.0, 60.0)],
        schema="bin_label string, lo double, hi double",
    )
    # bucket width = gcd-ish granularity of bin edges; each bin expands to
    # the bucket ids it overlaps
    width = 10.0
    bins_b = bins.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / width).cast("int"),
                F.ceil(F.col("hi") / width).cast("int") - 1,
            )
        ),
    )
    rows = li.select("l_quantity", "l_extendedprice").withColumn(
        "bucket", F.floor(F.col("l_quantity") / width).cast("int")
    )
    joined = rows.join(F.broadcast(bins_b), "bucket").filter(
        (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi"))
    )
    return joined.groupBy("bin_label").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )


@register("ext_agg_approx", oracle=None, tags=("relational", "agg"))
def ext_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates: HyperLogLog++ distinct + approximate quantiles.
    No oracle (sketch values are engine-specific by design); accuracy vs
    exact is asserted in tests/test_approx.py. At 100 TB these replace
    exact distinct/percentile wherever a few-percent error is acceptable:
    fixed-size state instead of expand/sort shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile_approx("l_extendedprice", 0.95).alias("p95_price"),
    )


@register(
    "ext_agg_salted",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           round(sum(value), 3) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    tags=("relational", "agg", "skew"),
)
def ext_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over a low-cardinality (therefore
    skew-prone) key: rows of each hot key spread across 16 salt buckets in
    phase 1, partials combine per key in phase 2. Result must equal the
    direct GROUP BY (sums/counts/min/max recombine exactly; the rounded
    double sum absorbs reassociation)."""
    from component_iceberg_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "sum_value": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 3).alias("sum_value"),
        "min_value",
        "max_value",
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l.l_partkey
      )
    """,
    tags=("relational",),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (correlated scalar subquery): Spark decorrelates it
    into a per-key aggregate joined back — written here explicitly as that
    join so the plan is one shuffle on l_partkey + a broadcast of the
    filtered part dim. The oracle keeps the correlated form; both must
    produce the same single-row answer."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    thresholds = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
    )
    return joined.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY c_custkey, o_orderkey, o_orderdate
    HAVING sum(l_quantity) > 250
    """,
    tags=("relational",),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (HAVING over a join-aggregate): filter on the
    aggregate happens post-agg, so the shuffle is still group-bounded; the
    HAVING predicate itself is a plain filter on the aggregated plan.
    Both joins are unfiltered fact⋈fact — no broadcast hints; sort-merge
    on the join keys is the correct 100 TB plan (lineitem⋈orders co-shuffle
    on orderkey, then the aggregate reuses that partitioning)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "o_orderkey", "o_orderdate")
        .agg(
            F.sum("l_quantity").alias("_qty"),
        )
        .filter(F.col("_qty") > 250)
        .select(
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("_qty", 2).alias("total_qty"),
        )
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
            AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    tags=("relational",),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (distribution of counts): left join preserving
    order-less customers (count=0 bucket), then a second aggregation over
    the counts — two group-bounded shuffles."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue_delta,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("relational",),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate — every predicate
    reaches PushedFilters, the aggregate is a single partial/final pair
    with a one-row shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue_delta"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q12_priority_shipmode",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_linestatus
    """,
    tags=("relational",),
)
def q12_priority_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counting (CASE-sums). The
    non-equi residual (shipdate > orderdate) rides the equi-join as a
    post-join filter; counts stay group-bounded. Orders is a fact table —
    no broadcast hint; sort-merge on orderkey scales."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "ext_agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                AS BIGINT) AS gid,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_spend
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
    tags=("relational", "agg"),
)
def ext_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube) with
    grouping_id disambiguation — one Expand + one hash aggregate, partial
    aggregation per set, shuffle still group-bounded. grouping_id lets
    consumers tell a real NULL group value from a superaggregate row."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders",
            "total_spend",
        )
    )


@register(
    "ext_join_salted",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_suppkey, s_name, s_nationkey
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    """,
    tags=("relational", "join", "skew"),
)
def ext_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof dimension join (operators/skew.salted_broadcast_join):
    the big side's key is salted into 16 buckets and the broadcast dim is
    exploded 16x, so one hot key spreads over 16 tasks instead of
    pinning a single reducer — the standard mitigation when a 100 TB
    fact table has power-law key frequencies. The salt is placement-only:
    the RESULT is byte-identical to the plain equi-join, which is exactly
    what the oracle asserts."""
    from component_iceberg_spark.operators.skew import salted_broadcast_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_suppkey").alias("s_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    return salted_broadcast_join(li, s, "s_suppkey", salt_buckets=16).select(
        "l_orderkey",
        "l_linenumber",
        F.col("s_suppkey").alias("l_suppkey"),
        "s_name",
        "s_nationkey",
    )


def _bucketed_table(
    spark: SparkSession, sf_dir: str, table: str, key: str, n_buckets: int = 8
) -> DataFrame:
    """Materialize a fixture table as a bucketed+sorted catalog table
    (once per fixture content — rewrites only when the source file
    changes). Bucketing is the ingest-time contract that buys
    shuffle-free joins forever after."""
    import hashlib as _hl
    import os as _os

    src = _os.path.join(sf_dir, f"{table}.parquet")
    st = _os.stat(src)
    tag = _hl.md5(f"{src}:{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:10]
    name = f"b_{table}_{tag}"
    if not spark.catalog.tableExists(name):
        # the catalog is session-scoped but the warehouse dir persists: a
        # previous session's table files would block this name — they are
        # a content-tagged cache this write recreates, so clear them
        import shutil as _sh

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        _sh.rmtree(_os.path.join(wh, name), ignore_errors=True)
        (
            load_table(spark, sf_dir, table)
            .write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    return spark.table(name)


@register(
    "ext_join_bucketed",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                AS BIGINT) / 10000.0 AS revenue,
           count(*) AS n_items
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_custkey
    """,
    tags=("relational", "join", "bucketed"),
)
def ext_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-to-fact join via storage bucketing: both sides are
    written ONCE as 8-bucket tables hashed and sorted on the join key, so
    the join (and the bucket-key-prefixed aggregation behind it) runs
    with ZERO Exchange — no shuffle at any data size. This is the
    ingest-time contract a 100 TB lakehouse buys for its hottest join
    key: the per-query cost of the orders⋈lineitem shuffle is paid once
    at write time instead of every query. tests/test_plans.py pins the
    exchange-free physical plan; the oracle pins result identity with
    the plain join."""
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey").select(
        "o_orderkey", "o_custkey"
    )
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            # exact integer-cents arithmetic: price and discount are
            # 2-dp values, so the per-group sum is an exact bigint —
            # order-independent, immune to the half-cent rounding flips
            # float summation order causes on many tiny groups
            # no final rounding: the cents sum is an exact bigint, so
            # the /10000.0 division is the same IEEE double in any
            # engine — rounding would REINTRODUCE the half-cent
            # boundary disagreement it was meant to prevent (Spark
            # rounds via decimal string, DuckDB in binary)
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100).cast("long")
                    * (100 - F.round(F.col("l_discount") * 100).cast("long"))
                )
                / 10000.0
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "ext_window_time_range",
    oracle="""
    SELECT event_id, user_id,
           count(*) OVER w AS n_1h,
           round(sum(value) OVER w, 4) AS sum_1h,
           round(avg(value) OVER w, 6) AS avg_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("relational", "window", "events"),
)
def ext_window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per event, the rolling count/sum/avg of
    the SAME user's events in the trailing hour — the sliding-window
    feature shape (rate limiting, burst detection, rolling engagement)
    that ROWS frames cannot express when event spacing is irregular.

    The frame orders by epoch MICROseconds (``unix_micros``), not
    seconds: the fixture's timestamps carry sub-second precision, and a
    seconds-truncated ordering would disagree with the oracle's
    ``RANGE INTERVAL`` arithmetic exactly at the frame boundary. One
    Exchange on user_id + one sort serves all three aggregates (shared
    window spec); RANGE frames evaluate incrementally per partition, so
    at 100 TB cost stays O(rows) after the keyed shuffle, same as any
    other window — no per-row rescans."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        F.round(F.avg("value").over(w), 6).alias("avg_1h"),
    )


_HIERARCHY_ORACLE = """
WITH RECURSIVE edges AS (
    SELECT c_custkey AS child, c_custkey // 10 AS parent
    FROM customer WHERE c_custkey >= 10
), up AS (
    SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth FROM customer
    UNION ALL
    SELECT u.node, e.parent, u.depth + 1
    FROM up u JOIN edges e ON e.child = u.cur
)
SELECT node, cur AS root, CAST(depth AS BIGINT) AS depth
FROM up
WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.child = up.cur)
"""


@register(
    "ext_hierarchy_flatten",
    oracle=_HIERARCHY_ORACLE,
    tags=("relational", "graph"),
)
def ext_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE equivalent: flatten a parent-pointer hierarchy to
    (node, root ancestor, depth). The tree is derived deterministically
    from the customer table (parent = c_custkey // 10, roots below 10 —
    a ~5-level tree at test SF), standing in for any org-chart /
    category-tree edge list; the DuckDB oracle walks the SAME edges with
    a real WITH RECURSIVE, so the comparison covers the full transitive
    closure. Spark-side this is pointer-doubling (operators/relational.
    flatten_hierarchy): O(log depth) self-joins instead of one join per
    level — the plan a 100 TB hierarchy needs."""
    c = load_table(spark, sf_dir, "customer")
    edges = c.filter(F.col("c_custkey") >= 10).select(
        F.col("c_custkey").alias("child"),
        (F.col("c_custkey") / 10).cast("long").alias("parent"),
    )
    return relational.flatten_hierarchy(
        edges, "child", "parent", nodes=c.select("c_custkey")
    )


def _pagerank_oracle(iters: int = 3) -> str:
    head = """
WITH e0 AS (
    SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), e AS (
    SELECT c AS src, s AS dst FROM e0
    UNION ALL
    SELECT s AS src, c AS dst FROM e0
), deg AS (
    SELECT src, count(*) AS d FROM e GROUP BY 1
), r0 AS (
    SELECT src AS node, 1.0 AS r FROM deg
)"""
    steps = []
    for i in range(1, iters + 1):
        steps.append(f""", r{i} AS (
    SELECT e.dst AS node, 0.15 + 0.85 * sum(p.r / deg.d) AS r
    FROM e
    JOIN r{i - 1} p ON p.node = e.src
    JOIN deg ON deg.src = e.src
    GROUP BY e.dst
)""")
    return head + "".join(steps) + f"""
SELECT node, round(r, 6) AS rank FROM r{iters}
"""


@register(
    "ext_pagerank",
    oracle=_pagerank_oracle(3),
    tags=("relational", "graph"),
)
def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over the undirected
    customer↔supplier trade graph derived from lineitem⋈orders — entity
    importance in a transaction network, the second iterative-graph
    shape beside connected components and hierarchy flattening. The
    iteration count is FIXED so the DuckDB oracle can replay the exact
    computation as unrolled CTE stages; each Spark iteration shuffles
    only the node-sized rank vector against the persisted
    (edge, degree) relation, with per-iteration localCheckpoint keeping
    the plan flat (operators/relational.pagerank_undirected)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c"),
            (F.col("l_suppkey") * 2 + 1).alias("s"),
        )
        .distinct()
    )
    return relational.pagerank_undirected(edges, "c", "s", iterations=3)


@register(
    "ext_window_crossover",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               CAST(sum(CASE WHEN event_type = 'view'
                             THEN CAST(round(round(value, 2) * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS view_c,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             THEN CAST(round(round(value, 2) * 100) AS BIGINT)
                             ELSE 0 END) AS BIGINT) AS buy_c
        FROM events
        GROUP BY 1
    ), cum AS (
        SELECT day,
               sum(view_c) OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS view_cum_c,
               sum(buy_c)  OVER (ORDER BY day
                                 ROWS UNBOUNDED PRECEDING) AS buy_cum_c
        FROM daily
    ), led AS (
        SELECT day, view_cum_c, buy_cum_c,
               CASE WHEN buy_cum_c > view_cum_c
                    THEN 'purchase' ELSE 'view' END AS leader,
               lag(CASE WHEN buy_cum_c > view_cum_c
                        THEN 'purchase' ELSE 'view' END)
                   OVER (ORDER BY day) AS prev_leader
        FROM cum
    )
    SELECT day,
           round(view_cum_c / 100.0, 2) AS view_cum,
           round(buy_cum_c / 100.0, 2) AS buy_cum,
           leader
    FROM led
    WHERE prev_leader IS NULL OR leader <> prev_leader
    """,
    tags=("relational", "window"),
)
def ext_window_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape — the cumulative-channel crossover report: which
    days did the running purchase value overtake the running view value
    (or fall back behind)? q51's reference formulation FULL OUTER JOINs
    two per-channel aggregates before windowing; the Spark-first form
    computes both channels as conditional-sum lanes in ONE hash
    aggregate (one scan, one Exchange), then one day-ordered window
    yields both running totals AND the lag that detects the leader flip
    — no join anywhere. Exactness: daily values round to cents per the
    integer-lane contract, the running sums are exact bigint cents, and
    the division back to currency happens once at the end. The windowed
    relation is |days| — metadata-sized next to the event scan — and a
    single-partition ordered window over it is deliberate: at 100 TB
    the day-grain relation is still tiny (the fact-scan aggregate is
    where the bytes die), exactly like ext_window_yoy's months × prios.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.round(F.col("value"), 2) * 100).cast("bigint")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(
            F.when(F.col("event_type") == "view", cents).otherwise(F.lit(0))
        ).cast("bigint").alias("view_c"),
        F.sum(
            F.when(F.col("event_type") == "purchase", cents).otherwise(
                F.lit(0)
            )
        ).cast("bigint").alias("buy_c"),
    )
    # asc_nulls_last: Spark's bare ASC is NULLS FIRST while DuckDB's is
    # NULLS LAST — a NULL day (NULL ts upstream) would otherwise count
    # into the running totals FIRST here and LAST in the oracle
    w = Window.orderBy(F.asc_nulls_last("day"))
    cum = daily.select(
        "day",
        F.sum("view_c").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("view_cum_c"),
        F.sum("buy_c").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("buy_cum_c"),
    )
    leader = F.when(
        F.col("buy_cum_c") > F.col("view_cum_c"), F.lit("purchase")
    ).otherwise(F.lit("view"))
    led = cum.select(
        "day",
        "view_cum_c",
        "buy_cum_c",
        leader.alias("leader"),
        F.lag(leader).over(w).alias("prev_leader"),
    )
    return (
        led.filter(
            F.col("prev_leader").isNull()
            | (F.col("leader") != F.col("prev_leader"))
        )
        .select(
            "day",
            F.round(F.col("view_cum_c") / 100.0, 2).alias("view_cum"),
            F.round(F.col("buy_cum_c") / 100.0, 2).alias("buy_cum"),
            "leader",
        )
    )


@register(
    "ext_rollup_rank",
    oracle="""
    WITH r AS (
        SELECT n_name, o_orderpriority,
               GROUPING(n_name) * 2 + GROUPING(o_orderpriority) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS total_spend
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY ROLLUP (n_name, o_orderpriority)
    )
    SELECT n_name, o_orderpriority,
           CAST(gid AS BIGINT) AS gid,
           n_orders, total_spend,
           CAST(rank() OVER (
               PARTITION BY gid, CASE WHEN gid = 0 THEN n_name END
               ORDER BY total_spend DESC, o_orderpriority, n_name
           ) AS INTEGER) AS spend_rank
    FROM r
    """,
    tags=("relational", "window", "agg"),
)
def ext_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36 shape — rank WITHIN each rollup level: spend by
    (nation, priority) with ROLLUP, then every row ranked against its
    hierarchy siblings (priorities within their nation, nations against
    nations, the grand total alone). The partition key is
    (grouping_id, parent-if-leaf) — q36's lochierarchy idiom — so the
    rank compares apples to apples at every level of the cube without a
    second aggregation pass. Plan: only the BOUNDED dim (nation, 25
    rows) carries a broadcast hint; orders⋈customer is left declarative
    — both sides grow with scale factor, so the plan is sort-merge at
    scale and AQE may demote to broadcast at runtime when a side is
    genuinely small (the same fact-join discipline as q3/q5, pinned by
    test_rollup_rank_no_fact_broadcast). ROLLUP expands grouping sets
    with partial aggregation BEFORE the shuffle, and the windowed
    relation is the grouping-set result — metadata-sized next to the
    scan. The rank ORDER BY carries the name columns as tiebreaks so
    equal-spend rows order deterministically on both engines (the
    rounded spend is bit-identical first)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = o.join(
        c.select("c_custkey", "c_nationkey"),
        o.o_custkey == c.c_custkey,
    ).join(
        F.broadcast(n.select("n_nationkey", "n_name")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    r = joined.rollup("n_name", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
    )
    # tiebreak columns pin NULLS LAST explicitly: Spark's bare ASC is
    # NULLS FIRST, DuckDB's is NULLS LAST (DESC agrees on NULLS LAST in
    # both engines already) — matters only if a dimension value is NULL
    # in the DATA (ROLLUP-generated NULLs never share a partition with
    # non-NULL rows)
    w = Window.partitionBy(
        "gid", F.when(F.col("gid") == 0, F.col("n_name"))
    ).orderBy(
        F.col("total_spend").desc(),
        F.asc_nulls_last("o_orderpriority"),
        F.asc_nulls_last("n_name"),
    )
    return r.select(
        "n_name",
        "o_orderpriority",
        "gid",
        "n_orders",
        "total_spend",
        F.rank().over(w).cast("int").alias("spend_rank"),
    )


@register(
    "ext_window_rolling_outlier",
    oracle="""
    WITH m AS (
        SELECT p_brand AS brand, l_returnflag AS ret_flag,
               CAST(date_trunc('month', l_shipdate) AS DATE) AS month,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS s
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2, 3
    ), w AS (
        SELECT brand, ret_flag, month, s,
               sum(s) OVER win AS w_sum,
               count(*) OVER win AS n_w
        FROM m
        WINDOW win AS (PARTITION BY brand, ret_flag ORDER BY month
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
    ), d AS (
        SELECT brand, ret_flag, month, s, w_sum, n_w,
               CAST(floor(CAST(abs(n_w * s - w_sum) AS DOUBLE)
                          / w_sum * 1000000 + 0.5) AS BIGINT) AS dev6
        FROM w
        WHERE 10 * abs(n_w * s - w_sum) > w_sum
    )
    SELECT brand, ret_flag, month,
           ((s + 50) // 100) / 100.0 AS revenue,
           floor(CAST(w_sum AS DOUBLE) / n_w / 100.0 + 0.5) / 100.0 AS avg3,
           dev6 / 1000000.0 AS dev_ratio,
           CAST(rank() OVER (PARTITION BY brand, ret_flag
                             ORDER BY dev6 DESC, month) AS INTEGER)
               AS dev_rank
    FROM d
    """,
    tags=("relational", "window"),
)
def ext_window_rolling_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47/q57 idiom — the rolling-deviation outlier report: monthly
    discounted revenue per (brand, return-flag channel), a CENTERED 3-month
    moving mean over each series, rows whose deviation from that mean
    exceeds 10% flagged, and the flagged months ranked per series by
    relative deviation (q47's rank-on-|sum_sales − avg|/avg, with the
    moving mean standing in for the year mean).

    Exactness is all-integer until display: per-row revenue is
    round(price·100)·round((1−disc)·100) — an exact bigint in 10⁻⁴-dollar
    units, so the monthly sums, the windowed frame sum, and the outlier
    predicate 10·|n·s − w| > w (the cross-multiplied form of
    |s − w/n| > 0.1·(w/n)) never touch a float. The deviation ratio used
    for ranking is fixed at 6dp via floor(x·10⁶ + 0.5) — single IEEE ops
    with identical semantics in both engines (the yoy/crossover lesson:
    engine round() diverges on true decimal half-boundaries) — and the
    rank carries month as a unique tiebreak.

    Plan at scale: lineitem⋈part both grow with SF, so the join is left
    declarative (SMJ under no-auto-broadcast; AQE may demote — pinned by
    test_rolling_outlier_no_fact_broadcast); the monthly aggregate is the
    canonical map-side-combine groupBy; both windows partition by
    (brand, ret_flag) so the windowed relation — brands × flags × months,
    metadata-sized — shuffles ONCE, and the rank's re-sort happens within
    the same partitions."""
    li = load_table(spark, sf_dir, "lineitem")
    pt = load_table(spark, sf_dir, "part")
    rev_m4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
    )
    m = (
        li.join(pt.select("p_partkey", "p_brand"), li.l_partkey == pt.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("l_returnflag").alias("ret_flag"),
            F.date_trunc("month", F.col("l_shipdate")).cast("date").alias("month"),
        )
        .agg(F.sum(rev_m4).alias("s"))
    )
    win = (
        Window.partitionBy("brand", "ret_flag")
        .orderBy(F.asc_nulls_last("month"))
        .rowsBetween(-1, 1)
    )
    w = m.select(
        "brand",
        "ret_flag",
        "month",
        "s",
        F.sum("s").over(win).alias("w_sum"),
        F.count(F.lit(1)).over(win).alias("n_w"),
    )
    d = w.filter(
        F.lit(10) * F.abs(F.col("n_w") * F.col("s") - F.col("w_sum"))
        > F.col("w_sum")
    ).withColumn(
        "dev6",
        F.floor(
            F.abs(F.col("n_w") * F.col("s") - F.col("w_sum")).cast("double")
            / F.col("w_sum")
            * 1000000
            + 0.5
        ),
    )
    w_rank = Window.partitionBy("brand", "ret_flag").orderBy(
        F.col("dev6").desc(), F.asc_nulls_last("month")
    )
    return d.select(
        "brand",
        "ret_flag",
        "month",
        (F.expr("(s + 50) div 100") / 100.0).alias("revenue"),
        (
            F.floor(F.col("w_sum").cast("double") / F.col("n_w") / 100.0 + 0.5)
            / 100.0
        ).alias("avg3"),
        (F.col("dev6") / 1000000.0).alias("dev_ratio"),
        F.rank().over(w_rank).cast("int").alias("dev_rank"),
    )




def _q64_chain(spark: SparkSession, sf_dir: str, lo: str, hi: str) -> DataFrame:
    """Shared join chain for the q64-idiom twins (``ext_join_multipass``
    builds it once per year; ``ext_join_multipass_fused`` once over the
    full range): lineitem through orders (date-range-filtered at the
    source, so the predicate pushes into the scan) → customer → nation
    (broadcast alias) and supplier → nation (broadcast alias) → part
    (p_size ≤ 25), restricted to cross-nation channels. Keeps
    o_orderdate in the projection — the fused twin derives its year
    lanes from it; Catalyst prunes it from the two-pass plan where the
    aggregate never reads it."""
    n_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(hi).cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 25)
    return (
        li.join(
            o.select("o_orderkey", "o_custkey", "o_orderdate"),
            li.l_orderkey == o.o_orderkey,
        )
        .join(c.select("c_custkey", "c_nationkey"), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("nc_key"))
        .join(s.select("s_suppkey", "s_nationkey"), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("ns_key"))
        .join(p.select("p_partkey", "p_name"), li.l_partkey == p.p_partkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )


def _q64_rev_m4():
    """Exact 10^-4-dollar revenue lane shared by the q64 twins."""
    return (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
    )


# ONE oracle string for both q64-idiom twins (two-pass and fused): the
# forms are result-identical by construction and binding the same
# constant to both @register calls means they cannot drift — and no
# module-bottom REGISTRY mutation is needed (a skipped bind would have
# silently degraded the gate to a rows-only check).
_Q64_ORACLE = """
    WITH sales AS (
        SELECT p_partkey, p_name, n_c.n_name AS cust_nation,
               CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                    THEN 1995 ELSE 1996 END AS yr,
               count(*) AS cnt,
               sum(CAST(l_quantity AS BIGINT)) AS qty,
               sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS rev
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n_c ON c_nationkey = n_c.n_nationkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n_s ON s_nationkey = n_s.n_nationkey
        JOIN part ON l_partkey = p_partkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND p_size <= 25
          AND n_s.n_name <> n_c.n_name
        GROUP BY 1, 2, 3, 4
    )
    SELECT a.p_partkey, a.p_name, a.cust_nation,
           a.cnt AS cnt_y1, b.cnt AS cnt_y2,
           CAST(a.qty AS BIGINT) AS qty_y1, CAST(b.qty AS BIGINT) AS qty_y2,
           ((a.rev + 50) // 100) / 100.0 AS rev_y1,
           ((b.rev + 50) // 100) / 100.0 AS rev_y2
    FROM sales a JOIN sales b
      ON a.p_partkey = b.p_partkey AND a.cust_nation = b.cust_nation
    WHERE a.yr = 1995 AND b.yr = 1996 AND b.rev > a.rev
    """


@register(
    "ext_join_multipass",
    oracle=_Q64_ORACLE,
    tags=("relational", "join", "agg"),
)
def ext_join_multipass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 idiom — the multi-pass deep join chain: the fact
    (lineitem) joined through a 6-relation dimension chain (orders →
    customer → nation, supplier → nation, part) TWICE — once per sale
    year — then the two per-year aggregates self-joined on the item key
    to report (part, customer-nation) international sale channels whose
    revenue GREW year-over-year (q64's cross-year cnt comparison, with
    revenue standing in for the repeat-purchase count).

    Each year pass is built from its own date-range filter at the
    source, so the o_orderdate predicate is a plain range the Parquet
    scan can push (q64's date_dim join re-expressed as partition-
    prunable scan filters — at 100 TB each pass reads exactly its
    year's partitions, never the whole fact). Join discipline per pass:
    only the BOUNDED dim (nation, 25 rows, joined twice via aliases as
    in q7/q8) carries a broadcast hint; orders/customer/supplier/part
    all grow with scale factor so those joins stay declarative
    (sort-merge at scale, AQE may demote — pinned by
    test_multipass_join_discipline). The cross-year self-join runs on
    the AGGREGATED relation — items × nations × years, metadata-sized
    next to the fact — so the expensive work never crosses years.

    Exactness: counts and quantities are pure integers; revenue is the
    all-integer 10⁻⁴-dollar lane (round(price·100) · round((1−disc)·100),
    summed as bigint) with the year-over-year comparison done on the
    integer lane and a single divide at display — no float until the
    final projection (cross-engine rule: engine round() is only trusted
    on the single-value cent scale, never on accumulated sums)."""
    def year_pass(lo: str, hi: str) -> DataFrame:
        return (
            _q64_chain(spark, sf_dir, lo, hi)
            .groupBy("p_partkey", "p_name", "cust_nation")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("l_quantity").cast("long")).alias("qty"),
                F.sum(_q64_rev_m4()).alias("rev"),
            )
        )

    a = year_pass("1995-01-01", "1996-01-01")
    b = year_pass("1996-01-01", "1997-01-01").select(
        F.col("p_partkey").alias("b_partkey"),
        F.col("cust_nation").alias("b_nation"),
        F.col("cnt").alias("cnt_y2"),
        F.col("qty").alias("qty_y2"),
        F.col("rev").alias("rev_y2"),
    )
    return (
        a.join(
            b,
            (a.p_partkey == b.b_partkey) & (a.cust_nation == b.b_nation),
        )
        .filter(F.col("rev_y2") > F.col("rev"))
        .select(
            "p_partkey",
            "p_name",
            "cust_nation",
            F.col("cnt").alias("cnt_y1"),
            "cnt_y2",
            F.col("qty").alias("qty_y1"),
            "qty_y2",
            (F.expr("(rev + 50) div 100") / 100.0).alias("rev_y1"),
            (F.expr("(rev_y2 + 50) div 100") / 100.0).alias("rev_y2"),
        )
    )


_MULTIBAND_LANES = tuple(range(0, 24, 3))  # 8 three-hour bands

_MULTIBAND_ORACLE = "SELECT " + ",\n       ".join(
    [
        lane
        for lo in _MULTIBAND_LANES
        for lane in (
            f"CAST(sum(CASE WHEN h >= {lo} AND h < {lo + 3} THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS n_h{lo}",
            f"CAST(sum(CASE WHEN h >= {lo} AND h < {lo + 3} THEN vc ELSE 0 END)"
            f" AS BIGINT) AS v_h{lo}",
        )
    ]
    + ["CAST(count(*) AS BIGINT) AS n_total"]
) + (
    "\nFROM (SELECT hour(ts) AS h, CAST(round(value * 100) AS BIGINT) AS vc"
    "\n      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL)"
)


@register(
    "ext_multiband_counts",
    oracle=_MULTIBAND_ORACLE,
    tags=("relational", "agg"),
)
def ext_multiband_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 idiom — N time-band counts from ONE scan: eight
    three-hour-of-day traffic bands, each reported as a row count and an
    exact value total, in a single pass over events. q88 spells this as
    eight scalar subqueries (eight scans in a naive engine); the
    Spark-first re-expression is conditional-sum lanes in one aggregate
    — the same "N filters ≠ N scans" contract ext_dq_expectations pins
    for data-quality checks, applied to q88's band report.
    test_multiband_single_scan pins the plan: one Parquet scan, zero
    joins, partial (map-side) aggregation, and a single final exchange —
    the only shuffled rows are the 17-lane partial states, so at 100 TB
    the query is exactly one fact-table pass regardless of band count.

    Exactness: counts are pure integers; per-band value totals are
    integer-cent lanes (round(value·100) summed as bigint — engine
    round() trusted only on the single-value cent scale), so every
    column hash-matches DuckDB with no rounding policy at all."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    h = F.hour("ts")
    vc = F.round(F.col("value") * 100).cast("long")
    lanes = []
    for lo in _MULTIBAND_LANES:
        band = (h >= lo) & (h < lo + 3)
        lanes.append(
            F.sum(F.when(band, 1).otherwise(0)).cast("long").alias(f"n_h{lo}")
        )
        lanes.append(
            F.sum(F.when(band, vc).otherwise(0)).cast("long").alias(f"v_h{lo}")
        )
    lanes.append(F.count(F.lit(1)).cast("long").alias("n_total"))
    return ev.agg(*lanes)


@register(
    "ext_intersect_join",
    oracle="""
    WITH seg AS (
        SELECT l_partkey AS pk,
               CAST(sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_building,
               CAST(sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_machinery,
               sum(CASE WHEN c_mktsegment = 'BUILDING'
                   THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100) AS BIGINT)
                   ELSE 0 END) AS rev_a,
               sum(CASE WHEN c_mktsegment = 'MACHINERY'
                   THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round((1 - l_discount) * 100) AS BIGINT)
                   ELSE 0 END) AS rev_b
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1995-04-01'
        GROUP BY l_partkey
        HAVING sum(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) > 0
           AND sum(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END) > 0
    )
    SELECT p_partkey, p_name, p_brand, n_building, n_machinery,
           ((rev_a + 50) // 100) / 100.0 AS rev_building,
           ((rev_b + 50) // 100) / 100.0 AS rev_machinery
    FROM seg JOIN part ON pk = p_partkey
    """,
    tags=("relational", "setops", "agg"),
)
def ext_intersect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 idiom — a set INTERSECTION feeding a join: parts sold
    to BOTH the BUILDING and MACHINERY segments in 1995Q1, with each
    qualifying part's per-segment line count and revenue (q14's
    cross_items — items present in every sales channel — restricted to
    two channels, with the channel aggregate attached).

    q14 spells the intersection as INTERSECT of N channel subqueries —
    N scans of the fact and a distinct-heavy set operation. The
    Spark-first re-expression folds the set op INTO the aggregate:
    presence is max/sum-of-indicator lanes per segment in the SAME
    grouped pass that computes the per-segment revenue, and the
    intersection is a post-aggregation filter (both counts > 0) over
    the metadata-sized per-part relation. One fact pass total — the
    q88 "N filters ≠ N scans" contract applied to set operations
    (test_intersect_join_single_pass pins one lineitem scan, no
    Intersect node, no self-join). The date range is a pushable scan
    filter; the part-dim join for names stays declarative (part grows
    with SF; SMJ at scale, AQE may demote); segment membership is a
    pushed IN filter on customer.

    Exactness: counts are pure integers; revenue lanes are all-integer
    10⁻⁴-dollar units summed as bigint, divided once at display — the
    ext_join_multipass money contract."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    p = load_table(spark, sf_dir, "part")
    rev_m4 = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
    )
    in_seg = lambda s: F.col("c_mktsegment") == s  # noqa: E731
    seg = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .join(
            c.select("c_custkey", "c_mktsegment"),
            F.col("o_custkey") == c.c_custkey,
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.when(in_seg("BUILDING"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_building"),
            F.sum(F.when(in_seg("MACHINERY"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_machinery"),
            F.sum(F.when(in_seg("BUILDING"), rev_m4).otherwise(0)).alias("rev_a"),
            F.sum(F.when(in_seg("MACHINERY"), rev_m4).otherwise(0)).alias("rev_b"),
        )
        .filter((F.col("n_building") > 0) & (F.col("n_machinery") > 0))
    )
    return (
        seg.join(
            p.select("p_partkey", "p_name", "p_brand"),
            seg.l_partkey == p.p_partkey,
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "n_building",
            "n_machinery",
            (F.expr("(rev_a + 50) div 100") / 100.0).alias("rev_building"),
            (F.expr("(rev_b + 50) div 100") / 100.0).alias("rev_machinery"),
        )
    )


@register(
    "ext_join_multipass_fused",
    # Same oracle STRING as ext_join_multipass — the two forms are
    # result-identical by construction (one module constant bound to
    # both @register calls, so the twins cannot drift).
    oracle=_Q64_ORACLE,
    tags=("relational", "join", "agg"),
)
def ext_join_multipass_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The single-pass twin of ``ext_join_multipass``: the cross-year
    self-join fused into per-year conditional lanes — ONE join chain
    over the two-year range, one grouped pass at (part, cust-nation)
    grain with (cnt, qty, rev) lanes per year, and the q64 cross-year
    comparison as a post-aggregation filter (both years present AND
    rev_y2 > rev_y1). The ext_intersect_join presence-lane trick applied
    to the multipass chain: the dimension joins run ONCE instead of once
    per year, and there is no self-join at all.

    Measured (DESIGN_NOTES "r10: two-pass vs fused"): on unpartitioned
    fixtures the fused form wins 1.57×/1.26× at sf0.1/sf1 — exactly the
    duplicated-join-work saving. The two-pass twin remains the
    partition-pruned shape for year-partitioned storage and incremental
    (one-year-resident) processing; this twin is the batch-over-both-
    years plan. Same money/count contracts; plan pin
    test_multipass_fused_single_pass proves one lineitem scan, 2 nation
    broadcasts, 4 declarative SMJs, zero self-join."""
    rev_m4 = _q64_rev_m4()
    y1 = F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    j = _q64_chain(spark, sf_dir, "1995-01-01", "1997-01-01")
    agg = j.groupBy("p_partkey", "p_name", "cust_nation").agg(
        F.sum(F.when(y1, 1).otherwise(0)).alias("cnt_y1"),
        F.sum(F.when(~y1, 1).otherwise(0)).alias("cnt_y2"),
        F.sum(F.when(y1, F.col("l_quantity").cast("long")).otherwise(0)).alias(
            "qty_y1"
        ),
        F.sum(F.when(~y1, F.col("l_quantity").cast("long")).otherwise(0)).alias(
            "qty_y2"
        ),
        F.sum(F.when(y1, rev_m4).otherwise(0)).alias("rev1"),
        F.sum(F.when(~y1, rev_m4).otherwise(0)).alias("rev2"),
    )
    return (
        agg.filter(
            (F.col("cnt_y1") > 0)
            & (F.col("cnt_y2") > 0)
            & (F.col("rev2") > F.col("rev1"))
        )
        .select(
            "p_partkey",
            "p_name",
            "cust_nation",
            "cnt_y1",
            "cnt_y2",
            "qty_y1",
            "qty_y2",
            (F.expr("(rev1 + 50) div 100") / 100.0).alias("rev_y1"),
            (F.expr("(rev2 + 50) div 100") / 100.0).alias("rev_y2"),
        )
    )




@register(
    "ext_frequent_best_readout",
    oracle="""
    WITH j AS (
        SELECT l_partkey, o_custkey, l_returnflag,
               CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT) AS rev,
               o_orderdate
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
    ),
    freq AS (
        SELECT l_partkey FROM j GROUP BY 1 HAVING count(*) >= 13
    ),
    cust AS (SELECT o_custkey, sum(rev) AS s FROM j GROUP BY 1),
    best AS (
        SELECT o_custkey FROM cust WHERE 2 * s > (SELECT max(s) FROM cust)
    )
    SELECT l_returnflag AS channel,
           count(*) AS n_sales,
           ((sum(rev) + 50) // 100) / 100.0 AS revenue
    FROM j
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND l_partkey IN (SELECT l_partkey FROM freq)
      AND o_custkey IN (SELECT o_custkey FROM best)
    GROUP BY 1
    """,
    tags=("relational", "join", "agg"),
)
def ext_frequent_best_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23-idiom capstone: FREQUENT ITEMS (the heavy-hitters
    threshold discipline) and BEST CUSTOMERS (spend above a fraction of
    the maximum) discovered over a two-year fact window, then a
    restricted readout of the recent period's sales that hit BOTH sets,
    per channel (return-flag standing in for q23's catalog/web split).

    The Spark-first composition the two q23 discovery CTEs reduce to:

    - ONE discovery pass: q23 computes frequent_ss_items and
      best_ss_customer as two separate scans of store_sales; here both
      grains come out of a single fact pass via GROUPING SETS
      ((l_partkey), (o_custkey)) — one scan, one Expand(2x), one
      group-bounded exchange carrying (item-grain + customer-grain)
      partial states. gid tells the lanes apart; the frequency
      threshold (count >= 13, the fixture's p90 — the phi-heavy idiom
      with an absolute floor) and the best-customer rule are post-agg
      filters on the metadata-sized grouped relation.
    - The best-customer cutoff (2*spend > max spend) compares INTEGER
      10^-4-dollar lanes against a 1-row broadcast maximum (the
      repo-allowed 1-row-aggregate crossJoin) — no percentile sort, no
      float until display.
    - The READOUT pass is the second and final fact scan: the 1996
      range is pushed into the orders scan, the frequent/best sets
      arrive as left-semi joins of post-aggregation relations (dim-
      bounded; declarative so they broadcast at fixture scale and
      hash-shuffle at 100 TB), and the per-channel money lanes fold in
      the SAME grouped pass — no Intersect node anywhere.

    The grouped discovery relation has FOUR consumers (freq, cust, the
    1-row max, best); without materialization Catalyst re-derives the
    fact lineage for each (measured: 4 lineitem scans). It is
    group-bounded — |parts| + |customers| rows, metadata-sized next to
    the fact — so it is localCheckpoint'ed once (the ext_dbscan_grid
    discipline: compute the small relation ONE time, truncate lineage,
    every consumer reads the materialized rows).

    Plan pins (test_frequent_best_two_fact_passes): the discovery plan
    is 1 lineitem scan + 1 Expand; the readout plan is 1 lineitem scan,
    0 Expand, 0 Intersect, pushed date range, and no scan downstream of
    the checkpoint. Exactness: counts integer; revenue summed in the
    10^-4-dollar lane, one divide at display (the q64 contract)."""
    disc = _q23_discovery(spark, sf_dir).localCheckpoint()
    freq = disc.filter((F.col("gid") == 1) & (F.col("cnt") >= 13)).select(
        "l_partkey"
    )
    cust = disc.filter(F.col("gid") == 2).select("o_custkey", "s")
    cmax = cust.agg(F.max("s").alias("smax"))  # 1 row — broadcast-bounded
    best = (
        cust.crossJoin(F.broadcast(cmax))
        .filter(F.col("s") * 2 > F.col("smax"))
        .select("o_custkey")
    )
    # readout: the second (and last) fact pass, recent range pushed
    return (
        _q23_joined(spark, sf_dir, "1996-01-01")
        .join(freq, "l_partkey", "left_semi")
        .join(best, "o_custkey", "left_semi")
        .groupBy(F.col("l_returnflag").alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_sales"),
            (F.expr("(sum(rev) + 50) div 100") / 100.0).alias("revenue"),
        )
    )


def _q23_joined(spark: SparkSession, sf_dir: str, lo: str) -> DataFrame:
    """Fact window shared by the capstone's two passes: lineitem joined
    to range-filtered orders (the range pushes into the orders scan),
    projected to the 4 columns the passes read, revenue in the integer
    10^-4-dollar lane."""
    rev = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((F.lit(1) - F.col("l_discount")) * 100).cast("long")
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    return li.join(
        o.select("o_orderkey", "o_custkey"),
        li.l_orderkey == o.o_orderkey,
    ).select("l_partkey", "o_custkey", "l_returnflag", rev.alias("rev"))


def _q23_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone's single discovery pass: both grains (item
    frequency, customer spend) from ONE fact scan via GROUPING SETS —
    one Expand(2x), one group-bounded exchange."""
    return (
        _q23_joined(spark, sf_dir, "1995-01-01")
        .groupingSets(
            [["l_partkey"], ["o_custkey"]], "l_partkey", "o_custkey"
        )
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum("rev").alias("s"),
        )
    )
