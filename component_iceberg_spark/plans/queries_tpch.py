"""Extended TPC-H-shaped relational coverage (SURVEY §2.5 depth pass).

The fixture schema is a reduced TPC-H (no partsupp table, no
l_commitdate / l_receiptdate / l_shipmode, no p_container / p_mfgr), so
each query keeps the *shape* of its TPC-H namesake — the join topology,
subquery pattern, and aggregation structure — with predicates adapted to
the columns that exist:

- q4  EXISTS  → late-shipment proxy (l_shipdate > o_orderdate)
- q9  profit  → no supplycost term (partsupp absent)
- q16/q20 partsupp → DISTINCT (l_partkey, l_suppkey) pairs from lineitem
- q21 waiting → lateness = shipped >90 days after order date
- q22 phone-prefix → nation-key set membership

Scale notes apply per query; the common rules: broadcast only bounded
dims (nation/region/1-row scalars), express EXISTS / NOT EXISTS as
left_semi / left_anti joins (shuffled on the join key, never collected),
and compute ratio measures from pre-rounded sums so Spark and DuckDB
divide identical operands.

Float policy: same as queries_relational — multi-row double sums round
to 2 dp on both sides before any comparison, division, or ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import relational
from component_iceberg_spark.plans.registry import register

def _revenue():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q4: order priority checking — EXISTS rewritten as left-semi join
# ---------------------------------------------------------------------------

Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("q4_order_priority", oracle=Q4_ORACLE, tags=("relational", "tpch"))
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (EXISTS → left_semi). The semi join shuffles both
    sides on l_orderkey and keeps at most one match per order, so the
    post-join row count is bounded by the filtered orders — no fan-out.
    The date filter is pushed to the orders scan (quarter ≈ 4% of rows),
    and AQE may broadcast that filtered side at runtime."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-07-01"))
        & (F.col("o_orderdate") < _ts("1996-10-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# Q7: volume shipping between two nations — self-join of nation as n1/n2
# ---------------------------------------------------------------------------

Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@register("q7_volume_shipping", oracle=Q7_ORACLE, tags=("relational", "tpch"))
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation joined twice under different roles. Both
    nation sides broadcast (25 rows each); the disjunctive nation-pair
    predicate is applied *after* those broadcasts so it prunes rows
    before the expensive fact⋈fact shuffles reach the aggregate. The
    lineitem date filter is pushed to the scan. orders⋈lineitem and
    customer⋈orders stay declarative → sort-merge at scale, AQE
    broadcast when a filtered side is genuinely small."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            _revenue().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8: national market share — ratio of conditional sum to total sum
# ---------------------------------------------------------------------------

Q8_ORACLE = """
SELECT o_year,
       round(round(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END), 2)
             / round(sum(volume), 2), 6) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


@register("q8_market_share", oracle=Q8_ORACLE, tags=("relational", "tpch"))
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way snowflake ending in a conditional-sum ratio.
    Both sums are rounded to 2 dp *before* the division so Spark and the
    oracle divide bit-identical operands (double summation order differs
    between engines; the ratio would otherwise wobble in the last ulp).
    part is filtered to one type (~17%) and broadcast-eligible via AQE;
    nation×2 and region broadcast unconditionally (bounded dims)."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_regionkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_regionkey") == r.r_regionkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
    )
    per_year = joined.select(
        F.year("o_orderdate").cast("bigint").alias("o_year"),
        _revenue().alias("volume"),
        "supp_nation",
    )
    return per_year.groupBy("o_year").agg(
        F.round(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(0.0)),
                2,
            )
            / F.round(F.sum("volume"), 2),
            6,
        ).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit (adapted: no partsupp → no supplycost term)
# ---------------------------------------------------------------------------

Q9_ORACLE = """
SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
FROM (
  SELECT n_name AS nation,
         year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS amount
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@register("q9_product_profit", oracle=Q9_ORACLE, tags=("relational", "tpch"))
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (minus the supplycost term — partsupp doesn't exist
    in the fixture schema). The p_name LIKE filter lands on the part scan
    and prunes the fact join's build side; nation broadcasts. Group-by
    cardinality is bounded (25 nations × years), so the final aggregate
    shuffle is metadata-sized regardless of input scale."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
    )
    return (
        joined.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            _revenue().alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue
# ---------------------------------------------------------------------------

Q10_ORACLE = """
SELECT c_custkey, c_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q10_returned_items", oracle=Q10_ORACLE, tags=("relational", "tpch"))
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact⋈fact⋈dim, aggregate per customer, top-20 via
    TakeOrderedAndProject (bounded heap per partition + single 20-row
    merge at the driver — no global sort). Revenue is rounded before
    ranking so both engines rank identical values; c_custkey breaks
    ties deterministically."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-10-01"))
        & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )
    return relational.topk(agg, [F.col("revenue").desc(), F.col("c_custkey")], 20)


# ---------------------------------------------------------------------------
# Q14: promotion effect — conditional-sum ratio over one month
# ---------------------------------------------------------------------------

Q14_ORACLE = """
SELECT round(
         100.0 * round(sum(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1 - l_discount) ELSE 0 END), 2)
         / round(sum(l_extendedprice * (1 - l_discount)), 2), 6) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
"""


@register("q14_promo_effect", oracle=Q14_ORACLE, tags=("relational", "tpch"))
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: single-group conditional ratio. One month of
    lineitem (~1.5% after pushdown) joins part on partkey; part carries
    no filter so at scale this is the shuffle — a bucketed/bloom-pruned
    part table is the production layout. Ratio divides pre-rounded sums
    (see Q8 note)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-09-01"))
        & (F.col("l_shipdate") < _ts("1997-10-01"))
    )
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(0.0)), 2
            )
            / F.round(F.sum(_revenue()), 2),
            6,
        ).alias("promo_revenue")
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — scalar-max join-back (argmax without a window)
# ---------------------------------------------------------------------------

Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", oracle=Q15_ORACLE, tags=("relational", "tpch"))
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate → scalar max → equality join-back. The
    scalar subquery becomes a 1-row aggregate crossJoin-broadcast (never
    a collect); the revenue CTE is computed once and reused for both the
    max and the join-back via persist. Revenue is rounded before max so
    ties resolve identically in both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_revenue()), 2).alias("total_revenue"))
        .persist()
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    s = load_table(spark, sf_dir, "supplier")
    out = (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
    return out


# ---------------------------------------------------------------------------
# Q16: supplier count per part attribute (partsupp → distinct lineitem pairs)
# ---------------------------------------------------------------------------

Q16_ORACLE = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
"""


@register("q16_part_supplier_cnt", oracle=Q16_ORACLE, tags=("relational", "tpch"))
def q16_part_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape with the fixture's partsupp stand-in: the observed
    DISTINCT (l_partkey, l_suppkey) pairs from lineitem. The distinct is
    a partial-aggregating shuffle on the pair (map-side combine bounds it
    at #distinct-pairs); count(DISTINCT) then re-aggregates per part
    attribute group. part's IN + <> filters prune before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    return (
        ps.join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q19: discounted revenue — disjunctive multi-attribute join predicate
# ---------------------------------------------------------------------------

Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@register("q19_discounted_revenue", oracle=Q19_ORACLE, tags=("relational", "tpch"))
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: equi-join on partkey with a residual disjunctive
    predicate. Catalyst extracts the common l_partkey = p_partkey
    conjunct as the join key and evaluates the OR-of-ANDs as a post-join
    filter; it also infers a superset filter (brand IN ... / size ≤ 15)
    pushable to the part scan. Keeping the equi-key explicit is what
    saves this from degenerating into a cartesian at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey).filter(
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return joined.agg(F.round(F.sum(_revenue()), 2).alias("revenue"))


# ---------------------------------------------------------------------------
# Q20: suppliers with excess shipped quantity of PROMO parts (partsupp adapt)
# ---------------------------------------------------------------------------

Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_type = 'PROMO'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 50
  )
"""


@register("q20_excess_suppliers", oracle=Q20_ORACLE, tags=("relational", "tpch"))
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subquery with a HAVING aggregate,
    expressed as agg → left_semi. The inner aggregate groups on
    (suppkey, partkey) with map-side combine; the semi join then shuffles
    only distinct qualifying suppkeys. nation broadcasts; the year + type
    filters push to the scans."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    qualifying = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(qualifying, s.s_suppkey == qualifying.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS on one table
# ---------------------------------------------------------------------------

Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


@register("q21_waiting_supplier", oracle=Q21_ORACLE, tags=("relational", "tpch"))
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (lateness adapted to shipped >90 days after order
    date — no receipt/commit dates in the fixture). The EXISTS becomes a
    left_semi against lineitem and the NOT EXISTS a left_anti against the
    *late* lines, both keyed on l_orderkey with a suppkey-inequality
    residual — all three legs shuffle on the same orderkey, so Spark
    reuses one exchange. Nothing here fans out: semi/anti emit at most
    one row per probe row."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late1 = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
    ).persist()
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late1.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    waiting = (
        late1.join(
            others,
            (late1.l_orderkey == others.o2_orderkey)
            & (late1.l_suppkey != others.o2_suppkey),
            "left_semi",
        ).join(
            late_others,
            (late1.l_orderkey == F.col("o3_orderkey"))
            & (late1.l_suppkey != F.col("o3_suppkey")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    agg = (
        waiting.join(s, waiting.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return relational.topk(agg, [F.col("numwait").desc(), F.col("s_name")], 20)


# ---------------------------------------------------------------------------
# Q22: dormant high-balance customers (phone prefix → nation-key set)
# ---------------------------------------------------------------------------

Q22_ORACLE = """
SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  AND c_acctbal > (
    SELECT avg(c_acctbal) FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
  )
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


@register("q22_dormant_customers", oracle=Q22_ORACLE, tags=("relational", "tpch"))
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (phone-prefix membership adapted to nation keys).
    The scalar AVG subquery is a 1-row aggregate crossJoin-broadcast —
    never collected to the driver; NOT EXISTS is a left_anti shuffled on
    custkey. The avg compares raw doubles: both engines compute one
    global avg over the same multiset (single combine tree each), and the
    threshold comparison is strict inequality on values generated at 2 dp
    — boundary collisions can't occur."""
    keyset = (1, 3, 5, 7, 9, 11, 13)
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(*keyset))
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    o = load_table(spark, sf_dir, "orders")
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# Q2: minimum-cost supplier — partsupp derived from lineitem
# ---------------------------------------------------------------------------

Q2_ORACLE = """
WITH ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           min(l_extendedprice / l_quantity) AS ps_supplycost
    FROM lineitem GROUP BY 1, 2
),
elig AS (
    SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost
    FROM ps
    JOIN part ON p_partkey = ps_partkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE' AND p_size <= 15 AND p_type = 'LARGE'
),
m AS (
    SELECT *, min(ps_supplycost) OVER (PARTITION BY p_partkey) AS mn FROM elig
)
SELECT s_acctbal, s_name, n_name, p_partkey
FROM m WHERE ps_supplycost = mn
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("q2_min_cost_supplier", oracle=Q2_ORACLE, tags=("relational", "tpch"))
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape with partsupp reconstructed from lineitem: supply
    cost := min unit price ever charged for the (part, supplier) pair.
    min() is order-independent over doubles computed identically in both
    engines, so no rounding is needed anywhere. The correlated min
    subquery decorrelates into a window-min over p_partkey (one shuffle,
    already partitioned by the join key). part is filtered ~0.3%
    selective → broadcast; nation/region are bounded dims → broadcast;
    the ps aggregate shuffles lineitem once on (partkey, suppkey)."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    from pyspark.sql import Window

    elig = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost")
    )
    w = Window.partitionBy("p_partkey")
    best = (
        elig.withColumn("mn", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mn"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
    )
    return relational.topk(
        best,
        [F.col("s_acctbal").desc(), F.col("n_name"), F.col("s_name"), F.col("p_partkey")],
        100,
    )


# ---------------------------------------------------------------------------
# Q11: important parts by supply value — scalar-subquery threshold
# ---------------------------------------------------------------------------

Q11_ORACLE = """
WITH v AS (
    SELECT l_partkey AS ps_partkey,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * CAST(round((1 - l_discount) * 100) AS BIGINT)) AS value_e4
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey IN (0, 4, 8)
    GROUP BY 1
)
SELECT ps_partkey, value_e4 / 10000.0 AS value
FROM v
WHERE value_e4 * 1000 > (SELECT sum(value_e4) FROM v)
"""


@register("q11_important_parts", oracle=Q11_ORACLE, tags=("relational", "tpch"))
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp value → lineitem revenue attributed to
    suppliers of a nation set; the single-nation predicate widened to a
    key set so the result is non-degenerate at every fixture SF). The
    scalar total is a 1-row aggregate crossJoin-broadcast, never
    collected.

    The 0.1%-of-total threshold sits exactly where float summation order
    matters (a per-part 2-dp rounded sum straddled a half-cent boundary
    between Spark and DuckDB at sf0.01), so the value computation is
    EXACT: prices and discounts are generated at 2 dp, hence revenue is
    an integer in 10⁻⁴-dollar units — sum as int64 (order-independent)
    and compare the threshold in the integer domain (value_e4·1000 >
    total_e4). int64 headroom: ~9.2e18 against ~1e9 e4-units per row.
    The displayed value is the UNROUNDED exact quotient value_e4/10⁴:
    a final round(·, 2) would reintroduce engine disagreement on exact
    decimal ties (Spark's HALF_UP BigDecimal vs DuckDB's float-domain
    round disagree on x.225 — observed at sf0.01), while the raw IEEE
    division is bit-identical in both engines.
    Scale: supplier-filter broadcasts, one shuffle of lineitem on
    partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(0, 4, 8)
    )
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    v = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(F.sum(rev_e4).alias("value_e4"))
    )
    threshold = v.agg(F.sum("value_e4").alias("total_e4"))
    return (
        v.crossJoin(F.broadcast(threshold))
        .filter(F.col("value_e4") * 1000 > F.col("total_e4"))
        .select("ps_partkey", (F.col("value_e4") / 10000.0).alias("value"))
    )
