"""Physical-plan assertions: the scale properties the engine promises —
filter pushdown into the Parquet scan, column pruning, broadcast joins for
dimensions, TakeOrderedAndProject for top-k — must be visible in
``explain`` output, not just hoped for."""

from __future__ import annotations

from component_iceberg_spark.plans import load_all

REGISTRY = load_all()


def plan(spark, sf_dir, name: str) -> str:
    from tests.conftest import plan_formatted

    return plan_formatted(REGISTRY[name].fn(spark, sf_dir))


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = plan(spark, sf_dir, "scan_filter_pushdown")
    assert "PushedFilters:" in p
    assert "l_shipdate" in p.split("PushedFilters:")[1].splitlines()[0]
    assert "l_quantity" in p.split("PushedFilters:")[1].splitlines()[0]


def test_projection_prunes_read_schema(spark, sf_dir):
    p = plan(spark, sf_dir, "scan_projection")
    read_schema = p.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema
    assert "l_returnflag" not in read_schema, "unprojected column not pruned"
    assert "l_shipdate" not in read_schema, "unprojected column not pruned"


def plan_no_auto_broadcast(spark, sf_dir, name: str) -> str:
    """Explain with the auto-broadcast threshold off: any BroadcastHashJoin
    left in the plan comes from a hard-coded ``F.broadcast`` hint. At small
    test SFs every table is under the threshold, so this is the only way to
    see which joins the *code* forces to broadcast — i.e. what would happen
    at 100 TB where nothing is under the threshold."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        return plan(spark, sf_dir, name)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_q3_no_fact_broadcast(spark, sf_dir):
    """q3 joins three tables that all grow with the data (lineitem, orders,
    customer): no join may be forced to broadcast. SMJ is the correct plan
    at scale; AQE may demote to broadcast at runtime when a filtered side
    is genuinely small — that is runtime's call, not the plan's."""
    p = plan_no_auto_broadcast(spark, sf_dir, "q3_shipping_priority")
    assert "SortMergeJoin" in p
    assert "BroadcastHashJoin" not in p, "fact table must not be hint-broadcast"


def test_q5_broadcasts_only_bounded_dims(spark, sf_dir):
    """q5: only region (5 rows) and nation (25 rows) keep broadcast hints;
    supplier/orders/customer grow with scale factor, so their joins must
    plan sort-merge (AQE may demote at runtime when a side is small —
    that's runtime knowledge, not a hard-coded assumption)."""
    p = plan_no_auto_broadcast(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in p, "bounded dims should broadcast"
    assert "SortMergeJoin" in p, "fact joins should sort-merge"
    # the forced-broadcast count is exactly the two hinted dims
    # (formatted explain names each node once in the tree and once in the
    # detail section — count the detail headers "(n) BroadcastHashJoin")
    import re

    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 2


def test_q18_q12_no_fact_broadcast(spark, sf_dir):
    for q in ("q18_large_volume_orders", "q12_priority_shipmode"):
        p = plan_no_auto_broadcast(spark, sf_dir, q)
        assert "BroadcastHashJoin" not in p, f"{q}: fact table hint-broadcast"
        assert "SortMergeJoin" in p


def test_rollup_rank_no_fact_broadcast(spark, sf_dir):
    """ext_rollup_rank joins orders⋈customer (both grow with scale factor)
    and nation (25 rows, bounded). Only nation may carry a broadcast hint;
    the fact join must plan sort-merge with auto-broadcast off — a forced
    customer broadcast would OOM executors at 100×. The ROLLUP's grouping-
    set Expand must sit UNDER a partial aggregate (map-side combine before
    the shuffle)."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_rollup_rank")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 1, (
        "exactly the bounded dim (nation) broadcasts"
    )
    assert "SortMergeJoin" in p, "orders⋈customer must sort-merge at scale"
    assert len(re.findall(r"\(\d+\) Expand", p)) == 1  # rollup grouping sets
    assert "partial_sum" in p or "partial_count" in p


def test_crossover_one_exchange_before_window(spark, sf_dir):
    """ext_window_crossover: ONE events scan (both channels as conditional-
    sum lanes in one aggregate, no join), then ONE SinglePartition exchange
    feeding BOTH window nodes (running sums + leader lag share the day
    ordering, so Catalyst plans one sort). The single-partition window is
    deliberate — the windowed relation is |days| rows, metadata-sized."""
    import re

    p = plan(spark, sf_dir, "ext_window_crossover")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, "one scan only"
    assert not re.search(r"\(\d+\) \w*Join", p), "no join — lanes, not FOJ"
    exchanges = re.findall(r"\(\d+\) Exchange", p)
    assert len(exchanges) == 2, "agg shuffle + one window exchange, no more"
    assert "SinglePartition" in p  # the window exchange, |days|-sized input
    assert len(re.findall(r"\(\d+\) Sort", p)) == 1, (
        "both windows share one day-ordered sort"
    )
    assert "partial_sum" in p  # map-side combine under the fact aggregate


def test_rolling_outlier_no_fact_broadcast(spark, sf_dir):
    """ext_window_rolling_outlier joins lineitem⋈part — both grow with
    scale factor, so no broadcast hint anywhere; and BOTH window specs
    partition by (brand, ret_flag), so the metadata-sized monthly relation
    shuffles exactly once for the two window families (4 exchanges total:
    two SMJ sides, the monthly aggregate, one shared window exchange)."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_window_rolling_outlier")
    assert "BroadcastHashJoin" not in p, "fact join must not be hint-broadcast"
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 4
    assert len(re.findall(r"\(\d+\) Window", p)) == 2
    assert "partial_sum" in p


def test_order_preserve_no_single_partition_sort(spark, sf_dir):
    """The insertion-order index must be built by range-partition + offset
    (global_rank), never a partition-less window that sorts the whole
    table in one task."""
    p = plan(spark, sf_dir, "order_preserve")
    assert "Exchange SinglePartition" not in p
    assert "Window" in p  # per-partition ranking window still present


def test_topk_avoids_global_sort(spark, sf_dir):
    p = plan(spark, sf_dir, "ext_topk")
    assert "TakeOrderedAndProject" in p


def test_q1_partial_aggregation(spark, sf_dir):
    p = plan(spark, sf_dir, "q1_pricing_summary")
    # partial_ functions before the exchange = map-side combine
    assert "partial_sum" in p or "partial_count" in p


def test_whole_stage_codegen_on_flagship(spark, sf_dir):
    # AQE hides codegen subtrees until runtime; disable it for the check.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "codegen"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen subtrees" in p
    assert "Found 0 WholeStageCodegen" not in p


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Bucketing demo: two tables bucketed on the join key co-locate, so
    the join plans with NO shuffle exchange — the pre-partitioning story
    for repeated large-scale joins (SURVEY guide 'Bucketing')."""
    import uuid

    from component_iceberg_spark.io.tables import load_table

    # unique names: the in-memory catalog forgets tables between sessions
    # but the warehouse dir keeps their files — a reused name collides
    tag = uuid.uuid4().hex[:8]
    t_o, t_li = f"b_orders_{tag}", f"b_lineitem_{tag}"
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(t_o))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
       .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(t_li))

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = spark.table(t_o).join(spark.table(t_li), "o_orderkey")
        p = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")
    assert "Exchange" not in p, "bucketed join must not shuffle"
    assert n == li.count()


def test_snaptable_partition_pruning(spark, sf_dir, tmp_path):
    """A filter on the partition column of a partition-spec snap table must
    reach the scan as a PartitionFilter (directory pruning), not a data
    filter."""
    from pyspark.sql import functions as F

    from component_iceberg_spark.io.snaptable import SnapCatalog
    from component_iceberg_spark.io.tables import load_table

    cat = SnapCatalog(str(tmp_path / "wh"))
    o = load_table(spark, sf_dir, "orders")
    cat.create_or_replace("ns", "t", o, partition_by=["o_orderstatus"])
    df = cat.read(spark, "ns", "t").filter(F.col("o_orderstatus") == "F")
    p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    pf = p.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_orderstatus" in pf, f"partition filter missing: {pf}"
    assert df.count() == o.filter("o_orderstatus = 'F'").count()


def test_bucketed_table_reuse_across_queries(spark, sf_dir):
    """The payoff of bucketing is AMORTIZATION: one bucketed write, then
    every subsequent join AND aggregation on the bucket key plans with no
    shuffle exchange in the same session. At 100 TB this converts the
    per-query lineitem shuffle (the single largest data movement in the
    TPC-H-shaped suite) into a one-time layout cost."""
    import uuid

    from component_iceberg_spark.io.tables import load_table

    tag = uuid.uuid4().hex[:8]
    t_o, t_li = f"r_orders_{tag}", f"r_lineitem_{tag}"
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(t_o))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
       .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable(t_li))

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from pyspark.sql import functions as F

        bo, bli = spark.table(t_o), spark.table(t_li)
        # query 1: equi-join on the bucket key
        q1 = bo.join(bli, "o_orderkey")
        # query 2: aggregation keyed on the bucket column
        q2 = bli.groupBy("o_orderkey").agg(F.sum("l_quantity").alias("qty"))
        # query 3: semi-join (a different physical join on the same layout)
        q3 = bli.join(bo.filter("o_totalprice > 100000"), "o_orderkey",
                      "left_semi")
        for q in (q1, q2, q3):
            assert "Exchange" not in plan(q), "bucketed layout not reused"
        assert q2.count() == li.select("l_orderkey").distinct().count()
        assert q3.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_li}")


# ---------------------------------------------------------------------------
# Global no-growing-broadcast invariant (generalizes the q5 pin): across all
# 22 TPC-H shapes, no BroadcastExchange may feed from a RAW scan of a table
# that grows with scale factor. A broadcast subtree that reads a growing
# table is allowed ONLY when it aggregates first (scalar thresholds like
# q15's max-revenue or q22's avg-acctbal broadcast a ~1-row aggregate —
# bounded at any SF). Hinted bounded dims (nation: 25 rows, region: 5) are
# always fine.

_GROWING_TABLES = ("lineitem", "orders", "customer", "partsupp",
                   "supplier", "part")
_TPCH_QUERIES = sorted(n for n in REGISTRY if __import__("re").match(r"q\d+_", n))


def _broadcast_subtrees(df):
    """Physical-plan BroadcastExchange nodes (pre-AQE sparkPlan — the
    static plan the code commits to), each rendered as its subtree
    string."""
    plan = df._jdf.queryExecution().sparkPlan()  # noqa: SLF001
    out = []

    def walk(node):
        if "BroadcastExchange" in node.getClass().getSimpleName():
            out.append(node.toString())
        kids = node.children()
        for i in range(kids.length()):
            walk(kids.apply(i))

    walk(plan)
    return out


def test_tpch_shapes_present():
    assert len(_TPCH_QUERIES) == 22, _TPCH_QUERIES


@__import__("pytest").mark.parametrize("name", _TPCH_QUERIES)
def test_no_growing_table_static_broadcast(spark, sf_dir, name):
    import re

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY[name].fn(spark, sf_dir)
        for subtree in _broadcast_subtrees(df):
            scanned = {
                t for t in _GROWING_TABLES
                if re.search(rf"[/\\]{t}\.parquet", subtree)
            }
            if not scanned:
                continue  # bounded-dim or derived-only broadcast
            assert "Aggregate" in subtree, (
                f"{name}: BroadcastExchange feeds from a raw scan of "
                f"growing table(s) {sorted(scanned)} — at 100 TB this "
                f"side does not fit in memory:\n{subtree[:2000]}"
            )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_histogram_degenerate_range_single_bin(spark):
    """equi_width_histogram on a constant column: bin width would be 0
    (every row at NaN bin); the guard short-circuits to one bin 0
    carrying all rows. Decimal input exercises the double-cast path."""
    from decimal import Decimal

    from component_iceberg_spark.plans.queries_functions import (
        equi_width_histogram,
    )

    df = spark.createDataFrame(
        [(Decimal("7.50"),)] * 11, schema="x decimal(10,2)"
    )
    out = equi_width_histogram(df, "x", 20).collect()
    assert len(out) == 1
    assert (out[0]["bin"], out[0]["n"], out[0]["total"]) == (0, 11, 82.5)


def test_gate_priority_names_all_registered():
    """_GATE_PRIORITY tolerates unknown names at runtime (safe across
    refactors), which means a typo silently drops a query from the gate
    window head — catch that here instead."""
    from component_iceberg_spark.plans.registry import _GATE_PRIORITY

    unknown = [n for n in _GATE_PRIORITY if n not in REGISTRY]
    assert not unknown, f"gate-priority names not in registry: {unknown}"
    assert len(set(_GATE_PRIORITY)) == len(_GATE_PRIORITY), "duplicates"
    # and the reverse: a registered query missing from the list sorts
    # dead last (behind the deliberately-yielding fresh-green tail) —
    # exactly the blind spot the rotation schedule exists to prevent
    unlisted = [n for n in REGISTRY if n not in set(_GATE_PRIORITY)]
    assert not unlisted, f"registered but not gate-prioritized: {unlisted}"


# oracle=None is ALSO the legitimate rows-only-check marker, so a twin
# query accidentally registered without its shared oracle constant would
# silently degrade from exact-hash to rows-only. Pin both facts: the
# rows-only set is exactly the designed one, and each twin pair shares
# ONE oracle string.
_ROWS_ONLY_BY_DESIGN = {
    "ext_agg_approx",
    "ext_cardinality_hll",
    "ext_overlap_theta",
    "ext_pca_project",
    "ext_profile_columns_approx",
    "ext_quantile_kll",
    "sim_ann_ivf_kmeans",
    "sim_ann_pq_kmeans",
}

_TWIN_PAIRS = [
    ("ext_join_multipass", "ext_join_multipass_fused"),
    ("source_binaryfile", "stream_binaryfile_ingest"),
    ("ext_active_users_trailing", "stream_active_users_trailing"),
]


def test_rows_only_set_is_exactly_the_designed_one():
    none_names = {n for n, q in REGISTRY.items() if q.oracle is None}
    assert none_names == _ROWS_ONLY_BY_DESIGN, (
        f"unexpected rows-only queries: {sorted(none_names - _ROWS_ONLY_BY_DESIGN)}; "
        f"missing designed ones: {sorted(_ROWS_ONLY_BY_DESIGN - none_names)}"
    )


def test_twin_queries_share_one_oracle_string():
    for a, b in _TWIN_PAIRS:
        assert REGISTRY[a].oracle is not None, a
        assert REGISTRY[a].oracle == REGISTRY[b].oracle, f"{a} vs {b}"


def test_no_antipatterns_any_query(spark, sf_dir):
    """Global anti-pattern net across the whole registry: no query may
    plan a row-at-a-time Python UDF (BatchEvalPython — only Arrow-batched
    Python is allowed) or a non-broadcast cartesian product. One sweep at
    the smallest fixture; streaming queries are skipped (their returned
    frame is a materialized sink scan, not the streaming plan)."""
    bad: dict[str, list[str]] = {}
    for name, q in REGISTRY.items():
        if "streaming" in q.tags:
            continue
        try:
            df = q.fn(spark, sf_dir)
            p = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — attribute, don't mask
            bad.setdefault(name, []).append(f"plan build failed: {e}")
            continue
        for pattern in ("BatchEvalPython", "CartesianProduct"):
            if pattern in p:
                bad.setdefault(name, []).append(pattern)
    assert not bad, f"anti-patterns found: {bad}"


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    """ext_join_bucketed's contract: with both sides bucketed+sorted on
    the join key, the join AND the bucket-key-prefixed aggregation run
    without any shuffle Exchange. Broadcast is disabled so the plan
    cannot sidestep the claim at small fixtures — what remains must be a
    bucket-aligned SortMergeJoin with zero 'Exchange hashpartitioning'."""
    import re

    from component_iceberg_spark.plans import load_all

    reg = load_all()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = reg["ext_join_bucketed"].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert plan.count("Bucketed: true") == 2, plan[:2000]
    assert "SortMergeJoin" in plan
    assert not re.search(r"Exchange hashpartitioning", plan), plan[:2000]


def test_funnel_single_user_exchange(spark, sf_dir):
    """ext_funnel's contract: the whole multi-step chain costs ONE
    hash-partition Exchange (all step windows + the per-user collapse
    share the user_id partitioning); only the final k-row count rollup
    may add its scalar SinglePartition exchange."""
    import re

    p = plan(spark, sf_dir, "ext_funnel")
    assert len(re.findall(r"hashpartitioning\(", p)) == 1, p[:2000]
    assert "CartesianProduct" not in p


def test_gap_fill_spine_is_broadcast(spark, sf_dir):
    """ext_gap_fill must never reshuffle the fact table for the
    densification: the calendar × key grid is built from broadcast-sized
    sides, so the only hash Exchanges allowed are the daily
    pre-aggregation and the per-key forward-fill window."""
    p = plan(spark, sf_dir, "ext_gap_fill")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # 1-row bounds x keys spine


def test_interval_join_shuffles_on_equi_key_only(spark, sf_dir):
    """ext_interval_join's contract: the self-join must be an equi-join
    on l_partkey (SMJ at scale) carrying the overlap predicate as a join
    condition — never a nested-loop over time buckets — and with
    auto-broadcast off, no side of the big self-join may broadcast."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_interval_join")
    assert "SortMergeJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the equi key is partkey; the band predicate rides along as a
    # join condition, not a post-join filter of an exploded product
    m = re.search(r"Left keys \[1\]: \[l_partkey", p)
    assert m, p[:2000]


def test_graph_triangles_no_unbounded_broadcast(spark, sf_dir):
    """The triangle census joins edge/degree relations that all grow
    with the graph: with auto-broadcast disabled nothing may remain
    hint-broadcast except metadata-sized scalar combiners (the final
    1-row totals × 1-row count join)."""
    p = plan_no_auto_broadcast(spark, sf_dir, "ext_graph_triangles")
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" not in p, (
        "edge/degree joins must shuffle, not broadcast"
    )


def test_corr_matrix_single_aggregate_pass(spark, sf_dir):
    """All six Pearson coefficients must come from ONE aggregation over
    one scan: exactly one pair of partial/final HashAggregate (or
    SortAggregate for corr's imperative agg) and one scan of lineitem."""
    import re

    p = plan(spark, sf_dir, "ext_corr_matrix")
    # formatted explain lists each node twice (tree + detail): count the
    # numbered detail headers, which are unique per physical node
    scans = len(re.findall(r"\(\d+\) Scan parquet", p))
    assert scans == 1, f"expected one lineitem scan, got {scans}\n{p[:1500]}"
    # corr is a DeclarativeAggregate: partial + final = 2 aggregate nodes
    aggs = len(re.findall(r"\(\d+\) (?:Hash|Sort|ObjectHash)Aggregate", p))
    assert aggs == 2, f"expected partial+final aggregate, got {aggs}\n{p[:1500]}"


def test_dbscan_grid_single_data_pass(spark, sf_dir):
    """ext_dbscan_grid's scale contract: lineitem is scanned ONCE (the
    grid aggregate); density filter, adjacency and labeling all run on
    the checkpointed cell relation, which is bounded by grid resolution,
    not row count."""
    import re

    p = plan(spark, sf_dir, "ext_dbscan_grid")
    scans = len(re.findall(r"\(\d+\) Scan parquet", p))
    assert scans == 0, (
        f"post-checkpoint plan must read NO parquet (cells are "
        f"materialized), got {scans} scans\n{p[:1500]}"
    )
    assert "Scan ExistingRDD" in p or "LocalTableScan" in p, p[:1500]


def test_window_yoy_single_window_exchange(spark, sf_dir):
    """ext_window_yoy's scale contract: the three window families run
    over ONE window Exchange — the per-(prio, year) rank spec's
    partition keys are a superset of the month spec's ``prio``, so
    Catalyst must satisfy it with the existing hash partitioning and a
    re-sort, never a second shuffle. Two Exchanges total: the monthly
    groupBy and the window partitioning."""
    import re

    p = plan(spark, sf_dir, "ext_window_yoy")
    exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    assert exchanges == 2, f"expected agg+window exchanges, got {exchanges}\n{p[:1500]}"
    windows = len(re.findall(r"\(\d+\) Window", p))
    assert windows == 2, f"expected two Window nodes, got {windows}\n{p[:1500]}"


def test_bloom_filter_join_prunes_probe_side(spark, sf_dir):
    """Runtime Bloom-filter join reduction inside a scoped conf window:
    the selective orders side must inject might_contain onto the
    lineitem probe side (rows dropped before the shuffle), the result
    must equal the plain join, and the scope must restore the session's
    planning confs on exit."""
    from component_iceberg_spark.io.tables import load_table
    from component_iceberg_spark.session import bloom_filter_joins
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    join = lambda: li.join(o, li.l_orderkey == o.o_orderkey)  # noqa: E731

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with bloom_filter_joins(spark):
        j = join()
        p = j._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            j._jdf.queryExecution(), "formatted"
        )
        assert "might_contain" in p, p[:1500]
        assert "bloom_filter_agg" in p, p[:1500]
        n_bloom = j.count()
    # scope restored: broadcast threshold back, bloom thresholds back to
    # cluster-scale defaults → no injection outside the window
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    j2 = join()
    p2 = j2._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        j2._jdf.queryExecution(), "formatted"
    )
    assert "might_contain" not in p2
    assert n_bloom == j2.count()


def test_histogram_empty_and_null_inputs(spark):
    """equi_width_histogram must not crash when the bounds aggregate
    returns NULL: empty input → empty result; all-NULL input → one
    NULL-bin row (mirroring the SQL bin expression's NULL arithmetic);
    NULLs beside a constant column keep their NULL bin, never bin 0."""
    from component_iceberg_spark.plans.queries_functions import (
        equi_width_histogram,
    )

    empty = spark.createDataFrame([], schema="x double")
    assert equi_width_histogram(empty, "x", 20).collect() == []

    nulls = spark.createDataFrame([(None,)] * 3, schema="x double")
    out = equi_width_histogram(nulls, "x", 20).collect()
    assert len(out) == 1
    assert (out[0]["bin"], out[0]["n"], out[0]["total"]) == (None, 3, None)

    mixed = spark.createDataFrame(
        [(5.0,), (5.0,), (None,)], schema="x double"
    )
    got = {
        r["bin"]: (r["n"], r["total"])
        for r in equi_width_histogram(mixed, "x", 20).collect()
    }
    assert got == {0: (2, 10.0), None: (1, None)}

    # NON-degenerate range + NULL: least() skips nulls, so an unguarded
    # else branch would drop the NULL row into the TOP bin (19) — it
    # must keep its NULL bin here exactly as in the constant branch
    spread = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], schema="x double"
    )
    got = {
        r["bin"]: (r["n"], r["total"])
        for r in equi_width_histogram(spread, "x", 20).collect()
    }
    assert got == {0: (1, 1.0), 19: (1, 2.0), None: (1, None)}


def test_skyline_window_runs_on_collapsed_relation(spark, sf_dir):
    """ext_skyline's scale contract: the corpus-sized relation sees ONE
    hash-aggregate shuffle; the (single-partition) running-max window
    runs only on the price-collapsed staircase relation, and the
    frontier joins back via a CODED broadcast hint — no all-pairs join,
    no window over the raw table."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_skyline")
    assert "BroadcastHashJoin" in p, p[:1500]
    assert "Cartesian" not in p
    # the Window's input must be the aggregated relation: exactly one
    # Window node, fed by the HashAggregate, never by a raw parquet scan
    windows = len(re.findall(r"\(\d+\) Window", p))
    assert windows == 1, f"expected one Window node, got {windows}"
    # one corpus shuffle (partial+final agg pair) + the window's
    # SinglePartition exchange on the collapsed relation
    assert "SinglePartition" in p


def test_regression_ols_cross_checked_against_duckdb_regr(oracle_con):
    """ext_regression_ols' closed-form moments vs DuckDB's native
    regr_slope/regr_intercept/regr_r2 (a fully independent
    implementation) — tolerance 1e-6 on a double-precision statistic."""
    ours = oracle_con.execute(REGISTRY["ext_regression_ols"].oracle).fetchall()
    theirs = {
        r[0]: r[1:]
        for r in oracle_con.execute(
            """
            SELECT p_brand,
                   regr_slope(p_retailprice, p_size) AS slope,
                   regr_intercept(p_retailprice, p_size) AS intercept,
                   regr_r2(p_retailprice, p_size) AS r2
            FROM part
            WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
            GROUP BY 1
            """
        ).fetchall()
    }
    assert len(ours) == len(theirs) > 0
    for brand, _n, slope, intercept, r2 in ours:
        ds, di, dr = theirs[brand]
        assert abs(slope - ds) < 1e-6, (brand, slope, ds)
        assert abs(intercept - di) < 1e-4, (brand, intercept, di)
        assert abs(r2 - dr) < 1e-6, (brand, r2, dr)


def test_dq_expectations_single_pass(spark, sf_dir):
    """ext_dq_expectations' cost contract: all N rules ride ONE scan and
    ONE aggregate shuffle — rule count widens the aggregate, never adds
    passes. A per-rule subquery shape would show N scans here."""
    import re

    p = plan(spark, sf_dir, "ext_dq_expectations")
    scans = len(re.findall(r"\(\d+\) Scan parquet", p))
    exchanges = len(re.findall(r"\(\d+\) Exchange", p))
    assert scans == 1, f"expected one lineitem scan, got {scans}"
    assert exchanges == 1, f"expected the single-row agg exchange, got {exchanges}"
    assert "BatchEvalPython" not in p


def test_token_budget_single_source_exchange(spark, sf_dir):
    """pipeline_token_budget: the window and the final per-source
    summary share ONE hash partitioning on source — Catalyst must not
    re-shuffle between them. One scan, one Exchange, one Window."""
    import re

    p = plan(spark, sf_dir, "pipeline_token_budget")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, p[:1500]
    assert len(re.findall(r"\(\d+\) Window", p)) == 1


def test_token_budget_scalable_sorts_only_crossing_bucket(spark, sf_dir):
    """pipeline_token_budget_scalable: the corpus-sized relation must
    never hit a per-source full Window sort — every Window in the plan
    runs AFTER the join against the broadcast crossing-bucket metadata
    (its input is ~n/256 rows), and the hot/crossing relations arrive as
    BroadcastExchanges. The greedy twin's plan (one Window over the raw
    scan) must NOT reappear here."""
    p = plan(spark, sf_dir, "pipeline_token_budget_scalable")
    assert "BroadcastExchange" in p
    # whole buckets are kept via a LeftSemi against broadcast metadata,
    # and the crossing-bucket rows reach their cumsum Window only through
    # a broadcast join on (g, bk) — the reduction that shrinks the sort
    assert "LeftSemi" in p
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p


def test_profile_approx_plan_has_no_expand(spark, sf_dir):
    """Neither profile twin may replicate the corpus: the HLL twin plans
    ONE aggregate pass with no Expand (its reason to exist), and the
    exact twin's r16 unpivot rewrite replaced its historical Expand
    (count(DISTINCT)-lane rewrite copied every row 7x) with typed-lane
    rows + a two-level aggregate — an Expand reappearing in EITHER plan
    is the regression being pinned. The exact twin pays for exactness
    with extra aggregate levels, so the sketch twin must still plan
    fewer exchanges."""
    p_exact = plan(spark, sf_dir, "ext_profile_columns")
    p_approx = plan(spark, sf_dir, "ext_profile_columns_approx")
    assert "Expand" not in p_exact  # r16 unpivot rewrite
    assert "Expand" not in p_approx
    assert p_approx.count("Exchange") < p_exact.count("Exchange")


def test_spatial_salted_broadcasts_hot_cells(spark, sf_dir):
    """ext_spatial_grid_join_salted: the hot-cell list must reach both
    sides as a BroadcastExchange (cells, not points) and the candidate
    join must stay a single hash-partitioned equi-join on the salted
    cell key — no SortMergeJoin, no cartesian."""
    p = plan(spark, sf_dir, "ext_spatial_grid_join_salted")
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_regression_ols_survives_int64_moment_overflow(spark, monkeypatch):
    """20k rows at max-cents prices: n*syy ≈ (2e4)² · 4.4e10 ≈ 1.8e19
    exceeds int64 (9.2e18) — the 128-bit moment lanes must keep the
    statistics exact where bigint lanes would silently wrap. Verified
    against numpy's float64 least squares."""
    import numpy as np
    from pyspark.sql import functions as F

    import component_iceberg_spark.plans.queries_analytics as QA

    n = 20_000
    rng = np.random.default_rng(7)
    size = rng.integers(1, 51, n)
    price = np.round(180_000.0 + 900.0 * size + rng.integers(0, 40_000, n), 2)
    df = spark.createDataFrame(
        [("B", int(s), float(p)) for s, p in zip(size, price)],
        "p_brand string, p_size int, p_retailprice double",
    )
    # sanity: this fixture really does overflow an int64 syy lane
    syy = int((np.round(price * 100).astype(object) ** 2).sum()) * n
    assert syy > 2**63 - 1
    monkeypatch.setattr(QA, "load_table", lambda s, d, t: df)
    got = QA.ext_regression_ols(spark, "ignored").collect()[0]
    slope, intercept = np.polyfit(size, price, 1)
    assert abs(got["slope"] - slope) < 1e-4, (got["slope"], slope)
    assert abs(got["intercept"] - intercept) < 1e-2
    assert 0.0 < got["r2"] <= 1.0


def test_active_users_trailing_no_fact_window(spark, sf_dir):
    """ext_active_users_trailing must NOT window or range-join the fact
    table: the rolling COUNT DISTINCT is re-expressed as pair dedup → a
    bounded 7× Generate → per-day count. The plan shows exactly one
    Generate (the day fan-out, placed AFTER the dedup), zero Window
    nodes, and map-side partial aggregation."""
    import re

    p = plan(spark, sf_dir, "ext_active_users_trailing")
    assert len(re.findall(r"\(\d+\) Generate", p)) == 1
    assert not re.search(r"\(\d+\) Window", p), "no window over the fact table"
    assert "partial_count" in p or "partial_" in p


def test_multipass_join_discipline(spark, sf_dir):
    """ext_join_multipass (TPC-DS q64 idiom): two year passes, each a
    6-relation join chain. Discipline: each pass's o_orderdate range is
    PUSHED into its own orders scan (partition-prunable at scale — each
    pass reads one year, never the whole fact); exactly the 4 bounded
    nation broadcasts survive with auto-broadcast off (2 aliases × 2
    passes); every growing-side join (orders/customer/supplier/part per
    pass + the cross-year self-join on the aggregate) plans sort-merge;
    the per-year aggregate combines map-side before its shuffle."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_join_multipass")
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 4, (
        "exactly the bounded nation dims broadcast (2 aliases x 2 passes)"
    )
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 9, (
        "4 growing-side joins per pass + the cross-year self-join"
    )
    pushed = [
        ln for ln in p.splitlines() if "PushedFilters:" in ln and "o_orderdate" in ln
    ]
    assert len(pushed) == 2, "each year pass pushes its own date range"
    assert any("1995-01-01" in ln and "1996-01-01" in ln for ln in pushed)
    assert any("1996-01-01" in ln and "1997-01-01" in ln for ln in pushed)
    assert "partial_sum" in p, "per-year aggregate combines map-side"


def test_multiband_single_scan(spark, sf_dir):
    """ext_multiband_counts (TPC-DS q88 idiom): all 8 time bands are
    conditional-sum lanes in ONE aggregate over ONE events scan — never
    a scan or join per band. The only exchange is the SinglePartition
    final-aggregate shuffle, whose input is the map-side partial states
    (17 lanes per task), not fact rows."""
    import re

    p = plan(spark, sf_dir, "ext_multiband_counts")
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1, "one scan only"
    assert not re.search(r"\(\d+\) \w*Join", p), "no join — lanes, not subqueries"
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "SinglePartition" in p
    assert "partial_sum" in p or "partial_count" in p


def test_intersect_join_single_pass(spark, sf_dir):
    """ext_intersect_join (TPC-DS q14 idiom): the two-channel set
    intersection must fold into the ONE grouped fact pass as presence
    lanes — never an Intersect node or a second lineitem scan — and the
    date range must push into the scan. All three joins (orders,
    customer, part) are growing-side and stay declarative."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_intersect_join")
    li_scans = [
        ln for ln in p.splitlines() if "Location" in ln and "lineitem" in ln
    ]
    assert len(li_scans) == 1, "one fact pass only"
    assert not re.search(r"\(\d+\) \w*Intersect", p), "no set-op node"
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 3
    assert "BroadcastHashJoin" not in p, "no growing side is hint-broadcast"
    pushed = [
        ln for ln in p.splitlines() if "PushedFilters:" in ln and "o_orderdate" in ln
    ]
    assert len(pushed) == 1, "the quarter range pushes into the orders scan"
    assert "partial_sum" in p


def test_frequent_best_two_fact_passes(spark, sf_dir):
    """ext_frequent_best_readout (TPC-DS q23 idiom): the two discovery
    CTEs (frequent items + best customers) must fuse into ONE fact pass
    via grouping sets, and the whole query costs exactly TWO fact
    passes. Pinned in two plans: the discovery relation (1 lineitem
    scan + 1 Expand, group-bounded exchange) and the registered query
    (1 lineitem scan — the readout; the checkpointed discovery
    contributes zero parquet scans downstream, the ext_dbscan_grid
    discipline), with no Intersect anywhere, pushed date ranges, and
    the only broadcast under no-auto-broadcast the 1-row spend max."""
    import re

    from component_iceberg_spark.plans.queries_relational import (
        _q23_discovery,
    )
    from tests.conftest import plan_formatted

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pd_ = plan_formatted(_q23_discovery(spark, sf_dir))
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert (
        len([ln for ln in pd_.splitlines() if "Location" in ln and "lineitem" in ln])
        == 1
    ), "both discovery grains from ONE fact scan"
    assert len(re.findall(r"\(\d+\) Expand", pd_)) == 1
    assert "partial_count" in pd_ or "partial_sum" in pd_

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_frequent_best_readout")
    li_scans = [
        ln for ln in p.splitlines() if "Location" in ln and "lineitem" in ln
    ]
    assert len(li_scans) == 1, (
        "readout is the only fact scan in the serving plan — discovery "
        "is checkpointed, never re-derived per consumer"
    )
    assert not re.search(r"\(\d+\) Expand", p), "no re-derived discovery"
    assert not re.search(r"\(\d+\) \w*Intersect", p), "no set-op node"
    pushed = [
        ln
        for ln in p.splitlines()
        if "PushedFilters:" in ln and "o_orderdate" in ln
    ]
    assert len(pushed) == 1, "the readout range pushes into the orders scan"
    # the 1-row max is the only broadcast; every other join declarative
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", p)) == 1
    assert "BroadcastHashJoin" not in p


def test_partitions_meta_pushdown(spark, sf_dir, tmp_path):
    """snap_partitions_meta's claim is METADATA-ONLY partition stats:
    the per-dir scan must carry PushedAggregation (COUNT/MIN/MAX from
    parquet footers) and PushedGroupBy (partition values from hive
    paths) — no data-column pages. Pinned on the inner pushdown frame
    inside the conf scope (pushdown is a physical-planning decision, so
    the scope must cover the explain)."""
    from pyspark.sql import functions as F

    from component_iceberg_spark.io.snaptable import SnapCatalog
    from component_iceberg_spark.io.tables import load_table
    from component_iceberg_spark.session import scoped_conf
    from tests.conftest import plan_formatted

    cat = SnapCatalog(str(tmp_path / "wh"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    cat.create_or_replace(
        "ns", "t", o, partition_by=["o_orderpriority"]
    )
    m = cat._manifest("ns", "t", cat._current_sid("ns", "t"))
    with scoped_conf(
        spark,
        **{
            "spark.sql.sources.useV1SourceList": "",
            "spark.sql.parquet.aggregatePushdown": "true",
        },
    ):
        inner = cat._partitions_pushdown_df(
            spark, "ns", "t", m["files"][0], ["o_orderpriority"],
            ("o_orderkey",),
        )
        p = plan_formatted(inner)
    assert "PushedAggregation: [COUNT(*), MIN(o_orderkey), MAX(o_orderkey)]" in p
    assert "PushedGroupBy: [o_orderpriority]" in p
    # and the public method agrees with a full-scan group-by
    got = {
        tuple(r)
        for r in cat.partitions(
            spark, "ns", "t", stat_cols=("o_orderkey",)
        ).collect()
    }
    want = {
        tuple(r)
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_o_orderkey"),
            F.max("o_orderkey").alias("max_o_orderkey"),
        )
        .collect()
    }
    assert got == want
    # unpartitioned tables are refused (files() is the right surface)
    import pytest

    cat.create_or_replace("ns", "flat", o)
    with pytest.raises(ValueError, match="not hive-partitioned"):
        cat.partitions(spark, "ns", "flat")


def test_multipass_fused_single_pass(spark, sf_dir):
    """ext_join_multipass_fused: the cross-year comparison folded into
    per-year lanes must plan ONE lineitem scan with no self-join — the
    join chain runs once (4 growing-side SMJs + the 2 nation broadcasts),
    and the 2-year range pushes into the orders scan."""
    import re

    p = plan_no_auto_broadcast(spark, sf_dir, "ext_join_multipass_fused")
    li_scans = [
        ln for ln in p.splitlines() if "Location" in ln and "lineitem" in ln
    ]
    assert len(li_scans) == 1, "one fact pass only"
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", p)) == 2
    assert len(re.findall(r"\(\d+\) SortMergeJoin", p)) == 4, "no self-join"
    pushed = [
        ln for ln in p.splitlines() if "PushedFilters:" in ln and "o_orderdate" in ln
    ]
    assert len(pushed) == 1
    assert "1995-01-01" in pushed[0] and "1997-01-01" in pushed[0]
    assert "partial_sum" in p


def test_interpolate_single_window_no_shuffle_join(spark, sf_dir):
    """ext_interpolate_linear's plan contract: the calendar×keys spine
    reaches the fact-daily relation through BROADCAST joins only (the
    spine is metadata-sized by construction), and all four anchor
    columns — prev/next day and value — come out of ONE fused Window
    node over one sort (both frame specs share the (key, day) ordering),
    so the whole interpolation costs one keyed exchange regardless of
    gap length."""
    import re

    from component_iceberg_spark.plans import load_all
    from tests.conftest import plan_formatted

    df = load_all()["ext_interpolate_linear"].fn(spark, sf_dir)
    p = plan_formatted(df)
    detail_nodes = re.findall(r"^\(\d+\) (\w[\w ]*\w)", p, re.M)
    assert detail_nodes.count("Window") == 1, detail_nodes
    assert "SortMergeJoin" not in p
    assert any("BroadcastExchange" in n for n in detail_nodes), detail_nodes


def test_pattern_negation_semantics(spark, tmp_path):
    """ext_pattern_negation's rule on a crafted fixture: view→purchase
    qualifies; view→click→purchase does NOT (the click intervenes); a
    click at the SAME timestamp as the view does not intervene
    (tie rule: click_ts <= view_ts); a purchase with no prior view
    never qualifies; a later view after an old click re-qualifies."""
    import os

    from pyspark.sql import functions as F

    from component_iceberg_spark.plans import load_all

    rows = [
        # u1: view -> purchase  => qualifies
        (1, 1, "view", "2024-01-01 10:00:00", 1.0),
        (2, 1, "purchase", "2024-01-01 10:05:00", 1.0),
        # u2: view -> click -> purchase => click intervenes, no match
        (3, 2, "view", "2024-01-01 10:00:00", 1.0),
        (4, 2, "click", "2024-01-01 10:02:00", 1.0),
        (5, 2, "purchase", "2024-01-01 10:05:00", 1.0),
        # u3: click at the same ts as the view -> tie does not intervene
        (6, 3, "view", "2024-01-01 10:00:00", 1.0),
        (7, 3, "click", "2024-01-01 10:00:00", 1.0),
        (8, 3, "purchase", "2024-01-01 10:05:00", 1.0),
        # u4: purchase with no prior view -> never qualifies
        (9, 4, "click", "2024-01-01 10:00:00", 1.0),
        (10, 4, "purchase", "2024-01-01 10:05:00", 1.0),
        # u5: click, then a LATER view, then purchase -> re-qualifies
        (11, 5, "click", "2024-01-01 10:00:00", 1.0),
        (12, 5, "view", "2024-01-01 10:02:00", 1.0),
        (13, 5, "purchase", "2024-01-01 10:05:00", 1.0),
    ]
    df = spark.createDataFrame(
        [(e, u, t, ts, v) for e, u, t, ts, v in rows],
        "event_id long, user_id long, event_type string, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    d = str(tmp_path / "fixture")
    os.makedirs(d)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(d, "events.parquet")
    )
    out = load_all()["ext_pattern_negation"].fn(spark, d)
    got = sorted((r.user_id, r.purchase_id) for r in out.collect())
    assert got == [(1, 2), (3, 8), (5, 13)], got


def test_pattern_negation_one_scan_one_window(spark, sf_dir):
    """ext_pattern_negation's plan contract: ONE events scan, ZERO
    joins (both pattern anchors are conditional running-maxes, not
    self-joins), and ONE Window node over one keyed exchange — the
    pattern matcher costs exactly what sessionization costs."""
    import re

    from tests.conftest import plan_formatted

    p = plan_formatted(REGISTRY["ext_pattern_negation"].fn(spark, sf_dir))
    detail = re.findall(r"^\(\d+\) (\w[\w ]*\w)", p, re.M)
    assert detail.count("Scan parquet") == 1, detail
    assert not any("Join" in n for n in detail), detail
    assert detail.count("Window") == 1, detail
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, detail


def test_no_strippable_asserts_in_query_modules():
    """Gate-query self-checks must use the ValueError discipline, not
    bare ``assert`` — ``python -O`` strips asserts, silently removing a
    registered query's scenario self-evidence. One grep-able contract
    over every plans/ module (VERDICT r11 #4)."""
    import glob
    import os
    import re

    import component_iceberg_spark.plans as plans_pkg

    plans_dir = os.path.dirname(plans_pkg.__file__)
    offenders = []
    for path in sorted(glob.glob(os.path.join(plans_dir, "*.py"))):
        with open(path) as f:
            for i, line in enumerate(f, 1):
                if re.match(r"\s+assert\s", line):
                    offenders.append(f"{os.path.basename(path)}:{i}")
    assert not offenders, f"bare asserts in query modules: {offenders}"


def test_funnel_negation_semantics(spark, tmp_path):
    """ext_funnel_negation on a crafted fixture — every per-step
    negation and anchor rule exercised:
      u1 signup,view,purchase                 -> match (clean chain)
      u2 signup,error,view,purchase           -> no match (error voids view)
      u3 signup,view,click,purchase           -> no match (click voids purchase)
      u4 signup,error,signup,view,purchase    -> match (re-signup resets error)
      u5 view,purchase                        -> no match (no signup anchor)
      u6 signup,view,click,view,purchase      -> match (later view re-anchors)
      u7 signup,view,error,purchase           -> match (error after the view
                                                 guards only the view step)"""
    import datetime as dt

    from component_iceberg_spark.operators.analytics import (
        pattern_funnel_negation,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0

    def ev(u, k, typ):
        nonlocal eid
        eid += 1
        rows.append((eid, t0 + dt.timedelta(minutes=k), u, typ))

    for u, seq in {
        1: ["signup", "view", "purchase"],
        2: ["signup", "error", "view", "purchase"],
        3: ["signup", "view", "click", "purchase"],
        4: ["signup", "error", "signup", "view", "purchase"],
        5: ["view", "purchase"],
        6: ["signup", "view", "click", "view", "purchase"],
        7: ["signup", "view", "error", "purchase"],
    }.items():
        for k, typ in enumerate(seq):
            ev(u, k, typ)
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = pattern_funnel_negation(
        df, "user_id", "ts", "event_type",
        [("signup", None), ("view", "error"), ("purchase", "click")],
    )
    got = sorted(r.user_id for r in out.collect())
    assert got == [1, 4, 6, 7], got
    # anchor is the most recent QUALIFIED view
    anchors = {r.user_id: r.anchor_ts for r in out.collect()}
    assert anchors[6] == t0 + dt.timedelta(minutes=3)


def test_funnel_negation_one_exchange_k_windows(spark, sf_dir):
    """The k-step composition claim (VERDICT r11 #5): pattern DEPTH adds
    Window nodes, never shuffles — 3 steps plan as ONE scan, ZERO joins,
    ONE Exchange, ONE Sort, and exactly TWO chained Window nodes (all
    negation maxes fold into the first; each later step adds one)."""
    import re

    from tests.conftest import plan_formatted

    p = plan_formatted(REGISTRY["ext_funnel_negation"].fn(spark, sf_dir))
    detail = re.findall(r"^\(\d+\) (\w[\w ]*\w)", p, re.M)
    assert detail.count("Scan parquet") == 1, detail
    assert not any("Join" in n for n in detail), detail
    assert detail.count("Window") == 2, detail
    assert detail.count("Sort") == 1, detail
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1, detail
