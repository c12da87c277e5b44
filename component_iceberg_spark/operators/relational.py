"""Relational extension operators (SURVEY §2.5).

The reference delegates all relational work to DuckDB; this engine expresses
the same class of work natively on DataFrames so Catalyst plans it:

- Aggregations: hash aggregate with map-side partial aggregation (the
  shuffle carries one row per (partition, group), not per input row).
- Joins: Catalyst picks broadcast vs sort-merge; dimension tables below
  ``spark.sql.autoBroadcastJoinThreshold`` never shuffle the fact side.
  AQE converts to broadcast at runtime when a filtered side turns out small
  and splits skewed partitions.
- Top-k: ``orderBy(...).limit(k)`` plans TakeOrderedAndProject — a per-
  partition bounded heap + single driver merge, never a global sort.
- Top-k per group: window ``row_number`` over one shuffle by the group key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """Global top-k. Physical plan is TakeOrderedAndProject: O(k) memory per
    partition, no global sort — survives any scale as long as k is small."""
    return df.orderBy(*order_by).limit(k)


def topk_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column], k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k per group via ranking window. One shuffle on the group key;
    skewed groups are handled by AQE skew-join/partition splitting."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Total-order ranking without a single-partition sort.

    Range-partition on the order columns, rank within each partition, then
    add per-partition offsets (a metadata-sized driver aggregation — the
    DataFrame analogue of RDD ``zipWithIndex``). The order must be total
    (include a unique tiebreak column) so results are independent of the
    sampled range boundaries. Cached between the offset job and the final
    job because range partitioning re-samples otherwise.

    ``total_col`` optionally attaches the total row count as a literal
    column — the offset pass already summed it, so consumers needing
    rank/total arithmetic (equi-depth binning, percentiles) avoid a
    second full scan.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    parted = (
        df.repartitionByRange(n, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = sorted(
        (r["_pid"], r["cnt"])
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    )
    offsets, acc = {}, 0
    for pid, cnt in counts:
        offsets[pid] = acc
        acc += cnt
    mapping = F.create_map(
        *[F.lit(x) for pid_off in offsets.items() for x in pid_off]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parted.withColumn(
            rank_col,
            (F.row_number().over(w) + F.coalesce(mapping[F.col("_pid")], F.lit(0))).cast(
                "long"
            ),
        )
        .drop("_pid")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.lit(acc).cast("long"))
    return out


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap: str = "INTERVAL 30 MINUTES",
) -> DataFrame:
    """Gap-based sessionization (lag + cumulative sum of session starts).

    Single shuffle on ``user_col``; both windows share the same
    partitioning so Catalyst plans one Exchange. The streaming twin is
    ``session_window``/``applyInPandasWithState`` in
    :mod:`component_iceberg_spark.streaming`.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = F.when(
        prev.isNull() | (F.col(ts_col) > prev + F.expr(gap)), F.lit(1)
    ).otherwise(F.lit(0))
    df = df.withColumn("_new_sess", new_sess)
    df = df.withColumn(
        "session_id",
        F.sum("_new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        df.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def flatten_hierarchy(
    edges: DataFrame,
    child_col: str,
    parent_col: str,
    max_iter: int = 20,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Flatten a parent-pointer hierarchy to ``(node, root, depth)`` —
    the recursive-CTE shape (org charts, BOM explosion, category trees)
    Spark SQL lacks, expressed as pointer-doubling: each round joins the
    state with itself (``ptr → ptr's ptr``, accumulating the hop count),
    so a depth-d tree converges in O(log d) rounds, not d — 1 B nodes at
    depth 30 is 5 keyed self-joins, each one shuffle on the pointer key.

    A node's initial pointer is its parent (itself for roots, hop 0);
    once a pointer reaches a root it is absorbed (root.ptr = root, hop 0),
    so ``depth`` converges to the full root distance. Convergence is
    detected from the hop-count SUM — non-decreasing and bounded, it is
    stable exactly at fixpoint and costs one metadata-sized driver value
    per round (same discipline as dedup.connected_components: per-round
    persist, previous round unpersisted, lineage kept flat).

    Assumes a forest (each child one parent, no cycles); ``max_iter``
    bounds the loop under cycle-corrupted input — 2^20 depth exceeds any
    real hierarchy. ``nodes`` (one column, the node ids) REPLACES the
    node universe: output rows are exactly the given nodes — isolated
    ones become their own roots at depth 0, and a node whose parent
    chain LEAVES the universe stops at the first outside ancestor (that
    ancestor has no state row, so the left self-join below carries the
    pointer unchanged — an inner join would silently DROP such nodes).
    When omitted the universe is the edge endpoints."""
    e = edges.select(
        F.col(child_col).alias("node"), F.col(parent_col).alias("parent")
    )
    if nodes is None:
        nodes = (
            e.select("node")
            .union(e.select(F.col("parent").alias("node")))
            .distinct()
        )
    else:
        nodes = nodes.toDF("node")
    # localCheckpoint, not persist: each doubling round self-joins the
    # state, so a persisted-but-not-cut lineage SQUARES per round (the
    # audit measured 170 Exchanges in the final plan before the cut; with
    # the checkpoint it is one join's worth). Same discipline as
    # dedup.connected_components.
    state = (
        nodes.join(e, "node", "left")
        .select(
            "node",
            F.coalesce("parent", F.col("node")).alias("ptr"),
            F.when(F.col("parent").isNotNull(), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("d"),
        )
        .localCheckpoint(eager=True)
    )
    prev_sum = state.agg(F.sum("d")).collect()[0][0] or 0
    for _ in range(max_iter):
        s, t = state.alias("s"), state.alias("t")
        state = (
            s.join(t, F.col("s.ptr") == F.col("t.node"), "left")
            .select(
                F.col("s.node").alias("node"),
                F.coalesce(F.col("t.ptr"), F.col("s.ptr")).alias("ptr"),
                (F.col("s.d") + F.coalesce(F.col("t.d"), F.lit(0))).alias(
                    "d"
                ),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = state.agg(F.sum("d")).collect()[0][0] or 0
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return state.select(
        "node", F.col("ptr").alias("root"), F.col("d").alias("depth")
    )


#: cut iterative-rank lineage every this many rounds — deep enough that
#: short fixed-iteration queries run as one lazy chain (no per-round
#: checkpoint job), shallow enough that long loops never build a plan
#: hundreds of joins deep
_CHECKPOINT_EVERY = 8


def pagerank_undirected(
    edges: DataFrame,
    src_col: str,
    dst_col: str,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over an undirected edge list (each edge walked both
    ways, so no dangling-mass correction is needed) → ``(node, rank)``
    after a FIXED number of power iterations — fixed, not
    convergence-tested, so an unrolled SQL oracle can replay the exact
    computation.

    The static (src, dst, src-degree) relation is built once and
    persisted; each iteration is one join of the node-sized rank vector
    against it plus one hash aggregate — the classic Spark iteration
    (what GraphX's Pregel does under the hood), shuffling only rank-
    vector-sized data per round. The rank vector is localCheckpoint'ed
    every ``_CHECKPOINT_EVERY`` iterations (r16, guide §1.2): lineage
    only needs cutting before the plan gets DEEP, but an eager
    checkpoint costs one job + a driver block-registration gap per
    round — at the default 3 iterations that was 4 of the run's jobs
    (r16 profile: 18 jobs, 1.4 s inter-job gaps). Short loops now run
    as ONE lazy chain over the persisted edge relation (the cache makes
    per-iteration reuse free inside a single action); long loops keep
    the flat-plan protection every few rounds."""
    from pyspark import StorageLevel

    from component_iceberg_spark.session import release_local_checkpoint

    und = edges.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
                ),
                F.struct(
                    F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst").persist(StorageLevel.MEMORY_AND_DISK)
    # und is persisted because TWO separate jobs otherwise recompute the
    # upstream edge derivation (often a join+distinct over fact tables):
    # the eager rank-init checkpoint below and iteration 1's
    # materialization of `ed` (r15 profile: the edge pipeline was the
    # dominant per-run cost, paid twice). Two narrow longs per edge, so
    # the cache is edge-sized — the same budget as `ed` itself.
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ed = und.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    r = deg.select(F.col("src").alias("node"), F.lit(1.0).alias("r"))
    checkpoints: list = []
    for i in range(1, iterations + 1):
        r = (
            ed.join(r, ed.src == r.node)
            .groupBy("dst")
            .agg(
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.sum(F.col("r") / F.col("d"))
                ).alias("r")
            )
            .select(F.col("dst").alias("node"), "r")
        )
        # cut lineage only when the chain is getting deep (never after
        # the LAST round — the consumer's action materializes it); each
        # new checkpoint supersedes the previous one, which is released
        # or each run would leak one cached RDD per cut for the life of
        # the session
        if i % _CHECKPOINT_EVERY == 0 and i < iterations:
            r = r.localCheckpoint(eager=True)
            if checkpoints:
                release_local_checkpoint(checkpoints.pop())
            checkpoints.append(r)
    # ONE eager materialization of the final vector (the returned
    # relation is node-sized, same retention as the r15 shape, which
    # also returned a checkpoint-backed vector) — it must land before
    # the edge caches are dropped, or the consumer's action would
    # recompute the whole chain uncached
    r = r.localCheckpoint(eager=True)
    if checkpoints:
        release_local_checkpoint(checkpoints.pop())
    ed.unpersist()
    und.unpersist()
    return r.select("node", F.round("r", 6).alias("rank"))


def triangle_stats(edges: DataFrame, u_col: str, v_col: str) -> DataFrame:
    """Global triangle census over an undirected edge list → one row
    ``(n_edges, n_wedges, n_triangles, clustering_coeff)``.

    Scale design: the compact-forward algorithm. Each edge is oriented
    from its lower-degree endpoint to the higher (ties by id), which
    bounds every node's OUT-degree by O(sqrt(m)) — so the wedge join
    (out-edges ⋈ out-edges on the pivot node) materializes O(m^1.5)
    candidate wedges worst-case instead of sum(deg²), and each triangle
    is produced exactly once. Closing the wedge is a semi-join shaped
    equi-join against the oriented edge set: three shuffles total
    (degree agg, wedge join, closing join), no driver-side state.
    Wedge COUNT (for the clustering coefficient) needs no join at all:
    sum over nodes of C(deg, 2) from the same degree aggregate.
    """
    e = edges.select(
        F.col(u_col).cast("long").alias("u"), F.col(v_col).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v"))
    # canonical undirected form (u < v), defensively deduped
    canon = e.select(
        F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
    ).distinct()
    und = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    # wedge count = sum C(d, 2); edges = sum(d) / 2 — one metadata-sized row
    totals = deg.agg(
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    # degree-ordered orientation: (deg, id) ascending from tail to head
    du = deg.select(F.col("a").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("a").alias("v"), F.col("d").alias("dv"))
    ranked = (
        canon.join(du, "u").join(dv, "v")
        .select(
            F.when(
                (F.col("du") < F.col("dv"))
                | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
                F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
            )
            .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
            .alias("o")
        )
        .select("o.s", "o.t")
    )
    # Pin the wedge self-join's exchange at the session shuffle width:
    # the wedge fan-out (sum of out-degree²) is invisible to AQE's
    # input-byte coalescing, which collapsed the CPU-dominant wedge
    # stage to a handful of tasks (r15 profile). Hash partitioning
    # survives the two projections below, so both wedge sides reuse this
    # one exchange; at cluster scale the conf is the tuned width.
    ranked = ranked.repartition(
        int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions")),
        "s",
    )
    w1 = ranked.select(F.col("s").alias("pivot"), F.col("t").alias("b"))
    w2 = ranked.select(F.col("s").alias("pivot"), F.col("t").alias("c"))
    wedges = w1.join(w2, "pivot").filter(F.col("b") < F.col("c"))
    # closing edge may be oriented either way; ranked holds one direction,
    # so join against its canonical (min, max) form
    closing = ranked.select(
        F.least("s", "t").alias("b"), F.greatest("s", "t").alias("c")
    )
    tri = (
        wedges.select(
            F.least("b", "c").alias("b"), F.greatest("b", "c").alias("c")
        )
        .join(closing, ["b", "c"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    # 1-row × 1-row scalar combine; the hint keeps it a broadcast join
    # even where auto-broadcast is disabled (plan-sweep contract)
    return totals.crossJoin(F.broadcast(tri)).select(
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("clustering_coeff"),
    )
