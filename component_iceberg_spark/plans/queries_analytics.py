"""Event-analytics + fuzzy-matching + collocation queries (round 5).

The reference serves this class of question only through hand-written SQL
in its custom-query mode (``ex-iceberg/src/component.py``: the query
passes through to DuckDB verbatim); here each shape is a first-class
operator with a pinned scale story:

- ``ext_funnel``        — ordered conversion funnel, ONE Exchange total.
- ``ext_cohort_retention`` — first-touch weekly cohorts.
- ``ext_gap_fill``      — calendar densification + forward fill; the
                          spine is broadcast-sized by construction.
- ``ext_fuzzy_join``    — threshold Jaccard self-join with lossless
                          prefix filtering (never all-pairs).
- ``text_collocations`` — corpus bigram PMI (pointwise mutual
                          information) collocation mining.
- ``pipeline_quality_buckets`` — curriculum deciles over the quality
                          classifier, ranked without a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.operators import analytics
from component_iceberg_spark.operators import relational
from component_iceberg_spark.operators import text as X
from component_iceberg_spark.operators.setjoin import jaccard_similarity_join
from component_iceberg_spark.plans.registry import register

_FUNNEL_STEPS = ["view", "click", "purchase"]

_FUNNEL_ORACLE = """
WITH w0 AS (
    SELECT user_id, ts, event_type,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t0
    FROM events
), w1 AS (
    SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0
                            AND ts <= t0 + INTERVAL 7 DAY THEN ts END)
                  OVER (PARTITION BY user_id) AS t1
    FROM w0
), w2 AS (
    SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1
                            AND ts <= t0 + INTERVAL 7 DAY THEN ts END)
                  OVER (PARTITION BY user_id) AS t2
    FROM w1
), per AS (
    SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
    FROM w2 GROUP BY user_id
), c AS (
    SELECT count(t0) AS c0, count(t1) AS c1, count(t2) AS c2 FROM per
)
SELECT CAST(0 AS INT) AS step_idx, 'view' AS step, c0 AS n_users,
       round(c0 * 1.0 / nullif(c0, 0), 6) AS conv_rate FROM c
UNION ALL
SELECT CAST(1 AS INT), 'click', c1, round(c1 * 1.0 / nullif(c0, 0), 6) FROM c
UNION ALL
SELECT CAST(2 AS INT), 'purchase', c2, round(c2 * 1.0 / nullif(c0, 0), 6) FROM c
"""


@register("ext_funnel", oracle=_FUNNEL_ORACLE, tags=("ext", "analytics"))
def ext_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step conversion funnel (view → click → purchase within 7
    days of the first view): every step time is a conditional window min
    over the SAME user partitioning, so the whole chain — any number of
    steps — costs one Exchange; the rollup to per-step counts is
    metadata-sized (operators/analytics.funnel). The reference would
    need correlated custom SQL for this (ex-iceberg custom query mode)."""
    ev = load_table(spark, sf_dir, "events")
    return analytics.funnel(ev, "user_id", "ts", "event_type", _FUNNEL_STEPS)


_COHORT_ORACLE = """
WITH first AS (
    SELECT user_id,
           CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), active AS (
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week,
                          CAST(date_trunc('week', e.ts) AS DATE)) // 7
                AS INT) AS week_offset,
           e.user_id
    FROM events e JOIN first f USING (user_id)
), agg AS (
    SELECT cohort_week, week_offset,
           count(DISTINCT user_id) AS n_active
    FROM active WHERE week_offset < 4
    GROUP BY cohort_week, week_offset
), sizes AS (
    SELECT cohort_week, count(DISTINCT user_id) AS cohort_size
    FROM first GROUP BY cohort_week
)
SELECT a.cohort_week, a.week_offset, a.n_active, s.cohort_size,
       round(a.n_active * 1.0 / s.cohort_size, 6) AS retention
FROM agg a JOIN sizes s USING (cohort_week)
"""


@register(
    "ext_cohort_retention", oracle=_COHORT_ORACLE, tags=("ext", "analytics")
)
def ext_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention (cohort = Monday week of first event;
    retained at offset k = any event in cohort week + k). Two shuffles —
    the first-touch agg and the (cohort, offset) distinct-count; the
    fact→cohort join rides the key partitioning the agg already created
    (operators/analytics.cohort_retention)."""
    ev = load_table(spark, sf_dir, "events")
    return analytics.cohort_retention(ev, "user_id", "ts", max_weeks=4)


_GAP_FILL_ORACLE = """
WITH bounds AS (
    SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
    FROM events
), cal AS (
    SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
    FROM bounds
), keys AS (
    SELECT DISTINCT event_type AS key FROM events
), daily AS (
    SELECT event_type AS key, CAST(ts AS DATE) AS day,
           count(*) AS n, round(sum(value), 2) AS vs,
           round(avg(value), 6) AS av
    FROM events GROUP BY 1, 2
)
SELECT k.key, c.day,
       coalesce(d.n, 0) AS n_events,
       coalesce(d.vs, 0.0) AS value_sum,
       last_value(d.av IGNORE NULLS) OVER (
           PARTITION BY k.key ORDER BY c.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS carried_avg
FROM cal c
CROSS JOIN keys k
LEFT JOIN daily d ON d.key = k.key AND d.day = c.day
"""


_PATTERN_NEG_ORACLE = """
WITH w AS (
    SELECT user_id, event_id, event_type, ts,
           max(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts) AS last_view_ts,
           max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts) AS last_click_ts
    FROM events
)
SELECT user_id, event_id AS purchase_id, ts AS purchase_ts, last_view_ts
FROM w
WHERE event_type = 'purchase'
  AND last_view_ts IS NOT NULL
  AND (last_click_ts IS NULL OR last_click_ts <= last_view_ts)
"""


@register(
    "ext_pattern_negation",
    oracle=_PATTERN_NEG_ORACLE,
    tags=("ext", "analytics", "window"),
)
def ext_pattern_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-pattern matching with NEGATION — the MATCH_RECOGNIZE shape
    (view ⇒ purchase with NO intervening click) that funnel step-counts
    cannot express: a purchase qualifies iff the user's most recent view
    is more recent than their most recent click at purchase time.
    Spark-first form: ONE keyed window Exchange serves both conditional
    running-max anchors over the default peer-inclusive RANGE frame —
    tie semantics are timestamp-set based (max over peers), so the
    result is deterministic without an event-id tiebreak and identical
    in both engines. No joins, no per-pattern state machine: at 100 TB
    the cost is the one exchange the sessionization family already
    pays."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    anchored = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        F.max(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).over(w).alias("last_view_ts"),
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts"))
        ).over(w).alias("last_click_ts"),
    )
    return anchored.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_view_ts").isNotNull()
        & (
            F.col("last_click_ts").isNull()
            | (F.col("last_click_ts") <= F.col("last_view_ts"))
        )
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        "last_view_ts",
    )


_FUNNEL_NEG_ORACLE = """
WITH w1 AS (
    SELECT user_id, event_id, event_type, ts,
           max(CASE WHEN event_type = 'signup' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts) AS q0,
           max(CASE WHEN event_type = 'error' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts) AS last_error_ts,
           max(CASE WHEN event_type = 'click' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts) AS last_click_ts
    FROM events
), w2 AS (
    SELECT *,
           max(CASE WHEN event_type = 'view' AND q0 IS NOT NULL
                         AND (last_error_ts IS NULL OR last_error_ts <= q0)
                    THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts) AS q1
    FROM w1
)
SELECT user_id, event_id AS match_id, ts AS match_ts, q1 AS anchor_ts
FROM w2
WHERE event_type = 'purchase'
  AND q1 IS NOT NULL
  AND (last_click_ts IS NULL OR last_click_ts <= q1)
"""


@register(
    "ext_funnel_negation",
    oracle=_FUNNEL_NEG_ORACLE,
    tags=("ext", "analytics", "window"),
)
def ext_funnel_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-STEP ordered funnel with PER-STEP negation — signup ⇒ view
    (no intervening error) ⇒ purchase (no intervening click): the
    MATCH_RECOGNIZE generalization of ``ext_pattern_negation``'s single
    negation (VERDICT r11 #5), proving the conditional-running-max-anchor
    idiom COMPOSES: each later step consumes the previous step's
    qualified anchor, all negation maxes compute in the first window
    pass, and the whole k-step chain shares one user-keyed Exchange and
    one Sort — pattern depth adds Window nodes, never shuffles. At
    100 TB a 5-step pattern costs exactly what sessionization costs.
    Operator: operators/analytics.pattern_funnel_negation; semantics on
    a crafted fixture and the one-exchange plan are pinned in
    tests/test_plans.py."""
    ev = load_table(spark, sf_dir, "events")
    return analytics.pattern_funnel_negation(
        ev, "user_id", "ts", "event_type",
        [("signup", None), ("view", "error"), ("purchase", "click")],
    )


_INTERP_ORACLE = """
WITH src AS (
    SELECT event_type, ts, value FROM events
    WHERE date_part('day', ts) % 3 <> 0
), bounds AS (
    SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
    FROM src
), cal AS (
    SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
           AS day
    FROM bounds
), keys AS (
    SELECT DISTINCT event_type AS key FROM src
), daily AS (
    SELECT event_type AS key, CAST(ts AS DATE) AS day,
           round(avg(value), 6) AS av
    FROM src GROUP BY 1, 2
), g AS (
    SELECT k.key, c.day, d.av
    FROM cal c CROSS JOIN keys k
    LEFT JOIN daily d ON d.key = k.key AND d.day = c.day
), a AS (
    SELECT key, day, av,
           last_value(CASE WHEN av IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY key ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
           last_value(av IGNORE NULLS)
               OVER (PARTITION BY key ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           first_value(CASE WHEN av IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY key ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd,
           first_value(av IGNORE NULLS)
               OVER (PARTITION BY key ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
    FROM g
)
SELECT key, day, av AS observed_avg,
       CAST(floor(
           (CASE WHEN av IS NOT NULL THEN av
                 WHEN pd IS NOT NULL AND nd IS NOT NULL THEN
                     pv + (nv - pv) * (CAST(day - pd AS DOUBLE)
                                       / CAST(nd - pd AS DOUBLE))
            END) * 1000000.0 + 0.5) AS BIGINT) AS interp_micro
FROM a
"""


@register(
    "ext_interpolate_linear", oracle=_INTERP_ORACLE, tags=("ext", "analytics")
)
def ext_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation over the daily series — the time-series
    treatment forward fill cannot express (``prev + (next−prev)·Δ/span``
    on interior gaps, NULL outside the anchors). Every third calendar
    day is removed from the input so interior gaps exist at every SF and
    the interpolation path is genuinely exercised. Spine is
    broadcast-sized, one window Exchange per key serves all four anchors
    (operators/analytics.interpolate_linear_daily); micro-unit integer
    output per the repo's half-boundary contract."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.dayofmonth("ts") % 3 != 0
    )
    return analytics.interpolate_linear_daily(ev, "event_type", "ts", "value")


@register("ext_gap_fill", oracle=_GAP_FILL_ORACLE, tags=("ext", "analytics"))
def ext_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with zero-fill + forward-filled daily mean: the
    calendar spine comes from a 1-row bound aggregate × the distinct-key
    dim (both broadcast-sized), so densification never reshuffles the
    fact table; forward fill is last(ignorenulls) per key
    (operators/analytics.gap_fill_daily)."""
    ev = load_table(spark, sf_dir, "events")
    return analytics.gap_fill_daily(ev, "event_type", "ts", "value")


_FUZZY_TOKENS = "list_distinct(string_split(lower(p_name || ' ' || p_type), ' '))"

_FUZZY_ORACLE = f"""
WITH r AS (
    SELECT p_partkey AS id, p_brand, p_size, {_FUZZY_TOKENS} AS toks
    FROM part
)
SELECT a.id AS a_id, b.id AS b_id,
       round(len(list_intersect(a.toks, b.toks)) * 1.0 /
             (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))),
             6) AS jaccard
FROM r a JOIN r b
  ON a.p_brand = b.p_brand AND a.p_size = b.p_size AND a.id < b.id
WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
"""


@register("ext_fuzzy_join", oracle=_FUZZY_ORACLE, tags=("ext", "analytics"))
def ext_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity matching: part pairs of the SAME (brand, size) block
    whose name+type token sets have Jaccard >= 0.5, via the PPJoin-style
    prefix/length/positional cascade (operators/setjoin — every pruning
    lossless, pinned by the hypothesis property test; the brute-force
    oracle proves it pair-for-pair here).

    Blocking on (p_brand, p_size) is the standard entity-resolution
    move and the scale decision: the fixture's token vocabulary is ~95
    words for 10^4..10^6 records, so NO token is rare and pure prefix
    filtering degenerates toward all-pairs with single-hot-token join
    skew (measured: 28M candidates / 80 s at sf0.1 unblocked vs ~50k
    candidates blocked). Real catalog data picks blocks the same way;
    the unblocked path stays available on the operator."""
    p = load_table(spark, sf_dir, "part")
    recs = p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.split(
            F.lower(F.concat_ws(" ", "p_name", "p_type")), " "
        ).alias("toks"),
    )
    return jaccard_similarity_join(
        recs, "p_partkey", "toks", threshold=0.5,
        block_by=["p_brand", "p_size"],
    )


_PMI_ORACLE = r"""
WITH t AS (
    SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
    FROM documents
), big AS (
    SELECT z.pair[1] AS w1, z.pair[2] AS w2, count(*) AS c2
    FROM t, unnest(list_zip(toks[1:len(toks) - 1], toks[2:len(toks)]))
         AS z(pair)
    GROUP BY 1, 2
), uni AS (
    SELECT u.w AS w, count(*) AS cu
    FROM t, unnest(toks) AS u(w)
    GROUP BY 1
), tot AS (
    SELECT (SELECT CAST(sum(cu) AS BIGINT) FROM uni) AS t_tokens,
           (SELECT CAST(sum(c2) AS BIGINT) FROM big) AS t_bigrams
)
SELECT w1, w2, c2 AS n_pairs,
       round(log2((c2 * 1.0 / t_bigrams) /
                  ((u1.cu * 1.0 / t_tokens) * (u2.cu * 1.0 / t_tokens))),
             6) AS pmi
FROM big
JOIN uni u1 ON big.w1 = u1.w
JOIN uni u2 ON big.w2 = u2.w
CROSS JOIN tot
WHERE c2 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 50
"""


@register("text_collocations", oracle=_PMI_ORACLE, tags=("ext", "text"))
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 corpus bigrams by pointwise mutual
    information, log2(p(w1,w2) / (p(w1)p(w2))), min support 5. Rides the
    existing bigram-count aggregates (operators/text.doc_bigram_counts);
    the unigram/bigram totals are 1-row broadcast scalars and the final
    cut is a bounded-heap top-k, so corpus size only enters through the
    two hash aggregations."""
    d = load_table(spark, sf_dir, "documents")
    b = X.doc_bigram_counts(d, "doc_id", "text")
    big = b.groupBy("w1", "w2").agg(F.sum("k").alias("c2"))
    uni = (
        d.select(F.explode(X.tokens(F.lower(F.col("text")))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    tot = big.agg(F.sum("c2").alias("t_bigrams")).crossJoin(
        uni.agg(F.sum("cu").alias("t_tokens"))
    )
    pmi = F.round(
        F.log2(
            (F.col("c2") * 1.0 / F.col("t_bigrams"))
            / (
                (F.col("u1.cu") * 1.0 / F.col("t_tokens"))
                * (F.col("u2.cu") * 1.0 / F.col("t_tokens"))
            )
        ),
        6,
    )
    scored = (
        big.filter(F.col("c2") >= 5)
        .join(uni.alias("u1"), F.col("w1") == F.col("u1.w"))
        .join(uni.alias("u2"), F.col("w2") == F.col("u2.w"))
        .crossJoin(F.broadcast(tot))
        .select("w1", "w2", F.col("c2").alias("n_pairs"), pmi.alias("pmi"))
    )
    return relational.topk(
        scored, [F.col("pmi").desc(), F.col("w1"), F.col("w2")], 50
    )


def _prob_sql() -> str:
    from component_iceberg_spark.plans.queries_text import _classifier_prob_sql

    return _classifier_prob_sql()


def _buckets_oracle() -> str:
    return f"""
    WITH q AS (
        SELECT doc_id, {_prob_sql()} AS p FROM documents
    ), r AS (
        SELECT doc_id, p,
               row_number() OVER (ORDER BY p DESC, doc_id) AS rk,
               count(*) OVER () AS n
        FROM q
    )
    SELECT CAST(((rk - 1) * 10) // n AS INT) AS bucket,
           count(*) AS n_docs,
           round(avg(p), 6) AS avg_prob,
           min(p) AS min_prob,
           max(p) AS max_prob
    FROM r GROUP BY 1
    """


@register(
    "pipeline_quality_buckets",
    oracle=_buckets_oracle(),
    tags=("ext", "pipeline"),
)
def pipeline_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum binning: decile buckets over the quality-classifier
    score (the data-mixing precursor — train on high deciles first /
    weight by bucket). Ranking uses the range-partitioned global_rank
    operator, NOT a single-partition window, so the decile assignment
    survives any corpus size; bucket = ((rank-1)*10) div n with the
    1-row count broadcast."""
    d = load_table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id", F.round(X.classifier_score("text"), 6).alias("p")
    )
    ranked = relational.global_rank(
        q, [F.col("p").desc(), F.col("doc_id")], rank_col="rk"
    )
    n = q.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            F.expr("cast(((rk - 1) * 10) div n as int)").alias("bucket"),
            "p",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p"), 6).alias("avg_prob"),
            F.min("p").alias("min_prob"),
            F.max("p").alias("max_prob"),
        )
    )


_TRANSITIONS_ORACLE = """
WITH s AS (
    SELECT user_id, event_type AS next_type,
           lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_type
    FROM events
), m AS (
    SELECT prev_type, next_type, count(*) AS n_steps
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT prev_type, next_type, n_steps,
       round(n_steps * 1.0 /
             sum(n_steps) OVER (PARTITION BY prev_type), 6) AS p_next
FROM m
"""


@register(
    "ext_event_transitions",
    oracle=_TRANSITIONS_ORACLE,
    tags=("ext", "analytics"),
)
def ext_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of the event stream: counts
    and P(next | prev) for every observed (prev → next) event-type step
    within a user's timeline (ties broken by event_id) — the session-flow
    / anomalous-path analysis shape (operators/analytics.
    event_transitions: one user-key Exchange, matrix-sized rollup,
    broadcast normalization)."""
    ev = load_table(spark, sf_dir, "events")
    return analytics.event_transitions(
        ev, "user_id", "ts", "event_type", "event_id"
    )


_ENTITY_ORACLE = f"""
WITH RECURSIVE fp AS (
    {_FUZZY_ORACLE}
),
und AS (
    SELECT a_id AS a, b_id AS b FROM fp
    UNION ALL
    SELECT b_id, a_id FROM fp
),
reach AS (
    SELECT p_partkey AS id, p_partkey AS r FROM part
    UNION
    SELECT reach.id, u.b FROM reach JOIN und u ON u.a = reach.r
),
lbl AS (
    SELECT id, min(r) AS entity_id FROM reach GROUP BY id
),
agg AS (
    SELECT entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           round(avg(pp.p_retailprice), 2) AS avg_price,
           round(min(pp.p_retailprice), 2) AS min_price,
           round(max(pp.p_retailprice), 2) AS max_price
    FROM lbl JOIN part pp ON pp.p_partkey = lbl.id
    GROUP BY entity_id
)
SELECT a.entity_id, a.n_members, a.avg_price, a.min_price, a.max_price,
       c.p_name AS canonical_name,
       c.p_brand AS canonical_brand,
       c.p_size AS canonical_size
FROM agg a JOIN part c ON c.p_partkey = a.entity_id
"""


@register(
    "ext_entity_merge", oracle=_ENTITY_ORACLE, tags=("ext", "analytics")
)
def ext_entity_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy-match (the ext_fuzzy_join
    PPJoin cascade) → transitive clusters (dedup.connected_components
    pointer-jumping) → one GOLDEN RECORD per entity with survivorship
    rules (canonical attributes from the min-id member — deterministic —
    plus member count and price consensus stats). Singletons become
    their own entities via a left join, so the output is a complete
    deduplicated master table. The oracle rebuilds the same clusters
    with a real WITH RECURSIVE transitive closure over the
    brute-force-verified pair list, covering match, closure and
    survivorship exactly."""
    from component_iceberg_spark.operators import dedup as D

    p = load_table(spark, sf_dir, "part")
    recs = p.select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.split(
            F.lower(F.concat_ws(" ", "p_name", "p_type")), " "
        ).alias("toks"),
    )
    pairs = jaccard_similarity_join(
        recs, "p_partkey", "toks", threshold=0.5,
        block_by=["p_brand", "p_size"],
    )
    cc = D.connected_components(pairs, "a_id", "b_id")
    lbl = (
        p.select("p_partkey", "p_retailprice")
        .join(cc, F.col("p_partkey") == F.col("doc"), "left")
        .select(
            "p_partkey",
            "p_retailprice",
            F.coalesce("cluster_id", F.col("p_partkey")).alias("entity_id"),
        )
    )
    agg = lbl.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
        F.round(F.min("p_retailprice"), 2).alias("min_price"),
        F.round(F.max("p_retailprice"), 2).alias("max_price"),
    )
    canon = p.select(
        F.col("p_partkey").alias("entity_id"),
        F.col("p_name").alias("canonical_name"),
        F.col("p_brand").alias("canonical_brand"),
        F.col("p_size").alias("canonical_size"),
    )
    return agg.join(canon, "entity_id")


_ZSCORE_ORACLE = """
WITH stats AS (
    SELECT event_type,
           avg(value) AS mu,
           stddev_samp(value) AS sd
    FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(e.value, 4) AS value,
       round((e.value - s.mu) / s.sd, 4) AS z
FROM events e JOIN stats s USING (event_type)
WHERE abs((e.value - s.mu) / s.sd) > 2.5
"""


@register(
    "ext_anomaly_zscore", oracle=_ZSCORE_ORACLE, tags=("ext", "analytics")
)
def ext_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical outlier screen: events whose value deviates more than
    2.5 sample standard deviations from their event-type mean — the
    drift/anomaly gate a pipeline runs on arriving metrics. The per-type
    stats are ONE hash aggregate (group-count-sized) broadcast back
    over the fact scan, so the screen costs a single pass + map-side
    join at any scale — no window over the fact table, no second
    Exchange. (The window-function form would shuffle the full fact
    table just to attach two scalars per type.)"""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 2.5)
        .select(
            "event_id",
            "event_type",
            F.round("value", 4).alias("value"),
            F.round(z, 4).alias("z"),
        )
    )


_SESSION_PATHS_ORACLE = """
WITH g AS (
    SELECT user_id, ts, event_id, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
    SELECT user_id, event_type, ts, event_id,
           sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_id
    FROM g
), paths AS (
    SELECT user_id, session_id,
           string_agg(event_type, '>' ORDER BY ts, event_id) AS path
    FROM s GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@register(
    "ext_session_paths",
    oracle=_SESSION_PATHS_ORACLE,
    tags=("ext", "analytics"),
)
def ext_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the 20 most common full event-type journeys
    through a 30-minute-gap session (the flow-analysis complement of the
    per-step ext_funnel and the one-step ext_event_transitions). Session
    assignment is the sessionize lag + running-sum pair on ONE user
    Exchange; the path string is built ORDER-DETERMINISTICALLY by
    sorting each session's collected (ts, event_id, type) structs —
    array_sort inside the aggregate, no second window — and the final
    cut is a bounded-heap top-k on (count, path)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    new_sess = (
        F.when(
            F.lag("ts").over(w).isNull()
            | (ts_us > F.lag(ts_us).over(w) + 1_800_000_000),
            F.lit(1),
        )
        .otherwise(F.lit(0))
    )
    s = ev.select(
        "user_id", "ts", "event_id", "event_type",
        new_sess.alias("new_sess"),
    ).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    paths = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    return relational.topk(
        counts, [F.col("n_sessions").desc(), F.col("path")], 20
    )


_TS_FEATURES_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           round(sum(value), 4) AS v
    FROM events GROUP BY 1, 2
), lagged AS (
    SELECT event_type, day, v,
           CASE WHEN date_diff('day', lag(day) OVER w, day) = 1
                THEN lag(v) OVER w END AS pv,
           date_diff('day', DATE '1970-01-01', day) AS epoch_day
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(corr(v, pv), 6) AS autocorr_1,
       round(stddev_samp(v - pv), 4) AS diff_vol,
       round(regr_slope(v, epoch_day), 6) AS trend_slope
FROM lagged
GROUP BY event_type
"""


@register(
    "ext_timeseries_features",
    oracle=_TS_FEATURES_ORACLE,
    tags=("ext", "analytics"),
)
def ext_timeseries_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series forecasting features over the daily event-value series:
    lag-1 autocorrelation, day-over-day difference volatility, and OLS
    trend slope vs epoch day — the feature-extraction stage before any
    model. ONE hash aggregate builds the daily series, one
    series-key window attaches the (consecutive-day-guarded) lag, and
    one final aggregate computes all three statistics — the lag rides
    the window rather than a daily-to-daily self-join, which would
    duplicate the fact-scan subtree (the transitions/tfidf plan-audit
    lesson). corr/regr_slope/stddev cross-engine parity is pinned by
    func_stats; daily sums are rounded before the statistics so both
    engines feed identical series."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.col("ts").cast("date").alias("day")
        )
        .agg(F.round(F.sum("value"), 4).alias("v"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        "v",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(w)) == 1,
            F.lag("v").over(w),
        ).alias("pv"),
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")).alias(
            "epoch_day"
        ),
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.corr("v", "pv"), 6).alias("autocorr_1"),
        F.round(F.stddev_samp(F.col("v") - F.col("pv")), 4).alias("diff_vol"),
        F.round(F.regr_slope("v", "epoch_day"), 6).alias("trend_slope"),
    )


# ---------------------------------------------------------------------------
# Graph: triangle census over the part co-order graph
# ---------------------------------------------------------------------------

_TRIANGLE_ORACLE = """
WITH pairs AS (
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
), edges AS (
    SELECT u, v FROM pairs GROUP BY u, v HAVING count(*) >= 2
), und AS (
    SELECT u AS a FROM edges UNION ALL SELECT v FROM edges
), deg AS (
    SELECT a, count(*) AS d FROM und GROUP BY a
), w AS (
    SELECT CAST(sum(d) / 2 AS BIGINT) AS n_edges,
           CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
    FROM deg
), tri AS (
    SELECT count(*) AS n_tri
    FROM edges e1
    JOIN edges e2 ON e1.v = e2.u
    JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
)
SELECT w.n_edges,
       w.n_wedges,
       CAST(tri.n_tri AS BIGINT) AS n_triangles,
       round(CASE WHEN w.n_wedges > 0
                  THEN 3.0 * tri.n_tri / w.n_wedges
                  ELSE 0.0 END, 6) AS clustering_coeff
FROM w, tri
"""


@register("ext_graph_triangles", oracle=_TRIANGLE_ORACLE,
          tags=("ext", "analytics", "graph"))
def ext_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census (edges / wedges / triangles / global clustering
    coefficient) of the part co-order graph: parts are linked when they
    appear together in >= 2 orders — the co-occurrence weight threshold
    is itself the scale lever, thinning a dense co-occurrence graph to
    its significant edges BEFORE any quadratic step. The oracle's naive
    id-ordered 3-way join replays the exact count; Spark-side the count
    runs compact-forward (operators/relational.triangle_stats): edges
    oriented low-degree -> high-degree bound every out-degree by
    O(sqrt(m)), so the wedge join is O(m^1.5) worst-case instead of
    sum(deg^2) — the difference between a night and a minute on a
    100 TB co-occurrence graph with power-law hubs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # pre-expansion width pin — same rationale as ext_interval_join: the
    # co-order pair fan-out is invisible to AQE's input-byte coalescing,
    # which collapsed the pair stage to ~3 CPU-bound tasks
    li = li.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions")), "l_orderkey"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
    )
    edges = (
        pairs.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .drop("w")
    )
    return relational.triangle_stats(edges, "u", "v")


# ---------------------------------------------------------------------------
# Interval overlap self-join: concurrent shipments of the same part
# ---------------------------------------------------------------------------

_INTERVAL_ORACLE = """
WITH iv AS (
    SELECT l_partkey, l_orderkey, l_linenumber,
           CAST(l_shipdate AS DATE) AS s,
           CAST(l_shipdate AS DATE)
               + (CAST(l_quantity AS INT) % 14 + 1) AS e
    FROM lineitem
)
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
           AS overlap_days
FROM iv a
JOIN iv b
  ON a.l_partkey = b.l_partkey
 AND (a.l_orderkey < b.l_orderkey
      OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
 AND a.s <= b.e AND b.s <= a.e
JOIN part ON p_partkey = a.l_partkey
GROUP BY p_brand
"""


@register("ext_interval_join", oracle=_INTERVAL_ORACLE,
          tags=("ext", "analytics", "join"))
def ext_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: pairs of shipments of the SAME part
    whose delivery windows ([shipdate, shipdate + quantity-derived
    duration]) overlap, rolled up to brand with total overlapping days.
    This is the equi-key + band-predicate form of interval joins — the
    one that actually scales: the join shuffles ONLY on the equi key
    (partkey), each key's group is bounded, and the overlap predicate
    evaluates inside the joined group, so there is no all-pairs blow-up
    and no time-bucket replication (contrast ext_range_join, which
    handles the keyless banded case by bucket replication). Pair
    identity is tie-broken on the unique (orderkey, linenumber), so the
    result multiset is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    iv = li.select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"),
            F.col("l_quantity").cast("int") % 14 + 1,
        ).alias("e"),
    )
    # Pin the self-join's exchange at the session shuffle width: AQE
    # coalesces post-shuffle partitions from the INPUT bytes (a few MB
    # of narrow interval rows) and cannot see the per-key pair fan-out,
    # so the CPU-dominant overlap stage ran on ~3 tasks (r15 profile:
    # one 3-task stage = the whole wall). An explicit keyed repartition
    # is exempt from coalescing; both aliases reuse the one exchange. At
    # cluster scale the conf IS the tuned width, so nothing shrinks.
    iv = iv.repartition(
        int(spark.conf.get("spark.sql.shuffle.partitions")), "l_partkey"
    )
    a, b = iv.alias("a"), iv.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (
            (F.col("a.l_orderkey") < F.col("b.l_orderkey"))
            | (
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            )
        )
        & (F.col("a.s") <= F.col("b.e"))
        & (F.col("b.s") <= F.col("a.e")),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        pairs.select(
            F.col("a.l_partkey").alias("l_partkey"),
            F.datediff(
                F.least(F.col("a.e"), F.col("b.e")),
                F.greatest(F.col("a.s"), F.col("b.s")),
            ).alias("ov"),
        )
        # no broadcast hint: part grows with the scale factor (only
        # bounded dims like region/nation earn hints — test_plans rule);
        # AQE may still demote this join to broadcast at small SF
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("ov").cast("long").alias("overlap_days"),
        )
    )


# ---------------------------------------------------------------------------
# Correlation matrix: pairwise Pearson over the measure columns
# ---------------------------------------------------------------------------

_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

_CORR_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
    f"round(corr({a}, {b}), 6) AS corr FROM lineitem"
    for i, a in enumerate(_CORR_COLS)
    for b in _CORR_COLS[i + 1:]
)


@register("ext_corr_matrix", oracle=_CORR_ORACLE,
          tags=("ext", "analytics", "stats"))
def ext_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measure columns —
    the feature-screening pass every dataset profile / feature-selection
    job runs. All C(4,2)=6 coefficients come from ONE hash aggregate in
    one data pass (each corr is a co-moment accumulator, constant state),
    then a stack() pivots the single row to (col_a, col_b, corr) rows:
    no per-pair scans, no shuffle beyond the one aggregate. At 100 TB
    this is the same single pass — corr state size is independent of
    row count. Both engines round to 6 dp to absorb summation-order
    ulps in the co-moments."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.round(F.corr(a, b), 6).alias(f"c_{i}_{j}")
        for i, a in enumerate(_CORR_COLS)
        for j, b in enumerate(_CORR_COLS)
        if i < j
    ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{i}_{j}"
        for i, a in enumerate(_CORR_COLS)
        for j, b in enumerate(_CORR_COLS)
        if i < j
    )
    n_pairs = len(_CORR_COLS) * (len(_CORR_COLS) - 1) // 2
    return one.selectExpr(
        f"stack({n_pairs}, {stack_args}) AS (col_a, col_b, corr)"
    )


# ---------------------------------------------------------------------------
# Grid-density clustering (DBSCAN on grid cells)
# ---------------------------------------------------------------------------

# minPts scales with the data (total/5000, floor 5): grid density grows
# linearly with corpus size, so an absolute threshold degenerates at any
# other SF — integer math, replayed exactly by the oracle
_DBSCAN_DIV = 5000

_DBSCAN_ORACLE = """
WITH RECURSIVE cells AS (
    SELECT CAST(floor(l_quantity) AS BIGINT) AS cx,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS cy,
           count(*) AS n
    FROM lineitem GROUP BY 1, 2
), tot AS (
    SELECT CAST(greatest(5, sum(n) // 5000) AS BIGINT) AS mp FROM cells
), dense AS (
    SELECT cx, cy, cx * 1000 + cy AS id, n
    FROM cells, tot WHERE n >= mp
), e AS (
    SELECT a.id AS a, b.id AS b
    FROM dense a JOIN dense b
      ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
     AND a.id <> b.id
), reach AS (
    SELECT id, id AS r FROM dense
    UNION
    SELECT reach.id, e.b FROM reach JOIN e ON e.a = reach.r
), lbl AS (
    SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(d.n) AS BIGINT) AS n_points,
       min(d.cx) AS x_min, max(d.cx) AS x_max,
       min(d.cy) AS y_min, max(d.cy) AS y_max
FROM lbl JOIN dense d USING (id)
GROUP BY cluster_id
"""


@register("ext_dbscan_grid", oracle=_DBSCAN_ORACLE,
          tags=("ext", "analytics", "clustering"))
def ext_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density clustering, grid flavor (the way DBSCAN actually scales):
    bucket the (quantity, price) plane into unit×1000 cells, keep cells
    clearing the data-scaled minPts density test (total/5000, the
    oracle replays the integer math), merge 8-adjacent
    dense cells into clusters via the SAME pointer-jumping connected
    components that powers near-dup clustering, and report each
    cluster's cell/point counts + bounding box. The plan is the scale
    story: the only full-data pass is the ONE grid aggregate (cell
    count is bounded by grid resolution, not row count); density
    filtering, the 8-neighbor adjacency join, and the O(log diameter)
    CC rounds all run on the metadata-sized dense-cell relation.
    Isolated dense cells become singleton clusters via the label left
    join (the entity-merge pattern). The DuckDB oracle replays the
    closure with WITH RECURSIVE over the identical adjacency."""
    from component_iceberg_spark.operators.dedup import connected_components

    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor("l_quantity").alias("cx"),
        F.floor(F.col("l_extendedprice") / 1000).alias("cy"),
    )
    # ONE pass over the data builds the grid; the cell relation is
    # bounded by grid resolution (~5k rows), so it is checkpointed and
    # every later step (total, density filter, adjacency probes, label
    # join) reads the materialized cells — lineitem is scanned once.
    cells = (
        li.groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    total = cells.agg(F.sum("n")).collect()[0][0]  # 1 scalar to the driver
    minpts = max(5, int(total) // _DBSCAN_DIV)
    dense = cells.filter(F.col("n") >= minpts).withColumn(
        "id", F.col("cx") * 1000 + F.col("cy")
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)
        ]
    )
    probes = (
        dense.select("cx", "cy", "id")
        .withColumn("o", F.explode(offsets))
        .select(
            (F.col("cx") + F.col("o.dx")).alias("nx"),
            (F.col("cy") + F.col("o.dy")).alias("ny"),
            F.col("id").alias("a"),
        )
    )
    nbrs = dense.select(
        F.col("cx").alias("nx"), F.col("cy").alias("ny"),
        F.col("id").alias("b"),
    )
    edges = (
        probes.join(nbrs, ["nx", "ny"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    labels = connected_components(edges, "a", "b")
    clustered = (
        dense.join(labels, dense.id == labels.doc, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "id"))
    )
    return clustered.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n").cast("long").alias("n_points"),
        F.min("cx").alias("x_min"), F.max("cx").alias("x_max"),
        F.min("cy").alias("y_min"), F.max("cy").alias("y_max"),
    )


# ---------------------------------------------------------------------------
# A/B-test lift (r7)
# ---------------------------------------------------------------------------

_ABTEST_ORACLE = """
WITH u AS (
    SELECT user_id, user_id % 2 AS variant,
           max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
           max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
    FROM events GROUP BY 1, 2
), v AS (
    SELECT variant,
           CAST(sum(exposed) AS BIGINT) AS n,
           CAST(sum(CASE WHEN exposed = 1 AND converted = 1
                    THEN 1 ELSE 0 END) AS BIGINT) AS x
    FROM u GROUP BY 1
), w AS (
    SELECT max(CASE WHEN variant = 0 THEN n END) AS na,
           max(CASE WHEN variant = 0 THEN x END) AS xa,
           max(CASE WHEN variant = 1 THEN n END) AS nb,
           max(CASE WHEN variant = 1 THEN x END) AS xb
    FROM v
)
SELECT na, xa, round(xa * 1.0 / nullif(na, 0), 6) AS rate_a,
       nb, xb, round(xb * 1.0 / nullif(nb, 0), 6) AS rate_b,
       round(xb * 1.0 / nullif(nb, 0) - xa * 1.0 / nullif(na, 0), 6) AS lift,
       round((xb * 1.0 / nullif(nb, 0) - xa * 1.0 / nullif(na, 0))
             / nullif(sqrt(((xa + xb) * 1.0 / nullif(na + nb, 0))
                    * (1.0 - (xa + xb) * 1.0 / nullif(na + nb, 0))
                    * (1.0 / nullif(na, 0) + 1.0 / nullif(nb, 0))), 0), 6) AS z_score
FROM w
"""


@register("ext_abtest_lift", oracle=_ABTEST_ORACLE, tags=("ext", "analytics"))
def ext_abtest_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion A/B read-out over the event stream: variant =
    user_id % 2 (the deterministic hash-assignment every experiment
    platform uses), exposure = a 'view' event, conversion = exposed AND
    a purchase with value > 150 (the qualifier keeps the fixture's rates
    off the degenerate 100%). Emits per-variant counts/rates, absolute lift, and the
    pooled two-proportion z-score — the pipeline that decides an
    experiment, as ONE row.

    Plan: per-user flag aggregate (one user-key Exchange, map-side
    combine) → per-variant 2-row aggregate → 1-row conditional pivot —
    counts-only shuffles at any scale. Every float op composes the same
    integer counts in the same written order in both engines, so even
    the z-score matches exactly at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    u = (
        ev.groupBy("user_id", (F.col("user_id") % 2).alias("variant"))
        .agg(
            F.max(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("exposed"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("value") > 150),
                    1,
                ).otherwise(0)
            ).alias("converted"),
        )
    )
    v = u.groupBy("variant").agg(
        F.sum("exposed").alias("n"),
        F.sum(
            F.when(
                (F.col("exposed") == 1) & (F.col("converted") == 1), 1
            ).otherwise(0)
        ).alias("x"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("variant") == 0, F.col("x"))).alias("xa"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("variant") == 1, F.col("x"))).alias("xb"),
    )
    na, xa = F.col("na"), F.col("xa")
    nb, xb = F.col("nb"), F.col("xb")
    # nullif guards: a tiny fixture can leave a variant with zero exposed
    # users; ANSI mode would raise on /0 where the oracle yields NULL
    dna = F.nullif(na.cast("double"), F.lit(0.0))
    dnb = F.nullif(nb.cast("double"), F.lit(0.0))
    dnab = F.nullif((na + nb).cast("double"), F.lit(0.0))
    rate_a = xa * 1.0 / dna
    rate_b = xb * 1.0 / dnb
    pooled = (xa + xb) * 1.0 / dnab
    se = F.nullif(
        F.sqrt(pooled * (1.0 - pooled) * (1.0 / dna + 1.0 / dnb)),
        F.lit(0.0),
    )  # se == 0 (no conversions anywhere) -> NULL z, not /0
    return w.select(
        "na", "xa", F.round(rate_a, 6).alias("rate_a"),
        "nb", "xb", F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_b - rate_a, 6).alias("lift"),
        F.round((rate_b - rate_a) / se, 6).alias("z_score"),
    )


# ---------------------------------------------------------------------------
# Spatial grid join (r7)
# ---------------------------------------------------------------------------

_SPATIAL_D = 50.0  # distance threshold; grid cell size = d

# deterministic synthetic 2-D coordinates over customer
_SPATIAL_PTS = """
    SELECT c_custkey AS id,
           CAST(c_acctbal AS DOUBLE) AS x,
           CAST((c_custkey * 37) % 10000 AS DOUBLE) AS y
    FROM customer
"""

_SPATIAL_ORACLE = f"""
WITH pts AS ({_SPATIAL_PTS})
SELECT a.id AS pa, b.id AS pb,
       round(sqrt((a.x - b.x) * (a.x - b.x)
                  + (a.y - b.y) * (a.y - b.y)), 6) AS dist
FROM pts a JOIN pts b ON a.id < b.id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_SPATIAL_D} * {_SPATIAL_D}
"""


@register("ext_spatial_grid_join", oracle=_SPATIAL_ORACLE,
          tags=("ext", "join", "spatial"))
def ext_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance self-join (all point pairs within d) via GRID BUCKETING —
    the canonical scalable spatial join: cell size = d, so any pair
    within d lands in the same or an adjacent cell; one side replicates
    into its 3×3 cell neighborhood, the join is a plain equi-join on the
    cell key, and the exact distance predicate verifies candidates. The
    brute-force oracle proves the grid is LOSSLESS (no pair within d
    escapes the neighborhood), not merely that candidates were scored
    right. Pair dedup: the replicated side keeps only (a.id < b.id) and
    each unordered pair survives exactly once because b is joined at its
    OWN cell only.

    Scale: one shuffle keyed on cells, 9× replication of one side (a
    constant), candidates bounded by local density × 9 cells — never
    all-pairs. The same shape serves geo joins, embedding-grid joins,
    and trajectory contact tracing."""
    pts = _spatial_points(spark, sf_dir)
    return _grid_distance_pairs(pts, _SPATIAL_D)


def _spatial_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").cast("double").alias("x"),
        ((F.col("c_custkey") * 37) % 10000).cast("double").alias("y"),
    )


def _grid_distance_pairs(
    pts: DataFrame,
    d: float,
    hot_threshold: int | None = None,
    salt_buckets: int = 8,
    cell: float | None = None,
) -> DataFrame:
    """Grid distance self-join body, shared by the plain and the
    hot-cell-salted variants. With ``hot_threshold`` set, any cell whose
    point count exceeds it splits into ``salt_buckets`` sub-cells on a
    second key (point id mod buckets): the B side's hot rows spread over
    the salt lanes, the A side replicates into every lane OF HOT CELLS
    ONLY (cold cells keep lane 0, so the extra replication is paid
    exactly where the density is). The salt is placement-only — the pair
    set is identical — and the hot-cell list is a metadata-sized
    broadcast (cells, not points).

    ``cell`` decouples the candidate grid's cell size from the verify
    distance ``d`` (default: equal, the registered queries' shape). A
    coarser grid (cell > d) makes candidate generation cheaper but the
    verify predicate kill-heavy — the regime where hot-cell salting pays
    (candidates quadratic, output small; see the r8 DESIGN_NOTES
    boundary note). Correctness needs cell >= d: the 3x3 neighborhood
    of a cell covers all points within ``cell`` of it."""
    if cell is None:
        cell = d
    if cell < d:
        # correctness precondition, not a debug check: a grid finer than
        # the verify distance silently DROPS true pairs (the 3x3
        # neighborhood no longer covers distance d), so it must survive
        # `python -O` — ValueError, never a strippable assert.
        raise ValueError(
            f"grid cell ({cell}) must be >= verify distance ({d}): "
            "coarser-grid candidates must still cover distance d"
        )
    cx = F.floor(F.col("x") / cell)
    cy = F.floor(F.col("y") / cell)
    # side B sits at its own cell
    b = pts.select(
        F.col("id").alias("pb"), F.col("x").alias("xb"),
        F.col("y").alias("yb"), cx.alias("cx"), cy.alias("cy"),
    )
    # side A replicates into its 3x3 neighborhood
    off = F.explode(
        F.array(*[
            F.struct(F.lit(i).alias("dx"), F.lit(j).alias("dy"))
            for i in (-1, 0, 1) for j in (-1, 0, 1)
        ])
    )
    a = (
        pts.select(
            F.col("id").alias("pa"), F.col("x").alias("xa"),
            F.col("y").alias("ya"), cx.alias("acx"), cy.alias("acy"),
            off.alias("o"),
        )
        .select(
            "pa", "xa", "ya",
            (F.col("acx") + F.col("o.dx")).alias("cx"),
            (F.col("acy") + F.col("o.dy")).alias("cy"),
        )
    )
    join_keys = ["cx", "cy"]
    if hot_threshold is not None:
        hot = (
            b.groupBy("cx", "cy")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > hot_threshold)
            .select("cx", "cy", F.lit(True).alias("_hot"))
        )
        b = (
            b.join(F.broadcast(hot), ["cx", "cy"], "left")
            .withColumn(
                "salt",
                F.when(F.col("_hot"), F.pmod(F.col("pb"), F.lit(salt_buckets)))
                .otherwise(F.lit(0))
                .cast("int"),
            )
            .drop("_hot")
        )
        a = (
            a.join(F.broadcast(hot), ["cx", "cy"], "left")
            .withColumn(
                "salt",
                F.explode(
                    F.sequence(
                        F.lit(0),
                        F.when(F.col("_hot"), F.lit(salt_buckets - 1))
                        .otherwise(F.lit(0)),
                    )
                ),
            )
            .drop("_hot")
        )
        join_keys = ["cx", "cy", "salt"]
    d2 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        a.join(b, join_keys)
        .filter((F.col("pa") < F.col("pb")) & (d2 <= F.lit(d * d)))
        .select("pa", "pb", F.round(F.sqrt(d2), 6).alias("dist"))
    )


# Cell point count above which a cell splits into salt lanes. A knob tuned
# to reducer comfort in production (millions); set to 1 here so the sparse
# test fixture genuinely exercises the salt lanes (any 2+-point cell
# splits) — the oracle then covers the salted path, not just cold cells.
_SPATIAL_HOT = 1


@register("ext_spatial_grid_join_salted", oracle=_SPATIAL_ORACLE,
          tags=("ext", "join", "spatial", "skew"))
def ext_spatial_grid_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ext_spatial_grid_join with HOT-CELL SALTING (the skew mitigation
    its plain twin's plan audit called out): real spatial data is
    power-law dense — one downtown cell can hold millions of points
    while the grid average is tens, and the within-cell candidate
    product (n_hot × 9-neighborhood density) pins a single reducer. Here
    cells whose count exceeds a threshold split into 8 sub-cells on
    (id mod 8): the hot cell's B rows spread across 8 tasks and only
    neighbors OF hot cells pay the extra replication (cold cells join on
    lane 0 alone, same cost as the plain twin). Identical pair set — the
    brute-force oracle asserts the salt is placement-only, exactly like
    ext_join_salted's contract; tests pin the lane fan-out on a crafted
    dense-cell fixture."""
    pts = _spatial_points(spark, sf_dir)
    return _grid_distance_pairs(
        pts, _SPATIAL_D, hot_threshold=_SPATIAL_HOT, salt_buckets=8
    )


# ---------------------------------------------------------------------------
# Pareto skyline (r7)
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_brand, p.p_size, p.p_retailprice
FROM part p
WHERE p.p_size IS NOT NULL AND p.p_retailprice IS NOT NULL
  AND NOT EXISTS (
      SELECT 1 FROM part q
      WHERE q.p_size IS NOT NULL AND q.p_retailprice IS NOT NULL
        AND q.p_retailprice <= p.p_retailprice
        AND q.p_size >= p.p_size
        AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
  )
"""


@register("ext_skyline", oracle=_SKYLINE_ORACLE, tags=("ext", "analytics"))
def ext_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline over parts: every part for which no other part is
    cheaper-or-equal AND bigger-or-equal with at least one strict — the
    multi-objective "best deals" frontier (minimize price, maximize
    size). The reference answers this class only via hand-written
    NOT EXISTS SQL in custom-query mode, which DuckDB executes as a
    quadratic anti-join; here the staircase structure of the 2-D skyline
    replaces the all-pairs test entirely.

    Plan: (1) per-price aggregate — only the LARGEST size at each price
    can be on the frontier, so one hash aggregate (map-side combine)
    collapses the relation to |distinct prices| rows; (2) a running-max
    window ordered by price over that collapsed staircase relation keeps
    a price level only when its best size strictly exceeds every
    strictly-cheaper level's best; (3) the surviving (price, size) pairs
    — frontier-sized, broadcast by construction — join back to recover
    the full rows (ties at the same price and size are all on the
    frontier, matching the oracle's dominance definition).

    Scale: the corpus-sized relation is touched by exactly one shuffle
    (the price aggregate); the window runs on the aggregated relation,
    whose cardinality is bounded by the price domain, and the final join
    broadcasts the frontier. No all-pairs comparison at any stage."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isNotNull() & F.col("p_retailprice").isNotNull()
    )
    levels = p.groupBy("p_retailprice").agg(
        F.max("p_size").alias("best_size")
    )
    w = (
        Window.orderBy("p_retailprice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        levels.withColumn("best_cheaper", F.max("best_size").over(w))
        .filter(
            F.col("best_cheaper").isNull()
            | (F.col("best_size") > F.col("best_cheaper"))
        )
        .select("p_retailprice", F.col("best_size").alias("p_size"))
    )
    return p.join(
        F.broadcast(frontier), ["p_retailprice", "p_size"]
    ).select("p_partkey", "p_brand", "p_size", "p_retailprice")


# ---------------------------------------------------------------------------
# Grouped OLS regression (r7)
# ---------------------------------------------------------------------------

# Exact-moment OLS: every sum below is over exact integers (price in
# cents), so both engines aggregate the IDENTICAL values in any order; the
# float work is a fixed left-to-right composition of those exact moments,
# making slope/intercept/r2 bit-stable and the 6-dp rounding purely
# cosmetic. The moment lanes are 128-bit on both sides — DECIMAL(38,0) in
# Spark, DuckDB's native HUGEINT sum — because int64 lanes overflow at
# only ~15k rows/group (n*syy ≈ rows² · 4.4e10); the exact integers cast
# to double identically in both engines when the statistics divide.
_OLS_ORACLE = """
WITH m AS (
    SELECT p_brand,
           CAST(count(*) AS BIGINT) AS n,
           sum(p_size) AS sx,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)) AS sy,
           sum(CAST(p_size AS BIGINT) * p_size) AS sxx,
           sum(p_size * CAST(round(p_retailprice * 100) AS BIGINT)) AS sxy,
           sum(CAST(round(p_retailprice * 100) AS BIGINT)
               * CAST(round(p_retailprice * 100) AS BIGINT)) AS syy
    FROM part
    WHERE p_size IS NOT NULL AND p_retailprice IS NOT NULL
    GROUP BY p_brand
)
SELECT p_brand, n,
       round((num * 1.0 / nullif(den, 0)) / 100.0, 6) AS slope,
       round((sy * 1.0 / n) / 100.0
             - (num * 1.0 / nullif(den, 0)) / 100.0 * (sx * 1.0 / n), 6)
           AS intercept,
       round((num * 1.0 / nullif(den, 0)) * (num * 1.0 / nullif(deny, 0)), 6)
           AS r2
FROM (
    SELECT p_brand, n, sx, sy,
           n * sxy - sx * sy AS num,
           n * sxx - sx * sx AS den,
           n * syy - sy * sy AS deny
    FROM m
)
"""


@register("ext_regression_ols", oracle=_OLS_ORACLE, tags=("ext", "analytics"))
def ext_regression_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group simple OLS (price-on-size per brand): slope, intercept
    and R² from ONE aggregate pass of exact integer moments — n, Σx, Σy,
    Σx², Σxy, Σy² with price in cents — then closed-form normal
    equations. This is the distributed-regression recipe that needs no
    iteration and no second scan: moments are associative, so map-side
    combine does most of the work and the shuffle carries 6 numbers per
    group. Degenerate groups (constant x or constant y) yield NULL
    slope/R² via the nullif guard, same as the oracle.

    Exactness contract: the moments are exact 128-bit integers
    (DECIMAL(38,0) here, HUGEINT in the oracle — order-insensitive and
    overflow-safe far past int64's ~15k-rows-per-group ceiling); the
    derived statistics compose them in the same written order in both
    engines."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isNotNull() & F.col("p_retailprice").isNotNull()
    )
    dec = "decimal(38,0)"
    yc = F.round(F.col("p_retailprice") * 100).cast("long")
    x = F.col("p_size").cast("long")
    # per-row products fit int64 (cents² ≤ ~4.8e10); the SUM lanes are
    # where int64 dies, so the cast sits between product and sum
    m = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast(dec)).alias("sx"),
        F.sum(yc.cast(dec)).alias("sy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((x * yc).cast(dec)).alias("sxy"),
        F.sum((yc * yc).cast(dec)).alias("syy"),
    )
    m = m.select(
        "p_brand", "n", "sx", "sy",
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).alias("num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).alias("den"),
        (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).alias("deny"),
    )
    den = F.nullif(F.col("den"), F.lit(0))
    deny = F.nullif(F.col("deny"), F.lit(0))
    slope = (F.col("num") * 1.0 / den) / 100.0
    return m.select(
        "p_brand", "n",
        F.round(slope, 6).alias("slope"),
        F.round(
            (F.col("sy") * 1.0 / F.col("n")) / 100.0
            - slope * (F.col("sx") * 1.0 / F.col("n")),
            6,
        ).alias("intercept"),
        F.round(
            (F.col("num") * 1.0 / den) * (F.col("num") * 1.0 / deny), 6
        ).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Trailing-window distinct users (r9) — the rolling COUNT DISTINCT idiom
# ---------------------------------------------------------------------------

_TRAILING_DAYS = 7

_ACTIVE_TRAILING_ORACLE = f"""
WITH ud AS (
    SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d, user_id
    FROM events
    WHERE ts IS NOT NULL
),
exploded AS (
    SELECT DISTINCT ud.d + CAST(r.i AS INTEGER) AS day, user_id
    FROM ud, unnest(range(0, {_TRAILING_DAYS})) AS r(i)
)
SELECT day, CAST(count(*) AS BIGINT) AS n_active_7d
FROM exploded
WHERE day <= (SELECT max(d) FROM ud)
GROUP BY day
"""


@register(
    "ext_active_users_trailing",
    oracle=_ACTIVE_TRAILING_ORACLE,
    tags=("ext", "analytics", "window"),
)
def ext_active_users_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the retention/DAU
    idiom every analytics stack needs and SQL windows cannot express
    (COUNT(DISTINCT) is not a legal window frame aggregate in either
    engine; a RANGE frame would double-count a user active on several
    days of the window).

    The Spark-first re-expression makes the distinct set EXPLICIT:
    (1) dedup events to distinct (user, day) pairs — the relation
    shrinks from |events| to at most |users|·|days|; (2) each pair
    votes for the 7 calendar days whose trailing window it falls in —
    a BOUNDED 7× Generate, not a range self-join;
    (3) distinct (day, user) then a per-day count. Days beyond the last
    observed day are clipped (their windows are not fully observable).
    A day appears iff some user was active in its trailing week — a
    ≥7-day global silence gap yields no row (count 0), matching the
    oracle exactly.

    Scale: two hash shuffles on metadata-shrunk relations (the pair
    dedup combines map-side; the 7× fan-out happens AFTER dedup), no
    window over the fact table, no range join. At 100 TB the events
    scan dominates and everything downstream is |users|·|days|-bounded.
    Exactness: pure integer counts on exact DATE arithmetic — no float
    anywhere."""
    ev = load_table(spark, sf_dir, "events")
    ud = (
        ev.filter(F.col("ts").isNotNull())
        .select(
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
            "user_id",
        )
        .distinct()
    )
    return _trailing_rollup(ud)


def _trailing_rollup(ud: DataFrame) -> DataFrame:
    """Shared serving rollup for the trailing-active-users twins (batch
    `ext_active_users_trailing`, streaming `stream_active_users_trailing`
    — one body so the two cannot drift): distinct (d, user_id) activity
    pairs → (day, n_active_7d). Each pair votes for the 7 calendar days
    whose trailing window it falls in (bounded 7× Generate), the votes
    are deduped per (day, user), days past the last observed day are
    clipped, and a per-day count closes it out. Input contract: `ud` is
    already distinct — the rollup's own fan-out dedup makes duplicate
    input harmless for correctness, but the fan-out then runs pre-dedup
    volume, so callers dedup first (batch: `.distinct()`; streaming:
    the key-merged snapshot table)."""
    max_day = ud.agg(F.max("d").alias("mx"))
    exploded = (
        ud.select(
            F.explode(
                F.sequence(F.lit(0), F.lit(_TRAILING_DAYS - 1))
            ).alias("i"),
            "d",
            "user_id",
        )
        .select(F.date_add(F.col("d"), F.col("i")).alias("day"), "user_id")
        .distinct()
    )
    return (
        exploded.join(
            F.broadcast(max_day), F.col("day") <= F.col("mx"), "left_semi"
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active_7d"))
    )
