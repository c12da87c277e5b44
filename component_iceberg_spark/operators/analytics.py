"""Event-analytics operators: funnels, cohort retention, gap-filled
resampling.

The reference engine answers this class of question with ad-hoc SQL over
its DuckDB layer (custom query mode,
``ex-iceberg/src/component.py``); here each shape is a first-class
operator whose Catalyst plan is pinned by tests:

- ``funnel``: ordered multi-step conversion. All step timestamps are
  per-user window minima over ONE partitioning, so the whole funnel —
  however many steps — costs a single Exchange on the user key, then a
  metadata-sized final rollup (k rows, one per step).
- ``cohort_retention``: first-touch cohorting. Two shuffles total
  (first-event agg, cohort×offset agg); the user→cohort map joins back
  sort-merge on the already-partitioned key.
- ``gap_fill_daily``: calendar densification. The calendar derives from
  a 1-row global bound aggregate crossed with the distinct-key dim —
  both broadcast-sized by construction — so the fill never shuffles the
  fact table at all; the only wide op is the daily pre-aggregation.

All three would run unchanged at 100 TB: nothing materializes per-user
state beyond the hash-agg/window partitions, and every driver-side
structure is O(steps) or O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon: str = "INTERVAL 7 DAYS",
) -> DataFrame:
    """Ordered-step funnel: a user reaches step *i* when an event of
    ``steps[i]`` occurs at-or-after their step *i-1* time (and, for
    ``i >= 1``, within ``horizon`` of their step-0 time).

    Each step time is ``min(CASE WHEN ...) OVER (PARTITION BY user)``;
    every window shares one partitioning so Catalyst plans a single
    Exchange for the full chain. Output: one row per step with the
    distinct-user count and the conversion rate vs step 0.
    """
    w = Window.partitionBy(user_col)
    cur = df
    step_cols = []
    for i, step in enumerate(steps):
        col = f"_t{i}"
        cond = F.col(type_col) == step
        if i > 0:
            prev = F.col(f"_t{i - 1}")
            cond = (
                cond
                & (F.col(ts_col) >= prev)
                & (F.col(ts_col) <= F.col("_t0") + F.expr(horizon))
            )
        cur = cur.withColumn(col, F.min(F.when(cond, F.col(ts_col))).over(w))
        step_cols.append(col)

    # Window values are per-user constants; max() collapses to one row per
    # user without a second Exchange (same partitioning as the window).
    per_user = cur.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in step_cols]
    )
    counts = per_user.agg(
        *[F.count(c).alias(f"_c{i}") for i, c in enumerate(step_cols)]
    )
    # conversion computed inside the unpivot so no per-row window is
    # needed on the k-row result (k = number of steps)
    stack_args = ", ".join(
        f"cast({i} as int), '{s}', _c{i}, "
        f"round(_c{i} / nullif(_c0, 0), 6)"
        for i, s in enumerate(steps)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) "
            "AS (step_idx, step, n_users, conv_rate)"
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    max_weeks: int = 4,
) -> DataFrame:
    """Weekly cohort retention: cohort = week of a user's first event;
    a user counts as retained at offset *k* when they have any event in
    cohort-week + *k* weeks (0 <= k < ``max_weeks``).

    Two shuffles: the first-event aggregation on the user key and the
    (cohort, offset) distinct-count; the fact→cohort join is sort-merge
    on the key the first aggregation already partitioned by.
    """
    first = df.groupBy(user_col).agg(
        F.date_trunc("week", F.min(ts_col)).cast("date").alias("cohort_week")
    )
    joined = df.select(user_col, ts_col).join(first, user_col)
    active = (
        joined.select(
            user_col,
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col(ts_col)).cast("date"),
                    F.col("cohort_week"),
                )
                / 7
            ).cast("int").alias("week_offset"),
        )
        .filter(F.col("week_offset") < max_weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
    sizes = first.groupBy("cohort_week").agg(
        F.countDistinct(user_col).alias("cohort_size")
    )
    return active.join(sizes, "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Densified daily resample: every (key, day) cell of the full
    observed date range, zero-filled counts/sums, plus a forward-fill of
    the last observed daily mean (``last(..., ignorenulls)``).

    The calendar spine is a 1-row min/max aggregate exploded through
    ``sequence()`` and crossed with the distinct-key dim — both sides
    broadcast-sized, so densification adds no fact-table shuffle beyond
    the daily pre-aggregation. The forward-fill window partitions by key,
    i.e. state is one running value per key.
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = df.select(F.col(key_col).alias("key"), day, F.col(value_col).alias("v")).groupBy(
        "key", "day"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("v"), 2).alias("value_sum"),
        F.round(F.avg("v"), 6).alias("_avg"),
    )
    bounds = df.select(F.to_date(F.col(ts_col)).alias("d")).agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    calendar = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    grid = calendar.crossJoin(F.broadcast(keys))
    filled = grid.join(daily, ["key", "day"], "left")
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return filled.select(
        "key",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
        F.last("_avg", ignorenulls=True).over(w).alias("carried_avg"),
    )


def interpolate_linear_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Linear interpolation over the densified daily series — the gap
    treatment forward fill (``gap_fill_daily``) cannot express: an
    interior missing day takes ``prev + (next − prev) · Δ/span`` between
    its surrounding OBSERVED days; leading/trailing gaps (no anchor on
    one side) stay NULL, pandas' ``interpolate(limit_area='inside')``
    contract.

    Spark shape: the same broadcast-sized calendar×keys spine as
    gap_fill_daily (no fact-table shuffle beyond the daily
    pre-aggregation), then ONE window Exchange per key serving four
    anchor columns — prev/next observed day and value via
    last/first(ignorenulls) over mirrored frames. State per key is one
    running anchor in each direction regardless of gap length.

    Exactness contract: anchors are the 6dp-rounded daily means (the
    gap_fill discipline — rounding absorbs summation-order divergence),
    the interpolation expression is the identical IEEE op sequence in
    both engines, and the emitted value is scaled to MICRO units with
    ``floor(x·10⁶ + 0.5)`` as BIGINT (the repo's half-boundary contract:
    engine round() half-rules differ; floor(+0.5) does not).
    """
    day = F.to_date(F.col(ts_col)).alias("day")
    daily = (
        df.select(F.col(key_col).alias("key"), day, F.col(value_col).alias("v"))
        .groupBy("key", "day")
        .agg(F.round(F.avg("v"), 6).alias("av"))
    )
    bounds = df.select(F.to_date(F.col(ts_col)).alias("d")).agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    )
    calendar = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    keys = df.select(F.col(key_col).alias("key")).distinct()
    grid = calendar.crossJoin(F.broadcast(keys))
    filled = grid.join(daily, ["key", "day"], "left")
    wb = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    anchored = filled.select(
        "key",
        "day",
        "av",
        F.last(
            F.when(F.col("av").isNotNull(), F.col("day")), ignorenulls=True
        ).over(wb).alias("pd"),
        F.last("av", ignorenulls=True).over(wb).alias("pv"),
        F.first(
            F.when(F.col("av").isNotNull(), F.col("day")), ignorenulls=True
        ).over(wf).alias("nd"),
        F.first("av", ignorenulls=True).over(wf).alias("nv"),
    )
    interp = F.when(F.col("av").isNotNull(), F.col("av")).otherwise(
        F.when(
            F.col("pd").isNotNull() & F.col("nd").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                F.datediff(F.col("day"), F.col("pd")).cast("double")
                / F.datediff(F.col("nd"), F.col("pd")).cast("double")
            ),
        )
    )
    return anchored.select(
        "key",
        "day",
        F.col("av").alias("observed_avg"),
        F.floor(interp * F.lit(1_000_000.0) + F.lit(0.5))
        .cast("long")
        .alias("interp_micro"),
    )


def event_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """First-order Markov transition model over per-user event sequences:
    for every ordered (prev_type → next_type) step, its count and the
    conditional probability P(next | prev).

    One Exchange on the user key + one sort serves the lag; the rollup
    to the |types|² transition matrix is a hash aggregate whose output is
    metadata-sized, and the row-probability normalization is a window SUM
    over that tiny matrix — NOT a join back to a second totals aggregate,
    which would duplicate the fact-scan subtree in the plan (Spark does
    not share unmaterialized subtrees; the audit measured 6 Exchanges in
    the join form vs 3 here). Ties in the timestamp are broken by
    ``tiebreak_col`` so the sequence — and therefore the matrix — is
    deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    steps = (
        df.select(
            F.col(user_col),
            F.col(type_col).alias("next_type"),
            F.lag(type_col).over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_steps"))
    )
    w_prev = Window.partitionBy("prev_type")
    return steps.select(
        "prev_type",
        "next_type",
        "n_steps",
        F.round(
            F.col("n_steps") * 1.0 / F.sum("n_steps").over(w_prev), 6
        ).alias("p_next"),
    )


def pattern_funnel_negation(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[tuple[str, str | None]],
    id_col: str = "event_id",
) -> DataFrame:
    """k-step ordered pattern match with PER-STEP negation — the general
    MATCH_RECOGNIZE shape ``A ⇒ B (no X between) ⇒ C (no Y between)``
    that single-anchor negation (``ext_pattern_negation``) covers only
    for k = 2. ``steps`` is ordered ``[(match_type, negated_type), …]``;
    the first step's negation slot is ignored (there is no prior anchor
    to guard).

    Composition rule (conditional running-max anchors): an event of
    ``steps[i]`` is *qualified* iff the running max of qualified
    step-``i-1`` timestamps is set AND the running max of the negated
    type is at-or-before it — i.e. no negated event landed strictly
    after the most recent qualified predecessor. ``q_i`` is then the
    running max of qualified step-``i`` timestamps. Anchors use the
    default peer-inclusive RANGE frame, so timestamp ties resolve by
    set-max in both engines — deterministic without an id tiebreak.

    Cost model (the 100 TB claim): every negation running-max is
    computable in the FIRST window pass; each later step adds one Window
    node that depends on the previous one's output — but all windows
    share one (user) partitioning and one sort, so Catalyst plans ONE
    Exchange and ONE Sort for the whole k-step chain: no joins, no
    per-pattern state machine, no extra shuffle per step. Plan-pinned in
    tests/test_plans.py.

    Output: one row per qualified FINAL-step event with its ``id_col``
    value, timestamp, and the anchor timestamp of the previous step."""
    if len(steps) < 2:
        raise ValueError("pattern_funnel_negation needs at least 2 steps")
    w = Window.partitionBy(user_col).orderBy(ts_col)
    # first pass: running max per negated type (all computable up front)
    neg_types = sorted({n for _m, n in steps[1:] if n is not None})
    cur = df.select(
        user_col,
        id_col,
        type_col,
        ts_col,
        *[
            F.max(F.when(F.col(type_col) == n, F.col(ts_col)))
            .over(w)
            .alias(f"_last_neg_{n}")
            for n in neg_types
        ],
        F.max(F.when(F.col(type_col) == steps[0][0], F.col(ts_col)))
        .over(w)
        .alias("_q0"),
    )
    # each subsequent step: one more Window node over the SAME spec
    for i, (match_type, neg_type) in enumerate(steps[1:], start=1):
        prev = F.col(f"_q{i - 1}")
        qualified = (F.col(type_col) == match_type) & prev.isNotNull()
        if neg_type is not None:
            neg = F.col(f"_last_neg_{neg_type}")
            qualified = qualified & (neg.isNull() | (neg <= prev))
        if i == len(steps) - 1:
            return cur.filter(qualified).select(
                F.col(user_col),
                F.col(id_col).alias("match_id"),
                F.col(ts_col).alias("match_ts"),
                prev.alias("anchor_ts"),
            )
        cur = cur.withColumn(
            f"_q{i}",
            F.max(F.when(qualified, F.col(ts_col))).over(w),
        )
