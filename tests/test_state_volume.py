"""Measured streaming STATE-volume pins — the stream-side sibling of
tests/test_shuffle_volume.py (same discipline: claims about boundedness
asserted as engine-reported counters, not plan topology).

A streaming operator survives 100 TB/day exactly when its state store is
bounded by a KEY SPACE the deployment controls (windows × types, distinct
dedup keys, watermark-band rows) and not by event volume. Each pin here
doubles the input while holding the key space fixed and requires the
peak stateOperators rows to stay EXACTLY flat (rows are deterministic;
bytes get small headroom for map-capacity noise):

- windowed aggregate: 2× events with identical timestamps/types →
  identical (window, type) state rows (measured 216 → 216 at sf0.01);
- stream dedup: 2× duplicate copies of every event_id → identical
  per-key dedup state rows (the extra copies only increase drops).
"""

from __future__ import annotations

import os
import shutil

import pytest

from component_iceberg_spark.metrics import state_volume_from_progress
from component_iceberg_spark.streaming import events as SE

SCRATCH = "/tmp/cis_scratch/state_vol_pins"


def _stage(spark, sf_dir: str, name: str, copies: int = 1, offset_ids=False):
    """Stage the events fixture into a fresh stream-source dir: either
    ``copies`` verbatim file copies (true duplicates — same event_ids) or
    one file with the rows doubled under offset event_ids (2× volume,
    identical timestamp/type space)."""
    from pyspark.sql import functions as F

    d = os.path.join(SCRATCH, name)
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    src = os.path.join(sf_dir, "events.parquet")
    if offset_ids:
        base = spark.read.parquet(src)
        dbl = base.unionByName(
            base.withColumn("event_id", F.col("event_id") + 10**9)
        )
        dbl.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, "staged")
        )
        inner = os.path.join(d, "staged")
        return inner
    for i in range(copies):
        shutil.copyfile(src, os.path.join(d, f"events_{i}.parquet"))
    return d


@pytest.fixture(scope="module", autouse=True)
def _cleanup():
    yield
    shutil.rmtree(SCRATCH, ignore_errors=True)


def _windowed_state(spark, src_dir):
    agg = SE.windowed_counts(SE.read_events_stream(spark, src_dir))
    df, prog = SE.stream_to_memory_progress(agg, spark, mode="complete")
    return df, state_volume_from_progress(prog)


def test_windowed_agg_state_is_window_space_bounded(spark, sf_dir):
    """Complete-mode tumbling aggregate: final state holds exactly one
    row per (hour-window, event_type) — the whole key space, nothing
    more — and doubling the EVENTS with identical timestamps/types
    leaves state rows exactly flat while input rows double."""
    from pyspark.sql import functions as F

    from component_iceberg_spark.io.tables import load_table

    base_dir = _stage(spark, sf_dir, "agg_base", copies=1)
    df1, sv1 = _windowed_state(spark, base_dir)
    # load_table, not a raw parquet read: the fixture's ts physical type
    # varies (a NANOS build scans as long) and the loader normalizes it
    # the same way the stream path does
    space = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("hour", "ts"), "event_type")
        .distinct()
        .count()
    )
    assert sv1.peak_rows == space, (sv1.as_dict(), space)
    assert sv1.peak_bytes > 0 and sv1.input_rows > 0

    dbl_dir = _stage(spark, sf_dir, "agg_dbl", offset_ids=True)
    df2, sv2 = _windowed_state(spark, dbl_dir)
    assert sv2.input_rows == 2 * sv1.input_rows, (
        sv1.as_dict(),
        sv2.as_dict(),
    )
    assert sv2.peak_rows == sv1.peak_rows, (sv1.as_dict(), sv2.as_dict())
    assert sv2.peak_bytes <= 1.3 * sv1.peak_bytes + 4096, (
        sv1.as_dict(),
        sv2.as_dict(),
    )
    # the aggregate VALUES see both copies (counts double), so the flat
    # state is genuinely 2x input into the same rows, not a short read
    n1 = df1.agg(F.sum("n_events")).collect()[0][0]
    n2 = df2.agg(F.sum("n_events")).collect()[0][0]
    assert n2 == 2 * n1


def test_stream_dedup_state_is_key_space_bounded(spark, sf_dir):
    """dropDuplicatesWithinWatermark keeps ONE state row per event_id:
    doubling the number of duplicate copies (2 → 4 file copies) doubles
    input rows but leaves peak state rows exactly |distinct event_id| —
    the extra copies are drops, not state."""
    from pyspark.sql import functions as F

    def run(copies: int):
        d = _stage(spark, sf_dir, f"dedup_x{copies}", copies=copies)
        ev = SE.read_events_stream(spark, d)
        deduped = (
            ev.withWatermark("ts", "10 minutes")
            .dropDuplicatesWithinWatermark(["event_id"])
            .select("event_id")
        )
        df, prog = SE.stream_to_memory_progress(deduped, spark, "append")
        return df, state_volume_from_progress(prog)

    keys = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id")
        .distinct()
        .count()
    )
    df2, sv2 = run(2)
    df4, sv4 = run(4)
    assert sv2.peak_rows == keys, (sv2.as_dict(), keys)
    assert sv4.peak_rows == keys, (sv4.as_dict(), keys)
    assert sv4.input_rows == 2 * sv2.input_rows, (
        sv2.as_dict(),
        sv4.as_dict(),
    )
    assert sv4.peak_bytes <= 1.3 * sv2.peak_bytes + 4096, (
        sv2.as_dict(),
        sv4.as_dict(),
    )
    # and the emitted set is the key space exactly, both times
    assert df2.count() == keys and df4.count() == keys


def test_session_window_state_is_session_space_bounded(spark, sf_dir):
    """Session-window aggregate: final state holds one row per merged
    (user, session) — doubling the events with identical (user, ts)
    space leaves the session set, and therefore peak state rows,
    exactly flat while input rows double."""
    from pyspark.sql import functions as F

    def run(name: str, offset_ids: bool):
        d = _stage(
            spark, sf_dir, name,
            copies=1 if not offset_ids else 1, offset_ids=offset_ids,
        )
        ev = SE.read_events_stream(spark, d)
        agg = (
            ev.withWatermark("ts", "10 minutes")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        df, prog = SE.stream_to_memory_progress(agg, spark, "complete")
        return df, state_volume_from_progress(prog)

    df1, sv1 = run("sess_base", offset_ids=False)
    n_sessions = df1.count()
    assert sv1.peak_rows == n_sessions, (sv1.as_dict(), n_sessions)

    df2, sv2 = run("sess_dbl", offset_ids=True)
    assert sv2.input_rows == 2 * sv1.input_rows, (
        sv1.as_dict(), sv2.as_dict(),
    )
    assert sv2.peak_rows == sv1.peak_rows, (sv1.as_dict(), sv2.as_dict())
    # the doubled copies land in the SAME sessions (counts double)
    n1 = df1.agg(F.sum("n_events")).collect()[0][0]
    n2 = df2.agg(F.sum("n_events")).collect()[0][0]
    assert n2 == 2 * n1


def test_custom_stateful_totals_state_is_user_space_bounded(spark, sf_dir):
    """applyInPandasWithState per-user running totals: the custom state
    store holds ONE tuple per user — doubling the events (same user
    space) doubles input rows and leaves peak state rows exactly
    |distinct user_id|."""
    from pyspark.sql import functions as F

    users = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("user_id")
        .distinct()
        .count()
    )

    def run(name: str, offset_ids: bool):
        d = _stage(spark, sf_dir, name, offset_ids=offset_ids)
        ev = SE.read_events_stream(spark, d)
        df, prog = SE.stream_to_memory_progress(
            SE.running_user_totals(ev), spark, "append"
        )
        return df, state_volume_from_progress(prog)

    df1, sv1 = run("totals_base", offset_ids=False)
    df2, sv2 = run("totals_dbl", offset_ids=True)
    assert sv1.peak_rows == users, (sv1.as_dict(), users)
    assert sv2.peak_rows == users, (sv2.as_dict(), users)
    assert sv2.input_rows == 2 * sv1.input_rows, (
        sv1.as_dict(), sv2.as_dict(),
    )
    # the state VALUES saw both copies: per-user counts double
    n1 = df1.agg(F.sum("n_events")).collect()[0][0]
    n2 = df2.agg(F.sum("n_events")).collect()[0][0]
    assert n2 == 2 * n1


def test_stream_stream_join_state_is_band_bounded(spark, sf_dir):
    """Stream-stream interval join (purchases ⋈ views within the
    preceding hour): watermarks bound the join state to the interval +
    watermark BAND, not the stream length. Driven as time-ordered
    micro-batches (maxFilesPerTrigger=1) so the watermark ratchets and
    old rows evict mid-run; DOUBLING the stream's time span (2× input
    rows, same per-window density) must leave peak state rows ~flat —
    an unbounded-state plan would double. Result equality vs the batch
    interval join is pinned both times."""
    import glob as _g

    from pyspark.sql import functions as F

    def run(name: str, doubled: bool):
        base_dir = os.path.join(SCRATCH, name)
        shutil.rmtree(base_dir, ignore_errors=True)
        src = os.path.join(base_dir, "src")
        os.makedirs(src)
        ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )
        if doubled:
            lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
            shift = (hi - lo) + __import__("datetime").timedelta(hours=2)
            ev = ev.unionByName(
                ev.select(
                    (F.col("event_id") + 10**9).alias("event_id"),
                    (F.col("ts") + F.lit(shift)).alias("ts"),
                    "user_id", "event_type",
                )
            )
        n_files = 8 if doubled else 4
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        span = (hi - lo) / n_files
        for i in range(n_files):
            a = lo + span * i
            cond = (F.col("ts") >= F.lit(a)) if i else F.lit(True)
            if i < n_files - 1:
                cond = cond & (F.col("ts") < F.lit(lo + span * (i + 1)))
            part_dir = os.path.join(base_dir, f"_t_{i}")
            ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(
                part_dir
            )
            (part,) = _g.glob(os.path.join(part_dir, "part-*.parquet"))
            dst = os.path.join(src, f"b{i:02d}.parquet")
            shutil.move(part, dst)
            shutil.rmtree(part_dir)
            t = 1_600_000_000 + i
            os.utime(dst, (t, t))
        schema = spark.read.parquet(src).schema
        st = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        p = (
            st.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "10 minutes")
        )
        v = (
            st.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "10 minutes")
        )
        joined = p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("view_ts") <= F.col("purchase_ts")),
        ).select("purchase_id", "view_id")
        df, prog = SE.stream_to_memory_progress(joined, spark, "append")
        # result equality vs the batch interval join
        bp = ev.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        bv = ev.filter("event_type = 'view'").select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        batch = bp.join(
            bv,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("view_ts") <= F.col("purchase_ts")),
        ).select("purchase_id", "view_id")
        got = sorted(tuple(r) for r in df.collect())
        want = sorted(tuple(r) for r in batch.collect())
        assert got == want, (len(got), len(want))
        return state_volume_from_progress(prog)

    sv1 = run("ssj_base", doubled=False)
    sv2 = run("ssj_dbl", doubled=True)
    # eviction works at all: peak state is a strict subset of the input
    assert 0 < sv1.peak_rows < sv1.input_rows, sv1.as_dict()
    # saturation: 2x the stream length, ~flat peak state (band-bounded)
    assert sv2.input_rows == 2 * sv1.input_rows, (
        sv1.as_dict(), sv2.as_dict(),
    )
    assert sv2.peak_rows <= 1.3 * sv1.peak_rows + 64, (
        sv1.as_dict(), sv2.as_dict(),
    )


def test_stream_stream_outer_join_state_band_bounded(spark, sf_dir):
    """LEFT-OUTER stream-stream interval join (r13): the outer variant
    holds left rows until the watermark proves no match can arrive, so
    it is the shape whose state famously leaks when the cleanup is
    wrong. Same discipline as the inner pin: time-ordered micro-batches
    + two far-future sentinel deliveries (both sides' watermarks must
    ratchet — the global watermark is their min) so every pending NULL
    row flushes; doubling the stream's time span (2× input, same
    per-window density) must leave peak state rows ~flat; result
    equality vs the batch LEFT JOIN pins that NULL emission is complete
    AND never premature (a dropped or duplicated outer row breaks the
    multiset compare)."""
    import datetime as dt
    import glob as _g

    from pyspark.sql import functions as F

    def run(name: str, doubled: bool):
        base_dir = os.path.join(SCRATCH, name)
        shutil.rmtree(base_dir, ignore_errors=True)
        src = os.path.join(base_dir, "src")
        os.makedirs(src)
        ev = spark.read.parquet(
            os.path.join(sf_dir, "events.parquet")
        ).select(
            "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "user_id", "event_type",
        )
        if doubled:
            lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
            shift = (hi - lo) + dt.timedelta(hours=2)
            ev = ev.unionByName(
                ev.select(
                    (F.col("event_id") + 10**9).alias("event_id"),
                    (F.col("ts") + F.lit(shift)).alias("ts"),
                    "user_id", "event_type",
                )
            )
        n_files = 8 if doubled else 4
        lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        span = (hi - lo) / n_files
        parts = []
        for i in range(n_files):
            a = lo + span * i
            cond = (F.col("ts") >= F.lit(a)) if i else F.lit(True)
            if i < n_files - 1:
                cond = cond & (F.col("ts") < F.lit(lo + span * (i + 1)))
            parts.append(ev.filter(cond))
        # two sentinel deliveries so the final band's NULL rows flush
        for j, days in enumerate((10, 20)):
            parts.append(
                spark.createDataFrame(
                    [
                        (-(2 * j + 1), hi + dt.timedelta(days=days),
                         -1, "purchase"),
                        (-(2 * j + 2), hi + dt.timedelta(days=days),
                         -2, "view"),
                    ],
                    schema="event_id long, ts timestamp, user_id long, "
                           "event_type string",
                )
            )
        for i, pdf in enumerate(parts):
            part_dir = os.path.join(base_dir, f"_t_{i}")
            pdf.coalesce(1).write.mode("overwrite").parquet(part_dir)
            (part,) = _g.glob(os.path.join(part_dir, "part-*.parquet"))
            dst = os.path.join(src, f"b{i:02d}.parquet")
            shutil.move(part, dst)
            shutil.rmtree(part_dir)
            t = 1_600_000_000 + i
            os.utime(dst, (t, t))
        schema = spark.read.parquet(src).schema
        st = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        p = (
            st.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "10 minutes")
        )
        v = (
            st.filter(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "10 minutes")
        )
        joined = p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts")
               >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("view_ts") <= F.col("purchase_ts")),
            "left_outer",
        ).select("purchase_id", "view_id")
        df, prog = SE.stream_to_memory_progress(joined, spark, "append")
        # sentinel drop AFTER the sink: a pre-sink left-column filter
        # would push below the join into the purchase scan and starve
        # the purchase-side watermark (see stream_stream_outer_join)
        df = df.filter(F.col("purchase_id") >= 0)
        bp = ev.filter("event_type = 'purchase'").select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("purchase_ts"),
        )
        bv = ev.filter("event_type = 'view'").select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        batch = bp.join(
            bv,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts")
               >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("view_ts") <= F.col("purchase_ts")),
            "left_outer",
        ).select("purchase_id", "view_id")
        got = sorted(
            tuple(r) for r in df.collect()
        )
        want = sorted(tuple(r) for r in batch.collect())
        assert got == want, (len(got), len(want))
        n_null = sum(1 for r in got if r[1] is None)
        assert n_null > 0, "scenario must exercise NULL emission"
        return state_volume_from_progress(prog)

    sv1 = run("ssoj_base", doubled=False)
    sv2 = run("ssoj_dbl", doubled=True)
    assert 0 < sv1.peak_rows < sv1.input_rows, sv1.as_dict()
    # each run stages 2 sentinel files x 2 rows, counted once per plan
    # leaf (the self-joined source has two): net out 8 sentinel rows
    assert sv2.input_rows - 8 == 2 * (sv1.input_rows - 8), (
        sv1.as_dict(), sv2.as_dict(),
    )
    assert sv2.peak_rows <= 1.3 * sv1.peak_rows + 64, (
        sv1.as_dict(), sv2.as_dict(),
    )
