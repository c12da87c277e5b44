"""Structured Streaming operators over the events stream.

The reference is a batch connector (SURVEY §1.1: no streaming surface);
these extend the engine to streaming ingestion, the shape a production
deployment uses for continuous Iceberg writes:

- windowed aggregation with watermarks (late-data bound),
- foreachBatch → snapshot-table upsert (streaming MERGE into the lake,
  exactly the continuous version of the reference's batch-pump loop in
  ``wr-iceberg/src/component.py:97-110`` — but one atomic commit per
  micro-batch instead of per 5M-row client batch),
- applyInPandasWithState for custom stateful logic.

Local tests drive a bounded parquet directory with ``availableNow`` so the
stream runs to completion synchronously; swapping the source for Kafka
changes one line.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema-probe memo: the batch read that discovers the physical ts type
# is metadata-only but still lists the directory and parses a footer per
# call. One probe per (session, path, stage-fingerprint) is enough; the
# fingerprint term invalidates the memo when the staging layer rebuilds a
# fixture dir IN PLACE with different content (queries_streaming restages
# when the source fingerprint changes — a (session, path)-only key would
# keep serving the stale physical ts type). Entries from dead sessions
# are evicted on access (same lifecycle rule as queries_text._PAIRS_CACHE).
_SCHEMA_CACHE: dict[tuple[str, str, str], T.StructType] = {}


def _stage_fingerprint(path: str) -> str:
    """Cheap content fingerprint of a staged stream dir: the _SRC sidecar
    written by the staging layer when present (one tiny file read — no
    footer parse), else the directory mtime (changes whenever files are
    added/removed/rewritten)."""
    import os

    sidecar = os.path.join(path, "_SRC")
    try:
        with open(sidecar) as f:
            return f.read().strip()
    except OSError:
        try:
            return str(os.stat(path).st_mtime_ns)
        except OSError:
            return "?"


def _scanned_schema(spark: SparkSession, path: str) -> T.StructType:
    app_id = spark.sparkContext.applicationId
    key = (app_id, path, _stage_fingerprint(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        for k in [
            k for k in _SCHEMA_CACHE
            if k[0] != app_id or (k[1] == path and k[2] != key[2])
        ]:
            del _SCHEMA_CACHE[k]
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    return schema


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of the events table.

    The file stream source requires an explicit schema, but the fixture's
    ``ts`` physical type varies (TIMESTAMP(MICROS) scans natively as a
    timestamp; TIMESTAMP(NANOS) scans as LongType under ``nanosAsLong``).
    Forcing one guess corrupts the other, so probe the actual scanned
    schema with a batch read (metadata-only — no data job runs) and apply
    the same conditional ns→µs normalization as the batch loader
    (integer ``div``, never double math — ns-since-epoch exceeds the
    53-bit double mantissa)."""
    from component_iceberg_spark.io.tables import ensure_session_conf

    ensure_session_conf(spark)
    scanned = _scanned_schema(spark, path)
    raw = spark.readStream.schema(scanned).parquet(path)
    if isinstance(scanned["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Watermarks require TIMESTAMP (not NTZ); with the session timezone
    # pinned to UTC this cast is value-preserving vs the oracle's naive view.
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def run_to_completion(writer, spark: SparkSession) -> None:
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()


def dir_bytes(path: str) -> int:
    """Total bytes of the staged stream-source files (top-level only —
    staged dirs are flat), the input-volume signal state sizing keys on."""
    import os as _os

    total = 0
    try:
        for entry in _os.scandir(path):
            if entry.is_file() and not entry.name.startswith(("_", ".")):
                total += entry.stat().st_size
    except OSError:
        return 0
    return total


def scaled_state_partitions(
    spark: SparkSession,
    input_bytes: int,
    per_partition_bytes: int = 16 << 20,
    floor: int = 8,
) -> int:
    """Scale-adaptive state-partition count for a stateful streaming run.

    A stateful operator's partition count is pinned at query start from
    ``spark.sql.shuffle.partitions`` and is NOT AQE-coalescible (the
    state layout is part of the checkpoint), so a fixed session constant
    is wrong at one end of the scale: each state partition costs a fixed
    per-micro-batch overhead (store open + commit + coordinator RPC —
    measured ~15 ms/partition/batch on the bounded fixture, addBatch
    1.3 s @ 32 partitions vs 0.65 s @ 8 for the same data), while large
    inputs need the cluster-tuned width. Derive the count from the
    source's input volume: one partition per ~16 MB, floored at ``floor``
    (keeps small runs parallel enough for the agg CPU), capped at the
    session default — the production ceiling stays whatever the cluster
    operator tuned, so at 100 TB this returns the session value
    unchanged and only right-sizes the small end (guide §2.2's
    "fewer, larger partitions", applied to state stores)."""
    default = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if input_bytes <= 0:
        return default
    return max(min(floor, default), min(default, input_bytes // per_partition_bytes + 1))


def fixed_plan_scope(
    spark: SparkSession, src: str | int, threshold_bytes: int = 64 << 20
):
    """Scoped AQE bypass for a bounded BATCH-SIZED multi-stage pipeline
    (guide §1.2 step 3 — config only after the algorithm is right, and
    scale-parameterised like :func:`state_scope` / ``kernel_width``).

    AQE materializes every exchange as its own stage-job and re-runs the
    optimizer on the remaining plan after each one — driver work
    proportional to PLAN size, paid per stage regardless of data size.
    The incremental dedup screen's plan is huge (2×K md5 signature
    lanes, banded joins, anti-joins: ~30 stage-jobs per micro-batch)
    while its per-epoch data is batch-sized, so replanning dominates:
    measured 8.5→6.7 s median over interleaved process-isolated
    best-of-3 at sf0.1, identical results (AQE is physical-only).
    AQE's actual benefits — partition coalescing and skew splitting —
    need data-sized shuffles, and the screen's shuffle width is already
    pinned by :func:`state_scope`.

    Gated on the staged source's bytes: below ``threshold_bytes`` the
    scope disables AQE, at-or-above (or when the size is unknowable) it
    is a NO-OP, so at real scale the session's AQE policy stands
    untouched — the same no-op-at-scale construction as
    ``scaled_state_partitions``."""
    from contextlib import nullcontext

    from component_iceberg_spark.session import scoped_conf

    b = src if isinstance(src, int) else dir_bytes(src)
    if b <= 0 or b >= threshold_bytes:
        return nullcontext(spark)
    return scoped_conf(spark, **{"spark.sql.adaptive.enabled": "false"})


def state_scope(spark: SparkSession, src: str | int, floor: int = 8):
    """Context manager scoping ``spark.sql.shuffle.partitions`` to the
    scale-adaptive state-partition count for a bounded stateful run whose
    source is the staged dir ``src`` (or an explicit byte count). The
    conf is read once at stream start; restoring it on exit keeps the
    session default for everything else. Results are partition-count
    independent (hash aggregation / join semantics), only the state
    store fan-out changes.

    ``floor`` is the operator-shape knob: a streaming aggregation runs
    ONE state store per partition, a stream-stream join runs FOUR per
    partition per side (keyToNumValues + keyWithIndexToValue × 2 sides
    = 8 instances/partition/batch), so a join's fixed per-micro-batch
    commit cost is ~8× an aggregation's at the same partition count —
    join callers pass floor 2, the width whose per-batch store-commit
    budget matches the aggregation shape's floor 8 (progress-record
    evidence: ~1 s addBatch per 4-row sentinel batch at 8 partitions,
    halved at 4, ~600 ms commit still dominating at 4, ~10% more off
    at 2; floor 1 over-serializes the first real batch's join —
    measured worse; same results at every width)."""
    from component_iceberg_spark.session import scoped_conf

    n = scaled_state_partitions(
        spark, src if isinstance(src, int) else dir_bytes(src), floor=floor
    )
    return scoped_conf(spark, **{"spark.sql.shuffle.partitions": str(n)})


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts per event type with a watermark. At scale
    the state store holds one row per (window, type); the watermark bounds
    state retention for late data."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 3).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame, window: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window counts per event type with a watermark — the
    trending-detection aggregate. Each event lands in window/slide
    overlapping windows (2 here); the state store holds one row per
    (window, type) and the watermark bounds retention exactly as in the
    tumbling case — sliding windows change the fan-out constant, not the
    state shape, so the 100 TB story is identical."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def stream_to_memory(
    df: DataFrame,
    spark: SparkSession,
    mode: str,
    state_src: str | int | None = None,
    state_floor: int = 8,
) -> DataFrame:
    """Drive a bounded stream to completion into an in-memory sink and
    return the materialized result (test/demo harness). ``state_src``
    (a staged source dir or byte count) opts the run into scale-adaptive
    state partitioning; ``state_floor`` is the per-operator-shape floor
    (stream-stream joins pass 4) — see :func:`state_scope`."""
    return stream_to_memory_progress(
        df, spark, mode, state_src=state_src, state_floor=state_floor
    )[0]


def stream_to_memory_progress(
    df: DataFrame,
    spark: SparkSession,
    mode: str,
    state_src: str | int | None = None,
    state_floor: int = 8,
) -> tuple[DataFrame, list[dict]]:
    """Like :func:`stream_to_memory`, but also return the run's
    StreamingQueryProgress records as plain dicts — the raw material for
    state-VOLUME pins (``metrics.state_volume_from_progress``): peak
    stateOperators rows/bytes are how the "state is bounded by the key
    space, not the event volume" claims get measured instead of argued."""
    import contextlib
    import json

    name = f"stream_{uuid.uuid4().hex[:12]}"
    scope = (
        state_scope(spark, state_src, floor=state_floor)
        if state_src is not None
        else contextlib.nullcontext()
    )
    with scope:
        q = (
            df.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    prog = [
        json.loads(p if isinstance(p, str) else p.json)
        for p in (q.recentProgress or [])
    ]
    # recentProgress is a ring buffer capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100): a run
    # with more micro-batches silently loses its earliest records, which
    # would undercount input_rows and could miss the true state peak in
    # the volume pins. Fail loudly instead of returning truncated data.
    cap = int(
        spark.conf.get("spark.sql.streaming.numRecentProgressUpdates", "100")
    )
    if len(prog) >= cap:
        raise RuntimeError(
            f"recentProgress returned {len(prog)} records, at/over the "
            f"numRecentProgressUpdates cap ({cap}) — earliest progress was "
            "likely dropped; raise the cap for this run or batch the "
            "source into fewer micro-batches"
        )
    return df.sparkSession.table(name), prog


def stream_upsert_into(
    events: DataFrame,
    catalog,
    namespace: str,
    table: str,
    keys: list[str],
) -> None:
    """Continuous MERGE into the snapshot table: each micro-batch commits
    one upsert snapshot (atomic; per-batch granularity mirrors the
    reference's batch-pump, reference wr-iceberg/src/component.py:101-110).
    With the Iceberg connector this body becomes MERGE INTO (see
    io.iceberg.merge_upsert_sql)."""

    def commit(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        catalog.upsert(namespace, table, batch, keys=keys)

    run_to_completion(
        events.writeStream.outputMode("update").foreachBatch(commit),
        events.sparkSession,
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) emitted every micro-batch. State is one tiny
    tuple per user; timeouts would evict idle users in a real deployment."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, total_value double"
    state_schema = "n long, total double"

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 3)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_zscore_alerts(
    events: DataFrame, min_n: int = 30, k: float = 3.0
) -> DataFrame:
    """Streaming anomaly detection via per-key running moments
    (applyInPandasWithState): each event type carries ONE (n, mean, M2)
    Welford state tuple; every arriving row is scored against the stats
    of all PRIOR rows (strictly-preceding frame, so a spike never masks
    itself) and emitted as an alert when |z| > k after a min_n warm-up.

    Ordering contract: rows are processed in (ts, event_id) order within
    each micro-batch, and batches are assumed event-time ordered (the
    staged-fixture splitter and any replayed log satisfy this), so the
    alert set is independent of batch boundaries — state carries the
    exact prefix moments across batches. A group larger than
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` arrives as MULTIPLE
    Arrow chunks in arbitrary post-shuffle order, so the chunks are
    buffered and concatenated BEFORE the single global (ts, event_id)
    sort — sorting each chunk independently would only order within a
    chunk and break oracle parity for >10k-row groups. Scale: state is
    three doubles per key; the buffer holds one micro-batch of ONE key
    (bounded by trigger sizing, the same bound the Welford pass itself
    needs), no shuffle beyond the keyed exchange streaming already pays.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        "event_type string, event_id long, ts timestamp_ntz, "
        "value double, n_prev long, z double"
    )
    state_schema = "n long, mean double, m2 double"

    def update(key, pdfs, state: GroupState):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        out_type, out_id, out_ts, out_val, out_n, out_z = (
            [], [], [], [], [], []
        )
        # Buffer ALL Arrow chunks, then ONE global sort: chunk order is
        # not guaranteed post-shuffle, and per-chunk sorting would leave
        # interleaved timestamps mis-ordered for groups that span chunks.
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = (
                pd.concat(frames, ignore_index=True)
                if len(frames) > 1
                else frames[0]
            ).sort_values(["ts", "event_id"])
            for ts, eid, x in zip(
                pdf["ts"], pdf["event_id"], pdf["value"].astype(float)
            ):
                if n >= min_n and m2 > 0:
                    sd = float(np.sqrt(m2 / (n - 1)))
                    if sd > 0:
                        z = (x - mean) / sd
                        if abs(z) > k:
                            out_type.append(key[0])
                            out_id.append(int(eid))
                            out_ts.append(ts)
                            out_val.append(x)
                            out_n.append(n)
                            out_z.append(round(z, 3))
                # Welford update AFTER scoring: the row joins the stats
                # only for its successors (strictly-preceding frame)
                n += 1
                d = x - mean
                mean += d / n
                m2 += d * (x - mean)
        state.update((n, mean, m2))
        if out_type:  # empty yields trip pandas' all-NA concat warning
            yield pd.DataFrame(
                {
                    "event_type": out_type,
                    "event_id": out_id,
                    "ts": out_ts,
                    "value": out_val,
                    "n_prev": out_n,
                    "z": out_z,
                }
            )

    return events.groupBy("event_type").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: per-doc screen verdict column the seen store carries (r16): the
#: admitted relation is a FILTER over the single wide store instead of a
#: second table with its own commit — see :func:`admitted_docs`.
ADMIT_COL = "_admitted"


def admitted_docs(
    catalog,
    spark: SparkSession,
    namespace: str = "stream",
    seen_table: str = "seen",
) -> DataFrame:
    """The screen's admitted relation: seen-store rows whose stored
    ``_admitted`` verdict is true, with the internal columns (signature
    profile + verdict) dropped — shaped exactly like the r15 admitted
    TABLE's rows. Parquet column pruning means a consumer selecting doc
    columns reads neither the signatures nor the flag beyond the filter
    column, so the read I/O matches the separate-table layout while the
    WRITE side publishes one commit per epoch instead of two."""
    from component_iceberg_spark.operators import dedup as D

    sig_cols = [f"h{k}" for k in range(D.NUM_HASHES)] + ["n"]
    seen = catalog.read(spark, namespace, seen_table)
    return seen.filter(F.col(ADMIT_COL)).drop(*sig_cols, ADMIT_COL)


def screen_batch_incremental(
    catalog,
    batch: DataFrame,
    namespace: str = "stream",
    seen_table: str = "seen",
    threshold: float = 0.8,
) -> None:
    """One micro-batch of the incremental near-dup screen — REPLAY-
    IDEMPOTENT, and ONE COMMIT per epoch (r16; guide §1.2/§6 — the
    commit path is driver-serial per-statement work, so halving the
    statements halves that wall):

    - the prior set is the seen store MINUS the current batch's own doc
      ids (an anti-join): a half-committed replay, where the batch
      already landed in the seen store, reaches the same drop decision
      as the first attempt instead of self-matching every doc at
      jaccard 1.0;
    - the store is APPEND-ONLY with an already-present filter (an
      anti-join before the append): a replayed epoch appends nothing,
      and the write cost stays O(batch) — an upsert would be
      copy-on-write and, with interleaved id ranges across batches,
      rewrite ~the whole store every epoch.

    The seen store is ONE wide table: the raw doc rows, the signature
    PROFILE COLUMNS (``corpus_minhash_profile``: h0..hK, n), and the
    per-doc ``_admitted`` VERDICT. r15 folded the profile into the seen
    table (one commit fewer than the text + profile pair); r16 folds
    the admitted TABLE in as a boolean column, so an epoch publishes
    exactly one append — no second table, no second data write, no
    second footer walk/manifest publish, and no per-epoch
    already-present read of the admitted store. It also closes the old
    crash window between the two commits outright: the epoch's rows and
    verdicts land atomically in one snapshot. Parquet column pruning
    keeps candidate probing's I/O identical (signature columns only).

    Shingle-less docs (< SHINGLE_N tokens — no signature) are LEFT-join
    preserved (ADVICE r15): they persist to the store with NULL profile
    columns and are admitted (no shingles ⇒ they cannot verified-near-
    dup anything, exactly why the pair oracle never emits them); the
    candidate probe path filters NULL-profile rows out.

    The persisted signature tables built inside the dedup operators are
    released at the end of the batch (they are fully materialized by the
    commit) — without that, a long-running stream accumulates one
    cached signature table per micro-batch."""
    from pyspark import StorageLevel

    from component_iceberg_spark.operators import dedup as D

    sig_cols = [f"h{k}" for k in range(D.NUM_HASHES)] + ["n"]
    clash = set(batch.columns) & (set(sig_cols) | {"doc", ADMIT_COL})
    if clash:
        raise ValueError(
            f"batch columns collide with screen columns: {sorted(clash)}"
        )
    caches: list = []
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        spark = batch.sparkSession
        # the batch's profile (signatures + shingle counts) is computed
        # ONCE — it probes the stored profile, drives the intra-batch
        # dedup, and becomes the rows appended to the store, so the
        # K-way md5 signing cost is paid once per doc EVER
        batch_profile = D.corpus_minhash_profile(
            batch, "doc_id", "text"
        ).persist(StorageLevel.MEMORY_AND_DISK)
        caches.append(batch_profile)
        # the rows the seen store persists: doc columns + profile
        # columns. LEFT join: a sub-shingle doc has no profile row and
        # an inner join would silently drop it from the store (ADVICE
        # r15) — and, with the admitted relation now derived from the
        # store, from the admitted output too.
        wide_batch = batch.join(
            batch_profile.withColumnRenamed("doc", "doc_id"), "doc_id", "left"
        )
        have_seen = catalog.table_exists(namespace, seen_table)
        if have_seen:
            # stored profile COLUMNS answer candidate generation; stored
            # text is only read candidate-restricted inside the
            # verification stage — per-batch cost is O(batch + candidates),
            # never a corpus re-sign. NULL-profile rows (sub-shingle
            # docs) are excluded from the probe: they have no bands.
            seen_full = catalog.read(spark, namespace, seen_table)
            prior_profile = seen_full.filter(
                F.col("n").isNotNull()
            ).select(
                F.col("doc_id").alias("doc"), *sig_cols
            ).join(
                batch.select(F.col("doc_id").alias("doc")), "doc", "left_anti"
            )
            prior = seen_full.drop(*sig_cols, ADMIT_COL).join(
                batch.select("doc_id"), "doc_id", "left_anti"
            )
        else:
            prior = prior_profile = None
        # ONE fused candidate+verify pipeline covers both drop sources
        # (own lower-id rows and the whole seen corpus) — see
        # dedup.screened_drop_ids for why fusing halves the epoch's stages
        dropped = D.screened_drop_ids(
            batch, batch_profile, "doc_id", "text", threshold,
            prior=prior, prior_profile=prior_profile,
        )
        flagged = wide_batch.join(
            dropped.withColumn("_dropped", F.lit(True)), "doc_id", "left"
        ).withColumn(ADMIT_COL, F.col("_dropped").isNull()).drop("_dropped")
        # Output-file sizing (guide §6): the epoch's append is batch-row
        # sized, but its plan ends at the screen's shuffle width, so an
        # un-coalesced write lands one near-empty parquet file PER
        # PARTITION — and every LATER epoch's three store scans (profile
        # probe, candidate text, already-present anti-join) then pay one
        # split per tiny file (r16 profile: commit wall grew
        # 1.28→1.55→1.98 s across epochs, tracking 8N accumulated
        # files). Cap the commit's files at the micro-batch's own input
        # width — output rows ∝ input rows, so files ∝ input partitions
        # is right-sized by construction at every scale, and only the
        # light post-exchange tail (the flag join) narrows; the heavy
        # sign/verify stages sit upstream of their exchanges.
        width = max(1, batch.rdd.getNumPartitions())
        if have_seen:
            # no isEmpty guard: it would evaluate the anti-join a second
            # time just to (rarely) skip an append; an empty append on a
            # replayed epoch is a harmless empty commit
            new_seen = flagged.join(
                seen_full.select("doc_id"), "doc_id", "left_anti"
            )
            catalog.append(namespace, seen_table, new_seen.coalesce(width))
        else:
            catalog.create_or_replace(
                namespace, seen_table, flagged.coalesce(width)
            )
    finally:
        batch.unpersist()
        for c in caches:
            c.unpersist()


def stream_incremental_dedup(
    docs: DataFrame,
    catalog,
    namespace: str = "stream",
    seen_table: str = "seen",
    threshold: float = 0.8,
) -> None:
    """Continuous near-dup screening: each micro-batch of documents is
    MinHash-verified against (a) its own lower-id rows and (b) every
    document seen in ANY earlier batch, and only the survivors carry an
    ``_admitted`` verdict in the seen store (read them back with
    :func:`admitted_docs`) — the streaming form of the incremental
    corpus dedup (`operators.dedup.incremental_minhash_pairs`), i.e.
    what a continuously-ingesting 100 TB pipeline runs instead of
    re-deduping the whole corpus per drop.

    Drop rule (deterministic given batch order): a doc is dropped iff it
    verified-near-dups any doc that is EARLIER in (batch, doc_id) order
    — seen docs count whether or not they were themselves admitted
    (conservative-drop, matching the pair semantics of
    ``dedup_minhash_lsh``). Crash-replay safety and per-batch cache
    release are :func:`screen_batch_incremental`'s contract.

    Scale note: the seen store persists the raw (doc_id, text) rows (the
    audit/verify source) WITH their signature-profile columns (h0..hK,
    n) AND the per-doc admitted verdict in one wide table — ONE commit
    per epoch: each batch is signed ONCE, the stored profile columns are
    probed band-by-band for candidates (parquet column pruning — probe
    I/O reads signatures only), and only candidate pairs are verified —
    O(batch + candidates) per epoch with no corpus re-sign (see
    :func:`screen_batch_incremental`, the fused
    ``dedup.screened_drop_ids`` pass, and the same layout in
    ``operators.dedup.incremental_minhash_pairs``)."""

    def screen(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        screen_batch_incremental(
            catalog, batch, namespace, seen_table, threshold
        )

    run_to_completion(
        docs.writeStream.outputMode("append").foreachBatch(screen),
        docs.sparkSession,
    )
