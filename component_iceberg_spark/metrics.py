"""Runtime shuffle/input VOLUME measurement — the numeric side of the
plan-shape pins.

Plan-shape tests prove an Exchange sits after the partial aggregate;
this module proves what the exchange CARRIES. `run_with_volume` executes
an action and returns the bytes the new stages read from storage
(`input_bytes`), wrote to shuffle (`shuffle_write_bytes`), and read back
from shuffle (`shuffle_read_bytes`) — so claims like "the only shuffled
rows are partial aggregation states" or "dedup happens BEFORE the
fan-out" become measured byte ratios instead of topology arguments. At
100 TB the difference between shuffling the fact table and shuffling
partial states IS the query budget; these numbers are how the repo pins
that difference at fixture scale (bench.py sf1 section) and in pytest
(tests/test_shuffle_volume.py).

Implementation: Spark's in-process AppStatusStore (the store that backs
the UI/REST API — populated even with ``spark.ui.enabled=false``), read
through py4j. Stage metrics are attributed by stage-id watermark: every
stage whose id is new since the snapshot belongs to the measured action
(callers own the session while measuring — same contract as the bench's
wall-clock timings). The listener bus is drained before reading so
late-arriving task-end events are counted.

SHUFFLE bytes come from the serializer-level task counters and are
reliable everywhere. STAGE input bytes are NOT the denominator to trust
in local mode: the vectorized parquet reader bypasses the Hadoop
FileSystem statistics that feed ``inputMetrics.bytesRead`` (measured: a
full scan of a 1 MB parquet file reports ~6 KB). ``source_bytes`` —
the on-disk size of the tables a query reads, exactly what a 100 TB
deployment means by "input" — is the honest denominator; the stage
number is still captured for reference.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class VolumeMetrics:
    input_bytes: int  # stage-reported; under-reports in local mode
    shuffle_write_bytes: int
    shuffle_read_bytes: int
    wall_sec: float
    n_stages: int

    def as_dict(self) -> dict:
        return {
            "input_bytes_stage_reported": self.input_bytes,
            "shuffle_write_bytes": self.shuffle_write_bytes,
            "shuffle_read_bytes": self.shuffle_read_bytes,
            "wall_sec": round(self.wall_sec, 3),
            "n_stages": self.n_stages,
        }


def source_bytes(sf_dir: str, tables: tuple[str, ...]) -> int:
    """On-disk bytes of the fixture tables a query reads — the input
    denominator for shuffle-volume ratios (see module docstring for why
    stage-reported input bytes are not trusted locally). Parquet tables
    may be single files or directories of part files."""
    total = 0
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith((".", "_"))
                )
        else:
            total += os.path.getsize(p)
    return total


def _stage_list(spark: SparkSession):
    """All stages the AppStatusStore currently retains, as Java
    ``v1.StageData`` objects. ``stageList`` has Scala default args, so
    fetch them via the compiler-generated ``$default$N`` accessors (the
    only py4j-compatible way to call it)."""
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    empty = sc._jvm.java.util.ArrayList()
    defaults = [
        getattr(store, f"stageList$default${i}")() for i in (2, 3, 4, 5)
    ]
    seq = store.stageList(empty, *defaults)
    return [seq.apply(i) for i in range(seq.size())]


def _drain_listener_bus(spark: SparkSession) -> None:
    """Metrics reach the status store asynchronously (listener bus);
    drain it so the stages we read reflect every finished task."""
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty()
    except Exception:
        time.sleep(0.5)  # best-effort fallback: bus drains in ms normally


def run_with_volume(spark: SparkSession, action) -> VolumeMetrics:
    """Run ``action()`` (anything that triggers Spark jobs) and return
    the volume metrics of exactly the stages it created."""
    _drain_listener_bus(spark)
    before = {(s.stageId(), s.attemptId()) for s in _stage_list(spark)}
    t0 = time.perf_counter()
    action()
    wall = time.perf_counter() - t0
    _drain_listener_bus(spark)
    new = [
        s
        for s in _stage_list(spark)
        if (s.stageId(), s.attemptId()) not in before
    ]
    return VolumeMetrics(
        input_bytes=sum(s.inputBytes() for s in new),
        shuffle_write_bytes=sum(s.shuffleWriteBytes() for s in new),
        shuffle_read_bytes=sum(s.shuffleReadBytes() for s in new),
        wall_sec=wall,
        n_stages=len(new),
    )


def dataframe_volume(df: DataFrame) -> VolumeMetrics:
    """Fully materialize ``df`` through the noop sink (no collect — the
    driver never holds the rows) and return its volume metrics."""
    spark = df.sparkSession
    return run_with_volume(
        spark, lambda: df.write.format("noop").mode("overwrite").save()
    )


@dataclass
class StateVolume:
    """Streaming state-store volume, summarized from a query's
    ``StreamingQueryProgress`` records — the stream-side sibling of
    :class:`VolumeMetrics`. A streaming operator's 100 TB viability is
    its STATE bound, not its wall clock: a windowed aggregate must hold
    |window × key| rows regardless of event volume, a stream dedup
    |distinct keys|, a stream-stream interval join |rows in the
    watermark band|. ``peak_rows``/``peak_bytes`` are the max across
    batches of the summed stateOperators counters; ``input_rows`` is the
    total rows the source delivered — the denominator a saturation pin
    doubles while requiring the peak to stay flat."""

    peak_rows: int
    peak_bytes: int
    input_rows: int
    n_stateful_batches: int

    def as_dict(self) -> dict:
        return {
            "peak_state_rows": self.peak_rows,
            "peak_state_bytes": self.peak_bytes,
            "input_rows": self.input_rows,
            "n_stateful_batches": self.n_stateful_batches,
        }


def state_volume_from_progress(progress: list[dict]) -> StateVolume:
    """Summarize a list of StreamingQueryProgress dicts (as returned by
    ``events.stream_to_memory_progress``) into a :class:`StateVolume`.

    ``memoryUsedBytes`` is the HDFS-backed provider's loaded-map size;
    the RocksDB provider reports the same key (backed by its own memory
    accounting), so the summary is provider-agnostic."""
    peak_rows = 0
    peak_bytes = 0
    input_rows = 0
    stateful = 0
    for p in progress:
        input_rows += int(p.get("numInputRows") or 0)
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        stateful += 1
        peak_rows = max(
            peak_rows, sum(int(o.get("numRowsTotal") or 0) for o in ops)
        )
        peak_bytes = max(
            peak_bytes,
            sum(int(o.get("memoryUsedBytes") or 0) for o in ops),
        )
    return StateVolume(
        peak_rows=peak_rows,
        peak_bytes=peak_bytes,
        input_rows=input_rows,
        n_stateful_batches=stateful,
    )
