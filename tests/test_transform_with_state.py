"""transformWithStateInPandas — Spark 4's successor to
applyInPandasWithState (StatefulProcessor: named state variables,
timers, TTL). ENVIRONMENT-GATED: the API's driver worker speaks
protobuf to the JVM state server (`pyspark.sql.streaming.proto`), and
`google.protobuf` is not installed in this container — the probe
documented below crashes the TWS driver worker with `ImportError:
cannot import name 'descriptor' from 'google.protobuf'`. The test
skips cleanly until the dependency lands (the
tests/test_iceberg_connector.py discipline), at which point it pins the
modern API's twin of `stream_stateful_totals`: per-user running totals
in a ValueState, final emission per user equal to the batch GROUP BY.
"""

from __future__ import annotations

import glob
import os
import shutil

import pytest


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_running_totals(spark, sf_dir, tmp_path):
    if not _have_protobuf():
        pytest.skip(
            "google.protobuf not installed — transformWithState's "
            "driver worker requires it (see module docstring)"
        )
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from component_iceberg_spark.io.tables import load_table
    from component_iceberg_spark.session import scoped_conf

    base = str(tmp_path)
    src = os.path.join(base, "src")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    stage = os.path.join(base, "stage")
    ev.coalesce(1).write.mode("overwrite").parquet(stage)
    shutil.move(
        glob.glob(os.path.join(stage, "part-*.parquet"))[0],
        os.path.join(src, "events.parquet"),
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self.state = handle.getValueState("agg", "n LONG, total DOUBLE")

        def handleInputRows(self, key, rows, timer_values):
            n, total = self.state.get() if self.state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.state.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 3)],
                }
            )

        def close(self):
            pass

    stream = spark.readStream.schema("user_id long, value double").parquet(
        src
    )
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    with scoped_conf(
        spark,
        **{
            provider_key: "org.apache.spark.sql.execution.streaming."
            "state.RocksDBStateStoreProvider"
        },
    ):
        out = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=Totals(),
            outputStructType=(
                "user_id long, n_events long, total_value double"
            ),
            outputMode="Update",
            timeMode="None",
        )
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_totals")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emitted = spark.table("tws_totals")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    final = (
        emitted.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
    )
    expect = {
        (r.user_id, r.n, r.t)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 3).alias("t"),
        )
        .collect()
    }
    got = {
        (r.user_id, r.n_events, r.total_value) for r in final.collect()
    }
    assert got == expect
