"""Multi-micro-batch streaming: with maxFilesPerTrigger=1 a 4-file source
produces 4 micro-batches; the foreachBatch upsert must commit one snapshot
per non-empty batch and converge to exactly the source rows."""

from __future__ import annotations

from component_iceberg_spark.io.snaptable import SnapCatalog
from component_iceberg_spark.io.tables import load_table
from component_iceberg_spark.streaming import events as SE


def test_multibatch_upsert_one_snapshot_per_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)

    raw = (
        spark.readStream.schema(
            "event_id long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("event_id", "user_id", "event_type", "value")
    )
    cat = SnapCatalog(str(tmp_path / "wh"))
    SE.stream_upsert_into(raw, cat, "ns", "events", keys=["event_id"])

    snaps = cat.snapshots(spark, "ns", "events").collect()
    assert len(snaps) == 4, f"expected one commit per micro-batch, got {len(snaps)}"
    assert cat.read(spark, "ns", "events").count() == ev.count()
