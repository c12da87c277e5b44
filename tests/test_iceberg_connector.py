"""Iceberg Spark connector integration — runs ONLY when the
iceberg-spark-runtime jar is on the classpath; skips cleanly otherwise
(this container has no jar, a jar-equipped environment executes it).

Exercises the production path the reference uses (REST catalog reads:
``ex-iceberg/src/component.py:30-40``; transactional writes:
``wr-iceberg/src/component.py:104-126``) through the same operator
surface as the SnapCatalog tests: create/append, snapshot time travel
(``VERSION AS OF``), MERGE upsert, snapshot enumeration.
"""

from __future__ import annotations

import pytest

from component_iceberg_spark.io.iceberg import (
    IcebergSparkCatalog,
    connector_available,
    hadoop_conf,
)
from component_iceberg_spark.io.tables import load_table


@pytest.fixture()
def iceberg_cat(spark, tmp_path):
    if not connector_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    name = "itest"
    for k, v in hadoop_conf(name, str(tmp_path / "icewh")).items():
        spark.conf.set(k, v)
    return IcebergSparkCatalog(name)


def test_connector_append_timetravel_merge(spark, sf_dir, iceberg_cat):
    cat = iceberg_cat
    n = load_table(spark, sf_dir, "nation")

    cat.create_or_replace("ns", "nation", n.filter("n_regionkey < 2"))
    first_count = cat.read(spark, "ns", "nation").count()
    assert first_count == n.filter("n_regionkey < 2").count()

    cat.append("ns", "nation", n.filter("n_regionkey >= 2"))
    assert cat.read(spark, "ns", "nation").count() == n.count()

    # snapshot time travel: first snapshot still shows the pre-append rows
    snaps = cat.snapshots(spark, "ns", "nation").orderBy("timestamp_ms")
    first_sid = snaps.first()["snapshot_id"]
    assert (
        cat.read(spark, "ns", "nation", snapshot_id=first_sid).count()
        == first_count
    )

    # MERGE upsert through the connector: matched rows update, new insert
    from pyspark.sql import functions as F

    delta = n.filter("n_nationkey < 3").withColumn(
        "n_name", F.lit("UPDATED")
    )
    cat.upsert("ns", "nation", delta, keys=["n_nationkey"])
    out = cat.read(spark, "ns", "nation")
    assert out.count() == n.count()
    assert out.filter("n_name = 'UPDATED'").count() == 3


def test_connector_partitioned_write(spark, sf_dir, iceberg_cat):
    cat = iceberg_cat
    o = load_table(spark, sf_dir, "orders")
    cat.create_or_replace(
        "ns", "orders", o, partition_by=["o_orderstatus"]
    )
    got = cat.read(
        spark, "ns", "orders", where="o_orderstatus = 'F'"
    ).count()
    assert got == o.filter("o_orderstatus = 'F'").count()
