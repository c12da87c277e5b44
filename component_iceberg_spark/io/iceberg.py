"""Iceberg Spark connector gateway (production path).

The reference talks to an Iceberg REST catalog
(``components/ex-iceberg/src/component.py:88-96``,
``components/wr-iceberg/src/component.py:130-142``). On a real cluster this
engine does the same through the Iceberg Spark connector — every operator in
this repo takes DataFrames, so the only difference is the source/sink:

    spark = get_spark(extra_conf=iceberg_conf("prod", uri, warehouse, token))
    df = spark.read.table("prod.ns.tbl")                    # scan_full
    spark.read.option("snapshot-id", sid).table(...)        # scan_snapshot
    df.writeTo("prod.ns.tbl").append()                      # sink_iceberg_append
    df.writeTo("prod.ns.tbl").createOrReplace()             # sink_iceberg_replace
    spark.sql("MERGE INTO prod.ns.t USING s ON ... WHEN MATCHED ...")  # upsert

The connector jar is not present in this container, so
:func:`connector_available` gates it; tests exercise the same semantics via
:mod:`component_iceberg_spark.io.snaptable`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

ICEBERG_CLASS = "org.apache.iceberg.spark.SparkCatalog"


def iceberg_conf(
    name: str, uri: str, warehouse: str, token: str | None = None
) -> dict[str, str]:
    """SparkSession config block for an Iceberg REST catalog — the Spark
    equivalent of the reference's ``RestCatalog(name, warehouse, uri,
    token)``."""
    conf = {
        f"spark.sql.catalog.{name}": ICEBERG_CLASS,
        f"spark.sql.catalog.{name}.type": "rest",
        f"spark.sql.catalog.{name}.uri": uri,
        f"spark.sql.catalog.{name}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }
    if token:
        conf[f"spark.sql.catalog.{name}.token"] = token
    return conf


def connector_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(ICEBERG_CLASS)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def merge_upsert_sql(target: str, source_view: str, keys: list[str]) -> str:
    """The MERGE statement the upsert operator issues on a real Iceberg
    catalog — semantics identical to SnapCatalog.upsert (matched → update
    all columns, unmatched → insert)."""
    on = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    return (
        f"MERGE INTO {target} t USING {source_view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
