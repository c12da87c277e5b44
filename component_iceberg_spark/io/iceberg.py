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

import uuid

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


def hadoop_conf(name: str, warehouse_dir: str) -> dict[str, str]:
    """Config block for a filesystem ("hadoop") Iceberg catalog — the
    jar-only path with no REST server, used by the gated integration test.
    Catalog plugin confs are resolved lazily, so these can be set on a
    running session (``spark.conf.set``) before first use of the name."""
    return {
        f"spark.sql.catalog.{name}": ICEBERG_CLASS,
        f"spark.sql.catalog.{name}.type": "hadoop",
        f"spark.sql.catalog.{name}.warehouse": warehouse_dir,
    }


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


class IcebergSparkCatalog:
    """SnapCatalog-compatible facade over a real Iceberg Spark catalog.

    Same method surface as :class:`~component_iceberg_spark.io.snaptable.
    SnapCatalog`, so :func:`component._catalog` can route to the connector
    when the jar is present and every operator body stays identical — only
    the source/sink swaps (the design promise in this module's docstring).
    Each method is a one-line translation to the connector API
    (reference semantics: ``ex-iceberg/src/component.py:30-40`` reads,
    ``wr-iceberg/src/component.py:104-126`` writes).
    """

    def __init__(self, name: str):
        self.name = name

    def _spark(self) -> SparkSession:
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession")
        return spark

    def _ident(self, namespace: str, table: str) -> str:
        return f"{self.name}.{namespace}.{table}"

    # -- namespaces --
    def create_namespace(self, namespace: str) -> None:
        self._spark().sql(
            f"CREATE NAMESPACE IF NOT EXISTS {self.name}.{namespace}"
        )

    def namespace_exists(self, namespace: str) -> bool:
        return namespace in self.list_namespaces()

    def list_namespaces(self) -> list[str]:
        rows = self._spark().sql(f"SHOW NAMESPACES IN {self.name}").collect()
        return sorted(r[0] for r in rows)

    def list_tables(self, namespace: str) -> list[str]:
        rows = self._spark().sql(
            f"SHOW TABLES IN {self.name}.{namespace}"
        ).collect()
        return sorted(r["tableName"] for r in rows)

    def table_exists(self, namespace: str, table: str) -> bool:
        return self._spark().catalog.tableExists(self._ident(namespace, table))

    def drop_table(self, namespace: str, table: str) -> None:
        self._spark().sql(f"DROP TABLE IF EXISTS {self._ident(namespace, table)}")

    # -- commits --
    def append(self, namespace, table, df, partition_by=None) -> None:
        df.writeTo(self._ident(namespace, table)).append()

    def create_or_replace(self, namespace, table, df, partition_by=None) -> None:
        self.create_namespace(namespace)
        writer = df.writeTo(self._ident(namespace, table))
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()

    def upsert(self, namespace, table, delta, keys, order_by=None) -> None:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        if order_by is not None:
            w = Window.partitionBy(*keys).orderBy(F.col(order_by).desc())
            delta = (
                delta.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        else:
            delta = delta.dropDuplicates(keys)
        if not self.table_exists(namespace, table):
            self.create_or_replace(namespace, table, delta)
            return
        view = f"_merge_src_{uuid.uuid4().hex[:8]}"
        delta.createOrReplaceTempView(view)
        try:
            self._spark().sql(
                merge_upsert_sql(self._ident(namespace, table), view, keys)
            )
        finally:
            self._spark().catalog.dropTempView(view)

    # -- reads --
    def read(
        self, spark, namespace, table,
        snapshot_id=None, as_of_ms=None, where=None,
    ):
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        elif as_of_ms is not None:
            reader = reader.option("as-of-timestamp", as_of_ms)
        df = reader.table(self._ident(namespace, table))
        return df.filter(where) if where else df

    def snapshots(self, spark, namespace, table):
        return spark.sql(
            f"SELECT snapshot_id, CAST(committed_at AS LONG) * 1000 AS "
            f"timestamp_ms, operation "
            f"FROM {self._ident(namespace, table)}.snapshots"
        )

    def schema(self, spark, namespace, table):
        return self.read(spark, namespace, table).schema
