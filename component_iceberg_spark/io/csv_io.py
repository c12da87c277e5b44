"""CSV ingest/export matching the reference connector's dialect.

Ingest parity: the reference reads CSV with manifest-declared per-column
dtypes, delimiter, quote char, header and names
(reference: ``components/wr-iceberg/src/component.py:69-77``), or forces
every column to VARCHAR (``all_varchar``,
``components/wr-iceberg/src/configuration.py:29``).

Export parity: header row, ``,`` delimiter, every field quoted —
``COPY … (HEADER, DELIMITER ',', FORCE_QUOTE *)``
(reference: ``components/ex-iceberg/src/component.py:79-82``).

At scale: ``spark.read.csv`` with an explicit schema is a distributed,
splittable scan (no inference pass); the writer shards across executors
unless ``single_file`` is requested for byte-stable goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Pin empty-vs-NULL round-trip (SURVEY §7 "What's hard"). The reference's
# DuckDB dialect distinguishes NULL (unquoted empty) from '' (quoted "").
# Spark's quoteAll writer quotes the null token too, which would collapse
# the two — so NULL gets an explicit sentinel (the classic \N) while ''
# keeps the quoted-empty form. Semantic parity (the distinction survives)
# over byte parity for the NULL cell.
CSV_OPTS = {
    "header": "true",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "nullValue": "\\N",
    # Spark's CSV WRITER trims cell whitespace by default — disable on
    # both sides so ' ' survives verbatim.
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
    # Embedded CR/LF inside quoted fields needs multiLine on read. Scale
    # note: multiLine files are non-splittable (one task per file) — the
    # reference CSV ingest has the same constraint, and production bulk
    # paths use Parquet anyway.
    "multiLine": "true",
    "timestampNTZFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS[XXX]",
}


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    quote: str = '"',
    header: bool = True,
) -> DataFrame:
    """Typed CSV scan — the manifest-declared schema is applied at scan
    time, so there is no inference pass over the data (one read, not two)."""
    opts = dict(CSV_OPTS)
    opts.update({"sep": sep, "quote": quote, "header": str(header).lower()})
    return spark.read.options(**opts).schema(schema).csv(path)


def read_csv_all_varchar(
    spark: SparkSession,
    path: str,
    names: list[str],
    sep: str = ",",
    quote: str = '"',
    header: bool = True,
) -> DataFrame:
    """All-VARCHAR CSV scan (``all_varchar`` mode)."""
    schema = T.StructType([T.StructField(n, T.StringType(), True) for n in names])
    return read_csv_typed(spark, path, schema, sep=sep, quote=quote, header=header)


def write_csv(
    df: DataFrame,
    path: str,
    quote_all: bool = True,
    header: bool = True,
    order_by: list[str] | None = None,
    single_file: bool = False,
    drop_after_sort: list[str] | None = None,
) -> None:
    """Quoted CSV export (``FORCE_QUOTE *`` parity → ``quoteAll``).

    ``order_by`` + ``single_file`` emulates the reference's
    ``preserve_insertion_order=true`` (ordered, byte-stable export);
    omitting both is the scalable default — many shards, no global sort —
    matching ``preserve_insertion_order=false``. ``drop_after_sort``
    removes synthetic ordering columns (e.g. a scan-order index) after the
    sort so they don't appear in the output.
    """
    if order_by:
        df = df.orderBy(*order_by)
        if drop_after_sort:
            df = df.drop(*drop_after_sort)
        if single_file:
            df = df.coalesce(1)
    opts = dict(CSV_OPTS)
    opts.update({"quoteAll": str(quote_all).lower(), "header": str(header).lower()})
    df.write.mode("overwrite").options(**opts).csv(path)


def with_row_index(df: DataFrame, order_by: list[str]) -> DataFrame:
    """Explicit insertion-order key. Spark tables are unordered; an ordered
    pipeline needs a materialized ordering column (SURVEY §2.3
    ``order_preserve``).

    Built on :func:`relational.global_rank` — range-partition on the order
    columns, rank within each partition, add per-partition offsets. No
    single-partition Exchange/Window anywhere in the plan, so the total
    order survives any scale (a bare ``Window.orderBy`` with no partition
    key sorts the whole table in one task). ``order_by`` must be a total
    order (include a unique key) for a deterministic index."""
    from component_iceberg_spark.operators.relational import global_rank

    ranked = global_rank(df, [F.col(c) for c in order_by], rank_col="_row_idx")
    return ranked.withColumn("_row_idx", F.col("_row_idx").cast("int"))
