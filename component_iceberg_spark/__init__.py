"""component_iceberg_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
``keboola/component-iceberg`` (studied read-only at ``/root/reference``),
re-expressed Spark-first:

- Iceberg-style table semantics (snapshots, time travel, append / replace /
  upsert commits) over the DataFrame API, via the Iceberg Spark connector
  when its runtime jar is on the classpath, and via a lightweight
  manifest-based snapshot layer (:mod:`component_iceberg_spark.io.snaptable`)
  otherwise.
- Typed CSV ingest / quoted CSV + Parquet export matching the reference's
  connector surface (reference: ``components/wr-iceberg/src/component.py:69-77``,
  ``components/ex-iceberg/src/component.py:50-82``).
- Large-scale training-data-pipeline operators beyond the reference surface:
  dedup (exact / MinHash-LSH / n-gram Jaccard / SimHash / embedding),
  similarity search, multimodal binary columns, text analysis, streaming.

Everything is declared with DataFrame / SQL so Catalyst performs column
pruning, predicate pushdown, limit pushdown and join selection; Python
touches data only through Arrow-vectorized Pandas UDFs, never per-row.
"""

__version__ = "0.1.0"
