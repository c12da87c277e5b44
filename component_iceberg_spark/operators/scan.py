"""Scan operators — the extractor's read path, Spark-first.

Reference behavior: ``catalog.load_table`` → ``table.scan(limit=100_000,
snapshot_id=…, selected_fields=…)`` (reference:
``components/ex-iceberg/src/component.py:30-40``). In Spark all three knobs
are plain DataFrame transforms that Catalyst pushes into the Parquet/Iceberg
scan: projection becomes ReadSchema pruning, limit becomes a
CollectLimit/LocalLimit pushdown, and filters become PushedFilters →
row-group skipping. No staging engine is needed — the DataFrame *is* the
lazy staging relation (SURVEY §1.1 ``stage_materialize``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

# Parity with the reference's hard cap on every extract
# (``components/ex-iceberg/src/component.py:37``). Kept as an engine
# constant; callers may pass any other limit.
DEFAULT_SCAN_LIMIT = 100_000


def scan_full(df: DataFrame) -> DataFrame:
    """Full scan, all columns (``scan_full``)."""
    return df


def scan_projection(df: DataFrame, columns: list[str]) -> DataFrame:
    """Column projection — Catalyst prunes the Parquet ReadSchema, so only
    the selected columns are decoded (``selected_fields`` parity)."""
    return df.select(*columns)


def scan_limit(df: DataFrame, n: int = DEFAULT_SCAN_LIMIT) -> DataFrame:
    """Row-limit scan — Catalyst plans a LocalLimit at the scan, so file
    reading stops once satisfied (pyiceberg ``limit=`` parity)."""
    return df.limit(n)


def scan_filter(df: DataFrame, predicate: Column) -> DataFrame:
    """Filtered scan. The reference has no filter surface (SURVEY §4
    'predicate pushdown: absent'); here it is free — Catalyst pushes the
    predicate into the scan (min/max row-group skipping on Parquet,
    manifest metrics pruning on Iceberg)."""
    return df.filter(predicate)
