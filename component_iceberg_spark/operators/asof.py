"""As-of join — Spark has no native one (SURVEY guide: common OLAP gap).

Implemented with the union + ordered-window trick, not per-key loops or
``merge_asof`` UDFs: tag left/right rows, union them, and carry the last
right-side value forward with ``last(..., ignorenulls)`` over a window
ordered by (time, side). One shuffle on the key, one sort — the same cost
profile as a sort-merge join, fully codegen'd, no Python.

At scale this beats the ``applyInPandas``+``pd.merge_asof`` alternative
(which materializes each key group in pandas) whenever keys are numerous
or skewed; AQE splits any hot key's partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
) -> DataFrame:
    """For each left row: the greatest ``right_ts <= left_ts`` within the
    key, carried as ``value_col`` (NULL when no prior right row).

    Inclusive semantics (a right row at exactly left_ts matches) — side
    ordering puts right rows first at equal timestamps.
    """
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(value_col).alias("_val"),
    )
    l = left.withColumn("_ts", F.col(left_ts)).withColumn(
        "_side", F.lit(1)
    ).withColumn("_val", F.lit(None).cast(r.schema["_val"].dataType))
    merged = l.select(*left.columns, "_ts", "_side", "_val").unionByName(
        r.select(
            *[
                F.lit(None).cast(left.schema[c].dataType).alias(c)
                if c != key
                else F.col(key)
                for c in left.columns
            ],
            "_ts",
            "_side",
            "_val",
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.withColumn(
        value_col, F.last("_val", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).drop("_ts", "_side", "_val")
