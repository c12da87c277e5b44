"""Shared fixtures: one local SparkSession + a DuckDB oracle comparator
that mirrors the driver's gate (row count + column names + order-insensitive
value comparison)."""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from component_iceberg_spark.io.tables import TABLES, table_path
from component_iceberg_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def plan_formatted(df) -> str:
    """The ONE shared spelling for physical-plan-shape assertions
    (ADVICE r8): formatted explain text captured through the PUBLIC
    ``DataFrame.explain`` API — no ``_jvm``/``PythonSQLUtils`` reach-in,
    so it survives Spark Connect and internal-API changes. Node-count
    assertions should match the detail headers ``\\n(n) NodeName`` (each
    node also appears once in the tree section as ``+- NodeName (n)``)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _canon(v):
    """Canonicalize a cell for order-insensitive multiset comparison."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bool):
        return "T" if v else "F"
    return str(v)


def canonical_rows(columns, rows):
    """Sort columns by name, canonicalize cells, sort rows — the same
    normalization the driver applies before hashing."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [columns[i] for i in order], out


def compare_with_oracle(spark_df, con, sql, name=""):
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    # Fetch via DuckDB's Arrow export — the driver's path — NOT fetchall().
    # fetchall() converts HUGEINT to native int, silently masking the
    # HUGEINT -> decimal128 -> "975.0" canonicalization divergence that the
    # driver gate sees (CORRECTNESS_r04 pipeline_pretrain_prep); Arrow
    # preserves it, so an uncast integer-sum oracle now fails locally too.
    tbl = con.execute(sql).arrow()
    o_cols = tbl.schema.names
    cols_data = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    o_rows = list(zip(*cols_data)) if cols_data else []

    assert sorted(s_cols) == sorted(o_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    )
    assert len(s_rows) == len(o_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(o_rows)}"
    )
    _, cs = canonical_rows(s_cols, s_rows)
    _, co = canonical_rows(o_cols, o_rows)
    if cs != co:
        diff = [(a, b) for a, b in zip(cs, co) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
