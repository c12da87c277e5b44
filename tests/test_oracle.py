"""The local mirror of the driver's correctness gate: every registered
query with an oracle must hash-match DuckDB on the same fixtures; oracle-less
queries must at least execute and return a stable schema."""

from __future__ import annotations

import pytest

from component_iceberg_spark.plans import load_all
from tests.conftest import compare_with_oracle

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        rows = df.collect()
        assert isinstance(rows, list)
        assert len(df.columns) > 0
    else:
        compare_with_oracle(df, oracle_con, q.oracle, name=name)
