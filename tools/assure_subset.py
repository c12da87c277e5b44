#!/usr/bin/env python3
"""Oracle-check a SUBSET of registered queries (same comparison as
assure.py / the external gate) — the fast per-change equivalence proof
the optimization round runs after touching an operator.

Usage: python tools/assure_subset.py sim_ann_hyperplane q5_local_supplier_volume ...
       SPARK_GRAFT_ASSURE_SF=/root/testdata/sf0.1 python tools/assure_subset.py ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_ASSURE_SF", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    import duckdb

    from component_iceberg_spark.plans import load_all
    from component_iceberg_spark.session import get_spark
    from tests.conftest import compare_with_oracle

    names = sys.argv[1:]
    spark = get_spark("assure_subset")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    registry = load_all()
    fail = 0
    for name in names:
        q = registry[name]
        try:
            df = q.fn(spark, SF)
            if q.oracle is None:
                rows = df.collect()
                assert len(df.columns) > 0
                print(f"{name}: rows_only({len(rows)})", flush=True)
            else:
                compare_with_oracle(df, con, q.oracle, name=name)
                print(f"{name}: exact", flush=True)
        except Exception as e:  # noqa: BLE001
            fail += 1
            print(f"{name}: FAIL {type(e).__name__}: {e}", flush=True)
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
