#!/usr/bin/env python3
"""Capture .explain("formatted") output for a set of registered queries
into plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<label>.txt (default r16) —
the before/after plan evidence for the optimization round.

Usage: python tools/capture_plans.py <label> [query ...]
(no query args = the bench HEADLINE tuple)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from component_iceberg_spark.plans import load_all  # noqa: E402
from component_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
)


def main() -> int:
    label = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    registry = load_all()
    spark = get_spark("capture_plans")
    for name in names:
        q = registry[name]
        try:
            df = q.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            text = f"EXPLAIN FAILED: {type(e).__name__}: {e}\n"
        out = os.path.join(OUT_DIR, f"{name}_{label}.txt")
        with open(out, "w") as fh:
            fh.write(text)
        print(f"wrote {out} ({len(text)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
