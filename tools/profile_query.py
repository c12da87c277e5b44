#!/usr/bin/env python3
"""Profile registered queries: wall per rep (same warm-session noop-sink
methodology as bench.py) plus a per-stage breakdown pulled from the local
Spark UI REST API (the scripted equivalent of guide §7.1's "open the
Stages tab"), so the expensive jobs inside multi-job operators (mutation
verbs, streaming harnesses) are attributable without a browser.

Usage:
    python tools/profile_query.py q21_waiting_supplier snap_compact ...
    REPS=2 python tools/profile_query.py stream_window_counts
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from component_iceberg_spark.plans import load_all  # noqa: E402
from component_iceberg_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))
TOP = int(os.environ.get("TOP", "12"))


def force(df):
    df.write.format("noop").mode("overwrite").save()


def _rest(spark, path):
    port = spark.conf.get("spark.ui.port", "4040")
    app_id = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app_id}/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def stages(spark):
    try:
        return {
            (s["stageId"], s["attemptId"]): s
            for s in _rest(spark, "stages?status=complete")
        }
    except Exception as e:  # UI disabled or race — degrade to wall-only
        print(f"  [stage breakdown unavailable: {e}]")
        return {}


def main() -> None:
    names = sys.argv[1:]
    registry = load_all()
    spark = get_spark("profile", extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    force(registry["scan_full"].fn(spark, SF_DIR))

    for name in names:
        fn = registry[name].fn
        sc.setJobDescription(f"{name}: warmup")
        t0 = time.perf_counter()
        force(fn(spark, SF_DIR))
        warm = time.perf_counter() - t0
        reps = []
        before = stages(spark)
        for r in range(REPS):
            sc.setJobDescription(f"{name}: rep{r}")
            t0 = time.perf_counter()
            force(fn(spark, SF_DIR))
            reps.append(time.perf_counter() - t0)
        after = stages(spark)
        new = [s for k, s in after.items() if k not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        print(
            f"\n=== {name}: warmup {warm:.3f}s "
            f"reps {[round(x, 3) for x in reps]} best {min(reps):.3f} "
            f"({len(new)} stages over {REPS} reps)"
        )
        for s in new[:TOP]:
            print(
                f"  run {s.get('executorRunTime', 0) / 1000:7.2f}s"
                f" cpu {s.get('executorCpuTime', 0) / 1e9:7.2f}s"
                f" tasks {s.get('numCompleteTasks', 0):4d}"
                f" in {s.get('inputBytes', 0) / 1e6:8.1f}MB"
                f" sh_r {s.get('shuffleReadBytes', 0) / 1e6:7.1f}MB"
                f" sh_w {s.get('shuffleWriteBytes', 0) / 1e6:7.1f}MB"
                f"  {(s.get('description') or s.get('name', ''))[:90]}"
            )
        sys.stdout.flush()
    sc.setJobDescription(None)


if __name__ == "__main__":
    main()
