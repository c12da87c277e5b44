"""Scratch-warehouse helper shared by every fixture-driven snapshot query.

One definition of the scratch-dir contract: warehouses live under
``$SPARK_GRAFT_SCRATCH/<md5(sf_dir)[:8]>/warehouse/<key>`` — the sf_dir
hash isolates scale factors from each other, the key isolates queries —
and are rebuilt fresh per invocation so snapshot ids are deterministic.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from component_iceberg_spark.io.snaptable import SnapCatalog

SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/cis_scratch")


def scratch_warehouse(sf_dir: str, key: str) -> SnapCatalog:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(SCRATCH_ROOT, tag, "warehouse", key)
    if os.path.isdir(path):
        shutil.rmtree(path)
    return SnapCatalog(path)
