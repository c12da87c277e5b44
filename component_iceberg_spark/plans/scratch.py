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


def src_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def fresh_stage(stage_dir: str, src: str) -> bool:
    """True when ``stage_dir`` was built from the CURRENT source file.

    Scratch persists across runs while the fixture may be regenerated
    with different content at the same path — an existence-only check
    would then silently serve stale data (and the correctness gate would
    blame the operator under test). A sidecar records the source's
    (size, mtime) at stage time. Staging once behind this marker also
    means two queries sharing a staged directory never interleave a
    restage with the other's still-unevaluated scan."""
    marker = os.path.join(stage_dir, "_SRC")
    return (
        os.path.exists(marker)
        and open(marker).read().strip() == src_fingerprint(src)
    )


def mark_stage(stage_dir: str, src: str) -> None:
    with open(os.path.join(stage_dir, "_SRC"), "w") as f:
        f.write(src_fingerprint(src))


def scratch_warehouse(sf_dir: str, key: str) -> SnapCatalog:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(SCRATCH_ROOT, tag, "warehouse", key)
    if os.path.isdir(path):
        shutil.rmtree(path)
    return SnapCatalog(path)
