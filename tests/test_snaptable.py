"""Snapshot-table layer unit tests: compaction file counts, prior-snapshot
isolation, drop semantics."""

from __future__ import annotations

import glob
import os

from component_iceberg_spark.io.snaptable import SnapCatalog
from component_iceberg_spark.io.tables import load_table


def _data_files(wh: str, ns: str, tbl: str, commit_dirs: list[str]) -> int:
    n = 0
    for d in commit_dirs:
        n += len(glob.glob(os.path.join(wh, ns, tbl, "data", d, "*.parquet")))
    return n


def test_compaction_reduces_files_keeps_history(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    o = load_table(spark, sf_dir, "orders").repartition(8)
    cat.create_or_replace("ns", "t", o)
    cat.append("ns", "t", o.limit(10))
    pre_manifest = cat._manifest("ns", "t", 2)
    pre_files = _data_files(wh, "ns", "t", pre_manifest["files"])
    pre_count = cat.read(spark, "ns", "t").count()

    sid = cat.compact(spark, "ns", "t", target_partitions=1)
    post_manifest = cat._manifest("ns", "t", sid)
    post_files = _data_files(wh, "ns", "t", post_manifest["files"])

    assert post_files < pre_files
    assert cat.read(spark, "ns", "t").count() == pre_count
    # prior snapshots untouched and readable
    assert cat.read(spark, "ns", "t", snapshot_id=1).count() == o.count()
    ops = [r.operation for r in cat.snapshots(spark, "ns", "t").collect()]
    assert ops == ["replace", "append", "compact"]


def test_drop_table(spark, sf_dir, tmp_path):
    cat = SnapCatalog(str(tmp_path / "wh"))
    cat.create_or_replace("ns", "t", load_table(spark, sf_dir, "region"))
    assert cat.table_exists("ns", "t")
    cat.drop_table("ns", "t")
    assert not cat.table_exists("ns", "t")
    assert cat.list_tables("ns") == []


def test_expire_snapshots(spark, sf_dir, tmp_path):
    import pytest

    from component_iceberg_spark.io.snaptable import SnapshotNotFound

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    n = load_table(spark, sf_dir, "nation")
    cat.create_or_replace("ns", "t", n.filter("n_regionkey < 2"))
    cat.append("ns", "t", n.filter("n_regionkey = 2"))
    cat.append("ns", "t", n.filter("n_regionkey > 2"))

    expired = cat.expire_snapshots("ns", "t", keep_last=1)
    assert expired == [1, 2]
    # current still complete
    assert cat.read(spark, "ns", "t").count() == n.count()
    # expired snapshot unreadable (fails on manifest, not mid-scan)
    with pytest.raises(SnapshotNotFound):
        cat.read(spark, "ns", "t", snapshot_id=1)
    # all data dirs still referenced (append carries history forward)
    ops = [r.operation for r in cat.snapshots(spark, "ns", "t").collect()]
    assert ops == ["append"]


def test_expire_after_replace_frees_data(spark, sf_dir, tmp_path):
    import os

    wh = str(tmp_path / "wh")
    cat = SnapCatalog(wh)
    n = load_table(spark, sf_dir, "nation")
    cat.create_or_replace("ns", "t", n)
    cat.create_or_replace("ns", "t", n.filter("n_regionkey = 0"))
    assert len(os.listdir(os.path.join(wh, "ns", "t", "data"))) == 2
    cat.expire_snapshots("ns", "t", keep_last=1)
    # snapshot 1's directory is unreferenced after the replace → deleted
    assert os.listdir(os.path.join(wh, "ns", "t", "data")) == ["commit-2"]
    assert cat.read(spark, "ns", "t").count() == n.filter("n_regionkey = 0").count()
