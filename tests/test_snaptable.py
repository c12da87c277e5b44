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
    assert len(os.listdir(os.path.join(wh, "ns", "t", "data"))) == 1
    assert cat.read(spark, "ns", "t").count() == n.filter("n_regionkey = 0").count()


def test_commit_conflict_semantics(spark, sf_dir, tmp_path):
    """Two catalogs over one warehouse: a raced append retries onto the new
    state; a raced replace raises CommitConflict instead of publishing a
    stale result."""
    import json
    import os

    import pytest

    from component_iceberg_spark.io.snaptable import CommitConflict

    wh = str(tmp_path / "wh")
    a, b = SnapCatalog(wh), SnapCatalog(wh)
    n = load_table(spark, sf_dir, "nation")
    a.create_or_replace("ns", "t", n.filter("n_regionkey = 0"))

    def race_once(cat):
        """Make cat's next commit see a stale snapshot list on its first
        state read, while a winner claims the id it will try."""
        real = SnapCatalog._snapshots
        state = {"calls": 0}
        stale = real(cat, "ns", "t")

        def patched(self, namespace, table):
            state["calls"] += 1
            # call 1 is _commit's partition-spec pre-read; call 2 is the
            # publish loop's state read — the race window
            if state["calls"] == 2:
                # winner lands right after the stale read
                winner = dict(stale[-1])
                winner["snapshot_id"] = stale[-1]["snapshot_id"] + 1
                winner["parent_id"] = stale[-1]["snapshot_id"]
                path = os.path.join(
                    wh, namespace, table, "snapshots",
                    f"{winner['snapshot_id']}.json",
                )
                with open(path, "w") as f:
                    json.dump(winner, f)
                return stale
            return real(self, namespace, table)

        cat._snapshots = patched.__get__(cat)

    # append under a race: retries transparently onto the winner's state
    race_once(b)
    sid = b.append("ns", "t", n.filter("n_regionkey = 1"))
    assert sid == 3  # winner took 2, append landed as 3
    assert b.read(spark, "ns", "t").count() == n.filter("n_regionkey <= 1").count()

    # replace under a race: raises instead of publishing a stale result
    race_once(b)
    with pytest.raises(CommitConflict):
        b.create_or_replace("ns", "t", n.limit(2))
    assert SnapCatalog(wh)._current_sid("ns", "t") == 4  # winner's commit
