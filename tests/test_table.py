"""Snapshot table layer: atomic commit, append lineage, manifest pruning."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from ocr_spark import table


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi, part):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(part).cast("int").alias("part_id")
    )


def test_commit_read_roundtrip(spark, root):
    sid = table.commit_append(spark, root, _df(spark, 0, 100, 1))
    assert sid == 0
    got = table.read_table(spark, root)
    assert got.count() == 100
    assert table.table_rows(root) == 100  # manifest stats, no file reads


def test_append_creates_new_snapshot_with_parent_files(spark, root):
    table.commit_append(spark, root, _df(spark, 0, 100, 1))
    sid = table.commit_append(spark, root, _df(spark, 100, 150, 2))
    assert sid == 1
    assert table.read_table(spark, root).count() == 150
    # time travel: snapshot 0 still readable as-of
    assert table.read_table(spark, root, snapshot_id=0).count() == 100


def test_overwrite_drops_parent_files(spark, root):
    table.commit_append(spark, root, _df(spark, 0, 100, 1))
    table.commit_append(spark, root, _df(spark, 0, 10, 1), overwrite=True)
    assert table.read_table(spark, root).count() == 10


def test_uncommitted_write_is_invisible(spark, root):
    """Crash between data write and VERSION swap leaves the old snapshot
    intact — the Iceberg commit-protocol guarantee."""
    table.commit_append(spark, root, _df(spark, 0, 100, 1))
    # simulate a crashed writer: data files exist, snapshot never published
    _df(spark, 500, 600, 9).write.parquet(os.path.join(root, "data", "orphan"))
    assert table.read_table(spark, root).count() == 100
    snap = table.read_snapshot(root)
    assert all("orphan" not in f["path"] for f in snap["files"])


def test_manifest_part_pruning(spark, root):
    table.commit_append(spark, root, _df(spark, 0, 100, 1))
    table.commit_append(spark, root, _df(spark, 100, 200, 2))
    pruned = table.read_table(spark, root, part_ids=[2])
    assert pruned.count() == 100
    assert pruned.agg(F.min("id")).first()[0] == 100
    # pruning happened at the manifest (file list), not just as a filter
    snap = table.read_snapshot(root)
    assert len(snap["files"]) > len(
        [f for f in snap["files"] if f["part_min"] <= 2 <= f["part_max"]]
    ) or all(f["part_min"] == 2 for f in snap["files"][1:])


def test_snapshot_metadata_shape(spark, root):
    table.commit_append(spark, root, _df(spark, 0, 10, 3))
    files = glob.glob(os.path.join(root, "metadata", "snap-*.json"))
    assert len(files) == 1
    snap = json.load(open(files[0]))
    assert snap["operation"] == "append"
    assert snap["parent"] is None
    assert all({"path", "rows", "part_min", "part_max"} <= set(f) for f in snap["files"])

def _jobs_for(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))

def test_commit_stats_is_one_job_regardless_of_file_count(spark, root):
    # manifest stats must come from ONE grouped scan over all new files —
    # a per-file driver loop means thousands of jobs for a big commit
    few = spark.range(100).withColumn("part_id", (F.col("id") % 2).cast("int")).repartition(2, "part_id")
    many = spark.range(100).withColumn("part_id", (F.col("id") % 16).cast("int")).repartition(16, "part_id")
    n_few = _jobs_for(spark, "commit-few", lambda: table.commit_append(spark, root, few))
    root2 = root + "_many"
    n_many = _jobs_for(spark, "commit-many", lambda: table.commit_append(spark, root2, many))
    assert n_many == n_few  # job count independent of file count
    # stats themselves stay correct
    snap = table.read_snapshot(root2)
    assert sum(f["rows"] for f in snap["files"]) == 100
    assert {f["part_min"] for f in snap["files"] if "part_min" in f} <= set(range(16))


def test_compact_table_preserves_rows_and_pruning(spark, root):
    for i in range(4):
        table.commit_append(spark, root, _df(spark, 100 * i, 100 * i + 50, i))
    before = table.read_snapshot(root)
    n_files_before = len(before["files"])
    sid = table.compact_table(spark, root, target_files=2)
    snap = table.read_snapshot(root)
    assert snap["snapshot_id"] == sid
    assert snap["compaction_of"] == before["snapshot_id"]
    assert len(snap["files"]) < n_files_before
    assert table.table_rows(root) == 200  # manifest stats agree
    got = sorted(r["id"] for r in table.read_table(spark, root).collect())
    assert got == sorted(
        r["id"]
        for r in table.read_table(
            spark, root, snapshot_id=before["snapshot_id"]
        ).collect()
    )  # content identical; old snapshot still readable (time travel)
    # pruning survives: manifest pruning is FILE-level (a superset the
    # caller filters further) — with 2 range files over parts 0..3,
    # part_ids=[0] must read only the file covering parts {0,1}, never
    # the {2,3} file a hash repartition would have smeared part 0 into
    pruned = sorted(
        r["id"] for r in table.read_table(spark, root, part_ids=[0]).collect()
    )
    assert pruned == list(range(0, 50)) + list(range(100, 150))
    assert all(
        f["part_min"] <= f["part_max"] and (f["part_max"] - f["part_min"]) <= 1
        for f in snap["files"]
    )  # contiguous, selective per-file part intervals


def test_expire_snapshots_two_phase_retention(spark, root):
    table.commit_append(spark, root, _df(spark, 0, 50, 0))
    table.commit_append(spark, root, _df(spark, 50, 100, 1))  # snap 1 shares snap 0's files
    table.compact_table(spark, root, target_files=1)  # snap 2: all-new files

    # keep_last=2 expires snap 0 — but its files are ALSO referenced by
    # retained snap 1, so no data file may be deleted
    res = table.expire_snapshots(root, keep_last=2)
    assert res["expired_snapshots"] == [0]
    assert res["deleted_files"] == 0
    assert table.read_table(spark, root, snapshot_id=1).count() == 100

    # keep_last=1 expires snap 1: its (pre-compaction) files are now
    # referenced by nothing retained and must be physically deleted
    res = table.expire_snapshots(root, keep_last=1)
    assert res["expired_snapshots"] == [1]
    assert res["deleted_files"] >= 2
    assert table.read_table(spark, root).count() == 100  # current intact
    with pytest.raises(FileNotFoundError):
        table.read_snapshot(root, 1)
    # disk holds exactly the live file set (no dead data files linger)
    live = {f["path"] for f in table.read_snapshot(root)["files"]}
    on_disk = {
        p
        for p in glob.glob(os.path.join(root, "data", "*", "*.parquet"))
        if os.path.basename(p).startswith("part-")
    }
    assert on_disk == live


def test_table_job_compact_then_expire(spark, root, capsys):
    import table_job

    for i in range(4):
        table.commit_append(spark, root, _df(spark, 100 * i, 100 * i + 50, i))
    rc = table_job.main(["--root", root, "--compact", "1", "--expire", "1"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # compaction published snapshot 4; expiry kept only it and freed the
    # pre-compaction files in the same maintenance pass
    assert summary["compacted_snapshot"] == 4 == summary["snapshot"]
    assert summary["expired_snapshots"] == [0, 1, 2, 3]
    assert summary["deleted_files"] >= 4
    assert summary["rows"] == 200 and summary["files"] == 1
    assert table.read_table(spark, root).count() == 200
