"""Iceberg-emulating table layer: snapshot metadata + atomic commit.

The driver contract (BASELINE.json north_rule) targets Iceberg tables; the
sandbox has no Iceberg runtime jars, so this module supplies the
Iceberg-relevant *semantics* over plain parquet, with a surface small
enough that swapping in real Iceberg is a config change:

- **Snapshot isolation / atomic commit.** Data files are written to the
  table's ``data/`` dir first; a snapshot JSON listing exactly the live
  files is staged and then published with ``os.replace`` (atomic on
  POSIX). Readers resolve ``metadata/VERSION`` → snapshot → file list; a
  writer crash before publish leaves the previous snapshot intact and
  fully readable (Iceberg's swap-the-pointer commit protocol).
- **Append = new snapshot referencing parent files + new files** —
  exactly what the resume path needs: each resumed run commits one new
  snapshot, and a half-finished run is invisible.
- **Manifest-level stats** (row count and logical-part range per file)
  supporting file pruning by part_id without opening parquet footers —
  the lineage anti-join's file-skipping analogue of Iceberg manifest
  filtering.

Layout:

    <root>/data/<uuid>/part-*.parquet   immutable data files
    <root>/metadata/snap-<n>.json       snapshot: files + stats + parent
    <root>/metadata/VERSION             text: id of the current snapshot
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another commit landed between a read-modify-write operation's
    read and its publish (optimistic-concurrency failure)."""


def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _watermarks_file(root: str) -> str:
    return os.path.join(_meta_dir(root), "stream-watermarks.json")


def load_stream_watermarks(root: str) -> dict:
    """The {stream_id: last_committed_batch_id} sidecar that
    expire_snapshots folds expired snapshots' stream markers into —
    the durable floor of the streaming exactly-once guard: without it,
    expiring the snapshot that carried a stream's last batch id would
    silently re-arm replay of that batch (duplicate rows / re-merged
    CDC batch after a crash between snapshot commit and checkpoint
    offset commit)."""
    try:
        with open(_watermarks_file(root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {}


def _version_file(root: str) -> str:
    return os.path.join(_meta_dir(root), "VERSION")


def current_snapshot_id(root: str) -> int | None:
    try:
        with open(_version_file(root)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def read_snapshot(root: str, snapshot_id: int | None = None) -> dict | None:
    """Load a snapshot's metadata; None → the current one (or None if the
    table is empty/uninitialized)."""
    if snapshot_id is None:
        snapshot_id = current_snapshot_id(root)
        if snapshot_id is None:
            return None
    with open(os.path.join(_meta_dir(root), f"snap-{snapshot_id}.json")) as f:
        return json.load(f)


def _file_stats(spark: SparkSession, files: list[str], part_col: str | None) -> list[dict]:
    """Per-file manifest stats in ONE Spark job regardless of file count:
    a single scan of all new files grouped by input_file_name(). The former
    driver loop launched one job per file — thousands of sequential jobs
    for a large commit."""
    import urllib.parse

    if not files:
        return []
    df = spark.read.parquet(*sorted(files))
    aggs = [F.count("*").alias("rows")]
    with_part = part_col is not None and part_col in df.columns
    if with_part:
        aggs += [F.min(part_col).alias("lo"), F.max(part_col).alias("hi")]
    rows = df.groupBy(F.input_file_name().alias("__file")).agg(*aggs).collect()
    # realpath on BOTH sides: input_file_name() URIs and manifest paths may
    # disagree on symlinks/normalization; abspath alone would silently
    # route every file into the rows:0 branch and corrupt manifest counts
    by_path = {
        os.path.realpath(
            urllib.parse.unquote(urllib.parse.urlparse(r["__file"]).path)
        ): r
        for r in rows
    }
    manifest_keys = {os.path.realpath(p) for p in files}
    unmatched = [k for k in by_path if k not in manifest_keys]
    if unmatched:
        # a scan row that maps to NO manifest file means the path
        # normalization failed — make it an error, not silent zeros
        raise RuntimeError(
            f"_file_stats: {len(unmatched)} scanned file(s) did not match "
            f"any manifest path (normalization mismatch), e.g. {unmatched[0]!r}"
        )
    out = []
    for path in sorted(files):
        r = by_path.get(os.path.realpath(path))
        if r is None:
            # a part file Spark wrote for an empty partition: zero rows,
            # so it never appears in the grouped scan output
            out.append({"path": path, "rows": 0})
        elif with_part and r["lo"] is not None:
            out.append(
                {
                    "path": path,
                    "rows": r["rows"],
                    "part_min": r["lo"],
                    "part_max": r["hi"],
                }
            )
        else:
            out.append({"path": path, "rows": r["rows"]})
    return out


def commit_append(
    spark: SparkSession,
    root: str,
    df: DataFrame,
    part_col: str | None = "part_id",
    overwrite: bool = False,
    extra_meta: dict | None = None,
    expected_parent: int | None = None,
) -> int:
    """Write ``df`` as new data files and atomically publish a snapshot.

    Returns the new snapshot id. Crash-safe: everything before the final
    ``os.replace`` of VERSION is invisible to readers. ``extra_meta`` is
    merged into the snapshot JSON (reserved keys are protected) — e.g. the
    streaming layer records its micro-batch id there to make foreachBatch
    commits idempotent under at-least-once replay.

    ``expected_parent`` is the optimistic-concurrency guard (Iceberg's
    validate-at-commit): pass the snapshot id a read-modify-write
    operation (compaction, CDC merge) was BASED ON, and the publish
    raises CommitConflict if any other commit landed in between —
    without it an overwrite would silently erase the interleaved
    commit's rows from the current snapshot. The check re-reads the
    pointer right before the swap, after the (slow) data write, so the
    race window is the pointer swap itself, not the whole rewrite."""
    data_dir = os.path.join(root, "data", uuid.uuid4().hex[:12])
    df.write.mode("errorifexists").parquet(data_dir)
    new_files = [
        p for p in glob.glob(os.path.join(data_dir, "*.parquet"))
        if os.path.basename(p).startswith("part-")
    ]

    os.makedirs(_meta_dir(root), exist_ok=True)
    parent = current_snapshot_id(root)
    if expected_parent is not None and parent != expected_parent:
        raise CommitConflict(
            f"commit based on snapshot {expected_parent} but current is "
            f"{parent}: another writer committed in between — re-read and "
            "retry the operation"
        )
    snap_id = 0 if parent is None else parent + 1
    prev_files = [] if (overwrite or parent is None) else read_snapshot(root)["files"]
    snapshot = {
        "snapshot_id": snap_id,
        "parent": parent,
        "operation": "overwrite" if overwrite else "append",
        "committed_ms": int(time.time() * 1000),
        "part_col": part_col,
        "files": prev_files + _file_stats(spark, new_files, part_col),
    }
    if extra_meta:
        for k, v in extra_meta.items():
            if k not in snapshot:
                snapshot[k] = v
    snap_path = os.path.join(_meta_dir(root), f"snap-{snap_id}.json")
    tmp = snap_path + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(snapshot, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, snap_path)

    vtmp = _version_file(root) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(vtmp, "w") as f:
        f.write(str(snap_id))
        f.flush()
        os.fsync(f.fileno())
    os.replace(vtmp, _version_file(root))  # the atomic pointer swap
    return snap_id


def read_table(
    spark: SparkSession,
    root: str,
    snapshot_id: int | None = None,
    part_ids: list[int] | None = None,
) -> DataFrame:
    """Scan a snapshot (default: current). ``part_ids`` prunes whole files
    via manifest stats before Spark ever lists them — the Iceberg
    manifest-filtering analogue."""
    snap = read_snapshot(root, snapshot_id)
    if snap is None or not snap["files"]:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    files = snap["files"]
    if part_ids is not None and snap.get("part_col"):
        want = set(part_ids)
        files = [
            f
            for f in files
            if "part_min" not in f
            or any(f["part_min"] <= p <= f["part_max"] for p in want)
        ]
    if not files:
        return spark.read.parquet(snap["files"][0]["path"]).limit(0)
    return spark.read.parquet(*[f["path"] for f in files])


def table_rows(root: str, snapshot_id: int | None = None) -> int:
    """Row count straight from manifest stats — no data files opened."""
    snap = read_snapshot(root, snapshot_id)
    return 0 if snap is None else sum(f["rows"] for f in snap["files"])


def write_bucketed(
    df: DataFrame, name: str, key: str, buckets: int, path: str
) -> None:
    """Materialize a bucketed+sorted table layout for co-located joins.

    Both sides of a repeated equi-join written with the SAME bucket count
    and key join with ZERO exchanges (Spark reads bucket i of each side
    into the same task) — at 100 TB this converts every recurring
    dimension/fact join from a full shuffle into a local merge. Bucketing
    metadata lives in the session catalog (saveAsTable), files at
    ``path``; the Iceberg swap-in would carry the same layout as a
    partition spec. Catalyst only uses bucketing when
    spark.sql.sources.bucketing.enabled (default true).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(name)
    )


def compact_table(
    spark: SparkSession, root: str, target_files: int = 8
) -> int:
    """Snapshot compaction — the small-files maintenance pass every
    append/streaming table needs (each micro-batch commit adds files,
    and reader/planning overhead grows with file count): reads the
    current snapshot and rewrites it as ``target_files`` files,
    RANGE-partitioned on the table's part column so each output file
    covers a contiguous part interval and the manifest's
    part_min/part_max stay selective — file pruning SURVIVES compaction
    (a hash repartition would smear every part across every file and
    silently disable pruning). Publishes an overwrite snapshot through
    the same atomic pointer swap, so readers never observe a partial
    compaction and prior snapshots stay readable (time travel).
    Returns the new snapshot id."""
    snap = read_snapshot(root)
    if snap is None:
        raise FileNotFoundError(f"no committed snapshot at {root}")
    if not snap["files"]:
        return snap["snapshot_id"]  # committed-but-empty: nothing to do
    df = read_table(spark, root)
    part_col = snap.get("part_col")
    if part_col and part_col in df.columns:
        df = df.repartitionByRange(target_files, part_col)
    else:
        df = df.repartition(target_files)
    return commit_append(
        spark,
        root,
        df,
        part_col=part_col,
        overwrite=True,
        extra_meta={"compaction_of": snap["snapshot_id"]},
        # read-then-rewrite: refuse to publish if a stream commit
        # landed on top of the snapshot this compaction was based on
        expected_parent=snap["snapshot_id"],
    )


def expire_snapshots(root: str, keep_last: int = 2) -> dict:
    """Snapshot retention + dead-file cleanup (the Iceberg
    expire_snapshots maintenance pass, compaction's companion): keep
    the ``keep_last`` most recent snapshots (the current one always
    survives), delete older snapshot manifests, and delete data files
    referenced ONLY by expired snapshots. After a compaction that is
    the entire pre-compaction file set — which is exactly when the
    space actually comes back. A file referenced by ANY retained
    snapshot is never touched (append lineages share files across
    snapshots), so time travel stays intact within the retention
    window; parent walks treat an expired ancestor as the end of the
    retained chain. Returns {"expired_snapshots": [...],
    "deleted_files": N}."""
    ids = sorted(
        int(os.path.basename(p)[5:-5])
        for p in glob.glob(os.path.join(_meta_dir(root), "snap-*.json"))
    )
    cur = current_snapshot_id(root)
    keep = set(ids[-keep_last:]) if keep_last > 0 else set()
    if cur is not None:
        keep.add(cur)
    expired = [i for i in ids if i not in keep]
    live: set[str] = set()
    for i in keep:
        live.update(f["path"] for f in read_snapshot(root, i)["files"])
    # fold expired snapshots' stream markers into the watermark sidecar
    # BEFORE any manifest is deleted: the streaming exactly-once guard
    # falls back to it when the retained parent chain no longer carries
    # a marker (e.g. compaction snapshots carry none) — without this, a
    # crash-replayed micro-batch would re-apply after maintenance
    wm = load_stream_watermarks(root)
    for i in expired:
        s = read_snapshot(root, i)
        sid, b = s.get("stream_id"), s.get("stream_batch_id")
        if sid is not None and b is not None:
            wm[sid] = max(int(b), int(wm.get(sid, -1)))
    if wm:
        tmp = _watermarks_file(root) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(wm, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, _watermarks_file(root))
    deleted = 0
    for i in expired:
        for f in read_snapshot(root, i)["files"]:
            if f["path"] not in live and os.path.exists(f["path"]):
                os.remove(f["path"])
                deleted += 1
        os.remove(os.path.join(_meta_dir(root), f"snap-{i}.json"))
    return {"expired_snapshots": expired, "deleted_files": deleted}
