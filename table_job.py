"""Table-maintenance job CLI — the lakehouse upkeep passes as a product.

    spark-submit --py-files ocr_spark.zip table_job.py \
        --root <table> [--compact TARGET_FILES] [--expire KEEP_LAST]

Runs the snapshot-table maintenance passes (ocr_spark/table.py) against
a committed table root: ``--compact`` rewrites the current snapshot into
TARGET_FILES range-partitioned files (file pruning survives — see
compact_table), ``--expire`` drops all but the KEEP_LAST most recent
snapshots and physically deletes data files nothing retained references.
When combined, compaction runs FIRST (publishing the new snapshot) and
expiry second, so the pre-compaction files leave retention in the same
invocation — the standard nightly-maintenance order. Always ends with
manifest-only stats (no data pages read). One JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--compact", type=int, default=None, metavar="TARGET_FILES")
    p.add_argument("--expire", type=int, default=None, metavar="KEEP_LAST")
    args = p.parse_args(argv)

    from ocr_spark import table as tbl

    spark = SparkSession.builder.appName("ocr_spark.table_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()

    out: dict = {"root": args.root}
    if args.compact is not None:
        out["compacted_snapshot"] = tbl.compact_table(
            spark, args.root, target_files=args.compact
        )
    if args.expire is not None:
        e = tbl.expire_snapshots(args.root, keep_last=args.expire)
        out["expired_snapshots"] = e["expired_snapshots"]
        out["deleted_files"] = e["deleted_files"]
    snap = tbl.read_snapshot(args.root)
    out.update(
        {
            "snapshot": None if snap is None else snap["snapshot_id"],
            "files": 0 if snap is None else len(snap["files"]),
            "rows": tbl.table_rows(args.root),
            "wall_sec": round(time.monotonic() - t0, 2),
        }
    )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
