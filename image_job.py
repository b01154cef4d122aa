"""Image-mode job CLI — the reference's image front door, Spark-first.

    spark-submit --py-files ocr_spark.zip image_job.py \
        --input-dir <dir> --output <parquet> [--glob '*.png'] \
        [--rotation 0|90|180|270] [--target-h 8 --target-w 8]

Directory listing (binaryFile source, glob pushed into the listing) →
extension routing → REAL PNG/netpbm decode → optional rotation →
resize + features → parquet, with one JSON summary line on stdout.
Mirrors scripts/ExtractX_OCR.py:290-312 + :505-577 for the image branch;
the transcript branch is job.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--glob", default=None)
    p.add_argument("--rotation", type=int, default=0, choices=[0, 90, 180, 270])
    p.add_argument("--target-h", type=int, default=8)
    p.add_argument("--target-w", type=int, default=8)
    args = p.parse_args(argv)

    from ocr_spark.operators import multimodal
    from ocr_spark.sources import listed_payloads

    spark = SparkSession.builder.appName("ocr_spark.image_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()

    files = listed_payloads(spark, args.input_dir, glob=args.glob)
    payloads = files.select(
        F.xxhash64("path").alias("vec_id"),
        "path",
        F.col("content").alias("payload"),
    )
    rotated = multimodal.rotate_images(payloads, args.rotation)
    feats = multimodal.image_features(
        rotated, target=(args.target_h, args.target_w)
    )
    out = feats.join(payloads.select("vec_id", "path"), "vec_id").select(
        "path", "mean_px", "resized_h", "resized_w"
    )
    out.write.mode("overwrite").parquet(args.output)
    written = spark.read.parquet(args.output)
    # ONE job for the whole summary (count + failure count in a single
    # aggregate scan) — two separate .count() actions would re-scan the
    # output once per stat
    stats = written.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum((F.col("resized_h") == 0).cast("long")), F.lit(0)
        ).alias("n_failed"),
    ).first()
    n, n_failed = int(stats["n"]), int(stats["n_failed"])
    print(
        json.dumps(
            {
                "images": n,
                "failed": n_failed,
                "rotation": args.rotation,
                "wall_sec": round(time.monotonic() - t0, 2),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
