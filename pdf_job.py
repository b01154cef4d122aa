"""PDF-mode job CLI — the reference's PDF front door, Spark-first.

    spark-submit --py-files ocr_spark.zip pdf_job.py \
        --input-dir <dir> --output <parquet> [--glob '*.pdf'] \
        [--start-page N] [--end-page N]

Directory listing (binaryFile source, glob pushed into the listing) →
.pdf routing → REAL container parse (kernels/pdf.py: xref, page tree,
FlateDecode, CID/ToUnicode text decode) → 1-based page rows → optional
page-range filter (end clamped per the reference,
scripts/ExtractX_OCR.py:252-258) → parquet, with one JSON summary line
on stdout. ``--images out.parquet`` additionally extracts every
embedded /Image XObject (DCTDecode via kernels/jpeg.py, Flate bitmaps)
— the reference's scanned-PDF reality: its own daat12221.pdf carries
its content as two page scans and a 3-char text layer
(scripts/ExtractX_OCR.py:263-265). Mirrors :240-288 + :505-577 for the
PDF branch; standalone images are image_job.py, transcripts are job.py.
Unparseable PDFs contribute zero pages (skip-and-continue, :282-284)
and are counted in the summary.
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
    p.add_argument("--start-page", type=int, default=1)
    p.add_argument("--end-page", type=int, default=None)
    p.add_argument(
        "--images",
        default=None,
        help="also extract embedded /Image XObjects to this parquet path",
    )
    args = p.parse_args(argv)

    from ocr_spark.operators import pages
    from ocr_spark.sources import listed_payloads

    spark = SparkSession.builder.appName("ocr_spark.pdf_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()

    files = listed_payloads(spark, args.input_dir, glob=args.glob).filter(
        F.col("route") == "pdf"
    )
    docs = files.select(
        F.xxhash64("path").alias("doc_id"), "path", F.col("content").alias("payload")
    )
    # path rides THROUGH the parse stage — no shuffle join back to the
    # source (which would also re-list and re-scan the directory)
    page_rows = pages.pdf_pages_from_bytes(docs, passthrough=("path",))
    if args.start_page > 1:
        page_rows = page_rows.filter(F.col("page_idx") >= args.start_page)
    if args.end_page is not None:
        # end clamps to the document's page count implicitly (no row has
        # a larger page_idx) — the reference's min(end, total)
        page_rows = page_rows.filter(F.col("page_idx") <= args.end_page)
    out = page_rows.select("path", "page_idx", "page_text")
    out.write.mode("overwrite").parquet(args.output)

    img_summary = {}
    if args.images:
        imgs = pages.pdf_images_from_bytes(docs, passthrough=("path",))
        imgs.select(
            "path", "page_idx", "img_name",
            "height", "width", "channels", "mean_px",
        ).write.mode("overwrite").parquet(args.images)
        istats = (
            spark.read.parquet(args.images)
            .agg(
                F.count("*").alias("n_images"),
                F.sum(
                    F.col("height").cast("long") * F.col("width") * F.col("channels")
                ).alias("image_px"),
            )
            .first()
        )
        img_summary = {
            "images": int(istats["n_images"]),
            "image_px": int(istats["image_px"] or 0),
            "images_output": args.images,
        }

    written = spark.read.parquet(args.output)
    # ONE job for the summary: files seen vs files that produced pages
    n_files = docs.count()
    stats = written.agg(
        F.count("*").alias("n_pages"),
        F.count_distinct("path").alias("n_parsed"),
    ).first()
    print(
        json.dumps(
            {
                "files": int(n_files),
                "parsed": int(stats["n_parsed"]),
                "skipped": int(n_files) - int(stats["n_parsed"]),
                "pages": int(stats["n_pages"]),
                "wall_sec": round(time.monotonic() - t0, 2),
                "output": args.output,
                **img_summary,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
