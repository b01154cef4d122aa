"""Corpus-quality job CLI — the tier-extraction funnel as a product.

    spark-submit --py-files ocr_spark.zip corpus_job.py \
        --input documents.parquet --output <dir> \
        [--bench-mod 97] [--signals <parquet>]

Runs the composed pretraining-quality funnel (operators/textops.py:
Gopher rules + repetition + exact-dup + eval-set decontamination →
discard/low/medium/high) over a documents table and writes the corpus
PARTITIONED BY TIER — the layout a data-mixing stage consumes (each
tier is its own directory; downstream sampling reads only the tiers it
wants, partition-pruned). ``--bench-mod N`` selects every N-th doc as
the stand-in eval set for the contamination leg (a real run would pass
a benchmark table). ``--signals`` additionally writes the per-document
signal columns for auditing.

Summary counts come from the WRITTEN output's tier partition column —
a zero-data-page scan (tier values live in directory names), the
scale-correct way to count a 100 TB write. One JSON line on stdout.
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
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--bench-mod", type=int, default=97)
    p.add_argument("--signals", default=None)
    args = p.parse_args(argv)

    from ocr_spark.operators import textops

    spark = SparkSession.builder.appName("ocr_spark.corpus_job").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.monotonic()

    docs = spark.read.parquet(args.input)
    bench = docs.filter(F.col("doc_id") % args.bench_mod == 0)
    tiers = textops.quality_tiers(docs, bench)

    # with --signals, materialize the funnel ONCE: write the signal
    # table first and read it back for the tiered write, so the
    # funnel's corpus scans and joins never run a second time
    if args.signals:
        tiers.write.mode("overwrite").parquet(args.signals)
        tiers = spark.read.parquet(args.signals)

    # the funnel's product: the corpus keyed by tier; the join back to
    # text is one exchange per side on doc_id, the write partitions by
    # the (low-cardinality) tier so readers prune whole tiers
    tiered = docs.join(tiers.select("doc_id", "tier"), "doc_id")
    tiered.write.mode("overwrite").partitionBy("tier").parquet(args.output)

    counts = {
        r["tier"]: int(r["n"])
        for r in spark.read.parquet(args.output)
        .groupBy("tier")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    total = sum(counts.values())
    kept = total - counts.get("discard", 0)
    print(
        json.dumps(
            {
                "docs": total,
                "tiers": {k: counts[k] for k in sorted(counts)},
                "kept": kept,
                "kept_frac": round(kept / total, 4) if total else 0.0,
                "wall_sec": round(time.monotonic() - t0, 2),
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
