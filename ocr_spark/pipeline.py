"""The distributed extraction pipeline.

Dataflow (SURVEY.md §3.4):

    read transcripts parquet
      → optional turn-range filter          (partition/rowgroup pruning)
      → optional resume anti-join           (skip finished logical parts)
      → part_id = pmod(xxhash64(conv_id, floor(turn_idx/BUCKET)), P)
        repartition(P, part_id)             (explicit SALTED repartition:
                                             the turn bucket splits long
                                             conversations across parts)
      → ONE fused mapInArrow stage: route(html|grid|json|text) → extract
        → clean → serialize, emitting per-logical-part LINEAGE rows in-band
      → write parquet partitioned by rec ∈ {data, lineage}

Design notes for 100-TB scale:

- part_id is DATA-DERIVED (hash of conv_id + turn bucket), not the physical
  partition index, so checkpoint-resume units are stable across cluster
  sizes and retries.
- The extraction kernels cross the JVM↔Python boundary exactly once, on
  Arrow record batches; there is no per-row Python UDF anywhere.
- Lineage rows ride the same output schema (rec='lineage', payload JSON in
  extracted_text) so data + lineage are produced in a single pass with no
  second job, no driver collection, and an atomic-enough commit (same
  write).
- Ordering is logical, never physical: the equality check sorts by
  (conv_id, turn_idx); nothing downstream depends on task order.
"""

from __future__ import annotations

import hashlib
import json
import time
from collections.abc import Iterator
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.kernels.align import align_pages
from ocr_spark.kernels.extract import extract_turn

#: Default number of logical resume partitions; at 10^12 turns this would be
#: sized to ~1-4 GB of input per part (e.g. 2^17 parts), here sized for
#: local[32] with ≥4x parts per core at the bench scale.
DEFAULT_NUM_PARTS = 256
#: Turns per salt bucket: conversations longer than this are split across
#: logical parts, defusing long-conversation skew.
DEFAULT_TURN_BUCKET = 64

LINEAGE_TOOL = "__lineage__"

EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("rec", T.StringType()),
        T.StructField("part_id", T.IntegerType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("n_rows", T.IntegerType()),
        T.StructField("n_cols", T.IntegerType()),
        T.StructField("status", T.StringType()),
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        ("rec", pa.string()),
        ("part_id", pa.int32()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("extracted_text", pa.string()),
        ("n_rows", pa.int32()),
        ("n_cols", pa.int32()),
        ("status", pa.string()),
    ]
)

LINEAGE_JSON_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType()),
        T.StructField("conv_min", T.StringType()),
        T.StructField("conv_max", T.StringType()),
        T.StructField("turn_min", T.IntegerType()),
        T.StructField("turn_max", T.IntegerType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("error_count", T.LongType()),
        T.StructField("status", T.StringType()),
    ]
)


def turn_checksum(conv_id: str, turn_idx: int, text: str) -> int:
    """Order-insensitive per-turn digest; part checksum = sum mod 2^64."""
    h = hashlib.sha256(f"{conv_id}\x00{turn_idx}\x00{text}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def with_part_id(
    df: DataFrame,
    num_parts: int = DEFAULT_NUM_PARTS,
    turn_bucket: int = DEFAULT_TURN_BUCKET,
) -> DataFrame:
    """Salted logical partition id: hash(conv_id, turn bucket) % P."""
    return df.withColumn(
        "part_id",
        F.pmod(
            F.xxhash64("conv_id", F.floor(F.col("turn_idx") / F.lit(turn_bucket))),
            F.lit(num_parts),
        ).cast("int"),
    )


def _extract_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
    """The fused extraction kernel: one Arrow batch in, one out, plus one
    lineage row per logical part at end-of-partition."""
    start = time.monotonic()
    stats: dict[int, dict[str, Any]] = {}
    for batch in batches:
        cols = {name: batch.column(name).to_pylist() for name in batch.schema.names}
        n = len(cols["conv_id"])
        ext_text: list[str] = []
        n_rows: list[int] = []
        n_cols: list[int] = []
        status: list[str] = []
        for i in range(n):
            rec = extract_turn(cols["text"][i], cols["tool"][i])
            ext_text.append(rec["extracted_text"])
            n_rows.append(rec["n_rows"])
            n_cols.append(rec["n_cols"])
            status.append(rec["status"])
            pid = cols["part_id"][i]
            st = stats.get(pid)
            if st is None:
                st = stats[pid] = {
                    "conv_min": cols["conv_id"][i],
                    "conv_max": cols["conv_id"][i],
                    "turn_min": cols["turn_idx"][i],
                    "turn_max": cols["turn_idx"][i],
                    "n_turns": 0,
                    "checksum": 0,
                    "error_count": 0,
                }
            st["conv_min"] = min(st["conv_min"], cols["conv_id"][i])
            st["conv_max"] = max(st["conv_max"], cols["conv_id"][i])
            st["turn_min"] = min(st["turn_min"], cols["turn_idx"][i])
            st["turn_max"] = max(st["turn_max"], cols["turn_idx"][i])
            st["n_turns"] += 1
            st["checksum"] = (
                st["checksum"]
                + turn_checksum(cols["conv_id"][i], cols["turn_idx"][i], ext_text[-1])
            ) % (1 << 64)
            if status[-1] == "error":
                st["error_count"] += 1
        yield pa.RecordBatch.from_pydict(
            {
                "rec": ["data"] * n,
                "part_id": cols["part_id"],
                "conv_id": cols["conv_id"],
                "turn_idx": cols["turn_idx"],
                "role": cols["role"],
                "tool": cols["tool"],
                "extracted_text": ext_text,
                "n_rows": n_rows,
                "n_cols": n_cols,
                "status": status,
            },
            schema=_ARROW_SCHEMA,
        )
    if stats:
        duration_ms = int((time.monotonic() - start) * 1000)
        lineage_rows = [
            json.dumps(
                {
                    "part_id": pid,
                    "conv_min": st["conv_min"],
                    "conv_max": st["conv_max"],
                    "turn_min": st["turn_min"],
                    "turn_max": st["turn_max"],
                    "n_turns": st["n_turns"],
                    "checksum": f"{st['checksum']:016x}",
                    "duration_ms": duration_ms,
                    "error_count": st["error_count"],
                    "status": "ok",
                },
                sort_keys=True,
            )
            for pid, st in sorted(stats.items())
        ]
        pids = sorted(stats)
        k = len(pids)
        yield pa.RecordBatch.from_pydict(
            {
                "rec": ["lineage"] * k,
                "part_id": pids,
                "conv_id": [""] * k,
                "turn_idx": [-1] * k,
                "role": [""] * k,
                "tool": [LINEAGE_TOOL] * k,
                "extracted_text": lineage_rows,
                "n_rows": [0] * k,
                "n_cols": [0] * k,
                "status": ["ok"] * k,
            },
            schema=_ARROW_SCHEMA,
        )


def extract_stage(
    df: DataFrame,
    num_parts: int = DEFAULT_NUM_PARTS,
    turn_bucket: int = DEFAULT_TURN_BUCKET,
) -> DataFrame:
    """transcripts DataFrame → extracted DataFrame (data + lineage rows)."""
    salted = (
        with_part_id(df, num_parts, turn_bucket)
        # prune to the kernel's columns BEFORE the shuffle: ts (and any
        # extra user columns) never cross the exchange or the Python worker
        .select("part_id", "conv_id", "turn_idx", "role", "text", "tool")
        .repartition(num_parts, "part_id")
    )
    return salted.mapInArrow(_extract_batches, EXTRACT_SCHEMA)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_extracted(spark: SparkSession, output_path: str) -> DataFrame:
    """The data rows of a pipeline output (rec partition pruned at scan)."""
    df = spark.read.parquet(output_path)
    return df.filter(F.col("rec") == "data").drop("rec")


def read_lineage(spark: SparkSession, output_path: str) -> DataFrame:
    """The lineage table of a pipeline output, JSON-decoded."""
    df = spark.read.parquet(output_path)
    return (
        df.filter(F.col("rec") == "lineage")
        .select(F.from_json("extracted_text", LINEAGE_JSON_SCHEMA).alias("l"))
        .select("l.*")
    )


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    *,
    num_parts: int = DEFAULT_NUM_PARTS,
    turn_bucket: int = DEFAULT_TURN_BUCKET,
    start_turn: int | None = None,
    end_turn: int | None = None,
    resume: bool = False,
    only_parts: list[int] | None = None,
) -> DataFrame:
    """Run (or resume) the extraction job; returns the extracted data rows.

    ``resume=True`` reads the existing output's lineage, and processes only
    logical parts without an ok lineage row, appending to the same output —
    the reference's per-page skip-and-continue (scripts/ExtractX_OCR.py:282)
    scaled up to partition granularity (BASELINE.json north_rule).
    ``only_parts`` restricts processing (used by tests to simulate a job
    killed after k partitions).
    """
    df = read_transcripts(spark, input_path)
    if start_turn is not None:
        df = df.filter(F.col("turn_idx") >= F.lit(int(start_turn) ))
    if end_turn is not None:
        df = df.filter(F.col("turn_idx") <= F.lit(int(end_turn)))
    df = with_part_id(df, num_parts, turn_bucket)
    mode = "overwrite"
    if resume:
        try:
            finished = (
                read_lineage(spark, output_path)
                .filter(F.col("status") == "ok")
                .select("part_id")
                .distinct()
            )
            finished.count()  # force read now; a missing output → fresh run
        except Exception:
            finished = None
        if finished is not None:
            df = df.join(F.broadcast(finished), "part_id", "left_anti")
            mode = "append"
    if only_parts is not None:
        df = df.filter(F.col("part_id").isin([int(p) for p in only_parts]))
    out = (
        df.select("part_id", "conv_id", "turn_idx", "role", "text", "tool")
        .repartition(num_parts, "part_id")
        .mapInArrow(_extract_batches, EXTRACT_SCHEMA)
    )
    out.write.partitionBy("rec").mode(mode).parquet(output_path)
    return read_extracted(spark, output_path)


ASSEMBLE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("row_seq", T.IntegerType()),
        T.StructField("col_idx", T.IntegerType()),
        T.StructField("col_name", T.StringType()),
        T.StructField("cell", T.StringType()),
    ]
)


def _assemble_group(pdf) -> Any:
    import pandas as pd

    pdf = pdf.sort_values("turn_idx")
    pages = [
        (lambda o: (o["columns"], o["rows"]))(json.loads(t))
        for t, tool in zip(pdf["extracted_text"], pdf["tool"])
        if tool in ("grid", "json")
    ]
    cols, rows = align_pages(pages)
    out = []
    conv_id = pdf["conv_id"].iloc[0]
    for r_i, row in enumerate(rows):
        for c_i, cell in enumerate(row):
            if cell is not None and not isinstance(cell, str):
                cell = json.dumps(cell)
            out.append((conv_id, r_i, c_i, cols[c_i], cell))
    return pd.DataFrame(
        out, columns=["conv_id", "row_seq", "col_idx", "col_name", "cell"]
    )


def assemble_conversations(extracted: DataFrame) -> DataFrame:
    """Per-conversation combined table (reference schema_align_union,
    scripts/ExtractX_OCR.py:549-572) in long-span form.

    Grouped-map (applyInPandas) over conv_id: per-conversation page lists
    are small (≤ thousands of turns) while the number of conversations is
    huge, so the grouping parallelizes; the align kernel is shared with the
    oracle for bit-parity.
    """
    return (
        extracted.filter(F.col("tool").isin("grid", "json"))
        .select("conv_id", "turn_idx", "tool", "extracted_text")
        .groupBy("conv_id")
        .applyInPandas(_assemble_group, ASSEMBLE_SCHEMA)
    )
