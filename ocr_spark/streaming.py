"""Structured Streaming ingest: continuous extraction over arriving files.

The reference is strictly batch, and so is the driver contract
(checkpoint-resume via the lineage anti-join — SURVEY.md §2.6). This
module is the CONTINUOUS-ingest face of the same engine: transcript
files land in a directory (the usual shape of an event-log/Iceberg
ingest at 10^12-turn scale), Structured Streaming's file source tracks
what has been processed in its checkpoint, and every micro-batch runs
the IDENTICAL fused extraction stage (ocr_spark.pipeline.extract_stage)
and publishes one atomic snapshot (ocr_spark.table.commit_append) via
foreachBatch. Restarting the stream re-processes nothing — file-source
checkpointing gives exactly-once per file on top of the snapshot
atomicity per micro-batch.

Also provides the standard event-time surface: watermarked tumbling-
window turn counts for monitoring (late data beyond the watermark is
dropped, the Structured Streaming contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocr_spark.pipeline import DEFAULT_NUM_PARTS, DEFAULT_TURN_BUCKET, extract_stage

#: The driver contract's transcript schema (BASELINE.json input_hint);
#: streams require an explicit schema (no inference at runtime).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def read_transcript_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    table_root: str,
    checkpoint_dir: str,
    num_parts: int = DEFAULT_NUM_PARTS,
    turn_bucket: int = DEFAULT_TURN_BUCKET,
    available_now: bool = True,
):
    """Start the continuous extraction query; returns the StreamingQuery.

    ``available_now=True`` drains everything currently in the directory
    and stops (the batch-catch-up trigger); False runs indefinitely.
    """
    from ocr_spark import table as tbl

    stream = read_transcript_stream(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_stage(batch_df, num_parts=num_parts, turn_bucket=turn_bucket)
        tbl.commit_append(batch_df.sparkSession, table_root, out, part_col="part_id")

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_turn_counts(
    stream: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window monitoring aggregate:
    (window, tool, n_turns). Late events beyond the watermark are dropped;
    state is bounded by the watermark horizon."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "tool")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "tool",
            "n_turns",
        )
    )
