"""File/directory sources — the reference's input-discovery face.

The reference browses a directory interactively and dispatches files by
extension (scripts/ExtractX_OCR.py:60-116, :514-527). The engine's
equivalent is declarative: Spark's ``binaryFile`` source lists a
directory tree and yields one row per file with its bytes —
``(path, modificationTime, length, content)`` — with glob filtering and
recursive lookup handled by the data source itself (predicate pushdown
on path; files never touch the driver). Extension routing is then an
ordinary column expression, and payload parsing (e.g. the multimodal
IMG1 header) runs in the usual Arrow-batched operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The reference's extension whitelist (scripts/ExtractX_OCR.py:72,514-527).
PDF_EXTS = (".pdf",)
IMAGE_EXTS = (".png", ".jpg", ".jpeg")


def binary_dir_source(
    spark: SparkSession,
    input_dir: str,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """One row per file under ``input_dir``: (path, mod_time, length,
    content binary). ``glob`` filters filenames at the SOURCE (pushed into
    the file listing, not a post-scan filter)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    df = reader.load(input_dir)
    return df.select(
        "path",
        F.col("modificationTime").alias("mod_time"),
        "length",
        "content",
    )


def route_by_extension(files: DataFrame, path_col: str = "path") -> DataFrame:
    """Case-insensitive extension dispatch (reference
    scripts/ExtractX_OCR.py:514-527): pdf | image | unsupported; the
    unsupported rows are KEPT with their route so callers decide whether
    to drop (the reference skips them with a message)."""
    lower = F.lower(F.col(path_col))
    route = F.when(
        lower.endswith(PDF_EXTS[0]), F.lit("pdf")
    )
    for ext in IMAGE_EXTS:
        route = route.when(lower.endswith(ext), F.lit("image"))
    return files.withColumn("route", route.otherwise(F.lit("unsupported")))


def listed_payloads(
    spark: SparkSession, input_dir: str, glob: str | None = None
) -> DataFrame:
    """The composed reference front door: directory listing → extension
    routing → supported files only, payload bytes ready for the
    multimodal/extraction operators."""
    return route_by_extension(binary_dir_source(spark, input_dir, glob)).filter(
        F.col("route") != "unsupported"
    )
