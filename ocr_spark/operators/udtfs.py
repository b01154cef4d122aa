"""Python UDTF surface (Spark 4 table functions).

The reference has no user-extensible surface; the engine's hot path is
the Arrow-batched mapInArrow kernels. This module exposes the remaining
UDF-family face — a TABLE function — for the cases where one input row
expands into a variable number of typed rows and the expansion logic is
Python (regex/sentence heuristics that have no built-in equivalent).
Not a hot-path construct: for bulk row expansion prefer posexplode of a
built-in split (see operators/pages.explode_pages).
"""

from __future__ import annotations

from pyspark.sql.functions import lit, udtf


@udtf(returnType="sent_idx int, sentence string")
class SentenceSplit:
    """text → one row per '. '-separated sentence, in order, empties
    dropped. Deterministic plain-substring split so any engine (and the
    DuckDB oracle) reproduces the rows exactly."""

    def eval(self, text: str):
        if not text:
            return
        for i, s in enumerate(text.split(". ")):
            if s:
                yield (i, s)


def register(spark) -> None:
    """Make the UDTF callable from SQL as ``sentence_split(...)``
    (LATERAL-joinable against a table)."""
    spark.udtf.register("sentence_split", SentenceSplit)
