"""ocr_spark — a from-scratch PySpark-native main-content extraction engine.

Reimplements the *capabilities* of the reference extraction pipeline
(debabrataghoosh/ocr, surveyed in SURVEY.md) as an idiomatic Spark job:

- input: table of multi-turn transcripts
  ``(conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)``
- one fused, Arrow-batched extraction stage (HTML boilerplate strip /
  grid-image table detection / JSON salvage parse), never per-row Python
- explicit salted repartitioning on ``(conv_id, turn bucket)`` for
  long-conversation skew
- per-partition lineage rows (partition id, turn range, checksum, duration)
  enabling checkpoint-resume of unfinished partitions only
- deterministic output: per-turn extracted text equality vs the pandas
  oracle (reference semantics) under (conv_id, turn_idx) ordering.
"""

__version__ = "0.1.0"
