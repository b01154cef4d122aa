"""Pandas oracle — the reference semantics, straight-line and sequential.

This module is the golden generator: it applies the same kernels the Spark
pipeline uses, but in plain pandas with no partitioning, exactly as the
reference's sequential per-page loop does (scripts/ExtractX_OCR.py:532-542
then :549-572). The pipeline's distributed output must equal this, per turn,
text-equal, under (conv_id, turn_idx) ordering — the driver's pass
criterion (BASELINE.json north_rule).
"""

from __future__ import annotations

import json

import pandas as pd

from ocr_spark.kernels.align import PageTable, align_pages
from ocr_spark.kernels.extract import extract_turn


def oracle_extract(transcripts: pd.DataFrame) -> pd.DataFrame:
    """Per-turn extraction, sorted by (conv_id, turn_idx)."""
    recs = [
        extract_turn(t, tool)
        for t, tool in zip(transcripts["text"], transcripts["tool"])
    ]
    out = pd.DataFrame(
        {
            "conv_id": transcripts["conv_id"].values,
            "turn_idx": transcripts["turn_idx"].values,
            "extracted_text": [r["extracted_text"] for r in recs],
            "n_rows": [r["n_rows"] for r in recs],
            "n_cols": [r["n_cols"] for r in recs],
            "status": [r["status"] for r in recs],
        }
    )
    return out.sort_values(["conv_id", "turn_idx"], ignore_index=True)


def _turn_table(extracted_text: str) -> PageTable:
    obj = json.loads(extracted_text)
    return (obj["columns"], obj["rows"])


def oracle_assemble(extracted: pd.DataFrame, tools: pd.Series) -> pd.DataFrame:
    """Per-conversation combined table (reference schema_align_union) in
    long-span form: (conv_id, row_seq, col_idx, col_name, cell).

    Only table-producing turns (grid/json) participate; pages are combined
    in turn order (the reference's page-ascending concat order,
    scripts/ExtractX_OCR.py:532,570). ``cell`` is None for cleaned NA,
    ``""`` only for alignment fill; non-string JSON scalars are serialized
    compactly so the span table is string-typed.
    """
    df = extracted.copy()
    df["tool"] = tools.values
    spans = []
    for conv_id, grp in df.groupby("conv_id", sort=True):
        grp = grp.sort_values("turn_idx")
        pages = [
            _turn_table(t)
            for t, tool in zip(grp["extracted_text"], grp["tool"])
            if tool in ("grid", "json")
        ]
        cols, rows = align_pages(pages)
        for r_i, row in enumerate(rows):
            for c_i, cell in enumerate(row):
                if cell is not None and not isinstance(cell, str):
                    cell = json.dumps(cell)
                spans.append((conv_id, r_i, c_i, cols[c_i], cell))
    return pd.DataFrame(
        spans, columns=["conv_id", "row_seq", "col_idx", "col_name", "cell"]
    )
