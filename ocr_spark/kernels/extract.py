"""Per-turn extraction dispatch — the shared core of pipeline and oracle.

Mirrors the reference's extension dispatch (scripts/ExtractX_OCR.py:514-527)
on the ``tool`` column of a transcript turn:

- ``html`` → main-content boilerplate strip (DOM-density heuristics)
- ``grid`` → grid-image layout parse → table records → page table
- ``json`` → salvage parse of a model-reply string → page table
- anything else → pass-through text (reference returns empty for
  unsupported types; transcripts carry plain text turns, which the
  contract's per-turn text equality covers as identity)

The canonical ``extracted_text`` is what the driver's per-turn equality
check compares: plain text for html/pass-through, compact JSON
``{"columns":[...],"rows":[[...]]}`` for table-producing tools.
"""

from __future__ import annotations

from typing import Any

from ocr_spark.kernels.align import page_table_from_records, serialize_table
from ocr_spark.kernels.grid import extract_grid_table
from ocr_spark.kernels.htmlstrip import strip_html
from ocr_spark.kernels.salvage import salvage_json

TOOL_HTML = "html"
TOOL_GRID = "grid"
TOOL_JSON = "json"


def extract_turn(text: str | None, tool: str | None) -> dict[str, Any]:
    """One turn → extraction record.

    Returns dict with keys: extracted_text (str), n_rows (int),
    n_cols (int), status ('ok'|'empty'|'error'). Never raises — a bad
    turn degrades (scripts/ExtractX_OCR.py:282-284, 397).
    """
    try:
        if tool == TOOL_HTML:
            main = strip_html(text)
            return {
                "extracted_text": main,
                "n_rows": 0,
                "n_cols": 0,
                "status": "ok" if main else "empty",
            }
        if tool in (TOOL_GRID, TOOL_JSON):
            data = (
                extract_grid_table(text) if tool == TOOL_GRID else salvage_json(text)
            )
            table = page_table_from_records(
                data.get("table_data") if isinstance(data, dict) else None
            )
            cols, rows = table
            return {
                "extracted_text": serialize_table(table),
                "n_rows": len(rows),
                "n_cols": len(cols),
                "status": "ok" if rows else "empty",
            }
        return {
            "extracted_text": text or "",
            "n_rows": 0,
            "n_cols": 0,
            "status": "ok" if text else "empty",
        }
    except Exception:
        return {"extracted_text": "", "n_rows": 0, "n_cols": 0, "status": "error"}
