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
from ocr_spark.kernels.retry import TransientKernelError, call_with_retry
from ocr_spark.kernels.salvage import salvage_json

TOOL_HTML = "html"
TOOL_GRID = "grid"
TOOL_JSON = "json"
#: A transiently-failing tool: payload "fail:<n>:<text>" raises
#: TransientKernelError on the first <n> attempts, then succeeds as
#: pass-through of <text>. Deterministic fault injection for the retry
#: seam — the slot the reference's flaky network call occupies
#: (scripts/ExtractX_OCR.py:366-430).
TOOL_FLAKY = "flaky"

#: Reference retry budget: ≤3 attempts (scripts/ExtractX_OCR.py:366-367).
RETRY_ATTEMPTS = 3


def _extract_once(text: str | None, tool: str | None, attempt: int = 0) -> dict[str, Any]:
    """One attempt of one turn; raises TransientKernelError only for
    transient faults (retried by extract_turn), anything else degrades."""
    if tool == TOOL_FLAKY:
        parts = (text or "").split(":", 2)
        n = int(parts[1]) if len(parts) == 3 and parts[0] == "fail" else 0
        payload = parts[2] if len(parts) == 3 and parts[0] == "fail" else (text or "")
        if attempt < n:
            raise TransientKernelError(f"transient fault {attempt + 1}/{n}")
        return {
            "extracted_text": payload,
            "n_rows": 0,
            "n_cols": 0,
            "status": "ok" if payload else "empty",
        }
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


def extract_turn(
    text: str | None,
    tool: str | None,
    attempts: int = RETRY_ATTEMPTS,
    base_delay: float = 0.0,
) -> dict[str, Any]:
    """One turn → extraction record.

    Returns dict with keys: extracted_text (str), n_rows (int),
    n_cols (int), status ('ok'|'empty'|'error'), retries (int, attempts
    beyond the first — 0 on the deterministic kernels). Never raises — a
    transient fault is retried up to ``attempts`` times with bounded
    backoff and a bad turn degrades to the sentinel either way
    (scripts/ExtractX_OCR.py:282-284, 397, 406-428).
    """
    try:
        rec, used = call_with_retry(
            _extract_once, text, tool, attempts=attempts, base_delay=base_delay
        )
        rec["retries"] = used - 1
        return rec
    except TransientKernelError:
        # retry budget exhausted → empty sentinel, job never aborts
        return {
            "extracted_text": "",
            "n_rows": 0,
            "n_cols": 0,
            "status": "error",
            "retries": max(1, attempts) - 1,
        }
    except Exception:
        return {
            "extracted_text": "",
            "n_rows": 0,
            "n_cols": 0,
            "status": "error",
            "retries": 0,
        }
