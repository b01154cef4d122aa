"""JSON salvage parse — reference semantics.

Reference: scripts/ExtractX_OCR.py:384-404 — slice the reply from the first
``{`` to the last ``}`` (inclusive), ``json.loads`` it; ANY failure (no
braces, decode error, empty reply) degrades to the empty sentinel rather
than raising. The sentinel's exact shape is observable downstream
(scripts/ExtractX_OCR.py:397,401,404) and reproduced verbatim here.
"""

from __future__ import annotations

import json


def _sentinel() -> dict:
    return {
        "table_data": [],
        "summary": {"total_rows": 0, "total_columns": 0, "confidence": "low"},
    }


#: A fresh copy per call is returned by :func:`salvage_json`; this constant is
#: for equality checks in tests.
EMPTY_SENTINEL = _sentinel()


def salvage_json(text: str | None) -> dict:
    """Extract the outermost ``{...}`` substring and parse it.

    Returns the parsed object on success (even if it lacks ``table_data`` —
    the reference defers that check to DataFrame creation,
    scripts/ExtractX_OCR.py:435-439), else the empty sentinel.
    """
    if not text:
        return _sentinel()
    start = text.find("{")
    end = text.rfind("}") + 1
    if start < 0 or end <= start:
        return _sentinel()
    try:
        data = json.loads(text[start:end])
    except (json.JSONDecodeError, ValueError):
        return _sentinel()
    if not isinstance(data, dict):
        # reference would return the raw value; downstream dict access would
        # then fail per-page and degrade to an empty table — we normalize to
        # the sentinel, which is the same observable outcome.
        return _sentinel()
    return data
