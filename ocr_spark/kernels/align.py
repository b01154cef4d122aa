"""Page-table construction, null-token cleaning, and schema alignment.

Reference semantics being reproduced (see SURVEY.md §1.2/§2.4):

- ``pd.DataFrame(table_data)`` (scripts/ExtractX_OCR.py:439): columns are the
  union of record keys in FIRST-SEEN order; a record missing a key yields NA.
- null-token clean (scripts/ExtractX_OCR.py:446): the exact string values
  ``'', 'nan', 'NaN', 'null', 'NULL'`` become NA — BEFORE alignment.
- multi-page alignment (scripts/ExtractX_OCR.py:549-570): single page passes
  through; otherwise the union of column sets, missing columns filled with
  the EMPTY STRING ``""`` (after cleaning — so alignment-filled cells stay
  ``""`` while cleaned cells are NA; the asymmetry is observable and kept),
  every page reordered to one column order, then concatenated in page order.
- The reference's unified column order is ``list(set(...))`` — process-hash
  nondeterministic (scripts/ExtractX_OCR.py:555-566). This rebuild pins the
  normative order to FIRST-SEEN (page ascending, then that page's own column
  order), one valid realization, stable under any parallelism.

A "page table" here is the tuple ``(columns: list[str], rows: list[list])``
where a cell is ``None`` for NA, ``""`` only for alignment fill, else the
raw JSON scalar. This long-lived intermediate is what both the Spark
pipeline and the pandas oracle serialize for the per-turn equality check.
"""

from __future__ import annotations

import json
from typing import Any

#: scripts/ExtractX_OCR.py:446
NULL_TOKENS = ("", "nan", "NaN", "null", "NULL")

#: In-map NA marker used where a container cannot hold real nulls
#: (Spark MapType values inside Arrow batches).
NA_SENTINEL = "\x00NA"

PageTable = tuple[list[str], list[list[Any]]]


def clean_null_tokens(value: Any) -> Any:
    """One cell: exact-match null tokens → None. Non-strings pass through."""
    if isinstance(value, str) and value in NULL_TOKENS:
        return None
    return value


def page_table_from_records(records: list[dict] | None) -> PageTable:
    """``table_data`` list-of-dicts → cleaned page table.

    Empty/missing input → empty table (scripts/ExtractX_OCR.py:435-439).
    Column order is first-seen across records; a record missing a column
    yields None (pandas NaN semantics). Null tokens are cleaned here, i.e.
    BEFORE alignment.
    """
    if not records:
        return ([], [])
    columns: list[str] = []
    seen: set[str] = set()
    for rec in records:
        if not isinstance(rec, dict):
            continue
        for key in rec:
            k = str(key)
            if k not in seen:
                seen.add(k)
                columns.append(k)
    rows: list[list[Any]] = []
    for rec in records:
        if not isinstance(rec, dict):
            continue
        rows.append([clean_null_tokens(rec.get(c)) for c in columns])
    if not rows:
        return ([], [])
    return (columns, rows)


def align_pages(pages: list[PageTable]) -> PageTable:
    """Combine page tables: union columns (first-seen), fill ``""``, concat.

    Mirrors scripts/ExtractX_OCR.py:549-570 including the single-page fast
    path (:551-552). Pages with zero rows are dropped before combining
    (scripts/ExtractX_OCR.py:538-542 drops empty page DataFrames).
    """
    nonempty = [p for p in pages if p[1]]
    if not nonempty:
        return ([], [])
    if len(nonempty) == 1:
        return nonempty[0]
    columns: list[str] = []
    seen: set[str] = set()
    for cols, _ in nonempty:
        for c in cols:
            if c not in seen:
                seen.add(c)
                columns.append(c)
    out_rows: list[list[Any]] = []
    for cols, rows in nonempty:
        idx = {c: i for i, c in enumerate(cols)}
        for row in rows:
            out_rows.append([row[idx[c]] if c in idx else "" for c in columns])
    return (columns, out_rows)


def serialize_table(table: PageTable) -> str:
    """Canonical per-turn text for the equality check.

    Compact JSON ``{"columns":[...],"rows":[[...]]}``; None → null,
    alignment fill stays ``""``. Deterministic: dict order is explicit,
    ensure_ascii=False keeps payload text verbatim.
    """
    columns, rows = table
    return json.dumps(
        {"columns": columns, "rows": rows},
        ensure_ascii=False,
        separators=(",", ":"),
    )
