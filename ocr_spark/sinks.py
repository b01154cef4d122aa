"""Toy-scale sinks with reference parity (SURVEY.md §2.1).

The reference fans a combined pandas table out to timestamped .xlsx and
.csv (scripts/ExtractX_OCR.py:455-503). These are driver-side, toy-scale
sinks by design — at 10^12 turns the engine's real sink is the parquet /
snapshot table layer (ocr_spark.table); this module keeps the reference's
observable output behavior for parity and small exports:

- ``sink_csv``: utf-8, header, no index (scripts/ExtractX_OCR.py:485-491).
  Spark-side via coalesce(1) so the single-file contract holds.
- ``sink_excel``: sheet ``Extracted_Data``, auto column width
  ``min(max_len + 2, 50)`` (scripts/ExtractX_OCR.py:455-483, formula
  :477). Column widths are computed IN SPARK (one aggregate —
  relational.excel_widths) so only the final small table is collected;
  openpyxl is optional in the sandbox, so the writer degrades to a
  documented NotImplementedError when absent.
- ``save_outputs``: shared ``%Y%m%d_%H%M%S`` stamp across formats
  (scripts/ExtractX_OCR.py:493-503); the stamp is an argument, never
  ``datetime.now()`` inside the dataflow — determinism rule (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ocr_spark.operators.relational import excel_widths

EXCEL_SHEET = "Extracted_Data"


def sink_csv(df: DataFrame, path: str) -> str:
    """Single-file utf-8 csv with header (reference save_to_csv)."""
    tmp = path + ".spark-tmp"
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
    part = next(
        p for p in sorted(os.listdir(tmp)) if p.startswith("part-") and p.endswith(".csv")
    )
    os.replace(os.path.join(tmp, part), path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return path


def compute_excel_widths(df: DataFrame) -> dict[str, int]:
    """Reference auto-width per column: min(max(len)+2, 50), as a Spark
    aggregate (scripts/ExtractX_OCR.py:464-478)."""
    row = excel_widths(df, df.columns).first()
    return {c: int(row[f"{c}_width"]) for c in df.columns}


def sink_excel(df: DataFrame, path: str) -> str:
    """xlsx with the reference's sheet name and column widths. Collects to
    the driver (toy scale only, like the reference's pandas write). Uses
    openpyxl when available; otherwise the stdlib-only minimal writer
    (ocr_spark.xlsxmin) produces an equivalent inline-string workbook —
    no environment leaves this sink unimplemented."""
    widths = compute_excel_widths(df)
    pdf = df.toPandas()
    try:
        import openpyxl
        from openpyxl.utils import get_column_letter
    except ImportError:  # sandbox has no openpyxl → stdlib zip+XML writer
        from ocr_spark.xlsxmin import write_xlsx

        return write_xlsx(
            path,
            list(pdf.columns),
            pdf.values.tolist(),
            sheet_name=EXCEL_SHEET,
            widths=widths,
        )
    wb = openpyxl.Workbook()
    ws = wb.active
    ws.title = EXCEL_SHEET
    ws.append(list(pdf.columns))
    for row in pdf.itertuples(index=False):
        ws.append(list(row))
    for i, c in enumerate(pdf.columns, start=1):
        ws.column_dimensions[get_column_letter(i)].width = widths[c]
    wb.save(path)
    return path


def save_outputs(
    df: DataFrame,
    output_dir: str,
    base_name: str,
    stamp: str,
    formats: list[str] = ("csv",),
) -> list[str]:
    """Timestamped fan-out (reference save_outputs): one shared stamp,
    ``{base}_{stamp}.{ext}`` per requested format."""
    os.makedirs(output_dir, exist_ok=True)
    written = []
    for fmt in formats:
        if fmt == "csv":
            written.append(
                sink_csv(df, os.path.join(output_dir, f"{base_name}_{stamp}.csv"))
            )
        elif fmt == "excel":
            written.append(
                sink_excel(df, os.path.join(output_dir, f"{base_name}_{stamp}.xlsx"))
            )
        else:
            raise ValueError(f"unknown format: {fmt}")
    return written
