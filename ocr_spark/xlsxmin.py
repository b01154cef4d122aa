"""Dependency-free minimal .xlsx writer (zip + SpreadsheetML).

The reference's Excel sink (scripts/ExtractX_OCR.py:455-483) writes one
sheet named ``Extracted_Data`` with auto column widths via pandas +
openpyxl. This module supplies the same observable output with only the
standard library: an .xlsx file is a zip of XML parts, and a single
inline-string worksheet needs just five of them. Used by
``sinks.sink_excel`` when openpyxl is absent; toy-scale by design (the
engine's real sink is the parquet snapshot table layer).

All cell values are written as inline strings — matching the reference's
one-scalar-type-is-string data model (SURVEY.md §1.2).
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape, quoteattr

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels"'
    ' ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
    '<Override PartName="/xl/styles.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
    "</Types>"
)
_ROOT_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
    "</Relationships>"
)
_WB_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
    '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
    "</Relationships>"
)
_STYLES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    f'<styleSheet xmlns="{_NS}">'
    '<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>'
    '<fills count="1"><fill><patternFill patternType="none"/></fill></fills>'
    '<borders count="1"><border/></borders>'
    '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
    '<cellXfs count="1"><xf/></cellXfs>'
    "</styleSheet>"
)


def column_letter(i: int) -> str:
    """1-based column index → A1-style letters (1→A, 27→AA)."""
    out = ""
    while i > 0:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships">'
        f"<sheets><sheet name={quoteattr(sheet_name)} sheetId=\"1\" r:id=\"rId1\"/></sheets>"
        "</workbook>"
    )


_XESC = re.compile(r"_x[0-9A-Fa-f]{4}_")
#: XML 1.0 forbids these outright — no entity can represent them.
_XML_INVALID = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f]")


def _encode_cell_text(value) -> str:
    """SpreadsheetML text encoding: XML-invalid control characters become
    the OOXML ``_xHHHH_`` escape (what real Excel writers emit — XML 1.0
    cannot carry them even as entities), and literal substrings that LOOK
    like that escape get their underscore encoded first so decoding is
    unambiguous. This codebase makes NUL-bearing strings first-class
    (align.NA_SENTINEL), so the sink must not emit unparseable XML."""
    s = str(value)
    s = _XESC.sub(lambda m: "_x005F" + m.group(0), s)
    s = _XML_INVALID.sub(lambda m: f"_x{ord(m.group(0)):04X}_", s)
    return escape(s)


def _cell(row_idx: int, col_idx: int, value) -> str:
    if value is None or value != value:  # None / NaN → empty cell omitted
        return ""
    ref = f"{column_letter(col_idx)}{row_idx}"
    text = _encode_cell_text(value)
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(columns: list, rows: list[list], widths: dict | None) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        f'<worksheet xmlns="{_NS}">',
    ]
    if widths:
        parts.append("<cols>")
        for i, c in enumerate(columns, start=1):
            if c in widths:
                parts.append(
                    f'<col min="{i}" max="{i}" width="{widths[c]}" customWidth="1"/>'
                )
        parts.append("</cols>")
    parts.append("<sheetData>")
    header = "".join(_cell(1, j, c) for j, c in enumerate(columns, start=1))
    parts.append(f'<row r="1">{header}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(_cell(r, j, v) for j, v in enumerate(row, start=1))
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    path: str,
    columns: list,
    rows: list[list],
    sheet_name: str = "Extracted_Data",
    widths: dict | None = None,
) -> str:
    """Write a single-sheet inline-string .xlsx; ``widths`` maps column
    name → character width (the reference's min(max_len+2, 50))."""
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml", _sheet_xml(columns, rows, widths))
    return path
