"""Toy-scale sink parity: csv single file, excel width formula, stamp."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from ocr_spark import sinks


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "name": ["alpha", "a-very-long-value-" + "x" * 60, "bee"],
                "qty": ["1", "22", "333"],
            }
        )
    )


def test_sink_csv_single_file_with_header(small_df, tmp_path):
    path = sinks.sink_csv(small_df, str(tmp_path / "out.csv"))
    got = pd.read_csv(path, dtype=str)
    assert list(got.columns) == ["name", "qty"]
    assert len(got) == 3
    assert set(got["qty"]) == {"1", "22", "333"}


def test_excel_width_formula(small_df):
    # reference: min(max_len + 2, 50)  (scripts/ExtractX_OCR.py:477)
    widths = sinks.compute_excel_widths(small_df)
    assert widths["qty"] == 3 + 2
    assert widths["name"] == 50  # 78-char value capped at 50


def test_sink_excel_writes_valid_workbook(small_df, tmp_path):
    # works with or without openpyxl: the stdlib zip+XML fallback produces
    # an equivalent inline-string workbook. Verified by parsing the parts.
    import zipfile
    import xml.etree.ElementTree as ET

    path = sinks.sink_excel(small_df, str(tmp_path / "o.xlsx"))
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml",
                "xl/worksheets/sheet1.xml"} <= names
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheet = wb.find("m:sheets/m:sheet", ns)
        assert sheet.get("name") == sinks.EXCEL_SHEET
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        rows = ws.findall("m:sheetData/m:row", ns)
        assert len(rows) == 4  # header + 3 data rows
        def row_texts(r):
            out = []
            for c in r.findall("m:c", ns):
                t = c.find("m:is/m:t", ns)
                v = c.find("m:v", ns)
                out.append(t.text if t is not None else (v.text if v is not None else ""))
            return out
        assert row_texts(rows[0]) == ["name", "qty"]
        body = [row_texts(r) for r in rows[1:]]
        assert {tuple(r) for r in body} == {
            tuple(map(str, t)) for t in small_df.collect()
        }
        # reference width formula reaches the file: min(max_len+2, 50)
        widths = sinks.compute_excel_widths(small_df)
        cols = ws.findall("m:cols/m:col", ns)
        if cols:  # minimal-writer path (openpyxl path stores widths elsewhere)
            got_w = {int(c.get("min")): float(c.get("width")) for c in cols}
            assert got_w[1] == widths["name"] and got_w[2] == widths["qty"]


def test_xlsxmin_escapes_markup(tmp_path):
    from ocr_spark.xlsxmin import write_xlsx
    import zipfile
    import xml.etree.ElementTree as ET

    path = write_xlsx(
        str(tmp_path / "esc.xlsx"), ["a"], [["<b> & 'q' \"z\""], [None], ["  pad  "]]
    )
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    texts = [t.text for t in ws.findall(".//m:t", ns)]
    assert texts[1] == "<b> & 'q' \"z\""  # XML-escaped on write, parsed back
    assert texts[2] == "  pad  "  # xml:space=preserve keeps whitespace


def test_save_outputs_shared_stamp(small_df, tmp_path):
    written = sinks.save_outputs(
        small_df, str(tmp_path), "extract", stamp="20260101_000000", formats=["csv"]
    )
    assert written == [str(tmp_path / "extract_20260101_000000.csv")]
    assert os.path.exists(written[0])


def test_xlsxmin_fuzz_roundtrip(tmp_path):
    # arbitrary unicode/markup text must survive the write→parse roundtrip
    import xml.etree.ElementTree as ET
    import zipfile

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ocr_spark.xlsxmin import write_xlsx

    # XML 1.0 forbids most control chars; the writer targets printable text
    cell_text = st.text(
        alphabet=st.characters(blacklist_categories=("Cs", "Cc")), max_size=40
    )

    @settings(max_examples=30, deadline=None)
    @given(st.lists(st.lists(cell_text, min_size=2, max_size=2), max_size=5))
    def roundtrip(rows):
        path = write_xlsx(str(tmp_path / "f.xlsx"), ["a", "b"], rows)
        ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
        with zipfile.ZipFile(path) as z:
            ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
        got = []
        for r in ws.findall("m:sheetData/m:row", ns)[1:]:
            cells = {}
            for c in r.findall("m:c", ns):
                col = "".join(ch for ch in c.get("r") if ch.isalpha())
                t = c.find("m:is/m:t", ns)
                cells[col] = t.text if t is not None and t.text is not None else ""
            got.append([cells.get("A", ""), cells.get("B", "")])
        assert got == [[row[0], row[1]] for row in rows]

    roundtrip()


def test_xlsxmin_control_chars_produce_valid_xml(tmp_path):
    # NUL-bearing strings are first-class here (align.NA_SENTINEL) — the
    # workbook must stay parseable, with OOXML _xHHHH_ escapes in place
    import xml.etree.ElementTree as ET
    import zipfile

    from ocr_spark.xlsxmin import write_xlsx

    rows = [["\x00NA"], ["bell\x07"], ["looks_x0041_escaped"], ["tab\tok"]]
    path = write_xlsx(str(tmp_path / "ctrl.xlsx"), ["a"], rows)
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(path) as z:
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))  # must parse
    texts = [t.text for t in ws.findall(".//m:t", ns)][1:]
    assert texts[0] == "_x0000_NA"
    assert texts[1] == "bell_x0007_"
    assert texts[2] == "looks_x005F_x0041_escaped"  # literal escape protected
    assert texts[3] == "tab\tok"  # \t is XML-legal, kept verbatim
