"""Job CLI export path: extraction → assembly → wide pivot → timestamped
csv/xlsx sinks (the reference's end-to-end save_outputs loop)."""

from __future__ import annotations

import os
import zipfile
import xml.etree.ElementTree as ET

import pandas as pd

import job
from ocr_spark.fixtures import make_transcripts


def test_job_assemble_export_writes_csv_and_xlsx(spark, tmp_path, capsys):
    pdf = make_transcripts(n_convs=8, turns_low=2, turns_high=5, seed=77)
    inp = str(tmp_path / "in.parquet")
    pdf.to_parquet(inp, index=False)
    out = str(tmp_path / "out")
    rc = job.main(
        [
            "--input", inp, "--output", out, "--num-parts", "8",
            "--assemble", "--export", "csv,excel",
            "--stamp", "20260101_000000", "--no-warmup",
        ]
    )
    assert rc == 0
    csv_path = out + "_export/extracted_20260101_000000.csv"
    xlsx_path = out + "_export/extracted_20260101_000000.xlsx"
    assert os.path.exists(csv_path) and os.path.exists(xlsx_path)
    got = pd.read_csv(csv_path, dtype=str)
    assert list(got.columns)[:2] == ["conv_id", "row_seq"]
    assert len(got) > 0
    # xlsx parses and carries the same header
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(xlsx_path) as z:
        ws = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    header = [t.text for t in ws.findall("m:sheetData/m:row[1]//m:t", ns)]
    assert header == list(got.columns)
