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


def test_sink_excel_gated_without_openpyxl(small_df, tmp_path):
    try:
        import openpyxl  # noqa: F401

        has = True
    except ImportError:
        has = False
    if has:
        path = sinks.sink_excel(small_df, str(tmp_path / "o.xlsx"))
        assert os.path.exists(path)
    else:
        with pytest.raises(NotImplementedError):
            sinks.sink_excel(small_df, str(tmp_path / "o.xlsx"))


def test_save_outputs_shared_stamp(small_df, tmp_path):
    written = sinks.save_outputs(
        small_df, str(tmp_path), "extract", stamp="20260101_000000", formats=["csv"]
    )
    assert written == [str(tmp_path / "extract_20260101_000000.csv")]
    assert os.path.exists(written[0])
