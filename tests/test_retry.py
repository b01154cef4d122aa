"""Retry surface: bounded in-UDF retry with deterministic backoff
(reference scripts/ExtractX_OCR.py:366-430 — ≤3 attempts, exponential
delay, exhaustion degrades to the sentinel and never fails the job),
with attempts recorded in the per-partition lineage."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_spark.kernels.extract import extract_turn
from ocr_spark.kernels.retry import TransientKernelError, call_with_retry


def test_call_with_retry_converges_and_counts_attempts():
    def flaky(x, attempt=0):
        if attempt < 2:
            raise TransientKernelError("try again")
        return x * 10

    result, used = call_with_retry(flaky, 4, attempts=3)
    assert (result, used) == (40, 3)


def test_call_with_retry_exhaustion_reraises():
    def always(attempt=0):
        raise TransientKernelError("nope")

    with pytest.raises(TransientKernelError):
        call_with_retry(always, attempts=3)


def test_backoff_schedule_is_deterministic_exponential():
    delays: list[float] = []

    def always(attempt=0):
        raise TransientKernelError("nope")

    with pytest.raises(TransientKernelError):
        call_with_retry(
            always, attempts=4, base_delay=1.5, sleep=delays.append
        )
    assert delays == [1.5, 3.0, 6.0]  # base·2^k before retries 1..3


def test_extract_turn_flaky_converges_within_budget():
    rec = extract_turn("fail:2:hello world", "flaky")
    assert rec["extracted_text"] == "hello world"
    assert rec["status"] == "ok"
    assert rec["retries"] == 2


def test_extract_turn_flaky_exhausts_to_sentinel():
    rec = extract_turn("fail:99:never", "flaky")
    assert rec == {
        "extracted_text": "",
        "n_rows": 0,
        "n_cols": 0,
        "status": "error",
        "retries": 2,
    }


def test_deterministic_kernels_never_retry():
    assert extract_turn("<p>hi</p>", "html")["retries"] == 0
    assert extract_turn("plain", "other")["retries"] == 0


def test_pipeline_retries_transient_faults_and_records_lineage(spark, tmp_path):
    from ocr_spark.pipeline import read_lineage, run_pipeline

    # 30 turns: doc i needs i%4 attempts; i%4==3 exhausts the 3-attempt
    # budget → sentinel error; everything else converges to its payload
    pdf = pd.DataFrame(
        {
            "conv_id": [f"c{i:03d}" for i in range(30)],
            "turn_idx": [0] * 30,
            "role": ["user"] * 30,
            "text": [f"fail:{i % 4}:payload{i}" for i in range(30)],
            "tool": ["flaky"] * 30,
            "ts": pd.to_datetime(["2026-01-01"] * 30).astype("datetime64[us]"),
        }
    )
    inp = str(tmp_path / "in.parquet")
    pdf.to_parquet(inp, index=False)
    out = run_pipeline(spark, inp, str(tmp_path / "out"), num_parts=8).toPandas()
    out = out.set_index("conv_id")
    for i in range(30):
        if i % 4 == 3:
            assert out.loc[f"c{i:03d}", "status"] == "error"
            assert out.loc[f"c{i:03d}", "extracted_text"] == ""
        else:
            assert out.loc[f"c{i:03d}", "status"] == "ok"
            assert out.loc[f"c{i:03d}", "extracted_text"] == f"payload{i}"
    lin = read_lineage(spark, str(tmp_path / "out")).toPandas()
    # every record converged or exhausted WITHOUT failing its partition
    assert (lin["status"] == "ok").all()
    # retries: n%4==0 → 0, ==1 → 1, ==2 → 2, ==3 → 2 (budget 3) per doc
    want_retries = sum(min(i % 4, 2) for i in range(30))
    assert int(lin["retry_count"].sum()) == want_retries
    assert int(lin["error_count"].sum()) == sum(1 for i in range(30) if i % 4 == 3)
