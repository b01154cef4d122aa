"""WARC/1.0 kernel (ISO 28500) + the warc_roundtrip source operator."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ocr_spark import sources
from ocr_spark.kernels import warc as W

RECS = [
    (7, "http://x.example.com/7", b"hello world"),
    (9, "http://x.example.com/9", "café body".encode("utf-8")),
]


def test_roundtrip_gzip_members():
    data = W.build_warc(RECS, compress=True)
    # Common Crawl layout: one gzip member per record (warcinfo + 2)
    assert data[:2] == b"\x1f\x8b" and data.count(b"\x1f\x8b\x08") == 3
    recs = W.parse_warc(data)
    assert [r.type for r in recs] == ["warcinfo", "response", "response"]
    assert recs[1].http_status == 200
    assert recs[1].body == b"hello world"
    assert recs[1].uri == "http://x.example.com/7"
    assert recs[2].body.decode("utf-8") == "café body"
    assert int(recs[2].http_headers["content-length"]) == len(recs[2].body)


def test_roundtrip_uncompressed():
    plain = W.build_warc(RECS, compress=False)
    recs = W.parse_warc(plain)
    assert len(recs) == 3 and recs[0].type == "warcinfo"


def test_truncated_stream_keeps_complete_records():
    plain = W.build_warc(RECS, compress=False)
    got = W.parse_warc(plain[: len(plain) - 40])
    bodies = [r.body for r in got if r.type == "response"]
    assert bodies == [b"hello world"]


def test_deterministic_bytes():
    assert W.build_warc(RECS) == W.build_warc(RECS)


def test_bodies_with_warc_markers_roundtrip():
    # Content-Length framing must protect bodies that contain WARC
    # header text, record separators, or blank lines
    nasty = [
        b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n",
        b"Content-Length: 9999\r\n\r\n\r\n\r\n",
        b"\n\nHTTP/1.1 500 Oops\r\n\r\n",
        b"\x00\x01\x02\xff" * 7,
        b"",
    ]
    recs = [(i + 1, f"http://n/{i}", b) for i, b in enumerate(nasty)]
    parsed = [r for r in W.parse_warc(W.build_warc(recs)) if r.type == "response"]
    assert [r.body for r in parsed] == nasty


def test_hypothesis_random_bodies_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.binary(max_size=300), min_size=1, max_size=6))
    def run(bodies):
        recs = [(i, f"http://h/{i}", b) for i, b in enumerate(bodies)]
        parsed = [
            r for r in W.parse_warc(W.build_warc(recs)) if r.type == "response"
        ]
        assert [r.body for r in parsed] == bodies
        assert all(r.http_status == 200 for r in parsed)

    run()


def test_negative_content_length_terminates():
    # a bogus negative length must not rewind the scan into a loop
    bad = b"WARC/1.0\nContent-Length: -30\n\n"
    assert W.parse_warc(bad) == []
    plain = W.build_warc(RECS, compress=False)
    got = W.parse_warc(plain + bad)
    assert [r.body for r in got if r.type == "response"] == [
        b"hello world", "café body".encode("utf-8")
    ]


def test_corrupt_gzip_member_keeps_decoded_prefix():
    # garbage after a complete member region degrades, never raises
    data = W.build_warc(RECS, compress=True) + b"NOT-GZIP-GARBAGE"
    got = W.parse_warc(data)
    assert [r.type for r in got] == ["warcinfo", "response", "response"]


def test_record_ids_unique_across_record_types():
    recs = W.parse_warc(W.build_warc([(0, "http://x/0", b"zero")] + RECS))
    ids = [r.record_id for r in recs]
    assert len(ids) == len(set(ids)) == 4


def test_foreign_warc_lf_headers_and_case():
    # a record we didn't write: LF-only header lines, mixed-case names
    body = b"HTTP/1.1 404 Not Found\r\n\r\nmissing"
    rec = (
        b"WARC/1.0\n"
        b"warc-type: response\n"
        b"WARC-TARGET-URI: http://y/z\n"
        b"content-type: application/http; msgtype=response\n"
        + b"content-length: " + str(len(body)).encode() + b"\n\n"
        + body
    )
    got = W.parse_warc(rec)
    assert len(got) == 1
    assert got[0].uri == "http://y/z"
    assert got[0].http_status == 404
    assert got[0].body == b"missing"


def test_single_member_gzip_whole_file():
    # whole-file gzip (valid WARC too, just not per-record members)
    plain = W.build_warc(RECS, compress=False)
    recs = W.parse_warc(gzip.compress(plain))
    assert len(recs) == 3


def test_warc_roundtrip_operator(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(40), "text": [f"doc body {i}" for i in range(40)]}
        )
    )
    out = (
        sources.warc_roundtrip(docs)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == 40
    assert (out["http_status"] == 200).all()
    assert out.loc[17, "body"] == "doc body 17"
    assert out.loc[17, "url"].endswith("/17")
    assert (out["content_length"] == out["body"].str.len()).all()
    # 40 docs over 32 shards: shards 0-7 hold 2 records, the rest 1
    assert out.loc[5, "n_in_file"] == 2 and out.loc[31, "n_in_file"] == 1


def test_jsonl_roundtrip_operator_unicode_and_escaping(spark):
    texts = [
        'plain body',
        'quotes "and" \\backslashes\\ here',
        'newline\nand\ttab inside',
        'unicode éÅ中文 \U0001f600',
        '',
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["web"] * len(texts),
            }
        )
    )
    out = (
        sources.jsonl_roundtrip(docs)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == len(texts)
    for i, t in enumerate(texts):
        assert out.loc[i, "text"] == t          # escaping survives
    assert (out["shard"] == out.index % 32).all()
    assert (out["n_in_shard"] == 1).all()
    assert (out["line_idx"] == 0).all()


def test_jsonl_roundtrip_shard_layout(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(70),
                "text": [f"body {i}" for i in range(70)],
                "lang": ["en"] * 70,
                "source": ["web"] * 70,
            }
        )
    )
    out = (
        sources.jsonl_roundtrip(docs)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    # 70 docs over 32 shards: shards 0-5 hold 3 lines, rest 2
    assert out.loc[0, "n_in_shard"] == 3 and out.loc[31, "n_in_shard"] == 2
    # line order inside a shard is doc_id ascending: shard 0 holds
    # docs 0, 32, 64 at line_idx 0, 1, 2
    assert out.loc[32, "line_idx"] == 1 and out.loc[64, "line_idx"] == 2


def test_jsonl_roundtrip_preserves_nulls(spark):
    # ADVICE r4: str() coercion silently turned NULL payload fields into
    # the literal string 'None' — NULLs must ride through as JSON null.
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": ["body", None],
            "lang": [None, "en"],
            "source": ["web", None],
        }
    )
    schema = "doc_id long, text string, lang string, source string"
    docs = spark.createDataFrame(pdf, schema=schema)
    out = (
        sources.jsonl_roundtrip(docs)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "text"] is None and out.loc[0, "text"] == "body"
    assert out.loc[0, "lang"] is None and out.loc[1, "lang"] == "en"
    assert out.loc[1, "source"] is None
    assert "None" not in set(out["text"].dropna())


def test_warc_roundtrip_skips_null_text(spark):
    # a NULL body cannot be represented in WARC; the row is skipped
    # (degrade-don't-fail — one bad row must never abort the job)
    pdf = pd.DataFrame({"doc_id": [0, 1, 32], "text": ["ok", None, "too"]})
    docs = spark.createDataFrame(
        pdf, schema="doc_id long, text string"
    )
    out = sources.warc_roundtrip(docs).orderBy("doc_id").toPandas()
    assert list(out.doc_id) == [0, 32]
    assert "None" not in set(out.body)
