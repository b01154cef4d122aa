"""PDF container codec tests: build→parse round-trips, escape/unicode
strings, multi-stream pages, xref chain handling, the repair-mode object
scan, and the Spark page-explode operator.

Covers the reference's PDF front door (scripts/ExtractX_OCR.py:240-288)
at the container level — its own fixtures are rasterized scans, so the
image kernels own the pixel side."""

from __future__ import annotations

import os
import zlib

import pandas as pd
import pytest

from ocr_spark.kernels.pdf import (
    build_pdf,
    extract_pages,
    extract_text_ops,
    page_count,
)


def test_roundtrip_multi_page():
    pages = [
        "hello world\nsecond line",
        "page two with (parens) and \\ backslash and ) loose",
        "",
        "last",
    ]
    data = build_pdf(pages)
    assert data.startswith(b"%PDF-1.4")
    assert extract_pages(data) == pages
    assert page_count(data) == 4


def test_roundtrip_unicode_utf16_strings():
    pages = ["unicode — em dash, 中文, é ü", "plain ascii"]
    assert extract_pages(build_pdf(pages)) == pages


def test_roundtrip_control_bytes():
    pages = ["tab\there \x00nul \x1e sep", "\rcarriage"]
    assert extract_pages(build_pdf(pages)) == pages


def test_single_empty_page():
    assert extract_pages(build_pdf([""])) == [""]
    assert page_count(build_pdf([""])) == 1


def test_content_stream_text_ops():
    # TJ arrays concatenate strings and ignore kerning numbers; a closed
    # array consumed by a non-TJ operator (dash pattern) must not leak
    # into later Tj handling
    content = (
        b"[2 1] 0 d\n"
        b"BT /F1 12 Tf (first) Tj "
        b"[(kern)-120(ed)] TJ "
        b"(quoted) ' "
        b"1 2 (dquoted) \" "
        b"<68657821> Tj ET"
    )
    assert extract_text_ops(content) == ["first", "kerned", "quoted", "dquoted", "hex!"]


def test_octal_and_line_continuation_escapes():
    content = b"BT (a\\101b) Tj (line\\\ncont) Tj ET"
    assert extract_text_ops(content) == ["aAb", "linecont"]


def test_repair_mode_without_xref():
    # strip the xref table + trailer: the object-scan fallback must still
    # find /Root and the page tree
    data = build_pdf(["survives repair", "second page"])
    broken = data[: data.rindex(b"xref")] + b"%%EOF\n"
    assert extract_pages(broken) == ["survives repair", "second page"]


def test_uncompressed_content_stream():
    # hand-built page with no /Filter — parser must pass bytes through
    content = b"BT (raw stream) Tj ET"
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Count 1/Kids[3 0 R]>>",
        b"<</Type/Page/Parent 2 0 R/Contents 4 0 R>>",
        b"<</Length " + str(len(content)).encode() + b">>\nstream\n" + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs)+1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += f"trailer\n<</Size {len(objs)+1}/Root 1 0 R>>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    assert extract_pages(bytes(out)) == ["raw stream"]


def test_non_flate_filter_raises():
    data = build_pdf(["x"])
    bad = data.replace(b"/Filter/FlateDecode", b"/Filter/LZWDecode\x20\x20")
    # same length ⇒ xref offsets still valid
    with pytest.raises(NotImplementedError):
        extract_pages(bad)


def test_not_a_pdf_raises():
    with pytest.raises(ValueError):
        extract_pages(b"definitely not a pdf")


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/input/daat12221.pdf"),
    reason="reference fixtures absent",
)
def test_reference_fixtures_page_counts():
    # the reference's own inputs are classic-xref 1-page PDFs
    # (SURVEY.md reference inventory) — the parser must agree
    for name in ["daat12221.pdf", "grid data.pdf"]:
        raw = open(f"/root/reference/data/input/{name}", "rb").read()
        assert page_count(raw) == 1


def test_spark_pdf_pages_from_bytes(spark):
    from ocr_spark.operators import pages as pages_ops

    docs = [
        (0, build_pdf(["alpha one", "alpha two"])),
        (1, build_pdf(["beta"])),
        (2, b"corrupt not a pdf"),  # skip-and-continue: zero rows
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [d[0] for d in docs], "payload": [d[1] for d in docs]})
    )
    out = (
        pages_ops.pdf_pages_from_bytes(df)
        .toPandas()
        .sort_values(["doc_id", "page_idx"], ignore_index=True)
    )
    assert out.to_dict("list") == {
        "doc_id": [0, 0, 1],
        "page_idx": [1, 2, 1],
        "page_text": ["alpha one", "alpha two", "beta"],
    }


def test_nested_parentheses_in_content_strings():
    # legal and common in real PDFs; a flat regex silently truncates
    content = b"BT (a (b) c) Tj ((deep (deeper)) end) Tj ET"
    assert extract_text_ops(content) == ["a (b) c", "(deep (deeper)) end"]


def test_trailing_dot_reals_parse():
    # '612.' is a legal PDF real emitted by some writers; equal-length
    # patch so the xref offsets stay valid
    data = build_pdf(["mediabox test"])
    patched = data.replace(b"/MediaBox[0 0 612 792]", b"/MediaBox[0 0 612. 79]")
    assert len(patched) == len(data) and patched != data
    assert extract_pages(patched) == ["mediabox test"]


def test_latin1_text_starting_with_bom_bytes_roundtrips():
    # þÿ (0xFE 0xFF in latin-1) at the start of a literal string must NOT
    # trigger UTF-16 decoding — the writer emits UTF-16 only as hex
    pages = ["þÿabc", "plain"]
    assert extract_pages(build_pdf(pages)) == pages


def test_inline_property_dict_does_not_break_text():
    # BDC property lists are << >> dicts inside the content stream
    content = b"/OC <</Type /OCMD /S (not text)>> BDC BT (real) Tj ET EMC"
    assert extract_text_ops(content) == ["real"]


def test_modern_pdf_xref_stream_and_objstm_roundtrip():
    from ocr_spark.kernels.pdf import PdfDoc, build_pdf_modern

    pages = ["modern page one\nline two", "unicode — ü 中文", "", "last"]
    data = build_pdf_modern(pages)
    doc = PdfDoc(data)
    # the page tree is ObjStm-resident: xref-stream parse is load-bearing
    # (repair-mode scanning cannot see objects without `N G obj` headers)
    assert doc.compressed
    assert extract_pages(data) == pages
    assert page_count(data) == len(pages)


def test_modern_pdf_corrupt_xref_stream_fails_not_garbage():
    from ocr_spark.kernels.pdf import build_pdf_modern

    data = build_pdf_modern(["only page"])
    # corrupt the xref stream BODY (after the last '>>\nstream\n', which
    # is the XRef object's): parsing must error, not fabricate pages
    cut = data.rindex(b">>\nstream\n") + len(b">>\nstream\n")
    broken = data[:cut] + b"\x00\x00" + data[cut + 2 :]
    with pytest.raises(Exception):
        extract_pages(broken)


def test_mixed_classic_and_modern_through_spark(spark):
    from ocr_spark.kernels.pdf import build_pdf_modern
    from ocr_spark.operators import pages as pages_ops

    docs = [
        (0, build_pdf(["classic a", "classic b"])),
        (1, build_pdf_modern(["modern a", "modern b", "modern c"])),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [d[0] for d in docs], "payload": [d[1] for d in docs]})
    )
    out = (
        pages_ops.pdf_pages_from_bytes(df)
        .toPandas()
        .sort_values(["doc_id", "page_idx"], ignore_index=True)
    )
    assert out["page_text"].tolist() == [
        "classic a", "classic b", "modern a", "modern b", "modern c",
    ]
