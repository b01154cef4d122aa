"""PDF container codec tests: build→parse round-trips, escape/unicode
strings, multi-stream pages, xref chain handling, the repair-mode object
scan, and the Spark page-explode operator.

Covers the reference's PDF front door (scripts/ExtractX_OCR.py:240-288)
at the container level — its own fixtures are rasterized scans, so the
image kernels own the pixel side."""

from __future__ import annotations

import os
import zlib

import numpy as np
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


def test_incremental_update_into_objstm_wins_over_classic_offset():
    # a classic 1.4 file incrementally updated by a 1.5 producer that
    # rewrites a page INSIDE an object stream: the newest xref stream's
    # type-2 entry must shadow the stale classic offset (newest-section-
    # wins spans both maps)
    base = build_pdf(["OLD TEXT"])
    base_xref = base.rindex(b"xref\n0 ")  # the table, not "startxref"
    # append: new page object 3 inside an ObjStm + xref stream update
    new_page = (
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F1 5 0 R>>>>"
        b"/Contents 6 0 R>>"
    )
    header = b"3 0"
    payload = header + b"\n" + new_page
    z = zlib.compress(payload)
    out = bytearray(base)
    objstm_off = len(out)
    out += (
        b"7 0 obj\n<</Type/ObjStm/N 1/First "
        + str(len(header) + 1).encode()
        + b"/Length " + str(len(z)).encode() + b"/Filter/FlateDecode>>\nstream\n"
        + z + b"\nendstream\nendobj\n"
    )
    content = b"BT /F1 12 Tf 72 720 Td (NEW TEXT) Tj ET"
    zc = zlib.compress(content)
    content_off = len(out)
    out += (
        b"6 0 obj\n<</Length " + str(len(zc)).encode()
        + b"/Filter/FlateDecode>>\nstream\n" + zc + b"\nendstream\nendobj\n"
    )
    # xref stream for the update: type-2 entry for 3, type-1 for 6,7,8
    xref_off = len(out)
    rows = {
        3: bytes([2]) + (7).to_bytes(4, "big") + (0).to_bytes(2, "big"),
        6: bytes([1]) + content_off.to_bytes(4, "big") + (0).to_bytes(2, "big"),
        7: bytes([1]) + objstm_off.to_bytes(4, "big") + (0).to_bytes(2, "big"),
        8: bytes([1]) + xref_off.to_bytes(4, "big") + (0).to_bytes(2, "big"),
    }
    body = b"".join(rows[n] for n in sorted(rows))
    zx = zlib.compress(body)
    out += (
        b"8 0 obj\n<</Type/XRef/Size 9/W[1 4 2]"
        b"/Index[3 1 6 3]"
        b"/Root 1 0 R/Prev " + str(base_xref).encode()
        + b"/Length " + str(len(zx)).encode() + b"/Filter/FlateDecode>>\nstream\n"
        + zx + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    assert extract_pages(bytes(out)) == ["NEW TEXT"]


def test_free_entry_in_newer_section_hides_older_object():
    # an incremental update marks the 2nd page's objects free; the older
    # section must not resurrect them — page tree shrinks accordingly
    from ocr_spark.kernels.pdf import PdfDoc

    base = build_pdf(["page one", "page two"])
    assert page_count(base) == 2
    base_xref = base.rindex(b"xref\n0 ")  # the table, not "startxref"
    out = bytearray(base)
    # rewritten pages node (object 2) referencing only page 3
    new_pages = b"2 0 obj\n<</Type/Pages/Count 1/Kids[3 0 R]>>\nendobj\n"
    pages_off = len(out)
    out += new_pages
    xref_off = len(out)
    out += b"xref\n0 1\n0000000000 65535 f \n"
    out += b"2 1\n" + f"{pages_off:010d} 00000 n \n".encode()
    # mark old page-2 objects (5: page dict, 6: its content) free
    out += b"5 2\n"
    out += b"0000000000 00001 f \n" * 2
    out += (
        b"trailer\n<</Size 9/Root 1 0 R/Prev " + str(base_xref).encode()
        + b">>\nstartxref\n" + str(xref_off).encode() + b"\n%%EOF\n"
    )
    data = bytes(out)
    assert page_count(data) == 1
    assert extract_pages(data) == ["page one"]
    doc = PdfDoc(data)
    assert doc.get_object(5) is None  # freed, not resurrected


def test_decode_stream_png_predictor_with_colors():
    # /Colors 3: the Sub filter's byte offset must be 3, not 1
    import numpy as np

    from ocr_spark.kernels.pdf import PdfDoc, Name

    doc = PdfDoc(build_pdf(["x"]))
    raw_rows = np.arange(24, dtype=np.uint8).reshape(2, 12)
    filtered = bytearray()
    for row in raw_rows:
        filt = row.astype(int).copy()
        filt[3:] = (row[3:].astype(int) - row[:-3].astype(int)) % 256  # Sub, bpp=3
        filtered += b"\x01" + bytes(filt.astype(np.uint8))
    sdict = {
        "Filter": Name("FlateDecode"),
        "DecodeParms": {"Predictor": 11, "Columns": 4, "Colors": 3},
    }
    out = doc._decode_stream(sdict, zlib.compress(bytes(filtered)))
    assert out == raw_rows.tobytes()
    # a truncated predictor stream is an error, not silent row loss
    with pytest.raises(ValueError):
        doc._decode_stream(sdict, zlib.compress(bytes(filtered[:-3])))


def test_hybrid_reference_file_xrefstm():
    # Acrobat-style hybrid: classic table lists ObjStm-resident objects
    # as FREE; the trailer's /XRefStm points at the stream holding their
    # real (type-2) entries — readers must consult it first
    content = b"BT /F1 12 Tf 72 720 Td (hybrid text) Tj ET"
    zc = zlib.compress(content)
    compressed = [
        (3, b"<</Type/Catalog/Pages 4 0 R>>"),
        (4, b"<</Type/Pages/Count 1/Kids[5 0 R]>>"),
        (5, b"<</Type/Page/Parent 4 0 R/Resources<</Font<</F1 6 0 R>>>>/Contents 1 0 R>>"),
        (6, b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>"),
    ]
    header = " ".join(
        f"{n} {off}" for n, off in zip(
            [c[0] for c in compressed],
            np.cumsum([0] + [len(c[1]) + 1 for c in compressed[:-1]]),
        )
    ).encode()
    body = b" ".join(c[1] for c in compressed)
    zo = zlib.compress(header + b"\n" + body)

    out = bytearray(b"%PDF-1.5\n")
    off1 = len(out)
    out += (b"1 0 obj\n<</Length " + str(len(zc)).encode()
            + b"/Filter/FlateDecode>>\nstream\n" + zc + b"\nendstream\nendobj\n")
    off2 = len(out)
    out += (b"2 0 obj\n<</Type/ObjStm/N 4/First " + str(len(header) + 1).encode()
            + b"/Length " + str(len(zo)).encode()
            + b"/Filter/FlateDecode>>\nstream\n" + zo + b"\nendstream\nendobj\n")
    off7 = len(out)
    rows = []
    for num in range(8):
        if num == 0:
            rows.append(bytes([0]) + bytes(4) + b"\xff\xff")
        elif num in (1, 2, 7):
            off = {1: off1, 2: off2, 7: off7}[num]
            rows.append(bytes([1]) + off.to_bytes(4, "big") + bytes(2))
        else:
            idx = [c[0] for c in compressed].index(num)
            rows.append(bytes([2]) + (2).to_bytes(4, "big") + idx.to_bytes(2, "big"))
    zx = zlib.compress(b"".join(rows))
    out += (b"7 0 obj\n<</Type/XRef/Size 8/W[1 4 2]/Root 3 0 R/Length "
            + str(len(zx)).encode() + b"/Filter/FlateDecode>>\nstream\n"
            + zx + b"\nendstream\nendobj\n")
    table_off = len(out)
    out += b"xref\n0 8\n"
    out += b"0000000000 65535 f \n"
    out += f"{off1:010d} 00000 n \n".encode()
    out += f"{off2:010d} 00000 n \n".encode()
    out += b"0000000000 00000 f \n" * 4  # ObjStm residents listed free
    out += f"{off7:010d} 00000 n \n".encode()
    out += (b"trailer\n<</Size 8/Root 3 0 R/XRefStm " + str(off7).encode()
            + b">>\nstartxref\n" + str(table_off).encode() + b"\n%%EOF\n")
    data = bytes(out)
    assert extract_pages(data) == ["hybrid text"]
    assert page_count(data) == 1


# ---------------------------------------------------------------------------
# CID / ToUnicode text decoding (round-4: the real-world font path)
# ---------------------------------------------------------------------------


def test_cid_roundtrip_multi_page():
    from ocr_spark.kernels.pdf import build_pdf_cid

    pages = [
        "hello world\nsecond line",
        "unicode — ü 中文 and 𝄞 astral",
        "",
        "repeat hello",
    ]
    data = build_pdf_cid(pages)
    # the show strings are 2-byte subset codes: the raw bytes must NOT
    # contain the page text (proves decoding went through the CMap)
    assert b"hello" not in data
    assert extract_pages(data) == pages
    assert page_count(data) == len(pages)


def test_cid_codes_are_not_unicode():
    # first-seen code assignment: 'h'→1, 'e'→2 … — a decoder that
    # UTF-16BE-decodes the bytes instead of consulting the CMap yields
    # control characters, not text
    from ocr_spark.kernels.pdf import build_pdf_cid

    data = build_pdf_cid(["abc"])
    assert extract_pages(data) == ["abc"]


def test_parse_tounicode_bfchar_and_scalar_bfrange():
    from ocr_spark.kernels.pdf import parse_tounicode

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"2 beginbfchar\n<0003> <0041>\n<0007> <D834DD1E>\nendbfchar\n"
        b"1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n"
        b"endcmap\nend\nend\n"
    )
    nbytes, m = parse_tounicode(cmap)
    assert nbytes == 2
    assert m[3] == "A"
    assert m[7] == "\U0001d11e"  # surrogate-pair destination
    assert (m[0x10], m[0x11], m[0x12]) == ("a", "b", "c")


def test_parse_tounicode_array_bfrange():
    from ocr_spark.kernels.pdf import parse_tounicode

    cmap = (
        b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
        b"1 beginbfrange\n<0001> <0003> [<0058> <0059> <005A>]\nendbfrange\n"
        b"endcmap\n"
    )
    _n, m = parse_tounicode(cmap)
    assert (m[1], m[2], m[3]) == ("X", "Y", "Z")


def test_identity_h_without_tounicode_decodes_utf16be():
    # Identity-H with no /ToUnicode: the fallback is UTF-16BE code units
    # (codes == unicode for unsubsetted identity fonts)
    from ocr_spark.kernels.pdf import build_pdf_cid

    data = build_pdf_cid(["fallback ok"])
    # strip the /ToUnicode entry (equal-length patch keeps xref valid)
    patched = data.replace(b"/ToUnicode", b"/XoUnicode")
    assert len(patched) == len(data)
    got = extract_pages(patched)[0]
    # each char of "fallback ok" decodes to chr(first-seen code) — the
    # UTF-16BE identity reading of the 2-byte code units
    order = {}
    for ch in "fallback ok":
        order.setdefault(ch, len(order) + 1)
    assert got == "".join(chr(order[ch]) for ch in "fallback ok")


def test_simple_font_with_tounicode_one_byte_codes():
    # a 1-byte-code simple font whose ToUnicode remaps bytes
    import zlib as _zlib

    from ocr_spark.kernels.pdf import PdfDoc
    from ocr_spark.kernels.pdf import extract_text_ops as eto

    cmap = (
        b"begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"2 beginbfchar\n<41> <0068>\n<42> <0069>\nendbfchar\nendcmap\n"
    )
    z = _zlib.compress(cmap)
    content = b"BT /F9 10 Tf (AB) Tj ET"
    zc = _zlib.compress(content)
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Count 1/Kids[3 0 R]>>",
        b"<</Type/Page/Parent 2 0 R/Resources<</Font<</F9 5 0 R>>>>/Contents 4 0 R>>",
        b"<</Length " + str(len(zc)).encode() + b"/Filter/FlateDecode>>\nstream\n" + zc + b"\nendstream",
        b"<</Type/Font/Subtype/TrueType/BaseFont/Whatever/ToUnicode 6 0 R>>",
        b"<</Length " + str(len(z)).encode() + b"/Filter/FlateDecode>>\nstream\n" + z + b"\nendstream",
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
    assert extract_pages(bytes(out)) == ["hi"]


def test_tf_switches_decoder_within_content_stream():
    # two fonts in one stream: /F1 simple latin-1, /F2 CID via fonts map
    from ocr_spark.kernels.pdf import extract_text_ops, make_font_decoder

    cid = make_font_decoder(2, {1: "Z", 2: "q"}, identity_fallback=True)
    fonts = {"F2": cid}
    content = (
        b"BT /F1 12 Tf (plain) Tj /F2 12 Tf <00010002> Tj "
        b"/F1 12 Tf (back) Tj ET"
    )
    assert extract_text_ops(content, fonts) == ["plain", "Zq", "back"]


def test_resources_inherited_from_pages_node():
    # /Resources on the Pages NODE, not the page: inheritance walk
    import zlib as _zlib

    from ocr_spark.kernels.pdf import build_pdf_cid

    data = build_pdf_cid(["inherited resources"])
    # move Resources up: point the page's Resources at an empty dict and
    # the parent at the real one — instead construct directly:
    # simpler: patch the page dict to drop Resources and add to parent
    # (string surgery is brittle; build a tiny doc by hand)
    cmap = (
        b"begincmap\n1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<58> <0057>\nendbfchar\nendcmap\n"
    )
    z = _zlib.compress(cmap)
    content = b"BT /F1 1 Tf (X) Tj ET"
    zc = _zlib.compress(content)
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Count 1/Kids[3 0 R]/Resources<</Font<</F1 5 0 R>>>>>>",
        b"<</Type/Page/Parent 2 0 R/Contents 4 0 R>>",
        b"<</Length " + str(len(zc)).encode() + b"/Filter/FlateDecode>>\nstream\n" + zc + b"\nendstream",
        b"<</Type/Font/Subtype/TrueType/BaseFont/X/ToUnicode 6 0 R>>",
        b"<</Length " + str(len(z)).encode() + b"/Filter/FlateDecode>>\nstream\n" + z + b"\nendstream",
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
    assert extract_pages(bytes(out)) == ["W"]


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/input/grid data.pdf"),
    reason="reference fixtures absent",
)
def test_reference_fixture_cid_text_is_readable():
    # both reference fixtures use Identity-H CID fonts with ToUnicode
    # CMaps; extraction must return NUL-free readable text — 'grid
    # data.pdf' carries a 15KB text layer beginning with the April table
    raw = open("/root/reference/data/input/grid data.pdf", "rb").read()
    txt = extract_pages(raw)[0]
    assert "\x00" not in txt
    assert txt.startswith("April")
    assert "DATA" in txt and "HALL" in txt
    raw2 = open("/root/reference/data/input/daat12221.pdf", "rb").read()
    txt2 = extract_pages(raw2)[0]
    assert "\x00" not in txt2  # scanned page: tiny text layer, but clean


# ---------------------------------------------------------------------------
# image XObjects (round-4: the scanned-PDF reality)
# ---------------------------------------------------------------------------


def test_image_xobject_flate_roundtrip_exact():
    import numpy as np

    from ocr_spark.kernels.pdf import build_pdf_images, extract_images

    gray = np.arange(300, dtype=np.uint8).reshape(15, 20) % 256
    rgb = np.dstack([gray, gray // 2, 255 - gray])
    data = build_pdf_images([gray, rgb])
    imgs = extract_images(data)
    assert [(p, n) for p, n, _ in imgs] == [(1, "Im0"), (2, "Im0")]
    assert np.array_equal(imgs[0][2], gray)
    assert np.array_equal(imgs[1][2], rgb)


def test_image_xobject_jpeg_grid_cells_decode():
    import numpy as np

    from ocr_spark.kernels.grid import read_grid_cells, render_grid
    from ocr_spark.kernels.pdf import build_pdf_images, extract_images

    cells = [["r", "s"], ["hello", "wo4ld"]]
    img = (render_grid(cells) * 255).astype(np.uint8)
    data = build_pdf_images([img], jpeg=True, quality=90)
    got = extract_images(data)[0][2]
    assert got.ndim == 2  # single-component JPEG → 2-D gray
    assert read_grid_cells((got > 127).astype(np.uint8)) == cells


def test_image_xobject_1bit_bitmap():
    import zlib as _zlib

    import numpy as np

    from ocr_spark.kernels.pdf import build_pdf_images, extract_images

    # patch a built PDF? simpler: hand-build via build_pdf_images then
    # verify the 1-bit path directly through PdfDoc._decode_image_xobject
    from ocr_spark.kernels.pdf import PdfDoc, Name, build_pdf

    doc = PdfDoc(build_pdf(["x"]))
    bits = np.array([[1, 0, 1, 0, 1], [0, 1, 0, 1, 0]], dtype=np.uint8)
    packed = np.packbits(bits, axis=1).tobytes()
    d = {
        "Subtype": Name("Image"), "Width": 5, "Height": 2,
        "BitsPerComponent": 1, "ColorSpace": Name("DeviceGray"),
        "Filter": Name("FlateDecode"),
    }
    arr = doc._decode_image_xobject(d, _zlib.compress(packed))
    assert np.array_equal(arr, bits * 255)


def test_spark_pdf_images_from_bytes(spark):
    import numpy as np
    import pandas as pd

    from ocr_spark.kernels.pdf import build_pdf, build_pdf_images
    from ocr_spark.operators import pages as pages_ops

    img = np.full((8, 9), 100, np.uint8)
    docs = [
        (0, build_pdf_images([img, img])),
        (1, build_pdf(["text only, no images"])),
        (2, b"corrupt"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [d[0] for d in docs], "payload": [d[1] for d in docs]})
    )
    out = (
        pages_ops.pdf_images_from_bytes(df)
        .toPandas()
        .sort_values(["doc_id", "page_idx"], ignore_index=True)
    )
    assert out["doc_id"].tolist() == [0, 0]
    assert out["page_idx"].tolist() == [1, 2]
    assert out["height"].tolist() == [8, 8]
    assert out["width"].tolist() == [9, 9]
    assert out["channels"].tolist() == [1, 1]
    assert out["mean_px"].tolist() == [100.0, 100.0]


@pytest.mark.skipif(
    not os.path.exists("/root/reference/data/input/daat12221.pdf"),
    reason="reference fixtures absent",
)
def test_reference_fixture_embedded_images_decode():
    # daat12221.pdf is a scanned document: 2 DCTDecode XObjects carry
    # the content (its text layer is 3 chars) — the parser must surface
    # the actual scans (reference behavior: rasterize + extract pixels,
    # scripts/ExtractX_OCR.py:263-265)
    from ocr_spark.kernels.pdf import extract_images

    raw = open("/root/reference/data/input/daat12221.pdf", "rb").read()
    imgs = extract_images(raw)
    assert len(imgs) == 2
    for page, _name, arr in imgs:
        assert page == 1
        assert arr.shape == (1620, 2305, 3)
    raw2 = open("/root/reference/data/input/grid data.pdf", "rb").read()
    imgs2 = extract_images(raw2)
    assert len(imgs2) == 1 and imgs2[0][2].shape == (2200, 1700, 3)


# ---------------------------------------------------------------------------
# encrypted PDFs (round-4: standard security handler, empty password)
# ---------------------------------------------------------------------------


def test_encrypted_rc4_roundtrip():
    from ocr_spark.kernels.pdf import build_pdf_encrypted

    pages = ["rc4 page one\nsecond line", "unicode — ü 中文", "", "last"]
    data = build_pdf_encrypted(pages, aes=False)
    assert b"rc4 page" not in data  # content streams are ciphertext
    assert extract_pages(data) == pages
    assert page_count(data) == len(pages)


def test_encrypted_aesv2_roundtrip():
    from ocr_spark.kernels.pdf import build_pdf_encrypted

    pages = ["aes page (with parens) and \\ escape", "two"]
    data = build_pdf_encrypted(pages, aes=True)
    assert b"aes page" not in data
    assert b"AESV2" in data
    assert extract_pages(data) == pages


def test_encrypted_matches_plaintext_twin():
    # the VERDICT's done-criterion: an encrypted empty-password PDF
    # extracts identically to its unencrypted twin
    from ocr_spark.kernels.pdf import build_pdf_encrypted

    pages = ["twin check alpha", "twin check beta\ngamma"]
    plain = extract_pages(build_pdf(pages))
    assert extract_pages(build_pdf_encrypted(pages, aes=False)) == plain
    assert extract_pages(build_pdf_encrypted(pages, aes=True)) == plain


def test_encrypted_tampered_key_material_fails_or_garbles():
    # flipping /O changes the derived file key: FlateDecode of the
    # mis-decrypted stream must fail loudly (zlib error), never return
    # silently wrong text
    from ocr_spark.kernels.pdf import build_pdf_encrypted

    data = build_pdf_encrypted(["tamper me"], aes=False)
    i = data.index(b"/O <") + 4
    tampered = data[:i] + (b"00" if data[i:i+2] != b"00" else b"11") + data[i+2:]
    with pytest.raises(Exception):
        extract_pages(tampered)
