"""CCITT Group 4 (ITU-T T.6) codec tests — kernels/ccitt.py.

No external CCITT reader exists in this container, so correctness rests
on (a) spot codewords pinned from the public T.4/T.6 tables, (b)
prefix-freeness of the code sets the decoder relies on, and (c)
encode→decode round-trips over structured and randomized bitmaps,
including the PDF container path (/CCITTFaxDecode image XObjects).
"""

import numpy as np
import pytest

from ocr_spark.kernels.ccitt import (
    BLACK_CODES,
    EXT_CODES,
    MODE_PASS,
    MODE_V,
    WHITE_CODES,
    decode_g3,
    decode_g4,
    encode_g3,
    encode_g4,
)


def _roundtrip(bm, **kw):
    enc = encode_g4(bm, **kw)
    dec = decode_g4(enc, bm.shape[1], bm.shape[0], **kw)
    assert dec.shape == bm.shape
    assert np.array_equal(dec, (bm > 0).astype(np.uint8))
    return enc


def _roundtrip_g3(bm, k=0, byte_align=False, end_of_line=False):
    enc = encode_g3(bm, k=k, byte_align=byte_align, end_of_line=end_of_line)
    dec = decode_g3(enc, bm.shape[1], bm.shape[0], k=k, byte_align=byte_align)
    assert dec.shape == bm.shape
    assert np.array_equal(dec, (bm > 0).astype(np.uint8))
    return enc


# ---------------------------------------------------------------------------
# code tables
# ---------------------------------------------------------------------------


def test_spot_codewords_from_spec():
    # ITU-T T.4 table 2 (white) / table 3 (black) / table 4 (extended)
    assert WHITE_CODES[0] == "00110101"
    assert WHITE_CODES[1] == "000111"
    assert WHITE_CODES[63] == "00110100"
    assert WHITE_CODES[64] == "11011"
    assert WHITE_CODES[1728] == "010011011"
    assert BLACK_CODES[0] == "0000110111"
    assert BLACK_CODES[1] == "010"
    assert BLACK_CODES[2] == "11"
    assert BLACK_CODES[64] == "0000001111"
    assert BLACK_CODES[1728] == "0000001100101"
    assert EXT_CODES[1792] == "00000001000"
    assert EXT_CODES[2560] == "000000011111"
    # T.6 §2.2.4 mode codes
    assert MODE_V[0] == "1" and MODE_V[1] == "011" and MODE_V[-1] == "010"
    assert MODE_PASS == "0001"


def _assert_prefix_free(codes):
    codes = sorted(codes, key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            assert not b.startswith(a), (a, b)


def test_run_code_sets_prefix_free():
    # the decoder reads codes greedily: each colour's run-code set
    # (terminating + makeup + shared extended makeup) must be prefix-free
    _assert_prefix_free(list(WHITE_CODES.values()) + list(EXT_CODES.values()))
    _assert_prefix_free(list(BLACK_CODES.values()) + list(EXT_CODES.values()))


def test_mode_codes_prefix_free():
    _assert_prefix_free([MODE_PASS, "001"] + list(MODE_V.values()))


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("byte_align", [False, True])
def test_structured_roundtrip(byte_align):
    bm = np.zeros((64, 200), np.uint8)
    bm[10:20, 30:170] = 1  # block exercises vertical + horizontal modes
    bm[40:42, :] = 1  # full-width black rows
    bm[50, 0] = 1  # leading black pixel (change at position 0)
    _roundtrip(bm, byte_align=byte_align)


@pytest.mark.parametrize("byte_align", [False, True])
def test_degenerate_roundtrips(byte_align):
    _roundtrip(np.zeros((5, 17), np.uint8), byte_align=byte_align)
    _roundtrip(np.ones((5, 17), np.uint8), byte_align=byte_align)
    _roundtrip(np.zeros((1, 1), np.uint8), byte_align=byte_align)
    _roundtrip(np.ones((1, 1), np.uint8), byte_align=byte_align)
    _roundtrip(np.eye(40, 40, dtype=np.uint8), byte_align=byte_align)
    _roundtrip((np.indices((20, 33)).sum(0) % 2).astype(np.uint8),
               byte_align=byte_align)


@pytest.mark.parametrize("density", [0.02, 0.3, 0.7, 0.98])
def test_random_roundtrips(density):
    rng = np.random.default_rng(int(density * 100))
    bm = (rng.random((48, 97)) < density).astype(np.uint8)
    _roundtrip(bm)
    _roundtrip(bm, byte_align=True)


def test_long_runs_use_extended_makeups():
    # white and black runs beyond 2560 need chained extended makeups
    bm = np.zeros((3, 6000), np.uint8)
    bm[1, 2900:5800] = 1  # 2900-long black run
    _roundtrip(bm)


def test_overdeclared_rows_come_back_white():
    # PDF /Rows larger than the encoded height: EOFB stops the decode
    # and the declared shape comes back with a white tail
    bm = np.zeros((10, 50), np.uint8)
    bm[3, 10:40] = 1
    for ba in (False, True):
        enc = encode_g4(bm, byte_align=ba)
        dec = decode_g4(enc, 50, 14, byte_align=ba)
        assert dec.shape == (14, 50)
        assert np.array_equal(dec[:10], bm)
        assert not dec[10:].any()


def test_byte_align_changes_the_stream():
    bm = (np.indices((9, 31)).sum(0) % 2).astype(np.uint8)
    assert encode_g4(bm) != encode_g4(bm, byte_align=True)
    # and each is only decodable under its own alignment
    enc = encode_g4(bm, byte_align=True)
    with pytest.raises((ValueError, EOFError)):
        got = decode_g4(enc, 31, 9, byte_align=False)
        if not np.array_equal(got, bm):
            raise ValueError("misaligned decode diverged")


def test_corrupt_stream_raises():
    with pytest.raises((ValueError, EOFError)):
        decode_g4(b"\x00\x00\x00\x00", 100, 4)


# ---------------------------------------------------------------------------
# PDF container path (/CCITTFaxDecode image XObjects)
# ---------------------------------------------------------------------------


def test_pdf_ccitt_image_roundtrip():
    from ocr_spark.kernels.pdf import build_pdf_images, extract_images

    a = np.full((60, 120), 255, np.uint8)
    a[10:24, 15:100] = 0
    a[40, :] = 0
    b = np.full((33, 77), 255, np.uint8)
    b[::3, ::2] = 0
    for ba in (False, True):
        pdf = build_pdf_images([a, b], ccitt=True, byte_align=ba)
        assert b"CCITTFaxDecode" in pdf
        out = extract_images(pdf)
        assert [(p, n) for p, n, _ in out] == [(1, "Im0"), (2, "Im0")]
        for (_, _, arr), src in zip(out, [a, b]):
            assert arr.dtype == np.uint8
            assert np.array_equal(arr, src)


def test_pdf_ccitt_blackis1_and_decode_invert():
    from ocr_spark.kernels.pdf import PdfDoc, build_pdf_images

    bm = np.zeros((8, 20), np.uint8)
    bm[2:5, 3:15] = 1
    enc = encode_g4(bm)
    doc = PdfDoc(build_pdf_images([np.zeros((2, 2), np.uint8)], ccitt=True))
    base = {"Width": 20, "Height": 8}
    parms = {"K": -1, "Columns": 20, "Rows": 8}
    # default: 0 bits = black → black pixels come back 0
    gray = doc._decode_ccitt_image(
        {**base, "DecodeParms": dict(parms)}, enc, ["CCITTFaxDecode"]
    )
    assert np.array_equal(gray == 0, bm.astype(bool))
    # /BlackIs1 true without /Decode: samples invert
    gray1 = doc._decode_ccitt_image(
        {**base, "DecodeParms": {**parms, "BlackIs1": True}},
        enc,
        ["CCITTFaxDecode"],
    )
    assert np.array_equal(gray1, 255 - gray)
    # /BlackIs1 true + /Decode [1 0]: back to black = 0
    gray2 = doc._decode_ccitt_image(
        {
            **base,
            "DecodeParms": {**parms, "BlackIs1": True},
            "Decode": [1, 0],
        },
        enc,
        ["CCITTFaxDecode"],
    )
    assert np.array_equal(gray2, gray)


# ---------------------------------------------------------------------------
# Group 3 (ITU-T T.4, PDF /K >= 0)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k", [0, 1, 2, 4])
@pytest.mark.parametrize("end_of_line", [False, True])
def test_g3_structured_roundtrip(k, end_of_line):
    bm = np.zeros((32, 140), np.uint8)
    bm[4:9, 20:120] = 1
    bm[15:17, :] = 1
    bm[25, 0] = 1  # leading black pixel → zero-length white run
    _roundtrip_g3(bm, k=k, end_of_line=end_of_line)


@pytest.mark.parametrize("k", [0, 4])
@pytest.mark.parametrize("byte_align", [False, True])
def test_g3_degenerate_roundtrips(k, byte_align):
    _roundtrip_g3(np.zeros((5, 17), np.uint8), k=k, byte_align=byte_align)
    _roundtrip_g3(np.ones((5, 17), np.uint8), k=k, byte_align=byte_align)
    _roundtrip_g3(np.ones((1, 1), np.uint8), k=k, byte_align=byte_align)
    _roundtrip_g3(np.eye(40, 40, dtype=np.uint8), k=k, byte_align=byte_align)
    _roundtrip_g3(
        (np.indices((20, 33)).sum(0) % 2).astype(np.uint8),
        k=k,
        byte_align=byte_align,
    )


@pytest.mark.parametrize("density", [0.02, 0.3, 0.7, 0.98])
def test_g3_random_roundtrips(density):
    rng = np.random.default_rng(int(density * 1000))
    bm = (rng.random((48, 97)) < density).astype(np.uint8)
    for k in (0, 4):
        _roundtrip_g3(bm, k=k)
        _roundtrip_g3(bm, k=k, byte_align=True)
        _roundtrip_g3(bm, k=k, end_of_line=True)


def test_g3_long_runs_use_extended_makeups():
    bm = np.zeros((3, 6000), np.uint8)
    bm[1, 2900:5800] = 1
    _roundtrip_g3(bm, k=0)
    _roundtrip_g3(bm, k=2)


def test_g3_k_mixes_1d_and_2d_rows():
    # k=1 → every row 1-D (all tag bits 1); large k → mostly 2-D rows;
    # a 2-D stream of a repetitive image is strictly smaller
    bm = np.tile((np.arange(100) < 50).astype(np.uint8), (24, 1))
    pure_1d = encode_g3(bm, k=1)
    mixed = encode_g3(bm, k=24)
    assert len(mixed) < len(pure_1d)
    for enc, k in ((pure_1d, 1), (mixed, 24)):
        assert np.array_equal(decode_g3(enc, 100, 24, k=k), bm)


def test_g3_overdeclared_rows_come_back_white():
    bm = np.zeros((10, 50), np.uint8)
    bm[3, 10:40] = 1
    for k in (0, 4):
        enc = encode_g3(bm, k=k, end_of_line=True)
        dec = decode_g3(enc, 50, 14, k=k)
        assert dec.shape == (14, 50)
        assert np.array_equal(dec[:10], bm)
        assert not dec[10:].any()


def test_g3_k_sign_contracts():
    with pytest.raises(ValueError):
        encode_g3(np.zeros((2, 2), np.uint8), k=-1)
    with pytest.raises(ValueError):
        decode_g3(b"\x00", 2, 2, k=-1)


def test_pdf_ccitt_group3_roundtrip():
    from ocr_spark.kernels.pdf import build_pdf_images, extract_images

    a = np.full((60, 120), 255, np.uint8)
    a[10:24, 15:100] = 0
    a[40, :] = 0
    b = np.full((33, 77), 255, np.uint8)
    b[::3, ::2] = 0
    for k in (0, 4):
        for ba in (False, True):
            pdf = build_pdf_images(
                [a, b], ccitt=True, ccitt_k=k, byte_align=ba
            )
            assert f"/K {k}".encode() in pdf
            out = extract_images(pdf)
            assert [(p, n) for p, n, _ in out] == [(1, "Im0"), (2, "Im0")]
            for (_, _, arr), src in zip(out, [a, b]):
                assert np.array_equal(arr, src)


def test_g4_without_eofb_returns_partial_plus_white_tail():
    # scanner/TIFF-origin G4 streams commonly omit EOFB: decoding with
    # an over-declared /Rows must keep the decoded rows and leave the
    # remainder white instead of raising EOFError
    import numpy as np

    from ocr_spark.kernels.ccitt import decode_g4, encode_g4

    rng = np.random.default_rng(11)
    bm = (rng.random((6, 40)) < 0.3).astype(np.uint8)
    data = encode_g4(bm)
    # strip the EOFB (24 bits + final-byte pad live in the last 4 bytes)
    out = decode_g4(data[:-4], 40, rows=10)
    assert out.shape == (10, 40)
    # at least the first 5 rows decoded exactly; the tail is white
    assert (out[:5] == bm[:5]).all()
    assert (out[8:] == 0).all()


def test_ccitt_image_defaults_columns_to_width_and_crops_to_dict():
    # a CCITT image whose DecodeParms omit /Columns must decode at the
    # image dict's /Width (the spec default 1728 shreds run boundaries),
    # and the returned array must match (/Height, /Width)
    import numpy as np

    from ocr_spark.kernels.pdf import build_pdf_images, extract_images

    img = np.zeros((8, 20), dtype=np.uint8)
    img[2:6, 4:16] = 255
    data = build_pdf_images([img], ccitt=True)
    # same-length key corruption keeps every xref offset valid while
    # removing the /Columns entry from the parser's point of view
    assert data.count(b"/Columns 20") == 1
    broken = data.replace(b"/Columns 20", b"/Colxmns 20")
    imgs = extract_images(broken)
    assert len(imgs) == 1
    arr = imgs[0][2]
    assert arr.shape == (8, 20)
    assert (arr == img).all()


def test_build_pdf_images_rejects_rgb_with_ccitt():
    import numpy as np
    import pytest

    from ocr_spark.kernels.pdf import build_pdf_images

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="bilevel"):
        build_pdf_images([rgb], ccitt=True)
