"""Baseline JPEG codec tests: round-trips (gray/RGB, 4:4:4 and 4:2:0,
restart intervals), header-only dimension parse, progressive rejection,
and the decode path wired through the multimodal Spark operators.

The codec closes the reference's .jpg/.jpeg whitelist gap
(scripts/ExtractX_OCR.py:72,514-527; PIL open at :302)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pytest

from ocr_spark.kernels.jpeg import (
    decode_jpeg,
    encode_jpeg,
    parse_dims,
)
from ocr_spark.operators import multimodal


def _img(h, w, c=None, seed=0):
    n = h * w * (c or 1)
    buf = b"".join(
        hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range((n + 15) // 16)
    )
    a = np.frombuffer(buf[:n], dtype=np.uint8)
    return a.reshape(h, w) if c is None else a.reshape(h, w, c).copy()


def _smooth(h, w, c):
    """JPEG-friendly gradient (no 255→0 wrap: clip, don't mod)."""
    g = np.minimum(np.add.outer(np.arange(h) * 3, np.arange(w) * 2), 255)
    if c == 1:
        return g.astype(np.uint8)[:, :, None]
    return np.stack([np.minimum(g + 30 * k, 255) for k in range(c)], axis=2).astype(
        np.uint8
    )


@pytest.mark.parametrize("shape", [(8, 8, 1), (24, 40, 1), (17, 23, 3), (9, 13, 3)])
def test_jpeg_roundtrip_smooth_images(shape):
    img = _smooth(*shape)
    data = encode_jpeg(img, quality=95)
    assert parse_dims(data) == (shape[1], shape[0], shape[2], False)
    dec = decode_jpeg(data)
    assert dec.shape == shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 8  # smooth content at q95: tiny quantization error


def test_jpeg_roundtrip_noise_bounded_error():
    img = _img(16, 16, 3, seed=7)
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 10  # lossy, but must track the source


def test_jpeg_flat_block_exact():
    img = np.full((8, 8), 200, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=90))[:, :, 0], img)


def test_jpeg_420_subsampling_roundtrip():
    img = _smooth(33, 45, 3)
    data = encode_jpeg(img, quality=90, subsample=True)
    # SOF must declare 2x2 luma sampling
    dec = decode_jpeg(data)
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 8  # chroma is box-averaged; luma stays tight


def test_jpeg_restart_intervals_roundtrip():
    img = _smooth(32, 48, 3)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=3))
    # restart markers change the container, not the pixels
    assert np.array_equal(plain, with_rst)


def test_jpeg_progressive_header_only_raises_cleanly():
    # SOF2 with no scans: dims parse, pixel decode errors (no scan data)
    sof2 = struct.pack(">BHHB", 8, 11, 22, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    seg = bytes([0xFF, 0xC2]) + (len(sof2) + 2).to_bytes(2, "big") + sof2
    data = b"\xff\xd8" + seg + b"\xff\xd9"
    assert parse_dims(data) == (22, 11, 3, True)
    with pytest.raises(ValueError):
        decode_jpeg(data)


@pytest.mark.parametrize(
    "shape,sub",
    [((24, 40, 1), False), ((17, 23, 3), False), ((33, 45, 3), True)],
)
def test_jpeg_progressive_decodes_bit_identical_to_baseline(shape, sub):
    # the progressive encoder transmits the SAME quantized coefficients
    # as the baseline encoder, so the two decodes must agree bit-exactly
    # — this pins all four progressive scan types (DC first/refine,
    # AC first with EOBRUN, AC refine with correction bits)
    from ocr_spark.kernels.jpeg import encode_jpeg_progressive

    img = _img(shape[0], shape[1], shape[2], seed=sum(shape))
    prog = encode_jpeg_progressive(img, quality=90, subsample=sub)
    base = encode_jpeg(img, quality=90, subsample=sub)
    assert parse_dims(prog)[3] is True and parse_dims(base)[3] is False
    assert np.array_equal(decode_jpeg(prog), decode_jpeg(base))


def test_jpeg_garbage_raises():
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        parse_dims(b"\xff\xd8\xff\xd9")  # SOI+EOI, no SOF


def test_parse_header_reports_jpeg_dims():
    from ocr_spark.kernels.jpeg import encode_jpeg_progressive

    img = _smooth(14, 21, 3)
    fmt, w, h, c, ok = multimodal.parse_header(encode_jpeg(img))
    assert (fmt, w, h, c, ok) == ("JPEG", 21, 14, 3, True)
    # progressive payloads are fully decodable too
    fmt, w, h, c, ok = multimodal.parse_header(encode_jpeg_progressive(img))
    assert (fmt, w, h, c, ok) == ("JPEG", 21, 14, 3, True)
    dec = multimodal.decode_image(encode_jpeg_progressive(img, quality=95))
    assert dec.shape == img.shape


def test_rotate_image_payload_handles_jpeg():
    # decode → rot90 → re-encode (PNG, lossless from the decoded pixels)
    img = _smooth(12, 20, 3)
    data = encode_jpeg(img, quality=95)
    rotated = multimodal.rotate_image_payload(data, 90)
    out = multimodal.decode_image(rotated)
    want = np.rot90(decode_jpeg(data), k=-1)
    assert np.array_equal(out, want)


def test_image_features_on_real_jpegs_spark(spark):
    # the multimodal feature operator must produce real (non-NaN)
    # features for JPEG payloads — the r2 gap this codec closes
    payloads = [
        (i, encode_jpeg(_smooth(16 + i, 24 + i, 3), quality=90)) for i in range(4)
    ]
    pdf = pd.DataFrame(
        {"vec_id": [p[0] for p in payloads], "payload": [p[1] for p in payloads]}
    )
    df = spark.createDataFrame(pdf)
    feats = multimodal.image_features(df, target=(4, 4)).toPandas()
    assert (feats["resized_h"] == 4).all()
    assert feats["mean_px"].notna().all()
    for i, data in payloads:
        want = decode_jpeg(data)
        ys = np.linspace(0, want.shape[0] - 1, 4).astype(int)
        xs = np.linspace(0, want.shape[1] - 1, 4).astype(int)
        got = feats.set_index("vec_id").loc[i, "mean_px"]
        assert abs(got - float(want[ys][:, xs].mean())) < 1e-9


def test_grayscale_with_declared_subsampling_decodes():
    # a single-component scan is non-interleaved: MCU = one data unit
    # regardless of the SOF's sampling factors (T.81 A.2.2) — honoring a
    # 2x2 declaration would desync the Huffman stream
    img = _smooth(24, 40, 1)
    data = encode_jpeg(img, quality=95)
    i = data.index(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) ncomp(1) then [id, hv, tq]
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert data[hv_off] == 0x11
    patched = data[:hv_off] + b"\x22" + data[hv_off + 1 :]
    dec = decode_jpeg(patched)
    assert np.array_equal(dec, decode_jpeg(data))


def test_multi_scan_baseline_raises_cleanly():
    # a scan covering fewer components than the SOF declares is the
    # non-interleaved multi-scan layout — must refuse, not KeyError
    img = _smooth(8, 8, 3)
    data = encode_jpeg(img, quality=90)
    i = data.index(b"\xff\xda")
    ln = int.from_bytes(data[i + 2 : i + 4], "big")
    # rewrite SOS to cover only component 1
    new_sos = b"\xff\xda" + (2 + 1 + 2 + 3).to_bytes(2, "big") + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    patched = data[:i] + new_sos + data[i + 2 + ln :]
    with pytest.raises(NotImplementedError):
        decode_jpeg(patched)


# -- 4-component CMYK / YCCK (Adobe APP14, TN #5116) -------------------------


def _cmyk(h, w):
    base = np.add.outer(np.arange(h) * 2, np.arange(w)).astype(np.int64)
    return np.stack(
        [(base + ch * 30) % 200 + 20 for ch in range(4)], axis=2
    ).astype(np.uint8)


@pytest.mark.parametrize("transform", [0, 2])
def test_cmyk_roundtrip_both_transforms(transform):
    img = _cmyk(24, 40)
    data = encode_jpeg(img, quality=95, adobe_transform=transform)
    assert parse_dims(data) == (40, 24, 4, False)
    dec = decode_jpeg(data)
    assert dec.shape == (24, 40, 4)
    # linear-gradient blocks survive q95 nearly exactly; YCCK adds the
    # color transform's rounding
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 4


def test_app14_marker_layout():
    # APP14 'Adobe' + version + 2 flag words + transform byte (TN #5116)
    data = encode_jpeg(_cmyk(8, 8), adobe_transform=2)
    idx = data.find(b"\xff\xee")
    assert idx > 0
    seg_len = int.from_bytes(data[idx + 2 : idx + 4], "big")
    payload = data[idx + 4 : idx + 2 + seg_len]
    assert payload[:5] == b"Adobe" and payload[11] == 2
    data0 = encode_jpeg(_cmyk(8, 8), adobe_transform=0)
    i0 = data0.find(b"\xff\xee")
    assert data0[i0 + 4 : i0 + 9] == b"Adobe"
    assert data0[i0 + 15] == 0


def test_cmyk_without_app14_decodes_as_direct_cmyk():
    # strip the APP14 marker from a transform-0 file: per TN #5116 the
    # decoder must fall back to direct CMYK — identical pixels
    img = _cmyk(16, 16)
    data = encode_jpeg(img, quality=95, adobe_transform=0)
    idx = data.find(b"\xff\xee")
    seg_len = int.from_bytes(data[idx + 2 : idx + 4], "big")
    stripped = data[:idx] + data[idx + 2 + seg_len :]
    assert np.array_equal(decode_jpeg(stripped), decode_jpeg(data))


def test_ycck_transform_actually_changes_stored_planes():
    # same pixels, different stored representation — entropy bytes differ
    img = _cmyk(16, 16)
    a = encode_jpeg(img, quality=95, adobe_transform=0)
    b = encode_jpeg(img, quality=95, adobe_transform=2)
    assert a != b
    assert np.abs(
        decode_jpeg(a).astype(int) - decode_jpeg(b).astype(int)
    ).max() <= 4


def test_parse_dims_reports_four_components():
    w, h, n, prog = parse_dims(encode_jpeg(_cmyk(10, 12)))
    assert (w, h, n, prog) == (12, 10, 4, False)


def test_unsupported_adobe_transform_raises():
    data = bytearray(encode_jpeg(_cmyk(8, 8), adobe_transform=2))
    idx = data.find(b"\xff\xee")
    data[idx + 15] = 7  # bogus transform byte
    with pytest.raises(NotImplementedError, match="transform 7"):
        decode_jpeg(bytes(data))


def test_rgb_direct_adobe_transform_zero():
    # round-5 review finding: a 3-component Adobe transform-0 JPEG
    # stores RGB directly (Photoshop shape) — converting would scramble
    # colors. Encoder writes the marker; decoder skips the transform.
    g = np.minimum(np.add.outer(np.arange(16) * 3, np.arange(24) * 2), 255)
    rgb = np.stack([g, g // 2, 255 - g], axis=2).astype(np.uint8)
    data = encode_jpeg(rgb, quality=95, adobe_transform=0)
    idx = data.find(b"\xff\xee")
    assert idx > 0 and data[idx + 4 : idx + 9] == b"Adobe"
    assert data[idx + 15] == 0
    dec = decode_jpeg(data)
    assert dec.shape == (16, 24, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 4
    # default path unchanged: JFIF YCbCr, no Adobe marker
    assert b"Adobe" not in encode_jpeg(rgb, quality=95)


def test_unsupported_3comp_adobe_transform_raises():
    g = np.full((8, 8), 100, np.uint8)
    rgb = np.stack([g, g, g], axis=2)
    data = bytearray(encode_jpeg(rgb, quality=95, adobe_transform=0))
    idx = data.find(b"\xff\xee")
    data[idx + 15] = 5
    with pytest.raises(NotImplementedError, match="transform 5"):
        decode_jpeg(bytes(data))
