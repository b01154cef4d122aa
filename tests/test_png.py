"""Real PNG/netpbm codec tests: round-trips across channel counts and
scanline filters, hand-built Average/Paeth streams, CRC validation, and
the decode path wired through the multimodal Spark operators."""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

from ocr_spark.kernels.png import (
    PNG_SIG,
    _chunk,
    decode_netpbm,
    decode_png,
    encode_netpbm,
    encode_png,
)
from ocr_spark.operators import multimodal


def _img(h, w, c, seed=0):
    """Deterministic md5-derived pixels."""
    n = h * w * c
    buf = b"".join(
        hashlib.md5(f"{seed}:{i}".encode()).digest() for i in range((n + 15) // 16)
    )
    return np.frombuffer(buf[:n], dtype=np.uint8).reshape(h, w, c).copy()


@pytest.mark.parametrize("c", [1, 2, 3, 4])
@pytest.mark.parametrize("filt", [0, 1, 2])
def test_png_roundtrip_channels_and_filters(c, filt):
    img = _img(7, 5, c, seed=c * 10 + filt)
    out = decode_png(encode_png(img, filter_type=filt))
    assert out.shape == (7, 5, c)
    assert np.array_equal(out, img)


def test_png_average_and_paeth_filters_decode():
    # build the filtered stream by applying the PNG spec forward
    img = _img(4, 3, 3, seed=99)
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        ftype = 3 if y % 2 == 0 else 4  # alternate Average / Paeth
        filt = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            left = int(row[x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            pred = (left + up) >> 1 if ftype == 3 else paeth(left, up, ul)
            filt[x] = (int(row[x]) - pred) & 0xFF
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)


def test_png_crc_corruption_detected():
    data = bytearray(encode_png(_img(3, 3, 1)))
    data[-10] ^= 0xFF  # flip a byte inside the IEND/IDAT tail
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_netpbm_roundtrip_and_comments():
    img = _img(5, 4, 3, seed=7)
    assert np.array_equal(decode_netpbm(encode_netpbm(img)), img)
    gray = _img(2, 6, 1, seed=8)
    assert np.array_equal(decode_netpbm(encode_netpbm(gray)), gray)
    # header comments are legal netpbm
    with_comment = b"P5\n# a comment\n6 2\n255\n" + gray.tobytes()
    assert np.array_equal(decode_netpbm(with_comment), gray)


def test_decode_image_autodetects_real_formats():
    img = _img(6, 4, 3, seed=3)
    assert np.array_equal(multimodal.decode_image(encode_png(img)), img)
    assert np.array_equal(multimodal.decode_image(encode_netpbm(img)), img)
    # baseline JPEG now decodes for real (lossy — bounded error)
    from ocr_spark.kernels.jpeg import encode_jpeg

    dec = multimodal.decode_image(encode_jpeg(img, quality=95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 16
    # truncated/garbage JPEG bytes still error out (no SOF)
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_parse_header_reports_png_dimensions():
    img = _img(9, 11, 4, seed=5)
    fmt, w, h, c, ok = multimodal.parse_header(encode_png(img))
    assert (fmt, w, h, c, ok) == ("PNG", 11, 9, 4, True)
    fmt, w, h, c, ok = multimodal.parse_header(encode_netpbm(_img(2, 3, 1)))
    assert (fmt, w, h, c, ok) == ("P5", 3, 2, 1, True)


def test_image_features_run_on_real_png_payloads(spark):
    # the Spark operator path decodes REAL PNGs, not just the fixture
    imgs = {i: _img(10 + i, 8, 1, seed=i) for i in range(3)}
    pdf = pd.DataFrame(
        {
            "vec_id": list(imgs),
            "payload": [encode_png(v) for v in imgs.values()],
        }
    )
    out = (
        multimodal.image_features(spark.createDataFrame(pdf), target=(4, 4))
        .toPandas()
        .set_index("vec_id")
    )
    for i, img in imgs.items():
        ys = np.linspace(0, img.shape[0] - 1, 4).astype(int)
        xs = np.linspace(0, img.shape[1] - 1, 4).astype(int)
        assert out.loc[i, "mean_px"] == float(img[ys][:, xs].mean())
    meta = multimodal.extract_metadata(spark.createDataFrame(pdf)).toPandas()
    assert (meta["fmt"] == "PNG").all() and meta["valid"].all()


def test_rotate_image_payload_geometry_and_noop():
    img = _img(3, 5, 1, seed=12)
    p = encode_png(img)
    assert multimodal.rotate_image_payload(p, 0) is p  # byte-identical no-op
    r90 = multimodal.decode_image(multimodal.rotate_image_payload(p, 90))
    assert r90.shape == (5, 3, 1)
    assert np.array_equal(r90, np.rot90(img, k=-1))
    # 90 twice == 180; 4x90 == identity
    r180 = multimodal.decode_image(
        multimodal.rotate_image_payload(multimodal.rotate_image_payload(p, 90), 90)
    )
    assert np.array_equal(r180, np.rot90(img, k=2))
    r360 = multimodal.rotate_image_payload(
        multimodal.rotate_image_payload(p, 180), 180
    )
    assert np.array_equal(multimodal.decode_image(r360), img)


def test_reference_front_door_end_to_end_on_real_pngs(spark, tmp_path):
    # the full reference image path, Spark-first: directory listing →
    # extension routing → REAL PNG decode → rotation → features
    from pyspark.sql import functions as F

    from ocr_spark.sources import listed_payloads

    imgs = {f"img{i}.png": _img(6 + i, 4, 1, seed=i) for i in range(3)}
    for name, img in imgs.items():
        (tmp_path / name).write_bytes(encode_png(img))
    (tmp_path / "skip.txt").write_bytes(b"not an image")

    files = listed_payloads(spark, str(tmp_path))
    assert files.count() == 3  # .txt routed out
    payloads = files.select(
        F.monotonically_increasing_id().alias("vec_id"),
        F.col("content").alias("payload"),
        F.element_at(F.split("path", "/"), -1).alias("name"),
    )
    rotated = multimodal.rotate_images(payloads, 90)
    feats = multimodal.image_features(rotated, target=(2, 2)).toPandas()
    assert len(feats) == 3 and feats["resized_h"].eq(2).all()
    # spot-check one image's feature value against pure numpy
    name_of = {r["vec_id"]: r["name"] for r in payloads.collect()}
    expected = {}
    for vid, nm in name_of.items():
        img = np.rot90(imgs[nm], k=-1)
        ys = np.linspace(0, img.shape[0] - 1, 2).astype(int)
        xs = np.linspace(0, img.shape[1] - 1, 2).astype(int)
        expected[vid] = float(img[ys][:, xs].mean())
    got = feats.set_index("vec_id")["mean_px"].to_dict()
    assert got == expected


# ---------------------------------------------------------------------------
# round 3: palette, tRNS, 16-bit, sub-byte depths
# ---------------------------------------------------------------------------


def _png_from_scanlines(w, h, depth, ctype, scanlines, extra_chunks=()):
    """Assemble a PNG with filter-0 scanlines and optional PLTE/tRNS."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + ln for ln in scanlines)
    body = b"".join(_chunk(t, p) for t, p in extra_chunks)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + body
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def test_png_palette_8bit_decodes_to_rgb():
    palette = bytes(range(12))  # 4 entries RGB
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
    data = _png_from_scanlines(
        4, 2, 8, 3, [r.tobytes() for r in idx], [(b"PLTE", palette)]
    )
    out = decode_png(data)
    assert out.shape == (2, 4, 3)
    plte = np.frombuffer(palette, dtype=np.uint8).reshape(4, 3)
    assert np.array_equal(out, plte[idx])


def test_png_palette_trns_adds_alpha():
    palette = bytes([255, 0, 0, 0, 255, 0])  # red, green
    idx = np.array([[0, 1, 0]], dtype=np.uint8)
    data = _png_from_scanlines(
        3, 1, 8, 3,
        [idx[0].tobytes()],
        [(b"PLTE", palette), (b"tRNS", bytes([10]))],  # entry 0 alpha=10
    )
    out = decode_png(data)
    assert out.shape == (1, 3, 4)
    assert out[0, 0].tolist() == [255, 0, 0, 10]
    assert out[0, 1].tolist() == [0, 255, 0, 255]  # beyond tRNS → opaque


def test_png_palette_4bit_unpacks_indices():
    palette = bytes(range(48))  # 16 entries
    # width 5 at 4 bits → 3 bytes per row (last nibble padding)
    rows = [bytes([0x01, 0x23, 0x40]), bytes([0xFE, 0xDC, 0xB0])]
    data = _png_from_scanlines(5, 2, 4, 3, rows, [(b"PLTE", palette)])
    out = decode_png(data)
    plte = np.frombuffer(palette, dtype=np.uint8).reshape(16, 3)
    want_idx = np.array([[0, 1, 2, 3, 4], [15, 14, 13, 12, 11]])
    assert np.array_equal(out, plte[want_idx])


def test_png_gray_1bit_scales_to_full_range():
    # width 10 → 2 bytes per row; bit pattern 1010101010 / 0101010101
    rows = [bytes([0b10101010, 0b10000000]), bytes([0b01010101, 0b01000000])]
    data = _png_from_scanlines(10, 2, 1, 0, rows)
    out = decode_png(data)
    assert out.shape == (2, 10, 1)
    assert out[0, :, 0].tolist() == [255, 0] * 5
    assert out[1, :, 0].tolist() == [0, 255] * 5


def test_png_16bit_downshifts_to_high_byte():
    # 2x2 gray16, big-endian samples
    vals = np.array([[0x0102, 0xFFFE], [0x8000, 0x00FF]], dtype=">u2")
    rows = [vals[0].tobytes(), vals[1].tobytes()]
    data = _png_from_scanlines(2, 2, 16, 0, rows)
    out = decode_png(data)
    assert out[:, :, 0].tolist() == [[0x01, 0xFF], [0x80, 0x00]]


def test_png_16bit_rgb_sub_filter():
    # depth 16 RGB with the Sub filter: bpp must be 6 bytes, not 3
    img = (_img(3, 4, 3, seed=5).astype(np.uint16) << 8) | 0x7F
    h, w, _ = img.shape
    flat = img.astype(">u2").tobytes()
    stride = w * 6
    raws = []
    for y in range(h):
        row = np.frombuffer(flat[y * stride : (y + 1) * stride], dtype=np.uint8).astype(int)
        filt = row.copy()
        filt[6:] = (row[6:] - row[:-6]) % 256
        raws.append(b"\x01" + bytes(filt.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0)
    data = (
        PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(data)
    assert np.array_equal(out, (img >> 8).astype(np.uint8))


def test_png_read_ihdr_reports_palette_and_16bit():
    from ocr_spark.kernels.png import read_ihdr

    pal = _png_from_scanlines(3, 1, 8, 3, [b"\x00\x01\x02"], [(b"PLTE", bytes(9))])
    assert read_ihdr(pal) == (3, 1, 3)
    g16 = _png_from_scanlines(2, 2, 16, 0, [b"\x00" * 4, b"\x00" * 4])
    assert read_ihdr(g16) == (2, 2, 1)


def _adam7_encode(img):
    """Reference Adam7 writer (filter 0 per scanline) for decode tests."""
    h, w, c = img.shape
    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 1)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("shape", [(2, 2, 1), (13, 11, 3), (8, 8, 4), (1, 17, 1)])
def test_png_adam7_interlaced_decodes(shape):
    img = _img(*shape, seed=sum(shape))
    out = decode_png(_adam7_encode(img))
    assert np.array_equal(out, img)
