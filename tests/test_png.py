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
    with pytest.raises(NotImplementedError):
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
