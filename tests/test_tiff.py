"""TIFF 6.0 kernel (ocr_spark.kernels.tiff)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.kernels.tiff import (
    TiffError,
    packbits_decode,
    packbits_encode,
    read_tiff,
    write_tiff,
)


@pytest.mark.parametrize("n", [0, 1, 2, 5, 300, 1000])
def test_packbits_roundtrip(n):
    rng = np.random.RandomState(3)
    b = bytes(rng.randint(0, 4, size=n).astype(np.uint8))
    assert packbits_decode(packbits_encode(b), n) == b


def test_packbits_long_runs_and_literals():
    b = b"\x00" * 400 + bytes(range(130)) + b"\xff" * 3
    enc = packbits_encode(b)
    assert len(enc) < len(b)
    assert packbits_decode(enc, len(b)) == b


GRAY = ((np.add.outer(np.arange(13) * 3, np.arange(21)) + 5) % 251).astype(
    np.uint8
)
BILEVEL = (
    (np.add.outer(np.arange(13) * 3, np.arange(21)) + 5) % 5 == 0
).astype(np.uint8)


@pytest.mark.parametrize("big_endian", [False, True])
@pytest.mark.parametrize("rps", [None, 4])
@pytest.mark.parametrize("comp", [1, 32773, 4])
def test_roundtrip_matrix(big_endian, rps, comp):
    px = BILEVEL if comp == 4 else GRAY
    t = write_tiff(px, compression=comp, rows_per_strip=rps, big_endian=big_endian)
    r = read_tiff(t)
    assert (r.width, r.height, r.compression) == (21, 13, comp)
    assert r.bits_per_sample == (1 if comp == 4 else 8)
    assert (r.pixels == px).all()


def test_byte_orders_differ_on_wire_decode_equal():
    ii = write_tiff(GRAY, big_endian=False)
    mm = write_tiff(GRAY, big_endian=True)
    assert ii[:2] == b"II" and mm[:2] == b"MM" and ii != mm
    assert (read_tiff(ii).pixels == read_tiff(mm).pixels).all()


def test_reject_garbage_truncation_and_bad_magic():
    with pytest.raises(TiffError):
        read_tiff(b"XX\x2a\x00\x08\x00\x00\x00")
    with pytest.raises(TiffError):
        read_tiff(b"II\x2b\x00\x08\x00\x00\x00")  # magic 43 (BigTIFF)
    good = write_tiff(GRAY, compression=32773)
    with pytest.raises(TiffError):
        read_tiff(good[:30])  # cuts inside the IFD


def test_strip_table_consistency_checked():
    good = bytearray(write_tiff(GRAY, rows_per_strip=4))
    # corrupt the final strip's payload length by truncating the file
    with pytest.raises(TiffError):
        read_tiff(bytes(good[:-10]))
