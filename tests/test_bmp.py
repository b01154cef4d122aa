"""BMP codec roundtrips (ocr_spark.kernels.bmp)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.kernels.bmp import BmpError, decode_bmp, encode_bmp


def _pal(n=16):
    return np.array(
        [[i * 16, 255 - i * 16, (i * 37) % 256] for i in range(n)],
        dtype=np.uint8,
    )


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_8bit_roundtrip(top_down):
    rng = np.random.default_rng(7)
    px = rng.integers(0, 16, size=(11, 13), dtype=np.uint8)
    img = decode_bmp(encode_bmp(px, palette=_pal(), top_down=top_down))
    assert (img.width, img.height, img.bpp) == (13, 11, 8)
    assert img.top_down is top_down
    assert np.array_equal(img.pixels, px)
    assert np.array_equal(img.palette, _pal())


@pytest.mark.parametrize("top_down", [False, True])
@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every padding residue
def test_bmp_24bit_roundtrip_padding(top_down, w):
    rng = np.random.default_rng(w)
    px = rng.integers(0, 256, size=(6, w, 3), dtype=np.uint8)
    img = decode_bmp(encode_bmp(px, top_down=top_down))
    assert (img.width, img.height, img.bpp) == (w, 6, 24)
    assert np.array_equal(img.pixels, px)
    assert img.palette is None


def test_bmp_rejects_garbage_and_unsupported():
    px = np.zeros((4, 4, 3), np.uint8)
    good = bytearray(encode_bmp(px))
    with pytest.raises(BmpError):
        decode_bmp(b"PNG" + bytes(good[3:]))
    with pytest.raises(BmpError):
        decode_bmp(bytes(good[:30]))  # truncated header
    bad_comp = bytearray(good)
    bad_comp[30] = 1  # biCompression = BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad_comp))
    bad_bpp = bytearray(good)
    bad_bpp[28] = 16
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(bad_bpp))
    with pytest.raises(BmpError):
        decode_bmp(bytes(good[:-8]))  # truncated pixel rows


def test_bmp_bottom_up_really_flips_rows():
    # two encodings of the same logical image differ on disk but
    # decode identically — the bottom-up walk is being exercised
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    up = encode_bmp(px, palette=_pal())
    down = encode_bmp(px, palette=_pal(), top_down=True)
    assert up != down
    assert np.array_equal(decode_bmp(up).pixels, decode_bmp(down).pixels)
