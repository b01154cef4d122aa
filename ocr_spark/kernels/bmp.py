"""Minimal BMP (Windows DIB) codec: BITMAPFILEHEADER + BITMAPINFOHEADER,
uncompressed BI_RGB only, 8-bit palette and 24-bit BGR variants,
bottom-up (default) or top-down row order, 4-byte row padding.

Implemented from the public Windows BMP layout (the 14-byte file header
and 40-byte info header fields are fixed little-endian structs).
Reference parity: the reference pipeline accepts any PIL-openable page
image (/root/reference/scripts/ExtractX_OCR.py:302) and BMP is in PIL's
default plugin set; this kernel gives the Spark pipeline the same
front door without PIL.

Out of scope (explicit rejection guards, not stubs): RLE4/RLE8 and
BITFIELDS compression, 1/2/4/16/32-bit depths, pre-BITMAPINFOHEADER
(OS/2) DIB headers.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


class BmpError(ValueError):
    """Malformed or unsupported BMP container."""


@dataclass
class BmpImage:
    width: int
    height: int
    bpp: int
    top_down: bool
    palette: "np.ndarray | None"  # (n, 3) RGB for 8-bit, None for 24-bit
    pixels: np.ndarray  # (h, w) indices for 8-bit, (h, w, 3) RGB for 24


def encode_bmp(
    pixels: np.ndarray,
    palette: "np.ndarray | None" = None,
    top_down: bool = False,
) -> bytes:
    """Serialize an image to BMP bytes.

    ``palette`` given → 8-bit indexed: ``pixels`` is (h, w) uint8 of
    palette indices, ``palette`` is (n, 3) RGB (stored as BGRA quads).
    ``palette`` None → 24-bit: ``pixels`` is (h, w, 3) RGB (stored as
    BGR rows).  ``top_down`` stores rows in logical order via a
    negative height, the standard DIB convention."""
    px = np.asarray(pixels, dtype=np.uint8)
    if palette is not None:
        if px.ndim != 2:
            raise BmpError("indexed BMP needs (h, w) index pixels")
        h, w = px.shape
        bpp = 8
        pal = np.asarray(palette, dtype=np.uint8)
        if pal.ndim != 2 or pal.shape[1] != 3 or not 1 <= len(pal) <= 256:
            raise BmpError("palette must be (1..256, 3) RGB")
        if int(px.max(initial=0)) >= len(pal):
            raise BmpError("pixel index outside palette")
        pal_bytes = b"".join(
            bytes((int(b), int(g), int(r), 0)) for r, g, b in pal
        )
        n_pal = len(pal)
        row_len = w
    else:
        if px.ndim != 3 or px.shape[2] != 3:
            raise BmpError("truecolor BMP needs (h, w, 3) RGB pixels")
        h, w = px.shape[:2]
        bpp = 24
        pal_bytes = b""
        n_pal = 0
        row_len = w * 3
    pad = (-row_len) % 4
    order = range(h) if top_down else range(h - 1, -1, -1)
    rows = []
    for y in order:
        raw = px[y, :, ::-1] if bpp == 24 else px[y]
        rows.append(raw.tobytes() + b"\x00" * pad)
    data = b"".join(rows)
    offset = 14 + 40 + len(pal_bytes)
    bih = struct.pack(
        "<IiiHHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,  # BI_RGB
        len(data),
        2835,
        2835,
        n_pal,
        0,
    )
    bfh = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    return bfh + bih + pal_bytes + data


def decode_bmp(data: bytes) -> BmpImage:
    """Parse BMP bytes; pixels come back in LOGICAL top-down row order
    regardless of the stored direction (that is the part a broken
    bottom-up walk gets wrong — rw_sum-style checks catch it)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP (missing BM magic)")
    (offset,) = struct.unpack_from("<I", data, 10)
    hsz, w, h, planes, bpp, comp, _simg, _xp, _yp, clrused, _cli = (
        struct.unpack_from("<IiiHHIIiiII", data, 14)
    )
    if hsz < 40:
        raise BmpError("pre-BITMAPINFOHEADER (OS/2) DIB unsupported")
    if planes != 1:
        raise BmpError(f"planes={planes}")
    if comp != 0:
        raise NotImplementedError(
            "compressed BMP (RLE/BITFIELDS) — BI_RGB only"
        )
    if bpp not in (8, 24):
        raise NotImplementedError(f"{bpp}-bit BMP (8/24 only)")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0 or w > 1 << 20 or h > 1 << 20:
        raise BmpError("bad dimensions")
    palette = None
    if bpp == 8:
        n_pal = clrused or 256
        pal_off = 14 + hsz
        if pal_off + n_pal * 4 > len(data):
            raise BmpError("truncated palette")
        quads = np.frombuffer(data, np.uint8, n_pal * 4, pal_off).reshape(
            -1, 4
        )
        palette = quads[:, [2, 1, 0]].copy()  # BGRA → RGB
        row_len = w
    else:
        row_len = w * 3
    stride = row_len + ((-row_len) % 4)
    if offset + stride * h > len(data):
        raise BmpError("truncated pixel data")
    out = (
        np.zeros((h, w, 3), np.uint8)
        if bpp == 24
        else np.zeros((h, w), np.uint8)
    )
    for i in range(h):
        y = i if top_down else h - 1 - i
        row = np.frombuffer(data, np.uint8, row_len, offset + i * stride)
        out[y] = row.reshape(w, 3)[:, ::-1] if bpp == 24 else row
    return BmpImage(
        width=w,
        height=h,
        bpp=bpp,
        top_down=top_down,
        palette=palette,
        pixels=out,
    )
