"""Pure stdlib+NumPy PNG and netpbm codecs — a REAL media decode path.

The reference's front door is image files (scripts/ExtractX_OCR.py:290:
PNG/JPEG pages fed to the vision model). This sandbox has no PIL/cv2,
but PNG's only hard dependency is zlib — which is stdlib — so the decode
seam gets a real implementation instead of a stub: 8-bit non-interlaced
PNG (gray / gray+alpha / RGB / RGBA, all five scanline filters) and
binary netpbm (P5/P6). JPEG stays behind NotImplementedError (entropy
coding + DCT is a codec project, not a seam).

Scale note: decode runs inside the Arrow-batched multimodal operators
(mapInPandas), one image per element — the format parsing is sequential
per image by nature; the parallelism axis is images, not pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → channel count (8-bit depth only; type 3 = palette
#: unsupported).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8. Supports bit depth 8, color types
    0/2/4/6, interlace 0; validates chunk CRCs."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 12 <= len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(data[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(typ + chunk) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, interlace={interlace})"
        )
    if ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} (palette?) unsupported")
    c = _CHANNELS[ctype]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline stream length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        )
        if ftype == 0:  # None
            rec = line.astype(np.int32)
        elif ftype == 1:  # Sub: per-channel cumulative sum, wrapping mod 256
            rec = (
                np.cumsum(line.reshape(w, c), axis=0, dtype=np.uint8)
                .reshape(-1)
                .astype(np.int32)
            )
        elif ftype == 2:  # Up
            rec = (line.astype(np.int32) + prev) & 0xFF
        elif ftype == 3:  # Average — left-dependent, sequential per byte
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - c] if x >= c else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — left-dependent, sequential per byte
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(rec[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                rec[x] = (int(line[x]) + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w, c)


def read_ihdr(data: bytes) -> tuple[int, int, int]:
    """Constant-time PNG header read: (width, height, channels) from the
    IHDR chunk (fixed position right after the signature), CRC-checked —
    no IDAT decompression, no filter reconstruction. For metadata scans
    over large corpora this is the difference between a header peek and a
    full decode per image."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR" or int.from_bytes(data[8:12], "big") != 13:
        raise ValueError("PNG missing leading IHDR")
    chunk = data[16:29]
    crc = int.from_bytes(data[29:33], "big")
    if zlib.crc32(b"IHDR" + chunk) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
    if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
        raise NotImplementedError(f"PNG variant unsupported (depth={depth})")
    return w, h, _CHANNELS[ctype]


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(4, "big")
        + typ
        + payload
        + (zlib.crc32(typ + payload) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w[, c]) uint8 → PNG bytes. ``filter_type`` ∈ {0 None, 1 Sub,
    2 Up} applied to every scanline (enough for round-trip tests and real
    consumers; decoders must accept any per-row filter)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in _COLOR_TYPE:
        raise ValueError(f"{c}-channel images unsupported")
    flat = a.reshape(h, w * c).astype(np.int32)
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.concatenate([np.zeros(c, dtype=np.int32), row[:-c]])
            filt = (row - left) & 0xFF
        elif filter_type == 2:  # Up
            filt = (row - prev) & 0xFF
        else:
            raise ValueError(f"encoder filter {filter_type} unsupported")
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[c], 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _chunk(b"IEND", b"")
    )


def decode_netpbm(data: bytes) -> np.ndarray:
    """Binary netpbm (P5 gray / P6 RGB, maxval ≤ 255) → (h, w, c) uint8."""
    if data[:2] not in (b"P5", b"P6"):
        raise ValueError("not binary netpbm")
    c = 1 if data[:2] == b"P5" else 3
    # header: magic, width, height, maxval — whitespace-separated with
    # '#' comments; pixel data starts after the single whitespace byte
    # following maxval
    tokens: list[bytes] = []
    pos = 2
    while len(tokens) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        tokens.append(data[start:pos])
    pos += 1  # the single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise NotImplementedError("16-bit netpbm unsupported")
    body = data[pos : pos + w * h * c]
    if len(body) != w * h * c:
        raise ValueError("netpbm body length mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c).copy()


def encode_netpbm(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3):
        raise ValueError("netpbm is gray (P5) or RGB (P6)")
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()
