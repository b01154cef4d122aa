"""Pure stdlib+NumPy PNG and netpbm codecs — a REAL media decode path.

The reference's front door is image files (scripts/ExtractX_OCR.py:290:
PNG/JPEG pages fed to the vision model). This sandbox has no PIL/cv2,
but PNG's only hard dependency is zlib — which is stdlib — so the decode
seam gets a real implementation instead of a stub: PNG at bit depths
1/2/4/8/16 across all five color types (gray, RGB, palette with tRNS,
gray+alpha, RGBA; all five scanline filters; sequential AND Adam7
interlaced) and binary netpbm (P5/P6). Output is always 8-bit (16-bit
samples downshift, the PIL convention). JPEG lives in kernels/jpeg.py.

Scale note: decode runs inside the Arrow-batched multimodal operators
(mapInPandas), one image per element — the format parsing is sequential
per image by nature; the parallelism axis is images, not pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type → RAW sample count per pixel (palette = 1 index).
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: color type → channel count of the DECODED array (palette → RGB; +1
#: when a tRNS chunk adds alpha).
_OUT_CHANNELS = {0: 1, 2: 3, 3: 3, 4: 2, 6: 4}
#: depths valid per color type (PNG spec §11.2.2).
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters → (h, stride) uint8 of raw
    (still packed) bytes. ``bpp`` is the filter's pixel byte offset
    (ceil(depth/8)·samples, min 1) — filters always operate on BYTES
    regardless of bit depth (PNG spec §9.2)."""
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
        elif ftype == 1:  # Sub: per-byte-lane cumulative sum, mod 256
            rec = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.uint8)
                .reshape(-1)
                .astype(np.int32)
            )
        elif ftype == 2:  # Up
            rec = (line.astype(np.int32) + prev) & 0xFF
        elif ftype == 3:  # Average — left-dependent, sequential per byte
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth — left-dependent, sequential per byte
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                cc = int(prev[x - bpp]) if x >= bpp else 0
                rec[x] = (int(line[x]) + _paeth(a, b, cc)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def _unpack_samples(rows: np.ndarray, w: int, depth: int) -> np.ndarray:
    """(h, stride) packed bytes at sub-byte ``depth`` → (h, w) sample
    values (left-to-right, high bits first — PNG packing order)."""
    bits = np.unpackbits(rows, axis=1)  # (h, stride·8), MSB first
    vals = bits.reshape(rows.shape[0], -1, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    samples = (vals * weights).sum(axis=2)
    return samples[:, :w]


def _rows_to_pixels(rows: np.ndarray, w: int, samples: int, depth: int) -> np.ndarray:
    """Reconstructed scanline bytes → (h, w, samples) uint8 raw sample
    values: 16-bit downshifts to the high byte; sub-byte values stay
    unscaled (palette indices / gray levels — callers scale)."""
    hh = rows.shape[0]
    if depth == 16:
        arr = rows.reshape(hh, -1).view(">u2")
        return (arr >> 8).astype(np.uint8).reshape(hh, w, samples)
    if depth == 8:
        return rows.reshape(hh, w, samples)
    return _unpack_samples(rows, w, depth).astype(np.uint8).reshape(hh, w, 1)


#: Adam7 pass grid: (x0, y0, dx, dy) per pass.
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _deinterlace(
    raw: bytes, w: int, h: int, samples: int, depth: int
) -> np.ndarray:
    """Adam7: seven independently-filtered sub-images concatenated in the
    IDAT stream; each pass unfilters on its own (filter state resets) and
    scatters onto the full-resolution grid."""
    out = np.zeros((h, w, samples), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        if wp <= 0 or hp <= 0:
            continue
        stride = (wp * samples * depth + 7) // 8
        bpp = max(1, (samples * depth) // 8)
        end = pos + hp * (stride + 1)
        rows = _unfilter(raw[pos:end], hp, stride, bpp)
        pos = end
        out[y0::dy, x0::dx] = _rows_to_pixels(rows, wp, samples, depth)
    if pos != len(raw):
        raise ValueError("PNG Adam7 stream length mismatch")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, c) uint8. Supports bit depths 1/2/4/8/16,
    color types 0/2/3/4/6 (palette via PLTE, optional tRNS alpha),
    interlace 0; validates chunk CRCs. 16-bit samples downshift to
    8-bit; sub-byte gray scales to the full 0–255 range."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, plte, trns = 8, None, [], None, None
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
        elif typ == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(chunk, dtype=np.uint8)
        elif typ == b"IDAT":
            idat.append(chunk)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0 or interlace not in (0, 1):
        raise NotImplementedError("PNG compression/filter method unsupported")
    if ctype not in _CHANNELS or depth not in _VALID_DEPTHS.get(ctype, ()):
        raise NotImplementedError(
            f"PNG color type {ctype} at depth {depth} unsupported"
        )
    samples = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    if interlace == 1:
        pixels = _deinterlace(raw, w, h, samples, depth)
    else:
        stride = (w * samples * depth + 7) // 8
        bpp = max(1, (samples * depth) // 8)
        pixels = _rows_to_pixels(_unfilter(raw, h, stride, bpp), w, samples, depth)
    if ctype == 3:  # palette index → RGB(A)
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = pixels[:, :, 0].astype(np.int64)
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]  # (h, w, 3)
        if trns is None:
            return rgb
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: len(trns)] = trns
        return np.concatenate([rgb, alpha[idx][:, :, None]], axis=2)
    if depth < 8:
        # sub-byte grayscale: expand to the full 8-bit range (255/maxval)
        scale = 255 // ((1 << depth) - 1)
        return (pixels.astype(np.uint16) * scale).astype(np.uint8)
    return pixels


def read_ihdr(data: bytes) -> tuple[int, int, int]:
    """Constant-time PNG header read: (width, height, channels) from the
    IHDR chunk (fixed position right after the signature), CRC-checked —
    no IDAT decompression, no filter reconstruction. For metadata scans
    over large corpora this is the difference between a header peek and a
    full decode per image. Palette reports 3 channels (the header alone
    cannot see a tRNS alpha; decode_png returns 4 when one exists)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    if data[12:16] != b"IHDR" or int.from_bytes(data[8:12], "big") != 13:
        raise ValueError("PNG missing leading IHDR")
    chunk = data[16:29]
    crc = int.from_bytes(data[29:33], "big")
    if zlib.crc32(b"IHDR" + chunk) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
    if (
        interlace not in (0, 1)
        or ctype not in _CHANNELS
        or depth not in _VALID_DEPTHS.get(ctype, ())
    ):
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth}, ctype={ctype})"
        )
    return w, h, _OUT_CHANNELS[ctype]


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
