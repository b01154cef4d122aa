"""Baseline TIFF 6.0 reader/writer — pure stdlib+numpy.

Implements the public TIFF 6.0 specification (Adobe, 1992): both byte
orders (II little-endian / MM big-endian), the IFD tag walk, strip
layout (StripOffsets / StripByteCounts / RowsPerStrip), and three
compressions:

- 1     = none (baseline)
- 4     = CCITT Group 4 (ITU-T T.6) — decoded by kernels/ccitt.py, the
          office-scanner bilevel path this repo already ships for PDFs
- 32773 = PackBits (the Apple RLE baseline TIFF requires)

Grayscale (8-bit, PhotometricInterpretation 1) and bilevel (1-bit,
Photometric 0 = WhiteIsZero, the fax convention G4 uses) images only —
exactly the scanned-page classes the reference pipeline ingests.  The
writer exists to build deterministic fixtures so the reader is pinned
by round-trip tests (same policy as kernels/png.py / gif.py).

Reference parity: scripts/ExtractX_OCR.py feeds scans to PIL, which
opens .tif office scans; this kernel feeds the same mapInPandas scan
operators instead.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from ocr_spark.kernels.ccitt import decode_g4, encode_g4


class TiffError(ValueError):
    pass


# ------------------------------------------------------------ PackBits


def packbits_encode(data: bytes) -> bytes:
    """TIFF PackBits (Apple RLE): runs of >=3 identical bytes become
    (257-n, byte); literal spans are emitted with a (n-1) header."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and i - lit_start < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out.append(i - lit_start - 1)
        out.extend(data[lit_start:i])
    return bytes(out)


def packbits_decode(data: bytes, n_expected: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_expected:
        if i >= len(data):
            raise TiffError("PackBits stream truncated")
        h = data[i]
        i += 1
        if h < 128:
            if i + h + 1 > len(data):
                raise TiffError("PackBits literal overruns stream")
            out.extend(data[i : i + h + 1])
            i += h + 1
        elif h > 128:
            if i >= len(data):
                raise TiffError("PackBits run overruns stream")
            out.extend(bytes([data[i]]) * (257 - h))
            i += 1
        # h == 128: no-op per spec
    return bytes(out[:n_expected])


# ------------------------------------------------------------- reader

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BPS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


@dataclass
class TiffImage:
    width: int
    height: int
    bits_per_sample: int
    compression: int
    photometric: int
    pixels: np.ndarray  # (h, w) uint8; bilevel -> {0,1} with 1=black


def _read_values(
    data: bytes, endian: str, typ: int, count: int, value_field: bytes
) -> list[int]:
    size = _TYPE_SIZE.get(typ)
    if size is None:
        raise TiffError(f"unsupported tag type {typ}")
    total = size * count
    raw = (
        value_field[:total]
        if total <= 4
        else data[struct.unpack(endian + "I", value_field)[0] :][:total]
    )
    if len(raw) < total:
        raise TiffError("tag values overrun file")
    if typ == 3:
        return list(struct.unpack(endian + "H" * count, raw))
    if typ == 4:
        return list(struct.unpack(endian + "I" * count, raw))
    if typ == 1:
        return list(raw)
    if typ == 5:  # rational: return numerator//denominator
        vals = struct.unpack(endian + "II" * count, raw)
        return [
            vals[2 * i] // max(1, vals[2 * i + 1]) for i in range(count)
        ]
    raise TiffError(f"unsupported tag type {typ}")


def read_tiff(data: bytes) -> TiffImage:
    if len(data) < 8:
        raise TiffError("file too short for TIFF header")
    if data[:2] == b"II":
        endian = "<"
    elif data[:2] == b"MM":
        endian = ">"
    else:
        raise TiffError("not a TIFF stream (bad byte-order mark)")
    magic, ifd_off = struct.unpack_from(endian + "HI", data, 2)
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic}")
    if ifd_off + 2 > len(data):
        raise TiffError("IFD offset beyond file")
    (n_tags,) = struct.unpack_from(endian + "H", data, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_tags):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(data):
            raise TiffError("IFD entry overruns file")
        tag, typ, count = struct.unpack_from(endian + "HHI", data, off)
        tags[tag] = _read_values(
            data, endian, typ, count, data[off + 8 : off + 12]
        )

    def one(tag: int, default: int | None = None) -> int:
        if tag in tags:
            return tags[tag][0]
        if default is None:
            raise TiffError(f"required tag {tag} missing")
        return default

    w = one(_TAG_WIDTH)
    h = one(_TAG_HEIGHT)
    bps = one(_TAG_BPS, 1)
    comp = one(_TAG_COMPRESSION, 1)
    photo = one(_TAG_PHOTOMETRIC)
    if bps not in (1, 8):
        raise TiffError(f"unsupported BitsPerSample {bps}")
    offsets = tags.get(_TAG_STRIP_OFFSETS)
    counts = tags.get(_TAG_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffError("strip tables missing or inconsistent")
    rps = one(_TAG_ROWS_PER_STRIP, h)

    rows: list[np.ndarray] = []
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = data[so : so + sc]
        if len(strip) < sc:
            raise TiffError("strip overruns file")
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            raise TiffError("strip table exceeds image height")
        if comp == 4:
            if bps != 1:
                raise TiffError("G4 requires bilevel data")
            rows.append(decode_g4(strip, w, n_rows))
            continue
        row_bytes = (w * bps + 7) // 8
        raw = (
            strip
            if comp == 1
            else packbits_decode(strip, row_bytes * n_rows)
        )
        if len(raw) < row_bytes * n_rows:
            raise TiffError("strip shorter than declared rows")
        arr = np.frombuffer(
            raw[: row_bytes * n_rows], dtype=np.uint8
        ).reshape(n_rows, row_bytes)
        if bps == 1:
            bits = np.unpackbits(arr, axis=1)[:, :w]
            # photometric 0 (WhiteIsZero): stored 1 = black already;
            # photometric 1: invert so 1 = black, the fax convention
            rows.append(bits if photo == 0 else 1 - bits)
        else:
            rows.append(arr[:, :w])
    px = np.concatenate(rows, axis=0)
    if px.shape != (h, w):
        raise TiffError(f"assembled {px.shape}, declared {(h, w)}")
    return TiffImage(
        width=w,
        height=h,
        bits_per_sample=bps,
        compression=comp,
        photometric=photo,
        pixels=px,
    )


# ------------------------------------------------------------- writer


def _entry(endian: str, tag: int, typ: int, count: int, value: int) -> bytes:
    if typ == 3:
        vf = struct.pack(endian + "HH", value, 0)
    else:
        vf = struct.pack(endian + "I", value)
    return struct.pack(endian + "HHI", tag, typ, count) + vf


def write_tiff(
    pixels: np.ndarray,
    compression: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
) -> bytes:
    """Deterministic single-IFD TIFF writer for fixtures.  8-bit input
    writes grayscale (photometric 1); {0,1} bilevel input with
    compression 4 writes a G4 fax image (photometric 0, 1 = black).
    Strips honor ``rows_per_strip`` (default: whole image)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    bilevel = compression == 4
    bps = 1 if bilevel else 8
    rps = rows_per_strip or h
    endian = ">" if big_endian else "<"

    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        chunk = px[y0 : y0 + rps]
        if bilevel:
            strips.append(encode_g4(chunk))
        elif compression == 32773:
            strips.append(packbits_encode(chunk.tobytes()))
        elif compression == 1:
            strips.append(chunk.tobytes())
        else:
            raise TiffError(f"unsupported writer compression {compression}")

    n_strips = len(strips)
    header = struct.pack(endian + "2sHI", b"II" if not big_endian else b"MM", 42, 8)
    n_tags = 8
    ifd_size = 2 + 12 * n_tags + 4
    aux_off = 8 + ifd_size  # strip tables (when n_strips > 1)
    aux = b""
    if n_strips > 1:
        offsets_off = aux_off
        counts_off = aux_off + 4 * n_strips
        data_off = counts_off + 4 * n_strips
    else:
        data_off = aux_off

    offs: list[int] = []
    pos = data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)
    if n_strips > 1:
        aux = struct.pack(endian + "I" * n_strips, *offs) + struct.pack(
            endian + "I" * n_strips, *[len(s) for s in strips]
        )

    entries = [
        _entry(endian, _TAG_WIDTH, 4, 1, w),
        _entry(endian, _TAG_HEIGHT, 4, 1, h),
        _entry(endian, _TAG_BPS, 3, 1, bps),
        _entry(endian, _TAG_COMPRESSION, 3, 1, compression),
        _entry(endian, _TAG_PHOTOMETRIC, 3, 1, 0 if bilevel else 1),
        (
            _entry(endian, _TAG_STRIP_OFFSETS, 4, n_strips, offsets_off)
            if n_strips > 1
            else _entry(endian, _TAG_STRIP_OFFSETS, 4, 1, offs[0])
        ),
        _entry(endian, _TAG_ROWS_PER_STRIP, 4, 1, rps),
        (
            _entry(endian, _TAG_STRIP_COUNTS, 4, n_strips, counts_off)
            if n_strips > 1
            else _entry(endian, _TAG_STRIP_COUNTS, 4, 1, len(strips[0]))
        ),
    ]
    ifd = struct.pack(endian + "H", n_tags) + b"".join(entries) + b"\x00" * 4
    return header + ifd + aux + b"".join(strips)
