"""Pure stdlib+NumPy baseline JPEG (JFIF) codec.

Closes the reference's highest-hit media gap: its extension whitelist
accepts .jpg/.jpeg (scripts/ExtractX_OCR.py:72,514-527) and PIL opens
them (scripts/ExtractX_OCR.py:302); this sandbox has no PIL/cv2, so the
codec is implemented from the public ITU-T T.81 spec the same way
kernels/png.py implements RFC 2083:

- decode: baseline sequential DCT (SOF0) AND progressive (SOF2 —
  spectral selection, successive approximation with EOBRUN end-of-band
  codes and refinement correction bits, T.81 G.2), Huffman entropy
  coding, grayscale + YCbCr with any 4:4:4 / 4:2:2 / 4:2:0 sampling
  factors, restart intervals (DRI/RSTn), APPn/COM skip.
- encode: baseline 4:4:4/4:2:0 with the T.81 Annex K quantization and
  Huffman tables (quality-scaled, IJG formula), plus a progressive
  encoder whose scan script exercises all four progressive scan types —
  it transmits the same quantized coefficients as the baseline encoder,
  so progressive and baseline decodes are bit-identical (the fixture
  contract the tests pin).

All DCT math is vectorized over every 8×8 block at once (one einsum per
plane); the only per-element Python is the Huffman bit stream, which is
inherent to the format. At corpus scale the parallel axis is images
(Arrow-batched mapInPandas in operators/multimodal.py), not pixels.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants (ITU-T T.81 Annex K — public spec tables)
# ---------------------------------------------------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: Annex K.1 luminance / K.2 chrominance quantization tables (natural order).
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

#: Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
#: HUFFVAL symbol list).
HT_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HT_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
HT_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: orthonormal 8-point DCT-II matrix: D @ x = DCT(x)
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * _k * (2 * _n + 1) / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )

_SOF_BASELINE = {0xC0, 0xC1}  # baseline + extended sequential
_SOF_PROGRESSIVE = {0xC2}
_SOF_ALL = _SOF_BASELINE | _SOF_PROGRESSIVE | {0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


# ---------------------------------------------------------------------------
# marker walk / header parse
# ---------------------------------------------------------------------------

def _segments(data: bytes):
    """Yield (marker, payload_start, payload_len) for each segment up to
    SOS (whose payload runs to the next real marker)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        # optional 0xFF fill bytes before a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(data):
            return
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        yield marker, pos + 4, ln - 2
        if marker == 0xDA:  # SOS: entropy data follows, caller takes over
            return
        pos += 2 + ln


def parse_dims(data: bytes) -> tuple[int, int, int, bool]:
    """(width, height, n_components, progressive) from the SOF header —
    no entropy decode. Works for baseline AND progressive JPEGs, so
    metadata scans return real dimensions for any common .jpg."""
    for marker, start, ln in _segments(data):
        if marker in _SOF_ALL:
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[start : start + 6])
            return w, h, ncomp, marker in _SOF_PROGRESSIVE
    raise ValueError("JPEG missing SOF")


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; RST markers are handled by the caller via
    ``sync_to_rst``."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1s per spec (decoder may read past final byte)
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker (RST/EOI): stop feeding, pad 1s
                    self.bitbuf = (self.bitbuf << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bitbuf >> self.nbits) & ((1 << n) - 1)
        self.bitbuf &= (1 << self.nbits) - 1
        return v

    def sync_to_rst(self) -> None:
        """Drop buffered bits and consume the next RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG expected RST marker")


def _build_huff(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _parse_dqt(seg: bytes, qt: dict) -> None:
    """DQT payload (possibly several tables per segment) → qt[id]."""
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0xF
        p += 1
        if pq == 0:
            qt[tq] = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
            p += 64
        else:
            qt[tq] = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
            p += 128


def _parse_dht(seg: bytes, huff_dc: dict, huff_ac: dict) -> None:
    """DHT payload (possibly several tables per segment) → built tables."""
    p = 0
    while p < len(seg):
        tc, th = seg[p] >> 4, seg[p] & 0xF
        bits = list(seg[p + 1 : p + 17])
        n = sum(bits)
        vals = list(seg[p + 17 : p + 17 + n])
        (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
        p += 17 + n


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t > 0 and v < (1 << (t - 1)) else v


def _idct_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficient blocks → (n, 8, 8) spatial, orthonormal."""
    return np.einsum("ki,nkl,lj->nij", _D, blocks, _D, optimize=True)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, c) uint8 (c = 1 gray, 3 RGB, or 4 CMYK —
    Adobe APP14 transform 2 = YCCK and 0/absent = direct CMYK both
    decode; office scanners embed these in PDFs)."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    restart = 0
    sos = None
    sos_end = None
    adobe = None
    for marker, start, ln in _segments(data):
        seg = data[start : start + ln]
        if marker == 0xEE and seg[:5] == b"Adobe":  # APP14 (TN #5116)
            adobe = seg[11] if len(seg) >= 12 else None
        elif marker == 0xDB:  # DQT
            _parse_dqt(seg, qt)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(seg[:2], "big")
        elif marker in _SOF_PROGRESSIVE:
            return _decode_progressive(data)
        elif marker in _SOF_ALL:
            if marker not in _SOF_BASELINE:
                raise NotImplementedError(f"JPEG SOF{marker - 0xC0} unsupported")
            _prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if len(comps) == 1:
                # a single-component scan is non-interleaved: its MCU is
                # ONE data unit and the component covers the full frame
                # regardless of declared sampling factors (T.81 A.2.2) —
                # honoring h/v here would desync the Huffman stream on
                # e.g. grayscale files declaring 2x2
                comps[0]["h"] = comps[0]["v"] = 1
            sof = (w, h, comps)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if sof is not None and ns != len(sof[2]):
                raise NotImplementedError(
                    "JPEG non-interleaved multi-scan baseline (scan covers "
                    f"{ns} of {len(sof[2])} components) unsupported"
                )
            mapping = {}
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i : 3 + 2 * i]
                mapping[cs] = (td_ta >> 4, td_ta & 0xF)
            sos = mapping
            sos_end = start + ln
    if sof is None or sos is None:
        raise ValueError("JPEG missing SOF/SOS")
    w, h, comps = sof
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy

    # per-component coefficient storage: (blocks_y, blocks_x, 64)
    planes_coef = []
    for c in comps:
        by, bx = mcuy * c["v"], mcux * c["h"]
        planes_coef.append(np.zeros((by, bx, 64), dtype=np.int64))

    r = _BitReader(data, sos_end)
    pred = [0] * len(comps)
    for m in range(n_mcu):
        if restart and m and m % restart == 0:
            r.sync_to_rst()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for ci, c in enumerate(comps):
            td, ta = sos[c["id"]]
            dct, act = huff_dc[td], huff_ac[ta]
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    coef = np.zeros(64, dtype=np.int64)
                    t = _huff_decode(r, dct)
                    diff = _extend(r.read(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(r, act)
                        rr, ss = rs >> 4, rs & 0xF
                        if ss == 0:
                            if rr == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += rr
                        if k > 63:
                            raise ValueError("JPEG AC index overflow")
                        coef[k] = _extend(r.read(ss), ss)
                        k += 1
                    planes_coef[ci][my * c["v"] + v, mx * c["h"] + hh] = coef

    return _reconstruct(
        planes_coef, comps, qt, w, h, hmax, vmax, adobe_transform=adobe
    )


def _reconstruct(
    planes_coef, comps, qt, w, h, hmax, vmax, adobe_transform=None
) -> np.ndarray:
    """Shared tail for baseline and progressive: dequantize + un-zigzag +
    IDCT (vectorized per component plane), chroma upsample, color.

    ``adobe_transform`` is the APP14 "Adobe" color-transform byte
    (Adobe TN #5116): for 4-component frames, 2 = YCCK (first three
    channels are the YCbCr of the inverted CMY inks, K passes through)
    and 0/absent = direct CMYK. 4-component output is (h, w, 4) CMYK."""
    planes = []
    for ci, c in enumerate(comps):
        by, bx, _ = planes_coef[ci].shape
        flat = planes_coef[ci].reshape(-1, 64) * qt[c["tq"]][None, :]
        nat = np.zeros_like(flat)
        nat[:, ZIGZAG] = flat
        spatial = _idct_blocks(nat.reshape(-1, 8, 8).astype(np.float64)) + 128.0
        # (by·bx, 8, 8) → (by·8, bx·8)
        plane = (
            spatial.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # upsample to full resolution (sample replication)
        if c["h"] != hmax or c["v"] != vmax:
            plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[: h, : w])
    out = np.stack(planes, axis=2)
    if len(comps) == 3:
        # YCbCr → RGB (JFIF default; Adobe transform 1 says the same).
        # Adobe transform 0 means RGB stored DIRECTLY — Photoshop emits
        # these; converting them would scramble colors.
        if adobe_transform in (None, 1):
            y, cb, cr = out[:, :, 0], out[:, :, 1] - 128.0, out[:, :, 2] - 128.0
            out = np.stack(
                [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
                axis=2,
            )
        elif adobe_transform != 0:
            raise NotImplementedError(
                f"APP14 Adobe transform {adobe_transform} on 3 components"
            )
    elif len(comps) == 4:
        if adobe_transform == 2:  # YCCK → CMYK
            y, cb, cr = out[:, :, 0], out[:, :, 1] - 128.0, out[:, :, 2] - 128.0
            r = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            b = y + 1.772 * cb
            out = np.stack([255.0 - r, 255.0 - g, 255.0 - b, out[:, :, 3]], axis=2)
        elif adobe_transform not in (None, 0):
            raise NotImplementedError(
                f"APP14 Adobe transform {adobe_transform} on 4 components"
            )
        # transform 0 / no APP14: components already CMYK
    elif len(comps) != 1:
        raise NotImplementedError(f"JPEG with {len(comps)} components")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoder (T.81 G.2: spectral selection + successive approx)
# ---------------------------------------------------------------------------

def _next_marker(data: bytes, start: int) -> int:
    """Position of the next REAL marker at/after ``start``: skips entropy
    bytes, 0xFF00 stuffing, fill bytes, and RSTn."""
    pos = start
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            nxt = data[pos + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                pos += 2
                continue
            if nxt == 0xFF:  # fill byte
                pos += 1
                continue
            return pos
        pos += 1
    return n


def _decode_progressive(data: bytes) -> np.ndarray:
    """Progressive JPEG: coefficient planes accumulate across scans —
    DC first/refine (interleaved or single-component), AC first/refine
    (single-component bands with EOBRUN run-length end-of-band codes and
    successive-approximation correction bits)."""
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    sof = None
    restart = 0
    planes_coef: "list[np.ndarray] | None" = None
    saw_scan = False
    adobe = None
    pos = 2
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"JPEG marker sync lost at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        seg = data[pos + 4 : pos + 2 + ln]
        if marker == 0xEE and seg[:5] == b"Adobe":  # APP14 (TN #5116)
            adobe = seg[11] if len(seg) >= 12 else None
        elif marker == 0xDB:
            _parse_dqt(seg, qt)
        elif marker == 0xC4:
            _parse_dht(seg, huff_dc, huff_ac)
        elif marker == 0xDD:
            restart = int.from_bytes(seg[:2], "big")
        elif marker in _SOF_PROGRESSIVE:
            _prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            if len(comps) == 1:
                comps[0]["h"] = comps[0]["v"] = 1
            sof = (w, h, comps)
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            planes_coef = [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in _SOF_ALL:
            raise ValueError("mixed SOF markers in progressive stream")
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, td_ta = seg[1 + 2 * i : 3 + 2 * i]
                ci = next(
                    j for j, c in enumerate(sof[2]) if c["id"] == cs
                )
                scomps.append((ci, td_ta >> 4, td_ta & 0xF))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            r = _BitReader(data, pos + 2 + ln)
            _decode_prog_scan(
                r, sof, scomps, ss, se, ah, al,
                planes_coef, huff_dc, huff_ac, restart,
                mcux, mcuy, hmax, vmax,
            )
            saw_scan = True
            pos = _next_marker(data, pos + 2 + ln)
            continue
        pos += 2 + ln
    if sof is None or planes_coef is None or not saw_scan:
        raise ValueError("JPEG missing SOF/scan data")
    w, h, comps = sof
    return _reconstruct(
        planes_coef, comps, qt, w, h, hmax, vmax, adobe_transform=adobe
    )


def _refine_nonzero(r: _BitReader, coef: np.ndarray, zz_idx: int, al: int) -> None:
    """Append a correction bit to an already-nonzero AC coefficient
    (T.81 G.2.2.3): a 1-bit adds 2^Al toward the coefficient's sign if
    that bit is not already present."""
    if r.read(1):
        bit = 1 << al
        v = coef[zz_idx]
        if v > 0 and not (v & bit):
            coef[zz_idx] = v + bit
        elif v < 0 and not ((-v) & bit):
            coef[zz_idx] = v - bit


def _decode_prog_scan(
    r, sof, scomps, ss, se, ah, al,
    planes_coef, huff_dc, huff_ac, restart,
    mcux, mcuy, hmax, vmax,
):
    w, h, comps = sof
    eobrun = 0

    def block_grid(ci):
        c = comps[ci]
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        return -(-ch // 8), -(-cw // 8)  # (bh, bw) true data-unit grid

    if ss == 0:  # DC scan (interleaved when ns > 1)
        if se != 0:
            raise ValueError("JPEG DC scan with Se != 0")
        pred = [0] * len(scomps)
        if len(scomps) > 1 or len(comps) == 1:
            n_units = mcux * mcuy
        else:
            bh, bw = block_grid(scomps[0][0])
            n_units = bh * bw
        for m in range(n_units):
            if restart and m and m % restart == 0:
                r.sync_to_rst()
                pred = [0] * len(scomps)
            for si, (ci, td, _ta) in enumerate(scomps):
                c = comps[ci]
                if len(scomps) > 1:
                    my, mx = divmod(m, mcux)
                    units = [
                        (my * c["v"] + v, mx * c["h"] + hh)
                        for v in range(c["v"])
                        for hh in range(c["h"])
                    ]
                else:
                    bh, bw = block_grid(ci)
                    units = [divmod(m, bw)]
                for by, bx in units:
                    coef = planes_coef[ci][by, bx]
                    if ah == 0:  # first pass
                        t = _huff_decode(r, huff_dc[td])
                        diff = _extend(r.read(t), t)
                        pred[si] += diff
                        coef[0] = pred[si] << al
                    else:  # refinement: one bit per data unit
                        coef[0] |= r.read(1) << al
        return

    # AC scan: single component, band [ss, se] (T.81 G.1.1.1.1)
    if len(scomps) != 1:
        raise ValueError("JPEG progressive AC scan must cover one component")
    ci, _td, ta = scomps[0]
    act = huff_ac[ta]
    bh, bw = block_grid(ci)
    for m in range(bh * bw):
        if restart and m and m % restart == 0:
            r.sync_to_rst()
            eobrun = 0
        by, bx = divmod(m, bw)
        coef = planes_coef[ci][by, bx]
        if ah == 0:  # ---- AC first pass (with EOBRUN) ----
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _huff_decode(r, act)
                rr, s = rs >> 4, rs & 0xF
                if s == 0:
                    if rr < 15:  # EOBn
                        eobrun = (1 << rr) - 1 + r.read(rr)
                        break
                    k += 16  # ZRL
                    continue
                k += rr
                if k > se:
                    raise ValueError("JPEG AC band overflow")
                coef[k] = _extend(r.read(s), s) << al
                k += 1
        else:  # ---- AC refinement pass (correction bits) ----
            k = ss
            if eobrun > 0:
                eobrun -= 1
                # only correction bits for already-nonzero coefs
                while k <= se:
                    if coef[k] != 0:
                        _refine_nonzero(r, coef, k, al)
                    k += 1
                continue
            while k <= se:
                rs = _huff_decode(r, act)
                rr, s = rs >> 4, rs & 0xF
                newval = 0
                if s == 0:
                    if rr < 15:  # EOBn: finish band with correction bits
                        eobrun = (1 << rr) - 1 + r.read(rr)
                        while k <= se:
                            if coef[k] != 0:
                                _refine_nonzero(r, coef, k, al)
                            k += 1
                        break
                    # ZRL: skip 16 zero-HISTORY coefficients
                else:
                    if s != 1:
                        raise ValueError("JPEG AC refine magnitude != 1")
                    newval = (1 << al) if r.read(1) else -(1 << al)
                # advance over rr zero-history coefs, refining nonzeros
                while k <= se:
                    if coef[k] != 0:
                        _refine_nonzero(r, coef, k, al)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if newval and k <= se:
                    coef[k] = newval
                k += 1


# ---------------------------------------------------------------------------
# encoder (baseline, 4:4:4, Annex K tables)
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            self.write(0xFF, 8 - self.n)  # pad with 1s
        return bytes(self.out)


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """{symbol -> (code, length)} canonical assignment."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (public libjpeg formula)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * s + 50) // 100, 1, 255)


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, magnitude code) for a DC diff / AC value, T.81 F.1.2.1."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    code = v if v >= 0 else v + (1 << t) - 1
    return t, code


def _encode_plane_blocks(
    plane: np.ndarray, qtab: np.ndarray
) -> np.ndarray:
    """float plane (level-shifted) → (n_blocks, 64) quantized zigzag coefs."""
    hb, wb = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = (
        plane.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coefs = np.einsum("ik,nkl,jl->nij", _D, blocks, _D, optimize=True)
    # quantize in NATURAL order (qtab is natural), then reorder to zigzag
    quant = np.round(coefs.reshape(-1, 64) / qtab[None, :])
    return quant[:, ZIGZAG].astype(np.int64)


def _write_block(wtr: _BitWriter, coefs: np.ndarray, pred: int, dct, act) -> int:
    """Huffman-encode one zigzag block; returns the new DC predictor."""
    dc = int(coefs[0])
    t, mag = _mag_bits(dc - pred)
    code, ln = dct[t]
    wtr.write(code, ln)
    if t:
        wtr.write(mag, t)
    run = 0
    for k in range(1, 64):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        t, mag = _mag_bits(v)
        code, ln = act[(run << 4) | t]
        wtr.write(code, ln)
        wtr.write(mag, t)
        run = 0
    if run:
        code, ln = act[0x00]  # EOB
        wtr.write(code, ln)
    return dc


def _prepare_planes(arr: np.ndarray, quality: int, subsample: bool, adobe_transform: "int | None" = None):
    """Shared encoder front half: color transform, subsample, pad, DCT,
    quantize. Returns (coef_grids[(by,bx,64) zigzag], samp, ql, qc,
    h, w, c, mcux, mcuy, hmax, vmax)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    if c not in (1, 3, 4):
        raise ValueError("JPEG encoder takes gray, RGB, or CMYK")
    sub = subsample and c == 3 and adobe_transform != 0
    ql = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    if c == 3 and adobe_transform == 0:
        # Adobe transform 0: RGB stored directly, no color transform —
        # luma tables for every component
        rf = a.astype(np.float64)
        planes = [rf[:, :, 0], rf[:, :, 1], rf[:, :, 2]]
        qtabs = [ql] * 3
        samp = [(1, 1)] * 3
    elif c == 3:
        rf = a.astype(np.float64)
        y = 0.299 * rf[:, :, 0] + 0.587 * rf[:, :, 1] + 0.114 * rf[:, :, 2]
        cb = -0.168736 * rf[:, :, 0] - 0.331264 * rf[:, :, 1] + 0.5 * rf[:, :, 2] + 128
        cr = 0.5 * rf[:, :, 0] - 0.418688 * rf[:, :, 1] - 0.081312 * rf[:, :, 2] + 128
        planes = [y, cb, cr]
        qtabs = [ql, qc, qc]
        samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * 3
    elif c == 4:
        # CMYK input; the caller picks the stored representation via
        # encode_jpeg(adobe_transform=): 2 stores YCCK (YCbCr of the
        # inverted inks + K), 0 stores the inks directly. All four
        # components use the luma quant/Huffman tables (legal per T.81;
        # table choice is an encoder freedom).
        rf = a.astype(np.float64)
        if adobe_transform == 2:  # store YCCK: YCbCr of inverted inks + K
            r, g, b = 255.0 - rf[:, :, 0], 255.0 - rf[:, :, 1], 255.0 - rf[:, :, 2]
            y = 0.299 * r + 0.587 * g + 0.114 * b
            cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
            cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
            planes = [y, cb, cr, rf[:, :, 3]]
        else:  # transform 0: store the inks directly
            planes = [rf[:, :, 0], rf[:, :, 1], rf[:, :, 2], rf[:, :, 3]]
        qtabs = [ql] * 4
        samp = [(1, 1)] * 4
    else:
        planes = [a[:, :, 0].astype(np.float64)]
        qtabs = [ql]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component padded plane at its own resolution, level-shifted
    coef_grids = []
    for p, q, (sh, sv) in zip(planes, qtabs, samp):
        if (sh, sv) != (hmax, vmax):  # downsample by box average
            fy, fx = vmax // sv, hmax // sh
            ph0, pw0 = -(-h // fy) * fy, -(-w // fx) * fx
            p = np.pad(p, ((0, ph0 - h), (0, pw0 - w)), mode="edge")
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(axis=(1, 3))
        tgt_h, tgt_w = mcuy * sv * 8, mcux * sh * 8
        p = np.pad(
            p, ((0, tgt_h - p.shape[0]), (0, tgt_w - p.shape[1])), mode="edge"
        ) - 128.0
        blocks = _encode_plane_blocks(p, q.astype(np.float64))
        coef_grids.append(blocks.reshape(tgt_h // 8, tgt_w // 8, 64))
    return coef_grids, samp, ql, qc, h, w, c, mcux, mcuy, hmax, vmax


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
    adobe_transform: int = 2,
) -> bytes:
    """(h, w[, c]) uint8 (c ∈ {1, 3, 4}; 3 = RGB, 4 = CMYK) → baseline
    JFIF bytes.

    ``subsample=True`` emits 4:2:0 (box-averaged chroma, 2×2 luma
    sampling); ``restart_interval`` > 0 emits DRI + RSTn markers every N
    MCUs. Both exist mainly so the decoder's subsampling/restart paths
    have deterministic fixtures. The APP14 "Adobe" marker (TN #5116) is
    written when the transform matters: 4-channel input stores YCCK
    (``adobe_transform=2``, the office-scanner convention) or the inks
    directly (``0``); 3-channel input with ``adobe_transform=0`` stores
    RGB DIRECTLY (the Photoshop shape) — any other value keeps the
    standard JFIF YCbCr encoding with no marker."""
    c_in = np.asarray(arr).shape[2] if np.asarray(arr).ndim == 3 else 1
    coef_grids, samp, ql, qc, h, w, c, mcux, mcuy, hmax, vmax = _prepare_planes(
        arr, quality, subsample, adobe_transform if c_in in (3, 4) else None
    )

    rgb_direct = c == 3 and adobe_transform == 0
    ycc = c == 3 and not rgb_direct
    dc_tabs = [_huff_codes(*HT_DC_LUMA)] + [_huff_codes(*HT_DC_CHROMA)] * ycc * 2
    ac_tabs = [_huff_codes(*HT_AC_LUMA)] + [_huff_codes(*HT_AC_CHROMA)] * ycc * 2
    if c == 4 or rgb_direct:  # luma tables for every component
        dc_tabs = [_huff_codes(*HT_DC_LUMA)] * c
        ac_tabs = [_huff_codes(*HT_AC_LUMA)] * c
    pred = [0] * len(samp)
    chunks: list[bytes] = []
    wtr = _BitWriter()
    rst_n = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            chunks.append(wtr.flush())
            chunks.append(bytes([0xFF, 0xD0 + (rst_n % 8)]))
            rst_n += 1
            wtr = _BitWriter()
            pred = [0] * len(samp)
        my, mx = divmod(m, mcux)
        for ci, (sh, sv) in enumerate(samp):
            for v in range(sv):
                for hh in range(sh):
                    coefs = coef_grids[ci][my * sv + v, mx * sh + hh]
                    pred[ci] = _write_block(
                        wtr, coefs, pred[ci], dc_tabs[ci], ac_tabs[ci]
                    )
    chunks.append(wtr.flush())
    entropy = b"".join(chunks)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    if c == 4 or rgb_direct:
        # APP14 Adobe marker: version 100, flags 0, transform byte
        out += seg(
            0xEE,
            b"Adobe" + (100).to_bytes(2, "big") + bytes(4)
            + bytes([adobe_transform]),
        )
    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].tolist()))
    if ycc:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].tolist()))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for i in range(c):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 1 if (ycc and i > 0) else 0])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, HT_DC_LUMA) + dht(1, 0, HT_AC_LUMA)
    if ycc:
        out += dht(0, 1, HT_DC_CHROMA) + dht(1, 1, HT_AC_CHROMA)
    sos = bytes([c])
    for i in range(c):
        sos += bytes([i + 1, 0x11 if (ycc and i > 0) else 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (fixture generator: exercises all four scan types)
# ---------------------------------------------------------------------------

def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating TOWARD ZERO
    (T.81 G.1.2.2) — arithmetic shift would floor negatives."""
    return -((-v) >> al) if v < 0 else v >> al


def _emit_ac_first_block(wtr, coefs, ss, se, al, act) -> None:
    """AC first-pass band encode (per-block EOB, no cross-block runs)."""
    vals = [_pt_ac(int(coefs[k]), al) for k in range(ss, se + 1)]
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    run = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act[0xF0]
            wtr.write(code, ln)
            run -= 16
        t, mag = _mag_bits(v)
        code, ln = act[(run << 4) | t]
        wtr.write(code, ln)
        wtr.write(mag, t)
        run = 0
    if last_nz < len(vals) - 1:  # trailing zeros → EOB (run-length 1)
        code, ln = act[0x00]
        wtr.write(code, ln)


def _emit_ac_refine_block(wtr, coefs, ss, se, al, act) -> None:
    """AC refinement band encode (T.81 G.2.2.3 / libjpeg
    encode_mcu_AC_refine shape, per-block EOB): newly-nonzero coefs
    (|c|>>Al == 1) emit (run,1)+sign; history coefs (|c|>>Al > 1) emit
    one correction bit each, buffered until the next symbol."""
    absv = [abs(int(coefs[k])) >> al for k in range(ss, se + 1)]
    signs = [1 if int(coefs[k]) > 0 else 0 for k in range(ss, se + 1)]
    last_new = -1
    for i, t in enumerate(absv):
        if t == 1:
            last_new = i
    run = 0
    pending: list[int] = []
    for i in range(last_new + 1):
        t = absv[i]
        if t == 0:
            run += 1
            continue
        # flush ZRLs on ARRIVAL at any nonzero — history included: the
        # decoder reads buffered correction bits positionally inside each
        # ZRL's 16-zero window, so a history bit buffered past a pending
        # ZRL would land on the wrong side of the next symbol
        while run > 15:  # ZRL covers 16 zero-history positions
            code, ln = act[0xF0]
            wtr.write(code, ln)
            for b in pending:
                wtr.write(b, 1)
            pending = []
            run -= 16
        if t > 1:  # history coefficient: correction bit, run continues
            pending.append(t & 1)
            continue
        code, ln = act[(run << 4) | 1]
        wtr.write(code, ln)
        wtr.write(signs[i], 1)
        for b in pending:
            wtr.write(b, 1)
        pending = []
        run = 0
    # trailing positions: EOB + correction bits for remaining history coefs
    tail_bits = [absv[i] & 1 for i in range(last_new + 1, len(absv)) if absv[i] > 1]
    tail_bits = pending + tail_bits
    if run > 0 or tail_bits or last_new < len(absv) - 1:
        code, ln = act[0x00]
        wtr.write(code, ln)
        for b in tail_bits:
            wtr.write(b, 1)


def encode_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsample: bool = False
) -> bytes:
    """(h, w[, c]) uint8 → progressive (SOF2) JFIF bytes with a scan
    script exercising all four progressive scan types: interleaved DC
    first (Al=1), per-component AC first (band 1-63, Al=1), DC refine
    (Ah=1→Al=0), per-component AC refine. Transmits the SAME quantized
    coefficients as ``encode_jpeg`` at equal quality, so
    ``decode_jpeg(progressive) == decode_jpeg(baseline)`` bit-exactly —
    the fixture contract the tests pin."""
    coef_grids, samp, ql, qc, h, w, c, mcux, mcuy, hmax, vmax = _prepare_planes(
        arr, quality, subsample
    )
    dc_tabs = [_huff_codes(*HT_DC_LUMA)] + [_huff_codes(*HT_DC_CHROMA)] * (c == 3) * 2
    ac_tabs = [_huff_codes(*HT_AC_LUMA)] + [_huff_codes(*HT_AC_CHROMA)] * (c == 3) * 2

    def true_grid(ci):
        sh, sv = samp[ci]
        cw = -(-w * sh // hmax)
        ch = -(-h * sv // vmax)
        return -(-ch // 8), -(-cw // 8)

    def dc_scan(al_shift, refine):
        wtr = _BitWriter()
        pred = [0] * c
        for m in range(mcux * mcuy):
            my, mx = divmod(m, mcux)
            for ci in range(c):
                sh, sv = samp[ci]
                for v in range(sv):
                    for hh in range(sh):
                        dc = int(coef_grids[ci][my * sv + v, mx * sh + hh, 0])
                        if refine:
                            wtr.write((dc >> al_shift) & 1, 1)
                        else:
                            val = dc >> al_shift  # arithmetic: two's compl.
                            diff = val - pred[ci]
                            pred[ci] = val
                            t, mag = _mag_bits(diff)
                            code, ln = dc_tabs[ci][t]
                            wtr.write(code, ln)
                            if t:
                                wtr.write(mag, t)
        return wtr.flush()

    def ac_scan(ci, al_shift, refine):
        wtr = _BitWriter()
        bh, bw = true_grid(ci)
        emit = _emit_ac_refine_block if refine else _emit_ac_first_block
        for m in range(bh * bw):
            by, bx = divmod(m, bw)
            emit(wtr, coef_grids[ci][by, bx], 1, 63, al_shift, ac_tabs[ci])
        return wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def sos(comp_ids, ss, se, ah, al):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid + 1, 0x00 if cid == 0 else 0x11])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(ql[ZIGZAG].tolist()))
    if c == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for i in range(c):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else 1])
    out += seg(0xC2, sof)

    def dht(tc, th, spec):
        bits, vals = spec
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, HT_DC_LUMA) + dht(1, 0, HT_AC_LUMA)
    if c == 3:
        out += dht(0, 1, HT_DC_CHROMA) + dht(1, 1, HT_AC_CHROMA)

    # scan script: DC first → per-comp AC first → DC refine → AC refine
    out += sos(list(range(c)), 0, 0, 0, 1) + dc_scan(1, refine=False)
    for ci in range(c):
        out += sos([ci], 1, 63, 0, 1) + ac_scan(ci, 1, refine=False)
    out += sos(list(range(c)), 0, 0, 1, 0) + dc_scan(0, refine=True)
    for ci in range(c):
        out += sos([ci], 1, 63, 1, 0) + ac_scan(ci, 0, refine=True)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# MJPEG stream (concatenated JFIF frames — the IP-camera wire format)
# ---------------------------------------------------------------------------

def _frame_end(data: bytes, start: int) -> int:
    """End offset (exclusive) of the JPEG frame starting at ``start``:
    a real marker walk — segment payloads may contain 0xFFD9 bytes, so a
    naive EOI search would truncate frames with EXIF blobs."""
    pos = start + 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError(f"MJPEG marker sync lost at {pos}")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            return pos + 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        if marker == 0xDA:  # entropy data follows (multi-scan safe)
            pos = _next_marker(data, pos + 2 + ln)
            continue
        pos += 2 + ln
    raise ValueError("MJPEG frame missing EOI")


def split_mjpeg(data: bytes) -> list[bytes]:
    """Concatenated-JFIF stream → list of standalone JPEG frames. A
    truncated FINAL frame (the IP-camera disconnect case) is dropped
    and the complete frames are returned — one bad tail must never
    discard a whole video's worth of good frames."""
    frames = []
    pos = 0
    while True:
        s = data.find(b"\xff\xd8", pos)
        if s < 0:
            break
        try:
            e = _frame_end(data, s)
        except ValueError:
            break  # truncated/corrupt tail: keep what we have
        frames.append(data[s:e])
        pos = e
    if not frames:
        raise ValueError("no complete JPEG frames in stream")
    return frames
