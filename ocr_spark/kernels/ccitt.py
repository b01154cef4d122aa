"""CCITT Group 4 (ITU-T T.6, "MMR") codec for PDF /CCITTFaxDecode.

Scanned PDFs produced by office scanners and fax gateways store their
page bitmaps as Group 4 — it is the single most common encoding for
1-bit scanned-document images, the reference's actual input class
(scripts/ExtractX_OCR.py:263-265 rasterizes scanned pages and extracts
from pixels). This module implements, from the public ITU-T T.4/T.6
specifications:

- ``decode_g4(data, columns, rows)`` → (rows, columns) uint8 {0,1}
  bitmap (1 = black, the fax convention; callers map to pixel values
  via /BlackIs1).
- ``encode_g4(bitmap)`` → bytes, for writing deterministic scanned-PDF
  fixtures (kernels/pdf.build_pdf_images ccitt mode).

Both sides work on *changing-element* (run boundary) lists per line —
the representation T.6 itself is defined over — so cost scales with
ink transitions, not pixels. Coding follows T.6 §2.2: pass / horizontal
/ vertical modes against the reference line, horizontal runs coded with
the T.4 modified-Huffman white/black tables (terminating 0-63, makeup
to 1728, shared extended makeup to 2560). The first reference line is
an imaginary all-white line; EOFB terminates the stream (optional on
decode — /Rows bounds it, per the PDF CCITTFaxDecode parameter model).

The code tables below are transcribed from ITU-T T.4 tables 2/3 and
T.6; ``tests/test_ccitt.py`` pins spot codewords from the spec text,
checks prefix-freeness, and round-trips random and structured bitmaps
(no external CCITT reader exists in this container for cross-checks).
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.4 modified-Huffman run-length tables (run_length -> bit string)
# ---------------------------------------------------------------------------

WHITE_CODES: dict[int, str] = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
    # makeup
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

BLACK_CODES: dict[int, str] = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011",
    5: "0011", 6: "0010", 7: "00011", 8: "000101", 9: "000100",
    10: "0000100", 11: "0000101", 12: "0000111", 13: "00000100",
    14: "00000111", 15: "000011000", 16: "0000010111",
    17: "0000011000", 18: "0000001000", 19: "00001100111",
    20: "00001101000", 21: "00001101100", 22: "00000110111",
    23: "00000101000", 24: "00000010111", 25: "00000011000",
    26: "000011001010", 27: "000011001011", 28: "000011001100",
    29: "000011001101", 30: "000001101000", 31: "000001101001",
    32: "000001101010", 33: "000001101011", 34: "000011010010",
    35: "000011010011", 36: "000011010100", 37: "000011010101",
    38: "000011010110", 39: "000011010111", 40: "000001101100",
    41: "000001101101", 42: "000011011010", 43: "000011011011",
    44: "000001010100", 45: "000001010101", 46: "000001010110",
    47: "000001010111", 48: "000001100100", 49: "000001100101",
    50: "000001010010", 51: "000001010011", 52: "000000100100",
    53: "000000110111", 54: "000000111000", 55: "000000100111",
    56: "000000101000", 57: "000001011000", 58: "000001011001",
    59: "000000101011", 60: "000000101100", 61: "000001011010",
    62: "000001100110", 63: "000001100111",
    # makeup
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

#: extended makeup codes (T.4 table 4), shared by both colours
EXT_CODES: dict[int, str] = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

#: T.6 §2.2.4 mode codewords
MODE_PASS = "0001"
MODE_HORIZ = "001"
MODE_V = {0: "1", 1: "011", 2: "000011", 3: "0000011",
          -1: "010", -2: "000010", -3: "0000010"}
EOL = "000000000001"  # eleven 0s + 1 (T.4 §4.1.2)
EOFB = EOL * 2


def _makeup_splits(run: int) -> "list[int]":
    """Split a run length into (0+) makeup codes + one terminating code.

    T.4 allows a chain of 2560-makeups for runs over 2560; below that,
    one makeup (the largest multiple of 64 ≤ run, if ≥64) + terminator.
    """
    parts = []
    while run >= 2624:  # needs the max extended makeup then more
        parts.append(2560)
        run -= 2560
    if run >= 64:
        mk = run - (run % 64)
        parts.append(mk)
        run -= mk
    parts.append(run)
    return parts


def _run_code(run: int, black: bool) -> str:
    table = BLACK_CODES if black else WHITE_CODES
    out = []
    for part in _makeup_splits(run):
        if part >= 1792:
            out.append(EXT_CODES[part])
        else:
            out.append(table[part])
    return "".join(out)


# ---------------------------------------------------------------------------
# changing-element helpers
# ---------------------------------------------------------------------------


def _changes(line: np.ndarray) -> "list[int]":
    """Positions where the colour changes, starting from imaginary white
    before position 0 (so a leading black pixel yields a change at 0).
    Terminated by two sentinels at `width` (T.6 decoder convention)."""
    d = np.flatnonzero(np.diff(np.concatenate(([0], line.astype(np.int8)))))
    w = line.shape[0]
    return [int(x) for x in d] + [w, w]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _encode_2d_row(
    cur_changes: "list[int]", ref_changes: "list[int]", w: int
) -> "list[str]":
    """T.6 §2.2 coding of one line against its reference line —
    the row unit shared by G4 and the 2-D rows of mixed G3 (K>0)."""
    bits: list[str] = []
    a0 = -1
    color = 0  # white
    ci = 0  # index of next changing element ≥ a0 of the coding line
    while a0 < w:
        # a1: first changing element of coding line right of a0
        while ci < len(cur_changes) and cur_changes[ci] <= (a0 if a0 >= 0 else -1):
            ci += 1
        a1 = cur_changes[ci] if ci < len(cur_changes) else w
        # b1: first change on ref line right of a0 with colour
        # opposite the coding colour (== colour of a1's new colour)
        b1 = _b1(ref_changes, a0, color)
        b2 = _next_change(ref_changes, b1)
        if b2 < a1:
            bits.append(MODE_PASS)
            a0 = b2
            continue
        if abs(a1 - b1) <= 3:
            bits.append(MODE_V[a1 - b1])
            a0 = a1
            color ^= 1
            continue
        # horizontal mode: two runs a0a1 (current colour), a1a2
        a2 = cur_changes[ci + 1] if ci + 1 < len(cur_changes) else w
        r1 = a1 - (a0 if a0 >= 0 else 0)
        r2 = a2 - a1
        bits.append(MODE_HORIZ)
        bits.append(_run_code(r1, black=bool(color)))
        bits.append(_run_code(r2, black=not bool(color)))
        a0 = a2
    return bits


def _encode_1d_row(cur_changes: "list[int]", w: int) -> "list[str]":
    """T.4 one-dimensional (modified Huffman) coding of one line: run
    codes alternating colour, starting with a (possibly zero-length)
    white run — the row unit of G3 1-D and the K-th rows of mixed G3."""
    bits: list[str] = []
    prev = 0
    color = 0
    for c in cur_changes[:-2]:  # drop the two width sentinels
        bits.append(_run_code(c - prev, black=bool(color)))
        prev = c
        color ^= 1
    bits.append(_run_code(w - prev, black=bool(color)))
    return bits


def encode_g4(bitmap: np.ndarray, byte_align: bool = False) -> bytes:
    """Encode a (rows, cols) {0,1} uint8 bitmap (1 = black) as Group 4.

    Emits EOFB and pads the final byte with zeros. ``byte_align=True``
    pads each coded line to a byte boundary (PDF /EncodedByteAlign true
    — the layout some scanner firmwares emit); default is one
    continuous bit stream."""
    if bitmap.ndim != 2:
        raise ValueError("G4 encoder needs a 2-D bitmap")
    bm = (bitmap > 0).astype(np.uint8)
    h, w = bm.shape
    bits: list[str] = []
    nbits = 0
    ref_changes = [w, w]  # imaginary all-white reference line
    for y in range(h):
        if byte_align and nbits % 8:
            pad = "0" * (-nbits % 8)
            bits.append(pad)
            nbits += len(pad)
        cur_changes = _changes(bm[y])
        row = _encode_2d_row(cur_changes, ref_changes, w)
        bits.extend(row)
        nbits += sum(map(len, row))
        ref_changes = cur_changes
    if byte_align and nbits % 8:
        bits.append("0" * (-nbits % 8))  # EOFB starts a coded line too
    bits.append(EOFB)
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def encode_g3(
    bitmap: np.ndarray,
    k: int = 0,
    byte_align: bool = False,
    end_of_line: bool = False,
) -> bytes:
    """Encode a (rows, cols) {0,1} uint8 bitmap (1 = black) as Group 3
    (ITU-T T.4) — the PDF /CCITTFaxDecode ``/K >= 0`` family.

    ``k=0``: pure one-dimensional MH rows (PDF /K 0). ``k>0``: mixed
    2-D — every k-th row is coded 1-D, the rows between 2-D against
    their predecessor, each row carrying the T.4 §4.2.1 tag bit
    (1 = 1-D, 0 = 2-D). ``end_of_line=True`` prefixes every row with an
    EOL codeword (PDF /EndOfLine — classic fax framing); the decoder
    auto-detects either layout. ``byte_align`` pads each coded row to a
    byte boundary (PDF /EncodedByteAlign)."""
    if bitmap.ndim != 2:
        raise ValueError("G3 encoder needs a 2-D bitmap")
    if k < 0:
        raise ValueError("G3 needs k >= 0; use encode_g4 for k < 0")
    bm = (bitmap > 0).astype(np.uint8)
    h, w = bm.shape
    bits: list[str] = []
    nbits = 0
    ref_changes = [w, w]
    for y in range(h):
        if byte_align and nbits % 8:
            pad = "0" * (-nbits % 8)
            bits.append(pad)
            nbits += len(pad)
        row: list[str] = []
        if end_of_line:
            row.append(EOL)
        one_d = k == 0 or (y % k == 0)
        if k > 0:
            row.append("1" if one_d else "0")
        cur_changes = _changes(bm[y])
        if one_d:
            row.extend(_encode_1d_row(cur_changes, w))
        else:
            row.extend(_encode_2d_row(cur_changes, ref_changes, w))
        bits.extend(row)
        nbits += sum(map(len, row))
        ref_changes = cur_changes
    s = "".join(bits)
    s += "0" * (-len(s) % 8)
    return int(s, 2).to_bytes(len(s) // 8, "big") if s else b""


def _b1(ref: "list[int]", a0: int, color: int) -> int:
    """First changing element on the reference line to the right of a0
    whose colour (the colour it changes TO, counting from white) is
    opposite to the coding colour. Changing elements alternate
    white→black (even indices) / black→white (odd)."""
    # elements at even index change to black, odd to white
    start_parity = 0 if color == 0 else 1
    i = start_parity
    while i < len(ref) - 2 and ref[i] <= (a0 if a0 >= 0 else -1):
        i += 2
    return ref[i] if i < len(ref) else ref[-1]


def _next_change(ref: "list[int]", pos: int) -> int:
    for x in ref:
        if x > pos:
            return x
    return ref[-1]


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read(self) -> int:
        p = self.pos
        if p >= self.n:
            raise EOFError("G4 bit stream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def peek_str(self, k: int) -> str:
        out = []
        p = self.pos
        for i in range(k):
            if p + i >= self.n:
                break
            out.append(str((self.data[(p + i) >> 3] >> (7 - ((p + i) & 7))) & 1))
        return "".join(out)


def _build_decode_trie() -> "tuple[dict, dict]":
    """(white, black) code-string → run-length maps, longest code 13."""
    white = dict(WHITE_CODES)
    black = dict(BLACK_CODES)
    wmap = {v: k for k, v in white.items()}
    bmap = {v: k for k, v in black.items()}
    for run, code in EXT_CODES.items():
        wmap[code] = run
        bmap[code] = run
    return wmap, bmap


_WMAP, _BMAP = _build_decode_trie()
_MAX_CODE_LEN = max(len(c) for c in list(_WMAP) + list(_BMAP))


def _read_run(bits: _Bits, black: bool) -> int:
    """Read one full run (makeup chain + terminator)."""
    table = _BMAP if black else _WMAP
    total = 0
    while True:
        code = ""
        run = None
        for _ in range(_MAX_CODE_LEN):
            code += str(bits.read())
            if code in table:
                run = table[code]
                break
        if run is None:
            raise ValueError(f"G4: bad {'black' if black else 'white'} run code {code!r}")
        total += run
        if run < 64:  # terminating code ends the run
            return total
        # makeup code → a terminating code (or another makeup ≥2560) follows


def _decode_2d_row(bits: _Bits, ref_changes: "list[int]", w: int) -> "list[int]":
    """Decode one T.6-coded line against its reference line → changing
    elements. Shared by G4 and the 2-D rows of mixed G3 (K>0)."""
    cur: list[int] = []
    a0 = -1
    color = 0
    while a0 < w:
        mode = _read_mode(bits)
        if mode == "pass":
            b1 = _b1(ref_changes, a0, color)
            b2 = _next_change(ref_changes, b1)
            a0 = b2
        elif mode == "horiz":
            r1 = _read_run(bits, black=bool(color))
            r2 = _read_run(bits, black=not bool(color))
            start = a0 if a0 >= 0 else 0
            a1 = min(start + r1, w)
            a2 = min(a1 + r2, w)
            cur.append(a1)
            cur.append(a2)
            a0 = a2
        else:  # vertical -3..3
            b1 = _b1(ref_changes, a0, color)
            a1 = b1 + mode
            # a1 is by definition the NEXT changing element: it must
            # advance, else a corrupt stream would loop forever
            if a1 <= (a0 if a0 >= 0 else -1) or a1 > w:
                raise ValueError("G4: vertical mode does not advance")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur


def _decode_1d_row(bits: _Bits, w: int) -> "list[int]":
    """Decode one T.4 one-dimensional (MH) line → changing elements.
    Runs alternate colour starting white; a leading black pixel arrives
    as a zero-length white run, exactly as encoded."""
    cur: list[int] = []
    pos = 0
    color = 0
    while pos < w:
        run = _read_run(bits, black=bool(color))
        pos = min(pos + run, w)
        cur.append(pos)
        color ^= 1
    return cur


def _paint_row(cur: "list[int]", w: int) -> np.ndarray:
    """Changing elements → one {0,1} scanline (colour starts white)."""
    line = np.zeros(w, dtype=np.uint8)
    c = 0
    prev = 0
    for pos in cur:
        pos = min(pos, w)
        if c:
            line[prev:pos] = 1
        prev = pos
        c ^= 1
    if c and prev < w:
        line[prev:] = 1
    return line


def decode_g4(
    data: bytes, columns: int, rows: int, byte_align: bool = False
) -> np.ndarray:
    """Decode a Group 4 stream → (rows, columns) uint8 {0,1}, 1=black.

    Stops after ``rows`` lines (the PDF /Rows parameter model); EOFB,
    if present before that, also terminates — the remaining rows stay
    white so the declared (rows, columns) shape always comes back.
    ``byte_align=True`` realigns to a byte boundary before each coded
    line (PDF /EncodedByteAlign)."""
    bits = _Bits(data)
    w = columns
    out = np.zeros((rows, w), dtype=np.uint8)
    ref_changes = [w, w]
    for y in range(rows):
        if byte_align:
            bits.pos = (bits.pos + 7) & ~7
        if bits.peek_str(24) == EOFB:
            return out
        try:
            cur = _decode_2d_row(bits, ref_changes, w)
        except EOFError:
            # stream ended before /Rows lines without an EOFB — common
            # in scanner/TIFF-origin G4; keep the decoded rows, the
            # remainder stays white (same degrade as decode_g3)
            return out
        out[y] = _paint_row(cur, w)
        ref_changes = [min(x, w) for x in cur] + [w, w]
    return out


def _consume_eol(bits: _Bits) -> bool:
    """Consume (fill zeros +) one EOL codeword if one is next; return
    whether an EOL was consumed. Safe by the T.4 synchronization
    property: no run/mode codeword has ≥ 11 leading zeros, so ≥ 11
    zeros followed by a 1 can only be fill + EOL."""
    p = bits.pos
    zeros = 0
    while p + zeros < bits.n and not (
        (bits.data[(p + zeros) >> 3] >> (7 - ((p + zeros) & 7))) & 1
    ):
        zeros += 1
    if zeros >= 11 and p + zeros < bits.n:
        bits.pos = p + zeros + 1
        return True
    return False


def decode_g3(
    data: bytes,
    columns: int,
    rows: int,
    k: int = 0,
    byte_align: bool = False,
) -> np.ndarray:
    """Decode a Group 3 stream (ITU-T T.4, PDF /K >= 0) → (rows,
    columns) uint8 {0,1}, 1 = black.

    ``k=0``: every row is one-dimensional MH. ``k>0``: each row carries
    a tag bit (1 = 1-D, 0 = 2-D against the previous row). EOL
    codewords (with fill) before rows are auto-detected and consumed —
    both the PDF /EndOfLine true and false layouts decode; an RTC /
    exhausted stream before /Rows lines leaves the remainder white, so
    the declared shape always comes back."""
    if k < 0:
        raise ValueError("G3 needs k >= 0; use decode_g4 for k < 0")
    bits = _Bits(data)
    w = columns
    out = np.zeros((rows, w), dtype=np.uint8)
    ref_changes = [w, w]
    for y in range(rows):
        if byte_align:
            bits.pos = (bits.pos + 7) & ~7
        had_eol = _consume_eol(bits)
        if bits.pos >= bits.n:
            return out  # trailing pad / RTC
        if had_eol and _consume_eol(bits):
            return out  # two consecutive EOLs: return-to-control
        try:
            one_d = True
            if k > 0:
                one_d = bits.read() == 1
            cur = (
                _decode_1d_row(bits, w)
                if one_d
                else _decode_2d_row(bits, ref_changes, w)
            )
        except EOFError:
            return out  # stream ended at a row boundary pad
        out[y] = _paint_row(cur, w)
        ref_changes = [min(x, w) for x in cur] + [w, w]
    return out


def _read_mode(bits: _Bits):
    """Read one T.6 mode codeword: returns 'pass', 'horiz', or the
    vertical offset int in [-3, 3]."""
    # codes: 1=V0; 011=VR1; 010=VL1; 001=H; 0001=P; 000011=VR2;
    # 000010=VL2; 0000011=VR3; 0000010=VL3
    if bits.read():
        return 0
    if bits.read():  # 01x
        return 1 if bits.read() else -1
    if bits.read():  # 001
        return "horiz"
    if bits.read():  # 0001
        return "pass"
    if bits.read():  # 00001x
        return 2 if bits.read() else -2
    if bits.read():  # 000001x
        return 3 if bits.read() else -3
    raise ValueError("G4: unexpected mode code (EOL/extension inside image)")
