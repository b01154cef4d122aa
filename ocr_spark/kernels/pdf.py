"""Pure-stdlib PDF container codec: build + parse, text-first.

The reference's front door is an actual PDF opened with fitz and
rasterized per page (scripts/ExtractX_OCR.py:240-288). This sandbox has
no PyMuPDF, so — same discipline as kernels/png.py — the container gets
a real stdlib implementation instead of a stub:

- ``build_pdf(pages)``: deterministic classic-xref PDF 1.4 writer, one
  FlateDecode content stream per page, one ``Tj`` per text line;
  ``build_pdf_modern(pages)``: the PDF 1.5 layout — page tree inside a
  compressed OBJECT STREAM, indexed by a CROSS-REFERENCE STREAM with
  PNG-predictor rows. Fixture generators for tests and contract queries
  (no external data).
- ``extract_pages(data)``: classic xref tables AND 1.5+ xref streams
  (/W widths, /Index subsections, /Prev chains, PNG Up/Sub predictors
  reversed with the kernels/png.py scanline machinery), object-stream
  (/ObjStm) resident objects, fallback object scan for damaged files,
  page-tree walk in /Kids order (inherited attributes not needed for
  text), FlateDecode content streams, BT/ET text runs with Tj / TJ /
  ' / " operators. Returns one text string per page, lines joined with
  "\\n" in operator order.
- ``page_count(data)``: page-tree leaf count without touching content
  streams.

Not a renderer: encrypted PDFs and non-Flate filters raise. The
reference's own fixtures (data/input/daat12221.pdf, "grid data.pdf" —
classic xref, 1 page each) parse for page count/tree; their content is
rasterized scans, which is exactly what the image branch
(kernels/png.py, kernels/jpeg.py) is for.
"""

from __future__ import annotations

import re
import zlib

# ---------------------------------------------------------------------------
# object model: python values; names as Name('X'), refs as Ref(n, g)
# ---------------------------------------------------------------------------


class Name(str):
    """A PDF name token (/X) — distinct from a string literal."""


class Ref(tuple):
    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d = self.data
        while self.pos < len(d):
            c = d[self.pos : self.pos + 1]
            if c in b"%":  # comment to EOL
                while self.pos < len(d) and d[self.pos] not in b"\r\n":
                    self.pos += 1
            elif c in _WS:
                self.pos += 1
            else:
                return

    def parse(self):
        """Parse one object at pos (dict/array/name/number/string/bool/
        null/ref)."""
        self._skip_ws()
        d = self.data
        c = d[self.pos : self.pos + 1]
        if c == b"<":
            if d[self.pos : self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if c == b"(":
            return self._literal_string()
        if c == b"[":
            return self._array()
        if c == b"/":
            return self._name()
        if c in b"+-.0123456789":
            return self._number_or_ref()
        m = re.match(rb"(true|false|null)", d[self.pos :])
        if m:
            self.pos += len(m.group(1))
            return {b"true": True, b"false": False, b"null": None}[m.group(1)]
        raise ValueError(f"PDF parse error at {self.pos}: {c!r}")

    def _dict(self) -> dict:
        self.pos += 2
        out: dict[str, object] = {}
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self._name()
            out[str(key)] = self.parse()

    def _array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 1] == b"]":
                self.pos += 1
                return out
            out.append(self.parse())

    def _name(self) -> Name:
        assert self.data[self.pos : self.pos + 1] == b"/"
        self.pos += 1
        start = self.pos
        d = self.data
        while self.pos < len(d) and d[self.pos : self.pos + 1] not in _WS + _DELIM:
            self.pos += 1
        raw = d[start : self.pos]
        # #xx hex escapes in names
        raw = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw)
        return Name(raw.decode("latin-1"))

    def _number_or_ref(self):
        d = self.data
        # trailing-dot reals ("612.") are legal PDF numbers
        m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", d[self.pos :])
        if m is None:
            raise ValueError(f"PDF malformed number at {self.pos}")
        tok = m.group(0)
        end = self.pos + len(tok)
        # lookahead for "gen R" → indirect reference
        m2 = re.match(rb"\s+(\d+)\s+R(?![A-Za-z0-9])", d[end:])
        if m2 and b"." not in tok:
            self.pos = end + m2.end()
            return Ref(int(tok), int(m2.group(1)))
        self.pos = end
        return float(tok) if b"." in tok else int(tok)

    def _literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while self.pos < len(d):
            ch = d[self.pos]
            self.pos += 1
            if ch == 0x5C:  # backslash
                e = d[self.pos]
                self.pos += 1
                esc = {0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}
                if e in esc:
                    out.append(esc[e])
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_s = chr(e)
                    for _ in range(2):
                        if 0x30 <= d[self.pos] <= 0x37:
                            oct_s += chr(d[self.pos])
                            self.pos += 1
                        else:
                            break
                    out.append(int(oct_s, 8) & 0xFF)
                elif e in (0x0A, 0x0D):  # line continuation
                    if e == 0x0D and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)
            elif ch == 0x28:
                depth += 1
                out.append(ch)
            elif ch == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(ch)
            else:
                out.append(ch)
        raise ValueError("PDF unterminated string")

    def _hex_string(self) -> bytes:
        end = self.data.index(b">", self.pos)
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", self.data[self.pos + 1 : end])
        self.pos = end + 1
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode())


# ---------------------------------------------------------------------------
# document structure
# ---------------------------------------------------------------------------


class PdfDoc:
    def __init__(self, data: bytes):
        self.data = data
        self.offsets: dict[int, int] = {}
        self.compressed: dict[int, tuple[int, int]] = {}  # num -> (objstm, idx)
        self._freed: set[int] = set()  # claimed-free: older sections can't revive
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict] = {}
        try:
            self._read_xref_chain()
        except Exception:
            self.offsets = {}
            self.compressed = {}
            self._freed = set()
        if (not self.offsets and not self.compressed) or "Root" not in self.trailer:
            self._scan_objects()  # repair mode for damaged files

    # -- xref ---------------------------------------------------------------

    def _read_xref_chain(self) -> None:
        m = re.search(rb"startxref\s+(\d+)\s*%%EOF\s*$", self.data[-256:], re.S)
        if not m:
            raise ValueError("PDF missing startxref")
        pos = int(m.group(1))
        seen = set()
        while pos not in seen:
            seen.add(pos)
            if not self.data[pos : pos + 4] == b"xref":
                # PDF 1.5+ cross-reference STREAM at this offset
                tr = self._load_xref_stream(pos)
                for k, v in tr.items():
                    self.trailer.setdefault(k, v)
                prev = tr.get("Prev")
                if prev is None:
                    return
                pos = int(self.resolve(prev))
                continue
            lex = _Lexer(self.data, pos + 4)
            pending: list[tuple[int, int, bytes]] = []
            while True:
                lex._skip_ws()
                m2 = re.match(rb"(\d+)\s+(\d+)", self.data[lex.pos :])
                if not m2:
                    break
                start, count = int(m2.group(1)), int(m2.group(2))
                lex.pos += m2.end()
                lex._skip_ws()
                for i in range(count):
                    entry = self.data[lex.pos : lex.pos + 20]
                    pending.append((start + i, int(entry[0:10]), entry[17:18]))
                    lex.pos += 20
            lex._skip_ws()
            if self.data[lex.pos : lex.pos + 7] != b"trailer":
                raise ValueError("PDF xref missing trailer")
            lex.pos += 7
            tr = lex.parse()
            # hybrid-reference files (§7.5.8.4): the classic table lists
            # ObjStm-resident objects as FREE and hides their real
            # entries in the /XRefStm stream — which therefore claims
            # its numbers BEFORE this section's entries apply
            xrefstm = tr.get("XRefStm")
            if xrefstm is not None:
                self._load_xref_stream(int(self.resolve(xrefstm)))
            for num, off, typ in pending:
                if self._claimed(num):
                    continue  # newest section (or its XRefStm) wins
                if typ == b"n":
                    self.offsets[num] = off
                else:  # free: claims the number so an OLDER section
                    self._freed.add(num)  # cannot resurrect the object
            for k, v in tr.items():
                self.trailer.setdefault(k, v)
            prev = tr.get("Prev")
            if prev is None:
                return
            pos = int(prev)

    def _claimed(self, num: int) -> bool:
        return num in self.offsets or num in self.compressed or num in self._freed

    def _parse_object_at(self, off: int):
        """Parse the ``N G obj`` at a byte offset (dict/stream)."""
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.data[off : off + 64])
        if m is None:
            raise ValueError(f"PDF no object at offset {off}")
        lex = _Lexer(self.data, off + m.end())
        obj = lex.parse()
        lex._skip_ws()
        if self.data[lex.pos : lex.pos + 6] == b"stream":
            p = lex.pos + 6
            if self.data[p : p + 2] == b"\r\n":
                p += 2
            elif self.data[p : p + 1] == b"\n":
                p += 1
            length = self.resolve(obj.get("Length"))
            raw = self.data[p : p + int(length)]
            obj = ("stream", obj, raw)
        return obj

    def _decode_stream(self, sdict: dict, raw: bytes) -> bytes:
        """Stream payload → bytes: FlateDecode (or none) plus the PNG
        predictors xref streams commonly use (/DecodeParms /Predictor
        ≥ 10: per-row filter byte over /Columns, reversed with the PNG
        scanline machinery from kernels/png.py)."""
        filt = self.resolve(sdict.get("Filter"))
        if filt is None:
            out = raw
        elif str(filt) == "FlateDecode" or (
            isinstance(filt, list) and [str(f) for f in filt] == ["FlateDecode"]
        ):
            out = zlib.decompress(raw)
        else:
            raise NotImplementedError(f"PDF stream filter {filt} unsupported")
        parms = self.resolve(sdict.get("DecodeParms"))
        if isinstance(parms, dict):
            pred = int(self.resolve(parms.get("Predictor", 1)))
            if pred >= 10:  # PNG predictors
                from ocr_spark.kernels.png import _unfilter

                columns = int(self.resolve(parms.get("Columns", 1)))
                colors = int(self.resolve(parms.get("Colors", 1)))
                bpc = int(self.resolve(parms.get("BitsPerComponent", 8)))
                # /Columns counts SAMPLES per row; the filter's pixel
                # byte offset is colors·bpc/8 (Sub/Paeth reconstruct
                # wrong bytes with bpp=1 when Colors > 1)
                row_bytes = (columns * colors * bpc + 7) // 8
                bpp = max(1, colors * bpc // 8)
                if len(out) % (row_bytes + 1):
                    raise ValueError(
                        "PDF predictor stream truncated (partial row)"
                    )
                rows = len(out) // (row_bytes + 1)
                out = _unfilter(out, rows, row_bytes, bpp).tobytes()
            elif pred != 1:
                raise NotImplementedError(f"PDF predictor {pred} unsupported")
        return out

    def _load_xref_stream(self, pos: int) -> dict:
        """Cross-reference STREAM (PDF 1.5+, §7.5.8): /W field widths,
        /Index subsections; entry type 1 = regular offset, type 2 =
        (object stream number, index within it). Returns the trailer
        dict (the xref stream's own dictionary)."""
        obj = self._parse_object_at(pos)
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError("PDF xref offset points at a non-stream object")
        _tag, d, raw = obj
        if str(self.resolve(d.get("Type", ""))) != "XRef":
            raise ValueError("PDF xref stream missing /Type /XRef")
        data = self._decode_stream(d, raw)
        w = [int(self.resolve(x)) for x in self.resolve(d["W"])]
        size = int(self.resolve(d["Size"]))
        index = [int(self.resolve(x)) for x in self.resolve(d.get("Index", [0, size]))]
        rowlen = sum(w)
        p = 0
        for start, count in zip(index[::2], index[1::2]):
            for i in range(count):
                row = data[p : p + rowlen]
                p += rowlen
                fields = []
                o = 0
                for width in w:
                    fields.append(
                        int.from_bytes(row[o : o + width], "big") if width else None
                    )
                    o += width
                typ = fields[0] if w[0] else 1  # omitted type defaults to 1
                num = start + i
                if self._claimed(num):
                    continue  # first (newest) xref section wins
                if typ == 1:
                    self.offsets[num] = fields[1]
                elif typ == 2:
                    self.compressed[num] = (fields[1], fields[2])
                else:  # type 0 free: claim, so older sections can't
                    self._freed.add(num)  # resurrect a deleted object
        return d

    def _load_objstm(self, stm_num: int) -> dict:
        """Object stream (§7.5.7): header of N (num, offset) integer
        pairs, then the serialized objects at /First + offset."""
        if stm_num in self._objstm_cache:
            return self._objstm_cache[stm_num]
        obj = self.get_object(stm_num)
        if not (isinstance(obj, tuple) and obj[0] == "stream"):
            raise ValueError(f"PDF object stream {stm_num} is not a stream")
        _tag, d, raw = obj
        data = self._decode_stream(d, raw)
        n = int(self.resolve(d["N"]))
        first = int(self.resolve(d["First"]))
        lex = _Lexer(data, 0)
        pairs = []
        for _ in range(n):
            num = lex.parse()
            off = lex.parse()
            pairs.append((int(num), int(off)))
        out = {}
        for num, off in pairs:
            out[num] = _Lexer(data, first + off).parse()
        self._objstm_cache[stm_num] = out
        return out

    def _scan_objects(self) -> None:
        """Repair/fallback: index every `N G obj` in the file (later
        occurrences win — incremental updates append)."""
        for m in re.finditer(rb"(?m)^\s*(\d+)\s+\d+\s+obj\b", self.data):
            self.offsets[int(m.group(1))] = m.start()
        if "Root" not in self.trailer:
            m = re.search(rb"/Root\s+(\d+)\s+(\d+)\s+R", self.data)
            if m:
                self.trailer["Root"] = Ref(int(m.group(1)), int(m.group(2)))
        if "Root" not in self.trailer:
            raise ValueError("PDF has no /Root")

    # -- objects ------------------------------------------------------------

    def resolve(self, v):
        while isinstance(v, Ref):
            v = self.get_object(v[0])
        return v

    def get_object(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.offsets.get(num)
        if off is None:
            loc = self.compressed.get(num)
            if loc is None:
                return None
            obj = self._load_objstm(loc[0]).get(num)
            self._cache[num] = obj
            return obj
        obj = self._parse_object_at(off)
        self._cache[num] = obj
        return obj

    # -- pages --------------------------------------------------------------

    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer["Root"])
        tree = self.resolve(root["Pages"])
        out: list[dict] = []

        def walk(node) -> None:
            node = self.resolve(node)
            t = str(node.get("Type", ""))
            if t == "Page":
                out.append(node)
                return
            for kid in self.resolve(node.get("Kids", [])):
                walk(kid)

        walk(tree)
        return out

    def content_bytes(self, page: dict) -> bytes:
        cont = self.resolve(page.get("Contents"))
        parts = []
        items = cont if isinstance(cont, list) else [cont]
        for item in items:
            obj = self.resolve(item)
            if obj is None:
                continue
            if not (isinstance(obj, tuple) and obj[0] == "stream"):
                raise ValueError("PDF /Contents is not a stream")
            _tag, sdict, raw = obj
            parts.append(self._decode_stream(sdict, raw))
        return b"\n".join(parts)


# ---------------------------------------------------------------------------
# text extraction from content streams
# ---------------------------------------------------------------------------

_OP_RE = re.compile(rb"[A-Za-z'\"*]{1,3}")
_NUM_RE = re.compile(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)")
_NAME_RE = re.compile(rb"/[^\s()<>\[\]{}/%]*")


def _decode_text_string(raw: bytes, from_hex: bool) -> str:
    # UTF-16BE-with-BOM convention applies to HEX strings (what build_pdf
    # emits for non-latin-1 text); literal strings decode byte-for-byte
    # so arbitrary latin-1 content — including text that happens to start
    # with þÿ — round-trips exactly
    if from_hex and raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


def _cs_tokens(content: bytes):
    """Position-based content-stream tokenizer: yields ("str", text),
    ("[",), ("]",), ("op", bytes) — names/numbers yield ("operand",).
    Literal strings go through the full object lexer, so NESTED
    parentheses and every escape decode correctly (a regex cannot match
    balanced nesting); << >> property-list dicts (BDC/DP) are consumed
    whole via the object parser."""
    n = len(content)
    pos = 0
    while pos < n:
        c = content[pos : pos + 1]
        if c in _WS:
            pos += 1
        elif c == b"%":  # comment to EOL
            while pos < n and content[pos] not in b"\r\n":
                pos += 1
        elif c == b"(":
            lex = _Lexer(content, pos)
            raw = lex._literal_string()
            pos = lex.pos
            yield ("str", _decode_text_string(raw, from_hex=False))
        elif c == b"<":
            if content[pos : pos + 2] == b"<<":
                lex = _Lexer(content, pos)
                try:
                    lex.parse()  # swallow the inline dict
                    pos = lex.pos
                except Exception:
                    pos += 2
                yield ("operand",)
            else:
                end = content.find(b">", pos)
                if end < 0:
                    return
                hx = re.sub(rb"[^0-9A-Fa-f]", b"", content[pos + 1 : end])
                if len(hx) % 2:
                    hx += b"0"
                pos = end + 1
                yield ("str", _decode_text_string(bytes.fromhex(hx.decode()), from_hex=True))
        elif c == b"[":
            pos += 1
            yield ("[",)
        elif c == b"]":
            pos += 1
            yield ("]",)
        elif c == b"/":
            m = _NAME_RE.match(content, pos)
            pos = m.end()
            yield ("operand",)
        elif c in b"+-.0123456789":
            m = _NUM_RE.match(content, pos)
            if m is None:
                pos += 1
                continue
            pos = m.end()
            yield ("operand",)
        else:
            m = _OP_RE.match(content, pos)
            if m is None:
                pos += 1  # unknown byte: skip (inline-image data etc.)
                continue
            pos = m.end()
            yield ("op", m.group(0))


def extract_text_ops(content: bytes) -> list[str]:
    """Text runs from a content stream in operator order: Tj / ' / "
    emit their string; TJ emits its array's strings concatenated
    (kerning numbers ignored). One list element per show operator."""
    out: list[str] = []
    last_str: str | None = None  # most recent string operand
    cur_array: list[str] | None = None  # strings collected between [ ]
    pending_array: list[str] | None = None  # closed, awaiting operator
    for tok in _cs_tokens(content):
        kind = tok[0]
        if kind == "[":
            cur_array = []
        elif kind == "]":
            pending_array, cur_array = cur_array, None
        elif kind == "str":
            if cur_array is not None:
                cur_array.append(tok[1])
            else:
                last_str = tok[1]
        elif kind == "op":
            op = tok[1]
            if op in (b"Tj", b"'", b'"'):
                if last_str is not None:
                    out.append(last_str)
            elif op == b"TJ" and pending_array is not None:
                out.append("".join(pending_array))
            # every operator consumes its operands (incl. a closed array
            # used by e.g. `[2 1] 0 d` dash patterns)
            last_str = None
            pending_array = None
        # "operand" tokens (names/numbers/dicts) don't disturb strings
    return out


def extract_pages(data: bytes) -> list[str]:
    """PDF bytes → one text string per page (Tj/TJ runs joined with
    newlines, page-tree order)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (no %PDF header)")
    doc = PdfDoc(data)
    out = []
    for page in doc.pages():
        out.append("\n".join(extract_text_ops(doc.content_bytes(page))))
    return out


def page_count(data: bytes) -> int:
    """Page-tree leaf count — no content streams touched."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (no %PDF header)")
    return len(PdfDoc(data).pages())


# ---------------------------------------------------------------------------
# writer (deterministic fixture generator)
# ---------------------------------------------------------------------------


def _pdf_string_token(s: str) -> bytes:
    """Literal string for latin-1 text; UTF-16BE-with-BOM hex string
    otherwise (the PDF text-string convention) — either way the parser
    recovers the exact Python string."""
    try:
        b = s.encode("latin-1")
    except UnicodeEncodeError:
        return b"<FEFF" + s.encode("utf-16-be").hex().upper().encode() + b">"
    b = (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
        .replace(b"\r", b"\\r").replace(b"\n", b"\\n")
    )
    return b"(" + b + b")"


def build_pdf(pages: list[str]) -> bytes:
    """Deterministic classic-xref PDF: one page per input string, each
    line a ``Tj`` at 14pt leading (Helvetica; non-latin-1 lines as
    UTF-16BE hex strings). Round-trips exactly through
    ``extract_pages``."""
    objs: list[bytes] = []  # 1-based object bodies

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<</Type/Catalog/Pages 2 0 R>>")  # 1
    objs.append(
        f"<</Type/Pages/Count {n_pages}/Kids[{kids}]>>".encode()
    )  # 2
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            (
                f"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
                f"/Resources<</Font<</F1 {font_num} 0 R>>>>"
                f"/Contents {content_num} 0 R>>"
            ).encode()
        )
        lines = text.split("\n")
        body = bytearray(b"BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
        for j, line in enumerate(lines):
            if j:
                body += b"T*\n"  # next line (leading)
            body += _pdf_string_token(line) + b" Tj\n"
        body += b"ET"
        z = zlib.compress(bytes(body))
        objs.append(
            f"<</Length {len(z)}/Filter/FlateDecode>>\nstream\n".encode()
            + z
            + b"\nendstream"
        )
    objs.append(b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>")  # font

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<</Size {len(objs) + 1}/Root 1 0 R>>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf_modern(pages: list[str]) -> bytes:
    """PDF 1.5-style writer: the page tree (catalog, pages node, page
    dicts, font) lives in a compressed OBJECT STREAM and the file is
    indexed by a CROSS-REFERENCE STREAM with PNG Up-predictor rows —
    the layout every modern producer emits. Content streams stay
    regular objects (streams may not live inside object streams).
    Round-trips exactly through ``extract_pages``; repair-mode scanning
    alone CANNOT parse it (the page tree has no `N G obj` headers), so
    tests on this writer prove the xref-stream + ObjStm path."""
    np_ = len(pages)
    content_num = list(range(1, np_ + 1))
    objstm_num = np_ + 1
    xref_num = np_ + 2
    catalog_num = np_ + 3
    pagesnode_num = np_ + 4
    page_nums = [np_ + 5 + i for i in range(np_)]
    font_num = np_ + 5 + np_

    # compressed (ObjStm-resident) objects
    kids = " ".join(f"{n} 0 R" for n in page_nums)
    compressed: list[tuple[int, bytes]] = [
        (catalog_num, f"<</Type/Catalog/Pages {pagesnode_num} 0 R>>".encode()),
        (pagesnode_num, f"<</Type/Pages/Count {np_}/Kids[{kids}]>>".encode()),
    ]
    for i in range(np_):
        compressed.append(
            (
                page_nums[i],
                (
                    f"<</Type/Page/Parent {pagesnode_num} 0 R"
                    f"/MediaBox[0 0 612 792]"
                    f"/Resources<</Font<</F1 {font_num} 0 R>>>>"
                    f"/Contents {content_num[i]} 0 R>>"
                ).encode(),
            )
        )
    compressed.append(
        (font_num, b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>")
    )
    header = " ".join(f"{n} {off}" for n, off in _objstm_offsets(compressed)).encode()
    body = b" ".join(b for _n, b in compressed)
    objstm_payload = header + b"\n" + body
    first = len(header) + 1
    objstm_z = zlib.compress(objstm_payload)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    for i, text in enumerate(pages):
        lines = text.split("\n")
        cbody = bytearray(b"BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
        for j, line in enumerate(lines):
            if j:
                cbody += b"T*\n"
            cbody += _pdf_string_token(line) + b" Tj\n"
        cbody += b"ET"
        z = zlib.compress(bytes(cbody))
        offsets[content_num[i]] = len(out)
        out += (
            f"{content_num[i]} 0 obj\n<</Length {len(z)}/Filter/FlateDecode>>\n"
            "stream\n".encode()
            + z
            + b"\nendstream\nendobj\n"
        )
    offsets[objstm_num] = len(out)
    out += (
        f"{objstm_num} 0 obj\n<</Type/ObjStm/N {len(compressed)}/First {first}"
        f"/Length {len(objstm_z)}/Filter/FlateDecode>>\nstream\n".encode()
        + objstm_z
        + b"\nendstream\nendobj\n"
    )

    # xref stream: W=[1,4,2]; rows for objects 0..font_num
    xref_pos = len(out)
    offsets[xref_num] = xref_pos
    size = font_num + 1
    rows = []
    comp_index = {n: i for i, (n, _b) in enumerate(compressed)}
    for num in range(size):
        if num == 0:
            rows.append(bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big"))
        elif num in offsets:
            rows.append(bytes([1]) + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big"))
        else:
            rows.append(
                bytes([2])
                + objstm_num.to_bytes(4, "big")
                + comp_index[num].to_bytes(2, "big")
            )
    # PNG Up predictor (type 2) over 7-byte columns
    cols = 7
    pred_rows = bytearray()
    prev = bytes(cols)
    for row in rows:
        pred_rows += b"\x02" + bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
        prev = row
    xref_z = zlib.compress(bytes(pred_rows))
    out += (
        f"{xref_num} 0 obj\n<</Type/XRef/Size {size}/W[1 4 2]"
        f"/Root {catalog_num} 0 R"
        f"/DecodeParms<</Predictor 12/Columns {cols}>>"
        f"/Length {len(xref_z)}/Filter/FlateDecode>>\nstream\n".encode()
        + xref_z
        + b"\nendstream\nendobj\n"
    )
    out += f"startxref\n{xref_pos}\n%%EOF\n".encode()
    return bytes(out)


def _objstm_offsets(compressed: list[tuple[int, bytes]]) -> list[tuple[int, int]]:
    """(num, offset-within-body) pairs for an object stream whose bodies
    are space-joined."""
    out = []
    off = 0
    for num, body in compressed:
        out.append((num, off))
        off += len(body) + 1  # the joining space
    return out
