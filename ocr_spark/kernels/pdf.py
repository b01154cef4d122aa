"""Pure-stdlib PDF container codec: build + parse, text-first.

The reference's front door is an actual PDF opened with fitz and
rasterized per page (scripts/ExtractX_OCR.py:240-288). This sandbox has
no PyMuPDF, so — same discipline as kernels/png.py — the container gets
a real stdlib implementation instead of a stub:

- ``build_pdf(pages)``: deterministic classic-xref PDF 1.4 writer, one
  FlateDecode content stream per page, one ``Tj`` per text line. The
  fixture generator for tests and contract queries (no external data).
- ``extract_pages(data)``: xref-table parse (incremental updates via
  /Prev chains; fallback object scan for damaged or xref-stream files),
  page-tree walk in /Kids order (inherited attributes not needed for
  text), FlateDecode content streams, BT/ET text runs with Tj / TJ /
  ' / " operators. Returns one text string per page, lines joined with
  "\\n" in operator order.
- ``page_count(data)``: page-tree leaf count without touching content
  streams.

Not a renderer: encrypted PDFs, object streams (compressed xref), and
non-Flate filters raise. The reference's own fixtures
(data/input/daat12221.pdf, "grid data.pdf" — classic xref, 1 page each)
parse for page count/tree; their content is rasterized scans, which is
exactly what the image branch (kernels/png.py, kernels/jpeg.py) is for.
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
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        try:
            self._read_xref_chain()
        except Exception:
            self.offsets = {}
        if not self.offsets or "Root" not in self.trailer:
            self._scan_objects()  # repair mode: works for xref-stream files too

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
                raise NotImplementedError("PDF xref stream (1.5+) — using object scan")
            lex = _Lexer(self.data, pos + 4)
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
                    off = int(entry[0:10])
                    typ = entry[17:18]
                    num = start + i
                    if typ == b"n" and num not in self.offsets:
                        self.offsets[num] = off
                    lex.pos += 20
            lex._skip_ws()
            if self.data[lex.pos : lex.pos + 7] != b"trailer":
                raise ValueError("PDF xref missing trailer")
            lex.pos += 7
            tr = lex.parse()
            for k, v in tr.items():
                self.trailer.setdefault(k, v)
            prev = tr.get("Prev")
            if prev is None:
                return
            pos = int(prev)

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
            return None
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.data[off : off + 64])
        if not m:
            raise ValueError(f"PDF object {num} not at recorded offset")
        lex = _Lexer(self.data, off + m.end())
        obj = lex.parse()
        # stream?
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
            filt = self.resolve(sdict.get("Filter"))
            if filt is None:
                parts.append(raw)
            elif str(filt) == "FlateDecode" or (
                isinstance(filt, list) and [str(f) for f in filt] == ["FlateDecode"]
            ):
                parts.append(zlib.decompress(raw))
            else:
                raise NotImplementedError(f"PDF stream filter {filt} unsupported")
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
