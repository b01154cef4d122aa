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
  page-tree walk in /Kids order (with /Resources inherited through
  /Parent), FlateDecode content streams, BT/ET text runs with Tj / TJ /
  ' / " operators. Show strings decode through the page's FONTS: Type0
  (composite) fonts split show bytes into 2-byte codes and map them
  through the font's /ToUnicode CMap (``bfchar``/``bfrange``), falling
  back to UTF-16BE code units for Identity-H/V without a CMap; simple
  fonts honor /ToUnicode when present and default to latin-1 — this is
  what turns real-world (Word/Chrome/PDFium, Identity-H subset-font)
  PDFs into readable text instead of NUL-interleaved 2-byte codes.
  Returns one text string per page, lines joined with "\\n" in
  operator order.
- ``page_count(data)``: page-tree leaf count without touching content
  streams.

Not a renderer: non-Flate/DCT stream filters raise. The reference's own
fixtures (data/input/daat12221.pdf, "grid data.pdf" — classic xref,
1 page, Identity-H CID fonts with ToUnicode CMaps) parse for page
count/tree AND text.
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
# standard security handler (PDF 1.7 §7.6.3: RC4 /V 1-2, AESV2 /V 4)
# ---------------------------------------------------------------------------

#: the 32-byte password padding string (PDF 1.7 Table 21 / Algorithm 2a)
_PW_PAD = bytes.fromhex(
    "28BF4E5E4E758A4164004E56FFFA01082E2E00B6D0683E802F0CA9FE6453697A"
)


class _StdSecurity:
    """Empty-user-password standard security handler: derives the file
    key (Algorithm 2) and de/encrypts per-object data — RC4 for
    /V 1-2, AES-128-CBC for /V 4 /CFM /AESV2 (16-byte IV prefix)."""

    def __init__(self, enc: dict, id0: bytes, resolve):
        import hashlib

        if str(resolve(enc.get("Filter", ""))) != "Standard":
            raise NotImplementedError("PDF non-Standard security handler")
        self.v = int(resolve(enc.get("V", 0)))
        self.r = int(resolve(enc.get("R", 2)))
        if self.v not in (1, 2, 4):
            raise NotImplementedError(f"PDF /Encrypt /V {self.v} unsupported")
        length = int(resolve(enc.get("Length", 40)))
        self.n = length // 8 if self.r >= 3 else 5
        self.aes = False
        if self.v == 4:
            cf = resolve(enc.get("CF", {})) or {}
            stdcf = resolve(cf.get("StdCF", {})) or {}
            cfm = str(resolve(stdcf.get("CFM", "")))
            if cfm == "AESV2":
                self.aes = True
                self.n = 16
            elif cfm != "V2":
                raise NotImplementedError(f"PDF crypt filter {cfm} unsupported")
        o = resolve(enc.get("O"))
        p = int(resolve(enc.get("P", -1)))
        if not isinstance(o, bytes) or len(o) < 32:
            raise ValueError("PDF /Encrypt missing /O")
        h = hashlib.md5()
        h.update(_PW_PAD)  # empty user password
        h.update(o[:32])
        h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
        h.update(id0)
        if self.r >= 4 and resolve(enc.get("EncryptMetadata", True)) is False:
            h.update(b"\xff\xff\xff\xff")
        key = h.digest()
        if self.r >= 3:
            for _ in range(50):
                key = hashlib.md5(key[: self.n]).digest()
        self.key = key[: self.n]

    def _obj_key(self, num: int, gen: int) -> bytes:
        import hashlib

        h = hashlib.md5()
        h.update(self.key)
        h.update(num.to_bytes(4, "little")[:3])
        h.update(gen.to_bytes(4, "little")[:2])
        if self.aes:
            h.update(b"sAlT")
        return h.digest()[: min(self.n + 5, 16)]

    def decrypt(self, num: int, gen: int, data: bytes) -> bytes:
        from ocr_spark.kernels.crypto import aes128_cbc_decrypt, rc4

        k = self._obj_key(num, gen)
        if self.aes:
            if len(data) < 16:
                raise ValueError("PDF AES stream shorter than its IV")
            return aes128_cbc_decrypt(k, data[:16], data[16:])
        return rc4(k, data)

    def encrypt(self, num: int, gen: int, data: bytes) -> bytes:
        from ocr_spark.kernels.crypto import aes128_cbc_encrypt, rc4

        k = self._obj_key(num, gen)
        if self.aes:
            iv = bytes(
                (num * 31 + gen * 7 + i * 13 + len(data)) & 0xFF
                for i in range(16)
            )  # deterministic fixture IV — uniqueness, not secrecy
            return iv + aes128_cbc_encrypt(k, iv, data)
        return rc4(k, data)


def _std_security_dicts(aes: bool) -> "tuple[dict, bytes, bytes]":
    """Writer-side /Encrypt pieces for empty owner+user passwords:
    (encrypt dict fields, /O, file key) — Algorithms 3 then 2."""
    import hashlib

    from ocr_spark.kernels.crypto import rc4

    r, n = (4, 16) if aes else (3, 16)
    p = -3904  # print/modify denied — an ordinary permission mask
    # Algorithm 3: /O from the (empty) owner password
    key = hashlib.md5(_PW_PAD).digest()
    for _ in range(50):  # R >= 3
        key = hashlib.md5(key[:n]).digest()
    okey = key[:n]
    o = rc4(okey, _PW_PAD)
    for i in range(1, 20):
        o = rc4(bytes(b ^ i for b in okey), o)
    return ({"R": r, "P": p, "Length": n * 8}, o, b"")


def _std_user_entry(sec: "_StdSecurity", id0: bytes) -> bytes:
    """Algorithm 5 (R >= 3): the /U validation entry."""
    import hashlib

    from ocr_spark.kernels.crypto import rc4

    u = hashlib.md5(_PW_PAD + id0).digest()
    u = rc4(sec.key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in sec.key), u)
    return u + bytes(16)


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
        self._font_cache: dict = {}  # Ref -> decoder
        self._sec: "_StdSecurity | None" = None
        try:
            self._read_xref_chain()
        except Exception:
            self.offsets = {}
            self.compressed = {}
            self._freed = set()
        if (not self.offsets and not self.compressed) or "Root" not in self.trailer:
            self._scan_objects()  # repair mode for damaged files
        self._init_encryption()

    def _init_encryption(self) -> None:
        """Standard-security-handler setup (empty user password). Runs
        AFTER the xref chain so the /Encrypt dict itself — which is
        never encrypted — parses while ``_sec`` is still None."""
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            return
        ids = self.trailer.get("ID")
        id0 = ids[0] if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
        self._sec = _StdSecurity(enc, id0, self.resolve)

    def _decrypt_strings(self, v, num: int, gen: int):
        if isinstance(v, bytes):
            return self._sec.decrypt(num, gen, v)
        if isinstance(v, dict):
            return {k: self._decrypt_strings(x, num, gen) for k, x in v.items()}
        if isinstance(v, list):
            return [self._decrypt_strings(x, num, gen) for x in v]
        return v

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
        """Parse the ``N G obj`` at a byte offset (dict/stream). In an
        encrypted document, stream payloads and string values decrypt
        here with the per-object key (XRef streams excepted — they are
        never encrypted, §7.5.8.2)."""
        m = re.match(rb"\s*(\d+)\s+(\d+)\s+obj", self.data[off : off + 64])
        if m is None:
            raise ValueError(f"PDF no object at offset {off}")
        num, gen = int(m.group(1)), int(m.group(2))
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
            if self._sec is not None and str(obj.get("Type", "")) != "XRef":
                raw = self._sec.decrypt(num, gen, raw)
                obj = self._decrypt_strings(obj, num, gen)
            obj = ("stream", obj, raw)
        elif self._sec is not None:
            obj = self._decrypt_strings(obj, num, gen)
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

    # -- fonts --------------------------------------------------------------

    def page_resources(self, page: dict) -> "dict | None":
        """/Resources, inherited through /Parent (§7.7.3.4) — modern
        producers commonly hoist shared resources to the Pages node."""
        node = page
        for _ in range(64):  # cycle guard
            if node is None or not isinstance(node, dict):
                return None
            res = self.resolve(node.get("Resources"))
            if isinstance(res, dict):
                return res
            node = self.resolve(node.get("Parent"))
        return None

    def page_fonts(self, page: dict) -> dict:
        """Font-name → string-decoder map for a page (see
        ``make_font_decoder``). Unparseable font entries fall back to
        the default latin-1 decoder rather than failing the page."""
        res = self.page_resources(page)
        fonts = self.resolve(res.get("Font")) if isinstance(res, dict) else None
        if not isinstance(fonts, dict):
            return {}
        out = {}
        for name, ref in fonts.items():
            key = ref if isinstance(ref, Ref) else None
            if key is not None and key in self._font_cache:
                out[name] = self._font_cache[key]
                continue
            try:
                dec = self._font_decoder(self.resolve(ref))
            except Exception:
                dec = _decode_text_string
            if key is not None:
                self._font_cache[key] = dec
            out[name] = dec
        return out

    def _font_decoder(self, font):
        if not isinstance(font, dict):
            return _decode_text_string
        subtype = str(self.resolve(font.get("Subtype", "")))
        mapping = None
        code_len = 0
        tu = self.resolve(font.get("ToUnicode"))
        if isinstance(tu, tuple) and tu[0] == "stream":
            code_len, mapping = parse_tounicode(self._decode_stream(tu[1], tu[2]))
        if subtype == "Type0":
            # composite font: 2-byte codes under Identity-H/V (and every
            # CMap a text-generating producer emits for extraction
            # purposes); Identity without ToUnicode ⇒ UTF-16BE bytes
            enc = self.resolve(font.get("Encoding"))
            identity = isinstance(enc, Name) and str(enc).startswith("Identity")
            return make_font_decoder(2, mapping, identity_fallback=identity)
        if mapping is not None:  # simple font (1-byte codes) w/ ToUnicode
            return make_font_decoder(1, mapping, False)
        return _decode_text_string

    # -- image XObjects -----------------------------------------------------

    def page_images(self, page: dict) -> "list[tuple[str, object]]":
        """Decoded /Subtype /Image XObjects on a page as (name, uint8
        ndarray) — the reference's actual use-case is scanned/table PDFs
        whose content lives in page images, not the text layer
        (scripts/ExtractX_OCR.py:263-265 rasterizes and extracts from
        pixels). DCTDecode streams go through kernels/jpeg.py; Flate
        (+PNG predictor) bitmaps through the shared stream decoder with
        /Width /Height /BitsPerComponent /ColorSpace layout. Undecodable
        images are skipped (reference skip-and-continue), not fatal."""
        res = self.page_resources(page)
        xo = self.resolve(res.get("XObject")) if isinstance(res, dict) else None
        out = []
        if not isinstance(xo, dict):
            return out
        for name, ref in xo.items():
            obj = self.resolve(ref)
            if not (isinstance(obj, tuple) and obj[0] == "stream"):
                continue
            d = obj[1]
            if str(self.resolve(d.get("Subtype", ""))) != "Image":
                continue
            try:
                out.append((str(name), self._decode_image_xobject(d, obj[2])))
            except Exception:
                continue
        return out

    def _decode_image_xobject(self, d: dict, raw: bytes):
        import numpy as np

        filt = self.resolve(d.get("Filter"))
        names = [str(f) for f in (filt if isinstance(filt, list) else [filt])] if filt else []
        if "DCTDecode" in names:
            from ocr_spark.kernels.jpeg import decode_jpeg

            if names and names[0] == "FlateDecode":  # Flate-wrapped JPEG
                raw = zlib.decompress(raw)
            arr = decode_jpeg(raw)
            # single-component JPEG → 2-D gray, matching the raw-bitmap path
            return arr[:, :, 0] if arr.ndim == 3 and arr.shape[2] == 1 else arr
        if "CCITTFaxDecode" in names:
            return self._decode_ccitt_image(d, raw, names)
        data = self._decode_stream(d, raw)  # none / Flate (+predictor)
        w = int(self.resolve(d["Width"]))
        h = int(self.resolve(d["Height"]))
        bpc = int(self.resolve(d.get("BitsPerComponent", 8)))
        if bool(self.resolve(d.get("ImageMask", False))):
            bpc = 1
        cs = self.resolve(d.get("ColorSpace"))
        ncomp = 3 if (cs is not None and str(cs) == "DeviceRGB") else 1
        row_bytes = (w * ncomp * bpc + 7) // 8
        if len(data) < row_bytes * h:
            raise ValueError("PDF image stream truncated")
        rows = np.frombuffer(data[: row_bytes * h], dtype=np.uint8).reshape(
            h, row_bytes
        )
        if bpc == 8:
            arr = rows[:, : w * ncomp]
            return arr.reshape(h, w, 3) if ncomp == 3 else arr.reshape(h, w)
        if bpc == 1:
            bits = np.unpackbits(rows, axis=1)[:, : w * ncomp]
            return (bits * 255).astype(np.uint8).reshape(h, w) if ncomp == 1 else (
                (bits * 255).astype(np.uint8).reshape(h, w, 3)
            )
        raise NotImplementedError(f"PDF image BitsPerComponent {bpc}")

    def _decode_ccitt_image(self, d: dict, raw: bytes, names: "list[str]"):
        """/CCITTFaxDecode image → (h, w) uint8 gray. Group 4 (/K < 0,
        the office-scanner default) and Group 3 (/K 0 pure 1-D, /K > 0
        mixed 2-D — fax gateways), ITU-T T.6/T.4 via kernels/ccitt.py."""
        import numpy as np

        from ocr_spark.kernels.ccitt import decode_g3, decode_g4

        if names[0] == "FlateDecode":  # Flate-wrapped CCITT payload
            raw = zlib.decompress(raw)
        # per-filter DecodeParms: an array parallels the /Filter array
        parms = self.resolve(d.get("DecodeParms"))
        if isinstance(parms, list):
            parms = self.resolve(parms[names.index("CCITTFaxDecode")])
        if not isinstance(parms, dict):
            parms = {}
        k = int(self.resolve(parms.get("K", 0)))
        width = int(self.resolve(d.get("Width", 0)))
        height = int(self.resolve(d.get("Height", 0)))
        # /Columns governs the CODED line width (spec default 1728);
        # when absent, the image dict's /Width is the better default —
        # decoding a Width-20 scan at 1728 shifts every run boundary
        columns = int(self.resolve(parms.get("Columns", width or 1728)))
        rows = int(self.resolve(parms.get("Rows", 0))) or height
        if rows <= 0:
            raise ValueError("CCITT image without /Rows or /Height")
        black_is_1 = bool(self.resolve(parms.get("BlackIs1", False)))
        byte_align = bool(self.resolve(parms.get("EncodedByteAlign", False)))
        if k < 0:
            bm = decode_g4(raw, columns, rows, byte_align=byte_align)
        else:
            bm = decode_g3(raw, columns, rows, k=k, byte_align=byte_align)
        # the image dict geometry is authoritative for rendering:
        # crop/pad the decoded bitmap to (Height, Width) — padding is
        # 0 in bm space (no black), i.e. white
        if height > 0 and width > 0 and bm.shape != (height, width):
            fixed = np.zeros((height, width), dtype=bm.dtype)
            h = min(height, bm.shape[0])
            w2 = min(width, bm.shape[1])
            fixed[:h, :w2] = bm[:h, :w2]
            bm = fixed
        # filter-output samples: 0 = black unless /BlackIs1; DeviceGray
        # then maps sample→intensity (0 = black), /Decode [1 0] inverts
        samples = bm if black_is_1 else (1 - bm)
        dec = self.resolve(d.get("Decode"))
        if isinstance(dec, list) and [float(self.resolve(v)) for v in dec] == [1.0, 0.0]:
            samples = 1 - samples
        return (samples * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# ToUnicode CMaps + font decoders (PDF 32000-1 §9.10.3)
# ---------------------------------------------------------------------------


def parse_tounicode(data: bytes) -> "tuple[int, dict[int, str]]":
    """Parse a /ToUnicode CMap stream → (code_byte_length, {code: text}).

    The CMap body is PostScript-flavored, but every payload we need is
    PDF-lexable: hex strings, integers, arrays of hex strings, and the
    bareword section operators ``begincodespacerange`` /
    ``beginbfchar`` / ``beginbfrange``. Destination strings are UTF-16BE
    (possibly multi-unit — ligatures, surrogate pairs). ``bfrange`` with
    a scalar destination increments the destination as a big-endian
    integer of fixed width (the spec's "last byte" increment, which for
    well-formed ranges never carries past it); the array form maps each
    code to its own string."""
    code_len = 0
    mapping: dict[int, str] = {}
    lex = _Lexer(data, 0)
    n = len(data)

    def next_word() -> "bytes | None":
        lex._skip_ws()
        m = re.match(rb"[A-Za-z]+", data[lex.pos :])
        if m:
            lex.pos += m.end()
            return m.group(0)
        return None

    def to_text(dst: bytes) -> str:
        return dst.decode("utf-16-be", errors="replace")

    while lex.pos < n:
        lex._skip_ws()
        if lex.pos >= n:
            break
        c = data[lex.pos : lex.pos + 1]
        if c in b"<([/+-.0123456789":
            try:
                obj = lex.parse()
            except Exception:
                lex.pos += 1
                continue
            continue  # operands outside a section we track — skip
        word = next_word()
        if word is None:
            lex.pos += 1
            continue
        if word == b"begincodespacerange":
            while True:
                lex._skip_ws()
                if data[lex.pos : lex.pos + 1] != b"<":
                    break
                lo = lex.parse()
                hi = lex.parse()
                if isinstance(lo, bytes):
                    code_len = max(code_len, len(lo))
        elif word == b"beginbfchar":
            while True:
                lex._skip_ws()
                if data[lex.pos : lex.pos + 1] != b"<":
                    break
                src = lex.parse()
                dst = lex.parse()
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    code_len = max(code_len, len(src))
                    mapping[int.from_bytes(src, "big")] = to_text(dst)
        elif word == b"beginbfrange":
            while True:
                lex._skip_ws()
                if data[lex.pos : lex.pos + 1] != b"<":
                    break
                lo_b = lex.parse()
                hi_b = lex.parse()
                lex._skip_ws()
                if data[lex.pos : lex.pos + 1] == b"[":
                    dsts = lex.parse()
                else:
                    dsts = lex.parse()
                if not (isinstance(lo_b, bytes) and isinstance(hi_b, bytes)):
                    continue
                code_len = max(code_len, len(lo_b))
                lo, hi = int.from_bytes(lo_b, "big"), int.from_bytes(hi_b, "big")
                if isinstance(dsts, list):
                    for i, d in enumerate(dsts):
                        if lo + i <= hi and isinstance(d, bytes):
                            mapping[lo + i] = to_text(d)
                elif isinstance(dsts, bytes) and dsts:
                    base = int.from_bytes(dsts, "big")
                    width = len(dsts)
                    for i in range(hi - lo + 1):
                        mapping[lo + i] = to_text(
                            (base + i).to_bytes(width, "big")
                        )
    return (code_len or 2, mapping)


def _cid_fallback_char(code: int) -> str:
    """Unmapped 2-byte code under an Identity encoding: the code IS the
    UTF-16 unit for BMP scalars; surrogate halves (which only appear
    unpaired when the CMap is incomplete) degrade to U+FFFD."""
    if 0xD800 <= code <= 0xDFFF:
        return "�"
    return chr(code)


def make_font_decoder(
    code_len: int,
    mapping: "dict[int, str] | None",
    identity_fallback: bool,
):
    """Build a ``(raw: bytes, from_hex: bool) -> str`` decoder.

    - ``code_len == 2`` (composite/Type0): split into big-endian 2-byte
      codes; map through ``mapping`` when given, else — for Identity
      encodings without a ToUnicode CMap — decode the raw bytes as
      UTF-16BE (``identity_fallback``).
    - ``code_len == 1`` (simple font with ToUnicode): per-byte map,
      latin-1 fallback per unmapped byte."""
    if code_len == 2:
        def decode2(raw: bytes, from_hex: bool) -> str:
            if mapping is None:
                if identity_fallback:
                    return raw.decode("utf-16-be", errors="replace")
                return _decode_text_string(raw, from_hex)
            out = []
            even = len(raw) - (len(raw) % 2)
            for i in range(0, even, 2):
                code = (raw[i] << 8) | raw[i + 1]
                got = mapping.get(code)
                out.append(got if got is not None else _cid_fallback_char(code))
            return "".join(out)

        return decode2

    def decode1(raw: bytes, from_hex: bool) -> str:
        if not mapping:
            return _decode_text_string(raw, from_hex)
        return "".join(
            mapping.get(b, bytes([b]).decode("latin-1")) for b in raw
        )

    return decode1


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
    """Position-based content-stream tokenizer: yields
    ("str", raw_bytes, from_hex), ("name", text), ("[",), ("]",),
    ("op", bytes) — numbers/dicts yield ("operand",). Literal strings go
    through the full object lexer, so NESTED parentheses and every
    escape decode correctly (a regex cannot match balanced nesting);
    << >> property-list dicts (BDC/DP) are consumed whole via the object
    parser. String DECODING is deferred to the consumer: which bytes→
    text mapping applies depends on the currently-selected font (Tf)."""
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
            yield ("str", raw, False)
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
                yield ("str", bytes.fromhex(hx.decode()), True)
        elif c == b"[":
            pos += 1
            yield ("[",)
        elif c == b"]":
            pos += 1
            yield ("]",)
        elif c == b"/":
            m = _NAME_RE.match(content, pos)
            pos = m.end()
            yield ("name", content[m.start() + 1 : m.end()].decode("latin-1"))
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


def extract_text_ops(content: bytes, fonts: "dict | None" = None) -> list[str]:
    """Text runs from a content stream in operator order: Tj / ' / "
    emit their string; TJ emits its array's strings concatenated
    (kerning numbers ignored). One list element per show operator.

    ``fonts`` maps font resource names (the /F1 in ``/F1 12 Tf``) to
    ``(raw, from_hex) -> str`` decoders (see ``make_font_decoder``);
    show strings decode through the currently-selected font. Without
    ``fonts`` (or for unknown names) strings decode as latin-1 /
    UTF-16BE-BOM-hex — the classic simple-font behavior."""
    out: list[str] = []
    last_str: "tuple[bytes, bool] | None" = None  # most recent string operand
    last_name: str | None = None  # most recent name operand
    cur_array: "list | None" = None  # raw strings collected between [ ]
    pending_array: "list | None" = None  # closed, awaiting operator
    decoder = _decode_text_string
    for tok in _cs_tokens(content):
        kind = tok[0]
        if kind == "[":
            cur_array = []
        elif kind == "]":
            pending_array, cur_array = cur_array, None
        elif kind == "str":
            if cur_array is not None:
                cur_array.append((tok[1], tok[2]))
            else:
                last_str = (tok[1], tok[2])
        elif kind == "name":
            last_name = tok[1]
        elif kind == "op":
            op = tok[1]
            if op == b"Tf" and fonts is not None and last_name is not None:
                decoder = fonts.get(last_name, _decode_text_string)
            elif op in (b"Tj", b"'", b'"'):
                if last_str is not None:
                    out.append(decoder(*last_str))
            elif op == b"TJ" and pending_array is not None:
                out.append("".join(decoder(*s) for s in pending_array))
            # every operator consumes its operands (incl. a closed array
            # used by e.g. `[2 1] 0 d` dash patterns)
            last_str = None
            last_name = None
            pending_array = None
        # "operand" tokens (numbers/dicts) don't disturb strings
    return out


def extract_pages(data: bytes) -> list[str]:
    """PDF bytes → one text string per page (Tj/TJ runs joined with
    newlines, page-tree order), decoding show strings through each
    page's fonts (ToUnicode CMaps / Identity-H — see module doc)."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (no %PDF header)")
    doc = PdfDoc(data)
    out = []
    for page in doc.pages():
        fonts = doc.page_fonts(page)
        out.append("\n".join(extract_text_ops(doc.content_bytes(page), fonts)))
    return out


def page_count(data: bytes) -> int:
    """Page-tree leaf count — no content streams touched."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (no %PDF header)")
    return len(PdfDoc(data).pages())


def extract_images(data: bytes) -> "list[tuple[int, str, object]]":
    """PDF bytes → [(1-based page_idx, xobject name, uint8 ndarray)] for
    every decodable /Image XObject, page-tree order. The scanned-PDF
    front door: feed the arrays to kernels/grid.read_grid_cells or
    multimodal feature extraction."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (no %PDF header)")
    doc = PdfDoc(data)
    out = []
    for i, page in enumerate(doc.pages()):
        for name, arr in doc.page_images(page):
            out.append((i + 1, name, arr))
    return out


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


def _tounicode_stream(codes: "list[tuple[int, str]]") -> bytes:
    """Standard /ToUnicode CMap body for (code, char) pairs: maximal
    ``bfrange`` runs where code and (single-UTF-16-unit, BMP) char
    advance in lockstep without crossing a low-byte boundary, ``bfchar``
    for the rest (incl. astral chars as surrogate-pair destinations).
    Blocks capped at 100 entries per the spec."""
    singles: list[tuple[int, str]] = []
    ranges: list[tuple[int, int, int]] = []  # (lo_code, hi_code, lo_ord)
    i = 0
    n = len(codes)
    while i < n:
        code, ch = codes[i]
        if len(ch) == 1 and not (0xD800 <= ord(ch) <= 0xDFFF) and ord(ch) <= 0xFFFF:
            j = i
            while (
                j + 1 < n
                and codes[j + 1][0] == codes[j][0] + 1
                and len(codes[j + 1][1]) == 1
                and ord(codes[j + 1][1]) == ord(codes[j][1]) + 1
                and ord(codes[j + 1][1]) <= 0xFFFF
                and codes[j][0] & 0xFF != 0xFF  # don't cross byte boundary
                and ord(codes[j][1]) & 0xFF != 0xFF
            ):
                j += 1
            if j > i:
                ranges.append((codes[i][0], codes[j][0], ord(ch)))
                i = j + 1
                continue
        singles.append((code, ch))
        i += 1

    body = [
        b"/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n"
        b"/CIDSystemInfo <</Registry (Adobe)/Ordering (UCS)/Supplement 0>> def\n"
        b"/CMapName /Adobe-Identity-UCS def\n/CMapType 2 def\n"
        b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    ]
    for k in range(0, len(ranges), 100):
        blk = ranges[k : k + 100]
        body.append(f"{len(blk)} beginbfrange\n".encode())
        for lo, hi, o in blk:
            body.append(f"<{lo:04X}> <{hi:04X}> <{o:04X}>\n".encode())
        body.append(b"endbfrange\n")
    for k in range(0, len(singles), 100):
        blk = singles[k : k + 100]
        body.append(f"{len(blk)} beginbfchar\n".encode())
        for code, ch in blk:
            dst = ch.encode("utf-16-be").hex().upper()
            body.append(f"<{code:04X}> <{dst}>\n".encode())
        body.append(b"endbfchar\n")
    body.append(
        b"endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n"
    )
    return b"".join(body)


def build_pdf_cid(pages: list[str]) -> bytes:
    """Deterministic classic-xref PDF whose text uses a SUBSET-style
    Identity-H composite font: every show string is a hex string of
    2-byte codes assigned in first-seen order (code 1, 2, …) — i.e. the
    codes carry NO relation to Unicode, exactly like the subset fonts
    Word/Chrome/PDFium emit — with a /ToUnicode CMap (bfrange + bfchar)
    as the only road back to text. Round-trips through
    ``extract_pages`` ONLY via the CMap path."""
    code_of: dict[str, int] = {}
    for text in pages:
        for ch in text.replace("\n", ""):
            if ch not in code_of:
                code_of[ch] = len(code_of) + 1
    if len(code_of) > 0xFFFE:
        raise ValueError("CID fixture: too many distinct characters")

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    desc_num = font_num + 1
    tu_num = font_num + 2
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs: list[bytes] = []
    objs.append(b"<</Type/Catalog/Pages 2 0 R>>")  # 1
    objs.append(f"<</Type/Pages/Count {n_pages}/Kids[{kids}]>>".encode())  # 2
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        objs.append(
            (
                f"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
                f"/Resources<</Font<</F1 {font_num} 0 R>>>>"
                f"/Contents {page_num + 1} 0 R>>"
            ).encode()
        )
        body = bytearray(b"BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
        for j, line in enumerate(text.split("\n")):
            if j:
                body += b"T*\n"
            hx = "".join(f"{code_of[ch]:04X}" for ch in line)
            body += b"<" + hx.encode() + b"> Tj\n"
        body += b"ET"
        z = zlib.compress(bytes(body))
        objs.append(
            f"<</Length {len(z)}/Filter/FlateDecode>>\nstream\n".encode()
            + z
            + b"\nendstream"
        )
    objs.append(
        (
            f"<</Type/Font/Subtype/Type0/BaseFont/AAAAAA+Fixture"
            f"/Encoding/Identity-H/DescendantFonts[{desc_num} 0 R]"
            f"/ToUnicode {tu_num} 0 R>>"
        ).encode()
    )
    objs.append(
        b"<</Type/Font/Subtype/CIDFontType2/BaseFont/AAAAAA+Fixture"
        b"/CIDSystemInfo<</Registry(Adobe)/Ordering(Identity)/Supplement 0>>"
        b"/DW 1000>>"
    )
    cmap = zlib.compress(
        _tounicode_stream(sorted((c, ch) for ch, c in code_of.items()))
    )
    objs.append(
        f"<</Length {len(cmap)}/Filter/FlateDecode>>\nstream\n".encode()
        + cmap
        + b"\nendstream"
    )

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


def build_pdf_encrypted(pages: list[str], aes: bool = False) -> bytes:
    """Deterministic ENCRYPTED classic-xref PDF (standard security
    handler, empty user password — the overwhelmingly common "encrypted
    but openable" document class): RC4-128 (/V 2 /R 3) or, with
    ``aes=True``, AES-128-CBC (/V 4 /R 4 /CFM /AESV2). Same page/text
    layout as ``build_pdf``; every content stream is encrypted with its
    per-object key (Algorithm 1), /O and /U computed per Algorithms 3/5.
    Round-trips exactly through ``extract_pages``."""
    import hashlib

    id0 = hashlib.md5(("\x1e".join(pages) + f"|aes={aes}").encode()).digest()
    fields, o, _ = _std_security_dicts(aes)
    enc_dict = {
        "Filter": Name("Standard"),
        "V": 4 if aes else 2,
        "R": fields["R"],
        "O": o,
        "P": fields["P"],
        "Length": fields["Length"],
    }
    if aes:
        enc_dict["CF"] = {"StdCF": {"CFM": Name("AESV2")}}
    sec = _StdSecurity(enc_dict, id0, lambda v: v)
    u = _std_user_entry(sec, id0)

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    enc_num = font_num + 1
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs: list[bytes] = []
    objs.append(b"<</Type/Catalog/Pages 2 0 R>>")  # 1
    objs.append(f"<</Type/Pages/Count {n_pages}/Kids[{kids}]>>".encode())  # 2
    for i, text in enumerate(pages):
        page_num = 3 + 2 * i
        objs.append(
            (
                f"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
                f"/Resources<</Font<</F1 {font_num} 0 R>>>>"
                f"/Contents {page_num + 1} 0 R>>"
            ).encode()
        )
        body = bytearray(b"BT\n/F1 12 Tf\n72 720 Td\n14 TL\n")
        for j, line in enumerate(text.split("\n")):
            if j:
                body += b"T*\n"
            body += _pdf_string_token(line) + b" Tj\n"
        body += b"ET"
        z = sec.encrypt(page_num + 1, 0, zlib.compress(bytes(body)))
        objs.append(
            f"<</Length {len(z)}/Filter/FlateDecode>>\nstream\n".encode()
            + z
            + b"\nendstream"
        )
    objs.append(b"<</Type/Font/Subtype/Type1/BaseFont/Helvetica>>")
    cf = "/CF<</StdCF<</CFM/AESV2/AuthEvent/DocOpen/Length 16>>>>/StmF/StdCF/StrF/StdCF" if aes else ""
    objs.append(
        (
            f"<</Filter/Standard/V {enc_dict['V']}/R {fields['R']}"
            f"/Length {fields['Length']}/P {fields['P']}{cf}"
            f"/O <{o.hex().upper()}>/U <{u.hex().upper()}>>>"
        ).encode()
    )

    out = bytearray(b"%PDF-1.6\n" if aes else b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    idh = id0.hex().upper()
    out += (
        f"trailer\n<</Size {len(objs) + 1}/Root 1 0 R"
        f"/Encrypt {enc_num} 0 R/ID[<{idh}><{idh}>]>>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


def build_pdf_images(
    images: "list[object]",
    jpeg: bool = False,
    quality: int = 90,
    ccitt: bool = False,
    byte_align: bool = False,
    ccitt_k: int = -1,
) -> bytes:
    """Deterministic classic-xref PDF embedding one image XObject per
    page — the scanned-document layout (a page whose only content is a
    ``/Im0 Do``). ``images`` are uint8 ndarrays: 2-D DeviceGray or
    (h, w, 3) DeviceRGB. ``jpeg=True`` stores them DCTDecode via
    kernels/jpeg.encode_jpeg (the daat12221.pdf layout); ``ccitt=True``
    thresholds 2-D images at 128 and stores Group 4 /CCITTFaxDecode
    (the office-scanner layout, kernels/ccitt.py — exact round-trip for
    binary 0/255 inputs); else FlateDecode raw samples. Round-trips
    through ``extract_images`` (exactly for Flate/CCITT; JPEG to codec
    tolerance)."""
    import numpy as np

    objs: list[bytes] = []
    n_pages = len(images)
    kids = " ".join(f"{3 + 3 * i} 0 R" for i in range(n_pages))
    objs.append(b"<</Type/Catalog/Pages 2 0 R>>")  # 1
    objs.append(f"<</Type/Pages/Count {n_pages}/Kids[{kids}]>>".encode())  # 2
    for i, img in enumerate(images):
        arr = np.asarray(img, dtype=np.uint8)
        h, w = arr.shape[:2]
        rgb = arr.ndim == 3
        page_num = 3 + 3 * i
        objs.append(
            (
                f"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
                f"/Resources<</XObject<</Im0 {page_num + 2} 0 R>>>>"
                f"/Contents {page_num + 1} 0 R>>"
            ).encode()
        )
        content = f"q\n{w} 0 0 {h} 72 {720 - h} cm\n/Im0 Do\nQ".encode()
        zc = zlib.compress(content)
        objs.append(
            f"<</Length {len(zc)}/Filter/FlateDecode>>\nstream\n".encode()
            + zc
            + b"\nendstream"
        )
        bpc = 8
        if ccitt and rgb:
            raise ValueError(
                "ccitt=True requires 2-D grayscale inputs (CCITT is a "
                "bilevel codec); got an RGB array"
            )
        if ccitt and not rgb:
            from ocr_spark.kernels.ccitt import encode_g3, encode_g4

            if ccitt_k < 0:
                payload = encode_g4(arr < 128, byte_align=byte_align)
            else:
                # G3: classic fax EOL framing for mixed 2-D (K>0),
                # bare MH rows for pure 1-D (K=0)
                payload = encode_g3(
                    arr < 128,
                    k=ccitt_k,
                    byte_align=byte_align,
                    end_of_line=ccitt_k > 0,
                )
            ba = "true" if byte_align else "false"
            filt = (
                f"/Filter/CCITTFaxDecode/DecodeParms<</K {ccitt_k}/Columns {w}"
                f"/Rows {h}/BlackIs1 false/EncodedByteAlign {ba}>>"
            )
            bpc = 1
        elif jpeg:
            from ocr_spark.kernels.jpeg import encode_jpeg

            payload = encode_jpeg(arr, quality=quality)
            filt = "/Filter/DCTDecode"
        else:
            payload = zlib.compress(arr.tobytes())
            filt = "/Filter/FlateDecode"
        cspace = "/DeviceRGB" if rgb else "/DeviceGray"
        objs.append(
            (
                f"<</Type/XObject/Subtype/Image/Width {w}/Height {h}"
                f"/ColorSpace{cspace}/BitsPerComponent {bpc}{filt}"
                f"/Length {len(payload)}>>\nstream\n"
            ).encode()
            + payload
            + b"\nendstream"
        )

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
