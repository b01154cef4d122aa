"""Minimal WARC/1.0 reader + writer (ISO 28500 — the Common Crawl
interchange format).

A web-scale pretraining corpus arrives as WARC: gzip members, one per
record, each record a block of ``WARC-*`` headers framed by
``Content-Length`` and followed by the captured HTTP exchange. This
kernel implements the subset a training-data pipeline needs —
``warcinfo`` + ``response`` records, per-record gzip members (the
Common Crawl layout: members are individually seekable so a record
offset index works), and HTTP response parsing — from the public spec
only, pure stdlib.

The writer is deterministic (fixed WARC-Date, record ids derived from
the caller's keys) so fixtures and the DuckDB contract oracle can
replay extraction results exactly; the reader makes no assumption the
writer produced its input (header case-insensitivity, \\r\\n or \\n
tolerant header split, multi-member and uncompressed streams).
"""

from __future__ import annotations

import gzip
import io
import zlib
from dataclasses import dataclass, field

#: Deterministic capture date used by the fixture writer.
WARC_DATE = "2026-01-01T00:00:00Z"

_CRLF = b"\r\n"


@dataclass
class WarcRecord:
    """One parsed WARC record (HTTP fields populated for responses)."""

    type: str
    headers: dict[str, str]
    block: bytes
    uri: str | None = None
    record_id: str | None = None
    http_status: int | None = None
    http_headers: dict[str, str] = field(default_factory=dict)
    body: bytes = b""


def _record_id(key: int, kind: int = 0) -> str:
    """Deterministic RFC-4122-shaped record id; ``kind`` keeps the
    warcinfo record's id distinct from response key 0."""
    return (
        f"<urn:uuid:0000000{kind:01x}-0000-4000-8000-"
        f"{key & 0xFFFFFFFFFFFF:012x}>"
    )


def build_response_record(uri: str, body: bytes, key: int,
                          content_type: str = "text/plain; charset=utf-8") -> bytes:
    """One uncompressed ``response`` record capturing an HTTP 200."""
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: " + content_type.encode("ascii") + _CRLF
        + b"Content-Length: " + str(len(body)).encode("ascii") + _CRLF
        + _CRLF + body
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: " + _record_id(key).encode("ascii") + _CRLF
        + b"WARC-Date: " + WARC_DATE.encode("ascii") + _CRLF
        + b"WARC-Target-URI: " + uri.encode("ascii") + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode("ascii") + _CRLF
        + _CRLF
    )
    return head + http + _CRLF + _CRLF


def build_warcinfo_record(filename: str = "ocr_spark.warc.gz") -> bytes:
    body = (
        b"software: ocr_spark" + _CRLF
        + b"format: WARC File Format 1.0" + _CRLF
    )
    head = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"WARC-Record-ID: " + _record_id(0, kind=1).encode("ascii") + _CRLF
        + b"WARC-Date: " + WARC_DATE.encode("ascii") + _CRLF
        + b"WARC-Filename: " + filename.encode("ascii") + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + b"Content-Length: " + str(len(body)).encode("ascii") + _CRLF
        + _CRLF
    )
    return head + body + _CRLF + _CRLF


def _gzip_member(record: bytes) -> bytes:
    # mtime=0 for byte-deterministic output
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(record)
    return buf.getvalue()


def build_warc(
    records: "list[tuple[int, str, bytes]]", compress: bool = True
) -> bytes:
    """Assemble a WARC file: warcinfo first, then one ``response``
    record per (key, uri, body). ``compress=True`` writes the Common
    Crawl layout — every record its own gzip member."""
    parts = [build_warcinfo_record()]
    parts += [build_response_record(uri, body, key) for key, uri, body in records]
    if compress:
        return b"".join(_gzip_member(p) for p in parts)
    return b"".join(parts)


def _gunzip_members(data: bytes) -> bytes:
    out = []
    while data:
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break  # corrupt member region — keep what decoded
        if not d.eof:  # truncated final member — keep complete ones
            break
        data = d.unused_data
    return b"".join(out)


def _find_blank_line(buf: bytes, start: int = 0) -> "tuple[int, int]":
    """(offset, separator length) of the earliest header-terminating
    blank line, or (-1, 0). Earliest of \\r\\n\\r\\n vs \\n\\n wins so
    LF-only headers over a block that itself contains \\r\\n\\r\\n never
    split inside the block."""
    e_crlf = buf.find(b"\r\n\r\n", start)
    e_lf = buf.find(b"\n\n", start)
    if e_crlf == -1 and e_lf == -1:
        return -1, 0
    if e_lf == -1 or (e_crlf != -1 and e_crlf < e_lf):
        return e_crlf, 4
    return e_lf, 2


def _split_headers(raw: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in raw.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    return headers


def parse_warc(data: bytes) -> list[WarcRecord]:
    """Parse a WARC stream (gzip multi-member or plain). Malformed
    trailing bytes end the scan; complete records already parsed are
    returned (skip-and-continue, the pipeline's degrade mode)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    records: list[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLFs
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos : pos + 5] == b"WARC/":
            break
        hdr_end, sep = _find_blank_line(data, pos)
        if hdr_end == -1:
            break
        headers = _split_headers(data[pos:hdr_end])
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:
            break  # bogus negative length would rewind the scan
        block = data[hdr_end + sep : hdr_end + sep + clen]
        if len(block) < clen:
            break  # truncated record
        pos = hdr_end + sep + clen
        rec = WarcRecord(
            type=headers.get("warc-type", ""),
            headers=headers,
            block=block,
            uri=headers.get("warc-target-uri"),
            record_id=headers.get("warc-record-id"),
        )
        if rec.type == "response" and headers.get("content-type", "").startswith(
            "application/http"
        ):
            _parse_http(rec)
        records.append(rec)
    return records


def _parse_http(rec: WarcRecord) -> None:
    block = rec.block
    split, sep = _find_blank_line(block)
    if split == -1:
        return
    head, rec.body = block[:split], block[split + sep :]
    lines = head.split(b"\n")
    status_line = lines[0].rstrip(b"\r").split(b" ")
    if len(status_line) >= 2 and status_line[0].startswith(b"HTTP/"):
        try:
            rec.http_status = int(status_line[1])
        except ValueError:
            pass
    rec.http_headers = _split_headers(b"\n".join(lines[1:]))
