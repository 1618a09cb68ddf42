"""From-scratch WARC (ISO 28500 / WARC-1.1) container kernel.

The web-corpus ingestion half of the training-data pipeline: Common
Crawl and every archive-derived corpus ship as WARC — a sequence of
records, each a CRLF header block (``WARC/1.x`` version line, then
``Name: value`` lines, then an empty line) followed by a
``Content-Length``-delimited content block and a ``CRLF CRLF`` record
separator. Crawl archives gzip each record as its OWN gzip member and
concatenate the members, so readers can split files at member
boundaries without decompressing the whole archive.

Reader (``parse_warc``) accepts all three public layouts — per-member
gzip (the Common Crawl shape), a single whole-file gzip stream, and
uncompressed — via one zlib loop over members. ``http_response``
splits a ``application/http; msgtype=response`` block into status /
headers / body. Malformed input raises ``ValueError``.

Writer twin (``build_warc``) emits warcinfo + per-document
request/response records with deterministic headers, one gzip member
per record (zlib container writer: mtime 0 — byte-deterministic for a
fixed level), so ``parse_warc(build_warc(x))`` roundtrips exactly;
operators/webcorpus.py drives real corpora through the same reader.

Scale note: WARC payloads parse inside mapInPandas narrow maps — one
task per archive file row, bytes never leave their scan partition.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

__all__ = [
    "WarcRecord",
    "parse_warc",
    "http_response",
    "build_warc",
    "build_warc_indexed",
    "build_wet",
    "surt_key",
]

_GZIP_MAGIC = b"\x1f\x8b"
_MAX_DECOMPRESSED = 1 << 30  # hostile-input cap: 1 GiB per file


@dataclass
class WarcRecord:
    """One WARC record: lower-cased header map + raw content block."""

    headers: Dict[str, str]
    block: bytes

    @property
    def warc_type(self) -> str:
        return self.headers.get("warc-type", "")

    @property
    def target_uri(self) -> str:
        # WARC 1.1 allows <uri> angle quoting; strip it
        uri = self.headers.get("warc-target-uri", "")
        if uri.startswith("<") and uri.endswith(">"):
            uri = uri[1:-1]
        return uri


_GZ_CHUNK = 1 << 18  # 256 KiB compressed feed per inflate call


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated-gzip-member (or whole-file gzip) → plain bytes.

    Streams fixed-size compressed chunks through each member's
    decompressor and walks the buffer by OFFSET, so per-member-gzip
    archives (Common Crawl: one member per record, 100k+ members per
    file) cost O(total) copies — a naive bytes(remaining-tail) per
    member is O(members x file_size) and effectively hangs on real
    archives. The decompressed-size cap is enforced per chunk (a chunk
    inflates at most ~1:1032), so a gzip bomb raises before ballooning
    memory rather than after one giant decompress call."""
    out: List[bytes] = []
    total = 0
    mv = memoryview(data)
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            while not d.eof:
                if pos >= n:
                    raise ValueError("truncated gzip member in WARC")
                chunk = mv[pos : pos + _GZ_CHUNK]
                pos += len(chunk)
                piece = d.decompress(chunk)
                total += len(piece)
                if total > _MAX_DECOMPRESSED:
                    raise ValueError(
                        "WARC decompresses past the 1 GiB cap"
                    )
                out.append(piece)
        except zlib.error as e:
            raise ValueError(f"bad gzip member in WARC: {e}") from None
        # rewind whatever the finished member did not consume
        pos -= len(d.unused_data)
    return b"".join(out)


def parse_warc(data: bytes) -> List[WarcRecord]:
    """WARC file bytes (member-gzip, whole-gzip, or plain) → records."""
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    records: List[WarcRecord] = []
    i = 0
    n = len(data)
    while i < n:
        # tolerate trailing CRLF runs between/after records
        while i < n and data[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        eol = data.find(b"\r\n", i)
        if eol < 0:
            raise ValueError("WARC header line missing CRLF")
        version = data[i:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"expected WARC version line, got {version[:20]!r}")
        i = eol + 2
        headers: Dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", i)
            if eol < 0:
                raise ValueError("unterminated WARC header block")
            line = data[i:eol]
            i = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"bad WARC header line {line[:40]!r}")
            name, _, value = line.partition(b":")
            headers[name.decode("ascii", "replace").strip().lower()] = (
                value.decode("utf-8", "replace").strip()
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing Content-Length") from None
        if length < 0 or i + length > n:
            raise ValueError("WARC content block outruns file")
        block = data[i : i + length]
        i += length
        if data[i : i + 4] != b"\r\n\r\n":
            raise ValueError("WARC record separator missing")
        i += 4
        records.append(WarcRecord(headers=headers, block=block))
    return records


def http_response(
    block: bytes,
) -> Tuple[int, Dict[str, str], bytes]:
    """An ``application/http; msgtype=response`` block → (status,
    lower-cased headers, body bytes)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP response block missing header terminator")
    head = block[:sep].decode("iso-8859-1")
    body = block[sep + 4 :]
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"bad HTTP status line {lines[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"bad HTTP status {parts[1]!r}") from None
    headers: Dict[str, str] = {}
    for line in lines[1:]:
        name, _, value = line.partition(":")
        headers[name.strip().lower()] = value.strip()
    return status, headers, body


# ── writer twin ──────────────────────────────────────────────────────


def _record_bytes(warc_type: str, headers: List[Tuple[str, str]], block: bytes) -> bytes:
    head = [b"WARC/1.0"]
    head.append(b"WARC-Type: " + warc_type.encode("ascii"))
    for name, value in headers:
        head.append(f"{name}: {value}".encode("utf-8"))
    head.append(f"Content-Length: {len(block)}".encode("ascii"))
    return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"


def _gzip_member(raw: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(raw) + c.flush()


def build_warc(
    docs: List[tuple],
    *,
    gzip_members: bool = True,
    date: str = "2026-01-01T00:00:00Z",
    with_requests: bool = True,
) -> bytes:
    """(url, body-bytes[, content-type]) tuples → WARC file bytes,
    Common Crawl layout (content-type defaults to HTML — crawls carry
    PDFs, images, and other payloads under the same record framing).

    Emits a leading warcinfo record, then per document an optional
    request record and a response record (HTTP/1.1 200 head + body).
    Deterministic for a fixed input: fixed date, record ids derived
    from the record payload, zlib gzip members (mtime 0)."""
    import hashlib

    members: List[bytes] = []

    def _rid(seed: str) -> str:
        return f"<urn:md5:{hashlib.md5(seed.encode()).hexdigest()}>"

    info_body = b"software: gmft-spark webcorpus\r\nformat: WARC File Format 1.0\r\n"
    members.append(
        _record_bytes(
            "warcinfo",
            [
                ("WARC-Date", date),
                ("WARC-Record-ID", _rid("warcinfo")),
                ("Content-Type", "application/warc-fields"),
            ],
            info_body,
        )
    )
    for doc in docs:
        url, html = doc[0], doc[1]
        ctype = doc[2] if len(doc) > 2 else "text/html; charset=utf-8"
        if with_requests:
            rest = url.split("://", 1)[-1]
            host, _, tail = rest.partition("/")
            path = "/" + tail
            req = (
                f"GET {path} HTTP/1.1\r\nHost: {host}\r\n"
                "User-Agent: gmft-spark-crawler\r\n\r\n"
            ).encode("ascii", "replace")
            members.append(
                _record_bytes(
                    "request",
                    [
                        ("WARC-Target-URI", url),
                        ("WARC-Date", date),
                        ("WARC-Record-ID", _rid("req:" + url)),
                        ("Content-Type", "application/http; msgtype=request"),
                    ],
                    req,
                )
            )
        http = (
            b"HTTP/1.1 200 OK\r\n"
            + f"Content-Type: {ctype}\r\n".encode("ascii")
            + f"Content-Length: {len(html)}\r\n\r\n".encode("ascii")
            + html
        )
        members.append(
            _record_bytes(
                "response",
                [
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    ("WARC-Record-ID", _rid("resp:" + url)),
                    ("Content-Type", "application/http; msgtype=response"),
                ],
                http,
            )
        )
    if gzip_members:
        return b"".join(_gzip_member(m) for m in members)
    return b"".join(members)


def surt_key(url: str) -> str:
    """Sort-friendly URI Reordering Transform key, the CDX index key
    crawl archives sort by: host labels reversed and comma-joined,
    ``)/``, then the lowercased path+query. Fragment and port are
    dropped (default ports never reach a urlkey; non-default ports are
    rare enough in corpus URLs that this index treats host identity as
    port-less — documented simplification)."""
    u = url.split("#", 1)[0]
    rest = u.split("://", 1)[-1]
    hostport, _, pathq = rest.partition("/")
    host = hostport.split(":", 1)[0].lower()
    return ",".join(reversed(host.split("."))) + ")/" + pathq.lower()


def build_warc_indexed(
    docs: List[tuple],
    *,
    date: str = "2026-01-01T00:00:00Z",
) -> Tuple[bytes, List[dict]]:
    """Like ``build_warc`` (gzip members, no request records) but also
    returns the CDX-shaped index: one entry per RESPONSE member with
    (urlkey, url, offset, length, mime) where [offset, offset+length)
    is that record's OWN gzip member — the random-access contract
    crawl consumers use (an HTTP range request into a 1 GB archive
    fetches one page). ``parse_warc(data[offset:offset+length])``
    yields exactly that record."""
    blob = bytearray()
    entries: List[dict] = []
    warcinfo = build_warc([], gzip_members=True, date=date)
    blob += warcinfo
    for doc in docs:
        url, body = doc[0], doc[1]
        ctype = doc[2] if len(doc) > 2 else "text/html; charset=utf-8"
        member = build_warc(
            [(url, body, ctype)],
            gzip_members=True,
            date=date,
            with_requests=False,
        )
        # strip the per-call warcinfo member: the response member is
        # the second gzip member in the mini-archive
        d = zlib.decompressobj(wbits=31)
        d.decompress(member)
        info_len = len(member) - len(d.unused_data)
        resp = member[info_len:]
        entries.append(
            {
                "urlkey": surt_key(url),
                "url": url,
                "offset": len(blob),
                "length": len(resp),
                "mime": ctype.split(";")[0].strip(),
            }
        )
        blob += resp
    return bytes(blob), entries


def build_wet(
    docs: List[Tuple[str, str]],
    *,
    gzip_members: bool = True,
    date: str = "2026-01-01T00:00:00Z",
) -> bytes:
    """(url, extracted-text) pairs → WET file bytes (Common Crawl's
    derived-text archives: the same WARC framing, ``conversion``
    records whose block IS the extracted text)."""
    import hashlib

    members: List[bytes] = []
    info = b"software: gmft-spark webcorpus\r\nformat: WARC File Format 1.0\r\n"
    members.append(
        _record_bytes(
            "warcinfo",
            [
                ("WARC-Date", date),
                (
                    "WARC-Record-ID",
                    f"<urn:md5:{hashlib.md5(b'wetinfo').hexdigest()}>",
                ),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
    )
    for url, text in docs:
        body = text.encode("utf-8")
        members.append(
            _record_bytes(
                "conversion",
                [
                    ("WARC-Target-URI", url),
                    ("WARC-Date", date),
                    (
                        "WARC-Record-ID",
                        "<urn:md5:"
                        + hashlib.md5(("wet:" + url).encode()).hexdigest()
                        + ">",
                    ),
                    ("Content-Type", "text/plain"),
                ],
                body,
            )
        )
    if gzip_members:
        return b"".join(_gzip_member(m) for m in members)
    return b"".join(members)
