"""Minimal from-scratch PDF object parser (pure Python, stdlib only).

Parses the subset of PDF 1.x needed to extract positioned text from the
reference corpus: object scanning (robust against broken xref tables),
object streams (``/Type /ObjStm``), FlateDecode (with PNG predictors),
dictionaries/arrays/strings/names/numbers/references, the page tree,
and encrypted documents (standard security handler, empty user
password — crypt.py; strings and streams decrypt at object-load time,
BEFORE any filter runs, so the rest of the parser never sees
ciphertext; xref streams and the /Encrypt dict stay raw per spec).

This is an independent implementation informed only by the public PDF
specification (ISO 32000-1). It deliberately does NOT implement xref
tables as the primary index: real-world files frequently carry stale or
broken xrefs, so we scan for ``N G obj`` markers and additionally expand
every object stream, letting later definitions win (incremental update
semantics).
"""

from __future__ import annotations

import re
import zlib
from bisect import bisect_right
from typing import Any, Dict, List, Optional, Tuple

_WHITESPACE = b"\x00\t\n\x0c\r "
_DELIMS = b"()<>[]{}/%"
# C-speed twins of the Lexer's hot loops (see skip_ws/read_token):
# whitespace-or-comment runs, and maximal regular-token runs (neither
# whitespace nor delimiter bytes).
_WS_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*)*")
_WS_TOKEN_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*)*([^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
)


class Name(str):
    """A PDF name object (distinct from a string)."""

    __slots__ = ()


class Ref(tuple):
    """An indirect reference (num, gen)."""

    __slots__ = ()

    def __new__(cls, num: int, gen: int):
        return super().__new__(cls, (num, gen))


class Stream:
    """A stream object: dict + raw (still encoded) data."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


def _apply_png_predictor(data: bytes, colors: int, bpc: int, columns: int) -> bytes:
    """Reverse PNG predictors (spec 7.4.4.4) on decompressed data."""
    bpp = max(1, (colors * bpc) // 8)
    row_len = (colors * bpc * columns + 7) // 8
    out = bytearray()
    prev = bytearray(row_len)
    i = 0
    n = len(data)
    while i + 1 <= n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + row_len])
        i += 1 + row_len
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for j in range(bpp, len(row)):
                row[j] = (row[j] + row[j - bpp]) & 0xFF
        elif ft == 2:  # Up
            for j in range(len(row)):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(len(row)):
                left = row[j - bpp] if j >= bpp else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(len(row)):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG predictor row filter {ft}")
        out += row
        prev = row
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF LZWDecode (spec 7.4.4 — the TIFF variant with MSB-first
    packing, clear=256, EOD=257, 9→12-bit growing codes; EarlyChange
    widens one code early by default)."""
    out = bytearray()
    table: list = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(None)  # 256 clear
        table.append(None)  # 257 EOD
        return 9

    width = reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                width = reset()
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code > 255:
                    raise ValueError("bad first LZW code")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if entry is None:
                    raise ValueError("bad LZW code")
                if len(table) < 4096:  # full table: stop assigning,
                    table.append(prev + entry[:1])  # mirror the encoder
            elif code == len(table) and code < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) + early_change >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


def _apply_predictor_parms(data: bytes, pm, resolver) -> bytes:
    """Shared /DecodeParms predictor handling for Flate and LZW."""
    if not isinstance(pm, dict):
        return data
    pred = pm.get("Predictor", 1)
    colors = pm.get("Colors", 1) or 1
    bpc = pm.get("BitsPerComponent", 8) or 8
    cols = pm.get("Columns", 1) or 1
    if resolver is not None:
        pred = resolver.resolve(pred)
        colors = resolver.resolve(colors)
        bpc = resolver.resolve(bpc)
        cols = resolver.resolve(cols)
    if isinstance(pred, int) and pred >= 10:
        return _apply_png_predictor(data, colors, bpc, cols)
    if pred == 2:
        return _apply_tiff_predictor(data, colors, bpc, cols)
    return data


def _apply_tiff_predictor(
    data: bytes, colors: int, bpc: int, columns: int
) -> bytes:
    """Reverse TIFF predictor 2 (horizontal differencing): cumulative
    per-channel sums along each row. 8-bit samples only (the practical
    case; other depths raise)."""
    if bpc != 8:
        raise ValueError("TIFF predictor needs 8-bit samples")
    row_len = colors * columns
    if row_len <= 0 or len(data) % row_len:
        raise ValueError("TIFF predictor row misalignment")
    import numpy as _np

    arr = _np.frombuffer(data, dtype=_np.uint8).reshape(
        -1, columns, colors
    )
    return _np.cumsum(arr, axis=1, dtype=_np.uint8).tobytes()


class Lexer:
    """Tokenizer over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self) -> None:
        # regex-driven: the per-byte Python loop was the single hottest
        # call in the decode profile (235k calls / 150 turns). The
        # pattern is byte-equivalent to the loop it replaces: runs of
        # PDF whitespace interleaved with %-comments (a comment ends
        # BEFORE its CR/LF, which the whitespace branch then consumes).
        self.pos = _WS_RE.match(self.data, self.pos).end()

    def peek_byte(self) -> int:
        return self.data[self.pos] if self.pos < len(self.data) else -1

    def read_token(self) -> bytes:
        """Read a regular token (keyword / number)."""
        m = _WS_TOKEN_RE.match(self.data, self.pos)
        start, end = m.span(1)
        self.pos = end if end > start else start + 1
        return self.data[start : self.pos]

    def read_name(self) -> Name:
        # caller consumed '/'
        data, n = self.data, len(self.data)
        p = self.pos
        out = bytearray()
        while p < n:
            c = data[p]
            if c in _WHITESPACE or c in _DELIMS:
                break
            if c == 0x23 and p + 2 < n:  # '#' hex escape
                try:
                    out.append(int(data[p + 1 : p + 3], 16))
                    p += 3
                    continue
                except ValueError:
                    pass
            out.append(c)
            p += 1
        self.pos = p
        return Name(out.decode("latin-1"))

    def read_literal_string(self) -> bytes:
        # caller consumed '('
        data, n = self.data, len(self.data)
        p = self.pos
        depth = 1
        out = bytearray()
        while p < n:
            c = data[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= n:
                    break
                e = data[p]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9, 0x62: 8, 0x66: 12}[e])
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    val = 0
                    k = 0
                    while k < 3 and p < n and 0x30 <= data[p] <= 0x37:
                        val = val * 8 + (data[p] - 0x30)
                        p += 1
                        k += 1
                    out.append(val & 0xFF)
                elif e == 0x0D:  # line continuation \<CR>[<LF>]
                    p += 1
                    if p < n and data[p] == 0x0A:
                        p += 1
                elif e == 0x0A:
                    p += 1
                else:
                    out.append(e)
                    p += 1
            elif c == 0x28:
                depth += 1
                out.append(c)
                p += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    p += 1
                    break
                out.append(c)
                p += 1
            else:
                out.append(c)
                p += 1
        self.pos = p
        return bytes(out)

    def read_hex_string(self) -> bytes:
        # caller consumed '<'
        data, n = self.data, len(self.data)
        p = self.pos
        digits = bytearray()
        while p < n and data[p] != 0x3E:  # '>'
            c = data[p]
            if c not in _WHITESPACE:
                digits.append(c)
            p += 1
        self.pos = p + 1
        if len(digits) % 2:
            digits.append(0x30)
        try:
            return bytes.fromhex(digits.decode("ascii"))
        except ValueError:
            return b""


_NUM_RE = re.compile(rb"^[+-]?(\d+\.?\d*|\.\d+)$")


def parse_object(lx: Lexer, resolver: Optional["PDFFile"] = None) -> Any:
    """Parse one object at the lexer position."""
    lx.skip_ws()
    c = lx.peek_byte()
    if c == -1:
        return None
    data = lx.data
    if c == 0x2F:  # '/'
        lx.pos += 1
        return lx.read_name()
    if c == 0x28:  # '('
        lx.pos += 1
        return lx.read_literal_string()
    if c == 0x3C:  # '<'
        if data[lx.pos : lx.pos + 2] == b"<<":
            lx.pos += 2
            return _parse_dict_body(lx, resolver)
        lx.pos += 1
        return lx.read_hex_string()
    if c == 0x5B:  # '['
        lx.pos += 1
        arr: List[Any] = []
        while True:
            lx.skip_ws()
            if lx.peek_byte() == 0x5D:
                lx.pos += 1
                return arr
            if lx.peek_byte() == -1:
                return arr
            arr.append(parse_object(lx, resolver))
    if c == 0x5D or c == 0x3E:  # stray close
        lx.pos += 1
        return None
    tok = lx.read_token()
    if tok in (b"true", b"false"):
        return tok == b"true"
    if tok == b"null":
        return None
    if _NUM_RE.match(tok):
        # possible reference "N G R"
        save = lx.pos
        if b"." not in tok:
            lx.skip_ws()
            t2_start = lx.pos
            t2 = lx.read_token()
            if _NUM_RE.match(t2) and b"." not in t2:
                lx.skip_ws()
                t3 = lx.read_token()
                if t3 == b"R":
                    return Ref(int(tok), int(t2))
            lx.pos = save
            _ = t2_start
            return int(tok)
        return float(tok)
    # unknown keyword — return as name-ish marker
    return Name(tok.decode("latin-1", "replace"))


def _parse_dict_body(lx: Lexer, resolver: Optional["PDFFile"]) -> Any:
    d: Dict[str, Any] = {}
    while True:
        lx.skip_ws()
        c = lx.peek_byte()
        if c == -1:
            break
        if lx.data[lx.pos : lx.pos + 2] == b">>":
            lx.pos += 2
            break
        if c != 0x2F:
            # malformed key; skip one object
            parse_object(lx, resolver)
            continue
        lx.pos += 1
        key = lx.read_name()
        val = parse_object(lx, resolver)
        d[key] = val
    # stream?
    save = lx.pos
    lx.skip_ws()
    if lx.data[lx.pos : lx.pos + 6] == b"stream":
        lx.pos += 6
        if lx.data[lx.pos : lx.pos + 2] == b"\r\n":
            lx.pos += 2
        elif lx.pos < len(lx.data) and lx.data[lx.pos] in (0x0A, 0x0D):
            lx.pos += 1
        length = d.get("Length")
        if isinstance(length, Ref) and resolver is not None:
            length = resolver.resolve(length)
        start = lx.pos
        if isinstance(length, int) and length >= 0:
            end = start + length
            tail = lx.data[end : end + 20]
            if b"endstream" not in tail:
                end = _find_endstream(lx.data, start)
        else:
            end = _find_endstream(lx.data, start)
        raw = lx.data[start:end]
        lx.pos = end
        # consume endstream keyword
        m = re.compile(rb"\s*endstream").match(lx.data, lx.pos)
        if m:
            lx.pos = m.end()
        return Stream(d, raw)
    lx.pos = save
    return d


def _find_endstream(data: bytes, start: int) -> int:
    idx = data.find(b"endstream", start)
    if idx < 0:
        return len(data)
    # strip at most one EOL before the keyword
    end = idx
    if end > start and data[end - 1] == 0x0A:
        end -= 1
    if end > start and data[end - 1] == 0x0D:
        end -= 1
    return end


# hard per-stream output cap: a kilobyte-scale deflate bomb in an untrusted
# payload must not allocate gigabytes inside an executor task
_MAX_STREAM_BYTES = 64 * 1024 * 1024


def _flate_bounded(data: bytes) -> bytes:
    """FlateDecode with incremental, capped output. Corrupt streams decode
    to b'' (matching the previous tolerant fallback); streams that exceed
    the cap raise ValueError so the existing error-row containment in
    pdf_extract handles them."""
    d = zlib.decompressobj()
    out = bytearray()
    try:
        while True:
            chunk = d.decompress(data, 1 << 20)
            out += chunk
            if len(out) > _MAX_STREAM_BYTES:
                raise ValueError(
                    f"FlateDecode output exceeds {_MAX_STREAM_BYTES} byte cap"
                )
            data = d.unconsumed_tail
            if d.eof or not data or not chunk:
                break
    except zlib.error:
        return b""
    return bytes(out)


def decode_stream(st: Stream, resolver: Optional["PDFFile"] = None) -> bytes:
    """Apply the stream's filter chain (Flate + predictors; pass-through
    for unsupported image codecs, which callers never decode as data)."""
    data = st.raw
    filters = st.dict.get("Filter")
    if resolver is not None:
        filters = resolver.resolve(filters)
    if filters is None:
        return data
    if not isinstance(filters, list):
        filters = [filters]
    parms = st.dict.get("DecodeParms") or st.dict.get("DP")
    if resolver is not None:
        parms = resolver.resolve(parms)
    if not isinstance(parms, list):
        parms = [parms]
    while len(parms) < len(filters):
        parms.append(None)
    for f, pm in zip(filters, parms):
        if resolver is not None:
            f = resolver.resolve(f)
            pm = resolver.resolve(pm)
        if f == "FlateDecode" or f == "Fl":
            data = _flate_bounded(data)
            data = _apply_predictor_parms(data, pm, resolver)
        elif f in ("LZWDecode", "LZW"):
            early = 1
            if isinstance(pm, dict):
                early = pm.get("EarlyChange", 1)
                if resolver is not None:
                    early = resolver.resolve(early)
                early = 1 if early is None else int(early)
            data = _lzw_decode(data, early_change=early)
            data = _apply_predictor_parms(data, pm, resolver)
        elif f in ("ASCIIHexDecode", "AHx"):
            body = data.split(b">")[0]
            body = bytes(c for c in body if c not in _WHITESPACE)
            if len(body) % 2:
                body += b"0"
            data = bytes.fromhex(body.decode("ascii", "ignore"))
        elif f in ("RunLengthDecode", "RL"):
            out = bytearray()
            i = 0
            n = len(data)
            while i < n:
                length = data[i]
                i += 1
                if length == 128:  # EOD
                    break
                if length < 128:
                    out += data[i : i + length + 1]
                    i += length + 1
                else:
                    if i < n:
                        out += data[i : i + 1] * (257 - length)
                    i += 1
            data = bytes(out)
        elif f in ("ASCII85Decode", "A85"):
            import base64

            body = data
            if body.startswith(b"<~"):
                body = body[2:]
            end = body.find(b"~>")
            if end >= 0:
                body = body[:end]
            data = base64.a85decode(bytes(c for c in body if c not in _WHITESPACE))
        else:
            # image codecs (DCTDecode, CCITTFaxDecode, JPX…): leave encoded
            return data
    return data


_OBJ_RE = re.compile(rb"(\d{1,10})\s+(\d{1,5})\s+obj\b")


class PDFFile:
    """A parsed PDF file: object index + page tree."""

    def __init__(self, data: bytes, password: "str | bytes" = b""):
        self.data = data
        self._offsets: Dict[int, int] = {}
        self._gens: Dict[int, int] = {}
        self._cache: Dict[int, Any] = {}
        self._objstm_members: Dict[int, Tuple[int, int]] = {}  # objnum -> (stm_num, idx)
        self._crypt = None  # set by _init_encryption for encrypted files
        self._crypt_num: Optional[int] = None
        self._password = password
        self._scan_objects()
        self._init_encryption()
        self._expand_object_streams()
        self._trailer = self._find_trailer()
        self._pages: Optional[List[dict]] = None

    # -- indexing ---------------------------------------------------------

    def _scan_objects(self) -> None:
        for m in _OBJ_RE.finditer(self.data):
            # guard: must be at token boundary (not part of a larger number)
            s = m.start()
            if s > 0 and self.data[s - 1 : s] not in (
                b" ", b"\n", b"\r", b"\t", b"\x00", b"\x0c", b">", b"]",
            ):
                continue
            num = int(m.group(1))
            self._offsets[num] = m.end()
            self._gens[num] = int(m.group(2))

    def _init_encryption(self) -> None:
        """Attach the standard security handler BEFORE any stream is
        decoded (object streams are encrypted; xref streams are not).
        Empty-user-password documents open transparently; a required
        user password raises ValueError at open (crypt.PDFCrypt)."""
        if self.data.find(b"/Encrypt") < 0:
            return
        enc_ref = None
        file_id = b""
        for m in re.finditer(rb"trailer", self.data):
            lx = Lexer(self.data, m.end())
            try:
                obj = parse_object(lx, self)
            except Exception:
                continue
            if isinstance(obj, dict):
                if obj.get("Encrypt") is not None:
                    enc_ref = obj["Encrypt"]
                if obj.get("ID"):
                    file_id = obj["ID"]
        if enc_ref is None:
            # XRef-stream-only layout: the trailer fields live in the
            # XRef stream dict (never encrypted, safe to decode now).
            # Only genuine XRef streams are cached — a byte-scan false
            # positive must NOT enter the cache before decryption is up.
            for num in self._objects_marked(b"XRef"):
                try:
                    obj = self._load_at_offset(self._offsets[num])
                except Exception:
                    continue
                if isinstance(obj, Stream) and obj.dict.get("Type") == "XRef":
                    self._cache[num] = obj
                    if obj.dict.get("Encrypt") is not None:
                        enc_ref = obj.dict["Encrypt"]
                    if obj.dict.get("ID"):
                        file_id = obj.dict["ID"]
        if enc_ref is None:
            return
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            return
        from gmft_spark.sources.pdfparse.crypt import PDFCrypt

        enc = {k: self.resolve(v) for k, v in enc.items()}
        id0 = b""
        if isinstance(file_id, list) and file_id:
            first = self.resolve(file_id[0])
            if isinstance(first, bytes):
                id0 = first
        self._crypt = PDFCrypt(enc, id0, password=self._password)
        if isinstance(enc_ref, Ref):
            self._crypt_num = enc_ref[0]  # its strings stay raw
        else:
            self._crypt_num = None

    def _objects_marked(self, token: bytes) -> List[int]:
        """Object numbers whose raw bytes can contain ``token``, in byte
        order of the (last-wins) header offset, dedup'd. A byte-scan
        false positive (the token inside an unrelated stream body) just
        costs the caller one wasted parse."""
        data = self.data
        if not self._offsets or data.find(token) < 0:
            return []
        starts = sorted(self._offsets.values())
        num_at = {off: num for num, off in self._offsets.items()}
        out: List[int] = []
        seen = set()
        for m in re.finditer(re.escape(token), data):
            i = bisect_right(starts, m.start())
            if i == 0:
                continue
            num = num_at[starts[i - 1]]
            if num not in seen:
                seen.add(num)
                out.append(num)
        return out

    def _expand_object_streams(self) -> None:
        # Lazy indexing: eagerly parsing EVERY scanned object here was
        # the dominant fixed cost of per-turn payload decode (~20% of a
        # real decode+extract profile). Only objects whose raw bytes can
        # name ObjStm are parsed up front; everything else loads on
        # first get_object.
        for num in self._objects_marked(b"ObjStm"):
            try:
                obj = self._load_direct(num)
            except Exception:
                continue
            if isinstance(obj, Stream) and obj.dict.get("Type") == "ObjStm":
                try:
                    self._index_objstm(num, obj)
                except Exception:
                    continue
            self._cache[num] = obj

    def _index_objstm(self, stm_num: int, st: Stream) -> None:
        n = self.resolve(st.dict.get("N", 0))
        first = self.resolve(st.dict.get("First", 0))
        body = decode_stream(st, self)
        lx = Lexer(body)
        pairs = []
        for _ in range(int(n)):
            a = parse_object(lx)
            b = parse_object(lx)
            if not isinstance(a, int) or not isinstance(b, int):
                break
            pairs.append((a, b))
        for idx, (objnum, rel) in enumerate(pairs):
            self._objstm_members[objnum] = (stm_num, int(first) + rel)

    def _find_trailer(self) -> dict:
        # collect trailer dicts (classic) and XRef stream dicts; last wins
        trailer: dict = {}
        for m in re.finditer(rb"trailer", self.data):
            lx = Lexer(self.data, m.end())
            obj = parse_object(lx, self)
            if isinstance(obj, dict):
                trailer.update(obj)
        if "Root" not in trailer:
            for num in self._objects_marked(b"XRef"):
                obj = self.get_object(num)
                if isinstance(obj, Stream) and obj.dict.get("Type") == "XRef":
                    trailer.update(obj.dict)
        if "Root" not in trailer:
            # last resort: find the catalog by scanning
            for num in self._objects_marked(b"Catalog"):
                obj = self.get_object(num)
                o = obj.dict if isinstance(obj, Stream) else obj
                if isinstance(o, dict) and o.get("Type") == "Catalog":
                    trailer["Root"] = Ref(num, 0)
                    break
        return trailer

    def _load_at_offset(self, pos: int) -> Any:
        lx = Lexer(self.data, pos)
        return parse_object(lx, self)

    def _load_direct(self, num: int) -> Any:
        """Load a top-level (non-ObjStm-member) object, applying the
        security handler to its strings and stream bytes. ObjStm
        members are NOT decrypted separately — their container was."""
        obj = self._load_at_offset(self._offsets[num])
        if self._crypt is not None and num != self._crypt_num:
            obj = self._crypt.decrypt_object(
                obj, num, self._gens.get(num, 0)
            )
        return obj

    # -- object access ----------------------------------------------------

    def get_object(self, num: int) -> Any:
        if num in self._cache:
            return self._cache[num]
        obj = None
        if num in self._offsets:
            try:
                obj = self._load_direct(num)
            except Exception:
                obj = None
        elif num in self._objstm_members:
            stm_num, off = self._objstm_members[num]
            st = self.get_object(stm_num)
            if isinstance(st, Stream):
                body = decode_stream(st, self)
                lx = Lexer(body, off)
                obj = parse_object(lx, self)
        self._cache[num] = obj
        return obj

    def resolve(self, obj: Any) -> Any:
        seen = 0
        while isinstance(obj, Ref):
            obj = self.get_object(obj[0])
            seen += 1
            if seen > 32:
                return None
        return obj

    # -- page tree --------------------------------------------------------

    @property
    def trailer(self) -> dict:
        return self._trailer

    def pages(self) -> List[dict]:
        if self._pages is not None:
            return self._pages
        out: List[dict] = []
        root = self.resolve(self._trailer.get("Root")) or {}
        tree = self.resolve(root.get("Pages"))
        visited = set()

        def walk(node_ref: Any, inherited: dict) -> None:
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            key = id(node)
            if key in visited:
                return
            visited.add(key)
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "CropBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page":
                page = dict(node)
                for k, v in inh.items():
                    page.setdefault(k, v)
                out.append(page)
                return
            for kid in self.resolve(node.get("Kids")) or []:
                walk(kid, inh)

        walk(tree, {})
        if not out:
            # fallback: any dict with /Type /Page
            nums = sorted(
                set(self._offsets) | set(self._objstm_members)
            )
            for num in nums:
                o = self.get_object(num)
                if isinstance(o, dict) and o.get("Type") == "Page":
                    out.append(o)
        self._pages = out
        return out

    def page_content(self, page: dict) -> bytes:
        cont = self.resolve(page.get("Contents"))
        chunks: List[bytes] = []
        if isinstance(cont, Stream):
            chunks.append(decode_stream(cont, self))
        elif isinstance(cont, list):
            for c in cont:
                c = self.resolve(c)
                if isinstance(c, Stream):
                    chunks.append(decode_stream(c, self))
        return b"\n".join(chunks)

    def page_box(self, page: dict) -> Tuple[float, float, float, float]:
        """Effective page box: CropBox intersected with MediaBox (falls
        back to MediaBox, then US Letter)."""

        def _box(key):
            b = self.resolve(page.get(key))
            if isinstance(b, list) and len(b) == 4:
                vals = [float(self.resolve(v)) for v in b]
                x0, y0, x1, y1 = vals
                return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
            return None

        media = _box("MediaBox") or (0.0, 0.0, 612.0, 792.0)
        crop = _box("CropBox")
        if crop is None:
            return media
        x0 = max(crop[0], media[0])
        y0 = max(crop[1], media[1])
        x1 = min(crop[2], media[2])
        y1 = min(crop[3], media[3])
        if x1 <= x0 or y1 <= y0:
            return media
        return (x0, y0, x1, y1)
