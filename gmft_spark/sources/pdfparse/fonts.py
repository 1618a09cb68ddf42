"""PDF font model: code → (advance width, unicode, glyph bbox).

Implements simple fonts (Type1/Type1C/TrueType, 1-byte codes) and
composite Type0 fonts (Identity-H, 2-byte CIDs) per the public PDF
specification. Glyph geometry comes from the embedded font program
(``cff.CFFFont`` / ``sfnt.TrueTypeFont``); widths prefer the PDF
``/Widths`` ( `/W` ) arrays as renderers do; unicode prefers the
``/ToUnicode`` CMap, then the Adobe Glyph List via the encoding.

All widths and bboxes returned are in em-1000 text-space units.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from gmft_spark.sources.pdfparse.cff import CFFFont
from gmft_spark.sources.pdfparse.encodings import (
    BASE_ENCODINGS,
    STANDARD_ENCODING,
    glyph_name_to_unicode,
)
from gmft_spark.sources.pdfparse.objects import (
    Lexer,
    PDFFile,
    Stream,
    decode_stream,
    parse_object,
)
from gmft_spark.sources.pdfparse.sfnt import TrueTypeFont

BBox = Tuple[float, float, float, float]


def _c_trunc(v: float) -> int:
    """C-style float→int cast (truncate toward zero)."""
    import math as _m

    return int(_m.trunc(v))


def quantize_em1000(box: BBox, scale: float, cid_top_hack: bool) -> BBox:
    """Quantize a glyph box (font units × ``scale`` → em-1000) the way
    pdfium does: integer em-1000 units via ``(int)(x + 0.5)`` (C trunc),
    and for CID fonts the empirically-verified ``top += top / 64``
    extension (integer division)."""
    x0 = _c_trunc(box[0] * scale + 0.5)
    y0 = _c_trunc(box[1] * scale + 0.5)
    x1 = _c_trunc(box[2] * scale + 0.5)
    y1 = _c_trunc(box[3] * scale + 0.5)
    if cid_top_hack:
        y1 += _c_trunc(y1 / 64.0)
    return (float(x0), float(y0), float(x1), float(y1))


_CMAP_TOKEN = re.compile(rb"<([^>]*)>|(\[)|(\])")


def _cmap_hex_to_int(raw: bytes) -> int:
    digits = bytes(c for c in raw if c not in b"\x00\t\n\x0c\r ")
    try:
        return int(digits, 16) if digits else 0
    except ValueError:
        return 0


def _cmap_hex_to_str(raw: bytes) -> str:
    """Destination hex string → unicode, replicating pdfium's parser: a
    whitespace inside the brackets TERMINATES the value (``<0066 0069>``
    yields just 'f' — observable in the reference goldens as 'Specifc'),
    while spaceless ``<00660069>`` yields the full 'fi'."""
    head = raw.split()[0] if raw.split() else b""
    if len(head) % 2:
        head += b"0"
    try:
        b = bytes.fromhex(head.decode("ascii"))
    except ValueError:
        return ""
    if len(b) % 2:
        b += b"\x00"
    return b.decode("utf-16-be", "ignore")


def _parse_tounicode(data: bytes) -> Dict[int, str]:
    """Parse a ToUnicode CMap: code -> unicode string (pdfium-compatible
    whitespace handling in destination values)."""
    out: Dict[int, str] = {}

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _CMAP_TOKEN.findall(m.group(1))
        hexes = [t[0] for t in toks if not t[1] and not t[2]]
        for i in range(0, len(hexes) - 1, 2):
            out[_cmap_hex_to_int(hexes[i])] = _cmap_hex_to_str(hexes[i + 1])
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.S):
        toks = [
            t for t in _CMAP_TOKEN.finditer(m.group(1))
        ]
        i = 0
        while i + 2 < len(toks) + 1:
            # triple: lo hi (dst | [dst...])
            if i + 2 > len(toks) - 1:
                break
            lo_t, hi_t, third = toks[i], toks[i + 1], toks[i + 2]
            if lo_t.group(2) or lo_t.group(3) or hi_t.group(2) or hi_t.group(3):
                i += 1
                continue
            lo_i = _cmap_hex_to_int(lo_t.group(1))
            hi_i = _cmap_hex_to_int(hi_t.group(1))
            if third.group(2):  # '[' — array of destinations
                i += 3
                k = 0
                while i < len(toks) and not toks[i].group(3):
                    if toks[i].group(1) is not None and lo_i + k <= hi_i:
                        out[lo_i + k] = _cmap_hex_to_str(toks[i].group(1))
                    k += 1
                    i += 1
                i += 1  # skip ']'
            else:
                base_s = _cmap_hex_to_str(third.group(1))
                # hostile-input containment: lo/hi are attacker-controlled;
                # clamp the span (codes are at most 2-byte in practice) so a
                # crafted bfrange can't spin for billions of iterations
                for k in range(min(hi_i - lo_i + 1, 0x10000)):
                    if not base_s:
                        break
                    out[lo_i + k] = base_s[:-1] + chr(ord(base_s[-1]) + k)
                i += 3
    return out


class PDFFont:
    """Common interface: 1- or 2-byte codes."""

    two_byte = False

    def iter_codes(self, raw: bytes) -> List[int]:
        if self.two_byte:
            if len(raw) % 2:
                raw = raw + b"\x00"
            return [
                (raw[i] << 8) | raw[i + 1] for i in range(0, len(raw), 2)
            ]
        return list(raw)

    def width(self, code: int) -> float:  # em-1000
        raise NotImplementedError

    def unicode(self, code: int) -> str:
        raise NotImplementedError

    def glyph_box(self, code: int) -> Optional[BBox]:  # em-1000
        raise NotImplementedError

    def glyph_contours(self, code: int):
        """Flattened glyph outline in UNQUANTIZED em-1000 units (the
        rasterizer works in floats; pdfium's integer quantization /
        CID top-hack are metric emulation, not ink). Returns [] for an
        executed-but-blank glyph (space: no ink, no fallback) and None
        when the font carries no usable program (caller falls back to
        filling the glyph box). Cached per (font, code)."""
        cache = getattr(self, "_gpath_cache", None)
        if cache is None:
            cache = self._gpath_cache = {}
        if code in cache:
            return cache[code]
        out = self._glyph_contours_uncached(code)
        cache[code] = out
        return out

    def _glyph_contours_uncached(self, code: int):
        return None

    def is_word_space(self, code: int) -> bool:
        """Single-byte code 32 (receives /Tw word spacing per spec)."""
        return (not self.two_byte) and code == 32


def _descriptor_fallback_box(desc: dict, pdf: PDFFile) -> Optional[BBox]:
    fb = pdf.resolve(desc.get("FontBBox")) if desc else None
    if isinstance(fb, list) and len(fb) == 4:
        vals = [float(pdf.resolve(v) or 0.0) for v in fb]
        x0, y0, x1, y1 = vals
        return (min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1))
    return None


def _load_font_program(desc: dict, pdf: PDFFile):
    """Returns ('cff', CFFFont) | ('tt', TrueTypeFont) | (None, None)."""
    if not desc:
        return None, None
    for key in ("FontFile2", "FontFile3", "FontFile"):
        ref = desc.get(key)
        if ref is None:
            continue
        st = pdf.resolve(ref)
        if not isinstance(st, Stream):
            continue
        try:
            body = decode_stream(st, pdf)
        except Exception:
            continue
        if key == "FontFile2":
            try:
                return "tt", TrueTypeFont(body)
            except Exception:
                continue
        elif key == "FontFile3":
            sub = pdf.resolve(st.dict.get("Subtype"))
            if sub == "OpenType":
                try:
                    tt = TrueTypeFont(body)
                    if "CFF " in tt.tables:
                        off, ln = tt.tables["CFF "]
                        return "cff", CFFFont(body[off : off + ln])
                    return "tt", tt
                except Exception:
                    continue
            try:
                return "cff", CFFFont(body)
            except Exception:
                continue
        else:
            # original Type1 (eexec)
            try:
                from gmft_spark.sources.pdfparse.type1 import Type1Font

                return "t1", Type1Font(body)
            except Exception:
                continue
    return None, None


class SimpleFont(PDFFont):
    def __init__(self, pdf: PDFFile, d: dict):
        self.subtype = pdf.resolve(d.get("Subtype"))
        desc = pdf.resolve(d.get("FontDescriptor")) or {}
        self.desc = desc
        self.kind, self.prog = _load_font_program(desc, pdf)
        self.fallback_box = _descriptor_fallback_box(desc, pdf)
        flags = pdf.resolve(desc.get("Flags")) or 0
        self.symbolic = bool(flags & 4) and not bool(flags & 32)

        # widths
        self.first_char = int(pdf.resolve(d.get("FirstChar")) or 0)
        widths = pdf.resolve(d.get("Widths"))
        self.widths: List[float] = []
        if isinstance(widths, list):
            self.widths = [float(pdf.resolve(w) or 0.0) for w in widths]
        self.missing_width = float(pdf.resolve(desc.get("MissingWidth")) or 0.0)

        # encoding: code -> glyph name
        self.code_to_name: Dict[int, str] = {}
        enc = pdf.resolve(d.get("Encoding"))
        base: Dict[int, str] = {}
        if isinstance(enc, str):
            base = dict(BASE_ENCODINGS.get(enc, STANDARD_ENCODING))
        elif isinstance(enc, dict):
            be = pdf.resolve(enc.get("BaseEncoding"))
            if isinstance(be, str):
                base = dict(BASE_ENCODINGS.get(be, STANDARD_ENCODING))
            elif not self.symbolic:
                base = dict(STANDARD_ENCODING)
            diffs = pdf.resolve(enc.get("Differences"))
            if isinstance(diffs, list):
                code = 0
                for item in diffs:
                    item = pdf.resolve(item)
                    if isinstance(item, (int, float)):
                        code = int(item)
                    elif isinstance(item, str):
                        base[code] = item
                        code += 1
        elif not self.symbolic:
            base = dict(STANDARD_ENCODING)
        # the font program's built-in encoding fills the gaps (and is the
        # whole encoding for symbolic Type1 fonts with no /Encoding)
        if self.kind == "t1" and getattr(self.prog, "encoding", None):
            for code, name in self.prog.encoding.items():
                base.setdefault(code, name)
        self.code_to_name = base

        # ToUnicode
        self.tounicode: Dict[int, str] = {}
        tu = pdf.resolve(d.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                self.tounicode = _parse_tounicode(decode_stream(tu, pdf))
            except Exception:
                pass

        # scale font-program units to em-1000
        self._scale = 1.0
        if self.kind == "tt" and self.prog is not None:
            self._scale = 1000.0 / float(self.prog.units_per_em or 1000)
        elif self.kind == "cff" and self.prog is not None:
            fm = self.prog.font_matrix()
            self._scale = fm[0] * 1000.0
        elif self.kind == "t1" and self.prog is not None:
            self._scale = self.prog.font_matrix[0] * 1000.0
        self._gid_cache: Dict[int, Optional[int]] = {}

    # -- resolution -------------------------------------------------------

    def _gid(self, code: int) -> Optional[int]:
        if code in self._gid_cache:
            return self._gid_cache[code]
        gid: Optional[int] = None
        name = self.code_to_name.get(code)
        if self.kind == "cff" and self.prog is not None:
            if name:
                gid = self.prog.name_to_gid(name)
            if gid is None:
                # built-in encoding fallback: standard encoding name
                std = STANDARD_ENCODING.get(code)
                if std:
                    gid = self.prog.name_to_gid(std)
        elif self.kind == "tt" and self.prog is not None:
            if self.symbolic:
                gid = self.prog.gid_for_unicode(code)
                if gid is None:
                    gid = self.prog.gid_for_unicode(0xF000 + code)
            if gid is None:
                uni = None
                if name:
                    uni = glyph_name_to_unicode(name)
                if uni is None and code in self.tounicode:
                    uni = self.tounicode[code]
                if uni:
                    gid = self.prog.gid_for_unicode(ord(uni[0]))
                if gid is None:
                    gid = self.prog.gid_for_unicode(code)
        self._gid_cache[code] = gid
        return gid

    def _t1_name(self, code: int) -> Optional[str]:
        name = self.code_to_name.get(code)
        if name and self.prog.has_glyph(name):
            return name
        std = STANDARD_ENCODING.get(code)
        if std and self.prog.has_glyph(std):
            return std
        return None

    def width(self, code: int) -> float:
        idx = code - self.first_char
        if 0 <= idx < len(self.widths):
            return self.widths[idx]
        if self.kind == "t1" and self.prog is not None:
            name = self._t1_name(code)
            if name is not None:
                return self.prog.advance_by_name(name) * self._scale
        elif self.prog is not None:
            gid = self._gid(code)
            if gid is not None:
                return self.prog.advance(gid) * self._scale
        return self.missing_width

    def unicode(self, code: int) -> str:
        if code in self.tounicode:
            u = self.tounicode[code]
            if u:
                return u
        name = self.code_to_name.get(code)
        if name:
            u = glyph_name_to_unicode(name)
            if u:
                return u
        if 32 <= code < 127:
            return chr(code)
        return chr(code) if code else ""

    def glyph_box(self, code: int) -> Optional[BBox]:
        # hot path: one call per char shown; the result is a pure
        # function of (font, code)
        cache = getattr(self, "_gbox_cache", None)
        if cache is None:
            cache = self._gbox_cache = {}
        if code in cache:
            return cache[code]
        box = self._glyph_box_uncached(code)
        cache[code] = box
        return box

    def _glyph_box_uncached(self, code: int) -> Optional[BBox]:
        if self.kind == "t1" and self.prog is not None:
            name = self._t1_name(code)
            if name is not None:
                box = self.prog.glyph_bbox_by_name(name)
                if box is not None:
                    return quantize_em1000(box, self._scale, False)
                return None  # blank glyph (e.g. space)
        elif self.prog is not None:
            gid = self._gid(code)
            if gid is not None:
                box = self.prog.glyph_bbox(gid)
                if box is not None:
                    return quantize_em1000(box, self._scale, False)
                return None  # empty glyph (e.g. space): no marks
        # no embedded font program: approximate the glyph box from the
        # char's advance width and the descriptor's vertical extent
        fb = self.fallback_box
        if fb is None:
            return None
        w = self.width(code)
        if w <= 0:
            return None
        return (0.0, fb[1], w, fb[3])

    def _glyph_contours_uncached(self, code: int):
        path = None
        if self.kind == "t1" and self.prog is not None:
            name = self._t1_name(code)
            if name is not None:
                path = self.prog.glyph_path_by_name(name)
        elif self.prog is not None:
            gid = self._gid(code)
            if gid is not None:
                path = self.prog.glyph_path(gid)
        if path is None:
            return None
        s = self._scale
        return [[(x * s, y * s) for x, y in c] for c in path]


class Type0Font(PDFFont):
    two_byte = True

    def __init__(self, pdf: PDFFile, d: dict):
        self.encoding_name = pdf.resolve(d.get("Encoding"))
        desc_fonts = pdf.resolve(d.get("DescendantFonts")) or []
        df = pdf.resolve(desc_fonts[0]) if desc_fonts else {}
        df = df if isinstance(df, dict) else {}
        self.cid_subtype = pdf.resolve(df.get("Subtype"))
        desc = pdf.resolve(df.get("FontDescriptor")) or {}
        self.kind, self.prog = _load_font_program(desc, pdf)
        self.fallback_box = _descriptor_fallback_box(desc, pdf)
        self.default_width = float(pdf.resolve(df.get("DW")) or 1000.0)

        # /W widths: [c [w1 w2 …] | c1 c2 w]
        self.cid_widths: Dict[int, float] = {}
        w = pdf.resolve(df.get("W"))
        if isinstance(w, list):
            i = 0
            while i < len(w):
                a = pdf.resolve(w[i])
                if i + 1 < len(w):
                    b = pdf.resolve(w[i + 1])
                else:
                    break
                if isinstance(b, list):
                    for k, wv in enumerate(b):
                        self.cid_widths[int(a) + k] = float(pdf.resolve(wv) or 0)
                    i += 2
                else:
                    if i + 2 < len(w):
                        wv = float(pdf.resolve(w[i + 2]) or 0)
                        # CIDs are 16-bit; clamp attacker-controlled ranges
                        lo, hi = int(a), min(int(b), int(a) + 0xFFFF)
                        for cid in range(lo, hi + 1):
                            self.cid_widths[cid] = wv
                    i += 3

        # CIDToGIDMap
        self.cid2gid: Optional[bytes] = None
        c2g = pdf.resolve(df.get("CIDToGIDMap"))
        if isinstance(c2g, Stream):
            try:
                self.cid2gid = decode_stream(c2g, pdf)
            except Exception:
                self.cid2gid = None

        self.tounicode: Dict[int, str] = {}
        tu = pdf.resolve(d.get("ToUnicode"))
        if isinstance(tu, Stream):
            try:
                self.tounicode = _parse_tounicode(decode_stream(tu, pdf))
            except Exception:
                pass

        self._scale = 1.0
        if self.kind == "tt" and self.prog is not None:
            self._scale = 1000.0 / float(self.prog.units_per_em or 1000)
        elif self.kind == "cff" and self.prog is not None:
            self._scale = self.prog.font_matrix()[0] * 1000.0

    def _cid(self, code: int) -> int:
        # Identity-H / Identity-V: code == CID (the only encodings in corpus)
        return code

    def _gid(self, code: int) -> Optional[int]:
        cid = self._cid(code)
        if self.cid2gid is not None:
            idx = cid * 2
            if idx + 1 < len(self.cid2gid):
                return (self.cid2gid[idx] << 8) | self.cid2gid[idx + 1]
            return 0
        if self.kind == "cff" and self.prog is not None and self.prog.is_cid:
            return self.prog.cid_to_gid(cid)
        return cid

    def width(self, code: int) -> float:
        return self.cid_widths.get(self._cid(code), self.default_width)

    def unicode(self, code: int) -> str:
        if code in self.tounicode:
            return self.tounicode[code]
        return ""

    def glyph_box(self, code: int) -> Optional[BBox]:
        cache = getattr(self, "_gbox_cache", None)
        if cache is None:
            cache = self._gbox_cache = {}
        if code in cache:
            return cache[code]
        box = None
        if self.prog is not None:
            gid = self._gid(code)
            if gid is not None:
                raw = self.prog.glyph_bbox(gid)
                if raw is not None:
                    box = quantize_em1000(raw, self._scale, True)
                cache[code] = box
                return box
        box = self.fallback_box
        cache[code] = box
        return box

    def _glyph_contours_uncached(self, code: int):
        if self.prog is None:
            return None
        gid = self._gid(code)
        if gid is None:
            return None
        path = self.prog.glyph_path(gid)
        if path is None:
            return None
        s = self._scale
        return [[(x * s, y * s) for x, y in c] for c in path]


def load_font(pdf: PDFFile, d: dict) -> PDFFont:
    sub = pdf.resolve(d.get("Subtype"))
    if sub == "Type0":
        return Type0Font(pdf, d)
    return SimpleFont(pdf, d)
