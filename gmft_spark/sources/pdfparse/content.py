"""Content-stream interpreter: emits positioned characters.

Walks a page's content stream (and Form XObjects recursively),
maintaining the graphics/text state machine of the public PDF spec
(§8.4, §9.4), and yields one record per shown character:

    Char(uni, box, ox, oy, adv, fs, space)

* ``uni``   unicode string ('' if unmapped)
* ``box``   device-space glyph bounding box (x0, y0, x1, y1), PDF
            bottom-left origin — or None for blank glyphs (e.g. space)
* ``ox, oy``character origin (pen position) in device space
* ``adv``   advance vector (dx, dy) in device space
* ``fs``    effective font size in device units
* ``space`` True if the character code is a word-space (code 32) or the
            mapped unicode is whitespace
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

from gmft_spark.sources.pdfparse.fonts import PDFFont, load_font
from gmft_spark.sources.pdfparse.objects import (
    Lexer,
    Name,
    PDFFile,
    Ref,
    Stream,
    decode_stream,
    parse_object,
)

Matrix = Tuple[float, float, float, float, float, float]
IDENTITY: Matrix = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)

_NUMBER_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)(?![0-9.eE])")

# One C-level match per content-stream token: leading whitespace/comment
# run (the Lexer's skip_ws pattern), then EITHER a number (the
# _NUMBER_RE fast path, group 1) OR a regular token (the Lexer's
# read_token charset, group 2). Delimiter bytes ( < [ / etc. match
# neither alternative and are dispatched on the byte at m.end().
# Byte-equivalent to the skip_ws/peek_byte/_NUMBER_RE/read_token
# sequence it fuses — same fragments, same precedence.
_RUN_TOKEN_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]|%[^\r\n]*)*"
    rb"(?:([+-]?(?:\d+\.?\d*|\.\d+)(?![0-9.eE]))"
    rb"|([^\x00\t\n\x0c\r ()<>\[\]{}/%]+))?"
)

_LIGATURES = {
    "ﬀ": "ff",
    "ﬁ": "fi",
    "ﬂ": "fl",
    "ﬃ": "ffi",
    "ﬄ": "ffl",
    "ﬅ": "st",
    "ﬆ": "st",
}


def mat_mul(m: Matrix, n: Matrix) -> Matrix:
    a, b, c, d, e, f = m
    A, B, C, D, E, F = n
    return (
        a * A + b * C,
        a * B + b * D,
        c * A + d * C,
        c * B + d * D,
        e * A + f * C + E,
        e * B + f * D + F,
    )


def mat_apply(m: Matrix, x: float, y: float) -> Tuple[float, float]:
    a, b, c, d, e, f = m
    return (a * x + c * y + e, b * x + d * y + f)


@dataclass
class Char:
    uni: str
    box: Optional[Tuple[float, float, float, float]]
    ox: float
    oy: float
    adv: Tuple[float, float]
    fs: float
    space: bool
    code: int = -1
    font: Optional[PDFFont] = None
    obj_id: int = -1  # index of the text-showing object (Tj/TJ/'/" op)
    # unit vector of the text x-axis in device space (rotation support)
    dir: Tuple[float, float] = (1.0, 0.0)
    # font-width-only advance (glyph width × size, no Tc/Tw): the pen the
    # reference's textpage uses for its inter-object gap decisions
    # (GetCharWidth × fs / 1000), which diverges from the real pen under
    # letterspacing / TJ column layouts
    fadv: Tuple[float, float] = (0.0, 0.0)
    # full text-rendering matrix (glyph em-1000 space → device space) and
    # the Tr render mode — consumed only by glyph-outline rasterization
    # (glyphrender.py); None/0 for callers that never rasterize
    trm: Optional[Matrix] = None
    render: int = 0


class _GState:
    __slots__ = ("ctm", "char_sp", "word_sp", "hscale", "leading", "font",
                 "font_size", "rise", "render")

    def __init__(self, ctm: Matrix):
        self.ctm = ctm
        self.char_sp = 0.0
        self.word_sp = 0.0
        self.hscale = 1.0
        self.leading = 0.0
        self.font: Optional[PDFFont] = None
        self.font_size = 0.0
        self.rise = 0.0
        self.render = 0

    def clone(self) -> "_GState":
        g = _GState(self.ctm)
        for s in self.__slots__:
            setattr(g, s, getattr(self, s))
        return g


class ContentInterpreter:
    def __init__(self, pdf: PDFFile):
        self.pdf = pdf
        self._font_cache: Dict[object, PDFFont] = {}
        self._obj_counter = 0

    def _get_font(self, resources: dict, name: str) -> Optional[PDFFont]:
        fonts = self.pdf.resolve(resources.get("Font")) or {}
        ref = fonts.get(name)
        key = ref if isinstance(ref, Ref) else None
        if key is not None and key in self._font_cache:
            return self._font_cache[key]
        d = self.pdf.resolve(ref)
        if not isinstance(d, dict):
            return None
        if key is None:
            key = id(d)
            if key in self._font_cache:
                return self._font_cache[key]
        try:
            font = load_font(self.pdf, d)
        except Exception:
            return None
        self._font_cache[key] = font
        return font

    # -- main loop --------------------------------------------------------

    def chars_for_page(self, page: dict) -> List[Char]:
        content = self.pdf.page_content(page)
        resources = self.pdf.resolve(page.get("Resources")) or {}
        out: List[Char] = []
        self._run(content, resources, IDENTITY, out, 0)
        return out

    def images_for_page(self, page: dict) -> List[tuple]:
        """(Stream, ctm) per Image-XObject ``Do``, in paint order — the
        ctm is the full transform at the invocation (form matrices
        composed in), mapping the image's unit square to user space.
        Inline images (BI/ID/EI) are not collected (none in the corpus;
        documented seam)."""
        content = self.pdf.page_content(page)
        resources = self.pdf.resolve(page.get("Resources")) or {}
        out: List[Char] = []
        images: List[tuple] = []
        self._run(content, resources, IDENTITY, out, 0, images=images)
        return images

    def _run(
        self,
        content: bytes,
        resources: dict,
        base_ctm: Matrix,
        out: List[Char],
        depth: int,
        images: Optional[List[tuple]] = None,
    ) -> None:
        if depth > 8:
            return
        lx = Lexer(content)
        stack: List[object] = []
        gs = _GState(base_ctm)
        gs_stack: List[_GState] = []
        tm: Matrix = IDENTITY
        tlm: Matrix = IDENTITY
        in_text = False

        def num(v, default=0.0) -> float:
            return float(v) if isinstance(v, (int, float)) else default

        data = content
        nbytes = len(data)
        tok_match = _RUN_TOKEN_RE.match
        while True:
            # one fused C-level match replaces the skip_ws / peek_byte /
            # _NUMBER_RE / read_token call sequence (the per-token Python
            # call overhead dominated the decode profile)
            m = tok_match(data, lx.pos)
            tok = m.group(1)
            if tok is not None:
                # numeric operand fast path (content streams carry no
                # indirect references, so skip the "N G R" lookahead)
                lx.pos = m.end()
                stack.append(float(tok) if (b"." in tok) else int(tok))
                continue
            op = m.group(2)
            if op is None:
                p = m.end()
                if p >= nbytes:
                    break
                c = data[p]
                if c == 0x5B:
                    # content-stream array (TJ): elements are numbers
                    # and strings only — skip parse_object's "N G R"
                    # indirect-reference lookahead for numeric elements
                    lx.pos = p + 1
                    arr: List[object] = []
                    while True:
                        ma = tok_match(data, lx.pos)
                        atok = ma.group(1)
                        if atok is not None:
                            lx.pos = ma.end()
                            arr.append(
                                float(atok) if (b"." in atok) else int(atok)
                            )
                            continue
                        pa = ma.start(2) if ma.group(2) is not None else ma.end()
                        if pa >= nbytes:
                            lx.pos = pa
                            break
                        if data[pa] == 0x5D:
                            lx.pos = pa + 1
                            break
                        lx.pos = pa
                        arr.append(parse_object(lx, self.pdf))
                    stack.append(arr)
                    continue
                if c == 0x2F or c == 0x28 or c == 0x3C:
                    lx.pos = p
                    obj = parse_object(lx, self.pdf)
                    stack.append(obj)
                    continue
                # stray delimiter byte — read_token consumes exactly one
                lx.pos = p + 1
                op = data[p : p + 1]
            else:
                lx.pos = m.end()
            if op == b"q":
                gs_stack.append(gs.clone())
            elif op == b"Q":
                if gs_stack:
                    gs = gs_stack.pop()
            elif op == b"cm" and len(stack) >= 6:
                m = tuple(num(v) for v in stack[-6:])
                gs.ctm = mat_mul(m, gs.ctm)  # type: ignore[arg-type]
            elif op == b"BT":
                in_text = True
                tm = tlm = IDENTITY
            elif op == b"ET":
                in_text = False
            elif op == b"Tf" and len(stack) >= 2:
                fname = stack[-2]
                gs.font_size = num(stack[-1])
                if isinstance(fname, Name):
                    gs.font = self._get_font(resources, str(fname))
            elif op == b"Td" and len(stack) >= 2:
                tlm = mat_mul(
                    (1, 0, 0, 1, num(stack[-2]), num(stack[-1])), tlm
                )
                tm = tlm
            elif op == b"TD" and len(stack) >= 2:
                gs.leading = -num(stack[-1])
                tlm = mat_mul(
                    (1, 0, 0, 1, num(stack[-2]), num(stack[-1])), tlm
                )
                tm = tlm
            elif op == b"Tm" and len(stack) >= 6:
                tlm = tuple(num(v) for v in stack[-6:])  # type: ignore[assignment]
                tm = tlm
            elif op == b"T*":
                tlm = mat_mul((1, 0, 0, 1, 0, -gs.leading), tlm)
                tm = tlm
            elif op == b"TL" and stack:
                gs.leading = num(stack[-1])
            elif op == b"Tc" and stack:
                gs.char_sp = num(stack[-1])
            elif op == b"Tw" and stack:
                gs.word_sp = num(stack[-1])
            elif op == b"Tz" and stack:
                gs.hscale = num(stack[-1]) / 100.0
            elif op == b"Ts" and stack:
                gs.rise = num(stack[-1])
            elif op == b"Tr" and stack:
                gs.render = int(num(stack[-1]))
            elif op == b"Tj" and stack:
                s = stack[-1]
                if isinstance(s, bytes) and in_text:
                    self._obj_counter += 1
                    tm = self._show(s, gs, tm, out)
            elif op == b"'" and stack:
                tlm = mat_mul((1, 0, 0, 1, 0, -gs.leading), tlm)
                tm = tlm
                s = stack[-1]
                if isinstance(s, bytes) and in_text:
                    self._obj_counter += 1
                    tm = self._show(s, gs, tm, out)
            elif op == b'"' and len(stack) >= 3:
                gs.word_sp = num(stack[-3])
                gs.char_sp = num(stack[-2])
                tlm = mat_mul((1, 0, 0, 1, 0, -gs.leading), tlm)
                tm = tlm
                s = stack[-1]
                if isinstance(s, bytes) and in_text:
                    self._obj_counter += 1
                    tm = self._show(s, gs, tm, out)
            elif op == b"TJ" and stack:
                arr = stack[-1]
                if isinstance(arr, list) and in_text:
                    self._obj_counter += 1
                    for item in arr:
                        if isinstance(item, bytes):
                            tm = self._show(item, gs, tm, out)
                        elif isinstance(item, (int, float)):
                            tx = (
                                -float(item) / 1000.0
                            ) * gs.font_size * gs.hscale
                            tm = mat_mul((1, 0, 0, 1, tx, 0), tm)
            elif op == b"Do" and stack:
                xname = stack[-1]
                if isinstance(xname, Name):
                    self._do_xobject(
                        str(xname), resources, gs, out, depth, images
                    )
            elif op == b"BI":
                st = self._parse_inline_image(lx)
                if st is not None and images is not None:
                    images.append((st, gs.ctm))
            if op not in (b"", b"(", b"<"):
                stack.clear()
        return

    # full names for the inline-image abbreviated keys (spec table 91)
    _BI_KEYS = {
        "W": "Width", "H": "Height", "BPC": "BitsPerComponent",
        "CS": "ColorSpace", "F": "Filter", "IM": "ImageMask",
        "D": "Decode", "DP": "DecodeParms", "L": "Length",
        "I": "Interpolate",
    }
    _BI_CS = {"G": "DeviceGray", "RGB": "DeviceRGB", "CMYK": "DeviceCMYK",
              "I": "Indexed"}
    _BI_FILTERS = {"AHx": "ASCIIHexDecode", "A85": "ASCII85Decode",
                   "Fl": "FlateDecode", "LZW": "LZWDecode",
                   "RL": "RunLengthDecode", "CCF": "CCITTFaxDecode",
                   "DCT": "DCTDecode"}

    @staticmethod
    def _skip_to_ei(lx: Lexer) -> None:
        """Advance past the next ``EI`` on a token boundary (the
        conservative pre-round-4 skip, kept as the malformed-dict
        fallback so the interpreter always resynchronizes)."""
        data = lx.data
        p = lx.pos
        while True:
            idx = data.find(b"EI", p)
            if idx < 0:
                lx.pos = len(data)
                return
            before_ok = idx == 0 or data[idx - 1] in b"\x00\t\n\x0c\r "
            after = data[idx + 2 : idx + 3]
            after_ok = after == b"" or after[0] in b"\x00\t\n\x0c\r "
            if before_ok and after_ok:
                lx.pos = idx + 2
                return
            p = idx + 2

    def _parse_inline_image(self, lx: Lexer) -> Optional[Stream]:
        """BI ... ID <data> EI → a normalized image Stream (abbreviated
        keys/filters/colorspaces expanded so images.decode_image handles
        it like an Image XObject). Uncompressed data ends at the exact
        sample-byte count; filtered data at an ``EI`` on a token
        boundary. Returns None (stream skipped) on malformed dicts."""
        d: dict = {}
        while True:
            lx.skip_ws()
            c = lx.peek_byte()
            if c == -1:
                return None
            if c == 0x2F:  # /Key value
                key = parse_object(lx, self.pdf)
                val = parse_object(lx, self.pdf)
                if isinstance(key, Name):
                    d[self._BI_KEYS.get(str(key), str(key))] = val
                continue
            tok = lx.read_token()
            if tok == b"ID":
                break
            if tok == b"":
                return None
        # exactly one whitespace byte separates ID from the data
        if lx.peek_byte() in (0x20, 0x0A, 0x0D, 0x09, 0x0C, 0x00):
            lx.pos += 1

        def norm_one(v):
            if isinstance(v, Name):
                s = str(v)
                return Name(self._BI_FILTERS.get(
                    s, self._BI_CS.get(s, s)
                ))
            return v

        filters = d.get("Filter")
        if isinstance(filters, list):
            d["Filter"] = [norm_one(f) for f in filters]
        elif filters is not None:
            d["Filter"] = norm_one(filters)
        cs = d.get("ColorSpace")
        if isinstance(cs, list):
            d["ColorSpace"] = [norm_one(x) for x in cs]
        elif cs is not None:
            d["ColorSpace"] = norm_one(cs)

        data = lx.data
        start = lx.pos
        if d.get("Filter") is None:
            # exact length: ceil(W*ncomp*BPC/8) * H sample bytes
            w = int(d.get("Width") or 0)
            h = int(d.get("Height") or 0)
            bpc = 1 if d.get("ImageMask") else int(
                d.get("BitsPerComponent") or 8
            )
            cs = d.get("ColorSpace")
            nc = 3 if str(cs) in ("DeviceRGB",) else (
                4 if str(cs) in ("DeviceCMYK",) else 1
            )
            end = start + ((w * nc * bpc + 7) // 8) * h
            if w <= 0 or h <= 0 or end > len(data):
                self._skip_to_ei(lx)
                return None
            lx.pos = end
            lx.skip_ws()
            if lx.data[lx.pos : lx.pos + 2] == b"EI":
                lx.pos += 2
            return Stream(d, data[start:end])
        # filtered: scan for EI at a token boundary
        p = start
        while True:
            idx = data.find(b"EI", p)
            if idx < 0:
                lx.pos = len(data)
                return None
            before_ok = idx == 0 or data[idx - 1] in b"\x00\t\n\x0c\r "
            after = data[idx + 2 : idx + 3]
            after_ok = after == b"" or after[0] in b"\x00\t\n\x0c\r "
            if before_ok and after_ok:
                lx.pos = idx + 2
                # strip the single whitespace byte before EI
                end = idx - 1 if idx > start else idx
                return Stream(d, data[start:end])
            p = idx + 2

    # -- helpers ----------------------------------------------------------

    def _do_xobject(
        self,
        name: str,
        resources: dict,
        gs: _GState,
        out: List[Char],
        depth: int,
        images: Optional[List[tuple]] = None,
    ) -> None:
        xobjs = self.pdf.resolve(resources.get("XObject")) or {}
        st = self.pdf.resolve(xobjs.get(name))
        if not isinstance(st, Stream):
            return
        subtype = self.pdf.resolve(st.dict.get("Subtype"))
        if subtype == "Image":
            if images is not None:
                images.append((st, gs.ctm))
            return
        if subtype != "Form":
            return
        mtx = self.pdf.resolve(st.dict.get("Matrix"))
        m: Matrix = IDENTITY
        if isinstance(mtx, list) and len(mtx) == 6:
            m = tuple(float(self.pdf.resolve(v) or 0.0) for v in mtx)  # type: ignore[assignment]
        inner_res = self.pdf.resolve(st.dict.get("Resources")) or resources
        try:
            body = decode_stream(st, self.pdf)
        except Exception:
            return
        self._run(
            body, inner_res, mat_mul(m, gs.ctm), out, depth + 1, images
        )

    def _show(
        self, raw: bytes, gs: _GState, tm: Matrix, out: List[Char]
    ) -> Matrix:
        font = gs.font
        if font is None:
            return tm
        fs = gs.font_size
        hs = gs.hscale
        rise = gs.rise
        # linear part of tm·ctm is invariant across the string (per-char
        # advances only translate); track the origin incrementally
        a, b, c2, d2, e, f = mat_mul(tm, gs.ctm)
        sx = fs * hs
        norm = math.hypot(a, b)
        direction = (a / norm, b / norm) if norm > 0 else (1.0, 0.0)
        fs_dev = fs * math.hypot(c2, d2)
        total_tx = 0.0
        # string-invariant linear parts (per-char advances only shift
        # e/f); the axis-aligned case (b == c2 == 0, the overwhelmingly
        # common one) gets a corner-free glyph-box fast path below
        m0 = sx * a
        m1 = sx * b
        m2 = fs * c2
        m3 = fs * d2
        re_ = rise * c2
        rf_ = rise * d2
        axis_aligned = b == 0.0 and c2 == 0.0
        show_cache = getattr(font, "_show_cache", None)
        if show_cache is None:
            show_cache = font._show_cache = {}
        for code in font.iter_codes(raw):
            trm = (m0, m1, m2, m3, re_ + e, rf_ + f)
            ox = trm[4]
            oy = trm[5]
            # one cache entry per (font, code) folds the unicode
            # normalization + glyph box + width + word-space lookups
            # into a single dict hit (hot path: once per char shown)
            ent = show_cache.get(code)
            if ent is None:
                uni = font.unicode(code)
                if uni == "" and code > 0:
                    # pdfium fallback: unmapped glyphs surface as their
                    # raw charcode (observable as control chars in the
                    # goldens)
                    uni = chr(code)
                elif len(uni) == 1 and "ﬀ" <= uni <= "ﬆ":
                    # pdfium's textpage normalizes Latin ligature
                    # codepoints into their component letters
                    # ('ﬁ' → 'fi')
                    uni = _LIGATURES[uni]
                ent = (
                    uni,
                    font.glyph_box(code),
                    font.width(code) / 1000.0,
                    font.is_word_space(code),
                    bool(uni) and uni.isspace(),
                )
                show_cache[code] = ent
            uni, gbox, w0, is_word_sp, uni_is_sp = ent
            dev_box = None
            if gbox is not None:
                gx0 = gbox[0] * 0.001
                gy0 = gbox[1] * 0.001
                gx1 = gbox[2] * 0.001
                gy1 = gbox[3] * 0.001
                if axis_aligned:
                    bx0 = gx0 * m0 + ox
                    bx1 = gx1 * m0 + ox
                    if bx0 > bx1:
                        bx0, bx1 = bx1, bx0
                    by0 = gy0 * m3 + oy
                    by1 = gy1 * m3 + oy
                    if by0 > by1:
                        by0, by1 = by1, by0
                    dev_box = (bx0, by0, bx1, by1)
                else:
                    pts = [
                        mat_apply(trm, gx0, gy0),
                        mat_apply(trm, gx1, gy0),
                        mat_apply(trm, gx0, gy1),
                        mat_apply(trm, gx1, gy1),
                    ]
                    xs = [p[0] for p in pts]
                    ys = [p[1] for p in pts]
                    dev_box = (min(xs), min(ys), max(xs), max(ys))
            tx = (w0 * fs + gs.char_sp) * hs
            if is_word_sp:
                tx += gs.word_sp * hs
            # advance vector in device space: image of (tx, 0) under the
            # (string-invariant) linear part of tm·ctm
            adv = (tx * a, tx * b)
            txf = w0 * fs * hs
            is_space = is_word_sp or uni_is_sp
            out.append(
                Char(
                    uni, dev_box, ox, oy, adv, fs_dev, is_space, code, font,
                    self._obj_counter, direction, (txf * a, txf * b),
                    trm, gs.render,
                )
            )
            e += tx * a
            f += tx * b
            total_tx += tx
        return mat_mul((1, 0, 0, 1, total_tx, 0), tm)
