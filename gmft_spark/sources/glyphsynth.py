"""Synthetic CFF glyph suite with CLOSED-FORM ink — the value-hash
twin for the glyph-outline rasterizer (VERDICT r04 item #6).

``pdf_glyph_render_pipeline`` rasterizes real conversation PDFs whose
glyph ink is not SQL-derivable (their outlines come from real font
programs), so it could only ever be a rows-only driver check. This
module closes that gap: it emits a minimal but fully compliant CFF
(Type1C) font from scratch — header, Name/TopDICT/String/CharStrings
INDEXes, format-0 charset, Private DICT — whose every glyph is an
axis-aligned INTEGER rectangle charstring (``w x0 y0 rmoveto``,
``rlineto`` edges, ``endchar``), embeds it in a one-page PDF via
FontFile3, and places each glyph at an integer pen position at font
size 1000 (1 charstring unit == 1 raster pixel at scale 1).

The REAL pipeline then runs end-to-end — PDF parse, font-program
load (fonts.SimpleFont → cff.CFFFont), Type2 charstring
interpretation (cff._exec → _PathRun), nonzero-winding scanline fill
(raster.fill_contours_mask), page blit (glyphrender) — and, because
every rectangle lands on exact pixel boundaries and the grid layout
precludes overlap, the page's ink-pixel count is EXACTLY the sum of
the rectangle areas: pixel centers (x+0.5, y+0.5) are strictly
inside an integer-aligned rect for exactly w*h pixels. The DuckDB
oracle re-derives that sum from the integer formulas below without
touching a single byte of font code — a full independent value hash
over the glyph-rendering stack.

Formulas (PAIRED with GLYPH_RENDER_PARITY_SQL at the bottom of this
module — change both or neither):

    j in [0, N_GLYPHS)   glyph index on the page
    w = 4 + (doc_id*7  + j*13) % 29      rect width  (px), <= 32
    h = 3 + (doc_id*11 + j*5)  % 31      rect height (px), <= 33
    col = j % 12, row = j // 12          grid cell (48 x 60 px)
    pen x = 24 + col*48, pen y = 700 - row*60   (user space, y up)

Cell pitch (48, 60) strictly exceeds the max rect (32, 33), so
rectangles never overlap and never clip at the page edge.
"""

from __future__ import annotations

import struct
from typing import List, Tuple

N_GLYPHS = 24
PAGE_W = 612
PAGE_H = 792
FIRST_CODE = 65  # 'A'


def rect_for(doc_id: int, j: int) -> Tuple[int, int]:
    """(w, h) of glyph ``j``'s rectangle — the SQL-paired formula."""
    return (
        4 + (doc_id * 7 + j * 13) % 29,
        3 + (doc_id * 11 + j * 5) % 31,
    )


def pen_for(j: int) -> Tuple[int, int]:
    """Integer pen position (user space, y up) for glyph ``j``."""
    return 24 + (j % 12) * 48, 700 - (j // 12) * 60


# ── minimal CFF writer ───────────────────────────────────────────────


def _int5(v: int) -> bytes:
    """Fixed-width DICT integer (operator 29): layout sizes stay
    independent of the offset values, so one assembly pass suffices."""
    return bytes([29]) + struct.pack(">i", v)


def _cs_num(v: int) -> bytes:
    """Type2 charstring shortint (operator 28)."""
    return bytes([28]) + struct.pack(">h", v)


def _cff_index(items: List[bytes]) -> bytes:
    count = len(items)
    if count == 0:
        return struct.pack(">H", 0)
    offs = [1]
    for it in items:
        offs.append(offs[-1] + len(it))
    osz = 1 if offs[-1] < 0x100 else (2 if offs[-1] < 0x10000 else 4)
    out = struct.pack(">HB", count, osz)
    for o in offs:
        out += o.to_bytes(osz, "big")
    return out + b"".join(items)


def _rect_charstring(x0: int, y0: int, w: int, h: int, adv: int) -> bytes:
    """``adv x0 y0 rmoveto  w 0 rlineto  0 h rlineto  -w 0 rlineto
    endchar`` — the implicit closepath supplies the fourth edge."""
    return (
        _cs_num(adv)
        + _cs_num(x0)
        + _cs_num(y0)
        + b"\x15"  # rmoveto (3 operands -> first is the width)
        + _cs_num(w)
        + _cs_num(0)
        + b"\x05"  # rlineto
        + _cs_num(0)
        + _cs_num(h)
        + b"\x05"
        + _cs_num(-w)
        + _cs_num(0)
        + b"\x05"
        + b"\x0e"  # endchar
    )


def build_rect_cff(rects: List[Tuple[int, int]], adv: int = 48) -> bytes:
    """A complete non-CID CFF font: glyph 0 = .notdef (blank), glyph
    1+i = the i-th rectangle anchored at the glyph origin, named
    ``r<i>`` via the String INDEX + format-0 charset."""
    n = len(rects)
    name_index = _cff_index([b"SynthRect"])
    string_index = _cff_index(
        [b"r%d" % i for i in range(n)]
    )  # SIDs 391..390+n
    gsubr_index = _cff_index([])
    charstrings = _cff_index(
        [_cs_num(adv) + b"\x15\x0e"]  # .notdef: width-only move, blank
        + [_rect_charstring(0, 0, w, h, adv) for (w, h) in rects]
    )
    charset = b"\x00" + b"".join(
        struct.pack(">H", 391 + i) for i in range(n)
    )
    private = bytes([139 + 0]) + bytes([20]) + bytes([139 + 0]) + bytes([21])

    # top dict: charset(15), CharStrings(17), Private(18) — fixed-width
    # operands make the dict length offset-independent
    top = (
        _int5(0) + bytes([15])
        + _int5(0) + bytes([17])
        + _int5(len(private)) + _int5(0) + bytes([18])
    )
    header = b"\x01\x00\x04\x02"
    top_index_overhead = 2 + 1 + 2 * 2  # count, offSize=2, two offsets

    def assemble(cs_off: int, charset_off: int, priv_off: int) -> bytes:
        t = (
            _int5(charset_off) + bytes([15])
            + _int5(cs_off) + bytes([17])
            + _int5(len(private)) + _int5(priv_off) + bytes([18])
        )
        ti = struct.pack(">HB", 1, 2) + struct.pack(">HH", 1, 1 + len(t)) + t
        return (
            header + name_index + ti + string_index + gsubr_index
            + charset + charstrings + private
        )

    pre = len(header) + len(name_index) + top_index_overhead + len(top)
    pre += len(string_index) + len(gsubr_index)
    charset_off = pre
    cs_off = charset_off + len(charset)
    priv_off = cs_off + len(charstrings)
    out = assemble(cs_off, charset_off, priv_off)
    return out


# ── PDF embedding ────────────────────────────────────────────────────


def glyph_parity_pdf(doc_id: int) -> bytes:
    """One-page PDF whose text ink is the closed-form rectangle grid
    for ``doc_id``, rendered through the real CFF pipeline."""
    rects = [rect_for(doc_id, j) for j in range(N_GLYPHS)]
    cff = build_rect_cff(rects)

    content = bytearray()
    for j in range(N_GLYPHS):
        x, y = pen_for(j)
        content += b"BT /F1 1000 Tf %d %d Td (%b) Tj ET\n" % (
            x,
            y,
            bytes([FIRST_CODE + j]),
        )

    diffs = b" ".join(
        b"/r%d" % j for j in range(N_GLYPHS)
    )
    widths = b" ".join(b"48" for _ in range(N_GLYPHS))
    objects: List[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"
        % (PAGE_W, PAGE_H),
        b"<< /Length %d >>\nstream\n%b\nendstream"
        % (len(content), bytes(content)),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /SynthRect "
        b"/FirstChar %d /LastChar %d /Widths [%b] "
        b"/Encoding << /Differences [%d %b] >> "
        b"/FontDescriptor 6 0 R >>"
        % (
            FIRST_CODE,
            FIRST_CODE + N_GLYPHS - 1,
            widths,
            FIRST_CODE,
            diffs,
        ),
        b"<< /Type /FontDescriptor /FontName /SynthRect /Flags 4 "
        b"/FontBBox [0 0 48 48] /Ascent 48 /Descent 0 /ItalicAngle 0 "
        b"/CapHeight 48 /StemV 80 /FontFile3 7 0 R >>",
        b"<< /Subtype /Type1C /Length %d >>\nstream\n%b\nendstream"
        % (len(cff), cff),
    ]

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objects) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_pos)
    )
    return bytes(out)


def expected_ink(doc_id: int) -> int:
    """Closed-form per-page ink pixels — the python side of the pair."""
    return sum(w * h for w, h in (rect_for(doc_id, j) for j in range(N_GLYPHS)))


# Gate subsample: one synthetic glyph document per 16 doc_ids (the
# gate envelope is shared; the formulas are smooth in doc_id, so any
# stride binds the same arithmetic — VERDICT r04 item #7 discipline).
GLYPH_MOD = 16

# DuckDB twin of the full glyph-render pipeline output: n_ink_px is
# re-derived from the rect_for/pen_for formulas alone — no font bytes,
# no rasterizer. PAIRED with rect_for/pen_for/N_GLYPHS above.
GLYPH_RENDER_PARITY_SQL = """
    WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % 16 = 0
    ),
    g AS (
        SELECT doc_id, j
        FROM ids
        CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS j) js
    ),
    ink AS (
        SELECT doc_id,
               SUM(
                   (4 + (doc_id * 7 + j * 13) % 29)
                   * (3 + (doc_id * 11 + j * 5) % 31)
               ) AS px
        FROM g GROUP BY doc_id
    )
    SELECT 'glyph-' || CAST(doc_id AS VARCHAR) AS doc_name,
           0 AS page_no,
           612 AS width,
           792 AS height,
           24 AS n_chars,
           CAST(px AS BIGINT) AS n_ink_px
    FROM ink
    ORDER BY doc_name
"""
