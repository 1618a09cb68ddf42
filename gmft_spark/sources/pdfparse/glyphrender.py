"""Glyph-outline page rasterization: REAL ink, not word occupancy.

Renders a parsed PDF page by filling every glyph's actual outline
(CFF/Type1 charstring paths, TrueType glyf contours — parsed from the
embedded font programs by cff.py / type1.py / sfnt.py) at its text
rendering matrix. This is the text-fidelity upgrade over
``kernel.raster.render_words``'s word-box occupancy: the image-side
detectors (operators/render.py → detect/img2table) see realistic ink
when driven over real documents (reference parity: pdfium's
``FPDF_RenderPageBitmap`` ink placement, sans anti-aliasing — coverage
here is binary at pixel centers, deterministic across platforms).

Coordinate convention matches ``ParsedPDF.page_words``: raw user-space
x, y flipped by the CROP height (top-left origin), so ink aligns with
the word boxes the rest of the pipeline uses.

Scale design: rasterization is per-page, embarrassingly parallel — the
Spark surface (operators/render.py ``rasterize_pdf_pages``) runs it as a
narrow ``mapInPandas`` over (doc, page) rows. Within a page, glyph
bitmaps are cached per (font, code, quantized-matrix): a body-text page
pays the outline→scanline cost once per distinct glyph, then blits.

What does NOT ink here (documented seams, same as pdfium's text
layer): vector path operators (re/l/c + f/S strokes — rules, borders);
text render modes 3/7 (invisible/clip-only) are skipped. Embedded
images DO ink via the sibling ``images.render_page_full`` (JPEG/raw
XObjects decoded and composited under the CTM before the text layer).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from gmft_spark.kernel.raster import fill_contours_mask
from gmft_spark.sources.pdfparse.content import Char

# render modes that paint no fill: 3 = invisible, 7 = clip-only
_NO_FILL_MODES = (3, 7)


def _glyph_bitmap(
    font, code: int, lin: Tuple[float, float, float, float], scale: float
) -> Optional[Tuple[np.ndarray, int, int]]:
    """(mask, x_off, y_off) for one glyph under the linear part of its
    text rendering matrix, in raster pixels (y down), origin-relative.
    None when the font yields no contours (caller falls back to the
    glyph box); an all-empty mask means a blank glyph (no ink at all).

    Cached on the font object keyed by (code, quantized lin, scale) —
    the linear part is string-invariant within a text object and almost
    always page-invariant, so a page rasterizes each distinct glyph
    once."""
    key = (
        code,
        round(lin[0], 4),
        round(lin[1], 4),
        round(lin[2], 4),
        round(lin[3], 4),
        round(scale, 4),
    )
    cache = getattr(font, "_bitmap_cache", None)
    if cache is None:
        cache = font._bitmap_cache = {}
    if key in cache:
        return cache[key]
    contours = font.glyph_contours(code)
    out: Optional[Tuple[np.ndarray, int, int]]
    if contours is None:
        out = None
    elif not contours:
        out = (np.zeros((0, 0), dtype=bool), 0, 0)  # blank: inkless
    else:
        m0, m1, m2, m3 = lin
        px: List[List[Tuple[float, float]]] = []
        for c in contours:
            pts = []
            for x, y in c:
                gx = (x * m0 + y * m2) * 0.001 * scale
                gy = -(x * m1 + y * m3) * 0.001 * scale  # device y-up → raster y-down
                pts.append((gx, gy))
            px.append(pts)
        xs = [p[0] for c in px for p in c]
        ys = [p[1] for c in px for p in c]
        x_off = int(math.floor(min(xs)))
        y_off = int(math.floor(min(ys)))
        w = int(math.ceil(max(xs))) - x_off + 1
        h = int(math.ceil(max(ys))) - y_off + 1
        if w <= 0 or h <= 0 or w > 4096 or h > 4096:
            out = None  # degenerate/hostile extents: fall back
        else:
            local = [
                [(p[0] - x_off, p[1] - y_off) for p in c] for c in px
            ]
            out = (fill_contours_mask(h, w, local), x_off, y_off)
    cache[key] = out
    return out


def _blit(canvas: np.ndarray, mask: np.ndarray, x0: int, y0: int) -> None:
    H, W = canvas.shape
    h, w = mask.shape
    sx0, sy0 = max(0, -x0), max(0, -y0)
    dx0, dy0 = max(0, x0), max(0, y0)
    dx1, dy1 = min(W, x0 + w), min(H, y0 + h)
    if dx1 <= dx0 or dy1 <= dy0:
        return
    sub = mask[sy0 : sy0 + (dy1 - dy0), sx0 : sx0 + (dx1 - dx0)]
    canvas[dy0:dy1, dx0:dx1][sub] = 0


def _fallback_box(
    canvas: np.ndarray, ch: Char, height: float, scale: float
) -> None:
    """No outline available (no embedded program): ink the glyph box —
    the word-occupancy fidelity floor, applied per glyph."""
    if ch.box is None or ch.space:
        return
    x0, y0, x1, y1 = ch.box
    # box is raw user space (y up): flip, then [floor, ceil) pixel rule
    py0 = (height - y1) * scale
    py1 = (height - y0) * scale
    a_x, b_x = int(math.floor(x0 * scale)), int(math.ceil(x1 * scale))
    a_y, b_y = int(math.floor(py0)), int(math.ceil(py1))
    H, W = canvas.shape
    canvas[max(a_y, 0) : min(b_y, H), max(a_x, 0) : min(b_x, W)] = 0


def build_template_library(
    doc, scale: float = 1.0, pages=None, lib=None
):
    """OCR template library for a document: one entry per distinct
    (font, code, rendering matrix) at ``scale`` — the exact bitmaps the
    glyph renderer blits, labeled with the font's unicode mapping. In a
    real pipeline the fonts ARE the document's embedded (subset)
    programs, so this is what a renderer-aware OCR engine knows without
    reading the text. Chars without outlines (descriptor-only fonts) or
    without unicode contribute nothing."""
    from gmft_spark.kernel.ocr import TemplateLibrary

    if lib is None:
        lib = TemplateLibrary()
    seen = set()
    for p in pages if pages is not None else range(len(doc)):
        for ch in doc.page_chars(p):
            if ch.font is None or ch.trm is None or ch.code < 0:
                continue
            key = (
                id(ch.font),
                ch.code,
                round(ch.trm[0], 4),
                round(ch.trm[1], 4),
                round(ch.trm[2], 4),
                round(ch.trm[3], 4),
            )
            if key in seen:
                continue
            seen.add(key)
            bm = _glyph_bitmap(ch.font, ch.code, ch.trm[:4], scale)
            if bm is None or bm[0].size == 0 or not bm[0].any():
                continue
            # advance in page pixels (axis-aligned: device advance =
            # glyph width/1000 × m0) and left side bearing = the ink's
            # pixel offset from the pen origin — both ride the template
            # so the OCR can reconstruct pen positions for word gaps
            adv_px = ch.font.width(ch.code) * 0.001 * ch.trm[0] * scale
            lib.add(bm[0], ch.uni, adv=adv_px, lsb=float(bm[1]))
    return lib


def ocr_pdf_page(doc, page_no: int, scale: float = 1.0, lib=None) -> str:
    """Recognize one page's text from PIXELS alone: render with glyph
    outlines, then template-OCR the ink back to characters
    (kernel/ocr.py). ``lib`` defaults to the document's own template
    library. The round trip is exact wherever glyphs don't overlap and
    distinct characters don't share a bitmap at the rendered size."""
    if lib is None:
        lib = build_template_library(doc, scale=scale)
    from gmft_spark.kernel.ocr import assemble_text, ocr_page

    arr = render_page_glyphs(doc, page_no, scale=scale)
    return assemble_text(ocr_page(arr < 128, lib))


def render_page_glyphs(
    doc,
    page_no: int,
    scale: float = 1.0,
    chars: Optional[List[Char]] = None,
    canvas: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Rasterize one page's text ink from real glyph outlines.

    Returns an (H, W) uint8 canvas, white 255 background, black 0 ink,
    H = ceil(crop_height·scale), W = ceil(crop_width·scale).
    ``chars`` short-circuits the content re-parse when the caller
    already extracted the page's characters. ``canvas`` lets a caller
    ink text OVER an already-painted layer (images.render_page_full);
    when given it must be page-sized and is mutated in place.
    """
    width, height = doc.page_size(page_no)
    if canvas is None:
        H = max(1, int(math.ceil(height * scale)))
        W = max(1, int(math.ceil(width * scale)))
        canvas = np.full((H, W), 255, dtype=np.uint8)
    for ch in chars if chars is not None else doc.page_chars(page_no):
        if ch.render in _NO_FILL_MODES:
            continue
        font, trm = ch.font, ch.trm
        if font is None or trm is None:
            _fallback_box(canvas, ch, height, scale)
            continue
        bm = _glyph_bitmap(font, ch.code, trm[:4], scale)
        if bm is None:
            _fallback_box(canvas, ch, height, scale)
            continue
        mask, x_off, y_off = bm
        if mask.size == 0:
            continue  # blank glyph: no ink
        # pen origin in raster pixels (quantized blit keeps the bitmap
        # cache effective; sub-pixel error < 0.5px, deterministic)
        px = int(round(trm[4] * scale))
        py = int(round((height - trm[5]) * scale))
        _blit(canvas, mask, px + x_off, py + y_off)
    return canvas
