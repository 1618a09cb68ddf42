"""Text-from-pixels for rendered documents: deterministic template OCR.

Closes the reference's external-OCR seam (gmft/detectors/img2table.py
delegates text recognition to an engine it does not ship) for the case
this repo can be exact about: pages rasterized by a KNOWN renderer with
KNOWN fonts. The embedded font programs give every glyph's bitmap at
the page's rendering size (sources/pdfparse/glyphrender._glyph_bitmap —
the very fill the renderer used), so recognition is template
verification, not statistics.

Algorithm (page-ink-anchored, exact):
1. scan for the leftmost-then-topmost UNCLAIMED ink pixel;
2. that pixel must be some glyph's first-column top pixel (nothing else
   can paint left of it), so align every template's anchor — its own
   column-0 topmost ink pixel — there and test ``template ⊆ unclaimed
   ink`` over the template's footprint;
3. among verifying templates claim the LARGEST (max ink pixels; a
   vertical-bar 'l' is a subset of 'h''s stem — the bowl pixels decide);
4. claim exactly the template's pixels; leftover ink (the next glyph of
   a touching pair, a second quote bar) continues the scan;
5. anything no template verifies claims its connected component and
   emits U+FFFD so downstream accounting stays honest.

Multi-part glyphs (i/j dots, colons, percent signs, double quotes) need
no merge heuristics: the template bitmap spans all its parts and claims
them in one verification.

Reading order: claimed glyphs group into lines by y-overlap, x-sorted
within a line (assemble_text), with single spaces re-inserted at gaps
wider than ``space_frac`` of the line's median glyph width.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def connected_component(
    ink: np.ndarray, claimed: np.ndarray, y: int, x: int
) -> np.ndarray:
    """Bool mask of the 8-connected unclaimed ink region seeded at
    (y, x) — the unknown-glyph fallback claim."""
    h, w = ink.shape
    avail = ink & ~claimed
    mask = np.zeros_like(avail)
    stack = [(y, x)]
    mask[y, x] = True
    while stack:
        cy, cx = stack.pop()
        y0, y1 = max(0, cy - 1), min(h, cy + 2)
        x0, x1 = max(0, cx - 1), min(w, cx + 2)
        for ny in range(y0, y1):
            for nx in range(x0, x1):
                if avail[ny, nx] and not mask[ny, nx]:
                    mask[ny, nx] = True
                    stack.append((ny, nx))
    return mask


class Template:
    __slots__ = (
        "bitmap", "char", "anchor_dy", "npix", "adv", "lsb",
        "col0_run", "probes",
    )

    def __init__(
        self, bitmap: np.ndarray, char: str, adv: float = 0.0, lsb: float = 0.0
    ):
        self.bitmap = bitmap
        self.char = char
        col0 = np.nonzero(bitmap[:, 0])[0]
        self.anchor_dy = int(col0[0])
        self.npix = int(bitmap.sum())
        # advance width and left side bearing in page pixels: the fonts
        # are KNOWN, so the pen position after each glyph is too — word
        # gaps are measured from the PEN, not the ink (a thin '1' has a
        # wide advance; ink-gap heuristics split "100" into words)
        self.adv = adv
        self.lsb = lsb
        # fast-reject precomputation: contiguous ink run below the
        # anchor in column 0 (the page must have at least that run), and
        # three probe pixels checked before the full bitmap compare
        run = 0
        for yy in range(self.anchor_dy, bitmap.shape[0]):
            if bitmap[yy, 0]:
                run += 1
            else:
                break
        self.col0_run = run
        ys, xs = np.nonzero(bitmap)
        k = len(ys)
        self.probes = [
            (int(ys[i]) - self.anchor_dy, int(xs[i]))
            for i in (k - 1, k // 2, k // 3)
        ]


class TemplateLibrary:
    """Glyph bitmaps → characters. ``add`` trims to the tight ink bbox;
    duplicate bitmaps keep the FIRST registration (callers add fonts in
    document order, codes ascending — deterministic)."""

    def __init__(self):
        self._templates: List[Template] = []
        self._seen: Dict[bytes, str] = {}

    @staticmethod
    def _key(bm: np.ndarray) -> bytes:
        return (
            bm.shape[0].to_bytes(2, "big")
            + bm.shape[1].to_bytes(2, "big")
            + np.packbits(bm).tobytes()
        )

    def add(
        self, bm: np.ndarray, char: str, adv: float = 0.0, lsb: float = 0.0
    ) -> None:
        if bm.size == 0 or not bm.any() or not char or char.isspace():
            return
        ys, xs = np.nonzero(bm)
        lsb = lsb + float(xs.min())  # trim shifts the ink's left edge
        bm = bm[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]
        k = self._key(bm)
        if k in self._seen:
            return
        self._seen[k] = char
        self._templates.append(Template(bm, char, adv, lsb))
        # largest-first keeps the claim rule a simple first-hit scan
        self._templates.sort(key=lambda t: -t.npix)

    def __len__(self) -> int:
        return len(self._templates)

    def verify_at(
        self,
        ink: np.ndarray,
        claimed: np.ndarray,
        y: int,
        x: int,
    ) -> Optional[Template]:
        """Largest template whose anchor aligns at the unclaimed ink
        pixel (y, x) and whose every pixel is INK. Verification is
        against ink, not unclaimed ink: overlapping neighbors (tight
        kerning, rotated spine text) share pixels, and the shared ink
        must count for BOTH glyphs — the scan's progress guarantee comes
        from the anchor pixel being unclaimed, not the footprint."""
        h, w = ink.shape
        # page-side column run below the anchor (computed once)
        run = 0
        for yy in range(y, h):
            if ink[yy, x]:
                run += 1
            else:
                break
        for t in self._templates:
            if t.col0_run > run:
                continue
            oy = y - t.anchor_dy
            ox = x
            th, tw = t.bitmap.shape
            if oy < 0 or ox < 0 or oy + th > h or ox + tw > w:
                continue
            if not all(ink[y + py, x + px] for py, px in t.probes):
                continue
            win_ink = ink[oy : oy + th, ox : ox + tw]
            if np.array_equal(t.bitmap & win_ink, t.bitmap):
                return t
        return None


def ocr_page(
    ink: np.ndarray, lib: TemplateLibrary
) -> List[Tuple[int, int, int, int, str]]:
    """(x0, y0, x1, y1, char) per claimed glyph, in claim order (left to
    right by construction). Unverifiable ink claims its component as
    U+FFFD."""
    ink = ink.astype(bool)
    claimed = np.zeros_like(ink)
    out: List[Tuple[int, int, int, int, str, float]] = []
    # column-major scan: leftmost unclaimed ink first
    avail_cols = ink.any(axis=0)
    x = 0
    w = ink.shape[1]
    while x < w:
        if not avail_cols[x]:
            x += 1
            continue
        col = ink[:, x] & ~claimed[:, x]
        ys = np.nonzero(col)[0]
        if len(ys) == 0:
            avail_cols[x] = (ink[:, x] & ~claimed[:, x]).any()
            if not avail_cols[x]:
                x += 1
            continue
        y = int(ys[0])
        t = lib.verify_at(ink, claimed, y, x)
        if t is not None:
            th, tw = t.bitmap.shape
            oy = y - t.anchor_dy
            claimed[oy : oy + th, x : x + tw] |= t.bitmap
            # pen origin = ink start minus left side bearing; next pen =
            # origin + advance (both known from the template's font)
            out.append((x, oy, x + tw, oy + th, t.char, x - t.lsb + t.adv))
        else:
            comp = connected_component(ink, claimed, y, x)
            claimed |= comp
            cys, cxs = np.nonzero(comp)
            out.append(
                (
                    int(cxs.min()),
                    int(cys.min()),
                    int(cxs.max()) + 1,
                    int(cys.max()) + 1,
                    "�",
                    float(cxs.max()) + 1,
                )
            )
        # stay on this column until its ink is exhausted
    return out


def column_dividers(
    tile_ink: np.ndarray, min_rel: float = 2.0, min_px: int = 4
) -> List[float]:
    """Column dividers of a table tile from its ink projection: interior
    blank column runs that are SIGNIFICANTLY wider than the tile's
    typical gap (≥ ``min_rel`` × the median blank-run width, and at
    least ``min_px``). Inter-word spaces share one narrow width scale;
    inter-column gutters are a multiple of it — a text paragraph (all
    gaps alike) therefore yields NO dividers, which is the single-column
    rejection the reference's formatters apply."""
    colmask = tile_ink.any(axis=0)
    xs = np.nonzero(colmask)[0]
    if len(xs) == 0:
        return []
    gaps = []
    run = None
    for x in range(xs[0], xs[-1] + 1):
        if not colmask[x]:
            if run is None:
                run = x
        elif run is not None:
            gaps.append((run, x))
            run = None
    if not gaps:
        return []
    widths = sorted(b - a for a, b in gaps)
    med = widths[len(widths) // 2]
    thr = max(min_rel * med, float(min_px))
    return [(a + b) / 2.0 for a, b in gaps if b - a >= thr]


def row_dividers(tile_ink: np.ndarray) -> List[float]:
    """Row dividers: every interior blank row run's midpoint (text lines
    separate cleanly; no width filter needed on the row axis)."""
    rowmask = tile_ink.any(axis=1)
    ys = np.nonzero(rowmask)[0]
    if len(ys) == 0:
        return []
    out = []
    run = None
    for y in range(ys[0], ys[-1] + 1):
        if not rowmask[y]:
            if run is None:
                run = y
        elif run is not None:
            out.append((run + y) / 2.0)
            run = None
    return out


def glyphs_to_grid(
    glyphs: List[Tuple[int, int, int, int, str, float]],
    bbox: Tuple[int, int, int, int],
    col_div: List[float],
    row_div: List[float],
) -> List[List[str]]:
    """Assign recognized glyphs (page coordinates) to the divider grid of
    the table at ``bbox`` by their centers; each cell's text assembles
    with the same pen-gap word rule as free text."""
    import bisect

    x0, y0, x1, y1 = bbox
    cells: Dict[Tuple[int, int], List] = {}
    for g in glyphs:
        gx = (g[0] + g[2]) / 2.0
        gy = (g[1] + g[3]) / 2.0
        if not (x0 <= gx <= x1 and y0 <= gy <= y1):
            continue
        r = bisect.bisect(row_div, gy)
        c = bisect.bisect(col_div, gx)
        cells.setdefault((r, c), []).append(g)
    return [
        [
            assemble_text(cells.get((r, c), [])).replace("\n", " ")
            for c in range(len(col_div) + 1)
        ]
        for r in range(len(row_div) + 1)
    ]


def assemble_text(
    glyphs: List[Tuple[int, int, int, int, str, float]],
    space_frac: float = 0.33,
) -> str:
    """Reading-order text: glyphs group into lines by y-overlap, sort by
    x within a line. A space is re-inserted when the next glyph's ink
    starts more than ``space_frac`` × the line's median advance PAST the
    previous glyph's pen position (pen = origin + advance, carried on
    each recognized template) — ink-gap heuristics would split wide-
    advance thin glyphs like "100". Lines join with newlines."""
    if not glyphs:
        return ""
    lines: List[List[Tuple[int, int, int, int, str, float]]] = []
    spans: List[Tuple[int, int]] = []
    for g in sorted(glyphs, key=lambda g: (g[1], g[0])):
        placed = False
        for i, (lo, hi) in enumerate(spans):
            if min(g[3], hi) - max(g[1], lo) > 0.4 * (g[3] - g[1]):
                lines[i].append(g)
                spans[i] = (min(lo, g[1]), max(hi, g[3]))
                placed = True
                break
        if not placed:
            lines.append([g])
            spans.append((g[1], g[3]))
    order = sorted(range(len(lines)), key=lambda i: spans[i][0])
    parts = []
    for i in order:
        line = sorted(lines[i], key=lambda g: g[0])
        advs = sorted(max(g[5] - g[0], g[2] - g[0]) for g in line)
        med_adv = max(advs[len(advs) // 2], 1.0)
        buf = [line[0][4]]
        for prev, cur in zip(line, line[1:]):
            if cur[0] - prev[5] > space_frac * med_adv:
                buf.append(" ")
            buf.append(cur[4])
        parts.append("".join(buf))
    return "\n".join(parts)
