"""Text-page assembly: char stream → whitespace-segmented words.

Replicates the *observable* behavior of the reference's word extraction
(`/root/reference/gmft/pdf_bindings/pdfium.py:123-181`): iterate the
page's characters in content order, split words at whitespace, take the
min/max envelope of the character boxes, and flip y to a top-left
origin. pdfium additionally *generates* whitespace characters that are
not in the content stream — a space when consecutive characters leave a
horizontal gap, and a line break when the baseline moves — so the same
generation is performed here with tunable thresholds (validated against
the reference's committed word-box fixtures).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from gmft_spark.sources.pdfparse.content import Char, ContentInterpreter
from gmft_spark.sources.pdfparse.objects import PDFFile

Word = Tuple[float, float, float, float, str]

# pdfium textpage "control characters": present in the char list (with a
# box) but absent from the extracted text, so the reference binding's
# `get_text_range(i, 1)` yields '' for them — the char contributes no
# text yet its box still merges into the current word's envelope
# (`gmft/pdf_bindings/pdfium.py:158-169`). 0xFFFE is control too unless
# hyphen-flagged; our hyphen merge inserts the marker directly as text.
_CONTROL_CHARS = frozenset(
    map(chr, (0x02, 0x03, 0x93, 0x94, 0x96, 0x97, 0x98))
)


def _along(ch: Char, x: float, y: float) -> float:
    """Coordinate along the char's text x-axis (== x for horizontal)."""
    return x * ch.dir[0] + y * ch.dir[1]


def _cross(ch: Char, x: float, y: float) -> float:
    """Coordinate across the text direction (== y for horizontal)."""
    return -x * ch.dir[1] + y * ch.dir[0]


def _box_cross(ch: Char) -> Tuple[float, float]:
    """Cross-axis extent of the char's (axis-aligned) glyph box."""
    x0, y0, x1, y1 = ch.box  # type: ignore[misc]
    ux, uy = ch.dir
    if uy == 0.0 and ux > 0.0:  # horizontal fast path
        return (y0, y1)
    vals = (
        -x0 * uy + y0 * ux,
        -x1 * uy + y0 * ux,
        -x0 * uy + y1 * ux,
        -x1 * uy + y1 * ux,
    )
    return (min(vals), max(vals))


# Baseline-distance (fraction of font size) within which two characters
# are on the same text line (sub/superscripts and combining accents shift
# the baseline by up to ~0.3 em).
LINE_BASE_EM = 0.35


class ParsedPDF:
    """A parsed document exposing pdfium-binding-like word extraction."""

    def __init__(self, data: bytes, password: "str | bytes" = b""):
        self.pdf = PDFFile(data, password=password)
        self._interp = ContentInterpreter(self.pdf)
        self._pages = self.pdf.pages()

    def __len__(self) -> int:
        return len(self._pages)

    def page_size(self, n: int) -> Tuple[float, float]:
        box = self.pdf.page_box(self._pages[n])
        return (box[2] - box[0], box[3] - box[1])

    def page_chars(self, n: int) -> List[Char]:
        """Characters in reading order, in RAW PDF user-space coordinates
        (no crop-origin shift): pdfium's ``FPDFText_GetCharBox`` reports
        content-stream coordinates as-is, while the page *size* used for
        the y-flip comes from the visible (crop) box — the reference
        binding therefore works in this mixed frame, and the golden
        table bboxes are recorded in it (pdf8's CropBox is offset
        (8.504, 8.504) from its MediaBox; every other corpus PDF has
        them equal, which long masked the distinction).

        Text-showing objects are re-inserted by x-position when they lie
        on an already-seen line to the *left* of its last object — the
        same normalization pdfium's textpage performs, which puts e.g.
        separately-drawn combining accents back at their visual spot.
        """
        page = self._pages[n]
        chars = self._interp.chars_for_page(page)
        return self._reorder_line_objects(chars)

    def page_images(self, n: int) -> List[tuple]:
        """(Stream, ctm) per Image XObject painted on page ``n``, in
        content-stream paint order (sources/pdfparse/images.py decodes
        and composites them)."""
        return self._interp.images_for_page(self._pages[n])

    @staticmethod
    def _reorder_line_objects(chars: List[Char]) -> List[Char]:
        # group consecutive chars by show-op object
        objects: List[List[Char]] = []
        for ch in chars:
            if objects and objects[-1][0].obj_id == ch.obj_id:
                objects[-1].append(ch)
            else:
                objects.append([ch])
        # pdfium skips text objects consisting only of whitespace; word
        # boundaries there are recovered by gap-generated spaces
        objects = [
            o
            for o in objects
            if not all(
                ch.space or (ch.uni != "" and ch.uni.isspace()) for ch in o
            )
        ]

        def baseline(o: List[Char]) -> float:
            return _cross(o[0], o[0].ox, o[0].oy)

        def x0(o: List[Char]) -> float:
            return _along(o[0], o[0].ox, o[0].oy)

        def fs(o: List[Char]) -> float:
            return max(o[0].fs, 1e-6)

        _tr_cache: dict = {}

        def trange(o: List[Char]) -> Tuple[float, float]:
            v = _tr_cache.get(id(o))
            if v is not None:
                return v
            lo = hi = None
            for ch in o:
                if ch.box is None:
                    continue
                clo, chi = _box_cross(ch)
                lo = clo if lo is None else min(lo, clo)
                hi = chi if hi is None else max(hi, chi)
            if lo is None:
                b0 = baseline(o)
                v = (b0, b0 + 0.6 * fs(o))
            else:
                v = (lo, hi)
            _tr_cache[id(o)] = v
            return v

        def same_dir(a: List[Char], b: List[Char]) -> bool:
            da, db = a[0].dir, b[0].dir
            return da[0] * db[0] + da[1] * db[1] > 0.9

        def same_line(a: List[Char], b: List[Char]) -> bool:
            if not same_dir(a, b):
                return False
            tol = LINE_BASE_EM * max(fs(a), fs(b))
            if abs(baseline(b) - baseline(a)) <= tol:
                return True
            alo, ahi = trange(a)
            blo, bhi = trange(b)
            return min(ahi, bhi) - max(alo, blo) > 0.0

        def is_multiline(o: List[Char]) -> bool:
            lo, hi = trange(o)
            return hi - lo > 2.0 * fs(o)

        out: List[List[Char]] = []
        line_start = 0  # index into out of the current line's first object
        for obj in objects:
            if not out:
                out.append(obj)
                continue
            prev = out[-1]
            if (
                not same_line(prev, obj)
                or is_multiline(obj)
                or is_multiline(prev)
            ):
                # new line (or an object spanning several lines: never
                # reorder into/around it)
                line_start = len(out)
                out.append(obj)
                continue
            if x0(obj) >= x0(prev) - 0.05:
                out.append(obj)
                continue
            # clearly-retrograde object on the same line: insert by x among
            # the line's objects
            pos = len(out)
            while pos > line_start and x0(out[pos - 1]) > x0(obj) + 0.05:
                pos -= 1
            out.insert(pos, obj)
        return [ch for obj in out for ch in obj]

    def page_words(
        self, n: int, cfg: Optional["SegConfig"] = None
    ) -> List[Word]:
        """(x0, y0, x1, y1, text) with top-left-origin y, like the
        reference binding's ``get_positions_and_text``."""
        _w, height = self.page_size(n)
        return segment_words(self.page_chars(n), height, cfg or SegConfig())


@dataclass
class SegConfig:
    """Word-segmentation thresholds.

    The split rules themselves replicate pdfium's textpage arithmetic
    (intra-object TJ-kern spacing vs NormalizeThreshold, inter-object
    font-width pen gaps and the object-relative baseline-shift test) —
    byte-validated against all of the reference's committed goldens.
    Only two scalar knobs remain."""

    # fallback inter-object gap threshold (fraction of font size) when
    # both boundary chars report zero font-width advance
    space_gap: float = 0.125
    # inter-object pen retreat (fraction of font size) treated as a
    # wrapped-line break even when ink intervals say same-line (two-line
    # table header cells drawn cell-by-cell zigzag, e.g. tatr.pdf's
    # 'Row & Column / Location')
    retreat: float = 1.0
    # baseline distance within which chars share a line
    line_base: float = LINE_BASE_EM


def _intra_space_split(
    ch: Char, spacing: float, space_w_units: float
) -> bool:
    """pdfium's intra-object generated-space test: ``spacing`` (TJ kern
    before this char + object charspace − CalculateBaseSpace) must meet
    a threshold — half the font's space-glyph advance when the font has
    a sanely-sized one, else the char's own width scaled by
    NormalizeThreshold (<0.3em → /2, <0.5em → /4, <0.7em → /5, else
    /6). The per-char threshold reproduces pdfium's irregular splits of
    letterspaced headers ('R E S EARCH AR TIC L E', 14/14 boundaries)."""
    if spacing <= 0.0:
        return False
    fs_h = max(ch.fs, 1e-6)
    t = 0.0
    if space_w_units > 0.0:
        t = space_w_units * fs_h
        t = 0.0 if t > fs_h / 3.0 else t / 2.0
    if t == 0.0:
        w = (ch.fadv[0] ** 2 + ch.fadv[1] ** 2) ** 0.5
        if w <= 0.0:
            return False
        if w < 0.3 * fs_h:
            t = w / 2.0
        elif w < 0.5 * fs_h:
            t = w / 4.0
        elif w < 0.7 * fs_h:
            t = w / 5.0
        else:
            t = w / 6.0
    return spacing >= t


def _baseline_break(
    prev: Char, ch: Char, dt: float, obj_first: dict
) -> bool:
    """Inter-object baseline-shift split (ProcessInsertObject analog).

    pdfium expresses the new object's origin in the PREVIOUS OBJECT's
    text space (``pos``), so the line-break test compares the baseline
    shift both against a char-width threshold (rise > 2×thr, drop <
    −3×thr with thr = min of the boundary chars' font-width advances /
    4 — min, not max: pdf3's tiny fs-3.59 footnote marker 'a' must
    split from the following text on a 2.29×-of-max drop) and against
    the x-distance from the previous object's START.
    A long previous object keeps its trailing script attached (pdf1
    'L−1)', pdf8 'm2/mol') while a short one lets the same geometry
    split (pdf2 'kg/m2 )', pdf5 stacked 'SO4 2'). The |dt| > pos_x
    comparison decides pdf5's three identical-geometry '(\\x05)'
    instances both ways on margins of ±0.001pt, matching the golden in
    each — the sharpest evidence this is pdfium's actual arithmetic
    (``fabs(pos.y) > fabs(pos.x)`` in object-relative coordinates)."""
    wp = (prev.fadv[0] ** 2 + prev.fadv[1] ** 2) ** 0.5
    wc = (ch.fadv[0] ** 2 + ch.fadv[1] ** 2) ** 0.5
    thr = min(wp, wc) / 4.0
    if thr <= 0.0:
        return False
    fx = obj_first.get(prev.obj_id)
    if fx is None:
        pos_x = 0.0
    else:
        pos_x = abs(_along(ch, ch.ox, ch.oy) - _along(ch, fx[0], fx[1]))
    if dt > 2.0 * thr or dt < -3.0 * thr:
        return abs(dt) > pos_x
    return False


def segment_words(
    chars: List[Char], height: float, cfg: SegConfig
) -> List[Word]:
    """pdfium-style whitespace generation + the reference binding's word
    assembly (whitespace split, envelope bbox, y-flip)."""
    words: List[Word] = []
    cur_text: List[str] = []
    cur_box: Optional[List[float]] = None

    def flush() -> None:
        # The reference binding resets its bbox accumulator only when a
        # word is actually emitted (`if current_word:` guard,
        # pdfium.py:146-157): a whitespace flush while the pending text
        # is empty (e.g. after a lone control char) RETAINS the box,
        # which then merges into the next word's envelope. Replicated
        # exactly — goldens depend on it (pdf5_t0's wide '18.5').
        nonlocal cur_text, cur_box
        text = "".join(cur_text)
        if text and cur_box is not None:
            words.append(
                (
                    cur_box[0],
                    height - cur_box[3],
                    cur_box[2],
                    height - cur_box[1],
                    text,
                )
            )
            cur_box = None
        cur_text = []

    def accumulate(ch: Char) -> None:
        nonlocal cur_box
        box = ch.box
        if box is None:
            # blank glyph: keep the pen position as a point box so the
            # word still accumulates text
            box = (ch.ox, ch.oy, ch.ox, ch.oy)
        if cur_box is None:
            cur_box = list(box)
        else:
            if box[0] < cur_box[0]:
                cur_box[0] = box[0]
            if box[1] < cur_box[1]:
                cur_box[1] = box[1]
            if box[2] > cur_box[2]:
                cur_box[2] = box[2]
            if box[3] > cur_box[3]:
                cur_box[3] = box[3]
        if not (len(ch.uni) == 1 and ch.uni in _CONTROL_CHARS):
            cur_text.append(ch.uni)

    def vext(ch: Char) -> Tuple[float, float]:
        if ch.box is not None:
            return _box_cross(ch)
        t = _cross(ch, ch.ox, ch.oy)
        return (t, t + 0.6 * max(ch.fs, 1e-6))

    line_lo = line_hi = None  # cross-axis interval of the current line
    prev: Optional[Char] = None

    # Per-object pdfium spacing state (ProcessTextObject analog). Our
    # Char.adv folds in Tc/Tw but NOT TJ kerns (those move the matrix
    # between _show calls), so per char: Tc ≈ |adv|−|fadv| and the TJ
    # kern before a char = its origin minus the previous char's
    # advanced pen — exactly the ``spacing`` pdfium accumulates.
    obj_tc: dict = {}  # object charspace, device units
    obj_base: dict = {}  # CalculateBaseSpace result, device units
    # first char origin per show-op object — the object "position" the
    # baseline-shift rule measures pdfium's ``pos.x`` against
    obj_first: dict = {}
    # objects are contiguous runs in the (reordered) stream, so the
    # per-object stats walk runs instead of per-char dict lookups;
    # CalculateBaseSpace: fonts that letterspace via Tc and cancel it
    # with uniform in-word TJ kerns get the cancellation subtracted, so
    # word gaps (no kern → spacing = Tc) still stand out
    n_chars = len(chars)
    i = 0
    while i < n_chars:
        first = chars[i]
        oid = first.obj_id
        obj_first[oid] = (first.ox, first.oy)
        horiz = first.dir[0] == 1.0 and first.dir[1] == 0.0
        tc = None
        kerns: List[float] = []
        cnt = 0
        p = None
        j = i
        while j < n_chars:
            ch = chars[j]
            if ch.obj_id != oid:
                break
            cnt += 1
            if tc is None and not ch.space:
                if horiz:
                    tc = ch.adv[0] - ch.fadv[0]
                else:
                    tc = _along(ch, ch.adv[0], ch.adv[1]) - _along(
                        ch, ch.fadv[0], ch.fadv[1]
                    )
            if p is not None:
                if horiz:
                    kern = ch.ox - (p.ox + p.adv[0])
                else:
                    kern = _along(ch, ch.ox, ch.oy) - _along(
                        p, p.ox + p.adv[0], p.oy + p.adv[1]
                    )
                if kern > 1e-6 or kern < -1e-6:
                    kerns.append(kern)
            p = ch
            j += 1
        i = j
        if tc is None:
            tc = 0.0
        obj_tc[oid] = tc
        n_items = cnt + len(kerns)
        if n_items < 3 or -1e-4 <= tc <= 1e-4:
            obj_base[oid] = 0.0
            continue
        base = tc
        for k in kerns:
            if k + tc < base:
                base = k + tc
        if base < 0.0 or (n_items == 3 and kerns):
            base = 0.0
        obj_base[oid] = base
    # per-font space-glyph width (em/1000 fraction); 0 = no usable
    # space glyph → per-char NormalizeThreshold branch
    _space_w: dict = {}

    def _font_space_w(font) -> float:
        key = id(font)
        v = _space_w.get(key)
        if v is None:
            v = 0.0
            try:
                if font.is_word_space(32):
                    v = float(font.width(32)) / 1000.0
            except Exception:
                v = 0.0
            _space_w[key] = v
        return v

    for ch in chars:
        if ch.space or (ch.uni != "" and ch.uni.isspace()):
            flush()
            prev = ch
            continue
        lo, hi = vext(ch)
        if line_lo is None or prev is None:
            line_lo, line_hi = lo, hi
        else:
            fs = max(prev.fs, ch.fs, 1e-6)
            cdx, cdy = ch.dir
            pdx, pdy = prev.dir
            dot = pdx * cdx + pdy * cdy
            overlap = min(hi, line_hi) - max(lo, line_lo)
            if cdy == 0.0 and cdx == 1.0 and pdy == 0.0 and pdx == 1.0:
                dt = ch.oy - prev.oy  # horizontal fast path
            else:
                dt = _cross(ch, ch.ox, ch.oy) - _cross(
                    prev, prev.ox, prev.oy
                )
            same_line = dot > 0.9 and (
                overlap > 0.0 or abs(dt) <= cfg.line_base * fs
            )
            if not same_line:
                # line break: pdfium's hyphenation merge keeps the word
                # when it ends '<letter>-'
                if (
                    len(cur_text) >= 2
                    and cur_text[-1] in ("-", "­")
                    and cur_text[-2][-1:].isalpha()
                ):
                    cur_text[-1] = "￾"
                else:
                    flush()
                line_lo, line_hi = lo, hi
            else:
                if prev.obj_id == ch.obj_id:
                    # `pen` is the TJ kern before this char (adv already
                    # carries Tc/Tw); pdfium's spacing = kern +
                    # charspace − baseSpace
                    if cdy == 0.0 and cdx == 1.0:
                        pen = ch.ox - prev.ox - prev.adv[0]
                    else:
                        pen = _along(ch, ch.ox, ch.oy) - _along(
                            prev,
                            prev.ox + prev.adv[0],
                            prev.oy + prev.adv[1],
                        )
                    spacing = (
                        pen
                        + obj_tc.get(ch.obj_id, 0.0)
                        - obj_base.get(ch.obj_id, 0.0)
                    )
                    split = _intra_space_split(
                        ch, spacing, _font_space_w(ch.font)
                    )
                elif _baseline_break(prev, ch, dt, obj_first):
                    split = True
                else:
                    # ACROSS objects the pen is the font-width-only one
                    # (GetCharWidth × size / 1000) pdfium's
                    # ProcessInsertObject measures with — the real pen's
                    # Tc/Tw/TJ components (letterspaced headers, TJ
                    # column layouts like pdf8's 'NaAlSi3O8') must not
                    # leak into inter-object gap decisions.
                    # pdfium GenerateSpace analog, font-independent: the
                    # gap beyond the previous char's font-width advance
                    # must exceed a quarter of the wider boundary char
                    # (pdf6's 'replications±SD' sits 0.002pt under a
                    # 0.125×fs rule but 0.17pt under this; pdf8's
                    # rotated italic 'f H2' splits at 0.20pt over)
                    if cdy == 0.0 and cdx == 1.0 and pdy == 0.0 and pdx == 1.0:
                        pen = ch.ox - prev.ox - prev.fadv[0]
                        wp = abs(prev.fadv[0])
                        wc = abs(ch.fadv[0])
                    else:
                        pen = _along(ch, ch.ox, ch.oy) - _along(
                            prev,
                            prev.ox + prev.fadv[0],
                            prev.oy + prev.fadv[1],
                        )
                        wp = (
                            prev.fadv[0] ** 2 + prev.fadv[1] ** 2
                        ) ** 0.5
                        wc = (ch.fadv[0] ** 2 + ch.fadv[1] ** 2) ** 0.5
                    pen_thr = max(wp, wc) / 4.0
                    if pen_thr <= 0.0:
                        pen_thr = cfg.space_gap * max(prev.fs, 1e-6)
                    split = (
                        pen > pen_thr
                        or pen < -cfg.retreat * max(prev.fs, ch.fs, 1e-6)
                    )
                if split:
                    flush()
                if lo < line_lo:
                    line_lo = lo
                if hi > line_hi:
                    line_hi = hi
        accumulate(ch)
        prev = ch
    flush()
    return words
