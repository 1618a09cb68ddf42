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

import math
from typing import List, Optional, Tuple

from gmft_spark.sources.pdfparse.content import Char, ContentInterpreter
from gmft_spark.sources.pdfparse.objects import PDFFile

Word = Tuple[float, float, float, float, str]

# Fraction of the device font size that a horizontal pen-position gap must
# exceed for a space to be generated between two characters.
SPACE_GAP_EM = 0.19
# Baseline jump (fraction of font size) treated as a line break.
LINE_BREAK_EM = 0.5


class ParsedPDF:
    """A parsed document exposing pdfium-binding-like word extraction."""

    def __init__(self, data: bytes):
        self.pdf = PDFFile(data)
        self._interp = ContentInterpreter(self.pdf)
        self._pages = self.pdf.pages()

    def __len__(self) -> int:
        return len(self._pages)

    def page_size(self, n: int) -> Tuple[float, float]:
        box = self.pdf.page_box(self._pages[n])
        return (box[2] - box[0], box[3] - box[1])

    def page_chars(self, n: int) -> List[Char]:
        """Characters in content order, coordinates relative to the page
        box (PDF bottom-left origin)."""
        page = self._pages[n]
        box = self.pdf.page_box(page)
        chars = self._interp.chars_for_page(page)
        if box[0] != 0.0 or box[1] != 0.0:
            dx, dy = box[0], box[1]
            for ch in chars:
                ch.ox -= dx
                ch.oy -= dy
                if ch.box is not None:
                    ch.box = (
                        ch.box[0] - dx,
                        ch.box[1] - dy,
                        ch.box[2] - dx,
                        ch.box[3] - dy,
                    )
        return chars

    def page_words(self, n: int) -> List[Word]:
        """(x0, y0, x1, y1, text) with top-left-origin y, like the
        reference binding's ``get_positions_and_text``."""
        _w, height = self.page_size(n)
        chars = self.page_chars(n)
        words: List[Word] = []

        cur_text: List[str] = []
        cur_box: Optional[List[float]] = None

        def flush() -> None:
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
            cur_text = []
            cur_box = None

        prev: Optional[Char] = None
        for ch in chars:
            if prev is not None and not prev.space and not ch.space:
                if self._breaks_word(prev, ch):
                    flush()
            if ch.space or (ch.uni != "" and ch.uni.isspace()):
                flush()
            else:
                box = ch.box
                if box is None:
                    # blank glyph: keep the pen position as a point box so
                    # the word still accumulates text
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
                cur_text.append(ch.uni)
            prev = ch
        flush()
        return words

    @staticmethod
    def _breaks_word(prev: Char, cur: Char) -> bool:
        fs = max(prev.fs, cur.fs, 1e-6)
        # baseline jump → line break
        if abs(cur.oy - prev.oy) > LINE_BREAK_EM * fs:
            return True
        # horizontal gap beyond the advanced pen position → generated space
        expected_x = prev.ox + prev.adv[0]
        expected_y = prev.oy + prev.adv[1]
        gap = math.hypot(cur.ox - expected_x, cur.oy - expected_y)
        if cur.ox < expected_x - 0.5 * fs:
            return True  # pen moved backwards: new line/column
        if gap > SPACE_GAP_EM * fs:
            return True
        return False
