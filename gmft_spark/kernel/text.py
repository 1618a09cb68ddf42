"""Text assembly kernels.

Covers the reference's word→string helpers:
  * ``assemble_text``        — position_words (detectors/base.py:23-48)
  * ``infer_line_breaks``    — _infer_line_breaks (pdf_bindings/base.py:173-208)
  * ``text_with_breaks``     — _get_text_with_breaks (pdf_bindings/base.py:50-70)
  * ``word_height_estimate`` — predicted_word_height (detectors/base.py:223-257)
"""

from __future__ import annotations

import numpy as np


def assemble_text(word_boxes: np.ndarray, texts, y_gap: float = 3.0) -> str:
    """Join words into a string in generator order: a newline is emitted when
    the word's bottom edge jumps by >= ``y_gap`` from the previous word's
    bottom, else a space (detectors/base.py:23-48)."""
    n = len(texts)
    if n == 0:
        return ""
    if n == 1:
        return texts[0]
    y1 = word_boxes[:, 3]
    jump = np.abs(y1[1:] - y1[:-1]) >= y_gap
    seps = np.where(jump, "\n", " ")
    parts = [texts[0]]
    for sep, t in zip(seps, texts[1:]):
        parts.append(sep)
        parts.append(t)
    return "".join(parts)


def infer_line_breaks(word_boxes: np.ndarray):
    """Assign ``(line_no, word_no)`` to each word. A new line starts when the
    word's top deviates from the current line's *anchor* (the first word of
    the line, not simply the previous word) by more than
    ``max(0.8 * mean(word heights), 0.1)`` (pdf_bindings/base.py:173-208).

    Returns ``(line_no[int64], word_no[int64])``. Note the reference's
    counter quirk: the very first word gets ``word_no == 1``.
    """
    n = len(word_boxes)
    if n == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    heights = word_boxes[:, 3] - word_boxes[:, 1]
    thresh = max(float(np.mean(heights)) * 0.8, 0.1)

    y0 = word_boxes[:, 1]
    line_no = np.empty(n, dtype=np.int64)
    word_no = np.empty(n, dtype=np.int64)
    line = 0
    wc = 0
    anchor = y0[0]
    for i in range(n):
        if abs(y0[i] - anchor) > thresh:
            line += 1
            anchor = y0[i]
            wc = 0
        else:
            wc += 1
        line_no[i] = line
        word_no[i] = wc
    return line_no, word_no


def text_with_breaks(word_boxes: np.ndarray, texts) -> str:
    """Plain page text with inferred line breaks
    (pdf_bindings/base.py:50-70): words with ``word_no == 0`` start a new
    line, everything else is space-joined; leading whitespace stripped."""
    if len(texts) == 0:
        return ""
    _, word_no = infer_line_breaks(word_boxes)
    parts = []
    for wn, t in zip(word_no, texts):
        parts.append("\n" if wn == 0 else " ")
        parts.append(t)
    return "".join(parts).lstrip()


def word_height_estimate(
    word_boxes: np.ndarray, smallest_supported_text_height: float = 0.1
) -> float:
    """0.95 × exact median of word heights above the minimum supported
    height; NaN when no qualifying words (detectors/base.py:223-257)."""
    if len(word_boxes) == 0:
        return float("nan")
    heights = word_boxes[:, 3] - word_boxes[:, 1]
    heights = heights[heights > smallest_supported_text_height]
    if len(heights) == 0:
        return float("nan")
    return 0.95 * float(np.median(heights))
