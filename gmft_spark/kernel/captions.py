"""Caption detection around a table region.

Re-implements the reference's caption search semantics
(/root/reference/gmft/algorithm/captions.py:15-284): prefer the table's
reading-order neighbours, fall back to the spatially closest word in a
margin band above/below, then expand the candidate to a full caption with
a rolling-word-height gap scan that bails out on paragraph-sized drift.
Inherently sequential (rolling estimate) → kernel/(B) form only; runs
per-table inside the same Arrow batches as extraction.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def _strict_intersects(box, other) -> bool:
    return (
        max(box[0], other[0]) < min(box[2], other[2])
        and max(box[1], other[1]) < min(box[3], other[3])
    )


def _scan_to_gap(
    words: np.ndarray,
    init_word_height: float,
    start_i: int,
    end_i: int,
    step: int,
    line_spacing: float,
    stop_y_factor: float,
    rolling_n: int,
) -> Optional[int]:
    """Walk from ``start_i`` toward ``end_i`` (exclusive) until two
    consecutive words' y-midpoints differ by more than
    ``line_spacing × rolling word height`` (returns that index), the total
    drift from the origin exceeds ``stop_y_factor × word height`` (returns
    None — paragraph, not caption), or the range ends (returns ``end_i``).
    The word-height estimate updates as a running mean seeded with
    ``init_word_height`` at weight ``rolling_n``
    (captions.py:15-82)."""
    if not (0 <= start_i < len(words)):
        return end_i
    y_orig = (words[start_i][1] + words[start_i][3]) / 2
    y_prev = y_orig
    word_height = init_word_height
    n = rolling_n
    for i in range(start_i + step, end_i, step):
        ymin, ymax = words[i][1], words[i][3]
        y_avg = (ymin + ymax) / 2
        word_height = (n - 1) / n * word_height + (ymax - ymin) / n
        n += 1
        if abs(y_avg - y_prev) > line_spacing * word_height:
            return i
        if abs(y_avg - y_orig) > stop_y_factor * word_height:
            return None
        y_prev = y_avg
    return end_i


def find_captions(
    word_boxes: np.ndarray,
    texts: List[str],
    table_bbox,
    margin: Optional[Tuple[float, float, float, float]] = None,
    line_spacing: float = 2.5,
    stop_y_factor_above: float = 10.0,
    stop_y_factor_below: float = 10.0,
) -> Tuple[str, str]:
    """Return ``(caption_above, caption_below)`` for a table
    (captions.py:88-284). ``word_boxes``/``texts`` are the page words in
    reading order; ``margin`` is the (left, top, right, bottom) search
    expansion, default (50, 50, 0, 50)."""
    if margin is None:
        margin = (50.0, 50.0, 0.0, 50.0)
    bx0, by0, bx1, by1 = table_bbox
    midpoint = (by0 + by1) / 2
    left = bx0 - margin[0]
    right = bx1 + margin[2]
    rect_above = (left, by0 - margin[1], right, midpoint)
    rect_below = (left, midpoint, right, by1 + margin[3])

    n = len(texts)
    word_boxes = np.asarray(word_boxes, dtype=np.float64).reshape(-1, 4)

    def _hits(rect) -> np.ndarray:
        if n == 0:
            return np.zeros(0, dtype=bool)
        x0, y0, x1, y1 = (word_boxes[:, k] for k in range(4))
        return (
            (np.maximum(x0, rect[0]) < np.minimum(x1, rect[2]))
            & (np.maximum(y0, rect[1]) < np.minimum(y1, rect[3]))
        )

    in_table_mask = _hits(table_bbox)
    in_table = np.flatnonzero(in_table_mask)
    table_min_idx = int(in_table[0]) if len(in_table) else n
    table_max_idx = int(in_table[-1]) if len(in_table) else 0

    candidate_above: Optional[int] = None
    candidate_below: Optional[int] = None
    above_heights: List[float] = []
    below_heights: List[float] = []
    cand_y = None

    # reading-order neighbours first
    cand = table_min_idx - 1
    if 0 <= cand < n:
        b = word_boxes[cand]
        y = (b[1] + b[3]) / 2
        if _strict_intersects(b, rect_above):
            candidate_above = cand
            above_heights.append(b[3] - b[1])
            cand_y = y
        elif _strict_intersects(b, rect_below):
            candidate_below = cand
            below_heights.append(b[3] - b[1])
            cand_y = y

    cand = table_max_idx + 1
    if 0 <= cand < n:
        b = word_boxes[cand]
        y = (b[1] + b[3]) / 2
        if _strict_intersects(b, rect_above):
            if candidate_above is None or abs(cand_y - by0) > abs(y - by0):
                candidate_above = cand
            above_heights.append(b[3] - b[1])
        elif _strict_intersects(b, rect_below):
            if candidate_below is None or abs(cand_y - by1) > abs(y - by1):
                candidate_below = cand
            below_heights.append(b[3] - b[1])

    # falsy check (not `is None`) matches the reference exactly
    # (captions.py:171,203): a candidate at word index 0 triggers the
    # proximity fallback too.
    if not candidate_above:
        strict = (bx0 - margin[0], by0 - margin[1], bx1 + margin[2], midpoint)
        cand_mask = _hits(strict) & ~in_table_mask
        idxs = np.flatnonzero(cand_mask)
        if len(idxs):
            ys = (word_boxes[idxs, 1] + word_boxes[idxs, 3]) / 2
            above_heights.extend(
                (word_boxes[idxs, 3] - word_boxes[idxs, 1]).tolist()
            )
            # first index with strictly smaller distance wins (scan order)
            best_pos = int(np.argmin(np.abs(ys - by0)))
            candidate_above = int(idxs[best_pos])

    if not candidate_below:
        strict = (bx0 - margin[0], midpoint, bx1 + margin[2], by1 + margin[3])
        cand_mask = _hits(strict) & ~in_table_mask
        idxs = np.flatnonzero(cand_mask)
        if len(idxs):
            ys = (word_boxes[idxs, 1] + word_boxes[idxs, 3]) / 2
            below_heights.extend(
                (word_boxes[idxs, 3] - word_boxes[idxs, 1]).tolist()
            )
            best_pos = int(np.argmin(np.abs(ys - by1)))
            candidate_below = int(idxs[best_pos])

    captions = []
    for cand, heights, is_above in (
        (candidate_above, above_heights, True),
        (candidate_below, below_heights, False),
    ):
        if cand is None:
            captions.append("")
            continue
        height_estimate = float(np.mean(heights))
        est_n = len(heights)

        stop_i = table_max_idx if table_max_idx < cand else -1
        prior = _scan_to_gap(
            word_boxes,
            height_estimate,
            cand,
            stop_i,
            -1,
            line_spacing,
            stop_y_factor_above,
            est_n,
        )
        caption = ""
        if prior is not None:
            stop_i = table_min_idx if cand < table_min_idx else n
            post = _scan_to_gap(
                word_boxes,
                height_estimate,
                cand,
                stop_i,
                1,
                line_spacing,
                stop_y_factor_below,
                est_n,
            )
            if post is not None:
                caption = " ".join(texts[i] for i in range(prior + 1, post))
        captions.append(caption)

    return captions[0], captions[1]
