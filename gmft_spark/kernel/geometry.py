"""Vectorized bbox geometry.

Semantics follow the reference's Rect / iob family
(/root/reference/gmft/base.py:5-67, gmft/algorithm/structure.py:22-108),
re-expressed as numpy broadcasts: boxes are float64 arrays of shape
``[N, 4]`` laid out ``(x0, y0, x1, y1)`` with origin top-left, y down.
"""

from __future__ import annotations

import numpy as np

EMPTY_BOX = (0.0, 0.0, 0.0, 0.0)


def intersect_box(a, b):
    """Intersection bbox of two boxes; the reference's Rect.EMPTY
    ``(0,0,0,0)`` when they don't properly overlap (base.py:14-24)."""
    x0 = max(a[0], b[0])
    y0 = max(a[1], b[1])
    x1 = min(a[2], b[2])
    y1 = min(a[3], b[3])
    if x0 >= x1 or y0 >= y1:
        return EMPTY_BOX
    return (x0, y0, x1, y1)


def box_area(b) -> float:
    return (b[2] - b[0]) * (b[3] - b[1])


def iob(a, b) -> float:
    """Intersection area over the area of box ``a``
    (structure.py:22-34). 0 when a has non-positive area."""
    area = box_area(a)
    if area <= 0:
        return 0.0
    ib = intersect_box(a, b)
    return box_area(ib) / area


def iob_1d(a0, a1, b0, b1) -> float:
    """1-D interval iob over the first interval (structure.py:37-68)."""
    inter = min(a1, b1) - max(a0, b0)
    return max(0.0, inter) / (a1 - a0)


def symmetric_iob(a, b) -> float:
    """Intersection over the smaller of the two areas (structure.py:71-82)."""
    aa, ab = box_area(a), box_area(b)
    if aa <= 0 or ab <= 0:
        return 0.0
    return box_area(intersect_box(a, b)) / min(aa, ab)


def symmetric_iob_1d(a0, a1, b0, b1) -> float:
    inter = max(0.0, min(a1, b1) - max(a0, b0))
    return inter / min(a1 - a0, b1 - b0)


def iob_matrix(words: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """``[W, B]`` matrix of iob(word_w, box_b) — intersection over the
    *word's* area. Vectorized equivalent of calling structure.py:22-34
    per pair."""
    if len(words) == 0 or len(boxes) == 0:
        return np.zeros((len(words), len(boxes)), dtype=np.float64)
    wx0, wy0, wx1, wy1 = (words[:, i : i + 1] for i in range(4))
    bx0, by0, bx1, by1 = (boxes[None, :, i] for i in range(4))
    ix = np.minimum(wx1, bx1) - np.maximum(wx0, bx0)
    iy = np.minimum(wy1, by1) - np.maximum(wy0, by0)
    inter = np.clip(ix, 0.0, None) * np.clip(iy, 0.0, None)
    # a degenerate intersection (point/line touch) has zero area already,
    # matching Rect.EMPTY semantics.
    warea = (wx1 - wx0) * (wy1 - wy0)
    out = np.zeros_like(inter)
    np.divide(inter, warea, out=out, where=warea > 0)
    return out


def rotate_words(words: np.ndarray, angle: int, width: float, height: float):
    """Rotate table-local word boxes for a rotated table
    (detectors/base.py:192-211). ``width``/``height`` are the *unrotated*
    table rect's dimensions."""
    if angle == 0 or len(words) == 0:
        return words
    x0, y0, x1, y1 = words[:, 0], words[:, 1], words[:, 2], words[:, 3]
    if angle == 90:
        out = np.stack([height - y1, x0, height - y0, x1], axis=1)
    elif angle == 180:
        out = np.stack([width - x1, height - y1, width - x0, height - y0], axis=1)
    elif angle == 270:
        out = np.stack([y0, width - x1, y1, width - x0], axis=1)
    else:
        raise ValueError(f"unsupported angle {angle}")
    return out


def select_table_words(
    word_boxes: np.ndarray,
    texts,
    table_bbox,
    angle: int = 0,
    outside: bool = False,
    remove_offset: bool = True,
):
    """Filter page words to those strictly intersecting the table bbox
    (or its complement with ``outside=True``) and, when ``remove_offset``,
    shift them into table-local coordinates with the rotation transform
    applied (detectors/base.py:158-211; strict-inequality intersection per
    base.py:26-33; offset/rotation skipped when remove_offset is False,
    matching ``text_positions(remove_table_offset=False)``). Returns
    ``(boxes[K,4], texts[K])`` preserving original word order."""
    if len(word_boxes) == 0:
        return word_boxes.reshape(0, 4), []
    bx0, by0, bx1, by1 = table_bbox
    x0, y0, x1, y1 = (word_boxes[:, i] for i in range(4))
    hit = (
        (np.maximum(x0, bx0) < np.minimum(x1, bx1))
        & (np.maximum(y0, by0) < np.minimum(y1, by1))
    )
    if outside:
        hit = ~hit
    sel = word_boxes[hit]
    kept = [t for t, h in zip(texts, hit) if h]
    if not remove_offset:
        return sel, kept
    local = sel - np.array([bx0, by0, bx0, by0], dtype=np.float64)
    local = rotate_words(local, angle, bx1 - bx0, by1 - by0)
    return local, kept
