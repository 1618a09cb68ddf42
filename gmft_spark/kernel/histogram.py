"""Histogram (non-deep) table formatter kernel.

Re-implements the reference's sweep-line interval histogram and
divider-partition fill (/root/reference/gmft/algorithm/histogram.py:5-137,
gmft/algorithm/dividers.py:37-79, gmft/formatters/histogram.py:99-199) as
vectorized numpy: word x/y extents build coverage profiles; maximal
low-coverage gaps become column/row dividers; words are bucketed by divider
midpoints into a cell grid whose first row is the header.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import pandas as pd

from gmft_spark.kernel.table import TableResult


def coverage_gaps(
    intervals: np.ndarray, threshold: int = 0
) -> List[Tuple[float, float]]:
    """Maximal intervals [p, q) over which at most ``threshold`` of the
    input intervals overlap, between the first and last change points
    (histogram.py:109-137). Empty input intervals are ignored."""
    if len(intervals) == 0:
        return []
    starts = intervals[:, 0]
    ends = intervals[:, 1]
    ok = ends > starts  # [p, p) is empty, no dirac delta (histogram.py:61-67)
    starts, ends = starts[ok], ends[ok]
    if len(starts) == 0:
        return []
    points = np.concatenate([starts, ends])
    deltas = np.concatenate([np.ones(len(starts)), -np.ones(len(ends))])
    order = np.argsort(points, kind="stable")
    points, deltas = points[order], deltas[order]
    uniq, idx = np.unique(points, return_index=True)
    # coverage of segment [uniq[i], uniq[i+1]) = running sum through i
    seg_cov = np.add.reduceat(deltas, idx).cumsum()

    gaps: List[Tuple[float, float]] = []
    open_start = None
    n = len(uniq)
    for i in range(n):
        if seg_cov[i] <= threshold:
            if open_start is None and i < n - 1:
                open_start = uniq[i]
        else:
            if open_start is not None:
                gaps.append((float(open_start), float(uniq[i])))
                open_start = None
    if open_start is not None:
        gaps.append((float(open_start), float(uniq[-1])))
    return gaps


def point_coverage(intervals: np.ndarray, x: float) -> int:
    """Number of input intervals [p, q) containing ``x``
    (histogram.py:45-54)."""
    if len(intervals) == 0:
        return 0
    ok = intervals[:, 1] > intervals[:, 0]
    iv = intervals[ok]
    return int(((iv[:, 0] <= x) & (x < iv[:, 1])).sum())


def fill_by_dividers(
    word_boxes: np.ndarray,
    texts: List[str],
    row_dividers: List[float],
    col_dividers: List[float],
    bounds: Tuple[float, float, float, float],
) -> np.ndarray:
    """Bucket each word's midpoint between sorted divider positions and
    concatenate cell text in word order (dividers.py:37-79). Words whose
    midpoint falls outside ``bounds`` (inclusive) are skipped."""
    n_rows = len(row_dividers) + 1
    n_cols = len(col_dividers) + 1
    grid = np.empty((n_rows, n_cols), dtype=object)
    if len(word_boxes) == 0:
        return grid
    xmid = (word_boxes[:, 0] + word_boxes[:, 2]) / 2
    ymid = (word_boxes[:, 1] + word_boxes[:, 3]) / 2
    inside = (
        (bounds[0] <= xmid)
        & (xmid <= bounds[2])
        & (bounds[1] <= ymid)
        & (ymid <= bounds[3])
    )
    col_idx = np.searchsorted(np.asarray(col_dividers), xmid, side="left")
    row_idx = np.searchsorted(np.asarray(row_dividers), ymid, side="left")
    sel = np.flatnonzero(inside)
    if len(sel):
        from gmft_spark.kernel.table import _join_into_grid

        flat = row_idx[sel] * n_cols + col_idx[sel]
        _join_into_grid(grid, flat, texts, sel)
    return grid


def content_intervals_between_dividers(
    dividers: List[Tuple[float, float]],
    min_val: float,
    max_val: float,
    add_inverted: bool = True,
) -> List[Tuple[float, float]]:
    """Complement of a sorted divider list over [min_val, max_val]; when a
    divider starts before the previous one ended, an inverted pseudo-interval
    keeps indices aligned (dividers.py:98-130)."""
    out: List[Tuple[float, float]] = []
    prev_end = min_val
    for start, end in dividers:
        if start > prev_end:
            out.append((prev_end, start))
        elif add_inverted:
            out.append((start, prev_end))
        prev_end = end
    if prev_end < max_val:
        out.append((prev_end, max_val))
    elif add_inverted:
        out.append((max_val, prev_end))
    return out


def histogram_extract(
    word_boxes: np.ndarray,
    texts: List[str],
    width: float,
    height: float,
    min_col_gap: float = 3.0,
    row_threshold: int = 0,
    col_threshold: int = 0,
) -> TableResult:
    """Full histogram-formatter pipeline
    (formatters/histogram.py:142-199): coordinates rounded to 2dp feed the
    coverage profiles; x-gaps wider than ``min_col_gap`` become column
    dividers, all y-gaps become row dividers; divider midpoints partition the
    (unrounded) words; the first grid row becomes the header."""
    res = TableResult()
    word_boxes = np.asarray(word_boxes, dtype=np.float64).reshape(-1, 4)
    rounded = np.round(word_boxes, 2)

    x_gaps = coverage_gaps(rounded[:, [0, 2]], col_threshold)
    y_gaps = coverage_gaps(rounded[:, [1, 3]], row_threshold)
    x_gaps = [(a, b) for a, b in x_gaps if (b - a) > min_col_gap]

    col_divs = [(a + b) / 2 for a, b in x_gaps]
    row_divs = [(a + b) / 2 for a, b in y_gaps]

    grid = fill_by_dividers(
        word_boxes, texts, row_divs, col_divs, (0.0, 0.0, width, height)
    )
    if grid.shape[0] == 0:
        res.csv = pd.DataFrame().to_csv(index=False, lineterminator="\n")
        res.grid = []
        res.columns = []
        return res
    from gmft_spark.kernel.table import render_csv

    data = [list(r) for r in grid[1:]]
    res.csv = render_csv(list(grid[0]), data)
    res.grid = data
    res.columns = [None if c is None else str(c) for c in grid[0]]
    res.n_rows = len(data)
    res.n_cols = grid.shape[1]
    res.top_header = [0]
    return res
