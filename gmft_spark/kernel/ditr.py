"""DITR (divider-predicting) formatter kernel.

Re-implements the reference's divider-model extraction
(/root/reference/gmft/formatters/ditr.py:280-621): predictions are row/
column *dividers* instead of row/column bands. Dividers NMS on midpoint
order, their midpoints partition words (bisect), and header/projected
classification runs on the complementary content intervals via 1-D
interval-over-a overlap. Spanning-cell semantics reuse the TATR kernel
with the larger NMS threshold.

Deliberately replicated reference quirks (byte parity):
  * column dividers sort by ``(x0 + y1) / 2`` — the reference's literal
    sort key (ditr.py:455);
  * header/projected classification uses a for-else with no break on the
    header loop (ditr.py:301-312): a row can be counted once per matching
    header AND still be checked for projected.

DITR label ids (ditr.py:52-60): 0 spanning, 1 column divider,
2 row divider, 3 top header, 4 projected, 6 no object.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd

from gmft_spark.config import ExtractConfig
from gmft_spark.kernel.geometry import select_table_words
from gmft_spark.kernel.histogram import (
    content_intervals_between_dividers,
    fill_by_dividers,
)
from gmft_spark.kernel.table import (
    TableResult,
    _apply_spanning_semantics,
    _classify_spanning_cells,
    nms_adjacent,
)

DITR_SPANNING = 0
DITR_COL_DIVIDER = 1
DITR_ROW_DIVIDER = 2
DITR_TOP_HEADER = 3
DITR_PROJECTED = 4


def _interval_ioa(a, b) -> float:
    """Closed-interval intersection over interval ``a``; a point interval
    scores 1 iff strictly inside ``b`` (dividers.py:82-95)."""
    a0, a1 = a
    b0, b1 = b
    if a0 > b1 or a1 < b0:
        return 0.0
    if a0 == a1:
        return 1.0 if b0 < a0 < b1 else 0.0
    return (min(a1, b1) - max(a0, b0)) / (a1 - a0)


def ditr_config() -> ExtractConfig:
    """DITR defaults differ from TATR (impl/ditr/config.py:19-37)."""
    return ExtractConfig(
        enable_multi_header=True,
        semantic_spanning_cells=True,
        semantic_hierarchical_left_fill="deep",
    )


def ditr_extract(
    scores,
    labels,
    boxes,
    word_boxes: np.ndarray,
    word_texts: List[str],
    table_bbox,
    config: Optional[ExtractConfig] = None,
    angle: int = 0,
    words_are_local: bool = False,
    nms_overlap_threshold_larger: float = 0.5,
) -> TableResult:
    """Full DITR extraction (ditr.py:435-621)."""
    config = config or ditr_config()
    res = TableResult()

    scores = np.asarray(scores, dtype=np.float64)
    labels = np.asarray(labels, dtype=np.int64)
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
    word_boxes = np.asarray(word_boxes, dtype=np.float64).reshape(-1, 4)

    if words_are_local:
        local_words, local_texts = word_boxes, list(word_texts)
    else:
        local_words, local_texts = select_table_words(
            word_boxes, word_texts, table_bbox, angle=angle
        )

    # logical dims: swapped for rotated tables (CroppedTable.width/height,
    # detectors/base.py:373-383; ditr.py:483 "adjust for rotations too")
    width = table_bbox[2] - table_bbox[0]
    height = table_bbox[3] - table_bbox[1]
    if angle in (90, 270):
        width, height = height, width

    # T1: proportion by label with per-label confidence (ditr.py:343-388)
    conf_map = config.cell_required_confidence
    row_divs: List[list] = []  # [x0,y0,x1,y1,conf]
    col_divs: List[list] = []
    top_headers: List[list] = []
    projected: List[list] = []
    spanning: List[dict] = []
    for s, l, b in zip(scores, labels, boxes):
        if s < conf_map.get(int(l), 99.0):
            continue
        if l == DITR_ROW_DIVIDER:
            row_divs.append([*b, float(s)])
        elif l == DITR_COL_DIVIDER:
            col_divs.append([*b, float(s)])
        elif l == DITR_TOP_HEADER:
            top_headers.append(list(b))
        elif l == DITR_PROJECTED:
            projected.append(list(b))
        elif l == DITR_SPANNING:
            spanning.append({"bbox": list(b), "confidence": float(s)})

    # T2: sort by midpoint (reference's literal keys), NMS, reduce to
    # midpoints (ditr.py:451-473)
    row_divs.sort(key=lambda b: (b[1] + b[3]) / 2)
    col_divs.sort(key=lambda b: (b[0] + b[3]) / 2)

    def _nms_tuples(items: List[list]) -> None:
        wrapped = [{"bbox": t[:4], "confidence": t[4], "_t": t} for t in items]
        nms_adjacent(wrapped, config.nms_overlap_threshold)
        items[:] = [w["_t"] for w in wrapped]

    _nms_tuples(row_divs)
    _nms_tuples(col_divs)

    row_mid = [(b[1] + b[3]) / 2 for b in row_divs]
    col_mid = [(b[0] + b[2]) / 2 for b in col_divs]
    row_intervals = [(b[1], b[3]) for b in row_divs]
    col_intervals = [(b[0], b[2]) for b in col_divs]

    # H3 fill over divider midpoints (dividers.py:37-79)
    grid = fill_by_dividers(
        local_words, local_texts, row_mid, col_mid, (0.0, 0.0, width, height)
    )
    n_rows, n_cols = grid.shape

    empty_rows = (
        [r for r in range(n_rows) if all(x is None for x in grid[r, :])]
        if config.remove_null_rows
        else []
    )

    # T3/T4: content intervals + header/projected by 1-D ioa > 0.7
    # (ditr.py:290-320,512-529)
    good_rows = content_intervals_between_dividers(row_intervals, 0.0, height)
    good_cols = content_intervals_between_dividers(col_intervals, 0.0, width)

    header_indices: List[int] = []
    projecting_indices: List[int] = []
    for i, interval in enumerate(good_rows):
        for hb in top_headers:
            if _interval_ioa(interval, (hb[1], hb[3])) > 0.7:
                header_indices.append(i)
        # reference for-else: no break above → always also check projected
        for pb in projected:
            if _interval_ioa(interval, (pb[1], pb[3])) > 0.7:
                projecting_indices.append(i)
                break

    if empty_rows:
        header_indices = [i for i in header_indices if i not in empty_rows]
        projecting_indices = [i for i in projecting_indices if i not in empty_rows]

    # spanning semantics with pseudo-bboxes from the content intervals
    hier_left_cols: List[int] = []
    if config.semantic_spanning_cells and spanning:
        rows_pseudo = np.array(
            [[0.0, y0, 0.0, y1] for y0, y1 in good_rows], dtype=np.float64
        )
        cols_pseudo = np.array(
            [[x0, 0.0, x1, 0.0] for x0, x1 in good_cols], dtype=np.float64
        )
        headers_dicts = [{"bbox": hb} for hb in top_headers]
        hier_top, mono_top, hier_left = _classify_spanning_cells(
            spanning, headers_dicts, rows_pseudo, cols_pseudo, header_indices
        )
        nms_adjacent(hier_top, nms_overlap_threshold_larger)
        nms_adjacent(mono_top, nms_overlap_threshold_larger)
        nms_adjacent(hier_left, nms_overlap_threshold_larger)
        hier_left_cols = _apply_spanning_semantics(
            grid, hier_top, mono_top, hier_left, header_indices, config
        )
    res.hier_left = hier_left_cols

    res.top_header = (
        header_indices
        if config.enable_multi_header
        else ([0] if header_indices else [])
    )

    header_rows = grid[header_indices]

    if projecting_indices:
        is_proj = [i in projecting_indices for i in range(n_rows)]
        res.projecting = [i for i, x in enumerate(is_proj) if x]

    dropped = set(header_indices) | set(empty_rows)
    data_rows = [list(grid[i]) for i in range(n_rows) if i not in dropped]

    if config.enable_multi_header and len(header_rows) > 1:
        column_headers = pd.MultiIndex.from_tuples(
            list(zip(*header_rows)),
            names=[f"Header {len(header_rows) - i}" for i in range(len(header_rows))],
        )
        res.columns = [
            " \\n".join(str(x) for x in tup if x) for tup in column_headers
        ]
        df = pd.DataFrame(data=grid, columns=column_headers)
        df.drop(index=header_indices, inplace=True)
        df.drop(
            index=[r for r in empty_rows if r not in header_indices], inplace=True
        )
        df.reset_index(drop=True, inplace=True)
        res.csv = df.to_csv(index=False, lineterminator="\n")
    else:
        from gmft_spark.kernel.table import render_csv

        column_headers = [
            " \\n".join(row[i] for row in header_rows if row[i])
            for i in range(n_cols)
        ]
        res.columns = list(column_headers)
        res.csv = render_csv(column_headers, data_rows)

    res.grid = data_rows
    res.n_rows = len(data_rows)
    res.n_cols = n_cols
    return res
