"""Deterministic table-structure extraction kernel.

Re-implements, from scratch, the semantics of the reference's
``extract_to_df`` pipeline (/root/reference/gmft/algorithm/structure.py:760-1086)
on plain numpy arrays: predicted boxes + word positions in → cell grid /
CSV out. The word→cell assignment (the hot loop) is vectorized as a full
word×band iob matrix with a scan-window mask that reproduces the
reference's bisect-bounded sequential scan exactly (structure.py:111-141,
415-454), including its early-break and first-strict-max tie-breaking.

Everything stays float64; CSV rendering goes through pandas so output is
byte-equal to ``df.to_csv(index=False, lineterminator="\\n")`` goldens
(test/formatters/tatr/test_df.py:33).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
import pandas as pd

from gmft_spark.config import (
    ExtractConfig,
    LABEL_COLUMN,
    LABEL_COLUMN_HEADER,
    LABEL_PROJECTED_ROW_HEADER,
    LABEL_ROW,
    LABEL_SPANNING_CELL,
)
from gmft_spark.kernel.geometry import (
    iob,
    iob_1d,
    iob_matrix,
    select_table_words,
    symmetric_iob_1d,
)
from gmft_spark.kernel.text import word_height_estimate


@dataclass
class TableResult:
    """Output of one table extraction."""

    status: str = "ok"  # 'ok' | 'error'
    message: Optional[str] = None
    csv: Optional[str] = None
    n_rows: int = 0
    n_cols: int = 0
    grid: Optional[List[List[Optional[str]]]] = None  # data rows (headers dropped)
    columns: Optional[List[str]] = None  # rendered single-level header
    top_header: List[int] = field(default_factory=list)
    projecting: List[int] = field(default_factory=list)
    hier_left: List[int] = field(default_factory=list)
    outliers: dict = field(default_factory=dict)
    # F7b diagnostic (structure.py:748-750,963-966): per-row y-midpoints of
    # the words assigned under large_table_guess, in word order. The
    # reference collects but never reads this; kept as a result field (not
    # an output column) so downstream schemas and goldens are unaffected.
    row_means: Optional[List[List[float]]] = None


def _box(conf: float, label: int, bbox) -> dict:
    return {"confidence": float(conf), "label": int(label), "bbox": list(bbox)}


def nms_adjacent(items: List[dict], overlap_threshold: float = 0.1) -> int:
    """Sequential adjacent-pair non-maxima suppression over a sorted list
    (structure.py:203-222): when two neighbours overlap (iob of the earlier
    over the later > threshold) the lower-confidence one is dropped and the
    comparison restarts at the same position. Mutates ``items`` in place,
    returns the number removed. Order-dependent by design."""
    removed = 0
    i = 1
    while i < len(items):
        prev, cur = items[i - 1], items[i]
        if iob(prev["bbox"], cur["bbox"]) > overlap_threshold:
            if prev["confidence"] > cur["confidence"]:
                items.pop(i)
            else:
                items.pop(i - 1)
            removed += 1
        else:
            i += 1
    return removed


def _widen_rows(rows: List[dict], headers: List[dict]) -> None:
    """Stretch every row/header to the common [min x0, max x1] envelope of
    the rows (structure.py:144-153)."""
    left = min(r["bbox"][0] for r in rows)
    right = max(r["bbox"][2] for r in rows)
    for r in rows:
        r["bbox"][0] = left
        r["bbox"][2] = right
    for h in headers:
        h["bbox"][0] = left
        h["bbox"][2] = right


def _fill_gaps(
    rows: List[dict], gap_height: float, leave_gap: float = 0.4, top=None
) -> None:
    """Insert synthetic rows into vertical gaps larger than ``gap_height``,
    leaving a ``leave_gap``-fraction margin on each side; also fills the gap
    between the top of the table (header top) and the first row
    (structure.py:156-200). No-op when gap_height is NaN (no words)."""
    margin = leave_gap * gap_height
    if top is not None and rows:
        if rows[0]["bbox"][1] - top > gap_height:
            first = rows[0]["bbox"]
            rows.insert(
                0,
                _box(1, LABEL_ROW, [first[0], top, first[2], first[1] - margin]),
            )
    i = 1
    while i < len(rows):
        prev, cur = rows[i - 1]["bbox"], rows[i]["bbox"]
        if cur[1] - prev[3] > gap_height:
            rows.insert(
                i,
                _box(1, LABEL_ROW, [prev[0], prev[3] + margin, prev[2], cur[1] - margin]),
            )
        i += 1


def _in_header_band(bbox, headers: List[dict], threshold: float = 0.5) -> bool:
    """Row-direction iob against any header box (structure.py:225-233)."""
    return any(
        iob_1d(bbox[1], bbox[3], h["bbox"][1], h["bbox"][3]) > threshold
        for h in headers
    )


def _uniform_rows_for_large_table(
    rows: List[dict],
    headers: List[dict],
    row_height: float,
    max_rows: int,
    outliers: dict,
    known_means=None,
) -> List[dict]:
    """Regenerate row boxes for the large-table guess
    (structure.py:248-323): keep header-band rows, then either tile uniform
    rows of ``row_height`` down the table (Archimedean fill) or center rows
    on ``known_means``. Mutates ``rows`` (header rows are consumed)."""
    if not rows:
        return []
    left = min(r["bbox"][0] for r in rows)
    right = max(r["bbox"][2] for r in rows)
    table_ymax = rows[-1]["bbox"][3]

    new_rows: List[dict] = []
    if headers:
        while rows:
            if _in_header_band(rows[0]["bbox"], headers):
                new_rows.append(rows.pop(0))
            else:
                break
        if not rows:
            return new_rows
    y = rows[0]["bbox"][1]

    est = (table_ymax - y) / row_height
    if est > max_rows:
        outliers["excessive rows"] = max(outliers.get("excessive rows", 0), est)
        row_height = (table_ymax - y) / 100

    if known_means:
        start_y = y
        for mean in known_means:
            if mean < start_y:
                continue
            y = mean - row_height / 2
            new_rows.append(_box(1, LABEL_ROW, [left, y, right, y + row_height]))
    else:
        while y < table_ymax:
            new_rows.append(_box(1, LABEL_ROW, [left, y, right, y + row_height]))
            y += row_height
    new_rows.sort(key=lambda r: r["bbox"][3])
    return new_rows


def _assign_best_band(words: np.ndarray, bands: np.ndarray, axis: str):
    """For each word, the band with the max iob — restricted to the
    reference's scan window (start at the first band whose far edge passes
    the word's near edge; stop after the first band that starts beyond the
    word). First strict max wins, 0-iob gives no assignment
    (structure.py:111-141,415-454). ``bands`` must be sorted by far edge.

    Returns ``(best_idx[int64] (-1 = none), best_iob[float64])``."""
    n_w, n_b = len(words), len(bands)
    if n_w == 0 or n_b == 0:
        return np.full(n_w, -1, dtype=np.int64), np.zeros(n_w)
    if axis == "y":
        lo, hi = words[:, 1], words[:, 3]
        blo, bhi = bands[:, 1], bands[:, 3]
    else:
        lo, hi = words[:, 0], words[:, 2]
        blo, bhi = bands[:, 0], bands[:, 2]
    i0 = np.searchsorted(bhi, lo, side="left")
    idx = np.arange(n_b)[None, :]
    in_range = idx >= i0[:, None]
    past = (blo[None, :] > hi[:, None]) & in_range
    has_past = past.any(axis=1)
    j = np.where(has_past, past.argmax(axis=1), n_b - 1)  # break row is inclusive
    valid = in_range & (idx <= j[:, None])
    scores = np.where(valid, iob_matrix(words, bands), 0.0)
    best = scores.argmax(axis=1)
    best_iob = scores[np.arange(n_w), best]
    return np.where(best_iob > 0, best, -1).astype(np.int64), best_iob


def _bands_in_window(
    bands_1d: np.ndarray, lo: float, hi: float, score_fn, threshold: float
) -> List[int]:
    """All band indices whose 1-D iob with [lo, hi] exceeds ``threshold``,
    under the same scan-window bounds as _assign_best_band
    (structure.py:366-412). ``bands_1d`` is [B,2] (near, far) sorted by far."""
    out = []
    i = int(np.searchsorted(bands_1d[:, 1], lo, side="left"))
    while i < len(bands_1d):
        b0, b1 = bands_1d[i]
        if score_fn(lo, hi, b0, b1) > threshold:
            out.append(i)
        if hi < b0:
            break
        i += 1
    return out


def _classify_spanning_cells(
    spanning: List[dict],
    headers: List[dict],
    rows_bbox: np.ndarray,
    cols_bbox: np.ndarray,
    header_indices: List[int],
):
    """Split spanning cells into hierarchical-top, monosemantic-top and
    hierarchical-left groups (structure.py:457-545)."""
    hier_top, mono_top, hier_left = [], [], []
    rows_y = rows_bbox[:, [1, 3]] if len(rows_bbox) else np.zeros((0, 2))
    cols_x = cols_bbox[:, [0, 2]] if len(cols_bbox) else np.zeros((0, 2))
    header_set = set(header_indices)
    for cell in spanning:
        b = cell["bbox"]
        in_header = any(iob(b, h["bbox"]) > 0.5 for h in headers)
        if in_header:
            valid_rows = _bands_in_window(rows_y, b[1], b[3], iob_1d, 0.2)
            valid_cols = _bands_in_window(
                cols_x, b[0], b[2], symmetric_iob_1d, 0.2
            )
            valid_rows = [r for r in valid_rows if r in header_set]
            if len(valid_rows) == 1 and len(valid_cols) > 1:
                hier_top.append(
                    {"row_idx": valid_rows[0], "col_indices": valid_cols, **cell}
                )
            elif len(valid_cols) == 1 and len(valid_rows) > 1:
                mono_top.append(
                    {"col_idx": valid_cols[0], "row_indices": valid_rows, **cell}
                )
        else:
            valid_cols = _bands_in_window(cols_x, b[0], b[2], iob_1d, 0.2)
            if len(valid_cols) == 1:
                valid_rows = _bands_in_window(
                    rows_y, b[1], b[3], symmetric_iob_1d, 0.2
                )
                hier_left.append(
                    {"col_idx": valid_cols[0], "row_indices": valid_rows, **cell}
                )
    hier_left.sort(key=lambda c: c["bbox"][1])
    return hier_top, mono_top, hier_left


def _apply_spanning_semantics(
    grid: np.ndarray,
    hier_top: List[dict],
    mono_top: List[dict],
    hier_left: List[dict],
    header_indices: List[int],
    config: ExtractConfig,
) -> List[int]:
    """Fill the cell grid using detected spanning-cell semantics
    (structure.py:548-668). Returns the hier-left column indices."""
    hier_left_cols: List[int] = []

    if config.semantic_hierarchical_left_fill == "deep":
        changes = []
        for cell in hier_left:
            col = cell["col_idx"]
            found = None
            cutoff = len(cell["row_indices"])
            for i, r in enumerate(cell["row_indices"]):
                content = grid[r, col]
                if content:
                    if found is None:
                        found = content
                    else:
                        cutoff = i
                        break
            if found:
                changes.append((col, found, cell["row_indices"][:cutoff]))
        for col, content, row_nums in changes:
            for r in row_nums:
                if grid[r, col] is None:
                    grid[r, col] = content

    elif config.semantic_hierarchical_left_fill == "algorithm":
        counts: dict = {}
        for cell in hier_left:
            counts[cell["col_idx"]] = counts.get(cell["col_idx"], 0) + 1
        hier_left_cols = [c for c, n in counts.items() if c < 3 and n >= 2]
        first_row = max(header_indices, default=-1) + 1
        content = None
        for col in hier_left_cols:
            for r in range(first_row, grid.shape[0]):
                if grid[r, col] is not None:
                    content = grid[r, col]
                else:
                    grid[r, col] = content

    for cell in hier_top:
        r = cell["row_idx"]
        parts = [grid[r, c] for c in cell["col_indices"] if grid[r, c]]
        if parts:
            joined = " ".join(parts)
            for c in cell["col_indices"]:
                grid[r, c] = joined

    for cell in mono_top:
        col = cell["col_idx"]
        parts = [grid[r, col] for r in cell["row_indices"] if grid[r, col]]
        if len(parts) > 1:
            for r in cell["row_indices"]:
                grid[r, col] = None
            grid[cell["row_indices"][-1], col] = " \\n".join(parts)

    return hier_left_cols


def _fill_grid(
    words: np.ndarray,
    texts: List[str],
    rows_bbox: np.ndarray,
    cols_bbox: np.ndarray,
    config: ExtractConfig,
    outliers: dict,
    row_means: Optional[List[List[float]]] = None,
) -> np.ndarray:
    """Assign every word to (best row × best column) and concatenate cell
    text in word order (structure.py:671-757), vectorized. When
    ``row_means`` is given (large_table_guess, structure.py:748-750) each
    kept word's y-midpoint is appended to its row's list in word order."""
    n_rows, n_cols = len(rows_bbox), len(cols_bbox)
    grid = np.empty((n_rows, n_cols), dtype=object)
    if len(words) == 0:
        return grid

    best_r, _ = _assign_best_band(words, rows_bbox, "y")
    best_c, _ = _assign_best_band(words, cols_bbox, "x")

    assigned = (best_r >= 0) & (best_c >= 0)

    # cell = row ∩ column (empty box when degenerate, like Rect.EMPTY);
    # score = how much of the word is inside the cell
    rb = rows_bbox[np.clip(best_r, 0, None)]
    cb = cols_bbox[np.clip(best_c, 0, None)]
    cx0 = np.maximum(rb[:, 0], cb[:, 0])
    cy0 = np.maximum(rb[:, 1], cb[:, 1])
    cx1 = np.minimum(rb[:, 2], cb[:, 2])
    cy1 = np.minimum(rb[:, 3], cb[:, 3])
    degenerate = (cx0 >= cx1) | (cy0 >= cy1)
    cx0, cy0, cx1, cy1 = (
        np.where(degenerate, 0.0, v) for v in (cx0, cy0, cx1, cy1)
    )
    wx0, wy0, wx1, wy1 = (words[:, i] for i in range(4))
    ix = np.clip(np.minimum(wx1, cx1) - np.maximum(wx0, cx0), 0.0, None)
    iy = np.clip(np.minimum(wy1, cy1) - np.maximum(wy0, cy0), 0.0, None)
    warea = (wx1 - wx0) * (wy1 - wy0)
    scores = np.zeros(len(words))
    np.divide(ix * iy, warea, out=scores, where=warea > 0)

    keep = assigned & (scores >= config.iob_reject_threshold)
    if not keep.all():
        skipped = [t for t, k in zip(texts, keep) if not k]
        outliers["skipped text"] = (
            outliers.get("skipped text", "") + " " + " ".join(skipped)
        )
    low = scores[keep & (scores < config.iob_warn_threshold)]
    if len(low):
        outliers["lowest iob"] = min(outliers.get("lowest iob", 1), float(low.min()))

    kept_idx = np.flatnonzero(keep)
    if row_means is not None and len(kept_idx):
        mids = (wy0[kept_idx] + wy1[kept_idx]) / 2
        rws = best_r[kept_idx]
        # stable grouping preserves original word order within each row
        order = np.argsort(rws, kind="stable")
        for j in order:
            row_means[rws[j]].append(float(mids[j]))

    # concatenate cell text in word order (stable sort by cell keeps it)
    if len(kept_idx):
        flat = best_r[kept_idx] * n_cols + best_c[kept_idx]
        _join_into_grid(grid, flat, texts, kept_idx)
    return grid


def _join_into_grid(grid: np.ndarray, flat_keys: np.ndarray, texts, kept_idx):
    """Space-join each cell's words in original word order into the raveled
    ``grid`` (stable argsort groups by cell without reordering words)."""
    order = np.argsort(flat_keys, kind="stable")
    sk = flat_keys[order]
    starts = np.flatnonzero(np.concatenate(([True], sk[1:] != sk[:-1])))
    ends = np.concatenate((starts[1:], [len(sk)]))
    raveled = grid.ravel()
    for b0, b1 in zip(starts, ends):
        raveled[sk[b0]] = " ".join(texts[kept_idx[order[j]]] for j in range(b0, b1))


def extract_table(
    scores,
    labels,
    boxes,
    word_boxes: np.ndarray,
    word_texts: List[str],
    table_bbox,
    config: Optional[ExtractConfig] = None,
    angle: int = 0,
    words_are_local: bool = False,
) -> TableResult:
    """Full deterministic extraction for one table
    (structure.py:760-1086): confidence filter → label partition → sort →
    NMS → widen/gap-fill → (large-table re-estimation) → overlap check →
    word-to-cell assignment → null-row removal → header/projected
    identification → (spanning semantics) → header extraction → CSV.

    ``scores``/``labels``/``boxes`` are the raw structure predictions in
    table-local 72-dpi coordinates; ``word_boxes``/``word_texts`` are page
    words (or table-local when ``words_are_local``).
    """
    config = config or ExtractConfig()
    res = TableResult()
    outliers = res.outliers

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

    # F1: confidence filter + label partition (structure.py:773-790)
    horizontals: List[dict] = []
    columns: List[dict] = []
    spanning: List[dict] = []
    conf_map = config.cell_required_confidence
    for s, l, b in zip(scores, labels, boxes):
        if s < conf_map.get(int(l), 99.0):
            continue
        item = _box(s, l, b)
        if l == LABEL_SPANNING_CELL:
            spanning.append(item)
        elif l in (LABEL_ROW, LABEL_COLUMN_HEADER, LABEL_PROJECTED_ROW_HEADER):
            horizontals.append(item)
        elif l == LABEL_COLUMN:
            columns.append(item)
        # LABEL_TABLE / LABEL_NO_OBJECT boxes carry no structure

    # F2: stable sort — horizontals by ymax, columns by xmax (:791-794)
    horizontals.sort(key=lambda x: x["bbox"][3])
    columns.sort(key=lambda x: x["bbox"][2])

    if not horizontals or not columns:
        res.status = "error"
        res.message = "No rows or columns detected"
        return res

    rows = [h for h in horizontals if h["label"] == LABEL_ROW]
    headers = [h for h in horizontals if h["label"] == LABEL_COLUMN_HEADER]
    projecting = [h for h in horizontals if h["label"] == LABEL_PROJECTED_ROW_HEADER]

    # F3: NMS (:804-816)
    nms_adjacent(projecting, config.nms_overlap_threshold)
    num_removed = nms_adjacent(rows, config.nms_overlap_threshold)
    if num_removed > config.nms_warn_threshold:
        outliers["nms removed rows"] = max(
            outliers.get("nms removed rows", 0), num_removed
        )

    if not rows:
        res.status = "error"
        res.message = "No rows after suppression"
        return res

    # F4: widen + gap fill (:818-828)
    _widen_rows(rows, headers)
    word_height = word_height_estimate(
        local_words, config.smallest_supported_text_height
    )
    top_of_table = headers[0]["bbox"][1] if headers else None
    _fill_gaps(rows, word_height, top=top_of_table)

    # F5: large-table guess (:830-931)
    bx0, by0, bx1, by1 = table_bbox
    table_area = (bx1 - bx0) * (by1 - by0)
    total_row_area = sum(
        (r["bbox"][2] - r["bbox"][0]) * (r["bbox"][3] - r["bbox"][1]) for r in rows
    )
    if config.force_large_table_assumption is None:
        large = num_removed >= config.large_table_if_n_rows_removed or (
            total_row_area
            > (1 + config.large_table_row_overlap_threshold) * table_area
            and len(rows) > config.large_table_threshold
        )
    else:
        large = config.force_large_table_assumption

    if large:
        rows = _uniform_rows_for_large_table(
            rows, headers, word_height, config.large_table_maximum_rows, outliers
        )
        first, last = rows[0]["bbox"], rows[-1]["bbox"]
        total_row_area = (last[3] - first[1]) * (last[2] - first[0])
        top, bottom = first[1], last[3]

        # bin word y-centers into the uniform rows, then re-estimate row
        # height from the median of consecutive bin-mean differences
        n_bins = len(rows)
        bins: List[List[float]] = [[] for _ in range(n_bins)]
        for (wx0, wy0, wx1, wy1), _t in zip(local_words, local_texts):
            yavg = (wy0 + wy1) / 2
            b = int((yavg - top) / (bottom - top) * n_bins)
            if 0 <= b < n_bins:
                bins[b].append(yavg)
        means = [float(np.mean(b)) for b in bins if b]
        if not means:
            outliers["no text"] = True
            res.csv = pd.DataFrame().to_csv(index=False, lineterminator="\n")
            res.grid = []
            res.columns = []
            return res
        diffs = [means[i + 1] - means[i] for i in range(len(means) - 1)]
        height = float(np.median(diffs)) if diffs else bottom - top
        i = 1
        while i < len(means):
            if abs(means[i] - means[i - 1]) < (
                config.large_table_merge_distance * word_height
            ):
                means[i - 1] = (means[i - 1] + means[i]) / 2
                means.pop(i)
            i += 1
        rows = _uniform_rows_for_large_table(
            rows,
            headers,
            height,
            config.large_table_maximum_rows,
            outliers,
            known_means=means,
        )

    # F6: overlap sanity check (:942-959)
    total_column_area = sum(
        (c["bbox"][2] - c["bbox"][0]) * (c["bbox"][3] - c["bbox"][1])
        for c in columns
        if c["label"] == LABEL_COLUMN
    )
    total_area = (total_row_area + total_column_area) / 2
    if total_area > (1 + config.total_overlap_reject_threshold) * table_area:
        res.status = "error"
        res.message = (
            "The identified boxes have significant overlap: "
            f"{total_area / table_area - 1:.2%} of area is overlapping "
            f"(Max is {config.total_overlap_reject_threshold:.2%})"
        )
        return res
    if total_area > (1 + config.total_overlap_warn_threshold) * table_area:
        outliers["high overlap"] = total_area / table_area - 1

    # F7: word→cell assignment (:671-757,968-975); F7b row-mean tracking
    # is active exactly when the large-table guess is (:963-966)
    rows_bbox = np.array([r["bbox"] for r in rows], dtype=np.float64)
    cols_bbox = np.array([c["bbox"] for c in columns], dtype=np.float64)
    row_means: Optional[List[List[float]]] = (
        [[] for _ in range(len(rows))] if large else None
    )
    grid = _fill_grid(
        local_words, local_texts, rows_bbox, cols_bbox, config, outliers,
        row_means=row_means,
    )
    res.row_means = row_means

    # F8: null-row removal (:980-987)
    if config.remove_null_rows:
        keep = [
            n for n in range(len(rows)) if any(x is not None for x in grid[n, :])
        ]
        grid = grid[keep]
        rows = [rows[n] for n in keep]
        rows_bbox = rows_bbox[keep]

    # header / projected row identification (:345-363,993-995)
    header_indices = [
        i for i, r in enumerate(rows) if _in_header_band(r["bbox"], headers)
    ]
    projecting_indices = [
        i
        for i, r in enumerate(rows)
        if any(iob(r["bbox"], p["bbox"]) > 0.7 for p in projecting)
    ]

    # F10/F11: spanning-cell semantics (:997-1034)
    hier_left_cols: List[int] = []
    if config.semantic_spanning_cells:
        hier_top, mono_top, hier_left = _classify_spanning_cells(
            spanning, headers, rows_bbox, cols_bbox, header_indices
        )
        nms_adjacent(hier_top, config.nms_overlap_threshold)
        nms_adjacent(mono_top, config.nms_overlap_threshold)
        nms_adjacent(hier_left, config.nms_overlap_threshold)
        hier_left_cols = _apply_spanning_semantics(
            grid, hier_top, mono_top, hier_left, header_indices, config
        )
    res.hier_left = hier_left_cols

    res.top_header = (
        header_indices
        if config.enable_multi_header
        else ([0] if header_indices else [])
    )

    # F9: header extraction + dataframe build (:1042-1086)
    n_cols = len(columns)
    header_rows = grid[header_indices]

    if projecting_indices:
        is_proj = [
            i in projecting_indices
            for i in range(len(rows))
            if i not in header_indices
        ]
        res.projecting = [i for i, x in enumerate(is_proj) if x]

    header_set = set(header_indices)
    data_rows = [
        list(grid[i]) for i in range(len(rows)) if i not in header_set
    ]

    if config.enable_multi_header and len(header_rows) > 1:
        # MultiIndex CSV rendering (two header lines, 'nan' literals for
        # missing cells) stays on pandas for byte parity
        column_headers = pd.MultiIndex.from_tuples(
            list(zip(*header_rows)),
            names=[f"Header {len(header_rows) - i}" for i in range(len(header_rows))],
        )
        res.columns = [
            " \\n".join(str(x) for x in tup if x) for tup in column_headers
        ]
        df = pd.DataFrame(data=grid, columns=column_headers)
        df.drop(index=header_indices, inplace=True)
        df.reset_index(drop=True, inplace=True)
        res.csv = df.to_csv(index=False, lineterminator="\n")
    else:
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


def render_csv(columns, rows) -> str:
    """Single-header CSV renderer, byte-equal to pandas
    ``df.to_csv(index=False, lineterminator="\\n")`` for str/None cells
    (both delegate to the stdlib csv writer with QUOTE_MINIMAL; None
    renders as an empty field) — verified by property test against pandas."""
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(columns)
    w.writerows(rows)
    return buf.getvalue()
