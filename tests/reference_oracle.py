"""Test-only oracle: a deliberately naive, loop-based transcription of the
reference's extract_to_df semantics (/root/reference/gmft/algorithm/
structure.py:760-1086), written with plain dicts/loops/bisect — no numpy
vectorization — purely to cross-check gmft_spark.kernel.table.extract_table
on arbitrary scenes. Slow by design; never imported by the engine."""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd


def _iob(a, b):
    ix = min(a[2], b[2]) - max(a[0], b[0])
    iy = min(a[3], b[3]) - max(a[1], b[1])
    if ix <= 0 or iy <= 0:
        inter = 0.0
    else:
        inter = ix * iy
    area = (a[2] - a[0]) * (a[3] - a[1])
    if area > 0:
        return inter / area
    return 0.0


def _intersect(a, b):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    if x0 >= x1 or y0 >= y1:
        return (0.0, 0.0, 0.0, 0.0)
    return (x0, y0, x1, y1)


def _iob_1d_rows(a, b):
    inter = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    return inter / (a[3] - a[1])


def _nms(items, thr):
    removed = 0
    i = 1
    while i < len(items):
        if _iob(items[i - 1]["bbox"], items[i]["bbox"]) > thr:
            if items[i - 1]["confidence"] > items[i]["confidence"]:
                items.pop(i)
            else:
                items.pop(i - 1)
            removed += 1
        else:
            i += 1
    return removed


def _best_row(rows, tb):
    num, best = None, 0.0
    i = bisect.bisect_left([r["bbox"][3] for r in rows], tb[1])
    while i < len(rows):
        s = _iob(tb, rows[i]["bbox"])
        if s > best:
            best, num = s, i
        if tb[3] < rows[i]["bbox"][1]:
            break
        i += 1
    return num, best


def _best_col(cols, tb):
    num, best = None, 0.0
    i = bisect.bisect_left([c["bbox"][2] for c in cols], tb[0])
    while i < len(cols):
        s = _iob(tb, cols[i]["bbox"])
        if s > best:
            best, num = s, i
        if tb[2] < cols[i]["bbox"][0]:
            break
        i += 1
    return num, best


def _rows_for_box(rows_y, b, thr, score):
    out = []
    i = bisect.bisect_left([r[1] for r in rows_y], b[1])
    while i < len(rows_y):
        if score(b[1], b[3], rows_y[i][0], rows_y[i][1]) > thr:
            out.append(i)
        if b[3] < rows_y[i][0]:
            break
        i += 1
    return out


def _cols_for_box(cols_x, b, thr, score):
    out = []
    i = bisect.bisect_left([c[1] for c in cols_x], b[0])
    while i < len(cols_x):
        if score(b[0], b[2], cols_x[i][0], cols_x[i][1]) > thr:
            out.append(i)
        if b[2] < cols_x[i][0]:
            break
        i += 1
    return out


def _ioa1(a0, a1, b0, b1):
    return max(0.0, min(a1, b1) - max(a0, b0)) / (a1 - a0)


def _sym1(a0, a1, b0, b1):
    return max(0.0, min(a1, b1) - max(a0, b0)) / min(a1 - a0, b1 - b0)


def oracle_extract(
    scores, labels, boxes, word_boxes, texts, table_bbox, config, angle=0,
    row_means_out=None,
):
    """Returns (status, csv, top_header, projecting, hier_left, outliers).

    ``row_means_out``: optional list; when the large-table guess fires it
    is filled with one list per (pre-null-removal) row holding each kept
    word's y-midpoint in word order (F7b, structure.py:748-750) —
    left empty when the guess does not fire, mirroring the reference's
    ``row_means = None`` outside large_table_guess."""
    outliers = {}

    # word selection (strict intersection) + offset + rotation
    bx0, by0, bx1, by1 = table_bbox
    w_, h_ = bx1 - bx0, by1 - by0
    words = []
    for (x0, y0, x1, y1), t in zip(np.asarray(word_boxes).reshape(-1, 4), texts):
        if max(x0, bx0) < min(x1, bx1) and max(y0, by0) < min(y1, by1):
            lx0, ly0, lx1, ly1 = x0 - bx0, y0 - by0, x1 - bx0, y1 - by0
            if angle == 90:
                lx0, ly0, lx1, ly1 = h_ - ly1, lx0, h_ - ly0, lx1
            elif angle == 180:
                lx0, ly0, lx1, ly1 = w_ - lx1, h_ - ly1, w_ - lx0, h_ - ly0
            elif angle == 270:
                lx0, ly0, lx1, ly1 = ly0, w_ - lx1, ly1, w_ - lx0
            words.append((lx0, ly0, lx1, ly1, t))

    conf_map = config.cell_required_confidence
    horizontals, columns, spanning = [], [], []
    for s, l, b in zip(scores, labels, boxes):
        if s < conf_map.get(int(l), 99.0):
            continue
        item = {"confidence": float(s), "label": int(l), "bbox": list(b)}
        if l == 5:
            spanning.append(item)
        elif l in (2, 3, 4):
            horizontals.append(item)
        elif l == 1:
            columns.append(item)
    horizontals.sort(key=lambda x: x["bbox"][3])
    columns.sort(key=lambda x: x["bbox"][2])
    if not horizontals or not columns:
        return ("error", None, [], [], [], outliers)

    rows = [h for h in horizontals if h["label"] == 2]
    headers = [h for h in horizontals if h["label"] == 3]
    projecting = [h for h in horizontals if h["label"] == 4]

    _nms(projecting, config.nms_overlap_threshold)
    removed = _nms(rows, config.nms_overlap_threshold)
    if removed > config.nms_warn_threshold:
        outliers["nms removed rows"] = max(
            outliers.get("nms removed rows", 0), removed
        )
    if not rows:
        return ("error", None, [], [], [], outliers)

    left = min(r["bbox"][0] for r in rows)
    right = max(r["bbox"][2] for r in rows)
    for r in rows + headers:
        r["bbox"][0], r["bbox"][2] = left, right

    heights = [
        (w[3] - w[1])
        for w in words
        if (w[3] - w[1]) > config.smallest_supported_text_height
    ]
    word_height = 0.95 * float(np.median(heights)) if heights else float("nan")

    margin = 0.4 * word_height
    if headers and rows:
        if rows[0]["bbox"][1] - headers[0]["bbox"][1] > word_height:
            f = rows[0]["bbox"]
            rows.insert(
                0,
                {
                    "confidence": 1,
                    "label": 2,
                    "bbox": [f[0], headers[0]["bbox"][1], f[2], f[1] - margin],
                },
            )
    i = 1
    while i < len(rows):
        p, c = rows[i - 1]["bbox"], rows[i]["bbox"]
        if c[1] - p[3] > word_height:
            rows.insert(
                i,
                {
                    "confidence": 1,
                    "label": 2,
                    "bbox": [p[0], p[3] + margin, p[2], c[1] - margin],
                },
            )
        i += 1

    table_area = w_ * h_
    total_row_area = sum(
        (r["bbox"][2] - r["bbox"][0]) * (r["bbox"][3] - r["bbox"][1]) for r in rows
    )
    if config.force_large_table_assumption is None:
        large = removed >= config.large_table_if_n_rows_removed or (
            total_row_area
            > (1 + config.large_table_row_overlap_threshold) * table_area
            and len(rows) > config.large_table_threshold
        )
    else:
        large = config.force_large_table_assumption

    def regen(rows_in, row_h, means=None):
        if not rows_in:
            return []
        lo = min(r["bbox"][0] for r in rows_in)
        hi = max(r["bbox"][2] for r in rows_in)
        ymax = rows_in[-1]["bbox"][3]
        out = []
        if headers:
            while rows_in:
                if any(
                    _iob_1d_rows(rows_in[0]["bbox"], hh["bbox"]) > 0.5
                    for hh in headers
                ):
                    out.append(rows_in.pop(0))
                else:
                    break
            if not rows_in:
                return out
        y = rows_in[0]["bbox"][1]
        est = (ymax - y) / row_h
        if est > config.large_table_maximum_rows:
            outliers["excessive rows"] = max(
                outliers.get("excessive rows", 0), est
            )
            row_h = (ymax - y) / 100
        if means:
            sy = y
            for m in means:
                if m < sy:
                    continue
                y = m - row_h / 2
                out.append(
                    {"confidence": 1, "label": 2, "bbox": [lo, y, hi, y + row_h]}
                )
        else:
            while y < ymax:
                out.append(
                    {"confidence": 1, "label": 2, "bbox": [lo, y, hi, y + row_h]}
                )
                y += row_h
        out.sort(key=lambda r: r["bbox"][3])
        return out

    if large:
        rows = regen(rows, word_height)
        if not rows:
            return ("error", None, [], [], [], outliers)
        first, last = rows[0]["bbox"], rows[-1]["bbox"]
        total_row_area = (last[3] - first[1]) * (last[2] - first[0])
        top, bottom = first[1], last[3]
        bins = [[] for _ in rows]
        for x0, y0, x1, y1, t in words:
            yavg = (y0 + y1) / 2
            b = int((yavg - top) / (bottom - top) * len(rows))
            if 0 <= b < len(bins):
                bins[b].append(yavg)
        means = [float(np.mean(b)) for b in bins if b]
        if not means:
            outliers["no text"] = True
            return (
                "ok",
                pd.DataFrame().to_csv(index=False, lineterminator="\n"),
                [],
                [],
                [],
                outliers,
            )
        diffs = [means[k + 1] - means[k] for k in range(len(means) - 1)]
        height = float(np.median(diffs)) if diffs else bottom - top
        k = 1
        while k < len(means):
            if abs(means[k] - means[k - 1]) < (
                config.large_table_merge_distance * word_height
            ):
                means[k - 1] = (means[k - 1] + means[k]) / 2
                means.pop(k)
            k += 1
        rows = regen(rows, height, means)

    total_col_area = sum(
        (c["bbox"][2] - c["bbox"][0]) * (c["bbox"][3] - c["bbox"][1])
        for c in columns
        if c["label"] == 1
    )
    total = (total_row_area + total_col_area) / 2
    if total > (1 + config.total_overlap_reject_threshold) * table_area:
        return ("error", None, [], [], [], outliers)
    if total > (1 + config.total_overlap_warn_threshold) * table_area:
        outliers["high overlap"] = total / table_area - 1

    track_means = large and row_means_out is not None
    if track_means:
        row_means_out.extend([] for _ in range(len(rows)))
    grid = np.empty((len(rows), len(columns)), dtype=object)
    for x0, y0, x1, y1, t in words:
        tb = (x0, y0, x1, y1)
        rnum, _ri = _best_row(rows, tb)
        if rnum is None:
            outliers["skipped text"] = outliers.get("skipped text", "") + " " + t
            continue
        cnum, _ci = _best_col(columns, tb)
        if cnum is None:
            outliers["skipped text"] = outliers.get("skipped text", "") + " " + t
            continue
        cell = _intersect(rows[rnum]["bbox"], columns[cnum]["bbox"])
        score = _iob(tb, cell)
        if score < config.iob_reject_threshold:
            outliers["skipped text"] = outliers.get("skipped text", "") + " " + t
            continue
        if score < config.iob_warn_threshold:
            outliers["lowest iob"] = min(outliers.get("lowest iob", 1), score)
        if track_means:
            row_means_out[rnum].append((y1 + y0) / 2)
        if grid[rnum, cnum] is None:
            grid[rnum, cnum] = t
        else:
            grid[rnum, cnum] = grid[rnum, cnum] + " " + t

    if config.remove_null_rows:
        keep = [
            n for n in range(len(rows)) if any(x is not None for x in grid[n, :])
        ]
        grid = grid[keep]
        rows = [rows[n] for n in keep]

    header_indices = [
        i
        for i, r in enumerate(rows)
        if any(_iob_1d_rows(r["bbox"], hh["bbox"]) > 0.5 for hh in headers)
    ]
    projecting_indices = [
        i
        for i, r in enumerate(rows)
        if any(_iob(r["bbox"], p["bbox"]) > 0.7 for p in projecting)
    ]

    hier_left_idx = []
    if config.semantic_spanning_cells:
        rows_y = [(r["bbox"][1], r["bbox"][3]) for r in rows]
        cols_x = [(c["bbox"][0], c["bbox"][2]) for c in columns]
        hset = set(header_indices)
        hier_top, mono_top, hier_left = [], [], []
        for cell in spanning:
            b = cell["bbox"]
            if any(_iob(b, hh["bbox"]) > 0.5 for hh in headers):
                vr = [
                    r
                    for r in _rows_for_box(rows_y, b, 0.2, _ioa1)
                    if r in hset
                ]
                vc = _cols_for_box(cols_x, b, 0.2, _sym1)
                if len(vr) == 1 and len(vc) > 1:
                    hier_top.append(
                        {"row_idx": vr[0], "col_indices": vc, **cell}
                    )
                elif len(vc) == 1 and len(vr) > 1:
                    mono_top.append(
                        {"col_idx": vc[0], "row_indices": vr, **cell}
                    )
            else:
                vc = _cols_for_box(cols_x, b, 0.2, _ioa1)
                if len(vc) == 1:
                    vr = _rows_for_box(rows_y, b, 0.2, _sym1)
                    hier_left.append(
                        {"col_idx": vc[0], "row_indices": vr, **cell}
                    )
        hier_left.sort(key=lambda c: c["bbox"][1])
        _nms(hier_top, config.nms_overlap_threshold)
        _nms(mono_top, config.nms_overlap_threshold)
        _nms(hier_left, config.nms_overlap_threshold)

        if config.semantic_hierarchical_left_fill == "deep":
            changes = []
            for cell in hier_left:
                col = cell["col_idx"]
                found = None
                cut = len(cell["row_indices"])
                for k, r in enumerate(cell["row_indices"]):
                    if grid[r, col]:
                        if found is None:
                            found = grid[r, col]
                        else:
                            cut = k
                            break
                if found:
                    changes.append((col, found, cell["row_indices"][:cut]))
            for col, content, rns in changes:
                for r in rns:
                    if grid[r, col] is None:
                        grid[r, col] = content
        elif config.semantic_hierarchical_left_fill == "algorithm":
            counts = {}
            for cell in hier_left:
                counts[cell["col_idx"]] = counts.get(cell["col_idx"], 0) + 1
            hier_left_idx = [c for c, n in counts.items() if c < 3 and n >= 2]
            first_row = max(header_indices, default=-1) + 1
            content = None
            for col in hier_left_idx:
                for r in range(first_row, grid.shape[0]):
                    if grid[r, col] is not None:
                        content = grid[r, col]
                    else:
                        grid[r, col] = content

        for cell in hier_top:
            r = cell["row_idx"]
            parts = [grid[r, c] for c in cell["col_indices"] if grid[r, c]]
            if parts:
                j = " ".join(parts)
                for c in cell["col_indices"]:
                    grid[r, c] = j
        for cell in mono_top:
            col = cell["col_idx"]
            parts = [grid[r, col] for r in cell["row_indices"] if grid[r, col]]
            if len(parts) > 1:
                for r in cell["row_indices"]:
                    grid[r, col] = None
                grid[cell["row_indices"][-1], col] = " \\n".join(parts)

    top_header = (
        header_indices
        if config.enable_multi_header
        else ([0] if header_indices else [])
    )

    header_rows = grid[header_indices]
    if config.enable_multi_header and len(header_rows) > 1:
        cols_hdr = pd.MultiIndex.from_tuples(
            list(zip(*header_rows)),
            names=[f"Header {len(header_rows) - i}" for i in range(len(header_rows))],
        )
    else:
        cols_hdr = [
            " \\n".join(row[i] for row in header_rows if row[i])
            for i in range(len(columns))
        ]
    df = pd.DataFrame(data=grid, columns=cols_hdr)

    proj = []
    if projecting_indices:
        is_proj = [
            x in projecting_indices
            for x in range(len(rows))
            if x not in header_indices
        ]
        proj = [i for i, x in enumerate(is_proj) if x]

    df.drop(index=header_indices, inplace=True)
    df.reset_index(drop=True, inplace=True)
    csv = df.to_csv(index=False, lineterminator="\n")
    return ("ok", csv, top_header, proj, hier_left_idx, outliers)
