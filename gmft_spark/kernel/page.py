"""Page-level rich-text assembly.

Re-implements the reference's page composition
(/root/reference/gmft/formatters/page/embed.py:7-85, base.py:10-11,
components.py:4-23): stream the page's words with inferred line breaks;
the first word that hits each table bbox replaces the whole table with its
markdown rendering; paragraphs split around tables; components join with
newlines.

Markdown: the reference calls ``df.to_markdown()`` (tabulate). tabulate is
not installed in this sandbox, so ``grid_to_markdown`` reproduces
tabulate's default ('pipe'-less ``to_markdown``) layout for plain string
tables; when tabulate IS available we defer to pandas for bit-parity.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from gmft_spark.kernel.geometry import EMPTY_BOX  # noqa: F401  (docs)
from gmft_spark.kernel.text import infer_line_breaks

def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def _is_float(s: str) -> bool:
    try:
        v = float(s)
    except ValueError:
        return False
    # tabulate's _isnumber: inf/nan parses count as numeric only for the
    # exact spellings — "Infinity"/"+INF" must stay strings, else a single
    # such cell flips the whole column to float formatting and breaks
    # to_markdown byte-parity
    if math.isinf(v) or math.isnan(v):
        return s.lower() in ("inf", "-inf", "nan")
    return True


def _afterpoint(s: str) -> int:
    """Digits after the decimal point; -1 if no point (tabulate's rule)."""
    if _is_float(s) and "." in s:
        return len(s) - s.rfind(".") - 1
    return -1


def grid_to_markdown(
    columns: Sequence[Optional[str]], grid: Sequence[Sequence[Optional[str]]]
) -> str:
    """Markdown table byte-matching ``DataFrame.to_markdown()`` defaults
    (tabulate's 'pipe' format) for string-valued tables: an index column,
    per-column numeric detection with number re-parsing (``floatfmt='g'``),
    decimal alignment for float columns, right alignment for int columns,
    left for strings — reproduced from the public tabulate behavior
    (validated against the reference's rich-page goldens)."""
    headers = [""] + ["" if c is None else str(c) for c in columns]
    raw_rows = [
        [str(i)] + ["" if v is None else str(v) for v in row]
        for i, row in enumerate(grid)
    ]
    ncols = len(headers)

    # column type: int if every cell parses as int, float if every cell
    # parses as a number, else string
    col_types = []
    for c in range(ncols):
        vals = [r[c] for r in raw_rows]
        if vals and all(_is_int(v) for v in vals):
            col_types.append(int)
        elif vals and all(_is_float(v) for v in vals):
            col_types.append(float)
        else:
            col_types.append(str)

    # format cells (numbers re-parsed; floats through '%g')
    cols: List[List[str]] = []
    for c in range(ncols):
        vals = [r[c] for r in raw_rows]
        if col_types[c] is int:
            vals = [str(int(v)) for v in vals]
        elif col_types[c] is float:
            vals = [format(float(v), "g") for v in vals]
        cols.append(vals)

    # decimal alignment pads float cells so the points line up
    for c in range(ncols):
        if col_types[c] is float:
            decs = [_afterpoint(v) for v in cols[c]]
            maxdec = max(decs) if decs else -1
            if maxdec >= 0:
                cols[c] = [
                    v + " " * ((maxdec - d) if d >= 0 else (maxdec + 1))
                    for v, d in zip(cols[c], decs)
                ]

    widths = []
    aligns = []
    for c in range(ncols):
        # tabulate's MIN_PADDING (2) applies to header widths only
        w = len(headers[c]) + 2
        for v in cols[c]:
            if len(v) > w:
                w = len(v)
        widths.append(w)
        aligns.append("right" if col_types[c] in (int, float) else "left")

    def cell(v: str, c: int) -> str:
        if aligns[c] == "right":
            return " " + v.rjust(widths[c]) + " "
        return " " + v.ljust(widths[c]) + " "

    def seg(c: int) -> str:
        if aligns[c] == "right":
            return "-" * (widths[c] + 1) + ":"
        return ":" + "-" * (widths[c] + 1)

    lines = ["|" + "|".join(cell(headers[c], c) for c in range(ncols)) + "|"]
    lines.append("|" + "|".join(seg(c) for c in range(ncols)) + "|")
    for r in range(len(raw_rows)):
        lines.append(
            "|" + "|".join(cell(cols[c][r], c) for c in range(ncols)) + "|"
        )
    return "\n".join(lines)


def embed_tables_into_page_text(
    word_boxes: np.ndarray,
    texts: List[str],
    table_bboxes: List[tuple],
    table_markdowns: List[str],
) -> str:
    """Page text with each table's markdown inlined at the position of its
    first word (embed.py:7-58): words inside any table bbox are consumed
    (the first one flushes the running paragraph and emits the table);
    everything else accumulates with inferred line breaks; components join
    with a newline; the leading paragraph is left-stripped."""
    word_boxes = np.asarray(word_boxes, dtype=np.float64).reshape(-1, 4)
    if not table_bboxes:
        from gmft_spark.kernel.text import text_with_breaks

        return text_with_breaks(word_boxes, texts)

    _, word_no = infer_line_breaks(word_boxes)
    components: List[str] = []
    builder = ""
    done = [False] * len(table_bboxes)
    for i, text in enumerate(texts):
        x0, y0, x1, y1 = word_boxes[i]
        hit = -1
        for j, (bx0, by0, bx1, by1) in enumerate(table_bboxes):
            if max(x0, bx0) < min(x1, bx1) and max(y0, by0) < min(y1, by1):
                hit = j
                break
        if hit >= 0:
            if not done[hit]:
                components.append(builder)
                builder = ""
                components.append(table_markdowns[hit])
                done[hit] = True
            continue
        builder += "\n" if word_no[i] == 0 else " "
        builder += text
    if builder:
        components.append(builder)
    if components:
        components[0] = components[0].lstrip()
    return "\n".join(components)
