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

from typing import List, Optional, Sequence

import numpy as np

from gmft_spark.kernel.geometry import EMPTY_BOX  # noqa: F401  (docs)
from gmft_spark.kernel.text import infer_line_breaks

try:  # pragma: no cover - environment dependent
    import tabulate  # noqa: F401

    _HAVE_TABULATE = True
except Exception:  # pragma: no cover
    _HAVE_TABULATE = False


def grid_to_markdown(
    columns: Sequence[Optional[str]], grid: Sequence[Sequence[Optional[str]]]
) -> str:
    """Markdown table matching pandas ``DataFrame.to_markdown()`` defaults
    (index column, ``|``-piped, ``:--``-style left alignment padding)."""
    if _HAVE_TABULATE:
        import pandas as pd

        return pd.DataFrame(list(grid), columns=list(columns)).to_markdown()

    headers = [""] + ["" if c is None else str(c) for c in columns]
    rows = [
        [str(i)] + ["" if v is None else str(v) for v in row]
        for i, row in enumerate(grid)
    ]
    widths = [
        max(len(headers[c]), *(len(r[c]) for r in rows)) if rows else len(headers[c])
        for c in range(len(headers))
    ]
    widths = [max(w, 2) for w in widths]

    def fmt_row(cells, pad=" "):
        return "|" + "|".join(
            f"{pad}{c:<{w}}{pad}" for c, w in zip(cells, widths)
        ) + "|"

    lines = [fmt_row(headers)]
    lines.append(
        "|" + "|".join(":" + "-" * w + "-" for w in widths) + "|"
    )
    for r in rows:
        lines.append(fmt_row(r))
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
