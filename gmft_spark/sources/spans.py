"""S4: pdftext-style span source → words schema.

The reference's alternative PDF binding (gmft/pdf_bindings/pdftext.py:75-107)
consumes a block/line/span dictionary hierarchy and flattens it into the
same ``(x0, y0, x1, y1, text)`` word stream the pdfium binding produces:
spans are emitted in block→line→span order, each span's text has newlines
removed and surrounding whitespace stripped, and coordinates pass through
unchanged (PIL top-left convention). Everything downstream (detection,
structure, captions) is source-agnostic over that words schema.

Two forms here:
  * ``spans_to_words`` — plain-Python kernel twin for single-page use and
    differential tests;
  * ``words_from_span_rows`` — the Spark operator over a span-row table
    ``(conv_id, turn_idx, block, line, span, x0, y0, x1, y1, text)``,
    pure built-ins (no UDF), preserving hierarchy order via a window
    rank so downstream per-turn extraction sees the identical word order.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame, Window, functions as F


def _clean(text: str) -> str:
    """pdftext.py:99 — span text with newlines removed, then stripped."""
    return (text or "").replace("\n", "").strip()


def clean_text_col(col):
    """Column form of ``_clean`` — THE span-text cleaning contract, shared
    by every span-shaped source (spans rows, pdftext payloads). Python
    str.strip() removes ALL whitespace, not just spaces — mirrored with an
    anchored regex, not F.trim."""
    return F.regexp_replace(
        F.regexp_replace(col, "\n", ""), r"^\s+|\s+$", ""
    )


def spans_to_words(dict_page: dict) -> List[Tuple[float, float, float, float, str]]:
    """Flatten one page's ``{"blocks": [{"lines": [{"spans": [...]}]}]}``
    hierarchy into (x0, y0, x1, y1, text) tuples in block→line→span order
    (the reference's generator order, pdftext.py:92-106)."""
    out = []
    for block in dict_page.get("blocks", []):
        for line in block.get("lines", []):
            for span in line.get("spans", []):
                x0, y0, x1, y1 = span["bbox"]
                out.append((x0, y0, x1, y1, _clean(span["text"])))
    return out


def words_from_span_rows(spans: DataFrame) -> DataFrame:
    """Span rows → per-turn word stream with a ``word_id`` that encodes
    the block→line→span order (so downstream ordering-sensitive kernels —
    line-break inference, assemble_text — see the reference's word order).

    Narrow except one per-turn window rank; at scale the input is already
    bucketed on conv_id, so the rank's sort is partition-local."""
    win = Window.partitionBy("conv_id", "turn_idx").orderBy(
        "block", "line", "span"
    )
    return spans.select(
        "conv_id",
        "turn_idx",
        "block",
        "line",
        "span",
        "x0",
        "y0",
        "x1",
        "y1",
        clean_text_col(F.col("text")).alias("text"),
    ).withColumn("word_id", F.row_number().over(win) - 1)
