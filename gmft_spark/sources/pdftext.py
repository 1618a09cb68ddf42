"""pdftext payload source: parse actual ``pdftext.extraction.
dictionary_output`` JSON into the words schema.

The reference's pdftext binding (gmft/pdf_bindings/pdftext.py:75-107)
calls ``dictionary_output(pdf_bytes)`` and walks the returned
page→blocks→lines→spans hierarchy, emitting each span as a word with its
newlines removed and whitespace stripped. ``sources/spans.py`` already
adapts the flattened hierarchy; THIS module parses the payload itself —
the JSON document pdftext emits — so a corpus whose turns carry pdftext
output (a common crawl-extraction interchange format) plugs straight in.

Spark-first: the payload parses with ``F.from_json`` against the typed
hierarchy schema and flattens with three ``posexplode``s — pure JVM-side
built-ins, no Python in the hot path, fully prunable (a consumer reading
only bbox never materializes font metadata)."""

from __future__ import annotations

import json
from typing import List, Tuple

from pyspark.sql import DataFrame, functions as F, types as T

from gmft_spark.sources.spans import clean_text_col, spans_to_words

# the dictionary_output page schema, restricted to the fields the
# reference binding consumes (span bbox + text; extra keys like font,
# chars, rotation are ignored by from_json's permissive parse)
PDFTEXT_SPAN = T.StructType(
    [
        T.StructField("bbox", T.ArrayType(T.DoubleType())),
        T.StructField("text", T.StringType()),
    ]
)
PDFTEXT_PAGE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("page", T.IntegerType()),
            T.StructField("bbox", T.ArrayType(T.DoubleType())),
            T.StructField(
                "blocks",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField(
                                "lines",
                                T.ArrayType(
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "spans", T.ArrayType(PDFTEXT_SPAN)
                                            )
                                        ]
                                    )
                                ),
                            )
                        ]
                    )
                ),
            ),
        ]
    )
)


def parse_pdftext_payload(
    payload: bytes | str,
) -> List[List[Tuple[float, float, float, float, str]]]:
    """Kernel twin: one dictionary_output JSON document (a list of page
    dicts) → per-page word tuples in block→line→span order, the exact
    walk of the reference binding."""
    if isinstance(payload, (bytes, bytearray)):
        payload = payload.decode("utf-8")
    pages = json.loads(payload)
    return [spans_to_words(p) for p in pages]


def words_from_pdftext_payloads(
    transcripts: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """Transcript turns carrying a pdftext JSON payload → per-turn word
    stream ``(conv_id, turn_idx, page, block, line, span, x0..y1, text,
    word_id)``. ``word_id`` encodes the binding's block→line→span
    generator order per (turn, page). Malformed JSON yields zero rows
    for that turn (from_json → NULL → explode drops it) — per-row error
    containment, never a task failure."""
    parsed = transcripts.select(
        "conv_id",
        "turn_idx",
        F.from_json(F.col(payload_col).cast("string"), PDFTEXT_PAGE_SCHEMA).alias(
            "pages"
        ),
    )
    exploded = (
        parsed.select("conv_id", "turn_idx", F.explode("pages").alias("pg"))
        .select(
            "conv_id",
            "turn_idx",
            F.col("pg.page").alias("page"),
            F.posexplode("pg.blocks").alias("block", "blk"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "page",
            "block",
            F.posexplode("blk.lines").alias("line", "ln"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "page",
            "block",
            "line",
            F.posexplode("ln.spans").alias("span", "sp"),
        )
        .select(
            "conv_id",
            "turn_idx",
            "page",
            "block",
            "line",
            "span",
            F.element_at("sp.bbox", 1).alias("x0"),
            F.element_at("sp.bbox", 2).alias("y0"),
            F.element_at("sp.bbox", 3).alias("x1"),
            F.element_at("sp.bbox", 4).alias("y1"),
            F.col("sp.text").alias("text"),
        )
    )
    # same cleaning contract as sources/spans.py (_clean: newline removal
    # then full-whitespace strip), ranked per (turn, page) in the
    # binding's block→line→span generator order
    from pyspark.sql import Window

    win = Window.partitionBy("conv_id", "turn_idx", "page").orderBy(
        "block", "line", "span"
    )
    return exploded.select(
        "conv_id",
        "turn_idx",
        "page",
        "block",
        "line",
        "span",
        "x0",
        "y0",
        "x1",
        "y1",
        clean_text_col(F.col("text")).alias("text"),
    ).withColumn("word_id", F.row_number().over(win) - 1)


def synthesize_pdftext_payload(
    words_by_page: List[List[Tuple[float, float, float, float, str]]],
    lines_per_block: int = 2,
    spans_per_line: int = 3,
) -> str:
    """Deterministic dictionary_output-shaped JSON from word tuples
    (test/bench fixture — the container has no pdftext). Words chunk into
    spans_per_line-sized lines and lines_per_block-sized blocks, so the
    hierarchy walk must reassemble the original order exactly."""
    pages = []
    for pno, words in enumerate(words_by_page):
        spans = [
            {"bbox": [x0, y0, x1, y1], "text": t, "font": {"name": "F0", "size": 10}}
            for (x0, y0, x1, y1, t) in words
        ]
        lines = [
            {"spans": spans[i : i + spans_per_line]}
            for i in range(0, len(spans), spans_per_line)
        ]
        blocks = [
            {"lines": lines[i : i + lines_per_block]}
            for i in range(0, len(lines), lines_per_block)
        ]
        pages.append({"page": pno, "bbox": [0.0, 0.0, 612.0, 792.0], "blocks": blocks})
    return json.dumps(pages)
