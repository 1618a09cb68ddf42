"""HTML main-content extraction over transcript text payloads.

Unlike the PDF-scene pipeline (which expands payloads from keys), this
operator consumes the transcript ``text`` column directly as an HTML
payload — the boilerplate-strip path of the north rule. Narrow map, Arrow
batches, no shuffle; the heavy string work happens in
gmft_spark.kernel.html.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from gmft_spark.kernel.html import extract_main_content

HTML_RESULT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("title", StringType()),
        StructField("main_text", StringType()),
        StructField("n_tables", IntegerType()),
        StructField(
            "cells",
            ArrayType(
                StructType(
                    [
                        StructField("table", IntegerType()),
                        StructField("row", IntegerType()),
                        StructField("col", IntegerType()),
                        StructField("text", StringType()),
                    ]
                )
            ),
        ),
        StructField("n_dropped_chars", IntegerType()),
    ]
)


def extract_html_content(transcripts: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, text) → boilerplate-stripped main content."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for conv_id, turn_idx, text in zip(
                batch["conv_id"], batch["turn_idx"], batch["text"]
            ):
                c = extract_main_content(text or "")
                cells = [
                    {"table": t, "row": r, "col": k, "text": v}
                    for t, grid in enumerate(c.tables)
                    for r, row in enumerate(grid)
                    for k, v in enumerate(row)
                    if v is not None
                ]
                rows.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": int(turn_idx),
                        "title": c.title,
                        "main_text": c.main_text,
                        "n_tables": len(c.tables),
                        "cells": cells,
                        "n_dropped_chars": c.n_dropped_chars,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        run, schema=HTML_RESULT_SCHEMA
    )


def synthesize_html_transcripts(
    spark: SparkSession, n_convs: int = 20, turns_per_conv: int = 5
) -> DataFrame:
    """Transcripts whose ``text`` is a deterministic HTML page: nav/header/
    footer boilerplate around a main article with paragraphs and a 2-col
    data table (generated distributively with built-in functions)."""
    total = n_convs * turns_per_conv
    base = spark.range(0, total)
    conv = F.concat(F.lit("hconv-"), (F.col("id") % n_convs).cast("string"))
    turn = (F.col("id") / n_convs).cast("int")
    tok = F.md5(F.col("id").cast("string"))
    html = F.concat(
        F.lit(
            "<html><head><title>Doc "
        ),
        F.col("id").cast("string"),
        F.lit(
            "</title><style>body{margin:0}</style>"
            "<script>var tracker=1;</script></head><body>"
            '<nav class="menu"><a href="/">Home</a><a href="/a">About</a>'
            "<a href='/c'>Contact</a></nav>"
            '<header id="site-header">SiteName beta</header>'
            '<div class="content"><article><h1>Report '
        ),
        F.col("id").cast("string"),
        F.lit("</h1><p>Main paragraph one with payload "),
        tok,
        F.lit(" and more prose to outweigh boilerplate.</p><p>Second paragraph "),
        F.substring(tok, 1, 8),
        F.lit(
            " continues the main content body.</p>"
            "<table><tr><th>metric</th><th>value</th></tr>"
            "<tr><td>alpha</td><td>"
        ),
        (F.col("id") % 97).cast("string"),
        F.lit("</td></tr><tr><td>beta</td><td>"),
        (F.col("id") % 53).cast("string"),
        F.lit(
            "</td></tr></table></article></div>"
            '<aside class="sidebar">Trending links <a href="/x">x</a>'
            '<a href="/y">y</a></aside>'
            '<footer class="footer">© SiteName. Cookie notice. '
            '<a href="/privacy">Privacy</a></footer></body></html>'
        ),
    )
    return base.select(
        conv.alias("conv_id"),
        turn.alias("turn_idx"),
        F.lit("user").alias("role"),
        html.alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (
            F.lit("2026-01-01 00:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("id"))
        ).alias("ts"),
    )
