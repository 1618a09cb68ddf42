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


# ---------------------------------------------------------------------------
# DuckDB oracles: the synthetic HTML template below is built entirely from
# md5/modulo of the row id, so the oracle re-derives the *expected*
# extraction output (title, pre-order main text, cell grid, dropped-char
# count) directly from the template structure — an independent derivation
# the kernel's readability-style parser must reproduce.
# ---------------------------------------------------------------------------

# shared CTE: per-turn expected title/main_text/raw_text for the template
# emitted by synthesize_html_transcripts(n_convs=20, turns_per_conv=5)
_HTML_EXPECT_CTE = """
    WITH ids AS (
        SELECT g.id,
               'hconv-' || CAST(g.id % 20 AS VARCHAR) AS conv_id,
               CAST(g.id // 20 AS INT) AS turn_idx,
               md5(CAST(g.id AS VARCHAR)) AS tok,
               CAST(g.id % 97 AS VARCHAR) AS va,
               CAST(g.id % 53 AS VARCHAR) AS vb
        FROM range(0, 100) AS g(id)
    ),
    built AS (
        SELECT conv_id, turn_idx, va, vb,
               'Doc ' || CAST(id AS VARCHAR) AS title,
               'Report ' || CAST(id AS VARCHAR)
                 || ' Main paragraph one with payload ' || tok
                 || ' and more prose to outweigh boilerplate.'
                 || ' Second paragraph ' || substr(tok, 1, 8)
                 || ' continues the main content body.'
                 || ' metric value alpha ' || va || ' beta ' || vb
                 AS main_text,
               'Doc ' || CAST(id AS VARCHAR)
                 || ' Home About Contact SiteName beta Report '
                 || CAST(id AS VARCHAR)
                 || ' Main paragraph one with payload ' || tok
                 || ' and more prose to outweigh boilerplate.'
                 || ' Second paragraph ' || substr(tok, 1, 8)
                 || ' continues the main content body.'
                 || ' metric value alpha ' || va || ' beta ' || vb
                 || ' Trending links x y © SiteName. Cookie notice. Privacy'
                 AS raw_text
        FROM ids
    )
"""

HTML_ORACLE_SQL = _HTML_EXPECT_CTE + """
    SELECT conv_id, turn_idx, title, main_text,
           1 AS n_tables,
           '[{"table":0,"row":0,"col":0,"text":"metric"},'
             || '{"table":0,"row":0,"col":1,"text":"value"},'
             || '{"table":0,"row":1,"col":0,"text":"alpha"},'
             || '{"table":0,"row":1,"col":1,"text":"' || va || '"},'
             || '{"table":0,"row":2,"col":0,"text":"beta"},'
             || '{"table":0,"row":2,"col":1,"text":"' || vb || '"}]'
             AS cells,
           CAST(length(raw_text) - length(main_text) AS INT)
             AS n_dropped_chars
    FROM built
    ORDER BY conv_id, turn_idx
"""

# curation oracle: score_documents + dedup_keep_best + quality filter over
# the same expected main_text (operators/training_pipeline.py semantics —
# stopword ratio, 50-token saturation, fingerprint over normalized text)
CURATION_ORACLE_SQL = _HTML_EXPECT_CTE + """,
    toks AS (
        SELECT conv_id, turn_idx, u.t AS t
        FROM built, LATERAL unnest(string_split(main_text, ' ')) AS u(t)
        WHERE u.t <> ''
    ),
    tstats AS (
        SELECT conv_id, turn_idx,
               CAST(count(*) AS INT) AS n_tokens,
               CAST(sum(CASE WHEN lower(t) IN
                   ('the','and','of','a','to','with','is')
                   THEN 1 ELSE 0 END) AS INT) AS n_stop
        FROM toks GROUP BY conv_id, turn_idx
    ),
    scored AS (
        SELECT b.conv_id, b.turn_idx, b.title, b.main_text,
               1 AS n_tables, s.n_tokens,
               round(least(s.n_tokens / 50.0::DOUBLE, 1.0::DOUBLE)
                       * 0.6::DOUBLE
                     + (s.n_stop / CAST(greatest(s.n_tokens, 1) AS DOUBLE))
                       * 0.4::DOUBLE, 6) AS quality,
               md5(trim(regexp_replace(lower(b.main_text),
                                       '[^a-z0-9]+', ' ', 'g')))
                 AS fingerprint
        FROM built b
        JOIN tstats s ON b.conv_id = s.conv_id AND b.turn_idx = s.turn_idx
    ),
    deduped AS (
        SELECT *, row_number() OVER (PARTITION BY fingerprint
                 ORDER BY quality DESC, conv_id ASC, turn_idx ASC) AS rk
        FROM scored
    )
    SELECT conv_id, turn_idx, title, main_text, n_tables, n_tokens,
           quality, fingerprint
    FROM deduped
    WHERE rk = 1 AND quality >= 0.1::DOUBLE
    ORDER BY conv_id, turn_idx
"""


# oracle for the spanned-table pipeline: the expected EXPANDED grid is a
# pure function of id (header 'metrics {id}' covers both columns via
# colspan=2; 'grp {va}' covers rows 1-2 via rowspan=2), so the oracle
# enumerates the six slots per turn directly
HTML_SPANNED_CELLS_SQL = """
    WITH ids AS (
        SELECT g.id,
               'hconv-' || CAST(g.id % 20 AS VARCHAR) AS conv_id,
               CAST(g.id // 20 AS INT) AS turn_idx,
               CAST(g.id % 97 AS VARCHAR) AS va,
               CAST(g.id % 53 AS VARCHAR) AS vb
        FROM range(0, 100) AS g(id)
    ),
    slots(r_idx, c_idx, kind) AS (
        VALUES (0, 0, 'h'), (0, 1, 'h'), (1, 0, 'g'),
               (1, 1, 'a'), (2, 0, 'g'), (2, 1, 'b')
    )
    SELECT conv_id, turn_idx, 0 AS tbl,
           CAST(r_idx AS INT) AS r_idx, CAST(c_idx AS INT) AS c_idx,
           CASE kind WHEN 'h' THEN 'metrics ' || CAST(id AS VARCHAR)
                     WHEN 'g' THEN 'grp ' || va
                     WHEN 'a' THEN va
                     ELSE vb END AS cell_text
    FROM ids CROSS JOIN slots
    ORDER BY conv_id, turn_idx, r_idx, c_idx
"""


def synthesize_spanned_html_transcripts(
    spark: SparkSession, n_convs: int = 20, turns_per_conv: int = 5
) -> DataFrame:
    """Like ``synthesize_html_transcripts`` but the article's table
    exercises colspan/rowspan: a 2-wide spanning header and a 2-tall
    group cell — the occupancy-expansion path of
    ``kernel.html.table_to_grid``."""
    total = n_convs * turns_per_conv
    base = spark.range(0, total)
    conv = F.concat(F.lit("hconv-"), (F.col("id") % n_convs).cast("string"))
    turn = (F.col("id") / n_convs).cast("int")
    html = F.concat(
        F.lit(
            "<html><head><title>Doc "
        ),
        F.col("id").cast("string"),
        F.lit(
            "</title></head><body>"
            '<nav class="menu"><a href="/">Home</a></nav>'
            "<div><article><h1>Report "
        ),
        F.col("id").cast("string"),
        F.lit(
            "</h1><p>Main prose body with enough words to dominate the "
            "density score over the navigation boilerplate.</p>"
            '<table><tr><th colspan="2">metrics '
        ),
        F.col("id").cast("string"),
        F.lit('</th></tr><tr><td rowspan="2">grp '),
        (F.col("id") % 97).cast("string"),
        F.lit("</td><td>"),
        (F.col("id") % 97).cast("string"),
        F.lit("</td></tr><tr><td>"),
        (F.col("id") % 53).cast("string"),
        F.lit(
            "</td></tr></table></article></div>"
            '<footer class="footer">© SiteName</footer></body></html>'
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
