"""End-to-end training-data pipeline composition.

The full story in one DAG: transcript turns carrying HTML payloads →
main-content extraction (boilerplate strip) → per-document scoring
(language-ID, quality features) → near-duplicate removal (content
fingerprint + MinHash-band candidates) → curated corpus written with
per-bucket lineage. Every stage is an operator tested elsewhere; this
module wires them and keeps the whole plan shuffle-minimal:

  extraction        narrow map (no shuffle)
  scoring           narrow (string built-ins, codegen)
  fingerprint dedup one hash shuffle (groupBy fingerprint)
  write + lineage   bucketed sink (plans/lineage.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from gmft_spark.operators.html_content import extract_html_content

EN_STOPWORDS = ["the", "and", "of", "a", "to", "with", "is"]


def score_documents(content: DataFrame) -> DataFrame:
    """Quality/language features over extracted main text (built-ins only)."""
    toks = F.filter(F.split(F.col("main_text"), " "), lambda t: t != "")
    n_toks = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    quality = (
        F.least(n_toks / 50.0, F.lit(1.0)) * 0.6
        + (n_stop / F.greatest(n_toks, F.lit(1))) * 0.4
    )
    return content.select(
        "conv_id",
        "turn_idx",
        "title",
        "main_text",
        "n_tables",
        n_toks.alias("n_tokens"),
        F.round(quality, 6).alias("quality"),
        F.md5(
            F.trim(F.regexp_replace(F.lower("main_text"), "[^a-z0-9]+", " "))
        ).alias("fingerprint"),
    )


def dedup_keep_best(scored: DataFrame) -> DataFrame:
    """Keep one representative per normalized-content fingerprint: the
    highest-quality (ties → lowest key) — a window rank over the
    fingerprint shuffle."""
    win = Window.partitionBy("fingerprint").orderBy(
        F.col("quality").desc(), F.col("conv_id").asc(), F.col("turn_idx").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


def curate(transcripts: DataFrame, min_quality: float = 0.3) -> DataFrame:
    """transcripts(text=html) → curated, deduplicated training documents."""
    content = extract_html_content(transcripts)
    scored = score_documents(content)
    kept = dedup_keep_best(scored).filter(F.col("quality") >= min_quality)
    return kept
