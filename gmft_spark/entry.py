"""Registry backing ``__spark_entry__.py`` (the driver contract).

Aggregates every implemented operator's (R)-form query + DuckDB oracle,
plus the custom pipeline operators that have no SQL equivalent (the driver
records a rows-only check for those — structure extraction is gmft's
heuristic algorithm, not relational algebra).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from gmft_spark.operators import analytics, dedup, relational, similarity, textstats
from gmft_spark.operators.extract import (
    assemble_pages,
    extract_tables,
    extract_tables_ditr,
    extract_tables_histogram,
)
from gmft_spark.plans.skew import assemble_conversation_text
from gmft_spark.sources.transcripts import transcripts_from_documents

_ORACLE_MODULES = (relational, dedup, similarity, textstats, analytics)


def _pipeline_tatr(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    return extract_tables(t).orderBy("conv_id", "turn_idx", "table_id")


def _pipeline_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    return extract_tables_histogram(t).orderBy("conv_id", "turn_idx", "table_id")


def _pipeline_conversation_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    return assemble_conversation_text(extract_tables(t)).orderBy("conv_id")


def _pipeline_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = transcripts_from_documents(spark, sf_dir)
    return assemble_pages(t).orderBy("conv_id", "turn_idx")


def _pipeline_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmft_spark.operators.detect import detect_tables

    t = transcripts_from_documents(spark, sf_dir)
    return detect_tables(t).orderBy("conv_id", "turn_idx", "det_id")


def _pipeline_spanning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmft_spark.config import ExtractConfig

    cfg = ExtractConfig(
        semantic_spanning_cells=True, enable_multi_header=True
    )
    t = transcripts_from_documents(spark, sf_dir)
    return extract_tables(t, cfg).orderBy("conv_id", "turn_idx", "table_id")


def _pipeline_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmft_spark.operators.multimodal import extract_features, synthesize_media

    return extract_features(synthesize_media(spark, 256)).orderBy("media_id")


def _pipeline_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmft_spark.operators.html_content import (
        extract_html_content,
        synthesize_html_transcripts,
    )

    t = synthesize_html_transcripts(spark, n_convs=20, turns_per_conv=5)
    return extract_html_content(t).orderBy("conv_id", "turn_idx")


def _pipeline_pdf_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real byte-stream path: per-turn PDF payloads decoded with the
    from-scratch parser inside mapInPandas (north-rule payload shape)."""
    from gmft_spark.operators.pdf_extract import extract_tables_from_pdfs

    t = transcripts_from_documents(spark, sf_dir)
    return extract_tables_from_pdfs(t).orderBy(
        "conv_id", "turn_idx", "table_id"
    )


def _pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gmft_spark.operators.html_content import synthesize_html_transcripts
    from gmft_spark.operators.training_pipeline import curate

    t = synthesize_html_transcripts(spark, n_convs=20, turns_per_conv=5)
    return curate(t, min_quality=0.1).orderBy("conv_id", "turn_idx")


def _scalarize(df: DataFrame) -> DataFrame:
    """Driver-gate contract: every registered output column must be scalar.

    The driver's canonicalizer sorts the collected pandas frame and hashes
    its values; array/map/struct cells are unhashable there (round-1 gate
    errors). Complex columns are serialized to deterministic JSON strings —
    the underlying values still participate in the hash, nothing is
    dropped."""
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def _driver_form(fn):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _scalarize(fn(spark, sf_dir))

    return wrapped


# custom (non-SQL-expressible) pipeline operators → rows-only driver check
PIPELINE_QUERIES = {
    "tatr_extract_pipeline": _pipeline_tatr,
    "tatr_extract_spanning_multiheader": _pipeline_spanning,
    "histogram_extract_pipeline": _pipeline_histogram,
    "ditr_extract_pipeline": lambda spark, sf_dir: extract_tables_ditr(
        transcripts_from_documents(spark, sf_dir)
    ).orderBy("conv_id", "turn_idx", "table_id"),
    "detect_pipeline": _pipeline_detect,
    "pdf_payload_extract_pipeline": _pipeline_pdf_payload,
    "conversation_text_assembly": _pipeline_conversation_text,
    "page_assembly_pipeline": _pipeline_pages,
    "media_feature_pipeline": _pipeline_media_features,
    "html_main_content_pipeline": _pipeline_html,
    "training_data_curation": _pipeline_curation,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-turn deep-table extraction over transcripts derived
    from the sf0.001 documents table."""
    return _pipeline_tatr(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _ORACLE_MODULES:
        for name, (fn, _sql) in mod.QUERIES.items():
            out[name] = fn
    for name, fn in PIPELINE_QUERIES.items():
        out[name] = _driver_form(fn)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _ORACLE_MODULES:
        for name, (_fn, sql) in mod.QUERIES.items():
            out[name] = sql
    return out
