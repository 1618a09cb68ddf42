"""Multimodal column operators: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed
metadata struct — the pattern a 100 TB multimodal training-data pipeline
needs. The Spark-side plumbing (schema, Arrow batch shape, partitioning,
UDF signatures) is real and tested. The codec step: ``decode_mode='real'``
genuinely decodes PNG images through the from-scratch codec in
kernel/raster.py (16-bin intensity-histogram features); JPEG and
audio/video decoding need libraries this container lacks, so those raise
``NotImplementedError`` at the exact seam where PIL/ffmpeg plug in.
``decode_mode='fake'`` keeps the library-free deterministic stand-in for
every modality.

Scale notes: payload bytes never leave their scan partition (narrow
mapInPandas); metadata-only queries never touch the binary column thanks
to parquet column pruning — SELECT over ``meta.*`` reads zero payload
bytes.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("n_bytes", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("sha256", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_frames_sampled", IntegerType()),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark: SparkSession, n: int = 256) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from media_id
    (generated distributively — no driver-side byte buffers)."""
    base = spark.range(n)
    modality = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    # payload = repeated md5 hex of the id — deterministic, compressible
    payload = F.encode(
        F.repeat(F.md5(F.col("id").cast("string")), 8), "utf-8"
    )
    return base.select(
        F.col("id").alias("media_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.when(modality == "image", "image/png")
            .when(modality == "audio", "audio/wav")
            .otherwise("video/mp4")
            .alias("mime"),
            ((F.col("id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("id") % 9 + 1) * 64).cast("int").alias("height"),
            ((F.col("id") % 30 + 1) * 1000).cast("int").alias("duration_ms"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def synthesize_png_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Image media with REAL PNG payloads (the from-scratch codec in
    kernel/raster.py): a deterministic per-id gradient pattern, generated
    distributively inside mapInPandas — no driver-side byte buffers."""
    from gmft_spark.kernel.raster import encode_png

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                h, w = 32 + mid % 16, 48
                arr = (
                    (
                        np.arange(h)[:, None] * 3
                        + np.arange(w)[None, :] * 7
                        + mid * 13
                    )
                    % 256
                ).astype(np.uint8)
                payload = encode_png(arr)
                rows.append(
                    {
                        "media_id": mid,
                        "modality": "image",
                        "payload": payload,
                        "meta": {
                            "mime": "image/png",
                            "width": w,
                            "height": h,
                            "duration_ms": 0,
                            "n_bytes": len(payload),
                        },
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(run, schema=MEDIA_SCHEMA)


def _real_decode(payload: bytes, modality: str) -> np.ndarray:
    """Real decode path. Images: the from-scratch PNG codec
    (kernel/raster.py) → 16-bin normalized intensity histogram. Other
    image formats and audio/video stay behind the documented seam — JPEG
    and media-container decoding need libraries this container lacks."""
    from gmft_spark.kernel.raster import decode_png

    if modality == "image":
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise NotImplementedError(
                "non-PNG image decode needs PIL on executors; "
                "install and implement here"
            )
        px = decode_png(payload)
        hist = np.bincount(
            (px.reshape(-1).astype(np.int32) >> 4), minlength=FEATURE_DIM
        )[:FEATURE_DIM]
        return (hist / max(1, px.size)).astype(np.float32)
    raise NotImplementedError(
        f"real {modality} decode needs ffmpeg on executors; "
        "install and implement here"
    )


def _fake_decode(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic stand-in for the real decoder: a FEATURE_DIM float32
    vector derived from a rolling crc over the bytes."""
    out = np.empty(FEATURE_DIM, dtype=np.float32)
    h = 0
    for j in range(FEATURE_DIM):
        h = zlib.crc32(payload[j::FEATURE_DIM] or b"\0", h)
        out[j] = (h % 10_000) / 10_000.0
    if modality == "audio":
        out = out[::-1].copy()
    return out


def extract_features(
    media: DataFrame,
    decode_mode: str = "fake",
    frame_stride: int = 4,
) -> DataFrame:
    """Decode → feature-extract over Arrow batches (one batch = many media
    rows). ``decode_mode='real'`` is the integration seam for PIL/ffmpeg:
    it raises until those libraries are available on the executors."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, modality, payload in zip(
                batch["media_id"], batch["modality"], batch["payload"]
            ):
                raw = bytes(payload)
                if decode_mode == "real":
                    try:
                        feat = _real_decode(raw, modality)
                    except ValueError:
                        # corrupt payload: contained as an error row
                        # (null feature, 0 frames) — never a task
                        # failure. NotImplementedError (the missing-
                        # library seam) still propagates: that is a
                        # deployment gap, not bad data.
                        rows.append(
                            {
                                "media_id": int(media_id),
                                "modality": modality,
                                "sha256": hashlib.sha256(raw).hexdigest(),
                                "feature": None,
                                "n_frames_sampled": 0,
                            }
                        )
                        continue
                else:
                    feat = _fake_decode(raw, modality)
                n_frames = (
                    max(1, len(raw) // (frame_stride * 64))
                    if modality == "video"
                    else 1
                )
                rows.append(
                    {
                        "media_id": int(media_id),
                        "modality": modality,
                        "sha256": hashlib.sha256(raw).hexdigest(),
                        "feature": feat.tolist(),
                        "n_frames_sampled": n_frames,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# DuckDB oracle for the media feature pipeline: the synthetic payload is
# repeat(md5(id), 8), so identity/content columns are re-derivable in SQL
# (sha256 over the same UTF-8 bytes; every payload is 256 bytes so video
# frame sampling is the constant 1). The crc32-based feature vector has no
# DuckDB twin — it stays covered by tests/test_multimodal.py.
MEDIA_FEATURES_ORACLE_SQL = """
    WITH m AS (
        SELECT g.id AS media_id,
               CASE WHEN g.id % 3 = 0 THEN 'image'
                    WHEN g.id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               repeat(md5(CAST(g.id AS VARCHAR)), 8) AS payload
        FROM range(0, 256) AS g(id)
    )
    SELECT media_id, modality, sha256(payload) AS sha256,
           1 AS n_frames_sampled
    FROM m
    ORDER BY media_id
"""


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only rollup — must not read payload bytes (column
    pruning): per-modality byte/size accounting."""
    return (
        media.select("modality", "meta.n_bytes", "meta.width", "meta.height")
        .groupBy("modality")
        .agg(
            F.count("*").alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("width").alias("max_width"),
            F.max("height").alias("max_height"),
        )
        .orderBy("modality")
    )


def dedup_media_exact(media: DataFrame) -> DataFrame:
    """Exact payload dedup by content hash (hash computed JVM-side)."""
    return (
        media.select(
            "media_id", F.sha2(F.col("payload"), 256).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("keeper"))
        .orderBy("content_hash")
    )
