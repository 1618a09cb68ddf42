"""Multimodal column operators: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed
metadata struct — the pattern a 100 TB multimodal training-data pipeline
needs. The Spark-side plumbing (schema, Arrow batch shape, partitioning,
UDF signatures) is real and tested. The codec step: ``decode_mode='real'``
genuinely decodes ALL THREE modalities through from-scratch codecs —
PNG (kernel/raster.py) and baseline JPEG (kernel/jpeg.py) images,
TIFF 6.0 (kernel/tiff.py — LZW/PackBits/CCITT strips), RIFF/WAVE PCM
audio (kernel/wav.py), MJPEG video in BOTH containers — AVI
(kernel/avi.py) and ISO-BMFF MP4 (kernel/mp4.py), stride frame sampling
before pixel decode — each to a 16-bin normalized histogram feature.
Only foreign CODECS (WebP, MP3/OGG, avc1/hevc inside MP4/MKV) still
raise ``NotImplementedError`` at the exact seam where PIL/ffmpeg plug
in.
``decode_mode='fake'`` keeps the library-free deterministic stand-in
for every modality.

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


def synthesize_real_media(spark: SparkSession, n: int = 48) -> DataFrame:
    """Media table whose payloads are REAL decodable files across all
    three modalities, generated distributively from media_id alone:
    images rotate PNG (kernel/raster.py), baseline JPEG
    (kernel/jpeg.py), LZW TIFF (kernel/tiff.py), GIF (kernel/gif.py),
    gray BMP (kernel/bmp.py) and lossless WebP (kernel/webp.py); audio
    rotates PCM WAVE (kernel/wav.py) and FLAC (kernel/flac.py) sine
    bursts; video rotates
    MJPEG-in-AVI (kernel/avi.py),
    MJPEG-in-MP4 (kernel/mp4.py) and animated-GIF gradient frames. The
    real decode path (extract_features(decode_mode='real')) runs
    end-to-end on this table with zero external libraries."""
    from gmft_spark.kernel.avi import encode_avi
    from gmft_spark.kernel.bmp import encode_bmp
    from gmft_spark.kernel.gif import encode_gif
    from gmft_spark.kernel.jpeg import encode_jpeg
    from gmft_spark.kernel.mp4 import encode_mp4
    from gmft_spark.kernel.raster import encode_png
    from gmft_spark.kernel.tiff import encode_tiff
    from gmft_spark.kernel.wav import encode_wav
    from gmft_spark.kernel.webp import encode_webp_lossless

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                kind = mid % 3
                if kind == 0:  # PNG/JPEG/TIFF/GIF/BMP/WebP rotation
                    h, w = 24 + mid % 16, 40
                    arr = (
                        (
                            np.arange(h)[:, None] * 5
                            + np.arange(w)[None, :] * 3
                            + mid * 11
                        )
                        % 256
                    ).astype(np.uint8)
                    sub = (mid // 3) % 6
                    if sub == 0:
                        payload = encode_png(arr)
                        mime = "image/png"
                    elif sub == 1:
                        payload = encode_jpeg(arr, quality=90)
                        mime = "image/jpeg"
                    elif sub == 2:
                        payload = encode_tiff(arr, "lzw", predictor=True)
                        mime = "image/tiff"
                    elif sub == 3:
                        payload = encode_gif([arr])
                        mime = "image/gif"
                    elif sub == 4:
                        payload = encode_bmp(arr, bits=8)
                        mime = "image/bmp"
                    else:
                        payload = encode_webp_lossless(
                            np.stack([arr, arr, arr], axis=2),
                            subtract_green=True,
                        )
                        mime = "image/webp"
                    meta = (mime, w, h, 0)
                elif kind == 1:  # audio: WAV / FLAC rotation
                    rate = 8000
                    n_samp = 1000 + (mid % 7) * 500
                    t = np.arange(n_samp, dtype=np.float64)
                    freq = 200.0 + (mid % 13) * 60.0
                    samples = (
                        6000.0 * np.sin(2.0 * np.pi * freq * t / rate)
                    ).astype(np.int16)
                    if (mid // 3) % 2 == 0:
                        payload = encode_wav(samples, rate)
                        mime = "audio/wav"
                    else:
                        from gmft_spark.kernel.flac import encode_flac

                        payload = encode_flac(samples, rate)
                        mime = "audio/flac"
                    meta = (
                        mime,
                        0,
                        0,
                        int(round(1000.0 * n_samp / rate)),
                    )
                else:  # video: MJPEG in AVI / MP4 containers in rotation
                    h, w = 24, 32
                    n_frames = 4 + mid % 5
                    frames = [
                        (
                            (
                                np.arange(h)[:, None] * 7
                                + np.arange(w)[None, :] * 2
                                + mid * 13
                                + k * 29
                            )
                            % 256
                        ).astype(np.uint8)
                        for k in range(n_frames)
                    ]
                    vsub = (mid // 3) % 3
                    if vsub == 0:
                        payload = encode_avi(frames, fps=8, quality=88)
                        mime = "video/avi"
                    elif vsub == 1:
                        payload = encode_mp4(frames, fps=8, quality=88)
                        mime = "video/mp4"
                    else:  # animated GIF rides the video modality
                        payload = encode_gif(frames, delay_cs=12)
                        mime = "image/gif"
                    meta = (
                        mime,
                        w,
                        h,
                        int(round(1000.0 * n_frames / 8.0)),
                    )
                mime, w_, h_, dur = meta
                rows.append(
                    {
                        "media_id": mid,
                        "modality": ("image", "audio", "video")[kind],
                        "payload": payload,
                        "meta": {
                            "mime": mime,
                            "width": w_,
                            "height": h_,
                            "duration_ms": dur,
                            "n_bytes": len(payload),
                        },
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(run, schema=MEDIA_SCHEMA)


def _gray_hist(px: np.ndarray) -> np.ndarray:
    """16-bin normalized intensity histogram of a uint8 image (RGB is
    collapsed to REC-601 luma first)."""
    if px.ndim == 3:
        px = (
            0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
        ).astype(np.uint8)
    hist = np.bincount(
        (px.reshape(-1).astype(np.int32) >> 4), minlength=FEATURE_DIM
    )[:FEATURE_DIM]
    return (hist / max(1, px.size)).astype(np.float32)


def _real_decode(
    payload: bytes, modality: str, frame_stride: int = 4
) -> tuple[np.ndarray, int]:
    """Real decode path → (feature, n_frames_sampled). All three
    modalities decode natively through the from-scratch codecs:
    PNG (kernel/raster.py), baseline JPEG (kernel/jpeg.py) and TIFF 6.0
    (kernel/tiff.py) images, RIFF/WAVE PCM (kernel/wav.py) and FLAC
    (kernel/flac.py) audio, and
    MJPEG video in AVI (kernel/avi.py) or ISO-BMFF MP4 (kernel/mp4.py)
    containers (frames sampled every ``frame_stride`` BEFORE pixel
    decode). Only genuinely foreign codecs (WebP, MP3/OGG, avc1/hevc)
    remain the documented PIL/ffmpeg seam."""
    from gmft_spark.kernel.avi import decode_avi_frames
    from gmft_spark.kernel.jpeg import decode_jpeg
    from gmft_spark.kernel.raster import decode_png
    from gmft_spark.kernel.wav import decode_wav

    if modality == "image":
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _gray_hist(decode_png(payload)), 1
        if payload[:2] == b"\xff\xd8":
            return _gray_hist(decode_jpeg(payload)), 1
        if payload[:4] in (b"II*\x00", b"MM\x00*"):
            from gmft_spark.kernel.tiff import decode_tiff

            return _gray_hist(decode_tiff(payload)), 1
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from gmft_spark.kernel.gif import decode_gif_frames

            return _gray_hist(decode_gif_frames(payload)[0]), 1
        if payload[:2] == b"BM":
            from gmft_spark.kernel.bmp import decode_bmp

            return _gray_hist(decode_bmp(payload)), 1
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from gmft_spark.kernel.webp import decode_webp

            return _gray_hist(decode_webp(payload)[:, :, :3]), 1
        raise NotImplementedError(
            "non-PNG/JPEG/TIFF/GIF/BMP/WebP-lossless image decode "
            "needs PIL on executors; install and implement here"
        )
    if modality == "audio":
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            samples, _rate = decode_wav(payload)
        elif payload[:4] == b"fLaC":
            from gmft_spark.kernel.flac import decode_flac

            raw, _rate, bps = decode_flac(payload)
            # normalize to the int16 display range (shift like the TIFF
            # high-byte convention)
            if bps > 16:
                samples = (raw >> (bps - 16)).astype(np.int16)
            elif bps < 16:
                samples = (raw << (16 - bps)).astype(np.int16)
            else:
                samples = raw.astype(np.int16)
        else:
            raise NotImplementedError(
                "non-WAVE/FLAC audio decode needs ffmpeg on executors; "
                "install and implement here"
            )
        # 16-bin amplitude histogram over the full int16 range
        bins = (samples.reshape(-1).astype(np.int32) + 32768) >> 12
        hist = np.bincount(bins, minlength=FEATURE_DIM)[:FEATURE_DIM]
        return (hist / max(1, samples.size)).astype(np.float32), 1
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        frames = decode_avi_frames(payload, frame_stride=frame_stride)
        if not frames:
            raise ValueError("AVI carries no video frames")
        feat = np.mean([_gray_hist(f) for f in frames], axis=0)
        return feat.astype(np.float32), len(frames)
    if payload[4:8] == b"ftyp":
        from gmft_spark.kernel.mp4 import decode_mp4_frames

        frames = decode_mp4_frames(payload, frame_stride=frame_stride)
        if not frames:
            raise ValueError("MP4 carries no video frames")
        feat = np.mean([_gray_hist(f) for f in frames], axis=0)
        return feat.astype(np.float32), len(frames)
    if payload[:6] in (b"GIF87a", b"GIF89a"):  # animated GIF as video
        from gmft_spark.kernel.gif import decode_gif_frames

        frames = decode_gif_frames(payload, frame_stride=frame_stride)
        feat = np.mean([_gray_hist(f) for f in frames], axis=0)
        return feat.astype(np.float32), len(frames)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from gmft_spark.kernel.webp import decode_webp_frames

        frames = decode_webp_frames(payload, frame_stride=frame_stride)
        feat = np.mean([_gray_hist(f[:, :, :3]) for f in frames], axis=0)
        return feat.astype(np.float32), len(frames)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":  # APNG as video
        from gmft_spark.kernel.raster import decode_apng_frames

        frames = decode_apng_frames(payload, frame_stride=frame_stride)
        feat = np.mean(
            [_gray_hist(f[:, :, :3] if f.ndim == 3 else f) for f in frames],
            axis=0,
        )
        return feat.astype(np.float32), len(frames)
    raise NotImplementedError(
        f"real {modality} decode for non-AVI/MP4/GIF/WebP/APNG "
        "containers needs ffmpeg on executors; install and implement "
        "here"
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
                n_frames = (
                    max(1, len(raw) // (frame_stride * 64))
                    if modality == "video"
                    else 1
                )
                if decode_mode == "real":
                    try:
                        feat, n_frames = _real_decode(
                            raw, modality, frame_stride
                        )
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


def resize_images(
    media: DataFrame,
    out_w: int,
    out_h: int,
    out_format: str = "png",
    quality: int = 90,
) -> DataFrame:
    """Decode → bilinear-resize → re-encode image payloads (the resize
    stage of a multimodal training-data pipeline). Non-image rows pass
    through untouched; undecodable image payloads become error rows
    (NULL payload) — never task failures. Narrow mapInPandas: payload
    bytes stay inside their scan partition, nothing shuffles."""
    from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg
    from gmft_spark.kernel.raster import (
        decode_png,
        encode_png,
        resize_bilinear,
    )

    if out_format not in ("png", "jpeg"):
        raise ValueError("out_format must be 'png' or 'jpeg'")
    if out_w < 1 or out_h < 1:
        raise ValueError("resize target must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for media_id, modality, payload, meta in zip(
                batch["media_id"],
                batch["modality"],
                batch["payload"],
                batch["meta"],
            ):
                raw = bytes(payload)
                meta = dict(meta)
                if modality == "image":
                    try:
                        if raw[:8] == b"\x89PNG\r\n\x1a\n":
                            px = decode_png(raw)
                        elif raw[:2] == b"\xff\xd8":
                            px = decode_jpeg(raw)
                        elif raw[:4] in (b"II*\x00", b"MM\x00*"):
                            from gmft_spark.kernel.tiff import decode_tiff

                            px = decode_tiff(raw)
                        elif raw[:6] in (b"GIF87a", b"GIF89a"):
                            from gmft_spark.kernel.gif import (
                                decode_gif_frames,
                            )

                            px = decode_gif_frames(raw)[0]
                        elif raw[:2] == b"BM":
                            from gmft_spark.kernel.bmp import decode_bmp

                            px = decode_bmp(raw)
                        elif (
                            raw[:4] == b"RIFF" and raw[8:12] == b"WEBP"
                        ):
                            from gmft_spark.kernel.webp import decode_webp

                            px = decode_webp(raw)[:, :, :3]
                        else:
                            raise NotImplementedError(
                                "non-PNG/JPEG/TIFF/GIF/BMP/WebP image "
                                "resize needs PIL; install and "
                                "implement here"
                            )
                        resized = resize_bilinear(px, out_h, out_w)
                        if out_format == "png":
                            raw = encode_png(resized)
                            meta["mime"] = "image/png"
                        else:
                            raw = encode_jpeg(resized, quality=quality)
                            meta["mime"] = "image/jpeg"
                        meta["width"] = out_w
                        meta["height"] = out_h
                        meta["n_bytes"] = len(raw)
                    except ValueError:
                        raw = None  # contained error row
                        meta["n_bytes"] = 0
                rows.append(
                    {
                        "media_id": int(media_id),
                        "modality": modality,
                        "payload": raw,
                        "meta": meta,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


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


def _decode_image_payload(payload: bytes) -> np.ndarray:
    """Shared image-container sniff → decoded pixels (the chain
    _real_decode/resize_images use): PNG, JPEG, TIFF, GIF (first
    frame)."""
    from gmft_spark.kernel.jpeg import decode_jpeg
    from gmft_spark.kernel.raster import decode_png

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from gmft_spark.kernel.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from gmft_spark.kernel.gif import decode_gif_frames

        return decode_gif_frames(payload)[0]
    if payload[:2] == b"BM":
        from gmft_spark.kernel.bmp import decode_bmp

        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from gmft_spark.kernel.webp import decode_webp

        return decode_webp(payload)[:, :, :3]
    raise NotImplementedError(
        "non-PNG/JPEG/TIFF/GIF/BMP/WebP-lossless image decode needs "
        "PIL on executors; install and implement here"
    )


def _to_luma(px: np.ndarray) -> np.ndarray:
    """Luma collapse for the visual-identity channel. A gray image
    stored in an RGB container (R==G==B everywhere — e.g. GIF's
    identity-gray palette, paletted TIFF) IS the gray image: return the
    channel directly so its pixel sha matches the same image stored as
    native grayscale. True color collapses via integer REC-601 (exact,
    engine-portable — float luma drifts 1 LSB at some values)."""
    if px.ndim == 3:
        r = px[:, :, 0].astype(np.int32)
        g = px[:, :, 1].astype(np.int32)
        b = px[:, :, 2].astype(np.int32)
        if (r == g).all() and (g == b).all():
            return px[:, :, 0]
        return ((299 * r + 587 * g + 114 * b + 500) // 1000).astype(
            np.uint8
        )
    return px


def _media_ahash(px: np.ndarray) -> tuple:
    """8×8 intensity average-hash over decoded luma: tile b spans
    ``[b·dim // 8, (b+1)·dim // 8)``; bit set when the tile's MEAN
    intensity is strictly above the image mean (pure integer compare:
    tile_sum · image_area > total · tile_area — no float thresholds, so
    re-encodes of the same pixels hash identically). Returns
    (sig_lo, sig_hi) int64s, bits 0–31 / 32–63 little-endian."""
    g = _to_luma(px).astype(np.int64)
    h, w = g.shape
    ys = [(b * h) // 8 for b in range(8)]
    xs = [(b * w) // 8 for b in range(8)]
    sums = np.add.reduceat(np.add.reduceat(g, ys, axis=0), xs, axis=1)
    areas = np.outer(
        np.diff(ys + [h]).astype(np.int64), np.diff(xs + [w]).astype(np.int64)
    )
    total = int(g.sum())
    bits = (sums * (h * w) > total * areas).astype(np.int64).reshape(-1)
    lo = hi = 0
    for i in range(32):
        lo |= int(bits[i]) << i
        hi |= int(bits[32 + i]) << i
    return lo, hi


VISUAL_SIG_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("px_sha", StringType()),
        StructField("sig_lo", LongType()),
        StructField("sig_hi", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("tile_sha", StringType()),
        StructField("tile_lo", LongType()),
        StructField("tile_hi", LongType()),
    ]
)

# Fixed normalization tile for the SCALE-INVARIANT channel: every image
# bilinear-resizes to this square before hashing, so a re-scaled copy
# lands near its original. 64 is a no-op for 64x64 inputs (half-pixel-
# center sampling at identical size is the identity map).
_TILE_DIM = 64


def media_visual_signatures(media: DataFrame) -> DataFrame:
    """Per-image visual identity: sha256 of the DECODED pixel buffer
    (the cross-container exact channel — the same pixels written as
    PNG, TIFF or GIF byte-differ as payloads but decode identically)
    plus an 8×8 intensity ahash (the near-dup recall channel, catching
    lossy re-encodes like JPEG), plus the SCALE-INVARIANT channel
    (round 5): luma bilinear-normalized to a fixed 64×64 tile, hashed
    both exactly (``tile_sha`` — catches integer-duplication rescales
    byte-exactly) and by ahash (``tile_lo``/``tile_hi`` — the recall
    device for interpolated rescales, consumed by
    ``dedup_media_visual_scaled``). Non-image rows and undecodable
    payloads are dropped (dedup never acts on them). Narrow map —
    payload bytes stay in their scan partition."""
    from gmft_spark.kernel.raster import resize_bilinear

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid, modality, payload in zip(
                batch["media_id"], batch["modality"], batch["payload"]
            ):
                if modality != "image" or payload is None:
                    continue
                try:
                    px = _decode_image_payload(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                g = _to_luma(px)
                lo, hi = _media_ahash(g)
                tile = resize_bilinear(g, _TILE_DIM, _TILE_DIM)
                t_lo, t_hi = _media_ahash(tile)
                rows.append(
                    {
                        "media_id": int(mid),
                        "px_sha": hashlib.sha256(
                            np.ascontiguousarray(g).tobytes()
                        ).hexdigest(),
                        "sig_lo": lo,
                        "sig_hi": hi,
                        "width": int(g.shape[1]),
                        "height": int(g.shape[0]),
                        "tile_sha": hashlib.sha256(
                            np.ascontiguousarray(tile).tobytes()
                        ).hexdigest(),
                        "tile_lo": t_lo,
                        "tile_hi": t_hi,
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=VISUAL_SIG_SCHEMA
    )


def dedup_media_visual(
    media: DataFrame, max_hamming: int = 2
) -> DataFrame:
    """Cross-container visual near-dup pairs by BANDED Hamming join
    over the ahash (8 one-byte bands → one equi-join, exact for any
    max_hamming < 8 by pigeonhole — the dedup_pages_visual shape,
    render.py:597), confirmed by exact Hamming (JVM bit_count) and
    flagged ``exact`` when the decoded pixel shas match (same pixels,
    different container/compression). Same-size images only — a
    resized copy is a different asset for THIS channel;
    ``dedup_media_visual_scaled`` (round 5) catches rescaled copies
    through the fixed-tile normalization."""
    if max_hamming > 7:
        raise ValueError(
            "dedup_media_visual is exact only for max_hamming < 8 "
            "(8 one-byte bands; pigeonhole)"
        )
    sigs = media_visual_signatures(media)
    bands = sigs.select(
        "media_id",
        "px_sha",
        "sig_lo",
        "sig_hi",
        "width",
        "height",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(
                                F.col("sig_lo" if b < 4 else "sig_hi"),
                                8 * (b % 4),
                            ).bitwiseAND(255)
                        ).alias("val"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bv"),
    ).select(
        "media_id",
        "px_sha",
        "sig_lo",
        "sig_hi",
        "width",
        "height",
        F.col("bv.band").alias("band"),
        F.col("bv.val").alias("val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.width") == F.col("b.width"))
            & (F.col("a.height") == F.col("b.height"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            (
                F.bit_count(
                    F.col("a.sig_lo").bitwiseXOR(F.col("b.sig_lo"))
                )
                + F.bit_count(
                    F.col("a.sig_hi").bitwiseXOR(F.col("b.sig_hi"))
                )
            ).alias("hamming"),
            (F.col("a.px_sha") == F.col("b.px_sha")).alias("exact"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("media_a", "media_b")
    )


def dedup_media_visual_scaled(
    media: DataFrame, max_hamming: int = 6
) -> DataFrame:
    """SCALE-INVARIANT visual near-dup pairs (round 5, the third recall
    channel next to exact px_sha and same-size ahash): candidates come
    from the same 8 one-byte Hamming bands, but over the ahash of the
    luma NORMALIZED to a fixed 64×64 bilinear tile — so a 2× upscaled
    re-encode of an image pairs with its original, which the same-size
    channel treats as a different asset by design
    (``dedup_media_visual`` docstring). Confirmation stays in-band:
    exact tile Hamming (JVM bit_count) ≤ ``max_hamming`` and a
    ``tile_exact`` flag when the normalized tiles are byte-identical
    (integer-duplication rescales). Like every recall channel here,
    pairs are candidates for a downstream confirmation policy, not
    automatic drops — interpolated rescales are not pixel-provable.
    Exact for max_hamming < 8 by pigeonhole (one band must match)."""
    if max_hamming > 7:
        raise ValueError(
            "dedup_media_visual_scaled is exact only for max_hamming < 8 "
            "(8 one-byte bands; pigeonhole)"
        )
    sigs = media_visual_signatures(media)
    bands = sigs.select(
        "media_id",
        "tile_sha",
        "tile_lo",
        "tile_hi",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(
                                F.col("tile_lo" if b < 4 else "tile_hi"),
                                8 * (b % 4),
                            ).bitwiseAND(255)
                        ).alias("val"),
                    )
                    for b in range(8)
                ]
            )
        ).alias("bv"),
    ).select(
        "media_id",
        "tile_sha",
        "tile_lo",
        "tile_hi",
        F.col("bv.band").alias("band"),
        F.col("bv.val").alias("val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            (
                F.bit_count(
                    F.col("a.tile_lo").bitwiseXOR(F.col("b.tile_lo"))
                )
                + F.bit_count(
                    F.col("a.tile_hi").bitwiseXOR(F.col("b.tile_hi"))
                )
            ).alias("hamming"),
            (F.col("a.tile_sha") == F.col("b.tile_sha")).alias(
                "tile_exact"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("media_a", "media_b")
    )


# --- codec-decode parity queries (round 4) ------------------------------
# Cross-engine value-hash evidence for the from-scratch codecs: each
# query pushes an integer-formula signal THROUGH a real encode→decode
# roundtrip on the Spark side, while the DuckDB oracle recomputes the
# expected decode output directly from the formula. Any bit of drift in
# the codec (header layout, Huffman coder, bit stuffing, DCT/quantizer,
# PCM framing) breaks the hash. Everything is integer-exact by
# construction: WAV 16-bit PCM is lossless; PNG is lossless; flat
# (single-DC) JPEG blocks reconstruct exactly because the quantization
# error q/16 < 1/2 for every quality-90 table entry (see
# tests/test_jpeg.py::test_flat_block_is_lossless).

_WAV_PARITY_N_MEDIA = 64
_PNG_PARITY_N_MEDIA = 32


def media_wav_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAVE PCM roundtrip parity: samples s_t = ((id*7 + t*13) % 4096)
    - 2048, encoded and decoded through kernel/wav.py, then histogrammed
    into 16 amplitude bins ((s + 32768) >> 12). Emits integer bin counts
    — the oracle recomputes them from the formula alone."""
    from gmft_spark.kernel.wav import decode_wav, encode_wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                n = 800 + (mid % 5) * 160
                t = np.arange(n, dtype=np.int64)
                s = ((mid * 7 + t * 13) % 4096 - 2048).astype(np.int16)
                dec, rate = decode_wav(encode_wav(s, 16000))
                assert rate == 16000
                bins = (dec[:, 0].astype(np.int32) + 32768) >> 12
                for b, c in zip(*np.unique(bins, return_counts=True)):
                    rows.append(
                        {"media_id": mid, "bin": int(b), "cnt": int(c)}
                    )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, bin int, cnt long"
    return (
        spark.range(_WAV_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "bin")
    )


MEDIA_WAV_DECODE_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_WAV_PARITY_N_MEDIA - 1}) g(i)),
samples AS (
    SELECT ids.media_id,
           ((ids.media_id * 7 + ts.t * 13) % 4096) - 2048 AS s
    FROM ids
    CROSS JOIN generate_series(0, 800 + 4 * 160 - 1) ts(t)
    WHERE ts.t < 800 + (ids.media_id % 5) * 160
)
SELECT media_id,
       CAST((s + 32768) // 4096 AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM samples
GROUP BY media_id, bin
ORDER BY media_id, bin
"""


_FLAC_PARITY_N_MEDIA = 48


def media_flac_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC roundtrip parity: a stereo integer-formula signal
    (ch0_t = ((id*11 + t*17) % 4096) - 2048, ch1_t = ((id*5 + t*7) %
    4096) - 2048, n = 700 + (id%4)*256 — frames >1024 samples cross a
    block boundary, so the stereo-mode rotation and multi-frame path
    run) encoded and decoded through kernel/flac.py, then histogrammed
    per channel into 16 amplitude bins. FLAC is lossless, so the
    oracle recomputes the bins from the formula alone."""
    from gmft_spark.kernel.flac import decode_flac, encode_flac

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                n = 700 + (mid % 4) * 256
                t = np.arange(n, dtype=np.int64)
                ch0 = (mid * 11 + t * 17) % 4096 - 2048
                ch1 = (mid * 5 + t * 7) % 4096 - 2048
                st = np.stack([ch0, ch1], axis=1)
                dec, rate, bps = decode_flac(encode_flac(st, 16000))
                assert (rate, bps) == (16000, 16)
                for c in (0, 1):
                    bins = (dec[:, c].astype(np.int32) + 32768) >> 12
                    for b, cnt in zip(*np.unique(bins, return_counts=True)):
                        rows.append(
                            {
                                "media_id": mid,
                                "ch": c,
                                "bin": int(b),
                                "cnt": int(cnt),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, ch int, bin int, cnt long"
    return (
        spark.range(_FLAC_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "ch", "bin")
    )


MEDIA_FLAC_DECODE_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_FLAC_PARITY_N_MEDIA - 1}) g(i)),
samples AS (
    SELECT ids.media_id, ch.c AS ch,
           CASE ch.c
             WHEN 0 THEN ((ids.media_id * 11 + ts.t * 17) % 4096) - 2048
             ELSE ((ids.media_id * 5 + ts.t * 7) % 4096) - 2048
           END AS s
    FROM ids
    CROSS JOIN generate_series(0, 700 + 3 * 256 - 1) ts(t)
    CROSS JOIN (VALUES (0), (1)) ch(c)
    WHERE ts.t < 700 + (ids.media_id % 4) * 256
)
SELECT media_id, CAST(ch AS INT) AS ch,
       CAST((s + 32768) // 4096 AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM samples
GROUP BY media_id, ch, bin
ORDER BY media_id, ch, bin
"""


def media_png_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG roundtrip parity: the synthesize_png_media gradient pattern
    (v = (i*3 + j*7 + id*13) % 256, h = 32 + id % 16, w = 48) encoded
    and decoded through kernel/raster.py, then binned (v >> 4). Integer
    counts; the oracle recomputes from the formula."""
    from gmft_spark.kernel.raster import decode_png, encode_png

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
                px = decode_png(encode_png(arr))
                bins = px.reshape(-1).astype(np.int32) >> 4
                for b, c in zip(*np.unique(bins, return_counts=True)):
                    rows.append(
                        {"media_id": mid, "bin": int(b), "cnt": int(c)}
                    )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, bin int, cnt long"
    return (
        spark.range(_PNG_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "bin")
    )


MEDIA_PNG_DECODE_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_PNG_PARITY_N_MEDIA - 1}) g(i)),
px AS (
    SELECT ids.media_id,
           (ri.i * 3 + cj.j * 7 + ids.media_id * 13) % 256 AS v
    FROM ids
    CROSS JOIN generate_series(0, 47) ri(i)
    CROSS JOIN generate_series(0, 47) cj(j)
    WHERE ri.i < 32 + ids.media_id % 16
)
SELECT media_id,
       CAST(v // 16 AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM px
GROUP BY media_id, bin
ORDER BY media_id, bin
"""


def media_jpeg_flat_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline-JPEG roundtrip parity on the exactly-losslessly-coded
    case: one flat 24x16 grayscale image per gray value v = (id*17 + 5)
    % 256 over all 256 ids — a flat block is DC-only and reconstructs
    exactly at quality 90 (quant error q/16 < 1/2). Emits per-image
    min/max pixel and pixel count; decode must return the flat value."""
    from gmft_spark.kernel.jpeg import decode_jpeg, encode_jpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                v = (mid * 17 + 5) % 256
                arr = np.full((16, 24), v, dtype=np.uint8)
                px = decode_jpeg(encode_jpeg(arr, quality=90))
                rows.append(
                    {
                        "media_id": mid,
                        "px_min": int(px.min()),
                        "px_max": int(px.max()),
                        "n_px": int(px.size),
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, px_min int, px_max int, n_px long"
    return (
        spark.range(256).mapInPandas(run, schema=schema).orderBy("media_id")
    )


MEDIA_JPEG_FLAT_PARITY_SQL = """
SELECT i AS media_id,
       CAST((i * 17 + 5) % 256 AS INT) AS px_min,
       CAST((i * 17 + 5) % 256 AS INT) AS px_max,
       CAST(384 AS BIGINT) AS n_px
FROM generate_series(0, 255) g(i)
ORDER BY media_id
"""


_CCITT_PARITY_N_MEDIA = 48


def media_ccitt_g4_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCITT Group-4 (T.6) roundtrip parity: a bilevel diagonal-stripe
    bitmap pixel(i,j) = [(i*5 + j*3 + id*11) % 7 < 2] of shape
    (24 + id%8, 40) rides a real encode_g4 → decode_g4 roundtrip
    (kernel/ccitt.py — single-pixel black runs exercise the horizontal
    MH codes, the per-row shift of 5 ≡ -2 (mod 7) the vertical modes).
    Emits per-row black-pixel counts; G4 is lossless, so the oracle
    recomputes them from the formula alone."""
    from gmft_spark.kernel.ccitt import decode_g4, encode_g4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                h, w = 24 + mid % 8, 40
                ii = np.arange(h, dtype=np.int64)[:, None]
                jj = np.arange(w, dtype=np.int64)[None, :]
                bm = (((ii * 5 + jj * 3 + mid * 11) % 7) < 2).astype(
                    np.uint8
                )
                dec = decode_g4(encode_g4(bm), w, h)
                for r, c in enumerate(dec.sum(axis=1)):
                    rows.append(
                        {"media_id": mid, "row": int(r), "n_black": int(c)}
                    )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, row int, n_black long"
    return (
        spark.range(_CCITT_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "row")
    )


MEDIA_CCITT_G4_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_CCITT_PARITY_N_MEDIA - 1}) g(i)),
px AS (
    SELECT ids.media_id, ri.i AS r, cj.j AS c,
           CASE WHEN (ri.i * 5 + cj.j * 3 + ids.media_id * 11) % 7 < 2
                THEN 1 ELSE 0 END AS b
    FROM ids
    CROSS JOIN generate_series(0, 30) ri(i)
    CROSS JOIN generate_series(0, 39) cj(j)
    WHERE ri.i < 24 + ids.media_id % 8
)
SELECT media_id,
       CAST(r AS INT) AS row,
       CAST(sum(b) AS BIGINT) AS n_black
FROM px
GROUP BY media_id, r
ORDER BY media_id, row
"""


_TIFF_PARITY_N_MEDIA = 32


def media_tiff_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF 6.0 roundtrip parity: the PNG-parity gradient pattern
    (v = (i*3 + j*7 + id*13) % 256, h = 24 + id % 16, w = 40) rides a
    real encode_tiff → decode_tiff roundtrip (kernel/tiff.py) with the
    codec matrix varied BY id — compression LZW+predictor-2 (even ids)
    vs PackBits (odd), byte order II (id%4<2) vs MM, multi-strip at 8
    rows — then binned (v >> 4). Every supported compression is
    lossless, so the decoded bin counts are a pure function of the
    formula; the oracle recomputes them without any codec."""
    from gmft_spark.kernel.tiff import decode_tiff, encode_tiff

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                h, w = 24 + mid % 16, 40
                arr = (
                    (
                        np.arange(h)[:, None] * 3
                        + np.arange(w)[None, :] * 7
                        + mid * 13
                    )
                    % 256
                ).astype(np.uint8)
                payload = encode_tiff(
                    arr,
                    compression="lzw" if mid % 2 == 0 else "packbits",
                    predictor=mid % 2 == 0,
                    rows_per_strip=8,
                    big_endian=mid % 4 >= 2,
                )
                px = decode_tiff(payload)
                bins = px.reshape(-1).astype(np.int32) >> 4
                for b, c in zip(*np.unique(bins, return_counts=True)):
                    rows.append(
                        {"media_id": mid, "bin": int(b), "cnt": int(c)}
                    )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, bin int, cnt long"
    return (
        spark.range(_TIFF_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "bin")
    )


MEDIA_TIFF_DECODE_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_TIFF_PARITY_N_MEDIA - 1}) g(i)),
px AS (
    SELECT ids.media_id,
           (ri.i * 3 + cj.j * 7 + ids.media_id * 13) % 256 AS v
    FROM ids
    CROSS JOIN generate_series(0, 39) ri(i)
    CROSS JOIN generate_series(0, 39) cj(j)
    WHERE ri.i < 24 + ids.media_id % 16
)
SELECT media_id,
       CAST(v // 16 AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM px
GROUP BY media_id, bin
ORDER BY media_id, bin
"""


_MP4_PARITY_N_MEDIA = 48


def media_mp4_flat_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-BMFF MP4 container parity on the exactly-lossless MJPEG
    case: per media_id, 3 + id % 4 flat grayscale frames with frame k
    at value v = (id*19 + k*17 + 5) % 256, written through encode_mp4
    and read back through the full sample-table resolution path
    (kernel/mp4.py: stsd/stts/stsc/stsz/stco) at frame_stride 2. Flat
    blocks reconstruct exactly at quality 90, so each decoded frame's
    min/max must equal the formula; the oracle enumerates the sampled
    frames (k = 0, 2, 4, ...) without any codec."""
    from gmft_spark.kernel.mp4 import decode_mp4_frames, encode_mp4

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                n = 3 + mid % 4
                frames = [
                    np.full(
                        (16, 24), (mid * 19 + k * 17 + 5) % 256, np.uint8
                    )
                    for k in range(n)
                ]
                payload = encode_mp4(frames, fps=8, quality=90)
                dec = decode_mp4_frames(payload, frame_stride=2)
                for j, px in enumerate(dec):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame": 2 * j,
                            "px_min": int(px.min()),
                            "px_max": int(px.max()),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, frame int, px_min int, px_max int"
    return (
        spark.range(_MP4_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "frame")
    )


MEDIA_MP4_FLAT_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_MP4_PARITY_N_MEDIA - 1}) g(i)),
fr AS (
    SELECT ids.media_id, ks.k AS frame,
           (ids.media_id * 19 + ks.k * 17 + 5) % 256 AS v
    FROM ids
    CROSS JOIN generate_series(0, 5) ks(k)
    WHERE ks.k < 3 + ids.media_id % 4 AND ks.k % 2 = 0
)
SELECT media_id,
       CAST(frame AS INT) AS frame,
       CAST(v AS INT) AS px_min,
       CAST(v AS INT) AS px_max
FROM fr
ORDER BY media_id, frame
"""


_GIF_PARITY_N_MEDIA = 32


def media_gif_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF roundtrip parity: an animated GIF of 2 + id % 3 gradient
    frames (pixel v = (i*3 + j*7 + id*13 + k*31) % 256 on frame k,
    h = 24 + id % 8, w = 40; odd ids interlaced) rides a real
    encode_gif → decode_gif_frames roundtrip (kernel/gif.py, the
    LSB-first GIF LZW variant) at frame_stride 2, then red-channel
    bins (v >> 4) per sampled frame. GIF is lossless, so the counts
    are a pure function of the formula; the oracle enumerates the
    sampled frames (k = 0, 2) without any codec."""
    from gmft_spark.kernel.gif import decode_gif_frames, encode_gif

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                h, w = 24 + mid % 8, 40
                n = 2 + mid % 3
                frames = [
                    (
                        (
                            np.arange(h)[:, None] * 3
                            + np.arange(w)[None, :] * 7
                            + mid * 13
                            + k * 31
                        )
                        % 256
                    ).astype(np.uint8)
                    for k in range(n)
                ]
                payload = encode_gif(frames, interlace=mid % 2 == 1)
                dec = decode_gif_frames(payload, frame_stride=2)
                for j, px in enumerate(dec):
                    bins = px[:, :, 0].reshape(-1).astype(np.int32) >> 4
                    for b, c in zip(*np.unique(bins, return_counts=True)):
                        rows.append(
                            {
                                "media_id": mid,
                                "frame": 2 * j,
                                "bin": int(b),
                                "cnt": int(c),
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    schema = "media_id long, frame int, bin int, cnt long"
    return (
        spark.range(_GIF_PARITY_N_MEDIA)
        .mapInPandas(run, schema=schema)
        .orderBy("media_id", "frame", "bin")
    )


MEDIA_GIF_DECODE_PARITY_SQL = f"""
WITH ids AS (SELECT i AS media_id FROM generate_series(0, {_GIF_PARITY_N_MEDIA - 1}) g(i)),
px AS (
    SELECT ids.media_id, ks.k AS frame,
           (ri.i * 3 + cj.j * 7 + ids.media_id * 13 + ks.k * 31) % 256 AS v
    FROM ids
    CROSS JOIN generate_series(0, 3) ks(k)
    CROSS JOIN generate_series(0, 31) ri(i)
    CROSS JOIN generate_series(0, 39) cj(j)
    WHERE ks.k < 2 + ids.media_id % 3 AND ks.k % 2 = 0
      AND ri.i < 24 + ids.media_id % 8
)
SELECT media_id,
       CAST(frame AS INT) AS frame,
       CAST(v // 16 AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM px
GROUP BY media_id, frame, bin
ORDER BY media_id, frame, bin
"""


_VISDEDUP_PARITY_N_GROUPS = 8


def media_visual_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-container visual-dedup parity: 8 pixel patterns
    (v = (i*3 + j*7 + gid*29) % 256, 32×40), each written FOUR ways —
    PNG, LZW TIFF, GIF, RLE8 BMP (byte-distinct payloads, identical
    pixels) as media_ids 4·gid … 4·gid+3 — then pushed through the REAL
    dedup_media_visual plan (decode → pixel sha + intensity ahash →
    banded Hamming equi-join). The exact channel (pixel-sha equality)
    is a pure function of the group structure, so the oracle enumerates
    the 6 within-group pairs per group without running any codec. Only
    exact pairs are emitted (near-channel hamming on NON-identical
    patterns is codec-real but not formula-derivable)."""
    from gmft_spark.kernel.bmp import encode_bmp
    from gmft_spark.kernel.gif import encode_gif
    from gmft_spark.kernel.raster import encode_png
    from gmft_spark.kernel.tiff import encode_tiff

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                gid = mid // 4
                arr = (
                    (
                        np.arange(32)[:, None] * 3
                        + np.arange(40)[None, :] * 7
                        + gid * 29
                    )
                    % 256
                ).astype(np.uint8)
                enc = (
                    encode_png,
                    lambda a: encode_tiff(a, "lzw"),
                    lambda a: encode_gif([a]),
                    lambda a: encode_bmp(a, bits=8, rle=True),
                )[mid % 4]
                payload = enc(arr)
                rows.append(
                    {
                        "media_id": mid,
                        "modality": "image",
                        "payload": payload,
                        "meta": {
                            "mime": "application/octet-stream",
                            "width": 40,
                            "height": 32,
                            "duration_ms": 0,
                            "n_bytes": len(payload),
                        },
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    media = spark.range(4 * _VISDEDUP_PARITY_N_GROUPS).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )
    return (
        dedup_media_visual(media, max_hamming=2)
        .filter(F.col("exact"))
        .select(
            "media_a",
            "media_b",
            F.col("hamming").cast("int").alias("hamming"),
        )
        .orderBy("media_a", "media_b")
    )


# Gate envelope: fewer groups than the same-size family, and the 4x
# (256x256) member rides GIF, not LZW TIFF — the TIFF encoder's
# decoder-simulating LZW is ~10x slower per pixel (measured 0.33 s vs
# 0.036 s per group round trip at 256x256).
_VISSCALED_PARITY_N_GROUPS = 4


def media_visual_scaled_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCALE-INVARIANT visual-dedup parity (round 5): each 64×64 pixel
    pattern (the media_visual_dedup_parity family) is written THREE
    ways — the base as PNG, its 2× nearest-upscale as LZW TIFF
    (128×128), its 4× nearest-upscale as GIF (256×256) — and pushed through
    the REAL dedup_media_visual_scaled plan (decode → luma → 64×64
    bilinear normalization → tile sha/ahash → banded Hamming
    equi-join). Integer-duplication upscales normalize back
    BYTE-EXACTLY (half-pixel-center sampling of k×-duplicated rows
    interpolates between equal values; pinned numerically in
    tests/test_job_media_curation.py), so the tile_exact channel is a
    pure function of the group structure and the oracle enumerates the
    3 within-group pairs per group without running any codec or
    resize. Only tile-exact pairs are emitted — cross-group band
    collisions (possible at 8×8 granularity) carry tile_exact=false
    and are filtered identically on both sides."""
    from gmft_spark.kernel.gif import encode_gif
    from gmft_spark.kernel.raster import encode_png
    from gmft_spark.kernel.tiff import encode_tiff

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for mid in batch["id"]:
                mid = int(mid)
                gid, member = mid // 3, mid % 3
                base = (
                    (
                        np.arange(64)[:, None] * 3
                        + np.arange(64)[None, :] * 7
                        + gid * 29
                    )
                    % 256
                ).astype(np.uint8)
                if member == 0:
                    payload = encode_png(base)
                elif member == 1:
                    up = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
                    payload = encode_tiff(up, "lzw")
                else:
                    up = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
                    payload = encode_gif([up])
                rows.append(
                    {
                        "media_id": mid,
                        "modality": "image",
                        "payload": payload,
                        "meta": {
                            "mime": "application/octet-stream",
                            "width": 64 * (1, 2, 4)[member],
                            "height": 64 * (1, 2, 4)[member],
                            "duration_ms": 0,
                            "n_bytes": len(payload),
                        },
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    media = spark.range(3 * _VISSCALED_PARITY_N_GROUPS).mapInPandas(
        run, schema=MEDIA_SCHEMA
    )
    return (
        dedup_media_visual_scaled(media, max_hamming=2)
        .filter(F.col("tile_exact"))
        .select(
            "media_a",
            "media_b",
            F.col("hamming").cast("int").alias("hamming"),
        )
        .orderBy("media_a", "media_b")
    )


MEDIA_VISUAL_SCALED_PARITY_SQL = f"""
WITH g AS (SELECT i AS gid FROM generate_series(0, {_VISSCALED_PARITY_N_GROUPS - 1}) gg(i)),
pairs AS (
    SELECT gid, a.i AS a, b.i AS b
    FROM g, generate_series(0, 2) a(i), generate_series(0, 2) b(i)
    WHERE a.i < b.i
)
SELECT CAST(gid * 3 + a AS BIGINT) AS media_a,
       CAST(gid * 3 + b AS BIGINT) AS media_b,
       CAST(0 AS INT) AS hamming
FROM pairs
ORDER BY media_a, media_b
"""


MEDIA_VISUAL_DEDUP_PARITY_SQL = f"""
WITH g AS (SELECT i AS gid FROM generate_series(0, {_VISDEDUP_PARITY_N_GROUPS - 1}) gg(i)),
pairs AS (
    SELECT gid, a.i AS a, b.i AS b
    FROM g, generate_series(0, 3) a(i), generate_series(0, 3) b(i)
    WHERE a.i < b.i
)
SELECT CAST(gid * 4 + a AS BIGINT) AS media_a,
       CAST(gid * 4 + b AS BIGINT) AS media_b,
       CAST(0 AS INT) AS hamming
FROM pairs
ORDER BY media_a, media_b
"""
