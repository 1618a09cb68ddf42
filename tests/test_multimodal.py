"""Multimodal binary-column plumbing: schema, batching, pruning, dedup."""

import pytest

from pyspark.sql import functions as F

from gmft_spark.operators.multimodal import (
    FEATURE_DIM,
    dedup_media_exact,
    extract_features,
    media_stats,
    synthesize_media,
)


def test_media_schema_and_determinism(spark):
    m = synthesize_media(spark, 48)
    assert m.count() == 48
    row = m.filter(F.col("media_id") == 7).collect()[0]
    assert row["modality"] == "audio"
    assert row["meta"]["mime"] == "audio/wav"
    assert row["meta"]["n_bytes"] == len(bytes(row["payload"])) == 256

    # regeneration gives identical payloads (seedless determinism)
    row2 = synthesize_media(spark, 48).filter(F.col("media_id") == 7).collect()[0]
    assert bytes(row["payload"]) == bytes(row2["payload"])


def test_feature_extraction_fake_decode(spark):
    m = synthesize_media(spark, 30)
    feats = extract_features(m).collect()
    assert len(feats) == 30
    by_id = {r["media_id"]: r for r in feats}
    assert all(len(r["feature"]) == FEATURE_DIM for r in feats)
    # deterministic across runs
    feats2 = {r["media_id"]: r for r in extract_features(m).collect()}
    assert by_id[3]["feature"] == feats2[3]["feature"]
    assert by_id[3]["sha256"] == feats2[3]["sha256"]
    # video rows sample >1 frame
    assert all(
        r["n_frames_sampled"] >= 1 for r in feats if r["modality"] == "video"
    )


def test_real_decode_raises_at_seam(spark):
    # synthesize_media payloads are opaque non-container bytes: with the
    # from-scratch PNG/JPEG/WAV/AVI codecs in place, the remaining seam
    # is FOREIGN containers (TIFF/MP3/MP4), which these fakes stand for
    m = synthesize_media(spark, 4)
    with pytest.raises(Exception) as exc_info:
        extract_features(m, decode_mode="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_real_decode_all_modalities(spark):
    """decode_mode='real' runs end-to-end for image (PNG + JPEG), audio
    (WAVE PCM) and video (MJPEG AVI) with zero external libraries."""
    from gmft_spark.operators.multimodal import synthesize_real_media

    m = synthesize_real_media(spark, 24)
    feats = extract_features(m, decode_mode="real").collect()
    assert len(feats) == 24
    by_id = {r["media_id"]: r for r in feats}
    for r in feats:
        assert r["feature"] is not None, f"error row for {r['media_id']}"
        assert len(r["feature"]) == FEATURE_DIM
        assert abs(sum(r["feature"]) - 1.0) < 1e-3  # normalized histogram
    # video frame sampling is real: media_id k (k%3==2) carries 4+k%5
    # frames, sampled at stride 4 → ceil(n/4) frames decoded
    for mid in (2, 5, 8, 11, 14):
        n_frames = 4 + mid % 5
        expect = -(-n_frames // 4)
        assert by_id[mid]["n_frames_sampled"] == expect, mid
    # PNG and JPEG of the SAME pixel pattern give near-identical
    # histograms (JPEG is lossy but the 16-bin feature is coarse) —
    # media 0 (PNG) vs media 3 (JPEG) differ in pattern offset, so
    # compare within-id determinism instead
    feats2 = {
        r["media_id"]: r
        for r in extract_features(m, decode_mode="real").collect()
    }
    assert by_id[0]["feature"] == feats2[0]["feature"]
    assert by_id[1]["feature"] == feats2[1]["feature"]
    assert by_id[2]["feature"] == feats2[2]["feature"]


def test_real_decode_corrupt_payload_is_error_row(spark):
    """A well-signed but garbage payload becomes a contained error row
    (null feature), never a task failure."""
    import pandas as pd

    from gmft_spark.operators.multimodal import MEDIA_SCHEMA

    rows = [
        {
            "media_id": 0,
            "modality": "image",
            "payload": b"\x89PNG\r\n\x1a\n" + b"\x00" * 32,
            "meta": {
                "mime": "image/png",
                "width": 1,
                "height": 1,
                "duration_ms": 0,
                "n_bytes": 40,
            },
        },
        {
            "media_id": 1,
            "modality": "image",
            "payload": b"\xff\xd8\xff\xe0" + b"\x00" * 32,
            "meta": {
                "mime": "image/jpeg",
                "width": 1,
                "height": 1,
                "duration_ms": 0,
                "n_bytes": 36,
            },
        },
    ]
    m = spark.createDataFrame(pd.DataFrame(rows), schema=MEDIA_SCHEMA)
    feats = {r["media_id"]: r for r in
             extract_features(m, decode_mode="real").collect()}
    assert feats[0]["feature"] is None and feats[0]["n_frames_sampled"] == 0
    assert feats[1]["feature"] is None and feats[1]["n_frames_sampled"] == 0


def test_metadata_rollup_prunes_payload(spark, tmp_path):
    path = str(tmp_path / "media")
    synthesize_media(spark, 60).write.parquet(path)
    media = spark.read.parquet(path)
    stats = media_stats(media)
    plan = stats._jdf.queryExecution().executedPlan().toString()
    read_schema = [l for l in plan.split("\n") if "ReadSchema" in l]
    assert read_schema and "payload" not in read_schema[0]
    rows = {r["modality"]: r for r in stats.collect()}
    assert set(rows) == {"image", "audio", "video"}
    assert rows["image"]["total_bytes"] == rows["image"]["n_items"] * 256


def test_media_dedup_exact(spark):
    m = synthesize_media(spark, 20)
    groups = dedup_media_exact(m).collect()
    # payloads derive from distinct ids → no collisions
    assert len(groups) == 20
    assert all(g["n_copies"] == 1 for g in groups)


def test_resize_images_operator(spark):
    """decode → bilinear resize → re-encode over Arrow batches; non-image
    rows pass through byte-identical; metadata tracks the new geometry."""
    from gmft_spark.kernel.jpeg import decode_jpeg
    from gmft_spark.kernel.raster import decode_png
    from gmft_spark.operators.multimodal import (
        resize_images,
        synthesize_real_media,
    )

    m = synthesize_real_media(spark, 18)
    out = {r["media_id"]: r for r in resize_images(m, 20, 16).collect()}
    src = {r["media_id"]: r for r in m.collect()}
    for mid, row in out.items():
        if row["modality"] != "image":
            assert bytes(row["payload"]) == bytes(src[mid]["payload"])
            continue
        px = decode_png(bytes(row["payload"]))
        assert px.shape[:2] == (16, 20)
        assert row["meta"]["mime"] == "image/png"
        assert (row["meta"]["width"], row["meta"]["height"]) == (20, 16)
        assert row["meta"]["n_bytes"] == len(bytes(row["payload"]))
    # jpeg output format
    j = {
        r["media_id"]: r
        for r in resize_images(m, 10, 8, out_format="jpeg").collect()
        if r["modality"] == "image"
    }
    px = decode_jpeg(bytes(j[0]["payload"]))
    assert px.shape[:2] == (8, 10)
    assert j[0]["meta"]["mime"] == "image/jpeg"
