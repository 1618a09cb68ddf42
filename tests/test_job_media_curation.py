"""Media curation job entrypoint: end-to-end run over REAL codec
payloads, exact-dup drop, corrupt-payload containment, thumbnailing,
bucket-resume no-op, snapshot commit."""

import os

import numpy as np
from pyspark.sql import Row, functions as F

from gmft_spark.kernel.jpeg import encode_jpeg, encode_jpeg_progressive
from gmft_spark.operators.multimodal import synthesize_real_media
from gmft_spark.plans import snapshots as S


def _media_with_edge_cases(spark):
    """synthesize_real_media (PNG/JPEG/WAV/AVI payloads) + one exact
    duplicate pair, one corrupt image, one progressive JPEG."""
    base = synthesize_real_media(spark, n=24)
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (33, 41)).astype(np.uint8)
    jpg = encode_jpeg(arr, quality=80)
    extras = [
        (1001, jpg),  # keeper
        (1002, jpg),  # byte-identical duplicate
        (1003, encode_jpeg_progressive(arr, quality=80)),  # SOF2 path
        (1004, jpg[:40]),  # truncated → contained error row
    ]
    extra = spark.createDataFrame(
        [Row(media_id=i, modality="image", payload=bytearray(p))
         for i, p in extras]
    ).select(
        "media_id",
        "modality",
        "payload",
        F.struct(
            F.lit("image/jpeg").alias("mime"),
            F.lit(41).alias("width"),
            F.lit(33).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.length("payload").cast("int").alias("n_bytes"),
        ).alias("meta"),
    )
    cols = ["media_id", "modality", "payload", "meta"]
    return base.select(cols).unionByName(extra.select(cols))


def test_media_curation_job_end_to_end(spark, tmp_path, capsys):
    import jobs.run_media_curation as J

    src = str(tmp_path / "media_in")
    out = str(tmp_path / "media_out")
    tbl = str(tmp_path / "media_tbl")
    _media_with_edge_cases(spark).write.parquet(src)

    assert (
        J.main(
            ["--input", src, "--output", out, "--buckets", "8",
             "--decode-mode", "real", "--thumb", "24x16",
             "--snapshot-table", tbl, "--run-id", "m1"]
        )
        == 0
    )
    curated = spark.read.parquet(os.path.join(out, "results"))
    ids = {r["media_id"] for r in curated.select("media_id").collect()}
    # exact dup dropped: keeper 1001 stays, 1002 goes
    assert 1001 in ids and 1002 not in ids
    # progressive JPEG decoded ok
    prog = curated.filter(F.col("media_id") == 1003).collect()[0]
    assert prog["status"] == "ok" and prog["feature"] is not None
    # corrupt payload contained as an error row, not a task failure
    bad = curated.filter(F.col("media_id") == 1004).collect()[0]
    assert bad["status"] == "error" and bad["feature"] is None
    # thumbnails: every surviving decodable image is 24x16 now
    th = curated.filter(
        (F.col("modality") == "image") & (F.col("status") == "ok")
    ).select("meta.width", "meta.height").distinct().collect()
    assert {(r["width"], r["height"]) for r in th} == {(24, 16)}
    # every curated row carries the content hash + feature contract
    assert curated.filter(
        (F.col("status") == "ok") & F.col("sha256").isNull()
    ).count() == 0
    # snapshot committed and readable
    assert S.current_snapshot_id(tbl) == 1
    assert S.read_table(spark, tbl).count() == curated.count()

    # resume: all buckets complete -> clean no-op
    assert (
        J.main(["--input", src, "--output", out, "--buckets", "8",
                "--resume", "--decode-mode", "real"])
        == 0
    )
    assert "nothing to do" in capsys.readouterr().out


def test_media_curation_upsert_is_idempotent(spark, tmp_path):
    import jobs.run_media_curation as J

    src = str(tmp_path / "media_in_u")
    tbl = str(tmp_path / "media_tbl_u")
    synthesize_real_media(spark, n=12).write.parquet(src)
    base = ["--input", src, "--buckets", "4", "--decode-mode", "real",
            "--snapshot-table", tbl, "--snapshot-mode", "upsert"]
    assert J.main(base + ["--output", str(tmp_path / "o1"),
                          "--run-id", "u1"]) == 0
    n1 = S.read_table(spark, tbl).count()
    assert J.main(base + ["--output", str(tmp_path / "o2"),
                          "--run-id", "u2"]) == 0
    t = S.read_table(spark, tbl)
    assert t.count() == n1  # replaced, not duplicated
    assert t.select("run_id").distinct().collect()[0]["run_id"] == "u2"


def test_media_curation_rejects_bad_thumb(spark, tmp_path):
    import pytest

    import jobs.run_media_curation as J

    with pytest.raises(SystemExit):
        J.main(["--input", "x", "--output", "y", "--thumb", "nonsense"])
    with pytest.raises(SystemExit):
        J.main(["--input", "x", "--output", "y", "--thumb", "0x4"])


def _cross_container_media(spark):
    """The SAME pixels encoded as PNG, TIFF and GIF (byte-distinct,
    visually identical), a near-dup JPEG of them, one distinct image,
    one undecodable image, and one audio row."""
    from pyspark.sql import Row

    from gmft_spark.kernel.gif import encode_gif
    from gmft_spark.kernel.raster import encode_png
    from gmft_spark.kernel.tiff import encode_tiff
    from gmft_spark.kernel.wav import encode_wav

    g = (
        (np.arange(32)[:, None] * 3 + np.arange(48)[None, :] * 7) % 256
    ).astype(np.uint8)
    other = (
        (np.arange(32)[:, None] * 11 + np.arange(48)[None, :] * 5 + 100)
        % 256
    ).astype(np.uint8)
    rows = [
        (0, "image", encode_png(g)),
        (1, "image", encode_tiff(g, "lzw")),
        (2, "image", encode_gif([g])),
        (3, "image", encode_jpeg(g, quality=92)),
        (4, "image", encode_png(other)),
        (5, "image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16),  # corrupt
        (6, "audio", encode_wav(np.zeros(100, np.int16), 8000)),
    ]
    return spark.createDataFrame(
        [Row(media_id=i, modality=m, payload=bytearray(p))
         for i, m, p in rows]
    ).select(
        "media_id",
        "modality",
        "payload",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(48).alias("width"),
            F.lit(32).alias("height"),
            F.lit(0).alias("duration_ms"),
            F.length("payload").cast("int").alias("n_bytes"),
        ).alias("meta"),
    )


def test_visual_dedup_pairs_cross_container(spark):
    """dedup_media_visual: the exact channel (decoded-pixel sha) groups
    the PNG/TIFF/GIF triplet; the JPEG re-encode pairs as near-dup only;
    the distinct image pairs with nothing."""
    from gmft_spark.operators.multimodal import dedup_media_visual

    media = _cross_container_media(spark)
    pairs = dedup_media_visual(media, max_hamming=2).collect()
    exact = {
        (r["media_a"], r["media_b"]) for r in pairs if r["exact"]
    }
    assert exact == {(0, 1), (0, 2), (1, 2)}
    near = {
        (r["media_a"], r["media_b"]) for r in pairs if not r["exact"]
    }
    assert near == {(0, 3), (1, 3), (2, 3)}
    touched = {m for p in pairs for m in p[:2]}
    assert 4 not in touched and 5 not in touched and 6 not in touched


def test_visual_dedup_join_is_banded(spark):
    """The candidate join keys on (band, value) — no cartesian product
    in the physical plan."""
    from gmft_spark.operators.multimodal import dedup_media_visual

    plan = dedup_media_visual(
        _cross_container_media(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    with __import__("pytest").raises(ValueError):
        dedup_media_visual(_cross_container_media(spark), max_hamming=9)


def _scaled_copy_media(spark):
    """An image, its 2x NEAREST upscale re-encoded in a different
    container, its 2x BILINEAR upscale, and a distinct image — the
    scale-invariant channel's acceptance fixture."""
    from pyspark.sql import Row

    from gmft_spark.kernel.raster import encode_png, resize_bilinear
    from gmft_spark.kernel.tiff import encode_tiff

    g = (
        (np.arange(32)[:, None] * 3 + np.arange(48)[None, :] * 7) % 256
    ).astype(np.uint8)
    up_nearest = np.repeat(np.repeat(g, 2, axis=0), 2, axis=1)
    up_bilinear = resize_bilinear(g, 64, 96)
    other = (
        (np.arange(32)[:, None] * 11 + np.arange(48)[None, :] * 5 + 100)
        % 256
    ).astype(np.uint8)
    rows = [
        (0, "image", encode_png(g)),
        (1, "image", encode_tiff(up_nearest, "lzw")),
        (2, "image", encode_png(up_bilinear)),
        (3, "image", encode_png(other)),
    ]
    return spark.createDataFrame(
        [Row(media_id=i, modality=m, payload=bytearray(p))
         for i, m, p in rows]
    )


def test_visual_dedup_scaled_pairs_rescaled_copies(spark):
    """dedup_media_visual_scaled: a 2x upscaled re-encode pairs with
    its original through the 64x64 tile normalization — the exact case
    the same-size channel treats as a different asset (its own
    docstring); the distinct image pairs with nothing."""
    from gmft_spark.operators.multimodal import (
        dedup_media_visual,
        dedup_media_visual_scaled,
    )

    media = _scaled_copy_media(spark)
    # same-size channel: by design BLIND to cross-size pairs — the two
    # 64x96 upscales pair with each other, never with the 32x48 source
    same_size = dedup_media_visual(media, max_hamming=7).collect()
    assert {(r["media_a"], r["media_b"]) for r in same_size} == {(1, 2)}
    scaled = dedup_media_visual_scaled(media, max_hamming=6).collect()
    pairs = {(r["media_a"], r["media_b"]) for r in scaled}
    assert (0, 1) in pairs  # nearest-upscale TIFF re-encode
    assert (0, 2) in pairs  # bilinear upscale
    touched = {m for r in scaled for m in (r["media_a"], r["media_b"])}
    assert 3 not in touched
    by_pair = {(r["media_a"], r["media_b"]): r for r in scaled}
    assert by_pair[(0, 1)]["hamming"] <= 6
    assert by_pair[(0, 2)]["hamming"] <= 6


def test_visual_dedup_scaled_join_is_banded(spark):
    """The scaled channel keeps the banded equi-join shape — no
    cartesian product, no all-pairs enumeration."""
    import pytest

    from gmft_spark.operators.multimodal import dedup_media_visual_scaled

    plan = dedup_media_visual_scaled(
        _scaled_copy_media(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    with pytest.raises(ValueError):
        dedup_media_visual_scaled(_scaled_copy_media(spark), max_hamming=9)


def test_media_curation_job_visual_dedup(spark, tmp_path, capsys):
    """--visual-dedup drops the two later members of the pixel-identical
    triplet (keeper 0), keeps the JPEG near-dup (near is report-only),
    and keeps the undecodable image as a contained error row."""
    import jobs.run_media_curation as J

    src = str(tmp_path / "vmedia_in")
    out = str(tmp_path / "vmedia_out")
    _cross_container_media(spark).write.parquet(src)
    assert (
        J.main(
            ["--input", src, "--output", out, "--buckets", "4",
             "--decode-mode", "real", "--visual-dedup", "--run-id", "v1"]
        )
        == 0
    )
    captured = capsys.readouterr().out
    assert "2 visual dups dropped" in captured
    result = spark.read.parquet(os.path.join(out, "results"))
    ids = {r["media_id"] for r in result.select("media_id").collect()}
    assert ids == {0, 3, 4, 5, 6}
    kept0 = result.filter(F.col("media_id") == 0).collect()[0]
    assert kept0["n_visual_copies"] == 3
    err = result.filter(F.col("media_id") == 5).collect()[0]
    assert err["status"] == "error"
