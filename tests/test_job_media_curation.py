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
