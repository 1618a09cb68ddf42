"""Multimodal media curation job entrypoint: a media table (image /
audio / video payloads as opaque binary + typed metadata) → exact
payload dedup → decode + feature extraction (the from-scratch PNG /
JPEG / TIFF / GIF / WAV / MJPEG-in-AVI/MP4 codecs when
``--decode-mode real``) → optional
image thumbnailing → curated media corpus with lineage (and optionally
an Iceberg-style snapshot commit).

Cluster deployment mirrors jobs/run_extraction.py:

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_media_curation.py \\
        --input  s3://.../media/   (parquet: media_id, modality, payload, meta) \\
        --output s3://.../curated_media/ \\
        --decode-mode real --thumb 64x48 --buckets 4096

Every stage is an operator with its own tests or driver oracle
(operators/multimodal.py — media_stats, dedup_media_exact,
extract_features, resize_images; the codecs themselves are value-hash
oracled in the gate: media_wav/png/jpeg_flat/ccitt_g4/tiff/mp4_flat/gif parity). This
entrypoint wires resume/lineage/snapshot plumbing around them the way a
production media-curation run deploys. Corrupt payloads surface as
status='error' rows (NULL feature), never task failures — the same
containment contract as the PDF decode jobs.

Lineage/bucket key: media tables have no conv_id, so the job buckets on
the media_id rendered as the lineage key (the same hidden-bucket
partition transform; resume drops completed buckets identically).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="media parquet dir")
    parser.add_argument("--output", required=True, help="curated sink dir")
    parser.add_argument(
        "--decode-mode",
        choices=("fake", "real"),
        default="real",
        help="'real' decodes payloads with the in-repo codecs (PNG/JPEG/"
        "TIFF/GIF/WAV/MJPEG in AVI or MP4); 'fake' is the "
        "deterministic no-decode stand-in",
    )
    parser.add_argument(
        "--thumb",
        default=None,
        metavar="WxH",
        help="also thumbnail image payloads to WxH (bilinear, re-encoded "
        "PNG) — the curated payload column carries the thumbnail",
    )
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument(
        "--visual-dedup",
        action="store_true",
        help="also drop images whose DECODED pixels are identical to an "
        "earlier image (cross-container dups: the same pixels as "
        "PNG/TIFF/GIF byte-differ, so exact payload dedup misses them)",
    )
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--snapshot-table", default=None)
    parser.add_argument(
        "--snapshot-mode", choices=("append", "upsert"), default="append"
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    thumb = None
    if args.thumb:
        try:
            tw, th = (int(v) for v in args.thumb.lower().split("x"))
        except ValueError:
            parser.error("--thumb expects WxH, e.g. 64x48")
        if tw < 1 or th < 1:
            parser.error("--thumb dimensions must be positive")
        thumb = (tw, th)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-media-curate")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.operators.multimodal import (
        dedup_media_exact,
        extract_features,
        media_stats,
        media_visual_signatures,
        resize_images,
    )
    from gmft_spark.plans.lineage import (
        resume_filter,
        write_results_with_lineage,
    )

    media = spark.read.parquet(args.input)
    # lineage key: the bucket transform hashes conv_id
    media = media.withColumn("conv_id", F.col("media_id").cast("string"))
    if args.resume:
        media = resume_filter(spark, media, args.output, args.buckets)
    n_input = media.count()
    if n_input == 0:
        print("nothing to do: all buckets completed")
        return 0

    for r in media_stats(media).collect():
        print(
            f"in[{r['modality']}]: {r['n_items']} items, "
            f"{r['total_bytes']} bytes"
        )

    # 1. exact payload dedup: one keeper per content hash
    keepers = dedup_media_exact(media).select(
        F.col("keeper").alias("media_id"),
        F.col("n_copies"),
    )
    deduped = media.join(F.broadcast(keepers), "media_id", "inner")
    n_dropped = n_input - deduped.count()

    # 1b. optional cross-container VISUAL dedup for images: the same
    #     pixels re-encoded (PNG vs TIFF vs GIF, or a re-compressed
    #     copy) byte-differ so stage 1 misses them; group by the sha of
    #     the DECODED pixel buffer and keep one per group. Exact channel
    #     only — near-dup (ahash Hamming) stays a report, never a drop
    #     (the ahash is recall-only; see dedup_media_visual).
    n_visual_dropped = 0
    if args.visual_dedup:
        vis = media_visual_signatures(
            deduped.select("media_id", "modality", "payload")
        )
        vis_keep = vis.groupBy("px_sha").agg(
            F.min("media_id").alias("keeper"),
            F.count("*").alias("n_visual_copies"),
        )
        # losers = decodable images whose pixel sha has an earlier
        # keeper; undecodable images never enter vis and pass through
        # (they surface as contained error rows downstream)
        losers = (
            vis.join(F.broadcast(vis_keep), "px_sha")
            .filter(F.col("media_id") != F.col("keeper"))
            .select("media_id")
        )
        n_visual_dropped = losers.count()
        deduped = deduped.join(
            F.broadcast(losers), "media_id", "left_anti"
        ).join(
            F.broadcast(
                vis_keep.select(
                    F.col("keeper").alias("media_id"), "n_visual_copies"
                )
            ),
            "media_id",
            "left",
        ).fillna({"n_visual_copies": 1})

    # 2. decode + features from the ORIGINAL payload (dedup identity and
    #    feature stay tied to the bytes that were deduplicated)
    feats = extract_features(
        deduped.select("media_id", "modality", "payload"),
        decode_mode=args.decode_mode,
    ).select("media_id", "sha256", "feature", "n_frames_sampled")

    # 3. optional thumbnailing (image modality; NULL payload = contained
    #    decode error)
    curated = deduped
    if thumb is not None:
        curated = resize_images(
            curated.select("media_id", "modality", "payload", "meta"),
            out_w=thumb[0],
            out_h=thumb[1],
        ).join(
            deduped.select(
                "media_id",
                "conv_id",
                "n_copies",
                *(["n_visual_copies"] if args.visual_dedup else []),
            ),
            "media_id",
        )

    run_id = args.run_id or f"media-{int(time.time())}"
    result = (
        curated.join(feats, "media_id", "left")
        .withColumn(
            "status",
            F.when(F.col("feature").isNotNull(), "ok").otherwise("error"),
        )
    )
    lineage = write_results_with_lineage(
        spark, result, args.output, n_buckets=args.buckets, run_id=run_id
    )
    stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]
    visual_note = (
        f"{n_visual_dropped} visual dups dropped, "
        if args.visual_dedup
        else ""
    )
    print(
        f"run {run_id}: {n_input} media in, {n_dropped} exact dups "
        f"dropped, {visual_note}{stats[0]} curated out ({stats[1]} ok) "
        "(cumulative across resumed runs)"
    )
    if args.snapshot_table:
        from gmft_spark.plans.snapshots import commit_append, commit_upsert

        batch = result.withColumn("run_id", F.lit(run_id))
        if args.snapshot_mode == "upsert":
            sid = commit_upsert(
                spark, batch, args.snapshot_table, key_cols=["media_id"]
            )
        else:
            sid = commit_append(spark, batch, args.snapshot_table)
        print(
            f"snapshot {sid} committed to {args.snapshot_table} "
            f"({args.snapshot_mode})"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
