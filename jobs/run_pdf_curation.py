"""PDF-corpus curation job: conversation documents (real multi-page PDF
payloads) → glyph-true page rasters → VISUAL near-dup (banded Hamming
over page ahashes) + TEXTUAL near-dup (conversation shingle Jaccard over
the text extracted from the same bytes) → canonicalized corpus written
with per-bucket lineage (checkpoint resume).

This is the document-shaped companion to jobs/run_curation.py (which
curates HTML/text transcripts): both dedup modalities run in ONE
lineage-tracked pipeline over the SAME payload bytes — a conversation
whose pages LOOK like an earlier conversation's (template reuse,
re-rendered exports) is caught by the visual path even when the text
drifts, and vice versa.

Cluster deployment mirrors jobs/run_extraction.py:

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_pdf_curation.py \\
        --input  s3://.../transcripts/   (parquet: conv_id, turn_idx) \\
        --output s3://.../curated_pdf/ --buckets 4096 [--resume]

Stage → operator map (each independently oracled/tested):
    payload build      sources/pdfgen.conversation_pdf (or injected)
    page rasters+sigs  operators/render.pdf_page_visual_signatures
    visual pairs       operators/render.dedup_pages_visual
    text extraction    operators/pdf_extract.corpus_page_words
    textual pairs      operators/convstats.conv_near_dup_frame
    sink               plans/lineage.write_results_with_lineage

Resume semantics: dedup pairs are computed over the FULL input every run
(a pair can span a completed and an incomplete bucket); --resume skips
only the re-WRITE of completed buckets.
"""

from __future__ import annotations

import argparse
import sys
import time

# a conversation is a VISUAL dup of an earlier one when at least this
# fraction of its pages near-match (hamming <= --max-hamming) pages of
# that conversation
VISUAL_DUP_PAGE_FRAC = 0.5


def main(argv=None, pdf_fn=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="transcript parquet dir")
    parser.add_argument("--output", required=True, help="curated sink dir")
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--max-hamming",
        type=int,
        default=2,
        help="page-pair Hamming bound for the visual path (< 8: the "
        "8-band scheme is exact only there)",
    )
    parser.add_argument(
        "--render-scale",
        type=float,
        default=0.5,
        help="raster scale for the ahash pass (the 8x8 ahash is "
        "resolution-robust; half scale quarters the fill cost)",
    )
    parser.add_argument(
        "--max-ink-delta",
        type=int,
        default=0,
        help="confirmation bound: candidate page pairs (ahash bands) "
        "must also agree on exact ink pixel count within this delta. "
        "0 = pixel-count-exact (catches re-renders byte-different but "
        "ink-identical; templated same-layout pages do NOT collide). "
        "Raise for tolerant matching of slightly re-scaled exports.",
    )
    parser.add_argument(
        "--pdf-password",
        default="",
        help="user (or owner) password for encrypted input documents "
        "(sources/pdfparse/crypt.py); wrong/missing passwords fail "
        "closed per document",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-pdf-curate")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
    )

    from gmft_spark.operators.convstats import conv_near_dup_frame
    from gmft_spark.operators.pdf_extract import corpus_page_words
    from gmft_spark.operators.render import (
        dedup_pages_visual,
        pdf_page_visual_signatures,
    )
    from gmft_spark.plans.lineage import (
        resume_filter,
        write_results_with_lineage,
    )

    if pdf_fn is None:
        from gmft_spark.sources.pdfgen import conversation_pdf as pdf_fn

    transcripts = spark.read.parquet(args.input)
    n_input = transcripts.count()
    if n_input == 0:
        print("nothing to do: empty input")
        return 0
    run_id = args.run_id or f"pdfcur-{int(time.time())}"

    # 1. one multi-page document per conversation (page i = turn i).
    # Materialized ONCE (persist): three downstream passes — signatures,
    # words, page counts — must not re-synthesize/re-fetch the bytes.
    convs = transcripts.groupBy("conv_id").agg(
        F.sort_array(F.collect_list("turn_idx")).alias("turns")
    )
    bschema = StructType(
        [
            StructField("doc_name", StringType()),
            StructField("payload", BinaryType()),
        ]
    )

    def build(batches):
        import pandas as pd

        for batch in batches:
            rows = [
                {
                    "doc_name": conv_id,
                    "payload": pdf_fn(conv_id, [int(t) for t in turns]),
                }
                for conv_id, turns in zip(batch["conv_id"], batch["turns"])
            ]
            if rows:
                yield pd.DataFrame(rows)

    binary = convs.mapInPandas(build, schema=bschema).persist()

    # 2. VISUAL path: glyph-true rasters → ahash signatures → banded
    # Hamming pairs → conversation-level dup decision (a later
    # conversation is a visual dup when >= VISUAL_DUP_PAGE_FRAC of its
    # pages near-match one earlier conversation's pages)
    sigs = pdf_page_visual_signatures(
        binary, scale=args.render_scale, pdf_password=args.pdf_password
    )
    page_pairs = dedup_pages_visual(sigs, max_hamming=args.max_hamming)
    # CONFIRM candidates on the exact ink channel: the 64-bit ahash is
    # recall-oriented (same-template pages collide by design); exact/
    # near-exact ink pixel agreement separates true re-renders from
    # pages that merely share a layout
    ink = sigs.select("conv_id", "turn_idx", "n_ink_px")
    page_pairs = (
        page_pairs.join(
            ink.alias("ia"),
            (F.col("conv_a") == F.col("ia.conv_id"))
            & (F.col("turn_a") == F.col("ia.turn_idx")),
        )
        .join(
            ink.alias("ib"),
            (F.col("conv_b") == F.col("ib.conv_id"))
            & (F.col("turn_b") == F.col("ib.turn_idx")),
        )
        .filter(
            F.abs(F.col("ia.n_ink_px") - F.col("ib.n_ink_px"))
            <= args.max_ink_delta
        )
        .select("conv_a", "turn_a", "conv_b", "turn_b", "hamming")
    )
    cross = page_pairs.filter(F.col("conv_a") != F.col("conv_b"))
    n_pages = sigs.groupBy("conv_id").agg(F.count("*").alias("n_pages"))
    vis_conv_pairs = (
        cross.groupBy("conv_a", "conv_b")
        .agg(F.count_distinct("turn_b").alias("n_matched"))
        .join(n_pages, F.col("conv_b") == F.col("conv_id"))
        .filter(
            F.col("n_matched")
            >= F.ceil(F.lit(VISUAL_DUP_PAGE_FRAC) * F.col("n_pages"))
        )
        .select("conv_a", "conv_b")
    )

    # 3. TEXTUAL path over the SAME bytes: per-page word text → per-turn
    # transcript frame → conversation shingle-Jaccard pairs (with the
    # production hot-shingle df cap at its default)
    words = corpus_page_words(binary, pdf_password=args.pdf_password)
    turns_text = (
        words.groupBy(
            F.col("doc_name").alias("conv_id"),
            F.col("page_no").alias("turn_idx"),
        )
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("word_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
    )
    txt_conv_pairs = conv_near_dup_frame(turns_text).select(
        "conv_a", "conv_b"
    )

    # 4. canonicalize keep-first (both operators emit conv_a < conv_b):
    # every conversation named conv_b by EITHER modality drops
    drop = (
        vis_conv_pairs.select(F.col("conv_b").alias("conv_id"))
        .union(txt_conv_pairs.select(F.col("conv_b").alias("conv_id")))
        .distinct()
    )
    n_vis = vis_conv_pairs.count()
    n_txt = txt_conv_pairs.count()
    n_drop = drop.count()
    curated = (
        turns_text.join(drop, "conv_id", "left_anti")
        .withColumn("n_words", F.size(F.split("text", " ")))
        .withColumn("status", F.lit("ok"))
    )

    # 5. lineage-tracked write; dedup ran over the FULL corpus above, so
    # the resume filter only skips completed buckets' re-write
    sink = resume_filter(spark, curated, args.output, args.buckets) if args.resume else curated
    if sink.isEmpty():
        print("nothing to do: all buckets completed")
        binary.unpersist()
        return 0
    lineage = write_results_with_lineage(
        spark, sink, args.output, n_buckets=args.buckets, run_id=run_id
    )
    stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]
    print(
        f"run {run_id}: {n_input} turns in, {n_vis} visual dup pairs, "
        f"{n_txt} textual dup pairs, {n_drop} conversations dropped, "
        f"{stats[0]} curated turns in output ({stats[1]} ok; cumulative "
        "across resumed runs)"
    )
    binary.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
