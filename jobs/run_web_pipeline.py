"""Full crawl-to-corpus curation pipeline: WARC archives → training
shards, composed ENTIRELY from the gate-verified operators.

The CCNet/FineWeb-shaped cascade a pretraining corpus actually runs,
as one lineage-tracked spark-submit job:

  1. ingest    — binaryFile .warc/.wet scan → kernel/warc.py parse →
                 boilerplate strip / PDF text → normalized-URL dedup →
                 per-domain cap (operators/webcorpus.py), staged as a
                 documents-schema parquet directory
  2. lang      — stopword-vote language ID (textstats.lang_id), with
                 an optional keep-list
  3. quality   — composite quality score (textstats.quality_score),
                 threshold gate
  4. near-dup  — MinHash-LSH + alternating-star connected components
                 (dedup.dedup_minhash_clusters), one canonical doc per
                 cluster
  5. pii       — e-mail/phone span redaction (curation.redact_pii_col)
  6. shards    — deterministic hash-sharding with running token totals
                 (textstats.shard_training_corpus)

Every stage is the SAME code path the driver's correctness gate
value-hashes against DuckDB at sf0.01 — the job only composes and
stages them. The staged corpus directory makes stage 2+ reads identical
to the sf-table contract the operators already honor, and doubles as a
crash checkpoint (each stage directory is atomic via Spark's _SUCCESS
marker).

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_web_pipeline.py \\
        --input s3://.../crawl/segments/ --workdir s3://.../stage/ \\
        --output s3://.../corpus/ --min-quality 0.3 --languages en \\
        --max-per-domain 100000 --buckets 4096
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help=".warc[.gz] dir")
    parser.add_argument(
        "--workdir", required=True, help="stage checkpoint directory"
    )
    parser.add_argument("--output", required=True, help="final corpus dir")
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--min-quality", type=float, default=0.0)
    parser.add_argument(
        "--languages",
        default="",
        help="comma-separated language keep-list (empty = keep all)",
    )
    parser.add_argument("--max-per-domain", type=int, default=0)
    parser.add_argument("--min-chars", type=int, default=0)
    parser.add_argument(
        "--respect-robots",
        action="store_true",
        help="apply RFC 9309 rules from the crawl's own /robots.txt "
        "responses before staging (pages from domains without a "
        "fetched robots.txt pass through)",
    )
    parser.add_argument("--agent", default="gmftbot")
    parser.add_argument(
        "--resume",
        action="store_true",
        help="crash recovery: a completed final output is a no-op, and "
        "a completed staged corpus in --workdir skips re-ingest (the "
        "cascade is deterministic over the staged corpus)",
    )
    parser.add_argument(
        "--corpus-snapshot-table",
        default=None,
        metavar="TBL",
        help="incremental crawl refresh (the run_web_ingest composition "
        "at cascade grain): drop staged pages the landed corpus already "
        "holds — exact url_norm anti-join vs TBL plus MinHash near-dup "
        "vs the stored TBL_bands index — then commit the cascade's "
        "final survivors to TBL exactly-once (replay = no-op; crash "
        "between the sink and the commit recovers on --resume)",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-web-pipeline")
    if args.master:
        builder = builder.master(args.master)
    spark = (
        builder.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from gmft_spark.operators.webcorpus import (
        cap_per_domain,
        dedup_by_normalized_url,
        extract_warc_documents,
        registered_domain,
    )

    # ── stage 1: ingest → documents-schema staging directory ───────
    import os

    corpus_dir = f"{args.workdir}/corpus"
    staged_dir = f"{corpus_dir}/documents.parquet"
    if args.resume:
        if os.path.exists(os.path.join(args.output, "_lineage")):
            # crash-recovery hook: the final sink may have completed
            # while the corpus commit did not — reconcile first
            if args.corpus_snapshot_table:
                _reconcile_corpus(spark, args, "resume recovery")
            print("nothing to do: final corpus already written")
            return 0
        if os.path.exists(os.path.join(staged_dir, "_SUCCESS")):
            print(f"resume: reusing staged corpus at {staged_dir}")
            return _cascade(spark, args, corpus_dir, None)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(args.input)
        .select(
            F.col("path").alias("src"),
            F.col("content").alias("payload"),
        )
    )
    # persist: the robots aggregate, the denied count, and the staged
    # write would otherwise each re-parse every archive
    docs = extract_warc_documents(files, src_col="src").persist()
    # non-200 responses (soft-404s, redirect stubs) are not corpus pages
    ok = docs.filter(
        (F.col("status") == "ok")
        & (
            F.col("http_status").isNull()
            | (F.col("http_status") == 200)
        )
    )
    n_robots_denied = 0
    if args.respect_robots:
        from gmft_spark.operators.webcorpus import robots_filter

        is_robots = F.col("url").rlike(r"^[^?#]*/robots\.txt$")
        host_of = F.lower(
            F.regexp_extract(
                F.col("url"),
                r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)",
                1,
            )
        )
        # RFC 9309 scope is the ORIGIN: key robots by HOST, not by
        # registered domain (docs.example.com and www.example.com have
        # independent robots files)
        robots = (
            ok.filter(is_robots)
            .withColumn("host", host_of)
            .groupBy("host")
            .agg(F.min("main_text").alias("robots_txt"))
        )
        pages = ok.filter(~is_robots).withColumn("host", host_of)
        decided = robots_filter(
            pages, robots, agent=args.agent, key_col="host"
        )
        n_robots_denied = decided.filter(~F.col("allowed")).count()
        ok = decided.filter(F.col("allowed")).drop(
            "allowed", "robots_match_len", "robots_txt", "host"
        )
    if args.min_chars:
        ok = ok.filter(F.length("main_text") >= args.min_chars)
    ok = dedup_by_normalized_url(ok)
    if args.max_per_domain:
        ok = cap_per_domain(ok, args.max_per_domain)
    else:
        host = F.lower(
            F.regexp_extract(
                F.col("url_norm"),
                r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)",
                1,
            )
        )
        ok = ok.withColumn("domain", registered_domain(host))
    staged = ok.select(
        F.xxhash64("url_norm").alias("doc_id"),
        F.col("main_text").alias("text"),
        F.lit("und").alias("lang"),
        F.col("domain").alias("source"),
        F.length("main_text").cast("bigint").alias("n_chars"),
        "url_norm",
        "url",
    )
    staged.write.mode("overwrite").parquet(f"{corpus_dir}/documents.parquet")
    docs.unpersist()
    return _cascade(spark, args, corpus_dir, n_robots_denied)


def _reconcile_corpus(spark, args, tag: str) -> None:
    """Exactly-once corpus commit over the landed final results
    (webcorpus.corpus_refresh_commit; see run_web_ingest)."""
    import os

    from pyspark.sql import functions as F

    from gmft_spark.operators.webcorpus import corpus_refresh_commit

    res_dir = os.path.join(args.output, "results")
    if not os.path.exists(res_dir):
        return
    landed = spark.read.parquet(res_dir).filter(F.col("status") == "ok")
    sid, n_new = corpus_refresh_commit(
        spark,
        landed,
        args.corpus_snapshot_table,
        url_col="conv_id",  # the cascade's lineage key IS url_norm
        text_col="text",
    )
    if sid is None:
        print(
            f"corpus {args.corpus_snapshot_table}: no-op ({tag}; every "
            "landed page already committed)"
        )
    else:
        print(
            f"corpus {args.corpus_snapshot_table}: snapshot {sid} "
            f"committed ({n_new} new pages; {tag})"
        )


def _cascade(spark, args, corpus_dir, n_robots_denied) -> int:
    """Stages 2-6 over the staged corpus (pure function of the staged
    parquet — the resume entry point re-runs exactly this)."""
    from pyspark.sql import functions as F

    from gmft_spark.operators.curation import redact_pii_col
    from gmft_spark.operators.dedup import dedup_minhash_clusters
    from gmft_spark.operators.textstats import (
        lang_id,
        quality_score,
        shard_training_corpus,
    )
    from gmft_spark.plans.lineage import write_results_with_lineage

    base = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    n_ingested = base.count()
    if n_ingested == 0:
        print("nothing to do: no documents survived ingest")
        return 0
    # incremental refresh: drop pages the landed corpus already holds
    # BEFORE the cascade scores them (exact url + stored-band-index
    # near-dup; the staged text is pre-redaction — band rows in the
    # table come from redacted text, identical except redacted spans)
    if args.corpus_snapshot_table:
        from gmft_spark.operators.webcorpus import corpus_seen_filter

        filtered, n_url, n_near = corpus_seen_filter(
            spark, base, args.corpus_snapshot_table,
            url_col="url_norm", text_col="text",
            table_url_col="conv_id",  # the table keys on the lineage key
        )
        if n_url or n_near:
            print(
                f"corpus refresh: skipped {n_url} already-landed urls, "
                f"{n_near} corpus near-dups"
            )
            # restage so the sf-dir-shaped cascade operators see the
            # filtered corpus (they read the staged parquet by path)
            filtered.write.mode("overwrite").parquet(
                f"{corpus_dir}/documents_fresh.parquet"
            )
            import shutil

            shutil.rmtree(f"{corpus_dir}/documents.parquet")
            shutil.move(
                f"{corpus_dir}/documents_fresh.parquet",
                f"{corpus_dir}/documents.parquet",
            )
            base = spark.read.parquet(f"{corpus_dir}/documents.parquet")
            n_ingested = base.count()
            if n_ingested == 0:
                print(
                    "nothing to do: every staged page already in the "
                    "corpus"
                )
                return 0

    # ── stages 2-6: the gate-verified cascade over the staged corpus ─
    langs = lang_id(spark, corpus_dir)
    q = quality_score(spark, corpus_dir)
    clusters = dedup_minhash_clusters(spark, corpus_dir)
    shards = shard_training_corpus(spark, corpus_dir)

    cur = (
        base.join(langs, "doc_id", "left")
        .join(q.select("doc_id", "n_tokens", "quality"), "doc_id", "left")
        .join(clusters.select("doc_id", "canonical_id", "is_dup"), "doc_id")
    )
    n_scored = cur.count()
    keep_langs = [s for s in args.languages.split(",") if s]
    if keep_langs:
        cur = cur.filter(F.col("lang_guess").isin(*keep_langs))
    cur = cur.filter(
        F.coalesce(F.col("quality"), F.lit(0.0)) >= args.min_quality
    )
    n_quality = cur.count()
    cur = cur.filter(F.col("is_dup") == 0)
    n_unique = cur.count()

    final = (
        cur.join(shards.select("doc_id", "shard", "pos"), "doc_id", "left")
        .select(
            F.col("url_norm").alias("conv_id"),  # lineage/bucket key
            "doc_id",
            "url",
            F.col("source").alias("domain"),
            F.col("lang_guess").alias("lang"),
            "quality",
            "n_tokens",
            "shard",
            "pos",
            redact_pii_col(F.col("text")).alias("text"),
            F.lit("ok").alias("status"),
        )
    )
    if final.isEmpty():
        print(
            f"pipeline: {n_ingested} ingested, 0 survived the cascade "
            "(nothing written)"
        )
        return 0
    run_id = args.run_id or f"webpipe-{int(time.time())}"
    write_results_with_lineage(
        spark, final, args.output, n_buckets=args.buckets, run_id=run_id
    )
    if args.corpus_snapshot_table:
        _reconcile_corpus(spark, args, f"run {run_id}")
    robots_note = (
        f" ({n_robots_denied} robots-denied)"
        if args.respect_robots and n_robots_denied is not None
        else ""
    )
    print(
        f"run {run_id}: {n_ingested} ingested{robots_note} -> "
        f"{n_scored} scored -> "
        f"{n_quality} past quality/lang -> {n_unique} unique -> "
        f"sharded corpus at {args.output}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
