"""Web-corpus ingestion job: WARC archive files → extracted, URL-curated
documents with per-file lineage (Common Crawl-shaped front door).

Reads a directory of ``.warc.gz`` (or plain ``.warc``) files through
Spark's binaryFile source — one task per archive, the same grain a
1000-executor crawl ingest uses — parses them with the from-scratch
kernel (kernel/warc.py), strips boilerplate (kernel/html.py), then
applies URL curation: normalization + normalized-URL dedup and an
optional per-registered-domain cap. A malformed archive becomes one
contained error row; resume is at archive-file grain (a file whose
bucket completed is never re-parsed).

Cluster deployment mirrors jobs/run_extraction.py:

    zip -r gmft_spark.zip gmft_spark
    spark-submit --master <cluster> --py-files gmft_spark.zip \\
        jobs/run_web_ingest.py \\
        --input  s3://.../crawl/segments/ \\
        --output s3://.../web_docs/ \\
        --buckets 4096 --max-per-domain 100000 --min-chars 200
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--input", required=True, help="directory of .warc/.warc.gz files"
    )
    parser.add_argument("--output", required=True, help="document sink dir")
    parser.add_argument("--buckets", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument(
        "--max-per-domain",
        type=int,
        default=0,
        metavar="K",
        help="keep at most K pages per registered domain (0 = no cap)",
    )
    parser.add_argument(
        "--min-chars",
        type=int,
        default=0,
        help="drop pages whose extracted main text is shorter than this",
    )
    parser.add_argument(
        "--no-url-dedup",
        action="store_true",
        help="skip normalized-URL dedup (keep every fetched variant)",
    )
    parser.add_argument(
        "--corpus-snapshot-table",
        default=None,
        metavar="TBL",
        help="incremental crawl refresh: near-dup the batch against the "
        "LANDED corpus's stored MinHash band index (TBL_bands — no "
        "corpus self-pairs, cost O(|new| * bands)), then commit the "
        "surviving pages to the TBL snapshot table exactly-once "
        "(replayed batches are a no-op; a crash between the parquet "
        "sink and the commit recovers on the next --resume run)",
    )
    parser.add_argument("--run-id", default=None)
    parser.add_argument("--master", default=None)
    args = parser.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    builder = SparkSession.builder.appName("gmft-spark-web-ingest")
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
    )
    from gmft_spark.plans.lineage import (
        resume_filter,
        write_results_with_lineage,
    )

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(args.input)
        .select(
            F.col("path").alias("conv_id"),  # lineage/resume key = file
            F.col("content").alias("payload"),
        )
    )
    def _commit_corpus(tag: str) -> None:
        """Exactly-once corpus refresh over the landed results
        (webcorpus.corpus_refresh_commit — anti-join before upsert, so
        a replayed batch is a genuine no-op and a crash between the
        parquet sink and the commit recovers here)."""
        from gmft_spark.operators.webcorpus import corpus_refresh_commit

        tbl = args.corpus_snapshot_table
        res_dir = os.path.join(args.output, "results")
        if not os.path.exists(res_dir):
            return
        landed = spark.read.parquet(res_dir).filter(F.col("status") == "ok")
        sid, n_new = corpus_refresh_commit(
            spark, landed, tbl, url_col="url_norm", text_col="main_text"
        )
        if sid is None:
            print(
                f"corpus {tbl}: no-op ({tag}; every landed page already "
                "committed)"
            )
        else:
            print(
                f"corpus {tbl}: snapshot {sid} committed "
                f"({n_new} new pages; {tag})"
            )

    if args.resume:
        files = resume_filter(spark, files, args.output, args.buckets)
    n_files = files.count()
    if n_files == 0:
        # crash-recovery hook: the parquet sink may have completed while
        # the corpus commit did not — reconcile before declaring done
        if args.corpus_snapshot_table:
            _commit_corpus("resume recovery")
        print("nothing to do: all buckets completed")
        return 0

    # persist: the ok/errs split and the stats below would otherwise
    # re-parse every archive once per downstream action
    docs = extract_warc_documents(files, src_col="conv_id")
    # non-200 responses (soft-404s, redirect stubs) are not corpus
    # documents — reclassify so accounting keeps them visible
    non200 = F.col("http_status").isNotNull() & (
        F.col("http_status") != 200
    )
    docs = docs.withColumn(
        "status",
        F.when(
            (F.col("status") == "ok") & non200,
            F.concat(F.lit("skipped: http "), F.col("http_status")),
        ).otherwise(F.col("status")),
    ).persist()
    ok = docs.filter(F.col("status") == "ok")
    errs = docs.filter(F.col("status") != "ok")
    if args.min_chars:
        ok = ok.filter(F.length("main_text") >= args.min_chars)
    if not args.no_url_dedup:
        ok = dedup_by_normalized_url(ok)
    else:
        from gmft_spark.operators.webcorpus import normalize_url

        ok = ok.withColumn("url_norm", normalize_url(F.col("url")))
    # cross-RUN semantics under --resume: dedup and the domain budget
    # must hold over the whole landed dataset, not just this run's
    # remaining files
    landed_ok = None
    results_dir = os.path.join(args.output, "results")
    if args.resume and os.path.exists(results_dir):
        landed_ok = spark.read.parquet(results_dir).filter(
            F.col("status") == "ok"
        )
        if not args.no_url_dedup:
            ok = ok.join(
                landed_ok.select("url_norm").distinct(),
                "url_norm",
                "left_anti",
            )
    # incremental crawl refresh: before the batch lands, drop pages the
    # corpus already holds — by exact normalized URL, and by MinHash
    # near-dup against the STORED band index (batch rows join landed
    # band rows on (band, bucket): no corpus self-pairs, no corpus text
    # re-scan, cost O(|new| * bands) — dedup.minhash_band_rows_frame)
    n_corpus_url = n_corpus_near = 0
    if args.corpus_snapshot_table:
        from gmft_spark.operators.webcorpus import corpus_seen_filter

        ok, n_corpus_url, n_corpus_near = corpus_seen_filter(
            spark,
            ok,
            args.corpus_snapshot_table,
            url_col="url_norm",
            text_col="main_text",
        )

    if args.max_per_domain:
        ok = cap_per_domain(ok, args.max_per_domain, rank_col="_rk")
        if landed_ok is not None:
            used = landed_ok.groupBy("domain").agg(
                F.count("*").alias("_used")
            )
            ok = (
                ok.join(F.broadcast(used), "domain", "left")
                .filter(
                    F.col("_rk")
                    <= args.max_per_domain
                    - F.coalesce(F.col("_used"), F.lit(0))
                )
                .drop("_used")
            )
        ok = ok.drop("_rk")
    else:
        ok = ok.withColumn("domain", F.lit(None).cast("string"))

    errs = errs.withColumn(
        "url_norm", F.lit(None).cast("string")
    ).withColumn("domain", F.lit(None).cast("string"))
    curated = ok.unionByName(errs.select(*ok.columns))
    run_id = args.run_id or f"webingest-{int(time.time())}"
    if args.corpus_snapshot_table and curated.limit(1).count() == 0:
        # a fully-overlapping replayed batch filters down to nothing:
        # skip the sink (an all-empty parquet dir would poison later
        # re-reads) but still reconcile the corpus commit
        print(
            f"run {run_id}: {n_files} archives in, 0 document rows out "
            "(every page already in the corpus)"
        )
        _commit_corpus(f"run {run_id} (empty batch)")
        return 0
    lineage = write_results_with_lineage(
        spark, curated, args.output, n_buckets=args.buckets, run_id=run_id
    )
    stats = lineage.groupBy().sum("n_tables", "n_ok").collect()[0]
    docs.unpersist()
    print(
        f"run {run_id}: {n_files} archives in, {stats[0]} document rows "
        f"out ({stats[1]} ok; cumulative across resumed runs)"
    )
    if args.corpus_snapshot_table:
        if n_corpus_url or n_corpus_near:
            print(
                f"corpus refresh: skipped {n_corpus_url} already-landed "
                f"urls, {n_corpus_near} corpus near-dups"
            )
        _commit_corpus(f"run {run_id}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
