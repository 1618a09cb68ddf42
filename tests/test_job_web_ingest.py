"""Web-ingest job (jobs/run_web_ingest.py): real .warc.gz files through
binaryFile → parse → boilerplate strip → URL dedup → domain cap →
lineage sink, with contained error rows and file-grain resume."""

import gzip

import numpy as np
import pytest

from gmft_spark.kernel.warc import build_warc
from gmft_spark.operators.webcorpus import _page_html, _url_for

import jobs.run_web_ingest as J


def _write_archives(d, n_docs=168, n_files=6):
    """n_docs synthetic pages (4 URL variants per page identity b =
    doc//4) spread across n_files real gzip-member WARC archives."""
    d.mkdir(parents=True, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    for f in range(n_files):
        ids = range(f * per, min((f + 1) * per, n_docs))
        recs = [
            (_url_for(i), _page_html(i, f"body words {i} " * 4).encode())
            for i in ids
        ]
        (d / f"seg-{f:02d}.warc.gz").write_bytes(build_warc(recs))
    (d / "broken.warc.gz").write_bytes(b"\x1f\x8b\x08not really gzip")


def test_web_ingest_end_to_end(spark, tmp_path, capsys):
    src = tmp_path / "crawl"
    _write_archives(src)
    out = tmp_path / "out"
    assert (
        J.main(
            [
                "--input", str(src),
                "--output", str(out),
                "--buckets", "8",
                "--max-per-domain", "1",
                "--run-id", "wi1",
            ]
        )
        == 0
    )
    msg = capsys.readouterr().out
    assert "7 archives in" in msg
    res = spark.read.parquet(str(out / "results"))
    ok = res.filter(res.status == "ok").collect()
    errs = res.filter(res.status != "ok").collect()
    # the corrupt archive became exactly one contained error row
    assert len(errs) == 1
    assert "error" in errs[0]["status"]
    assert errs[0]["conv_id"].endswith("broken.warc.gz")
    # URL dedup: every surviving normalized url is unique
    norms = [r["url_norm"] for r in ok]
    assert len(norms) == len(set(norms))
    # domain cap 1: one page per registered domain; 168 docs = 42 page
    # identities spread over the 21 (site0-6 x com/org/co.uk) domains
    domains = [r["domain"] for r in ok]
    assert len(domains) == len(set(domains)) == 21
    # extraction really ran: main_text carries the article body
    assert all("body words" in r["main_text"] for r in ok)


def test_web_ingest_resume_and_variants(spark, tmp_path, capsys):
    src = tmp_path / "crawl"
    _write_archives(src, n_docs=24, n_files=2)
    out = tmp_path / "out"
    args = ["--input", str(src), "--output", str(out), "--buckets", "4"]
    assert J.main(args + ["--no-url-dedup", "--run-id", "wi2"]) == 0
    res = spark.read.parquet(str(out / "results"))
    ok = res.filter(res.status == "ok")
    # without dedup all 4 variants of each page identity survive,
    # sharing a normalized url
    assert ok.count() == 24
    grp = ok.groupBy("url_norm").count().collect()
    assert {r["count"] for r in grp} == {4}
    # resume: everything landed, second run is a no-op
    capsys.readouterr()
    assert J.main(args + ["--resume", "--run-id", "wi3"]) == 0
    assert "nothing to do" in capsys.readouterr().out


def test_web_ingest_min_chars(spark, tmp_path):
    src = tmp_path / "crawl"
    src.mkdir()
    recs = [
        (_url_for(0), _page_html(0, "tiny").encode()),
        (_url_for(4), _page_html(4, "long enough " * 20).encode()),
    ]
    (src / "one.warc.gz").write_bytes(build_warc(recs))
    out = tmp_path / "out"
    assert (
        J.main(
            [
                "--input", str(src),
                "--output", str(out),
                "--buckets", "2",
                "--min-chars", "120",
                "--run-id", "wi4",
            ]
        )
        == 0
    )
    res = spark.read.parquet(str(out / "results"))
    rows = res.filter(res.status == "ok").collect()
    assert len(rows) == 1 and "/docs/1" in rows[0]["url_norm"]


def test_web_ingest_routes_pdf_and_skips_foreign_mimes(spark, tmp_path):
    """Crawls carry PDFs next to HTML: PDF responses flow through the
    real byte-stream parser (reading-order words, pdfium line breaks),
    foreign mimes become skipped rows, a corrupt PDF is one contained
    per-record error row."""
    src = tmp_path / "crawl"
    src.mkdir()
    tiny = open("/root/reference/data/pdfs/tiny.pdf", "rb").read()
    recs = [
        (_url_for(0), _page_html(0, "html body words " * 8).encode()),
        ("https://site9.com/report.pdf", tiny, "application/pdf"),
        ("https://site9.com/logo.png", b"\x89PNG1234", "image/png"),
        ("https://site9.com/broken.pdf", b"%PDF-1.4 truncated",
         "application/pdf"),
    ]
    (src / "mixed.warc.gz").write_bytes(build_warc(recs))
    out = tmp_path / "out"
    assert (
        J.main(
            ["--input", str(src), "--output", str(out), "--buckets", "2",
             "--run-id", "wi5"]
        )
        == 0
    )
    res = spark.read.parquet(str(out / "results"))
    by_url = {r["url"]: r for r in res.collect()}
    pdf = by_url["https://site9.com/report.pdf"]
    assert pdf["status"] == "ok"
    assert pdf["main_text"].startswith("Simple document\nLorem ipsum")
    assert "Water Freezing Point 0 32" in pdf["main_text"]
    assert by_url["https://site9.com/logo.png"]["status"] == "skipped: image/png"
    assert by_url["https://site9.com/broken.pdf"]["status"].startswith(
        "error: unparseable PDF"
    )
    assert by_url[_url_for(0)]["status"] == "ok"


def test_web_ingest_reads_wet_archives(spark, tmp_path):
    """WET (pre-extracted text) archives flow through the same job: the
    conversion record's block becomes main_text directly."""
    from gmft_spark.kernel.warc import build_wet

    src = tmp_path / "crawl"
    src.mkdir()
    docs = [(_url_for(4 * i), f"wet body text {i} " * 10) for i in range(6)]
    (src / "seg.warc.wet.gz").write_bytes(build_wet(docs))
    out = tmp_path / "out"
    assert (
        J.main(
            ["--input", str(src), "--output", str(out), "--buckets", "2",
             "--run-id", "wi6"]
        )
        == 0
    )
    res = spark.read.parquet(str(out / "results"))
    rows = {r["url"]: r for r in res.filter(res.status == "ok").collect()}
    assert len(rows) == 6
    for url, text in docs:
        assert rows[url]["main_text"] == text
        assert rows[url]["mime"] == "text/plain"


def test_garbled_http_block_is_contained_per_record(spark, tmp_path):
    """A response record whose HTTP block is garbage becomes ONE error
    row; the archive's other records still extract (review fix: the
    http parse used to escape the per-record loop and kill the task)."""
    from gmft_spark.kernel.warc import _gzip_member, _record_bytes

    good = build_warc(
        [(_url_for(0), _page_html(0, "survivor body words " * 6).encode())]
    )
    bad_rec = _gzip_member(
        _record_bytes(
            "response",
            [
                ("WARC-Target-URI", "https://bad.example/x"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            b"NOT AN HTTP RESPONSE AT ALL",
        )
    )
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg.warc.gz").write_bytes(good + bad_rec)
    out = tmp_path / "out"
    assert (
        J.main(
            ["--input", str(src), "--output", str(out), "--buckets", "2",
             "--run-id", "wi7"]
        )
        == 0
    )
    res = spark.read.parquet(str(out / "results")).collect()
    by_status = {}
    for r in res:
        by_status.setdefault(r["status"].split(":")[0], []).append(r)
    assert len(by_status["ok"]) == 1
    (err,) = by_status["error"]
    assert err["url"] == "https://bad.example/x"


def test_non_200_responses_become_skipped_rows(spark, tmp_path):
    from gmft_spark.kernel.warc import _gzip_member, _record_bytes

    body = b"<html><body><article><p>gone page</p></article></body></html>"
    http = (
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )
    rec404 = _gzip_member(
        _record_bytes(
            "response",
            [
                ("WARC-Target-URI", "https://gone.example/x"),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
    )
    good = build_warc(
        [(_url_for(4), _page_html(4, "kept body words " * 6).encode())]
    )
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg.warc.gz").write_bytes(good + rec404)
    out = tmp_path / "out"
    assert (
        J.main(
            ["--input", str(src), "--output", str(out), "--buckets", "2",
             "--run-id", "wi8"]
        )
        == 0
    )
    res = {r["url"]: r for r in spark.read.parquet(str(out / "results")).collect()}
    assert res["https://gone.example/x"]["status"] == "skipped: http 404"
    assert res[_url_for(4)]["status"] == "ok"


def test_resume_holds_dedup_and_cap_across_runs(spark, tmp_path):
    """Cross-run contract (review fix): a resumed run must not re-admit
    an already-landed normalized URL, and the per-domain budget counts
    pages landed by earlier runs."""
    src = tmp_path / "crawl"
    src.mkdir()
    body = "run one body words and the text of it here " * 4
    # run 1: variants v0, v1 of page b=0 (same url_norm) + page b=2
    (src / "a.warc.gz").write_bytes(
        build_warc(
            [
                (_url_for(0), _page_html(0, body).encode()),
                (_url_for(1), _page_html(1, body).encode()),
                (_url_for(8), _page_html(8, body).encode()),
            ]
        )
    )
    out = tmp_path / "out"
    args = ["--input", str(src), "--output", str(out), "--buckets", "1",
            "--max-per-domain", "2"]
    assert J.main(args + ["--run-id", "r1"]) == 0
    first = spark.read.parquet(str(out / "results"))
    landed_norms = {r["url_norm"] for r in first.filter(first.status == "ok").collect()}
    # run 2: another variant of b=0 (dup), plus new pages b=4, b=12 on
    # the same registered domains
    (src / "b.warc.gz").write_bytes(
        build_warc(
            [
                (_url_for(2), _page_html(2, body).encode()),
                (_url_for(16), _page_html(16, body).encode()),
                (_url_for(48), _page_html(48, body).encode()),
            ]
        )
    )
    assert J.main(args + ["--resume", "--run-id", "r2"]) == 0
    res = spark.read.parquet(str(out / "results"))
    ok = [r for r in res.collect() if r["status"] == "ok"]
    norms = [r["url_norm"] for r in ok]
    assert len(norms) == len(set(norms)), "dup url_norm across runs"
    # domain budget: never more than 2 per registered domain overall
    from collections import Counter

    per_dom = Counter(r["domain"] for r in ok)
    assert all(v <= 2 for v in per_dom.values()), per_dom


# ── incremental crawl refresh (round 5, --corpus-snapshot-table) ──────


def _distinct_page(i, seed):
    """Per-page DISTINCT vocabulary so the MinHash channel links only
    genuinely similar pages (the templated default text makes every
    page a near-dup of every other — CLAUDE.md)."""
    words = " ".join(f"tok{seed}x{i}w{k}" for k in range(40))
    return (_url_for(i), _page_html(i, words).encode())


def test_incremental_crawl_refresh(spark, tmp_path):
    """The judge-mandated composition: batch 2 with ~30% overlap lands
    only its new pages in the corpus snapshot table (exact URLs via the
    table key set, changed-URL near-dups via the STORED band index —
    no corpus self-pairs); a replayed batch is a genuine no-op (no new
    snapshot); a crash between the parquet sink and the commit recovers
    on the next --resume run."""
    from gmft_spark.plans import snapshots as S

    tbl = str(tmp_path / "corpus_tbl")
    bands_tbl = tbl + "_bands"

    # batch 1: page identities 0..19 (docs 0..79, 4 url variants each)
    src1 = tmp_path / "crawl1"
    src1.mkdir()
    (src1 / "b1.warc.gz").write_bytes(
        build_warc([_distinct_page(i, "s") for i in range(0, 80, 4)])
    )
    out1 = tmp_path / "out1"
    base = ["--buckets", "4", "--corpus-snapshot-table", tbl]
    assert J.main(["--input", str(src1), "--output", str(out1),
                   "--run-id", "b1"] + base) == 0
    t1 = S.read_table(spark, tbl)
    n1 = t1.count()
    assert n1 == 20
    assert S.read_table(spark, bands_tbl).count() == 3 * n1  # 3 bands/doc
    sid1 = S.current_snapshot_id(tbl)

    # batch 2: pages 14..33 — 6 of 20 overlap by EXACT url, plus one
    # page with a NEW url duplicating a landed page's text
    # (url variant changes, content identical → caught ONLY by the
    # stored band index)
    src2 = tmp_path / "crawl2"
    src2.mkdir()
    recs = [_distinct_page(i, "s") for i in range(56, 136, 4)]
    near = _page_html(900, " ".join(f"toksx{12}w{k}" for k in range(40)))
    recs.append((_url_for(900), near.encode()))
    (src2 / "b2.warc.gz").write_bytes(build_warc(recs))
    out2 = tmp_path / "out2"
    assert J.main(["--input", str(src2), "--output", str(out2),
                   "--run-id", "b2"] + base) == 0
    t2 = S.read_table(spark, tbl)
    assert t2.count() == n1 + 14  # 20 pages - 6 url overlaps; near-dup dropped
    assert S.current_snapshot_id(tbl) == sid1 + 1
    # the near-dup page (new url, landed text) must NOT be in the table
    assert t2.filter(t2.url_norm.contains("/docs/225")).count() == 0

    # replay batch 2 into a fresh output dir: a genuine no-op — same
    # snapshot id, no rows added
    out3 = tmp_path / "out3"
    assert J.main(["--input", str(src2), "--output", str(out3),
                   "--run-id", "b2r"] + base) == 0
    assert S.current_snapshot_id(tbl) == sid1 + 1
    assert S.read_table(spark, tbl).count() == n1 + 14

    # crash recovery: batch 3 lands its parquet WITHOUT the corpus
    # commit (the simulated crash point), then a --resume run with the
    # table flag reconciles
    src3 = tmp_path / "crawl3"
    src3.mkdir()
    (src3 / "b3.warc.gz").write_bytes(
        build_warc([_distinct_page(i, "s") for i in range(160, 200, 4)])
    )
    out4 = tmp_path / "out4"
    assert J.main(["--input", str(src3), "--output", str(out4),
                   "--buckets", "4", "--run-id", "b3"]) == 0  # no table flag
    assert S.read_table(spark, tbl).count() == n1 + 14  # not committed yet
    assert J.main(["--input", str(src3), "--output", str(out4),
                   "--resume", "--run-id", "b3r"] + base) == 0
    assert S.read_table(spark, tbl).count() == n1 + 14 + 10
    # recovered rows carry their band index too
    assert S.read_table(spark, bands_tbl).count() == 3 * (n1 + 14 + 10)


def test_corpus_seen_filter_plans_and_dup_landing(spark, tmp_path):
    """The refresh helpers keep their scale shapes: the band-index
    near-dup is an equi-join (no cartesian), and corpus_refresh_commit
    survives duplicate landed rows (crash-then-rerun WITHOUT --resume
    appends the same page twice; the upsert's one-row-per-key contract
    must still hold)."""
    from pyspark.sql import Row

    from gmft_spark.operators.webcorpus import (
        corpus_refresh_commit,
        corpus_seen_filter,
    )
    from gmft_spark.plans import snapshots as S

    tbl = str(tmp_path / "tbl")
    rows = [
        Row(url_norm=f"https://s{i}.example/p", main_text=" ".join(
            f"w{i}x{k}" for k in range(20)), status="ok")
        for i in range(4)
    ]
    first = spark.createDataFrame(rows)
    sid, n = corpus_refresh_commit(spark, first, tbl)
    assert sid == 1 and n == 4
    # duplicate landing: the same 4 rows twice + 1 new
    dup = spark.createDataFrame(rows + rows + [
        Row(url_norm="https://new.example/p", main_text=" ".join(
            f"q{k}" for k in range(20)), status="ok")
    ])
    sid2, n2 = corpus_refresh_commit(spark, dup, tbl)
    assert sid2 == 2 and n2 == 1  # only the new page commits
    t = S.read_table(spark, tbl)
    assert t.count() == 5
    assert t.select("url_norm").distinct().count() == 5
    # plan shape: the near-dup candidate join is banded, never cartesian
    batch = spark.createDataFrame(rows[:2])
    filtered, n_url, n_near = corpus_seen_filter(spark, batch, tbl)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert n_url == 2 and filtered.count() == 0
