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
