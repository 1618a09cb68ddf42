"""Full crawl→corpus cascade (jobs/run_web_pipeline.py): ingest, lang
gate, quality gate, MinHash near-dup collapse, PII redaction, sharding
— every stage the same operator code the driver gate value-hashes."""

from gmft_spark.kernel.warc import build_warc

import jobs.run_web_pipeline as J

_BODY = (
    "the quick data pipeline and the sort of text that is going to "
    "pass a quality gate with the stopwords it needs to look like "
    "real english prose about tables and rows and the joins between "
    "them "
) * 3

_BODY_B = (
    "a completely different article is here and the topic of this "
    "prose is gardens with flowers and the seasons of rain that "
    "water them while the birds sing songs to the morning light "
) * 3

_BODY_C = (
    "the third essay concerns ships and the sea with storms that "
    "is a tale of sailors and the harbors they visit while the "
    "wind is carrying them to the islands of salt and stone "
) * 3


def _page(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"<article><h1>{title}</h1><p>{body}</p></article>"
        "</body></html>"
    ).encode()


def test_web_pipeline_end_to_end(spark, tmp_path, capsys):
    src = tmp_path / "crawl"
    src.mkdir()
    recs = [
        # exact near-dup pair: identical page under two domains — the
        # MinHash cluster must keep exactly one
        ("https://dupa.example/page", _page("Dup", _BODY)),
        ("https://dupb.example/page", _page("Dup", _BODY)),
        # unique keeper (fully distinct vocabulary)
        ("https://keep.example/doc", _page("Keeper", _BODY_B)),
        # junk: too few tokens, no stopwords → quality gate drops it
        ("https://junk.example/x", _page("Junk", "zxqv wkrp blorp")),
        # PII: kept, but the e-mail and phone must be redacted
        (
            "https://pii.example/contact",
            _page(
                "Contact",
                _BODY_C + " reach bob.smith@example.com or 12-345-678-9012",
            ),
        ),
    ]
    (src / "seg.warc.gz").write_bytes(build_warc(recs))
    out = tmp_path / "corpus"
    assert (
        J.main(
            [
                "--input", str(src),
                "--workdir", str(tmp_path / "stage"),
                "--output", str(out),
                "--buckets", "4",
                "--min-quality", "0.2",
                "--languages", "en",
                "--run-id", "wp1",
            ]
        )
        == 0
    )
    msg = capsys.readouterr().out
    assert "5 ingested" in msg
    res = spark.read.parquet(str(out / "results"))
    rows = {r["url"]: r for r in res.collect()}
    # junk fell to the quality gate; exactly one of the dup pair
    # survived; keeper + pii survived
    assert "https://junk.example/x" not in rows
    dup_urls = [u for u in rows if u.startswith("https://dup")]
    assert len(dup_urls) == 1
    assert "https://keep.example/doc" in rows
    pii = rows["https://pii.example/contact"]
    assert "<EMAIL>" in pii["text"] and "<PHONE>" in pii["text"]
    assert "bob.smith@example.com" not in pii["text"]
    assert "12-345-678-9012" not in pii["text"]
    for r in rows.values():
        assert r["lang"] == "en"
        assert r["quality"] >= 0.2
        assert r["shard"] is not None and r["pos"] >= 1
        assert r["n_tokens"] > 0


def test_web_pipeline_empty_cascade(spark, tmp_path, capsys):
    src = tmp_path / "crawl"
    src.mkdir()
    (src / "seg.warc.gz").write_bytes(
        build_warc([("https://junk.example/x", _page("J", "zx qv"))])
    )
    assert (
        J.main(
            [
                "--input", str(src),
                "--workdir", str(tmp_path / "stage"),
                "--output", str(tmp_path / "corpus"),
                "--buckets", "2",
                "--min-quality", "0.9",
            ]
        )
        == 0
    )
    assert "0 survived the cascade" in capsys.readouterr().out


def test_web_pipeline_respects_robots(spark, tmp_path, capsys):
    """--respect-robots: rules come from the crawl's own /robots.txt
    responses; denied paths drop before staging, domains without a
    fetched robots pass through, the robots files themselves never
    become corpus documents."""
    src = tmp_path / "crawl"
    src.mkdir()
    robots = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n"
    )
    recs = [
        ("https://ruled.example/robots.txt", robots.encode(), "text/plain"),
        ("https://ruled.example/private/secret", _page("S", _BODY)),
        ("https://ruled.example/private/pub/okpage", _page("P", _BODY_B)),
        ("https://free.example/anything", _page("F", _BODY_C)),
    ]
    (src / "seg.warc.gz").write_bytes(build_warc(recs))
    out = tmp_path / "corpus"
    assert (
        J.main(
            [
                "--input", str(src),
                "--workdir", str(tmp_path / "stage"),
                "--output", str(out),
                "--buckets", "2",
                "--respect-robots",
                "--run-id", "wp2",
            ]
        )
        == 0
    )
    msg = capsys.readouterr().out
    assert "(1 robots-denied)" in msg
    res = spark.read.parquet(str(out / "results"))
    urls = {r["url"] for r in res.collect()}
    assert "https://ruled.example/private/secret" not in urls
    assert "https://ruled.example/private/pub/okpage" in urls
    assert "https://free.example/anything" in urls
    assert not any(u.endswith("/robots.txt") for u in urls)


def test_web_pipeline_resume_skips_reingest_and_is_idempotent(
    spark, tmp_path, capsys
):
    src = tmp_path / "crawl"
    src.mkdir()
    recs = [
        ("https://keep.example/doc", _page("Keeper", _BODY_B)),
        ("https://other.example/doc", _page("Other", _BODY_C)),
    ]
    (src / "seg.warc.gz").write_bytes(build_warc(recs))
    work = tmp_path / "stage"
    out = tmp_path / "corpus"
    base = ["--workdir", str(work), "--output", str(out), "--buckets", "2"]
    # crash simulation: stage only (run the full job once to land the
    # staged corpus, then delete the final output to mimic a crash
    # between staging and the final write)
    assert J.main(["--input", str(src)] + base + ["--run-id", "wr1"]) == 0
    import shutil

    shutil.rmtree(out)
    capsys.readouterr()
    # resume must NOT touch --input (pass a nonexistent dir to prove it)
    assert (
        J.main(
            ["--input", str(tmp_path / "gone")] + base
            + ["--resume", "--run-id", "wr2"]
        )
        == 0
    )
    msg = capsys.readouterr().out
    assert "resume: reusing staged corpus" in msg
    res = spark.read.parquet(str(out / "results"))
    assert res.filter(res.status == "ok").count() == 2
    # completed output → a further resume is a no-op
    capsys.readouterr()
    assert (
        J.main(
            ["--input", str(tmp_path / "gone")] + base
            + ["--resume", "--run-id", "wr3"]
        )
        == 0
    )
    assert "nothing to do: final corpus already written" in capsys.readouterr().out


def test_web_pipeline_incremental_corpus_refresh(spark, tmp_path, capsys):
    """--corpus-snapshot-table at cascade grain: the second crawl's
    overlap (same url, and a changed-url near-dup of landed TEXT) never
    reaches the cascade, only new pages commit, and a full replay is a
    genuine no-op (same snapshot id)."""
    from gmft_spark.plans import snapshots as S

    tbl = str(tmp_path / "ctbl")
    crawl1 = tmp_path / "c1"
    crawl1.mkdir()
    crawl1.joinpath("a.warc.gz").write_bytes(
        build_warc(
            [
                ("https://one.example/a", _page("A", _BODY)),
                ("https://two.example/b", _page("B", _BODY_B)),
            ]
        )
    )
    base = ["--buckets", "2", "--min-quality", "0.0",
            "--corpus-snapshot-table", tbl]
    assert J.main(["--input", str(crawl1),
                   "--workdir", str(tmp_path / "w1"),
                   "--output", str(tmp_path / "o1"),
                   "--run-id", "p1"] + base) == 0
    t = S.read_table(spark, tbl)
    assert t.count() == 2
    sid1 = S.current_snapshot_id(tbl)
    assert S.current_snapshot_id(tbl + "_bands") is not None

    # crawl 2: same url (exact skip), a NEW url carrying crawl-1 TEXT
    # (caught only by the stored band index), and one genuinely new page
    crawl2 = tmp_path / "c2"
    crawl2.mkdir()
    crawl2.joinpath("b.warc.gz").write_bytes(
        build_warc(
            [
                ("https://one.example/a", _page("A", _BODY)),
                ("https://moved.example/a2", _page("A moved", _BODY)),
                ("https://three.example/c", _page("C", _BODY_C)),
            ]
        )
    )
    assert J.main(["--input", str(crawl2),
                   "--workdir", str(tmp_path / "w2"),
                   "--output", str(tmp_path / "o2"),
                   "--run-id", "p2"] + base) == 0
    out = capsys.readouterr().out
    assert "skipped 1 already-landed urls, 1 corpus near-dups" in out
    t = S.read_table(spark, tbl)
    assert t.count() == 3
    assert t.filter(t.conv_id.contains("three.example")).count() == 1
    assert t.filter(t.conv_id.contains("moved.example")).count() == 0
    assert S.current_snapshot_id(tbl) == sid1 + 1

    # full replay of crawl 2: nothing new reaches the cascade
    assert J.main(["--input", str(crawl2),
                   "--workdir", str(tmp_path / "w3"),
                   "--output", str(tmp_path / "o3"),
                   "--run-id", "p2r"] + base) == 0
    out = capsys.readouterr().out
    assert "every staged page already in the corpus" in out
    assert S.current_snapshot_id(tbl) == sid1 + 1
