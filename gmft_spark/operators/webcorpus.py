"""Web-corpus ingestion: WARC archives → documents, plus URL curation.

The front door of a Common-Crawl-style training pipeline: archive
files (kernel/warc.py) are parsed inside a narrow ``mapInPandas``
(one task per archive row, no shuffle), response records run through
the same boilerplate-strip extractor as the HTML payload path
(kernel/html.extract_main_content), and the resulting page URLs feed
pure-JVM curation columns — component parse, normalization (lowercase
host, default-port strip, trailing-slash strip, utm_* param removal,
fragment drop), registered-domain extraction, and normalized-URL
dedup. All URL operators are built-in-function column expressions
(no UDFs): at 100 TB they are narrow maps; only the per-domain
aggregations shuffle, on the (low-cardinality) domain key.

Gate evidence (the codec-parity oracle pattern): document text rides a
deterministic HTML template into real WARC bytes (writer twin), back
through the real reader + extractor, and DuckDB re-derives the
expected output straight from the formulas. THREE copies of the URL
formula must agree — ``_url_for`` (python, the WARC builder),
``urls_from_documents`` (Spark column exprs), and ``_URL_SQL_CTE``
(DuckDB) — a PAIR-style contract: the warc_ingest oracle hash-checks
python↔SQL and the url_* oracles hash-check Spark↔SQL, so a drift in
any copy trips the gate.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from gmft_spark.kernel.html import extract_main_content
from gmft_spark.kernel.warc import build_warc, http_response, parse_warc

# ── deterministic URL synthesis (b = doc_id // 4 is the page identity,
#    v = doc_id % 4 picks one normalization-relevant mangle per variant:
#    v=0 default port + fragment, v=1 uppercased host, v=2 trailing
#    slash, v=3 utm_ tracking param) ─────────────────────────────────


def _url_for(doc_id: int) -> str:
    """Python copy of the URL formula (drives the WARC writer twin)."""
    b, v = doc_id // 4, doc_id % 4
    sub = "www." if b % 5 == 0 else ""
    sfx = ("com", "org", "co.uk")[b % 3]
    host = f"{sub}site{b % 7}.{sfx}"
    canon_q = f"?ref={b % 5}" if b % 2 == 0 else ""
    if v == 1:
        host = host.upper()
    port = ":443" if v == 0 else ""
    path = f"/docs/{b}" + ("/" if v == 2 else "")
    if v == 3:
        q = "?utm_source=feed" + ("&" + canon_q[1:] if canon_q else "")
    else:
        q = canon_q
    frag = "#sec2" if v == 0 else ""
    return f"https://{host}{port}{path}{q}{frag}"


def urls_from_documents(docs: DataFrame) -> DataFrame:
    """(doc_id, ...) → (doc_id, url): the Spark-expression copy of the
    URL formula — a narrow map, no UDF."""
    b = F.expr("doc_id div 4")
    v = (F.col("doc_id") % 4).cast("int")
    sfx = (
        F.when(b % 3 == 0, "com").when(b % 3 == 1, "org").otherwise("co.uk")
    )
    host_lc = F.concat(
        F.when(b % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.lit("site"),
        (b % 7).cast("string"),
        F.lit("."),
        sfx,
    )
    canon_q = F.when(
        b % 2 == 0, F.concat(F.lit("?ref="), (b % 5).cast("string"))
    ).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"),
        F.when(v == 1, F.upper(host_lc)).otherwise(host_lc),
        F.when(v == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/docs/"),
        b.cast("string"),
        F.when(v == 2, F.lit("/")).otherwise(F.lit("")),
        F.when(
            v == 3,
            F.concat(
                F.lit("?utm_source=feed"),
                F.when(
                    canon_q != "",
                    F.concat(F.lit("&"), F.substring(canon_q, 2, 1 << 30)),
                ).otherwise(F.lit("")),
            ),
        ).otherwise(canon_q),
        F.when(v == 0, F.lit("#sec2")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", url.alias("url"))


# DuckDB copy of the same formula (plus the normalized/registered
# expectations, derived INDEPENDENTLY of the Spark parser).
_URL_SQL_CTE = """
    WITH uu AS (
        SELECT doc_id, doc_id // 4 AS b, CAST(doc_id % 4 AS INT) AS v
        FROM documents
    ),
    ff AS (
        SELECT doc_id, b, v,
               (CASE WHEN b % 5 = 0 THEN 'www.' ELSE '' END)
                 || 'site' || CAST(b % 7 AS VARCHAR) || '.'
                 || (CASE b % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                     ELSE 'co.uk' END) AS host_lc,
               'site' || CAST(b % 7 AS VARCHAR) || '.'
                 || (CASE b % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                     ELSE 'co.uk' END) AS reg_domain,
               CASE WHEN b % 2 = 0
                    THEN '?ref=' || CAST(b % 5 AS VARCHAR)
                    ELSE '' END AS canon_q
        FROM uu
    ),
    urls AS (
        SELECT doc_id, b, v, host_lc, reg_domain, canon_q,
               'https://'
                 || (CASE WHEN v = 1 THEN upper(host_lc) ELSE host_lc END)
                 || (CASE WHEN v = 0 THEN ':443' ELSE '' END)
                 || '/docs/' || CAST(b AS VARCHAR)
                 || (CASE WHEN v = 2 THEN '/' ELSE '' END)
                 || (CASE WHEN v = 3 THEN '?utm_source=feed'
                         || (CASE WHEN canon_q <> ''
                             THEN '&' || substr(canon_q, 2)
                             ELSE '' END)
                     ELSE canon_q END)
                 || (CASE WHEN v = 0 THEN '#sec2' ELSE '' END) AS url,
               'https://' || host_lc || '/docs/' || CAST(b AS VARCHAR)
                 || canon_q AS url_norm
        FROM ff
    )
"""


# ── real URL operators (generic over any `url` column; no UDFs) ─────


def url_components(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds scheme/host/port/path/query/fragment columns (raw case)."""
    u = F.col(url_col)
    hostport = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1)
    return (
        df.withColumn(
            "scheme",
            F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)),
        )
        .withColumn("host", F.regexp_extract(hostport, r"^([^:]*)", 1))
        .withColumn("port", F.regexp_extract(hostport, r":(\d+)$", 1))
        .withColumn(
            "path",
            F.regexp_extract(
                u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1
            ),
        )
        .withColumn("query", F.regexp_extract(u, r"\?([^#]*)", 1))
        .withColumn("fragment", F.regexp_extract(u, r"#(.*)$", 1))
    )


def normalize_url(url: Column) -> Column:
    """Canonical form: lowercase scheme+host, default port stripped,
    one trailing slash stripped (root '/' kept), utm_* params dropped,
    remaining params kept in order, fragment dropped."""
    scheme = F.lower(
        F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    hostport = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1
    )
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    keep_port = (
        (port != "")
        & ~((scheme == "https") & (port == "443"))
        & ~((scheme == "http") & (port == "80"))
    )
    path = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(
        (path != "/") & path.endswith("/"),
        F.regexp_replace(path, r"/$", ""),
    ).otherwise(path)
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.filter(
        F.split(q, "&"),
        lambda t: (t != "") & ~t.startswith("utm_"),
    )
    norm_q = F.when(
        F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
    ).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        norm_q,
    )


# documented mini public-suffix rule: multi-label suffixes this corpus
# can produce; a production deployment swaps in the full PSL table as a
# broadcast join instead of a literal list
_MULTI_SUFFIXES = ("co.uk",)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a lowercase host."""
    h = F.lower(host)
    expr = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    for sfx in _MULTI_SUFFIXES:
        pat = r"([^.]+\." + sfx.replace(".", r"\.") + r")$"
        expr = F.when(
            h.endswith("." + sfx), F.regexp_extract(h, pat, 1)
        ).otherwise(expr)
    return expr


# ── WARC synthesis + ingestion pipeline ─────────────────────────────


def _page_html(doc_id: int, text: str) -> str:
    """Deterministic page template around a document's text — the SQL
    twin in WARC_INGEST_SQL re-derives title/main/dropped from it."""
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        "<script>var t=1;</script></head><body>"
        '<nav class="menu"><a href="/">Home</a></nav>'
        f"<article><h1>Report {doc_id}</h1>"
        f"<p>{text} end of article body.</p></article>"
        '<footer class="footer">Footer note</footer></body></html>'
    )


def warc_files_from_documents(
    spark: SparkSession, sf_dir: str, n_files: int = 8
) -> DataFrame:
    """documents → (warc_id, payload, n_docs): real WARC file bytes
    (gzip members, warcinfo + request + response records) built by the
    writer twin, ``n_files`` archives via doc_id % n_files."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs.withColumn(
        "warc_id", (F.col("doc_id") % n_files).cast("int")
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs: List[Tuple[str, bytes]] = [
            (_url_for(int(d)), _page_html(int(d), t or "").encode("utf-8"))
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        return pd.DataFrame(
            [
                {
                    "warc_id": int(pdf["warc_id"].iloc[0]),
                    "payload": build_warc(recs),
                    "n_docs": len(recs),
                }
            ]
        )

    return docs.groupBy("warc_id").applyInPandas(
        build, schema="warc_id int, payload binary, n_docs int"
    )


WARC_DOC_FIELDS = [
    StructField("url", StringType()),
    StructField("http_status", IntegerType()),
    StructField("mime", StringType()),
    StructField("title", StringType()),
    StructField("main_text", StringType()),
    StructField("n_dropped_chars", IntegerType()),
    StructField("status", StringType()),
]

WARC_DOC_SCHEMA = StructType(WARC_DOC_FIELDS)


def _pdf_main_text(body: bytes) -> str:
    """Crawled-PDF text: the from-scratch parser's reading-order words
    per page, pdfium line-break inference (kernel/text.text_with_breaks),
    pages joined with blank lines."""
    import numpy as np

    from gmft_spark.kernel.text import text_with_breaks
    from gmft_spark.sources.pdfparse import ParsedPDF

    doc = ParsedPDF(body)
    if len(doc) == 0:  # same contract as the payload pipeline:
        raise ValueError("corrupt payload: no pages")
    pages = []
    for p in range(len(doc)):
        words = doc.page_words(p)
        boxes = np.array([w[:4] for w in words], dtype=np.float64).reshape(
            -1, 4
        )
        pages.append(text_with_breaks(boxes, [w[4] for w in words]))
    return "\n\n".join(pages)


def extract_warc_documents(
    warc_files: DataFrame, src_col: Optional[str] = None
) -> DataFrame:
    """(.., payload) → one row per response record, routed by payload
    type: HTML responses get the boilerplate-strip extractor, PDF
    responses (``application/pdf`` or a ``%PDF`` magic) get the real
    byte-stream parser's reading-order text; other mimes become
    ``status`` 'skipped: ...' rows so accounting stays exact. A
    malformed archive is CONTAINED as one ``status`` 'error: ...' row
    and a corrupt PDF inside a good archive as one per-record error row
    (the job keeps running; lineage counts both) — the same error-row
    contract as the PDF payload pipeline. Pass ``src_col`` to carry a
    source column (e.g. the archive file path) through to every output
    row. Narrow map — archives parse where they were scanned."""
    cols = ["payload"] + ([src_col] if src_col else [])
    schema = StructType(
        ([StructField(src_col, StringType())] if src_col else [])
        + WARC_DOC_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            srcs = batch[src_col] if src_col else [None] * len(batch)
            for payload, src in zip(batch["payload"], srcs):
                base = {src_col: src} if src_col else {}
                empty = {
                    "url": None,
                    "http_status": None,
                    "mime": None,
                    "title": None,
                    "main_text": None,
                    "n_dropped_chars": None,
                }
                try:
                    recs = parse_warc(bytes(payload))
                except (ValueError, KeyError) as e:
                    rows.append({**base, **empty, "status": f"error: {e}"})
                    continue
                for rec in recs:
                    if rec.warc_type == "conversion":
                        # WET shape: the text was already extracted by
                        # the crawler; the record block IS the text
                        rows.append(
                            {
                                **base,
                                "url": rec.target_uri,
                                "http_status": None,
                                "mime": rec.headers.get(
                                    "content-type", "text/plain"
                                ),
                                "title": None,
                                "main_text": rec.block.decode(
                                    "utf-8", "replace"
                                ),
                                "n_dropped_chars": 0,
                                "status": "ok",
                            }
                        )
                        continue
                    if rec.warc_type != "response":
                        continue
                    try:
                        status, hdrs, body = http_response(rec.block)
                    except ValueError as e:
                        # a garbled HTTP block is ONE contained error
                        # row, not a task failure (same per-record
                        # contract as the PDF branch below)
                        rows.append(
                            {
                                **base,
                                **empty,
                                "url": rec.target_uri or None,
                                "status": f"error: {e}",
                            }
                        )
                        continue
                    mime = hdrs.get("content-type", "")
                    row = {
                        **base,
                        "url": rec.target_uri,
                        "http_status": int(status),
                        "mime": mime,
                        "n_dropped_chars": 0,
                        "status": "ok",
                    }
                    mime_l = mime.split(";")[0].strip().lower()
                    if mime_l == "application/pdf" or body[:5] == b"%PDF-":
                        try:
                            row["title"] = None
                            row["main_text"] = _pdf_main_text(body)
                        except Exception as e:
                            row.update(
                                title=None,
                                main_text=None,
                                n_dropped_chars=None,
                                status=f"error: unparseable PDF "
                                f"({type(e).__name__})",
                            )
                    elif mime_l in ("", "text/html", "application/xhtml+xml"):
                        c = extract_main_content(
                            body.decode("utf-8", "replace")
                        )
                        row["title"] = c.title
                        row["main_text"] = c.main_text
                        row["n_dropped_chars"] = int(c.n_dropped_chars)
                    elif mime_l == "text/plain":
                        # robots.txt, licenses, raw text pages: the body
                        # IS the text
                        row["title"] = None
                        row["main_text"] = body.decode("utf-8", "replace")
                    else:
                        row.update(
                            title=None,
                            main_text=None,
                            n_dropped_chars=None,
                            status=f"skipped: {mime_l}",
                        )
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return warc_files.select(*cols).mapInPandas(run, schema=schema)


def dedup_by_normalized_url(
    df: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Keep ONE row per normalized URL (crawls re-fetch the same page
    under utm/case/slash/port variants). Winner = smallest md5 of the
    raw url, compared as the RAW HEX SUBSTRING (string order equals
    big-endian numeric order; never the lower-64 as double). Adds
    ``url_norm``. Shuffles once on url_norm — at 100 TB the window is
    per-normalized-url (tiny groups), not global."""
    from pyspark.sql import Window

    norm = df.withColumn("url_norm", normalize_url(F.col(url_col)))
    w = Window.partitionBy("url_norm").orderBy(
        F.substring(F.md5(F.col(url_col)), 17, 16), F.col(url_col)
    )
    return (
        norm.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def cap_per_domain(
    df: DataFrame,
    max_per_domain: int,
    url_col: str = "url_norm",
    rank_col: Optional[str] = None,
) -> DataFrame:
    """Keep at most ``max_per_domain`` pages per registered domain — the
    standard crawl-corpus anti-spam / diversity cap. Deterministic,
    order-free winner set: rank by md5-hex of the normalized url within
    the domain. Adds ``domain``. One shuffle on the domain key; a
    pathologically hot domain is bounded by the cap itself (ranks
    beyond K are dropped at the first aggregation)."""
    from pyspark.sql import Window

    host = F.lower(
        F.regexp_extract(
            F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)", 1
        )
    )
    dom = df.withColumn("domain", registered_domain(host))
    w = Window.partitionBy("domain").orderBy(
        F.substring(F.md5(F.col(url_col)), 17, 16), F.col(url_col)
    )
    out = dom.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= max_per_domain
    )
    if rank_col:
        return out.withColumnRenamed("_rk", rank_col)
    return out.drop("_rk")


# ── gate queries + DuckDB twins ─────────────────────────────────────


def warc_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full archive roundtrip: documents → HTML template → WARC writer
    twin → real reader → boilerplate strip; doc identity recovered
    from the page title for stable ordering."""
    out = extract_warc_documents(
        warc_files_from_documents(spark, sf_dir)
    )
    return out.select(
        F.regexp_extract("title", r"Doc (\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        "url",
        "http_status",
        "mime",
        "title",
        "main_text",
        "n_dropped_chars",
    ).orderBy("doc_id")


WARC_INGEST_SQL = _URL_SQL_CTE + """,
    built AS (
        SELECT d.doc_id, u.url,
               200 AS http_status,
               'text/html; charset=utf-8' AS mime,
               'Doc ' || CAST(d.doc_id AS VARCHAR) AS title,
               'Report ' || CAST(d.doc_id AS VARCHAR) || ' '
                 || trim(regexp_replace(d.text, '\\s+', ' ', 'g'))
                 || ' end of article body.' AS main_text
        FROM documents d JOIN urls u USING (doc_id)
    )
    SELECT doc_id, url, http_status, mime, title, main_text,
           CAST(length('Doc ' || CAST(doc_id AS VARCHAR) || ' Home ')
                + length(' Footer note') AS INT) AS n_dropped_chars
    FROM built
    ORDER BY doc_id
"""


def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization collapses each page's 4 crawl variants (port +
    fragment, host case, trailing slash, utm param) onto one canonical
    URL; the oracle derives the expected canonical form from the synth
    formula — independently of the parser under test."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = urls_from_documents(docs)
    norm = urls.withColumn("url_norm", normalize_url(F.col("url")))
    return (
        norm.groupBy("url_norm")
        .agg(
            F.count("*").alias("n_variants"),
            F.countDistinct("url").alias("n_raw"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("url_norm")
    )


URL_NORMALIZE_DEDUP_SQL = _URL_SQL_CTE + """
    SELECT url_norm,
           CAST(count(*) AS BIGINT) AS n_variants,
           CAST(count(DISTINCT url) AS BIGINT) AS n_raw,
           min(doc_id) AS first_doc
    FROM urls
    GROUP BY url_norm
    ORDER BY url_norm
"""


def url_domain_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain aggregation (the domain-level curation grain:
    caps, blocklists, mixing all key on it): component parse → suffix
    rule → counts per pay-level domain."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = url_components(urls_from_documents(docs))
    dom = parts.withColumn(
        "domain", registered_domain(F.col("host"))
    ).withColumn("host_lc", F.lower(F.col("host")))
    return (
        dom.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("host_lc").alias("n_hosts"),
            F.countDistinct("url").alias("n_urls"),
        )
        .orderBy("domain")
    )


URL_DOMAIN_CENSUS_SQL = _URL_SQL_CTE + """
    SELECT reg_domain AS domain,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT host_lc) AS BIGINT) AS n_hosts,
           CAST(count(DISTINCT url) AS BIGINT) AS n_urls
    FROM urls
    GROUP BY reg_domain
    ORDER BY reg_domain
"""


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    key_col: str = "domain",
) -> DataFrame:
    """Robots-exclusion decision per page (RFC 9309, kernel/robots.py):
    ``urls`` (needs the ``key_col`` column) is broadcast-joined with
    the (key_col, robots_txt) table — robots corpora are tiny next to
    page corpora — and each page's path is evaluated in a narrow map.
    RFC scope is per ORIGIN, so production callers key on the HOST
    (run_web_pipeline does); the key is a parameter because synthetic
    oracles key coarser. Adds ``allowed`` (boolean) and
    ``robots_match_len`` (octet length of the winning rule; 0 = no
    rule matched). Missing robots = allowed."""
    from gmft_spark.kernel.robots import parse_robots, robots_decision

    joined = urls.join(F.broadcast(robots), key_col, "left")
    out_schema = StructType(
        list(joined.schema.fields)
        + [
            StructField("allowed", BooleanType()),
            StructField("robots_match_len", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for batch in batches:
            allowed = []
            mlen = []
            for url, txt in zip(batch[url_col], batch["robots_txt"]):
                if txt is None:
                    allowed.append(True)
                    mlen.append(0)
                    continue
                rules = cache.get(txt)
                if rules is None:
                    rules = cache[txt] = parse_robots(txt, agent)
                rest = (url or "").split("://", 1)[-1]
                path = "/" + rest.partition("/")[2]
                ok, ln = robots_decision(rules, path)
                allowed.append(bool(ok))
                mlen.append(int(ln))
            batch = batch.copy()
            batch["allowed"] = allowed
            batch["robots_match_len"] = mlen
            yield batch

    return joined.mapInPandas(run, schema=out_schema)


def url_domain_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The anti-spam diversity cap end-to-end through the REAL
    operators: parse+normalize each crawl variant, collapse to one row
    per page (dedup_by_normalized_url), keep the top-3 pages per
    registered domain by md5-hex rank. The oracle re-derives winners
    and ranks from the synth formula alone."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    urls = urls_from_documents(docs)
    one = dedup_by_normalized_url(urls)
    capped = cap_per_domain(one, 3, rank_col="rk")
    return capped.select("domain", "url_norm", "rk").orderBy(
        "domain", "rk"
    )


URL_DOMAIN_CAPS_SQL = _URL_SQL_CTE + """,
    ranked AS (
        SELECT reg_domain AS domain, url_norm,
               row_number() OVER (
                   PARTITION BY reg_domain
                   ORDER BY substr(md5(url_norm), 17, 16), url_norm
               ) AS rk
        FROM (SELECT DISTINCT reg_domain, url_norm FROM urls)
    )
    SELECT domain, url_norm, CAST(rk AS INT) AS rk
    FROM ranked
    WHERE rk <= 3
    ORDER BY domain, rk
"""


def url_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 decisions end-to-end through the REAL parser+matcher:
    per registered domain a deterministic robots.txt is built (a
    badbot deny-all group the crawler must NOT pick, then a ``*``
    group with ``Disallow: /docs/<j>`` and the more specific
    ``Allow: /docs/<j>5`` override, j = the domain's site digit); the
    kernel parses the text and evaluates each deduped page path. The
    oracle re-derives allow/deny and the winning-rule length from the
    synth formula alone — a drift in group selection, longest-match
    precedence, or the allow override flips the hash."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = dedup_by_normalized_url(urls_from_documents(docs))
    host = F.lower(
        F.regexp_extract(
            F.col("url_norm"), r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/:?#]+)", 1
        )
    )
    pages = one.withColumn("domain", registered_domain(host))
    j = F.regexp_extract(F.col("domain"), r"site(\d+)", 1)
    robots = (
        pages.select("domain").distinct().select(
            "domain",
            F.concat(
                F.lit("User-agent: badbot\nDisallow: /\n\n"),
                F.lit("User-agent: *\nDisallow: /docs/"),
                j,
                F.lit("\nAllow: /docs/"),
                j,
                F.lit("5\n"),
            ).alias("robots_txt"),
        )
    )
    out = robots_filter(pages, robots, agent="gmftbot", url_col="url_norm")
    return out.select(
        "url_norm", "domain", "allowed", "robots_match_len"
    ).orderBy("url_norm")


# Query-suffix assumption (load-bearing for parity): robots_filter
# evaluates the path INCLUDING any query string ('/docs/1?ref=1'), while
# this oracle derives decisions from the bare '/docs/<b>' path. The two
# agree only because every synth allow/deny prefix extends past '/docs/'
# solely with DIGIT characters — a '?' can never equal a digit, so a
# query suffix can never complete a longer prefix match. Any new rule
# pattern whose prefix could continue with '?' (or any char a query
# string can start with) must add the query to the SQL-side path too.
URL_ROBOTS_FILTER_SQL = _URL_SQL_CTE + """,
    pages AS (
        SELECT DISTINCT url_norm, reg_domain AS domain, b
        FROM urls
    ),
    decided AS (
        SELECT url_norm, domain,
               '/docs/' || CAST(b AS VARCHAR) AS path,
               '/docs/' || CAST(b % 7 AS VARCHAR) AS deny_pref,
               '/docs/' || CAST(b % 7 AS VARCHAR) || '5' AS allow_pref
        FROM pages
    )
    SELECT url_norm, domain,
           CASE WHEN substr(path, 1, length(allow_pref)) = allow_pref
                THEN true
                WHEN substr(path, 1, length(deny_pref)) = deny_pref
                THEN false
                ELSE true END AS allowed,
           CAST(CASE WHEN substr(path, 1, length(allow_pref)) = allow_pref
                THEN length(allow_pref)
                WHEN substr(path, 1, length(deny_pref)) = deny_pref
                THEN length(deny_pref)
                ELSE 0 END AS INT) AS robots_match_len
    FROM decided
    ORDER BY url_norm
"""


ARCHIVE_DOC_FIELDS = [
    StructField("name", StringType()),
    StructField("mime", StringType()),
    StructField("title", StringType()),
    StructField("main_text", StringType()),
    StructField("n_dropped_chars", IntegerType()),
    StructField("status", StringType()),
]


def extract_archive_documents(
    archives: DataFrame,
    src_col: Optional[str] = None,
    zip_password: Optional[str] = None,
) -> DataFrame:
    """Bulk-archive ingestion (The-Stack-shaped sources): (.., payload)
    rows holding zip / tar / tar.gz archives → one row per member
    file, routed by extension — .html/.htm through the boilerplate
    strip, .txt/.md as raw text, .pdf through the real byte-stream
    parser; other extensions become 'skipped: ...' rows and a corrupt
    archive is one contained error row. Narrow map, same contract as
    ``extract_warc_documents``. ``zip_password`` decrypts ZipCrypto
    members (kernel/archives.py); an encrypted archive without (or
    with the wrong) password fails closed as its error row."""
    from gmft_spark.kernel.archives import parse_tar, parse_zip

    cols = ["payload"] + ([src_col] if src_col else [])
    schema = StructType(
        ([StructField(src_col, StringType())] if src_col else [])
        + ARCHIVE_DOC_FIELDS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            srcs = batch[src_col] if src_col else [None] * len(batch)
            for payload, src in zip(batch["payload"], srcs):
                base = {src_col: src} if src_col else {}
                data = bytes(payload)
                empty = {
                    "name": None,
                    "mime": None,
                    "title": None,
                    "main_text": None,
                    "n_dropped_chars": None,
                }
                try:
                    if data[:4] == b"PK\x03\x04" or data[:4] == b"PK\x05\x06":
                        members = parse_zip(data, password=zip_password)
                    else:
                        members = parse_tar(data)
                except (ValueError, KeyError) as e:
                    rows.append({**base, **empty, "status": f"error: {e}"})
                    continue
                for name, body in members:
                    low = name.lower()
                    row = {
                        **base,
                        "name": name,
                        "n_dropped_chars": 0,
                        "status": "ok",
                    }
                    try:
                        if low.endswith((".html", ".htm")):
                            c = extract_main_content(
                                body.decode("utf-8", "replace")
                            )
                            row.update(
                                mime="text/html",
                                title=c.title,
                                main_text=c.main_text,
                                n_dropped_chars=int(c.n_dropped_chars),
                            )
                        elif low.endswith((".txt", ".md")):
                            row.update(
                                mime="text/plain",
                                title=None,
                                main_text=body.decode("utf-8", "replace"),
                            )
                        elif low.endswith(".pdf"):
                            row.update(
                                mime="application/pdf",
                                title=None,
                                main_text=_pdf_main_text(body),
                            )
                        else:
                            row.update(
                                mime=None,
                                title=None,
                                main_text=None,
                                n_dropped_chars=None,
                                status=f"skipped: {low.rsplit('.', 1)[-1]}",
                            )
                    except Exception as e:
                        row.update(
                            mime=None,
                            title=None,
                            main_text=None,
                            n_dropped_chars=None,
                            status=f"error: unparseable member "
                            f"({type(e).__name__})",
                        )
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    return archives.select(*cols).mapInPandas(run, schema=schema)


def archive_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk-archive roundtrip: documents ride the HTML template into
    REAL zip (even archives) and tar.gz (odd archives) containers —
    plus a raw-text note member for every doc_id % 5 == 0 — then back
    through the real readers and extension routing. The oracle
    re-derives every member row from the formulas."""
    from gmft_spark.kernel.archives import build_tar, build_zip

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs.withColumn("arc_id", (F.col("doc_id") % 8).cast("int"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        members = []
        for d, t in zip(pdf["doc_id"], pdf["text"]):
            d = int(d)
            members.append(
                (f"docs/doc{d}.html", _page_html(d, t or "").encode())
            )
            if d % 5 == 0:
                members.append(
                    (f"notes/n{d}.txt", f"note {d} body".encode())
                )
        arc = int(pdf["arc_id"].iloc[0])
        payload = (
            build_zip(members) if arc % 2 == 0 else build_tar(members, gz=True)
        )
        return pd.DataFrame([{"arc_id": arc, "payload": payload}])

    archives = docs.groupBy("arc_id").applyInPandas(
        build, schema="arc_id int, payload binary"
    )
    out = extract_archive_documents(archives)
    return out.select(
        "name", "mime", "title", "main_text", "n_dropped_chars"
    ).orderBy("name")


ARCHIVE_INGEST_SQL = """
    WITH html_rows AS (
        SELECT 'docs/doc' || CAST(doc_id AS VARCHAR) || '.html' AS name,
               'text/html' AS mime,
               'Doc ' || CAST(doc_id AS VARCHAR) AS title,
               'Report ' || CAST(doc_id AS VARCHAR) || ' '
                 || trim(regexp_replace(text, '\\s+', ' ', 'g'))
                 || ' end of article body.' AS main_text,
               CAST(length('Doc ' || CAST(doc_id AS VARCHAR) || ' Home ')
                    + length(' Footer note') AS INT) AS n_dropped_chars
        FROM documents
    ),
    txt_rows AS (
        SELECT 'notes/n' || CAST(doc_id AS VARCHAR) || '.txt' AS name,
               'text/plain' AS mime,
               CAST(NULL AS VARCHAR) AS title,
               'note ' || CAST(doc_id AS VARCHAR) || ' body' AS main_text,
               0 AS n_dropped_chars
        FROM documents WHERE doc_id % 5 = 0
    )
    SELECT * FROM html_rows
    UNION ALL
    SELECT * FROM txt_rows
    ORDER BY name
"""


def warc_cdx_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX random-access contract: archives are built with a member
    index (kernel/warc.build_warc_indexed), then EVERY page is
    re-fetched through its (offset, length) slice alone — the range-
    request pattern crawl consumers use against a 100 TB archive set —
    parsed, and identity-checked against the index. The oracle derives
    the SURT urlkeys (reversed host labels, port/fragment dropped,
    lowercased path+query) and URLs from the synth formula; a slicing
    or surt drift breaks the hash, a mis-addressed member zeroes
    ``fetched_ok``."""
    from gmft_spark.kernel.warc import build_warc_indexed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs = docs.withColumn("warc_id", (F.col("doc_id") % 8).cast("int"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        recs = [
            (_url_for(int(d)), _page_html(int(d), t or "").encode("utf-8"))
            for d, t in zip(pdf["doc_id"], pdf["text"])
        ]
        blob, entries = build_warc_indexed(recs)
        rows = []
        for e in entries:
            sliced = parse_warc(blob[e["offset"] : e["offset"] + e["length"]])
            ok = (
                len(sliced) == 1
                and sliced[0].warc_type == "response"
                and sliced[0].target_uri == e["url"]
            )
            rows.append(
                {
                    "urlkey": e["urlkey"],
                    "url": e["url"],
                    "mime": e["mime"],
                    "fetched_ok": int(ok),
                }
            )
        return pd.DataFrame(rows)

    schema = "urlkey string, url string, mime string, fetched_ok int"
    return (
        docs.groupBy("warc_id")
        .applyInPandas(build, schema=schema)
        .orderBy("url")
    )


WARC_CDX_LOOKUP_SQL = _URL_SQL_CTE + """,
    keyed AS (
        SELECT url,
               (CASE WHEN b % 3 = 2 THEN 'uk,co' ELSE
                    (CASE b % 3 WHEN 0 THEN 'com' ELSE 'org' END) END)
                 || ',site' || CAST(b % 7 AS VARCHAR)
                 || (CASE WHEN b % 5 = 0 THEN ',www' ELSE '' END)
                 || ')/docs/' || CAST(b AS VARCHAR)
                 || (CASE WHEN v = 2 THEN '/' ELSE '' END)
                 || (CASE WHEN v = 3 THEN '?utm_source=feed'
                         || (CASE WHEN canon_q <> ''
                             THEN '&' || substr(canon_q, 2)
                             ELSE '' END)
                     ELSE canon_q END)
                 AS urlkey
        FROM urls
    )
    SELECT urlkey, url, 'text/html' AS mime, 1 AS fetched_ok
    FROM keyed
    ORDER BY url
"""


QUERIES = {
    "warc_ingest_pipeline": (warc_ingest_pipeline, WARC_INGEST_SQL),
    "url_normalize_dedup": (url_normalize_dedup, URL_NORMALIZE_DEDUP_SQL),
    "url_domain_census": (url_domain_census, URL_DOMAIN_CENSUS_SQL),
    "url_domain_caps": (url_domain_caps, URL_DOMAIN_CAPS_SQL),
    "url_robots_filter": (url_robots_filter, URL_ROBOTS_FILTER_SQL),
    "warc_cdx_lookup": (warc_cdx_lookup, WARC_CDX_LOOKUP_SQL),
    "archive_ingest_pipeline": (archive_ingest_pipeline, ARCHIVE_INGEST_SQL),
}

# ── incremental corpus refresh (round 5) ─────────────────────────────
# The continuous-crawl composition shared by run_web_ingest and
# run_web_pipeline: a snapshot table TBL holds the landed corpus and a
# sibling table TBL_bands holds its MinHash band index
# (dedup.minhash_band_rows_frame keyed on the url column), so each new
# batch near-dups against the STORED index — no corpus self-pairs, no
# corpus text re-scan, cost O(|new| * bands) — and commits survivors
# exactly-once (anti-join before upsert: a replayed batch is a genuine
# no-op with NO new snapshot).


def _bands_table(table_dir: str) -> str:
    return table_dir.rstrip("/") + "_bands"


def corpus_seen_filter(
    spark: SparkSession,
    docs: DataFrame,
    table_dir: str,
    url_col: str = "url_norm",
    text_col: str = "main_text",
    table_url_col: "str | None" = None,
) -> Tuple[DataFrame, int, int]:
    """Drop rows the landed corpus already holds: exact-url anti-join
    vs the snapshot table, then a (band, bucket) near-dup join vs the
    stored band index. Returns (filtered, n_url_dropped,
    n_near_dropped); a missing table passes everything through.
    ``table_url_col`` names the table's url column when it differs
    from the batch's (run_web_pipeline keys its corpus on conv_id)."""
    from gmft_spark.operators.dedup import minhash_band_rows_frame
    from gmft_spark.plans import snapshots as S

    n_url = n_near = 0
    if S.current_snapshot_id(table_dir) is not None:
        have = S.read_table(spark, table_dir).select(
            F.col(table_url_col or url_col).alias("_have_url")
        )
        before = docs.count()
        docs = docs.join(
            have, docs[url_col] == F.col("_have_url"), "left_anti"
        ).persist()
        n_url = before - docs.count()
    bands_tbl = _bands_table(table_dir)
    if S.current_snapshot_id(bands_tbl) is not None:
        corpus_index = (
            S.read_table(spark, bands_tbl)
            .select("band", "bucket")
            .distinct()
        )
        new_bands = minhash_band_rows_frame(
            docs, id_col=url_col, text_col=text_col
        )
        dup_ids = (
            new_bands.join(corpus_index, ["band", "bucket"])
            .select(url_col)
            .distinct()
        )
        n_near = dup_ids.count()
        if n_near:
            docs = docs.join(dup_ids, url_col, "left_anti")
    return docs, n_url, n_near


def corpus_refresh_commit(
    spark: SparkSession,
    landed_ok: DataFrame,
    table_dir: str,
    url_col: str = "url_norm",
    text_col: str = "main_text",
) -> Tuple[Optional[int], int]:
    """Commit every landed row whose url the snapshot table does not
    hold yet, plus its band rows into the stored index. Returns
    (snapshot_id_or_None, n_new). The anti-join makes replays no-ops
    and recovers a crash between the parquet sink and the commit."""
    from gmft_spark.operators.dedup import minhash_band_rows_frame
    from gmft_spark.plans import snapshots as S

    if S.current_snapshot_id(table_dir) is not None:
        have = S.read_table(spark, table_dir).select(
            F.col(url_col).alias("_have_url")
        )
        to_commit = landed_ok.join(
            have, landed_ok[url_col] == F.col("_have_url"), "left_anti"
        )
    else:
        to_commit = landed_ok
    # a crash-then-rerun WITHOUT --resume can append the same page to
    # the parquet sink twice; the upsert's one-row-per-key cardinality
    # contract must still hold (the copies are identical rows, so any
    # survivor is correct)
    to_commit = to_commit.dropDuplicates([url_col]).persist()
    n_new = to_commit.count()
    if n_new == 0:
        to_commit.unpersist()
        return None, 0
    sid = S.commit_upsert(spark, to_commit, table_dir, key_cols=[url_col])
    bands = minhash_band_rows_frame(
        to_commit, id_col=url_col, text_col=text_col
    )
    if bands.limit(1).count() > 0:  # sub-shingle pages have no bands
        S.commit_upsert(
            spark, bands, _bands_table(table_dir), key_cols=[url_col, "band"]
        )
    to_commit.unpersist()
    return sid, n_new
