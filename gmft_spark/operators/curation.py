"""Corpus-curation operators beyond the per-document stats in textstats:
line-level boilerplate dedup, training-sequence packing, and PII
redaction. These are the remaining high-frequency stages of a web-scale
training-data pipeline (CCNet/RefinedWeb-style curation) and are
first-class here: each has a DuckDB oracle twin and a pinned plan shape.

Scale notes (100 TB framing):
- Line dedup aggregates line hashes once (shuffle keyed on the line —
  balanced by construction), but the *banned* set (doc-frequency >=
  threshold) is tiny by Zipf's law, so the removal join is a broadcast:
  the corpus itself is never shuffled a second time. Reassembly is one
  groupBy doc_id (bounded rows per doc).
- Sequence packing needs a global prefix sum; a naive ORDER BY window
  collapses to ONE partition at any scale. The implementation uses the
  classic two-level scan: coarse doc_id buckets -> per-bucket subtotals
  (tiny aggregate) -> cumulative bucket offsets (window over #buckets
  rows only) broadcast back -> per-bucket windows run in parallel.
- PII redaction is a pure narrow map (regexp_replace is JVM-side
  codegen); zero shuffles before the final ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

LINE_TOKENS = 3  # tokens per "line" (synthetic docs carry no newlines)
BAN_DF = 5  # lines appearing in >= this many docs are boilerplate
CTX_TOKENS = 256  # packing context length
PACK_BUCKET = 100  # doc_ids per prefix-sum bucket


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _lines_array():
    """array<string> of consecutive LINE_TOKENS-token chunks of the
    whitespace tokenization (last chunk may be short) — the single place
    that defines what a "line" is. Empty/whitespace-only text yields an
    EMPTY array: sequence(0, -1) is DESCENDING [0, -1], not empty (the
    CLAUDE.md gotcha), so the zero-line case is guarded explicitly."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_lines = F.expr(
        f"(size(filter(split(text, ' '), t -> t != '')) + {LINE_TOKENS - 1})"
        f" DIV {LINE_TOKENS}"
    )

    def _line(i):
        return F.array_join(
            F.slice(toks, i * LINE_TOKENS + 1, LINE_TOKENS), " "
        )

    return F.when(
        n_lines >= 1, F.transform(F.sequence(F.lit(0), n_lines - 1), _line)
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, line_no, line): exploded _lines_array. Built as an array
    expression on the scan — no shuffle to *form* lines."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.posexplode(_lines_array()).alias("line_no", "line")
    )


def dedup_lines_within_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-line removal (the within-page half of
    CCNet's paragraph dedup; corpus-level is ``dedup_lines_corpus``):
    keep only the FIRST occurrence of each line within a document,
    reassemble in order. Output per doc: line counts before/after and
    the md5 of the deduped text.

    Scale shape: entirely array expressions on the scan — a document's
    lines never leave their row, so this is a ZERO-shuffle narrow map at
    any corpus size (the output sort is the only exchange). The dedup
    rule is first-occurrence-wins via array_position (first match,
    1-based — identical semantics to DuckDB list_position). Docs with
    zero lines are absent from the output, matching the oracle (which
    groups over the lines CTE and so never sees them)."""
    d = _docs(spark, sf_dir)
    la = d.select("doc_id", _lines_array().alias("lines")).filter(
        F.size("lines") > 0
    )
    # the 2-param transform lambda receives the element INDEX — used
    # intentionally here (the CLAUDE.md gotcha is about accidental use)
    idx = F.transform(
        F.col("lines"), lambda x, i: F.struct(x.alias("line"), i.alias("i"))
    )
    kept = F.filter(
        idx,
        lambda s: F.array_position(F.col("lines"), s["line"]) == s["i"] + 1,
    )
    kept_text = F.array_join(F.transform(kept, lambda s: s["line"]), "\n")
    return la.select(
        "doc_id",
        F.size("lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(kept_text).alias("kept_hash"),
    ).orderBy("doc_id")


def dedup_lines_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-level line dedup: drop every line whose
    doc-frequency across the corpus is >= BAN_DF (boilerplate), keep the
    rest in document order. Output is per-doc: how many lines survived
    and the md5/length of the reassembled text.

    The banned set is aggregated once (one shuffle keyed on the line) and
    is tiny, so membership is a broadcast left join — the corpus never
    re-shuffles for the removal itself; reassembly groups by doc_id."""
    lines = _doc_lines(spark, sf_dir)
    banned = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= BAN_DF)
        .select("line", F.lit(1).alias("is_banned"))
    )
    flagged = lines.join(F.broadcast(banned), "line", "left").select(
        "doc_id",
        "line_no",
        "line",
        F.coalesce(F.col("is_banned"), F.lit(0)).alias("is_banned"),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.array_sort(
            F.collect_list(F.struct("line_no", "is_banned", "line"))
        ).alias("ordered"),
    )
    kept = F.filter(F.col("ordered"), lambda s: s["is_banned"] == 0)
    kept_text = F.array_join(
        F.transform(kept, lambda s: s["line"]), "\n"
    )
    return per_doc.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(kept_text).alias("kept_hash"),
        F.length(kept_text).cast("long").alias("kept_chars"),
    ).orderBy("doc_id")


_LINES_CTE = f"""
    WITH toks AS (
        SELECT doc_id, t.tok, t.idx
        FROM documents, LATERAL (
            SELECT unnest(list_filter(string_split(text, ' '),
                                      x -> x <> '')) AS tok,
                   generate_subscripts(list_filter(string_split(text, ' '),
                                       x -> x <> ''), 1) AS idx
        ) t
    ), lines AS (
        SELECT doc_id,
               CAST((idx - 1) // {LINE_TOKENS} AS BIGINT) AS line_no,
               string_agg(tok, ' ' ORDER BY idx) AS line
        FROM toks
        GROUP BY doc_id, (idx - 1) // {LINE_TOKENS}
    )
"""

DEDUP_LINES_SQL = (
    _LINES_CTE
    + f""",
    banned AS (
        SELECT line FROM lines
        GROUP BY line
        HAVING count(DISTINCT doc_id) >= {BAN_DF}
    )
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE b.line IS NULL) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(l.line, chr(10) ORDER BY l.line_no)
                            FILTER (WHERE b.line IS NULL), '')) AS kept_hash,
           CAST(length(coalesce(string_agg(l.line, chr(10) ORDER BY l.line_no)
                            FILTER (WHERE b.line IS NULL), '')) AS BIGINT)
               AS kept_chars
    FROM lines l LEFT JOIN banned b USING (line)
    GROUP BY l.doc_id
    ORDER BY l.doc_id
"""
)


DEDUP_LINES_WITHIN_SQL = (
    _LINES_CTE
    + """,
    firsts AS (
        SELECT doc_id, line_no, line,
               min(line_no) OVER (PARTITION BY doc_id, line) AS first_no
        FROM lines
    ),
    kept AS (SELECT doc_id, line_no, line FROM firsts WHERE line_no = first_no)
    SELECT l.doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(count(*) FILTER (WHERE k.line IS NOT NULL) AS BIGINT)
             AS n_kept,
           md5(string_agg(k.line, chr(10) ORDER BY l.line_no)
               FILTER (WHERE k.line IS NOT NULL)) AS kept_hash
    FROM lines l
    LEFT JOIN kept k ON k.doc_id = l.doc_id AND k.line_no = l.line_no
    GROUP BY l.doc_id
    ORDER BY l.doc_id
"""
)


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents in doc_id order are
    concatenated and cut into CTX_TOKENS-token training sequences; each
    doc is attributed to the sequence where it starts. Output is one row
    per sequence (doc span + token sum + docs packed).

    The prefix sum is the distributed two-level scan described in the
    module docstring — the only single-partition step touches one row
    per PACK_BUCKET docs, so it stays O(n / PACK_BUCKET) rows at any
    scale, and the per-doc windows parallelize across buckets."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr(f"doc_id DIV {PACK_BUCKET}").alias("bucket"),
        F.size(
            F.filter(F.split(F.col("text"), " "), lambda t: t != "")
        ).cast("long").alias("n_toks"),
    )
    bucket_offsets = (
        d.groupBy("bucket")
        .agg(F.sum("n_toks").alias("btoks"))
        .withColumn(
            "bucket_offset",
            F.coalesce(
                F.sum("btoks").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "bucket_offset")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = d.join(F.broadcast(bucket_offsets), "bucket").select(
        "doc_id",
        "n_toks",
        (
            F.col("bucket_offset")
            + F.coalesce(F.sum("n_toks").over(w), F.lit(0))
        ).alias("cum_before"),
    )
    return (
        cum.select(
            F.expr(f"cum_before DIV {CTX_TOKENS}").alias("seq_id"),
            "doc_id",
            "n_toks",
        )
        .groupBy("seq_id")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
            F.sum("n_toks").cast("long").alias("sum_tokens"),
        )
        .orderBy("seq_id")
    )


PACK_SEQUENCES_SQL = f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS BIGINT) AS n_toks
        FROM documents
    ), c AS (
        SELECT doc_id, n_toks,
               coalesce(sum(n_toks) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM t
    )
    SELECT CAST(cum_before // {CTX_TOKENS} AS BIGINT) AS seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc,
           CAST(sum(n_toks) AS BIGINT) AS sum_tokens
    FROM c
    GROUP BY cum_before // {CTX_TOKENS}
    ORDER BY seq_id
"""

# PII patterns: identical semantics under Java regex (Spark) and RE2
# (DuckDB) — character classes and bounded quantifiers only, no
# lookaround, no backreferences.
_EMAIL_RE = r"[a-z0-9.]+@[a-z]+\.com"
_PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii_col(text):
    """E-mail/phone spans → placeholder tokens; the reusable column
    core behind ``pii_redact`` (jobs apply it to any text column)."""
    return F.regexp_replace(
        F.regexp_replace(text, _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over synthesized contact text (an e-mail derived
    from c_name, a phone derived arithmetically from c_custkey — the
    sandbox customer table carries no comment/phone columns): count and
    redact e-mail / phone spans, emit the redacted hash. Narrow map,
    JVM-side regex — zero Python, zero shuffles before the ordering."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    k = F.col("c_custkey")
    phone = F.concat_ws(
        "-",
        (k % 90 + 10).cast("string"),
        ((k * 7) % 900 + 100).cast("string"),
        ((k * 13) % 900 + 100).cast("string"),
        ((k * 31) % 9000 + 1000).cast("string"),
    )
    text = F.concat(
        F.lower(F.col("c_mktsegment")),
        F.lit(" segment, reach me at "),
        F.lower(F.replace(F.col("c_name"), F.lit("#"), F.lit("."))),
        F.lit("@example.com or call "),
        phone,
    )
    t = c.select("c_custkey", text.alias("text"))
    redacted = redact_pii_col(F.col("text"))
    return t.select(
        "c_custkey",
        F.regexp_count(F.col("text"), F.lit(_EMAIL_RE))
        .cast("long")
        .alias("n_emails"),
        F.regexp_count(F.col("text"), F.lit(_PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
        F.length(redacted).cast("long").alias("redacted_chars"),
    ).orderBy("c_custkey")


PII_REDACT_SQL = f"""
    WITH t AS (
        SELECT c_custkey,
               lower(c_mktsegment) || ' segment, reach me at '
                   || lower(replace(c_name, '#', '.'))
                   || '@example.com or call '
                   || CAST(c_custkey % 90 + 10 AS VARCHAR) || '-'
                   || CAST((c_custkey * 7) % 900 + 100 AS VARCHAR) || '-'
                   || CAST((c_custkey * 13) % 900 + 100 AS VARCHAR) || '-'
                   || CAST((c_custkey * 31) % 9000 + 1000 AS VARCHAR) AS text
        FROM customer
    ), r AS (
        SELECT c_custkey, text,
               regexp_replace(regexp_replace(text,
                   '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM t
    )
    SELECT c_custkey,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT)
               AS n_phones,
           md5(redacted) AS redacted_hash,
           CAST(length(redacted) AS BIGINT) AS redacted_chars
    FROM r
    ORDER BY c_custkey
"""


def mix_sources_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing — the per-source sampling-weight step every training
    corpus goes through (web 2 epochs, books 1, low-quality crawl 0.25,
    ...). Each source gets a mixing weight w; a document yields
    ``floor(w)`` guaranteed copies plus one more with probability
    ``w - floor(w)``, decided by a STABLE hash fraction of the doc id
    (md5 lower-64, the same portable trick as the train/val/test split) —
    so the mix is reproducible across runs/engines/partitionings, adding
    documents never re-decides existing ones, and a resumed job redraws
    the identical sample with no sampling state to checkpoint.

    Weights here are a 4-tier demo spec keyed on the source index
    (2.0 / 1.0 / 0.5 / 0.25 — upsampling AND downsampling both exercised).

    Scale shape: a narrow map on the scan — the weight is a pure
    expression, the copy fan-out is an in-row ``explode(sequence(...))``
    (upsampled rows never pass through the driver or a shuffle; the only
    exchange is the determinism orderBy, absent in production)."""
    d = _docs(spark, sf_dir)
    from gmft_spark.operators.textstats import _KMV_SPACE, _md5_lower64

    tier = (F.substring("source", 4, 2).cast("int") % 4).alias("tier")
    base = (
        F.when(F.col("tier") == 0, 2).when(F.col("tier") == 1, 1).otherwise(0)
    )
    rem = (
        F.when(F.col("tier") == 2, 0.5)
        .when(F.col("tier") == 3, 0.25)
        .otherwise(0.0)
    )
    weight = (
        F.when(F.col("tier") == 0, 2.0)
        .when(F.col("tier") == 1, 1.0)
        .when(F.col("tier") == 2, 0.5)
        .otherwise(0.25)
    )
    frac = _md5_lower64(
        F.concat(F.col("doc_id").cast("string"), F.lit("|mix"))
    ) / F.lit(_KMV_SPACE)
    n_copies = base + F.when(frac < rem, 1).otherwise(0)
    return (
        d.select("doc_id", "source", tier)
        .withColumn("n_copies", n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            weight.alias("weight"),
            F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1)).alias(
                "copy"
            ),
        )
        .select(
            "doc_id", "source", "weight", F.col("copy").cast("int").alias("copy")
        )
        .orderBy("doc_id", "copy")
    )


def _mix_sql() -> str:
    from gmft_spark.operators.textstats import _KMV_SPACE

    return f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(substr(source, 4, 2) AS INT) % 4 AS tier,
               CAST(md5_number_lower(CAST(doc_id AS VARCHAR) || '|mix')
                    AS DOUBLE) / {_KMV_SPACE!r} AS frac
        FROM documents
    ),
    c AS (
        SELECT doc_id, source,
               CASE tier WHEN 0 THEN 2.0::DOUBLE WHEN 1 THEN 1.0::DOUBLE
                         WHEN 2 THEN 0.5::DOUBLE
                         ELSE 0.25::DOUBLE END AS weight,
               (CASE tier WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END)
               + (CASE WHEN frac < (CASE tier WHEN 2 THEN 0.5::DOUBLE
                                              WHEN 3 THEN 0.25::DOUBLE
                                              ELSE 0.0::DOUBLE END)
                       THEN 1 ELSE 0 END) AS n_copies
        FROM d
    )
    SELECT doc_id, source, weight, CAST(g.k AS INT) AS copy
    FROM c, (VALUES (0), (1)) AS g(k)
    WHERE g.k < c.n_copies
    ORDER BY doc_id, copy
"""


MIX_SQL = _mix_sql()


BPE_MERGES = 8  # learned merge rules
# Symbol sequences are encoded as individually-wrapped tokens
# ("|a||b||c|"): a merge is then ONE literal replace of "|a||b|" with
# "|ab|" — wrapped tokens never share characters, so leftmost
# non-overlapping literal replace (identical semantics in Spark and
# DuckDB, verified incl. the a==b run case) IS the greedy BPE merge
# pass. Tokens never contain '|' (guarded by filter).


def _bpe_wrap(tok_col):
    return F.concat(
        F.lit("|"), F.array_join(F.split(tok_col, ""), "||"), F.lit("|")
    )


def _bpe_pairs(words: DataFrame) -> DataFrame:
    """(a, b, c): adjacent-symbol pair counts weighted by word-type count."""
    toks = F.split(
        F.expr("substring(seq, 2, length(seq) - 2)"), "\\|\\|"
    ).alias("tk")
    # filter BEFORE sequence(): F.sequence(1, 0) yields a DESCENDING
    # [1, 0] (not empty), and element_at(tk, 0) then errors
    idx = words.select(toks, "cnt").filter(F.size("tk") >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("tk"), i).alias("a"),
                    F.element_at(F.col("tk"), i + 1).alias("b"),
                ),
            )
        ).alias("p"),
        "cnt",
    )
    return idx.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("c")
    )


# Gate-side corpus sampling for the BPE pair: the trainer collapses the
# corpus to (word-type, count) and every round is O(vocab), so the
# REGISTERED gate queries train/encode over every 4th document (the
# QUERIES entries below pass doc_mod explicitly, and the DuckDB twin
# samples identically — the unrolled 8-round SQL pays per word TYPE, and
# this pair was ~25s of the gate budget at full corpus). The public API
# default stays doc_mod=1: library callers and bench.py train on the
# full corpus.
BPE_GATE_DOC_MOD = 4


def _bpe_corpus_tokens(
    spark: SparkSession, sf_dir: str, doc_mod: int = 1
) -> DataFrame:
    from gmft_spark.operators.textstats import _tokens

    return _tokens(spark, sf_dir).filter(F.col("doc_id") % doc_mod == 0)


_BPE_CACHE: dict = {}


def _bpe_run(spark: SparkSession, sf_dir: str, doc_mod: int = 1):
    """Shared trainer loop: returns (final word-type frame with columns
    (tok, seq, cnt), list of 1-row merge frames). Each round counts
    adjacent symbol pairs weighted by word-type frequency, picks the
    max-count pair (ties → lexicographic (a, b) ascending), and applies
    it greedily left-to-right, non-overlapping, to every word.

    Memoized per (application, sf_dir, doc_mod) on checkpointed frames —
    the k-means memo pattern — so one gate run trains the tokenizer once
    for the train/encode/fertility query family, not once per query.

    Scale notes: the corpus collapses ONCE to (word-type, count) — the
    classic BPE-trainer reduction; every round after that is O(vocab),
    not O(corpus): one map-side-combinable pair-count groupBy over word
    types, a 1-row TakeOrdered argmax broadcast back via crossJoin, and
    a narrow literal-replace map. The per-round word-type frame is
    localCheckpointed (CLAUDE.md iterative plan-growth rule)."""
    from gmft_spark.operators.textstats import _tokens

    app = spark.sparkContext.applicationId
    # frames of dead applications can never be reused (executors gone)
    for stale in [k for k in _BPE_CACHE if k[0] != app]:
        del _BPE_CACHE[stale]
    key = (app, sf_dir, doc_mod)
    hit = _BPE_CACHE.get(key)
    if hit is not None:
        return hit

    words = (
        _bpe_corpus_tokens(spark, sf_dir, doc_mod)
        .filter(~F.col("tok").contains("|"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
        .select("tok", _bpe_wrap(F.col("tok")).alias("seq"), "cnt")
        .localCheckpoint(eager=True)
    )
    merges = []
    for r in range(1, BPE_MERGES + 1):
        best = (
            _bpe_pairs(words)
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .select(
                F.lit(r).alias("round"),
                F.col("a").alias("tok_a"),
                F.col("b").alias("tok_b"),
                F.col("c").alias("pair_count"),
            )
            .localCheckpoint(eager=True)
        )
        merges.append(best)
        # LEFT join on TRUE, not crossJoin: if the pair supply is
        # exhausted (no word type has >= 2 symbols left) `best` is 0
        # rows and a cross join would annihilate the word-type table;
        # the left join keeps every word and coalesce makes the round a
        # no-op (replace() of a NULL pattern is NULL in both engines).
        words = words.join(F.broadcast(best), F.lit(True), "left").select(
            "tok",
            F.coalesce(
                F.replace(
                    F.col("seq"),
                    F.concat(
                        F.lit("|"), "tok_a", F.lit("||"), "tok_b", F.lit("|")
                    ),
                    F.concat(F.lit("|"), "tok_a", F.col("tok_b"), F.lit("|")),
                ),
                F.col("seq"),
            ).alias("seq"),
            "cnt",
        ).localCheckpoint(eager=True)
    _BPE_CACHE[key] = (words, merges)
    return words, merges


def bpe_train_merges(
    spark: SparkSession, sf_dir: str, doc_mod: int = 1
) -> DataFrame:
    """BPE tokenizer training (Sennrich-style): learn BPE_MERGES merge
    rules over the corpus (see _bpe_run). Output is the merge table:
    (round, tok_a, tok_b, pair_count)."""
    _, merges = _bpe_run(spark, sf_dir, doc_mod)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("round")


def bpe_encode_corpus(
    spark: SparkSession, sf_dir: str, doc_mod: int = 1
) -> DataFrame:
    """Apply the learned merge table: per document, word count, character
    count, and the BPE token count after all BPE_MERGES rules — the
    train→apply half of the tokenizer (compression the merges bought is
    n_chars vs n_bpe_tokens).

    Scale notes: encoding joins the corpus token stream against the
    word-type → segmentation table keyed on the word; tokenizer tables
    are small by construction, so the join broadcasts (hot words are the
    skew case and a broadcast join is immune to it). The corpus side is
    a narrow map — no shuffle before the per-doc aggregation."""
    words, _ = _bpe_run(spark, sf_dir, doc_mod)
    n_syms = F.size(
        F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "\\|\\|")
    )
    seg = words.select("tok", n_syms.cast("long").alias("n_syms"))
    dtoks = _bpe_corpus_tokens(spark, sf_dir, doc_mod).filter(
        ~F.col("tok").contains("|")
    )
    return (
        dtoks.join(F.broadcast(seg), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(F.length("tok")).alias("n_chars"),
            F.sum("n_syms").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


def bpe_fertility_by_source(
    spark: SparkSession, sf_dir: str, doc_mod: int = 1
) -> DataFrame:
    """Tokenizer fertility per corpus source: BPE tokens per word and
    chars per BPE token under the trained merge table — the standard
    "how well does the tokenizer fit each domain" diagnostic (a source
    whose fertility stays near its symbol count is out-of-distribution
    for the tokenizer and inflates its training cost per byte).

    Scale shape: the token stream carries ``source`` from the scan (no
    join against documents), segmentations broadcast (hot words are the
    skew case and a broadcast join is immune), then ONE groupBy on the
    low-cardinality source key — map-side combinable."""
    words, _ = _bpe_run(spark, sf_dir, doc_mod)
    n_syms = F.size(
        F.split(F.expr("substring(seq, 2, length(seq) - 2)"), "\\|\\|")
    )
    seg = words.select("tok", n_syms.cast("long").alias("n_syms"))
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("doc_id") % doc_mod == 0
    )
    dtoks = (
        d.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .filter((F.col("tok") != "") & ~F.col("tok").contains("|"))
    )
    agg = dtoks.join(F.broadcast(seg), "tok").groupBy("source").agg(
        F.count("*").alias("n_words"),
        F.sum(F.length("tok")).alias("n_chars"),
        F.sum("n_syms").alias("n_bpe_tokens"),
    )
    return agg.select(
        "source",
        "n_words",
        "n_chars",
        "n_bpe_tokens",
        F.round(F.col("n_bpe_tokens") / F.col("n_words"), 6).alias(
            "fertility"
        ),
        F.round(F.col("n_chars") / F.col("n_bpe_tokens"), 6).alias(
            "chars_per_token"
        ),
    ).orderBy("source")


def _bpe_sql_ctes() -> str:
    """Shared unrolled trainer: dtoks (doc_id, tok), w0..wN word-type
    frames (tok, seq, cnt), b1..bN 1-row best-pair frames."""
    parts = [
        f"""
    WITH dtoks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % {BPE_GATE_DOC_MOD} = 0
    ),
    w0 AS (
        SELECT tok,
               '|' || array_to_string(string_split(tok, ''), '||') || '|'
                 AS seq,
               CAST(count(*) AS BIGINT) AS cnt
        FROM dtoks WHERE tok <> '' AND NOT contains(tok, '|')
        GROUP BY tok
    )"""
    ]
    for r in range(1, BPE_MERGES + 1):
        parts.append(
            f""",
    t{r} AS (
        SELECT string_split(trim(seq, '|'), '||') AS tk, cnt FROM w{r - 1}
    ),
    p{r} AS (
        SELECT tk[i] AS a, tk[i + 1] AS b, CAST(sum(cnt) AS BIGINT) AS c
        FROM (
            SELECT tk, cnt, unnest(range(1, len(tk))) AS i
            FROM t{r} WHERE len(tk) >= 2
        )
        GROUP BY tk[i], tk[i + 1]
    ),
    b{r} AS (
        SELECT {r} AS round, a AS tok_a, b AS tok_b, c AS pair_count
        FROM p{r} ORDER BY c DESC, a ASC, b ASC LIMIT 1
    ),
    w{r} AS (
        -- LEFT JOIN ON TRUE + coalesce: exhausted pair supply (empty
        -- b{r}) must be a no-op round, not annihilate the word table
        SELECT tok,
               coalesce(replace(seq, '|' || tok_a || '||' || tok_b || '|',
                                '|' || tok_a || tok_b || '|'), seq) AS seq,
               cnt
        FROM w{r - 1} LEFT JOIN b{r} ON TRUE
    )"""
        )
    return "".join(parts)


def _bpe_train_sql() -> str:
    sel = " UNION ALL ".join(
        f"SELECT * FROM b{r}" for r in range(1, BPE_MERGES + 1)
    )
    return _bpe_sql_ctes() + f"\n    {sel}\n    ORDER BY round\n"


def _bpe_encode_sql() -> str:
    return (
        _bpe_sql_ctes()
        + f"""
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(d.tok)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(trim(w.seq, '|'), '||'))) AS BIGINT)
             AS n_bpe_tokens
    FROM dtoks d JOIN w{BPE_MERGES} w ON d.tok = w.tok
    GROUP BY d.doc_id
    ORDER BY d.doc_id
"""
    )


def _bpe_fertility_sql() -> str:
    return (
        _bpe_sql_ctes()
        + f""",
    src AS (
        SELECT source, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id % {BPE_GATE_DOC_MOD} = 0
    )
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(length(s.tok)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(trim(w.seq, '|'), '||'))) AS BIGINT)
             AS n_bpe_tokens,
           round(CAST(sum(len(string_split(trim(w.seq, '|'), '||')))
                      AS DOUBLE) / count(*), 6) AS fertility,
           round(CAST(sum(length(s.tok)) AS DOUBLE)
                 / sum(len(string_split(trim(w.seq, '|'), '||'))), 6)
             AS chars_per_token
    FROM src s JOIN w{BPE_MERGES} w ON s.tok = w.tok
    WHERE s.tok <> '' AND NOT contains(s.tok, '|')
    GROUP BY s.source
    ORDER BY s.source
"""
    )


BPE_TRAIN_SQL = _bpe_train_sql()
BPE_ENCODE_SQL = _bpe_encode_sql()
BPE_FERTILITY_SQL = _bpe_fertility_sql()


CHUNK_TOKENS = 64  # tokens per chunk
CHUNK_OVERLAP = 16  # tokens shared between consecutive chunks


DSIR_TARGET_LANG = "en"  # target distribution: the labeled-en slice
DSIR_BUCKETS = 64  # hashed feature space
DSIR_KEEP_FRAC = 0.2


def dsir_importance(
    spark: SparkSession, sf_dir: str, selection: str = "rank"
) -> DataFrame:
    """DSIR-style importance weighting for data selection (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    score every document by the log-ratio of a TARGET hashed-n-gram
    distribution (here the labeled-``en`` slice) to the RAW corpus
    distribution, and mark the top ``DSIR_KEEP_FRAC`` for selection.
    Features are unigrams hashed to ``DSIR_BUCKETS`` buckets via the last
    two md5 hex chars (small-int exact in both engines — the lower-64
    DOUBLE modulo trap in CLAUDE.md doesn't apply), add-1 smoothed.

    Exactness: each bucket's ln ratio is fixed-pointed once
    (floor(x·1e6 + 0.5), bigram-NLL recipe); per-document totals are
    integer sums, and the per-token average is emitted as
    floor(total·1000/n) — identical double ops then floor in both
    engines — so the selection rank is pure integer comparison.

    Scale shape: ONE token-instance pass joined (broadcast) against the
    64-row ratio table, then a map-side-combinable doc rollup.
    ``selection='rank'`` (the gate default) marks exactly
    ceil(keep_frac·n) documents via a global rank — exact, hash-stable,
    but a single-partition sort. ``selection='threshold'`` is the
    100 TB path: an approx-quantile threshold broadcast back over the
    scores (no single-partition exchange, plan-pinned in
    tests/test_physical_plans.py) at the cost of an approximate keep
    count."""
    from pyspark.sql import Window

    from gmft_spark.operators.textstats import _tokens

    t = _tokens(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5("tok"), 31, 2), 16, 10).cast("int")
        % DSIR_BUCKETS
    )
    tb = t.select("doc_id", "lang", bucket.alias("b"))
    # ONE stacked pass builds both distributions (raw count + target count
    # per bucket); totals fold from the 64-row frame, never re-scan tokens
    bstats = tb.groupBy("b").agg(
        F.count("*").alias("cr"),
        F.count(F.when(F.col("lang") == DSIR_TARGET_LANG, 1)).alias("ct"),
    )
    tots = bstats.agg(
        F.sum("cr").alias("tr"), F.sum("ct").alias("tt")
    )
    ratio = (
        bstats.crossJoin(F.broadcast(tots))
        .select(
            "b",
            (
                F.floor(
                    (
                        F.log(F.col("ct") + 1)
                        - F.log(F.col("tt") + DSIR_BUCKETS)
                    )
                    * 1000000.0
                    + F.lit(0.5)
                )
                - F.floor(
                    (
                        F.log(F.col("cr") + 1)
                        - F.log(F.col("tr") + DSIR_BUCKETS)
                    )
                    * 1000000.0
                    + F.lit(0.5)
                )
            )
            .cast("long")
            .alias("lr_fp"),
        )
    )
    per_doc = (
        tb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lr_fp").alias("logratio_fp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "logratio_fp",
            F.floor(F.col("logratio_fp") * 1000.0 / F.col("n_tokens"))
            .cast("long")
            .alias("avg_mlr"),
        )
    )
    if selection == "threshold":
        thr = per_doc.agg(
            F.percentile_approx(
                "avg_mlr", 1.0 - DSIR_KEEP_FRAC, 100000
            ).alias("thr")
        )
        return (
            per_doc.crossJoin(F.broadcast(thr))
            .select(
                "doc_id",
                "n_tokens",
                "logratio_fp",
                "avg_mlr",
                F.when(F.col("avg_mlr") >= F.col("thr"), 1)
                .otherwise(0)
                .cast("int")
                .alias("selected"),
            )
            .orderBy("doc_id")
        )
    n = per_doc.agg(F.count("*").alias("n_docs"))
    win = Window.orderBy(F.desc("avg_mlr"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rk", F.row_number().over(win))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "n_tokens",
            "logratio_fp",
            "avg_mlr",
            F.when(
                F.col("rk")
                <= F.ceil(F.lit(DSIR_KEEP_FRAC) * F.col("n_docs")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("selected"),
        )
        .orderBy("doc_id")
    )


def _dsir_sql() -> str:
    hx = (
        "((strpos('0123456789abcdef', substr(md5(tok), 31, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(md5(tok), 32, 1)) - 1))"
    )
    return f"""
    WITH t AS (
        SELECT doc_id, lang, tok FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    tb AS (SELECT doc_id, lang, {hx} % {DSIR_BUCKETS} AS b FROM t),
    bstats AS (
        SELECT b, count(*) AS cr,
               count(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS ct
        FROM tb GROUP BY b
    ),
    tots AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM bstats),
    ratio AS (
        SELECT bstats.b,
               CAST(floor((ln(bstats.ct + 1)
                           - ln(tots.tt + {DSIR_BUCKETS}))
                          * 1000000.0 + 0.5)
                    - floor((ln(bstats.cr + 1)
                             - ln(tots.tr + {DSIR_BUCKETS}))
                            * 1000000.0 + 0.5) AS BIGINT) AS lr_fp
        FROM bstats, tots
    ),
    per_doc AS (
        SELECT tb.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(r.lr_fp) AS BIGINT) AS logratio_fp,
               CAST(floor(sum(r.lr_fp) * 1000.0 / count(*)) AS BIGINT)
                   AS avg_mlr
        FROM tb JOIN ratio r ON tb.b = r.b
        GROUP BY tb.doc_id
    ),
    n AS (SELECT count(*) AS n_docs FROM per_doc),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY avg_mlr DESC, doc_id ASC)
                      AS rk
        FROM per_doc
    )
    SELECT doc_id, n_tokens, logratio_fp, avg_mlr,
           CAST(CASE WHEN rk <= ceil({DSIR_KEEP_FRAC}::DOUBLE * n.n_docs)
                THEN 1 ELSE 0 END AS INT) AS selected
    FROM ranked, n
    ORDER BY doc_id
"""


DSIR_SQL = _dsir_sql()


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the chunking step feeding a RAG index or a fixed-context trainer
    (the complement of ``pack_sequences``, which concatenates SHORT
    docs; this cuts LONG ones). Chunk k starts at token
    1 + k·(CHUNK_TOKENS - CHUNK_OVERLAP); the last chunk may be short;
    a doc shorter than one chunk yields exactly one chunk.

    Chunk-count arithmetic is all-integer (ceil via ``(x + s - 1) div
    s`` — never a double→int cast), so both engines derive identical
    rows. Empty docs are filtered BEFORE building index sequences
    (CLAUDE.md: F.sequence(1, 0) yields a DESCENDING sequence, not an
    empty one). Scale shape: pure in-row array expressions on the scan —
    zero shuffles beyond the determinism sort; chunk rows fan out inside
    the row via explode, never through the driver."""
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    base = d.select(
        "doc_id", toks.alias("toks"), F.size(toks).alias("n")
    ).filter(F.col("n") >= 1)
    k_max = F.lit(1) + F.greatest(
        F.lit(0),
        F.expr(f"(n - {CHUNK_TOKENS} + {stride} - 1) div {stride}"),
    )
    chunk = F.explode(
        F.transform(
            F.sequence(F.lit(0), k_max - 1),
            lambda k: F.struct(
                k.cast("int").alias("chunk_idx"),
                (k * stride + 1).cast("int").alias("start_tok"),
            ),
        )
    )
    return (
        base.select("doc_id", "toks", "n", chunk.alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.start_tok").alias("start_tok"),
            F.least(
                F.lit(CHUNK_TOKENS), F.col("n") - F.col("c.start_tok") + 1
            ).alias("n_chunk_toks"),
            F.array_join(
                F.slice(F.col("toks"), F.col("c.start_tok"), CHUNK_TOKENS),
                " ",
            ).alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


CHUNK_SQL = f"""
    WITH base AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t <> '') AS toks
        FROM documents
    ),
    sized AS (
        SELECT doc_id, toks, len(toks) AS n FROM base WHERE len(toks) >= 1
    ),
    chunks AS (
        -- this DuckDB can't lateral-join generate_series on a column;
        -- the scalar list form + unnest does the same fan-out in-row
        SELECT doc_id, toks, n,
               CAST(unnest(generate_series(0,
                   greatest(0, (n - {CHUNK_TOKENS}
                                + {CHUNK_TOKENS - CHUNK_OVERLAP} - 1)
                               // {CHUNK_TOKENS - CHUNK_OVERLAP})))
                   AS INT) AS chunk_idx
        FROM sized
    ),
    placed AS (
        SELECT doc_id, toks, n, chunk_idx,
               CAST(chunk_idx * {CHUNK_TOKENS - CHUNK_OVERLAP} + 1 AS INT)
                   AS start_tok
        FROM chunks
    )
    SELECT doc_id, chunk_idx, start_tok,
           CAST(least({CHUNK_TOKENS}, n - start_tok + 1) AS INT)
               AS n_chunk_toks,
           array_to_string(
               list_slice(toks, start_tok, start_tok + {CHUNK_TOKENS} - 1),
               ' ') AS chunk_text
    FROM placed
    ORDER BY doc_id, chunk_idx
"""


def text_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: how much of a document's distinct 3-gram
    content appears NOWHERE else in the corpus — high-novelty docs carry
    unique information, low-novelty ones are recombinations/boilerplate
    (the inverse view of the dedup family's similarity signals). Counts
    only (n_novel of n_shingles); the consumer divides.

    Shape: ONE shingle-keyed shuffle — document frequency as a window
    count over the shingle partitioning (distinct (doc, shingle) rows,
    so the count IS the df; no self-join, no second aggregation of the
    same frame) — then a doc-keyed rollup. The shingle expansion itself
    is array expressions on the scan (dedup._shingles)."""
    from gmft_spark.operators.dedup import _shingles
    from pyspark.sql import Window

    sh = _shingles(spark, sf_dir)
    df_w = F.count("*").over(Window.partitionBy("shingle"))
    return (
        sh.withColumn("df", df_w)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("df") == 1, 1)).alias("n_novel"),
        )
        .orderBy("doc_id")
    )


def _novelty_sql() -> str:
    from gmft_spark.operators.dedup import SHINGLES_SQL

    return f"""
    WITH shingles AS ({SHINGLES_SQL}),
    with_df AS (
        SELECT doc_id,
               count(*) OVER (PARTITION BY shingle) AS df
        FROM shingles
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(*) FILTER (WHERE df = 1) AS BIGINT) AS n_novel
    FROM with_df
    GROUP BY doc_id
    ORDER BY doc_id
"""


NOVELTY_SQL = _novelty_sql()


SAMPLE_K = 20  # documents kept per stratum


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: the ``SAMPLE_K`` documents with
    the smallest hash rank per source — a uniform-without-replacement
    sample per stratum that is stable across runs, engines, and
    partitionings (no RNG state; the hash IS the reservoir priority, so
    this is bottom-k reservoir sampling made reproducible). Appending
    documents can only displace the current largest ranks — a doc's
    inclusion never depends on scan order.

    Scale shape: ONE source-keyed shuffle for the top-k window, bounded
    per task by Spark's WindowGroupLimit pushdown (each map task forwards
    at most k rows per stratum before the exchange); rank = the md5 hex
    string, portable to the oracle byte-for-byte."""
    d = _docs(spark, sf_dir)
    from pyspark.sql import Window

    rank_key = F.md5(
        F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(rank_key.asc())
    return (
        d.select("doc_id", "source", rank_key.alias("rk"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= SAMPLE_K)
        .select("doc_id", "source", "sample_rank")
        .orderBy("source", "sample_rank")
    )


SAMPLE_SQL = f"""
    SELECT doc_id, source, sample_rank
    FROM (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR))
               ) AS INT) AS sample_rank
        FROM documents
    )
    WHERE sample_rank <= {SAMPLE_K}
    ORDER BY source, sample_rank
"""


# Curation-funnel stage thresholds, chosen from the gate corpus's signal
# distributions so every stage's keep AND drop branches are live at
# sf0.01 (branch-census rule): n_tokens p5=16/p25=32, lang 'und' on ~9%,
# quality median 0.43, dup_token_frac median 0.54 / top_bigram p90 0.07.
# (rare_token_ratio and exact-dup stages would be DEAD here — the corpus
# has zero rare tokens and zero duplicate texts — so they're excluded.)
FUNNEL_MIN_TOKENS = 24
FUNNEL_LANG = "en"
FUNNEL_MIN_QUALITY = 0.35
FUNNEL_MAX_DUP_FRAC = 0.65
FUNNEL_MAX_BIGRAM_FRAC = 0.1


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation decision report: per source, how many documents
    survive each filter stage CUMULATIVELY — length floor, language,
    composite quality, repetition (Gopher rules) — plus the final keep
    rate. This is the per-stage attrition table every training-data
    pipeline publishes next to its corpus ("why was this dropped"), and
    the first thing reviewed when a source's keep rate moves.

    Composes the per-document signal operators (textstats.lang_id,
    quality_score, repetition_stats) by doc_id LEFT joins off the full
    documents base (token-derived frames omit zero-token docs; a null
    signal fails its stage identically in both engines since NULL
    comparisons never satisfy a filter). Scale: the constituent signal
    plans are unchanged; the funnel adds doc_id-keyed joins (co-keyed,
    bucket-co-locatable) and one tiny groupBy(source) rollup."""
    from gmft_spark.operators.textstats import (
        lang_id,
        quality_score,
        repetition_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    qual = quality_score(spark, sf_dir).select("doc_id", "n_tokens", "quality")
    rep = repetition_stats(spark, sf_dir).select(
        "doc_id", "dup_token_frac", "top_bigram_frac"
    )
    sig = (
        docs.join(qual, "doc_id", "left")
        .join(lang_id(spark, sf_dir), "doc_id", "left")
        .join(rep, "doc_id", "left")
    )
    s1 = F.col("n_tokens") >= FUNNEL_MIN_TOKENS
    s2 = s1 & (F.col("lang_guess") == FUNNEL_LANG)
    s3 = s2 & (F.col("quality") >= FUNNEL_MIN_QUALITY)
    s4 = (
        s3
        & (F.col("dup_token_frac") <= FUNNEL_MAX_DUP_FRAC)
        & (F.col("top_bigram_frac") <= FUNNEL_MAX_BIGRAM_FRAC)
    )
    return (
        sig.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count(F.when(s1, 1)).cast("long").alias("n_pass_length"),
            F.count(F.when(s2, 1)).cast("long").alias("n_pass_lang"),
            F.count(F.when(s3, 1)).cast("long").alias("n_pass_quality"),
            F.count(F.when(s4, 1)).cast("long").alias("n_kept"),
        )
        .withColumn(
            "keep_rate",
            F.round(F.col("n_kept").cast("double") / F.col("n_docs"), 6),
        )
        .orderBy("source")
    )


def _funnel_sql() -> str:
    from gmft_spark.operators.textstats import (
        LANG_ID_SQL,
        QUALITY_SQL,
        REPETITION_SQL,
    )

    s1 = f"n_tokens >= {FUNNEL_MIN_TOKENS}"
    s2 = f"{s1} AND lang_guess = '{FUNNEL_LANG}'"
    s3 = f"{s2} AND quality >= {FUNNEL_MIN_QUALITY}"
    s4 = (
        f"{s3} AND dup_token_frac <= {FUNNEL_MAX_DUP_FRAC}"
        f" AND top_bigram_frac <= {FUNNEL_MAX_BIGRAM_FRAC}"
    )
    return f"""
    WITH lang AS ({LANG_ID_SQL}),
    qual AS ({QUALITY_SQL}),
    rep AS ({REPETITION_SQL}),
    sig AS (
        SELECT d.source, q.n_tokens, l.lang_guess, q.quality,
               r.dup_token_frac, r.top_bigram_frac
        FROM documents d
        LEFT JOIN qual q ON d.doc_id = q.doc_id
        LEFT JOIN lang l ON d.doc_id = l.doc_id
        LEFT JOIN rep r ON d.doc_id = r.doc_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE {s1}) AS BIGINT) AS n_pass_length,
           CAST(count(*) FILTER (WHERE {s2}) AS BIGINT) AS n_pass_lang,
           CAST(count(*) FILTER (WHERE {s3}) AS BIGINT) AS n_pass_quality,
           CAST(count(*) FILTER (WHERE {s4}) AS BIGINT) AS n_kept,
           round(CAST(count(*) FILTER (WHERE {s4}) AS DOUBLE)
                 / count(*), 6) AS keep_rate
    FROM sig
    GROUP BY source
    ORDER BY source
"""


CURATION_FUNNEL_SQL = _funnel_sql()


CURRICULUM_HI_FP = 500000  # quality_fp >= HI -> phase 0 (cleanest first)
CURRICULUM_LO_FP = 360000  # quality_fp >= LO -> phase 1; tail trains last
CURRICULUM_SHARDS = 4


def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-phased curriculum ordering — the training-order policy of
    curriculum learning (Bengio et al., ICML 2009): cleanest documents
    train first. Each document gets a phase from FIXED thresholds on the
    shared fixed-point quality score (textstats.quality_fp_col — no
    global quantile pass, so the assignment is a pure function of the
    row and appending documents never re-phases existing ones), a shard
    from the portable md5-lower-64 fraction, and a position from the md5
    hex draw ``curr|<doc_id>`` — a deterministic within-phase shuffle
    (hex string order is engine-portable; hash draws are unique per
    doc_id, so the order is total).

    Scale shape: scoring is a narrow map on the scan; the only shuffle
    is the (phase, shard) row_number window — N_PHASES×N_SHARDS
    parallel tasks here, and at 10^12 docs the same order materializes
    via repartitionByRange on (phase, shard, h) + sortWithinPartitions
    with per-partition offsets, exactly as shard_training_corpus
    documents (the order itself is hash-defined either way)."""
    from gmft_spark.operators.textstats import (
        _KMV_SPACE,
        _md5_lower64,
        STOPWORDS,
        quality_fp_col,
    )

    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    # zero-token docs: same exclusion rule as textstats.quality_score
    # (the oracle's token CTE inner-joins them away)
    d = d.filter(F.size(toks) >= 1)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t.isin(*all_stop))
    )
    feats = d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        n_stop.alias("ns"),
        F.col("n_chars").alias("nc"),
    )
    qfp = quality_fp_col()
    phase = (
        F.when(qfp >= CURRICULUM_HI_FP, 0)
        .when(qfp >= CURRICULUM_LO_FP, 1)
        .otherwise(2)
    )
    key = F.concat(F.lit("curr|"), F.col("doc_id").cast("string"))
    frac = _md5_lower64(key) / F.lit(_KMV_SPACE)
    shard = F.least(
        F.floor(frac * CURRICULUM_SHARDS).cast("int"),
        F.lit(CURRICULUM_SHARDS - 1),
    )
    base = feats.select(
        "doc_id",
        phase.alias("phase"),
        shard.alias("shard"),
        F.md5(key).alias("h"),
        (qfp / 1000000.0).alias("quality"),
    )
    w = Window.partitionBy("phase", "shard").orderBy("h")
    return base.select(
        "doc_id",
        "phase",
        "shard",
        F.row_number().over(w).alias("pos"),
        "quality",
    ).orderBy("phase", "shard", "pos")


def _curriculum_sql() -> str:
    from gmft_spark.operators.textstats import (
        _ALL_STOP_SQL,
        _KMV_SPACE,
        QUALITY_FP_SQL,
    )

    return f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    agg AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN tok IN ({_ALL_STOP_SQL}) THEN 1 ELSE 0 END) AS ns
        FROM toks WHERE tok <> ''
        GROUP BY doc_id
    ),
    feats AS (
        SELECT d.doc_id, a.n_tokens, a.ns, d.n_chars AS nc,
               md5('curr|' || CAST(d.doc_id AS VARCHAR)) AS h,
               CAST(md5_number_lower('curr|' || CAST(d.doc_id AS VARCHAR))
                    AS DOUBLE) / {_KMV_SPACE!r} AS f
        FROM documents d JOIN agg a ON d.doc_id = a.doc_id
    ),
    scored AS (
        SELECT doc_id, h,
               CASE WHEN {QUALITY_FP_SQL} >= {CURRICULUM_HI_FP} THEN 0
                    WHEN {QUALITY_FP_SQL} >= {CURRICULUM_LO_FP} THEN 1
                    ELSE 2 END AS phase,
               least(CAST(floor(f * {CURRICULUM_SHARDS}) AS INT),
                     {CURRICULUM_SHARDS - 1}) AS shard,
               {QUALITY_FP_SQL} / 1000000.0 AS quality
        FROM feats
    )
    SELECT doc_id, phase, shard,
           CAST(row_number() OVER (PARTITION BY phase, shard ORDER BY h)
                AS INT) AS pos,
           quality
    FROM scored
    ORDER BY phase, shard, pos
"""


CURRICULUM_SQL = _curriculum_sql()


QUERIES = {
    "curriculum_order": (curriculum_order, CURRICULUM_SQL),
    "dedup_lines_corpus": (dedup_lines_corpus, DEDUP_LINES_SQL),
    "sample_stratified": (sample_stratified, SAMPLE_SQL),
    "chunk_documents": (chunk_documents, CHUNK_SQL),
    "text_novelty": (text_novelty, NOVELTY_SQL),
    "dedup_lines_within_doc": (dedup_lines_within_doc, DEDUP_LINES_WITHIN_SQL),
    "pack_sequences": (pack_sequences, PACK_SEQUENCES_SQL),
    "pii_redact": (pii_redact, PII_REDACT_SQL),
    "mix_sources_weighted": (mix_sources_weighted, MIX_SQL),
    "bpe_train_merges": (
        lambda spark, sf: bpe_train_merges(spark, sf, doc_mod=BPE_GATE_DOC_MOD),
        BPE_TRAIN_SQL,
    ),
    "bpe_encode_corpus": (
        lambda spark, sf: bpe_encode_corpus(spark, sf, doc_mod=BPE_GATE_DOC_MOD),
        BPE_ENCODE_SQL,
    ),
    "bpe_fertility_by_source": (
        lambda spark, sf: bpe_fertility_by_source(
            spark, sf, doc_mod=BPE_GATE_DOC_MOD
        ),
        BPE_FERTILITY_SQL,
    ),
    "curation_funnel": (curation_funnel, CURATION_FUNNEL_SQL),
    "dsir_importance": (dsir_importance, DSIR_SQL),
}
