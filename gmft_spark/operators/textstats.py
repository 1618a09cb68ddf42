"""Text-analysis operators over the ``documents`` table.

Language-ID (stopword-hit heuristic), quality scoring, token counting and
per-source corpus stats — the per-document scoring passes of a
training-data pipeline. Everything is built-in string/aggregate functions
(whole-stage codegen; no UDFs), embarrassingly parallel over documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language guess per document; ties break by language
    code ascending; documents with no hits get 'und' (undetermined)."""
    toks = _tokens(spark, sf_dir)
    guess_cols = [
        F.sum(
            F.when(F.col("tok").isin(*words), 1).otherwise(0)
        ).alias(f"n_{lang}")
        for lang, words in sorted(STOPWORDS.items())
    ]
    scored = toks.groupBy("doc_id").agg(*guess_cols)
    langs = sorted(STOPWORDS)
    best = F.greatest(*[F.col(f"n_{lg}") for lg in langs])
    guess = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties → apply last
        guess = F.when(
            (best > 0) & (F.col(f"n_{lg}") == best), F.lit(lg)
        ).otherwise(guess)
    return scored.select("doc_id", guess.alias("lang_guess")).orderBy("doc_id")


def _lang_sql_counts() -> str:
    parts = []
    for lang, words in sorted(STOPWORDS.items()):
        lst = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"sum(CASE WHEN tok IN ({lst}) THEN 1 ELSE 0 END) AS n_{lang}"
        )
    return ", ".join(parts)


LANG_ID_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    scored AS (
        SELECT doc_id, {_lang_sql_counts()}
        FROM toks WHERE tok <> ''
        GROUP BY doc_id
    )
    SELECT doc_id,
           CASE WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
                WHEN n_de = greatest(n_de, n_en, n_es, n_fr) THEN 'de'
                WHEN n_en = greatest(n_de, n_en, n_es, n_fr) THEN 'en'
                WHEN n_es = greatest(n_de, n_en, n_es, n_fr) THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM scored
    ORDER BY doc_id
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + a composite score:
    token count, mean token length, stopword ratio, length band."""
    d = _docs(spark, sf_dir)
    n_toks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    # zero-token documents: the oracle's token-derived CTE omits them
    # (inner join), and ANSI mode would otherwise DIVIDE_BY_ZERO the whole
    # job on one empty text — filter them out before any ratio
    d = d.filter(n_toks >= 1)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    n_stop = F.size(
        F.filter(
            F.split(F.col("text"), " "), lambda t: t.isin(*all_stop)
        )
    )
    feats = d.select(
        "doc_id",
        n_toks.alias("n_tokens"),
        F.col("n_chars").alias("nc"),
        n_stop.alias("ns"),
        F.round(F.col("n_chars") / n_toks, 6).alias("mean_tok_len"),
        F.round(n_stop / n_toks, 6).alias("stop_ratio"),
    )
    return feats.select(
        "doc_id",
        "n_tokens",
        "mean_tok_len",
        "stop_ratio",
        (quality_fp_col() / 1000000.0).alias("quality"),
    ).orderBy("doc_id")


def quality_fp_col(n_tokens="n_tokens", ns="ns", nc="nc"):
    """Composite quality score in FIXED-POINT (×1e6) integer arithmetic
    over (token count, stopword count, char count) columns: summing
    three rounded doubles flipped the 6th decimal on ~0.04% of docs at
    sf0.1 (last-ulp divergence between engines); each term is an exact
    integer, so the sum is exact everywhere. SQL twin: QUALITY_FP_SQL.
    Shared by quality_score and curation.curriculum_order — one rule,
    two consumers (the drifted-copy hazard from CLAUDE.md)."""
    n_tokens, ns, nc = F.col(n_tokens), F.col(ns), F.col(nc)
    t1 = F.least(n_tokens * 5000, F.lit(500000)).cast("long")
    t2 = F.floor(ns * 300000.0 / n_tokens + F.lit(0.5)).cast("long")
    t3 = F.least(
        F.floor(nc * 25000.0 / n_tokens + F.lit(0.5)), F.lit(200000)
    ).cast("long")
    return t1 + t2 + t3


_ALL_STOP_SQL = ", ".join(
    f"'{w}'" for w in sorted({w for ws in STOPWORDS.values() for w in ws})
)

# DuckDB twin of quality_fp_col over CTE columns (n_tokens, ns, nc)
QUALITY_FP_SQL = (
    "(CAST(least(n_tokens * 5000, 500000) AS BIGINT)"
    " + CAST(floor(ns * 300000.0 / n_tokens + 0.5) AS BIGINT)"
    " + CAST(least(floor(nc * 25000.0 / n_tokens + 0.5), 200000)"
    " AS BIGINT))"
)

QUALITY_SQL = f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    agg AS (
        SELECT doc_id,
               count(*) AS n_tokens,
               sum(CASE WHEN tok IN ({_ALL_STOP_SQL}) THEN 1 ELSE 0 END) AS n_stop
        FROM toks WHERE tok <> ''
        GROUP BY doc_id
    ),
    feats AS (
        SELECT d.doc_id,
               a.n_tokens,
               d.n_chars AS nc,
               a.n_stop AS ns,
               round(CAST(d.n_chars AS DOUBLE) / a.n_tokens, 6) AS mean_tok_len,
               round(CAST(a.n_stop AS DOUBLE) / a.n_tokens, 6) AS stop_ratio
        FROM documents d JOIN agg a ON d.doc_id = a.doc_id
    )
    -- fixed-point composite (exact integer terms; see the python twin)
    SELECT doc_id, n_tokens, mean_tok_len, stop_ratio,
           {QUALITY_FP_SQL} / 1000000.0 AS quality
    FROM feats
    ORDER BY doc_id
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source: whitespace tokens plus a
    BPE-ish subword estimate (ceil(chars/4))."""
    d = _docs(spark, sf_dir)
    n_toks = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    return (
        d.select(
            "source",
            n_toks.alias("n_tokens"),
            F.ceil(F.col("n_chars") / 4.0).cast("long").alias("n_subwords"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_subwords").alias("total_subwords"),
        )
        .orderBy("source")
    )


TOKEN_COUNTS_SQL = """
    WITH pertok AS (
        SELECT source,
               (SELECT count(*) FROM unnest(string_split(text, ' ')) AS u(t)
                WHERE t <> '') AS n_tokens,
               CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_subwords
        FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_subwords) AS BIGINT) AS total_subwords
    FROM pertok
    GROUP BY source
    ORDER BY source
"""


def rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter signal: per-document fraction of tokens that are
    corpus-rare (total count <= 2) — the CCNet-style rare-vocabulary
    heuristic. Two shuffles: corpus token counts (balanced on token),
    per-doc aggregation; the small count table broadcasts back."""
    toks = _tokens(spark, sf_dir).select("doc_id", "tok")
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    return (
        toks.join(F.broadcast(counts), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("n") <= 2, 1).otherwise(0)).alias("n_rare"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("n_rare").cast("long").alias("n_rare"),
            F.round(F.col("n_rare") / F.col("n_tokens"), 6).alias(
                "rare_ratio"
            ),
        )
        .orderBy("doc_id")
    )


RARE_TOKEN_SQL = """
    WITH toks AS (
        SELECT doc_id, u.tok
        FROM documents, LATERAL unnest(string_split(text, ' ')) AS u(tok)
        WHERE u.tok <> ''
    ),
    counts AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           CAST(sum(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rare,
           round(CAST(sum(CASE WHEN c.n <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS rare_ratio
    FROM toks t JOIN counts c ON t.tok = c.tok
    GROUP BY t.doc_id
    ORDER BY t.doc_id
"""


def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination signal: leading-content fingerprints (md5 of the
    first 64 normalized chars — leakage between corpora usually shares
    prefixes even when tails diverge) shared across different sources.
    One fingerprint shuffle; overlapping source pairs from in-group
    expansion."""
    d = _docs(spark, sf_dir)
    fp = d.select(
        "doc_id",
        "source",
        F.md5(
            F.substring(
                F.trim(
                    F.regexp_replace(
                        F.lower(F.col("text")), "[^a-z0-9]+", " "
                    )
                ),
                1,
                64,
            )
        ).alias("fingerprint"),
    )
    groups = (
        fp.groupBy("fingerprint")
        .agg(F.sort_array(F.collect_set("source")).alias("sources"))
        .filter(F.size("sources") >= 2)
    )
    pairs = groups.select(
        "fingerprint",
        F.explode(
            F.flatten(
                F.transform(
                    "sources",
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("sources"),
                            i + 2,
                            F.greatest(
                                F.size("sources") - i - 1, F.lit(0)
                            ),
                        ),
                        lambda y: F.struct(
                            x.alias("src_a"), y.alias("src_b")
                        ),
                    ),
                )
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .agg(F.count("*").alias("n_shared_fingerprints"))
        .orderBy("src_a", "src_b")
    )


CROSS_SOURCE_SQL = """
    WITH fp AS (
        SELECT doc_id, source,
               md5(substr(trim(regexp_replace(lower(text), '[^a-z0-9]+',
                                              ' ', 'g')), 1, 64))
                 AS fingerprint
        FROM documents
    ),
    pairs AS (
        SELECT DISTINCT a.fingerprint, a.source AS src_a, b.source AS src_b
        FROM fp a JOIN fp b
          ON a.fingerprint = b.fingerprint AND a.source < b.source
    )
    SELECT src_a, src_b, count(*) AS n_shared_fingerprints
    FROM pairs
    GROUP BY src_a, src_b
    ORDER BY src_a, src_b
"""


def lang_id_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion summary of the heuristic against the labeled lang column."""
    guessed = lang_id(spark, sf_dir)
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    return (
        guessed.join(d, "doc_id")
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "lang_guess")
    )


LANG_ACCURACY_SQL = f"""
    WITH guessed AS ({LANG_ID_SQL.replace("ORDER BY doc_id", "")})
    SELECT d.lang, g.lang_guess, count(*) AS n_docs
    FROM guessed g JOIN documents d ON g.doc_id = d.doc_id
    GROUP BY d.lang, g.lang_guess
    ORDER BY d.lang, g.lang_guess
"""


def nb_lang_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier TRAINED distributively
    on the corpus's own labels and applied back to every document — the
    trained-classifier curation filter (the fastText-style lang-id /
    quality-classifier pattern) at sandbox fidelity; on this corpus the
    text carries little label signal, so predictions sit near the prior —
    the resubstitution diagnostic reports that honestly (like
    ``lang_id_accuracy`` does for the stopword heuristic).

    EXACT cross-engine (bigram-NLL recipe): every ln is fixed-pointed
    (floor(x·1e6 + 0.5)) per distinct count the moment it's computed;
    everything downstream — per-document score sums, the per-token
    denominator scaled by the document's token count, the prior, the
    argmax with its lexicographic tie-break — is pure integer arithmetic,
    so the driver hash is bit-stable. Add-1 smoothing makes a zero count
    contribute ln(1) = 0, so the model table only carries OBSERVED
    (lang, tok) pairs and the unseen-pair default folds into the
    per-language offset.

    Scale shape: two map-side-combinable count aggregations build the
    model; scoring joins token instances to the model on the token key
    (inverted-index shape — broadcastable when the vocabulary is small);
    the candidate matrix is documents × |langs| via a broadcast of the
    tiny per-language offset frame (bounded small-dimension blowup, the
    conv_embedding_profile label-vote pattern); the argmax is one
    doc_id-partitioned window."""
    d = _docs(spark, sf_dir).select("doc_id", "lang")
    dt = _tokens(spark, sf_dir)  # (doc_id, lang, tok) — label rides the scan
    toks = dt.select("doc_id", "tok")
    c_lt = dt.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    vocab = toks.agg(F.count_distinct("tok").alias("v"))
    ndocs = d.agg(F.count("*").alias("n"))
    w = c_lt.select(
        F.col("lang").alias("cand_lang"),
        "tok",
        F.floor(F.log(F.col("c") + 1) * 1000000.0 + F.lit(0.5))
        .cast("long")
        .alias("w_fp"),
    )
    off = (
        c_lt.groupBy("lang")
        .agg(F.sum("c").alias("tot"))
        .join(d.groupBy("lang").agg(F.count("*").alias("nd")), "lang")
        .crossJoin(F.broadcast(vocab))
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col("lang").alias("cand_lang"),
            F.floor(
                F.log(F.col("tot") + F.col("v")) * 1000000.0 + F.lit(0.5)
            )
            .cast("long")
            .alias("denom_fp"),
            F.floor(
                (F.log("nd") - F.log("n")) * 1000000.0 + F.lit(0.5)
            )
            .cast("long")
            .alias("prior_fp"),
        )
    )
    sparse = (
        toks.join(w, "tok")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum("w_fp").alias("s_fp"))
    )
    nt = toks.groupBy("doc_id").agg(F.count("*").alias("nt"))
    base = (
        d.join(nt, "doc_id", "left")
        .withColumn("nt", F.coalesce(F.col("nt"), F.lit(0)))
        .crossJoin(F.broadcast(off))
        .join(sparse, ["doc_id", "cand_lang"], "left")
        .select(
            "doc_id",
            "lang",
            "cand_lang",
            (
                F.coalesce(F.col("s_fp"), F.lit(0))
                - F.col("nt") * F.col("denom_fp")
                + F.col("prior_fp")
            ).alias("score_fp"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.desc("score_fp"), F.asc("cand_lang")
    )
    return (
        base.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") == 1)
        .select(
            "doc_id",
            "lang",
            F.col("cand_lang").alias("pred_lang"),
            "score_fp",
            F.when(F.col("lang") == F.col("cand_lang"), 1)
            .otherwise(0)
            .cast("int")
            .alias("correct"),
        )
        .orderBy("doc_id")
    )


NB_LANG_SQL = """
    WITH d AS (SELECT doc_id, lang FROM documents),
    toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    t AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    dt AS (SELECT t.doc_id, t.tok, d.lang FROM t JOIN d USING (doc_id)),
    c_lt AS (SELECT lang, tok, count(*) AS c FROM dt GROUP BY lang, tok),
    vocab AS (SELECT count(DISTINCT tok) AS v FROM t),
    ndocs AS (SELECT count(*) AS n FROM d),
    w AS (
        SELECT lang AS cand_lang, tok,
               CAST(floor(ln(c + 1) * 1000000.0 + 0.5) AS BIGINT) AS w_fp
        FROM c_lt
    ),
    off AS (
        SELECT c.lang AS cand_lang,
               CAST(floor(ln(c.tot + vocab.v) * 1000000.0 + 0.5) AS BIGINT)
                   AS denom_fp,
               CAST(floor((ln(nd.nd) - ln(ndocs.n)) * 1000000.0 + 0.5)
                    AS BIGINT) AS prior_fp
        FROM (SELECT lang, sum(c) AS tot FROM c_lt GROUP BY lang) c
        JOIN (SELECT lang, count(*) AS nd FROM d GROUP BY lang) nd
          ON c.lang = nd.lang, vocab, ndocs
    ),
    sparse AS (
        SELECT t.doc_id, w.cand_lang, sum(w.w_fp) AS s_fp
        FROM t JOIN w ON t.tok = w.tok
        GROUP BY t.doc_id, w.cand_lang
    ),
    nt AS (SELECT doc_id, count(*) AS nt FROM t GROUP BY doc_id),
    scored AS (
        SELECT d.doc_id, d.lang, o.cand_lang,
               coalesce(s.s_fp, 0)
                   - coalesce(nt.nt, 0) * o.denom_fp + o.prior_fp
                   AS score_fp,
               row_number() OVER (
                   PARTITION BY d.doc_id
                   ORDER BY coalesce(s.s_fp, 0)
                            - coalesce(nt.nt, 0) * o.denom_fp + o.prior_fp
                            DESC, o.cand_lang ASC
               ) AS rk
        FROM d
        CROSS JOIN off o
        LEFT JOIN nt ON d.doc_id = nt.doc_id
        LEFT JOIN sparse s
          ON d.doc_id = s.doc_id AND o.cand_lang = s.cand_lang
    )
    SELECT doc_id, lang, cand_lang AS pred_lang,
           CAST(score_fp AS BIGINT) AS score_fp,
           CAST(CASE WHEN lang = cand_lang THEN 1 ELSE 0 END AS INT)
               AS correct
    FROM scored WHERE rk = 1
    ORDER BY doc_id
"""


def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the
    compression-ratio-family quality signal (RefinedWeb/Gopher style):
    near-zero entropy flags run-on repetition ('aaaa…'), unusually high
    entropy flags binary/base64 junk; curation thresholds both tails.
    H = ln(n) − Σ c·ln(c)/n over character counts c.

    Exactness: each ln(c) is fixed-pointed per distinct count
    (bigram-NLL recipe) so Σ c·fp(ln c) is an exact integer under
    unordered partial aggregation; the final H combines that integer
    with ln(n) in one identical double expression per engine before the
    6dp round. Documents with no characters (NULL/empty text) have no
    rows and are excluded.

    Scale shape: one (doc_id, char) count aggregation over the character
    stream, then a map-side-combinable doc rollup — both partial-agg
    friendly; alphabet size bounds the first aggregate's width."""
    d = _docs(spark, sf_dir)
    ch = d.select(
        "doc_id", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    counts = ch.groupBy("doc_id", "ch").agg(F.count("*").alias("c"))
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.count("*").alias("n_distinct_chars"),
        F.sum(
            F.col("c")
            * F.floor(F.log("c") * 1000000.0 + F.lit(0.5)).cast("long")
        ).alias("s_fp"),
    )
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_chars_counted"),
        F.col("n_distinct_chars").cast("long").alias("n_distinct_chars"),
        F.round(
            F.log("n") - F.col("s_fp") / (1000000.0 * F.col("n")), 6
        ).alias("entropy"),
    ).orderBy("doc_id")


CHAR_ENTROPY_SQL = """
    WITH ch AS (
        SELECT doc_id, u.ch AS ch
        FROM documents, LATERAL unnest(string_split(text, '')) AS u(ch)
        WHERE u.ch <> ''
    ),
    counts AS (
        SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch
    ),
    per_doc AS (
        SELECT doc_id,
               sum(c) AS n,
               count(*) AS n_distinct_chars,
               sum(c * CAST(floor(ln(c) * 1000000.0 + 0.5) AS BIGINT))
                   AS s_fp
        FROM counts GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars_counted,
           CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
           round(ln(n) - s_fp / (1000000.0 * n), 6) AS entropy
    FROM per_doc
    ORDER BY doc_id
"""


def _mk_bigram(tk, i):
    """Helper binding the array column (CLAUDE.md lambda-index gotcha)."""
    return F.concat_ws(" ", F.element_at(tk, i), F.element_at(tk, i + 1))


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (the Gopher-rule family): per document,
    the duplicate-token fraction and the most-frequent-bigram fraction —
    high values flag boilerplate/spam for the curation filter.

    Scale design: everything is an array expression on the scan — token
    dedup via array_distinct, and the top-bigram count as a single fold
    over the SORTED bigram array (max run length of equal neighbors), so
    the whole query is shuffle-free where the naive form spends two
    shuffles per doc-bigram groupBy. The DuckDB twin computes the same
    mode via group-by (different computation, same values)."""
    d = _docs(spark, sf_dir)
    tk = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    # docs with zero tokens are absent from the oracle's token-derived
    # CTE (and 0/0 would NULL the fraction) — filter them identically
    base = d.select("doc_id", tk.alias("tk")).filter(F.size("tk") >= 1).select(
        "doc_id",
        F.size("tk").alias("n_tokens"),
        F.size(F.array_distinct("tk")).alias("n_distinct"),
        F.when(
            F.size("tk") >= 2,
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: _mk_bigram(F.col("tk"), i),
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("sb"),
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long"))
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    best = F.aggregate(F.col("sb"), init, merge, lambda acc: acc["best"])
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(
            F.lit(1.0)
            - F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("dup_token_frac"),
        F.when(
            F.col("n_tokens") >= 2,
            F.round(
                best.cast("double") / (F.col("n_tokens") - 1).cast("double"), 6
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    ).orderBy("doc_id")


REPETITION_SQL = """
    WITH toks AS (
        SELECT doc_id, tok, pos FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        ) WHERE tok <> ''
    ),
    seq AS (
        SELECT doc_id, tok,
               row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
        FROM toks
    ),
    base AS (
        SELECT doc_id, count(*) AS n, count(DISTINCT tok) AS nd
        FROM seq GROUP BY doc_id
    ),
    bgc AS (
        SELECT a.doc_id, a.tok || ' ' || b.tok AS bigram, count(*) AS c
        FROM seq a
        JOIN seq b ON a.doc_id = b.doc_id AND b.rn = a.rn + 1
        GROUP BY a.doc_id, bigram
    ),
    top AS (SELECT doc_id, max(c) AS best FROM bgc GROUP BY doc_id)
    SELECT b.doc_id,
           CAST(b.n AS INT) AS n_tokens,
           round(1.0::DOUBLE - CAST(b.nd AS DOUBLE) / CAST(b.n AS DOUBLE), 6)
               AS dup_token_frac,
           CASE WHEN b.n >= 2
                THEN round(CAST(coalesce(t.best, 0) AS DOUBLE)
                           / CAST(b.n - 1 AS DOUBLE), 6)
                ELSE 0.0::DOUBLE END AS top_bigram_frac
    FROM base b LEFT JOIN top t ON b.doc_id = t.doc_id
    ORDER BY b.doc_id
"""


KMV_K = 64

# 2^64 as a double — the hash-space size for the KMV fraction
_KMV_SPACE = 18446744073709551616.0


def _md5_lower64(col):
    """Lower 64 bits of md5 as an unsigned number, matching DuckDB's
    ``md5_number_lower`` (little-endian reinterpretation of digest bytes
    8..16): reverse the hex byte pairs of the second half, then conv
    base-16 → base-10 (unsigned)."""
    h = F.md5(col)
    rev = F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(rev, 16, 10).cast("double")


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch over the corpus 3-gram
    shingle vocabulary — a sketch whose estimate is EXACTLY reproducible
    cross-engine (see sketch_hll_distinct for the register-based
    alternative, made engine-exact the same way): hash every distinct
    shingle to
    a fraction of the 64-bit space via md5's lower half, keep the k
    smallest, and estimate distinct ≈ (k-1)/kth_min. Emitted next to the
    exact distinct count so the estimate's error is part of the checked
    output (shingles, not tokens: the token vocabulary here is smaller
    than k, which is the sketch's degenerate regime).

    Scale notes: the k-smallest pass is a TakeOrdered (map-side partial
    top-k per partition, tiny merge at the driver-side limit) after one
    hash-distinct shuffle; at corpus scale the sketch replaces a full
    count-distinct shuffle wherever an approximate vocabulary size
    suffices (per-shard sketches union by taking the k smallest of the
    merged minima — the classic mergeable-sketch property)."""
    from gmft_spark.operators.dedup import _shingles

    toks = _shingles(spark, sf_dir).select(
        F.col("shingle").alias("tok")
    ).distinct()
    fr = toks.select(
        (_md5_lower64(F.col("tok")) / F.lit(_KMV_SPACE)).alias("f")
    ).distinct()
    kth = (
        fr.orderBy("f")
        .limit(KMV_K)
        .agg(F.max("f").alias("kf"))
    )
    exact = toks.agg(F.count("*").alias("exact_distinct"))
    return kth.crossJoin(exact).select(
        F.lit(KMV_K).cast("int").alias("k"),
        F.round(F.lit(float(KMV_K - 1)) / F.col("kf"), 4).alias("est_distinct"),
        F.col("exact_distinct"),
    )


def _kmv_sql() -> str:
    from gmft_spark.operators.dedup import SHINGLES_SQL

    return f"""
    WITH toks AS (
        SELECT DISTINCT shingle AS tok FROM ({SHINGLES_SQL})
    ),
    fr AS (
        SELECT DISTINCT CAST(md5_number_lower(tok) AS DOUBLE)
                        / {_KMV_SPACE!r} AS f
        FROM toks
    ),
    kth AS (
        SELECT max(f) AS kf FROM (SELECT f FROM fr ORDER BY f LIMIT {KMV_K})
    ),
    ex AS (SELECT CAST(count(*) AS BIGINT) AS exact_distinct FROM toks)
    SELECT CAST({KMV_K} AS INT) AS k,
           round({float(KMV_K - 1)!r}::DOUBLE / kf, 4) AS est_distinct,
           exact_distinct
    FROM kth, ex
"""


KMV_SQL = _kmv_sql()


HLL_M = 64  # registers (p=6); h32 = 6 register bits + 26 rho bits
HLL_ALPHA = 0.709  # Flajolet alpha_64


def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch, per event_type: estimated
    distinct (user, day) pairs next to the exact count. Registers are a
    pure INTEGER function of md5 (kernel.synth._h32 convention: register
    = h32 % m, rho = leading-zero rank of the remaining 26 bits via
    bit-length, bit-length via length(bin(w)) — no float log), so DuckDB
    reproduces every register bit-exactly; the estimate's harmonic sum
    adds exact dyadic rationals (2^-rho), which is order-independent in
    IEEE double, so even the float stage is engine-exact. Raw Flajolet
    estimator (alpha_64·m²/S) — at ~1.6k distinct per type, n/m ≈ 25 is
    the asymptotic regime, no small-range correction branch.

    Scale notes: unlike KMV (which needs a distinct pass), HLL reads the
    raw event stream — duplicates land in the same register with the
    same rho, so the build is ONE map-side-combinable groupBy on
    (event_type, register) whose shuffle carries ≤ types·m rows per map
    task, and per-shard sketches merge by register-wise max (the
    mergeable-sketch property — exactly what the combiner computes).
    At 10^12 events this replaces the count-distinct shuffle wherever
    the ~1.04/√m relative error (≈13% at m=64; m is the knob) suffices.
    The exact count alongside is verification-only."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    key = F.concat(
        F.col("user_id").cast("string"),
        F.lit("|"),
        F.to_date("ts").cast("string"),
    )
    h = _h32_col(key)
    w = F.floor(h / HLL_M).cast("long")  # exact: h < 2^32
    rho = F.when(w == 0, F.lit(27)).otherwise(27 - F.length(F.bin(w)))
    regs = (
        e.select("event_type", (h % HLL_M).alias("j"), rho.alias("rho"))
        .groupBy("event_type", "j")
        .agg(F.max("rho").alias("r"))
    )
    per_type = regs.groupBy("event_type").agg(
        (F.lit(HLL_M) - F.count("*")).cast("long").alias("n_zero_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("s_used"),
    )
    exact = e.select("event_type", key.alias("k")).groupBy("event_type").agg(
        F.count_distinct("k").alias("exact_distinct")
    )
    est = F.round(
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        / (F.col("s_used") + F.col("n_zero_registers")),
        4,
    )
    return (
        per_type.join(exact, "event_type")
        .select(
            "event_type",
            F.lit(HLL_M).cast("int").alias("m"),
            "n_zero_registers",
            est.alias("est_distinct"),
            "exact_distinct",
        )
        .orderBy("event_type")
    )


def _hll_sql() -> str:
    from gmft_spark.operators.scene_sql import _hxs

    h = _hxs(
        "md5(CAST(user_id AS VARCHAR) || '|' || "
        "CAST(CAST(ts AS DATE) AS VARCHAR))"
    )
    return f"""
    WITH hs AS (
        SELECT event_type, {h} AS h FROM events
    ),
    rr AS (
        SELECT event_type, h % {HLL_M} AS j,
               CASE WHEN h // {HLL_M} = 0 THEN 27
                    ELSE 27 - length(bin(h // {HLL_M})) END AS rho
        FROM hs
    ),
    regs AS (
        SELECT event_type, j, max(rho) AS r FROM rr GROUP BY event_type, j
    ),
    per_type AS (
        SELECT event_type,
               CAST({HLL_M} - count(*) AS BIGINT) AS n_zero_registers,
               sum(pow(2.0::DOUBLE, -r)) AS s_used
        FROM regs GROUP BY event_type
    ),
    ex AS (
        SELECT event_type,
               CAST(count(DISTINCT CAST(user_id AS VARCHAR) || '|' ||
                          CAST(CAST(ts AS DATE) AS VARCHAR)) AS BIGINT)
                   AS exact_distinct
        FROM events GROUP BY event_type
    )
    SELECT p.event_type, CAST({HLL_M} AS INT) AS m, n_zero_registers,
           round({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)!r}::DOUBLE
                 / (s_used + n_zero_registers), 4) AS est_distinct,
           exact_distinct
    FROM per_type p JOIN ex ON p.event_type = ex.event_type
    ORDER BY p.event_type
"""


HLL_SQL = _hll_sql()


def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — the hash-split every
    training-data pipeline needs: the split is a pure function of doc_id
    (md5 lower-64 fraction of the hash space), so it is stable across
    runs, engines, and partitionings — no sampling state, no seed
    plumbing, and adding documents never reassigns existing ones.
    80/10/10 by hash fraction. Shuffle-free (narrow map on the scan; the
    orderBy is oracle determinism)."""
    d = _docs(spark, sf_dir)
    frac = _md5_lower64(F.col("doc_id").cast("string")) / F.lit(_KMV_SPACE)
    split = (
        F.when(frac < 0.8, "train").when(frac < 0.9, "val").otherwise("test")
    )
    return d.select(
        "doc_id", "source", split.alias("split")
    ).orderBy("doc_id")


SPLIT_SQL = f"""
    SELECT doc_id, source,
           CASE WHEN f < 0.8::DOUBLE THEN 'train'
                WHEN f < 0.9::DOUBLE THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               CAST(md5_number_lower(CAST(doc_id AS VARCHAR)) AS DOUBLE)
                   / {_KMV_SPACE!r} AS f
        FROM documents
    )
    ORDER BY doc_id
"""


N_SHARDS = 8


def shard_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + sharding — the last mile of a
    training-data pipeline: every document gets a shard and a position
    within it, both pure functions of doc_id (named md5 draw
    ``shard|<doc_id>``), so the training order is stable across runs,
    engines, and partitionings, and appending documents never moves
    existing ones between shards. ``cum_tokens`` is the running token
    total in shard order (the byte-offset analog a sequence-packing
    loader consumes).

    Shard = floor(hash-fraction × N_SHARDS) via the portable
    md5-lower-64 recipe (_md5_lower64 == DuckDB md5_number_lower;
    identical double arithmetic both engines). Within-shard order is the
    md5 hex string — lexicographic, engine-portable.

    Scale shape: assignment is a narrow map on the scan; the per-shard
    row_number/running-sum window is the oracle form (N_SHARDS tasks).
    At 10^12 docs the same order materializes shard-parallel:
    repartitionByRange on (shard, h) + sortWithinPartitions, with
    positions as per-partition offsets (one count pass) — the order
    itself is already defined by the hash, which is the property that
    matters."""
    d = _docs(spark, sf_dir)
    key = F.concat(F.lit("shard|"), F.col("doc_id").cast("string"))
    frac = _md5_lower64(key) / F.lit(_KMV_SPACE)
    shard = F.least(
        F.floor(frac * N_SHARDS).cast("int"), F.lit(N_SHARDS - 1)
    )
    ntok = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    base = d.select(
        "doc_id",
        shard.alias("shard"),
        F.md5(key).alias("h"),
        ntok.alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("h")
    return base.select(
        "doc_id",
        "shard",
        F.row_number().over(w).alias("pos"),
        "n_tokens",
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_tokens"),
    ).orderBy("shard", "pos")


SHARD_SQL = f"""
    WITH base AS (
        SELECT doc_id,
               md5('shard|' || CAST(doc_id AS VARCHAR)) AS h,
               CAST(md5_number_lower('shard|' || CAST(doc_id AS VARCHAR))
                    AS DOUBLE) / {_KMV_SPACE!r} AS f,
               (SELECT count(*) FROM unnest(string_split(text, ' ')) AS u(t)
                WHERE t <> '') AS n_tokens
        FROM documents
    ),
    sharded AS (
        SELECT doc_id, h, n_tokens,
               least(CAST(floor(f * {N_SHARDS}) AS INT), {N_SHARDS - 1})
                   AS shard
        FROM base
    )
    SELECT doc_id, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY h) AS INT)
               AS pos,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(sum(n_tokens) OVER (
                PARTITION BY shard ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens
    FROM sharded
    ORDER BY shard, pos
"""


DRIFT_TOP_K = 20


def source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: which tokens' frequencies diverge most
    between two halves of the corpus (even- vs odd-indexed sources) —
    the distribution-shift check a training pipeline runs before mixing
    a new crawl in. The divergence score is the EXACT integer cross
    product ``n_a·total_b − n_b·total_a`` (the sign of the rate
    difference n_a/total_a − n_b/total_b scaled by total_a·total_b), so
    the ranking needs no float division and no rounding recipe at all.

    Shape: ONE token shuffle (sides pivot via conditional counts inside
    the same aggregation — never two groupBys), totals as a broadcast
    1-row frame, TakeOrdered(k) — no global sort."""
    d = _docs(spark, sf_dir)
    side = F.when(
        (F.substring("source", 4, 2).cast("int") % 2) == 0, "a"
    ).otherwise("b")
    toks = d.select(
        side.alias("side"),
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(
        F.count(F.when(F.col("side") == "a", 1)).alias("n_a"),
        F.count(F.when(F.col("side") == "b", 1)).alias("n_b"),
    )
    # totals come straight off the token stream (map-side collapse to one
    # row) — deriving them from `counts` would recompute the whole token
    # aggregation for the 1-row branch (plan-pinned)
    tot = toks.agg(
        F.count(F.when(F.col("side") == "a", 1)).alias("total_a"),
        F.count(F.when(F.col("side") == "b", 1)).alias("total_b"),
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        "n_a",
        "n_b",
        (
            F.col("n_a") * F.col("total_b") - F.col("n_b") * F.col("total_a")
        ).alias("score"),
    )
    return scored.orderBy(
        F.abs(F.col("score")).desc(), F.col("tok")
    ).limit(DRIFT_TOP_K)


SOURCE_DRIFT_SQL = f"""
    WITH toks AS (
        SELECT CASE WHEN CAST(substr(source, 4, 2) AS INT) % 2 = 0
                    THEN 'a' ELSE 'b' END AS side,
               t.tok
        FROM documents,
             unnest(string_split(text, ' ')) AS t(tok)
        WHERE t.tok <> ''
    ),
    counts AS (
        SELECT tok,
               CAST(count(*) FILTER (WHERE side = 'a') AS BIGINT) AS n_a,
               CAST(count(*) FILTER (WHERE side = 'b') AS BIGINT) AS n_b
        FROM toks
        GROUP BY tok
    ),
    tot AS (
        SELECT CAST(sum(n_a) AS BIGINT) AS total_a,
               CAST(sum(n_b) AS BIGINT) AS total_b
        FROM counts
    )
    SELECT tok, n_a, n_b,
           CAST(n_a * total_b - n_b * total_a AS BIGINT) AS score
    FROM counts, tot
    ORDER BY abs(n_a * total_b - n_b * total_a) DESC, tok
    LIMIT {DRIFT_TOP_K}
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the classic relevance signal for
    corpus exploration and keyword extraction. tf = in-doc frequency,
    idf = ln(N/df); ranking uses the ROUNDED score (round 6, both
    engines) with a token-ascending tiebreak so the cross-engine rank is
    deterministic (CLAUDE.md float-boundary rule).

    Scale shape: ONE doc-term aggregation, then per-doc totals and
    document frequencies as WINDOW sums over that same frame — no
    re-derivation joins (the naive three-branch join form recomputes the
    tf chain per branch). Five data shuffles total: tf agg, doc window,
    tok window, top-3 rank (with partial WindowGroupLimit bounding it to
    3 rows/doc pre-shuffle), final sort; the corpus size N is a 1-row
    broadcast computed straight off the scan, never a driver collect."""
    toks = _tokens(spark, sf_dir)
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    d = _docs(spark, sf_dir)
    has_tok = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ) > 0
    ndocs = d.filter(has_tok).agg(F.count("*").alias("nd"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    dfc = F.count("*").over(Window.partitionBy("tok"))
    scored = (
        tf.withColumn("n", n)
        .withColumn("df", dfc)
        .crossJoin(F.broadcast(ndocs))
        .select(
            "doc_id",
            "tok",
            F.round(
                (F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(F.col("nd").cast("double") / F.col("df").cast("double")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "score")
        .orderBy("doc_id", "rnk")
    )


TFIDF_SQL = """
    WITH toks AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    tf AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
    ntok AS (SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id),
    dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT count(DISTINCT doc_id) AS nd FROM tf),
    scored AS (
        SELECT t.doc_id, t.tok,
               round((CAST(t.c AS DOUBLE) / CAST(k.n AS DOUBLE))
                     * ln(CAST(nd.nd AS DOUBLE) / CAST(d.df AS DOUBLE)), 6)
                   AS score
        FROM tf t
        JOIN ntok k ON t.doc_id = k.doc_id
        JOIN dfreq d ON t.tok = d.tok
        CROSS JOIN nd
    )
    SELECT doc_id, CAST(rnk AS INT) AS rnk, tok, score
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rnk
        FROM scored
    )
    WHERE rnk <= 3
    ORDER BY doc_id, rnk
"""


def quality_filter_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-relative quality gating (the CCNet-style move): instead of a
    fixed cutoff, drop the bottom decile of the corpus's OWN quality
    distribution. The threshold is an exact discrete percentile — the
    smallest quality q with rank(q) >= ceil(n/10) — computed from the
    histogram of 6dp-rounded scores, NOT a percentile builtin (Spark
    interpolates, DuckDB has three quantile variants; the histogram
    cumsum is engine-proof and tie-stable under RANGE window semantics).

    Scale shape: scoring is the quality_score narrow aggregation; the
    percentile runs over the tiny (distinct-score, count) frame — one
    partial-agg shuffle of <=n_distinct rows, a window over that small
    frame, and a 1-row broadcast threshold joined back to the scan. No
    global sort of the corpus."""
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    hist = q.groupBy("quality").agg(F.count("*").alias("c"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("quality").rangeBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    n = q.agg(F.count("*").alias("cnt"))
    thr = (
        cum.crossJoin(F.broadcast(n))
        .filter(F.col("cum") >= F.expr("(cnt + 9) div 10"))
        .agg(F.min("quality").alias("threshold"))
    )
    return (
        q.crossJoin(F.broadcast(thr))
        .select(
            "doc_id",
            "quality",
            "threshold",
            F.when(F.col("quality") >= F.col("threshold"), 1)
            .otherwise(0)
            .cast("int")
            .alias("kept"),
        )
        .orderBy("doc_id")
    )


QUALITY_FILTER_SQL = f"""
    WITH q AS (SELECT doc_id, quality FROM ({QUALITY_SQL})),
    h AS (SELECT quality, count(*) AS c FROM q GROUP BY quality),
    cum AS (
        SELECT quality, sum(c) OVER (ORDER BY quality) AS cum FROM h
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM q),
    thr AS (
        SELECT min(quality) AS threshold
        FROM cum, n WHERE cum >= (cnt + 9) // 10
    )
    SELECT q.doc_id, q.quality, thr.threshold,
           CAST(CASE WHEN q.quality >= thr.threshold THEN 1 ELSE 0 END
                AS INT) AS kept
    FROM q, thr
    ORDER BY q.doc_id
"""


def bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model perplexity scoring (the CCNet/KenLM-style quality
    signal) at sandbox fidelity: train an add-1-smoothed BIGRAM model on
    the corpus itself, then score every document by its average negative
    log-likelihood per bigram — low nll ≈ fluent/common phrasing, high
    nll ≈ noise. ln values are computed once per distinct bigram and
    FIXED-POINTED (floor(x·1e6 + 0.5)) before the per-document sum, so
    the sum is an exact integer — order-independent under Spark's
    unordered partial aggregation and bit-equal to the SQL twin.

    Scale shape: one bigram-count aggregation and one context-count
    aggregation (map-side combined); vocabulary size is a 1-row broadcast;
    scoring joins doc-bigram instances to the model on the bigram key
    (sort-merge when both sides are corpus-sized; the model broadcasts
    when the vocabulary is small); the per-doc reduction is a partial-agg
    integer sum. Docs with < 2 tokens have no bigrams and are excluded."""
    return (
        _bigram_scores(spark, sf_dir)
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.col("s").cast("double") / (1000000.0 * F.col("n_bigrams")), 6
            ).alias("nll"),
        )
        .orderBy("doc_id")
    )


def _bigram_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_bigrams, s) with s = exact integer sum of fixed-point
    bigram log-probabilities — the shared core of ``bigram_nll`` and
    ``ccnet_perplexity_buckets`` (SQL twin: the ``scored`` CTE)."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    dt = d.select("doc_id", toks.alias("toks"))
    docs2 = dt.filter(F.size("toks") >= 2)
    bg = docs2.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.get("toks", i - 1).alias("a"), F.get("toks", i).alias("b")
                ),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    counts = bg.groupBy("a", "b").agg(F.count("*").alias("c"))
    ctx = bg.groupBy("a").agg(F.count("*").alias("cx"))
    vocab = (
        dt.select(F.explode("toks").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    model = (
        counts.join(ctx, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "b",
            F.floor(
                (F.log(F.col("c") + 1) - F.log(F.col("cx") + F.col("v")))
                * 1000000.0
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lnp_fixed"),
        )
    )
    return (
        bg.join(model, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lnp_fixed").cast("long").alias("s"),
        )
    )


# shared by BIGRAM_NLL_SQL and CCNET_BUCKETS_SQL: the add-1 bigram model
# and the per-document exact-integer score (s = sum of fixed-point ln p).
_BIGRAM_CTES = """
    WITH dt AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    d2 AS (SELECT doc_id, toks FROM dt WHERE len(toks) >= 2),
    idx AS (
        SELECT doc_id, toks,
               CAST(unnest(range(1, len(toks))) AS INT) AS i
        FROM d2
    ),
    bg AS (SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM idx),
    counts AS (SELECT a, b, count(*) AS c FROM bg GROUP BY a, b),
    ctx AS (SELECT a, count(*) AS cx FROM bg GROUP BY a),
    vocab AS (
        SELECT count(DISTINCT tok) AS v
        FROM (SELECT unnest(toks) AS tok FROM dt)
    ),
    model AS (
        SELECT counts.a, counts.b,
               CAST(floor((ln(counts.c + 1) - ln(ctx.cx + vocab.v))
                          * 1000000.0 + 0.5) AS BIGINT) AS lnp_fixed
        FROM counts JOIN ctx ON counts.a = ctx.a, vocab
    ),
    scored AS (
        SELECT bg.doc_id,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(m.lnp_fixed) AS BIGINT) AS s
        FROM bg JOIN model m ON bg.a = m.a AND bg.b = m.b
        GROUP BY bg.doc_id
    )"""


BIGRAM_NLL_SQL = (
    _BIGRAM_CTES
    + """
    SELECT doc_id, n_bigrams,
           round(-CAST(s AS DOUBLE) / (1000000.0 * n_bigrams), 6) AS nll
    FROM scored
    ORDER BY doc_id
"""
)


def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): within each source, rank documents by LM
    perplexity (here the corpus-trained bigram NLL — same exact-integer
    score as ``bigram_nll``) and split into terciles — ``head`` (most
    fluent third, kept unconditionally in CCNet), ``middle``, ``tail``
    (usually dropped). Per-source (not global) terciles are the point:
    they keep the quality gate from silently deleting whole domains whose
    baseline perplexity runs high.

    Cross-engine exactness: the rank orders on the UNROUNDED double
    ``-s / (1e6 · n)`` — both engines divide the same exact integers with
    the same IEEE expression, so the doubles are bit-equal (the
    scene_sql.py rule) — with doc_id as the total-order tiebreak; NTILE
    then assigns identically (both engines give earlier buckets the
    ceil-sized groups).

    Scale shape: everything up to ``scored`` is bigram_nll's plan (two
    map-side-combined count aggregations + one key join); the bucketing
    adds one source-keyed window — sources are the natural partition of a
    curation corpus, so the window shuffle is bounded and skew-safe (a
    giant source still sorts only its own rows, and CCNet's own chunking
    answer — shard the source, bucket per shard — drops in without
    changing the rank rule)."""
    scores = _bigram_scores(spark, sf_dir)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    nll = -F.col("s").cast("double") / (1000000.0 * F.col("n_bigrams"))
    w = Window.partitionBy("source").orderBy(
        nll.asc(), F.col("doc_id").asc()
    )
    bucket = F.ntile(3).over(w)
    return (
        scores.join(src, "doc_id")
        .select(
            "doc_id",
            "source",
            "n_bigrams",
            F.round(nll, 6).alias("nll"),
            bucket.cast("int").alias("bucket"),
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), bucket
            ).alias("bucket_label"),
        )
        .orderBy("doc_id")
    )


CCNET_BUCKETS_SQL = (
    _BIGRAM_CTES
    + """
    SELECT s.doc_id, d.source, s.n_bigrams,
           round(-CAST(s.s AS DOUBLE) / (1000000.0 * s.n_bigrams), 6) AS nll,
           CAST(ntile(3) OVER (
               PARTITION BY d.source
               ORDER BY -CAST(s.s AS DOUBLE) / (1000000.0 * s.n_bigrams) ASC,
                        s.doc_id ASC) AS INT) AS bucket,
           CASE ntile(3) OVER (
               PARTITION BY d.source
               ORDER BY -CAST(s.s AS DOUBLE) / (1000000.0 * s.n_bigrams) ASC,
                        s.doc_id ASC)
                WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail'
           END AS bucket_label
    FROM scored s JOIN documents d ON s.doc_id = d.doc_id
    ORDER BY s.doc_id
"""
)


def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation extraction (the single-round vocabulary-induction
    signal): top-20 adjacent word pairs by pointwise mutual information
    over bigram positions — PMI = ln(c(a,b)·N / (c(a,·)·c(·,b))) — with a
    min-count floor of 5. Each ln is fixed-pointed per distinct count
    before the integer combination, so ranking is exact cross-engine
    (ln of identical doubles, then pure integer arithmetic).

    Scale shape: one bigram-count aggregation plus two marginal
    aggregations OVER the (much smaller) bigram-count frame; N is a 1-row
    broadcast; the top-20 is a TakeOrdered, never a global sort of the
    pair space."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    docs2 = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    bg = docs2.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - 1),
                lambda i: F.struct(
                    F.get("toks", i - 1).alias("a"), F.get("toks", i).alias("b")
                ),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    counts = bg.groupBy("a", "b").agg(F.count("*").alias("c"))
    ca = counts.groupBy("a").agg(F.sum("c").alias("ca"))
    cb = counts.groupBy("b").agg(F.sum("c").alias("cb"))
    n = counts.agg(F.sum("c").alias("nb"))

    def _lnfx(col):
        return F.floor(F.log(col) * 1000000.0 + F.lit(0.5)).cast("long")

    scored = (
        counts.filter(F.col("c") >= 5)
        .join(ca, "a")
        .join(cb, "b")
        .crossJoin(F.broadcast(n))
        .select(
            "a",
            "b",
            "c",
            (
                _lnfx(F.col("c"))
                + _lnfx(F.col("nb"))
                - _lnfx(F.col("ca"))
                - _lnfx(F.col("cb"))
            ).alias("pmi_x1e6"),
        )
    )
    return scored.orderBy(
        F.col("pmi_x1e6").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(20)


COLLOCATIONS_SQL = """
    WITH dt AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    ),
    d2 AS (SELECT doc_id, toks FROM dt WHERE len(toks) >= 2),
    idx AS (
        SELECT doc_id, toks,
               CAST(unnest(range(1, len(toks))) AS INT) AS i
        FROM d2
    ),
    bg AS (SELECT toks[i] AS a, toks[i + 1] AS b FROM idx),
    counts AS (SELECT a, b, count(*) AS c FROM bg GROUP BY a, b),
    ca AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM counts GROUP BY a),
    cb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM counts GROUP BY b),
    n AS (SELECT CAST(sum(c) AS BIGINT) AS nb FROM counts)
    SELECT k.a, k.b, CAST(k.c AS BIGINT) AS c,
           CAST(floor(ln(k.c) * 1000000.0 + 0.5) AS BIGINT)
           + CAST(floor(ln(n.nb) * 1000000.0 + 0.5) AS BIGINT)
           - CAST(floor(ln(ca.ca) * 1000000.0 + 0.5) AS BIGINT)
           - CAST(floor(ln(cb.cb) * 1000000.0 + 0.5) AS BIGINT) AS pmi_x1e6
    FROM counts k
    JOIN ca ON k.a = ca.a
    JOIN cb ON k.b = cb.b, n
    WHERE k.c >= 5
    ORDER BY pmi_x1e6 DESC, k.a ASC, k.b ASC
    LIMIT 20
"""


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pre-dedup normalization (the CCNet/Gopher first
    stage): lowercase, strip every character outside [a-z0-9 ], collapse
    whitespace runs, trim. Runs over text that actually carries case and
    punctuation (customer names like "Customer#000000001 MACHINERY") plus
    an already-clean source (part names) so BOTH the changed and identity
    paths are value-checked; ``documents`` text is pre-normalized by
    construction and would make this a no-op.

    The character class is explicit ASCII on purpose: Java regex and RE2
    agree on it byte-for-byte (Unicode classes like \\p{{P}} do not agree
    across engines — the same reason NFKC is out of scope here). Pure
    narrow map over both scans, zero shuffles before the output sort."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").cast("long").alias("id"),
        # F.concat (NULL-propagating) not concat_ws (NULL-skipping): the
        # oracle's `||` propagates NULL, so the engines must agree on it
        F.concat("c_name", F.lit(" "), "c_mktsegment").alias("text"),
    )
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        F.lit("part").alias("src"),
        F.col("p_partkey").cast("long").alias("id"),
        F.col("p_name").alias("text"),
    )
    d = cust.unionByName(part)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return d.select(
        "src",
        "id",
        F.length("text").cast("long").alias("n_chars"),
        F.length(norm).cast("long").alias("n_norm_chars"),
        F.md5(norm).alias("norm_hash"),
        (norm != F.col("text")).alias("changed"),
    ).orderBy("src", "id")


NORMALIZE_SQL = """
    WITH src AS (
        SELECT 'customer' AS src, CAST(c_custkey AS BIGINT) AS id,
               c_name || ' ' || c_mktsegment AS text
        FROM customer
        UNION ALL
        SELECT 'part' AS src, CAST(p_partkey AS BIGINT) AS id,
               p_name AS text
        FROM part
    ),
    n AS (
        SELECT src, id, text,
               trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        FROM src
    )
    SELECT src, id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(length(norm) AS BIGINT) AS n_norm_chars,
           md5(norm) AS norm_hash,
           (norm <> text) AS changed
    FROM n
    ORDER BY src, id
"""


CMS_D = 4  # hash rows
CMS_W = 64  # buckets per row (small on purpose: collisions must occur at
#             test scale so the estimate column actually exercises the
#             min-over-rows bound, not just echo the exact count)
CMS_TOPK = 20


def _h32_col(col):
    """First 8 hex chars of md5 as a 32-bit int (Spark twin of
    kernel.synth._h32 / scene_sql._hxs)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the corpus token stream, probed at the exact
    top-K tokens — estimate next to truth so the sketch's one-sided error
    is part of the checked output.

    The sketch is the classic fixed-size mergeable frequency summary: d
    hash rows × w buckets of counters; est(tok) = min_i cell[i][h_i(tok)],
    always ≥ the true count. Hashes are md5-derived (kernel.synth._h32
    convention) so DuckDB reproduces every bucket assignment bit-exactly.

    Scale notes: the sketch build is ONE map-side-combinable groupBy on
    (row, bucket) — d·w = 256 cells total regardless of vocabulary size,
    so partial aggregation does essentially all the work and the shuffle
    carries ≤ 256 rows per map task. Per-shard sketches merge by cell-wise
    addition (the mergeable-sketch property), which is exactly what the
    combiner does. The probe side broadcasts the 256-cell sketch. At
    100 TB this replaces a full token-frequency shuffle wherever an
    upper-bound frequency suffices (heavy-hitter gating, stopword
    induction)."""
    toks = _tokens(spark, sf_dir)
    counts = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_count"))
        # feeds probes AND the exact top-k: materialize the corpus
        # aggregation once rather than replaying the scan+shuffle
        .localCheckpoint(eager=True)
    )
    probes = counts.select(
        "tok",
        "exact_count",
        F.explode(F.array(*[F.lit(i) for i in range(CMS_D)])).alias("r"),
    ).withColumn(
        "b",
        _h32_col(F.concat(F.col("r").cast("string"), F.lit("|"), F.col("tok")))
        % CMS_W,
    ).localCheckpoint(eager=True)  # feeds the sketch build AND the probe join
    sketch = probes.groupBy("r", "b").agg(F.sum("exact_count").alias("cell"))
    top = counts.orderBy(F.desc("exact_count"), F.asc("tok")).limit(CMS_TOPK)
    est = (
        top.join(probes.select("tok", "r", "b"), "tok")
        .join(F.broadcast(sketch), ["r", "b"])
        .groupBy("tok", "exact_count")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    return est.select("tok", "exact_count", "cms_estimate").orderBy(
        F.desc("exact_count"), F.asc("tok")
    )


def _cms_sql() -> str:
    from gmft_spark.operators.scene_sql import _hxs

    h = _hxs("md5(CAST(r AS VARCHAR) || '|' || tok)")
    bucket = f"({h} % {CMS_W})"
    return f"""
    WITH t AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    toks AS (SELECT tok FROM t WHERE tok <> ''),
    counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS exact_count
        FROM toks GROUP BY tok
    ),
    probes AS (
        SELECT tok, exact_count, r, {bucket} AS b
        FROM counts, (SELECT unnest([{", ".join(str(i) for i in range(CMS_D))}]) AS r)
    ),
    sketch AS (
        SELECT r, b, CAST(sum(exact_count) AS BIGINT) AS cell
        FROM probes GROUP BY r, b
    ),
    top AS (
        SELECT tok, exact_count FROM counts
        ORDER BY exact_count DESC, tok ASC LIMIT {CMS_TOPK}
    )
    SELECT top.tok, top.exact_count, min(s.cell) AS cms_estimate
    FROM top
    JOIN probes p ON top.tok = p.tok
    JOIN sketch s ON s.r = p.r AND s.b = p.b
    GROUP BY top.tok, top.exact_count
    ORDER BY top.exact_count DESC, top.tok ASC
"""


CMS_SQL = _cms_sql()


# BM25 retrieval (Robertson/Okapi): the standard ranked-retrieval scorer
# a curation stack uses to pull topical slices out of a corpus (tfidf
# above is the per-doc keyword view; this is the query→corpus view).
BM25_TERMS = ["hash", "join", "stream", "batch"]  # fixed demo query
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval for a fixed term query. Per matched
    (doc, term): idf·tf-saturation with doc-length normalization,
    idf = ln(1 + (N − df + 0.5)/(df + 0.5)) (the Robertson-Sparck-Jones
    form, always positive), tf_norm = tf·(k1+1)/(tf + k1·(1 − b +
    b·dl/avgdl)). Each per-term score is FIXED-POINTED (floor(x·1e6+0.5))
    before the per-doc sum (CLAUDE.md cross-engine recipe: never sum raw
    doubles under groupBy), and the final rank breaks ties doc_id
    ascending.

    Scale shape: the inverted-index topology — the corpus tokenizes once;
    the tf aggregation is PRE-FILTERED to the query terms (predicate
    reaches the scan side of the shuffle, so the shuffle carries only
    matching postings, not the corpus); df and the corpus stats are tiny
    1-row/4-row broadcasts; dl joins on doc_id (sort-merge at corpus
    scale); the final TakeOrdered(k) never materializes a global sort."""
    toks = _tokens(spark, sf_dir)
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_toks_expr = F.size(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    )
    stats = _docs(spark, sf_dir).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_toks_expr).alias("tot"),
    )
    tf = (
        toks.filter(F.col("tok").isin(*BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    avgdl = F.col("tot").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_norm = (F.col("tf") * F.lit(BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(BM25_K1)
        * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(F.broadcast(dfq), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.floor(idf * tf_norm * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .alias("s_fp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_terms"),
            F.sum("s_fp").alias("bm25_fp"),
        )
        .orderBy(F.col("bm25_fp").desc(), F.col("doc_id").asc())
        .limit(BM25_TOPK)
    )


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
    WITH tk AS (
        SELECT doc_id, tok FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents
        ) WHERE tok <> ''
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tk
           GROUP BY doc_id),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(len(list_filter(string_split(text, ' '),
                                        x -> x <> ''))) AS BIGINT) AS tot
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
           WHERE tok IN ({terms}) GROUP BY doc_id, tok),
    dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf
            GROUP BY tok),
    scored AS (
        SELECT t.doc_id,
               CAST(floor(
                   ln(1.0::DOUBLE + (s.n_docs - q.df + 0.5::DOUBLE)
                                    / (q.df + 0.5::DOUBLE))
                   * ((t.tf * {BM25_K1 + 1.0}::DOUBLE)
                      / (t.tf + {BM25_K1}::DOUBLE
                         * ({1.0 - BM25_B}::DOUBLE
                            + {BM25_B}::DOUBLE * l.dl
                              / (CAST(s.tot AS DOUBLE)
                                 / CAST(s.n_docs AS DOUBLE)))))
                   * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS s_fp
        FROM tf t
        JOIN dfq q USING (tok)
        JOIN dl l USING (doc_id)
        CROSS JOIN stats s
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           CAST(sum(s_fp) AS BIGINT) AS bm25_fp
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25_fp DESC, doc_id ASC
    LIMIT {BM25_TOPK}
"""


BM25_SQL = _bm25_sql()


QUERIES = {
    "text_lang_id": (lang_id, LANG_ID_SQL),
    "text_lang_id_accuracy": (lang_id_accuracy, LANG_ACCURACY_SQL),
    "text_nb_lang_classifier": (nb_lang_classify, NB_LANG_SQL),
    "text_char_entropy": (char_entropy, CHAR_ENTROPY_SQL),
    "text_quality_score": (quality_score, QUALITY_SQL),
    "text_quality_filter_adaptive": (quality_filter_adaptive, QUALITY_FILTER_SQL),
    "text_bigram_nll": (bigram_nll, BIGRAM_NLL_SQL),
    "ccnet_perplexity_buckets": (ccnet_perplexity_buckets, CCNET_BUCKETS_SQL),
    "text_collocations_pmi": (collocations_pmi, COLLOCATIONS_SQL),
    "text_token_counts": (token_counts, TOKEN_COUNTS_SQL),
    "text_normalize": (normalize_text, NORMALIZE_SQL),
    "text_rare_token_ratio": (rare_token_ratio, RARE_TOKEN_SQL),
    "text_repetition_stats": (repetition_stats, REPETITION_SQL),
    "sketch_kmv_distinct": (sketch_kmv_distinct, KMV_SQL),
    "sketch_hll_distinct": (sketch_hll_distinct, HLL_SQL),
    "sketch_cms_heavy_hitters": (sketch_cms_heavy_hitters, CMS_SQL),
    "split_train_val_test": (split_train_val_test, SPLIT_SQL),
    "shard_training_corpus": (shard_training_corpus, SHARD_SQL),
    "text_source_drift": (source_drift, SOURCE_DRIFT_SQL),
    "text_tfidf_top_terms": (tfidf_top_terms, TFIDF_SQL),
    "text_bm25_topk": (bm25_topk, BM25_SQL),
    "dedup_cross_source_overlap": (cross_source_overlap, CROSS_SOURCE_SQL),
}
