"""Deduplication operators over the ``documents`` table.

First-class components of a 100 TB training-data pipeline. All hashing is
done with md5 (hex string) so the Spark query and the DuckDB oracle agree
bit-for-bit on every engine; MinHash permutations are salted md5s whose
*lexicographic* min is the signature component (string order is
engine-independent, unlike numeric hash functions).

Scale notes: exact dedup is a single hash-shuffle; MinHash/LSH shuffles
shingles once (explode → groupBy doc), then bands once (groupBy band) —
band buckets are the classic sub-quadratic path; the pairwise Jaccard
verifier only runs inside buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_MINHASH = 6  # salted permutations
SHINGLE = 3  # words per shingle


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash (hash-groupBy; one shuffle)."""
    d = _docs(spark, sf_dir)
    return (
        d.select(F.md5(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .filter(F.col("n_docs") >= 1)
        .orderBy("content_hash")
    )


DEDUP_EXACT_SQL = """
    SELECT md5(text) AS content_hash,
           count(*) AS n_docs,
           min(doc_id) AS min_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) >= 1
    ORDER BY content_hash
"""


def _shingles(
    spark: SparkSession, sf_dir: str, extra_cols: tuple = ()
) -> DataFrame:
    """(doc_id, [*extra_cols,] shingle) — distinct word 3-grams. Built as
    an array expression on the scan (per-doc dedup via array_distinct is
    partition-local), replacing the explode→window→distinct chain that
    cost two shuffles before any consumer ran. ``extra_cols`` carries
    per-doc metadata (e.g. blocking keys) through the explode so
    consumers never need a metadata-attach join."""
    d = _docs(spark, sf_dir)
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    pre = d.select("doc_id", *extra_cols, toks.alias("tk"))
    carried = [c for c in pre.columns if c not in ("doc_id", "tk")]
    return pre.filter(F.size("tk") >= SHINGLE).select(
        "doc_id",
        *carried,
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - (SHINGLE - 1)),
                    lambda i: _mk_shingle(F.col("tk"), i),
                )
            )
        ).alias("shingle"),
    )


SHINGLES_SQL = """
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w
                 AS shingle,
               lead(tok, 2) OVER w AS t2
        FROM (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   generate_subscripts(string_split(text, ' '), 1) AS pos
            FROM documents
        )
        WHERE tok <> ''
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ) WHERE t2 IS NOT NULL
"""


def _mk_shingle(tk, i):
    """Helper binding the array column (CLAUDE.md lambda-index gotcha)."""
    return F.concat_ws(
        " ",
        F.element_at(tk, i),
        F.element_at(tk, i + 1),
        F.element_at(tk, i + 2),
    )


def minhash_signatures_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc MinHash signature computed entirely as array expressions —
    shingling and all N salted minima run inside whole-stage codegen on
    the scan, ZERO shuffles (the previous explode→window→distinct→groupBy
    chain cost 4 exchanges per use and was recomputed per band branch).
    min() is duplicate-insensitive, so skipping the distinct-shingle set
    leaves every signature identical. Frame-level core shared by the
    gate queries and the incremental-crawl composition
    (jobs/run_web_ingest.py --corpus-snapshot-table)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    out = (
        docs.select(id_col, toks.alias("tk"))
        .filter(F.size("tk") >= SHINGLE)
        .select(
            id_col,
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - (SHINGLE - 1)),
                lambda i: _mk_shingle(F.col("tk"), i),
            ).alias("sh"),
        )
    )

    def salted_min(k: int):
        # helper binds k OUTSIDE the lambda: a defaulted second lambda
        # parameter would receive the element INDEX (CLAUDE.md gotcha)
        salt = f"s{k}|"
        return F.array_min(
            F.transform("sh", lambda s: F.md5(F.concat(F.lit(salt), s)))
        )

    return out.select(
        id_col, *[salted_min(k).alias(f"mh{k}") for k in range(N_MINHASH)]
    )


def minhash_band_rows_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, band, bucket) rows — THE storable band index (what
    ``dedup_incremental``'s docstring calls 'in production a bucketed
    table keyed on (band, bucket)'). A new batch's rows equi-join a
    landed index on (band, bucket) to find corpus near-dup matches
    with zero corpus self-pairs and cost O(|new| * bands). Documents
    shorter than the shingle width yield no rows (they cannot minhash
    and are never deduped by this channel)."""
    sig = minhash_signatures_frame(docs, id_col=id_col, text_col=text_col)
    return sig.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
                    )
                    for b in range(N_MINHASH // 2)
                ]
            )
        ).alias("band", "bucket"),
    )


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures_frame(_docs(spark, sf_dir))


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature: min(md5(salt || shingle)) per salt."""
    return _signatures(spark, sf_dir).orderBy("doc_id")


MINHASH_SQL = f"""
    WITH shingles AS ({SHINGLES_SQL})
    SELECT doc_id,
           {", ".join(f"min(md5('s{k}|' || shingle)) AS mh{k}" for k in range(N_MINHASH))}
    FROM shingles
    GROUP BY doc_id
    ORDER BY doc_id
"""


def _lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct LSH candidate pairs (doc_a < doc_b), un-ordered — the
    shared core of ``dedup_minhash_lsh`` and ``dedup_minhash_clusters``.

    Candidate generation is a (band, bucket) SELF EQUI-JOIN over the
    materialized band index — the same shape as
    ``similarity.embedding_knn_join``. The round-3 form (groupBy +
    collect_list + in-row i<j expansion) put a pathological bucket's
    entire membership into ONE row and ONE task: an O(|bucket|²) array
    build that AQE cannot split (VERDICT r3 item #2). The equi-join
    produces the identical pair set, but a mega-bucket becomes a skewed
    join key that AQE's skew-join handling splits across tasks.

    Shuffle budget: signatures are shuffle-free array expressions, all
    bands leave one scan via posexplode, the band index materializes ONCE
    (localCheckpoint — without it the self-join would re-evaluate the
    whole signature chain on both sides), then one join shuffle + the
    distinct shuffle. At cluster scale the checkpoint is the standard
    persist-the-index step, and a stored (band, bucket)-bucketed index
    table makes the join exchange-free on the corpus side."""
    sig = _signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(
                        F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}"))
                    )
                    for b in range(N_MINHASH // 2)
                ]
            )
        ).alias("band", "bucket"),
    ).localCheckpoint(eager=True)
    a, b = bands.alias("a"), bands.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    return pairs.select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    ).distinct()


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: signature split into bands of 2 minhashes; docs sharing
    a band hash are near-dup candidates. Output: candidate pairs.
    (Shuffle-budget notes on ``_lsh_candidate_pairs``.)"""
    return _lsh_candidate_pairs(spark, sf_dir).orderBy("doc_a", "doc_b")


def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive canonicalization of the MinHash-LSH near-dup graph
    (reference behavior: a dedup pass keeps ONE representative per dup
    cluster, not one per pairwise edge): LSH candidate pairs become
    symmetric edges, alternating-star connected components
    (``connected_components_star`` — O(log diameter) rounds over a
    checkpointed edge set, robust to adversarially long dup chains)
    collapse chain-shaped clusters a~b~c to a single canonical doc_id. Every document gets a row; docs outside any
    cluster are their own canonical. The DuckDB twin is a recursive-CTE
    reachability minimum, exactly like ``dedup_embedding_cosine``."""
    from gmft_spark.operators.similarity import connected_components_star

    pairs = _lsh_candidate_pairs(spark, sf_dir)
    neighbors = pairs.select(
        F.col("doc_a").alias("vec_id"), F.col("doc_b").alias("nb")
    ).union(
        pairs.select(F.col("doc_b").alias("vec_id"), F.col("doc_a").alias("nb"))
    )
    vertices = _docs(spark, sf_dir).select(F.col("doc_id").alias("vec_id"))
    comp = connected_components_star(vertices, neighbors)
    return (
        comp.select(
            F.col("vec_id").alias("doc_id"),
            "canonical_id",
            (F.col("canonical_id") < F.col("vec_id")).cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


# shared sig → bands → candidate-pair CTE chain: BOTH minhash oracles
# compose this single fragment, so a banding change cannot desynchronize
# the pair oracle from the cluster oracle
_LSH_PAIRS_CTES = f"""sig AS ({MINHASH_SQL}),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || mh{2 * b + 1}) AS bucket FROM sig"
            for b in range(N_MINHASH // 2)
        )}
    ),
    pf AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )"""


DEDUP_MINHASH_SQL = f"""
    WITH {_LSH_PAIRS_CTES}
    SELECT doc_a, doc_b FROM pf
    ORDER BY doc_a, doc_b
"""


DEDUP_MINHASH_CLUSTERS_SQL = f"""
    WITH RECURSIVE {_LSH_PAIRS_CTES},
    nb AS (
        SELECT doc_a AS vec_id, doc_b AS nb FROM pf
        UNION ALL
        SELECT doc_b AS vec_id, doc_a AS nb FROM pf
    ),
    -- transitive closure: minimum over every doc reachable through LSH
    -- candidate edges (recursive reachability; UNION dedups, so it
    -- terminates at the component closure)
    reach AS (
        SELECT doc_id AS src, doc_id AS dst FROM documents
        UNION
        SELECT r.src, n.nb AS dst
        FROM reach r
        JOIN nb n ON r.dst = n.vec_id
    )
    SELECT src AS doc_id,
           min(dst) AS canonical_id,
           (CASE WHEN min(dst) < src THEN 1 ELSE 0 END)::INT AS is_dup
    FROM reach
    GROUP BY src
    ORDER BY doc_id
"""


INCREMENTAL_SPLIT = 400  # docs >= this id play the "newly ingested" batch


def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) dedup — the dominant production
    shape: a NEW batch of documents is checked against the EXISTING
    corpus's MinHash band index, never against itself and never
    re-pairing the corpus. Per new doc: how many corpus band-matches it
    has and the smallest matching corpus doc (its canonical if dup).

    Scale notes: the corpus side of the join is the stored band index
    (in production a bucketed table keyed on (band, bucket) — the join
    co-locates without shuffling the corpus); only the new batch
    shuffles. Cost per ingest is O(|new| · bands), independent of corpus
    self-pair count."""
    sig = _signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.concat(F.col(f"mh{2 * b}"), F.col(f"mh{2 * b + 1}")))
                    for b in range(N_MINHASH // 2)
                ]
            )
        ).alias("band", "bucket"),
    )
    corpus = bands.filter(F.col("doc_id") < INCREMENTAL_SPLIT).select(
        "band", "bucket", F.col("doc_id").alias("corpus_id")
    )
    new = bands.filter(F.col("doc_id") >= INCREMENTAL_SPLIT)
    matches = (
        new.join(corpus, ["band", "bucket"])
        .select("doc_id", "corpus_id")
        .distinct()
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_corpus_matches"),
            F.min("corpus_id").alias("first_match"),
        )
    )
    new_docs = _docs(spark, sf_dir).filter(
        F.col("doc_id") >= INCREMENTAL_SPLIT
    ).select("doc_id")
    return (
        new_docs.join(matches, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_corpus_matches", F.lit(0).cast("long")).alias(
                "n_corpus_matches"
            ),
            "first_match",
            (F.col("n_corpus_matches").isNotNull()).cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


DEDUP_INCREMENTAL_SQL = f"""
    WITH sig AS ({MINHASH_SQL}),
    bands AS (
        {" UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, md5(mh{2 * b} || mh{2 * b + 1}) AS bucket FROM sig"
            for b in range(N_MINHASH // 2)
        )}
    ),
    m AS (
        SELECT n.doc_id,
               count(DISTINCT c.doc_id) AS n_corpus_matches,
               min(c.doc_id) AS first_match
        FROM bands n
        JOIN bands c ON n.band = c.band AND n.bucket = c.bucket
                    AND c.doc_id < {INCREMENTAL_SPLIT}
        WHERE n.doc_id >= {INCREMENTAL_SPLIT}
        GROUP BY n.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(m.n_corpus_matches, 0) AS BIGINT) AS n_corpus_matches,
           m.first_match,
           (CASE WHEN m.doc_id IS NOT NULL THEN 1 ELSE 0 END)::INT AS is_dup
    FROM documents d
    LEFT JOIN m ON d.doc_id = m.doc_id
    WHERE d.doc_id >= {INCREMENTAL_SPLIT}
    ORDER BY d.doc_id
"""


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked n-gram Jaccard similarity: candidate pairs share
    (lang, length-bucket); J = |A∩B| / |A∪B| over distinct shingles.
    Returns pairs with J >= 0.2.

    Scale design — inverted index, not pair enumeration: the shingle
    table self-joins on the shingle (each row carries its doc's block
    key), so only pairs that actually SHARE content ever materialize.
    A block-pair enumeration is O(n²) per block even when nothing
    overlaps — at corpus scale a 1M-doc block would emit 10^12 candidate
    rows regardless of similarity; the inverted index costs
    O(Σ_shingle df²), bounded in practice because natural-text shingle
    document-frequency is heavy-tailed-but-small within a block (a
    df-cap on pathological hot shingles is the standard knob if a corpus
    violates that; not applied here so the DuckDB twin stays exact).
    Pairs sharing zero shingles have J=0 < 0.2, so the output is
    identical to the enumeration form."""
    sh = _shingles(
        spark,
        sf_dir,
        extra_cols=(
            "lang",
            F.floor(F.col("n_chars") / 64).cast("int").alias("lb"),
        ),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))

    inter = (
        sh.alias("sa")
        .join(
            sh.alias("sb"),
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.lang") == F.col("sb.lang"))
            & (F.col("sa.lb") == F.col("sb.lb"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"), F.col("sb.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.col("za.sz") + F.col("zb.sz") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
        .orderBy("doc_a", "doc_b")
    )


NGRAM_JACCARD_SQL = f"""
    WITH shingles AS ({SHINGLES_SQL}),
    sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
    d AS (SELECT doc_id, lang, CAST(floor(n_chars / 64.0) AS INT) AS lb FROM documents),
    pairs AS (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM d x JOIN d y
          ON x.lang = y.lang AND x.lb = y.lb AND x.doc_id < y.doc_id
    ),
    inter AS (
        SELECT p.doc_a, p.doc_b, count(*) AS n_inter
        FROM pairs p
        JOIN shingles sa ON p.doc_a = sa.doc_id
        JOIN shingles sb ON p.doc_b = sb.doc_id AND sa.shingle = sb.shingle
        GROUP BY p.doc_a, p.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes za ON i.doc_a = za.doc_id
    JOIN sizes zb ON i.doc_b = zb.doc_id
    -- filter on the ROUNDED value, matching the Spark filter (CLAUDE.md
    -- float rule: round both sides before any boundary comparison)
    WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6) >= 0.2
    ORDER BY doc_a, doc_b
"""


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document: each token votes ±1 on every bit of its
    (portable hex) hash; sign of the sum gives the bit.

    One ``groupBy(doc_id)`` with 16 conditional sums — the earlier
    formulation crossJoined every token row with a 16-row bit table, so
    16× the token stream flowed through the aggregate hash map; here each
    token row contributes its 16 votes as map-side partial-aggregated
    columns, one exchange of ≤1 row per doc (plan pinned in
    tests/test_physical_plans.py::test_simhash_single_exchange)."""
    d = _docs(spark, sf_dir)
    toks = (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
    )
    # portable hex→int: value of first 4 hex chars of md5(token)
    hexv = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("long")
    toks = toks.select("doc_id", hexv.alias("hv"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("hv"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(16)
        ]
    )
    packed = None
    for b in range(16):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(0)
        packed = term if packed is None else packed + term
    return votes.select(
        "doc_id", packed.cast("long").alias("simhash")
    ).orderBy("doc_id")


SIMHASH_SQL = (
    """
    WITH toks AS (
        SELECT doc_id, u.tok
        FROM documents, LATERAL unnest(string_split(text, ' ')) AS u(tok)
        WHERE u.tok <> ''
    ),
    hv AS (
        SELECT doc_id,
               (CASE WHEN substr(md5(tok),1,1) BETWEEN '0' AND '9'
                     THEN ascii(substr(md5(tok),1,1)) - 48
                     ELSE ascii(substr(md5(tok),1,1)) - 87 END) * 4096
             + (CASE WHEN substr(md5(tok),2,1) BETWEEN '0' AND '9'
                     THEN ascii(substr(md5(tok),2,1)) - 48
                     ELSE ascii(substr(md5(tok),2,1)) - 87 END) * 256
             + (CASE WHEN substr(md5(tok),3,1) BETWEEN '0' AND '9'
                     THEN ascii(substr(md5(tok),3,1)) - 48
                     ELSE ascii(substr(md5(tok),3,1)) - 87 END) * 16
             + (CASE WHEN substr(md5(tok),4,1) BETWEEN '0' AND '9'
                     THEN ascii(substr(md5(tok),4,1)) - 48
                     ELSE ascii(substr(md5(tok),4,1)) - 87 END) AS hv
        FROM toks
    ),
    votes AS (
        SELECT doc_id, """
    + ", ".join(
        f"sum(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    + """
        FROM hv
        GROUP BY doc_id
    )
    SELECT doc_id,
           CAST("""
    + " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {2**b} ELSE 0 END)" for b in range(16)
    )
    + """ AS BIGINT) AS simhash
    FROM votes
    ORDER BY doc_id
"""
)


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased text with
    non-alphanumerics collapsed — catches whitespace/punctuation near-dups."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    return d.select(
        "doc_id", F.md5(F.trim(norm)).alias("fingerprint")
    ).orderBy("doc_id")


DOC_FINGERPRINT_SQL = """
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
             AS fingerprint
    FROM documents
    ORDER BY doc_id
"""


WINNOW_K = 8  # character k-gram length
WINNOW_W = 4  # winnowing window (k-grams per window)


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken): hash
    every character k-gram, slide a w-window over the hash sequence, keep
    each window's minimum — the classic rolling-hash selection used for
    plagiarism/near-dup detection. Hashes are md5 hex so the lexicographic
    window-min is engine-independent. Output: per-doc distinct fingerprint
    count + the global minimum fingerprint (stable summary)."""
    d = _docs(spark, sf_dir)
    # whole pipeline as array expressions on the scan (no per-doc window
    # shuffle): k-gram hashes -> per-position window minima via slice
    # (slice caps at the array end, matching the shorter tail windows of
    # the ROWS BETWEEN CURRENT AND W-1 FOLLOWING frame)
    hashes = F.expr(
        f"transform(sequence(1, length(text) - {WINNOW_K} + 1), "
        f"i -> md5(substring(text, i, {WINNOW_K})))"
    )
    hcol = F.when(F.length("text") >= WINNOW_K, hashes).otherwise(
        F.array().cast("array<string>")
    )
    wmins = F.expr(
        f"transform(sequence(1, size(hs)), "
        f"i -> array_min(slice(hs, i, {WINNOW_W})))"
    )
    return (
        d.select("doc_id", hcol.alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", wmins.alias("wm"))
        .select(
            "doc_id",
            F.size(F.array_distinct("wm")).cast("long").alias(
                "n_fingerprints"
            ),
            F.array_min("wm").alias("min_fingerprint"),
        )
        .orderBy("doc_id")
    )


WINNOWING_SQL = f"""
    WITH grams AS (
        SELECT doc_id, pos, substr(text, CAST(pos AS INT), {WINNOW_K}) AS gram
        FROM (
            SELECT doc_id, text,
                   unnest(range(1, length(text) - {WINNOW_K} + 2)) AS pos
            FROM documents
        )
        WHERE length(substr(text, CAST(pos AS INT), {WINNOW_K})) = {WINNOW_K}
    ),
    hashed AS (SELECT doc_id, pos, md5(gram) AS h FROM grams),
    mins AS (
        SELECT doc_id,
               min(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
                 AS wmin
        FROM hashed
    )
    SELECT doc_id,
           count(DISTINCT wmin) AS n_fingerprints,
           min(wmin) AS min_fingerprint
    FROM mins
    GROUP BY doc_id
    ORDER BY doc_id
"""


SPAN_L = 5  # tokens per sliding window (minimum reportable span length)
SPAN_MAX_BUCKET = 8  # window-hash bucket cap (recall/cost knob, see below)


def duplicate_spans_frame(docs: DataFrame) -> DataFrame:
    """ExactSubstr-style duplicate-span detection over a ``(doc_id:int,
    text:string)`` frame: find maximal runs of >= SPAN_L consecutive
    tokens shared verbatim between two documents. One output row per
    document pair that shares at least one such span: span count, the
    longest span's token length, and total duplicated tokens.

    Method (suffix-array-free, shuffle-friendly): hash every SPAN_L-token
    sliding window (an array expression on the scan — no shuffle to form
    windows), bucket by window hash, emit cross-doc position pairs inside
    each bucket, then merge consecutive matches into maximal spans with
    the diagonal-islands trick — windows of the same pair whose position
    offset ``pos_a - pos_b`` (the diagonal) is constant and whose pos_a
    values are consecutive belong to one maximal span, so
    ``pos_a - row_number()`` per (pair, diagonal) labels the islands.

    Scale design: the only corpus-sized shuffle is the window-hash
    groupBy, balanced by construction (md5 keys). Buckets holding more
    than SPAN_MAX_BUCKET occurrences are dropped — the standard
    document-frequency cap on pathologically hot windows (boilerplate),
    without which a window occurring k times emits O(k²) pairs. The cap
    is applied IDENTICALLY in the DuckDB twin, so the oracle stays exact.
    Everything after the bucket stage runs on candidate pairs only, a
    vanishing fraction of the corpus.
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_win = F.size(toks) - F.lit(SPAN_L - 1)
    wins = F.when(n_win >= 1, F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.array_join(F.slice(toks, i, SPAN_L), " ")).alias("wh"),
        ),
    )).otherwise(F.array().cast("array<struct<pos:int,wh:string>>"))
    w = docs.select("doc_id", F.explode(wins).alias("e")).select(
        "doc_id", F.col("e.pos").alias("pos"), F.col("e.wh").alias("wh")
    )
    # distinct-doc membership is derived from the collected array rather
    # than a count_distinct aggregate: count_distinct would force a
    # second two-phase aggregation (one more Exchange) for a fact the
    # array already carries.
    buckets = (
        w.groupBy("wh")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "pos"))
            ).alias("entries"),
        )
        .filter(
            (F.size("entries") >= 2)
            & (F.size("entries") <= SPAN_MAX_BUCKET)
            & (
                F.size(
                    F.array_distinct(
                        F.transform(F.col("entries"), lambda e: e["doc_id"])
                    )
                )
                >= 2
            )
        )
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("entries"),
            lambda a: F.transform(
                F.filter(
                    F.col("entries"), lambda b: b["doc_id"] > a["doc_id"]
                ),
                lambda b: F.struct(
                    a["doc_id"].alias("doc_a"),
                    a["pos"].alias("pos_a"),
                    b["doc_id"].alias("doc_b"),
                    b["pos"].alias("pos_b"),
                ),
            ),
        )
    )
    pairs = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.*")
        .distinct()
    )
    iw = Window.partitionBy(
        "doc_a", "doc_b", F.col("pos_a") - F.col("pos_b")
    ).orderBy("pos_a")
    spans = (
        pairs.select(
            "doc_a",
            "doc_b",
            (F.col("pos_a") - F.col("pos_b")).alias("diag"),
            (F.col("pos_a") - F.row_number().over(iw)).alias("island"),
        )
        .groupBy("doc_a", "doc_b", "diag", "island")
        .agg(F.count("*").alias("n_windows"))
    )
    return (
        spans.groupBy("doc_a", "doc_b")
        .agg(
            F.count("*").cast("long").alias("n_spans"),
            (F.max("n_windows") + F.lit(SPAN_L - 1))
            .cast("long")
            .alias("max_span_tokens"),
            F.sum(F.col("n_windows") + F.lit(SPAN_L - 1))
            .cast("long")
            .alias("dup_tokens"),
        )
        .orderBy("doc_a", "doc_b")
    )


def duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_spans_frame(_docs(spark, sf_dir).select("doc_id", "text"))


DUPLICATE_SPANS_SQL = f"""
    WITH toks AS (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS tk
        FROM documents
    ), p AS (
        SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - {SPAN_L - 1})) AS pos
        FROM toks
    ), w AS (
        SELECT doc_id, pos,
               md5(array_to_string(tk[pos:pos + {SPAN_L - 1}], ' ')) AS wh
        FROM p
    ), buck AS (
        SELECT wh, list({{'d': doc_id, 'p': pos}} ORDER BY doc_id, pos)
                   AS entries
        FROM w GROUP BY wh
        HAVING count(*) BETWEEN 2 AND {SPAN_MAX_BUCKET}
           AND count(DISTINCT doc_id) >= 2
    ), pairs AS (
        SELECT DISTINCT a.entry.d AS doc_a, a.entry.p AS pos_a,
                        b.entry.d AS doc_b, b.entry.p AS pos_b
        FROM buck, unnest(entries) a(entry), unnest(entries) b(entry)
        WHERE a.entry.d < b.entry.d
    ), runs AS (
        SELECT doc_a, doc_b,
               pos_a - row_number() OVER (
                   PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a
               ) AS island,
               pos_a - pos_b AS diag
        FROM pairs
    ), spans AS (
        SELECT doc_a, doc_b, diag, island, count(*) AS n_windows
        FROM runs GROUP BY doc_a, doc_b, diag, island
    )
    SELECT doc_a, doc_b,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(max(n_windows + {SPAN_L - 1}) AS BIGINT) AS max_span_tokens,
           CAST(sum(n_windows + {SPAN_L - 1}) AS BIGINT) AS dup_tokens
    FROM spans GROUP BY doc_a, doc_b
    ORDER BY doc_a, doc_b
"""


BLOOM_M = 65536  # filter bits
BLOOM_K = 3  # hash functions
_EVAL_MOD = 7  # doc_id % 7 == 0 stands in for the held-out benchmark set


def _bloom_bit(j: int, col):
    """Bit position j-th hash of a shingle (kernel.synth._h32 convention,
    shared via textstats._h32_col), mod the filter size."""
    from gmft_spark.operators.textstats import _h32_col

    return _h32_col(F.concat(F.lit(f"{j}|"), col)) % BLOOM_M


def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination via a Bloom filter of eval-set shingles
    (doc_id % 7 == 0 stands in for the held-out benchmark): a training
    document is flagged when any of its 3-gram shingles has ALL k Bloom
    bits set. The exact-membership count is emitted next to the Bloom
    count so the filter's one-sided false-positive behavior is part of
    the checked output (bloom ≥ exact always; equality when no FP fired).

    Scale notes: the filter is a FIXED-SIZE bit set (m=65536 positions
    here; sized m ≈ -n·ln(p)/ln(2)² for a real eval corpus) built by one
    distinct over ≤ m rows and broadcast — the training corpus then
    probes it with a narrow map + broadcast-hash-join, so decontaminating
    100 TB never shuffles the corpus and never joins it against the eval
    set directly. The exact-hit column is the verification channel only;
    at scale it would be dropped (that join is what the Bloom replaces)."""
    sh = _shingles(spark, sf_dir)
    # the eval side is small by definition and consumed twice (bit set +
    # exact-membership set): materialize it once
    ev = sh.filter(F.col("doc_id") % _EVAL_MOD == 0).localCheckpoint(eager=True)
    tr = sh.filter(F.col("doc_id") % _EVAL_MOD != 0)
    bits = (
        ev.select(
            F.explode(
                F.array(*[_bloom_bit(j, F.col("shingle")) for j in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
        .withColumn("set_", F.lit(1))
    )
    probe = tr.select(
        "doc_id",
        "shingle",
        F.explode(
            F.array(*[_bloom_bit(j, F.col("shingle")) for j in range(BLOOM_K)])
        ).alias("bit"),
    )
    bloom_hits = (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id", "shingle")
        .agg((F.sum(F.coalesce("set_", F.lit(0))) == BLOOM_K).alias("bloom_hit"))
    )
    ev_set = ev.select("shingle").distinct().withColumn("in_eval", F.lit(1))
    per_doc = (
        bloom_hits.join(F.broadcast(ev_set), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0)).alias("n_bloom_hits"),
            F.sum(F.coalesce("in_eval", F.lit(0))).cast("long").alias("n_exact_hits"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_bloom_hits",
        "n_exact_hits",
        (F.col("n_bloom_hits") > 0).alias("flagged"),
    ).orderBy("doc_id")


def _bloom_sql() -> str:
    from gmft_spark.operators.scene_sql import _hxs

    def bit(j: int) -> str:
        hexed = f"md5('{j}|' || shingle)"
        return f"(({_hxs(hexed)}) % {BLOOM_M})"

    bits_list = ", ".join(bit(j) for j in range(BLOOM_K))
    return f"""
    WITH shingles AS ({SHINGLES_SQL}),
    ev AS (SELECT * FROM shingles WHERE doc_id % {_EVAL_MOD} = 0),
    tr AS (SELECT * FROM shingles WHERE doc_id % {_EVAL_MOD} <> 0),
    bits AS (
        SELECT DISTINCT unnest([{bits_list}]) AS bit FROM ev
    ),
    probe AS (
        SELECT doc_id, shingle, unnest([{bits_list}]) AS bit FROM tr
    ),
    bloom_hits AS (
        SELECT doc_id, shingle,
               (count(b.bit) = {BLOOM_K}) AS bloom_hit
        FROM probe p LEFT JOIN bits b ON p.bit = b.bit
        GROUP BY doc_id, shingle
    ),
    ev_set AS (SELECT DISTINCT shingle FROM ev)
    SELECT h.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN h.bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bloom_hits,
           CAST(sum(CASE WHEN e.shingle IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_exact_hits,
           (sum(CASE WHEN h.bloom_hit THEN 1 ELSE 0 END) > 0) AS flagged
    FROM bloom_hits h LEFT JOIN ev_set e ON h.shingle = e.shingle
    GROUP BY h.doc_id
    ORDER BY h.doc_id
"""


BLOOM_DECONTAMINATE_SQL = _bloom_sql()


QUERIES = {
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "dedup_span_exact": (duplicate_spans, DUPLICATE_SPANS_SQL),
    "dedup_winnowing": (winnowing_fingerprints, WINNOWING_SQL),
    "dedup_minhash_signatures": (minhash_signatures, MINHASH_SQL),
    "dedup_minhash_lsh": (dedup_minhash_lsh, DEDUP_MINHASH_SQL),
    "dedup_minhash_clusters": (dedup_minhash_clusters, DEDUP_MINHASH_CLUSTERS_SQL),
    "dedup_incremental": (dedup_incremental, DEDUP_INCREMENTAL_SQL),
    "dedup_ngram_jaccard": (ngram_jaccard, NGRAM_JACCARD_SQL),
    "dedup_simhash": (simhash, SIMHASH_SQL),
    "doc_fingerprint": (doc_fingerprint, DOC_FINGERPRINT_SQL),
    "dedup_bloom_decontaminate": (bloom_decontaminate, BLOOM_DECONTAMINATE_SQL),
}
