"""Conversation-level transcript analytics.

The graft's payload axis is multi-turn agent transcripts
(BASELINE.json ``input_hint``); this module covers the two
conversation-shape questions an LLM-serving/data team asks constantly:

* **context-window accounting** — how many of a conversation's most
  recent turns fit a fixed token budget (the truncation every chat
  runtime applies before inference), and how much gets dropped;
* **reply latency** — the gap between consecutive turns, broken down by
  (previous role → role) pair (tool-call round-trips vs user think
  time).

Inputs derive from ``sources/transcripts.transcripts_from_documents``
(the driver's documents table), so every output has a DuckDB twin over
the same parquet. Turn timestamps step a constant 16 s by construction;
the latency query adds a NAMED md5 jitter per turn (kernel/synth.py
hash convention, SQL twin via scene_sql._hxs) so gaps genuinely vary
and the oracle re-derives them bit-exactly.

Scale notes (10^12-turn framing): both queries are ONE shuffle keyed on
conv_id — the same partitioning the extraction pipeline uses, so at
scale the frames co-partition with everything else conversation-keyed —
followed by a map-side-combinable rollup (per-conv or per-role-pair).
Token counts and hash jitter are JVM expressions inside whole-stage
codegen; nothing collects, nothing goes through Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from gmft_spark.sources.transcripts import transcripts_from_documents

CONTEXT_BUDGET = 250  # whitespace tokens kept from the conversation tail


def _n_tokens(col):
    """Whitespace token count — same rule as textstats.token_counts."""
    return F.size(F.filter(F.split(col, " "), lambda t: t != ""))


def conv_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per conversation: total turns/tokens, and how many of the most
    RECENT turns fit ``CONTEXT_BUDGET`` tokens — suffix semantics, the
    keep-the-tail truncation a chat runtime applies. A turn fits when
    the running token sum from the newest turn back through it stays
    within budget (whole turns only, newest-first)."""
    t = transcripts_from_documents(spark, sf_dir)
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.desc("turn_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = t.select(
        "conv_id", "turn_idx", _n_tokens(F.col("text")).alias("n_tokens")
    ).withColumn("cum_from_end", F.sum("n_tokens").over(w))
    return (
        toks.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count(F.when(F.col("cum_from_end") <= CONTEXT_BUDGET, 1)).alias(
                "fit_turns"
            ),
        )
        .withColumn("dropped_turns", F.col("n_turns") - F.col("fit_turns"))
        .orderBy("conv_id")
    )


def _context_budget_sql() -> str:
    return f"""
    WITH toks AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
               (SELECT count(*) FROM unnest(string_split(text, ' ')) AS u(t)
                WHERE t <> '') AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT conv_id, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_from_end
        FROM toks
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(count(*) FILTER (WHERE cum_from_end <= {CONTEXT_BUDGET})
                AS BIGINT) AS fit_turns,
           CAST(count(*) AS BIGINT)
               - CAST(count(*) FILTER (WHERE cum_from_end <= {CONTEXT_BUDGET})
                      AS BIGINT) AS dropped_turns
    FROM cum
    GROUP BY conv_id
    ORDER BY conv_id
"""


CONTEXT_BUDGET_SQL = _context_budget_sql()

JITTER_SPAN_US = 8_000_000  # each turn lands 0-8 s late of its slot


def conv_reply_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (previous role → role) pair: reply-gap stats in microseconds.
    Turn timestamps get a named md5 jitter (``lat|conv|turn``) on top of
    their 16 s slots, then the gap is ``timestamp_diff`` against the
    conversation's previous turn (events-style TIMESTAMP_NTZ arithmetic —
    CLAUDE.md rule: never unix_timestamp). avg is an exact-integer sum
    divided once, so the double is engine-identical."""
    from gmft_spark.operators.textstats import _h32_col

    t = transcripts_from_documents(spark, sf_dir)
    key = F.concat(
        F.lit("lat|"), F.col("conv_id"), F.lit("|"), F.col("turn_idx").cast("string")
    )
    jit = (_h32_col(key) % JITTER_SPAN_US).cast("long")
    tj = t.withColumn("ts_j", F.timestamp_add("MICROSECOND", jit, F.col("ts")))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        tj.withColumn("prev_role", F.lag("role").over(w))
        .withColumn("prev_ts", F.lag("ts_j").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .withColumn(
            "gap_us", F.timestamp_diff("MICROSECOND", F.col("prev_ts"), F.col("ts_j"))
        )
    )
    return (
        gaps.groupBy("prev_role", "role")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
            F.round(F.sum("gap_us") / F.count("*"), 4).alias("avg_gap_us"),
        )
        .orderBy("prev_role", "role")
    )


def _reply_latency_sql() -> str:
    from gmft_spark.operators.scene_sql import _hxs

    jit = (
        _hxs(
            "md5('lat|conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)"
            " || '|' || CAST(CAST(floor(doc_id / 16.0) AS INT) AS VARCHAR))"
        )
        + f" % {JITTER_SPAN_US}"
    )
    return f"""
    WITH turns AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               TIMESTAMP '2026-01-01 00:00:00'
                   + to_seconds(doc_id) + to_microseconds({jit}) AS ts_j
        FROM documents
    ),
    gaps AS (
        SELECT conv_id,
               lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS prev_role,
               role,
               date_diff('microsecond',
                         lag(ts_j) OVER (PARTITION BY conv_id ORDER BY turn_idx),
                         ts_j) AS gap_us
        FROM turns
    )
    SELECT prev_role, role,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           round(CAST(sum(gap_us) AS BIGINT) / CAST(count(*) AS BIGINT), 4)
               AS avg_gap_us
    FROM gaps
    WHERE prev_role IS NOT NULL
    GROUP BY prev_role, role
    ORDER BY prev_role, role
"""


REPLY_LATENCY_SQL = _reply_latency_sql()


SFT_BUDGET = 120  # context tokens packed before each assistant turn


def sft_pair_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build SFT training pairs from transcripts: one row per ASSISTANT
    turn, with ``response`` = that turn's text and ``prompt`` = the
    longest suffix of the conversation's PRIOR turns whose token total
    fits ``SFT_BUDGET`` (whole turns, newest kept first — the same
    keep-the-tail truncation as ``conv_context_budget``), rendered as
    ``role: text`` lines in turn order.

    Fit is decided in closed form, no per-row recursion: with ``pre`` =
    the conversation's inclusive prefix token sum, prior turn j's suffix
    cost at assistant turn i is ``pre[i-1] - pre[j] + tok[j]`` — so one
    conv_id window builds the prefix sums and the context array, and the
    budget filter/render are in-row higher-order expressions (lambdas
    single-parameter per the F.transform index gotcha; the outer-column
    reference is the supported correlation form). ONE conv_id shuffle,
    everything else whole-stage codegen; at 10^12 turns this
    co-partitions with the extraction pipeline's conversation keying."""
    t = transcripts_from_documents(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pre = t.withColumn("n_tokens", _n_tokens(F.col("text"))).withColumn(
        "pre", F.sum("n_tokens").over(w)
    )
    ctx = pre.withColumn(
        "ctx",
        F.collect_list(F.struct("pre", "n_tokens", "role", "text")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn("pre_prev", F.col("pre") - F.col("n_tokens"))
    kept = F.filter(
        F.col("ctx"),
        lambda e: F.col("pre_prev") - e["pre"] + e["n_tokens"]
        <= F.lit(SFT_BUDGET),
    )
    return (
        ctx.filter(F.col("role") == "assistant")
        .select(
            "conv_id",
            "turn_idx",
            F.size(kept).alias("n_context_turns"),
            F.aggregate(
                kept, F.lit(0), lambda acc, e: acc + e["n_tokens"]
            ).alias("prompt_tokens"),
            F.array_join(
                F.transform(
                    kept,
                    lambda e: F.concat(e["role"], F.lit(": "), e["text"]),
                ),
                "\n",
            ).alias("prompt"),
            F.col("text").alias("response"),
        )
        .orderBy("conv_id", "turn_idx")
    )


def _sft_pair_sql() -> str:
    # The oracle states the same suffix rule as a correlated join (prior
    # turns whose closed-form suffix cost fits), which DuckDB evaluates
    # fine at oracle scale; string_agg ORDER BY j pins the line order.
    return f"""
    WITH turns AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               text,
               (SELECT count(*) FROM unnest(string_split(text, ' ')) AS u(t)
                WHERE t <> '') AS n_tokens
        FROM documents
    ),
    pre AS (
        SELECT *, sum(n_tokens) OVER (
                   PARTITION BY conv_id ORDER BY turn_idx
               ) AS pre
        FROM turns
    ),
    ctx AS (
        SELECT a.conv_id, a.turn_idx, a.text AS response,
               b.turn_idx AS j, b.role AS brole, b.text AS btext,
               b.n_tokens AS btok
        FROM pre a LEFT JOIN pre b
          ON a.conv_id = b.conv_id AND b.turn_idx < a.turn_idx
         AND (a.pre - a.n_tokens) - b.pre + b.n_tokens <= {SFT_BUDGET}
        WHERE a.role = 'assistant'
    )
    SELECT conv_id, turn_idx,
           CAST(count(j) AS BIGINT) AS n_context_turns,
           CAST(coalesce(sum(btok), 0) AS BIGINT) AS prompt_tokens,
           coalesce(string_agg(brole || ': ' || btext, chr(10) ORDER BY j),
                    '') AS prompt,
           response
    FROM ctx
    GROUP BY conv_id, turn_idx, response
    ORDER BY conv_id, turn_idx
"""


SFT_PAIR_SQL = _sft_pair_sql()

NEAR_DUP_THRESHOLD = 0.1  # conversation-pair Jaccard flag line


def _shingle3(tk, i):
    """3-gram join helper binding the array column (F.transform index gotcha)."""
    return F.concat_ws(
        " ", F.element_at(tk, i), F.element_at(tk, i + 1), F.element_at(tk, i + 2)
    )


def _conv_shingle_frame(t: DataFrame) -> DataFrame:
    """(conv_id, shingle) — DISTINCT word 3-shingles over each
    conversation's full transcript, turn texts concatenated in stable
    turn_idx order (the north rule's ordering contract). Shared by
    ``conv_near_dup`` and ``split_decontamination``; SQL twin is
    ``_CONV_SHINGLE_CTES``.

    NULL-text turns must contribute ZERO tokens, not poison the whole
    conversation: split(NULL) is NULL and F.flatten of any NULL element
    returns NULL (size -1), silently dropping the conv from the shingle
    index. The DuckDB twin's string_agg skips NULLs — coalesce matches it.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda x: x != ""
    )
    conv = (
        t.select("conv_id", "turn_idx", toks.alias("tk"))
        .groupBy("conv_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "tk"))),
                    lambda s: s["tk"],
                )
            ).alias("tk")
        )
    )
    # CLAUDE.md sequence gotcha: guard size >= 3 before building indices.
    return conv.filter(F.size("tk") >= 3).select(
        "conv_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 2),
                    lambda i: _shingle3(F.col("tk"), i),
                )
            )
        ).alias("shingle"),
    )


# Hot-shingle document-frequency cap: shingles shared by more than this
# many conversations are dropped from the INVERTED INDEX (intersection
# counting) — never from the size denominators. A df-D shingle alone
# generates D(D-1)/2 candidate rows (a boilerplate preamble shared by
# every session makes the index quadratic in corpus size), while any
# shingle this common certifies nothing about a 0.1-Jaccard pair.
# Capping only the index keeps the estimate one-sided: computed J <= true
# J, so the pair set is a subset of the exact answer (no false
# positives). 1000 is a no-op at sf0.001–0.1 (df <= #conversations = 64),
# so the DuckDB twin stays exact while the production plan carries the
# cap (VERDICT r3 item #4).
CONV_NEAR_DUP_MAX_DF = 1000


def conv_near_dup_frame(
    t: DataFrame, max_shingle_df: int | None = CONV_NEAR_DUP_MAX_DF
) -> DataFrame:
    """Conversation-level near-duplicate pairs: Jaccard over distinct word
    3-shingles of each conversation's FULL transcript (turn texts in stable
    turn_idx order — the north rule's ordering contract), pairs with
    J >= ``NEAR_DUP_THRESHOLD``. This is the whole-session dedup an agent
    data pipeline runs before training: two sessions that replay mostly
    the same tool results / retrieved text are near-dups even when no
    single turn is (and vice versa — the doc-level ``dedup.ngram_jaccard``
    can't see cross-turn overlap).

    Scale design (10^12-turn framing): one conv_id shuffle assembles the
    per-conversation token array (co-partitioned with every other
    conversation-keyed stage; shingling + per-conv distinct are in-row
    array expressions, whole-stage codegen). Pair discovery is an
    inverted index on the shingle — only conversations that actually
    SHARE content meet, never a block enumeration (same argument as
    dedup.ngram_jaccard:388) — with hot shingles above ``max_shingle_df``
    dropped from the index via a broadcast anti-join (the hot SET is tiny
    by construction: only boilerplate crosses a 1000-conversation df).
    ``max_shingle_df=None`` disables the cap (exact mode). Pathological
    conversation length is bounded upstream by the corpus's context
    truncation; the salted two-level assembly (plans/skew.py) is the
    fallback if it isn't."""
    sh = _conv_shingle_frame(t)
    sizes = sh.groupBy("conv_id").agg(F.count("*").alias("sz"))
    idx = sh
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_shingle_df)
            .select("shingle")
        )
        idx = sh.join(F.broadcast(hot), "shingle", "left_anti")
    inter = (
        idx.alias("sa")
        .join(
            idx.alias("sb"),
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col("sa.conv_id") < F.col("sb.conv_id")),
        )
        .groupBy(
            F.col("sa.conv_id").alias("conv_a"), F.col("sb.conv_id").alias("conv_b")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.round(
        F.col("n_inter") / (F.col("za.sz") + F.col("zb.sz") - F.col("n_inter")), 6
    )
    return (
        inter.join(sizes.alias("za"), F.col("conv_a") == F.col("za.conv_id"))
        .join(sizes.alias("zb"), F.col("conv_b") == F.col("zb.conv_id"))
        .select("conv_a", "conv_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= NEAR_DUP_THRESHOLD)
        .orderBy("conv_a", "conv_b")
    )


def conv_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form of ``conv_near_dup_frame`` over the derived transcripts.
    The default df cap is provably inert at gate scale (64 conversations
    < CONV_NEAR_DUP_MAX_DF), so the DuckDB twin remains exact."""
    return conv_near_dup_frame(transcripts_from_documents(spark, sf_dir))


# string_agg ORDER BY doc_id == turn order (turn_idx = doc_id/16 and a
# conversation's doc_ids share doc_id % 16, so doc_id order IS turn
# order); the shingle window is the dedup.SHINGLES_SQL form at
# conversation grain. Twin of _conv_shingle_frame.
_CONV_SHINGLE_CTES = """
    WITH conv AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               string_agg(text, ' ' ORDER BY doc_id) AS text
        FROM documents GROUP BY 1
    ),
    sh AS (
        SELECT DISTINCT conv_id, shingle FROM (
            SELECT conv_id,
                   tok || ' ' || lead(tok, 1) OVER w || ' '
                       || lead(tok, 2) OVER w AS shingle,
                   lead(tok, 2) OVER w AS t2
            FROM (
                SELECT conv_id,
                       unnest(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM conv
            ) WHERE tok <> ''
            WINDOW w AS (PARTITION BY conv_id ORDER BY pos)
        ) WHERE t2 IS NOT NULL
    )"""


def _near_dup_sql() -> str:
    # Filter on the ROUNDED value (CLAUDE.md float rule).
    return f"""{_CONV_SHINGLE_CTES},
    sizes AS (SELECT conv_id, count(*) AS sz FROM sh GROUP BY conv_id),
    inter AS (
        SELECT sa.conv_id AS conv_a, sb.conv_id AS conv_b, count(*) AS n_inter
        FROM sh sa JOIN sh sb
          ON sa.shingle = sb.shingle AND sa.conv_id < sb.conv_id
        GROUP BY 1, 2
    )
    SELECT conv_a, conv_b,
           round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6)
               AS jaccard
    FROM inter
    JOIN sizes za ON conv_a = za.conv_id
    JOIN sizes zb ON conv_b = zb.conv_id
    WHERE round(CAST(n_inter AS DOUBLE) / (za.sz + zb.sz - n_inter), 6)
          >= {NEAR_DUP_THRESHOLD}
    ORDER BY conv_a, conv_b
"""


CONV_NEAR_DUP_SQL = _near_dup_sql()

# Lint jitter must EXCEED the real within-conversation slot stride so
# out-of-order timestamps genuinely occur — unlike the latency jitter,
# which stays under the stride so gaps remain positive. Adjacent turns of
# one conversation are 80 doc_ids apart in the driver corpus (doc_id % 16
# keys the conv, sources interleave 5-wide), i.e. an 80 s stride; 120 s of
# jitter inverts ~5.6% of adjacent pairs (P(X-Y > 80), X,Y ~ U[0,120)).
LINT_JITTER_SPAN_US = 120_000_000


def transcript_lint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation transcript protocol lint — the validation pass an
    agent-data pipeline runs on ingest before anything downstream trusts
    the rows: out-of-order timestamps (count of adjacent turn pairs where
    the later turn_idx carries the earlier wall clock), tool-role turns
    missing a tool name, tool names attached to non-tool roles, and the
    opening role (sessions should open with ``user``). Turn timestamps
    get a named md5 jitter (``lint|conv|turn``, kernel/synth.py hash
    convention, SQL twin via scene_sql._hxs) wide enough to cross the
    80 s slot boundary, so the inversion branch is real on the corpus.

    Scale design: ONE conv_id shuffle — the lag window and the per-conv
    rollup share the same partitioning, everything else is whole-stage
    codegen; at 10^12 turns this co-partitions with the extraction
    pipeline's conversation keying."""
    return lint_frame(transcripts_from_documents(spark, sf_dir), jitter=True)


def lint_frame(t: DataFrame, jitter: bool = False) -> DataFrame:
    """Frame-level core of ``transcript_lint``. ``jitter=True`` is the
    GATE corpus knob (its synthetic timestamps are monotone by
    construction, so a named md5 jitter makes the inversion branch
    real); a job over real transcripts lints the actual wall clocks —
    jitter=False."""
    from gmft_spark.operators.textstats import _h32_col

    if jitter:
        key = F.concat(
            F.lit("lint|"),
            F.col("conv_id"),
            F.lit("|"),
            F.col("turn_idx").cast("string"),
        )
        jit = (_h32_col(key) % LINT_JITTER_SPAN_US).cast("long")
        tj = t.withColumn(
            "ts_j", F.timestamp_add("MICROSECOND", jit, F.col("ts"))
        )
    else:
        tj = t.withColumn("ts_j", F.col("ts"))
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    x = tj.withColumn("prev_ts", F.lag("ts_j").over(w))
    return (
        x.groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.count(F.when(F.col("prev_ts") > F.col("ts_j"), 1)).alias(
                "n_ts_inversions"
            ),
            F.count(
                F.when((F.col("role") == "tool") & F.col("tool").isNull(), 1)
            ).alias("n_tool_missing_name"),
            F.count(
                F.when(F.col("tool").isNotNull() & (F.col("role") != "tool"), 1)
            ).alias("n_tool_wrong_role"),
            F.min_by("role", "turn_idx").alias("first_role"),
        )
        .orderBy("conv_id")
    )


def _lint_sql() -> str:
    from gmft_spark.operators.scene_sql import _hxs

    jit = (
        _hxs(
            "md5('lint|conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)"
            " || '|' || CAST(CAST(floor(doc_id / 16.0) AS INT) AS VARCHAR))"
        )
        + f" % {LINT_JITTER_SPAN_US}"
    )
    return f"""
    WITH turns AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               CASE WHEN doc_id % 5 = 0 THEN 'pdf_reader' END AS tool,
               TIMESTAMP '2026-01-01 00:00:00'
                   + to_seconds(doc_id) + to_microseconds({jit}) AS ts_j
        FROM documents
    ),
    x AS (
        SELECT *, lag(ts_j) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                      AS prev_ts
        FROM turns
    )
    SELECT conv_id,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(count(*) FILTER (WHERE prev_ts > ts_j) AS BIGINT)
               AS n_ts_inversions,
           CAST(count(*) FILTER (WHERE role = 'tool' AND tool IS NULL)
                AS BIGINT) AS n_tool_missing_name,
           CAST(count(*) FILTER (WHERE tool IS NOT NULL AND role <> 'tool')
                AS BIGINT) AS n_tool_wrong_role,
           arg_min(role, turn_idx) AS first_role
    FROM x
    GROUP BY conv_id
    ORDER BY conv_id
"""


TRANSCRIPT_LINT_SQL = _lint_sql()


EMBED_DIM = 64  # driver embeddings table component count


def conv_embedding_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level semantic profile: the mean-pooled embedding of a
    conversation's documents (the vector SemDeDup / topic clustering /
    mixing operate on at conversation grain) plus the dominant document
    label — emitted cross-engine-exactly as the POOL'S fixed-point integer
    accumulators, md5-fingerprinted (CLAUDE.md float recipe: floor(x*1e6
    +0.5) per component BEFORE any unordered sum; the mean's true
    resolution is int/(1e6·n), so the integer sums themselves travel, not
    a rounded division).

    Scale design: embeddings join documents 1:1 on vec_id = doc_id — at
    corpus scale both sides bucket on doc_id so the join is exchange-free;
    pooling is EMBED_DIM per-component sum columns (map-side combinable,
    zero row blowup — the simhash lesson, operators/dedup.py), never a
    posexplode. Pool and label vote come out of ONE pass as two STACKED
    aggregations — per-(conv,label) partials then a per-conv rollup of
    partial sums + arg-max label — so the joined frame is scanned once
    and there is no pool↔votes self-join (a naive two-agg-plus-join form
    scans the join twice)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.concat(
            F.lit("conv-"), F.col("source"), F.lit("-"),
            (F.col("doc_id") % 16).cast("string"),
        ).alias("conv_id"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1e6 + 0.5).cast("long"),
        ).alias("fp"),
    )
    j = docs.join(emb, docs["doc_id"] == emb["vec_id"])
    partial = j.groupBy("conv_id", "label").agg(
        F.count("*").alias("cnt"),
        *[
            F.sum(F.element_at("fp", i + 1)).alias(f"c{i}")
            for i in range(EMBED_DIM)
        ],
    )
    pooled = partial.groupBy("conv_id").agg(
        F.sum("cnt").cast("long").alias("n_vecs"),
        # scalar vote key (DuckDB 1.0 arg_max rejects struct keys):
        # higher count wins, smaller label breaks ties; labels are
        # small ints so the 1e6 stride never collides
        F.max_by("label", F.col("cnt") * 1_000_000 - F.col("label"))
        .cast("int")
        .alias("majority_label"),
        *[F.sum(f"c{i}").cast("long").alias(f"c{i}") for i in range(EMBED_DIM)],
    )
    fingerprint = F.md5(
        F.concat_ws(",", *[F.col(f"c{i}").cast("string") for i in range(EMBED_DIM)])
    )
    return pooled.select(
        "conv_id", "n_vecs", "majority_label", fingerprint.alias("pool_md5")
    ).orderBy("conv_id")


def _embedding_profile_sql() -> str:
    comps = ", ".join(
        f"CAST(sum(CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1e6 + 0.5)"
        f" AS BIGINT)) AS BIGINT) AS c{i}"
        for i in range(EMBED_DIM)
    )
    # variadic concat_ws, not a || chain — 64 nested binary concats blow
    # DuckDB's 128-frame binder recursion limit
    cat = "concat_ws(',', " + ", ".join(
        f"CAST(c{i} AS VARCHAR)" for i in range(EMBED_DIM)
    ) + ")"
    return f"""
    WITH d AS (
        SELECT doc_id,
               'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id
        FROM documents
    ),
    j AS (
        SELECT d.conv_id, e.label, e.embedding
        FROM d JOIN embeddings e ON d.doc_id = e.vec_id
    ),
    pool AS (
        SELECT conv_id, CAST(count(*) AS BIGINT) AS n_vecs, {comps}
        FROM j GROUP BY conv_id
    ),
    votes AS (
        SELECT conv_id,
               CAST(arg_max(label, cnt * 1000000 - label) AS INT)
                   AS majority_label
        FROM (
            SELECT conv_id, label, count(*) AS cnt
            FROM j GROUP BY conv_id, label
        ) GROUP BY conv_id
    )
    SELECT pool.conv_id, n_vecs, majority_label, md5({cat}) AS pool_md5
    FROM pool JOIN votes ON pool.conv_id = votes.conv_id
    ORDER BY pool.conv_id
"""


CONV_EMBEDDING_PROFILE_SQL = _embedding_profile_sql()


def _shingles3(name: str):
    """Distinct 3-shingle array of a token-array column, empty when the
    array is too short (the F.sequence descending-on-negative gotcha)."""
    c = F.col(name)
    return F.when(
        F.size(c) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(c) - 2),
                lambda i: _shingle3(c, i),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def turn_grounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groundedness of each assistant turn in its tool evidence: the share
    of the turn's distinct word 3-shingles that already appear in the
    LATEST prior tool turn of the same conversation — the
    hallucination-vs-citation signal a rollout-curation pipeline filters
    on (an assistant answer whose content n-grams never occur in the tool
    output it follows is unsupported by its own evidence). Assistant
    turns with no prior tool turn, or with fewer than 3 tokens (no
    shingles), are excluded rather than emitted as NULL.

    Scale design (10^12-turn framing): ONE conv_id shuffle for the
    last-tool-text window (the pipeline's standard partitioning — at
    scale this co-partitions with every other conversation-keyed stage);
    shingling and the intersection are in-row array expressions on the
    windowed rows, so unlike the oracle's explode-and-join the Spark plan
    never materializes a shingle table. Long tool outputs bound the row
    width, not a join fan-out."""
    t = transcripts_from_documents(spark, sf_dir)
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # NULL-text tool turns contribute nothing (when() yields NULL and
    # ignorenulls skips to an earlier tool turn) — same as the oracle's
    # CASE ... END under IGNORE NULLS.
    src = F.last(
        F.when(F.col("role") == "tool", F.col("text")), ignorenulls=True
    ).over(w)
    toks = lambda c: F.filter(  # noqa: E731 — local expression builder
        F.split(F.coalesce(c, F.lit("")), " "), lambda x: x != ""
    )
    a = (
        t.withColumn("src", src)
        .filter((F.col("role") == "assistant") & F.col("src").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            toks(F.col("text")).alias("atk"),
            toks(F.col("src")).alias("stk"),
        )
        .select(
            "conv_id",
            "turn_idx",
            _shingles3("atk").alias("ash"),
            _shingles3("stk").alias("ssh"),
        )
        .filter(F.size("ash") >= 1)
    )
    grounded = F.size(F.array_intersect("ash", "ssh")).cast("long")
    total = F.size("ash").cast("long")
    return a.select(
        "conv_id",
        "turn_idx",
        total.alias("n_shingles"),
        grounded.alias("n_grounded"),
        F.round(grounded / total, 6).alias("grounding"),
    ).orderBy("conv_id", "turn_idx")


def _grounding_shingle_cte(alias: str, src_table: str) -> str:
    """Exploded distinct 3-shingles per (conv_id, turn_idx) — the oracle
    re-derives the in-row shingle arrays as a relational table (same
    idiom as CONV_NEAR_DUP_SQL: filter empty tokens BEFORE windowing so
    shingles span consecutive non-empty tokens)."""
    return f"""{alias} AS (
        SELECT DISTINCT conv_id, turn_idx, shingle FROM (
            SELECT conv_id, turn_idx,
                   tok || ' ' || lead(tok, 1) OVER w || ' '
                       || lead(tok, 2) OVER w AS shingle,
                   lead(tok, 2) OVER w AS t2
            FROM (
                SELECT conv_id, turn_idx,
                       unnest(string_split({src_table}.txt, ' ')) AS tok,
                       generate_subscripts(string_split({src_table}.txt, ' '), 1)
                           AS pos
                FROM {src_table}
            ) WHERE tok <> ''
            WINDOW w AS (PARTITION BY conv_id, turn_idx ORDER BY pos)
        ) WHERE t2 IS NOT NULL
    )"""


TURN_GROUNDING_SQL = f"""
    WITH t AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(doc_id // 16 AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               text
        FROM documents
    ),
    g AS (
        SELECT conv_id, turn_idx, role, text,
               last_value(CASE WHEN role = 'tool' THEN text END IGNORE NULLS)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS src
        FROM t
    ),
    ga AS (
        SELECT conv_id, turn_idx, text AS txt, src
        FROM g WHERE role = 'assistant' AND src IS NOT NULL
    ),
    gs AS (SELECT conv_id, turn_idx, src AS txt FROM ga),
    {_grounding_shingle_cte('ash', 'ga')},
    {_grounding_shingle_cte('ssh', 'gs')}
    SELECT a.conv_id, a.turn_idx,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(s.shingle) AS BIGINT) AS n_grounded,
           round(CAST(count(s.shingle) AS DOUBLE) / count(*), 6) AS grounding
    FROM ash a
    LEFT JOIN ssh s
      ON a.conv_id = s.conv_id AND a.turn_idx = s.turn_idx
     AND a.shingle = s.shingle
    GROUP BY a.conv_id, a.turn_idx
    ORDER BY a.conv_id, a.turn_idx
"""


# conversation-grain split rule — ONE definition shared by
# conv_split_assignment, split_decontamination and conversation_funnel
# (Spark + SQL pairs); changing a fraction or the hash key here changes
# every consumer in lockstep, in both engines.
SPLIT_TRAIN_FRAC = 0.8
SPLIT_VAL_FRAC = 0.9


def _split_frac_col():
    """md5 lower-64 fraction of conv_id (append-stable split hash)."""
    from gmft_spark.operators.textstats import _KMV_SPACE, _md5_lower64

    return _md5_lower64(F.col("conv_id")) / F.lit(_KMV_SPACE)


def _split_col():
    """'train' | 'val' | 'test' as a function of conv_id."""
    f = _split_frac_col()
    return (
        F.when(f < SPLIT_TRAIN_FRAC, "train")
        .when(f < SPLIT_VAL_FRAC, "val")
        .otherwise("test")
    )


def _split_frac_sql(conv_id_expr: str) -> str:
    from gmft_spark.operators.textstats import _KMV_SPACE

    return (
        f"CAST(md5_number_lower({conv_id_expr}) AS DOUBLE)"
        f" / {_KMV_SPACE!r}"
    )


def _split_case_sql(frac_expr: str) -> str:
    return (
        f"CASE WHEN {frac_expr} < {SPLIT_TRAIN_FRAC}::DOUBLE THEN 'train'"
        f" WHEN {frac_expr} < {SPLIT_VAL_FRAC}::DOUBLE THEN 'val'"
        f" ELSE 'test' END"
    )


def conv_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split at CONVERSATION grain: the split
    is a pure function of conv_id (md5 lower-64 hash fraction, 80/10/10),
    so every turn of a conversation lands in the same split — the
    doc-grain split (textstats.split_train_val_test) would scatter one
    session's turns across train and test, leaking multi-turn context
    into evaluation. Emits one row per conversation with its turn count;
    the per-turn assignment is a narrow co-keyed join away (or just the
    same hash expression inlined on the turns frame — no join needed).

    Deterministic and append-stable: adding conversations never reassigns
    existing ones (no sampling state, no seed plumbing). One conv_id
    groupBy — the pipeline's standard partitioning."""
    t = transcripts_from_documents(spark, sf_dir)
    return (
        t.groupBy("conv_id")
        .agg(F.count("*").cast("long").alias("n_turns"))
        .select("conv_id", "n_turns", _split_col().alias("split"))
        .orderBy("conv_id")
    )


def _conv_split_sql() -> str:
    return f"""
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
           {_split_case_sql("f")} AS split
    FROM (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               {_split_frac_sql("'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)")} AS f
        FROM documents
    )
    GROUP BY conv_id, f
    ORDER BY conv_id
"""


CONV_SPLIT_SQL = _conv_split_sql()


def split_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split leakage audit for the conversation-grain split: for
    every val/test conversation, how many of its distinct word 3-shingles
    also occur in ANY train-split conversation. High contamination means
    the eval example's content is memorizable from training data — the
    audit every benchmark/heldout pipeline runs after splitting (and the
    decontamination filter is ``contamination <= threshold`` over this
    frame). The split rule is the same append-stable md5 fraction as
    ``conv_split_assignment``, inlined on the shingle frame (no join).

    Scale design (10^12-turn framing): shingle assembly is the shared
    one-conv_id-shuffle pass (``_conv_shingle_frame``); the train shingle
    set is ONE shingle-keyed distinct (map-side combinable), and the
    audit is a hash join eval-shingles ⋈ train-shingle-set on the shingle
    key — an inverted-index membership probe, never a conversation-pair
    enumeration. At corpus scale the train set is the big side but stays
    a standard partitioned join; a Bloom side-channel (dedup.bloom_
    decontaminate) is the lossy shortcut when an exact count isn't
    needed."""
    sh = _conv_shingle_frame(transcripts_from_documents(spark, sf_dir))
    sh = sh.withColumn("split", _split_col())
    train_sh = (
        sh.filter(F.col("split") == "train")
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        sh.filter(F.col("split") != "train")
        .join(train_sh, "shingle", "left")
        .groupBy("conv_id", "split")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count("hit").alias("n_contaminated"),
        )
        .select(
            "conv_id",
            "split",
            "n_shingles",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
                "contamination"
            ),
        )
        .orderBy("conv_id")
    )


def _split_decontamination_sql() -> str:
    return f"""{_CONV_SHINGLE_CTES},
    lab AS (
        SELECT conv_id, shingle, {_split_case_sql("f")} AS split
        FROM (
            SELECT conv_id, shingle,
                   {_split_frac_sql("conv_id")} AS f
            FROM sh
        )
    ),
    train_sh AS (
        SELECT DISTINCT shingle FROM lab WHERE split = 'train'
    )
    SELECT e.conv_id, e.split,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(count(t.shingle) AS BIGINT) AS n_contaminated,
           round(CAST(count(t.shingle) AS DOUBLE) / count(*), 6)
               AS contamination
    FROM lab e LEFT JOIN train_sh t ON e.shingle = t.shingle
    WHERE e.split <> 'train'
    GROUP BY e.conv_id, e.split
    ORDER BY e.conv_id
"""


SPLIT_DECONTAMINATION_SQL = _split_decontamination_sql()


def assistant_self_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-generation detector: for each assistant turn after the
    first, the 3-shingle Jaccard against the conversation's PREVIOUS
    assistant turn — an agent stuck re-emitting near-identical responses
    scores high run after run (the text-side twin of
    toolcalls.toolcall_loops, which only sees tool names). Emitted as a
    continuous per-turn score (a curation pipeline thresholds it); turns
    where either side has no shingles are excluded, like turn_grounding.

    Scale: ONE conv_id shuffle shared by the assistant-lag window;
    shingles and the intersection are in-row array expressions (no
    shingle table, no join — same plan shape as turn_grounding)."""
    t = transcripts_from_documents(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    toks = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "), lambda x: x != ""
    )
    a = (
        t.filter(F.col("role") == "assistant")
        .select("conv_id", "turn_idx", toks.alias("atk"))
        .withColumn("ptk", F.lag("atk").over(w))
        .filter(F.col("ptk").isNotNull())
        .select(
            "conv_id",
            "turn_idx",
            _shingles3("atk").alias("ash"),
            _shingles3("ptk").alias("psh"),
        )
        .filter((F.size("ash") >= 1) & (F.size("psh") >= 1))
    )
    inter = F.size(F.array_intersect("ash", "psh")).cast("long")
    union = (F.size("ash") + F.size("psh")).cast("long") - inter
    return a.select(
        "conv_id",
        "turn_idx",
        inter.alias("n_shared"),
        F.round(inter / union, 6).alias("jaccard_prev"),
    ).orderBy("conv_id", "turn_idx")


SELF_REPETITION_SQL = f"""
    WITH t AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(doc_id // 16 AS INT) AS turn_idx,
               text
        FROM documents WHERE doc_id % 3 = 1
    ),
    g AS (
        SELECT conv_id, turn_idx, text AS txt,
               lag(text) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS prev
        FROM t
    ),
    ga AS (SELECT conv_id, turn_idx, txt FROM g WHERE prev IS NOT NULL),
    gp AS (SELECT conv_id, turn_idx, prev AS txt FROM g
           WHERE prev IS NOT NULL),
    {_grounding_shingle_cte('ash', 'ga')},
    {_grounding_shingle_cte('psh', 'gp')},
    sz AS (
        SELECT conv_id, turn_idx, count(*) AS na FROM ash GROUP BY 1, 2
    ),
    pz AS (
        SELECT conv_id, turn_idx, count(*) AS np FROM psh GROUP BY 1, 2
    ),
    ov AS (
        SELECT a.conv_id, a.turn_idx, count(p.shingle) AS n_shared
        FROM ash a
        LEFT JOIN psh p
          ON a.conv_id = p.conv_id AND a.turn_idx = p.turn_idx
         AND a.shingle = p.shingle
        GROUP BY a.conv_id, a.turn_idx
    )
    SELECT o.conv_id, o.turn_idx,
           CAST(o.n_shared AS BIGINT) AS n_shared,
           round(CAST(o.n_shared AS DOUBLE) / (sz.na + pz.np - o.n_shared), 6)
               AS jaccard_prev
    FROM ov o
    JOIN sz ON o.conv_id = sz.conv_id AND o.turn_idx = sz.turn_idx
    JOIN pz ON o.conv_id = pz.conv_id AND o.turn_idx = pz.turn_idx
    ORDER BY o.conv_id, o.turn_idx
"""


def conv_render_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loss-mask span layout for SFT training: each turn's [start, end)
    character offsets inside the conversation rendered in the repo's
    standard form (``role: text`` lines joined by ``\\n``, NULL-text
    turns skipped — the string_agg convention every other rendering here
    follows), with ``loss_mask`` 1 on assistant turns and 0 on context.
    A trainer tokenizes the rendered transcript ONCE and applies the
    mask over these spans instead of re-rendering per example — the
    offsets are the contract (tests reconstruct every substring).

    Scale: one conv_id shuffle for the prefix-sum window; everything
    else is narrow length arithmetic in whole-stage codegen."""
    return render_spans_frame(transcripts_from_documents(spark, sf_dir))


def render_spans_frame(t: DataFrame) -> DataFrame:
    """Frame-level core of ``conv_render_spans`` — the job surface
    (jobs/run_sft_export.py) feeds arbitrary transcript frames here."""
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg_len = (F.length("role") + F.lit(2) + F.length("text")).cast("long")
    start = F.coalesce(
        F.sum(F.col("seg_len") + 1).over(w), F.lit(0)
    ).cast("long")
    return (
        t.filter(F.col("text").isNotNull())
        .select("conv_id", "turn_idx", "role", seg_len.alias("seg_len"))
        .select(
            "conv_id",
            "turn_idx",
            "role",
            start.alias("start_char"),
            (start + F.col("seg_len")).alias("end_char"),
            F.when(F.col("role") == "assistant", 1)
            .otherwise(0)
            .cast("int")
            .alias("loss_mask"),
        )
        .orderBy("conv_id", "turn_idx")
    )


def render_conversations_frame(t: DataFrame) -> DataFrame:
    """One row per conversation with the FULL rendered transcript in the
    same convention the span offsets index (``role: text`` lines joined
    by ``\\n``, NULL-text turns skipped) — the companion output a trainer
    tokenizes once while applying ``render_spans_frame``'s mask spans.

    Scale note: the grain is inherently one-row-per-conversation (the
    trainer consumes whole transcripts), so a pathological multi-million
    -turn conversation materializes as one giant string in one task —
    that is a property of the OUTPUT, not the plan. Cap such
    conversations upstream (curation.chunk_documents / the SFT pair
    assembly's token budget) before rendering; the per-turn span output
    needs no such cap."""
    line = F.concat(F.col("role"), F.lit(": "), F.col("text"))
    return (
        t.filter(F.col("text").isNotNull())
        .groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("turn_idx"), line.alias("l"))
                        )
                    ),
                    lambda p: p["l"],
                ),
                "\n",
            ).alias("rendered"),
        )
    )


RENDER_SPANS_SQL = """
    WITH t AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(doc_id // 16 AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               text
        FROM documents WHERE text IS NOT NULL
    ),
    s AS (
        SELECT conv_id, turn_idx, role,
               CAST(length(role) + 2 + length(text) AS BIGINT) AS seg_len
        FROM t
    )
    SELECT conv_id, turn_idx, role,
           CAST(coalesce(sum(seg_len + 1) OVER (
                    PARTITION BY conv_id ORDER BY turn_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_char,
           CAST(coalesce(sum(seg_len + 1) OVER (
                    PARTITION BY conv_id ORDER BY turn_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                + seg_len AS BIGINT) AS end_char,
           CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS INT)
               AS loss_mask
    FROM s
    ORDER BY conv_id, turn_idx
"""


REP_MAX_JACCARD = 0.01  # self-repetition ceiling (rounded-6dp scale)


def conversation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conversation-grain curation decision report — which sessions
    make it into SFT training and why the rest were dropped, per source,
    with CUMULATIVE stage attrition (the conversation twin of
    ``curation.curation_funnel``):

    1. ``n_pass_lint`` — protocol-clean transcripts (zero timestamp
       inversions under ``transcript_lint``'s jitter);
    2. ``n_pass_dedup`` — not the lexicographically-later side of any
       ``conv_near_dup`` pair (keep-first canonicalization; conservative
       under chains, like every pair-rule dedup);
    3. ``n_pass_repetition`` — max ``assistant_self_repetition`` score
       under ``REP_MAX_JACCARD`` (conversations with <2 assistant turns
       have no score and pass — absence of evidence);
    4. ``n_kept`` — lands in the train split (``conv_split_assignment``
       hash rule inlined).

    All four stage predicates keep AND drop conversations at sf0.01
    (80 → 56 → 49 → 48 → 32 — branch-census rule).

    Scale design: every constituent signal is itself one conv_id-keyed
    pass (their plans are unchanged); the funnel adds conv_id-keyed LEFT
    joins — co-partitioned with the pipeline's standard conversation
    keying — and one tiny groupBy(source) rollup. The near-dup frame is
    the only super-linear input and is already inverted-index-bounded."""
    lint = transcript_lint(spark, sf_dir).select("conv_id", "n_ts_inversions")
    dup = (
        conv_near_dup(spark, sf_dir)
        .select(F.col("conv_b").alias("conv_id"))
        .distinct()
        .withColumn("is_dup", F.lit(1))
    )
    rep = (
        assistant_self_repetition(spark, sf_dir)
        .groupBy("conv_id")
        .agg(F.max("jaccard_prev").alias("max_rep"))
    )
    sig = (
        lint.join(dup, "conv_id", "left")
        .join(rep, "conv_id", "left")
        .withColumn("is_train", _split_col() == "train")
        .withColumn("source", F.element_at(F.split("conv_id", "-"), 2))
    )
    s1 = F.col("n_ts_inversions") == 0
    s2 = s1 & F.col("is_dup").isNull()
    s3 = s2 & (F.coalesce(F.col("max_rep"), F.lit(0.0)) < REP_MAX_JACCARD)
    s4 = s3 & F.col("is_train")
    return (
        sig.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_convs"),
            F.count(F.when(s1, 1)).cast("long").alias("n_pass_lint"),
            F.count(F.when(s2, 1)).cast("long").alias("n_pass_dedup"),
            F.count(F.when(s3, 1)).cast("long").alias("n_pass_repetition"),
            F.count(F.when(s4, 1)).cast("long").alias("n_kept"),
        )
        .withColumn(
            "keep_rate",
            F.round(F.col("n_kept").cast("double") / F.col("n_convs"), 6),
        )
        .orderBy("source")
    )


def _conversation_funnel_sql() -> str:
    s1 = "n_ts_inversions = 0"
    s2 = f"{s1} AND is_dup IS NULL"
    # ::DOUBLE: CLAUDE.md rule — bare fractional literals are DECIMAL in
    # DuckDB (exact math) and silently diverge if ever used in arithmetic
    s3 = f"{s2} AND coalesce(max_rep, 0.0) < {REP_MAX_JACCARD}::DOUBLE"
    s4 = f"{s3} AND is_train"
    return f"""
    WITH lint AS ({TRANSCRIPT_LINT_SQL}),
    dup AS (
        SELECT DISTINCT conv_b AS conv_id, 1 AS is_dup
        FROM ({CONV_NEAR_DUP_SQL})
    ),
    rep AS (
        SELECT conv_id, max(jaccard_prev) AS max_rep
        FROM ({SELF_REPETITION_SQL}) GROUP BY conv_id
    ),
    sig AS (
        SELECT string_split(l.conv_id, '-')[2] AS source,
               l.n_ts_inversions, d.is_dup, r.max_rep,
               {_split_case_sql(_split_frac_sql("l.conv_id"))} = 'train'
                   AS is_train
        FROM lint l
        LEFT JOIN dup d ON l.conv_id = d.conv_id
        LEFT JOIN rep r ON l.conv_id = r.conv_id
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_convs,
           CAST(count(*) FILTER (WHERE {s1}) AS BIGINT) AS n_pass_lint,
           CAST(count(*) FILTER (WHERE {s2}) AS BIGINT) AS n_pass_dedup,
           CAST(count(*) FILTER (WHERE {s3}) AS BIGINT)
               AS n_pass_repetition,
           CAST(count(*) FILTER (WHERE {s4}) AS BIGINT) AS n_kept,
           round(CAST(count(*) FILTER (WHERE {s4}) AS DOUBLE)
                 / count(*), 6) AS keep_rate
    FROM sig
    GROUP BY source
    ORDER BY source
"""


CONVERSATION_FUNNEL_SQL = _conversation_funnel_sql()


def sft_fold_tool_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-result folding for SFT assembly: every ``role='tool'`` turn is
    merged into the nearest PRECEDING non-tool turn of its conversation
    (appended as a ``[tool] ``-prefixed line), tool rows disappear, and the
    surviving turns are re-indexed densely — the standard transform that
    turns a raw agent transcript into the user/assistant alternation most
    SFT formats expect (tool output is evidence inside the assistant turn,
    not a speaker). A conversation that OPENS with tool turns has no
    preceding anchor; those rows survive as their own turns (role 'tool')
    rather than being dropped — lossless by construction.

    Cross-engine exactness: the anchor is ``max(non-tool turn_idx) <=
    current`` over a running window (turn_idx strictly increases, so max ==
    most recent); folded text is an array_sort-by-turn_idx join (DuckDB:
    ``string_agg(... ORDER BY turn_idx)``) — both total orders, no float.

    Scale shape: ONE conv_id shuffle shared by the running-max window, the
    (conv_id, anchor) fold, and the re-index window (all three key on
    conv_id, so AQE plans them in a single exchange's scope); at 10^12
    turns this co-partitions with the extraction pipeline's conversation
    keying and salting story (plans/lineage.py)."""
    return fold_tool_turns_frame(transcripts_from_documents(spark, sf_dir))


def fold_tool_turns_frame(t: DataFrame) -> DataFrame:
    """Frame-level core of ``sft_fold_tool_turns`` — needs (conv_id,
    turn_idx, role, text); the job surface feeds arbitrary frames."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    anchored = t.withColumn(
        "anchor",
        F.coalesce(
            F.max(
                F.when(F.col("role") != "tool", F.col("turn_idx"))
            ).over(run),
            F.col("turn_idx"),
        ),
    )
    piece = F.when(
        F.col("role") == "tool", F.concat(F.lit("[tool] "), F.col("text"))
    ).otherwise(F.col("text"))
    g = (
        anchored.groupBy("conv_id", "anchor")
        .agg(
            F.max(
                F.when(F.col("turn_idx") == F.col("anchor"), F.col("role"))
            ).alias("role"),
            F.sum(
                (
                    (F.col("role") == "tool")
                    & (F.col("turn_idx") != F.col("anchor"))
                ).cast("long")
            ).alias("n_folds"),
            F.array_sort(
                F.collect_list(F.struct(F.col("turn_idx"), piece.alias("t")))
            ).alias("pieces"),
        )
        .select(
            "conv_id",
            "anchor",
            "role",
            "n_folds",
            F.array_join(
                F.transform("pieces", lambda p: p["t"]), "\n"
            ).alias("text"),
        )
    )
    wi = Window.partitionBy("conv_id").orderBy("anchor")
    return (
        g.withColumn(
            "turn_idx", (F.row_number().over(wi) - 1).cast("int")
        )
        .select("conv_id", "turn_idx", "role", "n_folds", "text")
        .orderBy("conv_id", "turn_idx")
    )


SFT_FOLD_SQL = """
    WITH turns AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               text
        FROM documents
    ),
    anch AS (
        SELECT *,
               coalesce(
                   max(CASE WHEN role <> 'tool' THEN turn_idx END)
                       OVER (PARTITION BY conv_id ORDER BY turn_idx
                             ROWS UNBOUNDED PRECEDING),
                   turn_idx) AS anchor
        FROM turns
    ),
    g AS (
        SELECT conv_id, anchor,
               max(CASE WHEN turn_idx = anchor THEN role END) AS role,
               CAST(sum(CASE WHEN role = 'tool' AND turn_idx <> anchor
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_folds,
               string_agg(CASE WHEN role = 'tool' THEN '[tool] ' || text
                               ELSE text END,
                          chr(10) ORDER BY turn_idx) AS text
        FROM anch
        GROUP BY conv_id, anchor
    )
    SELECT conv_id,
           CAST(row_number() OVER (PARTITION BY conv_id ORDER BY anchor) - 1
                AS INT) AS turn_idx,
           role, n_folds, text
    FROM g
    ORDER BY conv_id, turn_idx
"""


def dpo_pairs_from_retries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining from failure→recovery episodes: when a tool
    call FAILS (the ``ok:false`` payload flag, toolcalls._tool_turns'
    rule) and a later tool call in the same conversation SUCCEEDS, the
    assistant turn that issued the failing call is a natural ``rejected``
    and the assistant turn that issued the recovering call a natural
    ``chosen`` — with the latest user turn before the failure as the
    shared ``prompt``. This is the cheap, label-free way agent-transcript
    corpora yield DPO/RLHF pairs: the environment already graded the two
    actions. Anchors are found BY ROLE (latest prior assistant / user
    turn), never by position — real transcripts don't rotate roles
    reliably, and even this corpus's conversations stride the document
    table so the positionally-previous turn of a tool turn is a user
    turn. Pairs need a real rejected side (a failing tool turn with no
    prior assistant turn is dropped); ``prompt`` is NULL when no user
    turn precedes the failure — nullable, not fabricated.

    Scale shape: one conv_id window pass builds the role-anchored texts
    and the next-success index in the same exchange scope; the single
    join that fetches the recovering call's assistant text keys on
    (conv_id, idx) — co-partitioned with the pipeline's conversation
    keying."""
    t = transcripts_from_documents(spark, sf_dir)
    res = F.element_at(F.split("conv_id", "-"), 3).cast("int")
    doc = F.col("turn_idx").cast("long") * 16 + res
    turns = t.select(
        "conv_id", "turn_idx", "role", "text", ((doc % 7) != 0).alias("ok")
    )
    return dpo_pairs_frame(turns)


def dpo_pairs_frame(turns: DataFrame) -> DataFrame:
    """Frame-level core of ``dpo_pairs_from_retries``: needs (conv_id,
    turn_idx, role, text, ok) where ``ok`` grades TOOL turns (NULL ok =
    ungradeable — such a turn is neither a failure nor a recovery; ok on
    non-tool rows is ignored). The gate corpus derives ok from its
    synthetic payload rule; jobs/run_dpo_export.py parses it out of real
    JSON tool payloads."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    seq = turns.select(
        "conv_id",
        "turn_idx",
        "role",
        "ok",
        F.last(
            F.when(F.col("role") == "assistant", F.col("text")),
            ignorenulls=True,
        )
        .over(wp)
        .alias("last_assistant"),
        F.last(
            F.when(F.col("role") == "user", F.col("text")), ignorenulls=True
        )
        .over(wp)
        .alias("last_user"),
        F.min(
            F.when(
                (F.col("role") == "tool") & F.col("ok"), F.col("turn_idx")
            )
        )
        .over(wf)
        .alias("rec"),
    )
    pairs = seq.filter(
        (F.col("role") == "tool")
        & ~F.col("ok")
        & F.col("rec").isNotNull()
        & F.col("last_assistant").isNotNull()
    ).select(
        "conv_id",
        F.col("turn_idx").alias("failed_turn_idx"),
        F.col("rec"),
        F.col("last_user").alias("prompt"),
        F.col("last_assistant").alias("rejected"),
    )
    chosen = seq.select(
        "conv_id",
        F.col("turn_idx").alias("rec"),
        F.col("last_assistant").alias("chosen"),
    )
    return (
        pairs.join(chosen, ["conv_id", "rec"])
        .select(
            "conv_id",
            "failed_turn_idx",
            F.col("rec").alias("recovered_turn_idx"),
            "prompt",
            "rejected",
            "chosen",
        )
        .orderBy("conv_id", "failed_turn_idx")
    )


DPO_PAIRS_SQL = """
    WITH turns AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(floor(doc_id / 16.0) AS INT) AS turn_idx,
               CASE WHEN doc_id % 3 = 0 THEN 'user'
                    WHEN doc_id % 3 = 1 THEN 'assistant'
                    ELSE 'tool' END AS role,
               text,
               (doc_id % 7) <> 0 AS ok
        FROM documents
    ),
    seq AS (
        SELECT conv_id, turn_idx, role, ok,
               last_value(CASE WHEN role = 'assistant' THEN text END
                          IGNORE NULLS) OVER wp AS last_assistant,
               last_value(CASE WHEN role = 'user' THEN text END
                          IGNORE NULLS) OVER wp AS last_user,
               min(CASE WHEN role = 'tool' AND ok THEN turn_idx END)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS rec
        FROM turns
        WINDOW wp AS (PARTITION BY conv_id ORDER BY turn_idx
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    pairs AS (
        SELECT conv_id, turn_idx AS failed_turn_idx, rec,
               last_user AS prompt, last_assistant AS rejected
        FROM seq
        WHERE role = 'tool' AND NOT ok AND rec IS NOT NULL
          AND last_assistant IS NOT NULL
    )
    SELECT p.conv_id, p.failed_turn_idx,
           p.rec AS recovered_turn_idx,
           p.prompt, p.rejected, s.last_assistant AS chosen
    FROM pairs p
    JOIN seq s ON p.conv_id = s.conv_id AND p.rec = s.turn_idx
    ORDER BY p.conv_id, p.failed_turn_idx
"""


QUERIES = {
    "conv_context_budget": (conv_context_budget, CONTEXT_BUDGET_SQL),
    "conv_reply_latency": (conv_reply_latency, REPLY_LATENCY_SQL),
    "sft_pair_assembly": (sft_pair_assembly, SFT_PAIR_SQL),
    "conv_near_dup": (conv_near_dup, CONV_NEAR_DUP_SQL),
    "transcript_lint": (transcript_lint, TRANSCRIPT_LINT_SQL),
    "conv_embedding_profile": (conv_embedding_profile, CONV_EMBEDDING_PROFILE_SQL),
    "turn_grounding": (turn_grounding, TURN_GROUNDING_SQL),
    "conv_split_assignment": (conv_split_assignment, CONV_SPLIT_SQL),
    "split_decontamination": (
        split_decontamination,
        SPLIT_DECONTAMINATION_SQL,
    ),
    "assistant_self_repetition": (
        assistant_self_repetition,
        SELF_REPETITION_SQL,
    ),
    "conv_render_spans": (conv_render_spans, RENDER_SPANS_SQL),
    "conversation_funnel": (conversation_funnel, CONVERSATION_FUNNEL_SQL),
    "sft_fold_tool_turns": (sft_fold_tool_turns, SFT_FOLD_SQL),
    "dpo_pairs_from_retries": (dpo_pairs_from_retries, DPO_PAIRS_SQL),
}
