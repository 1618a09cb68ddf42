"""Agent tool-call analytics over transcript turns.

The input contract (BASELINE.json ``input_hint``) is an agent-transcript
table whose tool turns carry structured payloads. This module parses
those payloads with JVM-side ``from_json`` (no Python in the hot path)
and derives the two views an agent-ops pipeline needs: per-tool call
stats (volume / latency / success) and the tool-transition graph
(which tool follows which inside a conversation).

Oracle strategy: the tool payloads are synthesized DETERMINISTICALLY
from doc_id arithmetic (same pattern as kernel/synth.py's named draws),
so the DuckDB twin re-derives every field from the generation rule in
pure SQL while the Spark path goes through the real JSON string and
``from_json`` — the parse itself is inside the checked surface.

Scale notes (100 TB framing): payload parsing is a narrow map inside
whole-stage codegen (from_json is a JVM expression); the stats query is
ONE map-side-combinable groupBy on a low-cardinality key; transitions
use a conv-partitioned window (one shuffle keyed on conv_id — the same
partitioning the extraction pipeline already uses, so at scale the
frames co-partition) followed by a pair-count groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TOOL_NAMES = ["search", "browser", "python", "pdf_reader"]

_PAYLOAD_SCHEMA = "tool string, ms bigint, ok boolean, args struct<n:bigint>"


def _tool_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript tool turns (doc_id % 3 == 2, mirroring
    transcripts_from_documents' role rule) with a JSON payload column
    built character-for-character from the deterministic fields — the
    ONLY way back to the fields on the Spark side is parsing it."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.col("doc_id")
    # NOT keyed on doc_id % 4 alone: within a conversation tool turns
    # step doc_id by 48 (≡ 0 mod 4), which would repeat ONE tool per
    # conversation and degenerate the transition graph to self-loops;
    # turn_idx alone cycles a fixed rotation. turn_idx + doc_id%7 steps
    # irregularly (48 % 7 = 6), so all 16 transition pairs occur.
    tn = (F.expr("doc_id DIV 16") + k % 7) % 4
    name = (
        F.when(tn == 0, TOOL_NAMES[0])
        .when(tn == 1, TOOL_NAMES[1])
        .when(tn == 2, TOOL_NAMES[2])
        .otherwise(TOOL_NAMES[3])
    )
    payload = F.concat(
        F.lit('{"tool":"'),
        name,
        F.lit('","ms":'),
        ((k * 37) % 2000).cast("string"),
        F.lit(',"ok":'),
        F.when(k % 7 != 0, "true").otherwise("false"),
        F.lit(',"args":{"n":'),
        (k % 3).cast("string"),
        F.lit("}}"),
    )
    return docs.filter(k % 3 == 2).select(
        F.concat(
            F.lit("conv-"), F.col("source"), F.lit("-"), (k % 16).cast("string")
        ).alias("conv_id"),
        (k / 16).cast("int").alias("turn_idx"),
        payload.alias("payload"),
    )


# SQL twin of _tool_turns' deterministic fields (no JSON functions —
# the oracle re-derives from the generation rule, proving the Spark
# side's build→from_json round trip recovers exactly these values).
_TOOL_FIELDS_CTE = """
    WITH t AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(doc_id // 16 AS INT) AS turn_idx,
               ['search', 'browser', 'python', 'pdf_reader']
                   [((doc_id // 16 + doc_id % 7) % 4) + 1] AS tool,
               CAST((doc_id * 37) % 2000 AS BIGINT) AS ms,
               (doc_id % 7) <> 0 AS ok,
               CAST(doc_id % 3 AS BIGINT) AS n_args
        FROM documents
        WHERE doc_id % 3 = 2
    )
"""


def toolcall_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool call stats: volume, total latency, success count/rate.
    One narrow from_json map + one 4-group aggregation — the plan is a
    scan-side partial agg at any corpus size."""
    t = _tool_turns(spark, sf_dir)
    p = F.from_json(F.col("payload"), _PAYLOAD_SCHEMA).alias("p")
    calls = t.select(p).select("p.tool", "p.ms", "p.ok", "p.args.n")
    return (
        calls.groupBy("tool")
        .agg(
            F.count("*").cast("long").alias("n_calls"),
            F.sum("ms").cast("long").alias("total_ms"),
            F.sum(F.when(F.col("ok"), 1).otherwise(0))
            .cast("long")
            .alias("n_ok"),
            F.sum("n").cast("long").alias("total_args"),
        )
        .select(
            "tool",
            "n_calls",
            "total_ms",
            "n_ok",
            F.round(
                F.col("n_ok").cast("double") / F.col("n_calls").cast("double"),
                6,
            ).alias("ok_rate"),
            "total_args",
        )
        .orderBy("tool")
    )


TOOLCALL_STATS_SQL = (
    _TOOL_FIELDS_CTE
    + """
    SELECT tool,
           CAST(count(*) AS BIGINT) AS n_calls,
           CAST(sum(ms) AS BIGINT) AS total_ms,
           CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           round(CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 6) AS ok_rate,
           CAST(sum(n_args) AS BIGINT) AS total_args
    FROM t
    GROUP BY tool
    ORDER BY tool
"""
)


def toolcall_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool-transition graph: for consecutive tool turns within a
    conversation (turn_idx order), count (prev_tool → tool) pairs — the
    "what does the agent reach for next" view used to spot loops and
    dead-end chains. First tool turn of a conversation has no
    predecessor and is excluded (lag is NULL)."""
    t = _tool_turns(spark, sf_dir)
    p = F.from_json(F.col("payload"), _PAYLOAD_SCHEMA)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = t.select("conv_id", "turn_idx", p["tool"].alias("tool")).select(
        "tool", F.lag("tool").over(w).alias("prev_tool")
    )
    return (
        seq.filter(F.col("prev_tool").isNotNull())
        .groupBy("prev_tool", "tool")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("prev_tool", "tool")
    )


TOOLCALL_TRANSITIONS_SQL = (
    _TOOL_FIELDS_CTE
    + """
    , seq AS (
        SELECT tool,
               lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                   AS prev_tool
        FROM t
    )
    SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n
    FROM seq
    WHERE prev_tool IS NOT NULL
    GROUP BY prev_tool, tool
    ORDER BY prev_tool, tool
"""
)


# ---------------------------------------------------------------------------
# Tool-call LOOP detection: the stuck-agent filter a rollout-curation
# pipeline applies before training on agent transcripts (an agent
# re-issuing the same tool over and over is a failure trace, not a
# demonstration). The operator is generic gaps-and-islands run-length
# analysis over (conv_id, turn_idx, tool); the synthetic input draws a
# NAMED per-turn retry bit (md5 last-hex-char rule — CLAUDE.md: small
# moduli ride hex chars, never the numeric low bits), so the oracle
# re-derives every run from the draws while Spark detects them from
# tool equality alone — two independent derivations of the same runs.

LOOP_MIN = 2  # runs of >= this many consecutive same-tool calls flag

# last-hex-char values that make a turn RETRY the current tool
# (5/16 ≈ 0.31 retry probability; the rest advance to the next tool)
_RETRY_HEX = ("0", "1", "2", "3", "4")


def _loop_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tool turns whose tool sequence contains genuine retry runs: a
    named md5 draw ('loop|' conv '|' turn) decides advance-vs-retry; the
    tool is TOOL_NAMES[(conv_key + segment) % 4], so consecutive
    segments always differ and runs == segments exactly."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = F.col("doc_id")
    base = docs.filter(k % 3 == 2).select(
        F.concat(
            F.lit("conv-"), F.col("source"), F.lit("-"), (k % 16).cast("string")
        ).alias("conv_id"),
        (k / 16).cast("int").alias("turn_idx"),
        (k % 16).alias("ck"),
    )
    draw = F.substring(
        F.md5(
            F.concat(
                F.lit("loop|"),
                F.col("conv_id"),
                F.lit("|"),
                F.col("turn_idx").cast("string"),
            )
        ),
        32,
        1,
    )
    adv = F.when(draw.isin(*_RETRY_HEX), F.lit(0)).otherwise(F.lit(1))
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = F.sum(adv).over(w)
    ti = (F.col("ck") + seg) % 4
    tool = (
        F.when(ti == 0, TOOL_NAMES[0])
        .when(ti == 1, TOOL_NAMES[1])
        .when(ti == 2, TOOL_NAMES[2])
        .otherwise(TOOL_NAMES[3])
    )
    # success bit rides the payload rule (doc_id % 7 != 0, reconstructed
    # from 16*turn_idx + ck) so the retry-recovery view sees failures on
    # the SAME sequence whose retry draws create genuine same-tool runs
    ok = (F.col("turn_idx") * 16 + F.col("ck")) % 7 != 0
    return base.select("conv_id", "turn_idx", tool.alias("tool"), ok.alias("ok"))


def toolcall_loop_runs(turns: DataFrame) -> DataFrame:
    """Run-length analysis of the tool sequence per conversation
    (gaps-and-islands: a run starts where tool != lag(tool)): total tool
    turns, number of runs, longest run, runs of length >= LOOP_MIN, and
    the is_looping flag. Works on ANY (conv_id, turn_idx, tool) frame.

    Scale shape: one shuffle keyed on conv_id (the pipeline's standard
    partitioning — co-partitions with extraction at scale); both the
    run-id window and the two rollups stay inside that partitioning, and
    the final per-conv aggregate is map-side combinable."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    wrun = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = turns.select(
        "conv_id",
        "turn_idx",
        "tool",
        F.when(
            F.lag("tool").over(w).isNull()
            | (F.lag("tool").over(w) != F.col("tool")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    ).withColumn("run_id", F.sum("new_run").over(wrun))
    runs = marked.groupBy("conv_id", "run_id").agg(
        F.count("*").alias("run_len")
    )
    return (
        runs.groupBy("conv_id")
        .agg(
            F.sum("run_len").cast("long").alias("n_tool_turns"),
            F.count("*").cast("long").alias("n_runs"),
            F.max("run_len").cast("long").alias("longest_run"),
            F.count(F.when(F.col("run_len") >= LOOP_MIN, 1))
            .cast("long")
            .alias("n_loops"),
        )
        .withColumn(
            "is_looping",
            (F.col("longest_run") >= LOOP_MIN).cast("int"),
        )
        .orderBy("conv_id")
    )


def toolcall_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate wiring: loop detection over the retry-draw tool sequence."""
    return toolcall_loop_runs(_loop_turns(spark, sf_dir))


_HEXLIST = ", ".join(f"'{h}'" for h in _RETRY_HEX)

# Shared by TOOLCALL_LOOPS_SQL and TOOLCALL_RETRY_SQL: the doc_id%3=2
# tool-turn predicate and the named retry-draw segment arithmetic are ONE
# rule — both oracles must re-derive the same synthetic sequence that
# _loop_turns generates, so the CTE prefix lives in one place (same
# pattern as curation._bpe_sql_ctes and scene_sql._AHASH_CTES).
_SEG_CTES = f"""
    WITH t AS (
        SELECT 'conv-' || source || '-' || CAST(doc_id % 16 AS VARCHAR)
                   AS conv_id,
               CAST(doc_id // 16 AS INT) AS turn_idx,
               doc_id % 16 AS ck,
               (doc_id % 7) <> 0 AS ok
        FROM documents
        WHERE doc_id % 3 = 2
    ),
    segs AS (
        SELECT conv_id, turn_idx, ck, ok,
               sum(CASE WHEN substr(md5('loop|' || conv_id || '|'
                                    || CAST(turn_idx AS VARCHAR)), 32, 1)
                        IN ({_HEXLIST}) THEN 0 ELSE 1 END)
                   OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS seg
        FROM t
    )
"""

# The oracle NEVER runs gaps-and-islands: it re-derives each turn's
# segment number straight from the named draws (runs == segments by
# construction), so a Spark-side run-detection bug cannot hide.
TOOLCALL_LOOPS_SQL = _SEG_CTES + f""",
    runs AS (
        SELECT conv_id, seg, count(*) AS run_len
        FROM segs GROUP BY conv_id, seg
    )
    SELECT conv_id,
           CAST(sum(run_len) AS BIGINT) AS n_tool_turns,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(count(*) FILTER (WHERE run_len >= {LOOP_MIN}) AS BIGINT)
               AS n_loops,
           CAST(CASE WHEN max(run_len) >= {LOOP_MIN} THEN 1 ELSE 0 END
                AS INT) AS is_looping
    FROM runs
    GROUP BY conv_id
    ORDER BY conv_id
"""


def toolcall_retry_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Failure-recovery analysis: for every FAILED tool call (ok=false),
    what happens at the conversation's next tool turn — nothing (the
    failure ended the chain), a switch to another tool, or a retry of the
    same tool, and did the retry succeed? Per tool: failure count, how
    many failures had a follow-up turn, same-tool retries, and retries
    that recovered — the "is the agent's error handling productive" view
    a rollout-curation pipeline uses to keep recoveries and drop
    abandoned failure traces.

    Runs over the retry-draw tool sequence (``_loop_turns``): its named
    draws make same-tool follow-ups genuinely occur (~31% of adjacent
    pairs), where the JSON-payload rotation never repeats across a
    conversation's 48-doc_id tool stride — every counter below is live
    on the gate corpus (branch-census rule).

    Scale shape: one conv_id shuffle shared by the segment and lead
    windows (the pipeline's standard partitioning), then a
    map-side-combinable groupBy on the 4-value tool key."""
    t = _loop_turns(spark, sf_dir)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    seq = t.select(
        "tool",
        "ok",
        F.lead("tool").over(w).alias("next_tool"),
        F.lead("ok").over(w).alias("next_ok"),
    )
    retry = F.col("next_tool") == F.col("tool")
    return (
        seq.filter(~F.col("ok"))
        .groupBy("tool")
        .agg(
            F.count("*").cast("long").alias("n_failures"),
            F.count(F.col("next_tool")).cast("long").alias("n_followed_up"),
            F.count(F.when(retry, 1)).cast("long").alias("n_retries"),
            F.count(F.when(retry & F.col("next_ok"), 1))
            .cast("long")
            .alias("n_recovered"),
        )
        .withColumn(
            "recovery_rate",
            F.round(
                F.col("n_recovered").cast("double")
                / F.col("n_failures").cast("double"),
                6,
            ),
        )
        .orderBy("tool")
    )


TOOLCALL_RETRY_SQL = _SEG_CTES + """,
    named AS (
        SELECT conv_id, turn_idx, ok,
               ['search', 'browser', 'python', 'pdf_reader']
                   [CAST((ck + seg) % 4 AS INT) + 1] AS tool
        FROM segs
    ),
    seq AS (
        SELECT tool, ok,
               lead(tool) OVER w AS next_tool,
               lead(ok) OVER w AS next_ok
        FROM named
        WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
    )
    SELECT tool,
           CAST(count(*) AS BIGINT) AS n_failures,
           CAST(count(next_tool) AS BIGINT) AS n_followed_up,
           CAST(count(*) FILTER (WHERE next_tool = tool) AS BIGINT)
               AS n_retries,
           CAST(count(*) FILTER (WHERE next_tool = tool AND next_ok)
                AS BIGINT) AS n_recovered,
           round(CAST(count(*) FILTER (WHERE next_tool = tool AND next_ok)
                      AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS recovery_rate
    FROM seq
    WHERE NOT ok
    GROUP BY tool
    ORDER BY tool
"""


QUERIES = {
    "toolcall_stats": (toolcall_stats, TOOLCALL_STATS_SQL),
    "toolcall_transitions": (toolcall_transitions, TOOLCALL_TRANSITIONS_SQL),
    "toolcall_loops": (toolcall_loops, TOOLCALL_LOOPS_SQL),
    "toolcall_retry_recovery": (toolcall_retry_recovery, TOOLCALL_RETRY_SQL),
}
