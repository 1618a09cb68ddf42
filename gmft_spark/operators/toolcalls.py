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


QUERIES = {
    "toolcall_stats": (toolcall_stats, TOOLCALL_STATS_SQL),
    "toolcall_transitions": (toolcall_transitions, TOOLCALL_TRANSITIONS_SQL),
}
