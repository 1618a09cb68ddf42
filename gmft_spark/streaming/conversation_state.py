"""Stateful streaming conversation assembly.

A custom stateful operator (``applyInPandasWithState`` with EVENT-TIME
timeouts): transcript turns stream in out of order across micro-batches;
per-conversation state accumulates them until the watermark passes the
conversation's quiet period (``GAP``), at which point the COMPLETE
conversation is emitted once — turns joined in ``turn_idx`` order — and
the state is dropped. This is the streaming face of
``plans/skew.assemble_conversation_text``: the batch path groups a
finished corpus; this path decides *when a conversation is finished*
from event time.

Scale notes: state is keyed by conv_id (the natural shard); each group
holds only its own turns and is freed at timeout, so state size tracks
the number of IN-FLIGHT conversations, not the corpus. The watermark
bounds both lateness and state lifetime; a turn arriving after its
conversation timed out starts a fresh (partial) group — the documented
late-data trade every watermarked aggregation makes.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GAP_MS = 10 * 60 * 1000  # quiet period after which a conversation closes

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", IntegerType()),
        StructField("full_text", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("turn_idxs", ArrayType(IntegerType())),
        StructField("texts", ArrayType(StringType())),
        StructField("max_ts_ms", LongType()),
    ]
)


def _assemble_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        idxs, texts, _ = state.get
        order = sorted(range(len(idxs)), key=lambda i: (idxs[i], i))
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_turns": len(idxs),
                    "full_text": "\n".join(texts[i] for i in order),
                }
            ]
        )
        return
    idxs, texts, max_ts = (
        (list(state.get[0]), list(state.get[1]), state.get[2])
        if state.exists
        else ([], [], 0)
    )
    for pdf in batches:
        for turn_idx, text, ts in zip(pdf["turn_idx"], pdf["text"], pdf["ts"]):
            idxs.append(int(turn_idx))
            texts.append(text)
            max_ts = max(max_ts, int(ts.value // 1_000_000))
    state.update((idxs, texts, max_ts))
    # close GAP after the conversation's own latest event time, but never
    # at-or-before the current watermark (Spark requires strictly later)
    state.setTimeoutTimestamp(
        max(max_ts + GAP_MS, state.getCurrentWatermarkMs() + 1)
    )


def stream_assemble_conversations(transcripts: DataFrame) -> DataFrame:
    """Watermarked streaming transcripts → one row per COMPLETED
    conversation (closed by event-time quiet period)."""
    return (
        transcripts.withWatermark("ts", "10 minutes")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _assemble_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
