"""Stateful streaming deduplication.

A custom stateful operator (``applyInPandasWithState``): as transcript
turns stream in, each content fingerprint is checked against per-bucket
state (the set of fingerprints seen so far, sharded by a hash bucket so
state never concentrates on one key). First occurrence passes through;
replays and duplicates — within a micro-batch or across batches/restarts
(state lives in the checkpoint) — are dropped.

This is the streaming face of the exact-dedup operator
(operators/dedup.py); bucketing bounds per-group state exactly like the
batch pipeline's conv-bucket lineage.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

N_STATE_BUCKETS = 32

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("fingerprint", StringType()),
        StructField("text", StringType()),
    ]
)

STATE_SCHEMA = StructType([StructField("seen", ArrayType(StringType()))])


def _dedup_group(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out = []
    for pdf in batches:
        for conv_id, turn_idx, fp, text in zip(
            pdf["conv_id"], pdf["turn_idx"], pdf["fingerprint"], pdf["text"]
        ):
            if fp in seen:
                continue
            seen.add(fp)
            out.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": int(turn_idx),
                    "fingerprint": fp,
                    "text": text,
                }
            )
    state.update((sorted(seen),))
    if out:
        yield pd.DataFrame(out)


def stream_dedup(transcripts: DataFrame) -> DataFrame:
    """Streaming transcripts → first-occurrence-only rows. State is
    sharded over N_STATE_BUCKETS fingerprint buckets."""
    keyed = transcripts.select(
        "conv_id",
        "turn_idx",
        F.md5(F.col("text")).alias("fingerprint"),
        "text",
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("fingerprint"), F.lit(N_STATE_BUCKETS))
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
