"""Custom stateful streaming operator: per-conversation accumulation with
``applyInPandasWithState``.

The batch pipeline treats a conversation as a complete unit; on a live
transcript feed, turns trickle in and a conversation is "done" only after
a quiet period. This operator maintains per-``conv_id`` state (turn count,
extracted-triple count, max turn_idx, last event time) across micro-
batches and EMITS one summary row per conversation when its processing-
time timeout fires — the streaming analog of the reference's per-project
freshness gate (docs/scripts/graphProcessor.js:36-50: a project is
re-forged when its sources stop changing).

State is bounded: one small row per open conversation; closed
conversations leave the store when their summary is emitted.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# matches the works_at/located_in/is_a planted-fact shapes (a cheap driver
# for "how many facts would extraction emit for this turn")
_FACT_RE = re.compile(r" works at | is located in | is a ")

STATE_SCHEMA = StructType(
    [
        StructField("turns", LongType()),
        StructField("facts", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turns", LongType()),
        StructField("facts", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)


def _summarize(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    (conv_id,) = key
    if state.hasTimedOut:
        turns, facts, max_turn = state.get
        state.remove()
        yield pd.DataFrame(
            [{"conv_id": conv_id, "turns": turns, "facts": facts, "max_turn_idx": max_turn}]
        )
        return

    turns, facts, max_turn = state.get if state.exists else (0, 0, -1)
    for pdf in pdfs:
        turns += len(pdf)
        facts += int(pdf["text"].fillna("").map(lambda t: len(_FACT_RE.findall(t))).sum())
        if len(pdf):
            max_turn = max(max_turn, int(pdf["turn_idx"].max()))
    state.update((turns, facts, max_turn))
    # close the conversation after 2s of processing-time silence (tests use
    # AvailableNow, where the final batch flushes all timed-out state)
    state.setTimeoutDuration(2000)
    yield from ()


def conversation_summaries(transcripts_stream: DataFrame) -> DataFrame:
    """Streaming per-conversation summaries via applyInPandasWithState.

    Update-mode output; each conversation emits exactly one row when its
    timeout fires. At scale, state is partitioned by conv_id across the
    state store — the same key layout as the batch bucket partitioning."""
    return (
        transcripts_stream.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _summarize,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
