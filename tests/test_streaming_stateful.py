"""applyInPandasWithState conversation summaries: state accumulates
across micro-batches and flushes on timeout."""

import datetime as dt
import os
import time

from graphforge_spark.schemas import TRANSCRIPT_SCHEMA
from graphforge_spark.streaming.stateful import conversation_summaries
from graphforge_spark.streaming.incremental import stream_transcripts

BASE = dt.datetime(2024, 1, 1)


def _write(spark, rows, path):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_conversation_summaries_accumulate_and_flush(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    _write(
        spark,
        [
            ("c1", 0, "user", "Alice works at Acme.", None, BASE),
            ("c1", 1, "user", "Acme is located in Springfield. Bob works at Acme.", None, BASE),
            ("c2", 0, "user", "no facts", None, BASE),
        ],
        inp,
    )
    # two drains: batch 1 feeds state; a later empty-ish batch lets the
    # processing-time timeout fire and flush summaries
    _write(spark, [("c3", 0, "user", "filler", None, BASE)], inp)

    q = (
        conversation_summaries(stream_transcripts(spark, inp))
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("convsum")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            got = {
                r.conv_id: (r.turns, r.facts, r.max_turn_idx)
                for r in spark.sql("SELECT * FROM convsum").collect()
            }
            if {"c1", "c2", "c3"} <= set(got):
                break
            time.sleep(1)
    finally:
        q.stop()

    assert got.get("c1") == (2, 3, 1)  # 2 turns, 3 planted facts, max idx 1
    assert got.get("c2") == (1, 0, 0)
    assert got.get("c3") == (1, 0, 0)
