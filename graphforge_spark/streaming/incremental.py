"""Structured Streaming front-end for the forge: incremental triple
extraction over an arriving transcript stream.

The reference's incremental story is batch-on-event: an mtime freshness
gate (docs/scripts/graphProcessor.js:36-50) plus append-on-upload
(docs/test HTML/documentQueryTest.html:417-430). The checkpointed batch
pipeline (graphforge_spark/pipeline.py) reproduces exactly that; this
module is the continuous variant for transcript feeds that arrive as
files: readStream → stateless extraction → exactly-once sink via Spark's
own streaming checkpoint (WAL + file-source offsets).

Design points for scale:
- extraction is stateless, so it rides the micro-batch with no state
  store; watermarked windowed aggregation is the only stateful operator;
- ``foreachBatch`` reuses the SAME batch operators (extract_patterns,
  dedup_triples) — one code path to test, two execution modes;
- Trigger.AvailableNow drains a backlog with bounded batches and stops —
  the idiomatic "incremental batch" schedule (cron-driven catch-up runs
  with streaming-grade exactly-once bookkeeping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.operators.extract import dedup_triples, extract_patterns
from graphforge_spark.schemas import TRANSCRIPT_SCHEMA


def stream_transcripts(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of transcript parquet drops (schema per
    BASELINE.json input_hint). maxFilesPerTrigger bounds micro-batch size
    so a backlog cannot OOM an executor."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )


def incremental_forge(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """Continuously extract triples from arriving transcript files and
    land them in a parquet triple log, exactly-once.

    Exactly-once mechanics: the streaming checkpoint (WAL + file-source
    offsets) guarantees each input file is assigned to exactly one
    batch_id, and the sink is IDEMPOTENT per batch_id — each micro-batch
    overwrites its own ``batch=<id>`` partition directory, so a batch
    replayed after a mid-write failure rewrites the same partition instead
    of appending duplicates (a blind append here would be at-least-once).

    Dedup is per-micro-batch (the reference's per-upload append semantics,
    documentQueryTest.html:417-430); global set semantics are applied by
    the downstream materialize (A12), same as the batch path. Readers of
    ``output_dir`` see the ``batch`` partition column; drop it for the
    triple log proper. Returns the terminated StreamingQuery.
    """
    stream = stream_transcripts(spark, input_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import os

        triples = dedup_triples(extract_patterns(batch_df))
        triples.write.mode("overwrite").parquet(
            os.path.join(output_dir, f"batch={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_triple_counts(
    transcripts_stream: DataFrame,
    window_duration: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Stateful streaming aggregate: triples-per-predicate per event-time
    tumbling window, tolerating ``watermark`` of late data. Late rows
    beyond the watermark are dropped and their state evicted — bounded
    state at unbounded runtime. Match extraction happens inline (keeping
    ``ts`` in scope) rather than via extract_patterns, whose provenance
    columns drop the event time."""
    return (
        transcripts_stream.withWatermark("ts", watermark)
        .select("ts", "conv_id", "turn_idx", "text")
        .select(
            "ts",
            F.explode(
                F.expr(
                    r"regexp_extract_all(text, '([A-Za-z0-9_ ]+) works at ([A-Za-z0-9_ ]+)', 0)"
                )
            ).alias("m"),
        )
        .groupBy(F.window("ts", window_duration).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
