"""Streaming deduplication — exact dedup over an arriving document/
transcript stream, the on-ingest half of the batch `docops` dedup story.

Two operators with different state contracts:

- ``dedup_within_watermark``: Spark-native state-store dedup
  (`dropDuplicatesWithinWatermark`): drops re-arrivals of a key within
  the event-time watermark, state evicted after it — BOUNDED state at
  unbounded runtime. This is the scale-path guarantee: duplicates in a
  web crawl overwhelmingly arrive close together (re-crawls, mirror
  bursts), and the batch exact-dedup pass downstream owns the long-range
  tail. Same division of labor as the batch pipeline: streaming catches
  the near-in-time mass cheaply, the nightly job is the set-semantics
  authority.

- ``incremental_dedup``: foreachBatch first-occurrence-wins dedup with
  the landed output itself as the dedup ledger — EXACT across all time,
  state = one hash column of the output table (disk, not the state
  store). Exactly-once mechanics mirror `incremental.incremental_forge`:
  each micro-batch overwrites its own ``batch=<id>`` partition, and the
  against-history anti-join reads the output EXCLUDING the batch's own
  partition, so a replayed batch recomputes an identical result instead
  of deduping against its own half-written output (prior partitions are
  immutable once their batch commits).

Reference scope note: GraphForge's incremental story is append-on-upload
(docs/test HTML/documentQueryTest.html:417-430) with set semantics
applied at materialize time; these operators are the training-data-layer
generalization the build brief adds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.functions.hashing import exact_text_key
from graphforge_spark.schemas import TRANSCRIPT_SCHEMA


def _text_key(text_col: str):
    """Normalized exact-dedup key — the ONE shared definition
    (functions/hashing.exact_text_key), so streaming and batch dedup
    can never silently disagree on what 'exact duplicate' means."""
    return exact_text_key(F.col(text_col))


def dedup_within_watermark(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """First occurrence of each normalized text within the watermark
    window; re-arrivals inside ``delay`` are dropped, state for keys
    older than the watermark is evicted. Rows with NULL event time are
    refused loudly by Spark (watermark requires the column); NULL text
    normalizes to its own key and dedups like any other value."""
    return (
        stream.withColumn("_h", _text_key(text_col))
        .withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )


def incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    await_termination: bool = True,
):
    """Drain arriving transcript files into an exactly-deduplicated
    parquet log: the FIRST occurrence (min (conv_id, turn_idx) within
    the earliest batch) of each normalized text survives; later
    arrivals — within a batch or across batches — are dropped.

    Ledger = output: a new batch anti-joins its keys against the hashes
    already landed in prior batches' partitions. That read is one
    column (the hash) of the output table with the batch's own
    partition pruned out — partition pruning keeps replay correct and
    the scan cost is a single-column parquet read, which at 100 TB is
    the same order as the state such a dedup must carry anywhere.
    Returns the terminated StreamingQuery."""
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        hashed = batch_df.withColumn("_h", _text_key(text_col))
        # within-batch: one row per key, deterministic winner
        winner = F.struct("conv_id", "turn_idx", *[c for c in batch_df.columns
                                                   if c not in ("conv_id", "turn_idx")])
        first = (
            hashed.groupBy("_h")
            .agg(F.min(winner).alias("_w"))
            .select("_h", "_w.*")
        )
        # across batches: drop keys already landed by PRIOR batches.
        # Excluding this batch's own partition makes replay idempotent.
        # ONLY a missing output dir means "first batch" — any other read
        # failure (transient FS error, corrupt footer, permissions) must
        # fail the batch so the streaming checkpoint retries it, instead
        # of silently skipping the history check and landing duplicates
        # forever.
        from pyspark.errors import AnalysisException

        try:
            ledger = spark.read.parquet(output_dir)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                ledger = None
            else:
                raise
        if ledger is None:
            fresh = first
        else:
            seen = ledger.filter(F.col("batch") != batch_id).select("_h")
            fresh = first.join(seen, "_h", "left_anti")
        fresh.write.mode("overwrite").parquet(
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
