"""Checkpoint / lineage / metrics table — the incremental-build gate.

Reference analog: the mtime freshness check (rebuild quads.nq only when a
source file is newer, docs/scripts/graphProcessor.js:36-50) and
append-on-upload (docs/test HTML/documentQueryTest.html:417-430). Ours is
per-partition and idempotent:

- work unit = ``part_id`` (deterministic bucket of conv_id),
- a checkpoint row (stage, part_id, rows_in, triples_out, wall_ms, run_id,
  completed_at) is appended AFTER the partition's output is durably
  written with dynamic-partition overwrite,
- resume = anti-join pending work against completed checkpoint rows
  (``left_anti``) — re-running a completed bucket is a no-op; re-running
  an interrupted one overwrites only its own output partition.

Crash-safety argument: output-partition write and checkpoint append are
two steps; a crash between them re-runs that bucket, and the dynamic
overwrite makes the re-run byte-identical — at-least-once execution,
exactly-once effect.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.schemas import CHECKPOINT_SCHEMA


def checkpoint_path(warehouse: str) -> str:
    return os.path.join(warehouse, "_checkpoints")


def read_checkpoints(spark: SparkSession, warehouse: str) -> DataFrame:
    path = checkpoint_path(warehouse)
    try:
        return spark.read.schema(CHECKPOINT_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], CHECKPOINT_SCHEMA)


def completed_parts(spark: SparkSession, warehouse: str, stage: str) -> DataFrame:
    return (
        read_checkpoints(spark, warehouse)
        .filter(F.col("stage") == stage)
        .select("part_id")
        .distinct()
    )


def pending_parts(
    spark: SparkSession, warehouse: str, stage: str, all_parts: DataFrame
) -> DataFrame:
    """All part_ids not yet checkpointed for ``stage`` (left_anti gate)."""
    done = completed_parts(spark, warehouse, stage)
    return all_parts.join(done, "part_id", "left_anti")


def append_checkpoints(
    spark: SparkSession,
    warehouse: str,
    stage: str,
    run_id: str,
    metrics: list[tuple[int, int, int, int]],
) -> None:
    """metrics: list of (part_id, rows_in, triples_out, wall_ms)."""
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    rows = [
        (stage, int(p), int(ri), int(to), int(wm), run_id, now) for p, ri, to, wm in metrics
    ]
    spark.createDataFrame(rows, CHECKPOINT_SCHEMA).write.mode("append").parquet(
        checkpoint_path(warehouse)
    )


def delete_checkpoints(
    spark: SparkSession, warehouse: str, keep_predicate=None
) -> None:
    """Rewrite the checkpoint table keeping only rows matching the
    predicate (test helper for resume scenarios)."""
    df = read_checkpoints(spark, warehouse)
    kept = df.filter(keep_predicate) if keep_predicate is not None else df.limit(0)
    kept_rows = kept.collect()
    spark.createDataFrame(kept_rows, CHECKPOINT_SCHEMA).write.mode("overwrite").parquet(
        checkpoint_path(warehouse)
    )
