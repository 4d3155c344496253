"""Streaming dedup: cross-batch exact first-occurrence semantics,
idempotent resume, and watermark-bounded state-store dedup."""

import datetime as dt
import os

import pytest

from graphforge_spark.schemas import TRANSCRIPT_SCHEMA
from graphforge_spark.streaming.dedup import dedup_within_watermark, incremental_dedup

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows(*specs):
    """spec: (conv, turn, text, minutes)"""
    return [
        (c, t, "user", text, None, BASE + dt.timedelta(minutes=m))
        for c, t, text, m in specs
    ]


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _drop(spark, rows, path):
    spark.createDataFrame(rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _texts(spark, out_dir):
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in spark.read.parquet(out_dir).select("conv_id", "turn_idx", "text").collect()
    )


def test_incremental_dedup_first_occurrence_across_batches(spark, dirs):
    # batch 1: 'alpha' twice (one survives, min key wins), 'beta' once
    _drop(
        spark,
        _rows(("c1", 0, "alpha doc", 0), ("c1", 1, "ALPHA DOC ", 1), ("c2", 0, "beta doc", 2)),
        dirs["in"],
    )
    incremental_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert _texts(spark, dirs["out"]) == [
        ("c1", 0, "alpha doc"),
        ("c2", 0, "beta doc"),
    ]

    # batch 2: 'alpha' again (cross-batch dup → dropped), 'gamma' (new)
    _drop(
        spark,
        _rows(("c3", 0, "alpha doc", 10), ("c3", 1, "gamma doc", 11)),
        dirs["in"],
    )
    incremental_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert _texts(spark, dirs["out"]) == [
        ("c1", 0, "alpha doc"),
        ("c2", 0, "beta doc"),
        ("c3", 1, "gamma doc"),
    ]

    # drain with no new data → idempotent
    incremental_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert len(_texts(spark, dirs["out"])) == 3


def test_incremental_dedup_output_schema_keeps_all_columns(spark, dirs):
    _drop(spark, _rows(("c1", 0, "solo doc", 0)), dirs["in"])
    incremental_dedup(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out = spark.read.parquet(dirs["out"])
    assert set(TRANSCRIPT_SCHEMA.fieldNames()) | {"_h", "batch"} == set(out.columns)


def test_dedup_within_watermark_drops_near_rearrivals(spark, dirs, tmp_path):
    # one file → one micro-batch; duplicates inside it are deduped by the
    # state store; distinct texts all pass.
    _drop(
        spark,
        _rows(
            ("c1", 0, "dup doc", 0),
            ("c1", 1, "dup doc", 1),
            ("c2", 0, "other doc", 2),
        ),
        dirs["in"],
    )
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(dirs["in"])
    )
    deduped = dedup_within_watermark(stream, delay="10 minutes")
    out_dir, ckpt = str(tmp_path / "wout"), str(tmp_path / "wckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.text for r in spark.read.parquet(out_dir).collect())
    assert got == ["dup doc", "other doc"]
    # helper column _h must not leak into the output
    assert "_h" not in spark.read.parquet(out_dir).columns


def test_dedup_within_watermark_across_microbatches(spark, dirs, tmp_path):
    # two files + maxFilesPerTrigger=1 → two micro-batches in one drain;
    # the state store must drop the batch-2 re-arrival of 'dup doc'
    _drop(spark, _rows(("c1", 0, "dup doc", 0)), dirs["in"])
    _drop(spark, _rows(("c2", 0, "dup doc", 1), ("c3", 0, "fresh doc", 2)), dirs["in"])
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["in"])
    )
    deduped = dedup_within_watermark(stream, delay="10 minutes")
    out_dir, ckpt = str(tmp_path / "xout"), str(tmp_path / "xckpt")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.text for r in spark.read.parquet(out_dir).collect())
    assert got == ["dup doc", "fresh doc"]
