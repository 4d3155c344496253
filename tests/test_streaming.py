"""Structured Streaming incremental forge: exactly-once file-source
processing, resume-from-checkpoint, parity with the batch extractor, and
watermarked windowed aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.operators.extract import dedup_triples, extract_patterns
from graphforge_spark.streaming.incremental import (
    incremental_forge,
    stream_transcripts,
    windowed_triple_counts,
)


@pytest.fixture()
def dirs(tmp_path):
    d = {k: str(tmp_path / k) for k in ("in", "out", "ckpt")}
    os.makedirs(d["in"])
    return d


def _write_chunk(spark, fx_rows, path, chunk_id):
    from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

    spark.createDataFrame(fx_rows, TRANSCRIPT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_forge_matches_batch_and_resumes(spark, dirs):
    fx = gen_transcripts(seed=7, n_convs=6, turns_per_conv=4)
    half = len(fx.rows) // 2
    text_rows = [r for r in fx.rows if r[4] is None]  # pattern turns only
    first, second = text_rows[:half], text_rows[half:]

    # chunk 1 arrives → drain with AvailableNow
    _write_chunk(spark, first, dirs["in"], 0)
    incremental_forge(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out1 = spark.read.parquet(dirs["out"])
    assert _triple_set(out1) == _triple_set(dedup_triples(extract_patterns(_df(spark, first))))

    # chunk 2 arrives → SAME checkpoint: only new files processed (no dupes)
    _write_chunk(spark, second, dirs["in"], 1)
    incremental_forge(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    out2 = spark.read.parquet(dirs["out"])
    full_batch = dedup_triples(extract_patterns(_df(spark, first + second)))
    assert _triple_set(out2) == _triple_set(full_batch)

    # re-run with NO new data → idempotent (nothing appended)
    n_before = spark.read.parquet(dirs["out"]).count()
    incremental_forge(spark, dirs["in"], dirs["out"], dirs["ckpt"])
    assert spark.read.parquet(dirs["out"]).count() == n_before


def _df(spark, rows):
    from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)


def _triple_set(df):
    return {
        (r.subj, r.pred, r.obj, r.obj_is_literal)
        for r in df.select("subj", "pred", "obj", "obj_is_literal").collect()
    }


def test_windowed_triple_counts_with_late_data(spark, dirs, tmp_path):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("c1", 0, "user", "Alice works at Acme.", None, base),
        ("c1", 1, "user", "Bob works at Globex.", None, base + dt.timedelta(minutes=1)),
        ("c1", 2, "user", "Carol works at Acme.", None, base + dt.timedelta(minutes=7)),
        ("c1", 3, "user", "no facts here", None, base + dt.timedelta(minutes=8)),
    ]
    far = [("c1", 4, "user", "Dan works at Initech.", None, base + dt.timedelta(hours=2))]
    _write_chunk(spark, rows + far, dirs["in"], 0)
    stream = stream_transcripts(spark, dirs["in"])
    agg = windowed_triple_counts(stream, window_duration="5 minutes")
    # complete mode shows every window (append would hold windows open
    # until the watermark passes them — exercised implicitly by the
    # watermark operator being in the plan)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.window_start: r.n for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    assert got.get(base) == 2  # two matches in [0:00, 0:05)
    assert got.get(base + dt.timedelta(minutes=5)) == 1  # one in [0:05, 0:10)
    assert got.get(base + dt.timedelta(hours=2)) == 1  # the far-future row
