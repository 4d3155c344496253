"""spread_small_scan (corpus.py): the under-split-scan spreader must
fire for small file-backed scans, stay an identity for frames that are
already parallel enough, and never consult df.rdd for file-backed
frames (the r3-verdict plan-conversion nit) — pinned by behavior: a
range frame with natural partitioning == defaultParallelism passes
through as the SAME object (no added exchange)."""

from graphforge_spark.corpus import load, spread_small_scan
from graphforge_spark.fixtures import gen_transcripts_dist


def test_small_file_scan_spreads(spark):
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = spread_small_scan(docs)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_range_frame_is_identity(spark):
    tr = gen_transcripts_dist(spark, 10_000, 10)
    out = spread_small_scan(tr)
    assert out is tr
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION" not in plan.upper()


def test_spread_is_value_neutral(spark):
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    assert spread_small_scan(docs).count() == docs.count()
