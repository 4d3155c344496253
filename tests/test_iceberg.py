"""Iceberg storage branch (BASELINE.json: Iceberg-backed tables).

This container ships no iceberg-spark-runtime jar, so the whole module
skips WITH AN EXPLICIT REASON here; on any classpath that carries the
jar the same tests run for real — writer create/overwritePartitions,
catalog read-back, and the MERGE INTO upsert. The parquet branch of the
identical writer functions is covered by test_pipeline_resume.
"""

import glob
import os

import pyspark
import pytest
from pyspark.sql import functions as F


def _jar_present() -> bool:
    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*"))
    )


# applied per-test (not module-wide) so the jar-less golden-SQL tests
# below still run in this container — see BENCH/ICEBERG.md for the
# environmental statement bounding what executes where
needs_jar = pytest.mark.skipif(
    not _jar_present(),
    reason="iceberg-spark-runtime jar not on the classpath in this container; "
    "the iceberg branch runs wherever the jar ships",
)


def test_merge_sql_golden():
    """The exact MERGE INTO text merge_upsert executes — runnable
    WITHOUT the jar, so the statement shape is pinned in this sandbox
    even though the execution tests skip."""
    from graphforge_spark.sinks.tables import _merge_sql

    assert _merge_sql("forge.kg.ckpt", "_merge_src_abc", ["stage", "part_id"]) == (
        "MERGE INTO forge.kg.ckpt t USING _merge_src_abc s "
        "ON t.stage = s.stage AND t.part_id = s.part_id "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def test_iceberg_table_naming_golden():
    from graphforge_spark.sinks.tables import _iceberg_table

    assert _iceberg_table("forge", "triples") == "forge.kg.triples"

TRIPLE_ROWS = [
    ("http://e/a", "http://p/x", "http://e/b", False, "g", "conv-0", 0),
    ("http://e/b", "http://p/x", "http://e/c", False, "g", "conv-1", 1),
    ("http://e/c", "http://p/y", "lit", True, "g", "conv-2", 2),
]
TRIPLE_SCHEMA = (
    "subj string, pred string, obj string, obj_is_literal boolean, "
    "graph string, src_conv_id string, src_turn_idx int"
)


def _catalog_conf(spark, tmp_path):
    spark.conf.set("spark.sql.catalog.forge", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.forge.type", "hadoop")
    spark.conf.set("spark.sql.catalog.forge.warehouse", str(tmp_path / "wh"))


@needs_jar
def test_iceberg_write_read_idempotent(spark, tmp_path):
    from graphforge_spark.sinks import tables

    if not tables.iceberg_available(spark):
        pytest.skip("iceberg runtime classes fail to load despite jar glob")
    _catalog_conf(spark, tmp_path)
    triples = spark.createDataFrame(TRIPLE_ROWS, TRIPLE_SCHEMA)
    tables.write_triples_partition(triples, str(tmp_path), 4, table_format="iceberg")
    got = tables.read_triples(spark, str(tmp_path), table_format="iceberg")
    assert got.count() == len(TRIPLE_ROWS)
    # re-run = overwritePartitions → same rows, not doubled
    tables.write_triples_partition(triples, str(tmp_path), 4, table_format="iceberg")
    assert tables.read_triples(spark, str(tmp_path), table_format="iceberg").count() == len(
        TRIPLE_ROWS
    )


@needs_jar
def test_iceberg_merge_upsert(spark, tmp_path):
    from graphforge_spark.sinks import tables

    if not tables.iceberg_available(spark):
        pytest.skip("iceberg runtime classes fail to load despite jar glob")
    _catalog_conf(spark, tmp_path)
    base = spark.createDataFrame(
        [("extract", 0, 10), ("extract", 1, 20)], "stage string, part_id int, n int"
    )
    base.writeTo("forge.kg.ckpt").using("iceberg").create()
    updates = spark.createDataFrame(
        [("extract", 1, 25), ("extract", 2, 30)], "stage string, part_id int, n int"
    )
    tables.merge_upsert(spark, "forge.kg.ckpt", updates, ["stage", "part_id"])
    got = {
        (r.part_id): r.n for r in spark.read.table("forge.kg.ckpt").collect()
    }
    assert got == {0: 10, 1: 25, 2: 30}
    # merging the same batch again is a no-op (exactly-once effect)
    tables.merge_upsert(spark, "forge.kg.ckpt", updates, ["stage", "part_id"])
    assert spark.read.table("forge.kg.ckpt").count() == 3
