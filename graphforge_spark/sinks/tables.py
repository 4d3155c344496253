"""Table materialization — the system of record for the forged graph.

Reference analog: quads.nq, one materialized file per project, truncated
and rewritten on rebuild (docs/scripts/graphProcessor.js:52-113). Here the
graph lands in partitioned columnar tables with snapshot-style overwrite
per partition:

- ``triples``  — (subj, pred, obj, obj_is_literal, graph, provenance),
  partitioned by ``part_id`` = bucket(conv_id): extraction output for a
  transcript bucket overwrites exactly its own partition (dynamic
  partition overwrite), which is what makes re-runs idempotent.
- ``nodes`` / ``edges`` — the property-graph projection (distinct terms /
  IRI→IRI triples).

Two storage branches share every writer:

- ``table_format="parquet"`` (the sandbox default — this container ships
  no Iceberg jar): partitioned parquet under a warehouse dir with
  dynamic partition overwrite.
- ``table_format="iceberg"``: the BASELINE.json target. Same partition
  strategy via DataFrameWriterV2 (``writeTo(...).partitionedBy(...)``),
  per-partition idempotent resume via ``overwritePartitions()``, and a
  real MERGE INTO path (``merge_upsert``) for exactly-once checkpoint
  upserts. Requires a session built with
  ``get_spark(iceberg_warehouse=...)`` and the iceberg-spark-runtime jar
  — gate with ``iceberg_available(spark)``; the test suite exercises the
  branch when the jar is present and skips with a reason otherwise.

The partition/bucket strategy (bucket by conv_id for extraction locality,
bucket triples by subj for join locality) is the part that matters at
100 TB and is documented per-writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.functions.hashing import portable_bucket


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime classes are on the JVM
    classpath (the catalog conf alone proves nothing — class load is
    lazy until the first table operation)."""
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def _iceberg_table(catalog: str, name: str) -> str:
    return f"{catalog}.kg.{name}"


def write_triples_partition(
    triples: DataFrame,
    warehouse: str,
    n_buckets: int,
    mode: str = "dynamic",
    table_format: str = "parquet",
    catalog: str = "forge",
) -> None:
    """Write provenanced triples partitioned by part_id (bucket of the
    source conversation). Only the partitions present in ``triples`` are
    replaced — per-partition idempotent resume. parquet: dynamic
    partition overwrite; iceberg: ``overwritePartitions()`` (same
    semantics, snapshot-isolated)."""
    out = triples.withColumn("part_id", portable_bucket(F.col("src_conv_id"), n_buckets))
    # Sorted file layout: a LOCAL sort (no shuffle) ordered (part_id,
    # pred, subj) before the write. part_id leads so the partitioned
    # writer's required ordering is already satisfied (otherwise
    # FileFormatWriter re-sorts by partition columns and destroys the
    # layout); within each file, (pred, subj) runs give parquet
    # dictionary/RLE pages their best case and make the per-row-group
    # min/max stats selective for the engine's dominant scan shape —
    # `filter(pred == …)` (B2 pattern lookup) prunes row groups instead
    # of reading them. At 100 TB this is the difference between a
    # predicate scan touching ~1/|preds| of the bytes and all of them.
    out = out.sortWithinPartitions("part_id", "pred", "subj")
    if table_format == "iceberg":
        spark = triples.sparkSession
        tbl = _iceberg_table(catalog, "triples")
        if spark.catalog.tableExists(tbl):
            out.writeTo(tbl).overwritePartitions()
        else:
            out.writeTo(tbl).using("iceberg").partitionedBy(F.col("part_id")).create()
        return
    # Bloom filters on the two point-lookup columns. The sorted layout
    # above makes PRED row-group stats selective, but a subject/object
    # constant pattern (B2: `<s> ?p ?o`) scans files where subj ranges
    # overlap across every pred run — min/max can't prune those; blooms
    # can (Spark's parquet reader consults them under filterPushdown).
    # Adaptive sizing (parquet-mr 1.16) right-sizes each filter to the
    # row group's observed NDV, and parquet-mr skips the bloom entirely
    # for columns a dictionary page already covers exactly — so the
    # option costs ~0 on low-cardinality buckets and ~1% file bytes on
    # high-cardinality ones (measured in BENCH/STRESS.md).
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("parquet.bloom.filter.enabled#subj", "true")
        .option("parquet.bloom.filter.enabled#obj", "true")
        .option("parquet.bloom.filter.adaptive.enabled", "true")
        .partitionBy("part_id")
        .parquet(os.path.join(warehouse, "triples"))
    )


def read_triples(
    spark: SparkSession,
    warehouse: str,
    table_format: str = "parquet",
    catalog: str = "forge",
) -> DataFrame:
    """Reference analog: loadQuadsToStore (docs/scripts/document.js:824-868)
    — read the materialized graph back; MVCC snapshot replaces 'clear store'."""
    if table_format == "iceberg":
        return spark.read.table(_iceberg_table(catalog, "triples"))
    # mergeSchema: a warehouse can mix pre-annotation 7-column partitions
    # with 9-column ones (old buckets checkpointed, new buckets landed
    # after the upgrade); without merging, whichever file footer wins the
    # schema inference would silently drop the new columns for ALL rows
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(os.path.join(warehouse, "triples"))
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Materialize as a BUCKETED catalog table: rows hash-clustered and
    sorted by ``bucket_col`` into ``n_buckets`` files per partition.

    This is the co-located-join strategy at 100 TB: two tables bucketed
    the same way (same column, same bucket count) join with ZERO exchange
    — no shuffle of either side, ever — because Spark's bucketing
    metadata proves both sides are already hash-partitioned on the key.
    For the forged graph that means edges bucketed by ``src`` joined to
    nodes bucketed by ``id`` (the hot traversal join) touch only local
    files. The price is paid once at write time (the bucketBy write
    shuffles) and amortizes over every subsequent join; sortBy within
    buckets additionally enables merge-join without a sort.

    Bucketed tables require the session catalog (``saveAsTable``) —
    path-only parquet cannot carry bucketing metadata."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )


def merge_upsert(
    spark: SparkSession,
    target_table: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """Exactly-once upsert via Iceberg MERGE INTO: rows matching on
    ``key_cols`` are replaced, new rows inserted — re-running the same
    batch is a no-op instead of an append-duplicate. Iceberg-only (MERGE
    needs the Iceberg SQL extensions; plain parquet tables cannot).

    The source view name is unique per call: two concurrent merges on one
    SparkSession must not overwrite or drop each other's view mid-MERGE."""
    import uuid as _uuid

    view = f"_merge_src_{_uuid.uuid4().hex}"
    updates.createOrReplaceTempView(view)
    try:
        spark.sql(_merge_sql(target_table, view, key_cols))
    finally:
        spark.catalog.dropTempView(view)


def _merge_sql(target_table: str, view: str, key_cols: list[str]) -> str:
    """The MERGE INTO statement ``merge_upsert`` executes — split out so
    the jar-less sandbox can golden-test the emitted SQL even though the
    statement itself only runs where iceberg-spark-runtime ships
    (BENCH/ICEBERG.md)."""
    on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    return (
        f"MERGE INTO {target_table} t USING {view} s ON {on} "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )


def write_nodes_edges(triples: DataFrame, warehouse: str) -> None:
    """Property-graph projection.

    nodes: every distinct term with a kind tag (iri/blank/literal);
    edges: triples whose object is a term (IRI or blank), i.e. the graph
    structure without literal attributes.
    """
    subj_nodes = triples.select(F.col("subj").alias("id"))
    obj_nodes = triples.filter(~F.col("obj_is_literal")).select(F.col("obj").alias("id"))
    nodes = (
        subj_nodes.union(obj_nodes)
        .distinct()
        .select(
            "id",
            F.when(F.col("id").startswith("_:"), "blank").otherwise("iri").alias("kind"),
        )
    )
    edges = triples.filter(~F.col("obj_is_literal")).select(
        F.col("subj").alias("src"), F.col("pred").alias("rel"), F.col("obj").alias("dst")
    )
    nodes.write.mode("overwrite").parquet(os.path.join(warehouse, "nodes"))
    edges.write.mode("overwrite").parquet(os.path.join(warehouse, "edges"))
