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

The storage layer is deliberately thin: parquet under a warehouse dir in
this sandbox; the same writer code works against an Iceberg catalog by
swapping ``.format("iceberg").saveAsTable(...)`` — the partition/bucket
strategy (bucket by conv_id for extraction locality, bucket triples by
subj for join locality) is the part that matters at 100 TB and is
documented per-writer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.functions.hashing import portable_bucket


def write_triples_partition(
    triples: DataFrame, warehouse: str, n_buckets: int, mode: str = "dynamic"
) -> None:
    """Write provenanced triples partitioned by part_id (bucket of the
    source conversation). Dynamic partition overwrite: only the partitions
    present in ``triples`` are replaced — per-partition idempotent resume.
    """
    out = triples.withColumn("part_id", portable_bucket(F.col("src_conv_id"), n_buckets))
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("part_id")
        .parquet(os.path.join(warehouse, "triples"))
    )


def read_triples(spark: SparkSession, warehouse: str) -> DataFrame:
    """Reference analog: loadQuadsToStore (docs/scripts/document.js:824-868)
    — read the materialized graph back; MVCC snapshot replaces 'clear store'."""
    return spark.read.parquet(os.path.join(warehouse, "triples"))


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
