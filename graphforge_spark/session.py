"""SparkSession factory tuned for the KG-construction workload.

Settings chosen for scale (100 TB / 1000-executor design point), applied
equally in local mode:

- AQE on (runtime coalescing + skew-join splitting; hot-entity skew is a
  first-class concern per the alias/canonicalization stages),
- Arrow on (every Python-side operator is a vectorized pandas UDF; there are
  deliberately NO per-row Python UDFs anywhere in this package),
- shuffle partitions sized by caller (tests: small; bench: #cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "graphforge-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    iceberg_warehouse: str | None = None,
    iceberg_catalog: str = "forge",
) -> SparkSession:
    """``iceberg_warehouse`` wires an Iceberg hadoop catalog named
    ``iceberg_catalog`` at that path (plus the SQL extensions for MERGE
    INTO). Requires the iceberg-spark-runtime jar on the classpath — the
    conf is inert without it until a table op actually loads the classes,
    so callers gate on ``sinks.tables.iceberg_available``. Must be set at
    session CREATION (extensions don't apply to a live session)."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds Python-worker memory per extraction batch.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative fixpoint loops (transitive closure, connected components)
        # localCheckpoint every round; constraint propagation both slows
        # re-planning quadratically there and trips a LogicalRDD stats
        # rewrite bug ("key not found: x#N") on checkpoint-of-checkpoint
        # plans. Off is the standard setting for iterative Spark jobs.
        .config("spark.sql.constraintPropagation.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Throughput GC: G1 (the JDK17 default) costs this allocation-heavy
        # string workload ~30% per-core and collapses multi-core scaling
        # (measured: extraction scales 2.6x across 4x cores under G1,
        # 3.75x under ParallelGC). Batch jobs don't need G1's pause goals.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    if iceberg_warehouse is not None:
        builder = (
            builder.config(
                "spark.sql.extensions",
                "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
            )
            .config(
                f"spark.sql.catalog.{iceberg_catalog}",
                "org.apache.iceberg.spark.SparkCatalog",
            )
            .config(f"spark.sql.catalog.{iceberg_catalog}.type", "hadoop")
            .config(f"spark.sql.catalog.{iceberg_catalog}.warehouse", iceberg_warehouse)
        )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
