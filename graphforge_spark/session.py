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

import contextlib
import os
import threading

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


# ---------------------------------------------------------------------------
# fixpoint shuffle sizing
# ---------------------------------------------------------------------------

_FIXPOINT_LOCK = threading.Lock()
# id(session) -> [enter_count, original_conf_or_None]
_FIXPOINT_STATE: dict = {}


@contextlib.contextmanager
def fixpoint_shuffle(spark: SparkSession):
    """Size the shuffle for an ITERATIVE fixpoint loop (transitive
    closure, connected components, PageRank/BFS rounds, entailment
    doubling): every round is a full barrier, so per-round task DISPATCH
    cost scales with partition-count x rounds, and the session default
    (4 tasks/core, straggler amortization for one-shot stages) is the
    wrong trade — measured 4.8 s → 3.0 s on the 20k-node closure leg at
    local[32]. Inside the context, ``spark.sql.shuffle.partitions`` is
    lowered to ``defaultParallelism`` (tasks ≈ cores — the classic
    iterative-job sizing; on a 1000-executor cluster that is the total
    core count). Never RAISES the setting; restores the caller's value
    when the outermost context exits. Re-entrant and safe under
    concurrent fixpoints on one session (refcounted — the conf is
    session-global, so a mid-loop restore by a sibling loop would
    otherwise clobber it). A concurrent NON-fixpoint query planned while
    a fixpoint runs briefly plans with the lowered value — a perf-only,
    never-correctness effect, same contract as the constraint-
    propagation toggle in operators.closure."""
    key = "spark.sql.shuffle.partitions"
    target = spark.sparkContext.defaultParallelism
    sid = id(spark)
    with _FIXPOINT_LOCK:
        st = _FIXPOINT_STATE.get(sid)
        if st is not None:
            st[0] += 1
        else:
            try:
                cur = int(spark.conf.get(key))
            except (TypeError, ValueError):
                cur = None
            if cur is not None and cur > target:
                spark.conf.set(key, str(target))
                _FIXPOINT_STATE[sid] = [1, cur]
            else:
                _FIXPOINT_STATE[sid] = [1, None]
    try:
        yield
    finally:
        with _FIXPOINT_LOCK:
            st = _FIXPOINT_STATE[sid]
            st[0] -= 1
            if st[0] == 0:
                del _FIXPOINT_STATE[sid]
                if st[1] is not None:
                    spark.conf.set(key, str(st[1]))
