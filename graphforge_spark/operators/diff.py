"""Graph diff — set-semantic comparison of two triple stores.

The reference rebuilds quads.nq wholesale and has no way to ASK what a
rebuild changed (the freshness gate, graphProcessor.js:36-50, decides
WHETHER to rebuild, never WHAT differed). At warehouse scale the
question is operational: what did this re-extraction / update / entail
toggle actually do to the graph? ``graph_diff`` answers it as two
null-safe anti-joins — one shuffle each, set semantics like the store.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_KEYS = ("subj", "pred", "obj", "obj_is_literal", "graph")


def graph_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...] = DEFAULT_KEYS,
) -> DataFrame:
    """Rows that changed between two stores → the key columns plus
    ``change`` ∈ {'added', 'removed'}. Set semantics: each side is
    deduplicated on the keys first (the store's own invariant), so a
    multiplicity change alone is NOT a difference — exactly N3.Store
    equality. NULL-valued keys (default-graph rows, annotation-free
    literals) compare equal via null-safe joins, not never-equal.

    Scale: two left_anti joins on the same key set — Catalyst plans one
    shuffle per side; at 100 TB both sides hash-partition on the full
    key and the anti-join streams."""
    missing = [k for k in keys if k not in old.columns or k not in new.columns]
    if missing:
        raise ValueError(f"diff keys absent from a side: {missing}")
    o = old.select(*keys).dropDuplicates(list(keys))
    n = new.select(*keys).dropDuplicates(list(keys))
    def cond(a: str, b: str):
        return reduce(
            lambda x, y: x & y,
            (F.col(f"{a}.{k}").eqNullSafe(F.col(f"{b}.{k}")) for k in keys),
        )

    added = n.alias("n").join(o.alias("o"), cond("n", "o"), "left_anti")
    removed = o.alias("o").join(n.alias("n"), cond("o", "n"), "left_anti")
    return added.withColumn("change", F.lit("added")).unionByName(
        removed.withColumn("change", F.lit("removed"))
    )


def diff_warehouses(
    spark: SparkSession, warehouse_old: str, warehouse_new: str
) -> DataFrame:
    """Diff the materialized triples tables of two warehouses (e.g. a
    snapshot copy taken before an ``apply_update`` against the live
    one). Annotation columns are included in the key when BOTH sides
    carry them (a distinct annotation is a distinct quad, per RDF)."""
    from graphforge_spark.sinks.tables import read_triples

    old = read_triples(spark, warehouse_old).drop("part_id")
    new = read_triples(spark, warehouse_new).drop("part_id")
    keys = list(DEFAULT_KEYS)
    for c in ("obj_lang", "obj_dt"):
        if c in old.columns and c in new.columns:
            keys.append(c)
    return graph_diff(old, new, tuple(keys))
