"""Salted-join correctness (vs plain join) and actual key splitting, plus
salted connected components equivalence."""

from pyspark.sql import functions as F

from graphforge_spark.functions.skew import salted_join
from graphforge_spark.operators.canonicalize import canonical_mapping


def _edges(spark):
    # hot hub: vertex h connects to 200 spokes; plus a few chains
    rows = [("h", f"s{i}") for i in range(200)] + [(f"c{i}", f"c{i+1}") for i in range(5)]
    return spark.createDataFrame(rows, "src string, dst string")


def test_salted_join_matches_plain_join(spark):
    skewed = spark.createDataFrame(
        [("k1", i) for i in range(300)] + [("k2", i) for i in range(3)],
        "k string, v int",
    )
    compact = spark.createDataFrame([("k1", "a"), ("k2", "b"), ("k3", "c")], "kk string, lab string")
    plain = {(r.k, r.v, r.lab) for r in
             skewed.join(compact, F.col("k") == F.col("kk")).collect()}
    salted = {(r.k, r.v, r.lab) for r in
              salted_join(skewed, compact, "k", "kk", salt=8).collect()}
    assert salted == plain
    # left join preserves unmatched rows
    lp = skewed.join(compact, F.col("k") == F.col("kk"), "left").count()
    ls = salted_join(skewed, compact, "k", "kk", salt=8, how="left").count()
    assert lp == ls


def test_salt_actually_splits_hot_key(spark):
    skewed = spark.createDataFrame([("k1", i) for i in range(500)], "k string, v int")
    salts = (
        skewed.select(F.pmod(F.xxhash64("k", "v"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key spreads over all salt buckets


def test_salted_cc_equals_unsalted(spark):
    edges = _edges(spark)
    plain = {(r.alias_id, r.canonical_id) for r in canonical_mapping(edges).collect()}
    salted = {(r.alias_id, r.canonical_id) for r in canonical_mapping(edges, salt=4).collect()}
    assert salted == plain
    # the hub cluster resolved to one component
    comp = {r.canonical_id for r in canonical_mapping(edges).collect()
            if r.alias_id.startswith("s") or r.alias_id == "h"}
    assert len(comp) == 1
