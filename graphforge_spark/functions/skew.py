"""Explicit key-salting for skewed joins.

AQE's skew-join split (on in session.py) handles most runtime skew, but it
only splits partitions of a sort-merge join after a shuffle has already
moved the hot key's rows. For the pathological single-hot-key case — one
canonical entity referenced by a large fraction of all alias edges at
10^12-turn scale (BASELINE.json north_star) — pre-salting bounds the
largest task deterministically:

- the SKEWED side gets a deterministic per-row salt in [0, salt);
- the COMPACT side (few rows per key — e.g. one label row per vertex) is
  replicated across all salt values;
- the join key becomes (key, salt), splitting each hot key into ``salt``
  independent tasks.

Cost: compact side × salt replication — choose salt ≈ (hot-key rows /
target task rows), keep the compact side genuinely compact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    compact: DataFrame,
    skewed_key: str,
    compact_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``skewed`` (hot keys, many rows per key) with ``compact`` (few
    rows per key) on equality of the given keys, splitting every key into
    ``salt`` sub-keys. Output columns = skewed's ∪ compact's (minus the
    salt bookkeeping), same as a plain equi-join."""
    if salt <= 1:
        return skewed.join(compact, F.col(skewed_key) == F.col(compact_key), how)
    s = skewed.withColumn(
        "_salt_l", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    )
    c = compact.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt_r")
    )
    return (
        s.join(
            c,
            (F.col(skewed_key) == F.col(compact_key)) & (F.col("_salt_l") == F.col("_salt_r")),
            how,
        )
        .drop("_salt_l", "_salt_r")
    )
