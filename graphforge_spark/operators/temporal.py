"""Temporal joins Spark lacks natively — the event-stream enrichment
operators (trades ↔ quotes, clicks ↔ latest profile state) a transcript /
event pipeline needs at scale.

No reference analog (the reference is batch-on-click over a static store;
SURVEY §2C lists temporal joins as explicit nulls); these are first-class
per the build brief's custom-operator mandate ("as-of join, range join"),
implemented as compositions of built-in DataFrame ops — union + window —
NOT per-key Python.

``asof_join`` cost model at cluster scale: ONE shuffle of both inputs on
the key columns plus a window sort — the same plan family as
sessionization. The naive alternative (range theta-join then
max-per-left-row) explodes to |L|×|R| per key before aggregating; the
union-window form never materializes a pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row at or before
    its timestamp within the same key (left-join semantics: no prior
    right row → nulls).

    Mechanics: tag and union both sides, window per key ordered by
    ``(ts, side)`` with right rows sorting FIRST at equal timestamps (so
    a right row AT the left timestamp matches — DuckDB/pandas ``>=``
    asof semantics), carry the right payload forward with
    ``last(ignorenulls)``, keep left rows. Multiple right rows on the
    same (key, ts) reduce deterministically to the max-struct row before
    the window, so results are engine-independent.

    Output: every left column plus ``prefix + c`` for each right value
    column.
    """
    rc = right_value_cols or [
        c for c in right.columns if c not in (*key_cols, ts_col)
    ]
    # deterministic per-(key, ts) reduction of the right side
    r1 = right.groupBy(*key_cols, ts_col).agg(
        F.max(F.struct(*[F.col(c) for c in rc])).alias("_rv")
    )
    rv_type = r1.schema["_rv"].dataType

    l_struct = F.struct(*[left[c] for c in left.columns])
    lu = left.select(
        *[F.col(c) for c in key_cols],
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_is_right"),
        l_struct.alias("_l"),
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    l_type = lu.schema["_l"].dataType
    ru = r1.select(
        *[F.col(c) for c in key_cols],
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_is_right"),
        F.lit(None).cast(l_type).alias("_l"),
        F.col("_rv"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts").asc(), F.col("_is_right").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = lu.unionByName(ru).withColumn(
        "_rvf", F.last("_rv", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_right") == 0).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_rvf.{c}").alias(f"{prefix}{c}") for c in rc],
    )


def range_join_intervals(
    points: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Point-in-interval join: attach every interval containing the
    point's timestamp (inclusive bounds) within the same key.

    Plain equi-join on the keys with a range residual — Catalyst plans a
    shuffled join on the key columns and evaluates the range predicate as
    a post-join filter; AQE handles key skew. For the common
    non-overlapping-intervals case, prefer ``asof_join`` on the interval
    start (one window pass, no residual filter)."""
    p, i = points.alias("p"), intervals.alias("i")
    cond = F.col(f"p.{ts_col}").between(
        F.col(f"i.{start_col}"), F.col(f"i.{end_col}")
    )
    for k in key_cols:
        cond = (F.col(f"p.{k}") == F.col(f"i.{k}")) & cond
    return p.join(i, cond, "inner").select(
        *[F.col(f"p.{c}") for c in points.columns],
        *[F.col(f"i.{c}") for c in intervals.columns if c not in key_cols],
    )
