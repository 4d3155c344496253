"""Temporal joins: as-of (backward, inclusive, left semantics,
deterministic tie handling) and point-in-interval range join."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators.temporal import asof_join, range_join_intervals

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts(10)),
            (2, "u1", ts(20)),
            (3, "u1", ts(5)),   # before any right row
            (4, "u2", ts(10)),  # key with no right rows at all
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", ts(8), 100, 1.5),
            ("u1", ts(20), 200, 2.5),   # same instant as left id=2 → matches
            ("u1", ts(20), 201, 3.5),   # same (key, ts): max event_id wins
        ],
        "user_id string, ts timestamp, event_id long, value double",
    )
    return left, right


def test_asof_backward_inclusive_left(spark, frames):
    left, right = frames
    out = {
        r.event_id: r
        for r in asof_join(left, right, ["user_id"], "ts", ["event_id", "value"]).collect()
    }
    assert len(out) == 4  # every left row survives (left semantics)
    assert out[1].asof_event_id == 100  # latest at-or-before ts(10) is ts(8)
    assert out[2].asof_event_id == 201  # same-instant row matches; max id wins the tie
    assert out[2].asof_value == 3.5
    assert out[3].asof_event_id is None  # nothing before ts(5)
    assert out[4].asof_event_id is None  # key with no right rows


def test_asof_preserves_left_columns(spark, frames):
    left, right = frames
    cols = asof_join(left, right, ["user_id"], "ts", ["value"]).columns
    assert cols == ["event_id", "user_id", "ts", "asof_value"]


def test_range_join_intervals(spark):
    points = spark.createDataFrame(
        [(1, "u1", ts(5)), (2, "u1", ts(15)), (3, "u2", ts(5))],
        "event_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u1", ts(0), ts(10), "early"), ("u1", ts(10), ts(20), "late")],
        "user_id string, start timestamp, end timestamp, label string",
    )
    out = {(r.event_id, r.label) for r in
           range_join_intervals(points, intervals, ["user_id"]).collect()}
    assert out == {(1, "early"), (2, "late")}  # u2 point matches nothing
    # inclusive bounds: a point at the boundary joins both intervals
    boundary = spark.createDataFrame(
        [(9, "u1", ts(10))], "event_id long, user_id string, ts timestamp"
    )
    labels = {r.label for r in
              range_join_intervals(boundary, intervals, ["user_id"]).collect()}
    assert labels == {"early", "late"}
