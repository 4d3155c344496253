"""Tabular-to-RDF direct mapping (operators/extract.extract_table) —
the "tabular" half of the north-star's tabular/JSON-to-RDF forge.
Verified by a typed golden frame, null/unsupported handling, and a
DuckDB UNPIVOT differential over a real testdata parquet table."""

from __future__ import annotations

import datetime

import duckdb
import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators.extract import extract_table

XSD = "http://www.w3.org/2001/XMLSchema#"
EX = "http://ex.org/row/"


def test_typed_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "alice", 41, 1.5, True, datetime.date(2026, 1, 2),
             datetime.datetime(2026, 1, 2, 3, 4, 5)),
            (2, None, None, None, None, None, None),
        ],
        "id int, name string, age int, score double, active boolean, "
        "d date, ts timestamp",
    )
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang, r.obj_dt)
        for r in extract_table(df, "id", EX, with_annotations=True).collect()
    }
    s1 = EX + "1"
    assert got == {
        (s1, EX + "p/name", "alice", True, None, None),
        (s1, EX + "p/age", "41", True, None, XSD + "integer"),
        (s1, EX + "p/score", "1.5", True, None, XSD + "double"),
        (s1, EX + "p/active", "true", True, None, XSD + "boolean"),
        (s1, EX + "p/d", "2026-01-02", True, None, XSD + "date"),
        (s1, EX + "p/ts", "2026-01-02T03:04:05", True, None, XSD + "dateTime"),
    }  # row 2's all-null cells emit NOTHING
    # annotation-free contract: same rows, no dt columns
    plain = extract_table(df, "id", EX)
    assert "obj_dt" not in plain.columns and plain.count() == 6
    # graph/provenance carry the subject
    r = extract_table(df, "id", EX).first()
    assert r.graph == r.src_conv_id == r.subj


def test_column_subset_and_predicate_base(spark):
    df = spark.createDataFrame([(7, "x", "y")], "k int, a string, b string")
    rows = extract_table(
        df, "k", EX, predicate_base="http://p/", columns=["b"]
    ).collect()
    assert [(r.pred, r.obj) for r in rows] == [("http://p/b", "y")]


def test_unsupported_type_and_bad_args_raise(spark):
    arr = spark.createDataFrame([(1, [1, 2])], "k int, v array<int>")
    with pytest.raises(ValueError, match="unsupported cell type"):
        extract_table(arr, "k", EX)
    df = spark.createDataFrame([(1, "x")], "k int, v string")
    with pytest.raises(ValueError, match="subject column"):
        extract_table(df, "nope", EX)
    with pytest.raises(ValueError, match="at least one data column"):
        extract_table(df.select("k"), "k", EX)
    with pytest.raises(ValueError, match="columns not in frame"):
        extract_table(df, "k", EX, columns=["ghost"])


def test_duckdb_unpivot_differential(spark):
    """The same direct mapping expressed as DuckDB SQL over the real
    region parquet must produce the identical triple set."""
    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(f"{sf}/region.parquet")
    got = {
        (r.subj, r.pred, r.obj, r.obj_dt)
        for r in extract_table(
            df, "r_regionkey", "http://tab/r/", with_annotations=True
        ).collect()
    }
    con = duckdb.connect()
    want = set()
    for key, name in con.execute(
        f"SELECT r_regionkey, r_name FROM read_parquet('{sf}/region.parquet')"
    ).fetchall():
        s = f"http://tab/r/{key}"
        if name is not None:
            want.add((s, "http://tab/r/p/r_name", name, None))
    assert got == want and len(want) > 0
