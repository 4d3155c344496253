"""Graph diff: set semantics, null-safe keys, warehouse glue — verified
against a pure-Python set diff on curated and random inputs."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphforge_spark.operators.diff import graph_diff

SCHEMA = (
    "subj string, pred string, obj string, obj_is_literal boolean, graph string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_diff_curated(spark):
    old = _df(spark, [
        ("a", "p", "x", False, "g1"),
        ("a", "p", "lit", True, None),      # null graph key
        ("b", "p", "y", False, "g1"),
        ("b", "p", "y", False, "g1"),        # duplicate — set semantics
    ])
    new = _df(spark, [
        ("a", "p", "x", False, "g1"),        # unchanged
        ("a", "p", "lit", True, None),       # unchanged despite NULL key
        ("c", "p", "z", False, "g2"),        # added
    ])
    got = {
        (r.subj, r.change) for r in graph_diff(old, new).collect()
    }
    assert got == {("b", "removed"), ("c", "added")}


def test_diff_multiplicity_is_not_change(spark):
    old = _df(spark, [("a", "p", "x", False, None)] * 3)
    new = _df(spark, [("a", "p", "x", False, None)])
    assert graph_diff(old, new).count() == 0


def test_diff_missing_key_raises(spark):
    old = _df(spark, [])
    with pytest.raises(ValueError, match="absent"):
        graph_diff(old, old.drop("graph"))


_row = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.sampled_from(["p", "q"]),
    st.sampled_from(["x", "y", "z"]),
    st.booleans(),
    st.one_of(st.none(), st.sampled_from(["g1", "g2"])),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(old=st.lists(_row, max_size=12), new=st.lists(_row, max_size=12))
def test_diff_matches_python_set_diff(spark, old, new):
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.graph, r.change)
        for r in graph_diff(_df(spark, old), _df(spark, new)).collect()
    }
    so, sn = set(old), set(new)
    want = {t + ("added",) for t in sn - so} | {t + ("removed",) for t in so - sn}
    assert got == want


def test_diff_warehouses_after_update(spark, tmp_path):
    import shutil

    from graphforge_spark.fixtures import gen_transcripts
    from graphforge_spark.operators.diff import diff_warehouses
    from graphforge_spark.pipeline import apply_update, forge

    wh = str(tmp_path / "live")
    snap = str(tmp_path / "snap")
    corpus = gen_transcripts(seed=3, n_convs=4, turns_per_conv=3).transcripts_df(spark)
    forge(spark, corpus, wh, n_buckets=4, do_link=False, export_nt=False)
    shutil.copytree(wh, snap)
    apply_update(
        spark, wh,
        'INSERT DATA { <http://ex.org/new> <http://ex.org/p> "v" }',
        n_buckets=4,
    )
    d = diff_warehouses(spark, snap, wh).collect()
    assert len(d) == 1 and d[0].change == "added" and d[0].subj == "http://ex.org/new"
