"""Plot-prep guard parity with the reference's preparePlotData
(docs/scripts/queryManager.js:7-58)."""

from graphforge_spark.plans.plot import prepare_plot_data


def test_two_numeric_columns_pass(spark):
    df = spark.createDataFrame([("a", 3), ("b", 5)], "x string, n long")
    out = prepare_plot_data(df)
    assert {(r.x, r.y) for r in out.collect()} == {("a", 3.0), ("b", 5.0)}


def test_wrong_column_count_skips(spark):
    df = spark.createDataFrame([("a", 1, 2)], "x string, y long, z long")
    assert prepare_plot_data(df) is None
    assert prepare_plot_data(df.select("x")) is None


def test_parsefloat_coercion(spark):
    df = spark.createDataFrame(
        [("a", "3.5"), ("b", "12px"), ("c", "not a number"), ("d", "-2e1")],
        "x string, y string",
    )
    out = {(r.x, r.y) for r in prepare_plot_data(df).collect()}
    # parseFloat('12px') → 12.0; 'not a number' dropped
    assert out == {("a", 3.5), ("b", 12.0), ("d", -20.0)}
