"""Plot-dataset preparation guard (reference: preparePlotData,
docs/scripts/queryManager.js:7-58).

The reference renders a bar chart only when the query result has exactly
two columns and the second parses as a number (2-col check :20-23,
parseFloat coercion :30-42); otherwise it silently skips the plot. The
chart rendering itself (renderPlotlyGraph, :66-82) is out of engine
scope — this helper reproduces the *contract*: validate the result
shape, coerce y to double, drop unparseable rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def prepare_plot_data(result: DataFrame) -> DataFrame | None:
    """Return (x string, y double) rows, or None when the result is not
    plottable (the reference's silent skip). Numeric-typed y columns pass
    through; string y columns are parseFloat-coerced with non-numeric
    rows dropped (parseFloat semantics: leading numeric prefix counts)."""
    if len(result.columns) != 2:
        return None
    x_col, y_col = result.columns
    y_type = result.schema[y_col].dataType
    if isinstance(y_type, T.NumericType):
        y = F.col(y_col).cast("double")
    elif isinstance(y_type, (T.StringType,)):
        # parseFloat: longest numeric prefix, else NaN → dropped (try_cast:
        # ANSI mode would raise on the empty no-match extraction)
        y = F.regexp_extract(
            F.col(y_col), r"^\s*(-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)", 1
        ).try_cast("double")
    else:
        return None
    return (
        result.select(F.col(x_col).cast("string").alias("x"), y.alias("y"))
        .filter(F.col("y").isNotNull())
    )
