"""Local replica of the driver's correctness gate: run __spark_entry__
queries at a given sf dir, run each one's DuckDB oracle SQL over the same
parquet tables, and compare column names + row count + an
order-insensitive exact value comparison. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

Also importable (tests/test_entry_oracle.py): ``run_checks(sf_dir, names,
spark)`` returns a list of failure strings.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_checks(sf_dir: str, names=None, spark=None, verbose: bool = True) -> list[str]:
    import __spark_entry__ as entrymod

    if spark is None:
        from graphforge_spark.session import get_spark

        spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duck_connection(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []
    for name, fn in queries.items():
        if names and name not in names:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            if verbose:
                print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            if verbose:
                print(f"ok   {name}: rows-only, {len(spark_pdf)} rows "
                      f"({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            if verbose:
                print(f"FAIL {name}: duckdb error: {e}")
            continue
        a, b = canon(spark_pdf), canon(duck_pdf)
        status = []
        if list(a.columns) != list(b.columns):
            status.append(f"cols spark={list(a.columns)} duck={list(b.columns)}")
        if len(a) != len(b):
            status.append(f"rows spark={len(a)} duck={len(b)}")
        if not status:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            except AssertionError as e:
                status.append(f"values differ: {str(e)[:400]}")
        if status:
            failures.append(name)
            if verbose:
                print(f"FAIL {name}: {'; '.join(status)}")
                if not status[0].startswith("cols"):
                    diff = pd.concat([a, b]).drop_duplicates(keep=False)
                    print(diff.head(6).to_string())
        elif verbose:
            print(f"ok   {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    return failures


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    spark = None
    if "--vanilla" in sys.argv:
        # replicate the DRIVER's environment: a stock SparkSession with no
        # session.py tuning (the r1 constraint-propagation crash was only
        # visible under exactly this configuration)
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("check-oracle-vanilla")
            .getOrCreate()
        )
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    failures = run_checks(sf_dir, set(argv[1:]) or None, spark=spark)
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
