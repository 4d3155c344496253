"""Pin the sf1 oracle-gate protocol adaptations (tools/check_oracle_sf1.py).

The sf1 run (COVERAGE.md r5) replaced simhash_neardup's brute-force
O(n^2) oracle with a pigeonhole-banded equi-join. The equivalence proof
is mathematical (hamming <= 6 over 7 disjoint bands forces a shared
band), but this test keeps it EXECUTABLE: both SQL forms run in DuckDB
over the real sf0.001 documents table and must produce the identical
pair set. Pure DuckDB — no SparkSession — so it stays cheap.
"""
from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tools.check_oracle_sf1 import _BANDS, simhash_banded_oracle_sql

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    c.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    return c


def test_bands_partition_the_60_bit_fingerprint():
    # Pigeonhole precondition: the 7 bands are disjoint and cover bits
    # 0..59 exactly — without this the banded join is NOT a superset of
    # the hamming-<=6 pair set and the oracle equivalence collapses.
    covered = []
    for off, width in _BANDS:
        covered.extend(range(off, off + width))
    assert sorted(covered) == list(range(60))
    assert len(_BANDS) == 7  # > max_hamming=6, the pigeonhole bound


def test_banded_oracle_equals_brute_force(con):
    brute = entrymod._simhash_pairs_sql(6)
    banded = simhash_banded_oracle_sql(6)
    a = con.sql(
        f"SELECT id_a, id_b, hamming FROM ({brute}) ORDER BY 1, 2"
    ).fetchall()
    # the banded form tags both schemes; one tag is the same pair set
    b = con.sql(
        f"SELECT id_a, id_b, hamming FROM ({banded}) "
        "WHERE scheme = 'band' ORDER BY 1, 2"
    ).fetchall()
    assert a == b and len(a) > 0
    # and the two scheme tags are identical copies
    n2 = con.sql(f"SELECT count(*) FROM ({banded})").fetchone()[0]
    assert n2 == 2 * len(a)


def test_semdedup_oracle_parameterizes_by_threshold(con):
    # The sf1 protocol reruns the registry oracle builder at 0.9; the
    # builder must actually thread the threshold through (a hard-coded
    # 0.3 inside would silently ignore the protocol change).
    hi = con.sql(entrymod._semdedup_sql(threshold=0.99, n_centroids=4)).df()
    lo = con.sql(entrymod._semdedup_sql(threshold=0.0, n_centroids=4)).df()
    assert len(hi) == len(lo)  # one row per vector either way
    # at 0.99 nothing connects (near-random vectors): everyone keeps;
    # at 0.0 every within-cell pair connects: most vectors drop
    assert hi["keep"].all()
    assert lo["keep"].sum() < len(lo)
