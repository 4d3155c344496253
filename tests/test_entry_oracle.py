"""Replicates the driver's correctness gate locally: each
__spark_entry__ query is executed at sf0.001 and compared against its
DuckDB oracle SQL (column names + row count + exact order-insensitive
values). A fast representative subset keeps the suite quick; the full
sweep runs via ``python tools/check_oracle.py /root/testdata/sf0.01``."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

from check_oracle import run_checks  # noqa: E402

SF = "/root/testdata/sf0.001"

SUBSET = [
    "extract_patterns",
    "dedup_triples",
    "extract_ntriples",
    "extract_rdfxml",
    "bgp_join",
    "path_closure",
    "window_turn_order",
    "cc_canonicalize",
    "doc_minhash",
    "doc_stats",
    "ann_cosine_topk",
    # round-2 additions: recall-proving simhash oracle, SPARQL FILTER
    # compilation, deterministic sampling
    "simhash_neardup",
    "sparql_filter_distinct",
    "doc_sample",
    # round-3 additions: wide-key simhash (same brute-force oracle),
    # BIND/EXISTS surface, multiprobe ANN
    "simhash_neardup_wide",
    "sparql_bind_exists",
    "ann_lsh_topk",
    # late-r3: recursive path algebra — closure of a parenthesized
    # sequence group inside a UNION arm
    "sparql_path_seq",
]


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not present")
def test_entry_queries_match_duckdb_oracles(spark):
    failures = run_checks(SF, names=set(SUBSET), spark=spark)
    assert not failures, f"oracle mismatches: {failures}"


@pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata not present")
def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"pred", "n"} <= set(df.columns)
