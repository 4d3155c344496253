"""Deterministic sf1 replica: 10× the driver's sf0.1 testdata, same
schema, for the next-decade oracle-gate run (r4 verdict #3).

The driver ships sf{0.001,0.01,0.1} read-only and its generator is not
in this repo, so sf1 is produced as a REPLICA PROTOCOL over sf0.1 —
deterministic, seed-free, fully described here:

- 10 copies (c = 0..9); copy 0 is the identity, so sf0.1 is a strict
  subset of sf1.
- every synthetic key shifts by c * 10_000_000 (all sf0.1 keys are
  < 150_000): customer.c_custkey, supplier.s_suppkey, part.p_partkey,
  orders.{o_orderkey,o_custkey}, lineitem.{l_orderkey,l_partkey,
  l_suppkey}, events.{event_id,user_id}, documents.doc_id,
  embeddings.vec_id. Foreign keys shift together, so join structure is
  preserved per copy and copies never cross-join.
- region and nation are fixed dimensions (TPC-H semantics: size does
  not scale them) — copied once, unchanged.
- customer.c_name / supplier.s_name REGENERATE from the shifted key
  ('Customer#' || lpad(key, 9, '0'), same for Supplier#): the driver's
  names are exact closed forms of the keys, and several oracles DERIVE
  entity IRIs from key arithmetic (e.g. cc_canonicalize's block-min
  'Customer_' || lpad((k // 5) * 5, 9, '0')) — a suffix scheme broke
  that invariant and 10×'d nothing for the graph path anyway (the
  free-text grammar's [A-Za-z0-9_] charset truncated '-r1' mentions).
  Regenerated names keep every name↔key closed form intact while
  minting distinct entities per copy. part.p_name (dictionary words,
  not key-derived) stays unchanged — oracles replay it verbatim.
- documents.text gains a trailing ' zrepl<c>' token (c > 0) and
  n_chars is recomputed: copies are NEAR-duplicates (J ≈ 0.99), not
  exact ones — deliberately adversarial for the LSH/SimHash caps
  (5 000-strong near-dup clusters) while keeping exact-dedup semantics
  identical to sf0.1 per copy.
- embeddings.embedding[0] += c * 1e-3 (other coords unchanged): breaks
  exact cosine TIES between copies (identical vectors would make every
  top-k boundary a coin flip for both engines) while keeping copies
  semantically near — adversarial for SemDeDup cell caps.
- timestamps, statuses, prices, labels, props: unchanged.

Usage: python tools/make_sf1.py [out_dir]     (default /tmp/sf1)
"""
from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000
COPIES = 10


def main(out_dir: str = "/tmp/sf1") -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE TABLE copies AS SELECT unnest(range({COPIES})) AS c")

    def emit(name: str, select: str, replicate: bool = True) -> None:
        src = f"'{SRC}/{name}.parquet'"
        if replicate:
            q = f"SELECT {select} FROM {src} t CROSS JOIN copies"
        else:
            q = f"SELECT * FROM {src} t"
        con.sql(f"COPY ({q}) TO '{out_dir}/{name}.parquet' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{name}.parquet'").fetchone()[0]
        print(f"{name}: {n} rows")

    emit("region", "*", replicate=False)
    emit("nation", "*", replicate=False)
    emit(
        "customer",
        f"c_custkey + c*{OFF} AS c_custkey, "
        f"'Customer#' || lpad(CAST(c_custkey + c*{OFF} AS VARCHAR), 9, '0') AS c_name, "
        "c_nationkey, c_acctbal, c_mktsegment",
    )
    emit(
        "supplier",
        f"s_suppkey + c*{OFF} AS s_suppkey, "
        f"'Supplier#' || lpad(CAST(s_suppkey + c*{OFF} AS VARCHAR), 9, '0') AS s_name, "
        "s_nationkey, s_acctbal",
    )
    emit(
        "part",
        f"p_partkey + c*{OFF} AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice",
    )
    emit(
        "orders",
        f"o_orderkey + c*{OFF} AS o_orderkey, o_custkey + c*{OFF} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
    )
    emit(
        "lineitem",
        f"l_orderkey + c*{OFF} AS l_orderkey, l_partkey + c*{OFF} AS l_partkey, "
        f"l_suppkey + c*{OFF} AS l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate",
    )
    emit(
        "events",
        f"event_id + c*{OFF} AS event_id, ts, user_id + c*{OFF} AS user_id, "
        "event_type, value, props",
    )
    doc_text = "text || (CASE WHEN c = 0 THEN '' ELSE ' zrepl' || c END)"
    emit(
        "documents",
        f"doc_id + c*{OFF} AS doc_id, {doc_text} AS text, lang, source, "
        f"length({doc_text}) AS n_chars",
    )
    emit(
        "embeddings",
        f"vec_id + c*{OFF} AS vec_id, "
        "list_prepend(embedding[1] + c * 0.001, embedding[2:]) AS embedding, "
        "label",
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
