"""sf1 (100x driver scale) oracle-gate run for the TWO queries whose r4
protocol cannot execute unchanged at 50k docs / 20k vectors, with the
protocol changes recorded here (COVERAGE.md carries the summary; the
other 48 registry queries run UNCHANGED via tools/check_oracle.py).

1. simhash_neardup — the registry oracle is the literal brute-force
   O(n^2) join (1.25e9 pairs at sf1 x2 schemes: infeasible in DuckDB).
   Replaced by a PIGEONHOLE-BANDED equi-join that is provably the same
   result set: hamming(a,b) <= 6 and 7 disjoint bit-bands imply at
   least one band is bit-identical, so joining on any-band-equality and
   then applying the exact hamming filter loses nothing and the DISTINCT
   removes multiplicity. The fingerprint CTE is byte-identical to the
   registry oracle's; the band layout here (contiguous 9/9/9/9/8/8/8) is
   deliberately DIFFERENT from the engine's interleaved layout, so the
   oracle still does not replay engine internals. Cross-checked once
   against an independent numpy popcount brute force over the same
   fingerprints: both yield exactly 1,451,008 pairs at sf1.
   ENGINE-side protocol change: max_bucket=None (one sf1 band bucket
   reaches 12,500 > the 10,000 default counted-drop guard; the oracle is
   the exact pair set, so the guard must be lifted to compare equal —
   at production scale the guard stays on and its drops are counted by
   lsh_bucket_stats, not silent).

2. semdedup_keep — at sf1 the registry's threshold=0.3 is DEGENERATE:
   20k near-random vectors in 4 cells produce ~660k edges whose
   transitive closure is 4 giant ~5k components (sum |C|^2 ~ 1e8 rows —
   the WITH RECURSIVE oracle cannot materialize that, and a 4-cluster
   corpus-wide merge says nothing about dedup semantics either). The sf1
   protocol runs BOTH sides at threshold=0.9, which the measured sim
   distribution makes meaningful: replica near-dup pairs (the generator's
   deliberate 10-cliques) all have sim >= 0.99996 while every other
   within-cell pair is <= 0.602 — so the expected answer is exactly the
   2,000 replica cliques, and the scale-sensitive machinery (cell
   assignment over 20k vectors, ~50M within-cell candidate pairs, cap
   accounting, closure, keep='far' choice) is exercised at full volume.

Usage: python tools/check_oracle_sf1.py [sf_dir]   (default /tmp/sf1)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

import __spark_entry__ as entrymod
from tools.check_oracle import canon, duck_connection

from pyspark.sql import functions as F

from graphforge_spark import corpus
from graphforge_spark.operators import docops, similarity

# 7 disjoint contiguous bands over the 60-bit fingerprint (pigeonhole at
# max_hamming=6; distinct from the engine's simhash_band_layout).
_BANDS = [(0, 9), (9, 9), (18, 9), (27, 9), (36, 8), (44, 8), (52, 8)]


def simhash_banded_oracle_sql(max_hamming: int = 6) -> str:
    brute = entrymod._simhash_pairs_sql(max_hamming)
    # Reuse the registry oracle's CTEs verbatim (everything before the
    # final SELECT), swap only the O(n^2) pair enumeration.
    head = brute[: brute.index("SELECT a.doc_id")]
    band_union = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS band, "
        f"(simhash >> {o}) & {(1 << w) - 1} AS key FROM fp"
        for i, (o, w) in enumerate(_BANDS)
    )
    pairs = f"""
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
               CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
        FROM banded x JOIN banded y
          ON x.band = y.band AND x.key = y.key AND x.doc_id < y.doc_id
        WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
    """
    one = head + f", banded AS ({band_union}) " + pairs
    return (
        f"SELECT *, 'band' AS scheme FROM ({one}) "
        f"UNION ALL SELECT *, 'wide' AS scheme FROM ({one})"
    )


def q_simhash_uncapped(spark, sf_dir):
    docs = corpus.load(spark, sf_dir, "documents")
    band = docops.simhash_neardup_pairs(
        docs, max_hamming=6, max_bucket=None
    ).withColumn("scheme", F.lit("band"))
    wide = docops.simhash_neardup_pairs(
        docs, max_hamming=6, wide_blocks=8, max_bucket=None
    ).withColumn("scheme", F.lit("wide"))
    return band.unionByName(wide)


def q_semdedup_t09(spark, sf_dir):
    vecs = corpus.load(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r.embedding]
        for r in vecs.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()
    ]
    out = similarity.semdedup_keep_list(vecs, threshold=0.9, centroids=cents)
    return out.select("vec_id", "rep_id", "keep", "centroid_sim")


CASES = {
    "simhash_neardup[sf1 protocol]": (
        q_simhash_uncapped,
        simhash_banded_oracle_sql,
    ),
    "semdedup_keep[sf1 protocol]": (
        q_semdedup_t09,
        lambda: entrymod._semdedup_sql(threshold=0.9, n_centroids=4),
    ),
}


def main(sf_dir: str = "/tmp/sf1") -> int:
    from graphforge_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    con = duck_connection(sf_dir)
    bad = 0
    for name, (fn, sql_fn) in CASES.items():
        t0 = time.time()
        spark_pdf = fn(spark, sf_dir).toPandas()
        t1 = time.time()
        duck_pdf = con.sql(sql_fn()).df()
        t2 = time.time()
        a, b = canon(spark_pdf), canon(duck_pdf)
        ok = list(a.columns) == list(b.columns) and len(a) == len(b)
        if ok:
            try:
                pd.testing.assert_frame_equal(
                    a, b, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                print(f"  values differ: {str(e)[:400]}")
                ok = False
        print(
            f"{'ok  ' if ok else 'FAIL'} {name}: spark {len(a)} rows "
            f"({t1-t0:.1f}s), oracle {len(b)} rows ({t2-t1:.1f}s)"
        )
        bad += 0 if ok else 1
    return bad


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"))
