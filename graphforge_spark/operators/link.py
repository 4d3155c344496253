"""Entity linking: MinHash/LSH blocking + TF-IDF cosine scoring.

No reference analog beyond the trivial identity rule (startsWith('http'),
graphProcessor.js:222) and equivalence expansion (:265-282); this stage is
mandated by BASELINE.json north_star for alias resolution at transcript
scale.

Pipeline shape (all shuffles annotated):

1. surfaces → char-3-gram shingle arrays              (narrow, codegen)
2. MinHash signature, k columns of min(md5(seed||g))  (narrow, codegen —
   no explode: array_min(transform(...)))
3. LSH banding: b band keys per surface → explode     (narrow)
4. groupBy band key → candidate buckets               (shuffle #1)
   — buckets capped at ``max_bucket`` to defuse degenerate hot buckets
   (the stopword-shingle pathology); dropped buckets are counted, not
   silently ignored.
5. applyInPandas per bucket: pairwise TF-IDF cosine   (Arrow batch per
   bucket; vectorized numpy inside)
6. distinct (src,dst) pairs above threshold           (shuffle #2)

IDF is computed globally JVM-side (explode+groupBy, shuffle) and joined
into the buckets as a broadcast map when small.

Why this scales: candidate generation never computes the O(n²) cross
product — only within-bucket pairs; banding parameters (k=12, b=4, r=3)
put the S-curve threshold around Jaccard ≈ (1/b)^(1/r) ≈ 0.63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.functions.hashing import band_key, md5_minhash_cols
from graphforge_spark.functions.text import char_ngrams

NUM_HASHES = 12
NUM_BANDS = 4
ROWS_PER_BAND = 3


def surface_shingles(df: DataFrame, surface_col: str = "surface", n: int = 3) -> DataFrame:
    """Normalize + shingle mention surfaces: lowercase, strip punctuation,
    char n-grams over the padded string."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(surface_col)), r"[^\p{L}\p{N} ]", ""))
    padded = F.concat(F.lit(" "), norm, F.lit(" "))
    return df.withColumn("_shingles", F.array_distinct(char_ngrams(padded, n)))


def surface_banded(surfaces: DataFrame, surface_col: str = "surface") -> DataFrame:
    """(id, bucket) banded-LSH frame over distinct surfaces — the input
    both ``lsh_candidates`` (pair generation) and
    ``docops.lsh_bucket_stats`` (drop accounting) consume."""
    sh = surface_shingles(surfaces.select(surface_col).distinct(), surface_col)
    sig = sh.select(
        F.col(surface_col).alias("surface"),
        *md5_minhash_cols(F.col("_shingles"), NUM_HASHES),
    )
    mh_cols = [f"mh_{i}" for i in range(NUM_HASHES)]
    return sig.select(
        F.col("surface").alias("id"),
        F.explode(
            F.array(
                *[band_key(mh_cols, b, ROWS_PER_BAND).alias(f"bk{b}") for b in range(NUM_BANDS)]
            )
        ).alias("bucket"),
    )


def lsh_candidates(
    surfaces: DataFrame,
    surface_col: str = "surface",
    max_bucket: int = 200,
) -> DataFrame:
    """(surface_a, surface_b) candidate pairs sharing ≥1 LSH band bucket.

    Input: one row per distinct surface. Output: distinct unordered pairs
    (a < b). Buckets larger than ``max_bucket`` are dropped — counted,
    not silent: ``docops.lsh_bucket_stats(surface_banded(surfaces),
    max_bucket)`` reports each dropped bucket and its size (the pipeline
    surfaces the aggregate as a metrics row)."""
    from graphforge_spark.operators.docops import bucket_pairs

    # one shuffle: groupBy bucket + in-array pair expansion (includes the
    # max_bucket hot-bucket cap) — see docops.bucket_pairs
    return bucket_pairs(surface_banded(surfaces, surface_col), max_bucket).select(
        F.col("id_a").alias("surface_a"), F.col("id_b").alias("surface_b")
    )


def score_pairs_tfidf(
    pairs: DataFrame,
    surfaces: DataFrame,
    surface_col: str = "surface",
    ngram: int = 3,
    n_groups: int | None = None,
) -> DataFrame:
    """TF-IDF cosine similarity per candidate pair, computed inside
    applyInPandas groups (north_star requirement), vectorized with numpy.

    Grouping key: a deterministic bucket of the pair (so groups are
    bounded and parallel); each group receives the pair list plus both
    sides' shingle arrays (joined in beforehand, JVM-side), and the
    global IDF map rides in as two extra array columns.

    ``n_groups`` controls scoring-stage parallelism and defaults to
    4 × defaultParallelism — on a 1000-executor cluster the stage fans
    out with the cluster instead of capping at a constant task count.
    """
    sh = surface_shingles(surfaces.select(surface_col).distinct(), surface_col).select(
        F.col(surface_col).alias("s"), F.col("_shingles")
    )
    # corpus size as a lazy broadcast scalar — an eager .count() here would
    # run a full job at plan-construction time (a real cost at scale)
    n_docs = sh.agg(F.count("*").alias("_n"))
    df_counts = (
        sh.select(F.explode("_shingles").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(n_docs))
    )
    # attach idf to each shingle array: arrays of (gram, idf) structs
    sh_idf = (
        sh.select("s", F.explode("_shingles").alias("g"))
        .join(F.broadcast(df_counts), "g")
        .groupBy("s")
        .agg(
            F.collect_list("g").alias("grams"),
            F.collect_list(
                F.log((F.col("_n") + F.lit(1.0)) / (F.col("df") + 1.0)) + 1.0
            ).alias("idfs"),
        )
    )
    if n_groups is None:
        n_groups = max(64, pairs.sparkSession.sparkContext.defaultParallelism * 4)
    joined = (
        pairs.join(sh_idf.withColumnRenamed("s", "surface_a"), "surface_a")
        .withColumnRenamed("grams", "grams_a")
        .withColumnRenamed("idfs", "idfs_a")
        .join(sh_idf.withColumnRenamed("s", "surface_b"), "surface_b")
        .withColumnRenamed("grams", "grams_b")
        .withColumnRenamed("idfs", "idfs_b")
        .withColumn("_grp", F.pmod(F.xxhash64("surface_a", "surface_b"), F.lit(n_groups)))
    )

    def score(pdf):
        # Fully vectorized within the Arrow batch: flatten both sides'
        # (gram, idf) arrays into long frames keyed by pair index, take the
        # sparse dot via a merge on (pair, gram) + unbuffered np.add.at,
        # and the norms via the same scatter-add. No Python-per-pair loop.
        import numpy as np
        import pandas as pd

        k = len(pdf)
        out = pd.DataFrame({"surface_a": pdf["surface_a"], "surface_b": pdf["surface_b"]})
        if k == 0:
            out["score"] = pd.Series(dtype="float64")
            return out

        def _long(col_g, col_w):
            lens = pdf[col_g].str.len().to_numpy()
            if lens.sum() == 0:
                return pd.DataFrame(
                    {"i": np.array([], dtype="int64"),
                     "g": np.array([], dtype=object),
                     "w": np.array([], dtype="float64")}
                )
            return pd.DataFrame(
                {
                    "i": np.repeat(np.arange(k), lens),
                    "g": np.concatenate([np.asarray(x, dtype=object) for x in pdf[col_g]]),
                    "w": np.concatenate([np.asarray(x, dtype="float64") for x in pdf[col_w]]),
                }
            )

        a, b = _long("grams_a", "idfs_a"), _long("grams_b", "idfs_b")
        na2, nb2, dot = np.zeros(k), np.zeros(k), np.zeros(k)
        np.add.at(na2, a["i"].to_numpy(), a["w"].to_numpy() ** 2)
        np.add.at(nb2, b["i"].to_numpy(), b["w"].to_numpy() ** 2)
        m = a.merge(b, on=["i", "g"], suffixes=("_a", "_b"))
        np.add.at(dot, m["i"].to_numpy(), (m["w_a"].to_numpy() * m["w_b"].to_numpy()))
        denom = np.sqrt(na2) * np.sqrt(nb2)
        out["score"] = np.where(denom > 0, dot / np.where(denom > 0, denom, 1.0), 0.0)
        return out

    return joined.groupBy("_grp").applyInPandas(
        score, schema="surface_a string, surface_b string, score double"
    )


def link_entities(
    surfaces: DataFrame,
    surface_col: str = "surface",
    threshold: float = 0.60,
    max_bucket: int = 200,
) -> DataFrame:
    """End-to-end linking: surfaces → LSH candidates → TF-IDF cosine →
    thresholded alias edges (src, dst, score)."""
    pairs = lsh_candidates(surfaces, surface_col, max_bucket)
    scored = score_pairs_tfidf(pairs, surfaces, surface_col)
    return scored.filter(F.col("score") >= threshold).select(
        F.col("surface_a").alias("src"), F.col("surface_b").alias("dst"), "score"
    )
