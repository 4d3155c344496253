"""DSIR-style data selection: hashed n-gram importance resampling.

Published method (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling", arXiv:2302.03169): fit two bag-of-hashed-
n-grams categorical models — one on a small TARGET corpus (the
distribution you want more of), one on the RAW corpus — and resample raw
documents with probability proportional to the importance weight
w(x) = p_target(x) / p_raw(x). It is the standard pretraining-data
selection recipe at the 100 TB scale this engine targets.

Spark-first shape (no Python in the hot path anywhere):

- featurization is one narrow projection: tokenize → n-gram arrays via
  higher-order functions → md5-portable bucket ids (``portable_bucket``,
  replicable in DuckDB/Python — the same portability contract as the
  sampling and fixture hashes);
- each model is ONE combinable shuffle (explode → groupBy(bucket).count);
  the fitted state is a ``dim``-sized (bucket, log_ratio) table — small
  enough to broadcast at the paper's dim=10⁴, degrades to a shuffle join
  at exotic dims (same story as ``docops.tfidf_vectors``'s df table);
- per-document log-weights are explode → broadcast join → one doc-keyed
  sum. Buckets unseen in BOTH corpora contribute a constant
  log((N_raw + a·dim)/(N_tgt + a·dim)) per occurrence (both smoothed
  probabilities fall back to a/(N + a·dim)), applied via coalesce — the
  model table stays sparse (seen buckets only);
- resampling without replacement uses the Gumbel-top-k trick with
  DETERMINISTIC hash-derived uniforms (a pure function of (seed, doc_id),
  like ``docops.stratified_sample``): stable under retries, speculative
  execution, and repartitioning — ``rand()`` is none of those. Top-k is
  a single TakeOrderedAndProject.

Reference analog: none — the reference forges graphs from documents but
never selects training data; this operator set is mandated by the build
brief's training-data-pipeline scope.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.corpus import spread_small_scan
from graphforge_spark.functions.hashing import portable_bucket
from graphforge_spark.functions.text import tokens

_GUMBEL_BUCKETS = 1 << 20


def _hashed_ngram_buckets(text_col, dim: int, ngram_n: int, salt: str):
    """array<int> of hashed n-gram bucket ids (orders 1..ngram_n) for one
    document — pure column algebra (tokenize, index-transform n-gram
    assembly, md5 bucket)."""
    toks = tokens(text_col)

    # F.transform introspects lambda ARITY (a second parameter means
    # "give me the index"), so the order must bind via closure, not a
    # defaulted second argument
    def _gram_at(n):
        return lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(1, n + 1)]
        )

    grams = [toks]
    for n in range(2, ngram_n + 1):
        grams.append(
            F.when(
                F.size(toks) >= n,
                F.transform(F.sequence(F.lit(0), F.size(toks) - n), _gram_at(n)),
            ).otherwise(F.array().cast("array<string>"))
        )
    all_grams = F.concat(*grams) if len(grams) > 1 else grams[0]
    return F.transform(
        all_grams,
        lambda g: portable_bucket(F.concat(F.lit(f"{salt}:"), g), dim),
    )


def ngram_bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 10_000,
    ngram_n: int = 2,
    salt: str = "dsir",
) -> DataFrame:
    """(bucket, cnt) hashed n-gram occurrence counts over a corpus.
    One narrow featurize + one combinable shuffle."""
    return (
        spread_small_scan(docs)
        .select(
            F.explode(
                _hashed_ngram_buckets(F.col(text_col), dim, ngram_n, salt)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_model(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    dim: int = 10_000,
    ngram_n: int = 2,
    smoothing: float = 1.0,
    salt: str = "dsir",
) -> dict:
    """Fit the importance model: per-bucket
    log_ratio = log p_target(bucket) − log p_raw(bucket) with Laplace
    smoothing ``a``: p(b) = (cnt_b + a) / (N + a·dim).

    Returns {"table": DataFrame(bucket, log_ratio), "default": float,
    "dim", "ngram_n", "salt"} — ``default`` is the log-ratio of a bucket
    unseen in both corpora (the coalesce fallback at scoring time), so
    the table carries only SEEN buckets and stays ≤ dim rows."""
    if smoothing <= 0:
        raise ValueError(f"dsir_model: smoothing must be > 0, got {smoothing}")
    t_counts = ngram_bucket_counts(target_docs, text_col, dim, ngram_n, salt)
    r_counts = ngram_bucket_counts(raw_docs, text_col, dim, ngram_n, salt)
    totals_t = t_counts.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n")).collect()[0].n
    totals_r = r_counts.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n")).collect()[0].n
    if totals_t == 0 or totals_r == 0:
        raise ValueError(
            "dsir_model: empty feature mass "
            f"(target={totals_t}, raw={totals_r}) — both corpora must "
            "contain at least one token"
        )
    a = float(smoothing)
    denom_t = float(totals_t) + a * dim
    denom_r = float(totals_r) + a * dim
    table = (
        t_counts.withColumnsRenamed({"cnt": "t_cnt"})
        .join(r_counts.withColumnsRenamed({"cnt": "r_cnt"}), "bucket", "outer")
        .select(
            "bucket",
            (
                F.log((F.coalesce("t_cnt", F.lit(0)) + a) / denom_t)
                - F.log((F.coalesce("r_cnt", F.lit(0)) + a) / denom_r)
            ).alias("log_ratio"),
        )
    )
    default = math.log(a / denom_t) - math.log(a / denom_r)
    return {
        "table": table,
        "default": default,
        "dim": dim,
        "ngram_n": ngram_n,
        "salt": salt,
        "smoothing": a,
    }


def dsir_log_weights(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, log_weight) per document: Σ over the doc's hashed n-grams of
    the model's per-bucket log-ratio. Documents with zero n-grams score
    0.0 (w = 1: the empty doc is exactly as likely under both models).

    Explode → join the (≤ dim)-row model table → one doc-keyed sum with
    map-side combine. The model side is broadcast when AQE sizes it
    small (always, at the paper's dim=10⁴)."""
    occs = spread_small_scan(docs).select(
        F.col(id_col).alias("_id"),
        F.explode_outer(
            _hashed_ngram_buckets(
                F.col(text_col), model["dim"], model["ngram_n"], model["salt"]
            )
        ).alias("bucket"),
    )
    per_doc = (
        occs.join(model["table"], "bucket", "left")
        .groupBy("_id")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("bucket").isNull(), F.lit(0.0)).otherwise(
                        F.coalesce(F.col("log_ratio"), F.lit(model["default"]))
                    )
                ),
                F.lit(0.0),
            ).alias("log_weight")
        )
    )
    return per_doc.select(F.col("_id").alias(id_col), "log_weight")


def dsir_resample(
    docs: DataFrame,
    model: dict,
    k: int,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Select ``k`` documents by importance resampling WITHOUT
    replacement: Gumbel-top-k over log_weight + Gumbel(0,1) noise, the
    standard equivalence (Vieira 2014) the DSIR paper uses.

    The Gumbel draw is a pure function of (seed, doc_id) — an md5-bucket
    uniform u ∈ (0,1), g = −log(−log u) — so the selected SET is
    deterministic across runs, retries, and partitionings, and a DuckDB
    or Python replay reproduces it exactly. Returns the selected rows
    with their ``log_weight`` (all original columns kept). One global
    top-k (TakeOrderedAndProject), no full sort."""
    if k <= 0:
        raise ValueError(f"dsir_resample: k must be positive, got {k}")
    w = dsir_log_weights(docs, model, id_col=id_col, text_col=text_col)
    u = (
        portable_bucket(
            F.concat(F.lit(f"dsir-gumbel-{seed}:"), F.col(id_col).cast("string")),
            _GUMBEL_BUCKETS,
        ).cast("double")
        + 0.5
    ) / float(_GUMBEL_BUCKETS)
    keyed = docs.join(w, id_col).withColumn(
        "_gumbel_key", F.col("log_weight") - F.log(-F.log(u))
    )
    return (
        keyed.orderBy(F.desc("_gumbel_key"), F.asc(id_col))
        .limit(k)
        .drop("_gumbel_key")
    )
