"""Trainable document classification — distributed multinomial Naive
Bayes in pure DataFrame algebra.

The curation heuristics in functions/text.py (stopword ratios, length
gates) score documents with FIXED rules; a real 100 TB curation run
also trains lightweight classifiers on labeled samples (quality, domain,
language) and applies them corpus-wide — the fastText-style quality
filter of the CCNet/LLaMA pipelines. Multinomial NB is the
closed-form member of that family: training is ONE counting pass, so it
needs no gradient loop, no parameter server, and no Python — both fit
and predict stay inside whole-stage codegen and scale as two shuffles
end-to-end.

Shapes at scale:
- fit: explode(tokens) → groupBy(label, token) count (map-side combine;
  the output is vocab×labels rows — MODEL-sized, tiny vs the corpus) →
  per-label totals by a second combinable groupBy over the model rows.
- predict: explode(tokens) → broadcast join against the token→per-label
  log-likelihood map (the model is the classic small dimension) →
  groupBy(doc, label) sum → max_by. The corpus is touched once, never
  shuffled on anything wider than (doc_id, label).

Laplace (add-one) smoothing throughout; unseen tokens score
log(1/(label_tokens + V)) per label, so every document gets a defined
posterior. Scores are log-joint (prior + Σ log-likelihood), monotone in
the posterior — enough for argmax and thresholding.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.functions.text import tokens


class NBModel(NamedTuple):
    """Multinomial-NB model as two small DataFrames.

    ``vocab``: (token, label, logp) — smoothed per-class token
    log-likelihoods, vocab×labels rows.
    ``labels``: (label, prior_logp, unseen_logp) — class log-priors and
    the smoothed log-likelihood an out-of-vocabulary token contributes.
    """

    vocab: DataFrame
    labels: DataFrame


def nb_train(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> NBModel:
    """Fit multinomial Naive Bayes with add-one smoothing.

    One explode + two combinable aggregations over the corpus, plus a
    count() for the priors (two corpus scans total; the vocab-size
    count is an action over MODEL-sized rows). Deterministic: counts
    and closed-form logs only."""
    toks = docs.select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("label", "token").agg(F.count("*").alias("_c"))
    # |V|: distinct tokens across the corpus (the smoothing denominator)
    v_size = counts.select("token").distinct().count()
    totals = counts.groupBy("label").agg(F.sum("_c").alias("_tot"))
    vocab = (
        counts.join(totals, "label")
        .select(
            "token",
            "label",
            F.log((F.col("_c") + 1) / (F.col("_tot") + F.lit(v_size))).alias("logp"),
        )
    )
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("nb_train needs a non-empty labeled corpus")
    labels = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count("*").alias("_n"))
        .join(totals, "label", "left")
        .select(
            "label",
            F.log(F.col("_n") / F.lit(n_docs)).alias("prior_logp"),
            # max(...,1): an all-empty training corpus has V=0 and zero
            # token totals — the model degrades to priors-only (unseen
            # tokens contribute log 1 = 0) instead of dividing by zero
            F.log(
                1
                / F.greatest(
                    F.coalesce(F.col("_tot"), F.lit(0)) + F.lit(v_size), F.lit(1)
                )
            ).alias("unseen_logp"),
        )
    )
    return NBModel(vocab=vocab, labels=labels)


def nb_predict(
    docs: DataFrame,
    model: NBModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score and argmax every document: (id, label, score).

    ``score`` is the log-joint log P(label) + Σ log P(token|label).
    Zero-token documents fall back to the prior argmax. Ties break on
    the lexicographically-smallest label — deterministic under retries.

    The model broadcasts (it is vocab-sized); the corpus-side work is
    one explode and one (doc, label) aggregation."""
    vocab_map = model.vocab.groupBy("token").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("label", "logp")))
        ).alias("_m")
    )
    labels = model.labels
    exploded = docs.select(
        F.col(id_col).alias("_id"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    scored = (
        exploded.join(F.broadcast(vocab_map), "token", "left")
        .join(F.broadcast(labels), how="cross")
        .select(
            "_id",
            "label",
            F.coalesce(
                F.col("_m")[F.col("label")], F.col("unseen_logp")
            ).alias("_lp"),
        )
        .groupBy("_id", "label")
        .agg(F.sum("_lp").alias("_sum"))
    )
    per_label = scored.join(labels.select("label", "prior_logp"), "label").select(
        "_id", "label", (F.col("prior_logp") + F.col("_sum")).alias("score")
    )
    # argmax(score), ties → smallest label: min over (-score, label)
    best = per_label.groupBy("_id").agg(
        F.min(
            F.struct((-F.col("score")).alias("negscore"), F.col("label").alias("label"))
        ).alias("_b")
    )
    best = best.select(
        "_id",
        F.col("_b.label").alias("label"),
        (-F.col("_b.negscore")).alias("score"),
    )
    # zero-token docs: prior argmax (same deterministic tie-break)
    prior_best = labels.select(
        F.min(
            F.struct((-F.col("prior_logp")).alias("negscore"), F.col("label").alias("label"))
        ).alias("_p")
    ).first()
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(best, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("label", F.lit(prior_best._p.label)).alias("label"),
            F.coalesce("score", F.lit(-prior_best._p.negscore)).alias("score"),
        )
    )
