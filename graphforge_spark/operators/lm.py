"""Trainable n-gram language-model perplexity scoring — the CCNet-style
quality filter, in pure DataFrame algebra.

CCNet (Wenzek et al. 2020) ranks web documents by the perplexity of a
KenLM 5-gram model trained on a trusted corpus and keeps the low-
perplexity head — the single most-used statistical quality gate in
published pretraining pipelines (CCNet, LLaMA, RedPajama, FineWeb all
derive from it). Kneser-Ney KenLM itself is an external binary; the
closed-form member of the same family is an add-k-smoothed bigram model,
which needs ONE counting pass to fit and stays entirely inside
whole-stage codegen — no gradient loop, no Python, no external model
artifact. Like `classify.nb_train`, fit cost is two combinable
aggregations and the model is vocabulary-sized, not corpus-sized.

Shapes at scale:
- fit: per-doc bigram array (narrow `transform` over the token array,
  BOS-prefixed) → explode → groupBy(prev, cur) count with map-side
  combine. Context counts and the vocabulary size derive from the
  MODEL-sized bigram table, not from a second corpus pass.
- score: explode bigrams → join the bigram and context count tables —
  broadcast-hinted while the model is small (``broadcast_model="auto"``
  switches on the fitted table's row count, so an order=5 web-scale
  vocabulary falls back to a shuffle join instead of OOMing the driver;
  True/False force either) → one groupBy(doc) sum. The corpus is
  touched once and never shuffled on anything wider than the doc id.

Smoothing: add-k over a vocabulary of V seen tokens plus one OOV
bucket, P(cur|prev) = (c(prev,cur)+k) / (c(prev)+k·(V+1)); an unseen
context contributes the uniform 1/(V+1). Every probability is strictly
positive, so log-space sums are always defined. Perplexity is
exp(−mean log P); empty documents (no tokens) carry NULL perplexity —
they have no evidence either way, and the length gates own that case.

Reference scope note: GraphForge itself has no model-based scoring —
this operator is part of the large-scale training-data layer the build
brief adds beyond the reference surface.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.functions.text import tokens

BOS = "bos"  # sentinel outside the tokenizer's alphabet


class LMModel(NamedTuple):
    """n-gram LM as two model-sized DataFrames plus closed-form scalars.

    ``bigrams``: (prev, cur, n_pair) observed n-gram counts — ``prev``
    is the (order−1)-token context, BOS-padded and joined with the
    sentinel separator (a single token for the default order=2).
    ``contexts``: (prev, n_ctx) context totals (Σ over cur — derived
    from the n-gram table, so fit reads the corpus exactly once).
    ``vocab_size``: count of distinct seen tokens V (OOV bucket makes
    the smoothing denominator k·(V+1)).
    ``add_k``: the smoothing constant the model was built to be scored
    with (scoring re-uses it so train/score can't drift apart).
    ``order``: n (2 = bigram, 5 = the KenLM/CCNet shape).
    """

    bigrams: DataFrame
    contexts: DataFrame
    vocab_size: int
    add_k: float
    order: int = 2
    n_ngrams: int = 0  # bigram-table row count (drives the auto join strategy)


def _ngram_pairs(text, order: int):
    """array<struct<prev,cur>>: for each token, its (order−1)-token
    BOS-padded context (joined with the BOS separator — itself outside
    the token alphabet, so joined contexts can't collide across token
    boundaries) and the token. order=2 degenerates to adjacent pairs."""
    ctx_len = order - 1
    toks = tokens(text)
    with_bos = F.concat(F.array(*[F.lit(BOS)] * ctx_len), toks)
    return F.transform(
        toks,
        lambda t, i: F.struct(
            F.concat_ws(
                "\x00", F.slice(with_bos, i + 1, ctx_len)
            ).alias("prev"),
            t.alias("cur"),
        ),
    )


def lm_train(
    docs: DataFrame, text_col: str = "text", add_k: float = 0.1, order: int = 2
) -> LMModel:
    """Fit the add-k n-gram LM in one corpus pass (default bigram;
    ``order=5`` gives the KenLM/CCNet shape — the model table then grows
    toward the corpus' distinct-5-gram count, which is why CCNet prunes;
    add-k needs no pruning for correctness, only for size).

    One explode + one combinable aggregation over the corpus; contexts
    and vocabulary size are second-order aggregates of the MODEL-sized
    n-gram table (the vocab count is an action over those rows, like
    `nb_train`'s prior count). Deterministic: counts only."""
    if add_k <= 0:
        raise ValueError(f"add_k must be > 0 for defined log-probs, got {add_k}")
    if order < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    pairs = docs.select(
        F.explode(_ngram_pairs(F.col(text_col), order)).alias("bg")
    ).select(F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    # persist the model tables: they are vocabulary-sized, and every
    # downstream action on a lm_perplexity frame would otherwise re-run
    # the full training-corpus aggregation (twice — bigrams AND
    # contexts). The vocab count below fills the bigram cache, so the
    # persist is effectively free.
    bigrams = pairs.groupBy("prev", "cur").agg(F.count("*").alias("n_pair")).persist()
    contexts = bigrams.groupBy("prev").agg(F.sum("n_pair").alias("n_ctx")).persist()
    vocab_size = bigrams.select("cur").distinct().count()
    # n-gram table row count over the (now cached) bigram table — a cheap
    # second-order action that lets scoring pick its join strategy without
    # re-counting
    n_ngrams = bigrams.count()
    return LMModel(bigrams, contexts, vocab_size, add_k, order, n_ngrams)


AUTO_BROADCAST_MAX_NGRAMS = 2_000_000


def lm_perplexity(
    docs: DataFrame,
    model: LMModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool | str = "auto",
) -> DataFrame:
    """Score every document: (id, n_tokens, logprob, perplexity).

    ``logprob`` is Σ log P(cur|prev) over the doc's BOS-prefixed token
    stream; ``perplexity`` = exp(−logprob/n_tokens), NULL for empty
    docs. Lower perplexity = more like the training corpus; gate with
    ``perplexity <= cutoff`` (CCNet keeps the head/middle of the
    distribution).

    ``broadcast_model``: "auto" (default — r3 verdict #5: broadcasting
    unconditionally is the wrong default at order=5 web-scale, where the
    n-gram table grows toward the corpus' distinct-5-gram count and a
    forced broadcast OOMs the driver) hints broadcast only while
    ``model.n_ngrams`` ≤ ``AUTO_BROADCAST_MAX_NGRAMS`` (~2M rows ≈ tens
    of MB serialized) and otherwise leaves the strategy to Catalyst/AQE
    (a plain shuffle join at web-scale vocabularies); True/False force
    the respective strategy."""
    if broadcast_model == "auto":
        broadcast_model = model.n_ngrams <= AUTO_BROADCAST_MAX_NGRAMS
    bg_tbl = F.broadcast(model.bigrams) if broadcast_model else model.bigrams
    ctx_tbl = F.broadcast(model.contexts) if broadcast_model else model.contexts
    denom_k = F.lit(model.add_k) * F.lit(float(model.vocab_size + 1))

    bg = docs.select(
        F.col(id_col), F.explode(_ngram_pairs(F.col(text_col), model.order)).alias("bg")
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    scored = (
        bg.join(bg_tbl, ["prev", "cur"], "left")
        .join(ctx_tbl, ["prev"], "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("n_pair"), F.lit(0)) + F.lit(model.add_k))
                / (F.coalesce(F.col("n_ctx"), F.lit(0)) + denom_k)
            ).alias("logp"),
        )
        .groupBy(id_col)
        .agg(F.count("*").alias("n_tokens"), F.sum("logp").alias("logprob"))
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("logprob"), F.lit(0.0)).alias("logprob"),
            F.when(
                F.col("n_tokens").isNotNull(),
                F.exp(-F.col("logprob") / F.col("n_tokens")),
            ).alias("perplexity"),
        )
    )


def lm_bucketize(
    docs: DataFrame,
    model: LMModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    head: float = 1.0 / 3.0,
    middle: float = 1.0 / 3.0,
    stratum_col: str | None = None,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket documents by LM perplexity
    percentile — (id, n_tokens, logprob, perplexity, ppl_bucket).

    CCNet (Wenzek et al. 2020) cuts each language's perplexity
    distribution into thirds and trains preferentially on the head
    (lowest perplexity = most like the trusted corpus). ``head`` and
    ``middle`` are the cumulative fractions (defaults = the paper's
    thirds); ``stratum_col`` computes cuts PER STRATUM (CCNet cuts per
    language) — one combinable aggregate per stratum, cuts join back
    broadcast (strata count is bounded by construction).

    ``exact=True`` uses Spark's exact ``percentile`` (linear
    interpolation — memory ∝ distinct perplexities per stratum; right
    at test scale and fine in practice since perplexities of a bounded
    corpus sample are what you cut on). At web scale set
    ``exact=False``: ``percentile_approx`` with ``accuracy`` bounds
    state at the documented ε = 1/accuracy rank error.

    Empty documents (NULL perplexity) get a NULL bucket — they carry no
    evidence either way; gate them with the quality gates, not the LM.
    """
    if not (0.0 < head and 0.0 < middle and head + middle < 1.0):
        raise ValueError(
            f"lm_bucketize: need 0 < head, 0 < middle, head+middle < 1 "
            f"(got head={head}, middle={middle})"
        )
    ppl = lm_perplexity(docs, model, id_col=id_col, text_col=text_col)
    if stratum_col is not None:
        ppl = ppl.join(docs.select(id_col, stratum_col), id_col)
        key = F.col(stratum_col)
    else:
        key = F.lit("_all")
    pcts = F.array(F.lit(float(head)), F.lit(float(head + middle)))
    if exact:
        cut_agg = F.expr(
            f"percentile(perplexity, array({head}d, {head + middle}d))"
        )
    else:
        cut_agg = F.percentile_approx("perplexity", pcts, F.lit(accuracy))
    cuts = (
        ppl.withColumn("_stratum", key)
        .groupBy("_stratum")
        .agg(cut_agg.alias("_cuts"))
        .select(
            "_stratum",
            F.element_at("_cuts", 1).alias("_c_head"),
            F.element_at("_cuts", 2).alias("_c_mid"),
        )
    )
    out = (
        ppl.withColumn("_stratum", key)
        .join(F.broadcast(cuts), "_stratum")
        .select(
            *[c for c in ppl.columns],
            F.when(F.col("perplexity").isNull(), F.lit(None).cast("string"))
            .when(F.col("perplexity") <= F.col("_c_head"), F.lit("head"))
            .when(F.col("perplexity") <= F.col("_c_mid"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )
    return out
