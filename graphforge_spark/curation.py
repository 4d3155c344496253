"""One-call corpus curation pipeline — the standard training-data pass
composed from the docops operators, in the order the published pipelines
run it (CCNet/RefinedWeb/Gopher-style): language gate → quality gates →
optional LM-perplexity gate (CCNet's model-based keep, `operators/lm`) →
PII redaction → boilerplate line scrub → cross-document substring dedup
→ exact + near-dup keep-list.

This is the composition a 100 TB run actually executes, so the module's
job is ordering, wiring, and metrics — every stage is an existing
operator with its own tests and scale story. Laziness: the stage DAG is
built unexecuted; with ``collect_metrics=False`` nothing runs until the
caller acts on the returned frame (one job end-to-end). With metrics on,
each stage boundary costs one count() — the debugging mode, not the
production default.

Stage order rationale (why this order and not another):
- exact dedup FIRST: one cheap hash shuffle that shrinks everything
  after it — and, critically, exact-duplicate documents would otherwise
  make every one of their lines a "cross-document repeat", so the line
  scrub would empty them instead of the dedup keeping one copy;
- language/quality gates next: narrow (no shuffle), shrink every
  shuffle after them;
- PII redaction before any remaining hashing stage, so redacted text is
  what gets fingerprinted (two docs differing only in emails dedup
  together);
- line scrub before the similarity stages: boilerplate lines are
  cross-doc duplicates by definition and would otherwise dominate both
  the MinHash shingles and the substring window table;
- near-dup keep-list on the scrubbed text, BEFORE substring dedup —
  removing a shared span from one copy destroys the near-dup signal,
  so running ExactSubstr first would make every near-duplicate's
  surviving stub look unique (Lee et al. 2022 order);
- cross-document substring dedup LAST: it is the only stage that
  rewrites text rather than dropping documents, so everything that
  measures document similarity must already have run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.operators import docops, lm


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    langs: tuple[str, ...] | None = ("en",),
    min_words: int = 5,
    max_punct_ratio: float = 0.30,
    min_stopword_ratio: float = 0.0,
    max_dup_line_frac: float = 0.5,
    max_top_bigram_frac: float = 0.5,
    redact: bool = True,
    substring_k: int = 8,
    jaccard_threshold: float = 0.6,
    lm_model: "lm.LMModel | None" = None,
    max_perplexity: float | None = None,
    priority_col: str | None = None,
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    collect_metrics: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the standard curation pass. Returns (kept_docs, metrics).

    ``dsir_target``/``dsir_k`` (together) append a DSIR importance-
    resampling selection stage (operators/dsir): after cleaning and
    dedup, keep the ``dsir_k`` documents Gumbel-top-k-sampled by
    target-likeness against the given target corpus. It runs LAST so
    duplicate mass can't masquerade as target mass and weights score
    the text the model will actually train on.

    ``kept_docs`` has the input id column plus the cleaned ``text``.
    ``metrics`` maps stage → surviving doc count (empty dict when
    ``collect_metrics=False`` — no extra jobs run).

    Every stage is deterministic and repartition-stable, so the whole
    pass is: running it twice on the same input yields the same keep
    set and the same cleaned text.

    Cache lifetime: the line-scrub boundary stays persisted so the
    returned lazy frame can be acted on repeatedly; a long-lived driver
    curating many corpora should ``spark.catalog.clearCache()`` between
    runs (or act once and write out — the production pattern)."""
    metrics: dict = {}

    def _mark(stage: str, frame: DataFrame) -> DataFrame:
        if collect_metrics:
            metrics[stage] = frame.count()
        return frame

    prio_cols = [priority_col] if priority_col else []
    base = docs.select(F.col(id_col), F.col(text_col).alias("text"), *prio_cols)
    _mark("input", base)

    # ---- exact dedup: keep one copy of each normalized text --------------
    # min-id by default; with a priority column, the highest-priority
    # copy (ties → min id) — consistent with the keep-list stage below
    if priority_col is None:
        groups = docops.exact_dedup_groups(base, id_col=id_col, text_col="text")
        base = base.join(
            groups.select(F.col("min_doc_id").alias(id_col)), id_col, "left_semi"
        )
    else:
        from graphforge_spark.functions.hashing import best_copy_key, exact_text_key

        hashed = base.select(
            F.col(id_col), exact_text_key(F.col("text")).alias("_h"),
            F.col(priority_col),
        )
        winners = (
            hashed.groupBy("_h")
            .agg(F.min(best_copy_key(hashed, priority_col, id_col)).alias("_w"))
            .select(F.col("_w._id").alias(id_col))
        )
        base = base.join(winners, id_col, "left_semi")
    base = _mark("exact_dedup", base)

    # ---- narrow gates: language + quality + repetition -----------------
    stats = docops.doc_stats(base, id_col=id_col, text_col="text").select(
        id_col, "lang_pred", "n_words", "punct_ratio", "stopword_ratio"
    )
    reps = docops.repetition_ratios(base, id_col=id_col, text_col="text")
    gated = (
        base.join(stats, id_col)
        .join(reps, id_col)
        .filter(
            (F.col("n_words") >= min_words)
            & (F.col("punct_ratio") <= max_punct_ratio)
            & (F.col("stopword_ratio") >= min_stopword_ratio)
            & (F.col("dup_line_frac") <= max_dup_line_frac)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
            & (F.col("lang_pred").isin(list(langs)) if langs else F.lit(True))
        )
        # priority is NOT carried through the gate chain: dedup_lines
        # below outputs only (id, text, counts) anyway, so it is
        # re-attached once from the raw input at the line-scrub boundary
        .select(id_col, "text")
    )
    gated = _mark("quality_gates", gated)

    # ---- optional LM perplexity gate (CCNet's head/middle keep) ---------
    # Runs right after the language gate, like CCNet: the LM is trained
    # on one language's trusted corpus, so it must only score docs that
    # passed langid. Requires BOTH a trained model and a cutoff.
    if (lm_model is None) != (max_perplexity is None):
        raise ValueError("lm_model and max_perplexity must be passed together")
    if lm_model is not None:
        ppl = lm.lm_perplexity(gated, lm_model, id_col=id_col, text_col="text")
        gated = gated.join(
            ppl.filter(F.col("perplexity") <= max_perplexity).select(id_col),
            id_col,
            "left_semi",
        )
        gated = _mark("lm_perplexity", gated)

    # ---- PII redaction (before any hashing sees the text) --------------
    if redact:
        red = docops.redact_pii(gated, id_col=id_col, text_col="text")
        gated = red.select(id_col, F.col("redacted_text").alias("text"))
        gated = _mark("pii_redacted", gated)

    # ---- boilerplate line scrub ----------------------------------------
    scrubbed = docops.dedup_lines(gated, id_col=id_col, text_col="text")
    if priority_col:
        scrubbed = scrubbed.join(docs.select(F.col(id_col), F.col(priority_col)), id_col)
    scrubbed = scrubbed.select(id_col, "text", *prio_cols)
    # Persist this boundary: everything downstream (the keep-list's
    # iterative CC rounds, the keep-semi-join, the substring pass) would
    # otherwise re-derive the full gate+scrub chain once PER CONSUMER —
    # the composition analog of materializing between passes, which is
    # what a 100 TB run does with checkpoint tables (`pipeline.forge`).
    # persist() is lazy, so the collect_metrics=False one-job contract
    # holds.
    scrubbed = scrubbed.persist()
    scrubbed = _mark("line_scrub", scrubbed)

    # ---- near-dup keep-list on the cleaned text -------------------------
    # Runs BEFORE substring dedup: removing a shared span from one copy
    # destroys the near-dup signal the keep-list needs (the surviving
    # stub of a near-duplicate would look "unique" afterwards). Lee et
    # al. 2022 treat NearDup and ExactSubstr as complementary passes in
    # this order for the same reason.
    keep = docops.neardup_keep_list(
        scrubbed,
        id_col=id_col,
        text_col="text",
        jaccard_threshold=jaccard_threshold,
        priority_col=priority_col,
    )
    kept = scrubbed.join(
        keep.filter(F.col("keep")).select(F.col(id_col)), id_col, "left_semi"
    )
    kept = _mark("neardup_keep", kept)

    # ---- cross-document substring dedup (last: mutates text) ------------
    span_deduped = docops.dedup_substrings(
        kept.select(id_col, "text"), id_col=id_col, text_col="text", k=substring_k
    ).select(id_col, "text")
    span_deduped = _mark("substring_dedup", span_deduped)

    # ---- optional DSIR selection (after cleaning: select on the text the
    # model will actually train on) --------------------------------------
    # The importance model's RAW side is the cleaned corpus itself, so
    # weights measure target-likeness among the survivors — selecting
    # before dedup would let duplicate mass masquerade as target mass.
    if (dsir_target is None) != (dsir_k is None):
        raise ValueError("dsir_target and dsir_k must be passed together")
    if dsir_target is not None:
        from graphforge_spark.operators.dsir import dsir_model, dsir_resample

        model = dsir_model(dsir_target, span_deduped, text_col="text")
        span_deduped = dsir_resample(
            span_deduped, model, k=dsir_k, id_col=id_col, text_col="text"
        ).select(id_col, "text")
        span_deduped = _mark("dsir_select", span_deduped)
    return span_deduped, metrics
