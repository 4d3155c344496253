"""Tests for the one-call curation pipeline (graphforge_spark.curation).

The pipeline is a composition of individually-tested docops operators;
these tests pin the COMPOSITION contracts: stage ordering semantics
(exact dups survive as one copy instead of being emptied by the line
scrub), determinism of the whole pass, gate behavior, and the laziness
contract of collect_metrics=False.
"""

import pytest
from pyspark.sql import functions as F

from graphforge_spark.curation import curate

BOILER = "subscribe to our newsletter for updates and offers today friends"
GOOD = (
    "the river valley holds a long history of trade and settlement where "
    "merchants carried grain and cloth between the northern towns and the coast"
)
DOCS = [
    # two exact duplicates of a good doc: exactly one copy must survive
    (0, GOOD),
    (1, GOOD),
    # near-duplicate of GOOD (one word changed): the keep-list drops it
    (2, GOOD.replace("coast", "harbor")),
    # too short: quality gate drops it
    (3, "too short"),
    # distinct good doc with an email: survives, redacted
    (4, "contact the archive curator at curator@example.org for the full "
        "catalogue of maps and ledgers kept in the reading room collection"),
    # distinct good doc sharing a boilerplate line with doc 6
    (5, BOILER + "\n" + "orchards on the south slope yield apples and pears "
        "that the village presses into cider each autumn for the market"),
    (6, BOILER + "\n" + "the lighthouse keeper logs the passing ships each "
        "night and records the weather in a leather bound journal faithfully"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_curate_end_to_end(docs):
    kept, metrics = curate(docs, min_words=8)
    rows = {r.doc_id: r.text for r in kept.collect()}

    # exact dup pair (0,1) -> one survivor, the min id; near-dup 2 dropped
    assert 0 in rows and 1 not in rows and 2 not in rows
    # the survivor keeps its content — not emptied by the line scrub
    assert "river valley" in rows[0]
    # short doc gated
    assert 3 not in rows
    # email redacted but doc kept
    assert 4 in rows and "curator@example.org" not in rows[4]
    assert "catalogue" in rows[4]
    # boilerplate line scrubbed from both carriers, content kept
    assert 5 in rows and 6 in rows
    assert "newsletter" not in rows[5] and "newsletter" not in rows[6]
    assert "cider" in rows[5] and "lighthouse" in rows[6]

    # metrics: monotone non-increasing survivor counts, all stages present
    order = ["input", "exact_dedup", "quality_gates", "pii_redacted",
             "line_scrub", "neardup_keep", "substring_dedup"]
    assert list(metrics) == order
    counts = [metrics[s] for s in order]
    assert counts == sorted(counts, reverse=True)
    assert metrics["input"] == len(DOCS)
    assert metrics["substring_dedup"] == kept.count() == len(rows)


def test_curate_deterministic(docs):
    kept1, _ = curate(docs, min_words=8, collect_metrics=False)
    kept2, _ = curate(docs, min_words=8, collect_metrics=False)
    a = sorted((r.doc_id, r.text) for r in kept1.collect())
    b = sorted((r.doc_id, r.text) for r in kept2.collect())
    assert a == b


def test_curate_lazy_without_metrics(docs):
    kept, metrics = curate(docs, min_words=8, collect_metrics=False)
    # no metrics jobs ran; the frame is still a plan, not a result
    assert metrics == {}
    assert kept.columns == ["doc_id", "text"]


def test_curate_language_gate(spark):
    docs = spark.createDataFrame(
        [(0, GOOD),
         (1, "der hund und die katze sind nicht in dem haus und dem garten "
             "sondern auf der wiese hinter dem alten zaun bei dem bach")],
        "doc_id long, text string")
    kept, _ = curate(docs, min_words=8, langs=("en",), collect_metrics=False)
    ids = {r.doc_id for r in kept.collect()}
    assert ids == {0}
    # langs=None disables the gate
    kept_all, _ = curate(docs, min_words=8, langs=None, collect_metrics=False)
    assert {r.doc_id for r in kept_all.collect()} == {0, 1}


def test_curate_lm_perplexity_gate(spark, docs):
    from graphforge_spark.operators import lm

    # Train on in-domain prose; the OOV junk doc must be gated out while
    # the in-domain docs survive with the same downstream behavior.
    train = spark.createDataFrame(
        [(100, GOOD), (101, DOCS[4][1]), (102, DOCS[5][1]), (103, DOCS[6][1])],
        "doc_id long, text string",
    )
    model = lm.lm_train(train, add_k=0.1)
    # stopword-laden (passes the langid/quality gates) but built from
    # bigrams the model has never seen → high perplexity
    junk = spark.createDataFrame(
        [(7, "the zzxq of vbnk and wqop to jklm in qwer the asdf of zxcv "
             "and tyui to ghjk in bnml the poiu of lkjh and mnbv to rewq")],
        "doc_id long, text string",
    )
    with_junk = docs.union(junk)

    base_kept, _ = curate(with_junk, collect_metrics=False)
    base_ids = {r.doc_id for r in base_kept.select("doc_id").collect()}
    assert 7 in base_ids  # without the LM gate the junk doc passes

    ppl = {
        r.doc_id: r.perplexity
        for r in lm.lm_perplexity(with_junk, model).collect()
    }
    cutoff = (ppl[0] + ppl[7]) / 2  # between in-domain and junk
    kept, _ = curate(
        with_junk, lm_model=model, max_perplexity=cutoff, collect_metrics=False
    )
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 7 not in ids
    assert ids == base_ids - {7}  # the LM gate dropped exactly the junk doc


def test_curate_lm_args_must_pair(docs):
    with pytest.raises(ValueError, match="together"):
        curate(docs, max_perplexity=1000.0)


def test_curate_priority_selects_best_copies(spark):
    rows = [
        (0, GOOD, 1.0),
        (1, GOOD, 9.0),                          # exact dup, best priority → kept
        (2, GOOD.replace("coast", "harbor"), 4.0),  # near dup of GOOD, lower prio
        (3, DOCS[4][1], 2.0),                    # distinct survivor
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, prio double")
    kept, _ = curate(docs, priority_col="prio", collect_metrics=False)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 1 in ids and 0 not in ids and 2 not in ids
    assert 3 in ids
    # without priority the min-id copy wins instead
    base_kept, _ = curate(docs, collect_metrics=False)
    base_ids = {r.doc_id for r in base_kept.select("doc_id").collect()}
    assert 0 in base_ids and 1 not in base_ids


def test_curate_dsir_selection_stage(spark, docs):
    """dsir_target+dsir_k append an importance-selection stage AFTER
    cleaning: the survivor set shrinks to k, the selected docs are the
    most target-like, and the stage appears in the metrics."""
    target = spark.createDataFrame(
        [(100, "the lighthouse keeper watches ships and logs the weather "
               "in a journal kept by the keeper of the lighthouse")],
        "doc_id long, text string",
    )
    kept, metrics = curate(docs, min_words=8, dsir_target=target, dsir_k=2)
    rows = kept.collect()
    assert len(rows) == 2
    assert metrics["dsir_select"] == 2
    # the lighthouse doc (6) is the clear target match and must be in
    ids = {r.doc_id for r in rows}
    assert 6 in ids
    # determinism: re-running selects the same set
    kept2, _ = curate(docs, min_words=8, dsir_target=target, dsir_k=2)
    assert {r.doc_id for r in kept2.collect()} == ids


def test_curate_dsir_args_must_pair(docs):
    with pytest.raises(ValueError, match="dsir_target and dsir_k"):
        curate(docs, dsir_k=3)
