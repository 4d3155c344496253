"""Distributed multinomial Naive Bayes vs a pure-Python replay."""

import math
import re
from collections import Counter, defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.operators.classify import nb_predict, nb_train


def _tok(text):
    # ASCII replay of functions.text.tokens (lowercase, \p{L}\p{N} runs)
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def _nb_oracle(train_rows, test_rows):
    """Closed-form NB replay: returns {doc_id: (label, score)}."""
    tok_counts = defaultdict(Counter)
    label_docs = Counter()
    for _id, text, label in train_rows:
        label_docs[label] += 1
        tok_counts[label].update(_tok(text))
    vocab = {t for c in tok_counts.values() for t in c}
    v = len(vocab)
    n_docs = sum(label_docs.values())
    totals = {lb: sum(c.values()) for lb, c in tok_counts.items()}
    out = {}
    for _id, text in test_rows:
        scores = {}
        for lb in label_docs:
            s = math.log(label_docs[lb] / n_docs)
            for t in _tok(text):
                c = tok_counts[lb][t] if t in vocab else None
                if c is None:
                    # empty-vocab corpus: priors-only (matches operator)
                    s += math.log(1 / max(totals[lb] + v, 1))
                else:
                    s += math.log((c + 1) / (totals[lb] + v))
            scores[lb] = s
        # argmax, ties -> smallest label (the operator's tie-break)
        best = min(scores, key=lambda lb: (-scores[lb], lb))
        out[_id] = (best, scores[best])
    return out


TRAIN = [
    (1, "spam buy cheap pills now buy", "spam"),
    (2, "cheap spam offer buy now", "spam"),
    (3, "the meeting notes from tuesday review", "ham"),
    (4, "please review the quarterly report notes", "ham"),
]
TEST = [
    (10, "buy cheap now"),
    (11, "quarterly meeting review"),
    (12, ""),  # zero tokens -> prior argmax
    (13, "zzz unknown words only"),  # fully out-of-vocabulary
]


@pytest.fixture(scope="module")
def model(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    return nb_train(train, "label")


def test_nb_matches_python_oracle(spark, model):
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {r.doc_id: (r.label, r.score) for r in nb_predict(test, model).collect()}
    want = _nb_oracle(TRAIN, TEST)
    assert set(got) == set(want)
    for _id in want:
        assert got[_id][0] == want[_id][0], _id
        assert got[_id][1] == pytest.approx(want[_id][1], rel=1e-9), _id


def test_nb_sensible_labels(spark, model):
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    got = {r.doc_id: r.label for r in nb_predict(test, model).collect()}
    assert got[10] == "spam"
    assert got[11] == "ham"
    assert got[12] == "ham"  # equal priors, tie-break to smallest label


def test_nb_deterministic_under_repartition(spark):
    train = spark.createDataFrame(TRAIN, "doc_id long, text string, label string")
    test = spark.createDataFrame(TEST, "doc_id long, text string")
    a = {
        r.doc_id: (r.label, round(r.score, 9))
        for r in nb_predict(test, nb_train(train, "label")).collect()
    }
    b = {
        r.doc_id: (r.label, round(r.score, 9))
        for r in nb_predict(
            test.repartition(5), nb_train(train.repartition(3), "label")
        ).collect()
    }
    assert a == b


def test_nb_empty_train_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label string")
    with pytest.raises(ValueError, match="non-empty"):
        nb_train(empty, "label")


def test_nb_fuzz(spark):
    """Differential fuzz: random small-vocab corpora, labels must match
    the closed-form replay exactly and scores to float tolerance."""
    vocab = ["aa", "bb", "cc", "dd"]
    doc = st.lists(st.sampled_from(vocab), min_size=0, max_size=8).map(" ".join)

    @given(
        train_texts=st.lists(
            st.tuples(doc, st.sampled_from(["x", "y"])), min_size=2, max_size=8
        ).filter(lambda rows: len({lb for _, lb in rows}) == 2),
        test_texts=st.lists(doc, min_size=1, max_size=4),
    )
    @settings(
        max_examples=20,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(train_texts, test_texts):
        train_rows = [(i, t, lb) for i, (t, lb) in enumerate(train_texts)]
        test_rows = [(100 + i, t) for i, t in enumerate(test_texts)]
        train = spark.createDataFrame(
            train_rows, "doc_id long, text string, label string"
        )
        test = spark.createDataFrame(test_rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.label, r.score)
            for r in nb_predict(test, nb_train(train, "label")).collect()
        }
        want = _nb_oracle(train_rows, test_rows)
        assert set(got) == set(want)
        for _id in want:
            assert got[_id][1] == pytest.approx(want[_id][1], rel=1e-9), _id
            assert got[_id][0] == want[_id][0], _id

    run()


def test_nb_empty_vocab_is_priors_only(spark):
    # all-empty training docs: V=0 — the model must degrade to priors,
    # not divide by zero (hypothesis found this in the fuzz)
    train = spark.createDataFrame(
        [(0, "", "x"), (1, "", "x"), (2, "", "y")],
        "doc_id long, text string, label string",
    )
    test = spark.createDataFrame([(10, "aa bb")], "doc_id long, text string")
    got = {r.doc_id: (r.label, r.score) for r in nb_predict(test, nb_train(train, "label")).collect()}
    want = _nb_oracle([(0, "", "x"), (1, "", "x"), (2, "", "y")], [(10, "aa bb")])
    assert got[10][0] == want[10][0] == "x"  # majority prior wins
    assert got[10][1] == pytest.approx(want[10][1], rel=1e-9)
