"""DSIR importance resampling vs a pure-Python closed-form replay.

The operator's hashes are md5-portable by design (same contract as
stratified_sample / the fixtures), so an independent Python
implementation reproduces weights and the Gumbel-top-k selection
exactly — corpora are ASCII so the tokenizer replica is trivial.
"""

import hashlib
import math
import re

import pytest

from graphforge_spark.operators.dsir import (
    dsir_log_weights,
    dsir_model,
    dsir_resample,
)

DIM = 64
SALT = "dsir"


def _toks(text):
    return [t for t in re.split(r"[^a-zA-Z0-9]+", text.lower()) if t]


def _bucket(s, n):
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % n


def _grams(text, ngram_n=2):
    toks = _toks(text)
    out = list(toks)
    for n in range(2, ngram_n + 1):
        out += [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return out


def _py_model(target_texts, raw_texts, dim=DIM, a=1.0):
    def counts(texts):
        c = {}
        for t in texts:
            for g in _grams(t):
                b = _bucket(f"{SALT}:{g}", dim)
                c[b] = c.get(b, 0) + 1
        return c

    tc, rc = counts(target_texts), counts(raw_texts)
    nt, nr = sum(tc.values()), sum(rc.values())
    ratio = {
        b: math.log((tc.get(b, 0) + a) / (nt + a * dim))
        - math.log((rc.get(b, 0) + a) / (nr + a * dim))
        for b in set(tc) | set(rc)
    }
    default = math.log(a / (nt + a * dim)) - math.log(a / (nr + a * dim))
    return ratio, default


def _py_weight(text, ratio, default, dim=DIM):
    return sum(
        ratio.get(_bucket(f"{SALT}:{g}", dim), default) for g in _grams(text)
    )


TARGET = [
    ("t1", "the quick brown fox jumps over the lazy dog"),
    ("t2", "a quick brown fox and a lazy dog"),
    ("t3", "brown foxes jump over lazy dogs quickly"),
]
RAW = [
    ("r1", "the quick brown fox likes the lazy dog"),          # target-like
    ("r2", "stock prices fell sharply amid rate fears"),       # off-target
    ("r3", "buy cheap pills online click here now"),           # junk
    ("r4", "a brown dog and a quick fox"),                     # target-like
    ("r5", "quarterly earnings beat analyst expectations"),    # off-target
    ("r6", ""),                                                # empty
]


@pytest.fixture(scope="module")
def frames(spark):
    t = spark.createDataFrame(TARGET, "doc_id string, text string")
    r = spark.createDataFrame(RAW, "doc_id string, text string")
    return t, r


def test_log_weights_match_python_replay(spark, frames):
    t, r = frames
    model = dsir_model(t, r, dim=DIM)
    got = {
        row.doc_id: row.log_weight
        for row in dsir_log_weights(r, model).collect()
    }
    ratio, default = _py_model([x[1] for x in TARGET], [x[1] for x in RAW])
    assert model["default"] == pytest.approx(default, abs=1e-12)
    for doc_id, text in RAW:
        assert got[doc_id] == pytest.approx(
            _py_weight(text, ratio, default), abs=1e-9
        ), doc_id
    # the empty doc is weight-neutral
    assert got["r6"] == 0.0


def test_weights_prefer_target_like_docs(spark, frames):
    t, r = frames
    model = dsir_model(t, r, dim=DIM)
    got = {
        row.doc_id: row.log_weight
        for row in dsir_log_weights(r, model).collect()
    }
    assert got["r1"] > got["r2"]
    assert got["r4"] > got["r3"]


def test_resample_matches_python_gumbel_topk(spark, frames):
    t, r = frames
    model = dsir_model(t, r, dim=DIM)
    ratio, default = _py_model([x[1] for x in TARGET], [x[1] for x in RAW])

    def key(doc_id, text):
        u = (_bucket(f"dsir-gumbel-7:{doc_id}", 1 << 20) + 0.5) / (1 << 20)
        return _py_weight(text, ratio, default) - math.log(-math.log(u))

    expect = {
        d for d, _ in sorted(RAW, key=lambda x: (-key(*x), x[0]))[:3]
    }
    got = {row.doc_id for row in dsir_resample(r, model, k=3, seed=7).collect()}
    assert got == expect
    # selected rows keep original columns + log_weight
    cols = set(dsir_resample(r, model, k=3, seed=7).columns)
    assert cols == {"doc_id", "text", "log_weight"}


def test_resample_deterministic_under_repartition(spark, frames):
    t, r = frames
    model = dsir_model(t, r, dim=DIM)
    a = {row.doc_id for row in dsir_resample(r, model, k=4, seed=1).collect()}
    b = {
        row.doc_id
        for row in dsir_resample(r.repartition(13), model, k=4, seed=1).collect()
    }
    assert a == b


def test_loud_errors(spark, frames):
    t, r = frames
    empty = spark.createDataFrame([("e", " ")], "doc_id string, text string")
    with pytest.raises(ValueError, match="empty feature mass"):
        dsir_model(empty, r, dim=DIM)
    with pytest.raises(ValueError, match="smoothing"):
        dsir_model(t, r, dim=DIM, smoothing=0.0)
    model = dsir_model(t, r, dim=DIM)
    with pytest.raises(ValueError, match="k must be positive"):
        dsir_resample(r, model, k=0)
