"""Trainable BPE: merges match the hand-computed Sennrich example,
tokenization round-trips exactly, and the distributed apply equals the
driver-side segmentation."""

import pytest

from graphforge_spark.operators import bpe

# Sennrich et al. (2016) style corpus: 'es' and 'est</w>' dominate
CORPUS = " ".join(
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([(0, CORPUS)], "doc_id long, text string")


def _python_bpe_train(word_freqs, n_merges):
    vocab = {
        tuple(list(w[:-1]) + [w[-1] + bpe.EOW]): n for w, n in word_freqs.items()
    }
    merges = []
    for _ in range(n_merges):
        stats = {}
        for syms, n in vocab.items():
            for p in zip(syms, syms[1:]):
                stats[p] = stats.get(p, 0) + n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = bpe._merge_vocab(vocab, best)
    return merges


def test_merges_match_hand_computation(spark, docs):
    merges = bpe.bpe_train(docs, n_merges=4)
    want = _python_bpe_train({"low": 5, "lower": 2, "newest": 6, "widest": 3}, 4)
    assert merges == want
    # the classic outcome: ('e','s') then ('es','t</w>') lead
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + bpe.EOW)


def test_tokenize_roundtrip_and_counts(spark, docs):
    merges = bpe.bpe_train(docs, n_merges=8)
    out = bpe.bpe_tokenize(docs, merges).collect()[0]
    assert out.n_bpe_tokens == len(out.bpe_tokens)
    # every word boundary carries exactly one EOW marker
    assert sum(1 for t in out.bpe_tokens if t.endswith(bpe.EOW)) == len(CORPUS.split())
    assert bpe.detokenize(out.bpe_tokens) == CORPUS


def test_distributed_apply_equals_driver_segmentation(spark):
    docs = spark.createDataFrame(
        [(i, f"newest widest low lower doc number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, n_merges=10)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    got = {r.doc_id: r.bpe_tokens for r in bpe.bpe_tokenize(docs.repartition(7), merges).collect()}
    for i in range(20):
        text = f"newest widest low lower doc number {i}"
        want = [t for w in text.split() for t in bpe._segment(w, ranks)]
        assert got[i] == want


def test_more_merges_fewer_tokens(spark, docs):
    few = bpe.bpe_tokenize(docs, bpe.bpe_train(docs, n_merges=2)).collect()[0]
    many = bpe.bpe_tokenize(docs, bpe.bpe_train(docs, n_merges=20)).collect()[0]
    assert many.n_bpe_tokens < few.n_bpe_tokens


def test_empty_and_validation(spark, docs):
    empty = spark.createDataFrame([(0, "")], "doc_id long, text string")
    merges = bpe.bpe_train(docs, n_merges=3)
    row = bpe.bpe_tokenize(empty, merges).collect()[0]
    assert row.bpe_tokens == [] and row.n_bpe_tokens == 0
    with pytest.raises(ValueError, match="n_merges"):
        bpe.bpe_train(docs, n_merges=0)
