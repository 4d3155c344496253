"""Hashing-trick TF-IDF vectors: exact differential against a Python
replay (bucket assignments read back from Spark's own xxhash64, so the
replay checks the TF-IDF/normalization math, not the hash), plus the
embedding-consumer contract."""

import math

import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators.docops import tfidf_vectors
from graphforge_spark.operators.similarity import cosine_topk

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the cat sat on the mat"),                 # exact dup of 0
    (2, "the dog sat on the mat near the cat"),    # near 0
    (3, "quantum flux capacitors emit tachyon bursts"),  # unrelated
    (4, ""),                                        # empty
]
DIM = 64


@pytest.fixture(scope="module")
def vecs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = tfidf_vectors(docs, dim=DIM)
    return {r.doc_id: list(r.embedding) for r in out.collect()}


def test_python_replay_exact(spark, vecs):
    # bucket map from Spark's own hash (one tiny query), math replayed in Python
    all_toks = sorted({t for _, text in DOCS for t in text.lower().split()})
    bm = {
        r.tok: r.b
        for r in spark.createDataFrame([(t,) for t in all_toks], "tok string")
        .select("tok", F.pmod(F.xxhash64("tok"), F.lit(DIM)).cast("int").alias("b"))
        .collect()
    }
    N = len(DOCS)
    df_count = {}
    for _, text in DOCS:
        for t in set(text.lower().split()):
            df_count[t] = df_count.get(t, 0) + 1
    for doc_id, text in DOCS:
        toks = text.lower().split()
        vec = [0.0] * DIM
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        for t, n in tf.items():
            idf = math.log((N + 1) / (df_count[t] + 1)) + 1.0
            vec[bm[t]] += n * idf
        norm = math.sqrt(sum(x * x for x in vec))
        want = [x / norm for x in vec] if norm > 0 else vec
        got = vecs[doc_id]
        assert len(got) == DIM
        assert all(abs(g - w) < 1e-6 for g, w in zip(got, want)), doc_id


def test_vector_contract(vecs):
    for doc_id, v in vecs.items():
        n = math.sqrt(sum(x * x for x in v))
        if doc_id == 4:
            assert n == 0.0  # empty doc → zero vector, no NaN
        else:
            assert abs(n - 1.0) < 1e-5
    assert vecs[0] == vecs[1]  # identical docs → identical vectors


def _cos(a, b):
    return sum(x * y for x, y in zip(a, b))


def test_similarity_structure(vecs):
    near = _cos(vecs[0], vecs[2])
    far = _cos(vecs[0], vecs[3])
    assert near > 0.5 > far


def test_feeds_similarity_operators(spark):
    docs = spark.createDataFrame(DOCS[:4], "doc_id long, text string")
    emb = tfidf_vectors(docs, dim=DIM).withColumnRenamed("doc_id", "vec_id")
    res = cosine_topk(emb, emb.limit(1), k=2)
    rows = sorted((r.neighbor_id, r.rank) for r in res.collect())
    # doc 1 is an exact dup of the query doc 0 → its top neighbor
    assert rows and any(nid == 1 for nid, _ in rows)


def test_lazy_with_n_docs_and_dim_validation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = tfidf_vectors(docs, dim=8, n_docs=len(DOCS))
    assert out.count() == len(DOCS)
    with pytest.raises(ValueError, match="dim"):
        tfidf_vectors(docs, dim=0)
