"""Filtered negative sampling: protocol correctness (no true triples, no
self-corruptions, exactly-one-side corruption), determinism under
repartition/seed, and the literal-tail rule."""

import pytest

from graphforge_spark.operators.negatives import entity_pool, negative_samples

EX = "http://ex.org/"
TRIPLES = [
    (EX + "a", EX + "knows", EX + "b", False, None),
    (EX + "b", EX + "knows", EX + "c", False, None),
    (EX + "c", EX + "knows", EX + "a", False, None),
    (EX + "a", EX + "worksAt", EX + "acme", False, None),
    (EX + "b", EX + "worksAt", EX + "acme", False, None),
    (EX + "a", EX + "name", "Alice", True, None),
]
SCHEMA = "subj string, pred string, obj string, obj_is_literal boolean, graph string"


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, SCHEMA)


def test_pool_is_dense_and_entity_only(spark, triples):
    pool = {r.entity: r.pool_id for r in entity_pool(triples).collect()}
    assert "Alice" not in pool  # literals are not entities
    assert set(pool.values()) == set(range(len(pool)))
    assert set(pool) == {EX + e for e in ("a", "b", "c", "acme")}


def test_protocol_invariants(spark, triples):
    negs = negative_samples(triples, k=4, seed=1).collect()
    assert negs  # something was emitted
    true_set = {(s, p, o) for s, p, o, _, _ in TRIPLES}
    pos_by_key = {}  # reconstruct which positive each came from is not exposed;
    for r in negs:
        # 1. never a true triple (filtered protocol)
        assert (r.subj, r.pred, r.obj) not in true_set
        # 2. side bookkeeping is truthful: corrupted entity differs from
        #    every positive with the same (pred, other side)
        if r.corrupted_side == "head":
            assert (r.subj, r.pred, r.obj) not in true_set
        assert r.corrupted_side in ("head", "tail")
        assert 0 <= r.neg_idx < 4


def test_each_negative_matches_a_positive_on_uncorrupted_side(spark, triples):
    negs = negative_samples(triples, k=4, seed=1).collect()
    pos = [(s, p, o) for s, p, o, lit, _ in TRIPLES]
    for r in negs:
        if r.corrupted_side == "head":
            assert any(p == r.pred and o == r.obj for _, p, o in pos)
        else:
            assert any(s == r.subj and p == r.pred for s, p, _ in pos)


def test_literal_tails_only_corrupt_head(spark, triples):
    negs = negative_samples(triples, k=6, seed=3).collect()
    name_rows = [r for r in negs if r.pred == EX + "name"]
    assert name_rows  # the literal triple did produce negatives
    assert all(r.corrupted_side == "head" for r in name_rows)
    assert all(r.obj == "Alice" for r in name_rows)


def test_corrupt_tail_mode_skips_literal_rows(spark, triples):
    negs = negative_samples(triples, k=4, seed=1, corrupt="tail").collect()
    assert all(r.corrupted_side == "tail" for r in negs)
    assert all(r.pred != EX + "name" for r in negs)


def test_deterministic_and_seed_sensitive(spark, triples):
    a = sorted(map(tuple, negative_samples(triples, k=3, seed=7).collect()))
    b = sorted(map(tuple, negative_samples(triples.repartition(5), k=3, seed=7).collect()))
    c = sorted(map(tuple, negative_samples(triples, k=3, seed=8).collect()))
    assert a == b
    assert a != c


def test_pool_reuse_and_validation(spark, triples):
    pool = entity_pool(triples)
    a = sorted(map(tuple, negative_samples(triples, k=2, seed=5, pool=pool).collect()))
    b = sorted(map(tuple, negative_samples(triples, k=2, seed=5).collect()))
    assert a == b
    with pytest.raises(ValueError, match="k must be"):
        negative_samples(triples, k=0)
    with pytest.raises(ValueError, match="corrupt"):
        negative_samples(triples, corrupt="sideways")
    tiny = spark.createDataFrame([TRIPLES[5]], SCHEMA)
    with pytest.raises(ValueError, match="pool"):
        negative_samples(tiny, k=1)
