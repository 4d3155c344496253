"""Property-based spot checks (SURVEY §5.5): dedup idempotence,
extraction determinism under row-order permutation, N-Triples round-trip,
closure reflexivity/transitivity invariants. Small hypothesis budgets —
each example spins Spark jobs."""

import random

from hypothesis import given, settings, strategies as st

from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.operators.extract import (
    dedup_triples,
    extract_ntriples,
    extract_patterns,
)
from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

SETTLE = dict(max_examples=5, deadline=None)


def _triples(df):
    return sorted(
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.src_conv_id, r.src_turn_idx)
        for r in df.collect()
    )


@given(seed=st.integers(0, 10**6))
@settings(**SETTLE)
def test_extraction_deterministic_under_row_permutation(spark, seed):
    fx = gen_transcripts(seed=seed % 50, n_convs=4, turns_per_conv=3)
    rows = [r for r in fx.rows if r[4] is None]
    rng = random.Random(seed)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    a = _triples(extract_patterns(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)))
    b = _triples(extract_patterns(spark.createDataFrame(shuffled, TRANSCRIPT_SCHEMA)))
    assert a == b


@given(seed=st.integers(0, 10**6))
@settings(**SETTLE)
def test_dedup_idempotent(spark, seed):
    fx = gen_transcripts(seed=seed % 50, n_convs=4, turns_per_conv=3)
    df = spark.createDataFrame(fx.rows, TRANSCRIPT_SCHEMA)
    once = dedup_triples(extract_patterns(df))
    twice = dedup_triples(once)
    assert _triples(once) == _triples(twice)
    # dedup of doubled input == dedup of single input
    doubled = dedup_triples(extract_patterns(df.union(df)))
    assert _triples(doubled) == _triples(once)


@given(
    facts=st.lists(
        st.tuples(
            st.sampled_from(["http://ex.org/e/A", "http://ex.org/e/B", "_:b1"]),
            st.sampled_from(["http://ex.org/p/p1", "http://ex.org/p/p2"]),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7E
                ),
                min_size=1,
                max_size=12,
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTLE)
def test_ntriples_roundtrip(spark, facts):
    """Serialize facts as N-Triples text, parse back, compare. Literal
    bodies restricted to escape-free characters here; escaping has its own
    deterministic unit coverage in test_extract."""
    lines = []
    for s, p, o, lit in facts:
        obj = f'"{o}"' if lit else f"<http://ex.org/o/{o}>"
        subj = s if s.startswith("_:") else f"<{s}>"
        lines.append(f"{subj} <{p}> {obj} .")
    df = spark.createDataFrame(
        [("c0", 0, "tool", "\n".join(lines), "ntriples", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    parsed = {
        (r.subj, r.pred, r.obj, r.obj_is_literal)
        for r in extract_ntriples(df).collect()
    }
    expected = {
        (s, p, o if lit else f"http://ex.org/o/{o}", lit) for s, p, o, lit in facts
    }
    assert parsed == expected
