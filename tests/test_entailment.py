"""RDFS entailment: curated case + a differential fuzzer against a
pure-Python naive fixpoint oracle (which iterates ALL rules to a global
fixpoint — so it would catch any under-entailment the stratified
one-pass evaluation might hide)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.operators.entailment import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_closure,
)

SCHEMA = "subj string, pred string, obj string, obj_is_literal boolean"


def _run(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = rdfs_closure(df).collect()
    got = {(r.subj, r.pred, r.obj) for r in out}
    inferred = {(r.subj, r.pred, r.obj) for r in out if r.inferred}
    return got, inferred, out


def _python_fixpoint(rows):
    """Naive all-rules-until-fixpoint oracle over (s, p, o, lit)."""
    triples = {(s, p, o) for s, p, o, _ in rows}
    lit = {(s, p, o): l for s, p, o, l in rows}
    changed = True
    while changed:
        changed = False
        new = set()
        subprop = {(s, o) for s, p, o in triples if p == RDFS_SUBPROP}
        subclass = {(s, o) for s, p, o in triples if p == RDFS_SUBCLASS}
        # rdfs5 / rdfs11 transitivity
        new |= {
            (a, RDFS_SUBPROP, c)
            for a, b in subprop
            for b2, c in subprop
            if b == b2
        }
        new |= {
            (a, RDFS_SUBCLASS, c)
            for a, b in subclass
            for b2, c in subclass
            if b == b2
        }
        # rdfs7 property inheritance (instance edges only)
        schema = {RDF_TYPE, RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE}
        for s, p, o in list(triples):
            if p in schema:
                continue
            for p2, q in subprop:
                if p2 == p:
                    new.add((s, q, o))
                    lit.setdefault((s, q, o), lit.get((s, p, o), False))
        # rdfs2 / rdfs3 domain & range
        dom = {(s, o) for s, p, o in triples if p == RDFS_DOMAIN}
        rng = {(s, o) for s, p, o in triples if p == RDFS_RANGE}
        for s, p, o in list(triples):
            if p in schema:
                continue
            for p2, c in dom:
                if p2 == p:
                    new.add((s, RDF_TYPE, c))
            if not lit.get((s, p, o), False):
                for p2, c in rng:
                    if p2 == p:
                        new.add((o, RDF_TYPE, c))
        # rdfs9 type inheritance
        types = {(s, o) for s, p, o in triples if p == RDF_TYPE}
        for x, c in types:
            for c2, d in subclass:
                if c2 == c:
                    new.add((x, RDF_TYPE, d))
        if new - triples:
            triples |= new
            changed = True
    return triples


def test_rdfs_closure_curated(spark):
    P, Q = "http://e/p", "http://e/q"
    rows = [
        # class hierarchy A ⊂ B ⊂ C
        ("http://e/A", RDFS_SUBCLASS, "http://e/B", False),
        ("http://e/B", RDFS_SUBCLASS, "http://e/C", False),
        # property hierarchy p ⊂ q; q has domain B and range C
        (P, RDFS_SUBPROP, Q, False),
        (Q, RDFS_DOMAIN, "http://e/B", False),
        (Q, RDFS_RANGE, "http://e/C", False),
        # instance data
        ("http://e/x", RDF_TYPE, "http://e/A", False),
        ("http://e/s", P, "http://e/t", False),
        ("http://e/s", P, "a literal", True),
    ]
    got, inferred, out = _run(spark, rows)
    # rdfs11 + rdfs9
    assert ("http://e/A", RDFS_SUBCLASS, "http://e/C") in got
    assert ("http://e/x", RDF_TYPE, "http://e/B") in got
    assert ("http://e/x", RDF_TYPE, "http://e/C") in got
    # rdfs7: s q t (and s q "a literal" with the literal flag carried)
    assert ("http://e/s", Q, "http://e/t") in got
    lit_rows = [r for r in out if r.pred == Q and r.obj == "a literal"]
    assert lit_rows and lit_rows[0].obj_is_literal is True
    # rdfs2 via the INHERITED edge: s gets q's domain type B, then C
    assert ("http://e/s", RDF_TYPE, "http://e/B") in got
    assert ("http://e/s", RDF_TYPE, "http://e/C") in got
    # rdfs3: t gets range type C; the literal object does NOT
    assert ("http://e/t", RDF_TYPE, "http://e/C") in got
    assert not any(r.subj == "a literal" for r in out)
    # matches the all-rules fixpoint exactly
    assert got == _python_fixpoint(rows)
    # asserted rows are flagged inferred=False, additions True
    assert ("http://e/x", RDF_TYPE, "http://e/A") not in inferred
    assert ("http://e/x", RDF_TYPE, "http://e/C") in inferred


def test_rdfs_closure_meta_schema_is_loud(spark):
    rows = [("http://e/p", RDFS_SUBPROP, RDFS_SUBCLASS, False)]
    with pytest.raises(ValueError, match="meta-schema"):
        rdfs_closure(spark.createDataFrame(rows, SCHEMA)).collect()


CLASSES = [f"http://e/C{i}" for i in range(4)]
PROPS = [f"http://e/p{i}" for i in range(3)]
NODES = [f"http://e/n{i}" for i in range(4)] + ["lit-a", "lit-b"]


@st.composite
def ontologies(draw):
    rows = []
    for _ in range(draw(st.integers(0, 3))):
        a, b = draw(st.sampled_from(CLASSES)), draw(st.sampled_from(CLASSES))
        rows.append((a, RDFS_SUBCLASS, b, False))
    for _ in range(draw(st.integers(0, 2))):
        p, q = draw(st.sampled_from(PROPS)), draw(st.sampled_from(PROPS))
        rows.append((p, RDFS_SUBPROP, q, False))
    for _ in range(draw(st.integers(0, 2))):
        p, c = draw(st.sampled_from(PROPS)), draw(st.sampled_from(CLASSES))
        rows.append((p, draw(st.sampled_from([RDFS_DOMAIN, RDFS_RANGE])), c, False))
    for _ in range(draw(st.integers(1, 5))):
        s = draw(st.sampled_from(NODES[:4]))
        p = draw(st.sampled_from(PROPS + [RDF_TYPE]))
        o = (
            draw(st.sampled_from(CLASSES))
            if p == RDF_TYPE
            else draw(st.sampled_from(NODES))
        )
        rows.append((s, p, o, not o.startswith("http")))
    return list(dict.fromkeys(rows))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=ontologies())
def test_rdfs_closure_matches_fixpoint_oracle(spark, rows):
    """Random ontologies (cyclic hierarchies included) must entail
    exactly the naive global-fixpoint set — this is the check that the
    stratified one-pass evaluation never under-entails."""
    got, _, _ = _run(spark, rows)
    assert got == _python_fixpoint(rows)
