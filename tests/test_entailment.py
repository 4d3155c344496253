"""RDFS entailment: curated case + a differential fuzzer against a
pure-Python naive fixpoint oracle (which iterates ALL rules to a global
fixpoint — so it would catch any under-entailment the stratified
one-pass evaluation might hide)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.operators.entailment import (
    OWL_INVERSE,
    OWL_SYMMETRIC,
    OWL_TRANSITIVE,
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    owl_closure,
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


# ---------------------------------------------------------------- OWL-lite


def _owl_python_fixpoint(rows):
    """Naive global fixpoint of the RDFS rules PLUS the OWL RL property
    rules (prp-inv1/2, prp-symp, prp-trp, inverseOf symmetry) — the
    oracle the stratified outer-fixpoint evaluation must match exactly."""
    schema5 = {RDF_TYPE, RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE}
    triples = {(s, p, o) for s, p, o, _ in rows}
    lit = {(s, p, o): l for s, p, o, l in rows}

    def is_lit(t):
        return lit.get(t, False)

    changed = True
    while changed:
        changed = False
        new = set()
        subprop = {(s, o) for s, p, o in triples if p == RDFS_SUBPROP}
        subclass = {(s, o) for s, p, o in triples if p == RDFS_SUBCLASS}
        inv = {
            (s, o)
            for s, p, o in triples
            if p == OWL_INVERSE and not is_lit((s, p, o))
        }
        inv |= {(o, s) for s, o in inv}
        sym = {s for s, p, o in triples if p == RDF_TYPE and o == OWL_SYMMETRIC}
        trans = {
            s for s, p, o in triples if p == RDF_TYPE and o == OWL_TRANSITIVE
        }
        new |= {(p, OWL_INVERSE, q) for p, q in inv}
        new |= {(a, RDFS_SUBPROP, c) for a, b in subprop for b2, c in subprop if b == b2}
        new |= {(a, RDFS_SUBCLASS, c) for a, b in subclass for b2, c in subclass if b == b2}
        for s, p, o in list(triples):
            if p in schema5 or p == OWL_INVERSE:
                if p != OWL_INVERSE:
                    continue
            t = (s, p, o)
            if p not in schema5 and p != OWL_INVERSE:
                for p2, q in subprop:
                    if p2 == p:
                        new.add((s, q, o))
                        lit.setdefault((s, q, o), is_lit(t))
                if not is_lit(t):
                    for p2, q in inv:
                        if p2 == p:
                            new.add((o, q, s))
                            lit.setdefault((o, q, s), False)
                    if p in sym:
                        new.add((o, p, s))
                        lit.setdefault((o, p, s), False)
                    if p in trans:
                        for s2, p2, o2 in list(triples):
                            if p2 == p and s2 == o and not is_lit((s2, p2, o2)):
                                new.add((s, p, o2))
                                lit.setdefault((s, p, o2), False)
            # rdfs2/3 apply to every non-rdfs-schema pred (incl. inverseOf rows)
            for p2, c in {(a, b) for a, x, b in triples if x == RDFS_DOMAIN}:
                if p2 == p:
                    new.add((s, RDF_TYPE, c))
            if not is_lit(t):
                for p2, c in {(a, b) for a, x, b in triples if x == RDFS_RANGE}:
                    if p2 == p:
                        new.add((o, RDF_TYPE, c))
        types = {(s, o) for s, p, o in triples if p == RDF_TYPE}
        for x, c in types:
            for c2, d in subclass:
                if c2 == c:
                    new.add((x, RDF_TYPE, d))
        if new - triples:
            triples |= new
            changed = True
    return triples


def test_owl_closure_curated(spark):
    P, Q, R, T, U = (f"http://e/{n}" for n in "pqrtu")
    rows = [
        # p inverseOf q; q has a domain
        (P, OWL_INVERSE, Q, False),
        (Q, RDFS_DOMAIN, "http://e/D", False),
        ("http://e/x", P, "http://e/y", False),
        # r symmetric, with a literal edge that must NOT flip
        (R, RDF_TYPE, OWL_SYMMETRIC, False),
        ("http://e/a", R, "http://e/b", False),
        ("http://e/a", R, "a literal", True),
        # t ⊑ u and u transitive: inheritance then chaining (outer round 2)
        (T, RDFS_SUBPROP, U, False),
        (U, RDF_TYPE, OWL_TRANSITIVE, False),
        ("http://e/m", T, "http://e/n", False),
        ("http://e/n", T, "http://e/o", False),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = owl_closure(df).collect()
    got = {(r.subj, r.pred, r.obj) for r in out}
    inferred = {(r.subj, r.pred, r.obj) for r in out if r.inferred}
    # prp-inv + inverseOf symmetry
    assert ("http://e/y", Q, "http://e/x") in got
    assert (Q, OWL_INVERSE, P) in inferred
    # rdfs2 over the INVERTED edge: y gets q's domain type
    assert ("http://e/y", RDF_TYPE, "http://e/D") in got
    # prp-symp, literals never flipped
    assert ("http://e/b", R, "http://e/a") in got
    assert not any(r.subj == "a literal" for r in out)
    # inherit → chain across the outer fixpoint
    assert ("http://e/m", U, "http://e/n") in got
    assert ("http://e/m", U, "http://e/o") in inferred
    # t itself is NOT transitive
    assert ("http://e/m", T, "http://e/o") not in got
    assert got == _owl_python_fixpoint(rows)


@pytest.mark.parametrize(
    "row",
    [
        (RDFS_SUBCLASS, RDFS_SUBPROP, "http://e/p", False),
        ("http://e/p", OWL_INVERSE, RDF_TYPE, False),
        (RDFS_SUBCLASS, RDF_TYPE, OWL_TRANSITIVE, False),
        ("http://e/C", RDFS_SUBCLASS, OWL_SYMMETRIC, False),
        ("http://e/p", RDFS_DOMAIN, OWL_TRANSITIVE, False),
    ],
)
def test_owl_closure_meta_schema_is_loud(spark, row):
    with pytest.raises(ValueError):
        owl_closure(spark.createDataFrame([row], SCHEMA)).collect()


@st.composite
def owl_ontologies(draw):
    rows = list(draw(ontologies()))
    for _ in range(draw(st.integers(0, 2))):
        p, q = draw(st.sampled_from(PROPS)), draw(st.sampled_from(PROPS))
        rows.append((p, OWL_INVERSE, q, False))
    for _ in range(draw(st.integers(0, 2))):
        p = draw(st.sampled_from(PROPS))
        kind = draw(st.sampled_from([OWL_SYMMETRIC, OWL_TRANSITIVE]))
        rows.append((p, RDF_TYPE, kind, False))
    return list(dict.fromkeys(rows))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=owl_ontologies())
def test_owl_closure_matches_fixpoint_oracle(spark, rows):
    """Random ontologies mixing RDFS hierarchies with inverse/symmetric/
    transitive declarations (cycles included) must entail exactly the
    naive global-fixpoint set — the check that the stratified outer
    fixpoint + one-pass typing never under-entails."""
    df = spark.createDataFrame(rows, SCHEMA)
    got = {(r.subj, r.pred, r.obj) for r in owl_closure(df).collect()}
    assert got == _owl_python_fixpoint(rows)
