"""Query-surface tests mirroring the reference's three canned queries
(docs/test HTML/SPARQL.html:241-283) plus the default SELECT*LIMIT
(docs/scripts/app.js:100-104) — B1-B11 of SURVEY §2B."""

import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators.closure import path_alternation, path_closure, transitive_closure
from graphforge_spark.plans.bgp import (
    Var,
    bgp,
    group_count,
    optional,
    select_star_limit,
    top_k,
)

TRIPLES = [
    # subclass chain with a cycle: c1 -> c2 -> c3 -> c1 ; d1 -> d2
    ("c1", "rdfs:subClassOf", "c2", False, "g"),
    ("c2", "rdfs:subClassOf", "c3", False, "g"),
    ("c3", "rdfs:subClassOf", "c1", False, "g"),
    ("d1", "rdfs:subClassOf", "d2", False, "g"),
    # types
    ("i1", "rdf:type", "c1", False, "g"),
    ("i2", "rdf:type", "d1", False, "g"),
    # labels (optional-side data: i1 has one, i2 doesn't)
    ("i1", "rdfs:label", "instance one", True, "g"),
    ("c1", "rdfs:label", "class one", True, "g"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_literal boolean, graph string"
    )


def test_bgp_single_pattern_scan(triples):
    # B1: ?s ?p ?o full scan with variable renaming
    out = bgp(triples, [(Var("s"), Var("p"), Var("o"))])
    assert out.columns == ["s", "p", "o"]
    assert out.count() == len(TRIPLES)


def test_bgp_constant_filter(triples):
    # B2: pattern lookup with constants
    out = bgp(triples, [(Var("s"), "rdf:type", Var("c"))])
    assert {(r.s, r.c) for r in out.collect()} == {("i1", "c1"), ("i2", "d1")}


def test_bgp_multi_pattern_join(triples):
    # B3: shared-variable join: instances of classes that have labels
    out = bgp(
        triples,
        [
            (Var("i"), "rdf:type", Var("c")),
            (Var("c"), "rdfs:label", Var("lbl")),
        ],
    )
    assert {(r.i, r.c, r.lbl) for r in out.collect()} == {("i1", "c1", "class one")}


def test_optional_left_join(triples):
    # B4: the reference's OPTIONAL test — keep all typed things, null label
    base = bgp(triples, [(Var("s"), "rdf:type", Var("c"))])
    opt = bgp(triples, [(Var("s"), "rdfs:label", Var("label"))])
    out = {(r.s, r.label) for r in optional(base, opt).collect()}
    assert out == {("i1", "instance one"), ("i2", None)}


def test_path_alternation(triples):
    # B5: (rdf:type|rdfs:subClassOf)
    out = path_alternation(triples, ["rdf:type", "rdfs:subClassOf"])
    assert out.count() == 6


def test_path_closure_with_cycle(spark, triples):
    # B6: (rdf:type|rdfs:subClassOf)* — reachability incl. zero-step,
    # cycle must not loop forever
    out = path_closure(triples, ["rdf:type", "rdfs:subClassOf"])
    pairs = {(r.s, r.o) for r in out.collect()}
    # transitivity through the chain: i1 -> c1 -> c2 -> c3 (-> c1 cycle)
    assert ("i1", "c3") in pairs
    assert ("c1", "c1") in pairs  # via cycle AND zero-step
    assert ("i2", "d2") in pairs
    # zero-step for every node incl. pure objects
    assert ("d2", "d2") in pairs


def test_transitive_closure_chain_depth(spark):
    # binary-tree parent edges: closure must reach the root from every leaf
    edges = spark.createDataFrame(
        [(str(i), str(i // 2)) for i in range(2, 64)], "s string, o string"
    )
    out = transitive_closure(edges, include_zero_step=False)
    pairs = {(r.s, r.o) for r in out.collect()}
    assert ("63", "1") in pairs
    assert ("33", "1") in pairs


def test_group_count(triples):
    # B7: SELECT (COUNT(?o) AS ?count) ?p GROUP BY ?p
    b = bgp(triples, [(Var("s"), Var("p"), Var("o"))])
    out = {(r.p, r["count"]) for r in group_count(b, "p", "o").collect()}
    assert out == {("rdfs:subClassOf", 4), ("rdf:type", 2), ("rdfs:label", 2)}


def test_select_star_limit(triples):
    # B9: default app query LIMIT 50
    assert select_star_limit(triples, 3).count() == 3
    assert select_star_limit(triples, 50).count() == len(TRIPLES)


def test_top_k(triples):
    # B11: top-k by count
    b = bgp(triples, [(Var("s"), Var("p"), Var("o"))])
    counts = group_count(b, "p", "o")
    top = top_k(counts, "count", 1).collect()
    assert top[0].p == "rdfs:subClassOf"
