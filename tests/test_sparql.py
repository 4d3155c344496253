"""SPARQL front-end parity: the reference's four canned queries run
verbatim (docs/test HTML/SPARQL.html:241-283, docs/scripts/app.js:100-104)
over a known graph, plus rewrite-rule coverage ('a' keyword, CURIE
expansion, constants, ORDER BY)."""

import pytest
from pyspark.sql import functions as F

from graphforge_spark.plans.sparql import sparql_query

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"

TRIPLES = [
    # subclass chain A ⊂ B ⊂ C and a type edge
    ("http://ex.org/A", RDFS + "subClassOf", "http://ex.org/B", False),
    ("http://ex.org/B", RDFS + "subClassOf", "http://ex.org/C", False),
    ("http://ex.org/x", RDF + "type", "http://ex.org/A", False),
    # a fact with an optional annotation on one subject only
    ("http://ex.org/x", "http://ex.org/p/likes", "http://ex.org/y", False),
    ("http://ex.org/y", "http://ex.org/p/likes", "http://ex.org/z", False),
    ("http://ex.org/x", "http://example.org/optionalPredicate", "note", True),
]


@pytest.fixture(scope="module")
def graph(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_literal boolean"
    )


def test_default_query_select_star_limit(graph):
    # docs/scripts/app.js:100-104, verbatim
    q = """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
SELECT *
WHERE   {
        ?s ?p ?o .
        } LIMIT 50"""
    out = sparql_query(graph, q)
    assert set(out.columns) == {"s", "p", "o"}
    assert out.count() == len(TRIPLES)  # < LIMIT


def test_optional_query(graph):
    # docs/test HTML/SPARQL.html:241-254, verbatim shape
    q = """
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        SELECT ?s ?p ?o ?optional
        WHERE {
            ?s ?p ?o .
            OPTIONAL { ?s <http://example.org/optionalPredicate> ?optional }
        }
    """
    rows = sparql_query(graph, q).collect()
    assert len(rows) == len(TRIPLES)
    by_subj = {(r.s, r.p): r.optional for r in rows}
    assert by_subj[("http://ex.org/x", "http://ex.org/p/likes")] == "note"
    assert by_subj[("http://ex.org/y", "http://ex.org/p/likes")] is None


def test_property_path_query(graph):
    # docs/test HTML/SPARQL.html:256-267, verbatim
    q = """
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
SELECT ?s ?o
WHERE {
?s (rdf:type|rdfs:subClassOf)* ?o .
}
    """
    pairs = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    # transitive: x →type A →sub B →sub C
    assert ("http://ex.org/x", "http://ex.org/C") in pairs
    assert ("http://ex.org/A", "http://ex.org/C") in pairs
    # reflexive zero-step
    assert ("http://ex.org/A", "http://ex.org/A") in pairs
    # non-path predicates excluded
    assert ("http://ex.org/x", "http://ex.org/y") not in pairs


def test_aggregation_query(graph):
    # docs/test HTML/SPARQL.html:269-283, verbatim shape
    q = """
        PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
        PREFIX ex: <http://example.org/>
        SELECT (COUNT(?o) AS ?count) ?p
        WHERE {
            ?s ?p ?o
        }
        GROUP BY ?p
    """
    counts = {r.p: r["count"] for r in sparql_query(graph, q).collect()}
    assert counts[RDFS + "subClassOf"] == 2
    assert counts["http://ex.org/p/likes"] == 2
    assert counts[RDF + "type"] == 1


def test_a_keyword_and_constant_object(graph):
    out = sparql_query(graph, "SELECT ?s WHERE { ?s a <http://ex.org/A> }")
    assert [r.s for r in out.collect()] == ["http://ex.org/x"]


def test_curie_constants_and_order_by(graph):
    q = """
        SELECT ?s ?o WHERE { ?s rdfs:subClassOf ?o } ORDER BY DESC(?s) LIMIT 1
    """
    rows = sparql_query(graph, q).collect()
    assert rows == [rows[0]]
    assert rows[0].s == "http://ex.org/B"


def test_multi_pattern_join(graph):
    q = "SELECT ?a ?c WHERE { ?a <http://ex.org/p/likes> ?b . ?b <http://ex.org/p/likes> ?c }"
    rows = sparql_query(graph, q).collect()
    assert {(r.a, r.c) for r in rows} == {("http://ex.org/x", "http://ex.org/z")}


def test_select_distinct(graph):
    q = "SELECT DISTINCT ?p WHERE { ?s ?p ?o }"
    preds = [r.p for r in sparql_query(graph, q).collect()]
    assert len(preds) == len(set(preds)) == 4
    # bag projection without DISTINCT keeps duplicates
    assert sparql_query(graph, "SELECT ?p WHERE { ?s ?p ?o }").count() == len(TRIPLES)


def test_filter_comparison_and_functions(graph):
    q = """SELECT ?s ?o WHERE {
             ?s <http://ex.org/p/likes> ?o .
             FILTER(STRSTARTS(?o, "http://ex.org/y") && ?s != ?o)
           }"""
    rows = sparql_query(graph, q).collect()
    assert {(r.s, r.o) for r in rows} == {("http://ex.org/x", "http://ex.org/y")}

    q2 = 'SELECT ?s WHERE { ?s ?p ?o . FILTER(REGEX(?o, "^note$")) }'
    assert [r.s for r in sparql_query(graph, q2).collect()] == ["http://ex.org/x"]

    q3 = 'SELECT ?s WHERE { ?s ?p ?o . FILTER(CONTAINS(?o, "ot") && ?p = <http://example.org/optionalPredicate>) }'
    assert [r.s for r in sparql_query(graph, q3).collect()] == ["http://ex.org/x"]


def test_filter_numeric_comparison(spark):
    g = spark.createDataFrame(
        [("a", "http://ex.org/p/age", "30", True), ("b", "http://ex.org/p/age", "7", True)],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    # numeric compare must cast (string '7' > '30' lexicographically!)
    q = "SELECT ?s WHERE { ?s <http://ex.org/p/age> ?age . FILTER(?age > 10) }"
    assert [r.s for r in sparql_query(g, q).collect()] == ["a"]


def test_filter_on_unbound_optional_var_drops_row(graph):
    # SPARQL error-eliminates-row: comparison on unbound var removes the row
    q = """SELECT ?s ?note WHERE {
             ?s <http://ex.org/p/likes> ?o .
             OPTIONAL { ?s <http://example.org/optionalPredicate> ?note }
             FILTER(?note = "note")
           }"""
    rows = sparql_query(graph, q).collect()
    assert [r.s for r in rows] == ["http://ex.org/x"]
    # BOUND works on the null-extended column
    qb = """SELECT ?s WHERE {
              ?s <http://ex.org/p/likes> ?o .
              OPTIONAL { ?s <http://example.org/optionalPredicate> ?note }
              FILTER(!BOUND(?note))
            }"""
    assert [r.s for r in sparql_query(graph, qb).collect()] == ["http://ex.org/y"]


def test_multi_pattern_optional(graph):
    # OPTIONAL with two patterns: both must match for the extension to bind
    q = """SELECT ?s ?c WHERE {
             ?s <http://ex.org/p/likes> ?o .
             OPTIONAL { ?s rdf:type ?t . ?t rdfs:subClassOf ?c }
           }"""
    rows = {(r.s, r.c) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/x", "http://ex.org/B"), ("http://ex.org/y", None)}


def test_union_two_arms(graph):
    q = """SELECT ?s ?o WHERE {
             { ?s rdfs:subClassOf ?o } UNION { ?s rdf:type ?o }
           }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/A", "http://ex.org/B"),
        ("http://ex.org/B", "http://ex.org/C"),
        ("http://ex.org/x", "http://ex.org/A"),
    }


def test_union_null_extends_mismatched_vars(graph):
    q = """SELECT ?s ?o ?note WHERE {
             { ?s <http://ex.org/p/likes> ?o }
             UNION { ?s <http://example.org/optionalPredicate> ?note }
           }"""
    rows = sparql_query(graph, q).collect()
    assert len(rows) == 3
    notes = {r.note for r in rows}
    assert "note" in notes and None in notes


def test_union_three_arms_bag_semantics(graph):
    q = """SELECT ?s WHERE {
             { ?s rdf:type ?o } UNION { ?s rdf:type ?o } UNION { ?s rdfs:subClassOf ?o }
           }"""
    rows = [r.s for r in sparql_query(graph, q).collect()]
    # bag union: the duplicated arm contributes twice
    assert sorted(rows).count("http://ex.org/x") == 2
    assert len(rows) == 4


def test_aggregates_sum_min_max(spark):
    g = spark.createDataFrame(
        [
            ("a", "http://p/v", "10", True),
            ("a", "http://p/v", "3", True),
            ("b", "http://p/v", "5", True),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    q = """SELECT (SUM(?v) AS ?total) (MIN(?v) AS ?lo) (MAX(?v) AS ?hi)
                  (COUNT(?v) AS ?n) (AVG(?v) AS ?mean) ?s
           WHERE { ?s <http://p/v> ?v } GROUP BY ?s"""
    rows = {r.s: r for r in sparql_query(g, q).collect()}
    assert rows["a"].total == 13.0 and rows["a"].n == 2
    assert rows["a"].mean == 6.5
    # MIN/MAX compare the STRING terms (SPARQL natural ordering on our
    # stringly-typed store): '10' < '3' lexicographically
    assert rows["a"].lo == "10" and rows["a"].hi == "3"
    assert rows["b"].total == 5.0 and rows["b"].mean == 5.0


def test_count_star_and_distinct_aggregates(spark):
    g = spark.createDataFrame(
        [
            ("a", "http://p/v", "1", True),
            ("a", "http://p/v", "2", True),
            ("a", "http://p/w", "2", True),
            ("b", "http://p/v", "2", True),
            ("b", "http://p/v", "2.5", True),
            ("b", "http://p/v", "x", True),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    # COUNT(*) counts solutions — including ones OPTIONAL null-extends
    q = """SELECT ?s (COUNT(*) AS ?n) WHERE {
             ?s <http://p/v> ?v . OPTIONAL { ?s <http://p/w> ?w }
           } GROUP BY ?s"""
    rows = {r.s: r.n for r in sparql_query(g, q).collect()}
    assert rows == {"a": 2, "b": 3}
    # ungrouped COUNT(*) = total solution count
    q = "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }"
    assert sparql_query(g, q).collect()[0].n == 6
    # DISTINCT inside aggregates: COUNT dedupes lexical terms; SUM/AVG
    # dedupe numeric values after the cast (SQL SUM(DISTINCT CAST(..)));
    # non-numerics are eliminated before SUM/AVG per spec
    q = """SELECT ?s (COUNT(DISTINCT ?v) AS ?n) (SUM(DISTINCT ?v) AS ?sm)
                  (AVG(DISTINCT ?v) AS ?av)
           WHERE { ?s <http://p/v> ?v } GROUP BY ?s"""
    rows = {r.s: r for r in sparql_query(g, q).collect()}
    assert rows["a"].n == 2 and rows["a"].sm == 3.0 and rows["a"].av == 1.5
    assert rows["b"].n == 3 and rows["b"].sm == 4.5 and rows["b"].av == 2.25
    # GROUP_CONCAT(DISTINCT ...) dedupes lexical terms, sorted join
    q = """SELECT (GROUP_CONCAT(DISTINCT ?v; SEPARATOR="|") AS ?c)
           WHERE { ?s <http://p/v> ?v }"""
    assert sparql_query(g, q).collect()[0].c == "1|2|2.5|x"
    # HAVING / ORDER BY accept the COUNT(*) and DISTINCT call forms
    q = """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s
           HAVING (COUNT(*) >= 3) ORDER BY DESC(COUNT(*)) ?s"""
    assert [r.s for r in sparql_query(g, q).collect()] == ["a", "b"]
    # loud refusal: *-form outside COUNT
    with pytest.raises(ValueError, match=r"SUM\(\*\)"):
        sparql_query(g, "SELECT (SUM(*) AS ?n) WHERE { ?s ?p ?o }")
    # COUNT(DISTINCT *) counts distinct SOLUTIONS: a duplicated UNION arm
    # contributes once to the distinct count, twice to COUNT(*)
    q = """SELECT (COUNT(DISTINCT *) AS ?d) (COUNT(*) AS ?n) WHERE {
             { ?s <http://p/v> ?v } UNION { ?s <http://p/v> ?v }
           }"""
    row = sparql_query(g, q).collect()[0]
    assert row.d == 5 and row.n == 10
    # null-extended solutions count too (countDistinct over bare columns
    # would drop them): b-rows bind no ?w, and (b,2,NULL) ≠ (b,2.5,NULL),
    # so all 5 solutions (2 with ?w bound, 3 null-extended) survive
    q = """SELECT (COUNT(DISTINCT *) AS ?d) WHERE {
             ?s <http://p/v> ?v . OPTIONAL { ?s <http://p/w> ?w }
           }"""
    assert sparql_query(g, q).collect()[0].d == 5
    # grouped form: distinct solutions per group
    q = """SELECT ?s (COUNT(DISTINCT *) AS ?d) WHERE {
             { ?s <http://p/v> ?v } UNION { ?s <http://p/v> ?v }
           } GROUP BY ?s"""
    rows = {r.s: r.d for r in sparql_query(g, q).collect()}
    assert rows == {"a": 2, "b": 3}


def test_path_one_or_more_and_zero_or_one(graph):
    # + excludes the reflexive pairs * includes
    q_plus = "SELECT ?s ?o WHERE { ?s (rdfs:subClassOf)+ ?o }"
    plus = {(r.s, r.o) for r in sparql_query(graph, q_plus).collect()}
    assert plus == {
        ("http://ex.org/A", "http://ex.org/B"),
        ("http://ex.org/B", "http://ex.org/C"),
        ("http://ex.org/A", "http://ex.org/C"),
    }
    q_opt = "SELECT ?s ?o WHERE { ?s rdfs:subClassOf? ?o }"
    zoo = {(r.s, r.o) for r in sparql_query(graph, q_opt).collect()}
    assert ("http://ex.org/A", "http://ex.org/B") in zoo  # one step
    assert ("http://ex.org/A", "http://ex.org/A") in zoo  # zero step
    assert ("http://ex.org/A", "http://ex.org/C") not in zoo  # not two steps


def test_path_inverse_and_sequence(graph):
    # inverse: ^likes traverses object→subject
    q_inv = "SELECT ?s ?o WHERE { ?s (^<http://ex.org/p/likes>) ?o }"
    inv = {(r.s, r.o) for r in sparql_query(graph, q_inv).collect()}
    assert ("http://ex.org/y", "http://ex.org/x") in inv
    # sequence: type/subClassOf = superclass of x's class
    q_seq = "SELECT ?s ?o WHERE { ?s (rdf:type/rdfs:subClassOf) ?o }"
    seq = {(r.s, r.o) for r in sparql_query(graph, q_seq).collect()}
    assert seq == {("http://ex.org/x", "http://ex.org/B")}


def test_bare_starred_curie_is_a_path(graph):
    # regression: a bare suffixed curie must compile as a path, not a
    # constant predicate named '…#type*'
    q = "SELECT ?s ?o WHERE { ?s rdf:type* ?o }"
    pairs = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert ("http://ex.org/x", "http://ex.org/A") in pairs
    assert ("http://ex.org/x", "http://ex.org/x") in pairs  # reflexive


def test_minus_removes_compatible_bindings(graph):
    q = """SELECT ?s ?o WHERE {
             ?s ?p ?o .
             MINUS { ?s rdfs:subClassOf ?o }
           }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert ("http://ex.org/A", "http://ex.org/B") not in rows
    assert ("http://ex.org/x", "http://ex.org/y") in rows
    assert len(rows) == len(TRIPLES) - 2


def test_minus_no_shared_vars_is_noop(graph):
    q = """SELECT ?s WHERE {
             ?s <http://ex.org/p/likes> ?o .
             MINUS { ?a rdfs:subClassOf ?b }
           }"""
    assert sparql_query(graph, q).count() == 2  # nothing removed


def test_values_single_var(graph):
    q = """SELECT ?s ?o WHERE {
             VALUES ?s { <http://ex.org/x> <http://ex.org/nosuch> }
             ?s <http://ex.org/p/likes> ?o .
           }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/x", "http://ex.org/y")}


def test_values_multi_var(graph):
    q = """SELECT ?s ?o WHERE {
             VALUES (?s ?o) {
               (<http://ex.org/x> <http://ex.org/y>)
               (<http://ex.org/x> <http://ex.org/z>)
             }
             ?s <http://ex.org/p/likes> ?o .
           }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/x", "http://ex.org/y")}


def test_values_bad_arity_is_loud(graph):
    with pytest.raises(ValueError):
        sparql_query(
            graph,
            'SELECT ?s WHERE { VALUES (?s ?o) { (<http://e/1>) } ?s ?p ?o }',
        )


def test_graph_constant_constraint(spark):
    quads = spark.createDataFrame(
        [
            ("http://e/a", "http://p/x", "http://e/b", False, "g1"),
            ("http://e/c", "http://p/x", "http://e/d", False, "g2"),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, graph string",
    )
    q = "SELECT ?s ?o WHERE { GRAPH <g1> { ?s <http://p/x> ?o } }"
    rows = sparql_query(quads, q).collect()
    assert {(r.s, r.o) for r in rows} == {("http://e/a", "http://e/b")}
    # GRAPH ?var binds the graph column as a variable
    gq = "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://p/x> ?o } }"
    grows = {(r.g, r.s) for r in sparql_query(quads, gq).collect()}
    assert grows == {("g1", "http://e/a"), ("g2", "http://e/c")}
    # GRAPH over a store lacking the graph column is loud, not wrong
    with pytest.raises(ValueError):
        sparql_query(
            quads.drop("graph"), "SELECT ?s WHERE { GRAPH <g1> { ?s ?p ?o } }"
        )


def test_bind_concat(graph):
    q = """SELECT ?s ?pair WHERE {
             ?s <http://ex.org/p/likes> ?o .
             BIND(CONCAT(?s, "->", STR(?o)) AS ?pair)
           }"""
    rows = {(r.s, r.pair) for r in sparql_query(graph, q).collect()}
    assert all(p == f"{s}->" + p.split("->")[1] for s, p in rows) and rows
    # BIND target must be a fresh variable
    with pytest.raises(ValueError):
        sparql_query(
            graph, 'SELECT ?s WHERE { ?s ?p ?o . BIND("x" AS ?o) }'
        )


def test_filter_exists_and_not_exists(spark):
    t = spark.createDataFrame(
        [("a", "w", "o1"), ("b", "w", "o2"), ("o1", "l", "r1")],
        "subj string, pred string, obj string",
    )
    ex = sparql_query(
        t, "SELECT ?s WHERE { ?s <w> ?o . FILTER EXISTS { ?o <l> ?r } }"
    ).collect()
    assert {r.s for r in ex} == {"a"}
    nex = sparql_query(
        t, "SELECT ?s WHERE { ?s <w> ?o . FILTER NOT EXISTS { ?o <l> ?r } }"
    ).collect()
    assert {r.s for r in nex} == {"b"}
    # an uncorrelated EXISTS (no shared variable) is loud, not a constant
    with pytest.raises(ValueError):
        sparql_query(
            t, "SELECT ?s WHERE { ?s <w> ?o . FILTER EXISTS { ?m <y> ?n } }"
        )


def test_filter_or_and_grouping(spark):
    t = spark.createDataFrame(
        [("a", "w", "o1"), ("b", "w", "o2"), ("c", "w", "o3")],
        "subj string, pred string, obj string",
    )
    q = """SELECT ?s WHERE { ?s <w> ?o .
             FILTER((?o = "o1" || ?o = "o2") && ?s != "b") }"""
    assert {r.s for r in sparql_query(t, q).collect()} == {"a"}
    # quoted ')' and '&&' inside a REGEX argument must not derail parsing
    q2 = 'SELECT ?s WHERE { ?s <w> ?o . FILTER(REGEX(?o, "[)]|o3|a&&b")) }'
    assert {r.s for r in sparql_query(t, q2).collect()} == {"c"}


def test_union_compatible_mapping_join(spark):
    # a null-extended UNION variable shared with another pattern joins
    # with SPARQL compatible-mapping semantics: unbound matches anything
    t = spark.createDataFrame(
        [("a", "w", "o1"), ("b", "x", "q1"), ("q1", "y", "z1")],
        "subj string, pred string, obj string",
    )
    q = """SELECT ?s ?q ?z WHERE {
             { ?s <w> ?o } UNION { ?s <x> ?q }
             ?q <y> ?z .
           }"""
    rows = {(r.s, r.q, r.z) for r in sparql_query(t, q).collect()}
    assert rows == {("a", "q1", "z1"), ("b", "q1", "z1")}


def test_iri_with_keyword_segment_accepted(graph):
    # <http://ex.org/ASK> must not false-positive the unsupported scan
    q = "SELECT ?s WHERE { ?s ?p ?o . FILTER(?o != <http://ex.org/ASK>) }"
    assert sparql_query(graph, q).count() > 0


def test_aggregate_unprojectable_var_is_loud(graph):
    with pytest.raises(ValueError):
        sparql_query(
            graph,
            "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p",
        )


def test_having(spark):
    t = spark.createDataFrame(
        [("a", "p1", "x"), ("b", "p1", "y"), ("c", "p2", "z")],
        "subj string, pred string, obj string",
    )
    # aggregate-call form rewrites to the projection alias
    q = """SELECT (COUNT(?o) AS ?n) ?p WHERE { ?s ?p ?o }
           GROUP BY ?p HAVING (COUNT(?o) > 1)"""
    rows = sparql_query(t, q).collect()
    assert [(r.p, r.n) for r in rows] == [("p1", 2)]
    # alias form works too
    q2 = """SELECT (COUNT(?o) AS ?n) ?p WHERE { ?s ?p ?o }
            GROUP BY ?p HAVING (?n = 1)"""
    assert [(r.p, r.n) for r in sparql_query(t, q2).collect()] == [("p2", 1)]


def test_offset_slices_ordered_solutions(spark):
    t = spark.createDataFrame(
        [(f"s{i}", "p", f"o{i}") for i in range(10)],
        "subj string, pred string, obj string",
    )
    q = "SELECT ?s WHERE { ?s <p> ?o } ORDER BY ?s LIMIT 3 OFFSET 4"
    assert [r.s for r in sparql_query(t, q).collect()] == ["s4", "s5", "s6"]


def test_ask_true_and_false(graph):
    assert sparql_query(
        graph, "ASK { ?s <http://ex.org/p/likes> ?o }"
    ).collect()[0].ask is True
    assert sparql_query(
        graph, 'ASK WHERE { ?s <http://ex.org/p/nope> ?o }'
    ).collect()[0].ask is False
    # ASK over a full group (filter + optional) still boolean
    assert sparql_query(
        graph,
        'ASK { ?s ?p ?o . FILTER(CONTAINS(?o, "ex.org")) }',
    ).collect()[0].ask is True


def test_construct_instantiates_template(graph):
    q = """
        PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
        CONSTRUCT {
            ?sub <http://ex.org/p/ancestor> ?sup .
            ?sub <http://ex.org/p/marked> "yes"
        }
        WHERE { ?sub rdfs:subClassOf ?sup }
    """
    rows = {(r.subj, r.pred, r.obj) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/A", "http://ex.org/p/ancestor", "http://ex.org/B"),
        ("http://ex.org/B", "http://ex.org/p/ancestor", "http://ex.org/C"),
        ("http://ex.org/A", "http://ex.org/p/marked", "yes"),
        ("http://ex.org/B", "http://ex.org/p/marked", "yes"),
    }
    out = sparql_query(graph, q)
    assert out.columns == ["subj", "pred", "obj"]


def test_construct_unbound_optional_var_emits_no_triple(graph):
    # solutions where ?note is unbound must not produce a half-null triple
    q = """
        CONSTRUCT { ?s <http://ex.org/p/note> ?note }
        WHERE {
            ?s <http://ex.org/p/likes> ?o .
            OPTIONAL { ?s <http://example.org/optionalPredicate> ?note }
        }
    """
    rows = {(r.subj, r.obj) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/x", "note")}


def test_construct_distinct_set_semantics(graph):
    # two solutions instantiate the SAME template triple → one output row
    q = """
        CONSTRUCT { ?s <http://ex.org/p/active> "true" }
        WHERE { ?s ?p ?o . FILTER(?s = <http://ex.org/x>) }
    """
    rows = sparql_query(graph, q).collect()
    assert len(rows) == 1


def test_group_concat_and_sample(graph):
    q = """
        SELECT ?s (GROUP_CONCAT(?o; SEPARATOR="|") AS ?objs) (SAMPLE(?o) AS ?one)
        WHERE { ?s <http://ex.org/p/likes> ?o } GROUP BY ?s ORDER BY ?s
    """
    rows = sparql_query(graph, q).collect()
    assert [(r.s, r.objs, r.one) for r in rows] == [
        ("http://ex.org/x", "http://ex.org/y", "http://ex.org/y"),
        ("http://ex.org/y", "http://ex.org/z", "http://ex.org/z"),
    ]
    # default separator is a single space; elements sort lexicographically
    q2 = """
        SELECT (GROUP_CONCAT(?o) AS ?all) WHERE { ?s <http://ex.org/p/likes> ?o }
    """
    assert sparql_query(graph, q2).collect()[0].all == (
        "http://ex.org/y http://ex.org/z"
    )


def test_filter_in_and_not_in(graph):
    q = """
        SELECT ?s WHERE {
            ?s <http://ex.org/p/likes> ?o .
            FILTER(?o IN (<http://ex.org/y>, "never"))
        }
    """
    assert [r.s for r in sparql_query(graph, q).collect()] == ["http://ex.org/x"]
    q2 = """
        SELECT ?s WHERE {
            ?s <http://ex.org/p/likes> ?o .
            FILTER(?o NOT IN (<http://ex.org/y>))
        }
    """
    assert [r.s for r in sparql_query(graph, q2).collect()] == ["http://ex.org/y"]


def test_filter_expression_operands_and_strends(graph):
    got = {
        r.o
        for r in sparql_query(
            graph,
            'SELECT ?o WHERE { ?s ?p ?o . FILTER(STRLEN(?o) = 4) }',
        ).collect()
    }
    assert got == {"note"}
    got = {
        r.s
        for r in sparql_query(
            graph,
            'SELECT ?s WHERE { ?s ?p ?o . FILTER(STRENDS(?o, "/z")) }',
        ).collect()
    }
    assert got == {"http://ex.org/y"}
    # nested call in an operand
    got = {
        r.o
        for r in sparql_query(
            graph,
            'SELECT ?o WHERE { ?s ?p ?o . FILTER(STRLEN(STR(?o)) = 4) }',
        ).collect()
    }
    assert got == {"note"}


def test_bind_scalar_functions(graph):
    q = """
        SELECT ?u ?l ?sub ?rep ?fb ?cls WHERE {
            ?s <http://ex.org/p/likes> ?o .
            OPTIONAL { ?s <http://example.org/optionalPredicate> ?note }
            BIND(UCASE(?note) AS ?u)
            BIND(LCASE("MIXED") AS ?l)
            BIND(SUBSTR(?o, 8, 6) AS ?sub)
            BIND(REPLACE(?o, "http://", "") AS ?rep)
            BIND(COALESCE(?note, "none") AS ?fb)
            BIND(IF(BOUND(?note), "annotated", "bare") AS ?cls)
        } ORDER BY ?s
    """
    rows = sparql_query(graph, q).collect()
    assert [(r.u, r.l, r.sub, r.rep, r.fb, r.cls) for r in rows] == [
        ("NOTE", "mixed", "ex.org", "ex.org/y", "note", "annotated"),
        (None, "mixed", "ex.org", "ex.org/z", "none", "bare"),
    ]


@pytest.mark.parametrize(
    "bad_query",
    [
        "SELECT ?s WHERE { ?s ?p ?o . ?s ?p2 ?o2 } UNION { ?a ?b ?c }",
        "SELECT ?s WHERE { ?s ?p ?o } HAVING (?s > 1)",
        "SELECT (COUNT(?o) AS ?n) ?p WHERE { ?s ?p ?o } GROUP BY ?p HAVING (SUM(?o) > 1)",
        "SELECT ?s bogus WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p ?o garbage garbage }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(NOW(?s) AS ?t) }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(UUID() AS ?t) }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(STRUUID() AS ?t) }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(RAND() AS ?t) }",
        "SELECT ?missing WHERE { ?s ?p ?o }",
        "DESCRIBE ?x",
        "DESCRIBE garbage here",
        "DESCRIBE ?missing WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { SERVICE <http://remote/sparql> { ?s ?p ?o } }",
        "CONSTRUCT { ?s ?p ?o } SELECT ?s",
        "CONSTRUCT { } WHERE { ?s ?p ?o }",
        "CONSTRUCT { ?s ?p ?missing } WHERE { ?s ?p ?o }",
        "SELECT ?s WHERE { ?s ?p ?o . FILTER(?s IN ()) }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(SUBSTR(?o) AS ?t) }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(IF(?o) AS ?t) }",
        "SELECT ?s WHERE { ?s ?p ?o . BIND(REPLACE(?o, ?o, ?o) AS ?t) }",
    ],
)
def test_unsupported_syntax_is_loud(graph, bad_query):
    with pytest.raises(ValueError):
        sparql_query(graph, bad_query)


def test_subquery_aggregate_joins_outer(graph):
    # inner: count likes per subject; outer: join the type edge back in
    q = """
        SELECT ?s ?n ?cls WHERE {
            ?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?cls .
            { SELECT ?s (COUNT(?o) AS ?n)
              WHERE { ?s <http://ex.org/p/likes> ?o } GROUP BY ?s }
        }
    """
    rows = [(r.s, r.n, r.cls) for r in sparql_query(graph, q).collect()]
    assert rows == [("http://ex.org/x", 1, "http://ex.org/A")]


def test_subquery_limit_applies_before_outer_join(graph):
    # the inner LIMIT slices the subquery's ORDERED solutions first
    q = """
        SELECT ?s ?o WHERE {
            ?s <http://ex.org/p/likes> ?o .
            { SELECT ?s WHERE { ?s <http://ex.org/p/likes> ?x }
              ORDER BY ?s LIMIT 1 }
        }
    """
    rows = [(r.s, r.o) for r in sparql_query(graph, q).collect()]
    assert rows == [("http://ex.org/x", "http://ex.org/y")]


def test_subquery_nullable_projection_joins_compatibly(graph):
    # the subquery projects an OPTIONAL (nullable) var; joining it to an
    # outer pattern must treat unbound as compatible, not drop the row
    q = """
        SELECT ?s ?note ?o WHERE {
            ?s <http://ex.org/p/likes> ?o .
            { SELECT ?s ?note WHERE {
                ?s <http://ex.org/p/likes> ?x .
                OPTIONAL { ?s <http://example.org/optionalPredicate> ?note }
            } }
        }
    """
    rows = {(r.s, r.note) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/x", "note"), ("http://ex.org/y", None)}


def test_subquery_nested_in_union_arm(graph):
    # a subquery inside a union arm compiles IN ARM SCOPE: the arm's
    # recursive compile extracts it at its own top level (inner ORDER
    # BY/LIMIT apply before the arm's solutions union in, bag semantics)
    q = """
        SELECT ?s WHERE {
            { { SELECT ?s WHERE { ?s <http://ex.org/p/likes> ?x }
                ORDER BY ?s LIMIT 1 } }
            UNION
            { ?s <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?c }
        }
    """
    rows = [r.s for r in sparql_query(graph, q).collect()]
    assert sorted(rows) == ["http://ex.org/x", "http://ex.org/x"]


def test_subquery_nested_in_optional(graph):
    # a subquery inside an OPTIONAL group: the group compiles recursively,
    # the subquery aggregates, and the left join null-extends the miss
    q = """
        SELECT ?s ?o ?n WHERE {
            ?s <http://ex.org/p/likes> ?o
            OPTIONAL { { SELECT ?o (COUNT(?z) AS ?n)
                         WHERE { ?o <http://ex.org/p/likes> ?z } GROUP BY ?o } }
        }
    """
    rows = {(r.s, r.o, r.n) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/x", "http://ex.org/y", 1),
        ("http://ex.org/y", "http://ex.org/z", None),
    }


def test_describe_iri_targets(graph):
    # fixed-resource DESCRIBE: all triples whose subject is a target
    out = sparql_query(graph, "DESCRIBE <http://ex.org/x> <http://ex.org/B>")
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert rows == {
        (s, p, o) for s, p, o, _ in TRIPLES if s in ("http://ex.org/x", "http://ex.org/B")
    }
    assert out.columns == ["subj", "pred", "obj"]


def test_describe_var_and_star(graph):
    # variable target: describe every ?s that likes something
    q = "DESCRIBE ?s WHERE { ?s <http://ex.org/p/likes> ?o }"
    rows = {r.subj for r in sparql_query(graph, q).collect()}
    assert rows == {"http://ex.org/x", "http://ex.org/y"}
    # DESCRIBE * — every binding of every variable that HAS subject triples
    q2 = "DESCRIBE * WHERE { ?a <http://ex.org/p/likes> ?b }"
    subs = {r.subj for r in sparql_query(graph, q2).collect()}
    assert subs == {"http://ex.org/x", "http://ex.org/y"}  # z has no subject rows


def test_describe_curie_target_expands(graph):
    q = "PREFIX ex: <http://ex.org/> DESCRIBE ex:A"
    rows = {(r.subj, r.obj) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/A", "http://ex.org/B")}


def test_select_reduced_executes_as_distinct(graph):
    q = "SELECT REDUCED ?p WHERE { ?s ?p ?o }"
    rows = [r.p for r in sparql_query(graph, q).collect()]
    assert sorted(rows) == sorted({p for _, p, _, _ in TRIPLES})


def test_term_type_filters(graph):
    # isIRI/isLiteral/isBlank use the engine's discriminator (the
    # reference's startsWith('http') rule, graphProcessor.js:222)
    iri = sparql_query(
        graph, "SELECT ?s ?o WHERE { ?s <http://ex.org/p/likes> ?o . FILTER(isIRI(?o)) }"
    ).count()
    assert iri == 2
    lit = sparql_query(
        graph, "SELECT ?s ?o WHERE { ?s ?p ?o . FILTER(isLiteral(?o)) }"
    ).collect()
    assert [(r.s, r.o) for r in lit] == [("http://ex.org/x", "note")]
    blank = sparql_query(
        graph, "SELECT ?s WHERE { ?s ?p ?o . FILTER(isBlank(?s)) }"
    ).count()
    assert blank == 0
    with pytest.raises(ValueError, match="single variable"):
        sparql_query(graph, 'SELECT ?s WHERE { ?s ?p ?o . FILTER(isIRI(?s, "x")) }')


def test_negated_property_set(graph):
    # !p keeps edges whose predicate is NOT p — one codegen NOT-IN filter
    out = sparql_query(
        graph, "SELECT ?s ?o WHERE { ?s !<http://ex.org/p/likes> ?o }"
    )
    assert out.count() == len(TRIPLES) - 2
    multi = sparql_query(
        graph,
        "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#> "
        "SELECT ?s ?o WHERE { ?s !(rdfs:subClassOf|<http://ex.org/p/likes>) ?o }",
    )
    assert multi.count() == len(TRIPLES) - 4
    # inverse members graduated to supported in r5 (see
    # test_negated_property_set_inverse_members); the pure-inverse set
    # here is the reversed complement scan
    inv = sparql_query(
        graph, "SELECT ?s ?o WHERE { ?s !(^<http://ex.org/p/likes>) ?o }"
    )
    assert inv.count() == len(TRIPLES) - 2


def test_optional_filter_scopes_to_group(graph):
    # the filter restricts the right side BEFORE the left join: x's
    # annotation fails the filter, so x survives with ?note unbound
    q = """SELECT ?s ?note WHERE {
        ?s <http://ex.org/p/likes> ?o .
        OPTIONAL { ?s <http://example.org/optionalPredicate> ?note . FILTER(?note != "note") }
    }"""
    rows = {r.s: r.note for r in sparql_query(graph, q).collect()}
    assert rows == {"http://ex.org/x": None, "http://ex.org/y": None}
    # a filter over left-side vars is a correlated join condition — loud
    with pytest.raises(ValueError, match="bind outside the group"):
        sparql_query(
            graph,
            """SELECT ?s WHERE { ?s <http://ex.org/p/likes> ?o .
               OPTIONAL { ?o <http://ex.org/p/likes> ?x . FILTER(?x != ?s) } }""",
        )


def test_order_by_multiple_keys(graph):
    q = """SELECT ?s ?o WHERE { ?s ?p ?o } ORDER BY DESC(?s) ?o"""
    rows = sparql_query(graph, q).collect()
    keys = [(r.s, r.o) for r in rows]
    assert keys == sorted(keys, key=lambda t: (tuple(-ord(c) for c in t[0]), t[1]))


def test_strbefore_strafter(graph):
    q = """SELECT ?o (STRBEFORE(?o, ":") AS ?scheme) (STRAFTER(?o, "ex.org/") AS ?local)
           WHERE { ?s <http://ex.org/p/likes> ?o } ORDER BY ?o"""
    rows = sparql_query(graph, q).collect()
    assert [(r.scheme, r.local) for r in rows] == [("http", "y"), ("http", "z")]
    # absent needle yields "" (SPARQL), not the input string
    q2 = 'SELECT (STRBEFORE("abc", "x") AS ?b) (STRAFTER("abc", "x") AS ?a) WHERE { ?s ?p ?o } LIMIT 1'
    r = sparql_query(graph, q2).collect()[0]
    assert (r.b, r.a) == ("", "")


def test_expression_projection_order_and_bind(graph):
    # (expr AS ?v) in SELECT is an implicit BIND; column order follows
    # the SELECT clause text
    q = """SELECT ?s (STRLEN(?o) AS ?n) ?o WHERE { ?s <http://ex.org/p/likes> ?o }"""
    out = sparql_query(graph, q)
    assert out.columns == ["s", "n", "o"]
    assert {r.n for r in out.collect()} == {len("http://ex.org/y"), len("http://ex.org/z")}


def test_nested_optional(graph):
    # A ⊂ B ⊂ C chain: nested OPTIONAL null-extends progressively
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?up ?upup WHERE {
        ?s rdfs:subClassOf ?o .
        OPTIONAL { ?o rdfs:subClassOf ?up . OPTIONAL { ?up rdfs:subClassOf ?upup } }
    }"""
    rows = {(r.s): (r.up, r.upup) for r in sparql_query(graph, q).collect()}
    assert rows == {
        "http://ex.org/A": ("http://ex.org/C", None),
        "http://ex.org/B": (None, None),
    }


def test_optional_not_bound_negation_idiom(graph):
    # the classic OPTIONAL + !BOUND negation: subclasses with no parent
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s WHERE {
        ?s rdfs:subClassOf ?o .
        OPTIONAL { ?o rdfs:subClassOf ?up }
        FILTER(!BOUND(?up))
    }"""
    rows = [r.s for r in sparql_query(graph, q).collect()]
    assert rows == ["http://ex.org/B"]


def test_optional_possibly_unbound_shared_var_compat(graph):
    # the optional group's ?x may be unbound (nested OPTIONAL binds it);
    # sharing it with the outer group takes the compatible-mapping left
    # join. Here no group solution shares ?s with the outer rows, so
    # every outer row passes through with its own ?x intact.
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?x WHERE {
        ?s rdfs:subClassOf ?x .
        OPTIONAL { ?s <http://ex.org/p/likes> ?v . OPTIONAL { ?v rdfs:subClassOf ?x } }
    }"""
    rows = {(r.s, r.x) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/A", "http://ex.org/B"),
        ("http://ex.org/B", "http://ex.org/C"),
    }


def test_optional_compat_left_join(spark):
    """LeftJoin with unbound-compatible shared variables — the SPARQL
    bottom-up semantics: an unbound ?m matches ANY group binding and
    takes the bound value."""
    t = spark.createDataFrame(
        [("s1", "p", "o1"), ("s2", "p", "o2"), ("s1", "q", "M"),
         ("M", "r", "X"), ("N", "r", "Y")],
        "subj string, pred string, obj string",
    )
    # chained OPTIONALs sharing ?m: s2's unbound ?m is compatible with
    # BOTH (M,X) and (N,Y); s1's bound M only with (M,X)
    q = """SELECT ?s ?m ?x WHERE {
        ?s <p> ?o OPTIONAL { ?s <q> ?m } OPTIONAL { ?m <r> ?x }
    }"""
    rows = {tuple(r) for r in sparql_query(t, q).collect()}
    assert rows == {("s1", "M", "X"), ("s2", "M", "X"), ("s2", "N", "Y")}
    # OUTER-side nullable shared var (UNION null-extension) + an
    # all-bound OPTIONAL: the unbound ?m must extend, not stay null
    # (the plain equi-join would silently keep it null)
    q2 = """SELECT ?s ?m WHERE {
        { ?s <p> ?o } UNION { ?s <t> ?m }
        OPTIONAL { ?s <q> ?m }
    }"""
    t2 = spark.createDataFrame(
        [("s1", "p", "o"), ("s1", "q", "M")],
        "subj string, pred string, obj string",
    )
    rows2 = {tuple(r) for r in sparql_query(t2, q2).collect()}
    assert rows2 == {("s1", "M")}
    # nested flat path: the inner group's nullable ?x shared with a
    # sibling nested OPTIONAL extends compatibly too
    t3 = spark.createDataFrame(
        [("s1", "q", "m1"), ("X", "u", "W")],
        "subj string, pred string, obj string",
    )
    q3 = """SELECT ?m ?x ?w WHERE {
        ?s <q> ?m OPTIONAL { ?m <r> ?x } OPTIONAL { ?x <u> ?w }
    }"""
    rows3 = {tuple(r) for r in sparql_query(t3, q3).collect()}
    assert rows3 == {("m1", "X", "W")}


def test_predicate_object_list_sugar(graph):
    # Turtle-style ';' shares the subject, ',' shares subject+predicate
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?up ?note WHERE {
        ?s rdfs:subClassOf ?up ; <http://example.org/optionalPredicate> ?note .
    }"""
    assert sparql_query(graph, q).count() == 0  # no subject has both
    q2 = """SELECT ?s WHERE {
        ?s <http://ex.org/p/likes> ?a , ?b . FILTER(?a != ?b)
    }"""
    # x likes only y; y likes only z — no subject likes two things
    assert sparql_query(graph, q2).count() == 0
    q3 = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?o ?up WHERE { ?s <http://ex.org/p/likes> ?o ; rdfs:subClassOf ?up }"""
    assert sparql_query(graph, q3).count() == 0


def test_bnode_property_list_sugar(graph):
    # [ p ?x ] allocates an existential join variable, hidden from SELECT *
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?x WHERE { ?s <http://ex.org/p/likes> [ <http://ex.org/p/likes> ?x ] }"""
    rows = [r.x for r in sparql_query(graph, q).collect()]
    assert rows == ["http://ex.org/z"]  # x likes y, y likes z
    star = sparql_query(
        graph,
        "SELECT * WHERE { ?s <http://ex.org/p/likes> [ <http://ex.org/p/likes> ?x ] }",
    )
    assert set(star.columns) == {"s", "x"}  # no _anon_ leakage
    with pytest.raises(ValueError, match="reserved"):
        sparql_query(graph, "SELECT ?s WHERE { ?s ?p ?_anon_0 }")


def test_path_sequence_with_leg_closure(graph):
    # the rdf:rest*/rdf:first shape: per-leg suffix inside a sequence
    q = """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?o WHERE { ?s (rdf:type/rdfs:subClassOf*) ?o . }"""
    pairs = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    # x →type A (zero subClassOf steps), →sub B, →sub C
    assert pairs == {
        ("http://ex.org/x", "http://ex.org/A"),
        ("http://ex.org/x", "http://ex.org/B"),
        ("http://ex.org/x", "http://ex.org/C"),
    }


def test_path_mixed_alt_and_seq(graph):
    # (likes/likes)|rdf:type — mixing / and | used to raise
    q = """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    SELECT ?s ?o WHERE {
        ?s ((<http://ex.org/p/likes>/<http://ex.org/p/likes>)|rdf:type) ?o .
    }"""
    pairs = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert pairs == {
        ("http://ex.org/x", "http://ex.org/z"),  # likes/likes
        ("http://ex.org/x", "http://ex.org/A"),  # type
    }


def test_path_closure_of_group_sequence(graph):
    # ((type|subClassOf)/(type|subClassOf))+ : even-length chains only
    q = """PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?o WHERE {
        ?s ((rdf:type|rdfs:subClassOf)/(rdf:type|rdfs:subClassOf))+ ?o .
    }"""
    pairs = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    # chains: x→A→B (len 2), A→B→C (len 2), x→A→B→C (len 3, excluded)
    assert pairs == {
        ("http://ex.org/x", "http://ex.org/B"),
        ("http://ex.org/A", "http://ex.org/C"),
    }


def test_path_inverse_of_group(graph):
    # ^(likes/likes) == inverse of the 2-hop walk
    q = """SELECT ?s ?o WHERE { ?s ^(<http://ex.org/p/likes>/<http://ex.org/p/likes>) ?o . }"""
    pairs = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert pairs == {("http://ex.org/z", "http://ex.org/x")}


def test_path_bare_iri_suffix(graph):
    # suffix directly on a <iri> without parens
    q = """SELECT ?o WHERE { <http://ex.org/x> <http://ex.org/p/likes>+ ?o . }"""
    vals = {r.o for r in sparql_query(graph, q).collect()}
    assert vals == {"http://ex.org/y", "http://ex.org/z"}


def test_path_seq_leg_optional_suffix(graph):
    # likes/likes? — one or two hops
    q = """SELECT ?o WHERE { <http://ex.org/x> (<http://ex.org/p/likes>/<http://ex.org/p/likes>?) ?o . }"""
    vals = {r.o for r in sparql_query(graph, q).collect()}
    assert vals == {"http://ex.org/y", "http://ex.org/z"}


def test_path_errors_still_loud(graph):
    with pytest.raises(ValueError, match="double path suffix"):
        sparql_query(graph, "SELECT ?o WHERE { ?s (<http://e/p>*+) ?o }")
    with pytest.raises(ValueError, match="predicate slot"):
        sparql_query(graph, "SELECT ?s WHERE { ?s <http://e/p> <http://e/q>* }")
    # inverse members graduated to supported in r5; the empty set stays loud
    with pytest.raises(ValueError, match="empty negated"):
        sparql_query(graph, "SELECT ?s WHERE { ?s !() ?o }")


def test_path_inside_optional(graph):
    # every subject gets its transitive superclass set, optionally
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
    SELECT ?s ?super WHERE {
        ?s rdf:type ?t .
        OPTIONAL { ?t rdfs:subClassOf+ ?super }
    }"""
    rows = {(r.s, r.super) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/x", "http://ex.org/B"),
        ("http://ex.org/x", "http://ex.org/C"),
    }
    # and an optional path with no match null-extends instead of dropping
    q2 = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?v WHERE {
        ?s <http://ex.org/p/likes> ?o .
        OPTIONAL { ?s rdfs:subClassOf+ ?v }
    }"""
    rows2 = {(r.s, r.v) for r in sparql_query(graph, q2).collect()}
    assert rows2 == {("http://ex.org/x", None), ("http://ex.org/y", None)}


def test_path_inside_union(graph):
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s ?o WHERE {
        { ?s rdfs:subClassOf+ ?o } UNION { ?s <http://ex.org/p/likes> ?o }
    }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert ("http://ex.org/A", "http://ex.org/C") in rows  # closure arm
    assert ("http://ex.org/x", "http://ex.org/y") in rows  # plain arm


def test_path_inside_minus_and_exists(graph):
    # MINUS a closure: subjects reaching C transitively are removed
    q = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s WHERE {
        ?s rdfs:subClassOf ?o .
        MINUS { ?s rdfs:subClassOf+ <http://ex.org/C> }
    }"""
    assert {r.s for r in sparql_query(graph, q).collect()} == set()
    q2 = """PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
    SELECT ?s WHERE {
        ?s rdfs:subClassOf ?o .
        FILTER EXISTS { ?s rdfs:subClassOf+ <http://ex.org/C> }
    }"""
    assert {r.s for r in sparql_query(graph, q2).collect()} == {
        "http://ex.org/A",
        "http://ex.org/B",
    }


def test_graph_var_with_path(spark):
    # per-graph closure: chains a->b->c in g1, a->b in g2; the closure
    # must NOT leak across graphs (a->c exists only in g1)
    quads = spark.createDataFrame(
        [
            ("a", "http://p/next", "b", False, "g1"),
            ("b", "http://p/next", "c", False, "g1"),
            ("a", "http://p/next", "b", False, "g2"),
            ("a", "http://p/tag", "t", False, "g1"),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, graph string",
    )
    q = "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s <http://p/next>+ ?o } }"
    rows = {(r.g, r.s, r.o) for r in sparql_query(quads, q).collect()}
    assert rows == {
        ("g1", "a", "b"), ("g1", "b", "c"), ("g1", "a", "c"),
        ("g2", "a", "b"),
    }
    # mixed plain + path inside the same GRAPH ?g group: join on ?g and ?s
    q2 = """SELECT ?g ?s ?o WHERE {
        GRAPH ?g { ?s <http://p/next>+ ?o . ?s <http://p/tag> ?t }
    }"""
    rows2 = {(r.g, r.s, r.o) for r in sparql_query(quads, q2).collect()}
    assert rows2 == {("g1", "a", "b"), ("g1", "a", "c")}
    # constant endpoint under GRAPH ?g
    q3 = "SELECT ?g WHERE { GRAPH ?g { <a> <http://p/next>+ <c> } }"
    assert {r.g for r in sparql_query(quads, q3).collect()} == {"g1"}


def test_union_arm_with_optional_and_filter(graph):
    # arms are full group graph patterns now: OPTIONAL inside an arm
    q = """SELECT ?s ?o ?note WHERE {
        { ?s <http://ex.org/p/likes> ?o .
          OPTIONAL { ?s <http://example.org/optionalPredicate> ?note } }
        UNION
        { ?s rdf:type ?o . FILTER(CONTAINS(?s, "/x")) }
    }"""
    rows = {(r.s, r.o, r.note) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/x", "http://ex.org/y", "note"),
        ("http://ex.org/y", "http://ex.org/z", None),
        ("http://ex.org/x", "http://ex.org/A", None),
    }


def test_union_nested_inside_arm(graph):
    # a UNION chain inside an arm compiles recursively
    q = """SELECT ?s ?o WHERE {
        { { ?s rdf:type ?o } UNION { ?s rdfs:subClassOf ?o } }
        UNION
        { ?s <http://ex.org/p/likes> ?o }
    }"""
    assert sparql_query(graph, q).count() == 5  # 1 type + 2 sub + 2 likes


def test_union_arm_empty_is_loud(graph):
    with pytest.raises(ValueError, match="empty UNION arm"):
        sparql_query(graph, "SELECT ?s WHERE { { ?s ?p ?o } UNION { } }")


def test_values_inside_union_arm_keeps_arm_scope(graph):
    # a VALUES clause inside one arm must constrain ONLY that arm
    q = """SELECT ?s ?o WHERE {
        { ?s <http://ex.org/p/likes> ?o . VALUES ?o { <http://ex.org/y> } }
        UNION
        { ?s rdfs:subClassOf ?o }
    }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/x", "http://ex.org/y"),       # likes arm, filtered
        ("http://ex.org/A", "http://ex.org/B"),       # sub arm, UNfiltered
        ("http://ex.org/B", "http://ex.org/C"),
    }


def test_minus_group_with_filter(graph):
    # MINUS group is a full graph pattern: FILTER applies inside it
    q = """SELECT ?s ?o WHERE {
        ?s <http://ex.org/p/likes> ?o .
        MINUS { ?s <http://ex.org/p/likes> ?o . FILTER(CONTAINS(?o, "/z")) }
    }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/x", "http://ex.org/y")}


def test_exists_group_with_nested_union(graph):
    # EXISTS group containing a UNION chain
    q = """SELECT ?s WHERE {
        ?s ?p ?o .
        FILTER EXISTS { { ?s rdf:type ?t } UNION { ?s rdfs:subClassOf ?t } }
    }"""
    subs = {r.s for r in sparql_query(graph, q).collect()}
    assert subs == {"http://ex.org/x", "http://ex.org/A", "http://ex.org/B"}


def test_minus_possibly_unbound_shared_var_compat(graph):
    # the MINUS group's UNION leaves ?s unbound in one arm and ?note in
    # the other: spec Minus removes μ1 iff some μ2 is compatible AND the
    # domains overlap. The (null-s, note) arm rows share NO bound var
    # with a note-unbound outer row (disjoint domains — never removes);
    # the (s, null-note) arm removes every outer row whose ?s likes
    # something.
    q = """SELECT ?s ?note WHERE {
        ?s ?p ?o . OPTIONAL { ?s <http://example.org/optionalPredicate> ?note }
        MINUS { { ?s <http://ex.org/p/likes> ?x } UNION { ?note ?q ?y } }
    }"""
    rows = {(r.s, r.note) for r in sparql_query(graph, q).collect()}
    assert rows == {("http://ex.org/A", None), ("http://ex.org/B", None)}


def test_group_by_multiple_keys(spark):
    t = spark.createDataFrame(
        [("a", "p1", "x"), ("a", "p1", "y"), ("a", "p2", "x"), ("b", "p1", "z")],
        "subj string, pred string, obj string",
    )
    q = """SELECT ?s ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
           GROUP BY ?s ?p ORDER BY ?s ?p"""
    out = sparql_query(t, q)
    assert out.columns == ["s", "p", "n"]  # SELECT order, not aggs-first
    assert [tuple(r) for r in out.collect()] == [
        ("a", "p1", 2), ("a", "p2", 1), ("b", "p1", 1),
    ]


def test_group_key_not_projected_is_grouped_but_not_emitted(spark):
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("b", "p", "z")],
        "subj string, pred string, obj string",
    )
    q = "SELECT (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?s ORDER BY DESC(?n)"
    out = sparql_query(t, q)
    assert out.columns == ["n"]
    assert [r.n for r in out.collect()] == [2, 1]


def test_order_by_expression(graph):
    # longest subjects first; ties broken by the plain var key
    q = "SELECT DISTINCT ?s WHERE { ?s ?p ?o } ORDER BY DESC(STRLEN(?s)) ?s"
    subs = [r.s for r in sparql_query(graph, q).collect()]
    assert subs == sorted(subs, key=lambda s: (-len(s), s))


def test_values_undef_joins_as_unbound(graph):
    # (<x> UNDEF) constrains only ?s; (UNDEF <z>) constrains only ?o
    q = """SELECT ?s ?o WHERE {
        ?s <http://ex.org/p/likes> ?o .
        VALUES (?s ?o) { (<http://ex.org/x> UNDEF) (UNDEF <http://ex.org/z>) }
    }"""
    rows = {(r.s, r.o) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/x", "http://ex.org/y"),
        ("http://ex.org/y", "http://ex.org/z"),
    }


def test_construct_where_shorthand(graph):
    q = "CONSTRUCT WHERE { ?s <http://ex.org/p/likes> ?o }"
    rows = {(r.subj, r.pred, r.obj) for r in sparql_query(graph, q).collect()}
    assert rows == {
        ("http://ex.org/x", "http://ex.org/p/likes", "http://ex.org/y"),
        ("http://ex.org/y", "http://ex.org/p/likes", "http://ex.org/z"),
    }


def test_construct_where_rejects_non_bgp(graph):
    with pytest.raises(ValueError):
        sparql_query(
            graph, 'CONSTRUCT WHERE { ?s ?p ?o . FILTER(CONTAINS(?o, "z")) }'
        )


def test_order_by_parser_edges():
    # pure-parser checks: no Spark needed
    from graphforge_spark.plans.sparql import parse_sparql

    p, _ = parse_sparql(
        'SELECT ?s WHERE { ?s ?p ?o } ORDER BY DESC(STRLEN(?s)) ?p LIMIT 3'
    )
    assert p.order_by == [("STRLEN(?s)", False), ("?p", True)]
    assert p.limit == 3
    # a quoted ')' inside a string cannot unbalance the scan
    p, _ = parse_sparql(
        'SELECT ?s WHERE { ?s ?p ?o } ORDER BY DESC(CONCAT(?s, ")x")) LIMIT 1'
    )
    assert p.order_by == [('CONCAT(?s, ")x")', False)] and p.limit == 1
    with pytest.raises(ValueError, match="empty ORDER BY"):
        parse_sparql("SELECT ?s WHERE { ?s ?p ?o } ORDER BY LIMIT 3")


def test_values_undef_parser():
    from graphforge_spark.plans.sparql import parse_sparql

    p, _ = parse_sparql(
        "SELECT ?s WHERE { ?s ?p ?o . VALUES (?s ?o) { (<a> UNDEF) (undef <b>) } }"
    )
    assert p.values == [(["s", "o"], [("a", None), (None, "b")])]
    # single-var form
    p, _ = parse_sparql("SELECT ?s WHERE { ?s ?p ?o . VALUES ?s { UNDEF <a> } }")
    assert p.values == [(["s"], [(None,), ("a",)])]


def test_group_by_parser_multi_key():
    from graphforge_spark.plans.sparql import parse_sparql

    p, _ = parse_sparql(
        "SELECT ?a ?b (COUNT(?c) AS ?n) WHERE { ?a ?b ?c } GROUP BY ?a ?b"
    )
    assert p.group_by == ["a", "b"]


@pytest.fixture(scope="module")
def numgraph(spark):
    return spark.createDataFrame(
        [("a", "p", "4"), ("b", "p", "10"), ("c", "p", "x y~*"), ("d", "p", "-2.5")],
        "subj string, pred string, obj string",
    )


def test_arithmetic_bind_and_error_elimination(numgraph):
    # expression errors (malformed numeric) -> unbound, never a job abort
    q = "SELECT ?s ?v WHERE { ?s ?p ?o . BIND(?o * 2 + 1 AS ?v) }"
    rows = {r.s: r.v for r in sparql_query(numgraph, q).collect()}
    assert rows == {"a": 9.0, "b": 21.0, "c": None, "d": -4.0}
    # in a FILTER the error eliminates the row
    q2 = "SELECT ?s WHERE { ?s ?p ?o . FILTER(?o + 1 > 4.5) }"
    assert {r.s for r in sparql_query(numgraph, q2).collect()} == {"a", "b"}


def test_arithmetic_precedence_and_parens(numgraph):
    q = 'SELECT ?v WHERE { ?s ?p ?o . FILTER(?s = "a") BIND((?o + 2) * 10 / 4 AS ?v) }'
    assert [r.v for r in sparql_query(numgraph, q).collect()] == [15.0]


def test_numeric_builtins(numgraph):
    q = """SELECT ?s ?a ?c ?f ?r WHERE { ?s ?p ?o . FILTER(?s = "d")
           BIND(ABS(?o) AS ?a) BIND(CEIL(?o) AS ?c)
           BIND(FLOOR(?o) AS ?f) BIND(ROUND(?o) AS ?r) }"""
    r = sparql_query(numgraph, q).collect()[0]
    assert (r.a, r.c, r.f) == (2.5, -2.0, -3.0)


def test_hash_builtins_and_encode_for_uri(numgraph):
    import hashlib

    q = """SELECT ?h1 ?h2 ?e WHERE { ?s ?p ?o . FILTER(?s = "c")
           BIND(MD5(?o) AS ?h1) BIND(SHA256(?o) AS ?h2)
           BIND(ENCODE_FOR_URI(?o) AS ?e) }"""
    r = sparql_query(numgraph, q).collect()[0]
    assert r.h1 == hashlib.md5(b"x y~*").hexdigest()
    assert r.h2 == hashlib.sha256(b"x y~*").hexdigest()
    assert r.e == "x%20y~%2A"  # RFC 3986: space->%20, '~' kept, '*' escaped


@pytest.fixture()
def dategraph(spark):
    return spark.createDataFrame(
        [
            ("a", "at", "2024-03-05T10:30:05.5+05:00"),
            ("b", "at", "2023-11-30T23:59:59Z"),
            ("c", "at", "2022-01-02T03:04:05"),
            ("d", "at", "2021-06-07"),
            ("e", "at", "not-a-date"),
        ],
        "subj string, pred string, obj string",
    )


def test_datetime_accessors(dategraph):
    # SPARQL 17.4.5: component accessors read the literal AS WRITTEN
    # (zone suffix does not shift wall-clock fields); SECONDS keeps the
    # fraction (xsd:decimal); TZ returns the suffix text ('' if none)
    q = """SELECT ?s ?y ?mo ?d ?h ?mi ?sec ?tz WHERE { ?s ?p ?o .
           BIND(YEAR(?o) AS ?y) BIND(MONTH(?o) AS ?mo) BIND(DAY(?o) AS ?d)
           BIND(HOURS(?o) AS ?h) BIND(MINUTES(?o) AS ?mi)
           BIND(SECONDS(?o) AS ?sec) BIND(TZ(?o) AS ?tz) }"""
    got = {r.s: (r.y, r.mo, r.d, r.h, r.mi, r.sec, r.tz)
           for r in sparql_query(dategraph, q).collect()}
    assert got["a"] == (2024, 3, 5, 10, 30, 5.5, "+05:00")
    assert got["b"] == (2023, 11, 30, 23, 59, 59.0, "Z")
    assert got["c"] == (2022, 1, 2, 3, 4, 5.0, "")
    # xsd:date: time components read as midnight under the NTZ cast
    assert got["d"] == (2021, 6, 7, 0, 0, 0.0, "")
    # malformed term -> expression error -> unbound (BIND) — TZ still ''
    assert got["e"] == (None, None, None, None, None, None, "")


def test_datetime_accessor_in_filter(dategraph):
    # in a FILTER the error eliminates the row (e's NULL comparison)
    q = "SELECT ?s WHERE { ?s ?p ?o . FILTER(YEAR(?o) >= 2023) }"
    assert {r.s for r in sparql_query(dategraph, q).collect()} == {"a", "b"}
    q2 = 'SELECT ?s WHERE { ?s ?p ?o . FILTER(TZ(?o) = "Z") }'
    assert [r.s for r in sparql_query(dategraph, q2).collect()] == ["b"]


def test_sameterm_isnumeric_regex_flags(numgraph):
    q = 'SELECT ?s WHERE { ?s ?p ?o . FILTER(sameTerm(?o, "4")) }'
    assert [r.s for r in sparql_query(numgraph, q).collect()] == ["a"]
    q2 = "SELECT ?s WHERE { ?s ?p ?o . FILTER(isNumeric(?o)) }"
    assert {r.s for r in sparql_query(numgraph, q2).collect()} == {"a", "b", "d"}
    q3 = 'SELECT ?s WHERE { ?s ?p ?o . FILTER(REGEX(?o, "X", "i")) }'
    assert [r.s for r in sparql_query(numgraph, q3).collect()] == ["c"]
    with pytest.raises(ValueError, match="REGEX flags"):
        sparql_query(numgraph, 'SELECT ?s WHERE { ?s ?p ?o . FILTER(REGEX(?o, "a", "q")) }')


def test_expression_comparison_both_sides(numgraph):
    # neither side is a single token: needs the generalized comparison
    q = "SELECT ?s WHERE { ?s ?p ?o . FILTER(STRLEN(?o) + 1 = CEIL(2.2)) }"
    assert [r.s for r in sparql_query(numgraph, q).collect()] == ["b"]


def test_mixed_sum_ignores_nonnumeric(numgraph):
    q = "SELECT (SUM(?o) AS ?total) WHERE { ?s ?p ?o }"
    assert [r.total for r in sparql_query(numgraph, q).collect()] == [11.5]


def test_curie_operand_is_not_split_by_arithmetic():
    from graphforge_spark.plans.sparql import _arith_split, _mask_strings

    for e in ("ex:a-b", "rdf:type", "ex:x/y#z-2"):
        assert _arith_split(e, _mask_strings(e)) is None
    sp = _arith_split("?x - ex:a-b", _mask_strings("?x - ex:a-b"))
    assert sp == ("?x ", "-", " ex:a-b")


def test_order_by_aggregate_call(spark):
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("b", "p", "z")],
        "subj string, pred string, obj string",
    )
    q = """SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
           GROUP BY ?s ORDER BY DESC(COUNT(?o)) ?s"""
    assert [(r.s, r.n) for r in sparql_query(t, q).collect()] == [("a", 2), ("b", 1)]
    # an aggregate call that is not projected raises (same rule as HAVING)
    with pytest.raises(ValueError, match="not in the SELECT projection"):
        sparql_query(
            t,
            """SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
               GROUP BY ?s ORDER BY DESC(SUM(?o))""",
        )


def test_group_by_expression_key(spark):
    t = spark.createDataFrame(
        [("a", "p", "xx"), ("b", "p", "yy"), ("c", "p", "zzz")],
        "subj string, pred string, obj string",
    )
    q = """SELECT ?l (COUNT(?o) AS ?n) WHERE { ?s ?p ?o }
           GROUP BY (STRLEN(?o) AS ?l) ORDER BY ?l"""
    assert [(r.l, r.n) for r in sparql_query(t, q).collect()] == [(2, 2), (3, 1)]


def test_group_by_without_aggregates_groups(spark):
    # one solution per group, per spec (was previously silently ignored)
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "p", "y"), ("b", "p", "z")],
        "subj string, pred string, obj string",
    )
    q = "SELECT ?s WHERE { ?s ?p ?o } GROUP BY ?s ORDER BY ?s"
    assert [r.s for r in sparql_query(t, q).collect()] == ["a", "b"]
    # projecting a non-key var raises rather than silently mis-answering
    with pytest.raises(ValueError, match="not a GROUP BY key"):
        sparql_query(t, "SELECT ?o WHERE { ?s ?p ?o } GROUP BY ?s")


# ---------------------------------------------------------------------------
# Property test: Turtle-sugar desugaring in patterns — random ';'/','/
# '[ ]' bodies built from an abstract fact tree must expand to exactly
# the flat statements the tree describes (anon variables canonicalized)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _canon_anon(pats):
    """Rename ?_anon_N variables by order of first appearance."""
    from graphforge_spark.plans.sparql import Var

    seen = {}

    def c(t):
        if isinstance(t, Var) and t.name.startswith("_anon_"):
            if t.name not in seen:
                seen[t.name] = len(seen)
            return ("B", seen[t.name])
        return t

    return [(c(s), c(p), c(o)) for s, p, o in pats]


@st.composite
def sugar_bodies(draw, depth=0):
    """Return (body_text, expected_facts) where expected_facts are
    (subj_key, pred_iri, obj_key); bnode subjects/objects appear as
    ('B', i) placeholders in first-appearance order."""
    ctx = {"n": 0}

    def new_bnode():
        k = ("B", ctx["n"])
        ctx["n"] += 1
        return k

    def gen_objlist(subj, pred, nested_ok):
        objs, facts = [], []
        for _ in range(draw(st.integers(1, 2))):
            if nested_ok and draw(st.integers(0, 3)) == 0:
                inner_txt, inner_facts, inner_key = gen_bnode(nested_ok=False)
                objs.append(inner_txt)
                facts.append((subj, pred, inner_key))
                facts += inner_facts
            else:
                name = draw(st.sampled_from(["u", "v", "w"]))
                objs.append(f"<http://o/{name}>")
                facts.append((subj, pred, f"http://o/{name}"))
        return " , ".join(objs), facts

    def gen_predobjs(subj, nested_ok):
        chunks, facts = [], []
        for pi in range(draw(st.integers(1, 3))):
            pred = f"http://p/{draw(st.sampled_from(['p', 'q', 'r']))}{pi}"
            otxt, ofacts = gen_objlist(subj, pred, nested_ok)
            chunks.append(f"<{pred}> {otxt}")
            facts += ofacts
        return " ; ".join(chunks), facts

    def gen_bnode(nested_ok):
        key = new_bnode()
        txt, facts = gen_predobjs(key, nested_ok)
        return f"[ {txt} ]", facts, key

    subj_kind = draw(st.sampled_from(["iri", "var", "bnode"]))
    if subj_kind == "bnode":
        # bnode SUBJECT term followed by its own predicate-object list
        # (the engine's supported form; a bare '[ p o ] .' statement is
        # a loud refusal, covered by the deterministic tests)
        btxt, bfacts, key = gen_bnode(nested_ok=False)
        otxt, ofacts = gen_predobjs(key, nested_ok=False)
        return f"{btxt} {otxt} .", bfacts + ofacts
    subj = "http://s/a" if subj_kind == "iri" else ("VAR", "s")
    subj_txt = "<http://s/a>" if subj_kind == "iri" else "?s"
    txt, facts = gen_predobjs(subj, nested_ok=True)
    return f"{subj_txt} {txt} .", facts


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(case=sugar_bodies())
def test_pattern_sugar_desugars_to_expected_facts(case):
    from graphforge_spark.plans.sparql import Var, parse_sparql

    body, expected = case
    parsed, _ = parse_sparql(f"SELECT * WHERE {{ {body} }}")
    got = _canon_anon(parsed.patterns)

    def key(t):
        if isinstance(t, Var):
            return ("VAR", t.name)
        return t

    got_facts = [(key(s), key(p), key(o)) for s, p, o in got]
    want = [
        (s, p, o)
        for (s, p, o) in [
            (sk, pk, ok)
            for (sk, pk, ok) in expected
        ]
    ]
    assert sorted(map(repr, got_facts)) == sorted(map(repr, want)), body


def test_nested_group_graph_pattern(spark):
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "q", "y"), ("b", "p", "z")],
        "subj string, pred string, obj string",
    )
    # a lone braced group compiles recursively and joins the enclosing group
    q = "SELECT ?s ?o ?y WHERE { { ?s <p> ?o } ?s <q> ?y }"
    assert [tuple(r) for r in sparql_query(t, q).collect()] == [("a", "x", "y")]
    # group-scoped FILTER stays inside its group
    q2 = 'SELECT ?s WHERE { { ?s <p> ?o . FILTER(?o = "x") } }'
    assert [r.s for r in sparql_query(t, q2).collect()] == ["a"]
    # two sibling groups join on their shared variable
    q3 = "SELECT ?s WHERE { { ?s <p> ?o } { ?s <q> ?y } }"
    assert [r.s for r in sparql_query(t, q3).collect()] == ["a"]
    with pytest.raises(ValueError, match="empty group"):
        sparql_query(t, "SELECT ?s WHERE { { } }")
    with pytest.raises(ValueError, match="path quantifier"):
        sparql_query(t, "SELECT ?s WHERE { ?s <p>{1,3} ?o }")


def test_optional_operand_is_full_group(spark):
    t = spark.createDataFrame(
        [("a", "p", "x"), ("a", "a1", "m"), ("b", "p", "y"),
         ("b", "a2", "n"), ("c", "p", "z"), ("m", "t", "ok")],
        "subj string, pred string, obj string",
    )
    # UNION chain inside OPTIONAL
    q = """SELECT ?s ?v WHERE { ?s <p> ?o
           OPTIONAL { { ?s <a1> ?v } UNION { ?s <a2> ?v } } }"""
    assert sorted(tuple(r) for r in sparql_query(t, q).collect()) == [
        ("a", "m"), ("b", "n"), ("c", None),
    ]
    # VALUES inside OPTIONAL constrains only the optional group
    q2 = 'SELECT ?s ?m WHERE { ?s <p> ?o OPTIONAL { ?s <a1> ?m . VALUES ?m { "zzz" } } }'
    assert sorted(tuple(r) for r in sparql_query(t, q2).collect()) == [
        ("a", None), ("b", None), ("c", None),
    ]
    # MINUS inside OPTIONAL empties the group for its only match
    q3 = "SELECT ?s ?m WHERE { ?s <p> ?o OPTIONAL { ?s <a1> ?m MINUS { ?m <t> ?w } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q3).collect()) == [
        ("a", None), ("b", None), ("c", None),
    ]
    # FILTER EXISTS inside OPTIONAL keeps the matching binding
    q4 = "SELECT ?s ?m WHERE { ?s <p> ?o OPTIONAL { ?s <a1> ?m FILTER EXISTS { ?m <t> ?w } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q4).collect()) == [
        ("a", "m"), ("b", None), ("c", None),
    ]


def test_graph_constant_full_group(spark):
    t = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("a", "q", "m", "g1"),
         ("a", "p", "x", "g2"), ("b", "p", "y", "g1")],
        "subj string, pred string, obj string, graph string",
    )
    # OPTIONAL inside a constant GRAPH group, evaluated within that graph
    q = "SELECT ?s ?m WHERE { GRAPH <g1> { ?s <p> ?o OPTIONAL { ?s <q> ?m } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q).collect()) == [
        ("a", "m"), ("b", None),
    ]
    # UNION inside a constant GRAPH group: g2 has only the <p> edge
    q2 = "SELECT ?s WHERE { GRAPH <g2> { { ?s <p> ?o } UNION { ?s <q> ?o } } }"
    assert [r.s for r in sparql_query(t, q2).collect()] == ["a"]
    # variable-graph full groups distribute the graph context (see below)
    gq = "SELECT ?g ?s ?m WHERE { GRAPH ?g { ?s <p> ?o OPTIONAL { ?s <q> ?m } } }"
    assert sorted(tuple(r) for r in sparql_query(t, gq).collect()) == [
        ("g1", "a", "m"), ("g1", "b", None), ("g2", "a", None),
    ]


def test_from_and_from_named(spark):
    """FROM builds the default graph (RDF merge of the listed graphs,
    set semantics); FROM NAMED restricts what GRAPH ranges over; a
    dataset description replaces the whole default dataset."""
    t = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("b", "p", "y", "g2"), ("c", "p", "z", "g3"),
         ("a", "p", "x", "g2"),  # duplicate triple across merged graphs
         ("a", "q", "m", "g3")],
        "subj string, pred string, obj string, graph string",
    )
    # default graph = merge of g1,g2: the duplicate (a,p,x) collapses
    q = "SELECT ?s WHERE { ?s <p> ?o }"
    assert sorted(
        r.s for r in sparql_query(t, "SELECT ?s FROM <g1> FROM <g2> WHERE { ?s <p> ?o }").collect()
    ) == ["a", "b"]
    # without dataset clauses the union-default-graph convention holds
    assert sorted(r.s for r in sparql_query(t, q).collect()) == ["a", "a", "b", "c"]
    # FROM NAMED: GRAPH ?g ranges only over the listed named graphs
    q2 = "SELECT ?g ?s FROM NAMED <g1> FROM NAMED <g3> WHERE { GRAPH ?g { ?s <p> ?o } }"
    assert sorted(tuple(r) for r in sparql_query(t, q2).collect()) == [
        ("g1", "a"), ("g3", "c"),
    ]
    # FROM only: the named-graph set is EMPTY, so GRAPH matches nothing
    q3 = "SELECT ?g FROM <g1> WHERE { GRAPH ?g { ?s <p> ?o } }"
    assert sparql_query(t, q3).count() == 0
    # FROM NAMED only: the default graph is EMPTY
    q4 = "SELECT ?s FROM NAMED <g1> WHERE { ?s <p> ?o }"
    assert sparql_query(t, q4).count() == 0
    # both: patterns use the default graph, GRAPH the named set — and a
    # constant GRAPH outside the named set matches nothing
    q5 = """SELECT ?s ?g FROM <g1> FROM NAMED <g3>
            WHERE { ?s <p> ?o . GRAPH ?g { ?s2 <q> ?m } }"""
    assert sorted(tuple(r) for r in sparql_query(t, q5).collect()) == [("a", "g3")]
    q6 = "SELECT ?s FROM <g1> FROM NAMED <g3> WHERE { GRAPH <g1> { ?s <p> ?o } }"
    assert sparql_query(t, q6).count() == 0
    # dataset threads through group constructs (UNION arm + OPTIONAL)
    q7 = """SELECT ?s ?m FROM <g1> FROM NAMED <g3>
            WHERE { { ?s <p> ?o } UNION { ?s <q> ?o }
                    OPTIONAL { GRAPH ?g { ?s <q> ?m } } }"""
    assert sorted(tuple(r) for r in sparql_query(t, q7).collect()) == [("a", "m")]
    # ASK with dataset clauses
    q8 = "ASK FROM <g3> WHERE { ?s <q> ?m }"
    assert sparql_query(t, q8).collect()[0].ask is True
    q9 = "ASK FROM <g1> WHERE { ?s <q> ?m }"
    assert sparql_query(t, q9).collect()[0].ask is False
    # loud refusals: FROM inside a group / in a subquery, no graph column
    with pytest.raises(ValueError, match="dataset clauses"):
        sparql_query(t, "SELECT ?s WHERE { { SELECT ?s FROM <g1> WHERE { ?s <p> ?o } } }")
    with pytest.raises(ValueError, match="dataset clauses"):
        sparql_query(t, "SELECT ?s FROM <g1> WHERE { ?s <p> ?o FILTER EXISTS { ?s <q> ?m FROM <g2> } }")
    with pytest.raises(ValueError, match="no graph column"):
        sparql_query(t.drop("graph"), "SELECT ?s FROM <g1> WHERE { ?s <p> ?o }")
    # an IRI containing FROM is not a dataset clause
    t2 = spark.createDataFrame(
        [("a", "http://ex.org/FROM", "x", "g1")],
        "subj string, pred string, obj string, graph string",
    )
    assert sparql_query(t2, "SELECT ?s WHERE { ?s <http://ex.org/FROM> ?o }").count() == 1


def test_graph_var_full_group(spark):
    """GRAPH ?g with a FULL group body: the graph context distributes to
    the flat pattern runs per the SPARQL algebra, so each construct
    evaluates within one named graph and ?g binds."""
    t = spark.createDataFrame(
        [("a", "p", "x", "g1"), ("a", "q", "m", "g1"), ("b", "p", "y", "g1"),
         ("a", "p", "x", "g2"), ("a", "r", "z", "g2"), ("c", "q", "w", "g2")],
        "subj string, pred string, obj string, graph string",
    )
    # OPTIONAL: the <q> match exists only in g1, so g2's row is unextended
    q = "SELECT ?g ?s ?m WHERE { GRAPH ?g { ?s <p> ?o OPTIONAL { ?s <q> ?m } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q).collect()) == [
        ("g1", "a", "m"), ("g1", "b", None), ("g2", "a", None),
    ]
    # UNION inside the variable graph: arms evaluate per graph
    q2 = "SELECT ?g ?s WHERE { GRAPH ?g { { ?s <q> ?o } UNION { ?s <r> ?o } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q2).collect()) == [
        ("g1", "a"), ("g2", "a"), ("g2", "c"),
    ]
    # FILTER applies to the group's solutions (no graph context needed)
    q3 = 'SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o FILTER(?o = "x") } }'
    assert sorted(tuple(r) for r in sparql_query(t, q3).collect()) == [
        ("g1", "a"), ("g2", "a"),
    ]
    # MINUS with a shared variable stays within each graph: the <q> edge
    # removes ?s=a only in g1 (g2's <q> edge belongs to ?s=c)
    q4 = "SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o MINUS { ?s <q> ?m } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q4).collect()) == [
        ("g1", "b"), ("g2", "a"),
    ]
    # MINUS with NO shared binding variable is the spec's disjoint-domain
    # no-op — dropping it is correct even though a naive distribution
    # would correlate the anti-join on ?g
    q5 = "SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o MINUS { ?x <q> ?m } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q5).collect()) == [
        ("g1", "a"), ("g1", "b"), ("g2", "a"),
    ]
    # FILTER NOT EXISTS evaluates its pattern in the SAME active graph
    # even with no shared vars (no disjoint-domain rule for EXISTS):
    # g1 has a <r>-free store, g2 has the <r> edge
    q6 = "SELECT ?g ?s WHERE { GRAPH ?g { ?s <p> ?o FILTER NOT EXISTS { ?x <r> ?y } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q6).collect()) == [
        ("g1", "a"), ("g1", "b"),
    ]
    # a NESTED constant GRAPH switches the active graph and is untouched
    q7 = "SELECT ?g ?s ?c WHERE { GRAPH ?g { ?s <q> ?o . GRAPH <g2> { ?c <q> ?w } } }"
    assert sorted(tuple(r) for r in sparql_query(t, q7).collect()) == [
        ("g1", "a", "c"), ("g2", "c", "c"),
    ]
    # subquery inside GRAPH ?var: evaluated once per named graph, ?g
    # extends each solution (Graph(?g, SubSelect) algebra)
    q8 = "SELECT ?g WHERE { GRAPH ?g { { SELECT ?s WHERE { ?s <p> ?o } } } }"
    assert sorted(r.g for r in sparql_query(t, q8).collect()) == ["g1", "g1", "g2"]
    # aggregate subquery: the implicit one-group becomes one group PER
    # GRAPH (?g joins the grouping)
    q9 = (
        "SELECT ?g ?n WHERE { GRAPH ?g { "
        "{ SELECT (COUNT(?s) AS ?n) WHERE { ?s <p> ?o } } } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q9).collect()) == [
        ("g1", 2), ("g2", 1),
    ]
    # explicit GROUP BY gains ?g as an extra key
    q10 = (
        "SELECT ?g ?o ?n WHERE { GRAPH ?g { "
        "{ SELECT ?o (COUNT(?s) AS ?n) WHERE { ?s <p> ?o } GROUP BY ?o } } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q10).collect()) == [
        ("g1", "x", 1), ("g1", "y", 1), ("g2", "x", 1),
    ]
    # subquery joins its sibling patterns on ?g (plus shared vars) — the
    # join never crosses graphs
    q11 = (
        "SELECT ?g ?s ?w WHERE { GRAPH ?g { "
        "{ SELECT ?s WHERE { ?s <p> ?o } } ?c <q> ?w } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q11).collect()) == [
        ("g1", "a", "m"), ("g1", "b", "m"), ("g2", "a", "w"),
    ]
    # per-graph solution modifiers: ORDER BY/LIMIT/OFFSET inside a
    # GRAPH ?var subquery slice EACH named graph's solution sequence
    # (Window.partitionBy(?g) row_number via the internal GRAPHSLICE
    # clause), not the global result
    q12 = (
        "SELECT ?g ?s WHERE { GRAPH ?g { "
        "{ SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s LIMIT 1 } } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q12).collect()) == [
        ("g1", "a"), ("g2", "a"),
    ]
    q13 = (
        "SELECT ?g ?s WHERE { GRAPH ?g { "
        "{ SELECT ?s WHERE { ?s ?p ?o } ORDER BY DESC(?s) LIMIT 1 } } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q13).collect()) == [
        ("g1", "b"), ("g2", "c"),
    ]
    # OFFSET without LIMIT skips per graph (bag semantics: g1's ?s
    # sequence is [a, a, b], g2's is [a, a, c])
    q14 = (
        "SELECT ?g ?s WHERE { GRAPH ?g { "
        "{ SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s OFFSET 1 } } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q14).collect()) == [
        ("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "c"),
    ]
    # LIMIT composes after OFFSET within each graph
    q15 = (
        "SELECT ?g ?s WHERE { GRAPH ?g { "
        "{ SELECT ?s WHERE { ?s ?p ?o } ORDER BY ?s LIMIT 1 OFFSET 2 } } }"
    )
    assert sorted(tuple(r) for r in sparql_query(t, q15).collect()) == [
        ("g1", "b"), ("g2", "c"),
    ]


def test_review_findings_r3(spark):
    """Regression pins for the round-3 code-review findings."""
    t = spark.createDataFrame(
        [("A", "p", "1"), ("B", "p", "2"), ("A", "q", "X"),
         ("B", "r", "Y"), ("Z", "p", "abc")],
        "subj string, pred string, obj string",
    )
    # EXISTS sharing an outer possibly-unbound var: substitution leaves
    # the unbound ?x free, so B (x unbound, B r Y exists) passes while
    # A (x=X, no A r X) and Z (no r edge) drop
    got = {
        r.s
        for r in sparql_query(
            t,
            "SELECT ?s WHERE { ?s <p> ?o . OPTIONAL { ?s <q> ?x } "
            "FILTER EXISTS { ?s <r> ?x } }",
        ).collect()
    }
    assert got == {"B"}
    # MINUS with an outer possibly-unbound shared var: B's unbound ?x is
    # compatible with (B r Y) and the bound ?s overlaps domains → removed;
    # A/Z survive (no compatible minus row)
    got = {
        r.s
        for r in sparql_query(
            t,
            "SELECT ?s WHERE { ?s <p> ?o . OPTIONAL { ?s <q> ?x } "
            "MINUS { ?s <r> ?x } }",
        ).collect()
    }
    assert got == {"A", "Z"}
    # the genuinely join-inexpressible corner stays loud: the EXISTS
    # group itself may leave the shared var unbound
    with pytest.raises(ValueError, match="FILTER EXISTS group may leave"):
        sparql_query(
            t,
            "SELECT ?s WHERE { ?s <p> ?x "
            "FILTER EXISTS { ?s <r> ?y OPTIONAL { ?y <q> ?x } } }",
        )
    # numeric-side comparison against a string var: type-error rows are
    # ELIMINATED (ANSI coercion would abort the job on 'abc')
    q = "SELECT ?s WHERE { ?s <p> ?o . FILTER(?o + 1 > ?o) }"
    assert {r.s for r in sparql_query(t, q).collect()} == {"A", "B"}
    # divide-by-zero is an expression error -> unbound, never an abort
    q2 = "SELECT ?s ?r WHERE { ?s <p> ?o . BIND(10 / (?o - 1) AS ?r) }"
    assert sorted(tuple(r) for r in sparql_query(t, q2).collect()) == [
        ("A", None), ("B", 10.0), ("Z", None),
    ]
    # junk inside a multi-var VALUES row is refused even when the
    # parseable-token count matches the arity
    with pytest.raises(ValueError, match="VALUES data syntax"):
        sparql_query(
            t, "SELECT ?s WHERE { ?s <p> ?o . VALUES (?s ?o) { (<a> @junk <b>) } }"
        )


# ---------------------------------------------------------------------------
# Crash-safety: the parser's loud-error contract is ValueError ONLY — a
# hostile or malformed query must parse or raise ValueError, never leak an
# IndexError/KeyError/TypeError from the scanning arithmetic
# ---------------------------------------------------------------------------

_SPARQL_TOKENS = [
    "SELECT", "DISTINCT", "*", "?s", "?o", "?g", "WHERE", "{", "}",
    "(", ")", "<a>", "<http://e/p>", '"lit"', '"a } b"', "FILTER",
    "OPTIONAL", "UNION", "MINUS", "GRAPH", "FROM", "NAMED", "VALUES",
    "BIND", "EXISTS", "NOT", ".", ";", ",", "a", "|", "/", "^", "+",
    "&&", "||", "=", "AS", "COUNT", "GROUP", "BY", "ORDER", "LIMIT",
    "5", "STRLEN", "ASK", "CONSTRUCT", "DESCRIBE", "PREFIX", "ex:",
    "ex:p", "UNDEF", "'", '"', "\\", "@en", "^^<t>", "_:b",
]


@settings(
    max_examples=300,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(toks=st.lists(st.sampled_from(_SPARQL_TOKENS), min_size=1, max_size=40))
def test_parser_crash_safety_valueerror_only(toks):
    from graphforge_spark.plans.sparql import parse_sparql

    q = " ".join(toks)
    try:
        parse_sparql(q)
    except ValueError:
        pass  # the loud-error contract


# --- BASE prologue ---------------------------------------------------------


def test_base_resolves_relative_iris(graph):
    got = {
        tuple(r)
        for r in sparql_query(
            graph,
            """BASE <http://ex.org/>
               SELECT ?o WHERE { <x> <p/likes> ?o }""",
        ).collect()
    }
    assert got == {("http://ex.org/y",)}


def test_base_resolves_prefix_declaration_iris(graph):
    got = sparql_query(
        graph,
        """BASE <http://ex.org/>
           PREFIX e: <p/>
           SELECT ?o WHERE { <x> e:likes ?o }""",
    ).collect()
    assert [r.o for r in got] == ["http://ex.org/y"]


def test_base_applies_to_every_query_form(graph):
    ask = sparql_query(
        graph, "BASE <http://ex.org/> ASK { <x> <p/likes> ?o }"
    ).collect()
    assert ask[0].ask is True
    built = {
        (r.subj, r.pred, r.obj)
        for r in sparql_query(
            graph,
            """BASE <http://ex.org/>
               CONSTRUCT { <x2> <p/likes> ?o } WHERE { <x> <p/likes> ?o }""",
        ).collect()
    }
    assert built == {("http://ex.org/x2", "http://ex.org/p/likes", "http://ex.org/y")}
    desc = sparql_query(graph, "BASE <http://ex.org/> DESCRIBE <x>")
    assert desc.count() == 3  # all triples with subject http://ex.org/x


def test_base_guards(graph):
    from graphforge_spark.plans.sparql import parse_sparql

    with pytest.raises(ValueError, match="absolute"):
        parse_sparql("BASE <rel> SELECT * WHERE { ?s ?p ?o }")
    with pytest.raises(ValueError, match="multiple BASE"):
        parse_sparql(
            "BASE <http://a/> BASE <http://b/> SELECT * WHERE { ?s ?p ?o }"
        )
    # a literal containing BASE or <rel> is data, not prologue
    got = sparql_query(
        graph, 'SELECT ?s WHERE { ?s ?p "note" }'
    ).collect()
    assert [r.s for r in got] == ["http://ex.org/x"]


def test_base_in_update():
    from graphforge_spark.plans.update import sparql_update
    from graphforge_spark.session import get_spark

    spark = get_spark()
    store = spark.createDataFrame(
        [("http://ex.org/s", "http://ex.org/p", "http://ex.org/o", False)],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    out = sparql_update(
        store,
        "BASE <http://ex.org/> INSERT DATA { <s2> <p> <o2> }",
    )
    rows = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("http://ex.org/s2", "http://ex.org/p", "http://ex.org/o2") in rows


def test_base_leaves_filter_comparisons_alone(graph):
    # review finding: a naive <[^>]*> scan spanned from a FILTER's '<'
    # to a later '>' and "resolved" the text between them
    got = sparql_query(
        graph,
        """BASE <http://ex.org/>
           SELECT ?s ?o WHERE {
             ?s <p/likes> ?o .
             FILTER(?o < "z") FILTER(?o > "a")
           }""",
    ).collect()
    assert {(r.s, r.o) for r in got} == {
        ("http://ex.org/x", "http://ex.org/y"),
        ("http://ex.org/y", "http://ex.org/z"),
    }


def test_prefixed_name_BASE_is_not_a_declaration(graph):
    # review finding: 'ex:BASE <iri>' was consumed as a BASE declaration,
    # silently destroying the triple pattern
    from graphforge_spark.plans.sparql import parse_sparql

    p = parse_sparql(
        "PREFIX ex: <http://e/> SELECT * WHERE { ?s ex:BASE <http://abs/x> }"
    )[0]
    assert p.patterns == [(__import__("graphforge_spark.plans.bgp", fromlist=["Var"]).Var("s"), "http://e/BASE", "http://abs/x")]
    # and a real BASE alongside it is NOT a spurious "multiple BASE"
    p2 = parse_sparql(
        "BASE <http://b/> PREFIX ex: <http://e/> "
        "SELECT * WHERE { <rel> ex:BASE <http://abs/x> }"
    )[0]
    assert p2.patterns[0][0] == "http://b/rel"


def test_base_carries_across_update_operations():
    # review finding: per-op BASE scoping stored inconsistent IRIs
    from graphforge_spark.plans.update import sparql_update
    from graphforge_spark.session import get_spark

    spark = get_spark()
    store = spark.createDataFrame(
        [("http://ex.org/s", "http://ex.org/p", "http://ex.org/o", False)],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    out = sparql_update(
        store,
        "BASE <http://ex.org/> INSERT DATA { <a> <b> <c> } ; "
        "INSERT DATA { <d> <e> <f> }",
    )
    subs = {r.subj for r in out.collect()}
    assert "http://ex.org/a" in subs and "http://ex.org/d" in subs


def test_pn_local_separators_before_BASE_not_a_declaration():
    # second-pass review finding: PN_LOCAL legally contains '.' and '-';
    # neither may be consumed as a BASE declaration (which silently
    # destroyed the pattern). '-' now parses fully; '.' hits the
    # engine's statement splitter and refuses LOUDLY (the documented
    # no-dotted-local limitation) — never a silent rewrite.
    from graphforge_spark.plans.sparql import _apply_base, parse_sparql

    p = parse_sparql(
        "PREFIX ex: <http://e/> SELECT * WHERE { ?s ex:p-BASE <http://abs/x> }"
    )[0]
    assert p.patterns[0][1] == "http://e/p-BASE", p.patterns
    dotted = "PREFIX ex: <http://e/> SELECT * WHERE { ?s ex:p.BASE <http://abs/x> }"
    assert _apply_base(dotted) == dotted  # no silent strip
    with pytest.raises(ValueError, match="triple pattern"):
        parse_sparql(dotted)


def test_base_refuses_whitespace_iriref_instead_of_skipping():
    # second-pass review finding: <a b> silently stayed relative while
    # its neighbors resolved — now loud
    from graphforge_spark.plans.sparql import parse_sparql

    with pytest.raises(ValueError, match="IRIREF"):
        parse_sparql("BASE <http://e/> SELECT * WHERE { <a b> <p> <o> }")
    # while FILTER comparison spans (which carry ?/quotes/parens) and
    # multi-comparison filters still pass untouched
    parse_sparql(
        'BASE <http://e/> SELECT * WHERE { ?s <p> ?o . '
        'FILTER(?o < "z") FILTER(?o > "a") }'
    )
    parse_sparql(
        "BASE <http://e/> SELECT * WHERE { ?s <p> ?o . ?s <q> ?b . ?s <r> ?c ."
        " FILTER(?o < ?b && ?c > ?o) }"
    )


def test_base_leaves_spaceless_comparison_chains_alone(graph):
    # final-review finding: ?b<?c&&?c>?d yields a span whose content is
    # IRIREF-charset-legal — the expression guard must skip it
    from graphforge_spark.plans.sparql import _apply_base, parse_sparql

    q = (
        "BASE <http://ex.org/> SELECT ?a WHERE { ?a <p> ?b . ?a <q> ?c . "
        "?a <r> ?d . FILTER(?b<?c&&?c>?d) }"
    )
    assert "<http://ex.org/?c" not in _apply_base(q)
    p = parse_sparql(q)[0]
    assert len(p.patterns) == 3 and p.filters


def test_base_allows_spaceless_declaration():
    # grammar: no whitespace required between BASE and the IRIREF
    from graphforge_spark.plans.sparql import parse_sparql

    p = parse_sparql("BASE<http://e/>SELECT * WHERE { <x> <p> <o> }")[0]
    assert p.patterns == [("http://e/x", "http://e/p", "http://e/o")]


def test_base_preserves_empty_fragment_in_prefix_decl(graph):
    # review finding (RFC 3986 §5.3): PREFIX v: <vocab#> under BASE must
    # resolve to http://…/vocab# — urljoin drops the empty fragment,
    # silently bending every v:name CURIE
    from graphforge_spark.plans.sparql import _apply_base

    q = "BASE <http://e/> PREFIX v: <vocab#> SELECT * WHERE { ?s v:name ?o }"
    assert "<http://e/vocab#>" in _apply_base(q)
    # a bare trailing-# IRIREF in a pattern position too
    q2 = "BASE <http://e/> SELECT * WHERE { <doc#> ?p ?o }"
    assert "<http://e/doc#>" in _apply_base(q2)
    # while a NON-empty fragment keeps resolving normally
    q3 = "BASE <http://e/> SELECT * WHERE { <doc#frag> ?p ?o }"
    assert "<http://e/doc#frag>" in _apply_base(q3)


def test_base_refuses_spaceless_relative_iri_after_operand():
    # review finding: '?s ?p<rel>' leaves <rel> unresolved and silently
    # matching nothing — the whitespace post-check can't see it (the
    # span has no whitespace), so the guard itself must refuse loudly
    from graphforge_spark.plans.sparql import _apply_base, parse_sparql

    with pytest.raises(ValueError, match="whitespace"):
        parse_sparql("BASE <http://e/> SELECT * WHERE { ?s ?p<rel> }")
    # spaceless comparison chains still pass (content carries operators)
    q = (
        "BASE <http://ex.org/> SELECT ?a WHERE { ?a <p> ?b . ?a <q> ?c . "
        "?a <r> ?d . FILTER(?b<?c&&?c>?d) }"
    )
    assert "<http://ex.org/?c" not in _apply_base(q)
    # and a purely numeric span is treated as a comparison operand
    _apply_base("BASE <http://e/> SELECT * WHERE { ?s <p> ?o FILTER(?o<2020>?b) }")


# --- NOW() and nondeterministic builtins (r5) -------------------------------


def test_now_is_pinned_per_query(graph):
    # SPARQL 1.1 §17.4.5.1: every NOW() in one query returns the SAME
    # xsd:dateTime — pinned on the driver at compile, not a per-row clock
    rows = sparql_query(
        graph,
        "SELECT ?s ?t ?t2 WHERE { ?s ?p ?o . "
        "BIND(NOW() AS ?t) BIND(NOW() AS ?t2) }",
    ).collect()
    assert rows
    vals = {(r.t, r.t2) for r in rows}
    assert len(vals) == 1  # same across rows AND across the two binds
    t, t2 = next(iter(vals))
    assert t == t2
    import re as _re

    assert _re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z", t)


def test_now_components_and_comparison(graph):
    # YEAR(NOW()) etc. work through the accessor chain; the store's ts
    # comparisons against NOW() behave as string-ordered ISO (and as
    # timestamps through the accessors)
    rows = sparql_query(
        graph,
        "SELECT ?s (YEAR(NOW()) AS ?y) WHERE { ?s ?p ?o } LIMIT 1",
    ).collect()
    import datetime

    assert rows[0].y == datetime.datetime.now(datetime.timezone.utc).year
    # FILTER comparing a literal against NOW() — every stored date < now
    got = sparql_query(
        graph,
        'SELECT ?s WHERE { ?s ?p ?o . FILTER("1999-01-01T00:00:00.000Z" < NOW()) }',
    ).count()
    assert got == sparql_query(graph, "SELECT ?s WHERE { ?s ?p ?o }").count()


def test_now_annotation_mode_datatype(spark):
    annotated = spark.createDataFrame(
        [("http://ex.org/x", "http://ex.org/p", "v", True, None, None)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )
    rows = sparql_query(
        annotated,
        "SELECT ?t (DATATYPE(?t) AS ?dt) WHERE { ?s ?p ?o . BIND(NOW() AS ?t) } LIMIT 1",
    ).collect()
    assert rows[0].dt == "http://www.w3.org/2001/XMLSchema#dateTime"


def test_nondeterministic_builtins_refuse_with_guidance(graph):
    for fn in ("UUID", "STRUUID", "RAND"):
        with pytest.raises(ValueError, match="nondeterministic"):
            sparql_query(
                graph, f"SELECT ?s WHERE {{ ?s ?p ?o . BIND({fn}() AS ?x) }}"
            )


def test_select_expression_sees_clause_bind_vars(spark):
    # review finding: '(expr AS ?x)' projections were appended to binds
    # during PROJECTION parse, running before clause BINDs — so
    # (DATATYPE(?t) AS ?dt) could not resolve a clause-bound ?t
    annotated = spark.createDataFrame(
        [("http://ex.org/x", "http://ex.org/p", "v", True, None, None)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )
    rows = sparql_query(
        annotated,
        'SELECT ?t (DATATYPE(?t) AS ?dt) WHERE { ?s ?p ?o . '
        'BIND(STRDT("5", <http://dt>) AS ?t) }',
    ).collect()
    assert [(r.t, r.dt) for r in rows] == [("5", "http://dt")]
    # plain (non-annotation) store: arithmetic over a clause BIND
    plain = annotated.drop("obj_lang", "obj_dt")
    rows = sparql_query(
        plain,
        "SELECT (?n + 1 AS ?m) WHERE { ?s ?p ?o . BIND(2 * 3 AS ?n) }",
    ).collect()
    assert rows[0].m == 7.0


# --- r5: last two grammar corners (verdict #4) ------------------------------


def test_subquery_as_union_arm(graph):
    # subquery arm + plain arm, both orders; the subquery's scope rule
    # (only projected vars join) still applies inside the arm
    q = """SELECT ?s WHERE {
      { SELECT ?s WHERE { ?s <http://ex.org/p/likes> ?o } }
      UNION
      { ?s <http://example.org/optionalPredicate> ?n } }"""
    got = sorted(r.s for r in sparql_query(graph, q).collect())
    assert got == ["http://ex.org/x", "http://ex.org/x", "http://ex.org/y"]
    q2 = """SELECT ?s WHERE {
      { ?s <http://example.org/optionalPredicate> ?n }
      UNION
      { SELECT ?s WHERE { ?s <http://ex.org/p/likes> ?o } } }"""
    assert sorted(r.s for r in sparql_query(graph, q2).collect()) == got


def test_subquery_as_union_arm_inside_graph_var(spark):
    quads = spark.createDataFrame(
        [
            ("http://e/a", "http://p/1", "http://e/b", False, "g1"),
            ("http://e/b", "http://p/1", "http://e/c", False, "g1"),
            ("http://e/a", "http://p/2", "va", True, "g2"),
            ("http://e/c", "http://p/1", "http://e/a", False, "g2"),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "graph string",
    )
    q = """SELECT ?g ?s WHERE { GRAPH ?g {
      { SELECT ?s WHERE { ?s <http://p/1> ?o } }
      UNION
      { ?s <http://p/2> ?o2 } } }"""
    got = sorted((r.g, r.s) for r in sparql_query(quads, q).collect())
    assert got == [
        ("g1", "http://e/a"),
        ("g1", "http://e/b"),
        ("g2", "http://e/a"),
        ("g2", "http://e/c"),
    ]
    # aggregate subquery arms: per-graph counts, bag union
    q2 = """SELECT ?g ?n WHERE { GRAPH ?g {
      { SELECT (COUNT(?s) AS ?n) WHERE { ?s <http://p/1> ?o } }
      UNION
      { SELECT (COUNT(?s) AS ?n) WHERE { ?s <http://p/2> ?o } } } }"""
    got2 = sorted((r.g, r.n) for r in sparql_query(quads, q2).collect())
    assert got2 == [("g1", 2), ("g2", 1), ("g2", 1)]


def test_negated_property_set_inverse_members(spark):
    df = spark.createDataFrame(
        [
            ("http://e/a", "http://e/p", "http://e/b", False),
            ("http://e/b", "http://e/q", "http://e/c", False),
            ("http://e/c", "http://e/r", "http://e/a", False),
            ("http://e/a", "http://e/q", "http://e/d", False),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )

    def run(path):
        q = f"SELECT ?s ?o WHERE {{ ?s {path} ?o }}"
        return sorted(
            (r.s.rsplit("/", 1)[1], r.o.rsplit("/", 1)[1])
            for r in sparql_query(df, q).collect()
        )

    # pure inverse set: reversed edges whose pred is not p
    assert run("!(^<http://e/p>)") == [("a", "c"), ("c", "b"), ("d", "a")]
    # unparenthesized singleton (grammar PathOneInPropertySet '^' iri)
    assert run("!^<http://e/q>") == [("a", "c"), ("b", "a")]
    # mixed: forward-not-p UNION reversed-not-q (spec §9.1 alternative)
    assert run("!(<http://e/p>|^<http://e/q>)") == [
        ("a", "c"), ("a", "d"), ("b", "a"), ("b", "c"), ("c", "a"),
    ]
    # forward-only behavior unchanged
    assert run("!(<http://e/p>)") == [("a", "d"), ("b", "c"), ("c", "a")]
