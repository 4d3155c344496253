"""Annotation mode of the SPARQL compiler (plans/sparql.py, "Literal
annotations" in the module docstring): a store carrying ``obj_lang``/
``obj_dt`` compiles over encoded RDF terms, so joins / DISTINCT /
GROUP BY / MINUS / UNION operate on full term identity ("a"@en ≠ "a"),
LANG()/DATATYPE()/LANGMATCHES()/STRLANG()/STRDT() work, and the final
projection decodes back to lexical forms. The reference keeps literal
annotations through its N3 store (fileSystem.js:483-487) and Comunica
exposes these builtins — this is the engine-side parity.
"""

import pytest

from graphforge_spark.operators.extract import extract_turtle
from graphforge_spark.plans.sparql import sparql_query

XSD = "http://www.w3.org/2001/XMLSchema#"


@pytest.fixture(scope="module")
def store(spark):
    rows = [
        ("http://ex.org/a", "http://ex.org/label", "apple", True, "en", None),
        ("http://ex.org/a", "http://ex.org/label", "pomme", True, "fr", None),
        ("http://ex.org/a", "http://ex.org/label", "apple", True, None, None),
        ("http://ex.org/a", "http://ex.org/label", "Apfel", True, "de-AT", None),
        ("http://ex.org/b", "http://ex.org/age", "42", True, None, XSD + "integer"),
        ("http://ex.org/c", "http://ex.org/age", "7", True, None, XSD + "integer"),
        ("http://ex.org/b", "http://ex.org/knows", "http://ex.org/a", False, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_lang_filter(store):
    out = sparql_query(
        store,
        'SELECT ?o WHERE { ?s <http://ex.org/label> ?o FILTER(LANG(?o) = "en") }',
    )
    assert rows(out) == [("apple",)]


def test_lang_empty_for_plain_and_null_for_iri(store):
    # plain literal → "", IRI → NULL (type error, row eliminated)
    out = sparql_query(
        store, 'SELECT ?s ?o WHERE { ?s ?p ?o FILTER(LANG(?o) = "") }'
    )
    got = rows(out)
    assert ("http://ex.org/a", "apple") in got
    assert all(not o.startswith("http") for _, o in got)


def test_langmatches_basic_filtering(store):
    # RFC 4647 basic filtering: 'de' matches 'de-AT', case-insensitively
    out = sparql_query(
        store,
        'SELECT ?o WHERE { ?s ?p ?o FILTER(LANGMATCHES(LANG(?o), "DE")) }',
    )
    assert rows(out) == [("Apfel",)]
    star = sparql_query(
        store,
        'SELECT ?o WHERE { ?s ?p ?o FILTER(LANGMATCHES(LANG(?o), "*")) }',
    )
    assert rows(star) == [("Apfel",), ("apple",), ("pomme",)]


def test_datatype(store):
    out = sparql_query(
        store,
        f"PREFIX xsd: <{XSD}> SELECT ?s WHERE "
        "{ ?s ?p ?o FILTER(DATATYPE(?o) = xsd:integer) }",
    )
    assert rows(out) == [("http://ex.org/b",), ("http://ex.org/c",)]
    # plain literal → xsd:string, lang-tagged → rdf:langString
    out2 = sparql_query(
        store,
        f"PREFIX xsd: <{XSD}> SELECT ?o WHERE "
        "{ <http://ex.org/a> ?p ?o FILTER(DATATYPE(?o) = xsd:string) }",
    )
    assert rows(out2) == [("apple",)]
    out3 = sparql_query(
        store,
        "SELECT ?o WHERE { ?s ?p ?o FILTER(DATATYPE(?o) = "
        "<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>) }",
    )
    assert rows(out3) == [("Apfel",), ("apple",), ("pomme",)]


def test_annotated_pattern_constant(store):
    out = sparql_query(
        store, 'SELECT ?s WHERE { ?s <http://ex.org/label> "pomme"@fr }'
    )
    assert rows(out) == [("http://ex.org/a",)]
    # the plain constant matches ONLY the plain literal (term identity)
    out2 = sparql_query(store, 'SELECT ?s ?p WHERE { ?s ?p "apple" }')
    assert rows(out2) == [("http://ex.org/a", "http://ex.org/label")]
    # ^^xsd:string IS the plain form (RDF 1.1)
    out3 = sparql_query(
        store,
        f'PREFIX xsd: <{XSD}> SELECT ?s WHERE {{ ?s ?p "apple"^^xsd:string }}',
    )
    assert rows(out3) == [("http://ex.org/a",)]
    out4 = sparql_query(
        store,
        f'PREFIX xsd: <{XSD}> SELECT ?s WHERE {{ ?s ?p "42"^^xsd:integer }}',
    )
    assert rows(out4) == [("http://ex.org/b",)]


def test_distinct_is_term_level(store):
    # "apple"@en, "apple" (plain), "pomme"@fr, "Apfel"@de-AT: 4 terms
    out = sparql_query(
        store,
        "SELECT DISTINCT ?o WHERE { <http://ex.org/a> <http://ex.org/label> ?o }",
    )
    assert sorted(r[0] for r in out.collect()) == ["Apfel", "apple", "apple", "pomme"]


def test_values_and_minus_on_term_identity(store):
    # VALUES with an annotated term selects exactly that term
    out = sparql_query(
        store,
        'SELECT ?s WHERE { ?s <http://ex.org/label> ?o VALUES ?o { "apple"@en } }',
    )
    assert rows(out) == [("http://ex.org/a",)]
    # MINUS removes only the term-identical binding
    out2 = sparql_query(
        store,
        "SELECT ?o WHERE { <http://ex.org/a> <http://ex.org/label> ?o "
        'MINUS { ?x ?y ?o VALUES ?o { "apple"@en } } }',
    )
    # plain "apple" survives; "apple"@en is removed
    assert sorted(r[0] for r in out2.collect()) == ["Apfel", "apple", "pomme"]


def test_union_arms_keep_annotations(store):
    out = sparql_query(
        store,
        "SELECT ?o WHERE { { <http://ex.org/a> <http://ex.org/label> ?o } "
        "UNION { ?s <http://ex.org/age> ?o } "
        'FILTER(LANGMATCHES(LANG(?o), "en") || DATATYPE(?o) = '
        f"<{XSD}integer>) }}",
    )
    assert rows(out) == [("42",), ("7",), ("apple",)]


def test_numeric_comparisons_and_aggregates_decode(store):
    out = sparql_query(
        store, "SELECT ?s WHERE { ?s <http://ex.org/age> ?n FILTER(?n > 40) }"
    )
    assert rows(out) == [("http://ex.org/b",)]
    agg = sparql_query(
        store,
        "SELECT (SUM(?n) AS ?total) (MIN(?n) AS ?lo) WHERE "
        "{ ?s <http://ex.org/age> ?n }",
    )
    assert rows(agg) == [(49.0, "42")]


def test_order_by_aggregate_alias_stays_numeric(store):
    # the computed-column registry: ORDER BY ?n must sort 2 < 10
    # numerically, not lexically — the alias is never term-decoded
    out = sparql_query(
        store,
        "SELECT ?s (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } "
        "GROUP BY ?s ORDER BY DESC(?n) LIMIT 1",
    )
    assert rows(out) == [("http://ex.org/a", 4)]


def test_strlang_strdt_and_sameterm(store):
    out = sparql_query(
        store,
        "SELECT ?s WHERE { ?s <http://ex.org/label> ?x "
        'BIND(STRLANG("apple", "en") AS ?y) FILTER(SAMETERM(?x, ?y)) }',
    )
    assert rows(out) == [("http://ex.org/a",)]
    out2 = sparql_query(
        store,
        f"PREFIX xsd: <{XSD}> SELECT ?s WHERE {{ ?s <http://ex.org/age> ?x "
        'BIND(STRDT("42", xsd:integer) AS ?y) FILTER(SAMETERM(?x, ?y)) }',
    )
    assert rows(out2) == [("http://ex.org/b",)]
    # STR strips the annotation from a term
    out3 = sparql_query(
        store,
        "SELECT ?v WHERE { <http://ex.org/b> <http://ex.org/age> ?o "
        "BIND(STR(?o) AS ?v) }",
    )
    assert rows(out3) == [("42",)]


def test_companion_columns(store):
    out = sparql_query(
        store,
        "SELECT ?o WHERE { <http://ex.org/a> <http://ex.org/label> ?o }",
        with_annotations=True,
    )
    assert out.columns == ["o", "o__lang", "o__dt"]
    got = {(r.o, r.o__lang) for r in out.collect()}
    assert got == {
        ("apple", "en"),
        ("pomme", "fr"),
        ("apple", None),
        ("Apfel", "de-AT"),
    }


def test_construct_splits_annotations(store):
    out = sparql_query(
        store,
        "CONSTRUCT { ?s <http://ex.org/l2> ?o } WHERE "
        "{ ?s <http://ex.org/label> ?o }",
    )
    assert out.columns == ["subj", "pred", "obj", "obj_lang", "obj_dt"]
    got = {(r.obj, r.obj_lang, r.obj_dt) for r in out.collect()}
    assert ("apple", "en", None) in got and ("apple", None, None) in got


def test_loud_errors_without_annotations(store):
    plain = store.drop("obj_lang", "obj_dt")
    with pytest.raises(ValueError, match="annotation columns"):
        sparql_query(plain, 'SELECT ?o WHERE { ?s ?p ?o FILTER(LANG(?o) = "x") }')
    with pytest.raises(ValueError, match="annotation columns"):
        sparql_query(plain, 'SELECT ?s WHERE { ?s ?p "pomme"@fr }')
    with pytest.raises(ValueError, match="annotation columns"):
        sparql_query(
            store,
            'SELECT ?o WHERE { ?s ?p ?o FILTER(LANG(?o) = "x") }',
            annotations=False,
        )


def test_opt_out_reproduces_lexical_view(store):
    # annotations=False: the pre-annotation behavior, lexical joins
    out = sparql_query(
        store, 'SELECT ?s ?p WHERE { ?s ?p "apple" }', annotations=False
    )
    assert len(out.collect()) == 2  # both "apple"@en and plain "apple"


def test_escaped_quotes_round_trip(spark):
    rows_in = [
        ("http://ex.org/q", "http://ex.org/says", 'he said "hi" \\once\\', True, "en", None),
    ]
    st = spark.createDataFrame(
        rows_in,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )
    out = sparql_query(
        st, 'SELECT ?o WHERE { ?s ?p ?o FILTER(LANG(?o) = "en") }'
    )
    assert [r.o for r in out.collect()] == ['he said "hi" \\once\\']
    # STRLEN sees the unescaped lexical form
    n = sparql_query(
        st, "SELECT ?s WHERE { ?s ?p ?o FILTER(STRLEN(?o) = 19) }"
    )
    assert [r.s for r in n.collect()] == ["http://ex.org/q"]


def test_turtle_extraction_end_to_end(spark):
    # the real store path: Turtle with annotations → extract → query
    ttl = """@prefix ex: <http://ex.org/> .
ex:a ex:label "apple"@en, "pomme"@fr, "apple" .
ex:b ex:age 42 .
"""
    docs = spark.createDataFrame([("c1", 0, ttl)], "conv_id string, turn_idx int, text string")
    store = extract_turtle(docs, with_annotations=True)
    out = sparql_query(
        store,
        'SELECT ?s WHERE { ?s <http://ex.org/label> "apple"@en }',
    )
    assert [r.s for r in out.collect()] == ["http://ex.org/a"]
    # bare Turtle numeric got the implicit xsd:integer datatype
    out2 = sparql_query(
        store,
        f"PREFIX xsd: <{XSD}> SELECT ?s WHERE "
        "{ ?s ?p ?o FILTER(DATATYPE(?o) = xsd:integer) }",
    )
    assert [r.s for r in out2.collect()] == ["http://ex.org/b"]


# ---------------------------------------------------------------------------
# Property test: annotation-mode filters vs a pure-Python replay over the
# same rows. Random lexical forms (incl. quotes/backslashes/newlines),
# random language tags and datatypes — LANG / DATATYPE / LANGMATCHES /
# term-identity DISTINCT must agree with the obvious Python semantics.
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_lex = st.text(
    alphabet=st.sampled_from(list('ab"\\\n @^<>')), min_size=0, max_size=6
)
_tag = st.sampled_from([None, "en", "en-US", "fr", "de-AT"])
_dt = st.sampled_from(
    [None, XSD + "integer", XSD + "date", "http://ex.org/custom"]
)


@st.composite
def _annot_rows(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    rows = []
    for i in range(n):
        lex = draw(_lex)
        tag = draw(_tag)
        dt = None if tag is not None else draw(_dt)
        rows.append(
            (f"http://ex.org/s{i}", "http://ex.org/p", lex, True, tag, dt)
        )
    return rows


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=_annot_rows(), lang=st.sampled_from(["en", "fr", "de", ""]))
def test_annotation_filters_match_python_replay(spark, data, lang):
    st_df = spark.createDataFrame(
        data,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )
    got = sorted(
        r.s
        for r in sparql_query(
            st_df,
            f'SELECT ?s WHERE {{ ?s ?p ?o FILTER(LANG(?o) = "{lang}") }}',
        ).collect()
    )
    want = sorted(s for (s, _, _, _, tag, _) in data if (tag or "") == lang)
    assert got == want

    got_dt = sorted(
        (r.s, r.d)
        for r in sparql_query(
            st_df,
            "SELECT ?s (DATATYPE(?o) AS ?d) WHERE { ?s ?p ?o }",
        ).collect()
    )
    def py_dt(tag, dt):
        if tag is not None:
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
        return dt if dt is not None else XSD + "string"
    want_dt = sorted((s, py_dt(tag, dt)) for (s, _, _, _, tag, dt) in data)
    assert got_dt == want_dt

    # term-level DISTINCT count = distinct (lex, tag, dt) triples
    n_terms = len({(lex, tag, dt) for (_, _, lex, _, tag, dt) in data})
    out = sparql_query(st_df, "SELECT DISTINCT ?o WHERE { ?s ?p ?o }")
    assert out.count() == n_terms

    # decode round-trip: projected lexical forms = the raw inputs (bag)
    out_lex = sorted(r.o for r in sparql_query(
        st_df, "SELECT ?o WHERE { ?s ?p ?o }").collect())
    assert out_lex == sorted(lex for (_, _, lex, _, _, _) in data)


def test_query_warehouse_serializes_annotations(spark, tmp_path):
    # the wire path: forge a tiny annotated corpus, then the W3C JSON
    # result carries xml:lang on the binding (W3C SPARQL 1.1 Results)
    import json

    from graphforge_spark.pipeline import forge, query_warehouse

    ttl = '@prefix ex: <http://ex.org/> .\nex:a ex:label "apple"@en .\n'
    corpus = spark.createDataFrame(
        [("c1", 0, "user", ttl, "turtle", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    wh = str(tmp_path / "wh")
    forge(spark, corpus, wh, n_buckets=2, do_link=False, export_nt=False)
    body = query_warehouse(
        spark, wh,
        'SELECT ?o WHERE { ?s <http://ex.org/label> ?o }',
        results_format="json",
    )
    doc = json.loads(body)
    binding = doc["results"]["bindings"][0]["o"]
    assert binding == {"type": "literal", "value": "apple", "xml:lang": "en"}
    # DataFrame return stays lexical-only unless asked
    df = query_warehouse(
        spark, wh, 'SELECT ?o WHERE { ?s <http://ex.org/label> ?o }'
    )
    assert df.columns == ["o"] and [r.o for r in df.collect()] == ["apple"]


def test_datetime_accessors_decode_encoded_terms(spark):
    # annotation mode: the ?var reference decodes the encoded term
    # ("lex"^^xsd:dateTime) back to the lexical form BEFORE the NTZ
    # cast, so the accessors see the bare timestamp text
    st = spark.createDataFrame(
        [
            ("http://ex.org/a", "http://ex.org/at",
             "2024-03-05T10:30:05+02:00", True, None, XSD + "dateTime"),
            ("http://ex.org/b", "http://ex.org/at",
             "2023-01-02T03:04:05", True, None, XSD + "dateTime"),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )
    out = sparql_query(
        st,
        """SELECT ?s ?y ?h ?tz WHERE { ?s ?p ?o .
           BIND(YEAR(?o) AS ?y) BIND(HOURS(?o) AS ?h) BIND(TZ(?o) AS ?tz) }""",
    )
    got = {r.s: (r.y, r.h, r.tz) for r in out.collect()}
    assert got["http://ex.org/a"] == (2024, 10, "+02:00")
    assert got["http://ex.org/b"] == (2023, 3, "")
