"""W3C SPARQL results serializers: JSON / CSV / TSV structure, term
typing, unbound handling, annotation-column convention, hostile-value
escaping (verified by round-tripping through Python's csv/json parsers),
and the distributed CSV export read back through Spark itself."""

import csv
import io
import json

import pytest

from graphforge_spark.plans.sparql import sparql_query as sparql
from graphforge_spark.sinks.results import (
    ask_results_json,
    export_results_csv,
    sparql_results_csv,
    sparql_results_json,
    sparql_results_tsv,
)

ROWS = [
    # (s, name, name__lang, age, age__dt)
    ("http://ex.org/alice", "Alice, \"the boss\"\nline2", "en", "42",
     "http://www.w3.org/2001/XMLSchema#integer"),
    ("_:b0", "Bøb\ttabbed", None, None, None),
    ("http://ex.org/carol", None, None, "7", None),
]
COLS = ["s", "name", "name__lang", "age", "age__dt"]


@pytest.fixture(scope="module")
def bindings(spark):
    return spark.createDataFrame(ROWS, COLS).coalesce(1)


def test_json_structure_and_typing(bindings):
    doc = json.loads(sparql_results_json(bindings))
    assert doc["head"]["vars"] == ["s", "name", "age"]
    b = doc["results"]["bindings"]
    assert len(b) == 3
    # IRI / bnode discriminator
    assert b[0]["s"] == {"type": "uri", "value": "http://ex.org/alice"}
    assert b[1]["s"] == {"type": "bnode", "value": "b0"}  # label only, per spec
    # lang-tagged literal (lang wins; no datatype key emitted)
    assert b[0]["name"]["type"] == "literal"
    assert b[0]["name"]["xml:lang"] == "en"
    assert "datatype" not in b[0]["name"]
    # typed literal
    assert b[0]["age"]["datatype"].endswith("#integer")
    # unbound vars are OMITTED, not null
    assert "name" not in b[2] and "age" not in b[1]
    # raw value survives exactly (quotes, newline, unicode)
    assert b[0]["name"]["value"] == 'Alice, "the boss"\nline2'
    assert b[1]["name"]["value"] == "Bøb\ttabbed"


def test_json_annotation_column_without_base_raises(spark):
    df = spark.createDataFrame([("x",)], ["name__lang"])
    with pytest.raises(ValueError, match="no base variable"):
        sparql_results_json(df)


def test_csv_rfc4180_roundtrip(bindings):
    text = sparql_results_csv(bindings)
    assert text.endswith("\r\n")
    parsed = list(csv.reader(io.StringIO(text)))
    assert parsed[0] == ["s", "name", "age"]
    # plain lexical forms: IRI bare, bnode keeps _:, hostile chars intact
    assert parsed[1] == ["http://ex.org/alice", 'Alice, "the boss"\nline2', "42"]
    assert parsed[2][0] == "_:b0"
    # unbound → empty field
    assert parsed[3] == ["http://ex.org/carol", "", "7"]


def test_tsv_term_syntax(bindings):
    text = sparql_results_tsv(bindings)
    lines = text.split("\n")
    assert lines[0] == "?s\t?name\t?age"
    f1 = lines[1].split("\t")
    assert f1[0] == "<http://ex.org/alice>"
    # escapes: quote, newline; lang tag suffix
    assert f1[1] == '"Alice, \\"the boss\\"\\nline2"@en'
    assert f1[2] == '"42"^^<http://www.w3.org/2001/XMLSchema#integer>'
    f2 = lines[2].split("\t")
    assert f2[0] == "_:b0"
    assert f2[1] == '"Bøb\\ttabbed"'  # tab escaped — field count stays 3
    assert len(f2) == 3
    assert lines[3].split("\t") == ["<http://ex.org/carol>", "", '"7"']


def test_ask_json(spark):
    store = spark.createDataFrame(
        [("http://ex.org/a", "http://ex.org/p", "http://ex.org/b", False)],
        ["subj", "pred", "obj", "obj_is_literal"],
    )
    yes = sparql(store, "ASK { <http://ex.org/a> <http://ex.org/p> ?o }")
    no = sparql(store, "ASK { <http://ex.org/b> <http://ex.org/p> ?o }")
    assert json.loads(ask_results_json(yes)) == {"head": {}, "boolean": True}
    assert json.loads(ask_results_json(no)) == {"head": {}, "boolean": False}
    assert json.loads(ask_results_json(True))["boolean"] is True
    with pytest.raises(ValueError, match="'ask'"):
        ask_results_json(yes.withColumnRenamed("ask", "x"))


def test_json_from_real_sparql_query(spark):
    """End-to-end: a SPARQL OPTIONAL result (with a genuinely unbound
    var) serializes with the unbound binding omitted."""
    store = spark.createDataFrame(
        [
            ("http://ex.org/a", "http://ex.org/name", "Ann", True),
            ("http://ex.org/b", "http://ex.org/name", "Ben", True),
            ("http://ex.org/a", "http://ex.org/age", "30", True),
        ],
        ["subj", "pred", "obj", "obj_is_literal"],
    )
    res = sparql(
        store,
        "SELECT ?who ?age WHERE { ?who <http://ex.org/name> ?n . "
        "OPTIONAL { ?who <http://ex.org/age> ?age } } ORDER BY ?who",
    )
    doc = json.loads(sparql_results_json(res))
    assert doc["head"]["vars"] == ["who", "age"]
    by_who = {b["who"]["value"]: b for b in doc["results"]["bindings"]}
    assert by_who["http://ex.org/a"]["age"]["value"] == "30"
    assert "age" not in by_who["http://ex.org/b"]


def test_export_csv_distributed_roundtrip(bindings, tmp_path):
    path = str(tmp_path / "out_csv")
    export_results_csv(bindings, path)
    back = (
        bindings.sparkSession.read.option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    assert back.columns == ["s", "name", "age"]
    rows = {r["s"]: r for r in back.collect()}
    assert rows["http://ex.org/alice"]["name"] == 'Alice, "the boss"\nline2'
    assert rows["http://ex.org/carol"]["name"] is None  # unbound survives as null
    assert rows["_:b0"]["age"] is None


def test_bounded_rows_cap(bindings):
    doc = json.loads(sparql_results_json(bindings, max_rows=1))
    assert len(doc["results"]["bindings"]) == 1


def test_xml_structure_and_escaping(bindings):
    import xml.etree.ElementTree as ET

    from graphforge_spark.sinks.results import sparql_results_xml

    ns = "{http://www.w3.org/2005/sparql-results#}"
    root = ET.fromstring(sparql_results_xml(bindings))
    assert [v.get("name") for v in root.find(f"{ns}head")] == ["s", "name", "age"]
    results = root.find(f"{ns}results").findall(f"{ns}result")
    assert len(results) == 3
    b0 = {b.get("name"): b[0] for b in results[0]}
    assert b0["s"].tag == f"{ns}uri" and b0["s"].text == "http://ex.org/alice"
    assert b0["name"].get("{http://www.w3.org/XML/1998/namespace}lang") == "en"
    assert b0["name"].text == 'Alice, "the boss"\nline2'  # XML-escapes round-trip
    assert b0["age"].get("datatype").endswith("#integer")
    b1 = {b.get("name"): b[0] for b in results[1]}
    assert b1["s"].tag == f"{ns}bnode" and b1["s"].text == "b0"
    b2 = {b.get("name"): b[0] for b in results[2]}
    assert "name" not in b2  # unbound binding omitted


def test_xml_ask(spark):
    import xml.etree.ElementTree as ET

    from graphforge_spark.sinks.results import sparql_results_xml

    store = spark.createDataFrame(
        [("http://ex.org/a", "http://ex.org/p", "x", True)],
        ["subj", "pred", "obj", "obj_is_literal"],
    )
    doc = sparql_results_xml(sparql(store, "ASK { ?s ?p ?o }"))
    ns = "{http://www.w3.org/2005/sparql-results#}"
    assert ET.fromstring(doc).find(f"{ns}boolean").text == "true"


# ---------------------------------------------------------------------------
# Property fuzzer: every serializer round-trips arbitrary term values
# through an independent stdlib parser (json / csv / ElementTree) — the
# same values, the same unbound cells, no format can corrupt or leak.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_text = st.text(
    alphabet=st.characters(
        codec="utf-8",
        exclude_categories=("Cs", "Cc"),  # XML 1.0 forbids most controls
    ),
    min_size=0,
    max_size=40,
)
_term = st.one_of(
    st.none(),
    _text,
    _text.map(lambda s: "http://ex.org/" + s.replace("\n", "")),
    _text.map(lambda s: "_:" + s),
)
_rows = st.lists(st.tuples(_term, _term), min_size=0, max_size=5)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_serializers_roundtrip_fuzz(spark, rows):
    import xml.etree.ElementTree as ET

    from graphforge_spark.sinks.results import sparql_results_xml

    df = spark.createDataFrame(rows, "x string, y string").coalesce(1)

    # JSON: independent parse, values exact, unbound omitted
    doc = json.loads(sparql_results_json(df))
    got = []
    for b in doc["results"]["bindings"]:
        def val(v):
            if v not in b:
                return None
            t = b[v]
            return {"uri": t["value"], "bnode": "_:" + t["value"],
                    "literal": t["value"]}[t["type"]]
        got.append((val("x"), val("y")))
    assert sorted(got, key=repr) == sorted(rows, key=repr)

    # CSV erases typing but keeps lexical forms; unbound and the EMPTY
    # LITERAL both serialize as the empty field (documented lossiness —
    # the spec's own: CSV has no null marker), so compare modulo that.
    parsed = list(csv.reader(io.StringIO(sparql_results_csv(df))))
    assert parsed[0] == ["x", "y"]
    norm = lambda v: "" if v is None else v
    assert sorted((r[0], r[1]) for r in parsed[1:]) == sorted(
        (norm(a), norm(b)) for a, b in rows
    )

    # XML: independent parse, typed terms reconstruct exactly
    ns = "{http://www.w3.org/2005/sparql-results#}"
    root = ET.fromstring(sparql_results_xml(df))
    got_x = []
    for r in root.find(f"{ns}results").findall(f"{ns}result"):
        byname = {b.get("name"): b[0] for b in r}
        def xval(v):
            if v not in byname:
                return None
            el = byname[v]
            txt = el.text or ""
            return "_:" + txt if el.tag == f"{ns}bnode" else txt
        got_x.append((xval("x"), xval("y")))
    assert sorted(got_x, key=repr) == sorted(rows, key=repr)

    # TSV: split on ordinary tabs is safe BECAUSE in-term tabs are
    # escaped; undo Turtle escapes and strip term syntax
    def untsv(f):
        if f == "":
            return None
        if f.startswith("<"):
            return f[1:-1]
        if f.startswith("_:"):
            return f
        body = f[1:-1]
        out, i = [], 0
        while i < len(body):
            if body[i] == "\\":
                out.append({"n": "\n", "r": "\r", "t": "\t", '"': '"',
                            "\\": "\\"}[body[i + 1]])
                i += 2
            else:
                out.append(body[i])
                i += 1
        return "".join(out)

    lines = sparql_results_tsv(df).split("\n")[:-1]
    got_t = [tuple(untsv(f) for f in l.split("\t")) for l in lines[1:]]
    assert sorted(got_t, key=repr) == sorted(rows, key=repr)


def test_export_turtle_real_roundtrip(spark, tmp_path):
    """The REAL Turtle writer (prefix compaction, subject grouping, 'a',
    object lists, annotations) round-trips through the engine's own
    Turtle PARSER: every part file is a standalone valid document and
    the re-parsed triple multiset equals the input exactly."""
    from graphforge_spark.operators.extract import extract_turtle
    from graphforge_spark.sinks.ntriples import export_turtle

    rows = [
        # grouping: same subject, repeated predicate, rdf:type → 'a'
        ("http://ex.org/alice", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
         "http://ex.org/Person", False, None, None),
        ("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/bob",
         False, None, None),
        ("http://ex.org/alice", "http://ex.org/knows", "http://ex.org/carol",
         False, None, None),
        # annotations + hostile literal
        ("http://ex.org/alice", "http://ex.org/name", 'Ali "ce"\n\t', True,
         "en", None),
        ("http://ex.org/bob", "http://ex.org/age", "30", True, None,
         "http://www.w3.org/2001/XMLSchema#integer"),
        # blank node subject and non-compactable IRI (space in local part)
        ("_:b0", "http://ex.org/p", "http://ex.org/some thing", False,
         None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    )
    out = str(tmp_path / "ttl")
    export_turtle(df, out)

    import glob

    docs = []
    for i, f in enumerate(sorted(glob.glob(f"{out}/part-*"))):
        text = open(f).read()
        if text.strip():
            assert text.startswith("@prefix")  # every file standalone
            docs.append((f"c{i}", i, text))
    parsed = extract_turtle(
        spark.createDataFrame(docs, "conv_id string, turn_idx int, text string"),
        with_annotations=True,
    )
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang, r.obj_dt)
        for r in parsed.collect()
    }
    # the parser expands rdf:type ('a') to the full IRI — as the writer
    # compacted it; everything must match the input set exactly
    want = {(s, p, o, l, lg, dt) for s, p, o, l, lg, dt in rows}
    assert got == want
    # compaction actually happened: prefixed names and 'a' in the text
    alltext = "".join(d[2] for d in docs)
    assert " a " in alltext and '"30"^^xsd:integer' in alltext
    assert ", " in alltext and " ;" in alltext  # grouping forms


_iri_local = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc"),
                           exclude_characters="<>\"{}|^`\\ "),
    min_size=1, max_size=12,
)
_lit = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs", "Cc")),
    min_size=0, max_size=20,
)
_triple = st.tuples(
    _iri_local.map(lambda s: "http://ex.org/" + s),
    st.one_of(
        _iri_local.map(lambda s: "http://ex.org/p/" + s),
        st.just("http://www.w3.org/1999/02/22-rdf-syntax-ns#type"),
    ),
    st.one_of(
        st.tuples(_iri_local.map(lambda s: "http://ex.org/" + s),
                  st.just(False), st.none(), st.none()),
        st.tuples(_lit, st.just(True),
                  st.one_of(st.none(), st.just("en"), st.just("de-AT")),
                  st.none()),
        st.tuples(_lit, st.just(True), st.none(),
                  st.just("http://www.w3.org/2001/XMLSchema#string")),
    ),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(triples=st.lists(_triple, min_size=1, max_size=8))
def test_export_turtle_fuzz_roundtrip(spark, tmp_path_factory, triples):
    """Arbitrary IRIs (any non-delimiter unicode local part) and hostile
    literals survive the compacting writer → engine parser round trip as
    an exact multiset."""
    from collections import Counter

    import glob

    from graphforge_spark.operators.extract import extract_turtle
    from graphforge_spark.sinks.ntriples import export_turtle

    rows = [(s, p, o, lit, lg, dt) for s, p, (o, lit, lg, dt) in triples]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    ).coalesce(2)
    out = str(tmp_path_factory.mktemp("fz") / "ttl")
    export_turtle(df, out)
    docs = [
        (f"c{i}", i, open(f).read())
        for i, f in enumerate(sorted(glob.glob(f"{out}/part-*")))
        if open(f).read().strip()
    ]
    parsed = extract_turtle(
        spark.createDataFrame(docs, "conv_id string, turn_idx int, text string"),
        with_annotations=True,
    )
    # RDF 1.1: "x"^^xsd:string IS the plain literal "x" — the parser
    # canonicalizes the explicit spelling away, so compare modulo it
    xsd_str = "http://www.w3.org/2001/XMLSchema#string"
    canon = lambda t: t[:5] + (None,) if t[5] == xsd_str else t
    got = Counter(
        canon((r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang, r.obj_dt))
        for r in parsed.collect()
    )
    assert got == Counter(canon(t) for t in rows)
