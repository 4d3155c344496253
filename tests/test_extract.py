"""Extraction parity tests: the engine must reproduce the reference's
emitted triples (graphProcessor.js:203-304 semantics) at P/R ≥ 0.95 on the
mapping fixtures — the BASELINE.json headline correctness metric."""

import pytest
from pyspark.sql import functions as F

from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.operators.extract import (
    _walk_rdfxml,
    dedup_triples,
    extract_all,
    extract_ntriples,
    extract_patterns,
    extract_rdfxml,
)

RDF_HDR = (
    '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
    'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
    'xmlns:owl="http://www.w3.org/2002/07/owl#">'
)


class TestWalkRdfXml:
    """Unit tests of the pure-Python walker against hand-derived reference
    behavior (each case keyed to graphProcessor.js lines)."""

    def test_owl_class_label_literal(self):
        # literals emitted only under owl:Class (:233-241)
        xml = RDF_HDR + '<owl:Class rdf:about="http://x/C"><rdfs:label>Hi</rdfs:label></owl:Class></rdf:RDF>'
        assert _walk_rdfxml(xml) == [("http://x/C", "rdfs:label", "Hi", True)]

    def test_owl_class_resource_object(self):
        xml = (
            RDF_HDR
            + '<owl:Class rdf:about="http://x/C"><rdfs:subClassOf rdf:resource="http://x/P"/></owl:Class></rdf:RDF>'
        )
        assert _walk_rdfxml(xml) == [("http://x/C", "rdfs:subClassOf", "http://x/P", False)]

    def test_equivalent_class_oneof_expansion(self):
        # handleEquivalentClass (:265-282): members → (member, rdf:type, class)
        xml = (
            RDF_HDR
            + '<owl:Class rdf:about="http://x/C"><owl:equivalentClass><owl:Class><owl:oneOf>'
            '<rdf:Description rdf:about="http://x/m1"/><rdf:Description rdf:about="http://x/m2"/>'
            "</owl:oneOf></owl:Class></owl:equivalentClass></owl:Class></rdf:RDF>"
        )
        assert _walk_rdfxml(xml) == [
            ("http://x/m1", "rdf:type", "http://x/C", False),
            ("http://x/m2", "rdf:type", "http://x/C", False),
        ]

    def test_non_class_emits_only_resource_children(self):
        # striped text property under non-owl:Class yields NOTHING (:247-252)
        xml = (
            RDF_HDR
            + '<owl:ObjectProperty rdf:about="http://x/p">'
            '<rdfs:domain rdf:resource="http://x/D"/>'
            "<rdfs:comment>swallowed</rdfs:comment>"
            "</owl:ObjectProperty></rdf:RDF>"
        )
        assert _walk_rdfxml(xml) == [("http://x/p", "rdfs:domain", "http://x/D", False)]

    def test_blank_subject_repair(self):
        # empty subject → '_:blank' (:218)
        xml = RDF_HDR + "<owl:Class><rdfs:label>anon</rdfs:label></owl:Class></rdf:RDF>"
        assert _walk_rdfxml(xml) == [("_:blank", "rdfs:label", "anon", True)]

    def test_literal_typing_rule(self):
        # startsWith('http') is the ONLY typing rule (:222) — 'https' too,
        # but also junk like 'httpfoo' (faithfully quirky)
        xml = RDF_HDR + '<owl:Class rdf:about="http://x/C"><p>httpfoo</p></owl:Class></rdf:RDF>'
        assert _walk_rdfxml(xml) == [("http://x/C", "p", "httpfoo", False)]

    def test_rdf_description_is_transparent(self):
        # rdf:Description recurses with inherited subject (:256-260); its
        # resource-carrying leaf children emit nothing (recursion quirk)
        xml = (
            RDF_HDR
            + '<rdf:Description rdf:about="http://x/d">'
            '<rdf:type rdf:resource="http://x/T"/>'
            "</rdf:Description></rdf:RDF>"
        )
        assert _walk_rdfxml(xml) == []

    def test_subject_inheritance_through_nesting(self):
        # inner element without rdf:about inherits outer subject (:231)
        xml = (
            RDF_HDR
            + '<ex:Thing xmlns:ex="http://e/" rdf:about="http://x/t">'
            '<ex:rel><ex:inner rdf:resource="http://x/o"/></ex:rel>'
            "</ex:Thing></rdf:RDF>"
        )
        # ex:rel has children → recurse; inside, inner has rdf:resource → emit
        assert _walk_rdfxml(xml) == [("http://x/t", "ex:inner", "http://x/o", False)]

    def test_malformed_xml_yields_nothing(self):
        assert _walk_rdfxml("<not closed") == []


@pytest.fixture(scope="module")
def fixture_corpus():
    return gen_transcripts(seed=42, n_convs=30, turns_per_conv=12)


@pytest.fixture(scope="module")
def extracted(spark, fixture_corpus):
    tdf = fixture_corpus.transcripts_df(spark)
    return extract_all(tdf).cache()


def _pr(spark, extracted, golden_df):
    got = extracted.select("subj", "pred", "obj", "obj_is_literal").distinct()
    want = golden_df.select("subj", "pred", "obj", "obj_is_literal").distinct()
    tp = got.intersect(want).count()
    n_got = got.count()
    n_want = want.count()
    precision = tp / n_got if n_got else 0.0
    recall = tp / n_want if n_want else 0.0
    return precision, recall, got, want


def test_extraction_precision_recall(spark, fixture_corpus, extracted):
    golden = fixture_corpus.golden_df(spark)
    precision, recall, got, want = _pr(spark, extracted, golden)
    if precision < 1.0 or recall < 1.0:
        print("FALSE POSITIVES:")
        got.exceptAll(want.intersect(got)).show(50, False)
        print("MISSED:")
        want.exceptAll(got.intersect(want)).show(50, False)
    assert precision >= 0.95, f"precision {precision}"
    assert recall >= 0.95, f"recall {recall}"


def test_extraction_provenance_and_graph(extracted):
    # every triple carries provenance; graph == src conversation
    assert extracted.filter(F.col("src_conv_id").isNull()).count() == 0
    assert extracted.filter(F.col("graph") != F.col("src_conv_id")).count() == 0


def test_extraction_deterministic_under_row_order(spark, fixture_corpus):
    tdf = fixture_corpus.transcripts_df(spark)
    shuffled = tdf.orderBy(F.md5(F.concat_ws("|", "conv_id", F.col("turn_idx").cast("string"))))
    a = extract_all(tdf).select("subj", "pred", "obj").distinct()
    b = extract_all(shuffled).select("subj", "pred", "obj").distinct()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_dedup_set_semantics(spark, extracted):
    deduped = dedup_triples(extracted)
    n = deduped.count()
    assert deduped.select("subj", "pred", "obj", "obj_is_literal", "graph").distinct().count() == n
    # idempotent
    assert dedup_triples(deduped).count() == n


def test_ntriples_roundtrip(spark):
    from graphforge_spark.functions.terms import ntriples_line

    rows = [
        ("conv-0", 0, "tool", '<http://a> <http://p> "lit with \\"quote\\"" .', "ntriples", None),
        ("conv-0", 1, "tool", "<http://a> <http://p> <http://b> .", "ntriples", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    parsed = extract_ntriples(df)
    out = parsed.select(
        ntriples_line(
            F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_is_literal")
        ).alias("line")
    ).collect()
    lines = sorted(r.line for r in out)
    assert lines == sorted(
        ['<http://a> <http://p> "lit with \\"quote\\"" .', "<http://a> <http://p> <http://b> ."]
    )


def test_pattern_extraction_blank_subject(spark):
    df = spark.createDataFrame(
        [("c1", 0, "user", "see http://ex.org/x now", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    rows = extract_patterns(df).collect()
    assert len(rows) == 1
    assert rows[0].subj == "_:b_c1_0"
    assert rows[0].obj == "http://ex.org/x"
    assert rows[0].obj_is_literal is False


class TestHostileInputs:
    """Quarantine semantics: bad rows yield no triples, never exceptions
    (at 100 TB a poison row must not kill the job)."""

    def test_null_and_empty_text_and_unknown_tool(self, spark):
        from graphforge_spark.operators.extract import extract_all
        from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

        rows = [
            ("c1", 0, "user", None, None, None),          # null text → pattern path
            ("c1", 1, "user", "", None, None),            # empty text
            ("c1", 2, "tool", None, "rdfxml", None),      # null text → XML path
            ("c1", 3, "tool", "", "ntriples", None),      # empty text → NT path
            ("c1", 4, "tool", "Alice works at Acme.", "weird_tool", None),  # unknown tool → pattern path
            ("c1", 5, "tool", "not xml at all", "rdfxml", None),
            ("c1", 6, "tool", "garbage <<< lines\nmore garbage", "ntriples", None),
        ]
        out = extract_all(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)).collect()
        # only the unknown-tool row carries an extractable fact
        assert {(r.subj, r.pred, r.obj) for r in out} == {
            ("http://ex.org/e/Alice", "http://ex.org/p/worksAt", "http://ex.org/e/Acme")
        }


class TestTurtleParser:
    """Subset-Turtle parser (reference .ttl path via N3.Parser,
    graphProcessor.js:151-163): prefixes, 'a', ';'/',' lists, lang/typed
    literals, comments, garbage resync."""

    def test_full_feature_document(self, spark):
        from graphforge_spark.operators.extract import extract_turtle
        from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

        ttl = "\n".join(
            [
                "@prefix ex: <http://ex.org/> .",
                "# a comment line",
                'ex:alice a ex:Person ;',
                '  ex:name "Alice"@en , "Alicia" ;',
                '  ex:age "30"^^<http://www.w3.org/2001/XMLSchema#int> ;',
                "  ex:knows ex:bob , _:anon .",
                "<http://ex.org/bob> ex:name \"Bob\" .",
            ]
        )
        df = spark.createDataFrame(
            [("c", 0, "tool", ttl, "turtle", None)], TRANSCRIPT_SCHEMA
        )
        got = {(r.subj, r.pred, r.obj, r.obj_is_literal) for r in extract_turtle(df).collect()}
        EX = "http://ex.org/"
        RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        assert got == {
            (EX + "alice", RDF_TYPE, EX + "Person", False),
            (EX + "alice", EX + "name", "Alice", True),
            (EX + "alice", EX + "name", "Alicia", True),
            (EX + "alice", EX + "age", "30", True),
            (EX + "alice", EX + "knows", EX + "bob", False),
            (EX + "alice", EX + "knows", "_:anon", False),
            (EX + "bob", EX + "name", "Bob", True),
        }

    def test_garbage_resync(self, spark):
        from graphforge_spark.operators.extract import extract_turtle
        from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

        ttl = "%%% !! garbage\n<http://a> <http://p> <http://b> ."
        df = spark.createDataFrame(
            [("c", 0, "tool", ttl, "turtle", None)], TRANSCRIPT_SCHEMA
        )
        got = {(r.subj, r.pred, r.obj) for r in extract_turtle(df).collect()}
        assert got == {("http://a", "http://p", "http://b")}

    def test_full_grammar_forms(self):
        """Golden round-trip of the Turtle forms real ontologies (BFO,
        pizza — the reference's own demo corpus, fileSystem.js:280-281)
        use beyond the easy subset: @base + relative IRIs, collections,
        blank-node property lists (nested object + standalone subject),
        numeric/boolean literals, long strings, escape decoding."""
        from graphforge_spark.operators.extract import _parse_turtle

        RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
        ttl = """
            BASE <http://base.org/>
            @prefix ex: <http://ex.org/> .
            <rel> ex:p <#frag> .
            ex:s ex:list (1 2.5 "three") .
            ex:who ex:knows [ ex:name "Anon" ; ex:age 41 ] .
            [ ex:label "standalone" ] .
            ex:t ex:flag true , false .
            ex:u ex:note \"\"\"multi
            line \\"q\\" text\"\"\" .
            ex:v ex:esc "tab\\there \\\\t kept \\u0041" .
            ex:empty ex:l () .
        """
        got = {(s, p, o, lit) for s, p, o, lit, _, _ in _parse_turtle(ttl)}
        EX = "http://ex.org/"
        assert ("http://base.org/rel", EX + "p", "http://base.org/#frag", False) in got
        # collection spine: s → gb1 →first 1, →rest gb2 … → nil
        assert (EX + "s", EX + "list", "_:gb1", False) in got
        assert ("_:gb1", RDF + "first", "1", True) in got
        assert ("_:gb2", RDF + "first", "2.5", True) in got
        assert ("_:gb3", RDF + "first", "three", True) in got
        assert ("_:gb3", RDF + "rest", RDF + "nil", False) in got
        # bnode property list in object position
        assert (EX + "who", EX + "knows", "_:gb4", False) in got
        assert ("_:gb4", EX + "name", "Anon", True) in got
        assert ("_:gb4", EX + "age", "41", True) in got
        # standalone subject bnode list
        assert ("_:gb5", EX + "label", "standalone", True) in got
        # booleans keep their lexical form as literals
        assert (EX + "t", EX + "flag", "true", True) in got
        assert (EX + "t", EX + "flag", "false", True) in got
        # long string with newline + escaped quotes
        note = next(o for s, p, o, *_ in got if p == EX + "note")
        assert '"q"' in note and "\n" in note
        # single-pass escapes: \\t stays backslash-t, \t decodes, A='A'
        assert (EX + "v", EX + "esc", "tab\there \\t kept A", True) in got
        # empty collection is rdf:nil
        assert (EX + "empty", EX + "l", RDF + "nil", False) in got

    def test_statement_quarantine_no_partial_emission(self):
        """A statement that fails mid-parse contributes NOTHING (triples
        buffer per statement); neighbors still parse."""
        from graphforge_spark.operators.extract import _parse_turtle

        ttl = (
            "@prefix ex: <http://ex.org/> .\n"
            "ex:good ex:p ex:q .\n"
            'ex:bad ex:p "unterminated ;\n'
            "ex:also_good ex:p ex:r .\n"
        )
        got = {(s, p, o) for s, p, o, *_ in _parse_turtle(ttl)}
        EX = "http://ex.org/"
        assert (EX + "good", EX + "p", EX + "q") in got
        assert (EX + "also_good", EX + "p", EX + "r") in got
        assert not any(s == EX + "bad" for s, _, _ in got)


class TestLiteralAnnotations:
    """Literal @lang / ^^datatype fidelity (the reference's N3 store keeps
    annotations through its N-Quads round trip, fileSystem.js:483-487)."""

    def test_turtle_parser_captures_annotations(self):
        from graphforge_spark.operators.extract import _parse_turtle

        ttl = (
            "@prefix ex: <http://ex.org/> .\n"
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
            'ex:s ex:l "pizza"@en , "pizza"@it-IT , "plain" ;\n'
            '  ex:d "12.50"^^xsd:decimal ;\n'
            '  ex:w "2020-01-01"^^<http://www.w3.org/2001/XMLSchema#date> ;\n'
            "  ex:n 42 ; ex:f 3.5 ; ex:e 1e3 ; ex:b true .\n"
        )
        XSD = "http://www.w3.org/2001/XMLSchema#"
        got = {(p.rsplit("/", 1)[1], o, lang, dt) for _, p, o, _, lang, dt in _parse_turtle(ttl)}
        assert ("l", "pizza", "en", None) in got
        assert ("l", "pizza", "it-IT", None) in got
        assert ("l", "plain", None, None) in got
        # pname datatype expands through the prefix table; <iri> stays as-is
        assert ("d", "12.50", None, XSD + "decimal") in got
        assert ("w", "2020-01-01", None, XSD + "date") in got
        # bare numerics/booleans get their implicit XSD datatype (N3.js rule)
        assert ("n", "42", None, XSD + "integer") in got
        assert ("f", "3.5", None, XSD + "decimal") in got
        assert ("e", "1e3", None, XSD + "double") in got
        assert ("b", "true", None, XSD + "boolean") in got

    def test_extract_turtle_annotation_columns_opt_in(self, spark):
        from graphforge_spark.operators.extract import extract_turtle
        from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

        ttl = '@prefix ex: <http://ex.org/> .\nex:s ex:l "pizza"@en .'
        df = spark.createDataFrame([("c", 0, "tool", ttl, "turtle", None)], TRANSCRIPT_SCHEMA)
        # default: schema unchanged (no annotation columns)
        assert "obj_lang" not in extract_turtle(df).columns
        rows = extract_turtle(df, with_annotations=True).collect()
        assert [(r.obj, r.obj_lang, r.obj_dt) for r in rows] == [("pizza", "en", None)]

    def test_extract_ntriples_annotations_and_roundtrip(self, spark):
        from graphforge_spark.functions.terms import ntriples_line

        nt = "\n".join(
            [
                '<http://a> <http://p> "hola"@es .',
                '<http://a> <http://p> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .',
                '<http://a> <http://p> "plain" .',
                "<http://a> <http://p> <http://b> .",
            ]
        )
        df = spark.createDataFrame(
            [("c", 0, "tool", nt, "ntriples", None)],
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
        )
        assert "obj_lang" not in extract_ntriples(df).columns
        parsed = extract_ntriples(df, with_annotations=True)
        got = {(r.obj, r.obj_lang, r.obj_dt) for r in parsed.collect()}
        assert got == {
            ("hola", "es", None),
            ("3", None, "http://www.w3.org/2001/XMLSchema#integer"),
            ("plain", None, None),
            ("http://b", None, None),
        }
        # serialize back with annotations: every source line survives verbatim
        out = parsed.select(
            ntriples_line(
                F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_is_literal"),
                obj_lang=F.col("obj_lang"), obj_dt=F.col("obj_dt"),
            ).alias("line")
        ).collect()
        assert sorted(r.line for r in out) == sorted(nt.split("\n"))

    def test_export_ntriples_autodetects_annotation_columns(self, spark, tmp_path):
        from graphforge_spark.sinks.ntriples import export_ntriples

        df = spark.createDataFrame(
            [
                ("http://s", "http://p", "bonjour", True, "g", "fr", None),
                ("http://s", "http://p", "5", True, "g", None,
                 "http://www.w3.org/2001/XMLSchema#integer"),
            ],
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "graph string, obj_lang string, obj_dt string",
        )
        path = str(tmp_path / "nt")
        export_ntriples(df, path)
        lines = sorted(r.value for r in spark.read.text(path).collect())
        assert lines == [
            '<http://s> <http://p> "5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
            '<http://s> <http://p> "bonjour"@fr .',
        ]

    def test_xsd_string_normalizes_to_plain(self, spark):
        """RDF 1.1 term identity: "a" and "a"^^xsd:string are ONE term —
        both parsers normalize the explicit form, so dedup keeps one quad."""
        from graphforge_spark.operators.extract import _parse_turtle, dedup_triples
        from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

        ttl = (
            "@prefix ex: <http://ex.org/> .\n"
            "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
            'ex:s ex:p "a" , "a"^^xsd:string .'
        )
        rows = _parse_turtle(ttl)
        assert [(o, lang, dt) for _, _, o, _, lang, dt in rows] == [
            ("a", None, None), ("a", None, None)
        ]
        nt = (
            '<http://s> <http://p> "a" .\n'
            '<http://s> <http://p> "a"^^<http://www.w3.org/2001/XMLSchema#string> .'
        )
        df = spark.createDataFrame([("c", 0, "t", nt, "ntriples", None)], TRANSCRIPT_SCHEMA)
        parsed = extract_ntriples(df, with_annotations=True).withColumn(
            "graph", F.lit("g")
        )
        assert parsed.count() == 2
        assert dedup_triples(parsed).count() == 1  # one term, one quad


def test_read_triples_merges_mixed_annotation_schemas(spark, tmp_path):
    """A warehouse mixing pre-annotation 7-column partitions with
    9-column ones must surface the annotation columns for ALL rows
    (mergeSchema), never silently drop them on footer-inference luck."""
    from graphforge_spark.sinks.tables import read_triples

    wh = str(tmp_path / "wh")
    old = spark.createDataFrame(
        [("http://s", "http://p", "x", True, "g", "c0", 0, 1)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "graph string, src_conv_id string, src_turn_idx int, part_id int",
    )
    new = spark.createDataFrame(
        [("http://s", "http://p", "y", True, "g", "c1", 0, "en", None, 2)],
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "graph string, src_conv_id string, src_turn_idx int, "
        "obj_lang string, obj_dt string, part_id int",
    )
    old.write.partitionBy("part_id").parquet(f"{wh}/triples")
    new.write.mode("append").partitionBy("part_id").parquet(f"{wh}/triples")
    t = read_triples(spark, wh)
    assert {"obj_lang", "obj_dt"} <= set(t.columns)
    got = {(r.obj, r.obj_lang) for r in t.collect()}
    assert got == {("x", None), ("y", "en")}
