"""SHACL-lite validator: curated violation cases plus a randomized
differential against a pure-Python replay of the same constraint
semantics."""

import random
import re

import pytest

from graphforge_spark.operators.validate import Shape, conforms, validate

EX = "http://ex.org/"
PERSON, ORG = EX + "Person", EX + "Org"
WORKS_AT, NAME, AGE = EX + "worksAt", EX + "name", EX + "age"
TYPE = "rdf:type"


def _t(s, p, o, lit=False, g=None):
    return (s, p, o, lit, g)


TRIPLES = [
    # alice: conformant (one org-typed worksAt, one name matching pattern)
    _t(EX + "alice", TYPE, PERSON),
    _t(EX + "alice", WORKS_AT, EX + "acme"),
    _t(EX + "alice", NAME, "Alice", lit=True),
    _t(EX + "acme", TYPE, ORG),
    # bob: no worksAt (minCount), name lowercase (pattern)
    _t(EX + "bob", TYPE, PERSON),
    _t(EX + "bob", NAME, "bob", lit=True),
    # carol: TWO worksAt (maxCount), one pointing at an untyped node (class),
    # one worksAt value is a literal (nodeKind)
    _t(EX + "carol", TYPE, PERSON),
    _t(EX + "carol", WORKS_AT, EX + "untyped_co"),
    _t(EX + "carol", WORKS_AT, "Globex Inc", lit=True),
    _t(EX + "carol", NAME, "Carol", lit=True),
    # duplicate type assertion must NOT double counts
    _t(EX + "carol", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", PERSON),
]

SHAPES = [
    Shape("employment", PERSON, WORKS_AT, min_count=1, max_count=1,
          node_kind="iri", class_constraint=ORG),
    Shape("naming", PERSON, NAME, min_count=1, pattern=r"^[A-Z]"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string, obj_is_literal boolean, graph string"
    )


def test_curated_violations(spark, triples):
    got = {
        (r.shape, r.focus, r.constraint, r.value)
        for r in validate(triples, SHAPES).collect()
    }
    assert got == {
        ("employment", EX + "bob", "minCount", None),
        ("employment", EX + "carol", "maxCount", None),
        ("employment", EX + "carol", "nodeKind", "Globex Inc"),
        ("employment", EX + "carol", "class", EX + "untyped_co"),
        # a literal can never be an instance of Org → sh:class flags it too
        ("employment", EX + "carol", "class", "Globex Inc"),
        ("naming", EX + "bob", "pattern", "bob"),
    }
    assert not conforms(triples, SHAPES)


def test_conformant_store(spark):
    ok = spark.createDataFrame(
        [_t(EX + "a", TYPE, PERSON), _t(EX + "a", WORKS_AT, EX + "acme"),
         _t(EX + "a", NAME, "Ann", lit=True), _t(EX + "acme", TYPE, ORG)],
        "subj string, pred string, obj string, obj_is_literal boolean, graph string",
    )
    assert conforms(ok, SHAPES)
    assert validate(ok, SHAPES).count() == 0


def test_shape_validation_errors():
    with pytest.raises(ValueError, match="min_count"):
        Shape("s", PERSON, NAME, min_count=-1)
    with pytest.raises(ValueError, match="max_count"):
        Shape("s", PERSON, NAME, min_count=2, max_count=1)
    with pytest.raises(ValueError, match="node_kind"):
        Shape("s", PERSON, NAME, node_kind="uri")
    with pytest.raises(ValueError, match="duplicate"):
        from graphforge_spark.operators.validate import _shapes_df
        _shapes_df(None, [Shape("s", PERSON, NAME), Shape("s", ORG, NAME)])
    with pytest.raises(ValueError, match="at least one"):
        from graphforge_spark.operators.validate import _shapes_df
        _shapes_df(None, [])


def _python_validate(triples, shapes):
    """Independent replay of the constraint semantics."""
    types = {(s, o) for s, p, o, lit, g in triples if p in (TYPE, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")}
    out = set()
    for sh in shapes:
        focus = {s for s, c in types if c == sh.target_class}
        for f in focus:
            vals = [(o, lit) for s, p, o, lit, g in triples if s == f and p == sh.path]
            n = len(vals)
            if n < sh.min_count:
                out.add((sh.name, f, "minCount", None))
            if sh.max_count is not None and n > sh.max_count:
                out.add((sh.name, f, "maxCount", None))
            for o, lit in vals:
                kind = "literal" if lit else ("blank" if o.startswith("_:") else "iri")
                if sh.node_kind and kind != sh.node_kind:
                    out.add((sh.name, f, "nodeKind", o))
                if sh.class_constraint and (o, sh.class_constraint) not in types:
                    out.add((sh.name, f, "class", o))
                if sh.pattern and lit and not re.search(sh.pattern, o):
                    out.add((sh.name, f, "pattern", o))
    return out


def test_differential_fuzzer(spark):
    rng = random.Random(7)
    classes = [EX + c for c in ("A", "B", "C")]
    preds = [EX + p for p in ("p1", "p2")]
    nodes = [EX + f"n{i}" for i in range(12)] + [f"_:b{i}" for i in range(3)]
    for trial in range(5):
        triples = []
        for n in nodes:
            if rng.random() < 0.8:
                triples.append(_t(n, TYPE, rng.choice(classes)))
            for p in preds:
                for _ in range(rng.randrange(0, 3)):
                    if rng.random() < 0.5:
                        triples.append(_t(n, p, rng.choice(nodes)))
                    else:
                        triples.append(_t(n, p, rng.choice(["Val", "xx", "Zed"]), lit=True))
        # dedup: the store has set semantics
        triples = list(dict.fromkeys(triples))
        shapes = []
        for i in range(3):
            mn = rng.randrange(0, 2)
            mx = rng.choice([None, mn, mn + 1])
            shapes.append(
                Shape(f"s{i}", rng.choice(classes), rng.choice(preds),
                      min_count=mn, max_count=mx,
                      node_kind=rng.choice([None, "iri", "literal"]),
                      class_constraint=rng.choice([None, rng.choice(classes)]),
                      pattern=rng.choice([None, r"^[A-Z]"]))
            )
        df = spark.createDataFrame(
            triples,
            "subj string, pred string, obj string, obj_is_literal boolean, graph string",
        )
        got = {
            (r.shape, r.focus, r.constraint, r.value)
            for r in validate(df, shapes).collect()
        }
        want = _python_validate(triples, shapes)
        assert got == want, f"trial {trial}: {got ^ want}"


def test_duplicate_triples_count_once(spark):
    # RDF set semantics: the same triple asserted twice is ONE value
    dup = spark.createDataFrame(
        [_t(EX + "a", TYPE, PERSON),
         _t(EX + "a", WORKS_AT, EX + "acme"),
         _t(EX + "a", WORKS_AT, EX + "acme"),
         _t(EX + "acme", TYPE, ORG)],
        "subj string, pred string, obj string, obj_is_literal boolean, graph string",
    )
    shape = Shape("emp", PERSON, WORKS_AT, min_count=1, max_count=1,
                  node_kind="iri", class_constraint=ORG)
    assert validate(dup, [shape]).count() == 0  # no false maxCount
    assert conforms(dup, [shape])


class TestDatatypeConstraint:
    """sh:datatype over the annotation columns (obj_lang/obj_dt)."""

    XSD = "http://www.w3.org/2001/XMLSchema#"
    RDF_LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

    def _store(self, spark):
        X = self.XSD
        rows = [
            # dave: age typed xsd:integer (conformant), name plain (string)
            (EX + "dave", TYPE, PERSON, False, None, None, None),
            (EX + "dave", AGE, "41", True, None, None, X + "integer"),
            (EX + "dave", NAME, "Dave", True, None, None, None),
            # erin: age typed xsd:decimal (wrong dt), name lang-tagged
            # (effective rdf:langString, not xsd:string)
            (EX + "erin", TYPE, PERSON, False, None, None, None),
            (EX + "erin", AGE, "7.5", True, None, None, X + "decimal"),
            (EX + "erin", NAME, "Erin", True, None, "en", None),
            # frank: age is an IRI (non-literal under a datatype constraint)
            (EX + "frank", TYPE, PERSON, False, None, None, None),
            (EX + "frank", AGE, EX + "forty", True, None, None, None),
            (EX + "frank", AGE, EX + "iri_age", False, None, None, None),
        ]
        return spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "graph string, obj_lang string, obj_dt string",
        )

    def test_effective_datatype_semantics(self, spark):
        X = self.XSD
        shapes = [
            Shape("age_int", PERSON, AGE, datatype=X + "integer"),
            Shape("name_str", PERSON, NAME, datatype=X + "string"),
        ]
        got = {
            (r.shape, r.focus, r.value, r.actual)
            for r in validate(self._store(spark), shapes)
            .filter("constraint = 'datatype'")
            .collect()
        }
        assert got == {
            # wrong explicit datatype
            ("age_int", EX + "erin", "7.5", X + "decimal"),
            # plain literal whose lexical form happens to look like an IRI
            ("age_int", EX + "frank", EX + "forty", X + "string"),
            # actual non-literal value
            ("age_int", EX + "frank", EX + "iri_age", "non-literal"),
            # lang-tagged literal is rdf:langString, never xsd:string
            ("name_str", EX + "erin", "Erin", self.RDF_LS),
        }

    def test_core_schema_store_is_all_plain(self, spark, triples):
        # a store without annotation columns: every literal is xsd:string
        shapes = [Shape("name_str", PERSON, NAME, datatype=self.XSD + "string")]
        assert (
            validate(triples, shapes).filter("constraint = 'datatype'").count() == 0
        )
        shapes = [Shape("name_int", PERSON, NAME, datatype=self.XSD + "integer")]
        bad = validate(triples, shapes).filter("constraint = 'datatype'")
        assert bad.count() == 3  # every person's name literal violates
        assert {r.actual for r in bad.collect()} == {self.XSD + "string"}

    def test_annotated_values_count_separately(self, spark):
        # "a"@en and "a"@fr are two values → maxCount=1 violates
        rows = [
            (EX + "gail", TYPE, PERSON, False, None, None, None),
            (EX + "gail", NAME, "Gail", True, None, "en", None),
            (EX + "gail", NAME, "Gail", True, None, "fr", None),
        ]
        df = spark.createDataFrame(
            rows,
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "graph string, obj_lang string, obj_dt string",
        )
        got = validate(df, [Shape("one_name", PERSON, NAME, max_count=1)])
        assert [r.constraint for r in got.collect()] == ["maxCount"]


RDF_LS_T = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


def _python_validate_annotated(triples, shapes):
    """Independent replay over 7-tuple rows (s, p, o, lit, g, lang, dt),
    including sh:datatype effective-datatype semantics and annotation-
    aware value identity."""
    XSD_STR = "http://www.w3.org/2001/XMLSchema#string"
    RDF_LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    types = {
        (s, o)
        for s, p, o, lit, g, lang, dt in triples
        if p in (TYPE, "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
    }
    out = set()
    for sh in shapes:
        focus = {s for s, c in types if c == sh.target_class}
        for f in focus:
            vals = list(
                dict.fromkeys(
                    (o, lit, lang, dt)
                    for s, p, o, lit, g, lang, dt in triples
                    if s == f and p == sh.path
                )
            )
            n = len(vals)
            if n < sh.min_count:
                out.add((sh.name, f, "minCount", None))
            if sh.max_count is not None and n > sh.max_count:
                out.add((sh.name, f, "maxCount", None))
            for o, lit, lang, dt in vals:
                kind = "literal" if lit else ("blank" if o.startswith("_:") else "iri")
                if sh.node_kind and kind != sh.node_kind:
                    out.add((sh.name, f, "nodeKind", o))
                if sh.class_constraint and (o, sh.class_constraint) not in types:
                    out.add((sh.name, f, "class", o))
                if sh.pattern and lit and not re.search(sh.pattern, o):
                    out.add((sh.name, f, "pattern", o))
                if sh.datatype:
                    if not lit:
                        eff = None
                    elif lang is not None:
                        eff = RDF_LS
                    else:
                        eff = dt or XSD_STR
                    if eff != sh.datatype:
                        out.add((sh.name, f, "datatype", o))
    return out


def test_differential_fuzzer_annotated(spark):
    """Randomized differential with annotated literals: datatype
    constraints plus annotation-aware cardinality."""
    X = "http://www.w3.org/2001/XMLSchema#"
    rng = random.Random(23)
    classes = [EX + c for c in ("A", "B")]
    preds = [EX + p for p in ("p1", "p2")]
    nodes = [EX + f"n{i}" for i in range(10)]
    langs = [None, "en", "fr"]
    dts = [None, X + "integer", X + "date"]
    for trial in range(5):
        triples = []
        for n in nodes:
            if rng.random() < 0.85:
                triples.append((n, TYPE, rng.choice(classes), False, None, None, None))
            for p in preds:
                for _ in range(rng.randrange(0, 3)):
                    if rng.random() < 0.35:
                        triples.append(
                            (n, p, rng.choice(nodes), False, None, None, None)
                        )
                    else:
                        lang = rng.choice(langs)
                        dt = None if lang is not None else rng.choice(dts)
                        triples.append(
                            (n, p, rng.choice(["Val", "7", "zed"]), True, None, lang, dt)
                        )
        triples = list(dict.fromkeys(triples))
        shapes = [
            Shape(
                f"s{i}", rng.choice(classes), rng.choice(preds),
                min_count=rng.randrange(0, 2),
                max_count=rng.choice([None, 1, 2]),
                node_kind=rng.choice([None, "literal"]),
                pattern=rng.choice([None, r"^[A-Z0-9]"]),
                datatype=rng.choice([None, X + "integer", X + "string", RDF_LS_T]),
            )
            for i in range(3)
        ]
        # normalize max_count >= min_count (Shape validates)
        shapes = [
            sh if sh.max_count is None or sh.max_count >= sh.min_count
            else Shape(sh.name, sh.target_class, sh.path, sh.min_count, None,
                       sh.node_kind, sh.class_constraint, sh.pattern, sh.datatype)
            for sh in shapes
        ]
        df = spark.createDataFrame(
            triples,
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "graph string, obj_lang string, obj_dt string",
        )
        got = {
            (r.shape, r.focus, r.constraint, r.value)
            for r in validate(df, shapes).collect()
        }
        want = _python_validate_annotated(triples, shapes)
        assert got == want, f"trial {trial}: {got ^ want}"
