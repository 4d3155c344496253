"""Property test for the Turtle recursive-descent parser: random
documents assembled from the grammar forms the engine supports —
@prefix, curie vs full-IRI subjects, ``;`` predicate lists, ``,``
object lists, short/long strings, escape sequences, numeric and
boolean literals — rendered by an independent test-local writer, then
parsed with ``extract_turtle`` and compared (as triple sets) against
the writer's own fact list. Complements the deterministic golden
round-trips in test_extract with combinatorial structure.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from graphforge_spark.operators.extract import extract_turtle

EX = "http://ex.org/e/"
P = "http://ex.org/p/"

_SAFE = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
    min_size=1,
    max_size=8,
)

# (escape sequence as written, decoded character)
_ESCAPES = [
    (r"\n", "\n"),
    (r"\t", "\t"),
    (r"\"", '"'),
    ("\\\\", "\\"),
    (r"A", "A"),
]


XSD = "http://www.w3.org/2001/XMLSchema#"

# literal annotation: (rendered suffix, expected lang, expected dt)
_ANNOTATIONS = [
    ("", None, None),
    ("@en", "en", None),
    ("@en-US", "en-US", None),
    ("@fr", "fr", None),
    # RDF 1.1: ^^xsd:string IS the plain literal — normalized away at capture
    (f"^^<{XSD}string>", None, None),
    ("^^xsd:date", None, XSD + "date"),
]


@st.composite
def _object(draw):
    """Return (rendered_turtle, expected_obj, is_literal, lang, dt)."""
    kind = draw(
        st.sampled_from(
            ["iri", "curie", "str", "esc", "longstr", "int", "dec", "bool"]
        )
    )
    if kind == "iri":
        name = draw(_SAFE)
        return f"<{EX}{name}>", f"{EX}{name}", False, None, None
    if kind == "curie":
        name = draw(_SAFE)
        return f"ex:{name}", f"{EX}{name}", False, None, None
    if kind == "str":
        body = draw(_SAFE)
        suf, lang, dt = draw(st.sampled_from(_ANNOTATIONS))
        return f'"{body}"{suf}', body, True, lang, dt
    if kind == "esc":
        pieces = draw(st.lists(st.sampled_from(_ESCAPES), min_size=1, max_size=4))
        pre = draw(_SAFE)
        rendered = pre + "".join(w for w, _ in pieces)
        decoded = pre + "".join(d for _, d in pieces)
        suf, lang, dt = draw(st.sampled_from(_ANNOTATIONS))
        return f'"{rendered}"{suf}', decoded, True, lang, dt
    if kind == "longstr":
        lines = draw(st.lists(_SAFE, min_size=1, max_size=3))
        body = "\n".join(lines)
        suf, lang, dt = draw(st.sampled_from(_ANNOTATIONS))
        return f'"""{body}"""{suf}', body, True, lang, dt
    # bare numerics/booleans carry their implicit XSD datatype (N3.js rule)
    if kind == "int":
        n = draw(st.integers(-999, 999))
        return str(n), str(n), True, None, XSD + "integer"
    if kind == "dec":
        a, b = draw(st.integers(0, 99)), draw(st.integers(0, 99))
        return f"{a}.{b}", f"{a}.{b}", True, None, XSD + "decimal"
    lex = draw(st.sampled_from(["true", "false"]))
    return lex, lex, True, None, XSD + "boolean"


@st.composite
def turtle_docs(draw):
    """Return (document_text, expected_triple_set)."""
    facts = set()
    blocks = []
    for si in range(draw(st.integers(1, 3))):
        subj = f"{EX}s{si}"
        subj_txt = draw(st.sampled_from([f"ex:s{si}", f"<{subj}>"]))
        po_chunks = []
        for pi in range(draw(st.integers(1, 3))):
            pred = f"{P}p{pi}"
            pred_txt = draw(st.sampled_from([f"p:p{pi}", f"<{pred}>"]))
            objs = draw(st.lists(_object(), min_size=1, max_size=3))
            po_chunks.append(
                f"{pred_txt} " + " , ".join(o[0] for o in objs)
            )
            for _, expected, lit, lang, dt in objs:
                facts.add((subj, pred, expected, lit, lang, dt))
        sep = draw(st.sampled_from([" ;\n    ", " ; "]))
        blocks.append(f"{subj_txt} {sep.join(po_chunks)} .")
    doc = (
        f"@prefix ex: <{EX}> .\n@prefix p: <{P}> .\n"
        f"@prefix xsd: <{XSD}> .\n" + "\n".join(blocks)
    )
    return doc, facts


@pytest.fixture(scope="module")
def _shared(spark):
    return spark


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(doc=turtle_docs())
def test_turtle_parser_matches_writer(_shared, doc):
    spark = _shared
    text, expected = doc
    df = spark.createDataFrame(
        [("c0", 0, "tool", text, "turtle", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang, r.obj_dt)
        for r in extract_turtle(df, with_annotations=True).collect()
    }
    assert got == expected, text


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(doc=turtle_docs())
def test_turtle_to_ntriples_roundtrip(_shared, doc):
    """Full serialization closure: Turtle parse → N-Triples serialize →
    N-Triples parse must preserve every fact INCLUDING @lang/^^datatype
    annotations (the reference round-trips its store through N3 N-Quads
    text, fileSystem.js:483-487 — annotations must survive)."""
    from graphforge_spark.functions.terms import ntriples_line
    from graphforge_spark.operators.extract import extract_ntriples

    spark = _shared
    text, expected = doc
    df = spark.createDataFrame(
        [("c0", 0, "tool", text, "turtle", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    parsed = extract_turtle(df, with_annotations=True)
    lines = parsed.select(
        ntriples_line(
            F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_is_literal"),
            obj_lang=F.col("obj_lang"), obj_dt=F.col("obj_dt"),
        ).alias("line")
    ).collect()
    nt_text = "\n".join(r.line for r in lines)
    df2 = spark.createDataFrame(
        [("c0", 0, "tool", nt_text, "ntriples", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    got = {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.obj_lang, r.obj_dt)
        for r in extract_ntriples(df2, with_annotations=True).collect()
    }
    assert got == expected, nt_text


# ---------------------------------------------------------------------------
# Crash-safety: arbitrary hostile text must quarantine, never raise — a
# single garbage turn cannot be allowed to abort a 100 TB extraction job
# ---------------------------------------------------------------------------

_hostile = st.text(max_size=200).map(
    # salt with the structural characters most likely to derail parsers
    lambda s: s
)
_salts = st.sampled_from(
    [
        "", "@prefix", "@prefix :", "<", ">", '"""', '"\\', "( ", "[ ",
        "_:", "a ", ". .", "# c\n", "\\u12", "%GG", "<a> <b>", "<<<",
        '<?xml version="1.0"?><rdf:RDF', "</done>", "&amp;&bogus;",
    ]
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(body=_hostile, salt1=_salts, salt2=_salts)
def test_parsers_never_raise_on_hostile_text(_shared, body, salt1, salt2):
    from graphforge_spark.operators.extract import (
        _walk_rdfxml,
        extract_ntriples,
        extract_turtle,
    )

    text = f"{salt1}{body}{salt2}"
    # the XML walker is pure-Python: drive it directly (cheap), and the
    # Arrow-batched Turtle/N-Triples paths through one driver row each
    assert isinstance(_walk_rdfxml(text), list)
    spark = _shared
    df = spark.createDataFrame(
        [("c0", 0, "tool", text, "turtle", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    extract_turtle(df).count()  # must not raise
    df2 = df.withColumn("tool", F.lit("ntriples"))
    extract_ntriples(df2).count()  # must not raise
