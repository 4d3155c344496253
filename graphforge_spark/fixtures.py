"""Deterministic synthetic transcript corpus + golden expected triples.

This is the engine's correctness oracle (FIXTURES.md F1/F2/F3/F4): the
generator plants known facts into turn text in three formats (RDF/XML,
N-Triples, free-text patterns) and *independently* computes the triples the
reference's extraction rules (graphProcessor.js:203-304) would emit for
them. pytest asserts extraction P/R ≥ 0.95 against this golden set
(BASELINE.json metric) — in practice exact equality.

Everything is seeded and order-independent; no wall-clock, no randomness
outside the seeded PRNG; timestamps are base-epoch + turn_idx minutes
(FIXTURES.md F1). The reference's demo corpus (BFO/pizza ontologies fetched
from the network, docs/scripts/fileSystem.js:280-281) is replaced by these
generated equivalents — no external data.

Two generators:
- ``gen_transcripts``      — driver-side, small scale, WITH golden triples.
- ``gen_transcripts_dist`` — pure-Spark (spark.range + format_string),
  arbitrarily large, for throughput benchmarking; same row shape, planted
  patterns derived from ids so extraction yield is predictable.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

# Alias clusters for entity-linking / canonicalization tests (F3). One
# deliberately hot entity (large cluster) exercises salted-key skew handling.
ALIAS_CLUSTERS: dict[str, list[str]] = {
    "http://ex.org/e/Acme_Corp": [
        "Acme Corp",
        "Acme Corporation",
        "ACME Corp",
        "Acme Co",
        "The Acme Corp",
        "Acme Corp Inc",
        "Acme Corp International",
        "Acme Corp Global",
    ],
    "http://ex.org/e/Globex": ["Globex", "Globex Inc", "Globex Incorporated"],
    "http://ex.org/e/Initech": ["Initech", "Initech LLC"],
    "http://ex.org/e/Umbrella": ["Umbrella", "Umbrella Corp"],
}

PEOPLE = ["Alice Smith", "Bob Jones", "Carol White", "Dan Brown", "Eve Black"]
CITIES = ["Springfield", "Shelbyville", "Ogdenville"]
CLASSES = ["company", "person", "city"]
DISTRACTORS = (
    "the quick brown fox jumps over a lazy dog while data flows through "
    "spark executors and shuffle partitions hum quietly in the background"
).split()


@dataclass
class Fixture:
    rows: list[tuple] = field(default_factory=list)  # transcript rows
    golden: list[tuple] = field(default_factory=list)  # (subj,pred,obj,lit,conv,turn)

    def transcripts_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, TRANSCRIPT_SCHEMA)

    def golden_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.golden,
            "subj string, pred string, obj string, obj_is_literal boolean, "
            "src_conv_id string, src_turn_idx int",
        )


def _slug(surface: str) -> str:
    return surface.replace(" ", "_")


def _iri(surface: str) -> str:
    return f"http://ex.org/e/{_slug(surface)}"


def _rdfxml_class_doc(class_iri: str, label: str, parent_iri: str, members: list[str]) -> tuple[str, list]:
    """An owl:Class document exercising: literal emission under owl:Class,
    rdf:resource objects, and equivalentClass/oneOf expansion."""
    member_xml = "".join(f'<rdf:Description rdf:about="{m}"/>' for m in members)
    xml = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#">'
        f'<owl:Class rdf:about="{class_iri}">'
        f"<rdfs:label>{label}</rdfs:label>"
        f'<rdfs:subClassOf rdf:resource="{parent_iri}"/>'
        "<owl:equivalentClass><owl:Class><owl:oneOf>"
        f"{member_xml}"
        "</owl:oneOf></owl:Class></owl:equivalentClass>"
        "</owl:Class></rdf:RDF>"
    )
    golden = [
        (class_iri, "rdfs:label", label, True),
        (class_iri, "rdfs:subClassOf", parent_iri, not parent_iri.startswith("http")),
    ] + [(m, "rdf:type", class_iri, not class_iri.startswith("http")) for m in members]
    return xml, golden


def _rdfxml_property_doc(prop_iri: str, domain_iri: str, range_iri: str) -> tuple[str, list]:
    """owl:ObjectProperty: non-owl:Class path — only rdf:resource children
    emit; a striped text child (rdfs:comment) emits NOTHING (reference
    behavior, traverseXML:249 recursion swallows it)."""
    xml = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#">'
        f'<owl:ObjectProperty rdf:about="{prop_iri}">'
        f'<rdfs:domain rdf:resource="{domain_iri}"/>'
        f'<rdfs:range rdf:resource="{range_iri}"/>'
        "<rdfs:comment>this text is swallowed by the reference walker</rdfs:comment>"
        "</owl:ObjectProperty></rdf:RDF>"
    )
    golden = [
        (prop_iri, "rdfs:domain", domain_iri, not domain_iri.startswith("http")),
        (prop_iri, "rdfs:range", range_iri, not range_iri.startswith("http")),
    ]
    return xml, golden


def _rdfxml_blank_doc(label: str) -> tuple[str, list]:
    """Subject-less owl:Class at root → '_:blank' repair (graphProcessor.js:218)."""
    xml = (
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#">'
        f"<owl:Class><rdfs:label>{label}</rdfs:label></owl:Class></rdf:RDF>"
    )
    return xml, [("_:blank", "rdfs:label", label, True)]


def _ntriples_doc(facts: list[tuple[str, str, str, bool]]) -> tuple[str, list]:
    lines = []
    for s, p, o, lit in facts:
        obj = f'"{o}"' if lit else f"<{o}>"
        lines.append(f"<{s}> <{p}> {obj} .")
    return "\n".join(lines), list(facts)


def _turtle_doc(subject: str, facts: list[tuple[str, str, bool]]) -> tuple[str, list]:
    """Turtle document with @prefix, 'a' keyword, and a ';' predicate list
    (exercises the subset parser's prefixed-name and list handling)."""
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    lines = ["@prefix ex: <http://ex.org/e/> ."]
    body = []
    for p, o, lit in facts:
        if p == RDF_TYPE and not lit:
            body.append(f"a <{o}>")
        else:
            body.append(f"<{p}> " + (f'"{o}"' if lit else f"<{o}>"))
    lines.append(f"<{subject}> " + " ;\n  ".join(body) + " .")
    golden = [(subject, p, o, lit) for p, o, lit in facts]
    return "\n".join(lines), golden


def gen_transcripts(seed: int = 42, n_convs: int = 40, turns_per_conv: int = 12) -> Fixture:
    """Small-scale corpus with golden triples. ~n_convs*turns_per_conv rows."""
    rng = random.Random(seed)
    fx = Fixture()
    alias_items = [
        (canon, surface) for canon, surfaces in ALIAS_CLUSTERS.items() for surface in surfaces
    ]

    for ci in range(n_convs):
        conv = f"conv-{ci:06d}"
        for ti in range(turns_per_conv):
            role = ["user", "assistant", "tool", "system"][ti % 4]
            ts = BASE_TS + dt.timedelta(minutes=ti, hours=ci)
            kind = rng.random()
            tool = None
            golden_here: list = []

            if role == "tool" and kind < 0.45:
                tool = "rdfxml"
                which = rng.randrange(3)
                if which == 0:
                    canon = rng.choice(list(ALIAS_CLUSTERS))
                    members = rng.sample(
                        [_iri(p) for p in PEOPLE], k=rng.randrange(1, 4)
                    )
                    text, golden_here = _rdfxml_class_doc(
                        f"http://ex.org/c/class{ci}_{ti}",
                        f"Label {ci} {ti}",
                        canon,
                        members,
                    )
                elif which == 1:
                    text, golden_here = _rdfxml_property_doc(
                        f"http://ex.org/p/prop{ci}_{ti}",
                        f"http://ex.org/c/class{ci}",
                        "#LocalRange" if ti % 3 == 0 else f"http://ex.org/c/range{ti}",
                    )
                else:
                    text, golden_here = _rdfxml_blank_doc(f"anon label {ci} {ti}")
            elif role == "tool" and kind < 0.55:
                tool = "turtle"
                person = rng.choice(PEOPLE)
                text, golden_here = _turtle_doc(
                    _iri(person),
                    [
                        (
                            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                            "http://ex.org/c/person",
                            False,
                        ),
                        ("http://ex.org/p/bornIn", _iri(rng.choice(CITIES)), False),
                        ("http://ex.org/p/note", f"ttl note {ci}-{ti}", True),
                    ],
                )
            elif role == "tool" and kind < 0.7:
                tool = "ntriples"
                facts = []
                for _ in range(rng.randrange(1, 4)):
                    person = rng.choice(PEOPLE)
                    city = rng.choice(CITIES)
                    facts.append(
                        (
                            _iri(person),
                            "http://ex.org/p/bornIn",
                            _iri(city),
                            False,
                        )
                    )
                facts.append(
                    (
                        _iri(rng.choice(PEOPLE)),
                        "http://ex.org/p/note",
                        f"note {ci}-{ti}",
                        True,
                    )
                )
                text, golden_here = _ntriples_doc(facts)
            else:
                # free-text turn with planted pattern facts + distractors
                sentences = []
                for _ in range(rng.randrange(1, 3)):
                    form = rng.randrange(4)
                    if form == 0:
                        person = rng.choice(PEOPLE)
                        canon, surface = rng.choice(alias_items)
                        sentences.append(f"{person} works at {surface}.")
                        golden_here.append(
                            (
                                _iri(person),
                                "http://ex.org/p/worksAt",
                                _iri(surface),
                                False,
                            )
                        )
                    elif form == 1:
                        canon, surface = rng.choice(alias_items)
                        sentences.append(f"{surface} is a company.")
                        golden_here.append(
                            (
                                _iri(surface),
                                "rdf:type",
                                "http://ex.org/c/company",
                                False,
                            )
                        )
                    elif form == 2:
                        person = rng.choice(PEOPLE)
                        city = rng.choice(CITIES)
                        sentences.append(f"{person} is located in {city}.")
                        golden_here.append(
                            (
                                _iri(person),
                                "http://ex.org/p/locatedIn",
                                _iri(city),
                                False,
                            )
                        )
                    else:
                        iri = f"http://ex.org/doc/{ci}/{ti}"
                        sentences.append(f"see also {iri} for details.")
                        golden_here.append(
                            (f"_:b_{conv}_{ti}", "http://ex.org/p/mentionsIri", iri, False)
                        )
                        # the bare IRI also matches the mentions_iri rule? No —
                        # each planted IRI appears once; one golden row per match.
                    sentences.append(" ".join(rng.sample(DISTRACTORS, k=6)))
                text = " ".join(sentences)

            fx.rows.append((conv, ti, role, text, tool, ts))
            for s, p, o, lit in golden_here:
                fx.golden.append((s, p, o, lit, conv, ti))
    return fx


def gen_transcripts_dist(
    spark: SparkSession, n_convs: int, turns_per_conv: int,
    tasks_per_core: int = 4,
) -> DataFrame:
    """Distributed bench-scale transcripts: generated entirely JVM-side.

    Every turn is a free-text turn carrying exactly two pattern facts whose
    entities derive from the row id, so extraction yield = 2 triples/turn
    (plus overlap-driven dedup). Deterministic: no randomness at all.

    Partitioning: ``tasks_per_core × defaultParallelism`` input splits —
    tasks-per-core > 1 is how real clusters amortize stragglers (a stalled
    core delays one small task, not 1/Nth of the stage); with exactly one
    task per core a single noisy core sets the stage wall time.
    """
    n = n_convs * turns_per_conv
    parts = max(1, spark.sparkContext.defaultParallelism * tasks_per_core)
    base = spark.range(0, n, 1, parts).select(
        (F.col("id") / turns_per_conv).cast("long").alias("_conv"),
        (F.col("id") % turns_per_conv).cast("int").alias("turn_idx"),
        F.col("id"),
    )
    ent_a = F.concat(F.lit("Person"), (F.col("id") % 997).cast("string"))
    ent_b = F.concat(F.lit("Org"), (F.col("id") % 101).cast("string"))
    city = F.concat(F.lit("City"), (F.col("id") % 53).cast("string"))
    return base.select(
        F.format_string("conv-%06d", F.col("_conv")).alias("conv_id"),
        F.col("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool"), F.lit("system")),
            (F.col("turn_idx") % 4) + 1,
        ).alias("role"),
        F.concat(
            ent_a,
            F.lit(" works at "),
            ent_b,
            F.lit(". some filler text flows here while "),
            ent_a,
            F.lit(" is located in "),
            city,
            F.lit(". trailing distractor tokens follow the facts"),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        (F.lit(BASE_TS) + F.make_interval(mins=F.col("turn_idx"))).alias("ts"),
    )
