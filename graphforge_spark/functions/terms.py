"""RDF term handling as JVM-side column expressions (no Python UDFs).

Reference semantics being reproduced:
- IRI-vs-literal typing: ``objectValue.startsWith('http')``
  (docs/scripts/graphProcessor.js:222, duplicated :297 and
  docs/test HTML/SPARQL.html:169). Deliberately that exact rule — not a
  full IRI grammar — because parity with the reference's emitted triples
  is the correctness target.
- Prefix map injection (docs/scripts/graphProcessor.js:2,
  docs/scripts/queryManager.js:106-108): CURIE → IRI expansion from a
  small driver-side dict (broadcast by Catalyst as literals).
- N-Quads serialization (N3.Writer, docs/scripts/graphProcessor.js:76-105):
  line-oriented ``<s> <p> "o" .`` text, the canonical splittable export.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's default prefix vocabulary (PREFIX headers injected into
# queries, docs/scripts/document.js:930-946 and test pages).
DEFAULT_PREFIXES: dict[str, str] = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def is_iri(term: Column) -> Column:
    """The reference's term-typing rule: startsWith('http')."""
    return term.startswith("http")


def object_term(obj: Column) -> Column:
    """Return (obj, obj_is_literal) struct per graphProcessor.js:222."""
    return F.struct(obj.alias("obj"), (~is_iri(obj)).alias("obj_is_literal"))


def expand_curie(term: Column, prefixes: dict[str, str] | None = None) -> Column:
    """Expand ``prefix:local`` CURIEs to full IRIs using a literal prefix map.

    The map is tiny and driver-side (reference: global ``prefixes`` object),
    so this compiles to a chain of when/otherwise literals — fully
    codegen-able, no shuffle, no UDF.
    """
    prefixes = prefixes or DEFAULT_PREFIXES
    out = term
    for pfx, ns in prefixes.items():
        pat = pfx + ":"
        out = F.when(
            term.startswith(pat) & ~term.startswith("http"),
            F.concat(F.lit(ns), term.substr(F.lit(len(pat) + 1), F.length(term))),
        ).otherwise(out)
    return out


def _escape_literal(lit: Column) -> Column:
    r"""N-Triples literal escaping: backslash, quote, newline, CR, tab."""
    out = F.replace(lit, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    out = F.replace(out, F.lit("\r"), F.lit("\\r"))
    out = F.replace(out, F.lit("\t"), F.lit("\\t"))
    return out


def _term_iri(term: Column) -> Column:
    """Angle-bracket a term unless it is a blank node label."""
    return F.when(term.startswith("_:"), term).otherwise(F.concat(F.lit("<"), term, F.lit(">")))


def ntriples_line(
    subj: Column,
    pred: Column,
    obj: Column,
    obj_is_literal: Column,
    graph: Column | None = None,
    obj_lang: Column | None = None,
    obj_dt: Column | None = None,
) -> Column:
    """Format one triple/quad as an N-Triples/N-Quads line.

    Matches N3.Writer's application/n-quads output shape
    (graphProcessor.js:76): IRIs bracketed, literals quoted+escaped,
    blank nodes bare, terminating ``.``. Optional ``obj_lang``/``obj_dt``
    columns emit ``@lang`` / ``^^<datatype>`` suffixes on literals (lang
    wins when both are set, per RDF: a language-tagged literal's datatype
    is implied and never written).
    """
    lit_body = F.concat(F.lit('"'), _escape_literal(obj), F.lit('"'))
    if obj_lang is not None or obj_dt is not None:
        suffix = F.lit("")
        if obj_dt is not None:
            suffix = F.when(
                obj_dt.isNotNull() & (obj_dt != ""),
                F.concat(F.lit("^^<"), obj_dt, F.lit(">")),
            ).otherwise(suffix)
        if obj_lang is not None:
            suffix = F.when(
                obj_lang.isNotNull() & (obj_lang != ""),
                F.concat(F.lit("@"), obj_lang),
            ).otherwise(suffix)
        lit_body = F.concat(lit_body, suffix)
    obj_part = F.when(obj_is_literal, lit_body).otherwise(_term_iri(obj))
    parts = [_term_iri(subj), F.lit(" "), _term_iri(pred), F.lit(" "), obj_part]
    if graph is not None:
        parts += [
            F.when(graph.isNotNull() & (graph != ""), F.concat(F.lit(" "), _term_iri(graph))).otherwise(
                F.lit("")
            )
        ]
    parts += [F.lit(" .")]
    return F.concat(*parts)
