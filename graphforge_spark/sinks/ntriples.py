"""N-Triples / N-Quads text export (reference: N3.Writer serialization to
quads.nq, docs/scripts/graphProcessor.js:76-105; Turtle/N3 download
variants, docs/test HTML/SPARQL.html:285-323).

N-Triples is the canonical export: line-oriented, splittable, trivially
mergeable — the right call at 100 TB (each task writes its split; no
global serialization point, unlike the reference's single writable
stream)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.functions.terms import DEFAULT_PREFIXES, ntriples_line

GRAPH_NS = "http://graphforge.local/g/"


def export_ntriples(triples: DataFrame, path: str, with_graph: bool = False) -> None:
    """Write one N-Triples (or N-Quads when ``with_graph``) line per triple.

    Graph labels (conversation ids) are IRI-ified under GRAPH_NS so the
    output is valid N-Quads."""
    graph_col = (
        F.concat(F.lit(GRAPH_NS), F.col("graph")) if with_graph else None
    )
    # annotation columns ride along automatically when present, so an
    # annotated parse → export round trip preserves @lang / ^^datatype
    lang_col = F.col("obj_lang") if "obj_lang" in triples.columns else None
    dt_col = F.col("obj_dt") if "obj_dt" in triples.columns else None
    lines = triples.select(
        ntriples_line(
            F.col("subj"), F.col("pred"), F.col("obj"), F.col("obj_is_literal"),
            graph_col, lang_col, dt_col,
        ).alias("value")
    )
    lines.write.mode("overwrite").text(path)


def export_turtle_lite(triples: DataFrame, path: str) -> None:
    """Turtle-flavored export (reference: downloadTriples → Output.ttl,
    SPARQL.html:285-305): same line-oriented body as N-Triples — the
    subset of Turtle every parser accepts — written without prefixes so
    splits stay independent."""
    export_ntriples(triples, path, with_graph=False)


def export_turtle(
    triples: DataFrame,
    path: str,
    prefixes: dict[str, str] | None = None,
) -> None:
    """REAL Turtle export — prefix compaction plus subject grouping —
    matching what the reference's N3.Writer emits for Output.ttl
    (downloadTriples, docs/test HTML/SPARQL.html:285-305: a Writer
    constructed WITH the prefix map, so its output uses ``@prefix``
    directives, prefixed names, and ``;``/``,`` predicate/object
    grouping — not the line-per-triple subset ``export_turtle_lite``
    writes).

    Distributed shape: one shuffle — triples are hash-repartitioned on
    SUBJECT (a subject's statement must be written contiguously), sorted
    (subj, pred, obj) within each partition, and each partition is
    serialized by one Arrow-batched pass that emits a full ``@prefix``
    header first, making EVERY part file a standalone, valid Turtle
    document (files must be independently parseable — a reader never
    sees the concatenation order). Dedup is the caller's concern, as
    with every other sink (store set semantics land upstream).

    Term policy (the engine's stringly model): ``_:`` → blank node
    verbatim; a term compacts to ``pfx:local`` when it starts with a
    declared namespace and the remainder is PN_LOCAL-safe; ``rdf:type``
    in predicate position becomes ``a``; other IRIs (including the
    store's CURIE-spelled terms, which N-Triples export brackets the
    same way) are ``<>``-wrapped; literals get Turtle escapes and
    ``@lang`` / ``^^<dt>`` suffixes (lang wins, per RDF)."""
    import re as _re

    pmap = dict(DEFAULT_PREFIXES)
    if prefixes:
        pmap.update(prefixes)
    # longest namespace first so nested namespaces compact correctly
    ns_order = sorted(pmap.items(), key=lambda kv: -len(kv[1]))
    local_re = _re.compile(r"^[A-Za-z0-9_]([A-Za-z0-9_.-]*[A-Za-z0-9_-])?$")
    header = "".join(
        f"@prefix {p}: <{iri}> .\n" for p, iri in sorted(pmap.items())
    )

    rdf_type = pmap["rdf"] + "type"

    def term(value: str, *, pred_pos: bool = False) -> str:
        if value.startswith("_:"):
            return value
        if pred_pos and (value == rdf_type or value == "rdf:type"):
            return "a"
        for p, iri in ns_order:
            if value.startswith(iri):
                local = value[len(iri):]
                if local_re.match(local):
                    return f"{p}:{local}"
        return f"<{value}>"

    def literal(value: str, lang, dt) -> str:
        body = (
            value.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
            .replace("\t", "\\t")
        )
        # pandas surfaces NULL as NaN (a truthy float) — only a real
        # non-empty string is an annotation
        if isinstance(lang, str) and lang:
            return f'"{body}"@{lang}'
        if isinstance(dt, str) and dt:
            return f'"{body}"^^{term(dt)}'
        return f'"{body}"'

    has_ann = "obj_lang" in triples.columns and "obj_dt" in triples.columns
    cols = ["subj", "pred", "obj", "obj_is_literal"] + (
        ["obj_lang", "obj_dt"] if has_ann else []
    )

    def serialize(batches):
        import pandas as pd

        first = True
        for pdf in batches:
            out: list[str] = [header] if first and len(pdf) else []
            first = first and not len(pdf)
            prev_s = prev_p = None
            for row in pdf.itertuples(index=False):
                s, p = row.subj, row.pred
                if row.obj_is_literal:
                    o = literal(
                        row.obj,
                        getattr(row, "obj_lang", None) if has_ann else None,
                        getattr(row, "obj_dt", None) if has_ann else None,
                    )
                else:
                    o = term(row.obj)
                if s != prev_s:
                    if prev_s is not None:
                        out.append(" .\n")
                    out.append(f"{term(s)} {term(p, pred_pos=True)} {o}")
                elif p != prev_p:
                    out.append(f" ;\n    {term(p, pred_pos=True)} {o}")
                else:
                    out.append(f", {o}")
                prev_s, prev_p = s, p
            if prev_s is not None:
                out.append(" .\n")
            if out:
                yield pd.DataFrame({"value": ["".join(out)]})

    doc = (
        triples.select(*cols)
        .repartition(F.col("subj"))
        .sortWithinPartitions("subj", "pred", "obj")
        .mapInPandas(serialize, schema="value string")
    )
    doc.write.mode("overwrite").text(path)
