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

from graphforge_spark.functions.terms import ntriples_line

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
