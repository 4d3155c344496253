"""Triple extraction — the core "forge" (reference:
docs/scripts/graphProcessor.js:142-304).

Four extractors, dispatched by format (reference dispatch: triplify(),
graphProcessor.js:151-163 routes .ttl → N3 parser, .owl/.rdf → custom
DOM-walk parser); ``extract_turtle`` (2b below) covers the full-Turtle
side of the reference's .ttl path, ``extract_ntriples`` the line-oriented
N-Triples/N-Quads side:

1. ``extract_rdfxml`` — faithful reimplementation of the reference's
   hand-rolled RDF/XML walker ``parseWithRdfParser``/``traverseXML``/
   ``extractTriples`` (graphProcessor.js:203-304), including its quirks —
   which ARE the spec, since parity with the reference's emitted triples is
   the correctness target (P/R ≥ 0.95):
     - subject := rdf:about ∥ rdf:ID ∥ inherited parent subject (:231)
     - rdf:RDF / rdf:Description are transparent containers: recurse only (:243,:256-260)
     - under owl:Class, each element child emits (class, childName,
       rdf:resource-or-trimmed-text) — the only place text literals are
       emitted (:233-241)
     - owl:equivalentClass → owl:Class → owl:oneOf → rdf:Description members
       emit (member, rdf:type, class) (:265-282)
     - everywhere else, an element child emits a triple ONLY if it carries
       rdf:resource (:247); children with child nodes are recursed into
       (:249), so striped text properties yield nothing — reference behavior
     - empty subject → '_:blank' (:218)
     - object typing: startsWith('http') → IRI else literal (:222)
   Runs as an Arrow-batched iterator UDF (mapInPandas) over turn text:
   Python per *batch*, never per row; xml.dom.minidom mirrors the browser
   DOMParser's qualified-name semantics (getAttribute('rdf:about') matches
   the literal qualified name, exactly like the reference).

2. ``extract_ntriples`` — line-oriented N-Triples/N-Quads parse, pure JVM
   regex (reference: parseWithN3 for Turtle-family input,
   graphProcessor.js:185-200; loadQuadsToStore, document.js:846-863).
   No Python at all: regexp_extract over exploded lines.

3. ``extract_patterns`` — rule-table-driven mention/relation extraction over
   free text (the transcript-mining generalization per north_star; the
   reference analog is pattern-based extraction A7). Rules with simple
   2-group regexes compile to JVM ``regexp_extract_all``; the whole rule
   table is applied via stack-style union without Python.

At scale: extraction is embarrassingly parallel over turns. The RDF/XML
path crosses into Python via Arrow once per batch (10k rows) — the other
two never leave the JVM. Partitioning is inherited from the scan; no
shuffle is introduced until dedup.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. RDF/XML walker (graphProcessor.js:203-304 semantics)
# ---------------------------------------------------------------------------

def _walk_rdfxml(content: str) -> list[tuple[str, str, str, bool]]:
    """Pure-Python single-document walk. Mirrors traverseXML exactly.

    Returns (subj, pred, obj, obj_is_literal) tuples in document order.
    Malformed XML yields no triples (the browser DOMParser produces an
    <parsererror> document; the reference then extracts nothing useful —
    we choose the clean subset of that behavior: emit nothing).
    """
    from xml.dom import minidom

    try:
        doc = minidom.parseString(content)
    except Exception:
        return []

    out: list[tuple[str, str, str, bool]] = []
    ELEMENT = minidom.Node.ELEMENT_NODE

    def text_content(node) -> str:
        parts: list[str] = []
        stack = list(node.childNodes)
        while stack:
            n = stack.pop(0)
            if n.nodeType in (n.TEXT_NODE, n.CDATA_SECTION_NODE):
                parts.append(n.data)
            else:
                stack[0:0] = list(n.childNodes)
        return "".join(parts)

    def get_attr(node, name: str) -> str | None:
        # DOM getAttribute returns '' for missing attrs; '' is falsy in JS,
        # so both missing and empty fall through the subject chain.
        if node.attributes is None:
            return None
        v = node.getAttribute(name)
        return v if v else None

    def extract(subject: str | None, predicate: str, node_or_text) -> None:
        # extractTriples (graphProcessor.js:209-225)
        if isinstance(node_or_text, str):
            object_value = node_or_text
        else:
            object_value = get_attr(node_or_text, "rdf:resource") or text_content(
                node_or_text
            ).strip()
        if object_value:
            safe_subject = subject or "_:blank"  # :218
            out.append(
                (safe_subject, predicate, object_value, not object_value.startswith("http"))
            )

    def handle_equivalent_class(node, subject: str | None) -> None:
        # handleEquivalentClass (graphProcessor.js:265-282)
        for child in node.childNodes:
            if child.nodeType == ELEMENT and child.nodeName == "owl:Class":
                one_ofs = child.getElementsByTagName("owl:oneOf")
                if one_ofs:
                    for member in one_ofs[0].getElementsByTagName("rdf:Description"):
                        member_uri = get_attr(member, "rdf:about")
                        if member_uri:
                            # reference emits (member, rdf:type, classSubject)
                            extract(member_uri, "rdf:type", subject or "")

    def traverse(node, subject: str | None) -> None:
        # traverseXML (graphProcessor.js:228-262)
        if node.nodeType != ELEMENT:
            return
        node_name = node.nodeName
        new_subject = get_attr(node, "rdf:about") or get_attr(node, "rdf:ID") or subject

        if node_name == "owl:Class":
            for child in node.childNodes:
                if child.nodeType == ELEMENT:
                    if child.nodeName == "owl:equivalentClass":
                        handle_equivalent_class(child, new_subject)
                    else:
                        extract(new_subject, child.nodeName, child)
        elif node_name not in ("rdf:RDF", "rdf:Description"):
            for child in node.childNodes:
                if child.nodeType == ELEMENT:
                    predicate = child.nodeName
                    if get_attr(child, "rdf:resource") is not None:
                        extract(new_subject, predicate, child)
                    elif len(child.childNodes) > 0:
                        traverse(child, new_subject)
                    else:
                        extract(new_subject, predicate, child)
        else:
            for child in node.childNodes:
                traverse(child, new_subject)

    root = doc.documentElement
    if root is not None:
        traverse(root, "")
    return out


def extract_rdfxml(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Arrow-batched RDF/XML extraction over a transcripts-shaped DataFrame.

    Input: (conv_id, turn_idx, ..., text). Output: provenanced triples
    (subj, pred, obj, obj_is_literal, graph, src_conv_id, src_turn_idx).
    graph := conv_id (each conversation is a named graph, the Spark analog
    of the reference's per-project quads.nq file).
    """
    import pandas as pd  # noqa: F401 (imported for clarity; used via iterator)

    src = df.select(
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        F.col(text_col).alias("_text"),
    )

    out_schema = (
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "graph string, src_conv_id string, src_turn_idx int"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for conv, idx, text in zip(
                pdf["src_conv_id"], pdf["src_turn_idx"], pdf["_text"]
            ):
                if not text:
                    continue
                for s, p, o, lit in _walk_rdfxml(text):
                    rows.append((s, p, o, lit, conv, conv, idx))
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj",
                    "pred",
                    "obj",
                    "obj_is_literal",
                    "graph",
                    "src_conv_id",
                    "src_turn_idx",
                ],
            )

    return src.mapInPandas(batches, schema=out_schema)


# ---------------------------------------------------------------------------
# 2. N-Triples / N-Quads parser — pure JVM regex
# ---------------------------------------------------------------------------

_NT_LINE = (
    r"^\s*(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+"
    r'(?:<([^>]*)>|(_:\S+)|"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]*>|@[\w-]+)?)'
    r"\s*(?:<([^>]*)>)?\s*\.\s*$"
)


def extract_ntriples(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Parse N-Triples/N-Quads text blobs into triples, fully JVM-side.

    Reference: loadQuadsToStore / parseWithN3 over quads.nq
    (docs/scripts/document.js:846-863). One input row may carry a whole
    serialized document; lines are exploded then regex-destructured.
    Unparseable lines are dropped (N3.Parser would raise; at 100 TB we
    quarantine instead — callers can count dropped lines via lineage).
    """
    lines = df.select(
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        F.explode(F.split(F.col(text_col), r"\n")).alias("line"),
    ).filter(F.trim("line") != "")

    def g(i):
        return F.regexp_extract(F.col("line"), _NT_LINE, i)

    parsed = lines.select(
        "src_conv_id",
        "src_turn_idx",
        F.when(g(1) != "", g(1)).otherwise(g(2)).alias("subj"),
        g(3).alias("pred"),
        F.when(g(4) != "", g(4))
        .when(g(5) != "", g(5))
        .otherwise(
            # Unescape the captured literal body. Single logical pass via a
            # \x00 sentinel: '\\' is consumed FIRST so an escaped backslash
            # followed by t/n/r decodes to backslash+'t', not backslash+TAB
            # (ordered replaces get this wrong); \x00 cannot appear in the
            # capture because the literal regex never matches a raw NUL
            # inside quotes in N-Triples source.
            F.replace(
                F.replace(
                    F.replace(
                        F.replace(
                            F.replace(
                                F.replace(g(6), F.lit("\\\\"), F.lit("\x00")),
                                F.lit(r"\t"),
                                F.lit("\t"),
                            ),
                            F.lit(r"\n"),
                            F.lit("\n"),
                        ),
                        F.lit(r"\r"),
                        F.lit("\r"),
                    ),
                    F.lit('\\"'),
                    F.lit('"'),
                ),
                F.lit("\x00"),
                F.lit("\\"),
            )
        )
        .alias("obj"),
        ((g(4) == "") & (g(5) == "")).alias("obj_is_literal"),
        F.when(g(7) != "", g(7)).otherwise(F.col("src_conv_id")).alias("graph"),
    ).filter((F.col("pred") != "") & (F.col("subj") != ""))

    return parsed.select(
        "subj", "pred", "obj", "obj_is_literal", "graph", "src_conv_id", "src_turn_idx"
    )


# ---------------------------------------------------------------------------
# 2b. Turtle parser — Arrow-batched (reference: N3.Parser handles full
#     Turtle for .ttl files, graphProcessor.js:151-163 dispatch + :185-200)
# ---------------------------------------------------------------------------

_TTL_TOKEN = None  # compiled lazily inside the Python worker


def _parse_turtle(text: str) -> list[tuple[str, str, str, bool]]:
    """Subset-Turtle parser: @prefix/PREFIX decls, prefixed names, 'a'
    keyword, ';' predicate lists, ',' object lists, IRIs, blank-node
    labels, plain/lang/typed literals. Unparseable statements are dropped
    (quarantine, same policy as the N-Triples path). Returns
    (subj, pred, obj, obj_is_literal)."""
    import re as _re

    global _TTL_TOKEN
    if _TTL_TOKEN is None:
        _TTL_TOKEN = _re.compile(
            r"""\s*(?:
                  (?P<comment>\#[^\n]*)
                | (?P<prefix_decl>@prefix|@PREFIX|PREFIX)
                | (?P<iri><[^>]*>)
                | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[\w-]+|\^\^\S+)?)
                | (?P<punct>[.;,])
                | (?P<a>a)(?=[\s<])
                | (?P<pname>[\w.-]*:[\w./#-]*)
                | (?P<bnode>_:[\w-]+)
            )""",
            _re.VERBOSE,
        )

    toks: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        m = _TTL_TOKEN.match(text, pos)
        if not m:
            pos += 1  # skip garbage byte (quarantine, not raise)
            continue
        pos = m.end()
        kind = m.lastgroup
        if kind and kind != "comment":
            toks.append((kind, m.group(kind)))

    prefixes: dict[str, str] = {}
    out: list[tuple[str, str, str, bool]] = []

    def term(kind: str, val: str):
        """→ (value, is_literal) or None."""
        if kind == "iri":
            return val[1:-1], False
        if kind == "bnode":
            return val, False
        if kind == "a":
            return "http://www.w3.org/1999/02/22-rdf-syntax-ns#type", False
        if kind == "pname":
            pfx, _, local = val.partition(":")
            ns = prefixes.get(pfx)
            return (ns + local, False) if ns is not None else (val, False)
        if kind == "literal":
            body = _re.match(r'"((?:[^"\\]|\\.)*)"', val).group(1)
            body = (
                body.replace(r"\t", "\t").replace(r"\n", "\n").replace(r"\r", "\r")
                .replace('\\"', '"').replace("\\\\", "\\")
            )
            return body, True
        return None

    i = 0
    n = len(toks)
    while i < n:
        kind, val = toks[i]
        if kind == "prefix_decl":
            # @prefix pfx: <iri> .   (trailing '.' optional for PREFIX)
            if i + 2 < n and toks[i + 1][0] == "pname" and toks[i + 2][0] == "iri":
                pfx = toks[i + 1][1].rstrip(":")
                prefixes[pfx] = toks[i + 2][1][1:-1]
                i += 3
                if i < n and toks[i] == ("punct", "."):
                    i += 1
            else:
                i += 1
            continue
        subj = term(kind, val)
        i += 1
        if subj is None or subj[1]:
            continue  # literals can't be subjects; resync
        # predicate-object list until '.'
        while i < n:
            if toks[i][0] == "punct":
                i += 1
                if toks[i - 1][1] == ".":
                    break
                continue
            pred = term(*toks[i])
            i += 1
            if pred is None or pred[1]:
                break
            while i < n:
                obj = term(*toks[i]) if toks[i][0] != "punct" else None
                if obj is not None:
                    out.append((subj[0], pred[0], obj[0], obj[1]))
                    i += 1
                if i < n and toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if i < n and toks[i] == ("punct", ";"):
                i += 1
                continue
            if i < n and toks[i] == ("punct", "."):
                i += 1
            break
    return out


def extract_turtle(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Arrow-batched Turtle extraction over transcript turns (one Turtle
    document per turn). Same output shape as the other extractors."""
    src = df.select(
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        F.col(text_col).alias("_text"),
    )
    out_schema = (
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "graph string, src_conv_id string, src_turn_idx int"
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for conv, idx, text in zip(
                pdf["src_conv_id"], pdf["src_turn_idx"], pdf["_text"]
            ):
                if not text:
                    continue
                for s, p, o, lit in _parse_turtle(text):
                    rows.append((s, p, o, lit, conv, conv, idx))
            yield pd.DataFrame(
                rows,
                columns=[
                    "subj", "pred", "obj", "obj_is_literal",
                    "graph", "src_conv_id", "src_turn_idx",
                ],
            )

    return src.mapInPandas(batches, schema=out_schema)


# ---------------------------------------------------------------------------
# 3. Rule-table pattern extraction over free text — pure JVM regex
# ---------------------------------------------------------------------------

class PatternRule:
    """One extraction rule: regex with exactly two capture groups
    (subject, object) and an emitted predicate IRI.

    ``subj_template``/``obj_template`` optionally wrap the captured surface
    into an IRI (e.g. 'http://ex.org/e/{}'); None keeps the raw surface
    (which the startsWith('http') rule will then type as a literal unless
    the surface itself is an IRI).
    """

    def __init__(
        self,
        rule_id: str,
        pattern: str,
        pred: str,
        subj_template: str | None = None,
        obj_template: str | None = None,
    ):
        self.rule_id = rule_id
        self.pattern = pattern
        self.pred = pred
        self.subj_template = subj_template
        self.obj_template = obj_template


DEFAULT_RULES: list[PatternRule] = [
    PatternRule(
        "works_at",
        r"([A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*) works at "
        r"([A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*)",
        "http://ex.org/p/worksAt",
        "http://ex.org/e/{}",
        "http://ex.org/e/{}",
    ),
    PatternRule(
        "is_a",
        r"([A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*) is a ([a-z][a-z0-9_]*)",
        "rdf:type",
        "http://ex.org/e/{}",
        "http://ex.org/c/{}",
    ),
    PatternRule(
        "located_in",
        r"([A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*) is located in "
        r"([A-Z][A-Za-z0-9_]*(?: [A-Z][A-Za-z0-9_]*)*)",
        "http://ex.org/p/locatedIn",
        "http://ex.org/e/{}",
        "http://ex.org/e/{}",
    ),
    PatternRule(
        "mentions_iri",
        r"(https?://[^\s<>\"]+)",
        "http://ex.org/p/mentionsIri",
        None,
        None,
    ),
]


def _apply_template(col, template: str | None):
    if template is None:
        return col
    pre, post = template.split("{}")
    slug = F.regexp_replace(col, " ", "_")
    return F.concat(F.lit(pre), slug, *( [F.lit(post)] if post else [] ))


def _rule_matches(r: PatternRule, text_col: str):
    """Array of (s, p, o) structs for one rule — templates applied inside
    the transform so rule identity never needs to survive past this column.

    Strategy: ONE full-text regex pass per rule (``regexp_extract_all(..., 0)``
    for the whole match), then per-match group re-extraction on the short
    match string — half the full-text regex work of extracting each group
    separately. Leftmost non-overlapping match semantics, identical to the
    DuckDB oracle's regexp_extract_all.
    """
    import re as _re

    n_groups = _re.compile(r.pattern).groups
    full = F.regexp_extract_all(F.col(text_col), F.lit(r.pattern), 0)
    if n_groups >= 2:
        def _subj(m):
            # Emptiness is tested on the RAW capture, before subj_template
            # wraps it — a custom rule whose group 1 matches empty must fall
            # back to the per-turn blank node ('' sentinel resolved
            # post-explode), not emit a templated empty IRI.
            raw = F.regexp_extract(m, r.pattern, 1)
            return F.when(raw == "", F.lit("")).otherwise(
                _apply_template(raw, r.subj_template)
            )

        return F.transform(
            full,
            lambda m: F.struct(
                _subj(m).alias("s"),
                F.lit(r.pred).alias("p"),
                _apply_template(F.regexp_extract(m, r.pattern, 2), r.obj_template).alias("o"),
            ),
        )
    # single-group rules: the match is the OBJECT; subject is the turn's
    # blank node (deterministic per-turn blank label, resolved post-explode).
    return F.transform(
        full,
        lambda m: F.struct(
            F.lit("").alias("s"),
            F.lit(r.pred).alias("p"),
            _apply_template(F.regexp_extract(m, r.pattern, 1), r.obj_template).alias("o"),
        ),
    )


def extract_patterns(
    df: DataFrame, rules: list[PatternRule] | None = None, text_col: str = "text"
) -> DataFrame:
    """Apply every rule to every turn in a SINGLE pass. JVM-only.

    All rules' match arrays are concatenated per row and exploded once —
    one scan of the input, one generator, no per-rule union (the naive
    union plan re-scans the input once per rule and multiplies every
    upstream shuffle by the rule count). Subject of a match with no
    subject group falls back to a deterministic per-turn blank label
    (graphProcessor.js:218 analog).
    """
    rules = rules or DEFAULT_RULES
    arrays = [_rule_matches(r, text_col) for r in rules]
    matches = F.concat(*arrays) if len(arrays) > 1 else arrays[0]
    exploded = df.select(
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        F.explode(matches).alias("m"),
    )
    return exploded.select(
        F.when(
            F.col("m.s") == "",
            F.concat_ws(
                "", F.lit("_:b_"), F.col("src_conv_id"), F.lit("_"), F.col("src_turn_idx")
            ),
        )
        .otherwise(F.col("m.s"))
        .alias("subj"),
        F.col("m.p").alias("pred"),
        F.col("m.o").alias("obj"),
        (~F.col("m.o").startswith("http")).alias("obj_is_literal"),
        F.col("src_conv_id").alias("graph"),
        "src_conv_id",
        "src_turn_idx",
    )


# ---------------------------------------------------------------------------
# Format dispatch (reference: triplify() switch, graphProcessor.js:151-163)
# ---------------------------------------------------------------------------

def extract_all(
    transcripts: DataFrame,
    rules: list[PatternRule] | None = None,
) -> DataFrame:
    """Route each turn to the right extractor by its ``tool`` tag and union.

    tool='rdfxml' → DOM-walk extractor; tool='ntriples'/'turtle' → line
    parser; everything else → free-text pattern rules. Mirrors the
    extension dispatch at graphProcessor.js:151-163 ('.owl/.rdf' vs '.ttl'),
    generalized to transcript turns.
    """
    xml_turns = transcripts.filter(F.col("tool") == "rdfxml")
    nt_turns = transcripts.filter(F.col("tool") == "ntriples")
    ttl_turns = transcripts.filter(F.col("tool") == "turtle")
    text_turns = transcripts.filter(
        (F.col("tool").isNull()) | (~F.col("tool").isin("rdfxml", "ntriples", "turtle"))
    )
    return (
        extract_rdfxml(xml_turns)
        .unionByName(extract_ntriples(nt_turns))
        .unionByName(extract_turtle(ttl_turns))
        .unionByName(extract_patterns(text_turns, rules))
    )


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Set semantics over the graph (reference: N3.Store deduplicates,
    graphProcessor.js:193; store.size counts unique quads :195).

    Provenance note: the reference keeps ONE copy of a repeated quad; we
    keep the lexicographically-first provenance for determinism.
    """
    return (
        triples.groupBy("subj", "pred", "obj", "obj_is_literal", "graph")
        .agg(
            F.min(F.struct("src_conv_id", "src_turn_idx")).alias("_prov"),
        )
        .select(
            "subj",
            "pred",
            "obj",
            "obj_is_literal",
            "graph",
            F.col("_prov.src_conv_id").alias("src_conv_id"),
            F.col("_prov.src_turn_idx").alias("src_turn_idx"),
        )
    )
