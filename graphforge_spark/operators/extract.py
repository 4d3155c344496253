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
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.corpus import spread_small_scan


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

    src = spread_small_scan(df).select(
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
    r'(?:<([^>]*)>|(_:\S+)|"((?:[^"\\]|\\.)*)"(?:\^\^<([^>]*)>|@([\w-]+))?)'
    r"\s*(?:<([^>]*)>)?\s*\.\s*$"
)


def extract_ntriples(
    df: DataFrame, text_col: str = "text", with_annotations: bool = False
) -> DataFrame:
    """Parse N-Triples/N-Quads text blobs into triples, fully JVM-side.

    Reference: loadQuadsToStore / parseWithN3 over quads.nq
    (docs/scripts/document.js:846-863). One input row may carry a whole
    serialized document; lines are exploded then regex-destructured.
    Unparseable lines are dropped (N3.Parser would raise; at 100 TB we
    quarantine instead — callers can count dropped lines via lineage).
    ``with_annotations`` adds nullable ``obj_lang``/``obj_dt`` columns
    carrying literal ``@lang`` / ``^^<datatype>`` annotations — the
    fidelity N3's store keeps through its N-Quads round trip
    (fileSystem.js:483-487).
    """
    lines = spread_small_scan(df).select(
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
        F.when(g(9) != "", g(9)).otherwise(F.col("src_conv_id")).alias("graph"),
        F.when(g(8) != "", g(8)).alias("obj_lang"),
        # RDF 1.1: "a"^^xsd:string IS the plain literal "a" — normalize so
        # one term never splits into two quads through dedup
        F.when(
            (g(7) != "") & (g(7) != _XSD_NS + "string"), g(7)
        ).alias("obj_dt"),
    ).filter((F.col("pred") != "") & (F.col("subj") != ""))

    out_cols = [
        "subj", "pred", "obj", "obj_is_literal", "graph", "src_conv_id", "src_turn_idx"
    ]
    if with_annotations:
        out_cols += ["obj_lang", "obj_dt"]
    return parsed.select(*out_cols)


# ---------------------------------------------------------------------------
# 2b. Turtle parser — Arrow-batched (reference: N3.Parser handles full
#     Turtle for .ttl files, graphProcessor.js:151-163 dispatch + :185-200)
# ---------------------------------------------------------------------------

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XSD_NS = "http://www.w3.org/2001/XMLSchema#"


class _TurtleError(Exception):
    pass


class _TurtleParser:
    """Recursive-descent Turtle parser covering the grammar slice real
    ontologies (the reference's own demo corpus is BFO + pizza,
    docs/scripts/fileSystem.js:280-281) actually use: @prefix/@base +
    SPARQL-style PREFIX/BASE directives, prefixed names, the 'a' keyword,
    ';' predicate lists, ',' object lists, blank-node labels AND property
    lists ``[...]``, collections ``(...)`` (expanded to rdf:first/rest/
    nil), numeric/boolean literals, short+long ('\"\"\"') strings in both
    quote styles with single-pass escape decoding (\\t \\n \\r \\" \\'
    \\\\ \\uXXXX \\UXXXXXXXX). Language tags and datatype annotations
    are captured (the reference's N3.Parser keeps them through the
    store→N-Quads round trip, fileSystem.js:483-487); bare numeric and
    boolean literals get their implicit XSD datatype the way N3.js
    assigns it. ``extract_turtle`` drops the annotation columns unless
    ``with_annotations=True`` — the core quad schema stores the lexical
    form only.

    Quarantine policy: triples are buffered per statement and committed
    only when the whole statement parses; on error the parser resyncs at
    the next top-level '.' or newline, so a garbage line never poisons
    its neighbors and no partial statement ever emits.
    """

    _ESC = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}

    def __init__(self, text: str):
        import re as _re

        self.re = _re
        self.t = text
        self.n = len(text)
        self.pos = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        # rows are (subj, pred, obj, obj_is_literal, obj_lang, obj_dt)
        self.out: list[tuple[str, str, str, bool, str | None, str | None]] = []
        self.stmt: list[tuple[str, str, str, bool, str | None, str | None]] = []
        self.anon = 0
        self._scheme = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")
        self._esc = _re.compile(r"\\(U[0-9a-fA-F]{8}|u[0-9a-fA-F]{4}|.)")
        # \w is Unicode-aware in Python: prefixed names accept the
        # non-ASCII PN_CHARS letters real ontologies use (ex:µ), a close
        # lenient approximation of the Turtle PN_CHARS_BASE ranges
        self._pname = _re.compile(r"([\w.\-]*):([\w.\-/#%]*)")
        self._bnode = _re.compile(r"_:[\w.\-]+")
        self._number = _re.compile(
            r"[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?"
            r"|\d+[eE][+-]?\d+|\d+)"
        )
        self._langtag = _re.compile(r"@[A-Za-z]+(?:-[A-Za-z0-9]+)*")
        self._word = _re.compile(r"[A-Za-z]+")

    # ---- lexing -----------------------------------------------------------
    def _skip_ws(self) -> None:
        while self.pos < self.n:
            c = self.t[self.pos]
            if c in " \t\r\n":
                self.pos += 1
            elif c == "#":
                j = self.t.find("\n", self.pos)
                self.pos = self.n if j < 0 else j + 1
            else:
                return

    def _peek(self) -> str:
        self._skip_ws()
        return self.t[self.pos] if self.pos < self.n else ""

    def _err(self, msg: str):
        raise _TurtleError(f"{msg} at offset {self.pos}")

    def _expect(self, ch: str) -> None:
        if self._peek() != ch:
            self._err(f"expected {ch!r}")
        self.pos += 1

    def _unescape(self, s: str) -> str:
        def rep(m):
            g = m.group(1)
            if g[0] in "uU":
                return chr(int(g[1:], 16))
            return self._ESC.get(g, g)

        return self._esc.sub(rep, s)

    # ---- terms ------------------------------------------------------------
    def _fresh_bnode(self) -> str:
        self.anon += 1
        return f"_:gb{self.anon}"

    def _read_iri(self) -> str:
        j = self.t.find(">", self.pos + 1)
        if j < 0:
            self._err("unterminated IRI")
        val = self._unescape(self.t[self.pos + 1 : j])
        self.pos = j + 1
        # relative IRI → resolve against @base by prefixing (no dot-segment
        # normalization — matches the stringly-typed store's needs)
        if self.base and not self._scheme.match(val):
            return self.base + val
        return val

    def _read_string(self) -> tuple[str, bool, str | None, str | None]:
        q = self.t[self.pos]
        if self.t.startswith(q * 3, self.pos):
            i = self.pos + 3
            while True:
                j = self.t.find(q * 3, i)
                if j < 0:
                    self._err("unterminated long string")
                k, nb = j, 0
                while k > 0 and self.t[k - 1] == "\\":
                    nb += 1
                    k -= 1
                if nb % 2 == 0:
                    body = self.t[self.pos + 3 : j]
                    self.pos = j + 3
                    break
                i = j + 1
        else:
            i = self.pos + 1
            while i < self.n:
                c = self.t[i]
                if c == "\\":
                    i += 2
                    continue
                if c == q:
                    break
                if c == "\n":
                    self._err("newline in short string")
                i += 1
            if i >= self.n:
                self._err("unterminated string")
            body = self.t[self.pos + 1 : i]
            self.pos = i + 1
        # optional @lang or ^^datatype — captured (pname datatypes expand
        # through the prefix table like any other term)
        lang: str | None = None
        dt: str | None = None
        m = self._langtag.match(self.t, self.pos)
        if m:
            lang = m.group(0)[1:]
            self.pos = m.end()
        elif self.t.startswith("^^", self.pos):
            self.pos += 2
            if self._peek() == "<":
                dt = self._read_iri()
            else:
                dt = self._read_pname()
            # RDF 1.1: "a" and "a"^^xsd:string are the SAME term — store
            # the plain form so dedup/cardinality never split one term
            if dt == _XSD_NS + "string":
                dt = None
        return self._unescape(body), True, lang, dt

    def _read_pname(self) -> str:
        m = self._pname.match(self.t, self.pos)
        if not m:
            self._err("expected prefixed name")
        pfx, local = m.group(1), m.group(2)
        self.pos = m.end()
        # PN_LOCAL cannot end with '.' — trailing dots are statement
        # terminators the regex over-consumed
        while local.endswith("."):
            local = local[:-1]
            self.pos -= 1
        ns = self.prefixes.get(pfx)
        # unknown prefix stays as written (stringly-typed store policy)
        return ns + local if ns is not None else f"{pfx}:{local}"

    def _is_word_end(self, end: int) -> bool:
        """True iff position ``end`` terminates a bare keyword (not a
        prefixed-name continuation)."""
        nxt = self.t[end : end + 1]
        return not self.re.match(r"[\w.\-:]", nxt) if nxt else True

    def _read_predicate(self) -> str:
        c = self._peek()
        if c == "<":
            return self._read_iri()
        if c == "a" and self._is_word_end(self.pos + 1):
            self.pos += 1
            return _RDF_NS + "type"
        if self._bnode.match(self.t, self.pos) or c in "\"'[(" or c.isdigit():
            self._err("invalid predicate term")
        return self._read_pname()

    def _read_term(self) -> tuple[str, bool, str | None, str | None]:
        c = self._peek()
        if c == "":
            self._err("unexpected end of input")
        if c == "<":
            return self._read_iri(), False, None, None
        if c in "\"'":
            return self._read_string()
        m = self._bnode.match(self.t, self.pos)
        if m:
            label = m.group(0)
            self.pos = m.end()
            while label.endswith("."):
                label = label[:-1]
                self.pos -= 1
            return label, False, None, None
        if c == "[":
            self.pos += 1
            node = self._fresh_bnode()
            if self._peek() != "]":
                self._predicate_object_list(node, closer="]")
            self._expect("]")
            return node, False, None, None
        if c == "(":
            return self._read_collection()
        m = self._number.match(self.t, self.pos)
        if m and (c.isdigit() or c in "+-."):
            self.pos = m.end()
            lex = m.group(0)
            # implicit XSD datatype, the way N3.Parser assigns it
            if "e" in lex or "E" in lex:
                num_dt = _XSD_NS + "double"
            elif "." in lex:
                num_dt = _XSD_NS + "decimal"
            else:
                num_dt = _XSD_NS + "integer"
            return lex, True, None, num_dt
        w = self._word.match(self.t, self.pos)
        if w and w.group(0) in ("true", "false") and self._is_word_end(w.end()):
            self.pos = w.end()
            return w.group(0), True, None, _XSD_NS + "boolean"
        if w and w.group(0) == "a" and self._is_word_end(w.end()):
            self.pos = w.end()
            return _RDF_NS + "type", False, None, None
        return self._read_pname(), False, None, None

    def _read_collection(self) -> tuple[str, bool, str | None, str | None]:
        self._expect("(")
        items: list[tuple[str, bool, str | None, str | None]] = []
        while self._peek() != ")":
            if self.pos >= self.n:
                self._err("unterminated collection")
            items.append(self._read_term())
        self.pos += 1
        if not items:
            return _RDF_NS + "nil", False, None, None
        nodes = [self._fresh_bnode() for _ in items]
        for i, (node, (val, lit, lang, dt)) in enumerate(zip(nodes, items)):
            self.stmt.append((node, _RDF_NS + "first", val, lit, lang, dt))
            rest = nodes[i + 1] if i + 1 < len(nodes) else _RDF_NS + "nil"
            self.stmt.append((node, _RDF_NS + "rest", rest, False, None, None))
        return nodes[0], False, None, None

    # ---- statements -------------------------------------------------------
    def _predicate_object_list(self, subj: str, closer: str = ".") -> None:
        while True:
            pred = self._read_predicate()
            while True:
                val, lit, lang, dt = self._read_term()
                self.stmt.append((subj, pred, val, lit, lang, dt))
                if self._peek() == ",":
                    self.pos += 1
                    continue
                break
            if self._peek() == ";":
                self.pos += 1
                # tolerate trailing ';' before the closer
                if self._peek() in (closer, ""):
                    return
                continue
            return

    def _directive(self) -> bool:
        """Consume a @prefix/@base/PREFIX/BASE directive if present."""
        for kw, sparql_style in (
            ("@prefix", False), ("@base", False), ("PREFIX", True), ("BASE", True)
        ):
            matched = self.t.startswith(kw, self.pos) or (
                sparql_style and self.t[self.pos : self.pos + len(kw)].upper() == kw
            )
            # directive keyword must end the word — 'base:thing' is a pname
            if matched and not self._is_word_end(self.pos + len(kw)):
                matched = False
            if matched:
                self.pos += len(kw)
                if kw.endswith("prefix") or kw == "PREFIX":
                    self._skip_ws()
                    m = self.re.compile(r"([\w.\-]*):").match(self.t, self.pos)
                    if not m:
                        self._err("expected prefix name")
                    self.pos = m.end()
                    self._skip_ws()
                    if self._peek() != "<":
                        self._err("expected namespace IRI")
                    self.prefixes[m.group(1)] = self._read_iri()
                else:
                    self._skip_ws()
                    if self._peek() != "<":
                        self._err("expected base IRI")
                    self.base = self._read_iri()
                if self._peek() == ".":
                    self.pos += 1  # trailing '.' required for @-style, optional here
                return True
        return False

    def _statement(self) -> None:
        if self._directive():
            return
        c = self._peek()
        if c == "[":
            # bnode property list as subject; a following POL is optional
            subj, _, _, _ = self._read_term()
            if self._peek() != ".":
                self._predicate_object_list(subj)
        else:
            subj, is_lit, _, _ = self._read_term()
            if is_lit:
                self._err("literal cannot be a subject")
            self._predicate_object_list(subj)
        self._expect(".")

    def _resync(self, start: int) -> None:
        """Skip to just past the next top-level '.' or newline (whichever
        comes first), honoring quotes and IRI brackets."""
        i = max(self.pos, start + 1)
        q: str | None = None  # "'"/'"' short quote, "'''"/'"""' long quote
        in_iri = False
        while i < self.n:
            c = self.t[i]
            if q:
                if c == "\\":
                    i += 2
                    continue
                if len(q) == 3 and self.t.startswith(q, i):
                    q = None
                    i += 3
                    continue
                if len(q) == 1 and c == q:
                    q = None
                elif len(q) == 1 and c == "\n":
                    # a newline inside a short quote means the string was
                    # unterminated — that IS the malformed spot; sync here
                    self.pos = i + 1
                    return
            elif c in "\"'":
                q = c * 3 if self.t.startswith(c * 3, i) else c
                i += len(q)
                continue
            elif c == "<":
                in_iri = True
            elif c == ">":
                in_iri = False
            elif (c == "." or c == "\n") and not in_iri:
                self.pos = i + 1
                return
            i += 1
        self.pos = self.n

    def parse(self) -> list[tuple[str, str, str, bool, str | None, str | None]]:
        while True:
            self._skip_ws()
            if self.pos >= self.n:
                return self.out
            start = self.pos
            self.stmt = []
            try:
                self._statement()
                self.out.extend(self.stmt)
            except _TurtleError:
                self._resync(start)


def _parse_turtle(text: str) -> list[tuple[str, str, str, bool, str | None, str | None]]:
    """Parse one Turtle document → (subj, pred, obj, obj_is_literal,
    obj_lang, obj_dt) rows. See _TurtleParser for grammar coverage and
    the quarantine policy."""
    return _TurtleParser(text).parse()


def extract_turtle(
    df: DataFrame, text_col: str = "text", with_annotations: bool = False
) -> DataFrame:
    """Arrow-batched Turtle extraction over transcript turns (one Turtle
    document per turn). Same output shape as the other extractors; with
    ``with_annotations`` two nullable columns ``obj_lang``/``obj_dt``
    carry literal language tags and datatype IRIs (the fidelity the
    reference's N3 store keeps through its N-Quads round trip,
    fileSystem.js:483-487)."""
    src = spread_small_scan(df).select(
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        F.col(text_col).alias("_text"),
    )
    ann = ", obj_lang string, obj_dt string" if with_annotations else ""
    out_schema = (
        "subj string, pred string, obj string, obj_is_literal boolean, "
        f"graph string, src_conv_id string, src_turn_idx int{ann}"
    )
    cols = ["subj", "pred", "obj", "obj_is_literal",
            "graph", "src_conv_id", "src_turn_idx"]
    if with_annotations:
        cols += ["obj_lang", "obj_dt"]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for conv, idx, text in zip(
                pdf["src_conv_id"], pdf["src_turn_idx"], pdf["_text"]
            ):
                if not text:
                    continue
                for s, p, o, lit, lang, dt in _parse_turtle(text):
                    row = (s, p, o, lit, conv, conv, idx)
                    if with_annotations:
                        row += (lang, dt)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

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
    exploded = spread_small_scan(df).select(
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
# 4. JSON-LD-lite extraction — the "JSON-to-RDF" half of the forge
# ---------------------------------------------------------------------------

_XSD = "http://www.w3.org/2001/XMLSchema#"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
# JSON-LD keywords we knowingly do NOT process; any appearance
# quarantines the document (no partial emission — the Turtle policy).
# @list/@set/@graph graduated to supported in r4 (verdict #6);
# @reverse/@container/@base/@index/context-@language graduated later the
# same round (expanded term definitions).
_JSONLD_UNSUPPORTED = {
    "@version", "@nest", "@included", "@direction",
}
# sentinel for "no @language key present" — a plain string so closures
# shipped to executors compare by VALUE after pickling (an object()
# sentinel loses identity across the Arrow worker boundary)
_ABSENT = "\x00absent"


class _TermDef(NamedTuple):
    """One resolved @context term: plain string mappings become
    ``_TermDef(iri)``; expanded term definitions ({"@id":…, "@type":…,
    "@container":…, "@reverse":…, "@language":…}) carry coercion,
    container and direction. ``type``: None, "@id", "@vocab", or a
    datatype IRI. ``container``: None, "@list", "@set", "@index",
    "@language". ``lang``: _ABSENT = no term-level override, None =
    explicit null (cancels the context default), str = language tag."""

    iri: str
    type: str | None = None
    container: str | None = None
    reverse: bool = False
    lang: str | None = _ABSENT


class _Ctx(NamedTuple):
    """A validated local context: term map + @vocab + @base + default
    @language (_ABSENT when the context sets none) + keyword-alias map
    (alias term → keyword, e.g. {"id": "@id"} — JSON-LD 1.1 §4.1.5;
    schema.org-style contexts alias id/type/graph routinely). The
    aliases dict is never mutated after construction."""

    terms: dict
    vocab: str | None = None
    base: str | None = None
    lang: str | None = _ABSENT
    aliases: dict = {}


_EMPTY_CTX = _Ctx({})
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_RDF_FIRST = _RDF_NS + "first"
_RDF_REST = _RDF_NS + "rest"
_RDF_NIL = _RDF_NS + "nil"


class _JsonLdError(Exception):
    pass


def _jsonld_expand_term(term, c: "_Ctx", *, is_key: bool):
    """Resolve a context alias / CURIE / absolute IRI. Keys (predicates,
    @type values) additionally fall back to @vocab; an unresolvable key
    is an error (a strict processor refuses rather than silently drops
    the property, and quarantine keeps the no-partial-emission rule).
    Non-key positions (@id values, @id-coerced strings) with no colon
    resolve against @base when the context declares one."""
    if not isinstance(term, str) or not term:
        raise _JsonLdError(f"cannot expand non-string term {term!r}")
    if term in c.terms:
        return c.terms[term].iri
    if ":" in term:
        pfx, rest = term.split(":", 1)
        if pfx in c.terms and not rest.startswith("//"):
            return c.terms[pfx].iri + rest
        return term  # absolute IRI (scheme:…) — http, urn, mailto, …
    if is_key:
        if c.vocab is not None:
            return c.vocab + term
        raise _JsonLdError(f"term {term!r} has no context mapping and no @vocab")
    if c.base is not None:
        from urllib.parse import urljoin

        try:
            resolved = urljoin(c.base, term)
        except ValueError as e:
            # urllib raises on malformed bases ("Invalid IPv6 URL") —
            # must quarantine the document, not crash the Arrow task
            # (review finding)
            raise _JsonLdError(f"cannot resolve {term!r} against @base: {e}")
        if term.endswith("#") and not resolved.endswith("#"):
            # RFC 3986 §5.3: a defined-but-empty fragment survives
            # resolution; urljoin drops it (review finding — same
            # defect class as SPARQL BASE resolution in plans/sparql.py)
            resolved += "#"
        if ":" in resolved:
            return resolved
    return None  # bare string in @id position without mapping or @base


def _term_lang(c: "_Ctx", td: "_TermDef | None"):
    """Effective default language for a plain string under ``td``:
    term-level @language overrides the context default; an explicit
    term-level null cancels it (JSON-LD 1.1 §4.2.3)."""
    if td is not None and td.lang != _ABSENT:
        return td.lang
    return c.lang if c.lang != _ABSENT else None


def _jsonld_literal(v, c: "_Ctx", td: "_TermDef | None" = None):
    """@value object or JSON scalar → (lexical, lang, dt), or None if
    ``v`` is not a literal form (a node object / something else).
    ``td`` carries the active term definition: a datatype coercion
    applies to scalars and to @value objects without their own
    @type/@language; term/context default @language applies to plain
    strings (JSON-LD value expansion, spec §5.3.2)."""
    coerce_dt = None
    if td is not None and td.type not in (None, "@id", "@vocab"):
        coerce_dt = td.type
    if isinstance(v, dict):
        if "@value" not in v:
            return None
        val = v["@value"]
        if isinstance(val, bool):
            sval, dt = ("true" if val else "false"), _XSD + "boolean"
        elif isinstance(val, (int, float)) and not isinstance(val, bool):
            sval, dt = _jsonld_number(val)
        elif isinstance(val, str):
            sval, dt = val, None
        else:
            raise _JsonLdError(f"unsupported @value type {type(val).__name__}")
        lang = None
        if "@language" in v:
            lang = v["@language"]
            if not isinstance(lang, str) or not lang:
                raise _JsonLdError("@language must be a non-empty string")
            if not isinstance(val, str):
                raise _JsonLdError("@language on a non-string @value")
            if "@type" in v:
                raise _JsonLdError("@language and @type are exclusive")
        if "@type" in v:
            t = _jsonld_expand_term(v["@type"], c, is_key=True)
            dt = None if t == _XSD + "string" else t
        elif "@language" not in v:
            # term coercion / default language apply only when the value
            # object does not pin its own type or language
            if coerce_dt is not None:
                dt = None if coerce_dt == _XSD + "string" else coerce_dt
            elif isinstance(val, str):
                lang = _term_lang(c, td)
        extra = set(v) - {"@value", "@type", "@language"}
        if extra:
            raise _JsonLdError(f"unsupported key {sorted(extra)[0]} in value object")
        return sval, lang, dt
    if isinstance(v, bool):
        sval, dt = ("true" if v else "false"), _XSD + "boolean"
    elif isinstance(v, (int, float)):
        sval, dt = _jsonld_number(v)
    elif isinstance(v, str):
        if coerce_dt is not None:
            return v, None, (None if coerce_dt == _XSD + "string" else coerce_dt)
        return v, _term_lang(c, td), None
    else:
        return None
    if coerce_dt is not None:
        dt = None if coerce_dt == _XSD + "string" else coerce_dt
    return sval, None, dt


def _unalias(d: dict, c: "_Ctx") -> dict:
    """Rewrite keyword-alias keys to their keywords (id→@id, type→@type,
    …) so the walker below only ever sees canonical keys. A document
    using an alias AND its keyword (or two aliases of the same keyword)
    for the same node is ambiguous — JSON-LD expansion would merge the
    values, but merge order is serialization-dependent for @id, so we
    quarantine instead (no silently-picked winner). Idempotent; a no-op
    (returns ``d`` itself) when the context defines no aliases."""
    if not c.aliases:
        return d
    out: dict = {}
    for k, v in d.items():
        k2 = c.aliases.get(k, k)
        if k2 in out:
            raise _JsonLdError(
                f"both {k!r} and another spelling of {k2} present on one node"
            )
        out[k2] = v
    return out


def _jsonld_walk(node, c: "_Ctx", bnode, out, graph=None, skip_ctx=False):
    """Emit (s, p, o, is_literal, lang, dt, graph) rows for one node
    object; returns the node's subject term (IRI or blank label).
    ``graph`` is the active named graph (None = the document's default —
    the extractor substitutes the turn's conv_id). ``skip_ctx`` marks
    the single root node whose @context the caller already processed;
    an embedded @context anywhere else (JSON-LD scoped contexts) raises
    rather than being silently ignored."""
    if not isinstance(node, dict):
        raise _JsonLdError(f"node must be a JSON object, got {type(node).__name__}")
    node = _unalias(node, c)
    bad = _JSONLD_UNSUPPORTED.intersection(node)
    if bad:
        raise _JsonLdError(f"unsupported JSON-LD keyword {sorted(bad)[0]}")
    if "@context" in node and not skip_ctx:
        raise _JsonLdError("embedded @context (scoped contexts) unsupported")
    if "@value" in node:
        raise _JsonLdError("@value object in node position")
    subj = None
    if "@id" in node:
        raw = node["@id"]
        if not isinstance(raw, str):
            raise _JsonLdError("@id must be a string")
        if raw.startswith("_:"):
            subj = bnode(raw)
        else:
            subj = _jsonld_expand_term(raw, c, is_key=False)
            if subj is None or ":" not in subj:
                raise _JsonLdError(f"@id {raw!r} is not an absolute IRI or CURIE")
    if subj is None:
        subj = bnode(None)

    def emit_edge(pred, obj_term, reverse):
        """A subject↔node edge; ``reverse`` swaps the roles (@reverse /
        reverse term definitions — both sides are IRIs/blanks)."""
        if reverse:
            out.append((obj_term, pred, subj, False, None, None, graph))
        else:
            out.append((subj, pred, obj_term, False, None, None, graph))

    def coerced_iri(v, td):
        """The @id/@vocab-coerced node term for a plain string value
        ("@vocab" additionally falls back to the vocabulary), or None
        when the term has no such coercion or ``v`` is not a string.
        One definition for both the object and @list-item positions.
        A ``_:`` value is a blank-node reference and goes through the
        DOCUMENT-SCOPED relabeler exactly like the @id position — the
        raw label would silently disconnect from its relabeled node and
        collide across documents (review finding)."""
        if td is None or td.type not in ("@id", "@vocab") or not isinstance(v, str):
            return None
        if v.startswith("_:"):
            return bnode(v)
        iri = _jsonld_expand_term(v, c, is_key=(td.type == "@vocab"))
        if iri is None or ":" not in iri:
            raise _JsonLdError(f"cannot coerce {v!r} to an IRI")
        return iri

    def emit_object(pred, v, td, reverse):
        """One non-array value: literal, coerced IRI, @list, node."""
        iri = coerced_iri(v, td)
        if iri is not None:
            emit_edge(pred, iri, reverse)
            return
        lit = _jsonld_literal(v, c, td)
        if lit is not None:
            if reverse:
                raise _JsonLdError("literal value in @reverse position")
            sval, lang, dt = lit
            out.append((subj, pred, sval, True, lang, dt, graph))
            return
        if isinstance(v, dict):
            bad_kw = _JSONLD_UNSUPPORTED.intersection(v)
            if bad_kw:
                raise _JsonLdError(f"unsupported JSON-LD keyword {sorted(bad_kw)[0]}")
            if "@list" in v:
                if reverse:
                    raise _JsonLdError("@list in @reverse position")
                if set(v) != {"@list"}:
                    raise _JsonLdError("@list object must have exactly the @list key")
                out.append(
                    (subj, pred, _emit_list(v["@list"], td), False, None, None, graph)
                )
                return
            if "@set" in v:
                # {"@set": [...]} is semantically the bare array (JSON-LD
                # 1.1 §4.3.1 — @set is a no-op at the data level)
                if set(v) != {"@set"}:
                    raise _JsonLdError("@set object must have exactly the @set key")
                emit_value(pred, v["@set"], td, reverse)
                return
            child = _jsonld_walk(v, c, bnode, out, graph)
            emit_edge(pred, child, reverse)
            return
        raise _JsonLdError(f"unsupported JSON value type {type(v).__name__}")

    def _emit_list(items, td=None):
        """RDF collection: rdf:first/rdf:rest cons cells, rdf:nil tail.
        Returns the head term (rdf:nil for the empty list). Items are
        scalars (term coercion applies), @value objects, node objects,
        nested bare arrays or {"@list": …} objects (JSON-LD 1.1 nested
        lists → nested collections)."""
        if not isinstance(items, list):
            raise _JsonLdError("@list must be an array")
        head = _RDF_NIL
        cells = []
        for item in items:
            cell = bnode(None)
            cells.append(cell)
        for i, item in enumerate(items):
            cell = cells[i]
            rest = cells[i + 1] if i + 1 < len(cells) else _RDF_NIL
            if isinstance(item, dict):
                item = _unalias(item, c)  # {"value": …} under an alias
            if isinstance(item, list):
                # JSON-LD 1.1 nested list → nested RDF collection
                out.append(
                    (cell, _RDF_FIRST, _emit_list(item, td), False, None, None, graph)
                )
                out.append((cell, _RDF_REST, rest, False, None, None, graph))
                continue
            iri = coerced_iri(item, td)
            if iri is not None:
                out.append((cell, _RDF_FIRST, iri, False, None, None, graph))
                out.append((cell, _RDF_REST, rest, False, None, None, graph))
                continue
            lit = _jsonld_literal(item, c, td)
            if lit is not None:
                sval, lang, dt = lit
                out.append((cell, _RDF_FIRST, sval, True, lang, dt, graph))
            elif isinstance(item, dict):
                if "@list" in item:
                    if set(item) != {"@list"}:
                        raise _JsonLdError(
                            "@list object must have exactly the @list key"
                        )
                    out.append(
                        (
                            cell,
                            _RDF_FIRST,
                            _emit_list(item["@list"], td),
                            False,
                            None,
                            None,
                            graph,
                        )
                    )
                elif "@set" in item:
                    raise _JsonLdError("@set inside @list")
                else:
                    child = _jsonld_walk(item, c, bnode, out, graph)
                    out.append((cell, _RDF_FIRST, child, False, None, None, graph))
            else:
                raise _JsonLdError(
                    f"unsupported @list item type {type(item).__name__}"
                )
            out.append((cell, _RDF_REST, rest, False, None, None, graph))
        if cells:
            head = cells[0]
        return head

    def emit_value(pred, v, td=None, reverse=False):
        if v is None:
            return  # JSON-LD null = no value
        container = td.container if td is not None else None
        if isinstance(v, dict) and container not in ("@language", "@index"):
            # canonicalize alias keys ({"value": …} under value→@value)
            # before any of the @value/@list/@set key inspections below.
            # Language-map and index-map keys are TAGS/INDICES, not
            # keywords — rewriting those would corrupt user data
            v = _unalias(v, c)
        if container == "@language":
            # language map: {lang: str-or-[str]}; "@none" = no tag
            if not isinstance(v, dict):
                raise _JsonLdError("@container @language value must be a map")
            if reverse:
                raise _JsonLdError("language map in @reverse position")
            for lg, lv in v.items():
                if c.aliases.get(lg) == "@none":
                    lg = "@none"  # aliased @none key (JSON-LD 1.1 §4.1.5)
                if lg.startswith("@") and lg != "@none":
                    raise _JsonLdError(f"unsupported language-map key {lg}")
                for sv in lv if isinstance(lv, list) else [lv]:
                    if sv is None:
                        continue
                    if not isinstance(sv, str):
                        raise _JsonLdError("language-map value must be a string")
                    out.append(
                        (
                            subj,
                            pred,
                            sv,
                            True,
                            None if lg == "@none" else lg,
                            None,
                            graph,
                        )
                    )
            return
        if container == "@index":
            # index map: {index: value(s)}; the index itself has no RDF
            # meaning (JSON-LD 1.1 §4.6.1) — values emit normally
            if not isinstance(v, dict):
                raise _JsonLdError("@container @index value must be a map")
            inner = td._replace(container=None)
            for _, iv in v.items():
                emit_value(pred, iv, inner, reverse)
            return
        if container == "@list":
            if reverse:
                raise _JsonLdError("@container @list with @reverse")
            if isinstance(v, dict) and set(v) == {"@set"}:
                v = v["@set"]  # @set unwraps before list-wrapping
            if isinstance(v, dict) and "@list" in v:
                emit_object(pred, v, td, reverse)  # explicit {"@list": …}
                return
            # spec expansion 13.11: any non-list value (scalar, @value
            # object, node object) wraps into a singleton list
            items = v if isinstance(v, list) else [v]
            out.append((subj, pred, _emit_list(items, td), False, None, None, graph))
            return
        if isinstance(v, list):
            for item in v:
                emit_value(pred, item, td, reverse)
        else:
            emit_object(pred, v, td, reverse)

    for key, v in node.items():
        if key == "@id" or key == "@context":
            continue
        if key == "@index":
            # @index carries no RDF meaning on a node (JSON-LD 1.1 §4.6.1)
            if not isinstance(v, str):
                raise _JsonLdError("@index must be a string")
            continue
        if key == "@type":
            types = v if isinstance(v, list) else [v]
            for t in types:
                tiri = _jsonld_expand_term(t, c, is_key=True)
                out.append((subj, _RDF_TYPE, tiri, False, None, None, graph))
            continue
        if key == "@graph":
            # named graph: the node's @graph nodes land in graph <subj>
            # (their triples carry the node's term in the graph column);
            # the node's OTHER properties stay in the enclosing graph,
            # per the JSON-LD-to-RDF named-graph mapping
            if not isinstance(v, list):
                raise _JsonLdError("@graph must be an array")
            for g_node in v:
                _jsonld_walk(g_node, c, bnode, out, subj)
            continue
        if key == "@reverse":
            # node-level reverse map: {prop: node(s)} — emits
            # (node, prop, subj); a REVERSE term used inside @reverse
            # flips back to a forward edge (double reversal, spec §4.8)
            if not isinstance(v, dict):
                raise _JsonLdError("@reverse must be a map")
            for rkey, rv in v.items():
                if rkey.startswith("@"):
                    raise _JsonLdError(f"keyword {rkey} inside @reverse")
                rtd = c.terms.get(rkey)
                rpred = _jsonld_expand_term(rkey, c, is_key=True)
                emit_value(
                    rpred, rv, rtd, reverse=not (rtd.reverse if rtd else False)
                )
            continue
        if key.startswith("@"):
            raise _JsonLdError(f"unsupported JSON-LD keyword {key}")
        td = c.terms.get(key)
        emit_value(
            _jsonld_expand_term(key, c, is_key=True),
            v,
            td,
            reverse=td.reverse if td is not None else False,
        )
    return subj


def _jsonld_number(val):
    """JSON-LD number → (lexical, datatype): integral values are
    xsd:integer, everything else xsd:double (JSON-LD 1.1 §8.6)."""
    if isinstance(val, int) or (isinstance(val, float) and val.is_integer()):
        return str(int(val)), _XSD + "integer"
    return repr(float(val)), _XSD + "double"


_JSONLD_CONTAINERS = {"@list", "@set", "@index", "@language"}
_JSONLD_TERMDEF_KEYS = {"@id", "@type", "@container", "@reverse", "@language"}
# keywords a context may alias (JSON-LD 1.1 §4.1.5) — exactly the set
# the walker interprets; aliasing anything else quarantines loudly
_JSONLD_ALIASABLE = {
    "@id", "@type", "@graph", "@value", "@language",
    "@list", "@set", "@reverse", "@index", "@none",
}


def _merge_ctx(base: "_Ctx", over: "_Ctx") -> "_Ctx":
    """Layer ``over`` on ``base``: term mappings override term-by-term,
    @vocab/@base/@language override only when ``over`` sets them (the
    JSON-LD local-context-overrides rule). A name redefined in ``over``
    as a TERM stops being a keyword ALIAS (and vice versa) — leaving a
    stale entry in the other map would make one name mean two things."""
    terms = {
        **{k: v for k, v in base.terms.items() if k not in over.aliases},
        **over.terms,
    }
    aliases = {
        **{k: v for k, v in base.aliases.items() if k not in over.terms},
        **over.aliases,
    }
    return _Ctx(
        terms,
        over.vocab if over.vocab is not None else base.vocab,
        over.base if over.base is not None else base.base,
        over.lang if over.lang != _ABSENT else base.lang,
        aliases,
    )


def _jsonld_context(
    ctx_src, outer: "_Ctx | None" = None, remote: dict | None = None
) -> "_Ctx":
    """Validate a local context → _Ctx. Supported: string term/prefix
    mappings (CURIE values resolve recursively, cycle-guarded), expanded
    term definitions ({"@id", "@type" ("@id"/"@vocab"/datatype),
    "@container" (@list/@set/@index/@language), "@reverse", "@language"}),
    keyword aliases ({"id": "@id"} / {"type": {"@id": "@type"}} —
    JSON-LD 1.1 §4.1.5, the schema.org-context idiom), @vocab, @base,
    default @language (null cancels an outer default), and arrays of
    context objects (merged left-to-right). ``outer`` supplies an
    already-validated enclosing context (the caller context) whose
    prefixes and @vocab participate in CURIE resolution. ``remote`` is
    an OFFLINE preload map {url: context} — a string (remote) context
    resolves through it hermetically, never the network; a URL absent
    from the map raises _JsonLdError (quarantine), so behavior stays
    deterministic. Other keywords raise _JsonLdError."""
    if isinstance(ctx_src, str):
        if remote and ctx_src in remote:
            pre = remote[ctx_src]
            # a preloaded value may be the context proper or the full
            # remote document ({"@context": …}), which is what a dump
            # of the URL's response body naturally is
            if isinstance(pre, dict) and "@context" in pre:
                pre = pre["@context"]
            if isinstance(pre, str):
                raise _JsonLdError(
                    f"preloaded context for {ctx_src!r} is itself a URL"
                )
            return _jsonld_context(pre, outer=outer, remote=remote)
        raise _JsonLdError(
            f"remote context {ctx_src!r} not in the offline preload map"
        )
    if isinstance(ctx_src, list):
        merged = outer if outer is not None else _EMPTY_CTX
        for part in ctx_src:
            merged = _merge_ctx(
                merged, _jsonld_context(part, outer=merged, remote=remote)
            )
        # return only the layered result; the caller re-merges over the
        # outer context, which is idempotent for dict merges
        return merged
    if not isinstance(ctx_src, dict):
        raise _JsonLdError(
            "@context must be a JSON object, array, or preloaded URL"
        )
    raw: dict = {}
    vocab = base = None
    lang = _ABSENT
    for k, v in ctx_src.items():
        if k == "@vocab":
            if not isinstance(v, str):
                raise _JsonLdError("@vocab must be a string")
            vocab = v
        elif k == "@base":
            if not isinstance(v, str):
                raise _JsonLdError("@base must be a string")
            # probe-validate NOW: urljoin raises ValueError on malformed
            # bases ("Invalid IPv6 URL") — catching it here means a bad
            # DOCUMENT context quarantines at context parse and a bad
            # CALLER context raises loudly on the DRIVER, instead of
            # silently quarantining every document at @id-resolution
            # time (review finding)
            from urllib.parse import urljoin

            try:
                urljoin(v, "probe")
            except ValueError as e:
                raise _JsonLdError(f"malformed @base {v!r}: {e}")
            base = v
        elif k == "@language":
            if v is not None and (not isinstance(v, str) or not v):
                raise _JsonLdError("@language must be a non-empty string or null")
            lang = v
        elif k.startswith("@"):
            raise _JsonLdError(f"unsupported context keyword {k}")
        elif isinstance(v, (str, dict)):
            raw[k] = v
        else:
            raise _JsonLdError(f"unsupported context mapping for {k!r}")

    eff_vocab = vocab if vocab is not None else (outer.vocab if outer else None)

    # keyword aliases (JSON-LD 1.1 §4.1.5): {"id": "@id"} or the
    # expanded form {"type": {"@id": "@type"}} (optionally with the
    # data-level-no-op "@container": "@set", as schema.org's context
    # writes it). Pulled out BEFORE term resolution so an alias never
    # reaches resolve() as a bogus CURIE. Only keywords the walker
    # implements are aliasable; anything else quarantines loudly.
    aliases: dict = {}
    for k in list(raw):
        v = raw[k]
        tgt = v if isinstance(v, str) else v.get("@id")
        if not (isinstance(tgt, str) and tgt.startswith("@")):
            continue
        if tgt not in _JSONLD_ALIASABLE:
            raise _JsonLdError(f"cannot alias keyword {tgt!r}")
        if isinstance(v, dict):
            extra = set(v) - {"@id", "@container"}
            if extra:
                raise _JsonLdError(
                    f"unsupported key {sorted(extra)[0]} in keyword-alias "
                    f"definition for {k!r}"
                )
            cv = v.get("@container")
            if isinstance(cv, list) and len(cv) == 1:
                cv = cv[0]
            if "@container" in v and cv != "@set":
                raise _JsonLdError(
                    f"keyword alias {k!r} supports only @container @set"
                )
        aliases[k] = tgt
        del raw[k]
    alias_view = {**(outer.aliases if outer else {}), **aliases}

    def resolve(val, seen=()):
        """Context-internal IRI resolution: CURIEs expand through this
        context's raw mappings (then the outer context's terms), with a
        cycle guard; a bare term falls back to @vocab."""
        if not isinstance(val, str) or not val:
            raise _JsonLdError(f"cannot resolve context value {val!r}")
        if val.startswith("@"):
            # alias definitions were pulled out by the prepass above;
            # a keyword surviving to here sits in a non-aliasable
            # position (e.g. a CURIE target or datatype slot)
            raise _JsonLdError(f"keyword {val!r} is not valid here")
        if ":" in val:
            pfx, rest = val.split(":", 1)
            if rest.startswith("//"):
                return val
            if pfx in seen:
                # cyclic prefix definitions are a JSON-LD error; falling
                # back to the unresolved CURIE would emit silently-wrong
                # concatenated IRIs (review finding: {'foo': 'foo:bar'}
                # produced 'foo:barbarx')
                raise _JsonLdError(f"cyclic prefix definition through {pfx!r}")
            tgt = raw.get(pfx)
            if tgt is None:
                if outer is not None and pfx in outer.terms:
                    return outer.terms[pfx].iri + rest
                return val  # scheme:… absolute IRI
            if isinstance(tgt, dict):
                tgt = tgt.get("@id")
                if not isinstance(tgt, str):
                    raise _JsonLdError(f"prefix {pfx!r} has no string @id")
            return resolve(tgt, seen + (pfx,)) + rest
        if eff_vocab is not None:
            return eff_vocab + val
        raise _JsonLdError(f"context value {val!r} is not an IRI/CURIE (no @vocab)")

    terms: dict = {}
    for k, v in raw.items():
        if isinstance(v, str):
            terms[k] = _TermDef(iri=resolve(v))
            continue
        extra = set(v) - _JSONLD_TERMDEF_KEYS
        if extra:
            raise _JsonLdError(
                f"unsupported term-definition key {sorted(extra)[0]} for {k!r}"
            )
        reverse = False
        if "@reverse" in v:
            if "@id" in v:
                raise _JsonLdError("@reverse and @id are exclusive in a term definition")
            iri = resolve(v["@reverse"])
            reverse = True
        elif "@id" in v:
            iri = resolve(v["@id"])
        elif eff_vocab is not None:
            iri = eff_vocab + k
        else:
            raise _JsonLdError(f"term {k!r} has no @id and no @vocab")
        type_ = None
        if "@type" in v:
            t = v["@type"]
            t = alias_view.get(t, t)  # {"@type": "id"} under an id→@id alias
            type_ = t if t in ("@id", "@vocab") else resolve(t)
        container = None
        if "@container" in v:
            cv = v["@container"]
            if isinstance(cv, list) and len(cv) == 1:
                cv = cv[0]
            # isinstance first: a multi-element list (JSON-LD 1.1
            # ["@graph","@id"]) or a dict is UNHASHABLE — a bare set
            # membership test would raise TypeError past the quarantine
            # catch and fail the whole extraction job (review finding)
            if not isinstance(cv, str) or cv not in _JSONLD_CONTAINERS:
                raise _JsonLdError(f"unsupported @container {cv!r}")
            container = None if cv == "@set" else cv  # @set = data-level no-op
            if reverse and container == "@list":
                raise _JsonLdError("@container @list with @reverse")
            if container == "@language" and type_ is not None:
                raise _JsonLdError("@container @language with @type")
        tlang = _ABSENT
        if "@language" in v:
            lv = v["@language"]
            if lv is not None and (not isinstance(lv, str) or not lv):
                raise _JsonLdError("@language must be a non-empty string or null")
            if type_ is not None:
                raise _JsonLdError("term @language with @type")
            tlang = lv
        terms[k] = _TermDef(iri, type_, container, reverse, tlang)
    return _Ctx(terms, vocab, base, lang, aliases)


def _parse_jsonld(
    text: str,
    doc_key: str,
    base_ctx: "_Ctx | None" = None,
    remote: dict | None = None,
):
    """Parse one JSON-LD-lite document → rows
    (s, p, o, is_literal, lang, dt, graph-or-None), or None to QUARANTINE
    the whole document (malformed JSON or any unsupported construct — no
    partial emission, the Turtle statement policy at doc granularity).

    Supported subset: top-level node object, array of node objects, or
    {@context, @graph:[…]}; @context with string prefix/term mappings,
    expanded term definitions (@id / @type coercion ("@id", "@vocab", a
    datatype) / @container (@list/@set/@index/@language) / @reverse /
    term @language), @vocab, @base (relative @id resolution), default
    @language, and arrays of context objects (``base_ctx`` supplies a
    CALLER context that the document's own @context overrides
    term-by-term — the JSON-LD local-context-overrides rule); @id
    (absolute IRI / CURIE / @base-relative / ``_:`` label — scoped to the
    document via ``doc_key``), @type (string or list), nested node
    objects (become blank nodes unless they carry @id), arrays as
    multi-valued properties, @value objects with @type or @language
    (lang-tagged literals — exclusive per spec), @list (RDF collections:
    rdf:first/rdf:rest cons cells) including JSON-LD 1.1 nested lists,
    @set (data-level no-op), node-level @reverse maps and reverse terms
    (double reversal flips forward), language maps and index maps,
    node-level @index (dropped — no RDF meaning), nested @graph (named
    graphs: the containing node's term rides the graph slot), JSON
    scalars with the spec's implicit datatypes (integer → xsd:integer,
    non-integral number → xsd:double, boolean → xsd:boolean, string →
    plain literal; ``^^xsd:string`` normalizes to the plain form per
    RDF 1.1 term identity, the Turtle parser's rule); keyword aliases
    ({"id": "@id"}-style context entries, §4.1.5) for every keyword the
    walker interprets, with ambiguous alias+keyword co-occurrence on a
    node quarantined; remote (URL string) contexts resolved HERMETICALLY
    through the ``remote`` offline preload map {url: context} — never
    the network. Everything else — a remote context missing from the
    preload map, scoped (embedded) contexts,
    @version/@nest/@included/@direction/… — quarantines. Blank labels
    are deterministic: traversal order over ``json.loads``'s
    order-preserving dicts."""
    import itertools
    import json

    try:
        doc = json.loads(text)
    except (ValueError, TypeError, RecursionError):
        # RecursionError: a hostile deeply-nested document must
        # quarantine like any other undecodable payload, not kill the
        # executor task (the json C scanner recurses per nesting level)
        return None
    counter = itertools.count()
    labels: dict = {}

    def bnode(label):
        if label is None:
            return f"_:j_{doc_key}_n{next(counter)}"
        return labels.setdefault(label, f"_:j_{doc_key}_{label[2:]}")

    out: list = []
    try:
        ctx_src = doc.get("@context", {}) if isinstance(doc, dict) else {}
        local = _jsonld_context(ctx_src, outer=base_ctx, remote=remote)
        c = _merge_ctx(base_ctx, local) if base_ctx is not None else local
        if isinstance(doc, dict):
            # canonicalize root-level alias keys ("graph"→"@graph",
            # "id"→"@id") so the default-graph-wrapper test below sees
            # keywords; the walker re-unaliases child nodes itself
            doc = _unalias(doc, c)
        if isinstance(doc, list):
            nodes = doc
        elif isinstance(doc, dict) and "@graph" in doc and "@id" not in doc:
            # top-level {@context, @graph} is the DEFAULT-graph wrapper;
            # a node object carrying @id + @graph is a NAMED graph and
            # takes the normal walk below
            nodes = doc["@graph"]
            extra = set(doc) - {"@context", "@graph"}
            if extra:
                raise _JsonLdError(f"unsupported key {sorted(extra)[0]} beside @graph")
            if not isinstance(nodes, list):
                raise _JsonLdError("@graph must be an array")
        else:
            nodes = [doc]
        for n in nodes:
            # only the root node's @context was processed above; an
            # @context on any OTHER node raises inside the walk
            _jsonld_walk(n, c, bnode, out, skip_ctx=(n is doc))
    except (_JsonLdError, RecursionError):
        # RecursionError: _jsonld_walk recurses per nesting level too
        return None
    return out


def extract_jsonld(
    df: DataFrame,
    text_col: str = "text",
    with_annotations: bool = False,
    context: dict | None = None,
    remote_contexts: dict | None = None,
) -> DataFrame:
    """Arrow-batched JSON-LD-lite extraction over transcript turns (one
    JSON document per turn) — the "JSON-to-RDF" half of the forge: agent
    tool results are JSON far more often than Turtle. Same output shape
    as the other extractors; ``with_annotations`` surfaces literal
    language tags (@language in @value objects) and datatypes (implicit
    XSD on JSON scalars, explicit @type on @value objects).
    Undecodable or unsupported documents quarantine
    whole (count them by comparing turn counts — the lineage metrics
    pattern).

    ``context`` is an optional CALLER-supplied local @context (term/
    prefix/@vocab mappings, expanded term definitions, @base, default
    @language — the common case where a tool emits bare JSON and the
    pipeline owns the vocabulary); a document's own @context overrides
    it term-by-term, the JSON-LD local-context rule. It is validated
    ONCE on the driver, so an invalid caller context raises loudly
    instead of silently quarantining every document. Named graphs (a
    node with @id + @graph) ride the ``graph`` column; default-graph
    triples carry the turn's conv_id as before.

    ``remote_contexts`` is an OFFLINE preload map ``{url: context}`` for
    documents whose ``@context`` is a URL string: the value may be the
    context object itself or the full remote document (``{"@context":
    …}``, i.e. a verbatim dump of the URL's response body). Resolution
    is hermetic — the executor NEVER touches the network; a URL absent
    from the map quarantines that document exactly like any other
    unsupported construct, keeping extraction deterministic. The map is
    validated once on the driver (each value must compile as a context)
    and ships to executors inside the task closure — preloaded contexts
    are vocabulary-sized (schema.org's is ~100 KB), far under broadcast
    territory."""
    base_ctx = None if context is None else _jsonld_context(context)
    if remote_contexts is not None:
        for url, pre in remote_contexts.items():
            if not isinstance(url, str):
                raise ValueError(f"remote-context key {url!r} must be a URL string")
            try:
                _jsonld_context(url, remote=remote_contexts)
            except _JsonLdError as e:
                raise ValueError(f"invalid preloaded context for {url!r}: {e}")
    src = spread_small_scan(df).select(
        F.col("conv_id").alias("src_conv_id"),
        F.col("turn_idx").alias("src_turn_idx"),
        F.col(text_col).alias("_text"),
    )
    ann = ", obj_lang string, obj_dt string" if with_annotations else ""
    out_schema = (
        "subj string, pred string, obj string, obj_is_literal boolean, "
        f"graph string, src_conv_id string, src_turn_idx int{ann}"
    )
    cols = ["subj", "pred", "obj", "obj_is_literal",
            "graph", "src_conv_id", "src_turn_idx"]
    if with_annotations:
        cols += ["obj_lang", "obj_dt"]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            rows = []
            for conv, idx, text in zip(
                pdf["src_conv_id"], pdf["src_turn_idx"], pdf["_text"]
            ):
                if not text:
                    continue
                parsed = _parse_jsonld(
                    text,
                    f"{conv}_{idx}",
                    base_ctx=base_ctx,
                    remote=remote_contexts,
                )
                if parsed is None:
                    continue  # quarantined document
                for s, p, o, lit, lang, dt, g in parsed:
                    row = (s, p, o, lit, g if g is not None else conv, conv, idx)
                    if with_annotations:
                        row += (lang, dt)
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(batches, schema=out_schema)


# ---------------------------------------------------------------------------
# 5. Tabular-to-RDF direct mapping — the "tabular" half of the forge
# ---------------------------------------------------------------------------

_SPARK_TO_XSD = {
    "tinyint": _XSD + "integer",
    "smallint": _XSD + "integer",
    "int": _XSD + "integer",
    "bigint": _XSD + "integer",
    "float": _XSD + "double",
    "double": _XSD + "double",
    "boolean": _XSD + "boolean",
    "date": _XSD + "date",
    "string": None,  # plain literal (RDF 1.1: == xsd:string)
}


def extract_table(
    df: DataFrame,
    subject_col: str,
    base_iri: str,
    predicate_base: str | None = None,
    columns: list[str] | None = None,
    with_annotations: bool = False,
) -> DataFrame:
    """W3C-Direct-Mapping-style tabular-to-RDF: every row of ANY
    DataFrame becomes a subject ``<base_iri><subject_col value>``, every
    other (or listed) column a predicate ``<predicate_base><name>``, and
    every non-null cell a typed literal triple — the "tabular" half of
    the north-star's tabular/JSON-to-RDF forge (turn a dimension table,
    a metrics table, or the transcript table itself into graph rows).

    Pure JVM column algebra: one codegen'd explode over an inline
    (pred, value, dt) struct array per row — no Python, no shuffle; at
    100 TB this is a narrow map over the scan and the downstream dedup
    is the only exchange, exactly like the free-text extractor.

    Cell typing follows the Direct Mapping's XSD mapping (int family →
    xsd:integer, float family → xsd:double, boolean, date, timestamp →
    xsd:dateTime with a 'T' separator, decimal → xsd:decimal; strings
    stay plain per RDF 1.1 term identity). NULL cells emit no triple.
    Unsupported cell types (arrays, maps, structs, binary) raise — a
    silent stringification would fabricate lexical forms no consumer
    could round-trip. ``with_annotations`` adds the ``obj_lang``/
    ``obj_dt`` columns; without it datatypes are dropped (the other
    extractors' contract). The graph/provenance columns carry the
    subject key (a table row has no conversation)."""
    if subject_col not in df.columns:
        raise ValueError(f"subject column {subject_col!r} not in {df.columns}")
    predicate_base = predicate_base if predicate_base is not None else base_iri + "p/"
    data_cols = [c for c in (columns or df.columns) if c != subject_col]
    if not data_cols:
        raise ValueError("extract_table needs at least one data column")
    dtypes = dict(df.dtypes)
    missing = [c for c in data_cols if c not in dtypes]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")

    def cell(c: str):
        t = dtypes[c]
        if t.startswith("decimal"):
            return F.col(c).cast("string"), _XSD + "decimal"
        if t == "timestamp" or t == "timestamp_ntz":
            return F.date_format(F.col(c), "yyyy-MM-dd'T'HH:mm:ss"), _XSD + "dateTime"
        if t in _SPARK_TO_XSD:
            return F.col(c).cast("string"), _SPARK_TO_XSD[t]
        raise ValueError(
            f"extract_table: unsupported cell type {t!r} for column {c!r} "
            "(arrays/maps/structs/binary have no Direct-Mapping lexical form)"
        )

    pairs = []
    for c in data_cols:
        val, dt = cell(c)
        pairs += [
            F.lit(predicate_base + c),
            val,
            F.lit(dt),
        ]
    n = len(data_cols)
    subj = F.concat(F.lit(base_iri), F.col(subject_col).cast("string"))
    stacked = df.filter(F.col(subject_col).isNotNull()).select(
        subj.alias("subj"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        pairs[3 * i].alias("p"),
                        pairs[3 * i + 1].alias("o"),
                        pairs[3 * i + 2].alias("dt"),
                    )
                    for i in range(n)
                ]
            )
        ).alias("_x"),
    )
    out_cols = [
        "subj",
        F.col("_x.p").alias("pred"),
        F.col("_x.o").alias("obj"),
        F.lit(True).alias("obj_is_literal"),
        F.col("subj").alias("graph"),
        F.col("subj").alias("src_conv_id"),
        F.lit(0).alias("src_turn_idx"),
    ]
    if with_annotations:
        out_cols += [
            F.lit(None).cast("string").alias("obj_lang"),
            F.col("_x.dt").alias("obj_dt"),
        ]
    return stacked.filter(F.col("_x.o").isNotNull()).select(*out_cols)


# ---------------------------------------------------------------------------
# Format dispatch (reference: triplify() switch, graphProcessor.js:151-163)
# ---------------------------------------------------------------------------

def ensure_annotation_columns(df: DataFrame) -> DataFrame:
    """Backfill NULL ``obj_lang``/``obj_dt`` when absent — the one
    definition of the annotation-column contract (extractors without an
    annotation source, pre-annotation warehouses on resume, core-schema
    stores handed to the validator)."""
    for c in ("obj_lang", "obj_dt"):
        if c not in df.columns:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df


def extract_all(
    transcripts: DataFrame,
    rules: list[PatternRule] | None = None,
    with_annotations: bool = False,
    jsonld_context: dict | None = None,
    jsonld_remote_contexts: dict | None = None,
) -> DataFrame:
    """Route each turn to the right extractor by its ``tool`` tag and union.

    tool='rdfxml' → DOM-walk extractor; tool='ntriples'/'turtle' → line
    parser; tool='jsonld' → JSON-LD-lite walker (the north-star's
    "JSON-to-RDF" half — agent tool results are JSON far more often than
    Turtle); everything else → free-text pattern rules. Mirrors the
    extension dispatch at graphProcessor.js:151-163 ('.owl/.rdf' vs '.ttl'),
    generalized to transcript turns.

    ``with_annotations`` threads literal ``@lang``/``^^datatype`` capture
    through the serialized-RDF parsers (Turtle, N-Triples, JSON-LD); the
    RDF/XML walker and the free-text pattern rules have no annotation
    source, so their rows carry NULL ``obj_lang``/``obj_dt``.

    ``jsonld_context`` / ``jsonld_remote_contexts`` pass through to
    ``extract_jsonld`` (caller vocabulary + hermetic offline preload map
    for URL @contexts); the other branches ignore them.
    """
    xml_turns = transcripts.filter(F.col("tool") == "rdfxml")
    nt_turns = transcripts.filter(F.col("tool") == "ntriples")
    ttl_turns = transcripts.filter(F.col("tool") == "turtle")
    jl_turns = transcripts.filter(F.col("tool") == "jsonld")
    text_turns = transcripts.filter(
        (F.col("tool").isNull())
        | (~F.col("tool").isin("rdfxml", "ntriples", "turtle", "jsonld"))
    )
    ann = ensure_annotation_columns if with_annotations else (lambda df: df)
    parts = [
        ann(extract_rdfxml(xml_turns)),
        extract_ntriples(nt_turns, with_annotations=with_annotations),
        extract_turtle(ttl_turns, with_annotations=with_annotations),
        extract_jsonld(
            jl_turns,
            with_annotations=with_annotations,
            context=jsonld_context,
            remote_contexts=jsonld_remote_contexts,
        ),
        ann(extract_patterns(text_turns, rules)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dedup_triples(triples: DataFrame) -> DataFrame:
    """Set semantics over the graph (reference: N3.Store deduplicates,
    graphProcessor.js:193; store.size counts unique quads :195).

    Provenance note: the reference keeps ONE copy of a repeated quad; we
    keep the lexicographically-first provenance for determinism.

    The min(struct) provenance buffer is variable-width, so this is a
    SortAggregate, not a HashAggregate. A 64-bit xxhash of the quad leads
    the group key: it is a pure function of the other keys (semantics
    unchanged) but lets the sort comparator decide almost every comparison
    on one long instead of five strings — measured ~15-20% off the dedup
    stage at 200k rows, and the comparator saving grows with key width at
    corpus scale. The hash column is dropped on the way out.

    Annotation-aware: when the frame carries ``obj_lang``/``obj_dt``
    (``extract_all(with_annotations=True)``), they join the group key —
    in RDF ``"a"@en`` and ``"a"@fr`` are DISTINCT terms, so they must not
    collapse into one quad.
    """
    ann = [c for c in ("obj_lang", "obj_dt") if c in triples.columns]
    key = ["subj", "pred", "obj", "obj_is_literal", "graph", *ann]
    quad_hash = F.xxhash64(*key)
    return (
        triples.withColumn("_qh", quad_hash)
        .groupBy("_qh", *key)
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
            *ann,
        )
    )
