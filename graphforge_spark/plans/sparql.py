"""SPARQL front-end: parse the reference's query surface into DataFrame
plans.

The reference accepts SPARQL text and hands it to Comunica after string
rewrites (prepareQuery, docs/test HTML/documentQueryTest.html:637-661;
inline copies docs/scripts/document.js:930-946,
docs/scripts/queryManager.js:90-113). Its exercised surface is pinned by
its own canned queries (docs/test HTML/SPARQL.html:241-283, default
query docs/scripts/app.js:100-104): BGP patterns, OPTIONAL, property-path
alternation with ZeroOrMore, COUNT…GROUP BY, SELECT */vars, LIMIT. This
module parses exactly that subset — a user of the reference can paste
their queries unchanged — and compiles to the same Catalyst plans the
programmatic helpers (plans/bgp.py, operators/closure.py) produce.

Grammar (whitespace-insensitive, case-insensitive keywords):

    query    := PREFIX* SELECT proj WHERE { stmt* } modifier*
    proj     := '*' | (var | '(' COUNT '(' var ')' AS var ')')+
    stmt     := pattern '.'? | OPTIONAL '{' pattern '.'? '}'
    pattern  := term predpath term
    predpath := term | '(' term ('|' term)* ')' '*'? | term '*'
    term     := ?var | <iri> | curie | "literal" | 'a'
    modifier := GROUP BY var | ORDER BY (var | ASC(var) | DESC(var)) | LIMIT n

The reference's prepareQuery rewrites are applied first: 'a' → rdf:type,
PREFIX extraction + re-injection of the global prefix map, bare-IRI
bracketing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.functions.terms import DEFAULT_PREFIXES
from graphforge_spark.operators.closure import path_alternation, transitive_closure
from graphforge_spark.plans.bgp import Var, bgp, optional

_PREFIX_RE = re.compile(r"PREFIX\s+([\w-]*):\s*<([^>]*)>", re.IGNORECASE)
_TERM_RE = re.compile(
    r"""\?(?P<var>\w+)
      | <(?P<iri>[^>]*)>
      | "(?P<lit>(?:[^"\\]|\\.)*)"
      | (?P<path>\((?:[^()]*)\)\*?)
      | (?P<curie>[\w-]*:[\w./#-]+\*?)
      | (?<![\w?<"]) (?P<kw>a) (?=\s)
    """,
    re.VERBOSE,
)


@dataclass
class _Parsed:
    projection: list = field(default_factory=list)  # ["*"] | vars | ("count", x, alias)
    patterns: list = field(default_factory=list)  # (term, predpath, term)
    optionals: list = field(default_factory=list)  # same shape
    group_by: str | None = None
    order_by: tuple | None = None  # (var, ascending)
    limit: int | None = None


def _split_statements(body: str) -> list[str]:
    """Split a WHERE body on statement dots, ignoring dots inside IRIs
    (<http://ex.org/…>) and string literals."""
    out, cur, in_iri, in_str = [], [], False, False
    for ch in body:
        if ch == "<" and not in_str:
            in_iri = True
        elif ch == ">" and not in_str:
            in_iri = False
        elif ch == '"' and not in_iri:
            in_str = not in_str
        if ch == "." and not in_iri and not in_str:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur))
    return out


def _strip_comments(q: str) -> str:
    # '#' starts a comment only at line start or after whitespace — IRIs
    # carry '#' internally (…rdf-syntax-ns#type)
    return "\n".join(re.sub(r"(^|\s)#.*$", r"\1", line) for line in q.splitlines())


def _expand(term: str, prefixes: dict[str, str]) -> str:
    """CURIE → IRI using the prefix map (reference: prefix re-injection,
    queryManager.js:106-113); unknown prefixes stay as written (matching
    the stringly-typed store)."""
    if term == "a":
        return _expand("rdf:type", prefixes)
    m = re.match(r"([\w-]*):(.*)", term)
    if m and m.group(1) in prefixes:
        return prefixes[m.group(1)] + m.group(2)
    return term


def _parse_term(tok: re.Match, prefixes: dict):
    if tok.group("var"):
        return Var(tok.group("var"))
    if tok.group("iri") is not None:
        return tok.group("iri")
    if tok.group("lit") is not None:
        return tok.group("lit")
    if tok.group("kw"):
        return _expand("rdf:type", prefixes)
    if tok.group("path"):
        return ("path", tok.group("path"))
    return _expand(tok.group("curie"), prefixes)


def _parse_pattern(text: str, prefixes: dict):
    toks = list(_TERM_RE.finditer(text))
    if len(toks) != 3:
        raise ValueError(f"cannot parse triple pattern: {text!r}")
    s, p, o = (_parse_term(t, prefixes) for t in toks)
    # normalize pred slot: path tuple, starred curie, or plain term
    if isinstance(p, str) and p.endswith("*") and not p.startswith("http"):
        p = ("path", f"({p})")
    return (s, p, o)


def parse_sparql(query: str, prefixes: dict[str, str] | None = None) -> _Parsed:
    q = _strip_comments(query)
    pmap = dict(DEFAULT_PREFIXES)
    if prefixes:
        pmap.update(prefixes)
    for pfx, iri in _PREFIX_RE.findall(q):
        pmap[pfx] = iri
    q = _PREFIX_RE.sub(" ", q)

    m = re.search(r"SELECT\s+(?P<proj>.*?)\s+WHERE\s*\{", q, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError("only SELECT ... WHERE { ... } queries are supported")
    proj_text = m.group("proj")
    body_start = m.end()
    # brace-match the WHERE block (OPTIONAL nests one level)
    depth, i = 1, body_start
    while i < len(q) and depth:
        if q[i] == "{":
            depth += 1
        elif q[i] == "}":
            depth -= 1
        i += 1
    body, tail = q[body_start : i - 1], q[i:]

    parsed = _Parsed()

    # projection
    for agg in re.finditer(
        r"\(\s*COUNT\s*\(\s*\?(\w+)\s*\)\s+AS\s+\?(\w+)\s*\)", proj_text, re.IGNORECASE
    ):
        parsed.projection.append(("count", agg.group(1), agg.group(2)))
    proj_rest = re.sub(r"\([^)]*\)", " ", proj_text)
    if "*" in proj_rest:
        parsed.projection.append("*")
    parsed.projection.extend(v for v in re.findall(r"\?(\w+)", proj_rest))

    # body: extract OPTIONAL blocks first, then split remaining patterns on '.'
    def take_optional(mm: re.Match) -> str:
        parsed.optionals.append(_parse_pattern(mm.group(1), pmap))
        return " "

    body = re.sub(
        r"OPTIONAL\s*\{([^{}]*)\}", take_optional, body, flags=re.IGNORECASE
    )
    for chunk in _split_statements(body):
        if chunk.strip():
            parsed.patterns.append(_parse_pattern(chunk, pmap))

    # modifiers
    gm = re.search(r"GROUP\s+BY\s+\?(\w+)", tail, re.IGNORECASE)
    if gm:
        parsed.group_by = gm.group(1)
    om = re.search(r"ORDER\s+BY\s+(ASC|DESC)?\s*\(?\s*\?(\w+)\s*\)?", tail, re.IGNORECASE)
    if om:
        parsed.order_by = (om.group(2), (om.group(1) or "ASC").upper() == "ASC")
    lm = re.search(r"LIMIT\s+(\d+)", tail, re.IGNORECASE)
    if lm:
        parsed.limit = int(lm.group(1))
    return parsed, pmap


def _path_frame(triples: DataFrame, spec: str, s: Var, o: Var, pmap: dict) -> DataFrame:
    """Evaluate a predicate-path spec '(p1|p2)' or '(p1|p2)*' into a
    bindings frame over the path's subject/object variables."""
    starred = spec.endswith("*")
    inner = spec.rstrip("*").strip("()")
    preds = [_expand(p.strip().strip("<>"), pmap) for p in inner.split("|")]
    pairs = (
        transitive_closure(
            path_alternation(triples, preds), include_zero_step=True
        )
        if starred
        else path_alternation(triples, preds)
    )
    out = pairs
    if not isinstance(s, Var):
        out = out.filter(F.col("s") == s)
    if not isinstance(o, Var):
        out = out.filter(F.col("o") == o)
    sel = [F.col("s").alias(s.name)] if isinstance(s, Var) else []
    sel += [F.col("o").alias(o.name)] if isinstance(o, Var) else []
    return out.select(*sel)


def sparql_query(
    triples: DataFrame, query: str, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """Execute a SPARQL query (reference subset) over the triples store."""
    parsed, pmap = parse_sparql(query, prefixes)

    plain = [p for p in parsed.patterns if not (isinstance(p[1], tuple))]
    paths = [p for p in parsed.patterns if isinstance(p[1], tuple)]

    frames = []
    if plain:
        frames.append(bgp(triples, plain))
    for s, (_, spec), o in paths:
        frames.append(_path_frame(triples, spec, s, o, pmap))
    if not frames:
        raise ValueError("empty WHERE block")
    out = frames[0]
    for f in frames[1:]:
        shared = [c for c in out.columns if c in f.columns]
        out = out.join(f, shared, "inner") if shared else out.crossJoin(f)

    for opt_pattern in parsed.optionals:
        out = optional(out, bgp(triples, [opt_pattern]))

    # projection / aggregation
    aggs = [p for p in parsed.projection if isinstance(p, tuple)]
    if aggs:
        keys = [parsed.group_by] if parsed.group_by else []
        exprs = [F.count(x).alias(alias) for (_, x, alias) in aggs]
        out = out.groupBy(*keys).agg(*exprs)
        out = out.select(*(alias for (_, _, alias) in aggs), *keys)
    elif "*" not in parsed.projection:
        want = [v for v in parsed.projection if isinstance(v, str)]
        out = out.select(*[c for c in want if c in out.columns])

    if parsed.order_by:
        var, asc = parsed.order_by
        out = out.orderBy(F.col(var).asc() if asc else F.col(var).desc())
    if parsed.limit is not None:
        out = out.limit(parsed.limit)
    return out
