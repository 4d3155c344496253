"""SPARQL front-end: parse the reference's query surface into DataFrame
plans.

The reference accepts SPARQL text and hands it to Comunica after string
rewrites (prepareQuery, docs/test HTML/documentQueryTest.html:637-661;
inline copies docs/scripts/document.js:930-946,
docs/scripts/queryManager.js:90-113). Its exercised surface is pinned by
its own canned queries (docs/test HTML/SPARQL.html:241-283, default
query docs/scripts/app.js:100-104): BGP patterns, OPTIONAL, property-path
alternation with ZeroOrMore, COUNT…GROUP BY, SELECT */vars, LIMIT — plus
the DISTINCT/FILTER forms any Comunica user will paste. This module
parses that subset and compiles to the same Catalyst plans the
programmatic helpers (plans/bgp.py, operators/closure.py) produce.

Anything OUTSIDE the grammar raises ``ValueError`` — the reference hands
arbitrary SPARQL to a full engine, so silently dropping an unsupported
clause (e.g. executing SELECT DISTINCT as a bag projection) would return
*wrong* answers with no warning. Unsupported must be loud.

Grammar (whitespace-insensitive, case-insensitive keywords):

    query    := (BASE | PREFIX)* (select | ask | construct | describe)
                 (one BASE per query, absolute; every relative IRIREF —
                  including PREFIX declaration IRIs — resolves against it)
    select   := SELECT (DISTINCT|REDUCED)? proj WHERE { stmt* } modifier*
    ask      := ASK WHERE? { stmt* }            → one row, boolean `ask`
    construct:= CONSTRUCT { pattern+ } WHERE { stmt* } modifier*
                                               → distinct subj/pred/obj rows
    describe := DESCRIBE ('*' | var+ | (iri|curie)+) (WHERE { stmt* } modifier*)?
                                               → distinct subj/pred/obj rows
                 (description = all triples whose subject is a matched
                  resource; REDUCED executes as DISTINCT, a conforming
                  choice — the spec allows any duplicate elimination)
    proj     := '*' | (var | '(' AGG '(' DISTINCT? var ')' AS var ')'
              | '(' COUNT '(' '*' ')' AS var ')'   (group cardinality)
              | '(' expr AS var ')'    (expression projection = implicit BIND)
              | '(' GROUP_CONCAT '(' DISTINCT? var
                    (';' SEPARATOR '=' "s")? ')' AS var ')')+
    AGG      := COUNT | SUM | MIN | MAX | AVG | SAMPLE
              (COUNT(DISTINCT *) counts distinct SOLUTIONS —
               count_distinct over ONE struct of all binding columns, so
               null-extended OPTIONAL/UNION rows participate (bare-column
               count_distinct would drop any row holding a null).
               DISTINCT identity: COUNT/GROUP_CONCAT dedupe on the
               lexical term, the engine's documented term identity;
               SUM/AVG dedupe on the NUMERIC value after the cast —
               exactly SQL's SUM(DISTINCT CAST(..)), so the DuckDB
               oracle states the same semantics)
    stmt     := pattern '.'? | OPTIONAL group
              | FILTER '(' cond ')'
              | FILTER NOT? EXISTS group
              | BIND '(' expr AS var ')'
              | GRAPH (iri|curie) group      (constant graph: full group)
              | GRAPH var '{' pattern+ '}'   (variable graph: flat only)
              | group (UNION group)*         (nested group / union chain)
              | MINUS group
              | SERVICE SILENT? (iri|curie|var) group   (federation: the
                 group ships to a remote SPARQL 1.1 Protocol endpoint —
                 loopback always, other hosts behind
                 allow_service_network=True; SILENT failure = the spec's
                 single empty solution; a VARIABLE endpoint must be
                 bound non-nullably by the rest of the group — each
                 distinct IRI is queried, bounded by
                 _SERVICE_MAX_ENDPOINTS)
              | '{' select '}'        (subquery — top level of WHERE only)
              | VALUES (var | '(' var+ ')') '{' (term|'('term+')'|UNDEF)+ '}'
    group    := '{' stmt* '}'   (FULL group graph pattern, compiled
                 recursively; every braced-clause extraction is depth-0
                 guarded, so a clause nested inside another construct's
                 braces is never lifted out of its scope)
    pattern  := subj predpath objlist (';' predpath objlist)*
                (Turtle-style sugar: ';' predicate-object lists, ','
                 object lists, '[ predpath obj … ]' blank-node property
                 lists — desugared to plain patterns with internal
                 existential variables ?_anon_N, hidden from SELECT *;
                 the prefix is reserved)
    predpath := pathalt   (full recursive property-path algebra)
    pathalt  := pathseq ('|' pathseq)*
    pathseq  := pathstep ('/' pathstep)*
    pathstep := pathatom [*+?]
    pathatom := '^' pathatom | '(' pathalt ')' | iri | curie | 'a'
              | '!' (iri | curie) | '!(' ['^'](iri|curie) ('|' ['^'](iri|curie))* ')'
                                        (negated property set, incl. inverse members)
    term     := ?var | <iri> | curie | "literal" | 'a'
    expr     := term | STR(e) | CONCAT(e, ...) | UCASE(e) | LCASE(e)
              | STRLEN(e) | SUBSTR(e, pos[, len]) | REPLACE(e, "re", "rep")
              | STRBEFORE(e, "s") | STRAFTER(e, "s")
              | COALESCE(e, ...) | IF(cond, e, e)
              | e ('+'|'-'|'*'|'/') e       (arithmetic, SQL doubles;
                                             malformed numerics follow
                                             error-elimination via try_cast)
              | ABS(e) | CEIL(e) | FLOOR(e) | ROUND(e)
              | MD5(e) | SHA1(e) | SHA256(e) | ENCODE_FOR_URI(e)
    cond     := disj ; disj := conj ('||' conj)* ; conj := atom ('&&' atom)*
    atom     := '(' cond ')' | operand cmp operand | expr cmp expr
              | REGEX(var, "re"[, "imsx-flags"])
              | CONTAINS(var, "s") | STRSTARTS(var, "s") | STRENDS(var, "s")
              | BOUND(var) | !BOUND(var) | var NOT? IN '(' term (',' term)* ')'
              | SAMETERM(e, e) | ISNUMERIC(var)
              | ISIRI(var) | ISURI(var) | ISLITERAL(var) | ISBLANK(var)
                (term-type tests use the engine's discriminator:
                 IRI = startsWith 'http', blank = startsWith '_:',
                 literal = bound and neither — graphProcessor.js:222)
    operand  := var | literal | number | iri | curie | expr-function-call
    cmp      := '=' | '!=' | '<' | '<=' | '>' | '>='
    modifier := GROUP BY (var | '(' expr AS var ')')+ | HAVING '(' cond ')'
              | LIMIT n | OFFSET n
              | ORDER BY ((var | ASC(expr) | DESC(expr) | fn-call)+)
                (expression order conditions; aggregate calls rewrite to
                 their projection alias in aggregate queries)

Determinism notes (both sides of the value oracle must agree):
GROUP_CONCAT's element order is unspecified by SPARQL — this engine sorts
elements lexicographically before joining, so results are deterministic
and reproducible in ANSI SQL (``string_agg(x, sep ORDER BY x)``). SAMPLE
may return any element — this engine returns MIN, the same determinism
choice. REPLACE compiles to ``regexp_replace`` (Java regex semantics).

HAVING conditions may reference the projected aggregates either by their
alias (?n) or by the aggregate call itself (COUNT(?o)); the call form is
rewritten to the projection alias and anything unprojected raises.

'&&'/'||' splitting, parenthesis balancing, and the unsupported-keyword
scan are all string-literal-aware (and the keyword scan also blanks
<IRI> spans), so quoted ')'/'&&'/keyword text cannot derail parsing.

The reference's prepareQuery rewrites are applied first: 'a' → rdf:type,
PREFIX extraction + re-injection of the global prefix map, bare-IRI
bracketing.

Literal annotations: when the store carries the opt-in ``obj_lang``/
``obj_dt`` columns (extract.py; forge warehouses have them fixed-on),
the compiler runs in ANNOTATION MODE: the object column is rewritten
once, up front, into an encoded RDF term — ``"lex"`` / ``"lex"@tag`` /
``"lex"^^dt`` with ``\\``-escaped quotes/backslashes, IRIs and blank
nodes untouched — and every join, UNION null-extension, MINUS/EXISTS
compatible-mapping join, VALUES row, DISTINCT, and GROUP BY key then
operates on full RDF TERM IDENTITY for free ("a"@en ≠ "a"@fr ≠ "a"),
with zero per-construct threading (the alternative — per-variable
annotation companion columns — is exactly the silently-divergent-
bindings risk this module's loud-failure contract forbids). Scalar
expressions decode a ``?var`` reference to its lexical form (so
STRLEN/REGEX/numeric casts see what they saw before), ``LANG()``/
``DATATYPE()``/``LANGMATCHES()``/``STRLANG()``/``STRDT()`` read/build
the encoded form, and the final projection decodes every term column
back to the lexical form (opt-in ``with_annotations=True`` adds the
``{var}__lang``/``{var}__dt`` companion columns the result serializers
speak). Pattern/VALUES literals accept ``"x"@en`` / ``"x"^^dt`` syntax
in this mode (matching on term identity; ``^^xsd:string`` normalizes
to the plain form per RDF 1.1, as the extractors do). On a store
WITHOUT annotation columns nothing changes: literals bind the lexical
form, annotated query syntax and LANG()/DATATYPE() raise loudly.
Documented deviations, both inherited from the engine's stringly-typed
comparison semantics: ``=`` between variables compares lexical forms
(term-blind, as before — use sameTerm for term identity), and language
tags compare case-sensitively in term identity (RDF 1.1 says
case-insensitive; LANGMATCHES itself is case-insensitive per spec).
"""

from __future__ import annotations

import contextvars
import re
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from graphforge_spark.functions.terms import DEFAULT_PREFIXES
from graphforge_spark.operators.closure import _ckpt, path_alternation, transitive_closure
from graphforge_spark.plans.bgp import Var, bgp, optional

_PREFIX_RE = re.compile(r"PREFIX\s+([\w-]*):\s*<([^>]*)>", re.IGNORECASE)
# one step of an UNPARENTHESIZED path sequence/alternation: inverse
# marker, then IRI / negated set / parenthesized group / prefixed name /
# 'a', then a closure suffix. The prefixed-name local part here excludes
# '/' (as the SPARQL PN_LOCAL grammar does) so 'rdf:rest*/rdf:first'
# splits into steps — the standalone curie TERM group below keeps its
# permissive '/'-accepting class for backward compatibility.
_PATH_STEP = (
    r"""\^?(?:<[^>]*>
           |!\((?:[^()]*)\)|!<[^>]*>|![\w-]*:[\w.#-]+
           |\((?:[^()]|\([^()]*\))*\)
           |[\w-]*:[\w.#-]+
           |a(?!\w))[*+?]?"""
)
_TERM_RE = re.compile(
    rf"""\?(?P<var>\w+)
      | (?P<pathseq>{_PATH_STEP}(?:\s*[/|]\s*{_PATH_STEP})+)
      | (?P<pathiri>\^<[^>]*>[*+?]?|<[^>]*>[*+?])
      | <(?P<iri>[^>]*)>
      | "(?P<lit>(?:[^"\\]|\\.)*)"
        (?P<litsuf>@[A-Za-z0-9-]+|\^\^<[^>]*>|\^\^[\w-]*:[\w.#-]+)?
      | (?P<negset>!\((?:[^()]*)\)|!\^?<[^>]*>|!\^?[\w-]*:[\w./#-]+)
      | (?P<path>\^?\((?:[^()]|\([^()]*\))*\)[*+?]?)
      | (?P<curie>\^?[\w-]*:[\w./#-]+[*+?]?)
      | (?<![\w?<"]) (?P<kw>a) (?=\s)
    """,
    re.VERBOSE,
)
# VALUES data tokens: any term, or the UNDEF keyword (unbound slot).
# UNDEF must come first so the word never falls through to a curie parse.
_VALUES_TOK_RE = re.compile(
    r"(?P<undef>\b[Uu][Nn][Dd][Ee][Ff]\b)|" + _TERM_RE.pattern, re.VERBOSE
)
# Constructs in UNSUPPORTED POSITIONS — named here so the error says
# "unsupported SPARQL feature X", not just "cannot parse". SERVICE with
# a constant endpoint is supported (federation, r4), and so is a
# VARIABLE endpoint (SERVICE ?ep — the variable must be bound by the
# rest of the group); a SERVICE left in the body after clause capture
# had neither form (e.g. a bare keyword with no group).
_UNSUPPORTED_KEYWORDS = re.compile(
    r"\b(SERVICE)\b",
    re.IGNORECASE,
)

# SERVICE network policy: loopback endpoints (the engine's own
# sinks/endpoint, a sidecar store) are always allowed; anything else
# needs sparql_query(..., allow_service_network=True) — this build is
# hermetic by default, the same contract as demo.fetch_file.
_SERVICE_NETWORK: contextvars.ContextVar = contextvars.ContextVar(
    "graphforge_sparql_service_network", default=False
)
_SERVICE_TIMEOUT = 30.0
# federation is a remote MATERIALIZATION onto the driver — bound it.
# 256 MB of results JSON is far past any sane federated join input; a
# remote that exceeds it fails loudly (or silently under SILENT) rather
# than OOMing the driver.
_SERVICE_MAX_BYTES = 256 * 1024 * 1024


def _service_frame(spark, silent: bool, endpoint: str, text: str, pmap: dict):
    """Evaluate one SERVICE clause: POST ``SELECT * WHERE { group }`` (the
    outer query's PREFIX map re-attached) to the endpoint, parse the
    ``application/sparql-results+json`` bindings, and return
    ``(DataFrame, nullable-vars set)`` for the enclosing group's
    compatible-mapping join — or ``None`` for SERVICE SILENT failure
    (the spec's single-empty-solution: a join identity, so the clause is
    simply skipped). The full remote result materializes on the driver —
    federation is always a remote materialization; the remote's own
    row cap bounds it.

    In annotation mode remote literals encode to the store's term form
    (``"lex"``/``"lex"@lang``/``"lex"^^dt``, xsd:string normalized away;
    the legacy pre-1.1 ``typed-literal`` binding type counts as a
    literal) so term-identity joins against local bindings are exact;
    without annotation mode the lexical value binds (remote lang/dt
    dropped — the store's own lexical-view contract)."""
    import json as _json
    import urllib.error
    import urllib.parse
    import urllib.request

    from pyspark.sql.types import StructField, StructType

    annot = _ANNOT.get()
    try:
        iri = (
            endpoint
            if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", endpoint)
            else _expand(endpoint, pmap)
        )
        host = urllib.parse.urlparse(iri).hostname
        if host not in ("localhost", "127.0.0.1", "::1") and not _SERVICE_NETWORK.get():
            raise ValueError(
                f"SERVICE endpoint host {host!r} is not loopback — pass "
                "allow_service_network=True to federate beyond this "
                "machine (hermetic by default)"
            )
        prefix_hdr = "".join(f"PREFIX {p}: <{u}> " for p, u in pmap.items())
        q = f"{prefix_hdr}SELECT * WHERE {{ {text} }}"
        req = urllib.request.Request(
            iri,
            data=urllib.parse.urlencode({"query": q}).encode(),
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
                "Accept": "application/sparql-results+json",
            },
        )
        with urllib.request.urlopen(req, timeout=_SERVICE_TIMEOUT) as resp:
            if resp.status != 200:
                raise OSError(f"endpoint returned {resp.status}")
            body = resp.read(_SERVICE_MAX_BYTES + 1)
            if len(body) > _SERVICE_MAX_BYTES:
                raise OSError(
                    f"response exceeds _SERVICE_MAX_BYTES "
                    f"({_SERVICE_MAX_BYTES} B) — a federated join input "
                    "this size belongs in the warehouse, not SERVICE"
                )
            payload = _json.loads(body.decode("utf-8"))
        head_vars = list(payload["head"]["vars"])
        bindings = payload["results"]["bindings"]

        nullable: set = set()
        rows = []
        for b in bindings:
            row = []
            for vname in head_vars:
                t = _service_term(b.get(vname), annot)
                if t is None:
                    nullable.add(vname)
                row.append(t)
            rows.append(tuple(row))
        if not head_vars:
            # a varless remote result (the group was all-constant):
            # non-empty = join identity (skip the clause), empty =
            # annihilator (a zero-row frame; its _anon_ column is
            # hidden from SELECT * like every existential)
            if bindings:
                return None
            head_vars, rows = ["_anon_service"], []
        # StructType, not DDL text: remote var names are data (SPARQL
        # permits digit-first names like ?1 that a DDL string would
        # choke on), and field names here are opaque identifiers
        schema = StructType([StructField(v, StringType()) for v in head_vars])
        return spark.createDataFrame(rows, schema), nullable
    except Exception as e:
        if silent:
            # SPARQL 1.1 Federated Query: SILENT failure = a single
            # solution binding NOTHING. Bind the group's own variables
            # as one all-NULL row (all nullable), so explicitly
            # projected service vars come back unbound instead of
            # raising — and the compatible-mapping join treats the
            # solution as compatible with everything, the identity.
            svc_vars = sorted(set(re.findall(r"\?(\w+)", _mask_strings(text))))
            if not svc_vars:
                return None
            schema = StructType([StructField(v, StringType()) for v in svc_vars])
            return (
                spark.createDataFrame([tuple(None for _ in svc_vars)], schema),
                set(svc_vars),
            )
        raise ValueError(f"SERVICE <{endpoint}> failed: {e}") from e


def _service_term(b: dict | None, annot: bool):
    """One SPARQL-results-JSON binding → the engine's term string (or
    None for an absent binding). Split out for direct testing: the
    legacy ``typed-literal`` type (pre-1.1 endpoints: Virtuoso, old
    Jena) must encode like ``literal`` or annotation-mode term-identity
    joins would silently miss."""
    if b is None:
        return None
    v = b.get("value", "")
    if b.get("type") not in ("literal", "typed-literal") or not annot:
        return v
    lex = v.replace("\\", "\\\\").replace('"', '\\"')
    lang = b.get("xml:lang")
    dt = b.get("datatype")
    if lang:
        return f'"{lex}"@{lang}'
    if dt and dt != XSD_STRING:
        return f'"{lex}"^^{dt}'
    return f'"{lex}"'


# a VARIABLE endpoint (SERVICE ?ep) dispatches one remote query per
# distinct binding — each is a full HTTP round-trip materializing on the
# driver, so the endpoint SET is bounded: data with more distinct
# endpoints than this fails loudly rather than fanning out unboundedly.
_SERVICE_MAX_ENDPOINTS = 16


def _var_service_join(spark, out, out_null, silent, var, text, pmap):
    """``SERVICE (SILENT)? ?var { group }``: the endpoint variable must
    be bound — non-nullably — by the REST of the enclosing group
    (VALUES, a BGP, a subquery…), which is evaluated first. Each
    DISTINCT binding is dereferenced as one remote SPARQL query via
    ``_service_frame`` (same network policy / size cap / SILENT
    semantics); per-endpoint results are null-aligned (remote head vars
    can differ per endpoint), tagged with the endpoint IRI riding
    ``?var``, unioned, and compatible-joined back. Returns the new
    (frame, nullable) pair."""
    from pyspark.sql.types import StructField, StructType

    if var not in out.columns:
        raise ValueError(
            f"SERVICE ?{var}: endpoint variable is not bound by the "
            "enclosing group (bind it with VALUES or a triple pattern)"
        )
    if var in out_null:
        raise ValueError(
            f"SERVICE ?{var}: endpoint variable may be unbound "
            "(OPTIONAL/UNION) — an unbound endpoint cannot be dereferenced"
        )
    # materialize the group ONCE: both the endpoint collect below and
    # the final compatible join read it — without the checkpoint an
    # expensive BGP/subquery group would execute twice (review finding)
    out = _ckpt(out)
    ep_rows = (
        out.select(var).distinct().limit(_SERVICE_MAX_ENDPOINTS + 1).collect()
    )
    eps = sorted(r[0] for r in ep_rows if r[0] is not None)
    if len(eps) > _SERVICE_MAX_ENDPOINTS:
        raise ValueError(
            f"SERVICE ?{var}: more than {_SERVICE_MAX_ENDPOINTS} distinct "
            "endpoints — bound the endpoint set (VALUES) before federating"
        )
    frames: list = []
    for ep in eps:
        # IRIs are stored bare in both modes (only literals encode), so
        # the binding IS the endpoint; a literal-shaped value fails the
        # scheme check inside _service_frame (silently under SILENT)
        svc = _service_frame(spark, silent, ep, text, pmap)
        if svc is None:
            # identity for THIS endpoint (varless non-empty result or
            # varless SILENT failure): the solution set is just {ep}
            frames.append(
                (
                    spark.createDataFrame(
                        [(ep,)], StructType([StructField(var, StringType())])
                    ),
                    set(),
                )
            )
            continue
        fdf, fnull = svc
        if var in fdf.columns:
            # the remote also binds ?var: keep only solutions compatible
            # with this endpoint's IRI (unbound stays compatible)
            fdf = fdf.filter(F.col(var).isNull() | (F.col(var) == F.lit(ep)))
            fdf = fdf.withColumn(var, F.lit(ep))
        else:
            fdf = fdf.withColumn(var, F.lit(ep))
        frames.append((fdf, fnull))
    if not frames:
        # the endpoint column existed but held no rows: the join result
        # is empty regardless of the remote — an empty frame of the
        # endpoint var alone annihilates via the compatible join
        frames.append(
            (
                spark.createDataFrame(
                    [], StructType([StructField(var, StringType())])
                ),
                set(),
            )
        )
    # null-align across endpoints (remote head vars can differ)
    allcols: list = []
    for f, _ in frames:
        allcols += [c for c in f.columns if c not in allcols]
    aligned = [
        f.select(
            *[
                F.col(c) if c in f.columns else F.lit(None).cast("string").alias(c)
                for c in allcols
            ]
        )
        for f, _ in frames
    ]
    nullable = {c for c in allcols if any(c not in f.columns for f, _ in frames)}
    for _, nset in frames:
        nullable |= nset
    nullable.discard(var)
    svc_union = reduce(lambda a, b: a.unionByName(b), aligned)
    return _join_compat(out, out_null, svc_union, nullable)


# ---------------------------------------------------------------------------
# Annotation mode (module docstring, "Literal annotations"): when the store
# carries obj_lang/obj_dt, the object column is rewritten ONCE into an
# encoded RDF term and the whole compiler operates on term identity.
# Contextvars (not parameters) thread the mode through the recursive group
# compiles, same pattern as plans.bgp.ACTIVE_STATS — safe under concurrent
# endpoint threads.
_ANNOT: contextvars.ContextVar = contextvars.ContextVar(
    "graphforge_sparql_annot", default=False
)
# NOW() is pinned ONCE per query/update request (SPARQL 1.1 §17.4.5.1:
# every NOW() in a query returns the SAME xsd:dateTime). The entry
# points capture one driver timestamp before compiling; _bind_col only
# reads it. None outside an entry point — a direct _bind_col caller
# hitting NOW() without a pin gets a loud error, never a per-call clock.
_NOW: contextvars.ContextVar = contextvars.ContextVar(
    "graphforge_sparql_now", default=None
)


def _utcnow_lexical() -> str:
    """The pinned NOW() literal: UTC, millisecond precision, 'Z' suffix
    (an xsd:dateTime lexical form; TZ()/timestamp casts both read it)."""
    from datetime import datetime, timezone

    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
# Column names known to hold COMPUTED values (BIND / aggregate / GROUP BY
# expression aliases) rather than encoded terms: a ?var reference to one
# must NOT decode (and must keep its native numeric type for ORDER BY).
_COMPUTED: contextvars.ContextVar = contextvars.ContextVar(
    "graphforge_sparql_computed", default=None
)

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

# anchored shapes of an encoded literal term ("lex" / "lex"@tag / "lex"^^dt,
# lexical escapes \" and \\ only). (?s): a datatype IRI from hostile data
# could carry anything; the lexical class already admits newlines.
_ENC_LEX = r'(?s)^"((?:[^"\\]|\\.)*)"'
_ENC_LANG = r'(?s)^"(?:[^"\\]|\\.)*"@([A-Za-z0-9-]+)$'
_ENC_DT = r'(?s)^"(?:[^"\\]|\\.)*"\^\^(.+)$'


def _esc_lex(c: Column) -> Column:
    return F.regexp_replace(c, r'([\\"])', r"\\$1")


def _encode_store(triples: DataFrame) -> DataFrame:
    """Rewrite the object column into encoded RDF terms (literals quoted
    with their ``@lang``/``^^dt`` suffix; ``^^xsd:string`` never appears —
    the extractors normalize it to the plain form) and drop the
    annotation columns. One narrow projection over the scan."""
    suffix = (
        F.when(
            F.col("obj_lang").isNotNull(), F.concat(F.lit("@"), F.col("obj_lang"))
        )
        .when(F.col("obj_dt").isNotNull(), F.concat(F.lit("^^"), F.col("obj_dt")))
        .otherwise(F.lit(""))
    )
    enc = F.concat(F.lit('"'), _esc_lex(F.col("obj")), F.lit('"'), suffix)
    if "obj_is_literal" in triples.columns:
        is_lit = F.col("obj_is_literal")
    else:
        is_lit = (~F.col("obj").startswith("http")) & (
            ~F.col("obj").startswith("_:")
        )
    return (
        # _obj_raw keeps the scan-pushable raw column: an object-constant
        # pattern filter on the encoded expression cannot reach parquet
        # (PushedFilters/bloom/min-max all need a plain attribute), so
        # bgp._apply_pattern adds a redundant EqualTo(_obj_raw, lexical)
        # conjunct that can. Var slots never select it.
        triples.withColumn("_obj_raw", F.col("obj"))
        .withColumn("obj", F.when(is_lit, enc).otherwise(F.col("obj")))
        .drop("obj_lang", "obj_dt")
    )


def _decode_term(c: Column) -> Column:
    """Encoded literal → lexical form; IRIs/blank nodes/plain strings pass
    through. NULL-preserving."""
    s = c.cast("string")
    lex = F.regexp_replace(F.regexp_extract(s, _ENC_LEX, 1), r"\\(.)", r"$1")
    return F.when(s.startswith('"'), lex).otherwise(s)


def _vref(name: str) -> Column:
    """A ``?var`` reference in a scalar expression: the VALUE (lexical
    form) of the binding. In annotation mode term columns hold encoded
    literals, so the reference decodes; computed columns (BIND /
    aggregate aliases — never term-encoded) pass through with their
    native type."""
    c = F.col(name)
    if not _ANNOT.get():
        return c
    computed = _COMPUTED.get()
    if computed is not None and name in computed:
        return c
    return _decode_term(c)


def _lang_col(c: Column) -> Column:
    """SPARQL LANG over a raw term column: tag for lang-tagged literals,
    '' for other literals, NULL (type error → row elimination / unbound)
    for IRIs and blank nodes."""
    tag = F.regexp_extract(c, _ENC_LANG, 1)
    return F.when(c.startswith('"'), tag).otherwise(F.lit(None).cast("string"))


def _datatype_col(c: Column) -> Column:
    """SPARQL DATATYPE over a raw term column: the explicit datatype IRI,
    rdf:langString for lang-tagged, xsd:string for plain literals, NULL
    for IRIs/blank nodes/unbound."""
    dt = F.regexp_extract(c, _ENC_DT, 1)
    tag = F.regexp_extract(c, _ENC_LANG, 1)
    return (
        F.when(c.isNull() | ~c.startswith('"'), F.lit(None).cast("string"))
        .when(dt != "", dt)
        .when(tag != "", F.lit(RDF_LANGSTRING))
        .otherwise(F.lit(XSD_STRING))
    )


def _split_term_triples(out: DataFrame) -> DataFrame:
    """CONSTRUCT/DESCRIBE output in annotation mode: decode the encoded
    term columns back into the store's (obj, obj_lang, obj_dt) layout —
    the shape the N-Triples/Turtle sinks serialize. No-op otherwise."""
    if not _ANNOT.get():
        return out
    raw = F.col("obj")
    lang = F.regexp_extract(raw, _ENC_LANG, 1)
    dt = F.regexp_extract(raw, _ENC_DT, 1)
    return out.select(
        _decode_term(F.col("subj")).alias("subj"),
        _decode_term(F.col("pred")).alias("pred"),
        _decode_term(raw).alias("obj"),
        F.when(lang != "", lang).alias("obj_lang"),
        F.when(dt != "", dt).alias("obj_dt"),
    )


def _mask_strings(text: str) -> str:
    """Same-length copy with string-literal CONTENTS blanked (the quote
    characters survive). Structure scanning — paren balancing, '&&'/'||'
    splitting, keyword search — runs over the mask so quoted ')' or '&&'
    or keyword text cannot derail it; span indices map back 1:1."""
    out = list(text)
    in_str = esc = False
    for i, ch in enumerate(text):
        if in_str:
            if esc:
                esc = False
                out[i] = " "
            elif ch == "\\":
                esc = True
                out[i] = " "
            elif ch == '"':
                in_str = False
            else:
                out[i] = " "
        elif ch == '"':
            in_str = True
    return "".join(out)


def _split_top(text: str, masked: str, op: str) -> list[str]:
    """Split ``text`` on top-level (paren-depth-0) occurrences of the
    two-char operator ``op``, using the string-blanked ``masked`` copy for
    structure. Returns [text] when op never occurs at the top level."""
    parts, depth, last, i = [], 0, 0, 0
    while i < len(masked) - 1:
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and masked[i : i + 2] == op:
            parts.append(text[last:i])
            last = i + 2
            i += 2
            continue
        i += 1
    parts.append(text[last:])
    return parts


@dataclass
class _Parsed:
    projection: list = field(default_factory=list)  # ["*"] | vars | ("count", x, alias)
    distinct: bool = False
    patterns: list = field(default_factory=list)  # (term, predpath, term)
    optionals: list = field(default_factory=list)  # list[(patterns, filters, nested)]
    graphs: list = field(default_factory=list)  # (graph_iri | Var, list[pattern])
    unions: list = field(default_factory=list)  # list[list[str]] (arm body texts)
    minuses: list = field(default_factory=list)  # list[str] (group body texts)
    values: list = field(default_factory=list)  # (var_names, rows)
    filters: list = field(default_factory=list)  # raw condition strings
    exists: list = field(default_factory=list)  # (negated, group body text)
    subqueries: list = field(default_factory=list)  # raw '{ SELECT … }' texts
    services: list = field(default_factory=list)  # (silent, endpoint, group text)
    var_services: list = field(default_factory=list)  # (silent, var, group text)
    binds: list = field(default_factory=list)  # (alias, raw expr string)
    # expression projections '(expr AS ?v)' — applied AFTER every
    # WHERE-clause BIND so they may reference BIND-bound variables
    # (review finding: appended to `binds` during projection parse, they
    # ran FIRST and failed to resolve clause-BIND vars)
    proj_binds: list = field(default_factory=list)
    group_by: list = field(default_factory=list)  # [var, …] key order
    having: list = field(default_factory=list)  # raw condition strings
    order_by: list | None = None  # [(var, ascending), …] in key order
    limit: int | None = None
    offset: int | None = None
    datasets: tuple | None = None  # (FROM graph iris, FROM NAMED graph iris)
    # INTERNAL (emitted only by _rewrite_graph_subselect, never user
    # syntax): variable whose partitions the solution modifiers slice —
    # ORDER BY/LIMIT/OFFSET inside GRAPH ?var apply PER NAMED GRAPH, a
    # Window.partitionBy(?g) row_number, not a global orderBy/limit
    slice_by: str | None = None


def _expand_statements(
    body: str, counter: list | None = None, allow_bnode: bool = True
) -> list[str]:
    """Expand Turtle-style pattern sugar — ``;`` predicate-object lists,
    ``,`` object lists, ``[ … ]`` blank-node property lists — into plain
    ``s p o`` statement strings. Blank-node lists allocate internal
    variables ``?_anon_N`` (existential: they join like any variable but
    are hidden from ``SELECT *``; the prefix is reserved). Statements
    without sugar pass through verbatim so their parse errors read the
    same as before."""
    counter = counter if counter is not None else [0]
    out: list[str] = []
    for chunk in _split_statements(body):
        if not chunk.strip():
            continue
        if "?_anon_" in chunk:
            raise ValueError("the ?_anon_ variable prefix is reserved")
        # fast path: no sugar punctuation outside literals/IRIs
        probe = re.sub(r"<[^>]*>", "<>", _mask_strings(chunk))
        if not re.search(r"[;,\[\]]", probe):
            out.append(chunk)
            continue
        out.extend(_expand_one(chunk, counter, allow_bnode))
    return out


def _expand_one(chunk: str, counter: list, allow_bnode: bool) -> list[str]:
    text = chunk
    pos = 0
    emitted: list[str] = []

    def skip_ws() -> None:
        nonlocal pos
        while pos < len(text) and text[pos].isspace():
            pos += 1

    def next_term() -> str | None:
        nonlocal pos
        skip_ws()
        if pos >= len(text) or text[pos] in ";,]":
            return None
        if text[pos] == "[":
            if not allow_bnode:
                raise ValueError(
                    "blank-node property lists are not allowed here "
                    "(CONSTRUCT templates would need a fresh node per solution)"
                )
            pos += 1
            var = f"_anon_{counter[0]}"
            counter[0] += 1
            skip_ws()
            if pos < len(text) and text[pos] == "]":
                pos += 1
            else:
                parse_predobj(f"?{var}")
                skip_ws()
                if pos >= len(text) or text[pos] != "]":
                    raise ValueError(f"unbalanced '[' in pattern: {chunk.strip()!r}")
                pos += 1
            return f"?{var}"
        m = _TERM_RE.match(text, pos)
        if not m:
            raise ValueError(
                f"cannot parse term at {text[pos : pos + 20]!r} "
                f"in pattern {chunk.strip()!r}"
            )
        pos = m.end()
        return m.group(0)

    def parse_predobj(subj_text: str) -> None:
        nonlocal pos
        while True:
            p = next_term()
            if p is None:
                raise ValueError(f"expected a predicate in pattern {chunk.strip()!r}")
            while True:
                o = next_term()
                if o is None:
                    raise ValueError(f"expected an object in pattern {chunk.strip()!r}")
                emitted.append(f"{subj_text} {p} {o}")
                skip_ws()
                if pos < len(text) and text[pos] == ",":
                    pos += 1
                    continue
                break
            skip_ws()
            if pos < len(text) and text[pos] == ";":
                pos += 1
                skip_ws()
                if pos >= len(text) or text[pos] in ";,]":
                    # trailing ';' is legal Turtle
                    break
                continue
            break

    s = next_term()
    if s is None:
        return []
    parse_predobj(s)
    skip_ws()
    if pos < len(text):
        raise ValueError(
            f"unsupported trailing syntax {text[pos:].strip()!r} "
            f"in pattern {chunk.strip()!r}"
        )
    return emitted


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


_SCHEME_RE = re.compile(r"[A-Za-z][A-Za-z0-9+.-]*:")
# an IRIREF span per the SPARQL grammar: no <>"{}|^`\ and no whitespace.
# The charset matters doubly here: a naive <[^>]*> would span from a
# FILTER's '<' comparison to the next '>' comparison and "resolve" the
# text between them (review finding, reproduced) — real IRIREFs can
# never contain the quotes/spaces such a span would.
_IRIREF_RE = re.compile(r"<([^<>\"{}|^`\\\x00-\x20]*)>")
# the lookbehind excludes ':' (a prefixed name like ex:BASE) and the
# PN_LOCAL separators '.'/'-' (ex:p.BASE, ex:p-BASE) so no prefixed
# name's local part can be consumed as a declaration (review findings)
# \s* — the grammar does not require whitespace between BASE and the
# IRIREF (review finding: BASE<http://e/> was refused with an error
# that never named BASE)
_BASE_DECL_RE = re.compile(
    r"(?<![\w?$:.-])BASE\s*" + _IRIREF_RE.pattern, re.IGNORECASE
)
# characters that mark a <…> span as EXPRESSION text (a FILTER
# comparison chain), not an IRI operand: comparison/logic operators and
# parens. A relative IRI containing these (rare: parenthesized wiki
# slugs, query strings) is NOT resolved — write it absolute under BASE;
# the alternative silently corrupts any ?b<?c&&?c>?d chain.
_EXPR_SPAN_RE = re.compile(r'^[?$]|[&|=!()]')


def _apply_base(q: str, inherited: str | None = None, return_base: bool = False):
    """Resolve the prologue's ``BASE <iri>`` (SPARQL 1.1 §4.1.1): every
    relative IRIREF in the query — including the IRIs of PREFIX
    declarations, which the grammar also resolves against the base —
    rewrites to its absolute form, then the declaration is removed. One
    BASE per query; the grammar's mid-query re-declaration is refused
    loudly (silently honoring only the first would mis-resolve the
    rest). ``inherited`` supplies a base carried from an earlier Update
    operation in the same request (prologue declarations apply to all
    subsequent operations); a declaration in this text wins. Scans run
    over the string-blanked mask so a literal containing ``BASE <…>``
    or ``<rel>`` is never touched, and only grammar-valid IRIREF spans
    (no whitespace/quotes/braces) are candidates. ``return_base=True``
    returns ``(rewritten, effective_base)`` so Update's carry loop does
    not re-scan (the declaration logic lives in exactly one place)."""
    masked = _mask_strings(q)
    decls = list(_BASE_DECL_RE.finditer(masked))
    if len(decls) > 1:
        raise ValueError("multiple BASE declarations are unsupported")
    if decls:
        base = q[decls[0].start(1) : decls[0].end(1)]
        if not _SCHEME_RE.match(base):
            raise ValueError(f"BASE IRI {base!r} must be absolute")
    elif inherited is not None:
        base = inherited
    else:
        return (q, None) if return_base else q
    from urllib.parse import urljoin

    out: list = []
    last = 0
    for m in _IRIREF_RE.finditer(masked):
        val = q[m.start(1) : m.end(1)]
        if _SCHEME_RE.match(val):
            continue  # absolute already (covers the BASE decl itself)
        # expression guard (review finding): a spaceless comparison
        # chain like ?b<?c&&?c>?d yields a span whose '<' abuts a word
        # character / ')' and whose content carries operators — a
        # charset check alone would "resolve" it into a bogus IRI term.
        prev = masked[m.start() - 1] if m.start() > 0 else " "
        if prev.isalnum() or prev in "_)":
            # the '<' abuts an operand. If the span's content carries
            # expression characters or is purely numeric it really is a
            # comparison — skip it. Otherwise it is legal-but-spaceless
            # SPARQL like ``?s ?p<rel>`` whose relative IRI we would
            # silently leave unresolved (matching nothing): refuse
            # loudly instead, like the whitespace post-check below
            # (review finding — the post-check cannot catch this span
            # because it holds no whitespace).
            if not _EXPR_SPAN_RE.search(val) and not re.fullmatch(
                r"[\d.]*", val
            ):
                raise ValueError(
                    f"<{val}> follows {prev!r} with no whitespace — "
                    "ambiguous between a comparison and a relative "
                    "IRIREF under BASE; insert a space before '<' or "
                    "write the IRI as absolute"
                )
            continue
        if _EXPR_SPAN_RE.search(val):
            continue
        out.append(q[last : m.start()])
        try:
            resolved = urljoin(base, val)
        except ValueError as e:  # urllib: e.g. "Invalid IPv6 URL"
            raise ValueError(f"cannot resolve <{val}> against BASE <{base}>: {e}")
        if val.endswith("#") and not resolved.endswith("#"):
            # RFC 3986 §5.3: a reference with a defined-but-empty
            # fragment keeps its '#'; urllib's urljoin drops it, which
            # would silently bend every CURIE minted from a
            # ``PREFIX v: <vocab#>`` declaration (review finding).
            resolved += "#"
        if not _SCHEME_RE.match(resolved):
            raise ValueError(f"cannot resolve relative IRI <{val}> against BASE")
        out.append("<" + resolved + ">")
        last = m.end()
    out.append(q[last:])
    q2 = "".join(out)
    # a remaining <…> span that fails the IRIREF charset was NOT
    # resolved above. If it holds whitespace yet none of the characters
    # expression text would carry ("(){}&|=!?$ — a FILTER comparison
    # span always crosses at least one of these), it is almost
    # certainly an intended-but-invalid relative IRI like <a b>:
    # leaving it unresolved beside resolved neighbors would silently
    # match nothing (review finding) — refuse loudly instead.
    masked2 = _mask_strings(q2)
    for m in re.finditer(r"<([^<>]*)>", masked2):
        val = q2[m.start(1) : m.end(1)]
        if (
            not _SCHEME_RE.match(val)
            and re.search(r"\s", val)
            and not re.search(r'["(){}&|=!?$]', val)
        ):
            raise ValueError(
                f"<{val}> is not a valid IRIREF (whitespace) — cannot "
                "resolve it against BASE"
            )
    d2 = _BASE_DECL_RE.search(masked2)
    if d2 is None:
        return (q2, base) if return_base else q2  # inherited only
    q3 = q2[: d2.start()] + " " + q2[d2.end() :]
    return (q3, base) if return_base else q3


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
    if tok.group("pathseq"):
        return ("path", tok.group("pathseq"))
    if tok.group("iri") is not None:
        return tok.group("iri")
    if tok.group("lit") is not None:
        lit, suf = tok.group("lit"), tok.group("litsuf")
        if not _ANNOT.get():
            if suf:
                raise ValueError(
                    f"literal annotation {suf!r} needs a store with "
                    "annotation columns (obj_lang/obj_dt) — this store "
                    "binds the lexical form only"
                )
            return lit
        if suf and suf.startswith("^^"):
            dt = suf[2:]
            dt = dt[1:-1] if dt.startswith("<") else _expand(dt, prefixes)
            # RDF 1.1 term identity: ^^xsd:string IS the plain form
            suf = "" if dt == XSD_STRING else "^^" + dt
        return f'"{lit}"{suf or ""}'
    if tok.group("kw"):
        return _expand("rdf:type", prefixes)
    if tok.group("negset"):
        return ("path", tok.group("negset"))
    if tok.group("path"):
        return ("path", tok.group("path"))
    if tok.group("pathiri"):
        return ("path", tok.group("pathiri"))
    return _expand(tok.group("curie"), prefixes)


def _paren_close(masked: str, start: int, what: str) -> int:
    """``start`` indexes a '(' in ``masked``; return the index just past
    its matching ')'. Raises (naming ``what``) on unbalanced input."""
    depth, i = 1, start + 1
    while i < len(masked) and depth:
        if masked[i] == "(":
            depth += 1
        elif masked[i] == ")":
            depth -= 1
        i += 1
    if depth:
        raise ValueError(f"unbalanced parentheses in {what}")
    return i


def _residue(text: str, matches: list[re.Match]) -> str:
    """Text left over after blanking every matched span — loud-error fuel:
    any non-whitespace residue is syntax we did not understand."""
    chars = list(text)
    for m in matches:
        for i in range(m.start(), m.end()):
            chars[i] = " "
    return "".join(chars).strip()


def _parse_pattern(text: str, prefixes: dict):
    toks = list(_TERM_RE.finditer(text))
    left = _residue(text, toks)
    if left:
        raise ValueError(
            f"unsupported SPARQL syntax {left!r} in pattern {text.strip()!r}"
        )
    if len(toks) != 3:
        raise ValueError(f"cannot parse triple pattern: {text!r}")
    s, p, o = (_parse_term(t, prefixes) for t in toks)
    if isinstance(s, tuple) or isinstance(o, tuple):
        raise ValueError(
            f"property-path syntax is only valid in the predicate slot: {text.strip()!r}"
        )
    # Normalize the pred slot into a path spec when the RAW token carries
    # path syntax (suffix or inverse marker) — decided before CURIE
    # expansion, because the expanded IRI text can no longer be told apart
    # from an IRI that legitimately ends in '*'.
    raw_pred = toks[1].group("curie")
    if (
        isinstance(p, str)
        and raw_pred
        and (raw_pred.endswith(("*", "+", "?")) or raw_pred.startswith("^"))
    ):
        suffix = raw_pred[-1] if raw_pred.endswith(("*", "+", "?")) else ""
        body = raw_pred[: -1] if suffix else raw_pred
        p = ("path", f"({body}){suffix}")
    return (s, p, o)


def _balanced_end(masked: str, start: int) -> int:
    """``start`` indexes a '{' in ``masked``; return the index just past
    its matching '}'. Raises on unbalanced input."""
    depth, i = 1, start + 1
    while i < len(masked) and depth:
        if masked[i] == "{":
            depth += 1
        elif masked[i] == "}":
            depth -= 1
        i += 1
    if depth:
        raise ValueError("unbalanced braces in group")
    return i


def _brace_depths(masked: str) -> list[int]:
    """Depth of each character position under '{'/'}' nesting."""
    depths, d = [], 0
    for ch in masked:
        if ch == "{":
            depths.append(d)
            d += 1
        elif ch == "}":
            d -= 1
            depths.append(d)
        else:
            depths.append(d)
    return depths


def _take_braced_clauses(body: str, head_re: str):
    """Remove every TOP-LEVEL ``HEAD { balanced-group }`` clause from
    ``body`` — ``head_re`` is a regex that ENDS at the opening brace —
    returning ``(rest, [(head_match_groups, group_body_text), ...])``.
    The scan runs over the string-blanked mask so quoted braces cannot
    confuse the balance, and a head INSIDE another construct's braces
    (e.g. a MINUS inside an OPTIONAL group) is left in place for that
    construct's own recursive compile — clause scope is never lifted."""
    masked = _mask_strings(body)
    depths = _brace_depths(masked)
    pat = re.compile(head_re, re.IGNORECASE)
    out, found, pos = [], [], 0
    while True:
        m = pat.search(masked, pos)
        if not m:
            out.append(body[pos:])
            break
        if depths[m.start()] != 0:
            nested_end = _balanced_end(masked, m.end() - 1)
            out.append(body[pos:nested_end])
            pos = nested_end
            continue
        end = _balanced_end(masked, m.end() - 1)
        out.append(body[pos : m.start()])
        found.append((m.groups(), body[m.end() : end - 1]))
        pos = end
    return " ".join(out), found


def _take_paren_blocks(body: str, keyword: str) -> tuple[str, list[str]]:
    """Remove every ``KEYWORD ( balanced )`` from body; return (rest, blocks).
    Keyword search and paren balancing run over the string-blanked mask so
    a quoted ')' (e.g. REGEX(?x, "a)b")) cannot unbalance the scan."""
    out, blocks = [], []
    masked = _mask_strings(body)
    pat = re.compile(rf"\b{keyword}\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pat.search(masked, pos)
        if not m:
            out.append(body[pos:])
            break
        out.append(body[pos : m.start()])
        depth, i = 1, m.end()
        while i < len(masked) and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced parentheses after {keyword}")
        blocks.append(body[m.end() : i - 1])
        pos = i
    return " ".join(out), blocks


def _rewrite_graph_subselect(g_txt: str, sub: str) -> str:
    """Rewrite a subquery that appears inside ``GRAPH ?g { … }``: per the
    algebra, Graph(?g, SubSelect) evaluates the subquery once per named
    graph and extends each solution with the ?g binding. The text
    rewrite that states exactly this: distribute ?g down the subquery's
    WHERE (every pattern binds ?g), add ?g to the projection (so the
    per-graph scope survives the projection cut), and add ?g to GROUP BY
    when the subquery aggregates (per-graph groups — the spec's implicit
    one-group-per-graph for a bare aggregate projection included).
    ORDER BY / LIMIT / OFFSET apply PER GRAPH, which no global modifier
    after the rewrite can express — the rewrite appends the INTERNAL
    'GRAPHSLICE ?g' clause, which the compiler implements as a
    Window.partitionBy(?g) row_number slice (per-graph LIMIT/OFFSET
    over the per-graph ORDER)."""
    masked = _mask_strings(sub)
    if re.search(re.escape(g_txt) + r"\b", masked):
        raise ValueError(
            f"subquery inside GRAPH {g_txt} already uses variable {g_txt}"
        )
    has_modifiers = re.search(
        r"\b(LIMIT|OFFSET|ORDER\s+BY)\b", masked, re.IGNORECASE
    )
    m = re.match(
        r"\s*SELECT\s+(DISTINCT\s+)?(.*?)\s*WHERE\s*\{",
        masked,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError(f"cannot parse subquery inside GRAPH {g_txt}: {sub!r}")
    start = m.end() - 1
    end = _balanced_end(masked, start)
    inner = _distribute_graph(g_txt, sub[start + 1 : end - 1], _top=False)
    proj = sub[m.start(2) : m.end(2)]
    tail = sub[end:]
    new_proj = proj if proj.strip() == "*" else f"{g_txt} {proj}"
    tmasked = _mask_strings(tail)
    gb = re.search(r"\bGROUP\s+BY\b", tmasked, re.IGNORECASE)
    if gb:
        tail = tail[: gb.end()] + f" {g_txt}" + tail[gb.end() :]
    elif re.search(
        r"\(\s*(COUNT|SUM|MIN|MAX|AVG|SAMPLE|GROUP_CONCAT)\s*\(",
        _mask_strings(proj),
        re.IGNORECASE,
    ):
        tail = tail + f" GROUP BY {g_txt}"
    dist = sub[m.start(1) : m.end(1)] if m.group(1) else ""
    slice_clause = f" GRAPHSLICE {g_txt}" if has_modifiers else ""
    return f"SELECT {dist}{new_proj} WHERE {{ {inner} }}{tail}{slice_clause}"


def _distribute_graph(g_txt: str, body: str, _top: bool = True) -> str:
    """Rewrite a variable-graph FULL group body (``GRAPH ?g { body }``)
    by distributing the graph context down to its flat pattern runs, per
    the SPARQL-algebra identities Graph(g, Join(A,B)) =
    Join(Graph(g,A), Graph(g,B)) and Graph(g, Union(A,B)) =
    Union(Graph(g,A), Graph(g,B)); LeftJoin/Minus/Exists distribute the
    same way HERE because every wrapped pattern binds ?g, so the shared
    ?g column keeps the left/anti/semi join within one named graph —
    exactly the per-graph evaluation the algebra prescribes. FILTER,
    BIND, and VALUES are solution-sequence operators with no active
    graph and pass through verbatim; a NESTED ``GRAPH x { … }`` clause
    switches the active graph and passes through verbatim. A subquery
    rewrites via ``_rewrite_graph_subselect`` (its WHERE distributes, ?g
    joins its projection and GROUP BY — per-graph evaluation surviving
    the projection cut). The rewritten text
    compiles through the ordinary recursive group compiler, so
    OPTIONAL / UNION / MINUS / EXISTS / FILTER / BIND / VALUES / paths
    all work inside ``GRAPH ?var``. Raises when the body contains no
    construct at all (the flat patterns+paths grammar already rejected
    it, so distribution cannot make progress — a genuine syntax error)."""
    masked = _mask_strings(body)

    def _level_binding_vars() -> set[str]:
        """Variables this level's OTHER clauses can BIND: the level body
        with every span that only REFERENCES variables blanked — MINUS
        bodies, FILTER [NOT] EXISTS bodies, and FILTER(...) conditions
        contribute no bindings to the group."""
        t = masked
        for head in (r"\bMINUS\s*\{", r"\bFILTER\s+(?:NOT\s+)?EXISTS\s*\{"):
            while True:
                hm = re.search(head, t, re.IGNORECASE)
                if not hm:
                    break
                e = _balanced_end(t, hm.end() - 1)
                t = t[: hm.start()] + " " * (e - hm.start()) + t[e:]
        while True:
            fm = re.search(r"\bFILTER\s*\(", t, re.IGNORECASE)
            if not fm:
                break
            d, i2 = 1, fm.end()
            while i2 < len(t) and d:
                if t[i2] == "(":
                    d += 1
                elif t[i2] == ")":
                    d -= 1
                i2 += 1
            t = t[: fm.start()] + " " * (i2 - fm.start()) + t[i2:]
        return set(re.findall(r"\?(\w+)", t))

    tok = re.compile(
        r"(?P<fex>\bFILTER\s+(?:NOT\s+)?EXISTS\s*\{)"
        r"|(?P<opt>\bOPTIONAL\s*\{)"
        r"|(?P<minus>\bMINUS\s*\{)"
        r"|(?P<graph>\bGRAPH\s+(?:\?\w+|<[^>]*>|[\w.-]*:[\w./#-]+)\s*\{)"
        r"|(?P<values>\bVALUES\s+(?:\?\w+|\([^)]*\))\s*\{)"
        r"|(?P<fil>\bFILTER\s*\()"
        r"|(?P<bind>\bBIND\s*\()"
        r"|(?P<brace>\{)",
        re.IGNORECASE,
    )
    out: list[str] = []
    progressed = False

    def wrap(seg: str) -> None:
        if seg.strip(" \t\r\n."):
            out.append(f"GRAPH {g_txt} {{ {seg} }}")

    pos = 0
    while True:
        m = tok.search(masked, pos)
        if not m:
            wrap(body[pos:])
            break
        wrap(body[pos : m.start()])
        progressed = True
        kind = m.lastgroup
        if kind in ("fex", "opt", "minus"):
            end = _balanced_end(masked, m.end() - 1)
            if kind == "minus":
                # SPARQL disjoint-domain rule: a MINUS whose body shares
                # no BINDING variable with its group is a no-op (keeps
                # every solution). Distributing would make ?g a shared
                # variable and wrongly correlate the anti-join — drop
                # the clause instead (the spec's answer).
                inner_vars = set(re.findall(r"\?(\w+)", masked[m.end() : end - 1]))
                if not (inner_vars & _level_binding_vars()):
                    pos = end
                    continue
            inner = _distribute_graph(g_txt, body[m.end() : end - 1], _top=False)
            out.append(f"{body[m.start():m.end()]} {inner} }}")
            pos = end
        elif kind in ("graph", "values"):
            end = _balanced_end(masked, m.end() - 1)
            out.append(body[m.start() : end])
            pos = end
        elif kind in ("fil", "bind"):
            depth, i = 1, m.end()
            while i < len(masked) and depth:
                if masked[i] == "(":
                    depth += 1
                elif masked[i] == ")":
                    depth -= 1
                i += 1
            if depth:
                raise ValueError("unbalanced parentheses in GRAPH ?var group")
            out.append(body[m.start() : i])
            pos = i
        else:  # bare brace: subquery, lone group, or UNION chain
            arms, j = [], m.start()
            while True:
                end = _balanced_end(masked, j)
                arms.append(body[j + 1 : end - 1])
                nxt = re.match(r"\s*UNION\s*\{", masked[end:], re.IGNORECASE)
                if not nxt:
                    break
                j = end + nxt.end() - 1

            def _arm(a: str) -> str:
                # a subquery arm rewrites like a lone subquery (its WHERE
                # distributes and ?g joins its projection/GROUP BY); a
                # plain group arm distributes recursively — so a UNION
                # may mix both shapes (r4 verdict #4: the last corner)
                if re.match(r"\s*SELECT\b", _mask_strings(a), re.IGNORECASE):
                    return "{ " + _rewrite_graph_subselect(g_txt, a) + " }"
                return f"{{ {_distribute_graph(g_txt, a, _top=False)} }}"

            out.append(" UNION ".join(_arm(a) for a in arms))
            pos = end
    if _top and not progressed:
        raise ValueError(
            "GRAPH ?var group supports plain patterns, property paths, and "
            f"group constructs (OPTIONAL/UNION/FILTER/…) only, got: {body.strip()!r}"
        )
    return " ".join(out)


def _patterns_frame(triples: DataFrame, pats: list, pmap: dict) -> DataFrame:
    """Compile a mixed list of plain triple patterns and property-path
    patterns into one bindings frame: plain patterns compile together as
    a BGP, each path pattern compiles via ``_path_frame``, and the pieces
    equi-join on their shared variables (cross join when disjoint —
    SPARQL's cartesian semantics for variable-disjoint patterns)."""
    plain = [p for p in pats if not isinstance(p[1], tuple)]
    paths = [p for p in pats if isinstance(p[1], tuple)]
    parts: list[DataFrame] = []
    if plain:
        parts.append(bgp(triples, plain))
    for s, (_, spec), o in paths:
        parts.append(_path_frame(triples, spec, s, o, pmap))
    out = parts[0]
    for f in parts[1:]:
        shared = [c for c in out.columns if c in f.columns]
        out = out.join(f, shared, "inner") if shared else out.crossJoin(f)
    return out


def _compile_optional_block(triples: DataFrame, blk: tuple, pmap: dict):
    """Compile one (patterns, filters, nested) optional group into a
    bindings frame plus the set of its columns that may be unbound
    (null-extended by a nested OPTIONAL). Nested groups left-join into
    the group frame first; the group's FILTERs then apply over the whole
    group's bindings, per SPARQL group scoping."""
    pats, filts, nested = blk
    f = _patterns_frame(triples, pats, pmap)
    f_null: set = set()
    for nb in nested:
        nf, n_null = _compile_optional_block(triples, nb, pmap)
        shared = [c for c in f.columns if c in nf.columns]
        if (n_null | f_null) & set(shared):
            # unbound-compatible shared variable: compatible-mapping
            # left join (see _left_join_compat) instead of the plain
            # equi-join, which would silently drop spec-valid bindings
            f, f_null = _left_join_compat(f, f_null, nf, n_null)
        else:
            f_null |= {c for c in nf.columns if c not in f.columns}
            f = optional(f, nf)
    for cond in filts:
        refs = set(re.findall(r"\?(\w+)", cond))
        if not refs <= set(f.columns):
            # a filter referencing left-side vars is a correlated
            # LeftJoin condition — different join, loud refusal
            raise ValueError(
                "OPTIONAL FILTER may only use the block's own "
                f"variables; {sorted(refs - set(f.columns))} "
                "bind outside the group"
            )
        f = f.filter(_filter_col(cond, pmap))
    return f, f_null


def _take_optional_groups(text: str) -> tuple[str, list[str]]:
    """Remove every TOP-LEVEL ``OPTIONAL { … }`` (braces balanced to any
    depth) from text; return (rest, block_texts). Delegates to the
    shared depth-0 braced-clause scanner: a quoted brace cannot derail
    the balance, and an OPTIONAL inside another construct's braces stays
    in place for that construct's recursive compile."""
    rest, found = _take_braced_clauses(text, r"\bOPTIONAL\s*\{")
    return rest, [blk for _groups, blk in found]


def parse_sparql(query: str, prefixes: dict[str, str] | None = None) -> _Parsed:
    q = _strip_comments(query)
    # scan with string literals AND <IRI> spans blanked: a literal
    # containing "values" or an IRI like <http://ex.org/ASK> must not
    # false-positive as a clause keyword
    scan = re.sub(r"<[^>]*>", "<>", re.sub(r'"(?:[^"\\]|\\.)*"', '""', q))
    # SERVICE with a constant OR variable endpoint is supported
    # (captured later as a clause); anything else after the keyword is
    # outside the grammar
    for bad in _UNSUPPORTED_KEYWORDS.finditer(scan):
        if bad.group(0).upper() == "SERVICE" and re.match(
            r"\s*(?:SILENT\s+)?(?:<|\?|[\w-]+:)", scan[bad.end():], re.IGNORECASE
        ):
            continue
        raise ValueError(f"unsupported SPARQL feature: {bad.group(0).upper()}")
    # BASE resolves relative IRIREFs BEFORE prefix capture (a PREFIX
    # declaration's own IRI resolves against the base, per grammar)
    q = _apply_base(q)
    pmap = dict(DEFAULT_PREFIXES)
    if prefixes:
        pmap.update(prefixes)
    for pfx, iri in _PREFIX_RE.findall(q):
        pmap[pfx] = iri
    q = _PREFIX_RE.sub(" ", q)

    # dataset clauses: FROM <g> builds the default graph (RDF merge of
    # the listed graphs), FROM NAMED <g> the named-graph set — stripped
    # here (they sit between the projection and WHERE in every query
    # form) and recorded for _select_frame to build the two stores.
    # Scans run at brace depth 0 on a string-AND-IRI-blanked mask so a
    # quoted "FROM" or an IRI like <http://ex.org/FROM> never matches.
    ds_masked = _mask_strings(q)
    ds_masked = re.sub(
        r"<[^>]*>", lambda mm: "<" + " " * (len(mm.group(0)) - 2) + ">", ds_masked
    )
    ds_depths = _brace_depths(ds_masked)
    from_graphs: list[str] = []
    named_graphs: list[str] = []
    ds_chars = list(q)
    for dm in re.finditer(
        r"(?<![?$\w])FROM\s+(NAMED\s+)?(<[^>]*>|[\w.-]*:[\w./#-]+)",
        ds_masked,
        re.IGNORECASE,
    ):
        if ds_depths[dm.start()] != 0:
            raise ValueError(
                "FROM/FROM NAMED are query-level dataset clauses "
                "(not allowed inside a group)"
            )
        raw = q[dm.start(2) : dm.end(2)]
        iri = raw[1:-1] if raw.startswith("<") else _expand(raw, pmap)
        (named_graphs if dm.group(1) else from_graphs).append(iri)
        for k in range(dm.start(), dm.end()):
            ds_chars[k] = " "
    q = "".join(ds_chars)
    datasets = (
        (from_graphs, named_graphs) if (from_graphs or named_graphs) else None
    )

    # one counter per query keeps blank-node-list variables (?_anon_N)
    # unique across every group the desugarer touches
    anon = [0]

    m = re.search(
        r"SELECT\s+(?P<distinct>(?:DISTINCT|REDUCED)\s+)?(?P<proj>.*?)\s+WHERE\s*\{",
        q,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("only SELECT ... WHERE { ... } queries are supported")
    head_residue = q[: m.start()].strip()
    if head_residue:
        raise ValueError(f"unsupported SPARQL syntax before SELECT: {head_residue!r}")
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
    if depth:
        raise ValueError("unbalanced braces in WHERE block")
    body, tail = q[body_start : i - 1], q[i:]

    parsed = _Parsed()
    parsed.distinct = bool(m.group("distinct"))
    parsed.datasets = datasets

    # ---- projection (every token must be understood) ----------------------
    agg_matches = list(
        re.finditer(
            r"""\(\s*(?:
                  (?P<fn>COUNT|SUM|MIN|MAX|AVG|SAMPLE)\s*\(\s*
                  (?P<dist>DISTINCT\s+)?(?:\?(?P<x>\w+)|(?P<star>\*))\s*\)
                | (?P<gc>GROUP_CONCAT)\s*\(\s*(?P<gdist>DISTINCT\s+)?\?(?P<gx>\w+)\s*
                  (?:;\s*SEPARATOR\s*=\s*"(?P<sep>(?:[^"\\]|\\.)*)"\s*)?\)
              )\s+AS\s+\?(?P<alias>\w+)\s*\)""",
            proj_text,
            re.IGNORECASE | re.VERBOSE,
        )
    )
    # projection items carry their text position so the output column
    # order follows the SELECT clause, whatever mix of aggregates,
    # expressions, and plain variables it holds
    proj_items = []
    for agg in agg_matches:
        if agg.group("gc"):
            # SPARQL's default separator is a single space
            sep = agg.group("sep") if agg.group("sep") is not None else " "
            proj_items.append(
                (
                    agg.start(),
                    (
                        "group_concat",
                        agg.group("gx"),
                        agg.group("alias"),
                        sep,
                        bool(agg.group("gdist")),
                    ),
                )
            )
        else:
            fn = agg.group("fn").lower()
            distinct = bool(agg.group("dist"))
            if agg.group("star") is not None:
                if fn != "count":
                    raise ValueError(f"{fn.upper()}(*) is not valid SPARQL")
            x = agg.group("x") if agg.group("star") is None else "*"
            proj_items.append((agg.start(), (fn, x, agg.group("alias"), None, distinct)))
    rest = _residue(proj_text, agg_matches)
    # expression projections: ( expr AS ?alias ) — compiled as a BIND over
    # the group bindings plus a plain projection of the alias. Scanned on
    # the string-blanked mask so quoted parens can't unbalance the walk.
    masked_rest = _mask_strings(rest)
    expr_spans = []
    pos = 0
    while True:
        start = masked_rest.find("(", pos)
        if start < 0:
            break
        depth, i = 1, start + 1
        while i < len(masked_rest) and depth:
            if masked_rest[i] == "(":
                depth += 1
            elif masked_rest[i] == ")":
                depth -= 1
            i += 1
        if depth:
            raise ValueError(f"unbalanced parentheses in SELECT projection: {rest!r}")
        blk = rest[start + 1 : i - 1]
        bm = re.match(r"^(.*?)\s+AS\s+\?(\w+)\s*$", _mask_strings(blk), re.IGNORECASE | re.DOTALL)
        if not bm:
            raise ValueError(
                f"cannot parse SELECT expression (expected '(expr AS ?var)'): ({blk})"
            )
        parsed.proj_binds.append((bm.group(2), blk[: bm.end(1)]))
        proj_items.append((start, bm.group(2)))
        expr_spans.append((start, i))
        pos = i
    if expr_spans:
        chars = list(rest)
        for s_, e_ in expr_spans:
            for j in range(s_, e_):
                chars[j] = " "
        rest = "".join(chars)
    plain = list(re.finditer(r"\*|\?(\w+)", rest))
    for t in plain:
        proj_items.append((t.start(), "*" if t.group(0) == "*" else t.group(1)))
    parsed.projection.extend(item for _, item in sorted(proj_items, key=lambda p: p[0]))
    left = _residue(rest, plain)
    if left:
        raise ValueError(f"unsupported SELECT projection syntax: {left!r}")
    if not parsed.projection:
        raise ValueError("empty SELECT projection")

    # ---- body: OPTIONAL blocks, FILTER conditions, then plain patterns ----
    def parse_optional_block(blk_text: str) -> tuple:
        # An optional group parses recursively: nested OPTIONAL groups
        # first (balanced braces), then the group's FILTERs, then its
        # patterns. FILTERs scope to the whole group — they apply after
        # the group's own nested optionals join in, so BOUND/!BOUND over
        # a nested variable works, and a failing filter yields an unbound
        # extension at the enclosing level, not a dropped row.
        inner_rest, inner_blocks = _take_optional_groups(blk_text)
        nested = [parse_optional_block(b) for b in inner_blocks]
        rest2, opt_filters = _take_paren_blocks(inner_rest, "FILTER")
        pats = [
            _parse_pattern(stmt, pmap)
            for stmt in _expand_statements(rest2, anon)
        ]
        if not pats:
            raise ValueError("empty OPTIONAL block")
        return (pats, opt_filters, nested)

    # VALUES inline data: VALUES ?x { t1 t2 } or VALUES (?x ?y) { (a b) … }
    def take_values(mm: re.Match) -> str:
        head, rows_text = mm.group(1), mm.group(2)
        names = re.findall(r"\?(\w+)", head)
        if not names:
            raise ValueError(f"cannot parse VALUES variables: {head!r}")

        def term_of(tok: re.Match):
            if tok.lastgroup == "undef":
                return None  # UNDEF: the variable is unbound in this row
            if tok.lastgroup == "kw":
                # 'a' is predicate-position sugar only, not a data term
                raise ValueError("'a' keyword is not a term inside VALUES data")
            t = _parse_term(tok, pmap)
            if isinstance(t, Var):
                raise ValueError("variables are not terms inside VALUES data")
            if isinstance(t, tuple):
                raise ValueError(
                    "property-path syntax is not a term inside VALUES data"
                )
            return t

        rows = []
        if len(names) == 1:
            for tok in _VALUES_TOK_RE.finditer(rows_text):
                rows.append((term_of(tok),))
            left = _residue(rows_text, list(_VALUES_TOK_RE.finditer(rows_text)))
            if left:
                raise ValueError(f"unsupported VALUES data syntax: {left!r}")
        else:
            for row_m in re.finditer(r"\(([^()]*)\)", rows_text):
                toks = list(_VALUES_TOK_RE.finditer(row_m.group(1)))
                # per-row residue: junk between tokens must be refused
                # even when the parseable-token count happens to equal
                # the arity (silently dropping a typo'd term would
                # fabricate a different binding row)
                left_row = _residue(row_m.group(1), toks)
                if left_row:
                    raise ValueError(
                        f"unsupported VALUES data syntax: {left_row!r}"
                    )
                if len(toks) != len(names):
                    raise ValueError(
                        f"VALUES row arity {len(toks)} != {len(names)} vars"
                    )
                rows.append(tuple(term_of(t) for t in toks))
            left = _residue(rows_text, list(re.finditer(r"\([^()]*\)", rows_text)))
            if left:
                raise ValueError(f"unsupported VALUES data syntax: {left!r}")
        if not rows:
            raise ValueError("empty VALUES block")
        parsed.values.append((names, rows))
        return " "

    # Subqueries: { SELECT … } groups — extracted FIRST of all braced
    # clauses (the only construct whose braces nest arbitrarily deep, so
    # the flat [^{}]* clause regexes below must never see one). The scan
    # runs over the string mask with depth tracking: a subquery nested
    # inside another group (e.g. a UNION arm) would silently change its
    # join scope if lifted out, so non-top-level subqueries raise.
    def take_subqueries(text: str) -> tuple[str, list[str]]:
        masked = _mask_strings(text)
        chars, subs = list(text), []
        depth, i, n = 0, 0, len(text)
        while i < n:
            ch = masked[i]
            if ch == "{":
                if re.match(r"\{\s*SELECT\b", masked[i:], re.IGNORECASE):
                    if depth != 0:
                        # a subquery nested inside another group (a UNION
                        # arm, an OPTIONAL/MINUS/EXISTS body, a lone
                        # braced group) belongs to THAT group's scope:
                        # leave it in place — the owning construct
                        # compiles recursively and extracts it at its own
                        # top level, so its join scope is never lifted
                        i = _balanced_end(masked, i)
                        continue
                    # a depth-0 subquery that is a UNION ARM (preceded or
                    # followed by the UNION keyword) belongs to the union
                    # chain, not the group: lifting it here would leave a
                    # dangling 'UNION' (r4 verdict #4). Leave it for the
                    # chain extraction below.
                    jj = _balanced_end(masked, i)
                    if re.match(r"\s*UNION\b", masked[jj:], re.IGNORECASE) or re.search(
                        r"\bUNION\s*$", masked[:i], re.IGNORECASE
                    ):
                        i = jj
                        continue
                    d, j = 1, i + 1
                    while j < n and d:
                        if masked[j] == "{":
                            d += 1
                        elif masked[j] == "}":
                            d -= 1
                        j += 1
                    if d:
                        raise ValueError("unbalanced braces in subquery")
                    subs.append(text[i + 1 : j - 1])
                    for k in range(i, j):
                        chars[k] = " "
                    i = j
                    continue
                depth += 1
            elif ch == "}":
                depth -= 1
            i += 1
        return "".join(chars), subs

    body, parsed.subqueries = take_subqueries(body)

    # UNION chains are extracted FIRST of the remaining braced clauses,
    # as brace-balanced opaque texts: everything inside an arm — VALUES,
    # FILTER [NOT] EXISTS, MINUS, OPTIONAL, GRAPH, nested UNIONs — stays
    # inside the arm text and compiles recursively IN ARM SCOPE. (The old
    # order ran the flat VALUES/EXISTS regexes over the whole body before
    # the union split, which would have lifted an arm's VALUES clause
    # into the outer group — a silent scope bug this ordering prevents.)
    # A top-level '{' that is the OPERAND of a keyword clause (FILTER
    # EXISTS, MINUS, OPTIONAL, GRAPH x, VALUES x) is NOT a union-arm
    # candidate — skip its balanced group so e.g. an EXISTS group whose
    # body is itself a UNION chain stays intact for the recursive compile.
    _owned_group_head = re.compile(
        r"(?:\bEXISTS|\bMINUS|\bOPTIONAL"
        r"|\bGRAPH\s+(?:\?\w+|<[^>]*>|[\w.-]*:[\w./#-]+)"
        r"|\bSERVICE\s+(?:SILENT\s+)?(?:<[^>]*>|\?\w+|[\w.-]*:[\w./#-]+)"
        r"|\bVALUES\s+(?:\?\w+|\([^)]*\)))\s*$",
        re.IGNORECASE,
    )
    masked_body = _mask_strings(body)
    pieces, chains = [], []
    i = last = 0
    while i < len(masked_body):
        if masked_body[i] == "{":
            if _owned_group_head.search(masked_body, 0, i):
                i = _balanced_end(masked_body, i)
                continue
            arm_start, arms = i, []
            j = i
            while True:
                end = _balanced_end(masked_body, j)
                arms.append(body[j + 1 : end - 1])
                nxt = re.match(r"\s*UNION\s*\{", masked_body[end:], re.IGNORECASE)
                if not nxt:
                    break
                j = end + nxt.end() - 1
            # a LONE braced group (no UNION keyword) is a plain nested
            # group graph pattern: compile it recursively as a one-arm
            # "union" — bag union of one arm is the group itself, and
            # the compatible-mapping join machinery joins it to the
            # rest of the enclosing group exactly per spec. A draft-era
            # path quantifier body ('{1,3}') keeps its named refusal.
            if len(arms) == 1 and re.fullmatch(
                r"\s*\d+\s*(?:,\s*\d*\s*)?", arms[0]
            ):
                raise ValueError(
                    "unsupported path quantifier {n,m} (not in SPARQL 1.1; "
                    "use explicit /-chains or the * + ? closures)"
                )
            pieces.append(body[last:arm_start])
            chains.append(arms)
            last = end
            i = end
        else:
            i += 1
    pieces.append(body[last:])
    body = " ".join(pieces)
    for arms in chains:
        if any(not a.strip() for a in arms):
            raise ValueError(
                "empty UNION arm" if len(arms) > 1 else "empty group pattern"
            )
        parsed.unions.append(arms)
    # FILTER [NOT] EXISTS { group } and MINUS { group }: brace-balanced,
    # stored as opaque group texts and compiled recursively at plan time
    # (so FILTERs, paths, VALUES, OPTIONAL — and whole UNION chains —
    # inside them keep group scope)
    # SERVICE (SILENT)? <endpoint> { group }: federation — the group is
    # shipped to a remote SPARQL 1.1 Protocol endpoint and its bindings
    # join the enclosing group (compatible-mapping). SERVICE ?ep { … }
    # (a VARIABLE endpoint) requires ?ep bound by the rest of the group;
    # each distinct endpoint is queried and the results union
    # (bounded by _SERVICE_MAX_ENDPOINTS).
    body, service_clauses = _take_braced_clauses(
        body,
        r"SERVICE\s+(SILENT\s+)?(?:<([^>]*)>|\?(\w+)|([\w-]+:[\w./#-]+))\s*\{",
    )
    for (silent, iri, var, curie), text in service_clauses:
        if not text.strip():
            raise ValueError("empty SERVICE block")
        if var is not None:
            parsed.var_services.append((bool(silent), var, text))
        else:
            parsed.services.append(
                (bool(silent), iri if iri is not None else curie, text)
            )

    body, exists_clauses = _take_braced_clauses(
        body, r"FILTER\s+(NOT\s+)?EXISTS\s*\{"
    )
    for (neg,), text in exists_clauses:
        if not text.strip():
            raise ValueError("empty EXISTS block")
        parsed.exists.append((bool(neg), text))

    body, minus_clauses = _take_braced_clauses(body, r"MINUS\s*\{")
    for _groups, text in minus_clauses:
        if not text.strip():
            raise ValueError("empty MINUS block")
        parsed.minuses.append(text)

    # OPTIONAL groups next (brace-balanced): flat parse first — it keeps
    # the established OPTIONAL-FILTER scope errors — and a block the flat
    # grammar rejects (UNION chains, VALUES, GRAPH, MINUS, EXISTS,
    # nested groups) is kept as raw text and compiled recursively as a
    # full group graph pattern at plan time
    body, opt_texts = _take_optional_groups(body)
    for t in opt_texts:
        try:
            parsed.optionals.append(("flat", parse_optional_block(t)))
        except ValueError:
            parsed.optionals.append(("group", t))

    def _sub_depth0(pattern: str, repl_fn, text: str) -> str:
        """re.sub restricted to matches FOUND on the string-blanked mask
        at brace depth 0 — a clause inside another construct's braces or
        inside a quoted literal is never lifted out of its scope."""
        masked = _mask_strings(text)
        depths = _brace_depths(masked)
        out, pos = [], 0
        for m in re.finditer(pattern, masked, flags=re.IGNORECASE):
            if m.start() < pos or depths[m.start()] != 0:
                continue

            # group SPANS from the masked match are valid positions in
            # the real text (same length) — hand the callback a shim
            # that reads group content from the REAL text
            class _RealGroups:
                def __init__(self, mm):
                    self._m = mm

                def group(self, i=0):
                    s, e = self._m.span(i)
                    return None if s == -1 else text[s:e]

            out.append(text[pos : m.start()])
            out.append(repl_fn(_RealGroups(m)))
            pos = m.end()
        out.append(text[pos:])
        return "".join(out)

    body = _sub_depth0(
        r"VALUES\s+(\?\w+|\([^)]*\))\s*\{([^{}]*)\}", take_values, body
    )

    # GRAPH blocks (brace-balanced, depth-0): constant (<iri> / curie —
    # filter on the graph column) or variable (GRAPH ?g — binds the
    # graph column as ?g). A CONSTANT graph whose body the flat pattern
    # grammar rejects (OPTIONAL/FILTER/UNION/… inside) compiles
    # recursively as a full group over the graph-filtered store; the
    # variable-graph case keeps its flat patterns+paths fast path, and a
    # full group body distributes the graph context down to its pattern
    # runs (_distribute_graph) before the same recursive compile.
    body, graph_clauses = _take_braced_clauses(
        body, r"GRAPH\s+(\?\w+|<[^>]*>|[\w.-]*:[\w./#-]+)\s*\{"
    )
    for (g_txt,), group_text in graph_clauses:
        if g_txt.startswith("?"):
            g = Var(g_txt[1:])
        else:
            g = g_txt[1:-1] if g_txt.startswith("<") else _expand(g_txt, pmap)
        try:
            pats = [
                _parse_pattern(stmt, pmap)
                for stmt in _expand_statements(group_text, anon)
            ]
            if not pats:
                raise ValueError("empty GRAPH block")
            parsed.graphs.append(("flat", g, pats))
        except ValueError:
            if not group_text.strip():
                raise ValueError("empty GRAPH block") from None
            if isinstance(g, Var):
                # variable graph with a FULL group body: distribute the
                # graph context down to the flat pattern runs (see
                # _distribute_graph) and compile the rewrite recursively
                parsed.graphs.append(
                    ("vargroup", g, _distribute_graph(g_txt, group_text))
                )
            else:
                parsed.graphs.append(("group", g, group_text))

    # any UNION still in the body at this point is one the grammar cannot
    # place (e.g. inside a VALUES data block, whose inner parser is
    # flat) — refuse loudly rather than misparse
    if re.search(r"\bUNION\b", _mask_strings(body), re.IGNORECASE):
        raise ValueError("cannot parse UNION clause (arms must be braced groups)")

    if re.search(r"\{\s*\d+\s*(?:,\s*\d*\s*)?\}", body):
        # draft-SPARQL path quantifier, dropped from the 1.1 final spec
        raise ValueError(
            "unsupported path quantifier {n,m} (not in SPARQL 1.1; "
            "use explicit /-chains or the * + ? closures)"
        )
    if re.search(r"[{}]", body):
        raise ValueError("unsupported nested group in WHERE block")
    body, bind_blocks = _take_paren_blocks(body, "BIND")
    for blk in bind_blocks:
        bm = re.match(r"^(.*?)\s+AS\s+\?(\w+)\s*$", _mask_strings(blk), re.IGNORECASE | re.DOTALL)
        if not bm:
            raise ValueError(f"cannot parse BIND (expected 'expr AS ?var'): {blk!r}")
        parsed.binds.append((bm.group(2), blk[: bm.end(1)]))
    body, parsed.filters = _take_paren_blocks(body, "FILTER")
    for stmt in _expand_statements(body, anon):
        parsed.patterns.append(_parse_pattern(stmt, pmap))

    # ---- modifiers (the tail must be fully consumed) ----------------------
    tail, parsed.having = _take_paren_blocks(tail, "HAVING")
    consumed = []
    # GROUP BY keys: ?var | ( expr AS ?alias ). The consumed span is
    # blanked in place (length-preserving) so the later ORDER BY /
    # LIMIT / OFFSET scans cannot match inside a key expression.
    gm = re.search(r"GROUP\s+BY\s+", tail, re.IGNORECASE)
    if gm:
        masked_tail = _mask_strings(tail)
        items, i = [], gm.end()
        while i < len(tail):
            m = re.match(r"\s*\?(\w+)", masked_tail[i:])
            if m:
                items.append(m.group(1))
                i += m.end()
                continue
            m = re.match(r"\s*\(", masked_tail[i:])
            if m:
                start = i + m.end() - 1
                end = _paren_close(masked_tail, start, "GROUP BY")
                inner = tail[start + 1 : end - 1]
                am = re.match(
                    r"^(.*?)\s+AS\s+\?(\w+)\s*$",
                    _mask_strings(inner),
                    re.IGNORECASE | re.DOTALL,
                )
                if not am:
                    raise ValueError(
                        "cannot parse GROUP BY key (expected ?var or "
                        f"'(expr AS ?alias)'): {inner!r}"
                    )
                items.append((am.group(2), inner[: am.end(1)]))
                i = end
                continue
            break
        if not items:
            raise ValueError("empty GROUP BY clause")
        parsed.group_by = items
        tail = tail[: gm.start()] + " " * (i - gm.start()) + tail[i:]
    # ORDER BY conditions (SPARQL OrderCondition): ASC(expr) | DESC(expr)
    # | ?var | fn(args…). Paren balancing runs on the string-blanked mask;
    # the consumed span is blanked in place (length-preserving) so the
    # later LIMIT/OFFSET searches cannot match inside an order expression.
    om = re.search(r"ORDER\s+BY\s+", tail, re.IGNORECASE)
    if om:
        def _paren_end(masked: str, start: int) -> int:
            return _paren_close(masked, start, "ORDER BY")

        masked_tail = _mask_strings(tail)
        conds, i = [], om.end()
        while i < len(tail):
            m = re.match(r"\s*(ASC|DESC)\s*\(", masked_tail[i:], re.IGNORECASE)
            if m:
                start = i + m.end() - 1
                end = _paren_end(masked_tail, start)
                conds.append(
                    (tail[start + 1 : end - 1].strip(),
                     m.group(1).upper() == "ASC")
                )
                i = end
                continue
            m = re.match(r"\s*\?\w+", masked_tail[i:])
            if m:
                conds.append((tail[i : i + m.end()].strip(), True))
                i += m.end()
                continue
            m = re.match(r"\s*(\w+)\s*\(", masked_tail[i:], re.IGNORECASE)
            if m and m.group(1).upper() not in ("LIMIT", "OFFSET"):
                start = i + m.end() - 1
                end = _paren_end(masked_tail, start)
                conds.append((tail[i:end].strip(), True))
                i = end
                continue
            break
        if not conds:
            raise ValueError("empty ORDER BY clause")
        parsed.order_by = conds
        tail = tail[: om.start()] + " " * (i - om.start()) + tail[i:]
    lm = re.search(r"LIMIT\s+(\d+)", tail, re.IGNORECASE)
    if lm:
        parsed.limit = int(lm.group(1))
        consumed.append(lm)
    fm = re.search(r"OFFSET\s+(\d+)", tail, re.IGNORECASE)
    if fm:
        parsed.offset = int(fm.group(1))
        consumed.append(fm)
    # INTERNAL clause (see _Parsed.slice_by): 'GRAPHSLICE ?g' marks the
    # modifiers above as per-named-graph. Only _rewrite_graph_subselect
    # emits it; user text containing it is indistinguishable from the
    # rewrite and compiles to the same (documented-internal) semantics.
    sm = re.search(r"GRAPHSLICE\s+\?(\w+)", tail)
    if sm:
        parsed.slice_by = sm.group(1)
        consumed.append(sm)
    left = _residue(tail, consumed)
    if left:
        raise ValueError(f"unsupported SPARQL syntax after WHERE block: {left!r}")
    return parsed, pmap


# ---------------------------------------------------------------------------
# FILTER compilation
# ---------------------------------------------------------------------------

# an operand may be an expression-function call (one paren-nesting level;
# enough for STRLEN(STR(?x)) — deeper nesting raises at compile)
_FN_CALL = r"""(?:STRLEN|UCASE|LCASE|STRBEFORE|STRAFTER|STRLANG|STRDT|STR
                 |SUBSTR|REPLACE|COALESCE|IF|CONCAT|ABS|CEIL|FLOOR|ROUND
                 |MD5|SHA256|SHA1|ENCODE_FOR_URI|LANG|DATATYPE
                 |YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|TZ|NOW)
               \s*\((?:"(?:[^"\\]|\\.)*"|\([^()]*\)|[^()])*\)"""
_CMP_RE = re.compile(
    rf"""^\s*(?P<a>{_FN_CALL}|\?\w+|"(?:[^"\\]|\\.)*"|<[^>]*>|-?\d+(?:\.\d+)?|[\w-]*:[\w./#-]+)
         \s*(?P<op>!=|<=|>=|=|<|>)
         \s*(?P<b>{_FN_CALL}|\?\w+|"(?:[^"\\]|\\.)*"|<[^>]*>|-?\d+(?:\.\d+)?|[\w-]*:[\w./#-]+)\s*$""",
    re.VERBOSE | re.IGNORECASE,
)
_FUNC_RE = re.compile(
    r"""^\s*(?P<neg>!)?\s*(?P<fn>REGEX|CONTAINS|STRSTARTS|STRENDS|BOUND
                                 |ISIRI|ISURI|ISLITERAL|ISBLANK)\s*\(
         \s*\?(?P<var>\w+)\s*(?:,\s*"(?P<arg>(?:[^"\\]|\\.)*)"\s*
         (?:,\s*"(?P<flags>[^"]*)"\s*)?)?\)\s*$""",
    re.VERBOSE | re.IGNORECASE,
)
_SAMETERM_RE = re.compile(
    r"^\s*(?P<neg>!)?\s*SAMETERM\s*\((?P<args>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_LANGMATCHES_RE = re.compile(
    r"^\s*(?P<neg>!)?\s*LANGMATCHES\s*\((?P<args>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ISNUMERIC_RE = re.compile(
    r"^\s*(?P<neg>!)?\s*ISNUMERIC\s*\(\s*\?(?P<var>\w+)\s*\)\s*$",
    re.IGNORECASE,
)
# the store's numeric-literal shape (the same forms SUM/AVG casts accept)
_NUMERIC_LIT_RE = r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$"
_IN_RE = re.compile(
    r"^\s*\?(?P<var>\w+)\s+(?P<neg>NOT\s+)?IN\s*\((?P<terms>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)

_OPS = {
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _operand(text: str, pmap: dict, numeric: bool):
    if re.match(r"^\s*\w+\s*\(", text):
        # expression-function operand (STRLEN(?x), UCASE(?x), …) — shares
        # the BIND expression compiler
        col = _bind_col(text, pmap)
        return col.try_cast("double") if numeric else col
    if text.startswith("?"):
        col = _vref(text[1:])
        return col.try_cast("double") if numeric else col
    if re.fullmatch(r"-?\d+(?:\.\d+)?", text):
        return F.lit(float(text))
    if text.startswith('"'):
        return F.lit(text[1:-1])
    if text.startswith("<"):
        return F.lit(text[1:-1])
    return F.lit(_expand(text, pmap))


def _filter_atom(cond: str, pmap: dict) -> Column:
    fm = _FUNC_RE.match(cond)
    if fm:
        var, arg, fn = fm.group("var"), fm.group("arg"), fm.group("fn").upper()
        if fn in ("BOUND", "ISIRI", "ISURI", "ISLITERAL", "ISBLANK") and arg is not None:
            raise ValueError(f"{fn} takes a single variable: FILTER({cond.strip()})")
        if fn == "BOUND":
            col = F.col(var).isNotNull()
        elif fn in ("ISIRI", "ISURI", "ISLITERAL", "ISBLANK"):
            # term-type tests use the engine's (= the reference's) term
            # discriminator: IRIs startWith 'http' (graphProcessor.js:222),
            # blank nodes startWith '_:', everything else bound is a
            # literal. Consistent with how obj_is_literal is derived.
            is_iri = F.col(var).startswith("http")
            is_blank = F.col(var).startswith("_:")
            if fn in ("ISIRI", "ISURI"):
                col = is_iri
            elif fn == "ISBLANK":
                col = is_blank
            else:
                col = F.col(var).isNotNull() & ~is_iri & ~is_blank
        elif arg is None:
            raise ValueError(f"{fn} requires a string argument: FILTER({cond.strip()})")
        elif fm.group("flags") is not None and fn != "REGEX":
            raise ValueError(f"{fn} takes no flags argument: FILTER({cond.strip()})")
        elif fn == "REGEX":
            flags = fm.group("flags")
            if flags:
                if not re.fullmatch(r"[imsx]+", flags):
                    raise ValueError(
                        f"unsupported REGEX flags {flags!r} (supported: i m s x)"
                    )
                arg = f"(?{flags}){arg}"
            col = _vref(var).rlike(arg)
        elif fn == "CONTAINS":
            col = _vref(var).contains(arg)
        elif fn == "STRENDS":
            col = _vref(var).endswith(arg)
        else:  # STRSTARTS
            col = _vref(var).startswith(arg)
        return ~col if fm.group("neg") else col
    lm = _LANGMATCHES_RE.match(cond)
    if lm:
        # RFC 4647 basic filtering, per the SPARQL spec: '*' matches any
        # non-empty tag; otherwise case-insensitive equality or a
        # hyphen-extended prefix ('en' matches 'en-US'). NULL (IRI/unbound
        # first argument) propagates → row eliminated.
        args = [a.strip() for a in _split_args(lm.group("args"))]
        if len(args) != 2:
            raise ValueError(
                f"LANGMATCHES expects 2 arguments: FILTER({cond.strip()})"
            )
        tag = _bind_col(args[0], pmap)
        if not re.fullmatch(r'"(?:[^"\\]|\\.)*"', args[1]):
            raise ValueError(
                f"LANGMATCHES range must be a string literal: FILTER({cond.strip()})"
            )
        rng = args[1][1:-1]
        if rng == "*":
            col = tag.isNotNull() & (tag != "")
        else:
            low = F.lower(tag)
            col = (low == rng.lower()) | low.startswith(rng.lower() + "-")
        return ~col if lm.group("neg") else col
    im = _IN_RE.match(cond)
    if im:
        # ?x [NOT] IN (t1, t2, …): equality disjunction — each term uses
        # the same numeric-casting rule as a standalone '=' comparison
        terms_text = im.group("terms")
        masked = _mask_strings(terms_text)
        terms, depth, last = [], 0, 0
        for i, ch in enumerate(masked):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                terms.append(terms_text[last:i])
                last = i + 1
        terms.append(terms_text[last:])
        terms = [t.strip() for t in terms if t.strip()]
        if not terms:
            raise ValueError(f"empty IN list: FILTER({cond.strip()})")
        var = im.group("var")
        disj = None
        for t in terms:
            numeric = bool(re.fullmatch(r"-?\d+(?:\.\d+)?", t))
            eq = _OPS["="](
                _operand(f"?{var}", pmap, numeric), _operand(t, pmap, numeric)
            )
            disj = eq if disj is None else disj | eq
        return ~disj if im.group("neg") else disj
    sm = _SAMETERM_RE.match(cond)
    if sm:
        # the store holds one canonical string per term, so sameTerm is
        # exact term-string equality (unbound → null → row eliminated)
        args = [a.strip() for a in _split_args(sm.group("args"))]
        if len(args) != 2:
            raise ValueError(f"SAMETERM expects 2 arguments: FILTER({cond.strip()})")

        def raw_term(a: str) -> Column:
            # term identity compares the RAW (annotation-encoded) column,
            # never the decoded lexical form — "a"@en is not sameTerm "a"
            if re.fullmatch(r"\?\w+", a):
                return F.col(a[1:])
            return _bind_col(a, pmap)

        col = raw_term(args[0]) == raw_term(args[1])
        return ~col if sm.group("neg") else col
    nm = _ISNUMERIC_RE.match(cond)
    if nm:
        # stringly-typed store: a term is numeric iff it has the numeric
        # shape the engine's own aggregates cast (SUM/AVG semantics) —
        # tested on the lexical form, like the aggregates' own cast
        col = _vref(nm.group("var")).rlike(_NUMERIC_LIT_RE)
        return ~col if nm.group("neg") else col
    cm = _CMP_RE.match(cond)
    if cm:
        a, op, b = cm.group("a"), cm.group("op"), cm.group("b")
        # numeric comparison iff either side is a number literal (terms are
        # strings in the store; SPARQL numeric compare needs the cast)
        numeric = bool(
            re.fullmatch(r"-?\d+(?:\.\d+)?", a) or re.fullmatch(r"-?\d+(?:\.\d+)?", b)
        )
        return _OPS[op](_operand(a, pmap, numeric), _operand(b, pmap, numeric))
    gc = _generalized_cmp(cond, pmap)
    if gc is not None:
        return gc
    raise ValueError(f"unsupported FILTER condition: {cond.strip()!r}")


def _generalized_cmp(cond: str, pmap: dict):
    """Comparison between two scalar EXPRESSIONS (arithmetic, nested
    function calls — e.g. ``?x + 1 > STRLEN(?s)``) that the one-token
    _CMP_RE operand grammar cannot match. String literals and whole
    <IRI> spans are blanked before the operator scan so a quoted or
    bracketed ``<``/``>``/``=`` can never split. Returns None when no
    top-level comparison operator exists (caller raises its own loud
    error)."""
    masked = _mask_strings(cond)
    masked = re.sub(r"<[^>]*>", lambda m: "x" * len(m.group(0)), masked)
    depth, i, pos, op = 0, 0, None, None
    while i < len(masked):
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0:
            two = masked[i : i + 2]
            if two in ("!=", "<=", ">="):
                pos, op = i, two
                break
            if ch in "<>=":
                pos, op = i, ch
                break
        i += 1
    if pos is None:
        return None
    a, b = cond[:pos].strip(), cond[pos + len(op) :].strip()
    if not a or not b:
        raise ValueError(f"malformed comparison: FILTER({cond.strip()})")
    def _numericish(e: str) -> bool:
        # number literal, top-level arithmetic, or a numeric-returning
        # head function — the side's Column will be double/long typed
        if re.fullmatch(r"-?\d+(?:\.\d+)?", e):
            return True
        if _arith_split(e, _mask_strings(e)) is not None:
            return True
        return bool(
            re.match(r"\s*(STRLEN|ABS|CEIL|FLOOR|ROUND)\s*\(", e, re.IGNORECASE)
        )

    ca, cb = _bind_col(a, pmap), _bind_col(b, pmap)
    if _numericish(a) or _numericish(b):
        # if EITHER side is numeric-typed, ANSI would coerce a string
        # other side with a STRICT cast — a malformed term must be a
        # SPARQL type error (row eliminated), never a job abort, so
        # try_cast BOTH sides
        ca, cb = ca.try_cast("double"), cb.try_cast("double")
    return _OPS[op](ca, cb)


def _filter_term(cond: str, pmap: dict) -> Column:
    """One operand of a '&&' conjunction: either a parenthesized
    sub-condition (recurse) or an atom."""
    c = cond.strip()
    masked = _mask_strings(c)
    # strip a paren pair only when it wraps the WHOLE term
    while c.startswith("("):
        depth = 0
        for i, ch in enumerate(masked):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        if i != len(masked) - 1:
            break
        c = c[1:-1].strip()
        masked = _mask_strings(c)
        if "||" in masked or "&&" in masked:
            return _filter_col(c, pmap)
    return _filter_atom(c, pmap)


def _filter_col(cond: str, pmap: dict) -> Column:
    """Compile a FILTER condition: '||'-disjunction of '&&'-conjunctions
    of atoms, with parenthesized grouping ('&&' binds tighter, per
    SPARQL). Splitting is string-literal-aware and paren-depth-aware;
    anything else is a loud error."""
    masked = _mask_strings(cond)
    disjuncts = _split_top(cond, masked, "||")

    def conj(part: str) -> Column:
        pm = _mask_strings(part)
        return reduce(
            lambda x, y: x & y,
            (_filter_term(a, pmap) for a in _split_top(part, pm, "&&")),
        )

    return reduce(lambda x, y: x | y, (conj(p) for p in disjuncts))


def _split_args(inner: str) -> list[str]:
    """Split a function-argument list on top-level commas (paren-depth-
    and string-literal-aware)."""
    masked = _mask_strings(inner)
    parts, depth, last = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(inner[last:i])
            last = i + 1
    parts.append(inner[last:])
    return parts


def _arith_split(e: str, masked: str):
    """Find the top-level binary arithmetic operator to split at: the
    RIGHTMOST ``+``/``-`` outside parens/strings (lowest precedence,
    left-associative), else the rightmost ``*``/``/``. An operator is
    binary only when an operand ends before it — a leading or
    post-'('/operator sign is unary and stays with its number literal.
    Returns (lhs, op, rhs) or None. IRI spans are blanked first so a
    '/' inside <http://…> can never split. CURIE tokens are blanked too —
    the '-', '/', '#', '.' inside ex:a-b/c are part of the term, not
    operators (numbers and ?vars carry no ':', so they are unaffected)."""
    masked = re.sub(r"<[^>]*>", lambda m: "<" + "x" * (len(m.group(0)) - 2) + ">", masked)
    masked = re.sub(r"[\w-]*:[\w./#-]+", lambda m: "x" * len(m.group(0)), masked)
    best_addsub = best_muldiv = None
    depth = 0
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "+-*/":
            prev = masked[:i].rstrip()
            if not prev or prev[-1] in "(,+-*/<>=!&|":
                continue  # unary sign / part of another operator
            if ch in "+-":
                best_addsub = i
            else:
                best_muldiv = i
    pos = best_addsub if best_addsub is not None else best_muldiv
    if pos is None:
        return None
    return e[:pos], e[pos], e[pos + 1 :]


def _bind_col(expr: str, pmap: dict) -> Column:
    """Compile a scalar SPARQL expression (BIND bodies and expression
    operands in FILTER comparisons): a term (?var, "literal", <iri>,
    curie, number), binary arithmetic (``+ - * /``, evaluated as SQL
    doubles over the stringly-typed store), or STR / CONCAT / UCASE /
    LCASE / STRLEN / SUBSTR / REPLACE / COALESCE / IF / STRBEFORE /
    STRAFTER / ABS / CEIL / FLOOR / ROUND / MD5 / SHA1 / SHA256 /
    ENCODE_FOR_URI over sub-expressions. Anything else is a loud
    error."""
    e = expr.strip()
    masked = _mask_strings(e)
    # arithmetic first: it binds looser than any function call, and the
    # operand grammar below would otherwise half-match 'STRLEN(?a)+1'
    sp = _arith_split(e, masked)
    if sp is not None:
        lhs, op, rhs = sp
        a = _bind_col(lhs, pmap).try_cast("double")
        b = _bind_col(rhs, pmap).try_cast("double")
        # try_divide: ANSI '/' raises DIVIDE_BY_ZERO and aborts the job;
        # SPARQL divide-by-zero is an expression error → unbound/row drop
        return {
            "+": a + b,
            "-": a - b,
            "*": a * b,
            "/": F.try_divide(a, b),
        }[op]
    # strip a paren pair wrapping the whole expression
    while e.startswith("(") and masked.rstrip().endswith(")"):
        depth = 0
        for i, ch in enumerate(masked):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
        if i != len(masked.rstrip()) - 1:
            break
        e = e[1:-1].strip()
        masked = _mask_strings(e)
        sp = _arith_split(e, masked)
        if sp is not None:
            return _bind_col(e, pmap)
    fm = re.match(
        r"^\s*(CONCAT|STRLEN|STRBEFORE|STRAFTER|STRLANG|STRDT|STR|UCASE"
        r"|LCASE|SUBSTR|REPLACE|COALESCE|IF|ABS|CEIL|FLOOR|ROUND|MD5"
        r"|SHA256|SHA1|ENCODE_FOR_URI|LANGMATCHES|LANG|DATATYPE"
        r"|YEAR|MONTH|DAY|HOURS|MINUTES|SECONDS|TZ|NOW"
        r"|UUID|STRUUID|RAND)\s*\(",
        masked,
        re.IGNORECASE,
    )
    if fm:
        fn = fm.group(1).upper()
        if not masked.rstrip().endswith(")"):
            raise ValueError(f"unbalanced {fn} in expression: {expr!r}")
        inner = e[fm.end() : e.rstrip().rfind(")")]
        args = _split_args(inner)

        def need(lo: int, hi: int | None = None) -> None:
            hi = lo if hi is None else hi
            if not (lo <= len(args) <= hi):
                raise ValueError(
                    f"{fn} expects {lo}"
                    + (f"-{hi}" if hi != lo else "")
                    + f" arguments, got {len(args)}: {expr!r}"
                )

        def int_arg(i: int) -> int:
            a = args[i].strip()
            if not re.fullmatch(r"-?\d+", a):
                raise ValueError(f"{fn} argument {i + 1} must be an integer: {expr!r}")
            return int(a)

        def str_arg(i: int) -> str:
            a = args[i].strip()
            if not re.fullmatch(r'"(?:[^"\\]|\\.)*"', a):
                raise ValueError(
                    f"{fn} argument {i + 1} must be a string literal: {expr!r}"
                )
            return a[1:-1]

        if fn == "CONCAT":
            need(1, 64)
            return F.concat(*(_bind_col(p, pmap) for p in args))
        if fn == "STR":
            # lexical form: sub-expressions already decode ?var refs, but
            # a nested STRLANG/STRDT yields an encoded term — strip it
            need(1)
            c = _bind_col(args[0], pmap).cast("string")
            return _decode_term(c) if _ANNOT.get() else c
        if fn in ("LANG", "DATATYPE"):
            need(1)
            if not _ANNOT.get():
                raise ValueError(
                    f"{fn}() needs a store with annotation columns "
                    "(obj_lang/obj_dt) — this store binds the lexical "
                    "form only"
                )
            a = args[0].strip()
            if not re.fullmatch(r"\?\w+", a):
                raise ValueError(f"{fn} takes a single variable: {expr!r}")
            raw = F.col(a[1:])
            return _lang_col(raw) if fn == "LANG" else _datatype_col(raw)
        if fn == "LANGMATCHES":
            # boolean builtin — usable inside IF(...) conditions via the
            # filter compiler; as a scalar it is the same Column
            return _filter_col(e, pmap)
        if fn in ("STRLANG", "STRDT"):
            need(2)
            if not _ANNOT.get():
                raise ValueError(
                    f"{fn}() needs a store with annotation columns "
                    "(obj_lang/obj_dt) — this store binds the lexical "
                    "form only"
                )
            lex = _esc_lex(_bind_col(args[0], pmap).cast("string"))
            if fn == "STRLANG":
                tag = str_arg(1)
                if not re.fullmatch(r"[A-Za-z]+(?:-[A-Za-z0-9]+)*", tag):
                    raise ValueError(
                        f"STRLANG language tag {tag!r} is not well-formed: {expr!r}"
                    )
                return F.concat(F.lit('"'), lex, F.lit('"@' + tag))
            dt_tok = args[1].strip()
            if re.fullmatch(r"<[^>]*>", dt_tok):
                dt = dt_tok[1:-1]
            elif re.fullmatch(r"[\w-]*:[\w.#-]+", dt_tok):
                dt = _expand(dt_tok, pmap)
            else:
                raise ValueError(f"STRDT datatype must be an IRI: {expr!r}")
            if dt == XSD_STRING:
                # RDF 1.1: ^^xsd:string IS the plain literal
                return F.concat(F.lit('"'), lex, F.lit('"'))
            return F.concat(F.lit('"'), lex, F.lit('"^^' + dt))
        if fn == "UCASE":
            need(1)
            return F.upper(_bind_col(args[0], pmap))
        if fn == "LCASE":
            need(1)
            return F.lower(_bind_col(args[0], pmap))
        if fn == "STRLEN":
            # long (not int) so results line up with ANSI-SQL length()
            need(1)
            return F.length(_bind_col(args[0], pmap)).cast("long")
        if fn == "SUBSTR":
            # SPARQL SUBSTR is 1-based with optional length, like SQL
            need(2, 3)
            c = _bind_col(args[0], pmap)
            if len(args) == 2:
                return F.substring(c, int_arg(1), 2147483647)
            return F.substring(c, int_arg(1), int_arg(2))
        if fn == "REPLACE":
            # regex semantics (Java regex — stay in the Java∩RE2 subset
            # for oracle-able queries, as redact_pii does)
            need(3)
            return F.regexp_replace(_bind_col(args[0], pmap), str_arg(1), str_arg(2))
        if fn == "COALESCE":
            need(1, 64)
            return F.coalesce(*(_bind_col(p, pmap) for p in args))
        if fn in ("STRBEFORE", "STRAFTER"):
            # SPARQL: empty string (not the input) when the needle is
            # absent — that's the branch the CASE covers
            need(2)
            c, d = _bind_col(args[0], pmap), str_arg(1)
            pos = F.instr(c, d)
            if fn == "STRBEFORE":
                found = F.substr(c, F.lit(1), pos - 1)
            else:
                found = F.substr(c, pos + len(d))
            return F.when(pos > 0, found).otherwise(F.lit(""))
        if fn == "IF":
            need(3)
            return F.when(
                _filter_col(args[0], pmap), _bind_col(args[1], pmap)
            ).otherwise(_bind_col(args[2], pmap))
        if fn in ("ABS", "CEIL", "FLOOR", "ROUND"):
            # numeric builtins evaluate as SQL doubles (non-numeric terms
            # → null → SPARQL error-eliminates-row). ROUND is HALF_UP
            # (ties away from zero) — SPARQL specifies ties toward
            # positive infinity, which differs only at negative .5 ties.
            need(1)
            c = _bind_col(args[0], pmap).try_cast("double")
            if fn == "ABS":
                return F.abs(c)
            if fn == "CEIL":
                return F.ceil(c).cast("double")
            if fn == "FLOOR":
                return F.floor(c).cast("double")
            return F.round(c, 0)
        if fn in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS"):
            # xsd:dateTime/xsd:date component accessors. The lexical form
            # parses as timestamp WITHOUT timezone, so components come
            # back AS WRITTEN in the literal (a zone suffix is ignored,
            # per the SPARQL accessors' operate-on-the-literal semantics;
            # Spark's NTZ cast verified to keep wall-clock fields).
            # Malformed terms → NULL → SPARQL error-elimination.
            need(1)
            t = _bind_col(args[0], pmap).cast("string").try_cast("timestamp_ntz")
            if fn == "SECONDS":
                # xsd:decimal per spec — date_part keeps the fraction
                return F.date_part(F.lit("SECOND"), t).cast("double")
            return {
                "YEAR": F.year,
                "MONTH": F.month,
                "DAY": F.dayofmonth,
                "HOURS": F.hour,
                "MINUTES": F.minute,
            }[fn](t).cast("long")
        if fn == "NOW":
            # pinned per request by the entry points (spec §17.4.5.1:
            # every NOW() in one query is the SAME xsd:dateTime); a
            # Column-side clock (current_timestamp) would evaluate per
            # stage re-run and break both the spec and the oracle
            if args and any(a.strip() for a in args):
                raise ValueError(f"NOW takes no arguments: {expr!r}")
            pinned = _NOW.get()
            if pinned is None:
                raise ValueError(
                    "NOW() outside a query/update request (no pinned "
                    "timestamp) — call through sparql_query/sparql_update"
                )
            if _ANNOT.get():
                xsd_dt = XSD_STRING[: -len("string")] + "dateTime"
                return F.lit(f'"{pinned}"^^{xsd_dt}')
            return F.lit(pinned)
        if fn in ("UUID", "STRUUID", "RAND"):
            # deliberately refused: these are nondeterministic PER CALL,
            # so a retried/recomputed Spark stage would bind different
            # values for the same row — silently breaking set semantics,
            # resumable checkpoints, and every value-level oracle. Mint
            # stable IDs from data instead (MD5/SHA256 of bound terms).
            raise ValueError(
                f"{fn}() is nondeterministic per call and unsupported: "
                "a recomputed partition would change answers. Derive "
                "stable values from bound terms (e.g. MD5(STR(?s)))"
            )
        if fn == "TZ":
            # the timezone suffix as written ('Z', '+05:00', '' if none);
            # non-dateTime-shaped terms yield '' like zoneless literals
            need(1)
            c = _bind_col(args[0], pmap).cast("string")
            return F.regexp_extract(c, r"([+-]\d{2}:\d{2}|Z)$", 1)
        if fn == "MD5":
            need(1)
            return F.md5(_bind_col(args[0], pmap).cast("string"))
        if fn == "SHA1":
            need(1)
            return F.sha1(_bind_col(args[0], pmap).cast("string"))
        if fn == "SHA256":
            need(1)
            return F.sha2(_bind_col(args[0], pmap).cast("string"), 256)
        if fn == "ENCODE_FOR_URI":
            # RFC 3986 percent-encoding (everything but unreserved), per
            # the SPARQL spec: url_encode is form-encoding, so fix its
            # three divergences (space→'+', '*' kept, '~' escaped)
            need(1)
            enc = F.url_encode(_bind_col(args[0], pmap).cast("string"))
            enc = F.replace(enc, F.lit("+"), F.lit("%20"))
            enc = F.replace(enc, F.lit("*"), F.lit("%2A"))
            return F.replace(enc, F.lit("%7E"), F.lit("~"))
    if re.fullmatch(r"\?\w+", e):
        return _vref(e[1:])
    if re.fullmatch(r'"(?:[^"\\]|\\.)*"', e):
        return F.lit(e[1:-1])
    if re.fullmatch(r"<[^>]*>", e):
        return F.lit(e[1:-1])
    if re.fullmatch(r"-?\d+(?:\.\d+)?", e):
        return F.lit(e)
    if re.fullmatch(r"[\w-]*:[\w./#-]+", e):
        return F.lit(_expand(e, pmap))
    raise ValueError(f"unsupported BIND expression: {expr!r}")


def _graph_var_bgp(triples: DataFrame, pats: list, gvar: Var) -> DataFrame:
    """GRAPH ?g { patterns }: each pattern scan additionally binds the
    quad's graph column as ?g, so the conjunction joins on ?g too and the
    variable projects out — same plan shape as bgp() plus one column,
    including its selective-first join ordering (every frame carries ?g,
    so any order stays connected)."""
    from graphforge_spark.plans.bgp import (
        ACTIVE_STATS,
        legacy_join_columns,
        order_patterns,
    )

    def frame(pat) -> DataFrame:
        s, p, o = pat
        df, cols = triples, []
        for slot, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            if isinstance(slot, Var):
                cols.append(F.col(col).alias(slot.name))
            else:
                df = df.filter(F.col(col) == slot)
        cols.append(F.col("graph").alias(gvar.name))
        return df.select(*cols)

    def join(a: DataFrame, b: DataFrame) -> DataFrame:
        shared = [c for c in a.columns if c in b.columns]
        return a.join(b, shared, "inner")

    legacy = legacy_join_columns([frame(p).columns for p in pats])
    out = reduce(join, [frame(p) for p in order_patterns(pats, ACTIVE_STATS.get())])
    if len(set(legacy)) != len(legacy):
        return reduce(join, [frame(p) for p in pats])
    return out.select(*legacy) if out.columns != legacy else out


def _join_compat(
    a: DataFrame, a_null: set, b: DataFrame, b_null: set
) -> tuple[DataFrame, set]:
    """Join two bindings frames on their shared variables with SPARQL
    compatible-mapping semantics: an UNBOUND (null-extended) value is
    compatible with anything, and the joined binding takes the bound side
    (coalesce). ``a_null``/``b_null`` name the columns that can carry
    null-extended values (only UNION arms with mismatched variables
    produce them), so the common all-bound case stays a plain equi-join —
    the theta-join fallback is taken only when a nullable column is
    actually shared."""
    shared = [c for c in a.columns if c in b.columns]
    if not shared:
        return a.crossJoin(b), a_null | b_null
    loose = [c for c in shared if c in a_null or c in b_null]
    if not loose:
        return a.join(b, shared, "inner"), a_null | b_null
    left, right = a.alias("_l"), b.alias("_r")
    cond = None
    for c in shared:
        lc, rc = F.col(f"_l.{c}"), F.col(f"_r.{c}")
        t = (lc.isNull() | rc.isNull() | (lc == rc)) if c in loose else (lc == rc)
        cond = t if cond is None else cond & t
    sel = [
        (
            F.coalesce(F.col(f"_l.{c}"), F.col(f"_r.{c}"))
            if c in shared
            else F.col(f"_l.{c}")
        ).alias(c)
        for c in a.columns
    ] + [F.col(f"_r.{c}").alias(c) for c in b.columns if c not in a.columns]
    out = left.join(right, cond, "inner").select(*sel)
    # a coalesced shared column stays nullable only if BOTH sides could
    # be unbound; unshared columns keep their side's nullability
    nullable = {
        c
        for c in out.columns
        if (c in shared and c in a_null and c in b_null)
        or (c not in shared and c in a.columns and c in a_null)
        or (c not in a.columns and c in b_null)
    }
    return out, nullable


def _left_join_compat(
    a: DataFrame, a_null: set, b: DataFrame, b_null: set
) -> tuple[DataFrame, set]:
    """SPARQL LeftJoin with compatible-mapping semantics — the OPTIONAL
    analog of ``_join_compat``: every left solution survives, extended
    by each compatible right solution (unbound matches anything, the
    joined binding takes the bound side); with no compatible right
    solution the left row passes through unextended. Needed exactly when
    a shared variable can be unbound on either side (e.g. two OPTIONALs
    binding the same variable, or an OPTIONAL over a UNION-built
    frame)."""
    shared = [c for c in a.columns if c in b.columns]
    loose = [c for c in shared if c in a_null or c in b_null]
    left, right = a.alias("_l"), b.alias("_r")
    cond = F.lit(True)
    for c in shared:
        lc, rc = F.col(f"_l.{c}"), F.col(f"_r.{c}")
        t = (lc.isNull() | rc.isNull() | (lc == rc)) if c in loose else (lc == rc)
        cond = cond & t
    sel = [
        (
            F.coalesce(F.col(f"_l.{c}"), F.col(f"_r.{c}"))
            if c in shared
            else F.col(f"_l.{c}")
        ).alias(c)
        for c in a.columns
    ] + [F.col(f"_r.{c}").alias(c) for c in b.columns if c not in a.columns]
    out = left.join(right, cond, "left").select(*sel)
    # a shared column stays nullable iff the LEFT side could be unbound
    # (a right miss leaves the left value, bound or not; a hit coalesces
    # to a bound value whenever either side is bound); right-only
    # columns are null-extended by the left join
    nullable = (
        {c for c in shared if c in a_null}
        | {c for c in a.columns if c not in shared and c in a_null}
        | {c for c in b.columns if c not in a.columns}
    )
    return out, nullable


def _path_tokens(spec: str) -> list[str]:
    """Tokenize a property-path spec: IRIs (``<…>``, may contain any path
    operator character), negated sets (``!p`` / ``!(p1|p2)``, one token),
    CURIEs / the ``a`` keyword, and the operators ``( ) | / ^ * + ?``."""
    toks, i = [], 0
    while i < len(spec):
        c = spec[i]
        if c.isspace():
            i += 1
        elif c == "<":
            j = spec.find(">", i)
            if j < 0:
                raise ValueError(f"unterminated IRI in property path: {spec!r}")
            toks.append(spec[i : j + 1])
            i = j + 1
        elif c == "!":
            if i + 1 < len(spec) and spec[i + 1] == "(":
                j = spec.find(")", i)
                if j < 0:
                    raise ValueError(f"unbalanced '(' in property path: {spec!r}")
                toks.append(spec[i : j + 1])
                i = j + 1
            else:
                # '/' is a path operator here — CURIE local names stop at
                # it; '!^p' is the unparenthesized inverse singleton
                # (grammar PathOneInPropertySet ::= iri | 'a' | '^' iri)
                m = re.match(r"!\^?(<[^>]*>|[\w-]*:[\w.#-]+|\w+)", spec[i:])
                if not m:
                    raise ValueError(f"cannot parse negated set in path: {spec!r}")
                toks.append(m.group(0))
                i += m.end()
        elif c in "()|/^*+?":
            toks.append(c)
            i += 1
        else:
            m = re.match(r"[\w-]*:[\w.#-]+|\w+", spec[i:])
            if not m:
                raise ValueError(
                    f"cannot parse property path at {spec[i:][:20]!r} in {spec!r}"
                )
            toks.append(m.group(0))
            i += m.end()
    return toks


def _parse_path(spec: str):
    """Recursive-descent parse of a property-path spec to an AST:

        alt  := seq ('|' seq)*
        seq  := step ('/' step)*
        step := atom [*+?]        (one suffix; '**' raises)
        atom := '^' atom | '(' alt ')' | negset | iri | curie | 'a'

    Nodes: ('pred', iri_text) ('alt', parts) ('seq', parts)
    ('suffix', op, child) ('inv', child)
    ('negset', [forward_member_texts], [inverse_member_texts])."""
    toks = _path_tokens(spec)
    pos = [0]

    def peek():
        return toks[pos[0]] if pos[0] < len(toks) else None

    def eat():
        t = toks[pos[0]]
        pos[0] += 1
        return t

    def parse_alt():
        parts = [parse_seq()]
        while peek() == "|":
            eat()
            parts.append(parse_seq())
        return parts[0] if len(parts) == 1 else ("alt", parts)

    def parse_seq():
        parts = [parse_step()]
        while peek() == "/":
            eat()
            parts.append(parse_step())
        return parts[0] if len(parts) == 1 else ("seq", parts)

    def parse_step():
        node = parse_atom()
        if peek() in ("*", "+", "?"):
            node = ("suffix", eat(), node)
            if peek() in ("*", "+", "?"):
                raise ValueError(f"double path suffix in {spec!r}")
        return node

    def parse_atom():
        t = peek()
        if t is None:
            raise ValueError(f"unexpected end of property path: {spec!r}")
        if t == "^":
            eat()
            return ("inv", parse_atom())
        if t == "(":
            eat()
            node = parse_alt()
            if peek() != ")":
                raise ValueError(f"unbalanced '(' in property path: {spec!r}")
            eat()
            return node
        if t.startswith("!"):
            eat()
            inner = t[1:].strip().strip("()").strip()
            members = [x.strip() for x in inner.split("|") if x.strip()]
            if not members:
                raise ValueError(f"empty negated property set: {t!r}")
            # SPARQL 1.1 §9.1: !(p|…|^q|…) splits into a forward set and
            # an inverse set — the path is the ALTERNATIVE of "forward
            # edge whose predicate is outside the forward set" and
            # "inverse edge whose predicate is outside the inverse set"
            fwd = [x for x in members if not x.startswith("^")]
            inv = [x[1:].strip() for x in members if x.startswith("^")]
            if any(not x or x.startswith("^") for x in inv):
                raise ValueError(f"malformed inverse member in {t!r}")
            return ("negset", fwd, inv)
        if t in (")", "|", "/", "*", "+", "?"):
            raise ValueError(f"unexpected {t!r} in property path: {spec!r}")
        return ("pred", eat())

    node = parse_alt()
    if pos[0] != len(toks):
        raise ValueError(
            f"unsupported trailing syntax {toks[pos[0]:]!r} in property path {spec!r}"
        )
    return node


def _eval_path(triples: DataFrame, node, pmap: dict) -> DataFrame:
    """Recursively evaluate a parsed path AST over ``triples`` into an
    (s, o) pairs frame. Physical fast paths: a flat all-plain alternation
    is ONE codegen ``isin`` filter; a negated set is one NOT-IN filter;
    sequences are join chains Catalyst reorders freely; closures run the
    log-round doubling fixpoint whatever sub-path they wrap."""

    def ev(n) -> DataFrame:
        kind = n[0]
        if kind == "pred":
            return path_alternation(triples, [_expand(n[1].strip("<>"), pmap)])
        if kind == "negset":
            # forward branch: one codegen NOT-IN over the scan; inverse
            # branch: the same filter with (s, o) swapped. A mixed set
            # is their bag union (spec §9.1 — the alternative of the two
            # pure forms); each branch stays a narrow filter, no shuffle.
            fwd = [_expand(t.strip("<>"), pmap) for t in n[1]]
            inv = [_expand(t.strip("<>"), pmap) for t in n[2]]
            parts = []
            if n[1]:
                parts.append(
                    triples.filter(~F.col("pred").isin(fwd)).select(
                        F.col("subj").alias("s"), F.col("obj").alias("o")
                    )
                )
            if n[2]:
                parts.append(
                    triples.filter(~F.col("pred").isin(inv)).select(
                        F.col("obj").alias("s"), F.col("subj").alias("o")
                    )
                )
            return reduce(lambda a, b: a.unionByName(b), parts)
        if kind == "alt":
            if all(p[0] == "pred" for p in n[1]):
                return path_alternation(
                    triples, [_expand(p[1].strip("<>"), pmap) for p in n[1]]
                )
            out = None
            for p in n[1]:
                e = ev(p)
                out = e if out is None else out.unionByName(e)
            return out
        if kind == "seq":
            pairs = ev(n[1][0])
            for nxt in n[1][1:]:
                pairs = (
                    pairs.alias("a")
                    .join(ev(nxt).alias("b"), F.col("a.o") == F.col("b.s"))
                    .select(F.col("a.s").alias("s"), F.col("b.o").alias("o"))
                )
            return pairs
        if kind == "inv":
            return ev(n[1]).select(F.col("o").alias("s"), F.col("s").alias("o"))
        # suffix
        _, op, child = n
        pairs = ev(child)
        if op == "*":
            return transitive_closure(pairs, include_zero_step=True)
        if op == "+":
            return transitive_closure(pairs, include_zero_step=False)
        nodes = (
            pairs.select("s").union(pairs.select(F.col("o").alias("s"))).distinct()
        )
        return pairs.unionByName(nodes.select("s", F.col("s").alias("o"))).distinct()

    return ev(node)


def _graph_var_path_frame(
    triples: DataFrame, spec: str, s, o, gvar: Var, pmap: dict
) -> DataFrame:
    """Property path under ``GRAPH ?g``: the path (closure included) must
    stay WITHIN one named graph, so nodes are evaluated on composite
    ``graph\\x01node`` keys — sequence joins, inverses and closures all
    preserve the graph component by construction — then split back to
    bind ``?g``. ``\\x01`` cannot appear in IRIs; a literal object
    containing it would truncate, an accepted corner for the stringly
    store."""
    sep = "\x01"
    comp = triples.select(
        F.concat_ws(sep, F.col("graph"), F.col("subj")).alias("subj"),
        F.col("pred"),
        F.concat_ws(sep, F.col("graph"), F.col("obj")).alias("obj"),
    )
    pairs = _eval_path(comp, _parse_path(spec), pmap)
    out = pairs.select(
        F.split_part(F.col("s"), F.lit(sep), F.lit(1)).alias(gvar.name),
        F.split_part(F.col("s"), F.lit(sep), F.lit(2)).alias("_ps"),
        F.split_part(F.col("o"), F.lit(sep), F.lit(2)).alias("_po"),
    )
    if not isinstance(s, Var):
        out = out.filter(F.col("_ps") == s)
    if not isinstance(o, Var):
        out = out.filter(F.col("_po") == o)
    sel = [F.col(gvar.name)]
    if isinstance(s, Var):
        sel.append(F.col("_ps").alias(s.name))
    if isinstance(o, Var):
        sel.append(F.col("_po").alias(o.name))
    return out.select(*sel)


def _path_frame(triples: DataFrame, spec: str, s: Var, o: Var, pmap: dict) -> DataFrame:
    """Evaluate a predicate-path spec into a bindings frame over the
    path's subject/object variables. The spec is compiled recursively
    (see ``_parse_path``), so operators compose arbitrarily:

    - alternation ``(p1|p2|^p3)`` — flat all-plain alternations stay one
      codegen ``isin`` filter, anything else unions sub-frames,
    - sequence ``p1/p2`` — join chain; legs may carry their own suffixes
      (``rdf:rest*/rdf:first``, the classic collection walk),
    - suffixes ``*`` ``+`` ``?`` on any sub-path, including parenthesized
      groups (``((a|b)/c)+``),
    - inverse ``^`` of any sub-path (traverses object→subject),
    - negated property sets ``!p`` / ``!(p1|p2)`` — one codegen NOT-IN
      filter over the store (no join) — including inverse members
      ``!(^p)`` / ``!(p|^q)``: the forward-set filter unions with the
      reversed-edge inverse-set filter (spec §9.1's alternative of the
      two pure forms), still narrow, still join-free.

    Zero-length paths (for ``*``/``?``) bind every node APPEARING in the
    sub-path's edge set — the same scoping the reference's canned
    ``(rdf:type|rdfs:subClassOf)*`` query exercises. Closure (``*``/``+``)
    results are sets; other operators keep SPARQL's bag semantics."""
    out = _eval_path(triples, _parse_path(spec), pmap)
    if not isinstance(s, Var):
        out = out.filter(F.col("s") == s)
    if not isinstance(o, Var):
        out = out.filter(F.col("o") == o)
    sel = [F.col("s").alias(s.name)] if isinstance(s, Var) else []
    sel += [F.col("o").alias(o.name)] if isinstance(o, Var) else []
    return out.select(*sel)


def sparql_query(
    triples: DataFrame,
    query: str,
    prefixes: dict[str, str] | None = None,
    stats: "TripleStats | None" = None,
    annotations: bool = True,
    with_annotations: bool = False,
    allow_service_network: bool = False,
) -> DataFrame:
    """Execute a SPARQL query (reference subset) over the triples store.
    Dispatches on the query form: SELECT → bindings frame, ASK → one-row
    boolean frame (column ``ask``), CONSTRUCT → distinct subj/pred/obj
    triples. Unsupported syntax raises ``ValueError`` — never a
    silently-wrong plan.

    ``stats`` (``plans.bgp.triple_stats`` over the same store) upgrades
    BGP join ordering from the boundness heuristic to real cardinality
    estimates; compute it once per store version and pass it to every
    query against that store. Threaded via a contextvar so every nested
    group/subquery BGP sees it without widening the compile functions.

    A store carrying ``obj_lang``/``obj_dt`` compiles in ANNOTATION MODE
    (module docstring): joins/DISTINCT/GROUP BY on full RDF term
    identity, LANG()/DATATYPE()/LANGMATCHES()/STRLANG()/STRDT()
    available, SELECT output decoded to lexical forms (CONSTRUCT/
    DESCRIBE return the annotation columns). ``annotations=False`` opts
    out (lexical-only view, as if the columns were absent);
    ``with_annotations=True`` adds ``{var}__lang``/``{var}__dt``
    companion columns to SELECT results.

    ``allow_service_network=True`` lets ``SERVICE`` clauses reach
    non-loopback endpoints (hermetic by default — only this machine's
    own SPARQL endpoints federate without the flag)."""
    if _NOW.get() is None:
        # pin NOW() once for the whole request (spec §17.4.5.1) before
        # any compile recursion; subqueries/nested groups share it
        t_now = _NOW.set(_utcnow_lexical())
        try:
            return sparql_query(
                triples,
                query,
                prefixes,
                stats=stats,
                annotations=annotations,
                with_annotations=with_annotations,
                allow_service_network=allow_service_network,
            )
        finally:
            _NOW.reset(t_now)
    if allow_service_network and not _SERVICE_NETWORK.get():
        t_net = _SERVICE_NETWORK.set(True)
        try:
            return sparql_query(
                triples,
                query,
                prefixes,
                stats=stats,
                annotations=annotations,
                with_annotations=with_annotations,
            )
        finally:
            _SERVICE_NETWORK.reset(t_net)
    if stats is not None:
        from graphforge_spark.plans.bgp import ACTIVE_STATS

        token = ACTIVE_STATS.set(stats)
        try:
            return sparql_query(
                triples,
                query,
                prefixes,
                annotations=annotations,
                with_annotations=with_annotations,
            )
        finally:
            ACTIVE_STATS.reset(token)
    if annotations and {"obj_lang", "obj_dt"} <= set(triples.columns):
        t_annot = _ANNOT.set(True)
        t_comp = _COMPUTED.set(set())
        try:
            return sparql_query(
                _encode_store(triples),
                query,
                prefixes,
                with_annotations=with_annotations,
            )
        finally:
            _ANNOT.reset(t_annot)
            _COMPUTED.reset(t_comp)
    q = _strip_comments(query)
    # BASE applies to every query form; after resolution no BASE token
    # remains, so the form scan and the per-form head checks stay clean
    # (parse_sparql re-applies idempotently for direct callers)
    q = _apply_base(q)
    scan = re.sub(
        r"<[^>]*>", "<>", re.sub(r'"(?:[^"\\]|\\.)*"', '""', _PREFIX_RE.sub(" ", q))
    )
    m = re.search(r"\b(SELECT|ASK|CONSTRUCT|DESCRIBE)\b", scan, re.IGNORECASE)
    form = m.group(1).upper() if m else "SELECT"
    if form == "ASK":
        return _ask_query(triples, q, prefixes)
    if form == "CONSTRUCT":
        return _construct_query(triples, q, prefixes)
    if form == "DESCRIBE":
        return _describe_query(triples, q, prefixes)
    return _select_query(triples, q, prefixes, _companions=with_annotations)


def _ask_query(
    triples: DataFrame, q: str, prefixes: dict[str, str] | None
) -> DataFrame:
    """ASK [WHERE] { … } → single row, boolean column ``ask`` (true iff
    the group has at least one solution). Stays a distributed plan: the
    group is evaluated LIMIT 1 and aggregated to count>0 — no driver-side
    collect, and the limit stops the scan at the first match."""
    rewritten, n = re.subn(
        r"\bASK\s*(?:WHERE\s*)?\{",
        "SELECT * WHERE {",
        q,
        count=1,
        flags=re.IGNORECASE,
    )
    if not n:
        # ASK DatasetClause+ WHERE { … }: keep the FROM/FROM NAMED text
        # in place — the SELECT parser strips and applies it
        rewritten, n = re.subn(
            r"\bASK\s+(?=FROM\b)", "SELECT * ", q, count=1, flags=re.IGNORECASE
        )
    if not n:
        raise ValueError("cannot parse ASK query (expected ASK [WHERE] { ... })")
    sol = _select_query(triples, rewritten, prefixes)
    return sol.limit(1).agg((F.count(F.lit(1)) > 0).alias("ask"))


def _construct_query(
    triples: DataFrame, q: str, prefixes: dict[str, str] | None
) -> DataFrame:
    """CONSTRUCT { template } WHERE { … } [modifiers] → the instantiated
    template triples as a distinct subj/pred/obj frame (RDF-graph set
    semantics). Solution modifiers (ORDER BY/LIMIT/OFFSET) slice the
    solution sequence BEFORE instantiation, per spec. A template triple
    with any unbound variable in a given solution produces no triple for
    that solution (``na.drop``), also per spec."""
    sh = re.search(r"\bCONSTRUCT\s+WHERE\s*\{", q, re.IGNORECASE)
    if sh:
        # CONSTRUCT WHERE { bgp } shorthand: the WHERE patterns are the
        # template. Rewritten to the long form; anything beyond plain
        # triple patterns in the body raises in the template parse, per
        # the spec's BGP-only restriction on the short form.
        masked = _mask_strings(q)
        end = _balanced_end(masked, masked.index("{", sh.start()))
        bgp = q[masked.index("{", sh.start()) + 1 : end - 1]
        q = (
            q[: sh.start()]
            + f"CONSTRUCT {{ {bgp} }} WHERE {{ {bgp} }}"
            + q[end:]
        )
    m = re.search(r"\bCONSTRUCT\s*\{", q, re.IGNORECASE)
    if not m:
        raise ValueError(
            "cannot parse CONSTRUCT query (expected CONSTRUCT { template } WHERE { ... })"
        )
    depth, i = 1, m.end()
    while i < len(q) and depth:
        if q[i] == "{":
            depth += 1
        elif q[i] == "}":
            depth -= 1
        i += 1
    if depth:
        raise ValueError("unbalanced braces in CONSTRUCT template")
    template_text, rest = q[m.end() : i - 1], q[i:]
    head_residue = _PREFIX_RE.sub(" ", q[: m.start()]).strip()
    if head_residue:
        raise ValueError(
            f"unsupported SPARQL syntax before CONSTRUCT: {head_residue!r}"
        )
    if not re.match(r"\s*WHERE\s*\{", rest, re.IGNORECASE):
        raise ValueError("CONSTRUCT requires a WHERE { ... } block")
    pmap = dict(DEFAULT_PREFIXES)
    if prefixes:
        pmap.update(prefixes)
    for pfx, iri in _PREFIX_RE.findall(q):
        pmap[pfx] = iri
    templates = [
        _parse_pattern(stmt, pmap)
        for stmt in _expand_statements(template_text, allow_bnode=False)
    ]
    if not templates:
        raise ValueError("empty CONSTRUCT template")
    for _, p, _ in templates:
        if isinstance(p, tuple):
            raise ValueError("property paths are not allowed in a CONSTRUCT template")
    # annotation mode: the solution keeps ENCODED terms so the template
    # carries lang/datatype through to the output graph
    sol = _select_query(triples, "SELECT * " + rest, prefixes, _raw_terms=True)

    def tcol(slot) -> Column:
        if isinstance(slot, Var):
            if slot.name not in sol.columns:
                raise ValueError(
                    f"CONSTRUCT template variable ?{slot.name} is not bound in WHERE"
                )
            return F.col(slot.name)
        return F.lit(slot)

    frames = [
        sol.select(
            tcol(s).alias("subj"), tcol(p).alias("pred"), tcol(o).alias("obj")
        ).na.drop()
        for s, p, o in templates
    ]
    out = reduce(lambda a, b: a.unionByName(b), frames).distinct()
    return _split_term_triples(out)


def _describe_query(
    triples: DataFrame, q: str, prefixes: dict[str, str] | None
) -> DataFrame:
    """DESCRIBE <iri>... | DESCRIBE ?v... [*] WHERE { … } → the concise
    bounded description of each matched resource, here defined (the spec
    leaves the description form to the implementation) as every triple
    whose SUBJECT is a described resource — deterministic, set-semantic,
    and expressible as one semi-join. Variable targets take their
    resource set from the WHERE solutions; ``DESCRIBE *`` describes every
    binding of every variable. Output: distinct (subj, pred, obj)."""
    pmap = dict(DEFAULT_PREFIXES)
    if prefixes:
        pmap.update(prefixes)
    for pfx, iri in _PREFIX_RE.findall(q):
        pmap[pfx] = iri
    body = _PREFIX_RE.sub(" ", q).strip()
    m = re.match(
        r"DESCRIBE\s+(?P<targets>.*?)\s*(?P<rest>\bWHERE\b.*)?$",
        body,
        re.IGNORECASE | re.DOTALL,
    )
    if not m:
        raise ValueError("cannot parse DESCRIBE query")
    targets_text, rest = m.group("targets"), m.group("rest")
    tok_re = re.compile(r"\*|\?\w+|<[^>]*>|[\w-]*:[\w./#-]+")
    toks = list(tok_re.finditer(targets_text))
    if _residue(targets_text, toks):
        raise ValueError(
            f"unsupported DESCRIBE target syntax: {targets_text.strip()!r}"
        )
    if not toks:
        raise ValueError("DESCRIBE needs at least one target")
    var_targets, iri_targets, star = [], [], False
    for t in toks:
        tv = t.group(0)
        if tv == "*":
            star = True
        elif tv.startswith("?"):
            var_targets.append(tv[1:])
        elif tv.startswith("<"):
            iri_targets.append(tv[1:-1])
        else:
            iri_targets.append(_expand(tv, pmap))

    frames = []
    if var_targets or star:
        if not rest:
            raise ValueError("DESCRIBE with variable targets requires WHERE { ... }")
        sol = _select_query(triples, "SELECT * " + rest, prefixes)
        names = sol.columns if star else var_targets
        for name in names:
            if name not in sol.columns:
                raise ValueError(f"DESCRIBE target ?{name} is not bound in WHERE")
            frames.append(sol.select(F.col(name).alias("_r")))
    if iri_targets:
        spark = triples.sparkSession
        frames.append(
            spark.createDataFrame([(v,) for v in iri_targets], "_r string")
        )
    resources = reduce(lambda a, b: a.unionByName(b), frames).na.drop().distinct()
    out = (
        triples.join(resources, triples["subj"] == resources["_r"], "left_semi")
        .select("subj", "pred", "obj")
        .distinct()
    )
    return _split_term_triples(out)


def _select_query(
    triples: DataFrame,
    query: str,
    prefixes: dict[str, str] | None = None,
    _raw_terms: bool = False,
    _companions: bool = False,
) -> DataFrame:
    return _select_frame(
        triples, query, prefixes, _raw_terms=_raw_terms, _companions=_companions
    )[0]


def _select_frame(
    triples: DataFrame,
    query: str,
    prefixes: dict[str, str] | None = None,
    dataset: tuple[DataFrame, DataFrame] | None = None,
    _in_group: bool = False,
    _raw_terms: bool = False,
    _companions: bool = False,
) -> tuple[DataFrame, set]:
    """Compile a SELECT query to (bindings frame, nullable columns) —
    the nullable set names projected columns that can carry UNBOUND
    (null-extended) values, so an enclosing scope (a subquery join)
    knows to use compatible-mapping join semantics on them.

    ``dataset`` carries the (default-graph store, named-graph store)
    pair a top-level FROM / FROM NAMED built — threaded unchanged
    through every recursive group compile. Without dataset clauses both
    stores are the input frame (the union-default-graph convention)."""
    parsed, pmap = parse_sparql(query, prefixes)

    if parsed.datasets is not None:
        if _in_group:
            raise ValueError(
                "FROM/FROM NAMED are query-level dataset clauses "
                "(not allowed in a subquery or nested group)"
            )
        d_iris, n_iris = parsed.datasets
        if "graph" not in triples.columns:
            raise ValueError("FROM/FROM NAMED over a store with no graph column")
        # default graph = RDF merge of the FROM graphs: set-union on the
        # triple columns (ground merge), the graph column kept only so
        # the frame shape is uniform; named store = the FROM NAMED quads
        # — each side empty when its clause list is (per the spec, a
        # dataset description replaces the whole default dataset)
        spo = [c for c in triples.columns if c != "graph"]
        dstore_n = (
            triples.filter(F.col("graph").isin(d_iris)).dropDuplicates(spo)
            if d_iris
            else triples.filter(F.lit(False))
        )
        nstore_n = (
            triples.filter(F.col("graph").isin(n_iris))
            if n_iris
            else triples.filter(F.lit(False))
        )
        dataset = (dstore_n, nstore_n)
    dstore, nstore = dataset if dataset is not None else (triples, triples)

    plain = [p for p in parsed.patterns if not (isinstance(p[1], tuple))]
    paths = [p for p in parsed.patterns if isinstance(p[1], tuple)]

    frames: list[tuple[DataFrame, set]] = []  # (bindings, nullable columns)
    if plain:
        frames.append((bgp(dstore, plain), set()))
    for s, (_, spec), o in paths:
        frames.append((_path_frame(dstore, spec, s, o, pmap), set()))
    for kind, g, pats in parsed.graphs:
        # named-graph constraint: constant → filter on the quad's graph
        # column (pushdown-friendly); variable → bind the graph column
        if "graph" not in triples.columns:
            raise ValueError("GRAPH query over a store with no graph column")
        if kind == "group":
            # constant graph with a FULL group body: compile the group
            # recursively against the graph-filtered store — the filter
            # pushes into every scan the group plans. The group's store
            # IS the graph-filtered named store (inner plain patterns
            # match within that graph per the established semantics), so
            # the dataset does NOT thread further down here.
            frames.append(
                _select_frame(
                    nstore.filter(F.col("graph") == g),
                    f"SELECT * WHERE {{ {pats} }}",
                    pmap,
                    _in_group=True,
                )
            )
            continue
        if kind == "vargroup":
            # variable graph with a FULL group body: the parser already
            # distributed GRAPH ?g down to the flat pattern runs, so the
            # rewrite compiles through the ordinary recursive group
            # compiler; ?g (bound by every wrapped pattern) keeps each
            # join/left-join/anti within one named graph, and the
            # returned nullable set propagates (e.g. ?g itself when the
            # whole body is one OPTIONAL)
            frames.append(
                _select_frame(
                    triples,
                    f"SELECT * WHERE {{ {pats} }}",
                    pmap,
                    dataset=dataset,
                    _in_group=True,
                )
            )
            continue
        if isinstance(g, Var):
            # variable graph: plain patterns bind the graph column; path
            # patterns evaluate on composite (graph, node) keys so the
            # closure stays within each named graph. Pieces join on ?g
            # (always shared) plus any shared pattern variables.
            plain_g = [p for p in pats if not isinstance(p[1], tuple)]
            path_g = [p for p in pats if isinstance(p[1], tuple)]
            gparts: list[DataFrame] = []
            if plain_g:
                gparts.append(_graph_var_bgp(nstore, plain_g, g))
            for ps, (_, pspec), po in path_g:
                gparts.append(
                    _graph_var_path_frame(nstore, pspec, ps, po, g, pmap)
                )
            gf = gparts[0]
            for f2 in gparts[1:]:
                shared = [c for c in gf.columns if c in f2.columns]
                gf = gf.join(f2, shared, "inner")
            frames.append((gf, set()))
        else:
            # constant graph: paths traverse within that graph only
            frames.append(
                (_patterns_frame(nstore.filter(F.col("graph") == g), pats, pmap), set())
            )
    for names, rows in parsed.values:
        # inline bindings table: joins with the rest on its variables.
        # A column holding any UNDEF (None) row is NULLABLE — the join
        # must use compatible-mapping semantics (unbound matches any).
        undef_cols = {
            n for i, n in enumerate(names) if any(r[i] is None for r in rows)
        }
        frames.append(
            (
                triples.sparkSession.createDataFrame(
                    rows, ", ".join(f"{n} string" for n in names)
                ),
                undef_cols,
            )
        )
    for arms in parsed.unions:
        # SPARQL bag union: each arm is a FULL group graph pattern,
        # compiled recursively (OPTIONAL, FILTER, VALUES, GRAPH, paths,
        # nested UNION all work inside an arm); bindings align on the
        # union of the arms' variables (missing vars null-extend).
        # Columns absent from any arm — or nullable WITHIN an arm (its
        # own OPTIONAL) — are NULLABLE: joining them later must use
        # compatible-mapping semantics (_join_compat), because SPARQL
        # treats an unbound variable as join-compatible with any value.
        arm_frames, arm_nulls = [], []
        for arm_text in arms:
            if re.match(r"\s*SELECT\b", _mask_strings(arm_text), re.IGNORECASE):
                # subquery arm: keep its braces so the recursive parse
                # sees '{ SELECT … }' and routes it through the subquery
                # path (scope: only its projected variables join)
                arm_text = f"{{ {arm_text} }}"
            f, nset = _select_frame(
                triples,
                f"SELECT * WHERE {{ {arm_text} }}",
                pmap,
                dataset=dataset,
                _in_group=True,
            )
            arm_frames.append(f)
            arm_nulls.append(nset)
        allcols: list[str] = []
        for f in arm_frames:
            allcols += [c for c in f.columns if c not in allcols]
        aligned = [
            f.select(
                *[
                    F.col(c) if c in f.columns else F.lit(None).cast("string").alias(c)
                    for c in allcols
                ]
            )
            for f in arm_frames
        ]
        nullable = {c for c in allcols if any(c not in f.columns for f in arm_frames)}
        for nset in arm_nulls:
            nullable |= nset
        frames.append((reduce(lambda a, b: a.unionByName(b), aligned), nullable))
    for subtext in parsed.subqueries:
        # subquery: an independently evaluated solution sequence whose
        # PROJECTED variables join the enclosing group; inner modifiers
        # (GROUP BY / ORDER BY / LIMIT …) apply before the join, per
        # spec. The recursive compile reports which projected columns
        # can be unbound, so the join stays compatible-mapping-correct.
        frames.append(
            _select_frame(triples, subtext, pmap, dataset=dataset, _in_group=True)
        )
    had_identity_service = False
    for svc_silent, svc_endpoint, svc_text in parsed.services:
        svc = _service_frame(
            triples.sparkSession, svc_silent, svc_endpoint, svc_text, pmap
        )
        if svc is None:
            # join identity: a varless non-empty remote result, or a
            # SILENT failure of a varless group (single empty solution)
            had_identity_service = True
        else:
            frames.append(svc)
    if not frames:
        if had_identity_service:
            # identity SERVICE as the ONLY clause: one solution binding
            # nothing (its _anon_ column is hidden from SELECT *)
            frames.append(
                (
                    triples.sparkSession.createDataFrame(
                        [("1",)], "_anon_service string"
                    ),
                    set(),
                )
            )
        elif parsed.var_services:
            raise ValueError(
                f"SERVICE ?{parsed.var_services[0][1]}: endpoint variable "
                "is not bound by the enclosing group (bind it with VALUES "
                "or a triple pattern)"
            )
        else:
            raise ValueError("empty WHERE block")
    out, out_null = frames[0]
    for f, f_null in frames[1:]:
        out, out_null = _join_compat(out, out_null, f, f_null)
    for svc_silent, svc_var, svc_text in parsed.var_services:
        # variable-endpoint federation: needs ?var's bindings, so it
        # joins AFTER every same-group clause (OPTIONAL extensions can
        # not bind an endpoint — the nullability check refuses them)
        out, out_null = _var_service_join(
            triples.sparkSession, out, out_null, svc_silent, svc_var, svc_text, pmap
        )

    for kind, blk in parsed.optionals:
        if kind == "flat":
            opt_frame, opt_null = _compile_optional_block(dstore, blk, pmap)
        else:
            # full-group OPTIONAL operand (UNION/VALUES/GRAPH/… inside):
            # recursive compile; surface any failure as the loud
            # ValueError contract, naming the block
            try:
                opt_frame, opt_null = _select_frame(
                    triples,
                    f"SELECT * WHERE {{ {blk} }}",
                    pmap,
                    dataset=dataset,
                    _in_group=True,
                )
            except ValueError:
                raise
            except Exception as e:  # e.g. unresolved outer-group var
                raise ValueError(
                    f"cannot compile OPTIONAL group {blk.strip()!r}: {e}"
                ) from e
        shared = [c for c in out.columns if c in opt_frame.columns]
        if (opt_null | out_null) & set(shared):
            # a shared variable either side may leave unbound: SPARQL
            # LeftJoin treats unbound as compatible-with-anything, so
            # the plain equi-join (null never matches) would silently
            # drop spec-valid extensions — take the compatible-mapping
            # left join instead (coalesced bindings, left rows survive)
            out, out_null = _left_join_compat(out, out_null, opt_frame, opt_null)
        else:
            out_null |= {c for c in opt_frame.columns if c not in out.columns}
            out = optional(out, opt_frame)

    for minus_text in parsed.minuses:
        # SPARQL MINUS: drop bindings compatible with the minus group on
        # their shared variables; with no shared variables MINUS removes
        # nothing (per spec — disjoint domains are never compatible).
        # The group is a full graph pattern, compiled recursively.
        mframe, mnull = _select_frame(
            triples,
            f"SELECT * WHERE {{ {minus_text} }}",
            pmap,
            dataset=dataset,
            _in_group=True,
        )
        shared = [c for c in out.columns if c in mframe.columns]
        loose = (mnull | out_null) & set(shared)
        if shared and loose:
            # a shared variable either side may leave unbound: the spec's
            # Minus(Ω1, Ω2) keeps μ1 unless some μ2 is COMPATIBLE (unbound
            # matches anything) AND dom(μ1)∩dom(μ2) ≠ ∅ (disjoint domains
            # never remove). The plain anti-join (null never matches)
            # would silently KEEP removed solutions — take the theta
            # anti-join that states both conditions exactly.
            left, right = out.alias("_l"), mframe.alias("_r")
            compat = F.lit(True)
            overlap = F.lit(False)
            for c in shared:
                lc, rc = F.col(f"_l.{c}"), F.col(f"_r.{c}")
                if c in loose:
                    compat = compat & (lc.isNull() | rc.isNull() | (lc == rc))
                    overlap = overlap | (lc.isNotNull() & rc.isNotNull())
                else:
                    compat = compat & (lc == rc)
                    overlap = F.lit(True)
            out = left.join(right, compat & overlap, "left_anti").select(
                *(F.col(f"_l.{c}").alias(c) for c in out.columns)
            )
        elif shared:
            # all-bound shared vars: compatibility = equality and the
            # domain overlap is guaranteed — plain hash anti-join
            out = out.join(mframe.select(*shared).distinct(), shared, "left_anti")

    # BIND(expr AS ?v): extend the bindings — the variable must be new.
    # Clause BINDs first, then expression projections (parsed.proj_binds)
    # so '(DATATYPE(?t) AS ?dt)' can reference a clause-bound ?t.
    for alias, expr in parsed.binds + parsed.proj_binds:
        if alias in out.columns:
            raise ValueError(f"BIND target ?{alias} is already bound")
        out = out.withColumn(alias, _bind_col(expr, pmap))
        computed = _COMPUTED.get()
        if computed is not None and not re.match(
            r"\s*(STRLANG|STRDT)\s*\(", expr, re.IGNORECASE
        ):
            # the alias holds a computed VALUE, not an encoded term —
            # later ?alias references must not decode it (STRLANG/STRDT
            # are the exceptions: their outputs ARE encoded terms)
            computed.add(alias)
        # a BIND output is unbound when an input is unbound, or when the
        # expression itself errors (e.g. a failed numeric try_cast) — so
        # it is nullable if it references any nullable/unknown var, or
        # performs numeric evaluation at all
        refs = set(re.findall(r"\?(\w+)", _mask_strings(expr)))
        numericish = bool(
            _arith_split(expr, _mask_strings(expr))
            or re.match(
                r"\s*(ABS|CEIL|FLOOR|ROUND|SUBSTR)\s*\(", expr, re.IGNORECASE
            )
        )
        if numericish or any(v in out_null or v not in out.columns for v in refs):
            out_null.add(alias)

    # FILTER [NOT] EXISTS { group }: left-semi / left-anti join on the
    # shared variables; the group is a full graph pattern, compiled
    # recursively. A correlated EXISTS with NO shared variable would
    # degenerate to a constant test — raise rather than silently cross;
    # likewise a shared variable the group may leave unbound.
    for negated, ex_text in parsed.exists:
        eframe, enull = _select_frame(
            triples,
            f"SELECT * WHERE {{ {ex_text} }}",
            pmap,
            dataset=dataset,
            _in_group=True,
        )
        shared = [c for c in out.columns if c in eframe.columns]
        if not shared:
            raise ValueError(
                "FILTER EXISTS block shares no variable with the outer group"
            )
        # substitution semantics: the OUTER solution's bound vars become
        # constants inside the group; an outer-UNBOUND shared var stays a
        # free variable, so any group binding satisfies it — null-or-equal
        # on the outer side. A group-side nullable shared var is the
        # W3C-errata substitution corner (a FILTER inside the group can
        # see the substituted constant on rows where no pattern bound the
        # var, which no join over the unsubstituted frame reproduces) —
        # loud refusal there, never a silent approximation.
        g_loose = enull & set(shared)
        if g_loose:
            raise ValueError(
                "FILTER EXISTS group may leave shared variable(s) "
                f"{sorted(g_loose)} unbound (substitution semantics are "
                "not join-expressible for that shape)"
            )
        o_loose = out_null & set(shared)
        if o_loose:
            left, right = out.alias("_l"), eframe.alias("_r")
            cond = F.lit(True)
            for c in shared:
                lc, rc = F.col(f"_l.{c}"), F.col(f"_r.{c}")
                t = (lc.isNull() | (lc == rc)) if c in o_loose else (lc == rc)
                cond = cond & t
            out = left.join(
                right, cond, "left_anti" if negated else "left_semi"
            ).select(*(F.col(f"_l.{c}").alias(c) for c in out.columns))
        else:
            out = out.join(
                eframe.select(*shared).distinct(),
                shared,
                "left_anti" if negated else "left_semi",
            )

    # FILTER applies to the group's bindings (after optionals join in);
    # comparisons on unbound (null) vars are null → dropped, matching
    # SPARQL's error-eliminates-row semantics.
    for cond in parsed.filters:
        out = out.filter(_filter_col(cond, pmap))

    # projection / aggregation
    aggs = [p for p in parsed.projection if isinstance(p, tuple)]
    if aggs or parsed.group_by:
        # materialize expression keys '(expr AS ?alias)' as columns first
        keys = []
        for k in parsed.group_by:
            if isinstance(k, tuple):
                alias, expr_text = k
                out = out.withColumn(alias, _bind_col(expr_text, pmap))
                computed = _COMPUTED.get()
                if computed is not None:
                    computed.add(alias)
                keys.append(alias)
            else:
                keys.append(k)
        # a plain projected variable in a grouped query must be one of
        # the GROUP BY keys — silently dropping it would be a wrong answer
        for p in parsed.projection:
            if isinstance(p, str) and p not in keys:
                raise ValueError(
                    f"projected variable ?{p} is not a GROUP BY key "
                    "or an aggregate alias"
                )
    if parsed.group_by and not aggs:
        # GROUP BY without aggregates: one solution per group (the keys),
        # per spec — previously this modifier was silently ignored
        if parsed.having:
            raise ValueError("HAVING requires an aggregate projection")
        out = out.select(*keys).distinct()
        out = out.select(
            *(p for p in parsed.projection if isinstance(p, str))
        )
    elif aggs:

        # COUNT(DISTINCT *) counts distinct SOLUTIONS in the group: one
        # struct over every binding column (existential _anon_ columns are
        # not solution bindings — same exclusion SELECT * applies). A
        # struct is never NULL even when its fields are, so null-extended
        # OPTIONAL/UNION rows count correctly — count_distinct over the
        # bare columns would silently drop them.
        _solution_struct = F.struct(
            *[F.col(c) for c in out.columns if not c.startswith("_anon_")]
        )

        def agg_expr(fn: str, x: str, alias: str, extra, distinct: bool):
            if fn == "count" and x == "*":
                if distinct:
                    return F.count_distinct(_solution_struct).alias(alias)
                # COUNT(*) counts solutions, null-extended bindings
                # included — count(lit) not count(col), which skips nulls
                return F.count(F.lit(1)).alias(alias)
            # value aggregates see the lexical form (annotation mode:
            # SUM("5"^^xsd:integer) casts "5"; MIN/GROUP_CONCAT order and
            # emit lexical text, matching the SQL oracle). COUNT counts
            # bound TERMS — distinctness must stay term-level
            c = F.col(x) if fn == "count" else _vref(x)
            if fn == "count":
                return (F.count_distinct(c) if distinct else F.count(c)).alias(alias)
            if fn == "sum":
                # terms are strings in the store; SPARQL numeric aggregation
                # casts (non-numeric terms → null, ignored by the aggregate)
                n = c.try_cast("double")
                return (F.sum_distinct(n) if distinct else F.sum(n)).alias(alias)
            if fn == "avg":
                n = c.try_cast("double")
                if distinct:
                    # no avg_distinct builtin; both legs ignore nulls, so
                    # the ratio is the spec's Avg over the distinct multiset
                    return (F.sum_distinct(n) / F.count_distinct(n)).alias(alias)
                return F.avg(n).alias(alias)
            if fn == "min":
                return F.min(c).alias(alias)  # DISTINCT is a no-op for MIN
            if fn == "max":
                return F.max(c).alias(alias)  # and for MAX
            if fn == "sample":
                # SPARQL SAMPLE may return any element; MIN is the
                # deterministic choice (stable under retries/speculation)
                return F.min(c).alias(alias)
            if fn == "group_concat":
                # element order is unspecified by SPARQL — sort for
                # determinism (= string_agg(x, sep ORDER BY x) in SQL)
                bag = F.collect_set(c) if distinct else F.collect_list(c)
                return F.array_join(F.array_sort(bag), extra).alias(alias)
            raise ValueError(f"unsupported aggregate {fn.upper()}")

        exprs = [agg_expr(*a) for a in aggs]
        out = out.groupBy(*keys).agg(*exprs)
        computed = _COMPUTED.get()
        if computed is not None:
            # aggregate outputs are computed values (counts, sums,
            # joined lexical text) — HAVING/ORDER BY references must not
            # term-decode them or string-coerce their numeric types
            computed.update(alias for (_, _, alias, _, _) in aggs)
        # HAVING: rewrite AGG(?v) calls to their projection alias, then
        # compile like any FILTER over the aggregated frame. An aggregate
        # that is not projected (or HAVING without aggregation) raises.
        alias_of = {(fn, x, d): alias for (fn, x, alias, _, d) in aggs}

        def _rewrite_having(cond: str) -> str:
            def sub(m: re.Match) -> str:
                tok = m.group(3)
                key = (
                    m.group(1).lower(),
                    "*" if tok == "*" else tok[1:],
                    bool(m.group(2)),
                )
                if key not in alias_of:
                    raise ValueError(
                        f"HAVING/ORDER BY references {m.group(0)} which is "
                        "not in the SELECT projection"
                    )
                return f"?{alias_of[key]}"

            return re.sub(
                r"(COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(DISTINCT\s+)?(\*|\?\w+)\s*\)",
                sub,
                cond,
                flags=re.IGNORECASE,
            )

        for cond in parsed.having:
            out = out.filter(_filter_col(_rewrite_having(cond), pmap))
        # ORDER BY may reference an aggregate call (ORDER BY
        # DESC(COUNT(?o))) — rewrite it to the projection alias the same
        # way HAVING does, so the later orderBy compiles over the
        # aggregated frame
        if parsed.order_by:
            parsed.order_by = [
                (_rewrite_having(k), asc) for k, asc in parsed.order_by
            ]
        # project in SELECT order; a GROUP BY key that is not projected
        # is grouped on but (per spec) not emitted
        out = out.select(
            *(p[2] if isinstance(p, tuple) else p for p in parsed.projection)
        )
    elif parsed.having:
        raise ValueError("HAVING requires an aggregate projection")
    elif "*" not in parsed.projection:
        want = [v for v in parsed.projection if isinstance(v, str)]
        missing = [v for v in want if v not in out.columns]
        if missing:
            raise ValueError(f"projected variables not bound in WHERE: {missing}")
        out = out.select(*want)
    else:
        # blank-node-list variables are existential: they join like any
        # variable but are not solution bindings — SELECT * hides them
        keep = [c for c in out.columns if not c.startswith("_anon_")]
        if len(keep) != len(out.columns):
            out = out.select(*keep)
    if parsed.distinct:
        out = out.distinct()

    if parsed.slice_by is not None:
        # per-named-graph solution modifiers (GRAPHSLICE, emitted by
        # _rewrite_graph_subselect for a subquery inside GRAPH ?var):
        # ORDER BY ranks within each graph partition and LIMIT/OFFSET
        # slice each partition — ONE Window row_number, no global sort.
        # ORDER-without-slice has no observable effect after the
        # enclosing join (per spec, subquery order does not survive) and
        # ties under LIMIT are broken by the remaining columns so the
        # slice is deterministic (SPARQL leaves tie order unspecified).
        if parsed.limit is not None or parsed.offset is not None:
            keys = [
                _bind_col(k, pmap).asc() if asc else _bind_col(k, pmap).desc()
                for k, asc in (parsed.order_by or [])
            ]
            keys += [
                F.col(c).asc()
                for c in out.columns
                if c != parsed.slice_by
            ]
            from pyspark.sql import Window as _W

            w = _W.partitionBy(parsed.slice_by).orderBy(*keys)
            lo = parsed.offset or 0
            out = out.withColumn("_graphslice_rn", F.row_number().over(w))
            cond = F.col("_graphslice_rn") > lo
            if parsed.limit is not None:
                cond = cond & (F.col("_graphslice_rn") <= lo + parsed.limit)
            out = out.filter(cond).drop("_graphslice_rn")
    else:
        if parsed.order_by:
            # each condition is a raw term/expression string ('?var' or
            # e.g. 'STRLEN(?s)') — compiled through the scalar-expression
            # compiler
            out = out.orderBy(
                *[
                    _bind_col(k, pmap).asc() if asc else _bind_col(k, pmap).desc()
                    for k, asc in parsed.order_by
                ]
            )
        if parsed.offset is not None:
            # SPARQL slice: OFFSET skips into the (ordered) solution
            # sequence before LIMIT truncates it — df.offset composes the
            # same way
            out = out.offset(parsed.offset)
        if parsed.limit is not None:
            out = out.limit(parsed.limit)
    if _ANNOT.get() and not _in_group and not _raw_terms:
        # top-level projection in annotation mode: every construct above
        # operated on encoded terms (= term identity); the caller gets
        # lexical forms back, plus the {var}__lang/{var}__dt companion
        # columns (the result serializers' convention) when asked.
        # Inner groups (_in_group) must stay encoded for their joins.
        str_cols = {
            f.name for f in out.schema.fields if isinstance(f.dataType, StringType)
        }
        sel, comp = [], []
        for cname in out.columns:
            c = F.col(cname)
            if cname in str_cols:
                sel.append(_decode_term(c).alias(cname))
                if _companions:
                    lang = F.regexp_extract(c, _ENC_LANG, 1)
                    dt = F.regexp_extract(c, _ENC_DT, 1)
                    comp.append(F.when(lang != "", lang).alias(cname + "__lang"))
                    comp.append(F.when(dt != "", dt).alias(cname + "__dt"))
            else:
                sel.append(c)
        out = out.select(*sel, *comp)
    # aggregate aliases are always bound; anything else that survived to
    # the projection keeps its tracked nullability
    return out, {c for c in out.columns if c in out_null}
