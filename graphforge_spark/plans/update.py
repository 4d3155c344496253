"""SPARQL Update front-end: the standard mutation surface over a triples
store frame.

The reference mutates its graph two ways — append-on-upload
(docs/test HTML/documentQueryTest.html:362-438, parse new doc + append
quads to ``quads.nq``) and truncate-then-rebuild
(docs/scripts/graphProcessor.js:57-113). Those are exactly INSERT and
CLEAR-then-INSERT in SPARQL Update terms; this module exposes the
standard grammar for them (plus the pattern-driven DELETE/INSERT forms a
Comunica user would expect), compiled to the same DataFrame algebra as
the query surface.

Supported grammar (whitespace-insensitive, case-insensitive keywords;
operations separated by ``;`` apply sequentially, each seeing the
previous result, per SPARQL 1.1 Update §3):

    update  := PREFIX* op (';' PREFIX* op)*     (prefix decls accumulate)
    op      := INSERT DATA '{' data '}'
             | DELETE DATA '{' data '}'
             | DELETE WHERE '{' quads '}'       (body doubles as template;
                                                 GRAPH blocks allowed)
             | (DELETE template)? (INSERT template)? WHERE group
             | CLEAR SILENT? (DEFAULT | ALL | GRAPH iri)
             | DROP  SILENT? GRAPH iri
             | (ADD | COPY | MOVE) SILENT? GRAPH? iri TO GRAPH? iri
    data    := ground+ | GRAPH iri '{' ground+ '}'   (one wrapping graph)
    ground  := plain triple with no variables (Turtle ';'/',' sugar ok)
    template:= '{' (pattern | GRAPH (iri|var) '{' pattern+ '}')+ '}'
               (QUAD templates: GRAPH blocks route triples to a graph —
                constant or per-solution variable; plain patterns only
                inside: no paths, no blank-node lists)
    group   := full group graph pattern — everything the SELECT compiler
               accepts (OPTIONAL/UNION/FILTER/BIND/VALUES/MINUS/EXISTS/
               paths/subqueries/constant+variable GRAPH)

Semantics (SPARQL 1.1 Update §3.1.3): for one DELETE/INSERT operation the
WHERE group is evaluated ONCE against the current store; the delete set
and the insert set are both instantiated from that same solution
sequence; deletes apply before inserts. A template triple with an
unbound (null-extended) variable in a given solution produces no triple
for that solution, per spec. The updated store is returned as a new
DataFrame with the input's full column set — the caller persists it
(sinks/tables.py); nothing here mutates storage.

Engine-mapping notes (documented, deliberate):

- **Term identity is lexical (subj, pred, obj)** — the same identity the
  query surface binds. A store carrying ``graph`` / ``obj_lang`` /
  ``obj_dt`` columns is read as the union default graph (the query
  surface's convention), so DELETE removes EVERY row whose lexical
  triple matches (all graphs, all annotation variants), and INSERT is a
  no-op when the lexical triple is already visible anywhere. The ONE
  graph-scoped exception: a ``GRAPH <g>``-wrapped DATA block pins both
  sides to that graph — DELETE DATA removes only g's rows, INSERT DATA
  lands in g and dedups against g alone. Annotated literals
  (``"a"@en`` / ``"x"^^xsd:int``) in DATA or templates are rejected
  loudly — this surface cannot bind them, so it must not half-handle
  them.
- **Graph management is real here** — the forge's ``graph`` column IS a
  named-graph layout (one graph per source conversation), so CLEAR
  GRAPH / DROP GRAPH delete a graph's rows (DROP without SILENT raises
  on an absent graph, per spec; CLEAR of an absent graph is a no-op),
  and ADD/COPY/MOVE shuffle whole graphs: ADD unions g1's triples into
  g2 (skipping ones g2 already has), COPY replaces g2's contents with
  g1's, MOVE is COPY + drop g1. Copied rows keep their provenance
  columns; only ``graph`` changes. ``DEFAULT`` as an ADD/COPY/MOVE
  operand is refused — this store's default graph is the union of all
  graphs, not a container rows can live in. All graph operations refuse
  loudly on a store without a ``graph`` column.
- Inserted rows derive ``obj_is_literal`` from the engine discriminator
  (graphProcessor.js:222 ``startsWith('http')``, plus the ``_:`` blank
  marker), get ``graph = insert_graph`` (default ``urn:graphforge:update``
  — a named graph that cannot collide with the forge's per-conversation
  graphs, which are conv ids), and NULL for any other store column
  (provenance columns have no meaningful value for query-made rows).
- Set semantics are preserved by construction: inserts are
  ``distinct``-ed and anti-joined against the post-delete store before
  the union, so an existing row (with its provenance) is never
  duplicated and never rewritten — the result needs no global re-dedup.
- **LOAD** reads a document hermetically (``file://`` URIs / bare paths
  via ``demo.fetch_file`` — http(s) stays refused, this build ships no
  network), dispatches on the extension to the REAL extractors
  (.ttl/.nt/.nq/.rdf/.owl/.xml/.json/.jsonld), and inserts the parsed
  triples into ``INTO GRAPH <g>`` (default: the op's insert graph).
  ``LOAD SILENT`` swallows fetch/parse failures per spec. Driver-side
  single-document read — bulk corpus ingest is the pipeline's job, not
  LOAD's.
- **CREATE GRAPH** is the spec-sanctioned no-op for stores that cannot
  record empty graphs (this row-bearing layout can't): non-SILENT
  errors when the graph already exists, otherwise the store is
  unchanged.
- **WITH <g>** on DELETE/INSERT…WHERE scopes all three parts to g:
  WHERE matches only g's rows (unless USING overrides it, per spec),
  DELETE removes only g's copies, INSERT lands in g.
- **USING <g> / USING NAMED <g>** compile to the query surface's
  FROM / FROM NAMED dataset clauses for the WHERE block.
- **Quad templates** (GRAPH blocks inside DELETE/INSERT templates and
  DELETE WHERE): a ``GRAPH <g> { … }`` block's triples delete/insert
  only in g; ``GRAPH ?v { … }`` routes per solution (an unbound ?v
  drops that solution's instantiation, like any template variable).
  WITH supplies the graph for a quad template's UNSCOPED triples only —
  GRAPH blocks override it, per §3.1.3. Quad inserts dedup WITHIN the
  target graph (graphs are separate containers for the explicit form,
  matching GRAPH-wrapped DATA); quad deletes remove only the named
  graph's copies while unscoped template triples keep the
  delete-everywhere union contract.

Scale shape: one operation = the WHERE plan (whatever the query compiler
builds) + at most two shuffle-free template projections + one anti-join
per delete/insert side, all on the (subj, pred, obj) key. No Python in
any path; ground DATA frames are driver literals (bounded by query text
size, like VALUES).
"""

from __future__ import annotations

import re
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.functions.terms import DEFAULT_PREFIXES
from graphforge_spark.operators.closure import _ckpt
from graphforge_spark.plans.bgp import Var
from graphforge_spark.plans.sparql import (
    _PREFIX_RE,
    _apply_base,
    _balanced_end,
    _expand,
    _expand_statements,
    _mask_strings,
    _parse_pattern,
    _select_query,
    _strip_comments,
)

__all__ = ["sparql_update"]

_LEX_KEY = ["subj", "pred", "obj"]

# Update features in UNSUPPORTED POSITIONS — named so the error says
# which one, not just "cannot parse". (GRAPH is supported as CLEAR/DROP/
# CREATE target, in ADD/COPY/MOVE, and as a DATA-block wrapper;
# WITH/USING are supported on DELETE/INSERT…WHERE; GRAPH blocks in
# DELETE/INSERT templates and DELETE WHERE are quad templates (also
# supported); the scan only fires at fallthrough, where the keyword
# sits somewhere the grammar does not allow — e.g. USING on a DATA op.)
_UNSUPPORTED_UPDATE = re.compile(
    r"\b(WITH|USING|GRAPH)\b", re.IGNORECASE
)


def _scan_mask(text: str) -> str:
    """String-literal AND <IRI>-content blanked copy (same length) for
    structural scans, so quoted/IRI ';' '{' keywords cannot derail them.
    An IRI span needs a closing '>' — a bare '<' (the less-than operator
    in a FILTER) is left alone, matching the query compiler's masking."""
    masked = _mask_strings(text)
    return re.sub(
        r"<[^<>\s]*>", lambda m: "<" + " " * (len(m.group(0)) - 2) + ">", masked
    )


def _split_ops(update: str) -> list[str]:
    """Split an update request on ';' at brace depth 0 (the operation
    separator); ';' inside braces is Turtle predicate-object sugar."""
    masked = _scan_mask(update)
    out, depth, start = [], 0, 0
    for i, ch in enumerate(masked):
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        elif ch == ";" and depth == 0:
            out.append(update[start:i])
            start = i + 1
    out.append(update[start:])
    return out


def _take_braced(op: str, head: str) -> tuple[str, str] | None:
    """Match ``head { body }`` at the START of op; return (body, rest)
    or None when the head keyword is absent."""
    m = re.match(rf"\s*{head}\s*\{{", op, re.IGNORECASE)
    if not m:
        return None
    masked = _scan_mask(op)
    end = _balanced_end(masked, m.end() - 1)
    return op[m.end() : end - 1], op[end:]


def _ground_rows(
    body: str, pmap: dict
) -> tuple[list[tuple[str, str, str]], str | None]:
    """Parse INSERT DATA / DELETE DATA ground triples → (rows, graph).
    One wrapping ``GRAPH <iri> { … }`` block pins the rows to that named
    graph (graph is None for the plain form). Variables, paths, and
    blank-node sugar raise (DATA blocks are ground by definition; bnodes
    in INSERT DATA are legal SPARQL we deliberately refuse — fresh-bnode
    allocation per update is an identity policy this lexical store does
    not have)."""
    graph = None
    m = re.match(
        r"\s*GRAPH\s+(<(?P<iri>[^>]*)>|(?P<curie>[\w-]*:[\w./#-]+))\s*\{",
        body,
        re.IGNORECASE,
    )
    if m:
        end = _balanced_end(_scan_mask(body), m.end() - 1)
        if body[end:].strip():
            raise ValueError(
                "a DATA block supports at most ONE wrapping GRAPH group"
            )
        graph = (
            m.group("iri")
            if m.group("iri") is not None
            else _expand(m.group("curie"), pmap)
        )
        body = body[m.end() : end - 1]
    rows = []
    for stmt in _expand_statements(body, allow_bnode=False):
        s, p, o = _parse_pattern(stmt, pmap)
        for slot in (s, p, o):
            if isinstance(slot, Var):
                raise ValueError(
                    f"variables are not allowed in a DATA block: ?{slot.name}"
                )
            if isinstance(slot, tuple):
                raise ValueError(
                    "property-path syntax is not allowed in a DATA block"
                )
        rows.append((s, p, o))
    if not rows:
        raise ValueError("empty DATA block")
    return rows, graph


def _parse_templates(body: str, pmap: dict, what: str) -> list[tuple]:
    """Parse a DELETE/INSERT template into plain (s, p, o) pattern
    triples; paths raise (same restriction as CONSTRUCT templates)."""
    templates = [
        _parse_pattern(stmt, pmap)
        for stmt in _expand_statements(body, allow_bnode=False)
    ]
    if not templates:
        raise ValueError(f"empty {what} template")
    for _, p, _ in templates:
        if isinstance(p, tuple):
            raise ValueError(
                f"property paths are not allowed in a {what} template"
            )
    return templates


def _instantiate(sol: DataFrame, templates: list[tuple], what: str) -> DataFrame:
    """Template × solutions → distinct (subj, pred, obj). Unbound
    variables drop that solution's instantiation (spec §3.1.3.2).
    The g=None special case of the quad instantiator."""
    quads = [(s, p, o, None) for s, p, o in templates]
    return _instantiate_quads(sol, quads, what).drop("graph")


_QUAD_GRAPH_RE = re.compile(
    # the left-context guard keeps a template token that merely ENDS in
    # "GRAPH" (an IRI tail, a prefixed local name) from being consumed
    # as a block head — today unreachable only because '{' is otherwise
    # illegal in templates; the lookbehind makes the invariant explicit
    # rather than incidental (review finding)
    r"(?<![\w:/#.-])GRAPH\s+(?:<([^>]*)>|\?(\w+)|([\w.-]*:[\w./#-]+))\s*\{",
    re.IGNORECASE,
)


def _parse_quad_templates(body: str, pmap: dict, what: str) -> list[tuple]:
    """DELETE/INSERT template → (s, p, o, g) rows — QUAD templates
    (SPARQL 1.1 Update §3.1.3 QuadPattern): g is None for plain
    triples, an IRI string for ``GRAPH <g> { … }`` blocks, a ``Var``
    for ``GRAPH ?v { … }`` blocks (the graph routes per solution).
    Plain-triple restrictions (no paths, no blank-node lists, no
    annotated literals) apply inside the blocks unchanged. The plain
    fragments around each block join with ' . ' — the '.' after a
    Quads block is OPTIONAL in the grammar, so the fragments are
    independent statement runs, not one statement (review finding:
    a bare-space join merged them unparsably)."""
    masked = _mask_strings(body)
    pieces: list = []
    blocks: list = []
    pos = 0
    while True:
        m = _QUAD_GRAPH_RE.search(masked, pos)
        if not m:
            pieces.append(body[pos:])
            break
        end = _balanced_end(masked, m.end() - 1)
        pieces.append(body[pos : m.start()])
        blocks.append((m.groups(), body[m.end() : end - 1]))
        pos = end
    rest = " . ".join(pieces)
    out: list = []
    for (iri, var, curie), text in blocks:
        if not text.strip():
            raise ValueError(f"empty GRAPH block in {what} template")
        if var is not None:
            g: object = Var(var)
        else:
            g = iri if iri is not None else _expand(curie, pmap)
        out += [(s, p, o, g) for s, p, o in _parse_templates(text, pmap, what)]
    if rest.strip(" ."):
        out += [(s, p, o, None) for s, p, o in _parse_templates(rest, pmap, what)]
    if not out:
        raise ValueError(f"empty {what} template")
    return out


def _template_col(sol: DataFrame, slot, what: str):
    """A template slot → Column: a Var reads the solution binding (loud
    when unbound-by-name), a constant becomes a literal. One definition
    for the triple and quad instantiators (review finding)."""
    if isinstance(slot, Var):
        if slot.name not in sol.columns:
            raise ValueError(
                f"{what} template variable ?{slot.name} is not bound in WHERE"
            )
        return F.col(slot.name)
    return F.lit(slot)


def _instantiate_quads(
    sol: DataFrame, quads: list[tuple], what: str, default_graph: str | None = None
) -> DataFrame:
    """Quad templates × solutions → distinct (subj, pred, obj, graph);
    ``graph`` is NULL for unscoped triples unless ``default_graph``
    (WITH, or the op's insert graph) supplies one. An unbound template
    variable — including an unbound ``GRAPH ?var`` — drops that
    solution's instantiation (spec §3.1.3.2)."""
    frames = []
    for s, p, o, g in quads:
        drop = ["subj", "pred", "obj"]
        if isinstance(g, Var):
            gc = _template_col(sol, g, what)
            drop.append("graph")
        elif g is None:
            gc = F.lit(default_graph).cast("string")
        else:
            gc = F.lit(g)
        frames.append(
            sol.select(
                _template_col(sol, s, what).alias("subj"),
                _template_col(sol, p, what).alias("pred"),
                _template_col(sol, o, what).alias("obj"),
                gc.alias("graph"),
            ).na.drop(subset=drop)
        )
    return reduce(lambda a, b: a.unionByName(b), frames).distinct()


def _delete_quad_rows(store: DataFrame, doomed: DataFrame) -> DataFrame:
    """Per-row-graph delete: NULL-graph rows delete the lexical triple
    EVERYWHERE (the union-default-graph contract); graph-tagged rows
    delete only that graph's copies. Two anti-joins, both on the store's
    existing layout — no shuffle beyond them."""
    out = store.join(
        doomed.filter(F.col("graph").isNull()).select(*_LEX_KEY),
        _LEX_KEY,
        "left_anti",
    )
    return out.join(
        doomed.filter(F.col("graph").isNotNull()).select(*_LEX_KEY, "graph"),
        _LEX_KEY + ["graph"],
        "left_anti",
    )


def _engine_literal_flag():
    """The engine's object discriminator (graphProcessor.js:222
    startsWith('http'), plus the ``_:`` blank marker) — one definition
    for both insert helpers (review finding)."""
    return (
        ~(F.col("obj").startswith("http") | F.col("obj").startswith("_:"))
    ).alias("obj_is_literal")


def _insert_quad_rows(store: DataFrame, fresh: DataFrame) -> DataFrame:
    """Per-row-graph insert: every fresh row carries its target graph;
    dedup is WITHIN the target graph (explicit quad inserts treat graphs
    as separate containers, matching the GRAPH-scoped DATA form).
    ``fresh`` comes distinct from ``_instantiate_quads`` — no re-dedup
    here (review finding: the double Deduplicate shuffle)."""
    cols = [F.col("subj"), F.col("pred"), F.col("obj")]
    if "obj_is_literal" in store.columns:
        cols.append(_engine_literal_flag())
    cols.append(F.col("graph"))
    seen = store.select(*_LEX_KEY, "graph")
    new = fresh.join(seen, _LEX_KEY + ["graph"], "left_anti").select(*cols)
    return store.unionByName(new, allowMissingColumns=True)


def _require_graph_col(store: DataFrame, what: str) -> None:
    if "graph" not in store.columns:
        raise ValueError(f"{what} needs a store with a graph column")


def _delete_rows(
    store: DataFrame, doomed: DataFrame, graph: str | None = None
) -> DataFrame:
    """Anti-join on lexical identity; a graph-scoped DATA block deletes
    only within that graph (the other graphs' copies survive)."""
    if graph is None:
        return store.join(doomed.select(*_LEX_KEY), _LEX_KEY, "left_anti")
    _require_graph_col(store, "GRAPH-scoped DELETE DATA")
    in_graph = store.filter(F.col("graph") == graph)
    kept = in_graph.join(doomed.select(*_LEX_KEY), _LEX_KEY, "left_anti")
    return store.filter(
        ~F.col("graph").eqNullSafe(F.lit(graph))
    ).unionByName(kept)


def _insert_rows(
    store: DataFrame, fresh: DataFrame, graph: str, scoped: bool = False
) -> DataFrame:
    """Union fresh (subj, pred, obj) rows into the store, engine-typing
    the object, skipping triples already visible (anywhere for the plain
    form; within the target graph for a GRAPH-scoped block), NULLing any
    other store column via ``allowMissingColumns``."""
    cols = [F.col("subj"), F.col("pred"), F.col("obj")]
    if "obj_is_literal" in store.columns:
        cols.append(_engine_literal_flag())
    if "graph" in store.columns:
        cols.append(F.lit(graph).alias("graph"))
    elif scoped:
        _require_graph_col(store, "GRAPH-scoped INSERT DATA")
    seen = (
        store.filter(F.col("graph") == graph) if scoped else store
    ).select(*_LEX_KEY)
    fresh = fresh.distinct().join(seen, _LEX_KEY, "left_anti").select(*cols)
    return store.unionByName(fresh, allowMissingColumns=True)


def sparql_update(
    triples: DataFrame,
    update: str,
    prefixes: dict[str, str] | None = None,
    insert_graph: str = "urn:graphforge:update",
) -> DataFrame:
    """Apply a SPARQL Update request (supported grammar in the module
    docstring) to a triples store frame and return the updated store —
    same columns, set semantics preserved. Raises ``ValueError`` on
    anything outside the grammar; never a silently-wrong mutation."""
    if "subj" not in triples.columns:
        raise ValueError("sparql_update needs a triples store frame")
    from graphforge_spark.plans.sparql import _NOW, _utcnow_lexical

    if _NOW.get() is None:
        # one NOW() per request, shared by every ';'-sequenced operation
        # (SPARQL 1.1 §17.4.5.1 pins it per query; a multi-op update is
        # one request, so one timestamp keeps the mutation replayable)
        t_now = _NOW.set(_utcnow_lexical())
        try:
            return sparql_update(
                triples, update, prefixes, insert_graph=insert_graph
            )
        finally:
            _NOW.reset(t_now)
    pmap = dict(DEFAULT_PREFIXES)
    if prefixes:
        pmap.update(prefixes)
    store = triples
    mutated = False
    base: str | None = None
    for op in _split_ops(_strip_comments(update)):
        # BASE resolves the op's relative IRIs before prefix capture
        # (PREFIX IRIs themselves resolve against it, as in queries) and
        # CARRIES into subsequent ops like PREFIX does — SPARQL 1.1
        # prologue declarations apply to all following operations
        # (review finding: per-op scoping silently stored inconsistent
        # IRIs across ';'-sequenced ops; the declaration scan lives in
        # _apply_base alone — return_base threads the carry)
        op, base = _apply_base(op, inherited=base, return_base=True)
        for pfx, iri in _PREFIX_RE.findall(op):
            pmap[pfx] = iri
        op = _PREFIX_RE.sub(" ", op)
        if not op.strip():
            continue
        if mutated:
            # Each op references the accumulated store several times
            # (anti-join + dedup + union + WHERE solution); without a
            # barrier the logical plan grows ~3^N in the number of
            # ';'-sequenced ops. Same loop-checkpoint discipline as the
            # closure fixpoints.
            store = _ckpt(store)
        store = _apply_op(store, op, pmap, insert_graph)
        mutated = True
    return store


def _apply_op(
    store: DataFrame, op: str, pmap: dict, insert_graph: str
) -> DataFrame:
    spark = store.sparkSession

    m = re.match(r"\s*CLEAR\s+(?:SILENT\s+)?(DEFAULT|ALL)\s*$", op, re.IGNORECASE)
    if m:
        return store.limit(0)

    _GRAPH_REF = r"(?:GRAPH\s+)?(?:<(?P<iri>[^>]*)>|(?P<curie>[\w-]*:[\w./#-]+))"

    def _gref(mm, suffix: str = "") -> str:
        iri, curie = mm.group("iri" + suffix), mm.group("curie" + suffix)
        return iri if iri is not None else _expand(curie, pmap)

    m = re.match(
        rf"\s*(?P<kw>CLEAR|DROP)\s+(?P<silent>SILENT\s+)?{_GRAPH_REF}\s*$",
        op,
        re.IGNORECASE,
    )
    if m:
        _require_graph_col(store, f"{m.group('kw').upper()} GRAPH")
        g = _gref(m)
        if m.group("kw").upper() == "DROP" and not m.group("silent"):
            if store.filter(F.col("graph") == g).limit(1).count() == 0:
                raise ValueError(
                    f"DROP GRAPH <{g}>: no such graph (use DROP SILENT "
                    "to make this a no-op)"
                )
        return store.filter(~F.col("graph").eqNullSafe(F.lit(g)))

    m = re.match(
        rf"\s*(?P<kw>ADD|COPY|MOVE)\s+(?P<silent>SILENT\s+)?{_GRAPH_REF}"
        rf"\s+TO\s+{_GRAPH_REF.replace('?P<iri>', '?P<iri2>').replace('?P<curie>', '?P<curie2>')}\s*$",
        op,
        re.IGNORECASE,
    )
    if m:
        kw = m.group("kw").upper()
        _require_graph_col(store, kw)
        src, dst = _gref(m), _gref(m, "2")
        if not m.group("silent"):
            if store.filter(F.col("graph") == src).limit(1).count() == 0:
                raise ValueError(
                    f"{kw} <{src}>: no such source graph (use {kw} SILENT "
                    "to make this a no-op)"
                )
        if src == dst:
            return store  # all three are no-ops on identical operands
        moved = store.filter(F.col("graph") == src).withColumn(
            "graph", F.lit(dst)
        )
        if kw == "ADD":
            dst_keys = store.filter(F.col("graph") == dst).select(*_LEX_KEY)
            return store.unionByName(
                moved.join(dst_keys, _LEX_KEY, "left_anti")
            )
        rest_rows = store.filter(~F.col("graph").eqNullSafe(F.lit(dst)))
        if kw == "MOVE":
            rest_rows = rest_rows.filter(
                ~F.col("graph").eqNullSafe(F.lit(src))
            )
        return rest_rows.unionByName(moved)

    m = re.match(
        r"\s*CREATE\s+(?P<silent>SILENT\s+)?GRAPH\s+"
        r"(?:<(?P<iri>[^>]*)>|(?P<curie>[\w-]*:[\w./#-]+))\s*$",
        op,
        re.IGNORECASE,
    )
    if m:
        _require_graph_col(store, "CREATE GRAPH")
        g = _gref(m)
        if not m.group("silent"):
            if store.filter(F.col("graph") == g).limit(1).count() > 0:
                raise ValueError(
                    f"CREATE GRAPH <{g}>: graph already exists (use CREATE "
                    "SILENT to make this a no-op)"
                )
        # a row-bearing layout cannot record an empty graph — the spec's
        # sanctioned treatment for such stores is success-without-effect
        return store

    m = re.match(
        r"\s*LOAD\s+(?P<silent>SILENT\s+)?<(?P<doc>[^>]+)>"
        r"(?:\s+INTO\s+GRAPH\s+(?:<(?P<iri>[^>]*)>|(?P<curie>[\w-]*:[\w./#-]+)))?"
        r"\s*$",
        op,
        re.IGNORECASE,
    )
    if m:
        doc = m.group("doc")
        scoped = m.group("iri") is not None or m.group("curie") is not None
        g = _gref(m) if scoped else insert_graph
        try:
            fresh = _load_document(spark, doc)
        except Exception as e:
            if m.group("silent"):
                return store
            raise ValueError(f"LOAD <{doc}> failed: {e}") from e
        return _insert_rows(store, fresh, g, scoped=scoped)

    taken = _take_braced(op, r"INSERT\s+DATA")
    if taken:
        body, rest = taken
        _no_rest(rest, "INSERT DATA")
        rows, g = _ground_rows(body, pmap)
        fresh = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        return _insert_rows(
            store, fresh, g if g is not None else insert_graph, scoped=g is not None
        )

    taken = _take_braced(op, r"DELETE\s+DATA")
    if taken:
        body, rest = taken
        _no_rest(rest, "DELETE DATA")
        rows, g = _ground_rows(body, pmap)
        doomed = spark.createDataFrame(
            rows, "subj string, pred string, obj string"
        )
        return _delete_rows(store, doomed, graph=g)

    taken = _take_braced(op, r"DELETE\s+WHERE")
    if taken:
        body, rest = taken
        _no_rest(rest, "DELETE WHERE")
        # quad patterns allowed (GRAPH g { … } / GRAPH ?v { … }): the
        # body doubles as WHERE, where the query surface already
        # evaluates GRAPH groups — the template side routes per graph
        quads = _parse_quad_templates(body, pmap, "DELETE WHERE")
        sol = _select_query(store, f"SELECT * WHERE {{ {body} }}", pmap)
        if all(g is None for *_t, g in quads):
            templates = [(s, p, o) for s, p, o, _ in quads]
            return _delete_rows(store, _instantiate(sol, templates, "DELETE WHERE"))
        _require_graph_col(store, "quad DELETE WHERE")
        return _delete_quad_rows(
            store, _instantiate_quads(sol, quads, "DELETE WHERE")
        )

    # WITH <g>? (DELETE { t })? (INSERT { t })? USING...* WHERE { group }
    with_g = None
    mw = re.match(
        r"\s*WITH\s+(?:<(?P<iri>[^>]*)>|(?P<curie>[\w-]*:[\w./#-]+))"
        r"\s+(?=DELETE\b|INSERT\b)",
        op,
        re.IGNORECASE,
    )
    if mw:
        _require_graph_col(store, "WITH")
        with_g = _gref(mw)
        op = op[mw.end():]
    del_t = _take_braced(op, r"DELETE")
    rest = del_t[1] if del_t else op
    ins_t = _take_braced(rest, r"INSERT")
    rest = ins_t[1] if ins_t else rest
    if del_t or ins_t:
        # USING <g> / USING NAMED <g> clauses between the templates and
        # WHERE — they compile to the query surface's FROM / FROM NAMED
        usings, usings_named = [], []
        while True:
            mu = re.match(
                r"\s*USING\s+(?P<named>NAMED\s+)?"
                r"(?:<(?P<iri>[^>]*)>|(?P<curie>[\w-]*:[\w./#-]+))",
                rest,
                re.IGNORECASE,
            )
            if not mu:
                break
            _require_graph_col(store, "USING")
            (usings_named if mu.group("named") else usings).append(_gref(mu))
            rest = rest[mu.end():]
        w = _take_braced(rest, r"WHERE")
        if not w:
            raise ValueError(
                "DELETE/INSERT operation requires a WHERE { ... } block"
            )
        body, tail = w
        _no_rest(tail, "DELETE/INSERT ... WHERE")
        # dataset for WHERE: USING clauses win; else WITH restricts the
        # default graph to g (spec: USING overrides WITH for matching)
        froms = usings or ([with_g] if with_g and not usings_named else [])
        dataset = " ".join(
            [f"FROM <{g}>" for g in froms]
            + [f"FROM NAMED <{g}>" for g in usings_named]
        )
        # NB: never normalize whitespace on the assembled text — the WHERE
        # body may hold string literals where "two  spaces" is data
        sol = _select_query(store, f"SELECT * {dataset} WHERE {{ {body} }}", pmap)
        if del_t:
            quads = _parse_quad_templates(del_t[0], pmap, "DELETE")
            if all(g is None for *_t, g in quads):
                doomed = _instantiate(
                    sol, [(s, p, o) for s, p, o, _ in quads], "DELETE"
                )
                store = _delete_rows(store, doomed, graph=with_g)
            else:
                # quad template: WITH supplies the graph for the
                # UNSCOPED triples only (GRAPH blocks override it,
                # per §3.1.3); WITH-less unscoped rows delete everywhere
                _require_graph_col(store, "quad DELETE")
                store = _delete_quad_rows(
                    store,
                    _instantiate_quads(sol, quads, "DELETE", default_graph=with_g),
                )
        if ins_t:
            quads = _parse_quad_templates(ins_t[0], pmap, "INSERT")
            # UNSCOPED template triples ALWAYS take the plain path —
            # no-op when the lexical triple is visible anywhere, the
            # module's union contract — whether or not GRAPH blocks sit
            # beside them (review finding: a mixed template silently
            # switched the unscoped rows to per-graph dedup); only the
            # GRAPH-tagged rows go through the per-graph insert
            plain = [(s, p, o) for s, p, o, g in quads if g is None]
            tagged = [q for q in quads if q[3] is not None]
            if plain:
                store = _insert_rows(
                    store,
                    _instantiate(sol, plain, "INSERT"),
                    with_g if with_g is not None else insert_graph,
                    scoped=with_g is not None,
                )
            if tagged:
                _require_graph_col(store, "quad INSERT")
                store = _insert_quad_rows(
                    store, _instantiate_quads(sol, tagged, "INSERT")
                )
        return store

    feat = _UNSUPPORTED_UPDATE.search(_scan_mask(op))
    if feat:
        raise ValueError(
            f"unsupported SPARQL Update feature: {feat.group(1).upper()}"
        )
    raise ValueError(f"cannot parse SPARQL Update operation: {op.strip()[:80]!r}")


_LOAD_FORMATS = {
    "ttl": "turtle", "n3": "turtle", "turtle": "turtle",
    "nt": "ntriples", "nq": "ntriples", "ntriples": "ntriples",
    "rdf": "rdfxml", "owl": "rdfxml", "xml": "rdfxml",
    "json": "jsonld", "jsonld": "jsonld",
}


def _load_document(spark, doc_iri: str) -> DataFrame:
    """Fetch + parse one RDF document for LOAD: hermetic fetch
    (``demo.fetch_file`` — file:// / bare paths only; http(s) raises
    without allow_network, which LOAD never grants), extension-dispatched
    to the real extractors, returning (subj, pred, obj) rows. The
    extractors' quarantine still applies statement-/document-wise; a
    document that yields NOTHING from non-empty content raises so
    non-SILENT LOAD reports garbage instead of silently loading zero
    triples."""
    from graphforge_spark.demo import fetch_file
    from graphforge_spark.operators import extract as _ex

    content = fetch_file(doc_iri)
    ext = doc_iri.rstrip("/").rsplit(".", 1)[-1].lower()
    fmt = _LOAD_FORMATS.get(ext)
    if fmt is None:
        raise ValueError(
            f"unrecognized document extension {ext!r} "
            f"(supported: {sorted(set(_LOAD_FORMATS))})"
        )
    df = spark.createDataFrame(
        [(doc_iri, 0, "tool", content, fmt, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    extractor = {
        "turtle": _ex.extract_turtle,
        "ntriples": _ex.extract_ntriples,
        "rdfxml": _ex.extract_rdfxml,
        "jsonld": _ex.extract_jsonld,
    }[fmt]
    fresh = extractor(df).select("subj", "pred", "obj")
    if content.strip() and fresh.limit(1).count() == 0:
        raise ValueError("document parsed to zero triples (quarantined?)")
    return fresh


def _no_rest(rest: str, what: str) -> None:
    if rest.strip():
        raise ValueError(
            f"unsupported syntax after {what} block: {rest.strip()[:60]!r}"
        )
