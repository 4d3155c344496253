"""SPARQL-shaped query surface over the triples DataFrame.

The reference delegates query execution to Comunica
(docs/scripts/queryManager.js:120-122); its app-level query surface is
pinned by its own canned test queries (docs/test HTML/SPARQL.html:241-283)
and defaults (docs/scripts/app.js:100-104). This module reproduces that
surface — B1-B11 in SURVEY §2B — as Catalyst plans:

- BGP multi-pattern conjunction = chain of equi-joins on shared variables
  (constants are pushed into the scan as filters). The JOIN ORDER is
  chosen here, not left to pattern text order: without CBO statistics
  Catalyst keeps the left-deep order it is handed, so at warehouse scale
  a user who writes the unselective pattern first would pay a huge
  intermediate result. ``order_patterns`` greedily picks the most
  selective pattern next — ranked by real per-predicate statistics
  (``triple_stats``, one aggregation pass, vocabulary-bounded) when the
  caller supplies them, else by the classic boundness heuristic (Stocker
  et al., WWW'08: more constant slots ⇒ more selective; subjects bind
  tighter than objects bind tighter than predicates) — while only ever
  picking patterns connected to the already-joined variable set, so a
  reorder can never INTRODUCE a cartesian product the text order avoided.
  Inner equi-joins commute under bag semantics, so results are identical;
  the output column order is normalized to what the text-order join chain
  produced, keeping the reorder invisible to callers.
- OPTIONAL = left outer join on the shared variables,
- property paths: alternation = isin filter; ZeroOrMore = closure fixpoint
  (operators/closure.py),
- COUNT/GROUP BY, projection, LIMIT, top-k = native DataFrame ops.

A triple pattern is a 3-tuple (s, p, o) where each slot is either
``Var("name")`` or a constant string.
"""

from __future__ import annotations

import contextvars
from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Var:
    name: str


Term = "Var | str"


@dataclass(frozen=True)
class TripleStats:
    """Join-ordering statistics for one triples store.

    ``by_pred`` maps each predicate to (row count, distinct subjects,
    distinct objects) — vocabulary-bounded (predicates come from the
    extraction rules / ontology, not the data volume), so holding it on
    the driver and closing over it in planning is safe at any corpus
    size. Distinct counts are HLL approximations: they steer a greedy
    ordering, where ±5% changes nothing."""

    total: int
    ndv_subj: int
    ndv_obj: int
    by_pred: dict  # pred -> (count, ndv_subj, ndv_obj)


def triple_stats(triples: DataFrame) -> TripleStats:
    """ONE aggregation pass over the store (map-side combined; output
    rows = predicate vocabulary). Compute once per store version and
    reuse across queries — the natural cache key is the warehouse layer
    a caller loaded."""
    rows = (
        triples.groupBy("pred")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("subj").alias("ns"),
            F.approx_count_distinct("obj").alias("no"),
        )
        .collect()
    )
    by_pred = {r.pred: (r.n, r.ns, r.no) for r in rows}
    return TripleStats(
        total=sum(n for n, _, _ in by_pred.values()),
        # cheap upper bounds beat another global pass: a var-predicate
        # pattern is near-unselective anyway, exact NDV would not change
        # which pattern a greedy planner picks first
        ndv_subj=max((ns for _, ns, _ in by_pred.values()), default=1),
        ndv_obj=max((no for _, _, no in by_pred.values()), default=1),
        by_pred=by_pred,
    )


# Stats threaded to every bgp() a query compiles to, without widening
# each intermediate compile function: the SPARQL front-end sets this
# around compilation (contextvar = safe under concurrent endpoint
# threads, unlike a bare module global).
ACTIVE_STATS: contextvars.ContextVar = contextvars.ContextVar(
    "graphforge_bgp_stats", default=None
)


def _pattern_vars(pattern: tuple) -> set:
    return {t.name for t in pattern if isinstance(t, Var)}


def _estimate(pattern: tuple, stats: TripleStats | None) -> float:
    """Estimated result cardinality of one pattern scan. Without stats,
    the Stocker boundness rank on the same scale (smaller = more
    selective); with stats, count/NDV independence estimates."""
    s, p, o = pattern
    if stats is None:
        rank = 8.0
        if not isinstance(p, Var):
            rank -= 1  # few distinct predicates: weakest discriminator
        if not isinstance(o, Var):
            rank -= 2
        if not isinstance(s, Var):
            rank -= 4  # subject constants bind tightest
        return rank
    if not isinstance(p, Var):
        # absent predicate -> 0 rows: joining it FIRST empties the plan
        # at the cheapest possible point
        n, ns, no = stats.by_pred.get(p, (0, 1, 1))
        card = float(n)
        if not isinstance(s, Var):
            card /= max(ns, 1)
        if not isinstance(o, Var):
            card /= max(no, 1)
        return card
    card = float(stats.total)
    if not isinstance(s, Var):
        card /= max(stats.ndv_subj, 1)
    if not isinstance(o, Var):
        card /= max(stats.ndv_obj, 1)
    return card


def order_patterns(patterns: list, stats: TripleStats | None = None) -> list:
    """Greedy selective-first join order, never introducing a cross join
    the original order avoided: after the first pick, only patterns
    sharing a variable with the joined set are candidates (falling back
    to all remaining when the BGP is genuinely disconnected — SPARQL's
    cartesian semantics, now with each component kept contiguous).
    Ties break on original position, keeping the order deterministic."""
    if len(patterns) < 2:
        return list(patterns)
    return [patterns[i] for i in _order_indices(patterns, stats)]


def _const_lexical(term: str) -> str:
    """Lexical form of an annotation-ENCODED literal constant
    (``"lex"`` / ``"lex"@tag`` / ``"lex"^^dt`` → unescaped lex); any
    other term passes through. Pure driver-side string work."""
    import re

    m = re.match(r'(?s)^"((?:[^"\\]|\\.)*)"', term)
    if not m:
        return term
    return re.sub(r"\\(.)", r"\1", m.group(1))


def _apply_pattern(triples: DataFrame, pattern: tuple, idx: int) -> DataFrame:
    """One BGP pattern → filtered/renamed scan (B1/B2)."""
    s, p, o = pattern
    df = triples
    cols = []
    for slot, col in ((s, "subj"), (p, "pred"), (o, "obj")):
        if isinstance(slot, Var):
            cols.append(F.col(col).alias(slot.name))
        else:
            df = df.filter(F.col(col) == slot)
            if (
                col == "obj"
                and slot.startswith('"')
                and "_obj_raw" in triples.columns
            ):
                # annotation mode: the encoded-column equality is an
                # expression parquet cannot push; this IMPLIED plain
                # equality on the raw column reaches PushedFilters (and
                # the warehouse's obj bloom filters) — redundant, never
                # wrong (correctness comes from the encoded filter)
                df = df.filter(F.col("_obj_raw") == _const_lexical(slot))
    return df.select(*cols) if cols else df.select(F.lit(1).alias(f"_m{idx}"))


def _order_indices(patterns: list, stats) -> list[int]:
    """Index form of :func:`order_patterns` (same greedy walk)."""
    est = [_estimate(p, stats) for p in patterns]
    remaining = list(range(len(patterns)))
    order: list[int] = []
    bound: set = set()
    while remaining:
        pool = remaining
        if order:
            connected = [i for i in remaining if _pattern_vars(patterns[i]) & bound]
            if connected:
                pool = connected
        pick = min(pool, key=lambda i: (est[i], i))
        order.append(pick)
        remaining.remove(pick)
        bound |= _pattern_vars(patterns[pick])
    return order


def legacy_join_columns(col_lists: list[list[str]]) -> list[str]:
    """Column order a left-deep using-columns join chain produces: join
    keys first (in the left side's order), then left remainder, then
    right remainder — verified against Spark's join(on=[names]) output."""
    out = list(col_lists[0])
    for cols in col_lists[1:]:
        shared = [c for c in out if c in cols]
        out = shared + [c for c in out if c not in shared] + [
            c for c in cols if c not in shared
        ]
    return out


def bgp(triples: DataFrame, patterns: list[tuple], stats: TripleStats | None = None) -> DataFrame:
    """Conjunction of triple patterns joined on shared variables (B3),
    join order chosen by ``order_patterns`` (module docstring): real
    statistics when supplied (or set via ``ACTIVE_STATS``), boundness
    heuristic otherwise. Output columns keep the text-order chain's
    order, so the reorder is invisible to callers.

    Duplicate solutions follow SPARQL bag semantics over a set-semantic
    graph (the store is deduplicated at materialize time — A12/B10).
    """
    if stats is None:
        stats = ACTIVE_STATS.get()
    frames = [_apply_pattern(triples, pat, i) for i, pat in enumerate(patterns)]
    legacy = legacy_join_columns([f.columns for f in frames]) if len(frames) > 1 else None
    order = _order_indices(patterns, stats)

    def join(a: DataFrame, b: DataFrame) -> DataFrame:
        shared = [c for c in a.columns if c in b.columns]
        return a.join(b, shared, "inner") if shared else a.crossJoin(b)

    out = reduce(join, [frames[i] for i in order])
    if legacy is None or len(set(legacy)) != len(legacy):
        # duplicate output names (e.g. ?x p ?x) cannot be re-projected
        # unambiguously; such a frame was never produced by a reorderable
        # plan anyway — return the joined frame as-is
        return out if legacy is None else reduce(join, frames)
    return out.select(*legacy) if out.columns != legacy else out


def optional(base: DataFrame, opt: DataFrame) -> DataFrame:
    """SPARQL OPTIONAL (B4): left outer join on the shared variables,
    null-extending where the optional side has no match."""
    shared = [c for c in base.columns if c in opt.columns]
    return base.join(opt, shared, "left")


def group_count(bindings: DataFrame, group_var: str, count_var: str, alias: str = "count") -> DataFrame:
    """SELECT (COUNT(?x) AS ?count) ?g ... GROUP BY ?g (B7)."""
    return bindings.groupBy(group_var).agg(F.count(count_var).alias(alias))


def top_k(df: DataFrame, order_col: str, k: int, ascending: bool = False) -> DataFrame:
    """ORDER BY ... LIMIT k (B11) — TakeOrderedAndProject, no full sort."""
    col = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    return df.orderBy(col).limit(k)


def select_star_limit(triples: DataFrame, limit: int = 50) -> DataFrame:
    """The app's default query: SELECT * WHERE { ?s ?p ?o } LIMIT 50
    (docs/scripts/app.js:100-104) — B1 + B9."""
    return triples.select(
        F.col("subj").alias("s"), F.col("pred").alias("p"), F.col("obj").alias("o")
    ).limit(limit)
