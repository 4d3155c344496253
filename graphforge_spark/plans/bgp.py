"""SPARQL-shaped query surface over the triples DataFrame.

The reference delegates query execution to Comunica
(docs/scripts/queryManager.js:120-122); its app-level query surface is
pinned by its own canned test queries (docs/test HTML/SPARQL.html:241-283)
and defaults (docs/scripts/app.js:100-104). This module reproduces that
surface — B1-B11 in SURVEY §2B — as Catalyst plans:

- BGP multi-pattern conjunction = chain of equi-joins on shared variables
  (Catalyst reorders and picks broadcast vs sort-merge; constants are
  pushed into the scan as filters),
- OPTIONAL = left outer join on the shared variables,
- property paths: alternation = isin filter; ZeroOrMore = closure fixpoint
  (operators/closure.py),
- COUNT/GROUP BY, projection, LIMIT, top-k = native DataFrame ops.

A triple pattern is a 3-tuple (s, p, o) where each slot is either
``Var("name")`` or a constant string.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Var:
    name: str


Term = "Var | str"


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
    return df.select(*cols) if cols else df.select(F.lit(1).alias(f"_m{idx}"))


def bgp(triples: DataFrame, patterns: list[tuple]) -> DataFrame:
    """Conjunction of triple patterns joined on shared variables (B3).

    Duplicate solutions follow SPARQL bag semantics over a set-semantic
    graph (the store is deduplicated at materialize time — A12/B10).
    """
    dfs = [_apply_pattern(triples, pat, i) for i, pat in enumerate(patterns)]

    def join(a: DataFrame, b: DataFrame) -> DataFrame:
        shared = [c for c in a.columns if c in b.columns]
        return a.join(b, shared, "inner") if shared else a.crossJoin(b)

    return reduce(join, dfs)


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
