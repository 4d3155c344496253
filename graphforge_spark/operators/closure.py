"""Property-path evaluation: alternation and reflexive-transitive closure.

Reference: the property-path test query ``(rdf:type|rdfs:subClassOf)*``
(docs/test HTML/SPARQL.html:256-267), whose evaluation the reference
delegates to Comunica. Here:

- alternation = predicate isin-filter (one scan, pushdown-friendly),
- ZeroOrMore closure = BFS frontier fixpoint over DataFrame self-joins
  with per-round dedup against the reached set and ``localCheckpoint`` to
  cut lineage (SURVEY §4: the one place naive iterative Spark blows up).

Frontier BFS (delta iteration) rather than naive "join the whole closure
with edges each round": each round joins only the *newly discovered*
pairs against the edge set, so total work is O(|closure|) not
O(rounds · |closure|).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The conf toggle below is a session-global read-modify-restore; without a
# lock, two concurrent fixpoint loops on one SparkSession can interleave
# their finallys and restore the conf mid-iteration (non-reentrant).
_CKPT_LOCK = threading.Lock()


def _ckpt(df: DataFrame) -> DataFrame:
    """localCheckpoint with fresh attribute ids, safe under any session.

    Two defenses against Spark's LogicalRDD stats-rewrite bug ("key not
    found: x#N") when checkpointed plans reference earlier checkpointed
    plans: (1) re-project through a cast so attribute ids aren't reused
    across loop iterations; (2) disable constraint propagation around the
    checkpoint call itself — the rewrite crashes resolving constraint
    references to pruned attributes, and the engine cannot assume the
    caller's session (e.g. the evaluation driver's) has the conf set.
    Sessions built by graphforge_spark.session.get_spark already run with
    the conf off; in that case nothing is toggled (no race window), and
    when toggling is needed it happens under a process-wide lock."""
    fresh = df.select([F.col(c).cast(t).alias(c) for c, t in df.dtypes])
    sess = df.sparkSession
    key = "spark.sql.constraintPropagation.enabled"
    if sess.conf.get(key, "true") == "false":
        return fresh.localCheckpoint(eager=True)
    with _CKPT_LOCK:
        old = sess.conf.get(key, "true")
        sess.conf.set(key, "false")
        try:
            return fresh.localCheckpoint(eager=True)
        finally:
            sess.conf.set(key, old)


def path_alternation(triples: DataFrame, preds: list[str]) -> DataFrame:
    """Edges reachable via any of ``preds`` (SPARQL ``p1|p2``)."""
    return triples.filter(F.col("pred").isin(preds)).select(
        F.col("subj").alias("s"), F.col("obj").alias("o")
    )


def transitive_closure(
    edges: DataFrame,
    include_zero_step: bool = True,
    zero_step_nodes: DataFrame | None = None,
    max_iterations: int = 30,
    doubling: bool = True,
) -> DataFrame:
    """Reflexive-transitive closure of (s, o) edges → all (s, o) pairs.

    ``doubling=True`` (default) squares the covered path length each
    round — O(log diameter) rounds — using SMART doubling: the round-k
    frontier (pairs whose minimal distance is in (2^(k-1), 2^k], i.e.
    exactly the pairs the anti-join admitted last round) composes with
    the full closure-so-far. This finds every pair at minimal distance
    d ∈ (2^k, 2^(k+1)]: split d's minimal path after 2^k hops — subpaths
    of a minimal path are minimal, so the prefix pair's minimal distance
    is exactly 2^k ∈ (2^(k-1), 2^k] (frontier) and the suffix is ≤ 2^k
    (closure). Same round count as full closure⋈closure self-join, but
    per-round join work scales with |frontier|, not |closure| — the
    frontier is the dyadic distance band and shrinks once the diameter
    is crossed. Every round of an iterative Spark job is a full shuffle
    + a lineage checkpoint, so at cluster scale round count IS the cost
    model: a depth-1000 hierarchy takes 10 doubling rounds vs 1000
    frontier rounds. ``doubling=False`` keeps the frontier-BFS variant
    (one hop per round, total join work O(|closure|·avg_degree) — the
    better trade when the graph is wide but shallow).

    ``include_zero_step`` adds the SPARQL ZeroOrMore reflexive pairs for
    every node appearing in ``edges`` (or in ``zero_step_nodes`` if given:
    one column ``s``).
    """
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(edges.sparkSession):
        base = edges.select("s", "o").filter(F.col("o").isNotNull()).distinct()
        reached = _ckpt(base)
        frontier = reached

        for _ in range(max_iterations):
            # doubling: frontier (last round's new pairs) composes with the
            # closure-so-far (2^k hops after k rounds — see docstring proof);
            # frontier-BFS: extend the new pairs by one base edge
            step = (
                frontier.alias("f")
                .join(
                    (reached if doubling else base).alias("e"),
                    F.col("f.o") == F.col("e.s"),
                )
                .select(F.col("f.s").alias("s"), F.col("e.o").alias("o"))
                .distinct()
            )
            new = _ckpt(step.join(reached, ["s", "o"], "left_anti"))
            if new.limit(1).count() == 0:
                break
            # `new` is disjoint from `reached` (anti-joined) and both sides are
            # internally distinct, so the union IS the closure-so-far — and both
            # legs are checkpointed leaves, so the union needs NO checkpoint of
            # its own: plan depth grows one union node per round while total
            # materialized state stays O(|closure|), not O(rounds·|closure|)
            # (re-checkpointing the union rewrote the whole closure every round).
            reached = reached.union(new)
            frontier = new

        if include_zero_step:
            if zero_step_nodes is None:
                zero_step_nodes = (
                    base.select(F.col("s"))
                    .union(base.select(F.col("o").alias("s")))
                    .distinct()
                )
            reflexive = zero_step_nodes.select(F.col("s"), F.col("s").alias("o"))
            reached = reached.union(reflexive).distinct()
    return reached


def path_closure(
    triples: DataFrame, preds: list[str], include_zero_step: bool = True
) -> DataFrame:
    """SPARQL ``(p1|p2|...)*``: alternation then reflexive-transitive closure."""
    return transitive_closure(path_alternation(triples, preds), include_zero_step)
