"""Canonicalization: collapse equivalent identifiers onto one canonical id
via connected components over DataFrame joins.

Reference analog: equivalence expansion (owl:equivalentClass/owl:oneOf →
membership triples, docs/scripts/graphProcessor.js:265-282) plus the
identity rule startsWith('http') (:222). The reference never *merges*
aliases — it only expands equivalence statements — so this operator is the
scale-path generalization mandated by BASELINE.json north_star: union-find
over alias edges (from A11-style rules and the entity-linking stage).

Algorithm: iterative min-label propagation (a DataFrame union-find in the
style of "Connected Components in MapReduce and Beyond" / GraphFrames'
large-star hashing): every vertex repeatedly adopts the minimum label in
its closed neighborhood. Converges in O(diameter) rounds; alias clusters
are near-stars (diameter ≤ ~4), so rounds stay small even at 10^12 turns.

Scale design:
- each round is one shuffle (groupBy vertex, min) — partial aggregation
  makes the min map-side combinable, so hot entities (huge alias clusters)
  do NOT concentrate rows on one reducer for the agg;
- the edge↔label join is the skew point → handled by AQE skew-join split,
  plus an optional explicit salt for the pathological single-hot-key case
  (``salt`` parameter replicates hot labels across ``salt`` buckets);
- ``localCheckpoint`` per round cuts the lineage chain (the classic blowup
  in iterative Spark jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.operators.closure import _ckpt


# owl:sameAs in both the spelling extraction emits for CURIE-prefixed
# sources and the full-IRI spelling serialized RDF carries.
SAMEAS_PREDICATES = (
    "owl:sameAs",
    "http://www.w3.org/2002/07/owl#sameAs",
)


def sameas_edges(
    triples: DataFrame,
    predicates: tuple[str, ...] = SAMEAS_PREDICATES,
) -> DataFrame:
    """Equivalence edges asserted IN the data: ``owl:sameAs`` triples as
    (src, dst) rows for the canonicalization CC.

    This is the scale-correct treatment of OWL identity semantics
    (eq-sym/eq-trans/eq-rep): instead of MATERIALIZING the substitution
    closure — which rewrites every triple once per equivalent spelling
    and explodes multiplicatively with cluster size — the sameAs graph
    feeds the same union-find the entity-linking edges do, and ONE
    canonical representative replaces each cluster everywhere. Symmetry
    and transitivity are exactly what connected components compute;
    eq-rep is the single rewrite pass (``rewrite_triples``).

    Literal objects are never identity-merged: ``X sameAs "text"`` is a
    data error (identity holds between resources), and honoring it would
    let a literal capture an IRI's canonical id. Such rows are simply not
    edges — they stay in the graph as ordinary (quarantinable) triples.
    Blank-node participants ARE merged (that is sameAs's job). One narrow
    filter + projection; the `distinct` rides the CC's own edge dedup.
    """
    return (
        triples.filter(
            F.col("pred").isin(*predicates)
            & ~F.col("obj_is_literal")
            & (F.col("subj") != F.col("obj"))
        )
        .select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_every: int = 1,
    salt: int = 0,
) -> DataFrame:
    """Return (id, component) where component is the lexicographic min
    member id of each connected component — the canonical id.

    ``edges`` is undirected input (each row one equivalence assertion);
    self-loops and duplicates are fine. Runs under
    ``session.fixpoint_shuffle`` (tasks ≈ cores per round — per-round
    dispatch, not straggler amortization, dominates an iterative job).
    """
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(edges.sparkSession):
        return _connected_components_impl(
            edges, src, dst, max_iterations, checkpoint_every, salt
        )


def _connected_components_impl(
    edges: DataFrame,
    src: str,
    dst: str,
    max_iterations: int,
    checkpoint_every: int,
    salt: int,
) -> DataFrame:
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    # Materialize the edge list ONCE: every iteration joins against sym,
    # and without this the edges' full upstream derivation (at curation
    # scale: shingling → LSH banding → Jaccard verification) re-executes
    # per round — O(rounds × upstream) instead of O(upstream + rounds).
    sym = _ckpt(sym)
    # label(v) := min(v, min neighbor) to start
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("component"))
        .select(F.col("a").alias("id"), "component")
    )
    labels = _ckpt(labels)

    from graphforge_spark.functions.skew import salted_join

    for i in range(max_iterations):
        # propagate: candidate label for b is label(a) for every edge (a,b).
        # Edge side is the skewed one (a hub vertex appears in millions of
        # edge rows; labels has exactly one row per vertex) → salt it when
        # requested; AQE skew-split covers the moderate cases.
        joined = (
            salted_join(sym, labels, "a", "id", salt)
            if salt > 1
            else sym.join(labels, sym.a == labels.id, "inner")
        )
        prop = (
            joined.select(F.col("b").alias("id"), F.col("component"))
            .union(labels.select("id", "component"))
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer-jump (path halving): comp(v) := comp(comp(v)). Each round
        # then shortens label chains by ~2×, so convergence is O(log
        # diameter) rounds instead of O(diameter) — and round count is the
        # cost model for iterative Spark jobs (a shuffle per round). The
        # component key grows hot as clusters converge (every member joins
        # on the same component id) → same salting treatment.
        lk = prop.select(F.col("id").alias("_cid"), F.col("component").alias("_cc"))
        prop = (
            salted_join(prop, lk, "component", "_cid", salt, "left")
            if salt > 1
            else prop.join(lk, prop.component == lk._cid, "left")
        ).select("id", F.least("component", "_cc").alias("component"))
        if (i + 1) % checkpoint_every == 0:
            prop = _ckpt(prop)
        # convergence: no vertex changed label
        changed = (
            prop.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = prop
        if changed == 0:
            break
    return labels


def canonical_mapping(edges: DataFrame, salt: int = 0) -> DataFrame:
    """(alias_id → canonical_id) mapping from equivalence edges.

    ``salt`` > 1 turns on explicit key-salting for the two skewed joins
    inside the CC loop (functions/skew.salted_join) — for the
    single-pathological-hot-entity case the north_star calls out; the
    min-label aggregation itself is map-side combinable and needs no
    salting.
    """
    cc = connected_components(edges, salt=salt)
    return cc.select(F.col("id").alias("alias_id"), F.col("component").alias("canonical_id"))


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical mapping (left joins keep
    unmapped terms as-is). Literals are never rewritten.

    Two broadcast-or-shuffle joins; at scale the mapping is usually small
    relative to triples — hint broadcast when it fits.
    """
    m_subj = mapping.select(
        F.col("alias_id").alias("_s_alias"), F.col("canonical_id").alias("_s_canon")
    )
    m_obj = mapping.select(
        F.col("alias_id").alias("_o_alias"), F.col("canonical_id").alias("_o_canon")
    )
    out = (
        triples.join(m_subj, triples.subj == m_subj._s_alias, "left")
        .join(
            m_obj,
            (triples.obj == m_obj._o_alias) & (~triples.obj_is_literal),
            "left",
        )
        .select(
            F.coalesce("_s_canon", "subj").alias("subj"),
            "pred",
            F.coalesce("_o_canon", "obj").alias("obj"),
            "obj_is_literal",
            *[c for c in triples.columns if c not in ("subj", "pred", "obj", "obj_is_literal")],
        )
    )
    return out
