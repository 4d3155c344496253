"""RDFS entailment materialization — the inference pass a KG pipeline
runs after forging, so queries see the entailed graph without per-query
reasoning. Covers the ρdf rule core (the fragment real triple stores
materialize):

- rdfs5  subPropertyOf transitivity
- rdfs7  (p subPropertyOf q), (x p y)        → (x q y)
- rdfs11 subClassOf transitivity
- rdfs9  (x type C), (C subClassOf D)        → (x type D)
- rdfs2  (p domain C), (x p y)               → (x type C)
- rdfs3  (p range C),  (x p y), y an IRI     → (y type C)

Reference parity note: the reference app ships its graphs to Comunica
un-entailed (no reasoner in docs/scripts/*.js); this operator is a §2C
addition the north_rule's KG-construction framing calls for — the forge
materializes node/edge tables, and a real pipeline materializes the
RDFS consequences next to them.

Evaluation is STRATIFIED one-pass: property-schema closure (rdfs5) →
property inheritance (rdfs7) → type-producing rules (rdfs2/3 on the
rdfs7-extended edges, then rdfs9 over the rdfs11-closed class
hierarchy). For this rule set one pass reaches the fixpoint whenever
the schema is not itself entailed by instance data — the standard
schema-stability assumption. The one case that breaks it (a property
declared subPropertyOf of an RDFS vocabulary term, which would let
instance triples create NEW schema) is detected and refused loudly
rather than silently under-entailed.

Scale shape: the two transitive closures are the log-round doubling
fixpoint from operators/closure.py (round count = log diameter); every
rule is one equi-join keyed on a schema-side column, and schema tables
(subClassOf/subPropertyOf/domain/range edges) are small by construction
— Spark broadcasts them under AQE, so the instance scan dominates and
is touched O(1) times per rule. No Python in any path.

Cited reference files: docs/scripts/graphProcessor.js:203-304 (the
forge this pass consumes), SURVEY.md §2C.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.operators.closure import _ckpt as _ckpt_frame
from graphforge_spark.operators.closure import transitive_closure

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_SUBPROP = "http://www.w3.org/2000/01/rdf-schema#subPropertyOf"
RDFS_DOMAIN = "http://www.w3.org/2000/01/rdf-schema#domain"
RDFS_RANGE = "http://www.w3.org/2000/01/rdf-schema#range"
OWL_INVERSE = "http://www.w3.org/2002/07/owl#inverseOf"
OWL_SYMMETRIC = "http://www.w3.org/2002/07/owl#SymmetricProperty"
OWL_TRANSITIVE = "http://www.w3.org/2002/07/owl#TransitiveProperty"

_SCHEMA_PREDS = [RDF_TYPE, RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE]
_OWL_SCHEMA_PREDS = _SCHEMA_PREDS + [OWL_INVERSE]


def _normalize_triples(triples: DataFrame, expand_curies: bool) -> DataFrame:
    """Shared closure prologue: optional CURIE → full-IRI expansion
    (literal objects exempt — the obj_is_literal guard), obj_is_literal
    backfill for stores lacking the column, and set-semantics dedup on
    the lexical key. Both closures call this so the literal-gated
    expansion rule can never drift between them."""
    if expand_curies:
        from graphforge_spark.functions.terms import expand_curie

        triples = triples.select(
            expand_curie(F.col("subj")).alias("subj"),
            expand_curie(F.col("pred")).alias("pred"),
            F.when(
                F.col("obj_is_literal")
                if "obj_is_literal" in triples.columns
                else F.lit(False),
                F.col("obj"),
            )
            .otherwise(expand_curie(F.col("obj")))
            .alias("obj"),
            *(
                [F.col("obj_is_literal")]
                if "obj_is_literal" in triples.columns
                else []
            ),
        )
    return triples.select(
        "subj",
        "pred",
        "obj",
        *(
            [F.col("obj_is_literal")]
            if "obj_is_literal" in triples.columns
            else [F.lit(False).alias("obj_is_literal")]
        ),
    ).dropDuplicates(["subj", "pred", "obj"])


def _pairs(triples: DataFrame, pred: str) -> DataFrame:
    return triples.filter(F.col("pred") == pred).select(
        F.col("subj").alias("s"), F.col("obj").alias("o")
    )


def rdfs_closure(triples: DataFrame, expand_curies: bool = False) -> DataFrame:
    """Materialize the RDFS closure of a (subj, pred, obj[,
    obj_is_literal]) triples frame: returns the input triples PLUS every
    rdfs2/3/5/7/9/11 consequence, distinct, with an ``inferred`` boolean
    marking the added rows.

    Rule matching is on FULL IRIs; a forged corpus that carries CURIE
    predicates (``rdf:type`` — the pattern forge emits them,
    graphProcessor.js keeps the reference's prefix map separate) should
    pass ``expand_curies=True`` to normalize subj/pred/obj through
    ``functions.terms.expand_curie`` first (codegen literal chain, no
    shuffle). ``obj_is_literal`` (the engine's
    startsWith-'http' discriminator) gates rdfs3 — literals never get a
    type — and every inferred triple carries the correct flag.

    Raises ValueError when a subPropertyOf declaration targets an RDFS
    vocabulary term (see module docstring): that is the one input shape
    where stratified evaluation would silently under-entail."""
    base = _normalize_triples(triples, expand_curies)

    meta = (
        base.filter(
            (F.col("pred") == RDFS_SUBPROP) & F.col("obj").isin(_SCHEMA_PREDS)
        )
        .limit(1)
        .count()
    )
    if meta:
        raise ValueError(
            "rdfs_closure: subPropertyOf into the RDFS vocabulary "
            "(meta-schema entailment) needs fixpoint iteration — "
            "unsupported by the stratified one-pass evaluation"
        )

    # rdfs5: subPropertyOf transitive closure (log-round doubling)
    subprop = transitive_closure(
        _pairs(base, RDFS_SUBPROP), include_zero_step=False
    )
    # rdfs7: property inheritance — every (x p y) also holds for every
    # superproperty q of p. Join keyed on the small schema side.
    inherited = (
        base.filter(~F.col("pred").isin(_SCHEMA_PREDS))
        .join(subprop.withColumnRenamed("s", "pred"), "pred")
        .select(
            "subj",
            F.col("o").alias("pred"),
            "obj",
            "obj_is_literal",
        )
    )
    edges = base.unionByName(
        inherited.select("subj", "pred", "obj", "obj_is_literal")
    ).dropDuplicates(["subj", "pred", "obj"])

    # rdfs2/rdfs3: domain/range typing over the rdfs7-extended edges
    domain = _pairs(base, RDFS_DOMAIN).withColumnRenamed("s", "pred")
    range_ = _pairs(base, RDFS_RANGE).withColumnRenamed("s", "pred")
    typed_dom = (
        edges.filter(~F.col("pred").isin(_SCHEMA_PREDS))
        .join(domain, "pred")
        .select(
            F.col("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.col("o").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
        )
    )
    typed_rng = (
        edges.filter(
            ~F.col("pred").isin(_SCHEMA_PREDS) & ~F.col("obj_is_literal")
        )
        .join(range_, "pred")
        .select(
            F.col("obj").alias("subj"),
            F.lit(RDF_TYPE).alias("pred"),
            F.col("o").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
        )
    )

    # rdfs11: subClassOf transitive closure; rdfs9: type inheritance over
    # ALL types (asserted + domain/range-derived)
    subclass = transitive_closure(
        _pairs(base, RDFS_SUBCLASS), include_zero_step=False
    )
    types = (
        edges.filter(F.col("pred") == RDF_TYPE)
        .select("subj", "obj")
        .unionByName(typed_dom.select("subj", "obj"))
        .unionByName(typed_rng.select("subj", "obj"))
        .dropDuplicates(["subj", "obj"])
    )
    super_types = (
        types.join(subclass.withColumnRenamed("s", "obj"), "obj")
        .select(
            "subj",
            F.lit(RDF_TYPE).alias("pred"),
            F.col("o").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
        )
    )
    # transitive schema consequences are triples too (rdfs5/rdfs11)
    schema_inf = (
        subprop.select(
            F.col("s").alias("subj"),
            F.lit(RDFS_SUBPROP).alias("pred"),
            F.col("o").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
        )
        .unionByName(
            subclass.select(
                F.col("s").alias("subj"),
                F.lit(RDFS_SUBCLASS).alias("pred"),
                F.col("o").alias("obj"),
                F.lit(False).alias("obj_is_literal"),
            )
        )
    )

    inferred = (
        inherited.unionByName(typed_dom)
        .unionByName(typed_rng)
        .unionByName(super_types)
        .unionByName(schema_inf)
        .dropDuplicates(["subj", "pred", "obj"])
        .join(
            base.select("subj", "pred", "obj"),
            ["subj", "pred", "obj"],
            "left_anti",
        )
    )
    return base.withColumn("inferred", F.lit(False)).unionByName(
        inferred.withColumn("inferred", F.lit(True))
    )


def owl_closure(
    triples: DataFrame,
    expand_curies: bool = False,
    max_rounds: int = 10,
) -> DataFrame:
    """RDFS + OWL-lite entailment: the ρdf core of :func:`rdfs_closure`
    plus the OWL RL *property* rules —

    - prp-inv1/inv2  (p owl:inverseOf q), (x p y)           → (y q x)
      (and the inverseOf relation's own symmetry: p inv q → q inv p)
    - prp-symp       (p a owl:SymmetricProperty), (x p y)   → (y p x)
    - prp-trp        (p a owl:TransitiveProperty), (x p y), (y p z)
                                                            → (x p z)

    Output matches :func:`rdfs_closure`: input triples PLUS every
    consequence, distinct, with an ``inferred`` flag on the added rows.

    Evaluation: the edge-producing rules (rdfs7 inheritance, inversion,
    symmetrization, per-predicate transitive closure) feed each other —
    an inverted edge can inherit into a transitive superproperty — so
    they run as an OUTER fixpoint over the instance edges; each round is
    schema-keyed equi-joins (schema sides are tiny → broadcast) plus the
    doubling closure from operators/closure.py restricted per transitive
    predicate via composite struct keys. Outer rounds are bounded by the
    schema's property-dependency chains (not the data), so the loop
    converges in a handful of rounds; ``max_rounds`` without convergence
    raises rather than under-entailing. Typing rules (rdfs2/3/9/11) and
    schema closures then run ONCE over the closed edge set by delegating
    to :func:`rdfs_closure` — over an inheritance-closed edge set its
    one-pass evaluation is exact.

    Stratification guards (all raise ``ValueError`` — the shapes where
    instance data could create NEW schema and silently under-entail):
    meta-schema subPropertyOf (inherited from :func:`rdfs_closure`),
    subPropertyOf/inverseOf edges touching a schema predicate,
    symmetric/transitive declarations ON a schema predicate, and
    subClassOf/domain/range targeting owl:SymmetricProperty /
    owl:TransitiveProperty (rdfs9/2/3 could then mint declarations).

    OWL RL applies these rules to individuals: literal-object edges are
    never inverted, symmetrized, or chained (a literal cannot be a
    subject), but they DO inherit (rdfs7), matching rdfs_closure.

    Reference parity: the reference's only OWL awareness is the
    equivalence expansion A11 (graphProcessor.js:265-282); this operator
    is the §2C materialization pass extended to the OWL property
    vocabulary its .owl sources actually use. The outer fixpoint runs
    under ``session.fixpoint_shuffle`` (tasks ≈ cores per round)."""
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(triples.sparkSession):
        return _owl_closure_impl(triples, expand_curies, max_rounds)


def _owl_closure_impl(
    triples: DataFrame, expand_curies: bool, max_rounds: int
) -> DataFrame:
    base = _normalize_triples(triples, expand_curies)

    bad = (
        base.filter(
            (
                F.col("pred").isin(RDFS_SUBPROP, OWL_INVERSE)
                & (
                    F.col("subj").isin(_OWL_SCHEMA_PREDS)
                    | F.col("obj").isin(_OWL_SCHEMA_PREDS)
                )
            )
            | (
                (F.col("pred") == RDF_TYPE)
                & F.col("obj").isin(OWL_SYMMETRIC, OWL_TRANSITIVE)
                & F.col("subj").isin(_OWL_SCHEMA_PREDS)
            )
            | (
                F.col("pred").isin(RDFS_SUBCLASS, RDFS_DOMAIN, RDFS_RANGE)
                & F.col("obj").isin(OWL_SYMMETRIC, OWL_TRANSITIVE)
            )
        )
        .limit(1)
        .count()
    )
    if bad:
        raise ValueError(
            "owl_closure: schema shape where instance rules could mint "
            "new schema (subPropertyOf/inverseOf touching a schema "
            "predicate, symmetric/transitive declared on a schema "
            "predicate, or subClassOf/domain/range into the OWL "
            "property classes) — stratified evaluation refuses rather "
            "than silently under-entail"
        )

    # Tiny schema relations (read once; guards above make them static).
    subprop = transitive_closure(
        _pairs(base, RDFS_SUBPROP), include_zero_step=False
    )
    # inverseOf relation, symmetric-closed (p inv q ⊨ q inv p); a
    # literal-object inverseOf row is meaningless schema and is ignored
    inv = (
        base.filter((F.col("pred") == OWL_INVERSE) & ~F.col("obj_is_literal"))
        .select(F.col("subj").alias("s"), F.col("obj").alias("o"))
    )
    inv = inv.unionByName(
        inv.select(F.col("o").alias("s"), F.col("s").alias("o"))
    ).distinct()
    sym_props = base.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_SYMMETRIC)
    ).select(F.col("subj").alias("pred")).distinct()
    trans_props = base.filter(
        (F.col("pred") == RDF_TYPE) & (F.col("obj") == OWL_TRANSITIVE)
    ).select(F.col("subj").alias("pred")).distinct()

    edges = _ckpt_frame(
        base.filter(~F.col("pred").isin(_OWL_SCHEMA_PREDS)).select(
            "subj", "pred", "obj", "obj_is_literal"
        )
    )
    for _ in range(max_rounds):
        inherited = edges.join(
            subprop.withColumnRenamed("s", "pred"), "pred"
        ).select("subj", F.col("o").alias("pred"), "obj", "obj_is_literal")
        inverted = (
            edges.filter(~F.col("obj_is_literal"))
            .join(inv.withColumnRenamed("s", "pred"), "pred")
            .select(
                F.col("obj").alias("subj"),
                F.col("o").alias("pred"),
                F.col("subj").alias("obj"),
                F.lit(False).alias("obj_is_literal"),
            )
        )
        symmetrized = (
            edges.filter(~F.col("obj_is_literal"))
            .join(sym_props, "pred", "left_semi")
            .select(
                F.col("obj").alias("subj"),
                "pred",
                F.col("subj").alias("obj"),
                F.lit(False).alias("obj_is_literal"),
            )
        )
        # prp-trp: per-predicate reflexive-free closure; the struct key
        # (pred, node) keeps every chain inside its own predicate while
        # riding the shared doubling fixpoint.
        chained = transitive_closure(
            edges.filter(~F.col("obj_is_literal"))
            .join(trans_props, "pred", "left_semi")
            .select(
                F.struct("pred", F.col("subj").alias("n")).alias("s"),
                F.struct("pred", F.col("obj").alias("n")).alias("o"),
            ),
            include_zero_step=False,
        ).select(
            F.col("s.n").alias("subj"),
            F.col("s.pred").alias("pred"),
            F.col("o.n").alias("obj"),
            F.lit(False).alias("obj_is_literal"),
        )
        fresh = _ckpt_frame(
            inherited.unionByName(inverted)
            .unionByName(symmetrized)
            .unionByName(chained)
            .dropDuplicates(["subj", "pred", "obj"])
            .join(
                edges.select("subj", "pred", "obj"),
                ["subj", "pred", "obj"],
                "left_anti",
            )
        )
        if fresh.limit(1).count() == 0:
            break
        edges = _ckpt_frame(edges.unionByName(fresh))
    else:
        raise ValueError(
            f"owl_closure: edge rules did not converge in {max_rounds} "
            "rounds — raise max_rounds (schema dependency chains are "
            "deeper than expected)"
        )

    # schema rows pass through; the symmetric-closed inverseOf relation
    # is itself entailed triples (q inv p), so it joins the output
    inv_rows = inv.select(
        F.col("s").alias("subj"),
        F.lit(OWL_INVERSE).alias("pred"),
        F.col("o").alias("obj"),
        F.lit(False).alias("obj_is_literal"),
    )
    schema_rows = base.filter(F.col("pred").isin(_OWL_SCHEMA_PREDS)).unionByName(
        inv_rows
    )
    closed = rdfs_closure(
        schema_rows.unionByName(edges).dropDuplicates(["subj", "pred", "obj"])
    ).drop("inferred")
    return closed.join(
        base.select("subj", "pred", "obj").withColumn("_a", F.lit(True)),
        ["subj", "pred", "obj"],
        "left",
    ).select(
        "subj",
        "pred",
        "obj",
        "obj_is_literal",
        F.col("_a").isNull().alias("inferred"),
    )
