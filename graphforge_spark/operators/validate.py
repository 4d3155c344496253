"""SHACL-lite shape validation — the QA gate a KG-construction pipeline
runs over the forged graph before publishing it.

Covers the SHACL core constraint subset that validates structure rather
than values-of-values: per-shape ``targetClass`` focus selection and,
per property path, ``minCount`` / ``maxCount`` cardinality,
``nodeKind`` (IRI / Literal / BlankNode, mapped onto the engine's
``obj_is_literal`` + ``_:`` discriminators — the reference's own typing
rule, graphProcessor.js:222), ``class`` (each value must be rdf:type'd
with the given class), ``pattern`` (regex over literal values), and
``datatype`` (sh:datatype over the store's ``obj_dt``/``obj_lang``
annotation columns: a plain literal's effective datatype is xsd:string,
a language-tagged literal's is rdf:langString, per SHACL; a store
without annotation columns is treated as all-plain).

Reference parity note: GraphForge ships no validator; this operator is
a §2C addition in the north_rule's KG-construction framing — forge,
entail (operators/entailment), then VALIDATE before materializing.

Scale shape — set-based, not per-shape loops: the shape list becomes a
tiny DataFrame broadcast into two joins, so validating 500 shapes costs
the same number of passes over the triple store as validating one:

1. focus selection: one join of the rdf:type slice against shapes on
   target class;
2. value expansion: one LEFT join of focus nodes against the triple
   store on (subj, path) — left so zero-valued focus nodes survive for
   minCount;
3. cardinality: one combinable groupBy(shape, focus) count;
4. class constraint: one left_anti against the rdf:type slice;
   nodeKind/pattern: narrow column predicates on the value rows.

Violations stream out as rows, not exceptions: a 100 TB validation run
lands a violations table the pipeline gates on (`count() == 0` or
per-shape thresholds), never a driver-side assert.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.operators.entailment import RDF_TYPE

# Extraction emits rdf:type both as the full IRI (Turtle/N-Triples paths)
# and as the reference's CURIE surface "rdf:type" (RDF/XML walker) — the
# validator accepts both spellings of the typing predicate.
TYPE_PREDS = (RDF_TYPE, "rdf:type")

NODE_KINDS = ("iri", "literal", "blank")

XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"
RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"


@dataclass(frozen=True)
class Shape:
    """One property shape: focus nodes are instances of ``target_class``;
    constraints apply to their values under the ``path`` predicate.
    ``None`` disables a constraint. ``pattern`` is a Java regex applied
    to LITERAL values only (SHACL's sh:pattern is defined on literals'
    lexical forms; IRIs under a pattern-constrained path are reported as
    nodeKind problems only if node_kind says so)."""

    name: str
    target_class: str
    path: str
    min_count: int = 0
    max_count: int | None = None
    node_kind: str | None = None
    class_constraint: str | None = None
    pattern: str | None = None
    datatype: str | None = None

    def __post_init__(self):
        if self.min_count < 0:
            raise ValueError(f"{self.name}: min_count must be >= 0")
        if self.max_count is not None and self.max_count < self.min_count:
            raise ValueError(f"{self.name}: max_count < min_count")
        if self.node_kind is not None and self.node_kind not in NODE_KINDS:
            raise ValueError(
                f"{self.name}: node_kind must be one of {NODE_KINDS}, "
                f"got {self.node_kind!r}"
            )


def _shapes_df(spark, shapes: list[Shape]) -> DataFrame:
    if not shapes:
        raise ValueError("at least one shape is required")
    names = [s.name for s in shapes]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate shape names: {sorted(names)}")
    return spark.createDataFrame(
        [
            (s.name, s.target_class, s.path, s.min_count, s.max_count,
             s.node_kind, s.class_constraint, s.pattern, s.datatype)
            for s in shapes
        ],
        "shape string, target_class string, path string, min_count int, "
        "max_count int, node_kind string, class_constraint string, "
        "pattern string, datatype string",
    )


def _value_kind():
    """The engine's node-kind discriminator applied to a value row."""
    return (
        F.when(F.col("obj_is_literal"), F.lit("literal"))
        .when(F.col("obj").startswith("_:"), F.lit("blank"))
        .otherwise(F.lit("iri"))
    )


def validate(triples: DataFrame, shapes: list[Shape]) -> DataFrame:
    """Validate the triple store against the shapes. Returns violation
    rows (shape, focus, constraint, value, expected, actual) — empty
    means conformant. ``value`` is NULL for cardinality violations
    (they are about the focus node, not any one value).

    Cache lifetime: the shared value-expansion frame stays persisted so
    the returned (lazy) violations frame can be acted on repeatedly;
    call ``.unpersist()`` on nothing — use `validate_with_handle` when
    a long-lived driver needs to release it, or `conforms` which
    releases it automatically."""
    violations, _ = validate_with_handle(triples, shapes)
    return violations


def validate_with_handle(
    triples: DataFrame, shapes: list[Shape]
) -> tuple[DataFrame, DataFrame]:
    """(violations, cached_expansion) — unpersist the second element
    after consuming the first to release executor storage in long-lived
    drivers (validate()/conforms() per corpus shard would otherwise
    accumulate CacheManager entries)."""
    spark = triples.sparkSession
    sh = F.broadcast(_shapes_df(spark, shapes))

    # distinct: a node typed twice (e.g. once per predicate spelling, or
    # pre-dedup input) must not double its focus row — that would double
    # every cardinality count downstream.
    types = (
        triples.filter(F.col("pred").isin(*TYPE_PREDS))
        .select(F.col("subj").alias("inst"), F.col("obj").alias("cls"))
        .distinct()
    )
    focus = types.join(sh, types.cls == sh.target_class).select(
        "shape", "target_class", "path", "min_count", "max_count",
        "node_kind", "class_constraint", "pattern", "datatype",
        F.col("inst").alias("focus"),
    )

    # a core-schema store (no annotation columns) is all-plain literals:
    # backfill NULLs so the datatype branch sees xsd:string for them
    from graphforge_spark.operators.extract import ensure_annotation_columns

    ann_src = ensure_annotation_columns(triples)

    vals = focus.join(
        ann_src.select(
            F.col("subj").alias("_vs"), F.col("pred").alias("_vp"),
            F.col("obj").alias("obj"), F.col("obj_is_literal").alias("obj_is_literal"),
            F.col("obj_lang").alias("obj_lang"), F.col("obj_dt").alias("obj_dt"),
        ),
        (F.col("focus") == F.col("_vs")) & (F.col("path") == F.col("_vp")),
        "left",
    ).dropDuplicates(
        # RDF graphs are sets: a duplicate triple in pre-dedup input must
        # count ONCE toward cardinality (and violate nodeKind/class/
        # pattern once), mirroring the distinct on the types slice above.
        # Annotations are part of term identity ("a"@en vs "a"@fr are two
        # values), so they join the dedup key — NULLs compare equal here.
        ["shape", "focus", "obj", "obj_is_literal", "obj_lang", "obj_dt"]
    ).persist()  # six violation branches share ONE value expansion —
    # without this each branch re-runs the focus⋈store join (audited:
    # 22 parquet scans → 14, branches read InMemoryTableScan; persist
    # is lazy, so validate stays a single job)

    # ---- cardinality: count values per (shape, focus) -------------------
    counts = vals.groupBy(
        "shape", "focus", "min_count", "max_count"
    ).agg(F.count("obj").alias("n"))
    too_few = counts.filter(F.col("n") < F.col("min_count")).select(
        "shape", "focus", F.lit("minCount").alias("constraint"),
        F.lit(None).cast("string").alias("value"),
        F.col("min_count").cast("string").alias("expected"),
        F.col("n").cast("string").alias("actual"),
    )
    too_many = counts.filter(
        F.col("max_count").isNotNull() & (F.col("n") > F.col("max_count"))
    ).select(
        "shape", "focus", F.lit("maxCount").alias("constraint"),
        F.lit(None).cast("string").alias("value"),
        F.col("max_count").cast("string").alias("expected"),
        F.col("n").cast("string").alias("actual"),
    )

    present = vals.filter(F.col("obj").isNotNull())

    # ---- nodeKind -------------------------------------------------------
    bad_kind = present.filter(
        F.col("node_kind").isNotNull() & (_value_kind() != F.col("node_kind"))
    ).select(
        "shape", "focus", F.lit("nodeKind").alias("constraint"),
        F.col("obj").alias("value"),
        F.col("node_kind").alias("expected"), _value_kind().alias("actual"),
    )

    # ---- class: the value must itself be typed with the class -----------
    class_vals = present.filter(F.col("class_constraint").isNotNull())
    bad_class = class_vals.join(
        types,
        (class_vals.obj == types.inst) & (class_vals.class_constraint == types.cls),
        "left_anti",
    ).select(
        "shape", "focus", F.lit("class").alias("constraint"),
        F.col("obj").alias("value"),
        F.col("class_constraint").alias("expected"),
        F.lit("untyped-or-other").alias("actual"),
    )

    # ---- pattern over literal lexical forms -----------------------------
    bad_pattern = present.filter(
        F.col("pattern").isNotNull()
        & F.col("obj_is_literal")
        & ~F.expr("obj rlike pattern")  # Column-typed regexp needs the SQL form
    ).select(
        "shape", "focus", F.lit("pattern").alias("constraint"),
        F.col("obj").alias("value"),
        F.col("pattern").alias("expected"), F.col("obj").alias("actual"),
    )

    # ---- datatype (sh:datatype over the annotation columns) -------------
    # SHACL effective datatype: non-literal → violation; lang-tagged →
    # rdf:langString; explicit ^^dt → that dt; plain → xsd:string
    effective_dt = (
        F.when(~F.col("obj_is_literal"), F.lit(None).cast("string"))
        .when(F.col("obj_lang").isNotNull(), F.lit(RDF_LANGSTRING))
        .otherwise(F.coalesce(F.col("obj_dt"), F.lit(XSD_STRING)))
    )
    bad_datatype = present.filter(
        F.col("datatype").isNotNull()
        & (
            ~F.col("obj_is_literal")
            | (effective_dt != F.col("datatype"))
        )
    ).select(
        "shape", "focus", F.lit("datatype").alias("constraint"),
        F.col("obj").alias("value"),
        F.col("datatype").alias("expected"),
        F.coalesce(effective_dt, F.lit("non-literal")).alias("actual"),
    )

    violations = too_few.unionByName(too_many).unionByName(bad_kind).unionByName(
        bad_class
    ).unionByName(bad_pattern).unionByName(bad_datatype)
    return violations, vals


def conforms(triples: DataFrame, shapes: list[Shape]) -> bool:
    """SHACL's conforms flag: True when no shape is violated. One
    short-circuit job (limit 1), not a full violation materialize; the
    shared expansion cache is released before returning."""
    violations, vals = validate_with_handle(triples, shapes)
    try:
        return violations.limit(1).count() == 0
    finally:
        vals.unpersist()
