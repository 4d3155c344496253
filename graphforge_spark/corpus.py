"""Deterministic transcript corpora derived from the driver's parquet tables.

The engine's authoritative input shape is the transcripts table from
BASELINE.json ``input_hint``: (conv_id, turn_idx, role, text, tool, ts).
The driver's testdata (/root/testdata/sf*) ships TPC-H-ish tables instead,
so for the oracle-checked correctness gate we *derive* transcripts-shaped
tables from them with pure column algebra — the identical derivation is
expressed in ANSI SQL inside ``__spark_entry__.oracle_sql`` so DuckDB
builds byte-identical turn text. That makes every downstream operator
(extraction, dedup, linking, closure, windowing) checkable end-to-end
against an independent engine, including the per-turn text-equality
invariant (md5(text) compared under stable (conv_id, turn_idx) order).

Three corpora mirror the reference's format dispatch
(docs/scripts/graphProcessor.js:151-163):
- pattern turns  (free text)      ← customer ⋈ nation ⋈ region
- ntriples turns (serialized RDF) ← supplier
- rdfxml turns   (OWL/XML docs)   ← part

All derivations are JVM-side column expressions: no Python, no shuffles
beyond the joins, broadcast-friendly dims (nation/region are tiny).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2024-01-01 00:00:00"
ROLES = ["user", "assistant", "tool", "system"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a frame ONLY when its scan under-splits
    the cluster (fewer partitions than cores), so CPU-heavy narrow work
    downstream (shingling, hashing, vector math) uses every core.

    At production scale a parquet scan yields (bytes / maxPartitionBytes)
    splits — thousands of partitions on a 100 TB table — and this is a
    no-op with zero added shuffle. The condition only fires for small
    inputs (one ~600 KB file = ONE split = one task for the whole narrow
    chain), where the repartition shuffles a few MB to unlock a 32×
    speedup.

    The split estimate for FILE-BACKED frames reads the optimizer's size
    statistic instead of ``df.rdd.getNumPartitions()`` (r3 verdict nit:
    the RDD conversion forces full physical planning per call); non-file
    frames (generated ranges, local relations) keep the exact RDD count —
    a range frame's natural partitioning already equals
    defaultParallelism, and a stats-based guess would mis-add a shuffle
    to the extraction spine."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.inputFiles():
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"))
        digits = "".join(ch for ch in raw if ch.isdigit()) or "134217728"
        max_pb = int(digits)
        if raw.lower().rstrip("b").endswith(("k", "m", "g")):
            max_pb *= {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30}[
                raw.lower().rstrip("b")[-1]
            ]
        # CEILING division: Spark's scan produces ceil(bytes/split)
        # partitions, and a floor estimate of 31 on a 4.2 GB/32-core
        # scan would add a multi-GB shuffle the real partitioning never
        # needed (review finding r4). Approximation stated: file-merge
        # packing (openCostInBytes) can yield slightly fewer actual
        # splits, which errs toward skipping the spread — a bounded
        # perf miss near the boundary, never an added shuffle at scale.
        est_splits = max(1, -(-size // max(max_pb, 1)))
        if est_splits >= target:
            return df
        return df.repartition(target)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def _role(turn_idx):
    return F.element_at(F.array(*[F.lit(r) for r in ROLES]), (turn_idx % 4) + 1)


def _ts(turn_idx):
    return F.to_timestamp(F.lit(BASE_TS)) + F.make_interval(mins=turn_idx)


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-text pattern turns from customer ⋈ nation ⋈ region.

    One turn per customer; text plants exactly one `works at` fact and,
    for nations with n_nationkey % 5 != 0, one `is located in` fact —
    so the expected triple multiset is a closed-form SQL expression.
    """
    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    j = cust.join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey).join(
        F.broadcast(reg), nat.n_regionkey == reg.r_regionkey
    )
    cname = F.replace(F.col("c_name"), F.lit("#"), F.lit("_"))
    turn_idx = F.floor(F.col("c_custkey") / 50).cast("int")
    sentence2 = F.when(
        F.col("n_nationkey") % 5 != 0,
        F.concat(
            F.lit(" "), F.col("n_name"), F.lit(" is located in "), F.col("r_name"), F.lit(".")
        ),
    ).otherwise(F.lit(""))
    return j.select(
        F.format_string("conv-%06d", F.col("c_custkey") % 50).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        _role(turn_idx).alias("role"),
        F.concat(cname, F.lit(" works at "), F.col("n_name"), F.lit("."), sentence2).alias(
            "text"
        ),
        F.lit(None).cast("string").alias("tool"),
        _ts(turn_idx).alias("ts"),
    )


def derive_nt_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-Triples turns from supplier: each turn carries a 2-line serialized
    RDF document (one IRI-object triple, one literal-object triple)."""
    sup = load(spark, sf_dir, "supplier")
    k = F.col("s_suppkey").cast("string")
    turn_idx = F.floor(F.col("s_suppkey") / 10).cast("int")
    subj = F.concat(F.lit("<http://ex.org/e/Supplier_"), k, F.lit(">"))
    line1 = F.concat(
        subj,
        F.lit(" <http://ex.org/p/supplies> <http://ex.org/e/Part_"),
        (F.col("s_suppkey") % 100).cast("string"),
        F.lit("> ."),
    )
    line2 = F.concat(
        subj, F.lit(' <http://ex.org/p/note> "unit '), k, F.lit('"@en .')
    )
    return sup.select(
        F.format_string("nt-%03d", F.col("s_suppkey") % 10).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        _role(turn_idx).alias("role"),
        F.concat(line1, F.lit("\n"), line2).alias("text"),
        F.lit("ntriples").alias("tool"),
        _ts(turn_idx).alias("ts"),
    )


def derive_rdfxml_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDF/XML turns from part: each turn is an owl:Class document
    exercising the DOM-walk extractor's full rule set — literal emission
    under owl:Class, rdf:resource objects, equivalentClass/oneOf member
    expansion (graphProcessor.js:203-304)."""
    part = load(spark, sf_dir, "part")
    k = F.col("p_partkey").cast("string")
    turn_idx = F.floor(F.col("p_partkey") / 20).cast("int")
    class_iri = F.concat(F.lit("http://ex.org/c/Part_"), k)
    brand_iri = F.concat(
        F.lit("http://ex.org/b/"), F.replace(F.col("p_brand"), F.lit("#"), F.lit("_"))
    )
    m0 = F.concat(F.lit("http://ex.org/m/Part_"), k, F.lit("_0"))
    m1 = F.concat(F.lit("http://ex.org/m/Part_"), k, F.lit("_1"))
    xml = F.concat(
        F.lit(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
            'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
            'xmlns:owl="http://www.w3.org/2002/07/owl#">'
            '<owl:Class rdf:about="'
        ),
        class_iri,
        F.lit('"><rdfs:label>'),
        F.col("p_name"),
        F.lit('</rdfs:label><rdfs:subClassOf rdf:resource="'),
        brand_iri,
        F.lit('"/><owl:equivalentClass><owl:Class><owl:oneOf>'),
        F.lit('<rdf:Description rdf:about="'),
        m0,
        F.lit('"/><rdf:Description rdf:about="'),
        m1,
        F.lit('"/></owl:oneOf></owl:Class></owl:equivalentClass></owl:Class></rdf:RDF>'),
    )
    return part.select(
        F.format_string("xml-%04d", F.col("p_partkey") % 20).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        _role(turn_idx).alias("role"),
        xml.alias("text"),
        F.lit("rdfxml").alias("tool"),
        _ts(turn_idx).alias("ts"),
    )


def derive_ttl_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turtle turns from orders: each turn is a Turtle document using
    @prefix, the 'a' keyword, predicate lists (';') and object lists (',')
    — the reference's .ttl path (N3.Parser, graphProcessor.js:151-163)."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("string")
    turn_idx = F.floor(F.col("o_orderkey") / 10).cast("int")
    text = F.concat(
        F.lit("@prefix ex: <http://ex.org/> .\n"),
        F.lit("@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"),
        F.lit("ex:order"), k, F.lit(" a ex:Order ;\n"),
        F.lit("  ex:customer ex:cust"), F.col("o_custkey").cast("string"), F.lit(" ;\n"),
        F.lit('  ex:status "'), F.col("o_orderstatus"), F.lit('"@en , "'),
        F.col("o_orderpriority"), F.lit('" ;\n'),
        F.lit('  ex:seq "'), k, F.lit('"^^xsd:integer .'),
    )
    return orders.select(
        F.format_string("ttl-%03d", F.col("o_orderkey") % 10).alias("conv_id"),
        turn_idx.alias("turn_idx"),
        _role(turn_idx).alias("role"),
        text.alias("text"),
        F.lit("turtle").alias("tool"),
        _ts(turn_idx).alias("ts"),
    )


def derive_all_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-format transcript corpus (free text + N-Triples + RDF/XML
    + Turtle) — ONE definition of the forge's demo input, shared by the
    driver entry, the bench spine, and the spark-submit job so the
    corpora cannot silently drift apart."""
    return (
        derive_transcripts(spark, sf_dir)
        .unionByName(derive_nt_transcripts(spark, sf_dir))
        .unionByName(derive_rdfxml_transcripts(spark, sf_dir))
        .unionByName(derive_ttl_transcripts(spark, sf_dir))
    )


def nation_chain_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain edges over nations: k → k-1 within blocks of 5 — the closure
    fixture (reachability = all same-block descending pairs)."""
    nat = load(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    return nat.filter(k % 5 != 0).select(
        F.concat(F.lit("http://ex.org/n/"), k.cast("string")).alias("s"),
        F.concat(F.lit("http://ex.org/n/"), (k - 1).cast("string")).alias("o"),
    )


def customer_alias_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alias chain edges over customers: k ↔ k+1 within blocks of 5 — the
    connected-components fixture (component = block-min customer)."""
    cust = load(spark, sf_dir, "customer")
    a = cust.select(F.col("c_custkey").alias("ka"), F.col("c_name").alias("na"))
    b = cust.select(F.col("c_custkey").alias("kb"), F.col("c_name").alias("nb"))
    j = a.join(b, (F.col("kb") == F.col("ka") + 1) & (F.col("ka") % 5 != 4))
    iri = lambda c: F.concat(  # noqa: E731
        F.lit("http://ex.org/e/"), F.replace(c, F.lit("#"), F.lit("_"))
    )
    return j.select(iri(F.col("na")).alias("src"), iri(F.col("nb")).alias("dst"))
