"""End-to-end forge pipeline: transcripts → triples → linked, canonical
graph → materialized tables + N-Triples export, resumable per partition.

Reference end-to-end flow (SURVEY §3, entry point 3): directory walk →
freshness gate → per-file triplify → global store dedup → quads.nq
serialize. Spark restatement: one lineage-checkpointed DAG per bucket of
conversations, then global dedup/link/canonicalize stages.

Scale notes (the 1000-executor story):
- extraction parallelism is per conv_id-bucket; buckets are processed in
  one job (Spark schedules tasks), the checkpoint gate only controls
  *restart* granularity — no driver-side loop over rows, ever;
- dedup is one shuffle on (subj,pred,obj,graph) with partial aggregation;
- linking/canonicalization operate on the (much smaller) distinct-surface
  set, with LSH blocking bounding the candidate space;
- exports are embarrassingly parallel text writes.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphforge_spark.functions.hashing import portable_bucket
from graphforge_spark.operators.canonicalize import canonical_mapping, rewrite_triples
from graphforge_spark.operators.extract import (
    dedup_triples,
    ensure_annotation_columns,
    extract_all,
)
from graphforge_spark.operators.link import link_entities
from graphforge_spark.sinks import checkpoint as ckpt
from graphforge_spark.sinks.ntriples import export_ntriples
from graphforge_spark.sinks.tables import read_triples, write_nodes_edges, write_triples_partition

DEFAULT_BUCKETS = 16


def _write_stage_marker(marker_path: str, stage: str) -> None:
    """Record WHICH stage config produced the artifact at a shared path.

    Config-suffixed stage names (entail vs entail_curies, shape
    fingerprints, materialize vs materialize_entailed, link vs
    passthrough) all write to ONE output path per artifact, so the
    checkpoint row alone cannot tell whether the LANDED artifact matches
    this run's config after a toggle-back: A → B → A would find A's
    checkpoint row still valid and silently serve B's data. The marker
    is written AFTER the artifact, so a crash between the two recomputes
    on resume. (On an object store the same one-line metadata file works;
    Iceberg snapshots subsume it.)
    """
    with open(marker_path, "w") as fh:
        fh.write(stage)


def _stage_marker(marker_path: str) -> str | None:
    try:
        with open(marker_path) as fh:
            return fh.read()
    except OSError:
        return None


def _apply_tombstones(spark: SparkSession, warehouse: str, triples: DataFrame) -> DataFrame:
    """Drop triples of retracted conversations at extraction time.

    ``retract_conversations`` records every retracted conv_id in a
    persistent tombstone table; filtering here makes retraction DURABLE:
    a retracted conversation can never (re-)enter the store — not from a
    bucket that crashed in the window between landing data and its
    checkpoint row, not from a source that still contains it, not from a
    later upload. The tombstone set is bounded by retraction volume
    (tiny next to the corpus), so AQE broadcasts the anti-join side.
    """
    tomb_path = os.path.join(warehouse, "retractions")
    if not os.path.exists(tomb_path):
        return triples
    tomb = spark.read.parquet(tomb_path).select("conv_id").distinct()
    return triples.join(tomb, triples.src_conv_id == tomb.conv_id, "left_anti")


_UPDATE_SRC_PREFIX = "urn:graphforge:update:"


def _preserve_update_rows(
    spark: SparkSession, warehouse: str, triples: DataFrame, todo_ids: list[int]
) -> DataFrame:
    """Rows INSERTed by :func:`apply_update` carry a synthetic
    ``urn:graphforge:update:…`` provenance and derive from NO
    conversation, but they live in the same part_id bucket layout. An
    update row can hash into a bucket no conversation has reached yet —
    when a later transcript finally lands there, extraction's dynamic
    partition overwrite of that bucket must carry the update rows
    forward, not silently wipe them. Bounded: update rows only, in the
    to-be-overwritten buckets only; localCheckpoint cuts the
    read-while-overwrite hazard."""
    from graphforge_spark.operators.closure import _ckpt

    if not os.path.exists(os.path.join(warehouse, "triples")):
        return triples
    kept = (
        ensure_annotation_columns(read_triples(spark, warehouse))
        .filter(F.col("part_id").isin(todo_ids))
        .filter(F.col("src_conv_id").startswith(_UPDATE_SRC_PREFIX))
        .drop("part_id")
    )
    return triples.unionByName(_ckpt(kept).select(*triples.columns))


def _overwrite_triples_buckets(
    spark: SparkSession,
    warehouse: str,
    cleaned: DataFrame,
    n_buckets: int,
    affected: list[int],
    run_id: str,
) -> set[int]:
    """Shared post-rewrite machinery for the two administrative mutation
    paths (:func:`retract_conversations`, :func:`apply_update`): land
    ``cleaned`` (caller must have materialized it — the plan reads the
    very partitions the write replaces), refresh Spark's file-listing
    cache, drop partition directories the rewrite emptied (dynamic
    overwrite never touches a partition absent from the written data),
    and append fresh ``extract`` checkpoint rows for the affected buckets
    that were ALREADY complete — marking a pending bucket complete would
    make the next forge() skip extracting it entirely. Returns the set of
    part ids still populated. (On the Iceberg branch this whole helper is
    a DELETE WHERE / MERGE snapshot commit.)"""
    import shutil

    write_triples_partition(cleaned, warehouse, n_buckets)
    spark.catalog.refreshByPath(os.path.join(warehouse, "triples"))
    remaining = {
        r.part_id
        for r in cleaned.select(
            portable_bucket(F.col("src_conv_id"), n_buckets).alias("part_id")
        )
        .distinct()
        .collect()
    }
    for p in affected:
        if p not in remaining:
            shutil.rmtree(
                os.path.join(warehouse, "triples", f"part_id={p}"),
                ignore_errors=True,
            )
    done = {
        r.part_id
        for r in ckpt.completed_parts(spark, warehouse, "extract").collect()
    }
    ckpt.append_checkpoints(
        spark, warehouse, "extract", run_id,
        [(p, 0, 0, 0) for p in sorted(set(affected) & done)],
    )
    return remaining


def forge(
    spark: SparkSession,
    transcripts: DataFrame,
    warehouse: str,
    run_id: str | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    link_threshold: float = 0.60,
    do_link: bool = True,
    sameas: bool = False,
    export_nt: bool = True,
    entail: bool | str = False,
    entail_expand_curies: bool = False,
    shapes: list | None = None,
    graph_stats: bool = False,
    input_fingerprint: str | None = None,
) -> dict:
    """Run (or resume) the full forge. Returns a metrics dict.

    Idempotent: completed buckets are skipped via the checkpoint gate;
    interrupted buckets are overwritten in place (dynamic partition
    overwrite). Running twice == running once — FOR THE SAME INPUT.
    ``input_fingerprint`` lets the caller make that precondition
    checkable: pass any string that identifies the corpus composition
    (source list, format set, sf dir); a mismatch against the landed
    fingerprint invalidates every extract checkpoint and re-extracts,
    instead of silently skipping buckets whose conv ids collide with
    the previous input's.

    Literal fidelity: extraction captures ``@lang``/``^^datatype`` as
    nullable ``obj_lang``/``obj_dt`` columns (distinct annotation =
    distinct quad through dedup, per RDF), they survive linking/
    canonicalization (only IRIs rewrite), survive into the ENTAILED
    graph (asserted rows keep theirs; inferred rows carry NULLs — ρdf
    consequences are IRI-object), feed sh:datatype validation, and the
    N-Quads export emits them. Pre-annotation warehouses resume cleanly
    (columns backfilled NULL).

    Optional KG stages, checkpointed like the others:
    - ``sameas=True`` feeds data-asserted ``owl:sameAs`` triples (CURIE
      or full-IRI spelling) into the canonicalization union-find
      alongside the entity-linking edges — OWL identity semantics
      (eq-sym/eq-trans/eq-rep) via ONE canonical rewrite instead of a
      multiplicative substitution-closure materialization. Literal
      objects never merge; asserted sameAs rows rewrite to canonical
      self-loops and stay (merge provenance). Works with or without
      ``do_link``; the stage name carries the toggle so flips recompute.
    - ``entail=True`` (or ``"rdfs"``) materializes the RDFS closure
      after canonicalization (operators/entailment); ``entail="owl"``
      runs the extended OWL-lite closure (RDFS + inverseOf/symmetric/
      transitive property rules). Asserted rows keep their
      graph/provenance, inferred rows carry NULL provenance and
      ``inferred=True`` (they derive from multiple sources).
      ``entail_expand_curies`` normalizes CURIE predicates first.
      Switching rule sets is a config toggle like any other: the stage
      name and artifact marker carry the mode, so an rdfs→owl flip
      recomputes instead of serving the other mode's landed closure.
      The N-Quads export stays the ASSERTED graph (inferred rows have
      no named graph to serialize into); the node/edge tables
      materialize the full entailed graph.
    - ``shapes=[Shape, ...]`` runs SHACL-lite validation on the final
      graph and lands a ``violations`` table; the metrics dict reports
      ``violations`` so the caller gates (the pipeline itself never
      aborts on data quality — violations are data, not errors).
    - ``graph_stats=True`` lands a ``graph_quality`` table — the
      analytics dashboard over the final graph's IRI-object edges
      (per-node degrees + predicate fan-out, PageRank at 10 rounds /
      1e-4 tolerance, triangle participation) — the hot-entity/skew
      table canonicalization salting decisions read. Like validation,
      it recomputes on extraction-version bumps AND entail-mode flips
      (the dashboard describes the final graph).
    """
    run_id = run_id or uuid.uuid4().hex
    os.makedirs(warehouse, exist_ok=True)

    # ---- input-composition gate ----------------------------------------
    # The per-bucket checkpoint gate resumes THE SAME INPUT: it keys on
    # conv-id buckets, so a changed corpus composition (a format added,
    # a source swapped) whose conv ids hash into already-done buckets
    # would silently no-op. Callers that can describe their input pass a
    # fingerprint; a mismatch against the landed one invalidates every
    # extract checkpoint (full re-extraction; downstream stages recompute
    # via the version bump). Order is crash-safe: checkpoints are
    # deleted FIRST, the marker written after — a crash between the two
    # re-runs the (idempotent) invalidation on the next call.
    if input_fingerprint is not None:
        fp_path = os.path.join(warehouse, "_GF_INPUT")
        landed_fp = _stage_marker(fp_path)
        if landed_fp is not None and landed_fp != input_fingerprint:
            ckpt.delete_checkpoints(spark, warehouse, F.col("stage") != "extract")
        if landed_fp != input_fingerprint:
            _write_stage_marker(fp_path, input_fingerprint)

    # ---- stage 1: extraction, per conv-bucket, resumable --------------
    t0 = time.time()
    with_part = transcripts.withColumn("part_id", portable_bucket(F.col("conv_id"), n_buckets))
    all_parts = with_part.select("part_id").distinct()
    todo = ckpt.pending_parts(spark, warehouse, "extract", all_parts)
    todo_ids = [r.part_id for r in todo.collect()]  # tiny: ≤ n_buckets ints

    if todo_ids:
        pending = with_part.filter(F.col("part_id").isin(todo_ids)).drop("part_id")
        # annotations always on: literal @lang/^^datatype capture costs two
        # mostly-null string columns through one shuffle, and a fixed-on
        # schema avoids the stale-toggle class entirely (an A → B → A
        # config flip can never serve the other config's landed columns)
        triples = _apply_tombstones(
            spark, warehouse, dedup_triples(extract_all(pending, with_annotations=True))
        )
        triples = _preserve_update_rows(spark, warehouse, triples, todo_ids)
        write_triples_partition(triples, warehouse, n_buckets)
        # per-partition metrics (one aggregation pass, no collect loops)
        in_counts = {
            r.part_id: r.n
            for r in with_part.filter(F.col("part_id").isin(todo_ids))
            .groupBy("part_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        out_counts = {
            r.part_id: r.n
            for r in triples.withColumn(
                "part_id", portable_bucket(F.col("src_conv_id"), n_buckets)
            )
            .groupBy("part_id")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        wall_ms = int((time.time() - t0) * 1000)
        ckpt.append_checkpoints(
            spark,
            warehouse,
            "extract",
            run_id,
            [
                (p, in_counts.get(p, 0), out_counts.get(p, 0), wall_ms)
                for p in todo_ids
            ],
        )

    # a warehouse extracted before annotation capture lacks the columns —
    # backfill NULLs so resume keeps working (honest: that data was
    # extracted without annotations)
    triples = ensure_annotation_columns(read_triples(spark, warehouse))

    # Stages 2–3 are global (not per-bucket), so their checkpoint rows use
    # part_id = -1 and carry the EXTRACTION VERSION in the rows_in slot:
    # a stage is current iff a row exists for the present version. The
    # version is the epoch-millis of the newest extract checkpoint (not a
    # row count, which collides after checkpoint-loss reruns), so ANY
    # extraction activity invalidates downstream checkpoints — a crash
    # between stages resumes exactly at the failed stage.
    _newest = (
        ckpt.read_checkpoints(spark, warehouse)
        .filter(F.col("stage") == "extract")
        .agg(F.max("completed_at").alias("m"))
        .collect()[0]
        .m
    )
    extract_version = 0 if _newest is None else int(_newest.timestamp() * 1000)

    def _stage_done(stage: str) -> bool:
        return (
            ckpt.read_checkpoints(spark, warehouse)
            .filter((F.col("stage") == stage) & (F.col("rows_in") == extract_version))
            .limit(1)
            .count()
            > 0
        )

    # ---- stage 2: entity linking + canonicalization (global) ----------
    # sameas=True additionally feeds data-asserted owl:sameAs triples into
    # the SAME union-find (operators/canonicalize.sameas_edges) — OWL
    # identity via one canonical rewrite instead of an eq-rep closure
    # materialization. The stage name carries the toggle so a flip
    # recomputes instead of serving the other config's landed graph.
    stage2 = "link_canonicalize" if do_link else "canonical_passthrough"
    if sameas:
        stage2 += "_sameas"
    canonical_path = os.path.join(warehouse, "triples_canonical")
    canonical_marker = os.path.join(canonical_path, "_GF_STAGE")
    lsh_drops = {"dropped_buckets": 0, "dropped_ids": 0}
    if not (_stage_done(stage2) and _stage_marker(canonical_marker) == stage2):
        t2 = time.time()
        if do_link:
            surfaces = (
                triples.select(F.col("subj").alias("surface"))
                .union(
                    triples.filter(~F.col("obj_is_literal")).select(
                        F.col("obj").alias("surface")
                    )
                )
                .filter(~F.col("surface").startswith("_:"))
                .distinct()
            )
            # counted-drop accounting for the LSH blocking cap: how many
            # hot buckets (and candidate ids) the max_bucket guard
            # excluded — one aggregation to two scalars, no collect loop
            from graphforge_spark.operators.docops import lsh_bucket_stats
            from graphforge_spark.operators.link import surface_banded

            drop_row = (
                lsh_bucket_stats(surface_banded(surfaces), max_bucket=200)
                .filter(F.col("dropped"))
                .agg(
                    F.count("*").alias("nb"),
                    F.coalesce(F.sum("size"), F.lit(0)).alias("ni"),
                )
                .collect()[0]
            )
            lsh_drops = {
                "dropped_buckets": int(drop_row.nb),
                "dropped_ids": int(drop_row.ni),
            }
            alias_edges = link_entities(surfaces, threshold=link_threshold)
        else:
            alias_edges = None
        if sameas:
            from graphforge_spark.operators.canonicalize import sameas_edges

            identity_edges = sameas_edges(triples).select("src", "dst")
            alias_edges = (
                identity_edges
                if alias_edges is None
                else alias_edges.select("src", "dst").union(identity_edges)
            )
        if alias_edges is not None:
            mapping = canonical_mapping(alias_edges)
            canonical = dedup_triples(
                # the asserted sameAs rows themselves rewrite to
                # (canon, sameAs, canon) self-loops — kept: they are the
                # provenance that a merge happened, and dedup collapses
                # each cluster's assertions to one row per source quad
                rewrite_triples(triples, mapping).select(
                    "subj", "pred", "obj", "obj_is_literal", "graph",
                    "src_conv_id", "src_turn_idx", "obj_lang", "obj_dt",
                )
            )
        else:
            canonical = triples
        canonical.write.mode("overwrite").parquet(canonical_path)
        _write_stage_marker(canonical_marker, stage2)
        ckpt.append_checkpoints(
            spark, warehouse, stage2, run_id,
            [(-1, extract_version, 0, int((time.time() - t2) * 1000))],
        )
    canonical = spark.read.parquet(canonical_path)
    graph = canonical

    # ---- stage 2.5 (optional): RDFS entailment materialize -------------
    entail_sfx = ""  # downstream stages must recompute when the MODE flips
    if entail:
        if entail not in (True, "rdfs", "owl"):
            raise ValueError(f"entail must be True, 'rdfs' or 'owl', got {entail!r}")
        owl_mode = entail == "owl"
        entailed_path = os.path.join(warehouse, "triples_entailed")
        entailed_marker = os.path.join(entailed_path, "_GF_STAGE")
        stage_e = ("entail_owl" if owl_mode else "entail") + (
            "_curies" if entail_expand_curies else ""
        )
        entail_sfx = "_" + stage_e
        if not (_stage_done(stage_e) and _stage_marker(entailed_marker) == stage_e):
            te = time.time()
            from graphforge_spark.operators.entailment import (
                owl_closure,
                rdfs_closure,
            )

            closure = (owl_closure if owl_mode else rdfs_closure)(
                canonical.select("subj", "pred", "obj", "obj_is_literal"),
                expand_curies=entail_expand_curies,
            )
            inferred_rows = closure.filter(F.col("inferred")).select(
                "subj", "pred", "obj", "obj_is_literal",
                F.lit(None).cast("string").alias("graph"),
                F.lit(None).cast("string").alias("src_conv_id"),
                F.lit(None).cast("int").alias("src_turn_idx"),
                # inference works on lexical identity; inferred rows have
                # no annotation source (ρdf consequences are IRI-object)
                F.lit(None).cast("string").alias("obj_lang"),
                F.lit(None).cast("string").alias("obj_dt"),
                F.col("inferred"),
            )
            base_cols = [
                "subj", "pred", "obj", "obj_is_literal",
                "graph", "src_conv_id", "src_turn_idx", "obj_lang", "obj_dt",
            ]
            asserted = canonical.select(*base_cols)
            if entail_expand_curies:
                # the closure derives consequences on EXPANDED IRIs; the
                # asserted rows must carry the same spelling, or one
                # predicate splits into two (CURIE + full IRI) that never
                # match in SHACL path lookups or edge-table joins
                from graphforge_spark.functions.terms import expand_curie

                asserted = dedup_triples(
                    # re-dedup: two CURIE spellings of one quad collide
                    # only AFTER expansion (set semantics on the
                    # expanded graph, same rule as the extract stage)
                    asserted.select(
                        expand_curie(F.col("subj")).alias("subj"),
                        expand_curie(F.col("pred")).alias("pred"),
                        F.when(F.col("obj_is_literal"), F.col("obj"))
                        .otherwise(expand_curie(F.col("obj")))
                        .alias("obj"),
                        "obj_is_literal", "graph", "src_conv_id", "src_turn_idx",
                        "obj_lang", "obj_dt",
                    )
                )
            entailed = asserted.withColumn("inferred", F.lit(False)).unionByName(
                inferred_rows
            )
            entailed.write.mode("overwrite").parquet(entailed_path)
            _write_stage_marker(entailed_marker, stage_e)
            ckpt.append_checkpoints(
                spark, warehouse, stage_e, run_id,
                [(-1, extract_version, 0, int((time.time() - te) * 1000))],
            )
        graph = spark.read.parquet(entailed_path)

    # ---- stage 2.75 (optional): SHACL-lite validation -------------------
    n_violations = None
    if shapes:
        import hashlib

        viol_path = os.path.join(warehouse, "violations")
        # changed shapes must invalidate the cached violations table even
        # at an unchanged extraction version — fingerprint them into the
        # stage name (Shape is a frozen dataclass: repr is stable)
        shape_fp = hashlib.md5(
            repr(sorted(repr(sh) for sh in shapes)).encode()
        ).hexdigest()[:12]
        viol_marker = os.path.join(viol_path, "_GF_STAGE")
        # entail_sfx (not a bare "_entailed") so an rdfs→owl flip recomputes
        # the violations over the NEW closure instead of serving stale rows
        stage_v = f"validate_{shape_fp}{entail_sfx}"
        if not (_stage_done(stage_v) and _stage_marker(viol_marker) == stage_v):
            tv = time.time()
            from graphforge_spark.operators.validate import validate_with_handle

            _vcols = ["subj", "pred", "obj", "obj_is_literal"] + [
                c for c in ("obj_lang", "obj_dt") if c in graph.columns
            ]
            violations, _vals = validate_with_handle(graph.select(*_vcols), shapes)
            violations.write.mode("overwrite").parquet(viol_path)
            _write_stage_marker(viol_marker, stage_v)
            _vals.unpersist()
            ckpt.append_checkpoints(
                spark, warehouse, stage_v, run_id,
                [(-1, extract_version, 0, int((time.time() - tv) * 1000))],
            )
        n_violations = spark.read.parquet(viol_path).count()

    # ---- stage 2.9 (optional): graph-quality dashboard -------------------
    n_quality_nodes = None
    if graph_stats:
        quality_path = os.path.join(warehouse, "graph_quality")
        quality_marker = os.path.join(quality_path, "_GF_STAGE")
        # entail_sfx: the dashboard describes the FINAL graph, so an
        # entail toggle/mode flip must recompute it (same rule as stage 3)
        stage_q = f"graph_stats{entail_sfx}"
        if not (_stage_done(stage_q) and _stage_marker(quality_marker) == stage_q):
            tq = time.time()
            from graphforge_spark.operators.graph_metrics import (
                degree_stats,
                pagerank,
                triangle_count,
            )

            edges = graph.filter(~F.col("obj_is_literal")).select(
                F.col("subj").alias("s"), F.col("obj").alias("o")
            )
            quality = (
                degree_stats(graph)
                .join(pagerank(edges, max_iterations=10, tol=1e-4), "node", "left")
                .join(triangle_count(edges), "node", "left")
                .select(
                    "node", "out_degree", "in_degree", "out_preds", "in_preds",
                    F.coalesce("rank", F.lit(0.0)).alias("rank"),
                    F.coalesce("triangles", F.lit(0)).alias("triangles"),
                )
            )
            quality.write.mode("overwrite").parquet(quality_path)
            _write_stage_marker(quality_marker, stage_q)
            ckpt.append_checkpoints(
                spark, warehouse, stage_q, run_id,
                [(-1, extract_version, 0, int((time.time() - tq) * 1000))],
            )
        n_quality_nodes = spark.read.parquet(quality_path).count()

    # ---- stage 3: materialize + export ---------------------------------
    # the stage name carries the graph-config suffix: toggling entail —
    # including flipping the MODE between rdfs and owl — changes WHAT
    # stage 3 materializes, so it must recompute even at an unchanged
    # extraction version
    stage3 = ("materialize_export" if export_nt else "materialize") + entail_sfx
    # nodes/edges/export_nt are separate dirs, so the marker lives at the
    # warehouse root rather than inside any one of them
    mat_marker = os.path.join(warehouse, "_GF_STAGE_materialize")
    if not (_stage_done(stage3) and _stage_marker(mat_marker) == stage3):
        t3 = time.time()
        write_nodes_edges(graph, warehouse)
        if export_nt:
            export_ntriples(
                graph.filter(F.col("graph").isNotNull()) if entail else graph,
                os.path.join(warehouse, "export_nt"),
                with_graph=True,
            )
        else:
            # a stale export from an earlier export_nt=True run no longer
            # matches the landed graph — remove it rather than leave a
            # wrong-config artifact (same class as the marker fix)
            import shutil

            shutil.rmtree(os.path.join(warehouse, "export_nt"), ignore_errors=True)
        _write_stage_marker(mat_marker, stage3)
        ckpt.append_checkpoints(
            spark, warehouse, stage3, run_id,
            [(-1, extract_version, 0, int((time.time() - t3) * 1000))],
        )

    n_triples = graph.count()
    out = {
        "run_id": run_id,
        "buckets_processed": len(todo_ids),
        "triples": n_triples,
        "lsh_dropped_buckets": lsh_drops["dropped_buckets"],
        "lsh_dropped_ids": lsh_drops["dropped_ids"],
        "wall_s": time.time() - t0,
    }
    if n_violations is not None:
        out["violations"] = n_violations
    if n_quality_nodes is not None:
        out["graph_quality_nodes"] = n_quality_nodes
    return out


def retract_conversations(
    spark: SparkSession,
    warehouse: str,
    conv_ids: list[str],
    n_buckets: int = DEFAULT_BUCKETS,
    run_id: str | None = None,
) -> dict:
    """Retract every triple derived from the given conversations — the
    right-to-be-forgotten operation a 10¹²-turn store must support
    without a full rebuild.

    Bucket-granular: the conv ids hash to their part_id buckets (the
    same `portable_bucket` the forge used), ONLY those partitions of the
    triples table are rewritten (dynamic partition overwrite, minus the
    retracted conversations' rows), and fresh `extract` checkpoint rows
    are appended for the touched buckets. The new rows bump the
    extraction version, so link/canonicalize/entail/validate/materialize
    all recompute on the next `forge()` run.

    DURABLE: the conv ids are recorded in a persistent tombstone table
    (``warehouse/retractions``) that `forge()` anti-joins at extraction
    time, so a retracted conversation can never (re-)enter the store —
    not via a bucket that crashed between landing data and its
    checkpoint row, not from a source that still contains it, not from
    a later upload. The tombstones are written FIRST, so even a crash
    mid-retraction leaves the guarantee intact (the partial scrub
    finishes on the next retract or is filtered on the next forge).

    Edge case handled explicitly: a bucket whose every triple came from
    retracted conversations produces ZERO output rows, and dynamic
    overwrite never touches a partition absent from the written data —
    the stale partition directory is removed directly (the Iceberg
    analog is DELETE WHERE, which handles this natively).

    Returns {buckets_rewritten, triples_removed, run_id}.
    """
    run_id = run_id or uuid.uuid4().hex
    if not conv_ids:
        return {"buckets_rewritten": 0, "triples_removed": 0, "run_id": run_id}
    conv_df = spark.createDataFrame([(c,) for c in conv_ids], "conv_id string")
    # tombstone FIRST (see docstring: durability even across a crash here)
    conv_df.write.mode("append").parquet(os.path.join(warehouse, "retractions"))
    affected = [
        r.part_id
        for r in conv_df.select(
            portable_bucket(F.col("conv_id"), n_buckets).alias("part_id")
        )
        .distinct()
        .collect()
    ]
    triples = read_triples(spark, warehouse)
    subset = triples.filter(F.col("part_id").isin(affected))
    n_before = subset.count()
    cleaned = subset.join(
        F.broadcast(conv_df),
        subset.src_conv_id == conv_df.conv_id,
        "left_anti",
    ).drop("part_id")
    # materialize BEFORE overwriting: the cleaned plan reads the very
    # partitions the write replaces — localCheckpoint cuts that
    # read-while-overwrite hazard (bounded: affected buckets only)
    from graphforge_spark.operators.closure import _ckpt

    cleaned = _ckpt(cleaned)
    # A pending bucket's retracted conversations are handled by the
    # tombstone filter when forge eventually extracts it — including the
    # crash window where data landed without a checkpoint row (that
    # bucket re-extracts, and the tombstones keep the retracted
    # conversations out).
    remaining = _overwrite_triples_buckets(
        spark, warehouse, cleaned, n_buckets, affected, run_id
    )
    n_after = read_triples(spark, warehouse).filter(
        F.col("part_id").isin(affected)
    ).count() if (set(affected) & remaining) else 0
    return {
        "buckets_rewritten": len(affected),
        "triples_removed": n_before - n_after,
        "run_id": run_id,
    }


def apply_update(
    spark: SparkSession,
    warehouse: str,
    update: str,
    prefixes: dict[str, str] | None = None,
    n_buckets: int = DEFAULT_BUCKETS,
    run_id: str | None = None,
) -> dict:
    """Apply a SPARQL Update request (plans/update.py grammar) to the
    warehouse's materialized triples table — the administrative mutation
    path beside :func:`retract_conversations` (the reference analog is
    the append-on-upload flow, documentQueryTest.html:362-438, lifted to
    the standard Update grammar).

    Pipeline integration:

    - Inserted rows get a synthetic subject-derived ``src_conv_id``
      (``urn:graphforge:update:<subj>``) so they hash across the bucket
      layout instead of piling into the NULL bucket, and are
      distinguishable from forged rows forever after.
    - The WHOLE table is rewritten (static overwrite): unlike
      retraction, a pattern-driven DELETE can touch any bucket, so
      there is no partition pruning to exploit. Updates are rare
      administrative operations; per-bucket pruning for conv-scoped
      updates is possible but deliberately not special-cased. On the
      Iceberg branch this rewrite would be a snapshot commit (atomic);
      on plain parquet it has the same non-atomic-crash caveat as every
      overwrite in this warehouse.
    - Fresh ``extract`` checkpoint rows are appended for every
      COMPLETED bucket (same policy as retraction: pending buckets are
      never marked done), bumping the extraction version so
      link/canonicalize/entail/validate/materialize recompute on the
      next ``forge()`` run — landed downstream artifacts can never
      serve a pre-update graph.
    - DATA operations are idempotent by construction (INSERT anti-joins
      what is already visible; DELETE of absent rows is a no-op), so
      re-applying a crashed update is safe.

    Returns {triples_before, triples_after, run_id}.
    """
    from graphforge_spark.operators.closure import _ckpt
    from graphforge_spark.plans.update import sparql_update

    run_id = run_id or uuid.uuid4().hex
    store = read_triples(spark, warehouse).drop("part_id")
    updated = sparql_update(store, update, prefixes)
    updated = updated.withColumn(
        "src_conv_id",
        F.coalesce(
            F.col("src_conv_id"),
            F.concat(F.lit(_UPDATE_SRC_PREFIX), F.col("subj")),
        ),
    )
    # materialize BEFORE overwriting — the plan reads the very files the
    # write replaces
    updated = _ckpt(updated)
    n_before = store.count()
    n_after = updated.count()
    # a pattern-driven DELETE can touch any bucket → every bucket is
    # "affected" (static-overwrite semantics for emptied ones)
    _overwrite_triples_buckets(
        spark, warehouse, updated, n_buckets, list(range(n_buckets)), run_id
    )
    return {
        "triples_before": n_before,
        "triples_after": n_after,
        "run_id": run_id,
    }


# join-ordering statistics per (layer path, directory version); entries
# for the same path are evicted on version change, so the cache holds at
# most one TripleStats (vocabulary-sized) per live layer
_STATS_CACHE: dict = {}


def _store_version(path: str) -> float | None:
    """Version token for a layer directory: max mtime of the directory
    and its immediate children (a bucket overwrite touches its
    ``part_id=N`` subdir; a layer rewrite touches the files)."""
    try:
        mt = os.path.getmtime(path)
        with os.scandir(path) as it:
            for e in it:
                mt = max(mt, e.stat().st_mtime)
        return mt
    except OSError:
        return None


def _layer_stats(store, path: str):
    from graphforge_spark.plans.bgp import triple_stats

    key = (path, _store_version(path))
    st = _STATS_CACHE.get(key)
    if st is None:
        st = triple_stats(store)
        for k in [k for k in _STATS_CACHE if k[0] == path]:
            del _STATS_CACHE[k]
        _STATS_CACHE[key] = st
    return st


def query_warehouse(
    spark: SparkSession,
    warehouse: str,
    query: str,
    prefixes: dict[str, str] | None = None,
    layer: str = "auto",
    results_format: str | None = None,
    max_rows: int = 10_000,
    use_stats: bool = True,
    with_annotations: bool | None = None,
):
    """One-call query service over a forged warehouse — the analog of
    the reference's select-project → loadQuadsToStore → executeQuery
    flow (document.js:824-868, :930-985): pick the graph layer, run the
    SPARQL front-end, optionally serialize to a standard result format.

    ``layer``: ``"auto"`` queries the most-derived landed layer
    (entailed ▸ canonical ▸ raw triples — what stage 3 materialized
    from); or pin ``"raw"`` / ``"canonical"`` / ``"entailed"``
    explicitly (pinning a layer that never landed raises — loudly, not
    an empty store). The entailed layer drops its bookkeeping
    ``inferred`` column: SPARQL sees the union graph, per RDF
    entailment regimes.

    ``results_format``: ``None`` → the bindings DataFrame (compose
    further); ``"json"`` / ``"xml"`` / ``"csv"`` / ``"tsv"`` → the
    serialized string (``max_rows``-bounded presentation sinks — ASK
    frames serialize through the boolean forms of json/xml).

    ``with_annotations``: emit the ``{var}__lang``/``{var}__dt``
    companion columns on SELECT bindings (annotation-mode stores only;
    the serializers turn them into ``xml:lang``/``datatype`` per the
    W3C Results specs). Default: on for the wire formats, off for the
    DataFrame return.

    ``use_stats``: compute per-predicate join-ordering statistics for
    the layer (``plans.bgp.triple_stats`` — one vocabulary-bounded
    aggregation pass) and cache them keyed on the layer directory's
    version (max mtime of it and its immediate children — bucket
    overwrites and layer rewrites both touch one), so a long-lived
    endpoint pays the pass once per store version, and every BGP in
    every query gets cardinality-ranked join order.
    """
    paths = {
        "entailed": os.path.join(warehouse, "triples_entailed"),
        "canonical": os.path.join(warehouse, "triples_canonical"),
    }
    if layer == "auto":
        for name in ("entailed", "canonical"):
            if os.path.exists(paths[name]):
                layer = name
                break
        else:
            layer = "raw"
    if layer == "raw":
        store = read_triples(spark, warehouse).drop("part_id")
        store_path = os.path.join(warehouse, "triples")
    elif layer in paths:
        if not os.path.exists(paths[layer]):
            raise ValueError(
                f"layer {layer!r} was never landed in {warehouse!r} "
                f"(run forge with the matching config first)"
            )
        store = spark.read.parquet(paths[layer])
        store_path = paths[layer]
        if "inferred" in store.columns:
            store = store.drop("inferred")
    else:
        raise ValueError(
            f"layer must be 'auto', 'raw', 'canonical' or 'entailed', got {layer!r}"
        )

    from graphforge_spark.plans.sparql import sparql_query

    stats = _layer_stats(store, store_path) if use_stats else None
    if with_annotations is None:
        # wire formats carry literal annotations per the W3C Results
        # specs (xml:lang / datatype on bindings) — emit the companion
        # columns the serializers speak whenever we serialize; a plain
        # DataFrame return keeps the lexical-only schema unless asked
        with_annotations = results_format in ("json", "xml", "csv", "tsv")
    result = sparql_query(
        store, query, prefixes, stats=stats, with_annotations=with_annotations
    )
    if results_format is None:
        return result
    from graphforge_spark.sinks import results as res

    if results_format == "json":
        if result.columns == ["ask"]:
            return res.ask_results_json(result)
        return res.sparql_results_json(result, max_rows)
    if results_format == "xml":
        return res.sparql_results_xml(result, max_rows)
    if results_format == "csv":
        return res.sparql_results_csv(result, max_rows)
    if results_format == "tsv":
        return res.sparql_results_tsv(result, max_rows)
    if results_format == "ntriples":
        # graph-form results only: CONSTRUCT/DESCRIBE emit subj/pred/obj,
        # plus obj_lang/obj_dt on an annotation-mode store; typing
        # re-derives through the engine's single discriminator
        if result.columns not in (
            ["subj", "pred", "obj"],
            ["subj", "pred", "obj", "obj_lang", "obj_dt"],
        ):
            raise ValueError(
                "results_format='ntriples' needs a graph-form result "
                f"(CONSTRUCT/DESCRIBE), got columns {result.columns}"
            )
        from graphforge_spark.functions.terms import is_iri, ntriples_line
        from graphforge_spark.sinks.render import _bounded_rows

        ann = "obj_lang" in result.columns
        lines = result.select(
            ntriples_line(
                F.col("subj"), F.col("pred"), F.col("obj"),
                ~is_iri(F.col("obj")) & ~F.col("obj").startswith("_:"),
                obj_lang=F.col("obj_lang") if ann else None,
                obj_dt=F.col("obj_dt") if ann else None,
            ).alias("line")
        )
        return "".join(
            r.line + "\n" for r in _bounded_rows(lines, max_rows)
        )
    raise ValueError(
        f"results_format must be None, 'json', 'xml', 'csv', 'tsv' or "
        f"'ntriples', got {results_format!r}"
    )
