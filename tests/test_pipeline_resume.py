"""Resume/idempotency tests (FIXTURES.md F6; reference analog: mtime
freshness gate graphProcessor.js:36-50 + append-on-upload
documentQueryTest.html:417-430): run, delete half the checkpoints, rerun —
final triples identical, only deleted partitions reprocessed."""

import shutil

import pytest
from pyspark.sql import functions as F

from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.pipeline import forge
from graphforge_spark.sinks import checkpoint as ckpt
from graphforge_spark.sinks.tables import read_triples


@pytest.fixture()
def warehouse(tmp_path):
    wh = str(tmp_path / "wh")
    yield wh
    shutil.rmtree(wh, ignore_errors=True)


@pytest.fixture(scope="module")
def corpus(spark):
    return gen_transcripts(seed=42, n_convs=24, turns_per_conv=8).transcripts_df(spark).cache()


def _triple_set(spark, warehouse):
    df = spark.read.parquet(f"{warehouse}/triples_canonical")
    return {
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.graph)
        for r in df.select("subj", "pred", "obj", "obj_is_literal", "graph").collect()
    }


def test_forge_end_to_end(spark, corpus, warehouse):
    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    assert m["triples"] > 0
    assert m["buckets_processed"] > 0
    # materialized artifacts exist
    assert read_triples(spark, warehouse).count() > 0
    assert spark.read.parquet(f"{warehouse}/nodes").count() > 0
    assert spark.read.text(f"{warehouse}/export_nt").count() == m["triples"]


def test_rerun_is_noop(spark, corpus, warehouse):
    m1 = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    t1 = _triple_set(spark, warehouse)
    m2 = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    assert m2["buckets_processed"] == 0  # checkpoint gate skipped everything
    assert _triple_set(spark, warehouse) == t1


def test_resume_after_partial_checkpoint_loss(spark, corpus, warehouse):
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    t1 = _triple_set(spark, warehouse)
    parts = sorted(
        r.part_id for r in ckpt.completed_parts(spark, warehouse, "extract").collect()
    )
    # drop the checkpoint rows for half the partitions (seeded choice: evens)
    keep = [p for p in parts if p % 2 == 1]
    ckpt.delete_checkpoints(spark, warehouse, F.col("part_id").isin(keep))
    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    # only the deleted partitions were reprocessed
    assert m["buckets_processed"] == len(parts) - len(keep)
    assert _triple_set(spark, warehouse) == t1


def test_forge_with_linking(spark, corpus, warehouse):
    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=True)
    canonical = spark.read.parquet(f"{warehouse}/triples_canonical")
    # canonicalization can only shrink or keep the distinct triple count
    assert canonical.count() <= read_triples(spark, warehouse).count()
    assert m["triples"] == canonical.count()


def _stage_rows(spark, warehouse, stage):
    return (
        ckpt.read_checkpoints(spark, warehouse).filter(F.col("stage") == stage).count()
    )


def test_crash_after_linking_skips_linking_on_rerun(spark, corpus, warehouse):
    """Simulated crash between stage 2 (link/canonicalize) and stage 3
    (materialize/export): rerun must SKIP linking (no new stage-2
    checkpoint row) and only redo materialize; final triples identical."""
    forge(spark, corpus, warehouse, n_buckets=8, do_link=True)
    t1 = _triple_set(spark, warehouse)
    assert _stage_rows(spark, warehouse, "link_canonicalize") == 1
    # crash simulation: stage-3 checkpoint lost + its outputs wiped
    ckpt.delete_checkpoints(spark, warehouse, F.col("stage") != "materialize_export")
    shutil.rmtree(f"{warehouse}/nodes", ignore_errors=True)
    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=True)
    assert m["buckets_processed"] == 0  # extraction untouched
    assert _stage_rows(spark, warehouse, "link_canonicalize") == 1  # NOT rerun
    assert _stage_rows(spark, warehouse, "materialize_export") == 1  # redone
    assert spark.read.parquet(f"{warehouse}/nodes").count() > 0
    assert _triple_set(spark, warehouse) == t1


def test_reextraction_invalidates_downstream_stages(spark, corpus, warehouse):
    """Any extraction activity bumps the version (newest extract
    checkpoint timestamp), forcing stages 2-3 to rerun — a stale
    canonical graph can never survive a re-extraction."""
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    t1 = _triple_set(spark, warehouse)
    # lose some extract checkpoints → rerun re-extracts those buckets
    parts = sorted(
        r.part_id for r in ckpt.completed_parts(spark, warehouse, "extract").collect()
    )
    keep = [p for p in parts if p % 2 == 1]
    ckpt.delete_checkpoints(
        spark, warehouse,
        F.col("part_id").isin(keep) | (F.col("stage") != "extract"),
    )
    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    assert m["buckets_processed"] == len(parts) - len(keep)
    # downstream stages reran against the new extraction version
    assert _stage_rows(spark, warehouse, "canonical_passthrough") == 2
    assert _stage_rows(spark, warehouse, "materialize_export") == 2
    assert _triple_set(spark, warehouse) == t1  # content identical (same input)


def test_forge_with_entailment_and_validation(spark, corpus, warehouse):
    from graphforge_spark.operators.validate import Shape

    shapes = [
        # every typed instance must have exactly one label-ish name —
        # loose enough that the corpus yields SOME violations rows or none,
        # the contract under test is the plumbing, counts pinned below
        Shape("org-name", "http://ex.org/e/Org", "http://ex.org/p/name",
              min_count=1, node_kind="literal"),
    ]
    m = forge(
        spark, corpus, warehouse, n_buckets=8, do_link=False,
        entail=True, entail_expand_curies=True, shapes=shapes,
    )
    assert "violations" in m
    entailed = spark.read.parquet(f"{warehouse}/triples_entailed")
    assert "inferred" in entailed.columns
    asserted = entailed.filter(~F.col("inferred"))
    inferred = entailed.filter(F.col("inferred"))
    # asserted rows keep provenance; inferred rows have none
    assert asserted.filter(F.col("src_conv_id").isNull()).count() == 0
    assert inferred.filter(F.col("src_conv_id").isNotNull()).count() == 0
    viol = spark.read.parquet(f"{warehouse}/violations")
    assert m["violations"] == viol.count()
    # rerun: entail + validate stages are checkpointed no-ops
    m2 = forge(
        spark, corpus, warehouse, n_buckets=8, do_link=False,
        entail=True, entail_expand_curies=True, shapes=shapes,
    )
    assert m2["buckets_processed"] == 0
    assert m2["triples"] == m["triples"]
    assert m2["violations"] == m["violations"]


def test_retract_conversations(spark, corpus, warehouse):
    from graphforge_spark.pipeline import retract_conversations

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    raw_before = read_triples(spark, warehouse)
    victim = raw_before.select("src_conv_id").first().src_conv_id
    n_victim = raw_before.filter(F.col("src_conv_id") == victim).count()
    assert n_victim > 0
    n_raw_before = raw_before.count()

    m = retract_conversations(spark, warehouse, [victim], n_buckets=8)
    assert m["buckets_rewritten"] == 1
    assert m["triples_removed"] == n_victim

    # raw triples table: victim gone, everything else intact
    raw_after = read_triples(spark, warehouse)
    assert raw_after.filter(F.col("src_conv_id") == victim).count() == 0
    assert raw_after.count() == n_raw_before - n_victim

    # next forge run: does NOT re-extract (buckets marked complete),
    # downstream stages recompute without the victim
    m2 = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    assert m2["buckets_processed"] == 0
    canon = spark.read.parquet(f"{warehouse}/triples_canonical")
    assert canon.filter(F.col("src_conv_id") == victim).count() == 0


def test_retract_emptying_a_whole_bucket(spark, corpus, warehouse):
    from graphforge_spark.pipeline import retract_conversations

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    raw = read_triples(spark, warehouse)
    # pick one bucket and retract EVERY conversation in it
    some_part = raw.select("part_id").first().part_id
    convs = [
        r.src_conv_id
        for r in raw.filter(F.col("part_id") == some_part)
        .select("src_conv_id").distinct().collect()
    ]
    m = retract_conversations(spark, warehouse, convs, n_buckets=8)
    assert m["buckets_rewritten"] >= 1
    after = read_triples(spark, warehouse)
    # the emptied bucket's stale partition must be gone, others intact
    assert after.filter(F.col("part_id") == some_part).count() == 0
    assert after.count() > 0
    # empty retraction list is a no-op
    m0 = retract_conversations(spark, warehouse, [], n_buckets=8)
    assert m0 == {"buckets_rewritten": 0, "triples_removed": 0, "run_id": m0["run_id"]}


def test_retract_never_marks_pending_buckets_complete(spark, corpus, warehouse):
    from graphforge_spark.pipeline import retract_conversations

    # forge only SOME buckets by restricting the input, leaving others pending
    some_convs = [r.conv_id for r in corpus.select("conv_id").distinct().limit(6).collect()]
    partial = corpus.filter(F.col("conv_id").isin(some_convs))
    forge(spark, partial, warehouse, n_buckets=8, do_link=False)
    done_before = {
        r.part_id for r in ckpt.completed_parts(spark, warehouse, "extract").collect()
    }
    assert len(done_before) < 8  # some buckets genuinely pending

    # retract HALF the conversations that were never forged (their
    # buckets are pending)
    never_forged = sorted(
        r.conv_id
        for r in corpus.join(partial.select("conv_id"), "conv_id", "left_anti")
        .select("conv_id").distinct().collect()
    )
    assert never_forged
    victims = never_forged[: max(1, len(never_forged) // 2)]
    retract_conversations(spark, warehouse, victims, n_buckets=8)
    done_after = {
        r.part_id for r in ckpt.completed_parts(spark, warehouse, "extract").collect()
    }
    assert done_after == done_before  # no pending bucket was marked complete

    # the full forge still extracts every PENDING bucket (retraction did
    # not poison them) — but retraction is DURABLE: the tombstoned
    # conversations never enter the store even though they still exist
    # in the source, while the other pending conversations land
    # normally. Buckets completed by the partial forge stay complete —
    # the freshness-gate contract: new conversations landing in a
    # completed bucket belong to the streaming/incremental path.
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    from graphforge_spark.functions.hashing import portable_bucket

    expected = (
        {
            r.conv_id
            for r in corpus.select(
                "conv_id", portable_bucket(F.col("conv_id"), 8).alias("b")
            )
            .filter(~F.col("b").isin(list(done_before)))
            .collect()
        }
        | set(some_convs)
    ) - set(victims)
    got = {
        r.src_conv_id
        for r in read_triples(spark, warehouse).select("src_conv_id").distinct().collect()
    }
    assert got == expected


def test_toggling_entail_rematerializes(spark, corpus, warehouse):
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    nodes_plain = spark.read.parquet(f"{warehouse}/nodes").count()
    # same data, entail turned ON: stage 3 must re-run over the closure
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
          entail=True, entail_expand_curies=True)
    nodes_entailed = spark.read.parquet(f"{warehouse}/nodes").count()
    inferred = spark.read.parquet(f"{warehouse}/triples_entailed").filter("inferred").count()
    assert inferred > 0
    assert nodes_entailed >= nodes_plain


def test_toggle_back_recomputes_entailed_table(spark, corpus, warehouse):
    """triples_entailed is ONE path shared by the 'entail' and
    'entail_curies' stage configs; an A → B → A toggle must recompute,
    not serve B's landed table from A's still-valid checkpoint row."""
    kw = dict(n_buckets=8, do_link=False, entail=True)
    forge(spark, corpus, warehouse, entail_expand_curies=True, **kw)
    preds_a = {
        r.pred
        for r in spark.read.parquet(f"{warehouse}/triples_entailed")
        .select("pred").distinct().collect()
    }
    forge(spark, corpus, warehouse, entail_expand_curies=False, **kw)
    preds_b = {
        r.pred
        for r in spark.read.parquet(f"{warehouse}/triples_entailed")
        .select("pred").distinct().collect()
    }
    assert preds_a != preds_b  # the toggle genuinely changes the table
    forge(spark, corpus, warehouse, entail_expand_curies=True, **kw)
    preds_a2 = {
        r.pred
        for r in spark.read.parquet(f"{warehouse}/triples_entailed")
        .select("pred").distinct().collect()
    }
    assert preds_a2 == preds_a


def test_toggling_entail_off_restores_asserted_tables(spark, corpus, warehouse):
    """entail True → False must rematerialize nodes/edges from the
    ASSERTED graph, not leave the entailed tables landed under a
    still-valid 'materialize_export' checkpoint row."""
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    plain = (
        spark.read.parquet(f"{warehouse}/nodes").count(),
        spark.read.parquet(f"{warehouse}/edges").count(),
    )
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
          entail=True, entail_expand_curies=True)
    entailed = (
        spark.read.parquet(f"{warehouse}/nodes").count(),
        spark.read.parquet(f"{warehouse}/edges").count(),
    )
    assert entailed != plain  # sanity: the closure actually differs
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    back = (
        spark.read.parquet(f"{warehouse}/nodes").count(),
        spark.read.parquet(f"{warehouse}/edges").count(),
    )
    assert back == plain


def test_shape_swap_back_recomputes_violations(spark, corpus, warehouse):
    """The violations table path is shared across shape fingerprints;
    swapping back to a previously-run shape set must recompute, not
    serve the other shape set's landed rows."""
    from graphforge_spark.operators.validate import Shape

    s1 = [Shape("co-label", "http://ex.org/c/company",
                "http://www.w3.org/2000/01/rdf-schema#label",
                min_count=1, node_kind="literal")]
    # every company violates s2 (the path does not exist in the corpus)
    s2 = [Shape("co-missing", "http://ex.org/c/company",
                "http://ex.org/p/definitely-absent", min_count=1)]
    kw = dict(n_buckets=8, do_link=False, entail=True, entail_expand_curies=True)
    m1 = forge(spark, corpus, warehouse, shapes=s1, **kw)
    m2 = forge(spark, corpus, warehouse, shapes=s2, **kw)
    assert m2["violations"] > 0  # sanity: s2 genuinely fires
    m3 = forge(spark, corpus, warehouse, shapes=s1, **kw)
    assert m3["violations"] == m1["violations"]
    landed = spark.read.parquet(f"{warehouse}/violations")
    names = {r.shape for r in landed.select("shape").distinct().collect()}
    assert "co-missing" not in names  # s2's rows are gone
    assert landed.count() == m1["violations"]


def test_retract_survives_checkpoint_loss_reextraction(spark, corpus, warehouse):
    """The forge crash window: bucket data landed but its extract
    checkpoint row is missing. Retraction scrubs the landed rows AND
    tombstones the conv ids, so the bucket's re-extraction cannot
    resurrect them even though the source still contains them."""
    from graphforge_spark.pipeline import retract_conversations

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    victim = read_triples(spark, warehouse).select("src_conv_id").first().src_conv_id
    # simulate the window: every extract checkpoint row lost, data landed
    ckpt.delete_checkpoints(spark, warehouse, F.col("stage") != "extract")
    m = retract_conversations(spark, warehouse, [victim], n_buckets=8)
    assert m["triples_removed"] > 0
    # full re-extraction of every bucket from the UNPURGED source
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    raw = read_triples(spark, warehouse)
    assert raw.filter(F.col("src_conv_id") == victim).count() == 0
    canon = spark.read.parquet(f"{warehouse}/triples_canonical")
    assert canon.filter(F.col("src_conv_id") == victim).count() == 0
    # everyone else came back
    assert (
        raw.select("src_conv_id").distinct().count()
        == corpus.select("conv_id").distinct().count() - 1
    )


def test_entailed_union_spelling_consistent(spark, corpus, warehouse):
    """With expand_curies the ASSERTED rows are expanded too — one
    predicate must never appear in both CURIE and full-IRI spellings
    (SHACL path matching and edge joins are exact-string)."""
    from graphforge_spark.functions.terms import DEFAULT_PREFIXES

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
          entail=True, entail_expand_curies=True)
    ent = spark.read.parquet(f"{warehouse}/triples_entailed")
    curie_re = "^(" + "|".join(DEFAULT_PREFIXES) + "):"
    assert ent.filter(F.col("pred").rlike(curie_re)).count() == 0
    assert ent.filter(
        ~F.col("obj_is_literal") & F.col("obj").rlike(curie_re)
    ).count() == 0
    # set semantics survive expansion: two CURIE spellings of one quad
    # collide after expansion and must keep a single copy
    asserted = ent.filter(~F.col("inferred"))
    quad = ["subj", "pred", "obj", "obj_is_literal", "graph"]
    assert asserted.count() == asserted.select(*quad).distinct().count()


def test_export_toggle_off_removes_stale_export(spark, corpus, warehouse):
    """export_nt True → False: the stale export no longer matches the
    landed graph (different stage config) and must not remain as a
    wrong-config artifact."""
    import os

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False, export_nt=True)
    assert os.path.exists(f"{warehouse}/export_nt")
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False, export_nt=False)
    assert not os.path.exists(f"{warehouse}/export_nt")
    # toggling back re-exports
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False, export_nt=True)
    assert spark.read.text(f"{warehouse}/export_nt").count() > 0


def test_forge_annotation_fidelity(spark, warehouse):
    """@lang/^^datatype survive the whole forge: extraction → dedup
    (distinct annotation = distinct quad) → canonicalize passthrough →
    N-Quads export."""
    rows = [
        # same lexical form under two language tags: TWO quads, not one
        ("cA", 0, "tool",
         '@prefix ex: <http://ex.org/> .\n'
         'ex:s ex:label "pizza"@en , "pizza"@it ; ex:n 7 .',
         "turtle", None),
        ("cB", 0, "tool",
         '<http://ex.org/s> <http://ex.org/note> "unit"@en .',
         "ntriples", None),
    ]
    corpus = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    m = forge(spark, corpus, warehouse, n_buckets=4, do_link=False)
    t = read_triples(spark, warehouse)
    assert {"obj_lang", "obj_dt"} <= set(t.columns)
    labels = {
        (r.obj, r.obj_lang)
        for r in t.filter(F.col("pred") == "http://ex.org/label").collect()
    }
    assert labels == {("pizza", "en"), ("pizza", "it")}
    n7 = t.filter(F.col("pred") == "http://ex.org/n").collect()
    assert [(r.obj, r.obj_dt) for r in n7] == [
        ("7", "http://www.w3.org/2001/XMLSchema#integer")
    ]
    export = "\n".join(
        r.value for r in spark.read.text(f"{warehouse}/export_nt").collect()
    )
    assert '"pizza"@en' in export and '"pizza"@it' in export
    assert '"7"^^<http://www.w3.org/2001/XMLSchema#integer>' in export
    assert m["triples"] == t.count()


def test_forge_resumes_pre_annotation_warehouse(spark, corpus, warehouse):
    """A warehouse landed before annotation capture (no obj_lang/obj_dt
    columns) must resume cleanly: the columns backfill as NULL instead of
    crashing stage 2's select."""
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    t1 = _triple_set(spark, warehouse)
    # simulate the old layout: rewrite the triples table minus the columns
    old = read_triples(spark, warehouse).drop("obj_lang", "obj_dt").cache()
    old.count()
    old.write.mode("overwrite").parquet(f"{warehouse}/triples")
    # deleting the stage-2 checkpoint row forces it to recompute from the
    # stripped table (same config, so the canonical set must round-trip);
    # delete_checkpoints takes a KEEP predicate
    ckpt.delete_checkpoints(spark, warehouse, F.col("stage") != "canonical_passthrough")
    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    assert m["buckets_processed"] == 0  # extraction stayed checkpointed
    canonical = spark.read.parquet(f"{warehouse}/triples_canonical")
    assert {"obj_lang", "obj_dt"} <= set(canonical.columns)
    assert canonical.filter(F.col("obj_lang").isNotNull()).count() == 0
    assert _triple_set(spark, warehouse) == t1


def test_forge_entail_and_validate_keep_annotations(spark, warehouse):
    """Entail mode keeps asserted-row annotations (inferred rows NULL) and
    the pipeline's validation stage sees them: a datatype shape catches a
    planted wrong-datatype literal end to end."""
    from graphforge_spark.operators.validate import Shape

    X = "http://www.w3.org/2001/XMLSchema#"
    ttl = (
        "@prefix ex: <http://ex.org/> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "ex:Emp rdfs:subClassOf ex:Agent .\n"
        "ex:a a ex:Emp ; ex:age \"41\"^^xsd:integer .\n"
        "ex:b a ex:Emp ; ex:age \"young\"@en .\n"
    )
    corpus = spark.createDataFrame(
        [("c0", 0, "tool", ttl, "turtle", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    m = forge(
        spark, corpus, warehouse, n_buckets=2, do_link=False,
        entail=True, entail_expand_curies=True,
        shapes=[Shape("age_int", "http://ex.org/Emp", "http://ex.org/age",
                      datatype=X + "integer")],
    )
    entailed = spark.read.parquet(f"{warehouse}/triples_entailed")
    assert {"obj_lang", "obj_dt"} <= set(entailed.columns)
    kept = {
        (r.obj, r.obj_lang, r.obj_dt)
        for r in entailed.filter(
            F.col("pred") == "http://ex.org/age"
        ).collect()
    }
    assert kept == {("41", None, X + "integer"), ("young", "en", None)}
    # rdfs:subClassOf fired: ex:a is inferred an Agent, with NULL annotations
    inferred = entailed.filter(F.col("inferred"))
    assert inferred.count() > 0
    assert inferred.filter(F.col("obj_lang").isNotNull()).count() == 0
    # the validation stage saw the annotations: "young"@en is rdf:langString
    viol = spark.read.parquet(f"{warehouse}/violations")
    rows = [(r.focus, r.constraint, r.value) for r in viol.collect()]
    assert rows == [("http://ex.org/b", "datatype", "young")]
    assert m["violations"] == 1


def test_input_fingerprint_invalidates_extraction(spark, corpus, warehouse):
    """A resumed warehouse built from a DIFFERENT corpus composition must
    re-extract (the bucket checkpoint gate alone would silently no-op
    when the new input's conv ids hash into already-done buckets)."""
    m1 = forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
               input_fingerprint="three-format:v1")
    assert m1["buckets_processed"] > 0
    # same input, same fingerprint: full no-op resume
    m2 = forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
               input_fingerprint="three-format:v1")
    assert m2["buckets_processed"] == 0
    # changed composition: one extra turtle turn whose conv id collides
    # with an already-checkpointed bucket
    extra = spark.createDataFrame(
        [(corpus.select("conv_id").first().conv_id, 999, "tool",
          '@prefix ex: <http://ex.org/> .\nex:new ex:marker "added"@en .',
          "turtle", None)],
        corpus.schema,
    )
    grown = corpus.unionByName(extra)
    m3 = forge(spark, grown, warehouse, n_buckets=8, do_link=False,
               input_fingerprint="four-format:v1")
    assert m3["buckets_processed"] == m1["buckets_processed"]  # full re-extract
    t = read_triples(spark, warehouse)
    assert t.filter(F.col("subj") == "http://ex.org/new").count() == 1
    # and the no-op property holds again under the NEW fingerprint
    m4 = forge(spark, grown, warehouse, n_buckets=8, do_link=False,
               input_fingerprint="four-format:v1")
    assert m4["buckets_processed"] == 0


def test_entail_owl_mode_toggle_and_conservativity(spark, corpus, warehouse):
    """entail='owl' is a distinct stage config: an rdfs→owl flip must
    recompute the entailed table (marker mismatch), never serve the rdfs
    closure under the owl flag. And over a corpus with NO OWL property
    vocabulary the OWL closure must equal the RDFS closure exactly
    (conservativity of the added rules)."""
    kw = dict(n_buckets=8, do_link=False, entail_expand_curies=True)
    forge(spark, corpus, warehouse, entail=True, **kw)
    rdfs_set = {
        (r.subj, r.pred, r.obj, r.inferred)
        for r in spark.read.parquet(f"{warehouse}/triples_entailed").collect()
    }
    marker_rdfs = open(f"{warehouse}/triples_entailed/_GF_STAGE").read()
    forge(spark, corpus, warehouse, entail="owl", **kw)
    marker_owl = open(f"{warehouse}/triples_entailed/_GF_STAGE").read()
    assert marker_rdfs != marker_owl  # genuinely recomputed under the owl config
    owl_set = {
        (r.subj, r.pred, r.obj, r.inferred)
        for r in spark.read.parquet(f"{warehouse}/triples_entailed").collect()
    }
    assert owl_set == rdfs_set  # no OWL vocab in the corpus → same closure


def test_entail_mode_flip_rematerializes_stage3(spark, warehouse):
    """Stage 3 (nodes/edges/export) keys on the entail MODE, not a bare
    '_entailed' flag: over a corpus where the OWL closure genuinely adds
    edges (a symmetric property), an rdfs→owl flip must rematerialize the
    edges table, never serve the RDFS-closure artifact under a still-valid
    checkpoint row."""
    ttl = (
        "@prefix ex: <http://ex.org/> .\n"
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "ex:knows a owl:SymmetricProperty .\n"
        "ex:a ex:knows ex:b .\n"
    )
    corpus = spark.createDataFrame(
        [("c0", 0, "tool", ttl, "turtle", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    kw = dict(n_buckets=2, do_link=False, entail_expand_curies=True)
    forge(spark, corpus, warehouse, entail="rdfs", **kw)
    edges_rdfs = spark.read.parquet(f"{warehouse}/edges").count()
    forge(spark, corpus, warehouse, entail="owl", **kw)
    edges_owl = spark.read.parquet(f"{warehouse}/edges").count()
    assert edges_owl > edges_rdfs  # the symmetric inverse edge landed
    # and flipping back restores the RDFS artifact
    forge(spark, corpus, warehouse, entail="rdfs", **kw)
    assert spark.read.parquet(f"{warehouse}/edges").count() == edges_rdfs


def test_entail_rejects_unknown_mode(spark, corpus, warehouse):
    with pytest.raises(ValueError, match="entail must be"):
        forge(spark, corpus, warehouse, n_buckets=8, do_link=False, entail="owl2")


def test_apply_update_mutates_warehouse_and_invalidates_downstream(
    spark, corpus, warehouse
):
    from graphforge_spark.pipeline import apply_update

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)

    def store_set():
        return {
            (r.subj, r.pred, r.obj)
            for r in read_triples(spark, warehouse)
            .select("subj", "pred", "obj")
            .collect()
        }

    before = store_set()
    victim = sorted(t for t in before if t[2].startswith("http"))[0]
    m = apply_update(
        spark,
        warehouse,
        f"""
        INSERT DATA {{ <http://ex.org/upd> <http://ex.org/p> "v" }} ;
        DELETE DATA {{ <{victim[0]}> <{victim[1]}> <{victim[2]}> }}
        """,
    )
    after = store_set()
    assert after == ((before - {victim}) | {("http://ex.org/upd", "http://ex.org/p", "v")})
    # triples_after counts store ROWS (quads keep per-graph variants),
    # not distinct (s,p,o)
    assert m["triples_after"] == read_triples(spark, warehouse).count()
    # re-applying the same update is a no-op (DATA ops are idempotent)
    m2 = apply_update(
        spark,
        warehouse,
        'INSERT DATA { <http://ex.org/upd> <http://ex.org/p> "v" }',
    )
    assert m2["triples_after"] == m2["triples_before"]
    # the inserted row's synthetic provenance spreads it across buckets
    src = read_triples(spark, warehouse).filter("subj = 'http://ex.org/upd'").collect()[0]
    assert src.src_conv_id == "urn:graphforge:update:http://ex.org/upd"
    # downstream stages recompute on the next forge and SEE the update
    n_stage2_before = _stage_rows(spark, warehouse, "canonical_passthrough")
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    assert _stage_rows(spark, warehouse, "canonical_passthrough") > n_stage2_before
    canonical = spark.read.parquet(f"{warehouse}/triples_canonical")
    assert canonical.filter("subj = 'http://ex.org/upd'").count() == 1
    assert canonical.filter(
        f"subj = '{victim[0]}' and pred = '{victim[1]}' and obj = '{victim[2]}'"
    ).count() == 0


def test_update_insert_survives_extraction_of_its_bucket(
    spark, corpus, warehouse
):
    """An INSERTed row can hash into a bucket NO conversation has reached
    yet; when a later transcript finally lands in that bucket, the
    extraction overwrite must carry the update row forward, not wipe it."""
    from graphforge_spark.functions.hashing import portable_bucket
    from graphforge_spark.pipeline import apply_update

    subj = "http://ex.org/pending-upd"
    target = (
        spark.createDataFrame([(f"urn:graphforge:update:{subj}",)], "k string")
        .select(portable_bucket(F.col("k"), 8).alias("b"))
        .collect()[0]
        .b
    )
    # forge WITHOUT the conversations of the target bucket → that bucket
    # has no extract checkpoint and no partition directory
    withb = corpus.withColumn("b", portable_bucket(F.col("conv_id"), 8))
    assert withb.filter(F.col("b") == target).count() > 0  # flip exists
    forge(spark, withb.filter(F.col("b") != target).drop("b"),
          warehouse, n_buckets=8, do_link=False)
    apply_update(
        spark, warehouse,
        f'INSERT DATA {{ <{subj}> <http://ex.org/p> "v" }}',
    )
    assert read_triples(spark, warehouse).filter(
        F.col("subj") == subj
    ).count() == 1
    # the full corpus now reaches the target bucket → extraction
    # overwrites its partition — the update row must survive
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    landed = read_triples(spark, warehouse)
    assert landed.filter(F.col("subj") == subj).count() == 1
    # and the newly-extracted conversations landed too
    new_convs = {
        r.conv_id for r in withb.filter(F.col("b") == target).collect()
    }
    got = {
        r.src_conv_id
        for r in landed.select("src_conv_id").distinct().collect()
    }
    assert new_convs <= got


def test_graph_stats_stage(spark, corpus, warehouse):
    import os
    import math

    m = forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
              graph_stats=True)
    q = spark.read.parquet(f"{warehouse}/graph_quality")
    assert m["graph_quality_nodes"] == q.count() > 0
    assert set(q.columns) == {
        "node", "out_degree", "in_degree", "out_preds", "in_preds",
        "rank", "triangles",
    }
    # PageRank mass is conserved over the dashboard's node set
    assert math.isclose(q.agg(F.sum("rank")).collect()[0][0], 1.0, rel_tol=1e-6)
    # resume: the stage is checkpointed — rerun must not rewrite the table
    mtime = os.path.getmtime(f"{warehouse}/graph_quality/_GF_STAGE")
    m2 = forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
               graph_stats=True)
    assert os.path.getmtime(f"{warehouse}/graph_quality/_GF_STAGE") == mtime
    assert m2["graph_quality_nodes"] == m["graph_quality_nodes"]
    # entail flip changes the FINAL graph → dashboard recomputes
    forge(spark, corpus, warehouse, n_buckets=8, do_link=False,
          graph_stats=True, entail=True)
    assert os.path.getmtime(f"{warehouse}/graph_quality/_GF_STAGE") != mtime


def test_query_warehouse(spark, corpus, warehouse):
    import json

    from graphforge_spark.pipeline import query_warehouse

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    # auto resolves to the canonical layer; result is a live DataFrame
    df = query_warehouse(
        spark, warehouse,
        "SELECT ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p",
    )
    assert df.count() > 0
    # serialized forms work end to end, ASK included
    doc = json.loads(query_warehouse(
        spark, warehouse, "ASK { ?s ?p ?o }", results_format="json"))
    assert doc == {"head": {}, "boolean": True}
    csv_text = query_warehouse(
        spark, warehouse, "SELECT ?p WHERE { ?s ?p ?o } LIMIT 3",
        results_format="csv")
    assert csv_text.splitlines()[0] == "p"
    # pinning a never-landed layer raises loudly
    with pytest.raises(ValueError, match="never landed"):
        query_warehouse(spark, warehouse, "ASK { ?s ?p ?o }", layer="entailed")
    # raw layer works straight off the triples table
    assert query_warehouse(
        spark, warehouse, "ASK { ?s ?p ?o }", layer="raw"
    ).collect()[0].ask


def test_query_warehouse_construct_ntriples(spark, corpus, warehouse):
    from graphforge_spark.pipeline import query_warehouse

    forge(spark, corpus, warehouse, n_buckets=8, do_link=False)
    nt = query_warehouse(
        spark, warehouse,
        "CONSTRUCT { ?s <http://ex.org/p/rel> ?o } "
        "WHERE { ?s ?p ?o FILTER(!isLiteral(?o)) } LIMIT 5",
        results_format="ntriples",
    )
    lines = [l for l in nt.splitlines() if l]
    assert 0 < len(lines) <= 5
    for l in lines:
        assert l.endswith(" .")
        assert " <http://ex.org/p/rel> " in l
        assert l.startswith("<") or l.startswith("_:")
    # bindings results refuse the graph serialization loudly
    with pytest.raises(ValueError, match="graph-form"):
        query_warehouse(spark, warehouse,
                        "SELECT ?s WHERE { ?s ?p ?o } LIMIT 1",
                        results_format="ntriples")


def test_forge_sameas_canonicalization(spark, warehouse):
    """forge(sameas=True): data-asserted owl:sameAs merges identities in
    the canonical graph; the toggle is a config like entail — flipping it
    recomputes stage 2 instead of serving the other config's graph."""
    rows = [
        ("cS", 0, "tool",
         "<http://ex.org/alice> <http://www.w3.org/2002/07/owl#sameAs> "
         "<http://ex.org/a-lice> .\n"
         "<http://ex.org/a-lice> <http://ex.org/role> \"admin\" .\n"
         "<http://ex.org/alice> <http://ex.org/age> \"30\" .",
         "ntriples", None),
    ]
    corpus = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    # without sameas: two distinct subjects
    forge(spark, corpus, warehouse, n_buckets=4, do_link=False)
    subj0 = {
        r.subj for r in spark.read.parquet(f"{warehouse}/triples_canonical")
        .select("subj").distinct().collect()
    }
    assert {"http://ex.org/alice", "http://ex.org/a-lice"} <= subj0

    # toggle ON: same warehouse, stage 2 must recompute and merge
    forge(spark, corpus, warehouse, n_buckets=4, do_link=False, sameas=True)
    canon = spark.read.parquet(f"{warehouse}/triples_canonical")
    subj1 = {r.subj for r in canon.select("subj").distinct().collect()}
    # canonical id is the lexicographic min of the cluster: "a-lice"
    assert "http://ex.org/alice" not in subj1
    facts = {
        (r.subj, r.pred, r.obj)
        for r in canon.filter(F.col("pred").startswith("http://ex.org/")).collect()
    }
    # both facts now hang off the canonical id (min of the cluster)
    assert ("http://ex.org/alice" not in {s for s, _, _ in facts})
    assert ("http://ex.org/a-lice", "http://ex.org/role", "admin") in facts
    assert ("http://ex.org/a-lice", "http://ex.org/age", "30") in facts

    # toggle OFF again: the split graph comes back (no stale serve)
    forge(spark, corpus, warehouse, n_buckets=4, do_link=False, sameas=False)
    subj2 = {
        r.subj for r in spark.read.parquet(f"{warehouse}/triples_canonical")
        .select("subj").distinct().collect()
    }
    assert {"http://ex.org/alice", "http://ex.org/a-lice"} <= subj2
