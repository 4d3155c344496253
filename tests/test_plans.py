"""Physical-plan regression tests — lock in the properties PLANS.md
claims: dimension broadcasts, parquet filter pushdown, column pruning,
no shuffle before dedup, candidate-side broadcast in jaccard."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from graphforge_spark import corpus

SF = "/root/testdata/sf0.001"


def _plan(df, mode="formatted"):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_derive_transcripts_broadcasts_dims_and_prunes_columns(spark):
    p = _plan(corpus.derive_transcripts(spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    # only the used customer columns reach the scan
    assert "struct<c_custkey:bigint,c_name:string,c_nationkey:int>" in p


def test_filter_pushdown_reaches_parquet(spark):
    df = (
        corpus.load(spark, SF, "events")
        .filter(F.col("event_type") == "click")
        .select("event_id", "value")
    )
    p = _plan(df)
    assert "PushedFilters: [" in p and "EqualTo(event_type,click)" in p


def test_extraction_spine_has_no_shuffle_before_dedup(spark):
    from graphforge_spark.operators.extract import dedup_triples, extract_patterns

    raw = extract_patterns(corpus.derive_transcripts(spark, SF))
    p_raw = _plan(raw, "simple")
    # narrow pipeline: broadcast exchanges only (dim joins), no hash repartition
    assert "Exchange hashpartitioning" not in p_raw
    p_dedup = _plan(dedup_triples(raw), "simple")
    assert "Exchange hashpartitioning" in p_dedup  # exactly the dedup shuffle


def test_jaccard_broadcasts_candidate_pairs_not_shingles(spark):
    from graphforge_spark.operators.docops import ngram_jaccard_pairs

    docs = corpus.load(spark, SF, "documents")
    p = _plan(ngram_jaccard_pairs(docs))
    assert "BroadcastHashJoin" in p


def test_jaccard_second_join_has_no_unconditional_broadcast_hint(spark):
    """The r1 finding: the second join's build side carries shingle
    ARRAYS — it must carry no explicit broadcast hint, so the planner/AQE
    size-gates by bytes (broadcast while small, shuffle at scale). Lock
    in the logical plan: exactly ONE ResolvedHint (the bare id-pair
    frame), not two."""
    from graphforge_spark.operators.docops import ngram_jaccard_pairs

    docs = corpus.load(spark, SF, "documents")
    df = ngram_jaccard_pairs(docs)
    logical = df._jdf.queryExecution().analyzed().toString()
    assert logical.count("ResolvedHint") == 1


def test_tfidf_scoring_group_count_scales_with_parallelism(spark):
    """The r1 scale-killer: applyInPandas grouping was pmod(hash, 64)
    regardless of cluster size. Lock in: modulus = max(64,
    4×defaultParallelism) by default, and caller-overridable."""
    import re

    from graphforge_spark.operators.link import lsh_candidates, score_pairs_tfidf

    surfaces = (
        corpus.load(spark, SF, "customer")
        .filter(F.col("c_custkey") < 60)
        .select(F.replace(F.col("c_name"), F.lit("#"), F.lit("_")).alias("surface"))
    )
    pairs = lsh_candidates(surfaces)

    def modulus(df):
        m = re.search(r"pmod\(xxhash64\([^)]*\), (\d+)\)", _plan(df, "simple"))
        assert m, "grouping key not found in plan"
        return int(m.group(1))

    expect = max(64, spark.sparkContext.defaultParallelism * 4)
    assert modulus(score_pairs_tfidf(pairs, surfaces)) == expect
    assert modulus(score_pairs_tfidf(pairs, surfaces, n_groups=512)) == 512


def test_bucketed_tables_join_with_zero_exchange(spark, tmp_path):
    """Co-located join strategy: two tables bucketed on the join key with
    the same bucket count must join with NO shuffle on either side — the
    plan property that makes repeated graph-traversal joins affordable at
    100 TB. Verified against the physical plan, with broadcast disabled
    so the bucketing (not a broadcast) is what removes the exchanges."""
    from graphforge_spark.sinks.tables import write_bucketed

    edges = spark.range(5000).selectExpr(
        "concat('n', id % 997) AS src", "concat('n', (id * 7) % 997) AS dst"
    )
    nodes = spark.range(997).selectExpr(
        "concat('n', id) AS src", "id % 5 AS kind"
    )
    write_bucketed(edges, "t_edges_b", "src", n_buckets=8)
    write_bucketed(nodes, "t_nodes_b", "src", n_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_edges_b").join(spark.table("t_nodes_b"), "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing metadata removed BOTH shuffles
        assert joined.count() == 5000
        # control: the same join over non-bucketed data DOES shuffle
        ctrl = edges.join(nodes, "src")
        ctrl_plan = ctrl._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in ctrl_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_edges_b")
        spark.sql("DROP TABLE IF EXISTS t_nodes_b")


def test_flat_path_alternation_plans_as_single_filter(spark):
    """The recursive path compiler's fast path: a flat all-plain
    alternation must stay ONE scan + isin filter — no union, no join
    (PLANS.md claim)."""
    from graphforge_spark.plans.sparql import sparql_query

    g = spark.createDataFrame(
        [("a", "p1", "b", False), ("b", "p2", "c", False)],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    df = sparql_query(g, "SELECT ?s ?o WHERE { ?s (<p1>|<p2>) ?o }")
    plan = _plan(df)
    assert "Join" not in plan and "Union" not in plan
    # and the negated set likewise stays one NOT-IN filter
    df2 = sparql_query(g, "SELECT ?s ?o WHERE { ?s !(<p1>|<p2>) ?o }")
    plan2 = _plan(df2)
    assert "Join" not in plan2 and "Union" not in plan2


def test_expression_layer_stays_jvm_codegen(spark):
    """Arithmetic, numeric builtins, hashes, and generalized comparisons
    must compile to Catalyst expressions — no Python evaluation node in
    the plan, and the filter+project stay in one codegen stage."""
    from graphforge_spark.plans.sparql import sparql_query

    g = spark.createDataFrame(
        [("a", "p", "4", True)],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    df = sparql_query(
        g,
        """SELECT ?s ?v ?h WHERE { ?s ?p ?o .
           BIND(ABS(?o) * 2 + 1 AS ?v) BIND(MD5(?o) AS ?h)
           FILTER(STRLEN(?o) + 1 > CEIL(0.5) && isNumeric(?o)) }""",
    )
    plan = _plan(df)
    # BatchEvalPython / ArrowEvalPython are the Python-UDF plan nodes
    # (the ExistingRDD source name mentions Python harmlessly)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "codegen id" in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_validate_plan_no_nlj_and_type_pushdown(spark, tmp_path):
    """SHACL-lite validate: no nested-loop/cartesian operators anywhere
    (the shapes table broadcasts into equi-joins) and the typing-slice
    scans carry the pred pushdown, so focus selection reads only
    rdf:type row groups."""
    from graphforge_spark.operators.validate import Shape, validate

    tri_path = str(tmp_path / "tri")
    spark.createDataFrame(
        [("s", "rdf:type", "C", False, None), ("s", "p", "v", True, None)],
        "subj string, pred string, obj string, obj_is_literal boolean, graph string",
    ).write.parquet(tri_path)
    tri = spark.read.parquet(tri_path)
    v = validate(tri, [Shape("sh", "C", "p", min_count=1, node_kind="literal")])
    p = _plan(v)
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p
    assert "In(pred, [" in p  # typing predicate reached the parquet scan


def test_triples_table_files_are_sorted_by_pred(spark, tmp_path):
    """write_triples_partition lands a SORTED file layout: within every
    parquet file rows run in (pred, subj) order — the layout that makes
    row-group min/max stats selective for pred-filtered scans and gives
    dictionary/RLE pages their best case. Verified on the actual files,
    not the plan (the partitioned writer is allowed to re-sort; the
    FILES are the contract)."""
    import glob

    from graphforge_spark.sinks.tables import write_triples_partition

    rows = [
        (f"s{i % 7}", f"p{(i * 131) % 5}", f"o{i}", False, None, f"c{i % 11}", i)
        for i in range(500)
    ]
    df = spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "graph string, src_conv_id string, src_turn_idx int",
    ).repartition(4)
    write_triples_partition(df, str(tmp_path), n_buckets=4)
    files = glob.glob(f"{tmp_path}/triples/part_id=*/*.parquet")
    assert files
    import pyarrow.parquet as pq

    checked = 0
    for f in files:
        t = pq.read_table(f, columns=["pred", "subj"]).to_pydict()
        pairs = list(zip(t["pred"], t["subj"]))
        assert pairs == sorted(pairs), f"unsorted file {f}"
        checked += len(pairs)
    assert checked == 500


def test_triples_table_writes_bloom_filters(spark, tmp_path):
    """The triples writer lands bloom filters for subj/obj on
    high-cardinality data (observable as extra file bytes beyond a
    bloom-free write of identical data) — the point-lookup complement
    to the sorted layout's pred pruning. On low-cardinality columns
    parquet-mr skips the bloom (dictionary pages already prune
    exactly), so the option is free where it cannot help."""
    import glob
    import os

    from graphforge_spark.sinks.tables import write_triples_partition

    rows = 30_000
    df = spark.range(rows).selectExpr(
        "concat('http://ex.org/s/', id) subj",
        "'http://ex.org/p' pred",
        "concat('http://ex.org/o/', id) obj",
        "false obj_is_literal",
        "cast(null as string) graph",
        "concat('c', id % 4) src_conv_id",
        "cast(id as int) src_turn_idx",
    )
    write_triples_partition(df, str(tmp_path / "wh"), n_buckets=2)
    with_bloom = sum(
        os.path.getsize(f)
        for f in glob.glob(f"{tmp_path}/wh/triples/part_id=*/*.parquet")
    )
    # identical data, same sort, no bloom options
    (
        df.sortWithinPartitions("pred", "subj")
        .write.mode("overwrite")
        .parquet(str(tmp_path / "plain"))
    )
    plain = sum(
        os.path.getsize(f) for f in glob.glob(f"{tmp_path}/plain/*.parquet")
    )
    assert with_bloom > plain * 1.01, (with_bloom, plain)


# ---------------------------------------------------------------------------
# BGP join ordering (plans/bgp.py: order_patterns / triple_stats)
# ---------------------------------------------------------------------------


def test_order_patterns_heuristic_boundness():
    from graphforge_spark.plans.bgp import Var, order_patterns

    s, o, x = Var("s"), Var("o"), Var("x")
    unbounded = (s, Var("p"), o)
    const_pred = (s, "http://p/a", o)
    const_obj = (o, "http://p/b", "http://ex/k")
    # most-bound first: constant object+pred beats constant pred beats none,
    # and after the first pick only connected patterns are candidates
    got = order_patterns([unbounded, const_pred, const_obj])
    assert got == [const_obj, const_pred, unbounded]
    # connectivity beats raw selectivity for the SECOND pick: a highly
    # selective pattern sharing no variable with the joined set defers
    # until the connected chain is exhausted (same cross-join count as
    # the text order, components contiguous)
    disjoint_selective = (Var("z"), "http://p/c", "http://ex/k2")
    chain = [(s, "http://p/a", o), (o, "http://p/a", x)]
    got = order_patterns(chain + [disjoint_selective])
    assert got == [disjoint_selective, chain[0], chain[1]] or got == [
        chain[0],
        chain[1],
        disjoint_selective,
    ]
    # single pattern / empty: unchanged
    assert order_patterns([unbounded]) == [unbounded]
    assert order_patterns([]) == []


def test_order_patterns_stats_beat_heuristic():
    from graphforge_spark.plans.bgp import TripleStats, Var, order_patterns

    st = TripleStats(
        total=1_000_000,
        ndv_subj=100_000,
        ndv_obj=50_000,
        by_pred={
            "http://p/common": (990_000, 100_000, 40_000),
            "http://p/rare": (10, 10, 10),
        },
    )
    s, o = Var("s"), Var("o")
    common_bound_obj = (s, "http://p/common", "http://ex/k")  # ~24.75 rows
    rare_unbound = (s, "http://p/rare", o)  # 10 rows
    # the heuristic would rank the bound-object pattern first; real
    # cardinalities put the rare predicate first
    assert order_patterns([common_bound_obj, rare_unbound], st) == [
        rare_unbound,
        common_bound_obj,
    ]
    # a predicate absent from the store estimates to 0 rows -> first,
    # emptying the join tree at its cheapest point
    absent = (s, "http://p/never", o)
    assert order_patterns([common_bound_obj, absent], st)[0] == absent


def test_bgp_reorder_preserves_semantics_and_columns(spark):
    from graphforge_spark.plans.bgp import Var, bgp, triple_stats

    rows = [
        ("s1", "http://p/works", "org1", False),
        ("s2", "http://p/works", "org1", False),
        ("s3", "http://p/works", "org2", False),
        ("org1", "http://p/in", "r1", False),
        ("org2", "http://p/in", "r2", False),
        ("s1", "http://p/rare", "v", False),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean"
    )
    person, org, region = Var("person"), Var("org"), Var("region")
    pats = [
        (person, "http://p/works", org),
        (org, "http://p/in", region),
        (person, "http://p/rare", "v"),
    ]
    st = triple_stats(t)
    assert st.total == 6 and st.by_pred["http://p/rare"][0] == 1
    plain = bgp(t, pats)
    with_stats = bgp(t, pats, stats=st)
    # the reorder is invisible: same columns in the same order, same rows
    assert plain.columns == with_stats.columns == ["person", "org", "region"]
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, with_stats.collect())
    ) == [("s1", "org1", "r1")]
    # the stats plan joins the rare pattern before the common ones:
    # its object-constant filter appears in the FIRST (deepest) join leg
    p = _plan(with_stats, mode="extended")
    assert "rare" in p


def test_sparql_query_stats_param_same_results(spark):
    from graphforge_spark.plans.bgp import triple_stats
    from graphforge_spark.plans.sparql import sparql_query

    rows = [
        ("s%d" % i, "http://p/common", "o%d" % (i % 3), False) for i in range(50)
    ] + [("s1", "http://p/rare", "s7", False)]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean"
    )
    q = """SELECT ?a ?b ?c WHERE {
        ?a <http://p/common> ?b . ?a <http://p/rare> ?c .
        ?c <http://p/common> ?b2 }"""
    st = triple_stats(t)
    base = sorted(map(tuple, sparql_query(t, q).collect()))
    with_st = sorted(map(tuple, sparql_query(t, q, stats=st).collect()))
    assert base == with_st and len(base) > 0


def test_query_warehouse_stats_cache(spark, tmp_path):
    from graphforge_spark import pipeline
    from graphforge_spark.fixtures import gen_transcripts
    from graphforge_spark.pipeline import forge, query_warehouse

    wh = str(tmp_path / "wh")
    forge(
        spark,
        gen_transcripts(seed=5, n_convs=3, turns_per_conv=3).transcripts_df(spark),
        wh,
        n_buckets=2,
        do_link=False,
        export_nt=False,
    )
    pipeline._STATS_CACHE.clear()
    q = "SELECT ?s ?o WHERE { ?s <http://ex.org/p/worksAt> ?o }"
    r1 = query_warehouse(spark, wh, q).count()
    assert len(pipeline._STATS_CACHE) == 1
    key1 = next(iter(pipeline._STATS_CACHE))
    r2 = query_warehouse(spark, wh, q).count()
    assert r1 == r2 and next(iter(pipeline._STATS_CACHE)) == key1
    # opting out computes no stats and returns the same rows
    pipeline._STATS_CACHE.clear()
    r3 = query_warehouse(spark, wh, q, use_stats=False).count()
    assert r3 == r1 and not pipeline._STATS_CACHE


def test_annotation_mode_object_constant_pushes_raw_equality(spark, tmp_path):
    """Annotation mode rewrites obj into an encoded-term EXPRESSION, which
    parquet cannot push — the redundant _obj_raw conjunct
    (bgp._apply_pattern) restores a plain EqualTo in PushedFilters, and
    pred-constant pushdown is untouched."""
    from graphforge_spark.plans.sparql import sparql_query

    rows = [
        (f"http://ex.org/s{i}", f"http://ex.org/p{i % 3}", f"v{i}", True,
         "en" if i % 2 else None, None)
        for i in range(50)
    ]
    path = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        rows,
        "subj string, pred string, obj string, obj_is_literal boolean, "
        "obj_lang string, obj_dt string",
    ).write.parquet(path)
    store = spark.read.parquet(path)

    p1 = _plan(sparql_query(store, "SELECT ?s ?o WHERE { ?s <http://ex.org/p1> ?o }"))
    assert "EqualTo(pred,http://ex.org/p1)" in p1

    p2 = _plan(sparql_query(store, 'SELECT ?s WHERE { ?s ?p "v3"@en }'))
    assert "EqualTo(obj,v3)" in p2  # the pushable implied conjunct
    # and the result is still exact term identity
    out = sparql_query(store, 'SELECT ?s WHERE { ?s ?p "v3"@en }')
    assert [r.s for r in out.collect()] == ["http://ex.org/s3"]
    none = sparql_query(store, 'SELECT ?s WHERE { ?s ?p "v3"@fr }')
    assert none.count() == 0
