"""SPARQL Update surface (plans/update.py): the standard mutation grammar
over a triples store frame. The reference's mutations are append-on-upload
(documentQueryTest.html:362-438) and truncate-then-rebuild
(graphProcessor.js:57-113) — INSERT DATA and CLEAR; the pattern-driven
DELETE/INSERT forms are verified against hand-computed set algebra and a
DuckDB replay of the same operations."""

import duckdb
import pytest

from graphforge_spark.plans.update import sparql_update

EX = "http://ex.org/"

TRIPLES = [
    (EX + "a", EX + "p/knows", EX + "b", False, "g1"),
    (EX + "b", EX + "p/knows", EX + "c", False, "g1"),
    (EX + "a", EX + "p/name", "Alice", True, "g2"),
    (EX + "b", EX + "p/name", "Bob", True, "g2"),
    (EX + "c", EX + "p/age", "30", True, "g2"),
]

SCHEMA = "subj string, pred string, obj string, obj_is_literal boolean, graph string"


@pytest.fixture()
def store(spark):
    return spark.createDataFrame(TRIPLES, SCHEMA)


def triples_set(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


def test_insert_data(store):
    out = sparql_update(
        store,
        f'INSERT DATA {{ <{EX}d> <{EX}p/knows> <{EX}a> . <{EX}d> <{EX}p/name> "Dee" }}',
    )
    assert triples_set(out) == triples_set(store) | {
        (EX + "d", EX + "p/knows", EX + "a"),
        (EX + "d", EX + "p/name", "Dee"),
    }
    rows = {r.subj: r for r in out.collect() if r.subj == EX + "d"}
    assert rows[EX + "d"].graph == "urn:graphforge:update"
    lits = {(r.obj, r.obj_is_literal) for r in out.collect() if r.subj == EX + "d"}
    assert lits == {(EX + "a", False), ("Dee", True)}


def test_insert_data_existing_is_noop(store):
    out = sparql_update(
        store, f"INSERT DATA {{ <{EX}a> <{EX}p/knows> <{EX}b> }}"
    )
    assert out.count() == store.count()
    # provenance of the existing row (its graph) is untouched
    g = out.filter(out.subj == EX + "a").filter(out.pred == EX + "p/knows")
    assert g.collect()[0].graph == "g1"


def test_delete_data(store):
    out = sparql_update(
        store, f"DELETE DATA {{ <{EX}a> <{EX}p/knows> <{EX}b> }}"
    )
    assert triples_set(out) == triples_set(store) - {(EX + "a", EX + "p/knows", EX + "b")}


def test_delete_where_template_is_body(store):
    out = sparql_update(store, f"DELETE WHERE {{ ?s <{EX}p/name> ?n }}")
    assert triples_set(out) == {
        t[:3] for t in TRIPLES if t[1] != EX + "p/name"
    }


def test_delete_insert_where_rename_predicate(store):
    q = f"""
        DELETE {{ ?s <{EX}p/knows> ?o }}
        INSERT {{ ?s <{EX}p/acquaintedWith> ?o }}
        WHERE  {{ ?s <{EX}p/knows> ?o }}
    """
    out = sparql_update(store, q)
    expected = {
        (s, EX + "p/acquaintedWith" if p == EX + "p/knows" else p, o)
        for s, p, o, _, _ in TRIPLES
    }
    assert triples_set(out) == expected


def test_insert_where_with_filter_and_prefix(store):
    q = f"""
        PREFIX ex: <{EX}p/>
        INSERT {{ ?s ex:adult "true" }}
        WHERE  {{ ?s ex:age ?a FILTER(?a >= 18) }}
    """
    out = sparql_update(store, q)
    assert (EX + "c", EX + "p/adult", "true") in triples_set(out)
    assert out.count() == len(TRIPLES) + 1


def test_filter_less_than_comparison_parses(store):
    """A bare '<' is the less-than operator, not an IRI opener: the
    structural mask must not blank '}'/';' after it. Covers both a
    FILTER inside one op and the ';' split between ops."""
    out = sparql_update(
        store,
        f"DELETE {{ ?s <{EX}p/age> ?a }} "
        f'WHERE {{ ?s <{EX}p/age> ?a FILTER(?a < "99") }} ; '
        f'INSERT DATA {{ <{EX}z> <{EX}p/name> "Zed" }}',
    )
    got = triples_set(out)
    assert (EX + "c", EX + "p/age", "30") not in got
    assert (EX + "z", EX + "p/name", "Zed") in got


def test_unbound_template_var_drops_solution(store):
    # OPTIONAL leaves ?n unbound for subjects without a name; those
    # solutions instantiate nothing (spec 3.1.3.2), they do not error.
    q = f"""
        INSERT {{ ?o <{EX}p/knownAs> ?n }}
        WHERE  {{ ?s <{EX}p/knows> ?o OPTIONAL {{ ?o <{EX}p/name> ?n }} }}
    """
    out = sparql_update(store, q)
    added = triples_set(out) - triples_set(store)
    assert added == {(EX + "b", EX + "p/knownAs", "Bob")}


def test_sequential_ops_each_see_previous_result(store):
    q = f"""
        INSERT DATA {{ <{EX}d> <{EX}p/age> "40" }} ;
        PREFIX ex: <{EX}p/>
        DELETE {{ ?s ex:age ?a }} WHERE {{ ?s ex:age ?a FILTER(?a > 35) }}
    """
    out = sparql_update(store, q)
    # the inserted row is visible to (and deleted by) the second op
    assert triples_set(out) == triples_set(store)


def test_delete_then_insert_same_op_order(store):
    # §3.1.3: deletes apply before inserts; re-inserting a deleted triple keeps it
    q = f"""
        DELETE {{ ?s ?p ?o }}
        INSERT {{ <{EX}a> <{EX}p/knows> <{EX}b> }}
        WHERE  {{ ?s ?p ?o }}
    """
    out = sparql_update(store, q)
    assert triples_set(out) == {(EX + "a", EX + "p/knows", EX + "b")}


def test_clear(store):
    assert sparql_update(store, "CLEAR ALL").count() == 0
    assert sparql_update(store, "CLEAR SILENT DEFAULT").count() == 0
    assert sparql_update(store, "CLEAR ALL").columns == store.columns


def test_turtle_sugar_in_data_block(store):
    q = f'INSERT DATA {{ <{EX}d> <{EX}p/name> "Dee" ; <{EX}p/age> "7", "8" }}'
    out = sparql_update(store, q)
    assert triples_set(out) - triples_set(store) == {
        (EX + "d", EX + "p/name", "Dee"),
        (EX + "d", EX + "p/age", "7"),
        (EX + "d", EX + "p/age", "8"),
    }


def test_bare_store_without_graph_columns(spark):
    bare = spark.createDataFrame(
        [(EX + "a", EX + "p", EX + "b")], "subj string, pred string, obj string"
    )
    out = sparql_update(bare, f'INSERT DATA {{ <{EX}a> <{EX}p> "lit" }}')
    assert out.columns == ["subj", "pred", "obj"]
    assert triples_set(out) == {(EX + "a", EX + "p", EX + "b"), (EX + "a", EX + "p", "lit")}


@pytest.mark.parametrize(
    "bad",
    [
        "LOAD <http://ex.org/data.nt>",  # hermetic: http(s) fetch refused
        "CREATE GRAPH <g1>",  # non-SILENT + graph already exists
        "DROP GRAPH <http://ex.org/absent>",  # non-SILENT + absent graph
        "ADD <http://ex.org/absent> TO <http://ex.org/g>",
        f"INSERT DATA {{ GRAPH <{EX}g> {{ <{EX}a> <{EX}p> <{EX}b> }} GRAPH <{EX}h> {{ <{EX}a> <{EX}p> <{EX}c> }} }}",
        f"INSERT DATA {{ ?s <{EX}p> <{EX}b> }}",
        f"INSERT DATA {{ <{EX}a> <{EX}p>+ <{EX}b> }}",
        "CLEAR NAMED",
        "INSERT DATA { }",
        f"DELETE {{ ?s ?p ?o }} FOO {{ ?s ?p ?o }}",
        f'INSERT DATA {{ <{EX}a> <{EX}p> "x"@en }}',
    ],
)
def test_unsupported_raises(store, bad):
    with pytest.raises(ValueError):
        sparql_update(store, bad)


def graphs_of(df):
    return {
        (r.subj, r.pred, r.obj, r.graph)
        for r in df.select("subj", "pred", "obj", "graph").collect()
    }


def test_clear_and_drop_graph(store):
    out = sparql_update(store, f"CLEAR GRAPH <g2>")
    assert {r.graph for r in out.collect()} == {"g1"}
    # CLEAR of an absent graph is a no-op; non-SILENT DROP raises
    assert sparql_update(store, "CLEAR GRAPH <absent>").count() == store.count()
    assert sparql_update(store, "DROP SILENT GRAPH <absent>").count() == store.count()
    out2 = sparql_update(store, "DROP GRAPH <g1>")
    assert {r.graph for r in out2.collect()} == {"g2"}


def test_add_copy_move_graph(store):
    n_g1 = store.filter("graph = 'g1'").count()
    n_g2 = store.filter("graph = 'g2'").count()
    added = sparql_update(store, "ADD <g1> TO <g2>")
    assert added.filter("graph = 'g2'").count() == n_g2 + n_g1
    assert added.filter("graph = 'g1'").count() == n_g1  # source untouched
    # ADD is idempotent (already-present triples skipped)
    assert sparql_update(added, "ADD <g1> TO <g2>").count() == added.count()
    copied = sparql_update(store, "COPY <g1> TO <g2>")
    assert graphs_of(copied.filter("graph = 'g2'")) == {
        (s, p, o, "g2") for s, p, o, g in graphs_of(store) if g == "g1"
    }
    moved = sparql_update(store, "MOVE <g1> TO <g2>")
    assert {r.graph for r in moved.collect()} == {"g2"}
    assert moved.count() == n_g1
    # provenance column (obj_is_literal) rides along unchanged
    assert {
        (r.subj, r.obj_is_literal) for r in moved.collect()
    } == {
        (r.subj, r.obj_is_literal)
        for r in store.filter("graph = 'g1'").collect()
    }


def test_graph_scoped_data_blocks(store):
    # scoped insert lands in the named graph and dedups within it only
    out = sparql_update(
        store,
        f"INSERT DATA {{ GRAPH <g9> {{ <{EX}a> <{EX}p/knows> <{EX}b> }} }}",
    )
    assert (EX + "a", EX + "p/knows", EX + "b", "g9") in graphs_of(out)
    assert (EX + "a", EX + "p/knows", EX + "b", "g1") in graphs_of(out)
    # re-inserting into g9 is a no-op; the plain form also no-ops now
    assert (
        sparql_update(
            out,
            f"INSERT DATA {{ GRAPH <g9> {{ <{EX}a> <{EX}p/knows> <{EX}b> }} }}",
        ).count()
        == out.count()
    )
    # scoped delete removes only that graph's copy
    out2 = sparql_update(
        out, f"DELETE DATA {{ GRAPH <g9> {{ <{EX}a> <{EX}p/knows> <{EX}b> }} }}"
    )
    assert (EX + "a", EX + "p/knows", EX + "b", "g9") not in graphs_of(out2)
    assert (EX + "a", EX + "p/knows", EX + "b", "g1") in graphs_of(out2)


def test_graph_ops_need_graph_column(spark):
    bare = spark.createDataFrame(
        [(EX + "a", EX + "p", EX + "b")], "subj string, pred string, obj string"
    )
    for bad in ("CLEAR GRAPH <g1>", "ADD <g1> TO <g2>",
                f"INSERT DATA {{ GRAPH <g> {{ <{EX}a> <{EX}p> <{EX}c> }} }}"):
        with pytest.raises(ValueError, match="graph column"):
            sparql_update(bare, bad)


def test_duckdb_replay_delete_insert(spark, store):
    """Differential check: the DELETE/INSERT WHERE algebra vs a DuckDB
    replay of the same set operations on the same rows."""
    q = f"""
        DELETE {{ ?s <{EX}p/knows> ?o }}
        INSERT {{ ?o <{EX}p/knownBy> ?s }}
        WHERE  {{ ?s <{EX}p/knows> ?o }}
    """
    got = sorted(triples_set(sparql_update(store, q)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (subj text, pred text, obj text)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)", [t[:3] for t in TRIPLES]
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH sol AS (SELECT subj s, obj o FROM t WHERE pred = '{EX}p/knows'),
            kept AS (
              SELECT * FROM t WHERE NOT EXISTS (
                SELECT 1 FROM sol
                WHERE t.subj = sol.s AND t.pred = '{EX}p/knows' AND t.obj = sol.o
              )
            )
            SELECT DISTINCT * FROM (
              SELECT * FROM kept
              UNION ALL
              SELECT o, '{EX}p/knownBy', s FROM sol
            )
            """
        ).fetchall()
    )
    assert got == want


# --- r4: LOAD / CREATE / WITH / USING --------------------------------------


def test_create_graph(store):
    # absent graph: spec-sanctioned no-op for stores without empty graphs
    out = sparql_update(store, "CREATE GRAPH <g9>")
    assert triples_set(out) == triples_set(store)
    # existing graph + SILENT: no-op instead of the non-SILENT error
    out = sparql_update(store, "CREATE SILENT GRAPH <g1>")
    assert triples_set(out) == triples_set(store)


def test_load_file_into_graph(store, tmp_path):
    doc = tmp_path / "facts.nt"
    doc.write_text(
        f"<{EX}x> <{EX}p/knows> <{EX}y> .\n<{EX}x> <{EX}p/name> \"Xe\" .\n"
    )
    out = sparql_update(store, f"LOAD <file://{doc}> INTO GRAPH <gL>")
    got = graphs_of(out)
    assert (EX + "x", EX + "p/knows", EX + "y", "gL") in got
    assert (EX + "x", EX + "p/name", "Xe", "gL") in got
    # literal typing follows the engine discriminator
    lit = {r.obj: r.obj_is_literal for r in out.filter(out.graph == "gL").collect()}
    assert lit == {EX + "y": False, "Xe": True}
    # default target graph without INTO
    out2 = sparql_update(store, f"LOAD <file://{doc}>")
    assert (EX + "x", EX + "p/knows", EX + "y", "urn:graphforge:update") in graphs_of(out2)


def test_load_turtle_and_failures(store, tmp_path):
    ttl = tmp_path / "facts.ttl"
    ttl.write_text(f"@prefix e: <{EX}> . e:t1 e:q e:t2 .\n")
    out = sparql_update(store, f"LOAD <file://{ttl}>")
    assert (EX + "t1", EX + "q", EX + "t2") in triples_set(out)
    # missing file: non-SILENT raises, SILENT is a no-op
    with pytest.raises(ValueError, match="LOAD"):
        sparql_update(store, f"LOAD <file://{tmp_path}/absent.nt>")
    out = sparql_update(store, f"LOAD SILENT <file://{tmp_path}/absent.nt>")
    assert triples_set(out) == triples_set(store)
    # garbage content: parses to zero triples -> non-SILENT raises
    bad = tmp_path / "junk.ttl"
    bad.write_text("certainly not turtle {{{")
    with pytest.raises(ValueError, match="zero triples|LOAD"):
        sparql_update(store, f"LOAD <file://{bad}>")


def test_with_scopes_where_delete_insert(spark):
    # the same lexical triple lives in g1 AND g2; WITH <g1> must match
    # and delete only g1's copy, and land inserts in g1
    rows = [
        (EX + "a", EX + "p", EX + "b", False, "g1"),
        (EX + "a", EX + "p", EX + "b", False, "g2"),
        (EX + "z", EX + "p", EX + "w", False, "g2"),
    ]
    st = spark.createDataFrame(rows, SCHEMA)
    out = sparql_update(
        st,
        f"WITH <g1> DELETE {{ ?s <{EX}p> ?o }} "
        f"INSERT {{ ?s <{EX}q> ?o }} WHERE {{ ?s <{EX}p> ?o }}",
    )
    got = graphs_of(out)
    # g2's copy of (a p b) survives; g1's is gone
    assert (EX + "a", EX + "p", EX + "b", "g2") in got
    assert (EX + "a", EX + "p", EX + "b", "g1") not in got
    # WHERE matched ONLY g1 (z/w is g2-only -> no insert for it);
    # the insert landed in g1
    assert (EX + "a", EX + "q", EX + "b", "g1") in got
    assert not any(s == EX + "z" and p == EX + "q" for s, p, o, g in got)


def test_using_compiles_to_from(spark):
    rows = [
        (EX + "a", EX + "p", EX + "b", False, "g1"),
        (EX + "c", EX + "p", EX + "d", False, "g2"),
    ]
    st = spark.createDataFrame(rows, SCHEMA)
    # WHERE sees only g2 via USING; the matched triple deletes (union
    # semantics without WITH)
    out = sparql_update(
        st,
        f"DELETE {{ ?s <{EX}p> ?o }} USING <g2> WHERE {{ ?s <{EX}p> ?o }}",
    )
    assert triples_set(out) == {(EX + "a", EX + "p", EX + "b")}
    # USING NAMED restricts GRAPH ?g inside WHERE
    out2 = sparql_update(
        st,
        f"INSERT {{ ?s <{EX}seen> ?g }} USING NAMED <g1> "
        f"WHERE {{ GRAPH ?g {{ ?s <{EX}p> ?o }} }}",
    )
    fresh = {(r.subj, r.obj) for r in out2.collect() if r.pred == EX + "seen"}
    assert fresh == {(EX + "a", "g1")}


def test_using_overrides_with_for_matching(spark):
    rows = [
        (EX + "a", EX + "p", EX + "b", False, "g1"),
        (EX + "c", EX + "p", EX + "d", False, "g2"),
    ]
    st = spark.createDataFrame(rows, SCHEMA)
    # match in g2 (USING wins over WITH), but the insert still lands in
    # g1 (WITH governs the modification target, per spec)
    out = sparql_update(
        st,
        f"WITH <g1> INSERT {{ ?s <{EX}q> ?o }} USING <g2> "
        f"WHERE {{ ?s <{EX}p> ?o }}",
    )
    assert (EX + "c", EX + "q", EX + "d", "g1") in graphs_of(out)


# --- quad templates: GRAPH blocks in DELETE/INSERT templates ---------------


def test_quad_insert_constant_graph(store):
    out = sparql_update(
        store,
        f'INSERT {{ GRAPH <gX> {{ ?s <{EX}tag> "t" }} }} '
        f"WHERE {{ ?s <{EX}p/knows> ?o }}",
    )
    got = graphs_of(out)
    assert (EX + "a", EX + "tag", "t", "gX") in got
    assert (EX + "b", EX + "tag", "t", "gX") in got
    assert out.count() == 7


def test_quad_insert_variable_graph_routes_per_solution(store):
    # each solution's ?g value is the target graph
    out = sparql_update(
        store,
        f'INSERT {{ GRAPH ?g {{ ?s <{EX}seen> "1" }} }} '
        f"WHERE {{ GRAPH ?g {{ ?s <{EX}p/knows> ?o }} }}",
    )
    got = graphs_of(out)
    assert (EX + "a", EX + "seen", "1", "g1") in got
    assert (EX + "b", EX + "seen", "1", "g1") in got
    assert not any(r[1] == EX + "seen" and r[3] != "g1" for r in got)


def test_quad_delete_removes_only_named_graph_copy(spark):
    dup = spark.createDataFrame(
        [
            (EX + "a", EX + "p", EX + "b", False, "g1"),
            (EX + "a", EX + "p", EX + "b", False, "g2"),
        ],
        SCHEMA,
    )
    out = sparql_update(
        dup,
        f"DELETE {{ GRAPH <g1> {{ ?s <{EX}p> ?o }} }} WHERE {{ ?s <{EX}p> ?o }}",
    )
    assert [(r.subj, r.graph) for r in out.collect()] == [(EX + "a", "g2")]


def test_quad_delete_where_graph_block(store):
    out = sparql_update(store, f"DELETE WHERE {{ GRAPH <g2> {{ ?s <{EX}p/name> ?o }} }}")
    got = graphs_of(out)
    assert not any(p == EX + "p/name" for _, p, _, _ in got)
    assert (EX + "c", EX + "p/age", "30", "g2") in got  # other g2 rows survive


def test_quad_insert_dedups_within_target_graph(spark):
    dup = spark.createDataFrame(
        [(EX + "a", EX + "p", EX + "b", False, "g1")], SCHEMA
    )
    out = sparql_update(
        dup,
        f"INSERT {{ GRAPH <g1> {{ <{EX}a> <{EX}p> <{EX}b> }} "
        f"GRAPH <g3> {{ <{EX}a> <{EX}p> <{EX}b> }} }} "
        f"WHERE {{ <{EX}a> <{EX}p> <{EX}b> }}",
    )
    # existing g1 copy is a no-op; the g3 copy lands (graphs are
    # separate containers for the explicit quad form)
    assert sorted(r.graph for r in out.collect()) == ["g1", "g3"]


def test_with_supplies_graph_for_unscoped_quad_triples_only(store):
    out = sparql_update(
        store,
        f'WITH <g2> INSERT {{ ?s <{EX}w> "1" . GRAPH <g9> {{ ?s <{EX}x> "2" }} }} '
        f"WHERE {{ ?s <{EX}p/age> ?o }}",
    )
    got = graphs_of(out)
    assert (EX + "c", EX + "w", "1", "g2") in got  # WITH graph
    assert (EX + "c", EX + "x", "2", "g9") in got  # GRAPH override


def test_quad_template_guards(store, spark):
    # graph-less store refuses quad templates loudly
    flat = spark.createDataFrame(
        [(EX + "a", EX + "p", EX + "b", False)],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    with pytest.raises(ValueError, match="graph column"):
        sparql_update(
            flat,
            f"INSERT {{ GRAPH <g> {{ <{EX}x> <{EX}y> <{EX}z> }} }} "
            f"WHERE {{ ?s <{EX}p> ?o }}",
        )
    # empty GRAPH block refuses
    with pytest.raises(ValueError, match="empty GRAPH"):
        sparql_update(store, f"INSERT {{ GRAPH <g> {{ }} }} WHERE {{ ?s <{EX}p/age> ?o }}")
    # paths still refuse inside quad blocks
    with pytest.raises(ValueError, match="path"):
        sparql_update(
            store,
            f"DELETE {{ GRAPH <g1> {{ ?s <{EX}p/knows>+ ?o }} }} "
            f"WHERE {{ ?s <{EX}p/knows> ?o }}",
        )


def test_mixed_quad_template_without_dots_parses(spark):
    # review finding: the '.' after a Quads block is OPTIONAL — plain
    # runs before and after a GRAPH block are independent statements
    store = spark.createDataFrame(
        [(EX + "a", EX + "p", EX + "b", False, "g1")], SCHEMA
    )
    out = sparql_update(
        store,
        f'INSERT {{ ?s <{EX}t1> "1" GRAPH <g9> {{ ?s <{EX}t2> "2" }} ?s <{EX}t3> "3" }} '
        f"WHERE {{ ?s <{EX}p> ?o }}",
    )
    got = graphs_of(out)
    assert (EX + "a", EX + "t1", "1", "urn:graphforge:update") in got
    assert (EX + "a", EX + "t2", "2", "g9") in got
    assert (EX + "a", EX + "t3", "3", "urn:graphforge:update") in got


def test_mixed_quad_template_keeps_unscoped_union_dedup(spark):
    # review finding: an unscoped triple beside a GRAPH block must keep
    # the no-op-if-visible-ANYWHERE contract, not per-graph dedup
    store = spark.createDataFrame(
        [(EX + "a", EX + "p", EX + "b", False, "g1")], SCHEMA
    )
    out = sparql_update(
        store,
        f"INSERT {{ <{EX}a> <{EX}p> <{EX}b> . GRAPH <g9> {{ <{EX}x> <{EX}y> <{EX}z> }} }} "
        f"WHERE {{ <{EX}a> <{EX}p> <{EX}b> }}",
    )
    got = graphs_of(out)
    assert got == {
        (EX + "a", EX + "p", EX + "b", "g1"),  # NOT duplicated
        (EX + "x", EX + "y", EX + "z", "g9"),
    }


def test_quad_graph_regex_requires_token_boundary():
    # review finding: a template token merely ENDING in "GRAPH" (an IRI
    # tail, a prefixed local name) must never be consumed as a block
    # head — the lookbehind makes the invariant explicit
    from graphforge_spark.plans.update import _QUAD_GRAPH_RE

    assert _QUAD_GRAPH_RE.search("GRAPH <http://g> {") is not None
    assert _QUAD_GRAPH_RE.search("x . GRAPH ?g {") is not None
    for tail in [
        "<http://e/myGRAPH ?x {",   # IRI-ish token ending in GRAPH
        "ex:subGRAPH ?x {",          # prefixed local name
        "p/GRAPH ?x {",              # path tail
        "#GRAPH ?x {",
    ]:
        assert _QUAD_GRAPH_RE.search(tail) is None, tail
