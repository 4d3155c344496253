"""Differential property test for PROPERTY PATHS: random (cyclic!)
edge sets, path queries executed by the engine vs DuckDB WITH RECURSIVE
oracles. Cycles are the high-risk topology for the closure fixpoint
(termination + no duplicate pairs); random graphs here hit them
constantly, which the curated driver oracles (acyclic chain blocks)
never do.

Zero-length semantics mirror the ENGINE's documented choice (also
pinned by the sparql_path driver oracle): the reflexive pairs of ``p*``
range over the nodes incident to the CHILD path's matching edges, not
over every term in the graph.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.plans.sparql import sparql_query

NODES = [f"http://ex.org/n{i}" for i in range(6)]
P1, P2 = "http://ex.org/p/p1", "http://ex.org/p/p2"

edge = st.tuples(
    st.sampled_from(NODES), st.sampled_from([P1, P2]), st.sampled_from(NODES)
)
graphs = st.lists(edge, min_size=3, max_size=16, unique=True)

# WITH RECURSIVE closure over the given predicate set; DuckDB's UNION
# (distinct) semantics terminate on cycles
_CTE = """
WITH RECURSIVE r(s, o) AS (
    SELECT subj, obj FROM t WHERE pred IN ({preds})
    UNION
    SELECT r.s, t.obj FROM r JOIN t ON r.o = t.subj AND t.pred IN ({preds})
)
"""


def _closure_sql(preds, reflexive):
    plist = ", ".join(f"'{p}'" for p in preds)
    cte = _CTE.format(preds=plist)
    if not reflexive:
        return cte + "SELECT DISTINCT s, o FROM r"
    return cte + f"""
        SELECT DISTINCT s, o FROM (
            SELECT s, o FROM r
            UNION
            SELECT n, n FROM (
                SELECT subj AS n FROM t WHERE pred IN ({plist})
                UNION
                SELECT obj FROM t WHERE pred IN ({plist})
            )
        )
    """


SHAPES = {
    "plus": (
        f"SELECT ?s ?o WHERE {{ ?s <{P1}>+ ?o }}",
        _closure_sql([P1], reflexive=False),
    ),
    "star": (
        f"SELECT ?s ?o WHERE {{ ?s <{P1}>* ?o }}",
        _closure_sql([P1], reflexive=True),
    ),
    "alt_plus": (
        f"SELECT ?s ?o WHERE {{ ?s (<{P1}>|<{P2}>)+ ?o }}",
        _closure_sql([P1, P2], reflexive=False),
    ),
    "seq": (
        f"SELECT ?s ?o WHERE {{ ?s <{P1}>/<{P2}> ?o }}",
        # BAG semantics, per spec: each distinct intermediate node is a
        # separate solution — no DISTINCT here
        f"""SELECT a.subj AS s, b.obj AS o FROM t a JOIN t b
            ON a.obj = b.subj AND a.pred = '{P1}' AND b.pred = '{P2}'""",
    ),
    "inv_plus": (
        f"SELECT ?s ?o WHERE {{ ?s (^<{P1}>)+ ?o }}",
        # closure of the REVERSED p1 edges
        f"""
        WITH RECURSIVE r(s, o) AS (
            SELECT obj, subj FROM t WHERE pred = '{P1}'
            UNION
            SELECT r.s, t.subj FROM r JOIN t ON r.o = t.obj AND t.pred = '{P1}'
        )
        SELECT DISTINCT s, o FROM r
        """,
    ),
    "star_seq": (
        f"SELECT ?s ?o WHERE {{ ?s <{P1}>*/<{P2}> ?o }}",
        # engine zero-step domain: p1-incident nodes; the closure itself
        # is a SET but the sequence join is a BAG (one solution per
        # distinct closure row × edge), per spec — no outer DISTINCT
        _closure_sql([P1], reflexive=True)
        .replace("SELECT DISTINCT s, o FROM (", "SELECT c.s AS s, b.obj AS o FROM (", 1)
        + f" c JOIN t b ON c.o = b.subj AND b.pred = '{P2}'",
    ),
    "inv_seq": (
        # ^(p1/p2) ≡ ^p2/^p1: reversed two-hop, bag semantics
        f"SELECT ?s ?o WHERE {{ ?s ^(<{P1}>/<{P2}>) ?o }}",
        f"""SELECT b.obj AS s, a.subj AS o FROM t a JOIN t b
            ON a.obj = b.subj AND a.pred = '{P1}' AND b.pred = '{P2}'""",
    ),
    "alt_of_seq": (
        # (p1/p2)|p2 : bag union of the sequence solutions and p2 edges
        f"SELECT ?s ?o WHERE {{ ?s (<{P1}>/<{P2}>)|<{P2}> ?o }}",
        f"""SELECT a.subj AS s, b.obj AS o FROM t a JOIN t b
            ON a.obj = b.subj AND a.pred = '{P1}' AND b.pred = '{P2}'
            UNION ALL
            SELECT subj, obj FROM t WHERE pred = '{P2}'""",
    ),
    "zero_or_one": (
        f"SELECT ?s ?o WHERE {{ ?s <{P1}>? ?o }}",
        f"""
        SELECT DISTINCT s, o FROM (
            SELECT subj AS s, obj AS o FROM t WHERE pred = '{P1}'
            UNION
            SELECT n, n FROM (
                SELECT subj AS n FROM t WHERE pred = '{P1}'
                UNION SELECT obj FROM t WHERE pred = '{P1}'
            )
        )
        """,
    ),
    # --- r5: negated property sets with inverse members (spec §9.1) ---
    "negset_inv": (
        # !(^p1): reversed edges whose predicate is NOT p1
        f"SELECT ?s ?o WHERE {{ ?s !(^<{P1}>) ?o }}",
        f"SELECT obj AS s, subj AS o FROM t WHERE pred <> '{P1}'",
    ),
    "negset_mixed": (
        # !(p1|^p2): bag union of the two pure forms
        f"SELECT ?s ?o WHERE {{ ?s !(<{P1}>|^<{P2}>) ?o }}",
        f"""SELECT subj AS s, obj AS o FROM t WHERE pred <> '{P1}'
            UNION ALL
            SELECT obj, subj FROM t WHERE pred <> '{P2}'""",
    ),
    "negset_inv_plus": (
        # closure over the inverse-negset step (runs the fixpoint on a
        # reversed-edge frame; with preds {p1,p2}, !^p2 ≡ ^p1)
        f"SELECT ?s ?o WHERE {{ ?s (!(^<{P2}>))+ ?o }}",
        f"""
        WITH RECURSIVE r(s, o) AS (
            SELECT obj, subj FROM t WHERE pred <> '{P2}'
            UNION
            SELECT r.s, t.subj FROM r JOIN t ON r.o = t.obj AND t.pred <> '{P2}'
        )
        SELECT DISTINCT s, o FROM r
        """,
    ),
}


@pytest.fixture(scope="module")
def _shared(spark):
    return spark


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=graphs, shape=st.sampled_from(sorted(SHAPES)))
def test_path_closure_matches_duckdb(_shared, data, shape):
    spark = _shared
    sparql_text, sql_text = SHAPES[shape]
    sdf = spark.createDataFrame(data, "subj string, pred string, obj string")
    got = sorted(
        (r.s, r.o) for r in sparql_query(sdf, sparql_text).collect()
    )
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(subj VARCHAR, pred VARCHAR, obj VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
        want = sorted(tuple(r) for r in con.execute(sql_text).fetchall())
    finally:
        con.close()
    assert got == want, (shape, len(data))
