"""Differential property test for the SPARQL Update surface: random
sequences of INSERT DATA / DELETE DATA / DELETE WHERE / DELETE…INSERT…
WHERE operations over small random stores, replayed by a pure-Python
set-algebra oracle implementing the documented semantics (lexical
(s,p,o) identity; per-op WHERE bound once against the pre-state;
deletes before inserts; unbound template slots never occur here because
the generated templates only use WHERE-bound variables).

The curated tests pin each operation shape once; this pins the
SEQUENCING and the pattern-driven forms across arbitrary compositions —
the same role the query-AST differential fuzzer plays for SELECT.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.plans.update import sparql_update

SUBJECTS = [f"http://e/s{i}" for i in range(4)]
PREDS = [f"http://e/p{i}" for i in range(3)]
OBJECTS = [f"http://e/o{i}" for i in range(3)] + ["lit-a", "lit-b"]


def _term(t: str) -> str:
    return f"<{t}>" if t.startswith("http") else f'"{t}"'


triples_st = st.sets(
    st.tuples(
        st.sampled_from(SUBJECTS),
        st.sampled_from(PREDS),
        st.sampled_from(OBJECTS),
    ),
    min_size=1,
    max_size=10,
)


@st.composite
def operations(draw):
    """One random op → (update-text fragment, python replay fn)."""
    kind = draw(st.sampled_from(["insert", "delete", "delete_where", "rename"]))
    if kind in ("insert", "delete"):
        rows = draw(triples_st)
        body = " . ".join(f"{_term(s)} {_term(p)} {_term(o)}" for s, p, o in rows)
        text = f"{'INSERT' if kind == 'insert' else 'DELETE'} DATA {{ {body} }}"

        def replay(store, rows=frozenset(rows), insert=(kind == "insert")):
            return store | rows if insert else store - rows

        return text, replay
    if kind == "delete_where":
        p = draw(st.sampled_from(PREDS))
        text = f"DELETE WHERE {{ ?s <{p}> ?o }}"

        def replay(store, p=p):
            return {t for t in store if t[1] != p}

        return text, replay
    # rename: DELETE {?s <p> ?o} INSERT {?s <q> ?o} WHERE {?s <p> ?o}
    p = draw(st.sampled_from(PREDS))
    q = draw(st.sampled_from(PREDS + ["http://e/p-new"]))
    text = (
        f"DELETE {{ ?s <{p}> ?o }} INSERT {{ ?s <{q}> ?o }} "
        f"WHERE {{ ?s <{p}> ?o }}"
    )

    def replay(store, p=p, q=q):
        sol = {(s, o) for s, pp, o in store if pp == p}
        kept = {t for t in store if t[1] != p}
        return kept | {(s, q, o) for s, o in sol}

    return text, replay


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    initial=triples_st,
    ops=st.lists(operations(), min_size=1, max_size=4),
)
def test_update_sequences_match_set_algebra(spark, initial, ops):
    store = spark.createDataFrame(
        sorted(initial), "subj string, pred string, obj string"
    )
    text = " ;\n".join(t for t, _ in ops)
    got = {
        (r.subj, r.pred, r.obj)
        for r in sparql_update(store, text).collect()
    }
    want = set(initial)
    for _, replay in ops:
        want = replay(want)
    assert got == want


# --- quad templates: per-graph differential --------------------------------

GRAPHS = ["g0", "g1", "g2"]
UPD_G = "urn:graphforge:update"

quads_st = st.sets(
    st.tuples(
        st.sampled_from(SUBJECTS),
        st.sampled_from(PREDS),
        st.sampled_from(OBJECTS),
        st.sampled_from(GRAPHS),
    ),
    min_size=1,
    max_size=12,
)


@st.composite
def quad_operations(draw):
    """One random QUAD-template op → (text, replay over (s,p,o,g) sets).
    Replays implement the documented semantics: WHERE sees the union
    default graph (or one graph under a GRAPH block); quad inserts
    dedup per target graph; UNSCOPED inserts dedup against any graph
    and land in the op's insert graph; quad deletes remove only the
    named graph's copies."""
    kind = draw(
        st.sampled_from(
            ["quad_insert", "quad_var_insert", "quad_delete", "mixed", "dw_graph"]
        )
    )
    p = draw(st.sampled_from(PREDS))
    q = draw(st.sampled_from(PREDS + ["http://e/p-new"]))
    gx = draw(st.sampled_from(GRAPHS + ["g-new"]))
    if kind == "quad_insert":
        text = f"INSERT {{ GRAPH <{gx}> {{ ?s <{q}> ?o }} }} WHERE {{ ?s <{p}> ?o }}"

        def replay(store, p=p, q=q, gx=gx):
            sol = {(s, o) for s, pp, o, _ in store if pp == p}
            return store | {
                (s, q, o, gx) for s, o in sol if (s, q, o, gx) not in store
            }

        return text, replay
    if kind == "quad_var_insert":
        text = (
            f'INSERT {{ GRAPH ?g {{ ?s <{q}> "m" }} }} '
            f"WHERE {{ GRAPH ?g {{ ?s <{p}> ?o }} }}"
        )

        def replay(store, p=p, q=q):
            sol = {(s, g) for s, pp, _, g in store if pp == p}
            return store | {(s, q, "m", g) for s, g in sol}

        return text, replay
    if kind == "quad_delete":
        text = f"DELETE {{ GRAPH <{gx}> {{ ?s <{p}> ?o }} }} WHERE {{ ?s <{p}> ?o }}"

        def replay(store, p=p, gx=gx):
            sol = {(s, o) for s, pp, o, _ in store if pp == p}
            return {
                t for t in store if not (t[1] == p and t[3] == gx and (t[0], t[2]) in sol)
            }

        return text, replay
    if kind == "dw_graph":
        text = f"DELETE WHERE {{ GRAPH <{gx}> {{ ?s <{p}> ?o }} }}"

        def replay(store, p=p, gx=gx):
            return {t for t in store if not (t[1] == p and t[3] == gx)}

        return text, replay
    # mixed: unscoped keeps the anywhere-dedup union contract, the
    # GRAPH block dedups within its target graph
    text = (
        f'INSERT {{ ?s <{q}> "u" GRAPH <{gx}> {{ ?s <{q}> "v" }} }} '
        f"WHERE {{ ?s <{p}> ?o }}"
    )

    def replay(store, p=p, q=q, gx=gx):
        subs = {s for s, pp, _, _ in store if pp == p}
        lex = {(s, pp, o) for s, pp, o, _ in store}
        out = set(store)
        out |= {(s, q, "u", UPD_G) for s in subs if (s, q, "u") not in lex}
        out |= {(s, q, "v", gx) for s in subs if (s, q, "v", gx) not in out}
        return out

    return text, replay


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    initial=quads_st,
    ops=st.lists(quad_operations(), min_size=1, max_size=3),
)
def test_quad_update_sequences_match_set_algebra(spark, initial, ops):
    store = spark.createDataFrame(
        sorted(initial), "subj string, pred string, obj string, graph string"
    )
    text = " ;\n".join(t for t, _ in ops)
    got = {
        (r.subj, r.pred, r.obj, r.graph)
        for r in sparql_update(store, text).collect()
    }
    want = set(initial)
    for _, replay in ops:
        want = replay(want)
    assert got == want
