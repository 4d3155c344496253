"""Differential SPARQL-vs-DuckDB property test.

Each case generates a random tiny triple store plus a query AST that is
rendered BOTH ways — as SPARQL text (executed by ``sparql_query`` on
Spark) and as ANSI SQL over the identical table (executed by DuckDB) —
then compares the result multisets exactly. The grammar slice is chosen
so both renderings have one unambiguous meaning:

- 1-3 triple patterns (shared-variable inner joins, constant slots)
- optional one-pattern OPTIONAL block (left join)
- FILTER from {string equality, CONTAINS, STRLEN comparison, &&, ||}
- optional DISTINCT
- optional GROUP BY one var + one aggregate drawn from {COUNT(?key),
  COUNT(*), COUNT(DISTINCT ?v), MIN(?v), GROUP_CONCAT(DISTINCT ?v)}

This complements the per-query driver oracles: those pin 50 curated
queries; this hunts compiler bugs in the combinatorial space around
join variable topology and filter placement.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.plans.sparql import sparql_query

SUBJECTS = ["http://ex.org/a", "http://ex.org/b", "http://ex.org/c"]
PREDS = ["http://ex.org/p/p1", "http://ex.org/p/p2", "http://ex.org/p/p3"]
OBJECTS = ["http://ex.org/a", "http://ex.org/b", "va", "vbb", "vccc"]
VARS = ["s", "o", "x"]

triple = st.tuples(
    st.sampled_from(SUBJECTS), st.sampled_from(PREDS), st.sampled_from(OBJECTS)
)
store = st.lists(triple, min_size=4, max_size=14, unique=True)


@st.composite
def queries(draw):
    """Return (sparql_text, sql_text) for one random query."""
    n_pat = draw(st.integers(1, 3))
    pats = []
    for i in range(n_pat):
        # subject: shared var (join topology) or a constant
        s = draw(st.sampled_from(["?s", "?s", f"<{draw(st.sampled_from(SUBJECTS))}>"]))
        p = draw(st.sampled_from([f"<{q}>" for q in PREDS]))
        o = draw(st.sampled_from([f"?o{i}", "?x", f'"{draw(st.sampled_from(OBJECTS))}"']))
        pats.append((s, p, o))

    # collect variables in first-mention order
    vars_seen: list[str] = []
    for pat in pats:
        for slot in pat:
            if slot.startswith("?") and slot[1:] not in vars_seen:
                vars_seen.append(slot[1:])

    opt = None
    if draw(st.booleans()) and "s" in vars_seen:
        opt_o = draw(st.sampled_from(["?on", "?x"]))
        opt = ("?s", f"<{draw(st.sampled_from(PREDS))}>", opt_o)
        if opt_o[1:] not in vars_seen:
            vars_seen.append(opt_o[1:])

    filt = None
    # only filter on vars bound in the REQUIRED part (OPTIONAL-var filter
    # scope is subtler; keep the slice unambiguous)
    req_vars = [
        v for v in vars_seen if any(f"?{v}" in pat for pat in pats)
    ]
    if draw(st.booleans()) and req_vars:
        v = draw(st.sampled_from(req_vars))
        kind = draw(st.sampled_from(["eq", "contains", "strlen", "and", "or"]))
        lit = draw(st.sampled_from(OBJECTS))
        if kind == "eq":
            filt = (f'?{v} = "{lit}"', f"{v} = '{lit}'")
        elif kind == "contains":
            sub = draw(st.sampled_from(["a", "b", "v", "c"]))
            filt = (
                f'CONTAINS(?{v}, "{sub}")',
                f"contains({v}, '{sub}')",
            )
        elif kind == "strlen":
            n = draw(st.integers(1, 20))
            op = draw(st.sampled_from(["<", ">", "=", "<=", ">="]))
            filt = (f"STRLEN(?{v}) {op} {n}", f"length({v}) {op} {n}")
        elif kind == "and":
            sub = draw(st.sampled_from(["a", "b", "v"]))
            n = draw(st.integers(1, 20))
            filt = (
                f'CONTAINS(?{v}, "{sub}") && STRLEN(?{v}) < {n}',
                f"(contains({v}, '{sub}') AND length({v}) < {n})",
            )
        else:
            lit2 = draw(st.sampled_from(OBJECTS))
            filt = (
                f'?{v} = "{lit}" || ?{v} = "{lit2}"',
                f"({v} = '{lit}' OR {v} = '{lit2}')",
            )

    distinct = draw(st.booleans())
    group = None
    if not distinct and draw(st.booleans()) and req_vars:
        group = draw(st.sampled_from(req_vars))

    # ---- render SPARQL --------------------------------------------------
    body = " . ".join(" ".join(p) for p in pats)
    if opt:
        body += " OPTIONAL { " + " ".join(opt) + " }"
    if filt:
        body += f" FILTER({filt[0]})"
    agg = None
    if group:
        # aggregate form: the r3 additions (COUNT(*), DISTINCT-modified
        # set functions) fuzz alongside the original COUNT(?key). The
        # aggregated var comes from the REQUIRED part so both renderings
        # see the same non-null bag.
        av = draw(st.sampled_from(req_vars))
        agg = draw(
            st.sampled_from(
                [
                    (f"(COUNT(?{group}) AS ?n)", "CAST(count(*) AS BIGINT) AS n"),
                    ("(COUNT(*) AS ?n)", "CAST(count(*) AS BIGINT) AS n"),
                    (
                        f"(COUNT(DISTINCT ?{av}) AS ?n)",
                        f"CAST(count(DISTINCT {av}) AS BIGINT) AS n",
                    ),
                    (f"(MIN(?{av}) AS ?n)", f"min({av}) AS n"),
                    (
                        f'(GROUP_CONCAT(DISTINCT ?{av}; SEPARATOR="|") AS ?n)',
                        f"string_agg(DISTINCT {av}, '|' ORDER BY {av}) AS n",
                    ),
                ]
            )
        )
        sparql = f"SELECT ?{group} {agg[0]} WHERE {{ {body} }} GROUP BY ?{group}"
    else:
        proj = " ".join(f"?{v}" for v in vars_seen)
        head = "SELECT DISTINCT" if distinct else "SELECT"
        sparql = f"{head} {proj} WHERE {{ {body} }}"

    # ---- render SQL over table t(subj, pred, obj) -----------------------
    # each pattern is an aliased scan; vars map to first-binding columns
    bind: dict[str, str] = {}
    froms, wheres = [], []
    for i, (s, p, o) in enumerate(pats):
        froms.append(f"t AS t{i}")
        for slot, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            ref = f"t{i}.{col}"
            if slot.startswith("?"):
                v = slot[1:]
                if v in bind:
                    wheres.append(f"{bind[v]} = {ref}")
                else:
                    bind[v] = ref
            elif slot.startswith("<"):
                wheres.append(f"{ref} = '{slot[1:-1]}'")
            else:
                wheres.append(f"{ref} = '{slot[1:-1]}'")
    join_sql = ", ".join(froms)
    where_sql = " AND ".join(wheres) if wheres else "TRUE"
    if filt:
        cond = filt[1]
        for v, ref in bind.items():
            cond = cond.replace(f"contains({v},", f"contains({ref},")
            cond = cond.replace(f"length({v})", f"length({ref})")
            cond = cond.replace(f"{v} =", f"{ref} =")
        where_sql = f"({where_sql}) AND {cond}"
    core = f"SELECT {', '.join(f'{ref} AS {v}' for v, ref in bind.items())} FROM {join_sql} WHERE {where_sql}"
    if opt:
        os_, op_, oo = opt
        ov = oo[1:]
        if ov in bind:
            # OPTIONAL re-binding an existing var: left join on BOTH cols
            on = f"q.s = j.subj AND j.pred = '{op_[1:-1]}' AND q.{ov} = j.obj"
            core = (
                f"SELECT q.* FROM ({core}) q LEFT JOIN t j ON {on}"
            )
            # no new column — but SPARQL left-joins compatible rows and
            # KEEPS the row either way, so projection is unchanged
        else:
            on = f"q.s = j.subj AND j.pred = '{op_[1:-1]}'"
            core = (
                f"SELECT q.*, j.obj AS {ov} FROM ({core}) q LEFT JOIN t j ON {on}"
            )
    if group:
        sql = f"SELECT {group} AS {group}, {agg[1]} FROM ({core}) GROUP BY 1"
    elif distinct:
        sql = f"SELECT DISTINCT * FROM ({core})"
    else:
        sql = f"SELECT * FROM ({core})"
    return sparql, sql


def _render_arm(pats, alias_prefix):
    """Render a BGP arm both ways: (sparql_body, sql_core, var_order).
    ``sql_core`` selects each variable (first-binding column) AS its
    name from the aliased scans with constant/shared-var constraints."""
    bind: dict[str, str] = {}
    froms, wheres = [], []
    for i, (s, p, o) in enumerate(pats):
        a = f"{alias_prefix}{i}"
        froms.append(f"t AS {a}")
        for slot, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            ref = f"{a}.{col}"
            if slot.startswith("?"):
                v = slot[1:]
                if v in bind:
                    wheres.append(f"{bind[v]} = {ref}")
                else:
                    bind[v] = ref
            else:
                wheres.append(f"{ref} = '{slot[1:-1]}'")
    body = " . ".join(" ".join(p) for p in pats)
    where_sql = " AND ".join(wheres) if wheres else "TRUE"
    sel = ", ".join(f"{ref} AS {v}" for v, ref in bind.items()) or "1 AS one"
    core = f"SELECT {sel} FROM {', '.join(froms)} WHERE {where_sql}"
    return body, core, list(bind)


@st.composite
def arm(draw, prefix, var_pool):
    pats = []
    for i in range(draw(st.integers(1, 2))):
        s = draw(st.sampled_from(["?s", f"<{draw(st.sampled_from(SUBJECTS))}>"]))
        p = draw(st.sampled_from([f"<{q}>" for q in PREDS]))
        o = draw(
            st.sampled_from(
                [f"?{draw(st.sampled_from(var_pool))}", f'"{draw(st.sampled_from(OBJECTS))}"']
            )
        )
        pats.append((s, p, o))
    return pats


@st.composite
def compound_queries(draw):
    """UNION / MINUS / BIND / nested-group / OPTIONAL-union shapes."""
    shape = draw(
        st.sampled_from(
            [
                "union", "minus", "bind", "nested", "opt_union",
                "opt_compat", "minus_compat", "exists_compat",
            ]
        )
    )
    pats_a = draw(arm("a", ["oa", "x"]))
    body_a, core_a, vars_a = _render_arm(pats_a, "a")

    if shape in ("minus_compat", "exists_compat"):
        # UNION-nullable ?m shared with a MINUS / FILTER [NOT] EXISTS
        # group: spec compatibility treats the unbound ?m as matching
        # anything. MINUS additionally needs a domain overlap — ?s is
        # bound on both sides here, so it always holds and the SQL
        # oracle can state compatibility alone.
        if "s" not in vars_a:
            pats_a = [("?s", f"<{PREDS[0]}>", "?oa")] + pats_a
            body_a, core_a, vars_a = _render_arm(pats_a, "a")
        pu = draw(st.sampled_from(PREDS))
        pg = draw(st.sampled_from(PREDS))
        allv = vars_a + ["m"]
        proj = " ".join(f"?{v}" for v in allv)
        ext_a = ", ".join([*(f"{v}" for v in vars_a), "NULL AS m"])
        arm2_vals = ", ".join(
            [("subj AS s" if v == "s" else f"NULL AS {v}") for v in vars_a]
            + ["obj AS m"]
        )
        base = (
            f"SELECT {ext_a} FROM ({core_a}) "
            f"UNION ALL SELECT {arm2_vals} FROM t WHERE pred = '{pu}'"
        )
        probe = (
            f"SELECT 1 FROM t WHERE pred = '{pg}' AND subj = b.s "
            f"AND (b.m IS NULL OR obj = b.m)"
        )
        if shape == "minus_compat":
            clause, guard = "MINUS", "NOT EXISTS"
        else:
            negated = draw(st.booleans())
            clause = f"FILTER {'NOT ' if negated else ''}EXISTS"
            guard = "NOT EXISTS" if negated else "EXISTS"
        sparql = (
            f"SELECT {proj} WHERE {{ {{ {body_a} }} UNION {{ ?s <{pu}> ?m }} "
            f"{clause} {{ ?s <{pg}> ?m }} }}"
        )
        sql = f"SELECT * FROM ({base}) b WHERE {guard} ({probe})"
        return sparql, sql

    if shape == "opt_compat":
        # a UNION-nullable ?m shared with an OPTIONAL: SPARQL LeftJoin
        # treats the unbound ?m as compatible and takes the bound value
        # (the compatible-mapping left join). SQL renders the same
        # semantics explicitly: null-or-equal join, COALESCE merge.
        if "s" not in vars_a:
            pats_a = [("?s", f"<{PREDS[0]}>", "?oa")] + pats_a
            body_a, core_a, vars_a = _render_arm(pats_a, "a")
        pu = draw(st.sampled_from(PREDS))
        po = draw(st.sampled_from(PREDS))
        allv = vars_a + ["m"]
        proj = " ".join(f"?{v}" for v in allv)
        sparql = (
            f"SELECT {proj} WHERE {{ {{ {body_a} }} UNION {{ ?s <{pu}> ?m }} "
            f"OPTIONAL {{ ?s <{po}> ?m }} }}"
        )
        ext_a = ", ".join([*(f"{v}" for v in vars_a), "NULL AS m"])
        # UNION ALL is positional: arm 2's column order must follow
        # ext_a's (vars_a order, then m), not put s first
        arm2_vals = ", ".join(
            [("subj AS s" if v == "s" else f"NULL AS {v}") for v in vars_a]
            + ["obj AS m"]
        )
        base = (
            f"SELECT {ext_a} FROM ({core_a}) "
            f"UNION ALL SELECT {arm2_vals} FROM t WHERE pred = '{pu}'"
        )
        keep = ", ".join(f"b.{v}" for v in vars_a)
        sql = (
            f"SELECT {keep}, COALESCE(b.m, u.m2) AS m FROM ({base}) b "
            f"LEFT JOIN (SELECT subj AS s2, obj AS m2 FROM t "
            f"WHERE pred = '{po}') u "
            f"ON b.s = u.s2 AND (b.m IS NULL OR b.m = u.m2)"
        )
        return sparql, sql

    if shape == "nested":
        # '{ group } pattern(s)': the lone braced group compiles
        # recursively and joins the enclosing group on shared vars
        pats_b = draw(arm("b", ["ob", "x"]))
        body_b, core_b, vars_b = _render_arm(pats_b, "b")
        if not vars_a or not vars_b:
            shape = "bind"
        else:
            allv = vars_a + [v for v in vars_b if v not in vars_a]
            proj = " ".join(f"?{v}" for v in allv)
            sparql = f"SELECT {proj} WHERE {{ {{ {body_a} }} {body_b} }}"
            shared = [v for v in vars_a if v in vars_b]
            bsel = ", ".join(f"b.{v}" for v in vars_b if v not in vars_a)
            sel = "a.*" + (f", {bsel}" if bsel else "")
            if shared:
                on = " AND ".join(f"a.{v} = b.{v}" for v in shared)
                sql = f"SELECT {sel} FROM ({core_a}) a JOIN ({core_b}) b ON {on}"
            else:
                sql = f"SELECT {sel} FROM ({core_a}) a CROSS JOIN ({core_b}) b"
            return sparql, sql

    if shape == "opt_union":
        if "s" not in vars_a:
            shape = "bind"
        else:
            p1 = draw(st.sampled_from(PREDS))
            p2 = draw(st.sampled_from(PREDS))
            proj = " ".join(f"?{v}" for v in vars_a) + " ?ov"
            sparql = (
                f"SELECT {proj} WHERE {{ {body_a} OPTIONAL {{ "
                f"{{ ?s <{p1}> ?ov }} UNION {{ ?s <{p2}> ?ov }} }} }}"
            )
            sql = (
                f"SELECT q.*, u.ov FROM ({core_a}) q LEFT JOIN ("
                f"SELECT subj AS s, obj AS ov FROM t WHERE pred = '{p1}' "
                f"UNION ALL SELECT subj, obj FROM t WHERE pred = '{p2}'"
                f") u ON q.s = u.s"
            )
            return sparql, sql

    if shape == "union":
        pats_b = draw(arm("b", ["ob", "x"]))
        body_b, core_b, vars_b = _render_arm(pats_b, "b")
        if not vars_a or not vars_b:
            shape = "bind"  # degenerate arm; fall through to a bind case
        else:
            # optionally FILTER inside arm A — the filter must stay in
            # ARM scope (the recursive arm compile), constraining only
            # that arm's solutions
            if draw(st.booleans()):
                v = draw(st.sampled_from(vars_a))
                n = draw(st.integers(1, 30))
                body_a += f" FILTER(STRLEN(?{v}) < {n})"
                core_a = (
                    f"SELECT * FROM ({core_a}) WHERE length({v}) < {n}"
                )
            allv = vars_a + [v for v in vars_b if v not in vars_a]
            proj = " ".join(f"?{v}" for v in allv)
            sparql = f"SELECT {proj} WHERE {{ {{ {body_a} }} UNION {{ {body_b} }} }}"
            ext_a = ", ".join(
                (v if v in vars_a else f"NULL AS {v}") for v in allv
            )
            ext_b = ", ".join(
                (v if v in vars_b else f"NULL AS {v}") for v in allv
            )
            sql = (
                f"SELECT {ext_a} FROM ({core_a}) "
                f"UNION ALL SELECT {ext_b} FROM ({core_b})"
            )
            return sparql, sql

    if shape == "minus":
        pats_b = draw(arm("b", ["oa", "x"]))  # may share vars with arm A
        body_b, core_b, vars_b = _render_arm(pats_b, "b")
        if not vars_a:
            shape = "bind"
        else:
            proj = " ".join(f"?{v}" for v in vars_a)
            sparql = f"SELECT {proj} WHERE {{ {body_a} MINUS {{ {body_b} }} }}"
            shared = [v for v in vars_a if v in vars_b]
            if shared:
                on = " AND ".join(f"q.{v} = m.{v}" for v in shared)
                sql = (
                    f"SELECT * FROM ({core_a}) q WHERE NOT EXISTS "
                    f"(SELECT 1 FROM ({core_b}) m WHERE {on})"
                )
            else:
                # disjoint domains: SPARQL MINUS removes nothing
                sql = f"SELECT * FROM ({core_a})"
            return sparql, sql

    # bind shape (also the degenerate-arm fallback)
    if not vars_a:
        pats_a = [("?s", f"<{PREDS[0]}>", "?oa")]
        body_a, core_a, vars_a = _render_arm(pats_a, "a")
    v = draw(st.sampled_from(vars_a))
    n = draw(st.integers(0, 9))
    proj = " ".join(f"?{u}" for u in vars_a)
    sparql = (
        f"SELECT {proj} ?w WHERE {{ {body_a} . "
        f"BIND(STRLEN(?{v}) + {n} AS ?w) }}"
    )
    sql = (
        f"SELECT *, CAST(length({v}) + {n} AS DOUBLE) AS w FROM ({core_a})"
    )
    return sparql, sql


def _render_graph_arm(pats, alias_prefix):
    """Like ``_render_arm`` but over the quad table: all patterns in the
    arm scan the SAME named graph, and the graph name projects as g."""
    bind: dict[str, str] = {}
    froms, wheres = [], []
    for i, (s, p, o) in enumerate(pats):
        a = f"{alias_prefix}{i}"
        froms.append(f"t AS {a}")
        if i > 0:
            wheres.append(f"{alias_prefix}0.graph = {a}.graph")
        for slot, col in ((s, "subj"), (p, "pred"), (o, "obj")):
            ref = f"{a}.{col}"
            if slot.startswith("?"):
                v = slot[1:]
                if v in bind:
                    wheres.append(f"{bind[v]} = {ref}")
                else:
                    bind[v] = ref
            else:
                wheres.append(f"{ref} = '{slot[1:-1]}'")
    body = " . ".join(" ".join(p) for p in pats)
    where_sql = " AND ".join(wheres) if wheres else "TRUE"
    sel = ", ".join(
        [f"{alias_prefix}0.graph AS g"]
        + [f"{ref} AS {v}" for v, ref in bind.items()]
    )
    core = f"SELECT {sel} FROM {', '.join(froms)} WHERE {where_sql}"
    return body, core, list(bind)


@st.composite
def graph_group_queries(draw):
    """GRAPH ?g over FULL group bodies (the graph-distribution rewrite):
    per-graph OPTIONAL / UNION / MINUS / NOT EXISTS / FILTER, rendered as
    graph-correlated SQL over the quad table."""
    shape = draw(
        st.sampled_from(
            ["opt", "union", "minus", "not_exists", "filter",
             "from_default", "from_named", "subselect", "slice",
             "union_subselect"]
        )
    )
    pats_a = draw(arm("a", ["oa", "x"]))
    if not any("?s" in p for p in pats_a):
        pats_a = [("?s", f"<{draw(st.sampled_from(PREDS))}>", "?oa")] + pats_a
    body_a, core_a, vars_a = _render_graph_arm(pats_a, "a")

    if shape == "subselect":
        # subquery inside GRAPH ?g: evaluated per named graph — the
        # aggregate's (implicit or explicit) grouping gains g as a key.
        # SQL renders that directly: GROUP BY g [, key] over the
        # graph-correlated arm.
        plain_body, _pc, _pv = _render_arm(pats_a, "a")
        if draw(st.booleans()):
            sparql = (
                f"SELECT ?g ?n WHERE {{ GRAPH ?g {{ "
                f"{{ SELECT (COUNT(?s) AS ?n) WHERE {{ {plain_body} }} }} }} }}"
            )
            sql = (
                f"SELECT g, CAST(COUNT(*) AS BIGINT) AS n "
                f"FROM ({core_a}) GROUP BY g"
            )
        else:
            sparql = (
                f"SELECT ?g ?s ?n WHERE {{ GRAPH ?g {{ "
                f"{{ SELECT ?s (COUNT(?s) AS ?n) WHERE {{ {plain_body} }} "
                f"GROUP BY ?s }} }} }}"
            )
            sql = (
                f"SELECT g, s, CAST(COUNT(*) AS BIGINT) AS n "
                f"FROM ({core_a}) GROUP BY g, s"
            )
        return sparql, sql

    if shape == "union_subselect":
        # r5: a SUBQUERY as a UNION arm inside GRAPH ?g — the subquery
        # arm evaluates per named graph (its projection gains ?g) and
        # bag-unions with the plain arm. SQL: UNION ALL of the
        # graph-correlated projection and the plain-arm scan.
        plain_body, _pc, _pv = _render_arm(pats_a, "a")
        p2 = draw(st.sampled_from(PREDS))
        sub_arm = f"{{ SELECT ?s WHERE {{ {plain_body} }} }}"
        plain_arm = f"{{ ?s <{p2}> ?zb }}"
        sub_sql = f"SELECT g, s FROM ({core_a})"
        plain_sql = (
            f"SELECT graph AS g, subj AS s FROM t WHERE pred = '{p2}'"
        )
        if draw(st.booleans()):
            arms_sparql = f"{sub_arm} UNION {plain_arm}"
        else:
            arms_sparql = f"{plain_arm} UNION {sub_arm}"
        sparql = (
            f"SELECT ?g ?s WHERE {{ GRAPH ?g {{ {arms_sparql} }} }}"
        )
        # the plain arm binds ?zb too, so solutions carry a null ?zb
        # on the subquery side — project both arms to (g, s) only by
        # keeping ?zb out of the SELECT
        sql = f"{sub_sql} UNION ALL {plain_sql}"
        return sparql, sql

    if shape == "slice":
        # per-graph solution modifiers: ORDER BY/LIMIT/OFFSET inside a
        # GRAPH ?g subquery slice EACH graph's ordered ?s sequence (the
        # GRAPHSLICE window rewrite). SQL renders the same slice as a
        # row_number window partitioned by g. Ordering solely by ?s is a
        # total order on the projected sequence (a bag of ?s values), so
        # tie order cannot change the sliced multiset.
        k = draw(st.integers(1, 4))
        j = draw(st.integers(0, 3))
        use_offset = draw(st.booleans())
        plain_body, _pc, _pv = _render_arm(pats_a, "a")
        off_sparql = f" OFFSET {j}" if use_offset else ""
        lo = j if use_offset else 0
        sparql = (
            f"SELECT ?g ?s WHERE {{ GRAPH ?g {{ "
            f"{{ SELECT ?s WHERE {{ {plain_body} }} "
            f"ORDER BY ?s LIMIT {k}{off_sparql} }} }} }}"
        )
        sql = (
            f"SELECT g, s FROM ("
            f"SELECT g, s, row_number() OVER (PARTITION BY g ORDER BY s) AS rn "
            f"FROM ({core_a})) WHERE rn > {lo} AND rn <= {lo + k}"
        )
        return sparql, sql

    if shape == "from_default":
        # FROM merges graphs into the default graph (set union of
        # triples); plain patterns scan that merge. SQL: the same arm
        # over a DISTINCT-triples view of the chosen graphs.
        gs = draw(st.sampled_from([["g1"], ["g2"], ["g1", "g2"]]))
        froms = " ".join(f"FROM <{g}>" for g in gs)
        proj = " ".join(f"?{v}" for v in vars_a)
        plain_body, plain_core, _ = _render_arm(pats_a, "a")
        inlist = ", ".join(f"'{g}'" for g in gs)
        merged = (
            f"(SELECT DISTINCT subj, pred, obj FROM t WHERE graph IN ({inlist}))"
        )
        sql = plain_core.replace("t AS a", f"{merged} AS a")
        sparql = f"SELECT {proj} {froms} WHERE {{ {plain_body} }}"
        return sparql, sql

    if shape == "from_named":
        # FROM NAMED restricts which graphs GRAPH ?g ranges over
        gs = draw(st.sampled_from([["g1"], ["g2"], ["g1", "g2"]]))
        froms = " ".join(f"FROM NAMED <{g}>" for g in gs)
        proj = " ".join(f"?{v}" for v in vars_a)
        inlist = ", ".join(f"'{g}'" for g in gs)
        sparql = f"SELECT ?g {proj} {froms} WHERE {{ GRAPH ?g {{ {body_a} }} }}"
        sql = f"SELECT * FROM ({core_a}) WHERE g IN ({inlist})"
        return sparql, sql

    if shape in ("opt", "minus", "not_exists"):
        # one-pattern inner group; subject var chosen shared or disjoint
        inner_s = draw(st.sampled_from(["?s", "?zz"]))
        p2 = draw(st.sampled_from(PREDS))
        inner = f"{inner_s} <{p2}> ?m"
        inner_core = (
            f"SELECT graph AS g, subj AS sv, obj AS m FROM t WHERE pred = '{p2}'"
        )
        shared_s = inner_s == "?s"
        proj = " ".join(f"?{v}" for v in vars_a)
        if shape == "opt":
            sparql = (
                f"SELECT ?g {proj} ?m WHERE {{ GRAPH ?g {{ {body_a} "
                f"OPTIONAL {{ {inner} }} }} }}"
            )
            on = "q.g = u.g" + (" AND q.s = u.sv" if shared_s else "")
            sql = (
                f"SELECT q.*, u.m FROM ({core_a}) q "
                f"LEFT JOIN ({inner_core}) u ON {on}"
            )
        elif shape == "minus":
            sparql = (
                f"SELECT ?g {proj} WHERE {{ GRAPH ?g {{ {body_a} "
                f"MINUS {{ {inner} }} }} }}"
            )
            if shared_s:
                sql = (
                    f"SELECT * FROM ({core_a}) q WHERE NOT EXISTS ("
                    f"SELECT 1 FROM ({inner_core}) m "
                    f"WHERE m.g = q.g AND m.sv = q.s)"
                )
            else:
                # disjoint binding domains: SPARQL MINUS is a no-op
                sql = f"SELECT * FROM ({core_a})"
        else:  # not_exists — correlates on the ACTIVE graph even when
            # no variable is shared (no disjoint-domain rule for EXISTS)
            sparql = (
                f"SELECT ?g {proj} WHERE {{ GRAPH ?g {{ {body_a} "
                f"FILTER NOT EXISTS {{ {inner} }} }} }}"
            )
            corr = "m.g = q.g" + (" AND m.sv = q.s" if shared_s else "")
            sql = (
                f"SELECT * FROM ({core_a}) q WHERE NOT EXISTS ("
                f"SELECT 1 FROM ({inner_core}) m WHERE {corr})"
            )
        return sparql, sql

    if shape == "union":
        pats_b = draw(arm("b", ["ob", "x"]))
        body_b, core_b, vars_b = _render_graph_arm(pats_b, "b")
        if not vars_b:
            pats_b = [("?s", f"<{PREDS[1]}>", "?ob")]
            body_b, core_b, vars_b = _render_graph_arm(pats_b, "b")
        allv = vars_a + [v for v in vars_b if v not in vars_a]
        proj = " ".join(f"?{v}" for v in allv)
        sparql = (
            f"SELECT ?g {proj} WHERE {{ GRAPH ?g {{ "
            f"{{ {body_a} }} UNION {{ {body_b} }} }} }}"
        )
        ext_a = ", ".join(["g"] + [(v if v in vars_a else f"NULL AS {v}") for v in allv])
        ext_b = ", ".join(["g"] + [(v if v in vars_b else f"NULL AS {v}") for v in allv])
        sql = (
            f"SELECT {ext_a} FROM ({core_a}) "
            f"UNION ALL SELECT {ext_b} FROM ({core_b})"
        )
        return sparql, sql

    # filter shape
    v = draw(st.sampled_from(vars_a))
    n = draw(st.integers(1, 30))
    proj = " ".join(f"?{u}" for u in vars_a)
    sparql = (
        f"SELECT ?g {proj} WHERE {{ GRAPH ?g {{ {body_a} "
        f"FILTER(STRLEN(?{v}) < {n}) }} }}"
    )
    sql = f"SELECT * FROM ({core_a}) WHERE length({v}) < {n}"
    return sparql, sql


quad = st.tuples(
    st.sampled_from(SUBJECTS),
    st.sampled_from(PREDS),
    st.sampled_from(OBJECTS),
    st.sampled_from(["g1", "g2"]),
)
quad_store = st.lists(quad, min_size=4, max_size=14, unique=True)


@pytest.fixture(scope="module")
def _shared(spark):
    return spark


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=store, q=queries())
def test_sparql_matches_duckdb(_shared, data, q):
    spark = _shared
    sparql_text, sql_text = q
    sdf = spark.createDataFrame(data, "subj string, pred string, obj string")
    try:
        got_df = sparql_query(sdf, sparql_text)
    except ValueError:
        # loud refusal of an out-of-slice query is acceptable behavior;
        # the differential property only covers what the engine accepts
        return
    def _key(t):
        return tuple((x is not None, x if x is not None else "") for x in t)

    got_cols = got_df.columns
    got = sorted(
        (tuple(row[c] for c in sorted(got_cols)) for row in got_df.collect()),
        key=_key,
    )

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(subj VARCHAR, pred VARCHAR, obj VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
        cur = con.execute(sql_text)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in sorted(cols)]
        want = sorted(
            (tuple(r[i] for i in order) for r in cur.fetchall()), key=_key
        )
    finally:
        con.close()

    assert sorted(got_cols) == sorted(cols), (sparql_text, sql_text)
    assert got == want, (sparql_text, sql_text)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=store, q=compound_queries())
def test_compound_sparql_matches_duckdb(_shared, data, q):
    test_sparql_matches_duckdb.hypothesis.inner_test(_shared, data, q)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=quad_store, q=graph_group_queries())
def test_graph_group_sparql_matches_duckdb(_shared, data, q):
    """Differential check of the GRAPH-?var full-group distribution: the
    SQL side correlates every construct on the graph column explicitly,
    which is exactly the per-named-graph evaluation the rewrite claims."""
    spark = _shared
    sparql_text, sql_text = q
    sdf = spark.createDataFrame(
        data, "subj string, pred string, obj string, graph string"
    )
    try:
        got_df = sparql_query(sdf, sparql_text)
    except ValueError:
        return

    def _key(t):
        return tuple((x is not None, x if x is not None else "") for x in t)

    got_cols = got_df.columns
    got = sorted(
        (tuple(row[c] for c in sorted(got_cols)) for row in got_df.collect()),
        key=_key,
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE t(subj VARCHAR, pred VARCHAR, obj VARCHAR, graph VARCHAR)"
        )
        con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", data)
        cur = con.execute(sql_text)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in sorted(cols)]
        want = sorted(
            (tuple(r[i] for i in order) for r in cur.fetchall()), key=_key
        )
    finally:
        con.close()
    assert sorted(got_cols) == sorted(cols), (sparql_text, sql_text)
    assert got == want, (sparql_text, sql_text)


# --- r5: date/time accessor differential (YEAR/MONTH/DAY/HOURS/MINUTES) ----
# The accessors parse the literal as a zoneless timestamp and return the
# components AS WRITTEN; DuckDB's try_cast + date_part over the same
# lexical forms is the oracle. Malformed terms → NULL on both sides
# (unbound BIND / NULL column), so the row-preserving behavior is
# differentially pinned too.

_DT_LEX = st.one_of(
    st.tuples(
        st.integers(1970, 2199),
        st.integers(1, 12),
        st.integers(1, 28),
        st.integers(0, 23),
        st.integers(0, 59),
        st.integers(0, 59),
    ).map(lambda t: "%04d-%02d-%02dT%02d:%02d:%02d" % t),
    st.tuples(st.integers(1970, 2199), st.integers(1, 12), st.integers(1, 28)).map(
        lambda t: "%04d-%02d-%02d" % t
    ),
    st.sampled_from(["not-a-date", "2023-13-99T99:99:99", "", "42"]),
)

_dt_store = st.lists(
    st.tuples(st.sampled_from(SUBJECTS), st.just(PREDS[0]), _DT_LEX),
    min_size=2,
    max_size=10,
    unique_by=lambda t: (t[0], t[2]),
)

_ACCESSORS = {
    "YEAR": "year",
    "MONTH": "month",
    "DAY": "day",
    "HOURS": "hour",
    "MINUTES": "minute",
}


@st.composite
def _dt_queries(draw):
    fn = draw(st.sampled_from(sorted(_ACCESSORS)))
    sqlf = _ACCESSORS[fn]
    shape = draw(st.sampled_from(["bind", "filter"]))
    if shape == "bind":
        sparql = (
            f"SELECT ?s ?o ({fn}(?o) AS ?c) "
            f"WHERE {{ ?s <{PREDS[0]}> ?o }}"
        )
        sql = (
            f"SELECT subj AS s, obj AS o, "
            f"{sqlf}(try_cast(obj AS TIMESTAMP)) AS c "
            f"FROM t WHERE pred = '{PREDS[0]}'"
        )
        return sparql, sql
    n = draw(st.integers(1, 2100))
    op, sqlop = draw(st.sampled_from([("<", "<"), (">=", ">=")]))
    sparql = (
        f"SELECT ?s ?o WHERE {{ ?s <{PREDS[0]}> ?o . "
        f"FILTER({fn}(?o) {op} {n}) }}"
    )
    sql = (
        f"SELECT subj AS s, obj AS o FROM t WHERE pred = '{PREDS[0]}' "
        f"AND {sqlf}(try_cast(obj AS TIMESTAMP)) {sqlop} {n}"
    )
    return sparql, sql


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(data=_dt_store, q=_dt_queries())
def test_datetime_accessors_match_duckdb(_shared, data, q):
    spark = _shared
    sparql_text, sql_text = q
    sdf = spark.createDataFrame(data, "subj string, pred string, obj string")
    got_df = sparql_query(sdf, sparql_text)

    def _key(t):
        return tuple((x is not None, str(x) if x is not None else "") for x in t)

    got_cols = got_df.columns
    got = sorted(
        (
            tuple(
                float(row[c]) if isinstance(row[c], (int, float)) else row[c]
                for c in sorted(got_cols)
            )
            for row in got_df.collect()
        ),
        key=_key,
    )
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t(subj VARCHAR, pred VARCHAR, obj VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?, ?)", data)
        cur = con.execute(sql_text)
        cols = [d[0] for d in cur.description]
        order = [cols.index(c) for c in sorted(cols)]
        want = sorted(
            (
                tuple(
                    float(r[i]) if isinstance(r[i], (int, float)) else r[i]
                    for i in order
                )
                for r in cur.fetchall()
            ),
            key=_key,
        )
    finally:
        con.close()
    assert sorted(got_cols) == sorted(cols), (sparql_text, sql_text)
    assert got == want, (sparql_text, sql_text)
