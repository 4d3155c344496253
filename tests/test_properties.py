"""Property-based spot checks (SURVEY §5.5): dedup idempotence,
extraction determinism under row-order permutation, N-Triples round-trip,
closure reflexivity/transitivity invariants. Small hypothesis budgets —
each example spins Spark jobs."""

import random

from hypothesis import given, settings, strategies as st

from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.operators.extract import (
    dedup_triples,
    extract_ntriples,
    extract_patterns,
)
from graphforge_spark.schemas import TRANSCRIPT_SCHEMA

SETTLE = dict(max_examples=5, deadline=None)


def _triples(df):
    return sorted(
        (r.subj, r.pred, r.obj, r.obj_is_literal, r.src_conv_id, r.src_turn_idx)
        for r in df.collect()
    )


@given(seed=st.integers(0, 10**6))
@settings(**SETTLE)
def test_extraction_deterministic_under_row_permutation(spark, seed):
    fx = gen_transcripts(seed=seed % 50, n_convs=4, turns_per_conv=3)
    rows = [r for r in fx.rows if r[4] is None]
    rng = random.Random(seed)
    shuffled = rows[:]
    rng.shuffle(shuffled)
    a = _triples(extract_patterns(spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)))
    b = _triples(extract_patterns(spark.createDataFrame(shuffled, TRANSCRIPT_SCHEMA)))
    assert a == b


@given(seed=st.integers(0, 10**6))
@settings(**SETTLE)
def test_dedup_idempotent(spark, seed):
    fx = gen_transcripts(seed=seed % 50, n_convs=4, turns_per_conv=3)
    df = spark.createDataFrame(fx.rows, TRANSCRIPT_SCHEMA)
    once = dedup_triples(extract_patterns(df))
    twice = dedup_triples(once)
    assert _triples(once) == _triples(twice)
    # dedup of doubled input == dedup of single input
    doubled = dedup_triples(extract_patterns(df.union(df)))
    assert _triples(doubled) == _triples(once)


@given(
    facts=st.lists(
        st.tuples(
            st.sampled_from(["http://ex.org/e/A", "http://ex.org/e/B", "_:b1"]),
            st.sampled_from(["http://ex.org/p/p1", "http://ex.org/p/p2"]),
            st.text(
                alphabet=st.characters(
                    whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7E
                ),
                min_size=1,
                max_size=12,
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTLE)
def test_ntriples_roundtrip(spark, facts):
    """Serialize facts as N-Triples text, parse back, compare. Literal
    bodies restricted to escape-free characters here; escaping has its own
    deterministic unit coverage in test_extract."""
    lines = []
    for s, p, o, lit in facts:
        obj = f'"{o}"' if lit else f"<http://ex.org/o/{o}>"
        subj = s if s.startswith("_:") else f"<{s}>"
        lines.append(f"{subj} <{p}> {obj} .")
    df = spark.createDataFrame(
        [("c0", 0, "tool", "\n".join(lines), "ntriples", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    parsed = {
        (r.subj, r.pred, r.obj, r.obj_is_literal)
        for r in extract_ntriples(df).collect()
    }
    expected = {
        (s, p, o if lit else f"http://ex.org/o/{o}", lit) for s, p, o, lit in facts
    }
    assert parsed == expected


# ---------------------------------------------------------------------------
# FILTER compiler: random boolean trees with hostile literals
# ---------------------------------------------------------------------------

# characters that historically derail naive SPARQL parsing when they
# appear inside string literals: parens, boolean operators, keywords
_NASTY = ["o1", "a)b", "x&&y", "p||q", "BIND", "(", "))", "a.b", "VALUES x"]


def _render_cond(tree) -> str:
    """Render a condition AST to SPARQL FILTER text (always parenthesized)."""
    kind = tree[0]
    if kind == "cmp":
        _, var, op, lit = tree
        return f'?{var} {op} "{lit}"'
    if kind == "strlen":
        _, var, k, op, n = tree
        return f"STRLEN(?{var}) + {k} {op} {n}"
    if kind == "isnum":
        return f"isNumeric(?{tree[1]})"
    if kind == "sameterm":
        _, var, lit = tree
        return f'sameTerm(?{var}, "{lit}")'
    if kind == "contains":
        _, var, lit = tree
        return f'CONTAINS(?{var}, "{lit}")'
    _, op, left, right = tree
    return f"({_render_cond(left)}) {op} ({_render_cond(right)})"


_NUM_SHAPE = __import__("re").compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")


def _eval_cond(tree, row: dict) -> bool:
    kind = tree[0]
    if kind == "cmp":
        _, var, op, lit = tree
        v = row[var]
        return {"=": v == lit, "!=": v != lit, "<": v < lit, ">": v > lit}[op]
    if kind == "strlen":
        _, var, k, op, n = tree
        x = len(row[var]) + k
        return {"=": x == n, "!=": x != n, "<": x < n, ">": x > n}[op]
    if kind == "isnum":
        return bool(_NUM_SHAPE.match(row[tree[1]]))
    if kind == "sameterm":
        _, var, lit = tree
        return row[var] == lit
    if kind == "contains":
        _, var, lit = tree
        return lit in row[var]
    # SPARQL || / && over non-null strings are plain boolean algebra
    _, op, left, right = tree
    a, b = _eval_cond(left, row), _eval_cond(right, row)
    return (a or b) if op == "||" else (a and b)


@st.composite
def _cond_trees(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        atom = draw(st.sampled_from(["cmp", "strlen", "isnum", "sameterm", "contains"]))
        var = draw(st.sampled_from(["s", "o"]))
        if atom == "cmp":
            return (
                "cmp",
                var,
                draw(st.sampled_from(["=", "!=", "<", ">"])),
                draw(st.sampled_from(_NASTY)),
            )
        if atom == "strlen":
            return (
                "strlen",
                var,
                draw(st.integers(0, 3)),
                draw(st.sampled_from(["=", "!=", "<", ">"])),
                draw(st.integers(0, 10)),
            )
        if atom == "isnum":
            return ("isnum", var)
        if atom == "sameterm":
            return ("sameterm", var, draw(st.sampled_from(_NASTY)))
        return ("contains", var, draw(st.sampled_from(_NASTY)))
    return (
        "bool",
        draw(st.sampled_from(["&&", "||"])),
        draw(_cond_trees(depth=depth + 1)),
        draw(_cond_trees(depth=depth + 1)),
    )


@given(tree=_cond_trees())
@settings(max_examples=30, deadline=None)
def test_filter_compiler_matches_python_eval(spark, tree):
    """Compile a random ||/&&/paren condition tree (with literals that
    contain parens, '&&', '||', and keywords) and compare row-for-row
    against a direct Python evaluation of the same tree."""
    from graphforge_spark.plans.sparql import sparql_query

    rows = [
        (v, "p", o)
        for v in ("a)b", "o1", "zz", "12")
        for o in ("o1", "x&&y", "q", "-3.5")
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    q = f"SELECT ?s ?o WHERE {{ ?s <p> ?o . FILTER({_render_cond(tree)}) }}"
    got = {(r.s, r.o) for r in sparql_query(df, q).collect()}
    want = {
        (s, o) for s, _, o in rows if _eval_cond(tree, {"s": s, "o": o})
    }
    assert got == want
