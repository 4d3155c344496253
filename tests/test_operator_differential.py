"""Differential property tests for the temporal operators (vs DuckDB)
and connected components (vs a Python union-find oracle): random keyed
event sets probe the boundary semantics the curated driver oracle can
under-sample — exact timestamp ties between the two sides of the as-of
join (``>=`` same-instant matching), interval endpoints touching the
point exactly (inclusive bounds), and CC over self-loops/cycles/chains.

Timestamps are plain integers here: both engines order them
identically, so any divergence is operator logic, never timezone or
epoch-conversion noise.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.operators.temporal import asof_join, range_join_intervals

KEYS = ["u1", "u2", "u3"]

lefts = st.lists(
    st.tuples(st.integers(0, 999), st.sampled_from(KEYS), st.integers(0, 40)),
    min_size=1,
    max_size=12,
)
# right side: unique (key, ts) so the latest-at-or-before row is
# unambiguous in both engines
rights = st.dictionaries(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 40)),
    st.integers(0, 99),
    min_size=1,
    max_size=12,
)


@pytest.fixture(scope="module")
def _shared(spark):
    return spark


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(ldata=lefts, rdata=rights)
def test_asof_join_matches_duckdb(_shared, ldata, rdata):
    spark = _shared
    rrows = [(k, t, v) for (k, t), v in rdata.items()]
    ldf = spark.createDataFrame(ldata, "id int, k string, t int")
    rdf = spark.createDataFrame(rrows, "k string, t int, v int")
    out = asof_join(ldf, rdf, ["k"], "t", ["v"])
    got = sorted(
        ((r.id, r.k, r.t, r.asof_v) for r in out.collect()),
        key=lambda x: (x[0], x[1], x[2], x[3] is not None, x[3] or 0),
    )

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE l(id INT, k VARCHAR, t INT)")
        con.execute("CREATE TABLE r(k VARCHAR, t INT, v INT)")
        con.executemany("INSERT INTO l VALUES (?, ?, ?)", ldata)
        con.executemany("INSERT INTO r VALUES (?, ?, ?)", rrows)
        want = sorted(
            (tuple(row) for row in con.execute(
                "SELECT l.id, l.k, l.t, r.v FROM l "
                "ASOF LEFT JOIN r ON l.k = r.k AND r.t <= l.t"
            ).fetchall()),
            key=lambda x: (x[0], x[1], x[2], x[3] is not None, x[3] or 0),
        )
    finally:
        con.close()
    assert got == want


points = st.lists(
    st.tuples(st.integers(0, 999), st.sampled_from(KEYS), st.integers(0, 30)),
    min_size=1,
    max_size=10,
)
intervals = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.integers(0, 30),
        st.integers(0, 10),  # length; end = start + length (touching OK)
        st.integers(0, 99),
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pdata=points, idata=intervals)
def test_range_join_matches_duckdb(_shared, pdata, idata):
    spark = _shared
    irows = [(k, s, s + ln, v) for k, s, ln, v in idata]
    pdf = spark.createDataFrame(pdata, "id int, k string, ts int")
    idf = spark.createDataFrame(irows, "k string, start int, end int, v int")
    out = range_join_intervals(pdf, idf, ["k"], "ts", "start", "end")
    got = sorted((r.id, r.k, r.ts, r.start, r.end, r.v) for r in out.collect())

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE p(id INT, k VARCHAR, ts INT)")
        con.execute('CREATE TABLE i(k VARCHAR, "start" INT, "end" INT, v INT)')
        con.executemany("INSERT INTO p VALUES (?, ?, ?)", pdata)
        con.executemany("INSERT INTO i VALUES (?, ?, ?, ?)", irows)
        want = sorted(
            tuple(row) for row in con.execute(
                'SELECT p.id, p.k, p.ts, i."start", i."end", i.v '
                "FROM p JOIN i ON p.k = i.k "
                'AND p.ts BETWEEN i."start" AND i."end"'
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want


# ---------------------------------------------------------------------------
# Connected components vs a Python union-find oracle: random graphs with
# self-loops, duplicate/reversed edges, cycles, and long chains — the
# label-propagation + pointer-jumping fixpoint must agree exactly with
# textbook union-find on min-member canonical labels
# ---------------------------------------------------------------------------

_cc_nodes = [f"e{i:02d}" for i in range(12)]
_cc_edges = st.lists(
    st.tuples(st.sampled_from(_cc_nodes), st.sampled_from(_cc_nodes)),
    min_size=1,
    max_size=20,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups = {}
    for x in list(parent):
        groups.setdefault(find(x), set()).add(x)
    return {
        member: min(grp) for root, grp in groups.items() for member in grp
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(pairs=_cc_edges)
def test_connected_components_matches_union_find(_shared, pairs):
    from graphforge_spark.operators.canonicalize import connected_components

    spark = _shared
    edges = spark.createDataFrame(pairs, "src string, dst string")
    got = {
        r.id: r.component for r in connected_components(edges).collect()
    }
    assert got == _union_find(pairs)


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard vs a Python set oracle: random unicode-ish docs
# with explicit candidate pairs — tokenizer/shingle boundary cases
# (doc shorter than the shingle width, empty-after-tokenize, repeated
# words) must match the engine's documented shingle definition exactly
# ---------------------------------------------------------------------------

import re as _re

_WORDS = ["abc", "de", "x1", "µµ", "ß9", "q"]
_SEPS = [" ", "  ", ",", ". ", "\n", "\t", "!#"]
_doc = st.lists(
    st.tuples(st.sampled_from(_WORDS), st.sampled_from(_SEPS)),
    min_size=0,
    max_size=8,
).map(lambda ps: "".join(w + s for w, s in ps))


def _py_shingles(text, n=3):
    toks = [t for t in _re.split(r"[^a-z0-9µß]+", text.lower()) if t]
    return {
        " ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=2, max_size=5))
def test_ngram_jaccard_matches_python_sets(_shared, texts):
    from graphforge_spark.operators.docops import ngram_jaccard_pairs

    spark = _shared
    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    pair_rows = [
        (a, b) for i, (a, _) in enumerate(docs) for b, _ in docs[i + 1 :]
    ]
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    pdf = spark.createDataFrame(pair_rows, "id_a string, id_b string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(ddf, pdf).collect()
    }
    text_of = dict(docs)
    for a, b in pair_rows:
        sa, sb = _py_shingles(text_of[a]), _py_shingles(text_of[b])
        want = len(sa & sb) / max(len(sa | sb), 1)
        assert abs(got[(a, b)] - want) < 1e-9, (a, b, text_of[a], text_of[b])


# ---------------------------------------------------------------------------
# PII redaction vs Python re: random documents assembled from planted
# PII spans and noise — per-kind counts and the redacted text must match
# a Python re replay of the same sequential pattern chain (the patterns
# live in the Java∩RE2∩Python-re subset by design)
# ---------------------------------------------------------------------------

_PII = [
    "bob.smith+x@ex-mail.org",
    "a@b.io",
    "10.0.255.7",
    "+1 (415) 555-0101",
    "12345678901",
]
_NOISE = ["hello", "a@b", "1.2.3", "x_y%z", "call me", "@@", "...", "30"]
_pii_doc = st.lists(
    st.tuples(st.sampled_from(_PII + _NOISE), st.sampled_from([" ", ", ", "\n"])),
    min_size=0,
    max_size=8,
).map(lambda ps: "".join(w + s for w, s in ps))


def _py_redact(text):
    from graphforge_spark.operators.docops import PII_PATTERNS

    counts = {}
    cur = text
    for kind, pat in PII_PATTERNS:
        counts[kind] = len(_re.findall(pat, cur))
        cur = _re.sub(pat, "[PII]", cur)
    return counts, cur


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_pii_doc, min_size=1, max_size=4))
def test_redact_pii_matches_python_re(_shared, texts):
    from graphforge_spark.operators.docops import redact_pii

    spark = _shared
    docs = [(f"d{i}", t) for i, t in enumerate(texts)]
    out = {
        r.doc_id: r
        for r in redact_pii(
            spark.createDataFrame(docs, "doc_id string, text string")
        ).collect()
    }
    for did, text in docs:
        counts, redacted = _py_redact(text)
        r = out[did]
        got_counts = {k: getattr(r, f"n_{k}") for k in counts}
        assert got_counts == counts, (text,)
        assert r.redacted_text == redacted, (text,)


# ---------------------------------------------------------------------------
# Stratified sampling is a pure function of (salt, id): membership must
# be identical across re-runs, row orders, and partition counts — the
# retry/speculation-stability claim, as a property
# ---------------------------------------------------------------------------

@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=40, unique=True),
    frac=st.sampled_from([0.0, 0.1, 0.5, 0.9, 1.0]),
    parts=st.sampled_from([1, 3, 7]),
)
def test_stratified_sample_is_order_and_partition_invariant(_shared, ids, frac, parts):
    from graphforge_spark.operators.docops import stratified_sample

    spark = _shared
    rows = [(f"d{i}", "en") for i in ids]
    a = spark.createDataFrame(rows, "doc_id string, lang string")
    b = spark.createDataFrame(list(reversed(rows)), "doc_id string, lang string").repartition(parts)
    kept_a = {r.doc_id for r in stratified_sample(a, {"en": frac}, "lang").collect()}
    kept_b = {r.doc_id for r in stratified_sample(b, {"en": frac}, "lang").collect()}
    assert kept_a == kept_b
    if frac == 0.0:
        assert kept_a == set()
    if frac == 1.0:
        assert kept_a == {r[0] for r in rows}
