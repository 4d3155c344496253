"""Graph metrics: degree table invariants + PageRank vs a NumPy
power-iteration oracle (including dangling-mass redistribution)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphforge_spark.operators.graph_metrics import degree_stats, pagerank


def _numpy_pagerank(edge_list, damping=0.85, iters=20, tol=1e-6):
    import numpy as np

    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    succ = {}
    for s, d in set(edge_list):
        out[s] += 1
        succ.setdefault(s, []).append(d)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        new = np.zeros(n)
        dangling = 0.0
        for v in nodes:
            if out[v] == 0:
                dangling += r[idx[v]]
            else:
                share = r[idx[v]] / out[v]
                for d in succ[v]:
                    new[idx[d]] += share
        new = (1 - damping) / n + damping * (new + dangling / n)
        delta = float(np.abs(new - r).sum())
        r = new
        if delta < tol:
            break
    return {v: r[idx[v]] for v in nodes}


def test_degree_stats(spark):
    t = spark.createDataFrame(
        [
            ("http://a", "p", "http://b", False),
            ("http://a", "q", "http://b", False),
            ("http://b", "p", "http://c", False),
            ("http://a", "label", "a literal", True),
        ],
        "subj string, pred string, obj string, obj_is_literal boolean",
    )
    rows = {r.node: r for r in degree_stats(t).collect()}
    assert rows["http://a"].out_degree == 2 and rows["http://a"].out_preds == 2
    assert rows["http://b"].in_degree == 2 and rows["http://b"].out_degree == 1
    assert rows["http://c"].in_degree == 1 and rows["http://c"].out_degree == 0
    # the literal edge is excluded and literals never appear as nodes
    assert "a literal" not in rows


def test_pagerank_matches_numpy_oracle(spark):
    # a graph WITH a dangling node (d) and a cycle
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, "s string, o string")
    got = {r.node: r.rank for r in pagerank(df, max_iterations=25).collect()}
    want = _numpy_pagerank(edges, iters=25)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


_edges = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d", "e"]),
        st.sampled_from(["a", "b", "c", "d", "e"]),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_pagerank_random_graphs(spark, edges):
    df = spark.createDataFrame(edges, "s string, o string")
    got = {r.node: r.rank for r in pagerank(df, max_iterations=15).collect()}
    want = _numpy_pagerank(edges, iters=15)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def _python_bfs_to(edge_list, landmarks):
    """Distance from every node TO each landmark — pure-Python BFS over
    the reversed adjacency, the oracle shortest_paths must match."""
    pred = {}
    for s, d in set(edge_list):
        pred.setdefault(d, set()).add(s)
    want = {}
    for l in set(landmarks):
        seen, frontier, dist = {l}, {l}, 0
        want[(l, l)] = 0
        while frontier:
            dist += 1
            frontier = {
                p for v in frontier for p in pred.get(v, ()) if p not in seen
            }
            for p in frontier:
                want[(p, l)] = dist
            seen |= frontier
    return want


def test_shortest_paths_curated(spark):
    # diamond + unreachable island + a cycle back-edge
    edges = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"),
             ("x", "y")]
    df = spark.createDataFrame(edges, "s string, o string")
    from graphforge_spark.operators.graph_metrics import shortest_paths

    got = {
        (r.node, r.landmark): r.dist
        for r in shortest_paths(df, ["d", "y"]).collect()
    }
    assert got == _python_bfs_to(edges, ["d", "y"])
    assert got[("a", "d")] == 2  # via b or c
    assert got[("d", "d")] == 0
    assert ("a", "y") not in got  # unreachable pair emits no row


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, lms=st.sets(st.sampled_from(["a", "b", "c"]), min_size=1, max_size=2))
def test_shortest_paths_random_graphs(spark, edges, lms):
    from graphforge_spark.operators.graph_metrics import shortest_paths

    df = spark.createDataFrame(edges, "s string, o string")
    got = {
        (r.node, r.landmark): r.dist
        for r in shortest_paths(df, sorted(lms)).collect()
    }
    assert got == _python_bfs_to(edges, lms)


def test_shortest_paths_raises_on_iteration_cap(spark):
    from graphforge_spark.operators.graph_metrics import shortest_paths

    chain = [(f"n{i}", f"n{i+1}") for i in range(6)]
    df = spark.createDataFrame(chain, "s string, o string")
    with pytest.raises(ValueError, match="frontier still live"):
        shortest_paths(df, ["n6"], max_iterations=3)
    full = shortest_paths(df, ["n6"], max_iterations=10)
    assert full.count() == 7  # every chain node reaches n6


def _python_triangles(edge_list):
    adj = {}
    for s, d in set(edge_list):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    per = {}
    # every triangle is enumerated exactly once per member as the apex u
    # (its other two nodes forming the ordered pair v<w), so crediting
    # the apex alone yields each node's true participation count
    for u in adj:
        for v in adj[u]:
            for w in adj[u]:
                if v < w and w in adj[v]:
                    per[u] = per.get(u, 0) + 1
    return per


def test_triangle_count_curated(spark):
    from graphforge_spark.operators.graph_metrics import triangle_count

    # two triangles sharing edge (a,b); plus a chord-free square; plus a
    # parallel/reversed duplicate edge and a self-loop (must not count)
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "a"), ("a", "d"),
             ("d", "b"), ("p", "q"), ("q", "r"), ("r", "s"), ("s", "p"),
             ("a", "a")]
    df = spark.createDataFrame(edges, "s string, o string")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == _python_triangles(edges)
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_edges)
def test_triangle_count_random_graphs(spark, edges):
    from graphforge_spark.operators.graph_metrics import triangle_count

    df = spark.createDataFrame(edges, "s string, o string")
    got = {r.node: r.triangles for r in triangle_count(df).collect()}
    assert got == _python_triangles(edges)


def _python_k_core(edge_list, k):
    adj = {}
    for s, d in set(edge_list):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for v in [v for v in adj if len(adj[v]) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return {v: len(n) for v, n in adj.items() if n}


def test_k_core_curated(spark):
    from graphforge_spark.operators.graph_metrics import k_core

    # K4 (3-core) with a tail of tendrils that peel away round by round
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    tail = [("d", "t1"), ("t1", "t2"), ("t2", "t3")]
    df = spark.createDataFrame(k4 + tail, "s string, o string")
    got = {r.node: r.degree for r in k_core(df, 3).collect()}
    assert got == _python_k_core(k4 + tail, 3) == {v: 3 for v in "abcd"}
    # 1-core of the same graph keeps everything
    assert set(r.node for r in k_core(df, 1).collect()) == set("abcd") | {
        "t1", "t2", "t3"
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, k=st.integers(min_value=1, max_value=3))
def test_k_core_random_graphs(spark, edges, k):
    from graphforge_spark.operators.graph_metrics import k_core

    df = spark.createDataFrame(edges, "s string, o string")
    got = {r.node: r.degree for r in k_core(df, k).collect()}
    assert got == _python_k_core(edges, k)


def test_k_core_raises_on_iteration_cap(spark):
    from graphforge_spark.operators.graph_metrics import k_core

    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
    df = spark.createDataFrame(chain, "s string, o string")
    with pytest.raises(ValueError, match="still peeling"):
        k_core(df, 2, max_iterations=2)
    assert k_core(df, 2, max_iterations=16).count() == 0  # a chain has no 2-core


def _python_lpa(edge_list, rounds):
    adj = {}
    for s, d in set(edge_list):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    labels = {v: v for v in adj}
    for _ in range(rounds):
        new = {}
        for v in adj:
            freq = {}
            for u in adj[v]:
                freq[labels[u]] = freq.get(labels[u], 0) + 1
            top = max(freq.values())
            new[v] = min(l for l, c in freq.items() if c == top)
        labels = new
    return labels


def test_label_propagation_curated(spark):
    from graphforge_spark.operators.graph_metrics import label_propagation

    # two dense cliques bridged by one edge → two communities
    k1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    k2 = [(a, b) for a in "wxyz" for b in "wxyz" if a < b]
    bridge = [("d", "w")]
    df = spark.createDataFrame(k1 + k2 + bridge, "s string, o string")
    got = {r.node: r.label for r in label_propagation(df, max_iterations=5).collect()}
    assert got == _python_lpa(k1 + k2 + bridge, 5)
    # the cliques settle on one label each
    assert len({got[v] for v in "abcd"}) == 1
    assert len({got[v] for v in "wxyz"}) == 1


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(edges=_edges, rounds=st.integers(min_value=1, max_value=4))
def test_label_propagation_random_graphs(spark, edges, rounds):
    from graphforge_spark.operators.graph_metrics import label_propagation

    df = spark.createDataFrame(edges, "s string, o string")
    got = {
        r.node: r.label
        for r in label_propagation(df, max_iterations=rounds).collect()
    }
    want = _python_lpa(edges, rounds)
    # nodes with no non-loop edge are absent from both
    assert got == want
