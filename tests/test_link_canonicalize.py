"""Entity linking (MinHash/LSH + TF-IDF cosine) and connected-components
canonicalization against the alias-cluster fixtures (FIXTURES.md F3)."""

import pytest
from pyspark.sql import functions as F

from graphforge_spark.fixtures import ALIAS_CLUSTERS
from graphforge_spark.operators.canonicalize import (
    canonical_mapping,
    connected_components,
    rewrite_triples,
)
from graphforge_spark.operators.link import link_entities, lsh_candidates


@pytest.fixture(scope="module")
def surfaces(spark):
    rows = [(s,) for aliases in ALIAS_CLUSTERS.values() for s in aliases]
    return spark.createDataFrame(rows, "surface string")


def test_lsh_candidates_recall(spark, surfaces):
    # every within-cluster pair with decent shingle overlap should be a candidate
    pairs = {(r.surface_a, r.surface_b) for r in lsh_candidates(surfaces).collect()}
    # sanity: symmetric storage not required; canonical order a<b
    assert all(a < b for a, b in pairs)
    # the near-identical pair must be found
    assert ("ACME Corp", "Acme Corp") in pairs or ("Acme Corp", "ACME Corp") in pairs


def test_link_entities_clusters(spark, surfaces):
    edges = link_entities(surfaces, threshold=0.55)
    mapping = canonical_mapping(edges)
    comp = {r.alias_id: r.canonical_id for r in mapping.collect()}
    # all Acme aliases that link must map to the same canonical id
    acme = [s for s in ALIAS_CLUSTERS["http://ex.org/e/Acme_Corp"] if s in comp]
    assert len(acme) >= 5, f"too few Acme aliases linked: {acme}"
    assert len({comp[s] for s in acme}) == 1
    # no cross-cluster merge between Acme and Globex/Initech/Umbrella
    globex = [s for s in ALIAS_CLUSTERS["http://ex.org/e/Globex"] if s in comp]
    if globex and acme:
        assert comp[globex[0]] != comp[acme[0]]


def test_connected_components_chain_and_cycle(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x"), ("z", "z")],
        "src string, dst string",
    )
    cc = {r.id: r.component for r in connected_components(edges).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == cc["d"] == "a"
    assert cc["x"] == cc["y"] == "x"
    assert cc["z"] == "z"


def test_connected_components_hot_star(spark):
    # one hot hub with many spokes (skew shape) — must converge in few rounds
    n = 500
    rows = [("hub", f"spoke{i:04d}") for i in range(n)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    cc = connected_components(edges)
    assert cc.select("component").distinct().count() == 1
    assert cc.count() == n + 1


def test_rewrite_triples_preserves_literals(spark):
    triples = spark.createDataFrame(
        [
            ("A", "p", "B", False, "g", "c", 0),
            ("A", "label", "B", True, "g", "c", 0),  # literal 'B' must NOT rewrite
        ],
        "subj string, pred string, obj string, obj_is_literal boolean, graph string, src_conv_id string, src_turn_idx int",
    )
    mapping = spark.createDataFrame([("A", "CANON_A"), ("B", "CANON_B")], "alias_id string, canonical_id string")
    out = {(r.subj, r.pred, r.obj) for r in rewrite_triples(triples, mapping).collect()}
    assert ("CANON_A", "p", "CANON_B") in out
    assert ("CANON_A", "label", "B") in out


def test_sameas_edges_filters(spark):
    """owl:sameAs edge extraction: both spellings accepted; literal
    objects and self-loops are never identity edges."""
    from graphforge_spark.operators.canonicalize import sameas_edges

    rows = [
        ("http://a", "owl:sameAs", "http://b", False),
        ("http://b", "http://www.w3.org/2002/07/owl#sameAs", "http://c", False),
        ("http://x", "owl:sameAs", "not an iri but a literal", True),
        ("http://y", "owl:sameAs", "http://y", False),          # self-loop
        ("http://a", "http://ex.org/knows", "http://c", False),  # other pred
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean"
    )
    edges = {(r.src, r.dst) for r in sameas_edges(t).collect()}
    assert edges == {("http://a", "http://b"), ("http://b", "http://c")}


def test_sameas_canonicalization_merges_transitively(spark):
    """sameAs chain a=b=c plus ordinary triples: CC collapses all three
    onto the min id, and rewrite touches subjects AND IRI objects but
    never literals."""
    from graphforge_spark.operators.canonicalize import sameas_edges

    rows = [
        ("http://ex/b", "owl:sameAs", "http://ex/a", False),
        ("http://ex/b", "owl:sameAs", "http://ex/c", False),
        ("http://ex/c", "http://ex/p", "http://ex/d", False),
        ("http://ex/d", "http://ex/q", "http://ex/a", False),
        ("http://ex/a", "http://ex/label", "http://ex/a is fine", True),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, obj_is_literal boolean"
    )
    mapping = canonical_mapping(sameas_edges(t))
    out = rewrite_triples(t, mapping)
    got = {(r.subj, r.pred, r.obj) for r in out.collect()}
    assert ("http://ex/a", "http://ex/p", "http://ex/d") in got
    assert ("http://ex/d", "http://ex/q", "http://ex/a") in got
    # the literal that happens to CONTAIN an alias spelling is untouched
    assert ("http://ex/a", "http://ex/label", "http://ex/a is fine") in got
    # sameAs assertions rewrite to canonical self-loops (merge provenance)
    assert ("http://ex/a", "owl:sameAs", "http://ex/a") in got
    assert not any(s.endswith(("/b", "/c")) for s, _, _ in got)
