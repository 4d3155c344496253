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
