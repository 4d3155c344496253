"""SPARQL SERVICE federation (plans/sparql.py): a SERVICE group ships to
a real SPARQL 1.1 Protocol endpoint (the engine's own sinks/endpoint
serving a forged warehouse over HTTP) and its bindings join the local
group — exercised end-to-end over loopback, the hermetic-build contract."""

import shutil

import pytest
from pyspark.sql import functions as F

from graphforge_spark import corpus as corpus_mod
from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.pipeline import forge
from graphforge_spark.plans.sparql import sparql_query
from graphforge_spark.sinks.endpoint import serve

WORKS_AT = "http://ex.org/p/worksAt"
LOCATED_IN = "http://ex.org/p/locatedIn"


@pytest.fixture(scope="module")
def fed(spark, tmp_path_factory):
    """(endpoint URL, full extraction frame): the warehouse the endpoint
    serves is forged from the same corpus the local comparisons read."""
    wh = str(tmp_path_factory.mktemp("svc") / "wh")
    corpus = gen_transcripts(seed=11, n_convs=8, turns_per_conv=4)
    tdf = corpus.transcripts_df(spark)
    forge(spark, tdf, wh, n_buckets=4, do_link=False, export_nt=False)
    from graphforge_spark.operators.extract import extract_patterns

    triples = extract_patterns(tdf).dropDuplicates(["subj", "pred", "obj"])
    srv = serve(spark, wh, background=True)
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql", triples
    srv.shutdown()
    srv.server_close()
    shutil.rmtree(wh, ignore_errors=True)


def test_service_joins_remote_bindings(fed):
    url, triples = fed
    local = triples.filter(F.col("pred") == LOCATED_IN).select(
        "subj", "pred", "obj", "obj_is_literal"
    )
    q = f"""SELECT ?person ?org ?city WHERE {{
              ?person <{LOCATED_IN}> ?city .
              SERVICE <{url}> {{ ?person <{WORKS_AT}> ?org }}
            }}"""
    got = {tuple(r) for r in sparql_query(local, q).collect()}
    want = {
        tuple(r)
        for r in sparql_query(
            triples,
            f"""SELECT ?person ?org ?city WHERE {{
                  ?person <{LOCATED_IN}> ?city .
                  ?person <{WORKS_AT}> ?org }}""",
        ).collect()
    }
    assert got == want and got


def test_service_prefixes_reattach(fed):
    url, triples = fed
    local = triples.filter(F.col("pred") == LOCATED_IN)
    q = f"""PREFIX p: <http://ex.org/p/>
            SELECT ?person ?org WHERE {{
              ?person p:locatedIn ?city .
              SERVICE <{url}> {{ ?person p:worksAt ?org }}
            }}"""
    assert sparql_query(local, q).count() > 0


def test_service_empty_remote_result_annihilates(fed):
    url, triples = fed
    q = f"""SELECT ?org ?x WHERE {{
              ?org <{LOCATED_IN}> ?region .
              SERVICE <{url}> {{ ?x <http://no.such/pred> ?org }}
            }}"""
    assert sparql_query(triples, q).count() == 0


def test_service_silent_failure_is_identity(fed, spark):
    _, triples = fed
    dead = "http://127.0.0.1:9/sparql"  # discard port: connection refused
    local = triples.filter(F.col("pred") == LOCATED_IN)
    q = f"""SELECT ?org ?region WHERE {{
              ?org <{LOCATED_IN}> ?region .
              SERVICE SILENT <{dead}> {{ ?p <{WORKS_AT}> ?org }}
            }}"""
    got = sparql_query(local, q)
    # the silent-failed clause joins as the single empty solution: the
    # local part passes through unchanged
    assert got.count() == local.count()
    assert set(got.columns) == {"org", "region"}
    # a service-bound variable EXPLICITLY projected must come back
    # unbound (NULL), not raise — the whole point of SILENT (review
    # finding r4: the skip-the-clause shortcut raised "projected
    # variables not bound")
    q2 = f"""SELECT ?org ?region ?p WHERE {{
               ?org <{LOCATED_IN}> ?region .
               SERVICE SILENT <{dead}> {{ ?p <{WORKS_AT}> ?org }}
             }}"""
    rows = sparql_query(local, q2).collect()
    assert len(rows) == local.count() and all(r.p is None for r in rows)
    # as the ONLY clause: one solution with the group's vars all unbound
    lone = sparql_query(local, f"SELECT * WHERE {{ SERVICE SILENT <{dead}> {{ ?s ?p ?o }} }}")
    lrows = lone.collect()
    assert set(lone.columns) == {"s", "p", "o"}
    assert len(lrows) == 1 and all(v is None for v in lrows[0])


def test_service_failures_are_loud(fed):
    url, triples = fed
    dead = "http://127.0.0.1:9/sparql"
    with pytest.raises(ValueError, match="SERVICE"):
        sparql_query(
            triples, f"SELECT ?s WHERE {{ SERVICE <{dead}> {{ ?s ?p ?o }} }}"
        ).collect()
    # non-loopback host without the opt-in flag: refused BEFORE any I/O
    with pytest.raises(ValueError, match="loopback|allow_service_network"):
        sparql_query(
            triples,
            "SELECT ?s WHERE { SERVICE <http://example.invalid/sparql> { ?s ?p ?o } }",
        )
    # variable endpoints refuse loudly by name
    with pytest.raises(ValueError, match="SERVICE"):
        sparql_query(
            triples, "SELECT ?s WHERE { SERVICE ?ep { ?s ?p ?o } }"
        )
    # empty SERVICE group
    with pytest.raises(ValueError, match="empty SERVICE"):
        sparql_query(
            triples, f"SELECT ?s WHERE {{ SERVICE <{url}> {{ }} }}"
        )


def test_service_term_encoding_unit():
    """_service_term: annotation-mode encoding incl. the legacy
    pre-1.1 'typed-literal' binding type (Virtuoso/old Jena)."""
    from graphforge_spark.plans.sparql import _service_term

    assert _service_term(None, True) is None
    assert _service_term({"type": "uri", "value": "http://x"}, True) == "http://x"
    assert _service_term({"type": "literal", "value": "a b"}, True) == '"a b"'
    assert (
        _service_term({"type": "literal", "value": "hi", "xml:lang": "en"}, True)
        == '"hi"@en'
    )
    assert (
        _service_term(
            {"type": "typed-literal", "value": "5",
             "datatype": "http://www.w3.org/2001/XMLSchema#integer"}, True)
        == '"5"^^http://www.w3.org/2001/XMLSchema#integer'
    )
    # xsd:string normalizes to the plain form; escapes applied
    assert (
        _service_term(
            {"type": "typed-literal", "value": 'say "hi"',
             "datatype": "http://www.w3.org/2001/XMLSchema#string"}, True)
        == '"say \\"hi\\""'
    )
    # non-annotation mode: lexical value regardless of type
    assert _service_term({"type": "typed-literal", "value": "5",
                          "datatype": "http://t"}, False) == "5"


def test_service_digit_var_names_survive(fed, spark):
    """Remote var names are DATA: SPARQL permits ?1, which a DDL schema
    string would reject — StructType materialization must handle it."""
    url, triples = fed
    q = f"""SELECT ?org ?1 WHERE {{
              ?1 <{LOCATED_IN}> ?city .
              SERVICE <{url}> {{ ?1 <{WORKS_AT}> ?org }}
            }}"""
    got = sparql_query(triples.filter(F.col("pred") == LOCATED_IN), q)
    assert got.count() > 0 and "1" in got.columns


def test_service_inside_optional_group(fed):
    """SERVICE captured inside an OPTIONAL group: the recursive group
    compile owns the clause, so the federation is optional — people
    without a remote worksAt binding survive null-extended."""
    url, triples = fed
    local = triples.filter(F.col("pred") == LOCATED_IN)
    q = f"""SELECT ?person ?city ?org WHERE {{
              ?person <{LOCATED_IN}> ?city .
              OPTIONAL {{ SERVICE <{url}> {{ ?person <{WORKS_AT}> ?org }} }}
            }}"""
    rows = sparql_query(local, q).collect()
    # LeftJoin semantics: a person with several remote orgs multiplies,
    # but every LOCAL (person, city) pair is preserved
    local_pairs = {
        (r.subj, r.obj) for r in local.select("subj", "obj").collect()
    }
    assert {(r.person, r.city) for r in rows} == local_pairs
    bound = [r for r in rows if r.org is not None]
    want = {
        (r.person, r.org)
        for r in sparql_query(
            triples,
            f"""SELECT ?person ?org WHERE {{
                  ?person <{LOCATED_IN}> ?city .
                  ?person <{WORKS_AT}> ?org }}""",
        ).collect()
    }
    assert {(r.person, r.org) for r in bound} == want


# --- variable endpoints: SERVICE ?ep { … } ---------------------------------


def test_service_variable_endpoint_values_bound(fed):
    url, triples = fed
    local = triples.filter(F.col("pred") == LOCATED_IN)
    q = f"""SELECT ?person ?org ?ep WHERE {{
              VALUES ?ep {{ <{url}> }}
              ?person <{LOCATED_IN}> ?city .
              SERVICE ?ep {{ ?person <{WORKS_AT}> ?org }}
            }}"""
    rows = sparql_query(local, q).collect()
    want = {
        (r.person, r.org)
        for r in sparql_query(
            triples,
            f"""SELECT ?person ?org WHERE {{
                  ?person <{LOCATED_IN}> ?city .
                  ?person <{WORKS_AT}> ?org }}""",
        ).collect()
    }
    assert {(r.person, r.org) for r in rows} == want and rows
    # the endpoint IRI rides the variable in every solution
    assert all(r.ep == url for r in rows)


def test_service_variable_endpoint_fans_out_per_distinct_iri(fed):
    # two DISTINCT endpoint IRIs (127.0.0.1 and localhost) reach the
    # same loopback server: each solution carries its own endpoint
    url, triples = fed
    url2 = url.replace("127.0.0.1", "localhost")
    local = triples.filter(F.col("pred") == LOCATED_IN)
    q = f"""SELECT ?person ?org ?ep WHERE {{
              VALUES ?ep {{ <{url}> <{url2}> }}
              ?person <{LOCATED_IN}> ?city .
              SERVICE ?ep {{ ?person <{WORKS_AT}> ?org }}
            }}"""
    rows = sparql_query(local, q).collect()
    by_ep = {}
    for r in rows:
        by_ep.setdefault(r.ep, set()).add((r.person, r.org))
    assert set(by_ep) == {url, url2}
    assert by_ep[url] == by_ep[url2] and by_ep[url]


def test_service_variable_endpoint_silent_skips_dead(fed):
    url, triples = fed
    dead = "http://127.0.0.1:9/sparql"
    local = triples.filter(F.col("pred") == LOCATED_IN)
    q = f"""SELECT ?person ?org ?ep WHERE {{
              VALUES ?ep {{ <{url}> <{dead}> }}
              ?person <{LOCATED_IN}> ?city .
              SERVICE SILENT ?ep {{ ?person <{WORKS_AT}> ?org }}
            }}"""
    rows = sparql_query(local, q).collect()
    live = [r for r in rows if r.ep == url]
    dead_rows = [r for r in rows if r.ep == dead]
    assert live and all(r.org is not None for r in live)
    # the dead endpoint contributes the SILENT single-empty-solution:
    # local rows survive with the service vars unbound
    assert dead_rows and all(r.org is None for r in dead_rows)
    # without SILENT the dead endpoint is loud
    with pytest.raises(ValueError, match="SERVICE"):
        sparql_query(
            local,
            f"""SELECT ?person WHERE {{
                  VALUES ?ep {{ <{dead}> }}
                  ?person <{LOCATED_IN}> ?city .
                  SERVICE ?ep {{ ?person <{WORKS_AT}> ?org }}
                }}""",
        ).collect()


def test_service_variable_endpoint_guards(fed):
    url, triples = fed
    # an OPTIONAL-bound endpoint variable refuses loudly: OPTIONAL
    # extensions join AFTER the var-SERVICE, so they cannot bind an
    # endpoint (and a maybe-unbound endpoint cannot be dereferenced)
    with pytest.raises(ValueError, match="not bound|unbound"):
        sparql_query(
            triples,
            f"""SELECT ?s WHERE {{
                  ?s <{LOCATED_IN}> ?city .
                  OPTIONAL {{ ?s <http://no/p> ?ep }}
                  SERVICE ?ep {{ ?s ?p ?o }}
                }}""",
        )
    # an endpoint variable never bound anywhere refuses loudly
    with pytest.raises(ValueError, match="not bound"):
        sparql_query(
            triples,
            f"""SELECT ?s WHERE {{
                  ?s <{LOCATED_IN}> ?city .
                  SERVICE ?ep {{ ?s ?p ?o }}
                }}""",
        )


def test_service_variable_endpoint_set_is_bounded(fed, spark):
    # >_SERVICE_MAX_ENDPOINTS distinct endpoint bindings fail loudly
    # BEFORE any network fan-out
    from graphforge_spark.plans.sparql import _SERVICE_MAX_ENDPOINTS

    _, triples = fed
    iris = " ".join(
        f"<http://127.0.0.1:9/s{i}>" for i in range(_SERVICE_MAX_ENDPOINTS + 1)
    )
    with pytest.raises(ValueError, match="distinct"):
        sparql_query(
            triples,
            f"""SELECT ?ep WHERE {{
                  VALUES ?ep {{ {iris} }}
                  SERVICE SILENT ?ep {{ ?s ?p ?o }}
                }}""",
        ).collect()
