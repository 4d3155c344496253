"""SPARQL 1.1 Protocol endpoint: GET/POST forms, content negotiation,
graph-form N-Triples, loud 400s — exercised through real HTTP requests
against a served forge warehouse."""

import json
import shutil
import urllib.error
import urllib.parse
import urllib.request

import pytest

from graphforge_spark.fixtures import gen_transcripts
from graphforge_spark.pipeline import forge
from graphforge_spark.sinks.endpoint import serve


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("ep") / "wh")
    corpus = gen_transcripts(seed=7, n_convs=6, turns_per_conv=4).transcripts_df(spark)
    forge(spark, corpus, wh, n_buckets=4, do_link=False, export_nt=False)
    srv = serve(spark, wh, background=True)
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()
    shutil.rmtree(wh, ignore_errors=True)


def _get(url, accept=None):
    req = urllib.request.Request(url, headers={"Accept": accept} if accept else {})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read().decode()


def test_get_select_json_default(server):
    q = urllib.parse.quote("SELECT ?p (COUNT(?o) AS ?n) WHERE { ?s ?p ?o } GROUP BY ?p")
    status, ctype, body = _get(f"{server}/sparql?query={q}")
    assert status == 200 and ctype.startswith("application/sparql-results+json")
    doc = json.loads(body)
    assert doc["head"]["vars"] == ["p", "n"]
    assert len(doc["results"]["bindings"]) > 0


def test_content_negotiation(server):
    q = urllib.parse.quote("SELECT ?s WHERE { ?s ?p ?o } LIMIT 2")
    for accept, want_ct, probe in [
        ("application/sparql-results+xml", "application/sparql-results+xml",
         "<sparql"),
        ("text/csv", "text/csv", "s\r\n"),
        ("text/tab-separated-values", "text/tab-separated-values", "?s\n"),
    ]:
        status, ctype, body = _get(f"{server}/sparql?query={q}", accept=accept)
        assert status == 200 and ctype.startswith(want_ct)
        assert probe in body


def test_post_both_bodies_and_ask(server):
    for ctype, data in [
        ("application/sparql-query", b"ASK { ?s ?p ?o }"),
        ("application/x-www-form-urlencoded",
         urllib.parse.urlencode({"query": "ASK { ?s ?p ?o }"}).encode()),
    ]:
        req = urllib.request.Request(
            f"{server}/sparql", data=data, headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert json.loads(r.read().decode()) == {"head": {}, "boolean": True}


def test_construct_returns_ntriples(server):
    q = urllib.parse.quote(
        "CONSTRUCT { ?s <http://ex.org/p> ?o } "
        "WHERE { ?s ?p ?o FILTER(!isLiteral(?o)) } LIMIT 3")
    status, ctype, body = _get(f"{server}/sparql?query={q}")
    assert status == 200 and ctype.startswith("application/n-triples")
    assert all(l.endswith(" .") for l in body.splitlines() if l)


def test_unsupported_syntax_is_400_not_wrong_answer(server):
    q = urllib.parse.quote("SELECT ?s WHERE { SERVICE <http://x> { ?s ?p ?o } }")
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/sparql?query={q}")
    assert ei.value.code == 400
    assert "SERVICE" in ei.value.read().decode()


def test_missing_query_param_and_bad_ctype(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(f"{server}/sparql")
    assert ei.value.code == 400
    req = urllib.request.Request(
        f"{server}/sparql", data=b"{}", headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=120)
    assert ei.value.code == 415


def test_update_endpoint_gated_and_applied(spark, tmp_path):
    from graphforge_spark.fixtures import gen_transcripts
    from graphforge_spark.pipeline import forge

    wh = str(tmp_path / "wh")
    corpus = gen_transcripts(seed=9, n_convs=3, turns_per_conv=3).transcripts_df(spark)
    forge(spark, corpus, wh, n_buckets=2, do_link=False, export_nt=False)

    # disabled by default → 403, warehouse untouched
    ro = serve(spark, wh, background=True)
    try:
        url = f"http://127.0.0.1:{ro.server_address[1]}/update"
        req = urllib.request.Request(
            url, data=b'INSERT DATA { <http://ex.org/u> <http://ex.org/p> "v" }',
            headers={"Content-Type": "application/sparql-update"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        assert ei.value.code == 403
    finally:
        ro.shutdown(); ro.server_close()

    rw = serve(spark, wh, background=True, allow_update=True, n_buckets=2)
    try:
        base = f"http://127.0.0.1:{rw.server_address[1]}"
        req = urllib.request.Request(
            f"{base}/update",
            data=b'INSERT DATA { <http://ex.org/u> <http://ex.org/p> "v" }',
            headers={"Content-Type": "application/sparql-update"})
        with urllib.request.urlopen(req, timeout=300) as r:
            m = json.loads(r.read().decode())
        assert m["triples_after"] == m["triples_before"] + 1
        # the mutation is queryable through the same server (raw layer —
        # apply_update mutates the triples table; canonical recomputes on
        # the next forge)
        q = urllib.parse.quote("ASK { <http://ex.org/u> <http://ex.org/p> ?v }")
        with urllib.request.urlopen(f"{base}/sparql?query={q}", timeout=120) as r:
            pass  # the default layer still serves; now check raw directly
        from graphforge_spark.pipeline import query_warehouse
        assert query_warehouse(
            spark, wh, "ASK { <http://ex.org/u> ?p ?o }", layer="raw"
        ).collect()[0].ask
        # bad update syntax → 400 loud
        req = urllib.request.Request(
            f"{base}/update", data=b"LOAD <http://x>",
            headers={"Content-Type": "application/sparql-update"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        assert ei.value.code == 400
    finally:
        rw.shutdown(); rw.server_close()
