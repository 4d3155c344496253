"""Tests for the presentation/app-shell analogs: HTML table render (A18),
SVG bar-chart render (A20), demo-project seeding (A16), and the
versioned result cache (A23)."""

import os
import re

import pytest

from graphforge_spark import demo
from graphforge_spark.operators.extract import extract_rdfxml
from graphforge_spark.sinks.render import render_bar_chart, render_table
from graphforge_spark.sinks.result_cache import ResultCache


# ---------- render_table ----------

def test_render_table_shape_and_escaping(spark):
    df = spark.createDataFrame(
        [("alice<script>", 3), ("bob & eve", None)], "name string, n int"
    )
    out = render_table(df.orderBy("name"))
    assert out.startswith('<table border="1"><thead><tr>')
    assert out.endswith("</tbody></table>")
    assert "<th>name</th>" in out and "<th>n</th>" in out
    # values escaped; raw tag text must not appear
    assert "alice&lt;script&gt;" in out and "<script>" not in out
    assert "bob &amp; eve" in out
    # NULL renders as an empty cell
    assert "<td></td>" in out
    assert out.count("<tr>") == 3  # header + 2 data rows


def test_render_table_empty_result_keeps_header(spark):
    df = spark.createDataFrame([], "s string, p string")
    out = render_table(df)
    assert "<th>s</th>" in out and "<tbody></tbody>" in out


def test_render_table_bounded(spark):
    df = spark.range(10_000).selectExpr("id", "id * 2 as dbl")
    out = render_table(df, max_rows=5)
    assert out.count("<tr>") == 6  # header + 5
    with pytest.raises(ValueError):
        render_table(df, max_rows=0)


# ---------- render_bar_chart ----------

def test_bar_chart_happy_path(spark):
    df = spark.createDataFrame(
        [("worksAt", 40), ("mentions", 25)], "pred string, n int"
    )
    svg = render_bar_chart(df.orderBy("pred"))
    assert svg is not None and svg.startswith("<svg") and svg.endswith("</svg>")
    assert svg.count("<rect") == 2
    assert "Top pred by n" in svg  # the reference's dynamic title
    assert "worksAt" in svg and "mentions" in svg
    # bar heights scale linearly: 25/40 of the taller bar
    heights = [float(h) for h in re.findall(r'height="([\d.]+)" fill', svg)]
    assert len(heights) == 2
    assert abs(max(heights) * 25 / 40 - min(heights)) < 0.1


def test_bar_chart_guard_matches_reference_skip(spark):
    three_cols = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
    assert render_bar_chart(three_cols) is None
    non_numeric = spark.createDataFrame([("x", "not-a-number")], "a string, b string")
    assert render_bar_chart(non_numeric) is None
    empty = spark.createDataFrame([], "a string, b int")
    assert render_bar_chart(empty) is None


def test_bar_chart_parsefloat_coercion(spark):
    # string y column: parseFloat semantics (numeric prefix) via plot prep
    df = spark.createDataFrame(
        [("a", "12.5"), ("b", "7"), ("c", "junk")], "k string, v string"
    )
    svg = render_bar_chart(df.orderBy("k"))
    assert svg is not None and svg.count("<rect") == 2  # 'junk' row dropped


def test_bar_chart_deterministic(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int").orderBy("k")
    assert render_bar_chart(df) == render_bar_chart(df)


# ---------- demo project (A16) ----------

def test_create_demo_layout_and_idempotence(tmp_path):
    src = demo.create_demo(str(tmp_path))
    assert src.endswith(os.path.join("Project Demo", "Source Data"))
    names = sorted(os.listdir(src))
    assert names == ["bfo.owl", "pizza.owl"]
    first = {n: open(os.path.join(src, n)).read() for n in names}
    demo.create_demo(str(tmp_path))  # rerun: identical bytes
    assert {n: open(os.path.join(src, n)).read() for n in names} == first


def test_fetch_file_local_and_network_gate(tmp_path):
    p = tmp_path / "onto.owl"
    p.write_text("<rdf:RDF/>", encoding="utf-8")
    assert demo.fetch_file(str(p)) == "<rdf:RDF/>"
    assert demo.fetch_file(p.as_uri()) == "<rdf:RDF/>"
    with pytest.raises(ValueError, match="allow_network"):
        demo.fetch_file("https://example.org/x.owl")
    with pytest.raises(ValueError, match="scheme"):
        demo.fetch_file("ftp://example.org/x.owl")
    with pytest.raises(FileNotFoundError):
        demo.fetch_file(str(tmp_path / "missing.owl"))


def test_demo_sources_via_file_urls(tmp_path):
    p = tmp_path / "mini.owl"
    p.write_text("<rdf:RDF/>", encoding="utf-8")
    src = demo.create_demo(str(tmp_path / "proj"), sources={"mini.owl": p.as_uri()})
    assert open(os.path.join(src, "mini.owl")).read() == "<rdf:RDF/>"


def test_demo_files_extract_real_triples(spark, tmp_path):
    demo.create_demo(str(tmp_path))
    transcripts = demo.load_demo(spark, str(tmp_path))
    assert transcripts.count() == 2
    triples = extract_rdfxml(transcripts)
    rows = {(r.subj, r.pred, r.obj) for r in triples.collect()}
    # the seeded hierarchy is reachable by the standard extractor
    assert (
        "http://purl.obolibrary.org/obo/BFO_0000002",
        "rdfs:subClassOf",
        "http://purl.obolibrary.org/obo/BFO_0000001",
    ) in rows
    assert any(s.endswith("Margherita") and p == "rdf:type" for s, p, _ in rows)


# ---------- result cache (A23) ----------

def _docs(spark, tag, n=5):
    return spark.range(n).selectExpr("id", f"'{tag}' as tag")


def test_cache_miss_builds_then_hit_serves_stale(spark, tmp_path):
    cache = ResultCache(str(tmp_path))
    calls = []

    def build_v(tag):
        def b():
            calls.append(tag)
            return _docs(spark, tag)
        return b

    first = cache.fetch(spark, "q1", build_v("one"))
    assert {r.tag for r in first.collect()} == {"one"}
    assert calls == ["one"]

    # second fetch: serves the CACHED (stale) copy, revalidates for next
    second = cache.fetch(spark, "q1", build_v("two"))
    assert {r.tag for r in second.collect()} == {"one"}
    assert calls == ["one", "two"]

    third = cache.fetch(spark, "q1", build_v("three"))
    assert {r.tag for r in third.collect()} == {"two"}


def test_cache_network_first_falls_back_on_failure(spark, tmp_path):
    cache = ResultCache(str(tmp_path))
    cache.fetch(spark, "q", lambda: _docs(spark, "good"), strategy="network-first")

    def boom():
        raise RuntimeError("network down")

    fallback = cache.fetch(spark, "q", boom, strategy="network-first")
    assert {r.tag for r in fallback.collect()} == {"good"}
    with pytest.raises(RuntimeError):
        cache.fetch(spark, "q-unseen", boom, strategy="network-first")


def test_cache_keys_are_independent_and_strategy_validated(spark, tmp_path):
    cache = ResultCache(str(tmp_path))
    a = cache.fetch(spark, "qa", lambda: _docs(spark, "a"))
    b = cache.fetch(spark, "qb", lambda: _docs(spark, "b"))
    assert {r.tag for r in a.collect()} == {"a"}
    assert {r.tag for r in b.collect()} == {"b"}
    with pytest.raises(ValueError, match="strategy"):
        cache.fetch(spark, "qa", lambda: _docs(spark, "x"), strategy="cache-only")


def test_cache_prune_keeps_current_version_readable(spark, tmp_path):
    cache = ResultCache(str(tmp_path))
    cache.fetch(spark, "q", lambda: _docs(spark, "v1"))
    cache.fetch(spark, "q", lambda: _docs(spark, "v2"))  # leaves v1 dir behind
    removed = cache.prune()
    assert removed >= 1
    after = cache.fetch(spark, "q", lambda: _docs(spark, "v3"))
    assert {r.tag for r in after.collect()} == {"v2"}


def test_bar_chart_negative_values_valid_svg(spark):
    df = spark.createDataFrame(
        [("gain", 5), ("loss", -3), ("flat", 0)], "k string, v int"
    )
    svg = render_bar_chart(df.orderBy("k"))
    assert svg is not None
    assert 'height="-' not in svg  # SVG forbids negative rect heights
    heights = [float(h) for h in re.findall(r'height="([\d.]+)" fill', svg)]
    assert len(heights) == 3
    # |y| proportions hold on the shared zero-baseline scale
    assert abs(max(heights) * 3 / 5 - sorted(heights)[1]) < 0.1
    all_neg = render_bar_chart(
        spark.createDataFrame([("a", -1), ("b", -4)], "k string, v int").orderBy("k")
    )
    assert all_neg is not None and 'height="-' not in all_neg
    neg_heights = [float(h) for h in re.findall(r'height="([\d.]+)" fill', all_neg)]
    assert max(neg_heights) > 0  # all-negative data still draws bars


def test_cache_swr_serves_stale_when_revalidate_fails(spark, tmp_path):
    cache = ResultCache(str(tmp_path))
    cache.fetch(spark, "q", lambda: _docs(spark, "good"))

    def boom():
        raise RuntimeError("source table dropped")

    # the cached copy is valid: a failed refresh must not break the fetch
    served = cache.fetch(spark, "q", boom)
    assert {r.tag for r in served.collect()} == {"good"}


def test_cache_key_slot_verified(spark, tmp_path):
    # simulate a hash-slot collision: same slot dir, different key text
    from graphforge_spark.sinks import result_cache as rc

    cache = ResultCache(str(tmp_path))
    cache.fetch(spark, "query A", lambda: _docs(spark, "a"))
    key_dir = rc._key_dir(str(tmp_path), "query A")
    # a different key that (hypothetically) landed in the same slot must
    # read as a MISS, not as query A's result
    assert rc._current_version(key_dir, "query B") is None
    assert rc._current_version(key_dir, "query A") is not None
