"""Tests for the training-data curation operators (docops) and
similarity search — exact dedup, MinHash/LSH, SimHash, n-gram Jaccard,
text analysis, brute-force + LSH-bucketed ANN."""

import math

import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators import docops, similarity

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river delta"),  # near dup of 0
    (3, "completely different content about spark shuffle partitions and executors"),
    (4, "der hund und die katze ist nicht ein zu der haus und der garten"),  # german-ish
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = {r.text_hash: r for r in docops.exact_dedup_groups(docs).collect()}
    sizes = sorted(r.n_docs for r in groups.values())
    assert sizes == [1, 1, 1, 2]
    dup = [r for r in groups.values() if r.n_docs == 2][0]
    assert dup.min_doc_id == 0


def test_minhash_determinism_and_similarity(docs):
    sig1 = {r.doc_id: (r.mh_0, r.mh_1, r.mh_2, r.mh_3) for r in
            docops.minhash_signatures(docs, num_hashes=4).collect()}
    sig2 = {r.doc_id: (r.mh_0, r.mh_1, r.mh_2, r.mh_3) for r in
            docops.minhash_signatures(docs, num_hashes=4).collect()}
    assert sig1 == sig2  # deterministic
    assert sig1[0] == sig1[1]  # identical docs → identical signatures
    # near-dup shares more components with 0 than the unrelated doc does
    shared_near = sum(a == b for a, b in zip(sig1[0], sig1[2]))
    shared_far = sum(a == b for a, b in zip(sig1[0], sig1[3]))
    assert shared_near >= shared_far


def test_lsh_and_jaccard(docs):
    pairs = {(r.id_a, r.id_b) for r in docops.lsh_neardup_pairs(docs).collect()}
    assert (0, 1) in pairs  # exact dups always collide in every band
    jac = {(r.id_a, r.id_b): r.jaccard for r in
           docops.ngram_jaccard_pairs(docs, threshold=0.0).collect()}
    assert jac[(0, 1)] == 1.0
    if (0, 2) in jac:
        assert 0.0 < jac[(0, 2)] < 1.0


def test_simhash(docs):
    fp = {r.doc_id: r.simhash for r in docops.simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    def ham(a, b):
        return bin(a ^ b).count("1")
    assert ham(fp[0], fp[2]) < ham(fp[0], fp[3])
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             docops.simhash_neardup_pairs(docs, max_hamming=0).collect()}
    assert pairs[(0, 1)] == 0


def test_doc_stats(docs):
    rows = {r.doc_id: r for r in docops.doc_stats(docs).collect()}
    r0 = rows[0]
    assert r0.n_tokens == 13
    assert r0.n_words == 13
    assert r0.lang_pred == "en"
    assert rows[4].lang_pred == "de"
    assert abs(r0.stopword_ratio - 3 / 13) < 1e-3
    assert len(r0.fingerprint) == 4 * 32
    # identical docs → identical fingerprints
    assert rows[0].fingerprint == rows[1].fingerprint


def test_redact_pii(spark):
    docs = spark.createDataFrame(
        [
            (0, "reach me at jane.doe+spam@corp.example.org thanks"),
            (1, "server 10.0.42.7 answered, call +44 20 7946 0958 now"),
            (2, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in docops.redact_pii(docs).collect()}
    assert out[0].n_email == 1 and "[PII]" in out[0].redacted_text
    assert "jane" not in out[0].redacted_text
    assert out[1].n_ipv4 == 1 and out[1].n_phone == 1
    assert "10.0.42.7" not in out[1].redacted_text
    assert "7946" not in out[1].redacted_text
    assert out[2].redacted_text == "nothing sensitive here"
    assert out[2].n_email == out[2].n_ipv4 == out[2].n_phone == 0


def test_contamination_check(spark):
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # contains the eval 8-gram window verbatim
            (0, "intro words alpha beta gamma delta epsilon zeta eta theta more"),
            (1, "totally unrelated training document with its own words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in docops.contamination_check(train, ev, shingle_n=8).collect()}
    assert out[0].contaminated and out[0].n_hits >= 1
    assert not out[1].contaminated and out[1].n_hits == 0


def test_neardup_keep_list(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the calm river "
        "flows beneath the old stone bridge at dawn"
    )
    docs_rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.upper()),  # case-dup of 0
        (3, "completely different text about spark and graphs here"),
        (4, base + " today"),  # near-dup of 0 (Jaccard 0.95)
    ]
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    out = {r.doc_id: r for r in docops.neardup_keep_list(docs, jaccard_threshold=0.5).collect()}
    assert len(out) == 5
    # 0,1,2,4 cluster together (exact + case + near); 3 is a singleton
    assert out[0].rep_id == out[1].rep_id == out[2].rep_id == out[4].rep_id == 0
    assert out[0].keep and not out[1].keep and not out[2].keep and not out[4].keep
    assert out[3].rep_id == 3 and out[3].keep
    # exactly one keeper per cluster
    assert sum(1 for r in out.values() if r.keep) == 2


def test_stratified_sample_deterministic_and_proportional(spark):
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        F.lit("x").alias("text"),
    )
    s = docops.stratified_sample(docs, {"en": 0.5, "de": 0.1}, "lang")
    rows = s.groupBy("lang").count().collect()
    got = {r.lang: r["count"] for r in rows}
    assert abs(got["en"] / 5000 - 0.5) < 0.05
    assert abs(got["de"] / 5000 - 0.1) < 0.03
    # deterministic: same membership on re-evaluation
    ids1 = {r.doc_id for r in s.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s.select("doc_id").collect()}
    assert ids1 == ids2
    # salt changes membership but not (much) the rate
    s2 = docops.stratified_sample(docs, {"en": 0.5, "de": 0.1}, "lang", salt="other")
    ids3 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids3 != ids1


def test_corpus_stats_rollup(docs):
    rows = {r.lang_pred: r for r in docops.corpus_stats(docs).collect()}
    per_doc = {r.doc_id: r for r in docops.doc_stats(docs).collect()}
    en_docs = [r for r in per_doc.values() if r.lang_pred == "en"]
    assert rows["en"].n_docs == len(en_docs)
    assert rows["en"].total_tokens == sum(r.n_tokens for r in en_docs)
    assert rows["en"].min_tokens == min(r.n_tokens for r in en_docs)


def test_langid_char_based_zh(spark):
    """A zh sentence is ONE token under the whitespace tokenizer, so the
    zh profile must match by character occurrence, not token equality."""
    from graphforge_spark.functions.text import langid_scores

    df = spark.createDataFrame(
        [
            (0, "我有一个苹果，它是红色的，我不知道为什么。"),
            (1, "the cat and the dog and it is that"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.lang_pred for r in df.select("doc_id", langid_scores(F.col("text"))).collect()}
    assert got == {0: "zh", 1: "en"}


VECS = [
    (0, [1.0, 0.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0, 0.0]),   # closest to 0
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.0, 0.95, 0.05, 0.0]),  # closest to 2
    (4, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
]


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<float>")


def test_cosine_topk(vecs):
    out = similarity.cosine_topk(vecs, vecs.filter(F.col("vec_id") == 0), k=2)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [1, 2]
    assert rows[0].sim == pytest.approx(0.9 / math.sqrt(0.81 + 0.01), rel=1e-6)
    # sims are monotone in rank and self-match excluded
    assert all(r.neighbor_id != 0 for r in rows)


def test_lsh_bucketed_topk_subset_of_exact(vecs):
    exact = similarity.cosine_topk(vecs, vecs, k=4)
    approx = similarity.lsh_bucketed_topk(vecs, vecs, dim=4, k=4, n_planes=2)
    ex = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    for r in approx.collect():
        assert (r.query_id, r.neighbor_id) in ex
        assert r.sim == pytest.approx(ex[(r.query_id, r.neighbor_id)], abs=1e-12)


def test_ivf_full_probe_equals_exact(vecs):
    """nprobe = n_centroids probes EVERY cell, so the IVF path must
    reproduce the exact top-k — (query, neighbor) sets and sims equal."""
    exact = similarity.cosine_topk(vecs, vecs, k=3)
    approx = similarity.ivf_topk(
        vecs, vecs, k=3, n_centroids=2, nprobe=2, iters=2
    )
    ex = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    got = {(r.query_id, r.neighbor_id): r.sim for r in approx.collect()}
    assert set(got) == set(ex)
    for key, sim in got.items():
        assert sim == pytest.approx(ex[key], abs=1e-9)


def test_ivf_candidates_are_subset_of_exact_scores(vecs):
    """Partial probing returns correctly-scored pairs (sims match exact)
    and one cell per corpus vector (no duplicate (query, neighbor))."""
    exact = similarity.cosine_topk(vecs, vecs, k=4)
    approx = similarity.ivf_topk(
        vecs, vecs, k=4, n_centroids=2, nprobe=1, iters=2
    )
    ex = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    rows = approx.collect()
    keys = [(r.query_id, r.neighbor_id) for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows:
        assert (r.query_id, r.neighbor_id) in ex
        assert r.sim == pytest.approx(ex[(r.query_id, r.neighbor_id)], abs=1e-9)


def test_ivf_train_shapes_and_determinism(vecs):
    c1 = similarity.ivf_train(vecs, n_centroids=2, iters=2)
    c2 = similarity.ivf_train(vecs, n_centroids=2, iters=2)
    assert len(c1) == 2 and len(c1[0]) == 4
    for a, b in zip(c1, c2):
        assert a == pytest.approx(b)
    with pytest.raises(ValueError):
        similarity.ivf_train(vecs, n_centroids=100)


def test_pack_sequences_matches_python_replay(spark):
    """Concat-and-chunk packing vs a pure-Python replay of the same
    semantics: identical slice sets, full-budget interior windows, and
    per-doc slice contiguity/totality; membership is repartition-stable."""
    from graphforge_spark.operators.docops import pack_sequences

    rows = [(f"d{i:03d}", "tok " * ((i * 7) % 23 + 1)) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    budget, shards = 16, 3
    got = pack_sequences(docs, budget=budget, shards=shards).collect()

    # python replay: same shard hash (read back from the result), same
    # doc order, same running-count chunking
    shard_of = {}
    for r in got:
        shard_of[r.doc_id] = r.shard
    n_tokens = {d: len(t.split()) for d, t in rows}
    want = set()
    last_bin_of_shard = {}
    for s in sorted(set(shard_of.values())):
        cum = 0
        for d in sorted(k for k, v in shard_of.items() if v == s):
            n = n_tokens[d]
            first, last = cum // budget, (cum + n - 1) // budget
            for b in range(first, last + 1):
                lo = max(b * budget, cum)
                hi = min((b + 1) * budget, cum + n)
                want.add((s, b, d, lo - cum, hi - lo))
            cum += n
            last_bin_of_shard[s] = (cum - 1) // budget
    assert {(r.shard, r.bin, r.doc_id, r.doc_offset, r.slice_len) for r in got} == want

    # every interior window is exactly full; per-doc slices cover the doc
    fill = {}
    for r in got:
        fill[(r.shard, r.bin)] = fill.get((r.shard, r.bin), 0) + r.slice_len
    for (s, b), tot in fill.items():
        if b < last_bin_of_shard[s]:
            assert tot == budget, (s, b, tot)
        else:
            assert 0 < tot <= budget
    per_doc = {}
    for r in got:
        per_doc.setdefault(r.doc_id, []).append((r.doc_offset, r.slice_len))
    for d, slices in per_doc.items():
        slices.sort()
        pos = 0
        for off, ln in slices:
            assert off == pos
            pos += ln
        assert pos == n_tokens[d]

    # determinism under physical layout changes
    again = pack_sequences(docs.repartition(7), budget=budget, shards=shards).collect()
    assert {tuple(r) for r in again} == {tuple(r) for r in got}

    with pytest.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_sq_quantize_reconstruction_bounded(vecs):
    """Dequantize(quantize(x)) is within step/2 of x in every dimension."""
    params = similarity.sq_train(vecs)
    q = similarity.sq_quantize(vecs, params)
    dq = q.select(
        "vec_id",
        similarity.sq_dequantize_col(F.col("qvec"), params).alias("dq"),
    )
    orig = {r.vec_id: list(r.embedding) for r in vecs.collect()}
    for r in dq.collect():
        for i, x in enumerate(r.dq):
            assert abs(x - orig[r.vec_id][i]) <= params["step"][i] / 2 + 1e-9
    # quantized values live in int8 and the params are deterministic
    for r in q.collect():
        assert all(-128 <= v <= 127 for v in r.qvec)
    p2 = similarity.sq_train(vecs)
    assert p2["lo"] == pytest.approx(params["lo"])
    assert p2["step"] == pytest.approx(params["step"])


def test_sq_topk_full_rescore_equals_exact(vecs):
    """rescore×k ≥ corpus size keeps every candidate, so the exact
    re-scoring pass must reproduce cosine_topk exactly."""
    exact = similarity.cosine_topk(vecs, vecs, k=3)
    approx = similarity.sq_topk(vecs, vecs, k=3, rescore=5)
    ex = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    got = {(r.query_id, r.neighbor_id): r.sim for r in approx.collect()}
    assert set(got) == set(ex)
    for key, sim in got.items():
        assert sim == pytest.approx(ex[key], abs=1e-12)


def test_sq_topk_partial_rescore_sims_are_exact(vecs):
    """With a tight rescore budget the neighbor SET may differ, but every
    returned sim must be the exact cosine (re-scored on floats) — an sq
    miss can only omit, never corrupt."""
    exact = similarity.cosine_topk(vecs, vecs, k=4)
    approx = similarity.sq_topk(vecs, vecs, k=2, rescore=1)
    ex = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    rows = approx.collect()
    keys = [(r.query_id, r.neighbor_id) for r in rows]
    assert len(keys) == len(set(keys))
    for r in rows:
        assert (r.query_id, r.neighbor_id) in ex
        assert r.sim == pytest.approx(ex[(r.query_id, r.neighbor_id)], abs=1e-12)


def test_dedup_lines_removes_cross_doc_boilerplate(spark):
    from graphforge_spark.operators.docops import dedup_lines

    banner = "This site uses cookies to improve your experience"
    docs = spark.createDataFrame(
        [
            (1, f"unique first line one\n{banner}\nclosing line one"),
            (2, f"{banner}\nunique middle two"),
            (3, "totally independent document three"),
            (4, "hi\nhi\nunique line four"),  # short lines: kept as-is
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_lines(docs, min_repeats=2).collect()}
    assert out[1].text == "unique first line one\nclosing line one"
    assert out[1].n_lines_in == 3 and out[1].n_lines_kept == 2
    assert out[2].text == "unique middle two"
    assert out[3].text == "totally independent document three"
    # 'hi' repeats within ONE doc only and is under min_chars — kept
    assert out[4].text == "hi\nhi\nunique line four"


def test_repetition_ratios(spark):
    from graphforge_spark.operators.docops import repetition_ratios

    docs = spark.createDataFrame(
        [
            (1, "same line\nsame line\nsame line\nother line"),
            (2, "a b a b a b"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_ratios(docs).collect()}
    assert abs(out[1].dup_line_frac - 0.5) < 1e-9  # 2 distinct of 4 lines
    # bigrams of 'a b a b a b': [ab, ba, ab, ba, ab] -> modal 3/5
    assert abs(out[2].top_bigram_frac - 0.6) < 1e-9
    assert out[3].dup_line_frac == 0.0 and out[3].top_bigram_frac == 0.0


# ---------------------------------------------------------------- substrings


def _substring_dedup_oracle(rows, k):
    """Pure-Python replay of dedup_substrings: window-text equality,
    min(doc_id, pos) canonical election, merged-interval excision."""
    import re
    from collections import defaultdict

    toks_by = {}
    by_key = defaultdict(list)
    for doc_id, text in rows:
        t = [w for w in re.split(r"\s+", text) if w]
        toks_by[doc_id] = t
        for p in range(1, len(t) - k + 2):
            by_key[" ".join(t[p - 1 : p - 1 + k])].append((doc_id, p))
    flagged = defaultdict(list)
    for occ in by_key.values():
        if len(occ) >= 2:
            first = min(occ)
            for d, p in occ:
                if (d, p) != first:
                    flagged[d].append(p)
    result = {}
    for doc_id, t in toks_by.items():
        spans = []
        for p in sorted(flagged.get(doc_id, [])):
            if spans and p <= spans[-1][1]:
                spans[-1] = (spans[-1][0], p + k)
            else:
                spans.append((p, p + k))
        covered = {j for s, e in spans for j in range(s, e)}
        kept = [t[j - 1] for j in range(1, len(t) + 1) if j not in covered]
        result[doc_id] = (" ".join(kept), len(t), len(t) - len(kept), len(spans))
    return result


def test_dedup_substrings_curated(spark):
    run = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    docs = spark.createDataFrame(
        [
            (1, "intro A " + run + " tail one"),
            (2, "intro B " + run + " tail two"),  # shares a 10-token run with 1
            (3, "unique text with no duplicated span at all here"),
            (4, ""),
            (5, "short doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in docops.dedup_substrings(docs, k=8).collect()}
    # canonical (min doc_id) copy survives untouched
    assert out[1].text == "intro A " + run + " tail one"
    assert out[1].n_tokens_removed == 0 and out[1].n_spans == 0
    # the non-canonical copy loses the whole duplicated run in ONE span
    assert out[2].text == "intro B two"
    assert out[2].n_tokens_removed == 10 and out[2].n_spans == 1
    assert out[3].n_tokens_removed == 0
    assert out[4].text == "" and out[4].n_tokens_in == 0
    assert out[5].text == "short doc"  # shorter than k: no windows
    # matches the pure-Python oracle exactly
    rows = [(r[0], r[1]) for r in docs.collect()]
    want = _substring_dedup_oracle(rows, 8)
    got = {
        r.doc_id: (r.text, r.n_tokens_in, r.n_tokens_removed, r.n_spans)
        for r in docops.dedup_substrings(docs, k=8).collect()
    }
    assert got == want


def test_dedup_substrings_overlapping_spans_merge(spark):
    # doc 2 repeats doc 1's tokens in two overlapping duplicated regions
    # separated by one unique token — two spans, not one
    a = "a b c d e"
    b = "v w x y z"
    docs = spark.createDataFrame(
        [(1, a + " " + b), (2, a + " GAP " + b)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in docops.dedup_substrings(docs, k=5).collect()}
    assert out[1].n_tokens_removed == 0
    assert out[2].text == "GAP"
    assert out[2].n_spans == 2 and out[2].n_tokens_removed == 10


def test_dedup_substrings_repartition_stable(spark):
    docs = spark.createDataFrame(
        [(i, f"common prefix words here {i} and a shared suffix run x y z w")
         for i in range(20)],
        "doc_id long, text string",
    )
    base = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in docops.dedup_substrings(docs, k=4).collect()
    }
    shuffled = {
        r.doc_id: (r.text, r.n_tokens_removed)
        for r in docops.dedup_substrings(docs.repartition(7), k=4).collect()
    }
    assert base == shuffled
    rows = [(r[0], r[1]) for r in docs.collect()]
    want = {
        d: (t, rm) for d, (t, _n, rm, _s) in _substring_dedup_oracle(rows, 4).items()
    }
    assert base == want


def test_dedup_substrings_fuzz(spark):
    """Differential fuzz vs the Python oracle: tiny vocab forces heavy
    window collisions; every doc map must match value-exactly."""
    from hypothesis import given, settings, HealthCheck
    from hypothesis import strategies as st

    vocab = ["aa", "bb", "cc"]
    doc = st.lists(st.sampled_from(vocab), min_size=0, max_size=12).map(" ".join)

    @given(texts=st.lists(doc, min_size=1, max_size=6))
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(texts):
        rows = list(enumerate(texts))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_tokens_in, r.n_tokens_removed, r.n_spans)
            for r in docops.dedup_substrings(docs, k=3).collect()
        }
        assert got == _substring_dedup_oracle(rows, 3)

    run()


def test_temperature_fractions_mixing(spark):
    from graphforge_spark.operators.docops import stratified_sample, temperature_fractions

    rows = (
        [(i, "en") for i in range(800)]
        + [(1000 + i, "fr") for i in range(150)]
        + [(2000 + i, "rm") for i in range(50)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, lang string")

    # alpha=1: proportional — fractions equal across groups
    f1 = temperature_fractions(docs, "lang", target_rows=500, alpha=1.0)
    assert abs(f1["en"] - f1["fr"]) < 1e-9 and abs(f1["en"] - f1["rm"]) < 1e-9
    assert abs(f1["en"] - 0.5) < 1e-9

    # alpha=0: uniform shares — the rare stratum is kept whole (capped),
    # its unmet share water-fills the others
    f0 = temperature_fractions(docs, "lang", target_rows=600, alpha=0.0)
    assert f0["rm"] == 1.0
    expected_kept = f0["en"] * 800 + f0["fr"] * 150 + 50
    assert abs(expected_kept - 600) < 1.0

    # 0<alpha<1 sits between: rare stratum fraction > common stratum fraction
    fm = temperature_fractions(docs, "lang", target_rows=500, alpha=0.5)
    assert fm["rm"] > fm["fr"] > fm["en"]

    # end-to-end with the deterministic sampler: sizes near expectation
    kept = stratified_sample(docs, f1, "lang")
    n = kept.count()
    assert 400 <= n <= 600

    import pytest as _pytest
    with _pytest.raises(ValueError, match="target_rows"):
        temperature_fractions(docs, "lang", target_rows=0)
    with _pytest.raises(ValueError, match="alpha"):
        temperature_fractions(docs, "lang", target_rows=10, alpha=-1)


def test_pack_sequences_by_bpe_counts(spark):
    from graphforge_spark.operators import bpe
    from graphforge_spark.operators.docops import pack_sequences

    docs = spark.createDataFrame(
        [(i, "newest widest low lower " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, n_merges=6)
    counted = bpe.bpe_tokenize(docs, merges).withColumnRenamed("doc_id", "doc_id")
    packed = pack_sequences(
        docs.join(counted.select("doc_id", "n_bpe_tokens"), "doc_id"),
        budget=16, shards=2, count_col="n_bpe_tokens",
    )
    rows = packed.collect()
    # per-doc slices total the BPE token count, not the whitespace count
    totals = {}
    for r in rows:
        totals[r.doc_id] = totals.get(r.doc_id, 0) + r.slice_len
    want = {r.doc_id: r.n_bpe_tokens for r in counted.collect()}
    assert totals == want
    # interior windows exactly full
    by_bin = {}
    for r in rows:
        by_bin.setdefault((r.shard, r.bin), 0)
        by_bin[(r.shard, r.bin)] += r.slice_len
    for (shard, b), n in by_bin.items():
        last = max(bb for ss, bb in by_bin if ss == shard)
        if b < last:
            assert n == 16


def test_keep_list_priority_selection(spark):
    from graphforge_spark.operators.docops import neardup_keep_list

    text = "the river valley holds a long history of trade and settlement here"
    docs = spark.createDataFrame(
        [
            (0, text, 1.0),               # exact dup, low priority
            (1, text, 5.0),               # exact dup, HIGH priority → kept
            (2, text.replace("here", "now"), 2.0),  # near dup, mid priority
            (3, "completely different content about lighthouse keepers", 0.5),
        ],
        "doc_id long, text string, prio double",
    )
    rows = {
        r.doc_id: (r.rep_id, r.keep)
        for r in neardup_keep_list(docs, priority_col="prio").collect()
    }
    # all three similar docs share one cluster; the priority winner is 1
    assert rows[0][0] == rows[1][0] == rows[2][0]
    assert rows[1][1] is True and rows[0][1] is False and rows[2][1] is False
    assert rows[3][1] is True  # singleton keeps itself
    # default (no priority): min-id representative kept
    base = {r.doc_id: r.keep for r in neardup_keep_list(docs).collect()}
    assert base[0] is True and base[1] is False


def test_keep_list_priority_null_loses_and_type_validated(spark):
    from graphforge_spark.operators.docops import neardup_keep_list

    text = "the river valley holds a long history of trade and settlement here"
    docs = spark.createDataFrame(
        [(0, text, None), (1, text, 9.0)], "doc_id long, text string, prio double"
    )
    rows = {r.doc_id: r.keep for r in neardup_keep_list(docs, priority_col="prio").collect()}
    assert rows[1] is True and rows[0] is False  # NULL priority must LOSE

    import datetime as dt
    ts_docs = spark.createDataFrame(
        [(0, text, dt.datetime(2024, 1, 1))], "doc_id long, text string, prio timestamp"
    )
    import pytest as _pytest
    with _pytest.raises(ValueError, match="numeric"):
        neardup_keep_list(ts_docs, priority_col="prio").collect()


def test_pack_sequences_null_count_raises(spark):
    """A NULL precomputed count is a wiring bug (incomplete counts join)
    and must fail loudly — a silent drop would erase documents from
    every training window. Zero counts stay a legitimate drop."""
    from graphforge_spark.operators.docops import pack_sequences

    bad = spark.createDataFrame(
        [("a", 3), ("b", None)], "doc_id string, n_bpe_tokens int"
    )
    with pytest.raises(Exception, match="NULL n_bpe_tokens"):
        pack_sequences(bad, budget=4, count_col="n_bpe_tokens").collect()
    ok = pack_sequences(
        spark.createDataFrame([("a", 3), ("b", 0)], "doc_id string, n_bpe_tokens int"),
        budget=4,
        count_col="n_bpe_tokens",
    ).collect()
    assert {r.doc_id for r in ok} == {"a"}
