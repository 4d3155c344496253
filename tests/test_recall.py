"""Recall measurement for every approximate operator — no approximate
path ships unmeasured (VERDICT r1 #10). Each test computes the exact
answer independently (driver-side Python over the collected small corpus)
and asserts a stated recall floor; measured values are recorded in
COVERAGE.md.

- SimHash banding: recall must be EXACTLY 1.0 (bands = max_hamming+1 is
  a pigeonhole guarantee, not a probabilistic one).
- MinHash/LSH near-dup blocking: probabilistic; floor from the S-curve
  (8 hashes / 4 bands: P[candidate] = 1-(1-s^2)^4 ≈ 0.93 at s=0.7).
- ANN hyperplane-LSH top-k: probabilistic; 4 planes at dim=64 — the
  bucket-collision rate for near-neighbors bounds recall@k.
"""

import itertools

import pytest
from pyspark.sql import functions as F

from graphforge_spark.operators import docops, similarity

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from graphforge_spark import corpus

    return corpus.load(spark, SF_DIR, "documents").cache()


def test_simhash_banding_recall_is_exact(spark, docs):
    """The banded self-join must find EVERY pair within the radius —
    compare against brute force over the same fingerprints."""
    fps = {
        r.doc_id: r.simhash for r in docops.simhash_fingerprints(docs).collect()
    }
    max_h = 6
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(fps), 2)
        if bin(fps[a] ^ fps[b]).count("1") <= max_h
    }
    banded = {
        (r.id_a, r.id_b)
        for r in docops.simhash_neardup_pairs(docs, max_hamming=max_h).collect()
    }
    assert exact, "corpus must contain near-dup pairs for the test to bite"
    assert banded == exact  # recall == 1.0 AND precision == 1.0
    # the Manku wide-key variant (block-combination keys, the ≥10⁸-doc
    # configuration) must produce the IDENTICAL pair set: the pigeonhole
    # argument holds for any (b − k)-subset enumeration with b > k
    wide = {
        (r.id_a, r.id_b)
        for r in docops.simhash_neardup_pairs(
            docs, max_hamming=max_h, wide_blocks=8
        ).collect()
    }
    assert wide == exact


def test_simhash_degenerate_bucket_cap_is_counted(spark):
    """A degenerate corpus (many identical docs → one fingerprint value)
    must not go O(n²): the max_bucket guard excludes the hot buckets from
    the self-join, and lsh_bucket_stats counts exactly what was dropped."""
    rows = [(i, "same boilerplate text repeated everywhere") for i in range(60)]
    rows += [(100 + i, f"unique document number {i} with its own words {i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = docops.simhash_neardup_pairs(docs, max_hamming=6, max_bucket=10)
    pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    # every pair among the 60 identical docs lives in over-cap buckets →
    # all excluded; nothing else is within hamming 6 of anything
    assert pairs == set()

    fp = docops.simhash_fingerprints(docs)
    banded = docops.simhash_banded(fp, "doc_id", max_hamming=6)
    stats = docops.lsh_bucket_stats(banded, max_bucket=10)
    dropped = stats.filter(F.col("dropped")).collect()
    # 7 bands × 1 degenerate fingerprint = 7 hot buckets of size 60
    assert len(dropped) == 7
    assert all(r.size == 60 for r in dropped)
    # uncapped, the identical docs ARE all pairwise near-dups (sanity)
    full = docops.simhash_neardup_pairs(docs, max_hamming=6, max_bucket=None)
    assert full.count() == 60 * 59 // 2


def test_minhash_lsh_blocking_recall(spark, docs):
    """LSH candidate generation (8 hashes, 4 bands) vs exact 3-gram
    Jaccard: every pair with s >= 0.7 should be a candidate with
    P = 1-(1-s^2)^4 >= 0.93; assert measured corpus recall >= 0.85."""
    rows = docs.select("doc_id", "text").collect()

    def sh(text):
        toks = [t for t in __import__("re").split(r"[^\w]+", text.lower()) if t]
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)}

    shingles = {r.doc_id: sh(r.text) for r in rows}
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(shingles), 2)
        if shingles[a]
        and shingles[b]
        and len(shingles[a] & shingles[b]) / len(shingles[a] | shingles[b]) >= 0.7
    }
    cand = {
        (r.id_a, r.id_b)
        for r in docops.lsh_neardup_pairs(docs, num_hashes=8, bands=4).collect()
    }
    assert exact, "corpus must contain high-Jaccard pairs"
    recall = len(exact & cand) / len(exact)
    print(f"minhash-lsh blocking recall@J>=0.7: {recall:.3f} ({len(exact)} exact pairs)")
    assert recall >= 0.85


def test_embedding_neardup_lsh_recall(spark):
    """LSH-blocked near-dup pairs vs the exact O(n²) pair set at the same
    threshold — the scale path's candidate loss, measured."""
    from graphforge_spark import corpus

    vecs = corpus.load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") < 300).cache()
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_pairs(vecs, threshold=0.35).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_neardup_lsh_pairs(
            vecs, dim=64, threshold=0.35, n_planes=4, n_tables=4
        ).collect()
    }
    assert exact, "corpus must contain near-dup pairs at this threshold"
    assert lsh <= exact  # precision 1.0: verify step is exact
    recall = len(lsh) / len(exact)
    print(f"embedding-neardup lsh recall@sim>=0.35: {recall:.3f} ({len(exact)} exact)")
    assert recall >= 0.5


def test_ann_lsh_recall_vs_exact(spark):
    """Hyperplane-LSH bucketed top-k vs exact cosine top-k, recall@3 over
    8 queries. 4 planes ⇒ 16 buckets; same-bucket probability for a pair
    at angle θ is (1-θ/π)^4 — assert the measured floor."""
    from graphforge_spark import corpus

    vecs = corpus.load(spark, SF_DIR, "embeddings").cache()
    queries = vecs.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(vecs, queries, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_bucketed_topk(
            vecs, queries, dim=64, k=3, n_planes=4
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    print(f"ann-lsh recall@3 (4 planes): {recall:.3f}")
    assert recall >= 0.25
    # more planes trade recall for bucket selectivity — 2 planes must not
    # do worse than 4 (coarser buckets ⇒ more candidates scored)
    approx2 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_bucketed_topk(
            vecs, queries, dim=64, k=3, n_planes=2
        ).collect()
    }
    recall2 = len(exact & approx2) / len(exact)
    print(f"ann-lsh recall@3 (2 planes): {recall2:.3f}")
    assert recall2 >= recall
    # multiprobe (one-bit-flip query-side probes) is the measured default:
    # recall@3 0.958 at 4 tables / 4 planes on this worst-case corpus
    # (full sweep in COVERAGE.md) — assert the ≥0.8 floor
    mp = {
        (r.query_id, r.neighbor_id)
        for r in similarity.lsh_bucketed_topk(
            vecs, queries, dim=64, k=3, n_planes=4, multiprobe=True
        ).collect()
    }
    recall_mp = len(exact & mp) / len(exact)
    print(f"ann-lsh recall@3 (4 tables, 4 planes, multiprobe): {recall_mp:.3f}")
    assert recall_mp >= 0.8


def test_ann_ivf_recall_vs_exact(spark):
    """IVF (spherical k-means cells + nprobe) vs exact cosine top-k,
    recall@3 over 8 queries. On this near-random corpus (worst case for
    any space partitioning) recall tracks candidate fraction ≈
    nprobe/n_centroids; measured 0.542 at 16/4 and 0.833 at 16/8 —
    assert floors below the measured points, and that more probes never
    lose recall."""
    from graphforge_spark import corpus

    vecs = corpus.load(spark, SF_DIR, "embeddings").cache()
    queries = vecs.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(vecs, queries, k=3).collect()
    }
    centroids = similarity.ivf_train(vecs, n_centroids=16, iters=3)
    got4 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            vecs, queries, k=3, n_centroids=16, nprobe=4, centroids=centroids
        ).collect()
    }
    got8 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            vecs, queries, k=3, n_centroids=16, nprobe=8, centroids=centroids
        ).collect()
    }
    r4 = len(exact & got4) / len(exact)
    r8 = len(exact & got8) / len(exact)
    print(f"ann-ivf recall@3: nprobe=4 {r4:.3f}, nprobe=8 {r8:.3f}")
    assert r4 >= 0.3
    assert r8 >= 0.6
    assert r8 >= r4


def test_ann_sq_recall_vs_exact(spark):
    """int8 scalar quantization + exact re-scoring vs exact cosine
    top-k, recall@3 over 8 queries. Quantization error only reorders
    NEAR-TIED candidates, so even rescore=1 sits far above the
    space-partitioning paths on this corpus; rescore=4 (default) must
    be exact or nearly so. Also: wider rescore never loses recall."""
    from graphforge_spark import corpus

    vecs = corpus.load(spark, SF_DIR, "embeddings").cache()
    queries = vecs.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(vecs, queries, k=3).collect()
    }
    params = similarity.sq_train(vecs)
    got1 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sq_topk(
            vecs, queries, k=3, rescore=1, params=params
        ).collect()
    }
    got4 = {
        (r.query_id, r.neighbor_id)
        for r in similarity.sq_topk(
            vecs, queries, k=3, rescore=4, params=params
        ).collect()
    }
    r1 = len(exact & got1) / len(exact)
    r4 = len(exact & got4) / len(exact)
    print(f"ann-sq recall@3: rescore=1 {r1:.3f}, rescore=4 {r4:.3f}")
    assert r1 >= 0.8
    assert r4 >= 0.95
    assert r4 >= r1


def test_keeplist_boundary_agreement(spark, docs):
    """End-to-end keep-list vs a brute-force exact-Jaccard keep-list AT
    the operator's default threshold J=0.6 — the boundary where the LSH
    S-curve (8 hashes / 4 bands: P[candidate] ≈ 0.83 at s=0.6) actually
    loses candidates. The value oracle replays the same LSH edges, so it
    cannot see this loss; this test states the measured agreement."""
    import re as _re

    rows = docs.select("doc_id", "text").collect()

    def sh(text):
        toks = [t for t in _re.split(r"[^\w]+", text.lower()) if t]
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)}

    grams = {r.doc_id: sh(r.text) for r in rows}
    norm = {r.doc_id: r.text.strip().lower() for r in rows}
    ids = sorted(grams)

    # brute-force equivalence graph: exact dups + all J >= 0.6 pairs
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in itertools.combinations(ids, 2):
        if norm[a] == norm[b]:
            union(a, b)
            continue
        u = grams[a] | grams[b]
        if u and len(grams[a] & grams[b]) / len(u) >= 0.6:
            union(a, b)
    truth = {i: find(i) for i in ids}
    # min-id representative requires full path compression to the root
    truth = {i: find(i) for i in ids}

    got = {
        r.doc_id: r.rep_id
        for r in docops.neardup_keep_list(docs, jaccard_threshold=0.6).collect()
    }
    keep_truth = {i for i in ids if truth[i] == i}
    keep_got = {i for i in ids if got[i] == i}
    sym = keep_truth ^ keep_got
    agreement = 1 - len(sym) / len(ids)
    print(f"keep-list agreement vs brute force at J=0.6: {agreement:.4f} "
          f"({len(sym)} of {len(ids)} docs differ)")
    assert agreement >= 0.95


# --- r5: ExactSubstr window formulation vs a true suffix-array oracle -------
# (r4 verdict #5). RESULT: the gap is CLOSED — the two are token-level
# EQUIVALENT for keep-first semantics, modulo the documented 2^-64 hash
# collisions. Argument, both directions:
#   engine ⊆ oracle — a flagged window is a duplicated hash whose
#     instance is not the global (doc,pos) minimum; pairing it with its
#     canonical instance gives a common extension ≥ k starting at the
#     window, so the oracle marks every token the window covers.
#   oracle ⊆ engine — an oracle-marked run [i, i+L), L ≥ k, matched an
#     occurrence at a strictly-earlier (doc,pos); each of its k-windows
#     has an identical window at the correspondingly-earlier position,
#     so no window instance inside the marked run is the global minimum
#     — all are flagged, and their [pos, pos+k) intervals tile the run.
# The cases below are the adversarial shapes where window-level methods
# are EXPECTED to diverge if the election were wrong: periodic text with
# period < k (every window hash repeats in-document), chained block
# overlaps (A+B / B+C / C+A), canonical-later orders, exact-k runs, and
# nested within-document repeats.


def _substr_oracle_removed(docs: dict, k: int) -> dict:
    """Pairwise longest-common-extension oracle (the suffix-array
    semantics, O(n^2) — test-corpus-sized only): token (d, i) is removed
    iff it lies inside a run of >= k tokens that also occurs at a
    globally-earlier (doc, pos)."""
    ids = sorted(docs)
    removed = {d: set() for d in ids}
    occ = [(d, i) for d in ids for i in range(len(docs[d]))]
    for a in range(len(occ)):
        d1, i1 = occ[a]
        for b in range(a + 1, len(occ)):
            d2, i2 = occ[b]
            if d1 == d2 and i2 <= i1:
                continue
            t1, t2 = docs[d1], docs[d2]
            L = 0
            while (
                i1 + L < len(t1)
                and i2 + L < len(t2)
                and t1[i1 + L] == t2[i2 + L]
            ):
                L += 1
            if L >= k:
                removed[d2].update(range(i2, i2 + L))
    return removed


def _substr_engine_removed(docs: dict, k: int, spark) -> dict:
    from graphforge_spark.operators.docops import dedup_substrings

    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs.items()], "doc_id string, text string"
    )
    out = dedup_substrings(df, k=k, emit_spans=True).collect()
    rem = {}
    for r in out:
        s = set()
        for sp in r.removed_spans:
            s.update(range(sp.s - 1, min(sp.e - 1, r.n_tokens_in)))
        rem[r.doc_id] = s
    return rem


def test_exact_substring_matches_suffix_array_oracle(spark):
    k = 50
    A = [f"A{i}" for i in range(60)]
    B = [f"B{i}" for i in range(55)]
    C = [f"C{i}" for i in range(70)]
    per1 = ["p"] * 200
    per7 = [f"q{i % 7}" for i in range(210)]
    cases = {
        "periodic_within": {"d0": per1 + ["z1", "z2"], "d1": ["y0"] + per7},
        "periodic_across": {"d0": per1[:120], "d1": per1[:90], "d2": per7[:100], "d3": per7},
        "chain_overlap": {"d0": A + B, "d1": B + C, "d2": C + A, "d3": A + B + C},
        "reverse_first": {"d0": C, "d1": B, "d2": A, "d3": A + B + C},
        "within_doc_repeat": {"d0": A + B + A, "d1": B + A + B},
        "staggered": {"d0": A + B, "d1": A[10:] + B + C[:30], "d2": A[25:] + B},
        "tail_head": {"d0": A, "d1": A[-49:] + B[:49], "d2": A + B},
        "exact_k_runs": {"d0": A[:50] + ["x1"] + B[:50], "d1": B[:50] + ["x2"] + A[:50]},
        "nested": {"d0": A + A[:55] + A, "d1": A[:52]},
    }
    for name, docs in cases.items():
        want = _substr_oracle_removed(docs, k)
        got = _substr_engine_removed(docs, k, spark)
        for d in docs:
            assert got.get(d, set()) == want[d], (name, d)


def test_exact_substring_oracle_random_blocks(spark):
    # seeded random block corpora at the paper's k=50 and a small k=8:
    # shared blocks, unique filler, whole-tail self-repeats
    import random

    for k, (lo, hi), seed in [(50, (40, 80), 1), (50, (20, 60), 2), (8, (6, 20), 3)]:
        rng = random.Random(seed)
        blocks = [
            [f"b{b}w{j}" for j in range(rng.randint(lo, hi))] for b in range(5)
        ]
        uid = 0
        docs = {}
        for d in range(8):
            toks = []
            for _ in range(rng.randint(2, 6)):
                if rng.random() < 0.7:
                    toks += rng.choice(blocks)
                else:
                    flen = rng.randint(5, 30)
                    toks += [f"u{uid}x{j}" for j in range(flen)]
                    uid += 1
            if rng.random() < 0.3 and len(toks) > k:
                toks = toks + toks[: rng.randint(k, len(toks))]
            docs[f"d{d:03d}"] = toks
        want = _substr_oracle_removed(docs, k)
        got = _substr_engine_removed(docs, k, spark)
        for d in docs:
            assert got.get(d, set()) == want[d], (k, seed, d)
