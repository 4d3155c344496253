"""Training-data pipeline operators over a documents table.

These go beyond the reference's own operator set (SURVEY §2C notes the
gaps): at 100 TB the same engine that forges the KG also has to curate
its input corpus. Everything here is JVM-side column algebra built on the
md5-portable primitives in functions/hashing.py and functions/text.py, so
each operator is oracle-checkable in DuckDB and stays inside whole-stage
codegen — no Python in any hot path.

Operators:
- dedup_lines: corpus-level duplicate-line scrub (C4-style boilerplate
  removal — one shuffle on the normalized-line hash)
- dedup_substrings: cross-document exact-substring dedup (Lee et al.
  2022, re-expressed as distributed k-token window hashing — one
  explode, one count shuffle, one hash-keyed join)
- repetition_ratios: within-doc repetition quality gates (dup-line and
  modal-bigram fractions, Gopher-style; narrow)
- exact_dedup_groups: hash-groupBy exact dedup (one shuffle, partial agg)
- minhash_signatures: k-component MinHash over word shingles (narrow)
- lsh_neardup_pairs:  banded-LSH candidate pairs (shuffle on band key)
- ngram_jaccard_pairs: exact n-gram Jaccard over LSH candidates
  (shingles computed only for candidate docs)
- simhash_fingerprints / simhash_neardup_pairs: 64-bit SimHash
  (explode + codegen'd bit-vote aggregates) + recall-exact banded join
- neardup_keep_list: exact+near-dup equivalence graph → CC → keep flag
- stratified_sample: deterministic salted-hash per-stratum sampling
- redact_pii / contamination_check: PII scrub; train/eval n-gram overlap
- doc_stats / corpus_stats: per-doc text analysis + per-language rollup
- pack_sequences: concat-and-chunk sequence packing into fixed
  token-budget training windows (per-shard running count, one shuffle)
- tfidf_vectors: hashing-trick TF-IDF document embeddings (two
  combinable aggs + one vocab join; Arrow-batched scatter-add assembly)
- temperature_fractions: α-temperature dataset-mixing fractions
  (one groupBy count; water-filled caps), feeding stratified_sample

Scale notes: every pairwise operator goes through LSH blocking first —
the O(n²) cross product never materializes; band buckets are the shuffle
key and degenerate buckets are capped (same pathology handling as
operators/link.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphforge_spark.corpus import spread_small_scan
from graphforge_spark.functions.hashing import (
    exact_text_key,
    band_key,
    hamming64,
    md5_minhash_cols,
    portable_bucket,
    tok_hash64,
)
from graphforge_spark.functions.text import (
    bpe_ish_token_count,
    langid_scores,
    quality_features,
    rolling_fingerprint,
    shingles,
    tokens,
)


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_repeats: int = 2,
    min_chars: int = 10,
) -> DataFrame:
    """Corpus-level duplicate-LINE removal (the C4-style boilerplate
    scrub): any line whose normalized form appears in ≥ ``min_repeats``
    documents (nav bars, cookie banners, license footers) is dropped from
    every document; short lines (< ``min_chars`` after trim) are kept
    as-is — they are too generic to be meaningful boilerplate signals.

    Output: (id, text, n_lines_in, n_lines_kept) with line order and
    original line text preserved for the kept lines.

    Scale shape: explode to (doc, line_no, line); count distinct DOCS per
    normalized-line hash (two-phase distinct aggregate — boilerplate
    lines are exactly the hot keys and collapse to one row each); the hot
    set is SMALL by construction (lines repeated across many docs), so
    the exclusion join broadcasts it; one groupBy(doc) reassembly; input
    line counts come narrowly from the original text (no extra shuffle).
    No Python anywhere."""
    norm = F.lower(F.trim(F.col("_line")))
    docs = spread_small_scan(docs)
    lines = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_line"),
    )
    eligible = lines.filter(F.length(F.trim(F.col("_line"))) >= min_chars)
    hot = (
        eligible.select(F.md5(norm).alias("_h"), "_id")
        .groupBy("_h")
        .agg(F.count_distinct("_id").alias("_docs"))
        .filter(F.col("_docs") >= min_repeats)
        .select("_h")
    )
    kept = lines.withColumn(
        "_h",
        F.when(F.length(F.trim(F.col("_line"))) >= min_chars, F.md5(norm)),
    ).join(hot.withColumnRenamed("_h", "_hot"), F.col("_h") == F.col("_hot"), "left_anti")
    reassembled = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_ln"), F.col("_line")))
                ),
                lambda s: s["_line"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("n_lines_kept"),
    )
    # input line counts derive narrowly from the original text — no
    # second explode+groupBy pass over the corpus
    counts = docs.select(
        F.col(id_col).alias("_id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines_in"),
    )
    return counts.join(reassembled, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("n_lines_kept", F.lit(0)).alias("n_lines_kept"),
        "n_lines_in",
    )


def dedup_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    emit_spans: bool = False,
) -> DataFrame:
    """Cross-document exact-substring deduplication (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" operator,
    re-expressed as distributed window hashing instead of a suffix
    array, which does not shard): every duplicated run of ≥ ``k``
    whitespace tokens is removed from all but its globally-first
    occurrence.

    Mechanics: each document yields one row per k-token window
    (position, 64-bit xxhash of the window text). A global count per
    window hash finds duplicated windows and elects the canonical
    occurrence — min(doc_id, pos), deterministic under retries and
    repartitioning. Every NON-canonical duplicated window marks the
    token interval [pos, pos+k); per document the marked intervals are
    merged and the covered tokens cut, so overlapping duplicate windows
    collapse into one excised span and a duplicated run of length
    m ≥ k disappears entirely (its m−k+1 windows tile the run).

    Guarantees (stated exactly): the window formulation is TOKEN-LEVEL
    EQUIVALENT to keep-first suffix-array deduplication, modulo the
    2^-64 hash collisions — proven both directions and verified against
    a pairwise-LCE oracle on adversarial corpora (periodic text with
    period < k, chained block overlaps, nested within-document repeats)
    in tests/test_recall.py. Engine ⊆ oracle: a flagged window pairs
    with its canonical instance into a ≥ k common extension, so every
    token it covers is oracle-marked. Oracle ⊆ engine: each k-window of
    a marked run has an identical window at the correspondingly-earlier
    (doc, pos), so no window instance inside the run is the global
    minimum — all are flagged and their intervals tile the run. Removal
    is token-level: output text is the kept tokens joined by single
    spaces (original inter-token whitespace is normalized, the standard
    trade of this operator).

    Output: (id, text, n_tokens_in, n_tokens_removed, n_spans);
    ``emit_spans=True`` adds ``removed_spans`` — the merged excised
    intervals as 1-based token ``[s, e)`` structs (provenance for audits
    and for the suffix-array-oracle recall measurement in test_recall).

    Scale shape: ONE explode to (doc, pos, hash64) rows — 8 bytes of
    key per token, the minimum a global duplicate decision can carry;
    one groupBy(hash) with map-side partial aggregation (count +
    min-struct both combine); one hash-keyed join back (both sides
    already clustered on the hash); one groupBy(doc) to merge intervals
    in-array. Duplicated-window hashes are by construction the hot
    keys, and they collapse to one row each in the count — no skew
    amplification. A 2⁻⁶⁴ hash-collision rate is the approximation this
    buys scale with; collisions only ever remove a false-duplicate
    window, never corrupt surviving text. No Python anywhere."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2 (got {k})")
    docs = spread_small_scan(docs)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    base = docs.select(
        F.col(id_col).alias("_id"), toks.alias("_toks")
    ).withColumn("_n", F.size("_toks"))
    # one row per k-window: (_id, _pos, _h) with _pos the 1-based token
    # index of the window start; docs shorter than k yield none
    wins = (
        base.filter(F.col("_n") >= k)
        .select(
            "_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - k + 1),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(F.col("_toks"), i, k))
                    ),
                )
            ).alias("_pos0", "_h"),
        )
        .select("_id", (F.col("_pos0") + 1).alias("_pos"), "_h")
    )
    dup = (
        wins.groupBy("_h")
        .agg(
            F.count("*").alias("_cnt"),
            F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_first"),
        )
        .filter(F.col("_cnt") >= 2)
    )
    flagged = wins.join(dup, "_h").filter(
        ~((F.col("_id") == F.col("_first._id")) & (F.col("_pos") == F.col("_first._pos")))
    )
    # merge per-doc intervals [pos, pos+k) in-array: fold the sorted
    # starts, extending the last span when the next window overlaps it
    spans = flagged.groupBy("_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("_pos")),
            F.array().cast("array<struct<s:int,e:int>>"),
            lambda acc, p: F.when(
                (F.size(acc) > 0) & (p <= F.element_at(acc, -1)["e"]),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(
                        F.struct(
                            F.element_at(acc, -1)["s"].alias("s"),
                            (p + k).cast("int").alias("e"),
                        )
                    ),
                ),
            ).otherwise(
                F.concat(
                    acc,
                    F.array(
                        F.struct(p.cast("int").alias("s"), (p + k).cast("int").alias("e"))
                    ),
                )
            ),
        ).alias("_spans")
    )
    cut = (
        base.join(spans, "_id", "left")
        .withColumn(
            "_covered",
            F.coalesce(
                F.flatten(
                    F.transform(F.col("_spans"), lambda sp: F.sequence(sp["s"], sp["e"] - 1))
                ),
                F.array().cast("array<int>"),
            ),
        )
        .withColumn(
            "_kept",
            # sequence(1, 0) would DESCEND — guard the empty doc
            F.when(
                F.col("_n") > 0,
                F.array_except(
                    F.sequence(F.lit(1), F.col("_n")).cast("array<int>"), "_covered"
                ),
            ).otherwise(F.array().cast("array<int>")),
        )
    )
    out_cols = [
        F.col("_id").alias(id_col),
        F.when(F.col("_n") == 0, F.lit("")).otherwise(
            F.concat_ws(
                " ", F.transform(F.col("_kept"), lambda j: F.element_at(F.col("_toks"), j))
            )
        ).alias("text"),
        F.col("_n").alias("n_tokens_in"),
        (F.col("_n") - F.size("_kept")).alias("n_tokens_removed"),
        F.coalesce(F.size("_spans"), F.lit(0)).alias("n_spans"),
    ]
    if emit_spans:
        out_cols.append(
            F.coalesce(
                F.col("_spans"), F.array().cast("array<struct<s:int,e:int>>")
            ).alias("removed_spans")
        )
    return cut.select(*out_cols)


def repetition_ratios(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText-style
    quality gates): duplicate-line fraction and top-2-gram fraction.
    High values mark spam/boilerplate-heavy documents a curation run
    filters out. Narrow column algebra — no shuffle, no Python:

    - dup_line_frac: 1 − distinct(lines)/lines  (empty docs → 0.0)
    - top_bigram_frac: occurrences of the most frequent word bigram over
      total bigrams, via aggregate over the sorted bigram array (run-
      length of the longest run after sort)."""
    lines_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    toks = tokens(F.col(text_col))
    n_toks = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n_toks - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n_toks - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    sorted_bg = F.array_sort(bigrams)
    # longest equal run in the sorted array = count of the modal bigram
    run = F.aggregate(
        sorted_bg,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("cur"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    n_lines = F.size(lines_arr)
    n_bg = F.size(bigrams)
    return docs.select(
        F.col(id_col),
        F.when(
            n_lines > 0,
            1.0 - F.size(F.array_distinct(lines_arr)) / n_lines.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(n_bg > 0, run / n_bg.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact-duplicate groups: md5 of normalized text → (text_hash, n_docs,
    min_doc_id). Normalization = lower + trim (whitespace-insensitive
    variants are a caller concern). One shuffle with map-side combine."""
    h = exact_text_key(F.col(text_col))
    return (
        docs.select(F.col(id_col), h.alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("min_doc_id"))
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signature columns mh_0..mh_{k-1} over word
    n-gram shingles. Entirely narrow (no explode, no shuffle): each
    component is array_min(transform(shingles, md5(i||s))).

    The shingle array is materialized behind its own projection so the k
    signature columns share ONE shingle construction — CollapseProject
    keeps non-cheap expressions un-inlined, so inlining it k times (the
    one-select version) costs k× the tokenize/shingle work per row.

    Kept on k INDEPENDENT md5 families after an r3 experiment: deriving
    k components from ONE hash via linear re-mixes ((a_i·h+b_i) mod p)
    was value-oracled and no faster (shingle construction dominates, not
    the md5s) but lost 7.5× blocking precision — the re-mixed argmins
    correlate through the shared h ordering, so band keys collide
    together and the candidate set blew up 826 → 6190 pairs at sf0.1.
    Independent hash bits per component are what keep candidate volume
    (= verify cost at 100 TB) at the S-curve's prediction."""
    base = spread_small_scan(docs).select(
        F.col(id_col), F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh")
    )
    return base.select(F.col(id_col), *md5_minhash_cols(F.col("_sh"), num_hashes))


def lsh_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs sharing ≥1 LSH band bucket.

    rows_per_band = num_hashes / bands; the Jaccard S-curve midpoint is
    ≈ (1/bands)^(bands/num_hashes). Output: distinct (id_a < id_b)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, num_hashes, shingle_n)
    mh_cols = [f"mh_{i}" for i in range(num_hashes)]
    banded = sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[band_key(mh_cols, b, rows_per_band) for b in range(bands)])
        ).alias("bucket"),
    )
    return bucket_pairs(banded, max_bucket)


def lsh_bucket_stats(
    banded: DataFrame, max_bucket: int, id_col: str = "id"
) -> DataFrame:
    """Per-bucket population metrics for any banded LSH frame
    ((id, bucket) rows): (bucket, size, dropped). This is the metrics
    frame backing the counted-drop claim of every bucket-capped blocking
    path (``bucket_pairs``, ``simhash_neardup_pairs``,
    ``link.lsh_candidates``): aggregate ``dropped`` to see how many
    buckets — and via ``size`` how many candidate ids — the cap excluded.
    One combinable shuffle; call it on the same banded frame the blocking
    consumed."""
    return (
        banded.groupBy("bucket")
        .agg(F.count(id_col).alias("size"))
        .withColumn("dropped", F.col("size") > F.lit(max_bucket))
    )


def bucket_pairs(banded: DataFrame, max_bucket: int, id_col: str = "id") -> DataFrame:
    """Distinct (id_a < id_b) pairs sharing a bucket — ONE shuffle.

    groupBy(bucket) + collect_list + in-array pair generation computes the
    (expensive) bucket input exactly once, unlike a banded self-join which
    re-evaluates it for the size cap and both join sides. Buckets larger
    than ``max_bucket`` are dropped (the degenerate-hot-bucket guard);
    within-bucket pair expansion is bounded by max_bucket² per group."""
    buckets = (
        banded.groupBy("bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda a, i: F.transform(
                        # elements strictly after position i (1-based slice)
                        F.slice(
                            F.col("ids"), i + 2, F.greatest(F.size("ids") - i - 1, F.lit(0))
                        ),
                        lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.select(F.col("p.id_a"), F.col("p.id_b")).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for candidate pairs.

    ``pairs`` defaults to LSH blocking output — exact verification of
    approximate candidates, the standard two-phase near-dup design. The
    Jaccard itself is set algebra on shingle arrays (array_intersect /
    array_union sizes), JVM-side."""
    if pairs is None:
        pairs = lsh_neardup_pairs(
            docs, id_col, text_col, num_hashes=num_hashes, bands=bands, shingle_n=shingle_n
        )
    # Shingle only the docs that appear in a candidate pair — candidates
    # are a vanishing fraction of the corpus at scale, and the shingle
    # scan is the expensive part of this operator (measured: one full
    # scan ≈ half the leg's wall time at sf0.1). The semi-join is
    # AQE-planned (broadcast when the id set is small).
    cand_ids = (
        pairs.select(F.col("id_a").alias("_cid"))
        .union(pairs.select(F.col("id_b").alias("_cid")))
        .distinct()
    )
    cand_docs = docs.join(
        cand_ids, F.col(id_col) == F.col("_cid"), "left_semi"
    )
    sh = spread_small_scan(cand_docs).select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    # Join order matters at scale: the candidate-pair set (bounded by LSH
    # banding + max_bucket) is bare ids — broadcast it and STREAM the
    # shingle table, so the first join never shuffles per-document arrays.
    # The second join's left side carries shingle ARRAYS (pairs × avg
    # array size — can blow the broadcast ceiling at corpus scale), so no
    # explicit hint: AQE size-gates a runtime broadcast by actual bytes
    # and falls back to a shuffle join that moves each array once.
    a = sh.join(F.broadcast(pairs), sh._id == pairs.id_a).select(
        "id_a", "id_b", F.col("_sh").alias("sh_a")
    )
    out = sh.join(a, sh._id == a.id_b).select(
        "id_a",
        "id_b",
        (
            F.size(F.array_intersect("sh_a", F.col("_sh")))
            / F.greatest(F.size(F.array_union("sh_a", F.col("_sh"))), F.lit(1))
        ).alias("jaccard"),
    )
    return out.filter(F.col("jaccard") >= threshold)


def simhash_fingerprints(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit (60 effective) SimHash per document.

    Formulation: explode tokens → hash once → 60 codegen'd per-bit SUM
    aggregates per doc → assemble the fingerprint from the vote counters.
    Measured 3× faster than the pure-column HOF fold
    (functions.hashing.simhash64, kept for array-input callers): Spark
    interprets higher-order array functions per element, while explode +
    hash-aggregate stays inside whole-stage codegen with map-side partial
    aggregation — the doc_id shuffle carries only 61 longs per document.
    Bit-identical to simhash64 (verified at sf0.1)."""
    ex = spread_small_scan(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    ).select(id_col, tok_hash64(F.col("_tok")).alias("_h"))
    aggs = [
        F.sum(F.shiftright(F.col("_h"), b).bitwiseAND(F.lit(1).cast("long"))).alias(
            f"_c{b}"
        )
        for b in range(60)
    ]
    cnt = ex.groupBy(id_col).agg(F.count("*").alias("_n"), *aggs)
    fp = F.lit(0).cast("long")
    for b in range(60):
        fp = fp.bitwiseOR(
            F.when(F.col(f"_c{b}") * 2 > F.col("_n"), F.lit(1 << b).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    with_fp = cnt.select(F.col(id_col), fp.alias("simhash"))
    # docs with zero tokens never reach the aggregate (explode drops them);
    # they carry the empty fingerprint 0, same as the fold formulation
    return (
        docs.select(F.col(id_col))
        .join(with_fp, id_col, "left")
        .select(F.col(id_col), F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_band_layout(max_hamming: int, bands: int | None = None) -> list[tuple[int, int]]:
    """(start_bit, width) per band over the 60-bit fingerprint.

    Recall guarantee is pigeonhole: a pair at hamming distance d differs in
    at most d bands, so with ``bands > max_hamming`` at least one band is
    bit-identical and the band-equality join finds the pair. ``bands``
    defaults to ``max_hamming + 1`` — the fewest bands (widest keys, best
    blocking selectivity) that still guarantee 100% recall. An explicit
    ``bands <= max_hamming`` is a silent-recall-loss configuration and is
    rejected loudly."""
    if bands is None:
        bands = max_hamming + 1
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at max_hamming={max_hamming}: "
            f"a pair may differ in every band (need bands > max_hamming)"
        )
    if bands > 60:
        raise ValueError(f"bands={bands} exceeds the 60 fingerprint bits")
    base, extra = divmod(60, bands)
    layout, start = [], 0
    for b in range(bands):
        width = base + (1 if b < extra else 0)
        layout.append((start, width))
        start += width
    return layout


def _simhash_block(start: int, width: int):
    return F.shiftright(F.col("simhash"), start).bitwiseAND(F.lit((1 << width) - 1))


def simhash_banded(
    fp: DataFrame,
    id_col: str,
    max_hamming: int,
    bands: int | None = None,
    wide_blocks: int | None = None,
) -> DataFrame:
    """(id, simhash, bucket) rows for the SimHash blocking self-join.

    Two key schemes, both pigeonhole-EXACT for hamming ≤ max_hamming:

    - default (``wide_blocks=None``): ``bands`` single-block keys
      (bands > max_hamming ⇒ at least one band is bit-identical). Key
      width ≈ 60/bands bits — at max_hamming=6 that is 8-9 bits, so
      bucket population grows linearly with corpus size (n/2^width per
      bucket): fine to ~10⁷ docs, degenerate at 10⁹.
    - wide (Manku-style block combinations, ``wide_blocks=b`` with
      b > max_hamming): split into b blocks and emit one key per
      (b − max_hamming)-subset of blocks, concatenating those blocks'
      values. A pair at distance ≤ k dirties at most k blocks, so at
      least one enumerated subset is all-clean and its concatenated key
      matches — recall stays exact. Keys are (b−k)× wider (b=8, k=6 →
      C(8,2)=28 tables of ~15-bit keys vs 7 tables of 8-9 bits): bucket
      population shrinks ~2^7×, at 4× the exploded rows — the scale
      trade a 10⁹-doc corpus needs.

    Bucket keys are LONGs (xxhash64 over table index + block values),
    not strings: the self-join touches every within-bucket candidate
    pair, and hashing/comparing a long beats a concat'd string on each
    of the ~10⁸-10⁹ probes a dense corpus generates — measured 2× on
    the whole operator at the sf1 replica corpus (67.7 → 35.2 s banded,
    70.9 → 30.3 s wide at 50k docs / 1.45M true pairs, local[32]). An
    xxhash64 key collision would only MERGE two buckets — extra
    candidates for the exact hamming filter to discard, never a lost
    pair — so the recall proof is unaffected."""
    layout = simhash_band_layout(max_hamming, wide_blocks or bands)
    if wide_blocks is None:
        keys = [
            F.xxhash64(F.lit(b), _simhash_block(start, width))
            for b, (start, width) in enumerate(layout)
        ]
    else:
        from itertools import combinations

        take = wide_blocks - max_hamming
        keys = [
            F.xxhash64(F.lit(ci), *[_simhash_block(*layout[bi]) for bi in combo])
            for ci, combo in enumerate(combinations(range(wide_blocks), take))
        ]
    return fp.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(F.array(*keys)).alias("bucket"),
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 6,
    bands: int | None = None,
    max_bucket: int | None = 10_000,
    wide_blocks: int | None = None,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming — EXACT
    (100% recall): ``bands`` defaults to ``max_hamming + 1`` so by
    pigeonhole every qualifying pair shares at least one bit-identical
    band (see ``simhash_band_layout``); the band-equality self-join is
    pure blocking, and the post-join hamming filter makes the result the
    exact distance-≤-k pair set.

    Scale guards:

    - ``max_bucket``: buckets whose population exceeds it are excluded
      from the self-join — a degenerate fingerprint value (all-zero
      fingerprints from empty/near-empty docs, boilerplate-dominated
      corpora) would otherwise produce an unbounded O(n²) task. Drops
      are counted, not silent: ``lsh_bucket_stats`` on the same banded
      frame reports every dropped bucket and its size.
    - ``wide_blocks``: switch to Manku block-combination keys (see
      ``simhash_banded``) — ~2^7× better blocking selectivity at
      max_hamming=6, the configuration to run at ≥10⁸ docs."""
    from graphforge_spark.operators.closure import _ckpt

    # Materialize the fingerprints ONCE (tiny: id + one long per doc).
    # Without this the token-explode + 60-bit-vote aggregation — the
    # expensive part — re-executes for every consumer of the banded
    # frame: both self-join sides plus the max_bucket size filter
    # (measured 6.9 s → 3.9 s for the sf0.1 leg).
    fp = _ckpt(simhash_fingerprints(docs, id_col, text_col))
    # NB: a banded SELF-JOIN is the right shape here, unlike the MinHash
    # path (bucket_pairs): hamming buckets run large, and the codegen'd
    # join beats interpreted in-array pair expansion ~3x on big buckets
    # (measured at sf0.1).
    banded = simhash_banded(fp, id_col, max_hamming, bands, wide_blocks)
    if max_bucket is not None:
        ok = (
            banded.groupBy("bucket")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") <= max_bucket)
            .select("bucket")
        )
        banded = banded.join(ok, "bucket", "left_semi")
    a, b = banded.alias("x"), banded.alias("y")
    return (
        a.join(b, (F.col("x.bucket") == F.col("y.bucket")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            hamming64(F.col("x.simhash"), F.col("y.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# PII patterns restricted to the regex subset shared by Java (Spark) and
# RE2/DuckDB: no backrefs, no lookaround — so the redaction is
# value-oracle-able. Order matters (ipv4 before phone: an IP's digit runs
# would otherwise partially match the phone pattern).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"\+?\d[\d \-()]{7,}\d"),
]


def redact_pii(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    patterns: list[tuple[str, str]] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """PII scrubbing: per-kind match counts + the redacted text.

    Pure JVM regexp column algebra (codegen, narrow — the text never
    shuffles); patterns apply in list order so counts are taken against
    the already-partially-redacted text exactly as the replacement chain
    sees it. Output: (id, n_<kind>..., redacted_text)."""
    patterns = patterns or PII_PATTERNS
    cur = F.col(text_col)
    cols = [F.col(id_col)]
    for kind, pat in patterns:
        cols.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0)).alias(f"n_{kind}"))
        cur = F.regexp_replace(cur, pat, token)
    cols.append(cur.alias("redacted_text"))
    return docs.select(*cols)


def contamination_check(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 8,
) -> DataFrame:
    """Train/eval decontamination: flag training docs sharing any word
    ``shingle_n``-gram with the evaluation set (the standard n-gram
    overlap test run before training).

    Scale shape: the eval side's distinct shingle set is the SMALL side —
    broadcast it; the training side explodes shingles and aggregates hit
    counts per doc (one shuffle, map-side combinable). The eval set is
    bounded by construction (benchmarks are thousands of docs, not
    billions), so the broadcast holds at any training-corpus scale.
    Output: (id, n_hits, contaminated)."""
    ev = (
        eval_docs.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("g")
        )
        .filter(F.col("g") != "")
        .distinct()
    )
    dg = spread_small_scan(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_n))).alias("g"),
    )
    hits = (
        dg.join(F.broadcast(ev), "g")
        .groupBy(id_col)
        .agg(F.count("*").alias("_hits"))
    )
    return (
        docs.select(F.col(id_col))
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def neardup_keep_list(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.6,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    priority_col: str | None = None,
) -> DataFrame:
    """The dedup DECISION for a corpus: (doc_id, rep_id, keep).

    Exact-duplicate groups (same normalized-text hash) and verified
    near-dup pairs (LSH candidates whose exact n-gram Jaccard clears the
    threshold) form one equivalence graph; connected components pick the
    min doc_id per cluster as the representative, and ``keep`` marks it.
    Docs in no cluster are their own representative. This is the operator
    a curation pipeline actually filters on — candidates and similarity
    scores are its internals, not its API.

    Scale shape: LSH-blocked pair generation (no O(n²)), one hash-group
    shuffle for exact dups, and the log-round pointer-jumping CC from
    operators/canonicalize — near-dup clusters are tiny in practice, so
    CC converges in 2-3 rounds."""
    from graphforge_spark.operators.canonicalize import canonical_mapping

    hashed = docs.select(
        F.col(id_col).alias("_id"), exact_text_key(F.col(text_col)).alias("_h")
    )
    exact_rep = hashed.groupBy("_h").agg(F.min("_id").alias("_rep"))
    exact_edges = (
        hashed.join(exact_rep, "_h")
        .filter(F.col("_id") != F.col("_rep"))
        .select(F.col("_id").alias("src"), F.col("_rep").alias("dst"))
    )
    near_edges = ngram_jaccard_pairs(
        docs,
        id_col=id_col,
        text_col=text_col,
        shingle_n=shingle_n,
        threshold=jaccard_threshold,
        num_hashes=num_hashes,
        bands=bands,
    ).select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    mapping = canonical_mapping(exact_edges.union(near_edges))
    out = (
        docs.select(F.col(id_col), *( [priority_col] if priority_col else [] ))
        .join(mapping, F.col(id_col) == mapping.alias_id, "left")
        .select(
            F.col(id_col),
            *([priority_col] if priority_col else []),
            F.coalesce("canonical_id", F.col(id_col)).alias("rep_id"),
        )
    )
    if priority_col is None:
        return out.withColumn("keep", F.col(id_col) == F.col("rep_id"))
    # RefinedWeb-style best-copy selection: within each duplicate
    # cluster keep the HIGHEST-priority member (source quality; cast a
    # recency timestamp to epoch first — numeric enforced loudly), ties
    # broken on min id, NULL priorities lose — one combinable agg over
    # cluster rows, deterministic. rep_id stays the structural (min-id)
    # cluster key; ``keep`` marks the priority winner.
    from graphforge_spark.functions.hashing import best_copy_key

    winner = out.groupBy("rep_id").agg(
        F.min(best_copy_key(out, priority_col, id_col)).alias("_w")
    ).select("rep_id", F.col("_w._id").alias("_keep_id"))
    return (
        out.join(winner, "rep_id")
        .select(
            id_col,
            "rep_id",
            (F.col(id_col) == F.col("_keep_id")).alias("keep"),
        )
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling — the dataset-mixing primitive
    of a training-data pipeline (e.g. downsample low-quality language
    buckets, upweight rare ones by keeping them whole).

    Membership is a pure function of (salt, id): keep iff
    ``md5-bucket(salt:id, 10000) < fraction*10000``. No RNG state, no
    seed plumbing, reproducible across runs/engines (the DuckDB oracle
    replicates it), and — unlike ``df.sample`` — stable under
    repartitioning, retries, and speculative execution at cluster scale.
    Narrow (no shuffle): one hash + one map lookup per row."""
    frac = F.lit(default_fraction)
    for key, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == key, F.lit(f)).otherwise(frac)
    keep = portable_bucket(
        F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")), 10_000
    ) < (frac * 10_000).cast("int")
    return docs.filter(keep)


def corpus_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-language corpus rollup over doc_stats: document counts, token
    volume, mean/extremes — the dashboard aggregation a curation run
    reports. One shuffle with map-side combine (sums/counts/min/max are
    all partially aggregable)."""
    per_doc = doc_stats(docs, id_col, text_col)
    return per_doc.groupBy("lang_pred").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        # exact-integer sum divided once in double: bit-identical across
        # engines, unlike a streaming double avg
        F.round(F.sum("n_chars").cast("double") / F.count("*"), 4).alias("mean_chars"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


def doc_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document text analysis: token counts, quality features,
    language-ID heuristic, winnowing fingerprint. One narrow projection."""
    t = F.col(text_col)
    return spread_small_scan(docs).select(
        F.col(id_col),
        F.size(tokens(t)).cast("long").alias("n_tokens"),
        bpe_ish_token_count(t).alias("bpe_tokens"),
        *quality_features(t),
        langid_scores(t),
        rolling_fingerprint(t),
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: str | None = None,
    shard_col: str | None = None,
) -> DataFrame:
    """Sequence packing for LLM pretraining — the concat-and-chunk
    layout: documents are concatenated into per-shard token streams and
    the stream is split into fixed ``budget``-token training windows, a
    document spanning a boundary contributing a slice to each window it
    crosses. Output: one row per (document × window) slice —
    ``(shard, bin, doc_id, n_tokens, doc_offset, slice_len)`` with
    ``doc_offset`` the slice's first token within the document. Every
    window except each shard's last holds exactly ``budget`` tokens, and
    a document's slices are contiguous and total its token count (both
    pinned in tests against a pure-Python replay).

    Deterministic AND distributed: docs hash to ``shards`` independent
    streams (xxhash64 of the id — stable under retries/repartition, the
    same guarantee as ``stratified_sample``), each stream is ordered by
    doc id, and the window boundaries fall out of a per-shard running
    token count: first window = floor(cum_before/budget), last =
    floor((cum_end-1)/budget), the slice arithmetic pure column algebra
    after ONE window cumsum. Scale shape: one shuffle (the per-shard
    sort); ``shards`` is the parallelism knob — size it to the cluster
    so each stream's sort fits an executor's spill budget. Token count
    is the whitespace tokenizer (``functions.text.tokens``), matching
    ``doc_stats`` — or pass ``count_col`` naming a precomputed per-doc
    token-count column (e.g. ``n_bpe_tokens`` from `bpe.bpe_tokenize`)
    to pack by a trained tokenizer's budget instead.

    ``shard_col`` names a precomputed shard-id column to use INSTEAD of
    the xxhash64 assignment — the driver-oracle configuration (a
    md5-portable ``functions.hashing.portable_bucket`` shard replicates
    in DuckDB, xxhash64 does not) and the hook for co-locating packing
    with an existing partitioning."""
    if budget < 1:
        raise ValueError(f"pack_sequences: budget must be >= 1, got {budget}")
    w = Window.partitionBy("_shard").orderBy(id_col)
    if count_col is not None:
        # a NULL precomputed count is a wiring bug (an incomplete counts
        # join), not an empty doc — empty docs count 0. Silently dropping
        # the row (NULL > 0 is NULL) would erase documents from every
        # training window, so fail loudly instead. coalesce evaluates
        # lazily: non-null rows never reach raise_error.
        n_tok = F.coalesce(
            F.col(count_col).cast("long"),
            F.raise_error(
                F.concat(
                    F.lit(f"pack_sequences: NULL {count_col} for id="),
                    F.col(id_col).cast("string"),
                    F.lit(" — precomputed token-count join is incomplete"),
                )
            ).cast("long"),
        )
    else:
        n_tok = F.size(tokens(F.col(text_col)))
    shard_expr = (
        F.col(shard_col).cast("int")
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(shards)).cast("int")
    )
    staged = (
        docs.select(
            F.col(id_col),
            n_tok.alias("n_tokens"),
            shard_expr.alias("_shard"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("_cum_end", F.sum("n_tokens").over(w))
        .withColumn("_cum_before", F.col("_cum_end") - F.col("n_tokens"))
    )
    b = F.lit(budget).cast("long")
    spans = staged.select(
        F.col("_shard").alias("shard"),
        F.col(id_col),
        "n_tokens",
        "_cum_before",
        F.explode(
            F.sequence(
                F.floor(F.col("_cum_before") / b),
                F.floor((F.col("_cum_end") - 1) / b),
            )
        ).alias("bin"),
    )
    bin_start = F.col("bin") * b
    bin_end = bin_start + b
    slice_start = F.greatest(bin_start, F.col("_cum_before"))
    slice_end = F.least(bin_end, F.col("_cum_before") + F.col("n_tokens"))
    return spans.select(
        "shard",
        F.col("bin").cast("long"),
        id_col,
        "n_tokens",
        (slice_start - F.col("_cum_before")).cast("long").alias("doc_offset"),
        (slice_end - slice_start).cast("long").alias("slice_len"),
    )


def tfidf_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
    n_docs: int | None = None,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """SPARSE hashed TF-IDF entries: one row per (id, bucket, weight) with
    colliding tokens' tf·idf mass summed — the shared upstream stage of
    ``tfidf_vectors`` (which densifies + L2-normalizes) and the
    driver-oracle query (which top-k's the raw entries).

    ``bucket_hash``: "xxhash64" (default — cheapest JVM hash) or
    "portable" (``functions.hashing.portable_bucket``, md5-based — the
    same arithmetic is expressible in DuckDB/Python, making the full
    tf·idf computation value-oracle-able). idf = ln((N+1)/(df+1)) + 1.

    Scale shape: explode → two combinable aggregations (tf, df) → one
    vocabulary join (AQE broadcasts the df table while it fits, degrades
    to a shuffle join at web-scale vocabularies — never a collect) → one
    (doc, bucket) combinable agg."""
    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    if bucket_hash not in ("xxhash64", "portable"):
        raise ValueError(
            f"bucket_hash must be 'xxhash64' or 'portable', got {bucket_hash!r}"
        )
    if n_docs is None:
        n_docs = docs.count()

    toks = docs.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok"))
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("_tf"))
    df_tbl = tf.groupBy("tok").agg(F.count("*").alias("_df"))
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("_df") + 1.0)) + 1.0
    if bucket_hash == "portable":
        from graphforge_spark.functions.hashing import portable_bucket

        bucket = portable_bucket(F.col("tok"), dim)
    else:
        bucket = F.pmod(F.xxhash64("tok"), F.lit(dim)).cast("int")
    return (
        tf.join(df_tbl, "tok")
        .select(
            F.col(id_col),
            bucket.alias("bucket"),
            (F.col("_tf") * idf).alias("weight"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.sum("weight").alias("weight"))
    )


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
    n_docs: int | None = None,
) -> DataFrame:
    """Hashing-trick TF-IDF document vectors: (id, embedding array<float>,
    L2-normalized) — the in-engine producer for the embedding operators
    (`similarity.cosine_topk` / LSH / IVF / SQ all consume this shape).

    Classic feature hashing (Weinberger et al. 2009): each token maps to
    ``xxhash64(token) mod dim``; colliding tokens SUM their tf·idf mass,
    so no vocabulary table ships to executors — the only model-sized
    state is the per-token document-frequency table, joined in (AQE
    broadcasts it while it fits; at web-scale vocabularies it degrades
    to a plain shuffle join, never a driver collect).

    idf = ln((N+1)/(df+1)) + 1 (smoothed, strictly positive); N is the
    corpus size (pass ``n_docs`` to keep the operator fully lazy,
    otherwise one count() runs). Empty documents produce the zero vector
    (norm guard: never NaN).

    Scale shape: explode → two combinable aggregations (tf, df) → one
    vocabulary join → one (doc, bucket) agg → one per-doc assembly.
    The dense fill + L2 normalization is an Arrow-batched numpy
    scatter-add (`np.add.at` over the whole batch at once — the same
    vectorized kernel link.py uses for TF-IDF scoring): the pure-column
    alternative (`transform(sequence(0,dim-1), i -> m[i])`) does
    O(dim × entries) work per row because Spark map lookup is a linear
    scan — measured 229 s → ~45 s on 200k docs × 512 dims.
    """
    weights = tfidf_weights(
        docs, id_col=id_col, text_col=text_col, dim=dim, n_docs=n_docs
    ).withColumnsRenamed({"bucket": "_b", "weight": "_w"})
    entries = weights.groupBy(id_col).agg(
        F.collect_list("_b").alias("_bs"), F.collect_list("_w").alias("_ws")
    )
    sparse = docs.select(F.col(id_col)).join(entries, id_col, "left")

    id_field = sparse.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField("embedding", T.ArrayType(T.FloatType()), False)]
    )

    def _assemble(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            n = len(pdf)
            mat = np.zeros((n, dim), dtype=np.float64)
            bs_col, ws_col = pdf["_bs"], pdf["_ws"]
            lens = np.fromiter(
                (0 if v is None else len(v) for v in bs_col), dtype=np.int64, count=n
            )
            if lens.sum() > 0:
                rows = np.repeat(np.arange(n), lens)
                cols = np.concatenate([v for v in bs_col if v is not None and len(v)])
                vals = np.concatenate([v for v in ws_col if v is not None and len(v)])
                np.add.at(mat, (rows, cols.astype(np.int64)), vals)
            norms = np.sqrt((mat * mat).sum(axis=1))
            nz = norms > 0
            mat[nz] /= norms[nz, None]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": list(mat.astype(np.float32)),
                }
            )

    return sparse.mapInPandas(_assemble, out_schema)


def temperature_fractions(
    docs: DataFrame,
    stratum_col: str,
    target_rows: int,
    alpha: float = 0.7,
) -> dict[str, float]:
    """Compute per-stratum sampling fractions for α-temperature dataset
    mixing (Conneau & Lample 2019; the multilingual-pretraining recipe):
    stratum g gets target share ∝ count(g)^α — α=1 is proportional
    (original distribution), α=0 is uniform, the usual 0.3–0.7 range
    upweights rare strata without flattening completely.

    Feeds `stratified_sample` (sampling itself stays deterministic and
    distributed); this helper's only cluster work is ONE combinable
    groupBy count — everything after runs on the strata-sized dict
    driver-side. Groups whose share exceeds their size are capped at
    fraction 1.0 (this engine samples without replacement) and their
    unmet share is re-distributed over the uncapped groups
    (water-filling), so the total expected keep approaches
    ``target_rows`` as closely as capping allows.
    """
    if target_rows <= 0:
        raise ValueError(f"target_rows must be positive, got {target_rows}")
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    counts = {
        str(r[0]): r[1]
        for r in docs.groupBy(stratum_col).agg(F.count("*").alias("n")).collect()
        if r[0] is not None
    }
    if not counts:
        return {}
    remaining_target = float(target_rows)
    open_groups = dict(counts)
    fractions: dict[str, float] = {}
    # water-filling: repeatedly allocate shares; cap full groups at 1.0
    while open_groups and remaining_target > 0:
        total_w = sum(n**alpha for n in open_groups.values())
        capped = {}
        for g, n in open_groups.items():
            desired = remaining_target * (n**alpha) / total_w
            if desired >= n:
                capped[g] = n
        if not capped:
            for g, n in open_groups.items():
                fractions[g] = remaining_target * (n**alpha) / total_w / n
            break
        for g, n in capped.items():
            fractions[g] = 1.0
            remaining_target -= n
            del open_groups[g]
    for g in counts:
        fractions.setdefault(g, 0.0)
    return fractions
