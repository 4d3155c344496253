"""Text primitives for dedup / linking / quality scoring — all JVM-side.

Tokenize/shingle/stats are column expressions so they stay inside
whole-stage codegen; at 100 TB the tokenizer IS the hot path and must not
cross into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately tiny and hard-coded: language ID here is a
# deterministic scoring rule, not a model.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu"],
    "es": ["el", "la", "de", "que", "los", "una", "por", "con"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}


def tokens(text: Column) -> Column:
    """Whitespace/punctuation tokenizer → array<string>, lowercased."""
    return F.filter(F.split(F.lower(text), r"[^\p{L}\p{N}]+"), lambda t: t != "")


def bpe_ish_token_count(text: Column) -> Column:
    """Token-count estimate with a BPE-ish regex: words, digits runs,
    and residual punctuation each count as tokens; long words count
    ceil(len/6) to approximate subword splits."""
    words = tokens(text)
    word_tokens = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(6.0)).cast("long"),
    )
    punct = F.size(F.filter(F.split(text, ""), lambda c: c.rlike(r"[\p{P}\p{S}]")))
    return (word_tokens + punct).alias("token_count")


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (space-joined), for MinHash."""
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-grams of the lowercased text."""
    t = F.lower(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(1))),
        lambda i: t.substr(i, F.lit(n)),
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    words = LANG_STOPWORDS[lang]
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return (hits / F.greatest(F.size(toks), F.lit(1))).alias("stopword_ratio")


def quality_features(text: Column) -> list[Column]:
    """Deterministic quality-scoring features (length, word stats,
    punctuation density, uppercase ratio, stopword ratio)."""
    toks = tokens(text)
    n_chars = F.length(text)
    n_words = F.size(toks)
    mean_word_len = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
        / F.greatest(n_words, F.lit(1))
    ).cast("double")
    punct_count = F.length(F.regexp_replace(text, r"[^\p{P}\p{S}]", ""))
    return [
        n_chars.alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round((punct_count / F.greatest(n_chars, F.lit(1))).cast("double"), 4).alias(
            "punct_ratio"
        ),
        F.round(stopword_ratio(text, "en"), 4).alias("stopword_ratio"),
    ]


# Languages written without word separators: token-equality matching can
# never fire (the whole sentence is one token), so their profiles count
# CHARACTER OCCURRENCES in the raw text instead.
CHAR_LANGS = {"zh"}


def langid_scores(text: Column) -> Column:
    """Language-ID heuristic: argmax over per-language stopword hit counts.

    Space-separated languages count token matches; unspaced scripts (zh)
    count stopword-character occurrences in the text — a zh sentence is
    ONE token under the whitespace tokenizer, so token equality would
    score a constant 0 for it. Returns the winning language code; 'und'
    when no profile scores > 0. Ties break by language code order
    (deterministic)."""
    toks = tokens(text)
    low = F.lower(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)

    def _score(code: str):
        # bind via closure, not a default arg — a 2-param lambda would make
        # PySpark pass the array index as the second variable
        words = LANG_STOPWORDS[code]
        if code in CHAR_LANGS:
            n = F.lit(0)
            for w in words:
                n = n + (F.length(low) - F.length(F.replace(low, F.lit(w), F.lit(""))))
            return n
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    for code in sorted(LANG_STOPWORDS):
        score = _score(code)
        better = score > best_score
        best_lang = F.when(better, F.lit(code)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang.alias("lang_pred")


def rolling_fingerprint(text: Column, n: int = 5, keep: int = 4) -> Column:
    """Document fingerprint: the ``keep`` lexicographically smallest md5 hex
    digests of word n-gram shingles (winnowing-style min-sampling),
    concatenated. Deterministic, portable, order-insensitive."""
    sh = shingles(text, n)
    hashed = F.array_sort(F.transform(sh, lambda s: F.md5(s)))
    return F.concat_ws("", F.slice(hashed, 1, keep)).alias("fingerprint")
