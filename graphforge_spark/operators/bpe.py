"""Trainable byte-pair encoding — vocabulary induction from the corpus
and distributed tokenization, the canonical subword pipeline step
(Sennrich et al. 2016) that `pack_sequences` and token-budget gates sit
downstream of.

Faithful split of work between cluster and driver:
- BPE training consumes a WORD→COUNT dictionary, not raw text — that is
  the published algorithm's actual input. The dictionary is computed
  distributed (one explode + one combinable groupBy over the whole
  corpus), then truncated to the ``max_words`` most frequent forms
  (deterministic tie-break) before the driver-side merge loop. Zipfian
  truncation is the standard practice: the tail's pair counts are noise
  at vocabulary scale, and the driver holds a bounded dict regardless of
  corpus size.
- The merge LOOP is inherently sequential (merge i+1's counts depend on
  merge i) — no engine parallelizes it; it runs on the model-sized dict
  in pure Python, deterministically (count desc, pair lex asc).
- APPLICATION is the scale path and is fully distributed: the ranked
  merge table broadcasts (it IS the model, vocab-sized), and an
  Arrow-batched `mapInPandas` tokenizes with a bounded per-task word
  memo — each distinct word is segmented once regardless of its
  frequency, which on Zipfian text does ~1% of the naive per-token work.

End-of-word marker: ``</w>`` appended to each word's final symbol, the
original formulation — tokenization round-trips exactly (strip markers,
join, split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from graphforge_spark.functions.text import tokens

EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — one explode + one combinable agg."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    stats: dict[tuple[str, str], int] = {}
    for symbols, n in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + n
    return stats


def _merge_vocab(vocab, pair):
    a, b = pair
    merged = a + b
    out = {}
    for symbols, n in vocab.items():
        syms, i = [], 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == a and symbols[i + 1] == b:
                syms.append(merged)
                i += 2
            else:
                syms.append(symbols[i])
                i += 1
        out[tuple(syms)] = out.get(tuple(syms), 0) + n
    return out


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    max_words: int = 65536,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the ranked
    merge list (rank = list position), the model `bpe_tokenize` applies.

    Deterministic: the word table truncates by (count desc, word asc)
    and each round merges the (count desc, pair asc) best pair; ties
    can never depend on partitioning."""
    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")
    rows = (
        word_counts(docs, text_col)
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {}
    for r in rows:
        key = tuple(list(r.word[:-1]) + [r.word[-1] + EOW])
        vocab[key] = vocab.get(key, 0) + r.n
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        stats = _pair_stats(vocab)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        vocab = _merge_vocab(vocab, best)
    return merges


def _segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, best-rank-first (the standard greedy)."""
    if not word:
        return []
    syms = list(word[:-1]) + [word[-1] + EOW]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) — distributed apply
    of the learned merges. The merge table rides the closure (broadcast
    by Spark with the task binary — it is vocab-sized); a BOUNDED
    per-task word memo keeps the Python work proportional to DISTINCT
    words, not tokens, while capping Python-heap growth on partitions
    with unbounded word cardinality (the memo resets at 1M entries — a
    few hundred MB worst case, never more)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    id_field = docs.schema[id_col]
    out_schema = T.StructType(
        [
            id_field,
            T.StructField("bpe_tokens", T.ArrayType(T.StringType()), False),
            T.StructField("n_bpe_tokens", T.IntegerType(), False),
        ]
    )
    words_df = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("_words"))

    def _apply(batches):
        import pandas as pd

        memo: dict[str, list[str]] = {}

        def seg(w):
            got = memo.get(w)
            if got is None:
                if len(memo) >= 1_000_000:
                    memo.clear()
                got = memo[w] = _segment(w, ranks)
            return got

        for pdf in batches:
            toks_col = [
                [t for w in (ws if ws is not None else []) for t in seg(w)]
                for ws in pdf["_words"]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "bpe_tokens": toks_col,
                    "n_bpe_tokens": [len(t) for t in toks_col],
                }
            )

    return words_df.mapInPandas(_apply, out_schema)


def detokenize(bpe_tokens: list[str]) -> str:
    """Inverse of the segmentation: join symbols, split on the
    end-of-word marker (exact round-trip of the normalized text)."""
    return "".join(bpe_tokens).replace(EOW, " ").strip()
