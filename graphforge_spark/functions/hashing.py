"""Portable deterministic hashing primitives.

Everything here is built on md5/sha2 column expressions because those produce
byte-identical hex strings in Spark, DuckDB, and Python — which makes MinHash
signatures, LSH band buckets, and fingerprints *oracle-checkable* (the driver
compares our Spark results against DuckDB SQL) and stable across engine
versions (unlike ``F.hash``'s murmur3 seed behavior).

MinHash with k permutations is approximated the standard way: the i-th hash
function is ``md5(i || ':' || shingle)`` and the signature component is the
lexicographic MIN of those hex strings over the shingle set. min-of-md5-hex
is a uniform min-hash in the same sense as min-of-int-hash; collision
probability between two sets equals their Jaccard similarity per component.

All of this is pure column algebra — JVM-side, codegen-able, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_seeded(seed: int, value: Column) -> Column:
    """Hex digest of ``md5(seed || ':' || value)`` — the i-th hash family."""
    return F.md5(F.concat(F.lit(f"{seed}:"), value))


def md5_minhash_cols(shingle_array: Column, num_hashes: int) -> list[Column]:
    """MinHash signature as ``num_hashes`` columns over an array<string>.

    ``array_min(transform(shingles, s -> md5(i || s)))`` per component:
    entirely inside whole-stage codegen, no explode, no shuffle.

    NB: the seed must be bound via a closure factory, NOT a default-arg
    (``lambda s, i=i``) — a second parameter makes PySpark pass the array
    INDEX as ``i``, silently corrupting every signature.
    """
    def _component(i: int):
        return F.array_min(
            F.transform(shingle_array, lambda s: md5_seeded(i, s))
        ).alias(f"mh_{i}")

    return [_component(i) for i in range(num_hashes)]


# NB (r3 experiment, kept as a design note): deriving the k MinHash
# components from ONE md5 via linear re-mixes ((a_i·h+b_i) mod p) was
# value-oracle-able and no faster — shingle construction dominates, not
# the md5 calls — and it cost 7.5× blocking precision: the re-mixed
# argmins correlate through the shared h ordering, so LSH band keys
# collide together and the candidate set (= verify cost at scale) blows
# up. Components must use INDEPENDENT hash bits.


def tok_hash64(value: Column) -> Column:
    """60-bit integer hash of a string: first 15 md5 hex chars as a long
    (the construction SimHash uses for token hashes)."""
    return F.conv(F.substring(F.md5(value), 1, 15), 16, 10).cast("long")


def band_key(minhash_cols: list[Column | str], band: int, rows_per_band: int) -> Column:
    """LSH band bucket key: md5 of the concatenated band slice of the signature."""
    cols = [F.col(c) if isinstance(c, str) else c for c in minhash_cols]
    lo = band * rows_per_band
    slice_cols = cols[lo : lo + rows_per_band]
    return F.md5(F.concat_ws("|", F.lit(str(band)), *slice_cols))


def portable_bucket(value: Column, num_buckets: int) -> Column:
    """Deterministic bucket id in [0, num_buckets): first 8 md5 hex chars mod n.

    Identical arithmetic is expressible in DuckDB
    (``('0x' || substr(md5(v),1,8))::BIGINT % n`` via from_hex) and Python —
    used for salting and for partition-stable fixtures.
    """
    return (F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long") % num_buckets).cast(
        "int"
    )


def simhash64(token_array: Column) -> Column:
    """64-bit SimHash of a token array, JVM-side.

    Each token hashes to 64 bits via the first 16 hex chars of its md5;
    the fingerprint's bit b is 1 iff more tokens have bit b set than not.
    Implemented as bit algebra over an aggregate of per-bit counters using
    higher-order functions — no Python.
    """
    def tok_hash(t):
        return F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")

    # Hash each token ONCE up front (folding over raw tokens would re-run
    # the md5 inside every per-bit expression — 60× the hashing work),
    # then fold the per-bit vote counters over the hash array. Bit
    # positions are Python-level constants (shiftright needs an int, not a
    # Column), so the per-token bit vector is a literal-indexed array.
    hashes = F.transform(token_array, tok_hash)
    counters = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 60),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.shiftright(h, b).bitwiseAND(F.lit(1).cast("long"))
                    for b in range(60)
                ]
            ),
            lambda a, bit: a + bit,
        ),
    )
    n = F.size(token_array)
    fp = F.lit(0).cast("long")
    for b in range(60):
        fp = fp.bitwiseOR(
            F.when(counters[b] * 2 > n, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return fp


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def exact_text_key(text: Column) -> Column:
    """THE exact-duplicate key: md5 of lowercased+trimmed text. One
    definition shared by batch dedup (docops.exact_dedup_groups,
    docops.neardup_keep_list) and streaming dedup (streaming/dedup) so
    the two paths can never silently disagree on what 'exact duplicate'
    means."""
    return F.md5(F.lower(F.trim(text)))


def best_copy_key(df, priority_col: str, id_col: str) -> Column:
    """THE duplicate-cluster winner key, shared by every best-copy
    selection (docops.neardup_keep_list, curation.curate's exact dedup):
    ``min(best_copy_key)`` picks the HIGHEST priority, ties broken on
    MIN id. Requirements enforced loudly: the priority column must be
    numeric (cast timestamps to epoch seconds first — unary negation is
    how "highest wins" rides a single min()), and NULL priorities LOSE
    to every real value (coalesced to -inf) instead of accidentally
    winning (min(struct) sorts NULL first).
    """
    from pyspark.sql import types as _T

    ptype = df.schema[priority_col].dataType
    if not isinstance(ptype, _T.NumericType):
        raise ValueError(
            f"priority column {priority_col!r} must be numeric, got "
            f"{ptype.simpleString()} (cast timestamps to epoch first)"
        )
    prio = F.coalesce(F.col(priority_col).cast("double"), F.lit(float("-inf")))
    return F.struct((-prio).alias("_np"), F.col(id_col).alias("_id"))
