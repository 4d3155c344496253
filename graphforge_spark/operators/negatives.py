"""Filtered negative sampling for KG-embedding training sets — the
operator that turns the forged graph into (positive, negatives) training
pairs at corpus scale.

Standard recipe (Bordes et al. 2013, TransE; the "filtered" protocol of
the KG-completion literature): for every true triple, emit k corrupted
copies with the head or tail replaced by a pseudo-random entity, then
FILTER OUT corruptions that happen to be true triples (false negatives
poison the loss). Every published KG-embedding trainer (TransE/DistMult/
RotatE pipelines) consumes exactly this shape.

Scale design — everything is hash-driven, nothing is sampled statefully:
- The entity pool gets dense ids once: distinct subjects ∪ IRI objects →
  row_number over the hash-ordered pool. One sort-shuffle at pool size
  (entities ≪ triples), reused for every epoch/k.
- Corruption choices are pure column functions of (triple, i, seed):
  xxhash64 picks the side and the replacement pool slot, so the output
  is DETERMINISTIC under retries/repartition (a speculative re-execution
  produces the identical negative, the same property the stratified
  sampler guarantees) and different seeds give independent epochs.
- Replacement is an equi-join on the dense pool id (int key, shuffle
  join; broadcast when the pool fits), the filter step is one left_anti
  against the true-triple set on (subj, pred, obj).
- Self-corruptions (slot lands on the original entity) are dropped, so
  the emitted count per positive is ≤ k with equality in the common
  case; at billion-entity pools collisions are ~k/|pool| — negligible —
  and the count column tells training-loader code what it got.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_pool(triples: DataFrame, buckets: int | None = None) -> DataFrame:
    """(entity, pool_id) with dense 0..n-1 ids: distinct subjects union
    distinct IRI objects (literals are not entities — the reference's
    own typing rule, graphProcessor.js:222).

    Dense ids are assigned with the two-phase bucketed scheme, NOT a
    global-orderBy row_number (which funnels the whole pool through ONE
    task — a straggler/OOM at billion-entity pools): entities hash into
    ``buckets`` ranges, per-bucket counts (a buckets-sized driver list)
    become cumulative offsets, and ids are bucket-local row_numbers plus
    the bucket offset. Deterministic: ids follow (bucket, entity) order,
    a fixed function of the data."""
    spark = triples.sparkSession
    if buckets is None:
        buckets = max(64, 4 * spark.sparkContext.defaultParallelism)
    ents = (
        triples.select(F.col("subj").alias("entity"))
        .union(triples.filter(~F.col("obj_is_literal")).select(F.col("obj").alias("entity")))
        .distinct()
        .select("entity", F.pmod(F.xxhash64("entity"), F.lit(buckets)).alias("_bkt"))
    )
    counts = {
        r._bkt: r.n
        for r in ents.groupBy("_bkt").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in range(buckets):
        offsets[b] = acc
        acc += counts.get(b, 0)
    off_df = F.broadcast(
        spark.createDataFrame(
            [(b, offsets[b]) for b in range(buckets)], "_bkt bigint, _off long"
        )
    )
    w = Window.partitionBy("_bkt").orderBy("entity")
    return (
        ents.join(off_df, "_bkt")
        .select(
            "entity",
            (F.row_number().over(w) - 1 + F.col("_off")).alias("pool_id"),
        )
    )


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    seed: int = 42,
    corrupt: str = "both",
    pool: DataFrame | None = None,
) -> DataFrame:
    """k corrupted (filtered) negatives per true triple.

    Output: (subj, pred, obj, corrupted_side, neg_idx) — the corrupted
    triple plus which side was replaced and the 0..k-1 sample index.
    ``corrupt``: 'head', 'tail', or 'both' (hash-chosen per sample).
    Pass a precomputed ``pool`` (from `entity_pool`) to amortize the
    dense-id sort across epochs."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if corrupt not in ("head", "tail", "both"):
        raise ValueError(f"corrupt must be head/tail/both, got {corrupt!r}")
    if pool is None:
        pool = entity_pool(triples)
    pool_size = pool.count()
    if pool_size < 2:
        raise ValueError("entity pool must have at least 2 entities")

    pos = triples.select("subj", "pred", "obj", "obj_is_literal")
    expanded = pos.select(
        "*", F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("neg_idx")
    )
    h = F.xxhash64("subj", "pred", "obj", "neg_idx", F.lit(seed))
    if corrupt == "both":
        # literal tails cannot be corrupted into entities meaningfully —
        # those rows always corrupt the head
        side = F.when(
            F.col("obj_is_literal") | (F.pmod(h, F.lit(2)) == 0), F.lit("head")
        ).otherwise(F.lit("tail"))
    else:
        side = F.lit(corrupt)
        if corrupt == "tail":
            expanded = expanded.filter(~F.col("obj_is_literal"))
    slot = F.pmod(F.xxhash64("subj", "pred", "obj", "neg_idx", F.lit(seed + 1)), F.lit(pool_size))
    cand = expanded.select(
        "subj", "pred", "obj", "obj_is_literal", "neg_idx",
        side.alias("corrupted_side"), slot.alias("_slot"),
    )
    joined = cand.join(pool, cand._slot == pool.pool_id).select(
        F.when(F.col("corrupted_side") == "head", F.col("entity"))
        .otherwise(F.col("subj")).alias("n_subj"),
        F.col("pred").alias("n_pred"),
        F.when(F.col("corrupted_side") == "tail", F.col("entity"))
        .otherwise(F.col("obj")).alias("n_obj"),
        "corrupted_side", "neg_idx",
        "subj", "obj", "entity",
    )
    # drop self-corruptions (slot landed on the original entity)
    joined = joined.filter(
        F.when(F.col("corrupted_side") == "head", F.col("entity") != F.col("subj"))
        .otherwise(F.col("entity") != F.col("obj"))
    )
    # FILTERED protocol: a corruption that is itself a true triple is a
    # false negative — remove it
    truth = triples.select(
        F.col("subj").alias("n_subj"), F.col("pred").alias("n_pred"),
        F.col("obj").alias("n_obj"),
    )
    return joined.join(truth, ["n_subj", "n_pred", "n_obj"], "left_anti").select(
        F.col("n_subj").alias("subj"), F.col("n_pred").alias("pred"),
        F.col("n_obj").alias("obj"), "corrupted_side", "neg_idx",
    )
