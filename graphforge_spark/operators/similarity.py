"""Similarity search over an embedding column (array<float>).

Three paths:
- ``cosine_topk``: brute-force cosine top-k — the exact baseline. The
  query set is broadcast (it is small by construction); similarity is a
  sequential double-precision fold (F.aggregate) so results are
  bit-reproducible across engines (the DuckDB oracle uses list_reduce,
  the same left fold). Ranking ties break on neighbor id.
- ``lsh_bucketed_topk``: a scale path — MULTI-TABLE random-hyperplane
  LSH (L independent plane sets) buckets candidates first, so each query
  only scores vectors sharing any table's bucket. Hyperplanes are
  deterministic (seeded md5 bit stream), making the operator reproducible
  run-to-run AND value-oracle-able (the DuckDB oracle inlines the planes
  as literals); at 1000 executors the bucket join is a shuffle on a short
  (table, bucket) key instead of a broadcast nested loop.
- ``ivf_topk``: the data-adaptive scale path — an IVF (inverted-file)
  index: spherical k-means coarse quantizer (``ivf_train``), corpus
  partitioned by nearest-centroid cell, queries probe their ``nprobe``
  nearest cells and score only those cells' vectors exactly. Unlike LSH
  (data-oblivious planes), the cells follow the corpus distribution —
  on real clustered embeddings the same candidate volume buys far more
  recall. Assignment is an Arrow-batched matmul (the one numeric kernel
  built-ins can't express at useful k); everything else is JVM algebra.
- ``cosine_neardup_pairs`` / ``cosine_neardup_lsh_pairs``: exact O(n²)
  near-dup baseline and its LSH-blocked scale variant (exact verify on
  candidates — precision 1.0, recall measured in tests/test_recall.py).
- ``sq_topk``: the memory/IO scale path — int8 SCALAR QUANTIZATION of
  the corpus (``sq_train`` + ``sq_quantize``: per-dimension linear
  [lo,hi] → -128..127) with approximate scoring on the dequantized int8
  vectors and EXACT re-scoring of the top ``rescore``×k candidates.
  At 100 TB the approximate pass reads only the int8 column (4× less
  scan IO than float32), and float vectors are fetched for candidate
  rows alone; with ``rescore``×k ≥ corpus size the result is exactly
  ``cosine_topk`` (pinned in tests).

Outside the assignment kernel, all arithmetic is JVM-side column algebra
(zip_with / aggregate); no per-row Python. At 100 TB the vectors stay
columnar in parquet; the fold runs inside whole-stage codegen.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphforge_spark.corpus import spread_small_scan


def _dot(a, b):
    """Sequential left-fold dot product in double precision: matches
    DuckDB's list_reduce over the same float32 inputs bit-for-bit."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (id_col, vec_col) — small, broadcast. Self-matches (same
    id) are excluded. Output: (query_id, neighbor_id, sim, rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    n = spread_small_scan(vectors).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    scored = (
        n.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from an md5 bit stream (no RNG state,
    portable across engines/runs)."""
    planes = []
    for p in range(n_planes):
        bits: list[float] = []
        ctr = 0
        while len(bits) < dim:
            h = hashlib.md5(f"{seed}:{p}:{ctr}".encode()).digest()
            for byte in h:
                for i in range(8):
                    bits.append(1.0 if (byte >> i) & 1 else -1.0)
            ctr += 1
        planes.append(bits[:dim])
    return planes


def lsh_bucket(vec_col, dim: int, n_planes: int = 8, seed: int = 42):
    """Sign-of-projection LSH bucket id (0 .. 2^n_planes-1) as a column."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(v) for v in plane])
        proj = _dot(vec_col, lit_plane)
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def cosine_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_ids: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a < id_b, sim ≥ threshold).

    Exact O(n²/2) variant — correct baseline and the oracle-checkable one;
    at corpus scale use ``lsh_bucket`` to block first (same scoring column,
    bucket-equality join instead of the triangular cross join). ``max_ids``
    bounds the id range for the exact pass."""
    v = spread_small_scan(vectors).select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if max_ids is not None:
        v = v.filter(F.col("_id") < max_ids)
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("_va"), F.col("_vb")).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def cosine_neardup_lsh_pairs(
    vectors: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup at scale: multi-table hyperplane-LSH blocking
    (pairs sharing ANY table's bucket, id_a < id_b) followed by exact
    cosine verification of the candidates — the standard two-phase
    near-dup design, same output contract as the exact
    ``cosine_neardup_pairs`` minus the pairs LSH misses. Shuffle key is
    (table, bucket); the O(n²) cross product never materializes."""

    def with_buckets(df, out_id: str, v_alias: str):
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(v_alias),
            F.posexplode(
                F.array(
                    *[
                        lsh_bucket(F.col(vec_col), dim, n_planes, seed + t)
                        for t in range(n_tables)
                    ]
                )
            ).alias("_tbl", "_bucket"),
        )

    vectors = spread_small_scan(vectors)
    a = with_buckets(vectors, "id_a", "_va")
    b = with_buckets(vectors, "id_b", "_vb")
    cands = (
        a.join(b, ["_tbl", "_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cands.select(
            "id_a", "id_b", cosine_similarity(F.col("_va"), F.col("_vb")).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )


def lsh_bucketed_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_planes: int = 6,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: bool = False,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE hyperplane LSH — the standard
    recall lever: ``n_tables`` independent tables of ``n_planes`` planes
    (seeds ``seed..seed+L-1``); a vector is a candidate iff it shares ANY
    table's bucket with the query. Per-pair collision probability rises
    from p^k (single table) to 1-(1-p^k)^L, with p = 1-θ/π per plane.
    Candidates dedup on (query, neighbor) BEFORE scoring, so each pair's
    cosine is computed once regardless of how many tables matched.

    ``multiprobe=True`` additionally probes, per table, every bucket at
    hamming distance 1 from the query's bucket (flip one plane's sign
    bit) — the near-miss buckets a near-neighbor most likely fell into.
    Probing happens on the QUERY side only (the small broadcast side), so
    the vector table is still bucketed exactly once: candidate volume
    rises ≈ (1 + n_planes)×/table, recall rises like adding tables
    without re-hashing the corpus — the right knob at 100 TB, where the
    corpus-side explode dominates cost.

    Measured on the sf0.001 embeddings (tests/test_recall.py, COVERAGE.md
    tuning table): recall@3 = 0.167 with one 4-plane table → 0.5 with 4
    tables → ≥0.8 with 4 tables + multiprobe. Scale shape: shuffle key =
    (table, bucket); candidate volume ≈ L × per-table bucket load,
    tunable against recall per corpus."""

    def with_buckets(df, out_id: str, v_alias: str, probe: bool):
        pairs = []
        for t in range(n_tables):
            base = lsh_bucket(F.col(vec_col), dim, n_planes, seed + t)
            probes = [base]
            if probe:
                probes += [
                    base.bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
                ]
            pairs += [
                F.struct(F.lit(t).alias("_tbl"), b.alias("_bucket"))
                for b in probes
            ]
        return df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias(v_alias),
            F.explode(F.array(*pairs)).alias("_pb"),
        ).select(
            out_id, v_alias, F.col("_pb._tbl").alias("_tbl"), F.col("_pb._bucket").alias("_bucket")
        )

    bq = with_buckets(queries, "query_id", "_qv", multiprobe)
    bn = with_buckets(spread_small_scan(vectors), "neighbor_id", "_nv", False)
    cands = (
        bn.join(F.broadcast(bq), ["_tbl", "_bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("_qv"), F.col("_nv")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) index — data-adaptive ANN scale path
# ---------------------------------------------------------------------------

def _assign_udf(centroids):
    """Arrow-batched nearest-centroid assignment: one numpy matmul per
    batch (B×dim @ dim×k), argmax of cosine against the UNIT-normalized
    centroid matrix. The k×dim centroid matrix rides the UDF closure —
    the same bounded-broadcast shape as a dim table (k ≪ n by
    construction). This is the one kernel where built-in column algebra
    degenerates (k fold-dots per row explodes codegen at useful k);
    everything around it stays JVM-side."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def assign(vecs):
        import pandas as pd

        m = np.vstack(vecs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype("int32"))

    return assign


def _probe_udf(centroids, nprobe: int):
    """Top-``nprobe`` nearest cells per query vector (query side only —
    the corpus is assigned to exactly one cell)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    c = np.asarray(centroids, dtype=np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    p = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def probe(vecs):
        import pandas as pd

        m = np.vstack(vecs.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        # argsort descending, first nprobe cells, deterministic tie-break
        # on cell id via stable sort of (-sim, cell)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :p]
        return pd.Series([row.astype("int32").tolist() for row in order])

    return probe


def ivf_train(
    vectors: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer for the IVF index.

    Deterministic seeding: the ``n_centroids`` vectors with the smallest
    md5(seed:id) hash (a distributed order-by-limit, no RNG state). Each
    Lloyd iteration is two distributed passes: an Arrow-batched
    assignment, then a per-cell element-wise mean via posexplode →
    groupBy(cell, pos) — partial (map-side) aggregation means the shuffle
    carries only tasks × k × dim partial sums, not n × dim rows. The
    returned k×dim matrix is driver-resident by design (it IS the
    index's broadcast side).

    Empty cells keep their previous centroid (standard Lloyd fallback),
    so the cell count never silently shrinks."""
    v = vectors.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    init_rows = (
        v.withColumn(
            "_h", F.md5(F.concat(F.lit(f"{seed}:"), F.col("_id").cast("string")))
        )
        .orderBy("_h")
        .limit(n_centroids)
        .select("_v")
        .collect()
    )
    centroids = [list(map(float, r._v)) for r in init_rows]
    if len(centroids) < n_centroids:
        raise ValueError(
            f"ivf_train: corpus has only {len(centroids)} vectors "
            f"for {n_centroids} centroids"
        )
    dim = len(centroids[0])
    for _ in range(iters):
        assign = _assign_udf(centroids)
        assigned = v.select(assign(F.col("_v")).alias("_cell"), F.col("_v"))
        sums = (
            assigned.select("_cell", F.posexplode("_v").alias("_pos", "_x"))
            .groupBy("_cell", "_pos")
            .agg(F.sum(F.col("_x").cast("double")).alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        new = [list(row) for row in centroids]
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r._cell, [0.0] * dim)[r._pos] = r._s
            cnt[r._cell] = r._n
        for cell, vec_sum in acc.items():
            n = cnt[cell]
            if n:
                new[cell] = [x / n for x in vec_sum]
        centroids = new
    return centroids


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus partitioned into
    ``n_centroids`` nearest-centroid cells (one cell per vector — the
    corpus-side cost is a single assignment pass, vs the LSH path's
    L-way explode), queries probe their ``nprobe`` nearest cells, and
    only those cells' vectors are scored exactly. Output contract
    matches ``cosine_topk``: (query_id, neighbor_id, sim, rank).

    Scale shape: the join key is the cell id, the query side is
    broadcast, and candidate volume ≈ nprobe/k of the corpus per query —
    the recall/cost knob pair is (n_centroids, nprobe). Train once with
    ``ivf_train`` and pass ``centroids`` to amortize the quantizer
    across query batches (the index is the centroid matrix plus the
    assigned corpus — persist both in a real pipeline)."""
    if centroids is None:
        centroids = ivf_train(
            vectors, n_centroids, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    assign = _assign_udf(centroids)
    probe = _probe_udf(centroids, nprobe)
    n = spread_small_scan(vectors).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_nv"),
        assign(F.col(vec_col)).alias("_cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probe(F.col(vec_col))).alias("_cell"),
    )
    scored = (
        n.join(F.broadcast(q), "_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_nv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# Scalar quantization (int8) — memory/IO scale path with exact re-scoring
# ---------------------------------------------------------------------------

def sq_train(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Per-dimension linear int8 quantizer parameters: ``lo[i]`` and
    ``step[i] = (hi[i]-lo[i])/255`` over the corpus — ONE distributed
    pass (posexplode → groupBy(dim) min/max, map-side combined, so the
    shuffle carries tasks × dim partial rows whatever the corpus size).
    The returned dict is driver-resident by design: 2×dim floats IS the
    index metadata, the broadcast side of every later scoring pass (the
    same shape as the IVF centroid matrix). A constant dimension
    (hi == lo) gets step 1.0 so dequantization returns lo exactly."""
    rows = (
        vectors.select(F.posexplode(F.col(vec_col)).alias("_pos", "_x"))
        .groupBy("_pos")
        .agg(
            F.min(F.col("_x").cast("double")).alias("_lo"),
            F.max(F.col("_x").cast("double")).alias("_hi"),
        )
        .collect()
    )
    dim = len(rows)
    lo = [0.0] * dim
    step = [1.0] * dim
    for r in rows:
        lo[r._pos] = r._lo
        step[r._pos] = ((r._hi - r._lo) / 255.0) or 1.0
    return {"lo": lo, "step": step}


def _sq_arrays(params: dict):
    lo = F.array(*[F.lit(float(x)) for x in params["lo"]])
    step = F.array(*[F.lit(float(x)) for x in params["step"]])
    return lo, step


def sq_quantize(
    vectors: DataFrame,
    params: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "qvec",
) -> DataFrame:
    """Quantize the vector column to ``array<tinyint>`` (-128..127):
    ``round((x - lo[i]) / step[i]) - 128``, clamped. Pure JVM column
    algebra (transform with index); the output column is what a real
    pipeline PERSISTS — 1 byte/dim vs 4 for float32 — so every
    approximate scan afterwards reads a quarter of the bytes."""
    lo, step = _sq_arrays(params)
    q = F.transform(
        F.col(vec_col),
        lambda x, i: F.greatest(
            F.lit(-128),
            F.least(
                F.lit(127),
                (
                    F.round(
                        (x.cast("double") - F.element_at(lo, i + 1))
                        / F.element_at(step, i + 1)
                    ).cast("int")
                    - F.lit(128)
                ),
            ),
        ).cast("tinyint"),
    )
    return vectors.select(F.col(id_col), q.alias(out_col))


def sq_dequantize_col(qvec_col, params: dict):
    """Dequantized double array for an int8-quantized column:
    ``lo[i] + (q+128) * step[i]`` — reconstruction error ≤ step/2 per
    dimension by construction."""
    lo, step = _sq_arrays(params)
    return F.transform(
        qvec_col,
        lambda x, i: F.element_at(lo, i + 1)
        + (x.cast("double") + F.lit(128.0)) * F.element_at(step, i + 1),
    )


def sq_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    rescore: int = 4,
    params: dict | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k with int8-quantized first pass and EXACT
    re-scoring: score every corpus vector from its dequantized int8
    form against the (small, broadcast, full-precision) query side,
    keep the top ``rescore``×k per query, fetch the float vectors for
    those candidates only, re-score exactly, return the top k. Output
    contract matches ``cosine_topk``: (query_id, neighbor_id, sim,
    rank) with ``sim`` EXACT (re-scored) — an sq miss can only omit a
    neighbor, never corrupt a similarity.

    Scale shape: the first pass is a scan of the 1-byte/dim quantized
    column (persist ``sq_quantize``'s output next to the float table;
    4× less IO than float32), one broadcast, one window; the exact pass
    touches |Q|×rescore×k rows. ``rescore`` is the recall/cost knob —
    with rescore×k ≥ corpus size the result equals ``cosine_topk``
    exactly (pinned in tests); recall at the default is measured in
    tests/test_recall.py."""
    if params is None:
        params = sq_train(vectors, id_col, vec_col)
    qcorp = sq_quantize(spread_small_scan(vectors), params, id_col, vec_col)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    approx = (
        qcorp.select(
            F.col(id_col).alias("neighbor_id"),
            sq_dequantize_col(F.col("qvec"), params).alias("_dq"),
        )
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_dq")).alias("_asim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_asim"), F.asc("neighbor_id"))
    cands = (
        approx.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k * rescore)
        .select("query_id", "neighbor_id")
    )
    exact = (
        cands.join(
            vectors.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("_qv"), F.col("_nv")).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic deduplication over embeddings (Abbas et al. 2023)
# ---------------------------------------------------------------------------

def _cell_edges(
    assigned: DataFrame, threshold: float, max_cell: int, block: int = 1024
) -> DataFrame:
    """(src, dst) pairs with exact cosine ≥ threshold, compared only
    WITHIN each ``_cell`` group of ``assigned`` (_id, _v, _cell).

    One ``applyInPandas`` per cell: normalize the cell's vectors once,
    then blockwise upper-triangle matmul (``block`` rows at a time
    against the whole cell — peak extra memory block×cell_size floats).
    Zero-norm vectors have cosine 0 to everything (matches
    ``cosine_similarity``'s NULL-safe semantics of never clearing a
    positive threshold). Groups larger than ``max_cell`` emit no pairs
    — the same degenerate-hot-bucket size cap ``bucket_pairs`` applies;
    callers count drops via a groupBy(cell) count when they need the
    metric. ``src < dst`` lexicographically, matching the LSH paths."""
    import numpy as np
    import pandas as pd

    thr = float(threshold)
    cap = int(max_cell)
    blk = int(block)

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2 or n > cap:
            return pd.DataFrame({"src": pd.Series(dtype=object),
                                 "dst": pd.Series(dtype=object)})
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids)  # lexicographic: row i < row j => id_i < id_j
        ids = ids[order]
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])
        mat = mat[order]
        norms = np.linalg.norm(mat, axis=1)
        safe = np.where(norms == 0.0, 1.0, norms)
        unit = mat / safe[:, None]
        unit[norms == 0.0] = 0.0  # zero vectors match nothing
        src_parts, dst_parts = [], []
        for lo in range(0, n - 1, blk):
            hi = min(lo + blk, n - 1)
            sims = unit[lo:hi] @ unit.T  # (hi-lo) × n
            rows, cols = np.nonzero(sims >= thr)
            keep_ut = cols > (rows + lo)  # strict upper triangle
            src_parts.append(ids[rows[keep_ut] + lo])
            dst_parts.append(ids[cols[keep_ut]])
        if not src_parts:
            return pd.DataFrame({"src": pd.Series(dtype=object),
                                 "dst": pd.Series(dtype=object)})
        # the declared edge schema is (src string, dst string) — Arrow
        # refuses to coerce int64 ids implicitly, so stringify here
        # (no-op for string ids; edge direction is irrelevant downstream
        # because canonical_mapping symmetrizes)
        return pd.DataFrame({
            "src": pd.Series(np.concatenate(src_parts)).astype(str),
            "dst": pd.Series(np.concatenate(dst_parts)).astype(str),
        })

    return (
        assigned.select("_id", "_v", "_cell")
        .groupBy("_cell")
        .applyInPandas(_pairs, "src string, dst string")
    )


def semdedup_keep_list(
    vectors: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 16,
    iters: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cell: int = 10_000,
    keep: str = "far",
) -> DataFrame:
    """Semantic dedup DECISION over an embedding corpus:
    (id, rep_id, keep, centroid_sim) — the SemDeDup recipe
    (Abbas et al. 2023, arXiv:2303.09540).

    Cluster the corpus with the IVF spherical k-means quantizer
    (``ivf_train`` — deterministic seeding, so the whole operator is
    reproducible), compare embeddings only WITHIN each cell, connect
    pairs whose cosine clears ``threshold``, and keep one representative
    per connected duplicate group: the member FARTHEST from its cell
    centroid (``keep="far"``, the paper's choice — it preserves the
    cluster's outer "diverse" shell and prunes the redundant core) or
    nearest (``keep="near"``); ties break on min id. Docs in no group
    keep themselves.

    Like the paper, duplicate comparison is blocked by the cell
    partition (a cross-cell near-duplicate pair is invisible —
    that is the method's recall/cost trade, measured in
    tests/test_recall.py for the LSH analogs), and like
    ``docops.neardup_keep_list`` the pairwise relation is closed
    transitively by connected components.

    Scale shape: ONE assignment pass (Arrow matmul) + ONE
    groupBy(cell) Arrow matmul per cell that emits only the ≥threshold
    edges — the candidate-pair table (≈cell_size²/2 rows per cell) is
    never materialized or shuffled, and peak group memory is
    block×cell_size floats, not cell_size². Cells above ``max_cell``
    emit no pairs (the degenerate-hot-cell guard, same size-cap policy
    as ``bucket_pairs``; count drops via groupBy(cell) when you need
    the metric — at 10⁹ docs you raise ``n_centroids`` so cells stay
    ~n/k, exactly the paper's k≈√n guidance) + the log-round CC + one
    combinable winner agg.
    """
    if keep not in ("far", "near"):
        raise ValueError(f"semdedup_keep_list: keep must be 'far' or 'near', got {keep!r}")
    if centroids is None:
        centroids = ivf_train(
            vectors, n_centroids, iters=iters, seed=seed,
            id_col=id_col, vec_col=vec_col,
        )
    from graphforge_spark.operators.canonicalize import canonical_mapping

    spark = vectors.sparkSession
    assign = _assign_udf(centroids)
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "_cell int, _cvec array<double>",
    )
    assigned = (
        spread_small_scan(vectors)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .withColumn("_cell", assign(F.col("_v")))
        .join(F.broadcast(cdf), "_cell")
        .select(
            "_id", "_v", "_cell",
            cosine_similarity(F.col("_v"), F.col("_cvec")).alias("centroid_sim"),
        )
    )
    # Within-cell exact-cosine edges via ONE grouped Arrow matmul per
    # cell (the paper's within-cluster pairwise similarity), emitting
    # only pairs at/above threshold — precision 1.0 by construction.
    # This deliberately does NOT materialize the candidate-pair table:
    # a 1k-member cell holds ~500k candidate pairs, and joining
    # embeddings onto a pair table that size × cells means two
    # corpus-dwarfing shuffles. The matmul touches each cell's vectors
    # once and its output is only the true near-duplicate edges.
    # Memory is bounded: the similarity block is ``block × cell_size``
    # (≤1024×max_cell floats), never cell_size². Cells above
    # ``max_cell`` are dropped inside the group fn (the degenerate-
    # hot-cell guard, same size-cap policy as ``docops.bucket_pairs``).
    edges = _cell_edges(assigned, threshold=threshold, max_cell=max_cell)
    mapping = canonical_mapping(edges)
    # the edge kernel (and so the CC labels) work on STRING ids; cast the
    # canonical label back to the caller's id type explicitly so rep_id
    # always has the same type as id_col (for numeric ids the component
    # representative is the lexicographic-min member — '10' < '2' —
    # reinterpreted as a number; deterministic either way)
    id_type = assigned.schema["_id"].dataType
    out = assigned.join(mapping, assigned._id == mapping.alias_id, "left").select(
        F.col("_id"),
        F.coalesce(F.col("canonical_id").cast(id_type), F.col("_id")).alias("rep_id"),
        "centroid_sim",
    )
    # winner per duplicate group: min (signed centroid_sim, id) struct —
    # one combinable agg, deterministic
    sim_key = F.col("centroid_sim") if keep == "far" else -F.col("centroid_sim")
    winner = (
        out.groupBy("rep_id")
        .agg(F.min(F.struct(sim_key.alias("_s"), F.col("_id").alias("_i"))).alias("_w"))
        .select("rep_id", F.col("_w._i").alias("_keep_id"))
    )
    return out.join(winner, "rep_id").select(
        F.col("_id").alias(id_col),
        "rep_id",
        (F.col("_id") == F.col("_keep_id")).alias("keep"),
        "centroid_sim",
    )
