"""Graph analytics over the forged triples — the quality dashboard a KG
pipeline publishes next to its node/edge tables (§2C addition; the
reference renders result tables/plots, docs/scripts/queryManager.js, but
computes no graph statistics).

- ``degree_stats``: per-node in/out degree plus distinct predicate
  fan-out — one groupBy each side, one outer merge; the shape every
  hot-entity/skew investigation starts from (canonicalization's salting
  decisions are driven by exactly this table).
- ``pagerank``: power iteration over the edge DataFrame with dangling-
  mass redistribution — the standard importance score for entity
  ranking. Each round is one join + one aggregation keyed on dst,
  lineage cut per round (localCheckpoint via the closure module's
  helper); round count is the cluster cost model, and the tolerance
  check adds one tiny aggregate per round. Edge weights are uniform
  1/outdeg (the RDF default).

- ``shortest_paths``: multi-source BFS distances (delta iteration —
  see its docstring).
- ``triangle_count``: per-node + global triangle counts over the
  undirected simple graph, via DEGREE-ORDERED edge orientation
  (node-iterator++): every triangle is counted at exactly one node —
  the one whose two triangle edges both point "up" the (degree, id)
  total order — which bounds wedge generation by Σ min-degree per edge
  instead of Σ degree², the difference between feasible and O(d_max²)
  on a skewed KG.
- ``k_core``: iterative peeling to the maximal subgraph of minimum
  degree k — the standard web-graph spam/quality cut. Round count =
  peeling depth; loud error at the cap.

All column algebra; no Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphforge_spark.operators.closure import _ckpt


def degree_stats(
    triples: DataFrame,
    subj_col: str = "subj",
    obj_col: str = "obj",
    pred_col: str = "pred",
    iri_only: bool = True,
) -> DataFrame:
    """Per-node degree table: (node, out_degree, in_degree, out_preds,
    in_preds). ``iri_only`` skips literal objects on the in-side (the
    engine's startsWith-'http' discriminator via the obj_is_literal
    column when present, else the prefix test)."""
    edges = triples
    if iri_only:
        flag = (
            F.col("obj_is_literal")
            if "obj_is_literal" in triples.columns
            else ~F.col(obj_col).startswith("http")
        )
        edges = triples.filter(~flag)
    out = edges.groupBy(F.col(subj_col).alias("node")).agg(
        F.count("*").alias("out_degree"),
        F.count_distinct(pred_col).alias("out_preds"),
    )
    inn = edges.groupBy(F.col(obj_col).alias("node")).agg(
        F.count("*").alias("in_degree"),
        F.count_distinct(pred_col).alias("in_preds"),
    )
    return (
        out.join(inn, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_preds", F.lit(0)).alias("out_preds"),
            F.coalesce("in_preds", F.lit(0)).alias("in_preds"),
        )
    )


def shortest_paths(
    edges: DataFrame,
    landmarks: list[str],
    max_iterations: int = 64,
    src_col: str = "s",
    dst_col: str = "o",
) -> DataFrame:
    """Unweighted shortest-path distances TO each landmark →
    (node, landmark, dist) — GraphFrames-compatible semantics: ``dist``
    is the length of the shortest DIRECTED path from ``node`` to
    ``landmark``; unreachable pairs emit no row; every landmark carries
    its own (landmark, landmark, 0) row.

    Delta-iteration BFS over the reversed edge set: the frontier holds
    only pairs discovered THIS round (first arrival is minimal in an
    unweighted graph, so a left_anti against the settled set is the
    whole min-combine), each round is one shuffle join + one dedup
    exchange, lineage cut per round (the closure discipline). Round
    count = graph eccentricity, the right cluster cost model; a frontier
    still live after ``max_iterations`` raises rather than returning
    silently-truncated distances."""
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(edges.sparkSession):
        return _shortest_paths_impl(
            edges, landmarks, max_iterations, src_col, dst_col
        )


def _shortest_paths_impl(
    edges: DataFrame,
    landmarks: list[str],
    max_iterations: int,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    if not landmarks:
        raise ValueError("shortest_paths needs at least one landmark")
    spark = edges.sparkSession
    # reversed edges: BFS expands from the landmark along in-edges
    rev = edges.select(
        F.col(dst_col).alias("_from"), F.col(src_col).alias("_to")
    ).distinct()
    dist = _ckpt(
        spark.createDataFrame(
            [(l, l, 0) for l in sorted(set(landmarks))],
            "node string, landmark string, dist int",
        )
    )
    frontier = dist
    for _ in range(max_iterations):
        cand = (
            frontier.join(rev, frontier["node"] == rev["_from"])
            .select(
                F.col("_to").alias("node"),
                "landmark",
                (F.col("dist") + 1).alias("dist"),
            )
            .dropDuplicates(["node", "landmark"])
        )
        frontier = _ckpt(cand.join(dist, ["node", "landmark"], "left_anti"))
        if frontier.limit(1).count() == 0:
            return dist
        dist = _ckpt(dist.unionByName(frontier))
    # reachable only when the final round's frontier was non-empty (an
    # empty frontier returns inside the loop)
    raise ValueError(
        f"shortest_paths: frontier still live after {max_iterations} "
        "rounds — raise max_iterations (needs ≥ graph eccentricity)"
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 20,
    tol: float | None = 1e-6,
    src_col: str = "s",
    dst_col: str = "o",
) -> DataFrame:
    """PageRank over (src, dst) edges → (node, rank), Σrank = 1.

    Power iteration with the full treatment a correct distributed
    implementation needs:

    - parallel edges collapse (set semantics, matching the quad store);
    - per-round contribution = rank/outdeg, one shuffle keyed on dst
      (map-side combinable SUM);
    - DANGLING nodes (no out-edges) redistribute their mass uniformly —
      one scalar aggregate per round, broadcast back as a literal; this
      is what keeps Σrank = 1 exactly instead of leaking mass;
    - teleport (1-damping)/N;
    - early stop when the L1 delta falls under ``tol`` (one tiny
      aggregate per round — skip by passing ``tol=None``);
    - per-round ``localCheckpoint`` so lineage stays O(1) deep, the same
      iterative-Spark discipline as the closure fixpoint.

    Round count is the cluster cost model: each round is exactly one
    shuffle over the edge set plus two scalar aggregates."""
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(edges.sparkSession):
        return _pagerank_impl(edges, damping, max_iterations, tol, src_col, dst_col)


def _pagerank_impl(
    edges: DataFrame,
    damping: float,
    max_iterations: int,
    tol: float | None,
    src_col: str,
    dst_col: str,
) -> DataFrame:
    e = edges.select(F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")).distinct()
    nodes = _ckpt(
        e.select(F.col("_s").alias("node"))
        .union(e.select(F.col("_d").alias("node")))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    ranks = _ckpt(nodes.select("node", F.lit(1.0 / n).alias("rank")))

    for _ in range(max_iterations):
        contrib = (
            ranks.join(outdeg, ranks["node"] == outdeg["_s"], "inner")
            .join(e, "_s")
            .select(F.col("_d").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # dangling mass: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(outdeg, ranks["node"] == outdeg["_s"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new = _ckpt(
            nodes.join(contrib, "node", "left").select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce(F.col("_in"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if tol is not None:
            delta = (
                new.alias("n")
                .join(ranks.alias("o"), "node")
                .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
                .collect()[0][0]
            )
            ranks = new
            if delta < tol:
                break
        else:
            ranks = new
    return ranks


def _undirected_simple(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Canonical undirected simple graph: drop self-loops, orient each
    edge (min, max) lexically, dedup — set semantics like the store."""
    s, d = F.col(src_col), F.col(dst_col)
    return (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src_col: str = "s", dst_col: str = "o"
) -> DataFrame:
    """Per-node triangle participation over the UNDIRECTED simple graph
    induced by the edge set → (node, triangles); nodes in no triangle
    emit no row (left-join against degree_stats for the dashboard).

    Degree-ordered orientation (node-iterator++): each undirected edge
    points from its lower (degree, node) endpoint to the higher, making
    an acyclic orientation in which every triangle has exactly ONE node
    with two out-edges. Wedges are generated only from ordered
    out-neighbor pairs and closed with one equi-join against the
    oriented edges — O(Σ_e min-deg(e)) wedges instead of Σ deg², so a
    hot entity with 10⁶ neighbors contributes its degree only through
    edges where it is the LOW endpoint (rare by construction). Three
    shuffles total: degree agg, wedge self-join, closing join.
    """
    und = _undirected_simple(edges, src_col, dst_col)
    deg = und.select(F.col("a").alias("n")).unionAll(
        und.select(F.col("b").alias("n"))
    ).groupBy("n").agg(F.count("*").alias("d"))
    # total order (degree, node); struct comparison gives the orientation
    withk = (
        und.join(deg.withColumnRenamed("n", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(deg.withColumnRenamed("n", "b"), "b")
        .withColumnRenamed("d", "db")
        .select(
            "a", "b",
            F.struct(F.col("da").alias("d"), F.col("a").alias("n")).alias("ka"),
            F.struct(F.col("db").alias("d"), F.col("b").alias("n")).alias("kb"),
        )
    )
    oriented = withk.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kdst"),
    )
    o1, o2 = oriented.alias("o1"), oriented.alias("o2")
    wedges = o1.join(o2, "src").filter(F.col("o1.kdst") < F.col("o2.kdst")).select(
        F.col("src").alias("u"),
        F.col("o1.dst").alias("v"),
        F.col("o2.dst").alias("w"),
    )
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"])
    return (
        tri.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


def k_core(
    edges: DataFrame,
    k: int,
    max_iterations: int = 64,
    src_col: str = "s",
    dst_col: str = "o",
) -> DataFrame:
    """Nodes of the k-core — the maximal subgraph in which every node
    has undirected degree ≥ k → (node, degree) with degrees measured
    WITHIN the core. The classic web-graph quality cut: low-core nodes
    are leaves/tendrils, high-core nodes the dense center.

    Iterative peeling: drop all nodes of degree < k, re-derive degrees
    over the surviving edge set, repeat to fixpoint. Each round is one
    degree aggregation + two semi-joins, lineage cut per round. Round
    count is the peeling depth (≤ graph diameter in practice; a chain
    is the worst case) — still live at ``max_iterations`` raises rather
    than returning a subgraph that is not yet a core."""
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(edges.sparkSession):
        return _k_core_impl(edges, k, max_iterations, src_col, dst_col)


def _k_core_impl(
    edges: DataFrame, k: int, max_iterations: int, src_col: str, dst_col: str
) -> DataFrame:
    if k < 1:
        raise ValueError("k_core needs k >= 1")
    live = _ckpt(_undirected_simple(edges, src_col, dst_col))
    for _ in range(max_iterations):
        deg = live.select(F.col("a").alias("n")).unionAll(
            live.select(F.col("b").alias("n"))
        ).groupBy("n").agg(F.count("*").alias("d"))
        keep = deg.filter(F.col("d") >= k).select("n")
        nxt = _ckpt(
            live.join(keep.withColumnRenamed("n", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("n", "b"), "b", "left_semi")
        )
        if nxt.count() == live.count():
            return deg.filter(F.col("d") >= k).select(
                F.col("n").alias("node"), F.col("d").alias("degree")
            )
        live = nxt
    raise ValueError(
        f"k_core: still peeling after {max_iterations} rounds — raise "
        "max_iterations (worst case is the graph's peeling depth)"
    )


def label_propagation(
    edges: DataFrame,
    max_iterations: int = 10,
    src_col: str = "s",
    dst_col: str = "o",
) -> DataFrame:
    """Community detection by synchronous label propagation →
    (node, label). GraphFrames-compatible semantics: labels start as the
    node's own id; each round EVERY node simultaneously adopts the most
    frequent label among its undirected neighbors, ties broken by the
    smallest label — fully deterministic. LPA on bipartite-ish graphs
    can oscillate, so the contract is a FIXED round count (an anytime
    algorithm), not convergence; ``max_iterations`` is the knob, exactly
    like GraphFrames' ``maxIter``.

    Each round is one shuffle join (labels onto the adjacency), one
    combinable count aggregation, and one per-node top-1 window (keyed
    by node — never a global window), lineage cut per round. At cluster
    scale the adjacency is the big side and stays put; only the
    (node → label) frame moves."""
    from graphforge_spark.session import fixpoint_shuffle

    with fixpoint_shuffle(edges.sparkSession):
        return _label_propagation_impl(edges, max_iterations, src_col, dst_col)


def _label_propagation_impl(
    edges: DataFrame, max_iterations: int, src_col: str, dst_col: str
) -> DataFrame:
    s, d = F.col(src_col), F.col(dst_col)
    und = (
        edges.filter(s != d)
        .select(F.least(s, d).alias("a"), F.greatest(s, d).alias("b"))
        .distinct()
    )
    adj = _ckpt(
        und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionAll(
            und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
        )
    )
    labels = _ckpt(adj.select("node").distinct().withColumn("label", F.col("node")))
    from pyspark.sql import Window

    top1 = Window.partitionBy("node").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    for _ in range(max_iterations):
        votes = (
            adj.join(
                labels.withColumnRenamed("node", "nbr"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.count("*").alias("votes"))
        )
        labels = _ckpt(
            votes.withColumn("_rn", F.row_number().over(top1))
            .filter(F.col("_rn") == 1)
            .select("node", "label")
        )
    return labels
