"""Graph operators over edge lists — link analysis for corpus/web-graph
curation (rank pages before sampling, weight domains by authority).

``pagerank`` is the second iterative algorithm in the library (next to
``clustering.kmeans_lloyd`` and the connected components in
``operators/dedup.py``) and follows the same discipline:

* per-iteration cost is ONE shuffle (contributions grouped by dst);
  ranks and degrees are joined to the edge list by key — no
  broadcast-scalar state besides the 1-row node count (the
  ``idf_keywords`` cross-join pattern, no driver collect).
* deterministic and engine-replayable: contributions are rounded to
  9 dp and summed as ``DECIMAL(20,9)`` (decimal addition is
  associative, so partial-agg splits and row order cannot change the
  sum), and each new rank is rounded to 9 dp.  An independent engine
  reproduces every iteration bit-for-bit.
* simplified damping variant (the common one): dangling-node mass is
  dropped rather than redistributed — ranks then need no global
  re-normalization pass per iteration.  Documented, test-pinned.
* lineage: ranks are ``localCheckpoint``-ed every few rounds (same as
  ``duplicate_clusters``) so long runs keep constant plan size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CHECKPOINT_EVERY = 5


def _pin(df: DataFrame, materialize: str) -> DataFrame:
    """Materialize a loop-invariant frame under the caller-chosen
    lifetime policy:

    * ``"cache"`` (default) — fastest re-reads, but the blocks are held
      by the session's CacheManager until an explicit ``unpersist()`` /
      ``clearCache()``; dropping the result frame reclaims nothing.
      Right for benchmark-style sessions that clear between runs.
    * ``"checkpoint"`` — ``localCheckpoint``: blocks are owned by the
      RDD, so the ContextCleaner reclaims them once the result frame is
      garbage-collected.  Right for long-lived library sessions where a
      forgotten ``clearCache()`` would leak storage until LRU eviction
      (round-7 advice)."""
    if materialize == "cache":
        return df.cache()
    if materialize == "checkpoint":
        return df.localCheckpoint(eager=False)
    raise ValueError(
        f"materialize must be 'cache' or 'checkpoint', got {materialize!r}"
    )


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: str = "cache",
) -> DataFrame:
    """PageRank over a directed edge list (duplicate edges count once).

    Returns ``(node, rank)`` for every node appearing as a source or
    destination, after ``iters`` rounds of
    ``rank = round((1-d)/N + d * Σ_in round(rank_src/deg_src, 9), 9)``
    starting from the uniform ``round(1/N, 9)``.

    ``materialize`` picks the loop-invariant storage policy — see
    :func:`_pin`.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # the edge list, node set, and out-degrees are loop INVARIANTS read
    # by every iteration — cache them once instead of re-running the
    # distinct/degree shuffles per round (measured: dominates the
    # 2-iteration runtime otherwise; storage is the edge list itself,
    # MEMORY_AND_DISK so an over-RAM graph spills rather than fails).
    # Lifetime contract: DataFrame caches are held by the session's
    # CacheManager until an explicit unpersist()/clearCache() — dropping
    # the result frame reclaims NOTHING (unlike localCheckpoint blocks,
    # whose RDDs the ContextCleaner does collect).  Callers in long-lived
    # sessions must clearCache() between runs (bench.py does) or pass
    # materialize="checkpoint"; the blocks are MEMORY_AND_DISK and
    # LRU-evictable, so a leak degrades to disk pressure, never an OOM.
    e = _pin(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct(),
        materialize,
    )
    nodes = _pin(
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct(),
        materialize,
    )
    deg = e.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    # the degree join is loop-INVARIANT too: attach it to the edge list
    # once and pin the combined (src, dst, deg) relation, instead of
    # re-joining deg inside every iteration
    e_deg = _pin(e.join(deg, "src"), materialize)
    n_row = nodes.agg(F.count("*").cast("long").alias("n_nodes"))
    ranks = nodes.crossJoin(F.broadcast(n_row)).select(
        "node",
        F.round(F.lit(1.0) / F.col("n_nodes"), 9).alias("rank"),
        "n_nodes",
    )
    for i in range(iters):
        contrib = (
            e_deg.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                "dst",
                F.round(F.col("rank") / F.col("deg"), 9)
                .cast("decimal(20,9)")
                .alias("contrib"),
            )
        )
        inbound = contrib.groupBy("dst").agg(
            F.sum("contrib").alias("in_mass")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(n_row))
            .join(inbound.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(
                        F.col("in_mass").cast("double"), F.lit(0.0)
                    ),
                    9,
                ).alias("rank"),
                "n_nodes",
            )
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", "rank")


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list (duplicate
    and self edges ignored) — the clustering-coefficient numerator used
    to profile web/citation graphs before link-based curation.

    The classic two-join plan with the degeneracy-style orientation
    trick: canonicalize every edge to ``a < b``, enumerate wedges by
    joining edges on the shared middle vertex, then close each wedge
    with a third equi-join.  Ordering (a < b < c) means every triangle
    is found exactly once — no post-hoc /6 division and, at scale, no
    high-degree vertex enumerates both directions of its fan-out.  Both
    joins are equi-joins on vertex keys, so the whole operator is two
    uniform-key shuffles; there is no nested loop anywhere.

    Measured alternatives (bench co-supply graph, 120k edges / 1000
    nodes, near-uniform degree ~240): degree-ordered orientation cuts
    wedge volume only 11.1M -> 9.1M on this density (no skew to
    exploit), and the adjacency-array ``array_intersect`` plan is
    SLOWER (3.1 s vs 2.1 s) — per-edge rows carrying two ~240-element
    arrays through the closing joins cost more than the lean 3-column
    wedge shuffle, and the 3-credits-per-triangle explode (7.3M rows
    here) is common to both plans.  On a skewed web-scale graph the
    degree-ordered variants win; for this operator the wedge plan is
    the measured optimum and its skew exposure is bounded by the
    orientation.

    Returns ``(node, triangles)`` for every node of the edge list
    (0 for triangle-free nodes).
    """
    e = (
        edges.select(F.col(src_col).alias("_u"), F.col(dst_col).alias("_v"))
        .filter(F.col("_u") != F.col("_v"))
        .select(
            F.least("_u", "_v").alias("a"), F.greatest("_u", "_v").alias("b")
        )
        .distinct()
        # the canonical edge list feeds FOUR consumers (both wedge
        # sides, the closing join, and the node set); without a
        # checkpoint the whole upstream edge-derivation subtree runs
        # four times (no CSE across self-joins — same discipline as
        # semantic_dedup/dhash_near_dups).  Two longs per edge: tiny
        # relative to any input that produced it
        .localCheckpoint(eager=False)
    )
    # wedges a-b-c with a < b < c: first join on the middle vertex
    ab = e.select(F.col("a").alias("wa"), F.col("b").alias("wb"))
    bc = e.select(F.col("a").alias("wb"), F.col("b").alias("wc"))
    wedges = ab.join(bc, "wb")
    closing = e.select(F.col("a").alias("wa"), F.col("b").alias("wc"))
    tris = wedges.join(closing, ["wa", "wc"])
    per_node = (
        tris.select(F.explode(F.array("wa", "wb", "wc")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("triangles"))
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .distinct()
    )
    return nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    materialize: str = "cache",
) -> DataFrame:
    """Community detection by synchronous label propagation over an
    UNDIRECTED edge list: every node starts as its own label; each
    round a node adopts its neighbors' most frequent label (ties break
    to the SMALLEST label — fully deterministic, unlike textbook LPA's
    random tie-break, so any engine replays the rounds exactly).

    Communities are the soft/local complement to
    ``dedup.duplicate_clusters``' connected components: CC merges
    everything reachable; LPA keeps densely-linked groups apart even
    when a stray edge bridges them.

    Per round: one (node, label) join onto the symmetrized edges, a
    (dst, label) count, and a per-node argmax window — two keyed
    shuffles, no broadcast state, labels ``localCheckpoint``-ed every
    few rounds like the other iterative operators.  Isolated nodes
    (no edges) keep their own label by construction."""
    from pyspark.sql import Window

    if iters < 1:
        raise ValueError("iters must be >= 1")
    und = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
                    F.struct(F.col("b").alias("u"), F.col("a").alias("v")),
                )
            ).alias("e")
        )
        .select(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .distinct()
    )
    # loop INVARIANT read every round — same lifetime contract as
    # pagerank's edge pin above (see _pin): default cache is held by
    # the CacheManager until clearCache(); materialize="checkpoint"
    # hands the blocks to the ContextCleaner instead
    und = _pin(und, materialize)
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for i in range(iters):
        votes = (
            und.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u", "label")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        w = Window.partitionBy("u").orderBy(F.col("n").desc(), F.col("label"))
        labels = (
            votes.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select(F.col("u").alias("node"), "label")
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            labels = labels.localCheckpoint(eager=True)
    return labels
