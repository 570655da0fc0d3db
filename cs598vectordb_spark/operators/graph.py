"""Graph-based ANN — the reference's headline index family (hnswlib /
FAISS IndexHNSWFlat, dynamic_script_faiss.py:53-57), re-expressed as
DataFrame iteration instead of a pointer-chasing in-memory graph.

Spark cannot mutate a shared graph during traversal, so the two halves
become set-at-a-time algorithms:

* ``build_knn_graph`` — NN-descent (Dong et al., WWW'11): start from a
  deterministic pseudo-random K-neighbor graph, then repeatedly propose
  neighbors-of-neighbors (one self-join on the edge list), score the
  proposals exactly, and keep the best K per node. Each round improves
  the graph monotonically; 3-4 rounds reach >0.9 graph recall on this
  data. Per-round cost is |V|·K² proposal edges — never |V|², the whole
  point of NN-descent — and every step is a bucket-joinable DataFrame op.

* ``knn_graph_search`` — batched best-first (beam) search: ALL queries
  walk the graph simultaneously. A round = frontier ⋈ graph (expand) →
  score new candidates → per-query top-B beam (window). T rounds of
  diameter-ish hops, then top-k of everything visited. Each round
  shuffles ≤ |Q|·B·K scored rows; the base table is touched only through
  the bounded candidate join, exactly like the LSH re-rank.

Determinism: seeds come from the engine's polynomial rolling hash of
(vec_id, seed), not an RNG — identical graphs and results across runs;
recall floors are pinned in tests (≥0.7 bar, BASELINE.md's Annoy floor).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs598vectordb_spark.config import DEFAULT_K, SEED
from cs598vectordb_spark.functions.distance import squared_l2

_ROLL_MOD = 1_000_000_007


def _pseudo(col: F.Column, salt: int) -> F.Column:
    """Deterministic pseudo-random int64 from an id — cheap affine-mod
    mix, stable across engines and runs (no RNG state)."""
    return (col * F.lit(1_103_515_245) + F.lit(12_345 + salt)) % F.lit(_ROLL_MOD)


def _score_pairs(edges: DataFrame, base: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(src, dst, dist): attach exact distances to an edge list with two
    id-equi-joins against the base payload. At 100 TB both joins shuffle
    on the uniform vec id — no skew, no cross product."""
    a = base.select(F.col(id_col).alias("src"), F.col(vec_col).alias("_sv"))
    b = base.select(F.col(id_col).alias("dst"), F.col(vec_col).alias("_dv"))
    return (
        edges.join(a, "src")
        .join(b, "dst")
        .select("src", "dst", squared_l2("_sv", "_dv").alias("dist"))
    )


def build_knn_graph(
    base: DataFrame,
    k: int = DEFAULT_K,
    rounds: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """(src, dst, dist): the directed kNN graph after `rounds` of
    NN-descent refinement. Each round localCheckpoints (lineage would
    otherwise double per iteration, same trick as dedup_clusters)."""
    n = base.count()
    ids = base.select(F.col(id_col).alias("src"))
    # deterministic random init: k distinct-ish targets per node
    inits = ids.select(
        "src",
        F.explode(
            F.array(*[(_pseudo(F.col("src"), seed + 7 * j) % n) for j in range(k)])
        ).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())

    def topk(scored: DataFrame) -> DataFrame:
        return (
            scored.groupBy("src", "dst")
            .agg(F.min("dist").alias("dist"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .drop("_r")
        )

    graph = topk(_score_pairs(inits, base, id_col, vec_col)).localCheckpoint(eager=True)
    for _ in range(rounds):
        # neighbor-of-neighbor proposals along BOTH edge directions —
        # undirected propagation converges much faster (NN-descent §2.2)
        und = graph.select("src", "dst").union(
            graph.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        hop = (
            und.alias("g1")
            .join(und.alias("g2"), F.col("g1.dst") == F.col("g2.src"))
            .select(F.col("g1.src").alias("src"), F.col("g2.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        proposals = hop.subtract(graph.select("src", "dst"))
        scored_new = _score_pairs(proposals, base, id_col, vec_col)
        graph = topk(graph.unionByName(scored_new)).localCheckpoint(eager=True)
    return graph


def knn_graph_search(
    graph: DataFrame,
    base: DataFrame,
    queries: DataFrame,
    k: int = DEFAULT_K,
    beam: int = 20,
    hops: int = 3,
    n_seeds: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """(q_id, rank, vec_id, dist): batched beam search. Seeds are
    deterministic pseudo-random entry points per query; each hop expands
    the current beam through the graph's out-edges, scores the new
    nodes against the (broadcast, driver-sized) query batch, and keeps
    the best `beam` visited nodes per query."""
    n = base.count()
    seeds = queries.select(
        "q_id",
        F.explode(
            F.array(*[(_pseudo(F.col("q_id"), seed + 13 * j) % n) for j in range(n_seeds)])
        ).alias("node"),
    )
    qv = queries.select(F.col("q_id"), F.col(vec_col).alias("_qv"))
    bv = base.select(F.col(id_col).alias("node"), F.col(vec_col).alias("_nv"))

    def score(cand: DataFrame) -> DataFrame:
        return (
            cand.join(bv, "node")
            .join(F.broadcast(qv), "q_id")
            .select("q_id", "node", squared_l2("_qv", "_nv").alias("dist"))
        )

    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("node").asc())
    visited = (
        score(seeds.distinct())
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= beam)
        .drop("_r")
        .localCheckpoint(eager=True)
    )
    out_edges = graph.select(F.col("src").alias("node"), F.col("dst"))
    for _ in range(hops):
        frontier = visited.select("q_id", "node")
        expanded = (
            frontier.join(out_edges, "node")
            .select("q_id", F.col("dst").alias("node"))
            .subtract(frontier)
        )
        visited = (
            visited.unionByName(score(expanded))
            .groupBy("q_id", "node")
            .agg(F.min("dist").alias("dist"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= beam)
            .drop("_r")
            .localCheckpoint(eager=True)
        )
    return (
        visited.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("node").alias("vec_id"), "dist")
    )


def graph_quality(graph: DataFrame, truth: DataFrame) -> DataFrame:
    """One-row graph recall: fraction of the exact kNN graph's edges
    present in the built graph (the NN-descent convergence metric)."""
    g = graph.select("src", "dst")
    t = truth.select(F.col("q_id").alias("src"), F.col("vec_id").alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    n_truth = t.count()
    hit = t.join(g, ["src", "dst"]).count()
    spark = graph.sparkSession
    return spark.createDataFrame(
        [(round(hit / max(n_truth, 1), 4), n_truth)], "graph_recall double, n_edges long"
    )
