"""Graph-based ANN — the reference's headline index family (hnswlib /
FAISS IndexHNSWFlat, dynamic_script_faiss.py:53-57), re-expressed as
DataFrame iteration instead of a pointer-chasing in-memory graph.

Spark cannot mutate a shared graph during traversal, so the two halves
become set-at-a-time algorithms:

* ``build_knn_graph_partitioned`` — the build path of record:
  spill-partitioned exact subgraphs (k-means cells, every vector
  assigned to its `spill` nearest cells, exact blocked edges per cell
  in one Arrow kernel, one top-k merge). Two shuffle stages total.

* ``build_knn_graph`` — NN-descent (Dong et al., WWW'11): start from a
  deterministic pseudo-random K-neighbor graph, then repeatedly propose
  neighbors-of-neighbors (one self-join on the edge list), score the
  proposals exactly, and keep the best K per node. Each round improves
  the graph monotonically. Per-round cost is |V|·K² proposal edges —
  never |V|² — but each round is ~5 Spark stage waves, so the
  partitioned builder beats it on wall clock; kept as the
  assumption-free fallback.

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

import os
import threading

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


def build_knn_graph_partitioned(
    base: DataFrame,
    k: int = DEFAULT_K,
    nlist: int = 8,
    spill: int = 2,
    train_sample: int = 10_000,
    exact_segment_rows: int = 16_384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> DataFrame:
    """(src, dst, dist): flat kNN graph via spill-partitioned exact
    subgraphs — the fast path of record for T-family graph builds.

    The join-based NN-descent builder (build_knn_graph) pays init+3
    refinement rounds, each a multi-stage shuffle (self-join, subtract,
    two score joins, window) — ~5 Spark stage waves per round, which is
    wall-clock-dominant regardless of data size. This builder instead
    k-means the base into ~nlist cells, assigns every vector to its
    `spill` nearest cells (SPANN closure assignment: a true-NN pair near
    a shared boundary co-occurs in some cell), computes each cell's
    EXACT blocked kNN edges inside ONE Arrow kernel, and merges the
    union with a single groupBy + per-src top-k — two shuffle stages
    total. Cells beyond exact_segment_rows recurse into the same
    spill-partitioned local build, so per-task memory stays bounded at
    100 TB scale; cross-cell truth is what the spill overlap captures.

    Reference analog: FAISS builds its HNSW in seconds in-process
    (/root/reference/dynamic_script_faiss.py:53-57); this is the
    cluster-shaped equivalent with deterministic seeds."""
    import pandas as pd

    from cs598vectordb_spark.operators.index import _kmeans_fit

    spark = base.sparkSession
    sample = base.select(id_col, vec_col).orderBy(id_col).limit(train_sample).toPandas()
    Xs = np.stack(sample[vec_col].to_numpy()).astype(np.float64)
    C = _kmeans_fit(Xs, nlist, seed)
    bc = spark.sparkContext.broadcast(C)
    n_spill = min(spill, nlist)

    def assign(batches):
        Cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                np.square(B).sum(1, keepdims=True)
                - 2.0 * (B @ Cb.T)
                + np.square(Cb).sum(1)[None, :]
            )
            cells = np.argpartition(d2, n_spill - 1, axis=1)[:, :n_spill]
            idx = np.repeat(np.arange(len(pdf)), n_spill)
            out = pdf.iloc[idx].reset_index(drop=True)
            yield out.assign(cell=cells.ravel().astype(np.int32))

    from pyspark.sql.types import IntegerType, StructField, StructType

    in_schema = base.select(id_col, vec_col).schema
    assigned = base.select(id_col, vec_col).mapInPandas(
        assign, StructType(list(in_schema.fields) + [StructField("cell", IntegerType())])
    )

    def seg_edges(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        if len(ids) <= 1:
            return pd.DataFrame({"src": [], "dst": [], "dist": []}).astype(
                {"src": np.int64, "dst": np.int64, "dist": np.float64}
            )
        X = np.ascontiguousarray(np.stack(pdf[vec_col].to_numpy()), dtype=np.float64)
        if len(ids) <= exact_segment_rows:
            nb, dd = _local_knn_graph(X, ids, k)
        else:
            nb, dd = _local_partitioned_graph(X, ids, k)
        counts = np.fromiter((len(a) for a in nb), dtype=np.int64, count=len(nb))
        return pd.DataFrame(
            {
                "src": np.repeat(ids, counts),
                "dst": np.concatenate(nb),
                "dist": np.concatenate(dd).astype(np.float64),
            }
        )

    edges = assigned.groupBy("cell").applyInPandas(
        seg_edges, "src long, dst long, dist double"
    )
    w = Window.partitionBy("src").orderBy(F.col("dist").asc(), F.col("dst").asc())
    return (
        edges.groupBy("src", "dst")
        .agg(F.min("dist").alias("dist"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )


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


# ---- layered (segmented) graph index ------------------------------------
# The flat DataFrame beam search above is stage-count-bound: every hop is
# a join + window + checkpoint (~4 stages), so probe latency is Spark
# scheduling, not compute. The layered design is the HNSW-at-cluster-scale
# shape the reference itself benchmarks: Milvus builds ONE graph PER
# SEGMENT and merges across segments at query time
# (/root/reference/dynamic_script_milvus.py:76-82 HNSW index on a
# sharded collection). Spark rendering:
#
#   top layer  = k-means centroids (driver-sized, like IVF) — prune to
#                the nprobe nearest segments per query;
#   base layer = a per-segment kNN subgraph, co-partitioned with its
#                vectors, walked ENTIRELY inside one Arrow kernel
#                (best-first beam search in numpy — no per-hop stages).
#
# Probe plan: filter(probed segments) → applyInPandas walk → one global
# top-k window. The segment table is persisted repartition()ed on
# centroid_id, so the groupBy before the kernel needs NO exchange
# (asserted in tests/test_plans.py); the only shuffle carries
# ≤ nprobe·|Q|·k candidate rows. At 100 TB each segment is a few million
# vectors whose subgraph a single executor walks in memory — the
# DiskANN/SPANN sharding story — while segment count scales out.


class LayeredGraphIndex:
    """Per-segment kNN subgraphs + driver-sized centroid top layer.
    With `codec` set, segments store SQ8 codes instead of float vectors
    (4x less executor memory per resident segment — the DiskANN-style
    compressed-graph-in-RAM trade) and the walk kernel reconstructs
    on the fly."""

    def __init__(
        self,
        segments: DataFrame,
        centroids: np.ndarray,
        nlist: int,
        degree: int,
        codec=None,
        serve_dir: str | None = None,  # worker-served mode (open_layered)
    ):
        self.segments = segments  # (centroid_id, vec_id, embedding|codes, nbr_ids)
        self.centroids = centroids
        self.nlist = nlist
        self.degree = degree
        self.codec = codec  # operators.sq.SqCodec or None
        self.serve_dir = serve_dir

    def close(self) -> None:
        """Release the persisted segment table. Maintenance ops
        (delete_from_layered / insert_into_layered) intentionally leave
        the superseded version persisted — in overlap mode it is still
        serving probes while the new one builds — so the protocol driver
        calls close() once the replacement is recorded as serving;
        without it a long delete/insert sweep accumulates one persisted
        index copy per maintenance step."""
        self.segments.unpersist()


def _local_knn_graph(
    X: np.ndarray, ids: np.ndarray, degree: int, block: int = 4096
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Exact per-segment kNN adjacency (global ids + distances), ties
    broken by id. Scored in COLUMN BLOCKS: peak extra memory is ONE
    |block|×|seg| float64 array (squared_l2_block updates its GEMM
    output in place) — 4096×16384×8 B = 512 MB at the exact-path cap
    (exact_segment_rows=16_384), ~0.6 GB worst case per Arrow worker
    with the argpartition scratch, never the full |seg|² matrix (a
    50k-row segment's full float64 matrix would be ~20 GB, an executor
    OOM at exactly the segment sizes a 100 TB base produces). Compute is
    still |seg|² GEMM, which is why the builders cap the exact path and
    hand larger segments to the spill-partitioned/NN-descent fallbacks
    (forced end-to-end at exact_segment_rows=0 in tests/test_index.py)."""
    from cs598vectordb_spark.operators.knn import squared_l2_block

    c = len(ids)
    k_eff = min(degree, c - 1)
    nbrs: list[np.ndarray] = []
    dists: list[np.ndarray] = []
    for lo in range(0, c, block):
        hi = min(lo + block, c)
        d2 = squared_l2_block(X[lo:hi], X)  # block × c — rows contiguous,
        # so the per-row argpartition below streams cache lines instead of
        # striding columns (the axis-0 orientation was ~30× slower)
        d2[np.arange(hi - lo), np.arange(lo, hi)] = np.inf
        part = np.argpartition(d2, k_eff - 1, axis=1)[:, :k_eff]
        dcand = np.take_along_axis(d2, part, axis=1)
        order = np.lexsort((ids[part], dcand), axis=1)  # per-row tie-break
        top = np.take_along_axis(part, order, axis=1)
        dtop = np.take_along_axis(dcand, order, axis=1)
        for i in range(hi - lo):
            nbrs.append(ids[top[i]].astype(np.int64))
            dists.append(dtop[i].astype(np.float64))
    return nbrs, dists


def _blocked_pair_dists(
    X: np.ndarray, sq: np.ndarray, src: np.ndarray, dst: np.ndarray,
    score_block: int = 500_000,
) -> np.ndarray:
    """Exact squared-L2 for an edge list, scored in blocked gather-einsums
    so peak gather memory is score_block·dim floats."""
    out = np.empty(len(src))
    for lo in range(0, len(src), score_block):
        s, d = src[lo : lo + score_block], dst[lo : lo + score_block]
        out[lo : lo + score_block] = np.maximum(
            sq[s] - 2.0 * np.einsum("ij,ij->i", X[s], X[d]) + sq[d], 0.0
        )
    return out


def _descent_rounds(
    X: np.ndarray,
    ids: np.ndarray,
    cur_src: np.ndarray,
    cur_dst: np.ndarray,
    cur_d: np.ndarray,
    k_eff: int,
    rounds: int,
    max_proposals: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized NN-descent rounds over a position-space edge list.
    Each round: CSR the UNDIRECTED edge multiset (Dong et al. §2.2 —
    out-edges alone plateau well below 0.9 graph recall), propose every
    (u, nbrs(v)) 2-hop pair as one ragged expansion, score the deduped
    fresh pairs in blocked gather-GEMMs, and keep each node's best k_eff
    by (dist, id) with one segmented rank pass — no per-node Python loop
    anywhere. Above max_proposals the expanded edge set is
    deterministically subsampled (affine-mod hash), the classic
    NN-descent sampling-rate knob."""
    c = len(ids)
    pos = np.arange(c, dtype=np.int64)
    sq = np.square(X).sum(axis=1)
    cur_key = cur_src * c + cur_dst
    for _ in range(rounds):
        e_src = np.concatenate([cur_src, cur_dst])
        e_dst = np.concatenate([cur_dst, cur_src])
        eorder = np.argsort(e_src, kind="stable")
        e_src, e_dst = e_src[eorder], e_dst[eorder]
        indptr = np.searchsorted(e_src, np.arange(c + 1))
        deg = np.diff(indptr)
        exp_src, exp_dst = e_src, e_dst  # the edges we expand (maybe sampled)
        counts = deg[exp_dst]
        total = int(counts.sum())
        if total > max_proposals:
            keep = (exp_src * c + exp_dst) * 2_654_435_761 % _ROLL_MOD < int(
                _ROLL_MOD * (max_proposals / total)
            )
            exp_src, exp_dst = exp_src[keep], exp_dst[keep]
            counts = deg[exp_dst]
            total = int(counts.sum())
        # ragged expansion: for each kept edge (u, v) propose (u, nbrs(v));
        # the gather indexes the FULL CSR arrays, only expansion is sampled
        prop_src = np.repeat(exp_src, counts)
        offs = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        prop_dst = e_dst[np.repeat(indptr[exp_dst], counts) + offs]
        mask = prop_src != prop_dst
        new_key = np.setdiff1d(
            np.unique(prop_src[mask] * c + prop_dst[mask]), cur_key
        )
        if len(new_key) == 0:
            break
        prop_src, prop_dst = new_key // c, new_key % c
        prop_d = _blocked_pair_dists(X, sq, prop_src, prop_dst)
        # pool = current ∪ proposals (disjoint by construction) → top-k
        # per src by (dist, id), selected with one segmented rank pass
        all_src = np.concatenate([cur_src, prop_src])
        all_dst = np.concatenate([cur_dst, prop_dst])
        all_d = np.concatenate([cur_d, prop_d])
        so = np.lexsort((ids[all_dst], all_d, all_src))
        all_src, all_dst, all_d = all_src[so], all_dst[so], all_d[so]
        grp_start = np.searchsorted(all_src, pos)
        keep = (np.arange(len(all_src)) - grp_start[all_src]) < k_eff
        cur_src, cur_dst, cur_d = all_src[keep], all_dst[keep], all_d[keep]
        cur_key = cur_src * c + cur_dst
    return cur_src, cur_dst, cur_d


def _finalize_edges(
    ids: np.ndarray, cur_src: np.ndarray, cur_dst: np.ndarray, cur_d: np.ndarray
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """Position-space edge list → per-node (global-id neighbors, dists),
    each node's list ordered by (dist, id)."""
    c = len(ids)
    so = np.lexsort((ids[cur_dst], cur_d, cur_src))
    cur_src, cur_dst, cur_d = cur_src[so], cur_dst[so], cur_d[so]
    split = np.searchsorted(cur_src, np.arange(1, c))
    return (
        np.split(ids[cur_dst].astype(np.int64), split),
        np.split(cur_d, split),
    )


def _local_nn_descent(
    X: np.ndarray,
    ids: np.ndarray,
    degree: int,
    rounds: int = 3,
    max_proposals: int = 32_000_000,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """NN-descent from a deterministic pseudo-random init — kept as the
    assumption-free fallback and the polish engine; for large segments
    the partitioned builder (_local_partitioned_graph) converges far
    faster because its init is already near-exact."""
    c = len(ids)
    k_eff = min(degree, c - 1)
    order = np.argsort(ids, kind="stable")
    X, ids = X[order], ids[order]
    # init: pseudo-random distinct-ish targets per node (position space),
    # deduped pairwise via the flat (src·c + dst) key
    pos = np.arange(c, dtype=np.int64)
    init = np.stack(
        [(pos * 1_103_515_245 + 12_345 + 7 * j) % _ROLL_MOD % c for j in range(k_eff)],
        axis=1,
    )
    for j in range(k_eff):  # avoid self-loops deterministically
        init[:, j] = np.where(init[:, j] == pos, (init[:, j] + 1) % c, init[:, j])
    cur_key = np.unique(np.repeat(pos, k_eff) * c + init.ravel())
    cur_src, cur_dst = cur_key // c, cur_key % c
    sq = np.square(X).sum(axis=1)
    cur_d = _blocked_pair_dists(X, sq, cur_src, cur_dst)
    cur_src, cur_dst, cur_d = _descent_rounds(
        X, ids, cur_src, cur_dst, cur_d, k_eff, rounds, max_proposals
    )
    return _finalize_edges(ids, cur_src, cur_dst, cur_d)


def _local_partitioned_graph(
    X: np.ndarray,
    ids: np.ndarray,
    degree: int,
    spill: int = 2,
    target_cell: int = 4096,
    polish_rounds: int = 0,
    polish_proposals: int = 32_000_000,
    seed: int = SEED,
) -> tuple[list[np.ndarray], list[np.ndarray]]:
    """kNN graph for segments too large for one |seg|² pass: k-means the
    segment into ~target_cell-row cells, SPILL-assign every node to its
    `spill` nearest cells (SPANN's closure assignment — two points near a
    shared boundary land in a common cell), build each cell's EXACT
    blocked graph in float32, and top-k merge the union. Cost is
    Σ|cell|² ≈ spill²·|seg|·target_cell multiply-adds of BLAS — no giant
    edge sorts, no convergence question — vs |seg|² for the flat exact
    path. Optional polish_rounds of NN-descent close the residual gap
    (one round from this init beats three from random). Distances are
    scored in float32 (graph edges feed rows-only probe paths, never the
    value-hashed oracle surface); ties keep id order via lexsort."""
    from cs598vectordb_spark.operators.index import _kmeans_fit

    c = len(ids)
    order = np.argsort(ids, kind="stable")
    X, ids = X[order], ids[order]
    if c <= target_cell:
        return _local_knn_graph(X, ids, degree)
    k_eff = min(degree, c - 1)
    Xf = np.ascontiguousarray(X, dtype=np.float32)
    sqf = np.square(Xf).sum(axis=1)
    n_cells = max(spill + 1, -(-(spill * c) // target_cell))
    sample = Xf[(np.arange(min(c, 64 * n_cells)) * 7919) % c]
    C = _kmeans_fit(sample, n_cells, seed).astype(np.float32)
    csq = np.square(C).sum(axis=1)
    cell_of = np.empty((c, spill), dtype=np.int64)
    for lo in range(0, c, 8192):  # blocked assignment GEMM
        hi = min(lo + 8192, c)
        d2 = sqf[lo:hi, None] - 2.0 * (Xf[lo:hi] @ C.T) + csq[None, :]
        cell_of[lo:hi] = np.argpartition(d2, spill - 1, axis=1)[:, :spill]
    pair_cell = cell_of.ravel()
    pair_node = np.repeat(np.arange(c, dtype=np.int64), spill)
    o = np.argsort(pair_cell, kind="stable")  # members ascend within cell
    pair_cell, pair_node = pair_cell[o], pair_node[o]
    bounds = np.searchsorted(pair_cell, np.arange(n_cells + 1))
    key_parts, d_parts = [], []
    for ci in range(n_cells):
        members = pair_node[bounds[ci] : bounds[ci + 1]]
        if len(members) <= 1:
            continue
        nb, dd = _local_knn_graph(Xf[members], np.arange(len(members)), degree)
        counts = np.fromiter((len(a) for a in nb), dtype=np.int64, count=len(nb))
        src_l = np.repeat(np.arange(len(members)), counts)
        dst_l = np.concatenate(nb).astype(np.int64)
        key_parts.append(members[src_l] * c + members[dst_l])
        d_parts.append(np.concatenate(dd))
    all_key = np.concatenate(key_parts)
    all_d = np.concatenate(d_parts)
    uniq_key, first = np.unique(all_key, return_index=True)  # exact dists → any dup ok
    cur_src, cur_dst, cur_d = uniq_key // c, uniq_key % c, all_d[first]
    # top-k per src across the union before any polishing
    so = np.lexsort((ids[cur_dst], cur_d, cur_src))
    cur_src, cur_dst, cur_d = cur_src[so], cur_dst[so], cur_d[so]
    grp_start = np.searchsorted(cur_src, np.arange(c, dtype=np.int64))
    keep = (np.arange(len(cur_src)) - grp_start[cur_src]) < k_eff
    cur_src, cur_dst, cur_d = cur_src[keep], cur_dst[keep], cur_d[keep]
    if polish_rounds:
        cur_src, cur_dst, cur_d = _descent_rounds(
            X, ids, cur_src, cur_dst, cur_d, k_eff, polish_rounds, polish_proposals
        )
    return _finalize_edges(ids, cur_src, cur_dst, cur_d)


def build_layered_graph(
    base: DataFrame,
    nlist: int = 16,
    degree: int = 16,
    exact_segment_rows: int = 16_384,
    compress: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> LayeredGraphIndex:
    """Assign vectors to k-means segments (reusing the IVF trainer), then
    build each segment's kNN subgraph inside one applyInPandas stage and
    persist the (segment, vector, adjacency) table hash-partitioned on
    centroid_id so probes reach the walk kernel exchange-free."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from cs598vectordb_spark.operators.index import build_ivf_index

    ivf = build_ivf_index(base, nlist=nlist, id_col=id_col, vec_col=vec_col, seed=seed)
    vec_type = base.schema[vec_col].dataType
    out_schema = StructType(
        [
            StructField("centroid_id", IntegerType()),
            StructField(id_col, LongType()),
            StructField(vec_col, vec_type),
            StructField("nbr_ids", ArrayType(LongType())),
        ]
    )

    def seg_graph(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.ascontiguousarray(np.stack(pdf[vec_col].to_numpy()), dtype=np.float64)
        if len(ids) <= 1:
            nbrs = [np.array([], dtype=np.int64)] * len(ids)
        elif len(ids) <= exact_segment_rows:
            nbrs, _ = _local_knn_graph(X, ids, degree)
        else:
            # oversized segments: spill-partitioned build — linear in
            # |seg| (vs the exact path's quadratic), memory bounded by
            # the blocked scorer. Edge recall ≈1.0 on clusterable data,
            # ~0.5-0.7 on worst-case isotropic vectors (measured; beam
            # search tolerates imperfect edges, and the layered probe's
            # recall ceiling is the IVF prune, not subgraph quality).
            nbrs, _ = _local_partitioned_graph(X, ids, degree)
        return pd.DataFrame(
            {
                "centroid_id": pdf["centroid_id"],
                id_col: ids,
                vec_col: pdf[vec_col],
                "nbr_ids": nbrs,
            }
        )

    segs = ivf.assigned.groupBy("centroid_id").applyInPandas(seg_graph, out_schema)
    codec = None
    if compress:
        # graph edges were chosen from exact float distances; the STORED
        # payload is the int8 codes — the walk reconstructs per batch
        from cs598vectordb_spark.operators.sq import sq_encode, train_sq

        codec = train_sq(base, vec_col=vec_col)
        segs = sq_encode(
            segs, codec, vec_col=vec_col, id_col=id_col,
            extra_cols=["centroid_id", "nbr_ids"],
        )
    segments = segs.repartition(nlist, "centroid_id").persist()
    segments.count()
    return LayeredGraphIndex(segments, ivf.centroids, nlist, degree, codec)


def _beam_walk_block(
    ids: np.ndarray,
    X: np.ndarray,
    nbr_pos: list,
    sq_x: np.ndarray,
    bQ: np.ndarray,
    bq_ids: np.ndarray,
    qsel: np.ndarray,
    k: int,
    beam: int,
    rounds: int,
    n_entry: int,
) -> tuple[list, list, list]:
    """Best-first beam walk of ONE decoded segment for a block of
    queries — the numpy kernel shared verbatim by the Arrow-payload
    probe (`_walk_probed_segments`) and the worker-served probe
    (`_walk_served_segments`), so the two serving modes are identical
    by construction. Deterministic: entry points are evenly spaced
    positions, ties broken by (dist, vec_id)."""
    c = len(ids)
    entries = np.unique(np.linspace(0, c - 1, min(n_entry, c)).astype(np.int64))
    out_q, out_id, out_d = [], [], []
    for j in qsel:
        q = bQ[j]
        sq_q = float(q @ q)
        dist = np.full(c, np.inf)
        cand = entries
        dist[cand] = np.maximum(sq_x[cand] - 2.0 * (X[cand] @ q) + sq_q, 0.0)
        for _ in range(rounds):
            scored = np.flatnonzero(np.isfinite(dist))
            b_eff = min(beam, len(scored))
            top = scored[np.argpartition(dist[scored], b_eff - 1)[:b_eff]]
            new = np.unique(np.concatenate([nbr_pos[p] for p in top]))
            new = new[~np.isfinite(dist[new])]
            if len(new) == 0:
                break
            dist[new] = np.maximum(sq_x[new] - 2.0 * (X[new] @ q) + sq_q, 0.0)
        scored = np.flatnonzero(np.isfinite(dist))
        k_eff = min(k, len(scored))
        top = scored[np.argpartition(dist[scored], k_eff - 1)[:k_eff]]
        order = np.lexsort((ids[top], dist[top]))
        top = top[order]
        out_q.append(np.full(len(top), bq_ids[j], dtype=np.int64))
        out_id.append(ids[top])
        out_d.append(dist[top])
    return out_q, out_id, out_d


def _walk_probed_segments(
    segments: DataFrame,
    key_col: str,
    probed: dict[int, np.ndarray],
    q_ids: np.ndarray,
    Q: np.ndarray,
    codec,
    k: int,
    beam: int,
    rounds: int,
    n_entry: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared probe tail for every layered-graph variant: filter the
    segment table to the probed keys, walk each probed segment's subgraph
    for all of its queries inside ONE applyInPandas kernel (best-first
    beam in numpy — no per-hop Spark stages), then merge with a single
    per-query window. `probed` maps segment key → indices into Q; both
    are driver-sized by design (the query batch is the one by-design
    driver-side collect). With a codec the kernel reconstructs int8 codes
    on the fly."""
    import pandas as pd

    spark = segments.sparkSession
    codec_arrs = (codec.mins, codec.ranges) if codec is not None else None
    data_col = "codes" if codec is not None else vec_col
    # pooled: repeated probes (streams, tenant loops) must not
    # accumulate per-call broadcasts — see _pooled_broadcast
    bc = _pooled_broadcast(spark, (q_ids, Q, probed, codec_arrs))

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        bq_ids, bQ, bprobed, bcodec = bc.value
        empty = pd.DataFrame({"q_id": [], "vec_id": [], "dist": []}).astype(
            {"q_id": np.int64, "vec_id": np.int64, "dist": np.float64}
        )
        if len(pdf) == 0:
            return empty
        qsel = bprobed.get(int(pdf[key_col].iloc[0]))
        if qsel is None or len(qsel) == 0:
            return empty
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.ascontiguousarray(np.stack(pdf[data_col].to_numpy()), dtype=np.float64)
        if bcodec is not None:  # reconstruct from int8 codes
            mns, rngs = bcodec
            X = mns[None, :] + X / 255.0 * rngs[None, :]
        c = len(ids)
        # adjacency in local-position space (ids are sorted → searchsorted).
        # Edges to ids NOT in the segment (stale after incremental deletes)
        # are masked out, not mis-mapped — deletion leaves dangling edges
        # by design and the walk must skip them.
        def to_pos(n) -> np.ndarray:
            n = np.asarray(n, dtype=np.int64)
            p = np.searchsorted(ids, n)
            p_clip = np.minimum(p, c - 1)
            return p_clip[ids[p_clip] == n]

        # None ≡ no outgoing edges (the served decode already reads a
        # null list as zero-length via Arrow offsets; keep the three
        # serving modes identical on legacy artifacts that carry nulls)
        _no_edges = np.empty(0, dtype=np.int64)
        nbr_pos = [
            to_pos(n) if n is not None else _no_edges
            for n in pdf["nbr_ids"]
        ]
        sq_x = np.square(X).sum(axis=1)
        out_q, out_id, out_d = _beam_walk_block(
            ids, X, nbr_pos, sq_x, bQ, bq_ids, qsel, k, beam, rounds, n_entry
        )
        return pd.DataFrame(
            {
                "q_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_id),
                "dist": np.concatenate(out_d),
            }
        )

    local = (
        segments.filter(F.col(key_col).isin(sorted(probed)))
        .groupBy(key_col)
        .applyInPandas(walk, "q_id long, vec_id long, dist double")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "dist")
    )


# ---- worker-side segment serving (r13) -----------------------------------
# The pinned/cold probes ship every probed segment's full payload
# (embeddings + adjacency) through Arrow into the Python walk workers on
# EVERY batch. At 1M×128 that transfer/decode is a ~4.4 s per-batch
# constant the r12 localization experiment proved configs cannot move
# (6 configs shift the wall <7%; the bare segment scan is 0.6 s — see
# bench.py's large_base_1m comment). Serving mode inverts the dataflow:
# the probe ships only the probed (segment_id) list plus the broadcast
# query block, and each Python worker pyarrow-reads its segments'
# files DIRECTLY from the materialized index path, caching the
# decoded arrays in the reused worker process across batches. First
# touch pays one column-pruned parquet read per segment; steady state
# pays zero transfer. Reference analog: hnswlib/faiss serve from a
# resident native structure (/root/reference/dynamic_script_faiss.py:53-57,
# logs/dynamic_updates_hnswlib.txt) — this is the Spark-native
# equivalent, with a byte-capped per-worker LRU instead of a mandatory
# full-residency requirement, so an index larger than worker memory
# degrades to re-reads instead of OOM.
#
# Filesystem scope: the worker reads use local-path pyarrow + os.stat,
# which serves any SHARED POSIX filesystem (NFS/Lustre/local). An
# object-store (s3://) prefix would need the reads routed through
# pyarrow.fs and has no partition-dir mtime — which is why staleness
# keying prefers the _EPOCH sidecar (written by materialize_*, works
# on any store) and falls back to mtime only where the sidecar is
# absent (pre-epoch indexes on POSIX paths).

_SEG_CACHE: dict = {}  # (seg_dir, sid) -> (ids, X_src, nbr_pos, sq_x, bytes)
_SEG_CACHE_LRU: list = []  # keys, least-recent first
_SEG_CACHE_BYTES = [0]

_EPOCH_FILE = "_EPOCH"


def _write_epoch(seg_path: str) -> None:
    """Stamp a freshly (re)materialized segment directory with a unique
    epoch id. The served-mode worker cache keys on this file's CONTENTS,
    so an index rebuilt in place at the same path can never be answered
    from a stale worker cache — including on stores with no directory
    mtime (object stores), where the r13 mtime key was undefined.
    The leading underscore keeps every parquet/Spark reader ignoring it."""
    import uuid

    with open(os.path.join(seg_path, _EPOCH_FILE), "w") as fh:
        fh.write(uuid.uuid4().hex)


def _read_epoch(seg_dir: str) -> str | None:
    """The segment directory's epoch stamp, or None for indexes
    materialized before the epoch discipline (mtime fallback)."""
    try:
        with open(os.path.join(seg_dir, _EPOCH_FILE)) as fh:
            return fh.read().strip() or None
    except OSError:
        return None


# Bounded pool of live probe broadcasts. Every probe call broadcasts its
# (queries, probed-map, codec) block; a long-running served stream (one
# probe per micro-batch) would otherwise accumulate broadcasts for the
# life of the stream (ADVICE r13). Eviction uses unpersist(), NOT
# destroy(): an evicted broadcast still referenced by an in-flight
# concurrent probe (multi_tenant's N client threads) is simply re-sent
# to executors on next access — correctness is unaffected, the worst
# case re-pays one O(nq·dim) transfer.
_PROBE_BC_POOL: list = []
_PROBE_BC_CAP = 16
# probes run from many concurrent tenant/stream threads (the 50-client
# sweep, DynamicBatcher leaders); the append/evict pair must be atomic
# or racing leaders can overshoot the cap (ADVICE r14)
_PROBE_BC_LOCK = threading.Lock()


def _pooled_broadcast(spark, payload):
    bc = spark.sparkContext.broadcast(payload)
    evicted = []
    with _PROBE_BC_LOCK:
        _PROBE_BC_POOL.append(bc)
        while len(_PROBE_BC_POOL) > _PROBE_BC_CAP:
            evicted.append(_PROBE_BC_POOL.pop(0))
    for old in evicted:  # unpersist outside the lock — it can block
        try:
            old.unpersist(False)
        except Exception:
            pass  # sc already stopped / broadcast gone — nothing to free
    return bc


def _seg_cache_cap() -> int:
    """Per-worker decoded-segment cache budget (bytes). Sized so the
    32-thread local mode stays far under box memory even if every
    worker eventually caches disjoint+overlapping segment sets; on a
    real cluster, set to a fraction of executor Python memory."""
    return int(os.environ.get("CS598_SEG_CACHE_MB", "512")) << 20


def _served_segment(
    seg_dir: str,
    key_col: str,
    sid: int,
    id_col: str,
    data_col: str,
    codec_arrs=None,
    epoch: str | None = None,
):
    """Decode one materialized segment into the walk kernel's arrays,
    LRU-cached in this worker process. The payload column is cached in
    its SOURCE dtype — float32 for array<float> layouts (half the
    bytes), int8/int16 for SQ8 code layouts (the compressed-graph
    memory win survives serving) — and upcast/reconstructed to float64
    per walk, which replays the Arrow path's own math exactly, so
    served results are bit-identical to the payload-shipping path.
    `codec_arrs` (mins, ranges) is only used to precompute sq_x over
    the reconstructed values. Staleness: the cache key carries the
    index's `epoch` stamp (the _EPOCH sidecar materialize_* rewrites
    on every overwrite — store-agnostic), falling back to the
    partition directory's mtime for pre-epoch indexes, so an index
    REBUILT in place at the same path can never be served from a stale
    worker cache — the superseded entry just ages out of the LRU."""
    part = os.path.join(seg_dir, f"{key_col}={sid}")
    key = (
        seg_dir,
        int(sid),
        epoch if epoch is not None else os.path.getmtime(part),
    )
    hit = _SEG_CACHE.get(key)
    if hit is not None:
        _SEG_CACHE_LRU.remove(key)
        _SEG_CACHE_LRU.append(key)
        return hit
    import pyarrow.parquet as pq

    tbl = pq.read_table(part, columns=[id_col, data_col, "nbr_ids"])
    ids_raw = tbl.column(id_col).to_numpy()
    c = len(ids_raw)
    emb = tbl.column(data_col).combine_chunks()
    X = emb.flatten().to_numpy(zero_copy_only=False).reshape(c, -1)
    order = np.argsort(ids_raw, kind="stable")
    ids = np.ascontiguousarray(ids_raw[order], dtype=np.int64)
    X = np.ascontiguousarray(X[order])
    nbr = tbl.column("nbr_ids").combine_chunks()
    nflat = nbr.values.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    noff = nbr.offsets.to_numpy()
    # neighbor global-id -> sorted local position; ids absent from the
    # segment (dangling edges after deletes) are masked, as in the
    # Arrow-path to_pos
    p = np.searchsorted(ids, nflat)
    p_clip = np.minimum(p, c - 1)
    valid = ids[p_clip] == nflat
    nbr_pos = [
        p_clip[s:e][valid[s:e]]
        for s, e in ((noff[o], noff[o + 1]) for o in order)
    ]
    X64 = np.ascontiguousarray(X, dtype=np.float64)
    if codec_arrs is not None:
        mns, rngs = codec_arrs
        X64 = mns[None, :] + X64 / 255.0 * rngs[None, :]
    sq_x = np.square(X64).sum(axis=1)
    nbytes = (
        ids.nbytes + X.nbytes + sq_x.nbytes
        + sum(a.nbytes for a in nbr_pos)
    )
    entry = (ids, X, nbr_pos, sq_x, nbytes)
    cap = _seg_cache_cap()
    if nbytes <= cap:
        while _SEG_CACHE_BYTES[0] + nbytes > cap and _SEG_CACHE_LRU:
            old = _SEG_CACHE_LRU.pop(0)
            _SEG_CACHE_BYTES[0] -= _SEG_CACHE.pop(old)[4]
        _SEG_CACHE[key] = entry
        _SEG_CACHE_LRU.append(key)
        _SEG_CACHE_BYTES[0] += nbytes
    return entry


def _walk_served_segments(
    spark,
    seg_dir: str,
    key_col: str,
    probed: dict[int, np.ndarray],
    q_ids: np.ndarray,
    Q: np.ndarray,
    codec,
    k: int,
    beam: int,
    rounds: int,
    n_entry: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Serving-mode probe tail: the plan's input is the tiny probed
    (segment_id) list — ONE int row per probed segment — and the walk
    kernel pulls segment payloads worker-side via `_served_segment`.
    Same query broadcast, same `_beam_walk_block`, same window merge as
    `_walk_probed_segments`; only the payload transport differs. With
    a codec (SQ8 segments) the worker caches the int8 codes — the
    compressed index's 4× memory advantage carries into the serving
    cache — and reconstructs per walk."""
    import pandas as pd

    codec_arrs = (codec.mins, codec.ranges) if codec is not None else None
    data_col = "codes" if codec is not None else vec_col
    bc = _pooled_broadcast(spark, (q_ids, Q, probed, codec_arrs))
    sids = sorted(int(s) for s in probed)
    width = max(1, min(len(sids), 2 * spark.sparkContext.defaultParallelism))
    sdf = spark.createDataFrame([(s,) for s in sids], f"{key_col} int")

    def serve(batches):
        bq_ids, bQ, bprobed, barrs = bc.value
        epoch = _read_epoch(seg_dir)  # once per task, not per segment
        for pdf in batches:
            for sid in pdf[key_col].tolist():
                qsel = bprobed.get(int(sid))
                if qsel is None or len(qsel) == 0:
                    continue
                # a probed centroid with ZERO assigned vectors has no
                # partition directory (open_layered's probed keys come
                # from ALL k-means centroids, and _kmeans_fit never
                # reseeds empty clusters) — skip it like the Arrow
                # path's empty-segment semantics, don't fail the job
                # (ADVICE r13 medium). layered2 keys derive from the
                # assignment itself, so this branch is l1-path-only.
                if not os.path.isdir(os.path.join(seg_dir, f"{key_col}={sid}")):
                    continue
                ids, Xs, nbr_pos, sq_x, _ = _served_segment(
                    seg_dir, key_col, int(sid), id_col, data_col, barrs,
                    epoch=epoch,
                )
                X = np.ascontiguousarray(Xs, dtype=np.float64)
                if barrs is not None:
                    mns, rngs = barrs
                    X = mns[None, :] + X / 255.0 * rngs[None, :]
                out_q, out_id, out_d = _beam_walk_block(
                    ids, X, nbr_pos, sq_x, bQ, bq_ids, qsel,
                    k, beam, rounds, n_entry,
                )
                if out_q:
                    yield pd.DataFrame(
                        {
                            "q_id": np.concatenate(out_q),
                            "vec_id": np.concatenate(out_id),
                            "dist": np.concatenate(out_d),
                        }
                    )

    local = sdf.repartition(width, key_col).mapInPandas(
        serve, "q_id long, vec_id long, dist double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "dist")
    )


def knn_graph_layered(
    index: LayeredGraphIndex,
    queries: DataFrame,
    k: int = DEFAULT_K,
    nprobe: int = 8,
    beam: int = 24,
    rounds: int = 3,
    n_entry: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, rank, vec_id, dist): centroid-pruned per-segment beam walk.
    Top layer scored driver-side (queries and centroids are both
    driver-sized, exactly like knn_ivf); each probed segment walks its
    subgraph for all of its queries inside ONE kernel invocation; a single
    window merges the ≤ nprobe·|Q|·k candidates globally."""
    qpdf = queries.select("q_id", vec_col).toPandas()
    q_ids = qpdf["q_id"].to_numpy(dtype=np.int64)
    Q = np.ascontiguousarray(np.stack(qpdf[vec_col].to_numpy()), dtype=np.float64)
    d2 = (
        np.square(Q).sum(1, keepdims=True)
        - 2.0 * (Q @ index.centroids.T)
        + np.square(index.centroids).sum(1)[None, :]
    )
    nearest = np.argsort(d2, axis=1)[:, : min(nprobe, index.nlist)]
    probed: dict[int, list[int]] = {}
    for j, row in enumerate(nearest):
        for cid in row:
            probed.setdefault(int(cid), []).append(j)
    probed_np = {
        cid: np.asarray(js, dtype=np.int64) for cid, js in probed.items()
    }
    if getattr(index, "serve_dir", None) is not None:
        return _walk_served_segments(
            index.segments.sparkSession,
            index.serve_dir,
            "centroid_id",
            probed_np,
            q_ids,
            Q,
            index.codec,
            k,
            beam,
            rounds,
            n_entry,
            id_col,
            vec_col,
        )
    return _walk_probed_segments(
        index.segments,
        "centroid_id",
        probed_np,
        q_ids,
        Q,
        index.codec,
        k,
        beam,
        rounds,
        n_entry,
        id_col,
        vec_col,
    )


# ---- layered graph over a TWO-LEVEL coarse layer -------------------------
# knn_graph_layered's top layer is a driver-sized centroid matrix — the
# same nlist ceiling flat IVF has, solved for IVF by operators/ivf2. The
# graph index sits on the identical two-level pruner: L1 (driver-sized)
# prunes to nprobe1 cells, ONLY those cells' L2 sub-centroid rows are
# pulled (bounded: nprobe1·nlist2 — never the full L2 matrix), and each
# probed (l1, l2) sub-cell is a graph segment walked by the shared
# kernel. Segment count now scales as nlist1·nlist2 with driver memory
# holding only nlist1 centroids + the probed L2 rows.


class LayeredGraph2Index:
    """Per-(l1,l2)-segment kNN subgraphs over the ivf2 coarse layer."""

    def __init__(
        self,
        segments: DataFrame,  # (segment_id, vec_id, embedding, nbr_ids)
        l1_centroids: np.ndarray,  # (nlist1, dim) — driver-sized by design
        l2_table: DataFrame,  # (l1_id, l2_id, centroid) — stays distributed
        nlist1: int,
        nlist2: int,
        degree: int,
        serve_dir: str | None = None,  # worker-served mode (open_layered2)
    ):
        self.segments = segments
        self.l1_centroids = l1_centroids
        self.l2_table = l2_table
        self.nlist1 = nlist1
        self.nlist2 = nlist2
        self.degree = degree
        self.serve_dir = serve_dir

    def close(self) -> None:
        self.segments.unpersist()


def default_grid2(n: int, target_segment_rows: int = 1024) -> tuple[int, int]:
    """The layered2 coarse-layer sizing rule, IVF's nlist discipline made
    a default instead of folklore (VERDICT r13 item 4): segment COUNT
    scales linearly with n so segment SIZE stays ~target_segment_rows —
    the walk kernel's per-segment compute and the served cache's
    per-entry footprint are then scale-invariant, and recall stops
    being capped by coarse-layer granularity (the measured r13 failure:
    a 32×32 grid correct at 1M capped 4M recall at ~0.92; widening the
    walk bought +0.008 for −33% QPS because the ceiling was the
    LAYER, not the walk — the fix is 64×64, exactly what this rule
    picks). Square grid: nlist1 = nlist2 = ceil-to-even sqrt(n/target),
    keeping the driver-sized L1 at sqrt(#segments) rows (1M → 32×32,
    4M → 64×64, 100× → grows as sqrt on each level, never a
    driver-memory problem)."""
    import math

    n_segments = max(1, n // max(target_segment_rows, 1))
    side = max(2, int(math.ceil(math.sqrt(n_segments))))
    if side % 2:
        side += 1
    return side, side


def build_layered_graph2(
    base: DataFrame,
    nlist1: int | None = 4,
    nlist2: int | None = 4,
    degree: int = 16,
    exact_segment_rows: int = 16_384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = SEED,
) -> LayeredGraph2Index:
    """ivf2 assignment (L2 sub-centroids trained per-cell, never
    driver-collected at build — operators/ivf2.py), then one
    applyInPandas pass builds each (l1,l2) sub-cell's kNN subgraph, and
    the segment table persists hash-partitioned on the composite
    segment id so probes reach the walk kernel exchange-free.

    Pass ``nlist1=None``/``nlist2=None`` to size the coarse layer by
    the default_grid2 rule (segments ∝ n, ~1k rows per segment) — the
    scale-correct default; the explicit 4×4 keeps fixture-scale tests
    and existing callers unchanged."""
    if nlist1 is None or nlist2 is None:
        auto1, auto2 = default_grid2(base.count())
        nlist1 = auto1 if nlist1 is None else nlist1
        nlist2 = auto2 if nlist2 is None else nlist2
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from cs598vectordb_spark.operators.ivf2 import build_ivf2_index

    ivf2 = build_ivf2_index(
        base, nlist1=nlist1, nlist2=nlist2, id_col=id_col, vec_col=vec_col, seed=seed
    )
    n_segments = nlist1 * nlist2
    keyed = ivf2.assigned.withColumn(
        "segment_id", (F.col("l1_id") * nlist2 + F.col("l2_id")).cast("int")
    ).select("segment_id", id_col, vec_col)
    vec_type = base.schema[vec_col].dataType
    out_schema = StructType(
        [
            StructField("segment_id", IntegerType()),
            StructField(id_col, LongType()),
            StructField(vec_col, vec_type),
            StructField("nbr_ids", ArrayType(LongType())),
        ]
    )

    def seg_graph(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.ascontiguousarray(np.stack(pdf[vec_col].to_numpy()), dtype=np.float64)
        if len(ids) <= 1:
            nbrs = [np.array([], dtype=np.int64)] * len(ids)
        elif len(ids) <= exact_segment_rows:
            nbrs, _ = _local_knn_graph(X, ids, degree)
        else:
            nbrs, _ = _local_partitioned_graph(X, ids, degree)
        return pd.DataFrame(
            {
                "segment_id": pdf["segment_id"],
                id_col: ids,
                vec_col: pdf[vec_col],
                "nbr_ids": nbrs,
            }
        )

    segments = (
        keyed.groupBy("segment_id")
        .applyInPandas(seg_graph, out_schema)
        .repartition(n_segments, "segment_id")
        .persist()
    )
    segments.count()
    ivf2.assigned.unpersist()  # the graph segments supersede the raw assignment
    return LayeredGraph2Index(
        segments, ivf2.l1_centroids, ivf2.l2_table, nlist1, nlist2, degree
    )


def knn_graph_layered2(
    index: LayeredGraph2Index,
    queries: DataFrame,
    k: int = DEFAULT_K,
    nprobe1: int = 2,
    nprobe2: int = 6,
    beam: int = 24,
    rounds: int = 3,
    n_entry: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, rank, vec_id, dist): hierarchical graph probe. L1 scored on
    the driver (nlist1 GEMM over the driver-sized coarse layer), the
    probed cells' L2 rows pulled from the DISTRIBUTED L2 table (bounded
    collect: nprobe1·nlist2 rows — the full centroid matrix never
    reaches the driver, unlike knn_graph_layered's top layer), the best
    nprobe2 sub-cells per query walked by the shared segment kernel, one
    window merge. Same plan tail as knn_graph_layered."""
    qpdf = queries.select("q_id", vec_col).toPandas()
    q_ids = qpdf["q_id"].to_numpy(dtype=np.int64)
    Q = np.ascontiguousarray(np.stack(qpdf[vec_col].to_numpy()), dtype=np.float64)
    nq = len(q_ids)
    C1 = index.l1_centroids
    d1 = (
        np.square(Q).sum(1, keepdims=True)
        - 2.0 * (Q @ C1.T)
        + np.square(C1).sum(1)[None, :]
    )
    np1 = min(nprobe1, index.nlist1)
    cells = np.argsort(d1, axis=1)[:, :np1]
    cell_set = sorted({int(c) for row in cells for c in row})
    l2 = (
        index.l2_table.filter(F.col("l1_id").isin(cell_set))
        .select("l1_id", "l2_id", "centroid")
        .collect()
    )
    keys = np.array(
        [r["l1_id"] * index.nlist2 + r["l2_id"] for r in l2], dtype=np.int64
    )
    C2 = np.ascontiguousarray(
        np.stack([np.asarray(r["centroid"]) for r in l2]), dtype=np.float64
    )
    d2 = (
        np.square(Q).sum(1, keepdims=True)
        - 2.0 * (Q @ C2.T)
        + np.square(C2).sum(1)[None, :]
    )
    cell_ok = np.zeros((nq, len(l2)), dtype=bool)
    row_cell = keys // index.nlist2
    for j in range(nq):
        cell_ok[j] = np.isin(row_cell, cells[j])
    d2[~cell_ok] = np.inf
    np2 = min(nprobe2, len(l2))
    order = np.argsort(d2, axis=1)[:, :np2]
    probed: dict[int, list[int]] = {}
    for j in range(nq):
        for key in keys[order[j]][np.isfinite(d2[j, order[j]])]:
            probed.setdefault(int(key), []).append(j)
    probed_np = {
        key: np.asarray(js, dtype=np.int64) for key, js in probed.items()
    }
    if index.serve_dir is not None:
        return _walk_served_segments(
            index.segments.sparkSession,
            index.serve_dir,
            "segment_id",
            probed_np,
            q_ids,
            Q,
            None,
            k,
            beam,
            rounds,
            n_entry,
            id_col,
            vec_col,
        )
    return _walk_probed_segments(
        index.segments,
        "segment_id",
        probed_np,
        q_ids,
        Q,
        None,
        k,
        beam,
        rounds,
        n_entry,
        id_col,
        vec_col,
    )


def knn_graph_layered2_filtered(
    index: LayeredGraph2Index,
    queries: DataFrame,
    allowed: DataFrame,
    k: int = DEFAULT_K,
    expand: int = 4,
    max_deepen: int = 2,
    nprobe1: int = 2,
    nprobe2: int = 6,
    beam: int = 24,
    rounds: int = 3,
    n_entry: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Attribute-FILTERED approximate search on the served graph:
    (q_id, rank, vec_id, dist) where every returned vec_id is a member
    of `allowed` (a DataFrame of allowed ids — the caller builds
    ``base.filter(pred).select(id_col)`` so the predicate pushes down
    to the parquet scan and only matching row groups are read).

    Post-filter-with-expansion, the strategy production vector stores
    use at moderate selectivity (Milvus/Qdrant post-filter mode; the
    pre-filter bitmap alternative needs per-segment filter columns and
    only wins at extreme selectivity): probe the graph for k·expand
    candidates, keep the ones passing the predicate via a
    broadcast-candidates semi join (candidates are driver-sized
    |Q|·k·expand id/dist rows — the big side stays the pruned `allowed`
    scan), then ADAPTIVELY DEEPEN only the queries left short of k
    (expand ×4, nprobe2 ×2, beam ×2 per round, ≤ max_deepen rounds) —
    a query whose filtered neighborhood is sparse pays more probe work
    instead of silently returning < k rows. Queries short even after
    deepening return what exists (the filtered base may simply hold
    fewer than k matches), same contract as the exact `knn_filtered`.

    Scale shape: each round is one graph probe (partition-pruned
    segments) + one broadcast join against a predicate-pushed scan; no
    shuffle grows with base size. Per-round passed rows are
    localCheckpointed (ids+dists only, driver-sized bound) so the
    final union does not recompute earlier rounds' probes.

    Rows-only by nature (approximate); recall-vs-exact-filtered floor,
    predicate purity, and the deepening trigger are pinned in
    tests/test_index.py::test_knn_filtered_adaptive. Reference analog:
    the reference filters only the EXACT path (its harness has no
    filtered-ANN); this is the served-index counterpart of
    queries_vector.q_knn_filtered, and the adaptive upgrade over the
    fixed-expansion queries_index.q_knn_graph2_filtered."""
    allowed_ids = allowed.select(F.col(id_col).alias("vec_id"))
    remaining = queries
    # deepening must widen BOTH coarse levels: nprobe2/beam alone cap
    # coverage at nprobe1·nlist2 sub-cells, and a sparse filtered
    # neighborhood's survivors may live outside the round-0 L1 cells
    cfg = dict(nprobe1=nprobe1, nprobe2=nprobe2, beam=beam)
    kk = max(k * expand, k)
    frames: list[DataFrame] = []
    for depth in range(max_deepen + 1):
        cand = knn_graph_layered2(
            index, remaining, k=kk, nprobe1=cfg["nprobe1"],
            nprobe2=cfg["nprobe2"], beam=cfg["beam"], rounds=rounds,
            n_entry=n_entry, id_col=id_col, vec_col=vec_col,
        ).select("q_id", "vec_id", "dist")
        passed = allowed_ids.join(
            F.broadcast(cand), "vec_id"
        ).select("q_id", "vec_id", "dist").localCheckpoint(eager=True)
        frames.append(passed)
        if depth == max_deepen:
            break
        counts = {
            r["q_id"]: r["n"]
            for r in passed.groupBy("q_id").agg(F.count("*").alias("n")).collect()
        }
        short = [
            r["q_id"]
            for r in remaining.select("q_id").collect()
            if counts.get(r["q_id"], 0) < k
        ]
        if not short:
            break
        remaining = remaining.filter(F.col("q_id").isin([int(q) for q in short]))
        kk *= 4
        cfg = dict(
            nprobe1=cfg["nprobe1"] * 2,
            nprobe2=cfg["nprobe2"] * 4,  # sub-cells grow with both levels
            beam=cfg["beam"] * 2,
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    w = Window.partitionBy("q_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        out.dropDuplicates(["q_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "dist")
    )


def autotune_layered2(
    index: LayeredGraph2Index,
    queries: DataFrame,
    truth: DataFrame,
    target_recall: float = 0.9,
    k: int = DEFAULT_K,
    grid: list[tuple[int, int, int]] | None = None,
) -> tuple[dict, list[dict]]:
    """T4 for the engine's best index: sweep (nprobe1, nprobe2, beam) on
    one built layered2 graph, score recall against the exact oracle, and
    return the cheapest config clearing the target — the missing sibling
    of autotune_ivf2 (the weaker LSH/IVF/ivf2 paths all had sweeps while
    the index of record did not).

    Cost model: selectivity (fraction of sub-cells a query may touch,
    capped at nprobe1·nlist2 reachable through the L1 prune) is the
    dominant term — it bounds bytes scanned, which is what matters at
    100 TB — with beam as the tie-breaker (per-segment walk compute).
    Deterministic: the walk kernel is seed-free (entry points are the
    best-scored n_entry vertices), so the trace is reproducible on a
    fixed index.

    Reference analog: MRPT autotunes to a recall target on a sample,
    /root/reference/dynamic_script_mrpt.py:44-47
    (`build_autotune_sample(0.9, 10)`)."""
    from cs598vectordb_spark.operators.metrics import recall_at_k

    grid = grid or [
        (1, 3, 16),
        (2, 4, 16),
        (2, 6, 24),
        (2, 8, 24),
        (3, 8, 32),
        (4, 12, 32),
    ]
    n_segments = index.nlist1 * index.nlist2
    trace, best = [], None
    for np1, np2, beam in grid:
        rec = recall_at_k(
            knn_graph_layered2(index, queries, k, nprobe1=np1, nprobe2=np2, beam=beam),
            truth,
            k,
        ).collect()[0][0]
        entry = {
            "nprobe1": np1,
            "nprobe2": np2,
            "beam": beam,
            "recall": rec,
            "selectivity": round(
                min(np2, np1 * index.nlist2, n_segments) / n_segments, 4
            ),
        }
        trace.append(entry)
        if rec >= target_recall and (
            best is None
            or (entry["selectivity"], entry["beam"])
            < (best["selectivity"], best["beam"])
        ):
            best = entry
    return best or {}, trace


def delete_from_layered2(
    index: LayeredGraph2Index,
    keep: DataFrame,
    id_col: str = "vec_id",
    dropped: DataFrame | None = None,
) -> LayeredGraph2Index:
    """Hierarchical-index delete, same tombstone semantics as
    delete_from_layered (dangling edges masked by the walk kernel).

    Two physical strategies (r15): when the caller passes the DROPPED
    ids (dynamic workloads always know them — the delete is specified
    by what goes, not what stays), the delete is a broadcast anti-join:
    the id set ships to the executors (|dropped|·8 B — 20 MB for a
    10M-base 25% delete) and the 10-GB segment table is filtered IN
    PLACE with ZERO exchanges, keeping its existing segment
    partitioning (a filter preserves partitioning, so the old
    repartition pass is dropped too). Without `dropped` the r14 form
    remains: a shuffle semi-join against `keep` + repartition — the
    right plan when only the survivor set is known or the dropped set
    is itself table-sized. The IVF-PQ family made the same move in r14
    (broadcast tombstones, operators/ivfpq.py:delete_from_ivfpq);
    value-equality of the two strategies is pinned in
    tests/test_index.py::test_delete_layered2_broadcast_matches_semi."""
    if dropped is not None:
        segs = (
            index.segments.join(
                F.broadcast(dropped.select(id_col)), id_col, "anti"
            ).persist()
        )
    else:
        segs = (
            index.segments.join(keep.select(id_col), id_col, "semi")
            .repartition(index.nlist1 * index.nlist2, "segment_id")
            .persist()
        )
    segs.count()
    return LayeredGraph2Index(
        segs, index.l1_centroids, index.l2_table, index.nlist1, index.nlist2, index.degree
    )


def insert_into_layered2(
    index: LayeredGraph2Index,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> LayeredGraph2Index:
    """Hierarchical-index insert with NO driver-sized assignment STEP:
    L1 cells come from the broadcast (driver-sized by design) coarse
    layer; the L2 sub-cell of each arrival is picked by a join against
    the L2 table — BROADCAST while the segment count stays bounded
    (≤200k segments ≈ 100 MB of centroids, a pass-through broadcast,
    not a driver-resident scoring step), distributed shuffle join past
    that — followed by a map-side min_by partial aggregate, so the
    |delta|·nlist2 scored candidate set never crosses an exchange
    (the r14 row_number-window form shuffled all of it and was the
    superlinear term in the measured 10M insert-repair wall). Touched
    segments then run the same shared repair kernel as the flat
    layered index."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = delta.sparkSession
    C1 = index.l1_centroids
    bc = spark.sparkContext.broadcast(C1)

    def assign_l1(batches):
        Cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                np.square(B).sum(1, keepdims=True)
                - 2.0 * (B @ Cb.T)
                + np.square(Cb).sum(1)[None, :]
            )
            yield pdf.assign(l1_id=d2.argmin(axis=1).astype(np.int32))

    a1 = delta.select(id_col, vec_col).mapInPandas(
        assign_l1,
        StructType(
            list(delta.select(id_col, vec_col).schema.fields)
            + [StructField("l1_id", IntegerType())]
        ),
    )
    # L2 pick: distributed join against the (l1-pruned) sub-centroid
    # rows. BROADCAST the l2 table while bounded (nlist1·nlist2 centroid
    # rows — ~10 MB at 10k segments, ~100 MB at the 200k gate below;
    # past it the code falls back to a shuffle join) and reduce with a
    # map-side min_by partial aggregate. The r14 form ranked with a
    # row_number window, which
    # SHUFFLED the full |delta|·nlist2 exploded candidate set (at 10M:
    # 2.5M arrivals × 100 sub-cells × 1 KB vector rows ≈ 250 GB through
    # one sort exchange — the superlinear term in the measured
    # insert-repair wall, since nlist2 grows as N^(1/4) under the grid
    # rule); the broadcast join keeps every candidate row inside its
    # arrival's task and the partial aggregate collapses them to one
    # row per arrival BEFORE any exchange, so shuffle bytes are
    # O(|delta|) at every N. Tie-break (min _d2, then min l2_id) via
    # lexicographic struct ordering — identical to the window's.
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("centroid"),
            lambda x, y: (x - y) * (x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    l2_rel = (
        F.broadcast(index.l2_table)
        if index.nlist1 * index.nlist2 <= 200_000
        else index.l2_table
    )
    assigned_delta = (
        a1.join(l2_rel, "l1_id")
        .withColumn("_d2", d2)
        .groupBy(F.col(id_col))
        .agg(
            F.min_by(
                F.struct(F.col("l1_id"), F.col("l2_id"), F.col(vec_col)),
                F.struct(F.col("_d2"), F.col("l2_id")),
            ).alias("_best")
        )
        .select(
            (F.col("_best.l1_id") * index.nlist2 + F.col("_best.l2_id"))
            .cast("int")
            .alias("segment_id"),
            F.col(id_col),
            F.col(f"_best.{vec_col}").alias(vec_col),
            F.lit(None).cast("array<bigint>").alias("nbr_ids"),
        )
        .select(*index.segments.schema.fieldNames())
        # persisted: the r14 form evaluated the assignment twice (once
        # for the touched-segment collect, once in the repair pass)
        .persist()
    )
    repair = _make_repair_kernel(id_col, vec_col, index.degree, None)
    touched = [
        int(r[0]) for r in assigned_delta.select("segment_id").distinct().collect()
    ]
    untouched = index.segments.filter(~F.col("segment_id").isin(touched))
    repaired = (
        index.segments.filter(F.col("segment_id").isin(touched))
        .unionByName(assigned_delta)
        .groupBy("segment_id")
        .applyInPandas(repair, index.segments.schema)
    )
    segs = (
        untouched.unionByName(repaired)
        .repartition(index.nlist1 * index.nlist2, "segment_id")
        .persist()
    )
    segs.count()
    assigned_delta.unpersist()
    # superseded version released by callers via close()
    return LayeredGraph2Index(
        segs, C1, index.l2_table, index.nlist1, index.nlist2, index.degree
    )


def materialize_layered(index: LayeredGraphIndex, path: str) -> LayeredGraphIndex:
    """Persist the layered index to parquet (segments PARTITIONED BY
    centroid_id + a small centroid sidecar table) and re-open it — the
    engine's analog of faiss.write_index/read_index
    (/root/reference/dynamic_script_faiss.py builds in-process; Milvus
    persists per-segment indexes, which is the shape stored here). Lets
    an index outlive the session that built it."""
    spark = index.segments.sparkSession
    index.segments.write.mode("overwrite").partitionBy("centroid_id").parquet(
        os.path.join(path, "segments")
    )
    _write_epoch(os.path.join(path, "segments"))
    # plain-Python rows + explicit schema: no type inference and no Arrow
    # dependency (ndarray cells crash the non-Arrow inference fallback if
    # the session's Arrow conversion is degraded for any reason)
    mins = None if index.codec is None else [float(x) for x in index.codec.mins]
    rngs = None if index.codec is None else [float(x) for x in index.codec.ranges]
    rows = [
        (i, [float(x) for x in index.centroids[i]], index.nlist, index.degree, mins, rngs)
        for i in range(index.nlist)
    ]
    spark.createDataFrame(
        rows,
        "centroid_id long, centroid array<double>, nlist int, degree int, "
        "codec_mins array<double>, codec_ranges array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    return open_layered(spark, path)


def open_layered(spark, path: str, served: bool = False) -> LayeredGraphIndex:
    """Re-open a materialized layered index. The one-time repartition on
    centroid_id restores the hash partitioning the walk kernel's
    exchange-free plan relies on (parquet scans do not advertise a
    partitioning); after the persist, probes are identical to a
    freshly built index.

    ``served=True`` opens in WORKER-SERVED mode (see open_layered2):
    probes ship only the probed centroid-id list and workers
    pyarrow-read + LRU-cache their segments from this path. For an SQ8
    index the worker cache holds the int8 CODES — the compressed
    index's 4× memory advantage carries into serving — and the walk
    reconstructs per batch; results are bit-identical to the pinned
    probe either way (pinned in tests/test_index.py::
    test_graph_sq8_served_matches_pinned)."""
    meta = spark.read.parquet(os.path.join(path, "centroids"))
    rows = meta.orderBy("centroid_id").collect()
    centroids = np.ascontiguousarray(
        np.stack([np.asarray(r["centroid"]) for r in rows]), dtype=np.float64
    )
    nlist, degree = int(rows[0]["nlist"]), int(rows[0]["degree"])
    codec = None
    if rows[0]["codec_mins"] is not None:
        from cs598vectordb_spark.operators.sq import SqCodec

        codec = SqCodec(
            np.asarray(rows[0]["codec_mins"], dtype=np.float64),
            np.asarray(rows[0]["codec_ranges"], dtype=np.float64),
        )
    segs = spark.read.parquet(os.path.join(path, "segments"))
    if served:
        return LayeredGraphIndex(
            segs, centroids, nlist, degree, codec,
            serve_dir=os.path.join(path, "segments"),
        )
    segs = segs.repartition(nlist, "centroid_id").persist()
    segs.count()
    return LayeredGraphIndex(segs, centroids, nlist, degree, codec)


# ---- incremental maintenance of the layered index ------------------------
# The reference's core dynamic experiment is graph-index degradation under
# delete/re-insert: FAISS HNSW can only tombstone, NGT stalls for minutes
# after inserts (dynamic_script_faiss.py:75-117;
# logs/dynamic_updates_ngt.txt:10-13). The layered index maintains itself
# WITHOUT a global rebuild:
#
#   delete — drop the rows from their segments; edges INTO deleted nodes
#            dangle and the walk kernel masks them (quality decays with
#            delete volume, the honest HNSW-tombstone behavior);
#   insert — assign the delta to segments, then ONE repair kernel per
#            affected segment: new nodes get exact edges (GEMM new×seg),
#            existing nodes merge the new nodes into their candidate pool
#            (GEMM old×new + recomputed survivor edges) — the classic
#            incremental-graph insert, cost |delta|·|seg|, never |seg|².
#
# Centroids are intentionally left untouched: incremental maintenance
# serves reads between periodic full rebuilds, exactly the
# serve-while-rebuild split dynamic_overlap measures.


def _make_repair_kernel(id_col: str, data_col: str, degree: int, codec_arrs):
    """Per-segment repair kernel shared by every layered variant (the
    grouping key column rides through untouched): (a) new nodes get
    exact top-degree edges, (b) existing nodes re-rank surviving old
    edges merged with the arrivals, (c) dangling edges from earlier
    deletes drop, (d) nodes left under-degree backfill from surviving
    neighbors' 2-hop neighborhoods so degree does not erode across
    cycles. With codec_arrs set, ranking happens in reconstructed-float
    space — the same space the walk kernel scores probes in."""
    import pandas as pd

    def repair(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.ascontiguousarray(np.stack(pdf[data_col].to_numpy()), dtype=np.float64)
        if codec_arrs is not None:
            mns, rngs = codec_arrs
            X = mns[None, :] + X / 255.0 * rngs[None, :]
        c = len(ids)
        is_new = pdf["nbr_ids"].isna().to_numpy()
        new_pos = np.flatnonzero(is_new)
        if len(new_pos) == 0:
            return pdf
        if c <= 1:
            # a lone arrival in an (emptied) cell has no neighbors —
            # materialize the EMPTY list, never a NULL: a null row
            # written into the segment parquet crashed the pinned walk
            # at 10M (10k segments make tiny fully-deleted cells real)
            empty = np.array([], dtype=np.int64)
            return pdf.assign(
                nbr_ids=[v if v is not None else empty for v in pdf["nbr_ids"]]
            )
        k_eff = min(degree, c - 1)

        def pair_d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
            diff = X[a] - X[b]
            return np.einsum("ij,ij->i", diff, diff)

        from cs598vectordb_spark.operators.knn import squared_l2_block

        # (a) new nodes: exact edges against the whole segment
        d_new = squared_l2_block(X, X[new_pos])  # c × |new|
        d_new[new_pos, np.arange(len(new_pos))] = np.inf
        nbrs_out: list[np.ndarray] = [None] * c  # type: ignore[list-item]
        for j, p in enumerate(new_pos):
            col = d_new[:, j]
            part = np.argpartition(col, k_eff - 1)[:k_eff]
            order = np.lexsort((ids[part], col[part]))
            nbrs_out[p] = ids[part[order]].astype(np.int64)

        def to_pos(global_ids: np.ndarray) -> np.ndarray:
            p = np.minimum(np.searchsorted(ids, global_ids), c - 1)
            return p[ids[p] == global_ids]

        old_lists = pdf["nbr_ids"]
        ol = old_lists.to_numpy()  # object array: cheap per-row access
        exist_pos = np.flatnonzero(~is_new)
        # one flat searchsorted over every old edge beats 750 per-node
        # to_pos calls (pandas .iloc + small-array overhead dominated
        # the first vectorization attempt's profile)
        lens = np.fromiter(
            (len(ol[p]) for p in exist_pos), dtype=np.int64, count=len(exist_pos)
        )
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(ol[p], dtype=np.int64) for p in exist_pos]
            )
            fpos = np.minimum(np.searchsorted(ids, flat), c - 1)
            fok = ids[fpos] == flat
            bounds = np.concatenate([[0], np.cumsum(lens)])
            ops = {
                int(p): fpos[bounds[i]: bounds[i + 1]][fok[bounds[i]: bounds[i + 1]]]
                for i, p in enumerate(exist_pos)
            }
        else:
            ops = {int(p): np.array([], dtype=np.int64) for p in exist_pos}

        # (b) fast path, VECTORIZED (the per-node python loop was ~1/3
        # of the measured 1M insert wall): a node with >= k_eff
        # surviving edges never backfills, and its candidate set is
        # exactly (surviving old edges ∪ all arrivals) minus self —
        # old-edge copies of a REINSERTED id (to_pos resolves a
        # dangling edge to the arrival's new row) collapse under the
        # original np.unique, reproduced here by masking the old copy
        # (the arrival block already carries that candidate). Distances
        # become two batched blocks instead of per-node pair_d calls;
        # ranking is one per-row lexsort over (dist, id) — the
        # original's exact ordering. Rows that lose candidates to
        # dedup/self below k_eff fall back to the reference loop.
        slow: list[int] = []
        # fast requires no backfill (>= k_eff surviving edges) and a
        # dup-free old list (the reference np.unique dedups; the matrix
        # form would not) — the dup check runs vectorized on the padded
        # matrix (one sort + adjacent compare, ignoring the -1 pads)
        fast0 = [int(p) for p in exist_pos if len(ops[int(p)]) >= k_eff]
        rest = [int(p) for p in exist_pos if len(ops[int(p)]) < k_eff]
        fast = []
        if fast0:
            w1 = max(len(ops[p]) for p in fast0)
            OP0 = np.full((len(fast0), w1), -1, dtype=np.int64)
            for i, p in enumerate(fast0):
                op = ops[p]
                OP0[i, : len(op)] = op
            S = np.sort(OP0, axis=1)
            has_dup = ((S[:, 1:] == S[:, :-1]) & (S[:, 1:] >= 0)).any(axis=1)
            fast = [p for p, d in zip(fast0, has_dup) if not d]
            rest += [p for p, d in zip(fast0, has_dup) if d]
        if fast:
            fastA = np.asarray(fast, dtype=np.int64)
            w1 = max(len(ops[int(p)]) for p in fast)
            OP = np.full((len(fast), w1), -1, dtype=np.int64)
            for i, p in enumerate(fast):
                op = ops[int(p)]
                OP[i, : len(op)] = op
            pad = OP < 0
            OPc = np.where(pad, 0, OP)
            diff = X[OPc] - X[fastA][:, None, :]
            D_old = np.einsum("ijk,ijk->ij", diff, diff)
            dead = pad | (OPc == fastA[:, None]) | is_new[OPc]
            D_old[dead] = np.inf
            from cs598vectordb_spark.operators.knn import squared_l2_block

            D_new = squared_l2_block(X[fastA], X[new_pos])
            D = np.concatenate([D_old, D_new], axis=1)
            I_old = np.where(dead, np.iinfo(np.int64).max, ids[OPc])
            I_new = np.broadcast_to(ids[new_pos], (len(fast), len(new_pos)))
            I = np.concatenate([I_old, I_new], axis=1)
            n_valid = (~np.isinf(D)).sum(axis=1)
            order = np.lexsort((I, D), axis=-1)[:, :k_eff]
            sel_ids = np.take_along_axis(I, order, axis=1)
            for i, p in enumerate(fast):
                if n_valid[i] < k_eff:
                    slow.append(int(p))  # dedup/self shrank the set
                    continue
                nbrs_out[p] = sel_ids[i].astype(np.int64)

        # (d) reference path: under-degree nodes (2-hop backfill),
        # dup-edged nodes, and the rare dedup-shrunken fast rows
        for p in rest + slow:
            op = ops[int(p)]
            parts = [op, new_pos]
            if len(op) < k_eff:  # (d) 2-hop backfill
                for qpos in op:
                    two_hop = ol[qpos]
                    if two_hop is not None and not is_new[qpos]:
                        parts.append(to_pos(np.asarray(two_hop, dtype=np.int64)))
            cand = np.unique(np.concatenate(parts))
            cand = cand[cand != p]
            if len(cand) == 0:
                nbrs_out[p] = np.array([], dtype=np.int64)
                continue
            cd = pair_d(np.full(len(cand), p), cand)
            sel = np.lexsort((ids[cand], cd))[: min(k_eff, len(cand))]
            nbrs_out[p] = ids[cand[sel]].astype(np.int64)
        out = {f: pdf[f] for f in pdf.columns if f != "nbr_ids"}
        out["nbr_ids"] = nbrs_out
        return pd.DataFrame(out)

    return repair


def delete_from_layered(index: LayeredGraphIndex, keep: DataFrame, id_col: str = "vec_id") -> LayeredGraphIndex:
    """New index serving only ids present in `keep` (the post-delete
    snapshot). One semi-join + repartition of the INDEX table — bounded by
    index size, no distance computation, no k-means. Dangling edges stay
    until the next insert repair or full rebuild."""
    segs = (
        index.segments.join(keep.select(id_col), id_col, "semi")
        .repartition(index.nlist, "centroid_id")
        .persist()
    )
    segs.count()
    # the OLD index stays persisted on purpose: in overlap mode it is
    # still serving probes while this maintenance runs in the background;
    # once the new version is recorded as serving, callers release it
    # via close() (dynamic_protocol does this per maintenance step)
    return LayeredGraphIndex(
        segs, index.centroids, index.nlist, index.degree, index.codec
    )


def insert_into_layered(
    index: LayeredGraphIndex,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> LayeredGraphIndex:
    """New index with `delta` rows inserted and their segments repaired.
    Delta rows are centroid-assigned with the same broadcast kernel as the
    builder; each affected segment then runs one repair kernel that (a)
    gives every new node exact top-degree edges, (b) re-ranks every
    existing node's neighborhood against the new arrivals, (c) drops
    edges left dangling by earlier deletes, and (d) BACKFILLS any node
    the dangling drops left under-degree from its surviving neighbors'
    neighborhoods — without (d), degree shrinks monotonically across
    repeated delete/insert cycles and graph quality silently erodes over
    long W2 sweeps even though each single cycle's recall holds.

    Compressed (SQ8) segments insert too: arrivals are encoded with the
    index's frozen codec and the repair kernel ranks in
    reconstructed-float space — the same space the walk kernel scores,
    so edges and probe distances stay consistent. (The codec itself is
    NOT retrained; out-of-range arrival coordinates clamp, the honest
    drift cost until the next periodic rebuild. The reference inserts
    into every backend it benchmarks — dynamic_script_faiss.py:108,
    dynamic_script_ngt.py:113-115.)"""
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    spark = delta.sparkSession
    degree = index.degree
    codec = index.codec
    C = index.centroids
    bc = spark.sparkContext.broadcast(C)

    def assign(batches):
        Cb = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            B = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                np.square(B).sum(1, keepdims=True)
                - 2.0 * (B @ Cb.T)
                + np.square(Cb).sum(1)[None, :]
            )
            yield pdf.assign(centroid_id=d2.argmin(axis=1).astype(np.int32))

    out_schema = index.segments.schema  # float or compressed layout
    data_col = vec_col if codec is None else "codes"
    assigned_f = delta.select(id_col, vec_col).mapInPandas(
        assign,
        StructType(
            list(delta.select(id_col, vec_col).schema.fields)
            + [StructField("centroid_id", IntegerType())]
        ),
    )
    if codec is not None:
        from cs598vectordb_spark.operators.sq import sq_encode

        assigned_f = sq_encode(
            assigned_f, codec, vec_col=vec_col, id_col=id_col,
            extra_cols=["centroid_id"],
        )
    assigned_delta = assigned_f.withColumn(
        "nbr_ids", F.lit(None).cast("array<bigint>")
    ).select(*out_schema.fieldNames())
    codec_arrs = (codec.mins, codec.ranges) if codec is not None else None
    repair = _make_repair_kernel(id_col, data_col, degree, codec_arrs)

    touched = [
        int(r[0]) for r in assigned_delta.select("centroid_id").distinct().collect()
    ]
    untouched = index.segments.filter(~F.col("centroid_id").isin(touched))
    repaired = (
        index.segments.filter(F.col("centroid_id").isin(touched))
        .unionByName(assigned_delta)
        .groupBy("centroid_id")
        .applyInPandas(repair, out_schema)
    )
    segs = (
        untouched.unionByName(repaired)
        .repartition(index.nlist, "centroid_id")
        .persist()
    )
    segs.count()
    # superseded index intentionally left persisted (may still be
    # serving in overlap mode) — callers release it via close()
    return LayeredGraphIndex(segs, C, index.nlist, degree, codec)


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


def materialize_layered2(
    index: LayeredGraph2Index, path: str, pinned: bool = True
) -> LayeredGraph2Index:
    """Persist the hierarchical index to parquet and re-open it — the
    layered2 sibling of materialize_layered (reference analog:
    faiss.write_index/read_index; Milvus persists per-segment indexes,
    /root/reference/dynamic_script_milvus.py:76-82). Three artifacts:
    segments PARTITIONED BY segment_id, the DISTRIBUTED L2 centroid
    table (never driver-collected — the property that lets segment
    count exceed any driver-sized top layer), and a driver-sized L1
    sidecar (nlist1 rows by design). `pinned` picks the re-open mode
    (see open_layered2) — pass False when the caller wants the
    cold-serving relation, so the write path never shuffles/persists a
    full cached copy it is not going to use."""
    spark = index.segments.sparkSession
    index.segments.write.mode("overwrite").partitionBy("segment_id").parquet(
        os.path.join(path, "segments")
    )
    _write_epoch(os.path.join(path, "segments"))
    index.l2_table.write.mode("overwrite").parquet(os.path.join(path, "l2"))
    rows = [
        (
            i,
            [float(x) for x in index.l1_centroids[i]],
            index.nlist1,
            index.nlist2,
            index.degree,
        )
        for i in range(index.nlist1)
    ]
    spark.createDataFrame(
        rows,
        "l1_id long, centroid array<double>, nlist1 int, nlist2 int, degree int",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "l1"))
    return open_layered2(spark, path, pinned=pinned)


def open_layered2(
    spark, path: str, pinned: bool = True, served: bool = False
) -> LayeredGraph2Index:
    """Re-open a materialized layered2 index: L1 sidecar to the driver
    (nlist1 rows), L2 table stays a distributed relation.

    Three serving modes for the segment table:

    * ``pinned=True`` (default) — one-time repartition on segment_id +
      persist, so every subsequent probe's groupBy is exchange-free.
      The right mode when the index FITS executor storage and serves
      many batches (the resident-index regime, like hnswlib holding
      the graph in RAM). Still pays the Arrow payload transfer into
      the Python walk workers per batch.
    * ``pinned=False`` — the raw partitioned-parquet relation. A probe
      then PARTITION-PRUNES the scan to the probed segment_ids
      (segments/segment_id=K/ directories) and shuffles only those
      rows into the walk kernel. The larger-than-memory mode: an index
      bigger than cluster storage is touched only where the probe list
      points — executed scan rows measured in bench detail
      (probe_scan_rows), plan shape pinned in tests/test_plans.py.
    * ``served=True`` — worker-side segment serving: the probe plan's
      input is the tiny probed (segment_id) list and Python workers
      pyarrow-read + LRU-cache their segments' decoded arrays straight
      from this path (see the serving-mode comment above
      `_served_segment`). The high-QPS repeated-batch mode: steady
      state ships zero payload per batch. Results are identical across
      all three modes (same kernel, same rows — pinned in
      tests/test_index.py)."""
    meta = spark.read.parquet(os.path.join(path, "l1"))
    rows = meta.orderBy("l1_id").collect()
    l1 = np.ascontiguousarray(
        np.stack([np.asarray(r["centroid"]) for r in rows]), dtype=np.float64
    )
    nlist1, nlist2, degree = (
        int(rows[0]["nlist1"]),
        int(rows[0]["nlist2"]),
        int(rows[0]["degree"]),
    )
    # NOT persisted on purpose: an A/B at 1M measured the per-probe L2
    # parquet re-scan (nlist1·nlist2 rows, page-cached) as indistin-
    # guishable from a pinned copy (2.10 vs 2.16 s med-3 same-session),
    # so the open stays side-effect-free
    l2 = spark.read.parquet(os.path.join(path, "l2"))
    segs = spark.read.parquet(os.path.join(path, "segments"))
    serve_dir = os.path.join(path, "segments") if served else None
    if pinned and not served:
        segs = segs.repartition(nlist1 * nlist2, "segment_id").persist()
        segs.count()
    return LayeredGraph2Index(segs, l1, l2, nlist1, nlist2, degree, serve_dir)
