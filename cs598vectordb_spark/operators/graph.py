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

import os

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
    ):
        self.segments = segments  # (centroid_id, vec_id, embedding|codes, nbr_ids)
        self.centroids = centroids
        self.nlist = nlist
        self.degree = degree
        self.codec = codec  # operators.sq.SqCodec or None


def _local_knn_graph(X: np.ndarray, ids: np.ndarray, degree: int) -> list[np.ndarray]:
    """Exact per-segment kNN adjacency (global ids), ties broken by id.
    Cost is |seg|² GEMM — right up to ~50k-row segments; beyond that the
    builder falls back to NN-descent rounds (same proposals as the flat
    builder, numpy-local instead of join-based)."""
    from cs598vectordb_spark.operators.knn import squared_l2_block

    c = len(ids)
    d2 = squared_l2_block(X, X)
    np.fill_diagonal(d2, np.inf)
    k_eff = min(degree, c - 1)
    part = np.argpartition(d2, k_eff - 1, axis=0)[:k_eff, :]
    out = []
    for i in range(c):
        cand = part[:, i]
        order = np.lexsort((ids[cand], d2[cand, i]))
        out.append(ids[cand[order]].astype(np.int64))
    return out


def _local_nn_descent(
    X: np.ndarray, ids: np.ndarray, degree: int, rounds: int = 3
) -> list[np.ndarray]:
    """NN-descent for segments too large for the |seg|² exact build:
    deterministic affine-mod init, then neighbor-of-neighbor proposal
    rounds scored in blocks. Same algorithm as build_knn_graph, executed
    segment-locally in numpy."""
    c = len(ids)
    k_eff = min(degree, c - 1)
    order = np.argsort(ids, kind="stable")
    X, ids = X[order], ids[order]
    # init: pseudo-random distinct-ish targets per node (position space)
    pos = np.arange(c)
    nbrs = np.stack(
        [(pos * 1_103_515_245 + 12_345 + 7 * j) % _ROLL_MOD % c for j in range(k_eff)],
        axis=1,
    )
    for j in range(k_eff):  # avoid self-loops deterministically
        nbrs[:, j] = np.where(nbrs[:, j] == pos, (nbrs[:, j] + 1) % c, nbrs[:, j])

    def dists(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        diff = X[src] - X[dst]
        return np.einsum("ij,ij->i", diff, diff)

    cur_d = np.stack([dists(pos, nbrs[:, j]) for j in range(k_eff)], axis=1)
    for _ in range(rounds):
        # proposals along BOTH edge directions — undirected propagation
        # (Dong et al. §2.2) is what makes descent converge in few
        # rounds; out-edges alone plateau well below 0.9 graph recall.
        # CSR of the undirected edge multiset, built vectorized:
        e_src = np.concatenate([np.repeat(pos, k_eff), nbrs.ravel()])
        e_dst = np.concatenate([nbrs.ravel(), np.repeat(pos, k_eff)])
        eorder = np.argsort(e_src, kind="stable")
        e_src, e_dst = e_src[eorder], e_dst[eorder]
        indptr = np.searchsorted(e_src, np.arange(c + 1))
        for i in range(c):
            b = np.unique(e_dst[indptr[i] : indptr[i + 1]])
            cand = np.unique(
                np.concatenate([e_dst[indptr[j] : indptr[j + 1]] for j in b])
            )
            cand = cand[(cand != i)]
            cd = dists(np.full(len(cand), i), cand)
            pool_pos = np.concatenate([nbrs[i], cand])
            pool_d = np.concatenate([cur_d[i], cd])
            _, uniq = np.unique(pool_pos, return_index=True)
            pool_pos, pool_d = pool_pos[uniq], pool_d[uniq]
            sel = np.lexsort((ids[pool_pos], pool_d))[:k_eff]
            nbrs[i], cur_d[i] = pool_pos[sel], pool_d[sel]
    return [ids[nbrs[i]].astype(np.int64) for i in range(c)]


def build_layered_graph(
    base: DataFrame,
    nlist: int = 16,
    degree: int = 16,
    exact_segment_rows: int = 50_000,
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
            nbrs = _local_knn_graph(X, ids, degree)
        else:
            nbrs = _local_nn_descent(X, ids, degree)
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
    import pandas as pd

    spark = queries.sparkSession
    qpdf = queries.select("q_id", vec_col).toPandas()
    q_ids = qpdf["q_id"].to_numpy(dtype=np.int64)
    Q = np.ascontiguousarray(np.stack(qpdf[vec_col].to_numpy()), dtype=np.float64)
    d2 = (
        np.square(Q).sum(1, keepdims=True)
        - 2.0 * (Q @ index.centroids.T)
        + np.square(index.centroids).sum(1)[None, :]
    )
    nearest = np.argsort(d2, axis=1)[:, : min(nprobe, index.nlist)]
    probed = np.zeros((index.nlist, len(q_ids)), dtype=bool)
    for j, row in enumerate(nearest):
        probed[row, j] = True
    probe_set = sorted({int(c) for row in nearest for c in row})
    codec_arrs = (
        (index.codec.mins, index.codec.ranges) if index.codec is not None else None
    )
    data_col = "codes" if index.codec is not None else vec_col
    bc = spark.sparkContext.broadcast((q_ids, Q, probed, codec_arrs))

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        bq_ids, bQ, bprobed, bcodec = bc.value
        empty = pd.DataFrame({"q_id": [], "vec_id": [], "dist": []}).astype(
            {"q_id": np.int64, "vec_id": np.int64, "dist": np.float64}
        )
        if len(pdf) == 0:
            return empty
        cid = int(pdf["centroid_id"].iloc[0])
        qsel = np.flatnonzero(bprobed[cid])
        if len(qsel) == 0:
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

        nbr_pos = [to_pos(n) for n in pdf["nbr_ids"]]
        sq_x = np.square(X).sum(axis=1)
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
        return pd.DataFrame(
            {
                "q_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_id),
                "dist": np.concatenate(out_d),
            }
        )

    local = (
        index.segments.filter(F.col("centroid_id").isin(probe_set))
        .groupBy("centroid_id")
        .applyInPandas(walk, "q_id long, vec_id long, dist double")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", "dist")
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
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame(
            {
                "centroid_id": np.arange(index.nlist, dtype=np.int64),
                "centroid": list(index.centroids.astype(np.float64)),
                "nlist": index.nlist,
                "degree": index.degree,
                "codec_mins": [
                    None if index.codec is None else index.codec.mins
                ] * index.nlist,
                "codec_ranges": [
                    None if index.codec is None else index.codec.ranges
                ] * index.nlist,
            }
        )
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))
    return open_layered(spark, path)


def open_layered(spark, path: str) -> LayeredGraphIndex:
    """Re-open a materialized layered index. The one-time repartition on
    centroid_id restores the hash partitioning the walk kernel's
    exchange-free plan relies on (parquet scans do not advertise a
    partitioning); after the persist, probes are identical to a
    freshly built index."""
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
    segs = (
        spark.read.parquet(os.path.join(path, "segments"))
        .repartition(nlist, "centroid_id")
        .persist()
    )
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
    # still serving probes while this maintenance runs in the background
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
    existing node's neighborhood against the new arrivals, and (c) drops
    edges left dangling by earlier deletes."""
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    if index.codec is not None:
        raise ValueError(
            "insert_into_layered needs float segments; compressed (SQ8) "
            "indexes serve reads between periodic rebuilds — deletes work."
        )
    spark = delta.sparkSession
    degree = index.degree
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

    vec_type = delta.schema[vec_col].dataType
    out_schema = StructType(
        [
            StructField("centroid_id", IntegerType()),
            StructField(id_col, LongType()),
            StructField(vec_col, vec_type),
            StructField("nbr_ids", ArrayType(LongType())),
        ]
    )
    assigned_delta = (
        delta.select(id_col, vec_col)
        .mapInPandas(
            assign,
            StructType(
                list(delta.select(id_col, vec_col).schema.fields)
                + [StructField("centroid_id", IntegerType())]
            ),
        )
        .select(
            "centroid_id",
            F.col(id_col),
            F.col(vec_col),
            F.lit(None).cast("array<bigint>").alias("nbr_ids"),
        )
    )

    def repair(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        X = np.ascontiguousarray(np.stack(pdf[vec_col].to_numpy()), dtype=np.float64)
        c = len(ids)
        is_new = pdf["nbr_ids"].isna().to_numpy()
        new_pos = np.flatnonzero(is_new)
        if len(new_pos) == 0 or c <= 1:
            return pdf
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
        # (b)+(c) existing nodes: surviving old edges (dangling dropped,
        # distances recomputed by gather) merged with the new arrivals
        for p in np.flatnonzero(~is_new):
            old = np.asarray(pdf["nbr_ids"].iloc[p], dtype=np.int64)
            op = np.minimum(np.searchsorted(ids, old), c - 1)
            op = op[ids[op] == old]
            cand = np.unique(np.concatenate([op, new_pos]))
            cand = cand[cand != p]
            if len(cand) == 0:
                nbrs_out[p] = np.array([], dtype=np.int64)
                continue
            cd = pair_d(np.full(len(cand), p), cand)
            sel = np.lexsort((ids[cand], cd))[: min(k_eff, len(cand))]
            nbrs_out[p] = ids[cand[sel]].astype(np.int64)
        return pd.DataFrame(
            {
                "centroid_id": pdf["centroid_id"],
                id_col: ids,
                vec_col: pdf[vec_col],
                "nbr_ids": nbrs_out,
            }
        )

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
    # old index intentionally left persisted (may still be serving)
    return LayeredGraphIndex(segs, C, index.nlist, degree)


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
