"""Vector-surface queries()/oracle_sql() entries (SURVEY.md §2.2-2.3).

Oracle formulation notes:
* distance is element-wise (CAST to DOUBLE) squared-diff summed over
  list_zip — the same math as functions.distance.squared_l2 / the numpy
  kernel (float64). Compared outputs carry (q_id, rank, vec_id) only; the
  raw distance stays engine-internal so last-ulp summation differences
  can't break the value hash (ranks are stable because synthetic data has
  no near-ties).
* queries = first DEFAULT_N_QUERIES vec_ids (FIXTURES.md derivation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs598vectordb_spark.config import DEFAULT_K, DEFAULT_N_QUERIES
from cs598vectordb_spark.operators.knn import knn_collect, knn_exact, knn_exact_expr
from cs598vectordb_spark.registry import register
from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

_NQ = DEFAULT_N_QUERIES
_K = DEFAULT_K

# DuckDB squared-L2 between two FLOAT[] columns, element-wise in DOUBLE.
_L2 = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
    "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
)

_KNN_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
),
pairs AS (
  SELECT q.q_id, b.vec_id,
         {_L2.format(a="q.q_emb", b="b.embedding")} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
FROM pairs
QUALIFY rank <= {_K}
"""


def _load_q(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, queries_from_embeddings(emb, _NQ)


@register("knn_exact", _KNN_ORACLE)
def q_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: exact batch top-k kNN (L2), mapInPandas BLAS kernel + tiny
    shuffle (ref: dynamic_script_faiss.py:60)."""
    emb, q = _load_q(spark, sf_dir)
    return knn_exact(emb, q, k=_K).select("q_id", "rank", "vec_id")


_KNN_2K_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 2000
),
pairs AS (
  SELECT q.q_id, b.vec_id,
         {_L2.format(a="q.q_emb", b="b.embedding")} AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
FROM pairs
QUALIFY rank <= {_K}
"""


@register("knn_exact_2k", _KNN_2K_ORACLE)
def q_knn_exact_2k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 at throughput batch size: exact top-k kNN for a 2000-query batch
    (the whole embeddings table self-queries at sf0.1). Large batches
    amortize Spark's fixed per-job overhead across queries, which is the
    regime a THROUGHPUT engine runs in — measured 3,218 QPS at sf0.1 in
    BENCH_r07's scaling sweep vs 294 QPS at batch 100, within 1.5x of the
    reference's FAISS-HNSW 4,960 QPS (BASELINE.md) while exact. At
    sf0.01 the `vec_id < 2000` head filter admits all 500 rows on both
    the Spark and oracle side, so the driver gate still value-hashes it."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, 2000)
    return knn_exact(emb, q, k=_K).select("q_id", "rank", "vec_id")


@register("knn_exact_expr")
def q_knn_exact_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 alt: pure-Catalyst crossJoin+window formulation — same rows as
    knn_exact by construction. ORACLE RETIRED r9 (slot-budget
    consolidation, registry.py retirement policy): the entry shared
    knn_exact's _KNN_ORACLE verbatim, so its evidence is the exact
    row-set equality pin vs the oracled knn_exact
    (tests/test_knn.py::test_kernel_matches_expression) — the same
    transitive chain, one slot cheaper."""
    emb, q = _load_q(spark, sf_dir)
    return knn_exact_expr(emb, q, k=_K).select("q_id", "rank", "vec_id")


@register("knn_collect")
def q_knn_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: reshape kNN rows to the reference's id-matrix form (one
    rank-ordered CSV row per query; ref: dynamic_script_milvus.py:51).
    ORACLE RETIRED r9 (slot-budget consolidation): the reshape is pinned
    value-exactly against the oracled knn_exact rows in
    tests/test_knn.py::test_knn_collect_matches_exact_rows, so the
    duplicate whole-kNN oracle bought no additional evidence."""
    emb, q = _load_q(spark, sf_dir)
    return knn_collect(knn_exact(emb, q, k=_K))


@register("knn_cosine")
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-similarity top-k via the mapInPandas GEMM kernel. The
    kernel normalizes-then-GEMMs, reordering fp ops vs a brute-force
    recomputation — but only RANKS are compared, and the minimum
    rank-adjacent similarity margin on this data is 5e-6 (measured at
    sf0.1) vs ~1e-15 reorder noise, so ranks cannot flip. ~2× faster
    than the expression path.
    ORACLE RETIRED r18 (funding the knn_join_l2 promotion; shared-
    evidence class (1): the oracle was knn_ip's GEMM cross-join/rank
    twin modulo the norm denominator, and the cosine rank discipline
    stays DuckDB-graded through the still-oracled hybrid_rrf_search
    vector leg and the knn_join self-join twin). Value-exact
    numpy-bruteforce pin, including the desc tie-break:
    tests/test_knn.py::test_knn_cosine_value_exact."""
    emb, q = _load_q(spark, sf_dir)
    return knn_exact(emb, q, k=_K, metric="cosine").select("q_id", "rank", "vec_id")


@register("hard_negatives")
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive embedding training: per
    anchor, the most-cosine-similar vectors that are neither the anchor
    nor near-duplicates (cosine > 0.95 excluded — false negatives
    poison the contrastive loss). Post-filter-with-expansion over the
    exact kernel. Rows-only (oracle budget 99/100; the SQL twin is
    knn_cosine's with the extra predicates — promotable when a slot
    frees); planted-duplicate exclusion and ordering pinned in
    tests/test_knn.py::test_hard_negatives_excludes_near_dups."""
    emb, q = _load_q(spark, sf_dir)
    from cs598vectordb_spark.operators.knn import hard_negatives

    return hard_negatives(emb, q, k=_K, max_cos=0.95)


@register(
    "knn_filtered",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
),
pairs AS (
  SELECT q.q_id, b.vec_id,
         {_L2.format(a="q.q_emb", b="b.embedding")} AS dist
  FROM q CROSS JOIN embeddings b
  WHERE b.label = 3
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
FROM pairs
QUALIFY rank <= {_K}
""",
)
def q_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered kNN: predicate (label = 3) composes with search by simply
    filtering the base relation BEFORE the kernel — the filter pushes down
    to the parquet scan, so at 100 TB only matching row groups are read."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, _NQ)
    return knn_exact(emb.filter(F.col("label") == 3), q, k=_K).select(
        "q_id", "rank", "vec_id"
    )


# SQ8 codec CTEs: per-dim min/max stats + list-form codec (dim=64,
# FIXTURES.md). The engine embeds the same stats as float literals —
# MIN/MAX of doubles is exact, so both sides hold bit-identical codecs.
_SQ_CODEC = """
stats AS (
  SELECT i AS pos,
         MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
         greatest(MAX(CAST(embedding[i] AS DOUBLE))
                  - MIN(CAST(embedding[i] AS DOUBLE)), 1e-12) AS rng
  FROM embeddings, range(1, 65) t(i)
  GROUP BY i
),
codec AS (
  SELECT list(mn ORDER BY pos) AS mns, list(rng ORDER BY pos) AS rngs FROM stats
)"""

_SQ_CODE = (
    "greatest(0, least(255, CAST(floor((CAST(e.embedding[i] AS DOUBLE) - c.mns[i]) "
    "/ c.rngs[i] * 255.0 + 0.5) AS INTEGER)))"
)


@register(
    "sq8_encode",
    f"""
WITH {_SQ_CODEC}
SELECT e.vec_id,
       array_to_string(list_transform(range(1, 65),
                                      i -> CAST({_SQ_CODE} AS VARCHAR)),
                       ',') AS codes_csv
FROM embeddings e, codec c
""",
)
def q_sq8_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization: per-dimension affine int8 codes (4×
    compression). Closed-form codec → the CODES themselves face the
    value-hash oracle, unlike the seeded-k-means PQ path. Codes are
    emitted as a CSV string (the knn_collect pattern) because the
    driver's canonicalizer cannot sort list-typed columns."""
    from cs598vectordb_spark.operators.sq import sq_encode, train_sq

    emb = load_table(spark, sf_dir, "embeddings")
    return sq_encode(emb, train_sq(emb)).select(
        "vec_id",
        F.array_join(
            F.transform("codes", lambda c: c.cast("string")), ","
        ).alias("codes_csv"),
    )


@register(
    "sq8_error",
    f"""
WITH {_SQ_CODEC},
per AS (
  SELECT list_transform(range(1, 65), i ->
           CAST(e.embedding[i] AS DOUBLE)
           - (c.mns[i] + CAST({_SQ_CODE} AS DOUBLE) / 255.0 * c.rngs[i])) AS diffs
  FROM embeddings e, codec c
)
SELECT ROUND(AVG(list_sum(list_transform(diffs, d -> d * d))), 6) AS mse,
       ROUND(MAX(list_max(list_transform(diffs, d -> abs(d)))), 6) AS max_abs_err,
       CAST(4.0 AS DOUBLE) AS compression_x
FROM per
""",
)
def q_sq8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 reconstruction-quality dashboard: table-wide MSE + worst
    per-element error + compression ratio, value-hash-checked."""
    from cs598vectordb_spark.operators.sq import sq_decode_error, train_sq

    emb = load_table(spark, sf_dir, "embeddings")
    return sq_decode_error(emb, train_sq(emb))


@register(
    "semantic_doc_search",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20
),
pairs AS (
  SELECT q.q_id, b.vec_id,
         {_L2.format(a="q.q_emb", b="b.embedding")} AS dist
  FROM q CROSS JOIN embeddings b
),
ranked AS (
  SELECT q_id, vec_id,
         CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
  FROM pairs QUALIFY rank <= 5
)
SELECT r.q_id, r.rank, r.vec_id, d.lang, d.source,
       CAST(d.n_chars AS BIGINT) AS n_chars
FROM ranked r JOIN documents d ON d.doc_id = r.vec_id
""",
)
def q_semantic_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic search end to end: vector top-k then a broadcast join back
    to the documents table for payload columns — the query an LLM
    retrieval pipeline actually runs (doc_id ↔ vec_id shared id space,
    FIXTURES.md)."""
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    q = queries_from_embeddings(emb, 20)
    hits = knn_exact(emb, q, k=5).select("q_id", "rank", "vec_id")
    return hits.join(
        F.broadcast(docs.select(F.col("doc_id").alias("vec_id"), "lang", "source", "n_chars")),
        "vec_id",
    ).select("q_id", "rank", "vec_id", "lang", "source", "n_chars")


@register("pca_spectrum")
def q_pca_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-compression planning artifact: the PCA variance spectrum
    of the embeddings table (one distributed Gram pass, driver-side d x d
    eigh — d*d doubles is driver-sized by design). Partial-sum float
    ordering jitters last bits across schedules → rows-only; the
    mathematical invariants (orthonormality, non-increasing spectrum,
    full-rank isometry) are pinned in tests/test_knn.py."""
    from cs598vectordb_spark.operators.pca import pca_spectrum

    emb = load_table(spark, sf_dir, "embeddings")
    return pca_spectrum(emb)


# The oracle re-projects with the EXACT matrix the engine fitted and
# broadcast, persisted by the Spark side of the query before it returns
# (save_pca_model). Path is pinned to the sf0.01 gate fixture — the
# driver's correctness gate always runs there; check_oracle.py runs at
# other SFs will mismatch on this entry (documented limitation, same
# class as oracles that bake sf0.01 constants). The model read is
# FILTERED on the fixture fingerprint (row count + exact integer
# checksum) stamped into the artifact at fit time: a stale model —
# DuckDB running before Spark after a fixture drift, or a non-sf0.01
# run — selects ZERO model rows and fails the gate on an empty result,
# never by silently comparing against the wrong matrix (ADVICE r8).
_PCA_MODEL_GATE_PATH = "/tmp/cs598_spark_io/sf0.01/pca_model/model.parquet"
_PCA_OUT_DIM = 16

_PCA_ORACLE = f"""
WITH live AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(FLOOR(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT)) AS fp
  FROM embeddings
),
model AS (
  SELECT i, j, mean, w FROM read_parquet('{_PCA_MODEL_GATE_PATH}'), live
  WHERE n_base = live.n AND fp_base = live.fp
),
proj AS (
  SELECT e.vec_id, m.j,
         SUM((CAST(e.embedding[m.i] AS DOUBLE) - m.mean) * m.w) AS p
  FROM embeddings e CROSS JOIN model m
  GROUP BY e.vec_id, m.j
),
vecs AS (
  SELECT vec_id, list(p ORDER BY j) AS pv FROM proj GROUP BY vec_id
),
q AS (SELECT vec_id AS q_id, pv AS q_pv FROM vecs WHERE vec_id < 20),
pairs AS (
  SELECT q.q_id, b.vec_id,
         list_sum(list_transform(list_zip(q.q_pv, b.pv),
                  p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
  FROM q CROSS JOIN vecs b
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
FROM pairs
QUALIFY rank <= {_K}
"""


@register("knn_exact_pca", _PCA_ORACLE)
def q_knn_exact_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN in PCA-compressed space (out_dim=16 of 64): fit + project
    (broadcast GEMM, no shuffle) then the standard exact kernel over the
    compressed vectors — the cheap-ANN path an embedding-compression
    pipeline buys (ref analog: PQ's compress-then-search trade-off,
    multi_tenant_script.py:94-99). The fitted (components, mean) is
    persisted to parquet before the plan returns, so the DuckDB oracle
    re-projects with the identical matrix — compression → search is
    value-hash-checked end to end, not pytest-only. Projection stays in
    float64 on both sides; only GEMM summation order differs (~1e-13
    absolute vs measured min rank-adjacent distance margin 5.3e-7 at
    sf0.01 — six orders of headroom, so ranks cannot flip)."""
    import os

    from cs598vectordb_spark.operators.pca import (
        fit_pca,
        fixture_fingerprint,
        pca_project,
        save_pca_model,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    fitted = fit_pca(emb)
    model_path = os.path.join(
        "/tmp/cs598_spark_io",
        os.path.basename(sf_dir.rstrip("/")),
        "pca_model",
        "model.parquet",
    )
    save_pca_model(fitted, _PCA_OUT_DIM, model_path, fixture_fingerprint(emb))
    proj = pca_project(
        emb, _PCA_OUT_DIM, fitted=fitted, out_dtype="float64"
    ).withColumnRenamed("pca", "embedding")
    q = queries_from_embeddings(proj, 20)
    return knn_exact(proj, q, k=_K).select("q_id", "rank", "vec_id")


@register(
    "knn_ip",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
),
pairs AS (
  SELECT q.q_id, b.vec_id,
         list_sum(list_transform(list_zip(q.q_emb, b.embedding),
             p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS sim
  FROM q CROSS JOIN embeddings b
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rank
FROM pairs
QUALIFY rank <= {_K}
""",
)
def q_knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product top-k (MIPS) via the mapInPandas GEMM kernel
    — FAISS METRIC_INNER_PRODUCT, completing the reference libraries'
    metric set (L2 / cosine / IP). Only ranks face the hash; measured min
    rank-adjacent IP margin at sf0.01 is 7.4e-6 vs ~1e-13 GEMM reorder
    noise, so ranks cannot flip."""
    emb, q = _load_q(spark, sf_dir)
    return knn_exact(emb, q, k=_K, metric="ip").select("q_id", "rank", "vec_id")


# radius chosen from the fixture distance histogram: median pair d2 ~= 2.0,
# r2 = 1.5 admits ~12 neighbors/query at sf0.01; min |d2 - 1.5| boundary
# margin measured 7.2e-5 — five decades above double-summation noise, so
# membership cannot flip between engines.
_RANGE_R2 = 1.5

@register(
    "range_search",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
)
SELECT q.q_id, b.vec_id
FROM q CROSS JOIN embeddings b
WHERE {_L2.format(a="q.q_emb", b="b.embedding")} <= {_RANGE_R2}
""",
)
def q_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius search: every base vector within squared-L2 1.5 of each
    query — FAISS index.range_search as a pure-Catalyst broadcast
    crossJoin + codegen'd distance filter (operators.knn.knn_range);
    the fourth query mode next to top-k L2/cosine/IP."""
    from cs598vectordb_spark.operators.knn import knn_range

    emb, q = _load_q(spark, sf_dir)
    return knn_range(emb, q, _RANGE_R2)


@register(
    "distance_histogram",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
),
pairs AS (
  SELECT {_L2.format(a="q.q_emb", b="b.embedding")} AS dist
  FROM q CROSS JOIN embeddings b
  WHERE q.q_id <> b.vec_id
)
SELECT CAST(floor(dist / 0.1) AS INTEGER) AS bin,
       ROUND(floor(dist / 0.1) * 0.1, 1) AS d2_lo,
       COUNT(*) AS n
FROM pairs
GROUP BY 1, 2
""",
)
def q_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Squared-distance histogram of the query batch against the base
    (self-pairs excluded), bin width 0.1 — the planning artifact that
    picks range_search's radius (and sanity-checks index bucket widths):
    the same role the variance spectrum plays for PCA out_dim. Binning
    is robust to fp summation noise (~1e-13 vs 0.1 bins: a pair would
    need to sit within 1e-13 of a bin edge to flip — none do at these
    SFs), so counts value-hash against DuckDB."""
    from cs598vectordb_spark.functions.distance import squared_l2

    emb, q = _load_q(spark, sf_dir)
    b = emb.select(F.col("vec_id"), F.col("embedding").alias("_b_emb"))
    qq = q.select("q_id", F.col("embedding").alias("_q_emb"))
    pairs = (
        b.crossJoin(F.broadcast(qq))
        .filter(F.col("q_id") != F.col("vec_id"))
        .select(squared_l2("_q_emb", "_b_emb").alias("dist"))
    )
    binned = F.floor(F.col("dist") / 0.1).cast("int")
    return pairs.select(binned.alias("bin")).groupBy("bin").agg(
        F.round(F.col("bin") * 0.1, 1).alias("d2_lo"),
        F.count(F.lit(1)).alias("n"),
    ).select("bin", "d2_lo", "n")


# ------------------------------------------------------------- kNN join

# DuckDB twin for the EXACT (full-probe) distributed kNN self-join —
# PROMOTED to the grading head r16 (queued r15; funded by the
# media_decode_wav retirement). Rank is computed on the 6-dp ROUNDED
# cosine on both sides (vec_id tie-break), the bm25_search discipline,
# so a last-ulp summation difference cannot flip an order.
KNN_JOIN_ORACLE = """
WITH pairs AS (
  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
SELECT q_id,
       CAST(row_number() OVER (
         PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS INTEGER) AS rank,
       vec_id, cos_sim
FROM pairs
QUALIFY rank <= 5
"""


@register("knn_join", KNN_JOIN_ORACLE)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed kNN SELF-join at FULL probe (exact): every embedding
    row gets its 5 most-cosine-similar neighbors, query side a full
    table (never a driver batch) — the SemDeDup/k-NN-graph shape
    (operators/knnjoin.py module docstring; ref multi_tenant_script.py
    holds xq in process — this is the table×table form it lacks).
    ORACLE PROMOTED r16 (queued since r15, funded by the
    media_decode_wav retirement): the brute-force cross-join twin,
    rank on the 6-dp-rounded cosine both sides; dress-rehearsed in
    tests/test_knnjoin.py."""
    from cs598vectordb_spark.operators.knnjoin import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("q_id"), "embedding")
    return knn_join(q, emb, k=5, metric="cosine", exclude_self=True)


# PROMOTED to the grading head r18 (queued r17, funded by the
# knn_cosine retirement): the L2 join twin — the promoted cosine
# twin's brute-force shape with the score swapped for the
# inner-product expansion of ||b−q||², rounded to the shared 6 dp
# BEFORE the rank window on both sides (the engine cell kernel rounds
# its squared_l2_block output identically, r17). GREATEST(·, 0.0)
# mirrors the kernel's np.maximum fp-noise clamp. Rounding-boundary
# caveat (ADVICE r17): numpy np.round is half-to-even while DuckDB
# ROUND(DOUBLE, n) is half-away-from-zero — a score landing EXACTLY on
# a representable .xxxxxx5 boundary would round differently across
# engines and could flip a tie; if this oracle ever hash-mismatches on
# a new fixture, diagnose THIS class before suspecting the kernel.
KNN_JOIN_L2_ORACLE = """
WITH pairs AS (
  SELECT a.vec_id AS q_id, b.vec_id AS vec_id,
         ROUND(GREATEST(
           list_inner_product(CAST(a.embedding AS DOUBLE[]),
                              CAST(a.embedding AS DOUBLE[]))
           - 2 * list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[]))
           + list_inner_product(CAST(b.embedding AS DOUBLE[]),
                                CAST(b.embedding AS DOUBLE[])),
           0.0), 6) AS dist
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
)
SELECT q_id,
       CAST(row_number() OVER (
         PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank,
       vec_id, dist
FROM pairs
QUALIFY rank <= 5
"""


@register("knn_join_l2", KNN_JOIN_L2_ORACLE)
def q_knn_join_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-metric variant of the distributed kNN self-join (VERDICT r15
    item 7: operators/knnjoin.py implemented both metrics, only cosine
    was registered): full probe over the standard L2 IVF blocking
    (build_join_index delegates to build_ivf_index; the build metric is
    recorded on the index and knn_join_ivf rejects a mismatched probe).
    ORACLE PROMOTED r18 (queued since r17, funded by the knn_cosine
    retirement): the brute-force L2 twin (KNN_JOIN_L2_ORACLE above),
    rank on the 6-dp-rounded inner-product expansion of ||b−q||² both
    sides; dress-rehearsed in tests/test_knnjoin.py::
    test_knn_join_l2_queued_oracle_dress_rehearsal and full-probe
    exactness vs the driver-batch L2 kernel pinned in
    tests/test_knnjoin.py::test_knn_join_full_probe_is_exact_under_l2."""
    from cs598vectordb_spark.operators.knnjoin import knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("q_id"), "embedding")
    return knn_join(q, emb, k=5, metric="l2", exclude_self=True)


@register("knn_join_ivf")
def q_knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE path of the distributed kNN join: partial probe
    (nprobe=4 of the rows-∝-cells nlist — sized for this fixture's
    directionally near-isotropic embeddings, the blocking worst case;
    clustered corpora run smaller probe fractions), cogrouped per-cell
    GEMM with the broadcast-semi-join list pruning live. Rows-only
    (approximate by design); recall floor + pruning pinned in
    tests/test_knnjoin.py::test_knn_join_partial_probe_recall_floor."""
    from cs598vectordb_spark.operators.knnjoin import (
        build_join_index,
        default_join_nlist,
        knn_join_ivf,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.select(F.col("vec_id").alias("q_id"), "embedding")
    nlist = default_join_nlist(emb.count())
    idx = build_join_index(emb, nlist=nlist, metric="cosine")
    return knn_join_ivf(q, idx, k=5, nprobe=4, metric="cosine", exclude_self=True)


# PROMOTED r19 (queued r17, dress-rehearsed since): the semantic-
# decontamination twin, funded by the stream_interval_join_outer
# retirement (registry._PRIORITY r19 rotation note). Every train
# vector's single nearest eval vector by the 6-dp-rounded cosine
# (eval_id ASC tie-break — the same canonical comparator the engine's
# cell kernel and final window use), plus the τ=0.35 flag computed on
# the identical rounded double on both sides.
SEMANTIC_DECONTAMINATION_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS train_id, b.vec_id AS eval_id,
         ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
  FROM embeddings a JOIN embeddings b ON a.vec_id >= 50 AND b.vec_id < 50
),
best AS (
  SELECT train_id, eval_id, cos_sim,
         row_number() OVER (
           PARTITION BY train_id ORDER BY cos_sim DESC, eval_id ASC) AS rn
  FROM pairs
)
SELECT train_id, eval_id, cos_sim, cos_sim >= 0.35 AS contaminated
FROM best WHERE rn = 1
"""


@register("semantic_decontamination", SEMANTIC_DECONTAMINATION_SQL)
def q_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (operators/knnjoin.py): every
    train vector (vec_id ≥ 50) against the eval base (vec_id < 50,
    the small indexed side), exact full-probe nearest-eval + a
    contaminated flag at cosine ≥ 0.35 (the fixture's p90 — flags
    ~10%). Complements the shingle-overlap `decontamination` entry:
    paraphrased leakage carries no shingle but keeps its embedding.
    ORACLE PROMOTED r19 (queued r17, dress-rehearsed each round since
    via tests/test_knnjoin.py::
    test_semantic_decontamination_queued_oracle_dress_rehearsal; funded
    by the stream_interval_join_outer retirement — see the registry
    r19 rotation note); value-exact vs numpy brute force remains
    pinned in
    tests/test_knnjoin.py::test_semantic_decontamination_matches_bruteforce."""
    from cs598vectordb_spark.operators.knnjoin import semantic_decontamination

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_decontamination(
        emb.filter(F.col("vec_id") >= 50), emb.filter(F.col("vec_id") < 50)
    )
