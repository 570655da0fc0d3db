"""Update-protocol + metric-shape queries()/oracle_sql() entries
(SURVEY.md §2.3 U1-U3, §2.4 A1/A4/A6).

The snapshot ops face the oracle through deterministic derivations: the
tail cutoff is floor-arithmetic over COUNT(*), so DuckDB reproduces the
exact same v1/v2 sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cs598vectordb_spark.config import DEFAULT_K, DEFAULT_N_QUERIES, ORACLE_ROUND as _R
from cs598vectordb_spark.operators import updates as upd
from cs598vectordb_spark.operators.knn import knn_exact
from cs598vectordb_spark.operators.metrics import per_query_recall
from cs598vectordb_spark.registry import register
from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

_NQ = DEFAULT_N_QUERIES
_K = DEFAULT_K

_L2 = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) "
    "* (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
)


@register(
    "delete_pct",
    """
WITH cut AS (
  SELECT COUNT(*) - (COUNT(*) * 50) // 100 AS c FROM embeddings
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(vec_id) AS BIGINT) AS id_sum,
       COUNT(DISTINCT vec_id) AS n_distinct
FROM embeddings, cut WHERE vec_id < cut.c
""",
)
def q_delete_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: snapshot v1 after deleting the tail 50% (the library backends'
    update_percents=[50], dynamic_script_faiss.py:46); checksummed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return upd.snapshot_checksum(upd.delete_tail_pct(emb, 50))


@register(
    "insert_restore",
    """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(vec_id) AS BIGINT) AS id_sum,
       COUNT(DISTINCT vec_id) AS n_distinct
FROM embeddings
""",
)
def q_insert_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: v2 = v1 ∪ deleted slice must restore v0 exactly — the oracle is
    simply v0's checksum (the reference's stability signal: recall after
    delete+reinsert equals baseline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v1 = upd.delete_tail_pct(emb, 50)
    slice_ = upd.deleted_tail_slice(emb, 50)
    return upd.snapshot_checksum(upd.insert_rows(v1, slice_))


@register(
    "upsert_guard",
    """
WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
cands AS (
  SELECT UNNEST(range((SELECT n FROM n) - 25, (SELECT n FROM n) + 25)) AS vec_id
)
SELECT COUNT(*) AS n_new
FROM cands WHERE vec_id NOT IN (SELECT vec_id FROM embeddings)
""",
)
def q_upsert_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: candidates straddle the id boundary (N-25 .. N+24); the guard
    admits exactly the 25 genuinely-new ids (Redis `if not r.exists`,
    dynamic_script_redis.py:53)."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cands = spark.range(n - 25, n + 25).select(F.col("id").alias("vec_id"))
    return upd.upsert_guard(emb, cands).agg(F.count(F.lit(1)).alias("n_new"))


@register(
    "merge_upsert",
    """
WITH n AS (SELECT COUNT(*) AS n FROM embeddings),
src AS (
  SELECT vec_id, label + 100 AS label FROM embeddings, n WHERE vec_id >= n.n - 50
  UNION ALL
  SELECT vec_id + n.n AS vec_id, -1 AS label FROM embeddings, n WHERE vec_id < 50
),
merged AS (
  SELECT COALESCE(t.vec_id, s.vec_id) AS vec_id,
         COALESCE(s.label, t.label) AS label
  FROM embeddings t FULL OUTER JOIN src s ON t.vec_id = s.vec_id
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(vec_id) AS BIGINT) AS id_sum,
       CAST(SUM(label) AS BIGINT) AS label_sum,
       CAST(SUM(CASE WHEN label >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated,
       CAST(SUM(CASE WHEN label = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_inserted
FROM merged
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3+/MERGE: one statement updating the matched tail-50 rows
    (label+100) and inserting 50 brand-new ids past the boundary — the
    Delta-style MERGE the reference approximates with delete+insert
    phases. Engine side is operators.updates.merge_upsert (one full-outer
    join); the checksum projection keeps the oracle integer-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    src = (
        emb.filter(F.col("vec_id") >= n - 50).select(
            "vec_id", "embedding", (F.col("label") + 100).alias("label")
        )
    ).unionByName(
        emb.filter(F.col("vec_id") < 50).select(
            (F.col("vec_id") + n).alias("vec_id"), "embedding", F.lit(-1).alias("label")
        )
    )
    merged = upd.merge_upsert(emb, src, id_col="vec_id", update_cols=["embedding", "label"])
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("vec_id").cast("bigint").alias("id_sum"),
        F.sum("label").cast("bigint").alias("label_sum"),
        F.sum((F.col("label") >= 100).cast("int")).cast("bigint").alias("n_updated"),
        F.sum((F.col("label") == -1).cast("int")).cast("bigint").alias("n_inserted"),
    )


@register(
    "knn_post_delete",
    f"""
WITH cut AS (
  SELECT COUNT(*) - (COUNT(*) * 50) // 100 AS c FROM embeddings
),
v1 AS (
  SELECT vec_id, embedding FROM embeddings, cut WHERE vec_id < cut.c
),
q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
),
pairs AS (
  SELECT q.q_id, b.vec_id, {_L2.format(a="q.q_emb", b="b.embedding")} AS dist
  FROM q CROSS JOIN v1 b
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
FROM pairs QUALIFY rank <= {_K}
""",
)
def q_knn_post_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search against snapshot v1 — the reference's 'search while deleted'
    measurement (dynamic_script_faiss.py:89-101) in batch form. Queries
    still come from v0 (they are external query vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, _NQ)
    return knn_exact(upd.delete_tail_pct(emb, 50), q, k=_K).select("q_id", "rank", "vec_id")


@register(
    "recall_low_dim",
    f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_NQ}
),
truth AS (
  SELECT q.q_id, b.vec_id,
         row_number() OVER (PARTITION BY q.q_id ORDER BY
           {_L2.format(a="q.q_emb", b="b.embedding")} ASC, b.vec_id ASC) AS rank
  FROM q CROSS JOIN embeddings b QUALIFY rank <= {_K}
),
pred AS (
  SELECT q.q_id, b.vec_id,
         row_number() OVER (PARTITION BY q.q_id ORDER BY
           {_L2.format(a="q.q_emb[1:16]", b="b.embedding[1:16]")} ASC, b.vec_id ASC) AS rank
  FROM q CROSS JOIN embeddings b QUALIFY rank <= {_K}
)
SELECT t.q_id,
       ROUND(CAST(COUNT(p.vec_id) AS DOUBLE) / {_K}, {_R}) AS recall
FROM truth t LEFT JOIN pred p ON t.q_id = p.q_id AND t.vec_id = p.vec_id
GROUP BY t.q_id
""",
)
def q_recall_low_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 recall@k made non-trivial: the 'approximate' predictor searches
    on only the first 16 of 64 dims (a projection — the cheapest possible
    dimensionality reduction), scored per query against full-dim truth.
    Exercises the same join-as-intersection as the reference's
    compute_recall (dynamic_script_faiss.py:25-29)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, _NQ)
    truth = knn_exact(emb, q, k=_K)
    low = F.slice(F.col("embedding"), 1, 16)
    pred = knn_exact(
        emb.select("vec_id", low.alias("embedding")),
        q.select("q_id", low.alias("embedding")),
        k=_K,
    )
    return per_query_recall(pred, truth, _K)


@register(
    "events_last5_summary",
    f"""
SELECT user_id,
       ROUND(AVG(value), {_R}) AS avg_last5,
       COUNT(*) AS n
FROM (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
) WHERE rn <= 5
GROUP BY user_id
""",
)
def q_events_last5_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 'mean of last 5 intervals' shape (dynamic_script_faiss.py:120-122)
    exercised on real data: per-user mean of the 5 most recent events."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), _R).alias("avg_last5"), F.count(F.lit(1)).alias("n"))
    )


@register(
    "events_first5_series",
    """
SELECT user_id,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY rn) AS event_series
FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
  FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
) WHERE rn <= 5
GROUP BY user_id
""",
)
def q_events_first5_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 'first 5 intervals per series' shape (plots.py:27-44): ordered
    CSV of each user's first five event ids."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_id"))),
                    lambda s: s["event_id"].cast("string"),
                ),
                ",",
            ).alias("event_series")
        )
    )
