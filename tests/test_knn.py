"""Exact kNN correctness: kernel vs Catalyst expression, self-query axioms."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs598vectordb_spark.operators.knn import knn_collect, knn_exact, knn_exact_expr
from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

K = 10
NQ = 20


def _setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, queries_from_embeddings(emb, NQ)


def test_kernel_matches_expression(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    a = knn_exact(emb, q, k=K).select("q_id", "rank", "vec_id")
    b = knn_exact_expr(emb, q, k=K).select("q_id", "rank", "vec_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_self_neighbor_rank1(spark, sf_dir):
    """Self-querying: each query's own vec_id is its rank-1 hit at dist 0
    (FIXTURES.md self-checking axiom; mirrors recall==1.0 for exact search
    in the reference, dynamic_script_faiss.py:25-29)."""
    emb, q = _setup(spark, sf_dir)
    r1 = knn_exact(emb, q, k=K).filter(F.col("rank") == 1).collect()
    assert len(r1) == NQ
    for row in r1:
        assert row.q_id == row.vec_id
        assert abs(row.dist) < 1e-9


def test_row_shape(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    res = knn_exact(emb, q, k=K)
    assert res.count() == NQ * K
    per_q = res.groupBy("q_id").count().select("count").distinct().collect()
    assert len(per_q) == 1 and per_q[0]["count"] == K


def test_cosine_self_neighbor(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    r1 = (
        knn_exact(emb, q, k=K, metric="cosine")
        .filter(F.col("rank") == 1)
        .collect()
    )
    for row in r1:
        assert row.q_id == row.vec_id
        assert abs(row.dist - 1.0) < 1e-9


def test_knn_collect_shape(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    out = knn_collect(knn_exact(emb, q, k=K)).collect()
    assert len(out) == NQ
    for row in out:
        ids = row.nn_csv.split(",")
        assert len(ids) == K
        assert int(ids[0]) == row.q_id  # self first
