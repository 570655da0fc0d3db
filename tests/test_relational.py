"""Relational operator sanity at sf0.001 (deep check is the DuckDB gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs598vectordb_spark.operators import relational as rel
from cs598vectordb_spark.sources.tables import load_table


def test_pricing_summary_groups(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    out = rel.pricing_summary(li).collect()
    assert 1 <= len(out) <= 6
    total = sum(r.count_order for r in out)
    expect = li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")).count()
    assert total == expect


def test_customer_order_stats_covers_all_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    out = rel.customer_order_stats(c, o)
    assert out.count() == c.count()
    assert out.filter(F.col("n_orders") == 0).count() >= 0  # outer join keeps zeros


def test_brand_top_parts_rank_bounds(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    out = rel.brand_top_parts(p, topn=3)
    assert out.groupBy("p_brand").count().filter(F.col("count") > 3).count() == 0


def test_sessionize_monotone(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    out = rel.sessionize(e)
    bad = out.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0
    # sessions per user are dense 0..n
    per_user = out.groupBy("user_id").agg(
        F.min("session_seq").alias("lo"), F.max("session_seq").alias("hi"), F.count("*").alias("n")
    )
    assert per_user.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count() == 0
