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


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    """event_value_percentiles_approx evidence pin: for every group and
    every p, the sketch's returned value must be an order statistic whose
    rank is within n/accuracy of ceil(p*n) — Spark's documented
    Greenwald-Khanna guarantee, checked against the exact sorted values
    (bracketing order statistics at rank ± n/acc)."""
    import math

    import __spark_entry__ as em

    from cs598vectordb_spark.queries_relational import PERCENTILE_ACCURACY
    from cs598vectordb_spark.sources.tables import load_table

    got = {
        r.event_type: r
        for r in em.queries()["event_value_percentiles_approx"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    by_type = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    assert set(got) == set(by_type)

    for etype, vals in by_type.items():
        vals.sort()
        n = len(vals)
        err = n / PERCENTILE_ACCURACY
        for p, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            target = math.ceil(p * n)
            lo = vals[max(0, math.floor(target - err) - 1)]
            hi = vals[min(n - 1, math.ceil(target + err) - 1)]
            approx = getattr(got[etype], col)
            # the query rounds to 4 decimals; widen the bracket accordingly
            assert lo - 5e-5 <= approx <= hi + 5e-5, (etype, col, lo, approx, hi)
        assert got[etype].n == n
