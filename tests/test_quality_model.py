"""Learned quality classifier (operators/quality_model.py): planted-
corruption supervision, holdout AUC floor, score separation, and the
map-only scoring plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs598vectordb_spark.operators.quality_model import (
    corrupted_text,
    quality_training_set,
    score_quality_model,
    train_quality_classifier,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


def test_corruption_modes_all_present_and_differ(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    both = docs.select(
        "doc_id",
        "text",
        corrupted_text().alias("bad"),
        F.pmod(F.col("doc_id"), F.lit(3)).alias("mode"),
    )
    assert both.filter(F.col("text") == F.col("bad")).count() == 0
    assert {r.mode for r in both.select("mode").distinct().collect()} == {0, 1, 2}
    # the training set is balanced by construction
    ts = quality_training_set(docs)
    counts = {r.label: r["count"] for r in ts.groupBy("label").count().collect()}
    assert counts[1.0] == counts[0.0] == docs.count()


def test_quality_classifier_separates_planted_corruption(spark, sf_dir):
    """The evidence pin for the rows-only `quality_classifier` entry:
    holdout AUC clears 0.9 and the mean P(natural) gap between
    originals and corruptions exceeds 0.4 — the classifier actually
    learned the junk modes, it is not reading the prior."""
    docs = _docs(spark, sf_dir)
    model, auc = train_quality_classifier(docs)
    assert auc >= 0.9, auc
    scored = score_quality_model(model, quality_training_set(docs))
    means = {
        r.label: r.m
        for r in scored.groupBy("label").agg(F.avg("p_good").alias("m")).collect()
    }
    assert means[1.0] - means[0.0] >= 0.4, means
    # decision accuracy on the balanced set (train+holdout; easy task)
    acc = (
        scored.filter(F.col("pred") == F.col("label").cast("int")).count()
        / scored.count()
    )
    assert acc >= 0.85, acc


def test_quality_scoring_is_map_only(spark, sf_dir):
    """Scoring a corpus must be one stateless map over the rows — no
    Exchange anywhere in the plan (the 100 TB contract: train once,
    score anywhere, shuffle nothing)."""
    docs = _docs(spark, sf_dir)
    model, _ = train_quality_classifier(docs)
    scored = score_quality_model(model, docs)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert scored.count() == docs.count()
