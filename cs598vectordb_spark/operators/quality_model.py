"""Learned document-quality classifier — the model-based stage of the
curation funnel (fastText-style: hashed bag-of-words+bigrams into a
linear model, the CCNet / GPT-3 "quality filter" recipe from public
descriptions).

The engine's `quality_scores` is the cheap HEURISTIC pre-filter; real
pipelines follow it with a trained classifier. With no labeled corpus
in the fixtures, training labels come from PLANTED CORRUPTION — weak
supervision that needs no external data and stays deterministic:
every document yields a positive (the original) and a negative (a
corruption chosen by pmod(doc_id, 3): space-stripped token soup,
vowel→punctuation noise, or a short-span repetition loop — the three
classic junk modes Gopher-style filters target). The classifier then
learns to separate natural from degenerate text; scoring any corpus is
one map-only transform.

100 TB shape: features are HashingTF sparse vectors (fixed 2^15 dim —
vocabulary-independent, no fit state to ship), corruption and
tokenization are JVM-side column expressions, and LogisticRegression
training is MLlib's treeAggregate gradient loop — per-iteration cost
one map over the corpus plus a d-dim (128 KB) reduce, the textbook
distributed-GLM shape. Scoring is stateless and embarrassingly
parallel. Rows-only entry (L-BFGS fp summation order is
partitioning-dependent in the last ulps, so scores aren't
value-hashable): separation + AUC floor + corruption-mode coverage
pinned in tests/test_quality_model.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 1 << 15
SEED = 41


def corrupted_text(col: str = "text", id_col: str = "doc_id"):
    """Deterministic per-doc corruption, mode = pmod(doc_id, 3):
    0 → whitespace stripped (unsegmentable token soup);
    1 → vowels replaced with '#' (punctuation-noise garbage);
    2 → the first ~24 chars repeated 12× (degenerate repetition)."""
    mode = F.pmod(F.col(id_col), F.lit(3))
    return (
        F.when(mode == 0, F.regexp_replace(F.col(col), r"\s+", ""))
        .when(mode == 1, F.regexp_replace(F.col(col), r"[aeiouAEIOU]", "#"))
        .otherwise(F.repeat(F.substring(F.col(col), 1, 24), 12))
    )


def quality_training_set(docs: DataFrame) -> DataFrame:
    """(doc_id, text, label): label 1.0 = original document, 0.0 = its
    planted corruption. Balanced by construction; all column
    expressions, zero Python in the row path."""
    pos = docs.select("doc_id", "text", F.lit(1.0).alias("label"))
    neg = docs.select("doc_id", corrupted_text().alias("text"), F.lit(0.0).alias("label"))
    return pos.unionByName(neg)


def _feature_pipeline():
    from pyspark.ml.feature import HashingTF, NGram, RegexTokenizer, VectorAssembler

    tok = RegexTokenizer(inputCol="text", outputCol="_words", pattern=r"\W+", minTokenLength=1)
    big = NGram(n=2, inputCol="_words", outputCol="_bigrams")
    tf_w = HashingTF(inputCol="_words", outputCol="_tf_w", numFeatures=FEATURE_DIM)
    tf_b = HashingTF(inputCol="_bigrams", outputCol="_tf_b", numFeatures=FEATURE_DIM)
    asm = VectorAssembler(inputCols=["_tf_w", "_tf_b"], outputCol="features")
    return [tok, big, tf_w, tf_b, asm]


def train_quality_classifier(docs: DataFrame, max_iter: int = 20, reg: float = 1e-3):
    """Fit the fastText-style pipeline on the planted-corruption set of
    `docs`. Returns (PipelineModel, holdout_auc): the holdout is a
    deterministic doc_id hash split (~25%), evaluated with MLlib's
    BinaryClassificationEvaluator — the honest generalization number,
    not train fit."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    data = quality_training_set(docs)
    is_test = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(SEED)), F.lit(4)) == 0
    train = data.filter(~is_test)
    test = data.filter(is_test)
    lr = LogisticRegression(
        maxIter=max_iter, regParam=reg, featuresCol="features", labelCol="label"
    )
    model = Pipeline(stages=_feature_pipeline() + [lr]).fit(train)
    auc = BinaryClassificationEvaluator(
        labelCol="label", rawPredictionCol="rawPrediction"
    ).evaluate(model.transform(test))
    return model, float(auc)


def score_quality_model(model, docs: DataFrame) -> DataFrame:
    """Map-only scoring: (doc_id, label?, p_good, pred). p_good is the
    model's P(natural text); pred the 0.5-threshold decision."""
    from pyspark.ml.functions import vector_to_array

    keep = [c for c in ("doc_id", "label") if c in docs.columns]
    return model.transform(docs).select(
        *keep,
        F.round(vector_to_array("probability")[1], 4).alias("p_good"),
        F.col("prediction").cast("int").alias("pred"),
    )
