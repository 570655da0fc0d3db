"""Text-analysis table operators (language ID, quality scoring, token
stats, fingerprinting) over the documents table.

Per-row projections only — no shuffle except the final group-bys. These
are the text half of the LLM-data-pipeline surface (the north star's
"text analysis" bucket): every expression is Catalyst-codegen'd; the
DuckDB oracle mirrors each formula.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cs598vectordb_spark.config import ORACLE_ROUND
from cs598vectordb_spark.functions.text import (
    LANG_MARKERS,
    alpha_ratio,
    lang_score,
    normalize_ws,
    punct_ratio,
    rolling_hash,
    token_count,
)


def _r(c: F.Column) -> F.Column:
    return F.round(c, ORACLE_ROUND)


def doc_stats(docs: DataFrame) -> DataFrame:
    """Per-document token/char statistics."""
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_actual"),
        token_count("text").alias("n_tokens"),
        _r(F.length("text").cast("double") / F.greatest(token_count("text"), F.lit(1))).alias(
            "avg_token_len"
        ),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic quality components + composite score in [0,1]:
    rewards mid-length docs, alphabetic content, and sane punctuation —
    the standard cheap pre-filter before expensive model-based scoring."""
    n_tok = token_count("text")
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    composite = _r(
        0.4 * len_score + 0.4 * alpha_ratio("text") + 0.2 * (1.0 - punct_ratio("text"))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        _r(punct_ratio("text")).alias("punct_ratio"),
        _r(alpha_ratio("text")).alias("alpha_ratio"),
        composite.alias("quality"),
    )


def lang_detect(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax over per-language stopword hit
    counts, 'und' (undetermined) when all scores are zero. Deterministic
    argmax: ties broken by language code order."""
    scored = docs.select(
        "doc_id",
        "lang",
        *[lang_score("text", lg).alias(f"score_{lg}") for lg in sorted(LANG_MARKERS)],
    )
    # greatest + chained when() = deterministic argmax by (score desc, lang asc)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):
        pred = F.when((best > 0) & (F.col(f"score_{lg}") == best), lg).otherwise(pred)
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("detected_lang"),
        *[F.col(f"score_{lg}") for lg in langs],
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Two deterministic fingerprints per doc: md5 of normalized text
    (exact-dup key) and the polynomial rolling hash (cheap int64 key)."""
    return docs.select(
        "doc_id",
        F.md5(normalize_ws(F.col("text"))).alias("md5_fp"),
        rolling_hash("text").alias("rolling_fp"),
    )


def source_summary(docs: DataFrame) -> DataFrame:
    """Corpus composition by source: doc counts, char volume, language
    spread — the pipeline-health dashboard query."""
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        _r(F.avg("n_chars")).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.min("doc_id").alias("first_doc"),
    )
