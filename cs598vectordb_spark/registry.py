"""Central inventory wiring SURVEY.md §2 operators to the driver contract.

Each engine op registers a (spark, sf_dir) -> DataFrame callable and,
where ANSI/DuckDB-expressible, the equivalent oracle SQL. Column names and
types are aligned on both sides (the driver sorts columns by name and
hashes values). Floating aggregates are rounded identically on both sides
(config.ORACLE_ROUND) so summation-order fp noise cannot flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cs598vectordb_spark.config import DEFAULT_K, DEFAULT_N_QUERIES, SMOKE_N_QUERIES

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)


def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """entry(): exact top-10 kNN at sf0.001, 50 self-queries."""
    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, SMOKE_N_QUERIES)
    return knn_exact(emb, q, k=DEFAULT_K)


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers ops (import-for-side-effect)."""
    global _LOADED
    if _LOADED:
        return
    from cs598vectordb_spark import queries_vector  # noqa: F401
    from cs598vectordb_spark import queries_updates  # noqa: F401
    from cs598vectordb_spark import queries_relational  # noqa: F401
    from cs598vectordb_spark import queries_text  # noqa: F401
    from cs598vectordb_spark import queries_index  # noqa: F401
    from cs598vectordb_spark import queries_sources  # noqa: F401
    from cs598vectordb_spark import queries_multimodal  # noqa: F401
    from cs598vectordb_spark import queries_streaming  # noqa: F401

    _LOADED = True
