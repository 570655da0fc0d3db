from cs598vectordb_spark.sources.tables import load_all, load_table, queries_from_embeddings

__all__ = ["load_table", "load_all", "queries_from_embeddings"]
