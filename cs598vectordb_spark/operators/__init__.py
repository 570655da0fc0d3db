from cs598vectordb_spark.operators.knn import knn_exact, knn_exact_expr, knn_collect

__all__ = ["knn_exact", "knn_exact_expr", "knn_collect"]
