from cs598vectordb_spark.functions.distance import (
    cosine_similarity,
    dot_product,
    l2_norm,
    squared_l2,
)

__all__ = ["squared_l2", "dot_product", "cosine_similarity", "l2_norm"]
