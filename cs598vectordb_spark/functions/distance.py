"""Vector distance expressions, JVM-side (whole-stage-codegen friendly).

The reference computes L2 distance inside C++ backends (e.g. FAISS
`index.search`, /root/reference/dynamic_script_faiss.py:60). Here distance
is a Catalyst expression over ARRAY<FLOAT> columns — `zip_with` +
`aggregate` — so Catalyst can codegen it and no Python is involved. The
Arrow/numpy fast path for *batch* kNN lives in operators/knn.py; these
expressions are the composable, oracle-matching building blocks.

All math is done in DOUBLE (elements cast up from float) with left-to-right
summation, matching the DuckDB oracle formulation element-for-element so
distances agree to the last ulp wherever summation order matters.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(c: Column) -> Column:
    return c.cast("double")


def squared_l2(a: Column | str, b: Column | str) -> Column:
    """Sum_i (a_i - b_i)^2 as DOUBLE. Squared L2 preserves kNN order and
    avoids the sqrt (the reference's FAISS IndexHNSWFlat also ranks by
    squared L2 internally)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    diffs = F.zip_with(a, b, lambda x, y: (_as_double(x) - _as_double(y)) * (_as_double(x) - _as_double(y)))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def dot_product(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: _as_double(x) * _as_double(y))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(a, F.lit(0.0), lambda acc, v: acc + _as_double(v) * _as_double(v))
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
