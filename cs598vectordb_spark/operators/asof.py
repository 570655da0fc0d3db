"""As-of and ranged temporal joins (SURVEY.md §2.6 — absent in the
reference, claimed here as first-class engine ops).

``asof_join`` uses the union-merge formulation, not a theta-join: tag both
sides, union, one shuffle on the equality key, sort by event time within
the key, and propagate the most recent right-side row to each left row
with last(..., ignorenulls). Cost is one exchange + sort over |L|+|R|
rows — the shape that survives 100 TB, where the naive
join-on-key-then-filter-then-argmax pays |L|·|R| per key and dies on any
hot key. (Same plan a Delta/Flink temporal join runs underneath.)

``range_count_join`` keeps an equality key plus a time-band predicate, so
Catalyst executes hash-join-then-band-filter — linear in matched pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the latest right row with
    right.ts <= left.ts in the same `by` group (left outer: unmatched left
    rows keep nulls). Right payload columns come back renamed with
    `suffix`, plus `ts<suffix>` for the matched right timestamp. At equal
    timestamps the right row is visible to the left row (side sorts
    right-before-left). Left payload rides through the union, so no row
    ids and no second join are needed.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (by, ts_col)]
    left_cols = [c for c in left.columns if c not in (by, ts_col)]

    l2 = left.select(
        F.col(by),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r2 = right.select(
        F.col(by),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left_cols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l2.unionByName(r2)
    return (
        merged.select(
            by,
            ts_col,
            "_side",
            *left_cols,
            *[
                F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in right_cols
            ],
            F.last(F.when(F.col("_side") == 0, F.col(ts_col)), ignorenulls=True)
            .over(w)
            .alias(f"{ts_col}{suffix}"),
        )
        .filter(F.col("_side") == 1)
        .drop("_side")
    )


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts_col: str = "ts",
    window_seconds: int = 600,
    count_name: str = "n_in_range",
) -> DataFrame:
    """Per left row: count right rows in (left.ts, left.ts + window] for
    the same `by` key — equality-keyed band join (hash join + band filter,
    never a cross product). Left rows with no matches keep count 0."""
    l = left.select(
        F.col(by),
        F.col(ts_col).alias("_l_ts"),
        *[c for c in left.columns if c not in (by, ts_col)],
    )
    r = right.select(F.col(by).alias("_r_by"), F.col(ts_col).alias("_r_ts"))
    band = (F.col("_r_ts") > F.col("_l_ts")) & (
        F.col("_r_ts") <= F.col("_l_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS")
    )
    keys = [c for c in l.columns if c != "_l_ts"] + ["_l_ts"]
    return (
        l.join(r, (F.col(by) == F.col("_r_by")) & band, "left")
        .groupBy(*[F.col(c) for c in keys])
        .agg(F.count("_r_ts").alias(count_name))
        .withColumnRenamed("_l_ts", ts_col)
    )
