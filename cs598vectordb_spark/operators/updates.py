"""Snapshot-based delete / insert / upsert — the reference's "dynamic
updates" (U1-U3) without threads.

Reference semantics (SURVEY.md §2.3): delete a percentage of the base set
(the tail slice of ids — dynamic_script_redis.py:149 deletes
ids >= base-n; FAISS/hnswlib rebuild on the surviving prefix,
dynamic_script_faiss.py:92-96), then re-insert the same slice
(dynamic_script_faiss.py:108) and verify recall returns to baseline.

Spark-first stance: a "dynamic" index is a sequence of immutable snapshot
tables. Delete = filtered overwrite, insert = union/append, upsert-guard =
left-anti join (Redis `if not r.exists(key)`, dynamic_script_redis.py:53).
Snapshot isolation replaces the reference's (commented-out) lock — readers
keep querying snapshot v_n while v_{n+1} is written, which is exactly the
concurrent-search-during-rebuild behavior the reference measures, minus
the race. At 100 TB each transition is a metadata swap plus a columnar
rewrite of only the affected partition ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tail_cutoff(base: DataFrame, pct: int, id_col: str = "vec_id") -> int:
    """First id of the tail `pct`% slice, assuming dense 0..N-1 ids (the
    reference's arange id space, dynamic_script_faiss.py:57)."""
    n = base.count()
    return n - (n * pct) // 100


def delete_tail_pct(base: DataFrame, pct: int, id_col: str = "vec_id") -> DataFrame:
    """U1: snapshot v1 = v0 minus the highest pct% of ids. The predicate
    pushes to the scan; at scale this prunes whole partitions when the
    table is range-partitioned by id."""
    return base.filter(F.col(id_col) < F.lit(tail_cutoff(base, pct, id_col)))


def deleted_tail_slice(base: DataFrame, pct: int, id_col: str = "vec_id") -> DataFrame:
    return base.filter(F.col(id_col) >= F.lit(tail_cutoff(base, pct, id_col)))


def insert_rows(snapshot: DataFrame, new_rows: DataFrame) -> DataFrame:
    """U2: append — v2 = v1 ∪ slice. Union is a no-shuffle concatenation
    of partition lists; the write appends files, never rewrites v1."""
    return snapshot.unionByName(new_rows)


def upsert_guard(snapshot: DataFrame, candidates: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """U3: keep only candidate rows whose id is NOT already present
    (left-anti join). Spark broadcasts the smaller side automatically; at
    scale with a huge candidate set this becomes a shuffled anti-join on
    the id — still one exchange."""
    return candidates.join(snapshot.select(id_col), on=id_col, how="left_anti")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    id_col: str = "vec_id",
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Delta-style MERGE INTO target USING source ON id — WHEN MATCHED
    UPDATE SET update_cols from source, WHEN NOT MATCHED INSERT * —
    expressed as ONE full-outer join plus a coalesce projection: a single
    shuffle on the id, no driver loop. On a Delta/Iceberg table this maps
    to the native MERGE command; on plain parquet the result is the next
    immutable snapshot. Adds a `_merge_action` column
    (updated/inserted/kept) so callers can audit the row-level outcome."""
    update_cols = update_cols or [c for c in source.columns if c != id_col]
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col(f"t.{id_col}") == F.col(f"s.{id_col}"), "full_outer")
    out_cols = [F.coalesce(F.col(f"t.{id_col}"), F.col(f"s.{id_col}")).alias(id_col)]
    for c in target.columns:
        if c == id_col:
            continue
        if c in update_cols and c in source.columns:
            out_cols.append(F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c))
        elif c in source.columns:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}"))
    action = (
        F.when(F.col(f"t.{id_col}").isNotNull() & F.col(f"s.{id_col}").isNotNull(), F.lit("updated"))
        .when(F.col(f"t.{id_col}").isNull(), F.lit("inserted"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(*out_cols, action.alias("_merge_action"))


def snapshot_checksum(df: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Order-insensitive snapshot identity: (row count, id sum, distinct
    ids). Used by tests and the dynamic protocol to assert v2 == v0 (the
    reference's recall-returns-to-baseline stability signal,
    logs/dynamic_updates_hnswlib.txt intervals 1 vs final)."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(id_col)).alias("id_sum"),
        F.countDistinct(F.col(id_col)).alias("n_distinct"),
    )
