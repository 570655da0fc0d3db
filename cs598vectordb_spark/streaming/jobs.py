"""Structured Streaming surface (SURVEY.md §2.6 streaming row).

The reference's "dynamic" workload is phased batch updates driven by
threads (/root/reference/dynamic_script_faiss.py:75-117) — no event-time
semantics. This module supplies the streaming capabilities a Spark-native
engine owes the same data: file-source micro-batches, event-time windows
with watermarks, session windows, arbitrary stateful processing
(applyInPandasWithState), and foreachBatch CDC-style snapshot ingest (the
streaming variant of U1/U2 delete/insert).

Determinism contract (what makes these oracle-checkable):
* trigger(availableNow) drains the source and runs a final no-data batch,
  so append-mode emission is exactly "window.end <= max(event_ts) - delay"
  — a closed-form predicate the DuckDB oracle reproduces.
* multi-batch runs split input into one file per micro-batch
  (maxFilesPerTrigger=1) with staggered mtimes; the file source processes
  oldest-first, fixing batch order.

Scale notes: state stores partition by grouping key (shuffle.partitions
state shards); watermarks bound state size — without them session state
would grow forever at 100 TB/day. foreachBatch snapshot writes would be
Delta/Iceberg MERGE on a cluster; plain parquet versions model the same
snapshot-isolation semantics the reference gets from full rebuilds.
"""

from __future__ import annotations

import itertools
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs598vectordb_spark.sources.tables import _align_session, normalize_ts

_MEM_SEQ = itertools.count()


def _stream_session(spark: SparkSession, state_partitions: int | None = None) -> SparkSession:
    """Isolated child session for a streaming job: shares the
    SparkContext (executors, scheduler pools) but owns its SQLConf, with
    the stateful-stream shuffle width pinned keyspace-sized
    (config.STREAM_STATE_PARTITIONS — every state shard is a store
    instance with per-batch open/commit overhead, so core-sized widths
    are pure scheduling tax for a few hundred keys).

    A child session, NOT a temporary set/restore of the session-global
    conf: under the FAIR scheduler a concurrent batch query planned by a
    ThreadPoolExecutor workload (multi_tenant) during the set/restore
    window would silently inherit the narrowed width (ADVICE r7). The
    conf is pinned into the stream's checkpoint at start and immutable
    thereafter; the parent session's batch plans never see it."""
    from cs598vectordb_spark.config import STREAM_STATE_PARTITIONS

    child = spark.newSession()
    _align_session(child)
    child.conf.set(
        "spark.sql.shuffle.partitions",
        str(state_partitions or STREAM_STATE_PARTITIONS),
    )
    return child


def _start_to_memory(writer_df: DataFrame, mode: str, prefix: str):
    """Start an availableNow stream into a uniquely-named memory sink and
    drain it. Returns (query, sink_name) — the single place the
    start/await boilerplate lives, shared by the result path
    (_run_to_memory) and the progress-metrics path
    (_drain_with_progress)."""
    name = f"{prefix}_{os.getpid()}_{next(_MEM_SEQ)}"
    q = (
        writer_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q, name


def _run_to_memory(writer_df: DataFrame, mode: str = "append") -> DataFrame:
    """Start an availableNow stream into a uniquely-named memory sink, wait
    for it to drain, and return the sink contents as a batch DataFrame.

    The writer_df must be built on a _stream_session child (every
    builder in this module rebinds to one first), so the narrowed
    shuffle width travels with the DataFrame's own session — no
    session-global conf mutation."""
    spark = writer_df.sparkSession
    _, name = _start_to_memory(writer_df, mode, "stream_sink")
    return spark.table(name)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table (schema pinned from the
    batch reader; ts normalized to TIMESTAMP exactly as sources/tables.py
    — watermarks reject TIMESTAMP_NTZ, so the normalization is load-bearing)."""
    spark = _stream_session(spark)
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = (
        spark.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_ts(stream, "ts")


def hourly_counts(spark: SparkSession, sf_dir: str, delay: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregate; emits the windows the final
    watermark closed: hour + 1h <= max(ts) - delay."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    out = _run_to_memory(agg)
    return out.select(
        F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value"
    )


def sessionize_stream(
    spark: SparkSession, sf_dir: str, gap: str = "30 minutes", delay: str = "30 minutes"
) -> DataFrame:
    """Session windows (30-min inactivity gap) per user. Emitted sessions
    are those the final watermark closed: last_event + gap <= max(ts) -
    delay. Boundary semantics match the batch sessionizer for all real
    data (they differ only on a gap of exactly 1800.000000s)."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("session_value"))
    )
    out = _run_to_memory(agg)
    return out.select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end_gap"),
        "n_events",
        "session_value",
    )


# ------------------------------------------------------- multi-batch input


def split_events_files(
    spark: SparkSession, sf_dir: str, out_dir: str, n_splits: int = 3
) -> None:
    """Materialize events as `n_splits` single-file parquets (split on
    event_id % n) with staggered mtimes so the file source replays them as
    ordered micro-batches."""
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    _align_session(spark)
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    now = time.time()
    for i in range(n_splits):
        tmp = os.path.join(out_dir, f"_tmp{i}")
        ev.filter(F.col("event_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(out_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))


def stateful_user_counts(
    spark: SparkSession, sf_dir: str, work_dir: str, n_splits: int = 3
) -> DataFrame:
    """Arbitrary stateful op via applyInPandasWithState: a per-user running
    event counter across micro-batches. Each batch emits the user's updated
    running total; the batch result reduces to max(running) per user ==
    total events per user, which the oracle recomputes relationally.

    This is the engine's `applyInPandasWithState` slot — swap the counter
    body for any custom per-key streaming state machine (the reference has
    none; its background loop keeps no per-key state)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    split_events_files(spark, sf_dir, work_dir, n_splits)
    spark = _stream_session(spark)
    batch = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    stream = normalize_ts(
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(work_dir),
        "ts",
    )

    def update(key, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        import pandas as pd

        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "running": [total]})

    counted = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, running long",
        stateStructType="running long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(counted, mode="update")
    return out.groupBy("user_id").agg(F.max("running").alias("n_events"))


def stream_dedup(
    spark: SparkSession, sf_dir: str, work_dir: str, n_splits: int = 3
) -> DataFrame:
    """Streaming exact dedup over a document stream — the incremental form
    of operators.dedup.dedup_exact, keyed on md5(normalized text) with
    first-seen-wins state (applyInPandasWithState): the first batch that
    carries a fingerprint claims it (lowest doc_id inside that batch);
    docs arriving in later batches, or behind the winner in the same
    batch, emit is_dup=true. State is one (winner_id) per distinct
    fingerprint — the bounded dedup cache a 100 TB crawl keeps per shard.

    Batch order is doc_id % n_splits (ordered files), so the winner of a
    fingerprint is the doc minimizing (doc_id % n_splits, doc_id) — a
    closed form the DuckDB oracle reproduces.

    Chosen closed form for re-arrivals (exactly-once input assumed; the
    file source delivers each doc once): is_dup = (doc_id != winner). A
    REPLAYED winner row would therefore be emitted non-dup again — if an
    at-least-once upstream is ever routed through this job, add a per-key
    `emitted` flag to the state so the winner emits non-dup exactly once
    (the stream_drop_duplicates job is the declarative way to get that
    semantics today)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    spark = _stream_session(spark)
    docs_path = os.path.join(sf_dir, "documents.parquet")
    batch = spark.read.parquet(docs_path)
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(work_dir)
    fp = batch.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fingerprint"),
    )
    now = time.time()
    for i in range(n_splits):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        fp.filter(F.col("doc_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(work_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema("doc_id long, fingerprint string")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "batch*.parquet")
        .parquet(work_dir)
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        # Drain every Arrow chunk before picking the winner (same
        # cross-chunk rule as stream_near_dedup): the batch-wide winner
        # is the min doc_id over the WHOLE micro-batch.
        all_ids: list[int] = []
        for pdf in pdf_iter:
            all_ids.extend(int(x) for x in pdf["doc_id"].tolist())
        all_ids.sort()
        winner = state.get[0] if state.exists else (all_ids[0] if all_ids else None)
        state.update((winner,))
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]] * len(all_ids),
                "doc_id": all_ids,
                "is_dup": [did != winner for did in all_ids],
                "winner_id": [winner] * len(all_ids),
            }
        )

    deduped = stream.groupBy("fingerprint").applyInPandasWithState(
        update,
        outputStructType="fingerprint string, doc_id long, is_dup boolean, winner_id long",
        stateStructType="winner long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(deduped, mode="update")
    return out.select("doc_id", "is_dup", "winner_id")


def late_data_hourly(
    spark: SparkSession, sf_dir: str, work_dir: str, delay: str = "1 hour"
) -> DataFrame:
    """Watermark late-data DROP accounting: the older half of the events
    table arrives two micro-batches AFTER the newer half, so by the time
    it arrives the input-side late filter (which lags the watermark by
    ONE batch — measured semantics, see the module docstring notes) has
    already advanced past every window it belongs to, and Structured
    Streaming drops all of it. The emitted hourly aggregate therefore
    contains ONLY on-time contributions; the oracle reproduces that
    closed-form (on-time partition, windows ≤ final watermark), so the
    drop rule itself is value-hash-checked.

    Batch layout: batch0 = on-time rows below the final hour (establishes
    the watermark), batch1 = the final-hour on-time rows (their windows
    never close, so they add nothing to the output — they exist to age
    the batch0 watermark into the input filter), batch2 = everything
    before the time cutoff (all dropped). Cutoff = integer-µs midpoint of
    (min ts, max ts), identical in the oracle. At scale this op is how a
    pipeline measures what a given watermark delay would discard."""
    from cs598vectordb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    mn_us, mx_us, top_hour = ev.agg(
        F.unix_micros(F.min("ts")),
        F.unix_micros(F.max("ts")),
        F.unix_micros(F.date_trunc("hour", F.max("ts"))),
    ).first()
    cutoff_us = (mn_us + mx_us) // 2

    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    in_dir = os.path.join(work_dir, "batches")
    os.makedirs(in_dir)
    now = time.time()
    us = F.unix_micros("ts")
    parts = [
        ("ontime", ev.filter((us >= cutoff_us) & (us < top_hour))),
        ("final_hour", ev.filter(us >= top_hour)),
        ("late", ev.filter(us < cutoff_us)),
    ]
    schema = None
    for i, (name, part) in enumerate(parts):
        tmp = os.path.join(work_dir, f"_tmp_{name}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        f = next(x for x in os.listdir(tmp) if x.endswith(".parquet"))
        dst = os.path.join(in_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, f), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))
        schema = part.schema

    spark = _stream_session(spark)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    out = _run_to_memory(agg)
    return out.select(
        F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value"
    )


def stream_knn(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    n_splits: int = 3,
    k: int = 10,
    n_queries: int = 100,
    probe=None,
) -> DataFrame:
    """Streaming kNN serving — the reference's background search loop
    (dynamic_script_faiss.py:31-43) as a Structured Streaming job: query
    vectors ARRIVE as ordered micro-batches (the online-serving shape) and
    each foreachBatch runs the exact kNN operator against the static base
    snapshot, appending per-query top-k results.

    Deterministic: the batches partition the query set (q_id % n_splits),
    and per-query results are independent, so the drained union equals
    batch kNN over all queries regardless of arrival order — which is
    exactly what the DuckDB oracle computes.

    `probe` swaps the serving engine: None = the exact kernel (the
    oracle-checked configuration); a callable (query_batch -> (q_id,
    rank, vec_id)) serves from an index instead — stream_knn_graph2
    passes the hierarchical-graph probe, the index-backed online-serving
    architecture, with recall vs exact floored in pytest. The streaming
    plumbing is identical either way."""
    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    base = load_table(spark, sf_dir, "embeddings")
    queries = queries_from_embeddings(base, n_queries)

    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    qdir = os.path.join(work_dir, "queries")
    os.makedirs(qdir)
    now = time.time()
    for i in range(n_splits):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        queries.filter(F.col("q_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(qdir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    out_dir = os.path.join(work_dir, "results")
    spark = _stream_session(spark)
    stream = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(qdir)
    )

    def serve(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = (
            probe(batch_df)
            if probe is not None
            else knn_exact(base, batch_df, k=k).select("q_id", "rank", "vec_id")
        )
        res.write.mode("append").parquet(out_dir)

    q = stream.writeStream.foreachBatch(serve).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(out_dir)


def ingest_updates(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """foreachBatch CDC ingest — the streaming variant of U1 delete / U2
    insert (ref rebuild-deletes dynamic_script_faiss.py:92-108): an ordered
    op stream (delete %10==3, delete %10==7, re-insert %10==3) applied
    micro-batch-by-micro-batch to versioned embedding snapshots. Returns
    the final snapshot summary; net effect = delete of vec_id%10==7.
    """
    spark = _stream_session(spark)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ops_dir = os.path.join(work_dir, "ops")
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(ops_dir)

    def op_df(op: str, pred):
        rows = emb.filter(pred)
        return rows.select(
            F.lit(op).alias("op"),
            "vec_id",
            (F.col("embedding") if op == "insert" else F.lit(None).cast("array<float>")).alias("embedding"),
            (F.col("label") if op == "insert" else F.lit(None).cast("int")).alias("label"),
        )

    plan = [
        op_df("delete", F.col("vec_id") % 10 == 3),
        op_df("delete", F.col("vec_id") % 10 == 7),
        op_df("insert", F.col("vec_id") % 10 == 3),
    ]
    now = time.time()
    for i, df in enumerate(plan):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(ops_dir, f"op{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    versions = {"cur": os.path.join(work_dir, "snap_v0")}
    emb.write.mode("overwrite").parquet(versions["cur"])

    ops_schema = "op string, vec_id long, embedding array<float>, label int"

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        snap = spark.read.parquet(versions["cur"])
        dels = batch_df.filter(F.col("op") == "delete").select("vec_id")
        ins = batch_df.filter(F.col("op") == "insert").select("vec_id", "embedding", "label")
        new = snap.join(F.broadcast(dels), "vec_id", "left_anti").unionByName(ins)
        nxt = os.path.join(work_dir, f"snap_v{batch_id + 1}")
        new.write.mode("overwrite").parquet(nxt)
        versions["cur"] = nxt

    stream = (
        spark.readStream.schema(ops_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ops_dir)
    )
    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    final = spark.read.parquet(versions["cur"])
    return final.select(
        F.count("*").alias("n"),
        F.sum("vec_id").alias("sum_vec_id"),
        F.sum("label").alias("sum_label"),
    )


def merge_upserts_stream(spark: SparkSession, sf_dir: str, work_dir: str) -> DataFrame:
    """Streaming MERGE sink — the Delta/Iceberg-shaped upsert path the
    CDC ingest (ingest_updates) models with delete/insert ops, here with
    true last-writer-wins MERGE semantics: each micro-batch of keyed
    upsert rows is applied as `WHEN MATCHED UPDATE, WHEN NOT MATCHED
    INSERT` against a copy-on-write snapshot version (plain parquet
    standing in for a Delta commit; on a cluster foreachBatch would call
    DeltaTable.merge, the documented pattern for streaming upserts).

    Batch order is fixed (one file per trigger, staggered mtimes) and a
    monotonically increasing `seq` disambiguates same-key rows WITHIN a
    batch, so the final table is deterministic: label+300 for vec_id%10
    ==2 (updated twice, last write wins), +200 for %10==5, else the base
    row — the closed form the DuckDB oracle reproduces."""
    spark = _stream_session(spark)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ops_dir = os.path.join(work_dir, "ops")
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(ops_dir)

    def upserts(pred, bump: int, seq: int) -> DataFrame:
        return emb.filter(pred).select(
            F.lit(seq).alias("seq"),
            "vec_id",
            "embedding",
            (F.col("label") + bump).alias("label"),
        )

    plan = [
        upserts(F.col("vec_id") % 10 == 2, 100, 0),
        upserts(F.col("vec_id") % 10 == 5, 200, 1),
        upserts(F.col("vec_id") % 10 == 2, 300, 2),  # same keys again
    ]
    now = time.time()
    for i, df in enumerate(plan):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(ops_dir, f"op{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    versions = {"cur": os.path.join(work_dir, "snap_v0")}
    emb.select("vec_id", "embedding", "label").write.mode("overwrite").parquet(
        versions["cur"]
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        # within-batch dedup: keep the highest seq per key (last writer)
        latest = batch_df.groupBy("vec_id").agg(F.max("seq").alias("seq"))
        rows = batch_df.join(latest, ["vec_id", "seq"]).select(
            "vec_id", "embedding", "label"
        )
        snap = spark.read.parquet(versions["cur"])
        merged = snap.join(
            F.broadcast(rows.select("vec_id")), "vec_id", "left_anti"
        ).unionByName(rows)
        nxt = os.path.join(work_dir, f"snap_v{batch_id + 1}")
        merged.write.mode("overwrite").parquet(nxt)
        versions["cur"] = nxt

    stream = (
        spark.readStream.schema("seq int, vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", "1")
        .parquet(ops_dir)
    )
    q = stream.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(versions["cur"]).select("vec_id", "label")


def merge_upserts_cow_stream(
    spark: SparkSession, sf_dir: str, work_dir: str, n_parts: int = 10
) -> DataFrame:
    """Partition-pruned copy-on-write streaming MERGE — the at-scale
    version of merge_upserts_stream, whose whole-snapshot rewrite per
    micro-batch is O(|table|) per batch and quadratic over a run. Here
    the snapshot is hash-partitioned on pid = vec_id % n_parts
    (partitionBy layout on disk) and each micro-batch:

      1. derives the touched partition set from the batch keys (collect
         is bounded by n_parts — a handful of ints, never rows),
      2. reads ONLY those partitions — `pid IN (...)` prunes at the
         scan, visible as PartitionFilters in the plan (tests/test_plans),
      3. merges (broadcast anti-join + union, last-writer-wins within
         the batch via max(seq)),
      4. rewrites ONLY the touched partition directories via dynamic
         partition overwrite; untouched partitions keep their files
         byte-identical (mtime-pinned in tests/test_streaming.py).

    Batch cost scales with |touched partitions|, not |table| — at 100 TB
    with daily-partitioned data this is the Delta/Iceberg/Hudi COW write
    path (foreachBatch + MERGE in those formats adds commit atomicity; a
    plain parquet dir stands in here). The localCheckpoint before the
    rewrite materializes the merged rows so the self-overwrite is safe
    (Spark otherwise refuses to overwrite a path it is reading).

    Reference analog: Milvus predicate delete + re-flush touches only the
    affected segment, not the collection
    (/root/reference/dynamic_script_milvus.py:133-146)."""
    spark = _stream_session(spark)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    ops_dir = os.path.join(work_dir, "ops")
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(ops_dir)

    def upserts(pred, bump: int, seq: int) -> DataFrame:
        return emb.filter(pred).select(
            F.lit(seq).alias("seq"),
            "vec_id",
            "embedding",
            (F.col("label") + bump).alias("label"),
        )

    plan = [
        upserts(F.col("vec_id") % 10 == 2, 100, 0),
        upserts(F.col("vec_id") % 10 == 5, 200, 1),
        upserts(F.col("vec_id") % 10 == 2, 300, 2),  # same keys again
    ]
    now = time.time()
    for i, df in enumerate(plan):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(ops_dir, f"op{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    snap_dir = os.path.join(work_dir, "snapshot")
    pid = (F.col("vec_id") % n_parts).cast("int").alias("pid")
    emb.select("vec_id", "embedding", "label", pid).write.partitionBy(
        "pid"
    ).parquet(snap_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        latest = batch_df.groupBy("vec_id").agg(F.max("seq").alias("seq"))
        rows = batch_df.join(latest, ["vec_id", "seq"]).select(
            "vec_id", "embedding", "label", pid
        )
        # bounded collect: at most n_parts ints, never data rows
        touched = [r[0] for r in rows.select("pid").distinct().collect()]
        pruned = spark.read.parquet(snap_dir).filter(F.col("pid").isin(touched))
        merged = (
            pruned.join(F.broadcast(rows.select("vec_id")), "vec_id", "left_anti")
            .unionByName(rows)
            .localCheckpoint()  # break file lineage before self-overwrite
        )
        merged.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("pid").parquet(snap_dir)

    stream = (
        spark.readStream.schema("seq int, vec_id long, embedding array<float>, label int")
        .option("maxFilesPerTrigger", "1")
        .parquet(ops_dir)
    )
    q = stream.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.read.parquet(snap_dir).select("vec_id", "label")


def stream_near_dedup(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    n_splits: int = 3,
    k: int = 16,
    bands: int = 8,
    rows: int = 2,
) -> DataFrame:
    """Streaming NEAR-duplicate dedup — the incremental form of
    minhash_lsh_dedup, completing the dedup matrix (exact batch, exact
    stream, near batch, near stream): banded MinHash bucket claims with
    first-seen-wins state.

    The banded signature table (doc_id, band, sig) — the same bands the
    batch pipeline bucket-joins — is computed batch-side and split into
    ordered micro-batch files (doc_id % n_splits, staggered mtimes,
    exactly the stream_dedup pattern). The STREAM is the part a crawl
    pipeline genuinely runs incrementally: each (band, sig) bucket keeps
    ONE winner (first batch to arrive; lowest doc_id within that batch),
    held in applyInPandasWithState — one long per distinct band
    signature, the bounded incremental dedup cache a 100 TB crawl keeps
    per shard. A doc hitting any already-claimed bucket is a near-dup
    CANDIDATE of that bucket's winner (P[band collision] tracks Jaccard;
    the batch verify stage prunes false positives downstream, exactly as
    in minhash_lsh_dedup).

    Deterministic closed form (ordered batches): bucket winner =
    argmin over the bucket of (doc_id % n_splits, doc_id); a doc is
    flagged iff some bucket pairs it with a different winner, and
    dup_of = the smallest such winner — reproduced exactly by the
    DuckDB oracle."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from cs598vectordb_spark.operators.dedup import minhash_signatures

    spark = _stream_session(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sigs = minhash_signatures(docs, k)
    band_cols = []
    for b in range(bands):
        s = F.concat_ws(
            "-", *[F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        )
        band_cols.append(F.struct(F.lit(b).alias("band"), s.alias("sig")))
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bs")
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(work_dir)
    now = time.time()
    for i in range(n_splits):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        banded.filter(F.col("doc_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(work_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema("doc_id long, band int, sig string")
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "batch*.parquet")
        .parquet(work_dir)
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        # Drain EVERY Arrow chunk before picking the winner: a large
        # (band, sig) bucket arrives split across chunks once it exceeds
        # maxRecordsPerBatch, and the batch-wide winner must be the min
        # doc_id over the whole micro-batch (the oracle's closed form),
        # not the min of whichever chunk came first.
        all_ids: list[int] = []
        for pdf in pdf_iter:
            all_ids.extend(int(x) for x in pdf["doc_id"].tolist())
        all_ids.sort()
        winner = state.get[0] if state.exists else (all_ids[0] if all_ids else None)
        state.update((winner,))
        yield pd.DataFrame(
            {"doc_id": all_ids, "winner_id": [winner] * len(all_ids)}
        )

    claimed = stream.groupBy("band", "sig").applyInPandasWithState(
        update,
        outputStructType="doc_id long, winner_id long",
        stateStructType="winner_id long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    out = _run_to_memory(claimed, mode="update")
    return (
        out.groupBy("doc_id")
        .agg(
            F.min(
                F.when(F.col("winner_id") != F.col("doc_id"), F.col("winner_id"))
            ).alias("dup_of")
        )
        .select("doc_id", F.col("dup_of").isNotNull().alias("is_dup"), "dup_of")
    )


def stream_quality_gate(
    spark: SparkSession, sf_dir: str, work_dir: str, n_splits: int = 3
) -> DataFrame:
    """Streaming Gopher quality gate: the full repetition_scores filter
    bank applied PER MICRO-BATCH on a file stream of document splits,
    keeping only non-repetitive docs — quality gating belongs at the
    ingest edge (filter before you store), and because the bank is a
    pure per-row projection it streams with NO state, NO watermark,
    and exact batch/stream parity: the drained union over micro-batches
    equals repetition_scores(batch).filter(~repetitive) row for row
    (pinned in tests/test_streaming.py::
    test_stream_quality_gate_matches_batch). ORACLE PROMOTED r13
    (queued since r12): repetition_scores' SQL + WHERE NOT repetitive,
    dress-rehearsed end to end against DuckDB in tests/
    test_streaming.py::test_stream_quality_gate_queued_oracle.

    At 100 TB/day this is the shape that matters: the gate's cost is
    the scan itself (zero shuffle; one Arrow kernel per micro-batch
    since the r12 repetition rewrite), so ingest-time filtering is
    free relative to storing-then-filtering."""
    from cs598vectordb_spark.operators.textops import repetition_scores

    spark = _stream_session(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(work_dir)
    now = time.time()
    for i in range(n_splits):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        docs.filter(F.col("doc_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(work_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "batch*.parquet")
        .parquet(work_dir)
    )
    gated = repetition_scores(stream).filter(~F.col("repetitive"))
    return _run_to_memory(gated, "append")


def hourly_counts_to_parquet(
    spark: SparkSession, sf_dir: str, work_dir: str, delay: str = "1 hour"
) -> DataFrame:
    """The PRODUCTION sink path: the watermarked hourly aggregate written
    through a checkpointed parquet file sink (append mode) and read back
    via the sink's _spark_metadata manifest — the exactly-once mechanism
    a 100 TB pipeline relies on (output files commit atomically through
    the manifest; a replay from the same checkpoint emits nothing new,
    asserted in tests/test_streaming.py). Same closed-form emission as
    hourly_counts, so the same DuckDB oracle grades the files on disk.

    The memory-sink jobs verify streaming SEMANTICS; this one verifies
    the durable-output contract."""
    data_dir = os.path.join(work_dir, "data")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    agg = (
        events_stream(spark, sf_dir)  # rebinds onto a _stream_session child
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", data_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # reading the sink DIRECTORY goes through _spark_metadata: only files
    # the manifest committed are visible (a crashed write's orphans are not)
    return spark.read.parquet(data_dir)


def cow_dynamic_protocol(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    pct: int = 50,
    k: int = 10,
    n_queries: int = 50,
    n_parts: int = 8,
) -> DataFrame:
    """The reference's concurrent update/search measurement
    (/root/reference/dynamic_script_faiss.py:75-117) end to end on the
    engine's BEST write path and BEST index together: deletes/inserts
    arrive as ordered streaming micro-batches, each foreachBatch applies
    them to a partition-pruned copy-on-write parquet snapshot (the
    merge_upserts_cow_stream write path) AND incrementally maintains the
    serving layered2 hierarchical index (delete = one semi-join
    tombstone pass, insert = repair of only the delta's segments —
    graph.py delete_from_layered2/insert_into_layered2), then probes the
    maintained index and records qps/latency/recall in the reference's
    summary shape (workloads.METRICS_SCHEMA). No snapshot rebuild
    anywhere: the batch cost is |touched partitions| for storage plus
    |touched segments| for the index — the 100 TB shape, where a full
    rebuild per update cycle would be the scale-killer the reference
    measures FAISS/NGT suffering (BASELINE.md -52% QPS during rebuild).

    Recall is scored against the FIXED pre-update ground truth (the
    reference loads gt once, dynamic_script_faiss.py:21); the
    post-insert row recovering to >= baseline - 0.02 is pinned in
    tests/test_streaming.py."""
    from cs598vectordb_spark.operators import updates as upd
    from cs598vectordb_spark.operators.graph import (
        build_layered_graph2,
        delete_from_layered2,
        insert_into_layered2,
        knn_graph_layered2,
    )
    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.operators.workloads import METRICS_SCHEMA, _measure
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    queries = queries_from_embeddings(base, n_queries)
    n_q = queries.count()
    truth = knn_exact(base, queries, k).cache()
    truth.count()

    def probe(idx, q):
        return knn_graph_layered2(
            idx, q, k, nprobe1=4, nprobe2=12, beam=32, rounds=4, n_entry=12
        ).select("q_id", "rank", "vec_id")

    state = {"idx": build_layered_graph2(base, nlist1=4, nlist2=4, degree=16)}
    stale = [state["idx"]]
    rows: list[tuple] = []
    interval = {"i": 0}

    def record(phase: str) -> None:
        qps, lat, rec = _measure(probe(state["idx"], queries), truth, n_q, k)
        rows.append(
            ("cow_run", "graph2_cow", phase, interval["i"], n_q, qps, lat, rec, pct, 1, True)
        )
        interval["i"] += 1

    record("baseline")

    # ---- COW storage snapshot, partitioned for pruned rewrites
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    ops_dir = os.path.join(work_dir, "ops")
    os.makedirs(ops_dir)
    snap_dir = os.path.join(work_dir, "snapshot")
    pid = (F.col("vec_id") % n_parts).cast("int").alias("pid")
    base.select("vec_id", "embedding", "label", pid).write.partitionBy("pid").parquet(
        snap_dir
    )

    # ---- ordered update stream: batch0 = delete tail pct, batch1 = re-insert
    delta = upd.deleted_tail_slice(base, pct)
    op_frames = [
        delta.select(
            F.lit("delete").alias("op"),
            "vec_id",
            F.lit(None).cast("array<float>").alias("embedding"),
            F.lit(None).cast("int").alias("label"),
        ),
        delta.select(F.lit("insert").alias("op"), "vec_id", "embedding", "label"),
    ]
    now = time.time()
    for i, df in enumerate(op_frames):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(ops_dir, f"op{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    def read_snapshot(bs: SparkSession) -> DataFrame:
        # a prior batch may have emptied EVERY partition (pct=100), and
        # schema inference throws on a parquet dir with no part files
        has_files = any(
            f.endswith(".parquet") for _, _, fs in os.walk(snap_dir) for f in fs
        )
        if has_files:
            return bs.read.parquet(snap_dir)
        return bs.createDataFrame(
            [], "vec_id long, embedding array<float>, label int, pid int"
        )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        bs = batch_df.sparkSession
        dels = batch_df.filter(F.col("op") == "delete").select("vec_id")
        ins = batch_df.filter(F.col("op") == "insert").select(
            "vec_id", "embedding", "label"
        )
        keys = batch_df.select("vec_id", (F.col("vec_id") % n_parts).cast("int").alias("pid"))
        # bounded collect: at most n_parts ints, never data rows
        touched = [r[0] for r in keys.select("pid").distinct().collect()]
        pruned = read_snapshot(bs).filter(F.col("pid").isin(touched))
        merged = (
            pruned.join(F.broadcast(keys.select("vec_id")), "vec_id", "left_anti")
            .unionByName(ins.select("vec_id", "embedding", "label", pid))
            .localCheckpoint()  # break file lineage before self-overwrite
        )
        merged.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("pid").parquet(snap_dir)
        # dynamic overwrite rewrites only partitions PRESENT in `merged`:
        # a batch that deletes every surviving row of a touched pid (e.g.
        # pct=100, or a tail slice emptying a small partition) leaves that
        # pid absent from `merged`, its old files intact, and the deleted
        # rows would silently resurrect (ADVICE r8). Drop those partition
        # dirs explicitly — `touched` minus merged-pids is ≤ n_parts ints.
        merged_pids = {r[0] for r in merged.select("pid").distinct().collect()}
        for p in set(touched) - merged_pids:
            emptied = os.path.join(snap_dir, f"pid={p}")
            if os.path.isdir(emptied):
                shutil.rmtree(emptied)

        # ---- incremental index maintenance on the SAME micro-batch
        if not dels.isEmpty():
            keep = read_snapshot(bs).select("vec_id")
            nxt = delete_from_layered2(
                state["idx"], keep, dropped=dels.select("vec_id")
            )
            state["idx"] = nxt
            stale.append(nxt)
            record(f"post_delete")
        if not ins.isEmpty():
            nxt = insert_into_layered2(state["idx"], ins)
            state["idx"] = nxt
            stale.append(nxt)
            record(f"post_insert")

    stream_spark = _stream_session(spark)
    stream = (
        stream_spark.readStream.schema(
            "op string, vec_id long, embedding array<float>, label int"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(ops_dir)
    )
    q = stream.writeStream.foreachBatch(merge_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    for idx in stale:
        idx.close()
    truth.unpersist()
    return spark.createDataFrame(rows, METRICS_SCHEMA)


def interval_join_stream(
    spark: SparkSession,
    sf_dir: str,
    window: str = "6 hours",
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM interval join — every `click` within `window` AFTER
    a `view` by the same user, the attribution join a clickstream
    pipeline runs online.

    Both sides carry watermarks and the join has a bounded time range,
    so each side's buffered state is bounded by (watermark delay +
    window) of data — the property that makes the join runnable forever
    at 100 TB/day; without the bound Spark rejects the append-mode plan.
    Inner-join matches emit as they are found (the watermark only ages
    buffered state out), so with availableNow draining the fixture the
    result is the COMPLETE matched set — a plain relational self-join
    the DuckDB oracle reproduces exactly.

    how="left_outer" adds the attribution shape real pipelines need
    ("views that never converted"): a view with NO click in its window
    emits exactly once with NULL click_id when the watermark expires its
    buffered state, i.e. when view_ts + window < final watermark. The
    GLOBAL watermark is min over both sides' per-side max event time
    (each side filters before its withWatermark) minus the delay;
    availableNow's terminal no-data batch performs the eviction. Views
    younger than that horizon stay unreported — the stream cannot yet
    know they won't convert — so the left-outer oracle is the same
    relational LEFT JOIN restricted to expired views (boundary STRICT:
    a view whose window closes exactly AT the watermark is retained —
    pinned on an exact-tie synthetic fixture in tests/test_streaming.py).

    how="full_outer" additionally emits unmatched CLICKS (NULL view_id)
    once the watermark passes the click's own event time (a click at
    click_ts can only match views with view_ts <= click_ts, so its
    state expires when click_ts < watermark) — the orphan-event audit
    stream. Rows-only entry; closed form pinned in pytest."""
    s = _stream_session(spark)
    batch = s.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def src() -> DataFrame:
        return normalize_ts(
            s.readStream.schema(batch.schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir),
            "ts",
        )

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", delay)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    clicks = (
        src()
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", delay)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = views.join(
        clicks,
        F.expr(
            f"v_user = c_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + INTERVAL {window}"
        ),
        how,
    )
    out = _run_to_memory(joined)
    # full_outer rows for an unmatched click carry NULL view columns —
    # coalesce so user_id is always populated (no-op for inner/left)
    return out.select(
        F.coalesce(F.col("v_user"), F.col("c_user")).alias("user_id"),
        "view_id",
        "click_id",
    )


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join: the arriving event stream broadcast-joined to
    a static dimension (per-user lifetime profile, computed batch-side
    from the same fixture) — the enrichment shape every streaming
    pipeline runs (events × user table, clicks × campaign table). The
    static side re-plans per micro-batch (Spark re-resolves batch
    relations each trigger), and as a broadcast join it never forces a
    stateful shuffle — unlike the stream-stream join there is NO
    buffered state at all, so this operator is watermark-free and
    trivially unbounded. Returns per (user, event_type) counts carrying
    the joined static columns; closed form = plain join + aggregate."""
    s = _stream_session(spark)
    batch = s.read.parquet(os.path.join(sf_dir, "events.parquet"))
    profile = (
        normalize_ts(batch, "ts")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("user_events"),
            F.round(F.sum("value"), 4).alias("user_value"),
        )
    )
    stream = normalize_ts(
        s.readStream.schema(batch.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir),
        "ts",
    )
    enriched = stream.join(F.broadcast(profile), "user_id")
    agg = enriched.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("user_events").alias("user_events"),
        F.first("user_value").alias("user_value"),
    )
    out = _run_to_memory(agg, mode="complete")
    return out.select("user_id", "event_type", "n", "user_events", "user_value")


def stream_drop_duplicates(
    spark: SparkSession, sf_dir: str, work_dir: str, delay: str = "1 hour"
) -> DataFrame:
    """Built-in streaming dedup (dropDuplicatesWithinWatermark) — the
    DECLARATIVE sibling of the applyInPandasWithState dedup jobs: the
    same event file replayed as TWO micro-batches must come out exactly
    once per event_id. State is Spark-managed and watermark-bounded
    (ids older than the watermark age out — the property that lets an
    at-least-once upstream, e.g. a Kafka replay or a crawler retry, be
    deduped forever at 100 TB/day without unbounded state). Returns the
    per-type count + value checksum of the deduped stream; closed form =
    the same aggregate over the ORIGINAL (already unique) events."""
    s = _stream_session(spark)
    batch = s.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    os.makedirs(work_dir)
    now = time.time()
    # the same full file twice: an exact at-least-once replay
    for i in range(2):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(work_dir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    stream = normalize_ts(
        s.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(work_dir),
        "ts",
    )
    deduped = (
        stream.withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    out = _run_to_memory(deduped, mode="complete")
    return out.select("event_type", "n", "sum_value")


def hourly_unique_users(
    spark: SparkSession, sf_dir: str, delay: str = "1 hour"
) -> DataFrame:
    """Watermarked hourly DISTINCT-USER counts with the HLL++ sketch
    (approx_count_distinct) next to the exact count — the approximate
    aggregate class (sketch, mergeable, constant memory per window) that
    replaces exact distinct at 100 TB, where per-window exact distinct
    means a users-per-window-sized state. The sketch is deterministic
    for fixed input, so the row set is stable; its error vs exact is
    bounded in tests/test_streaming.py (rsd 5% default)."""
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    out = _run_to_memory(agg)
    return out.select(F.col("w.start").alias("hour"), "approx_users", "n_events")


def _time_split_events(s: SparkSession, sf_dir: str, work_dir: str, n_splits: int):
    """Materialize the events table as `n_splits` time-ordered parquet
    files with explicitly STAGGERED mtimes (os.utime, one minute apart —
    same pattern as split_events_files) so the file source replays them
    oldest-first even on filesystems with coarse mtime granularity,
    where two sequential writes can land in the same tick and the
    source's modificationTime sort would fall back to arbitrary
    UUID-name order. A maxFilesPerTrigger=1 stream then sees event time
    advance monotonically across micro-batches and the watermark
    actually MOVES between them. Marker-cached per fixture generation.
    Returns (data_dir, batch frame)."""
    ev = normalize_ts(
        s.read.parquet(os.path.join(sf_dir, "events.parquet")), "ts"
    ).select("event_id", "user_id", "event_type", "value", "ts")

    data_dir = os.path.join(work_dir, "splits")
    marker = os.path.join(work_dir, "_SPLITS_OK")
    src_path = os.path.join(sf_dir, "events.parquet")
    # v2: staggered-mtime batch{i}.parquet layout (the version token
    # invalidates pre-v2 cached splits that carried natural mtimes)
    stamp = (
        f"v2:{os.path.getmtime(src_path)}:{os.path.getsize(src_path)}:{n_splits}"
    )
    done = False
    try:
        with open(marker) as fh:
            done = fh.read() == stamp
    except OSError:
        pass
    if not done:
        shutil.rmtree(data_dir, ignore_errors=True)
        qs = ",".join(str((i + 1) / n_splits) for i in range(n_splits - 1))
        bounds = ev.selectExpr(
            f"percentile(unix_timestamp(ts), array({qs})) AS cuts"
        ).first()["cuts"]
        os.makedirs(data_dir, exist_ok=True)
        now = time.time()
        # ONE scan writes every band: band id = #cuts strictly below the
        # row's ts (same (lo, hi] boundaries as a per-band filter chain
        # would give), shuffled by band so each band lands whole in a
        # single task — partitionBy then emits exactly one file per
        # band dir, which is renamed into replay order. The alternative
        # (one filtered pass per band) re-scans the source n_splits
        # times, which the marker cache only hides on warm runs.
        u = F.unix_timestamp("ts")
        band = F.lit(0)
        for b in bounds:
            band = band + (u > F.lit(float(b))).cast("int")
        tmp = os.path.join(work_dir, "_tmp_bands")
        (
            ev.withColumn("band", band)
            .repartition("band")
            .write.mode("overwrite")
            .partitionBy("band")
            .parquet(tmp)
        )
        for i in range(n_splits):
            bdir = os.path.join(tmp, f"band={i}")
            if not os.path.isdir(bdir):
                continue  # duplicate percentile cuts => empty band
            fname = next(f for f in os.listdir(bdir) if f.endswith(".parquet"))
            dst = os.path.join(data_dir, f"batch{i}.parquet")
            shutil.move(os.path.join(bdir, fname), dst)
            t = now - 600 + i * 60
            os.utime(dst, (t, t))
        shutil.rmtree(tmp)
        os.makedirs(work_dir, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write(stamp)
    return data_dir, ev


def _drain_with_progress(writer_df: DataFrame, label: str) -> list[tuple]:
    """availableNow-drain into a memory sink and return per-batch
    (batch_id, input_rows, state_rows, state_rows_removed,
    emitted_rows) from the progress stream, state summed over ALL
    state operators (Spark reports a stream-stream join as ONE
    symmetricHashJoin entry covering both sides' stores; the sum is
    for plans that genuinely stack several stateful ops).

    Only the progress metadata is the result here, so the sink rows are
    projected to a single literal column before the memory sink (sink
    numOutputRows is per-row and unaffected) and the temp view is
    dropped afterwards — otherwise each call would park a full join
    output in driver memory for the session lifetime."""
    import json as _json

    q, name = _start_to_memory(
        writer_df.select(F.lit(1).alias("one")), "append", label
    )
    # recentProgress is a ring buffer capped at
    # spark.sql.streaming.numRecentProgressUpdates (default 100): a run
    # with more micro-batches than HALF the cap would silently drop its
    # EARLIEST progress rows and the conservation math below
    # (Σinput == Σstate-resident + Σevicted) would report truncation as
    # measured eviction (ADVICE r10). Our callers replay ≤ ~16 file
    # batches; fail loudly if that ever grows toward the cap.
    cap = int(
        writer_df.sparkSession.conf.get(
            "spark.sql.streaming.numRecentProgressUpdates", "100"
        )
    )
    n_batches = len(q.recentProgress)
    assert n_batches <= cap // 2, (
        f"{n_batches} micro-batches vs recentProgress cap {cap}: early "
        "batches may have been evicted from the ring buffer; raise "
        "numRecentProgressUpdates or collect progress via a listener"
    )
    rows = []
    for p in q.recentProgress:
        d = _json.loads(p.json) if hasattr(p, "json") else dict(p)
        ops = d.get("stateOperators") or []
        rows.append(
            (
                int(d["batchId"]),
                int(d.get("numInputRows", 0)),
                sum(int(o.get("numRowsTotal", 0)) for o in ops),
                sum(int(o.get("numRowsRemoved", 0)) for o in ops),
                int((d.get("sink") or {}).get("numOutputRows", 0)),
            )
        )
    writer_df.sparkSession.catalog.dropTempView(name)
    return sorted(rows)


_STATE_BOUND_SCHEMA = (
    "batch_id long, input_rows long, state_rows long, "
    "state_rows_removed long, emitted_rows long"
)


def state_bound_report(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    delay: str = "1 hour",
    n_splits: int = 8,
) -> DataFrame:
    """MEASURED state boundedness of a watermarked streaming aggregate —
    per micro-batch (batch_id, input_rows, rows resident in the state
    store afterwards, watermark-evicted rows, emitted rows).

    Every watermarked operator in this module claims "bounded state";
    this converts the claim into numbers Spark itself reports
    (stateOperators.numRowsTotal / numRowsRemoved in the progress
    events). The events table is split into time-ordered parquet files
    replayed one file per micro-batch (maxFilesPerTrigger=1), so the
    watermark ADVANCES between batches and eviction is observable: at
    100 TB/day the difference between "state = one watermark horizon of
    windows" and "state = everything ever seen" is the difference
    between a stream that runs forever and one that dies in a day.

    Driver cost: |n_splits| progress dicts. Deterministic given the
    fixture (file order pins batch order; each batch's watermark is the
    previous batches' max event time minus the delay)."""
    s = _stream_session(spark)
    data_dir, ev = _time_split_events(s, sf_dir, work_dir, n_splits)
    stream = normalize_ts(
        s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(data_dir),
        "ts",
    )
    agg = (
        stream.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spark.createDataFrame(
        _drain_with_progress(agg, "state_bound"), _STATE_BOUND_SCHEMA
    )


def join_state_bound_report(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    window: str = "6 hours",
    delay: str = "1 hour",
    n_splits: int = 8,
) -> DataFrame:
    """The state-bound measurement for the HEAVIEST streaming state
    class — the stream-stream interval join (two buffered sides, the
    shape interval_join_stream serves): the same time-ordered
    micro-batch replay driven through the view->click attribution join,
    state summed over BOTH sides' buffers. The bound under measure:
    each side retains only (watermark delay + join window) of rows, so
    resident state tracks the horizon — per-batch buffered rows land
    near (delay + window) / total-span of the table and the rest
    evicts as the watermark passes it. Same driver cost and determinism
    as state_bound_report."""
    s = _stream_session(spark)
    data_dir, ev = _time_split_events(s, sf_dir, work_dir, n_splits)

    def src() -> DataFrame:
        return normalize_ts(
            s.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(data_dir),
            "ts",
        )

    views = (
        src()
        .filter(F.col("event_type") == "view")
        .withWatermark("ts", delay)
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    clicks = (
        src()
        .filter(F.col("event_type") == "click")
        .withWatermark("ts", delay)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = views.join(
        clicks,
        F.expr(
            f"v_user = c_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + INTERVAL {window}"
        ),
        "inner",
    )
    return spark.createDataFrame(
        _drain_with_progress(joined, "join_state_bound"), _STATE_BOUND_SCHEMA
    )


def stream_index_ingest(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    n_splits: int = 4,
    max_generations: int = 2,
    nlist: int = 8,
    m: int = 8,
    ksub: int = 16,
    k: int = 10,
    nprobe: int = 4,
    mult: int = 5,
) -> DataFrame:
    """Continuous vector ingestion into a SERVED IVF-PQ index — the
    write path of a live vector store as a Structured Streaming job:
    half the embeddings seed the index (build + materialize in the
    list-partitioned layout), the other half ARRIVE as ordered
    micro-batches; each foreachBatch lands its arrivals through
    insert_into_ivfpq (one Arrow encode pass, one list-partitioned
    delta write — O(|batch|), never O(index)) and the LSM
    auto-compaction policy folds the delta chain whenever it reaches
    `max_generations` fragments, exactly as the batch dynamic protocol
    does, but driven by stream triggers instead of protocol phases.

    Deterministic accounting (n_splits=4, max_generations=2 ⇒ exactly
    2 folds, 0 generations left) and a post-drain freshness probe:
    every arrived vector queried against the final index must return
    ITSELF at rank 1 (its raw vector is stored next to its codes —
    keep_vectors — so the refined probe's exact re-rank puts the
    zero-distance self first whenever the ADC shortlist surfaces it;
    a miss means arrivals are not actually being served). Returns one
    summary row: n_batches, n_ingested, n_compactions,
    generations_left, self_hit_rate.

    100 TB shape: the stream never touches the main layout — inserts
    are delta-partitioned writes sized by the micro-batch, probes
    file-prune across main ∪ deltas, and compaction is the amortized
    O(index/K) background fold. Rows-only (wall-clock/layout
    accounting); pinned in
    tests/test_streaming.py::test_stream_index_ingest."""
    from cs598vectordb_spark.operators.ivfpq import (
        auto_compact_ivfpq,
        build_ivfpq,
        delta_generations,
        insert_into_ivfpq,
        knn_ivfpq_refined,
    )
    from cs598vectordb_spark.sources.tables import load_table

    base = load_table(spark, sf_dir, "embeddings")
    n = base.count()
    cut = n // 2
    seed_rows = base.filter(F.col("vec_id") < cut)
    arrivals = base.filter(F.col("vec_id") >= cut).select("vec_id", "embedding")

    if os.path.isdir(work_dir):
        shutil.rmtree(work_dir)
    adir = os.path.join(work_dir, "arrivals")
    os.makedirs(adir)
    now = time.time()
    for i in range(n_splits):
        tmp = os.path.join(work_dir, f"_tmp{i}")
        arrivals.filter(F.col("vec_id") % n_splits == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(adir, f"batch{i}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (now - 300 + i * 60, now - 300 + i * 60))

    index = build_ivfpq(
        seed_rows, nlist=nlist, m=m, ksub=ksub,
        path=os.path.join(work_dir, "index", "t"), keep_vectors=True,
    )
    state = {"index": index, "batches": 0, "ingested": 0, "folds": 0}

    stream_spark = _stream_session(spark)
    stream = (
        stream_spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(adir)
    )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx = insert_into_ivfpq(state["index"], batch_df)
        idx, compacted = auto_compact_ivfpq(idx, max_generations)
        state["index"] = idx
        state["batches"] += 1
        state["ingested"] += batch_df.count()
        state["folds"] += int(compacted)

    q = stream.writeStream.foreachBatch(ingest).trigger(availableNow=True).start()
    q.awaitTermination()

    final = state["index"]
    gens_left = len(delta_generations(final.path)) if final.path else 0
    qdf = arrivals.withColumnRenamed("vec_id", "q_id")
    hits = (
        knn_ivfpq_refined(final, None, qdf, k=k, nprobe=nprobe, mult=mult)
        .filter((F.col("rank") == 1) & (F.col("vec_id") == F.col("q_id")))
        .count()
    )
    n_arrivals = n - cut
    return spark.createDataFrame(
        [
            (
                state["batches"],
                state["ingested"],
                state["folds"],
                gens_left,
                round(hits / max(n_arrivals, 1), 4),
            )
        ],
        "n_batches int, n_ingested long, n_compactions int, "
        "generations_left int, self_hit_rate double",
    )
