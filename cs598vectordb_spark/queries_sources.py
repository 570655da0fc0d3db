"""Source/sink queries()/oracle_sql() entries (SURVEY.md §2.1 S1/S2/S5/S6).

Each query is a full round-trip: derive rows from the parquet testdata,
sink them through the binary/text format under test, re-scan with the
engine reader, and return a projection the DuckDB oracle recomputes
directly from the parquet views. A hash match therefore proves the sink
and the scan are both lossless — the same evidence the reference gets from
its fvecs loaders reproducing SIFT ground truth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs598vectordb_spark.registry import register
from cs598vectordb_spark.sources.logs import scan_metric_log, write_metric_log
from cs598vectordb_spark.sources.tables import load_table
from cs598vectordb_spark.sources.vecfiles import read_fvecs, read_ivecs, write_vecs

_IO_ROOT = "/tmp/cs598_spark_io"


def _io_dir(sf_dir: str, kind: str) -> str:
    return os.path.join(_IO_ROOT, os.path.basename(sf_dir.rstrip("/")), kind)



def _norm_dashboard(back: DataFrame) -> DataFrame:
    """The shared (vec_id, dim, norm) projection all three fvecs scan
    entries emit — ONE definition so the rounding/accumulation can never
    silently diverge between the oracled scan_fvecs and the
    frame-equality-pinned v2/stream variants."""
    sq = (
        "aggregate(embedding, CAST(0.0 AS DOUBLE), "
        "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
    )
    return back.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(F.expr(sq)), 4).alias("norm"),
    )


@register("scan_fvecs")
def q_scan_fvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: embeddings → sharded fvecs files → binaryFile+mapInPandas scan.

    float32 survives the round-trip bit-exactly, so the per-vector L2 norm
    (accumulated left-to-right in double) matches the parquet originals
    (ref reader: dynamic_script_faiss.py:14-15).

    ORACLE RETIRED r14 (slot budget, shared-evidence class (2), funding
    the bpe_token_stats/exact_substring_stats promotions): the shard
    writer/reader is shared with the STILL-GRADED scan_ivecs modulo a
    float32 view-cast (sources/vecfiles.py:245-249), the decode
    round-trip is bit-exact-pinned
    (tests/test_sources.py::test_fvecs_roundtrip_multishard), and the
    norm dashboard carries a pure-Python value-exact recomputation pin
    (tests/test_sources.py::test_scan_fvecs_value_exact). The v2 /
    stream twins remain frame-equality-pinned against this entry's
    shared _norm_dashboard projection.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    path = _io_dir(sf_dir, "fvecs")
    write_vecs(emb, path, "float32", rows_per_shard=200)
    back = read_fvecs(spark, path)
    return _norm_dashboard(back)


_STREAM_SEQ = __import__("itertools").count()


@register("scan_fvecs_stream")
def q_scan_fvecs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 as a STREAM: vector shards arrive through the registered
    fvecs streaming source (partition-based DataSourceStreamReader —
    executors decode each new shard; the offset is a high-water mark on
    the shard file NAME, robust to foreign names sorting below it) and
    drain via availableNow into the same norm dashboard as scan_fvecs.
    Rows-only; offset tracking across a checkpointed restart is pinned
    in tests/test_sources.py::test_fvecs_stream_source_incremental."""
    import os

    from cs598vectordb_spark.sources.fvecs_datasource import register as reg_ds
    from cs598vectordb_spark.streaming.jobs import _stream_session

    emb = load_table(spark, sf_dir, "embeddings")
    path = _io_dir(sf_dir, "fvecs")
    write_vecs(emb, path, "float32", rows_per_shard=200)
    # house rule (CLAUDE.md): every stream builder rebinds onto the
    # isolated child session before readStream
    spark = _stream_session(spark)
    reg_ds(spark)
    stream = spark.readStream.format("fvecs").load(path)
    dashboard = _norm_dashboard(stream)
    name = f"scan_fvecs_stream_{os.getpid()}_{next(_STREAM_SEQ)}"
    q = (
        dashboard.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register("scan_fvecs_v2")
def q_scan_fvecs_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 through Spark 4's Python Data Source API: the SAME fvecs
    shards read via the registered `spark.read.format("fvecs")` source
    (sources/fvecs_datasource.py — one InputPartition per shard file,
    Arrow RecordBatch emission), projected to the same norm dashboard
    as scan_fvecs. Rows-only this round; frame-level equality with the
    binaryFile+mapInPandas reader is pinned in
    tests/test_sources.py::test_fvecs_datasource_matches_reader, which
    chains to scan_fvecs' oracle."""
    from cs598vectordb_spark.sources.fvecs_datasource import register as reg_ds

    emb = load_table(spark, sf_dir, "embeddings")
    path = _io_dir(sf_dir, "fvecs")
    write_vecs(emb, path, "float32", rows_per_shard=200)
    reg_ds(spark)
    back = spark.read.format("fvecs").load(path)
    return _norm_dashboard(back)


@register("scan_ivecs")
def q_scan_ivecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: int-vector round-trip through ivecs shards (ref reader:
    dynamic_script_faiss.py:9-12). Payload = [label, vec_id%7, dim].

    ORACLE RETIRED r16 (slot budget, shared-evidence class (2), funding
    the bm25_search promotion): the shard writer/reader is the same
    write_vecs/_decode_blob path as the retired-and-pinned scan_fvecs
    modulo the int32 view (sources/vecfiles.py:245-249), the decode
    round-trip is pinned by tests/test_sources.py::test_ivecs_roundtrip,
    and this dashboard carries a pure-Python value-exact recomputation
    pin (tests/test_sources.py::test_scan_ivecs_value_exact — the
    retired DuckDB twin's exact arithmetic: n == 3, s == label +
    vec_id%7 + dim for every row)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ints = emb.select(
        "vec_id",
        F.array(
            F.col("label"),
            (F.col("vec_id") % 7).cast("int"),
            F.size("embedding"),
        ).alias("ints"),
    )
    path = _io_dir(sf_dir, "ivecs")
    write_vecs(ints, path, "int32", vec_col="ints", rows_per_shard=200)
    back = read_ivecs(spark, path)
    return back.select(
        "vec_id",
        F.size("ints").alias("n"),
        F.expr("aggregate(ints, CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("s"),
    )


_LOG_METRICS_SQL = """
SELECT CASE event_id % 3 WHEN 0 THEN 25 WHEN 1 THEN 50 ELSE 75 END AS update_pct,
       CAST(hour(ts) % 6 + 1 AS INTEGER) AS interval,
       ROUND(COUNT(*) / 10.0, 2) AS qps,
       ROUND(SUM(value), 2) AS latency_ms,
       ROUND(CAST(1.0 AS DOUBLE) - ((event_id % 3) * 6 + hour(ts) % 6 + 1) * CAST(0.001 AS DOUBLE), 4) AS recall
FROM events
GROUP BY event_id % 3, hour(ts) % 6
"""


@register("scan_logs", _LOG_METRICS_SQL)
def q_scan_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5+S6: metric rows → reference-format text log → regex re-scan.

    The metric rows are a deterministic aggregate of `events` (so DuckDB
    can recompute them without seeing the file); what the hash certifies is
    that `write_metric_log` and `scan_metric_log` preserve every value
    through the `Interval N: QPS = ...` line format the reference emits and
    re-parses (dynamic_script_faiss.py:127-129, plots.py:13-44).
    """
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("event_id") % 3
    metrics = (
        ev.groupBy(sec.alias("sec"), (F.hour("ts") % 6 + 1).cast("int").alias("interval"))
        .agg(
            F.round(F.count("*") / 10.0, 2).alias("qps"),
            F.round(F.sum("value"), 2).alias("latency_ms"),
        )
        .select(
            F.element_at(
                F.array(F.lit(25), F.lit(50), F.lit(75)), F.col("sec").cast("int") + 1
            ).alias("update_pct"),
            "interval",
            "qps",
            "latency_ms",
            F.round(1.0 - (F.col("sec") * 6 + F.col("interval")) * 0.001, 4).alias(
                "recall"
            ),
        )
    )
    path = _io_dir(sf_dir, "metric_log")
    write_metric_log(metrics, path)
    return scan_metric_log(spark, path)


@register(
    "load_dataset",
    """
SELECT 'embeddings' AS tbl, COUNT(*) AS n, CAST(MAX(len(embedding)) AS INTEGER) AS dim FROM embeddings
UNION ALL
SELECT 'queries', COUNT(*), CAST(MAX(len(embedding)) AS INTEGER) FROM embeddings WHERE vec_id < 100
UNION ALL
SELECT 'documents', COUNT(*), CAST(NULL AS INTEGER) FROM documents
UNION ALL
SELECT 'events', COUNT(*), CAST(NULL AS INTEGER) FROM events
""",
)
def q_load_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: the reference's xb/xq(+aux) quartet loader
    (dynamic_script_faiss.py:17-22) — table manifest with row counts and
    vector dims; ground truth is computed (knn_exact), not loaded."""
    from cs598vectordb_spark.sources.tables import queries_from_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, 100)
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")
    null_dim = F.lit(None).cast("int")

    def manifest(df: DataFrame, name: str, dim_col) -> DataFrame:
        return df.agg(
            F.lit(name).alias("tbl"), F.count("*").alias("n"), dim_col.alias("dim")
        )

    return (
        manifest(emb, "embeddings", F.max(F.size("embedding")))
        .unionByName(manifest(q, "queries", F.max(F.size("embedding"))))
        .unionByName(manifest(docs, "documents", F.max(null_dim)))
        .unionByName(manifest(ev, "events", F.max(null_dim)))
    )


@register(
    "ingest",
    """
SELECT COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(SUM(len(embedding)) AS BIGINT) AS total_vals
FROM embeddings
""",
)
def q_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: bulk ingest — write the embeddings snapshot as parquet (the
    engine's ingestion path, vs the reference's add_with_ids /
    coll.insert) and verify the re-read copy checksums identically."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = _io_dir(sf_dir, "ingest_snapshot")
    emb.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return back.agg(
        F.count("*").alias("n"),
        F.sum("vec_id").alias("sum_vec_id"),
        F.sum(F.size("embedding")).alias("total_vals"),
    )


@register("scan_formats")
def q_scan_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar + text format round-trips beyond parquet: the embeddings
    table sunk to ORC (native columnar, predicate-pushdown-capable) and
    the scalar columns to CSV (header, explicit schema on re-read — the
    interchange format every pipeline still meets at its edges), both
    re-scanned and checksummed per format. A format whose round-trip
    drops rows or mangles values breaks the checksum equality pinned in
    tests/test_sources.py. Rows-only by oracle-slot budget (registry
    note); the pytest pin is the correctness evidence."""
    emb = load_table(spark, sf_dir, "embeddings")
    orc_path = _io_dir(sf_dir, "orc_roundtrip")
    csv_path = _io_dir(sf_dir, "csv_roundtrip")
    emb.write.mode("overwrite").orc(orc_path)
    emb.select("vec_id", "label").write.mode("overwrite").option(
        "header", "true"
    ).csv(csv_path)
    back_orc = spark.read.orc(orc_path)
    back_csv = spark.read.schema("vec_id long, label int").option(
        "header", "true"
    ).csv(csv_path)

    def summary(df: DataFrame, fmt: str, with_norm: bool) -> DataFrame:
        agg = [
            F.count(F.lit(1)).alias("n"),
            F.sum("vec_id").alias("sum_vec_id"),
            F.sum("label").alias("sum_label"),
        ]
        if with_norm:
            sq = (
                "aggregate(embedding, CAST(0.0 AS DOUBLE), "
                "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
            )
            agg.append(F.round(F.sum(F.expr(sq)), 2).alias("sum_sq_norm"))
        else:
            agg.append(F.lit(None).cast("double").alias("sum_sq_norm"))
        return df.agg(*agg).select(F.lit(fmt).alias("fmt"), "n", "sum_vec_id", "sum_label", "sum_sq_norm")

    return summary(back_orc, "orc", True).unionByName(summary(back_csv, "csv", False))
