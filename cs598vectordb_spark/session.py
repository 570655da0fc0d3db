"""SparkSession factory tuned for the engine.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions ~ cores (not the 200 default), AQE on for runtime coalescing and
skew handling, Arrow on for the pandas-UDF fast path, UTC session timezone
so timestamps hash-match the DuckDB oracle.

At cluster scale the same builder is used with master/memory supplied by
spark-submit; nothing here assumes local mode except the defaults.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cs598vectordb_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or min(os.cpu_count() or 8, 32)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Context-creation config (NOT settable later): FAIR lets the
        # multi-tenant and overlapped-update workloads share executors
        # across concurrently submitted jobs instead of FIFO
        # head-of-line blocking. Pools are created on demand by
        # setLocalProperty('spark.scheduler.pool', ...).
        .config("spark.scheduler.mode", "FAIR")
        # events.ts has shipped as TIMESTAMP(NANOS) (read as long nanos,
        # converted in sources/tables.py) and as timestamp[us]-no-tz (which
        # would infer TIMESTAMP_NTZ and break numeric casts + watermarks).
        # Pin both confs; session tz is UTC so TIMESTAMP == the oracle's
        # timezone-free values either way.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # exact kNN uses an explicit crossJoin(broadcast(queries)); keep the
        # guard rails on for everything else.
        .config("spark.sql.crossJoin.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
