"""Metric-log text sink and regex re-scan (SURVEY.md §2.1 S5/S6).

The reference appends per-interval metric lines to
`dynamic_updates_<backend>.txt` (/root/reference/dynamic_script_faiss.py:127-129)
in sections headed `--- <pct>% Update ---`, then `plots.py:13-44` regex-parses
them back into per-section series. We keep the exact line format for parity:

    --- 50% Update ---
    Interval 1: QPS = 4957.83 queries/sec, Latency = 2017.01 ms, Recall = 0.9769

Scale note: a metrics log is driver-sized by construction (one line per
measurement interval, KBs) — `coalesce(1)` + a global line-order window are
the right plan HERE and would be wrong for data tables; re-scan parallelism
at scale comes from many log files, one task each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_LINE_FMT = "Interval %d: QPS = %.2f queries/sec, Latency = %.2f ms, Recall = %.4f"
_HEADER_FMT = "--- %d%% Update ---"
_HEADER_RE = r"^--- (\d+)% Update ---$"
_LINE_RE = (
    r"^Interval (\d+): QPS = ([0-9.]+) queries/sec, "
    r"Latency = ([0-9.]+) ms, Recall = ([0-9.]+)$"
)


def write_metric_log(metrics: DataFrame, path: str) -> None:
    """Sink (update_pct, interval, qps, latency_ms, recall) rows as the
    reference's sectioned text-log format. Header rows sort before their
    section's interval lines via interval key 0 (intervals start at 1)."""
    lines = metrics.select(
        F.col("update_pct"),
        F.col("interval"),
        F.format_string(
            _LINE_FMT, "interval", "qps", "latency_ms", "recall"
        ).alias("value"),
    )
    headers = (
        metrics.select("update_pct")
        .distinct()
        .select(
            "update_pct",
            F.lit(0).alias("interval"),
            F.format_string(_HEADER_FMT, "update_pct").alias("value"),
        )
    )
    (
        headers.unionByName(lines)
        .orderBy("update_pct", "interval")
        .coalesce(1)
        .select("value")
        .write.mode("overwrite")
        .text(path)
    )


def scan_metric_log(spark: SparkSession, path: str) -> DataFrame:
    """Re-scan a sectioned metric log into typed rows.

    Section headers carry no interval data themselves; each data line
    inherits the most recent header via `last(..., ignorenulls)` over the
    file-order window — the standard Spark idiom for stateful log parsing
    (replaces the reference's sequential regex loop, plots.py:27-44).
    """
    raw = spark.read.text(path).withColumn("pos", F.monotonically_increasing_id())
    hdr = F.regexp_extract("value", _HEADER_RE, 1)
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parsed = (
        raw.withColumn(
            "update_pct",
            F.last(F.when(hdr != "", hdr.cast("int")), ignorenulls=True).over(w),
        )
        .withColumn("interval", F.regexp_extract("value", _LINE_RE, 1))
        .filter(F.col("interval") != "")
        .select(
            "update_pct",
            F.col("interval").cast("int").alias("interval"),
            F.regexp_extract("value", _LINE_RE, 2).cast("double").alias("qps"),
            F.regexp_extract("value", _LINE_RE, 3).cast("double").alias("latency_ms"),
            F.regexp_extract("value", _LINE_RE, 4).cast("double").alias("recall"),
        )
    )
    return parsed


def write_series_chart(chart: DataFrame, path: str) -> None:
    """S7 plot sink analog: persist the comparison_chart rows as a text
    artifact (one line per backend/update_pct series, sparkline + CSV) —
    the engine's rendering of the reference's logs→series→PNG pipeline
    (plots.py:47-95), minus the raster step the survey scoped out."""
    lines = chart.select(
        F.concat_ws(
            " ",
            F.col("backend"),
            F.concat(F.lit("pct="), F.col("update_pct").cast("string")),
            F.col("sparkline"),
            F.concat(F.lit("["), F.col("series_csv"), F.lit("]")),
        ).alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(path)
