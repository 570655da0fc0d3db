"""Relational operators over the TPC-H-ish tables (SURVEY.md §2.6).

The reference's relational surface is implicit (numpy slicing as
filter/projection, set intersection as join, np.mean as aggregate —
/root/reference/dynamic_script_faiss.py:25-29,96,120-122); this module is
the explicit Spark-first realization: declarative DataFrame plans that
Catalyst optimizes (broadcast the dimension tables, push filters to
parquet, partial aggregation map-side).

Scale notes per operator are in the docstrings — every plan here avoids
driver-side iteration and keeps small-side joins broadcastable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cs598vectordb_spark.config import ORACLE_ROUND


def _r(c: F.Column) -> F.Column:
    return F.round(c, ORACLE_ROUND)


def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-09-02") -> DataFrame:
    """TPC-H Q1 shape: one wide hash-aggregate over the fact table.

    At 100 TB: filter pushes to parquet (shipdate is min/max-indexed per
    row group), aggregation is partial map-side then 6-group final —
    shuffle carries only |groups| × partitions rows.
    """
    li = lineitem.filter(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r(F.sum("l_quantity")).alias("sum_qty"),
            _r(F.sum("l_extendedprice")).alias("sum_base_price"),
            _r(F.sum(disc)).alias("sum_disc_price"),
            _r(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
            _r(F.avg("l_quantity")).alias("avg_qty"),
            _r(F.avg("l_extendedprice")).alias("avg_price"),
            _r(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cutoff: str = "1998-03-15",
    topn: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape: dim ⋈ fact ⋈ fact + group + global top-N.

    customer is tiny → broadcast (Catalyst does it; the segment filter
    prunes further). The global top-N is orderBy().limit() — Spark takes
    per-partition top-N then merges on the driver (TakeOrderedAndProject),
    no total sort at scale. Deterministic via o_orderkey tie-break.
    """
    cut = F.lit(cutoff).cast("timestamp")
    c = customer.filter(F.col("c_mktsegment") == segment)
    o = orders.filter(F.col("o_orderdate") < cut)
    l = lineitem.filter(F.col("l_shipdate") > cut)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(topn)
    )


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: snowflake join chain ending in one fact table.

    region/nation/customer/supplier are all dimension-sized → broadcast
    joins; only the orders⋈lineitem join shuffles, and it shuffles on the
    join key (orderkey) that both sides are naturally clustered by.
    """
    r = region.filter(F.col("r_name") == region_name)
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    )
    return (
        lineitem.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_r(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"))
    )


def revenue_change(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: pure filter+sum — the predicate-pushdown showcase.
    The three range predicates all reach the parquet scan."""
    return lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(_r(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"))


def order_priority_count(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join, then count per priority.
    Semi-join avoids materializing the fact-fact product entirely."""
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Outer-join aggregate: per-customer order count/total including
    zero-order customers (exercises left outer + coalesce semantics)."""
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("total_spent"),
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
            _r(F.coalesce(F.col("total_spent"), F.lit(0.0))).alias("total_spent"),
        )
    )


def brand_top_parts(part: DataFrame, topn: int = 3) -> DataFrame:
    """Window top-N per group (the idiom behind all our kNN ranking)."""
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        part.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
        .select("p_brand", "rank", "p_partkey", "p_name", _r(F.col("p_retailprice")).alias("p_retailprice"))
    )


def acctbal_deciles(customer: DataFrame, parts: int = 32) -> DataFrame:
    """ntile decile stats over customer balances (distribution summary).

    A bare ntile(10) OVER (ORDER BY ...) is the classic global-sort
    scale trap: Spark moves the ENTIRE table through one WindowExec
    partition. Instead the global rank is computed distributed — range
    repartition on the sort key (ascending partition ids = ascending
    ranges), per-partition row counts (≤ `parts` rows) to the driver for
    exact offsets, then a per-partition local window adds the offset.
    NTILE's uneven-tile arithmetic (first n%10 tiles get one extra row)
    is reproduced exactly from the 0-based rank, so the DuckDB oracle's
    real ntile() hashes identically. Partition-boundary sampling noise
    cannot change results: only the exact global rank feeds the tile.

    The ranged frame is localCheckpoint()ed before the count collect so
    the offset job and the final aggregation read the SAME materialized
    partitioning — otherwise the second job re-runs the range
    partitioner, and resampled boundaries (nondeterministic source,
    future AQE behavior) could route rows to a pid absent from the
    offset map, silently nulling deciles. Only (c_acctbal, c_custkey)
    is checkpointed, so the footprint stays two columns at any scale."""
    ranked = customer.select("c_acctbal", "c_custkey").repartitionByRange(
        parts, F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    counts = {r["_pid"]: r["cnt"] for r in ranked.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    n = sum(counts.values())
    if n == 0:
        return customer.select(
            F.lit(0).alias("decile"), F.lit(0).cast("long").alias("n"),
            F.lit(0.0).alias("avg_bal"), F.lit(0.0).alias("min_bal"),
            F.lit(0.0).alias("max_bal"),
        ).limit(0)
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
    )[F.col("_pid")]
    wloc = Window.partitionBy("_pid").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    r0 = F.row_number().over(wloc) - 1 + off_expr  # exact 0-based global rank
    q, rem = n // 10, n % 10
    cut = rem * (q + 1)  # ranks below `cut` sit in the q+1-sized tiles
    decile = F.when(F.col("_r0") < cut, F.floor(F.col("_r0") / (q + 1)) + 1).otherwise(
        F.lit(rem) + F.floor((F.col("_r0") - cut) / max(q, 1)) + 1
    ).cast("int")
    return (
        ranked.withColumn("_r0", r0)
        .withColumn("decile", decile)
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _r(F.avg("c_acctbal")).alias("avg_bal"),
            _r(F.min("c_acctbal")).alias("min_bal"),
            _r(F.max("c_acctbal")).alias("max_bal"),
        )
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Event-time tumbling aggregation (batch analog of the streaming
    windowed agg; hour truncation = window(ts, '1 hour') start)."""
    return (
        events.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _r(F.sum("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + gap-flag cumsum — per-user event-time
    sessions with a 30-min inactivity gap. Shuffles once on user_id; both
    windows share that partitioning (single exchange in the plan)."""
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
        > gap_minutes * 60,
        1,
    ).otherwise(0)
    sess = events.withColumn("new_sess", gap).withColumn(
        "session_seq", F.sum("new_sess").over(by_user.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        _r(F.sum("value")).alias("session_value"),
    )


def status_pivot(lineitem: DataFrame) -> DataFrame:
    """Pivot by conditional aggregation (explicit columns so names are
    stable for the oracle; semantically identical to .pivot())."""
    return lineitem.groupBy("l_returnflag").agg(
        _r(F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0))).alias("qty_open"),
        _r(F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0))).alias("qty_fulfilled"),
    )


def customer_number_extract(customer: DataFrame) -> DataFrame:
    """String-function surface: regexp_extract + concat + split (the
    reference's key-format/parse idiom, dynamic_script_redis.py:53,79)."""
    return customer.select(
        "c_custkey",
        F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1).cast("long").alias("cust_num"),
        F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")).alias("cust_key"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_prefix"),
    )


def props_json_extract(events: DataFrame) -> DataFrame:
    """JSON extraction over the events.props column, grouped stats."""
    return (
        events.withColumn("k", F.get_json_object(F.col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
