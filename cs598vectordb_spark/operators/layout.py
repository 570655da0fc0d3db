"""Z-order data layout — multi-dimensional locality for file skipping.

At 100 TB the scan you AVOID is the cheapest scan: parquet readers skip
whole files/row-groups whose min/max statistics exclude a predicate, but
statistics only help if the layout CLUSTERS each filter column. A linear
sort clusters one dimension perfectly and the others not at all; the
Z-order (Morton) curve interleaves the bits of two key columns so files
cover compact rectangles in (a, b) space and BOTH single- and
two-dimensional range predicates skip most files — the technique Delta
Lake ships as OPTIMIZE ZORDER BY and every lakehouse engine implements.

Spark-first shape: the z-value is a pure Catalyst expression
(shift/mask/aggregate over a bit sequence — whole-stage codegen, no
Python), the layout is one repartitionByRange(z) + sortWithinPartitions
(exactly the shuffle Delta's OPTIMIZE runs), and the skipping evidence
is read from parquet FOOTERS (driver touches |files| metadata blocks,
never rows).

The reference has no layout tier (it serves from RAM); this is
engine-extension surface like the dedup/streaming families.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(a, b, bits: int = 8) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative int
    columns (name or Column): result bit 2i is a's bit i, bit 2i+1 is
    b's bit i. Statically unrolled into 2*bits shift/mask terms — pure
    whole-stage codegen, no Python. Callers should first QUANTIZE each
    column onto the same 2^bits grid (see grid_bucket) — interleaving
    raw values with unequal ranges biases the curve toward whichever
    column owns the highest varying bit, and the biased dimension's
    pruning collapses (measured on events: a 375-wide × 180-wide domain
    interleaved raw admitted 55/64 files on the wide dimension vs
    ~¼ after normalization)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    one = F.lit(1).cast("long")
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(one), 2 * i)
            + F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(one), 2 * i + 1)
        )
    return acc


def grid_bucket(col, hi: int, bits: int = 8) -> Column:
    """Equal-width quantization of a non-negative column with maximum
    `hi` onto the 2^bits grid — the per-column normalization step every
    production ZORDER runs before interleaving."""
    n = 1 << bits
    return F.least(
        F.floor(col.cast("double") * n / (hi + 1)).cast("long"), F.lit(n - 1)
    )


def write_layout(
    df: DataFrame, path: str, order_col: Column, n_files: int = 32
) -> None:
    """Cluster `df` into ~n_files parquet files range-partitioned and
    sorted by `order_col` — each file covers a compact interval of the
    ordering key, which is what gives its min/max statistics pruning
    power."""
    (
        df.withColumn("_ord", order_col)
        .repartitionByRange(n_files, "_ord")
        .sortWithinPartitions("_ord")
        .drop("_ord")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_admitting(path: str, preds: dict[str, tuple]) -> tuple[int, int]:
    """(admitted, total): how many parquet files of `path` a reader must
    scan for the conjunction of range predicates {col: (lo, hi)}, judged
    by footer min/max statistics — the same decision parquet row-group
    skipping makes, surfaced as a number. Footer metadata only; no row
    is read."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    admitted = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        file_admits = True
        for col, (lo, hi) in preds.items():
            cmin = cmax = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    cmin = cmax = None
                    break
                cmin = st.min if cmin is None else min(cmin, st.min)
                cmax = st.max if cmax is None else max(cmax, st.max)
            if cmin is None:
                continue  # no stats => must scan; column doesn't veto
            if cmax < lo or cmin > hi:
                file_admits = False
                break
        if file_admits:
            admitted += 1
    return admitted, len(files)


def zorder_events_report(
    spark, sf_dir: str, work_dir: str, n_files: int = 32, bits: int = 8
) -> DataFrame:
    """Lay the events table out twice — linearly sorted by user_id, and
    Z-ordered by (user_id, hour index) — and report how many files each
    layout forces a reader to scan for three probes: a user band, a
    time band, and their conjunction. Both layouts hold identical rows
    (pinned in tests), so the files_admitted delta is pure layout
    effect. The structural story the numbers tell: a linear sort
    clusters ONE dimension (the time-band probe admits every linear
    file), while the Morton curve serves both dimensions at once — the
    reason a 100 TB table queried by more than one key gets OPTIMIZE
    ZORDER BY, not a sort."""
    from cs598vectordb_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    mn = ev.agg(F.min("ts")).first()[0]
    hour_idx = (
        (F.unix_timestamp("ts") - F.lit(int(mn.timestamp()))) / 3600
    ).cast("long")
    base = ev.withColumn("hour_idx", hour_idx)

    u_hi = int(base.agg(F.max("user_id")).first()[0])
    h_hi = int(base.agg(F.max("hour_idx")).first()[0])

    lin_path = os.path.join(work_dir, "linear")
    z_path = os.path.join(work_dir, "zorder")
    write_layout(base, lin_path, F.col("user_id").cast("long"), n_files)
    z = zvalue(
        grid_bucket(F.col("user_id"), u_hi, bits),
        grid_bucket(F.col("hour_idx"), h_hi, bits),
        bits,
    )
    write_layout(base, z_path, z, n_files)

    # quarter-space bands, offset from 0 so neither band is a prefix
    u_band = (u_hi // 4, u_hi // 2)
    h_band = (h_hi // 4, h_hi // 2)
    probes = {
        "user_band": {"user_id": u_band},
        "hour_band": {"hour_idx": h_band},
        "user_and_hour": {"user_id": u_band, "hour_idx": h_band},
    }

    zdf = spark.read.parquet(z_path)
    rows = []
    for name, preds in probes.items():
        lin_adm, n_tot = files_admitting(lin_path, preds)
        z_adm, _ = files_admitting(z_path, preds)
        cond = F.lit(True)
        for col, (lo, hi) in preds.items():
            cond = cond & F.col(col).between(lo, hi)
        rows.append(
            (name, n_tot, lin_adm, z_adm, int(zdf.filter(cond).count()))
        )
    return spark.createDataFrame(
        rows,
        "probe string, n_files int, files_admitted_linear int, "
        "files_admitted_zorder int, n_rows_match int",
    )
