"""Structured Streaming surface: watermark semantics, state, CDC ingest."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import functions as F

from cs598vectordb_spark.streaming.jobs import (
    _run_to_memory,
    hourly_counts,
    ingest_updates,
    stateful_user_counts,
)


def test_hourly_counts_match_closed_batch_windows(spark, sf_dir):
    from cs598vectordb_spark.sources.tables import load_table

    got = hourly_counts(spark, sf_dir, delay="1 hour")
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.select(F.max("ts")).first()[0]
    exp = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .filter(F.col("hour") + F.expr("INTERVAL 2 HOURS") <= F.lit(max_ts))
    )
    got_m = {(r["hour"], r["event_type"]): r["n_events"] for r in got.collect()}
    exp_m = {(r["hour"], r["event_type"]): r["n_events"] for r in exp.collect()}
    assert got_m == exp_m and got_m


def test_late_rows_dropped_by_watermark(spark, tmp_path):
    """Append-mode + watermark must drop a row older than the watermark —
    the semantics a 100 TB late-arrival pipeline depends on."""
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    schema = "ts timestamp, k string"

    def write_file(rows, name, mtime):
        tmp = str(tmp_path / ("_" + name))
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        dst = os.path.join(src, name + ".parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (mtime, mtime))

    import datetime as dt

    h = lambda hh, mm=0: dt.datetime(2024, 1, 1, hh, mm)
    now = time.time()
    # The late-row filter uses the watermark with one batch of lag (it
    # must: a window still in state may legally absorb late rows — only
    # an already-EVICTED window's rows are dropped). So the hour-1 window
    # is evicted at the end of batch 1, and batch 2's hour-1 row hits a
    # closed window and is discarded.
    write_file([(h(1, 30), "a"), (h(6, 0), "a")], "b0", now - 300)
    write_file([(h(7, 30), "a")], "b1", now - 200)
    write_file([(h(1, 31), "late"), (h(8, 30), "a")], "b2", now - 100)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_memory(agg)
    counts = {r["w"]["start"].hour: r["n"] for r in out.collect()}
    # hour-1 window was closed by batch 2's watermark with ONLY the on-time
    # row; the late row did not resurrect or augment it
    assert counts.get(1) == 1, counts


def test_stateful_counts_and_ingest(spark, sf_dir, tmp_path):
    got = {
        r["user_id"]: r["n_events"]
        for r in stateful_user_counts(spark, sf_dir, str(tmp_path / "st"), 3).collect()
    }
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exp = {r["user_id"]: r["cnt"] for r in ev.groupBy("user_id").agg(F.count("*").alias("cnt")).collect()}
    assert got == exp

    summary = ingest_updates(spark, sf_dir, str(tmp_path / "ing")).first()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept = emb.filter(F.col("vec_id") % 10 != 7)
    assert summary["n"] == kept.count()
    assert summary["sum_vec_id"] == kept.select(F.sum("vec_id")).first()[0]


def test_stream_dedup_agrees_with_batch_dedup(spark, sf_dir, tmp_path):
    """The streaming first-seen-wins dedup must mark the same duplicate
    SETS as the batch groupBy (winners may differ: batch keeps min doc_id,
    streaming keeps min (batch, doc_id)) — group membership is invariant."""
    from pyspark.sql import functions as F

    from cs598vectordb_spark.operators.dedup import dedup_exact
    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import stream_dedup

    docs = load_table(spark, sf_dir, "documents")
    got = stream_dedup(spark, sf_dir, str(tmp_path / "sd"), n_splits=3)
    batch = dedup_exact(docs)
    n_groups_stream = got.filter(~F.col("is_dup")).count()
    n_groups_batch = batch.select("fingerprint").distinct().count()
    assert n_groups_stream == n_groups_batch
    assert got.count() == docs.count()


def test_stream_quality_gate_matches_batch(spark, sf_dir, tmp_path):
    """Evidence pin for the rows-only stream_quality_gate entry: the
    ingest-edge Gopher gate is a stateless projection, so the drained
    union over micro-batches must equal the BATCH bank's keep set
    row for row — every column, not just ids (exact parity is the
    whole point of a stateless gate)."""
    from cs598vectordb_spark.operators.textops import repetition_scores
    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import stream_quality_gate

    docs = load_table(spark, sf_dir, "documents")
    got = stream_quality_gate(spark, sf_dir, str(tmp_path / "qg"), n_splits=3)
    want = repetition_scores(docs).filter(~F.col("repetitive"))
    assert got.count() == want.count() > 0
    g = got.select(*sorted(got.columns))
    w = want.select(*sorted(want.columns))
    assert g.exceptAll(w).count() == 0 and w.exceptAll(g).count() == 0


def test_merge_cow_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """The copy-on-write MERGE contract, asserted at the file level: the
    upsert plan touches keys vec_id%10 in {2,5}, so with pid = vec_id%10
    only partitions pid=2 and pid=5 may be rewritten after the initial
    snapshot; every other partition's files must remain byte-identical
    (same names, sizes, mtimes). The final table matches the batch MERGE
    closed form, and the pruned per-batch read shows PartitionFilters."""
    import os

    from pyspark.sql import functions as F

    from cs598vectordb_spark.streaming.jobs import merge_upserts_cow_stream

    work = str(tmp_path / "cow")
    snap_dir = os.path.join(work, "snapshot")

    out = merge_upserts_cow_stream(spark, sf_dir, work, n_parts=10).cache()

    def newest_mtime(pid: int) -> float:
        d = os.path.join(snap_dir, f"pid={pid}")
        return max(
            os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    untouched = [p for p in range(10) if p not in (2, 5)]
    oldest_touched = min(newest_mtime(p) for p in (2, 5))
    for p in untouched:
        assert newest_mtime(p) < oldest_touched, (
            f"partition pid={p} was rewritten by a batch that did not touch it"
        )

    # value contract: same closed form as the whole-rewrite MERGE
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    expected = emb.select(
        "vec_id",
        (
            F.col("label")
            + F.when(F.col("vec_id") % 10 == 2, 300)
            .when(F.col("vec_id") % 10 == 5, 200)
            .otherwise(0)
        ).alias("label"),
    )
    assert out.count() == emb.count()
    assert out.exceptAll(expected).count() == 0
    out.unpersist()

    # the per-batch read prunes at the scan: PartitionFilters, not a
    # post-scan Filter
    pruned = spark.read.parquet(snap_dir).filter(F.col("pid").isin([2]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "pid" in plan, plan


def test_stream_near_dedup_agrees_with_batch_lsh(spark, sf_dir, tmp_path):
    """The streaming near-dup claims must be consistent with the batch
    banded-LSH machinery they share: every (doc, dup_of) pair must be a
    batch candidate pair (they collide on at least one band), dup_of is
    always an earlier arrival under the (batch, doc_id) order, and docs
    with no batch candidate pair are never flagged."""
    from cs598vectordb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import stream_near_dedup

    docs = load_table(spark, sf_dir, "documents")
    out = stream_near_dedup(spark, sf_dir, str(tmp_path / "near"), n_splits=3)
    flagged = {r.doc_id: r.dup_of for r in out.filter(F.col("is_dup")).collect()}

    cand = {
        tuple(sorted((r.doc_a, r.doc_b)))
        for r in lsh_candidate_pairs(minhash_signatures(docs, 16), 8, 2).collect()
    }
    in_pairs = {d for p in cand for d in p}
    for doc, winner in flagged.items():
        assert tuple(sorted((doc, winner))) in cand, (doc, winner)
        assert (winner % 3, winner) < (doc % 3, doc), (doc, winner)
    assert set(flagged) <= in_pairs
    # total coverage: one row per document
    assert out.count() == docs.count()


def test_parquet_sink_exactly_once_replay(spark, sf_dir, tmp_path):
    """The file sink's exactly-once contract: a second availableNow run
    against the SAME checkpoint and the same (fully consumed) input must
    commit zero new rows — the _spark_metadata manifest, not file
    listing, defines the sink's contents."""
    import os

    from cs598vectordb_spark.config import STREAM_STATE_PARTITIONS
    from cs598vectordb_spark.streaming.jobs import events_stream, hourly_counts_to_parquet

    work = str(tmp_path / "sink")
    first = hourly_counts_to_parquet(spark, sf_dir, work)
    n1 = first.count()
    assert n1 > 0
    assert os.path.isdir(os.path.join(work, "data", "_spark_metadata"))

    # replay: same checkpoint, same input — the source offset log says
    # everything is consumed, so the run is a no-op
    agg = (
        events_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "sum_value")
    )
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    spark.conf.set(key, str(STREAM_STATE_PARTITIONS))
    try:
        q = (
            agg.writeStream.format("parquet")
            .option("path", os.path.join(work, "data"))
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prev)
    n2 = spark.read.parquet(os.path.join(work, "data")).count()
    assert n2 == n1, (n1, n2)


def test_stream_knn_graph2_recall(spark, sf_dir):
    """Index-backed streaming serving must drain to near-exact results:
    every query answered exactly once with k dense ranks, recall vs the
    batch exact oracle above the layered2 probe's floor."""
    import __spark_entry__ as em

    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.operators.metrics import recall_at_k
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    got = em.queries()["stream_knn_graph2"](spark, sf_dir).cache()
    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, 100)
    assert got.select("q_id").distinct().count() == 100
    truth = knn_exact(emb, q, 10)
    rec = recall_at_k(got, truth, 10).collect()[0][0]
    assert rec >= 0.8, rec
    got.unpersist()


def test_cow_dynamic_protocol_recovers_recall(spark, sf_dir, tmp_path):
    """The streaming COW + incremental-index dynamic protocol must (a)
    dip while half the ground-truth neighbors are deleted, (b) RECOVER
    once they stream back in (post_insert >= baseline - 0.02 — the
    reference's stability signal, constant recall across cycles in
    dynamic_script_faiss logs), with every phase present exactly once."""
    from cs598vectordb_spark.streaming.jobs import cow_dynamic_protocol

    m = cow_dynamic_protocol(spark, sf_dir, str(tmp_path / "cow"), pct=50)
    rows = {r.phase: r for r in m.collect()}
    assert set(rows) == {"baseline", "post_delete", "post_insert"}
    base_rec = rows["baseline"].recall
    assert rows["post_delete"].recall < base_rec  # the dip is real
    assert rows["post_insert"].recall >= base_rec - 0.02, (
        rows["post_insert"].recall,
        base_rec,
    )


def test_stream_interval_join_outer_exactly_once(spark, sf_dir):
    """Left-outer stream-stream interval join: (a) the matched subset
    equals the batch inner join exactly, (b) every unmatched view whose
    6h window expired before the final watermark emits exactly ONE NULL
    row, (c) no NULL row exists for a matched or still-buffered view."""
    import datetime as dt

    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import interval_join_stream

    out = interval_join_stream(spark, sf_dir, how="left_outer").cache()

    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    inner = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 6 HOURS")),
    ).select("user_id", "view_id", "click_id")
    got_matched = {
        (r.user_id, r.view_id, r.click_id)
        for r in out.filter(F.col("click_id").isNotNull()).collect()
    }
    want_matched = {(r.user_id, r.view_id, r.click_id) for r in inner.collect()}
    assert got_matched == want_matched and got_matched

    # final watermark = min over both sides' per-side max ts, minus delay
    max_view, max_click = ev.agg(
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))),
        F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
    ).first()
    wm = min(max_view, max_click) - dt.timedelta(hours=1)
    expired_unmatched = {
        (r.user_id, r.view_id)
        for r in v.join(
            inner.select("view_id"), "view_id", "left_anti"
        )
        .filter(F.col("view_ts") + F.expr("INTERVAL 6 HOURS") < F.lit(wm))
        .collect()
    }
    null_rows = [
        (r.user_id, r.view_id)
        for r in out.filter(F.col("click_id").isNull()).collect()
    ]
    assert len(null_rows) == len(set(null_rows)), "late-expiry row emitted twice"
    assert set(null_rows) == expired_unmatched
    out.unpersist()


def test_stream_interval_join_full_closed_form(spark, sf_dir):
    """Evidence pin for the rows-only stream_interval_join_full entry:
    the drained full-outer result must equal the relational closed form
    exactly — matches, plus expired unconverted views (NULL click_id),
    plus expired orphan clicks (NULL view_id), all against the
    min-of-per-side-max watermark."""
    import datetime as dt

    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import interval_join_stream

    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in interval_join_stream(spark, sf_dir, how="full_outer").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    rows = ev.filter(F.col("event_type").isin("view", "click")).select(
        "user_id", "event_id", "ts", "event_type"
    ).collect()
    views = [(r.user_id, r.event_id, r.ts) for r in rows if r.event_type == "view"]
    clicks = [(r.user_id, r.event_id, r.ts) for r in rows if r.event_type == "click"]
    wm = min(max(t for _, _, t in views), max(t for _, _, t in clicks)) - dt.timedelta(
        hours=1
    )
    win = dt.timedelta(hours=6)
    want = set()
    matched_v, matched_c = set(), set()
    for vu, vid, vts in views:
        for cu, cid, cts in clicks:
            if vu == cu and vts <= cts <= vts + win:
                want.add((vu, vid, cid))
                matched_v.add(vid)
                matched_c.add(cid)
    for vu, vid, vts in views:
        if vid not in matched_v and vts + win < wm:
            want.add((vu, vid, None))
    for cu, cid, cts in clicks:
        if cid not in matched_c and cts < wm:
            want.add((cu, None, cid))
    assert got == want
    assert any(v is None for _, v, _ in got)  # orphan clicks present
    assert any(c is None for _, _, c in got)  # unconverted views present


def test_interval_join_outer_boundary_is_strict(spark, tmp_path):
    """Pins the EXACT eviction boundary on a synthetic fixture with a
    deliberate tie: a view whose window closes exactly AT the final
    watermark must be RETAINED (no NULL row — strict <), while a view
    1µs older emits. This is the strictness the left/full-outer oracles
    encode; if a Spark upgrade flips the boundary, this fails loudly
    instead of the driver gate mismatching."""
    import datetime as dt
    import os
    import shutil

    from cs598vectordb_spark.streaming.jobs import interval_join_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    us = dt.timedelta(microseconds=1)
    # final watermark = min(max_view, max_click) - 1h = t0+12h
    # (max_view = t0+20h, max_click = t0+13h)
    rows = [
        # expires: window closes at t0+6h-1µs < wm  -> NULL row
        (1, 100, t0 - us, "view"),
        # exact tie: window closes at t0+6h+6h == t0+12h == wm
        (2, 101, t0 + 6 * h, "view"),
        # young: closes at t0+17h > wm -> retained
        (3, 102, t0 + 11 * h, "view"),
        # watermark anchors (distinct users, no matches anywhere)
        (8, 900, t0 + 20 * h, "view"),
        (9, 901, t0 + 13 * h, "click"),
    ]
    src = str(tmp_path / "boundary")
    os.makedirs(src)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    tmp = str(tmp_path / "_b")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    shutil.move(os.path.join(tmp, part), os.path.join(src, "events.parquet"))
    shutil.rmtree(tmp)

    out = interval_join_stream(spark, src, how="left_outer")
    nulls = {r.view_id for r in out.collect() if r.click_id is None}
    assert 100 in nulls, nulls          # clearly-expired view emits
    assert 102 not in nulls, nulls      # young view retained
    assert 101 not in nulls, (          # the tie: strict < (retained)
        "boundary semantics changed: a view expiring exactly AT the "
        "watermark emitted a NULL row — update the stream_interval_join_"
        "outer/full oracles' strictness to match"
    )


def test_cow_dynamic_protocol_pct100_no_resurrection(spark, sf_dir, tmp_path):
    """pct=100 empties EVERY snapshot partition in the delete batch —
    the case where dynamic partition overwrite rewrites nothing and the
    deleted rows would silently resurrect (ADVICE r8). After the fix the
    post_delete probe must see an empty keep set (recall 0), and the
    re-insert batch must restore the full table exactly."""
    import os

    from cs598vectordb_spark.streaming.jobs import cow_dynamic_protocol

    work = str(tmp_path / "cow100")
    m = cow_dynamic_protocol(spark, sf_dir, work, pct=100)
    rows = {r.phase: r for r in m.collect()}
    assert set(rows) == {"baseline", "post_delete", "post_insert"}
    # empty index after delete-all: the probe can find nothing
    assert rows["post_delete"].recall == 0.0, rows["post_delete"].recall
    assert rows["post_insert"].recall >= rows["baseline"].recall - 0.02

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    snap = spark.read.parquet(os.path.join(work, "snapshot"))
    assert snap.count() == emb.count()
    assert snap.select("vec_id").exceptAll(emb.select("vec_id")).count() == 0


def test_stream_drop_duplicates_exactly_once(spark, sf_dir):
    """A doubled replay through dropDuplicatesWithinWatermark must
    reproduce the single-copy aggregate exactly — count AND checksum."""
    import os

    from pyspark.sql import functions as F

    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import stream_drop_duplicates

    got = {
        r.event_type: (r.n, r.sum_value)
        for r in stream_drop_duplicates(
            spark, sf_dir, "/tmp/cs598_spark_io/test_dropdup"
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.event_type: (r.n, r.sum_value)
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .collect()
    }
    assert got == want


def test_stream_hourly_unique_users_sketch_accuracy(spark, sf_dir):
    """The HLL++ per-window distinct-user estimate must stay within 10%
    of the exact batch distinct for every emitted window (default rsd is
    5%; 10% gives headroom for small windows), on exactly the windows
    the watermark closed."""
    from pyspark.sql import functions as F

    from cs598vectordb_spark.sources.tables import load_table
    from cs598vectordb_spark.streaming.jobs import hourly_unique_users

    got = {r.hour: r.approx_users for r in hourly_unique_users(spark, sf_dir).collect()}
    assert got, "no windows emitted"
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.hour: r.u
        for r in ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for hour, approx in got.items():
        assert abs(approx - exact[hour]) <= max(0.10 * exact[hour], 2), (
            hour, approx, exact[hour],
        )


def test_parquet_sink_incremental_restart(spark, tmp_path):
    """The cron-style production pattern: a checkpointed availableNow
    stream is run, MORE data arrives, and a second run against the SAME
    checkpoint must process only the delta — no reprocessing, no
    duplicates, and the advancing watermark closes (and emits) exactly
    the windows the union of both runs closes. This is the restartable
    exactly-once contract a 100 TB daily pipeline relies on."""
    import datetime as dt
    import os
    import shutil

    from cs598vectordb_spark.config import STREAM_STATE_PARTITIONS

    src = str(tmp_path / "src")
    data_dir = str(tmp_path / "data")
    ckpt_dir = str(tmp_path / "ckpt")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1)

    def write_file(hours, name):
        rows = [(t0 + dt.timedelta(hours=h, minutes=7), "ev", 1.0) for h in hours]
        df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
        tmp = str(tmp_path / ("_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        shutil.move(os.path.join(tmp, part), os.path.join(src, name + ".parquet"))
        shutil.rmtree(tmp)

    def run_once():
        s = spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
        stream = s.readStream.schema(
            "ts timestamp, event_type string, value double"
        ).parquet(src)
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("hour"), "n")
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
        return {r.hour.hour: r.n for r in spark.read.parquet(data_dir).collect()}

    # run 1: hours 0..9 -> watermark 9-1=8 -> windows 0..7 close
    write_file(range(10), "b0")
    got1 = run_once()
    assert got1 == {h: 1 for h in range(8)}, got1

    # run 2, same checkpoint: hours 10..20 arrive -> watermark 19 ->
    # windows 8..18 close NOW (8 and 9 carried in state across the
    # restart); 0..7 must NOT be re-emitted
    write_file(range(10, 21), "b1")
    got2 = run_once()
    assert got2 == {h: 1 for h in range(19)}, got2


def test_stream_state_bound_evicts_with_watermark(spark, sf_dir):
    """Evidence pin for the rows-only stream_state_bound entry — the
    watermark's state bound measured, not asserted: (a) every input row
    is ingested, (b) resident state PEAKS far below the total window
    count (one watermark horizon, not everything ever seen), (c)
    eviction conservation holds exactly (windows added == evicted +
    resident at the end; every evicted window emitted exactly once in
    append mode), (d) the terminal no-data batch drains state to the
    unexpired tail."""
    import __spark_entry__ as em

    from cs598vectordb_spark.sources.tables import load_table

    rows = sorted(
        em.queries()["stream_state_bound"](spark, sf_dir).collect(),
        key=lambda r: r.batch_id,
    )
    assert len(rows) >= 4  # multiple micro-batches, or nothing is measured

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_hours = ev.select(F.date_trunc("hour", "ts")).distinct().count()

    assert sum(r.input_rows for r in rows) == n_events
    peak = max(r.state_rows for r in rows)
    assert 0 < peak < 0.55 * n_hours, (peak, n_hours)

    removed = sum(r.state_rows_removed for r in rows)
    emitted = sum(r.emitted_rows for r in rows)
    assert removed == emitted  # append mode: evicted == emitted, once
    assert rows[-1].state_rows == n_hours - removed  # conservation
    assert rows[-1].state_rows < peak  # terminal drain happened


def test_stream_join_state_bound(spark, sf_dir):
    """Evidence pin for the rows-only stream_join_state_bound entry:
    (a) both source branches ingest every event row, (b) buffered rows
    obey exact conservation (view+click rows buffered == evicted +
    resident at the end), (c) resident state peaks far below the total
    buffered volume (one delay+window horizon), and (d) the rows
    emitted across batches sum EXACTLY to the batch inner interval
    join's row count — the state machinery reproduces the oracled join
    semantics."""
    import __spark_entry__ as em

    from cs598vectordb_spark.sources.tables import load_table

    rows = sorted(
        em.queries()["stream_join_state_bound"](spark, sf_dir).collect(),
        key=lambda r: r.batch_id,
    )
    assert len(rows) >= 4

    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    vc = ev.filter(F.col("event_type").isin("view", "click")).count()
    assert sum(r.input_rows for r in rows) == 2 * n_events  # both branches

    removed = sum(r.state_rows_removed for r in rows)
    assert removed + rows[-1].state_rows == vc  # conservation over buffers
    peak = max(r.state_rows for r in rows)
    assert 0 < peak < 0.5 * vc, (peak, vc)
    assert rows[-1].state_rows < peak

    v = ev.filter("event_type = 'view'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("vid"),
        F.col("ts").alias("vts"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("cid"),
        F.col("ts").alias("cts"),
    )
    matched = v.join(
        c,
        (v.u == c.u)
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.col("vts") + F.expr("INTERVAL 6 HOURS")),
    ).count()
    assert sum(r.emitted_rows for r in rows) == matched


def test_stream_quality_gate_oracle_parity(spark, sf_dir, tmp_path):
    """DuckDB parity for the stream_quality_gate oracle (PROMOTED r13
    from the r12 queue): the drained micro-batch union must match the
    DuckDB recomputation (the full repetition bank + the keep-filter)
    row for row at sf0.001 under the driver's sorted-columns value
    comparison. Complements the batch/stream parity pin: that one
    proves stream == batch engine-side; this one proves both == the
    independent relational oracle."""
    import duckdb

    import __spark_entry__ as em
    from cs598vectordb_spark.streaming.jobs import stream_quality_gate

    sdf = stream_quality_gate(spark, sf_dir, str(tmp_path / "gate"))
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    res = con.execute(em.oracle_sql()["stream_quality_gate"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def c(v):
            return f"{v:.6f}" if isinstance(v, float) else str(v)

        return sorted(tuple(c(r[i]) for i in order) for r in rows)

    assert canon(srows, scols) == canon(drows, dcols)


def test_stream_knn_graph2_served_matches_batch(spark, sf_dir):
    """Streaming over the WORKER-SERVED index: the drained micro-batch
    union must equal the batch served probe row for row (per-query
    independence makes serving order irrelevant), which transitively
    equals the pinned probe via test_graph2_served_matches_pinned —
    the steady-state online-serving regime the worker cache exists
    for."""
    import __spark_entry__ as em

    from cs598vectordb_spark.operators.graph import knn_graph_layered2
    from cs598vectordb_spark.queries_index import graph2_served_for
    from cs598vectordb_spark.sources.tables import (
        load_table,
        queries_from_embeddings,
    )

    got = em.queries()["stream_knn_graph2_served"](spark, sf_dir)
    srows = sorted(tuple(r) for r in got.collect())

    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, 100)
    idx = graph2_served_for(spark, sf_dir)
    batch = knn_graph_layered2(
        idx, q, k=10, nprobe1=4, nprobe2=12, beam=32
    ).select("q_id", "rank", "vec_id")
    brows = sorted(tuple(r) for r in batch.collect())
    assert srows == brows and len(srows) == 1000


def test_stream_index_ingest(spark, sf_dir, tmp_path):
    """Streaming vector ingestion (r15): with n_splits=4 and a
    fragment threshold of 2 the LSM policy must fold EXACTLY twice and
    leave zero generations (deterministic: 1 gen, fold, 1 gen, fold —
    numbering restarts after each fold); every arrival is ingested
    exactly once; and the freshness probe retrieves every arrived
    vector as its own rank-1 neighbor (keep_vectors re-rank puts the
    zero-distance self first) — the ingested rows are SERVED, not just
    stored."""
    from cs598vectordb_spark.streaming.jobs import stream_index_ingest

    row = stream_index_ingest(
        spark, sf_dir, str(tmp_path / "ingest"), n_splits=4, max_generations=2
    ).first()
    assert row.n_batches == 4
    assert row.n_compactions == 2
    assert row.generations_left == 0
    from cs598vectordb_spark.sources.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    assert row.n_ingested == n - n // 2
    assert row.self_hit_rate == 1.0, row.self_hit_rate
