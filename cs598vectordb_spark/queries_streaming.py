"""Streaming-surface queries()/oracle_sql() entries.

Each callable runs a real Structured Streaming job to completion
(availableNow) and returns the drained sink as a batch DataFrame; the
DuckDB oracle recomputes the deterministic emission set relationally
(append-mode emission == windows closed by the final watermark).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cs598vectordb_spark.queries_sources import _io_dir
from cs598vectordb_spark.registry import register
from cs598vectordb_spark.streaming.jobs import (
    hourly_counts,
    ingest_updates,
    sessionize_stream,
    stateful_user_counts,
)


@register(
    "stream_events_hourly",
    """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
  FROM ev GROUP BY 1, 2
)
SELECT hour, event_type, n_events, sum_value
FROM agg
WHERE hour + INTERVAL 1 HOUR <= (SELECT MAX(ts) FROM ev) - INTERVAL 1 HOUR
""",
)
def q_stream_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window streaming agg; oracle = batch agg
    restricted to windows the final watermark closed."""
    return hourly_counts(spark, sf_dir, delay="1 hour")


@register(
    "stream_sessionize",
    """
WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value FROM events),
flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessed AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
  FROM flagged
),
sess AS (
  SELECT user_id, MIN(ts) AS session_start,
         MAX(ts) + INTERVAL 30 MINUTE AS session_end_gap,
         COUNT(*) AS n_events, ROUND(SUM(value), 4) AS session_value
  FROM sessed GROUP BY user_id, session_seq
)
SELECT user_id, session_start, session_end_gap, n_events, session_value
FROM sess
WHERE session_end_gap <= (SELECT MAX(ts) FROM ev) - INTERVAL 30 MINUTE
""",
)
def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(30 min gap) per user over the event stream; oracle =
    the batch lag/sum sessionizer restricted to watermark-closed sessions."""
    return sessionize_stream(spark, sf_dir, gap="30 minutes", delay="30 minutes")


@register(
    "stream_stateful_counts",
    "SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
)
def q_stream_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running counter across 3 ordered
    micro-batches; max(running) per user == plain relational count."""
    work = os.path.join(_io_dir(sf_dir, "stream_state"), "splits")
    return stateful_user_counts(spark, sf_dir, work, n_splits=3)


@register(
    "stream_ingest_updates",
    """
SELECT COUNT(*) AS n, CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id,
       CAST(SUM(label) AS BIGINT) AS sum_label
FROM embeddings WHERE vec_id % 10 <> 7
""",
)
def q_stream_ingest_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch CDC: ordered delete/delete/insert op files applied to
    versioned snapshots; net effect is the oracle's WHERE clause."""
    return ingest_updates(spark, sf_dir, _io_dir(sf_dir, "stream_ingest"))


@register(
    "stream_merge_upserts",
    """
SELECT vec_id,
       CAST(label + CASE WHEN vec_id % 10 = 2 THEN 300
                         WHEN vec_id % 10 = 5 THEN 200
                         ELSE 0 END AS INTEGER) AS label
FROM embeddings
""",
)
def q_stream_merge_upserts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MERGE (Delta-shaped upsert sink): three ordered upsert
    micro-batches applied WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT
    with last-writer-wins; the final snapshot's per-row labels face the
    value hash (keys %10==2 updated twice — only the last write may
    survive)."""
    from cs598vectordb_spark.streaming.jobs import merge_upserts_stream

    return merge_upserts_stream(spark, sf_dir, _io_dir(sf_dir, "stream_merge"))


@register(
    "stream_merge_upserts_cow",
    """
SELECT vec_id,
       CAST(label + CASE WHEN vec_id % 10 = 2 THEN 300
                         WHEN vec_id % 10 = 5 THEN 200
                         ELSE 0 END AS INTEGER) AS label
FROM embeddings
""",
)
def q_stream_merge_upserts_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned copy-on-write streaming MERGE: snapshot laid out
    partitionBy(pid = vec_id % 10); each micro-batch reads only the
    touched partitions (PartitionFilters at the scan) and rewrites only
    those directories (dynamic partition overwrite) — batch cost scales
    with |touched partitions|, not |table|. Same last-writer-wins closed
    form as stream_merge_upserts; untouched-partition immutability is
    mtime-pinned in tests/test_streaming.py."""
    from cs598vectordb_spark.streaming.jobs import merge_upserts_cow_stream

    return merge_upserts_cow_stream(spark, sf_dir, _io_dir(sf_dir, "stream_merge_cow"))


@register(
    "stream_late_data",
    """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
cut AS (
  SELECT make_timestamp((epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2) AS cutoff,
         MAX(ts) AS mx
  FROM ev
),
ontime AS (SELECT ev.* FROM ev, cut WHERE ev.ts >= cut.cutoff),
agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
  FROM ontime GROUP BY 1, 2
)
SELECT hour, event_type, n_events, sum_value
FROM agg, cut
WHERE hour + INTERVAL 1 HOUR <= cut.mx - INTERVAL 1 HOUR
""",
)
def q_stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark drop accounting: the old half of events arrives a batch
    late and is entirely discarded by the 1h watermark; the oracle is the
    on-time-only aggregate under the final watermark — the drop rule
    itself faces the value hash."""
    from cs598vectordb_spark.streaming.jobs import late_data_hourly

    return late_data_hourly(spark, sf_dir, _io_dir(sf_dir, "stream_late"), delay="1 hour")


@register(
    "stream_knn",
    # identical emission to batch knn_exact: streamed batches partition
    # the query set and per-query results are independent
    """
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 100
),
pairs AS (
  SELECT q.q_id, b.vec_id,
         list_sum(list_transform(list_zip(q.q_emb, b.embedding),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
             * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))) AS dist
  FROM q CROSS JOIN embeddings b
)
SELECT q_id, vec_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY dist ASC, vec_id ASC) AS INTEGER) AS rank
FROM pairs
QUALIFY rank <= 10
""",
)
def q_stream_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming kNN serving: query vectors arrive as 3 ordered
    micro-batches; foreachBatch probes the static base snapshot with the
    exact operator and appends top-10 rows. Drained union == batch kNN."""
    from cs598vectordb_spark.streaming.jobs import stream_knn

    return stream_knn(spark, sf_dir, _io_dir(sf_dir, "stream_knn"), n_splits=3)


@register(
    "stream_dedup",
    r"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
  FROM documents
),
w AS (
  SELECT fingerprint,
         MIN((doc_id % 3) * 10000000 + doc_id) % 10000000 AS winner_id
  FROM fp GROUP BY fingerprint
)
SELECT f.doc_id, f.doc_id <> w.winner_id AS is_dup, CAST(w.winner_id AS BIGINT) AS winner_id
FROM fp f JOIN w USING (fingerprint)
""",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: first-seen-wins fingerprint state across 3
    ordered micro-batches (applyInPandasWithState). Winner per
    fingerprint = argmin (batch index, doc_id), which the oracle encodes
    as a lexicographic MIN."""
    from cs598vectordb_spark.streaming.jobs import stream_dedup

    return stream_dedup(spark, sf_dir, _io_dir(sf_dir, "stream_dedup"), n_splits=3)


def _quality_gate_oracle() -> str:
    from cs598vectordb_spark.queries_text import _repetition_oracle

    return f"SELECT * FROM ({_repetition_oracle()}) WHERE NOT repetitive"


@register("stream_quality_gate", _quality_gate_oracle())
def q_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-edge Gopher gate: the full repetition filter bank applied
    per micro-batch on a document file stream, keeping only
    non-repetitive docs — stateless, watermark-free, with exact
    batch/stream parity pinned in tests/test_streaming.py::
    test_stream_quality_gate_matches_batch. ORACLE PROMOTED r13
    (queued since r12, funded by the minhash_signatures/simhash_banded
    retirements): the gate IS repetition_scores' bank + the
    keep-filter, and the drained micro-batch union equals the batch
    filter row for row (the parity pin), so the batch oracle grades
    the stream; the DuckDB dress rehearsal is tests/test_streaming.py::
    test_stream_quality_gate_oracle_parity."""
    from cs598vectordb_spark.streaming.jobs import stream_quality_gate

    return stream_quality_gate(
        spark, sf_dir, _io_dir(sf_dir, "stream_qgate"), n_splits=3
    )


def _near_dedup_oracle() -> str:
    from cs598vectordb_spark.queries_text import _duck_bands, _duck_minhash_sigs

    return f"""
WITH {_duck_minhash_sigs(16)},
banded AS ({_duck_bands(8, 2)}),
win AS (
  SELECT band, sig,
         arg_min(doc_id, (doc_id % 3) * 100000000000 + doc_id) AS winner
  FROM banded GROUP BY band, sig
),
flags AS (
  SELECT b.doc_id,
         MIN(CASE WHEN w.winner <> b.doc_id THEN w.winner END) AS dup_of
  FROM banded b JOIN win w USING (band, sig)
  GROUP BY b.doc_id
)
SELECT doc_id, dup_of IS NOT NULL AS is_dup, CAST(dup_of AS BIGINT) AS dup_of
FROM flags
"""


@register("stream_near_dedup", _near_dedup_oracle())
def q_stream_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup dedup: banded-MinHash bucket claims with
    first-seen-wins applyInPandasWithState across 3 ordered micro-batches
    — the incremental half of minhash_lsh_dedup. Oracle reproduces the
    closed form (bucket winner = argmin (batch, doc_id); dup_of = least
    foreign winner over the doc's buckets)."""
    from cs598vectordb_spark.streaming.jobs import stream_near_dedup

    work = os.path.join(_io_dir(sf_dir, "stream_near_dedup"), "splits")
    return stream_near_dedup(spark, sf_dir, work, n_splits=3)


@register(
    "stream_sink_parquet",
    """
WITH ev AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events),
agg AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
         COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
  FROM ev GROUP BY 1, 2
)
SELECT hour, event_type, n_events, sum_value
FROM agg
WHERE hour + INTERVAL 1 HOUR <= (SELECT MAX(ts) FROM ev) - INTERVAL 1 HOUR
""",
)
def q_stream_sink_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durable streaming output: the watermarked hourly aggregate through
    a CHECKPOINTED parquet file sink, read back via the sink's
    _spark_metadata exactly-once manifest — the files on disk face the
    same closed-window oracle as the memory-sink job; replay idempotence
    is pinned in tests/test_streaming.py."""
    from cs598vectordb_spark.streaming.jobs import hourly_counts_to_parquet

    return hourly_counts_to_parquet(
        spark, sf_dir, _io_dir(sf_dir, "stream_sink_parquet"), delay="1 hour"
    )


@register("dynamic_cow_graph2")
def q_dynamic_cow_graph2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 end to end on the engine's best write path + best index: the
    delete/insert cycle arrives as ordered streaming micro-batches, each
    foreachBatch rewrites only the touched partitions of the
    copy-on-write parquet snapshot AND incrementally maintains the
    serving layered2 hierarchical index (tombstone semi-join / touched-
    segment repair — never a rebuild), probing after every batch.
    Returns the reference's metrics summary shape
    (dynamic_script_faiss.py:120-125). Rows-only: qps/latency are
    wall-clock by nature; the recall-recovery invariant (post_insert >=
    baseline - 0.02) is pinned in tests/test_streaming.py."""
    from cs598vectordb_spark.streaming.jobs import cow_dynamic_protocol

    return cow_dynamic_protocol(
        spark, sf_dir, _io_dir(sf_dir, "dynamic_cow"), pct=50
    )


@register(
    "stream_interval_join",
    """
WITH ev AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_id, user_id, event_type FROM events
)
SELECT v.user_id AS user_id, v.event_id AS view_id, c.event_id AS click_id
FROM ev v JOIN ev c
  ON v.event_type = 'view' AND c.event_type = 'click'
 AND v.user_id = c.user_id
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
""",
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner interval join (view -> click attribution
    within 6 hours, watermarked both sides so buffered state stays
    bounded): inner matches emit exactly once, so the drained result
    equals the relational self-join the oracle runs."""
    from cs598vectordb_spark.streaming.jobs import interval_join_stream

    return interval_join_stream(spark, sf_dir)


@register("stream_interval_join_outer")
def q_stream_interval_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT-OUTER watermarked stream-stream interval join — the
    attribution shape real pipelines need ("views that never converted",
    ref analog: the search/update event pairing,
    dynamic_script_faiss.py:89-112): matched pairs emit as found, and a
    view with no click in its 6-hour window emits exactly once with NULL
    click_id when the watermark expires its buffered state. Views whose
    window hasn't expired by the final watermark stay unreported (NULL
    emission only when view_ts + window < final watermark, the
    watermark being the MIN of the two sides' per-side max event time
    minus the delay).

    ORACLE RETIRED r19 (funding the semantic_decontamination
    promotion; shared-evidence class (1) verified against the SQL
    texts: its oracle's CTEs — ev/wm/v/c, the matched set m, the
    expired-view NULL set u — were character-identical to the prefix
    of the STILL-GRADED stream_interval_join_full's oracle, which
    grades the same `interval_join_stream(...)` builder at
    how="full_outer" = this entry's semantics PLUS the orphan-click
    branch; the inner matched set is additionally graded via
    stream_interval_join). Rows-only evidence pins
    (registry._ROWS_ONLY_EVIDENCE):
    tests/test_streaming.py::test_stream_interval_join_outer_exactly_once
    (matched set == batch inner join, exactly-one NULL per expired
    unmatched view, none otherwise) and the eviction-tie strictness pin
    test_interval_join_outer_boundary_is_strict."""
    from cs598vectordb_spark.streaming.jobs import interval_join_stream

    return interval_join_stream(spark, sf_dir, how="left_outer")


@register(
    "stream_static_enrich",
    """
WITH profile AS (
  SELECT user_id, COUNT(*) AS user_events, ROUND(SUM(value), 4) AS user_value
  FROM events GROUP BY user_id
)
SELECT e.user_id, e.event_type, COUNT(*) AS n,
       ANY_VALUE(p.user_events) AS user_events,
       ANY_VALUE(p.user_value) AS user_value
FROM events e JOIN profile p ON e.user_id = p.user_id
GROUP BY e.user_id, e.event_type
""",
)
def q_stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment: arriving events joined to a
    static per-user profile dimension, aggregated per (user, type) — the
    stateless enrichment join class (no watermark, no buffered state).
    Oracle = the identical relational join + aggregate."""
    from cs598vectordb_spark.streaming.jobs import stream_static_enrich

    return stream_static_enrich(spark, sf_dir)


@register(
    "stream_interval_join_full",
    """
WITH ev AS (
  SELECT CAST(ts AS TIMESTAMP) AS ts, event_id, user_id, event_type FROM events
),
wm AS (
  SELECT LEAST(MAX(CASE WHEN event_type='view' THEN ts END),
               MAX(CASE WHEN event_type='click' THEN ts END))
         - INTERVAL 1 HOUR AS w
  FROM ev
),
v AS (SELECT user_id, event_id AS view_id, ts AS view_ts FROM ev WHERE event_type='view'),
c AS (SELECT user_id, event_id AS click_id, ts AS click_ts FROM ev WHERE event_type='click'),
m AS (
  SELECT v.user_id, v.view_id, c.click_id
  FROM v JOIN c ON v.user_id = c.user_id
   AND c.click_ts >= v.view_ts AND c.click_ts <= v.view_ts + INTERVAL 6 HOUR
),
u AS (
  SELECT v.user_id, v.view_id, CAST(NULL AS BIGINT) AS click_id
  FROM v, wm
  WHERE v.view_ts + INTERVAL 6 HOUR < wm.w
    AND NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = v.user_id
                    AND c.click_ts >= v.view_ts
                    AND c.click_ts <= v.view_ts + INTERVAL 6 HOUR)
),
o AS (
  -- orphan clicks: a click's buffered state closes once the watermark
  -- passes its OWN event time (it can only ever match views at or
  -- before it) — boundary STRICT, same rule the eviction-tie pytest pins
  SELECT c.user_id, CAST(NULL AS BIGINT) AS view_id, c.click_id
  FROM c, wm
  WHERE c.click_ts < wm.w
    AND NOT EXISTS (SELECT 1 FROM v WHERE v.user_id = c.user_id
                    AND c.click_ts >= v.view_ts
                    AND c.click_ts <= v.view_ts + INTERVAL 6 HOUR)
)
SELECT * FROM m UNION ALL SELECT * FROM u UNION ALL SELECT * FROM o
""",
)
def q_stream_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-outer watermarked stream-stream interval join — the
    orphan-event audit stream completing the streaming join class
    (inner / left-outer / full-outer): matched pairs emit as found,
    unconverted views emit once with NULL click_id at window expiry
    (view_ts + 6h < watermark), and orphan clicks — clicks preceded by
    no view in their 6h look-back — emit once with NULL view_id when
    the watermark passes their own event time (a click can only match
    views at or before it, so click_ts < watermark closes its state).
    ORACLE PROMOTED r10 (the r9 queue); the closed form is also pinned
    value-exactly in
    tests/test_streaming.py::test_stream_interval_join_full_closed_form
    and the eviction boundary's strictness on an exact-tie fixture."""
    from cs598vectordb_spark.streaming.jobs import interval_join_stream

    return interval_join_stream(spark, sf_dir, how="full_outer")


@register("stream_state_bound")
def q_stream_state_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED watermark state-boundedness: the events table replayed
    as time-ordered micro-batches (one file per trigger) through a
    watermarked hourly aggregate, reporting per batch the rows Spark's
    state store actually held, evicted, and emitted
    (stateOperators.numRowsTotal / numRowsRemoved from the progress
    stream). The number every "bounded state" docstring in
    streaming/jobs.py rests on, measured: resident state peaks at ONE
    watermark horizon of windows (~1/n_splits of the hours + delay),
    each batch evicts the horizon the advancing watermark closed, and
    the terminal no-data batch drains to the unexpired tail — at
    100 TB/day this curve is the difference between a stream that runs
    forever and one that accumulates everything ever seen. Rows-only
    (store metrics by nature); conservation + peak bound pinned in
    tests/test_streaming.py::test_stream_state_bound_evicts_with_watermark."""
    from cs598vectordb_spark.streaming.jobs import state_bound_report

    return state_bound_report(spark, sf_dir, _io_dir(sf_dir, "state_bound"))


@register("stream_join_state_bound")
def q_stream_join_state_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-bound measurement for the HEAVIEST streaming state class —
    the stream-stream interval join (two buffered sides, the exact
    shape stream_interval_join serves): time-ordered micro-batch
    replay through the view→click attribution join, per-batch resident
    / evicted / emitted rows summed over both sides' buffers. Measured
    at sf0.01: ~4,000 view+click rows buffered over the run, resident
    state peaks at ~540 (one delay+window horizon), ~490 evicted per
    batch, terminal drain to the unexpired tail — and the rows emitted
    across batches sum EXACTLY to the oracled inner join's row count,
    tying the state machinery to the already-graded join semantics.
    Rows-only (store metrics by nature); conservation + peak bound +
    emitted-total pinned in
    tests/test_streaming.py::test_stream_join_state_bound."""
    from cs598vectordb_spark.streaming.jobs import join_state_bound_report

    return join_state_bound_report(spark, sf_dir, _io_dir(sf_dir, "state_bound"))


@register("stream_drop_duplicates")
def q_stream_drop_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative streaming dedup: the event file replayed as two
    micro-batches (an exact at-least-once replay) deduped by
    dropDuplicatesWithinWatermark — must equal the aggregate over the
    original unique events (pinned in tests/test_streaming.py;
    rows-only here, the oracle slot budget is at its cap)."""
    from cs598vectordb_spark.streaming.jobs import stream_drop_duplicates

    work = os.path.join(_io_dir(sf_dir, "stream_dropdup"), "splits")
    return stream_drop_duplicates(spark, sf_dir, work)


@register("stream_hourly_unique_users")
def q_stream_hourly_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked hourly distinct users via the HLL++ sketch — the
    mergeable constant-memory approximate aggregate (rows-only: the
    sketch is implementation-defined; its error vs exact distinct is
    bounded by test)."""
    from cs598vectordb_spark.streaming.jobs import hourly_unique_users

    return hourly_unique_users(spark, sf_dir)


@register("stream_index_ingest")
def q_stream_index_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous vector ingestion into a served IVF-PQ index (r15):
    the write path of a live vector store as a Structured Streaming
    job — arrivals land as list-partitioned delta writes (O(|batch|)),
    the LSM auto-compaction policy folds the chain at the fragment
    threshold, and the post-drain freshness probe asserts every
    arrived vector is retrievable (self at rank 1 through the fused
    refined probe). Completes the dynamic-update story's third driver:
    batch protocol phases (dynamic_protocol), CDC upserts
    (stream_merge_upserts_cow), and now raw vector arrival streams.
    Rows-only (layout/wall-clock accounting); deterministic fold
    count, full ingestion, and self-hit rate 1.0 pinned in
    tests/test_streaming.py::test_stream_index_ingest."""
    from cs598vectordb_spark.streaming.jobs import stream_index_ingest

    return stream_index_ingest(
        spark, sf_dir, _io_dir(sf_dir, "stream_index_ingest")
    )
