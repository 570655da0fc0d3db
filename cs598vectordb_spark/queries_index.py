"""ANN-index + workload queries() entries (SURVEY.md §2.3 T1/T2/T4, §2.5).

These are the genuinely non-SQL-expressible ops (seeded random
projections, k-means centroids, wall-clock metrics) — registered without
oracle_sql, so the driver records the weaker rows-only check. Their
correctness contract lives in tests/test_index.py: recall floors vs the
exact oracle (≥0.70, the reference's Annoy floor; autotuned target 0.9 —
BASELINE.md) and protocol invariants (recall returns to baseline after
insert, phases ordered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cs598vectordb_spark.config import DEFAULT_K, DEFAULT_N_QUERIES
from cs598vectordb_spark.operators import workloads
from cs598vectordb_spark.operators.index import (
    autotune_lsh,
    build_ivf_index,
    build_lsh_index,
    knn_ivf,
    knn_lsh,
)
from cs598vectordb_spark.operators.knn import knn_exact
from cs598vectordb_spark.operators.metrics import (
    phase_regions,
    recall_at_k,
    summary_last5,
    tenant_summary,
)
from cs598vectordb_spark.registry import register
from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

_K = DEFAULT_K
_NQ = DEFAULT_N_QUERIES


def _setup(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, queries_from_embeddings(emb, _NQ)


# ---- warm index registry -------------------------------------------------
# An index IS a materialized table: build once per (session, sf_dir,
# params), probe many times. Round 1's registered queries rebuilt their
# index inside every call, so the bench charged k-means/hashing/parquet
# writes to every probe (VERDICT round 1: knn_ivf_materialized 4.6s of
# which the probe is milliseconds). The cache is keyed by applicationId so
# a restarted session never sees another session's unresolvable plans.

_WARM: dict[tuple, object] = {}


def _warm(spark: SparkSession, key_parts: tuple, builder):
    key = (spark.sparkContext.applicationId,) + key_parts
    idx = _WARM.get(key)
    if idx is None:
        idx = builder()
        _WARM[key] = idx
    return idx


def lsh_index_for(
    spark: SparkSession,
    sf_dir: str,
    bucket_length: float = 2.0,
    num_tables: int = 16,
    hashes_per_table: int = 4,
):
    def build():
        emb, _ = _setup(spark, sf_dir)
        idx = build_lsh_index(emb, bucket_length, num_tables, hashes_per_table)
        idx.hash_table = idx.hash_table.persist()
        idx.hash_table.count()  # materialize at build time, not first probe
        return idx

    return _warm(spark, ("lsh", sf_dir, bucket_length, num_tables, hashes_per_table), build)


def ivf_index_for(spark: SparkSession, sf_dir: str, nlist: int = 16, mllib: bool = False):
    def build():
        emb, _ = _setup(spark, sf_dir)
        if mllib:
            from cs598vectordb_spark.operators.index import build_ivf_index_mllib

            idx = build_ivf_index_mllib(emb, nlist=nlist)
        else:
            idx = build_ivf_index(emb, nlist=nlist)
        idx.assigned = idx.assigned.persist()
        idx.assigned.count()
        return idx

    return _warm(spark, ("ivf", sf_dir, nlist, mllib), build)


def ivf_materialized_for(spark: SparkSession, sf_dir: str, nlist: int = 16):
    import os as _os

    from cs598vectordb_spark.operators.index import materialize_ivf
    from cs598vectordb_spark.queries_sources import _io_dir

    def build():
        return materialize_ivf(
            build_ivf_index(load_table(spark, sf_dir, "embeddings"), nlist=nlist),
            _os.path.join(_io_dir(sf_dir, "ivf_index"), "t"),
        )

    return _warm(spark, ("ivf_materialized", sf_dir, nlist), build)


def pq_artifacts_for(spark: SparkSession, sf_dir: str, m: int = 16, ksub: int = 256):
    """(codebook, persisted encoded table) for the PQ query family."""
    from cs598vectordb_spark.operators.pq import pq_encode, train_pq

    def build():
        emb, _ = _setup(spark, sf_dir)
        cb = train_pq(emb, m=m, ksub=ksub)
        enc = pq_encode(emb, cb).persist()
        enc.count()
        return (cb, enc)

    return _warm(spark, ("pq", sf_dir, m, ksub), build)


def sq_artifacts_for(spark: SparkSession, sf_dir: str):
    """(codec, persisted int8-encoded table) for the SQ8 query family."""
    from cs598vectordb_spark.operators.sq import sq_encode, train_sq

    def build():
        emb, _ = _setup(spark, sf_dir)
        codec = train_sq(emb)
        enc = sq_encode(emb, codec).persist()
        enc.count()
        return (codec, enc)

    return _warm(spark, ("sq8", sf_dir), build)


def knn_graph_for(spark: SparkSession, sf_dir: str, k: int = 10):
    """Flat kNN graph, built once per (session, sf_dir). Uses the
    spill-partitioned exact builder (two shuffle stages, graph recall
    ≥0.95 at spill=3/nlist=8 on sf0.1) — ~4x faster than the join-based
    NN-descent rounds it replaced (build_knn_graph stays available as
    the assumption-free fallback and for the refinement tests)."""
    from cs598vectordb_spark.operators.graph import build_knn_graph_partitioned

    def build():
        emb, _ = _setup(spark, sf_dir)
        g = build_knn_graph_partitioned(emb, k=k, spill=3, nlist=8).persist()
        g.count()
        return g

    return _warm(spark, ("knng", sf_dir, k), build)


def ivf2_index_for(
    spark: SparkSession, sf_dir: str, nlist1: int = 8, nlist2: int = 4
):
    """Two-level IVF, materialized PARTITIONED BY (l1_id, l2_id)."""
    import os as _os

    from cs598vectordb_spark.operators.ivf2 import build_ivf2_index, materialize_ivf2
    from cs598vectordb_spark.queries_sources import _io_dir

    def build():
        emb, _ = _setup(spark, sf_dir)
        return materialize_ivf2(
            build_ivf2_index(emb, nlist1=nlist1, nlist2=nlist2),
            _os.path.join(_io_dir(sf_dir, "ivf2_index"), "t"),
        )

    return _warm(spark, ("ivf2", sf_dir, nlist1, nlist2), build)


def layered_graph_for(
    spark: SparkSession, sf_dir: str, nlist: int = 16, degree: int = 16
):
    """Segmented (per-cluster) kNN-subgraph index — the Milvus
    per-segment-HNSW shape (dynamic_script_milvus.py:76-82)."""
    from cs598vectordb_spark.operators.graph import build_layered_graph

    def build():
        emb, _ = _setup(spark, sf_dir)
        return build_layered_graph(emb, nlist=nlist, degree=degree)

    return _warm(spark, ("layered_graph", sf_dir, nlist, degree), build)


def layered_graph2_for(
    spark: SparkSession, sf_dir: str, nlist1: int = 4, nlist2: int = 4, degree: int = 16
):
    """Layered graph over the ivf2 two-level coarse layer — segment count
    scales as nlist1·nlist2 while the driver holds only nlist1 centroids
    (the flat layered index's one remaining driver-size ceiling)."""
    from cs598vectordb_spark.operators.graph import build_layered_graph2

    def build():
        emb, _ = _setup(spark, sf_dir)
        return build_layered_graph2(emb, nlist1=nlist1, nlist2=nlist2, degree=degree)

    return _warm(spark, ("layered_graph2", sf_dir, nlist1, nlist2, degree), build)


def layered_graph_sq8_for(
    spark: SparkSession, sf_dir: str, nlist: int = 16, degree: int = 16
):
    """Layered graph whose segments store SQ8 codes (4x memory) — the
    DiskANN-style compressed-graph-in-RAM trade; edges from exact floats,
    walk distances from reconstructed codes."""
    from cs598vectordb_spark.operators.graph import build_layered_graph

    def build():
        emb, _ = _setup(spark, sf_dir)
        return build_layered_graph(emb, nlist=nlist, degree=degree, compress=True)

    return _warm(spark, ("layered_graph_sq8", sf_dir, nlist, degree), build)


def layered_graph_materialized_for(
    spark: SparkSession, sf_dir: str, nlist: int = 16, degree: int = 16
):
    """Layered graph persisted to parquet and reopened (write_index/
    read_index parity) — probes are identical to the in-memory build."""
    import os as _os

    from cs598vectordb_spark.operators.graph import materialize_layered
    from cs598vectordb_spark.queries_sources import _io_dir

    def build():
        return materialize_layered(
            layered_graph_for(spark, sf_dir, nlist, degree),
            _os.path.join(_io_dir(sf_dir, "graph_index"), "t"),
        )

    return _warm(spark, ("layered_graph_mat", sf_dir, nlist, degree), build)


def ivf_sq_index_for(spark: SparkSession, sf_dir: str, nlist: int = 16):
    """Compressed-inverted-list index (IVF partitions × SQ8 codes)."""
    import os as _os

    from cs598vectordb_spark.operators.sq import build_ivf_sq
    from cs598vectordb_spark.queries_sources import _io_dir

    def build():
        emb, _ = _setup(spark, sf_dir)
        return build_ivf_sq(
            emb, _os.path.join(_io_dir(sf_dir, "ivf_sq8"), "t"), nlist=nlist
        )

    return _warm(spark, ("ivf_sq8", sf_dir, nlist), build)


def warm_indexes(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Build every index artifact the headline queries probe, returning
    per-artifact build seconds — bench.py calls this before its timed
    region so probe latency is measured the way the reference measures it
    (index built once before the search loop, dynamic_script_faiss.py:31)."""
    import time as _time

    out: dict[str, float] = {}
    for name, fn in (
        ("lsh_build", lambda: lsh_index_for(spark, sf_dir)),
        ("ivf_build", lambda: ivf_index_for(spark, sf_dir)),
        ("ivf_materialize", lambda: ivf_materialized_for(spark, sf_dir)),
        ("pq_train_encode", lambda: pq_artifacts_for(spark, sf_dir)),
        ("sq8_train_encode", lambda: sq_artifacts_for(spark, sf_dir)),
        ("ivf_sq8_build", lambda: ivf_sq_index_for(spark, sf_dir)),
        ("ivfpq_build", lambda: ivfpq_index_for(spark, sf_dir)),
        # flat knn_graph build removed from the warm set: its probe is no
        # longer a headline query (superseded by layered2), and the warm
        # registry builds it lazily if the rows-only variants are called.
        ("layered_graph_build", lambda: layered_graph_for(spark, sf_dir)),
        ("ivf2_build", lambda: ivf2_index_for(spark, sf_dir)),
        ("layered_graph_sq8_build", lambda: layered_graph_sq8_for(spark, sf_dir)),
        ("layered_graph2_build", lambda: layered_graph2_for(spark, sf_dir)),
        # the served headline probe reads these on-disk artifacts; build
        # them here so its timed number is probe-only like the others
        ("graph2_materialize", lambda: graph2_materialized_for(spark, sf_dir)),
    ):
        t0 = _time.time()
        fn()
        out[name] = round(_time.time() - t0, 3)
    return out


@register("knn_lsh")
def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/Q2: LSH bucket-join approximate kNN (AND×4, OR×16, bl=2.0 —
    the autotuned high-recall point on this data). Index from the warm
    registry: first call builds + persists, later calls probe only.

    DATA-LIMITATION NOTE (measured, sf0.1): on this isotropic synthetic
    embedding table the recall/selectivity frontier is recall 0.94 at
    0.64 candidate selectivity, 0.90 at 0.66 (multiprobe T=8), 0.59 at
    0.24, 0.31 at 0.07 — identical across bucket lengths, i.e. a
    property of the data, not of tuning. High-recall LSH here scores
    ~2/3 of the |Q|x|B| product, so it cannot beat the pruned-kernel
    probes; IVF (materialized) and SQ8 are the engine's approximate
    paths of record (140-175+ QPS at >=0.9 recall), with layered-graph
    for update-heavy serving. LSH remains the right tool when data has
    genuine cluster structure, and the autotune sweep (lsh_autotune)
    measures exactly when that is true. Bench records the measured
    selectivity per run (extra.lsh_selectivity); as of round 5 the op is
    OFF the bench headline (a probe whose candidate set is 64% of the
    cross product is a full scan at 100× scale) and stays a registered,
    recall-floor-tested operator."""
    emb, q = _setup(spark, sf_dir)
    idx = lsh_index_for(spark, sf_dir)
    return knn_lsh(idx, emb, q, k=_K).select("q_id", "rank", "vec_id")


@register("knn_ivf")
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2/Q2: IVF partition-pruned kNN (nlist=16, nprobe=8 — scans ~50%
    of lists, the reference's nprobe/nlist knob)."""
    idx = ivf_index_for(spark, sf_dir, nlist=16)
    _, q = _setup(spark, sf_dir)
    return knn_ivf(idx, q, k=_K, nprobe=8).select("q_id", "rank", "vec_id")


@register("knn_ivf_materialized")
def q_knn_ivf_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 on-disk: the assigned table written PARTITIONED BY centroid_id
    and probed through parquet PartitionFilters — identical rows to
    knn_ivf, but the scan reads only the nprobe/nlist probed lists
    (verified by tests/test_plans.py)."""
    _, q = _setup(spark, sf_dir)
    idx = ivf_materialized_for(spark, sf_dir, nlist=16)
    return knn_ivf(idx, q, k=_K, nprobe=8).select("q_id", "rank", "vec_id")


@register("lsh_recall")
def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of knn_lsh vs exact — the reference's headline metric."""
    emb, q = _setup(spark, sf_dir)
    idx = lsh_index_for(spark, sf_dir)
    return recall_at_k(knn_lsh(idx, emb, q, _K), knn_exact(emb, q, _K), _K)


@register("ivf_recall")
def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, q = _setup(spark, sf_dir)
    idx = ivf_index_for(spark, sf_dir, nlist=16)
    return recall_at_k(knn_ivf(idx, q, _K, nprobe=8), knn_exact(emb, q, _K), _K)


@register("lsh_autotune")
def q_lsh_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: the autotune sweep trace (param grid × recall × probe cost);
    the chosen config is the cheapest clearing the 0.7 floor."""
    emb, q_full = _setup(spark, sf_dir)
    q = q_full.limit(20)
    truth = knn_exact(emb, q, _K)
    _, trace = autotune_lsh(emb, q, truth, target_recall=0.7, k=_K)
    return spark.createDataFrame(
        [(t["bucket_length"], t["num_tables"], t["recall"], t["selectivity"]) for t in trace],
        "bucket_length double, num_tables int, recall double, selectivity double",
    )


@register("bench_loop")
def q_bench_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: bounded steady-state search loop — per-interval qps/latency/
    recall rows (dynamic_script_faiss.py:31-43). Recall is deterministic
    (exact backend ⇒ 1.0); wall-clock columns vary, so rows-only check."""
    emb, q = _setup(spark, sf_dir)
    return workloads.bench_loop(spark, emb, q, backend="exact", intervals=3)


@register("dynamic_protocol")
def q_dynamic_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: per-(backend, update_pct) mean qps/latency/recall of the last 5
    intervals — the reference's summary table (dynamic_script_faiss.py:
    119-125). Wall-clock values vary run to run; shape and recall column
    are the stable contract."""
    emb, q = _setup(spark, sf_dir)
    m = workloads.dynamic_protocol(
        spark, emb, q, backend="exact", update_percents=[50], intervals_per_phase=2
    )
    return summary_last5(m)


@register("recall_degradation")
def q_recall_degradation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's headline dynamic artifact: recall-degradation
    curves across update cycles at update_percents=[25,50,75] on the
    engine's incremental indexes (layered2 + compressed layered/SQ8),
    in the results_summary shape of dynamic_script_faiss.py:68-73,
    120-125 plus the post-delete dip column. Recovery invariant
    (final_recall >= baseline - 0.02) pinned in
    tests/test_updates_metrics.py; wall-clock columns vary → rows-only."""
    emb, q = _setup(spark, sf_dir)
    return workloads.recall_degradation(
        spark, emb, q.limit(20), backends=["graph2", "graph_sq8"]
    )


@register("dynamic_phase_regions")
def q_dynamic_phase_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: interval spans per phase from the same protocol run."""
    emb, q = _setup(spark, sf_dir)
    m = workloads.dynamic_protocol(
        spark, emb, q, backend="exact", update_percents=[50], intervals_per_phase=2
    )
    return phase_regions(m)


@register("plot_series")
def q_plot_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 analog (plots.py:47-95): run the W1 loop on two backends, fold
    the per-interval QPS into comparison-chart rows (CSV series + Unicode
    sparkline), and persist them through the chart sink. Wall-clock values
    → rows-only check; the artifact shape is the contract."""
    import os as _os

    from cs598vectordb_spark.operators.metrics import comparison_chart
    from cs598vectordb_spark.queries_sources import _io_dir
    from cs598vectordb_spark.sources.logs import write_series_chart

    emb, q = _setup(spark, sf_dir)
    m = workloads.bench_loop(spark, emb, q, backend="exact", intervals=3).unionByName(
        workloads.bench_loop(spark, emb, q, backend="ivf", intervals=3)
    )
    chart = comparison_chart(m, value_col="qps")
    write_series_chart(chart, _os.path.join(_io_dir(sf_dir, "plot_series"), "chart"))
    return chart


@register("dynamic_overlap")
def q_dynamic_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/exclusive=false: the reference's search-DURING-update mode
    (dynamic_script_faiss.py:75-117, BASELINE.md's −52%-QPS-during-rebuild
    FAISS row). Snapshot rebuilds run in a background thread while the
    search loop measures against the serving snapshot; rows tagged
    phase='during_delete'/'during_insert' carry the contention QPS."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="exact", update_percents=[50],
        intervals_per_phase=2, exclusive=False,
    )


@register("dynamic_overlap_ivf")
def q_dynamic_overlap_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/exclusive=false with an INDEX backend: during-update intervals
    probe the serving IVF index while the new snapshot's k-means index
    REBUILDS in a background thread — the faithful rendering of the
    reference's search-during-HNSW-rebuild headline
    (dynamic_script_faiss.py:75-117, BASELINE.md −52% FAISS row)."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="ivf", update_percents=[50],
        intervals_per_phase=2, exclusive=False,
    )


@register("dynamic_overlap_graph")
def q_dynamic_overlap_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/exclusive=false with the LAYERED GRAPH backend and INCREMENTAL
    maintenance: during-update intervals probe the serving per-segment
    graph while the background thread semi-joins deletes out /
    delta-repairs only the touched segments — the engine's answer to the
    reference's graph-update pathologies (FAISS HNSW tombstone-only
    deletes, NGT's minutes-long post-insert stall,
    logs/dynamic_updates_ngt.txt:10-13). post_* recall shows tombstone
    decay then repair recovery."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="graph", update_percents=[50],
        intervals_per_phase=2, exclusive=False,
    )


@register("dynamic_overlap_graph_sq8")
def q_dynamic_overlap_graph_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/exclusive=false on the COMPRESSED (SQ8-segment) layered graph —
    the memory-scaling backend runs the reference's full delete+insert
    experiment too: arrivals are encoded with the serving index's frozen
    codec and the repair kernel ranks in reconstructed-float space, so
    the compressed index no longer sits out the core dynamic story
    (every reference backend inserts: dynamic_script_faiss.py:108,
    dynamic_script_ngt.py:113-115, dynamic_script_redis.py:152)."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="graph_sq8", update_percents=[50],
        intervals_per_phase=2, exclusive=False,
    )


@register("dynamic_overlap_graph2")
def q_dynamic_overlap_graph2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/exclusive=false on the HIERARCHICAL layered graph: incremental
    maintenance with no driver-sized assignment anywhere — deletes
    semi-join; inserts pick their L2 sub-cell via a distributed join
    against the L2 table and repair only touched segments. The dynamic
    story now covers the index whose segment count scales past any
    driver-resident centroid matrix."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="graph2", update_percents=[50],
        intervals_per_phase=2, exclusive=False,
    )


@register("multi_tenant")
def q_multi_tenant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: tenant scaling summary (mean latency/qps, sum-qps throughput,
    mean recall per client count) at the reference's client scale
    (10..50 clients, multi_tenant_script.py:121)."""
    emb, q = _setup(spark, sf_dir)
    m = workloads.multi_tenant(
        spark, emb, q, backend="exact", client_counts=[10, 20, 30, 40, 50]
    )
    return tenant_summary(m)


@register("multi_tenant_graph")
def q_multi_tenant_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 against a served ANN index (the reference's actual setup — N
    clients share one FAISS index, multi_tenant_script.py:121-180): the
    layered graph builds once, then 10/30 concurrent clients probe it
    under the FAIR scheduler; per-client-count mean latency/qps + summed
    throughput, recall column from the shared exact truth."""
    emb, q = _setup(spark, sf_dir)
    m = workloads.multi_tenant(
        spark, emb, q, backend="graph", client_counts=[10, 30]
    )
    return tenant_summary(m)


@register("multi_tenant_graph_sq8")
def q_multi_tenant_graph_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 on the COMPRESSED layered graph: N clients share one
    SQ8-segment index — the memory-per-resident-segment trade is exactly
    what multi-tenant serving stresses (many tenants × resident
    segments), so the compressed backend is the one that scales tenant
    count on fixed executors. 10/30 clients under FAIR scheduling."""
    emb, q = _setup(spark, sf_dir)
    m = workloads.multi_tenant(
        spark, emb, q, backend="graph_sq8", client_counts=[10, 30]
    )
    return tenant_summary(m)


@register("multi_tenant_batched")
def q_multi_tenant_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 with DYNAMIC BATCHING (r14): concurrent tenants' query frames
    that co-arrive within a short window merge into ONE probe of the
    shared layered2 index and the results are split back per tenant —
    the model-serving remedy for the measured 1M saturation (per-probe
    fixed driver work flattens sum-QPS at ~250 while a single big
    batch serves 536; see operators/serving.py). Summary row carries
    n_submits vs n_probe_calls (the merge evidence) next to sum_qps /
    latency / recall. Rows-only (wall-clock by nature); per-tenant
    result rows pinned EQUAL to solo probes and merge accounting
    pinned in tests/test_serving.py."""
    from cs598vectordb_spark.operators.serving import multi_tenant_batched

    emb, _ = _setup(spark, sf_dir)
    return multi_tenant_batched(
        spark, emb, layered_graph2_for(spark, sf_dir),
        n_clients=8, n_queries=50,
        probe_kwargs=dict(nprobe1=2, nprobe2=6, beam=24),
    )


@register("multi_tenant_batched_ivfpq")
def q_multi_tenant_batched_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 dynamic batching over the IVF-PQ FUSED family (r15): the same
    DynamicBatcher (slot arithmetic is family-agnostic) wrapping the
    fused refined probe — the reference's multi-tenant experiment spans
    backends (multi_tenant_script.py:130-136), so the engine's batching
    remedy must too, not just the graph family. Rows-only (wall-clock);
    per-tenant result rows pinned EQUAL to solo fused probes in
    tests/test_serving.py::test_batched_ivfpq_matches_solo."""
    from cs598vectordb_spark.operators.serving import multi_tenant_batched

    emb, _ = _setup(spark, sf_dir)
    return multi_tenant_batched(
        spark, emb, ivfpq_index_for(spark, sf_dir),
        n_clients=8, n_queries=50, family="ivfpq",
        probe_kwargs=dict(nprobe=8, mult=5),
    )


@register("knn_filtered_adaptive")
def q_knn_filtered_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN with ADAPTIVE per-query deepening (r15) — the
    upgrade over the fixed-expansion `knn_graph2_filtered`: that entry
    provisions every query for the worst case (expand 15 ⇒ 150
    candidates each) and can still silently return < k rows when a
    query's filtered neighborhood is sparse; this one starts cheap
    (expand 4) and re-probes ONLY the queries left short of k, with
    expand ×4 / nprobe2 ×2 / beam ×2 per round. At 100 TB the
    difference is the whole cost model: fixed expansion charges the
    p99 query's probe depth to all of them, adaptive charges it to the
    queries that need it. The predicate never materializes a filtered
    base copy — each round is a partition-pruned graph probe plus one
    broadcast join of the driver-sized candidate list against the
    predicate-pushed-down id scan. Rows-only (approximate); recall
    floor vs the exact filtered truth, predicate purity, k-fulfilment
    where matches exist, and the deepening trigger pinned in
    tests/test_index.py::test_knn_filtered_adaptive."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered2_filtered

    emb, q = _setup(spark, sf_dir)
    return knn_graph_layered2_filtered(
        layered_graph2_for(spark, sf_dir), q,
        allowed=emb.filter(F.col("label") == 3),
        k=10, expand=4, max_deepen=2,
        nprobe1=2, nprobe2=6, beam=24,
    )


@register("multi_tenant_batched_sq8")
def q_multi_tenant_batched_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 dynamic batching over the COMPRESSED layered-graph family
    (r15): the SQ8-segment index was the last serving family still
    paying the saturating unbatched path under concurrency (VERDICT
    r14 gap #3) — and it is the family built for high tenant counts,
    since compressed resident segments are what let many tenants share
    fixed executor memory. Same slot arithmetic; the codec lives
    entirely inside the layered kernel. Rows-only (wall-clock);
    per-tenant result rows pinned EQUAL to solo SQ8 probes in
    tests/test_serving.py::test_batched_sq8_matches_solo."""
    from cs598vectordb_spark.operators.serving import multi_tenant_batched

    emb, _ = _setup(spark, sf_dir)
    return multi_tenant_batched(
        spark, emb, layered_graph_sq8_for(spark, sf_dir),
        n_clients=8, n_queries=50, family="graph_sq8",
        probe_kwargs=dict(nprobe=12, beam=32, rounds=4, n_entry=12),
    )


@register("pq_reconstruction")
def q_pq_reconstruction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality dashboard: mean squared reconstruction error + achieved
    compression (the reference's exact config: m=16 subquantizers × 8 bits,
    multi_tenant_script.py:95 — 16× on these 64-dim vectors, 32× on
    SIFT's 128). Deterministic (seeded k-means) but not
    ANSI-expressible → rows-only."""
    from cs598vectordb_spark.operators.pq import pq_decode_error

    emb, _ = _setup(spark, sf_dir)
    cb, _enc = pq_artifacts_for(spark, sf_dir)
    return pq_decode_error(emb, cb)


@register("knn_pq")
def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/PQ: asymmetric-distance top-k over the m-byte encoded table."""
    from cs598vectordb_spark.operators.pq import knn_pq

    _, q = _setup(spark, sf_dir)
    cb, enc = pq_artifacts_for(spark, sf_dir)
    return knn_pq(enc, cb, q, k=_K).select("q_id", "rank", "vec_id")


@register("pq_recall")
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of ADC-PQ search vs exact — the compression/recall
    trade-off the reference plots for IVF-PQ."""
    from cs598vectordb_spark.operators.pq import knn_pq

    emb, q = _setup(spark, sf_dir)
    cb, enc = pq_artifacts_for(spark, sf_dir)
    return recall_at_k(knn_pq(enc, cb, q, _K), knn_exact(emb, q, _K), _K)


@register("knn_pq_refined")
def q_knn_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/PQ+refine: ADC shortlist (5·k) over the compressed table, exact
    re-rank of only the shortlist — recall 0.98 at sf0.1, the reference's
    hnswlib territory, while scans stay 16×-compressed."""
    from cs598vectordb_spark.operators.pq import knn_pq_refined

    emb, q = _setup(spark, sf_dir)
    cb, enc = pq_artifacts_for(spark, sf_dir)
    return knn_pq_refined(enc, cb, emb, q, k=_K).select("q_id", "rank", "vec_id")


@register("pq_refined_recall")
def q_pq_refined_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the refined PQ path vs exact."""
    from cs598vectordb_spark.operators.pq import knn_pq_refined

    emb, q = _setup(spark, sf_dir)
    cb, enc = pq_artifacts_for(spark, sf_dir)
    return recall_at_k(knn_pq_refined(enc, cb, emb, q, _K), knn_exact(emb, q, _K), _K)


@register("knn_graph")
def q_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/graph: batched beam search over the flat kNN graph — the
    engine's analog of the reference's headline HNSW family
    (dynamic_script_faiss.py:53-57), as set-at-a-time DataFrame hops.
    The graph now comes from the spill-partitioned exact builder (graph
    recall ≥0.95, two shuffle stages); the layered index is the probe
    path of record, this flat walk stays as the set-at-a-time variant.
    Deterministic (hash seeds) but graph-structure-dependent → rows-only;
    recall floors live in graph_search_recall and tests."""
    from cs598vectordb_spark.operators.graph import knn_graph_search

    emb, q = _setup(spark, sf_dir)
    g = knn_graph_for(spark, sf_dir)
    return knn_graph_search(g, emb, q, k=_K, beam=20, hops=3).select(
        "q_id", "rank", "vec_id"
    )


@register("knn_graph_layered")
def q_knn_graph_layered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/layered graph: centroid top layer prunes to the nprobe nearest
    segments, each probed segment walks its own kNN subgraph inside ONE
    Arrow kernel (best-first beam, numpy), one window merges. The
    per-segment-graph + cross-segment-merge architecture is how the
    reference's Milvus backend serves HNSW at scale
    (dynamic_script_milvus.py:76-82); vs the flat knn_graph beam it
    replaces ~12 per-hop stages with 2."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered

    _, q = _setup(spark, sf_dir)
    idx = layered_graph_for(spark, sf_dir)
    return knn_graph_layered(idx, q, k=_K, nprobe=12, beam=32, rounds=4, n_entry=12).select(
        "q_id", "rank", "vec_id"
    )


@register("knn_graph_materialized")
def q_knn_graph_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/layered graph served FROM DISK: the persisted segment+adjacency
    table reopened (one repartition at open restores the exchange-free
    walk), probed identically to knn_graph_layered — the
    write_index/read_index lifecycle the reference's FAISS/Milvus
    backends rely on."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered

    _, q = _setup(spark, sf_dir)
    idx = layered_graph_materialized_for(spark, sf_dir)
    return knn_graph_layered(idx, q, k=_K, nprobe=12, beam=32, rounds=4, n_entry=12).select(
        "q_id", "rank", "vec_id"
    )


@register("knn_graph_sq8")
def q_knn_graph_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/compressed layered graph: the same single-kernel beam walk
    over segments holding int8 codes instead of floats — 4x less
    executor memory per resident segment (at 100 TB this decides whether
    a segment's graph+payload fits in RAM at all, the DiskANN trade);
    distances come from on-the-fly reconstruction."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered

    _, q = _setup(spark, sf_dir)
    idx = layered_graph_sq8_for(spark, sf_dir)
    return knn_graph_layered(idx, q, k=_K, nprobe=12, beam=32, rounds=4, n_entry=12).select(
        "q_id", "rank", "vec_id"
    )


@register("knn_graph_layered2")
def q_knn_graph_layered2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/hierarchical layered graph: the layered walk behind ivf2's
    two-level pruner. L1 is the only driver-resident centroid matrix;
    the probed cells' L2 rows come off the distributed L2 table as a
    bounded collect (nprobe1·nlist2 rows), so segment count — and with
    it base size — scales past any driver-sized top layer. Same
    exchange-free walk kernel + single-window merge as
    knn_graph_layered."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered2

    _, q = _setup(spark, sf_dir)
    idx = layered_graph2_for(spark, sf_dir)
    return knn_graph_layered2(
        idx, q, k=_K, nprobe1=4, nprobe2=12, beam=32, rounds=4, n_entry=12
    ).select("q_id", "rank", "vec_id")


@register("graph_layered_recall")
def q_graph_layered_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the layered-graph probe vs exact (≥0.9 pinned in
    tests/test_index.py)."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered

    emb, q = _setup(spark, sf_dir)
    idx = layered_graph_for(spark, sf_dir)
    return recall_at_k(
        knn_graph_layered(idx, q, _K, nprobe=12, beam=32, rounds=4, n_entry=12),
        knn_exact(emb, q, _K),
        _K,
    )


@register("graph_quality")
def q_graph_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-quality metric: fraction of true kNN edges present in the
    built graph (over the query sample's exact neighborhoods)."""
    from cs598vectordb_spark.operators.graph import graph_quality

    emb, q = _setup(spark, sf_dir)
    g = knn_graph_for(spark, sf_dir)
    return graph_quality(g, knn_exact(emb, q, _K))


@register("graph_search_recall")
def q_graph_search_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of graph beam search vs exact."""
    from cs598vectordb_spark.operators.graph import knn_graph_search

    emb, q = _setup(spark, sf_dir)
    g = knn_graph_for(spark, sf_dir)
    return recall_at_k(
        knn_graph_search(g, emb, q, _K, beam=20, hops=3), knn_exact(emb, q, _K), _K
    )


@register("knn_ivf_sq8")
def q_knn_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/IVF+SQ8: compressed inverted lists — probe reads nprobe/nlist
    of the partitions AND 1 byte/dim of the codes; reconstruction +
    masked GEMM in one joinless kernel (FAISS IndexIVFScalarQuantizer's
    layout as parquet partitioning)."""
    from cs598vectordb_spark.operators.sq import knn_ivf_sq

    _, q = _setup(spark, sf_dir)
    idx = ivf_sq_index_for(spark, sf_dir, nlist=16)
    return knn_ivf_sq(idx, q, k=_K, nprobe=8).select("q_id", "rank", "vec_id")


@register("ivf_sq8_recall")
def q_ivf_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the doubly-quantized probe vs exact — the composed
    loss of list pruning (IVF) and 8-bit codes (SQ)."""
    from cs598vectordb_spark.operators.sq import knn_ivf_sq

    emb, q = _setup(spark, sf_dir)
    idx = ivf_sq_index_for(spark, sf_dir, nlist=16)
    return recall_at_k(knn_ivf_sq(idx, q, _K, nprobe=8), knn_exact(emb, q, _K), _K)


@register("knn_sq8")
def q_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/SQ8: top-k over the int8-quantized table — the kernel
    reconstructs per batch and reuses knn_exact's GEMM/local-top-k shape.
    Quantized distances → rows-only here; recall is graded by sq8_recall
    and the codes/error by the sq8_encode/sq8_error oracles."""
    from cs598vectordb_spark.operators.sq import knn_sq

    _, q = _setup(spark, sf_dir)
    codec, enc = sq_artifacts_for(spark, sf_dir)
    return knn_sq(enc, codec, q, k=_K).select("q_id", "rank", "vec_id")


@register("sq8_recall")
def q_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of SQ8 search vs exact — 8-bit quantization barely moves
    neighbor ranks, so this floors far above the 0.70 bar."""
    from cs598vectordb_spark.operators.sq import knn_sq

    emb, q = _setup(spark, sf_dir)
    codec, enc = sq_artifacts_for(spark, sf_dir)
    return recall_at_k(knn_sq(enc, codec, q, _K), knn_exact(emb, q, _K), _K)


@register("knn_lsh_multiprobe")
def q_knn_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/Q2 multi-probe variant (Lv et al., VLDB'07): half the hash
    tables (T=8) probing ±1-perturbed neighbor buckets — recall ~0.90 at
    the T=16 single-probe candidate budget, with half the index storage."""
    emb, q = _setup(spark, sf_dir)
    idx = lsh_index_for(spark, sf_dir, num_tables=8)
    return knn_lsh(idx, emb, q, k=_K, n_probes=3).select("q_id", "rank", "vec_id")


@register("knn_ivf2")
def q_knn_ivf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/two-level IVF (centroid-of-centroids): only the nlist1 coarse
    layer is driver-resident; sub-centroids live in a distributed table
    and probes pull just the probed cells' rows — the nlist-scaling path
    for bases where sqrt(N) lists would swamp the driver (the reference
    trains its coarse quantizer on a bounded sample for the same reason,
    multi_tenant_script.py:94-99). Probe = nprobe2 sub-lists of
    nlist1*nlist2, pruned as parquet PartitionFilters."""
    from cs598vectordb_spark.operators.ivf2 import knn_ivf2

    _, q = _setup(spark, sf_dir)
    idx = ivf2_index_for(spark, sf_dir)
    return knn_ivf2(idx, q, k=_K, nprobe1=4, nprobe2=12).select(
        "q_id", "rank", "vec_id"
    )


@register("ivf2_recall")
def q_ivf2_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the hierarchical probe vs exact."""
    from cs598vectordb_spark.operators.ivf2 import knn_ivf2

    emb, q = _setup(spark, sf_dir)
    idx = ivf2_index_for(spark, sf_dir)
    return recall_at_k(
        knn_ivf2(idx, q, _K, nprobe1=4, nprobe2=12), knn_exact(emb, q, _K), _K
    )


@register("ivf2_autotune")
def q_ivf2_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/hierarchical IVF: (nprobe1, nprobe2) sweep trace; the chosen
    config is the cheapest clearing 0.9 recall."""
    from cs598vectordb_spark.operators.ivf2 import autotune_ivf2

    emb, q_full = _setup(spark, sf_dir)
    q = q_full.limit(20)
    truth = knn_exact(emb, q, _K)
    _, trace = autotune_ivf2(ivf2_index_for(spark, sf_dir), q, truth, target_recall=0.9, k=_K)
    return spark.createDataFrame(
        [(t["nprobe1"], t["nprobe2"], t["recall"], t["selectivity"]) for t in trace],
        "nprobe1 int, nprobe2 int, recall double, selectivity double",
    )


def graph2_materialized_for(
    spark: SparkSession,
    sf_dir: str,
    pinned: bool = True,
    nlist1: int = 4,
    nlist2: int = 4,
):
    """The on-disk layered2 index (segments partitioned by segment_id
    under /tmp, distributed L2 table, driver-sized L1 sidecar), built
    once per (session, sf_dir, segmentation) — shared by the registered
    query below and bench.py's probe-side scan-fraction measurement.

    pinned=False opens the artifacts in cold-serving mode (no cache,
    no repartition — probes partition-prune the parquet scan) — the
    larger-than-memory index regime; see operators.graph.open_layered2.
    `pinned` is part of the warm key AND threads through the build, so
    requesting only the cold mode never shuffles/persists a full
    cached copy it is not going to use (review finding r11); it is
    ALSO part of the on-disk path (ADVICE r11): requesting both
    serving modes at the same segmentation must not rebuild into the
    directory the other mode's already-open index is still reading
    part files from. The bench measurement passes a FINER segmentation
    (8×8) than the registered query's 4×4: with 16 segments a 5-query
    probed union covers every partition and pruning has nothing to
    skip — the same batch-size caveat the IVF scan measurements
    document."""
    import os as _os

    from cs598vectordb_spark.operators.graph import materialize_layered2

    path = _os.path.join(
        "/tmp/cs598_spark_io",
        _os.path.basename(sf_dir.rstrip("/")),
        f"graph2_mat_{nlist1}x{nlist2}_{'pinned' if pinned else 'cold'}",
    )

    def build():
        idx = layered_graph2_for(spark, sf_dir, nlist1=nlist1, nlist2=nlist2)
        return materialize_layered2(idx, path, pinned=pinned)

    return _warm(
        spark, ("layered_graph2_mat", sf_dir, nlist1, nlist2, pinned), build
    )


@register("knn_graph2_materialized")
def q_knn_graph2_materialized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index of record served FROM DISK: layered2 persisted
    (segments partitioned by segment_id, distributed L2 table,
    driver-sized L1 sidecar) and reopened; probes identical to the
    fresh index — round-trip exactness pinned in tests/test_index.py.
    Deterministic but graph-structure-dependent → rows-only."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered2

    _, q = _setup(spark, sf_dir)
    opened = graph2_materialized_for(spark, sf_dir)
    return knn_graph_layered2(opened, q, _K, nprobe1=4, nprobe2=12, beam=32).select(
        "q_id", "rank", "vec_id"
    )


def graph2_served_for(spark: SparkSession, sf_dir: str):
    """The materialized layered2 index opened in WORKER-SERVED mode,
    built once per (session, sf_dir) — shared by the batch and
    streaming served queries."""
    import os as _os

    from cs598vectordb_spark.operators.graph import open_layered2

    def build():
        graph2_materialized_for(spark, sf_dir)  # ensure artifacts exist
        path = _os.path.join(
            "/tmp/cs598_spark_io",
            _os.path.basename(sf_dir.rstrip("/")),
            "graph2_mat_4x4_pinned",
        )
        return open_layered2(spark, path, served=True)

    return _warm(spark, ("layered_graph2_served", sf_dir, 4, 4), build)


@register("knn_graph2_served")
def q_knn_graph2_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index of record in WORKER-SERVED mode (r13): the probe plan
    ships only the probed (segment_id) list + the query broadcast, and
    reused Python workers pyarrow-read and LRU-cache their segments'
    decoded arrays straight from the materialized index path — zero
    per-batch payload transfer at steady state (the Spark-native
    analog of hnswlib's resident graph, /root/reference/
    dynamic_script_faiss.py:53-57). Results are bit-identical to the
    pinned probe (pinned in tests/test_index.py::
    test_graph2_served_matches_pinned) → rows-only by the same
    graph-structure-dependence as knn_graph2_materialized."""
    from cs598vectordb_spark.operators.graph import knn_graph_layered2

    _, q = _setup(spark, sf_dir)
    opened = graph2_served_for(spark, sf_dir)
    return knn_graph_layered2(opened, q, _K, nprobe1=4, nprobe2=12, beam=32).select(
        "q_id", "rank", "vec_id"
    )


@register("knn_graph_sq8_served")
def q_knn_graph_sq8_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Worker-served probe over the COMPRESSED (SQ8) layered index:
    workers pyarrow-read and LRU-cache the int8 CODES — the
    compressed-graph 4× memory trade carries into the serving cache —
    and reconstruct per walk. Bit-identical to the pinned SQ8 probe
    (tests/test_index.py::test_graph_sq8_served_matches_pinned) →
    rows-only like the rest of the graph family."""
    import os as _os

    from cs598vectordb_spark.operators.graph import (
        knn_graph_layered,
        materialize_layered,
        open_layered,
    )

    def build():
        path = _os.path.join(
            "/tmp/cs598_spark_io",
            _os.path.basename(sf_dir.rstrip("/")),
            "graph_sq8_mat_16",
        )
        pinned = materialize_layered(
            layered_graph_sq8_for(spark, sf_dir), path
        )
        pinned.segments.unpersist()  # serving mode reads the files
        return open_layered(spark, path, served=True)

    _, q = _setup(spark, sf_dir)
    opened = _warm(spark, ("layered_graph_sq8_served", sf_dir), build)
    return knn_graph_layered(opened, q, _K, nprobe=6, beam=32).select(
        "q_id", "rank", "vec_id"
    )


@register("knn_graph2_filtered")
def q_knn_graph2_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN on the hierarchical index — the post-filter-with-
    expansion strategy filtered-HNSW engines use when the predicate is
    too broad to pre-filter (pre-filtering the base would invalidate the
    prebuilt graph's edge structure): probe for k·expansion candidates
    (labels are ~10% selective, expansion 15 ⇒ ~15 expected survivors
    for k=10), join the predicate, re-rank, keep top-k. Every result
    satisfies the predicate by construction; recall vs the exact
    filtered oracle is floored in tests/test_index.py. For NEEDLE
    predicates the right plan flips to the pushdown-filtered exact
    kernel (knn_filtered) — the engine serves both regimes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cs598vectordb_spark.operators.graph import knn_graph_layered2

    emb, q = _setup(spark, sf_dir)
    idx = layered_graph2_for(spark, sf_dir)
    cand = knn_graph_layered2(idx, q, k=15 * _K, nprobe1=4, nprobe2=12, beam=32)
    labeled = cand.join(emb.select("vec_id", "label"), "vec_id").filter(
        F.col("label") == 3
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("vec_id").asc())
    return (
        labeled.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _K)
        .select("q_id", "rank", "vec_id")
    )


@register("graph2_autotune")
def q_graph2_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 for the index of record: (nprobe1, nprobe2, beam) sweep on the
    layered2 graph; the chosen config is the cheapest (selectivity, then
    beam) clearing 0.9 recall — MRPT's build_autotune_sample(0.9, 10)
    re-expressed for the hierarchical graph
    (/root/reference/dynamic_script_mrpt.py:44-47). Deterministic on a
    fixed index → rows-only; the recall floor is pinned in
    tests/test_index.py."""
    from cs598vectordb_spark.operators.graph import autotune_layered2

    emb, q_full = _setup(spark, sf_dir)
    q = q_full.limit(20)
    truth = knn_exact(emb, q, _K)
    _, trace = autotune_layered2(
        layered_graph2_for(spark, sf_dir), q, truth, target_recall=0.9, k=_K
    )
    return spark.createDataFrame(
        [
            (t["nprobe1"], t["nprobe2"], t["beam"], t["recall"], t["selectivity"])
            for t in trace
        ],
        "nprobe1 int, nprobe2 int, beam int, recall double, selectivity double",
    )


@register("knn_ivf_mllib")
def q_knn_ivf_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 with MLlib-trained centroids: distributed KMeans over the full
    base (the no-sample path for 100 TB bases), same probe plan."""
    _, q = _setup(spark, sf_dir)
    idx = ivf_index_for(spark, sf_dir, nlist=16, mllib=True)
    return knn_ivf(idx, q, k=_K, nprobe=8).select("q_id", "rank", "vec_id")


@register("ivf_autotune")
def q_ivf_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/IVF: nprobe sweep trace — recall vs fraction of lists touched;
    the chosen config is the cheapest clearing 0.9 (MRPT's target)."""
    from cs598vectordb_spark.operators.index import autotune_ivf

    emb, q_full = _setup(spark, sf_dir)
    q = q_full.limit(20)
    truth = knn_exact(emb, q, _K)
    _, trace = autotune_ivf(emb, q, truth, target_recall=0.9, k=_K)
    return spark.createDataFrame(
        [(t["nlist"], t["nprobe"], t["recall"], t["selectivity"]) for t in trace],
        "nlist int, nprobe int, recall double, selectivity double",
    )


@register("stream_knn_graph2")
def q_stream_knn_graph2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-backed streaming kNN serving: query micro-batches probed
    against the warm hierarchical graph index inside foreachBatch — the
    online-serving architecture (one served index, arriving queries)
    with the engine's index of record instead of the exact kernel.
    Graph-structure-dependent → rows-only; drained-union recall vs exact
    is floored in tests/test_streaming.py."""
    import os as _os

    from cs598vectordb_spark.operators.graph import knn_graph_layered2
    from cs598vectordb_spark.queries_sources import _io_dir
    from cs598vectordb_spark.streaming.jobs import stream_knn

    idx = layered_graph2_for(spark, sf_dir)

    def probe(batch_df: DataFrame) -> DataFrame:
        return knn_graph_layered2(
            idx, batch_df, k=_K, nprobe1=4, nprobe2=12, beam=32
        ).select("q_id", "rank", "vec_id")

    work = _os.path.join(_io_dir(sf_dir, "stream_knn_graph2"), "run")
    return stream_knn(spark, sf_dir, work, n_splits=3, k=_K, probe=probe)


@register("stream_knn_graph2_served")
def q_stream_knn_graph2_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online serving over the WORKER-SERVED index — the steady-state
    regime serving mode exists for: query micro-batches arrive and
    probe an index whose decoded segment payloads persist in the
    REUSED worker processes across micro-batches, so every batch after
    the first ships zero index payload (hnswlib's resident-graph loop,
    dynamic_script_faiss.py:31-43, re-expressed with a bounded worker
    cache instead of mandatory full residency). Per-query independence
    makes the drained union equal the batch served probe row for row —
    pinned in tests/test_streaming.py::
    test_stream_knn_graph2_served_matches_batch → rows-only."""
    import os as _os

    from cs598vectordb_spark.operators.graph import knn_graph_layered2
    from cs598vectordb_spark.queries_sources import _io_dir
    from cs598vectordb_spark.streaming.jobs import stream_knn

    idx = graph2_served_for(spark, sf_dir)

    def probe(batch_df: DataFrame) -> DataFrame:
        return knn_graph_layered2(
            idx, batch_df, k=_K, nprobe1=4, nprobe2=12, beam=32
        ).select("q_id", "rank", "vec_id")

    work = _os.path.join(_io_dir(sf_dir, "stream_knn_graph2_served"), "run")
    return stream_knn(spark, sf_dir, work, n_splits=3, k=_K, probe=probe)


@register("multi_tenant_stream_graph2")
def q_multi_tenant_stream_graph2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 over the streaming-served hierarchical index: N concurrent
    tenants each drain an ordered query stream probed in foreachBatch
    against the ONE shared warm layered2 index — the multi-tenant
    experiment (multi_tenant_script.py:121-180) composed with the
    online-serving loop (dynamic_script_faiss.py:31-43). Per-client-count
    mean latency/qps + summed throughput; wall-clock by nature →
    rows-only (per-client sum-QPS also lands in bench detail)."""
    import os as _os

    from cs598vectordb_spark.operators.graph import knn_graph_layered2
    from cs598vectordb_spark.queries_sources import _io_dir

    idx = layered_graph2_for(spark, sf_dir)

    def probe(batch_df: DataFrame) -> DataFrame:
        return knn_graph_layered2(
            idx, batch_df, k=_K, nprobe1=4, nprobe2=12, beam=32
        ).select("q_id", "rank", "vec_id")

    m = workloads.multi_tenant_stream(
        spark,
        sf_dir,
        probe,
        _os.path.join(_io_dir(sf_dir, "mt_stream_graph2"), "run"),
        client_counts=[4, 8],
    )
    return tenant_summary(m)


def ivfpq_index_for(
    spark: SparkSession, sf_dir: str, nlist: int = 16, m: int = 16, ksub: int = 256
):
    import os as _os

    from cs598vectordb_spark.operators.ivfpq import build_ivfpq
    from cs598vectordb_spark.queries_sources import _io_dir

    def build():
        # keep_vectors: the refined probe re-ranks map-side from the
        # same list-partitioned rows (operators/ivfpq.py fused path);
        # the codes-only ADC probe is unaffected — parquet column
        # pruning skips the vector column it doesn't select.
        return build_ivfpq(
            load_table(spark, sf_dir, "embeddings"),
            nlist=nlist,
            m=m,
            ksub=ksub,
            path=_os.path.join(_io_dir(sf_dir, "ivfpq_index"), "t"),
            keep_vectors=True,
        )

    return _warm(spark, ("ivfpq", sf_dir, nlist, m, ksub), build)


@register("knn_ivfpq")
def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/IVF-PQ: product-quantized residuals inside centroid-partitioned
    inverted lists with per-list ADC LUTs — the composite the native
    engines default to at scale (FAISS IndexIVFPQ; Milvus IVF_PQ,
    multi_tenant_script.py:94-99). The encoded table is materialized
    PARTITIONED BY centroid_id so probes prune partitions (16 one-byte
    codes/row instead of 64 floats = 16× less scanned per pruned list).
    Quantized top-k is codebook-dependent → rows-only; recall floor
    pinned in tests/test_pq.py."""
    from cs598vectordb_spark.operators.ivfpq import knn_ivfpq

    _, q = _setup(spark, sf_dir)
    idx = ivfpq_index_for(spark, sf_dir)
    return knn_ivfpq(idx, q, k=_K, nprobe=8).select("q_id", "rank", "vec_id")


@register("knn_ivfpq_refined")
def q_knn_ivfpq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ shortlist + exact re-rank (FAISS's IVFPQR shape), FUSED
    r12: the index stores vectors beside their codes (keep_vectors),
    so the probe kernel ADC-selects the per-(query,list) top mult·k
    and re-ranks them exactly in place — one pruned scan, one kernel,
    one top-k window, no full-base join (the r11 join form lost to
    exact brute force 8× at 100K on exactly that join's fixed cost;
    plan pinned in tests/test_plans.py::
    test_ivfpq_fused_refine_plan_single_exchange, crossover vs exact
    recorded at 1M in bench detail large_base_1m)."""
    from cs598vectordb_spark.operators.ivfpq import knn_ivfpq_refined

    emb, q = _setup(spark, sf_dir)
    idx = ivfpq_index_for(spark, sf_dir)
    return knn_ivfpq_refined(idx, emb, q, k=_K, nprobe=8).select(
        "q_id", "rank", "vec_id"
    )


@register("dynamic_ivfpq")
def q_dynamic_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 on the IVF-PQ index with INCREMENTAL maintenance: deletes are
    one semi-join over the code lists, inserts are encoded with the
    frozen centroids/codebooks and appended to their lists — cost
    O(|delta|), never a retrain (FAISS remove_ids/add discipline). The
    exclusive settled-snapshot protocol at 50%; rows-only (codebook-
    dependent); recall recovery pinned in tests/test_updates_metrics.py."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="ivfpq", update_percents=[50], exclusive=True,
        run_id="dyn_ivfpq",
    )


@register("ivfpq_autotune")
def q_ivfpq_autotune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4/IVF-PQ: nprobe sweep for the quantized probe, raw and exact-
    re-ranked — recall vs fraction of lists scanned. The chosen serving
    config is the cheapest refined point clearing the reference's 0.9
    target where one exists (MRPT build_autotune_sample(0.9, 10),
    dynamic_script_mrpt.py:46); the trace records the full frontier so
    the codec's recall ceiling is measured, not asserted."""
    from cs598vectordb_spark.operators.ivfpq import knn_ivfpq, knn_ivfpq_refined
    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.operators.metrics import recall_at_k

    emb, q_full = _setup(spark, sf_dir)
    q = q_full.limit(20)
    truth = knn_exact(emb, q, _K)
    idx = ivfpq_index_for(spark, sf_dir)
    rows = []
    for nprobe in (2, 4, 8, 16):
        raw = knn_ivfpq(idx, q, k=_K, nprobe=nprobe)
        refined = knn_ivfpq_refined(idx, emb, q, k=_K, nprobe=nprobe)
        rows.append(
            (
                nprobe,
                round(nprobe / idx.nlist, 4),
                recall_at_k(raw, truth, _K).collect()[0][0],
                recall_at_k(refined, truth, _K).collect()[0][0],
            )
        )
    return spark.createDataFrame(
        rows, "nprobe int, selectivity double, raw_recall double, refined_recall double"
    )


@register("dynamic_overlap_ivfpq")
def q_dynamic_overlap_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/exclusive=false on IVF-PQ: the search loop keeps probing the
    serving code table while the background thread applies the semi-join
    delete / frozen-codec encode-and-append insert — the reference's
    -52%-QPS-during-rebuild measurement (BASELINE.md FAISS row) on the
    quantized index, where the background work is O(delta) maintenance
    rather than a retrain."""
    emb, q = _setup(spark, sf_dir)
    return workloads.dynamic_protocol(
        spark, emb, q, backend="ivfpq", update_percents=[50],
        intervals_per_phase=2, exclusive=False, run_id="overlap_ivfpq",
    )
