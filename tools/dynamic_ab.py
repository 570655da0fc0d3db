"""Interleaved A/B adjudication of the 1M post-update probe walls.

bench.py's dynamic block measures pre / during / post / post_compacted
sequentially, each as a med-of-3 — but this host's load swings absolute
walls ~2× between blocks minutes apart (r13 verdict; observed again
r14: `during` measured 0.86× pre in one run and 1.53× pre in the next,
on identical code). Sequential medians cannot separate a ~15% layout
effect from that drift, so this tool probes the FOUR index states in
interleaved rotation (A/B/C/D × rounds) against the round's cached 1M
artifacts and reports per-state medians from samples that share every
load excursion. Run after bench.py (reuses /tmp artifacts + the delta
generation bench left behind, rebuilding the update states cheaply).

Usage: python tools/dynamic_ab.py [rounds]  ->  /tmp/dyn_ab.json
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from cs598vectordb_spark.operators.ivfpq import (
    compact_ivfpq,
    delete_from_ivfpq,
    insert_into_ivfpq,
    knn_ivfpq_refined,
)
from cs598vectordb_spark.session import get_spark

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 5

spark = get_spark("dyn-ab")
out = {"rounds": ROUNDS, "load_start": [round(x, 2) for x in os.getloadavg()]}

lb1m_root = "/tmp/cs598_spark_io/large_base_1m"
lb1m = spark.read.parquet(
    bench._large_base(spark, n=1_000_000, dim=128, centers=1024)
)
meta: dict = {}
idx = bench._cached_ivfpq(
    spark, lb1m, os.path.join(lb1m_root, "ivfpq_k256"),
    nlist=1024, m=16, ksub=256, train_sample=50_000, meta=meta,
)
lbq = lb1m.filter(F.col("vec_id") < 1000).select(
    F.col("vec_id").alias("q_id"), "embedding"
)

keep = lb1m.filter(F.pmod(F.col("vec_id"), F.lit(4)) != 0)
dropped = lb1m.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 0)
del_ids_path = os.path.join(lb1m_root, "deleted_ids")
if not os.path.exists(del_ids_path):
    dropped.select("vec_id").repartition(4).write.parquet(del_ids_path)
idx_del = delete_from_ivfpq(idx, keep, deleted=spark.read.parquet(del_ids_path))
# reuse the newest delta generation if bench already wrote one this
# round; otherwise encode+land a fresh one (numeric order — a
# lexicographic sort misorders __delta10 vs __delta9, ADVICE r14)
from cs598vectordb_spark.operators.ivfpq import delta_generations

deltas = delta_generations(idx.path)
if deltas:
    cols = [c for c in idx.codes.columns]
    codes = idx_del.codes.select(*cols).unionByName(
        spark.read.parquet(deltas[-1]).select(*cols)
    )
    from cs598vectordb_spark.operators.ivfpq import IvfPqIndex

    idx_ins = IvfPqIndex(codes, idx.centroids, idx.cb, idx.nlist, idx.path)
else:
    idx_ins = insert_into_ivfpq(idx_del, dropped)
comp_path = os.path.join(lb1m_root, "ivfpq_compacted")
if os.path.exists(comp_path):
    from cs598vectordb_spark.operators.ivfpq import IvfPqIndex

    idx_comp = IvfPqIndex(
        spark.read.parquet(comp_path), idx.centroids, idx.cb, idx.nlist,
        comp_path,
    )
else:
    idx_comp = compact_ivfpq(idx_ins, comp_path)

def _ipq(ix):
    return lambda: knn_ivfpq_refined(
        ix, lb1m, lbq, k=10, nprobe=8, mult=10
    ).count()


STATES = {
    "pre": _ipq(idx),
    "during_tombstone": _ipq(idx_del),
    "post_delta": _ipq(idx_ins),
    "post_compacted": _ipq(idx_comp),
}

# the HEADLINE index's own pre/post question, same interleave: the
# pristine served graph vs whatever settled state bench's dynamic_graph2
# block left at graph2_dyn (post-insert rebuild after a bench run) —
# sequential bench rows read post anywhere from 0.78× to 1.17× of pre
# across r14 runs, which is exactly the drift class this tool exists for
from cs598vectordb_spark.operators.graph import (  # noqa: E402
    knn_graph_layered2,
    open_layered2,
)

g2_pre_path = os.path.join(lb1m_root, "graph2")
g2_dyn_path = os.path.join(lb1m_root, "graph2_dyn")
if os.path.exists(os.path.join(g2_pre_path, "l1")) and os.path.exists(
    os.path.join(g2_dyn_path, "l1")
):
    g2_pre = open_layered2(spark, g2_pre_path, served=True)
    g2_post = open_layered2(spark, g2_dyn_path, served=True)

    def _g2(ix):
        return lambda: knn_graph_layered2(
            ix, lbq, 10, nprobe1=6, nprobe2=10, beam=32, rounds=4, n_entry=12
        ).count()

    STATES["g2_pre_served"] = _g2(g2_pre)
    STATES["g2_post_served"] = _g2(g2_post)

for name, thunk in STATES.items():  # one warm pass each before any timing
    thunk()

samples: dict[str, list[float]] = {n: [] for n in STATES}
for r in range(ROUNDS):
    for name, thunk in STATES.items():
        t0 = time.time()
        thunk()
        samples[name].append(round(max(time.time() - t0, 1e-9), 3))

out["samples"] = samples
out["median_s"] = {n: round(statistics.median(v), 3) for n, v in samples.items()}
pre = out["median_s"]["pre"]
out["ratio_over_pre"] = {
    n: round(v / pre, 3)
    for n, v in out["median_s"].items()
    if not n.startswith("g2_")
}
if "g2_pre_served" in out["median_s"]:
    out["g2_post_over_pre"] = round(
        out["median_s"]["g2_post_served"] / out["median_s"]["g2_pre_served"], 3
    )
out["load_end"] = [round(x, 2) for x in os.getloadavg()]
with open("/tmp/dyn_ab.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
