"""Scaling direction of the exact->approximate crossover: 4M x 128
(4x the SIFT1M shape). Exact brute force is O(N) per batch; the
worker-served graph probe touches a ~constant probed fraction, so the
crossover should WIDEN with N.

r13 recorded run (quiet start, load 1.7): base gen 17.6 s, graph2
32x32 build 190.1 s; exact 16.51 s = 60.6 QPS (vs 4.1 s at 1M - the
O(N) prediction holds within noise); graph2_served 5.06 s = 197.5 QPS
@ recall 0.916 (cold cache-fill pass 6.70 s under the default 512 MB
per-worker cap, i.e. the index no longer fits one worker's cache and
the LRU-churn regime still wins). Crossover ratio: 1.7x at 1M ->
3.3x at 4M (and 3.9x at the best swept config: nprobe1=8 nprobe2=12
beam=32 -> 4.18 s = 239 QPS @ recall 0.916). A follow-up sweep showed
the 4M recall ceiling (~0.92) is the 32x32 COARSE LAYER's granularity
at 4x the rows, not the walk: widening to nprobe2=16/beam=48 buys
only +0.008 recall for -33% QPS, so the right knob at bigger N is
more segments (64x64), i.e. a rebuild - the same nlist-scaling rule
IVF follows. Not part of bench.py: the one-time 4M build would bill
~200 s to every fresh-machine bench run for a point whose direction
this recorded experiment already pins; re-run manually when the probe
architecture changes. Results land in /tmp/xl4m.json."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from cs598vectordb_spark.operators.graph import (
    build_layered_graph2,
    knn_graph_layered2,
    materialize_layered2,
    open_layered2,
)
from cs598vectordb_spark.operators.knn import knn_exact
from cs598vectordb_spark.operators.metrics import recall_at_k
from cs598vectordb_spark.session import get_spark

spark = get_spark("xl4m")
out = {"load_start": [round(x, 2) for x in os.getloadavg()]}

t0 = time.time()
lb = spark.read.parquet(bench._large_base(spark, n=4_000_000, dim=128, centers=2048))
out["base_gen_s"] = round(time.time() - t0, 1)

g2_path = "/tmp/cs598_spark_io/large_base_4m/graph2"
if os.path.exists(os.path.join(g2_path, "l1")):
    srv = open_layered2(spark, g2_path, served=True)
else:
    t0 = time.time()
    idx = build_layered_graph2(lb, nlist1=32, nlist2=32, degree=16)
    materialize_layered2(idx, g2_path, pinned=False)
    out["graph2_build_s"] = round(time.time() - t0, 1)
    srv = open_layered2(spark, g2_path, served=True)

lbq = lb.filter(F.col("vec_id") < 1000).select(
    F.col("vec_id").alias("q_id"), "embedding"
)
ex = knn_exact(lb, lbq, 10).persist()
ex.count()
out["exact_s"] = round(bench._med3(lambda: knn_exact(lb, lbq, 10).count()), 3)

kw = dict(k=10, nprobe1=6, nprobe2=10, beam=32, rounds=4, n_entry=12)
t0 = time.time()
knn_graph_layered2(srv, lbq, **kw).count()  # cold (cache fill)
out["served_cold_s"] = round(time.time() - t0, 3)
out["served_s"] = round(
    bench._med3(lambda: knn_graph_layered2(srv, lbq, **kw).count()), 3
)
out["served_recall"] = recall_at_k(
    knn_graph_layered2(srv, lbq, **kw), ex, 10
).collect()[0]["recall"]
out["exact_qps"] = round(1000 / out["exact_s"], 1)
out["served_qps"] = round(1000 / out["served_s"], 1)
out["load_end"] = [round(x, 2) for x in os.getloadavg()]
with open("/tmp/xl4m.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
