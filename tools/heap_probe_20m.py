"""Driver-heap bound for the 20M exact point (r15, VERDICT r14 item 7).

The r14 20M record ran under SPARK_DRIVER_MEM=48g without bisecting
what actually held heap. Candidates: (a) the exact kernel's JVM-side
scan+Arrow buffers (32 concurrent tasks x parquet column readers +
Arrow serialization), (b) driver result assembly (tiny by design:
|partitions|*|Q|*k rows), (c) the graph2 BUILD at 20M (k-means +
per-segment graphs) that shared the same xl_scaling process.

This probe isolates (a)+(b): a fresh process runs ONLY the exact
kernel at 20M under whatever SPARK_DRIVER_MEM the caller sets
(default: the engine's 16g default). Success at 16g means the 48g
note belonged to the BUILD phase, and the exact point's heap bound is
the session default — documented in SCALING.md SS6. The partition
rule itself is unit-tested (tests/test_bench_format.py).

Usage: SPARK_DRIVER_MEM=16g python tools/heap_probe_20m.py
Writes /tmp/heap_probe_20m.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pyspark.sql import functions as F

from cs598vectordb_spark.operators.knn import knn_exact
from cs598vectordb_spark.session import get_spark

N = int(os.environ.get("CS598_XL_N", "20000000"))
heap = os.environ.get("SPARK_DRIVER_MEM", "16g")
spark = get_spark(f"heap{N // 1_000_000}m")
out = {
    "n": N,
    "driver_mem": heap,
    "load_start": [round(x, 2) for x in os.getloadavg()],
}

centers = max(256, N // 2000)
lb = spark.read.parquet(bench._large_base(spark, n=N, dim=128, centers=centers))
lbq = lb.filter(F.col("vec_id") < 1000).select(
    F.col("vec_id").alias("q_id"), "embedding"
)
try:
    knn_exact(lb, lbq, 10).count()  # warm (absorbs broadcast + codegen)
    t0 = time.time()
    n_rows = knn_exact(lb, lbq, 10).count()
    out["exact_s"] = round(time.time() - t0, 2)
    out["exact_qps"] = round(1000 / out["exact_s"], 1)
    out["rows"] = n_rows
    out["ok"] = True
except Exception as exc:  # record the failure mode, don't swallow it
    out["ok"] = False
    out["error"] = f"{type(exc).__name__}: {str(exc)[:400]}"

out["load_end"] = [round(x, 2) for x in os.getloadavg()]
with open(f"/tmp/heap_probe_{N // 1_000_000}m.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
raise SystemExit(0 if out["ok"] else 1)
