"""A/B the _kmeans_fit large-k fast path against the sequential
k-means++ path at the XL join's exact training shape (n=100k sample,
k=10,000 cells, d=128, iters=20 — the build SCALING §7 pinned as the
10M×10M point's dominant term: 3,492 s total, driver-side seeding the
named bottleneck). Data is the clustered mixture regime the XL base
generator plants (5,000 seeded centers — blocking's home turf).

The first full head-to-head attempt hit its 1-hour harness timeout
INSIDE the ++ path (a hard ≥3,600 s lower bound at this shape, noted
in the record), so the ++ leg is timed by phase: the complete
sequential seeding plus PP_ITERS Lloyd iterations of the
full-distance-block form, extrapolated to the build's 20 (stated as
such — `pp_wall_s_extrapolated`). Quality parity of the two paths at
equal iteration count is pinned separately by
tests/test_index.py::test_kmeans_large_k_fast_path; here the fast
path's 20-iteration result records the blocking stats that matter for
the cogrouped join (SSE, cell balance p99/mean). Results are written
incrementally so a timeout still leaves evidence. Writes
/tmp/kmeans_ab_10k.json; the quiet-start result is committed as
kmeans_ab_10k_r18.json.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cs598vectordb_spark.operators.index import _kmeans_fit_large_k
import bench

N, D, K, ITERS, CENTERS = 100_000, 128, 10_000, 20, 5_000
PP_ITERS = 2
OUT = "/tmp/kmeans_ab_10k.json"
rng = np.random.default_rng(42)
ctr = rng.uniform(-1, 1, size=(CENTERS, D))
X = ctr[rng.integers(0, CENTERS, size=N)] + rng.uniform(
    -0.25, 0.25, size=(N, D)
)

rec = {
    "n": N, "d": D, "k": K, "iters": ITERS, "planted_centers": CENTERS,
    "pp_timed_lloyd_iters": PP_ITERS,
    "full_pp_attempt": "timed out at 3600 s harness limit (hard lower "
    "bound; seeding + Lloyd did not finish 20 iterations)",
    "calibration": bench._host_calibration(),
}


def flush():
    with open(OUT, "w") as fh:
        json.dump(rec, fh)


def stats(C):
    # chunked assignment (the full n×k block is 8 GB)
    x2 = np.square(X).sum(1, keepdims=True)
    c2 = np.square(C).sum(1)[None, :]
    sse = 0.0
    assign = np.empty(N, dtype=np.int64)
    for s in range(0, N, 8192):
        e = min(N, s + 8192)
        d2 = x2[s:e] - 2.0 * (X[s:e] @ C.T) + c2
        assign[s:e] = d2.argmin(axis=1)
        sse += float(d2.min(axis=1).sum())
    counts = np.bincount(assign, minlength=K)
    nonzero = counts[counts > 0]
    return {
        "sse": round(sse, 1),
        "cells_used": int((counts > 0).sum()),
        "pop_mean": round(float(nonzero.mean()), 2),
        "pop_p99": int(np.percentile(nonzero, 99)),
        "pop_max": int(nonzero.max()),
    }


t0 = time.time()
C_fast = _kmeans_fit_large_k(X, K, np.random.default_rng(0), ITERS)
rec["fast_wall_s"] = round(time.time() - t0, 1)
rec["fast"] = stats(C_fast)
flush()

if os.environ.get("CS598_KM_SKIP_PP"):  # fast-leg-only re-measure
    rec["calibration_end"] = bench._host_calibration()
    flush()
    print(json.dumps(rec))
    sys.exit(0)

# the pre-r18 path, phase-timed: full sequential k-means++ seeding,
# then PP_ITERS iterations of the full-block Lloyd step it ran
# (n×k float64 distance block + the per-cluster Python mask loop)
prng = np.random.default_rng(0)
t0 = time.time()
cents = [X[prng.integers(N)]]
d2 = np.square(X - cents[0]).sum(-1)
for _ in range(1, K):
    probs = d2 / d2.sum() if d2.sum() > 0 else np.full(N, 1.0 / N)
    new = X[prng.choice(N, p=probs)]
    cents.append(new)
    d2 = np.minimum(d2, np.square(X - new).sum(-1))
C = np.array(cents)
rec["pp_seeding_wall_s"] = round(time.time() - t0, 1)
flush()

x2 = np.square(X).sum(1, keepdims=True)
t0 = time.time()
for _ in range(PP_ITERS):
    d2 = x2 - 2.0 * (X @ C.T) + np.square(C).sum(1)[None, :]
    assign = d2.argmin(axis=1)
    for j in range(K):
        m = assign == j
        if m.any():
            C[j] = X[m].mean(axis=0)
per_iter = (time.time() - t0) / PP_ITERS
rec["pp_lloyd_s_per_iter"] = round(per_iter, 1)
rec["pp_wall_s_extrapolated"] = round(
    rec["pp_seeding_wall_s"] + ITERS * per_iter, 1
)
rec["speedup_extrapolated"] = round(
    rec["pp_wall_s_extrapolated"] / rec["fast_wall_s"], 1
)
rec["calibration_end"] = bench._host_calibration()
flush()
print(json.dumps(rec))
