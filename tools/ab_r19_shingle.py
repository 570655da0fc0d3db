"""Interleaved A/B of the shingle_hashes Arrow boundary (VERDICT r18
next-round #3): the dedup family (minhash_lsh_dedup, dedup_clusters,
jaccard_topk, decontamination) all pay one mapInPandas pass over the
corpus; r18 measured an IDENTITY mapInPandas at ~0.38 s, so the
boundary itself is a candidate. Variants:

  pandas  = shipped kernel (mapInPandas; pd.DataFrame in/out)
  arrow   = same Python tokenize/memoize loop behind mapInArrow
            (pyarrow RecordBatch in/out - no pandas object columns)
  arrow @ maxRecordsPerBatch in {2k, 10k, 40k} - batch-size sweep

Timed action = noop sink over the kernel output on the >=100 MB
similarity-isomorphic replica corpus; rotations interleave variants so
host-load excursions hit all arms (the host drifts 1.2-2.7x on
unchanged code; see memory/host-drift).

Run solo: python tools/ab_r19_shingle.py [replicas]
Writes /tmp/cs598_spark_io/ab_r19_shingle.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def rotations(thunks: dict, rounds: int = 5) -> dict:
    for t in thunks.values():
        t()  # warm
    w = {k: [] for k in thunks}
    for _ in range(rounds):
        for k, t in thunks.items():
            t0 = time.time()
            t()
            w[k].append(max(time.time() - t0, 1e-9))
    return {
        k: {"median": round(sorted(v)[len(v) // 2], 3),
            "walls": [round(x, 3) for x in v]}
        for k, v in w.items()
    }


def shingle_hashes_arrow(docs, text_col="text", id_col="doc_id", n=3):
    """mapInArrow twin of dedup.shingle_hashes: identical Python
    tokenize/shingle/memoize loop, but pyarrow-native I/O (no pandas
    object-dtype list column on the way out)."""
    from cs598vectordb_spark.operators.dedup import (
        ROLLING_MOD,
        _vectorized_rolling,
    )

    mod = ROLLING_MOD

    def kernel(batches):
        import pyarrow as pa

        cache: dict[str, int] = {}
        for b in batches:
            ids = b.column(0)
            texts = b.column(1).to_pylist()
            per_doc = []
            fresh: dict[str, None] = {}
            for text in texts:
                toks = (text or "").lower().split()
                if len(toks) >= n:
                    grams = list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                    for g in grams:
                        if g not in cache:
                            fresh[g] = None
                else:
                    grams = []
                per_doc.append(grams)
            new = list(fresh)
            for g, h in zip(new, _vectorized_rolling(new, mod)):
                cache[g] = int(h)
            hashes = pa.array(
                [[cache[g] for g in grams] for grams in per_doc],
                type=pa.list_(pa.int64()),
            )
            yield pa.record_batch([ids, hashes], names=[id_col, "hashes"])

    return docs.select(id_col, text_col).mapInArrow(
        kernel, f"{id_col} long, hashes array<long>"
    )


def shingle_hashes_chunked(docs, text_col="text", id_col="doc_id", n=3,
                           chunk=2048):
    """The shipped mapInPandas kernel, but each incoming Arrow batch is
    processed and yielded in <=chunk-row slices — bounds per-yield
    Python/GC work and pipelines output back to the JVM earlier,
    WITHOUT touching the session-wide maxRecordsPerBatch (which the
    GEMM-heavy kNN kernels want large)."""
    from cs598vectordb_spark.operators.dedup import (
        ROLLING_MOD,
        _vectorized_rolling,
    )
    import pandas as pd

    mod = ROLLING_MOD

    def kernel(batches):
        cache: dict[str, int] = {}
        for pdf in batches:
            for lo in range(0, len(pdf), chunk):
                part = pdf.iloc[lo : lo + chunk]
                ids, per_doc = [], []
                fresh: dict[str, None] = {}
                for did, text in zip(
                    part[id_col].tolist(), part[text_col].tolist()
                ):
                    toks = (text or "").lower().split()
                    if len(toks) >= n:
                        grams = list(
                            dict.fromkeys(
                                " ".join(toks[i : i + n])
                                for i in range(len(toks) - n + 1)
                            )
                        )
                        for g in grams:
                            if g not in cache:
                                fresh[g] = None
                    else:
                        grams = []
                    ids.append(did)
                    per_doc.append(grams)
                new = list(fresh)
                for g, h in zip(new, _vectorized_rolling(new, mod)):
                    cache[g] = int(h)
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "hashes": [
                            [cache[g] for g in grams] for grams in per_doc
                        ],
                    }
                )

    return docs.select(id_col, text_col).mapInPandas(
        kernel, f"{id_col} long, hashes array<long>"
    )


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 0

    import bench
    from cs598vectordb_spark.operators import dedup
    from cs598vectordb_spark.session import get_spark

    spark = get_spark("ab-r19-shingle")
    spark.range(10000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    if not times:
        docs_sf = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        corpus_mb = (
            docs_sf.agg(F.sum(F.octet_length("text"))).collect()[0][0] or 0
        ) / 1048576
        import math

        times = max(2, min(128, int(math.ceil(
            float(os.environ.get("SPARK_GRAFT_TEXT_MB", "100"))
            / max(corpus_mb, 0.01)))))
    big_dir = bench._xn_corpus(spark, sf_dir, times)
    docs = spark.read.parquet(os.path.join(big_dir, "documents.parquet"))
    big_mb = (
        docs.agg(F.sum(F.octet_length("text"))).collect()[0][0] or 0
    ) / 1048576
    print(f"replica corpus: x{times}, {big_mb:.1f} MB", flush=True)

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    cal = bench._host_calibration()
    print("calibration:", cal, flush=True)

    def at_batch(thunk, nrec):
        def run():
            old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", nrec)
            try:
                thunk()
            finally:
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", old
                )
        return run

    def pandas_form():
        noop(dedup.shingle_hashes(docs))

    def arrow_form():
        noop(shingle_hashes_arrow(docs))

    # value parity before timing anything
    a = dedup.shingle_hashes(docs.limit(2000)).orderBy("doc_id").collect()
    b = shingle_hashes_arrow(docs.limit(2000)).orderBy("doc_id").collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b], "parity FAIL"
    print("parity OK (2000 docs)", flush=True)

    spark.sparkContext.setJobDescription("ab shingle boundary")
    arms = os.environ.get(
        "CS598_SHINGLE_ARMS",
        "pandas_10k,arrow_10k,arrow_2k,arrow_40k,pandas_40k",
    ).split(",")
    rounds = int(os.environ.get("CS598_SHINGLE_ROUNDS", "5"))
    def chunked_form():
        noop(shingle_hashes_chunked(docs))

    forms = {"pandas": pandas_form, "arrow": arrow_form,
             "chunked": chunked_form}

    def arm(name):
        kind, nrec = name.split("_")
        nrec = int(nrec.rstrip("k")) * 1000
        return at_batch(forms[kind], nrec) if nrec != 10000 else forms[kind]

    r = rotations({a: arm(a) for a in arms}, rounds=rounds)
    out = {"replicas": times, "big_mb": round(big_mb, 1),
           "calibration_start": cal, "shingle": r,
           "calibration_end": bench._host_calibration()}
    print(json.dumps(r), flush=True)
    os.makedirs("/tmp/cs598_spark_io", exist_ok=True)
    with open("/tmp/cs598_spark_io/ab_r19_shingle.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
