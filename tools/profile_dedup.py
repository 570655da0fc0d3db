"""Stage-isolation profile of the dedup-family headline queries (guide §1).

Times each pipeline stage with the noop sink so the numbers are compute,
not sink. Run solo (quiet host) at the bench SF:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_dedup.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def med3(mk) -> float:
    """Median-of-3 wall of CONSTRUCTION + noop action: several builders
    run eager work (localCheckpoint) during construction, so the thunk
    form is the honest boundary (the bench's executed_plan_metrics
    discipline)."""
    walls = []
    for _ in range(3):
        t0 = time.time()
        mk().write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    return sorted(walls)[1]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cs598vectordb_spark.operators import dedup
    from cs598vectordb_spark.session import get_spark
    from cs598vectordb_spark.sources.tables import load_table

    spark = get_spark("profile-dedup")
    spark.range(10000).repartition(32).mapInPandas(lambda it: it, "id long").count()
    docs = load_table(spark, sf_dir, "documents")
    print("docs:", docs.count())

    sc = spark.sparkContext
    out = {}

    sc.setJobDescription("stage: shingle_hashes kernel")
    out["shingle_hashes"] = med3(lambda: dedup.shingle_hashes(docs))

    sc.setJobDescription("stage: minhash_signatures (incl kernel)")
    out["minhash_signatures"] = med3(lambda: dedup.minhash_signatures(docs, 16))

    def pairs():
        sigs = dedup.minhash_signatures(docs, 16)
        return dedup.lsh_candidate_pairs(sigs, 8, 2)

    sc.setJobDescription("stage: candidate pairs (incl kernel+sigs)")
    out["candidate_pairs"] = med3(pairs)

    sc.setJobDescription("stage: full verified pairs (minhash_lsh_dedup)")
    out["minhash_lsh_dedup"] = med3(lambda: dedup.minhash_lsh_dedup(docs))

    sc.setJobDescription("stage: dedup_clusters")
    out["dedup_clusters"] = med3(lambda: dedup.dedup_clusters(docs))

    sc.setJobDescription("stage: jaccard_topk")
    out["jaccard_topk"] = med3(lambda: dedup.jaccard_topk(docs))

    # decontamination pieces
    from cs598vectordb_spark.operators import textops

    splits = textops.hash_split(docs, {"train": 80, "val": 10, "test": 10}, salt="s1")
    sc.setJobDescription("stage: cross_split_contamination")
    out["decontamination"] = med3(
        lambda: dedup.cross_split_contamination(docs, splits, min_shared=2, max_df=10)
    )

    # edge/round census for dedup_clusters
    raw_pairs, hashed = dedup._lsh_verified_pairs(docs, 16, 8, 2, "text", "doc_id")
    pairs_n = raw_pairs.filter(F.col("jaccard") >= 0.5).count()
    hashed.unpersist()
    print("threshold pairs:", pairs_n)

    sc.setJobDescription(None)
    for k, v in out.items():
        print(f"{k:26s} {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
