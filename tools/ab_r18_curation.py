"""Interleaved A/B of the r18 curation-path optimizations (guide §1 +
the repo's interleaved_rotations discipline: same-session, alternating
thunks, so both forms share every host-load excursion).

A = the pre-r18 formulation, reconstructed inline.
B = the shipped r18 formulation (current code).

Run solo: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/ab_r18_curation.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
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
    return {k: round(sorted(v)[len(v) // 2], 3) for k, v in w.items()}


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from cs598vectordb_spark.operators import dedup, textops
    from cs598vectordb_spark.session import get_spark
    from cs598vectordb_spark.sources.tables import load_table

    spark = get_spark("ab-r18")
    spark.range(10000).repartition(32).mapInPandas(lambda it: it, "id long").count()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # ---------------- decontamination: window df-cap (A) vs agg+join (B)
    splits = textops.hash_split(docs)

    def decon_window():
        hashed = dedup.shingle_hashes(docs).persist()
        tagged = hashed.join(splits.select("doc_id", "split"), "doc_id")
        postings = tagged.select("doc_id", "split", F.explode("hashes").alias("h"))
        w = Window.partitionBy("h")
        pruned = (
            postings.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= 10)
            .drop("_df")
        )
        tr = pruned.filter(F.col("split") == "train").select(
            F.col("doc_id").alias("train_doc"), "h"
        )
        te = pruned.filter(F.col("split") == "test").select(
            F.col("doc_id").alias("test_doc"), "h"
        )
        out = (
            tr.join(te, "h")
            .groupBy("train_doc", "test_doc")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= 2)
        )
        try:
            noop(out.localCheckpoint(eager=True))
        finally:
            hashed.unpersist()

    def decon_agg():
        noop(dedup.cross_split_contamination(docs, splits, min_shared=2, max_df=10))

    # ---------------- curate_corpus: 4-scan join form (A) vs inline (B)
    def curate_joins():
        from cs598vectordb_spark.operators.dedup import dedup_exact

        q = textops.quality_scores(docs).select("doc_id", "quality", "n_tokens")
        canon = dedup_exact(docs).select(F.col("canonical_id").alias("doc_id"))
        s = textops.hash_split(docs).select("doc_id", "split")
        kept = (
            docs.select("doc_id", "lang")
            .filter(F.col("lang").isin(["en", "es", "de"]))
            .join(canon, "doc_id")
            .join(q, "doc_id")
            .filter(F.col("quality") >= 0.5)
            .join(s, "doc_id")
        )
        noop(
            kept.groupBy("split", "lang").agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                F.round(F.avg("quality"), 4).alias("avg_quality"),
            )
        )

    def curate_inline():
        noop(textops.curate_corpus(docs))

    # ---------------- banded key: string sig (A) vs packed long (B)
    def pairs_with(banded_fn):
        hashed = dedup.shingle_hashes(docs).persist()
        sigs = dedup.minhash_signatures(docs, 16, hashed=hashed)
        exploded = banded_fn(sigs, 8, 2)
        a = exploded.alias("a")
        b = exploded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.sig") == F.col("b.sig"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
        try:
            noop(pairs.localCheckpoint(eager=True))
        finally:
            hashed.unpersist()

    def banded_string(sigs, bands, rows):
        band_cols = []
        for b in range(bands):
            sig = F.concat_ws(
                "-", *[F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
            )
            band_cols.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
        return sigs.select(
            F.col("doc_id"), F.explode(F.array(*band_cols)).alias("bs")
        ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))

    def pairs_string():
        pairs_with(banded_string)

    def pairs_packed():
        pairs_with(dedup._banded)

    print(
        rotations(
            {
                "decon_window_A": decon_window,
                "decon_agg_B": decon_agg,
                "curate_joins_A": curate_joins,
                "curate_inline_B": curate_inline,
                "pairs_string_A": pairs_string,
                "pairs_packed_B": pairs_packed,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
