"""Interleaved A/B of the r19 token-stream Arrow kernels (guide §1 +
the repo's interleaved_rotations discipline: same-session, alternating
thunks, so both forms share every host-load excursion; the host's
cross-window drift is ~1.2-1.6x on unchanged code, so nothing else is
trustworthy).

A = the pre-r19 explode + groupBy-per-token formulation, reconstructed
    inline for each of dsir_logweights / lm_surprisal / bm25_scores.
B = the shipped r19 formulation (current code: one
    functions/tokenstream mapInArrow kernel pass, localCheckpoint'd,
    final counts with no Generate node).

The timed action is the noop sink (guide §1.4: computes every column,
discards the write) over the >=100 MB similarity-isomorphic replica
corpus (bench._xn_corpus — the corpus where MB/s is the KERNEL's rate,
not scheduling overhead). Construction is included in each thunk: the
B forms run eager jobs (totals collect + localCheckpoint) at build
time, and excluding them would flatter B.

Run solo: python tools/ab_r19_tokenstream.py [replicas]
Writes /tmp/cs598_spark_io/ab_r19_tokenstream.json.
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


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    times = int(sys.argv[1]) if len(sys.argv) > 1 else 0

    import bench
    from cs598vectordb_spark.functions.text import normalize_ws, tokens
    from cs598vectordb_spark.operators import textops
    from cs598vectordb_spark.operators.hybrid import bm25_scores
    from cs598vectordb_spark.session import get_spark

    spark = get_spark("ab-r19-tokenstream")
    spark.range(10000).repartition(32).mapInPandas(lambda it: it, "id long").count()

    if not times:
        # same sizing rule as bench's text_ops block (~100 MB target)
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

    # ---------------- dsir_logweights: A = r18 explode form ----------
    def dsir_old():
        n_buckets, id_col = 10_000, "doc_id"
        target = F.col("lang") == "en"
        mid = docs.select(
            F.col(id_col), target.alias("_is_t"), textops._dsir_token_col("text")
        )
        nt = F.size(F.col("_ws"))
        n_feats_row = nt + F.greatest(nt - F.lit(1), F.lit(0))
        totals = mid.agg(
            F.coalesce(F.sum(n_feats_row), F.lit(0)).alias("raw"),
            F.coalesce(
                F.sum(F.when(F.col("_is_t"), n_feats_row).otherwise(0)), F.lit(0)
            ).alias("tgt"),
        ).collect()[0]
        t_raw, t_tgt = int(totals["raw"]), int(totals["tgt"])
        exploded = mid.select(
            F.col(id_col), F.col("_is_t"),
            F.explode(textops._dsir_feats_expr()).alias("feat"),
        ).select(
            id_col, "_is_t",
            F.pmod(F.xxhash64("feat"), F.lit(n_buckets)).alias("bucket"),
        )
        per_doc = exploded.groupBy(id_col, "bucket").agg(
            F.count(F.lit(1)).alias("c")
        )
        raw_b = exploded.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_raw"))
        tgt_b = (
            exploded.filter("_is_t").groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c_tgt"))
        )
        w = raw_b.join(tgt_b, "bucket", "left").select(
            "bucket",
            (
                F.log(F.coalesce(F.col("c_tgt"), F.lit(0)).cast("double") + 1.0)
                - F.log(F.lit(float(t_tgt + n_buckets)))
                - F.log(F.col("c_raw").cast("double") + 1.0)
                + F.log(F.lit(float(t_raw + n_buckets)))
            ).alias("w"),
        )
        per = (
            per_doc.join(F.broadcast(w), "bucket")
            .groupBy(id_col)
            .agg(
                F.sum("c").alias("n_feats"),
                F.sum(F.col("c").cast("double") * F.col("w")).alias("_lw"),
            )
        )
        noop(
            docs.select(id_col, target.alias("is_target"))
            .join(per, id_col, "left")
            .select(
                id_col, "is_target",
                F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
                F.round(F.coalesce(F.col("_lw"), F.lit(0.0)), 4).alias(
                    "log_weight"
                ),
            )
        )

    def dsir_new():
        noop(textops.dsir_logweights(docs, F.col("lang") == "en"))

    # ---------------- lm_surprisal: A = r12-r18 two-explode form -----
    def lm_old():
        id_col, text_col = "doc_id", "text"
        tok_arr = F.filter(
            tokens(normalize_ws(F.col(text_col))), lambda w: F.length(w) > 0
        )
        total = int(
            docs.agg(F.sum(F.size(tok_arr)).alias("n")).collect()[0]["n"] or 0
        )
        toks = docs.select(
            F.col(id_col),
            F.explode(tokens(normalize_ws(F.col(text_col)))).alias("token"),
        ).filter(F.length("token") > 0)
        tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
        vocab = tf.groupBy("token").agg(F.sum("tf").alias("c"))
        scored = tf.join(vocab, "token").select(
            id_col, F.col("tf"),
            (
                F.col("tf").cast("double")
                * (F.log(F.lit(float(max(total, 1)))) - F.log(F.col("c").cast("double")))
            ).alias("nll_sum"),
        )
        per = scored.groupBy(id_col).agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum("nll_sum") / F.sum("tf")).alias("_anl"),
        )
        noop(
            docs.select(id_col)
            .join(per, id_col, "left")
            .select(
                id_col,
                F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
                F.round(F.coalesce(F.col("_anl"), F.lit(0.0)), 4).alias(
                    "avg_neg_logprob"
                ),
                F.round(
                    F.exp(F.coalesce(F.col("_anl"), F.lit(0.0))), 4
                ).alias("perplexity"),
            )
        )

    def lm_new():
        noop(textops.lm_surprisal(docs))

    # ---------------- bm25: A = explode + (doc,token) agg form -------
    q20 = docs.select(F.col("doc_id").alias("q_id"), "text").filter(
        F.col("q_id") < 20
    )

    def bm25_old():
        from pyspark.sql import Window

        id_col, text_col, k, k1, b_ = "doc_id", "text", 10, 1.2, 0.75
        n_docs = docs.count()
        toks = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(normalize_ws(F.col(text_col)))).alias("token"),
        )
        tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
        df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df")).filter(
            F.col("df") <= n_docs
        )
        from cs598vectordb_spark.functions.text import token_count

        dl = docs.select(
            F.col(id_col).alias("doc_id"),
            token_count(normalize_ws(F.col(text_col))).alias("dl"),
        )
        avgdl = float(dl.agg(F.avg("dl")).collect()[0][0])
        qt = q20.select(
            "q_id",
            F.explode(
                F.array_distinct(tokens(normalize_ws(F.col(text_col))))
            ).alias("token"),
        )
        idf = F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        )
        tf_norm = (
            F.col("tf") * (k1 + 1.0)
            / (F.col("tf") + k1 * (1.0 - b_ + b_ * F.col("dl") / F.lit(avgdl)))
        )
        scored = (
            qt.join(df, "token").join(tf, "token").join(dl, "doc_id")
            .groupBy("q_id", "doc_id")
            .agg(F.round(F.sum(idf * tf_norm), 6).alias("bm25"))
        )
        w = Window.partitionBy("q_id").orderBy(
            F.col("bm25").desc(), F.col("doc_id").asc()
        )
        noop(
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "doc_id", "bm25")
        )

    def bm25_new():
        noop(bm25_scores(docs, q20, k=10))

    out = {"replicas": times, "big_mb": round(big_mb, 1),
           "calibration_start": cal}
    for name, a, b in (
        ("dsir_logweights", dsir_old, dsir_new),
        ("lm_surprisal", lm_old, lm_new),
        ("bm25", bm25_old, bm25_new),
    ):
        spark.sparkContext.setJobDescription(f"ab {name}")
        r = rotations({"old": a, "new": b}, rounds=5)
        r["speedup"] = round(r["old"]["median"] / r["new"]["median"], 3)
        out[name] = r
        print(name, json.dumps(r), flush=True)
    out["calibration_end"] = bench._host_calibration()
    os.makedirs("/tmp/cs598_spark_io", exist_ok=True)
    with open("/tmp/cs598_spark_io/ab_r19_tokenstream.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
