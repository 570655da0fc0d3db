"""Exact kNN correctness: kernel vs Catalyst expression, self-query axioms."""

from __future__ import annotations

from pyspark.sql import functions as F

from cs598vectordb_spark.operators.knn import knn_collect, knn_exact, knn_exact_expr
from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

K = 10
NQ = 20


def _setup(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb, queries_from_embeddings(emb, NQ)


def test_kernel_matches_expression(spark, sf_dir):
    """Retired-oracle pin (r9): knn_exact_expr shared knn_exact's oracle
    verbatim, so exact row-set equality against the still-oracled
    knn_exact is the same evidence one slot cheaper."""
    emb, q = _setup(spark, sf_dir)
    a = knn_exact(emb, q, k=K).select("q_id", "rank", "vec_id")
    b = knn_exact_expr(emb, q, k=K).select("q_id", "rank", "vec_id")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_self_neighbor_rank1(spark, sf_dir):
    """Self-querying: each query's own vec_id is its rank-1 hit at dist 0
    (FIXTURES.md self-checking axiom; mirrors recall==1.0 for exact search
    in the reference, dynamic_script_faiss.py:25-29)."""
    emb, q = _setup(spark, sf_dir)
    r1 = knn_exact(emb, q, k=K).filter(F.col("rank") == 1).collect()
    assert len(r1) == NQ
    for row in r1:
        assert row.q_id == row.vec_id
        assert abs(row.dist) < 1e-9


def test_row_shape(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    res = knn_exact(emb, q, k=K)
    assert res.count() == NQ * K
    per_q = res.groupBy("q_id").count().select("count").distinct().collect()
    assert len(per_q) == 1 and per_q[0]["count"] == K


def test_cosine_self_neighbor(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    r1 = (
        knn_exact(emb, q, k=K, metric="cosine")
        .filter(F.col("rank") == 1)
        .collect()
    )
    for row in r1:
        assert row.q_id == row.vec_id
        assert abs(row.dist - 1.0) < 1e-9


def test_knn_collect_shape(spark, sf_dir):
    emb, q = _setup(spark, sf_dir)
    out = knn_collect(knn_exact(emb, q, k=K)).collect()
    assert len(out) == NQ
    for row in out:
        ids = row.nn_csv.split(",")
        assert len(ids) == K
        assert int(ids[0]) == row.q_id  # self first


def test_knn_collect_matches_exact_rows(spark, sf_dir):
    """Retired-oracle pin (r9): knn_collect is a pure reshape of the
    oracled knn_exact rows, so value-exact equality against a direct
    rank-ordered CSV of those rows carries the full evidence chain
    (knn_exact oracle -> this pin -> knn_collect)."""
    emb, q = _setup(spark, sf_dir)
    rows = knn_exact(emb, q, k=K).select("q_id", "rank", "vec_id")
    got = {r.q_id: r.nn_csv for r in knn_collect(rows).collect()}
    want = {
        r.q_id: r.csv
        for r in rows.groupBy("q_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rank", "vec_id"))),
                    lambda s: s["vec_id"].cast("string"),
                ),
            ).alias("csv")
        )
        .collect()
    }
    assert got == want and len(got) == NQ


def test_pca_invariants(spark, sf_dir):
    """PCA correctness without an SQL oracle: components orthonormal,
    spectrum non-increasing and variance-complete, full-rank projection
    an exact isometry (pairwise distances preserved => identical kNN),
    and low-rank projection keeps recall well above chance."""
    import numpy as np

    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.operators.metrics import recall_at_k
    from cs598vectordb_spark.operators.pca import fit_pca, pca_project, pca_spectrum
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    comps, evals, mean = fit_pca(emb)
    d = comps.shape[0]
    assert np.allclose(comps.T @ comps, np.eye(d), atol=1e-8)
    assert all(evals[i] >= evals[i + 1] - 1e-9 for i in range(d - 1))

    spec = pca_spectrum(emb).collect()
    assert len(spec) == d
    assert abs(spec[-1]["cum_ratio"] - 1.0) < 1e-4

    # full-rank projection is a rotation: kNN identical to original space
    q = queries_from_embeddings(emb, 20)
    truth = knn_exact(emb, q, 10).select("q_id", "rank", "vec_id")
    full = pca_project(emb, d, fitted=(comps, evals, mean)).withColumnRenamed(
        "pca", "embedding"
    )
    qf = queries_from_embeddings(full, 20)
    got = knn_exact(full, qf, 10).select("q_id", "rank", "vec_id")
    assert got.exceptAll(truth).count() == 0 and truth.exceptAll(got).count() == 0

    # low-rank (16 of 64) keeps substantial neighborhood structure
    low = pca_project(emb, 16, fitted=(comps, evals, mean)).withColumnRenamed(
        "pca", "embedding"
    )
    ql = queries_from_embeddings(low, 20)
    rec = recall_at_k(knn_exact(low, ql, 10), truth, 10).collect()[0][0]
    # the synthetic embeddings are ISOTROPIC — PCA's worst case, all
    # eigenvalues comparable — so 16/64 dims measured ~0.28 recall;
    # the floor asserts far-above-chance (random 10-of-N is ~0.002),
    # not compression quality on clusterable data
    assert rec >= 0.2, rec


def test_knn_ip_matches_bruteforce(spark, sf_dir):
    """MIPS kernel == numpy argmax-by-dot ground truth (rank order and
    membership), including the desc tie-break by vec_id."""
    import numpy as np

    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, 20)
    got = {
        (r.q_id, r.rank): r.vec_id
        for r in knn_exact(emb, q, 10, metric="ip").collect()
    }
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    for qid in range(20):
        s = X @ X[qid]
        top = sorted(range(len(ids)), key=lambda i: (-s[i], ids[i]))[:10]
        for rank, i in enumerate(top, 1):
            assert got[(qid, rank)] == ids[i], (qid, rank)


def test_knn_cosine_value_exact(spark, sf_dir):
    """Value-exact pin for the knn_cosine entry (ORACLE RETIRED r18,
    funding the knn_join_l2 promotion): the REGISTERED query's full
    (q_id, rank, vec_id) row set must equal a numpy float64 brute-force
    recomputation of the retired DuckDB twin's arithmetic — cosine DESC
    with the vec_id ASC tie-break. The minimum rank-adjacent similarity
    margin on this fixture (~5e-6, measured) dwarfs normalize-then-GEMM
    vs dot/norms reorder noise (~1e-15), so ranks are well-defined."""
    import numpy as np

    import __spark_entry__ as em
    from cs598vectordb_spark.config import DEFAULT_K, DEFAULT_N_QUERIES
    from cs598vectordb_spark.sources.tables import load_table

    got = {
        (r.q_id, r.rank): r.vec_id
        for r in em.queries()["knn_cosine"](spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.array(r.embedding, dtype=np.float64) for r in rows])
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    norms = np.linalg.norm(X, axis=1)
    assert len(got) == DEFAULT_N_QUERIES * DEFAULT_K
    for qid in range(DEFAULT_N_QUERIES):
        s = (X @ X[qid]) / (norms * norms[qid])
        top = sorted(range(len(ids)), key=lambda i: (-s[i], ids[i]))[:DEFAULT_K]
        for rank, i in enumerate(top, 1):
            assert got[(qid, rank)] == ids[i], (qid, rank)


def test_knn_range_exact_membership(spark, sf_dir):
    """Range search returns exactly the pairs within radius2 — verified
    against the exact kernel's distances (no misses at the boundary, no
    extras)."""
    from cs598vectordb_spark.operators.knn import knn_exact, knn_range
    from cs598vectordb_spark.sources.tables import load_table, queries_from_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = queries_from_embeddings(emb, 20)
    r2 = 1.5
    got = {(r.q_id, r.vec_id) for r in knn_range(emb, q, r2).collect()}
    # k large enough to cover every in-radius neighbor at this SF
    full = knn_exact(emb, q, 500).collect()
    want = {(r.q_id, r.vec_id) for r in full if r.dist <= r2}
    assert got == want
    assert len(got) > 20  # at least the self-matches plus real neighbors


def test_pca_recall_high_on_low_rank_data(spark):
    """PCA-compressed search is a DATA-DEPENDENT backend: on the
    isotropic synthetic fixtures it scores 0.15-0.37 recall (bench
    detail) because there are no low-variance directions to drop — that
    is a property of the data, not the operator. This test demonstrates
    the converse: on data with genuine low-rank structure (intrinsic
    dim 8 + 2% noise in d=64), out_dim=16 captures >=95% of the variance
    and exact kNN in the compressed space reaches recall >= 0.9."""
    import numpy as np

    from cs598vectordb_spark.operators.knn import knn_exact
    from cs598vectordb_spark.operators.metrics import recall_at_k
    from cs598vectordb_spark.operators.pca import fit_pca, pca_project

    rng = np.random.default_rng(42)
    n, d, intrinsic = 2000, 64, 8
    basis = np.linalg.qr(rng.standard_normal((d, intrinsic)))[0]
    X = rng.standard_normal((n, intrinsic)) @ basis.T
    X += 0.02 * rng.standard_normal((n, d))  # 2% isotropic noise
    emb = spark.createDataFrame(
        [(i, X[i].astype("float32").tolist()) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(8)

    fitted = fit_pca(emb)
    _, evals, _ = fitted
    out_dim = 16
    captured = float(evals[:out_dim].sum() / evals.sum())
    assert captured >= 0.95, captured

    proj = pca_project(emb, out_dim, fitted=fitted).withColumnRenamed(
        "pca", "embedding"
    )
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    pq = proj.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    truth = knn_exact(emb, q, k=10)
    pred = knn_exact(proj, pq, k=10)
    rec = recall_at_k(pred, truth, 10).collect()[0][0]
    assert rec >= 0.9, (rec, captured)


def test_hard_negatives_excludes_near_dups(spark, sf_dir):
    """Evidence pin for the rows-only hard_negatives entry: a planted
    exact duplicate of an anchor (cosine 1.0) must NOT appear among its
    negatives while the true most-similar-but-distinct vectors do, the
    anchor never returns itself, every similarity respects the near-dup
    ceiling, and ranks descend by similarity."""
    from cs598vectordb_spark.operators.knn import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    base = emb.union(dup)
    q = queries_from_embeddings(emb, 5)
    got = hard_negatives(base, q, k=K, max_cos=0.95).cache()

    rows = got.collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    for qid, rs in by_q.items():
        ids = [r.vec_id for r in rs]
        assert qid not in ids  # never the anchor itself
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(s <= 0.95 for s in sims)
        assert [r.rank for r in sorted(rs, key=lambda r: r.rank)] == list(
            range(1, len(rs) + 1)
        )
    # the planted exact duplicate of anchor 0 (cosine 1.0) is excluded
    assert 100000 not in [r.vec_id for r in by_q[0]]
    got.unpersist()
