"""Hybrid retrieval (operators/hybrid.py): BM25 values pinned against
an independent pure-Python implementation on the real fixture, the df
stopword hatch pinned, RRF pinned as exact rank arithmetic, and the
full hybrid path pinned on a planted-vocabulary corpus where
self-retrieval IS an invariant (the fixture corpus's 31-word
near-degenerate vocabulary makes lexical self-retrieval no theorem)."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from cs598vectordb_spark.operators.hybrid import bm25_scores, hybrid_search, rrf_fuse
from cs598vectordb_spark.sources.tables import load_table

K = 5
NQ = 8


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", re.sub(r"\s+", " ", text.strip().lower())) if t]


def _py_bm25(docs: dict[int, str], k1=1.2, b=0.75, df_cap_frac=1.0):
    """Independent BM25: returns score_fn(q_terms, doc_id)."""
    toks = {d: _py_tokens(t) for d, t in docs.items()}
    n = len(docs)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    vocab = {t for t, c in df.items() if c <= int(df_cap_frac * n)}
    avgdl = sum(len(ts) for ts in toks.values()) / n

    def score(q_terms: set[str], d: int) -> float:
        dl = len(toks[d])
        tf: dict[str, int] = {}
        for t in toks[d]:
            tf[t] = tf.get(t, 0) + 1
        s = 0.0
        for t in q_terms & vocab:
            if t not in tf:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf[t] * (k1 + 1.0) / (tf[t] + k1 * (1.0 - b + b * dl / avgdl))
        return s

    return score


def test_bm25_matches_pure_python(spark, sf_dir):
    """Engine BM25 vs an independently-written Python BM25 over the
    real documents fixture: every returned (q_id, doc_id) score matches
    to 1e-6, ranks are dense and score-ordered, and every returned doc
    clears the Python top-k score bar (the engine cannot have missed a
    better document)."""
    docs_df = load_table(spark, sf_dir, "documents")
    docs = {r.doc_id: r.text for r in docs_df.select("doc_id", "text").collect()}

    q = docs_df.select(F.col("doc_id").alias("q_id"), "text").filter(
        F.col("q_id") < NQ
    )
    got = bm25_scores(docs_df, q, k=K).collect()
    assert got, "no bm25 results"
    score = _py_bm25(docs)

    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(NQ))
    for qid, rows in by_q.items():
        q_terms = set(_py_tokens(docs[qid]))
        rows = sorted(rows, key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, K + 1))
        # ranks follow the (rounded) score, doc_id tie-break
        keys = [(-r.bm25, r.doc_id) for r in rows]
        assert keys == sorted(keys)
        # value pin: engine score == python score (rounded 6 dp both sides)
        for r in rows:
            want = round(score(q_terms, r.doc_id), 6)
            assert abs(r.bm25 - want) <= 1e-6, (qid, r.doc_id, r.bm25, want)
        # completeness: every returned doc clears the python k-th bar
        all_scores = sorted((score(q_terms, d) for d in docs), reverse=True)
        bar = all_scores[K - 1] - 1e-6
        assert all(score(q_terms, r.doc_id) >= bar for r in rows)


def test_bm25_df_cap_drops_stopwords(spark):
    """The scale hatch: with df_cap_frac set, tokens above the cap stop
    contributing — on a corpus where 'the' is in every doc and each doc
    has one unique term, capping at 0.5 leaves only the unique terms,
    so every query's top hit is the one document sharing its unique
    term (and 'the'-only overlaps score 0 and vanish)."""
    rows = [(i, f"the unique{i} the") for i in range(6)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [(0, "the unique3")], "q_id long, text string"
    )
    got = bm25_scores(docs, q, k=3, df_cap_frac=0.5).collect()
    assert [r.doc_id for r in got] == [3], [
        (r.doc_id, r.bm25) for r in got
    ]  # only the unique-term match survives; pure-'the' overlap is gone


def test_rrf_fusion_is_exact_rank_arithmetic(spark):
    """RRF on two synthetic rank lists: fused scores equal
    1/(60+lex) + 1/(60+vec) exactly (IEEE doubles over small ints on
    both sides), a one-leg id contributes exactly its one term, and
    ordering follows the fused score with doc_id tie-break."""
    lex = spark.createDataFrame(
        [(0, 1, 100), (0, 2, 200), (0, 3, 300)],
        "q_id long, rank int, doc_id long",
    )
    vec = spark.createDataFrame(
        [(0, 1, 200), (0, 2, 100), (0, 3, 400)],
        "q_id long, rank int, vec_id long",
    )
    got = {r.doc_id: r for r in rrf_fuse(lex, vec, k=4).collect()}
    assert set(got) == {100, 200, 300, 400}
    assert got[100].rrf == 1 / 61 + 1 / 62
    assert got[200].rrf == 1 / 62 + 1 / 61
    assert got[300].rrf == 1 / 63
    assert got[400].rrf == 1 / 63
    # 100 and 200 tie exactly (same two terms, commutative add) →
    # doc_id ascending breaks it; 300/400 tie the same way
    assert (got[100].rank, got[200].rank) == (1, 2)
    assert (got[300].rank, got[400].rank) == (3, 4)
    assert got[400].lex_rank is None and got[400].vec_rank == 3


def test_hybrid_search_self_retrieval(spark):
    """The full hybrid path on a PLANTED corpus where self-retrieval is
    a theorem: each doc carries a unique token (lexical self-win — no
    other doc scores on it) and a one-hot-ish distinct embedding
    (cosine self-win), so rank 1 fused must be the query's own id with
    both leg ranks = 1; ranks are dense and the fused score re-checks
    as the two-term rank arithmetic."""
    n = 12
    docs = spark.createDataFrame(
        [(i, f"common words everywhere token{i} token{i}") for i in range(n)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [
            (i, [1.0 if j == i else 0.1 for j in range(n)])
            for i in range(n)
        ],
        "vec_id long, embedding array<float>",
    )
    got = hybrid_search(docs, emb, n_queries=NQ, k=K).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(NQ))
    for qid, rows in by_q.items():
        rows = sorted(rows, key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, K + 1))
        top = rows[0]
        assert top.doc_id == qid, "self-retrieval must win the fused list"
        assert top.lex_rank == 1 and top.vec_rank == 1
        assert all(
            r.lex_rank is not None or r.vec_rank is not None for r in rows
        )
        # fused score is the two-term rank arithmetic, re-checked here
        for r in rows:
            want = (0.0 if r.lex_rank is None else 1 / (60 + r.lex_rank)) + (
                0.0 if r.vec_rank is None else 1 / (60 + r.vec_rank)
            )
            assert r.rrf == want


def test_hybrid_query_registered_runs(spark, sf_dir):
    """The registered entries run on the real fixture and keep their
    schemas: bm25_search returns dense per-query ranks; the fused query
    returns k rows per query with at least one leg rank each."""
    import __spark_entry__ as em

    qs = em.queries()
    bm = qs["bm25_search"](spark, sf_dir).collect()
    assert bm and {r.q_id for r in bm} == set(range(20))
    hy = qs["hybrid_rrf_search"](spark, sf_dir).collect()
    assert hy and {r.q_id for r in hy} == set(range(20))
    per_q: dict[int, int] = {}
    for r in hy:
        per_q[r.q_id] = per_q.get(r.q_id, 0) + 1
        assert r.lex_rank is not None or r.vec_rank is not None
    assert all(c == 10 for c in per_q.values())


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def c(v):
        return f"{v:.6f}" if isinstance(v, float) else str(v)

    return sorted(tuple(c(r[i]) for i in order) for r in rows)


def _duck_vs_spark(spark, sf_dir, sql, sdf, tables=("documents",)):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0
    assert _canon(srows, scols) == _canon(drows, dcols)


def test_bm25_oracle_dress_rehearsal(spark, sf_dir):
    """Dress rehearsal for the bm25_search oracle (PROMOTED r16 from
    the r15 queue): the engine's BM25 top-k and the DuckDB
    inverted-token-join twin must agree row for row at sf0.001 under
    the driver's sorted-columns value comparison — rank order is
    computed on the 6-dp ROUNDED score on both sides, so a last-ulp
    summation difference cannot flip it."""
    import __spark_entry__ as em

    sql = em.oracle_sql()["bm25_search"]
    sdf = em.queries()["bm25_search"](spark, sf_dir)
    _duck_vs_spark(spark, sf_dir, sql, sdf)


def test_hybrid_rrf_oracle_dress_rehearsal(spark, sf_dir):
    """Dress rehearsal for the hybrid_rrf_search oracle (PROMOTED r17
    from the r16 queue, funded by the media_decode_ppm retirement): the
    engine's BM25 ⊕ cosine RRF fusion and the DuckDB twin — the
    registered BM25 CTE re-ranked to k·expand, a brute-force cosine
    leg ROUNDED TO 6 DP before its rank window (ADVICE r16; the engine
    side passes score_round=COS_ROUND into the exact kernel),
    COALESCE'd reciprocal-rank sums — must agree row for row at
    sf0.001, nulls included, under the driver's sorted-columns value
    comparison."""
    import __spark_entry__ as em

    sql = em.oracle_sql()["hybrid_rrf_search"]
    sdf = em.queries()["hybrid_rrf_search"](spark, sf_dir)
    _duck_vs_spark(spark, sf_dir, sql, sdf, tables=("documents", "embeddings"))
