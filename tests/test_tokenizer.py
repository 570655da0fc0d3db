"""BPE tokenizer family: distributed training on the classic corpus
(hand-computable merge sequence), encode closed forms, fixture
invariants for the registered rows-only entries, and the
zero-shuffle encode plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cs598vectordb_spark.operators import tokenizer as tk
from tests.test_plans import plan_of


CLASSIC = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)


@pytest.fixture(scope="module")
def classic_merges(spark):
    docs = spark.createDataFrame([(0, CLASSIC)], "doc_id long, text string")
    return tk.bpe_train(docs, n_merges=5)


def test_bpe_train_classic_corpus(spark, classic_merges):
    """The Sennrich et al. 2016 worked example, hand-computed: word
    freqs low:5 lower:2 newest:6 widest:3 give pair maxima
    (e,s)=(s,t)=(t,</w>)=9 — the lexicographic tie-break must pick
    (e,s) first, then the merged symbols cascade es→est→est</w>, then
    the 7-count (l,o)/(o,w) tie resolves to (l,o) then (lo,w)."""
    got = [(r.rank, r.left, r.right, r.pair_count) for r in
           classic_merges.orderBy("rank").collect()]
    assert got == [
        (0, "e", "s", 9),
        (1, "es", "t", 9),
        (2, "est", "</w>", 9),
        (3, "l", "o", 7),
        (4, "lo", "w", 7),
    ]


def test_bpe_encode_closed_form(spark, classic_merges):
    """Applying the classic merges to 'low lower newest' by hand:
    low→[low,</w>]=2 tokens (lo then low; (w,</w>) never learned),
    lower→[low,e,r,</w>]=4, newest→[n,e,w,est</w>]=4 — 10 BPE tokens
    over 3 words / 14 chars. Empty AND NULL documents keep all-zero
    rows (not NULL, not dropped, not a kernel crash)."""
    docs = spark.createDataFrame(
        [(0, "low lower newest"), (1, ""), (2, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in tk.bpe_encode_stats(docs, classic_merges).collect()}
    assert (got[0].n_words, got[0].n_chars, got[0].n_bpe_tokens) == (3, 14, 10)
    assert got[0].tokens_per_word == 3.3333
    assert got[0].chars_per_token == 1.4
    for d in (1, 2):
        assert (got[d].n_words, got[d].n_bpe_tokens, got[d].tokens_per_word) == (
            0, 0, 0.0,
        )

    # rank GAPS must not shift the pair lookup: filtering the table to
    # ranks [0, 2, 3, 4] removes (es,t), so newest stops at
    # [n,e,w,es,t,</w>] -> no (est,</w>) either... est never forms, and
    # (t,</w>) was never learned: n e w es t </w> = 6 tokens;
    # low/lower still merge through (l,o),(lo,w) = 2 and 4.
    gappy = classic_merges.filter(F.col("rank") != 1)
    got = {r.doc_id: r for r in tk.bpe_encode_stats(docs, gappy).collect()}
    assert (got[0].n_words, got[0].n_bpe_tokens) == (3, 12)


def test_bpe_merges_fixture_invariants(spark, sf_dir):
    """The registered bpe_merges entry on the fixture corpus: full rank
    sequence, the non-increasing best-pair-count theorem (a merge can
    only create pairs bounded by the merged pair's own count, and old
    counts never grow), and vocabulary CLOSURE — every merge operand is
    a single character, the end symbol, or the product of an earlier
    merge (the defining well-formedness of a BPE merge table)."""
    from cs598vectordb_spark.queries_text import q_bpe_merges

    rows = q_bpe_merges(spark, sf_dir).orderBy("rank").collect()
    assert [r.rank for r in rows] == list(range(len(rows)))
    assert len(rows) == 40  # fixture corpus is rich enough to not stop early
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    formed = set()
    for r in rows:
        for side in (r.left, r.right):
            assert len(side) == 1 or side == tk.BPE_END or side in formed, r
        formed.add(r.left + r.right)


def test_bpe_token_stats_fixture(spark, sf_dir):
    """Registered bpe_token_stats entry: one row per document, token
    counts bounded by chars+words above (no merges applied) and words
    below (every word is at least one token... plus its end symbol
    until (x,</w>) merges land — so the hard floor is n_words), and
    the learned vocabulary must actually COMPRESS the corpus it was
    trained on: total BPE tokens strictly under the no-merge count."""
    from cs598vectordb_spark.queries_text import q_bpe_token_stats
    from cs598vectordb_spark.sources.tables import load_table

    out = q_bpe_token_stats(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    assert out.count() == docs.count()
    bad = out.filter(
        (F.col("n_bpe_tokens") > F.col("n_chars") + F.col("n_words"))
        | ((F.col("n_words") > 0) & (F.col("n_bpe_tokens") < F.col("n_words")))
    )
    assert bad.count() == 0
    tot = out.agg(
        F.sum("n_bpe_tokens").alias("t"),
        F.sum(F.col("n_chars") + F.col("n_words")).alias("nomerge"),
    ).collect()[0]
    assert tot.t < tot.nomerge


def test_bpe_word_freqs_plan_single_shuffle(spark, sf_dir):
    """The trainer's one corpus-scale stage: a word-keyed aggregation
    with map-side partial combine — exactly one exchange, no window,
    no join, no Python."""
    from cs598vectordb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    plan = plan_of(tk.bpe_word_freqs(docs))
    assert plan.count("Exchange") == 2, plan  # one node: tree + detail
    assert "hashpartitioning(word" in plan, plan
    assert "Window" not in plan and "Join" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_bpe_encode_plan_is_projection(spark, sf_dir):
    """Encode is scan-shaped: ONE Arrow kernel node (two formatted-plan
    mentions), zero Exchange, no join — the merge table rides in the
    kernel closure, never through a shuffle."""
    from cs598vectordb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = spark.createDataFrame(
        [(0, "e", "s", 9)], "rank int, left string, right string, pair_count long"
    )
    plan = plan_of(tk.bpe_encode_stats(docs, merges))
    assert plan.count("MapInPandas") == 2, plan
    assert "Exchange" not in plan, plan
    assert "Join" not in plan and "CartesianProduct" not in plan


def test_bpe_train_min_word_count_guard(spark):
    """The 100-TB driver-collect guard (min_word_count): singleton noise
    words (URL/hash-shaped junk) are dropped BEFORE the collect, and
    the classic corpus's hand-computed merge sequence is unchanged
    under the guard — head pair mass dominates on natural text."""
    noise = " ".join(f"https://x{i}.example/{i:08x}" for i in range(50))
    docs = spark.createDataFrame(
        [(0, CLASSIC), (1, noise)], "doc_id long, text string"
    )
    guarded = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in tk.bpe_train(docs, n_merges=5, min_word_count=2)
        .orderBy("rank")
        .collect()
    ]
    clean = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in tk.bpe_train(
            spark.createDataFrame([(0, CLASSIC)], "doc_id long, text string"),
            n_merges=5,
        )
        .orderBy("rank")
        .collect()
    ]
    assert guarded == clean


def test_bpe_encode_heap_matches_scan(spark, sf_dir):
    """The rank-indexed heap encoder must match the r12 per-step rescan
    form EXACTLY — checked exhaustively over every distinct word of
    the sf fixture under a 200-merge trained table, plus the classic
    corpus words and adjacency edge cases ('aaaa' non-overlap)."""
    from cs598vectordb_spark.operators.tokenizer import (
        BPE_END,
        _encode_token_count,
        _merge_word,
    )
    from cs598vectordb_spark.sources.tables import load_table

    def scan_encode(word: str, rank_of: dict, pair_at: dict) -> int:
        syms = list(word) + [BPE_END]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rk = rank_of.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best = rk
            if best is None:
                break
            pl, pr = pair_at[best]
            syms = _merge_word(syms, pl, pr, pl + pr)
        return len(syms)

    docs = load_table(spark, sf_dir, "documents")
    merges = tk.bpe_train(docs, n_merges=200)
    rank_of = {
        (r["left"], r["right"]): int(r["rank"]) for r in merges.collect()
    }
    pair_at = {k: p for p, k in rank_of.items()}
    vocab = [
        r.word
        for r in docs.select(
            F.explode(tk._token_col("text")).alias("word")
        ).distinct().collect()
    ]
    extra = ["low", "lower", "newest", "widest", "aaaa", "a", "", "lowest"]
    mism = [
        w
        for w in vocab + extra
        if _encode_token_count(w, rank_of) != scan_encode(w, rank_of, pair_at)
    ]
    assert not mism, mism[:10]


def test_bpe_token_stats_queued_oracle(spark, sf_dir):
    """Dress rehearsal for the QUEUED bpe_token_stats oracle
    (registry.queued_oracle_sql, the r14 promotion candidate): the
    Spark stats and the DuckDB twin — per-word token counts joined
    from the engine's exported (word → n_tokens) map, aggregation and
    rounded ratios replayed relationally — must agree row for row at
    sf0.001 under the driver's sorted-columns value comparison."""
    import duckdb

    import __spark_entry__ as em
    from cs598vectordb_spark.queries_text import (
        _export_bpe_token_map,
        bpe_token_stats_oracle_sql,
    )

    sdf = em.queries()["bpe_token_stats"](spark, sf_dir)
    path = _export_bpe_token_map(spark, sf_dir)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    res = con.execute(bpe_token_stats_oracle_sql(path))
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows) and len(srows) > 0

    def canon(rows, cols):
        order = sorted(range(len(cols)), key=lambda i: cols[i])

        def c(v):
            return f"{v:.6f}" if isinstance(v, float) else str(v)

        return sorted(tuple(c(r[i]) for i in order) for r in rows)

    assert canon(srows, scols) == canon(drows, dcols)
