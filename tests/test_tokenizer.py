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
