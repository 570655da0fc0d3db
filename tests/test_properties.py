"""Property-based tests (hypothesis) — the reference has none (SURVEY §5);
these pin algebraic contracts on randomized inputs, not fixtures.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from cs598vectordb_spark.operators.asof import asof_join
from cs598vectordb_spark.operators.skew import salted_agg
from cs598vectordb_spark.sources.vecfiles import _decode_blob, _encode_rows

# ---------------------------------------------------------- pure (fast)


@given(
    st.lists(
        st.lists(st.floats(width=32, allow_nan=False, allow_infinity=False), min_size=1, max_size=8),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_fvecs_codec_roundtrip(rows):
    blob = _encode_rows([np.asarray(r, dtype=np.float32) for r in rows], "float32")
    back = _decode_blob(blob, "float32")
    assert len(back) == len(rows)
    for orig, got in zip(rows, back):
        assert np.array_equal(np.asarray(orig, dtype=np.float32), got)


@given(
    st.lists(
        st.lists(st.integers(-(2**31), 2**31 - 1), min_size=1, max_size=8),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=100, deadline=None)
def test_ivecs_codec_roundtrip(rows):
    blob = _encode_rows([np.asarray(r, dtype=np.int32) for r in rows], "int32")
    back = _decode_blob(blob, "int32")
    assert [list(b) for b in back] == rows


# ---------------------------------------------------------- spark (slow)

_event = st.tuples(
    st.integers(0, 3),  # key
    st.integers(0, 10_000),  # seconds offset
    st.integers(0, 1000),  # payload
)


@given(st.lists(_event, min_size=1, max_size=25), st.lists(_event, min_size=0, max_size=25))
@settings(max_examples=8, deadline=None)
def test_asof_join_matches_bruteforce(lrows, rrows):
    spark = _spark()
    t0 = dt.datetime(2024, 1, 1)
    mk = lambda rows, payload: [
        (k, t0 + dt.timedelta(seconds=s), p) for k, s, p in rows
    ]
    # unique (key, ts) per side — duplicate-ts tie order is unspecified
    lrows = list({(k, s): (k, s, p) for k, s, p in lrows}.values())
    rrows = list({(k, s): (k, s, p) for k, s, p in rrows}.values())
    left = spark.createDataFrame(mk(lrows, "lv"), "user_id long, ts timestamp, lv long")
    right = spark.createDataFrame(
        mk(rrows, "rv"), "user_id long, ts timestamp, rv long"
    ) if rrows else spark.createDataFrame([], "user_id long, ts timestamp, rv long")

    got = {
        (r["user_id"], r["ts"]): r["rv_r"]
        for r in asof_join(left, right, by="user_id", ts_col="ts", right_cols=["rv"]).collect()
    }
    for k, s, p in lrows:
        lts = t0 + dt.timedelta(seconds=s)
        matches = [(s2, p2) for k2, s2, p2 in rrows if k2 == k and s2 <= s]
        expect = max(matches)[1] if matches else None
        assert got[(k, lts)] == expect, (k, s, matches)


@given(st.lists(_event, min_size=1, max_size=40))
@settings(max_examples=8, deadline=None)
def test_salted_agg_equals_direct(rows):
    spark = _spark()
    df = spark.createDataFrame(rows, "user_id long, sec long, payload long")
    got = {
        r["user_id"]: (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            key="user_id",
            aggs={"n": ("count", "payload"), "s": ("sum", "payload"), "mx": ("max", "sec")},
            n_salts=4,
            salt_src="sec",
        ).collect()
    }
    from collections import defaultdict

    exp = defaultdict(lambda: [0, 0, None])
    for k, s, p in rows:
        e = exp[k]
        e[0] += 1
        e[1] += p
        e[2] = s if e[2] is None else max(e[2], s)
    assert got == {k: tuple(v) for k, v in exp.items()}


def _spark():
    from cs598vectordb_spark.session import get_spark

    return get_spark("tests", cpus=8)


_kv = st.tuples(st.integers(0, 30), st.integers(-100, 100))


@given(st.lists(_kv, min_size=0, max_size=20), st.lists(_kv, min_size=0, max_size=20))
@settings(max_examples=8, deadline=None)
def test_merge_upsert_matches_dict_semantics(trows, srows):
    """MERGE == dict.update(): source wins on matched ids, target rows
    survive otherwise, inserts appear — for ANY id overlap pattern."""
    from cs598vectordb_spark.operators.updates import merge_upsert

    spark = _spark()
    trows = list({k: (k, v) for k, v in trows}.values())  # unique ids per side
    srows = list({k: (k, v) for k, v in srows}.values())
    schema = "vec_id long, label long"
    target = spark.createDataFrame(trows, schema) if trows else spark.createDataFrame([], schema)
    source = spark.createDataFrame(srows, schema) if srows else spark.createDataFrame([], schema)
    got = {r.vec_id: (r.label, r._merge_action) for r in merge_upsert(target, source, "vec_id").collect()}
    exp = {}
    for k, v in trows:
        exp[k] = (v, "kept")
    for k, v in srows:
        exp[k] = (v, "updated" if any(k == tk for tk, _ in trows) else "inserted")
    assert got == exp


@given(
    st.lists(st.tuples(st.integers(0, 10_000), st.integers(0, 40)), min_size=1, max_size=30),
    st.integers(1, 5),
)
@settings(max_examples=8, deadline=None)
def test_pack_sequences_contiguous_for_sparse_ids(rows, parts):
    """Offsets tile the token stream in doc_id order for ARBITRARY sparse
    id sets and any block count — the distributed prefix sum has no
    dense-id or balanced-block assumption."""
    from cs598vectordb_spark.operators.textops import pack_sequences

    spark = _spark()
    uniq = {i: n for i, n in rows}
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n) if n else "") for i, n in uniq.items()],
        "doc_id long, text string",
    )
    out = sorted(pack_sequences(docs, seq_len=7, parts=parts).collect(), key=lambda r: r.doc_id)
    off = 0
    for r in out:
        assert r.start_offset == off, (r.doc_id, r.start_offset, off)
        assert r.seq_id == off // 7
        assert r.n_seqs == (off + r.n_tokens - 1) // 7 - off // 7 + 1
        off += r.n_tokens
    assert len(out) == len(uniq)


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_bmp_codec_roundtrip_property(h, w, seed):
    """Real BMP codec: encode→decode is the identity for every raster
    shape (row padding varies with w % 4) and every pixel content."""
    from cs598vectordb_spark.operators.multimodal import decode_bmp, encode_bmp

    px = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@given(
    st.integers(min_value=1, max_value=500),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=100, deadline=None)
def test_wav_codec_roundtrip_property(n, channels, rate, seed):
    """Real WAV codec: encode→decode preserves every sample and the
    declared rate for mono and stereo PCM16."""
    from cs598vectordb_spark.operators.multimodal import decode_wav, encode_wav

    s = np.random.default_rng(seed).integers(
        -(2**15), 2**15, (n, channels), dtype=np.int16
    )
    out, got_rate = decode_wav(encode_wav(s, rate))
    assert got_rate == rate and np.array_equal(out, s)


@given(st.integers(5, 40), st.integers(20, 45))
@settings(max_examples=3, deadline=None)
def test_lsh_cap_bounds_pairs_and_reports_overflow(cap, n_boiler):
    """Adversarial skew (VERDICT r7 item 7): one boilerplate text shared
    by ~30% of the corpus puts every boilerplate doc in the same bucket
    in EVERY band. For any cap below the boilerplate mass:
    * capped pair generation admits only pairs that co-occur in some
      bucket of size <= cap — the boilerplate O(n^2) blowup is gone;
    * the over-cap mass appears in lsh_bucket_overflow (bucket_size =
      boilerplate mass, dropped_pairs = C(mass, 2)) — reported, never
      silently dropped;
    * capped pairs are a subset of exhaustive pairs (the cap only
      removes candidates, never invents them)."""
    from cs598vectordb_spark.operators.dedup import (
        lsh_bucket_overflow,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    assume(cap < n_boiler)
    spark = _spark()
    n_docs = 100
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (
            i,
            boiler
            if i < n_boiler
            else f"unique document number {i} with its own words {i * 7} {i * 13}",
        )
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(docs, 16).cache()

    exhaustive = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, 8, 2).collect()}
    capped = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, 8, 2, bucket_cap=cap).collect()
    }
    overflow = lsh_bucket_overflow(sigs, 8, 2, bucket_cap=cap).collect()
    sigs.unpersist()

    # subset: the cap never invents candidates
    assert capped <= exhaustive
    # the boilerplate quadratic mass is out: no capped pair joins two
    # boilerplate docs (their only collisions are size-n_boiler buckets)
    boiler_pairs = {p for p in capped if p[0] < n_boiler and p[1] < n_boiler}
    assert not boiler_pairs
    # pair-count bound: every surviving bucket has <= cap members, so
    # candidate pairs <= bands * C(cap, 2) worst-case
    assert len(capped) <= 8 * cap * (cap - 1) // 2
    # over-cap mass is REPORTED: every band's boilerplate bucket (>=
    # n_boiler members — identical text collides in every band; short
    # unique docs may degenerate-collide into it too) shows up with its
    # avoided pair count
    big = [r for r in overflow if r.bucket_size >= n_boiler]
    assert len(big) >= 8
    for r in overflow:
        assert r.dropped_pairs == r.bucket_size * (r.bucket_size - 1) // 2


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["eq", "gt", "ge", "lt", "le", "notnull"]),
            st.integers(min_value=-5, max_value=600),
        ),
        max_size=6,
    ),
    st.integers(min_value=0, max_value=600),
)
@settings(max_examples=200, deadline=None)
def test_fvecs_pushed_bounds_are_sound(filters, v):
    """Pruning-bounds soundness (model-based): for ANY conjunction of
    pushed vec_id filters, every id that satisfies the conjunction must
    lie inside the [id_lo, id_hi] window pushFilters derives — the
    property that guarantees shard pruning can never drop a matching
    row. (Completeness is not required: looser bounds only scan more.)"""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    from cs598vectordb_spark.sources.fvecs_datasource import FvecsReader

    mk = {
        "eq": lambda x: EqualTo(("vec_id",), x),
        "gt": lambda x: GreaterThan(("vec_id",), x),
        "ge": lambda x: GreaterThanOrEqual(("vec_id",), x),
        "lt": lambda x: LessThan(("vec_id",), x),
        "le": lambda x: LessThanOrEqual(("vec_id",), x),
    }

    class _NotNull:  # value-less filter, like IsNotNull
        attribute = ("vec_id",)

    objs = [(_NotNull() if k == "notnull" else mk[k](x)) for k, x in filters]

    def sat(val) -> bool:
        ops = {"eq": val.__eq__, "gt": val.__gt__, "ge": val.__ge__,
               "lt": val.__lt__, "le": val.__le__, "notnull": lambda _: True}
        return all(ops[k](x) for k, x in filters)

    r = FvecsReader({"path": "/nonexistent"})
    r.pushFilters(objs)
    if sat(v):
        assert r.id_lo is None or r.id_lo <= v, (filters, v, r.id_lo)
        assert r.id_hi is None or v <= r.id_hi, (filters, v, r.id_hi)


def test_zvalue_matches_python_morton(spark):
    """The codegen Morton interleave must equal a direct Python
    reference bit-for-bit over the full 8-bit grid sample — and be
    injective on it (distinct cells, distinct z)."""
    import random

    from cs598vectordb_spark.operators.layout import zvalue

    rng = random.Random(11)
    pairs = [(rng.randrange(256), rng.randrange(256)) for _ in range(1000)]
    df = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", zvalue("a", "b", 8)).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == ref(a, b), (a, b, z)
    assert len(set(got.values())) == len(got)  # injective on the grid


# --------------------------------------------------- repetition filters

_rep_word = st.text(alphabet="abc", min_size=1, max_size=3)
_rep_sentence = st.lists(_rep_word, min_size=1, max_size=6).map(" ".join)


@given(st.lists(_rep_sentence, min_size=1, max_size=10))
@settings(max_examples=8, deadline=None)
def test_repetition_scores_match_counter_reference(sents):
    """The one-pass sorted-array aggregates in repetition_scores agree
    with a collections.Counter reference on arbitrary sentence lists —
    the exclude-first-occurrence dup fractions and the mode word share
    (the known-documents pin covers fixed cases; this covers the run-
    length bookkeeping on adversarial duplicate structures)."""
    from collections import Counter

    from cs598vectordb_spark.operators.textops import repetition_scores

    spark = _spark()
    text = ". ".join(sents) + "."
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = repetition_scores(docs).collect()[0]

    sc = Counter(sents)
    n = len(sents)
    chars = sum(len(s) for s in sents)
    dup_chars = sum((c - 1) * len(s) for s, c in sc.items() if c > 1)
    words = Counter(w for s in sents for w in s.split())
    n_w = sum(words.values())

    assert (got.n_sents, got.n_words) == (n, n_w)
    assert abs(got.dup_sent_frac - (n - len(sc)) / n) <= 5.1e-5
    assert abs(got.dup_sent_char_frac - dup_chars / max(chars, 1)) <= 5.1e-5
    assert abs(got.top_word_frac - max(words.values()) / n_w) <= 5.1e-5

    # the r11 n-gram bank against the same Counter reference: top-gram
    # char products (tie -> lexicographically smallest gram, clamped to
    # 1.0) and distinct-position duplicate coverage
    from cs598vectordb_spark.operators.textops import (
        GOPHER_DUP_NGRAM_THRESHOLDS,
        GOPHER_TOP_NGRAM_THRESHOLDS,
    )

    seq = [w for s in sents for w in s.split()]
    wc = sum(len(w) for w in seq)

    def ref_top(ng: int) -> float:
        grams = [" ".join(seq[i : i + ng]) for i in range(len(seq) - ng + 1)]
        if not grams:
            return 0.0
        gc = Counter(grams)
        m = max(gc.values())
        g = min(x for x, c in gc.items() if c == m)
        return min(m * (len(g) - (ng - 1)) / max(wc, 1), 1.0)

    def ref_dup(ng: int) -> float:
        grams = [" ".join(seq[i : i + ng]) for i in range(len(seq) - ng + 1)]
        gc = Counter(grams)
        cov: set[int] = set()
        for i, g in enumerate(grams):
            if gc[g] > 1:
                cov.update(range(i, i + ng))
        return sum(len(seq[i]) for i in cov) / max(wc, 1)

    for ng in GOPHER_TOP_NGRAM_THRESHOLDS:
        assert abs(got[f"top_{ng}gram_char_frac"] - ref_top(ng)) <= 5.1e-5, ng
    for ng in GOPHER_DUP_NGRAM_THRESHOLDS:
        assert abs(got[f"dup_{ng}gram_char_frac"] - ref_dup(ng)) <= 5.1e-5, ng


@given(
    st.lists(  # per-tenant frame sizes (0-size frames excluded: a
        st.integers(1, 12),  # tenant always submits at least one query)
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 30),  # max_batch_queries cap
)
@settings(max_examples=60, deadline=None)
def test_dynamic_batcher_partition_property(sizes, cap):
    """DynamicBatcher is pure slot arithmetic: for ANY set of
    concurrently-submitted tenant frames and ANY query cap, each
    tenant gets exactly the rows a solo probe of its frame would
    produce, no tenant sees another tenant's q_ids, and every submit
    is answered. The fake probe derives vec_id from the query PAYLOAD
    (slot-invariant), honoring the documented contract that q_id is an
    opaque label — the first draft derived it from q_id and this very
    test falsified it at the first multi-tenant chunk (slot ≥ 1 sees
    remapped ids): the contract now lives in DynamicBatcher's
    docstring because hypothesis found it."""
    from concurrent.futures import ThreadPoolExecutor

    import pandas as pd

    from cs598vectordb_spark.operators.serving import DynamicBatcher

    def fake_probe(qpdf):
        key = qpdf["embedding"].map(lambda v: int(v[0]))  # payload, not q_id
        return pd.DataFrame(
            {
                "q_id": qpdf["q_id"].astype("int64"),
                "rank": 1,
                "vec_id": key.astype("int64") * 3 + 1,
                "dist": 0.25,
            }
        )

    frames = []
    start = 0
    for n in sizes:  # disjoint q_id ranges per tenant; payload echoes id
        frames.append(
            pd.DataFrame(
                {
                    "q_id": range(start, start + n),
                    "embedding": [[float(start + j)] for j in range(n)],
                }
            )
        )
        start += n

    b = DynamicBatcher(fake_probe, max_wait_ms=30.0, max_batch_queries=cap)
    with ThreadPoolExecutor(max_workers=len(frames)) as pool:
        got = list(pool.map(b.submit, frames))

    assert b.n_submits == len(frames)
    assert 1 <= b.n_probe_calls <= len(frames)
    for f, g in zip(frames, got):
        assert sorted(g["q_id"]) == sorted(f["q_id"])
        assert list(g["vec_id"]) == [int(q) * 3 + 1 for q in g["q_id"]]


# ------------------------------------------------- distributed kNN join

_vec3 = st.lists(
    st.integers(-40, 40).map(lambda i: i / 5.0),
    min_size=3,
    max_size=3,
)


@given(st.lists(_vec3, min_size=4, max_size=18), st.integers(2, 7))
@settings(max_examples=6, deadline=None)
def test_knn_join_full_probe_matches_bruteforce_property(vecs, nlist):
    """Algebraic contract of the distributed kNN join on ARBITRARY
    vector sets (not fixtures): at full probe the cogrouped cell join
    equals the numpy brute force under the shared (6-dp-rounded cosine
    desc, vec_id asc) comparator — including degenerate geometries
    (duplicate vectors, collinear directions, nlist above the distinct
    point count) that hand-written fixtures underrepresent."""
    import pandas as pd

    from cs598vectordb_spark.operators.knnjoin import knn_join

    spark = _spark()
    ids = np.arange(len(vecs), dtype=np.int64)
    X = np.asarray(vecs, dtype=np.float64)
    assume(np.all(np.linalg.norm(X, axis=1) > 1e-6))
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]})
    ).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    q = emb.selectExpr("vec_id as q_id", "embedding")
    k = 3
    got = sorted(
        (r.q_id, r.rank, r.vec_id, r.cos_sim)
        for r in knn_join(
            q, emb, k=k, nlist=nlist, metric="cosine", exclude_self=True
        ).collect()
    )
    # brute force on the FLOAT32-cast vectors (what the engine scored)
    Xf = X.astype(np.float32).astype(np.float64)
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    want = []
    for j in range(len(ids)):
        s = S[:, j].copy()
        s[j] = -np.inf
        order = np.lexsort((ids, -s))[: min(k, len(ids) - 1)]
        want.extend(
            (int(ids[j]), r + 1, int(ids[o]), float(s[o]))
            for r, o in enumerate(order)
        )
    assert got == sorted(want)
