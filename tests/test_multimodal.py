"""Multimodal binary-column surface: plumbing is real, codecs are stubbed."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cs598vectordb_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_features,
    media_table,
)
from cs598vectordb_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return media_table(load_table(spark, sf_dir, "documents")).cache()


def test_payload_bytes_match_reference_md5(spark, sf_dir, media):
    doc = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") == 5).first()
    row = media.filter(F.col("doc_id") == 5).first()
    reps = 1 + 5 % 4
    expect = b"".join(
        hashlib.md5(f"{doc['text']}:{i}".encode()).digest() for i in range(1, reps + 1)
    )
    assert bytes(row["payload"]) == expect
    assert row["meta"]["n_frames"] == len(expect) // 4
    assert row["kind"] == "video"  # 5 % 3 == 2


def test_features_kernel(media):
    feats = {r["doc_id"]: r for r in media_features(media).collect()}
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(feats) == set(payloads)
    for did, p in payloads.items():
        f = feats[did]
        assert f["n_bytes"] == len(p)
        assert f["first_byte"] == p[0]
        assert f["byte_sum"] == sum(p)
        assert f["checksum"] == sum(p) % 997


def test_frame_sample_stride(media):
    rows = frame_sample(media, stride=2, frame_bytes=4).collect()
    assert rows, "video rows exist"
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    payloads = {
        r["doc_id"]: bytes(r["payload"])
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert set(by_doc) == set(payloads)
    did, p = next(iter(payloads.items()))
    got = {r["frame_idx"]: r["frame_sum"] for r in by_doc[did]}
    n_frames = len(p) // 4
    assert sorted(got) == list(range(0, n_frames, 2))
    for i in got:
        assert got[i] == sum(p[4 * i : 4 * i + 4])


def test_decode_media_dispatch():
    """Image/audio decode for REAL (BMP/WAV — invalid bytes are a codec
    ValueError, not a stub); only compressed video remains stubbed."""
    with pytest.raises(ValueError, match="not a BMP"):
        decode_media(b"\x00", "image")
    with pytest.raises(ValueError, match="not a WAV"):
        decode_media(b"\x00", "audio")
    with pytest.raises(NotImplementedError, match="not installed"):
        decode_media(b"\x00", "video")


def test_bmp_wav_codecs_roundtrip_exact():
    """The real stdlib codecs must be lossless: BMP encode→decode is
    pixel-exact including odd-width row padding and the top-down variant;
    WAV PCM16 mono/stereo round-trips sample-exact."""
    import numpy as np

    from cs598vectordb_spark.operators.multimodal import (
        decode_bmp,
        decode_media,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    rng = np.random.default_rng(3)
    for h, w in ((4, 8), (5, 7), (1, 1), (3, 2), (2, 31)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px)), px), (h, w)
        assert np.array_equal(decode_media(encode_bmp(px), "image"), px)
    s = rng.integers(-(2**15), 2**15 - 1, (500, 2), dtype=np.int16)
    out, rate = decode_wav(encode_wav(s, 44100))
    assert rate == 44100 and np.array_equal(out, s)
    mono, rate = decode_media(encode_wav(s[:, 0], 8000), "audio")
    assert rate == 8000 and np.array_equal(mono[:, 0], s[:, 0])
    import pytest

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00\x01", "video")


def test_media_decode_bmp_query(spark, sf_dir):
    """The registered round-trip query: every doc gets one row, the
    checksum column equals (sum_r+sum_g+sum_b) % 997 (i.e. the decoded
    pixels ARE the tiled payload bytes — codec lossless end-to-end)."""
    from pyspark.sql import functions as F

    from cs598vectordb_spark.operators.multimodal import media_decode_image, media_table
    from cs598vectordb_spark.sources.tables import load_table

    media = media_table(load_table(spark, sf_dir, "documents"))
    out = media_decode_image(media).cache()
    assert out.count() == media.count()
    bad = out.filter(
        (F.col("sum_r") + F.col("sum_g") + F.col("sum_b")) % 997 != F.col("px_checksum")
    ).count()
    assert bad == 0
    assert out.filter((F.col("width") != 8) | (F.col("height") != 4)).count() == 0
    out.unpersist()


def test_media_decode_wav_value_exact(media):
    """Value-exact pure-Python pin for the RETIRED media_decode_wav
    oracle (r16 slot budget, near-duplicate-evidence class: the WAV and
    BMP round-trips tile the SAME md5 payload bytes through the
    engine's own codec — media_decode_bmp stays oracle-graded, and the
    WAV codec's losslessness is separately pinned by
    test_bmp_wav_codecs_roundtrip_exact; funding the knn_join
    promotion): every (n_samples, sample_rate, sum_amp, min_amp,
    max_amp) row is recomputed from the payload bytes directly —
    byte (2t mod nb) | byte (2t+1 mod nb) << 8, two's-complement
    int16 — exactly the retired DuckDB twin's arithmetic."""
    from cs598vectordb_spark.operators.multimodal import media_decode_audio

    got = {
        r["doc_id"]: (
            r["n_samples"], r["sample_rate"], r["sum_amp"],
            r["min_amp"], r["max_amp"],
        )
        for r in media_decode_audio(media).collect()
    }
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(got) == set(payloads) and len(got) > 0
    for did, p in payloads.items():
        nb = len(p)
        samples = []
        for t in range(64):
            v = p[(2 * t) % nb] | (p[(2 * t + 1) % nb] << 8)
            samples.append(v - 65536 if v >= 32768 else v)
        want = (64, 8000, sum(samples), min(samples), max(samples))
        assert got[did] == want, (did, got[did], want)


def test_media_decode_ppm_value_exact(media):
    """Value-exact pure-Python pin for the RETIRED media_decode_ppm
    oracle (r17 slot budget, near-duplicate-evidence class: PPM is the
    same netpbm decoder as the r9-retired-and-pinned media_decode_pgm
    modulo the magic byte and channel count; funding the
    hybrid_rrf_search promotion): every (width, height, sum_r, sum_g,
    sum_b, min_px, max_px) row is recomputed from the payload bytes
    directly — r/g/b at bytes (3t)/(3t+1)/(3t+2) mod nb for t in
    0..31, order stats over the full 96-byte tiled raster — exactly
    the retired DuckDB twin's arithmetic. The hash-equivalent equality
    holds only because the P6 encode→file→decode round-trip is
    pixel-exact."""
    from cs598vectordb_spark.operators.multimodal import media_decode_ppm

    got = {
        r["doc_id"]: (
            r["width"], r["height"], r["sum_r"], r["sum_g"], r["sum_b"],
            r["min_px"], r["max_px"],
        )
        for r in media_decode_ppm(media).collect()
    }
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(got) == set(payloads) and len(got) > 0
    for did, p in payloads.items():
        nb = len(p)
        r = [p[(3 * t) % nb] for t in range(32)]
        g = [p[(3 * t + 1) % nb] for t in range(32)]
        b = [p[(3 * t + 2) % nb] for t in range(32)]
        allb = [p[k % nb] for k in range(96)]
        want = (8, 4, sum(r), sum(g), sum(b), min(allb), max(allb))
        assert got[did] == want, (did, got[did], want)


def test_pnm_codecs_roundtrip_exact():
    """The netpbm codecs must be lossless for arbitrary 8-bit rasters,
    and the header parser must accept whitespace runs + #-comments."""
    import numpy as np
    import pytest

    from cs598vectordb_spark.operators.multimodal import (
        decode_pgm,
        decode_ppm,
        encode_pgm,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    for h, w in ((4, 8), (5, 7), (1, 1), (3, 2), (2, 31)):
        px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_ppm(encode_ppm(px)), px), (h, w)
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        assert np.array_equal(decode_pgm(encode_pgm(g)), g), (h, w)

    # header variants a foreign netpbm writer may emit: comments between
    # tokens, CRLF separators, multi-space runs
    px = rng.integers(0, 256, (2, 3, 3), dtype=np.uint8)
    raster = px.tobytes()
    commented = b"P6\n# made by a foreign tool\n3 2\n# maxval next\n255\n" + raster
    assert np.array_equal(decode_ppm(commented), px)
    crlf = b"P6\r\n3   2\r\n255\n" + raster
    assert np.array_equal(decode_ppm(crlf), px)

    # malformed inputs raise ValueError, never struct/index errors
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n3 2\n255\n" + raster)  # wrong magic for PPM
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n65535\n" + raster)  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n255\n" + raster[:-1])  # truncated raster
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3 x\n255\n" + raster)  # non-numeric dim
    with pytest.raises(ValueError):
        decode_pgm(b"P5\n0 2\n255\n")  # zero dimension
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n255")  # EOF where whitespace must be
    # ADVICE: a non-whitespace byte after maxval must raise, not silently
    # shift the raster by one
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n3 2\n255X" + raster)


def test_pgm_stats_match_catalyst_bytes(media):
    """Retired-oracle pin (r9): the PGM kernel's decoded stats must equal
    an INDEPENDENT Catalyst recomputation from the payload bytes (hex
    string arithmetic, no Python) — the same cross-engine evidence the
    DuckDB byte oracle provided, now in-process. Tiling rule: gray pixel
    t (0..31) is payload byte (t % n_bytes)."""
    from cs598vectordb_spark.operators.multimodal import media_decode_pgm

    got = media_decode_pgm(media)
    bytes_arr = (
        "transform(sequence(0, 31), t -> "
        "CAST(conv(substring(hex(payload), 2 * (t % length(payload)) + 1, 2), 16, 10) AS INT))"
    )
    want = media.select(
        "doc_id",
        F.lit(8).alias("width"),
        F.lit(4).alias("height"),
        F.expr(f"aggregate({bytes_arr}, 0L, (a, x) -> a + x)").alias("sum_px"),
        F.expr(f"array_min({bytes_arr})").alias("min_px"),
        F.expr(f"array_max({bytes_arr})").alias("max_px"),
        F.expr(f"aggregate({bytes_arr}, 0L, (a, x) -> a + x) % 997").alias(
            "px_checksum"
        ),
    )
    assert got.count() == media.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_resize_plan_matches_metadata(media):
    """Retired-oracle pin (r9): resize planning is closed-form arithmetic
    over (meta, payload length); equality against a direct expression
    recomputation replaces the retired DuckDB oracle."""
    from cs598vectordb_spark.operators.multimodal import resize_plan

    got = resize_plan(media, scale=2)
    want = media.filter(F.col("kind") == "image").select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        (F.col("meta.width") / 2).cast("int").alias("new_width"),
        (F.col("meta.height") / 2).cast("int").alias("new_height"),
        F.length("payload").alias("n_bytes"),
    )
    # and the metadata itself obeys the synthesis closed form
    bad_meta = media.filter(
        (F.col("kind") == "image")
        & (
            (F.col("meta.width") != 32 * (1 + F.col("doc_id") % 8))
            | (F.col("meta.height") != 32 * (1 + F.col("doc_id") % 5))
        )
    ).count()
    assert bad_meta == 0
    assert got.count() == media.filter(F.col("kind") == "image").count() > 0
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_media_decode_pnm_queries(spark, sf_dir):
    """The registered PNM round-trip queries: one row per doc; the PPM
    channel sums reconcile with the PGM stats where they overlap (both
    tile the same payload bytes), and min<=max within 0..255."""
    from pyspark.sql import functions as F

    from cs598vectordb_spark.operators.multimodal import (
        media_decode_pgm,
        media_decode_ppm,
        media_table,
    )
    from cs598vectordb_spark.sources.tables import load_table

    media = media_table(load_table(spark, sf_dir, "documents"))
    n = media.count()
    ppm = media_decode_ppm(media).cache()
    pgm = media_decode_pgm(media).cache()
    assert ppm.count() == n and pgm.count() == n
    assert ppm.filter((F.col("width") != 8) | (F.col("height") != 4)).count() == 0
    assert (
        ppm.filter(
            (F.col("min_px") < 0) | (F.col("max_px") > 255)
            | (F.col("min_px") > F.col("max_px"))
        ).count()
        == 0
    )
    assert pgm.filter(F.col("px_checksum") != F.col("sum_px") % 997).count() == 0
    ppm.unpersist()
    pgm.unpersist()


def test_audio_frame_features_closed_form(spark, sf_dir):
    """Evidence pin for the rows-only media_audio_frames entry: exact
    RMS/ZCR on synthesized payloads whose WAV round-trip yields a known
    square wave and known silence, plus fixture invariants (frames per
    doc, bounds, the silence gate)."""
    import numpy as np

    from cs598vectordb_spark.operators.multimodal import (
        audio_frame_features,
        media_table,
    )

    # payloads whose little-endian int16 view is (a) a ±A square wave,
    # (b) all zeros; 64 samples = 128 bytes, so _tile_bytes is identity
    A = 12345
    sq = np.tile(np.array([A, -A], dtype="<i2"), 32).tobytes()
    silence = np.zeros(64, dtype="<i2").tobytes()
    media = spark.createDataFrame(
        [(0, bytearray(sq)), (1, bytearray(silence))], "doc_id long, payload binary"
    )
    got = audio_frame_features(media).collect()
    by = {}
    for r in got:
        by.setdefault(r.doc_id, []).append(r)
    # 64 samples, frame 16 hop 8 -> 7 frames each
    assert len(by[0]) == len(by[1]) == 7
    for r in by[0]:
        # |x| = A everywhere -> rms = A exactly; signs alternate every
        # sample -> 15 transitions over 15 boundaries -> zcr = 1.0
        assert r.rms == float(A)
        assert r.zcr == 1.0
        assert r.active  # 12345 > 8192 energy gate
    for r in by[1]:
        assert (r.rms, r.zcr, r.active) == (0.0, 0.0, False)

    corpus = media_table(load_table(spark, sf_dir, "documents"))
    out = audio_frame_features(corpus)
    n_docs = corpus.count()
    assert out.count() == 7 * n_docs  # every payload tiles to 64 samples
    assert out.filter((F.col("zcr") < 0) | (F.col("zcr") > 1)).count() == 0
    assert out.filter(F.col("rms") < 0).count() == 0
