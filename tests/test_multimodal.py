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


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError, match="not installed"):
        decode_media(b"\x00", "image")
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "video")
