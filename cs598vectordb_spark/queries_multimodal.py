"""Multimodal-surface queries()/oracle_sql() entries.

The media table is synthesized deterministically from `documents`
(operators.multimodal.media_table), so every oracle rebuilds the identical
payload BYTES as a hex string in DuckDB (`md5` concat) and re-derives the
kernel outputs with hex-pair arithmetic — a byte-exact check that the
binary column plumbing (Arrow batches through mapInPandas) is lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cs598vectordb_spark.operators.multimodal import (
    frame_sample,
    media_dedup,
    media_features,
    media_summary,
    media_table,
    resize_plan,
)
from cs598vectordb_spark.registry import register
from cs598vectordb_spark.sources.tables import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_table(load_table(spark, sf_dir, "documents"))


# hex of the synthesized payload, as a CTE over documents
_MEDIA_HEX = """
media AS (
  SELECT doc_id,
         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         array_to_string(list_transform(generate_series(1::BIGINT, 1 + doc_id % 4),
                                        i -> md5(text || ':' || i)), '') AS hex
  FROM documents
)
"""


def _hexval(pos: str) -> str:
    """Value of the hex digit at 1-based string position `pos`."""
    c = f"substr(hex, ({pos})::INT, 1)"
    return f"(CASE WHEN {c} BETWEEN '0' AND '9' THEN ascii({c}) - 48 ELSE ascii({c}) - 87 END)"


def _byte(k: str) -> str:
    """Value of the 1-based `k`-th payload byte from its two hex digits."""
    return f"({_hexval(f'2*({k})-1')} * 16 + {_hexval(f'2*({k})')})"


@register(
    "media_features",
    f"""
WITH {_MEDIA_HEX},
feat AS (
  SELECT doc_id, kind,
         length(hex) // 2 AS n_bytes,
         {_byte("1")} AS first_byte,
         list_sum(list_transform(generate_series(1::BIGINT, length(hex) // 2),
                                 k -> {_byte("k")})) AS byte_sum
  FROM media
)
SELECT doc_id, kind, CAST(n_bytes AS INTEGER) AS n_bytes,
       CAST(first_byte AS INTEGER) AS first_byte,
       CAST(byte_sum AS BIGINT) AS byte_sum,
       CAST(byte_sum % 997 AS BIGINT) AS checksum
FROM feat
""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-decode feature extraction over the binary payload (Arrow
    mapInPandas kernel; real-codec slot documented in decode_media)."""
    return media_features(_media(spark, sf_dir))


@register("media_audio_frames")
def q_media_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed audio features through the real WAV round-trip: per hop
    window, RMS energy + zero-crossing rate + a fixed energy-VAD gate —
    the windowing a speech-data pipeline runs before voice-activity /
    quality filtering. Rows-only (sample framing has no SQL twin at
    reasonable cost); square-wave/silence closed forms pinned in
    tests/test_multimodal.py::test_audio_frame_features_closed_form."""
    from cs598vectordb_spark.operators.multimodal import audio_frame_features

    return audio_frame_features(_media(spark, sf_dir))


@register(
    "media_frame_sample",
    f"""
WITH {_MEDIA_HEX}
SELECT doc_id, frame_idx,
       CAST({_byte("4*frame_idx+1")} + {_byte("4*frame_idx+2")}
          + {_byte("4*frame_idx+3")} + {_byte("4*frame_idx+4")} AS BIGINT) AS frame_sum
FROM media, UNNEST(generate_series(0::BIGINT, length(hex) // 8 - 1, 2)) AS t(frame_idx)
WHERE kind = 'video'
""",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd 4-byte frame of each video payload, vectorized per row."""
    return frame_sample(_media(spark, sf_dir), stride=2, frame_bytes=4)


@register("media_resize")
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning for image rows — metadata halved, payload counted
    (pixel resample is the media_resize_pixels entry, which keeps its
    oracle). ORACLE RETIRED r9 (slot-budget consolidation): the plan is
    closed-form arithmetic over (doc_id, meta, payload length), pinned
    value-exactly against an independent Catalyst recomputation in
    tests/test_multimodal.py::test_resize_plan_matches_metadata."""
    return resize_plan(_media(spark, sf_dir), scale=2)


@register(
    "media_dedup",
    f"""
WITH {_MEDIA_HEX}
SELECT md5(hex) AS fingerprint,
       MIN(doc_id) AS canonical_id,
       COUNT(*) AS n_copies,
       MIN(kind) AS kind
FROM media
GROUP BY 1
""",
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload exact dedup: byte-identical media (duplicate source
    documents synthesize identical payloads) collapse to a canonical id —
    the multimodal leg of the dedup family."""
    return media_dedup(_media(spark, sf_dir))


@register(
    "media_summary",
    f"""
WITH {_MEDIA_HEX}
SELECT kind, COUNT(*) AS n,
       CAST(SUM(length(hex) // 2) AS BIGINT) AS total_bytes,
       ROUND(AVG(32 * (1 + doc_id % 8)), 4) AS avg_width,
       ROUND(AVG(8000 * (1 + doc_id % 3)), 4) AS avg_sample_rate
FROM media GROUP BY kind
""",
)
def q_media_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind metadata/byte dashboard over the struct column."""
    return media_summary(_media(spark, sf_dir))


@register(
    "media_decode_bmp",
    f"""
WITH {_MEDIA_HEX},
px AS (
  SELECT doc_id, hex, length(hex) // 2 AS nb FROM media
),
chan AS (
  SELECT doc_id,
         list_transform(generate_series(0::BIGINT, 31),
                        t -> {_byte("((3*t) % nb) + 1")}) AS r,
         list_transform(generate_series(0::BIGINT, 31),
                        t -> {_byte("((3*t+1) % nb) + 1")}) AS g,
         list_transform(generate_series(0::BIGINT, 31),
                        t -> {_byte("((3*t+2) % nb) + 1")}) AS b
  FROM px
)
SELECT doc_id, 8 AS width, 4 AS height,
       CAST(list_sum(r) AS BIGINT) AS sum_r,
       CAST(list_sum(g) AS BIGINT) AS sum_g,
       CAST(list_sum(b) AS BIGINT) AS sum_b,
       CAST((list_sum(r) + list_sum(g) + list_sum(b)) % 997 AS BIGINT) AS px_checksum
FROM chan
""",
)
def q_media_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image-codec round-trip: every payload is tiled into an RGB
    raster, written as an actual 24-bit BMP file and decoded back by the
    engine's own struct/numpy BMP parser inside the Arrow kernel
    (operators.multimodal.encode_bmp/decode_bmp — a genuine binary
    format, not the byte-level fake). The oracle recomputes the decoded
    channel sums from the payload bytes directly; the hash only matches
    because the BMP round-trip is pixel-exact (pinned in
    tests/test_multimodal.py)."""
    from cs598vectordb_spark.operators.multimodal import media_decode_image

    return media_decode_image(_media(spark, sf_dir))


@register("media_decode_wav")
def q_media_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-codec round-trip (WAV sibling of media_decode_bmp):
    payload bytes -> int16 samples -> actual RIFF/WAV file -> decoded
    back by the engine's own parser.

    ORACLE RETIRED r16 (slot budget, near-duplicate-evidence class (2),
    funding the knn_join promotion): the WAV and BMP round-trips tile
    the SAME md5 payload bytes through the engine's own codec, and
    media_decode_bmp stays oracle-graded. The amplitude stats carry a
    pure-Python value-exact recomputation pin — the retired DuckDB
    twin's exact byte arithmetic — in
    tests/test_multimodal.py::test_media_decode_wav_value_exact, and
    the codec's sample-exact losslessness is separately pinned by
    tests/test_multimodal.py::test_bmp_wav_codecs_roundtrip_exact."""
    from cs598vectordb_spark.operators.multimodal import media_decode_audio

    return media_decode_audio(_media(spark, sf_dir))


@register(
    "media_resize_pixels",
    f"""
WITH {_MEDIA_HEX},
px AS (
  SELECT doc_id, hex, length(hex) // 2 AS nb FROM media
),
small AS (
  -- nearest-neighbor 2x downsample of the 4x8 tile: pixels at
  -- (row, col) = (2r, 2c) -> flat pixel index t = 16*r + 2*c
  SELECT doc_id,
         list_transform(generate_series(0::BIGINT, 7),
                        i -> {_byte("((3*(16*(i//4) + 2*(i%4))) % nb) + 1")}) AS r,
         list_transform(generate_series(0::BIGINT, 7),
                        i -> {_byte("((3*(16*(i//4) + 2*(i%4)) + 1) % nb) + 1")}) AS g,
         list_transform(generate_series(0::BIGINT, 7),
                        i -> {_byte("((3*(16*(i//4) + 2*(i%4)) + 2) % nb) + 1")}) AS b
  FROM px
)
SELECT doc_id, 4 AS new_width, 2 AS new_height,
       CAST(list_sum(r) AS BIGINT) AS sum_r,
       CAST(list_sum(g) AS BIGINT) AS sum_g,
       CAST(list_sum(b) AS BIGINT) AS sum_b
FROM small
""",
)
def q_media_resize_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize through the real codec: BMP-decode each payload's
    raster, nearest-neighbor downsample 2x, channel sums value-hashed
    against DuckDB's byte-position recomputation (resize_plan stays the
    metadata-only planning op; this is the pixel path)."""
    from cs598vectordb_spark.operators.multimodal import media_resize_pixels

    return media_resize_pixels(_media(spark, sf_dir))


@register("media_decode_ppm")
def q_media_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL netpbm (P6 binary PPM) round-trip: payload tiled to an RGB
    raster, written as an actual PPM file and decoded back by the
    engine's own whitespace/#-comment-aware header parser
    (operators.multimodal.encode_ppm/decode_ppm). ORACLE RETIRED r17
    (slot budget, funding the hybrid_rrf_search promotion;
    near-duplicate-evidence class: PPM is the same netpbm decoder as
    the r9-retired-and-pinned media_decode_pgm modulo the magic byte
    and channel count, and the codec family's losslessness is
    separately pinned by test_pnm_codecs_roundtrip_exact). Replaced by
    a value-exact pure-Python recomputation of the retired twin's byte
    arithmetic — channel sums and whole-raster min/max from the tiled
    payload bytes —
    tests/test_multimodal.py::test_media_decode_ppm_value_exact."""
    from cs598vectordb_spark.operators.multimodal import media_decode_ppm

    return media_decode_ppm(_media(spark, sf_dir))


@register("media_decode_pgm")
def q_media_decode_pgm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL grayscale netpbm (P5 binary PGM) round-trip — the
    one-channel leg of the real-codec matrix (BMP, WAV, PPM, PGM):
    payload tiled to an 8x4 grayscale raster through encode_pgm/
    decode_pgm. ORACLE RETIRED r9 (slot-budget consolidation): PGM is
    the same netpbm decoder as the still-oracled media_decode_ppm
    modulo the magic byte and channel count, so the per-format DuckDB
    byte arithmetic was near-duplicate evidence. Replaced by (a) the
    byte-exact codec round-trip property test
    (tests/test_multimodal.py::test_pnm_codecs_roundtrip_exact) and
    (b) a value-exact pin of the decoded stats against an independent
    Catalyst hex-arithmetic recomputation
    (tests/test_multimodal.py::test_pgm_stats_match_catalyst_bytes)."""
    from cs598vectordb_spark.operators.multimodal import media_decode_pgm

    return media_decode_pgm(_media(spark, sf_dir))
