"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The reference is text/vector-only; this surface is the LLM-training-data
extension the north star asks for: media payloads ride along as
`BINARY` columns with a typed metadata struct, and decode / feature-extract
/ resize / frame-sample run as Arrow-batched kernels over `mapInPandas`.

Container reality: no image/audio libraries are installed, so the *codec*
step is stubbed (`decode_media` raises NotImplementedError; the queries use
a deterministic byte-level fake decode instead). Everything Spark-side is
real and tested: schema, binary batch shape through Arrow, partitioning,
and the kernel signatures a real decoder would drop into.

Scale notes:
* Binary payloads dominate row width — at 100 TB you bound scan partitions
  with `spark.sql.files.maxPartitionBytes` and NEVER collect payloads; all
  kernels here stream Arrow batches executor-side and emit only small
  feature rows.
* The synthetic payload is `concat_i unhex(md5(text:i))` so the DuckDB
  oracle can rebuild the identical bytes from the `documents` view and
  verify our kernels byte-for-byte (hex-pair arithmetic on the SQL side).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

# Real-decoder stub registry: kind -> required (absent) library.
_REAL_DECODERS = {"image": "PIL", "audio": "soundfile", "video": "cv2"}


def decode_media(payload: bytes, kind: str):
    """STUB — real codec decode (JPEG/WAV/MP4) is NOT implemented in this
    container (no PIL/soundfile/cv2). The engine's media kernels accept a
    `decode` callable with this exact signature; swap this stub for a real
    one when the codec libraries exist and every query below works
    unchanged. Raises NotImplementedError always, by design."""
    lib = _REAL_DECODERS.get(kind, "?")
    raise NotImplementedError(
        f"real {kind} decode requires {lib}, which is not installed; "
        "use the deterministic fake decode (byte-level features) instead"
    )


def media_table(docs: DataFrame) -> DataFrame:
    """Synthesize the media table from `documents`:
    (doc_id, kind, payload BINARY, meta STRUCT<width,height,sample_rate,n_frames>).

    payload = concat of 1 + doc_id%4 md5 digests of `text || ':' || i` —
    16–64 deterministic bytes per row, rebuildable in ANSI SQL. All
    JVM-side expressions (md5/unhex/aggregate); no Python in the build.
    """
    parts = "transform(sequence(1, 1 + CAST(doc_id % 4 AS INT)), i -> unhex(md5(concat(text, ':', CAST(i AS STRING)))))"
    payload = f"aggregate({parts}, CAST('' AS BINARY), (acc, x) -> concat(acc, x))"
    return docs.select(
        "doc_id",
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        F.expr(payload).alias("payload"),
        F.struct(
            (32 * (1 + F.col("doc_id") % 8)).cast("int").alias("width"),
            (32 * (1 + F.col("doc_id") % 5)).cast("int").alias("height"),
            (8000 * (1 + F.col("doc_id") % 3)).cast("int").alias("sample_rate"),
            (F.length(F.expr(payload)) / 4).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def media_dedup(media: DataFrame) -> DataFrame:
    """Exact dedup of binary payloads: md5 over the payload's (lowercase)
    hex rendering — byte-identical media collapse to one canonical row,
    the binary analog of dedup_exact. The hash runs JVM-side on the hex
    string so the DuckDB oracle (which holds the same hex) reproduces the
    fingerprint exactly; at 100 TB this is one hash-groupBy on a uniform
    128-bit key, payload bytes never shuffle (only their digest does)."""
    fp = F.md5(F.lower(F.hex(F.col("payload"))))
    return media.groupBy(fp.alias("fingerprint")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("kind").alias("kind"),
    )


def media_features(media: DataFrame) -> DataFrame:
    """Deterministic fake decode: byte-level feature extraction per payload.

    (doc_id, kind, n_bytes, first_byte, byte_sum, mean_byte) via an Arrow
    mapInPandas kernel — the slot where a real `decode_media` would produce
    pixel/sample tensors. Pure per-row map: no shuffle, scales linearly.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, first, bsum = [], [], []
            for payload in pdf["payload"]:
                a = np.frombuffer(payload, dtype=np.uint8)
                n_bytes.append(a.size)
                first.append(int(a[0]) if a.size else -1)
                bsum.append(int(a.sum()))
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "byte_sum": bsum,
                }
            )
            # integer checksum, not a rounded mean: float rounding at tie
            # points (byte_sum/2^k is a 4-decimal half-integer for ~half of
            # payloads) differs between banker's and half-up engines.
            out["checksum"] = out["byte_sum"] % 997
            yield out

    return media.select("doc_id", "kind", "payload").mapInPandas(
        kernel,
        "doc_id long, kind string, n_bytes int, first_byte int, byte_sum bigint, checksum bigint",
    )


def frame_sample(media: DataFrame, stride: int = 2, frame_bytes: int = 4) -> DataFrame:
    """Video frame sampling: treat the payload as consecutive
    `frame_bytes`-byte frames, keep every `stride`-th frame, emit
    (doc_id, frame_idx, frame_sum). The kernel vectorizes the frame split
    with one numpy reshape per payload — the shape a real frame grabber
    (cv2.VideoCapture + grab/retrieve) would fill in.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for did, payload in zip(pdf["doc_id"].tolist(), pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                n = a.size // frame_bytes
                frames = a[: n * frame_bytes].reshape(n, frame_bytes)
                take = np.arange(0, n, stride)
                ids.extend([did] * take.size)
                idxs.extend(take.tolist())
                sums.extend(frames[take].sum(axis=1).tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_sum": sums},
                dtype="int64",
            )

    return media.filter(F.col("kind") == "video").select("doc_id", "payload").mapInPandas(
        kernel, "doc_id long, frame_idx long, frame_sum long"
    )


def resize_plan(media: DataFrame, scale: int = 2) -> DataFrame:
    """Image resize as a metadata transform + payload passthrough: the
    deterministic fake halves the declared dimensions and keeps the byte
    count; a real implementation swaps the identity payload map for a
    PIL.Image.resize inside the same kernel slot (`decode_media` stub).
    JVM-only expressions — resize *planning* needs no Python at all."""
    return media.filter(F.col("kind") == "image").select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        (F.col("meta.width") / scale).cast("int").alias("new_width"),
        (F.col("meta.height") / scale).cast("int").alias("new_height"),
        F.length("payload").alias("n_bytes"),
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Typed-metadata aggregation over the struct column: per kind, row
    count, total payload bytes, mean declared dims — the sanity dashboard a
    100 TB media crawl would run before training."""
    return (
        media.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.round(F.avg("meta.width"), 4).alias("avg_width"),
            F.round(F.avg("meta.sample_rate"), 4).alias("avg_sample_rate"),
        )
    )
