"""Registered Python Data Source for fvecs/ivecs — `spark.read
.format("fvecs")` (SURVEY.md §2.1 S1/S2 as a first-class source).

The functional reader lives in sources/vecfiles.py (binaryFile +
mapInPandas); this module re-expresses it through Spark 4's Python Data
Source API so the format participates in the normal reader surface —
options, schema, and one InputPartition PER SHARD FILE, which is the
same parallelism contract the mapInPandas path has (fvecs corpora shard
one file per unit; at 100 TB every executor decodes its own shards, no
shuffle, no driver involvement). read() yields Arrow RecordBatches, so
rows move JVM-ward in columnar batches, not tuple-at-a-time.

Usage:
    from cs598vectordb_spark.sources.fvecs_datasource import register
    register(spark)
    df = spark.read.format("fvecs").load("/path/to/shards")          # float32
    df = spark.read.format("fvecs").option("value_dtype", "int32") \
             .load("/path/to/shards")                                # ivecs

Provenance: the file layout is the reference's SIFT loader
(/root/reference/dynamic_script_faiss.py:9-22, implicit-position ids
:57); shard-name id recovery matches sources/vecfiles.py.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from cs598vectordb_spark.sources.vecfiles import _SHARD_RE, _decode_blob


class _ShardPartition(InputPartition):
    def __init__(self, path: str, start_id: int):
        self.path = path
        self.start_id = start_id


class FvecsDataSource(DataSource):
    """`fvecs` format: (vec_id long, embedding array<float|int>) from a
    directory of part-<start>.fvecs / .ivecs shard files."""

    @classmethod
    def name(cls) -> str:
        return "fvecs"

    def schema(self) -> str:
        vt = "int" if self.options.get("value_dtype") == "int32" else "float"
        vec_col = self.options.get("vec_col", "embedding")
        return f"vec_id long, {vec_col} array<{vt}>"

    def reader(self, schema) -> "FvecsReader":
        return FvecsReader(self.options)


class FvecsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("fvecs source requires a path: .load('<dir>')")
        self.value_dtype = options.get("value_dtype", "float32")
        self.vec_col = options.get("vec_col", "embedding")
        self.ext = "ivecs" if self.value_dtype == "int32" else "fvecs"
        self.id_lo: int | None = None  # inclusive pushed vec_id bounds
        self.id_hi: int | None = None  # inclusive

    def pushFilters(self, filters):
        """SHARD PRUNING on vec_id: shard names encode their starting id
        and shards are contiguous, so a vec_id range predicate prunes
        whole files at planning time — the binary format's analog of
        parquet partition pruning, and what keeps a point/range lookup
        sublinear over a thousand-shard corpus. Every filter is returned
        to Spark (it re-evaluates them post-scan), so the pruning is a
        pure skip, never a correctness dependency."""
        def lo(v: int) -> None:
            self.id_lo = v if self.id_lo is None else max(self.id_lo, v)

        def hi(v: int) -> None:
            self.id_hi = v if self.id_hi is None else min(self.id_hi, v)

        for f in filters:
            if getattr(f, "attribute", None) != ("vec_id",):
                continue
            v = getattr(f, "value", None)  # e.g. IsNotNull carries none
            if v is None:
                continue
            if isinstance(f, EqualTo):
                lo(v), hi(v)
            elif isinstance(f, GreaterThan):
                lo(v + 1)
            elif isinstance(f, GreaterThanOrEqual):
                lo(v)
            elif isinstance(f, LessThan):
                hi(v - 1)
            elif isinstance(f, LessThanOrEqual):
                hi(v)
        return filters

    def partitions(self):
        # one partition per shard file — the format's natural parallel
        # unit; a 100 TB corpus is thousands of shards => thousands of
        # independent decode tasks. Driver cost: one directory listing.
        files = sorted(glob.glob(os.path.join(self.path, f"*.{self.ext}")))
        if not files:
            raise FileNotFoundError(f"no *.{self.ext} files under {self.path}")
        matches = [_SHARD_RE.search(f) for f in files]
        starts = [int(m.group(1)) if m else 0 for m in matches]
        # pruning assumes the id-range contract: EVERY file name encodes
        # its start and starts strictly increase (write_vecs guarantees
        # both). A foreign file breaks the assumption, so pruning turns
        # off (scan everything) rather than risk skipping its rows.
        contiguous = all(matches) and all(
            a < b for a, b in zip(starts, starts[1:])
        )
        parts = []
        for i, (f, start) in enumerate(zip(files, starts)):
            if contiguous:
                # shard i covers [start_i, start_{i+1}); last is unbounded
                nxt = starts[i + 1] if i + 1 < len(files) else None
                if self.id_hi is not None and start > self.id_hi:
                    continue
                if self.id_lo is not None and nxt is not None and nxt <= self.id_lo:
                    continue
            parts.append(_ShardPartition(f, start))
        return parts

    def read(self, partition: _ShardPartition):
        # executor-side: decode ONE shard into Arrow batches. Ids are
        # start_id + row position (the reference's implicit-id contract).
        import numpy as np
        import pyarrow as pa

        with open(partition.path, "rb") as fh:
            content = fh.read()
        rows = _decode_blob(content, self.value_dtype)
        if not rows:
            return
        ids = np.arange(
            partition.start_id, partition.start_id + len(rows), dtype=np.int64
        )
        pa_vt = pa.int32() if self.value_dtype == "int32" else pa.float32()
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids, type=pa.int64()), pa.array(list(rows), type=pa.list_(pa_vt))],
            names=["vec_id", self.vec_col],
        )


class FvecsStreamReader(DataSourceStreamReader):
    """Streaming shard arrivals: `spark.readStream.format("fvecs")` —
    the online-ingest shape where new vector shards land in a directory
    and each micro-batch picks up the files that appeared since the
    last offset. Partition-based (NOT the driver-reading Simple API):
    each micro-batch plans one InputPartition per new shard file and
    EXECUTORS decode them — the same per-shard parallel contract as the
    batch reader, so the stream survives 100 TB arrival rates.

    The offset is a HIGH-WATER MARK on the file NAME ({"last_file":
    basename}), not a count: a batch consumes exactly the files whose
    names sort in (start.last_file, end.last_file]. A count offset
    breaks if a file ever sorts BEFORE consumed ones (a foreign name, a
    shrunk re-export): the slice shifts, one shard re-reads and another
    is skipped silently. With the name mark, replays re-plan the
    identical slice from the directory listing alone. The contract this
    assumes — and the writer guarantees — is that new shards sort AFTER
    consumed ones (append-only, id-ordered part-<start> names); a file
    landing below the mark is NOT picked up (same rule as the parquet
    file source's aged-out listing window) rather than corrupting the
    slice arithmetic."""

    def __init__(self, options):
        self.inner = FvecsReader(options)

    def initialOffset(self) -> dict:
        return {"last_file": ""}

    def _files(self) -> list:
        """Contract-named shard files only, sorted. A glob-matching file
        WITHOUT the part-<start> naming is INVISIBLE to the stream —
        excluded from the partition plan AND the offset watermark — and
        warned about. Ingesting it would misnumber every row (the batch
        reader's start_id=0 single-file fallback collides with shard 0
        mid-stream); letting it into the watermark would be worse: a
        high-sorting foreign name ('zz.fvecs' > every 'part-*') would
        advance last_file past ALL future contract shards and silently
        block the stream forever."""
        import warnings

        names = sorted(
            os.path.basename(f)
            for f in glob.glob(os.path.join(self.inner.path, f"*.{self.inner.ext}"))
        )
        keep = []
        for name in names:
            if _SHARD_RE.search(name):
                keep.append(name)
            else:
                warnings.warn(
                    f"fvecs stream: ignoring non-contract file name {name!r} "
                    f"(no part-<start> id offset); use write_vecs naming to "
                    f"make it ingestable",
                    stacklevel=2,
                )
        return keep

    def latestOffset(self) -> dict:
        files = self._files()
        return {"last_file": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict):
        lo = start.get("last_file", "")
        hi = end.get("last_file", "")
        parts = []
        for name in self._files():  # contract-named only (see _files)
            if not (lo < name <= hi):
                continue
            m = _SHARD_RE.search(name)
            parts.append(
                _ShardPartition(os.path.join(self.inner.path, name), int(m.group(1)))
            )
        # an empty micro-batch still needs a partition list
        return parts

    def read(self, partition: _ShardPartition):
        # executor-side, identical decode to the batch reader
        return FvecsReader.read(self.inner, partition)

    def commit(self, end: dict) -> None:
        pass  # shards are immutable; nothing to clean up


def _stream_reader(self, schema):
    """Streaming entry point of the `fvecs` format (see
    FvecsStreamReader); bound onto FvecsDataSource below."""
    return FvecsStreamReader(self.options)


FvecsDataSource.streamReader = _stream_reader


def register(spark) -> None:
    """Idempotently register the `fvecs` format on this session.

    Also enables Python-source filter pushdown: a reader that implements
    pushFilters() FAILS HARD when the conf is off (worker-side
    assertion), and the driver's gate runs a bare session — so the
    format's entry point owns the conf it needs."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FvecsDataSource)
