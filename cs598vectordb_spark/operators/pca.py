"""PCA embedding compression — dimensionality reduction for the vector
surface (the training-data-pipeline step between raw embeddings and a
cheaper ANN index; the reference serves raw SIFT vectors, so this is
engine-extension surface like the dedup/text operators).

Spark-first shape, one data pass + one projection pass:

1. ONE distributed pass accumulates the Gram matrix and mean via
   per-Arrow-batch partial sums (`X.T @ X`, column sums, row count) —
   each partition emits a single (d*d + d + 1)-element row, so the
   driver combines |partitions| rows of d=64-sized algebra, never data.
2. The d x d eigendecomposition runs on the driver — d*d doubles is
   driver-sized BY DESIGN (the same argument as the layered index's L1
   centroid matrix), independent of row count: the one part of PCA that
   is O(d^3), not O(n).
3. Projection broadcasts the (d x out_dim) component matrix and maps
   each batch through one GEMM — embarrassingly parallel, no shuffle.

Determinism: eigh is deterministic for a fixed matrix; the component
sign ambiguity is fixed by forcing each component's
largest-absolute-value coordinate positive. Partial-sum float ordering
can jitter the last bits across partition schedules, so the registered
query faces the rows-only check while the mathematical invariants
(orthonormality, non-increasing spectrum, exact isometry at full rank)
are pinned in tests/test_knn.py.

RECALL IS DATA-DEPENDENT, not an operator property. On the isotropic
synthetic fixtures the compress-then-search curve reads ~0.15/0.20/0.37
recall@10 at out_dim 8/16/32 — PCA's worst case (all eigenvalues
comparable, nothing to drop), far below a usable ANN backend, and the
bench detail labels each point with the variance actually captured so
the curve cannot be misread as serving quality. On data with genuine
low-rank structure the same operator at the same out_dim reaches
recall ≥ 0.9 (pinned: tests/test_knn.py::
test_pca_recall_high_on_low_rank_data, intrinsic dim 8 + 2% noise).
Deploy rule: check pca_spectrum's cum_ratio at the target out_dim
FIRST; below ~0.9 captured variance, use the IVF/graph/PQ families
instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(
    base: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components d x d, eigenvalues desc, mean): one distributed pass of
    partial Gram/mean sums, then a driver-side eigh of the d x d
    covariance."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        s = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = X.T @ X
            gram = g if gram is None else gram + g
            cs = X.sum(axis=0)
            s = cs if s is None else s + cs
            n += len(X)
        if n:
            yield pd.DataFrame(
                {"gram": [gram.ravel().tolist()], "s": [s.tolist()], "n": [n]}
            )

    rows = (
        base.select(vec_col)
        .mapInPandas(partials, "gram array<double>, s array<double>, n long")
        .collect()  # one row per partition: |parts| * (d*d+d+1) doubles
    )
    gram = np.sum([np.asarray(r["gram"]) for r in rows], axis=0)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    n = int(sum(r["n"] for r in rows))
    d = s.shape[0]
    gram = gram.reshape(d, d)
    mean = s / n
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    evecs = evecs[:, order]
    # fix the sign ambiguity: largest-|coordinate| of each component > 0
    flips = np.sign(evecs[np.abs(evecs).argmax(axis=0), np.arange(d)])
    flips[flips == 0] = 1.0
    return evecs * flips[None, :], evals, mean


def pca_project(
    base: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fitted: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
    out_dtype: str = "float32",
) -> DataFrame:
    """(id, pca ARRAY<FLOAT|DOUBLE>): project every vector onto the top
    out_dim principal components — broadcast the component matrix, one
    GEMM per Arrow batch, no shuffle.

    out_dtype="float64" keeps the projection in double — used by the
    oracle-graded query so the only fp divergence vs the DuckDB side is
    GEMM summation order (~1e-15 relative), not a float32 round."""
    comps, _, mean = fitted if fitted is not None else fit_pca(base, vec_col)
    W = np.ascontiguousarray(comps[:, :out_dim])
    np_dtype = np.float32 if out_dtype == "float32" else np.float64
    spark = base.sparkSession
    bc = spark.sparkContext.broadcast((W, mean))

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Wb, mb = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            P = (X - mb[None, :]) @ Wb
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "pca": [row.astype(np_dtype) for row in P],
                }
            )

    sql_type = "array<float>" if out_dtype == "float32" else "array<double>"
    return base.select(id_col, vec_col).mapInPandas(
        project, f"{id_col} long, pca {sql_type}"
    )


def fixture_fingerprint(base: DataFrame, vec_col: str = "embedding") -> tuple[int, int]:
    """(n_rows, checksum) of the fixture the model was fitted on. The
    checksum — SUM(FLOOR(first_element * 1000) AS BIGINT) — is exact
    integer arithmetic over bit-identical float32→double values, so DuckDB
    recomputes the SAME number from the same parquet (no fp-ordering
    noise), unlike a float sum or an engine-specific hash."""
    row = base.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(F.element_at(vec_col, 1).cast("double") * 1000).cast("long")
        ).alias("fp"),
    ).collect()[0]
    return int(row["n"]), int(row["fp"])


def save_pca_model(
    fitted: tuple[np.ndarray, np.ndarray, np.ndarray],
    out_dim: int,
    path: str,
    fingerprint: tuple[int, int] = (0, 0),
) -> None:
    """Persist the fitted (components, mean) as a flat parquet of
    (i, j, mean, w) rows — i = 1-based input dim, j = 1-based output dim,
    w = W[i-1, j-1], mean = mean[i-1] (repeated per j for join-free SQL).

    d*out_dim rows of scalars is driver-sized by the same argument as the
    fit itself; the artifact is what makes compression→search correctness
    ORACLE-checkable: DuckDB re-projects with the exact same matrix the
    engine broadcast (VERDICT r7 item 3; analog: the persisted graph
    index, queries_index.py).

    `fingerprint` = fixture_fingerprint(base) at fit time, stored as
    constant (n_base, fp_base) columns. The oracle FILTERS its model read
    on the fingerprint it recomputes from the live fixture, so a STALE
    artifact (prior-round fixture drift, or a check_oracle run at a
    different SF) yields zero model rows → an obviously-empty oracle
    result, never a silent comparison against the wrong matrix (ADVICE
    r8)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    comps, _, mean = fitted
    W = comps[:, :out_dim]
    d = W.shape[0]
    n_base, fp_base = fingerprint
    ii, jj = np.meshgrid(np.arange(1, d + 1), np.arange(1, out_dim + 1), indexing="ij")
    table = pa.table(
        {
            "i": pa.array(ii.ravel(), type=pa.int32()),
            "j": pa.array(jj.ravel(), type=pa.int32()),
            "mean": pa.array(np.repeat(mean, out_dim), type=pa.float64()),
            "w": pa.array(W.ravel(), type=pa.float64()),
            "n_base": pa.array(np.full(ii.size, n_base), type=pa.int64()),
            "fp_base": pa.array(np.full(ii.size, fp_base), type=pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(table, path)


def pca_spectrum(base: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(component, eigenvalue, explained_ratio, cum_ratio): the variance
    spectrum — the artifact that answers 'how small can out_dim be' for
    an embedding-compression pass."""
    _, evals, _ = fit_pca(base, vec_col)
    total = float(evals.sum()) or 1.0
    cum = np.cumsum(evals) / total
    spark = base.sparkSession
    rows = [
        (int(i), round(float(evals[i]), 6), round(float(evals[i] / total), 6), round(float(cum[i]), 6))
        for i in range(len(evals))
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_ratio double, cum_ratio double"
    ).orderBy("component")
