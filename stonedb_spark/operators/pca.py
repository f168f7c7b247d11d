"""Distributed PCA over an embedding column — a training-data operator
the reference engine has no analog for (its surface is flat relational;
SURVEY.md §1.1 — no array types at all).

Decomposition strategy for 100 TB:

* The ONLY distributed work is accumulating first/second moments: per
  Arrow batch a d-vector of sums and a d×d Gram matrix via one einsum
  (``mapInPandas`` — vectorized, no per-row Python), one partial row
  per batch; the driver reduces the handful of partials.  Nothing else
  touches the data, so the network cost is (#partitions × d²) floats —
  independent of row count.
* Eigendecomposition happens on the driver on the d×d covariance
  (d ≤ a few thousand — trivially in-memory; np.linalg.eigh).
* Projection back over the corpus is a pure Catalyst expression per
  component (zip_with dot product against a broadcast literal vector)
  — codegen'd, no UDF, map-only.

The SQL-oracle-able covariance (decimal-exact sums, engine-portable) is
in queries/pipeline.py::emb_pca_covariance; this module is the fast
path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

_PARTIAL_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("colsum", ArrayType(DoubleType())),
        StructField("gram", ArrayType(DoubleType())),
    ]
)


def moment_partials(df: DataFrame, col: str = "embedding") -> DataFrame:
    """One (n, Σx, ΣxxT) partial per Arrow batch via einsum."""

    def acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # the column is array<float>; accumulate in float64 or the
            # batch sums lose ~1e-6 relative precision
            m = np.stack(b[col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [m.shape[0]],
                    "colsum": [m.sum(axis=0).tolist()],
                    "gram": [np.einsum("ni,nj->ij", m, m).ravel().tolist()],
                }
            )

    return df.select(col).mapInPandas(acc, _PARTIAL_SCHEMA)


def covariance_matrix(df: DataFrame, col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """(covariance d×d, mean d, n) — driver reduces the batch partials."""
    parts = moment_partials(df, col).collect()
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["colsum"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["gram"]) for p in parts], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    return cov, mean, n


def pca_components(df: DataFrame, col: str = "embedding", k: int = 4):
    """Top-k principal components (rows) + eigenvalues, deterministically
    sign-normalized (largest-|entry| made positive — eigh's sign is
    arbitrary and would flip between runs/platforms otherwise)."""
    cov, mean, _ = covariance_matrix(df, col)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps, eigvals = [], []
    for idx in order:
        vec = v[:, idx]
        j = int(np.argmax(np.abs(vec)))
        if vec[j] < 0:
            vec = -vec
        comps.append(vec)
        eigvals.append(float(w[idx]))
    return np.stack(comps), np.asarray(eigvals), mean


def project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    col: str = "embedding",
    prefix: str = "pc",
) -> DataFrame:
    """Append pc0..pc{k-1} columns: (x - mean)·component, evaluated as a
    zip_with/aggregate Catalyst expression per component — whole-stage
    codegen, map-only, no UDF in the projection pass."""
    out = df
    for ci, comp in enumerate(components):
        lit = F.array(*[F.lit(float(c)) for c in comp])
        centered_dot = F.aggregate(
            F.zip_with(F.col(col), lit, lambda x, c: x * c),
            F.lit(0.0),
            lambda a, x: a + x,
        ) - F.lit(float(np.dot(mean, comp)))
        out = out.withColumn(f"{prefix}{ci}", centered_dot)
    return out
