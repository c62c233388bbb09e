"""Distributed PCA building blocks: exact-integer covariance matrix +
driver-side power iteration + map-only principal-component projection.

The q160 feature-correlation query adjudicates the d x d sufficient
statistics against the DuckDB oracle; this module carries the same
pass one step further into an eigen-solve. The split follows the MLlib
treatment of tall-skinny linear algebra (and the reference's scale
model: the wide table never leaves the cluster, the d x d summary
does):

- `gram_moments(df)` — ONE distributed pass over an `array<float>`
  column: every Arrow batch emits its int64 partial Gram (numpy
  matmul over 1e-6-quantized values, exact) plus linear sums; Spark
  reduces 2,080 + 64 cells. Work is O(rows * d^2 / batch), shuffle is
  O(d^2) — kilobytes at any corpus size.
- `top_eigenvector(cov)` — power iteration on the d x d driver-side
  covariance (float64 numpy; d = 64 means microseconds). Sign is
  canonicalized (first nonzero component positive) so results are
  comparable across runs.
- `project_component(df, v)` — map-only projection score per row:
  the eigenvector folds into the plan as a literal array, the dot
  product is a codegen zip_with/aggregate — no Python in the pass.

Rayleigh-quotient convergence: for a covariance matrix (symmetric
PSD) power iteration converges linearly at rate lambda2/lambda1; 100
iterations is overkill for any spectrum a test fixture plants, and
the property suite pins the result against numpy.linalg.eigh.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT = 1_000_000  # 1e-6 grid, the q36b/q73/q160 convention


def gram_moments(df: DataFrame, col: str = "embedding", dim: int = 64):
    """(n, sx, sxy): row count, int64 linear sums (dim,), int64 Gram
    (dim, dim) over values quantized to the 1e-6 grid — EXACT, so two
    runs (or two engines) agree bit-for-bit. One mapInPandas pass;
    only O(d^2) cells cross the wire."""
    cells_schema = "i int, j int, sxy long, sxi long, n long"

    def gram(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.stack(pdf[col].to_numpy())
            x = m.astype(np.float64) * QUANT
            q = np.trunc(x + np.copysign(0.5, x)).astype(np.int64)
            g = q.T @ q
            s = q.sum(axis=0)
            iu, ju = np.triu_indices(q.shape[1])
            yield pd.DataFrame(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "sxy": g[iu, ju],
                    # linear sums ride on the diagonal cells (i == j)
                    "sxi": np.where(iu == ju, s[iu], 0),
                    "n": np.full(len(iu), len(q), dtype=np.int64),
                }
            )

    agg = (
        df.select(F.col(col).alias(col))
        .mapInPandas(gram, cells_schema)
        .groupBy("i", "j")
        .agg(
            F.sum("sxy").alias("sxy"),
            F.sum("sxi").alias("sxi"),
            F.sum("n").alias("nn"),
        )
    )
    rows = agg.collect()  # d*(d+1)/2 cells — driver-small by design
    sxy = np.zeros((dim, dim), dtype=np.int64)
    sx = np.zeros(dim, dtype=np.int64)
    n = 0
    for r in rows:
        sxy[r["i"], r["j"]] = r["sxy"]
        sxy[r["j"], r["i"]] = r["sxy"]
        if r["i"] == r["j"]:
            sx[r["i"]] = r["sxi"]
    # every cell carries the same row count: take it from any one
    n = rows[0]["nn"] if rows else 0
    return n, sx, sxy


def covariance(n: int, sx: np.ndarray, sxy: np.ndarray) -> np.ndarray:
    """Unbiased covariance (float64) from the exact integer moments,
    back on the original value scale."""
    if n < 2:
        return np.zeros_like(sxy, dtype=np.float64)
    sxf = sx.astype(np.float64)
    c = (sxy.astype(np.float64) - np.outer(sxf, sxf) / n) / (n - 1)
    return c / (QUANT * QUANT)


def top_eigenvector(cov: np.ndarray, iters: int = 100, seed: int = 7):
    """(eigenvalue, eigenvector) of the dominant component by power
    iteration; the vector's first nonzero-magnitude component is made
    positive so the sign is deterministic."""
    d = cov.shape[0]
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(d)
    v /= np.linalg.norm(v)
    for _ in range(iters):
        w = cov @ v
        nw = np.linalg.norm(w)
        if nw == 0.0:
            return 0.0, v
        v = w / nw
    lam = float(v @ cov @ v)
    nz = np.nonzero(np.abs(v) > 1e-12)[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    return lam, v


def project_component(
    df: DataFrame, v: np.ndarray, col: str = "embedding",
    out: str = "pc1_score", center: np.ndarray | None = None,
) -> DataFrame:
    """Map-only principal-component score: dot(embedding - center, v)
    as a codegen zip_with/aggregate over a literal coefficient array.
    No shuffle, no Python — the 100 TB-safe half of a PCA transform."""
    coef = F.array(*[F.lit(float(x)) for x in v])
    vec = F.transform(F.col(col), lambda x: x.cast("double"))
    if center is not None:
        cen = F.array(*[F.lit(float(x)) for x in center])
        vec = F.zip_with(vec, cen, lambda a, b: a - b)
    score = F.aggregate(
        F.zip_with(vec, coef, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return df.withColumn(out, score)
