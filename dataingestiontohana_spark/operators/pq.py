"""Product quantization (PQ) for compressed approximate nearest
neighbor — the memory half of the FAISS IVF-PQ recipe (Jégou, Douze &
Schmid 2011, "Product quantization for nearest neighbor search"):
split each d-dim vector into ``m_sub`` subvectors, quantize every
subvector to its nearest entry in a small per-subspace codebook, and
answer queries with asymmetric distance computation (ADC) — a
lookup-table sum over the stored codes, never touching the original
floats.

Why it matters at 100 TB: a 64-dim float32 embedding is 256 B/vector;
its PQ code at m_sub=8, 16 codes/subspace is 8 *nibbles* (stored here
as 8 small ints) — a ~64x raw compression that turns a
petabyte-scale vector corpus into something that fits hot storage,
with the scan side reduced to integer table lookups. IVF (see
operators/ivf.py) prunes WHICH vectors to score; PQ shrinks WHAT is
stored and scored. The two compose.

Determinism/portability contract (the repo-wide discipline): all
arithmetic is EXACT INT64. Embeddings are quantized once onto the
1e-6 grid with SQL-semantics ROUND (half away from zero — matching
Spark's round AND DuckDB's, deliberately NOT numpy's half-even);
codebook entries are sampled vectors' subvectors on the same grid
(the Knuth-hash pick of operators/ivf.py::sample_centroids); encode
is integer-argmin with lowest-code tiebreak; ADC distances are
integer sums. Both engines therefore produce byte-identical codes,
distances, and rankings — the PQ pipeline is fully value-checkable
by the DuckDB oracle, collisions and approximation error included.

Scale shape: codebook fitting collects k_codes vectors (driver-tiny);
encode and ADC scoring are MAP-ONLY Arrow-batch matmuls over int64
(no shuffle anywhere until the caller's final top-k, which Spark
executes as TakeOrderedAndProject).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# quantization grid: 6 decimals, same scale the k-means (q83) centroid
# re-grid uses. |component| <~ 10 => |eq| <~ 1e7; squared diffs sum
# over 64 dims stays < 2^63 with orders of magnitude to spare.
Q_GRID = 1_000_000


def quantize_embeddings(
    vecs: DataFrame, col: str = "embedding", out: str = "ev"
) -> DataFrame:
    """Add ``out`` = the embedding on the integer 1e-6 grid
    (array<bigint>), via SQL-semantics ROUND so Spark and the oracle
    agree on every last component."""
    return vecs.withColumn(
        out,
        F.transform(
            F.col(col),
            lambda x: F.round(x.cast("double") * Q_GRID, 0).cast("bigint"),
        ),
    )


def pq_codebook(
    vecs_q: DataFrame, k_codes: int = 16, id_col: str = "vec_id"
) -> np.ndarray:
    """Codebook = the quantized embeddings of the ``k_codes`` vectors
    with smallest Knuth id-hash (the sample_centroids pick — stable
    under any partitioning, replayable in ANSI SQL). Code j of
    subspace s is the sampled vector j's s-th subvector; sampling
    once for all subspaces keeps the SQL replay one CTE.

    Returns int64 [k_codes, dim]. Production PQ would Lloyd-refine
    each subspace codebook (the q83 k-means machinery composes here);
    the sampled codebook is the deterministic baseline.
    """
    from dataingestiontohana_spark.functions.hashing import knuth_hash32

    rows = (
        vecs_q.select(id_col, "ev")
        .withColumn("_h", knuth_hash32(id_col))
        .orderBy("_h", id_col)
        .limit(k_codes)
        .collect()
    )
    return np.array([list(r["ev"]) for r in rows], dtype=np.int64)


def pq_encode(
    vecs_q: DataFrame,
    codebook: np.ndarray,
    m_sub: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes array<int>): each subvector's nearest codebook entry
    by exact integer squared-L2, lowest code on ties. Map-only Arrow
    batches; the codebook broadcasts by closure (k_codes*dim int64 —
    a few KB)."""
    dim = codebook.shape[1]
    if dim % m_sub:
        raise ValueError(
            f"dim={dim} not divisible by m_sub={m_sub}: trailing "
            "components would be silently dropped from codes"
        )
    sub = dim // m_sub
    cb_list = codebook.tolist()

    @F.pandas_udf("array<int>")
    def encode(ev: pd.Series) -> pd.Series:
        cb = np.asarray(cb_list, dtype=np.int64)  # [k, dim]
        mat = np.stack(ev.apply(np.asarray, dtype=np.int64).values)
        out = np.empty((mat.shape[0], m_sub), dtype=np.int32)
        for s in range(m_sub):
            lo, hi = s * sub, (s + 1) * sub
            # [n, k] exact integer distances; argmin = lowest index
            d = ((mat[:, None, lo:hi] - cb[None, :, lo:hi]) ** 2).sum(
                axis=2
            )
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return vecs_q.select(id_col, encode(F.col("ev")).alias("codes"))


def pq_adc_scores(
    codes_df: DataFrame,
    codebook: np.ndarray,
    query_ev: list[int],
    m_sub: int = 8,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, pq_dist): asymmetric distance — the per-subspace lookup
    table is built ONCE from the query (m_sub * k_codes integer
    entries), then every stored code row costs m_sub table lookups
    and one integer sum. Map-only."""
    dim = codebook.shape[1]
    if dim % m_sub:
        raise ValueError(
            f"dim={dim} not divisible by m_sub={m_sub}: trailing "
            "components would be silently dropped from the ADC tables"
        )
    if len(query_ev) != dim:
        raise ValueError(
            f"query has {len(query_ev)} components, codebook dim is "
            f"{dim}: a longer query would silently score on its "
            f"first {dim} components only"
        )
    sub = dim // m_sub
    q = np.asarray(query_ev, dtype=np.int64)
    lut = np.empty((m_sub, codebook.shape[0]), dtype=np.int64)
    for s in range(m_sub):
        lo, hi = s * sub, (s + 1) * sub
        lut[s] = ((codebook[:, lo:hi] - q[None, lo:hi]) ** 2).sum(axis=1)
    lut_list = lut.tolist()

    @F.pandas_udf("long")
    def adc(codes: pd.Series) -> pd.Series:
        t = np.asarray(lut_list, dtype=np.int64)
        mat = np.stack(codes.apply(np.asarray, dtype=np.int64).values)
        return pd.Series(t[np.arange(m_sub)[None, :], mat].sum(axis=1))

    return codes_df.select(id_col, adc(F.col("codes")).alias("pq_dist"))
