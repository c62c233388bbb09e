"""IVF (inverted-file) approximate nearest neighbor: the coarse-
quantizer scale path complementing hyperplane LSH (plans/llm_similarity).

Classic IVF (Jegou et al., "Product Quantization for Nearest Neighbor
Search", the coarse-quantizer stage): pick k centroids, assign every
vector to its nearest centroid (the inverted lists), and at query time
scan only the `nprobe` closest lists instead of the whole collection.

Spark-native shape:
- Centroids: a deterministic seeded sample of the vectors themselves
  (k-means-free variant; swap in KMeans fit offline if recall needs it).
  k centroids x 64 dims is driver-small and ships as a numpy literal.
- Assignment: one Arrow-batched pandas UDF (argmin over a matmul) —
  map-only, no shuffle; the cluster id becomes a partition-prunable
  column when persisted (`partitionBy("cluster_id")`).
- Query: centroid distances on the driver (k rows), then a filtered
  scan of the nprobe chosen clusters — the filter prunes partitions at
  the storage layer, which is the entire point at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sample_centroids(
    vecs: DataFrame, k: int = 16, id_col: str = "vec_id", seed: int = 42
) -> np.ndarray:
    """Deterministic centroid pick: the k vectors whose xxhash64(id,
    seed) are smallest — stable under any partitioning, no RNG on the
    executors."""
    rows = (
        vecs.select(id_col, "embedding")
        .withColumn("_h", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    return np.array([list(r["embedding"]) for r in rows], dtype=np.float64)


def assign_clusters(vecs: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Add cluster_id = argmin centroid distance (cosine): map-only
    numpy matmul per Arrow batch."""
    cents = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    cents_list = cents.tolist()  # plain list: picklable, tiny

    @F.pandas_udf("int")
    def assign(emb: pd.Series) -> pd.Series:
        c = np.asarray(cents_list)
        mat = np.stack(emb.apply(np.asarray, dtype=np.float64).values)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(np.argmax(mat @ c.T, axis=1).astype("int32"))

    return vecs.withColumn("cluster_id", assign(F.col("embedding")))


def ivf_topk(
    vecs: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine within the nprobe nearest clusters only.

    The cluster filter is an IN-list predicate — over a table
    partitioned by cluster_id it prunes at the scan. Final distance is
    exact cosine on the surviving fraction (~nprobe/k of the data).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    probe_ids = np.argsort(-(cn @ (q / np.linalg.norm(q))))[:nprobe].tolist()

    assigned = assign_clusters(vecs, centroids)
    qlist = q.tolist()

    @F.pandas_udf("double")
    def cos_to_query(emb: pd.Series) -> pd.Series:
        qv = np.asarray(qlist)
        qv = qv / np.linalg.norm(qv)
        mat = np.stack(emb.apply(np.asarray, dtype=np.float64).values)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(mat @ qv)

    return (
        assigned.where(F.col("cluster_id").isin(probe_ids))
        .select(
            id_col,
            "cluster_id",
            F.round(cos_to_query(F.col("embedding")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )
