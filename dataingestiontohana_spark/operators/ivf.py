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
    vecs: DataFrame, k: int = 16, id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic centroid pick: the k vectors whose Knuth
    multiplicative hash of the id is smallest — stable under any
    partitioning, no RNG on the executors, and portable plain-integer
    arithmetic (the same expression the q57 sampling splits use), so
    the whole IVF pipeline is reproducible in ANSI SQL and
    DuckDB-oracle-checkable. Centroid order (= cluster_id space) is
    the hash order with id tiebreak."""
    from dataingestiontohana_spark.functions.hashing import knuth_hash32

    rows = (
        vecs.select(id_col, "embedding")
        .withColumn("_h", knuth_hash32(id_col))
        .orderBy("_h", id_col)
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


def _probe_ids(query_vec: list[float], centroids: np.ndarray, nprobe: int):
    q = np.asarray(query_vec, dtype=np.float64)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    return np.argsort(-(cn @ (q / np.linalg.norm(q))))[:nprobe].tolist()


def _cos_to_query_udf(query_vec: list[float]):
    qlist = list(map(float, query_vec))

    @F.pandas_udf("double")
    def cos_to_query(emb: pd.Series) -> pd.Series:
        qv = np.asarray(qlist)
        qv = qv / np.linalg.norm(qv)
        mat = np.stack(emb.apply(np.asarray, dtype=np.float64).values)
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        return pd.Series(mat @ qv)

    return cos_to_query


def _probe_topk(
    scan: DataFrame,
    probe_ids: list[int],
    query_vec: list[float],
    k: int,
    id_col: str,
) -> DataFrame:
    cos_to_query = _cos_to_query_udf(query_vec)
    return (
        scan.where(F.col("cluster_id").isin(probe_ids))
        .select(
            id_col,
            "cluster_id",
            F.round(cos_to_query(F.col("embedding")), 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


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
    assigned = assign_clusters(vecs, centroids)
    return _probe_topk(
        assigned, _probe_ids(query_vec, centroids, nprobe), query_vec, k, id_col
    )


_IVF_MANIFEST = "_ivf_centroids.json"


def _centroid_digest(centroids: np.ndarray) -> str:
    import hashlib

    return hashlib.md5(
        np.ascontiguousarray(centroids, dtype=np.float64).tobytes()
    ).hexdigest()


def _write_ivf_manifest(
    path: str, centroids: np.ndarray, baseline_mean_dist: float | None = None
) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    doc = {"k": int(centroids.shape[0]), "dim": int(centroids.shape[1]),
           "digest": _centroid_digest(centroids)}
    if baseline_mean_dist is not None:
        doc["baseline_mean_dist"] = float(baseline_mean_dist)
    tmp = os.path.join(path, _IVF_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(doc, f)
    os.replace(tmp, os.path.join(path, _IVF_MANIFEST))


def _check_ivf_manifest(path: str, centroids: np.ndarray, op: str) -> None:
    """The coarse quantizer is part of the index's identity: postings
    filed under one centroid set are garbage under another (silently —
    probes just miss true neighbors). Same adoption rule as the
    bucketed-layout manifest (operators/skew.py): a mismatch is an
    error, never a guess. A pre-manifest index (missing sidecar) is
    also refused — rebuild with write_ivf_index."""
    import json
    import os

    try:
        with open(os.path.join(path, _IVF_MANIFEST)) as f:
            m = json.load(f)
    except (OSError, ValueError) as ex:
        raise ValueError(
            f"{op}: no centroid manifest at {path}; rebuild the index "
            "with write_ivf_index"
        ) from ex
    if m.get("digest") != _centroid_digest(centroids):
        raise ValueError(
            f"{op}: supplied centroids do not match the index at {path} "
            f"(k={m.get('k')}, dim={m.get('dim')}) — appending or probing "
            "with a different coarse quantizer silently corrupts results; "
            "re-cluster with write_ivf_index instead"
        )


def _mean_assign_dist(assigned: DataFrame, centroids: np.ndarray) -> float:
    """Mean cosine distance (1 - cos) of every vector to its ASSIGNED
    centroid — the index's quantization-quality scalar. Map-only
    pandas UDF + one global avg: one scan, no shuffle beyond the
    final 1-row aggregate, so measuring drift on a 100 TB index costs
    one pass over the postings it already owns."""
    cents = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    cents_list = cents.tolist()

    @F.pandas_udf("double")
    def dist(emb: pd.Series, cid: pd.Series) -> pd.Series:
        c = np.asarray(cents_list)
        mat = np.stack(emb.apply(np.asarray, dtype=np.float64).values)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0  # zero vector: dist 1 - 0, never NaN
        mat = mat / norms
        sims = np.einsum(
            "ij,ij->i", mat, c[cid.to_numpy(dtype=np.int64)]
        )
        return pd.Series(1.0 - sims)

    mean = assigned.select(
        F.avg(dist(F.col("embedding"), F.col("cluster_id"))).alias("d")
    ).head()["d"]
    if mean is None:
        raise ValueError(
            "IVF index holds no postings — cannot measure assignment "
            "quality over an empty index"
        )
    return float(mean)


def write_ivf_index(vecs: DataFrame, centroids: np.ndarray, path: str) -> None:
    """Persist the inverted-file layout: one directory per cluster
    (`partitionBy("cluster_id")`), plus a centroid-manifest sidecar
    that append/query validate against (the quantizer IS the index
    identity). The manifest also records the index's BASELINE mean
    centroid-to-member distance, the drift reference `ivf_drift`
    measures against. The one-time layout cost turns every later probe
    into a storage-level partition prune — at 100 TB a query reads
    ~nprobe/k of the bytes, verified by plan + file-list in
    tests/test_ivf.py."""
    assign_clusters(vecs, centroids).write.mode("overwrite").partitionBy(
        "cluster_id"
    ).parquet(path)
    baseline = _mean_assign_dist(
        vecs.sparkSession.read.parquet(path), centroids
    )
    _write_ivf_manifest(path, centroids, baseline)


def ivf_drift(spark, path: str, centroids: np.ndarray) -> dict:
    """Quantization drift of a persisted index (r7 verdict item 6):
    appends file new vectors under FROZEN centroids, so as the corpus
    distribution moves the mean centroid-to-member distance grows and
    probe recall decays. Returns ``{mean_dist, baseline_mean_dist,
    ratio}`` where ratio = mean / baseline; 1.0 means the index still
    quantizes like the day it was built."""
    import json
    import os

    _check_ivf_manifest(path, centroids, "ivf_drift")
    with open(os.path.join(path, _IVF_MANIFEST)) as f:
        m = json.load(f)
    baseline = m.get("baseline_mean_dist")
    if baseline is None:
        raise ValueError(
            f"ivf_drift: index at {path} predates drift tracking; "
            "rebuild with write_ivf_index to record a baseline"
        )
    mean = _mean_assign_dist(spark.read.parquet(path), centroids)
    return {
        "mean_dist": mean,
        "baseline_mean_dist": float(baseline),
        "ratio": mean / float(baseline) if baseline else float("inf"),
    }


def maybe_recluster_ivf(
    spark,
    path: str,
    centroids: np.ndarray,
    threshold: float = 1.2,
    k: int | None = None,
) -> tuple[np.ndarray, bool, dict]:
    """The drift-triggered compaction step of the index lifecycle:
    measure drift; past ``threshold`` re-derive centroids over the
    CURRENT corpus (same deterministic smallest-hash pick — appended
    ids enter the candidate set, so the quantizer follows the data)
    and rewrite the whole layout with `write_ivf_index` (which records
    the fresh baseline). Below threshold the index is untouched.
    Returns (active_centroids, reclustered?, drift_stats).

    Scale shape: the trigger costs one map-only scan; the rewrite is
    the same one-time layout cost as the original build and runs only
    when quantization has measurably decayed — the standard
    append-then-compact rhythm of IVF maintenance (Jegou et al. §V)."""
    import os
    import shutil

    stats = ivf_drift(spark, path, centroids)
    if stats["ratio"] <= threshold:
        return centroids, False, stats
    grown = spark.read.parquet(path).drop("cluster_id")
    new_cents = sample_centroids(grown, k=k or int(centroids.shape[0]))
    # rebuild SIDE-BY-SIDE, then swap via rename-aside: an in-place
    # overwrite would delete the very files the rebuild job is still
    # scanning. The swap is two renames with the rmtree LAST —
    # (live -> .old, .rebuild -> live, rm .old) — so a crash at ANY
    # point leaves a recoverable directory: before the first rename
    # the live index is intact; between the renames the complete old
    # copy sits at .old (restore = one rename back); after the second
    # rename the new index is live and .old is garbage. The
    # rmtree-then-rename ordering had a window with NO directory at
    # `path` at all, where readers got a raw path-not-found instead of
    # the documented missing-manifest refusal.
    rebuild = path.rstrip("/") + ".rebuild"
    old = path.rstrip("/") + ".old"
    write_ivf_index(grown, new_cents, rebuild)
    if os.path.exists(old):  # leftover from a crashed prior swap
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(rebuild, path)
    shutil.rmtree(old)
    return new_cents, True, stats


def ivf_topk_from_index(
    spark,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the persisted IVF index: the IN-list on the partition
    column becomes directory-level pruning (PartitionFilters in the
    scan node — never touches non-probed clusters' files). The
    centroids must be the index's own (manifest-validated)."""
    _check_ivf_manifest(path, centroids, "ivf_topk_from_index")
    return _probe_topk(
        spark.read.parquet(path),
        _probe_ids(query_vec, centroids, nprobe),
        query_vec,
        k,
        id_col,
    )


def append_to_ivf_index(vecs: DataFrame, centroids: np.ndarray, path: str) -> None:
    """Incremental index maintenance: assign the NEW vectors map-only
    (same frozen centroids — the coarse quantizer must not move, or
    existing postings would be misfiled) and append into the cluster
    directories. Ingest work scales with the shard; existing postings
    never rewrite. Periodic re-clustering (new centroids + full
    write_ivf_index) is the standard compaction when drift accumulates.
    The manifest check makes the frozen-quantizer precondition a hard
    error: re-deriving centroids over the grown corpus and appending
    with them would silently misfile every new posting."""
    _check_ivf_manifest(path, centroids, "append_to_ivf_index")
    assign_clusters(vecs, centroids).write.mode("append").partitionBy(
        "cluster_id"
    ).parquet(path)


def ivf_topk_batch(
    vecs: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    qid_col: str = "query_id",
) -> DataFrame:
    """Top-k cosine per query for a BATCH of queries over the IVF
    layout — the production retrieval shape (one query at a time
    re-scans the corpus per query; batching amortizes the scan across
    the whole query set).

    How it scales:
    - The query matrix transits the driver once (Q x d, bounded like
      the probe broadcast budget — llm_similarity's q73 contract) and
      ships in the task closure with a per-query probe-cluster mask
      computed in numpy against the centroids.
    - The corpus scan filters to the UNION of all probed clusters
      (IN-list on cluster_id — directory pruning over a persisted
      index layout), so un-probed clusters are never read.
    - One mapInPandas does a B x d @ d x Q matmul per Arrow batch and
      emits (query_id, vec_id, cos_sim) ONLY where the vector's
      cluster is probed by that query — output rows = sum over
      queries of their probed-cluster sizes, the same work a
      per-query loop does, in one pass.
    - Per-query top-k is a rank window PARTITIONED by query_id (never
      a global single-partition window).

    Exactness: per (query, candidate) the cosine is dot-then-divide
    float64, identical to the single-query path — pytest pins batch ==
    per-query-loop row-for-row.

    Returns (query_id, vec_id, cos_sim, rank) with rank 1..k per
    query, ordered by (query_id, rank).
    """
    import pandas as pd
    from pyspark.sql.window import Window

    qrows = queries.select(qid_col, "embedding").collect()
    if not qrows:
        return vecs.sparkSession.createDataFrame(
            [], f"{qid_col} long, {id_col} long, cos_sim double, rank int"
        )
    qids = np.array([r[qid_col] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r["embedding"]) for r in qrows], dtype=np.float64)
    qnrm = np.linalg.norm(qmat, axis=1)
    cn = centroids / np.linalg.norm(centroids, axis=1, keepdims=True)
    # probe mask: [Q x n_clusters] bool — query q probes cluster c
    sims_qc = (qmat / qnrm[:, None]) @ cn.T
    order = np.argsort(-sims_qc, axis=1, kind="stable")
    probe = np.zeros_like(sims_qc, dtype=bool)
    for qi in range(len(qids)):
        probe[qi, order[qi, :nprobe]] = True
    probed_union = sorted({int(c) for c in np.nonzero(probe.any(axis=0))[0]})

    qids_l = qids.tolist()
    qmat_l = qmat.tolist()
    qnrm_l = qnrm.tolist()
    probe_l = probe.tolist()

    def score(it):
        qm = np.asarray(qmat_l)
        qn = np.asarray(qnrm_l)
        qi_ids = np.asarray(qids_l)
        pmask = np.asarray(probe_l)
        for pdf in it:
            if pdf.empty:
                continue
            mat = np.stack(
                pdf["embedding"].apply(np.asarray, dtype=np.float64).values
            )
            nrm = np.linalg.norm(mat, axis=1)
            cos = (mat @ qm.T) / np.outer(nrm, qn)  # B x Q
            clusters = pdf["cluster_id"].to_numpy()
            keep = pmask[:, clusters].T  # B x Q: query probes row's cluster
            bi, qi = np.nonzero(keep)
            yield pd.DataFrame(
                {
                    "query_id": qi_ids[qi],
                    id_col: pdf[id_col].to_numpy()[bi],
                    "cos_sim": cos[bi, qi],
                }
            )

    assigned = assign_clusters(vecs, centroids).where(
        F.col("cluster_id").isin(probed_union)
    )
    scored = assigned.select(id_col, "cluster_id", "embedding").mapInPandas(
        score, schema=f"query_id long, {id_col} long, cos_sim double"
    )
    # round BEFORE ranking: the single-query path orders by the
    # ROUNDED cosine (then id), so batch == loop needs the same key
    w = Window.partitionBy(qid_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.select(
            F.col("query_id").alias(qid_col),
            id_col,
            F.round("cos_sim", 4).alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy(qid_col, "rank")
    )
