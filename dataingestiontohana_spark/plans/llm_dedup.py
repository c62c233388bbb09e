"""Deduplication surface over `documents` (SURVEY §2.2 LLM-data ops):
exact, MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection.

Scale design (the whole point of these operators at 100 TB):
- Exact dedup = hash-groupBy: one shuffle on a 16-byte digest, never on
  the full text. Map-side partial agg collapses within-partition dups.
- MinHash+LSH / SimHash: see operators/dedup.py — explode + codegen'd
  hash columns + partially-aggregated min/sum, one shuffle on doc_id,
  then an LSH bucket equi-join (never O(n^2) pairing).
- n-gram Jaccard verification runs only on LSH candidate pairs: LSH
  proposes, exact Jaccard disposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.functions.text import normalize_text
from dataingestiontohana_spark.operators.connected_components import (
    connected_components,
)
from dataingestiontohana_spark.operators.dedup import (
    minhash_candidates,
    shingle_hash_rows,
    shingle_sets,
    simhash_fingerprints,
)


def q29_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash-groupBy on normalized text: the surviving
    (canonical) set, one row per distinct normalized text."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.md5(normalize_text(F.col("text"))).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "n_copies")
        .orderBy("doc_id")
    )


def q30_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs with estimated Jaccard >= 0.5 via MinHash LSH."""
    d = load_table(spark, sf_dir, "documents")
    return (
        minhash_candidates(d)
        .where(F.col("jaccard_sig") >= 0.5)
        .orderBy("id_a", "id_b")
    )


def q31_simhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: docs sharing any 16-bit band of the
    64-bit fingerprint (hamming-adjacent under <=3 differing bands)."""
    d = load_table(spark, sf_dir, "documents")
    fp = simhash_fingerprints(d)
    banded = fp.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("bits"), b * 16 + 1, 16))
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a = banded.select(F.col("doc_id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
        .orderBy("id_a", "id_b")
    )


def q32_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for the MinHash candidate pairs (the verify
    stage of the near-dup pipeline). Only within-bucket pairs pay the
    set-intersection cost.
    """
    d = load_table(spark, sf_dir, "documents")
    cands = minhash_candidates(d).where(F.col("jaccard_sig") >= 0.5)
    sh = shingle_sets(d)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh_set").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.5)
        .orderBy("id_a", "id_b")
    )


def q66_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster rollup: MinHash LSH pairs -> connected
    components (iterative min-label propagation) -> cluster-size
    distribution. The end-to-end shape of corpus dedup: LSH proposes
    pairs, components turn pairs into clusters, one canonical doc per
    cluster survives. Rows-only (iterative, not SQL-expressible);
    semantics pinned by a union-find cross-check in pytest.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(d).where(F.col("jaccard_sig") >= 0.5)
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .orderBy("cluster_size")
    )


def q70_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test decontamination: test-split documents sharing any
    3-gram shingle with a train-split document, with the overlap size.

    The canonical eval-leakage check for a training corpus. Shape at
    100 TB: shingle rows shuffle once on the 8-byte shingle hash; the
    train side is distinct-reduced per shingle BEFORE the join (so a
    shingle that appears in millions of train docs contributes one
    row); the result aggregates back to one row per contaminated test
    doc. Rows-only (shingles hinge on xxhash64); semantics pinned by a
    planted-contamination pytest.
    """
    d = load_table(spark, sf_dir, "documents")
    from dataingestiontohana_spark.plans.sampling import _bucket

    b = _bucket(F.col("doc_id"), 100)
    train = d.where(b < 80)
    test = d.where(b >= 90)
    train_sh = (
        shingle_hash_rows(train).select("sh").distinct()
    )
    test_sh = shingle_hash_rows(test)
    return (
        test_sh.join(train_sh, "sh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .orderBy("doc_id")
    )


QUERIES = {
    "q29_exact_dedup": q29_exact_dedup,
    "q30_minhash_near_dup": q30_minhash_near_dup,
    "q31_simhash_clusters": q31_simhash_clusters,
    "q32_ngram_jaccard": q32_ngram_jaccard,
    "q66_dedup_clusters": q66_dedup_clusters,
    "q70_split_contamination": q70_split_contamination,
}

# q29 is SQL-expressible; the LSH pipelines (q30-q32) hinge on Spark's
# xxhash64, which DuckDB cannot reproduce -> rows-only checks (the
# pytest suite pins their semantics on planted-duplicate fixtures).
ORACLES = {
    "q29_exact_dedup": """
        WITH f AS (
          SELECT md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
                 doc_id
          FROM documents)
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM f GROUP BY fp ORDER BY doc_id
    """,
}
