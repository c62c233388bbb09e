"""Text-pipeline column expressions: normalization, tokenization,
shingling, MinHash, SimHash.

All of these are compositions of built-in ``pyspark.sql.functions`` —
they run inside whole-stage codegen on the JVM with zero Python in the
hot path, which is what makes them viable over 100 TB of documents.

MinHash/SimHash are the standard near-duplicate primitives from
Broder (1997) "On the resemblance and containment of documents" and
Charikar (2002) "Similarity estimation techniques from rounding
algorithms"; the LSH banding analysis follows Leskovec/Rajaraman/Ullman,
"Mining of Massive Datasets" ch. 3.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace: the canonical form used for
    exact-dup fingerprints so trivially-different bytes dedup together."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """n-word shingles as array<string>; empty array when < n tokens.

    Built as transform over an index sequence — no explode, so the row
    count (and therefore shuffle width) is unchanged.
    """
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    return F.when(F.size(toks) >= n, F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<bigint>, length num_hashes).

    hash_i(S) = min over shingles s of xxhash64(i, s). xxhash64 is
    Spark's built-in 64-bit hash; seeding by prepending the hash index
    gives num_hashes independent-enough hash families without any UDF.
    Empty shingle sets get a sentinel signature of i (so two empty docs
    still collide, and never collide with non-empty ones by accident).
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.coalesce(
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(i, s))),
            i.cast("bigint"),
        ),
    )


def simhash_bits(col: Column | str, bits: int = 64) -> Column:
    """SimHash bit vector (array<int> of 0/1, length ``bits``).

    Classic bit-voting: each token votes +1/-1 on every bit of its
    64-bit hash; the sign of the per-bit sum is the fingerprint bit.
    Entirely built-in expressions (aggregate + zip_with + shiftright).
    """
    toks = tokens(col)
    zero = F.array_repeat(F.lit(0), bits)
    votes = F.aggregate(
        toks,
        zero,
        lambda acc, t: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(F.xxhash64(t), j).bitwiseAND(F.lit(1)) == 1,
                        F.lit(1),
                    ).otherwise(F.lit(-1))
                    for j in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )
    return F.transform(votes, lambda v: F.when(v > 0, F.lit(1)).otherwise(F.lit(0)))
