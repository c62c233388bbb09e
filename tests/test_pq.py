"""Product quantization: code-space bounds, ADC-equals-brute-force on
the stored codes, compression accounting, and the retrieval-quality
gate (recall@10 vs exact search) that the oracle sweep cannot express.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.pq import (
    pq_adc_scores,
    pq_codebook,
    pq_encode,
    quantize_embeddings,
)

# the recall floors were measured at sf0.1 (the bench scale); the
# recall gate runs against that same corpus so the asserted margins
# are the measured ones (embeddings are 5,000 rows there — cheap)
from tests.conftest import SF001, SF01


def _setup(spark, sf=SF001):
    e = load_table(spark, sf, "embeddings")
    eq = quantize_embeddings(e).localCheckpoint(eager=True)
    cb = pq_codebook(eq, k_codes=16)
    return eq, cb


def test_codes_bounded_and_deterministic(spark):
    eq, cb = _setup(spark)
    enc1 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(eq, cb).collect()}
    enc2 = {r["vec_id"]: list(r["codes"]) for r in pq_encode(eq, cb).collect()}
    assert enc1 == enc2
    assert all(
        len(c) == 8 and all(0 <= x < 16 for x in c) for c in enc1.values()
    )


def test_sampled_vectors_encode_to_themselves(spark):
    """A vector that IS codebook entry j must get code j in every
    subspace (distance zero to itself; lowest-code tiebreak can only
    pick an equal-distance earlier entry, which would mean a duplicate
    codebook row — also fine, still distance zero)."""
    eq, cb = _setup(spark)
    from dataingestiontohana_spark.functions.hashing import knuth_hash32

    sampled = (
        eq.withColumn("_h", knuth_hash32("vec_id"))
        .orderBy("_h", "vec_id")
        .limit(16)
        .collect()
    )
    enc = {r["vec_id"]: list(r["codes"]) for r in pq_encode(eq, cb).collect()}
    for j, row in enumerate(sampled):
        ev = np.asarray(list(row["ev"]), dtype=np.int64)
        for s, code in enumerate(enc[row["vec_id"]]):
            got = cb[code, s * 8 : (s + 1) * 8]
            assert (got == ev[s * 8 : (s + 1) * 8]).all()


def test_adc_equals_numpy_brute_force(spark):
    eq, cb = _setup(spark)
    q_ev = [int(x) for x in eq.where(F.col("vec_id") == 0).head()["ev"]]
    enc = pq_encode(eq, cb)
    got = {
        r["vec_id"]: r["pq_dist"]
        for r in pq_adc_scores(enc, cb, q_ev).collect()
    }
    q = np.asarray(q_ev, dtype=np.int64)
    for r in enc.collect():
        codes = list(r["codes"])
        want = sum(
            int(((cb[c, s * 8 : (s + 1) * 8] - q[s * 8 : (s + 1) * 8]) ** 2).sum())
            for s, c in enumerate(codes)
        )
        assert got[r["vec_id"]] == want


def test_recall_at_10_vs_exact(spark):
    """The retrieval-quality gate approximate search lives or dies
    by, for both stages: raw ADC ranking recovers a meaningful slice
    of the true top-10, and the shipped two-stage form (ADC
    shortlist-50 -> exact re-rank, what q96 returns) recovers most of
    it. Floors reflect the 16-entry sampled codebook at sf0.1
    (measured 0.3 raw / 0.8 re-ranked); asserted, not assumed — AT
    sf0.1, the scale the numbers were measured on."""
    eq, cb = _setup(spark, SF01)
    q_ev = np.asarray(
        [int(x) for x in eq.where(F.col("vec_id") == 0).head()["ev"]],
        dtype=np.int64,
    )
    corpus = eq.where(F.col("vec_id") != 0)
    scored = {
        r["vec_id"]: r["pq_dist"]
        for r in pq_adc_scores(
            pq_encode(corpus, cb), cb, [int(x) for x in q_ev]
        ).collect()
    }
    adc_order = sorted(scored, key=lambda v: (scored[v], v))
    rows = corpus.select("vec_id", "ev").collect()
    exact_d = {
        r["vec_id"]: int(
            ((np.asarray(list(r["ev"]), dtype=np.int64) - q_ev) ** 2).sum()
        )
        for r in rows
    }
    exact10 = set(sorted(exact_d, key=lambda v: (exact_d[v], v))[:10])
    raw_recall = len(exact10 & set(adc_order[:10])) / 10
    rerank10 = set(
        sorted(adc_order[:50], key=lambda v: (exact_d[v], v))[:10]
    )
    rerank_recall = len(exact10 & rerank10) / 10
    assert raw_recall >= 0.2, f"raw ADC recall collapsed: {raw_recall}"
    assert rerank_recall >= 0.7, f"re-ranked recall: {rerank_recall}"


def test_compression_is_8_ints_per_vector(spark):
    eq, cb = _setup(spark)
    row = pq_encode(eq.limit(1), cb).head()
    assert len(row["codes"]) == 8  # vs 64 floats stored
