"""ANN retrieval QUALITY gates (recall@10 vs brute force).

The oracle suite proves q35/q36b are deterministic (exact-matched
against an identically-seeded SQL replay) — but determinism alone
would not notice a silently-degraded index layout that still computes
"something" reproducibly. These tests pin retrieval quality itself:

- IVF: recall@10 is monotone in nprobe, bounded below at the declared
  operating points, and EXACT (recall 1.0) at full probe — scanning
  every cluster must reproduce brute force, so any partition-layout
  corruption (wrong assignments, dropped clusters) fails loudly.
- LSH: the 2x8-bit banding must recover planted near-duplicates
  (cosine ~0.999) — the workload the signature scheme is built for.
  (Top-k recall on the random synthetic corpus is near the random
  baseline for ANY sublinear index — random Gaussian vectors carry no
  cluster structure — so near-dup recall is the honest quality axis.)

Corpus: sf0.01 embeddings (500 x 64). All seeds fixed; the measured
references were IVF mean recall 0.30 / 0.45 / 0.73 / 1.00 at nprobe
2 / 4 / 8 / 16 and planted-LSH recall 24/24.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.ivf import (
    ivf_topk,
    sample_centroids,
)
from dataingestiontohana_spark.plans.llm_similarity import lsh_signatures
from tests.conftest import SF001

N_QUERIES = 5
TOPK = 10


@pytest.fixture(scope="module")
def corpus(spark):
    e = load_table(spark, SF001, "embeddings")
    pdf = e.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].apply(np.asarray).values).astype(
        np.float64
    )
    return e, ids, mat


def _brute_topk(ids: np.ndarray, mat: np.ndarray, qi: int) -> set[int]:
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed[qi]
    order = np.argsort(-sims)
    return set([int(ids[j]) for j in order if ids[j] != ids[qi]][:TOPK])


def _ivf_recalls(spark, e, ids, mat, nprobe: int) -> list[float]:
    cents = sample_centroids(e, k=16)
    recalls = []
    for qi in range(N_QUERIES):
        qid = int(ids[qi])
        truth = _brute_topk(ids, mat, qi)
        got = {
            r["vec_id"]
            for r in ivf_topk(
                e.where(F.col("vec_id") != qid),
                [float(x) for x in mat[qi]],
                cents,
                k=TOPK,
                nprobe=nprobe,
            ).collect()
        }
        recalls.append(len(got & truth) / TOPK)
    return recalls


def test_ivf_full_probe_equals_brute_force(spark, corpus):
    """nprobe = k (scan every cluster) must reproduce the exact
    brute-force top-10 — the degenerate-case identity that catches
    wrong assignments or dropped clusters deterministically."""
    e, ids, mat = corpus
    assert _ivf_recalls(spark, e, ids, mat, nprobe=16) == [1.0] * N_QUERIES


def test_ivf_recall_monotone_in_nprobe_and_bounded(spark, corpus):
    """More probes => strictly more of the corpus scanned => mean
    recall must not drop; the declared operating points hold their
    measured floors (0.45 @ nprobe=4, 0.73 @ nprobe=8, with margin)."""
    e, ids, mat = corpus
    means = {
        p: float(np.mean(_ivf_recalls(spark, e, ids, mat, p)))
        for p in (2, 4, 8)
    }
    assert means[2] <= means[4] <= means[8]
    assert means[4] >= 0.35
    assert means[8] >= 0.6


def test_lsh_banding_recovers_planted_neardups(spark, corpus):
    """Near-duplicate recall: perturbed copies (cosine ~0.999) of 24
    corpus vectors must share at least one 8-bit LSH band with their
    original in >= 20/24 cases (analytic expectation ~0.9 per pair;
    the fixed-seed measurement is 24/24)."""
    e, ids, mat = corpus
    rng = np.random.default_rng(5)
    base_idx = rng.choice(len(ids), 24, replace=False)
    rows = [
        (int(ids[i]), [float(x) for x in mat[i]]) for i in range(len(ids))
    ]
    probes = []
    for j, i in enumerate(base_idx):
        noise = rng.normal(0, 0.02 * np.abs(mat[i]).mean(), mat.shape[1])
        probes.append((10_000 + j, [float(x) for x in mat[i] + noise],
                       int(ids[i])))
    df = spark.createDataFrame(
        rows + [(p, v) for p, v, _ in probes],
        "vec_id long, embedding array<double>",
    ).coalesce(4)
    sigs = {r["vec_id"]: r["lsh_sig"] for r in lsh_signatures(df).collect()}
    hits = sum(
        1
        for pid, _, orig in probes
        if sigs[pid][:8] == sigs[orig][:8] or sigs[pid][8:] == sigs[orig][8:]
    )
    assert hits >= 20
