"""Unit tests for vector similarity primitives and the LSH ANN path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataingestiontohana_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)
from dataingestiontohana_spark.plans.llm_similarity import lsh_signatures


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_dot_and_norm_match_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [4.0, -5.0, 6.0]
    df = spark.createDataFrame(
        [(a, b)], "a array<float>, b array<float>"
    )
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"),
        l2_norm(F.col("a")).alias("n"),
        cosine_similarity(F.col("a"), F.col("b")).alias("c"),
    ).head()
    assert row["d"] == sum(x * y for x, y in zip(a, b))
    assert abs(row["n"] - math.sqrt(14)) < 1e-12
    expected = row["d"] / (math.sqrt(14) * math.sqrt(16 + 25 + 36))
    assert abs(row["c"] - expected) < 1e-12


def test_lsh_identical_vectors_same_signature(spark):
    v = [0.1 * i for i in range(64)]
    w = [0.1 * (64 - i) for i in range(64)]
    df = _vecs(spark, [(1, v), (2, v), (3, w)])
    sigs = {r["vec_id"]: r["lsh_sig"] for r in lsh_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 16
    assert set(sigs[1]) <= {"0", "1"}


def test_embed_neardup_flags_planted_duplicate(spark, tmp_path):
    """q73 semantics on planted data: an exact copy of a probe vector is
    flagged with cos ~= 1, an orthogonal vector is not flagged."""
    from dataingestiontohana_spark.plans.llm_similarity import q73_embed_neardup

    probe = [1.0] + [0.0] * 63
    dup = list(probe)
    ortho = [0.0, 1.0] + [0.0] * 62
    near = [0.9, 0.1] + [0.0] * 62  # cos ~= 0.9939 vs probe
    df = spark.createDataFrame(
        [(0, probe, 0), (5, dup, 0), (7, ortho, 1), (9, near, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = {
        (r["probe_id"], r["vec_id"]): r["cos_sim"]
        for r in q73_embed_neardup(spark, str(tmp_path)).collect()
    }
    assert rows[(0, 5)] == 1.0
    assert abs(rows[(0, 9)] - 0.993884) < 1e-6
    assert (0, 7) not in rows
    assert (0, 0) not in rows  # self-pair excluded


def test_lsh_opposite_vectors_opposite_signature(spark):
    # distinct powers of two: no +-1-weighted subset sums to exactly 0,
    # so no hyperplane is orthogonal to v (sign ties would break the
    # antisymmetry this test asserts)
    v = [2.0 ** (-i) for i in range(64)]
    neg = [-x for x in v]
    df = _vecs(spark, [(1, v), (2, neg)])
    sigs = {r["vec_id"]: r["lsh_sig"] for r in lsh_signatures(df).collect()}
    flipped = "".join("1" if c == "0" else "0" for c in sigs[1])
    assert sigs[2] == flipped


def test_cogrouped_neardup_matches_broadcast_path(spark):
    """The executor-side salted-cogroup formulation (the path past the
    broadcast budget) must produce exactly the broadcast path's pairs."""
    from dataingestiontohana_spark.catalog import load_table
    from dataingestiontohana_spark.plans.llm_similarity import (
        embed_neardup_broadcast,
        embed_neardup_cogrouped,
    )
    from tests.conftest import SF0001

    e = load_table(spark, SF0001, "embeddings")
    probes = e.where(F.col("vec_id") % 97 == 0)
    want = sorted(
        (r["probe_id"], r["vec_id"], round(r["cos_sim"], 6))
        for r in embed_neardup_broadcast(e, probes, tau=0.32).collect()
    )
    got = sorted(
        (r["probe_id"], r["vec_id"], round(r["cos_sim"], 6))
        for r in embed_neardup_cogrouped(e, probes, tau=0.32, n_salts=5).collect()
    )
    assert got == want and len(got) > 0


def test_probe_broadcast_budget_fails_fast(spark, monkeypatch):
    """An over-budget probe shard must fail BEFORE any vector transfer
    (count prepass), pointing at the cogrouped path."""
    import pytest

    import dataingestiontohana_spark.plans.llm_similarity as sim

    df = spark.createDataFrame(
        [(i, [0.0] * 64) for i in range(4)],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setattr(sim, "_PROBE_BROADCAST_BYTES", 3 * (8 + 64 * 8))
    with pytest.raises(ValueError, match="cogrouped"):
        sim.embed_neardup_broadcast(df, df, tau=0.5)


def test_semantic_dedup_finds_planted_cluster_twins(spark):
    """SemDeDup: a near-copy of a corpus vector must land in the same
    cluster and surface as a high-cosine pair with the keep-least
    reject; the pair join must never leave the cluster (every emitted
    pair's members share an assignment)."""
    import numpy as np

    from dataingestiontohana_spark.catalog import load_table
    from dataingestiontohana_spark.operators.ivf import (
        assign_clusters,
        sample_centroids,
    )
    from dataingestiontohana_spark.plans.llm_similarity import (
        semantic_dedup_pairs,
    )
    from tests.conftest import SF0001

    e = load_table(spark, SF0001, "embeddings").select("vec_id", "embedding")
    base = e.orderBy("vec_id").limit(3).collect()
    rng = np.random.default_rng(11)
    twins = [
        (
            9_000 + i,
            [
                float(x) + float(d)
                for x, d in zip(
                    r["embedding"], rng.normal(0, 1e-3, len(r["embedding"]))
                )
            ],
        )
        for i, r in enumerate(base)
    ]
    corpus = e.unionByName(
        spark.createDataFrame(twins, "vec_id long, embedding array<double>")
    ).localCheckpoint(eager=True)
    pairs = semantic_dedup_pairs(corpus, k=8, tau=0.9).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i, r in enumerate(base):
        assert (r["vec_id"], 9_000 + i) in found
    # reject = greater id, and pairs never cross clusters
    assigned = {
        a["vec_id"]: a["cluster_id"]
        for a in assign_clusters(
            corpus, sample_centroids(corpus, k=8)
        ).select("vec_id", "cluster_id").collect()
    }
    for r in pairs:
        assert r["reject"] == r["id_b"] > r["id_a"]
        assert assigned[r["id_a"]] == assigned[r["id_b"]]
