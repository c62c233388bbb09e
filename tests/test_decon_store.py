"""Persisted Bloom decontamination store: probe results must equal the
in-memory q95 pipeline, appends must OR bits in, the no-false-negative
routing guarantee must hold, and the probe plan must stay map-only."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.decon_store import (
    append_to_bloom_store,
    decontaminate_against_store,
    read_store_params,
    write_bloom_store,
)
from dataingestiontohana_spark.operators.dedup import shingle_string_rows
from dataingestiontohana_spark.operators.sketches import (
    bloom_positions,
    bloom_probe,
)
from dataingestiontohana_spark.plans.sampling import _bucket
from tests.conftest import SF0001

K, M = 3, 131072


def _splits(spark):
    d = load_table(spark, SF0001, "documents")
    b = _bucket(F.col("doc_id"), 100)
    return d.where(b >= 90), d.where(b < 80)  # test, train


def test_store_probe_equals_in_memory_pipeline(spark, tmp_path):
    test, train = _splits(spark)
    test_sh = shingle_string_rows(test).select("sh").distinct()
    train_sh = shingle_string_rows(train).distinct()

    store = str(tmp_path / "bloomstore")
    write_bloom_store(test_sh, store, k=K, m_bits=M)
    got = {
        r["doc_id"]: (r["n_shingles"], r["bloom_maybe"])
        for r in decontaminate_against_store(spark, train_sh, store).collect()
    }

    bloom = bloom_positions(test_sh, "sh", k=K, m_bits=M)
    want = {
        r["doc_id"]: (r["n"], r["m"])
        for r in bloom_probe(train_sh, bloom, "sh", k=K, m_bits=M)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("bloom_hit").alias("m"))
        .collect()
    }
    assert got == want and len(got) > 0


def test_no_false_negatives_and_append_ors_bits(spark, tmp_path):
    """A doc sharing a shingle with ANY stored split must score
    bloom_maybe >= its true overlap — including splits added by
    append — so routing on maybe==0 can never leak contamination."""
    test, train = _splits(spark)
    test_sh = shingle_string_rows(test).select("sh").distinct()
    train_sh = shingle_string_rows(train).distinct()

    store = str(tmp_path / "bloomstore")
    # start from HALF the test split, append the other half
    half = test_sh.where(F.abs(F.hash("sh")) % 2 == 0)
    other = test_sh.where(F.abs(F.hash("sh")) % 2 == 1)
    write_bloom_store(half, store, k=K, m_bits=M)
    append_to_bloom_store(other, store)

    probed = decontaminate_against_store(spark, train_sh, store)
    exact = (
        train_sh.join(test_sh.withColumn("_in", F.lit(1)), "sh", "left")
        .groupBy("doc_id")
        .agg(F.sum(F.coalesce(F.col("_in"), F.lit(0))).alias("true_overlap"))
    )
    j = probed.join(exact, "doc_id").collect()
    assert len(j) > 0
    assert all(r["bloom_maybe"] >= r["true_overlap"] for r in j)
    # the append genuinely contributed: some true overlap exists in
    # the appended half and is caught
    assert any(r["true_overlap"] > 0 for r in j)


def test_params_travel_with_the_store(spark, tmp_path):
    test, _ = _splits(spark)
    test_sh = shingle_string_rows(test).select("sh").distinct()
    store = str(tmp_path / "bloomstore")
    write_bloom_store(test_sh, store, k=5, m_bits=2048)
    assert read_store_params(store) == {"k": 5, "m_bits": 2048}
    # a store without its sidecar must refuse to probe (never guess)
    import os

    os.remove(os.path.join(store, "_bloom_params.json"))
    with pytest.raises(FileNotFoundError):
        decontaminate_against_store(
            spark, test_sh.withColumn("doc_id", F.lit(1)), store
        )


def test_probe_side_never_shuffles(spark, tmp_path):
    """The 100 TB contract: probing broadcasts the stored bits; the
    training side must not enter a shuffle exchange before its own
    per-doc aggregate."""
    test, train = _splits(spark)
    test_sh = shingle_string_rows(test).select("sh").distinct()
    train_sh = shingle_string_rows(train).distinct()
    store = str(tmp_path / "bloomstore")
    write_bloom_store(test_sh, store, k=K, m_bits=M)
    out = decontaminate_against_store(spark, train_sh, store)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan


def test_incomplete_rewrite_refuses_to_probe(spark, tmp_path):
    """r7 ADVICE: the sidecar write is ordered LAST and atomically; a
    crash between the positions overwrite and the sidecar must leave a
    store that REFUSES to probe (missing params), never one that
    silently probes new bits with stale (k, m_bits)."""
    import os

    from dataingestiontohana_spark.operators.decon_store import (
        _params_path,
        read_store_params,
    )

    test, train = _splits(spark)
    test_sh = shingle_string_rows(test, "text", "doc_id")
    store = str(tmp_path / "store")
    write_bloom_store(test_sh, store, k=3, m_bits=131072)
    old = read_store_params(store)
    assert old == {"k": 3, "m_bits": 131072}
    # no temp residue from the atomic replace
    assert not os.path.exists(_params_path(store) + ".tmp")

    # simulate the crash window of a re-parameterizing rewrite: the
    # sidecar removal + positions overwrite happened, the new sidecar
    # write did not. Reproduce by removing the sidecar (the rewrite's
    # first step) — a reader in this window must fail loudly.
    os.remove(_params_path(store))
    with pytest.raises(FileNotFoundError, match="incomplete rewrite"):
        read_store_params(store)
    with pytest.raises(FileNotFoundError, match="incomplete rewrite"):
        decontaminate_against_store(spark, test_sh, store)

    # a completed rewrite with NEW params is probe-able again
    write_bloom_store(test_sh, store, k=4, m_bits=65536)
    assert read_store_params(store) == {"k": 4, "m_bits": 65536}


def test_compact_bloom_store_equals_rebuild(spark, tmp_path):
    """r12 verdict item 6: appended Bloom epochs accumulate duplicate
    position rows; compaction re-ORs them into one distinct set that
    must equal a from-scratch build over the union of splits — same
    bits, same params, fewer rows — and the sidecar token survives so
    the store stays probe-able throughout."""
    from dataingestiontohana_spark.operators.decon_store import (
        compact_bloom_store,
        read_store_params,
    )

    store = str(tmp_path / "bloom")
    rebuilt = str(tmp_path / "bloom2")
    d = load_table(spark, SF0001, "documents")
    sh = shingle_string_rows(d)
    half = sh.where(F.col("doc_id") % 2 == 0).select("sh")
    other = sh.where(F.col("doc_id") % 2 == 1).select("sh")
    write_bloom_store(half, store, k=K, m_bits=M)
    append_to_bloom_store(other, store)
    append_to_bloom_store(other, store)  # replayed epoch
    before = spark.read.parquet(store + "/positions").count()
    stats = compact_bloom_store(spark, store)
    after = spark.read.parquet(store + "/positions").count()
    assert stats["rows_dropped"] == before - after > 0

    write_bloom_store(sh.select("sh"), rebuilt, k=K, m_bits=M)
    got = sorted(r["pos"] for r in
                 spark.read.parquet(store + "/positions").collect())
    want = sorted(r["pos"] for r in
                  spark.read.parquet(rebuilt + "/positions").collect())
    assert got == want and len(got) == len(set(got))
    assert read_store_params(store) == {"k": K, "m_bits": M}
