"""End-to-end training-data pipeline composition: raw documents ->
quality gate -> PII scrub -> context-window chunks -> packed
sequences -> partitioned parquet. Each stage is covered by its own
oracle/test; this asserts the STAGES COMPOSE — schemas line up, row
accounting holds through the whole dataflow, and the landed layout is
the partition-pruned shape downstream training jobs read."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.chunking import (
    chunk_windows,
    pack_chunks,
)
from dataingestiontohana_spark.plans.llm_quality import redact_pii
from tests.conftest import SF0001


def test_corpus_to_training_windows_pipeline(spark, tmp_path):
    docs = load_table(spark, SF0001, "documents")
    n_docs = docs.count()

    # 1. quality gate: drop ultra-short docs (token floor)
    gated = docs.where(F.size(F.split(F.col("text"), r"\s+")) >= 5)
    n_gated = gated.count()
    assert 0 < n_gated <= n_docs

    # 2. PII scrub: redacted text replaces the raw column
    n_e, n_i, n_p, red = redact_pii(F.col("text"))
    clean = gated.select("doc_id", "source", red.alias("text"))

    # 3. chunk + 4. pack
    chunks = chunk_windows(clean, chunk_tokens=64, overlap=8)
    n_chunks = chunks.count()
    assert n_chunks >= n_gated  # every surviving doc yields >= 1 chunk
    packs = pack_chunks(chunks, budget_tokens=512, n_buckets=4)

    # token accounting survives the whole pipeline
    assert (
        packs.agg(F.sum("n_tokens")).head()[0]
        == chunks.agg(F.sum("n_tokens")).head()[0]
    )

    # 5. land as bucket-partitioned parquet (the training-reader layout)
    out = str(tmp_path / "train")
    packs.write.partitionBy("bucket").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == packs.count()
    # partition pruning reaches the directory level for bucket reads
    plan = (
        back.where(F.col("bucket") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(bucket" in plan
