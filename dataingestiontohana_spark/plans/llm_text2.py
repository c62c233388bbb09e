"""Additional text-pipeline queries: BPE-ish regex tokenization and an
observe-metrics audit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table

# GPT-2-style coarse approximation: letter runs, digit runs, single
# punctuation — a pattern whose semantics agree between Java regex
# (Spark) and RE2 (DuckDB), so the count is oracle-checkable.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q51_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token counting per source: regexp_count is a single
    codegen'd pass over the scan (the whitespace variant is q25)."""
    d = load_table(spark, sf_dir, "documents")
    n = F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
    return (
        d.select("doc_id", "source", n.alias("n_bpe"))
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe"),
            F.round(F.avg("n_bpe"), 2).alias("avg_bpe"),
        )
        .orderBy("source")
    )


def q52_observe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """df.observe-instrumented scan: named accumulator metrics ride the
    job (the engine's wiretap-for-batch, SURVEY §4.2 delivery-audit
    row) while the query result itself is the per-lang doc count.
    Metrics surface via QueryExecutionListener / StreamingQueryProgress
    at scale; here the observed plan must produce identical results to
    the unobserved one — which is what the oracle checks."""
    d = load_table(spark, sf_dir, "documents")
    observed = d.observe(
        "docs_audit",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    return (
        observed.groupBy("lang")
        .agg(F.count("*").alias("docs"))
        .orderBy("lang")
    )


QUERIES = {
    "q51_bpe_token_stats": q51_bpe_token_stats,
    "q52_observe_audit": q52_observe_audit,
}

ORACLES = {
    "q51_bpe_token_stats": """
        WITH t AS (
          SELECT doc_id, source,
                 len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
                 AS n_bpe
          FROM documents)
        SELECT source, COUNT(*) AS docs,
               CAST(SUM(n_bpe) AS BIGINT) AS total_bpe,
               ROUND(AVG(n_bpe), 2) AS avg_bpe
        FROM t GROUP BY source ORDER BY source
    """,
    "q52_observe_audit": """
        SELECT lang, COUNT(*) AS docs FROM documents GROUP BY lang ORDER BY lang
    """,
}
