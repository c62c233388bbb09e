"""Declared CDC/merge queries: lake-side MERGE and SCD2 over the
customer dimension, with deterministic synthesized updates so both the
Spark operator and the SQL oracle compute the identical end state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.merge import merge_upsert, scd2_apply

EFFECTIVE = "2024-06-01 00:00:00"


def _updates(c: DataFrame) -> DataFrame:
    """Deterministic change set: every 10th customer gets +100 balance
    and a MACHINERY segment."""
    return (
        c.where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
        .withColumn("c_mktsegment", F.lit("MACHINERY"))
    )


def q53_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    merged = merge_upsert(c, _updates(c), "c_custkey")
    return merged.select(
        "c_custkey",
        F.round(F.col("c_acctbal"), 2).alias("bal"),
        "c_mktsegment",
    ).orderBy("c_custkey")


def q54_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    dim = (
        c.withColumn("valid_from", F.lit("2020-01-01 00:00:00").cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    out = scd2_apply(dim, _updates(c), "c_custkey", EFFECTIVE)
    return out.select(
        "c_custkey",
        F.round(F.col("c_acctbal"), 2).alias("bal"),
        "valid_from",
        "valid_to",
        "is_current",
    ).orderBy("c_custkey", "valid_from", F.col("is_current"))


QUERIES = {"q53_merge_upsert": q53_merge_upsert, "q54_scd2": q54_scd2}

ORACLES = {
    "q53_merge_upsert": """
        WITH upd AS (
          SELECT c_custkey, ROUND(c_acctbal + 100.0, 2) AS bal,
                 'MACHINERY' AS c_mktsegment
          FROM customer WHERE c_custkey % 10 = 0)
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal, c_mktsegment
        FROM customer WHERE c_custkey % 10 != 0
        UNION ALL SELECT * FROM upd
        ORDER BY c_custkey
    """,
    "q54_scd2": """
        WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 10 = 0
                    THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
               c_custkey % 10 != 0 AS is_current
        FROM customer
        UNION ALL
        SELECT c_custkey, ROUND(c_acctbal + 100.0, 2),
               TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
        FROM customer WHERE c_custkey % 10 = 0
        ORDER BY c_custkey, valid_from, is_current
    """,
}
