"""Declared batch-form ingestion queries: the reference's generator ->
CSV envelope -> typed-rows path as oracle-checkable batch operators
(the streaming/delivery forms live in streaming/ and are verified by
the invariant tests — SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.sources.csv_envelope import parse_sensor_csv
from dataingestiontohana_spark.sources.generator import (
    sensor_csv_lines,
    sensor_rows,
)

N = 1_000


def q39_sensor_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sensor generator (reference operator R1): same
    rows on every run and any partitioning (rows-only; the generator
    hinges on xxhash64)."""
    return sensor_rows(spark, N).orderBy("counter")


def q40_sensor_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate -> CSV-encode -> from_csv parse -> audit. The single
    output row must be (total=N, matched=N, uniq=N, span=N): the CSV
    envelope is lossless and the counter stream is continuous."""
    original = sensor_rows(spark, N)
    parsed = parse_sensor_csv(sensor_csv_lines(spark, N).select("value"))
    joined = original.alias("a").join(
        parsed.alias("b"), F.col("a.counter") == F.col("b.counter")
    )
    all_equal = F.when(
        F.expr(
            " AND ".join(
                f"a.{c} <=> b.{c}"
                for c in original.columns
            )
        ),
        1,
    ).otherwise(0)
    return joined.agg(
        F.count("*").alias("total"),
        F.sum(all_equal).alias("matched"),
        F.countDistinct("a.counter").alias("uniq"),
        (F.max("a.counter") - F.min("a.counter") + 1).alias("span"),
    )


QUERIES = {
    "q39_sensor_generate": q39_sensor_generate,
    "q40_sensor_csv_roundtrip": q40_sensor_csv_roundtrip,
}

ORACLES: dict[str, str] = {}
