"""Catalog: register the driver's parquet tables as temp views.

The reference declares its one schema explicitly (DDL at
``/root/reference/README.md:144-146``); here the schemas live in the
parquet footers — Spark reads them without inference cost, and Catalyst
gets column pruning + predicate pushdown into the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins. At 100TB
# the fact tables (lineitem/orders/events) grow; these stay tiny.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def local_rows(
    spark: SparkSession, rows: list, schema: str, slices: int = 1
) -> DataFrame:
    """Small driver-built row list -> DataFrame with ``slices``
    partitions.

    NOT a bare ``spark.createDataFrame(rows, schema)``: that slices
    the pickled rows into defaultParallelism partitions, so every
    materialization runs a defaultParallelism-task Python stage for a
    handful of rows (~1.3 s cold at local[32]) — and a downstream
    ``coalesce(k)`` makes it far worse, because the coalesced task
    then pays one Python-runner round trip per parent partition
    SERIALLY (measured 7.6 s to materialize a 4-row frame).
    ``parallelize(rows, slices)`` feeds the identical row-conversion
    path with one round trip per slice. Driver-small fixtures and
    collected aggregates only — real tables come from parquet."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, slices)), schema
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamps.

    The driver's `events` table stores TIMESTAMP(NANOS) which Spark 4
    rejects outright; we read nanos as epoch-long and rebuild a
    microsecond TimestampType column (integer `div`, not float division
    — ns epoch values exceed 2^53). Sub-microsecond precision is
    dropped, which is below the granularity any declared query observes.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover — conf absent on future Spark
        pass
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load parquet tables and register each as a temp view.

    Returns {name: DataFrame}. Views let the SQL surface and the
    DataFrame surface share one catalog (same Catalyst plans).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
