"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's declared surface
(SURVEY.md §2.3 + LLM-data ops) for the driver's DuckDB-oracle gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataingestiontohana_spark.plans import ORACLES, QUERIES

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q5-shaped multiway join + agg (q06)."""
    return QUERIES["q06_multiway_join_agg"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys absent here (LSH/xxhash64
    pipelines) get the driver's weaker rows-only check and are pinned by
    pytest invariants instead."""
    return dict(ORACLES)
