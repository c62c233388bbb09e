"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's declared surface
(SURVEY.md §2.3 + LLM-data ops) for the driver's DuckDB-oracle gate.

The exported registry is the CONSOLIDATED one (plans/bundles.py): the
external harness adjudicates ~50 entries per round, so closely-related
fine-grained queries ship as typed-slot union bundles whose oracle is
the UNION ALL of the parts' oracles under identical normalization —
every fine query's full result is still value-hash-compared, nothing
is dropped. SURVEY.md §2 carries the bundle -> fine-query map; the
fine-grained registry stays importable at
``dataingestiontohana_spark.plans.QUERIES`` and is swept against the
same oracles in pytest.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataingestiontohana_spark.plans import QUERIES
from dataingestiontohana_spark.plans.bundles import build_registry

_SF0001 = "/root/testdata/sf0.001"

_DRIVER_QUERIES, _DRIVER_ORACLES = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q5-shaped multiway join + agg (q06)."""
    return QUERIES["q06_multiway_join_agg"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator/bundle from SURVEY.md §2."""
    return dict(_DRIVER_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per registry entry — since round 5 a
    key exists for EVERY entry in ``queries()`` (media decode was the
    last holdout: its synthetic payload bytes are md5-expanded from an
    ASCII seed, so the oracle recomputes every byte and the adjudicated
    columns are exact integer byte moments)."""
    return dict(_DRIVER_ORACLES)
