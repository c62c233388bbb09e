"""Query plans: the engine's declared, oracle-testable surface.

``QUERIES`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLES`` maps name -> equivalent DuckDB SQL (omitted for ops that are
not SQL-expressible; the driver then records a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dataingestiontohana_spark.plans import (
    cdc,
    crawl,
    graph,
    ingestion,
    llm_dedup,
    llm_lm,
    llm_mix,
    llm_quality,
    llm_similarity,
    llm_text,
    llm_text2,
    multimodal,
    relational,
    relational_ext,
    sampling,
    udf_surface,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

for mod in (
    relational,
    relational_ext,
    llm_text,
    llm_text2,
    llm_dedup,
    llm_lm,
    llm_mix,
    llm_quality,
    llm_similarity,
    multimodal,
    ingestion,
    crawl,
    cdc,
    udf_surface,
    sampling,
    graph,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
