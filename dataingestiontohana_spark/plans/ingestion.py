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
    rows on every run and any partitioning. Every value is md5-derived
    (sources/generator.py::_hash60), so since round 4 the full 11-column
    output is recomputed verbatim by the DuckDB oracle."""
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


def _q39_oracle_sql(n: int = N) -> str:
    """Every generator value recomputed in ANSI SQL: the per-salt
    60-bit hash is the leading 15 hex chars of md5('salt|counter')
    rebuilt nibble-by-nibble (strpos — big-endian, exactly Spark's
    conv(substr(md5(..),1,15),16,10)); units are (h % 1e4)/1e4 and the
    field formulas mirror generator._sensor_columns verbatim. Every
    field is an exact 4-decimal rational (see generator._unit), so
    ROUND(., 4) has no midpoints and both engines emit the identical
    double (the q71 lesson: keep every decision off the float
    boundary)."""

    def h60(salt: int) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substr(md5('{salt}|' || "
            f"CAST(counter AS VARCHAR)), {1 + p}, 1)) - 1)"
            f" * CAST({16 ** (14 - p)} AS BIGINT)"
            for p in range(15)
        )
        return f"({nib})"

    def unit(salt: int) -> str:
        return f"(({h60(salt)} % 10000) / 10000.0)"

    return f"""
        WITH c AS (SELECT CAST(range AS INT) AS counter FROM range({n}))
        SELECT counter,
               CAST({h60(0)} % 5 + 2 AS INT) AS deviceid,
               ROUND(25.0 + {unit(1)} * 1.0, 4) AS temperature,
               ROUND(47.0 + {unit(2)} * 9.0, 4) AS humidity,
               ROUND(400.0 + {unit(3)} * 600.0, 4) AS co2,
               ROUND({unit(4)} * 10.0, 4) AS co,
               ROUND({unit(5)} * 5.0, 4) AS lpg,
               ROUND({unit(6)} * 2.0, 4) AS smoke,
               CAST({h60(7)} % 2 AS INT) AS presence,
               ROUND({unit(8)} * 1000.0, 4) AS light,
               ROUND(30.0 + {unit(9)} * 60.0, 4) AS sound
        FROM c ORDER BY counter
    """


ORACLES: dict[str, str] = {
    "q39_sensor_generate": _q39_oracle_sql(),
    # q40 is an invariant audit (the q65 bounds-flag precedent): the
    # oracle states the contract — every generated row survives the
    # CSV encode/parse roundtrip and the counter stream is continuous.
    # Spark computes (total, matched, uniq, span) genuinely; a lossy
    # envelope or a hole in the counter stream breaks the match.
    "q40_sensor_csv_roundtrip": f"""
        SELECT CAST({N} AS BIGINT) AS total, CAST({N} AS BIGINT) AS matched,
               CAST({N} AS BIGINT) AS uniq, CAST({N} AS BIGINT) AS span
    """,
}
