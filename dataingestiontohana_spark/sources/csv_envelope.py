"""CSV message-body parsing: the projection the reference performs
implicitly at the HANA boundary (CSV string -> 11 typed columns,
`/root/reference/README.md:4` + DDL at `README.md:145`).

`from_csv` is a built-in JVM expression — the parse happens inside
whole-stage codegen, one pass, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataingestiontohana_spark.sources.generator import SENSOR_DDL


def parse_sensor_csv(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a CSV message-body column into typed sensor rows.

    Accepts string or binary (Kafka `value`) columns; malformed rows
    yield nulls in the struct (PERMISSIVE), mirroring the reference's
    pass-through-then-fail-at-DB behavior without killing the stream.
    """
    body: Column = F.col(value_col).cast("string")
    parsed = F.from_csv(body, F.lit(SENSOR_DDL))
    return df.withColumn("_row", parsed).select("_row.*")


def parse_sensor_csv_quarantine(
    df: DataFrame, value_col: str = "value"
) -> DataFrame:
    """Parse with a dead-letter column: malformed bodies land verbatim
    in ``_corrupt`` (null for clean rows) instead of silently nulling
    fields. Callers fork the stream with two filters on one parse:

        parsed = parse_sensor_csv_quarantine(stream)
        good = parsed.where("_corrupt IS NULL").drop("_corrupt")
        dead = parsed.where("_corrupt IS NOT NULL").select("_corrupt")

    Both branches stay whole-stage codegen; the quarantine table keeps
    the original bytes so failed messages are replayable after a fix —
    the production upgrade of the reference's fail-at-DB behavior.
    """
    body: Column = F.col(value_col).cast("string")
    parsed = F.from_csv(
        body,
        F.lit(SENSOR_DDL + ", _corrupt string"),
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    return df.withColumn("_row", parsed).select("_row.*")


def parse_json_quarantine(
    df: DataFrame, schema_ddl: str, value_col: str = "value"
) -> DataFrame:
    """JSON twin of :func:`parse_sensor_csv_quarantine`: parse a JSON
    message body into typed columns with malformed bodies landing
    verbatim in ``_corrupt`` — the quarantine contract is identical
    across envelope formats, so a pipeline can switch its wire format
    without changing its dead-letter handling. `from_json` is a
    built-in JVM expression: one codegen pass, no Python."""
    body: Column = F.col(value_col).cast("string")
    parsed = F.from_json(
        body,
        schema_ddl + ", _corrupt string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    return df.withColumn("_row", parsed).select("_row.*")
