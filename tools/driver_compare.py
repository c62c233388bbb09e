"""Local replica of the driver's oracle gate at any sf, with the
STRICT fetch path (oracle.compare_strict): Spark via toPandas(),
DuckDB via ``.df()`` — float64/datetime64 coercion and str-level cell
equality, the representation the external harness hashes.

Usage: PYTHONPATH=/root/repo python tools/driver_compare.py [sf_dir] [names...]
"""

from __future__ import annotations

import sys


def main(sf_dir: str, only: list[str]) -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from dataingestiontohana_spark.oracle import (
        compare_strict,
        duckdb_connection,
    )

    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb_connection(sf_dir)
    bad = 0
    for name in only or qs:
        if name not in os_:
            print(f"{name}: no_oracle")
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            ok, msg = compare_strict(sdf, con, os_[name])
        except Exception as ex:  # noqa: BLE001 — sweep must report all
            print(f"{name}: ERR {type(ex).__name__}: {ex}")
            bad += 1
            continue
        if ok:
            print(f"{name}: ok ({sdf.count()} rows)")
        else:
            print(f"{name}: FAIL {msg}")
            bad += 1
    spark.stop()
    return bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.exit(1 if main(sf, sys.argv[2:]) else 0)
