"""Robustness sweep: run every declared fine query against a dataset
of EMPTY tables (correct schemas, zero rows) and report queries that
raise — the "first hour of a new deployment" failure mode, where scans
legitimately return nothing and guards (division, max, percentile
picks) must degrade to empty/NULL output instead of crashing.

Usage: python tools/empty_input_sweep.py [template_sf_dir]
Writes one line per failing query; exit 0 when all queries evaluate.
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

import pyarrow.parquet as pq


def make_empty_dataset(template_dir: str, out_dir: str) -> None:
    from dataingestiontohana_spark.catalog import TABLES

    for t in TABLES:
        src = os.path.join(template_dir, f"{t}.parquet")
        schema = pq.read_schema(src)
        pq.write_table(schema.empty_table(), os.path.join(out_dir, f"{t}.parquet"))


def main() -> int:
    template = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from dataingestiontohana_spark.plans import QUERIES
    from dataingestiontohana_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[tuple[str, str]] = []
    with tempfile.TemporaryDirectory() as d:
        make_empty_dataset(template, d)
        for name in sorted(QUERIES):
            try:
                out = QUERIES[name](spark, d)
                out.collect()
            except Exception as exc:  # noqa: BLE001 — sweep reports all
                tb = traceback.format_exc().splitlines()[-1]
                failures.append((name, tb))
                print(f"FAIL {name}: {type(exc).__name__}: {str(exc)[:160]}")
    print(f"{len(QUERIES) - len(failures)}/{len(QUERIES)} evaluate on empty input")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
