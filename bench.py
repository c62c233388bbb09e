"""Benchmark: run the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized with the noop sink (full execution, no
driver collect overhead). A warmup query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from dataingestiontohana_spark.plans.bundles import build_registry
from dataingestiontohana_spark.session import get_spark

# Bench the DRIVER-FACING registry (singles + bundles) — the same
# entries the correctness gate adjudicates, so BENCH_r{N}.json and
# CORRECTNESS_r{N}.json share keys. Each fine query still executes in
# full inside its bundle (a bundle is the union of its parts).
QUERIES, _ = build_registry()


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")

    # warmup: session + codegen + parquet footer reads
    materialize(QUERIES["q10_hash_agg"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        materialize(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "declared_query_suite_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
