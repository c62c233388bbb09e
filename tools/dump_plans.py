"""Dump .explain("formatted") for every driver-facing registry entry.

Usage: python tools/dump_plans.py <outdir> [entry ...]

Writes <outdir>/<entry>.txt. Used by the optimization rounds to commit
plans/r{N}/<entry>_before.txt / _after.txt evidence (guide §1: capture
the plan shape — Exchange count, join strategy, PushedFilters,
BatchEvalPython — before and after every change).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestiontohana_spark.plans.bundles import build_registry
from dataingestiontohana_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    os.makedirs(outdir, exist_ok=True)
    queries, _ = build_registry()
    names = sys.argv[2:] or sorted(queries)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump_plans")
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — keep dumping the rest
            plan = f"PLAN FAILED: {type(ex).__name__}: {ex}\n"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(plan)
        print(name, file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
