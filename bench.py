"""Benchmark: run the declared query surface at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized with the noop sink (full execution, no
driver collect overhead). A warmup query absorbs JVM/codegen startup.

``--write-baseline [path]`` additionally writes a committed per-entry
baseline artifact (default BENCH_BASELINE.json): entry -> {sec,
fine_queries}, plus host class, scale factor and the shared-cost
groups whose per-entry numbers must be adjudicated as a unit. The
next round's judge compares a fresh BENCH_r{N}.json against it
mechanically with tools/check_bench.py instead of parsing prose bands.
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

    # Per-query fault isolation: a single failing plan must cost ONE
    # cell, not the whole round's numbers (round 3's bench died at
    # plan time on one query and recorded nothing).
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(QUERIES):
        t0 = time.perf_counter()
        try:
            materialize(QUERIES[name](spark, sf_dir))
        except Exception as ex:  # noqa: BLE001 — report, keep benching
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]
            continue
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "declared_query_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors

    # Streaming-ingestion throughput (SURVEY §6): exactly-once
    # IngestionPipeline rows/s with no artificial pacing — the
    # reference's actual workload, reported alongside the batch suite.
    # Fault-isolated like the per-query loop: a streaming failure costs
    # this sub-object, not the round's batch numbers.
    try:
        from bench_streaming import run_streaming_bench

        out["streaming"] = run_streaming_bench(
            spark,
            n_rows=int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", 50_000)),
            n_files=int(os.environ.get("SPARK_GRAFT_STREAM_FILES", 10)),
        )
    except Exception as ex:  # noqa: BLE001 — report, keep the batch line
        out["streaming_error"] = f"{type(ex).__name__}: {ex}"[:300]
    if "--write-baseline" in sys.argv:
        i = sys.argv.index("--write-baseline")
        path = (
            sys.argv[i + 1]
            if len(sys.argv) > i + 1 and not sys.argv[i + 1].startswith("-")
            else "BENCH_BASELINE.json"
        )
        write_baseline(out, path)
        print(f"baseline written: {path}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


# Entries that share lazily-checkpointed frames within one bench
# process (the exact-PPJoin edge set and the LSH candidate frame):
# the materialization cost lands on whichever entry runs FIRST, so a
# per-entry <=2x test must compare these as a GROUP SUM, never cell
# by cell.
SHARED_COST_GROUPS = [
    [
        "q22_29_exact_dedup",  # q203's leakage audit touches the edge cache
        "q30_31_lsh_neardup",
        "q32_70_shingle_exact",
        "q66_141_graph",
    ],
]


def write_baseline(out: dict, path: str) -> None:
    """Commit the per-entry numbers of a clean run as the next round's
    mechanical baseline (r6 verdict item 3)."""
    from dataingestiontohana_spark.plans.bundles import BUNDLES, SINGLES

    fine = {n: 1 for n in SINGLES}
    fine.update({n: len(p) for n, p in BUNDLES.items()})
    entries = {
        n: {"sec": s, "fine_queries": fine.get(n, 1)}
        for n, s in sorted(out["queries"].items())
    }
    doc = {
        "note": (
            "Per-entry bench baseline from a clean run of bench.py "
            "--write-baseline. Adjudicate a new BENCH_r{N}.json with "
            "tools/check_bench.py: per-entry sec <= factor * baseline "
            "sec (default 2x), shared_cost_groups compared as group "
            "sums. Host noise band on this VM class is wide (±20%, "
            "see BASELINE.md) — single-cell readings are not verdicts."
        ),
        "host_class": (
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}] "
            "single-JVM VM"
        ),
        "sf": out["sf"],
        "total_sec": out["value"],
        "surface": {
            "entries": len(entries),
            "fine_queries": sum(e["fine_queries"] for e in entries.values()),
        },
        "shared_cost_groups": SHARED_COST_GROUPS,
        "entries": entries,
    }
    s = out.get("streaming")
    if s:
        doc["streaming"] = {
            "warm_rows_per_sec": s["warm"]["rows_per_sec"],
            "graph_rows_per_sec": s["graph_pipeline"]["rows_per_sec"],
        }
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=False)
        fh.write("\n")


if __name__ == "__main__":
    main()
