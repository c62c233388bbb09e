"""Time every FINE query (or one bundle's parts) individually with the
noop sink — attribution inside bundles, which bench.py times as unions.

Usage: python tools/profile_fine.py [bundle_or_fine ...] [--json out]

Guide §1: measure first. The per-fine numbers here share a session and
warm shared caches within the run (corpus checkpoint cost lands on the
first part that touches it) — use for ATTRIBUTION, not as a baseline.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dataingestiontohana_spark.plans import QUERIES as FINE
from dataingestiontohana_spark.plans.bundles import BUNDLES, SINGLES
from dataingestiontohana_spark.session import get_spark


def main() -> None:
    argv = sys.argv[1:]
    out_path = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json requires an output path argument")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    names: list[str] = []
    for a in args:
        if a in BUNDLES:
            names.extend(BUNDLES[a])
        else:
            names.append(a)
    if not names:
        names = list(SINGLES)
        for parts in BUNDLES.values():
            names.extend(parts)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_fine")
    # warmup
    FINE["q10_hash_agg"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    failed: dict[str, str] = {}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            FINE[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"{timings[name]:8.3f}  {name}", file=sys.stderr)
        except Exception as ex:  # noqa: BLE001
            failed[name] = f"{type(ex).__name__}: {ex}"[:200]
            print(f"  FAIL {name}: {ex}", file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    out = {"total": round(sum(timings.values()), 3), "fine": timings}
    if failed:
        out["failed"] = failed
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
