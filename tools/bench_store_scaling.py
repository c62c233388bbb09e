"""Rolling-ingest scaling proof for the incremental MinHash signature
store (`operators/dedup_store.py`): per-shard cost must stay FLAT as
the persisted corpus grows — the store's core claim (shard work scales
with the shard; the corpus side never recomputes or shuffles).

Protocol: split the sf documents table into N equal shards by
doc_id % N; seed the store with shard 0, then for each subsequent
shard time [dedup_against_store -> count, append_to_store] while the
store grows 1x, 2x, ... (N-1)x. A per-shard time that trends upward
with store size would falsify the claim; the recorded run shows it
flat within host noise while store rows grow linearly.

Usage: PYTHONPATH=/root/repo python tools/bench_store_scaling.py \
    [sf_dir] [n_shards]
Prints one JSON line: {"shards": [{"shard", "store_rows_before",
"dedup_sec", "append_sec", "pairs"}...], ...}.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time


def main(sf_dir: str, n_shards: int) -> None:
    from pyspark.sql import functions as F

    from dataingestiontohana_spark.catalog import load_table
    from dataingestiontohana_spark.operators.dedup_store import (
        append_to_store,
        dedup_against_store,
        write_signature_store,
    )
    from dataingestiontohana_spark.session import get_spark

    spark = get_spark("bench-store-scaling")
    work = tempfile.mkdtemp(prefix="store_scale_")
    store = f"{work}/sigstore"
    try:
        docs = load_table(spark, sf_dir, "documents").localCheckpoint(
            eager=True
        )
        shards = [
            docs.where(F.col("doc_id") % n_shards == k).localCheckpoint(
                eager=True
            )
            for k in range(n_shards)
        ]
        write_signature_store(shards[0], store)
        results = []
        for k in range(1, n_shards):
            store_rows = spark.read.parquet(store).count()
            t0 = time.perf_counter()
            pairs = dedup_against_store(
                spark, shards[k], store, threshold=0.5
            ).count()
            t1 = time.perf_counter()
            append_to_store(shards[k], store)
            t2 = time.perf_counter()
            results.append(
                {
                    "shard": k,
                    "store_rows_before": store_rows,
                    "dedup_sec": round(t1 - t0, 3),
                    "append_sec": round(t2 - t1, 3),
                    "pairs": pairs,
                }
            )
        dedup_secs = [r["dedup_sec"] for r in results]
        print(
            json.dumps(
                {
                    "metric": "sigstore_rolling_ingest",
                    "sf_dir": sf_dir,
                    "n_shards": n_shards,
                    "shard_docs": shards[1].count(),
                    "shards": results,
                    "dedup_sec_first": dedup_secs[0],
                    "dedup_sec_last": dedup_secs[-1],
                    "growth_ratio": round(
                        dedup_secs[-1] / dedup_secs[0], 3
                    ),
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    main(sf, n)
