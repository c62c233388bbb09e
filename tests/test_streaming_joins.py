"""Stream-stream join tests: two file-source streams (impressions and
clicks) joined on ad_id within an event-time bound; the left-outer
variant must emit its null-padded rows only after the watermark passes.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T

from dataingestiontohana_spark.streaming.joins import (
    stream_stream_inner,
    stream_stream_left_outer,
)

IMP_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("campaign", T.StringType()),
    ]
)
CLICK_SCHEMA = T.StructType(
    [
        T.StructField("ad_id", T.LongType()),
        T.StructField("cts", T.TimestampType()),
        T.StructField("click_id", T.LongType()),
    ]
)


def _write(dirname: str, idx: int, rows: list[dict]) -> None:
    os.makedirs(dirname, exist_ok=True)
    tmp = os.path.join(dirname, f".b{idx}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    final = os.path.join(dirname, f"b{idx}.json")
    os.rename(tmp, final)
    mtime = 1_700_000_000 + idx
    os.utime(final, (mtime, mtime))


def _streams(spark, tmp_path):
    imp_dir = str(tmp_path / "imp")
    clk_dir = str(tmp_path / "clk")
    # impressions: ads 1..3 at 10:00; clicks: ad 1 at 10:20 (in bound),
    # ad 2 at 13:00 (outside the 1h bound), ad 3 never clicked
    _write(imp_dir, 0, [
        {"ad_id": 1, "ts": "2024-01-01 10:00:00", "campaign": "c1"},
        {"ad_id": 2, "ts": "2024-01-01 10:00:00", "campaign": "c1"},
        {"ad_id": 3, "ts": "2024-01-01 10:00:00", "campaign": "c2"},
    ])
    _write(clk_dir, 0, [
        {"ad_id": 1, "cts": "2024-01-01 10:20:00", "click_id": 100},
        {"ad_id": 2, "cts": "2024-01-01 13:00:00", "click_id": 101},
    ])
    # advance BOTH watermarks far past every bound so outer rows emit
    _write(imp_dir, 1, [
        {"ad_id": 99, "ts": "2024-01-02 12:00:00", "campaign": "cx"},
    ])
    _write(clk_dir, 1, [
        {"ad_id": 99, "cts": "2024-01-02 12:00:00", "click_id": 999},
    ])
    imp = (
        spark.readStream.schema(IMP_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(imp_dir)
    )
    clk = (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(clk_dir)
    )
    return imp, clk


def _run(joined, spark, name):
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_inner_join_matches_within_bound(spark, tmp_path):
    imp, clk = _streams(spark, tmp_path)
    rows = _run(
        stream_stream_inner(
            imp, clk, "ad_id", "ts", "cts", "1 hour", "0 seconds", "1 hour"
        ),
        spark,
        "ss_inner",
    )
    got = {(r["ad_id"], r["click_id"]) for r in rows}
    assert (1, 100) in got      # clicked 20 min after impression
    assert (2, 101) not in got  # clicked 3 h later — outside the bound
    assert all(r["ad_id"] != 3 for r in rows)  # never clicked


def test_left_outer_emits_null_padded_after_watermark(spark, tmp_path):
    imp, clk = _streams(spark, tmp_path)
    rows = _run(
        stream_stream_left_outer(
            imp, clk, "ad_id", "ts", "cts", "1 hour", "0 seconds", "1 hour"
        ),
        spark,
        "ss_louter",
    )
    by_ad = {}
    for r in rows:
        by_ad.setdefault(r["ad_id"], []).append(r["click_id"])
    assert by_ad[1] == [100]          # matched normally
    assert by_ad[2] == [None]         # click outside bound -> unmatched
    assert by_ad[3] == [None]         # never clicked -> null-padded row


def test_stream_static_enrich_broadcasts_and_refreshes(spark, tmp_path):
    """Stream-static enrichment: map-side broadcast join per
    micro-batch; slowly-changing dims refresh via the foreachBatch
    re-read pattern (a running query's STATIC plan pins its file
    listing at start — verified — so the refresh happens by resolving
    the dimension inside the batch function)."""
    import json
    import os

    from dataingestiontohana_spark.streaming.joins import stream_static_enrich

    src = str(tmp_path / "src")
    dim_dir = str(tmp_path / "dim")
    os.makedirs(src)
    spark.createDataFrame(
        [(1, "lab"), (2, "roof")], "deviceid int, location string"
    ).write.parquet(dim_dir)

    with open(os.path.join(src, "a.json"), "w") as f:
        f.write(json.dumps({"counter": 0, "deviceid": 1}) + "\n")
        f.write(json.dumps({"counter": 1, "deviceid": 2}) + "\n")
        f.write(json.dumps({"counter": 2, "deviceid": 9}) + "\n")  # no dim row

    got: list[tuple] = []

    def enrich(batch_df, epoch_id):
        # re-resolve the dimension per batch: THE refresh pattern
        dim = spark.read.parquet(dim_dir)
        out = stream_static_enrich(batch_df, dim, "deviceid").select(
            "counter", "deviceid", "location"
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
        got.extend(map(tuple, out.collect()))

    stream = spark.readStream.schema("counter long, deviceid int").json(src)
    q = (
        stream.writeStream.foreachBatch(enrich)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    assert sorted(got) == [(0, 1, "lab"), (1, 2, "roof"), (2, 9, None)]

    # dim grows between micro-batches; the re-read picks it up live
    spark.createDataFrame(
        [(9, "yard")], "deviceid int, location string"
    ).write.mode("append").parquet(dim_dir)
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write(json.dumps({"counter": 3, "deviceid": 9}) + "\n")
    got.clear()
    q.processAllAvailable()
    q.stop()
    assert got == [(3, 9, "yard")]
