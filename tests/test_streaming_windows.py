"""Windowed streaming tests: file-source micro-batches driving
watermarked aggregations into a memory sink; late-data fixtures assert
the watermark contract (late rows dropped in append mode).
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dataingestiontohana_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    streaming_dedup,
    tumbling_counts,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def write_batch(dirname: str, idx: int, rows: list[dict]) -> None:
    """One JSON file = one micro-batch (maxFilesPerTrigger=1); distinct
    mtimes keep the file source's processing order deterministic."""
    os.makedirs(dirname, exist_ok=True)
    tmp = os.path.join(dirname, f".b{idx}.tmp")
    with open(tmp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    final = os.path.join(dirname, f"b{idx}.json")
    os.rename(tmp, final)
    mtime = 1_700_000_000 + idx
    os.utime(final, (mtime, mtime))


def ev(i, ts, user=1, etype="click", value=1.0):
    return {
        "event_id": i,
        "ts": ts,
        "user_id": user,
        "event_type": etype,
        "value": value,
    }


def run_stream(spark, src_dir, transform, query_name, output_mode="append"):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def test_tumbling_window_drops_late_data(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 0: two 10:xx clicks, one 11:xx  -> watermark (2h) ends at 09:30
    write_batch(src, 0, [
        ev(1, "2024-01-01 10:05:00"),
        ev(2, "2024-01-01 10:55:00"),
        ev(3, "2024-01-01 11:30:00"),
    ])
    # batch 1: advance event time so the NEXT batch's watermark is 13:00
    write_batch(src, 1, [ev(4, "2024-01-01 15:00:00")])
    # batch 2 runs with watermark 13:00 -> the 10:00 and 11:00 windows
    # are emitted and their state evicted during this batch
    write_batch(src, 2, [ev(6, "2024-01-01 16:00:00")])
    # batch 3: a LATE event at 10:10 — its window was already emitted in
    # a prior batch, so the row must be dropped (append-mode contract)
    write_batch(src, 3, [ev(5, "2024-01-01 10:10:00"), ev(8, "2024-01-01 17:00:00")])
    # batch 4: push watermark past every open window so all emit
    write_batch(src, 4, [ev(7, "2024-01-01 23:00:00")])

    out = run_stream(
        spark, src, lambda s: tumbling_counts(s, "1 hour", "2 hours"), "tumbling_out"
    )
    got = {
        (str(r["ws"]), r["event_type"]): r["c"]
        for r in out.collect()
    }
    # the 10:00 window counts events 1+2 only — late event 5 was dropped
    assert got[("2024-01-01 10:00:00", "click")] == 2
    assert got[("2024-01-01 11:00:00", "click")] == 1
    assert got[("2024-01-01 15:00:00", "click")] == 1


def test_sliding_windows_overlap(spark, tmp_path):
    src = str(tmp_path / "src")
    write_batch(src, 0, [ev(1, "2024-01-01 10:30:00")])
    write_batch(src, 1, [ev(2, "2024-01-02 00:00:00")])  # close everything

    out = run_stream(
        spark,
        src,
        lambda s: sliding_counts(s, "2 hours", "1 hour", "1 hour"),
        "sliding_out",
    )
    starts = sorted(
        str(r["ws"]) for r in out.collect() if r["c"] == 1 and "10:30" not in str(r["ws"])
    )
    # a 2h window sliding by 1h puts the 10:30 event in two windows
    assert "2024-01-01 09:00:00" in starts
    assert "2024-01-01 10:00:00" in starts


def test_session_window_splits_on_gap(spark, tmp_path):
    src = str(tmp_path / "src")
    # two bursts for user 1, 3 hours apart -> two sessions (gap 30m)
    write_batch(src, 0, [
        ev(1, "2024-01-01 10:00:00"),
        ev(2, "2024-01-01 10:10:00"),
        ev(3, "2024-01-01 13:00:00"),
        ev(4, "2024-01-01 13:05:00"),
    ])
    write_batch(src, 1, [ev(5, "2024-01-02 00:00:00")])  # close sessions

    out = run_stream(
        spark,
        src,
        lambda s: session_windows(s, "30 minutes", "1 hour"),
        "session_out",
    )
    sessions = [
        (str(r["ws"]), r["n_events"])
        for r in out.collect()
        if r["n_events"] >= 2
    ]
    assert ("2024-01-01 10:00:00", 2) in sessions
    assert ("2024-01-01 13:00:00", 2) in sessions


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    write_batch(src, 0, [ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00")])
    # batch 1 replays event_id=1 (same key) within the watermark + new
    write_batch(src, 1, [ev(1, "2024-01-01 10:00:00"), ev(3, "2024-01-01 10:02:00")])

    out = run_stream(
        spark,
        src,
        lambda s: streaming_dedup(s, ["event_id"], "2 hours"),
        "dedup_out",
    )
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]


def test_windowed_agg_upserts_exactly_once_across_crash(spark, tmp_path):
    """The CONTINUOUS-AGGREGATE composition: tumbling window counts in
    update mode -> keyed upsert on (window_start, event_type) -> kill
    mid-run -> checkpoint restart. The landed table must equal a batch
    recomputation over the full source exactly — updated window rows
    overwrite their previous values (idempotent by window key), and
    replayed batches converge."""
    import functools
    import sqlite3

    from dataingestiontohana_spark.operators.upsert_sink import (
        SQLiteDialect,
        UpsertSink,
    )
    from dataingestiontohana_spark.streaming.fault import (
        FaultInjector,
    )

    src = str(tmp_path / "src")
    db = str(tmp_path / "agg.db")
    # three micro-batches; batch 1 ADDS rows to batch 0's 10:00 window
    # (the update-mode overwrite case) and batch 2 opens a new window
    write_batch(src, 0, [
        ev(1, "2024-01-01 10:05:00"), ev(2, "2024-01-01 10:20:00"),
    ])
    write_batch(src, 1, [
        ev(3, "2024-01-01 10:40:00"), ev(4, "2024-01-01 11:10:00", etype="view"),
    ])
    write_batch(src, 2, [
        ev(5, "2024-01-01 12:30:00"), ev(6, "2024-01-01 12:45:00", etype="view"),
    ])

    sink = UpsertSink(
        table="win_agg",
        key_cols=["ws", "event_type"],
        dialect=SQLiteDialect(),
        connection_factory=functools.partial(sqlite3.connect, db),
        write_mode="driver",  # single-writer SQLite file
    )
    sink.ensure_table(
        [("ws", "TEXT"), ("event_type", "TEXT"), ("c", "INTEGER"),
         ("sv", "DOUBLE")],
    )
    fault = FaultInjector(
        str(tmp_path / "flag"), FaultInjector.AFTER_WRITE, at_batch=1
    )
    fault.arm()

    def agg(stream):
        return tumbling_counts(stream, size="1 hour", watermark="2 hours").select(
            F.date_format("ws", "yyyy-MM-dd HH:mm:ss").alias("ws"),
            "event_type", "c", "sv",
        )

    def upsert(batch_df, epoch_id):
        sink.write(batch_df, upsert=True)
        fault.check(FaultInjector.AFTER_WRITE)

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(src)
        )
        q = (
            agg(stream)
            .writeStream.foreachBatch(upsert)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        try:
            q.processAllAvailable()
        except Exception:
            pass
        try:
            q.stop()
            q.awaitTermination(30)
        except Exception:
            pass
        return q.exception()

    assert run() is not None  # injected crash after a sink write
    assert run() is None  # checkpoint restart drains the rest

    batch = spark.read.schema(SCHEMA).json(src)
    want = sorted(
        map(
            tuple,
            batch.groupBy(
                F.date_format(
                    F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss"
                ).alias("ws"),
                "event_type",
            )
            .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("sv"))
            .collect(),
        )
    )
    con = sqlite3.connect(db)
    got = sorted(
        map(tuple, con.execute(
            'SELECT ws, event_type, c, sv FROM "win_agg"').fetchall())
    )
    con.close()
    assert got == want and len(got) >= 4
