"""Custom stateful operator tests: state carries across micro-batches;
event-time timers close sessions exactly once the watermark passes."""

from __future__ import annotations

from dataingestiontohana_spark.sources.csv_envelope import parse_sensor_csv
from dataingestiontohana_spark.sources.generator import write_sensor_csv_files
from dataingestiontohana_spark.streaming.stateful import (
    closed_user_sessions,
    running_device_stats,
)


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    write_sensor_csv_files(spark, src, 100, files=4)
    stream = parse_sensor_csv(
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(src),
        "value",
    )
    q = (
        running_device_stats(stream)
        .writeStream.format("memory")
        .queryName("devstats")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # the LAST update per device must cover that device's full history
    rows = spark.sql(
        """
        SELECT deviceid, max(n_rows) AS n_rows, max(max_counter) AS mc,
               max(batches) AS batches
        FROM devstats GROUP BY deviceid
        """
    ).collect()
    assert sum(r["n_rows"] for r in rows) == 100
    assert max(r["mc"] for r in rows) == 99
    assert all(r["batches"] >= 1 for r in rows)
    # multiple micro-batches actually happened for at least one device
    assert max(r["batches"] for r in rows) > 1


def test_event_time_timeout_closes_sessions(spark, tmp_path):
    """Sessions emit ONLY after the watermark passes last_event + gap:
    user 1's burst closes once later data advances the watermark; the
    user whose events are still within the gap stays open (no row)."""
    import json
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(idx, rows):
        tmp = os.path.join(src, f".b{idx}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        final = os.path.join(src, f"b{idx}.json")
        os.rename(tmp, final)
        os.utime(final, (1_700_000_000 + idx, 1_700_000_000 + idx))

    # batch 0: user 1 burst at 10:00-10:10
    write(0, [
        {"user_id": 1, "ts": "2024-01-01 10:00:00"},
        {"user_id": 1, "ts": "2024-01-01 10:10:00"},
    ])
    # batch 1: user 2 far in the future -> next batch's watermark
    # (13:00) clears user 1's timeout (10:10 + 30m = 10:40)
    write(1, [{"user_id": 2, "ts": "2024-01-01 14:00:00"}])
    # batch 2: another future event so the timeout actually fires
    write(2, [{"user_id": 2, "ts": "2024-01-01 14:05:00"}])

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .json(src)
    )
    q = (
        closed_user_sessions(stream, gap_ms=30 * 60 * 1000, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    rows = {
        r["user_id"]: (r["n_events"], str(r["first_ts"]), str(r["last_ts"]))
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    # user 1's session closed with both events and the true span
    assert rows[1] == (2, "2024-01-01 10:00:00", "2024-01-01 10:10:00")
    # user 2's events are newer than the final watermark -> still open
    assert 2 not in rows
