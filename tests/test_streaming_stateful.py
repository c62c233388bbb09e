"""Custom stateful operator tests: state carries across micro-batches;
event-time timers close sessions exactly once the watermark passes."""

from __future__ import annotations

import pytest

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


class _FakeValueState:
    """Stands in for the TWS state-server-backed ValueState."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema):
        self.states[name] = _FakeValueState()
        return self.states[name]


def test_alert_processor_accumulates_multi_variable_state():
    """transformWithStateInPandas processor logic: the two named
    ValueState variables accumulate independently across batches (the
    TWS runtime itself needs protobuf — absent here — so the update
    logic is driven against fake state handles; see the wire-up test
    below for the real-runtime path)."""
    import pandas as pd

    from dataingestiontohana_spark.streaming.stateful import (
        make_alert_processor,
    )

    p = make_alert_processor(25.0)
    h = _FakeHandle()
    p.init(h)

    b1 = pd.DataFrame({"temperature": [20.0, 30.0, 26.5]})
    out1 = list(p.handleInputRows((7,), iter([b1]), None))[0]
    assert out1.iloc[0].tolist() == [7, 3, 2, 30.0]

    b2 = pd.DataFrame({"temperature": [24.0]})
    out2 = list(p.handleInputRows((7,), iter([b2]), None))[0]
    assert out2.iloc[0].tolist() == [7, 4, 2, 30.0]  # counts grow, peak holds

    assert h.states["totals"].get() == (4, 2)
    assert h.states["peak"].get() == (30.0,)


def _tws_runtime_available() -> bool:
    try:  # the TWS python runner imports protobuf at startup
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def test_tws_probe_flips_when_protobuf_appears(monkeypatch):
    """The skip probe keys on EXACTLY what the TWS runner imports
    (google.protobuf.descriptor), so installing protobuf converts the
    wire-up skip into a run with no test edits — `python
    tools/enable_tws.py` is the documented enablement check. Pinned by
    planting a stub module: the probe must flip to True."""
    import sys
    import types

    assert _tws_runtime_available() is False  # this sandbox: no protobuf
    google = types.ModuleType("google")
    protobuf = types.ModuleType("google.protobuf")
    descriptor = types.ModuleType("google.protobuf.descriptor")
    google.protobuf = protobuf
    monkeypatch.setitem(sys.modules, "google", google)
    monkeypatch.setitem(sys.modules, "google.protobuf", protobuf)
    monkeypatch.setitem(
        sys.modules, "google.protobuf.descriptor", descriptor
    )
    assert _tws_runtime_available() is True


@pytest.mark.skipif(
    not _tws_runtime_available(),
    reason="transformWithState runtime needs the protobuf package "
    "(not shipped in this sandbox); enable with `pip install "
    "'protobuf>=4.25'` — see tools/enable_tws.py",
)
def test_transform_with_state_end_to_end(spark, tmp_path):
    """Real-runtime TWS wire-up: per-device alert counts across
    micro-batches match a batch recomputation."""
    from pyspark.sql import functions as F

    from dataingestiontohana_spark.streaming.stateful import (
        device_alert_monitor,
    )

    src = str(tmp_path / "src")
    write_sensor_csv_files(spark, src, 100, files=4)
    stream = parse_sensor_csv(
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "1")
        .load(src),
        "value",
    )
    q = (
        device_alert_monitor(stream, temp_threshold=25.0)
        .writeStream.format("memory")
        .queryName("alerts")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    last = spark.sql(
        """
        SELECT deviceid, max(n_readings) AS n, max(n_alerts) AS a,
               max(max_temp) AS mt
        FROM alerts GROUP BY deviceid
        """
    ).collect()
    assert sum(r["n"] for r in last) == 100
    batch = parse_sensor_csv(spark.read.format("text").load(src), "value")
    want = {
        r["deviceid"]: (r["n"], r["a"], round(r["mt"], 4))
        for r in batch.groupBy("deviceid")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("temperature") > 25.0).cast("long")).alias("a"),
            F.max("temperature").alias("mt"),
        )
        .collect()
    }
    got = {r["deviceid"]: (r["n"], r["a"], r["mt"]) for r in last}
    assert got == want


def test_session_state_bounded_under_user_churn(spark, tmp_path):
    """State-store boundedness (r7 verdict item 7): a long stream of
    CHURNING users — every micro-batch brings brand-new user ids with
    advancing event time — must hold state O(active sessions), not
    O(users ever seen): the event-time timer evicts each closed
    session (`state.remove()`), so `numRowsTotal` plateaus while the
    cumulative distinct-user count keeps climbing. This is the
    eviction guarantee that makes the operator deployable against an
    unbounded 100 TB/day stream (state store sized by churn window,
    not history; see SCALING.md 'Streaming' for the RocksDB knob)."""
    import json
    import os

    from dataingestiontohana_spark.streaming.audit import ProgressRecorder

    src = str(tmp_path / "src")
    os.makedirs(src)
    users_per_batch, n_batches = 20, 12

    def write(idx, rows):
        tmp = os.path.join(src, f".b{idx}.tmp")
        with open(tmp, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        final = os.path.join(src, f"b{idx:03d}.json")
        os.rename(tmp, final)
        os.utime(final, (1_700_000_000 + idx, 1_700_000_000 + idx))

    # batch i: users [i*20, i*20+20) at hour i — with gap 10 min and
    # watermark 0s, the watermark at batch i (hour i) is far past
    # batch i-1's last-event + gap, so every prior batch's sessions
    # have closed and evicted by the next trigger
    for i in range(n_batches):
        base_ms = 1_704_000_000_000 + i * 3_600_000
        write(i, [
            {"user_id": i * users_per_batch + u,
             "ts": (base_ms + u * 1000) / 1000.0}
            for u in range(users_per_batch)
        ])

    stream = (
        spark.readStream.schema("user_id long, ts double")
        .option("maxFilesPerTrigger", "1")
        .json(src)
        .selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    )
    rec = ProgressRecorder()
    spark.streams.addListener(rec)
    try:
        q = (
            closed_user_sessions(
                stream, gap_ms=10 * 60 * 1000, watermark="0 seconds"
            )
            .writeStream.format("memory")
            .queryName("churn_sessions")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)
    finally:
        import time

        time.sleep(2)  # listener callbacks are async; drain
        spark.streams.removeListener(rec)

    closed = spark.sql(
        "SELECT COUNT(*) AS n, COUNT(DISTINCT user_id) AS u "
        "FROM churn_sessions"
    ).head()
    # all but the final (still-open) batch of users closed and emitted
    assert closed["n"] == closed["u"] == (n_batches - 1) * users_per_batch

    totals = [
        s["numRowsTotal"]
        for p in rec.progress
        for s in p["stateOperators"]
        if p["numInputRows"] or s["numRowsTotal"]
    ]
    assert totals, "no state metrics captured"
    # BOUNDED: the store never holds more than ~2 batches of open
    # sessions (current batch + the one the watermark is about to
    # evict), though 240 distinct users flowed through
    assert max(totals) <= 2 * users_per_batch, totals
    # and eviction really ran (rows were removed, not accumulated)
    assert max(totals) < (n_batches - 1) * users_per_batch
