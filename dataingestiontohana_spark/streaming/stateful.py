"""Custom stateful streaming operators: applyInPandasWithState and the
Spark 4 transformWithStateInPandas arbitrary-state API.

The reference's only stateful operator is Simulate Error's boolean flag
held across messages (`/root/reference/README.md:45-63`, R8). The
engine generalizes that shape to the canonical custom-state operator:
per-key state carried across micro-batches with explicit update logic —
here a per-device running monitor (count, cumulative value, max
counter seen) that emits one updated row per device per batch.

Two state APIs on purpose: ``applyInPandasWithState`` (one positional
state tuple + timeout conf — the Spark 3.x shape) and the Spark 4
``StatefulProcessor``/``transformWithStateInPandas`` model, which
carries MULTIPLE named state variables per key (value/list/map state)
with independent lifecycles — the idiomatic target for new stateful
operators.

Scale: state is partitioned by the grouping key in the state store;
each micro-batch shuffles only that key. State size is O(distinct
keys), not O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "deviceid int, batches int, n_rows long, total_temp double, max_counter int"
)
STATE_SCHEMA = "batches int, n_rows long, total_temp double, max_counter int"


def _update_device_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        batches, n_rows, total_temp, max_counter = state.get
    else:
        batches, n_rows, total_temp, max_counter = 0, 0, 0.0, -1
    for pdf in pdfs:
        batches += 1
        n_rows += len(pdf)
        total_temp += float(pdf["temperature"].sum())
        max_counter = max(max_counter, int(pdf["counter"].max()))
    state.update((batches, n_rows, total_temp, max_counter))
    yield pd.DataFrame(
        [(key[0], batches, n_rows, round(total_temp, 4), max_counter)],
        columns=["deviceid", "batches", "n_rows", "total_temp", "max_counter"],
    )


def running_device_stats(sensor_stream: DataFrame) -> DataFrame:
    """Per-device running stats across micro-batches (update mode)."""
    return sensor_stream.groupBy("deviceid").applyInPandasWithState(
        _update_device_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, n_events long, first_ts timestamp, last_ts timestamp"
)
SESSION_STATE_SCHEMA = "n_events long, first_ms long, last_ms long"


def closed_user_sessions(
    events: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom sessionization with EXPLICIT state + event-time timers:
    a session closes (and only then emits) once the watermark passes
    gap_ms beyond its last event — the full GroupState lifecycle
    (exists/get/update/remove/hasTimedOut/setTimeoutTimestamp), which
    the built-in `session_window` aggregation cannot express when the
    per-session logic grows beyond an aggregate (this is the shape for
    e.g. emit-once funnels or per-session anomaly flags).

    Scale: state is one (count, first, last) triple per OPEN session,
    hash-partitioned by user — O(active users), not O(events); the
    timer eviction is the state-bound guarantee under unbounded input.
    """

    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ms, last_ms = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    (
                        key[0],
                        n,
                        pd.Timestamp(first_ms, unit="ms"),
                        pd.Timestamp(last_ms, unit="ms"),
                    )
                ],
                columns=["user_id", "n_events", "first_ts", "last_ts"],
            )
            return
        n, first_ms, last_ms = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            if pdf.empty:
                continue
            ms = (pdf[ts_col].astype("int64") // 1_000_000).astype("int64")
            n += len(pdf)
            lo, hi = int(ms.min()), int(ms.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
        state.update((n, first_ms, last_ms))
        # close when the WATERMARK (event time) passes last event + gap
        state.setTimeoutTimestamp(last_ms + gap_ms)
        yield pd.DataFrame(
            columns=["user_id", "n_events", "first_ts", "last_ts"]
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


ALERT_OUTPUT_SCHEMA = (
    "deviceid int, n_readings long, n_alerts long, max_temp double"
)


def device_alert_monitor(
    sensor_stream: DataFrame, temp_threshold: float = 25.0
) -> DataFrame:
    """Per-device over-threshold alert tracking via the Spark 4
    ``transformWithStateInPandas`` arbitrary-state API.

    Two independently-named ValueState variables per device ("totals":
    reading/alert counts; "peak": max temperature) — the multi-variable
    state model that ``applyInPandasWithState``'s single positional
    tuple cannot express (there, every state change rewrites the whole
    tuple; here each variable has its own slot in the state store and
    can be evolved/TTL'd independently). Emits one updated row per
    device per micro-batch that saw data (update mode).

    Scale: identical state-store partitioning to the GroupState path —
    state is hash-partitioned by deviceid, O(devices) entries, and each
    micro-batch shuffles only the new rows.

    Runtime requirement: the transformWithState Python runner speaks
    protobuf to its JVM-side state server, so the cluster needs the
    ``protobuf`` package next to pyspark (absent in this build sandbox
    — the wire-up test skips there; the processor's update logic is
    unit-tested against fake state handles instead).
    """
    return sensor_stream.groupBy("deviceid").transformWithStateInPandas(
        statefulProcessor=make_alert_processor(temp_threshold),
        outputStructType=ALERT_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )


def make_alert_processor(temp_threshold: float):
    """Build the StatefulProcessor for :func:`device_alert_monitor`.

    Factory (not a module-level class) because StatefulProcessor's
    import pulls streaming-runtime modules best kept off the executor
    import path until used; the returned instance pickles with its
    threshold baked in.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    threshold = float(temp_threshold)

    class _AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n_readings long, n_alerts long"
            )
            self._peak = handle.getValueState("peak", "max_temp double")

        def handleInputRows(self, key, rows, timerValues):
            n, alerts = (
                tuple(self._totals.get()) if self._totals.exists() else (0, 0)
            )
            peak = self._peak.get()[0] if self._peak.exists() else None
            for pdf in rows:
                if pdf.empty:
                    continue
                n += len(pdf)
                alerts += int((pdf["temperature"] > threshold).sum())
                hi = float(pdf["temperature"].max())
                peak = hi if peak is None else max(peak, hi)
            self._totals.update((n, alerts))
            if peak is not None:
                self._peak.update((peak,))
            yield pd.DataFrame(
                [(key[0], n, alerts, round(peak, 4) if peak is not None else None)],
                columns=["deviceid", "n_readings", "n_alerts", "max_temp"],
            )

        def close(self) -> None:
            pass

    return _AlertProcessor()
