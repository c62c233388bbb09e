"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful operator is Simulate Error's boolean flag
held across messages (`/root/reference/README.md:45-63`, R8). The
engine generalizes that shape to the canonical custom-state operator:
per-key state carried across micro-batches with explicit update logic —
here a per-device running monitor (count, cumulative value, max
counter seen) that emits one updated row per device per batch.

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
