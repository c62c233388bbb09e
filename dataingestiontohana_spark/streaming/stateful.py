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
