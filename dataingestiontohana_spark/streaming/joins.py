"""Stream-stream joins: watermarked, time-bounded equi-joins between
two unbounded inputs.

The reference never joins two live streams (its one pipeline is linear:
generator -> kafka -> consumer -> sink, `README.md:16-39`); this
completes the streaming surface with Spark's built-in stream-stream
join. Semantics per the Structured Streaming contract:

- Both sides carry a watermark, and the join predicate carries an
  event-time bound (`r.ts BETWEEN l.ts - lower AND l.ts + upper`).
  Together they let the state store evict rows whose match window has
  passed — without the bound, both sides' state grows forever.
- Inner join emits as matches arrive. Left-outer additionally emits a
  null-padded row for an unmatched left row, but only once the
  watermark passes its bound (the engine must be sure no match can
  still arrive), so outer results trail the watermark by design.

Scale: state is hash-partitioned on the join key across executors;
per-key state holds only rows inside the time bound. The shuffle is
the same single exchange a batch equi-join would do; what the bound
buys is O(bound x rate) state instead of O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bounded(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    watermark: str,
    lower: str,
    upper: str,
    how: str,
) -> DataFrame:
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    # keep one copy of the key: the left side's (non-null in leftOuter)
    return l.join(r, cond, how).drop(F.col(f"r.{key}"))


def stream_stream_inner(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    lower: str = "1 hour",
    upper: str = "1 hour",
) -> DataFrame:
    """Inner stream-stream join on `key`, matches within
    [left.ts - lower, left.ts + upper]."""
    return _bounded(
        left, right, key, left_ts, right_ts, watermark, lower, upper, "inner"
    )


def stream_stream_left_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "2 hours",
    lower: str = "1 hour",
    upper: str = "1 hour",
) -> DataFrame:
    """Left-outer stream-stream join: unmatched left rows surface
    null-padded AFTER the watermark passes their match bound."""
    return _bounded(
        left, right, key, left_ts, right_ts, watermark, lower, upper, "leftOuter"
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Enrich a stream with a static dimension table — the standard
    device-metadata lookup the reference's sensor rows would get
    before landing (deviceid -> location/model/...), absent from the
    reference because its pipeline lands raw rows only.

    The dimension is broadcast: each micro-batch does a map-side hash
    join, the stream never shuffles, and no streaming state is kept
    (unlike a stream-stream join there is nothing to evict).

    Refresh contract (verified): a file-backed static side resolves
    its FILE LISTING at query start — files appended or rewritten
    later are NOT seen by the running query. A slowly-changing
    dimension therefore refreshes by re-reading inside ``foreachBatch``
    (``stream_static_enrich(batch_df, spark.read.parquet(dim_path),
    ...)`` per batch — the pattern the test pins) or by backing the
    dim with a snapshot-capable table format. At 100 TB stream scale
    the only constraint is the dimension staying broadcast-sized
    (dims that outgrow it should pre-bucket and use a regular join).
    """
    return stream.join(F.broadcast(dim), key, how)
