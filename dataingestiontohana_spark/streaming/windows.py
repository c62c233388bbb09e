"""Event-time windowed operators: tumbling / sliding / session windows
with watermarked late-data handling, plus streaming dedup.

The reference handles disorder only at the delivery layer (offsets),
never event time (SURVEY §2.2) — these complete the streaming surface
with Spark's built-ins. All functions work identically on batch frames
(window()/session_window() are ordinary expressions), which is how the
test suite cross-checks streaming output against a batch computation.

Scale: windowed aggs shuffle once on (window, keys); the watermark
bounds state so a 1000-executor job's state store stays finite under
unbounded input. Late rows beyond the watermark are dropped, the
documented Structured Streaming contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    size: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) count + value sum over tumbling windows."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size).alias("w"), "event_type")
        .agg(F.count("*").alias("c"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "c",
            "sv",
        )
    )


def sliding_counts(
    events: DataFrame,
    size: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping (sliding) windows: each event lands in size/slide
    windows; Spark expands them JVM-side (no explode in user code)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, size, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "c",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session windows: sessions close after `gap` of
    inactivity (dynamic-length windows, merged by the state store)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sv"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "user_id",
            "n_events",
            "sv",
        )
    )


def streaming_dedup(
    events: DataFrame,
    keys: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming duplicate suppression keyed like the reference's
    idempotent sink, but inside the stream: state is bounded by the
    watermark (duplicates farther apart than the watermark pass — the
    sink-side keyed upsert remains the end-to-end guarantee)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
