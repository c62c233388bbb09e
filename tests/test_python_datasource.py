"""Python Data Source tests: the sensorgen format must be
row-identical to the range-based generator in batch, honor its
partitioning option, and replay exact counter ranges from offsets in
streaming (the deterministic-replay property rate cannot give)."""

from __future__ import annotations

from dataingestiontohana_spark.sources.generator import sensor_rows
from dataingestiontohana_spark.sources.pyds import (
    SensorCounterStreamReader,
    sensor_source_rows,
    sensor_source_stream,
)


def test_batch_matches_range_generator(spark):
    got = sensor_source_rows(spark, 100, num_partitions=8)
    assert got.rdd.getNumPartitions() == 8
    want = sensor_rows(spark, 100)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_batch_start_offset_and_skew_free_split(spark):
    got = sensor_source_rows(spark, 10, start=5, num_partitions=3)
    assert sorted(r["counter"] for r in got.collect()) == list(range(5, 15))
    sizes = got.rdd.glom().map(len).collect()
    assert max(sizes) - min(sizes) <= 1  # round-robin split, no skew


def test_stream_emits_deterministic_batches(spark):
    batches: list[list[int]] = []
    q = (
        sensor_source_stream(spark, rows_per_batch=25, limit=75)
        .writeStream.foreachBatch(
            lambda df, eid: batches.append(
                sorted(r["counter"] for r in df.collect())
            )
        )
        .start()
    )
    q.processAllAvailable()
    q.stop()
    flat = [c for b in batches for c in b]
    assert sorted(flat) == list(range(75))  # every counter exactly once
    nonempty = [b for b in batches if b]
    assert all(len(b) == 25 for b in nonempty)  # rpb-sized micro-batches


def test_read_between_offsets_replays_exactly():
    r = SensorCounterStreamReader({"rows_per_batch": "10"})
    first, nxt = r.read(r.initialOffset())
    assert [t[0] for t in first] == list(range(10)) and nxt == {"next": 10}
    # a restarted query re-reading the committed range gets the
    # identical rows — the exactly-once replay contract
    replay = list(r.readBetweenOffsets({"next": 3}, {"next": 7}))
    assert [t[0] for t in replay] == [3, 4, 5, 6]
