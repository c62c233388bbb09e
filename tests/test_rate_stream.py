"""Rate-source generator: schema contract + a short live run."""

from __future__ import annotations

from dataingestiontohana_spark.sources.generator import (
    SENSOR_SCHEMA,
    sensor_rate_stream,
)


def test_rate_stream_schema_matches_sensor_schema(spark):
    stream = sensor_rate_stream(spark, rows_per_second=10)
    assert stream.isStreaming
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in SENSOR_SCHEMA.fields
    ]
    assert dict((f.name, f.dataType.simpleString()) for f in stream.schema.fields)[
        "temperature"
    ] == "double"


def test_rate_stream_produces_rows(spark, tmp_path):
    stream = sensor_rate_stream(spark, rows_per_second=200)
    seen: list[int] = []
    q = (
        stream.writeStream.foreachBatch(lambda df, e: seen.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        import time

        deadline = time.time() + 20
        while sum(seen) == 0 and time.time() < deadline:
            time.sleep(0.5)
    finally:
        q.stop()
    assert sum(seen) > 0
