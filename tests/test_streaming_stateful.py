"""Custom stateful operator test: state carries across micro-batches."""

from __future__ import annotations

from dataingestiontohana_spark.sources.csv_envelope import parse_sensor_csv
from dataingestiontohana_spark.sources.generator import write_sensor_csv_files
from dataingestiontohana_spark.streaming.stateful import running_device_stats


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
