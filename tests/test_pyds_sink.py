"""Python Data Source WRITER: manifest-committed JSONL sink — batch
write, idempotent streaming commit, and the custom-source-to-custom-
sink exactly-once kill/restart proof."""

from __future__ import annotations

import glob
import json
import os

from dataingestiontohana_spark.sources.pyds_sink import (
    FileCommit,
    JsonlStreamWriter,
    manifested_files,
    read_manifested,
    register_jsonl_sink,
)

SCHEMA = "counter long"


def test_batch_write_and_manifested_read(spark, tmp_path):
    out = str(tmp_path / "out")
    register_jsonl_sink(spark)
    spark.range(100).selectExpr("id AS counter").write.format(
        "jsonlsink"
    ).option("path", out).mode("append").save()
    got = sorted(
        r["counter"] for r in read_manifested(spark, out, SCHEMA).collect()
    )
    assert got == list(range(100))
    # every data file is manifested in the clean-run case
    assert sorted(glob.glob(os.path.join(out, "part-*.jsonl"))) == (
        manifested_files(out)
    )


def test_stream_commit_is_idempotent_per_batch(tmp_path):
    """Replaying commit for the same batch id REPLACES the entry — the
    file-sink analogue of the reference's keyed UPSERT idempotence."""
    out = str(tmp_path / "out")
    os.makedirs(out)
    w = JsonlStreamWriter({"path": out})
    first = [FileCommit(path=os.path.join(out, "a.jsonl"), rows=5)]
    replay = [FileCommit(path=os.path.join(out, "b.jsonl"), rows=5)]
    w.commit(first, batchId=2)
    w.commit(replay, batchId=2)  # the replayed attempt wins, no append
    with open(os.path.join(out, "_manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["2"] == [{"path": os.path.join(out, "b.jsonl"), "rows": 5}]


def test_exactly_once_sensorgen_to_jsonlsink_kill_restart(spark, tmp_path):
    """Full modern-extension-point delivery proof: the sensorgen python
    SOURCE streams into the jsonlsink python WRITER, a fault kills a
    task AFTER its data file is written but BEFORE commit, the query
    restarts from checkpoint, and the manifested data still reads
    rows = uniq = span — with the crashed attempt's orphan files
    present on disk but invisible to readers."""
    from dataingestiontohana_spark.sources.pyds import register_sensor_source

    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    flag = str(tmp_path / "flag")
    register_sensor_source(spark)
    register_jsonl_sink(spark)

    def start():
        counters = (
            spark.readStream.format("sensorgen")
            .option("rows_per_batch", "20")
            .option("limit", "100")
            .load()
        )
        return (
            counters.writeStream.format("jsonlsink")
            .option("path", out)
            .option("fault_flag", flag)
            .option("checkpointLocation", ck)
            .start()
        )

    open(flag, "w").close()  # arm: first batch crashes after data write
    q = start()
    try:
        q.processAllAvailable()
    except Exception:
        pass
    try:
        q.stop()
    except Exception:
        pass
    assert q.exception() is not None  # the injected fault killed it
    os.remove(flag)  # disarm and restart from checkpoint

    q2 = start()
    q2.processAllAvailable()
    q2.stop()

    rows = [r["counter"] for r in read_manifested(spark, out, SCHEMA).collect()]
    assert sorted(rows) == list(range(100))  # rows = uniq = span
    # the crashed attempt left orphan files; the manifest hides them
    all_files = set(glob.glob(os.path.join(out, "part-*.jsonl")))
    committed = set(manifested_files(out))
    assert committed <= all_files and len(all_files) > len(committed)


def test_batch_overwrite_replaces_not_appends(spark, tmp_path):
    """mode('overwrite') must replace the manifested data (and remove
    the prior files), not accumulate both writes."""
    out = str(tmp_path / "out")
    register_jsonl_sink(spark)
    for hi in (50, 30):
        spark.range(hi).selectExpr("id AS counter").write.format(
            "jsonlsink"
        ).option("path", out).mode("overwrite").save()
    got = sorted(
        r["counter"] for r in read_manifested(spark, out, SCHEMA).collect()
    )
    assert got == list(range(30))
    # prior files physically removed, not just unmanifested
    assert sorted(glob.glob(os.path.join(out, "part-*.jsonl"))) == (
        manifested_files(out)
    )


def test_write_serializes_timestamps(spark, tmp_path):
    """Typed frames (timestamps etc.) must write without TypeError."""
    out = str(tmp_path / "out")
    register_jsonl_sink(spark)
    spark.sql(
        "SELECT 1 AS k, TIMESTAMP '2024-01-02 03:04:05' AS ts"
    ).write.format("jsonlsink").option("path", out).mode("append").save()
    rows = read_manifested(spark, out, "k long, ts string").collect()
    assert rows[0]["ts"].startswith("2024-01-02 03:04:05")


def test_write_serializes_nested_structs(spark, tmp_path):
    """Struct cells must land as JSON objects (recursive asDict), not
    repr strings."""
    out = str(tmp_path / "out")
    register_jsonl_sink(spark)
    spark.sql(
        "SELECT named_struct('k', 1, 'name', 'x') AS s, 7 AS id"
    ).write.format("jsonlsink").option("path", out).mode("append").save()
    rows = read_manifested(
        spark, out, "id long, s struct<k: long, name: string>"
    ).collect()
    assert rows[0]["s"]["k"] == 1 and rows[0]["s"]["name"] == "x"


def test_vacuum_removes_only_aged_orphans(spark, tmp_path):
    """Vacuum deletes unmanifested debris past the age guard, never
    committed files, never fresh (possibly in-flight) files."""
    import os
    import time

    from dataingestiontohana_spark.sources.pyds_sink import vacuum_orphans

    out = str(tmp_path / "out")
    register_jsonl_sink(spark)
    spark.range(10).selectExpr("id AS counter").write.format(
        "jsonlsink"
    ).option("path", out).mode("append").save()
    committed = set(manifested_files(out))

    old_orphan = os.path.join(out, "part-orphan-old.jsonl")
    new_orphan = os.path.join(out, "part-orphan-new.jsonl")
    for p in (old_orphan, new_orphan):
        with open(p, "w") as f:
            f.write('{"counter": 999}\n')
    os.utime(old_orphan, (time.time() - 7200, time.time() - 7200))

    removed = vacuum_orphans(out, min_age_seconds=3600)
    assert removed == [old_orphan]
    assert os.path.exists(new_orphan)  # age guard: maybe in-flight
    assert set(manifested_files(out)) == committed
    got = sorted(
        r["counter"] for r in read_manifested(spark, out, SCHEMA).collect()
    )
    assert got == list(range(10))  # results unchanged
