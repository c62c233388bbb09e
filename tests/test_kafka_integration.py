"""Kafka wire-path integration (reference operators R3/R4): a real
produce -> consume -> batch-upsert round-trip, run ONLY when the
environment provides both the connector jar's Maven repo and a live
broker. In the build sandbox neither exists, so this skips cleanly —
the option-mapping builders stay unit-tested in test_kafka_config.py.

To run for real: start a broker (e.g. localhost:9092 or point
$KAFKA_BOOTSTRAP at one) on a machine with Maven access.
"""

from __future__ import annotations

import os
import socket
import uuid

import pytest

KAFKA_PKG = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2"
BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP", "localhost:9092")
MAVEN = ("repo1.maven.org", 443)


def _reachable(host: str, port: int, timeout: float = 2.0) -> bool:
    try:
        with socket.create_connection((host, port), timeout=timeout):
            return True
    except OSError:
        return False


def _broker_addr() -> tuple[str, int]:
    host, _, port = BOOTSTRAP.partition(":")
    return host, int(port or 9092)


needs_kafka = pytest.mark.skipif(
    not (_reachable(*_broker_addr()) and _reachable(*MAVEN)),
    reason=f"needs a Kafka broker at {BOOTSTRAP} and Maven access "
    "for the connector jar (absent in the build sandbox)",
)


@needs_kafka
def test_kafka_produce_consume_upsert_roundtrip(tmp_path):
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dataingestiontohana_spark.streaming.kafka import (
        kafka_sink_options,
        kafka_source,
    )

    topic = f"sensor-{uuid.uuid4().hex[:8]}"
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-it")
        .config("spark.jars.packages", KAFKA_PKG)
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    try:
        # produce: 100 generated sensor rows -> topic (R3)
        src = spark.range(100).select(
            F.col("id").cast("string").alias("key"),
            F.to_json(F.struct(F.col("id").alias("counter"))).alias("value"),
        )
        writer = src.write.format("kafka")
        for k, v in kafka_sink_options(BOOTSTRAP, topic).items():
            writer = writer.option(k, v)
        writer.save()

        # consume (R4) with earliest offsets, drain one micro-batch
        stream = kafka_source(spark, brokers=BOOTSTRAP, topic=topic)
        rows: list = []
        q = (
            stream.selectExpr("CAST(key AS STRING) k", "CAST(value AS STRING) v")
            .writeStream.foreachBatch(
                lambda bdf, _bid: rows.extend(bdf.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert len(rows) == 100
        assert len({r.k for r in rows}) == 100  # upsert key uniqueness
    finally:
        spark.stop()
