"""The sensor generator as a Spark 4 Python Data Source.

Reference operator R1 (`/root/reference/README.md:4,88`) exposed as a
proper ``spark.read.format("sensorgen")`` / ``spark.readStream.format(
"sensorgen")`` source via the Python Data Source API — the idiomatic
Spark 4 extension point for custom connectors (SPARK-44076).

Design: the source itself emits only the ``counter`` column, exactly
like ``spark.range``/``rate``; the sensor fields are synthesized from
the counter by the JVM-side column expressions in
:mod:`dataingestiontohana_spark.sources.generator`, so all three
generator forms (range-batch, rate-stream, python-source) produce
byte-identical rows and the per-row Python work is one tuple yield —
never per-field Python math.

What the python source adds over ``rate``: DETERMINISTIC, replayable
offsets. The stream's offset is just the next counter, so a restart
from checkpoint re-reads exactly the skipped counters
(``readBetweenOffsets``) — the generator-side half of the
exactly-once story the reference builds its delivery experiments on
(README.md:94-162); ``rate`` is wall-clock-driven and cannot replay a
range after restart.

Scale: batch partitions split the counter range round-robin, so a
1000-executor cluster generates in parallel with no driver
materialization; the stream reader is the simple (driver-prefetch)
variant, appropriate for a bounded-rate control stream, not a 100 TB
scan.

Deployment note: data-source classes pickle BY REFERENCE, so this
package must be importable by the spawned python workers — i.e. on
PYTHONPATH / shipped via ``--py-files``, the standard contract for any
Python data source. A driver-side ``sys.path`` insert is NOT enough
(verified: workers then fail with ModuleNotFoundError at
plan-creation time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

COUNTER_SCHEMA = "counter long"


class SensorCounterBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.start = int(options.get("start", 0))
        self.parts = max(1, int(options.get("numpartitions", 8)))

    def partitions(self):
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        # round-robin split of [start, start+n): partition i takes
        # counters start+i, start+i+parts, ... — even without knowing n
        # upfront every partition gets |n/parts| +- 1 rows (no skew)
        for c in range(self.start + partition.value, self.start + self.n, self.parts):
            yield (c,)


class SensorCounterStreamReader(SimpleDataSourceStreamReader):
    """Offset = the next unread counter; micro-batches advance it by
    rows_per_batch. Deterministic: batch k always holds counters
    [k*rpb, (k+1)*rpb), so checkpoint replay is exact."""

    def __init__(self, options: dict):
        self.rpb = int(options.get("rows_per_batch", 100))
        self.limit = int(options.get("limit", -1))  # -1 = unbounded

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = lo + self.rpb
        if self.limit >= 0:
            hi = min(hi, self.limit)
        return iter([(c,) for c in range(lo, hi)]), {"next": max(hi, lo)}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(c,) for c in range(start["next"], end["next"])])


class SensorCounterSource(DataSource):
    """``format("sensorgen")``: counter rows, batch + streaming."""

    @classmethod
    def name(cls) -> str:
        return "sensorgen"

    def schema(self) -> str:
        return COUNTER_SCHEMA

    def reader(self, schema) -> SensorCounterBatchReader:
        return SensorCounterBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SensorCounterStreamReader:
        return SensorCounterStreamReader(self.options)


def register_sensor_source(spark: SparkSession) -> None:
    """Idempotent registration of the sensorgen format."""
    spark.dataSource.register(SensorCounterSource)


def sensor_source_rows(
    spark: SparkSession, n: int, start: int = 0, num_partitions: int = 8
) -> DataFrame:
    """Batch sensor rows through the registered python source —
    row-identical to :func:`generator.sensor_rows` (same JVM-side
    synthesis over the same counters)."""
    from dataingestiontohana_spark.sources.generator import _sensor_columns

    register_sensor_source(spark)
    counters = (
        spark.read.format("sensorgen")
        .option("n", str(n))
        .option("start", str(start))
        .option("numpartitions", str(num_partitions))
        .load()
    )
    return counters.select(*_sensor_columns(F.col("counter")))


def sensor_source_stream(
    spark: SparkSession, rows_per_batch: int = 100, limit: int = -1
) -> DataFrame:
    """Streaming sensor rows with deterministic counter offsets."""
    from dataingestiontohana_spark.sources.generator import _sensor_columns

    register_sensor_source(spark)
    counters = (
        spark.readStream.format("sensorgen")
        .option("rows_per_batch", str(rows_per_batch))
        .option("limit", str(limit))
        .load()
    )
    return counters.select(*_sensor_columns(F.col("counter")))
