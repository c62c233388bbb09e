"""Batch sink connectors (SURVEY §2.2 sinks row).

Parquet with explicit layout control is the lake path; JDBC append
reuses the upsert sink's dialect/write machinery (`operators/
upsert_sink.py`) so batch and streaming share one relational write
protocol, exactly as the reference's HANA Client serves both INSERT and
UPSERT modes (`/root/reference/README.md:78,154`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataingestiontohana_spark.operators.upsert_sink import UpsertSink


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """partition_by prunes at read time (partition columns become
    directories); max_records_per_file bounds file sizes so downstream
    scans parallelize evenly — both matter far more at 100 TB than
    locally."""
    w = df.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into files of
    ~``target_bytes``. Streaming sinks emit one file per trigger per
    partition; at 100 TB that litter costs the NEXT reader listing RPCs
    and a task per tiny file. Sizing uses the Hadoop FileSystem API, so
    any supported scheme (s3a/hdfs/file) works; the rewrite is one scan
    + one round-robin repartition (no key skew by construction).
    Returns the target file count.

    (For partitioned layouts, compact per partition directory so the
    directory structure — and read-time pruning — survives.)
    """
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, -(-total // target_bytes))  # ceil
    spark.read.parquet(src).repartition(int(n)).write.mode(
        "overwrite"
    ).parquet(dst)
    return int(n)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_relational(
    df: DataFrame, sink: UpsertSink, upsert: bool = False,
    columns: list[tuple[str, str]] | None = None,
) -> None:
    """Batch write into a relational table via the dialect seam
    (INSERT append or keyed UPSERT)."""
    if columns is not None:
        sink.ensure_table(columns, with_pk=upsert)
    sink.write(df, upsert=upsert)
