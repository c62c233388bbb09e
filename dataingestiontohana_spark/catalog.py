"""Catalog: register the driver's parquet tables as temp views.

The reference declares its one schema explicitly (DDL at
``/root/reference/README.md:144-146``); here the schemas live in the
parquet footers — Spark reads them without inference cost, and Catalyst
gets column pruning + predicate pushdown into the scan for free.
"""

from __future__ import annotations

import functools
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def locked_frame_builder(fn):
    """Decorator: serialize a shared-frame cache getter on its own
    re-entrant lock. Bundle parts build on a driver thread pool
    (plans/bundles.py::_bundle_fn), and an unguarded get-or-build
    getter racing on a cold cache would construct — and at action time
    MATERIALIZE — the same checkpointed frame once per thread. The
    lock is PER GETTER (not global): different caches' builds — each
    a lazy localCheckpoint whose physical planning costs real JVM
    time — may overlap across threads; only same-cache callers
    serialize. Re-entrant because getters nest one-directionally
    (e.g. _dhash_frame -> _synthetic_media): nested acquisition of a
    DIFFERENT getter's lock cannot cycle."""
    lock = threading.RLock()

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with lock:
            return fn(*args, **kwargs)

    return wrapped

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always broadcast in joins. At 100TB
# the fact tables (lineitem/orders/events) grow; these stay tiny.
BROADCAST_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def local_rows(
    spark: SparkSession, rows: list, schema: str, slices: int = 1
) -> DataFrame:
    """Small driver-built row list -> DataFrame with ``slices``
    partitions.

    NOT a bare ``spark.createDataFrame(rows, schema)``: that slices
    the pickled rows into defaultParallelism partitions, so every
    materialization runs a defaultParallelism-task Python stage for a
    handful of rows (~1.3 s cold at local[32]) — and a downstream
    ``coalesce(k)`` makes it far worse, because the coalesced task
    then pays one Python-runner round trip per parent partition
    SERIALLY (measured 7.6 s to materialize a 4-row frame).
    ``parallelize(rows, slices)`` feeds the identical row-conversion
    path with one round trip per slice. Driver-small fixtures and
    collected aggregates only — real tables come from parquet."""
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, max(1, slices)), schema
    )


# Plan-object cache for load_table: (applicationId, sf_dir, name) ->
# the lazily-planned DataFrame. Opening a parquet relation costs
# ~110 ms of driver work (file listing + footer schema + relation
# construction) per call, and the declared surface opens the same ten
# tables ~350 times per bench pass — tens of seconds of pure plan
# re-construction (guide §5: the driver should do almost no data
# work). Reusing the IMMUTABLE DataFrame object repeats none of that
# and changes nothing downstream: the plan is lazy, every action
# still scans the parquet, no rows are ever materialized here. The
# ``_CACHE`` naming keeps it inside bench.py's shared-cache registry,
# so every bench pass still starts from a defined cold state.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


@locked_frame_builder
def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one parquet table, normalizing nanosecond timestamps.

    The driver's `events` table stores TIMESTAMP(NANOS) which Spark 4
    rejects outright; we read nanos as epoch-long and rebuild a
    microsecond TimestampType column (integer `div`, not float division
    — ns epoch values exceed 2^53). Sub-microsecond precision is
    dropped, which is below the granularity any declared query observes.
    """
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    df = _TABLE_CACHE.get(key)
    if df is not None:
        return df
    # drop entries of stopped sessions (pytest/bench restart Spark in
    # one process; frames of a dead session are unusable)
    for k in [k for k in _TABLE_CACHE if k[0] != key[0]]:
        _TABLE_CACHE.pop(k, None)
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover — conf absent on future Spark
        pass
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_CACHE[key] = df
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load parquet tables and register each as a temp view.

    Returns {name: DataFrame}. Views let the SQL surface and the
    DataFrame surface share one catalog (same Catalyst plans).
    """
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
