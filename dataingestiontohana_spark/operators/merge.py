"""Lake-side MERGE emulation without a transactional table format.

The relational sink (`upsert_sink.py`) covers MERGE into a database;
these operators cover the lake: Delta/Iceberg jars are absent (v1
image), so MERGE INTO over parquet is emulated with the classic
anti-join + union rewrite, and SCD2 (slowly-changing dimension,
Kimball type 2) with a close-and-append pass. Both are pure
DataFrame->DataFrame transforms: the caller owns the atomic swap
(write to a new path, flip a pointer), which is what a table format
would otherwise provide.

Scale: one shuffle each on the merge key; updates are usually tiny vs
the dimension -> broadcast them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE: rows of `updates` win on key collision, unmatched target
    rows survive — the WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT
    pair. Column sets must match."""
    survivors = target.join(F.broadcast(updates.select(key)), key, "left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    effective_ts,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    is_current: str = "is_current",
) -> DataFrame:
    """SCD type 2: close changed current rows, append new versions.

    `dim` carries (business cols..., valid_from, valid_to, is_current);
    `updates` carries the business columns only. Rows of `dim` whose key
    appears in `updates` get valid_to = effective_ts and is_current =
    false; each update row is appended with valid_from = effective_ts,
    open-ended. History rows pass through untouched.
    """
    ts = F.lit(effective_ts).cast("timestamp")
    upd_keys = F.broadcast(updates.select(key))
    closing = (
        dim.join(upd_keys, key, "left_semi")
        .where(F.col(is_current))
        .withColumn(valid_to, ts)
        .withColumn(is_current, F.lit(False))
    )
    untouched = dim.join(upd_keys, key, "left_anti").unionByName(
        dim.join(upd_keys, key, "left_semi").where(~F.col(is_current))
    )
    fresh = (
        updates.withColumn(valid_from, ts)
        .withColumn(valid_to, F.lit(None).cast("timestamp"))
        .withColumn(is_current, F.lit(True))
    )
    return untouched.unionByName(closing).unionByName(fresh)


def merge_into_partitioned(
    spark,
    path: str,
    updates: DataFrame,
    key: str,
    part_col: str,
    check_partition_moves: bool = False,
) -> list:
    """Partition-scoped MERGE into a partitioned parquet table — the
    concrete form of the 100 TB story in SCALING.md: a CDC batch must
    not rewrite 100 TB, it rewrites only the file groups it touches.

    1. The touched partition values come from the (small) update batch
       — one distinct+collect, CDC-sized by assumption.
    2. ONLY those partitions are read back (the IN-list predicate is a
       directory-pruning partition filter, verified by the partition-
       pruning plan tests) and merged with the classic
       anti-join + union (updates broadcast).
    3. The merged slice is written with DYNAMIC partition overwrite:
       Spark replaces exactly the partition directories present in the
       written frame and leaves every other partition's files
       untouched on disk (asserted file-for-file in the test).

    PRECONDITION — the partition value must be immutable per key (the
    standard partitioned-CDC contract: part_col is derived from the
    key or otherwise never changes). An update that MOVES a key to a
    new partition would leave the stale row in the old partition
    untouched — silent duplication. A partition-changing change must
    ship as an explicit delete + insert, or go through the full-table
    `merge_upsert`. Pass ``check_partition_moves=True`` to verify the
    precondition against the table (one key+partition column-pruned
    scan of the UNtouched partitions — opt-in because the scan is
    exactly the cost this operator exists to avoid); violations raise
    with the offending keys.

    The eager localCheckpoint between read and write is load-bearing:
    it materializes the merged slice on the executors and cuts the
    plan's lineage to `path`, without which Spark rejects overwriting
    a path that is also being read. Returns the touched partition
    values (callers log/audit them).

    At 100 TB: work scales with the touched slice, not the table.
    A transactional format (Delta/Iceberg) adds snapshot isolation and
    file-level (not partition-level) skipping on top of this exact
    shape; the jars are absent in this image.
    """
    touched = [r[0] for r in updates.select(part_col).distinct().collect()]
    if any(v is None for v in touched):
        # isin(touched) is NULL (not true) for NULL partition values, so
        # the null-partition slice would be excluded from the read-back
        # merge — yet dynamic overwrite would still replace the
        # __HIVE_DEFAULT_PARTITION__ directory with ONLY the update
        # rows, silently deleting its pre-existing rows (round-4
        # advice). Refuse rather than guess a semantics.
        raise ValueError(
            f"updates contain NULL {part_col!r} partition values; "
            "partition-scoped MERGE requires a concrete partition per "
            "update row (map NULLs to a sentinel partition upstream)"
        )
    if check_partition_moves:
        moved = (
            spark.read.parquet(path)
            .where(~F.col(part_col).isin(touched))
            .select(key)
            .join(F.broadcast(updates.select(key).distinct()), key, "inner")
            .limit(20)
            .collect()
        )
        if moved:
            raise ValueError(
                "updates move keys across partitions (stale copies would "
                f"survive): {[r[0] for r in moved]}"
            )
    slice_df = spark.read.parquet(path).where(F.col(part_col).isin(touched))
    merged = merge_upsert(slice_df, updates, key).localCheckpoint(eager=True)
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(part_col)
        .parquet(path)
    )
    return touched
