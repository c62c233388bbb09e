"""Scale-safe global ranking: two-pass value-range-bucketed ranks.

A window like ``rank() OVER (PARTITION BY status ORDER BY value)``
concentrates every row of a partition key into ONE task — with 3
distinct statuses, 3 tasks own the whole table, which is exactly the
shape that dies at 100 TB. This operator computes the SAME exact
ranks with bounded partitions:

pass 1 (tiny aggregates):
  - per group: n, min(value), max(value)  -> broadcast
  - per (group, value-range bucket): row count -> running offset per
    bucket (a window over at most ``n_buckets`` rows per group)
pass 2 (bounded windows):
  - rank/row_number/cume within (group, bucket) + the bucket's offset
    = the global rank, because buckets partition the VALUE range:
    every row of a lower bucket sorts strictly before every row of a
    higher one, and ties (equal values) always land in the same
    bucket, so rank arithmetic composes exactly.

Each pass-2 window partition holds ~n/n_buckets rows instead of n.
Skewed value distributions make buckets uneven but never wider than
the value spread; degenerate all-equal groups collapse to one bucket
(rank is then constant anyway).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bucketed_ranks(
    df: DataFrame,
    value_col: str,
    part_cols: Sequence[str] = (),
    tie_cols: Sequence[str] = (),
    n_buckets: int = 256,
) -> DataFrame:
    """Adds exact global-rank columns computed with bounded windows:

    - ``g_n``:     rows in the group
    - ``g_rank``:  rank() over (partition by part_cols order by value)
    - ``g_cume``:  count of group rows with value <= this row's value
    - ``g_rn``:    row_number() with ties broken by ``tie_cols``
                   (only when tie_cols given)

    NULL handling (matches the window functions this replaces): rows
    with a NULL ``value_col`` land in sentinel bucket -1, which sorts
    before every value bucket — they rank first and tie with each
    other, exactly rank()/cume_dist() under default NULLS FIRST
    ordering. NULL ``part_cols`` form their own group (the internal
    joins key on a struct of the part columns, and struct equality is
    null-safe), same as window PARTITION BY. Float/double NaN sorts
    LAST in Spark's ordering; NaN rows land in sentinel bucket
    ``n_buckets`` (after every value bucket, tied together) and are
    excluded from the min/max bucketing stats they would poison.
    """
    from pyspark.sql.types import DoubleType, FloatType

    # the input feeds three plans (group stats, the stats join, bucket
    # counts): without a barrier its upstream — typically a full-table
    # aggregate — recomputes per consumer. One lazy localCheckpoint
    # materializes the (already reduced) frame on first action and the
    # other consumers reuse the executor-cached copy. Measured: q147
    # decile lift 6.6 -> ~3 s standalone at sf0.1.
    df = df.localCheckpoint(eager=False)

    part = list(part_cols)
    v = F.col(value_col)
    is_float = isinstance(df.schema[value_col].dataType, (DoubleType, FloatType))
    nan = F.isnan(v) if is_float else F.lit(False)
    # one struct key instead of the raw part columns: struct equality
    # treats NULL fields as equal, so NULL-partition rows survive the
    # stats/offsets joins exactly as PARTITION BY would keep them
    pk = F.struct(*[F.col(c) for c in part]) if part else F.lit(0)
    df = df.withColumn("__pk", pk)

    finite = F.when(~nan, v)  # NULL for NaN: min/max then skip it
    stats = df.groupBy("__pk").agg(
        F.min(finite).alias("__vmin"),
        F.max(finite).alias("__vmax"),
        F.count(F.lit(1)).alias("g_n"),
    )
    joined = df.join(F.broadcast(stats), "__pk")
    width = (F.col("__vmax") - F.col("__vmin")) / F.lit(n_buckets)
    bucket = (
        F.when(v.isNull(), F.lit(-1))  # NULLS FIRST sentinel bucket
        .when(nan, F.lit(n_buckets))  # NaN sorts last in Spark
        .when(F.col("__vmax") == F.col("__vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.floor((v - F.col("__vmin")) / width),
                F.lit(n_buckets - 1),
            )
        )
    )
    b = joined.withColumn("__bucket", bucket.cast("int"))

    counts = b.groupBy("__pk", "__bucket").agg(F.count(F.lit(1)).alias("__bc"))
    w_off = (
        Window.partitionBy("__pk")
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pk",
        "__bucket",
        F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).alias("__offset"),
    )

    b = b.join(F.broadcast(offsets), ["__pk", "__bucket"])
    w_rank = Window.partitionBy("__pk", "__bucket").orderBy(value_col)
    w_cume = w_rank.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    out = b.withColumn(
        "g_rank", (F.col("__offset") + F.rank().over(w_rank)).cast("bigint")
    ).withColumn(
        "g_cume", (F.col("__offset") + F.count(F.lit(1)).over(w_cume)).cast("bigint")
    )
    if tie_cols:
        w_rn = Window.partitionBy("__pk", "__bucket").orderBy(value_col, *tie_cols)
        out = out.withColumn(
            "g_rn", (F.col("__offset") + F.row_number().over(w_rn)).cast("bigint")
        )
    return out.drop("__pk", "__vmin", "__vmax", "__bucket", "__offset")


def exact_ntile(rn: F.Column, n: F.Column, k: int) -> F.Column:
    """NTILE(k) from a precomputed global row_number — SQL-exact tile
    assignment (first ``n % k`` tiles get ``n div k + 1`` rows) without
    the single-partition NTILE window."""
    q = F.floor(n / k)
    r = n % k
    big = q + 1  # size of the first r tiles
    in_big = rn <= r * big
    tile_big = F.floor((rn - 1) / big) + 1
    tile_small = r + F.floor((rn - 1 - r * big) / F.greatest(q, F.lit(1))) + 1
    return F.when(in_big, tile_big).otherwise(tile_small).cast("int")
