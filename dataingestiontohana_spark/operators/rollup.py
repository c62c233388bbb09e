"""Hypertable-style multi-grain time rollup: ONE scan produces every
time grain of an aggregate at once.

The timeseries-store idiom (continuous aggregates over hour/day/...)
re-expressed Spark-first: compute the grain columns with `date_trunc`,
then `ROLLUP(coarse, fine)` — Catalyst expands the grouping sets inside
a single aggregation with map-side partial combine, so at 100 TB the
fact table is read ONCE for all grains instead of once per grain, and
the shuffle carries one partial-agg payload per (grain-combination,
key) rather than per input row. A `grain` label derived from
`grouping_id` tags each output row with its level.

Reference parity: the reference lands raw sensor rows and leaves
aggregation to the warehouse (`/root/reference/README.md:144-146`
table DDL); this operator is the standard downstream rollup those rows
feed, declared here so the engine covers the batch-analytics side of
the ingest->analyze story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hypertable_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: list[Column],
    coarse: str = "day",
    fine: str = "hour",
) -> DataFrame:
    """(grain, d, h, <agg columns...>) rows at three levels: fine
    within coarse, coarse alone, and the grand total — one ROLLUP
    aggregation, one scan.

    grain = fine | coarse | 'total', decoded from grouping_id
    (0 keeps both grain columns, 1 nulls the fine one, 3 nulls both).

    Internal grain columns use collision-safe names, so an input
    column named d/h is fine; the OUTPUT claims grain/d/h, so an agg
    aliased to one of those is rejected rather than silently shadowed.
    """
    reserved = {"grain", "d", "h", "__rb_d", "__rb_h", "__rb_gid"}
    rolled = (
        df.select(
            F.date_trunc(coarse, F.col(ts_col)).alias("__rb_d"),
            F.date_trunc(fine, F.col(ts_col)).alias("__rb_h"),
            "*",
        )
        .rollup("__rb_d", "__rb_h")
        .agg(F.grouping_id().alias("__rb_gid"), *aggs)
    )
    out_cols = [
        c for c in rolled.columns if c not in ("__rb_gid", "__rb_d", "__rb_h")
    ]
    clash = sorted(set(out_cols) & reserved)
    if clash:
        raise ValueError(
            f"aggregate aliases collide with rollup output columns: {clash}"
        )
    grain = (
        F.when(F.col("__rb_gid") == 0, F.lit(fine))
        .when(F.col("__rb_gid") == 1, F.lit(coarse))
        .otherwise(F.lit("total"))
    )
    return rolled.select(
        grain.alias("grain"),
        F.col("__rb_d").alias("d"),
        F.col("__rb_h").alias("h"),
        *out_cols,
    )
