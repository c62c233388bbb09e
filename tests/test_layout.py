"""Z-order layout: correctness (layout never changes query results)
and the data-skipping payoff, measured from parquet footers with the
same min/max rule every stats-aware reader applies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.layout import (
    rowgroup_skip_stats,
    zorder_write,
    zvalue,
)

from tests.conftest import SF001


def test_zvalue_interleaves_bits(spark):
    row = (
        spark.range(1)
        .select(
            zvalue([F.lit(0b1010).cast("bigint"),
                    F.lit(0b0110).cast("bigint")], bits=4).alias("z")
        )
        .collect()[0]
    )
    # bit b of col i -> position 2b + i:
    # x=1010 -> bits {1,3} -> positions {2,6}; y=0110 -> bits {1,2}
    # -> positions {3,5}: z = 0b01101100
    assert row["z"] == 0b01101100


def test_zvalue_rejects_overflow(spark):
    with pytest.raises(ValueError):
        zvalue([F.lit(0)] * 4, bits=16)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    ev = load_table(spark, SF001, "events").select(
        "event_id", "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts_sec"),
        "event_type", "value",
    )
    zpath = str(base / "z")
    tpath = str(base / "ts_only")
    bounds = zorder_write(ev, ["user_id", "ts_sec"], zpath, n_files=16)
    # the single-dimension baseline every warehouse has: sort by time
    (
        ev.repartitionByRange(16, "ts_sec")
        .sortWithinPartitions("ts_sec")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    lo_u, hi_u = bounds["user_id"]
    lo_t, hi_t = bounds["ts_sec"]
    return ev, zpath, tpath, (lo_u, hi_u), (lo_t, hi_t)


def test_layout_is_result_invariant(spark, layouts):
    ev, zpath, _, (lo_u, hi_u), _ = layouts
    span = hi_u - lo_u
    pred = (F.col("user_id") >= lo_u) & (
        F.col("user_id") <= lo_u + span // 10
    )
    expect = sorted(r["event_id"] for r in ev.where(pred).collect())
    got = sorted(
        r["event_id"]
        for r in spark.read.parquet(zpath).where(pred).collect()
    )
    assert got == expect


def test_zorder_skips_on_the_non_sort_dimension(layouts):
    _, zpath, tpath, (lo_u, hi_u), _ = layouts
    # a narrow user_id slice: the query a time-sorted table cannot
    # skip for at all
    span = hi_u - lo_u
    pred = {"user_id": (lo_u, lo_u + span // 10)}
    z = rowgroup_skip_stats(zpath, pred)
    t = rowgroup_skip_stats(tpath, pred)
    assert z["total"] >= 8
    # z-order: contiguous z-ranges are tight boxes in BOTH dims ->
    # most row groups are outside the user slice
    assert z["skipped"] >= z["total"] // 2
    # time-sorted: every file spans ~all users -> no skipping
    assert t["skipped"] == 0


def test_zorder_still_skips_on_time(layouts):
    _, zpath, tpath, _, (lo_t, hi_t) = layouts
    span = hi_t - lo_t
    pred = {"ts_sec": (lo_t, lo_t + span // 10)}
    z = rowgroup_skip_stats(zpath, pred)
    t = rowgroup_skip_stats(tpath, pred)
    # the dedicated sort is perfect on its own dimension...
    assert t["skipped"] >= t["total"] - 3
    # ...and z-order retains real (coarser) pruning there too
    assert z["skipped"] >= z["total"] // 4


def test_rectangle_predicate_compounds_skipping(layouts):
    _, zpath, _, (lo_u, hi_u), (lo_t, hi_t) = layouts
    su, st = hi_u - lo_u, hi_t - lo_t
    both = rowgroup_skip_stats(
        zpath,
        {
            "user_id": (lo_u, lo_u + su // 10),
            "ts_sec": (lo_t, lo_t + st // 10),
        },
    )
    one = rowgroup_skip_stats(zpath, {"user_id": (lo_u, lo_u + su // 10)})
    assert both["skipped"] >= one["skipped"]
