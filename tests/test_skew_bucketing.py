"""Scale-control operator tests: salted join equivalence, bucketed
join shuffle elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestiontohana_spark.operators.skew import (
    plan_has_exchange,
    salted_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows, 90% on one hot key
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100)
        .cast("long").alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return big, small


def test_salted_join_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, "k").groupBy("k").agg(
        F.count("*").alias("c"), F.sum("w").alias("sw")
    )
    salted = salted_join(big, small, "k").groupBy("k").agg(
        F.count("*").alias("c"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join(skewed):
    big, small = skewed
    plain = big.join(small.where(F.col("k") < 50), "k", "left")
    salted = salted_join(big, small.where(F.col("k") < 50), "k", how="left")
    assert plain.count() == salted.count()
    assert (
        plain.where(F.col("w").isNull()).count()
        == salted.where(F.col("w").isNull()).count()
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # (warehouse dir is a static conf; tables land in ./spark-warehouse,
    # dropped in the finally block and gitignored)
    a = spark.range(1_000).select(F.col("id").alias("k"), F.lit(1).alias("a"))
    b = spark.range(1_000).select(F.col("id").alias("k"), F.lit(2).alias("b"))
    write_bucketed(a, "bt_a", "k", buckets=8)
    write_bucketed(b, "bt_b", "k", buckets=8)
    ta, tb = spark.table("bt_a"), spark.table("bt_b")

    # broadcast would hide the point; force sort-merge
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.join(tb, "k")
        assert not plan_has_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()
        assert joined.count() == 1_000
        # the same join on non-bucketed frames DOES shuffle
        shuffled = a.join(b, "k")
        assert plan_has_exchange(shuffled)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")
