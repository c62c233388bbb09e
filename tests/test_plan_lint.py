"""The plan linter: each gate fires on a planted anti-pattern and
stays quiet on the sanctioned shapes (including every declared query)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataingestiontohana_spark.plan_lint import lint_plan
from dataingestiontohana_spark.plans import QUERIES
from tests.conftest import SF001


def test_flags_cartesian_between_multirow_inputs(spark):
    a = spark.range(100)
    b = spark.range(100).selectExpr("id AS j")
    problems = lint_plan(a.crossJoin(b))
    assert any("cross join" in p or "CartesianProduct" in p for p in problems)


def test_allows_one_row_literal_attach(spark):
    a = spark.range(100)
    one = spark.range(100).agg(F.count(F.lit(1)).alias("n"))  # 1 row
    assert lint_plan(a.crossJoin(F.broadcast(one))) == []


def test_allows_wrapped_and_chained_one_row_attach(spark):
    # the optimizer interposes Filter(isnotnull)/Project between the
    # join and the global Aggregate (a post-crossJoin WHERE on the
    # attached scalar), and scalar attachments CHAIN as 1x1 joins —
    # both are the sanctioned literal-attach shape
    a = spark.range(100)
    s1 = spark.range(100).agg(F.avg("id").alias("m"))
    s2 = spark.range(100).agg(F.count(F.lit(1)).alias("n"))
    filtered = a.crossJoin(F.broadcast(s1)).where(F.col("id") < F.col("m"))
    assert lint_plan(filtered) == []
    chained = a.crossJoin(F.broadcast(s1.crossJoin(s2)))
    assert lint_plan(chained) == []


def test_still_flags_multirow_side_behind_projection(spark):
    # a Project over a MULTI-row subtree must not launder the cross
    a = spark.range(100)
    b = spark.range(50).select((F.col("id") * 2).alias("j"))
    problems = lint_plan(a.crossJoin(b))
    assert any("cross join" in p or "CartesianProduct" in p for p in problems)


def test_flags_unpartitioned_window_over_unreduced_input(spark):
    from pyspark.sql.window import Window

    df = spark.range(1000).select(
        "id", F.row_number().over(Window.orderBy("id")).alias("rn")
    )
    problems = lint_plan(df)
    assert any("unpartitioned Window" in p for p in problems)


def test_allows_window_over_reduced_input(spark):
    from pyspark.sql.window import Window

    reduced = spark.range(1000).groupBy((F.col("id") % 5).alias("g")).count()
    df = reduced.select(
        "g", F.row_number().over(Window.orderBy("g")).alias("rn")
    )
    assert lint_plan(df) == []


def test_flags_row_at_a_time_python_udf(spark):
    from pyspark.sql.functions import udf

    slow = udf(lambda x: x + 1, "bigint")
    problems = lint_plan(spark.range(10).select(slow("id").alias("y")))
    assert any("BatchEvalPython" in p for p in problems)


def test_flags_whole_row_scan_feeding_narrow_projection(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    # concat over every column defeats pruning: the scan reads all 16
    # lineitem columns to serve a 2-column result.
    wide = li.withColumn("h", F.md5(F.concat_ws("|", *li.columns)))
    problems = lint_plan(wide.select("l_orderkey", "h"))
    assert any("whole-row scan" in p for p in problems)


def test_allows_pruned_scan(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet")
    assert lint_plan(li.select("l_orderkey", "l_quantity")) == []


def test_strict_raises(spark):
    a = spark.range(10)
    b = spark.range(10).selectExpr("id AS j")
    with pytest.raises(ValueError, match="plan lint"):
        lint_plan(a.crossJoin(b), strict=True)


@pytest.mark.parametrize(
    "name",
    ["q06_multiway_join_agg", "q30_minhash_near_dup", "q78_pack_chunks",
     "q83_kmeans", "q80_bm25_topk", "q65_sketch_audit",
     "q173_roc_auc", "q175_rfm_segments", "q181_clamped_wallet",
     "q182_position_decay_attribution", "q183_segment_migration"],
)
def test_declared_queries_lint_clean(spark, name):
    """Spot-check: the engine's own queries pass their own gate
    (the full sweep is the per-query parametrized plan tests)."""
    assert lint_plan(QUERIES[name](spark, SF001)) == []
