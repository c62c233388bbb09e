"""Randomized oracle fuzzing: seeded random filter/agg/join queries
built simultaneously as a DataFrame plan and as SQL, compared against
DuckDB — property-level hardening of the t2 contract beyond the 58
hand-written queries."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.oracle import compare, duckdb_connection

from tests.conftest import SF0001

NUM_COLS = ["o_totalprice", "o_custkey", "o_orderkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
OPS = [(">", lambda c, v: c > v), ("<", lambda c, v: c < v), (">=", lambda c, v: c >= v)]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF0001)
    yield con
    con.close()


def build_case(rng: random.Random):
    """One random query: filter on a numeric col, group by a string
    col, a couple of aggregates. Returns (df_builder, sql)."""
    ncol = rng.choice(NUM_COLS)
    scol = rng.choice(STR_COLS)
    op_name, op = rng.choice(OPS)
    threshold = rng.choice([1000, 5000, 50_000, 100_000])
    aggs = rng.sample(
        [
            ("cnt", lambda: F.count(F.lit(1)).alias("cnt"), "COUNT(*) AS cnt"),
            # round of an INTEGER stays integer in Spark but widens to
            # DOUBLE in DuckDB — cast explicitly on both sides (found by
            # this fuzzer, seed 0)
            (
                "smax",
                lambda: F.round(F.max(ncol).cast("double"), 2).alias("smax"),
                f"ROUND(CAST(MAX({ncol}) AS DOUBLE), 2) AS smax",
            ),
            (
                "smin",
                lambda: F.round(F.min(ncol).cast("double"), 2).alias("smin"),
                f"ROUND(CAST(MIN({ncol}) AS DOUBLE), 2) AS smin",
            ),
            (
                "uc",
                lambda: F.countDistinct("o_custkey").alias("uc"),
                "COUNT(DISTINCT o_custkey) AS uc",
            ),
        ],
        k=2,
    )

    def build(spark):
        o = load_table(spark, SF0001, "orders")
        return (
            o.where(op(F.col(ncol), threshold))
            .groupBy(scol)
            .agg(*[a[1]() for a in aggs])
            .orderBy(scol)
        )

    sql = (
        f"SELECT {scol}, {', '.join(a[2] for a in aggs)} FROM orders "
        f"WHERE {ncol} {op_name} {threshold} GROUP BY {scol} ORDER BY {scol}"
    )
    return build, sql


@pytest.mark.parametrize("seed", range(10))
def test_random_query_matches_oracle(spark, duck, seed):
    rng = random.Random(1000 + seed)
    build, sql = build_case(rng)
    sdf = build(spark)
    ddf = duck.execute(sql).fetch_arrow_table().to_pandas()
    ok, msg = compare(sdf, ddf)
    assert ok, f"seed={seed} sql={sql}: {msg}"
