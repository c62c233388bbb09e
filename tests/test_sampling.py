"""Properties of the sampling/splitting layer (q57-q62) beyond the
oracle gate: determinism under repartitioning and map-only plans —
the two guarantees that make hash-splits safe at 100 TB where
df.sample/TABLESAMPLE are not (their output depends on partition
layout)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.plans.sampling import (
    _bucket,
    q57_hash_split,
    q58_stratified_sample,
)

from tests.conftest import SF001


def _kept_ids(df, modulus=10, salt=17, keep=3):
    return {
        r.doc_id
        for r in df.where(_bucket(F.col("doc_id"), modulus, salt) < keep)
        .select("doc_id")
        .collect()
    }


def test_sample_stable_under_repartition(spark):
    d = load_table(spark, SF001, "documents")
    base = _kept_ids(d)
    assert base  # non-degenerate sample
    assert _kept_ids(d.repartition(7)) == base
    assert _kept_ids(d.repartition(1)) == base
    assert _kept_ids(d.orderBy(F.desc("doc_id"))) == base


def test_split_is_exhaustive_and_disjoint(spark):
    d = load_table(spark, SF001, "documents")
    stats = {r.split: r.docs for r in q57_hash_split(spark, SF001).collect()}
    assert sum(stats.values()) == d.count()  # every doc in exactly one split
    assert set(stats) == {"train", "val", "test"}
    # 80/10/10 within multiplicative-hash tolerance
    total = sum(stats.values())
    assert 0.7 < stats["train"] / total < 0.9


def test_split_plan_is_map_only_before_agg(spark):
    # exactly two exchanges — the aggregation shuffle and the final
    # presentation orderBy; the split itself adds no repartition/sort,
    # and the partial aggregate sits directly on the scan
    plan = q57_hash_split(spark, SF001)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2
    partial = plan.index("partial_count")
    assert "Exchange" not in plan[partial:]  # nothing below the partial agg


def test_stratified_sample_filter_reaches_scan(spark):
    full = (
        q58_stratified_sample(spark, SF001)
        ._jdf.queryExecution()
        .toString()
    )
    # the hash predicate is not a parquet-pushable filter, but column
    # pruning must still reach the scan: only the 3 needed columns read
    assert "ReadSchema: struct<doc_id:bigint,lang:string,n_chars:bigint>" in full


def test_sketch_audit_error_bounds(spark):
    from dataingestiontohana_spark.plans.llm_text2 import q65_sketch_audit

    r = q65_sketch_audit(spark, SF001).collect()[0]
    # the query's own bounds flags (these are what the oracle asserts)
    assert r.distinct_ok == 1 and r.p50_ok == 1 and r.p99_ok == 1
    # tighter sketch-error property than the in-query envelope:
    # HLL++ at rsd=0.02 should be within 3 sigma of exact here
    d = load_table(spark, SF001, "documents")
    row = d.agg(
        F.countDistinct("text").alias("exact"),
        F.approx_count_distinct("text", 0.02).alias("approx"),
        F.expr("percentile(n_chars, 0.5)").alias("ep50"),
        F.expr("approx_percentile(n_chars, 0.5, 10000)").alias("ap50"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.06
    # accuracy=10000 >> rows at sf0.001: the sketch returns a true data
    # element; percentile() interpolates, so allow the one-element gap
    assert abs(row.ap50 - row.ep50) / row.ep50 <= 0.01


def test_q46_approx_mode_within_bounds(spark):
    from dataingestiontohana_spark.plans.relational_ext import q46_percentiles

    exact = {r.o_orderstatus: r for r in q46_percentiles(spark, SF001).collect()}
    approx = {
        r.o_orderstatus: r
        for r in q46_percentiles(spark, SF001, mode="approx").collect()
    }
    assert set(exact) == set(approx)
    for k in exact:
        # accuracy=10000 >> group sizes at sf0.001: the sketch returns a
        # true element; exact interpolates between two -> tiny gap only
        assert abs(approx[k].p50 - exact[k].p50) / exact[k].p50 <= 0.02
        assert abs(approx[k].p90 - exact[k].p90) / exact[k].p90 <= 0.02


def test_bucketed_ranks_match_window_functions(spark):
    """The two-pass bucketed-rank operator must agree EXACTLY with the
    single-partition window functions it replaces (q60/q62)."""
    from pyspark.sql.window import Window

    from dataingestiontohana_spark.operators.ranks import (
        bucketed_ranks,
        exact_ntile,
    )

    o = load_table(spark, SF001, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice")
    want = o.select(
        "o_orderkey",
        F.rank().over(w).alias("rank"),
        F.cume_dist().over(w).alias("cd"),
    )
    got = bucketed_ranks(o, "o_totalprice", part_cols=("o_orderstatus",))
    joined = got.join(want, "o_orderkey")
    bad = joined.where(
        (F.col("g_rank") != F.col("rank"))
        | (F.col("g_cume") / F.col("g_n") != F.col("cd"))
    ).count()
    assert bad == 0

    wg = Window.orderBy("o_totalprice", "o_orderkey")
    want_nt = o.select("o_orderkey", F.ntile(4).over(wg).alias("nt"))
    got_nt = bucketed_ranks(
        o, "o_totalprice", part_cols=(), tie_cols=("o_orderkey",)
    ).select("o_orderkey", exact_ntile(F.col("g_rn"), F.col("g_n"), 4).alias("nt"))
    assert got_nt.join(want_nt.withColumnRenamed("nt", "want"), "o_orderkey").where(
        F.col("nt") != F.col("want")
    ).count() == 0


def test_bucketed_ranks_null_and_nan_match_window_functions(spark):
    """NULL values, NULL partition keys, and float NaN must rank
    exactly as the window functions do (NULLS FIRST, NaN last, NULL
    partition key = its own group) — the operator is generic and the
    divergence would be silent (ADVICE r2: NULL rows were dropped by
    the null-unsafe internal joins)."""
    from pyspark.sql.window import Window

    from dataingestiontohana_spark.operators.ranks import bucketed_ranks

    rows = [
        # (id, grp, val) — NULL grp group, NULL vals, NaN vals, ties
        (1, "a", 10.0), (2, "a", None), (3, "a", float("nan")),
        (4, "a", 10.0), (5, "a", 3.0), (6, None, 7.0), (7, None, None),
        (8, None, 7.0), (9, "b", None), (10, "b", None), (11, "b", 5.0),
        (12, "a", float("nan")), (13, "a", 1e9), (14, "a", -2.5),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, val double")
    w = Window.partitionBy("grp").orderBy("val")
    want = df.select(
        "id",
        F.rank().over(w).alias("rank"),
        F.count(F.lit(1)).over(
            w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("cume_n"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n"),
    )
    got = bucketed_ranks(df, "val", part_cols=("grp",), n_buckets=4)
    assert got.count() == len(rows)  # no rows silently dropped
    joined = got.join(want, "id")
    bad = joined.where(
        (F.col("g_rank") != F.col("rank"))
        | (F.col("g_cume") != F.col("cume_n"))
        | (F.col("g_n") != F.col("n"))
    )
    assert bad.count() == 0, bad.collect()


def test_split_contamination_matches_python_shingles(spark):
    from dataingestiontohana_spark.plans.llm_dedup import q70_split_contamination

    got = {
        r.doc_id: r.n_shared_shingles
        for r in q70_split_contamination(spark, SF001).collect()
    }

    # recompute in pure Python from the raw documents
    import re

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF001, "documents").collect()
    }

    def shingles(text):
        toks = re.sub(r"\s+", " ", text.lower().strip()).split(" ")
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    knuth = 2654435761
    train = {i for i in docs if (i * knuth) % 100 < 80}
    test = {i for i in docs if (i * knuth) % 100 >= 90}
    train_sh = set()
    for i in train:
        train_sh |= shingles(docs[i])
    want = {}
    for i in test:
        # count of this doc's DISTINCT shingles that hit the train set
        n = len(shingles(docs[i]) & train_sh)
        if n:
            want[i] = n
    assert got == want


def test_vocab_topk_sketch_matches_exact_head(spark):
    """approx_top_k (mergeable frequent-items sketch) with
    maxItemsTracked above the true vocabulary size equals the exact
    q61 vocabulary head — same tokens, same counts."""
    from dataingestiontohana_spark.catalog import load_table
    from dataingestiontohana_spark.plans.sampling import (
        q61_token_topk,
        vocab_topk_sketch,
    )
    from tests.conftest import SF0001

    d = load_table(spark, SF0001, "documents")
    exact = {
        (r["tok"], r["c"]) for r in q61_token_topk(spark, SF0001).collect()
    }
    sketch = {
        (r["tok"], r["c"]) for r in vocab_topk_sketch(d, 20).collect()
    }
    assert sketch == exact


def test_knuth_hash32_matches_python_reference(spark):
    """The shared portable hash (functions/hashing.py) must equal the
    plain-integer reference on edge ids (0, 1, 2^31, 2^32-1, huge,
    negative) — the same values every SQL oracle transcribes."""
    from dataingestiontohana_spark.functions.hashing import (
        KNUTH,
        M32,
        knuth_bucket,
        knuth_hash32,
    )

    ids = [0, 1, 7, 65535, 65536, 2**31, 2**32 - 1, 2**40 + 123, -5]
    df = spark.createDataFrame([(i,) for i in ids], "x long")
    got = {
        r["x"]: (r["h"], r["b"])
        for r in df.select(
            "x",
            knuth_hash32("x").alias("h"),
            knuth_bucket("x", 8).alias("b"),
        ).collect()
    }
    for i in ids:
        h = ((i % M32) * KNUTH) % M32
        assert got[i] == (h, (h * 8) // M32), i


class TestDriftNullRouting:
    def test_null_user_lands_in_split_b_not_dropped(self, spark):
        """The q102 NULL contract: a NULL user_id row must be COUNTED
        (in split B), matching the oracle's CASE ELSE — not silently
        dropped from both histograms (the bare-cast bug the round-6
        review caught)."""
        from dataingestiontohana_spark.plans.sampling import _drift_frame

        rows = [(1, 5.0), (2, 15.0), (None, 5.0), (None, 25.0)]
        e = spark.createDataFrame(rows, "user_id long, value double")
        out = {r["bin"]: r for r in _drift_frame(e).collect()}
        total = sum(r["c_a"] + r["c_b"] for r in out.values())
        assert total == 4  # every row counted exactly once
        # both NULL rows are in split B
        assert sum(r["c_b"] for r in out.values()) >= 2
        assert out[0]["c_a"] + out[0]["c_b"] == 2  # bin 0: values 5.0 x2
        # cumulative histograms end at the per-split totals
        last = max(out)
        assert out[last]["cum_a"] + out[last]["cum_b"] == 4
