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


def build_join_case(rng: random.Random):
    """Random join shape: orders x customer, random join type, filter
    on one side, aggregate by nation key."""
    how, kw = rng.choice(
        [("JOIN", "inner"), ("LEFT JOIN", "left"), ("RIGHT JOIN", "right")]
    )
    threshold = rng.choice([50_000, 150_000, 300_000])
    min_orders = rng.choice([0, 1, 5])

    def build(spark):
        o = load_table(spark, SF0001, "orders").where(
            F.col("o_totalprice") < threshold
        )
        c = load_table(spark, SF0001, "customer")
        joined = o.join(c, o.o_custkey == c.c_custkey, kw)
        return (
            joined.groupBy("c_nationkey")
            .agg(F.count("o_orderkey").alias("n_orders"))
            .where(F.col("n_orders") >= min_orders)
            .orderBy(F.col("c_nationkey").asc_nulls_first())
        )

    sql = (
        f"SELECT c_nationkey, COUNT(o_orderkey) AS n_orders "
        f"FROM (SELECT * FROM orders WHERE o_totalprice < {threshold}) o "
        f"{how} customer ON o_custkey = c_custkey "
        f"GROUP BY c_nationkey HAVING COUNT(o_orderkey) >= {min_orders} "
        f"ORDER BY c_nationkey NULLS FIRST"
    )
    return build, sql


@pytest.mark.parametrize("seed", range(8))
def test_random_join_matches_oracle(spark, duck, seed):
    rng = random.Random(2000 + seed)
    build, sql = build_join_case(rng)
    ok, msg = compare(build(spark), duck.execute(sql).fetch_arrow_table().to_pandas())
    assert ok, f"seed={seed} sql={sql}: {msg}"


WINDOW_FAMILIES = [
    (
        "row_number",
        lambda: F.row_number(),
        "ROW_NUMBER()",
    ),
    (
        "rank",
        lambda: F.rank(),
        "RANK()",
    ),
    (
        "dense_rank",
        lambda: F.dense_rank(),
        "DENSE_RANK()",
    ),
    (
        "lag_key",
        lambda: F.lag("o_orderkey", 1, -1),
        "COALESCE(LAG(o_orderkey, 1) OVER w, -1)",
    ),
]


@pytest.mark.parametrize("seed", range(8))
def test_random_window_matches_oracle(spark, duck, seed):
    """Window functions over a total order (price desc, key) partitioned
    by order status — every family deterministic by construction."""
    from pyspark.sql.window import Window

    rng = random.Random(3000 + seed)
    fam_name, fam, fam_sql = rng.choice(WINDOW_FAMILIES)
    keep = rng.choice([3, 7, 11])

    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    col = fam() if fam_name != "lag_key" else fam()
    sdf = (
        load_table(spark, SF0001, "orders")
        .select("o_orderkey", "o_orderstatus", col.over(w).alias("v"))
        .where(F.col("v") <= keep)
        .orderBy("o_orderkey")
    )
    over = "(PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey ASC)"
    expr = (
        f"{fam_sql} OVER {over}"
        if fam_name != "lag_key"
        else f"COALESCE(LAG(o_orderkey, 1) OVER {over}, -1)"
    )
    sql = (
        f"SELECT o_orderkey, o_orderstatus, v FROM "
        f"(SELECT o_orderkey, o_orderstatus, {expr} AS v FROM orders) t "
        f"WHERE v <= {keep} ORDER BY o_orderkey"
    )
    ok, msg = compare(sdf, duck.execute(sql).fetch_arrow_table().to_pandas())
    assert ok, f"seed={seed} fam={fam_name} sql={sql}: {msg}"


# ---------------------------------------------------------------------------
# Set-similarity join fuzz: random small-vocabulary corpora (maximum
# shingle sharing — worst case for the prefix filter) with planted
# near-dups; the PPJoin prefix + positional filters must stay LOSSLESS
# against DuckDB's brute-force join on every seed.


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_exact_jaccard_random_corpus(spark, tmp_path, seed):
    import duckdb as _duckdb

    from dataingestiontohana_spark.operators.dedup import exact_jaccard_pairs
    from dataingestiontohana_spark.plans.llm_dedup import _EXACT_PAIRS_SQL

    rng = random.Random(4000 + seed)
    vocab = [f"w{i}" for i in range(10)]  # tiny vocab: heavy collisions
    docs = []
    for i in range(50):
        n = rng.randint(3, 25)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    for j in range(4):  # planted near-dups (append one word)
        base = docs[rng.randrange(50)][1]
        docs.append((100 + j, base + " " + rng.choice(vocab)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    got = (
        exact_jaccard_pairs(df, 0.5)
        .select("id_a", "id_b", "inter", "uni", "jaccard")
        .orderBy("id_a", "id_b")
    )
    p = str(tmp_path / "docs_pq")
    df.write.parquet(p)
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')"
    )
    ddf = con.execute(
        f"SELECT * FROM ({_EXACT_PAIRS_SQL}) ORDER BY id_a, id_b"
    ).fetch_arrow_table().to_pandas()
    con.close()
    ok, msg = compare(got, ddf)
    assert ok, f"seed={seed}: {msg}"


# ---------------------------------------------------------------------------
# Analytics-family fuzz (r6 verdict item): funnel deadlines, attribution
# windows and gaps-and-islands fills fuzzed with PLANTED boundary rows —
# events at exactly the deadline, one microsecond inside, one microsecond
# past — the hazard class the q171/q186 interval rewrites fixed by review,
# now pinned by generation. Each seed writes a random corpus as
# events.parquet and runs the PRODUCTION query callables against their own
# committed oracle SQL on the same files.

ANALYTICS_FUZZ_QUERIES = [
    "q171_windowed_funnel",
    "q186_funnel_window_sensitivity",
    "q117_last_touch_attribution",
    "q182_position_decay_attribution",
    "q99_gapfill_locf",
    "q193_gapfill_interpolate",
]


def _random_events_corpus(rng: random.Random):
    """(rows, schema): ~300 random events plus deadline-boundary chains.

    `value` is a dyadic rational (k/4) so double sums are EXACT under
    any fold order — q99 rounds a SUM(value); random decimals would
    fuzz the float accumulator instead of the query logic."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    types = ["view", "click", "purchase", "signup", "error"]
    rows = []
    eid = 0

    def add(u, et, t):
        nonlocal eid
        rows.append(
            (eid, t, u, et, rng.randrange(0, 400) / 4.0,
             '{"k": %d}' % rng.randrange(100))
        )
        eid += 1

    for _ in range(300):
        add(
            rng.randrange(12),
            rng.choice(types),
            base
            + timedelta(
                seconds=rng.randrange(0, 5 * 86400),
                microseconds=rng.randrange(0, 1_000_000),
            ),
        )
    us = timedelta(microseconds=1)
    day = timedelta(hours=24)
    # planted chains on users no random event touches (ids >= 100):
    # every deadline comparison gets an exactly-at / one-us-inside /
    # one-us-past row somewhere across the seeds
    t0 = base + timedelta(
        seconds=rng.randrange(0, 86400), microseconds=rng.randrange(0, 1_000_000)
    )
    add(101, "view", t0); add(101, "click", t0 + day)           # exactly at
    add(101, "purchase", t0 + day + day + us)                   # 1us past
    add(102, "view", t0); add(102, "click", t0 + day + us)      # 1us past
    add(103, "view", t0); add(103, "click", t0 + day - us)      # 1us inside
    add(103, "purchase", t0 + day - us + day)                   # exactly at
    add(104, "view", t0)                                        # attribution:
    add(104, "purchase", t0 + timedelta(seconds=86400))         # lag == window
    add(104, "purchase", t0 + timedelta(seconds=86400, microseconds=500_000))
    add(105, "purchase", t0)                                    # no view at all
    add(106, "view", t0); add(106, "view", t0 + us)             # dup-ish views
    return rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_analytics_families_match_oracle(spark, tmp_path, seed):
    import duckdb as _duckdb

    from dataingestiontohana_spark.plans.relational import ORACLES, QUERIES

    rng = random.Random(5000 + seed)
    rows, schema = _random_events_corpus(rng)
    sf_dir = str(tmp_path)
    spark.createDataFrame(rows, schema).coalesce(2).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    try:
        for name in ANALYTICS_FUZZ_QUERIES:
            sdf = QUERIES[name](spark, sf_dir)
            ddf = con.execute(ORACLES[name]).fetch_arrow_table().to_pandas()
            ok, msg = compare(sdf, ddf)
            assert ok, f"seed={seed} query={name}: {msg}"
    finally:
        con.close()


# ---------------------------------------------------------------------------
# Training-mix governance fuzz: random documents corpora through the
# production q201/q202/q203 callables vs their committed oracles. The
# mixture weight is the engine's one exp/ln libm term — fuzzing many
# random token-count distributions pins the cross-engine q6-integer
# quantization across a wide value range, not just the fixture corpus.


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_mix_governance_matches_oracle(spark, tmp_path, seed):
    import duckdb as _duckdb

    from dataingestiontohana_spark.plans.llm_mix import ORACLES, QUERIES

    rng = random.Random(6000 + seed)
    vocab = [f"w{i}" for i in range(30)]
    langs = ["en", "de", "zh", "es"]
    rows = []
    n_sources = rng.randint(2, 9)
    did = 0
    for s in range(n_sources):
        # skewed source sizes: exercises the temperature upsample and
        # tiny-source epoch blow-ups (1-doc sources included)
        for _ in range(rng.choice([1, 3, 10, 40])):
            n = rng.randint(1, 60)
            text = " ".join(rng.choice(vocab) for _ in range(n))
            rows.append((did, text, rng.choice(langs), f"s{s}", len(text)))
            did += 1
    # duplicate texts across docs so q203 has real near-dup pairs
    for j in range(6):
        base = rows[rng.randrange(len(rows))]
        rows.append((did, base[1], base[2], base[3], base[4]))
        did += 1
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.parquet(f"{sf_dir}/documents.parquet")
    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    try:
        for name in sorted(QUERIES):
            sdf = QUERIES[name](spark, sf_dir)
            ddf = con.execute(ORACLES[name]).fetch_arrow_table().to_pandas()
            ok, msg = compare(sdf, ddf)
            assert ok, f"seed={seed} query={name}: {msg}"
    finally:
        con.close()
