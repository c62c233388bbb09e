"""Dataset sampling / splitting / mixing — the selection layer of a
training-data pipeline (declared queries q57-q62).

Everything here is deterministic and shuffle-light by construction:

- Splits and samples use an arithmetic multiplicative hash
  (Knuth 2654435761) instead of ``rand()`` — reproducible across runs,
  engines, and cluster sizes, and computable in whole-stage codegen
  with zero shuffle before the final aggregation. At 100 TB a split is
  a map-only scan: no repartition, no sort, no sampling pass.
- Stratified sampling keys the hash on the row id, so the kept set is
  stable under repartitioning (unlike ``TABLESAMPLE`` / ``df.sample``
  whose output depends on partition layout).
- Dataset mixing expresses per-source weights as a hash threshold: a
  weighted interleave of N corpora is then one predicate, not N
  sampled unions.

Reference parity: the reference (Andyyh2005/DataIngestionToHANA) has
no sampling surface (README.md:1-168 is delivery-semantics only);
scope comes from the driver's LLM-data north star (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.functions.text import (
    normalize_sql as _nsql,
)
from dataingestiontohana_spark.operators.ranks import bucketed_ranks, exact_ntile

_NORM = _nsql("text")

# Knuth's multiplicative hash constant.
_KNUTH = 2654435761


def _bucket(id_col: F.Column, modulus: int, salt: int = 0) -> F.Column:
    """Deterministic bucket in [0, modulus): ((id + salt) * K) % m,
    computed in the overflow-free reduced form
    ((x % m) * (K % m)) % m — algebraically IDENTICAL (modular
    multiplication identity) for every id, so the oracles' naive
    (doc_id * K) % m SQL matches verbatim, but each intermediate stays
    below m^2 (~10^4 here) instead of the naive product, which exceeds
    int64 once id >= 2^63/K ~ 3.47e9 — a realistic doc count at
    100 TB (ANSI mode throws; legacy mode wraps negative)."""
    x = F.pmod(id_col + F.lit(salt), F.lit(modulus))
    return F.pmod(x * F.lit(_KNUTH % modulus), F.lit(modulus))


def q57_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the corpus.

    One codegen'd projection + tiny agg; the split column is a pure
    function of doc_id, so any engine (or a later incremental run over
    new files) assigns identical rows to identical splits.
    """
    d = load_table(spark, sf_dir, "documents")
    b = _bucket(F.col("doc_id"), 100)
    split = (
        F.when(b < 80, F.lit("train"))
        .when(b < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("split")
    )


def q58_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 30% per-language sample (stratified on lang).

    The keep-predicate hashes the row id, not the partition: stable
    under repartitioning/AQE, unlike df.sample/TABLESAMPLE. Map-only
    until the final per-stratum aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    kept = d.where(_bucket(F.col("doc_id"), 10, salt=17) < 3)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def q59_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: per-source keep rates applied as hash
    thresholds (web-ish sources downsampled, curated kept whole).

    At scale this replaces N sampled unions with a single predicate on
    one scan — no shuffle, no N-way union of separate jobs.
    """
    d = load_table(spark, sf_dir, "documents")
    # keep-rate percent per source; unknown sources default to 25%
    rate = (
        F.when(F.col("source") == "web", F.lit(40))
        .when(F.col("source") == "wiki", F.lit(100))
        .when(F.col("source") == "books", F.lit(100))
        .otherwise(F.lit(25))
    )
    kept = d.where(_bucket(F.col("doc_id"), 100, salt=101) < rate)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .orderBy("source")
    )


def q60_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucketing of orders by price (exact NTILE semantics),
    then per-bucket stats — the quantile-binning step used to stratify
    curricula / detect outlier bands.

    A literal ``NTILE(4) OVER (ORDER BY ...)`` is a single-partition
    window — one task sorts the whole table. Instead the exact global
    row_number comes from the two-pass bucketed-rank operator
    (operators/ranks.py: value-range buckets + per-bucket offsets),
    and NTILE's tile arithmetic is applied to it as a map-side
    expression. Identical output, no unbounded partition anywhere.
    """
    o = load_table(spark, sf_dir, "orders")
    ranked = bucketed_ranks(
        o, "o_totalprice", part_cols=(), tie_cols=("o_orderkey",)
    )
    tile = exact_ntile(F.col("g_rn"), F.col("g_n"), 4)
    return (
        ranked.select("o_totalprice", tile.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


def q61_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-20 tokens by frequency (vocabulary head).

    explode -> aggregation -> orderBy().limit(20). The token count
    aggregation gets map-side partial combine, so the shuffle carries
    (token, count) pairs, not token occurrences; the limit plans as
    TakeOrderedAndProject — per-partition top-20 heaps merged on the
    driver — so NO task ever holds the full distinct vocabulary
    (unlike a row_number over an unpartitioned window, which funnels
    tens of millions of distinct tokens through one task at 100 TB).
    Ties at the boundary are broken by the token string, so the result
    is deterministic.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")
        ).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    return counts.orderBy(F.desc("c"), F.asc("tok")).limit(20)


def q62_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist of order price within order status —
    the distributional-position features used for quality-score
    calibration. Rounded to 6 places (both engines compute the same
    rational numbers; rounding guards double formatting).

    o_orderstatus has 3 distinct values, so the naive
    ``PARTITION BY o_orderstatus`` window gives 3 tasks the whole
    table. The ranks instead come from the two-pass bucketed-rank
    operator (operators/ranks.py) and the SQL definitions are applied
    arithmetically: percent_rank = (rank-1)/(n-1), cume_dist =
    |{value <= v}| / n — exactly what the window functions compute,
    with every window bounded to ~n/256 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    ranked = bucketed_ranks(o, "o_totalprice", part_cols=("o_orderstatus",))
    pr = F.when(F.col("g_n") == 1, F.lit(0.0)).otherwise(
        (F.col("g_rank") - 1) / (F.col("g_n") - 1)
    )
    cd = F.col("g_cume") / F.col("g_n")
    return (
        ranked.select(
            "o_orderkey",
            "o_orderstatus",
            F.round(pr, 6).alias("pr"),
            F.round(cd, 6).alias("cd"),
        )
        .orderBy("o_orderkey")
    )


def q61b_vocab_sketch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-vs-exact vocabulary head audit, driver-adjudicated (the
    q65 exactness-guard pattern): the mergeable ``approx_top_k``
    sketch head is compared in-query against the exact q61 head —
    with maxItemsTracked (10k) above the true vocabulary size the
    sketch counts are exact, so the two 20-row sets must be identical.
    Emits the exact head rows plus a ``sketch_ok`` flag (1 iff every
    sketch (tok, count) pair matched the exact head), which the DuckDB
    oracle reproduces as the exact head + literal 1 — a sketch
    regression flips the flag and fails the value hash."""
    # 20-row head, materialized once: without the checkpoint the exact
    # token scan+agg recomputes for the output rows AND the match join
    exact = q61_token_topk(spark, sf_dir).localCheckpoint(eager=False)
    d = load_table(spark, sf_dir, "documents")
    sketch = vocab_topk_sketch(d, k=20).select("tok", "c")
    matched = sketch.join(exact.select("tok", "c"), ["tok", "c"]).agg(
        F.count(F.lit(1)).alias("nm")
    )
    # 20-row head x 1-row audit aggregate (q65's 1x1 crossJoin shape)
    return (
        exact.crossJoin(F.broadcast(matched))
        .select(
            "tok",
            "c",
            (F.col("nm") == 20).cast("bigint").alias("sketch_ok"),
        )
        .orderBy(F.desc("c"), F.asc("tok"))
    )


QUERIES = {
    "q57_hash_split": q57_hash_split,
    "q58_stratified_sample": q58_stratified_sample,
    "q59_dataset_mix": q59_dataset_mix,
    "q60_ntile_buckets": q60_ntile_buckets,
    "q61_token_topk": q61_token_topk,
    "q61b_vocab_sketch_audit": q61b_vocab_sketch_audit,
    "q62_rank_dist": q62_rank_dist,
}

ORACLES = {
    "q57_hash_split": """
        SELECT CASE WHEN (doc_id * 2654435761) % 100 < 80 THEN 'train'
                    WHEN (doc_id * 2654435761) % 100 < 90 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS docs,
               SUM(n_chars) AS total_chars,
               ROUND(AVG(n_chars), 2) AS avg_chars
        FROM documents GROUP BY split ORDER BY split
    """,
    "q58_stratified_sample": """
        SELECT lang, COUNT(*) AS sampled_docs,
               ROUND(AVG(n_chars), 2) AS avg_chars
        FROM documents
        WHERE ((doc_id + 17) * 2654435761) % 10 < 3
        GROUP BY lang ORDER BY lang
    """,
    "q59_dataset_mix": """
        SELECT source, COUNT(*) AS kept_docs, SUM(n_chars) AS kept_chars
        FROM documents
        WHERE ((doc_id + 101) * 2654435761) % 100 <
              CASE WHEN source = 'web' THEN 40
                   WHEN source IN ('wiki', 'books') THEN 100
                   ELSE 25 END
        GROUP BY source ORDER BY source
    """,
    "q60_ntile_buckets": """
        SELECT bucket, COUNT(*) AS n,
               ROUND(MIN(o_totalprice), 2) AS lo,
               ROUND(MAX(o_totalprice), 2) AS hi
        FROM (SELECT o_totalprice,
                     NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
              FROM orders) t
        GROUP BY bucket ORDER BY bucket
    """,
    "q61_token_topk": f"""
        SELECT tok, c
        FROM (SELECT tok, COUNT(*) AS c
              FROM (SELECT unnest(string_split(
                        {_NORM},
                        ' ')) AS tok
                    FROM documents) u
              GROUP BY tok) g
        ORDER BY c DESC, tok ASC LIMIT 20
    """,
    # q65 exactness-guard pattern: the oracle is the exact head plus a
    # literal ok-flag; the Spark side recomputes the flag from the
    # sketch, so a sketch divergence fails the value hash. (The shipped
    # corpus has no count tie at the top-20 boundary at any SF —
    # verified — so the comparison is deterministic.)
    "q61b_vocab_sketch_audit": f"""
        SELECT tok, c, CAST(1 AS BIGINT) AS sketch_ok
        FROM (SELECT tok, COUNT(*) AS c
              FROM (SELECT unnest(string_split(
                        {_NORM},
                        ' ')) AS tok
                    FROM documents) u
              GROUP BY tok) g
        ORDER BY c DESC, tok ASC LIMIT 20
    """,
    "q62_rank_dist": """
        SELECT o_orderkey, o_orderstatus,
               ROUND(PERCENT_RANK() OVER
                     (PARTITION BY o_orderstatus ORDER BY o_totalprice), 6) AS pr,
               ROUND(CUME_DIST() OVER
                     (PARTITION BY o_orderstatus ORDER BY o_totalprice), 6) AS cd
        FROM orders ORDER BY o_orderkey
    """,
}


def vocab_topk_sketch(docs: DataFrame, k: int = 20) -> DataFrame:
    """Sketch-mode vocabulary head: approx_top_k over exploded tokens.

    q61's exact agg + TakeOrderedAndProject already scales (map-side
    combine, per-partition heaps); this is the MERGEABLE alternative —
    the frequent-items sketch can be built per shard/micro-batch and
    merged later, which the exact form cannot. With maxItemsTracked
    (default 10k) above the true vocabulary size the sketch is exact;
    the test pins it against q61's exact head on the shipped corpus.
    """
    from dataingestiontohana_spark.functions.text import tokens

    toks = docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
    return toks.select(
        F.expr(f"approx_top_k(tok, {k})").alias("top")
    ).select(
        F.posexplode("top").alias("rank", "entry")
    ).select(
        F.col("entry.item").alias("tok"),
        F.col("entry.count").cast("bigint").alias("c"),
        F.col("rank"),
    )


def q102_dist_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift between two deterministic user-hash splits
    of the event stream: binned two-sample Kolmogorov-Smirnov plus
    Population Stability Index — the monitoring gate that decides
    whether serving data still looks like training data.

    Exactness strategy: values land in 64 fixed-width bins (floor of
    an IEEE division — identical in both engines), all counts and
    cumulative counts are exact integers, and the KS statistic is
    computed as max |cumA*nB - cumB*nA| in DECIMAL(38,0) — one exact
    integer maximum, then ONE division for the reported ks (the q100
    sufficient-statistics maneuver). PSI alone carries an ln() and
    rounds to 6 (the q75 libm precedent), summed over bins observed
    in BOTH splits (the standard zero-bin exclusion, made
    deterministic). Output: one row per occupied bin with both
    cumulative histograms, plus the global ks/psi attached via a
    1-row crossJoin (literal-attach shape).

    Scale: one scan, one 64-row aggregation with map-side combine,
    windows over the 64-row bin frame (reduced input — the sanctioned
    below-Aggregate shape), nothing else.
    """
    e = load_table(spark, sf_dir, "events")
    return _drift_frame(e)


def _drift_frame(e: DataFrame) -> DataFrame:
    """The q102 dataflow over any events-shaped frame (user_id,
    value) — split out so the NULL-routing contract is directly
    testable on planted frames (tests/test_sampling.py)."""
    from pyspark.sql import Window

    # NULL user_id lands in split B on BOTH sides (when->otherwise here
    # mirrors the oracle's CASE ELSE; a bare cast would drop the row
    # from both histograms while the oracle counts it in B)
    split_a = _bucket(F.col("user_id"), 100) < 50
    binc = F.least(F.lit(63), F.floor(F.col("value") / 10).cast("int"))
    dec = "decimal(38,0)"
    g = (
        e.select(
            binc.alias("bin"),
            F.when(split_a, 1).otherwise(0).alias("a"),
        )
        .groupBy("bin")
        .agg(
            F.sum("a").cast(dec).alias("c_a"),
            F.sum(1 - F.col("a")).cast(dec).alias("c_b"),
        )
    )
    w = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = g.select(
        "bin",
        "c_a",
        "c_b",
        F.sum("c_a").over(w).alias("cum_a"),
        F.sum("c_b").over(w).alias("cum_b"),
    ).localCheckpoint(eager=False)  # feeds the summary agg AND output
    tot = cum.agg(
        F.max("cum_a").alias("n_a"), F.max("cum_b").alias("n_b")
    )
    withtot = cum.crossJoin(F.broadcast(tot))
    ksdiff = F.abs(
        F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a")
    )
    psi_term = F.when(
        (F.col("c_a") > 0) & (F.col("c_b") > 0),
        (
            F.col("c_a").cast("double") / F.col("n_a").cast("double")
            - F.col("c_b").cast("double") / F.col("n_b").cast("double")
        )
        * F.log(
            (F.col("c_a") * F.col("n_b")).cast("double")
            / ((F.col("c_b") * F.col("n_a")).cast("double"))
        ),
    ).otherwise(F.lit(0.0))
    summary = withtot.agg(
        F.max(ksdiff).alias("ks_num"),
        F.round(F.sum(psi_term), 6).alias("psi"),
    )
    return (
        withtot.crossJoin(F.broadcast(summary))
        .select(
            "bin",
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            F.col("cum_a").cast("bigint").alias("cum_a"),
            F.col("cum_b").cast("bigint").alias("cum_b"),
            (
                F.col("ks_num").cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("ks"),
            "psi",
        )
        .orderBy("bin")
    )


QUERIES["q102_dist_drift"] = q102_dist_drift

ORACLES["q102_dist_drift"] = """
    WITH g AS (
      SELECT LEAST(63, CAST(floor(value / 10) AS INT)) AS bin,
             CAST(SUM(CASE WHEN (user_id * 2654435761) % 100 < 50
                           THEN 1 ELSE 0 END) AS HUGEINT) AS c_a,
             CAST(SUM(CASE WHEN (user_id * 2654435761) % 100 < 50
                           THEN 0 ELSE 1 END) AS HUGEINT) AS c_b
      FROM events GROUP BY 1),
    cum AS (
      SELECT bin, c_a, c_b,
             SUM(c_a) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
               AS cum_a,
             SUM(c_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
               AS cum_b
      FROM g),
    tot AS (SELECT MAX(cum_a) AS n_a, MAX(cum_b) AS n_b FROM cum),
    summary AS (
      SELECT MAX(abs(cum_a * n_b - cum_b * n_a)) AS ks_num,
             ROUND(SUM(CASE WHEN c_a > 0 AND c_b > 0
               THEN (CAST(c_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                     - CAST(c_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                    * ln(CAST(c_a * n_b AS DOUBLE)
                         / CAST(c_b * n_a AS DOUBLE))
               ELSE 0.0 END), 6) AS psi
      FROM cum, tot)
    SELECT bin,
           CAST(c_a AS BIGINT) AS c_a,
           CAST(c_b AS BIGINT) AS c_b,
           CAST(cum_a AS BIGINT) AS cum_a,
           CAST(cum_b AS BIGINT) AS cum_b,
           CAST(ks_num AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS ks,
           psi
    FROM cum, tot, summary
    ORDER BY bin
"""


def q103_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between the user-hash split and
    the event-type distribution — the A/B-testing / bias-audit
    companion to q102's drift gate (is the categorical mix the same in
    both halves?).

    Exactness: the 2xK contingency counts, row/column totals and every
    cell's (o*n - row*col) numerator are exact integers (DECIMAL(38,0)
    — same headroom note as q100); each cell term
    (o*n - row*col)^2 / (n*row*col) is then a FIXED double expression
    over exact operands, and only the final sum rounds (6 places, the
    cross-partition summation-order ulp). NULL user_id rows land in
    split B on both sides (the q102 convention). The 0.05 critical
    value for dof = K-1 degrees of freedom ships as the adjudicated
    ``reject_independence`` flag.

    Scale: one scan, one K-row aggregation with map-side combine,
    then driver-scale arithmetic on the K-row frame.
    """
    e = load_table(spark, sf_dir, "events")
    split_a = _bucket(F.col("user_id"), 100) < 50
    dec = "decimal(38,0)"
    g = (
        e.select(
            "event_type",
            F.when(split_a, 1).otherwise(0).alias("a"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("a").cast(dec).alias("c_a"),
            F.sum(1 - F.col("a")).cast(dec).alias("c_b"),
        )
        .localCheckpoint(eager=False)  # totals agg AND per-row output
    )
    tot = g.agg(
        F.sum("c_a").alias("col_a"),
        F.sum("c_b").alias("col_b"),
        F.sum(F.col("c_a") + F.col("c_b")).alias("n"),
        F.count(F.lit(1)).alias("k"),
    )
    wt = g.crossJoin(F.broadcast(tot))
    row_tot = F.col("c_a") + F.col("c_b")

    def term(obs, col_tot):
        num = (obs * F.col("n") - row_tot * col_tot).cast("double")
        den = (F.col("n") * row_tot * col_tot).cast("double")
        return (num * num) / den

    summary = wt.agg(
        F.round(
            F.sum(term(F.col("c_a"), F.col("col_a")))
            + F.sum(term(F.col("c_b"), F.col("col_b"))),
            6,
        ).alias("chi2"),
        (F.first("k") - 1).cast("bigint").alias("dof"),
    ).withColumn(
        # dof = 4 at the shipped K = 5: chi2_0.95 = 9.487729
        "reject_independence",
        (F.col("chi2") > F.lit(9.487729)).cast("bigint"),
    )
    return (
        g.crossJoin(F.broadcast(summary))
        .select(
            "event_type",
            F.col("c_a").cast("bigint").alias("c_a"),
            F.col("c_b").cast("bigint").alias("c_b"),
            "chi2",
            "dof",
            "reject_independence",
        )
        .orderBy("event_type")
    )


QUERIES["q103_chi2_independence"] = q103_chi2_independence

ORACLES["q103_chi2_independence"] = """
    WITH g AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN (user_id * 2654435761) % 100 < 50
                           THEN 1 ELSE 0 END) AS HUGEINT) AS c_a,
             CAST(SUM(CASE WHEN (user_id * 2654435761) % 100 < 50
                           THEN 0 ELSE 1 END) AS HUGEINT) AS c_b
      FROM events GROUP BY 1),
    tot AS (
      SELECT SUM(c_a) AS col_a, SUM(c_b) AS col_b,
             SUM(c_a + c_b) AS n, COUNT(*) AS k
      FROM g),
    s AS (
      SELECT ROUND(
               SUM(CAST(c_a * n - (c_a + c_b) * col_a AS DOUBLE)
                   * CAST(c_a * n - (c_a + c_b) * col_a AS DOUBLE)
                   / CAST(n * (c_a + c_b) * col_a AS DOUBLE))
             + SUM(CAST(c_b * n - (c_a + c_b) * col_b AS DOUBLE)
                   * CAST(c_b * n - (c_a + c_b) * col_b AS DOUBLE)
                   / CAST(n * (c_a + c_b) * col_b AS DOUBLE)), 6) AS chi2,
             CAST(MIN(k) - 1 AS BIGINT) AS dof
      FROM g, tot)
    SELECT event_type,
           CAST(c_a AS BIGINT) AS c_a,
           CAST(c_b AS BIGINT) AS c_b,
           chi2, dof,
           CAST(CASE WHEN chi2 > 9.487729 THEN 1 ELSE 0 END AS BIGINT)
             AS reject_independence
    FROM g, s ORDER BY event_type
"""


def q112_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional corpus downsampling — keep each document
    with probability min(1, r * w / avg_w), w = n_chars, r = 0.3: the
    importance-sampling step that preferentially keeps long/heavy
    documents while hitting an overall rate near r. (q59 is the
    categorical-rate mixer; this is its continuous-weight sibling.)

    Exactness: u = hash-bucket/1e6 is an exact rational; the threshold
    r * w / avg_w is a fixed-shape chain of IEEE ops on deterministic
    doubles (avg_w = exact integer sum / exact count, one division);
    the comparison therefore selects the SAME rows in both engines —
    no libm anywhere, no rounding needed until the displayed rate.

    Scale shape: one 1-row aggregate crossJoin-broadcast (the
    literal-attach shape) then a map-only predicate on the scan — no
    shuffle of document rows at all; the per-source report aggregation
    reduces with map-side combine. The million-bucket hash uses the
    overflow-free _bucket form (safe past 3.47e9 ids).
    """
    d = load_table(spark, sf_dir, "documents")
    avg_w = d.agg(
        (
            F.sum("n_chars").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_w")
    )
    u = _bucket(F.col("doc_id"), 1000000, salt=7) / F.lit(1000000.0)
    thr = F.lit(0.3) * F.col("n_chars").cast("double") / F.col("avg_w")
    kept = d.crossJoin(F.broadcast(avg_w)).where(u < thr)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 2).alias(
                "avg_kept_chars"
            ),
        )
        .orderBy("source")
    )


QUERIES["q112_weighted_sample"] = q112_weighted_sample

ORACLES["q112_weighted_sample"] = """
    WITH a AS (
      SELECT CAST(SUM(n_chars) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS avg_w
      FROM documents)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS kept_docs,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 2) AS avg_kept_chars
    FROM documents, a
    WHERE (((doc_id + 7) * 2654435761) % 1000000) / 1000000.0
          < 0.3 * CAST(n_chars AS DOUBLE) / avg_w
    GROUP BY source ORDER BY source
"""


def q118_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer dimension: group sizes of
    the quasi-identifier tuple (nation, market segment, account-balance
    band) as a histogram — the privacy-release gate run before any
    table leaves the lake. The first row's class_size IS the table's
    k-anonymity; rows with at_risk_k5 = 1 enumerate the equivalence
    classes a k=5 release must suppress or generalize.

    Exactness: the balance band is floor(x / 1000.0) — true floor in
    BOTH engines on identical doubles (DuckDB's `//` truncation trap
    only bites integer division); all outputs are int64 counts.

    Scale shape: one groupBy on the QI tuple (map-side combine; the
    only shuffle, and on the exact key set the audit is about) then a
    ~hundreds-of-rows histogram re-aggregation. No window, no join —
    the 100 TB fact side is never touched.
    """
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("int")
    qi = c.select(
        "c_nationkey", "c_mktsegment", band.alias("bal_band")
    ).groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count(F.lit(1)).cast("long").alias("class_size")
    )
    return (
        qi.groupBy("class_size")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum("class_size").cast("long").alias("n_rows"),
        )
        .select(
            "class_size", "n_groups", "n_rows",
            F.when(F.col("class_size") < 5, F.lit(1))
            .otherwise(F.lit(0)).cast("long").alias("at_risk_k5"),
        )
        .orderBy("class_size")
    )


QUERIES["q118_k_anonymity"] = q118_k_anonymity

ORACLES["q118_k_anonymity"] = """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(FLOOR(c_acctbal / 1000.0) AS INT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS class_size
      FROM customer GROUP BY 1, 2, 3)
    SELECT class_size,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(class_size) AS BIGINT) AS n_rows,
           CAST(CASE WHEN class_size < 5 THEN 1 ELSE 0 END AS BIGINT)
             AS at_risk_k5
    FROM qi GROUP BY class_size ORDER BY class_size
"""


def q121_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit (operators/skew.py::key_skew_audit) over the
    two keys a TPC-H-shaped warehouse shuffles most — events.user_id
    and lineitem.l_partkey: distinct keys, top-1/top-10 key loads and
    the Gini of the frequency distribution, the numbers that decide
    between a plain equi-join, AQE skew splitting, and `salted_join`.
    """
    from dataingestiontohana_spark.operators.skew import key_skew_audit

    e = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        key_skew_audit(e, "user_id", "events.user_id")
        .unionByName(
            key_skew_audit(li, "l_partkey", "lineitem.l_partkey")
        )
        .orderBy("key_name")
    )


QUERIES["q121_key_skew_audit"] = q121_key_skew_audit

ORACLES["q121_key_skew_audit"] = """
    WITH f1 AS (
      SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY user_id),
    r1 AS (
      SELECT x,
             ROW_NUMBER() OVER (ORDER BY x ASC, k ASC) AS rn,
             ROW_NUMBER() OVER (ORDER BY x DESC, k ASC) AS rd
      FROM f1),
    a1 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(x) AS BIGINT) AS total_rows,
             CAST(MAX(x) AS BIGINT) AS top1_rows,
             CAST(SUM(CASE WHEN rd <= 10 THEN x ELSE 0 END) AS BIGINT)
               AS top10_rows,
             SUM(rn * x) AS s1
      FROM r1),
    f2 AS (
      SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS x
      FROM lineitem GROUP BY l_partkey),
    r2 AS (
      SELECT x,
             ROW_NUMBER() OVER (ORDER BY x ASC, k ASC) AS rn,
             ROW_NUMBER() OVER (ORDER BY x DESC, k ASC) AS rd
      FROM f2),
    a2 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(x) AS BIGINT) AS total_rows,
             CAST(MAX(x) AS BIGINT) AS top1_rows,
             CAST(SUM(CASE WHEN rd <= 10 THEN x ELSE 0 END) AS BIGINT)
               AS top10_rows,
             SUM(rn * x) AS s1
      FROM r2)
    SELECT * FROM (
      SELECT 'events.user_id' AS key_name, n_keys, total_rows, top1_rows,
             top10_rows,
             ROUND(CAST(2 * s1 - (n_keys + 1) * total_rows AS DOUBLE)
                   / CAST(n_keys * total_rows AS DOUBLE), 6) AS gini
      FROM a1
      UNION ALL
      SELECT 'lineitem.l_partkey', n_keys, total_rows, top1_rows,
             top10_rows,
             ROUND(CAST(2 * s1 - (n_keys + 1) * total_rows AS DOUBLE)
                   / CAST(n_keys * total_rows AS DOUBLE), 6)
      FROM a2)
    ORDER BY key_name
"""


def q128_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    fraud/synthetic-data screen: observed leading-digit shares vs the
    log10(1 + 1/d) expectation, per digit.

    Exactness: the leading digit comes from the INTEGER cents string
    (int64-to-text is identical across engines — no double formatting
    anywhere); counts are int64; pct is one exact-int division rounded
    to 4; the Benford expectation is log10 rounded to 6 (the q75 libm
    precedent: both engines' correctly-rounded libm agrees at 6
    places on these nine literals).

    Scale shape: map-only digit extraction in codegen, ONE map-side-
    combined groupBy onto 9 rows, totals attached as a 1-row broadcast
    crossJoin.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1)
    counts = (
        o.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    tot = counts.agg(F.sum("n").cast("long").alias("total"))
    pct = F.round(
        (F.lit(100) * F.col("n")).cast("double")
        / F.col("total").cast("double"),
        4,
    )
    benford = F.round(
        F.lit(100.0)
        * F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")),
        6,
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n", "total",
            pct.alias("pct"),
            benford.alias("benford_pct"),
            F.round(pct - benford, 4).alias("dev_pct"),
        )
        .orderBy("digit")
    )


QUERIES["q128_benford_audit"] = q128_benford_audit

ORACLES["q128_benford_audit"] = """
    WITH c AS (
      SELECT substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    AS VARCHAR), 1, 1) AS digit
      FROM orders),
    g AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM c GROUP BY digit),
    t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM g)
    SELECT digit, n, total,
           ROUND(CAST(100 * n AS DOUBLE) / CAST(total AS DOUBLE), 4) AS pct,
           ROUND(100.0 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
             AS benford_pct,
           ROUND(ROUND(CAST(100 * n AS DOUBLE) / CAST(total AS DOUBLE), 4)
                 - ROUND(100.0 * log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6),
                 4) AS dev_pct
    FROM g, t ORDER BY digit
"""


_Q130_BUDGET = 30000  # chars per source


def q130_token_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budgeted corpus fill: per source, keep documents in
    deterministic hash order until the running character total reaches
    the budget (the straddling document is kept) — the "sample N
    tokens per source" step of dataset mixing, as a rank-free
    cumulative cutoff.

    The naive formulation is a cumulative-sum window PARTITION BY
    source — with a handful of sources, each partition is a
    single-task funnel over the whole corpus. Instead the cumsum is
    two-pass bucketed (the operators/ranks.py shape): per-(source,
    hash-bucket) subtotals aggregate map-side, bucket offsets come
    from a window over that |sources| x 1000 frame, and the per-doc
    running total is offset + a window WITHIN the (source, bucket)
    partition — thousands of balanced frames, identical global order
    (bucket, doc_id).

    Exactness: the order key is the deterministic Knuth hash bucket
    with doc_id ties; all cumulative sums are int64; kept/char counts
    are int64; fill_pct is ONE exact-int division rounded for display.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    r = d.select(
        "source", "doc_id", "n_chars",
        _bucket(F.col("doc_id"), 1000, salt=31).alias("b"),
    )
    sub = r.groupBy("source", "b").agg(
        F.sum("n_chars").cast("long").alias("sc")
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sub.select(
        "source", "b",
        F.coalesce(F.sum("sc").over(woff), F.lit(0)).cast("long").alias("off"),
    )
    wloc = (
        Window.partitionBy("source", "b")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = (
        F.col("off")
        + F.coalesce(F.sum("n_chars").over(wloc), F.lit(0)).cast("long")
    )
    kept = (
        r.join(F.broadcast(offsets), ["source", "b"])
        .withColumn("cum_before", cum_before)
        .where(F.col("cum_before") < F.lit(_Q130_BUDGET))
    )
    g = kept.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("kept_docs"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )
    return g.select(
        "source", "kept_docs", "kept_chars",
        F.lit(_Q130_BUDGET).cast("long").alias("budget_chars"),
        F.round(
            (F.lit(100) * F.col("kept_chars")).cast("double")
            / F.lit(float(_Q130_BUDGET)),
            2,
        ).alias("fill_pct"),
    ).orderBy("source")


QUERIES["q130_token_budget_fill"] = q130_token_budget_fill

ORACLES["q130_token_budget_fill"] = f"""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ((doc_id + 31) % 1000) * ({_KNUTH} % 1000) % 1000 AS b
      FROM documents),
    c AS (
      SELECT source, n_chars,
             COALESCE(SUM(n_chars) OVER (PARTITION BY source
               ORDER BY b, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM r),
    k AS (SELECT * FROM c WHERE cum_before < {_Q130_BUDGET}),
    g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(n_chars) AS BIGINT) AS kept_chars
      FROM k GROUP BY source)
    SELECT source, kept_docs, kept_chars,
           CAST({_Q130_BUDGET} AS BIGINT) AS budget_chars,
           ROUND(CAST(100 * kept_chars AS DOUBLE)
                 / {float(_Q130_BUDGET)}, 2) AS fill_pct
    FROM g ORDER BY source
"""


def q143_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted corpus mixing: per-language keep targets
    proportional to c_i^alpha (alpha=0.5), the multilingual-LM
    sampling scheme that up-weights low-resource languages relative
    to their raw share (q59 applies FIXED per-source rates; here the
    rates are DERIVED from the corpus composition itself).

    Exactness: every cross-engine comparison is integer. The weight
    w_i = floor(sqrt(c_i)*1000) is an int64 (sqrt is IEEE-identical in
    both engines); the target floor(T*w_i/W) divides exact int64
    products under 2^53 through an identical double floor (a corpus
    where T*w_i exceeds 2^53 upgrades the product to DECIMAL(38,0) —
    document-count 2^53 is ~9e15 docs, far past 100 TB); the keep
    decision bucket(doc_id)*c_i < target_i*10^6 is pure int64 — no
    double ever decides row membership.

    Scale shape: pass 1 aggregates |langs| rows (map-side combine);
    the derived rate table broadcasts back onto the scan for pass 2 —
    filter + final aggregate, again combiner-friendly. Two scans, no
    shuffle wider than |langs|.
    """
    d = load_table(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = stats.agg(
        F.sum("c").cast("long").alias("n_total"),
        F.sum(F.floor(F.sqrt(F.col("c")) * 1000).cast("long"))
        .cast("long")
        .alias("w_total"),
    )
    rates = (
        stats.crossJoin(F.broadcast(totals))
        .withColumn("w", F.floor(F.sqrt(F.col("c")) * 1000).cast("long"))
        .withColumn("t_budget", F.floor(F.col("n_total") / 2).cast("long"))
        .withColumn(
            "target",
            F.floor(
                (F.col("t_budget") * F.col("w")).cast("double")
                / F.col("w_total")
            ).cast("long"),
        )
        .select("lang", "c", "w", "target")
    )
    kept = (
        d.join(F.broadcast(rates), "lang")
        .where(
            _bucket(F.col("doc_id"), 1000000) * F.col("c")
            < F.col("target") * F.lit(1000000)
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("kept_docs"),
            F.sum("n_chars").cast("long").alias("kept_chars"),
        )
    )
    out = (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("c").alias("c_docs"),
            F.col("w").alias("w_q"),
            F.col("target").alias("target_docs"),
            F.coalesce(F.col("kept_docs"), F.lit(0)).cast("long").alias(
                "kept_docs"
            ),
            F.coalesce(F.col("kept_chars"), F.lit(0)).cast("long").alias(
                "kept_chars"
            ),
            F.when(
                F.col("target") > 0,
                F.round(
                    F.lit(100.0)
                    * F.coalesce(F.col("kept_docs"), F.lit(0))
                    / F.col("target"),
                    4,
                ),
            )
            .otherwise(F.lit(0.0))
            .cast("double")
            .alias("fill_pct"),
        )
        .orderBy("lang")
    )
    return out


QUERIES["q143_temperature_mix"] = q143_temperature_mix

ORACLES["q143_temperature_mix"] = f"""
    WITH stats AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS n_total,
             CAST(SUM(CAST(FLOOR(SQRT(c) * 1000) AS BIGINT)) AS BIGINT)
               AS w_total
      FROM stats),
    rates AS (
      SELECT s.lang, s.c,
             CAST(FLOOR(SQRT(s.c) * 1000) AS BIGINT) AS w,
             CAST(FLOOR(CAST((CAST(FLOOR(t.n_total / 2) AS BIGINT))
                  * CAST(FLOOR(SQRT(s.c) * 1000) AS BIGINT) AS DOUBLE)
                  / t.w_total) AS BIGINT) AS target
      FROM stats s CROSS JOIN tot t),
    kept AS (
      SELECT d.lang,
             CAST(COUNT(*) AS BIGINT) AS kept_docs,
             CAST(SUM(d.n_chars) AS BIGINT) AS kept_chars
      FROM documents d JOIN rates r ON d.lang = r.lang
      WHERE ((d.doc_id % 1000000) * ({_KNUTH} % 1000000)) % 1000000 * r.c
            < r.target * 1000000
      GROUP BY 1)
    SELECT r.lang,
           r.c AS c_docs,
           r.w AS w_q,
           r.target AS target_docs,
           CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
           CAST(COALESCE(k.kept_chars, 0) AS BIGINT) AS kept_chars,
           CASE WHEN r.target > 0
                THEN ROUND(100.0 * COALESCE(k.kept_docs, 0) / r.target, 4)
                ELSE 0.0 END AS fill_pct
    FROM rates r LEFT JOIN kept k ON r.lang = k.lang
    ORDER BY r.lang
"""


def q147_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift / calibration table: users ranked by total
    engagement value (non-purchase events), cut into exact deciles,
    each decile scored by its purchase-conversion rate and cumulative
    lift over the base rate — the model-calibration report that
    validates "does engagement predict conversion".

    Exactness: decile cuts use exact NTILE tile arithmetic on the
    two-pass bucketed global row_number (ties broken by user_id);
    rates and lift are single divisions of exact int64 counts,
    rounded for display.

    Scale shape: events reduce map-side to one row per user (sum +
    max-flag); ranking runs on that reduced frame through the
    bounded-window bucketed-rank operator (no single-partition NTILE);
    the decile aggregate is 10 rows and the cumulative lift window
    runs on those 10.
    """
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") != "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("eng_cents"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("buyer"),
    )
    ranked = bucketed_ranks(
        per_user, "eng_cents", part_cols=(), tie_cols=("user_id",)
    )
    tile = exact_ntile(F.col("g_rn"), F.col("g_n"), 10)
    dec = (
        ranked.select(
            tile.alias("decile"), "eng_cents", "buyer"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("users"),
            F.sum("buyer").cast("long").alias("buyers"),
            F.sum("eng_cents").cast("long").alias("eng_cents"),
        )
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    # 10-row frame below the aggregate: the sanctioned reduced-input
    # unpartitioned-window shape
    out = dec.select(
        "decile", "users", "buyers", "eng_cents",
        F.round(
            F.col("buyers").cast("double") / F.col("users").cast("double"), 4
        ).alias("buy_rate"),
        F.sum("buyers").over(w_cum).cast("long").alias("cum_buyers"),
        F.sum("users").over(w_cum).cast("long").alias("cum_users"),
        F.sum("buyers").over(w_all).cast("long").alias("all_buyers"),
        F.sum("users").over(w_all).cast("long").alias("all_users"),
    )
    lift = (
        F.col("cum_buyers").cast("double") * F.col("all_users").cast("double")
    ) / (
        F.col("cum_users").cast("double") * F.col("all_buyers").cast("double")
    )
    return out.select(
        "decile", "users", "buyers", "eng_cents", "buy_rate",
        F.round(lift, 4).alias("cum_lift"),
    ).orderBy("decile")


QUERIES["q147_decile_lift"] = q147_decile_lift

ORACLES["q147_decile_lift"] = """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type <> 'purchase'
               THEN CAST(ROUND(value * 100, 0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS eng_cents,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS buyer
      FROM events GROUP BY 1),
    t AS (
      SELECT eng_cents, buyer,
             NTILE(10) OVER (ORDER BY eng_cents, user_id) AS decile
      FROM per_user),
    dec AS (
      SELECT decile,
             CAST(COUNT(*) AS BIGINT) AS users,
             CAST(SUM(buyer) AS BIGINT) AS buyers,
             CAST(SUM(eng_cents) AS BIGINT) AS eng_cents
      FROM t GROUP BY 1),
    c AS (
      SELECT decile, users, buyers, eng_cents,
             ROUND(CAST(buyers AS DOUBLE) / CAST(users AS DOUBLE), 4)
               AS buy_rate,
             CAST(SUM(buyers) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_buyers,
             CAST(SUM(users) OVER (ORDER BY decile
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_users,
             CAST(SUM(buyers) OVER () AS BIGINT) AS all_buyers,
             CAST(SUM(users) OVER () AS BIGINT) AS all_users
      FROM dec)
    SELECT decile, users, buyers, eng_cents, buy_rate,
           ROUND((CAST(cum_buyers AS DOUBLE) * CAST(all_users AS DOUBLE))
                 / (CAST(cum_users AS DOUBLE) * CAST(all_buyers AS DOUBLE)),
                 4) AS cum_lift
    FROM c
    ORDER BY decile
"""


def q149_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event type and hour-of-day — the
    dependence audit behind feature selection and leakage checks
    (q103's chi-square answers "independent?"; MI measures HOW MUCH
    dependence, in nats, and decomposes per category).

    Exactness: each cell's contribution (p_xy * ln(p_xy/(p_x p_y)))
    is computed from exact int64 counts through one fixed expression
    tree (identical in both engines), rounded to a q6 integer BEFORE
    summing — so the per-type sum is exact int arithmetic, immune to
    fold-order ulps (tighter than q102's round-after-sum).

    Scale shape: events reduce map-side to |types| x 24 cells; margins
    are windows over that reduced frame (below the aggregate — the
    sanctioned shape); output is |types| rows.
    """
    from pyspark.sql.window import Window as W

    e = load_table(spark, sf_dir, "events")
    cells = (
        e.select("event_type", F.hour("ts").alias("hod"))
        .groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    )
    w_x = W.partitionBy("event_type")
    w_y = W.partitionBy("hod")
    w_all = W.partitionBy()
    m = cells.select(
        "event_type", "hod", "n_xy",
        F.sum("n_xy").over(w_x).cast("long").alias("n_x"),
        F.sum("n_xy").over(w_y).cast("long").alias("n_y"),
        F.sum("n_xy").over(w_all).cast("long").alias("n_tot"),
    )
    term = (
        F.col("n_xy").cast("double") / F.col("n_tot").cast("double")
    ) * F.log(
        (F.col("n_xy").cast("double") * F.col("n_tot").cast("double"))
        / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
    )
    q6 = F.round(term * 1e6, 0).cast("long")
    return (
        m.groupBy("event_type")
        .agg(
            F.max("n_x").cast("long").alias("n_x"),
            F.count(F.lit(1)).cast("long").alias("cells"),
            F.sum(q6).cast("long").alias("mi_part_q6"),
        )
        .select(
            "event_type", "n_x", "cells", "mi_part_q6",
            (F.col("mi_part_q6").cast("double") / 1e6).alias("mi_part"),
        )
        .orderBy("event_type")
    )


QUERIES["q149_mutual_information"] = q149_mutual_information

ORACLES["q149_mutual_information"] = """
    WITH cells AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM events GROUP BY 1, 2),
    m AS (
      SELECT event_type, hod, n_xy,
             CAST(SUM(n_xy) OVER (PARTITION BY event_type) AS BIGINT)
               AS n_x,
             CAST(SUM(n_xy) OVER (PARTITION BY hod) AS BIGINT) AS n_y,
             CAST(SUM(n_xy) OVER () AS BIGINT) AS n_tot
      FROM cells)
    SELECT event_type,
           CAST(MAX(n_x) AS BIGINT) AS n_x,
           CAST(COUNT(*) AS BIGINT) AS cells,
           CAST(SUM(CAST(ROUND(
             (CAST(n_xy AS DOUBLE) / CAST(n_tot AS DOUBLE))
             * ln((CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE))
                  / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
             * 1e6, 0) AS BIGINT)) AS BIGINT) AS mi_part_q6,
           CAST(SUM(CAST(ROUND(
             (CAST(n_xy AS DOUBLE) / CAST(n_tot AS DOUBLE))
             * ln((CAST(n_xy AS DOUBLE) * CAST(n_tot AS DOUBLE))
                  / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
             * 1e6, 0) AS BIGINT)) AS DOUBLE) / 1e6 AS mi_part
    FROM m
    GROUP BY event_type
    ORDER BY event_type
"""


def q163_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source quantile normalization: map every source's
    document-length distribution onto the GLOBAL length distribution
    (each distinct (source, n_chars) value lands on the global value
    at its source-relative rank) — the batch-effect correction an ML
    feature pipeline applies before sources are mixed, so that "long
    for wiki" and "long for web" mean the same thing downstream.

    Exactness: everything is rank arithmetic on exact int64 value
    groups. The target rank ceil(cum_src * N_glob / n_src) is a
    floor((a*b + c - 1) div c) of exact integers, and the lookup
    "smallest global value whose cumulative count reaches that rank"
    is an integer comparison — no doubles anywhere.

    Scale shape: both distributions are VALUE GROUPS (|distinct
    lengths| rows, reduced below their aggregates — the sanctioned
    window shape); the lookup is the q44 union-tag merge: interleave
    source needs and global interval ends on the rank axis, carry the
    next global value backward with one first(ignorenulls) window —
    a sort-merge, never the rank-triangle join a correlated subquery
    would cost on a cluster (which is exactly what the DuckDB oracle
    runs, as an independent formulation).
    """
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("source", F.col("n_chars").alias("v")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    w_src = (
        W.partitionBy("source").orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_src_all = W.partitionBy("source").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    tot = d.agg(F.count(F.lit(1)).cast("long").alias("n_g"))
    needs = src.select(
        "source", "v", "cnt",
        F.sum("cnt").over(w_src).cast("long").alias("cum_s"),
        F.sum("cnt").over(w_src_all).cast("long").alias("n_s"),
    ).join(F.broadcast(tot))  # 1-row literal attach (sanctioned)
    glob = d.groupBy(F.col("n_chars").alias("gv")).agg(
        F.count(F.lit(1)).cast("long").alias("gcnt")
    )
    w_g = W.orderBy("gv").rowsBetween(W.unboundedPreceding, 0)
    w_g_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    gcum = glob.select(
        "gv",
        F.sum("gcnt").over(w_g).cast("long").alias("cum_g"),
        F.sum("gcnt").over(w_g_all).cast("long").alias("n_g"),
    )
    # target rank: ceil(cum_s * n_g / n_s), exact integer arithmetic
    tr = F.expr(
        "CAST((cum_s * n_g + n_s - 1) DIV n_s AS BIGINT)"
    )
    need_rows = needs.select(
        "source", "v", "cnt",
        tr.alias("key"),
        F.lit(None).cast("long").alias("gval"),
        F.lit(0).alias("tag"),
    )
    g_rows = gcum.select(
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("long").alias("cnt"),
        F.col("cum_g").alias("key"),
        F.col("gv").alias("gval"),
        F.lit(1).alias("tag"),
    )
    # global interval-ends sort AFTER needs at the same key (tag 1), so
    # a forward first(ignorenulls) from a need row catches an exactly
    # equal cum_g — "smallest global value with cum_g >= target rank"
    merged = need_rows.unionByName(g_rows)
    w_next = W.orderBy("key", "tag").rowsBetween(0, W.unboundedFollowing)
    out = (
        merged.withColumn(
            "norm_chars", F.first("gval", ignorenulls=True).over(w_next)
        )
        .where(F.col("tag") == 0)
        .select("source", F.col("v").alias("n_chars"), "cnt", "norm_chars")
    )
    return out.orderBy("source", "n_chars")


QUERIES["q163_quantile_normalize"] = q163_quantile_normalize

ORACLES["q163_quantile_normalize"] = """
    WITH src AS (
      SELECT source, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM documents GROUP BY 1, 2),
    needs AS (
      SELECT source, v, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY source ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_s,
             CAST(SUM(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_s
      FROM src),
    gdist AS (
      SELECT n_chars AS gv, CAST(COUNT(*) AS BIGINT) AS gcnt
      FROM documents GROUP BY 1),
    gcum AS (
      SELECT gv,
             CAST(SUM(gcnt) OVER (ORDER BY gv
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_g,
             CAST(SUM(gcnt) OVER () AS BIGINT) AS n_g
      FROM gdist)
    SELECT n.source, n.v AS n_chars, n.cnt,
           (SELECT MIN(g.gv) FROM gcum g
            WHERE g.cum_g >= (n.cum_s * (SELECT MAX(n_g) FROM gcum)
                              + n.n_s - 1) // n.n_s) AS norm_chars
    FROM needs n
    ORDER BY n.source, n.v
"""


def q168_cuped_ab_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with CUPED variance reduction (Deng et
    al., WSDM'13): users split by the deterministic q57 hash, the
    post-period activity metric adjusted by each user's PRE-period
    activity — the covariate every experimentation platform uses,
    because it shrinks metric variance by rho^2 without biasing the
    between-group difference (the hash split is independent of
    pre-period behavior).

    theta = cov(pre, post)/var(pre) is fitted POOLED (both groups, the
    standard practice — a per-group theta would leak the treatment
    effect into the adjustment); the adjusted group mean uses the
    aggregate identity mean_adj = mean_post - theta*(mean_pre -
    mean_pre_pooled), which needs only group-level sums — no per-user
    double ever sums across engines.

    Exactness: per-user pre/post counts are int64; every moment (n,
    Sp, Sq, Spp, Spq) is an exact DECIMAL(38,0) sum; theta, rho^2 and
    the variance-reduction factor are single fixed-shape double
    expressions over exact-integer casts (all < 2^53 through 100x
    sf0.1, so even the HUGEINT cast is exact); means round at 6.

    Scale shape: one events scan reduced map-side to a per-user
    (pre, post) frame on the user shuffle; the experiment readout is
    a 2-row group aggregate plus a 1-row pooled-moments literal
    attach (sanctioned). Nothing downstream of the per-user reduce
    ever sees a row count.
    """
    e = load_table(spark, sf_dir, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            (F.col("ts").cast("timestamp") < cut).cast("long")
        ).alias("pre"),
        F.sum(
            (F.col("ts").cast("timestamp") >= cut).cast("long")
        ).alias("post"),
    )
    grp = per_user.withColumn(
        "grp",
        F.when(_bucket(F.col("user_id"), 100, salt=7) < 50, "A").otherwise(
            "B"
        ),
    )
    dec = "decimal(38,0)"
    pooled = grp.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("pre").cast(dec)).alias("sp"),
        F.sum(F.col("post").cast(dec)).alias("sq"),
        F.sum((F.col("pre") * F.col("pre")).cast(dec)).alias("spp"),
        F.sum((F.col("pre") * F.col("post")).cast(dec)).alias("spq"),
    )
    by_grp = grp.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("pre").cast("long").alias("g_sp"),
        F.sum("post").cast("long").alias("g_sq"),
    )
    j = by_grp.join(F.broadcast(pooled))  # 1-row literal attach
    cov = (j["n"] * j["spq"] - j["sp"] * j["sq"]).cast("double")
    varp = (j["n"] * j["spp"] - j["sp"] * j["sp"]).cast("double")
    theta = F.when(varp == 0, F.lit(0.0)).otherwise(cov / varp)
    mean_pre_g = j["g_sp"].cast("double") / j["n_users"].cast("double")
    mean_post_g = j["g_sq"].cast("double") / j["n_users"].cast("double")
    mean_pre_all = j["sp"].cast("double") / j["n"].cast("double")
    mean_adj = mean_post_g - theta * (mean_pre_g - mean_pre_all)
    # rho^2 needs var(post) too — fold it from the same pooled pass?
    # keeping the readout minimal: theta and the adjusted means are
    # the decision surface; rho^2 diagnostics live in q160's machinery
    return j.select(
        "grp",
        "n_users",
        F.round(mean_post_g, 6).alias("mean_post"),
        F.round(mean_pre_g, 6).alias("mean_pre"),
        F.round(theta, 6).alias("theta"),
        F.round(mean_adj, 6).alias("mean_post_cuped"),
    ).orderBy("grp")


QUERIES["q168_cuped_ab_analysis"] = q168_cuped_ab_analysis

ORACLES["q168_cuped_ab_analysis"] = """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                 < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END)
               AS BIGINT) AS pre,
             CAST(SUM(CASE WHEN CAST(ts AS TIMESTAMP)
                 >= TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END)
               AS BIGINT) AS post
      FROM events GROUP BY 1),
    grp AS (
      SELECT *,
             CASE WHEN ((user_id + 7) % 100 * (2654435761 % 100)) % 100
                  < 50 THEN 'A' ELSE 'B' END AS g
      FROM per_user),
    pooled AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(pre AS HUGEINT)) AS sp,
             SUM(CAST(post AS HUGEINT)) AS sq,
             SUM(CAST(pre AS HUGEINT) * pre) AS spp,
             SUM(CAST(pre AS HUGEINT) * post) AS spq
      FROM grp),
    by_grp AS (
      SELECT g, CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(pre) AS BIGINT) AS g_sp,
             CAST(SUM(post) AS BIGINT) AS g_sq
      FROM grp GROUP BY 1)
    SELECT b.g AS grp, b.n_users,
           ROUND(CAST(b.g_sq AS DOUBLE) / CAST(b.n_users AS DOUBLE), 6)
             AS mean_post,
           ROUND(CAST(b.g_sp AS DOUBLE) / CAST(b.n_users AS DOUBLE), 6)
             AS mean_pre,
           ROUND(CASE WHEN (p.n * p.spp - p.sp * p.sp) = 0 THEN 0.0
                 ELSE CAST(p.n * p.spq - p.sp * p.sq AS DOUBLE)
                    / CAST(p.n * p.spp - p.sp * p.sp AS DOUBLE) END, 6)
             AS theta,
           ROUND(CAST(b.g_sq AS DOUBLE) / CAST(b.n_users AS DOUBLE)
               - (CASE WHEN (p.n * p.spp - p.sp * p.sp) = 0 THEN 0.0
                  ELSE CAST(p.n * p.spq - p.sp * p.sq AS DOUBLE)
                     / CAST(p.n * p.spp - p.sp * p.sp AS DOUBLE) END)
                 * (CAST(b.g_sp AS DOUBLE) / CAST(b.n_users AS DOUBLE)
                    - CAST(p.sp AS DOUBLE) / CAST(p.n AS DOUBLE)), 6)
             AS mean_post_cuped
    FROM by_grp b CROSS JOIN pooled p
    ORDER BY b.g
"""

def q173_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of "engagement predicts conversion" via the
    tie-corrected Mann-Whitney rank-sum identity — the model-quality
    companion to q147's decile-lift calibration table. Score = a
    user's total non-purchase engagement cents; label = did the user
    ever purchase. AUC = U / (n_pos * n_neg) with
    U = R_pos - n_pos(n_pos+1)/2, where R_pos sums the AVERAGE rank
    of the positive rows (tie groups share their mean rank — the
    standard correction; without it AUC is biased on a discrete
    score).

    Exactness: the bucketed-rank operator emits g_rank (min rank of
    the tie group) and g_cume (max position), whose sum is exactly
    twice the average rank — so 2*R_pos is an INTEGER accumulated in
    DECIMAL(38,0) (rank sums grow ~n^2, past int64 near 10^10 rows)
    and the only division is the final one, rounded at 6.

    Scale shape: events reduce map-side to one row per user; ranking
    runs through the two-pass bucketed-rank operator (bounded
    windows, never a single-partition ORDER BY); the rest is one
    1-row aggregate. Degenerate corpora (no positives or no
    negatives) emit AUC 0.5 — no information, not an error.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") != "purchase",
                F.round(F.col("value") * 100, 0).cast("long"),
            ).otherwise(F.lit(0))
        ).alias("score"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("buyer"),
    )
    ranked = bucketed_ranks(per_user, "score")
    # (g_rank + g_cume) = 2 * average tie-group rank, an exact integer
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("buyer").cast("long").alias("n_buyers"),
        F.coalesce(
            # cast per ROW, not on the result: a LongType sum wraps
            # silently past 2^63 (ANSI off) before an outer cast
            # could widen it; rank sums grow ~n^2
            F.sum(
                F.when(
                    F.col("buyer") == 1, F.col("g_rank") + F.col("g_cume")
                )
                .otherwise(F.lit(0))
                .cast("decimal(38,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("r2_pos"),
    )
    # coalesce BEFORE the AUC arithmetic so the empty-corpus row (count
    # 0, NULL sums) takes the degenerate 0.5 branch instead of NULLing
    agg = agg.select(
        F.coalesce("n_users", F.lit(0)).alias("n_users"),
        F.coalesce("n_buyers", F.lit(0)).alias("n_buyers"),
        "r2_pos",
    )
    np_ = F.col("n_buyers").cast("decimal(38,0)")
    nn = (F.col("n_users") - F.col("n_buyers")).cast("decimal(38,0)")
    two_u = F.col("r2_pos") - np_ * (np_ + F.lit(1))  # 2*U, exact
    auc = F.when(
        (F.col("n_buyers") == 0) | (F.col("n_users") == F.col("n_buyers")),
        F.lit(0.5),
    ).otherwise(
        F.round(
            two_u.cast("double") / (F.lit(2.0) * np_.cast("double") * nn.cast("double")),
            6,
        )
    )
    return agg.select("n_users", "n_buyers", auc.alias("auc"))


QUERIES["q173_roc_auc"] = q173_roc_auc

ORACLES["q173_roc_auc"] = """
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type <> 'purchase'
               THEN CAST(ROUND(value * 100, 0) AS BIGINT)
               ELSE 0 END) AS BIGINT) AS score,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS buyer
      FROM events GROUP BY 1),
    r AS (
      SELECT buyer,
             RANK() OVER (ORDER BY score) AS rk,
             COUNT(*) OVER (ORDER BY score
               RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
      FROM per_user),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(COALESCE(SUM(buyer), 0) AS BIGINT) AS n_buyers,
             CAST(COALESCE(SUM(CASE WHEN buyer = 1 THEN rk + cm
                                    ELSE 0 END), 0)
                  AS DECIMAL(38,0)) AS r2_pos
      FROM r)
    SELECT n_users, n_buyers,
           CASE WHEN n_buyers = 0 OR n_users = n_buyers THEN 0.5
                ELSE ROUND(
                  CAST(r2_pos - CAST(n_buyers AS DECIMAL(38,0))
                              * (CAST(n_buyers AS DECIMAL(38,0)) + 1)
                       AS DOUBLE)
                  / (2.0 * CAST(n_buyers AS DOUBLE)
                         * CAST(n_users - n_buyers AS DOUBLE)), 6)
           END AS auc
    FROM s
"""

def q175_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-base report: quintile
    every buyer on Recency (days since last order), Frequency (order
    count) and Monetary (lifetime cents), then describe each (r,f,m)
    cell. Tiles are ASCENDING in the metric (tile 1 = most recent /
    fewest orders / least spend) with ties broken by customer key, so
    the assignment is a total order and reproducible anywhere.

    Exactness: recency is an integer day difference against the
    corpus max order date; monetary quantizes to the int64 cents grid
    at the scan; each quintile is the exact NTILE law applied to the
    two-pass bucketed global row_number; cell stats are int64 sums
    with single rounded divisions.

    Scale shape: orders reduce map-side to one row per customer (the
    only event-table-sized shuffle); the corpus max date is a 1-row
    aggregate attached via the sanctioned broadcast literal pattern;
    the three metrics MELT into one (metric, value) frame so a SINGLE
    bucketed-rank sweep (part_cols=metric) ranks all of them at once —
    one two-pass operator over 3n rows instead of three sequential
    passes over n (the r6 verdict's fusion item; the flat ~5 s cost
    was three chained plan/stage fixed overheads, not data) — then one
    conditional aggregate pivots the tiles back to a row per customer;
    the output aggregate has at most 125 cells.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    per_cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_d"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(cents).cast("long").alias("cents"),
    )
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("max_d"))
    per_cust = per_cust.join(F.broadcast(maxd)).withColumn(
        "recency_days", F.datediff(F.col("max_d"), F.col("last_d")).cast("int")
    )
    # all metrics are non-null integers, so one long `val` column
    # preserves each metric's ordering exactly
    melted = per_cust.select(
        "o_custkey", "recency_days", "freq", "cents",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("metric"),
                    F.col("recency_days").cast("long").alias("val"),
                ),
                F.struct(F.lit("f").alias("metric"), F.col("freq").alias("val")),
                F.struct(F.lit("m").alias("metric"), F.col("cents").alias("val")),
            )
        ).alias("mv"),
    ).select(
        "o_custkey", "recency_days", "freq", "cents",
        F.col("mv.metric").alias("metric"), F.col("mv.val").alias("val"),
    )
    ranked = bucketed_ranks(
        melted, "val", part_cols=("metric",), tie_cols=("o_custkey",)
    )
    tile = exact_ntile(F.col("g_rn"), F.col("g_n"), 5)
    cur = ranked.groupBy("o_custkey").agg(
        F.max(F.when(F.col("metric") == "r", tile)).alias("r_tile"),
        F.max(F.when(F.col("metric") == "f", tile)).alias("f_tile"),
        F.max(F.when(F.col("metric") == "m", tile)).alias("m_tile"),
        F.max("recency_days").alias("recency_days"),
        F.max("freq").alias("freq"),
        F.max("cents").alias("cents"),
    )
    return (
        cur.groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum("cents").cast("long").alias("cents"),
            F.round(
                F.sum("recency_days").cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_recency_days"),
            F.round(
                F.sum("freq").cast("double") / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_freq"),
        )
        .orderBy("r_tile", "f_tile", "m_tile")
    )


QUERIES["q175_rfm_segments"] = q175_rfm_segments

ORACLES["q175_rfm_segments"] = """
    WITH per_cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_d,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1),
    rec AS (
      SELECT o_custkey, freq, cents,
             CAST(datediff('day', last_d,
                  (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders))
                  AS INTEGER) AS recency_days
      FROM per_cust),
    tiles AS (
      SELECT recency_days, freq, cents,
             NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_tile,
             NTILE(5) OVER (ORDER BY freq, o_custkey) AS f_tile,
             NTILE(5) OVER (ORDER BY cents, o_custkey) AS m_tile
      FROM rec)
    SELECT r_tile, f_tile, m_tile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS cents,
           ROUND(CAST(SUM(recency_days) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS avg_recency_days,
           ROUND(CAST(SUM(freq) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 4) AS avg_freq
    FROM tiles
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


def q177_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the release-gate companion to q118's
    k-anonymity: within each quasi-identifier group (market segment x
    nation) of the order corpus, how many DISTINCT values of the
    sensitive attribute (order priority) appear (distinct
    l-diversity), and how evenly (Shannon entropy of the in-group
    priority mix — entropy l-diversity log(l) when perfectly even).
    A group can be k-anonymous yet leak everything if all its rows
    share one sensitive value; this is the audit that catches it.

    Exactness: counts are int64; per-cell entropy contributions
    -p*ln(p) round to q6 INTEGERS before summing (the q149
    fold-order-immune convention; ln is the q75 libm precedent);
    the diversity flag is an integer comparison.

    Scale shape: orders reduce map-side to (custkey, priority)
    counts BEFORE the join (so the join input is bounded by
    |customers| x |priorities|, not |orders|), join customers once
    on the key, then two nested aggregates over frames bounded by
    |QI groups| x |priorities| (~125 cells); the in-group total
    window runs over that same bounded cell frame.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per_cp = o.groupBy("o_custkey", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cells = (
        per_cp.join(c, per_cp["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "c_nationkey", "o_orderpriority")
        .agg(F.sum("cnt").cast("long").alias("n_sv"))
    )
    p = F.col("n_sv").cast("double") / F.col("n_rows").cast("double")
    term_q6 = F.round(-p * F.log(p) * 1e6, 0).cast("long")
    w_g = Window.partitionBy("c_mktsegment", "c_nationkey")
    cells = cells.select(
        "c_mktsegment", "c_nationkey", "n_sv",
        F.sum("n_sv").over(w_g).cast("long").alias("n_rows"),
    )
    out = (
        cells.groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.max("n_rows").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("l_distinct"),
            F.sum(term_q6).cast("long").alias("entropy_q6"),
        )
        .select(
            "c_mktsegment", "c_nationkey", "n_rows", "l_distinct",
            "entropy_q6",
            (F.col("l_distinct") >= 3).cast("boolean").alias("diverse_l3"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )
    return out


QUERIES["q177_l_diversity"] = q177_l_diversity

ORACLES["q177_l_diversity"] = """
    WITH cells AS (
      SELECT c.c_mktsegment, c.c_nationkey, o.o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_sv
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2, 3),
    withtot AS (
      SELECT c_mktsegment, c_nationkey, n_sv,
             CAST(SUM(n_sv) OVER (PARTITION BY c_mktsegment, c_nationkey)
                  AS BIGINT) AS n_rows
      FROM cells)
    SELECT c_mktsegment, c_nationkey,
           CAST(MAX(n_rows) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           CAST(SUM(CAST(ROUND(
             -(CAST(n_sv AS DOUBLE) / CAST(n_rows AS DOUBLE))
              * ln(CAST(n_sv AS DOUBLE) / CAST(n_rows AS DOUBLE))
              * 1e6, 0) AS BIGINT)) AS BIGINT) AS entropy_q6,
           COUNT(*) >= 3 AS diverse_l3
    FROM withtot
    GROUP BY 1, 2
    ORDER BY 1, 2
"""

def q183_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix — the dynamics companion to
    q175's static RFM snapshot: quintile every customer by spend in
    the FIRST half of the order history and again in the SECOND
    half, then count the 6x6 transition matrix (tile 0 = absent from
    that half — new, churned or dormant customers are first-class
    cells, not dropped rows).

    Exactness: the half split is integer day arithmetic against the
    corpus min/max dates (floor of a non-negative span, no engine
    division quirk); spend is int64 cents; quintiles are the exact
    NTILE law over bucketed global row_numbers with key tie-breaks;
    the row-share divisions round at 4.

    Scale shape: orders reduce map-side to (half, customer) cents;
    the two rank passes run bounded windows partitioned by half; the
    matrix is a full outer join of two |customers| frames on the
    SAME key (co-partitioned) and the output aggregate is <= 36
    cells; the row-total window runs over those cells.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    bounds = o.agg(
        F.min(od).alias("d0"), F.max(od).alias("d1")
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    half = F.when(
        F.datediff(od, F.col("d0"))
        <= F.floor(F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int"),
        F.lit("H1"),
    ).otherwise(F.lit("H2"))
    per = (
        o.join(F.broadcast(bounds))
        .select(half.alias("half"), "o_custkey", cents.alias("cents"))
        .groupBy("half", "o_custkey")
        .agg(F.sum("cents").cast("long").alias("cents"))
    )
    ranked = bucketed_ranks(
        per, "cents", part_cols=("half",), tie_cols=("o_custkey",)
    )
    tiles = ranked.select(
        "half", "o_custkey",
        exact_ntile(F.col("g_rn"), F.col("g_n"), 5).alias("tile"),
    )
    h1 = tiles.where(F.col("half") == "H1").select(
        "o_custkey", F.col("tile").alias("from_tile")
    )
    h2 = tiles.where(F.col("half") == "H2").select(
        "o_custkey", F.col("tile").alias("to_tile")
    )
    m = (
        h1.join(h2, "o_custkey", "full_outer")
        .select(
            F.coalesce("from_tile", F.lit(0)).alias("from_tile"),
            F.coalesce("to_tile", F.lit(0)).alias("to_tile"),
        )
        .groupBy("from_tile", "to_tile")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    w_row = Window.partitionBy("from_tile")
    return (
        m.select(
            "from_tile", "to_tile", "n_customers",
            F.round(
                F.col("n_customers").cast("double")
                / F.sum("n_customers").over(w_row).cast("double"),
                4,
            ).alias("row_share"),
        )
        .orderBy("from_tile", "to_tile")
    )


QUERIES["q183_segment_migration"] = q183_segment_migration

ORACLES["q183_segment_migration"] = """
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
             MAX(CAST(o_orderdate AS DATE)) AS d1
      FROM orders),
    per AS (
      SELECT CASE WHEN date_diff('day', b.d0, CAST(o.o_orderdate AS DATE))
                  <= CAST(floor(date_diff('day', b.d0, b.d1) / 2.0)
                          AS INTEGER)
                  THEN 'H1' ELSE 'H2' END AS half,
             o.o_custkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS cents
      FROM orders o CROSS JOIN bounds b
      GROUP BY 1, 2),
    tiles AS (
      SELECT half, o_custkey,
             NTILE(5) OVER (PARTITION BY half
                            ORDER BY cents, o_custkey) AS tile
      FROM per),
    m AS (
      SELECT COALESCE(h1.from_tile, 0) AS from_tile,
             COALESCE(h2.to_tile, 0) AS to_tile,
             CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM (SELECT o_custkey, tile AS from_tile FROM tiles
            WHERE half = 'H1') h1
      FULL OUTER JOIN
           (SELECT o_custkey, tile AS to_tile FROM tiles
            WHERE half = 'H2') h2
      USING (o_custkey)
      GROUP BY 1, 2)
    SELECT from_tile, to_tile, n_customers,
           ROUND(CAST(n_customers AS DOUBLE)
                 / CAST(SUM(n_customers)
                        OVER (PARTITION BY from_tile) AS DOUBLE), 4)
             AS row_share
    FROM m
    ORDER BY from_tile, to_tile
"""

def q195_es_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k weighted sampling WITHOUT replacement via
    Efraimidis-Spirakis (2006): every document draws a deterministic
    uniform u from its md5 hash and competes on the key ln(u)/w
    (equivalent to u^(1/w) — the classic one-pass reservoir law);
    the k=100 largest keys ARE a weight-proportional
    without-replacement sample. q112 keeps each doc independently
    (expected-count guarantees, variable sample size); this is the
    complementary contract — an exact-size sample, the one a
    fixed-budget annotation batch or eval set needs.

    Exactness: u = (md5_32(doc) + 1) / (2^32 + 1) is an exact double
    built from the portable nibble hash (the q30/q31 oracle
    precedent); ln is the libm precedent; the competition key is the
    IDENTICAL double expression on both engines, so the top-k
    boundary agrees bit for bit; ties (impossible in practice, u
    collision) break on doc_id.

    Scale shape: map-only key computation, then ONE
    TakeOrderedAndProject(k) — no shuffle of the corpus, no window;
    the summary re-aggregates 100 rows.
    """
    from dataingestiontohana_spark.operators.sketches import _md5_int

    d = load_table(spark, sf_dir, "documents")
    u = (
        (_md5_int(F.col("doc_id").cast("string"), 195) + 1).cast("double")
        / F.lit(4294967297.0)
    )
    w = F.col("n_chars").cast("double")
    key = F.log(u) / w
    picked = (
        d.where(F.col("n_chars") > 0)
        .select("doc_id", "source", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(100)
    )
    return (
        picked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sampled_docs"),
            F.sum("n_chars").cast("long").alias("sampled_chars"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("source")
    )


QUERIES["q195_es_weighted_sample"] = q195_es_weighted_sample


def _q195_oracle() -> str:
    from dataingestiontohana_spark.operators.sketches import hex_uint_sql

    h = hex_uint_sql("CAST(doc_id AS VARCHAR)", 195)
    return f"""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln(CAST({h} + 1 AS DOUBLE) / 4294967297.0)
               / CAST(n_chars AS DOUBLE) AS es_key
      FROM documents
      WHERE n_chars > 0),
    picked AS (
      SELECT * FROM keyed
      ORDER BY es_key DESC, doc_id
      LIMIT 100)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS sampled_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM picked
    GROUP BY source
    ORDER BY source
"""


ORACLES["q195_es_weighted_sample"] = _q195_oracle()

def q196_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy count release over the q177 QI groups
    (mktsegment x nation), epsilon = 1, sensitivity 1 — the
    differential-privacy release SHAPE, with the noise drawn from a
    SEEDED md5 uniform via the inverse-CDF transform

        L = -b * sign(u - 1/2) * ln(1 - 2|u - 1/2|),  b = 1/eps

    so the whole mechanism replays deterministically in the DuckDB
    oracle. NOTE (documented contract): deterministic seeding makes
    this a TESTABLE mechanism harness — the algebra, clamping and
    release columns of a DP pipeline — not a privacy guarantee; a
    production release swaps the seeded uniform for a real RNG and
    drops the true_n audit column.

    Exactness: u = (md5_32(group) + 0.5) / 2^32 is an exact double
    (never 0 or 1, so ln never sees 0); ln is the libm precedent;
    the noise quantizes to q6 BEFORE the integer release add, and
    the released count clamps at 0.

    Scale shape: one aggregate to the ~125 QI cells (map-side
    combine), then map-only noise arithmetic.
    """
    from dataingestiontohana_spark.operators.sketches import _md5_int

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    per = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt"))
    cells = (
        per.join(c, per["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(F.sum("cnt").cast("long").alias("true_n"))
    )
    gkey = F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string"))
    u = (_md5_int(gkey, 196).cast("double") + 0.5) / F.lit(4294967296.0)
    centered = u - F.lit(0.5)
    lap = -F.signum(centered) * F.log(
        F.lit(1.0) - F.lit(2.0) * F.abs(centered)
    )
    noise_q6 = F.round(lap * 1e6, 0).cast("long")
    noisy = F.greatest(
        F.lit(0).cast("long"),
        F.col("true_n") + F.round(F.col("noise_q6").cast("double") / 1e6, 0)
        .cast("long"),
    )
    return (
        cells.withColumn("noise_q6", noise_q6)
        .select(
            "c_mktsegment", "c_nationkey", "true_n", "noise_q6",
            noisy.alias("released_n"),
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


QUERIES["q196_dp_noisy_counts"] = q196_dp_noisy_counts


def _q196_oracle() -> str:
    from dataingestiontohana_spark.operators.sketches import hex_uint_sql

    h = hex_uint_sql(
        "(c_mktsegment || ':' || CAST(c_nationkey AS VARCHAR))", 196
    )
    return f"""
    WITH cells AS (
      SELECT c.c_mktsegment, c.c_nationkey,
             CAST(COUNT(*) AS BIGINT) AS true_n
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2),
    noised AS (
      SELECT c_mktsegment, c_nationkey, true_n,
             CAST(ROUND(
               -sign((CAST({h} AS DOUBLE) + 0.5) / 4294967296.0 - 0.5)
               * ln(1.0 - 2.0 * abs((CAST({h} AS DOUBLE) + 0.5)
                                    / 4294967296.0 - 0.5))
               * 1e6, 0) AS BIGINT) AS noise_q6
      FROM cells)
    SELECT c_mktsegment, c_nationkey, true_n, noise_q6,
           greatest(CAST(0 AS BIGINT),
                    true_n + CAST(ROUND(CAST(noise_q6 AS DOUBLE) / 1e6,
                                        0) AS BIGINT)) AS released_n
    FROM noised
    ORDER BY c_mktsegment, c_nationkey
"""


ORACLES["q196_dp_noisy_counts"] = _q196_oracle()

def q199_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean order value per status — the outlier-robust
    estimator that CLAMPS the tails at the exact p5/p95 instead of
    discarding them (q138 trims; winsorizing keeps the row count, the
    convention most financial reporting uses). Thresholds come from
    the exact inverse-ECDF over the value-grouped distribution.

    Exactness: thresholds are the smallest value whose cumulative
    count reaches ceil(q*n) — pure integer arithmetic ((q*n + 99)
    div 100, floor division on non-negatives agrees across engines);
    clamped values are int64 cents; the mean is ONE division ROUND 4.

    Scale shape: orders reduce map-side to (status, cents) value
    groups; the cumulative window runs over that reduced frame
    partitioned by status; thresholds broadcast back onto the
    second (already reduced) pass — the raw table is scanned once.
    """
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    vals = o.groupBy(
        F.col("o_orderstatus").alias("st"), cents.alias("v")
    ).agg(F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = (
        Window.partitionBy("st")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("st")
    g = vals.select(
        "st", "v", "c",
        F.sum("c").over(w_cum).cast("long").alias("cum"),
        F.sum("c").over(w_all).cast("long").alias("n"),
    )
    # `div` is true integer division — exact at ANY n. floor(double/)
    # would match the oracle's `//` only while n*95+99 < 2^53 (~1e16
    # rows per status), a silent cross-engine divergence past that
    # (r6 advisor finding).
    lo_rank = F.expr("(n * 5 + 99) div 100").cast("long")
    hi_rank = F.expr("(n * 95 + 99) div 100").cast("long")
    thr = g.groupBy("st").agg(
        F.min(F.when(F.col("cum") >= lo_rank, F.col("v"))).alias("lo"),
        F.min(F.when(F.col("cum") >= hi_rank, F.col("v"))).alias("hi"),
        F.max("n").alias("n"),
    )
    clamped = (
        vals.join(F.broadcast(thr), "st")
        .select(
            "st", "n", "c",
            F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v")))
            .alias("cv"),
            "lo", "hi",
        )
    )
    return (
        clamped.groupBy("st")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            F.max("lo").cast("long").alias("p05_cents"),
            F.max("hi").cast("long").alias("p95_cents"),
            F.round(
                F.sum(F.col("cv") * F.col("c")).cast("double")
                / F.max("n").cast("double"),
                4,
            ).alias("winsorized_mean_cents"),
        )
        .select(
            F.col("st").alias("o_orderstatus"), "n_orders",
            "p05_cents", "p95_cents", "winsorized_mean_cents",
        )
        .orderBy("o_orderstatus")
    )


QUERIES["q199_winsorized_mean"] = q199_winsorized_mean

ORACLES["q199_winsorized_mean"] = """
    WITH vals AS (
      SELECT o_orderstatus AS st,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM orders GROUP BY 1, 2),
    g AS (
      SELECT st, v, c,
             CAST(SUM(c) OVER (PARTITION BY st ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(SUM(c) OVER (PARTITION BY st) AS BIGINT) AS n
      FROM vals),
    thr AS (
      SELECT st,
             MIN(CASE WHEN cum >= (n * 5 + 99) // 100 THEN v END) AS lo,
             MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN v END) AS hi,
             MAX(n) AS n
      FROM g GROUP BY st),
    clamped AS (
      SELECT vals.st, thr.n, vals.c,
             greatest(thr.lo, least(thr.hi, vals.v)) AS cv,
             thr.lo, thr.hi
      FROM vals JOIN thr ON vals.st = thr.st)
    SELECT st AS o_orderstatus,
           CAST(MAX(n) AS BIGINT) AS n_orders,
           CAST(MAX(lo) AS BIGINT) AS p05_cents,
           CAST(MAX(hi) AS BIGINT) AS p95_cents,
           ROUND(CAST(SUM(cv * c) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 4)
             AS winsorized_mean_cents
    FROM clamped
    GROUP BY st
    ORDER BY o_orderstatus
"""


def q200_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate of the document-length distribution —
    the Zipf/power-law exponent every corpus-census slide quotes:
    over the k=200 largest documents, alpha = k / SUM ln(x_i / x_thr)
    with x_thr the (k+1)-th order statistic. A heavy tail (small
    alpha) warns that batch sizing and packing must plan for
    monster documents; alpha rising across snapshots means the tail
    is being truncated upstream.

    Exactness: the top-(k+1) order statistics are a deterministic
    TakeOrderedAndProject (ties by doc_id); each ln ratio quantizes
    to a q6 INTEGER before the sum (fold-order-immune, libm
    precedent); alpha is one division ROUND 4. Corpora smaller than
    k+1 docs report NULL (not enough tail).

    Scale shape: ONE map-only top-k over the corpus (no shuffle),
    then arithmetic over a 201-row frame.
    """
    from pyspark.sql.window import Window

    k = 200
    d = load_table(spark, sf_dir, "documents")
    top = (
        d.where(F.col("n_chars") > 0)
        .select("doc_id", F.col("n_chars").cast("long").alias("x"))
        .orderBy(F.col("x").desc(), "doc_id")
        .limit(k + 1)
    )
    # 201-row frame below a Limit: the sanctioned reduced-input shape
    w = Window.orderBy(F.col("x").asc(), F.col("doc_id").desc())
    ranked = top.withColumn("rn", F.row_number().over(w))
    thr = ranked.where(F.col("rn") == 1).select(
        F.col("x").alias("x_thr")
    )
    terms = (
        ranked.where(F.col("rn") > 1)
        .join(F.broadcast(thr))
        .select(
            F.round(
                F.log(F.col("x").cast("double") / F.col("x_thr").cast("double"))
                * 1e6,
                0,
            ).cast("long").alias("t_q6")
        )
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.sum("t_q6").cast("long").alias("sum_q6"),
    )
    alpha = F.when(
        (F.col("k_used") < F.lit(k)) | (F.col("sum_q6") <= 0),
        F.lit(None).cast("double"),
    ).otherwise(
        F.round(
            F.col("k_used").cast("double") * 1e6
            / F.col("sum_q6").cast("double"),
            4,
        )
    )
    return agg.select(
        F.coalesce("k_used", F.lit(0)).alias("k_used"),
        F.coalesce("sum_q6", F.lit(0)).alias("sum_q6"),
        alpha.alias("alpha_hill"),
    )


QUERIES["q200_tail_index"] = q200_tail_index

ORACLES["q200_tail_index"] = """
    WITH top AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS x
      FROM documents WHERE n_chars > 0
      ORDER BY x DESC, doc_id
      LIMIT 201),
    ranked AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY x ASC, doc_id DESC) AS rn
      FROM top),
    thr AS (SELECT x AS x_thr FROM ranked WHERE rn = 1),
    terms AS (
      SELECT CAST(ROUND(ln(CAST(r.x AS DOUBLE)
                           / CAST(t.x_thr AS DOUBLE)) * 1e6, 0)
               AS BIGINT) AS t_q6
      FROM ranked r CROSS JOIN thr t
      WHERE r.rn > 1),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
             CAST(COALESCE(SUM(t_q6), 0) AS BIGINT) AS sum_q6
      FROM terms)
    SELECT k_used, sum_q6,
           CASE WHEN k_used < 200 OR sum_q6 <= 0 THEN NULL
                ELSE ROUND(CAST(k_used AS DOUBLE) * 1e6
                         / CAST(sum_q6 AS DOUBLE), 4) END AS alpha_hill
    FROM agg
"""
