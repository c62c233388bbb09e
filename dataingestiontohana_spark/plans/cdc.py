"""Declared CDC/merge queries: lake-side MERGE and SCD2 over the
customer dimension, with deterministic synthesized updates so both the
Spark operator and the SQL oracle compute the identical end state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.operators.merge import merge_upsert, scd2_apply

EFFECTIVE = "2024-06-01 00:00:00"


def _updates(c: DataFrame) -> DataFrame:
    """Deterministic change set: every 10th customer gets +100 balance
    and a MACHINERY segment."""
    return (
        c.where(F.col("c_custkey") % 10 == 0)
        .withColumn("c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2))
        .withColumn("c_mktsegment", F.lit("MACHINERY"))
    )


def q53_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    merged = merge_upsert(c, _updates(c), "c_custkey")
    return merged.select(
        "c_custkey",
        F.round(F.col("c_acctbal"), 2).alias("bal"),
        "c_mktsegment",
    ).orderBy("c_custkey")


def q54_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    dim = (
        c.withColumn("valid_from", F.lit("2020-01-01 00:00:00").cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    out = scd2_apply(dim, _updates(c), "c_custkey", EFFECTIVE)
    return out.select(
        "c_custkey",
        F.round(F.col("c_acctbal"), 2).alias("bal"),
        "valid_from",
        "valid_to",
        "is_current",
    ).orderBy("c_custkey", "valid_from", F.col("is_current"))


def q120_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance (IVM): maintain a per-status
    (count, sum) aggregate of ``orders`` under a CDC delta — updates
    (+1000.00 on every key ≡ 3 mod 7), deletes (key ≡ 5 mod 11, unless
    updated) and inserts (a clone of every key ≡ 2 mod 13 under a new
    key) — WITHOUT re-aggregating the base table against the applied
    state. Each delta row contributes a signed (Δn, Δsum): update →
    (0, new−old), delete → (−1, −old), insert → (+1, new); the
    maintained aggregate is base_agg ⊎ delta_agg re-summed.

    The oracle recomputes the same aggregate from scratch over the
    APPLIED state, so a hash match proves the maintenance law —
    agg(apply(B, D)) == merge(agg(B), contrib(D)) — on real data.

    Exactness: prices quantized to cents (ROUND(x*100, 0) — identical
    half-away-from-zero in Spark and DuckDB on identical doubles);
    every downstream sum is int64; avg is ONE exact-int division
    rounded for display.

    Scale shape: in production ``base_agg`` is a PERSISTED
    materialized aggregate (never rescanned); here it is computed once
    for the self-contained check. The delta path is ONE scan of the
    delta producing per-row signed contributions in codegen, a
    map-side-combined groupBy on ~5 keys, and a union of two
    ~5-row frames — the applied 100 TB state is never touched.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    base = o.select("o_orderstatus", cents.alias("cents"))
    base_agg = base.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    is_upd = F.col("o_orderkey") % 7 == 3
    is_del = (~is_upd) & (F.col("o_orderkey") % 11 == 5)
    is_ins = F.col("o_orderkey") % 13 == 2
    contrib = o.select(
        "o_orderstatus",
        (
            F.when(is_ins, F.lit(1)).otherwise(F.lit(0))
            + F.when(is_del, F.lit(-1)).otherwise(F.lit(0))
        ).cast("long").alias("dn"),
        (
            F.when(is_upd, F.lit(100000)).otherwise(F.lit(0))
            + F.when(is_del, -cents).otherwise(F.lit(0))
            + F.when(is_ins, cents).otherwise(F.lit(0))
        ).cast("long").alias("ds"),
    ).where(is_upd | is_del | is_ins)
    delta_agg = contrib.groupBy("o_orderstatus").agg(
        F.sum("dn").cast("long").alias("n"), F.sum("ds").cast("long").alias("s")
    )
    out = (
        base_agg.unionByName(delta_agg)
        .groupBy("o_orderstatus")
        .agg(F.sum("n").cast("long").alias("n_orders"),
             F.sum("s").cast("long").alias("sum_cents"))
        .where(F.col("n_orders") > 0)
    )
    avg = F.round(
        F.col("sum_cents").cast("double")
        / (F.lit(100) * F.col("n_orders")).cast("double"),
        2,
    )
    return out.select(
        "o_orderstatus", "n_orders", "sum_cents", avg.alias("avg_price")
    ).orderBy("o_orderstatus")


QUERIES = {
    "q53_merge_upsert": q53_merge_upsert,
    "q54_scd2": q54_scd2,
    "q120_incremental_agg": q120_incremental_agg,
}

ORACLES = {
    "q53_merge_upsert": """
        WITH upd AS (
          SELECT c_custkey, ROUND(c_acctbal + 100.0, 2) AS bal,
                 'MACHINERY' AS c_mktsegment
          FROM customer WHERE c_custkey % 10 = 0)
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal, c_mktsegment
        FROM customer WHERE c_custkey % 10 != 0
        UNION ALL SELECT * FROM upd
        ORDER BY c_custkey
    """,
    "q54_scd2": """
        WITH changed AS (SELECT c_custkey FROM customer WHERE c_custkey % 10 = 0)
        SELECT c_custkey, ROUND(c_acctbal, 2) AS bal,
               TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
               CASE WHEN c_custkey % 10 = 0
                    THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to,
               c_custkey % 10 != 0 AS is_current
        FROM customer
        UNION ALL
        SELECT c_custkey, ROUND(c_acctbal + 100.0, 2),
               TIMESTAMP '2024-06-01 00:00:00', NULL, TRUE
        FROM customer WHERE c_custkey % 10 = 0
        ORDER BY c_custkey, valid_from, is_current
    """,
    # the oracle recomputes from the APPLIED state — a hash match
    # proves the incremental maintenance law on real data
    "q120_incremental_agg": """
        WITH base AS (
          SELECT o_orderkey, o_orderstatus,
                 CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
          FROM orders),
        applied AS (
          SELECT o_orderstatus,
                 CASE WHEN o_orderkey % 7 = 3 THEN cents + 100000
                      ELSE cents END AS cents
          FROM base
          WHERE o_orderkey % 7 = 3 OR o_orderkey % 11 <> 5
          UNION ALL
          SELECT o_orderstatus, cents FROM base WHERE o_orderkey % 13 = 2),
        agg AS (
          SELECT o_orderstatus,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(cents) AS BIGINT) AS sum_cents
          FROM applied GROUP BY o_orderstatus)
        SELECT o_orderstatus, n_orders, sum_cents,
               ROUND(CAST(sum_cents AS DOUBLE)
                     / CAST(100 * n_orders AS DOUBLE), 2) AS avg_price
        FROM agg WHERE n_orders > 0 ORDER BY o_orderstatus
    """,
}


def q136_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation: diff two table versions by key +
    row-content hash — added / removed / changed / same counts, the
    audit a lake runs after every replication or backfill to prove two
    copies agree (q120 maintains aggregates from a delta; this
    DERIVES the delta between full snapshots).

    The "new" snapshot is deterministic: every key ≡ 0 mod 10 changes
    (the q53 +100 balance update), every key ≡ 3 mod 13 is removed,
    and every key ≡ 4 mod 17 gains a clone under key+5,000,000.

    Exactness: the row hash is md5 over '|'-joined INT/STRING fields
    only (balance enters as exact int64 cents — no double formatting
    crosses engines); all outputs are int64 counts.

    Scale shape: each side reduces map-side to (key, 32-byte hash) —
    the full-outer join carries 40-byte rows, never customer payloads;
    the classification aggregates to ONE row with map-side combine.
    At 100 TB the join is the irreducible cost of a key-level diff;
    bucketed snapshots (operators/skew.py::write_bucketed) make it
    exchange-free.
    """
    c = load_table(spark, sf_dir, "customer")

    def cents(col):
        return F.round(col * 100, 0).cast("long")

    def row_hash(df):
        return F.md5(
            F.concat_ws(
                "|",
                F.col("c_name"),
                F.col("c_nationkey").cast("string"),
                cents(F.col("c_acctbal")).cast("string"),
                F.col("c_mktsegment"),
            )
        )

    old = c.select(F.col("c_custkey").alias("k"), row_hash(c).alias("h"))
    changed = c.where(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.round(F.col("c_acctbal") + 100.0, 2)
    )
    kept = c.where(
        (F.col("c_custkey") % 10 != 0) & (F.col("c_custkey") % 13 != 3)
    )
    added = c.where(F.col("c_custkey") % 17 == 4).withColumn(
        "c_custkey", F.col("c_custkey") + 5000000
    )
    newh = kept.unionByName(changed).unionByName(added)
    new = newh.select(
        F.col("c_custkey").alias("k"), row_hash(newh).alias("h")
    )
    j = old.withColumnRenamed("h", "h_old").join(
        new.withColumnRenamed("h", "h_new"), "k", "full_outer"
    )
    return j.agg(
        F.sum(F.when(F.col("h_old").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_added"),
        F.sum(F.when(F.col("h_new").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        F.sum(
            F.when(
                F.col("h_old").isNotNull()
                & F.col("h_new").isNotNull()
                & (F.col("h_old") != F.col("h_new")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_changed"),
        F.sum(
            F.when(F.col("h_old") == F.col("h_new"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_same"),
    )


QUERIES["q136_snapshot_diff"] = q136_snapshot_diff

ORACLES["q136_snapshot_diff"] = """
    WITH oldt AS (
      SELECT c_custkey AS k,
             md5(concat_ws('|', c_name, CAST(c_nationkey AS VARCHAR),
                 CAST(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS VARCHAR),
                 c_mktsegment)) AS h
      FROM customer),
    newsrc AS (
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM customer WHERE c_custkey % 10 <> 0 AND c_custkey % 13 <> 3
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey,
             ROUND(c_acctbal + 100.0, 2), c_mktsegment
      FROM customer WHERE c_custkey % 10 = 0
      UNION ALL
      SELECT c_custkey + 5000000, c_name, c_nationkey, c_acctbal,
             c_mktsegment
      FROM customer WHERE c_custkey % 17 = 4),
    newt AS (
      SELECT c_custkey AS k,
             md5(concat_ws('|', c_name, CAST(c_nationkey AS VARCHAR),
                 CAST(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS VARCHAR),
                 c_mktsegment)) AS h
      FROM newsrc),
    j AS (
      SELECT o.h AS h_old, n.h AS h_new
      FROM oldt o FULL OUTER JOIN newt n ON o.k = n.k)
    SELECT
      CAST(SUM(CASE WHEN h_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_added,
      CAST(SUM(CASE WHEN h_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS n_removed,
      CAST(SUM(CASE WHEN h_old IS NOT NULL AND h_new IS NOT NULL
                         AND h_old <> h_new THEN 1 ELSE 0 END) AS BIGINT)
        AS n_changed,
      CAST(SUM(CASE WHEN h_old = h_new THEN 1 ELSE 0 END) AS BIGINT)
        AS n_same
    FROM j
"""


def q142_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship: collapse each customer's order
    observations into one consolidated entity row with per-field
    survivorship rules — the consolidation step of entity resolution
    (q53 MERGE replaces whole rows; q54 SCD2 versions them; this
    derives FIELD-level winners from conflicting observations).

    Rules: most-recent-wins for status (latest order by date, ties by
    orderkey), conditional most-recent for priority (observed only on
    finished 'F' orders — NULL when the entity has none, the classic
    sparse-attribute case), min/max for the seen range, sum/max for
    spend.

    Exactness trick: "value of the most recent observation" is
    computed WITHOUT a window or self-join — each observation encodes
    as 'isoDate|zero-padded-key|value'; the lexicographic MAX of that
    string is the (date, key)-max, and the value splits back out.
    Zero-padding makes string order = numeric order; both engines run
    the identical printf/max/split.

    Scale shape: one scan, one groupBy(custkey) with full map-side
    combine (every rule is an algebraic aggregate — max/min/sum of
    strings and int64 cents). No window, no join, no skew hazard
    beyond the key's own row count. At 100 TB this is the cheapest
    possible consolidation: a single combiner-friendly shuffle.
    """
    o = load_table(spark, sf_dir, "orders")
    d_iso = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    key12 = F.format_string("%012d", F.col("o_orderkey"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    tagged = o.select(
        "o_custkey",
        d_iso.alias("d"),
        F.concat_ws("|", d_iso, key12, F.col("o_orderstatus")).alias(
            "rec_status"
        ),
        F.when(
            F.col("o_orderstatus") == "F",
            F.concat_ws("|", d_iso, key12, F.col("o_orderpriority")),
        ).alias("rec_f_prio"),
        cents.alias("cents"),
    )
    g = tagged.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.min("d").alias("first_seen"),
        F.max("d").alias("last_seen"),
        F.element_at(F.split(F.max("rec_status"), "\\|"), 3).alias(
            "last_status"
        ),
        F.element_at(F.split(F.max("rec_f_prio"), "\\|"), 3).alias(
            "last_f_priority"
        ),
        F.sum("cents").cast("long").alias("total_cents"),
        F.max("cents").cast("long").alias("max_single_cents"),
    )
    return g.orderBy("o_custkey")


QUERIES["q142_golden_record"] = q142_golden_record

ORACLES["q142_golden_record"] = """
    WITH t AS (
      SELECT o_custkey,
             strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
             concat_ws('|', strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'),
                       printf('%012d', o_orderkey), o_orderstatus)
               AS rec_status,
             CASE WHEN o_orderstatus = 'F' THEN
               concat_ws('|', strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d'),
                         printf('%012d', o_orderkey), o_orderpriority)
             END AS rec_f_prio,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
      FROM orders)
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           MIN(d) AS first_seen,
           MAX(d) AS last_seen,
           split_part(MAX(rec_status), '|', 3) AS last_status,
           -- DuckDB split_part(NULL) yields '' not NULL; restore the
           -- no-F-orders NULL (priorities are never empty strings)
           NULLIF(split_part(MAX(rec_f_prio), '|', 3), '')
             AS last_f_priority,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(MAX(cents) AS BIGINT) AS max_single_cents
    FROM t
    GROUP BY o_custkey
    ORDER BY o_custkey
"""


def q164_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN-AGGREGATE materialized view:
    the per-segment revenue view V = customer |><| orders, maintained
    from a base snapshot plus an order delta (every 10th orderkey)
    WITHOUT re-joining the base — the join half of q120's incremental
    aggregation (a warehouse refreshing a 100 TB view applies
    delta-join maintenance: dV = customer |><| dOrders aggregated,
    merged into the stored partials; the base fact table is never
    re-read).

    The adjudication IS the equivalence proof: the Spark side computes
    base partials + delta partials and MERGES them (the incremental
    path), while the oracle computes the view DIRECTLY over the full
    orders table (the from-scratch path). A hash match proves
    maintenance == recompute on every segment.

    Exactness: counts and cents are exact int64/DECIMAL; avg is one
    final division.

    Scale shape: both paths aggregate orders map-side BEFORE touching
    the dimension (aggregate-pushdown below the join); the customer
    dimension broadcasts; the merge is a |segments|-row union-agg.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")

    def partials(orders):
        per_cust = orders.groupBy("o_custkey").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(cents).cast("decimal(38,0)").alias("rev"),
        )
        return (
            per_cust.join(
                F.broadcast(c), per_cust["o_custkey"] == c["c_custkey"]
            )
            .groupBy("c_mktsegment")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("rev").alias("rev"),
            )
        )

    base = partials(o.where(F.col("o_orderkey") % 10 != 0))
    delta = partials(o.where(F.col("o_orderkey") % 10 == 0))
    merged = (
        base.unionByName(delta)
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("rev").alias("rev_dec"),
        )
    )
    return merged.select(
        "c_mktsegment",
        "n_orders",
        F.col("rev_dec").cast("string").alias("rev_cents"),
        F.round(
            F.col("rev_dec").cast("double")
            / (F.col("n_orders") * F.lit(100)).cast("double"),
            4,
        ).alias("avg_order_value"),
    ).orderBy("c_mktsegment")


QUERIES["q164_incremental_join_mv"] = q164_incremental_join_mv

ORACLES["q164_incremental_join_mv"] = """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS HUGEINT))
             AS VARCHAR) AS rev_cents,
           ROUND(CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS HUGEINT))
                   AS DOUBLE)
                 / CAST(COUNT(*) * 100 AS DOUBLE), 4) AS avg_order_value
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
    ORDER BY 1
"""


def q170_point_in_time_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The READ side of SCD2 (q54 builds the history; this queries
    it): reconstruct the customer dimension AS OF two instants — one
    before and one after the change batch's effective time — and
    summarize each snapshot per market segment. The time-travel
    contract: as_of(t) selects rows with valid_from <= t <
    coalesce(valid_to, +inf), which must yield exactly one version
    per key at every t (asserted by the one-row-per-key count — the
    n_customers column doubles as the uniqueness proof, since the
    segment counts sum to |customer| in both snapshots).

    Exactness: snapshot balances in exact cents (int64 sums); avg is
    one division rounded for display; timestamps are literals.

    Scale shape: the history scan prunes on the validity predicate
    (at rest, partitioning history by is_current + a valid_to
    NULL-flag column makes the common "current" read partition-
    pruned); each snapshot is one aggregation; the two snapshots
    union — cost is two reduced scans of the SAME history frame
    (localCheckpointed so the SCD2 build runs once)."""
    c = load_table(spark, sf_dir, "customer")
    dim = (
        c.withColumn(
            "valid_from", F.lit("2020-01-01 00:00:00").cast("timestamp")
        )
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    hist = scd2_apply(dim, _updates(c), "c_custkey", EFFECTIVE)
    hist = hist.localCheckpoint(eager=False)  # consumed by both snapshots

    def as_of(ts: str):
        t = F.lit(ts).cast("timestamp")
        snap = hist.where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        return snap.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.sum(F.round(F.col("c_acctbal") * 100, 0).cast("long"))
            .cast("long")
            .alias("bal_cents"),
        ).select(
            F.lit(ts).alias("as_of"),
            "c_mktsegment",
            "n_customers",
            F.round(
                F.col("bal_cents").cast("double")
                / (F.col("n_customers") * F.lit(100)).cast("double"),
                4,
            ).alias("avg_bal"),
        )

    return (
        as_of("2024-01-01 00:00:00")
        .unionByName(as_of("2024-12-01 00:00:00"))
        .orderBy("as_of", "c_mktsegment")
    )


QUERIES["q170_point_in_time_read"] = q170_point_in_time_read

ORACLES["q170_point_in_time_read"] = """
    WITH hist AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             TIMESTAMP '2020-01-01 00:00:00' AS valid_from,
             CASE WHEN c_custkey % 10 = 0
                  THEN TIMESTAMP '2024-06-01 00:00:00' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey,
             'MACHINERY' AS c_mktsegment,
             c_acctbal + 100.0,
             TIMESTAMP '2024-06-01 00:00:00', NULL
      FROM customer WHERE c_custkey % 10 = 0),
    snaps AS (
      SELECT '2024-01-01 00:00:00' AS as_of, c_mktsegment,
             CAST(COUNT(*) AS BIGINT) AS n_customers,
             CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))
               AS BIGINT) AS bal_cents
      FROM hist
      WHERE valid_from <= TIMESTAMP '2024-01-01 00:00:00'
        AND (valid_to IS NULL
             OR valid_to > TIMESTAMP '2024-01-01 00:00:00')
      GROUP BY 2
      UNION ALL
      SELECT '2024-12-01 00:00:00', c_mktsegment,
             CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
      FROM hist
      WHERE valid_from <= TIMESTAMP '2024-12-01 00:00:00'
        AND (valid_to IS NULL
             OR valid_to > TIMESTAMP '2024-12-01 00:00:00')
      GROUP BY 2)
    SELECT as_of, c_mktsegment, n_customers,
           ROUND(CAST(bal_cents AS DOUBLE)
                 / CAST(n_customers * 100 AS DOUBLE), 4) AS avg_bal
    FROM snaps
    ORDER BY as_of, c_mktsegment
"""
