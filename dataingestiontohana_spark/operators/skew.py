"""Explicit shuffle/skew control: salted joins and bucketed layouts.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
default in `session.py`) handles most skew at runtime; these operators
are for the cases you control statically:

- `salted_join`: a hot key (the classic power-law join killer) is
  sharded across `n_salts` reducers by replicating the small side per
  salt. Shuffle width grows n_salts-fold on the small side only.
- `write_bucketed` / bucketed tables: pre-shuffle both join sides into
  the same bucket layout once at write time; every later equi-join on
  the bucket key runs with NO exchange (verified by plan inspection in
  the tests). At 100 TB this converts the dominant per-query shuffle
  into a one-time layout cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join sharding hot keys across n_salts partitions.

    The big side gets a deterministic per-row salt (hash of the whole
    row, so rows of one hot key spread evenly); the small side is
    replicated once per salt value. Result equals `big.join(small,
    key, how)` for inner/left joins.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, buckets: int = 16
) -> None:
    """Persist hash-bucketed + sorted by the join key. Joins between
    tables bucketed identically on the key skip the exchange (and with
    sortBy, the sort) entirely.

    With the default in-memory catalog a previous process's table
    survives only as a warehouse directory (not a catalog entry), and
    saveAsTable then fails with LOCATION_ALREADY_EXISTS — so clear
    both. With a persistent metastore the DROP TABLE alone suffices.
    """
    import os
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(os.path.join(wh, table_name.lower()), ignore_errors=True)
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def plan_has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange — the
    test hook for asserting co-located joins."""
    return "Exchange" in df._jdf.queryExecution().executedPlan().toString()
