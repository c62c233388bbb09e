"""Lake-side MERGE: the partition-scoped file-group rewrite — only
touched partition directories change on disk (SCALING.md MERGE
story; the CDC-result merge itself is oracle-checked via q53/q54).
"""

from __future__ import annotations


def test_merge_into_partitioned_rewrites_only_touched_partitions(
    spark, tmp_path
):
    """The file-group-rewrite MERGE: untouched partition directories
    keep their exact files; only the updated partition is rewritten;
    the logical result equals a full-table merge."""
    import os

    from dataingestiontohana_spark.operators.merge import (
        merge_into_partitioned,
        merge_upsert,
    )

    path = str(tmp_path / "dim")
    spark.range(100).selectExpr(
        "id AS k", "id * 10 AS v", "CAST(id % 5 AS INT) AS p"
    ).write.partitionBy("p").parquet(path)

    def files_of(p):
        d = os.path.join(path, f"p={p}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )

    before = {p: files_of(p) for p in range(5)}
    full_before = spark.read.parquet(path)
    updates = spark.createDataFrame(
        [(2, 999, 2), (7, 888, 2), (500, 777, 2)], "k long, v long, p int"
    )
    expect = sorted(
        map(tuple, merge_upsert(full_before, updates, "k")
            .select("k", "v", "p").collect())
    )

    touched = merge_into_partitioned(spark, path, updates, "k", "p")
    assert touched == [2]

    after = {p: files_of(p) for p in range(5)}
    for p in (0, 1, 3, 4):
        assert after[p] == before[p]  # untouched partitions byte-stable
    assert after[2] != before[2]  # the touched one was rewritten

    got = sorted(
        map(tuple, spark.read.parquet(path).select("k", "v", "p").collect())
    )
    assert got == expect and len(got) == 101  # 100 rows + 1 insert


def test_merge_into_partitioned_detects_partition_moves(spark, tmp_path):
    """The partition-immutability precondition: an update that moves a
    key to a different partition is rejected with check_partition_moves
    (silently duplicating the key is the failure mode being guarded)."""
    import pytest

    from dataingestiontohana_spark.operators.merge import (
        merge_into_partitioned,
    )

    path = str(tmp_path / "dim")
    spark.range(20).selectExpr(
        "id AS k", "id AS v", "CAST(id % 2 AS INT) AS p"
    ).write.partitionBy("p").parquet(path)

    # k=4 lives in p=0; the update claims p=1 — a partition move
    moving = spark.createDataFrame([(4, 99, 1)], "k long, v long, p int")
    with pytest.raises(ValueError, match="move keys across partitions"):
        merge_into_partitioned(
            spark, path, moving, "k", "p", check_partition_moves=True
        )
    # a partition-stable update passes the same check
    stable = spark.createDataFrame([(4, 99, 0)], "k long, v long, p int")
    merge_into_partitioned(
        spark, path, stable, "k", "p", check_partition_moves=True
    )
    got = {r["k"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert got[4] == 99 and len(got) == 20


def test_merge_into_partitioned_rejects_null_partition_updates(
    spark, tmp_path
):
    """NULL partition values in the update batch must be refused:
    isin(touched) would exclude the null-partition slice from the
    read-back, yet dynamic overwrite would still replace the
    __HIVE_DEFAULT_PARTITION__ directory with only the update rows,
    deleting its pre-existing rows (round-4 advice)."""
    import pytest

    from dataingestiontohana_spark.operators.merge import (
        merge_into_partitioned,
    )

    path = str(tmp_path / "dim")
    spark.createDataFrame(
        [(1, 10, 0), (2, 20, None), (3, 30, None)], "k long, v long, p int"
    ).write.partitionBy("p").parquet(path)

    nullish = spark.createDataFrame([(2, 99, None)], "k long, v long, p int")
    with pytest.raises(ValueError, match="NULL 'p' partition"):
        merge_into_partitioned(spark, path, nullish, "k", "p")
    # table untouched: the null-partition rows survived
    assert spark.read.parquet(path).count() == 3
