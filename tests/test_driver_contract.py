"""The external harness imports __spark_entry__ into its OWN vanilla
SparkSession (no engine confs). The conftest session carries engine
settings, so this test spawns a SUBPROCESS with a bare session and runs
the contract there — the same shape as the driver, catching anything
that silently depends on session bootstrap (e.g. the nanosecond-
timestamp parquet conf, which load_table must set at runtime)."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import duckdb
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
import __spark_entry__ as e
assert e.entry(spark).count() > 0, "entry() returned no rows"
qs, osql = e.queries(), e.oracle_sql()
assert len(qs) <= 50, f"registry exceeds the adjudication window: {len(qs)}"
assert set(osql) <= set(qs)
con = duckdb.connect()
for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"):
    con.execute(
        f"create view {t} as select * from "
        f"read_parquet('/root/testdata/sf0.001/{t}.parquet')")
# one nanos-timestamp query, one mapInPandas query, one variant query:
# the three paths most sensitive to session bootstrap
for name in ("q20_84_timegrain", "q73_embed_neardup", "q76_variant_extract"):
    sp = sorted(tuple(str(x) for x in r)
                for r in qs[name](spark, "/root/testdata/sf0.001").collect())
    dk = sorted(tuple(str(x) for x in r)
                for r in con.execute(osql[name]).fetchall())
    assert sp == dk, f"{name}: plain-session result diverges from oracle"
print("CONTRACT-OK")
"""


def test_entry_contract_in_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CONTRACT-OK" in out.stdout
