"""The t2 gate, locally: every declared query vs its DuckDB oracle at
sf0.001 (fast); the driver runs the identical contract at sf0.01."""

from __future__ import annotations

import pytest

from dataingestiontohana_spark.oracle import compare, duckdb_connection
from dataingestiontohana_spark.plans import ORACLES, QUERIES

from tests.conftest import SF0001


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF0001)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF0001)
    if name in ORACLES:
        ddf = duck.execute(ORACLES[name]).fetch_arrow_table().to_pandas()
        ok, msg = compare(sdf, ddf)
        assert ok, f"{name}: {msg}"
    else:
        # rows-only contract: must evaluate cleanly with a stable schema
        assert sdf.count() >= 0
        assert sdf.columns


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
