"""Strict driver-contract gate: the EXACT fetch path the external
harness uses (evidence: round-3 q71 hash-mismatch with identical
logical values).

The lenient sweep (tests/test_oracle_queries.py) fetches the oracle
through Arrow, which preserves python Decimal and date objects — so a
Spark decimal(38,4) and a DuckDB DECIMAL(38,4) compare equal. The
harness instead reads the oracle through pandas ``.df()``, where
DECIMAL becomes float64 (whose text form drops trailing zeros at the
declared scale: 1003322369.8990 -> '1003322369.899') and DATE becomes
datetime64. This suite re-runs every driver-facing registry entry
under that lossy path with str-level cell equality, so a query that
would hash-mismatch at the driver fails HERE first.
"""

from __future__ import annotations

import pytest

from dataingestiontohana_spark.oracle import compare_strict, duckdb_connection
from dataingestiontohana_spark.plans.bundles import build_registry

from tests.conftest import SF0001

DRIVER_QUERIES, DRIVER_ORACLES = build_registry()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF0001)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(DRIVER_ORACLES))
def test_driver_entry_survives_lossy_fetch(spark, duck, name):
    sdf = DRIVER_QUERIES[name](spark, SF0001)
    ok, msg = compare_strict(sdf, duck, DRIVER_ORACLES[name])
    assert ok, f"{name}: {msg}"
