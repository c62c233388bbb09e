"""The consolidated driver-facing registry (plans/bundles.py): full
coverage of the fine-grained surface, schema-drift guards, and the
same DuckDB-oracle sweep the external harness runs — at bundle level.
"""

from __future__ import annotations

import pytest

from dataingestiontohana_spark.oracle import compare, duckdb_connection
from dataingestiontohana_spark.plans import ORACLES, QUERIES
from dataingestiontohana_spark.plans.bundles import (
    BUNDLES,
    FINE_SCHEMAS,
    SINGLES,
    build_registry,
)

from tests.conftest import SF0001

DRIVER_QUERIES, DRIVER_ORACLES = build_registry()


def test_every_fine_query_is_exported_exactly_once():
    exported = list(SINGLES) + [p for parts in BUNDLES.values() for p in parts]
    assert sorted(exported) == sorted(QUERIES), (
        "driver registry must cover the fine-grained surface exactly once"
    )


def test_registry_fits_the_adjudication_window():
    # the external harness records at most ~50 entries; stay under with
    # headroom, and keep the rows-only tail small
    assert len(DRIVER_QUERIES) <= 50
    rows_only = set(DRIVER_QUERIES) - set(DRIVER_ORACLES)
    assert len(rows_only) <= 6, rows_only


def test_oracle_backed_parts_stay_oracle_backed():
    # a bundle may be rows-only ONLY if some part genuinely lacks an oracle
    for name, parts in BUNDLES.items():
        if all(p in ORACLES for p in parts):
            assert name in DRIVER_ORACLES, name


@pytest.mark.parametrize("name", sorted(FINE_SCHEMAS))
def test_recorded_schema_matches_fine_query(spark, name):
    df = QUERIES[name](spark, SF0001)  # schema analysis only, no execution
    got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    assert got == FINE_SCHEMAS[name], f"{name}: schema drifted — update bundles.py"


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF0001)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(BUNDLES))
def test_bundle_matches_oracle(spark, duck, name):
    sdf = DRIVER_QUERIES[name](spark, SF0001)
    if name in DRIVER_ORACLES:
        ddf = duck.execute(DRIVER_ORACLES[name]).fetch_arrow_table().to_pandas()
        ok, msg = compare(sdf, ddf)
        assert ok, f"{name}: {msg}"
    else:
        assert sdf.count() >= 0
        assert sdf.columns
