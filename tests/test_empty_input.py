"""Every declared fine query must EVALUATE on a dataset of empty
tables (correct schemas, zero rows) — the first-hour-of-deployment
failure mode. Graceful degradation means empty/NULL output; crashes
(probe head() -> None subscripts, 0/0 under ANSI, numpy stacks of
nothing, fixed-point kernels dividing by zero node counts) are bugs.
tools/empty_input_sweep.py is the standalone CLI twin of this test.
"""

from __future__ import annotations

import pytest

from dataingestiontohana_spark.plans import QUERIES

from tools.empty_input_sweep import make_empty_dataset


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    make_empty_dataset("/root/testdata/sf0.001", str(d))
    return str(d)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_evaluates_on_empty_tables(spark, empty_sf_dir, name):
    out = QUERIES[name](spark, empty_sf_dir)
    out.collect()  # must not raise; empty or summary-row output both fine
    assert out.columns  # schema survives the degenerate input
