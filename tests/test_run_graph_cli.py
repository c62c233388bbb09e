"""The graph-JSON runner executes the reference's two tutorial graphs
from their shipped example specs: producer (generator -> multiplexer
-> kafkafake producer + wiretap) then consumer (kafkafake consumer ->
parse -> keyed upsert), with the exactly-once audit on the sink."""

from __future__ import annotations

import os
import sqlite3

from tools.run_graph import main

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_producer_then_consumer_from_json(spark, tmp_path):
    work = str(tmp_path / "g")
    rc = main(
        [
            os.path.join(EXAMPLES, "producer_graph.json"),
            "--workdir", work, "--rows", "500", "--files", "5",
        ]
    )
    assert rc == 0
    rc = main(
        [
            os.path.join(EXAMPLES, "consumer_graph.json"),
            "--workdir", work,
            "--bind", "typed.fn=parse_sensor_kafka",
            "--bind", "hana.sink=sqlite_upsert:sensor_sink:counter",
        ]
    )
    assert rc == 0
    con = sqlite3.connect(os.path.join(work, "sink.db"))
    rows, uniq, lo, hi = con.execute(
        'SELECT COUNT(*), COUNT(DISTINCT counter), MIN(counter), '
        "MAX(counter) FROM sensor_sink"
    ).fetchone()
    con.close()
    assert rows == uniq == (hi - lo + 1) == 500


def test_unbound_ref_fails_at_load(spark, tmp_path):
    import pytest

    from dataingestiontohana_spark.streaming.graph_pipeline import (
        GraphValidationError,
    )

    with pytest.raises((GraphValidationError, SystemExit)):
        main(
            [
                os.path.join(EXAMPLES, "consumer_graph.json"),
                "--workdir", str(tmp_path / "g2"),
            ]
        )


def test_sql_process_graph_from_json_needs_only_sink_binding(spark, tmp_path):
    """The SQL-process variant (round 7): the Processing Data stage is
    an inline SQL script in the spec — reference parity with SAP DI's
    graph.json embedding custom operator code as strings — so the run
    binds ONLY the sink."""
    work = str(tmp_path / "g")
    rc = main(
        [
            os.path.join(EXAMPLES, "producer_graph.json"),
            "--workdir", work, "--rows", "300", "--files", "3",
        ]
    )
    assert rc == 0
    rc = main(
        [
            os.path.join(EXAMPLES, "consumer_graph_sql.json"),
            "--workdir", work,
            "--bind", "hana.sink=sqlite_upsert:sensor_sink:counter",
        ]
    )
    assert rc == 0
    con = sqlite3.connect(os.path.join(work, "sink.db"))
    rows, uniq, lo, hi = con.execute(
        'SELECT COUNT(*), COUNT(DISTINCT counter), MIN(counter), '
        "MAX(counter) FROM sensor_sink"
    ).fetchone()
    con.close()
    assert rows == uniq == (hi - lo + 1) == 300
