"""Run an operator-graph JSON spec end to end — the CLI twin of the
reference's visual-editor workflow (build a graph of operators, hit
run): load `graph.json`, resolve its `$ref` bindings from the command
line, compile through streaming/graph_pipeline.py, and stream it to
completion.

Usage:
    PYTHONPATH=/root/repo python tools/run_graph.py examples/producer_graph.json \
        --workdir /tmp/g --rows 2000 --files 10
    PYTHONPATH=/root/repo python tools/run_graph.py examples/consumer_graph.json \
        --workdir /tmp/g \
        --bind typed.fn=parse_sensor_kafka \
        --bind "hana.sink=sqlite_upsert:sensor_sink:counter"

Spec conventions this runner adds on top of graph_from_dict:
- any string config value containing `$WORK` is rewritten to the
  --workdir path (so specs stay machine-portable);
- `--rows N` synthesizes N sensor-CSV rows into $WORK/source before
  the run (the data_generator's feed);
- `--bind ref=value` resolves `{"$ref": ...}` config slots; values
  come from a small named registry:
    identity                      the no-op process fn
    parse_sensor_kafka            kafka envelope -> typed sensor rows
    sqlite_upsert:<table>:<key>   idempotent HANA-style upsert sink
                                  into $WORK/sink.db
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sqlite3
import sys


def _resolve_binding(value: str, work: str):
    from dataingestiontohana_spark.operators.upsert_sink import (
        SQLiteDialect,
        UpsertSink,
    )
    from dataingestiontohana_spark.streaming.kafka import parse_sensor_kafka

    if value == "identity":
        return lambda df: df
    if value == "parse_sensor_kafka":
        return parse_sensor_kafka
    if value.startswith("sqlite_upsert:"):
        _, table, key = value.split(":", 2)
        db = os.path.join(work, "sink.db")
        return UpsertSink(
            table=table,
            key_cols=key.split(","),
            dialect=SQLiteDialect(),
            connection_factory=functools.partial(sqlite3.connect, db),
        write_mode="driver",  # single-writer SQLite file
        )
    raise SystemExit(f"unknown binding value {value!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("spec", help="graph.json path")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--rows", type=int, default=0,
                    help="synthesize this many sensor rows into $WORK/source")
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--bind", action="append", default=[],
                    metavar="REF=VALUE")
    args = ap.parse_args(argv)

    from dataingestiontohana_spark.session import get_spark
    from dataingestiontohana_spark.streaming.graph_pipeline import (
        graph_from_dict,
    )

    os.makedirs(args.workdir, exist_ok=True)
    with open(args.spec) as f:
        spec = json.load(f)
    for nd in spec.get("nodes", []):
        cfg = nd.get("config") or {}
        for k, v in cfg.items():
            if isinstance(v, str) and "$WORK" in v:
                cfg[k] = v.replace("$WORK", args.workdir)

    refs = {}
    for b in args.bind:
        ref, _, value = b.partition("=")
        refs[ref] = _resolve_binding(value, args.workdir)

    spark = get_spark("run-graph")
    if args.rows:
        from dataingestiontohana_spark.sources.generator import (
            write_sensor_csv_files,
        )

        write_sensor_csv_files(
            spark, os.path.join(args.workdir, "source"),
            args.rows, args.files,
        )

    graph = graph_from_dict(spec, refs=refs)
    graph.validate()
    name = os.path.splitext(os.path.basename(args.spec))[0]
    ck = os.path.join(args.workdir, f"ck_{name}")
    err = graph.compile(spark, ck).run_to_completion()
    if err is not None:
        print(f"graph {name} FAILED: {err}")
        return 1
    print(f"graph {name} completed")
    db = os.path.join(args.workdir, "sink.db")
    if os.path.exists(db):
        con = sqlite3.connect(db)
        for (table,) in con.execute(
            "SELECT name FROM sqlite_master WHERE type='table'"
        ):
            n = con.execute(f'SELECT COUNT(*) FROM "{table}"').fetchone()[0]
            print(f"  sink table {table}: {n} rows")
        con.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
