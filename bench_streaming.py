"""Streaming-ingestion throughput bench — the reference's ACTUAL
workload (producer -> consumer -> relational sink, exactly-once), with
NO artificial pacing: the reference's 5 s "Processing Data" sleep
(`README.md:30-43`) exists only to widen its failure window, so the
honest throughput number removes it (SURVEY §6's commitment).

Drives `IngestionPipeline` end-to-end: sensor CSV text files (the
durable log standing in for the Kafka topic) -> csv-envelope parse ->
keyed UPSERT into a SQLite sink (the locally-testable HANA stand-in),
EXACTLY_ONCE mode — checkpointed offsets + idempotent upsert on
`counter`, the `README.md:132-155` recipe.

Reported numbers:
- cold: fresh checkpoint + fresh sink, first run in the session
  (includes stream-init + first-micro-batch codegen).
- warm: second run, new checkpoint/sink, warmed JVM — the steady-state
  number a capacity plan should use.
- audit: rows == uniq == span on `counter` (the exactly-once proof,
  asserted — a bench run that loses or duplicates rows is invalid).

Standalone: prints ONE JSON line. Embedded: `bench.py` calls
`run_streaming_bench(spark)` and folds the dict into its own line.

Env knobs: SPARK_GRAFT_STREAM_ROWS (default 100000),
SPARK_GRAFT_STREAM_FILES (default 20 -> 20 micro-batches at
maxFilesPerTrigger=1).
"""

from __future__ import annotations

import functools
import json
import os
import shutil
import sqlite3
import tempfile
import time

from dataingestiontohana_spark.operators.upsert_sink import (
    SQLiteDialect,
    UpsertSink,
)
from dataingestiontohana_spark.sources.generator import write_sensor_csv_files
from dataingestiontohana_spark.streaming.pipeline import (
    DeliveryMode,
    IngestionPipeline,
)


def _one_run(spark, source_dir: str, work: str, tag: str, n_rows: int) -> dict:
    """One cold-start pipeline run over the full source log. Returns
    rate + audit; raises if delivery was not exactly-once."""
    db = os.path.join(work, f"sink_{tag}.db")
    pipe = IngestionPipeline(
        spark=spark,
        source_dir=source_dir,
        checkpoint_dir=os.path.join(work, f"ck_{tag}"),
        sink=UpsertSink(
            table="sensor_sink",
            key_cols=["counter"],
            dialect=SQLiteDialect(),
            connection_factory=functools.partial(sqlite3.connect, db),
            write_mode="driver",  # single-writer SQLite file
            # one file per trigger bounds each micro-batch to
            # n_rows/n_files rows — the collect fetch is safe
            driver_fetch="collect",
        ),
        mode=DeliveryMode.EXACTLY_ONCE,
    )
    t0 = time.perf_counter()
    err = pipe.run_to_completion()
    elapsed = time.perf_counter() - t0
    if err is not None:
        raise RuntimeError(f"streaming bench run failed: {err}")
    con = sqlite3.connect(db)
    rows, uniq, lo, hi = con.execute(
        'SELECT COUNT(*), COUNT(DISTINCT "counter"), '
        'MIN("counter"), MAX("counter") FROM "sensor_sink"'
    ).fetchone()
    con.close()
    span = hi - lo + 1 if rows else 0
    if not (rows == uniq == span == n_rows):
        raise RuntimeError(
            f"exactly-once audit failed: rows={rows} uniq={uniq} "
            f"span={span} expected={n_rows}"
        )
    return {
        "sec": round(elapsed, 3),
        "rows_per_sec": round(n_rows / elapsed, 1),
        "audit": {"rows": rows, "uniq": uniq, "span": span},
    }


def _graph_run(spark, work: str, n_rows: int, n_files: int) -> dict:
    """End-to-end OPERATOR-GRAPH throughput: the reference's two
    tutorial graphs chained — producer (generator -> multiplexer ->
    {kafkafake producer, wiretap}) then consumer (kafkafake consumer
    -> parse -> keyed upsert), one graph-compiled streaming query
    each (streaming/graph_pipeline.py). Measures the full
    source->topic->typed->sink path the reference demos at 0.2 msg/s
    behind its sleep."""
    from dataingestiontohana_spark.sources.generator import (
        write_sensor_csv_files as _w,
    )
    from dataingestiontohana_spark.streaming.graph_pipeline import (
        PipelineGraph,
        run_graphs_concurrently,
    )
    from dataingestiontohana_spark.streaming.kafka import parse_sensor_kafka

    src = os.path.join(work, "gsource")
    _w(spark, src, n_rows, n_files)
    broker = os.path.join(work, "broker")
    db = os.path.join(work, "sink_graph.db")

    prod = PipelineGraph()
    # rows-per-trigger swept in r8 (verdict item 4): at n_files//10 the
    # producer ran one 500-row batch per trigger and the ~0.3 s fixed
    # per-action cost dominated (983 rows/s warm); n_files//2 keeps a
    # genuine multi-batch pipeline (2 producer triggers + concurrent
    # consumer triggers) while amortizing the fixed cost (~2.2-2.5k
    # rows/s warm, measured). Capacity planning at scale sizes
    # batches, not trigger counts — same lesson as the straight
    # pipeline's 0.30 s/micro-batch note in SKILL.md.
    prod.node("gen", "data_generator", source_dir=src,
              max_files_per_trigger=max(1, n_files // 2))
    prod.node("mux", "multiplexer")
    prod.node("producer", "kafka_producer", path=broker, topic="sensor")
    prod.node("tap", "wiretap")
    prod.node("console", "terminal", limit=5)
    prod.connect("gen", "mux")
    prod.connect("mux", "producer")
    prod.connect("mux", "tap")
    prod.connect("tap", "console")

    cons = PipelineGraph()
    cons.node("consumer", "kafka_consumer", path=broker, topic="sensor")
    cons.node("typed", "process", fn=parse_sensor_kafka)
    cons.node("hana", "hana_client", sink=UpsertSink(
        table="sensor_sink",
        key_cols=["counter"],
        dialect=SQLiteDialect(),
        connection_factory=functools.partial(sqlite3.connect, db),
        write_mode="driver",  # single-writer SQLite file
        # micro-batches here are trigger-bounded (the producer emits
        # n_files//2 files per trigger), so the one-job collect fetch
        # is safe and ~3x cheaper per batch than sequential
        # per-partition fetches (r8 verdict item 3 profiling)
        driver_fetch="collect",
    ))
    cons.connect("consumer", "typed")
    cons.connect("typed", "hana")

    # both graphs run AT ONCE — the reference keeps producer and
    # consumer pipelines running simultaneously, messages flowing
    # live through the topic (README.md:16-65); sequential runs would
    # double-count the fixed stream-init cost
    t0 = time.perf_counter()
    err = run_graphs_concurrently([
        prod.compile(spark, os.path.join(work, "gck_p")),
        cons.compile(spark, os.path.join(work, "gck_c")),
    ])
    elapsed = time.perf_counter() - t0
    if err is not None:
        raise RuntimeError(f"graph bench failed: {err}")
    con = sqlite3.connect(db)
    rows, uniq, lo, hi = con.execute(
        'SELECT COUNT(*), COUNT(DISTINCT "counter"), '
        'MIN("counter"), MAX("counter") FROM "sensor_sink"'
    ).fetchone()
    con.close()
    span = hi - lo + 1 if rows else 0
    if not (rows == uniq == span == n_rows):
        raise RuntimeError(
            f"graph exactly-once audit failed: rows={rows} uniq={uniq} "
            f"span={span} expected={n_rows}"
        )
    return {
        "sec": round(elapsed, 3),
        "rows_per_sec": round(n_rows / elapsed, 1),
        "audit": {"rows": rows, "uniq": uniq, "span": span},
    }


def _median_of(runs: list[dict]) -> dict:
    """Merge N single-run dicts into one median cell: median sec and
    rows/s (picked from the SAME median-sec run so the pair is
    consistent), min/max rows/s spread, every audit asserted already
    by the individual runs. r8 verdict item 1: the adjudicated warm
    throughput must be a median, not one in-sample reading — the
    single-sample r8 artifact misreported graph capacity by 43% under
    a load spike."""
    by_sec = sorted(runs, key=lambda r: r["sec"])
    mid = by_sec[len(by_sec) // 2]
    return {
        "sec": mid["sec"],
        "rows_per_sec": mid["rows_per_sec"],
        "min_rows_per_sec": min(r["rows_per_sec"] for r in runs),
        "max_rows_per_sec": max(r["rows_per_sec"] for r in runs),
        "runs": len(runs),
        "audit": mid["audit"],
    }


def settle_session(spark, pause: float = 2.0) -> None:
    """Drain accumulated session state before a latency-sensitive
    measurement (r10 verdict item 1). When the streaming leg runs
    embedded right after the ~200 s batch suite, the JVM is still
    asynchronously cleaning thousands of dereferenced broadcasts /
    shuffles / cached plans (ContextCleaner drains a weak-reference
    queue on its own thread) and a major GC of the suite's garbage can
    land ON the ~0.3 s micro-batch critical path — the r10 driver
    artifact read 0.71 s/micro-batch on code whose fresh-session and
    post-settle numbers are both ~0.26 s. Clearing the cache, forcing
    the references queue to populate (System.gc), and yielding a
    moment for the cleaner thread approximates the fresh-subprocess
    state the committed baseline measures."""
    import time as _t

    try:
        spark.catalog.clearCache()
    except Exception:  # noqa: BLE001 — settling is best-effort
        pass
    try:
        jvm = spark.sparkContext._jvm
        for _ in range(2):
            jvm.System.gc()
            _t.sleep(pause / 2)
    except Exception:  # noqa: BLE001
        _t.sleep(pause)


def run_streaming_bench(spark, n_rows: int | None = None,
                        n_files: int | None = None,
                        warm_runs: int | None = None) -> dict:
    """Cold + MEDIAN-of-N warm exactly-once ingest runs; returns the
    metrics dict. The warm legs repeat in-process (same session, fresh
    checkpoint/sink/broker each time): for a THROUGHPUT capacity
    number, the warm in-process distribution is the right one — the
    measurand IS the steady warmed state, unlike the batch baseline
    where in-process repetition hides the driver's cold-plan cost.
    The median damps exactly the one-off host load spikes that made
    the single-sample r8 artifact misreport capacity."""
    n_rows = n_rows or int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", 100_000))
    n_files = n_files or int(os.environ.get("SPARK_GRAFT_STREAM_FILES", 20))
    warm_runs = warm_runs or int(
        os.environ.get("SPARK_GRAFT_STREAM_WARM_RUNS", 3)
    )
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        source_dir = os.path.join(work, "source")
        write_sensor_csv_files(spark, source_dir, n_rows, n_files)
        cold = _one_run(spark, source_dir, work, "cold", n_rows)
        warm = _median_of([
            _one_run(spark, source_dir, work, f"warm{i}", n_rows)
            for i in range(warm_runs)
        ])
        # the two-graph (producer topic + consumer sink) path: it
        # writes every record through the kafkafake log twice
        # (produce + fetch). Same cold/warm discipline as the plain
        # pipeline: the first run carries stream-init + Python-worker
        # spin-up for the executor-side producer; the warm median is
        # the capacity-plan figure. Row count = n_rows (r10; r9 used
        # n_rows//2 and r8 n_rows//10). The r10 profiling decomposed
        # the graph leg's warm wall-clock: ~1.2 s is the consumer's
        # Python Data Source runner spawn (a per-QUERY pyspark cost —
        # fresh process + imports + handshake before the first
        # latestOffset; the straight pipeline's JVM file source has
        # no such step), ~1.0 s the producer's two triggers, and the
        # marginal per-row cost is ~20 us (measured 25k -> 11-12k
        # rows/s, 50k -> ~21k, 100k -> ~34k on the same code). At
        # n_rows//2 the number measured spawn amortization, not
        # capacity — capacity planning sizes batches, same lesson as
        # r9, one step further.
        g_rows = max(1000, n_rows)
        g_cold = _graph_run(spark, os.path.join(work, "g1"), g_rows, n_files)
        g_warm = _median_of([
            _graph_run(spark, os.path.join(work, f"g{i + 2}"), g_rows,
                       n_files)
            for i in range(warm_runs)
        ])
        return {
            "mode": "exactly_once",
            "rows": n_rows,
            "micro_batches": n_files,
            "cold": cold,
            "warm": warm,
            # r12: no flat back-compat duplicate of the warm cell —
            # the duplicated ~230 chars pushed the one-line artifact
            # past the driver's 2000-char stdout window (verdict item
            # 8); check_bench reads graph_pipeline.warm first and has
            # handled both shapes since r9
            "graph_pipeline": {
                "rows": g_rows,
                "cold": g_cold,
                "warm": g_warm,
            },
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    from dataingestiontohana_spark.session import get_spark

    spark = get_spark("bench-streaming")
    r = run_streaming_bench(spark)
    print(json.dumps({
        "metric": "streaming_ingest_rows_per_sec",
        "value": r["warm"]["rows_per_sec"],
        "unit": "rows/sec",
        **r,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
