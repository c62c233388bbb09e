"""The streaming-ingestion bench harness: runs end-to-end at tiny
scale, audits exactly-once delivery, and reports sane rates — so the
committed BASELINE.md numbers stay re-runnable."""

from __future__ import annotations

from bench_streaming import run_streaming_bench


def test_streaming_bench_runs_and_audits(spark):
    r = run_streaming_bench(spark, n_rows=2_000, n_files=4)
    assert r["mode"] == "exactly_once"
    assert r["rows"] == 2_000 and r["micro_batches"] == 4
    for leg in ("cold", "warm"):
        audit = r[leg]["audit"]
        assert audit["rows"] == audit["uniq"] == audit["span"] == 2_000
        assert r[leg]["rows_per_sec"] > 0
    g = r["graph_pipeline"]
    for leg in ("cold", "warm"):
        audit = g[leg]["audit"]
        assert audit["rows"] == audit["uniq"] == audit["span"] == g["rows"]
        assert g[leg]["rows_per_sec"] > 0
    # r12: no flat duplicate of the warm cell — the duplication pushed
    # the one-line artifact past the driver's 2000-char stdout window
    assert "rows_per_sec" not in g
    # r9: warm legs are MEDIAN-of-N cells with the spread recorded
    for warm in (r["warm"], g["warm"]):
        assert warm["runs"] >= 2
        assert (
            warm["min_rows_per_sec"]
            <= warm["rows_per_sec"]
            <= warm["max_rows_per_sec"]
        )
