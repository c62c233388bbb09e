"""The quality-report CLI renders its sections from the registered
query surface without dying, and the report is honest: a section name
it prints must be a real plans.QUERIES entry."""

from __future__ import annotations

from dataingestiontohana_spark.plans import QUERIES

from tools.quality_report import SECTIONS, main

SF0001 = "/root/testdata/sf0.001"


def test_every_section_is_a_registered_query():
    for _, name, _ in SECTIONS:
        assert name in QUERIES


def test_report_runs_and_prints_sections(spark, capsys):
    rc = main(
        [SF0001, "--sections", "q178_annotator_kappa,q161_table_fingerprint"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "Annotator agreement" in out
    assert "Table fingerprints" in out
    assert "kappa" in out


def test_artifact_gate_reproduces_judge_pass(tmp_path, monkeypatch):
    """--gate's artifact half (r7 verdict item 8): the committed
    round-7 artifacts must pass exactly as the judge adjudicated them,
    and planted violations in either artifact must flag."""
    import json

    from tools.quality_report import run_artifact_gate

    # the r7 artifacts predate the r9 streaming floors and graph
    # sizing, so they adjudicate against an r7-era baseline: the
    # committed entries WITHOUT the streaming commitment (each round's
    # artifact is judged against the baseline committed at that time)
    base = json.load(open("BENCH_BASELINE.json"))
    era = {k: v for k, v in base.items() if k != "streaming"}
    era_base = tmp_path / "BASE_r7era.json"
    era_base.write_text(json.dumps(era))

    # the real committed artifacts: 0 violations (the judge's verdict)
    assert run_artifact_gate(
        "BENCH_r07.json", "CORRECTNESS_r07.json", baseline=str(era_base)
    ) == 0

    # planted correctness failure
    bad_c = tmp_path / "CORRECTNESS_bad.json"
    doc = json.load(open("CORRECTNESS_r07.json"))
    k = sorted(doc)[0]
    doc[k]["hash_match"] = False
    bad_c.write_text(json.dumps(doc))
    assert run_artifact_gate(
        "BENCH_r07.json", str(bad_c), baseline=str(era_base)
    ) == 1

    # planted bench regression (one entry 10x its committed max)
    name, cell = next(iter(base["entries"].items()))
    queries = {n: e["sec"] for n, e in base["entries"].items()}
    queries[name] = max(cell["sec"], cell.get("max", 0)) * 10 + 100
    bad_b = tmp_path / "BENCH_bad.json"
    bad_b.write_text(json.dumps({"queries": queries}))
    assert run_artifact_gate(
        str(bad_b), "CORRECTNESS_r07.json", baseline=str(era_base)
    ) == 1

    # the CURRENT baseline commits streaming floors: an artifact with
    # healthy batch cells but no streaming object now fails...
    no_stream = tmp_path / "BENCH_nostream.json"
    no_stream.write_text(json.dumps(
        {"queries": {n: e["sec"] for n, e in base["entries"].items()}}
    ))
    assert run_artifact_gate(str(no_stream), "CORRECTNESS_r07.json") == 1
    # ...and one meeting the floors with green audits passes
    ok_stream = tmp_path / "BENCH_stream_ok.json"
    audit = {"rows": 10, "uniq": 10, "span": 10}
    ok_stream.write_text(json.dumps({
        "queries": {n: e["sec"] for n, e in base["entries"].items()},
        "streaming": {
            "warm": {"sec": 1.0, "rows_per_sec":
                     base["streaming"]["warm_rows_per_sec"],
                     "audit": dict(audit)},
            "graph_pipeline": {"warm": {
                "sec": 1.0, "rows_per_sec":
                base["streaming"]["graph_rows_per_sec"],
                "audit": dict(audit)}},
        },
    }))
    assert run_artifact_gate(str(ok_stream), "CORRECTNESS_r07.json") == 0

    # missing artifacts are skips, not violations (fresh clone)
    monkeypatch.chdir(tmp_path)
    assert run_artifact_gate(None, None) == 0


def test_plan_lint_gate_branches(spark, capsys):
    """r8 verdict item 7: the plan-lint gate over a registry — clean
    registry passes; a planted scale-killer plan (cartesian product)
    flags with the offending query named."""
    from pyspark.sql import functions as F

    from tools.quality_report import run_plan_lint_gate

    clean = {"good": lambda s, d: s.range(10).where(F.col("id") > 2)}
    assert run_plan_lint_gate(spark, SF0001, clean) == 0
    assert "GATE ok   plan-lint" in capsys.readouterr().out

    bad = dict(clean)
    bad["cartesian"] = lambda s, d: s.range(50).crossJoin(
        s.range(50).withColumnRenamed("id", "id2")
    )
    assert run_plan_lint_gate(spark, SF0001, bad) == 1
    out = capsys.readouterr().out
    assert "GATE FAIL plan-lint" in out and "cartesian" in out

    # a query whose plan cannot even build counts as a violation
    def broken(s, d):
        raise RuntimeError("boom")

    assert run_plan_lint_gate(spark, SF0001, {"broken": broken}) == 1
    assert "plan build failed" in capsys.readouterr().out


def test_empty_input_gate_branches(spark, capsys):
    """The empty-input gate: a guard-complete query evaluates on
    zero-row tables; an unguarded max()[0] crash flags."""
    from dataingestiontohana_spark.catalog import load_table
    from tools.quality_report import run_empty_input_gate

    ok = {
        "counts": lambda s, d: load_table(s, d, "orders").groupBy(
            "o_orderstatus"
        ).count()
    }
    assert run_empty_input_gate(spark, SF0001, ok) == 0
    assert "GATE ok   empty-input" in capsys.readouterr().out

    def crashes_on_empty(s, d):
        top = load_table(s, d, "orders").orderBy("o_orderkey").take(1)[0]
        return s.createDataFrame([(top["o_orderkey"],)], "k long")

    assert run_empty_input_gate(
        spark, SF0001, {"picky": crashes_on_empty}
    ) == 1
    out = capsys.readouterr().out
    assert "GATE FAIL empty-input" in out and "picky" in out
