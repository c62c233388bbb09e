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

    # the real committed artifacts: 0 violations (the judge's verdict)
    assert run_artifact_gate("BENCH_r07.json", "CORRECTNESS_r07.json") == 0

    # planted correctness failure
    bad_c = tmp_path / "CORRECTNESS_bad.json"
    doc = json.load(open("CORRECTNESS_r07.json"))
    k = sorted(doc)[0]
    doc[k]["hash_match"] = False
    bad_c.write_text(json.dumps(doc))
    assert run_artifact_gate("BENCH_r07.json", str(bad_c)) == 1

    # planted bench regression (one entry 10x its baseline)
    base = json.load(open("BENCH_BASELINE.json"))
    name, cell = next(iter(base["entries"].items()))
    queries = {n: e["sec"] for n, e in base["entries"].items()}
    queries[name] = cell["sec"] * 10 + 100
    bad_b = tmp_path / "BENCH_bad.json"
    bad_b.write_text(json.dumps({"queries": queries}))
    assert run_artifact_gate(str(bad_b), "CORRECTNESS_r07.json") == 1

    # missing artifacts are skips, not violations (fresh clone)
    monkeypatch.chdir(tmp_path)
    assert run_artifact_gate(None, None) == 0
