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
