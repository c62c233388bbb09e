"""Crawl-governance operators (round 9): eTLD+1 registrable-domain
extraction and robots.txt longest-match filtering — planted semantic
cases beyond the oracle hash match (which test_oracle_queries already
enforces for both queries)."""

from __future__ import annotations

from dataingestiontohana_spark.plans.crawl import (
    q218_registrable_domain,
    q219_robots_filter,
)

from tests.conftest import SF0001


def test_registrable_domain_semantics(spark):
    rows = {
        r["host"]: (r["etld"], r["reg_domain"])
        for r in q218_registrable_domain(spark, SF0001).collect()
    }
    # multi-label suffix beats its shorter tail: co.uk, not uk
    assert rows["a0.site1.co.uk"] == ("co.uk", "site1.co.uk")
    # private-section entry beats the bare TLD: github.io, not io
    assert rows["site2.github.io"] == ("github.io", "site2.github.io")
    # plain TLD with a www label
    assert rows["www.site0.com"] == ("com", "site0.com")
    # PSL default rule: unknown TLD -> last label
    assert rows["site4.zz"] == ("zz", "site4.zz")
    # deep subdomain chain collapses to the same registrable shape
    assert rows["deep.x.site5.com"] == ("com", "site5.com")
    # rotating subdomains of one registrable domain stay distinct
    # hosts but share the registrable domain (the q213 cap key)
    regs = {
        r for h, (_, r) in rows.items() if h.endswith(".site1.co.uk")
    }
    assert regs == {"site1.co.uk"}


def test_robots_longest_match_semantics(spark):
    rows = {
        r["url"]: (r["rule_len"], r["allowed"])
        for r in q219_robots_filter(spark, SF0001).collect()
    }
    # Allow /private/ok (len 11) overrides Disallow /private (len 8)
    ok = [u for u in rows if "/private/ok/" in u and "site0" in u]
    assert ok and all(rows[u] == (11, 1) for u in ok)
    # plain /private blocked
    blocked = [
        u for u in rows
        if "/private/p" in u and "site0" in u
    ]
    assert blocked and all(rows[u] == (8, 0) for u in blocked)
    # anchored wildcard: '/*.pdf$' (len 7) blocks site1 pdfs...
    pdf1 = [u for u in rows if "site1" in u and ".test/doc" in u]
    assert pdf1 and all(rows[u] == (7, 0) for u in pdf1)
    # ...but /private/docN.pdf on site1 is decided by the LONGER
    # /private rule (len 8), not the pdf rule
    pp = [u for u in rows if "site1" in u and "/private/doc" in u]
    assert pp and all(rows[u] == (8, 0) for u in pp)
    # blanket Disallow '/': everything on site4 blocked at len 1
    s4 = [u for u in rows if "site4" in u]
    assert s4 and all(rows[u] == (1, 0) for u in s4)
    # rule-less host: default allow, rule_len 0
    s5 = [u for u in rows if "site5" in u]
    assert s5 and all(rows[u] == (0, 1) for u in s5)
    # no-match on a ruled host still defaults to allow
    pub3 = [u for u in rows if "site3" in u and "/public/" in u]
    assert pub3 and all(rows[u] == (0, 1) for u in pub3)


def test_robots_plan_shape(spark):
    """The rules side must broadcast (a per-host dim table): the match
    is a broadcast join, never a shuffle of the URL corpus against a
    theta condition."""
    plan = q219_robots_filter(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_etld_plan_shape(spark):
    """Candidate-suffix explode + broadcast EQUI-join on the snapshot:
    O(labels) per host, independent of PSL size."""
    plan = q218_registrable_domain(spark, SF0001)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
