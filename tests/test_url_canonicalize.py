"""URL canonicalization (round 9): rule-by-rule semantics, engine
parity with the DuckDB twin, and idempotence — plus the corner cases
crawls actually produce."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from dataingestiontohana_spark.functions.url import (
    canonicalize_url,
    canonicalize_url_sql,
)

CASES = [
    # (raw, canonical)
    ("http://A.Test/x", "http://a.test/x"),
    ("HTTP://a.test:80/x", "http://a.test/x"),
    ("https://a.test:443/x", "https://a.test/x"),
    ("http://a.test:8080/x", "http://a.test:8080/x"),  # non-default kept
    ("https://a.test:80/x", "https://a.test:80/x"),    # :80 NOT https default
    ("http://a.test", "http://a.test/"),
    ("http://a.test/x#frag", "http://a.test/x"),
    ("http://a.test/x?b=2&a=1", "http://a.test/x?a=1&b=2"),
    ("http://a.test/x?utm_source=s&utm_medium=m", "http://a.test/x"),
    ("http://a.test/x?fbclid=f&gclid=g&k=v", "http://a.test/x?k=v"),
    ("http://a.test/x?", "http://a.test/x"),
    ("http://a.test/p/q/r?z=1&y=2&utm_x=3#f", "http://a.test/p/q/r?y=2&z=1"),
    # path case is PRESERVED (paths are case-sensitive, hosts are not)
    ("http://A.test/CaseSensitive", "http://a.test/CaseSensitive"),
    # r10: percent-encoding normalization (RFC 3986 §6.2.2)
    ("http://a.test/%7euser", "http://a.test/~user"),   # decode unreserved
    ("http://a.test/%7Euser", "http://a.test/~user"),   # both hex cases
    ("http://a.test/%41%62%30", "http://a.test/Ab0"),   # alnum escapes
    ("http://a.test/a%2fb", "http://a.test/a%2Fb"),     # reserved: upper hex
    ("http://a.test/a%3ab?x=%3d1", "http://a.test/a%3Ab?x=%3D1"),
    ("http://a.test/%2E%2D%5F", "http://a.test/.-_"),   # . - _ decode
    ("http://a.test/100%", "http://a.test/100%"),       # bare % kept
    ("http://a.test/%zz", "http://a.test/%zz"),         # malformed kept
    ("http://a.test/%25x", "http://a.test/%25x"),       # %25 ('%') stays
    # %-escapes in QUERY params normalize before the bytewise sort
    ("http://a.test/x?b=%7e&a=%2F", "http://a.test/x?a=%2F&b=~"),
    # r10: a fragment containing a newline is still a fragment
    ("http://a.test/x#fr\nag", "http://a.test/x"),
]


def test_rules_and_engine_parity(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    got = {
        r["u"]: r["c"]
        for r in df.select("u", canonicalize_url("u").alias("c")).collect()
    }
    con = duckdb.connect()
    for raw, want in CASES:
        assert got[raw] == want, (raw, got[raw], want)
        duck = con.execute(
            "SELECT " + canonicalize_url_sql(f"'{raw}'")
        ).fetchone()[0]
        assert duck == want, (raw, duck, want)


def test_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "u string")
    two = df.select(
        canonicalize_url(canonicalize_url("u")).alias("cc"),
        canonicalize_url("u").alias("c"),
    )
    assert all(r["cc"] == r["c"] for r in two.collect())


def test_q217_plan_is_map_then_single_agg(spark):
    """The dedup shape at scale: canonicalize is pure projection, the
    dedup is one hash aggregate on the canonical string — no window,
    no join, no python."""
    from dataingestiontohana_spark.plans.ingestion import q217_url_dedup

    df = q217_url_dedup(spark, "unused")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan and "Window" not in plan
    rows = df.collect()
    assert len(rows) == 20
    assert all(r["n_variants"] == 4 and r["n_raw"] == 4 for r in rows)
    # the canonical form survived pct-normalization: decoded unreserved
    # (%70 -> p), uppercased reserved escape (%2f -> %2F)
    assert all("%2F" in r["canonical_url"] for r in rows)
    assert all("%70" not in r["canonical_url"] for r in rows)


def test_null_url_propagates_null_on_both_engines(spark):
    """r10 review: the DuckDB twin's old coalesce turned a NULL url
    into a non-NULL ':///'-style string while Spark propagated NULL.
    Both engines must agree: NULL in, NULL out."""
    row = spark.createDataFrame([(None,)], "u string").select(
        canonicalize_url("u").alias("c")
    ).collect()[0]
    assert row["c"] is None
    con = duckdb.connect()
    assert con.execute(
        "SELECT " + canonicalize_url_sql("NULL")
    ).fetchone()[0] is None


def test_fuzz_engine_parity_and_idempotence(spark):
    """150 randomized URL-ish strings (mixed-case schemes/hosts, odd
    ports, %-sequences valid and malformed, tracking params, repeated
    separators, fragments with junk): Spark and the DuckDB twin must
    canonicalize every one IDENTICALLY, and the result must be a fixed
    point — the lockstep property the oracle gate rests on, fuzzed
    past the curated CASES list."""
    import random

    rng = random.Random(3986)
    schemes = ["http", "HTTP", "https", "hTtPs"]
    hosts = ["A.Test", "x.example", "WWW.Site.ORG:80", "h.io:443",
             "h.io:8080", "a.b.c.test"]
    paths = ["", "/", "/p", "/P/q", "/%7euser", "/%2Fa", "/a%3ab",
             "/100%", "/%zz", "/%25x", "/a//b", "/a.b-c_d~e"]
    params = ["", "a=1", "b=%7E", "utm_source=x", "fbclid=q",
              "z=9&a=1", "k=%2f", "gclid=g&m=2", "a=", "=v"]
    frags = ["", "#f", "#", "#a?b=1", "#%41"]
    urls = []
    for _ in range(150):
        u = (rng.choice(schemes) + "://" + rng.choice(hosts)
             + rng.choice(paths))
        q = "&".join(rng.sample(params, rng.randint(0, 3)))
        if q:
            u += "?" + q
        u += rng.choice(frags)
        urls.append(u)
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = {r["u"]: (r["c"], r["cc"]) for r in df.select(
        "u",
        canonicalize_url("u").alias("c"),
        canonicalize_url(canonicalize_url("u")).alias("cc"),
    ).collect()}
    con = duckdb.connect()
    for u in urls:
        c, cc = got[u]
        assert cc == c, (u, c, cc)  # idempotent
        lit = "'" + u.replace("'", "''") + "'"
        duck = con.execute(
            "SELECT " + canonicalize_url_sql(lit)
        ).fetchone()[0]
        assert duck == c, (u, c, duck)  # engine lockstep
