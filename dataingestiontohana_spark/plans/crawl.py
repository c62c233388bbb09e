"""Crawl-corpus governance operators (round 9): registrable-domain
(eTLD+1) extraction against a public-suffix snapshot, and robots.txt
allow/deny filtering with longest-match-wins semantics — the two
primitives between raw WARC ingestion (q216) and per-domain curation
(q213 domain caps key on a domain column; q217 canonical URLs need a
domain identity that "a.b.site.co.uk" and "www.site.co.uk" share).

Both corpora are built IN-ENGINE from `range()` concat formulas (the
q217 discipline) so the DuckDB oracle reconstructs the identical raw
strings and replays the identical decision arithmetic — every suffix
rule, wildcard, anchor and tie-break is value-adjudicated.

Scale shape (the 100 TB story):
- eTLD+1: a host of L labels yields its L candidate suffixes via
  codegen'd split/slice/transform (no Python), then ONE broadcast
  equi-join against the suffix snapshot — O(labels) work per host,
  independent of PSL size. The naive formulation (theta-join host
  LIKE '%.'||suffix against the whole PSL) is O(|PSL|) per row and is
  exactly what this operator exists to avoid; the oracle uses it
  precisely BECAUSE it is an independent formulation of the same
  semantics.
- robots: rules are a per-host dim table — broadcast hash equi-join
  on host with the LIKE match as the join residual, then a partial
  max aggregation on an integer score. No theta join, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import local_rows

# Public-suffix snapshot (publicsuffix.org format, plain rules only):
# enough of the real list to exercise multi-label suffixes ("co.uk"
# must beat "uk"), private-section entries ("github.io" must beat
# "io"), and the PSL default rule (unknown TLD -> last label, here
# ".zz" which is deliberately NOT in the snapshot).
PUBLIC_SUFFIXES: tuple[str, ...] = (
    "com", "org", "net", "io", "test",
    "uk", "co.uk", "org.uk", "github.io",
)

_N_URLS = 120  # 6 host families x 20 URLs


def _host_expr(b: str, i: str) -> str:
    """One host per family `b` (engine-portable CASE over concat):
    plain com, multi-label co.uk with rotating subdomains, private-PSL
    github.io, single-label test, unknown TLD zz (default rule), and a
    deep subdomain chain."""
    return f"""CASE {b}
        WHEN 0 THEN 'www.site' || {b} || '.com'
        WHEN 1 THEN 'a' || ({i} % 4) || '.site' || {b} || '.co.uk'
        WHEN 2 THEN 'site' || {b} || '.github.io'
        WHEN 3 THEN 'cdn.site' || {b} || '.test'
        WHEN 4 THEN 'site' || {b} || '.zz'
        ELSE 'deep.x.site' || {b} || '.com'
    END"""


def q218_registrable_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eTLD+1 extraction (publicsuffix.org algorithm, plain rules):
    for each host, the matching public suffix is the LONGEST snapshot
    entry that is a dot-boundary suffix of the host (no match -> the
    PSL default rule: the last label); the registrable domain is the
    label immediately left of the suffix, or NULL when the host IS a
    bare suffix.

    Plan: hosts -> codegen'd candidate-suffix explode (L candidates
    for an L-label host) -> broadcast EQUI-join on the snapshot ->
    max(length) partial agg -> pure string arithmetic. Never a
    theta-join against the PSL."""
    hosts = (
        spark.range(_N_URLS)
        .select(
            F.expr(f"({_host_expr('(id DIV 20)', 'id')})").alias("host")
        )
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
    )
    psl = local_rows(
        spark, [(s,) for s in PUBLIC_SUFFIXES], "suffix string"
    )
    cand = hosts.select(
        "host",
        F.explode(
            F.expr(
                "transform(sequence(1, size(split(host, '[.]'))),"
                " k -> array_join(slice(split(host, '[.]'),"
                " size(split(host, '[.]')) - k + 1, k), '.'))"
            )
        ).alias("cand"),
    )
    best = (
        cand.join(F.broadcast(psl), F.col("cand") == F.col("suffix"))
        .groupBy("host")
        .agg(F.max(F.length("suffix")).alias("etld_len"))
    )
    etld = F.expr(
        "CASE WHEN etld_len IS NULL"
        " THEN regexp_extract(host, '([^.]*)$', 1)"
        " ELSE substring(host, length(host) - etld_len + 1, etld_len)"
        " END"
    )
    return (
        hosts.join(best, "host", "left")
        .select("host", "n_urls", etld.alias("etld"))
        .select(
            "host",
            "etld",
            F.expr(
                "CASE WHEN length(host) <= length(etld) THEN NULL"
                " ELSE regexp_extract(substring(host, 1,"
                " length(host) - length(etld) - 1), '([^.]*)$', 1)"
                " || '.' || etld END"
            ).alias("reg_domain"),
            "n_urls",
        )
        .orderBy("host")
    )


# robots.txt rule snapshot (RFC 9309 / Google robots spec semantics):
# (host, pattern, is_allow). Patterns are path prefixes where '*'
# matches any run and a trailing '$' anchors the end; the MOST
# SPECIFIC (longest pattern as written) matching rule wins, Allow
# winning length ties; no matching rule means allowed.
ROBOTS_RULES: tuple[tuple[str, str, int], ...] = (
    ("site0.test", "/private", 0),
    ("site0.test", "/private/ok", 1),
    ("site1.test", "/private", 0),
    ("site1.test", "/private/ok", 1),
    ("site1.test", "/*.pdf$", 0),   # anchored wildcard
    ("site2.test", "/private", 0),
    ("site2.test", "/private/ok", 1),
    ("site2.test", "/*.pdf", 0),    # unanchored wildcard
    ("site3.test", "/tmp", 0),
    ("site4.test", "/", 0),         # blanket disallow
    # site5.test: no rules -> default allow
)

# portable robots-pattern -> LIKE translation ('*' -> '%', trailing
# '$' anchors by NOT appending the trailing '%'); identical text runs
# on both engines. Corpus patterns contain no LIKE specials (%, _).
_LIKE_OF_PATTERN = (
    "CASE WHEN pattern LIKE '%$'"
    " THEN replace(substring(pattern, 1, length(pattern) - 1), '*', '%')"
    " ELSE replace(pattern, '*', '%') || '%' END"
)

def _path_expr(div6: str, i: str) -> str:
    """Path variant formula; `div6` is the engine's exact integer
    division of the row id by 6 (Spark `id DIV 6`, DuckDB `i // 6` —
    the winnowing lesson: `/` routes through double)."""
    return (
        f"CASE ({div6}) % 5"
        f" WHEN 0 THEN '/public/p' || {i}"
        f" WHEN 1 THEN '/private/p' || {i}"
        f" WHEN 2 THEN '/private/ok/p' || {i}"
        f" WHEN 3 THEN '/doc' || {i} || '.pdf'"
        f" ELSE '/private/doc' || {i} || '.pdf'"
        f" END"
    )


def q219_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt URL filtering, longest-match-wins: each URL joins
    its host's rules (broadcast equi-join on host, LIKE residual),
    the winner is max(2 * length(pattern) + is_allow) — an integer
    score that encodes the spec's tie-break (same length: the +1
    makes Allow win) and decodes portably (rule_len = score DIV 2,
    allowed = score % 2); no matching rule scores 1 (len 0, allowed).

    The corpus exercises every rule form: plain prefixes, the
    Allow-overrides-Disallow nesting (/private vs /private/ok),
    anchored vs unanchored wildcards ('/*.pdf$' does NOT match
    '/doc7.pdfx' while '/*.pdf' layouts differ per host), a blanket
    Disallow '/', and a rule-less host."""
    urls = spark.range(_N_URLS).select(
        F.expr("'site' || (id % 6) || '.test'").alias("host"),
        F.expr(f"({_path_expr('id DIV 6', 'id')})").alias("path"),
    ).select(
        "host", "path",
        F.expr("'http://' || host || path").alias("url"),
    )
    rules = local_rows(
        spark, list(ROBOTS_RULES), "host string, pattern string, is_allow int"
    ).select("host", "pattern", "is_allow", F.expr(_LIKE_OF_PATTERN).alias("like_pat"))
    scored = (
        urls.join(
            F.broadcast(rules),
            (urls["host"] == rules["host"])
            & F.expr("path LIKE like_pat"),
            "left",
        )
        .groupBy("url")
        .agg(
            F.coalesce(
                F.max(
                    F.expr("2 * length(pattern) + is_allow").cast("bigint")
                ),
                F.lit(1).cast("bigint"),
            ).alias("score")
        )
    )
    return scored.select(
        "url",
        F.expr("score DIV 2").alias("rule_len"),
        (F.col("score") % 2).alias("allowed"),
    ).orderBy("url")


QUERIES = {
    "q218_registrable_domain": q218_registrable_domain,
    "q219_robots_filter": q219_robots_filter,
}


def _q218_oracle() -> str:
    """Independent naive formulation: theta-join the host against the
    whole snapshot on dot-boundary-suffix (host = s OR host LIKE
    '%.'||s) — O(|PSL|) per row, fine for an oracle, the exact shape
    the Spark plan avoids — then the same longest-match + string
    arithmetic."""
    suffixes = ", ".join(f"('{s}')" for s in PUBLIC_SUFFIXES)
    return f"""
        WITH hosts AS (
          SELECT ({_host_expr('(i // 20)', 'i')}) AS host,
                 CAST(COUNT(*) AS BIGINT) AS n_urls
          FROM range({_N_URLS}) r(i)
          GROUP BY 1
        ),
        psl(suffix) AS (VALUES {suffixes}),
        best AS (
          SELECT h.host, MAX(length(p.suffix)) AS etld_len
          FROM hosts h JOIN psl p
            ON h.host = p.suffix OR h.host LIKE '%.' || p.suffix
          GROUP BY h.host
        ),
        e AS (
          SELECT h.host, h.n_urls,
                 CASE WHEN b.etld_len IS NULL
                      THEN regexp_extract(h.host, '([^.]*)$', 1)
                      ELSE substring(h.host,
                           length(h.host) - b.etld_len + 1, b.etld_len)
                 END AS etld
          FROM hosts h LEFT JOIN best b ON h.host = b.host
        )
        SELECT host, etld,
               CASE WHEN length(host) <= length(etld) THEN NULL
                    ELSE regexp_extract(substring(host, 1,
                         length(host) - length(etld) - 1), '([^.]*)$', 1)
                         || '.' || etld END AS reg_domain,
               n_urls
        FROM e
        ORDER BY host
    """


def _q219_oracle() -> str:
    rules = ", ".join(
        f"('{h}', '{p}', {a})" for h, p, a in ROBOTS_RULES
    )
    return f"""
        WITH urls AS (
          SELECT 'site' || (i % 6) || '.test' AS host,
                 ({_path_expr('i // 6', 'i')}) AS path
          FROM range({_N_URLS}) r(i)
        ),
        u AS (
          SELECT host, path, 'http://' || host || path AS url FROM urls
        ),
        rules0(host, pattern, is_allow) AS (VALUES {rules}),
        rules AS (
          SELECT host, pattern, is_allow,
                 {_LIKE_OF_PATTERN} AS like_pat
          FROM rules0
        ),
        scored AS (
          SELECT u.url,
                 COALESCE(MAX(CAST(2 * length(r.pattern) + r.is_allow
                                   AS BIGINT)),
                          CAST(1 AS BIGINT)) AS score
          FROM u LEFT JOIN rules r
            ON u.host = r.host AND u.path LIKE r.like_pat
          GROUP BY u.url
        )
        SELECT url, score // 2 AS rule_len, score % 2 AS allowed
        FROM scored
        ORDER BY url
    """


ORACLES: dict[str, str] = {
    "q218_registrable_domain": _q218_oracle(),
    "q219_robots_filter": _q219_oracle(),
}
