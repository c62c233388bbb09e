"""URL canonicalization (round 9): the crawl-dedup primitive that
collapses the dozens of spellings one web page arrives under — case
in scheme/host, default ports, fragments, tracking parameters, query
order — onto ONE canonical string, so URL-level dedup and
url->document joins key on identity instead of luck.

Engine-portable by construction: every step is a regexp_extract /
regexp_replace / split / filter / array_sort / array_join chain with
a DuckDB twin of identical semantics (`canonicalize_url_sql`), so the
operator is oracle-checkable like every other declared function.

Scale shape: pure codegen'd expressions plus per-URL small-array
higher-order functions — map-only, no Python, no shuffle; the
downstream dedup is an ordinary hash groupBy on the canonical string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters dropped during canonicalization (the standard
# analytics-noise set: Google/Facebook click ids + utm_* campaign tags)
TRACKING_PARAM_SQL = (
    "p = '' OR p LIKE 'utm_%' OR p LIKE 'fbclid=%' OR p LIKE 'gclid=%'"
)


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL:

    - scheme and host lowercase;
    - default port stripped (:80 for http, :443 for https);
    - fragment dropped (client-side only — never reaches the server);
    - utm_* / fbclid / gclid tracking parameters dropped;
    - remaining query parameters sorted bytewise (the order a server
      sees is semantically irrelevant for idempotent GETs);
    - empty path normalized to '/'.

    Idempotent: canonicalize(canonicalize(u)) == canonicalize(u)."""
    u = F.col(col) if isinstance(col, str) else col
    nofrag = F.regexp_replace(u, "#.*", "")
    scheme = F.lower(
        F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1)
    )
    hostport = F.lower(
        F.regexp_extract(nofrag, r"^[^:/?#]+://([^/?#]*)", 1)
    )
    host = (
        F.when(
            (scheme == "http"),
            F.regexp_replace(hostport, ":80$", ""),
        )
        .when(
            (scheme == "https"),
            F.regexp_replace(hostport, ":443$", ""),
        )
        .otherwise(hostport)
    )
    path = F.regexp_extract(nofrag, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    rawq = F.regexp_extract(nofrag, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: ~(
                (p == "")
                | p.startswith("utm_")
                | p.startswith("fbclid=")
                | p.startswith("gclid=")
            ),
        )
    )
    query = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of `canonicalize_url` — identical regexes, the list
    pipeline via string_split/list_filter/list_sort/array_to_string."""
    nofrag = f"regexp_replace({expr}, '#.*', '', 'g')"
    scheme = (
        f"lower(regexp_extract({nofrag},"
        " '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    )
    hostport = f"lower(regexp_extract({nofrag}, '^[^:/?#]+://([^/?#]*)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http'"
        f" THEN regexp_replace({hostport}, ':80$', '')"
        f" WHEN {scheme} = 'https'"
        f" THEN regexp_replace({hostport}, ':443$', '')"
        f" ELSE {hostport} END"
    )
    path = (
        f"CASE WHEN regexp_extract({nofrag},"
        " '^[^:/?#]+://[^/?#]*([^?#]*)', 1) = '' THEN '/'"
        f" ELSE regexp_extract({nofrag},"
        " '^[^:/?#]+://[^/?#]*([^?#]*)', 1) END"
    )
    rawq = f"regexp_extract({nofrag}, '\\?([^#]*)', 1)"
    # coalesce: DuckDB's array_to_string of an EMPTY list is NULL
    # (Spark's array_join is ''), and NULL would poison the concat
    query = (
        "coalesce(array_to_string(list_sort(list_filter("
        f"string_split({rawq}, '&'),"
        f" p -> NOT ({TRACKING_PARAM_SQL}))), '&'), '')"
    )
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END)"
    )
