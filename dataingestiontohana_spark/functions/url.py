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

# RFC 3986 §2.3 unreserved characters by code point: ALPHA / DIGIT /
# '-' (45) '.' (46) '_' (95) '~' (126). A percent-escape of one of
# these is equivalent to the bare character (§6.2.2.2: %7E and ~ are
# the same URI) — real crawls hit %7Euser vs ~user constantly.
_UNRESERVED = (
    "(({c} BETWEEN 48 AND 57) OR ({c} BETWEEN 65 AND 90) OR "
    "({c} BETWEEN 97 AND 122) OR {c} IN (45, 46, 95, 126))"
)

# The escape-tagging sentinel: \x01 is inserted before every '%' so a
# split yields one piece per escape, each needing IDENTICAL treatment
# (no positional lambda — DuckDB's list_transform has no index arg).
# Raw \x01 bytes are stripped from the input first: control characters
# are not legal URL characters (RFC 3986 requires them percent-
# encoded), so stripping is itself a normalization, not data loss.
_SENTINEL = "\x01"


def _pct_normalize(u: Column) -> Column:
    """Percent-encoding normalization per RFC 3986 §6.2.2: decode
    escapes of UNRESERVED characters (%7E -> ~), uppercase the hex of
    every remaining escape (%3a -> %3A). Escapes not followed by two
    hex digits pass through untouched (conservative — a malformed
    escape is data, not structure). Decoding an unreserved character
    can never introduce '#', '?', '&', '=' or '%', so this is safe to
    apply before the structural split."""
    tagged = F.replace(
        F.replace(u, F.lit(_SENTINEL), F.lit("")),
        F.lit("%"),
        F.lit(_SENTINEL + "%"),
    )

    def fix(p: Column) -> Column:
        code = F.conv(p.substr(2, 2), 16, 10).cast("int")
        unres = (
            code.between(48, 57)
            | code.between(65, 90)
            | code.between(97, 122)
            | code.isin(45, 46, 95, 126)
        )
        rest = p.substr(F.lit(4), F.length(p))
        return (
            F.when(
                ~p.rlike("^%[0-9A-Fa-f]{2}"),
                p,  # piece 0 (no escape) or malformed escape
            )
            .when(unres, F.concat(F.char(code), rest))
            .otherwise(F.concat(F.lit("%"), F.upper(p.substr(2, 2)), rest))
        )

    return F.array_join(F.transform(F.split(tagged, _SENTINEL), fix), "")


def _pct_normalize_sql(expr: str) -> str:
    """DuckDB twin of `_pct_normalize` — same sentinel tagging, same
    piece-wise CASE; hex via strpos nibble reconstruction (DuckDB has
    no conv)."""
    tagged = (
        f"replace(replace({expr}, chr(1), ''), '%', chr(1) || '%')"
    )
    code = (
        "(16 * (strpos('0123456789abcdef', lower(substr(p, 2, 1))) - 1)"
        " + strpos('0123456789abcdef', lower(substr(p, 3, 1))) - 1)"
    )
    unres = _UNRESERVED.format(c=code)
    # no coalesce: string_split of a non-NULL string is never an empty
    # list, so array_to_string only returns NULL for NULL input — and
    # NULL must PROPAGATE to match the Spark twin (a coalesce here
    # would canonicalize NULL urls to a non-NULL string on the oracle
    # side only; r10 review)
    return (
        "array_to_string(list_transform("
        f"string_split({tagged}, chr(1)), "
        "p -> CASE WHEN NOT regexp_matches(p, '^%[0-9A-Fa-f]{2}') "
        "THEN p "
        f"WHEN {unres} THEN chr(CAST({code} AS INTEGER)) || substr(p, 4) "
        "ELSE '%' || upper(substr(p, 2, 2)) || substr(p, 4) END"
        "), '')"
    )


def canonicalize_url(col: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL:

    - scheme and host lowercase;
    - default port stripped (:80 for http, :443 for https);
    - fragment dropped (client-side only — never reaches the server;
      dotall so an embedded newline cannot hide fragment bytes);
    - percent-encoding normalized per RFC 3986 §6.2.2 (unreserved
      escapes decoded, remaining escape hex uppercased);
    - utm_* / fbclid / gclid tracking parameters dropped;
    - remaining query parameters sorted bytewise (the order a server
      sees is semantically irrelevant for idempotent GETs);
    - empty path normalized to '/'.

    Idempotent: canonicalize(canonicalize(u)) == canonicalize(u)."""
    u = F.col(col) if isinstance(col, str) else col
    nofrag = _pct_normalize(F.regexp_replace(u, "(?s)#.*", ""))
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
    nofrag = _pct_normalize_sql(
        f"regexp_replace({expr}, '(?s)#.*', '', 'g')"
    )
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
