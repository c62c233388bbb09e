"""Declared batch-form ingestion queries: the reference's generator ->
CSV envelope -> typed-rows path as oracle-checkable batch operators
(the streaming/delivery forms live in streaming/ and are verified by
the invariant tests — SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import local_rows, locked_frame_builder

from dataingestiontohana_spark.sources.csv_envelope import parse_sensor_csv
from dataingestiontohana_spark.sources.generator import (
    sensor_csv_lines,
    sensor_rows,
)

N = 1_000


def q39_sensor_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sensor generator (reference operator R1): same
    rows on every run and any partitioning. Every value is md5-derived
    (sources/generator.py::_hash60), so since round 4 the full 11-column
    output is recomputed verbatim by the DuckDB oracle."""
    return sensor_rows(spark, N).orderBy("counter")


def q40_sensor_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """generate -> CSV-encode -> from_csv parse -> audit. The single
    output row must be (total=N, matched=N, uniq=N, span=N): the CSV
    envelope is lossless and the counter stream is continuous."""
    original = sensor_rows(spark, N)
    parsed = parse_sensor_csv(sensor_csv_lines(spark, N).select("value"))
    joined = original.alias("a").join(
        parsed.alias("b"), F.col("a.counter") == F.col("b.counter")
    )
    all_equal = F.when(
        F.expr(
            " AND ".join(
                f"a.{c} <=> b.{c}"
                for c in original.columns
            )
        ),
        1,
    ).otherwise(0)
    return joined.agg(
        F.count("*").alias("total"),
        F.sum(all_equal).alias("matched"),
        F.countDistinct("a.counter").alias("uniq"),
        (F.max("a.counter") - F.min("a.counter") + 1).alias("span"),
    )


# -- WARC crawl-archive ingestion (round 9) ---------------------------

_WARC_CACHE: dict[str, DataFrame] = {}
_WARC_FILES, _WARC_DOCS = 6, (2, 3)  # response records with content

# r11: planted NON-UTF-8 records (several percent of a real crawl is
# latin-1/windows-1252/gbk/shift_jis; decoding them as UTF-8 poisons
# downstream dedup/quality stats with U+FFFD). One row per (file,
# record): HTTP Content-Type header value, the python codec the BODY
# is actually encoded with, an optional in-document <meta> element,
# and the unicode paragraph text. Together the six exercise every
# rung of the WHATWG sniff ladder `sources/warc.py::resolve_charset`
# implements: header charset (incl. the ISO-8859-1 -> windows-1252
# alias on euro-sign bytes only cp1252 maps), <meta charset> and
# <meta http-equiv> sniffs with no transport hint, a UTF-8 BOM
# overriding a WRONG header, and the bare UTF-8 default.
_WARC_CHARSET_DOCS: list[tuple[int, int, str, str, str, str]] = [
    (6, 1, "text/html; charset=windows-1252", "cp1252", "",
     "café résumé €9"),
    (6, 2, 'text/html; charset="ISO-8859-1"', "cp1252", "",
     "déjà vu €5"),
    (7, 1, "text/html", "shift_jis", "<meta charset=Shift_JIS>",
     "日本語のテキスト"),
    (7, 2, "text/html", "gbk",
     '<meta http-equiv="Content-Type" '
     'content="text/html; charset=gbk">',
     "中文网页内容"),
    (8, 1, "text/html; charset=iso-8859-1", "utf-8-sig", "",
     "naïve fiancée"),
    (8, 2, "text/html", "utf-8", "", "über straße"),
    # r12 (verdict item 3): DECLARATION-LESS plants — no BOM, no
    # header charset, no <meta>; the WHATWG ladder bottoms out and
    # only the content sniffer (`sources/warc.py::sniff_charset`)
    # can decode these mojibake-free. One per legacy family, spread
    # across the three compression layouts.
    (6, 3, "text/html", "cp1252", "", "smörgåsbord à la café €7"),
    (7, 3, "text/html", "shift_jis", "", "宣言のない日本語ページ"),
    (8, 3, "text/html", "gbk", "", "没有声明的中文页面"),
    # r12 second pass: the remaining major crawl families, still
    # declaration-less — euc_jp (kana-gated vs GB2312), big5
    # (low-trail statistic vs GBK), cp1251 (lowercase-dominance +
    # word-run gates vs mojibake and vs Latin-accent pages)
    (6, 4, "text/html", "cp1251", "", "русская страница без кодировки"),
    (7, 4, "text/html", "euc_jp", "", "ひらがなの日本語ページ"),
    (8, 4, "text/html", "big5", "", "繁體中文網頁測試內容"),
    # r12 third pass: koi8_r (case-inversion vs cp1251 adjudicated by
    # the lowercase gate; box-symbol gate vs CJK mojibake) and euc_kr
    # (Hangul-dominance + spaced-run gates vs the GB level-1 overlap)
    (6, 5, "text/html", "koi8_r", "", "страница в кодировке кои"),
    (7, 5, "text/html", "euc_kr", "", "선언이 없는 한국어 페이지"),
]


def _charset_doc_parts(
    ct: str, codec: str, meta: str, text: str
) -> tuple[bytes, bytes]:
    """(http payload, encoded body) for one planted charset record."""
    html = (
        f"<html><head><title>T</title>{meta}</head>"
        f"<body><p>{text}</p></body></html>"
    )
    body = html.encode(codec)
    head = f"HTTP/1.1 200 OK\r\nContent-Type: {ct}\r\n\r\n".encode()
    return head + body, body


def _warc_http(status_line: str, html: str) -> bytes:
    return (
        f"{status_line}\r\nContent-Type: text/html\r\n\r\n{html}"
    ).encode()


def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (
        f"WARC/1.0\r\n{head}Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload + b"\r\n\r\n"


def _warc_html(i: int, j: int) -> str:
    import hashlib

    nw = 1 + (i + j) % 4
    words = " ".join(
        hashlib.md5(f"{i}:warc:{j}:{k}".encode()).hexdigest()
        for k in range(nw)
    )
    return (
        "<html><head><title>T</title><script>var x=1;</script></head>"
        f"<body><p>{words}</p></body></html>"
    )


@locked_frame_builder
def _warc_corpus(spark: SparkSession) -> DataFrame:
    """Six synthetic crawl files, five records each: warcinfo, a
    request, two content responses (md5-derived words, so DuckDB
    replays the extracted text verbatim), and a 404. Files 0-2 are
    plain; file 3 is whole-stream gzip; files 4-5 are gzip
    MEMBER-PER-RECORD — the layout Common Crawl actually ships, which
    a gzip.decompress-based reader silently truncates to one record."""
    import gzip as _gz

    key = spark.sparkContext.applicationId
    df = _WARC_CACHE.get(key)
    if df is not None:
        return df
    _WARC_CACHE.clear()
    rows = []
    for i in range(_WARC_FILES):
        recs = [
            _warc_record(
                [("WARC-Type", "warcinfo")], b"software: graft\r\n"
            ),
            _warc_record(
                [("WARC-Type", "request"),
                 ("WARC-Target-URI", f"http://ex{i}.test/p1")],
                b"GET /p1 HTTP/1.1\r\nHost: x\r\n\r\n",
            ),
        ]
        for j in _WARC_DOCS:
            recs.append(_warc_record(
                [("WARC-Type", "response"),
                 ("WARC-Target-URI", f"http://ex{i}.test/p{j}")],
                _warc_http("HTTP/1.1 200 OK", _warc_html(i, j)),
            ))
        recs.append(_warc_record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", f"http://ex{i}.test/p4")],
            _warc_http(
                "HTTP/1.1 404 Not Found",
                "<html><body><p>gone</p></body></html>",
            ),
        ))
        if i == 3:
            blob = _gz.compress(b"".join(recs))
        elif i >= 4:
            blob = b"".join(_gz.compress(r) for r in recs)
        else:
            blob = b"".join(recs)
        rows.append((i, bytearray(blob)))
    # files 6-8: the non-UTF-8 charset plants (r11) — warcinfo + two
    # 200 responses each, spread across all three compression layouts
    by_file: dict[int, list[bytes]] = {}
    for fi, rj, ct, codec, meta, text in _WARC_CHARSET_DOCS:
        payload, _body = _charset_doc_parts(ct, codec, meta, text)
        by_file.setdefault(fi, [
            _warc_record([("WARC-Type", "warcinfo")],
                         b"software: graft\r\n"),
        ]).append(_warc_record(
            [("WARC-Type", "response"),
             ("WARC-Target-URI", f"http://ex{fi}.test/c{rj}")],
            payload,
        ))
    for fi, recs in sorted(by_file.items()):
        if fi == 7:
            blob = b"".join(_gz.compress(r) for r in recs)
        elif fi == 8:
            blob = _gz.compress(b"".join(recs))
        else:
            blob = b"".join(recs)
        rows.append((fi, bytearray(blob)))
    # parallelize(rows, 2), NOT createDataFrame(rows).coalesce(2): the
    # latter slices the pickled rows into defaultParallelism Python
    # partitions and each coalesced task then pays one Python-runner
    # round trip PER PARENT PARTITION serially (~0.23 s each at
    # local[32] — measured 3.7 s to materialize this 9-row corpus)
    df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2),
        "file_id long, content binary",
    ).localCheckpoint(eager=False)
    _WARC_CACHE[key] = df
    return df


def q216_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-archive ingestion under the VALUE gate: WARC files
    (plain, whole-stream gzip, and member-per-record gzip) through
    `sources/warc.py::warc_records`, response bodies through the
    CHARSET-AWARE decode (r11 — WHATWG sniff order: BOM, HTTP
    Content-Type charset, <meta> declaration, UTF-8 default; files
    6-8 plant windows-1252 / mislabeled ISO-8859-1 / shift_jis / gbk
    / BOM-overridden / bare-UTF-8 pages) and then the SAME
    `strip_html` extractor as q214 — url, HTTP status, Content-Type
    header, exact byte lengths and the extracted text all adjudicated
    verbatim (the text column makes the value hash a character-exact
    proof of the record walk + HTTP split + charset resolution +
    extraction; the oracle replays the non-ASCII paragraphs as the
    literal unicode the independently-encoded bodies must decode
    back to)."""
    from dataingestiontohana_spark.functions.text import strip_html
    from dataingestiontohana_spark.sources.warc import (
        decode_crawl_text,
        warc_records,
    )

    rec = decode_crawl_text(
        warc_records(_warc_corpus(spark)), out_col="page_text"
    )
    return (
        rec.where(
            (F.col("warc_type") == "response")
            & F.col("parse_error").isNull()
        )
        .select(
            "file_id",
            "rec_idx",
            F.col("target_uri").alias("url"),
            F.col("http_status").alias("status"),
            "content_type",
            "n_payload_bytes",
            "n_body_bytes",
            strip_html(F.col("page_text")).alias("text"),
        )
        .orderBy("file_id", "rec_idx")
    )


def q223_charset_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus charset composition (r11): pages per RESOLVED charset
    with total decoded characters — the signal a curation pipeline
    monitors to see what the crawl is actually made of (and whether a
    decoder change silently shifted the mix). Resolution is the same
    WHATWG ladder q216 gates; counting decoded CHARACTERS (not bytes)
    proves the multi-byte codecs really decoded (a gbk page's char
    count is roughly half its byte count; mojibake U+FFFD replacement
    would preserve the byte-derived count and mismatch)."""
    from dataingestiontohana_spark.sources.warc import (
        decode_crawl_text,
        warc_records,
    )

    rec = decode_crawl_text(
        warc_records(_warc_corpus(spark)),
        out_col="page_text", charset_col="charset",
    )
    return (
        rec.where(
            (F.col("warc_type") == "response")
            & F.col("parse_error").isNull()
        )
        .groupBy("charset")
        .agg(
            F.count("*").alias("n_pages"),
            F.sum(F.length("page_text")).alias("n_chars"),
        )
        .orderBy("charset")
    )


def _charset_dist_oracle() -> str:
    """Per-record (charset, chars) VALUES for the planted non-UTF-8
    docs (decoded-unicode lengths from the same constants the corpus
    encodes with stdlib codecs), aggregated together with the ASCII
    files 0-5 whose char count equals their byte count."""
    rows = []
    for fi, rj, ct, codec, meta, text in _WARC_CHARSET_DOCS:
        _payload, body = _charset_doc_parts(ct, codec, meta, text)
        html = body.decode(codec)
        # the builder's codec name IS the resolved python codec name
        # (corpus constants were chosen in normalized form)
        rows.append(f"('{codec}', {len(html)})")
    vals = ", ".join(rows)
    return f"""
        WITH wd AS (
          SELECT f.i AS file_id, r.j AS rec_idx,
                 string_agg(md5(f.i || ':warc:' || r.j || ':' || k.k),
                            ' ' ORDER BY k.k) AS w
          FROM range(6) f(i), range(2, 4) r(j), range(4) k(k)
          WHERE k.k < 1 + (f.i + r.j) % 4
          GROUP BY f.i, r.j
        ),
        ascii_chars AS (
          SELECT 'utf-8' AS charset,
                 length('<html><head><title>T</title>'
                        || '<script>var x=1;</script></head><body><p>')
                 + length(w) + length('</p></body></html>') AS chars
          FROM wd
          UNION ALL
          SELECT 'utf-8',
                 length('<html><body><p>gone</p></body></html>')
          FROM range(6) f(i)
        ),
        planted(charset, chars) AS (VALUES {vals}),
        all_rows AS (
          SELECT * FROM ascii_chars UNION ALL SELECT * FROM planted
        )
        SELECT charset, CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(SUM(chars) AS BIGINT) AS n_chars
        FROM all_rows GROUP BY charset ORDER BY charset
    """


def q217_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup via canonicalization (r9; r10 adds the
    percent-encoding spellings): 80 planted crawl URLs — 20 pages,
    each arriving under 4 spellings (uppercase host + default port +
    fragment + utm noise; tracking params + reordered query +
    lowercase escape hex; unreserved characters percent-encoded
    (%70 = p, %62 = b) the way proxies and template engines emit
    them; the clean form) — collapse to 20 canonical URLs of exactly
    4 raw variants each through `functions/url.py::canonicalize_url`.
    Every canonical path carries a RESERVED escape (%2F) so the
    uppercase-hex rule is load-bearing, and two variants spell it
    %2f. The corpus is built IN-ENGINE from `range(80)` concat
    formulas, so the DuckDB oracle reconstructs the identical raw
    strings and canonicalizes them with the SQL twin — any divergence
    in any canonicalization rule hash-mismatches."""
    from dataingestiontohana_spark.functions.url import canonicalize_url

    t = spark.range(80).select(
        F.expr("id DIV 4").alias("b"),  # exact long division (the
        # winnowing lesson: / routes through double)
        (F.col("id") % 4).alias("v"),
        F.col("id").alias("i"),
    )
    url = (
        F.when(F.col("v") == 0, F.concat(
            F.lit("http://site"), F.col("b"), F.lit(".test/p"),
            F.col("b"), F.lit("%2Fx?a="), F.col("b"), F.lit("&b=2"),
        ))
        .when(F.col("v") == 1, F.concat(
            F.lit("HTTP://SITE"), F.col("b"), F.lit(".TEST:80/p"),
            F.col("b"), F.lit("%2Fx?utm_source=x&b=2&a="), F.col("b"),
            F.lit("#f"), F.col("i"),
        ))
        .when(F.col("v") == 2, F.concat(
            F.lit("http://site"), F.col("b"), F.lit(".test/p"),
            F.col("b"), F.lit("%2fx?b=2&a="), F.col("b"),
            F.lit("&fbclid=z"), F.col("i"),
        ))
        .otherwise(F.concat(
            F.lit("http://site"), F.col("b"), F.lit(".test/%70"),
            F.col("b"), F.lit("%2fx?%62=2&a="), F.col("b"),
            F.lit("&utm_campaign=c"), F.col("i"),
        ))
    )
    urls = t.select(url.alias("u"))
    return (
        urls.groupBy(canonicalize_url("u").alias("canonical_url"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_variants"),
            F.countDistinct("u").cast("bigint").alias("n_raw"),
        )
        .orderBy("canonical_url")
    )


# The IDN fold corpus (r10): every host arrives under three spellings
# — lowercase unicode, the pre-encoded ACE form, and uppercase
# unicode — which must collapse to ONE ACE host. The expected ACE
# strings are constants derived from CPython's independent punycode
# codec (and for the classics, RFC 3492's own samples); pytest pins
# them three ways (literal == stdlib == functions/idn.py) so the
# oracle's literal map is an adjudicated fixture, not a tautology.
# Hosts are chosen so unicode upper->lower round-trips exactly (no
# ß/final-sigma traps) — asserted at corpus build.
_IDN_HOSTS: list[tuple[str, str]] = [
    ("bücher.example", "xn--bcher-kva.example"),
    ("mañana.example", "xn--maana-pta.example"),
    ("δοκιμή.example", "xn--jxalpdlp.example"),
    ("пример.испытание", "xn--e1afmkfd.xn--80akhbyknj4f"),
    ("例え.テスト", "xn--r8jz45g.xn--zckzah"),
    ("בדיקה.example", "xn--5dbedt4e.example"),
    ("点心.香港", "xn--15t909a.xn--j6w193g"),
    ("café.mixed-ascii.example", "xn--caf-dma.mixed-ascii.example"),
    ("plain-ascii.example", "plain-ascii.example"),
]


def _idn_corpus_urls() -> list[str]:
    urls = []
    for i, (host, ace) in enumerate(_IDN_HOSTS):
        assert host.upper().lower() == host, host
        urls.append(f"http://{host}/p{i}")
        urls.append(f"http://{ace}/p{i}")
        urls.append(f"http://{host.upper()}/p{i}")
    return urls


def q222_idn_host(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDN host folding (r10): unicode hostnames and their
    ASCII-Compatible-Encoding (ACE / punycode) spellings are the SAME
    host to DNS — crawl URL identity must fold them. 27 planted URLs
    (9 hosts x {lowercase unicode, pre-encoded ACE, UPPERCASE
    unicode}) collapse to 9 ACE hosts of exactly 3 variants each.

    Scale shape (the reason this is NOT inside `canonicalize_url`):
    punycode runs in Python, so the plan splits the frame on an
    ASCII-host fast path — ASCII rows fold in pure codegen
    (lower()), only the non-ASCII residue (a tiny fraction of any
    real crawl) crosses the Arrow boundary into the pandas UDF, and
    the union re-aggregates with one hash shuffle. A CASE-WHEN would
    evaluate the UDF on every row; the two-frame union is the
    honest gate."""
    from pyspark.sql.functions import pandas_udf

    from dataingestiontohana_spark.functions.idn import ace_host

    # no annotations: `from __future__ import annotations` stringifies
    # hints, which pandas_udf cannot infer — the bare signature takes
    # the default SCALAR eval type
    @pandas_udf("string")
    def ace_udf(hosts):
        return hosts.map(ace_host)

    urls = local_rows(
        spark, [(u,) for u in _idn_corpus_urls()], "u string"
    )
    host = F.regexp_extract("u", r"^[^:/?#]+://([^/?#]*)", 1)
    with_host = urls.select(host.alias("host"))
    is_ascii = F.col("host").rlike(r"^[\x00-\x7F]*$")
    ascii_side = with_host.where(is_ascii).select(
        F.lower("host").alias("ace_host")
    )
    unicode_side = with_host.where(~is_ascii).select(
        ace_udf("host").alias("ace_host")
    )
    return (
        ascii_side.unionAll(unicode_side)
        .groupBy("ace_host")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_urls"))
        .orderBy("ace_host")
    )


QUERIES = {
    "q39_sensor_generate": q39_sensor_generate,
    "q40_sensor_csv_roundtrip": q40_sensor_csv_roundtrip,
    "q216_warc_ingest": q216_warc_ingest,
    "q217_url_dedup": q217_url_dedup,
    "q222_idn_host": q222_idn_host,
    "q223_charset_distribution": q223_charset_distribution,
}


def _q39_oracle_sql(n: int = N) -> str:
    """Every generator value recomputed in ANSI SQL: the per-salt
    60-bit hash is the leading 15 hex chars of md5('salt|counter')
    rebuilt nibble-by-nibble (strpos — big-endian, exactly Spark's
    conv(substr(md5(..),1,15),16,10)); units are (h % 1e4)/1e4 and the
    field formulas mirror generator._sensor_columns verbatim. Every
    field is an exact 4-decimal rational (see generator._unit), so
    ROUND(., 4) has no midpoints and both engines emit the identical
    double (the q71 lesson: keep every decision off the float
    boundary)."""

    def h60(salt: int) -> str:
        nib = " + ".join(
            f"(strpos('0123456789abcdef', substr(md5('{salt}|' || "
            f"CAST(counter AS VARCHAR)), {1 + p}, 1)) - 1)"
            f" * CAST({16 ** (14 - p)} AS BIGINT)"
            for p in range(15)
        )
        return f"({nib})"

    def unit(salt: int) -> str:
        return f"(({h60(salt)} % 10000) / 10000.0)"

    return f"""
        WITH c AS (SELECT CAST(range AS INT) AS counter FROM range({n}))
        SELECT counter,
               CAST({h60(0)} % 5 + 2 AS INT) AS deviceid,
               ROUND(25.0 + {unit(1)} * 1.0, 4) AS temperature,
               ROUND(47.0 + {unit(2)} * 9.0, 4) AS humidity,
               ROUND(400.0 + {unit(3)} * 600.0, 4) AS co2,
               ROUND({unit(4)} * 10.0, 4) AS co,
               ROUND({unit(5)} * 5.0, 4) AS lpg,
               ROUND({unit(6)} * 2.0, 4) AS smoke,
               CAST({h60(7)} % 2 AS INT) AS presence,
               ROUND({unit(8)} * 1000.0, 4) AS light,
               ROUND(30.0 + {unit(9)} * 60.0, 4) AS sound
        FROM c ORDER BY counter
    """


def _warc_charset_values() -> str:
    """The planted non-UTF-8 records as oracle VALUES literals. The
    unicode text and byte lengths derive from the SAME constants the
    corpus builder encodes with the STDLIB codecs (the independent
    encoder — our Spark path must resolve the right charset and
    decode the bytes back to these exact literals; a wrong codec or a
    U+FFFD replacement hash-mismatches). The lengths are re-derived
    here from the encoded bytes, not copied by hand."""
    rows = []
    for fi, rj, ct, codec, meta, text in _WARC_CHARSET_DOCS:
        payload, body = _charset_doc_parts(ct, codec, meta, text)
        expected = f"T {text}"
        ct_lit = ct.replace("'", "''")
        txt_lit = expected.replace("'", "''")
        rows.append(
            f"({fi}, {rj}, 'http://ex{fi}.test/c{rj}', 200, "
            f"'{ct_lit}', {len(payload)}, {len(body)}, '{txt_lit}')"
        )
    return ", ".join(rows)


_WARC_ORACLE_TEMPLATE = """
    WITH wd AS (
      SELECT f.i AS file_id, r.j AS rec_idx,
             string_agg(md5(f.i || ':warc:' || r.j || ':' || k.k),
                        ' ' ORDER BY k.k) AS w
      FROM range(6) f(i), range(2, 4) r(j), range(4) k(k)
      WHERE k.k < 1 + (f.i + r.j) % 4
      GROUP BY f.i, r.j
    ),
    hdr AS (
      SELECT length('Content-Type: text/html') + 2 + 2 AS tail
    ),
    content AS (
      SELECT file_id, CAST(rec_idx AS INT) AS rec_idx,
             'http://ex' || file_id || '.test/p' || rec_idx AS url,
             CAST(200 AS INT) AS status,
             'text/html' AS content_type,
             CAST(length('HTTP/1.1 200 OK') + 2 + hdr.tail
                  + length('<html><head><title>T</title>'
                           || '<script>var x=1;</script></head><body><p>')
                  + length(w) + length('</p></body></html>')
                  AS INT) AS n_payload_bytes,
             CAST(length('<html><head><title>T</title>'
                         || '<script>var x=1;</script></head><body><p>')
                  + length(w) + length('</p></body></html>')
                  AS INT) AS n_body_bytes,
             'T ' || w AS text
      FROM wd, hdr
    ),
    gone AS (
      SELECT CAST(f.i AS BIGINT) AS file_id, CAST(4 AS INT) AS rec_idx,
             'http://ex' || f.i || '.test/p4' AS url,
             CAST(404 AS INT) AS status,
             'text/html' AS content_type,
             CAST(length('HTTP/1.1 404 Not Found') + 2 + hdr.tail
                  + length('<html><body><p>gone</p></body></html>')
                  AS INT) AS n_payload_bytes,
             CAST(length('<html><body><p>gone</p></body></html>')
                  AS INT) AS n_body_bytes,
             'gone' AS text
      FROM range(6) f(i), hdr
    ),
    charset_rows(file_id, rec_idx, url, status, content_type,
                 n_payload_bytes, n_body_bytes, text) AS (
      VALUES {charset_values}
    ),
    charset_typed AS (
      SELECT CAST(file_id AS BIGINT) AS file_id,
             CAST(rec_idx AS INT) AS rec_idx, url,
             CAST(status AS INT) AS status, content_type,
             CAST(n_payload_bytes AS INT) AS n_payload_bytes,
             CAST(n_body_bytes AS INT) AS n_body_bytes, text
      FROM charset_rows
    )
    SELECT * FROM content
    UNION ALL
    SELECT * FROM gone
    UNION ALL
    SELECT * FROM charset_typed
    ORDER BY file_id, rec_idx
"""


def _warc_oracle() -> str:
    return _WARC_ORACLE_TEMPLATE.format(
        charset_values=_warc_charset_values()
    )




def _url_dedup_oracle() -> str:
    from dataingestiontohana_spark.functions.url import canonicalize_url_sql

    return f"""
        WITH t AS (
          SELECT i // 4 AS b, i % 4 AS v, i FROM range(80) r(i)
        ),
        urls AS (
          SELECT CASE v
            WHEN 0 THEN 'http://site' || b || '.test/p' || b
                        || '%2Fx?a=' || b || '&b=2'
            WHEN 1 THEN 'HTTP://SITE' || b || '.TEST:80/p' || b
                        || '%2Fx?utm_source=x&b=2&a=' || b || '#f' || i
            WHEN 2 THEN 'http://site' || b || '.test/p' || b
                 || '%2fx?b=2&a=' || b || '&fbclid=z' || i
            ELSE 'http://site' || b || '.test/%70' || b
                 || '%2fx?%62=2&a=' || b || '&utm_campaign=c' || i
          END AS u
          FROM t
        )
        SELECT {canonicalize_url_sql('u')} AS canonical_url,
               CAST(COUNT(*) AS BIGINT) AS n_variants,
               CAST(COUNT(DISTINCT u) AS BIGINT) AS n_raw
        FROM urls
        GROUP BY 1
        ORDER BY canonical_url
    """


def _idn_oracle() -> str:
    """The raw corpus reconstructed as VALUES literals; the fold
    adjudicated against the LITERAL unicode->ACE map (stdlib-derived
    constants, three-way pinned in pytest — see _IDN_HOSTS). DuckDB's
    utf8proc lower() collapses the uppercase spellings onto the map
    keys; ASCII hosts fold by lowercase alone."""
    url_rows = ", ".join(f"('{u}')" for u in _idn_corpus_urls())
    map_rows = ", ".join(f"('{h}', '{a}')" for h, a in _IDN_HOSTS)
    return f"""
        WITH urls(u) AS (VALUES {url_rows}),
        m(uni, ace) AS (VALUES {map_rows}),
        hosts AS (
          SELECT lower(regexp_extract(u, '^[^:/?#]+://([^/?#]*)', 1))
                 AS host
          FROM urls
        )
        SELECT COALESCE(m.ace, h.host) AS ace_host,
               CAST(COUNT(*) AS BIGINT) AS n_urls
        FROM hosts h LEFT JOIN m ON h.host = m.uni
        GROUP BY 1
        ORDER BY ace_host
    """


ORACLES: dict[str, str] = {
    "q39_sensor_generate": _q39_oracle_sql(),
    "q216_warc_ingest": _warc_oracle(),
    "q217_url_dedup": _url_dedup_oracle(),
    "q222_idn_host": _idn_oracle(),
    "q223_charset_distribution": _charset_dist_oracle(),
    # q40 is an invariant audit (the q65 bounds-flag precedent): the
    # oracle states the contract — every generated row survives the
    # CSV encode/parse roundtrip and the counter stream is continuous.
    # Spark computes (total, matched, uniq, span) genuinely; a lossy
    # envelope or a hole in the counter stream breaks the match.
    "q40_sensor_csv_roundtrip": f"""
        SELECT CAST({N} AS BIGINT) AS total, CAST({N} AS BIGINT) AS matched,
               CAST({N} AS BIGINT) AS uniq, CAST({N} AS BIGINT) AS span
    """,
}
