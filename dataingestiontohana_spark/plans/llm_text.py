"""Text-analysis surface over the `documents` table (SURVEY §2.2
"LLM-data ops"): language stats, exact-dup counting, token counting,
quality scoring, language-ID heuristic, document fingerprinting.

Everything here is built-in-function-only (whole-stage codegen) — these
are scan-shaped single-pass operators that stream over 100 TB without
any shuffle except the final small aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.functions.text import (
    normalize_sql as _nsql,
    normalize_text,
    tokens,
)

_NORM = _nsql("text")

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Chosen to be expressible identically in the
# DuckDB oracle (plain word-boundary regex counts).
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is"],
    "de": ["der", "die", "und", "ist"],
    "fr": ["le", "la", "et", "est"],
    "es": ["el", "los", "y", "es"],
    "zh": ["de", "shi", "zai", "he"],
}


def q21_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def q22_exact_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("total"),
        F.countDistinct("text").alias("uniq"),
    )


def q25_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting per document + corpus rollup by source.

    At scale: a single codegen'd projection over the scan, then a tiny
    agg — no UDF, no explode.
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        d.select("doc_id", "source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
        )
        .orderBy("source")
    )


def quality_score_cols() -> tuple[F.Column, F.Column]:
    """(n_tokens, quality) — THE q26 heuristic quality expression
    (length gate x chars-per-token + stopword ratio, each ROUND 4),
    shared by every consumer (q26 ranking, q213 domain caps) so the
    heuristic has exactly one definition per engine; its SQL twin is
    :data:`QUALITY_SCORE_SQL` below."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "is"))
    )
    score = (
        F.when(F.col("n_chars") < 50, 0.0).otherwise(1.0)
        * F.round(F.col("n_chars") / n_tokens, 4)
        + F.round(stop_hits / n_tokens, 4)
    )
    return n_tokens, F.round(score, 4)


# the DuckDB twin of quality_score_cols(): CTE body computing
# (doc_id, source, n_tokens, quality) over `documents`
QUALITY_SCORE_SQL = """
    qs AS (
      SELECT doc_id, source, len(toks) AS n_tokens,
             ROUND((CASE WHEN n_chars < 50 THEN 0.0 ELSE 1.0 END)
                     * ROUND(n_chars / len(toks), 4)
                   + ROUND(len(list_filter(toks,
                       x -> x IN ('the','a','and','of','is')))
                           / len(toks), 4), 4) AS quality
      FROM (SELECT doc_id, source, n_chars,
                   regexp_split_to_array(trim(text),
                       '[ \\t\\n\\x0b\\f\\r]+') AS toks
            FROM documents))
"""


def q26_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, mean word length, stopword
    ratio — the standard cheap filters of a pretraining-data pipeline
    (cf. Gopher/C4 quality heuristics). Returns the per-doc score for
    the lowest-scoring 100 docs (deterministic total order).
    """
    d = load_table(spark, sf_dir, "documents")
    n_tokens, quality = quality_score_cols()
    return (
        d.select(
            "doc_id",
            n_tokens.alias("n_tokens"),
            quality.alias("quality"),
        )
        .orderBy("quality", "doc_id")
        .limit(100)
    )


def q27_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language-ID heuristic: count marker-word hits per
    language, argmax wins ('und' = undetermined when all zero). Output:
    predicted-language histogram.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(normalize_text(F.col("text")), " ")
    hit_cols = []
    for lang, markers in _LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(*markers)))
        hit_cols.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    # argmax via array_max over (hits, lang) structs: max hits, then max
    # lang alphabetically on ties — deterministic and oracle-expressible.
    best = F.array_max(F.array(*hit_cols))
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return (
        d.select(pred.alias("pred_lang"))
        .groupBy("pred_lang")
        .agg(F.count("*").alias("docs"))
        .orderBy("pred_lang")
    )


def q28_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over normalized text, grouped to
    find exact near-byte duplicates (keeps min doc_id as canonical)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            F.md5(normalize_text(F.col("text"))).alias("fp"),
            "doc_id",
        )
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("canonical_id")
    )


def q85_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashing text embedder (Weinberger et al. 2009, the
    'hashing trick'): each token lands in dimension md5(token) mod 64
    with a sign bit from the next md5 nibble; a document's embedding
    is the per-dimension signed count — the stubbed-model stand-in for
    a neural embedder, mapping text into a fixed 64-dim space with NO
    vocabulary state (the property that makes it mergeable across 100
    TB shards: signed counts sum). Emitted in sparse exploded form
    (doc_id, dim, v) with exact integers, so the DuckDB oracle
    recomputes every component verbatim; dense/normalized assembly for
    cosine consumers is a map-only array_agg away.

    Scale: explode -> one groupBy(doc_id, dim) with map-side combine;
    shuffle rows are (doc_id, dim, partial count) scalars.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    hx = F.md5("tok")
    val = F.conv(F.substring(hx, 1, 15), 16, 10).cast("bigint")
    sgn = F.when(
        F.conv(F.substring(hx, 16, 1), 16, 10).cast("int") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        tok.select(
            "doc_id",
            F.pmod(val, F.lit(64)).cast("int").alias("dim"),
            sgn.alias("s"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("bigint").alias("v"))
        .where(F.col("v") != 0)
        .orderBy("doc_id", "dim")
    )


def q224_nfc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization audit (r11): the pass every curation
    pipeline runs before dedup — combining-sequence spellings ("e" +
    U+0301) and precomposed spellings ("é") of the same text
    otherwise shingle differently and defeat exact/near dedup. The
    corpus plants both spellings IN-ENGINE (doc_id % 7 == 3 appends a
    combining sequence, % 7 == 5 the precomposed equivalent), so the
    gate is load-bearing on ASCII test data too. Adjudicated per
    normalization status: doc count, NFC char count, and chars saved
    (combining pairs collapse). Cross-engine value: Spark normalizes
    with CPython's unicodedata, the oracle with DuckDB's utf8proc
    nfc_normalize — two INDEPENDENT Unicode implementations must
    agree character-exactly. Scale shape: the q222 IDN discipline —
    an ASCII codegen fast path keeps the Python/Arrow hop to the
    non-ASCII residue only (on a real multilingual crawl that residue
    is the minority; normalization is map-only either way)."""
    from pyspark.sql.functions import pandas_udf

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 3,
            # DECOMPOSED spellings: e + U+0301, i + U+0308
            F.concat(F.col("text"), F.lit(" cafe\u0301 nai\u0308ve")),
        )
        .when(
            F.col("doc_id") % 7 == 5,
            # PRECOMPOSED spellings: U+00E9, U+00EF (NFC)
            F.concat(F.col("text"), F.lit(" caf\u00e9 na\u00efve")),
        )
        .otherwise(F.col("text"))
        .alias("tx"),
    )

    # no annotations: `from __future__ import annotations` stringifies
    # hints, which pandas_udf cannot infer
    @pandas_udf("string")
    def nfc_udf(texts):
        import unicodedata

        return texts.map(
            lambda t: unicodedata.normalize("NFC", t)
            if t is not None else None
        )

    # NULL text rides the ascii side (rlike(NULL) is NULL and would
    # silently drop the row from BOTH filter branches — r11 review);
    # nx stays NULL there, so is_nfc groups as NULL exactly like the
    # oracle's nfc_normalize(NULL) row
    is_ascii = F.col("tx").isNull() | F.col("tx").rlike(r"^[\x00-\x7F]*$")
    ascii_side = planted.where(is_ascii).select(
        "doc_id", F.col("tx").alias("nx"), F.col("tx"),
    )
    unicode_side = planted.where(~is_ascii).select(
        "doc_id", nfc_udf("tx").alias("nx"), F.col("tx"),
    )
    both = ascii_side.unionAll(unicode_side)
    return (
        both.select(
            (F.col("tx") == F.col("nx")).alias("is_nfc"),
            F.length("nx").alias("ln"),
            (F.length("tx") - F.length("nx")).alias("saved"),
        )
        .groupBy("is_nfc")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ln").alias("n_chars_nfc"),
            F.sum("saved").alias("chars_saved"),
        )
        .orderBy("is_nfc")
    )


_NFC_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 7 = 3 THEN text || ' cafe' || chr(769)
                    || ' nai' || chr(776) || 've'
               WHEN doc_id % 7 = 5 THEN text || ' caf' || chr(233)
                    || ' na' || chr(239) || 've'
               ELSE text
             END AS tx
      FROM documents
    ),
    n AS (SELECT doc_id, tx, nfc_normalize(tx) AS nx FROM t)
    SELECT (tx = nx) AS is_nfc,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(length(nx)) AS BIGINT) AS n_chars_nfc,
           CAST(SUM(length(tx) - length(nx)) AS BIGINT) AS chars_saved
    FROM n GROUP BY 1 ORDER BY is_nfc
"""


QUERIES = {
    "q21_lang_stats": q21_lang_stats,
    "q22_exact_dedup_count": q22_exact_dedup_count,
    "q25_token_stats": q25_token_stats,
    "q26_quality_score": q26_quality_score,
    "q27_lang_id": q27_lang_id,
    "q28_fingerprint": q28_fingerprint,
    "q85_hash_embed": q85_hash_embed,
    "q224_nfc_audit": q224_nfc_audit,
}

# feature-hash dimension: md5's leading 15 hex chars as a big-endian
# uint (the minhash-base construction), reduced mod 64; sign from the
# parity of hex char 16
_HASH_EMBED_ORACLE = """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split({norm},
                    ' ')) AS tok
      FROM documents),
    h AS (
      SELECT doc_id, md5(tok) AS hx FROM tok),
    comp AS (
      SELECT doc_id,
             CAST(({hex15}) % 64 AS INT) AS dim,
             CASE WHEN (strpos('0123456789abcdef', substr(hx, 16, 1)) - 1) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM h)
    SELECT doc_id, dim, CAST(SUM(s) AS BIGINT) AS v
    FROM comp GROUP BY doc_id, dim
    HAVING SUM(s) != 0
    ORDER BY doc_id, dim
""".format(
    norm=_NORM,
    hex15=" + ".join(
        f"(strpos('0123456789abcdef', substr(hx, {1 + p}, 1)) - 1)"
        f" * CAST({16 ** (14 - p)} AS BIGINT)"
        for p in range(15)
    )
)

_MARKER_SQL = {
    lang: ("len(list_filter(regexp_split_to_array(" + _NORM
           + ", ' '), t -> t IN ({})))").format(
        ", ".join(f"'{m}'" for m in markers)
    )
    for lang, markers in _LANG_MARKERS.items()
}

ORACLES = {
    "q21_lang_stats": """
        SELECT lang, COUNT(*) AS docs, ROUND(AVG(n_chars), 2) AS avg_chars
        FROM documents GROUP BY lang ORDER BY lang
    """,
    "q22_exact_dedup_count": """
        SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq FROM documents
    """,
    "q25_token_stats": """
        WITH t AS (
          SELECT doc_id, source,
                 len(regexp_split_to_array(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) AS n_tokens
          FROM documents)
        SELECT source, COUNT(*) AS docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
               ROUND(AVG(n_tokens), 2) AS avg_tokens
        FROM t GROUP BY source ORDER BY source
    """,
    "q26_quality_score": f"""
        WITH {QUALITY_SCORE_SQL}
        SELECT doc_id, n_tokens, quality
        FROM qs ORDER BY quality, doc_id LIMIT 100
    """,
    "q27_lang_id": """
        WITH hits AS (
          SELECT doc_id, {structs} AS cands
          FROM documents),
        best AS (
          SELECT doc_id, list_max(cands) AS b FROM hits)
        SELECT CASE WHEN b.hits > 0 THEN b.lang ELSE 'und' END AS pred_lang,
               COUNT(*) AS docs
        FROM best GROUP BY 1 ORDER BY pred_lang
    """.format(
        structs="["
        + ", ".join(
            "{{'hits': {expr}, 'lang': '{lang}'}}".format(expr=expr, lang=lang)
            for lang, expr in _MARKER_SQL.items()
        )
        + "]"
    ),
    "q28_fingerprint": f"""
        WITH f AS (
          SELECT md5({_NORM}) AS fp,
                 doc_id
          FROM documents)
        SELECT fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
        FROM f GROUP BY fp HAVING COUNT(*) > 1 ORDER BY canonical_id
    """,
}

ORACLES["q85_hash_embed"] = _HASH_EMBED_ORACLE
ORACLES["q224_nfc_audit"] = _NFC_ORACLE


def q110_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 most SURPRISING documents under the corpus's own unigram
    language model — the perplexity-filter primitive (CCNet-style LM
    filtering, here with the corpus itself as the model so no external
    artifact is needed): avg_lp = mean over tokens of ln p(tok),
    ppl = exp(-avg_lp). High-ppl docs are the gibberish/low-quality
    tail a curation pipeline quarantines.

    Exactness: each TYPE's log-probability quantizes ONCE to the exact
    integer round(ln(c/N)*1e6) (one ln of one IEEE division, SQL-ROUND
    to an int64 — the q100 1e-4-grid maneuver at 1e-6); per-doc sums
    of those ints are order-independent; avg_lp is one IEEE division
    (sum / (n_tok*1e6)) and only ppl = exp(-avg_lp) re-enters libm,
    rounded to 6 (q75 precedent).

    Scale shape: explode -> groupBy(doc_id, tok) for per-doc type
    counts (map-side combine collapses repeats), vocabulary counts
    aggregate from THAT frame (the q75 two-aggregation shape), join
    back on tok (sort-merge on the shared token partitioning), final
    groupBy(doc_id). N rides a 1-row broadcast crossJoin. Top-20 is
    TakeOrderedAndProject.
    """
    from dataingestiontohana_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds vocab agg AND the join
    )
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    n_total = vocab.agg(F.sum("c").cast("decimal(38,0)").alias("n"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double"))
        * F.lit(1000000.0),
        0,
    ).cast("bigint")
    scored = (
        tf.join(vocab, "tok")
        .crossJoin(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * lp).cast("bigint").alias("lp_sum_q6"),
        )
    )
    avg_lp = F.col("lp_sum_q6").cast("double") / (
        F.col("n_tokens") * F.lit(1000000)
    ).cast("double")
    return (
        scored.select(
            "doc_id",
            "n_tokens",
            "lp_sum_q6",
            avg_lp.alias("avg_lp"),
            F.round(F.exp(-avg_lp), 6).alias("ppl"),
        )
        .orderBy("avg_lp", "doc_id")
        .limit(20)
    )


QUERIES["q110_unigram_surprise"] = q110_unigram_surprise

from dataingestiontohana_spark.functions.text import (  # noqa: E402
    TOKENS_SQL_CTE as _TOK_CTE110,
)

ORACLES["q110_unigram_surprise"] = f"""
    WITH {_TOK_CTE110},
    tf AS (
      SELECT doc_id, tok2 AS tok, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok)
      GROUP BY doc_id, tok2),
    vocab AS (SELECT tok, SUM(tf) AS c FROM tf GROUP BY tok),
    n AS (SELECT CAST(SUM(c) AS HUGEINT) AS n FROM vocab),
    scored AS (
      SELECT doc_id,
             CAST(SUM(tf) AS BIGINT) AS n_tokens,
             CAST(SUM(tf * CAST(round(ln(CAST(c AS DOUBLE)
                                          / CAST(n.n AS DOUBLE))
                                      * 1000000.0, 0) AS BIGINT))
                  AS BIGINT) AS lp_sum_q6
      FROM tf JOIN vocab USING (tok) CROSS JOIN n
      GROUP BY doc_id)
    SELECT doc_id, n_tokens, lp_sum_q6,
           CAST(lp_sum_q6 AS DOUBLE)
             / CAST(n_tokens * 1000000 AS DOUBLE) AS avg_lp,
           round(exp(-(CAST(lp_sum_q6 AS DOUBLE)
                       / CAST(n_tokens * 1000000 AS DOUBLE))), 6) AS ppl
    FROM scored
    ORDER BY avg_lp, doc_id LIMIT 20
"""


def q111_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution Shannon entropy per source — the diversity /
    mode-collapse monitor for a training mixture (a source whose
    entropy collapses is emitting templated or duplicated text; the
    normalized form H/ln(types) compares sources of different
    vocabulary sizes on one scale).

    Exactness (the q110 integer-grid maneuver): H = -(1/N) * sum over
    types of c*ln(c/N); each type's ln(c/N) quantizes ONCE to the
    exact int64 round(ln(c/N)*1e6), the weighted sum is exact integer
    arithmetic, and H is one IEEE division. Only h_norm's ln(types)
    re-enters libm (round 6).

    Scale shape: ONE full-data shuffle — groupBy(source, tok) with
    map-side combine; everything after operates on the (source,
    vocabulary) frame: per-source totals reduce it to |sources| rows
    broadcast back, and the entropy aggregation reduces it again.
    """
    from dataingestiontohana_spark.functions.text import tokens

    d = load_table(spark, sf_dir, "documents")
    tc = (
        d.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds totals AND the entropy agg
    )
    ns = tc.groupBy("source").agg(F.sum("c").alias("n"))
    lp = F.round(
        F.log(F.col("c").cast("double") / F.col("n").cast("double"))
        * F.lit(1000000.0),
        0,
    ).cast("bigint")
    g = (
        tc.join(F.broadcast(ns), "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("types"),
            F.first("n").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * lp).cast("bigint").alias("ent_sum_q6"),
        )
    )
    h = -(
        F.col("ent_sum_q6").cast("double")
        / (F.col("n_tokens") * F.lit(1000000)).cast("double")
    )
    return (
        g.select(
            "source",
            "types",
            "n_tokens",
            "ent_sum_q6",
            h.alias("entropy"),
            F.round(h / F.log(F.col("types").cast("double")), 6).alias(
                "h_norm"
            ),
        )
        .orderBy("source")
    )


QUERIES["q111_source_entropy"] = q111_source_entropy

ORACLES["q111_source_entropy"] = f"""
    WITH {_TOK_CTE110},
    tc AS (
      SELECT d.source, tok2 AS tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(toks) AS tok2 FROM tok) u
      JOIN documents d USING (doc_id)
      GROUP BY d.source, tok2),
    ns AS (SELECT source, SUM(c) AS n FROM tc GROUP BY source),
    g AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS types,
             CAST(ANY_VALUE(n) AS BIGINT) AS n_tokens,
             CAST(SUM(c * CAST(round(ln(CAST(c AS DOUBLE)
                                         / CAST(n AS DOUBLE))
                                     * 1000000.0, 0) AS BIGINT))
                  AS BIGINT) AS ent_sum_q6
      FROM tc JOIN ns USING (source)
      GROUP BY source)
    SELECT source, types, n_tokens, ent_sum_q6,
           -(CAST(ent_sum_q6 AS DOUBLE)
             / CAST(n_tokens * 1000000 AS DOUBLE)) AS entropy,
           round(-(CAST(ent_sum_q6 AS DOUBLE)
                   / CAST(n_tokens * 1000000 AS DOUBLE))
                 / ln(CAST(types AS DOUBLE)), 6) AS h_norm
    FROM g ORDER BY source
"""


def q154_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier, trained and
    evaluated inside the engine: fit Laplace-smoothed per-(lang, token)
    log-likelihoods on the deterministic 80% hash split (the q57
    convention), score the held-out 20%, and emit the confusion matrix
    actual_lang x pred_lang. This is the trained-model counterpart of
    the q27 heuristic lang-id — the same "fit on a split, apply to the
    rest" dataflow a quality/toxicity classifier uses at corpus scale.

    Exactness (the q110 integer-grid maneuver): every model parameter
    quantizes ONCE to an exact int64 on the 1e-6 grid — prior
    round(ln(docs_l/docs)*1e6), seen-token round(ln((c+1)/(n_l+V))*1e6),
    unseen-token round(ln(1/(n_l+V))*1e6) — so per-doc scores are pure
    integer sums (fold-order immune) and the argmax + min-lang
    tie-break is exact in both engines.

    Scale shape: training is ONE explode -> groupBy(lang, tok) with
    map-side combine (the q75/q110 two-aggregation shape); the model is
    |langs| x |train vocab| — broadcast to scoring, so the held-out
    explode fans out by |langs| (a literal array collected from the
    |langs|-row stats frame, the k-means driver-small precedent) and
    joins map-only. The only post-training shuffles group on reduced
    frames: (doc, lang) scores, per-doc argmax, the final confusion
    matrix. Unseen-in-lang and out-of-vocabulary tokens share the same
    1/(n_l+V) mass, so a plain left-join + coalesce covers both without
    densifying the model to |langs| x |V|.
    """
    from dataingestiontohana_spark.functions.text import tokens
    from dataingestiontohana_spark.plans.sampling import _bucket

    d = load_table(spark, sf_dir, "documents")
    is_train = _bucket(F.col("doc_id"), 100) < 80
    train = d.where(is_train)
    test = d.where(~is_train)

    def q6(col: F.Column) -> F.Column:
        return F.round(F.log(col) * F.lit(1000000.0), 0).cast("bigint")

    cnt = (
        train.select("lang", F.explode(tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds totals, V, AND the model
    )
    totals = cnt.groupBy("lang").agg(F.sum("c").alias("n_tok"))
    vsize = cnt.agg(F.countDistinct("tok").alias("v"))
    pri = train.groupBy("lang").agg(F.count(F.lit(1)).alias("docs"))
    all_docs = pri.agg(F.sum("docs").alias("all_docs"))
    lang_stats = (
        pri.join(totals, "lang")
        .join(F.broadcast(all_docs))
        .join(F.broadcast(vsize))
        .select(
            "lang",
            q6(
                F.col("docs").cast("double")
                / F.col("all_docs").cast("double")
            ).alias("prior_q6"),
            q6(
                F.lit(1.0) / (F.col("n_tok") + F.col("v")).cast("double")
            ).alias("oov_ll_q6"),
            (F.col("n_tok") + F.col("v")).alias("denom"),
        )
        .localCheckpoint(eager=False)  # tiny (|langs| rows), reused 3x
    )
    model = cnt.join(F.broadcast(lang_stats.select("lang", "denom")), "lang").select(
        "lang",
        "tok",
        q6(
            (F.col("c") + F.lit(1)).cast("double")
            / F.col("denom").cast("double")
        ).alias("ll_q6"),
    )

    # class fan-out as a literal array: |langs| is driver-small by
    # definition (it is the model's class count), mirroring the k-means
    # centroid collect — NOT a multi-row crossJoin (plan-lint gate)
    langs = [r["lang"] for r in lang_stats.select("lang").collect()]
    tf = (
        test.select("doc_id", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    scored = (
        tf.withColumn(
            "lang", F.explode(F.array(*[F.lit(x) for x in langs]))
        )
        .join(
            F.broadcast(lang_stats.select("lang", "prior_q6", "oov_ll_q6")),
            "lang",
        )
        .join(F.broadcast(model), ["lang", "tok"], "left")
        .groupBy("doc_id", "lang", "prior_q6")
        .agg(
            F.sum(
                F.col("tf")
                * F.coalesce(F.col("ll_q6"), F.col("oov_ll_q6"))
            ).alias("tok_ll")
        )
        .select(
            "doc_id",
            "lang",
            (F.col("prior_q6") + F.col("tok_ll"))
            .cast("bigint")
            .alias("score_q6"),
        )
    )
    best = scored.groupBy("doc_id").agg(F.max("score_q6").alias("best_q6"))
    pred = (
        scored.join(best, "doc_id")
        .where(F.col("score_q6") == F.col("best_q6"))
        .groupBy("doc_id")
        .agg(F.min("lang").alias("pred_lang"))
    )
    return (
        test.select("doc_id", F.col("lang").alias("actual_lang"))
        .join(pred, "doc_id")
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("actual_lang", "pred_lang")
    )


QUERIES["q154_naive_bayes"] = q154_naive_bayes

ORACLES["q154_naive_bayes"] = f"""
    WITH tr AS (
      SELECT * FROM documents WHERE (doc_id * 2654435761) % 100 < 80),
    te AS (
      SELECT * FROM documents WHERE (doc_id * 2654435761) % 100 >= 80),
    cnt AS (
      SELECT lang, tok, COUNT(*) AS c
      FROM (SELECT lang,
                   unnest(string_split({_nsql('text')}, ' '))
                     AS tok
            FROM tr)
      GROUP BY lang, tok),
    totals AS (SELECT lang, SUM(c) AS n_tok FROM cnt GROUP BY lang),
    vsize AS (SELECT COUNT(DISTINCT tok) AS v FROM cnt),
    pri AS (SELECT lang, COUNT(*) AS docs FROM tr GROUP BY lang),
    all_docs AS (SELECT SUM(docs) AS all_docs FROM pri),
    lang_stats AS (
      SELECT p.lang,
             CAST(round(ln(CAST(p.docs AS DOUBLE)
                           / CAST(a.all_docs AS DOUBLE))
                        * 1000000.0, 0) AS BIGINT) AS prior_q6,
             CAST(round(ln(1.0 / CAST(t.n_tok + v.v AS DOUBLE))
                        * 1000000.0, 0) AS BIGINT) AS oov_ll_q6,
             t.n_tok + v.v AS denom
      FROM pri p JOIN totals t ON p.lang = t.lang
      CROSS JOIN all_docs a CROSS JOIN vsize v),
    model AS (
      SELECT c.lang, c.tok,
             CAST(round(ln(CAST(c.c + 1 AS DOUBLE)
                           / CAST(s.denom AS DOUBLE))
                        * 1000000.0, 0) AS BIGINT) AS ll_q6
      FROM cnt c JOIN lang_stats s ON c.lang = s.lang),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf
      FROM (SELECT doc_id,
                   unnest(string_split({_nsql('text')}, ' '))
                     AS tok
            FROM te)
      GROUP BY doc_id, tok),
    scored AS (
      SELECT f.doc_id, s.lang,
             CAST(s.prior_q6
                  + SUM(f.tf * COALESCE(m.ll_q6, s.oov_ll_q6))
                  AS BIGINT) AS score_q6
      FROM tf f
      CROSS JOIN lang_stats s
      LEFT JOIN model m ON m.lang = s.lang AND m.tok = f.tok
      GROUP BY f.doc_id, s.lang, s.prior_q6),
    best AS (
      SELECT doc_id, MAX(score_q6) AS best_q6 FROM scored
      GROUP BY doc_id),
    pred AS (
      SELECT s.doc_id, MIN(s.lang) AS pred_lang
      FROM scored s JOIN best b
        ON s.doc_id = b.doc_id AND s.score_q6 = b.best_q6
      GROUP BY s.doc_id)
    SELECT te.lang AS actual_lang, p.pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM te JOIN pred p ON te.doc_id = p.doc_id
    GROUP BY te.lang, p.pred_lang
    ORDER BY actual_lang, pred_lang
"""
