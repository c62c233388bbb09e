"""Count-based language-model curation: cross-source bigram-LM
perplexity filtering (the CCNet/KenLM quality signal) and DSIR
importance resampling (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling") — the two standard LM-driven
selection steps of a pretraining-data pipeline, built from EXACT
integer sufficient statistics so a DuckDB oracle replays every score.

Reference parity: the reference's pipeline moves records through
quality gates before the sink (`README.md:8-13` malformed-record
discipline); these are the content-level gates a 100 TB text corpus
adds on top.

Exactness conventions (the q110 lineage): every probability is a
ratio of exact integers quantized ONCE through round(ln(int/int)*1e6)
— one IEEE division + one libm ln per distinct count pair, SQL-ROUND
to an int64; per-doc sums of those ints are order-independent; only
human-facing ppl re-enters libm under ROUND 6. Stupid backoff's 0.4
factor stays exact as the integer ratio 2c/5N (and 4/25N for OOV), so
no branch ever multiplies two doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.functions.text import (
    normalize_sql,
    tokens,
    word_bigrams,
)

_EVAL_SOURCE = "src0"  # held-out source: scored, never trained on
_LM_SOURCE = "src1"  # the reference corpus the LM trains on (CCNet
#   trains its KenLM on Wikipedia, not on the crawl it filters); a
#   single-source model leaves ~19% of eval transitions unseen at
#   sf0.01, so the backoff branch is genuinely exercised and
#   cross-engine-verified (training on the whole rest of the corpus
#   saturated the bigram table: 0 backoffs, dead branch)
_Q = 1_000_000  # the q6 log-probability grid


def _lp_q6(num, den) -> F.Column:
    """round(ln(num/den) * 1e6) as bigint — ONE division of exact
    integer-valued columns, one ln, one SQL-ROUND."""
    return F.round(
        F.log(num.cast("double") / den.cast("double")) * F.lit(float(_Q)), 0
    ).cast("bigint")


def q207_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source bigram LM scoring with stupid backoff (Brants et
    al. 2007): train bigram/unigram counts on the src1
    reference corpus, score src0's docs token-transition by token-transition —
    the held-out-perplexity quality filter. Per transition (w1, w2):

        seen bigram:   lp = ln( c(w1 w2) / c(w1) )
        backoff:       lp = ln( 2*c(w2) / (5*N) )     # 0.4 * c/N
        OOV:           lp = ln( 4 / (25*N) )           # 0.4 * 0.4/N

    each quantized to the q6 integer grid, so the per-doc lp sum and
    the backoff/OOV tallies are exact ints; the 20 most surprising
    (lowest avg lp) docs emit with their perplexity.

    Scale shape: both LM count frames are groupBys with map-side
    combine (shuffle keyed by bigram / token — the LM's natural
    partitioning); scoring joins are plain equi-joins on those same
    keys (sort-merge; a pruned-vocab broadcast is the serving-time
    variant); N rides a 1-row broadcast crossJoin; the final top-20 is
    TakeOrderedAndProject. No windows, no collects, no lambdas —
    bigrams come from the codegen'd arrays_zip slices
    (functions/text.py::word_bigrams).
    """
    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("source") == _LM_SOURCE)
    evald = d.where(F.col("source") == _EVAL_SOURCE)
    scored = bigram_lm_score(train, evald)
    avg_lp = F.col("lp_sum_q6").cast("double") / (
        F.col("n_transitions") * F.lit(_Q)
    ).cast("double")
    return (
        scored.select(
            "doc_id",
            "n_transitions",
            "n_backoff",
            "n_oov",
            "lp_sum_q6",
            F.round(F.exp(-avg_lp), 6).alias("ppl"),
        )
        .orderBy(
            (F.col("lp_sum_q6").cast("double")
             / F.col("n_transitions").cast("double")),
            "doc_id",
        )
        .limit(20)
    )


def bigram_lm_score(train: DataFrame, evald: DataFrame) -> DataFrame:
    """Stupid-backoff bigram-LM scoring of ``evald`` docs under the
    counts of ``train`` (both frames: doc_id + text) — the reusable
    core of q207; returns per-doc (doc_id, n_transitions, n_backoff,
    n_oov, lp_sum_q6). All three probability branches are exact
    integer ratios quantized once (see module docstring)."""
    uni = (
        train.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c_u"))
        .localCheckpoint(eager=False)  # feeds N AND two score joins
    )
    n_total = uni.agg(F.sum("c_u").cast("decimal(38,0)").alias("n"))
    big = (
        train.select(F.explode(word_bigrams("text")).alias("p"))
        .groupBy(
            F.col("p.0").alias("w1"), F.col("p.1").alias("w2")
        )
        .agg(F.count(F.lit(1)).alias("c_b"))
    )

    ev = evald.select(
        "doc_id", F.explode(word_bigrams("text")).alias("p")
    ).select("doc_id", F.col("p.0").alias("w1"), F.col("p.1").alias("w2"))

    u1 = uni.select(F.col("tok").alias("w1"), F.col("c_u").alias("c_u1"))
    u2 = uni.select(F.col("tok").alias("w2"), F.col("c_u").alias("c_u2"))
    seen = F.col("c_b").isNotNull()
    boff = F.col("c_b").isNull() & F.col("c_u2").isNotNull()
    lp = (
        F.when(seen, _lp_q6(F.col("c_b"), F.col("c_u1")))
        .when(boff, _lp_q6(F.lit(2) * F.col("c_u2"), F.lit(5) * F.col("n")))
        .otherwise(_lp_q6(F.lit(4), F.lit(25) * F.col("n")))
    )
    scored = (
        ev.join(big, ["w1", "w2"], "left")
        .join(u1, "w1", "left")
        .join(u2, "w2", "left")
        .crossJoin(F.broadcast(n_total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum(boff.cast("long")).cast("bigint").alias("n_backoff"),
            F.sum(F.col("c_u2").isNull().cast("long"))
            .cast("bigint")
            .alias("n_oov"),
            F.sum(lp).cast("bigint").alias("lp_sum_q6"),
        )
    )
    return scored


def q208_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: re-weight the raw pool toward a
    TARGET distribution (here lang='en') with unigram-LM likelihood
    ratios, then draw an exact-k weight-proportional sample via the
    Gumbel-max form of Efraimidis-Spirakis — the data-selection step
    that shifts a corpus's composition toward a target domain without
    a trained classifier (Xie et al. 2023 §3, hashed-ngram features;
    unigram features here, same estimator).

    Per doc: logw = sum over tokens of [ ln p_T(tok) - ln p_R(tok) ],
    both Laplace-smoothed ( (c+1)/(N+V) with V = raw vocab size ) and
    q6-quantized, so logw is an exact int. Sampling key =
    logw_q6 - round(ln(-ln u)*1e6) with u the doc's portable md5
    uniform — the Gumbel-max form of the ES key u^(1/exp(logw)), with
    the one libm term quantized onto the SAME q6 integer grid so the
    whole key is an exact int64 and the top-k boundary is decided by
    integer comparison + doc_id tiebreak on both engines (a raw-double
    key could flip membership across libm implementations at a 1-ulp
    near-tie). Output: composition
    of the k=100 sample by language — the demonstrable effect (the
    target language's share grows) — with exact-integer evidence
    columns.

    Scale shape: one vocabulary-keyed groupBy per distribution
    (map-side combined), scoring join on the token key, per-doc
    groupBy, TakeOrderedAndProject(k) for the sample, 100-row
    summary agg. The doc never ships anywhere whole; only (doc_id,
    tok, tf) rows move.
    """
    from dataingestiontohana_spark.operators.sketches import _md5_int

    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", "lang", F.explode(tokens("text")).alias("tok"))
        .groupBy("doc_id", "lang", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)  # feeds both LMs AND the scoring
    )
    raw = tf.groupBy("tok").agg(F.sum("tf").alias("c_r"))
    tgt = (
        tf.where(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.sum("tf").alias("c_t"))
    )
    totals = raw.agg(
        F.sum("c_r").cast("decimal(38,0)").alias("n_r"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("v"),
    )
    n_t = tgt.agg(
        F.coalesce(F.sum("c_t"), F.lit(0)).cast("decimal(38,0)").alias("n_t")
    )

    lp_t = _lp_q6(
        F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1),
        F.col("n_t") + F.col("v"),
    )
    lp_r = _lp_q6(F.col("c_r") + F.lit(1), F.col("n_r") + F.col("v"))
    logw = (
        tf.join(raw, "tok")  # every corpus token is in raw: inner
        .join(tgt, "tok", "left")
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(n_t))
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(F.col("tf") * (lp_t - lp_r)).cast("bigint").alias("logw_q6"),
        )
    )
    u = (
        (_md5_int(F.col("doc_id").cast("string"), 208) + 1).cast("double")
        / F.lit(4294967297.0)
    )
    lnln_q6 = F.round(
        F.log(-F.log(u)) * F.lit(float(_Q)), 0
    ).cast("bigint")
    key = F.col("logw_q6") - lnln_q6  # exact int64 on both engines
    picked = (
        logw.select("doc_id", "lang", "n_tokens", "logw_q6", key.alias("k"))
        .orderBy(F.col("k").desc(), "doc_id")
        .limit(100)
    )
    return (
        picked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("sampled_docs"),
            F.sum("n_tokens").cast("long").alias("sampled_tokens"),
            F.sum("logw_q6").cast("long").alias("logw_q6_sum"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "q207_bigram_lm": q207_bigram_lm,
    "q208_dsir_resample": q208_dsir_resample,
}

from dataingestiontohana_spark.operators.sketches import (  # noqa: E402
    hex_uint_sql,
)

# the q208 doc uniform: DuckDB twin of _md5_int(doc_id, salt=208)
_U208 = hex_uint_sql("CAST(doc_id AS VARCHAR)", 208)

# tokenization CTE carrying source/lang (TOKENS_SQL_CTE drops them)
_TOK_SRC_CTE = f"""
    tok AS (
      SELECT doc_id, source, lang,
             string_split({normalize_sql('text')}, ' ') AS toks
      FROM documents)
"""

ORACLES = {
    "q207_bigram_lm": f"""
        WITH {_TOK_SRC_CTE},
        tr AS (SELECT * FROM tok WHERE source = '{_LM_SOURCE}'),
        uni AS (
          SELECT t2 AS tok, COUNT(*) AS c_u
          FROM (SELECT unnest(toks) AS t2 FROM tr) GROUP BY t2),
        n AS (SELECT CAST(SUM(c_u) AS HUGEINT) AS n FROM uni),
        big AS (
          SELECT split_part(bg, ' ', 1) AS w1,
                 split_part(bg, ' ', 2) AS w2, COUNT(*) AS c_b
          FROM (SELECT unnest(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])) AS bg
                FROM tr)
          GROUP BY 1, 2),
        ev AS (
          SELECT doc_id,
                 split_part(bg, ' ', 1) AS w1,
                 split_part(bg, ' ', 2) AS w2
          FROM (SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])) AS bg
                FROM tok WHERE source = '{_EVAL_SOURCE}')),
        scored AS (
          SELECT ev.doc_id,
                 COUNT(*) AS n_transitions,
                 SUM(CASE WHEN b.c_b IS NULL AND u2.c_u IS NOT NULL
                          THEN 1 ELSE 0 END) AS n_backoff,
                 SUM(CASE WHEN u2.c_u IS NULL THEN 1 ELSE 0 END) AS n_oov,
                 SUM(CASE
                   WHEN b.c_b IS NOT NULL THEN
                     CAST(round(ln(CAST(b.c_b AS DOUBLE)
                                   / CAST(u1.c_u AS DOUBLE))
                                * 1000000.0, 0) AS BIGINT)
                   WHEN u2.c_u IS NOT NULL THEN
                     CAST(round(ln(CAST(2 * u2.c_u AS DOUBLE)
                                   / CAST(5 * n.n AS DOUBLE))
                                * 1000000.0, 0) AS BIGINT)
                   ELSE
                     CAST(round(ln(CAST(4 AS DOUBLE)
                                   / CAST(25 * n.n AS DOUBLE))
                                * 1000000.0, 0) AS BIGINT)
                 END) AS lp_sum_q6
          FROM ev
          LEFT JOIN big b ON b.w1 = ev.w1 AND b.w2 = ev.w2
          LEFT JOIN uni u1 ON u1.tok = ev.w1
          LEFT JOIN uni u2 ON u2.tok = ev.w2
          CROSS JOIN n
          GROUP BY ev.doc_id)
        SELECT doc_id,
               CAST(n_transitions AS BIGINT) AS n_transitions,
               CAST(n_backoff AS BIGINT) AS n_backoff,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST(lp_sum_q6 AS BIGINT) AS lp_sum_q6,
               round(exp(-(CAST(lp_sum_q6 AS DOUBLE)
                           / CAST(n_transitions * 1000000 AS DOUBLE))), 6)
                 AS ppl
        FROM scored
        ORDER BY CAST(lp_sum_q6 AS DOUBLE) / CAST(n_transitions AS DOUBLE),
                 doc_id
        LIMIT 20
    """,
    "q208_dsir_resample": f"""
        WITH {_TOK_SRC_CTE},
        tf AS (
          SELECT doc_id, lang, t2 AS tok, COUNT(*) AS tf
          FROM (SELECT doc_id, lang, unnest(toks) AS t2 FROM tok)
          GROUP BY doc_id, lang, t2),
        raw AS (SELECT tok, SUM(tf) AS c_r FROM tf GROUP BY tok),
        tgt AS (SELECT tok, SUM(tf) AS c_t FROM tf
                WHERE lang = 'en' GROUP BY tok),
        tot AS (SELECT CAST(SUM(c_r) AS HUGEINT) AS n_r,
                       CAST(COUNT(*) AS HUGEINT) AS v
                FROM raw),
        nt AS (SELECT CAST(COALESCE(SUM(c_t), 0) AS HUGEINT) AS n_t
               FROM tgt),
        logw AS (
          SELECT tf.doc_id, tf.lang,
                 CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
                 CAST(SUM(tf.tf * (
                   CAST(round(ln(CAST(COALESCE(t.c_t, 0) + 1 AS DOUBLE)
                                 / CAST(nt.n_t + tot.v AS DOUBLE))
                              * 1000000.0, 0) AS BIGINT)
                   - CAST(round(ln(CAST(r.c_r + 1 AS DOUBLE)
                                   / CAST(tot.n_r + tot.v AS DOUBLE))
                                * 1000000.0, 0) AS BIGINT)
                 )) AS BIGINT) AS logw_q6
          FROM tf
          JOIN raw r ON r.tok = tf.tok
          LEFT JOIN tgt t ON t.tok = tf.tok
          CROSS JOIN tot CROSS JOIN nt
          GROUP BY tf.doc_id, tf.lang),
        picked AS (
          SELECT doc_id, lang, n_tokens, logw_q6,
                 logw_q6
                 - CAST(round(ln(-ln(({_U208} + 1) / 4294967297.0))
                              * 1000000.0, 0) AS BIGINT) AS k
          FROM logw
          ORDER BY k DESC, doc_id
          LIMIT 100)
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS sampled_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS sampled_tokens,
               CAST(SUM(logw_q6) AS BIGINT) AS logw_q6_sum,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
               CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
        FROM picked
        GROUP BY lang
        ORDER BY lang
    """,
}
