"""Corpus-quality operators for training-data curation: repetition
filtering and TF-IDF document scoring over `documents`.

Both are classic pre-training pipeline stages (repetition fractions are
the Gopher/MassiveText-style quality signals; TF-IDF is the standard
salience weight) and both are pure relational/array compositions —
JVM-side, oracle-checkable, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.functions.text import tokens


def q74_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 25 most repetitive documents by duplicate-token fraction
    (ties → duplicate-bigram fraction, then doc_id): the repetition
    quality filter applied before a corpus enters training.

    dup_tok_frac = 1 - distinct_tokens/total_tokens;
    dup_bi_frac likewise over word bigrams.

    Scale: entirely map-only per document, with ZERO higher-order
    lambdas — bigrams are `arrays_zip` of two `slice`s of the token
    array (an array<struct> whose struct equality IS bigram equality),
    and distinct counts are native `array_distinct`; every expression
    stays in whole-stage codegen. (The first cut used the generic
    `word_shingles` transform-lambda and cost 19.5 s at sf0.1;
    this form runs in ~1 s — the interpreted-lambda tax, again.)
    The only cross-row step is the global top-25, which Spark executes
    as per-partition TakeOrderedAndProject + driver merge. Both
    fractions are plain IEEE divisions (bit-identical in DuckDB), so
    the result hash-matches without any rounding.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    n_tok = F.size("toks")
    blen = F.greatest(n_tok - 1, F.lit(0))
    # bigram i = (toks[i], toks[i+1]): struct equality == bigram equality
    bi = F.arrays_zip(
        F.slice("toks", 1, blen).alias("w1"),
        F.slice("toks", 2, blen).alias("w2"),
    )
    n_bi = F.size(bi)
    dup_tok = F.lit(1.0) - F.size(F.array_distinct("toks")) / n_tok
    dup_bi = F.when(n_bi <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(bi)) / n_bi
    )
    return (
        t.select(
            "doc_id",
            n_tok.alias("n_tokens"),
            dup_tok.alias("dup_tok_frac"),
            dup_bi.alias("dup_bi_frac"),
        )
        .orderBy(
            F.desc("dup_tok_frac"), F.desc("dup_bi_frac"), F.asc("doc_id")
        )
        .limit(25)
    )


def q75_tfidf_doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 highest-salience documents by summed TF-IDF:
    score(doc) = sum over distinct tokens of (tf/doc_len) * ln(N/df).

    Scale shape (the standard two-aggregation TF-IDF dataflow):
    - explode to (doc_id, tok) rows; shuffle 1 = groupBy(doc_id, tok)
      for tf, with map-side combine collapsing within-partition repeats;
    - df(tok) = count of the ALREADY-distinct (doc, tok) rows per tok
      (shuffle 2, on the token — the vocabulary, so partial agg makes
      each map task emit at most |vocab| rows);
    - join tf x df on tok (sort-merge on the same token partitioning),
      doc lengths ride along map-only (size of the token array, no
      extra shuffle), final groupBy(doc_id) re-aggregates to one row
      per document. N is a scalar (one count job, driver literal).
    No window functions anywhere; the top-20 is TakeOrderedAndProject.
    Scores are rounded to 6 decimals on both sides because ln() may
    differ by 1 ulp between JVM and libm.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar: one number to the driver
    base = d.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).select(
        "doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("tok")
    )
    tf = base.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )
    df_ = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(df_, "tok")
        .withColumn(
            "tfidf",
            (F.col("tf") / F.col("dl"))
            * F.log(F.lit(float(n_docs)) / F.col("df")),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("tfidf"), 6).alias("tfidf_sum"))
    )
    return scored.orderBy(F.desc("tfidf_sum"), F.asc("doc_id")).limit(20)


QUERIES = {
    "q74_repetition_filter": q74_repetition_filter,
    "q75_tfidf_doc_scores": q75_tfidf_doc_scores,
}

# Identical normalization to functions/text.py tokens(): lowercase,
# collapse whitespace, split on single spaces.
_TOK_CTE = """
        tok AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                              ' ') AS toks
          FROM documents)
"""

ORACLES = {
    "q74_repetition_filter": f"""
        WITH {_TOK_CTE},
        r AS (
          SELECT doc_id,
                 len(toks) AS n_tokens,
                 1.0 - len(list_distinct(toks)) * 1.0 / len(toks)
                   AS dup_tok_frac,
                 CASE WHEN len(toks) < 2 THEN 0.0
                      ELSE 1.0 - len(list_distinct(
                             list_transform(range(1, len(toks)),
                                            i -> toks[i] || ' ' || toks[i+1])))
                           * 1.0 / (len(toks) - 1)
                 END AS dup_bi_frac
          FROM tok)
        SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens,
               dup_tok_frac, dup_bi_frac
        FROM r
        ORDER BY dup_tok_frac DESC, dup_bi_frac DESC, doc_id ASC
        LIMIT 25
    """,
    "q75_tfidf_doc_scores": f"""
        WITH {_TOK_CTE},
        base AS (
          SELECT doc_id, len(toks) AS dl, unnest(toks) AS t FROM tok),
        tf AS (
          SELECT doc_id, t, COUNT(*) AS tf, ANY_VALUE(dl) AS dl
          FROM base GROUP BY doc_id, t),
        df AS (SELECT t, COUNT(*) AS df FROM tf GROUP BY t),
        n AS (SELECT COUNT(*) AS n_docs FROM documents)
        SELECT doc_id,
               ROUND(SUM((tf * 1.0 / dl) * ln(n_docs * 1.0 / df)), 6)
                 AS tfidf_sum
        FROM tf JOIN df USING (t) CROSS JOIN n
        GROUP BY doc_id
        ORDER BY tfidf_sum DESC, doc_id ASC
        LIMIT 20
    """,
}
