"""Training-mix governance queries: the sampling-weight / split /
leakage layer a large-scale LLM data pipeline runs AFTER curation —
which sources to sample at what rate (temperature-weighted mixture),
how to assign deterministic train/val/test splits, and whether
near-duplicates leak across the split boundary.

Reference context: the reference (a tutorial ingest pipeline,
`/root/reference/README.md:16-65`) stops at landing rows; these
queries cover the governance a training corpus needs on top, in the
same oracle-adjudicated discipline as the dedup/quality families.

Shared conventions: token counts are whitespace tokens of the
normalized text (`functions/text.py::tokens`, single source of the
SQL twin); libm terms (exp/ln) quantize to q6 INTEGERS before any
cross-row arithmetic (the q149 fold-order-immune convention, ln per
the q75 libm precedent); hash splits reuse the md5 nibble
reconstruction of `operators/sketches.py::hex_uint_sql`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table
from dataingestiontohana_spark.functions.text import normalize_sql, tokens
from dataingestiontohana_spark.operators.sketches import hex_uint_sql

QUERIES: dict = {}
ORACLES: dict = {}

# Mixture temperature: alpha < 1 upsamples small sources (the
# multilingual-corpus convention popularized by multilingual BERT /
# XLM; alpha = 0.7 is the common published setting).
_ALPHA = 0.7
# Token budget for effective-epoch reporting: 2x the corpus (a typical
# "train for ~2 epochs of the mixture" plan).
_BUDGET_X = 2

def _tokens_per_doc_cte(extra_cols: str = "") -> str:
    """per_doc CTE: one row per document with its whitespace token
    count — composed from the canonical ``normalize_sql`` so the SQL
    twin can never drift from ``tokens()``."""
    return f"""
    per_doc AS (
      SELECT doc_id, source{extra_cols},
             CAST(len(string_split({normalize_sql('text')}, ' '))
                  AS BIGINT) AS n_tokens
      FROM documents)
"""


def q201_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted sampling mixture over sources: per source,
    doc/token counts, the natural share, the alpha=0.7 temperature
    weight w_i = t_i^alpha / sum_j t_j^alpha, and the effective epochs
    each source runs at a 2x-corpus token budget (small sources > 1 —
    the upsampling the temperature exists to produce).

    Relation to q143_temperature_mix: q143 DERIVES per-language keep
    targets from doc counts at alpha=0.5 and executes the downsample;
    this query is the PLANNING artifact — continuous TOKEN-weighted
    sampling probabilities plus the epoch/repetition forecast a
    training-run config consumes (weights say how often to DRAW from a
    source per token, not which rows to drop).

    Exactness: counts are int64; t_i^alpha = exp(alpha * ln t_i) is
    the one libm term and quantizes to a q6 INTEGER immediately
    (round half-up, identical for positives in both engines) so the
    normalizing SUM is exact integer arithmetic, fold-order-immune;
    shares/weights/epochs are then single divisions of exact integers
    rounded at 6.

    Scale shape: one documents scan reduced map-side to |sources|
    rows; corpus totals re-aggregate THAT frame (lazy localCheckpoint
    prevents a second scan) and broadcast-attach as a 1-row literal.
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = (
        d.select("source", F.size(tokens(F.col("text"))).alias("nt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "t6",
            F.round(
                F.exp(
                    F.lit(_ALPHA) * F.log(F.col("n_tokens").cast("double"))
                )
                * 1e6,
                0,
            ).cast("long"),
        )
        .localCheckpoint(eager=False)
    )
    totals = per_src.agg(
        F.sum("n_tokens").cast("long").alias("tot_tokens"),
        F.sum("t6").cast("long").alias("tot_t6"),
    )
    j = per_src.join(F.broadcast(totals))
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return j.select(
        "source",
        "n_docs",
        "n_tokens",
        r6(F.col("n_tokens").cast("double") / F.col("tot_tokens")).alias(
            "nat_share"
        ),
        r6(F.col("t6").cast("double") / F.col("tot_t6")).alias(
            "temp_weight"
        ),
        # epochs_i = budget * w_i / tokens_i, all factors exact ints:
        # identical IEEE expression structure on both sides
        r6(
            (
                F.lit(float(_BUDGET_X)) * F.col("tot_tokens").cast("double")
                * F.col("t6").cast("double")
            )
            / (F.col("tot_t6").cast("double") * F.col("n_tokens").cast("double"))
        ).alias("eff_epochs"),
    ).orderBy("source")


QUERIES["q201_mixture_weights"] = q201_mixture_weights

ORACLES["q201_mixture_weights"] = f"""
    WITH {_tokens_per_doc_cte()},
    per_src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             CAST(ROUND(exp({_ALPHA} * ln(CAST(SUM(n_tokens) AS DOUBLE)))
                        * 1e6, 0) AS BIGINT) AS t6
      FROM per_doc GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
             CAST(SUM(t6) AS BIGINT) AS tot_t6
      FROM per_src)
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / tot_tokens, 6) AS nat_share,
           ROUND(CAST(t6 AS DOUBLE) / tot_t6, 6) AS temp_weight,
           ROUND((CAST({float(_BUDGET_X)} AS DOUBLE)
                  * CAST(tot_tokens AS DOUBLE) * CAST(t6 AS DOUBLE))
                 / (CAST(tot_t6 AS DOUBLE) * CAST(n_tokens AS DOUBLE)),
                 6) AS eff_epochs
    FROM per_src CROSS JOIN tot
    ORDER BY source
"""


# Deterministic split assignment: bucket = md5('split:' || doc_id)
# first 8 hex nibbles as uint % 100. Content-independent (re-curating
# text never moves a doc across splits), engine-portable (md5 is
# byte-identical; the nibble reconstruction is hex_uint_sql's).
_SPLIT_SALT = "split"


def _split_col(id_col):
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{_SPLIT_SALT}:"), id_col.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    return (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def _split_sql(id_expr: str) -> str:
    b = f"(({hex_uint_sql(f'CAST({id_expr} AS VARCHAR)', _SPLIT_SALT)}) % 100)"
    return (
        f"CASE WHEN {b} < 90 THEN 'train' "
        f"WHEN {b} < 95 THEN 'val' ELSE 'test' END"
    )


def q202_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by id hash, with
    the per-split composition report (docs, tokens, distinct langs and
    sources) a release gate checks before shipping a corpus version.

    Relation to q57_hash_split: q57 reports char-level stats of an
    80/10/10 assignment; this query is the TOKEN-level composition +
    diversity report AND the single source of the split expression
    (`_split_col`/`_split_sql`) that q203's leakage audit labels pairs
    with — assignment and audit can never disagree on membership.

    Exactness: split membership is pure integer md5 arithmetic —
    identical in any engine, stable under re-runs and text edits;
    all stats are int64.

    Scale shape: the split key is a map-only projection (no shuffle to
    ASSIGN splits — the groupBy here is only the 3-row report);
    distinct counts re-aggregate the (split, lang/source) reduced
    frames.
    """
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(
            _split_col(F.col("doc_id")).alias("split"),
            F.size(tokens(F.col("text"))).alias("nt"),
            "lang",
            "source",
        )
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("nt").cast("long").alias("n_tokens"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("split")
    )


QUERIES["q202_hash_split"] = q202_hash_split

ORACLES["q202_hash_split"] = f"""
    WITH {_tokens_per_doc_cte(", lang")}
    SELECT {_split_sql("doc_id")} AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM per_doc
    GROUP BY 1 ORDER BY 1
"""


def q203_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split near-dup leakage audit: how many exact-Jaccard>=0.5
    near-duplicate pairs STRADDLE a split boundary (a test doc whose
    near-twin sits in train is benchmark contamination by another
    name). Reports every split-pair cell with its leaking-pair count —
    the release gate consumes the off-diagonal cells.

    Exactness: the pair set is the exact prefix-filtered PPJoin (q32's
    edge set, shared lazily-checkpointed frame); split labels are the
    q202 integer md5 arithmetic; cells are int64 counts over
    lexicographically-ordered (split_lo, split_hi) keys, so (train,
    test) and (test, train) pairs land in ONE deterministic cell.

    Scale shape: the edge frame is |near-dup pairs| (already bounded
    by the PPJoin's filters); split labels attach map-only to each
    side; one tiny <=6-row aggregate.
    """
    from dataingestiontohana_spark.plans.llm_dedup import _exact_pairs_cached

    pairs = _exact_pairs_cached(spark, sf_dir, 0.5).select("id_a", "id_b")
    sa = _split_col(F.col("id_a"))
    sb = _split_col(F.col("id_b"))
    return (
        pairs.select(
            F.least(sa, sb).alias("split_lo"),
            F.greatest(sa, sb).alias("split_hi"),
        )
        .groupBy("split_lo", "split_hi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        .orderBy("split_lo", "split_hi")
    )


QUERIES["q203_split_leakage"] = q203_split_leakage


def _leakage_sql() -> str:
    from dataingestiontohana_spark.plans.llm_dedup import _EXACT_PAIRS_SQL

    sa, sb = _split_sql("id_a"), _split_sql("id_b")
    return f"""
    WITH pairs AS (SELECT id_a, id_b FROM ({_EXACT_PAIRS_SQL}))
    SELECT LEAST({sa}, {sb}) AS split_lo,
           GREATEST({sa}, {sb}) AS split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY 1, 2 ORDER BY 1, 2
"""


ORACLES["q203_split_leakage"] = _leakage_sql()
