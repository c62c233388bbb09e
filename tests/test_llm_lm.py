"""Bigram-LM scoring + DSIR resampling: hand-computed branch values
(incl. the OOV branch the synthetic corpus never reaches) and the
composition-shift property the resampler exists for."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataingestiontohana_spark.plans.llm_lm import (
    QUERIES,
    bigram_lm_score,
)


def _q6(x: float) -> int:
    # SQL-ROUND half away from zero, like both engines
    v = x * 1_000_000
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def test_all_three_lm_branches_hand_computed(spark):
    """Train 'a b a c', score 'a b z b': transition (a,b) is a seen
    bigram, (b,z) is OOV (z unseen anywhere), (z,b) backs off to the
    unigram — every CASE branch fires and matches the hand-quantized
    stupid-backoff values."""
    train = spark.createDataFrame(
        [(100, "a b a c")], "doc_id long, text string"
    )
    evald = spark.createDataFrame(
        [(1, "a b z b")], "doc_id long, text string"
    )
    row = bigram_lm_score(train, evald).collect()[0]
    assert row["n_transitions"] == 3
    assert row["n_backoff"] == 1  # (z, b): unseen bigram, seen unigram
    assert row["n_oov"] == 1  # (b, z): z not in the training vocab

    n = 4  # training tokens: a b a c
    lp_seen = _q6(math.log((1) / 2))  # c('a b')=1, c('a')=2
    lp_oov = _q6(math.log(4 / (25 * n)))  # (b, z)
    lp_backoff = _q6(math.log((2 * 1) / (5 * n)))  # (z, b): c('b')=1
    assert row["lp_sum_q6"] == lp_seen + lp_oov + lp_backoff


def test_q207_backoff_exercised_on_corpus(spark):
    """The declared query must actually take the backoff branch on the
    driver corpus (a dead branch is an unverified branch)."""
    rows = QUERIES["q207_bigram_lm"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    assert sum(r["n_backoff"] for r in rows) > 0
    assert all(r["ppl"] > 0 for r in rows)


def test_dsir_shifts_composition_toward_target(spark):
    """The resampled 100 docs must over-represent the target language
    relative to its corpus share — DSIR's defining property."""
    sf = "/root/testdata/sf0.001"
    from dataingestiontohana_spark.catalog import load_table

    d = load_table(spark, sf, "documents")
    total = d.count()
    en = d.where(F.col("lang") == "en").count()
    sampled = {
        r["lang"]: r["sampled_docs"]
        for r in QUERIES["q208_dsir_resample"](spark, sf).collect()
    }
    assert sum(sampled.values()) == 100
    assert sampled.get("en", 0) / 100 > en / total


def test_q214_extraction_contract_holds_and_survives_markup(spark, tmp_path):
    """The q214 invariant the oracle sweep alone cannot pin (both
    twins could break identically): every document recovers verbatim
    and no script payload leaks — including documents containing
    angle brackets and ampersands, which the HTML-escaping embed must
    carry through the tag stripper losslessly."""
    from dataingestiontohana_spark.plans.llm_text2 import QUERIES as Q2

    rows = Q2["q214_html_extract"](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert all(r["recovered"] == 1 for r in rows)
    assert all(r["junk_leaks"] == 0 for r in rows)
    assert all(0 < r["boilerplate_ratio"] < 1 for r in rows)

    # adversarial corpus: markup characters and uppercase INSIDE text
    base = tmp_path / "docs"
    hard = [
        (1, "The Fast <b>KEY</b> order & sort x > y", "en", "srcA", 0),
        (2, "plain words only here", "en", "srcA", 0),
        (3, "a < b && c >= d <script>not a tag</script>", "en", "srcB", 0),
    ]
    spark.createDataFrame(
        hard,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(base / "documents.parquet"))
    got = {r["doc_id"]: r for r in
           Q2["q214_html_extract"](spark, str(base)).collect()}
    assert all(g["recovered"] == 1 for g in got.values()), got
    assert all(g["junk_leaks"] == 0 for g in got.values())
