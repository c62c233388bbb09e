"""Property and invariant tests for the seventh-session kernels:
the tie-corrected AUC rank-sum identity, Cohen's kappa algebra, the
attribution credit-conservation law, quintile balance, and the
effective-corpus-size bounds. Pure-python twins are checked against
brute force with hypothesis; Spark invariants run on sf0.001.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"


# ---------- pure-python twins -------------------------------------


def _auc_ranksum(pairs: list[tuple[int, int]]) -> Fraction:
    """(score, label) rows -> AUC via the tie-corrected rank-sum
    identity, exactly as plans/sampling.q173_roc_auc computes it:
    2*R_pos sums (min_rank + max_position) over positive rows."""
    n = len(pairs)
    by_score: dict[int, list[int]] = {}
    for s, y in pairs:
        by_score.setdefault(s, []).append(y)
    r2_pos = 0
    seen = 0
    for s in sorted(by_score):
        grp = by_score[s]
        g = len(grp)
        min_rank = seen + 1
        max_pos = seen + g
        r2_pos += sum(grp) * (min_rank + max_pos)
        seen += g
    n_pos = sum(y for _, y in pairs)
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return Fraction(1, 2)
    two_u = r2_pos - n_pos * (n_pos + 1)
    return Fraction(two_u, 2 * n_pos * n_neg)


def _auc_bruteforce(pairs: list[tuple[int, int]]) -> Fraction:
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if not pos or not neg:
        return Fraction(1, 2)
    num = 0
    for p in pos:
        for q in neg:
            if p > q:
                num += 2
            elif p == q:
                num += 1
    return Fraction(num, 2 * len(pos) * len(neg))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 1)),
        min_size=1,
        max_size=60,
    )
)
def test_auc_ranksum_equals_bruteforce(pairs):
    assert _auc_ranksum(pairs) == _auc_bruteforce(pairs)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 1)),
        min_size=2,
        max_size=60,
    )
)
def test_auc_bounds_and_separation(pairs):
    a = _auc_ranksum(pairs)
    assert Fraction(0) <= a <= Fraction(1)
    # perfectly separated: every positive strictly above every negative
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    if pos and neg and min(pos) > max(neg):
        assert a == 1


def _kappa(n11: int, n10: int, n01: int, n00: int) -> Fraction | None:
    n = n11 + n10 + n01 + n00
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    den = n * n - chance
    if den == 0:
        return None
    return Fraction(n * (n11 + n00) - chance, den)


@settings(max_examples=200, deadline=None)
@given(st.tuples(*[st.integers(0, 40)] * 4))
def test_kappa_algebra(cell):
    n11, n10, n01, n00 = cell
    k = _kappa(n11, n10, n01, n00)
    if k is None:
        return
    # the integer form equals the textbook po/pe form exactly
    n = sum(cell)
    po = Fraction(n11 + n00, n)
    pe = Fraction((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00), n * n)
    assert k == (po - pe) / (1 - pe)
    assert k <= 1
    # perfect agreement has kappa 1 (unless pe == 1, filtered above)
    if n10 == 0 and n01 == 0:
        assert k == 1


# ---------- Spark invariants on sf0.001 ---------------------------


def test_q182_credit_conservation(spark):
    """Both attribution models conserve credit: totals stay within
    floor loss (one micro-unit per contributing row) of the
    attributed purchase volume, and never exceed it."""
    from dataingestiontohana_spark.plans.relational import (
        QUERIES as RQ,
        _t,
    )

    out = RQ["q182_position_decay_attribution"](spark, SF0001).collect()
    u_total = sum(r["ushape_q6"] for r in out)
    d_total = sum(r["decay_q6"] for r in out)
    # attributed purchases = purchases with >= 1 trailing touch;
    # recompute the bound independently
    e = _t(spark, SF0001, "events")
    d = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
    t = (
        e.where(F.col("event_type") != "purchase")
        .select("user_id", d.alias("td"))
        .distinct()
    )
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", d.alias("pd")
    )
    attributed = (
        p.join(
            t,
            (p.user_id == t.user_id)
            & (F.col("td") <= F.col("pd"))
            & (F.col("td") >= F.col("pd") - 6),
            "left_semi",
        ).count()
    )
    cap = attributed * 1_000_000
    for total in (u_total, d_total):
        assert total <= cap
        assert total >= cap - cap // 1000  # floor loss is tiny


def test_q175_quintiles_balanced(spark):
    from dataingestiontohana_spark.plans.sampling import QUERIES as SQ

    rows = SQ["q175_rfm_segments"](spark, SF0001).collect()
    for tile_col in ("r_tile", "f_tile", "m_tile"):
        per_tile: dict[int, int] = {}
        for r in rows:
            per_tile[r[tile_col]] = per_tile.get(r[tile_col], 0) + r["n_customers"]
        sizes = [per_tile[t] for t in sorted(per_tile)]
        assert len(sizes) == 5
        assert max(sizes) - min(sizes) <= 1  # the exact NTILE law


def test_q183_row_shares_sum_to_one(spark):
    from dataingestiontohana_spark.plans.sampling import QUERIES as SQ

    rows = SQ["q183_segment_migration"](spark, SF0001).collect()
    by_from: dict[int, float] = {}
    for r in rows:
        by_from[r["from_tile"]] = by_from.get(r["from_tile"], 0.0) + r["row_share"]
    for s in by_from.values():
        assert abs(s - 1.0) < 1e-3  # ROUND(.,4) per cell


def test_q187_effective_never_exceeds_total(spark):
    from dataingestiontohana_spark.plans.llm_dedup import QUERIES as DQ

    row = DQ["q187_effective_corpus_size"](spark, SF0001).collect()[0]
    assert row["effective_tokens_q6"] <= row["total_tokens"] * 1_000_000
    assert 0.0 < row["effective_frac"] <= 1.0
