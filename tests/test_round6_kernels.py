"""Property tests for the round-6 statistical kernels: each closed
form the queries compute distributedly is pinned against a naive
independent implementation on randomized inputs (the q112/q146
convention — the SQL oracle proves cross-engine agreement; these prove
the MATH)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------- Gini


def _gini_naive(xs: list[int]) -> float:
    """Textbook O(n log n) definition: sorted ranks, (2*sum(i*x_i)
    - (n+1)*S) / (n*S)."""
    xs = sorted(xs)
    n, s = len(xs), sum(xs)
    if s == 0:
        return 0.0
    t = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * t - (n + 1) * s) / (n * s)


def _gini_grouped(xs: list[int]) -> float:
    """The q157 value-group formulation: 2T = sum over groups of
    rev * (2*c*p + c*(c+1)) with p the prior cumulative count."""
    from collections import Counter

    n, s = len(xs), sum(xs)
    if s == 0:
        return 0.0
    cnt = Counter(xs)
    p = 0
    t2 = 0
    for v in sorted(cnt):
        c = cnt[v]
        t2 += v * (2 * c * p + c * (c + 1))
        p += c
    return (t2 - (n + 1) * s) / (n * s)


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                max_size=300))
@settings(max_examples=200, deadline=None)
def test_gini_grouped_equals_naive(xs):
    assert _gini_grouped(xs) == pytest.approx(_gini_naive(xs), abs=1e-12)


@given(st.lists(st.integers(min_value=0, max_value=50), min_size=1,
                max_size=300))
@settings(max_examples=100, deadline=None)
def test_gini_bounds_and_tie_invariance(xs):
    g = _gini_grouped(xs)
    n = len(xs)
    assert -1e-12 <= g <= 1.0 - 1 / n + 1e-12 if sum(xs) else g == 0.0
    # permuting input cannot change the statistic (it sorts internally)
    assert _gini_grouped(list(reversed(xs))) == g


# ------------------------------------------------- top-decile overlap


@given(st.lists(st.integers(min_value=0, max_value=1000), min_size=1,
                max_size=200))
@settings(max_examples=100, deadline=None)
def test_top_decile_group_split_exact(xs):
    """The q157 straddling-group arithmetic take = clamp(cum-(n-k),0,c)
    recovers exactly the sum of the k largest values."""
    from collections import Counter

    n = len(xs)
    k = n // 10
    expected = sum(sorted(xs, reverse=True)[:k])
    cnt = Counter(xs)
    cum = 0
    got = 0
    for v in sorted(cnt):
        c = cnt[v]
        cum += c
        take = max(0, min(c, cum - (n - k)))
        got += v * take
    assert got == expected


# ------------------------------------------------------------ OLS 3x3


@given(st.data())
@settings(max_examples=120, deadline=None)
def test_cramer_ols_matches_numpy_lstsq(data):
    """The q156 Cramer closed form == numpy least squares whenever the
    normal matrix is well-conditioned."""
    n = data.draw(st.integers(min_value=8, max_value=60))
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    x1 = rng.integers(1, 50, n).astype(np.int64)
    x2 = rng.integers(0, 10, n).astype(np.int64)
    y = (
        1000 + 37 * x1 - 12 * x2
        + rng.integers(-50, 51, n).astype(np.int64)
    )
    sx1, sx2, sy = int(x1.sum()), int(x2.sum()), int(y.sum())
    sx11 = int((x1 * x1).sum())
    sx12 = int((x1 * x2).sum())
    sx22 = int((x2 * x2).sum())
    sx1y = int((x1 * y).sum())
    sx2y = int((x2 * y).sum())

    def det3(a1, a2, a3, b1, b2, b3, c1, c2, c3):
        return (a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1)
                + a3 * (b1 * c2 - b2 * c1))

    det = det3(n, sx1, sx2, sx1, sx11, sx12, sx2, sx12, sx22)
    if det == 0:
        return  # singular (e.g. constant column): the query emits 0.0
    b0 = det3(sy, sx1, sx2, sx1y, sx11, sx12, sx2y, sx12, sx22) / det
    b1 = det3(n, sy, sx2, sx1, sx1y, sx12, sx2, sx2y, sx22) / det
    b2 = det3(n, sx1, sy, sx1, sx11, sx1y, sx2, sx12, sx2y) / det
    A = np.column_stack([np.ones(n), x1, x2]).astype(np.float64)
    ref, *_ = np.linalg.lstsq(A, y.astype(np.float64), rcond=None)
    # relative to the coefficient scale; degenerate draws (near-
    # collinear x1/x2) are filtered by the integer det check above
    cond = np.linalg.cond(A.T @ A)
    if cond > 1e12:
        return
    assert np.allclose([b0, b1, b2], ref, rtol=1e-6, atol=1e-6)


# ----------------------------------------------------- KM risk table


def _km_naive(durs: list[tuple[int, bool]]):
    """Direct per-day risk accounting: n_risk(t) = #{dur >= t}."""
    days = sorted({d for d, _ in durs})
    out = []
    for t in days:
        d = sum(1 for dur, ev in durs if dur == t and ev)
        c = sum(1 for dur, ev in durs if dur == t and not ev)
        n_risk = sum(1 for dur, _ in durs if dur >= t)
        if d >= 1:
            out.append((t, d, c, n_risk))
    return out


def _km_cumulative(durs: list[tuple[int, bool]]):
    """The q155 formulation: N - cum_{s<t}(d_s + c_s)."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for dur, ev in durs:
        agg[dur][0 if ev else 1] += 1
    N = len(durs)
    prior = 0
    out = []
    for t in sorted(agg):
        d, c = agg[t]
        n_risk = N - prior
        prior += d + c
        if d >= 1:
            out.append((t, d, c, n_risk))
    return out


@given(st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.booleans()),
    min_size=1, max_size=200,
))
@settings(max_examples=200, deadline=None)
def test_km_risk_table_cumulative_equals_direct(durs):
    assert _km_cumulative(durs) == _km_naive(durs)


# ------------------------------------------------------- phrase index


@given(st.lists(st.sampled_from(["spark", "join", "scan", "a"]),
                min_size=1, max_size=40))
@settings(max_examples=200, deadline=None)
def test_phrase_postings_equal_direct_scan(tokens):
    """The q159 identity: position-offset posting intersection ==
    padded substring search, including first positions and counts."""
    text = " ".join(tokens)
    # postings path
    post = [(i, t) for i, t in enumerate(tokens)]
    hits = [i for i, t in post
            if t == "spark" and i + 1 < len(tokens) and tokens[i + 1] == "join"]
    # direct-scan path (the oracle's formulation)
    padded = f" {text} "
    found = padded.find(" spark join ")
    if hits:
        assert found >= 0
        prefix = text[: found]  # find() is 0-based on padded == 1-based-1
        assert prefix.count(" ") == hits[0]
        # occurrence count via token-list scan (the list_filter twin)
        assert len(hits) == sum(
            1 for i in range(len(tokens) - 1)
            if tokens[i] == "spark" and tokens[i + 1] == "join"
        )
    else:
        assert found < 0


# -------------------------------------------------- quantile-normalize


@given(st.data())
@settings(max_examples=100, deadline=None)
def test_quantile_normalize_rank_mapping(data):
    """The q163 target-rank lookup lands every source value on a real
    global value whose global quantile position is >= the source's:
    ceil-rank mapping is monotone and hits the max for the max."""
    src = data.draw(st.lists(st.integers(0, 100), min_size=1, max_size=50))
    other = data.draw(st.lists(st.integers(0, 100), min_size=0, max_size=50))
    glob = sorted(src + other)
    n_g, n_s = len(glob), len(src)
    out = []
    for r, v in enumerate(sorted(src), start=1):
        tr = -(-r * n_g // n_s)  # ceil
        out.append(glob[tr - 1])
    assert out == sorted(out)          # monotone in source rank
    assert out[-1] == glob[-1]         # max maps to the global max
    assert all(v in glob for v in out)  # only real global values
