"""Property tests for the cross-engine closed forms introduced with
q146/q150/q152 — each pinned against an INDEPENDENT pure-python
implementation (datetime for calendars, sorted lists for percentiles),
so a wrong anchor or an off-by-one in the SQL-portable arithmetic
fails here even though both engines would agree with each other.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

MONDAY0 = dt.date(1992, 1, 6)  # the q150 anchor — a Monday


def g(i: int) -> int:
    """Weekdays in [MONDAY0, MONDAY0 + i days) — the q150 closed form
    (floor/pmod semantics, mirrored verbatim in Spark and DuckDB)."""
    return 5 * (i // 7) + min(i % 7, 5)


def bdays_closed_form(a: dt.date, b: dt.date) -> int:
    ia = (a - MONDAY0).days
    ib = (b - MONDAY0).days
    return g(ib) - g(ia)


def bdays_reference(a: dt.date, b: dt.date) -> int:
    """Independent oracle: literally count weekdays day by day."""
    if b < a:
        return -bdays_reference(b, a)
    n, d = 0, a
    while d < b:
        if d.weekday() < 5:
            n += 1
        d += dt.timedelta(days=1)
    return n


@settings(max_examples=300, deadline=None)
@given(
    st.dates(min_value=dt.date(1991, 1, 1), max_value=dt.date(2005, 12, 31)),
    st.integers(min_value=0, max_value=400),
)
def test_business_day_closed_form_matches_calendar(start, span):
    end = start + dt.timedelta(days=span)
    assert bdays_closed_form(start, end) == bdays_reference(start, end)


def test_anchor_is_a_monday():
    assert MONDAY0.weekday() == 0


def pct_disc(values: list[int], q_num: int, q_den: int) -> int:
    """The q146/q152 inverse-ECDF pick re-derived from the reduced
    (value, count) distribution — smallest value whose cumulative
    count reaches ceil(q * N)."""
    from collections import Counter

    dist = sorted(Counter(values).items())
    n = len(values)
    need = (n * q_num + q_den - 1) // q_den
    cum = 0
    for v, c in dist:
        cum += c
        if cum >= need:
            return v
    raise AssertionError("unreachable for q <= 1")


@settings(max_examples=300, deadline=None)
@given(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=80),
    st.sampled_from([(50, 100), (90, 100), (99, 100), (25, 100), (1, 100)]),
)
def test_inverse_ecdf_matches_sorted_indexing(values, q):
    """SQL-standard PERCENTILE_DISC: the element at 1-based rank
    ceil(q*N) of the sorted multiset."""
    q_num, q_den = q
    n = len(values)
    rank = max(1, (n * q_num + q_den - 1) // q_den)
    expected = sorted(values)[rank - 1]
    assert pct_disc(values, q_num, q_den) == expected
