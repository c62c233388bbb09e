"""Planted-frame tests for the event-sequence analytics (q106 Markov
transitions, q107 hourly autocorrelation) — contracts the oracle sweep
proves engine-agreement for, pinned here on fixtures where the right
answer is computable by hand.
"""

from __future__ import annotations

import datetime as dt

from dataingestiontohana_spark.plans.relational import (
    _autocorr_frame,
    _transition_frame,
)

_SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string"
_T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, _T0 + dt.timedelta(minutes=m), u, t) for i, (m, u, t) in enumerate(rows)],
        _SCHEMA,
    )


class TestMarkovTransitions:
    def test_transitions_never_cross_user_boundary(self, spark):
        # user 1: a->b; user 2: c->d, interleaved in time. A global
        # (non-per-user) lead would fabricate b->c.
        e = _ev(spark, [(0, 1, "a"), (1, 2, "c"), (2, 1, "b"), (3, 2, "d")])
        rows = {(r.src, r.dst): r.cnt for r in _transition_frame(e).collect()}
        assert rows == {("a", "b"): 1, ("c", "d"): 1}

    def test_simultaneous_events_order_by_event_id(self, spark):
        # two events at the SAME minute: event_id breaks the tie, so
        # the sequence is a->b->c deterministically.
        e = _ev(spark, [(0, 1, "a"), (1, 1, "b"), (1, 1, "c")])
        rows = {(r.src, r.dst): r.cnt for r in _transition_frame(e).collect()}
        assert rows == {("a", "b"): 1, ("b", "c"): 1}

    def test_probabilities_sum_to_one_per_source(self, spark):
        e = _ev(
            spark,
            [(0, 1, "a"), (1, 1, "b"), (2, 1, "a"), (3, 1, "c"), (4, 1, "a")],
        )
        out = _transition_frame(e).collect()
        by_src: dict[str, float] = {}
        for r in out:
            by_src[r.src] = by_src.get(r.src, 0.0) + r.prob
            assert r.src_total >= r.cnt
        assert all(abs(p - 1.0) < 1e-12 for p in by_src.values())


class TestHourlyAutocorr:
    def test_alternating_series_is_perfectly_anticorrelated(self, spark):
        # hourly counts 3,1,3,1,... -> lag-1 r == -1.0 EXACTLY (the
        # sufficient-statistics form divides exact integers)
        rows = []
        for h in range(8):
            for k in range(3 if h % 2 == 0 else 1):
                rows.append((h * 60 + k, 1, "x"))
        out = _autocorr_frame(_ev(spark, rows)).collect()
        assert len(out) == 1
        assert out[0].r1 == -1.0
        assert out[0].pairs == 7
        # sum over the x side of the 7 pairs: hours 0..6 = 3+1+3+1+3+1+3
        assert out[0].sum_x == 15

    def test_constant_series_guards_to_zero(self, spark):
        rows = [(h * 60, 1, "x") for h in range(5)]
        out = _autocorr_frame(_ev(spark, rows)).collect()
        assert out[0].r1 == 0.0

    def test_gap_hours_pair_across_the_gap(self, spark):
        # observed hours 0,1,5 (gap 2-4): pairs are (h0,h1) and
        # (h1,h5) — 2 pairs, not 1; the series is OBSERVED hours.
        rows = [(0, 1, "x"), (5, 1, "x"), (65, 1, "x"), (300, 1, "x")]
        out = _autocorr_frame(_ev(spark, rows)).collect()
        assert out[0].pairs == 2
