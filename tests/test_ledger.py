"""The q181 reflection closed form vs the literal applyInPandas clamp
recursion: row-identical per user, plus a pure-python check that the
reflection identity itself is the right algebra (randomized deltas).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dataingestiontohana_spark.operators.ledger import clamped_wallet_per_user
from dataingestiontohana_spark.plans.relational import _q181_per_user, _t

SF0001 = "/root/testdata/sf0.001"


def _delta_rows(spark):
    e = _t(spark, SF0001, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    delta = F.when(
        F.col("event_type").isin("purchase", "error"), -cents
    ).otherwise(cents)
    return e.select("user_id", "ts", "event_id", delta.alias("delta"))


def test_kernel_matches_closed_form(spark):
    closed = {
        r["user_id"]: (r["n_events"], r["n_clamps"], r["final_cents"])
        for r in _q181_per_user(spark, SF0001).collect()
    }
    loop = {
        r["user_id"]: (r["n_events"], r["n_clamps"], r["final_cents"])
        for r in clamped_wallet_per_user(_delta_rows(spark)).collect()
    }
    assert closed == loop
    assert len(closed) > 0


def test_reflection_identity_pure_python():
    rng = random.Random(181)
    for _ in range(200):
        deltas = [rng.randint(-50, 40) for _ in range(rng.randint(1, 60))]
        stock, clamps = 0, 0
        for d in deltas:
            nxt = stock + d
            if nxt < 0:
                nxt, clamps = 0, clamps + 1
            stock = nxt
        prefix = []
        s = 0
        for d in deltas:
            s += d
            prefix.append(s)
        m = min(0, min(prefix))
        assert stock == prefix[-1] - m
        n_clamps = 0
        m_prev = 0
        for p in prefix:
            if p < m_prev:
                n_clamps += 1
            m_prev = min(m_prev, p)
        assert clamps == n_clamps


def test_capped_variant_differs_when_cap_binds(spark):
    """The cap branch is the no-closed-form territory the kernel
    exists for — with a tiny cap it must clamp MORE than the
    floor-only run."""
    base = clamped_wallet_per_user(_delta_rows(spark))
    capped = clamped_wallet_per_user(_delta_rows(spark), cap=100)
    b = sum(r["n_clamps"] for r in base.collect())
    c = sum(r["n_clamps"] for r in capped.collect())
    assert c > b
