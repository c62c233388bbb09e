"""Sequential ledger kernels over per-key event histories.

The engine's query path (plans/relational._q181_per_user) computes the
zero-floor wallet with the reflection closed form — two partitioned
windows, all codegen. This module keeps the LITERAL recursion

    stock_t = max(0, stock_{t-1} + delta_t)

as an Arrow-batched applyInPandas kernel, for two reasons: (1) it is
the proof twin — tests/test_ledger.py asserts the closed form and the
loop agree row for row; (2) ledgers with rules the closed form cannot
absorb (an upper CAP as well as a floor, per-step fees, expiry) have
no reflection identity, and this kernel is the template they extend.

Scale shape: groupBy(key).applyInPandas shuffles once on the key and
hands each group to pandas as one Arrow batch — per-group work is
events-per-key sized (the sessionization bound), nothing sequential
ever crosses keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def clamped_wallet_per_user(
    rows: DataFrame,
    key: str = "user_id",
    order: tuple[str, str] = ("ts", "event_id"),
    delta: str = "delta",
    cap: int | None = None,
) -> DataFrame:
    """Per-key (n_events, n_clamps, final_cents) by literally running
    the clamp recursion in event order. ``cap`` adds an upper bound
    (stock <= cap) — the variant with NO closed form; the default
    cap=None matches the reflection-form query exactly.
    """
    import pandas as pd

    o1, o2 = order

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values([o1, o2], kind="mergesort")
        stock = 0
        clamps = 0
        for d in pdf[delta].astype("int64"):
            nxt = stock + int(d)
            if nxt < 0:
                nxt = 0
                clamps += 1
            if cap is not None and nxt > cap:
                nxt = cap
                clamps += 1
            stock = nxt
        return pd.DataFrame(
            {
                key: [pdf[key].iloc[0]],
                "n_events": [len(pdf)],
                "n_clamps": [clamps],
                "final_cents": [stock],
            }
        )

    key_type = rows.schema[key].dataType.simpleString()
    schema = (
        f"{key} {key_type}, n_events long, n_clamps long, "
        "final_cents long"
    )
    return rows.groupBy(key).applyInPandas(kernel, schema)
