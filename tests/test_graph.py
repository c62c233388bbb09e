"""Planted-structure invariants for the graph plan (q141) and the
survivorship plan (q142) — semantics the SQL-oracle hash match cannot
isolate on organic data (e.g. "a hub never inflates the count",
"orientation counts each triangle exactly once at its lowest-rank
corner", "most-recent-wins breaks date ties by key").
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataingestiontohana_spark.plans.graph import (
    MIN_COOCCUR,
    q141_triangle_count,
)


def _write_lineitem(tmp_path, orders: list[list[int]]) -> str:
    """Materialize a minimal lineitem parquet whose per-order supplier
    sets are the given lists; every order is replicated MIN_COOCCUR
    times (distinct orderkeys) so each co-occurring pair crosses the
    edge threshold exactly once per conceptual order."""
    okeys, skeys = [], []
    k = 0
    for suppliers in orders:
        for _rep in range(MIN_COOCCUR):
            for s in suppliers:
                okeys.append(k)
                skeys.append(s)
            k += 1
    t = pa.table(
        {
            "l_orderkey": pa.array(okeys, pa.int64()),
            "l_suppkey": pa.array(skeys, pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    return str(tmp_path)


def _census(spark, sf_dir):
    [row] = q141_triangle_count(spark, sf_dir).collect()
    return row


def test_planted_clique_plus_path(spark, tmp_path):
    # K4 on {1,2,3,4} plus path 4-5, 5-6:
    # edges 6+2=8, triangles C(4,3)=4,
    # wedges sum C(d,2) for degrees [3,3,3,4,2,1] = 3+3+3+6+1+0 = 16
    sf = _write_lineitem(tmp_path, [[1, 2, 3, 4], [4, 5], [5, 6]])
    r = _census(spark, sf)
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (6, 8, 4, 16)
    assert r.gcc == pytest.approx(3 * 4 / 16, abs=1e-9)


def test_triangle_free_star_hub(spark, tmp_path):
    # A star (hub 1 with 6 leaves, each co-order containing only the
    # hub pair) is triangle-free no matter the hub degree — the
    # degree-ordered orientation must not fabricate closures, and the
    # hub's wedges stay on the count-only side.
    sf = _write_lineitem(
        tmp_path, [[1, leaf] for leaf in range(2, 8)]
    )
    r = _census(spark, sf)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (7, 6, 0)
    assert r.n_wedges == 15  # C(6,2) at the hub
    assert r.gcc == 0.0


def test_two_disjoint_triangles_count_once_each(spark, tmp_path):
    sf = _write_lineitem(tmp_path, [[1, 2, 3], [7, 8, 9]])
    r = _census(spark, sf)
    assert (r.n_nodes, r.n_edges, r.n_triangles, r.n_wedges) == (6, 6, 2, 6)
    assert r.gcc == 1.0


def test_below_threshold_pairs_form_no_edges(spark, tmp_path):
    # one conceptual order replicated MIN_COOCCUR-1 times only
    okeys, skeys = [], []
    for k in range(MIN_COOCCUR - 1):
        for s in (1, 2, 3):
            okeys.append(k)
            skeys.append(s)
    t = pa.table(
        {
            "l_orderkey": pa.array(okeys, pa.int64()),
            "l_suppkey": pa.array(skeys, pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "lineitem.parquet"))
    r = _census(spark, str(tmp_path))
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (0, 0, 0)
    assert r.gcc == 0.0


def test_golden_record_survivorship_rules(spark, tmp_path):
    """Planted conflicting observations: most-recent-wins follows
    (date, orderkey) — a later KEY on the SAME date wins; the
    conditional rule ignores non-'F' rows entirely and yields NULL
    when no 'F' observation exists."""
    import datetime as dt

    from dataingestiontohana_spark.plans.cdc import q142_golden_record

    rows = [
        # cust 1: same-date tie -> higher orderkey (O, LOW) wins status;
        # only the earlier F row carries a priority
        (10, 1, "F", 100.0, dt.datetime(2024, 1, 5), "1-URGENT"),
        (11, 1, "O", 250.0, dt.datetime(2024, 1, 5), "5-LOW"),
        # cust 2: no F observation at all -> last_f_priority NULL
        (12, 2, "O", 75.5, dt.datetime(2024, 2, 1), "2-HIGH"),
    ]
    t = pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array([r[2] for r in rows]),
            "o_totalprice": pa.array([r[3] for r in rows], pa.float64()),
            "o_orderdate": pa.array([r[4] for r in rows], pa.timestamp("us")),
            "o_orderpriority": pa.array([r[5] for r in rows]),
        }
    )
    pq.write_table(t, os.path.join(tmp_path, "orders.parquet"))
    out = {
        r.o_custkey: r
        for r in q142_golden_record(spark, str(tmp_path)).collect()
    }
    c1 = out[1]
    assert c1.last_status == "O"  # key 11 wins the same-date tie
    assert c1.last_f_priority == "1-URGENT"  # only F rows considered
    assert c1.n_obs == 2
    assert c1.total_cents == 35000
    assert c1.max_single_cents == 25000
    assert c1.first_seen == "2024-01-05" and c1.last_seen == "2024-01-05"
    c2 = out[2]
    assert c2.last_f_priority is None
    assert c2.last_status == "O"


def test_local_clustering_planted(spark, tmp_path):
    from dataingestiontohana_spark.plans.graph import q148_local_clustering

    # K4 {1,2,3,4} + path 4-5: nodes 1-3 have deg 3, t 3, lcc 1.0;
    # node 4 has deg 4, t 3, lcc 2*3/(4*3) = 0.5; node 5 never appears
    sf = _write_lineitem(tmp_path, [[1, 2, 3, 4], [4, 5]])
    rows = {r.node: r for r in q148_local_clustering(spark, sf).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for n in (1, 2, 3):
        assert (rows[n].deg, rows[n].t, rows[n].lcc) == (3, 3, 1.0)
    assert (rows[4].deg, rows[4].t, rows[4].lcc) == (4, 3, 0.5)


def test_hub_strength_planted(spark, tmp_path):
    from dataingestiontohana_spark.plans.graph import q151_hub_strength

    # K3 {1,2,3} each pair in MIN_COOCCUR orders, plus pair (1,4) in
    # 2*MIN_COOCCUR orders: strength(1) = 5+5+10 = 20, deg 3
    sf = _write_lineitem(tmp_path, [[1, 2, 3], [1, 4], [1, 4]])
    rows = {r.node: r for r in q151_hub_strength(spark, sf).collect()}
    assert (rows[1].deg, rows[1].strength) == (3, 4 * MIN_COOCCUR)
    assert (rows[4].deg, rows[4].strength) == (1, 2 * MIN_COOCCUR)
    assert rows[1].avg_w == round(4 * MIN_COOCCUR / 3, 4)
