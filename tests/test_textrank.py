"""Pure-python property tests for the q108 fixed-point PageRank
kernel — no Spark session needed (the kernel runs driver-side on the
reduced co-occurrence graph; engine agreement is the oracle sweep's
job, these pin what the numbers MEAN)."""

from __future__ import annotations

from dataingestiontohana_spark.plans.llm_quality import (
    _TR_SCALE,
    fixed_point_pagerank,
)


def _undirected(edges):
    adj, w = [], {}
    for a, b, c in edges:
        adj.append((a, b, c))
        adj.append((b, a, c))
        w[a] = w.get(a, 0) + c
        w[b] = w.get(b, 0) + c
    return adj, w


class TestFixedPointPagerank:
    def test_star_center_ranks_highest(self):
        nodes = ["c", "l1", "l2", "l3", "l4"]
        adj, w = _undirected([("c", f"l{i}", 1) for i in range(1, 5)])
        rank = fixed_point_pagerank(nodes, adj, w)
        assert rank["c"] > max(rank[f"l{i}"] for i in range(1, 5))
        # leaves are symmetric -> EXACTLY equal fixed-point ranks
        assert len({rank[f"l{i}"] for i in range(1, 5)}) == 1

    def test_symmetric_pair_equal_ranks(self):
        nodes = ["a", "b"]
        adj, w = _undirected([("a", "b", 7)])
        rank = fixed_point_pagerank(nodes, adj, w)
        assert rank["a"] == rank["b"]

    def test_mass_approximately_conserved(self):
        # floor divisions only LOSE mass: total stays in
        # (scale - loss, scale], loss < (#edges + n + 2) per iteration
        nodes = ["a", "b", "c", "d"]
        adj, w = _undirected([("a", "b", 3), ("b", "c", 2), ("c", "d", 5)])
        rank = fixed_point_pagerank(nodes, adj, w)
        total = sum(rank.values())
        assert total <= _TR_SCALE
        assert total > _TR_SCALE - 10_000  # tiny floor leakage only

    def test_isolated_node_keeps_teleport_mass_only(self):
        nodes = ["a", "b", "iso"]
        adj, w = _undirected([("a", "b", 1)])
        w["iso"] = 0  # no incident edges
        rank = fixed_point_pagerank(nodes, adj, w)
        tele = (15 * _TR_SCALE) // (100 * 3)
        assert rank["iso"] == tele

    def test_heavier_edge_pulls_rank(self):
        # b--a heavy, b--c light: a receives more of b's mass than c
        nodes = ["a", "b", "c"]
        adj, w = _undirected([("a", "b", 9), ("b", "c", 1)])
        rank = fixed_point_pagerank(nodes, adj, w)
        assert rank["a"] > rank["c"]
