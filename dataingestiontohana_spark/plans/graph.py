"""Graph analytics over relational co-occurrence: triangle counting.

The reference (`/root/reference/README.md`) exhibits a streaming ETL
surface only; graph primitives enter this engine through the
LLM-pipeline mandate (duplicate-edge connected components already live
in operators/connected_components.py, fixed-point PageRank in
operators/textrank.py-style kernels). Triangle counting / the global
clustering coefficient is the classic third graph primitive — the
standard health metric for co-occurrence graphs (community structure,
spam-ring detection) that neither CC nor PageRank provides.

Scale design (the whole point of this operator): the naive triangle
join over an undirected edge list explodes on hubs — a node of degree
d contributes C(d,2) wedges, so one celebrity node of degree 10^6
yields 5*10^11 candidates. The standard fix (node-iterator++ /
degree ordering, as in Suri & Vassilvitskii's MapReduce formulation
and GraphFrames' triangle count) orients every undirected edge from
the endpoint of lower (degree, id) to the higher one; wedges are then
built ONLY from each node's OUT-edges, bounding out-degree by
O(sqrt(m)) — total wedge work O(m^{3/2}) independent of hub size.
The orientation key packs (degree, node) into one comparable int64
(degree * 2^32 + node), so ranking needs no global window at all —
no sort, no single-partition funnel; degrees attach via two broadcast
joins of the |nodes|-sized degree frame.

Correctness cross-check: the DuckDB oracle counts triangles through a
DIFFERENT formulation — the id-ordered triple join (a<b<c with all
three id-ordered edges present). Both count every triangle exactly
once, so the hash match validates the degree-ordered algorithm against
an independent derivation, not against a replay of itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataingestiontohana_spark.catalog import load_table

# suppliers co-appearing in fewer orders than this are not connected:
# the weight threshold keeps the graph sparse as the corpus grows
# (at sf0.01 nearly every pair qualifies — a dense graph whose exact
# triangle count exercises the counting math; at sf0.1+ the threshold
# bites and the graph is genuinely sparse).
MIN_COOCCUR = 5

# rank key = degree * 2^32 + node: a single int64 that orders by
# (degree, node). Safe while degree < 2^31 and node < 2^32; a corpus
# with a single node of degree >= 2^31 needs the DECIMAL(38,0) form.
_RANK_BASE = 1 << 32


def _supplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected edge list (s1 < s2 by id) of suppliers that co-occur
    in >= MIN_COOCCUR distinct orders.

    Scale shape: the per-order supplier set is tiny (TPC-H <= 7
    lineitems/order), so the within-order self-join has bounded
    fan-out; pair counting shuffles once on (s1, s2) with map-side
    combine. No supplier-side skew can blow this up — the fan-out is
    per ORDER, not per supplier.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # one shuffle to the per-order supplier set (collect_set combines
    # map-side), then pair generation stays codegen: posexplode picks
    # s1, a Column-start slice explodes every later element as s2 —
    # id-sorted arrays make s1 < s2 by construction. This beats the
    # obvious distinct + self-join-on-order formulation (3 shuffles,
    # double scan) ~4x at sf0.1.
    arr = (
        li.groupBy(F.col("l_orderkey"))
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("a"))
        .select("a")
    )
    t1 = arr.select("a", F.posexplode("a").alias("i", "s1"))
    return (
        t1.select(
            "s1",
            F.explode(
                F.slice(F.col("a"), F.col("i") + 2, F.size("a"))
            ).alias("s2"),
        )
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= MIN_COOCCUR)
        .select("s1", "s2")
    )


def q141_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the supplier co-occurrence graph: node/edge
    counts, exact triangle and wedge totals, and the global clustering
    coefficient 3T/W.

    Algorithm (degree-ordered wedge join, see module docstring):
    orient each edge low-rank -> high-rank, self-join out-edges on the
    shared source to enumerate wedges, close each wedge with one
    equi-join back to the oriented edge set. Every triangle is counted
    exactly once — at its lowest-rank corner.
    """
    e = _supplier_edges(spark, sf_dir).localCheckpoint(eager=False)

    deg = (
        e.select(F.col("s1").alias("node"))
        .unionAll(e.select(F.col("s2").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # degree frame is |nodes| rows — broadcast both attachments
    d1 = F.broadcast(deg.select(F.col("node").alias("s1"), F.col("deg").alias("dg1")))
    d2 = F.broadcast(deg.select(F.col("node").alias("s2"), F.col("deg").alias("dg2")))
    k1 = F.col("dg1") * F.lit(_RANK_BASE) + F.col("s1")
    k2 = F.col("dg2") * F.lit(_RANK_BASE) + F.col("s2")
    oriented = (
        e.join(d1, "s1").join(d2, "s2")
        .select(
            F.when(k1 < k2, F.col("s1")).otherwise(F.col("s2")).alias("src"),
            F.when(k1 < k2, F.col("s2")).otherwise(F.col("s1")).alias("dst"),
            F.greatest(k1, k2).alias("kdst"),
        )
        .localCheckpoint(eager=False)
    )

    w1 = oriented.alias("w1")
    w2 = oriented.alias("w2")
    wedges = w1.join(
        w2,
        (F.col("w1.src") == F.col("w2.src"))
        & (F.col("w1.kdst") < F.col("w2.kdst")),
    ).select(F.col("w1.dst").alias("v"), F.col("w2.dst").alias("w"))
    # the closing undirected edge {v, w} is stored oriented
    # low-rank -> high-rank, and the wedge pair was ordered by rank,
    # so the close is a plain equi-join on (src, dst)
    closing = oriented.select(
        F.col("src").alias("v"), F.col("dst").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )

    summary = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2).cast("long").alias(
            "n_wedges"
        ),
    )
    n_edges = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))

    # three single-row frames -> literal attach (sanctioned 1-row
    # cross joins), then the clustering coefficient on exact ints
    out = summary.crossJoin(n_edges).crossJoin(tri)
    gcc = F.when(
        F.col("n_wedges") > 0,
        F.round(F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n_nodes", "n_edges", "n_triangles", "n_wedges",
        gcc.cast("double").alias("gcc"),
    )


QUERIES = {"q141_triangle_count": q141_triangle_count}

ORACLES = {
    "q141_triangle_count": f"""
    WITH ps AS (
      SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem),
    e AS (
      SELECT a.s AS s1, b.s AS s2
      FROM ps a JOIN ps b ON a.o = b.o AND a.s < b.s
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_COOCCUR}),
    d AS (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT s1 AS node FROM e UNION ALL SELECT s2 AS node FROM e) u
      GROUP BY 1),
    -- id-ordered triple join: a<b<c with (a,b),(b,c),(a,c) all edges;
    -- an INDEPENDENT formulation of the same count (each triangle has
    -- exactly one id-sorted corner ordering)
    t AS (
      SELECT COUNT(*) AS tri
      FROM e e1
      JOIN e e2 ON e2.s1 = e1.s2
      JOIN e e3 ON e3.s1 = e1.s1 AND e3.s2 = e2.s2),
    s AS (
      SELECT (SELECT COUNT(*) FROM d) AS n_nodes,
             (SELECT COUNT(*) FROM e) AS n_edges,
             (SELECT tri FROM t) AS n_triangles,
             (SELECT CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) FROM d)
               AS n_wedges)
    SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           n_wedges,
           CASE WHEN n_wedges > 0
                THEN ROUND(3.0 * n_triangles / n_wedges, 6)
                ELSE 0.0 END AS gcc
    FROM s
    """,
}
