"""Connected components over an undirected edge list — the clustering
step that turns near-duplicate candidate PAIRS (MinHash/SimHash LSH
output) into dedup CLUSTERS, so a pipeline can keep one canonical
document per cluster.

Algorithm: iterative minimum-label propagation. Each node's label
starts as its own id; every round each node adopts the minimum label
in its closed neighborhood; converged when no label changes. Rounds
are O(graph diameter) — near-dup graphs are overwhelmingly tiny
cliques/chains (diameter 1-3), so 2-4 rounds in practice.

Scale design:
- State per round is one (node, label) DataFrame, hash-partitioned on
  node; the propagation is a single shuffle-join per round on the same
  key, so successive rounds reuse the partitioning.
- Lineage is cut every round with localCheckpoint (iterative plans
  otherwise grow exponentially and overwhelm the optimizer); the
  driver only ever sees one LongAccumulator-sized convergence count,
  never the data.
- Convergence check is an aggregate (count of changed labels), not a
  collect of labels.

For web-scale graphs with adversarial diameters, the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) converges in O(log^2 n) rounds with
the same join-per-round shape; min-label propagation is the right
default for the short-diameter near-dup regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; the
    component id is the minimum node id in the component.

    `edges` is undirected input: each pair needs to appear once in
    either orientation.
    """
    # materialize the edge list first: the upstream pipeline (e.g. the
    # whole MinHash LSH graph) is typically far more expensive than the
    # components themselves, and the 4-way symmetrize union below would
    # otherwise re-execute it once per branch — and once per round
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    # symmetrize + self-loops so input orientation doesn't matter and
    # every node sees its own label in the neighborhood min
    adj = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .union(e.select("u", F.col("u").alias("v")))
        .union(e.select(F.col("v").alias("u"), "v"))
        .distinct()
        .localCheckpoint()
    )
    # round 0 is the neighborhood min itself (self-loops include u)
    labels = adj.groupBy("u").agg(F.min("v").alias("label")).localCheckpoint()
    prev_sum = None

    for _ in range(max_iter):
        # labels are monotonically non-increasing, so the label sum
        # strictly decreases until convergence: one scalar aggregate
        # replaces a change-count join (decimal sum: overflow-proof)
        cur_sum = labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
        # each node adopts the min label in its closed neighborhood —
        # the self-loops make least(own, neighbors) a single join+agg
        labels = (
            adj.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint()

    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def canonical_survivors(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """One canonical row per near-dup cluster: the minimum id of each
    component survives; docs not in any component survive as-is."""
    comp = components.withColumnRenamed("node", id_col)
    # left join on the doc id; the component table is usually much
    # smaller than the corpus but unbounded in the worst case, so the
    # broadcast-vs-shuffle choice is left to AQE's runtime statistics
    joined = docs.join(comp, id_col, "left")
    keep = (
        F.col("component").isNull()  # no near-dup evidence
        | (F.col(id_col) == F.col("component"))  # cluster representative
    )
    return joined.where(keep).drop("component")
