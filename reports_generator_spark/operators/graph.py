"""Iterative graph operators — the dedup-clustering step that turns
near-dup *pairs* (operators/dedup.py) into *clusters* with one
canonical survivor per cluster, which is what a corpus pipeline
actually deletes against.

Connected components by min-label propagation (Pregel-style):
every node starts labeled with its own id; each round, every node
takes the min of its label and its neighbors' labels; converged when
no label changes. The driver controls only the iteration count and a
scalar convergence check — all data stays distributed, and
``localCheckpoint`` truncates the lineage each round so plans don't
grow with iterations.

Scale posture: rounds = component diameter; near-dup clusters are
small and dense, so 2–4 rounds in practice. Each round is one
equi-join + one groupBy-min — shuffle-bounded on the node id. For
web-scale graphs with giant components you'd switch to the
large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond") — same DataFrame primitives,
fewer rounds; the semantics pinned here don't change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(node, cluster_id) for every node in `edges`, where cluster_id
    is the minimum node id in the node's connected component."""
    # materialize the (possibly expensive) upstream pair generation
    # exactly once — the symmetric union below references it twice, and
    # every round joins against the edge set
    base = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    und = (
        base.union(base.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # labels are monotonically non-increasing (a node's old label is in
    # the min), so convergence == the label sum stops decreasing — one
    # aggregation per round instead of a self-join change count
    prev_sum = None
    for _ in range(max_iter):
        nbr = und.join(labels, und.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        new_labels = (
            labels.select("node", "label")
            .union(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        cur_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if prev_sum is not None and cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))
