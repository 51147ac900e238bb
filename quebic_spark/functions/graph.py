"""Distributed graph primitives used by the dedup layer.

``connected_components`` is the GraphX/GraphFrames-style min-label
propagation loop: a driver loop of declarative Spark actions (one
shuffle join + one aggregation per round), never per-row driver work.
Rounds are bounded by the graph diameter; near-dup graphs are shallow
(a handful of rounds), but the loop is hardened for real depth:

* every ``checkpoint_every`` rounds the label frame is
  ``localCheckpoint``-ed (eager), truncating the logical plan — without
  this, round N's plan nests all N-1 predecessors and Catalyst
  analysis/optimization time grows superlinearly with depth;
* hitting ``max_iters`` without convergence RAISES instead of
  returning silently-wrong labels (a doc pointing at a non-minimal
  cluster root mis-assigns keepers downstream);
* all intermediate caches are released before returning; the result is
  a checkpointed frame with no live lineage into the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when an iterative algorithm hits its round cap while
    labels are still changing (graph diameter exceeds the cap)."""


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    max_iters: int = 20,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Label every node with the minimum node id reachable from it.

    Args:
        nodes: one column ``doc_id`` (any orderable id type).
        edges: columns ``src``/``dst``; treated as DIRECTED — pass both
            orientations for an undirected graph.
        max_iters: hard round cap; exceeding it raises
            :class:`ConvergenceError` rather than returning bad labels.
        checkpoint_every: lineage-truncation period (rounds).

    Returns:
        ``(doc_id, cluster_id)`` — checkpointed, lineage-free.
    """
    edges = edges.select("src", "dst").cache()
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ).cache()
    converged = False
    try:
        for rnd in range(1, max_iters + 1):
            msgs = edges.join(
                labels, F.col("src") == F.col("doc_id")
            ).select(F.col("dst").alias("doc_id"), "cluster_id")
            new_labels = (
                labels.union(msgs)
                .groupBy("doc_id")
                .agg(F.min("cluster_id").alias("cluster_id"))
            )
            if rnd % checkpoint_every == 0:
                # eager: materializes AND truncates the plan
                new_labels = new_labels.localCheckpoint()
            else:
                new_labels = new_labels.cache()
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            raise ConvergenceError(
                f"connected_components: labels still changing after "
                f"{max_iters} rounds — graph diameter exceeds the cap; "
                f"raise max_iters"
            )
        # detach the result from the loop's caches before releasing them
        return labels.select("doc_id", "cluster_id").localCheckpoint()
    finally:
        edges.unpersist()
        labels.unpersist()
