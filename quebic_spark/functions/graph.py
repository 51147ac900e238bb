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
  a checkpointed frame with no live lineage into the loop;
* the loop runs only over nodes incident to an edge — isolated nodes
  (the overwhelming majority of a near-dup corpus: most documents have
  no duplicate) are label=self by definition and union back in at the
  end, so every per-round shuffle is sized by the dup GRAPH, not the
  corpus.
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

    Concurrency note: the loop temporarily rewrites the session's
    ``spark.sql.shuffle.partitions`` (restored in ``finally``). Spark
    reads that conf at PLAN time, so another query planned on the same
    session while this loop runs would pick up the graph-sized value —
    this function is not safe under concurrent planning on a shared
    session. Run it on its own session (or serialize access) when that
    matters; results materialize inside the loop, so the restore always
    happens before this function returns.
    """
    # localCheckpoint (eager), not cache: edges/labels lineage is the
    # caller's whole upstream pipeline (e.g. the MinHash LSH DAG), and a
    # lazily-populated cache gets only PARTIALLY filled by the probe
    # actions below — every later round would then recompute the missing
    # partitions through the full upstream plan. Checkpointing pays one
    # materialization up front and makes every round's input a plain
    # in-memory table. NOTE: this materialization runs under the
    # caller's shuffle config (pipeline-scale); only the loop below
    # shrinks it.
    edges = edges.select("src", "dst").localCheckpoint()
    # Size the LOOP's shuffles by the measured graph, not the session
    # default: a vanilla 200-partition session pays 200 empty tasks per
    # round for a few-hundred-edge dup graph, and at the other end a
    # billion-edge graph under a small test config would spill. The
    # count is one metadata-cheap job over the checkpointed edges.
    spark = edges.sparkSession
    n_edges = edges.count()
    conf_key = "spark.sql.shuffle.partitions"
    old_parts = spark.conf.get(conf_key)
    loop_parts = min(
        int(old_parts), max(8, -(-n_edges // 50_000))
    )
    spark.conf.set(conf_key, str(loop_parts))
    endpoints = (
        edges.select(F.col("src").alias("doc_id"))
        .union(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    active = nodes.select("doc_id").join(endpoints, "doc_id", "left_semi")
    labels = active.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ).localCheckpoint()
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
                # full truncation: drops ALL prior-round lineage
                new_labels = new_labels.localCheckpoint()
            else:
                new_labels = new_labels.cache()
            # full count (not limit(1)): the probe is the action that
            # materializes new_labels, and a short-circuit would leave
            # its cache partial (see note above); the label table is
            # graph-sized, so the full pass is cheap
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "doc_id")
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
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
        # isolated nodes (no incident edge) are their own cluster root;
        # they never entered the loop, so every round was sized by the
        # dup graph rather than the full node set
        isolated = nodes.select("doc_id").join(
            endpoints, "doc_id", "left_anti"
        ).select("doc_id", F.col("doc_id").alias("cluster_id"))
        result = labels.select("doc_id", "cluster_id").union(isolated)
        # detach the result from the loop's caches before releasing them
        return result.localCheckpoint()
    finally:
        # everything returned is already materialized (localCheckpoint),
        # so restoring the caller's shuffle config here cannot affect it
        spark.conf.set(conf_key, old_parts)
        edges.unpersist()
        labels.unpersist()
