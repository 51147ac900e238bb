"""Distributed graph primitives used by the dedup layer.

``connected_components`` is the GraphX/GraphFrames-style min-label
propagation loop: a driver loop of declarative Spark actions (ONE job
per round — the convergence probe rides the same aggregation that
materializes the new labels), never per-row driver work. Rounds are
bounded by the graph diameter; near-dup graphs are shallow (a handful
of rounds), but the loop is hardened for real depth:

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
  corpus;
* the loop plans on its OWN child session (``spark.newSession()``:
  same SparkContext and data, separate SQL conf), where
  ``spark.sql.shuffle.partitions`` is sized by the measured edge count
  — the caller's session conf is never touched, so concurrent planning
  on the shared session observes its own settings throughout.
"""

from __future__ import annotations

import uuid

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
        ``(doc_id, cluster_id)`` — checkpointed, lineage-free, bound to
        the CALLER's session.
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
    spark = edges.sparkSession
    # Size the LOOP's shuffles by the measured graph, not the session
    # default: a vanilla 200-partition session pays 200 empty tasks per
    # round for a few-hundred-edge dup graph, and at the other end a
    # billion-edge graph under a small test config would spill. The
    # count is one metadata-cheap job over the checkpointed edges.
    n_edges = edges.count()
    loop_parts = min(
        int(spark.conf.get("spark.sql.shuffle.partitions")),
        max(8, -(-n_edges // 50_000)),
    )
    # Child session: same SparkContext, cache manager, and temp-view-
    # free data plane, but an ISOLATED SQL conf — the graph-sized
    # shuffle setting lives only here. Frames cross sessions via global
    # temp views (plan hand-off, no data movement: the edge view wraps
    # an already-checkpointed RDD).
    child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
    tag = uuid.uuid4().hex[:12]
    edges_view, nodes_view, out_view = (
        f"cc_edges_{tag}", f"cc_nodes_{tag}", f"cc_labels_{tag}"
    )
    edges.createGlobalTempView(edges_view)
    nodes.select("doc_id").createGlobalTempView(nodes_view)
    gt = spark.conf.get(
        "spark.sql.globalTempDatabase", "global_temp"
    )
    c_edges = child.table(f"{gt}.{edges_view}")
    c_nodes = child.table(f"{gt}.{nodes_view}")

    endpoints = (
        c_edges.select(F.col("src").alias("doc_id"))
        .union(c_edges.select(F.col("dst").alias("doc_id")))
        .distinct()
    )
    active = c_nodes.join(endpoints, "doc_id", "left_semi")
    labels = active.select(
        "doc_id", F.col("doc_id").alias("cluster_id")
    ).localCheckpoint()
    id_type = labels.schema["cluster_id"].dataType
    converged = False
    try:
        for rnd in range(1, max_iters + 1):
            msgs = c_edges.join(
                labels.select("doc_id", "cluster_id"),
                F.col("src") == F.col("doc_id"),
            ).select(
                F.col("dst").alias("doc_id"),
                "cluster_id",
                F.lit(None).cast(id_type).alias("old_cid"),
            )
            # old label rides the union as a third column: every active
            # doc has EXACTLY one labels row, so min(old_cid) ignoring
            # the msgs rows' nulls recovers it — the convergence diff
            # then needs no second join against the previous round
            new_labels = (
                labels.select(
                    "doc_id",
                    "cluster_id",
                    F.col("cluster_id").alias("old_cid"),
                )
                .union(msgs)
                .groupBy("doc_id")
                .agg(
                    F.min("cluster_id").alias("cluster_id"),
                    F.min("old_cid").alias("old_cid"),
                )
            )
            if rnd % checkpoint_every == 0:
                # full truncation: drops ALL prior-round lineage
                new_labels = new_labels.localCheckpoint()
            else:
                new_labels = new_labels.cache()
            # ONE job per round: this full count materializes
            # new_labels (populating its cache completely — a
            # short-circuit probe would strand it partial) AND reads
            # the convergence diff off the carried old_cid column
            changed = new_labels.filter(
                F.col("cluster_id") != F.col("old_cid")
            ).count()
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
        # dup graph rather than the full node set. The anti-join's big
        # side never shuffles (endpoints broadcast).
        isolated = c_nodes.join(
            endpoints, "doc_id", "left_anti"
        ).select("doc_id", F.col("doc_id").alias("cluster_id"))
        result = (
            labels.select("doc_id", "cluster_id")
            .union(isolated)
            .localCheckpoint()  # detaches from the loop caches below
        )
        # hand the (already-materialized) result back to the CALLER's
        # session so downstream planning uses the caller's conf; the
        # table() plan resolves to the checkpointed RDD at creation,
        # so dropping the view immediately after is safe (no recompute,
        # no second copy)
        result.createGlobalTempView(out_view)
        try:
            return spark.table(f"{gt}.{out_view}")
        finally:
            spark.catalog.dropGlobalTempView(out_view)
    finally:
        spark.catalog.dropGlobalTempView(edges_view)
        spark.catalog.dropGlobalTempView(nodes_view)
        edges.unpersist()
        labels.unpersist()
