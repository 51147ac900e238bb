"""connected_components: correctness at depth, lineage truncation,
convergence-cap error (the failure modes of iterative CC at scale)."""

from __future__ import annotations

import pytest

from quebic_spark.functions.graph import ConvergenceError, connected_components


def _chain(spark, n: int, offset: int = 0):
    """Path graph offset..offset+n-1 (diameter n-1, worst case for
    min-label propagation: the min label crawls one hop per round)."""
    nodes = spark.createDataFrame(
        [(offset + i,) for i in range(n)], ["doc_id"]
    )
    fwd = [(offset + i, offset + i + 1) for i in range(n - 1)]
    edges = spark.createDataFrame(
        fwd + [(b, a) for a, b in fwd], ["src", "dst"]
    )
    return nodes, edges


def test_deep_chain_converges_past_checkpoint_boundary(spark):
    # depth 12, distributed path forced: exercises lineage truncations
    # plus pointer doubling; every node must reach label 0.
    nodes, edges = _chain(spark, 12)
    out = connected_components(
        nodes, edges, max_iters=30, checkpoint_every=5,
        driver_max_edges=0,
    ).collect()
    assert {r.doc_id for r in out} == set(range(12))
    assert all(r.cluster_id == 0 for r in out)


def test_multiple_components_and_singletons(spark):
    n1, e1 = _chain(spark, 6)          # component rooted at 0
    n2, e2 = _chain(spark, 4, offset=100)  # component rooted at 100
    iso = spark.createDataFrame([(999,)], ["doc_id"])  # singleton
    out = connected_components(
        n1.union(n2).union(iso), e1.union(e2), max_iters=20
    ).collect()
    got = {r.doc_id: r.cluster_id for r in out}
    assert all(got[i] == 0 for i in range(6))
    assert all(got[100 + i] == 100 for i in range(4))
    assert got[999] == 999


def test_round_cap_raises_instead_of_wrong_labels(spark):
    # diameter 39: pointer doubling reaches ~2^r hops after r rounds,
    # so 3 rounds (~8 hops) cannot converge; silent fallthrough would
    # return labels where the chain tail never saw the min.
    nodes, edges = _chain(spark, 40)
    with pytest.raises(ConvergenceError):
        connected_components(
            nodes, edges, max_iters=3, driver_max_edges=0
        )


def test_result_survives_cache_release(spark):
    # the returned frame is checkpointed: collecting it twice after the
    # loop's caches are unpersisted must not recompute from dead blocks
    nodes, edges = _chain(spark, 8)
    out = connected_components(nodes, edges, max_iters=20)
    first = sorted((r.doc_id, r.cluster_id) for r in out.collect())
    second = sorted((r.doc_id, r.cluster_id) for r in out.collect())
    assert first == second
    assert first == [(i, 0) for i in range(8)]


def test_loop_does_not_touch_caller_shuffle_conf(spark):
    """The graph-sized shuffle setting lives on a CHILD session: the
    caller's session conf must read its own value at every point a
    concurrent query could be planned (VERDICT r5 item 4)."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    observed = []

    nodes, edges = _chain(spark, 12)
    # patch the CONCRETE DataFrame class (pyspark.sql.DataFrame is the
    # abstract base in Spark 4; instance methods dispatch to the
    # classic subclass)
    cls = type(nodes)
    orig = cls.localCheckpoint

    def probing_checkpoint(self, *a, **k):
        # mid-loop probe: planning a query on the CALLER session while
        # the loop materializes must see the caller's conf
        observed.append(spark.conf.get(key))
        return orig(self, *a, **k)

    cls.localCheckpoint = probing_checkpoint
    try:
        out = connected_components(
            nodes, edges, max_iters=30, checkpoint_every=5,
            driver_max_edges=0,
        ).collect()
    finally:
        cls.localCheckpoint = orig
    assert all(r.cluster_id == 0 for r in out)
    assert observed, "probe never fired"
    assert set(observed) == {before}
    assert spark.conf.get(key) == before


def test_global_temp_views_are_cleaned_up(spark):
    nodes, edges = _chain(spark, 5)
    connected_components(
        nodes, edges, max_iters=10, driver_max_edges=0
    ).collect()
    leftover = [
        t.name
        for t in spark.catalog.listTables("global_temp")
        if t.name.startswith("cc_")
    ]
    assert leftover == []


def test_driver_and_distributed_strategies_agree(spark):
    """The adaptive cutover must be invisible: exact union-find and
    the distributed hash-to-min loop produce identical labels on the
    same graph (chains + merged components + singleton + self-loop)."""
    n1, e1 = _chain(spark, 9)
    n2, e2 = _chain(spark, 4, offset=50)
    bridge = spark.createDataFrame([(3, 52), (52, 3)], ["src", "dst"])
    loop = spark.createDataFrame([(999, 999)], ["src", "dst"])
    iso = spark.createDataFrame([(777,), (999,)], ["doc_id"])
    nodes = n1.union(n2).union(iso)
    edges = e1.union(e2).union(bridge).union(loop)

    def run(cap):
        out = connected_components(
            nodes, edges, max_iters=30, driver_max_edges=cap
        )
        return sorted((r.doc_id, r.cluster_id) for r in out.collect())

    driver, dist = run(10**6), run(0)
    assert driver == dist
    got = dict(driver)
    assert got[52] == 0  # bridged component takes the global min
    assert got[777] == 777 and got[999] == 999
