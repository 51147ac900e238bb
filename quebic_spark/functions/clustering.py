"""Distributed k-means (Lloyd) over an ``array<float|double>`` column.

The clustering complement of the IVF similarity path
(``operators/similarity.py``): IVF consumes a fixed seeded quantizer,
this learns one from the data. Library-level op (no driver gate — the
iterative refinement isn't single-statement SQL); evidence lives in
``tests/test_clustering.py``: determinism, monotone objective, and
agreement with a NumPy reference on the same seed.

Determinism discipline (the property a 100 TB pipeline needs):

* assignment = argmin squared-L2, FIRST index on ties — a pure
  per-row expression, stable at any parallelism;
* centroid update sums components in ``DECIMAL(38,18)`` — exact, so
  the mean is independent of partition count and combine order (a
  double sum would drift with the shuffle layout and make k-means
  results irreproducible run-to-run);
* init = k data points in deterministic md5 order (Forgy init — random
  gaussian centroids in high dimension land far from the data manifold
  and strand clusters empty), or caller-supplied centroids.

Scale shape per iteration: one broadcast of k*d centroid literals into
the row expression (no join), one posexplode + (cluster, dim) keyed
aggregation — map-side combinable, k*d result rows to the driver.
Nothing else leaves the executors; the corpus never reshuffles.
"""

from __future__ import annotations

from decimal import Decimal

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUM_DECIMAL = "decimal(38,18)"


def _distance_sq(vec_col: F.Column, centroid: list[float]) -> F.Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(vec_col, c, lambda a, b: (a - b) * (a - b))
    return F.aggregate(
        diff, F.lit(0.0), lambda acc, x: acc + x
    )


def _assign_col(vec_col: F.Column, centroids: list[list[float]]) -> F.Column:
    # argmin via array_position(dists, min): ONE copy of each distance
    # tree. The least()+when-chain formulation embedded every distance
    # tree in every arm — an O(k^2 * dim) expression whose Catalyst
    # analysis cost (~3 s per iteration at k=8, dim=64) dwarfed the
    # actual work. array_position returns the FIRST match, preserving
    # the first-index-on-ties rule.
    dists = F.array(*[_distance_sq(vec_col, c) for c in centroids])
    return (
        F.array_position(dists, F.array_min(dists)).cast("int") - 1
    )


def _assign_pandas(centroids: list[list[float]]):
    """Arrow-vectorized argmin assignment — the Lloyd hot path.

    The pure-expression form (``_assign_col``) pays twice per
    iteration: k*dim literal Columns built over py4j (~1 s of driver
    chatter at k=8, dim=64) and interpreted higher-order-function
    evaluation per row (zip_with/aggregate lambdas are not codegen'd).
    A scalar Pandas UDF moves the whole batch through one NumPy
    broadcast — identical semantics (float64 squared-L2, argmin =
    first index on ties, per-row independent so any partitioning or
    batch split gives the same answer) and it IS the test suite's
    NumPy reference computation. ``_assign_col`` stays for
    SQL-parity/oracle use at small k.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)

    def assign(v):
        X = np.array(v.tolist(), dtype=np.float64)
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    # non-decorator, no explicit functionType: Spark 4 infers the
    # scalar shape (the legacy PandasUDFType form is deprecated and
    # warned per call, SPARK-28264 — r15 review; the old "string
    # hints break inference" rationale no longer holds there)
    return pandas_udf(assign, "int")


def seeded_centroids(k: int, dim: int, seed: int = 11) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    cents = rng.randn(k, dim)
    return [[round(float(x), 6) for x in row] for row in cents]


def kmeans(
    df: DataFrame,
    vec_col: str,
    k: int,
    *,
    max_iters: int = 10,
    init_centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]], int]:
    """Cluster ``df[vec_col]`` into ``k`` groups.

    Returns ``(assignments, centroids, iters_run)`` where assignments
    is ``df`` plus an int ``cluster`` column (computed against the
    FINAL centroids), centroids is the learned ``k x dim`` list, and
    ``iters_run`` counts completed Lloyd updates (early-stops when an
    update leaves every centroid exactly unchanged — exact comparison
    is meaningful because the decimal sums are exact).

    ``init_centroids`` seeds the iteration explicitly; by default the
    k data points that sort first by md5 of their string form are used
    (deterministic Forgy init — a hash-order sample, stable at any
    parallelism). Empty clusters keep their previous centroid (the
    standard Lloyd degeneracy rule that avoids NaN centroids).

    Rows whose vector contains a non-finite or DECIMAL-overflowing
    component (NaN/inf, |x| >= 1e18) are EXCLUDED from training: the
    component cast to DECIMAL(38,18) is NULL, which SUM skips while
    COUNT counts — silently skewed means — and an all-NULL cell made
    the driver mean a None division (r14 review). They still receive
    a ``cluster`` in the returned assignment (NumPy argmin over NaN
    yields index 0), they just don't vote on centroid positions.

    The training frame is persisted (MEMORY_AND_DISK) and
    materialized once at entry: Lloyd runs max_iters+1 passes over
    it, and re-executing a derived frame's full upstream lineage per
    pass multiplied the source pipeline's cost by the iteration count
    (r14 review). persist rather than localCheckpoint (r15 advice):
    checkpoint blocks have no deterministic release path, so each
    kmeans call in a shared long-lived session pinned a copy of the
    training frame until GC; persist gives the same
    one-materialization guarantee (evicted blocks spill to disk, not
    recompute) and is released in the finally below — the final
    assignment uses ``df``, not ``train``, so nothing outlives the
    call.
    """
    finite = df.select(F.col(vec_col).alias("v")).filter(
        F.forall(
            F.col("v"),
            lambda x: ~F.isnan(x) & (F.abs(x) < F.lit(1e18)),
        )
    )
    # materialize now so each Lloyd pass costs one read of cached
    # blocks, not the caller's whole upstream plan; released in the
    # finally (library residency must not outlive the call)
    train = finite.persist()
    try:
        # the materializing action must sit INSIDE the try: a failure
        # during materialization (bad upstream data, lost executor)
        # would otherwise leave the persist marker held for the
        # session lifetime — the exact residency leak the finally
        # exists to prevent (r15 advice)
        train.count()
        return _kmeans_loop(
            df, vec_col, k, train,
            max_iters=max_iters, init_centroids=init_centroids,
        )
    finally:
        train.unpersist(blocking=False)


def _kmeans_loop(
    df: DataFrame,
    vec_col: str,
    k: int,
    train: DataFrame,
    *,
    max_iters: int,
    init_centroids: list[list[float]] | None,
) -> tuple[DataFrame, list[list[float]], int]:
    if init_centroids is not None:
        centroids = [[float(x) for x in c] for c in init_centroids]
    else:
        key = F.md5(F.col("v").cast("string"))
        rows = (
            train
            .orderBy(key, F.col("v").cast("string"))
            .limit(k)
            .collect()
        )
        if len(rows) < k:
            raise ValueError(
                f"kmeans needs >= {k} finite rows, got {len(rows)}"
            )
        centroids = [[float(x) for x in r["v"]] for r in rows]
    iters_run = 0
    for _ in range(max_iters):
        # two projections, deliberately: a single select with both the
        # UDF and the generator makes Spark split them with Generate
        # BELOW ArrowEvalPython — the argmin then runs on the
        # POST-explode stream (dim x the rows, each shipping the full
        # vector over Arrow again), which scaled a Lloyd iteration by
        # ~dim and by k (r20 sf1 profiling: 36 s/iter at k=79 vs 0.5 s
        # for the UDF alone). Assigning first keeps the UDF at input
        # cardinality; the optimizer does not re-collapse across the
        # generator.
        assigned = (
            train.select(
                _assign_pandas(centroids)(F.col("v")).alias("cluster"),
                "v",
            )
            .select(
                "cluster",
                F.posexplode(F.col("v")).alias("dim", "component"),
            )
        )
        sums = (
            assigned.groupBy("cluster", "dim")
            .agg(
                F.sum(
                    F.col("component").cast(SUM_DECIMAL)
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        per_cluster: dict[int, list[tuple[int, Decimal, int]]] = {}
        for row in sums:
            per_cluster.setdefault(row["cluster"], []).append(
                (row["dim"], row["s"], row["n"])
            )
        for cluster, comps in per_cluster.items():
            for d, s, n in comps:
                # exact decimal mean -> float once, at the end
                new_centroids[cluster][d] = float(s / n)
        iters_run += 1
        if new_centroids == centroids:
            break
        centroids = new_centroids
    out = df.withColumn(
        "cluster", _assign_pandas(centroids)(F.col(vec_col))
    )
    return out, centroids, iters_run
