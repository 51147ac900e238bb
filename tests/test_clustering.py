"""k-means library op: determinism, objective descent, and agreement
with a NumPy reference running the same Lloyd algorithm from the same
explicit init."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from quebic_spark.functions.clustering import kmeans

K = 4


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _numpy_lloyd(X, cents0, iters):
    cents = np.array(cents0, dtype=np.float64)
    for _ in range(iters):
        d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin = first index on ties
        new = cents.copy()
        for c in range(len(cents)):
            members = X[assign == c]
            if len(members):
                new[c] = members.mean(axis=0)
        if np.array_equal(new, cents):
            break
        cents = new
    d = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return d.argmin(axis=1), cents


def _data(emb):
    rows = sorted(emb.collect(), key=lambda r: r["vec_id"])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = [r["vec_id"] for r in rows]
    init = [list(map(float, X[i])) for i in range(K)]
    return X, ids, init


def test_kmeans_deterministic_and_matches_reference(spark, emb):
    X, ids, init = _data(emb)
    out1, cents1, it1 = kmeans(
        emb, "embedding", K, max_iters=5, init_centroids=init
    )
    out2, cents2, it2 = kmeans(
        emb, "embedding", K, max_iters=5, init_centroids=init
    )
    a1 = {r["vec_id"]: r["cluster"] for r in out1.collect()}
    a2 = {r["vec_id"]: r["cluster"] for r in out2.collect()}
    # exact decimal sums -> bit-identical repeat runs, any parallelism
    assert a1 == a2
    assert cents1 == cents2 and it1 == it2

    ref_assign, ref_cents = _numpy_lloyd(X, init, iters=5)
    # float64 NumPy means vs exact-decimal means agree to ~1e-9; the
    # assignments agree except (at most) points on a knife-edge
    assert np.allclose(np.array(cents1), ref_cents, atol=1e-6)
    got = np.array([a1[i] for i in ids])
    agreement = (got == ref_assign).mean()
    assert agreement >= 0.99, f"assignment agreement {agreement}"
    # data-point init keeps every cluster populated on this data
    assert len(set(a1.values())) == K


def test_kmeans_default_init_deterministic(spark, emb):
    """The built-in md5-order Forgy init is itself reproducible."""
    _, cents1, _ = kmeans(emb, "embedding", K, max_iters=1)
    _, cents2, _ = kmeans(emb, "embedding", K, max_iters=1)
    assert cents1 == cents2


def test_kmeans_objective_descends(spark, emb):
    """Within-cluster SSE after 3 updates <= after 1 update (Lloyd
    monotonicity) — computed against each run's FINAL centroids."""
    _, _, init = _data(emb)

    def sse(iters):
        out, cents, _ = kmeans(
            emb, "embedding", K, max_iters=iters, init_centroids=init
        )
        dist_cols = []
        for c in cents:
            arr = F.array(*[F.lit(float(x)) for x in c])
            diff = F.zip_with(
                F.col("embedding"), arr, lambda a, b: (a - b) * (a - b)
            )
            dist_cols.append(
                F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)
            )
        return out.select(
            F.least(*dist_cols).alias("d")
        ).agg(F.sum("d")).first()[0]

    s1, s3 = sse(1), sse(3)
    assert s3 <= s1 + 1e-9, f"objective rose: {s1} -> {s3}"


def test_kmeans_excludes_nonfinite_vectors_from_training(spark):
    """r14 review: a NaN/inf component cast to DECIMAL(38,18) is NULL
    — SUM skipped it while COUNT counted it (silently skewed means),
    and an all-NULL cell made the driver mean a None division. Rows
    with non-finite components are excluded from centroid estimation
    but still assigned."""
    import math

    from quebic_spark.functions.clustering import kmeans

    rows = (
        [([0.0, 0.0],) for _ in range(5)]
        + [([10.0, 10.0],) for _ in range(5)]
        + [([float("nan"), 5.0],), ([float("inf"), 5.0],)]
    )
    df = spark.createDataFrame(rows, "v array<double>")
    out, cents, iters = kmeans(
        df, "v", 2,
        init_centroids=[[0.0, 0.0], [10.0, 10.0]],
    )
    # centroids come from the 10 finite rows only — exactly the two
    # group means, unpolluted by the NaN/inf rows
    got = sorted(tuple(round(x, 9) for x in c) for c in cents)
    assert got == [(0.0, 0.0), (10.0, 10.0)], got
    # every input row (including non-finite) receives an assignment
    assert out.count() == 12
    assert all(not math.isnan(r["cluster"]) for r in out.collect())


def test_kmeans_releases_training_blocks(spark, emb):
    """r15 advice: the training frame was localCheckpoint'd, whose
    materialized blocks have no deterministic release path — each
    kmeans call in a shared session pinned a training-frame copy
    until GC. persist + unpersist-in-finally must leave no library
    residency behind, success or failure."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    out, _, _ = kmeans(emb, "embedding", K, max_iters=2)
    out.count()
    assert jsc.getPersistentRDDs().size() == before
    # failure path releases too: k larger than the row count raises
    # from inside the guarded region
    with pytest.raises(ValueError):
        kmeans(emb, "embedding", 10**6, max_iters=1)
    assert jsc.getPersistentRDDs().size() == before
