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
