"""Trained quality classifier: deterministic IRLS training
(`functions/linear.py`) + scan-resident Spark scoring
(`operators/classifier.py`). The driver gate asserts the held-out
contract; these tests pin the trainer math, determinism, the
train/score feature agreement, and the zero-shuffle scoring plan.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from quebic_spark.functions.linear import logreg_loss, train_logreg
from quebic_spark.operators.classifier import (
    CLS_ACC_FLOOR,
    CLS_TRAIN_PCT,
    score_quality_classifier,
    train_quality_classifier,
)
from quebic_spark.operators.sampling import hash_bucket


# ---------------------------------------------------------------------------
# trainer math (pure numpy, no Spark)
# ---------------------------------------------------------------------------


def test_logreg_separable_and_deterministic():
    # deterministic synthetic data: two clouds around (0,0) and (3,3)
    rng = np.random.RandomState(7)
    X = np.vstack(
        [rng.randn(60, 2) * 0.3, rng.randn(60, 2) * 0.3 + 3.0]
    )
    y = np.concatenate([np.zeros(60), np.ones(60)])
    w, b = train_logreg(X, y)
    pred = (X @ w + b) >= 0
    assert (pred == y.astype(bool)).all()
    # bit-identical retrain (zero init, fixed iters, no randomness)
    w2, b2 = train_logreg(X, y)
    assert (w == w2).all() and b == b2


def test_logreg_loss_decreases_from_null_model():
    rng = np.random.RandomState(11)
    X = rng.randn(100, 5)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    w, b = train_logreg(X, y)
    null = logreg_loss(X, y, np.zeros(5), 0.0)
    assert logreg_loss(X, y, w, b) < null * 0.5


def test_logreg_unseparable_stays_finite():
    # identical X, conflicting labels: the optimum is p=0.5, and the
    # ridge Hessian must keep every iterate finite
    X = np.ones((10, 3))
    y = np.array([0.0, 1.0] * 5)
    w, b = train_logreg(X, y)
    assert np.isfinite(w).all() and np.isfinite(b)
    p = 1 / (1 + np.exp(-(X @ w + b)))
    assert np.allclose(p, 0.5, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end over the documents table
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def model(docs):
    return train_quality_classifier(docs)


def test_training_is_deterministic(docs, model):
    again = train_quality_classifier(docs)
    assert again == model  # NamedTuple equality: every weight bit-equal


def test_heldout_contract_actually_holds(docs, model):
    held = docs.filter(hash_bucket(F.col("doc_id")) >= CLS_TRAIN_PCT)
    scored = score_quality_classifier(held, model)
    row = scored.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias(
            "acc"
        ),
        F.avg(F.col("label").cast("double")).alias("pos"),
    ).collect()[0]
    assert row["acc"] >= CLS_ACC_FLOOR
    assert row["acc"] >= max(row["pos"], 1 - row["pos"])


def test_score_matches_driver_numpy_scoring(spark, docs, model):
    """The scan-resident fold must compute the SAME dot product the
    trainer's feature matrix would: score a doc both ways."""
    sample = docs.limit(5).collect()
    from quebic_spark.operators.classifier import N_BUCKETS

    spark_probs = {
        r["doc_id"]: r["prob"]
        for r in score_quality_classifier(
            docs.limit(5), model
        ).collect()
    }
    import hashlib

    for row in sample:
        toks = row["text"].split(" ")
        n = float(len(toks))
        dr = len(set(toks)) / n
        ls = min(n / 100.0, 1.0)
        z = (
            model.bias
            + model.w_dense[0] * dr
            + model.w_dense[1] * ls
        )
        for t in toks:
            b = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % N_BUCKETS
            z += model.w_buckets[b] / n
        want = 1.0 / (1.0 + np.exp(-z))
        assert spark_probs[row["doc_id"]] == pytest.approx(
            want, rel=1e-9
        )


def test_scoring_plan_is_scan_resident(docs, model):
    """fastText property: scoring is one projection — no shuffle
    Exchange, no join, no UDF in the plan."""
    plan = (
        score_quality_classifier(docs, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for forbidden in ("Exchange", "Join", "BatchEvalPython",
                      "ArrowEvalPython"):
        assert forbidden not in plan, f"{forbidden} in scoring plan"


def test_scoring_works_unchanged_on_a_stream(spark, tmp_path, docs, model):
    """Scan-resident scoring has no shuffle/stateful op, so the SAME
    score_quality_classifier call plans on a readStream frame — the
    batch/stream expr-sharing contract the event ops follow. Streamed
    scores must equal batch scores row for row."""
    src = str(tmp_path / "docs_stream")
    docs.limit(50).write.parquet(src)
    stream = (
        spark.readStream.schema(docs.schema).parquet(src)
    )
    q = (
        score_quality_classifier(stream, model)
        .writeStream.format("memory")
        .queryName("scored_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: (r["prob"], r["pred"])
        for r in spark.sql("SELECT * FROM scored_stream").collect()
    }
    want = {
        r["doc_id"]: (r["prob"], r["pred"])
        for r in score_quality_classifier(
            spark.read.parquet(src), model
        ).collect()
    }
    assert got == want and len(got) == 50


def test_model_save_load_roundtrip_scores_identically(
    spark, tmp_path, docs, model
):
    from quebic_spark.operators.classifier import (
        load_quality_model,
        save_quality_model,
    )

    path = str(tmp_path / "model" / "quality.json")
    save_quality_model(spark, model, path)
    loaded = load_quality_model(spark, path)
    assert loaded == model  # exact float round-trip, every weight
    a = score_quality_classifier(docs.limit(20), model).collect()
    b = score_quality_classifier(docs.limit(20), loaded).collect()
    assert a == b


def test_model_load_rejects_wrong_format(spark, tmp_path):
    import json

    from quebic_spark.operators.classifier import load_quality_model

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"format": "something-else"}))
    with pytest.raises(ValueError):
        load_quality_model(spark, str(p))
