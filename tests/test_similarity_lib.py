"""IVF recall harness: brute force is the ground truth, nprobe is the
recall dial (SURVEY §2.10 similarity-search scale path)."""

from __future__ import annotations

import pytest

from quebic_spark.operators.similarity import (
    ivf_topk_nprobe,
    q_ann_bruteforce_topk,
    q_ann_ivf_topk,
)


def _pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def truth(spark, sf_dir):
    return _pairs(q_ann_bruteforce_topk(spark, sf_dir))


def test_nprobe_1_is_the_gated_plan(spark, sf_dir):
    assert _pairs(ivf_topk_nprobe(spark, sf_dir, nprobe=1)) == _pairs(
        q_ann_ivf_topk(spark, sf_dir)
    )


def test_recall_increases_with_nprobe(spark, sf_dir, truth):
    def recall(nprobe: int) -> float:
        got = _pairs(ivf_topk_nprobe(spark, sf_dir, nprobe=nprobe))
        return len(got & truth) / len(truth)

    r1, r2, r_all = recall(1), recall(2), recall(8)
    assert r1 <= r2 <= r_all
    assert r2 > r1  # the second-best cell must contribute something
    # probing every cell IS brute force: recall must be exactly 1
    assert r_all == 1.0


def test_learned_quantizer_beats_seeded_cells(spark, sf_dir, truth):
    """Spherical-kmeans-learned cells must dominate the seeded gaussian
    cells at the same probe budget — the metric-consistent quantizer is
    the point of learning one (both pipelines are deterministic, so
    these recalls are exact properties of the corpus, not averages)."""
    from quebic_spark.operators.similarity import ivf_topk_learned

    def recall(df) -> float:
        got = _pairs(df)
        return len(got & truth) / len(truth)

    for nprobe in (1, 2):
        seeded = recall(ivf_topk_nprobe(spark, sf_dir, nprobe=nprobe))
        learned = recall(ivf_topk_learned(spark, sf_dir, nprobe=nprobe))
        assert learned > seeded, (
            f"nprobe={nprobe}: learned {learned} <= seeded {seeded}"
        )
