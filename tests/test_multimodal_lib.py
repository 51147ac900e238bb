"""Multimodal plumbing: frame sampling (batch-expanding mapInPandas),
feature extraction (binary -> array<float>), resize metadata — the
Spark-side shapes behind stubbed decoders (SURVEY §2.10)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quebic_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    q_multimodal_decode,
    resize_dims,
)


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            F.encode(F.col("text"), "UTF-8").alias("payload"),
            (F.length(F.encode(F.col("text"), "UTF-8")) % 16 + 1)
            .cast("int")
            .alias("n_frames"),
        )
        .cache()
    )


def test_frame_sample_counts_and_timestamps(spark, payloads):
    frames = frame_sample(payloads, every_nth=4)
    got = (
        frames.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_ts_ms").alias("mx"))
    )
    expect = payloads.select(
        "doc_id",
        # ceil(n_frames / 4) sampled frames per doc
        F.ceil(F.col("n_frames") / 4).cast("long").alias("n_expected"),
    )
    joined = got.join(expect, "doc_id")
    assert joined.filter(F.col("n") != F.col("n_expected")).count() == 0
    # timestamps follow idx * 40 ms
    bad_ts = frames.filter(
        F.col("frame_ts_ms") != F.col("frame_idx") * 40
    )
    assert bad_ts.count() == 0


def test_frame_sample_is_partitioning_invariant(spark, payloads):
    one = frame_sample(payloads.coalesce(1)).collect()
    many = frame_sample(payloads.repartition(8)).collect()
    key = lambda r: (r["doc_id"], r["frame_idx"], r["frame_md5"])  # noqa: E731
    assert sorted(map(key, one)) == sorted(map(key, many))


def test_extract_features_shape_and_normalization(spark, payloads):
    feats = extract_features(payloads, dim=16)
    rows = feats.select(
        F.size("features").alias("d"),
        F.aggregate(
            "features", F.lit(0.0), lambda a, x: a + x
        ).alias("total"),
    ).collect()
    assert all(r["d"] == 16 for r in rows)
    assert all(abs(r["total"] - 1.0) < 1e-3 for r in rows)
    assert feats.count() == payloads.count()  # row-preserving contract


def test_resize_dims_fit_and_aspect(spark, sf_dir):
    decoded = q_multimodal_decode(spark, sf_dir)
    out = resize_dims(decoded, max_w=64, max_h=64)
    rows = out.select("width", "height", "out_width", "out_height").collect()
    for r in rows:
        assert 1 <= r["out_width"] <= 64 and 1 <= r["out_height"] <= 64
        # never upscale
        assert r["out_width"] <= r["width"]
        assert r["out_height"] <= r["height"]
