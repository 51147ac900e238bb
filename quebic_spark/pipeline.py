"""End-to-end corpus release: the terminal composition a training-data
team actually ships, as ONE Catalyst DAG feeding one terminal write.

    score -> per-source percentile filter -> keep-best dedup
          -> benchmark decontamination -> sharded release artifact

Every stage is the already-oracle-checked library op (textops /
dedup / sources); composing them declaratively means Catalyst sees the
whole lineage — filters fold into the scan, the dedup window and the
shard repartition are the only wide exchanges, and nothing
materializes until the write. The released rows carry their
provenance columns (quality_score, content_key, n_copies) so a
downstream loader can audit selection decisions without re-deriving
them.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DECON_NGRAM = 8


def quality_score_col(text_col: str = "text") -> Column:
    """The doc_quality composite (distinct-token ratio + length), the
    same expression the ``doc_quality`` / ``dedup_keep_best`` gates
    hash-match against DuckDB — delegated to the canonical
    ``textops.quality_exprs`` definition."""
    from quebic_spark.operators.textops import quality_exprs

    return quality_exprs(text_col)["score"]


def contaminated_doc_ids(
    docs: DataFrame,
    bench_docs: DataFrame,
    text_col: str = "text",
    ngram: int = DECON_NGRAM,
    max_shared_grams: int = 0,
) -> DataFrame:
    """doc_ids sharing more than ``max_shared_grams`` distinct n-grams
    with the benchmark set (broadcast bench-gram join — the benchmark
    side is always tiny relative to the corpus)."""
    from quebic_spark.functions.text import shingles

    grams = docs.select(
        "doc_id", F.explode(shingles(F.col(text_col), ngram)).alias("g")
    )
    bench = F.broadcast(
        bench_docs.select(
            F.explode(shingles(F.col(text_col), ngram)).alias("g")
        ).distinct()
    )
    return (
        grams.join(bench, "g")
        .groupBy("doc_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .filter(F.col("n_shared") > max_shared_grams)
        .select("doc_id")
    )


def release_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_path: str,
    n_shards: int,
    quality_cut_pct: float = 0.2,
    bench_docs: DataFrame | None = None,
    order_by: Sequence[str] = ("doc_id",),
    fmt: str = "parquet",
    quality_model=None,
    min_model_prob: float = 0.5,
) -> dict:
    """Run the full release pipeline and write the sharded artifact.

    Stages: (1) score every doc with :func:`quality_score_col`;
    (2) drop the worst ``quality_cut_pct`` of each source
    (:func:`quality_percentile_filter` — count-based, small sources
    never wiped); (2b) if a trained ``quality_model``
    (:class:`operators.classifier.QualityModel`) is given, drop docs
    it scores below ``min_model_prob`` — the model tier rides the
    same scan as the heuristics because classifier scoring is a pure
    column expression (zero extra shuffles); (3) keep the best-quality
    canonical per bag-of-words content key (:func:`keep_best`);
    (4) if ``bench_docs`` is given, anti-join away documents sharing
    n-grams with it; (5) write the md5-bucket sharded layout with
    manifest (:func:`write_corpus_shards`). Returns the write
    manifest.
    """
    from quebic_spark.operators.dedup import _content_key, keep_best
    from quebic_spark.operators.textops import quality_percentile_filter
    from quebic_spark.sources.io import write_corpus_shards

    scored = docs.withColumn("quality_score", quality_score_col())
    kept = quality_percentile_filter(
        scored, "source", "quality_score", quality_cut_pct
    )
    if quality_model is not None:
        from quebic_spark.operators.classifier import classifier_prob_col

        kept = kept.withColumn(
            "model_prob", classifier_prob_col(quality_model)
        ).filter(F.col("model_prob") >= min_model_prob)
    deduped = keep_best(
        kept.withColumn("content_key", _content_key()),
        "content_key",
        "quality_score",
    )
    cached = None
    if bench_docs is not None:
        # deduped feeds BOTH the gram derivation and the anti-join left
        # side; column pruning makes the two subtrees differ, defeating
        # ReuseExchange, so the filter+window chain would run twice —
        # materialize once. Unlike the LAZY dedup query functions this
        # is a terminal op (the write below materializes everything),
        # so the handle is released here in finally rather than parked
        # on the caller-side clear_caches contract.
        cached = deduped.cache()
        deduped = cached.join(
            contaminated_doc_ids(cached, bench_docs),
            "doc_id",
            "left_anti",
        )
    try:
        return write_corpus_shards(
            spark, deduped, out_path, n_shards,
            key_col="doc_id", order_by=list(order_by), fmt=fmt,
        )
    finally:
        if cached is not None:
            cached.unpersist(blocking=False)
