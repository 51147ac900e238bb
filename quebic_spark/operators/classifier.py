"""Trained quality classifier over the ``documents`` table.

The model-based tier of the quality stack (heuristics ->
`doc_quality`; model -> here): a logistic regression over hashed
bag-of-words features plus two dense fluency features, the
fastText-shaped filter GPT-3/LLaMA-style pipelines run over
CommonCrawl. Labels come from the existing `doc_quality` heuristic
(weak supervision: distill the rule into a model, then the model
generalizes to corpora where the rule's inputs are unavailable).

Division of labor at 100 TB (same as `functions/clustering.py`):

* FEATURIZE (scales with corpus): one explode -> md5 bucket ->
  per-doc (bucket, count) agg — combinable, uniform in doc_id.
* TRAIN (driver, numpy): only the md5-sliced labeled sample ever
  leaves the executors, collected in one deterministic frame;
  Newton-IRLS with zero init and a fixed iteration count
  (`functions/linear.py`) makes the weights a pure function of the
  sample.
* SCORE (scales with corpus): broadcast the (bucket, weight) table
  — N_BUCKETS rows — join-and-sum plus an in-plan sigmoid. No UDFs
  anywhere; scoring is one broadcast join + one combinable groupBy.

Gate discipline: trained weights are data-dependent, so the driver
gate emits the portable facts (slice sizes, the DuckDB-replayable
held-out positive-label count — an exact integer, immune to the
cross-engine round() half-even/half-away drift a rounded ratio
carried) plus IN-PLAN contract booleans (held-out accuracy
above a floor, beats the base rate) — the `ann_ivf_learned_recall` /
`cardinality_sketch` pattern for learned components.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from quebic_spark.session import read_immutable_parquet

from quebic_spark.functions.text import tokens

N_BUCKETS = 256          # hashed token-feature width (weight table stays tiny)
CLS_TRAIN_PCT = 30       # md5 buckets [0,30) are the labeled training slice
CLS_ACC_FLOOR = 0.9      # held-out accuracy contract
# teacher threshold sits mid-scale on the doc_quality score so both
# classes are populated at every sf (observed label base rates 0.5-0.7)
CLS_LABEL_THRESHOLD = 0.5


class QualityModel(NamedTuple):
    """Learned weights: dense (distinct_ratio, len_score), sparse
    per-bucket token weights, bias, and the training-slice size (the
    model records its own sample provenance)."""

    w_dense: tuple[float, float]
    w_buckets: list[float]       # index = md5 bucket id
    bias: float
    n_train: int


def _dense_exprs(text_col: str = "text") -> dict[str, Column]:
    """Per-doc dense feature / teacher-label column expressions —
    built from the CANONICAL ``textops.quality_exprs`` (the teacher
    heuristic), so train/score feature parity AND teacher parity
    hold by construction (one definition, not three)."""
    from quebic_spark.operators.textops import quality_exprs

    e = quality_exprs(text_col)
    return {
        "dr": e["dr"],
        "ls": e["ls"],
        "n_toks": e["n_toks"],
        "label": e["score"] >= CLS_LABEL_THRESHOLD,
    }


def _dense_features(docs: DataFrame) -> DataFrame:
    e = _dense_exprs()
    return docs.select(
        "doc_id", *(c.alias(name) for name, c in e.items())
    )


def _token_bucket(col: Column) -> Column:
    from quebic_spark.operators.sampling import hash_bucket

    return hash_bucket(col, N_BUCKETS)


def _sparse_features(docs: DataFrame) -> DataFrame:
    """Per-doc hashed term counts: (doc_id, bucket, cnt)."""
    return (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        .groupBy("doc_id", _token_bucket(F.col("tok")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_quality_classifier(
    docs: DataFrame, iters: int = 25
) -> QualityModel:
    """Train on the md5 slice ``bucket(doc_id) < CLS_TRAIN_PCT``.

    Collects ONLY the training slice (driver-sized by the split pct;
    a real deployment trains on its labeled sample, not the corpus).
    Rows are sorted in pandas after the fetch, so the learned weights
    do not depend on partitioning or task order. ``iters`` matches
    the Newton-IRLS solver's default — it reaches the ridge optimum
    in a handful of steps (the old 300 was a leftover from the
    replaced gradient-descent solver, r15 review; still a fixed count
    for determinism, never an early-stop).
    """
    import numpy as np

    from quebic_spark.functions.linear import train_logreg
    from quebic_spark.operators.sampling import hash_bucket

    train_docs = docs.filter(
        hash_bucket(F.col("doc_id")) < CLS_TRAIN_PCT
    )
    # ONE collected frame: every doc appears in the sparse side (every
    # doc has >= 1 token), so attaching the per-doc dense features to
    # the (doc_id, bucket, cnt) rows fetches the whole sample in a
    # single Spark job instead of two
    feats = (
        _sparse_features(train_docs)
        .join(_dense_features(train_docs), "doc_id")
        .toPandas()
        .sort_values(["doc_id", "bucket"], ignore_index=True)
    )

    doc_ids, first_idx = np.unique(
        feats["doc_id"].to_numpy(), return_index=True
    )
    n = len(doc_ids)
    X = np.zeros((n, 2 + N_BUCKETS))
    X[:, 0] = feats["dr"].to_numpy()[first_idx]
    X[:, 1] = feats["ls"].to_numpy()[first_idx]
    n_toks = np.maximum(feats["n_toks"].to_numpy()[first_idx], 1.0)
    rows = np.searchsorted(doc_ids, feats["doc_id"].to_numpy())
    X[rows, 2 + feats["bucket"].to_numpy()] = (
        feats["cnt"].to_numpy(dtype=np.float64) / n_toks[rows]
    )
    y = feats["label"].to_numpy(dtype=np.float64)[first_idx]

    w, b = train_logreg(X, y, iters=iters)
    return QualityModel(
        w_dense=(float(w[0]), float(w[1])),
        w_buckets=[float(v) for v in w[2:]],
        bias=float(b),
        n_train=n,
    )


def classifier_prob_col(
    model: QualityModel, text_col: str = "text"
) -> Column:
    """P(quality) as a pure column expression over ``text_col``.

    SCAN-RESIDENT scoring — the fastText property that makes linear
    filters viable at corpus scale: the learned weights embed as a
    256-double array literal and the sparse dot product is a single
    ``aggregate()`` fold over the token array (each token md5-hashes
    to its bucket inside the lambda). Zero joins, zero shuffles, zero
    UDFs — so a pipeline can use the classifier as one more predicate
    in a fused DAG (see ``pipeline.release_corpus``)."""
    w_arr = F.array(*[F.lit(w) for w in model.w_buckets])
    wc = F.aggregate(
        tokens(F.col(text_col)),
        F.lit(0.0),
        lambda acc, t: acc
        + F.element_at(w_arr, _token_bucket(t) + 1),
    )
    e = _dense_exprs(text_col)
    z = (
        F.lit(model.bias)
        + F.lit(model.w_dense[0]) * e["dr"]
        + F.lit(model.w_dense[1]) * e["ls"]
        + wc / F.greatest(e["n_toks"], F.lit(1.0))
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def score_quality_classifier(
    docs: DataFrame, model: QualityModel
) -> DataFrame:
    """Score every doc: ``doc_id, prob, pred, label`` — one codegen'd
    projection over the scan (see :func:`classifier_prob_col`)."""
    prob = classifier_prob_col(model)
    e = _dense_exprs()
    return docs.select(
        "doc_id",
        prob.alias("prob"),
        (prob >= 0.5).alias("pred"),
        e["label"].alias("label"),
    )


MODEL_FORMAT = "quality-logreg-v1"


def save_quality_model(spark, model: QualityModel, path: str) -> None:
    """Persist the trained model as JSON (exact float round-trip via
    repr — the loaded model scores bit-identically) through the FS
    connector, staged-rename atomic like the IVF quantizer artifact
    (r15 review: the hand-rolled local json.dump + os.replace copy
    could not reach a non-local release root at all; this is the ONE
    dispatch the tokenizer and quantizer artifacts already use). A
    real pipeline trains once offline and ships the artifact to every
    scoring job."""
    from quebic_spark.sources.io import fs_write_json_path

    fs_write_json_path(
        spark, path,
        {
            "format": MODEL_FORMAT,
            "n_buckets": N_BUCKETS,
            "w_dense": list(model.w_dense),
            "w_buckets": model.w_buckets,
            "bias": model.bias,
            "n_train": model.n_train,
        },
    )


def load_quality_model(spark, path: str) -> QualityModel:
    from quebic_spark.sources.io import fs_read_json_path

    d = fs_read_json_path(spark, path)
    if d is None:
        raise FileNotFoundError(path)
    if d.get("format") != MODEL_FORMAT:
        raise ValueError(
            f"unsupported model format {d.get('format')!r}"
        )
    if d.get("n_buckets") != N_BUCKETS:
        raise ValueError(
            f"model hashed with {d.get('n_buckets')} buckets, "
            f"runtime uses {N_BUCKETS} — feature spaces differ"
        )
    return QualityModel(
        w_dense=(d["w_dense"][0], d["w_dense"][1]),
        w_buckets=d["w_buckets"],
        bias=d["bias"],
        n_train=d["n_train"],
    )


def q_quality_classifier_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Driver gate: train on the md5 slice, evaluate held-out, emit
    portable facts + contract booleans (learned-component pattern)."""
    from quebic_spark.operators.sampling import hash_bucket
    from quebic_spark.plans.fanout import fan_out
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)
    docs = fan_out(
        spark, read_immutable_parquet(spark, f"{sf_dir}/documents.parquet")
    )
    model = train_quality_classifier(docs)
    held_out = docs.filter(
        hash_bucket(F.col("doc_id")) >= CLS_TRAIN_PCT
    )
    scored = score_quality_classifier(held_out, model)
    row = scored.agg(
        F.count(F.lit(1)).alias("n_eval"),
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias(
            "acc"
        ),
        F.sum(F.col("label").cast("long")).alias("n_pos"),
    ).collect()[0]
    if not row["n_eval"]:
        # avg() over zero rows is NULL; fail fast with the actionable
        # cause instead of a TypeError in the arithmetic below
        raise ValueError(
            "held-out slice is empty — every doc_id hashed below "
            f"CLS_TRAIN_PCT={CLS_TRAIN_PCT}; lower the split"
        )
    # the portable fact is the exact positive-label COUNT, not a
    # rounded ratio (r15 review): Python round() is half-to-even while
    # DuckDB round() is half-away-from-zero, so a dyadic tie like
    # 187/352 = 0.53125 hashed differently across the two engines —
    # integers can't drift. base_rate stays driver-side for the
    # contract booleans only.
    n_pos = int(row["n_pos"])
    base_rate = max(n_pos, row["n_eval"] - n_pos) / row["n_eval"]
    return spark.range(1).select(
        F.lit(int(model.n_train)).cast("bigint").alias("n_train"),
        F.lit(int(row["n_eval"])).cast("bigint").alias("n_eval"),
        F.lit(n_pos).cast("bigint").alias("n_pos"),
        F.lit(bool(row["acc"] >= CLS_ACC_FLOOR)).alias(
            "acc_above_floor"
        ),
        F.lit(bool(row["acc"] >= base_rate)).alias("beats_base_rate"),
    )


def _classifier_oracle() -> str:
    from quebic_spark.operators.sampling import _hash_bucket_sql

    return f"""
WITH lab AS (
  SELECT doc_id,
         CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)
           / len(string_split(text,' ')) * 0.5
         + least(len(string_split(text,' ')) / 100.0, 1.0) * 0.5
           >= {CLS_LABEL_THRESHOLD} AS label,
         {_hash_bucket_sql("doc_id")} < {CLS_TRAIN_PCT} AS is_train
  FROM documents
),
ev AS (
  SELECT CAST(SUM(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pos,
         COUNT(*) AS n_eval
  FROM lab WHERE NOT is_train
)
SELECT (SELECT COUNT(*) FROM lab WHERE is_train) AS n_train,
       n_eval,
       n_pos,
       TRUE AS acc_above_floor,
       TRUE AS beats_base_rate
FROM ev
"""


ORACLE_QUALITY_CLASSIFIER_EVAL = _classifier_oracle()


QUERIES = {
    "quality_classifier_eval": q_quality_classifier_eval,
}

ORACLES = {
    "quality_classifier_eval": ORACLE_QUALITY_CLASSIFIER_EVAL,
}
