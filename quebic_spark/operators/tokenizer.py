"""Learned BPE tokenizer over the ``documents`` table.

North-star extension (SURVEY §2.10): the tokenizer-TRAINING step of a
data pipeline, not just the BPE-ish regex basis `functions/text.py`
offers. Training consumes only the Spark-aggregated word-frequency
dict, bounded by a min-frequency floor plus a deterministic
top-``BPE_MAX_VOCAB`` cap applied BEFORE the driver collect (the
classic BPE formulation; r7 — an uncapped web-scale vocab is a
driver OOM); application broadcasts the merge ranks into an
Arrow-batched pandas UDF with per-batch word memoization, so apply
cost scales with DISTINCT words per batch, not token occurrences.

Gate discipline (learned component): the merge table is data-
dependent, so the eval emits portable facts (doc/word counts — the
DuckDB-replayable side) plus in-plan contract booleans: exact
round-trip (token concatenation reproduces every word), and fertility
strictly below character-level (the merges actually bite). The full
oracle runs in tests/test_registry.py — the driver window is full.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quebic_spark.session import read_immutable_parquet

from quebic_spark.functions.text import tokens

BPE_MERGES = 200
BPE_TRAIN_PCT = 50     # md5 slice that supplies the word counts
# Driver-side training input is CAPPED (r7): 100 TB of web text holds
# billions of distinct "words" (URLs, hex ids, typos) — an uncapped
# collect() is a driver OOM. Classic BPE practice: drop sub-floor
# hapax noise, keep the deterministic top-N by (count desc, word asc).
BPE_MIN_COUNT = 2
BPE_MAX_VOCAB = 100_000


class BPEModel(NamedTuple):
    merges: list  # list[tuple[str, str]], rank = position


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) corpus frequencies — the entire training input."""
    return (
        docs.select(
            F.explode(tokens(F.col(text_col))).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def train_bpe_tokenizer(
    docs: DataFrame,
    n_merges: int = BPE_MERGES,
    min_count: int = BPE_MIN_COUNT,
    max_vocab: int = BPE_MAX_VOCAB,
) -> BPEModel:
    """Train on the corpus word-frequency dict, collected AFTER a
    min-frequency floor and a deterministic top-``max_vocab`` cap
    (count desc, word asc tie-break) — the driver never sees more
    than ``max_vocab`` rows regardless of corpus size. Sub-floor
    hapax noise (URLs, hex ids, typos) carries no repeated pair mass
    for BPE anyway; the cap turns "vocab-sized" from an assumption
    into a bound."""
    from quebic_spark.functions.bpe import train_bpe

    capped = (
        word_counts(docs)
        .filter(F.col("n") >= min_count)
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_vocab)
    )
    counts = {r["word"]: r["n"] for r in capped.collect()}
    return BPEModel(merges=train_bpe(counts, n_merges))


def save_bpe_model(spark, model: BPEModel, path: str) -> None:
    """Persist the merge table as JSON through the FS connector (same
    artifact discipline as the classifier/LM/quantizer models): the
    tokenizer a release was built with must ship beside the release,
    wherever that root lives."""
    from quebic_spark.sources.io import fs_write_json_path

    fs_write_json_path(
        spark, path,
        {"format": "bpe-merges-v1", "merges": [list(m) for m in model.merges]},
    )


def load_bpe_model(spark, path: str) -> BPEModel:
    from quebic_spark.sources.io import fs_read_json_path

    stored = fs_read_json_path(spark, path)
    if stored is None:
        raise FileNotFoundError(path)
    if stored.get("format") != "bpe-merges-v1":
        raise ValueError(
            f"not a BPE model artifact: {stored.get('format')!r}"
        )
    return BPEModel(merges=[tuple(m) for m in stored["merges"]])


def tokenize_with(
    docs: DataFrame, model: BPEModel, text_col: str = "text"
) -> DataFrame:
    """Adds ``bpe_tokens`` (array<string>) per row: whitespace words
    sub-tokenized by the learned merges. Arrow-batched; per-batch
    word cache => cost per distinct word."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from quebic_spark.functions.bpe import bpe_ranks, bpe_word

    ranks = bpe_ranks([tuple(m) for m in model.merges])

    def run(s):  # (pd.Series) -> pd.Series; hints omitted —
        # function-local `pd` makes Spark 4's string-hint
        # resolution raise UNSUPPORTED_SIGNATURE (r15)
        cache: dict[str, list[str]] = {}

        def one(text: str) -> list[str]:
            out: list[str] = []
            for w in (text or "").split(" "):
                hit = cache.get(w)
                if hit is None:
                    hit = bpe_word(w, ranks)
                    cache[w] = hit
                out.extend(hit)
            return out

        return pd.Series([one(t) for t in s])

    # no explicit functionType: the legacy PandasUDFType form is
    # deprecated (SPARK-28264) and warned on every call; Spark 4
    # resolves the Series->Series shape from the hints (r15 review)
    udf = pandas_udf(run, "array<string>")
    return docs.withColumn("bpe_tokens", udf(F.col(text_col)))


def q_bpe_tokenizer_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train on the md5 slice, apply to EVERY doc, emit portable
    facts + contract booleans (learned-component gate pattern)."""
    from quebic_spark.operators.sampling import hash_bucket
    from quebic_spark.plans.fanout import fan_out
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)
    docs = fan_out(
        spark, read_immutable_parquet(spark, f"{sf_dir}/documents.parquet")
    )
    model = train_bpe_tokenizer(
        docs.filter(hash_bucket(F.col("doc_id")) < BPE_TRAIN_PCT)
    )

    toks = tokens(F.col("text"))
    n_words = F.size(F.filter(toks, lambda w: w != ""))
    n_chars_in_words = F.length(F.regexp_replace("text", " ", ""))
    applied = tokenize_with(docs, model).select(
        "doc_id",
        n_words.alias("n_words"),
        n_chars_in_words.alias("n_chars"),
        F.size("bpe_tokens").alias("n_bpe"),
        # round-trip: concatenating the subword tokens must rebuild
        # the text with every space removed (merges never cross
        # word boundaries; empty words contribute nothing)
        (
            F.concat_ws("", F.col("bpe_tokens"))
            == F.regexp_replace("text", " ", "")
        ).alias("rt"),
    )
    row = applied.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_chars").alias("chars"),
        F.sum("n_bpe").alias("bpe"),
        F.min(F.col("rt").cast("int")).alias("rt_min"),
    ).collect()[0]
    return spark.range(1).select(
        F.lit(int(row["n_docs"])).cast("bigint").alias("n_docs"),
        F.lit(int(row["words"])).cast("bigint").alias("n_words"),
        # the productive merge count is data-dependent (training
        # stops when no pair repeats — the tiny synthetic vocab
        # saturates well under BPE_MERGES), so the portable contract
        # is the bound, not the count
        F.lit(
            bool(0 < len(model.merges) <= BPE_MERGES)
        ).alias("merges_within_bound"),
        F.lit(bool(row["rt_min"] == 1)).alias("roundtrip_exact"),
        # fertility: learned merges must compress below character
        # level AND reach within 3x of word level on this corpus
        F.lit(bool(row["bpe"] < row["chars"])).alias(
            "beats_char_level"
        ),
        F.lit(bool(row["bpe"] <= 3 * row["words"])).alias(
            "fertility_le_3"
        ),
        # the driver-collect bound is part of the gated contract
        F.lit(BPE_MIN_COUNT).cast("bigint").alias("train_min_count"),
        F.lit(BPE_MAX_VOCAB).cast("bigint").alias("train_vocab_cap"),
    )


def _bpe_oracle() -> str:
    return f"""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
)
SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
       COUNT(*) FILTER (WHERE word <> '') AS n_words,
       TRUE AS merges_within_bound,
       TRUE AS roundtrip_exact,
       TRUE AS beats_char_level,
       TRUE AS fertility_le_3,
       CAST({BPE_MIN_COUNT} AS BIGINT) AS train_min_count,
       CAST({BPE_MAX_VOCAB} AS BIGINT) AS train_vocab_cap
FROM w
"""


ORACLE_BPE_TOKENIZER_EVAL = _bpe_oracle()


QUERIES = {
    "bpe_tokenizer_eval": q_bpe_tokenizer_eval,
}

ORACLES = {
    "bpe_tokenizer_eval": ORACLE_BPE_TOKENIZER_EVAL,
}
