"""Multimodal column operators: opaque binary payloads + typed metadata.

North-star extension layer (SURVEY §2.10): image/audio/video are
``binary`` columns with metadata structs; decode / feature-extraction
runs as Arrow-batched ``mapInPandas``. The container has no imaging
libs, so the decode step is a clearly-marked deterministic fake behind
the real Spark plumbing (schema, batching, partitioning) — swap
``_fake_decode`` for a PIL/ffmpeg call on a real cluster.

``documents ⋈ embeddings`` on ``doc_id = vec_id`` plays the role of the
text+vector multimodal pair in the driver testdata.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# multimodal_manifest — binary payload column + metadata struct + the
# text⋈vector join. The payload is the utf-8 encoded text (a stand-in
# for image bytes); sizes/dims are real DataFrame ops over it.
# ---------------------------------------------------------------------------

def q_multimodal_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn(
        "payload", F.encode(F.col("text"), "UTF-8")
    )
    emb = _emb(spark, sf_dir)
    return (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .select(
            "doc_id",
            "lang",
            "source",
            F.length("payload").alias("payload_bytes"),
            F.md5(F.col("payload").cast("string")).alias("payload_md5"),
            F.size("embedding").alias("emb_dim"),
            "label",
        )
    )


ORACLE_MULTIMODAL_MANIFEST = """
SELECT doc_id, lang, source,
       octet_length(encode(text)) AS payload_bytes,
       md5(text) AS payload_md5,
       len(embedding) AS emb_dim,
       label
FROM documents JOIN embeddings ON doc_id = vec_id
"""


# ---------------------------------------------------------------------------
# multimodal_decode — mapInPandas "decode" pipeline over binary
# payloads. Deterministic fake dims derived from payload bytes (STUB:
# a real deployment decodes image headers here); the Spark-side batch
# plumbing (Arrow batches in, typed rows out) is the real thing, and
# the arithmetic is mirrored by the oracle.
# ---------------------------------------------------------------------------

DECODE_SCHEMA = (
    "doc_id bigint, payload_bytes int, width int, height int, "
    "n_frames int"
)


def _fake_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        n = pdf["payload"].map(len)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": n.astype("int32"),
                # STUB decode: dims derived deterministically from size.
                # Replace with PIL.Image.open(...).size on a real cluster.
                "width": (n % 640 + 1).astype("int32"),
                "height": (n % 480 + 1).astype("int32"),
                "n_frames": (n % 16 + 1).astype("int32"),
            }
        )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    return docs.mapInPandas(_fake_decode, DECODE_SCHEMA)


ORACLE_MULTIMODAL_DECODE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS payload_bytes,
       CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height,
       CAST(octet_length(encode(text)) % 16 + 1 AS INT) AS n_frames
FROM documents
"""


QUERIES = {
    "multimodal_manifest": q_multimodal_manifest,
    "multimodal_decode": q_multimodal_decode,
}

ORACLES = {
    "multimodal_manifest": ORACLE_MULTIMODAL_MANIFEST,
    "multimodal_decode": ORACLE_MULTIMODAL_DECODE,
}
