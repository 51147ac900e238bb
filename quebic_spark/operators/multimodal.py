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


# ---------------------------------------------------------------------------
# frame_sample — one row per sampled "video" frame: the batch-expanding
# mapInPandas shape (rows out > rows in) that real frame extraction
# uses. Frames are deterministic fake slices of the payload (STUB:
# an ffmpeg/pyav keyframe iterator on a real cluster); frame timestamps
# and content hashes are real columnar outputs.
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_ts_ms int, frame_md5 string"
FRAME_STRIDE_BYTES = 64  # fake frame length inside the payload
FRAME_INTERVAL_MS = 40   # 25 "fps"


def frame_sample(payloads: DataFrame, every_nth: int = 4) -> DataFrame:
    """Sample every ``every_nth`` frame from each payload.

    Input: (doc_id, payload binary, n_frames int). Output: one row per
    SAMPLED frame — the explode happens inside the Arrow batch, so a
    10-minute video never materializes as one driver-side object.
    """
    import hashlib

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts_ms": [],
                "frame_md5": [],
            }
            for doc_id, payload, n_frames in zip(
                pdf["doc_id"], pdf["payload"], pdf["n_frames"]
            ):
                for i in range(0, int(n_frames), every_nth):
                    lo = (i * FRAME_STRIDE_BYTES) % max(len(payload), 1)
                    frame = bytes(payload[lo:lo + FRAME_STRIDE_BYTES])
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(i * FRAME_INTERVAL_MS)
                    out["frame_md5"].append(
                        hashlib.md5(frame).hexdigest()
                    )
            yield pd.DataFrame(out)

    return payloads.mapInPandas(sample, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# extract_features — payload -> fixed-dim float vector (the
# decode-then-embed shape). The fake featurizer is a byte histogram
# folded to ``dim`` (STUB: a real model forward pass); the Arrow batch
# contract — binary in, array<float> out, row counts preserved — is
# the real thing.
# ---------------------------------------------------------------------------

def extract_features(payloads: DataFrame, dim: int = 16) -> DataFrame:
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                hist = np.bincount(
                    np.frombuffer(bytes(payload), dtype=np.uint8),
                    minlength=256,
                ).astype(np.float32)
                folded = hist.reshape(dim, 256 // dim).sum(axis=1)
                total = folded.sum()
                feats.append(
                    (folded / total if total else folded).tolist()
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": feats}
            )

    return payloads.mapInPandas(
        featurize, "doc_id bigint, features array<float>"
    )


# ---------------------------------------------------------------------------
# resize_dims — aspect-preserving fit into a bounding box. Pure JVM
# column arithmetic: resize METADATA is columnar; the pixel work would
# live inside the same mapInPandas batch as the decode.
# ---------------------------------------------------------------------------

def resize_dims(decoded: DataFrame, max_w: int, max_h: int) -> DataFrame:
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
    )
    return decoded.withColumns(
        {
            "out_width": F.greatest(
                F.lit(1), F.floor(F.col("width") * scale).cast("int")
            ),
            "out_height": F.greatest(
                F.lit(1), F.floor(F.col("height") * scale).cast("int")
            ),
        }
    )


QUERIES = {
    "multimodal_manifest": q_multimodal_manifest,
    "multimodal_decode": q_multimodal_decode,
}

ORACLES = {
    "multimodal_manifest": ORACLE_MULTIMODAL_MANIFEST,
    "multimodal_decode": ORACLE_MULTIMODAL_DECODE,
}
