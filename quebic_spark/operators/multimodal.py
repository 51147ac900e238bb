"""Multimodal column operators: opaque binary payloads + typed metadata.

North-star extension layer (SURVEY §2.10): image/audio/video are
``binary`` columns with metadata structs; decode / feature-extraction
runs as Arrow-batched ``mapInPandas``. Two decode tiers:

* REAL decoders for formats parseable with stdlib + numpy (24-bit BMP
  header+pixel parsing, PCM WAV via the wave module, non-interlaced
  8-bit RGB PNG via zlib inflate + scanline unfiltering, baseline
  DCT JPEG via ``functions/jpeg.py``, MP4 via the ISO-BMFF box walk —
  container metadata always; real first-frame pixels when the track
  is Motion-JPEG (r16), metadata-only for inter-frame codecs like
  H.264 whose pixel decode stays out of scope) —
  ``decode_media`` auto-detects by magic bytes;
* the clearly-marked deterministic stub (``_fake_decode`` /
  ``_stub_dims``) for everything needing PIL/ffmpeg, which this
  container does not have — swap in the real call on a real cluster.
  Unknown formats fall back to the stub path (flagged via ``fmt``)
  instead of failing the scan.

``documents ⋈ embeddings`` on ``doc_id = vec_id`` plays the role of the
text+vector multimodal pair in the driver testdata.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quebic_spark.session import read_immutable_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quebic_spark.session import tune_for_query

    tune_for_query(spark)
    return read_immutable_parquet(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_immutable_parquet(spark, f"{sf_dir}/embeddings.parquet")


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
        # NULL payloads quarantine as 0-byte, matching decode_media's
        # None -> b'' coercion — len(None) killed the task (r15 review)
        n = pdf["payload"].map(lambda p: 0 if p is None else len(p))
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
# uses. Frames are deterministic fake slices of the payload (STUB for
# codec formats this container can't decode — for MJPEG/AVI the REAL
# pixel-decoding tier is ``video_frame_sample`` below, r9); frame
# timestamps and content hashes are real columnar outputs.
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
                # NULL payload/n_frames: zero frames sampled, never
                # a task-killing TypeError (r15 review —
                # decode_media's contract: one bad row must not abort
                # the scan). Arrow hands a nullable int column to
                # pandas as float64, so the NULL arrives as NaN, not
                # None — pd.isna covers both.
                payload = payload if payload is not None else b""
                n_frames = 0 if pd.isna(n_frames) else int(n_frames)
                for i in range(0, n_frames, every_nth):
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

    if dim < 1 or 256 % dim != 0:
        # fail at CALL time with the real cause — a non-divisor dim
        # previously killed the whole job at action time with an
        # opaque executor-side reshape error (r13 review, reproduced)
        raise ValueError(
            f"dim must be a divisor of 256 (the byte-histogram "
            f"fold), got {dim}"
        )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                # NULL -> empty histogram row (all-zero vector), not a
                # task-killing TypeError (r15 review)
                payload = payload if payload is not None else b""
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
    # dimensionless rows (audio, quarantined decodes: width/height
    # NULL) must come out NULL — Spark's least()/greatest() SKIP null
    # arguments rather than propagate them, so the unguarded
    # expression fabricated 1x1 "image" dims for every WAV row (r13
    # review, reproduced). Zero-dimension rows too (r15): the decoders
    # pass width=0/height=0 through, and max_w/0.0 = +Infinity made
    # least() pick 1.0, fabricating a valid-looking 1x1 from a
    # 0-pixel image.
    has_dims = (
        F.col("width").isNotNull() & F.col("height").isNotNull()
        & (F.col("width") > 0) & (F.col("height") > 0)
    )
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
    )
    return decoded.withColumns(
        {
            "out_width": F.when(
                has_dims,
                F.greatest(
                    F.lit(1),
                    F.floor(F.col("width") * scale).cast("int"),
                ),
            ),
            "out_height": F.when(
                has_dims,
                F.greatest(
                    F.lit(1),
                    F.floor(F.col("height") * scale).cast("int"),
                ),
            ),
        }
    )


# ---------------------------------------------------------------------------
# REAL decoders — formats parseable with stdlib + numpy alone (the
# container has no PIL/ffmpeg; BMP, PCM-WAV, and zlib-deflated PNG
# need neither). These are
# actual byte-level decoders, not stubs: they parse headers, validate
# magic/geometry, and touch every pixel/sample (mean value proves it).
# ``decode_media`` auto-detects per row and falls back to the
# deterministic stub arithmetic for unknown payloads, so one pipeline
# handles a mixed-format corpus and the stub path stays exercised on
# the synthetic text payloads.
# ---------------------------------------------------------------------------

MEDIA_SCHEMA = (
    "doc_id bigint, fmt string, payload_bytes int, width int, "
    "height int, n_frames int, sample_rate int, channels int, "
    "mean_value double"
)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def detect_format(payload: bytes) -> str:
    if payload[:8] == PNG_MAGIC:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if (
        payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
        and len(payload) >= 44
    ):
        return "wav"
    if (
        payload[:4] == b"RIFF"
        and payload[8:12] == b"AVI "
        and len(payload) >= 24
    ):
        return "avi"
    if len(payload) >= 12 and payload[4:8] in (b"ftyp", b"styp"):
        # styp = a standalone DASH/CMAF media segment (moof/mdat with
        # no moov) — routed to the MP4 tier so it quarantines as
        # fmt=mp4/decodable=false instead of reading as 'unknown'
        # (r18; decoding needs the init segment's moov by design)
        return "mp4"
    if len(payload) >= 12 and payload[4:8] in (
        b"moov", b"mdat", b"wide", b"skip", b"free", b"pnot",
        b"moof",
    ):
        # classic QuickTime .mov files — the main real-world carrier
        # of the 'jpeg'/'mjpa'/'mjpb' MJPEG fourccs this tier decodes
        # — often lack a leading ftyp box; they open directly with a
        # top-level moov/mdat (or a wide/skip/free/pnot pad box).
        # Without this they fell to 'unknown' and were quarantined
        # despite being fully decodable (r17 advice). The size field
        # must look like a real box (0 = to-end is legal for mdat)
        # so arbitrary text starting with these letters at offset 4
        # doesn't get misrouted — it would quarantine anyway, but the
        # fmt label should stay honest. size 0 (to-end) and 1
        # (64-bit largesize follows) are both legal leading forms —
        # a ftyp-less .mov often opens with a largesize mdat (r17).
        import struct

        size = struct.unpack_from(">I", payload, 0)[0]
        if size in (0, 1) or 8 <= size <= len(payload):
            return "mp4"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return "unknown"


def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in
    ``data[start:end]`` (32-bit sizes; size 0 = to-end; size 1 =
    64-bit extended largesize, parsed since r17)."""
    import struct

    pos = start
    while pos + 8 <= end:
        size, btype = struct.unpack_from(">I4s", data, pos)
        if size == 0:
            yield btype, pos + 8, end
            return
        if size == 1:
            # extended 64-bit size (size==1 + largesize field): some
            # muxers emit it for ANY mdat regardless of actual size
            # (r17 — this used to reject loudly, quarantining small
            # real-world files)
            if pos + 16 > end:
                raise ValueError(f"truncated 64-bit box header at {pos}")
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            if size < 16 or pos + size > end:
                raise ValueError(f"bad box size {size} at {pos}")
            yield btype, pos + 16, pos + size
            pos += size
            continue
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} at {pos}")
        yield btype, pos + 8, pos + size
        pos += size


def _mp4_find(data: bytes, start: int, end: int, *path: bytes):
    """Body extent of the first box at the given nesting path."""
    for btype, b0, b1 in _mp4_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _mp4_find(data, b0, b1, *path[1:])
    return None


# QuickTime/ISO Motion-JPEG sample-entry fourccs: every sample is a
# standalone JPEG image, so functions/jpeg.py decodes real pixels —
# the same honesty tier as the AVI/MJPEG path. Anything else
# (avc1/hvc1/...) is an entropy-coded inter-frame codec and stays
# metadata-only by design.
_MJPEG_MP4_CODECS = (b"jpeg", b"mjpa", b"mjpb")


def _mp4_video_trak(payload: bytes):
    """Body extent of the first trak whose tkhd has a nonzero visual
    extent (the video track), plus its parsed (width, height).
    Returns ``(b0, b1, width, height)`` or None."""
    import struct

    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    for btype, b0, b1 in _mp4_boxes(payload, moov[0], moov[1]):
        if btype != b"trak":
            continue
        tkhd = _mp4_find(payload, b0, b1, b"tkhd")
        if tkhd is None:
            continue
        # w/h as 16.16 fixed; their offset depends on the tkhd
        # VERSION (v1 widens the three time fields to 64 bits:
        # 76 -> 88). Reading v1 at the v0 offset lands in the matrix
        # and silently misparses (review catch).
        tk_ver = payload[tkhd[0]]
        if tk_ver not in (0, 1):
            raise ValueError(f"unsupported tkhd version {tk_ver}")
        wh_off = 76 if tk_ver == 0 else 88
        w_fx, h_fx = struct.unpack_from(
            ">II", payload, tkhd[0] + wh_off
        )
        if w_fx == 0 or h_fx == 0:
            continue  # audio/hint track
        return b0, b1, w_fx >> 16, h_fx >> 16
    return None


def _mp4_stsd_fourcc(payload: bytes, trak_b0: int, trak_b1: int):
    """First sample-entry fourcc of the track's stsd, or None when the
    stsd box is absent (metadata-only containers)."""
    import struct

    stsd = _mp4_find(
        payload, trak_b0, trak_b1, b"mdia", b"minf", b"stbl", b"stsd"
    )
    if stsd is None:
        return None
    n_entries = struct.unpack_from(">I", payload, stsd[0] + 4)[0]
    if n_entries < 1 or stsd[0] + 16 > stsd[1]:
        raise ValueError("malformed stsd (no sample entries)")
    entry_size = struct.unpack_from(">I", payload, stsd[0] + 8)[0]
    if entry_size < 8 or stsd[0] + 8 + entry_size > stsd[1]:
        raise ValueError(f"bad stsd entry size {entry_size}")
    return payload[stsd[0] + 12:stsd[0] + 16]


def _mp4_sample_table(payload: bytes, trak_b0: int, trak_b1: int):
    """Parse the track's stsz/stsc/stco|co64 into ``(sizes,
    chunk_offsets, stsc_entries)`` — everything needed to locate every
    sample's byte extent (co64's 64-bit offsets accepted since r17);
    a missing table box raises (callers only reach here after the
    stsd codec check said the samples are decodable)."""
    import struct

    stbl = _mp4_find(
        payload, trak_b0, trak_b1, b"mdia", b"minf", b"stbl"
    )
    if stbl is None:
        raise ValueError("no stbl box")
    found = {}
    for btype, b0, b1 in _mp4_boxes(payload, stbl[0], stbl[1]):
        if btype in (b"stsz", b"stsc", b"stco", b"co64"):
            found[btype] = (b0, b1)
    for need in (b"stsz", b"stsc"):
        if need not in found:
            raise ValueError(f"no {need.decode()} box")
    if b"stco" not in found and b"co64" not in found:
        raise ValueError("no stco/co64 box")

    b0, b1 = found[b"stsz"]
    uniform, count = struct.unpack_from(">II", payload, b0 + 4)
    if uniform:
        # bound count BEFORE materializing: count is an unchecked
        # uint32 straight from the payload, and every uniform-size
        # sample must lie inside the payload — so the total extent
        # can never exceed it. Without this, a <1 KiB crafted
        # container with count near 2^32 allocates a ~34 GB list
        # (OOM-killing the executor) instead of raising the
        # catchable error the quarantine contract relies on
        # (r17; VERDICT r16 #2). Mirrors the truncation checks the
        # non-uniform/stco/stsc tables already have.
        if uniform * count > len(payload):
            raise ValueError("stsz sample extent exceeds payload")
        sizes = [uniform] * count
    else:
        if b0 + 12 + 4 * count > b1:
            raise ValueError("stsz size table truncated")
        sizes = list(
            struct.unpack_from(f">{count}I", payload, b0 + 12)
        )

    # prefer stco when both exist (out-of-spec but unambiguous: they
    # must agree); co64 alone is valid and appears in SMALL files too —
    # some muxers write 64-bit offsets unconditionally (r17; used to
    # reject). Out-of-buffer offsets are caught by the walk's
    # per-sample extent check.
    if b"stco" in found:
        b0, b1 = found[b"stco"]
        width, fmt_ch = 4, "I"
    else:
        b0, b1 = found[b"co64"]
        width, fmt_ch = 8, "Q"
    n_chunks = struct.unpack_from(">I", payload, b0 + 4)[0]
    if b0 + 8 + width * n_chunks > b1:
        raise ValueError("chunk offset table truncated")
    chunk_offsets = list(
        struct.unpack_from(f">{n_chunks}{fmt_ch}", payload, b0 + 8)
    )

    b0, b1 = found[b"stsc"]
    n_ent = struct.unpack_from(">I", payload, b0 + 4)[0]
    if b0 + 8 + 12 * n_ent > b1:
        raise ValueError("stsc entry table truncated")
    stsc = []
    for i in range(n_ent):
        first_chunk, per_chunk, _desc = struct.unpack_from(
            ">III", payload, b0 + 8 + 12 * i
        )
        stsc.append((first_chunk, per_chunk))
    if not stsc or stsc[0][0] != 1:
        raise ValueError("stsc must start at chunk 1")
    # the walk below assumes runs in chunk order (spec-mandated); a
    # shuffled table would silently pick the wrong samples-per-chunk
    # and extract misaligned bytes — fail the container instead
    for prev, cur in zip(stsc, stsc[1:]):
        if cur[0] <= prev[0]:
            raise ValueError("stsc first_chunk not strictly ascending")
    return sizes, chunk_offsets, stsc


def _mp4_tkhd_track_id(payload: bytes, trak_b0: int, trak_b1: int) -> int:
    """track_ID from the trak's tkhd (v0: after two 32-bit times; v1:
    after two 64-bit times) — the join key between a track and its
    per-fragment traf boxes."""
    import struct

    tkhd = _mp4_find(payload, trak_b0, trak_b1, b"tkhd")
    if tkhd is None:
        raise ValueError("no tkhd box")
    if tkhd[0] >= tkhd[1] or tkhd[1] > len(payload):
        # body-length guard BEFORE the version byte read (ADVICE r18):
        # a truncated final box must raise the documented ValueError,
        # not IndexError
        raise ValueError("truncated tkhd")
    version = payload[tkhd[0]]
    off = tkhd[0] + (12 if version == 0 else 20)
    if off + 4 > tkhd[1]:
        raise ValueError("truncated tkhd")
    return struct.unpack_from(">I", payload, off)[0]


def _mp4_trex_defaults(payload: bytes) -> dict:
    """{track_ID: (default_sample_size, default_sample_duration)} from
    moov/mvex/trex — the per-track defaults fragment runs fall back to
    when tfhd/trun carry no explicit values (fMP4, r18)."""
    import struct

    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        return {}
    mvex = _mp4_find(payload, moov[0], moov[1], b"mvex")
    if mvex is None:
        return {}
    out = {}
    for btype, b0, b1 in _mp4_boxes(payload, mvex[0], mvex[1]):
        if btype != b"trex":
            continue
        if b0 + 24 > b1:
            raise ValueError("truncated trex")
        tid, _sdi, dur, size, _flags = struct.unpack_from(
            ">IIIII", payload, b0 + 4
        )
        out[tid] = (size or None, dur or None)
    return out


def _mp4_mehd_duration(payload: bytes):
    """Movie-extends fragment_duration (mehd v0/v1) or None — fMP4
    files typically carry mvhd duration 0 and the real total here."""
    import struct

    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        return None
    mehd = _mp4_find(payload, moov[0], moov[1], b"mvex", b"mehd")
    if mehd is None:
        return None
    version = payload[mehd[0]]
    if version == 0:
        if mehd[0] + 8 > mehd[1]:
            raise ValueError("truncated mehd")
        return struct.unpack_from(">I", payload, mehd[0] + 4)[0]
    if version == 1:
        if mehd[0] + 12 > mehd[1]:
            raise ValueError("truncated mehd v1")
        return struct.unpack_from(">Q", payload, mehd[0] + 4)[0]
    raise ValueError(f"mehd version {version} unsupported")


def _mp4_stsz_count(payload: bytes, trak_b0: int, trak_b1: int):
    """The stsz sample_count, or None when the box is absent. Count 0
    with movie fragments present is the fMP4 shape (empty stbl, all
    samples in per-fragment trun runs)."""
    import struct

    stsz = _mp4_find(
        payload, trak_b0, trak_b1, b"mdia", b"minf", b"stbl", b"stsz"
    )
    if stsz is None:
        return None
    if stsz[0] + 12 > stsz[1] or stsz[1] > len(payload):
        raise ValueError("truncated stsz")
    return struct.unpack_from(">I", payload, stsz[0] + 8)[0]


# tfhd/trun flag bits used by the fragment walk (ISO 14496-12 §8.8)
_TFHD_BASE_DATA_OFFSET = 0x000001
_TFHD_SAMPLE_DESC_IDX = 0x000002
_TFHD_DEFAULT_DURATION = 0x000008
_TFHD_DEFAULT_SIZE = 0x000010
_TFHD_DEFAULT_FLAGS = 0x000020
_TFHD_DEFAULT_BASE_IS_MOOF = 0x020000
_TRUN_DATA_OFFSET = 0x000001
_TRUN_FIRST_SAMPLE_FLAGS = 0x000004
_TRUN_SAMPLE_DURATION = 0x000100
_TRUN_SAMPLE_SIZE = 0x000200
_TRUN_SAMPLE_FLAGS = 0x000400
_TRUN_SAMPLE_CTS = 0x000800


def _mp4_fragment_samples(
    payload: bytes, track_id: int, count_only: bool = False
):
    """(offset, size) byte extents of every sample the movie fragments
    (top-level moof boxes) carry for ``track_id``, in fragment order —
    the fMP4/DASH/CMAF twin of the stbl walk (r18; reference scope is
    containers only, this is north-star multimodal tier).

    Base-offset modes (ISO 14496-12 §8.8.7): explicit tfhd
    base_data_offset, default-base-is-moof (what CMAF mandates), and —
    r19 — the legacy pre-CMAF IMPLICIT default: the first traf in a
    moof anchors at the moof's first byte, each later traf at the end
    of the PRECEDING traf's data. The implicit chain makes OTHER
    tracks' data extents load-bearing, so foreign trafs are walked
    only when some non-first traf actually needs the chain — a
    malformed audio traf cannot quarantine a file whose video track
    never depends on it — and an unresolvable predecessor extent
    raises only at the traf that needs it.

    ``count_only`` returns just the total sample count without
    resolving sizes (metadata tier for non-MJPEG codecs, where trun
    runs may omit sizes that only trex knows — or nobody does).

    Balloon discipline (the r16 stsz lesson): per-sample field bytes
    are bounds-checked against the trun extent BEFORE any loop, and a
    size-less run must fit ``n * default_size`` inside the payload, so
    a forged 2^31 sample_count dies in O(1) without materializing
    anything."""
    import struct

    trex = _mp4_trex_defaults(payload)
    samples: list = []
    total = 0

    def parse_tfhd(tb0: int, tb1: int):
        """(flags, track_ID, explicit base or None, default size) —
        bounds-checked BEFORE every unpack (ADVICE r18: truncated
        boxes must raise ValueError, never struct.error)."""
        tfhd = _mp4_find(payload, tb0, tb1, b"tfhd")
        if tfhd is None:
            raise ValueError("traf without tfhd")
        if tfhd[0] + 8 > tfhd[1]:
            raise ValueError("truncated tfhd")
        verflags = struct.unpack_from(">I", payload, tfhd[0])[0]
        flags = verflags & 0xFFFFFF
        tid = struct.unpack_from(">I", payload, tfhd[0] + 4)[0]
        off = tfhd[0] + 8
        base = None
        if flags & _TFHD_BASE_DATA_OFFSET:
            if off + 8 > tfhd[1]:
                raise ValueError("truncated tfhd")
            base = struct.unpack_from(">Q", payload, off)[0]
            off += 8
        if flags & _TFHD_SAMPLE_DESC_IDX:
            off += 4
        if flags & _TFHD_DEFAULT_DURATION:
            off += 4  # duration handled by the elst helper
        default_size = None
        if flags & _TFHD_DEFAULT_SIZE:
            if off + 4 > tfhd[1]:
                raise ValueError("truncated tfhd")
            default_size = struct.unpack_from(">I", payload, off)[0]
            off += 4
        if flags & _TFHD_DEFAULT_FLAGS:
            off += 4
        if off > tfhd[1]:
            raise ValueError("truncated tfhd")
        if default_size is None:
            default_size = trex.get(tid, (None, None))[0]
        return flags, tid, base, default_size

    def walk_truns(tb0, tb1, base, base_mode, default_size, collect):
        """Walk one traf's trun runs; returns the end of its data, or
        None when a size source is missing on a traf we only walked
        for its extent (harmless unless a later implicit traf needs
        it). Offset-less FIRST runs start AT the base for explicit
        and implicit modes (the spec default); under
        default-base-is-moof they would start inside the moof box
        itself — physically wrong, quarantined."""
        nonlocal total
        cursor: int | None = None
        end = base
        for t2, u0, u1 in _mp4_boxes(payload, tb0, tb1):
            if t2 != b"trun":
                continue
            if u0 + 8 > u1:
                raise ValueError("truncated trun")
            vf = struct.unpack_from(">I", payload, u0)[0]
            tflags = vf & 0xFFFFFF
            n = struct.unpack_from(">I", payload, u0 + 4)[0]
            p = u0 + 8
            if tflags & _TRUN_DATA_OFFSET:
                if p + 4 > u1:
                    raise ValueError("truncated trun")
                (doff,) = struct.unpack_from(">i", payload, p)
                p += 4
                cursor = base + doff
            if tflags & _TRUN_FIRST_SAMPLE_FLAGS:
                p += 4
            per_sample = 4 * (
                bool(tflags & _TRUN_SAMPLE_DURATION)
                + bool(tflags & _TRUN_SAMPLE_SIZE)
                + bool(tflags & _TRUN_SAMPLE_FLAGS)
                + bool(tflags & _TRUN_SAMPLE_CTS)
            )
            if p + n * per_sample > u1:
                raise ValueError(
                    f"trun sample fields ({n} x {per_sample}B) "
                    "exceed box extent"
                )
            if count_only:
                total += n
                continue
            if cursor is None:
                if base_mode in ("explicit", "implicit"):
                    cursor = base
                else:
                    raise ValueError(
                        "first trun carries no data_offset"
                    )
            if not (tflags & _TRUN_SAMPLE_SIZE):
                if not default_size:
                    if collect:
                        raise ValueError(
                            "no sample size in trun/tfhd/trex"
                        )
                    return None  # extent unknowable for this traf
                if cursor + n * default_size > len(payload):
                    raise ValueError(
                        "fragment run exceeds payload"
                    )
            sz_off = p + (
                4 if tflags & _TRUN_SAMPLE_DURATION else 0
            )
            for _ in range(n):
                if tflags & _TRUN_SAMPLE_SIZE:
                    size = struct.unpack_from(
                        ">I", payload, sz_off
                    )[0]
                else:
                    size = default_size
                sz_off += per_sample
                if cursor < 0 or cursor + size > len(payload):
                    raise ValueError(
                        f"fragment sample extent {cursor}+{size} "
                        f"overruns payload ({len(payload)} bytes)"
                    )
                if collect:
                    samples.append((cursor, size))
                cursor += size
            if cursor is not None:
                end = max(end, cursor)
        return end

    hdr = 0  # boxes are contiguous: this box's header = prev box's end
    for btype, b0, b1 in _mp4_boxes(payload, 0, len(payload)):
        if btype != b"moof":
            hdr = b1
            continue
        moof_hdr = hdr
        hdr = b1
        trafs = [
            (tb0, tb1) + parse_tfhd(tb0, tb1)
            for t, tb0, tb1 in _mp4_boxes(payload, b0, b1)
            if t == b"traf"
        ]
        if count_only:
            for tb0, tb1, flags, tid, base, dsz in trafs:
                if tid == track_id:
                    walk_truns(tb0, tb1, 0, "implicit", None, True)
            continue
        # walk foreign trafs only when a later traf's implicit base
        # depends on their data extent (see docstring)
        needs_chain = any(
            base is None and not (flags & _TFHD_DEFAULT_BASE_IS_MOOF)
            for _tb0, _tb1, flags, tid, base, dsz in trafs[1:]
        )
        prev_end: int | None = moof_hdr
        for i, (tb0, tb1, flags, tid, base, dsz) in enumerate(trafs):
            base_mode = "explicit"
            if base is None:
                if flags & _TFHD_DEFAULT_BASE_IS_MOOF:
                    base, base_mode = moof_hdr, "moof"
                else:
                    base_mode = "implicit"
                    if i == 0:
                        base = moof_hdr
                    elif prev_end is not None:
                        base = prev_end
                    else:
                        raise ValueError(
                            "implicit-base traf follows a traf whose "
                            "data extent could not be resolved"
                        )
            collect = tid == track_id
            if not collect and not needs_chain:
                prev_end = None  # not computed; nothing will need it
                continue
            prev_end = walk_truns(
                tb0, tb1, base, base_mode, dsz, collect
            )
    return total if count_only else samples


def _mp4_has_moof(payload: bytes) -> bool:
    return any(
        btype == b"moof"
        for btype, _, _ in _mp4_boxes(payload, 0, len(payload))
    )


def _mp4_first_presented_sample(
    payload: bytes, trak_b0: int, trak_b1: int
) -> int:
    """Index of the first PRESENTED sample after applying the track's
    edit list (r18, VERDICT r17 next #4): a nonzero elst media_time
    shifts which sample plays first, so decode_mp4's first-frame mean
    must skip the pre-roll instead of silently using storage-order
    sample 0.

    Returns 0 with no edts/elst. Leading EMPTY edits (media_time ==
    -1, a presentation delay) are skipped. Multi-entry splice programs
    map too (r19, VERDICT r18 #6): the FIRST real segment's media_time
    decides what plays first — later segments change what follows, not
    what opens. A first-segment media_rate of 1 plays and 0 dwells
    (freeze-frame of the same sample); any other rate quarantines.
    media_time (media-timescale units) maps to a sample index through
    stts, extended by the trex default duration over the fragment
    sample count when movie fragments are present (ADVICE r18: a
    hybrid stbl+moof file can legally put the edit point inside the
    fragment portion) — or through the trex default alone for
    fragmented tracks with an empty stts."""
    import struct

    elst = _mp4_find(payload, trak_b0, trak_b1, b"edts", b"elst")
    if elst is None:
        return 0
    if elst[0] + 8 > elst[1] or elst[1] > len(payload):
        raise ValueError("truncated elst")
    version = payload[elst[0]]
    if version not in (0, 1):
        raise ValueError(f"elst version {version} unsupported")
    n = struct.unpack_from(">I", payload, elst[0] + 4)[0]
    entry_bytes = 12 if version == 0 else 20
    if elst[0] + 8 + n * entry_bytes > elst[1]:
        raise ValueError("truncated elst")
    entries = []
    for i in range(n):
        off = elst[0] + 8 + i * entry_bytes
        if version == 0:
            _seg, media_time = struct.unpack_from(">Ii", payload, off)
            rate = struct.unpack_from(">h", payload, off + 8)[0]
        else:
            _seg, media_time = struct.unpack_from(">Qq", payload, off)
            rate = struct.unpack_from(">h", payload, off + 16)[0]
        entries.append((media_time, rate))
    # leading empty edits delay presentation but map no media
    while entries and entries[0][0] == -1:
        entries.pop(0)
    if not entries:
        raise ValueError("edit list with only empty edits")
    media_time, rate = entries[0]
    if rate not in (0, 1):
        raise ValueError(f"unsupported elst media_rate {rate}")
    if media_time < 0:
        raise ValueError(f"bad elst media_time {media_time}")
    if media_time == 0:
        return 0
    # map media_time -> sample index via stts (media timescale units
    # on both sides, no conversion needed)
    stts = _mp4_find(
        payload, trak_b0, trak_b1, b"mdia", b"minf", b"stbl", b"stts"
    )
    deltas: list[tuple[int, int]] = []
    if stts is not None:
        if stts[0] + 8 > stts[1] or stts[1] > len(payload):
            raise ValueError("truncated stts")
        n_runs = struct.unpack_from(">I", payload, stts[0] + 4)[0]
        if stts[0] + 8 + n_runs * 8 > stts[1]:
            raise ValueError("truncated stts")
        for i in range(n_runs):
            cnt, delta = struct.unpack_from(
                ">II", payload, stts[0] + 8 + i * 8
            )
            deltas.append((cnt, delta))
    if not deltas:
        # fragmented track: stts is empty; a uniform trex default
        # duration still maps the skip exactly
        tid = _mp4_tkhd_track_id(payload, trak_b0, trak_b1)
        default_dur = _mp4_trex_defaults(payload).get(
            tid, (None, None)
        )[1]
        if not default_dur:
            raise ValueError(
                "elst media_time with no stts and no trex default "
                "duration"
            )
        return media_time // default_dur
    idx = 0
    cum = 0
    for cnt, delta in deltas:
        if delta <= 0:
            raise ValueError(f"bad stts delta {delta}")
        run_span = cnt * delta
        if media_time < cum + run_span:
            return idx + (media_time - cum) // delta
        cum += run_span
        idx += cnt
    if _mp4_has_moof(payload):
        # hybrid stbl+moof (ADVICE r18): mp4_frames yields stbl
        # samples then fragment samples, so a media_time past the
        # stts span can legally land in the fragment portion —
        # extend the walk with the trex default duration over the
        # fragment sample count instead of quarantining a decodable
        # file
        tid = _mp4_tkhd_track_id(payload, trak_b0, trak_b1)
        default_dur = _mp4_trex_defaults(payload).get(
            tid, (None, None)
        )[1]
        if not default_dur:
            raise ValueError(
                "elst media_time lands in the fragment portion of a "
                "hybrid stbl+moof track with no trex default "
                "duration to map it"
            )
        frag_n = _mp4_fragment_samples(payload, tid, count_only=True)
        if media_time < cum + frag_n * default_dur:
            return idx + (media_time - cum) // default_dur
        cum += frag_n * default_dur
    raise ValueError(
        f"elst media_time {media_time} beyond track duration {cum}"
    )


def _mp4_mvhd_times(payload: bytes, mvhd: tuple) -> tuple:
    """(timescale, duration) from an mvhd body extent — version 0
    (32-bit times) and version 1 (64-bit times; r17, used to reject)
    layouts per ISO 14496-12 §8.2.2."""
    import struct

    b0, b1 = mvhd
    version = payload[b0]
    if version == 0:
        if b0 + 20 > b1:
            raise ValueError("truncated mvhd")
        return struct.unpack_from(">II", payload, b0 + 12)
    if version == 1:
        if b0 + 32 > b1:
            raise ValueError("truncated mvhd v1")
        return (
            struct.unpack_from(">I", payload, b0 + 20)[0],
            struct.unpack_from(">Q", payload, b0 + 24)[0],
        )
    raise ValueError(f"mvhd version {version} unsupported")


def mp4_frames(payload: bytes):
    """Yield each video sample's bytes from an MJPEG MP4/MOV, in
    sample order — the container-extraction twin of ``avi_frames``.
    Walks stsc (sample-to-chunk runs) over the stco chunk offsets
    with per-sample sizes from stsz; samples inside a chunk are
    contiguous by the ISO-BMFF layout rules. Fragmented files
    (DASH/CMAF: empty stbl, per-fragment moof/trun sample runs) walk
    the fragments instead (r18). Raises ValueError for non-MP4
    payloads, non-MJPEG codecs (no pixels to extract — the metadata
    tier handles those), and sample extents outside the buffer
    (truncated mdat)."""
    trak = _mp4_video_trak(payload)
    if trak is None:
        raise ValueError("no video track (tkhd with nonzero extent)")
    b0, b1 = trak[0], trak[1]
    fourcc = _mp4_stsd_fourcc(payload, b0, b1)
    if fourcc not in _MJPEG_MP4_CODECS:
        raise ValueError(
            f"not an MJPEG track (stsd {fourcc!r}); only "
            f"{_MJPEG_MP4_CODECS} carry per-sample JPEG pixels"
        )
    # fragmented tier (r18): an empty stbl (stsz sample_count 0) with
    # top-level moof boxes is the DASH/CMAF shape — every sample
    # lives in per-fragment trun runs. A hybrid file (non-empty stbl
    # AND fragments) yields stbl samples first, fragment samples
    # after, per ISO ordering.
    frag: list = []
    if _mp4_has_moof(payload):
        frag = _mp4_fragment_samples(
            payload, _mp4_tkhd_track_id(payload, b0, b1)
        )
    if _mp4_stsz_count(payload, b0, b1) == 0:
        if not frag:
            raise ValueError(
                "empty sample table and no fragment samples"
            )
    else:
        sizes, chunk_offsets, stsc = _mp4_sample_table(payload, b0, b1)
        idx = 0
        for chunk_no, off in enumerate(chunk_offsets, start=1):
            per = 0
            for first_chunk, per_chunk in stsc:
                if first_chunk <= chunk_no:
                    per = per_chunk
                else:
                    break
            for _ in range(per):
                if idx >= len(sizes):
                    break
                size = sizes[idx]
                if off + size > len(payload):
                    raise ValueError(
                        f"sample {idx} extent {off}+{size} overruns "
                        f"payload ({len(payload)} bytes)"
                    )
                yield payload[off:off + size]
                off += size
                idx += 1
        if idx < len(sizes):
            raise ValueError(
                f"chunk table covers {idx} of {len(sizes)} samples"
            )
    for off, size in frag:
        yield payload[off:off + size]


def decode_mp4(payload: bytes) -> dict:
    """Parse ISO-BMFF (MP4) with stdlib struct: box walk to mvhd
    (timescale/duration), the video track's tkhd (16.16-fixed
    width/height), and its stsz (sample count = n_frames). When the
    stsd sample entry is Motion-JPEG (``jpeg``/``mjpa``/``mjpb`` —
    every sample a standalone JPEG), the FIRST frame's pixels are
    decoded through ``functions/jpeg`` for ``mean_value``, the same
    pixel-access proof as the AVI/MJPEG tier (r16; the old "MP4 is
    metadata-only" scope over-generalized from H.264 to the
    container).

    For entropy-coded inter-frame codecs (H.264/H.265 — avc1/hvc1
    sample entries) pixel decode remains out of scope by design:
    stdlib cannot honestly decode them, so ``mean_value`` stays NULL
    (NULL marks metadata-only), as does a bare metadata container
    with no stsd at all.

    Fragmented files (DASH/CMAF — empty stbl, moof/trun sample runs,
    mvex defaults) are first-class since r18: n_frames sums the trun
    runs (plus the stbl tier for hybrid files, r19), duration falls
    back to mvex/mehd when mvhd says 0, and MJPEG fragments decode
    pixels through the same mp4_frames walk — all three base-offset
    modes, including the pre-CMAF implicit chain (r19). A track edit
    list shifts the first PRESENTED sample
    (``_mp4_first_presented_sample``), including multi-entry splice
    programs (first real segment wins; rate!=0/1 quarantines)."""
    import struct

    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    mvhd = _mp4_find(payload, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        raise ValueError("no mvhd box")
    timescale, duration = _mp4_mvhd_times(payload, mvhd)

    width = height = None
    n_frames = None
    mean = None
    trak = _mp4_video_trak(payload)
    if trak is not None:
        b0, b1, width, height = trak
        n_frames = _mp4_stsz_count(payload, b0, b1)
        if n_frames is not None and _mp4_has_moof(payload):
            # fragmented file: the stbl count (0 for the pure
            # DASH/CMAF shape, nonzero for a hybrid — r19, which
            # used to report only the stbl tier) plus the sum of the
            # per-fragment trun sample counts, matching what
            # mp4_frames yields (r18)
            n_frames += _mp4_fragment_samples(
                payload, _mp4_tkhd_track_id(payload, b0, b1),
                count_only=True,
            )
        if _mp4_stsd_fourcc(payload, b0, b1) in _MJPEG_MP4_CODECS:
            from itertools import islice

            from quebic_spark.functions.jpeg import decode_jpeg

            # the first PRESENTED sample: a nonzero elst media_time
            # shifts it past the pre-roll (r18)
            skip = _mp4_first_presented_sample(payload, b0, b1)
            first = next(
                islice(mp4_frames(payload), skip, skip + 1), None
            )
            if first is None:
                raise ValueError(
                    "MJPEG track with zero samples"
                    if skip == 0 else
                    f"elst first sample {skip} beyond the track's "
                    "sample count"
                )
            mean = decode_jpeg(first)["mean_value"]
    if width is None:
        raise ValueError("no video track (tkhd with nonzero extent)")
    # uint32 box fields must fit the int32 output schema: an
    # out-of-range value has to raise HERE (per-row quarantine), not
    # surface as a whole-batch Arrow conversion failure (review catch)
    for name, v in (
        ("n_frames", n_frames), ("timescale", timescale),
        ("width", width), ("height", height),
    ):
        if v is not None and v > 0x7FFFFFFF:
            raise ValueError(f"implausible {name} {v}")
    if not duration:
        # fMP4 carries mvhd duration 0; the real total (when the
        # muxer recorded one) lives in mvex/mehd (r18)
        duration = _mp4_mehd_duration(payload) or 0
    return {
        "fmt": "mp4",
        "width": width,
        "height": height,
        "n_frames": n_frames,
        # movie timescale doubles as the temporal sample rate field
        "sample_rate": timescale if duration else None,
        "channels": None,
        # real first-frame pixels for MJPEG tracks; NULL marks the
        # metadata-only tier (inter-frame codecs / bare containers)
        "mean_value": mean,
    }


# ---------------------------------------------------------------------------
# AVI / MJPEG — the REAL video decode tier (r9; MJPEG-in-MP4 joined
# it in r16 via mp4_frames). Motion-JPEG is fully decodable with this
# repo's own pure-Python machinery whatever the wrapper: the RIFF AVI
# container is stdlib-struct chunks and every frame is a baseline
# JPEG, which ``functions/jpeg.py`` already decodes exactly. Unlike
# H.264/H.265 tracks (entropy-coded inter-frame codecs stay out of
# scope, honestly flagged by mean_value=NULL), MJPEG gets pixel-level
# evidence: ``decode_avi``/``decode_mp4`` decode the FIRST frame's
# pixels for their mean, and ``video_frame_sample`` decodes every
# sampled frame from either container.
# Public layout per the Microsoft RIFF/AVI spec: 'avih' main header,
# 'strl' stream list ('strh' + BITMAPINFOHEADER 'strf'), frames as
# '00dc' chunks inside LIST 'movi', everything word-aligned.
# ---------------------------------------------------------------------------


def _riff_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for RIFF chunks in
    ``data[start:end]`` (little-endian sizes, bodies padded to even)."""
    import struct

    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body0 = pos + 8
        body1 = body0 + size
        if body1 > end:
            raise ValueError(f"RIFF chunk overruns buffer at {pos}")
        yield fourcc, body0, body1
        pos = body1 + (size & 1)  # word alignment


def _riff_find_list(data: bytes, start: int, end: int, ltype: bytes):
    for fourcc, b0, b1 in _riff_chunks(data, start, end):
        if fourcc == b"LIST" and data[b0:b0 + 4] == ltype:
            return b0 + 4, b1
    return None


def avi_frames(payload: bytes):
    """Yield each video frame's JPEG bytes from an AVI 'movi' list
    ('00dc'/'00db' chunks), in stream order — including frames wrapped
    in 'LIST rec ' records, the standard interleaved layout
    (VirtualDub/AVIMux style; r9 review catch — the flat walk wrongly
    quarantined those files as frame-less)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF file")
    movi = _riff_find_list(payload, 12, len(payload), b"movi")
    if movi is None:
        raise ValueError("no movi list")

    def walk(start: int, end: int):
        for fourcc, b0, b1 in _riff_chunks(payload, start, end):
            if fourcc in (b"00dc", b"00db"):
                yield payload[b0:b1]
            elif fourcc == b"LIST" and payload[b0:b0 + 4] == b"rec ":
                yield from walk(b0 + 4, b1)

    yield from walk(movi[0], movi[1])


def _avi_header(payload: bytes) -> dict:
    """avih main-header fields (the ONE parse shared by decode_avi and
    video_frame_sample): us_per_frame, n_frames, width, height."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI RIFF file")
    hdrl = _riff_find_list(payload, 12, len(payload), b"hdrl")
    if hdrl is None:
        raise ValueError("no hdrl list")
    for fourcc, b0, b1 in _riff_chunks(payload, hdrl[0], hdrl[1]):
        if fourcc == b"avih":
            if b1 - b0 < 40:
                raise ValueError("short avih header")
            us_per_frame, _mb, _pad, _flags, total = (
                struct.unpack_from("<5I", payload, b0)
            )
            width, height = struct.unpack_from("<II", payload, b0 + 32)
            return {
                "us_per_frame": us_per_frame,
                "n_frames": total,
                "width": width,
                "height": height,
            }
    raise ValueError("missing avih header")


def decode_avi(payload: bytes) -> dict:
    """AVI container metadata + FIRST-frame pixel decode: geometry and
    frame count from 'avih', fps from the microseconds-per-frame
    field, mean_value from actually decoding frame 0's JPEG — video's
    pixel-access proof, same discipline as the image decoders."""
    from quebic_spark.functions.jpeg import decode_jpeg

    hdr = _avi_header(payload)
    total_frames = hdr["n_frames"]
    width, height = hdr["width"], hdr["height"]
    us_per_frame = hdr["us_per_frame"]
    fps = round(1_000_000 / us_per_frame) if us_per_frame else None
    for name, v in (
        ("n_frames", total_frames), ("width", width),
        ("height", height), ("fps", fps),
    ):
        if v is not None and v > 0x7FFFFFFF:
            raise ValueError(f"implausible {name} {v}")
    first = next(iter(avi_frames(payload)), None)
    if first is None:
        raise ValueError("no video frames in movi")
    mean = decode_jpeg(first)["mean_value"]
    return {
        "fmt": "avi",
        "width": width,
        "height": height,
        "n_frames": total_frames,
        # frame rate doubles as the temporal sample-rate field, the
        # same convention decode_mp4 uses for the movie timescale
        "sample_rate": fps,
        "channels": None,
        "mean_value": mean,
    }


def encode_avi_mjpeg(
    frames: "list[bytes]", width: int, height: int, fps: int = 25
) -> bytes:
    """Build a minimal spec-conformant MJPEG AVI from pre-encoded JPEG
    frames (the write twin of decode_avi/avi_frames, and the test-data
    synthesizer — pair with functions/jpeg.encode_jpeg)."""
    import struct

    if not frames:
        raise ValueError("at least one frame required")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(frames)
    max_frame = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_frame * fps,   # suggested max bytes/sec
        0,                 # padding granularity
        0x100,             # AVIF_ISINTERLEAVED; NOT 0x10 =
        # AVIF_HASINDEX — no idx1 chunk is written, so advertising an
        # index would make strict players seek one that doesn't exist
        # (r9 review catch: the flags were exactly inverted)
        n, 0, 1, max_frame, width, height, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: flags, priority, language, initial_frames,
    # scale=1, rate=fps, start, length=n, suggested_buffer,
    # quality=-1 (driver default, signed), sample_size, rcFrame
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, n,
                      max_frame, -1, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_mp4_mjpeg(
    frames: "list[bytes]", width: int, height: int, fps: int = 25,
    frames_per_chunk: int | None = None,
    chunk_offset_box: str = "stco",
    mvhd_version: int = 0,
    mdat_largesize: bool = False,
    fragmented: bool = False,
    frames_per_fragment: int | None = None,
    edit_media_time: int | None = None,
    edit_list: "list[tuple[int, int]] | None" = None,
    elst_version: int = 0,
) -> bytes:
    """Build a minimal ISO-BMFF MP4 with one Motion-JPEG video track
    from pre-encoded JPEG frames (the write twin of
    decode_mp4/mp4_frames, and the test-data synthesizer — pair with
    ``functions/jpeg.encode_jpeg``). Layout: ftyp + mdat (all samples,
    chunked per ``frames_per_chunk``; None = one chunk) + moov with a
    full sample table (stsd 'jpeg', stts, stsc, stsz, stco). A
    trailing partial chunk gets its own stsc run, so non-divisible
    frame counts exercise the multi-entry sample-to-chunk walk.

    The 64-bit field variants some muxers emit regardless of file size
    (r17 — the decoder accepts all three): ``chunk_offset_box="co64"``
    writes 64-bit chunk offsets, ``mvhd_version=1`` the 64-bit-times
    movie header, ``mdat_largesize=True`` the size==1 extended box.

    ``fragmented=True`` (r18) writes the DASH/CMAF shape instead:
    empty stbl tables, mvex (mehd total duration + trex defaults,
    mvhd duration 0), and one moof (mfhd + traf: tfhd with
    default-base-is-moof, tfdt, trun with data_offset + per-sample
    sizes) + mdat pair per ``frames_per_fragment`` frames (None = one
    fragment).

    ``edit_media_time=k`` prepends an edts/elst whose single entry
    starts presentation at media time k (skipping k samples at the
    encoder's 1-tick-per-sample timescale); ``edit_list`` writes raw
    (segment_duration, media_time[, media_rate_int]) entries verbatim
    (rate defaults to 1; pass it for rate-quarantine fixtures),
    ``elst_version`` selects the 32/64-bit entry layout."""
    import struct

    if not frames:
        raise ValueError("at least one frame required")
    if chunk_offset_box not in ("stco", "co64"):
        raise ValueError(f"chunk_offset_box: {chunk_offset_box!r}")
    if mvhd_version not in (0, 1):
        raise ValueError(f"mvhd_version: {mvhd_version}")
    if elst_version not in (0, 1):
        raise ValueError(f"elst_version: {elst_version}")
    if edit_media_time is not None and edit_list is not None:
        raise ValueError("pass edit_media_time OR edit_list")

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", len(body) + 8, btype) + body

    n = len(frames)
    per = n if frames_per_chunk is None else int(frames_per_chunk)
    if per < 1:
        raise ValueError("frames_per_chunk must be >= 1")
    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    mdat_body = b"".join(frames)
    if mdat_largesize:
        mdat = struct.pack(
            ">I4sQ", 1, b"mdat", len(mdat_body) + 16
        ) + mdat_body
        mdat_header = 16
    else:
        mdat = box(b"mdat", mdat_body)
        mdat_header = 8
    # absolute file offsets: each chunk starts at its first sample
    chunk_offsets = []
    pos = len(ftyp) + mdat_header  # mdat body start
    for i in range(0, n, per):
        chunk_offsets.append(pos)
        pos += sum(len(f) for f in frames[i:i + per])
    # one stsc run for the full chunks; a second for a partial tail
    stsc_entries = [(1, per)]
    if n % per and n > per:
        stsc_entries.append((len(chunk_offsets), n % per))

    timescale, delta = fps, 1  # 1 sample per 1/fps => duration = n
    # fragmented files say duration 0 in mvhd; the total lives in mehd
    mv_duration = 0 if fragmented else n * delta
    if mvhd_version == 0:
        mvhd = box(
            b"mvhd",
            b"\x00" * 4 + b"\x00" * 8
            + struct.pack(">II", timescale, mv_duration)
            + b"\x00" * 80,
        )
    else:  # v1: 64-bit creation/modification/duration
        mvhd = box(
            b"mvhd",
            b"\x01" + b"\x00" * 3 + b"\x00" * 16
            + struct.pack(">I", timescale)
            + struct.pack(">Q", mv_duration)
            + b"\x00" * 80,
        )
    tkhd = box(
        b"tkhd",
        b"\x00" * 4 + b"\x00" * 8 + struct.pack(">I", 1)  # track_ID 1
        + b"\x00" * 60
        + struct.pack(">II", width << 16, height << 16),
    )
    edts = b""
    entries = edit_list
    if edit_media_time is not None:
        entries = [(n * delta, edit_media_time)]
    if entries is not None:
        fmt = ">Ii" if elst_version == 0 else ">Qq"
        body = bytes([elst_version]) + b"\x00" * 3 + struct.pack(
            ">I", len(entries)
        )
        for entry in entries:
            seg, mt = entry[0], entry[1]
            # media_rate 16.16 fixed; optional third element sets the
            # integer part (fixture knob for rate quarantine tests)
            rate = entry[2] if len(entry) > 2 else 1
            body += struct.pack(fmt, seg, mt) + struct.pack(
                ">hh", rate, 0
            )
        edts = box(b"edts", box(b"elst", body))
    stsd = box(
        b"stsd",
        b"\x00" * 4 + struct.pack(">I", 1)
        + struct.pack(">I4s", 8 + 78, b"jpeg") + b"\x00" * 78,
    )
    stts = box(
        b"stts", b"\x00" * 4 + struct.pack(">III", 1, n, delta)
    )
    stsc = box(
        b"stsc",
        b"\x00" * 4 + struct.pack(">I", len(stsc_entries))
        + b"".join(
            struct.pack(">III", fc, sc, 1) for fc, sc in stsc_entries
        ),
    )
    stsz = box(
        b"stsz",
        b"\x00" * 4 + struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    if chunk_offset_box == "stco":
        stco = box(
            b"stco",
            b"\x00" * 4 + struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    else:
        stco = box(
            b"co64",
            b"\x00" * 4 + struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    if fragmented:
        # DASH/CMAF shape: EMPTY stbl tables (the walk must go to the
        # fragments), mvex defaults, one moof+mdat per fragment
        stts = box(b"stts", b"\x00" * 4 + struct.pack(">I", 0))
        stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 0))
        stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, 0))
        empty_off = b"\x00" * 4 + struct.pack(">I", 0)
        stco = box(
            b"stco" if chunk_offset_box == "stco" else b"co64",
            empty_off,
        )
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + edts + mdia)
    if not fragmented:
        moov = box(b"moov", mvhd + trak)
        return ftyp + mdat + moov
    mehd = box(b"mehd", b"\x00" * 4 + struct.pack(">I", n * delta))
    trex = box(
        b"trex",
        b"\x00" * 4 + struct.pack(">IIIII", 1, 1, delta, 0, 0),
    )
    mvex = box(b"mvex", mehd + trex)
    moov = box(b"moov", mvhd + trak + mvex)
    out = ftyp + moov
    per_frag = (
        n if frames_per_fragment is None else int(frames_per_fragment)
    )
    if per_frag < 1:
        raise ValueError("frames_per_fragment must be >= 1")
    seq = 0
    for i in range(0, n, per_frag):
        grp = frames[i:i + per_frag]
        seq += 1
        mfhd = box(b"mfhd", b"\x00" * 4 + struct.pack(">I", seq))
        tfhd = box(
            b"tfhd",
            struct.pack(">I", _TFHD_DEFAULT_BASE_IS_MOOF)
            + struct.pack(">I", 1),
        )
        tfdt = box(
            b"tfdt",
            b"\x01" + b"\x00" * 3 + struct.pack(">Q", i * delta),
        )
        # trun with data_offset + per-sample sizes; data_offset is
        # relative to the moof's first byte (default-base-is-moof)
        trun_size = 8 + 4 + 4 + 4 + 4 * len(grp)
        frag_mdat_header = 16 if mdat_largesize else 8
        moof_size = (
            8 + len(mfhd)
            + 8 + len(tfhd) + len(tfdt) + trun_size
        )
        trun = box(
            b"trun",
            struct.pack(
                ">I", _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE
            )
            + struct.pack(">I", len(grp))
            + struct.pack(">i", moof_size + frag_mdat_header)
            + b"".join(struct.pack(">I", len(f)) for f in grp),
        )
        traf = box(b"traf", tfhd + tfdt + trun)
        moof = box(b"moof", mfhd + traf)
        assert len(moof) == moof_size, (len(moof), moof_size)
        body = b"".join(grp)
        if mdat_largesize:
            frag_mdat = struct.pack(
                ">I4sQ", 1, b"mdat", len(body) + 16
            ) + body
        else:
            frag_mdat = box(b"mdat", body)
        out += moof + frag_mdat
    return out


def _mp4_frame_period_us(payload: bytes):
    """Microseconds per frame from mvhd duration/timescale and the
    sample count — the MP4 twin of avih's dwMicroSecPerFrame; None
    when any ingredient is missing/zero."""
    import struct

    moov = _mp4_find(payload, 0, len(payload), b"moov")
    if moov is None:
        return None
    mvhd = _mp4_find(payload, moov[0], moov[1], b"mvhd")
    if mvhd is None:
        return None
    try:
        timescale, duration = _mp4_mvhd_times(payload, mvhd)
    except ValueError:
        return None  # period is best-effort metadata
    trak = _mp4_video_trak(payload)
    if trak is None:
        return None
    try:
        n = _mp4_stsz_count(payload, trak[0], trak[1])
    except ValueError:
        return None  # period is best-effort metadata
    if n is None:
        return None
    if _mp4_has_moof(payload):
        # fragmented: count the trun runs (added to the stbl tier for
        # hybrid files, r19) and take the total from mehd, same
        # fallbacks as decode_mp4 (r18) — frame timestamps in
        # video_frame_sample stay real for DASH/CMAF files
        try:
            n += _mp4_fragment_samples(
                payload, _mp4_tkhd_track_id(payload, trak[0], trak[1]),
                count_only=True,
            )
        except ValueError:
            return None  # period is best-effort metadata
    if not duration:
        try:
            duration = _mp4_mehd_duration(payload) or 0
        except ValueError:
            return None
    if not (timescale and duration and n):
        return None
    return int(duration * 1_000_000 // timescale // n)


VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_ts_ms bigint, width int, "
    "height int, mean_luma double, decode_ok boolean"
)


def video_frame_sample(payloads: DataFrame, every_nth: int = 4) -> DataFrame:
    """REAL video frame sampling: every ``every_nth`` frame of each
    MJPEG payload (RIFF AVI or ISO-BMFF MP4/MOV container — r16) is
    extracted and its JPEG DECODED to pixels — one output row per
    sampled frame with the frame's true geometry and mean luma. The
    explode happens inside
    the Arrow batch (rows out > rows in), so a long video never
    materializes driver-side; at 100 TB the input is the binary
    payload column of the stored corpus, partitioned by doc.

    Quarantine contract, per FRAME: a sampled frame whose JPEG fails
    to decode emits its row with NULL pixels and ``decode_ok=false``
    (r9 review catch — skipping silently hid mid-stream corruption
    that the container-level accounting, which only pixel-decodes
    frame 0, cannot see). Payloads that are not a decodable MJPEG
    container (AVI or MP4) yield no rows here — route them through
    ``media_decode_stats`` for format-level quarantine accounting.

    ``frame_ts_ms`` is bigint: dwMicroSecPerFrame is a full u32 (a
    1-frame/min timelapse is legal), so int32 ms timestamps could
    overflow at large frame indices."""
    from quebic_spark.functions.jpeg import decode_jpeg_pixels

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_idx": [], "frame_ts_ms": [],
                "width": [], "height": [], "mean_luma": [],
                "decode_ok": [],
            }
            def emit(doc_id, i, us_pf, w, h, mean, ok):
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_ts_ms"].append(i * int(us_pf) // 1000)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_luma"].append(mean)
                out["decode_ok"].append(ok)

            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = b"" if payload is None else bytes(payload)
                pending = None
                try:
                    # container dispatch (r16): MJPEG frames arrive in
                    # two mainstream wrappers — RIFF AVI and ISO-BMFF
                    # MP4/MOV; both extract to the same per-sample
                    # JPEG bytes, so the frame loop below is shared
                    if detect_format(payload) == "mp4":
                        us_pf = (
                            _mp4_frame_period_us(payload)
                            or 1_000_000 // 25
                        )
                        it = mp4_frames(payload)
                    else:
                        us_pf = (
                            _avi_header(payload)["us_per_frame"]
                            or 1_000_000 // 25
                        )
                        it = avi_frames(payload)
                    # avi_frames is a LAZY generator: its container-
                    # level errors ('not an AVI', 'no movi list') only
                    # raise on the first next() — pull it HERE so they
                    # hit the container quarantine, not the per-frame
                    # loop, which previously emitted a phantom
                    # frame_idx=0 failed row for payloads the contract
                    # promises yield no rows (r13 review, reproduced)
                    try:
                        pending = next(it)
                    except StopIteration:
                        continue  # readable container, zero frames
                except Exception:  # noqa: BLE001 — not a readable
                    continue  # AVI container: format-level quarantine
                i = 0
                while True:
                    # the frame iterator itself can raise mid-stream
                    # (truncated movi): flag the truncation point as a
                    # failed frame row rather than dying or going
                    # silent — every corruption leaves a visible row
                    if pending is not None:
                        frame, pending = pending, None
                    else:
                        try:
                            frame = next(it)
                        except StopIteration:
                            break
                        except Exception:  # noqa: BLE001 — truncated
                            emit(doc_id, i, us_pf, None, None, None,
                                 False)
                            break
                    if i % every_nth == 0:
                        try:
                            meta, px = decode_jpeg_pixels(frame)
                            emit(
                                doc_id, i, us_pf, meta["width"],
                                meta["height"],
                                float(px.mean()) if px.size else None,
                                True,
                            )
                        except Exception:  # noqa: BLE001 — corrupt
                            emit(
                                doc_id, i, us_pf, None, None, None,
                                False,
                            )
                    i += 1
            yield pd.DataFrame(out)

    return payloads.mapInPandas(sample, VIDEO_FRAME_SCHEMA)


def decode_bmp(payload: bytes) -> dict:
    """Parse a BITMAPINFOHEADER BMP (uncompressed 24-bit): header
    geometry + full pixel scan (rows are 4-byte aligned, bottom-up)."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or compression != 0 or bpp != 24:
        raise ValueError(
            f"unsupported BMP: hdr={hdr_size} planes={planes} "
            f"bpp={bpp} compression={compression}"
        )
    height_abs = abs(height)
    row_bytes = ((bpp * width + 31) // 32) * 4
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height_abs,
        offset=data_off,
    ).reshape(height_abs, row_bytes)[:, : width * 3]
    return {
        "fmt": "bmp",
        "width": width,
        "height": height_abs,
        "n_frames": 1,
        "sample_rate": None,
        "channels": 3,
        "mean_value": float(px.mean()) if px.size else 0.0,
    }


def decode_wav(payload: bytes) -> dict:
    """Decode PCM WAV via the stdlib wave module: real sample frames
    out, mean absolute amplitude over all channels."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_frames = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n_frames)
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
        if dtype is None:
            raise ValueError(f"unsupported WAV sample width {width}")
        samples = np.frombuffer(raw, dtype=dtype)
        return {
            "fmt": "wav",
            "width": None,
            "height": None,
            "n_frames": n_frames,
            "sample_rate": w.getframerate(),
            "channels": w.getnchannels(),
            "mean_value": (
                float(np.abs(samples.astype(np.float64)).mean())
                if samples.size else 0.0
            ),
        }


def decode_png(payload: bytes) -> dict:
    """Decode a non-interlaced 8-bit RGB PNG with stdlib zlib + struct:
    chunk walk (IHDR geometry, concatenated IDAT), full inflate, then
    per-scanline unfiltering (all five filter types — None/Sub/Up/
    Average/Paeth, the spec's reconstruction functions). Every pixel is
    reconstructed; the mean proves it. Other color types / depths /
    interlacing raise (decode_media quarantines them as error-stub)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width, idat = 8, None, b""
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = payload[pos:pos + length]
        if len(data) < length:
            raise ValueError("truncated chunk body")
        pos += length + 4  # skip CRC (integrity is the transport's job)
        if ctype == b"IHDR":
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if bit_depth != 8 or color_type != 2 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={bit_depth} color={color_type} "
            f"interlace={interlace} (8-bit RGB non-interlaced only)"
        )
    bpp, stride = 3, width * 3
    expect = (stride + 1) * height
    if expect > 256_000_000:
        # decompression-bomb guard: corrupt IHDR geometry must raise,
        # not balloon executor memory (quarantine contract)
        raise ValueError(f"implausible geometry {width}x{height}")
    # cap the inflate at the expected size: a bomb IDAT stops here.
    # eof must ALSO hold — it proves the deflate stream terminated
    # cleanly and its adler32 verified (review catch: the bare capped
    # decompress silently accepted streams truncated after the last
    # scanline byte but before the terminator/checksum)
    inflater = zlib.decompressobj()
    raw = inflater.decompress(idat, expect + 1)
    if len(raw) != expect or not inflater.eof:
        raise ValueError("IDAT length does not match geometry")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(height):
        f = raw[p]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=p + 1
        ).copy()
        p += 1 + stride
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up (uint8 addition wraps mod 256, per spec)
            cur = line + prev
        elif f in (1, 3, 4):  # Sub/Average/Paeth: left-dependent, so
            cur = line        # reconstruct sequentially
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + int(prev[x])) // 2
                else:
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    pa, pb, pc = (
                        abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    )
                    pred = (
                        a if pa <= pb and pa <= pc
                        else (b if pb <= pc else c)
                    )
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid scanline filter {f}")
        out[y] = cur
        prev = cur
    return {
        "fmt": "png",
        "width": width,
        "height": height,
        "n_frames": 1,
        "sample_rate": None,
        "channels": 3,
        "mean_value": float(out.mean()) if out.size else 0.0,
    }


def _gif_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF length-prefixed sub-blocks starting at ``pos``;
    returns (data, position after the 0 terminator)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("unterminated sub-block chain")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise ValueError("truncated sub-block")
        out += payload[pos:pos + n]
        pos += n


def _gif_lzw_decode(data: bytes, mcs: int, max_pixels: int) -> bytearray:
    """GIF-variant LZW: LSB-first variable-width codes, clear/end
    codes, dict capped at 4096. Output capped at ``max_pixels`` so a
    crafted stream cannot balloon memory (bomb guard)."""
    if not 1 <= mcs <= 11:
        raise ValueError(f"bad LZW min code size {mcs}")
    clear, end = 1 << mcs, (1 << mcs) + 1
    n_bits = len(data) * 8
    bitpos = 0
    width = mcs + 1
    dict_: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None

    def read_code() -> int:
        nonlocal bitpos
        if bitpos + width > n_bits:
            raise ValueError("truncated LZW stream")
        v = 0
        for i in range(width):
            v |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += width
        return v

    while True:
        code = read_code()
        if code == clear:
            dict_ = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = mcs + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(dict_):
                raise ValueError(f"invalid first code {code}")
            entry = dict_[code]
        elif code < len(dict_):
            entry = dict_[code]
        elif code == len(dict_):  # the kwkwk case
            entry = prev + prev[:1]
        else:
            raise ValueError(f"code {code} beyond dictionary")
        out += entry
        if len(out) > max_pixels:
            raise ValueError("LZW output exceeds image geometry")
        if prev is not None and len(dict_) < 4096:
            dict_.append(prev + entry[:1])
            if len(dict_) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) != max_pixels:
        raise ValueError(
            f"LZW pixel count {len(out)} != geometry {max_pixels}"
        )
    return out


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif_pixels(payload: bytes):
    """Full GIF parse: returns (first-frame RGB array (h, w, 3),
    n_frames). Split from ``decode_gif`` so tests can assert EXACT
    pixel recovery (a mean can't see row-order or palette mixups)."""
    import struct

    import numpy as np

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(payload) < 13:
        raise ValueError("truncated header")
    _sw, _sh, packed = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = payload[pos:pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    n_frames = 0
    first = None  # (w, h, indices, palette)
    terminated = False
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            terminated = True
            break
        if block == 0x21:  # extension: label + sub-blocks, skipped
            if pos >= len(payload):
                raise ValueError("truncated extension")
            _, pos = _gif_subblocks(payload, pos + 1)
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise ValueError("truncated image descriptor")
            _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB",
                                                       payload, pos)
            pos += 9
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = payload[pos:pos + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pos >= len(payload):
                raise ValueError("missing LZW min code size")
            mcs = payload[pos]
            data, pos = _gif_subblocks(payload, pos + 1)
            n_frames += 1
            if first is None:
                if pal is None:
                    raise ValueError("no color table for first frame")
                if w * h > 64_000_000:
                    raise ValueError(f"implausible geometry {w}x{h}")
                idx = np.frombuffer(
                    _gif_lzw_decode(data, mcs, w * h), dtype=np.uint8
                ).reshape(h, w)
                if ipacked & 0x40:  # interlaced: restore row order
                    order = [
                        y for start, step in _GIF_INTERLACE_PASSES
                        for y in range(start, h, step)
                    ]
                    restored = np.zeros_like(idx)
                    restored[order] = idx
                    idx = restored
                first = (w, h, idx, pal)
        else:
            raise ValueError(f"unknown block id {block:#x}")
    if not terminated:
        # running off the end without the 0x3B trailer means the file
        # was truncated at a block boundary — corrupt, not clean
        # (review catch: this case decoded silently)
        raise ValueError("missing GIF trailer")
    if first is None:
        raise ValueError("no image data")
    w, h, idx, pal = first
    pal_arr = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
    if idx.size and int(idx.max()) >= len(pal_arr):
        raise ValueError("palette index out of range")
    return pal_arr[idx], n_frames


def decode_gif(payload: bytes) -> dict:
    """Decode a GIF87a/89a with stdlib-only LZW: header + color
    tables + block walk; the FIRST frame is fully decompressed and
    palette-mapped (interlaced row order restored), every further
    image descriptor counts toward ``n_frames`` (animation length).
    Corrupt structure, missing color table, or geometry/LZW bombs
    raise (decode_media quarantines as gif-error-stub)."""
    rgb, n_frames = _decode_gif_pixels(payload)
    h, w = rgb.shape[0], rgb.shape[1]
    return {
        "fmt": "gif",
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "sample_rate": None,
        "channels": 3,
        "mean_value": float(rgb.mean()) if rgb.size else 0.0,
    }


def _stub_dims(n: int) -> dict:
    # same arithmetic as _fake_decode — the documented deterministic
    # fallback for formats the container cannot decode
    return {
        "fmt": "unknown-stub",
        "width": n % 640 + 1,
        "height": n % 480 + 1,
        "n_frames": n % 16 + 1,
        "sample_rate": None,
        "channels": None,
        "mean_value": None,
    }


def decode_media(payloads: DataFrame) -> DataFrame:
    """(doc_id, payload binary) -> typed media metadata, one row per
    input row. Real BMP/WAV decoding in-batch; unknown formats get the
    deterministic stub dims (flagged by ``fmt``), so a mixed corpus
    never fails mid-scan — quarantine/filter on ``fmt`` downstream."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                # NULL payloads quarantine too (bytes(None) would kill
                # the task before the try below was entered)
                payload = b"" if payload is None else bytes(payload)
                kind = detect_format(payload)
                try:
                    if kind == "jpeg":
                        from quebic_spark.functions.jpeg import (
                            decode_jpeg,
                        )

                        d = decode_jpeg(payload)
                    elif kind == "png":
                        d = decode_png(payload)
                    elif kind == "bmp":
                        d = decode_bmp(payload)
                    elif kind == "wav":
                        d = decode_wav(payload)
                    elif kind == "mp4":
                        d = decode_mp4(payload)
                    elif kind == "avi":
                        d = decode_avi(payload)
                    elif kind == "gif":
                        d = decode_gif(payload)
                    else:
                        d = _stub_dims(len(payload))
                except Exception:
                    # magic bytes matched but the body didn't decode
                    # (unsupported bpp, truncated pixels, corrupt RIFF
                    # chunk — wave.Error is not even a ValueError).
                    # The never-fails-mid-scan contract means one bad
                    # row must quarantine, not kill the task: stub
                    # dims, flagged distinctly for downstream triage.
                    d = _stub_dims(len(payload))
                    d["fmt"] = f"{kind}-error-stub"
                d["doc_id"] = doc_id
                d["payload_bytes"] = len(payload)
                rows.append(d)
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "payload_bytes", "width",
                    "height", "n_frames", "sample_rate", "channels",
                    "mean_value",
                ],
            )

    return payloads.mapInPandas(run, MEDIA_SCHEMA)


def media_decode_stats(payloads: DataFrame) -> DataFrame:
    """Per-format decode accounting over a binary-payload column:
    ``(fmt, n_rows, n_bytes, quarantined)``. ``quarantined`` is true
    for the stub tiers (``unknown-stub`` and ``<kind>-error-stub``) —
    the rows a release should surface for triage rather than silently
    ship. One decode pass + one tiny keyed agg; fmt cardinality is a
    handful, so the agg is map-side dominated at any corpus size."""
    return (
        decode_media(payloads)
        .groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("payload_bytes").alias("n_bytes"),
        )
        .withColumn("quarantined", F.col("fmt").endswith("-stub"))
    )


def encode_bmp(width: int, height: int, rgb: "list[list[tuple]]") -> bytes:
    """Test-support encoder: rows of (r, g, b) top-down -> 24-bit BMP
    bytes (bottom-up, 4-byte-aligned rows), the exact layout
    ``decode_bmp`` parses."""
    import struct

    row_bytes = ((24 * width + 31) // 32) * 4
    pad = row_bytes - width * 3
    body = b""
    for row in reversed(rgb):  # BMP stores bottom-up
        for r, g, b in row:
            body += bytes((b, g, r))  # little-endian BGR
        body += b"\x00" * pad
    data_off = 54
    size = data_off + len(body)
    header = (
        b"BM" + struct.pack("<IHHI", size, 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body),
            2835, 2835, 0, 0,
        )
    )
    return header + body


def encode_png(
    width: int,
    height: int,
    rgb: "list[list[tuple]]",
    row_filters: "list[int] | None" = None,
) -> bytes:
    """Test-support encoder: rows of (r, g, b) top-down -> non-
    interlaced 8-bit RGB PNG bytes, the exact layout ``decode_png``
    parses. ``row_filters`` picks the scanline filter per row (default
    all 0) so round-trip tests can exercise every reconstruction
    branch; forward filtering here uses original-pixel neighbors,
    which is what the spec's filter functions subtract."""
    import struct
    import zlib

    import numpy as np

    arr = np.array(
        [[ch for px in row for ch in px] for row in rgb], dtype=np.uint8
    ).reshape(height, width * 3)
    filters = list(row_filters) if row_filters else [0] * height
    bpp = 3

    def left(line):
        out = np.zeros_like(line)
        out[bpp:] = line[:-bpp]
        return out

    raw = b""
    prev = np.zeros(width * 3, dtype=np.uint8)
    for y in range(height):
        line, f = arr[y], filters[y]
        a, b = left(line), prev
        c = left(prev)
        if f == 0:
            filt = line
        elif f == 1:
            filt = line - a
        elif f == 2:
            filt = line - b
        elif f == 3:
            filt = line - (
                (a.astype(np.int16) + b.astype(np.int16)) // 2
            ).astype(np.uint8)
        elif f == 4:
            ai, bi, ci = (
                a.astype(np.int16), b.astype(np.int16),
                c.astype(np.int16),
            )
            pa, pb, pc = (
                np.abs(bi - ci), np.abs(ai - ci),
                np.abs(ai + bi - 2 * ci),
            )
            pred = np.where(
                (pa <= pb) & (pa <= pc), ai, np.where(pb <= pc, bi, ci)
            ).astype(np.uint8)
            filt = line - pred
        else:
            raise ValueError(f"invalid filter {f}")
        raw += bytes([f]) + filt.tobytes()
        prev = line

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_gif(
    width: int,
    height: int,
    rgb: "list[list[tuple]]",
    interlaced: bool = False,
    n_frames: int = 1,
) -> bytes:
    """Test-support encoder: rows of (r, g, b) top-down -> GIF89a
    bytes through a REAL LZW compressor (dictionary growth, variable
    code width, clear-on-full) so round-trips drive the decoder's
    actual dictionary/width machinery, not a degenerate
    clear-every-code stream. ``interlaced`` writes the four-pass row
    order; ``n_frames`` repeats the frame to exercise the animation
    count."""
    import struct

    # palette: first-appearance order, padded to a power of two
    palette: list[tuple] = []
    index: dict[tuple, int] = {}
    idx_rows: list[list[int]] = []
    for row in rgb:
        out_row = []
        for px in row:
            if px not in index:
                index[px] = len(palette)
                palette.append(px)
            out_row.append(index[px])
        idx_rows.append(out_row)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    pal_bits = max(1, (max(1, len(palette) - 1)).bit_length())
    pal_n = 1 << pal_bits
    mcs = max(2, pal_bits)

    if interlaced:
        order = [
            y for start, step in _GIF_INTERLACE_PASSES
            for y in range(start, height, step)
        ]
        stored_rows = [idx_rows[y] for y in order]
    else:
        stored_rows = idx_rows
    pixels = bytes(i for row in stored_rows for i in row)

    # The emitted code width must match the DECODER's read width at
    # that moment, and the decoder's dictionary trails the encoder's
    # by one entry (it appends nothing for the first data code after a
    # clear) — so the encoder tracks the decoder's dict length
    # explicitly instead of mirroring its own next_code (the classic
    # GIF LZW off-by-one).
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes: list[tuple[int, int]] = []  # (code, width at emission)
    state = {"width": mcs + 1, "dec_len": end + 1, "first": True}

    def emit(code: int) -> None:
        codes.append((code, state["width"]))

    def emit_data(code: int) -> None:
        emit(code)
        if state["first"]:
            state["first"] = False
        elif state["dec_len"] < 4096:
            state["dec_len"] += 1
            if state["dec_len"] == (1 << state["width"]) \
                    and state["width"] < 12:
                state["width"] += 1

    def reset_tables() -> tuple[dict, int]:
        state.update(width=mcs + 1, dec_len=end + 1, first=True)
        return {bytes([i]): i for i in range(1 << mcs)}, end + 1

    emit(clear)
    table, next_code = reset_tables()
    w = b""
    for k in pixels:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit_data(table[w])
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
        else:  # dictionary full: clear and restart both sides
            emit(clear)
            table, next_code = reset_tables()
        w = bytes([k])
    if w:
        emit_data(table[w])
    emit(end)

    # LSB-first bit packing
    acc = n_acc = 0
    packed = bytearray()
    for code, cw in codes:
        acc |= code << n_acc
        n_acc += cw
        while n_acc >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        packed.append(acc & 0xFF)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (pal_bits - 1), 0, 0)
    for i in range(pal_n):
        out += bytes(palette[i]) if i < len(palette) else b"\x00\x00\x00"
    frame = bytearray()
    frame.append(0x2C)
    frame += struct.pack("<HHHHB", 0, 0, width, height,
                         0x40 if interlaced else 0)
    frame.append(mcs)
    for i in range(0, len(packed), 255):
        block = packed[i:i + 255]
        frame.append(len(block))
        frame += block
    frame.append(0)
    out += frame * n_frames
    out.append(0x3B)
    return bytes(out)


QUERIES = {
    "multimodal_manifest": q_multimodal_manifest,
    "multimodal_decode": q_multimodal_decode,
}

ORACLES = {
    "multimodal_manifest": ORACLE_MULTIMODAL_MANIFEST,
    "multimodal_decode": ORACLE_MULTIMODAL_DECODE,
}
