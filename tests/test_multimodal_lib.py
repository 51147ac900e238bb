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


# ---------------------------------------------------------------------------
# Real decoders: BMP header+pixel parse, PCM WAV, mixed-corpus auto
# fallback. The decode is genuine (known geometry AND known pixel /
# sample values round-trip), the stub path stays live for formats the
# container can't decode.
# ---------------------------------------------------------------------------


def _make_wav(sample_rate=8000, n_frames=400, channels=1, amplitude=1000):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        # constant-amplitude square-ish signal: mean |sample| is known
        frames = b"".join(
            struct.pack(
                "<" + "h" * channels,
                *([amplitude if i % 2 == 0 else -amplitude] * channels),
            )
            for i in range(n_frames)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_decode_media_real_bmp_wav_and_stub_fallback(spark):
    from quebic_spark.operators.multimodal import decode_media, encode_bmp

    # 3x2 BMP with known pixels: mean over BGR bytes is exact
    rgb = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    bmp = encode_bmp(3, 2, rgb)
    wav = _make_wav()
    txt = "not a media payload".encode()
    df = spark.createDataFrame(
        [(1, bytearray(bmp)), (2, bytearray(wav)), (3, bytearray(txt))],
        "doc_id long, payload binary",
    ).repartition(3)
    out = {r["doc_id"]: r for r in decode_media(df).collect()}

    b = out[1]
    assert b["fmt"] == "bmp"
    assert (b["width"], b["height"], b["n_frames"]) == (3, 2, 1)
    flat = [v for row in rgb for px in row for v in px]
    assert abs(b["mean_value"] - sum(flat) / len(flat)) < 1e-9

    w = out[2]
    assert w["fmt"] == "wav"
    assert w["sample_rate"] == 8000
    assert w["n_frames"] == 400 and w["channels"] == 1
    assert abs(w["mean_value"] - 1000.0) < 1e-9

    s = out[3]
    assert s["fmt"] == "unknown-stub"
    n = len(txt)
    assert (s["width"], s["height"], s["n_frames"]) == (
        n % 640 + 1, n % 480 + 1, n % 16 + 1,
    )
    assert s["sample_rate"] is None and s["mean_value"] is None


def test_decode_media_rejects_malformed_bmp():
    from quebic_spark.operators.multimodal import decode_bmp, encode_bmp

    good = encode_bmp(2, 2, [[(0, 0, 0)] * 2] * 2)
    # flip compression field to a non-zero value -> must refuse, not
    # silently misparse
    bad = good[:30] + b"\x01" + good[31:]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_bmp(bad)


def test_decode_media_quarantines_corrupt_payloads(spark):
    """never-fails-mid-scan contract (round-5 review): a payload whose
    magic bytes match but whose body doesn't decode must quarantine as
    an error-flagged stub row, not kill the task."""
    from quebic_spark.operators.multimodal import decode_media, encode_bmp

    good = encode_bmp(2, 2, [[(9, 9, 9)] * 2] * 2)
    compressed_bmp = good[:30] + b"\x01" + good[31:]  # unsupported
    truncated_bmp = good[:40]  # too short for detect -> unknown-stub
    corrupt_wav = b"RIFF" + b"\x00" * 4 + b"WAVE" + b"\xff" * 40
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(compressed_bmp)),
            (3, bytearray(truncated_bmp)),
            (4, bytearray(corrupt_wav)),
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert out[1]["fmt"] == "bmp"
    assert out[2]["fmt"] == "bmp-error-stub"
    assert out[3]["fmt"] == "unknown-stub"
    assert out[4]["fmt"] == "wav-error-stub"
    # quarantined rows still carry the deterministic stub dims
    n = len(compressed_bmp)
    assert out[2]["width"] == n % 640 + 1


def test_decode_media_null_payload_quarantines(spark):
    from quebic_spark.operators.multimodal import decode_media

    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"hello"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert out[1]["fmt"] == "unknown-stub"
    assert out[1]["payload_bytes"] == 0
    assert out[2]["fmt"] == "unknown-stub"


def test_decode_png_known_pixels_all_filters(spark):
    """Round-trip a 4x4 RGB PNG through every scanline filter type
    (None/Sub/Up/Average/Paeth): decode_png must reconstruct the exact
    pixel mean, and the Spark decode_media path must route by magic
    bytes (VERDICT r5 item 7)."""
    from quebic_spark.operators.multimodal import (
        decode_media,
        decode_png,
        encode_png,
    )

    rgb = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255), (17, 34, 51)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90), (5, 200, 100)],
        [(1, 2, 3), (200, 199, 198), (128, 128, 128), (0, 0, 0)],
        [(255, 255, 255), (9, 8, 7), (66, 77, 88), (250, 1, 125)],
    ]
    flat = [v for row in rgb for px in row for v in px]
    expected_mean = sum(flat) / len(flat)
    # one payload per filter mix, incl. a row of each type in one image
    for filters in ([0] * 4, [1] * 4, [2] * 4, [3] * 4, [4] * 4,
                    [0, 1, 2, 3], [4, 3, 2, 1]):
        d = decode_png(encode_png(4, 4, rgb, row_filters=filters))
        assert (d["width"], d["height"], d["channels"]) == (4, 4, 3)
        assert abs(d["mean_value"] - expected_mean) < 1e-9, filters

    df = spark.createDataFrame(
        [(1, bytearray(encode_png(4, 4, rgb, row_filters=[0, 1, 2, 4])))],
        "doc_id long, payload binary",
    )
    [row] = decode_media(df).collect()
    assert row["fmt"] == "png"
    assert abs(row["mean_value"] - expected_mean) < 1e-9


def test_decode_png_rejects_unsupported_and_quarantines(spark):
    """Non-RGB color types refuse to misparse; through decode_media
    they quarantine as png-error-stub (never-fails-mid-scan)."""
    import struct

    import pytest as _pytest

    from quebic_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_media,
        decode_png,
        encode_png,
    )

    good = encode_png(2, 2, [[(1, 2, 3)] * 2] * 2)
    # flip color type (byte 9 of IHDR data: magic 8 + len 4 + type 4
    # + width 4 + height 4 + depth 1 = offset 25) to 6 (RGBA)
    bad_color = good[:25] + bytes([6]) + good[26:]
    with _pytest.raises(ValueError):
        decode_png(bad_color)
    truncated = good[: len(good) // 2]
    garbage_idat = (
        PNG_MAGIC
        + good[8:33]  # IHDR chunk
        + struct.pack(">I", 4) + b"IDAT" + b"\xff\xff\xff\xff"
        + struct.pack(">I", 0)
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(bad_color)),
            (3, bytearray(truncated)),
            (4, bytearray(garbage_idat)),
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert out[1]["fmt"] == "png"
    assert out[2]["fmt"] == "png-error-stub"
    assert out[3]["fmt"] == "png-error-stub"
    assert out[4]["fmt"] == "png-error-stub"


# ---------------------------------------------------------------------------
# JPEG: baseline DCT codec (functions/jpeg.py) behind the auto-detect.
# The encoder writes its quant + huffman tables INTO the stream, so a
# round-trip drives the decoder's real table parsers, not a shared
# constant; orientation/color checks catch transpose-cancellation.
# ---------------------------------------------------------------------------


def test_jpeg_roundtrip_known_pixels():
    import numpy as np

    from quebic_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    h, w = 24, 40
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            np.minimum(xx * 6, 255),
            np.minimum(yy * 9, 255),
            np.minimum(xx + yy, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    meta, px = decode_jpeg_pixels(encode_jpeg(img))
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["channels"] == 3 and meta["n_frames"] == 1
    err = np.abs(px - img.astype(float))
    assert err.mean() < 4.0 and err.max() < 25.0  # quantization-level

    # restart markers: byte-identical pixel reconstruction required
    _meta_r, px_r = decode_jpeg_pixels(
        encode_jpeg(img, restart_interval=2)
    )
    assert (px_r == px).all()


def test_jpeg_orientation_and_channels():
    import numpy as np

    from quebic_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    # left black / right white: a row/col transpose or x-flip shows up
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:] = 255
    _m, px = decode_jpeg_pixels(encode_jpeg(img))
    assert px[:, :8].mean() < 5 and px[:, 8:].mean() > 250
    # top red / bottom blue: y orientation AND channel order
    img2 = np.zeros((16, 8, 3), dtype=np.uint8)
    img2[:8, :, 0] = 250
    img2[8:, :, 2] = 250
    _m2, px2 = decode_jpeg_pixels(encode_jpeg(img2))
    assert px2[:8, :, 0].mean() > 240 and px2[:8, :, 2].mean() < 10
    assert px2[8:, :, 2].mean() > 240 and px2[8:, :, 0].mean() < 10


def test_jpeg_grayscale_and_mean():
    import numpy as np

    from quebic_spark.functions.jpeg import decode_jpeg, encode_jpeg

    g = (np.arange(32 * 16).reshape(32, 16) % 256).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g, grayscale=True))
    assert d["channels"] == 1
    assert d["mean_value"] == pytest.approx(float(g.mean()), abs=4.0)


def test_decode_media_jpeg_dispatch_and_quarantine(spark):
    import numpy as np

    from quebic_spark.functions.jpeg import encode_jpeg
    from quebic_spark.operators.multimodal import decode_media

    good = encode_jpeg(np.full((8, 8, 3), 200, dtype=np.uint8))
    # flip SOF0 (FFC0) to SOF2 (FFC2): the stream now CLAIMS
    # progressive but carries a full-band Ss=0/Se=63 scan, which T.81
    # forbids in a SOF2 frame — must quarantine, not misdecode (real
    # progressive streams decode since r7; see
    # test_progressive_jpeg_decodes_identical_to_baseline)
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    truncated = good[: len(good) // 2]
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(progressive)),
            (3, bytearray(truncated)),
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert out[1]["fmt"] == "jpeg"
    assert out[1]["width"] == 8 and out[1]["channels"] == 3
    assert abs(out[1]["mean_value"] - 200.0) < 3.0
    assert out[2]["fmt"] == "jpeg-error-stub"
    assert out[3]["fmt"] == "jpeg-error-stub"


def test_decoders_never_crash_on_fuzzed_payloads():
    """The never-fails-mid-scan contract, adversarially: random bytes,
    random bytes behind each real format's magic, and bit-flipped
    mutations of a VALID JPEG must all either decode or raise a normal
    exception (which decode_media quarantines) — never hang, never
    kill the interpreter. Pure-Python check (no Spark) so hypothesis
    can drive volume; the Spark quarantine path is asserted separately
    above."""
    import random

    import numpy as np

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from quebic_spark.functions.jpeg import encode_jpeg
    from quebic_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_bmp,
        decode_mp4,
        decode_png,
        decode_wav,
        detect_format,
    )
    from quebic_spark.functions.jpeg import decode_jpeg

    from quebic_spark.operators.multimodal import decode_gif

    from quebic_spark.operators.multimodal import decode_avi

    decoders = {
        "jpeg": decode_jpeg,
        "png": decode_png,
        "bmp": decode_bmp,
        "wav": decode_wav,
        "mp4": decode_mp4,
        "gif": decode_gif,
        "avi": decode_avi,
    }
    magics = {
        "jpeg": b"\xff\xd8\xff",
        "png": PNG_MAGIC,
        "bmp": b"BM" + b"\x00" * 60,
        "wav": b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 32,
        "mp4": b"\x00\x00\x00\x18ftypisom",
        "gif": b"GIF89a",
        "avi": b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 16,
    }

    import warnings

    def probe(payload: bytes) -> None:
        kind = detect_format(payload)
        if kind == "unknown":
            return
        try:
            with warnings.catch_warnings():
                # NumPy 2 turns silent int-to-int32 overflow into an
                # error; escalate the 1.x DeprecationWarning so the
                # behavior drift fails HERE on either version instead
                # of changing quarantine behavior between environments.
                warnings.simplefilter("error", DeprecationWarning)
                decoders[kind](payload)
        except DeprecationWarning:
            raise  # cross-version behavior drift — a real defect
        except Exception:
            pass  # quarantine path — any normal exception is fine

    @settings(max_examples=150, deadline=None)
    @given(st.binary(min_size=0, max_size=300))
    def fuzz_raw(data):
        probe(data)
        for magic in magics.values():
            probe(magic + data)

    fuzz_raw()

    # bit-flip mutations of a valid JPEG: the parser sees mostly-sane
    # structure with one lie somewhere (the hardest corruption class)
    rnd = random.Random(1234)
    good = bytearray(
        encode_jpeg(
            (np.arange(16 * 24 * 3).reshape(16, 24, 3) % 256).astype(
                np.uint8
            )
        )
    )
    for _ in range(200):
        mut = bytearray(good)
        for _k in range(rnd.randrange(1, 4)):
            i = rnd.randrange(len(mut))
            mut[i] ^= 1 << rnd.randrange(8)
        probe(bytes(mut))

    # same mutation class over the 64-bit-field MP4 variant (r17):
    # co64 offsets, largesize mdat, mvhd v1 — a flipped bit in any
    # 64-bit length/offset field must quarantine, never balloon or
    # crash the interpreter
    good_mp4, _ = _mjpeg_mp4(
        n_frames=3, frames_per_chunk=2, chunk_offset_box="co64",
        mvhd_version=1, mdat_largesize=True,
    )
    good_mp4 = bytearray(good_mp4)
    for _ in range(200):
        mut = bytearray(good_mp4)
        for _k in range(rnd.randrange(1, 4)):
            i = rnd.randrange(len(mut))
            mut[i] ^= 1 << rnd.randrange(8)
        probe(bytes(mut))

    # same mutation class over the FRAGMENTED variant (r18): a flipped
    # bit in a trun sample_count, tfhd flags, data_offset, or mehd
    # duration must quarantine in bounded memory — the trun walk
    # pre-checks its per-sample field extent exactly like stsz
    good_fmp4, _ = _mjpeg_mp4(
        n_frames=5, fragmented=True, frames_per_fragment=2,
        edit_media_time=1,
    )
    good_fmp4 = bytearray(good_fmp4)
    for _ in range(200):
        mut = bytearray(good_fmp4)
        for _k in range(rnd.randrange(1, 4)):
            i = rnd.randrange(len(mut))
            mut[i] ^= 1 << rnd.randrange(8)
        probe(bytes(mut))

    # the same mutation class against a valid PROGRESSIVE JPEG: the
    # scan-sequencing state machine (EOB runs, refinement bits,
    # spectral bounds) sees mostly-sane structure with one lie
    from quebic_spark.functions.jpeg import encode_jpeg_progressive

    good_prog = bytearray(
        encode_jpeg_progressive(
            (np.arange(16 * 24 * 3).reshape(16, 24, 3) % 256).astype(
                np.uint8
            ),
            subsample="420",
            restart_interval=2,
        )
    )
    for _ in range(200):
        mut = bytearray(good_prog)
        for _k in range(rnd.randrange(1, 4)):
            i = rnd.randrange(len(mut))
            mut[i] ^= 1 << rnd.randrange(8)
        probe(bytes(mut))

    # same class of mutation against a valid GIF: the LZW decoder sees
    # plausible structure with corrupted codes/sub-block lengths
    from quebic_spark.operators.multimodal import encode_gif

    good_gif = bytearray(encode_gif(12, 9, _gif_grid(12, 9, 40)))
    for _ in range(200):
        mut = bytearray(good_gif)
        for _k in range(rnd.randrange(1, 4)):
            i = rnd.randrange(len(mut))
            mut[i] ^= 1 << rnd.randrange(8)
        probe(bytes(mut))

    good_avi, _ = _mjpeg_avi(n_frames=2)
    for _ in range(200):
        mut = bytearray(good_avi)
        for _k in range(rnd.randrange(1, 4)):
            i = rnd.randrange(len(mut))
            mut[i] ^= 1 << rnd.randrange(8)
        probe(bytes(mut))


def test_jpeg_dc_store_wraps_int32_deterministically():
    """A fuzzed DHT can carry a DC category symbol far past the legal
    11, making the running DC prediction an unbounded Python int; the
    int32 coefficient store must wrap it explicitly (two's complement)
    rather than rely on NumPy's version-dependent overflow behavior
    (1.x DeprecationWarning + silent wrap, 2.x OverflowError)."""
    import warnings

    import numpy as np

    from quebic_spark.functions.jpeg import (
        _BitReader,
        _baseline_block,
        _wrap_i32,
    )

    # the exact value the r10/r11 fuzz runs surfaced in the suite log
    assert _wrap_i32(-4083033140) == -4083033140 + 2**32
    assert _wrap_i32(2**31) == -(2**31)
    assert _wrap_i32(-(2**31) - 1) == 2**31 - 1
    assert _wrap_i32(12345) == 12345 and _wrap_i32(-12345) == -12345

    # drive _baseline_block with a synthetic table whose single DC
    # symbol requests a 40-bit magnitude: bit stream = [0] (huffman
    # code for symbol 40), then 40 magnitude bits 1000...0 (v = 2**39,
    # positive per EXTEND), then [0] decoding AC symbol 0 = EOB.
    dc_tab = {(1, 0): 40}
    ac_tab = {(1, 0): 0}
    bits = "0" + "1" + "0" * 39 + "0"
    bits += "0" * (-len(bits) % 8)
    payload = int(bits, 2).to_bytes(len(bits) // 8, "big")
    reader = _BitReader(payload, 0)
    cf = np.zeros(64, dtype=np.int32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", DeprecationWarning)
        pred = _baseline_block(reader, dc_tab, ac_tab, cf, 0)
    assert pred == _wrap_i32(2**39) == 0
    assert cf[0] == 0


def test_jpeg_noise_roundtrip_and_linear_entropy_decode():
    """Review-pass regression tests: (1) DQT must be written in zigzag
    order — with natural-order bytes the decoder dequantizes AC
    coefficients with the wrong quantizer and noise round-trip error
    doubles (measured 29.9 vs 16.8 mean abs); (2) the bit reader must
    mask consumed bits or entropy decode goes quadratic in scan size."""
    import time

    import numpy as np

    from quebic_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    _m, px = decode_jpeg_pixels(encode_jpeg(noise))
    err = np.abs(px - noise.astype(float)).mean()
    assert err < 22.0, f"noise round-trip mean err {err} (DQT order?)"

    big = rng.randint(0, 256, (192, 192, 3)).astype(np.uint8)
    payload = encode_jpeg(big)
    t0 = time.time()
    decode_jpeg_pixels(payload)
    took = time.time() - t0
    assert took < 8.0, f"entropy decode took {took:.1f}s (quadratic?)"


def test_jpeg_multiscan_and_oversize_quarantine(spark):
    import struct

    import numpy as np

    from quebic_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from quebic_spark.operators.multimodal import decode_media

    good = encode_jpeg(np.full((8, 8, 3), 90, dtype=np.uint8))
    # shrink the SOS header to claim 1 of 3 components (legal
    # non-interleaved layout this decoder does not support)
    i = good.index(b"\xff\xda")
    ns = good[i + 4]
    assert ns == 3
    multiscan = (
        good[:i]
        + b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3)
        + bytes([1]) + good[i + 5: i + 7]  # first component spec only
        + good[i + 11:]                    # Ss/Se/Ah-Al + entropy data
    )
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg(multiscan)
    # oversize geometry: patch SOF dims to 60000x60000 (memory-bomb
    # guard must raise before allocating)
    j = good.index(b"\xff\xc0")
    oversize = (
        good[:j + 5]
        + struct.pack(">HH", 60000, 60000)
        + good[j + 9:]
    )
    with pytest.raises(ValueError, match="geometry"):
        decode_jpeg(oversize)
    out = {
        r["doc_id"]: r["fmt"]
        for r in decode_media(
            spark.createDataFrame(
                [(1, bytearray(multiscan)), (2, bytearray(oversize))],
                "doc_id long, payload binary",
            )
        ).collect()
    }
    assert out == {1: "jpeg-error-stub", 2: "jpeg-error-stub"}


def test_png_truncated_after_scanlines_quarantines(spark):
    """A deflate stream cut after the last scanline byte but before
    the terminator/adler32 must still raise (eof check)."""
    import struct
    import zlib

    import numpy as np

    from quebic_spark.operators.multimodal import (
        PNG_MAGIC,
        decode_png,
        encode_png,
    )

    rgb = [[(10, 20, 30)] * 4 for _ in range(4)]
    good = encode_png(4, 4, rgb)
    # rebuild with an IDAT whose deflate data inflates to the full
    # scanline payload but never terminates: compress with a raw
    # deflater and drop the final block marker by truncating
    raw = b"".join(
        b"\x00" + bytes(bytes(px for t in row for px in t))
        for row in rgb
    )
    full = zlib.compress(raw, 6)
    cut = full[:-5]  # drop terminator + part of adler32
    ihdr_chunk = good[8:33]

    def chunk(ctype, data):
        body = ctype + data
        return (
            struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    bad = (
        PNG_MAGIC + ihdr_chunk + chunk(b"IDAT", cut)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(Exception):
        decode_png(bad)


# ---------------------------------------------------------------------------
# MP4: real ISO-BMFF container-metadata parser (box walk, no codec).
# ---------------------------------------------------------------------------


def _box(btype: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I4s", len(body) + 8, btype) + body


def _make_mp4(
    w=640, h=360, timescale=600, duration=1200, n_samples=48
) -> bytes:
    """Minimal synthetic MP4: ftyp + moov(mvhd, trak(tkhd, mdia(minf(
    stbl(stsz))))) with known geometry — built box-by-box so the
    parser is tested against the FORMAT, not a shared helper."""
    import struct

    mvhd = _box(
        b"mvhd",
        b"\x00" + b"\x00" * 3          # version 0 + flags
        + b"\x00" * 8                  # creation/modification
        + struct.pack(">II", timescale, duration)
        + b"\x00" * 80,                # rate..next_track_id
    )
    tkhd = _box(
        b"tkhd",
        b"\x00" + b"\x00" * 3
        + b"\x00" * 72                 # times/ids/matrix
        + struct.pack(">II", w << 16, h << 16),
    )
    stsz = _box(
        b"stsz",
        b"\x00" * 4                    # version/flags
        + struct.pack(">II", 0, n_samples),  # sample_size=0, count
    )
    stbl = _box(b"stbl", stsz)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_mp4_metadata_parse_and_quarantine(spark):
    from quebic_spark.operators.multimodal import (
        decode_media,
        decode_mp4,
        detect_format,
    )

    good = _make_mp4()
    assert detect_format(good) == "mp4"
    d = decode_mp4(good)
    assert (d["width"], d["height"]) == (640, 360)
    assert d["n_frames"] == 48
    assert d["sample_rate"] == 600
    assert d["mean_value"] is None  # metadata tier: no pixel claim

    no_moov = _box(b"ftyp", b"isom")  # ftyp only
    # corrupt the mvhd box SIZE (first child of moov at offset 32:
    # ftyp is 24 bytes, moov header 8) so the box walk must reject it
    bad_size = good[:32] + b"\xff\xff\xff\xff" + good[36:]
    audio_only = _make_mp4(w=0, h=0)
    rows = {
        r["doc_id"]: r
        for r in decode_media(
            spark.createDataFrame(
                [
                    (1, bytearray(good)),
                    (2, bytearray(no_moov)),
                    (3, bytearray(bad_size)),
                    (4, bytearray(audio_only)),
                ],
                "doc_id long, payload binary",
            )
        ).collect()
    }
    assert rows[1]["fmt"] == "mp4" and rows[1]["width"] == 640
    assert rows[2]["fmt"] == "mp4-error-stub"
    assert rows[3]["fmt"] == "mp4-error-stub"
    assert rows[4]["fmt"] == "mp4-error-stub"


def test_mp4_metadata_feeds_frame_sample(spark):
    """Composition: decode_media's REAL mp4 n_frames drives
    frame_sample — every 4th of 48 frames = 12 sampled rows."""
    from quebic_spark.operators.multimodal import (
        decode_media,
        frame_sample,
    )

    payloads = spark.createDataFrame(
        [(1, bytearray(_make_mp4(n_samples=48)))],
        "doc_id long, payload binary",
    )
    meta = decode_media(payloads).select("doc_id", "n_frames")
    sampled = frame_sample(
        payloads.join(meta, "doc_id"), every_nth=4
    ).collect()
    assert len(sampled) == 12
    assert [r["frame_idx"] for r in sampled] == list(range(0, 48, 4))


def test_mp4_tkhd_v1_and_uint32_guard(spark):
    """Review-pass regressions: (1) version-1 tkhd stores w/h at
    body offset 88 (64-bit times widen the header) — parsing at the
    v0 offset lands in the matrix; (2) uint32 fields too big for the
    int32 output schema must raise per-row, not fail the Arrow batch."""
    import struct

    from quebic_spark.operators.multimodal import (
        decode_media,
        decode_mp4,
    )

    mvhd = _box(
        b"mvhd",
        b"\x00" * 4 + b"\x00" * 8
        + struct.pack(">II", 600, 1200) + b"\x00" * 80,
    )
    tkhd_v1 = _box(
        b"tkhd",
        b"\x01" + b"\x00" * 3          # version 1
        + b"\x00" * 84                 # widened times/ids/matrix
        + struct.pack(">II", 320 << 16, 240 << 16),
    )
    stsz = _box(
        b"stsz", b"\x00" * 4 + struct.pack(">II", 0, 10)
    )
    trak = _box(
        b"trak",
        tkhd_v1 + _box(b"mdia", _box(b"minf", _box(b"stbl", stsz))),
    )
    v1_mp4 = _box(b"ftyp", b"isom") + _box(b"moov", mvhd + trak)
    d = decode_mp4(v1_mp4)
    assert (d["width"], d["height"], d["n_frames"]) == (320, 240, 10)

    overflow = _make_mp4(n_samples=0xFFFFFFFF)
    with pytest.raises(ValueError, match="implausible"):
        decode_mp4(overflow)
    out = {
        r["doc_id"]: r["fmt"]
        for r in decode_media(
            spark.createDataFrame(
                [(1, bytearray(v1_mp4)), (2, bytearray(overflow))],
                "doc_id long, payload binary",
            )
        ).collect()
    }
    assert out == {1: "mp4", 2: "mp4-error-stub"}


def test_jpeg_non_divisor_sampling_quarantines():
    """Sampling factors like 3-vs-max-4 are legal per T.81 but the
    integer-repeat upsampler can't express them — must raise, never
    emit wrong chroma."""
    import numpy as np

    from quebic_spark.functions.jpeg import decode_jpeg, encode_jpeg

    good = encode_jpeg(np.full((8, 8, 3), 50, dtype=np.uint8))
    i = good.index(b"\xff\xc0")
    # SOF comp specs start at marker+2(len)+2 + 6: [cid,hv,tq] x 3
    sof_comps = i + 4 + 6
    patched = bytearray(good)
    patched[sof_comps + 1] = 0x33      # Y: 3x3
    patched[sof_comps + 4] = 0x22      # Cb: 2x2 -> 3 % 2 != 0
    patched[sof_comps + 7] = 0x22
    with pytest.raises(ValueError, match="non-divisor"):
        decode_jpeg(bytes(patched))


# ---------------------------------------------------------------------------
# GIF decode (real LZW)
# ---------------------------------------------------------------------------

def _gif_grid(w, h, ncol, seed=3):
    import random

    rng = random.Random(seed)
    colors = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(ncol)
    ]
    return [[colors[rng.randrange(ncol)] for _ in range(w)]
            for _ in range(h)]


def test_decode_gif_exact_pixels_and_dictionary_growth():
    """Round-trip through the REAL LZW path: 250 colors over 64x48
    pixels forces dictionary growth through several code widths; exact
    array equality catches palette, orientation, and width-sync bugs a
    mean cannot."""
    import numpy as np

    from quebic_spark.operators.multimodal import (
        _decode_gif_pixels,
        decode_gif,
        encode_gif,
    )

    for w, h, ncol in [(5, 3, 2), (16, 16, 7), (64, 48, 250),
                       (40, 40, 256)]:
        rows = _gif_grid(w, h, ncol)
        rgb, n_frames = _decode_gif_pixels(encode_gif(w, h, rows))
        assert n_frames == 1
        assert np.array_equal(rgb, np.array(rows, dtype=np.uint8)), (
            w, h, ncol
        )
    d = decode_gif(encode_gif(6, 4, _gif_grid(6, 4, 5)))
    assert (d["fmt"], d["width"], d["height"], d["channels"]) == (
        "gif", 6, 4, 3
    )


def test_decode_gif_interlaced_restores_row_order():
    import numpy as np

    from quebic_spark.operators.multimodal import (
        _decode_gif_pixels,
        encode_gif,
    )

    # every row a distinct color: any interlace restoration slip
    # produces a row permutation that exact equality catches
    h, w = 13, 4  # odd height exercises ragged interlace passes
    rows = [[(y * 19 % 256, y, 255 - y)] * w for y in range(h)]
    rgb, _ = _decode_gif_pixels(encode_gif(w, h, rows, interlaced=True))
    assert np.array_equal(rgb, np.array(rows, dtype=np.uint8))


def test_decode_gif_animation_and_spark_route(spark):
    from quebic_spark.operators.multimodal import decode_media, encode_gif

    payload = encode_gif(8, 8, _gif_grid(8, 8, 9), n_frames=4)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    [row] = decode_media(df).collect()
    assert row["fmt"] == "gif"
    assert row["n_frames"] == 4
    assert row["width"] == 8 and row["height"] == 8


def test_decode_gif_corrupt_quarantines(spark):
    import pytest as _pytest

    from quebic_spark.operators.multimodal import (
        decode_gif,
        decode_media,
        encode_gif,
    )

    good = encode_gif(8, 8, _gif_grid(8, 8, 4))
    # 4 colors -> GCT is 4 entries (12 bytes) after the 13-byte
    # header; the first block id sits at offset 25
    first_block = 13 + 3 * 4
    assert good[first_block] == 0x2C
    bad_cases = {
        "truncated": good[:20],
        "bad_block": (good[:first_block] + b"\x99"
                      + good[first_block + 1:]),
        "no_trailer_garbage": good[:-1] + b"\x7f",
        # truncated exactly at a block boundary: structure parses but
        # the 0x3B trailer never arrives (review catch)
        "missing_trailer": good[:-1],
    }
    for name, payload in bad_cases.items():
        with _pytest.raises(ValueError):
            decode_gif(payload)

    # geometry bomb: huge declared frame dims with a tiny stream
    import struct

    bomb = bytearray(good)
    # image descriptor follows header(13) + GCT; find 0x2C
    at = bomb.index(0x2C, 13)
    struct.pack_into("<HH", bomb, at + 5, 65000, 65000)
    with _pytest.raises(ValueError):
        decode_gif(bytes(bomb))

    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(bad_cases.values())],
        "doc_id long, payload binary",
    )
    out = decode_media(df).collect()
    assert all(r["fmt"] == "gif-error-stub" for r in out)


def test_gif_animation_count_feeds_frame_sample(spark):
    """Composition: decode_media's REAL gif n_frames (animation
    descriptors) drives frame_sample — every 3rd of 9 frames = 3
    sampled rows with the 40 ms timestamp grid."""
    from quebic_spark.operators.multimodal import (
        decode_media,
        encode_gif,
        frame_sample,
    )

    payloads = spark.createDataFrame(
        [(1, bytearray(encode_gif(6, 6, _gif_grid(6, 6, 5),
                                  n_frames=9)))],
        "doc_id long, payload binary",
    )
    meta = decode_media(payloads).select("doc_id", "n_frames")
    [row] = meta.collect()
    assert row["n_frames"] == 9
    sampled = frame_sample(
        payloads.join(meta, "doc_id"), every_nth=3
    ).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 3, 6]
    assert [r["frame_ts_ms"] for r in sampled] == [0, 120, 240]


def test_progressive_jpeg_decodes_identical_to_baseline():
    """Progressive (SOF2) decode: both encoders quantize identically,
    so the progressive scan sequence (DC first/refine, AC first with
    EOB runs, AC refine correction bits) must reconstruct EXACTLY the
    baseline pixels — any drift means a scan desync."""
    import numpy as np

    from quebic_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(7)
    cases = [
        np.full((8, 8, 3), 200, dtype=np.uint8),
        np.stack(
            [np.tile(np.arange(24) * 10 % 256, (16, 1))] * 3, axis=-1
        ).astype(np.uint8),
        rng.randint(0, 256, (24, 17, 3)).astype(np.uint8),  # pad + noise
        rng.randint(0, 256, (64, 48, 3)).astype(np.uint8),
        (rng.randint(0, 2, (40, 40, 3))
         * rng.randint(0, 256, (40, 40, 3))).astype(np.uint8),
    ]
    for img in cases:
        for sub in ("444", "420"):
            mb, pb = decode_jpeg_pixels(encode_jpeg(img, subsample=sub))
            mp, pp = decode_jpeg_pixels(
                encode_jpeg_progressive(img, subsample=sub)
            )
            # 4:2:0 exercises multi-block MCUs in the interleaved DC
            # scans AND chroma AC scans over TRUE block grids smaller
            # than the MCU-padded grids
            assert np.array_equal(pb, pp), sub
            assert mp["fmt"] == "jpeg"
            assert mp["mean_value"] == mb["mean_value"], sub
    gray = rng.randint(0, 256, (20, 20)).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg_pixels(encode_jpeg(gray, grayscale=True))[1],
        decode_jpeg_pixels(
            encode_jpeg_progressive(gray, grayscale=True)
        )[1],
    )
    # scan-variant coverage: restart markers inside progressive scans
    # (EOB runs flushed at every restart; DC preds reset) and
    # non-interleaved per-component DC scans over true block grids
    img = rng.randint(0, 256, (40, 33, 3)).astype(np.uint8)
    for kwargs in (
        {"restart_interval": 3},
        {"dc_interleaved": False},
        {"restart_interval": 2, "dc_interleaved": False},
        {"subsample": "420", "restart_interval": 3},
        {"subsample": "420", "dc_interleaved": False},
    ):
        sub = kwargs.get("subsample", "444")
        base = decode_jpeg_pixels(encode_jpeg(img, subsample=sub))[1]
        got = decode_jpeg_pixels(
            encode_jpeg_progressive(img, **kwargs)
        )[1]
        assert np.array_equal(base, got), kwargs


def test_jpeg_fill_bytes_before_markers_decode_identically():
    """0xFF fill bytes before a marker are legal padding (T.81
    B.1.1.2). The post-scan resync used to stop at the FIRST FF of a
    fill run, so 'FF FF DA' handed the main loop marker=0xFF, whose
    next two bytes (the real marker) parsed as a bogus segment length
    — the remaining scans were silently skipped and a PARTIAL image
    returned (r7 review catch). Fill runs before every inter-scan
    marker must now decode bit-identically to the unpadded stream."""
    import numpy as np

    from quebic_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (24, 17, 3)).astype(np.uint8)
    for payload in (
        encode_jpeg(img),
        encode_jpeg_progressive(img),
        encode_jpeg_progressive(img, subsample="420"),
    ):
        _m, base = decode_jpeg_pixels(payload)
        # pad every SOS after the first (the inter-scan resync path)
        # and the EOI with 1-3 fill bytes; raw FF DA / FF D9 cannot
        # occur inside entropy data (0xFF is always stuffed as FF 00)
        padded = payload.replace(b"\xff\xda", b"\xff\xff\xda")
        padded = padded[:2] + padded[2:].replace(
            b"\xff\xd9", b"\xff\xff\xff\xd9"
        )
        assert padded != payload
        _m2, got = decode_jpeg_pixels(padded)
        assert np.array_equal(base, got)


def test_progressive_jpeg_through_decode_media_and_quarantines(spark):
    """Real progressive streams dispatch as fmt=jpeg in the decode
    tier; truncated or structurally-invalid progressive bodies still
    quarantine instead of killing the scan."""
    import numpy as np

    from quebic_spark.functions.jpeg import encode_jpeg_progressive
    from quebic_spark.operators.multimodal import decode_media

    img = np.full((16, 16, 3), 99, dtype=np.uint8)
    good = encode_jpeg_progressive(img)
    truncated = good[: int(len(good) * 0.6)]
    # an AC scan claiming 3 components is illegal in progressive
    i = good.rindex(b"\xff\xda")
    bad_ns = bytearray(good)
    bad_ns[i + 4] = 3
    df = spark.createDataFrame(
        [
            (1, bytearray(good)),
            (2, bytearray(truncated)),
            (3, bytearray(bytes(bad_ns))),
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert out[1]["fmt"] == "jpeg"
    assert out[1]["width"] == 16 and out[1]["channels"] == 3
    assert abs(out[1]["mean_value"] - 99.0) < 3.0
    assert out[2]["fmt"] == "jpeg-error-stub"
    assert out[3]["fmt"] == "jpeg-error-stub"


# ---------------------------------------------------------------------------
# AVI / MJPEG — the real video tier (r9)
# ---------------------------------------------------------------------------

def _mjpeg_avi(n_frames=6, w=16, h=8, fps=10):
    import numpy as np

    from quebic_spark.functions.jpeg import encode_jpeg
    from quebic_spark.operators.multimodal import encode_avi_mjpeg

    frames = []
    for i in range(n_frames):
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0] = (i * 37) % 256    # per-frame distinct content
        img[:, :, 1] = 64
        img[::2, :, 2] = 200
        frames.append(encode_jpeg(img))
    return encode_avi_mjpeg(frames, w, h, fps=fps), frames


def test_avi_roundtrip_metadata_and_first_frame_mean():
    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import (
        avi_frames,
        decode_avi,
        detect_format,
    )

    payload, frames = _mjpeg_avi()
    assert detect_format(payload) == "avi"
    d = decode_avi(payload)
    assert (d["fmt"], d["width"], d["height"]) == ("avi", 16, 8)
    assert d["n_frames"] == 6 and d["sample_rate"] == 10
    # pixel-access proof: mean_value equals decoding frame 0 directly
    assert d["mean_value"] == decode_jpeg(frames[0])["mean_value"]
    assert d["mean_value"] is not None
    # container extraction returns the exact stored JPEG bytes
    assert list(avi_frames(payload)) == frames


def test_avi_corrupt_payload_quarantines_in_decode_media(spark):
    from quebic_spark.operators.multimodal import decode_media

    payload, _ = _mjpeg_avi(n_frames=2)
    bad = payload[:40]  # valid magic, truncated body
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(bad))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_media(df).collect()}
    assert rows[1].fmt == "avi" and rows[1].n_frames == 2
    assert rows[2].fmt == "avi-error-stub"


def test_video_frame_sample_decodes_true_pixels(spark):
    import numpy as np

    from quebic_spark.functions.jpeg import decode_jpeg_pixels
    from quebic_spark.operators.multimodal import video_frame_sample

    payload, frames = _mjpeg_avi(n_frames=7, fps=10)
    df = spark.createDataFrame(
        [(5, bytearray(payload)), (6, bytearray(b"not a video"))],
        "doc_id long, payload binary",
    )
    got = {
        (r.doc_id, r.frame_idx): r
        for r in video_frame_sample(df, every_nth=3).collect()
    }
    # frames 0, 3, 6 sampled; the non-video payload yields no rows
    assert set(got) == {(5, 0), (5, 3), (5, 6)}
    for (_, idx), r in got.items():
        meta, px = decode_jpeg_pixels(frames[idx])
        assert (r.width, r.height) == (meta["width"], meta["height"])
        assert abs(r.mean_luma - float(np.asarray(px).mean())) < 1e-9
        # 100 ms per frame at 10 fps
        assert r.frame_ts_ms == idx * 100
        assert r.decode_ok


def test_avi_rec_list_interleaved_layout_decodes():
    """Frames wrapped in 'LIST rec ' records (the standard interleaved
    layout) must extract identically to the flat layout."""
    import struct

    from quebic_spark.operators.multimodal import avi_frames, decode_avi

    payload, frames = _mjpeg_avi(n_frames=4)

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    # rebuild the movi list with each frame inside its own rec record
    flat_movi = chunk(
        b"LIST", b"movi" + b"".join(chunk(b"00dc", f) for f in frames)
    )
    rec_movi = chunk(
        b"LIST",
        b"movi"
        + b"".join(
            chunk(b"LIST", b"rec " + chunk(b"00dc", f)) for f in frames
        ),
    )
    assert flat_movi in payload
    rec_payload = payload.replace(flat_movi, rec_movi)
    body_len = len(rec_payload) - 8
    rec_payload = (
        rec_payload[:4] + struct.pack("<I", body_len) + rec_payload[8:]
    )
    assert list(avi_frames(rec_payload)) == frames
    assert decode_avi(rec_payload)["n_frames"] == 4


def _mjpeg_mp4(n_frames=5, w=16, h=8, fps=10, frames_per_chunk=None,
               **encoder_kwargs):
    import numpy as np

    from quebic_spark.functions.jpeg import encode_jpeg
    from quebic_spark.operators.multimodal import encode_mp4_mjpeg

    frames = []
    for i in range(n_frames):
        img = np.zeros((h, w, 3), dtype=np.uint8)
        img[:, :, 0] = (i * 41) % 256
        img[:, :, 1] = 80
        img[::2, :, 2] = 170
        frames.append(encode_jpeg(img))
    return encode_mp4_mjpeg(
        frames, w, h, fps=fps, frames_per_chunk=frames_per_chunk,
        **encoder_kwargs,
    ), frames


def test_mp4_mjpeg_first_frame_mean_and_extraction():
    """r16: MJPEG-in-MP4 joins the real video tier — decode_mp4
    decodes frame 0's pixels for mean_value (same proof as
    decode_avi) and mp4_frames extracts the exact stored JPEG
    bytes."""
    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import (
        decode_mp4,
        detect_format,
        mp4_frames,
    )

    payload, frames = _mjpeg_mp4()
    assert detect_format(payload) == "mp4"
    d = decode_mp4(payload)
    assert (d["fmt"], d["width"], d["height"]) == ("mp4", 16, 8)
    assert d["n_frames"] == 5 and d["sample_rate"] == 10
    assert d["mean_value"] == decode_jpeg(frames[0])["mean_value"]
    assert d["mean_value"] is not None
    assert list(mp4_frames(payload)) == frames


def test_mp4_mjpeg_multichunk_stsc_walk():
    """5 frames at 2 per chunk = chunks of 2/2/1 with a two-run stsc
    table — the sample-to-chunk walk must reassemble the exact frame
    sequence, and a truncated mdat must raise, not yield garbage."""
    import pytest

    from quebic_spark.operators.multimodal import decode_mp4, mp4_frames

    payload, frames = _mjpeg_mp4(n_frames=5, frames_per_chunk=2)
    assert list(mp4_frames(payload)) == frames
    assert decode_mp4(payload)["mean_value"] is not None
    # truncation: drop bytes from the END of mdat (moov re-appended
    # verbatim) — the mdat box extent now overruns the buffer and the
    # box walk must fail loud rather than extract shifted garbage
    moov_at = payload.rindex(b"moov") - 4
    torn = payload[: moov_at - len(frames[-1]) // 2] + payload[moov_at:]
    with pytest.raises(ValueError, match="overruns|bad box"):
        list(mp4_frames(torn))


@pytest.mark.parametrize("variant", [
    {"chunk_offset_box": "co64"},
    {"mvhd_version": 1},
    {"mdat_largesize": True},
    {"chunk_offset_box": "co64", "mvhd_version": 1,
     "mdat_largesize": True},
])
def test_mp4_64bit_field_variants_roundtrip(variant):
    """r17: co64 chunk offsets, mvhd v1 (64-bit times), and size==1
    extended (largesize) boxes all appear in SMALL real-world files —
    some muxers emit them unconditionally — and used to quarantine.
    Each variant (and all three combined) must decode identically to
    the 32-bit form: same metadata, same first-frame mean, exact
    frame extraction through the multi-chunk stsc walk."""
    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import (
        decode_mp4,
        detect_format,
        mp4_frames,
    )

    payload, frames = _mjpeg_mp4(
        n_frames=5, frames_per_chunk=2, **variant
    )
    assert detect_format(payload) == "mp4"
    d = decode_mp4(payload)
    assert (d["fmt"], d["width"], d["height"]) == ("mp4", 16, 8)
    assert d["n_frames"] == 5 and d["sample_rate"] == 10
    assert d["mean_value"] == decode_jpeg(frames[0])["mean_value"]
    assert list(mp4_frames(payload)) == frames


def test_mp4_64bit_variant_truncations_fail_loud():
    """The 64-bit paths keep the fuzz contract: a truncated largesize
    header, a truncated co64 table, and a short mvhd v1 all raise a
    catchable ValueError in bounded memory."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import decode_mp4, mp4_frames

    payload, _ = _mjpeg_mp4(n_frames=2, chunk_offset_box="co64",
                            mvhd_version=1, mdat_largesize=True)
    # co64 table claims more entries than its box holds
    at = payload.index(b"co64")
    t = bytearray(payload)
    t[at + 8: at + 12] = struct.pack(">I", 1000)
    with pytest.raises(ValueError, match="chunk offset table truncated"):
        list(mp4_frames(bytes(t)))
    # mvhd v1 body shorter than its 64-bit layout
    at = payload.index(b"mvhd")
    t = bytearray(payload)
    t[at - 4: at] = struct.pack(">I", 8 + 16)  # box too small for v1
    with pytest.raises(ValueError):
        decode_mp4(bytes(t))
    # largesize smaller than the 16-byte extended header
    at = payload.index(b"mdat")
    t = bytearray(payload)
    t[at + 4: at + 12] = struct.pack(">Q", 8)
    with pytest.raises(ValueError, match="bad box size"):
        decode_mp4(bytes(t))


@pytest.mark.parametrize("variant", [
    {},
    {"frames_per_fragment": 2},
    {"frames_per_fragment": 2, "mdat_largesize": True},
    {"frames_per_fragment": 1, "mvhd_version": 1,
     "chunk_offset_box": "co64"},
])
def test_mp4_fragmented_variants_match_unfragmented(variant):
    """r18 (VERDICT r17 next #3): DASH/CMAF fragmented MP4 — empty
    stbl, per-fragment moof/trun sample runs, mvex defaults, mvhd
    duration 0 with the real total in mehd. Every variant must decode
    identically to the unfragmented form: same metadata, same
    first-frame mean, byte-exact frame extraction across fragment
    boundaries."""
    from quebic_spark.operators.multimodal import (
        decode_mp4,
        detect_format,
        mp4_frames,
    )

    plain, frames = _mjpeg_mp4(n_frames=5, frames_per_chunk=2)
    frag, frames2 = _mjpeg_mp4(n_frames=5, fragmented=True, **variant)
    assert frames2 == frames
    assert detect_format(frag) == "mp4"
    assert decode_mp4(frag) == decode_mp4(plain)
    assert list(mp4_frames(frag)) == frames


def test_mp4_fragmented_metadata_and_quarantine_tiers():
    """The honest-tier contract over fragments: a metadata-only codec
    (stsd avc1) still reports n_frames from the trun runs with
    mean_value NULL; an implicit tfhd base (neither base_data_offset
    nor default-base-is-moof — the pre-CMAF legacy default, DECODED
    since r19: first traf anchors at the moof start) extracts the
    same frames; a forged huge trun sample_count dies in O(1) on the
    extent pre-check."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import (
        decode_mp4,
        mp4_frames,
    )

    frag, frames = _mjpeg_mp4(
        n_frames=4, fragmented=True, frames_per_fragment=2
    )
    # metadata tier: swap the stsd fourcc to avc1
    meta = frag.replace(b"jpeg", b"avc1")
    d = decode_mp4(meta)
    assert d["n_frames"] == 4 and d["mean_value"] is None
    assert d["sample_rate"] == 10  # duration came from mehd

    # implicit tfhd base (r19): clearing default-base-is-moof leaves
    # the §8.8.7 legacy default — the first traf in each moof anchors
    # at the moof's first byte, so this single-track file extracts
    # identically
    at = frag.index(b"tfhd")
    t = bytearray(frag)
    t[at + 4: at + 8] = struct.pack(">I", 0)
    assert list(mp4_frames(bytes(t))) == frames

    # forged sample_count: 2^28 samples in a tiny trun box
    at = frag.index(b"trun")
    t = bytearray(frag)
    t[at + 8: at + 12] = struct.pack(">I", 1 << 28)
    with pytest.raises(ValueError, match="exceed|truncated|overrun"):
        list(mp4_frames(bytes(t)))


def test_mp4_edit_list_shifts_first_presented_sample():
    """r18 (VERDICT r17 next #4): a nonzero elst media_time makes a
    LATER sample the first presented one — decode_mp4's first-frame
    mean must follow it (v0 and v1 layouts, stts-mapped for plain
    files, trex-default-mapped for fragmented ones); leading empty
    edits (media_time -1) are presentation delay and skip nothing
    extra; multi-entry splice programs map through their FIRST real
    segment (r19); rate!=0/1 edits and a media_time beyond the track
    quarantine loudly."""
    import pytest

    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import decode_mp4

    for kw in (
        {"edit_media_time": 2},
        {"edit_media_time": 2, "elst_version": 1},
        {"edit_media_time": 2, "fragmented": True,
         "frames_per_fragment": 2},
        {"edit_list": [(1, -1), (4, 2)]},  # leading empty edit
    ):
        payload, frames = _mjpeg_mp4(n_frames=5, **kw)
        d = decode_mp4(payload)
        assert d["mean_value"] == decode_jpeg(frames[2])["mean_value"], kw
        assert d["n_frames"] == 5
    # media_time 0 is the common no-op edit list muxers write
    payload, frames = _mjpeg_mp4(n_frames=3, edit_media_time=0)
    assert decode_mp4(payload)["mean_value"] == \
        decode_jpeg(frames[0])["mean_value"]
    # splice program (two real segments): the FIRST segment decides
    # what plays first (r19, VERDICT r18 #6) — later segments change
    # what follows, not what opens
    for splice, first in (
        ([(2, 0), (3, 2)], 0),
        ([(2, 3), (3, 0)], 3),
        ([(1, -1), (2, 1), (2, 4)], 1),  # empty lead + splice
        ([(1, 2, 0), (4, 0)], 2),        # dwell (rate 0) opener
    ):
        payload, frames = _mjpeg_mp4(n_frames=5, edit_list=splice)
        assert decode_mp4(payload)["mean_value"] == \
            decode_jpeg(frames[first])["mean_value"], splice
    # a non-0/1 media_rate: quarantine (reverse/fast edits are out of
    # scope for the first-frame contract)
    payload, _ = _mjpeg_mp4(n_frames=5, edit_list=[(2, 1, 2), (3, 0)])
    with pytest.raises(ValueError, match="media_rate"):
        decode_mp4(payload)
    # only empty edits: nothing is ever presented — quarantine
    payload, _ = _mjpeg_mp4(n_frames=3, edit_list=[(1, -1), (2, -1)])
    with pytest.raises(ValueError, match="empty edits"):
        decode_mp4(payload)
    # media_time beyond the track's stts span: quarantine
    payload, _ = _mjpeg_mp4(n_frames=3, edit_media_time=99)
    with pytest.raises(ValueError, match="beyond"):
        decode_mp4(payload)


def test_quicktime_without_ftyp_detected_and_decoded():
    """r17 advice: classic QuickTime MJPEG .mov files — the main
    real-world carrier of the jpeg/mjpa/mjpb fourccs — often lack a
    leading ftyp box (they open with moov/mdat directly). detect_format
    must still route them to the MP4 tier; the box walk itself never
    needed ftyp. A text payload that merely spells a box name at
    offset 4 must NOT be misrouted (its size field is implausible)."""
    from quebic_spark.operators.multimodal import (
        decode_mp4,
        detect_format,
        mp4_frames,
    )

    payload, frames = _mjpeg_mp4(n_frames=3)
    assert payload[4:8] == b"ftyp"
    import struct

    # swap ftyp for an equal-size 'free' pad box (QuickTime's own
    # idiom) so every absolute stco offset stays valid — the file now
    # opens with a non-ftyp box exactly like a classic .mov
    ftyp_size = struct.unpack_from(">I", payload, 0)[0]
    qt = (
        struct.pack(">I4s", ftyp_size, b"free")
        + b"\x00" * (ftyp_size - 8)
        + payload[ftyp_size:]
    )
    assert qt[4:8] == b"free"
    assert detect_format(qt) == "mp4"
    assert list(mp4_frames(qt)) == frames
    assert decode_mp4(qt)["n_frames"] == 3
    # a text row that happens to contain 'mdat' at offset 4: the
    # leading 4 bytes as a big-endian size are implausible -> unknown
    assert detect_format(b"hugemdat is a word here") == "unknown"
    # a file OPENING with a size==1 largesize mdat (a real ftyp-less
    # .mov shape) must also route to the MP4 tier (r17): the leading
    # size field being the 64-bit marker is legal, not implausible
    big_first, _f2 = _mjpeg_mp4(n_frames=2, mdat_largesize=True)
    ftyp2 = struct.unpack_from(">I", big_first, 0)[0]
    head = big_first[ftyp2:]          # starts with size==1 mdat
    assert head[4:8] == b"mdat"
    assert struct.unpack_from(">I", head, 0)[0] == 1
    assert detect_format(head) == "mp4"


def test_mp4_uniform_stsz_huge_count_raises_before_allocating():
    """VERDICT r16 #2: the uniform-stsz branch materialized
    ``[uniform] * count`` with count an unchecked uint32 straight from
    the payload — a <1 KiB crafted container with count near 2^32
    attempted a ~34 GB list, OOM-killing the executor instead of
    raising the catchable ValueError the quarantine contract relies
    on. The extent bound (uniform * count <= len(payload)) must fire
    BEFORE any allocation."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import decode_mp4, mp4_frames

    payload, _frames = _mjpeg_mp4(n_frames=2)

    def with_uniform_stsz(uniform: int, count: int) -> bytes:
        at = payload.index(b"stsz")  # box type; fields follow
        out = bytearray(payload)
        out[at + 8: at + 16] = struct.pack(">II", uniform, count)
        return bytes(out)

    # worst case: count = 2^32-1 (the ~34 GB list)
    for uniform, count in [
        (8, 0xFFFFFFFF),      # 34 GB extent
        (1, 500_000_000),     # "merely large": 500 MB per row
        (1 << 20, 1 << 20),   # overflow-ish product, both plausible
    ]:
        crafted = with_uniform_stsz(uniform, count)
        assert len(crafted) < 4096  # tiny container, huge claim
        with pytest.raises(ValueError, match="stsz sample extent"):
            decode_mp4(crafted)
        with pytest.raises(ValueError, match="stsz sample extent"):
            list(mp4_frames(crafted))
    # a TRUE uniform table of the same shape still decodes: rewrite
    # count honestly (2 samples of the real first-frame size would
    # not match the mdat layout, so just assert the guard math lets
    # a consistent extent through the table parse)
    ok = with_uniform_stsz(1, len(payload))
    try:
        decode_mp4(ok)
    except ValueError as e:  # may fail later (bogus sample walk) ...
        assert "stsz sample extent" not in str(e)  # ... but not here


def test_mp4_uniform_stsz_huge_count_quarantines(spark):
    """The same crafted container through the Spark tier: decode_media
    must quarantine it as mp4-error-stub (never fail the job, never
    balloon executor memory)."""
    import struct

    from quebic_spark.operators.multimodal import decode_media

    payload, _frames = _mjpeg_mp4(n_frames=2)
    at = payload.index(b"stsz")
    out = bytearray(payload)
    out[at + 8: at + 16] = struct.pack(">II", 16, 0xFFFFFFFE)
    df = spark.createDataFrame(
        [(1, bytearray(out))], "doc_id long, payload binary"
    )
    rows = decode_media(df).collect()
    assert rows[0]["fmt"] == "mp4-error-stub"


def test_mp4_mjpeg_through_decode_media_and_frame_sample(spark):
    """End-to-end: decode_media reports a REAL mean for MJPEG MP4s,
    and video_frame_sample extracts+decodes sampled frames from the
    MP4 container (r16 — previously AVI-only); a corrupt mid-stream
    frame flags decode_ok=false without killing the task."""
    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import (
        decode_media,
        video_frame_sample,
    )

    payload, frames = _mjpeg_mp4(n_frames=6)
    # clobber frame 2's SOI marker in-place (same length, so the
    # sample table still lines up; entropy-byte flips can decode to
    # different pixels without erroring — a marker kill cannot)
    f2_at = payload.index(frames[2])
    corrupt = bytearray(payload)
    corrupt[f2_at] = 0x00
    corrupt[f2_at + 1] = 0x00
    corrupt = bytes(corrupt)

    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(corrupt))],
        "doc_id long, payload binary",
    )
    meta = {r["doc_id"]: r for r in decode_media(df).collect()}
    assert meta[1]["fmt"] == "mp4"
    assert meta[1]["mean_value"] == decode_jpeg(frames[0])["mean_value"]

    rows = video_frame_sample(df, every_nth=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r
    assert sorted(by_doc[1]) == [0, 2, 4]
    assert all(r["decode_ok"] for r in by_doc[1].values())
    assert by_doc[1][2]["width"] == 16
    # corrupted frame 2: its sampled row flags the failure, frames
    # 0/4 still decode
    assert by_doc[2][0]["decode_ok"] and by_doc[2][4]["decode_ok"]
    assert not by_doc[2][2]["decode_ok"]


def test_mp4_shuffled_stsc_fails_loud():
    """A spec-violating stsc whose runs are out of chunk order would
    silently extract misaligned bytes; the table parse must reject
    it (r16 self-review)."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import mp4_frames

    payload, _frames = _mjpeg_mp4(n_frames=5, frames_per_chunk=2)
    # locate the stsc box and swap its two (first_chunk, per, desc)
    # runs: (1,2,1),(3,1,1) -> (3,1,1),(1,2,1)
    at = payload.index(b"stsc") + 4 + 4 + 4  # fourcc+ver/flags+count
    e1 = payload[at:at + 12]
    e2 = payload[at + 12:at + 24]
    assert struct.unpack(">III", e1)[0] == 1
    shuffled = payload[:at] + e2 + e1 + payload[at + 24:]
    with pytest.raises(ValueError, match="ascending|start at chunk 1"):
        list(mp4_frames(shuffled))


def test_mp4_non_mjpeg_codec_stays_metadata_tier():
    """An inter-frame codec (avc1) keeps the honest metadata-only
    contract: mean_value NULL, frame extraction refuses."""
    import pytest

    from quebic_spark.operators.multimodal import decode_mp4, mp4_frames

    payload, _frames = _mjpeg_mp4()
    # patch the stsd sample-entry fourcc: 'jpeg' -> 'avc1' (the stsd
    # entry is the only place the codec name appears)
    at = payload.index(b"jpeg")
    h264 = payload[:at] + b"avc1" + payload[at + 4:]
    d = decode_mp4(h264)
    assert d["fmt"] == "mp4" and d["width"] == 16
    assert d["n_frames"] == 5
    assert d["mean_value"] is None
    with pytest.raises(ValueError, match="not an MJPEG track"):
        list(mp4_frames(h264))


def test_video_frame_sample_flags_midstream_corrupt_frame(spark):
    """A corrupt frame mid-stream must surface as a decode_ok=false
    row (never a dead task, never a silent truncation), while healthy
    frames around it still decode."""
    from quebic_spark.functions.jpeg import encode_jpeg
    from quebic_spark.operators.multimodal import (
        encode_avi_mjpeg,
        video_frame_sample,
    )
    import numpy as np

    good = [
        encode_jpeg(np.full((8, 8, 3), i * 30, dtype=np.uint8))
        for i in range(3)
    ]
    # frame 1: JPEG magic but garbage body — container-valid chunk,
    # pixel-invalid payload
    bad = b"\xff\xd8\xff" + b"\x55" * 40
    payload = encode_avi_mjpeg([good[0], bad, good[2]], 8, 8, fps=5)
    df = spark.createDataFrame(
        [(9, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = {
        r.frame_idx: r
        for r in video_frame_sample(df, every_nth=1).collect()
    }
    assert set(rows) == {0, 1, 2}
    assert rows[0].decode_ok and rows[2].decode_ok
    assert not rows[1].decode_ok
    assert rows[1].width is None and rows[1].mean_luma is None


def test_mean_value_consistent_across_real_decoders():
    """VERDICT r9 next #7: the SAME pixel array pushed through every
    real image decoder must report one consistent mean_value — exact
    for the lossless formats (BMP/PNG/GIF agree to the bit with the
    numpy truth), bounded drift for the lossy tier (JPEG 4:4:4 and
    4:2:0), and the AVI/MJPEG container must agree with its own frame
    codec exactly (same decoder, container adds nothing). Seeded
    palette-constrained images (<=12 colors) keep GIF lossless and the
    geometry set covers odd dims (4:2:0 chroma padding) and
    square/rect MCU grids."""
    import numpy as np

    from quebic_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from quebic_spark.operators.multimodal import (
        decode_avi,
        decode_bmp,
        decode_gif,
        decode_png,
        encode_avi_mjpeg,
        encode_bmp,
        encode_gif,
        encode_png,
    )

    rng = np.random.default_rng(1234)
    for w, h in [(8, 6), (17, 11), (16, 16)]:
        palette = rng.integers(0, 256, (12, 3))
        arr = palette[rng.integers(0, 12, (h, w))].astype(np.uint8)
        rows = [
            [tuple(int(c) for c in arr[y, x]) for x in range(w)]
            for y in range(h)
        ]
        true_mean = float(arr.mean())

        lossless = {
            "bmp": decode_bmp(encode_bmp(w, h, rows)),
            "png": decode_png(encode_png(w, h, rows)),
            "gif": decode_gif(encode_gif(w, h, rows)),
        }
        for name, d in lossless.items():
            assert d["fmt"] == name, (name, d["fmt"])
            assert d["mean_value"] == pytest.approx(
                true_mean, abs=1e-9
            ), (name, w, h, d["mean_value"], true_mean)

        for sub in ("444", "420"):
            dj = decode_jpeg(encode_jpeg(arr, subsample=sub))
            assert dj["fmt"] == "jpeg"
            assert abs(dj["mean_value"] - true_mean) < 5.0, (
                sub, w, h, dj["mean_value"], true_mean,
            )

        frame = encode_jpeg(arr)
        da = decode_avi(encode_avi_mjpeg([frame, frame], w, h))
        dj = decode_jpeg(frame)
        assert da["fmt"] == "avi"
        assert da["mean_value"] == dj["mean_value"], (
            "container must not change the frame codec's mean",
        )


def test_jpeg_single_component_sampling_factors_decode():
    """T.81 A.2: a single-component scan is NON-interleaved and
    traverses the component's own block grid regardless of its
    sampling factors — so a grayscale whose SOF declares h=v=2 (legal)
    carries byte-identical entropy data to the h=v=1 encoding of the
    same image. The old dispatcher sent single-component BASELINE
    scans down the MCU-padded path and desynced on exactly this input
    (r13 review); patching the SOF sampling byte must not change the
    decoded pixels. Undefined quant/huffman tables must surface as
    the documented ValueError, not KeyError."""
    import numpy as np

    from quebic_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    # 24x24: ceil(24/16)*2 = 4 MCU-padded blocks/dim vs the true
    # ceil(24/8) = 3 — the desync case
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, grayscale=True))
    meta1, px1 = decode_jpeg_pixels(bytes(data))
    assert (meta1["width"], meta1["height"]) == (24, 24)

    # patch SOF0's sampling byte (marker FFC0: len 2, precision 1,
    # h 2, w 2, ncomps 1, comp id 1 -> sampling factors byte)
    sof = bytes(data).find(b"\xff\xc0")
    assert sof > 0
    samp = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert data[samp] == 0x11
    data[samp] = 0x22
    meta2, px2 = decode_jpeg_pixels(bytes(data))
    assert (meta2["width"], meta2["height"]) == (24, 24)
    assert np.array_equal(px1, px2)

    # quarantine contract: stripped DHT/DQT segments raise ValueError
    import pytest as _pytest

    def strip_segments(buf: bytes, marker: int) -> bytes:
        out = bytearray()
        i = 0
        while i < len(buf):
            if buf[i] == 0xFF and i + 1 < len(buf) and buf[i + 1] == marker:
                seglen = int.from_bytes(buf[i + 2:i + 4], "big")
                i += 2 + seglen
                continue
            out.append(buf[i])
            i += 1
        return bytes(out)

    full = bytes(encode_jpeg(img, grayscale=True))
    with _pytest.raises(ValueError, match="huffman table"):
        decode_jpeg_pixels(strip_segments(full, 0xC4))
    with _pytest.raises(ValueError, match="quantization table"):
        decode_jpeg_pixels(strip_segments(full, 0xDB))


def test_jpeg_truncated_segments_raise_valueerror():
    """r15 review: truncated SOF/SOS/DHT bodies escaped the quarantine
    contract as struct.error/IndexError from the byte parsing."""
    import pytest

    from quebic_spark.functions.jpeg import decode_jpeg

    cases = [
        b"\xff\xd8\xff\xc0\x00\x04\x08",          # SOF0 body cut short
        b"\xff\xd8\xff\xda\x00\x02",              # SOS with empty body
        b"\xff\xd8\xff\xc4\x00\x04\x00\x02",      # DHT counts > bytes
    ]
    for payload in cases:
        with pytest.raises(ValueError):
            decode_jpeg(payload)


def test_null_payloads_quarantine_not_crash(spark):
    """r15 review: frame_sample/extract_features/_fake_decode raised
    TypeError on a NULL binary payload, killing the task — the
    siblings (decode_media, video_frame_sample) already coerce."""
    from pyspark.sql import types as T

    from quebic_spark.operators.multimodal import (
        DECODE_SCHEMA,
        _fake_decode,
        extract_features,
        frame_sample,
    )

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_frames", T.IntegerType()),
    ])
    df = spark.createDataFrame(
        [(1, b"abc" * 100, 8), (2, None, None)], schema
    )
    frames = frame_sample(df).collect()
    assert {r["doc_id"] for r in frames} == {1}  # null row: 0 frames
    feats = {
        r["doc_id"]: r["features"]
        for r in extract_features(df.select("doc_id", "payload")).collect()
    }
    assert len(feats) == 2 and sum(feats[2]) == 0.0
    decoded = {
        r["doc_id"]: r["payload_bytes"]
        for r in df.select("doc_id", "payload")
        .mapInPandas(_fake_decode, DECODE_SCHEMA).collect()
    }
    assert decoded[2] == 0


def test_resize_dims_zero_dimensions_stay_null(spark):
    """r15 review: max_w / 0.0 = +Infinity made least() pick scale
    1.0 and fabricate a valid-looking 1x1 from a 0-pixel image."""
    from quebic_spark.operators.multimodal import resize_dims

    df = spark.createDataFrame(
        [(1, 0, 10), (2, 10, 0), (3, 100, 50)],
        "doc_id long, width int, height int",
    )
    out = {
        r["doc_id"]: (r["out_width"], r["out_height"])
        for r in resize_dims(df, 32, 32).collect()
    }
    assert out[1] == (None, None) and out[2] == (None, None)
    assert out[3] == (32, 16)


def test_mp4_fragment_multi_trun_and_explicit_base_shapes():
    """Two hand-built fragment shapes the encoder never writes but
    real muxers do (r18): (a) one traf carrying TWO trun runs where
    the second omits data_offset and continues from the previous
    run's end; (b) an explicit tfhd base_data_offset whose first trun
    omits data_offset entirely (samples start AT the base — the older
    smooth-streaming layout). Both must extract the exact frames of
    the equivalent unfragmented file."""
    import struct

    from quebic_spark.operators.multimodal import (
        _TFHD_BASE_DATA_OFFSET,
        _TRUN_DATA_OFFSET,
        _TRUN_SAMPLE_SIZE,
        decode_mp4,
        mp4_frames,
    )

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", len(body) + 8, btype) + body

    template, frames = _mjpeg_mp4(
        n_frames=4, fragmented=True, frames_per_fragment=4
    )
    prefix = template[: template.index(b"moof") - 4]  # ftyp + moov

    # (a) default-base-is-moof, two truns: first two samples with a
    # data_offset, last two continuing the cursor
    mfhd = box(b"mfhd", b"\x00" * 4 + struct.pack(">I", 1))
    tfhd = box(b"tfhd", struct.pack(">II", 0x020000, 1))
    trun2 = box(
        b"trun",
        struct.pack(">II", _TRUN_SAMPLE_SIZE, 2)
        + struct.pack(">II", len(frames[2]), len(frames[3])),
    )
    trun1_size = 8 + 4 + 4 + 4 + 8
    moof_size = 8 + len(mfhd) + 8 + len(tfhd) + trun1_size + len(trun2)
    trun1 = box(
        b"trun",
        struct.pack(
            ">II", _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE, 2
        )
        + struct.pack(">i", moof_size + 8)
        + struct.pack(">II", len(frames[0]), len(frames[1])),
    )
    traf = box(b"traf", tfhd + trun1 + trun2)
    moof = box(b"moof", mfhd + traf)
    assert len(moof) == moof_size
    payload = prefix + moof + box(b"mdat", b"".join(frames))
    assert list(mp4_frames(payload)) == frames
    assert decode_mp4(payload)["n_frames"] == 4

    # (b) explicit 64-bit base_data_offset, NO trun data_offset:
    # samples start at the base (absolute mdat body position)
    mdat_body_at = len(prefix)  # moof first, so compute after sizing
    tfhd_b = box(
        b"tfhd",
        struct.pack(">I", _TFHD_BASE_DATA_OFFSET)
        + struct.pack(">I", 1)
        + struct.pack(">Q", 0),  # patched below
    )
    trun_b = box(
        b"trun",
        struct.pack(">II", _TRUN_SAMPLE_SIZE, 4)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    traf_b = box(b"traf", tfhd_b + trun_b)
    moof_b = box(b"moof", mfhd + traf_b)
    mdat_body_at = len(prefix) + len(moof_b) + 8
    tfhd_b = box(
        b"tfhd",
        struct.pack(">I", _TFHD_BASE_DATA_OFFSET)
        + struct.pack(">I", 1)
        + struct.pack(">Q", mdat_body_at),
    )
    traf_b = box(b"traf", tfhd_b + trun_b)
    moof_b = box(b"moof", mfhd + traf_b)
    payload_b = prefix + moof_b + box(b"mdat", b"".join(frames))
    assert list(mp4_frames(payload_b)) == frames
    assert decode_mp4(payload_b)["n_frames"] == 4


def test_fragmented_mp4_through_decode_media_and_frame_sample(spark):
    """End-to-end Spark tier over the fragmented container (r18):
    decode_media reports the same real metadata/mean for a DASH/CMAF
    file as for its unfragmented twin, and video_frame_sample
    extracts+decodes sampled frames across fragment boundaries."""
    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import (
        decode_media,
        video_frame_sample,
    )

    plain, frames = _mjpeg_mp4(n_frames=6)
    frag, frames2 = _mjpeg_mp4(
        n_frames=6, fragmented=True, frames_per_fragment=2
    )
    assert frames2 == frames
    df = spark.createDataFrame(
        [(1, bytearray(plain)), (2, bytearray(frag))],
        "doc_id long, payload binary",
    )
    meta = {r["doc_id"]: r.asDict() for r in decode_media(df).collect()}
    frag_row, plain_row = meta.pop(2), meta.pop(1)
    # payload_bytes legitimately differs (per-fragment moof overhead)
    for r in (frag_row, plain_row):
        r.pop("payload_bytes", None)
    assert frag_row == {**plain_row, "doc_id": 2}
    assert frag_row["mean_value"] == decode_jpeg(frames[0])["mean_value"]

    rows = video_frame_sample(df, every_nth=3).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r
    assert sorted(by_doc[2]) == sorted(by_doc[1]) == [0, 3]
    for idx, r in by_doc[2].items():
        assert r["decode_ok"]
        assert r["mean_luma"] == by_doc[1][idx]["mean_luma"]


def test_fragmented_frame_timestamps_and_segment_routing():
    """r18 polish: frame timestamps stay real for fragmented files
    (period from trun counts + mehd duration, not the empty stsz),
    and standalone DASH/CMAF media segments (styp or bare moof
    leading, no moov) route to the MP4 tier where they quarantine
    honestly instead of reading as 'unknown'."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import (
        _mp4_frame_period_us,
        decode_mp4,
        detect_format,
    )

    plain, frames = _mjpeg_mp4(n_frames=4)
    frag, _ = _mjpeg_mp4(
        n_frames=4, fragmented=True, frames_per_fragment=2
    )
    assert _mp4_frame_period_us(frag) == _mp4_frame_period_us(plain)
    assert _mp4_frame_period_us(frag) == 100_000  # 10 fps fixture

    seg = (
        struct.pack(">I4s", 16, b"styp") + b"cmfc\x00\x00\x00\x00"
        + frag[frag.index(b"moof") - 4:]
    )
    assert detect_format(seg) == "mp4"
    with pytest.raises(ValueError, match="moov"):
        decode_mp4(seg)
    bare = frag[frag.index(b"moof") - 4:]
    assert detect_format(bare) == "mp4"


def test_mp4_hybrid_stbl_plus_fragments_elst_maps_into_fragments():
    """ADVICE r18: a hybrid file (non-empty stbl AND moof fragments —
    mp4_frames yields stbl samples then fragment samples) can legally
    put the elst media_time inside the fragment portion; the mapper
    must extend the stts walk with the trex default duration over the
    fragment sample count instead of quarantining a decodable file."""
    import struct

    import pytest

    from quebic_spark.functions.jpeg import decode_jpeg
    from quebic_spark.operators.multimodal import (
        _mp4_find,
        decode_mp4,
        mp4_frames,
    )

    def hybrid(**plain_kwargs):
        # graft a fragmented file's mvex (trex defaults) into a plain
        # file's moov and append its moof+mdat tail: stco offsets stay
        # valid (mdat precedes moov; the moof's trun is moof-relative)
        plain, fa = _mjpeg_mp4(n_frames=3, **plain_kwargs)
        frag, fb = _mjpeg_mp4(n_frames=2, fragmented=True)
        fm = _mp4_find(frag, 0, len(frag), b"moov", b"mvex")
        mvex = frag[fm[0] - 8:fm[1]]
        moof = _mp4_find(frag, 0, len(frag), b"moof")
        tail = frag[moof[0] - 8:]
        pm = _mp4_find(plain, 0, len(plain), b"moov")
        moov_body = plain[pm[0]:pm[1]] + mvex
        new_moov = struct.pack(
            ">I4s", 8 + len(moov_body), b"moov"
        ) + moov_body
        return plain[:pm[0] - 8] + new_moov + tail, fa + fb

    # sanity: both sample tiers extract, in ISO order
    payload, frames = hybrid()
    assert list(mp4_frames(payload)) == frames
    assert decode_mp4(payload)["n_frames"] == 5

    # media_time 4 lands past the 3-sample stts span, inside the
    # fragment portion (trex default duration 1 tick/sample): the
    # first presented frame is fragment sample 1 = overall index 4
    payload, frames = hybrid(edit_media_time=4)
    d = decode_mp4(payload)
    assert d["mean_value"] == decode_jpeg(frames[4])["mean_value"]

    # beyond even the fragment-extended timeline: still quarantines
    payload, _ = hybrid(edit_media_time=99)
    with pytest.raises(ValueError, match="beyond"):
        decode_mp4(payload)


def test_mp4_truncated_boxes_raise_valueerror_not_struct_error():
    """ADVICE r18: tfhd/trun headers were unpacked BEFORE their bounds
    checks and tkhd/stsz read box bodies without length guards, so a
    truncated final box raised struct.error or IndexError instead of
    the ValueError the quarantine contract documents (decode_media's
    broad except contained it, but _mp4_frame_period_us-style callers
    catching only ValueError would crash the task)."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import (
        _mp4_fragment_samples,
        _mp4_stsz_count,
        _mp4_tkhd_track_id,
    )

    def box(name, body):
        return struct.pack(">I4s", 8 + len(body), name) + body

    # tkhd with an EMPTY body (version byte itself missing)
    trak = box(b"trak", box(b"tkhd", b""))
    with pytest.raises(ValueError, match="truncated tkhd"):
        _mp4_tkhd_track_id(trak, 8, len(trak))

    # stsz cut off before sample_count
    stbl = box(b"stbl", box(b"stsz", b"\x00" * 6))
    trak = box(b"trak", box(b"mdia", box(b"minf", stbl)))
    with pytest.raises(ValueError, match="truncated stsz"):
        _mp4_stsz_count(trak, 8, len(trak))

    # tfhd with a 2-byte body: version/flags word itself truncated
    moof = box(b"moof", box(b"traf", box(b"tfhd", b"\x00\x00")))
    with pytest.raises(ValueError, match="truncated tfhd"):
        _mp4_fragment_samples(moof, 1)

    # trun with a 2-byte body behind a well-formed tfhd
    # version 0, flags 0x020000 (default-base-is-moof), track_ID 1
    tfhd = box(b"tfhd", b"\x00\x02\x00\x00" + struct.pack(">I", 1))
    moof = box(b"moof", box(b"traf", tfhd + box(b"trun", b"\x00\x00")))
    with pytest.raises(ValueError, match="truncated trun"):
        _mp4_fragment_samples(moof, 1)


def test_mp4_implicit_base_multi_traf_chain():
    """r19: the pre-CMAF implicit base chain (ISO 14496-12 §8.8.7) —
    a moof whose SECOND traf carries neither base_data_offset nor
    default-base-is-moof anchors at the end of the PRECEDING traf's
    data. The preceding traf belongs to another track, so foreign
    extents are load-bearing exactly here; when that extent cannot be
    resolved the dependent traf quarantines; and when no traf needs
    the chain, a malformed foreign traf stays ignored."""
    import struct

    import pytest

    from quebic_spark.operators.multimodal import (
        _TFHD_BASE_DATA_OFFSET,
        _TRUN_DATA_OFFSET,
        _TRUN_SAMPLE_SIZE,
        decode_mp4,
        mp4_frames,
    )

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I4s", len(body) + 8, btype) + body

    template, frames = _mjpeg_mp4(
        n_frames=4, fragmented=True, frames_per_fragment=4
    )
    prefix = template[: template.index(b"moof") - 4]  # ftyp + moov
    track2_data = b"\xAB" * 37  # the foreign track's payload bytes

    mfhd = box(b"mfhd", b"\x00" * 4 + struct.pack(">I", 1))
    # traf#1: track 2, IMPLICIT base (first traf -> moof start), trun
    # with a data_offset into the mdat body and explicit sizes — its
    # data extent ends where track 1's frames begin
    trun1 = box(
        b"trun",
        struct.pack(">II", _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE, 1)
        + struct.pack(">i", 0)  # patched once moof_size is known
        + struct.pack(">I", len(track2_data)),
    )
    tfhd1 = box(b"tfhd", struct.pack(">II", 0, 2))
    # traf#2: track 1, IMPLICIT base (= end of traf#1 data), trun
    # with NO data_offset — samples start AT the chained base
    tfhd2 = box(b"tfhd", struct.pack(">II", 0, 1))
    trun2 = box(
        b"trun",
        struct.pack(">II", _TRUN_SAMPLE_SIZE, 4)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )

    def build(t1):
        traf1 = box(b"traf", tfhd1 + t1)
        traf2 = box(b"traf", tfhd2 + trun2)
        moof = box(b"moof", mfhd + traf1 + traf2)
        return prefix + moof + box(
            b"mdat", track2_data + b"".join(frames)
        )

    # size the moof once, then patch trun1's data_offset to the mdat
    # body start (moof-relative via the implicit first-traf anchor)
    moof_size = (
        len(build(trun1)) - len(prefix)
        - (8 + len(track2_data) + len(b"".join(frames)))
    )
    trun1 = box(
        b"trun",
        struct.pack(">II", _TRUN_DATA_OFFSET | _TRUN_SAMPLE_SIZE, 1)
        + struct.pack(">i", moof_size + 8)
        + struct.pack(">I", len(track2_data)),
    )
    payload = build(trun1)
    assert list(mp4_frames(payload)) == frames
    assert decode_mp4(payload)["n_frames"] == 4

    # unresolvable predecessor: traf#1's trun has neither sizes nor a
    # trex default for track 2 -> traf#2's implicit base quarantines
    trun1_nosize = box(
        b"trun",
        struct.pack(">II", _TRUN_DATA_OFFSET, 1)
        + struct.pack(">i", moof_size + 8),
    )
    with pytest.raises(ValueError, match="could not be resolved"):
        list(mp4_frames(build(trun1_nosize)))

    # no traf needs the chain: make traf#2 explicit-base — the same
    # size-less foreign traf is then skipped, not load-bearing.
    # Frames are the file's last bytes, so the absolute base falls
    # out of the built length; size tfhd2 with a placeholder base
    # FIRST (the explicit field grows the box by 8) then patch.
    tfhd2_explicit = lambda base: box(  # noqa: E731
        b"tfhd",
        struct.pack(">I", _TFHD_BASE_DATA_OFFSET)
        + struct.pack(">I", 1) + struct.pack(">Q", base),
    )
    tfhd2 = tfhd2_explicit(0)
    base_abs = len(build(trun1_nosize)) - len(b"".join(frames))
    tfhd2 = tfhd2_explicit(base_abs)
    assert list(mp4_frames(build(trun1_nosize))) == frames
