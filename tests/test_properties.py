"""Property-based tests (hypothesis): serde round-trips, tensor
invariants, schema validation — the reference's seeded-random testing
discipline (SURVEY §5) upgraded to generated properties.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from quebic_spark import (
    BINARY,
    GZIP,
    INTEGER,
    PLAIN,
    REAL,
    Schema,
    TENSOR,
    TEXT,
    Tensor,
)
from quebic_spark.errors import IncompatibleSchemaException
from quebic_spark.serde import deserialize_record, serialize_record

MIXED = Schema(INTEGER, REAL, TEXT, BINARY)

finite_doubles = st.floats(allow_nan=False, allow_infinity=False)
int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=200, deadline=None)
@given(
    i=int64,
    r=st.floats(allow_infinity=True, allow_nan=True),
    t=st.text(max_size=300),
    b=st.binary(max_size=300),
    codec=st.sampled_from([PLAIN, GZIP]),
)
def test_mixed_record_roundtrip(i, r, t, b, codec):
    rec = deserialize_record(
        MIXED, serialize_record(MIXED, [i, r, t, b], codec), codec
    )
    assert rec[0] == i
    assert (math.isnan(rec[1]) and math.isnan(r)) or rec[1] == r
    assert rec[2] == t and rec[3] == b


@settings(max_examples=100, deadline=None)
@given(
    shape=st.lists(st.integers(min_value=1, max_value=5), min_size=1,
                   max_size=3),
    data=st.data(),
)
def test_tensor_roundtrip(shape, data):
    n = math.prod(shape)
    values = data.draw(
        st.lists(finite_doubles, min_size=n, max_size=n)
    )
    s = Schema(TENSOR)
    tensor = Tensor(shape, values)
    got_shape, got_values = deserialize_record(
        s, serialize_record(s, [tensor])
    )[0]
    assert got_shape == shape and got_values == values


@settings(max_examples=100, deadline=None)
@given(
    shape=st.lists(st.integers(min_value=0, max_value=6), min_size=0,
                   max_size=3),
    n_values=st.integers(min_value=0, max_value=300),
)
def test_tensor_invariant_never_silently_wrong(shape, n_values):
    """Any (shape, values) pair either satisfies prod(shape)==len or
    raises — never constructs an inconsistent tensor."""
    values = [0.0] * n_values
    # empty shape is never valid (prod([]) == 1 can't equal len 0, and
    # the explicit reference check rejects len 1) — Struct.scala:60-62
    expected = math.prod(shape)
    if expected == n_values and shape:
        t = Tensor(shape, values)
        assert math.prod(t.shape) == len(t.values)
    else:
        try:
            Tensor(shape, values)
            raise AssertionError("should have raised")
        except ValueError:
            pass


@settings(max_examples=100, deadline=None)
@given(
    nested=st.recursive(
        st.floats(allow_nan=False, allow_infinity=False),
        lambda children: st.lists(children, min_size=1, max_size=4),
        max_leaves=30,
    )
)
def test_from_tensor_accepts_iff_regular(nested):
    """from_tensor either builds a tensor whose nesting round-trips, or
    rejects irregular input — for any recursively generated nest."""
    try:
        t = Tensor.from_tensor(nested)
    except ValueError:
        return  # irregular nest rejected: fine
    if isinstance(nested, list):
        assert t.to_nested() == nested
    else:
        assert t.values == [float(nested)]


@settings(max_examples=100, deadline=None)
@given(
    values=st.lists(
        st.one_of(int64, st.text(max_size=20)), max_size=4
    )
)
def test_validation_never_accepts_wrong_arity_or_type(values):
    s = Schema(INTEGER, TEXT)
    ok = (
        len(values) == 2
        and isinstance(values[0], int)
        and not isinstance(values[0], bool)
        and isinstance(values[1], str)
    )
    if ok:
        assert s.validate_record(values) == tuple(values)
    else:
        try:
            s.validate_record(values)
            raise AssertionError("should have raised")
        except IncompatibleSchemaException:
            pass


# ---------------------------------------------------------------------------
# Generated-input properties for the r5 dedup additions (Spark-backed,
# so examples are few but adversarially shaped by hypothesis).
# ---------------------------------------------------------------------------

keys_strat = st.lists(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126),
        min_size=1, max_size=40,
    ),
    min_size=1, max_size=60, unique=True,
)


@settings(max_examples=10, deadline=None)
@given(member=keys_strat, probe=keys_strat)
def test_bloom_never_misses_members(spark, member, probe):
    from pyspark.sql import functions as F

    from quebic_spark.operators.dedup import (
        bloom_probe_udf,
        build_bloom,
    )

    mdf = spark.createDataFrame([(k,) for k in member], "k string")
    bloom = build_bloom(mdf, "k")
    probe_udf = bloom_probe_udf(bloom)
    hits = {
        r["k"]: r["h"]
        for r in spark.createDataFrame(
            [(k,) for k in set(member) | set(probe)], "k string"
        ).select("k", probe_udf(F.md5("k")).alias("h")).collect()
    }
    # structural guarantee: every inserted key hits, whatever the keys
    assert all(hits[k] for k in member)


@settings(max_examples=10, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),   # doc_id
            st.integers(min_value=0, max_value=5),    # group
            st.floats(min_value=0, max_value=1, allow_nan=False),
        ),
        min_size=1, max_size=40,
        unique_by=lambda t: t[0],
    )
)
def test_keep_best_matches_reference_selection(spark, rows):
    from quebic_spark.operators.dedup import keep_best

    df = spark.createDataFrame(
        [(i, f"g{g}", s) for i, g, s in rows],
        "doc_id long, content_key string, quality_score double",
    )
    got = {
        r["content_key"]: (r["doc_id"], r["n_copies"])
        for r in keep_best(
            df, "content_key", "quality_score"
        ).collect()
    }
    want = {}
    for i, g, s in rows:
        key = f"g{g}"
        cur = want.get(key)
        # max score, ties -> lowest doc_id
        if cur is None or (-s, i) < (-cur[1], cur[0]):
            want[key] = (i, s)
    sizes = {}
    for _, g, _ in rows:
        sizes[f"g{g}"] = sizes.get(f"g{g}", 0) + 1
    assert got == {
        k: (v[0], sizes[k]) for k, v in want.items()
    }


@given(
    old=st.integers(min_value=1, max_value=10**18),
    new_delta=st.integers(min_value=1, max_value=10**6),
    mask=st.binary(min_size=8, max_size=8),
)
@settings(max_examples=200, deadline=None)
def test_ctrl_pointer_tear_never_regresses_silently(old, new_delta, mask):
    """r14 crc contract: for ANY byte-level mix of two consecutive
    pointer payloads (the power-loss torn-sector model — constant
    length, so bytes mix at identical positions), the validator either
    rejects the mix (-> _repair_next_seq, which is >= committed state)
    or reads exactly the old or new value. No third value — in
    particular no regressed one — ever parses clean (2^-32 accidental
    crc matches aside, which 200 examples cannot hit)."""
    import json
    import zlib

    from quebic_spark.queue.storage import ctrl_payload

    new = old + new_delta
    po = json.dumps(ctrl_payload(old)).encode()
    pn = json.dumps(ctrl_payload(new)).encode()
    assert len(po) == len(pn)  # the constant-length invariant itself
    # expand the 64-bit mask cyclically over the payload: bit i says
    # byte i persisted from the NEW write
    bits = [(mask[i // 8 % 8] >> (i % 8)) & 1 for i in range(len(po))]
    mixed = bytes(pn[i] if bits[i] else po[i] for i in range(len(po)))

    # replicate next_seq()'s validation on the mixed payload
    try:
        obj = json.loads(mixed)
        seq_str = obj["next_seq"]
        crc = obj.get("crc")
        if crc is not None and int(crc) != zlib.crc32(
            str(seq_str).encode("utf-8")
        ):
            raise ValueError("checksum mismatch")
        value = int(seq_str)
    except (ValueError, KeyError, TypeError):
        return  # rejected -> repair path; safe by construction
    assert value in (old, new), (
        f"tear of {old}->{new} parsed clean as third value {value}"
    )


@given(
    frames=st.lists(
        st.binary(min_size=1, max_size=64), min_size=1, max_size=12
    ),
    per_chunk=st.one_of(st.none(), st.integers(1, 5)),
    co64=st.booleans(),
    mvhd_v1=st.booleans(),
    largesize=st.booleans(),
    fragmented=st.booleans(),
)
@settings(max_examples=80, deadline=None)
def test_mp4_sample_table_walk_roundtrips_any_chunking(
    frames, per_chunk, co64, mvhd_v1, largesize, fragmented
):
    """r16 MJPEG-MP4 tier (r17: over every 32/64-bit field variant;
    r18: and the fragmented moof/trun layout): for ANY frame sizes,
    ANY chunking (one chunk, uniform chunks, trailing partial chunk
    with its own stsc run — or the same grouping as fragments), and
    any of the stco/co64 x mvhd v0/v1 x plain/largesize-mdat x
    plain/fragmented encodings, the sample walk must return exactly
    the encoded frame byte sequence — the invariant the first-frame
    mean and video_frame_sample both stand on. mp4_frames never
    decodes, so arbitrary bytes exercise the table walk directly."""
    from quebic_spark.operators.multimodal import (
        encode_mp4_mjpeg,
        mp4_frames,
    )

    payload = encode_mp4_mjpeg(
        frames, 4, 4, frames_per_chunk=per_chunk,
        chunk_offset_box="co64" if co64 else "stco",
        mvhd_version=1 if mvhd_v1 else 0,
        mdat_largesize=largesize,
        fragmented=fragmented,
        frames_per_fragment=per_chunk,
    )
    assert list(mp4_frames(payload)) == frames
