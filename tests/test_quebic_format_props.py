"""Property-based coverage for the reference on-disk format connector:
ANY schema/record/file the writer can produce must round-trip through
the reader bit-exactly, in both chain layouts, under both codecs —
the generative extension of SchemaTest.scala's fixed boundary cases."""

from __future__ import annotations

import math
import struct

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from quebic_spark.codec import GZIP, PLAIN
from quebic_spark.schema import (
    BINARY,
    INTEGER,
    REAL,
    TENSOR,
    TEXT,
    Schema,
)
from quebic_spark.sources import quebic_format as Q

# 64-bit signed ints; floats without NaN (NaN != NaN breaks equality —
# the fixed-case tests cover NaN via the serde suite's policy)
_ints = st.integers(min_value=-(2**63), max_value=2**63 - 1)
_reals = st.floats(allow_nan=False, width=64)
_texts = st.text(max_size=40)
_bins = st.binary(max_size=40)
_tensors = st.lists(
    st.floats(allow_nan=False, width=64), min_size=1, max_size=6
).map(lambda vs: ([len(vs)], vs))

_TYPE_STRATS = {
    INTEGER: _ints,
    REAL: _reals,
    TEXT: _texts,
    BINARY: _bins,
    TENSOR: _tensors,
}


@st.composite
def schema_and_rows(draw):
    types = draw(
        st.lists(
            st.sampled_from([INTEGER, REAL, TEXT, BINARY, TENSOR]),
            min_size=1,
            max_size=6,
        )
    )
    rows = draw(
        st.lists(
            st.tuples(*[_TYPE_STRATS[t] for t in types]).map(list),
            min_size=0,
            max_size=8,
        )
    )
    return Schema(*types), rows


def _eq(a, b) -> bool:
    if isinstance(a, tuple) and not isinstance(b, (int, float, str, bytes)):
        # TENSOR comes back as (shape, values)
        return list(a[0]) == list(b[0]) and all(
            x == y or (math.isnan(x) and math.isnan(y))
            for x, y in zip(list(a[1]), list(b[1]))
        ) and len(a[1]) == len(b[1])
    return a == b


@given(_ints)
def test_varint_round_trips_any_int64(v):
    buf = Q.write_varint(v)
    got, off = Q.read_varint(buf, 0)
    assert got == v and off == len(buf)


@given(sr=schema_and_rows(), codec=st.sampled_from([PLAIN, GZIP]),
       kind=st.sampled_from(["queue", "journal"]))
@settings(max_examples=60, deadline=None)
def test_any_file_round_trips(sr, codec, kind):
    schema, rows = sr
    data = Q.write_journaled_bytes(schema, rows, kind=kind, codec=codec)
    got_schema, entries = Q.parse_chain(data)
    assert [t.id for t in got_schema.types] == [
        t.id for t in schema.types
    ]
    order = entries if kind == "queue" else list(reversed(entries))
    assert len(order) == len(rows)
    for row, e in zip(rows, order):
        assert all(_eq(g, w) for g, w in zip(e["values"], row)), (
            row, e["values"],
        )
    # inspect's triple agrees with the entries it summarizes
    n, total, mx = Q.inspect_quebic_file(data)
    assert n == len(rows)
    assert total == sum(len(e["payload"]) for e in entries)


@given(sr=schema_and_rows())
@settings(max_examples=40, deadline=None)
def test_header_items_and_latest_consistency(sr):
    schema, rows = sr
    data = Q.write_journaled_bytes(schema, rows, kind="queue")
    _, _, items, last = Q.parse_header(data)
    assert items == len(rows)
    assert (last == -1) == (len(rows) == 0)
    if rows:
        # queue layout: deepest entry is the NEWEST row (migrateTo
        # writes FILO), which is what Publisher.latest returns
        latest = Q.parse_latest(data)
        assert all(_eq(g, w) for g, w in zip(latest, rows[-1]))
    else:
        assert Q.parse_latest(data) is None


@given(
    sr=schema_and_rows(),
    flip=st.integers(min_value=0, max_value=10_000),
    value=st.integers(min_value=0, max_value=255),
    codec=st.sampled_from([PLAIN, GZIP]),
)
@settings(max_examples=120, deadline=None)
def test_single_byte_corruption_never_hangs_or_misparses_silently(
    sr, flip, value, codec
):
    """Flip one byte anywhere: the parser must either still produce a
    structurally valid result or raise FormatException — the ONE
    domain error the read contract promises (the reference wraps all
    deserialization failures the same way, consume():203-210). Never
    a hang (cycle guard), never an OS-level leak (BadGzipFile,
    UnicodeDecodeError — r10 deep-sweep catches), never IndexError."""
    from quebic_spark.errors import FormatException

    schema, rows = sr
    data = bytearray(Q.write_journaled_bytes(schema, rows, codec=codec))
    if not data:
        return
    pos = flip % len(data)
    data[pos] = value
    try:
        Q.parse_chain(bytes(data))
    except FormatException:
        pass


@given(sr=schema_and_rows(), codec=st.sampled_from([PLAIN, GZIP]),
       kind=st.sampled_from(["queue", "journal"]))
@settings(max_examples=40, deadline=None)
def test_stream_writer_bit_identical_to_in_memory(sr, codec, kind):
    """stream_journaled_entries is the layout core (the in-memory
    writer wraps it; the sharded export streams through it): for ANY
    schema/rows/codec/kind, streaming the physical order must produce
    byte-identical output to write_journaled_bytes. (Real-file
    streaming is pinned by the fixed-case and gated big-file tests;
    BytesIO here keeps hypothesis fixture-free.)"""
    import io

    schema, rows = sr
    want = Q.write_journaled_bytes(schema, rows, kind=kind, codec=codec)
    physical = list(reversed(rows)) if kind == "queue" else list(rows)
    buf = io.BytesIO()
    n = Q.stream_journaled_entries(buf, schema, iter(physical),
                                   codec=codec)
    assert n == len(rows)
    assert buf.getvalue() == want
