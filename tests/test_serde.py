"""Record serde + typed-queue converter tests (SchemaTest/StructTest
round-trip parity, SURVEY §5; Value2Struct contract, Queue.scala:301-307).
"""

import math
import random

import pytest

from quebic_spark import (
    BINARY,
    GZIP,
    INTEGER,
    PLAIN,
    Queue,
    REAL,
    Schema,
    TENSOR,
    TEXT,
    Tensor,
)
from quebic_spark.errors import FormatException, IncompatibleSchemaException
from quebic_spark.queue.typed import Converter
from quebic_spark.serde import deserialize_record, serialize_record

MIXED = Schema(INTEGER, REAL, TEXT, BINARY)

# varint boundary set from SchemaTest.scala:51-62 — the reference's own
# integer edge cases, still worth round-tripping even though our wire
# format is fixed-width
BOUNDARY_INTS = [
    0, 252, 253, 254, 255, 256, 0xFFFF, 0x10000, 0xFFFFFFFF, 0x100000000,
    2**63 - 1,
]
BOUNDARY_INTS += [-v for v in BOUNDARY_INTS[1:-1]] + [-(2**63)]


@pytest.mark.parametrize("codec", [PLAIN, GZIP])
def test_mixed_roundtrip(codec):
    rnd = random.Random(55)
    rec = [
        rnd.randint(-(2**62), 2**62),
        rnd.random() * 1e6,
        "".join(chr(rnd.randint(0x20, 0x30A0)) for _ in range(1024)),
        bytes(rnd.getrandbits(8) for _ in range(1024)),
    ]
    data = serialize_record(MIXED, rec, codec)
    back = deserialize_record(MIXED, data, codec)
    assert back[0] == rec[0] and back[1] == rec[1]
    assert back[2] == rec[2] and back[3] == rec[3]


@pytest.mark.parametrize("v", BOUNDARY_INTS)
def test_integer_boundaries(v):
    s = Schema(INTEGER)
    assert deserialize_record(s, serialize_record(s, [v])) == (v,)


def test_tensor_roundtrip_with_nan():
    s = Schema(TENSOR)
    t = Tensor([2, 2], [1.5, float("nan"), -3.0, 0.0])
    shape, vals = deserialize_record(s, serialize_record(s, [t]))[0]
    assert shape == [2, 2]
    assert vals[0] == 1.5 and math.isnan(vals[1]) and vals[2] == -3.0


def test_serialize_validates():
    with pytest.raises(IncompatibleSchemaException):
        serialize_record(MIXED, [1, 2.0, "x"])  # arity
    with pytest.raises(IncompatibleSchemaException):
        serialize_record(MIXED, [1, 2.0, 3, b""])  # type


def test_deserialize_detects_corruption():
    s = Schema(INTEGER, TEXT)
    data = serialize_record(s, [7, "hello"])
    with pytest.raises(FormatException):
        deserialize_record(s, data[:-3])  # short read
    with pytest.raises(FormatException):
        deserialize_record(s, data + b"xx")  # over-run


def test_deserialize_rejects_negative_tensor_dims():
    """A corrupt/crafted negative dim must raise FormatException, not
    escape as struct.error (dims are signed '>i' on the wire; a
    negative product would slip past the length check)."""
    import struct

    s = Schema(TENSOR)
    good = serialize_record(s, [Tensor([2, 2], [1.0, 2.0, 3.0, 4.0])])
    # patch dim0 (bytes 4..8, after the 4-byte ndim) to -2
    bad = good[:4] + struct.pack(">i", -2) + good[8:]
    with pytest.raises(FormatException):
        deserialize_record(s, bad)
    # zero dims remain legal even alongside large dims: [4, 0] has 0
    # values and must round-trip, not be rejected by a size bound
    empty = serialize_record(s, [Tensor([4, 0], [])])
    shape, vals = deserialize_record(s, empty)[0]
    assert shape == [4, 0] and vals == []


def test_typed_queue_converter(tmp_path):
    class Item:
        def __init__(self, id_, text):
            self.id, self.text = id_, text

        def __eq__(self, other):
            return (self.id, self.text) == (other.id, other.text)

    conv = Converter(
        schema=Schema(INTEGER, TEXT),
        from_obj=lambda it: [it.id, it.text],
        to_obj=lambda rec: Item(rec[0], rec[1]),
    )
    q = Queue(str(tmp_path / "tq"), Schema(INTEGER, TEXT), capacity=100)
    tq = q.typed(conv)
    assert tq.push(Item(1, "one"))
    assert tq.push_all([Item(2, "two"), Item(3, "three")]) == []
    assert tq.size() == 3
    assert tq.latest() == Item(3, "three")
    assert tq.pop(1000) == Item(1, "one")
    assert tq.consume(lambda it: it.text.upper()) == "TWO"
    assert tq.try_pop() == Item(3, "three")
    assert tq.is_empty()
    q.close()


def test_queue_aggregate_foreach(tmp_path):
    q = Queue(str(tmp_path / "aq"), Schema(INTEGER, TEXT), capacity=100)
    q.publisher().push_all([[i, f"v{i}"] for i in range(10)])
    q.subscriber().pop_n(3)
    # fold over pending only (FIFO order)
    total = q.aggregate(0, lambda acc, rec: acc + rec[0])
    assert total == sum(range(3, 10))
    seen = []
    q.foreach(lambda rec: seen.append(rec[0]))
    assert seen == list(range(3, 10))
    q.close()


def test_framed_roundtrip_mixed_codecs():
    """A framed blob is self-describing: mixed PLAIN/GZIP records
    decode without out-of-band codec state."""
    from quebic_spark.codec import GZIP, PLAIN
    from quebic_spark.serde import deserialize_framed, serialize_framed

    schema = Schema(INTEGER, TEXT, REAL)
    recs = [(i, "x" * i, i / 7.0) for i in range(6)]
    blobs = [
        serialize_framed(schema, list(r), GZIP if i % 2 else PLAIN)
        for i, r in enumerate(recs)
    ]
    assert [b[0] for b in blobs] == [
        (GZIP if i % 2 else PLAIN).id for i in range(6)
    ]
    assert [deserialize_framed(schema, b) for b in blobs] == recs


def test_framed_rejects_unknown_codec_and_empty():
    from quebic_spark.serde import deserialize_framed, serialize_framed

    schema = Schema(INTEGER)
    blob = serialize_framed(schema, [7])
    with pytest.raises(FormatException):
        deserialize_framed(schema, bytes([250]) + blob[1:])
    with pytest.raises(FormatException):
        deserialize_framed(schema, b"")


def test_error_taxonomy_for_corrupt_and_hostile_payloads():
    """r14 review: every corrupt-bytes path must raise FormatException
    and every bad-value path IncompatibleSchemaException — OS-level
    types (UnicodeDecodeError, struct.error, OverflowError, bare
    ValueError) leaking past the taxonomy crash callers that follow
    the documented quarantine contract."""
    import struct

    import pytest

    from quebic_spark.errors import (
        FormatException,
        IncompatibleSchemaException,
    )
    from quebic_spark.schema import REAL, Schema, TENSOR, TEXT
    from quebic_spark.serde import deserialize_record, serialize_record

    # corrupt TEXT bytes -> FormatException, not UnicodeDecodeError
    with pytest.raises(FormatException, match="undecodable TEXT"):
        deserialize_record(Schema(TEXT), struct.pack(">I", 2) + b"\xff\xfe")
    # ndim=0 tensor with a value (empty-product n_vals == 1)
    with pytest.raises(FormatException, match="invalid tensor"):
        deserialize_record(
            Schema(TENSOR), struct.pack(">I", 0) + struct.pack(">d", 1.5)
        )
    # lone surrogate passes str validation but has no UTF-8 encoding
    with pytest.raises(IncompatibleSchemaException, match="UTF-8"):
        serialize_record(Schema(TEXT), ["\ud800"])
    # int beyond double range
    with pytest.raises(IncompatibleSchemaException, match="double range"):
        Schema(REAL).validate_record([10**400])
    # malformed TENSOR payloads stay schema errors
    with pytest.raises(IncompatibleSchemaException, match="TENSOR"):
        Schema(TENSOR).validate_record([([2], 5)])
    with pytest.raises(IncompatibleSchemaException, match="TENSOR"):
        Schema(TENSOR).validate_record([([2], [1.0])])


def test_typed_push_all_remainder_uses_pop_representation(tmp_path):
    """r14 review: the unadmitted push_all remainder held VALIDATED
    rows (TENSOR as (shape, values) tuples) while pop delivers Tensor
    objects — a to_obj written against pop's representation got a
    tuple back and crashed (or round-tripped the wrong object)."""
    from quebic_spark.schema import TENSOR as TTYPE
    from quebic_spark.tensor import Tensor

    conv = Converter(
        schema=Schema(INTEGER, TTYPE),
        from_obj=lambda it: [it[0], it[1]],
        # written against POP's representation: rec[1] is a Tensor
        to_obj=lambda rec: (rec[0], rec[1].to_vector()),
    )
    q = Queue(
        str(tmp_path / "tqr"), Schema(INTEGER, TTYPE), capacity=2
    )
    tq = q.typed(conv)
    items = [(i, Tensor([2], [float(i), 0.5])) for i in range(4)]
    rest = tq.push_all(items, limit_ms=0)
    # capacity 2: two admitted, two returned THROUGH to_obj — which
    # must see Tensor objects, same as pop below
    assert [r[0] for r in rest] == [2, 3]
    assert rest[0][1] == [2.0, 0.5]
    assert tq.pop(1000) == (0, [0.0, 0.5])
    assert tq.try_pop() == (1, [1.0, 0.5])
    q.dispose()
