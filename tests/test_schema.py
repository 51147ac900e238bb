"""Type system + schema validation tests.

Mirrors the reference's SchemaTest/StructTest coverage (SURVEY §5):
round-trips per type, tensor shape inference/coercion/errors, arity and
type mismatch errors, 255-column limit.
"""

import math

import pytest

from quebic_spark import (
    BINARY,
    INTEGER,
    IncompatibleSchemaException,
    REAL,
    Schema,
    TENSOR,
    TEXT,
    Tensor,
)
from quebic_spark.schema import render_text, type_of


def test_schema_spark_mapping():
    s = Schema(INTEGER, REAL, TEXT, BINARY, TENSOR)
    spark_schema = s.to_spark()
    assert [f.name for f in spark_schema.fields] == [
        "c0", "c1", "c2", "c3", "c4",
    ]
    assert spark_schema.fields[0].dataType.typeName() == "long"
    assert spark_schema.fields[1].dataType.typeName() == "double"
    assert spark_schema.fields[2].dataType.typeName() == "string"
    assert spark_schema.fields[3].dataType.typeName() == "binary"
    assert spark_schema.fields[4].dataType.typeName() == "struct"
    assert not any(f.nullable for f in spark_schema.fields)


def test_schema_json_roundtrip():
    s = Schema(INTEGER, TEXT, TENSOR)
    assert Schema.from_json(s.to_json()) == s


def test_schema_too_many_columns():
    # parity: Schema.scala:9-11 / SchemaTest 256-column case
    Schema(*([INTEGER] * 255))
    with pytest.raises(IncompatibleSchemaException):
        Schema(*([INTEGER] * 256))


def test_validate_record_ok():
    s = Schema(INTEGER, REAL, TEXT, BINARY)
    rec = s.validate_record([1, 2.5, "x", b"\x00\x01"])
    assert rec == (1, 2.5, "x", b"\x00\x01")
    # int is acceptable for REAL (numeric coercion)
    assert s.validate_record([1, 2, "x", b""])[1] == 2.0


def test_validate_record_arity_mismatch():
    s = Schema(INTEGER, TEXT)
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record([1])
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record([1, "a", "b"])


def test_validate_record_type_mismatch():
    s = Schema(INTEGER, TEXT)
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record(["not-int", "a"])
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record([1, 2])
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record([None, "a"])  # no NULLs
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record([True, "a"])  # bool is not INTEGER


def test_int64_range():
    s = Schema(INTEGER)
    s.validate_record([2**63 - 1])
    s.validate_record([-(2**63)])
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record([2**63])


def test_assert_compatible():
    Schema(INTEGER, TEXT).assert_compatible(Schema(INTEGER, TEXT))
    with pytest.raises(IncompatibleSchemaException):
        Schema(INTEGER, TEXT).assert_compatible(Schema(TEXT, INTEGER))
    with pytest.raises(IncompatibleSchemaException):
        Schema(INTEGER).assert_compatible(Schema(INTEGER, INTEGER))


def test_type_lookup():
    assert type_of(0) is INTEGER
    assert type_of("TENSOR") is TENSOR
    with pytest.raises(ValueError):
        type_of(9)


# ---- tensors (StructTest.scala:45-69 parity) ---------------------------

def test_tensor_invariant():
    Tensor([2, 3], [1, 2, 3, 4, 5, 6])
    with pytest.raises(ValueError):
        Tensor([2, 3], [1, 2, 3])
    with pytest.raises(ValueError):
        Tensor([], [1.0])  # empty shape, nonempty values


def test_tensor_from_vector():
    t = Tensor.from_vector([1, 2.5, True, False])
    assert t.shape == [4]
    assert t.values == [1.0, 2.5, 1.0, 0.0]  # Boolean -> 1/0 coercion
    with pytest.raises(ValueError):
        Tensor.from_vector([])


def test_tensor_from_matrix():
    t = Tensor.from_matrix([[1, 2, 3], [4, 5, 6]])
    assert t.shape == [2, 3]
    assert t.values == [1, 2, 3, 4, 5, 6]
    with pytest.raises(ValueError):
        Tensor.from_matrix([[1, 2], [3]])  # ragged
    with pytest.raises(ValueError):
        Tensor.from_matrix([[]])  # empty row
    with pytest.raises(ValueError):
        Tensor.from_matrix([])


def test_tensor_from_tensor_nested():
    t = Tensor.from_tensor([[[1, 2], [3, 4]], [[5, 6], [7, 8]]])
    assert t.shape == [2, 2, 2]
    assert t.to_nested() == [[[1, 2], [3, 4]], [[5, 6], [7, 8]]]
    with pytest.raises(ValueError):
        Tensor.from_tensor([[1, 2], 3])  # mixed nesting
    with pytest.raises(ValueError):
        Tensor.from_tensor([[1, 2], [3]])  # ragged
    with pytest.raises(ValueError):
        Tensor.from_tensor([])


def test_tensor_nan_equality():
    a = Tensor([2], [float("nan"), 1.0])
    b = Tensor([2], [float("nan"), 1.0])
    assert a == b
    assert math.isnan(a.values[0])


def test_tensor_in_record():
    s = Schema(TENSOR)
    shape, values = s.validate_record([Tensor.from_vector([1, 2])])[0]
    assert shape == [2] and values == [1.0, 2.0]
    with pytest.raises(IncompatibleSchemaException):
        s.validate_record(["nope"])


def test_render_text_escapes():
    assert render_text('a"b') == '"a\\"b"'
    assert render_text("a\nb") == '"a\\nb"'
    assert render_text("\x00") == '"\\u0000"'


def test_bool_is_not_a_type_spec_and_specials_render_scala_style():
    """r14 review: bool is an int subclass, so type_of(True) silently
    resolved to the id-1 type (REAL) instead of rejecting an invalid
    spec; render_real rendered infinities Python-style where the
    reference's toString says Infinity/-Infinity."""
    import pytest

    from quebic_spark.schema import render_real, type_of

    with pytest.raises(ValueError, match="unknown data type"):
        type_of(True)
    with pytest.raises(ValueError, match="unknown data type"):
        type_of(False)
    assert render_real(float("inf")) == "Infinity"
    assert render_real(float("-inf")) == "-Infinity"
    assert render_real(float("nan")) == "NaN"


def test_tensor_hash_consistent_with_nan_equality():
    """r14 review: __eq__ is NaN-tolerant but __hash__ hashed raw
    floats (Python hashes distinct NaNs by identity), so equal
    tensors broke set/dict membership. Also: wire dims are int32 —
    a constructible dim >= 2**31 must be a construction-time domain
    error, not a later struct.error."""
    import pytest

    from quebic_spark.tensor import Tensor

    a = Tensor([2], [float("nan"), 1.0])
    b = Tensor([2], [float("nan"), 1.0])
    assert a == b
    assert hash(a) == hash(b)
    assert b in {a}
    with pytest.raises(ValueError, match="int32"):
        Tensor([0, 2**31], [])


def test_schema_canonicalizes_foreign_datatype_instances():
    """r15 review: DataType is a public frozen dataclass, so a
    hand-built equal instance passed __init__ but failed the
    identity-dispatch (`t is INTEGER`) paths later with
    AssertionError; an out-of-range id crashed to_spark with
    KeyError. Both must resolve or fail loud at construction."""
    from quebic_spark.schema import INTEGER, DataType, Schema

    s = Schema(DataType(0, "INTEGER"))
    assert s.types[0] is INTEGER
    s.validate_record([1])  # identity dispatch works on the singleton
    with pytest.raises(ValueError):
        Schema(DataType(7, "BLOB"))
    with pytest.raises(ValueError):
        Schema(DataType(0, "WRONG"))


def test_render_real_java_notation():
    """r15 review: finite doubles outside repr's fixed range rendered
    Python-style ('1e+16') where the Struct.scala parity contract is
    Java Double.toString ('1.0E16'): fixed for 1e-3 <= |v| < 1e7,
    else mantissa-in-[1,10) sci with no '+'."""
    from quebic_spark.schema import render_real

    cases = [
        (1e16, "1.0E16"), (1e-7, "1.0E-7"), (1.23e-7, "1.23E-7"),
        (-4.2e22, "-4.2E22"), (5.0, "5.0"), (0.001, "0.001"),
        (1e7, "1.0E7"), (9999999.0, "9999999.0"), (0.0, "0.0"),
        (-0.0, "-0.0"), (0.0009765625, "9.765625E-4"),
        (1.7976931348623157e308, "1.7976931348623157E308"),
        (2.5e-10, "2.5E-10"), (-1e7, "-1.0E7"),
    ]
    for v, want in cases:
        assert render_real(v) == want, (v, render_real(v), want)


def test_render_text_astral_nonprintable_uses_surrogate_pair():
    """r15 review: a 5-hex-digit \\uXXXXX escape is ambiguous to any
    \\uXXXX consumer; the reference's per-Char (UTF-16) loop emits a
    surrogate pair."""
    from quebic_spark.schema import render_text

    assert render_text("\U000E0001") == '"\\uDB40\\uDC01"'
    assert render_text("\x00") == '"\\u0000"'


# --------------------------------------------------------------------------
# r16 serde-family review fixes


def test_tensor_matrix_list_rejected_not_reinterpreted():
    """r16 review: the (shape, values) pair form accepted LISTS, so
    the natural matrix spelling [[1, 2], [3, 4]] validated as a
    silently wrong 1x2 tensor (shape [1, 2] implies 2 values). Pairs
    are tuples; nested lists fail loud and point at from_matrix."""
    from quebic_spark.errors import IncompatibleSchemaException
    from quebic_spark.schema import TENSOR, Schema

    with pytest.raises(IncompatibleSchemaException, match="from_matrix"):
        Schema(TENSOR).validate_record([[[1, 2], [3, 4]]])
    # the tuple pair form and the Tensor form still work
    assert Schema(TENSOR).validate_record([([2], [1.0, 2.0])]) == (
        ([2], [1.0, 2.0]),
    )
    assert Schema(TENSOR).validate_record(
        [Tensor.from_matrix([[1, 2], [3, 4]])]
    ) == (([2, 2], [1.0, 2.0, 3.0, 4.0]),)


def test_type_of_unhashable_spec_raises_value_error():
    """r16 review: an unhashable spec (nested list in a hand-edited
    meta.json) leaked TypeError past the documented ValueError."""
    from quebic_spark.schema import Schema, type_of

    with pytest.raises(ValueError, match="unknown data type"):
        type_of([])
    with pytest.raises(ValueError, match="unknown data type"):
        Schema(["INTEGER"])


def test_tensor_constructor_rejects_untyped_input():
    """r16 review: bare int()/float() coercion accepted strings and
    silently truncated float dims (2.9 -> 2)."""
    import numpy as np

    with pytest.raises(ValueError, match="not an integer"):
        Tensor(["2"], [1.0, 2.0])
    with pytest.raises(ValueError, match="not an integer"):
        Tensor([2.9, 2], [1.0] * 4)
    with pytest.raises(ValueError, match="not numeric"):
        Tensor([2], ["1.0", "2.5"])
    # numpy integral dims (what pandas hands the export path) and
    # bool values (Struct.scala:97 coercion) still work
    t = Tensor([np.int64(2)], [True, 0.5])
    assert t.as_row() == ([2], [1.0, 0.5])


def test_tensor_as_row_returns_copies():
    """r16 review: as_row() aliased the live internal lists, so
    mutating a validated record retroactively corrupted the Tensor
    (and could break prod(shape) == len(values) between validate and
    serialize)."""
    t = Tensor([2], [1.0, 2.0])
    shape, values = t.as_row()
    shape.append(99)
    values.append(99.0)
    assert t.shape == [2] and t.values == [1.0, 2.0]
    assert t.as_row() == ([2], [1.0, 2.0])


def test_tensor_pair_accepts_numpy_scalars():
    """r16 review: routing Tensor values through _coerce_scalar
    rejected numpy int64/float32 scalars the previous float() coercion
    accepted — a pair form built from a numpy array must validate."""
    import numpy as np

    from quebic_spark.schema import TENSOR, Schema

    got = Schema(TENSOR).validate_record(
        [(list(np.array([3], dtype=np.int64)),
          list(np.array([1, 2, 3], dtype=np.float32)))]
    )
    assert got == (([3], [1.0, 2.0, 3.0]),)
    got = Schema(TENSOR).validate_record(
        [([np.int32(2)], [np.int64(4), np.float64(0.5)])]
    )
    assert got == (([2], [4.0, 0.5]),)
