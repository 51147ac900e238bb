"""The 5-type positional data model, mapped onto Spark types.

Reference parity (DataType.scala:18-66, Schema.scala:8-34):

| quebic  | id | runtime repr                 | Spark type                                        |
|---------|----|------------------------------|---------------------------------------------------|
| INTEGER | 0  | 64-bit signed int            | LongType                                          |
| REAL    | 1  | IEEE-754 double              | DoubleType                                        |
| TEXT    | 2  | unicode string               | StringType                                        |
| BINARY  | 3  | bytes                        | BinaryType                                        |
| TENSOR  | 4  | (shape:[int], values:[float])| StructType(shape:array<int>, values:array<double>)|

Key semantics carried over:
  * schemas are positional and unnamed (Schema.scala:8-11) — Spark needs
    names, so we synthesize ``c0..cN`` deterministically;
  * at most 255 columns (Limits.scala:5, ``MaxColumnSize = 0xFF``);
  * no NULLs — ``Data[T]`` has no null member and mismatches raise
    IncompatibleSchemaException (Schema.scala:22-31);
  * schema compatibility is same-arity + same type ids, checked when an
    existing queue is opened (JournaledFile.scala:562-584).

The reference's wire format (varint ints, 4-bit-packed schema bytes —
DataType.scala:87-113, Schema.scala:66-73) is an implementation detail of
its row-oriented file layout; our storage is columnar Parquet, a strict
upgrade, so those encodings are intentionally not reproduced.
"""

from __future__ import annotations

import decimal
import math
from dataclasses import dataclass
from typing import Any, Iterable, Sequence

from pyspark.sql import types as T

from quebic_spark.errors import IncompatibleSchemaException
from quebic_spark.tensor import Tensor

MAX_COLUMNS = 0xFF  # Limits.scala:5


@dataclass(frozen=True)
class DataType:
    """One of the five quebic types (DataType.scala:18)."""

    id: int
    name: str

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return self.name


INTEGER = DataType(0, "INTEGER")
REAL = DataType(1, "REAL")
TEXT = DataType(2, "TEXT")
BINARY = DataType(3, "BINARY")
TENSOR = DataType(4, "TENSOR")

ALL_TYPES: tuple[DataType, ...] = (INTEGER, REAL, TEXT, BINARY, TENSOR)
_BY_ID = {t.id: t for t in ALL_TYPES}
_BY_NAME = {t.name: t for t in ALL_TYPES}

_TENSOR_SPARK_TYPE = T.StructType(
    [
        T.StructField("shape", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("values", T.ArrayType(T.DoubleType(), False), False),
    ]
)

_SPARK_TYPE = {
    INTEGER: T.LongType(),
    REAL: T.DoubleType(),
    TEXT: T.StringType(),
    BINARY: T.BinaryType(),
    TENSOR: _TENSOR_SPARK_TYPE,
}


def type_of(id_or_name: int | str) -> DataType:
    """Lookup by id or name (DataType.valueOf, DataType.scala:27)."""
    if isinstance(id_or_name, bool):
        # bool is an int subclass: type_of(True) silently hashed to
        # the id-1 type and built a REAL column for an invalid spec
        # (r14 review) — the same exclusion _validate_field applies
        raise ValueError(f"unknown data type: {id_or_name!r}")
    table = _BY_ID if isinstance(id_or_name, int) else _BY_NAME
    try:
        return table[id_or_name]  # type: ignore[index]
    except (KeyError, TypeError):
        # TypeError: an UNHASHABLE spec (e.g. a nested list in a
        # hand-edited meta.json reaching Schema.from_json) leaked a
        # raw TypeError past the documented ValueError contract and
        # crashed queue open outside the domain taxonomy (r16 review;
        # the r14 bool fix covered only hashable impostors)
        raise ValueError(f"unknown data type: {id_or_name!r}") from None


def _canonical_type(t: DataType | str | int) -> DataType:
    """Resolve any accepted spelling to the module singleton the
    identity-dispatch code paths require."""
    if isinstance(t, DataType):
        canon = type_of(t.id)  # ValueError on out-of-range id
        if canon != t:
            raise ValueError(f"unknown data type: {t!r}")
        return canon
    return type_of(t)


class Schema:
    """Positional, unnamed schema of quebic types (Schema.scala:8-11).

    Columns are synthesized as ``c0..cN`` for Spark. ``nullable=False``
    everywhere: the reference has no NULL (SURVEY §1.2).
    """

    def __init__(self, *types: DataType | str | int):
        # canonicalize DataType instances through the id table too
        # (r15 review): DataType is a public frozen dataclass, so a
        # hand-built equal-but-not-identical instance — or an
        # out-of-range one like DataType(7, 'BLOB') — constructed a
        # Schema whose later validate/serialize dispatch (`t is
        # INTEGER` identity checks, _SPARK_TYPE lookup) crashed with
        # AssertionError/KeyError outside the error taxonomy. Resolve
        # to the singletons up front; unknown ids or mismatched names
        # fail loud here as ValueError.
        resolved = tuple(_canonical_type(t) for t in types)
        if len(resolved) > MAX_COLUMNS:
            # parity: Schema.scala:9-11 rejects >0xFF columns
            raise IncompatibleSchemaException(
                f"too many columns: {len(resolved)} > {MAX_COLUMNS}"
            )
        self.types: tuple[DataType, ...] = resolved

    # -- Spark mapping -------------------------------------------------
    @property
    def column_names(self) -> list[str]:
        return [f"c{i}" for i in range(len(self.types))]

    def to_spark(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField(f"c{i}", _SPARK_TYPE[t], nullable=False)
                for i, t in enumerate(self.types)
            ]
        )

    # -- (de)serialization of the schema itself ------------------------
    def to_json(self) -> list[str]:
        return [t.name for t in self.types]

    @classmethod
    def from_json(cls, names: Iterable[str]) -> "Schema":
        return cls(*names)

    # -- validation -----------------------------------------------------
    def validate_record(self, values: Sequence[Any]) -> tuple[Any, ...]:
        """Validate one positional record, coercing where the reference does.

        Parity with Schema.serialize's checks (Schema.scala:22-31): arity
        mismatch and per-field type mismatch raise
        IncompatibleSchemaException; None anywhere raises (no NULLs).
        Returns the record as a tuple ready for a Spark Row.
        """
        if len(values) != len(self.types):
            raise IncompatibleSchemaException(
                f"record arity {len(values)} != schema arity {len(self.types)}"
            )
        out: list[Any] = []
        for i, (v, t) in enumerate(zip(values, self.types)):
            out.append(_validate_field(i, v, t))
        return tuple(out)

    def assert_compatible(self, other: "Schema") -> None:
        """Same-arity + same-type check (JournaledFile.scala:581-583)."""
        if self.types != other.types:
            raise IncompatibleSchemaException(
                f"incompatible schema: {self} != {other}"
            )

    # -- dunder ----------------------------------------------------------
    def __len__(self) -> int:
        return len(self.types)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Schema) and self.types == other.types

    def __hash__(self) -> int:
        return hash(self.types)

    def __repr__(self) -> str:
        return f"Schema({', '.join(t.name for t in self.types)})"


def _validate_field(i: int, v: Any, t: DataType) -> Any:
    if v is None:
        raise IncompatibleSchemaException(f"column c{i}: NULL is not allowed")
    if t is INTEGER:
        if isinstance(v, bool) or not isinstance(v, int):
            raise IncompatibleSchemaException(
                f"column c{i}: expected INTEGER, got {type(v).__name__}"
            )
        if not (-(2**63) <= v < 2**63):
            raise IncompatibleSchemaException(
                f"column c{i}: INTEGER out of 64-bit range: {v}"
            )
        return v
    if t is REAL:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise IncompatibleSchemaException(
                f"column c{i}: expected REAL, got {type(v).__name__}"
            )
        try:
            return float(v)
        except OverflowError:
            # int beyond float range (r14 review: OverflowError leaked
            # out of the schema-error taxonomy)
            raise IncompatibleSchemaException(
                f"column c{i}: REAL out of double range: {v!r}"
            ) from None
    if t is TEXT:
        if not isinstance(v, str):
            raise IncompatibleSchemaException(
                f"column c{i}: expected TEXT, got {type(v).__name__}"
            )
        return v
    if t is BINARY:
        if not isinstance(v, (bytes, bytearray)):
            raise IncompatibleSchemaException(
                f"column c{i}: expected BINARY, got {type(v).__name__}"
            )
        return bytes(v)
    if t is TENSOR:
        if isinstance(v, Tensor):
            return v.as_row()
        if (
            isinstance(v, tuple)
            and len(v) == 2
            and isinstance(v[0], (list, tuple))
        ):
            # the (shape, values) pair form is accepted as a TUPLE
            # only (r16 review): a 2-row nested LIST like
            # [[1, 2], [3, 4]] is indistinguishable from a pair —
            # shape [1, 2] implies 2 values, so the natural matrix
            # spelling validated as a silently wrong 1x2 tensor.
            # Lists now fall through to the loud error below, which
            # names Tensor.from_matrix for matrix input.
            try:
                return Tensor(list(v[0]), list(v[1])).as_row()
            except (TypeError, ValueError) as e:
                # malformed (shape, values) payloads stay inside the
                # schema-error taxonomy (r14 review: the constructor's
                # TypeError/ValueError escaped past callers catching
                # IncompatibleSchemaException)
                raise IncompatibleSchemaException(
                    f"column c{i}: invalid TENSOR payload: {e}"
                ) from e
        raise IncompatibleSchemaException(
            f"column c{i}: expected TENSOR, got {type(v).__name__}; "
            f"pass a Tensor, a (shape, values) TUPLE, or build nested "
            f"input with Tensor.from_matrix/from_tensor"
        )
    raise AssertionError(f"unreachable type {t}")


def render_text(s: str) -> str:
    """Display-escaping of TEXT values (Struct.scala:39-50).

    Control characters, quotes, backslashes and undefined code points are
    rendered as escapes; everything else passes through. Display-only.
    """
    out: list[str] = ['"']
    for ch in s:
        if ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        elif ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif not ch.isprintable():
            cp = ord(ch)
            if cp > 0xFFFF:
                # UTF-16 surrogate pair (r15 review): the reference's
                # per-Char loop (Struct.scala operates on UTF-16)
                # emits two 4-digit escapes; a single \uXXXXX with 5
                # hex digits is ambiguous to any \uXXXX consumer
                cp -= 0x10000
                out.append(
                    f"\\u{0xD800 + (cp >> 10):04X}"
                    f"\\u{0xDC00 + (cp & 0x3FF):04X}"
                )
            else:
                out.append(f"\\u{cp:04X}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def render_real(v: float) -> str:
    """Real rendering incl. specials (Struct.scala:33-37 uses
    toString): Scala renders NaN/Infinity/-Infinity, not Python's
    nan/inf (r14 review caught the infinity half missing), and
    finite doubles follow Java ``Double.toString`` notation (r15
    review: repr's '1e+16'/'1e-07' drifted from '1.0E16'/'1.0E-7'
    outside repr's fixed range): decimal form for 1e-3 <= |v| < 1e7,
    else ``d.dddE±n`` with a mantissa in [1, 10) and no '+' sign.
    Digits are the shortest round-trip decimal (Ryu — JDK 19+
    behavior; pre-Ryu JDKs add a spurious extra digit in rare cases,
    which we do not reproduce). Display-only."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    a = abs(v)
    if v == 0.0 or 1e-3 <= a < 1e7:
        # repr is already Java-shaped here: floats always carry a
        # fractional part ('5.0'), and repr's fixed-notation range
        # (1e-4..1e16) covers Java's entire fixed range
        return repr(v)
    sign, digits, exp = decimal.Decimal(repr(v)).as_tuple()
    mant = "".join(map(str, digits))
    e = len(mant) - 1 + int(exp)
    # repr's fixed notation can carry trailing zeros into the digit
    # tuple ('10000000.0' -> 100000000); strip AFTER fixing e
    mant = mant.rstrip("0") or "0"
    return (
        f"{'-' if sign else ''}{mant[0]}.{mant[1:] or '0'}E{e}"
    )
