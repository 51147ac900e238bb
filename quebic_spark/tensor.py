"""TENSOR value model: dense n-dimensional doubles with explicit shape.

Reference parity (Struct.scala:59-119):
  * invariant ``prod(shape) == len(values)``; an empty shape with
    nonempty values is rejected at construction (Struct.scala:60-62);
  * ``from_vector`` / ``from_matrix`` / ``from_tensor`` infer shape from
    nesting and coerce bool/int/float -> double (bool -> 1.0/0.0,
    Struct.scala:97); ragged / mixed / empty nests are rejected
    (Struct.scala:80, 87, 93, 105, 111).

Spark representation: ``struct<shape: array<int>, values: array<double>>``
(SURVEY §1.2). A 1-D tensor interops with ``array<float>`` embedding
columns via :meth:`to_vector` / :meth:`from_vector`.
"""

from __future__ import annotations

import math
import numbers
from typing import Any, Sequence


def _coerce_scalar(x: Any) -> float:
    # bool is an int subclass in Python -- check it first (parity with
    # the explicit Boolean=>1/0 coercion, Struct.scala:97).
    if isinstance(x, bool):
        return 1.0 if x else 0.0
    # numbers.Real, not (int, float) (r16 review): numpy int and
    # float32 scalars register as Real but subclass neither builtin
    # (only np.float64 subclasses float) — a pair form built from a
    # numpy array must keep validating. Strings and complex stay out.
    if isinstance(x, numbers.Real):
        return float(x)
    raise ValueError(f"tensor element is not numeric: {x!r}")


def _coerce_dim(s: Any) -> int:
    if isinstance(s, bool) or not isinstance(s, numbers.Integral):
        raise ValueError(f"tensor dimension is not an integer: {s!r}")
    return int(s)


class Tensor:
    """Dense row-major tensor of doubles."""

    __slots__ = ("shape", "values")

    def __init__(self, shape: Sequence[int], values: Sequence[float]):
        # typed coercion, not bare int()/float() (r16 review): the
        # bare forms accepted strings ("2", "1.5") and silently
        # TRUNCATED float dims (2.9 -> 2), bypassing the validation
        # every other entry point enforces. Dims must be integral
        # (numbers.Integral admits numpy int scalars, which the
        # export path's pandas rows carry; bool is excluded as
        # everywhere else); values take the same numeric coercion
        # from_vector/from_matrix use.
        shape = [_coerce_dim(s) for s in shape]
        values = [_coerce_scalar(v) for v in values]
        if any(s < 0 for s in shape):
            raise ValueError(f"negative dimension in shape {shape}")
        if any(s >= 2**31 for s in shape):
            # dims travel as signed 32-bit on the wire AND as Spark
            # IntegerType in the struct mapping; a constructible
            # over-wide dim (possible when another dim is 0) failed
            # later with struct.error instead of a domain error (r14
            # review)
            raise ValueError(
                f"dimension >= 2**31 in shape {shape} exceeds the "
                f"wire/Spark int32 dim format"
            )
        # parity: Struct.scala:60-62 -- shape product must equal length
        # (prod of an empty shape is 1, as in Scala), and an empty shape
        # with nonempty values is explicitly invalid; together these
        # reject every empty-shape tensor.
        n = math.prod(shape)
        if n != len(values):
            raise ValueError(
                f"shape {shape} implies {n} values, got {len(values)}"
            )
        if not shape and values:
            raise ValueError("empty shape with nonempty values")
        self.shape = shape
        self.values = values

    # -- constructors with shape inference -----------------------------
    @classmethod
    def from_vector(cls, xs: Sequence[Any]) -> "Tensor":
        """1-D tensor; empty vector is rejected (Struct.scala:80)."""
        xs = list(xs)
        if not xs:
            raise ValueError("empty vector cannot form a tensor")
        return cls([len(xs)], [_coerce_scalar(x) for x in xs])

    @classmethod
    def from_matrix(cls, rows: Sequence[Sequence[Any]]) -> "Tensor":
        """2-D tensor; ragged or empty nests rejected (Struct.scala:87-93)."""
        rows = [list(r) for r in rows]
        if not rows or any(not r for r in rows):
            raise ValueError("empty matrix/row cannot form a tensor")
        width = len(rows[0])
        if any(len(r) != width for r in rows):
            raise ValueError("ragged matrix cannot form a tensor")
        flat = [_coerce_scalar(x) for r in rows for x in r]
        return cls([len(rows), width], flat)

    @classmethod
    def from_tensor(cls, nested: Any) -> "Tensor":
        """N-D tensor from arbitrarily nested sequences (Struct.scala:102-119).

        All siblings at each depth must agree in length and leaf-ness;
        mixed scalar/sequence levels are rejected (Struct.scala:105, 111).
        """
        shape: list[int] = []
        level = nested
        while isinstance(level, (list, tuple)):
            if len(level) == 0:
                raise ValueError("empty nest cannot form a tensor")
            shape.append(len(level))
            level = level[0]
        flat: list[float] = []

        def walk(node: Any, depth: int) -> None:
            if depth == len(shape):
                if isinstance(node, (list, tuple)):
                    raise ValueError("ragged/mixed nesting in tensor")
                flat.append(_coerce_scalar(node))
                return
            if not isinstance(node, (list, tuple)) or len(node) != shape[depth]:
                raise ValueError("ragged/mixed nesting in tensor")
            for child in node:
                walk(child, depth + 1)

        walk(nested, 0)
        return cls(shape, flat)

    # -- conversions -----------------------------------------------------
    def as_row(self) -> tuple[list[int], list[float]]:
        """The Spark struct representation (shape, values).

        Returns COPIES (r16 review): handing out the live internal
        lists let a caller's later mutation of a validated record —
        or of the Tensor itself — retroactively corrupt the other,
        including breaking the prod(shape) == len(values) invariant
        between validate and serialize. to_vector() already copied;
        this aligns the aliasing contract."""
        return (list(self.shape), list(self.values))

    def to_vector(self) -> list[float]:
        if len(self.shape) != 1:
            raise ValueError(f"tensor of shape {self.shape} is not a vector")
        return list(self.values)

    def to_nested(self) -> Any:
        """Re-nest values per shape (row-major)."""

        def build(dim: int, off: int) -> tuple[Any, int]:
            if dim == len(self.shape):
                return self.values[off], off + 1
            out = []
            for _ in range(self.shape[dim]):
                node, off = build(dim + 1, off)
                out.append(node)
            return out, off

        node, _ = build(0, 0)
        return node

    # -- dunder ----------------------------------------------------------
    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Tensor):
            return NotImplemented
        if self.shape != other.shape:
            return False
        # NaN-tolerant equality, mirroring test expectations for NaN
        # round-trips (StructTest.scala:47-60).
        return all(
            (math.isnan(a) and math.isnan(b)) or a == b
            for a, b in zip(self.values, other.values)
        )

    def __hash__(self) -> int:
        # canonicalize NaN: __eq__ is NaN-tolerant, but Python hashes
        # distinct NaN objects by identity, so equal NaN-bearing
        # tensors hashed differently and broke set/dict membership
        # (r14 review)
        return hash((
            tuple(self.shape),
            tuple(
                "NaN" if math.isnan(v) else v for v in self.values
            ),
        ))

    def __repr__(self) -> str:
        return f"Tensor(shape={self.shape}, values={self.values})"
