"""Typed queue facade — the ``Value2Struct[T]`` converter surface.

The reference's only user-extensibility point is a bidirectional
record mapping (Queue.scala:301-307: ``schema``, ``from(T):Struct``,
``to(Struct):T``) that makes ``Queue[T]`` generic in a user type.
``Converter`` + ``TypedQueue`` provide the same contract: the user
supplies two functions and works in domain objects; the engine stores
validated positional records.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Iterable, Sequence

from quebic_spark.queue.queue import Queue
from quebic_spark.schema import Schema


@dataclass(frozen=True)
class Converter:
    """Bidirectional object <-> record mapping (Value2Struct parity)."""

    schema: Schema
    from_obj: Callable[[Any], Sequence[Any]]
    to_obj: Callable[[tuple[Any, ...]], Any]


class TypedQueue:
    """``Queue[T]``: every operation mapped through the converter."""

    def __init__(self, queue: Queue, converter: Converter):
        queue.schema.assert_compatible(converter.schema)
        self._q = queue
        self._conv = converter
        self._pub = queue.publisher()
        self._sub = queue.subscriber()

    # -- producer ---------------------------------------------------------
    def try_push(self, obj: Any, lifetime_ms: int = -1) -> bool:
        return self._pub.try_push(
            list(self._conv.from_obj(obj)), lifetime_ms
        )

    def push(self, obj: Any, limit_ms: int = -1,
             lifetime_ms: int = -1) -> bool:
        return self._pub.push(
            list(self._conv.from_obj(obj)), limit_ms, lifetime_ms
        )

    def push_all(self, objs: Iterable[Any], limit_ms: int = -1,
                 lifetime_ms: int = -1) -> list[Any]:
        records = [list(self._conv.from_obj(o)) for o in objs]
        rest = self._pub.push_all(records, limit_ms, lifetime_ms)
        # the unadmitted remainder holds VALIDATED rows (TENSOR as
        # (shape, values) tuples), while pop delivers Tensor objects —
        # normalize to pop's representation so one to_obj serves both
        # (r14 review: a to_obj written against pop got a tuple here)
        return [
            self._conv.to_obj(self._pop_repr(tuple(r))) for r in rest
        ]

    def _pop_repr(self, rec: tuple[Any, ...]) -> tuple[Any, ...]:
        from quebic_spark.schema import TENSOR
        from quebic_spark.tensor import Tensor

        return tuple(
            Tensor(*v) if t is TENSOR and not isinstance(v, Tensor)
            else v
            for v, t in zip(rec, self._conv.schema.types)
        )

    def latest(self) -> Any | None:
        rec = self._pub.latest()
        return None if rec is None else self._conv.to_obj(rec)

    # -- consumer ---------------------------------------------------------
    def try_pop(self) -> Any | None:
        rec = self._sub.try_pop()
        return None if rec is None else self._conv.to_obj(rec)

    def pop(self, limit_ms: int = -1) -> Any | None:
        rec = self._sub.pop(limit_ms)
        return None if rec is None else self._conv.to_obj(rec)

    def consume(self, f: Callable[[Any], Any],
                error_permit: int = 3) -> Any:
        return self._sub.consume(
            lambda rec: f(self._conv.to_obj(rec)), error_permit
        )

    # -- passthrough -------------------------------------------------------
    @property
    def queue(self) -> Queue:
        return self._q

    def size(self) -> int:
        return self._q.size()

    def is_empty(self) -> bool:
        return self._q.is_empty()
