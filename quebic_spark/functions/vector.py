"""Vector column expressions — JVM-side (whole-stage codegen), no UDFs.

These power similarity search and embedding dedup over
``array<float>`` columns. Everything is a fold over ``zip_with``, which
Catalyst compiles to codegen'd loops — no Python in the hot path, and
the sequential left-to-right double accumulation is deterministic (it
bit-matches DuckDB's ``list_dot_product`` on ``DOUBLE[]`` casts, which
the oracle relies on).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a| * |b|), NULL-free inputs assumed.

    Zero vectors yield NULL, not NaN (r15 review): double division
    keeps IEEE semantics even under ANSI mode, so an all-zero
    embedding (padding / failed-encode artifact) produced 0/0 = NaN —
    and Spark orders NaN ABOVE all doubles, so ``cos >= thr`` filters
    selected every zero vector as a top match. NULL is inert in
    filters and aggregates; a zero vector has no direction, so "no
    similarity value" is the honest answer."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
