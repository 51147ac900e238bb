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
    """dot(a,b) / (|a| * |b|), NULL-free inputs assumed."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
