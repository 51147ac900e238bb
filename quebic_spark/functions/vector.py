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


def dot_product_sql(a: str, b: str) -> str:
    """SQL-fragment twin of :func:`dot_product` over expression
    STRINGS (column names or literal fragments) — the exact same
    sequential fold, parsed in ONE py4j call instead of the ~3
    lambda-registration round-trips per higher-order function the
    Column form pays. Plan-construction cost for a centroid bank
    (8x64) drops ~0.3 s per build (measured r20); results are
    bit-identical (verified: 0 mismatches on real embeddings)."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_norm_sql(a: str) -> str:
    """SQL-fragment twin of :func:`l2_norm` (see dot_product_sql)."""
    return f"sqrt({dot_product_sql(a, a)})"


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
