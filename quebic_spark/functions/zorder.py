"""Z-order (Morton) curve expressions — multi-dimensional clustering
for data skipping.

Sorting a table by ONE column makes parquet min/max footer stats
selective on that column and useless on every other; interleaving the
bits of several columns' range-buckets produces a single sort key
(the Z-value) under which every contiguous slice of rows covers a
bounded RECTANGLE in the value space — so file/row-group pruning works
on all clustered dimensions at once. This is the layout step behind
Databricks OPTIMIZE ZORDER and ClickHouse's mortonEncode, expressed
here as pure Spark built-ins (shiftleft/bitwiseAND folds — whole-stage
codegen, no UDFs) so the same arithmetic is replayable in any engine
with integer bit ops (the DuckDB oracle runs it verbatim).

Extension layer (SURVEY §2.10) — the reference's layout unit is an
append-ordered journal file (JournaledFile.scala:204-284); it has no
clustering concept.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

Z_BITS = 8  # bits per dimension (256 range buckets)


def range_bucket(
    col: Column, mn: Column, mx: Column, bits: int = Z_BITS
) -> Column:
    """Map ``col`` into ``[0, 2**bits)`` by linear scaling over the
    exact [mn, mx] range. ``floor(frac * 2**bits)`` hits ``2**bits``
    only at ``col == mx``; the ``least`` clamp folds that single point
    into the top bucket. Degenerate ranges (mn == mx) land in bucket 0
    via the NaN-free guard. NULL values land in bucket 0 too (r15
    review: ``least`` SKIPS nulls, so a NULL silently took the TOP
    bucket, scattering the null rows into the max-value curve slices;
    pinning them to one fixed bucket keeps them co-located for data
    skipping — min/max stats of the absorbing files are unaffected
    because parquet tracks null counts separately)."""
    n = 1 << bits
    span = mx.cast("double") - mn.cast("double")
    frac = F.when(span > 0, (col.cast("double") - mn.cast("double")) / span
                  ).otherwise(F.lit(0.0))
    return F.when(col.isNull(), F.lit(0).cast("long")).otherwise(
        F.least(
            F.lit(n - 1).cast("long"), F.floor(frac * F.lit(float(n)))
        )
    )


def interleave_bits(buckets: list[Column], bits: int = Z_BITS) -> Column:
    """Morton-interleave the low ``bits`` of each bucket column:
    output bit ``b * len(buckets) + i`` is bit ``b`` of ``buckets[i]``.
    Pure integer shifts/masks — deterministic on any engine."""
    if not buckets:
        raise ValueError("interleave_bits needs at least one column")
    if bits * len(buckets) > 63:
        # the key is a signed long: 8 cols x 8 bits puts the top bit
        # in the SIGN bit (top-half rows sort before the bottom half),
        # and past 64 Java's shift-distance masking silently WRAPS
        # bit positions into collisions — both destroy curve locality
        # with no error (r13 review, reproduced: 8x8-bit interleave of
        # 255s returned -1)
        raise ValueError(
            f"interleave_bits: {len(buckets)} columns x {bits} bits "
            f"= {bits * len(buckets)} key bits > 63 (signed long) — "
            "lower bits or cluster on fewer columns"
        )
    z = F.lit(0).cast("long")
    n = len(buckets)
    for i, c in enumerate(buckets):
        for b in range(bits):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_keys(df, cols, bits: int = Z_BITS, file_bits: int = 0):
    """Attach Morton keys over ``cols``: one exact min/max agg
    broadcast back onto ``df``, per-dim range buckets, the interleaved
    z-value, and (when ``file_bits`` > 0) the top-bits curve-slice id.

    Returns ``(withz, buckets, zval, zfile)`` — the single derivation
    the writer, the gate, and the scale smoke all share (review catch:
    three hand-rolled copies, one with a hardcoded shift).
    ``withz`` carries ``_mn_<col>``/``_mx_<col>`` helper columns the
    caller projects away."""
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_keys needs at least one column")
    if not 0 <= file_bits <= bits * len(cols):
        raise ValueError("file_bits must be in [0, bits * len(cols)]")
    # reserved-name guard (r15 review, the asof_join/_salt
    # convention): a pre-existing _mn_/_mx_ column would make the
    # post-crossJoin reference ambiguous and fail as an
    # internals-pointing AnalysisException mid-plan
    clash = sorted(
        {f"_mn_{c}" for c in cols} | {f"_mx_{c}" for c in cols}
    )
    clash = [c for c in clash if c in df.columns]
    if clash:
        raise ValueError(
            f"zorder_keys reserves column name(s) {clash}; rename "
            "them on the input"
        )
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    withz = df.crossJoin(F.broadcast(df.agg(*aggs)))
    buckets = [
        range_bucket(F.col(c), F.col(f"_mn_{c}"), F.col(f"_mx_{c}"), bits)
        for c in cols
    ]
    zval = interleave_bits(buckets, bits)
    zfile = (
        F.shiftright(zval, bits * len(cols) - file_bits)
        if file_bits else None
    )
    return withz, buckets, zval, zfile


def interleave_bits_sql(cols: list[str], bits: int = Z_BITS) -> str:
    """The identical interleave as ANSI-ish SQL (DuckDB dialect) so
    oracles replay the exact arithmetic."""
    terms = []
    n = len(cols)
    for i, c in enumerate(cols):
        for b in range(bits):
            terms.append(f"((({c} >> {b}) & 1) << {b * n + i})")
    return " | ".join(terms)


def range_bucket_sql(col: str, mn: str, mx: str, bits: int = Z_BITS) -> str:
    n = 1 << bits
    frac = (f"CASE WHEN (CAST({mx} AS DOUBLE) - CAST({mn} AS DOUBLE)) > 0 "
            f"THEN (CAST({col} AS DOUBLE) - CAST({mn} AS DOUBLE)) "
            f"/ (CAST({mx} AS DOUBLE) - CAST({mn} AS DOUBLE)) "
            f"ELSE 0.0 END")
    # NULL -> bucket 0, mirroring range_bucket's rule exactly (r15)
    return (f"CASE WHEN {col} IS NULL THEN CAST(0 AS BIGINT) "
            f"ELSE LEAST(CAST({n - 1} AS BIGINT), "
            f"CAST(FLOOR({frac} * {n}.0) AS BIGINT)) END")
