"""One-pass column profiler — the corpus-QA scan before a release.

``profile(df)`` computes, for every atomic column, in a SINGLE
aggregation pass over ONE scan (no shuffle beyond the global agg's
partial->final combine): row count, null count, (approximate) distinct
count, and min/max. The result is long-format — one row per column —
so it is stable to profile any table into the same sink.

Scale notes:
  * all statistics are partial-aggregatable, so the pass is map-side
    combined and the final agg is one row — nothing about the plan
    changes at 100 TB;
  * ``exact_distinct=False`` (default) uses HyperLogLog
    (``approx_count_distinct``) — exact COUNT(DISTINCT) over many
    columns expands the input once per column, which is the one shape
    that would NOT survive scale; it exists as an opt-in because the
    oracle-paired test needs the exact values;
  * min/max are surfaced per type family: numerics as doubles,
    date/timestamp through an explicit monotone format (so the string
    min IS the temporal min), everything else as strings — one fixed
    output schema regardless of input table.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_TEMPORAL = (T.DateType, T.TimestampType, T.TimestampNTZType)
_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def _kind(dt: T.DataType) -> str:
    if isinstance(dt, _NUMERIC):
        return "numeric"
    if isinstance(dt, _TEMPORAL):
        return "temporal"
    if isinstance(dt, (T.StringType, T.BooleanType)):
        return "string"
    return "complex"


def profile(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format per-column statistics; see module docstring.

    Output schema (fixed): ``column, kind, n_rows, n_nulls, n_distinct,
    min_num, max_num, min_str, max_str``. Complex-typed columns
    (array/map/struct/binary) are skipped when ``columns`` is None and
    rejected when named explicitly — their ordering is not portable.
    """
    kinds = {f.name: _kind(f.dataType) for f in df.schema.fields}
    if columns is None:
        cols = [c for c in df.columns if kinds[c] != "complex"]
    else:
        cols = list(columns)
        bad = [c for c in cols if kinds.get(c, "complex") == "complex"]
        if bad:
            raise ValueError(
                f"cannot profile complex-typed column(s): {bad}"
            )
    if not cols:
        # fail with the real cause (r15 review): zero eligible columns
        # reached F.explode(F.array()) and died in analysis with a
        # star-expansion AnalysisException pointing at internals — a
        # plausible state for a table of only complex columns (e.g.
        # embeddings-only)
        raise ValueError(
            "profile() found no eligible (non-complex) columns; "
            f"table columns: {list(df.columns)}"
        )

    nd = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__nn"))
        aggs.append(nd(col).alias(f"{c}__nd"))
        if kinds[c] == "numeric":
            aggs.append(F.min(col).cast("double").alias(f"{c}__mn"))
            aggs.append(F.max(col).cast("double").alias(f"{c}__mx"))
        elif kinds[c] == "temporal":
            aggs.append(
                F.date_format(F.min(col), _TS_FMT).alias(f"{c}__mns")
            )
            aggs.append(
                F.date_format(F.max(col), _TS_FMT).alias(f"{c}__mxs")
            )
        else:
            aggs.append(F.min(col).cast("string").alias(f"{c}__mns"))
            aggs.append(F.max(col).cast("string").alias(f"{c}__mxs"))
    one = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in cols:
        k = kinds[c]
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(k).alias("kind"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_nulls"),
                F.col(f"{c}__nd").alias("n_distinct"),
                (F.col(f"{c}__mn") if k == "numeric" else null_d)
                .alias("min_num"),
                (F.col(f"{c}__mx") if k == "numeric" else null_d)
                .alias("max_num"),
                (F.col(f"{c}__mns") if k != "numeric" else null_s)
                .alias("min_str"),
                (F.col(f"{c}__mxs") if k != "numeric" else null_s)
                .alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*structs)).alias("p")).select("p.*")


def profile_oracle_sql(table: str, cols: Sequence[tuple[str, str]]) -> str:
    """DuckDB twin of :func:`profile` with ``exact_distinct=True`` —
    ``cols`` is ``[(name, kind), ...]`` taken from the Spark schema.
    Used by the oracle-paired test; kept here so the two engines'
    expressions evolve together."""
    parts = []
    for c, k in cols:
        if k == "numeric":
            mn = f"CAST(MIN({c}) AS DOUBLE)"
            mx = f"CAST(MAX({c}) AS DOUBLE)"
            mns = "CAST(NULL AS VARCHAR)"
            mxs = "CAST(NULL AS VARCHAR)"
        elif k == "temporal":
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns = f"strftime(MIN({c}), '%Y-%m-%d %H:%M:%S')"
            mxs = f"strftime(MAX({c}), '%Y-%m-%d %H:%M:%S')"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns = f"CAST(MIN({c}) AS VARCHAR)"
            mxs = f"CAST(MAX({c}) AS VARCHAR)"
        parts.append(f"""
SELECT '{c}' AS "column", '{k}' AS kind,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num,
       {mns} AS min_str, {mxs} AS max_str
FROM {table}""")
    return "\nUNION ALL\n".join(parts)
